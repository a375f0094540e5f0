package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Levenshtein distance between two TOKEN arrays (unit-cost insert /
  * delete / substitute on whole tokens) as a native in-scan
  * expression — the kernel of word error rate (the ASR/translation
  * eval standard: WER = word-level edits / reference words). Spark's
  * built-in `levenshtein` is CHARACTER-level, which double-counts long
  * misrecognized words and rewards length over correctness; WER wants
  * every token to cost exactly one edit.
  *
  * Classic two-row dynamic program: O(|a|·|b|) time per pair, O(min
  * side) memory (the [[LcsLen]] kernel's cost class), token equality
  * on the raw UTF8 bytes. NULL array in → NULL out; either side empty
  * → the other side's length (all inserts/deletes). NULL ELEMENTS
  * match nothing — including another NULL — so each costs one edit
  * against any token (SQL-equality discipline, as in [[LcsLen]]). */
case class TokenEditDist(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_edit_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_edit_dist requires (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val na = ad.numElements(); val nb = bd.numElements()
    val as = new Array[UTF8String](na)
    val bs = new Array[UTF8String](nb)
    var i = 0
    while (i < na) { as(i) = ad.getUTF8String(i); i += 1 }
    i = 0
    while (i < nb) { bs(i) = bd.getUTF8String(i); i += 1 }
    TokenEditDist.dist(as, bs)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokenEditDist =
    copy(left = newLeft, right = newRight)
}

object TokenEditDist {
  /** Two-row Levenshtein DP; null tokens match nothing (a NULL array
    * element cannot equal any token, including another NULL). */
  def dist(a: Array[AnyRef], b: Array[AnyRef]): Int = {
    // iterate over the longer side, keep rows over the shorter
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    val n = small.length
    if (n == 0) return big.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 0
    while (i < big.length) {
      cur(0) = i + 1
      val bi = big(i)
      j = 0
      while (j < n) {
        val sj = small(j)
        val sub = if (bi != null && sj != null && bi == sj) prev(j)
          else prev(j) + 1
        val del = prev(j + 1) + 1
        val ins = cur(j) + 1
        cur(j + 1) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  def dist(a: Array[UTF8String], b: Array[UTF8String]): Int =
    dist(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
}
