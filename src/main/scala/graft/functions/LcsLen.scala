package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH of two token arrays as a native
  * in-scan expression — the kernel of ROUGE-L (Lin, "ROUGE: A Package
  * for Automatic Evaluation of Summaries", ACL 2004): order-preserving
  * but gap-tolerant overlap, the summarization-eval complement of
  * BLEU/chrF's contiguous n-gram matching (a candidate that keeps the
  * reference's content in order scores high here even when no 4-gram
  * survives verbatim).
  *
  * Classic two-row dynamic program: O(|a|·|b|) time per pair (the same
  * per-row cost class as the shipped edit-distance linkage expression),
  * O(min side) memory, token equality on the raw UTF8 bytes. NULL in →
  * NULL out; either side empty → 0 (standard LCS). The
  * [[JaroWinkler]] native-expression precedent: bounded Column algebra
  * cannot express the variable-length DP, and an interpreted HOF
  * re-derivation would re-allocate per step. */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_len"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_len requires (array<string>, array<string>), got " +
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
    LcsLen.lcs(as, bs)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LcsLen = copy(left = newLeft, right = newRight)
}

object LcsLen {
  /** Two-row LCS DP; null tokens match nothing (a NULL array element
    * cannot equal any token, including another NULL — matching SQL
    * equality). */
  def lcs(a: Array[AnyRef], b: Array[AnyRef]): Int = {
    // iterate over the longer side, keep rows over the shorter
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    val n = small.length
    if (n == 0 || big.length == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < big.length) {
      val bi = big(i)
      var j = 0
      while (j < n) {
        val sj = small(j)
        cur(j + 1) =
          if (bi != null && sj != null && bi == sj) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n)
  }

  def lcs(a: Array[UTF8String], b: Array[UTF8String]): Int =
    lcs(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
}
