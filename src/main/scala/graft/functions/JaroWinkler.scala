package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) as a native
  * in-scan expression — the record-linkage standard for short
  * identifying strings (names, addresses, SKUs): transposition-tolerant
  * where Levenshtein charges full price, prefix-weighted because human
  * typos cluster at the END of names. Complements the edit-distance
  * linkage path ([[graft.functions.Dedup]]'s banded levenshtein):
  * Levenshtein gates on absolute edits, Jaro–Winkler scores relative
  * agreement of unequal-length strings.
  *
  * Exact standard semantics, verified value-for-value against DuckDB's
  * `jaro_winkler_similarity` in the oracle: match window
  * ⌊max(|s|,|t|)/2⌋−1, transpositions = half the out-of-order matches,
  * Winkler prefix boost l·0.1·(1−jaro) with l = common prefix capped at
  * 4, applied only when jaro > 0.7 (the standard boost threshold).
  * Both strings empty → 1.0; exactly one empty → 0.0.
  *
  * Per-row kernel on the char arrays, no allocation beyond two boolean
  * flag arrays; quadratic only in the match WINDOW, not the string
  * product. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val t = b.asInstanceOf[UTF8String].toString
    JaroWinkler.score(s, t)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def score(s: String, t: String): Double = {
    val ls = s.length; val lt = t.length
    if (ls == 0 && lt == 0) return 1.0
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sFlags = new Array[Boolean](ls)
    val tFlags = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tFlags(j) && s.charAt(i) == t.charAt(j)) {
          sFlags(i) = true; tFlags(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars in order of appearance on each side
    var trans = 0
    var j = 0
    i = 0
    while (i < ls) {
      if (sFlags(i)) {
        while (!tFlags(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(ls, lt))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
