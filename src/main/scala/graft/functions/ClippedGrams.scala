package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-order clipped n-gram matches between a candidate and reference
  * token sequence OF THE SAME ROW — the modified-precision numerator of
  * BLEU (Papineni et al., ACL 2002 §2.1) and the overlap numerator of
  * ROUGE-N (Lin, ACL 2004 §2):
  *
  *   out(n-1) = Σ_g min(count_cand_n(g), count_ref_n(g)),  n = 1..maxN
  *
  * This quantity is a pure function of ONE row's two token arrays, yet
  * the r13–r15 formulations computed it corpus-wide: explode every
  * (id, gram) pair, groupBy-count each side, equi-join on (id, gram),
  * re-aggregate per id — three gram-grain exchanges and a join carrying
  * |docs|·|grams| rows for a decision that never crosses rows (guide
  * §2.3/§2.4: remove shuffles whose keys are already co-located). The
  * kernel runs the same multiset intersection in-scan: count reference
  * grams into a hash map, stream candidate grams decrementing — O(L·maxN)
  * per row, zero exchanges.
  *
  * Equivalence with the exploded form is exact, not approximate: gram
  * identity here is `UTF8String.concatWs(" ", tokens…)` — byte-for-byte
  * the `concat_ws(" ", slice(toks, i+1, n))` strings the old groupBy
  * keys compared (concatWs skips null tokens exactly as concat_ws
  * does), and whitespace-split tokens contain no separator, so the
  * string form is bijective with the token sequence. Counts are longs;
  * no floating point is involved.
  *
  * NULL array in → NULL out (callers `na.fill(0)` / null-skipping sums
  * restate the old "no rows for this doc" behavior); null ELEMENTS ride
  * the concatWs-skip discipline above. A side shorter than n yields no
  * n-grams (loop bound), matching `when(size < n, array())`.
  */
case class ClippedGramMatches(left: Expression, right: Expression, maxN: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinaryKernelCodegen {

  require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "clipped_gram_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"clipped_gram_matches requires (array<string>, array<string>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  private def gram(toks: Array[UTF8String], i: Int, n: Int): UTF8String =
    if (n == 1) {
      // concatWs would copy; a unigram IS the token (null token → the
      // empty concat result, matching concat_ws(" ", NULL) = "")
      val t = toks(i)
      if (t == null) UTF8String.EMPTY_UTF8 else t
    } else {
      val slice = new Array[UTF8String](n)
      System.arraycopy(toks, i, slice, 0, n)
      UTF8String.concatWs(ClippedGramMatches.SEP, slice: _*)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val cd = l.asInstanceOf[ArrayData]
    val rd = r.asInstanceOf[ArrayData]
    val nc = cd.numElements()
    val nr = rd.numElements()
    val ct = new Array[UTF8String](nc)
    val rt = new Array[UTF8String](nr)
    var i = 0
    while (i < nc) { ct(i) = cd.getUTF8String(i); i += 1 }
    i = 0
    while (i < nr) { rt(i) = rd.getUTF8String(i); i += 1 }
    val out = new Array[Long](maxN)
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var n = 1
    while (n <= maxN) {
      counts.clear()
      var j = 0
      val refGrams = nr - n + 1
      while (j < refGrams) {
        val g = gram(rt, j, n)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1)) else c(0) += 1
        j += 1
      }
      var matched = 0L
      j = 0
      val candGrams = nc - n + 1
      while (j < candGrams) {
        val c = counts.get(gram(ct, j, n))
        if (c != null && c(0) > 0) { c(0) -= 1; matched += 1L }
        j += 1
      }
      out(n - 1) = matched
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClippedGramMatches =
    copy(left = newLeft, right = newRight)
}

object ClippedGramMatches {
  private val SEP = UTF8String.fromString(" ")
}

/** Character-gram sibling of [[ClippedGramMatches]] for the chrF family:
  * out(n-1) = Σ_g min counts over the two strings' length-n character
  * windows (`substr(i, n)` semantics — code-point windows, exactly the
  * grams the exploded form keyed on). A side shorter than n yields no
  * n-grams. */
case class ClippedCharGramMatches(left: Expression, right: Expression, maxN: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinaryKernelCodegen {

  require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "clipped_chargram_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"clipped_chargram_matches requires (string, string), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    // substringSQL re-scans from the string head per call (O(pos) per
    // window → O(L²·maxN) per row); compute each side's code-point
    // byte offsets ONCE and build every window as a ZERO-COPY
    // UTF8String view over the original bytes (fromBytes wraps, never
    // copies) — identical code-point window semantics, O(L·maxN) per
    // row, no per-gram byte copying
    val cb = l.asInstanceOf[UTF8String].getBytes
    val rb = r.asInstanceOf[UTF8String].getBytes
    val cOff = ClippedCharGramMatches.charOffsets(cb)
    val rOff = ClippedCharGramMatches.charOffsets(rb)
    val nc = cOff.length - 1
    val nr = rOff.length - 1
    val out = new Array[Long](maxN)
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var n = 1
    while (n <= maxN) {
      counts.clear()
      var j = 0
      val refGrams = nr - n + 1
      while (j < refGrams) {
        val g = UTF8String.fromBytes(rb, rOff(j), rOff(j + n) - rOff(j))
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1)) else c(0) += 1
        j += 1
      }
      var matched = 0L
      j = 0
      val candGrams = nc - n + 1
      while (j < candGrams) {
        val c = counts.get(
          UTF8String.fromBytes(cb, cOff(j), cOff(j + n) - cOff(j)))
        if (c != null && c(0) > 0) { c(0) -= 1; matched += 1L }
        j += 1
      }
      out(n - 1) = matched
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClippedCharGramMatches =
    copy(left = newLeft, right = newRight)
}

object ClippedCharGramMatches {
  /** Byte offset of each code point's start, plus the terminal length —
    * the same code-point boundaries UTF8String's own char counting
    * walks (a code point starts at every non-continuation byte). */
  private[functions] def charOffsets(b: Array[Byte]): Array[Int] = {
    var chars = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val off = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { off(c) = i; c += 1 }
      i += 1
    }
    off(chars) = b.length
    off
  }
}
