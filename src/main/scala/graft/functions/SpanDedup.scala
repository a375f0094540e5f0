package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Repeated-SUBSTRING removal — the span-level dedup of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better"): text
  * that occurs verbatim in more than one document is CUT from every
  * occurrence except a canonical first one, rather than dropping whole
  * documents. The published method builds a corpus suffix array; this is
  * the standard distributed approximation — anchor on fixed-length
  * character windows: a position is covered iff its L-char window occurs
  * in another document, runs of covered positions merge into spans, and
  * spans are cut. Any repeated substring of length >= L is found exactly
  * (all its windows repeat); repeats shorter than L are below the
  * anchor resolution by design.
  *
  * Keep-first semantics: for each repeated window, the document with the
  * MINIMUM id keeps its text; every other document gets the span cut —
  * so one canonical occurrence of the duplicated passage survives the
  * corpus, as in the reference method.
  *
  * Scale shape: windows explode in-scan (one row per char position, the
  * same volume class as decontamination's gram explode); the ownership
  * pass shuffles DISTINCT (doc, 8-byte window-hash) pairs with map-side
  * partials; the repeated-window set (bounded by actually-duplicated
  * text) broadcasts back; span merge is a per-doc window over MARKED
  * positions only (O(duplicated positions), not O(corpus)); the cut is
  * a per-row fold over each doc's own span list. Nothing quadratic, and
  * unmarked documents never enter a shuffle after the ownership pass.
  */
object SpanDedup {

  /** Hash of the L-char window at every position (0-based, positions
    * 0..len-L; a doc shorter than L contributes its whole text at
    * position 0 — same convention as [[Dedup.shingles]]). */
  private def posWindowHashes(text: Column, L: Int): Column =
    transform(sequence(lit(0), greatest(length(text) - L, lit(0))),
      i => xxhash64(text.substr(i + lit(1), lit(L))))

  /** The (doc, position, window-hash) rows entering the ownership pass —
    * exactly what the distinct+groupBy shuffles, exposed so the bench
    * can measure the stride volume cut directly. stride 1 anchors every
    * position; stride > 1 selects winnowed anchors (Schleimer et al.,
    * SIGMOD 2003: the leftmost-minimum hash of every stride-window —
    * selection depends only on CONTENT, so two occurrences of a repeat
    * anchor the same relative positions even when their absolute
    * offsets differ mod stride, which a fixed every-k-th-position
    * stride provably cannot do) via the native one-pass deque
    * expression [[WinnowedAnchorsExpr]]. PropertySpec pins the native
    * selection to an inline per-window-argmin reference. */
  private[graft] def anchorGrams(docs: DataFrame, idCol: String, textCol: String,
      L: Int, stride: Int): DataFrame =
    if (stride == 1)
      docs.select(col(idCol), posexplode(posWindowHashes(col(textCol), L)))
        .toDF(idCol, "__pos", "__g")
    else
      docs.select(col(idCol),
          explode(org.apache.spark.sql.GraftColumn(WinnowedAnchorsExpr(
            org.apache.spark.sql.GraftColumn.expr(posWindowHashes(col(textCol), L)),
            stride))).as("__a"))
        .select(col(idCol), col("__a.pos").as("__pos"), col("__a.g").as("__g"))

  /** (idCol, clean, n_spans, chars_removed) for EVERY input document.
    * `clean` is the text with all non-canonical repeated spans cut;
    * untouched documents pass through with n_spans = 0.
    *
    * `stride` trades ownership-shuffle volume for anchor resolution:
    * stride 1 anchors every position (one distinct (doc, hash) pair per
    * character — ~L× corpus bytes through the shuffle); stride k keeps
    * only winnowed anchors (expected density 2/(k+1)), cutting shuffle
    * volume ~k/2× while still detecting EVERY repeat of length
    * >= L + k - 1 deterministically. The approximation is confined to
    * span edges: up to k - 1 characters at each boundary of a repeated
    * passage may survive the cut (the interior is always covered,
    * since consecutive anchors inside a repeat are < k apart and each
    * covers L >= k positions). */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      L: Int = 30, stride: Int = 1): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    require(stride >= 1 && stride <= L,
      s"stride must be in [1, L]: anchors $stride apart must overlap L-char windows, got $stride")
    val pg = anchorGrams(docs, idCol, textCol, L, stride)
    // ownership: min doc id per window + how many distinct docs carry it
    val own = pg.select(col(idCol), col("__g")).distinct()
      .groupBy("__g")
      .agg(min(col(idCol)).as("__keep"), count(lit(1L)).as("__df"))
      .where(col("__df") >= 2)
      .select("__g", "__keep")
    // marked: positions of repeated windows in every NON-canonical doc
    val marked = pg.join(broadcast(own), Seq("__g"))
      .where(col(idCol) =!= col("__keep"))
      .select(col(idCol), col("__pos"))
    // merge runs of covered positions into disjoint spans [s, e):
    // a position starts a new span iff it lies beyond every prior
    // window's end (cumulative max over the sorted positions)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val spans = marked
      .withColumn("__prev_end", max(col("__pos") + L).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__prev_end").isNull || col("__pos") > col("__prev_end"), 1)
          .otherwise(0))
      .withColumn("__span", sum(col("__brk")).over(w))
      .groupBy(col(idCol), col("__span"))
      .agg(min("__pos").as("__s"), (max(col("__pos")) + L).as("__e"))
    val spanArr = spans.groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("__s"), col("__e")))).as("__spans"))
    // cut: fold the ordered spans, keeping [last, s) between them + tail
    val t = col(textCol)
    val folded = aggregate(col("__spans"),
      struct(lit("").as("kept"), lit(0).as("last")),
      (acc, sp) => struct(
        concat(acc.getField("kept"),
          t.substr(acc.getField("last") + 1,
            sp.getField("__s") - acc.getField("last"))).as("kept"),
        sp.getField("__e").as("last")),
      acc => concat(acc.getField("kept"),
        t.substr(acc.getField("last") + 1, length(t))))
    docs.join(spanArr, Seq(idCol), "left")
      .withColumn("clean", when(col("__spans").isNull, t).otherwise(folded))
      .select(col(idCol), col("clean"),
        coalesce(size(col("__spans")), lit(0)).as("n_spans"),
        (length(t) - length(col("clean"))).as("chars_removed"))
  }

  /** ExactSubstr span dedup at TOKEN granularity (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * published 50-token standard that [[dropRepeatedSpans]]' char
    * windows approximate): any token run of length >= `minTokens` that
    * occurs verbatim in more than one document is cut from every
    * occurrence except the canonical one (minimum doc id keeps its
    * text). Detection is EXACT at token grain — a repeat of m >=
    * minTokens tokens has all m − minTokens + 1 of its token k-grams
    * repeated, so the union of covered windows recovers the maximal
    * span with exact token boundaries (no winnowing slop, no stride
    * edge loss). The published method sorts a corpus suffix array and
    * extends neighbors; the gram-adjacency restatement here is the
    * same detection re-expressed as a keyed aggregation (Spark's
    * groupBy IS the distributed sorted-gram adjacency — grams that
    * would sort adjacent land in the same reduce group, without paying
    * a global sort). Like the sibling, repeats are CROSS-document
    * (count of distinct docs >= 2); intra-document self-repeats are
    * out of scope.
    *
    * Returns (idCol, clean, n_tokens, n_spans, tokens_removed) for
    * every input document; `clean` is the kept tokens joined by single
    * spaces (the operator works in token space, so output whitespace
    * is normalized — documents with no cut spans also come back
    * space-joined). Documents shorter than `minTokens` tokens cannot
    * contain a qualifying span and pass through whole.
    *
    * Scale shape ([[dropRepeatedSpans]]' contract at token grain): the
    * gram pass explodes one row per token position in-scan; ownership
    * shuffles DISTINCT (doc, 8-byte gram-hash) pairs with map-side
    * partials; the repeated-gram set — bounded by actually-duplicated
    * text — broadcasts back; span merge windows over MARKED positions
    * only; the cut is a per-row indexed filter over the doc's own
    * token array. Nothing quadratic; clean documents never shuffle
    * after the ownership pass. */
  def dropExactSubstr(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val k = minTokens
    val toks = TextFunctions.tokensWs(col(textCol))
    val base = docs.select(col(idCol), toks.as("__toks"))
    // one 8-byte hash per token k-gram start; docs under k tokens
    // contribute nothing (they cannot contain a >= k-token repeat)
    val grams = base
      .where(size(col("__toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__toks")) - k),
          i => xxhash64(concat_ws(" ",
            slice(col("__toks"), i + lit(1), lit(k)))))))
      .toDF(idCol, "__pos", "__g")
    val own = grams.select(col(idCol), col("__g")).distinct()
      .groupBy("__g")
      .agg(min(col(idCol)).as("__keep"), count(lit(1L)).as("__df"))
      .where(col("__df") >= 2)
      .select("__g", "__keep")
    val marked = grams.join(broadcast(own), Seq("__g"))
      .where(col(idCol) =!= col("__keep"))
      .select(col(idCol), col("__pos"))
    // merge covered token windows [pos, pos + k) into maximal spans —
    // identical machinery to [[dropRepeatedSpans]], token-indexed
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val spans = marked
      .withColumn("__prev_end", max(col("__pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__prev_end").isNull || col("__pos") > col("__prev_end"), 1)
          .otherwise(0))
      .withColumn("__span", sum(col("__brk")).over(w))
      .groupBy(col(idCol), col("__span"))
      .agg(min("__pos").as("__s"), (max(col("__pos")) + k).as("__e"))
    val spanArr = spans.groupBy(idCol)
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    // cut: keep token i iff no span covers it (spans are few per doc —
    // the exists() scan is O(tokens · spans) with tiny span counts)
    val kept = filter(col("__toks"), (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("__s") && i < sp.getField("__e")))
    base.join(spanArr, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, concat_ws(" ", col("__toks")))
          .otherwise(concat_ws(" ", kept)).as("clean"),
        size(col("__toks")).as("n_tokens"),
        coalesce(size(col("__spans")), lit(0)).as("n_spans"),
        when(col("__spans").isNull, lit(0))
          .otherwise(size(col("__toks")) - size(kept)).as("tokens_removed"))
  }

  /** INTRA-document ExactSubstr: token runs of length >= `minTokens`
    * that occur more than once WITHIN a document are cut from every
    * occurrence except the first — the self-repeat half of Lee et al.
    * 2022's suffix-array dedup ([[dropExactSubstr]] covers the
    * cross-document half; compose both for the full published
    * semantics). Boilerplate loops, template echoes and copy-pasted
    * paragraphs inside one document are the target; periodic text
    * ("A B C A B C A B C…") collapses to its first period, because
    * every later window's k-gram has an earlier occurrence.
    *
    * Same output shape as [[dropExactSubstr]]: (idCol, clean,
    * n_tokens, n_spans, tokens_removed), clean space-joined.
    *
    * Scale shape: ZERO shuffles — the whole operator is one in-scan
    * projection. Per row, tokens hash once (Column side), then
    * [[SelfRepeatSpansExpr]] rolls a polynomial gram key over the
    * token-hash array and collects covered windows in a single O(n)
    * pass (seen-set membership; spans merged on the fly). Bounded
    * Column algebra cannot express the seen-set — an exists() over a
    * growing prefix is O(n·k·n) interpreted lambda evals — which is
    * this expression's justification under the repo's native-expr
    * convention. */
  def dropSelfRepeats(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    import org.apache.spark.sql.GraftColumn
    val toks = TextFunctions.tokensWs(col(textCol))
    val base = docs.select(col(idCol), toks.as("__toks"))
    val spans = GraftColumn(SelfRepeatSpansExpr(
      GraftColumn.expr(transform(col("__toks"), t => xxhash64(t))),
      minTokens))
    val withSpans = base.select(col(idCol), col("__toks"),
      spans.as("__spans"))
    val kept = filter(col("__toks"), (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("s") && i < sp.getField("e")))
    withSpans.select(col(idCol),
      when(size(col("__spans")) === 0, concat_ws(" ", col("__toks")))
        .otherwise(concat_ws(" ", kept)).as("clean"),
      size(col("__toks")).as("n_tokens"),
      size(col("__spans")).as("n_spans"),
      when(size(col("__spans")) === 0, lit(0))
        .otherwise(size(col("__toks")) - size(kept)).as("tokens_removed"))
  }
}

/** Native winnowed-anchor selection: hash array → array<struct<pos int,
  * g bigint>> of the leftmost-minimum position of every `stride`-length
  * sliding window, deduplicated (Schleimer et al. 2003).
  *
  * A native expression with a measured justification, per this repo's
  * convention: an equivalent Column formulation is interpreted per
  * window start (slice + array_min + array_position allocate and
  * rescan per position — O(n·k) allocating lambda evals; 18.6s for the
  * sf0.1 corpus at stride 4 vs 6.7s for the stride-1 path it was meant
  * to beat (r6 in-session), so it was removed rather than kept as dead
  * code). This is
  * the classic O(n) monotonic-deque sliding minimum: one pass, zero
  * allocation per element. PropertySpec pins the selection to an
  * inline per-window leftmost-argmin reference. */
case class WinnowedAnchorsExpr(child: Expression, stride: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnowed_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnowed_anchors requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData].toLongArray()
    val n = h.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def emit(p: Int): Unit = out += InternalRow(p, h(p))
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n < stride) {
      // single short window: leftmost argmin of the whole array
      var best = 0
      var i = 1
      while (i < n) { if (h(i) < h(best)) best = i; i += 1 }
      emit(best)
    } else {
      // monotonic deque of indices; strict pops keep the LEFTMOST of
      // equal minima, matching array_position's first-match semantics
      val dq = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      var last = -1
      var i = 0
      while (i < n) {
        while (tail > head && h(dq(tail - 1)) > h(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - stride) head += 1
        if (i >= stride - 1 && dq(head) != last) { last = dq(head); emit(last) }
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedAnchorsExpr =
    copy(child = newChild)
}

/** Native intra-document repeated-window detection for
  * [[SpanDedup.dropSelfRepeats]]: token-hash array → array<struct<s
  * int, e int>> of merged token spans covered by k-gram windows whose
  * gram has an EARLIER occurrence in the same array (keep-first:
  * the first occurrence's windows are never covered).
  *
  * Gram keys are a forward-rolling polynomial over the token hashes
  * (base B = 0x9E3779B97F4A7C15, Java wrapping arithmetic):
  * key(p) = Σⱼ h(p+j)·B^(k−1−j), updated in O(1) per position —
  * key(p+1) = (key(p) − h(p)·B^(k−1))·B + h(p+k). One O(n) pass, one
  * HashSet membership per position, spans merged on the fly (a covered
  * position either extends the open span or starts a new one — the
  * cummax/break window of the cross-doc path collapses to two locals
  * here because positions arrive in order). 64-bit collision risk is
  * the same class the corpus-level gram hashing already accepts. */
case class SelfRepeatSpansExpr(child: Expression, k: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(k >= 2, s"k must be >= 2, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "self_repeat_spans"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"self_repeat_spans requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData].toLongArray()
    val n = h.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val B = 0x9E3779B97F4A7C15L
    // Bᵏ⁻¹ for the rolling update
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 *= B; i += 1 }
    // initial key over positions [0, k)
    var key = 0L
    i = 0
    while (i < k) { key = key * B + h(i); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var spanS = -1; var spanE = -1 // open span [spanS, spanE)
    var p = 0
    val last = n - k
    while (p <= last) {
      if (!seen.add(key)) {
        // repeat occurrence: cover [p, p + k)
        if (spanS >= 0 && p <= spanE) { if (p + k > spanE) spanE = p + k }
        else {
          if (spanS >= 0) out += InternalRow(spanS, spanE)
          spanS = p; spanE = p + k
        }
      }
      if (p < last) key = (key - h(p) * bk1) * B + h(p + k)
      p += 1
    }
    if (spanS >= 0) out += InternalRow(spanS, spanE)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): SelfRepeatSpansExpr =
    copy(child = newChild)
}
