package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** (idCol, clean, n_spans, chars_removed) for EVERY input document.
    * `clean` is the text with all non-canonical repeated spans cut;
    * untouched documents pass through with n_spans = 0. */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      L: Int = 30): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    val pg = docs.select(col(idCol), posexplode(posWindowHashes(col(textCol), L)))
      .toDF(idCol, "__pos", "__g")
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
}
