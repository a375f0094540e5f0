package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus boilerplate detection: word n-grams that recur across
  * MANY documents (navigation chrome, cookie banners, license footers,
  * "subscribe to our newsletter") are boilerplate — the within-corpus
  * complement of [[Decontam]]'s cross-corpus benchmark overlap and of
  * [[TextFunctions.repetitionStats]]'s WITHIN-document repetition.
  * RefinedWeb/C4-style pipelines drop or down-weight documents dominated
  * by such grams.
  *
  * Two corpus passes, both scale-shaped:
  *   1. document frequency: per-doc DISTINCT gram hashes explode in-scan
  *      (`array_distinct` before the explode — no per-doc distinct
  *      shuffle), partial-agg count per gram, keep df ≥ `minDf`. The
  *      survivors are by construction few (they recur in ≥ minDf docs),
  *      so the result BROADCASTS.
  *   2. scoring: every gram position joins the broadcast set; the
  *      per-document aggregate is map-side partial (a doc's grams are
  *      co-located after an in-scan explode), so the shuffle carries one
  *      row per document, never the text.
  *
  * Grams are 64-bit xxhash64 of the space-joined token window — 8-byte
  * keys through the df shuffle instead of ~30-char strings; a collision
  * (~1e-7 at billions of grams) can only merge two grams' df counts,
  * inflating a fraction by one gram's worth, never losing boilerplate.
  */
object Boilerplate {

  /** Hashes of all word n-gram positions of `text` (whitespace tokens,
    * xxhash64 of the space-joined window); empty array when the doc has
    * fewer than `n` tokens. */
  def gramHashes(text: Column, n: Int): Column = {
    require(n > 0, s"n-gram length must be positive, got $n")
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Gram hashes with document frequency ≥ `minDf`: (`__g`, `df`). */
  def boilerplateGrams(docs: DataFrame, textCol: String, n: Int = 5,
      minDf: Long = 50L): DataFrame = {
    require(minDf > 1, s"minDf must be > 1, got $minDf")
    docs
      .select(explode(array_distinct(gramHashes(col(textCol), n))).as("__g"))
      .groupBy("__g").agg(count(lit(1L)).as("df"))
      .where(col("df") >= minDf)
  }

  /** Per-document boilerplate share: (`idCol`, `n_grams`, `n_boiler`,
    * `boiler_frac`) where `boiler_frac` = boilerplate gram POSITIONS /
    * total gram positions. Documents with fewer than `n` tokens have no
    * gram positions and produce no row (treat as fraction 0). */
  def boilerplateFractions(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDf: Long = 50L): DataFrame = {
    val boiler = broadcast(
      boilerplateGrams(docs, textCol, n, minDf).select(col("__g"), lit(1).as("__b")))
    docs
      .select(col(idCol), explode(gramHashes(col(textCol), n)).as("__g"))
      .join(boiler, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1L)).as("n_grams"),
           sum(when(col("__b").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac", col("n_boiler") / col("n_grams"))
  }

  /** The corpus minus documents whose boilerplate share is ≥ `maxFrac`
    * (LEFT ANTI on the flagged ids — short docs with no gram positions
    * are always kept). */
  def dropBoilerplateDocs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDf: Long = 50L, maxFrac: Double = 0.3): DataFrame = {
    require(maxFrac > 0.0 && maxFrac <= 1.0, s"maxFrac must be in (0,1], got $maxFrac")
    val bad = boilerplateFractions(docs, idCol, textCol, n, minDf)
      .where(col("boiler_frac") >= maxFrac).select(idCol)
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
