package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All pure Column
  * compositions (built-in functions + higher-order array functions) — no
  * UDFs, so they stay inside codegen / Catalyst optimization and scale
  * linearly per-partition with zero shuffles.
  */
object TextFunctions {

  /** Whitespace tokens (trimmed first so leading/trailing space yields no
    * empty tokens). */
  def tokensWs(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish pre-tokenization: word runs OR single non-word-non-space
    * chars — the standard GPT-2-style pre-split shape. */
  def tokensRegex(c: Column): Column = regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  def tokenCountWs(c: Column): Column = size(tokensWs(c))
  def tokenCountRegex(c: Column): Column = size(tokensRegex(c))

  /** Ratio of characters matching a regex char class, in [0,1]. */
  def charClassRatio(c: Column, keepClass: String): Column =
    length(regexp_replace(c, s"[^$keepClass]", "")).cast("double") / length(c)

  def alphaRatio(c: Column): Column = charClassRatio(c, "A-Za-z")
  def digitRatio(c: Column): Column = charClassRatio(c, "0-9")
  def punctRatio(c: Column): Column = charClassRatio(c, """\\p{Punct}""")
  def whitespaceRatio(c: Column): Column = charClassRatio(c, """\\s""")

  def avgTokenLength(c: Column): Column = {
    val toks = tokensWs(c)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Fraction of whitespace tokens present in `stopwords`. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    val toks = tokensWs(lower(c))
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Composite quality score in [0,1]: high-alpha, low-digit, sane token
    * lengths — the usual cheap pre-filter before expensive dedup/training. */
  def qualityScore(c: Column): Column = {
    val wordLenOk = when(avgTokenLength(c).between(3.0, 12.0), 1.0).otherwise(0.0)
    round(lit(0.5) * alphaRatio(c) + lit(0.2) * (lit(1.0) - digitRatio(c)) +
      lit(0.3) * wordLenOk, 6)
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (public common-word lists). */
  val StopwordLists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "es" -> Seq("el", "la", "que", "de", "y", "en", "los", "se", "del", "las"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Language-ID: argmax of per-language stopword hit counts; "und"
    * (undetermined) when no list scores a hit. Pure Column composition —
    * one pass, no shuffle, no UDF.
    *
    * Space-delimited languages score whitespace-token hits; `zh` scores
    * CHARACTER occurrences of its (single-character) stopwords, because
    * real Chinese text is unsegmented and would never produce a
    * whitespace token equal to a stopword. */
  def langId(c: Column, lists: Map[String, Seq[String]] = StopwordLists): Column = {
    val toks = tokensWs(lower(c))
    val scores: Seq[(String, Column)] = lists.toSeq.sortBy(_._1).map {
      case (lang, words) if words.forall(_.length == 1) =>
        // single-char stopwords (zh): count matching characters directly
        lang -> (length(c) - length(regexp_replace(c, "[" + words.mkString + "]", "")))
      case (lang, words) =>
        val sw = array(words.map(lit): _*)
        lang -> size(filter(toks, t => array_contains(sw, t)))
    }
    val best = greatest(scores.map(_._2): _*)
    // first lang (alphabetical) achieving the max, deterministic tie-break
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Exact 64-bit content hash (xxhash64 of the raw text). */
  def contentHash(c: Column): Column = xxhash64(c)

  /** Rolling-hash document fingerprint: min of xxhash64 over all char
    * k-grams — the "winnowing" min-fingerprint. Equal texts always agree;
    * near-equal texts agree with probability ≈ jaccard of their k-gram
    * sets. */
  def minGramFingerprint(c: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(0), greatest(length(c) - k, lit(0))),
      i => xxhash64(substring(c, i + lit(1), lit(k)))))
}
