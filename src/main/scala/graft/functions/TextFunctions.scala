package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- Repetition filters (the Gopher-style quality signals: Rae et
  // al. 2021, "Scaling Language Models", appendix A1.1 — excess repeated
  // lines / characters / n-grams mark low-quality machine-generated or
  // boilerplate text) ----

  /** Whitespace tokens regrouped into fixed-width "lines" of `width`
    * tokens — a deterministic line structure for corpora without natural
    * newlines (real pipelines split on '\n' instead; pass those lines to
    * the fraction helpers directly). */
  def tokenLines(c: Column, width: Int): Column = {
    val toks = tokensWs(c)
    transform(
      sequence(lit(0), greatest(ceil(size(toks) / lit(width.toDouble)).cast("int"), lit(1)) - 1),
      i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))
  }

  /** Fraction of array entries that are repeats of another entry's value
    * (0 for empty input). */
  def duplicateFraction(arr: Column): Column =
    when(size(arr) <= 0, lit(0.0)).otherwise(
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))

  /** Fraction of CHARACTERS living in entries that occur more than once
    * (0 when the entries hold no characters). Quadratic in the entry
    * count per row — fine for per-document line lists, not for token
    * lists of unbounded length. */
  def duplicateCharFraction(arr: Column): Column = {
    val dup = aggregate(arr, lit(0L), (acc, x) =>
      acc + when(size(filter(arr, y => y === x)) > 1,
        length(x).cast("long")).otherwise(lit(0L)))
    val tot = aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))
    when(tot <= 0, lit(0.0)).otherwise(dup.cast("double") / tot)
  }

  /** Per-document repetition statistics: duplicate-line fraction,
    * duplicate-line character fraction (over [[tokenLines]] of
    * `lineWidth` tokens), and top-n-gram fraction — occurrences of the
    * modal word n-gram over the number of n-gram positions (0 when the
    * document has fewer than n tokens).
    *
    * Scale shape: the line metrics are per-row Column algebra inside the
    * scan; the n-gram mode uses explode → two-level partial-aggregated
    * groupBy keyed on (doc, gram) — never a per-row O(tokens²) loop, and
    * the shuffle carries (id, gram-hash-sized) pairs only. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      lineWidth: Int = 8, n: Int = 2): DataFrame = {
    val toks = tokensWs(col(textCol))
    val lines = tokenLines(col(textCol), lineWidth)
    val base = docs.select(col(idCol),
      duplicateFraction(lines).as("dup_line_frac"),
      duplicateCharFraction(lines).as("dup_line_char_frac"),
      (size(toks) - n + 1).as("__positions"))
    val grams = docs.select(col(idCol), explode(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("gram"))
    val top = grams.groupBy(col(idCol), col("gram")).agg(count(lit(1L)).as("c"))
      .groupBy(col(idCol)).agg(max("c").as("top_c"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol), col("dup_line_frac"), col("dup_line_char_frac"),
        coalesce(col("top_c").cast("double") /
          greatest(col("__positions"), lit(1)), lit(0.0)).as("top_ngram_frac"))
  }

  // ---- PII scrubbing (regex redaction — the cheap first line of a
  // privacy pass; patterns are RE2-compatible so the same regexes run on
  // Spark (Java regex) and SQL oracles) ----

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2} \\d{3} \\d{3} \\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-class PII match counts as a struct (emails, phones, ipv4s). */
  def piiCounts(c: Column): Column = struct(
    regexp_count(c, lit(EmailRe)).as("emails"),
    regexp_count(c, lit(PhoneRe)).as("phones"),
    regexp_count(c, lit(Ipv4Re)).as("ipv4s"))

  /** Text with every PII match replaced by a typed placeholder. Email
    * runs first so an address's digit clusters can't half-match the
    * looser phone/ip patterns afterwards. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), Ipv4Re, "<IP>")
}
