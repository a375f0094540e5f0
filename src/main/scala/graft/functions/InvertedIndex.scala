package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable inverted text index + conjunctive keyword search — the
  * retrieval primitive under corpus inspection tooling ("show me every
  * document containing all of these terms") and under the BM25 scorer's
  * candidate generation at scale: scoring every document per query is a
  * corpus scan; intersecting posting lists touches only the queried
  * terms' documents.
  *
  * Tokenization matches the rest of the text surface (lowercased
  * whitespace split — [[TextFunctions.tokensWs]]), so the index agrees
  * with tf-idf/BM25 term statistics.
  *
  * Scale shape:
  *   - [[build]] is one in-scan per-doc distinct (array_distinct inside
  *     the row — a doc's repeated terms never reach the shuffle) and ONE
  *     term-keyed exchange; postings arrive sorted per term. The index
  *     is a plain DataFrame — write it as parquet partitioned/bucketed
  *     by term and searches become pruned point lookups.
  *   - `maxDfFraction` drops terms present in more than that fraction
  *     of documents (df rides the same aggregate — no second pass).
  *     Stop-term postings are the classic reducer hot spot ("the" owns
  *     half the corpus) and are useless for selection; production
  *     indexes cap them, so the drop rule is explicit API, not a
  *     silent heuristic.
  *   - [[searchAll]] touches ONLY the queried terms' rows (an `isin`
  *     filter a term-partitioned index prunes to file level), explodes
  *     their postings — work proportional to Σ df(queried terms), never
  *     corpus size — and keeps docs matched by ALL terms via a
  *     count-equality aggregate.
  */
object InvertedIndex {

  /** term → (df, sorted posting array). One term-keyed exchange. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      maxDfFraction: Double = 1.0): DataFrame = {
    require(maxDfFraction > 0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")
    // a non-numeric OR NULL id would otherwise become an invisible
    // posting (collect_list drops NULLs, so searches silently miss the
    // doc) — fail the job loudly instead, in-scan, with the offending
    // value in the message. try_cast (not cast) so the SAME guard owns
    // the failure under both ANSI (default, would throw mid-cast) and
    // legacy (silent NULL) cast semantics.
    val tried = expr(s"try_cast(`$idCol` AS long)")
    val idOk = when(tried.isNull,
        raise_error(concat(lit(s"InvertedIndex.build: id column '$idCol' " +
          "value is not castable to long: "),
          coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(tried)
    val full = docs.select(idOk.as("__id"),
        explode(array_distinct(
          TextFunctions.tokensWs(lower(col(textCol))))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1L)).as("df"),
        sort_array(collect_list(col("__id"))).as("postings"))
    if (maxDfFraction >= 1.0) full
    else {
      // the doc count is a cheap count-star job, paid only when a cap
      // is actually requested
      val nDocs = docs.count().toDouble
      full.where(col("df") <= lit(math.max(1.0, maxDfFraction * nDocs)))
    }
  }

  /** Documents containing ALL of `terms`: explode the queried terms'
    * postings, keep ids seen `terms.size` times. Distinct terms only —
    * a duplicated query term would double-count its postings. */
  def searchAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    val q = terms.distinct
    require(q.nonEmpty, "searchAll needs at least one term")
    index.where(col("term").isin(q: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1L)).as("n_terms_matched"))
      .where(col("n_terms_matched") === q.size)
  }

  /** Deterministic term → partition bucket for the parquet artifact. */
  def bucketOf(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** Persist the index partitioned by term-hash bucket: a search then
    * reads only its terms' directories (partition pruning at file-listing
    * time — the plan's PartitionFilters), not the whole artifact. Bucket
    * count trades directory fan-out against pruning selectivity; a few
    * hundred is right for a billion-term index. */
  def write(index: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    index.withColumn("bucket", bucketOf(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** [[searchAll]] against a bucket-partitioned index (written by
    * [[write]]): the bucket equi-filter is derived from the query terms
    * themselves, so the scan prunes to ≤|terms| partition directories
    * BEFORE any row is read. `buckets` must match the written layout. */
  def searchAllPruned(index: DataFrame, terms: Seq[String],
      buckets: Int): DataFrame =
    searchAll(pruneToTerms(index, terms, buckets), terms.distinct)

  /** Restrict a bucket-partitioned index to the partitions that can
    * hold `terms` — the bucket values are computed driver-side with the
    * SAME hash the write path used (SQL xxhash64, seed 42), so the
    * equi-filter becomes a PartitionFilter and only ≤|terms|
    * directories are listed/read. `buckets` must match the written
    * layout or pruning would silently drop true matches. */
  def pruneToTerms(index: DataFrame, terms: Seq[String],
      buckets: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val wanted = terms.distinct.map { t =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))), 42L)
        .eval(null).asInstanceOf[Long]
      math.floorMod(h, buckets.toLong).toInt
    }
    index.where(col("bucket").isin(wanted.distinct: _*))
  }

  /** Search across a written index PLUS an arriving batch without
    * rebuilding: index the batch alone ([[build]] over the delta — cost
    * ∝ batch), align columns, and search the union. Per-term postings
    * may appear in both sides, but a document lives in exactly ONE
    * side, so the count-equality of [[searchAll]] is unaffected. */
  def searchAllWithDelta(index: DataFrame, delta: DataFrame,
      terms: Seq[String]): DataFrame =
    searchAll(index.select("term", "df", "postings")
      .unionByName(delta.select("term", "df", "postings")), terms)
}
