package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-tailed join keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one reducer's key is hot beyond what
  * partition-splitting fixes (or when AQE is unavailable, e.g. inside
  * some streaming joins). The hot side's rows get a per-row salt in
  * [0, saltFactor), the other side is replicated saltFactor times, and
  * the join key becomes (key, salt) — a key that previously landed on
  * one reducer now spreads across saltFactor of them.
  *
  * Cost model: replicates the SMALLER side saltFactor× (size it like a
  * broadcast decision), leaves the large side untouched beyond an extra
  * tiny salt column.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // join types that emit unmatched rows of the REPLICATED side would
    // emit each such row saltFactor times — reject them
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin replicates the right side; joinType '$joinType' would emit " +
        "unmatched right rows saltFactor times (use inner/left-preserving types)")
    // Retry-stable spread: the salt is a pure function of the row's
    // CONTENT (xxhash64 over all columns), so a task retry reproduces the
    // same routing — unlike monotonically_increasing_id, whose value
    // depends on the row's position within a task attempt. The salt only
    // routes rows to reducers, so exact values never affect results;
    // fully-identical rows share a salt (acceptable: they are
    // indistinguishable anyway, and a hot KEY still spreads because its
    // rows differ in the non-key columns).
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-skew diagnostics BEFORE committing to a join/agg strategy on
    * `key`: the `topK` hottest keys with absolute count, corpus share,
    * ratio to the mean key load, and the salt factor that would bound
    * each reducer's share of that key to `targetRowsPerTask` rows
    * (ceil(n / target) — feed it to [[saltedJoin]]). One
    * partial-aggregated groupBy on the key plus a 1-row totals
    * broadcast; the top-k is a TakeOrdered, so the diagnostic costs one
    * scan at any corpus size — cheap enough to run as a pre-flight step
    * of a 100 TB pipeline rather than discovering the hot key from a
    * straggling reducer three hours in. */
  def diagnoseKeys(df: DataFrame, key: org.apache.spark.sql.Column,
      topK: Int = 10, targetRowsPerTask: Long = 10000000L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(targetRowsPerTask > 0, s"targetRowsPerTask must be positive")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1L)).as("n"))
    val totals = counts.agg(sum("n").cast("double").as("__total"),
      count(lit(1L)).cast("double").as("__nkeys"))
    counts.crossJoin(totals)
      .select(col("key"), col("n"),
        round(col("n") * 100 / col("__total"), 4).as("share_pct"),
        round(col("n") / (col("__total") / col("__nkeys")), 4).as("vs_mean"),
        ceil(col("n").cast("double") / lit(targetRowsPerTask.toDouble))
          .cast("int").as("salt_reco"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }

  /** EXACT equi-join cardinality pre-flight, without running the join:
    * |A ⋈ₖ B| = Σₖ n_A(k)·n_B(k), computed from the two per-key count
    * tables — the shuffles carry (key, count), never payload rows, so
    * the answer costs two narrow scans at any size. `max_key_pairs` is
    * the single hottest key's output contribution — the "will this
    * join explode" number to check against executor memory before a
    * three-hour straggler discovers it for you (pair with
    * [[diagnoseKeys]] / [[saltedJoin]] when it is large). Returns one
    * row: (join_rows, n_keys_both, max_key_pairs). */
  def joinSizeEstimate(a: DataFrame, aKey: org.apache.spark.sql.Column,
      b: DataFrame, bKey: org.apache.spark.sql.Column): DataFrame = {
    val ca = a.groupBy(aKey.cast("string").as("__k")).agg(count(lit(1L)).as("__na"))
    val cb = b.groupBy(bKey.cast("string").as("__k")).agg(count(lit(1L)).as("__nb"))
    ca.join(cb, "__k")
      .select((col("__na") * col("__nb")).as("__pairs"))
      .agg(coalesce(sum("__pairs"), lit(0L)).as("join_rows"),
        count(lit(1L)).as("n_keys_both"),
        coalesce(max("__pairs"), lit(0L)).as("max_key_pairs"))
  }

  /** Bloom-pruned join: when the small side is too large to broadcast
    * as a HASHED relation but its KEY SET fits a Bloom sketch (~1.2 MB
    * per million keys at 1% fpp), probe the sketch IN the big side's
    * scan and shuffle only probable matches. At 100 TB this is the
    * difference between shuffling the full fact table and shuffling
    * `|match| · (1+fpp)` rows — the runtime-filter optimization made
    * explicit and deterministic (Spark's own InjectRuntimeFilter needs
    * a shuffle-join plan shape and its own size heuristics to fire;
    * this applies it by declaration).
    *
    * EXACT results: Bloom filters have no false negatives, so no true
    * match is dropped; false positives (rate `fpp`) survive the scan
    * filter but are eliminated by the join itself. The sketch is built
    * EAGERLY at call time (a Spark job runs before the lazy DataFrame
    * is returned) by one treeAggregate over the small side's key
    * hashes — mergeable partials, no key-space shuffle; duplicate rows
    * are harmless because Bloom insertion is idempotent, so the
    * realized fpp tracks DISTINCT keys, which is what `expectedKeys`
    * sizes. The filter rides a broadcast into the probe expression
    * ([[graft.functions.BloomAnyContainBroadcast]]), deserialized once
    * per task.
    *
    * `expectedKeys` sizes the sketch; overshooting costs bytes,
    * undershooting costs fpp (both safe). Composite keys hash as one
    * xxhash64 over the key columns on BOTH sides. */
  def bloomPrunedJoin(big: DataFrame, bigKeys: Seq[String],
      small: DataFrame, smallKeys: Seq[String],
      expectedKeys: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(bigKeys.nonEmpty && bigKeys.length == smallKeys.length,
      "bloomPrunedJoin needs matching non-empty key lists")
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, "bad sketch sizing")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "rightouter").contains(jt),
      s"bloomPrunedJoin drops non-matching BIG-side rows pre-join; joinType " +
        s"'$joinType' would need those rows (use inner / left_semi / right_outer)")
    // NOTE: building the sketch runs a Spark job EAGERLY, at call time
    // — callers get a lazy DataFrame back, but the small side has
    // already been scanned once by the time this returns. Duplicate
    // key rows feed the filter as-is: Bloom insertion is idempotent
    // (re-inserting a hash sets the same bits), so the realized fpp
    // depends only on DISTINCT keys — which is what `expectedKeys`
    // sizes — and a pre-distinct would add a shuffle for nothing.
    val sketch = {
      val bos = new java.io.ByteArrayOutputStream()
      small.select(xxhash64(smallKeys.map(col): _*).as("__h"))
        .stat.bloomFilter("__h", expectedKeys, fpp)
        .writeTo(bos)
      bos.toByteArray
    }
    val pruned = big.where(graft.functions.Decontam.mightContainAny(
      array(xxhash64(bigKeys.map(col): _*)), sketch))
    pruned.join(small,
      bigKeys.zip(smallKeys).map { case (a, b) => big(a) === small(b) }
        .reduce(_ && _),
      joinType)
  }

  /** Shuffle-partition pre-flight: estimate the table's in-flight byte
    * volume from a DETERMINISTIC per-row width rule (strings at their
    * UTF-8 length, fixed-width types at their slot size) and recommend
    * a partition count for `targetPartitionBytes` — the number that
    * decides whether a 100 TB shuffle spills (too few partitions) or
    * drowns in task overhead (too many). The recommendation never drops
    * below `minPartitions` (keep every core busy). One
    * partially-aggregated scan, 1-row output:
    * (n_rows, est_bytes, avg_row_bytes, recommended_partitions,
    * rows_per_partition).
    *
    * The width rule is an ESTIMATE of serialized size, not an exact
    * shuffle-byte prediction (compression, encoding and overhead vary);
    * its value is being cheap, deterministic, and proportional. */
  def partitionAdvisor(df: DataFrame, columns: Seq[String],
      targetPartitionBytes: Long, minPartitions: Int): DataFrame = {
    require(columns.nonEmpty, "need at least one column")
    require(targetPartitionBytes > 0 && minPartitions > 0, "bad sizing")
    import org.apache.spark.sql.types._
    val widths: Seq[org.apache.spark.sql.Column] = columns.map { c =>
      df.schema(c).dataType match {
        case StringType => coalesce(octet_length(col(c)).cast("long"), lit(0L))
        case BinaryType => coalesce(length(col(c)).cast("long"), lit(0L))
        case LongType | DoubleType | TimestampType | TimestampNTZType => lit(8L)
        case IntegerType | FloatType | DateType => lit(4L)
        case ShortType => lit(2L)
        case BooleanType | ByteType => lit(1L)
        case other => throw new IllegalArgumentException(
          s"partitionAdvisor has no width rule for $c: ${other.simpleString}")
      }
    }
    df.agg(count(lit(1L)).as("n_rows"),
        coalesce(sum(widths.reduce(_ + _)), lit(0L)).as("est_bytes"))
      .select(col("n_rows"), col("est_bytes"),
        round(col("est_bytes") / col("n_rows").cast("double"), 2)
          .as("avg_row_bytes"),
        greatest(lit(minPartitions.toLong),
          ceil(col("est_bytes") / targetPartitionBytes.toDouble))
          .as("recommended_partitions"))
      .withColumn("rows_per_partition",
        ceil(col("n_rows") / col("recommended_partitions").cast("double"))
          .cast("long"))
  }
}
