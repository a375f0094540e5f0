package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton-curve) multi-dimensional
  * clustering for data skipping.
  *
  * A parquet scan prunes files and row groups whose column min/max
  * stats exclude the predicate — but a layout sorted on ONE column has
  * useless stats on every other column (each file spans the full
  * range). Interleaving the bits of several columns' bucket ids into
  * one Morton key and range-clustering on it keeps EVERY interleaved
  * column's per-file range small (a file holds a z-curve segment, i.e.
  * a hyper-rectangle-ish region), so predicates on any of the columns
  * skip most of the data. This is the standard clustered-table layout
  * of modern lakehouse engines (see Morton 1966; the technique is
  * described publicly in the Delta Lake OPTIMIZE ZORDER and Iceberg
  * sort-order docs — the implementation here is from scratch).
  *
  * 100 TB shape: range discovery is ONE narrow min/max aggregate (2·n
  * scalars to the driver); the z-key is pure in-scan Column math;
  * `repartitionByRange` adds one reservoir-sampling pass and ONE
  * shuffle — the same cost as any global sort — and the write is
  * stats-bearing parquet. No driver-side data, no UDFs (the key is
  * codegen'd shift/and/add algebra).
  */
object Layout {

  /** Equi-width bucket id in [0, 2^bits) of `c` within [lo, hi], as
    * exact double math (inputs are expected integral and far below
    * 2^53, so floor((c-lo)·2^bits/(hi-lo+1)) is engine-portable —
    * the DuckDB oracle evaluates the identical expression). Nulls park
    * in bucket 0. */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 20, s"bits must be in (0, 20], got $bits")
    val nb = lit((1L << bits).toDouble)
    floor((coalesce(c, lo).cast("double") - lo) * nb / (hi - lo + lit(1.0)))
      .cast("long")
  }

  /** Morton interleave of per-column bucket ids, each `bits` wide:
    * bit i of bucket j lands at position i·n + (n−1−j), so
    * `buckets.head` owns the most significant bit of every group and
    * the total width is n·bits (must fit a long). Disjoint target bits
    * let the terms combine with `+` — a flat codegen-friendly sum of
    * shift/and terms, no loops at runtime. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 2, s"interleave needs >= 2 columns, got $n")
    require(n * bits <= 62, s"interleaved width ${n * bits} exceeds long range")
    val terms =
      for {
        i <- 0 until bits
        (b, j) <- buckets.zipWithIndex
      } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    terms.reduce(_ + _)
  }

  /** The z-value of `cols` given known [lo, hi] ranges (column pairs),
    * fully in-scan. */
  def zvalue(cols: Seq[(Column, Column, Column)], bits: Int): Column =
    interleave(cols.map { case (c, lo, hi) => rangeBucket(c, lo, hi, bits) }, bits)

  /** Add a z-key over `cols` (ranges discovered with ONE min/max
    * aggregate — 2·n scalars to the driver, valid at any corpus size)
    * and cluster the rows: `repartitionByRange` on the key routes each
    * z-curve segment to one partition, and the within-partition sort
    * makes row-group stats tight inside each file too. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 12, zCol: String = "__zkey"): DataFrame = {
    require(cols.size >= 2, "zorderBy needs >= 2 columns")
    val aggCols = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val agg = df.agg(aggCols.head, aggCols.tail: _*).head()
    val ranged = cols.zipWithIndex.map { case (c, j) =>
      (col(c), lit(agg.get(2 * j)), lit(agg.get(2 * j + 1)))
    }
    df.withColumn(zCol, zvalue(ranged, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** Cluster-and-write: the clustered parquet layout whose per-file
    * min/max stats stay tight on EVERY column in `cols`. The transient
    * z-key is dropped from the stored schema. */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 12): Unit =
    zorderBy(df, cols, numFiles, bits).drop("__zkey")
      .write.mode("overwrite").parquet(path)

  /** Data-skipping audit over a written layout: per-file [min, max] of
    * `c` from ONE scan grouped by file, returning (files, prunable)
    * under the predicate [qLo, qHi] — how many files a stats-aware
    * reader skips. The same footer stats the parquet reader consults,
    * measured engine-side so layouts can be compared in tests. */
  def skippableFiles(df: DataFrame, c: String, qLo: Long, qHi: Long): (Long, Long) = {
    val stats = df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
    val r = stats.agg(
      count(lit(1)).as("files"),
      sum(when(col("hi") < qLo || col("lo") > qHi, 1L).otherwise(0L)).as("prunable"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Globally-sorted export audit: range-partition `df` on a numeric
    * key into ≤ `numShards` shards, sort within each, and return ONE
    * manifest row per shard — (shard, n_rows, min_key, max_key,
    * inversions) — where `inversions` counts PHYSICAL out-of-order
    * adjacent row pairs, streamed per partition (not a window, which
    * would impose its own sort and audit nothing). A zero-inversion
    * manifest whose shard [min, max] ranges do not overlap proves the
    * export is globally ordered — the manifest a sharded training-data
    * or index export ships alongside its files.
    *
    * Scale shape: `repartitionByRange` is one sampling pass + ONE
    * shuffle (the cost floor of any global sort); the audit itself is
    * a single streaming pass per shard emitting one row — no second
    * exchange, no driver-side data beyond the |shards|-row manifest.
    * Shard ids are range-rank-ordered: shard i holds keys ≤ shard
    * i+1's (equal keys never split across shards). */
  def rangeSortedAudit(df: DataFrame, keyCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    shardAudit(df.select(col(keyCol).cast("double").as("__k"))
      .where(col("__k").isNotNull)
      .repartitionByRange(numShards, col("__k"))
      .sortWithinPartitions("__k"), "__k")
  }

  /** The audit half of [[rangeSortedAudit]] over the frame's CURRENT
    * physical layout (no repartition, no sort) — point it at a
    * read-back export to re-verify ordering without paying a shuffle.
    * The inversion counter observes real row order, so it detects a
    * layout that LOST its sort (which a window-based check, imposing
    * its own sort, never could). */
  def shardAudit(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df
      .select(col(keyCol).cast("double").as("__k"))
      .where(col("__k").isNotNull)
    parted.as[Double].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 1L; var inv = 0L
        var first = it.next(); var mn = first; var mx = first; var prev = first
        while (it.hasNext) {
          val v = it.next()
          if (v < prev) inv += 1
          if (v < mn) mn = v
          if (v > mx) mx = v
          prev = v; n += 1
        }
        Iterator((pid, n, mn, mx, inv))
      }
    }.toDF("shard", "n_rows", "min_key", "max_key", "inversions")
  }
}
