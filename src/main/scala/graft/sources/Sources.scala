package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source surface mirroring the reference's four source kinds
  * (ValidatorTable.scala:228-392, ConfigParser.scala:19-25): metastore
  * table, orc, parquet, and the generic format+options loader. All return
  * lazy DataFrames; an optional `condition` is applied at open so Catalyst
  * pushes it into the scan (ValidatorTable.scala:20-22).
  */
object Sources {

  def hiveTable(s: SparkSession, name: String, condition: Option[String] = None): DataFrame =
    where(s.table(name), condition)

  def parquet(s: SparkSession, path: String, condition: Option[String] = None): DataFrame =
    where(s.read.parquet(path), condition)

  def orc(s: SparkSession, path: String, condition: Option[String] = None): DataFrame =
    where(s.read.orc(path), condition)

  def csv(s: SparkSession, path: String, options: Map[String, String] = Map.empty,
      condition: Option[String] = None): DataFrame =
    where(s.read.options(options).csv(path), condition)

  def json(s: SparkSession, path: String, options: Map[String, String] = Map.empty,
      condition: Option[String] = None): DataFrame =
    where(s.read.options(options).json(path), condition)

  /** Generic DataSource loader: `format` + `options` + paths
    * (ValidatorTable.scala:277-326). */
  def format(s: SparkSession, fmt: String, options: Map[String, String],
      paths: Seq[String], condition: Option[String] = None): DataFrame = {
    val r = s.read.format(fmt).options(options)
    where(if (paths.isEmpty) r.load() else r.load(paths: _*), condition)
  }

  /** Testdata table loader. The events `ts` column has shipped in two
    * physical encodings across testdata generations; [[normalizeEventTs]]
    * maps both to the same session-timezone TimestampType so every
    * downstream operator (windows, intervals, watermarks) sees one type. */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
    else s.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to TimestampType (µs instants),
    * whatever the parquet file encoded:
    *   - INT64 TIMESTAMP(NANOS): Spark 4 rejects it unless
    *     `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as a
    *     LongType of epoch nanos (set at build time by
    *     Main/Bench/Verify/SharedSpark — a loader mutating shared session
    *     conf would be racy under concurrent use of one session); the
    *     generator emits whole-microsecond values, so ns→µs is lossless.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *     TimestampNTZType; cast to TimestampType under the pinned UTC
    *     session timezone — the same epoch-µs instants as the nanos path.
    *   - Already TimestampType: pass through. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Write a catalog table bucketed (and sorted) by join keys: two
    * tables bucketed the same way join WITHOUT an exchange — the scan
    * already delivers the required hash distribution, so at 100 TB the
    * recurring fact⋈fact join pays zero shuffle after a one-time
    * bucketed write. Buckets also serve as pre-sorted runs, eliminating
    * the sort of a sort-merge join. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Hive-style partitioned writer with small-file discipline: without
    * the pre-shuffle, EVERY task holding any rows of a partition value
    * opens its own file — 10k tasks × 100 partition values = 1M tiny
    * files, the classic 100 TB writer failure. Repartitioning on the
    * partition columns (+ a content-hash salt when one partition value
    * is too big for one task) routes each partition value to exactly
    * `shardsPerPartition` tasks → that many files, each additionally
    * bounded by `maxRecordsPerFile`. The salt hashes the non-partition
    * columns, so it is retry-stable and splits WITHIN a partition. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      shardsPerPartition: Int = 1, maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(shardsPerPartition > 0, "shardsPerPartition must be positive")
    val keys = partitionCols.map(col)
    // explicit partition COUNT: an un-numbered repartition is fair game
    // for AQE coalescing, which would re-merge the shards of a small
    // write (and at scale leave the shard count to the advisory size
    // instead of the requested parallelism)
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val routed =
      if (shardsPerPartition == 1) df.repartition(n, keys: _*)
      else {
        val others = df.columns.filterNot(partitionCols.contains).map(col)
        df.withColumn("__shard",
            pmod(xxhash64(others: _*), lit(shardsPerPartition.toLong)))
          .repartition(n, keys :+ col("__shard"): _*)
          .drop("__shard")
      }
    routed.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  private def where(df: DataFrame, condition: Option[String]): DataFrame =
    condition.fold(df)(df.where)

  /** Union ingestion batches whose schemas have EVOLVED (columns added
    * or dropped between snapshots): `unionByName` with missing-column
    * null padding, plus a `__batch` provenance column (the path's base
    * name) so downstream audits can attribute nulls to the batch that
    * lacked the column — silent positional union is exactly how an
    * added column ends up misaligned at ingestion. Reading N batches
    * stays N parallel scans; no shuffle is introduced. */
  def unionWithEvolution(spark: SparkSession, paths: Seq[String],
      batchCol: String = "__batch"): DataFrame = {
    require(paths.nonEmpty, "need at least one batch path")
    paths.map { p =>
      spark.read.parquet(p)
        .withColumn(batchCol, lit(new java.io.File(p).getName))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
