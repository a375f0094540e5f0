package graft.streaming

import graft.exec.Runner
import graft.model.CheckSpec
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the engine's batch operators re-expressed
  * over unbounded inputs (`readStream` → transform → `writeStream`).
  *
  * The reference has no streaming at all (SURVEY.md §1.1); these are the
  * Spark-first extensions of its aggregation model. Every operator here
  * uses event-time watermarks so state is bounded: at 100 TB/day the
  * state store only holds windows/keys newer than the watermark, and
  * late data beyond it is dropped deterministically.
  */
object Streams {

  /** Tumbling event-time counts per key, watermarked. Late rows beyond
    * `watermark` are dropped; closed windows emit exactly once in append
    * mode. */
  def windowedCounts(stream: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(count(lit(1L)).as("n"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +: keys) :+ col("n"): _*)

  /** Event-time sessionization: rows within `gap` of each other merge
    * into one session (session_window is watermark-aware: a session
    * closes once the watermark passes its end). */
  def sessionCounts(stream: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(count(lit(1L)).as("n"))
      .select((col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +: keys) :+ col("n"): _*)

  /** Streaming exact dedup on key columns: state holds one entry per key
    * until the watermark passes its event time (dropDuplicates with
    * watermark — the streaming form of the exact-dedup operator). */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Per-key running aggregate via explicit state
    * (KeyValueGroupedDataset.mapGroupsWithState): count + sum per key
    * across micro-batches — the custom-state escape hatch for semantics
    * the built-in aggs can't express. */
  final case class KeyStats(key: String, n: Long, total: Double)

  def runningKeyStats(ds: Dataset[(String, Double)]): Dataset[KeyStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[KeyStats, KeyStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[KeyStats]) =>
          val prev = state.getOption.getOrElse(KeyStats(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { case (acc, (_, v)) =>
            KeyStats(key, acc.n + 1, acc.total + v)
          }
          state.update(next)
          next
      }
  }

  /** Continuous data-quality monitoring: the fused quick-check pass runs
    * per micro-batch (foreachBatch → Runner.verdictDF — one aggregate
    * scan of the batch, one verdict row out). `onBatch` receives
    * (batchId, verdict row); wire it to alerting or a report sink. The
    * stream itself is unmodified — this is a side-channel observer. */
  def checkMonitor(stream: DataFrame, checks: Seq[CheckSpec])(
      onBatch: (Long, Row) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) onBatch(batchId, Runner.verdictDF(batch, checks).head())
      }
}
