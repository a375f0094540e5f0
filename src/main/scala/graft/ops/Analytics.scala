package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-grade relational operators beyond the reference's surface
  * (SURVEY.md §7 Phase 3). All are declarative DataFrame compositions —
  * Catalyst picks physical strategies (broadcast vs SMJ, partial aggs),
  * AQE re-plans at runtime. Nothing here collects data to the driver.
  */
object Analytics {

  /** Star-schema dimension join: fact ⋈ small dims. Dims are explicitly
    * broadcast — at 100 TB the fact side never shuffles for these joins. */
  def dimJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (df, (dim, cond)) => df.join(broadcast(dim), cond) }

  /** Top-k rows per group, deterministic via explicit tie-break ordering.
    * row_number + filter compiles to a single window stage; with k small
    * Spark pushes a per-partition top-k (WindowGroupLimit) before the
    * shuffle, so the exchange carries only k rows per group per partition. */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }

  /** Global top-k with deterministic tie-break: TakeOrderedAndProject —
    * per-partition heaps, only k rows cross the network. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Running aggregate over an ordered per-key stream (ROWS UNBOUNDED
    * PRECEDING → CURRENT ROW). One shuffle on the partition keys. */
  def runningAgg(df: DataFrame, partition: Seq[Column], order: Seq[Column],
      agg: Column, name: String): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(name, agg.over(w))
  }

  /** Tumbling event-time window aggregation (batch twin of the streaming
    * path in graft.streaming). Emits the window start as epoch seconds so
    * results are engine-portable. */
  def tumblingAgg(df: DataFrame, ts: Column, width: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sessionization: groups a user's events into sessions separated by
    * gaps > `gap`. Uses session_window (state-store-compatible with the
    * streaming path); one shuffle on the keys. */
  def sessionAgg(df: DataFrame, ts: Column, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")
}
