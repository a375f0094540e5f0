package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for UNPARTITIONED ranking/cumulative
  * windows — `row_number().over(Window.orderBy(…))` and running sums
  * over a whole table funnel every row through ONE reducer, which is
  * exactly the shape that dies first at 100 TB.
  *
  * Both helpers use the classic two-phase decomposition instead:
  *
  *   1. range-repartition on the order key (a parallel exchange whose
  *      partition boundaries come from Spark's range sampler), then
  *      rank/scan LOCALLY inside each range partition;
  *   2. lift local results to global ones by adding a per-partition
  *      offset (counts for row numbers, prefix totals for sums) —
  *      computed from the ≤`numPartitions`-row partition summary, which
  *      is the ONLY thing that ever passes through a single reducer.
  *
  * The global result is identical to the single-reducer window as long
  * as `order` is a TOTAL order (include a tie-breaker column): ranks
  * are then unique regardless of where the sampler happens to cut.
  * Cost: two parallel full-data exchanges (the range partition and the
  * local window's hash exchange on the partition id) instead of one
  * single-reducer exchange — at scale that trade is the whole point.
  *
  * Reference scope note: the reference engine has no ranking surface at
  * all (its verdicts are single-row aggregates); this exists for the
  * analytics queries layered on top (ABC/Pareto, rank-delta movers). */
object Windows {

  /** Test-only capture of the two-phase rank/cumsum SUB-plans: the
    * boundary-consistency fix pins `local` behind an RDD leaf
    * (GraftColumn.pinned), which removes the range exchange from the
    * caller's executedPlan — PlanSpec pins the two-phase shape from
    * these captures instead. Populated only while `capturePlans` is
    * set. */
  private[graft] val capturePlans =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val capturedPlans =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  private def capture(df: DataFrame): Unit =
    if (capturePlans.get)
      capturedPlans.add(df.queryExecution.executedPlan.toString)

  private def ranged(df: DataFrame, order: Seq[Column], partitions: Int) = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, order: _*)
      // pinned here (non-deterministic expr — Catalyst may not move it
      // across the exchange): the id of the RANGE partition each row
      // landed in, the grouping key for the local phase
      .withColumn("__wpid", spark_partition_id())
  }

  /** Global `row_number()` under `order` (must be a total order),
    * without a single-partition window over the data. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      out: String = "rn", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one order column")
    // The RANGED frame is PINNED to one physical instantiation before
    // fanning out (r14 bug fix, r15 cost fix): both consumers — the
    // offsets rollup and the ranked side of the final join — must see
    // the SAME range partitioning, and two separate physical
    // instantiations of the range exchange can sample DIFFERENT
    // boundaries (RangePartitioner's sample seed derives from the
    // rddId, which differs per instantiation) — offsets computed under
    // one boundary set joined against local ranks from another yield
    // silently wrong global ranks. Small fixtures never fire it
    // (sampling is exhaustive below ~20·partitions rows, so boundaries
    // are seed-independent), which is how the spec's value-equality
    // matrix stayed green for 13 rounds; q_conformal's rank-4042 read
    // at sf0.01 was off by 27 until r14. The r14 fix localCheckpointed
    // the whole RANKED frame — correct, but it materialized the corpus
    // to executor block storage per call AND truncated lineage
    // (executor loss ⇒ job restart on a real cluster). r15:
    // GraftColumn.pinned shares ONE RDD object instead (one
    // ShuffleDependency, one boundary set, lineage intact, nothing
    // stored), and the offsets rollup reads the PRE-window ranged frame
    // — per-partition counts don't need ranks — so the window itself
    // has exactly one consumer and runs exactly once.
    val wloc = Window.partitionBy(col("__wpid")).orderBy(order: _*)
    val pr = {
      val r = ranged(df, order, partitions)
      // test-only: the captured sub-plan must show the range exchange
      // (the pin hides it from every consumer plan behind an RDD leaf)
      if (capturePlans.get)
        capture(r.withColumn("__wlrn", row_number().over(wloc)))
      org.apache.spark.sql.GraftColumn.pinned(r)
    }
    val local = pr.withColumn("__wlrn", row_number().over(wloc))
    val offsets = pr.groupBy("__wpid")
      .agg(count(lit(1L)).as("__wcnt"))
      .withColumn("__woff", coalesce(sum(col("__wcnt")).over(
          Window.orderBy(col("__wpid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__wpid"), col("__woff"))
    local.join(broadcast(offsets), Seq("__wpid"))
      .withColumn(out, col("__woff") + col("__wlrn"))
      .drop("__wpid", "__wlrn", "__woff")
  }

  /** Global running sum of `value` under `order` (rows-between
    * unbounded-preceding..current under a total order), without a
    * single-partition window.
    *
    * Floating-point note: the two-phase sum groups additions
    * differently from a sequential scan, so double results can differ
    * in the last ulp from a single-reducer window; feed exact types
    * (longs, decimals, integer cents) when downstream compares sit on
    * knife edges. */
  def globalCumSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String = "cum", partitions: Int = 0): DataFrame =
    globalCumSums(df, order, Seq(value -> out), partitions)

  /** [[globalCumSum]] for SEVERAL value columns under the SAME order,
    * in ONE range exchange: each (value, out) pair gets its own global
    * running sum, all riding a single repartitionByRange + one local
    * window pass + one broadcast offset table — instead of n stacked
    * two-phase scans (n full-data exchanges). Same total-order and
    * floating-point contracts as [[globalCumSum]]. */
  def globalCumSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "globalCumSums needs at least one order column")
    require(values.nonEmpty, "globalCumSums needs at least one value column")
    val w = Window.partitionBy(col("__wpid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pinned for the same reason as [[globalRowNumber]], and likewise
    // the offsets rollup reads the PRE-window ranged frame (per-
    // partition totals don't need the running sums), so the window has
    // one consumer and runs once
    def localized(d: DataFrame): DataFrame =
      values.zipWithIndex.foldLeft(d) {
        case (acc, ((v, _), i)) => acc.withColumn(s"__wlcs$i", sum(v).over(w))
      }
    val pr = {
      val r = ranged(df, order, partitions)
      if (capturePlans.get) capture(localized(r))
      org.apache.spark.sql.GraftColumn.pinned(r)
    }
    val local = localized(pr)
    val woff = Window.orderBy(col("__wpid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = values.zipWithIndex
      .map { case ((v, _), i) => sum(v).as(s"__wtot$i") }
    val offsets = values.indices.foldLeft(
        pr.groupBy("__wpid").agg(totals.head, totals.tail: _*)) {
        (d, i) => d.withColumn(s"__woff$i", sum(col(s"__wtot$i")).over(woff))
      }
      .select(col("__wpid") +: values.indices.map(i => col(s"__woff$i")): _*)
    val joined = values.zipWithIndex.foldLeft(
      local.join(broadcast(offsets), Seq("__wpid"))) {
      // first range partition has no predecessor → offset 0 (coalesce
      // coerces the literal to the sum's own result type)
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__wlcs$i") + coalesce(col(s"__woff$i"), lit(0)))
    }
    joined.drop("__wpid")
      .drop(values.indices.flatMap(i => Seq(s"__wlcs$i", s"__woff$i")): _*)
  }
}
