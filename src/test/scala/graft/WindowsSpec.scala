package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ops.Windows: the two-phase distributed rank/cumsum must be
  * value-identical to the single-reducer window forms (given a total
  * order) while keeping full-width rows out of any single partition. */
class WindowsSpec extends SparkSuite {

  test("globalRowNumber == row_number over a total order, any partition count") {
    import spark.implicits._
    val df = Seq(50, 10, 40, 10, 30, 20, 60, 10).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val expected = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = graft.ops.Windows.globalRowNumber(df,
          Seq(col("v"), col("id")), out = "rn", partitions = parts)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
      assert(got == expected.map { case (k, v) => k -> v.toLong },
        s"parts=$parts: $got vs $expected")
    }
  }

  test("globalCumSum == running window sum on exact types, any partition count") {
    import spark.implicits._
    val df = Seq(5L, 1L, 4L, 1L, 3L, 2L, 6L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val expected = df.select(col("id"),
        sum(col("v")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 4, 16)) {
      val got = graft.ops.Windows.globalCumSum(df,
          Seq(col("v"), col("id")), col("v"), out = "cum", partitions = parts)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
  }

  test("globalCumSums: several values in one range exchange, == stacked window sums") {
    import spark.implicits._
    val df = Seq((5L, 1L), (1L, 10L), (4L, 2L), (1L, 20L), (3L, 3L), (2L, 5L))
      .zipWithIndex.map { case ((v, x), i) => (i.toLong, v, x) }
      .toDF("id", "v", "x")
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.select(col("id"),
        sum(col("v")).over(w).as("cv"), sum(col("x")).over(w).as("cx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = graft.ops.Windows.globalCumSums(df, Seq(col("v"), col("id")),
          Seq(col("v") -> "cv", col("x") -> "cx"), partitions = parts)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("cv"), r.getAs[Long]("cx"))).toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
    // one range exchange total — adding value columns must not add
    // exchanges over the single-value form
    def nRange(d: org.apache.spark.sql.DataFrame) =
      "rangepartitioning\\(".r.findAllIn(
        d.queryExecution.executedPlan.toString).size
    val multi = nRange(graft.ops.Windows.globalCumSums(df,
      Seq(col("v"), col("id")), Seq(col("v") -> "cv", col("x") -> "cx")))
    val single = nRange(graft.ops.Windows.globalCumSum(df,
      Seq(col("v"), col("id")), col("v"), "cv"))
    assert(multi == single,
      s"multi-value cumsum added range exchanges: $multi vs $single")
  }

  test("edge cases: empty input, null order keys, constant order values") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Long, Long)].toDF("id", "v")
    assert(graft.ops.Windows.globalRowNumber(empty,
      Seq(col("v"), col("id")), out = "rn").count() == 0)
    assert(graft.ops.Windows.globalCumSum(empty,
      Seq(col("v"), col("id")), col("v"), out = "cum").count() == 0)
    // null order keys: must match the single-reducer window's
    // nulls-first placement, not drop or misplace rows
    val withNulls = Seq((1L, java.lang.Long.valueOf(5L)),
        (2L, null.asInstanceOf[java.lang.Long]),
        (3L, java.lang.Long.valueOf(1L)),
        (4L, null.asInstanceOf[java.lang.Long])).toDF("id", "v")
    val expected = withNulls.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = graft.ops.Windows.globalRowNumber(withNulls,
        Seq(col("v"), col("id")), out = "rn", partitions = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    assert(got == expected, s"null keys: $got vs $expected")
    // constant order value (worst case for a range partitioner: one
    // boundary bucket) still ranks correctly via the id tie-breaker
    val const = (1L to 20L).map(i => (i, 7L)).toDF("id", "v")
    val crn = graft.ops.Windows.globalRowNumber(const,
        Seq(col("v"), col("id")), out = "rn", partitions = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    assert(crn == (1L to 20L).map(i => i -> i).toMap)
  }

  test("no SinglePartition exchange ever carries the data rows") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, (i * 7919) % 101)).toDF("id", "v")
    val plan = graft.ops.Windows.globalRowNumber(df,
      Seq(col("v"), col("id")), out = "rn").queryExecution.executedPlan
    val single = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    // the only single-partition traffic allowed is the ≤numPartitions-row
    // partition summary (__wpid/__wcnt) — never id/v data rows
    single.foreach { e =>
      assert(e.output.forall(a => a.name.startsWith("__w")),
        s"data rows crossed a single-partition exchange: ${e.output.map(_.name)}")
    }
  }

  test("rank-k read stays exact above the sampler threshold with a pruned offsets consumer") {
    // Regression (r14): globalRowNumber's offsets rollup and final join
    // used to instantiate the range exchange TWICE; divergent column
    // pruning between the consumers made the two instantiations
    // canonically different, so they sampled DIFFERENT boundaries (the
    // sampler seed derives from the rddId) and offsets no longer
    // matched local ranks — q_conformal's order statistic at sf0.01
    // read rank 4042 as the value at true rank 4015. Fires only above
    // the exhaustive-sampling threshold (~20·partitions rows), which is
    // why small fixtures stayed green. The frame here reproduces the
    // triggering shape: a checkpointed parent, a filter, and a single
    // rank-k read that prunes every column but the rank.
    import spark.implicits._
    val n = 20000L
    val df = (1L to n).map(i => (i, ((i * 48271) % 9973).toDouble))
      .toDF("id", "v").localCheckpoint(true)
    val sub = df.where(col("id") % 3 =!= 0)
    val k = 7001L
    val ranked = graft.ops.Windows.globalRowNumber(sub,
      Seq(col("v"), col("id")), out = "rn")
    val atK = ranked.where(col("rn") === k).select("v", "id").head()
    // ground truth by definition of rank: exactly k rows at or below
    val below = sub.where(col("v") < atK.getDouble(0) ||
      (col("v") === atK.getDouble(0) && col("id") <= atK.getLong(1))).count()
    assert(below == k, s"rank-$k read returned the value at true rank $below")
    // and the cumsum twin: the global running count at the same spot
    // must agree with the rank
    val cum = graft.ops.Windows.globalCumSum(sub,
      Seq(col("v"), col("id")), lit(1L), out = "c")
    val cAtK = cum.where(col("v") === atK.getDouble(0) &&
      col("id") === atK.getLong(1)).head().getAs[Long]("c")
    assert(cAtK == k, s"cumsum at the rank-$k row reads $cAtK")
  }
}
