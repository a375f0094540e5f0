package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** r16: `Analytics.exactPercentileRow` replaces the built-in exact
  * `percentile` aggregate on the hot robustStats path (the built-in's
  * boxed-key OpenHashMap measured 3.3–4.5s over sf0.1's 600k-distinct
  * prices). The replacement claims BIT-IDENTICAL results — same
  * value-at-rank selection, same interpolation arithmetic — so this
  * spec compares raw double bits against the built-in across data
  * shapes: many-distinct, heavy-duplicate (tie ranks), tiny n, single
  * row, empty, and null-bearing inputs, at several interior and edge
  * percentiles. */
class PercentileRankSpec extends SparkSuite {

  import spark.implicits._

  private val ps = Seq(0.0, 0.05, 0.333, 0.5, 0.95, 0.99, 1.0)

  private def check(df: org.apache.spark.sql.DataFrame, c: String,
      label: String): Unit = {
    val mine = Analytics.exactPercentileRow(df, col(c),
      ps.zipWithIndex.map { case (p, i) => p -> s"p$i" }).head()
    val builtin = df.agg(
      ps.map(p => percentile(col(c).cast("double"), lit(p))).head,
      ps.map(p => percentile(col(c).cast("double"), lit(p))).tail: _*).head()
    ps.indices.foreach { i =>
      val (a, b) = (mine.isNullAt(i), builtin.isNullAt(i))
      assert(a == b, s"$label p=${ps(i)}: null mismatch mine=$a builtin=$b")
      if (!a) assert(
        java.lang.Double.doubleToRawLongBits(mine.getDouble(i)) ==
          java.lang.Double.doubleToRawLongBits(builtin.getDouble(i)),
        s"$label p=${ps(i)}: ${mine.getDouble(i)} != ${builtin.getDouble(i)}")
    }
  }

  test("rank-based exact percentiles are bit-identical to the built-in") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    check(li, "l_extendedprice", "lineitem prices (many distinct)")
    check(li, "l_quantity", "lineitem quantities (heavy duplicates)")
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    check(ev, "value", "event values")
  }

  test("corner shapes: tiny, single-row, nulls, empty") {
    check(Seq(3.0, 1.0, 2.0).toDF("v"), "v", "three rows")
    check(Seq(42.0).toDF("v"), "v", "one row")
    check(Seq(Some(2.0), None, Some(1.0), None, Some(2.0)).toDF("v"), "v",
      "nulls dropped, tie at the median")
    val empty = spark.range(0).select(col("id").cast("double").as("v"))
    val r = Analytics.exactPercentileRow(empty, col("v"), Seq(0.5 -> "m")).head()
    assert(r.isNullAt(0), "empty input must yield NULL like the built-in")
  }
}
