package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** r17 (VERDICT r16 #6): `Analytics.exactPercentileByGroup` replaces the
  * built-in exact `percentile` at every remaining GROUPED call site
  * (brownForsythe/robustStatsByGroup/theilSenByKey/seasonalBaseline
  * exact branches, imputeByGroup exact median) — the built-in keeps one
  * OpenHashMap of boxed keys PER GROUP in every aggregation buffer, the
  * §5 executor-memory hazard. The replacement claims BIT-IDENTICAL
  * results per group — same value-at-rank selection, same interpolation
  * arithmetic as the r16 global form — so this spec compares raw double
  * bits against the built-in across group shapes: many groups,
  * many-distinct and heavy-duplicate values, skewed group sizes,
  * single-row groups, null values (dropped per group; all-null groups
  * keep a NULL row), and null group keys, at several interior and edge
  * percentiles. */
class GroupedPercentileRankSpec extends SparkSuite {

  import spark.implicits._

  private val ps = Seq(0.0, 0.05, 0.333, 0.5, 0.95, 0.99, 1.0)

  private def check(df: org.apache.spark.sql.DataFrame, g: String,
      c: String, label: String): Unit = {
    val mine = Analytics.exactPercentileByGroup(df, col(g), col(c),
        ps.zipWithIndex.map { case (p, i) => p -> s"p$i" })
      .collect().map(r => r.get(0) -> r).toMap
    val builtin = df.groupBy(col(g).as("__g")).agg(
        ps.map(p => percentile(col(c).cast("double"), lit(p))).head,
        ps.map(p => percentile(col(c).cast("double"), lit(p))).tail: _*)
      .collect().map(r => r.get(0) -> r).toMap
    assert(mine.keySet == builtin.keySet,
      s"$label: group sets differ ${mine.keySet} vs ${builtin.keySet}")
    builtin.foreach { case (gv, b) =>
      val m = mine(gv)
      ps.indices.foreach { i =>
        val (a, bb) = (m.isNullAt(i + 1), b.isNullAt(i + 1))
        assert(a == bb,
          s"$label g=$gv p=${ps(i)}: null mismatch mine=$a builtin=$bb")
        if (!a) assert(
          java.lang.Double.doubleToRawLongBits(m.getDouble(i + 1)) ==
            java.lang.Double.doubleToRawLongBits(b.getDouble(i + 1)),
          s"$label g=$gv p=${ps(i)}: ${m.getDouble(i + 1)} != ${b.getDouble(i + 1)}")
      }
    }
  }

  test("grouped rank-based exact percentiles are bit-identical to the built-in") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    check(li, "l_returnflag", "l_extendedprice",
      "lineitem prices by returnflag (many distinct values)")
    check(li, "l_linestatus", "l_quantity",
      "lineitem quantities by linestatus (heavy duplicates)")
    check(li, "l_suppkey", "l_discount",
      "discount by suppkey (many small groups)")
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    check(ev, "event_type", "value", "event values by type")
  }

  test("corner shapes: single-row groups, nulls, all-null group, null keys") {
    check(Seq(("a", 3.0), ("a", 1.0), ("b", 2.0)).toDF("g", "v"), "g", "v",
      "one single-row group")
    check(Seq(("a", Some(2.0)), ("a", None), ("b", None), ("b", None),
        ("c", Some(1.0)), ("a", Some(2.0))).toDF("g", "v"), "g", "v",
      "all-null group keeps a NULL row; ties at the median")
    check(Seq((Some("a"), 1.0), (None, 2.0), (None, 4.0), (Some("a"), 3.0))
      .toDF("g", "v"), "g", "v", "null group key is its own group")
    val empty = spark.range(0)
      .select(col("id").cast("string").as("g"), col("id").cast("double").as("v"))
    assert(Analytics.exactPercentileByGroup(empty, col("g"), col("v"),
      Seq(0.5 -> "m")).count() == 0, "empty input must yield no groups")
  }
}
