package graft

import graft.ops.{Analytics, DataPrep, Skew}
import org.apache.spark.sql.functions._

/** Unit semantics for the relational operators that are not fully pinned
  * by their DuckDB oracles: as-of join edges (ties, no-match, collisions)
  * and salted-join input validation. */
class AnalyticsSpec extends SparkSuite {

  test("TableHealth: orphans counted by rows and keys; freshness; gap runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val parent = Seq(1L, 3L).toDF("pk")
    val ri = graft.ops.TableHealth
      .refIntegrity(child, col("k"), parent, col("pk")).head()
    assert(ri.getLong(0) == 4 && ri.getLong(1) == 1 && ri.getLong(2) == 1)
    assert(!ri.getBoolean(3))
    // freshness: newest at epoch 1000, asOf 1500, max lag 400 -> stale
    val ev = Seq(100L, 900L, 1000L).map(e =>
      new java.sql.Timestamp(e * 1000L)).toDF("ts")
    val fr = graft.ops.TableHealth
      .freshness(ev, col("ts"), asOfEpoch = 1500L, maxLagSeconds = 400L,
        recentSeconds = 700L).head()
    assert(fr.getLong(0) == 1000L && fr.getLong(1) == 500L)
    assert(fr.getLong(2) == 2 && !fr.getBoolean(3))
    // gaps: buckets 0, 100, 400 at width 100 -> one gap of 2 buckets
    val ts = Seq(0L, 150L, 420L).map(e =>
      new java.sql.Timestamp(e * 1000L)).toDF("ts")
    val gaps = graft.ops.TableHealth.bucketGaps(ts, col("ts"), 100L)
      .as[(Long, Long, Long)].collect()
    assert(gaps.toSeq == Seq((200L, 300L, 2L)), s"got ${gaps.toSeq}")
  }

  test("aucBrier: perfect separation 1.0, reversed 0.0, ties average to 0.5") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def auc(rows: Seq[(Double, Int)]): (Double, Double) = {
      val r = graft.ops.Analytics
        .aucBrier(rows.toDF("s", "y"), col("s"), col("y")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // perfect ranking: all positives above all negatives
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))._1 == 1.0)
    // perfectly wrong
    assert(auc(Seq((0.1, 1), (0.2, 0)))._1 == 0.0)
    // constant score: every pair is a tie -> 0.5
    assert(auc(Seq((0.5, 1), (0.5, 1), (0.5, 0)))._1 == 0.5)
    // hand case with a tie straddling the classes:
    // scores 0.3(+), 0.3(-), 0.7(+): pairs (0.7 vs 0.3-)=1, (0.3+ vs 0.3-)=0.5
    // AUC = 1.5/2
    val (a, b) = auc(Seq((0.3, 1), (0.3, 0), (0.7, 1)))
    assert(a == 0.75, s"auc $a")
    // Brier: ((0.3-1)^2 + (0.3-0)^2 + (0.7-1)^2)/3, rounded to 6dp
    assert(b == BigDecimal((0.49 + 0.09 + 0.09) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"brier $b")
  }

  test("binnedOverlapJoin: inclusive overlap, bin-spanning dedup, non-overlap excluded") {
    import spark.implicits._
    val a = Seq((1L, 100L, 200L), (2L, 500L, 600L)).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 150L, 450L), // overlaps interval 1 across multiple 100s bins
      (11L, 200L, 210L), // touches interval 1 exactly at the endpoint
      (12L, 601L, 700L)) // starts just after interval 2 ends
      .toDF("b_id", "b_s", "b_e")
    val got = graft.ops.Analytics
      .binnedOverlapJoin(a, "a_s", "a_e", b, "b_s", "b_e", binSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L)), s"got $got")
  }

  test("joinSizeEstimate: exact product-of-counts, hottest key") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq(1, 1, 1, 2, 3).toDF("k")
    val b = Seq(1, 1, 2, 4).toDF("k2")
    val r = graft.ops.Skew.joinSizeEstimate(a, col("k"), b, col("k2")).head()
    // key 1: 3*2=6, key 2: 1*1=1; keys 3,4 don't meet
    assert(r.getLong(0) == 7 && r.getLong(1) == 2 && r.getLong(2) == 6)
    // prediction equals the actual join size
    assert(a.join(b, col("k") === col("k2")).count() == 7)
  }

  test("regularizeSeries: gaps generated, forward-filled, flagged; spans independent per key") {
    import spark.implicits._
    // key 1: buckets 0, 30, 90 (gap at 60); key 2: single bucket
    val obs = Seq((1L, 0L, 10.0), (1L, 30L, 20.0), (1L, 90L, 40.0),
      (2L, 60L, 7.0)).toDF("k", "bucket", "v")
    val got = graft.ops.Analytics.regularizeSeries(obs, Seq("k"), "bucket", "v", 30L)
      .orderBy("k", "bucket")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 10.0, true), (1L, 30L, 20.0, true),
      (1L, 60L, 20.0, false), // generated + forward-filled
      (1L, 90L, 40.0, true),
      (2L, 60L, 7.0, true))) // span never leaks across keys
  }

  test("chiSquare: independence gives 0; perfect association gives V=1; zero cells fold in") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // perfectly independent 2x2: equal counts everywhere
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .flatMap(Seq.fill(5)(_)).toDF("a", "b")
    val r1 = graft.ops.Analytics.chiSquare(ind, col("a"), col("b")).head()
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1 && r1.getLong(2) == 20)
    assert(r1.getDouble(3) == 0.0)
    // perfect association with ABSENT off-diagonal cells: x->p, y->q only
    // chi2 = n for a 2x2 diagonal table; V = 1
    val dep = Seq(("x", "p"), ("y", "q")).flatMap(Seq.fill(6)(_)).toDF("a", "b")
    val r2 = graft.ops.Analytics.chiSquare(dep, col("a"), col("b")).head()
    assert(r2.getDouble(0) == 12.0, s"chi2 ${r2.getDouble(0)}")
    assert(r2.getDouble(3) == 1.0, s"V ${r2.getDouble(3)}")
    // single-category side: V is NULL, dof 0
    val one = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val r3 = graft.ops.Analytics.chiSquare(one, col("a"), col("b")).head()
    assert(r3.getLong(1) == 0 && r3.isNullAt(3))
  }

  test("ewma: hand-computed weights, warm-up rows, window aging") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one series: 10, 20, 40; alpha=0.5 -> weights 1, 1/2, 1/4 (current first)
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 40.0),
      (2L, 1L, 7.0)).toDF("k", "t", "v")
    val got = graft.ops.Analytics.ewma(df, Seq(col("k")), Seq(col("t")),
        col("v"), alpha = 0.5, window = 2)
      .orderBy("k", "t").select("ewma").as[Double].collect()
    // k=1: t1: 10; t2: (20 + 10*0.5)/1.5; t3: (40 + 20*0.5)/1.5 (10 aged out)
    assert(got(0) == 10.0)
    assert(got(1) == BigDecimal(25.0 / 1.5).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2) == BigDecimal(50.0 / 1.5).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // singleton partition: ewma = value
    assert(got(3) == 7.0)
  }

  test("profileTable: per-column stats in one scan, type-aware nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(2.5), Some("aa")),
      (2L, None, Some("bbbb")),
      (3L, Some(7.5), None),
      (3L, Some(2.5), Some("c"))).toDF("id", "v", "s")
    val p = graft.ops.Profiler.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0)
    assert(p("v").getLong(2) == 1 && p("s").getLong(2) == 1)
    // HLL at rsd=0.02 is exact at these cardinalities
    assert(p("id").getLong(3) == 3 && p("v").getLong(3) == 2)
    assert(p("id").getDouble(4) == 1.0 && p("id").getDouble(5) == 3.0)
    assert(p("v").getDouble(4) == 2.5 && p("v").getDouble(5) == 7.5)
    // strings: no numeric min/max, length bounds instead
    assert(p("s").isNullAt(4) && p("s").isNullAt(5))
    assert(p("s").getInt(6) == 1 && p("s").getInt(7) == 4)
    assert(p("id").isNullAt(6) && p("id").isNullAt(7))
    // ONE scan + a single 1-row exchange regardless of width
    val plan = graft.ops.Profiler.profileTable(df)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"one exchange expected:\n$plan")
  }

  test("reciprocalRankFusion: consensus beats a single first place") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // list A: x first, y second; list B: y first, z second; y's consensus
    // (2nd+1st) must outrank x's lone 1st at k=60
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "rank")
    val b = Seq(("y", 1), ("z", 2)).toDF("id", "rank")
    val fused = graft.ops.Analytics
      .reciprocalRankFusion(Seq(a, b), "id", "rank")
      .orderBy(col("rrf").desc, col("id"))
      .as[(String, Double, Long)].collect()
    assert(fused.map(_._1).toSeq == Seq("y", "x", "z"))
    assert(fused.head._3 == 2L && fused(1)._3 == 1L)
    val exp = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(fused.head._2 - exp) < 1e-12)
  }
  import spark.implicits._

  test("rollingAnomalies: spike flagged against trailing HISTORY, thin history never flags") {
    val ev = Seq(
      (1L, 0L, 10.0),    // no history -> unflagged
      (2L, 60L, 10.4),   // one history point -> stddev null -> unflagged
      (3L, 120L, 10.2), (4L, 180L, 9.8),
      (5L, 240L, 100.0), // spike vs the history {10, 10.4, 10.2, 9.8}
      (6L, 7200L, 55.5)  // history aged out -> unflagged
    ).toDF("event_id", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("u", lit("a"))
    val r = Analytics.rollingAnomalies(ev, Seq(col("u")), col("ts"), 3600,
        col("v"), k = 3.0)
      .select("event_id", "is_anomaly")
      .collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r(5L), "the spike must be flagged against its history")
    assert(!r(1L) && !r(2L), "fewer than two history points must not flag")
    assert(!r(3L) && !r(4L), "steady readings must pass")
    assert(!r(6L), "aged-out history must not flag")
  }

  test("driftPsi: zero on identical data, large on a shift, finite on constant columns") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = Analytics.driftPsi(a, a, col("v")).head
    assert(same.getAs[Double]("psi") == 0.0, "identical distributions must give PSI 0")
    assert(same.getAs[Long]("n_a") == 100 && same.getAs[Int]("n_bins") == 10)
    val shifted = (101 to 200).map(_.toDouble).toDF("v")
    val drift = Analytics.driftPsi(a, shifted, col("v")).head.getAs[Double]("psi")
    assert(drift > 0.25, s"disjoint ranges must read as drifted, got $drift")
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val c = Analytics.driftPsi(const, const, col("v")).head.getAs[Double]("psi")
    assert(!c.isNaN && !c.isInfinite && c == 0.0)
  }

  test("correlationStats: hand-computed Pearson/Spearman, tie-averaged ranks") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0)).toDF("x", "y")
    val r = Analytics.correlationStats(df, col("x"), col("y")).head
    assert(math.abs(r.getAs[Double]("pearson") - 10.0 / math.sqrt(1000.0 / 9)) < 1e-12)
    assert(math.abs(r.getAs[Double]("covar") - 10.0) < 1e-12)
    // ranks rx = (1, 2.5, 2.5, 4) vs ry = (1,2,3,4) -> 1.5/sqrt(2.5)
    assert(math.abs(r.getAs[Double]("spearman") - 1.5 / math.sqrt(2.5)) < 1e-12)
    // monotone nonlinear: Spearman 1, Pearson below 1
    val m = Analytics.correlationStats(
      Seq((1.0, 1.0), (2.0, 10.0), (3.0, 100.0)).toDF("x", "y"),
      col("x"), col("y")).head
    assert(math.abs(m.getAs[Double]("spearman") - 1.0) < 1e-12)
    assert(m.getAs[Double]("pearson") < 1.0 - 1e-6)
  }

  test("robustStats: hand-computed trim/winsor on data with a gross outlier") {
    val df = ((1 to 10).map(_.toDouble) :+ 1000.0).toDF("v")
    val r = Analytics.robustStats(df, col("v"), trim = 0.1, exact = true).head
    // sorted 1..10,1000; interpolated p10 = 2, p90 = 10
    assert(r.getAs[Double]("p_lo") == 2.0 && r.getAs[Double]("p_hi") == 10.0)
    assert(r.getAs[Double]("trimmed_mean") == 6.0) // mean of 2..10 — outlier gone
    // winsorized: (2,2,3..10,10) -> var 9.2
    assert(math.abs(r.getAs[Double]("winsor_std") - math.sqrt(9.2)) < 1e-12)
    assert(r.getAs[Long]("n") == 11 && r.getAs[Long]("n_trimmed") == 2)
    // inclusive tail masses: {1,2} at or below p_lo, {10,1000} at or above p_hi
    assert(r.getAs[Long]("n_le_lo") == 2 && r.getAs[Long]("n_ge_hi") == 2)
    // approx default: same shape, thresholds inside the data range
    val a = Analytics.robustStats(df, col("v"), trim = 0.1).head
    assert(a.getAs[Double]("p_lo") >= 1.0 && a.getAs[Double]("p_hi") <= 1000.0)
  }

  test("slidingAgg: width 2x slide puts each event in exactly two epoch-aligned windows") {
    val ev = Seq((0L, 1.0), (1800L, 2.0), (5400L, 4.0)).toDF("sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Analytics.slidingAgg(ev, col("ts"), "1 hour", "30 minutes",
        Seq.empty, Seq(count(lit(1L)).as("n"), sum(col("v")).as("s")))
      .collect().map(x => x.getAs[Long]("w_start") ->
        (x.getAs[Long]("n"), x.getAs[Double]("s"))).toMap
    // t=0 -> windows [-1800, 0]; t=1800 -> [0, 1800]; t=5400 -> [3600, 5400]
    assert(r === Map(
      -1800L -> (1L, 1.0), 0L -> (2L, 3.0), 1800L -> (1L, 2.0),
      3600L -> (1L, 4.0), 5400L -> (1L, 4.0)))
  }

  test("diagnoseKeys ranks hot keys with exact share and salt recommendation") {
    // key "hot": 60 rows, "warm": 30, "cold": 10 -> total 100, mean 100/3
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(10)("cold"))
      .toDF("k")
    val r = Skew.diagnoseKeys(df, col("k"), topK = 2, targetRowsPerTask = 25L)
      .collect()
    assert(r.map(_.getString(0)).toSeq == Seq("hot", "warm"))
    val hot = r(0)
    assert(hot.getLong(1) == 60L)
    assert(hot.getDouble(2) == 60.0)                       // share_pct
    assert(math.abs(hot.getDouble(3) - 1.8) < 1e-9)        // 60 / (100/3)
    assert(hot.getInt(4) == 3)                             // ceil(60/25)
  }

  test("rollingTimeAgg: trailing 1h window, inclusive boundary, per-user isolation") {
    val ev = Seq(
      (1L, "a", 0L, 1.0),     // alone in its window
      (2L, "a", 1800L, 2.0),  // sees row 1
      (3L, "a", 3600L, 4.0),  // sees rows 1 (exactly 3600s back, inclusive) and 2
      (4L, "a", 3661L, 8.0),  // itself + rows 2,3; row 1 aged out
      (5L, "b", 1800L, 16.0)  // other user: isolated
    ).toDF("event_id", "user", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Analytics.rollingTimeAgg(ev, Seq(col("user")), col("ts"), 3600,
        Seq(count(lit(1L)) -> "n", sum(col("v")) -> "s"))
      .select(col("event_id"), col("n"), col("s"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) == ((1L, 1.0)))
    assert(r(2L) == ((2L, 3.0)))
    assert(r(3L) == ((3L, 7.0)))
    assert(r(4L) == ((3L, 14.0)))
    assert(r(5L) == ((1L, 16.0)))
  }

  test("asofJoin: latest-at-or-before per key, inclusive ties, NULL before first right row") {
    val left = Seq(
      (1L, "u1", 10L), // before any right row -> NULL
      (2L, "u1", 20L), // tie with right ts=20 -> inclusive match
      (3L, "u1", 35L), // between 30 and 40 -> value at 30
      (4L, "u2", 50L), // other key, after its only right row
      (5L, "u3", 50L)  // key with no right rows at all -> NULL
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      ("u1", 20L, 2.0),
      ("u1", 30L, 3.0),
      ("u1", 40L, 4.0),
      ("u2", 45L, 45.0)
    ).toDF("key", "r_ts", "v")
    val got = Analytics.asofJoin(left, right, Seq("key"), "ts", "r_ts")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(45.0), 5L -> None))
  }

  test("asofJoin forward: earliest-at-or-after per key, inclusive ties, NULL after last right row") {
    val left = Seq(
      (1L, "u1", 10L), // before all right rows -> earliest (20)
      (2L, "u1", 20L), // tie with right ts=20 -> inclusive match
      (3L, "u1", 35L), // between 30 and 40 -> value at 40
      (4L, "u1", 45L), // after the last right row -> NULL
      (5L, "u2", 40L), // other key, before its only right row
      (6L, "u3", 50L)  // key with no right rows at all -> NULL
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      ("u1", 20L, 2.0),
      ("u1", 30L, 3.0),
      ("u1", 40L, 4.0),
      ("u2", 45L, 45.0)
    ).toDF("key", "r_ts", "v")
    val got = Analytics.asofJoin(left, right, Seq("key"), "ts", "r_ts",
        direction = "forward")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(4.0),
      4L -> None, 5L -> Some(45.0), 6L -> None))
    intercept[IllegalArgumentException](
      Analytics.asofJoin(left, right, Seq("key"), "ts", "r_ts", direction = "nearest"))
  }

  test("funnel: ordered steps, strict succession, window anchored at the FIRST step-1 event") {
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val events = Seq(
      ("u1", t(0), "view"), ("u1", t(10), "click"), ("u1", t(20), "buy"),   // completes
      ("u2", t(0), "click"), ("u2", t(5), "view"), ("u2", t(10), "buy"),    // click precedes view: step 1 only
      ("u3", t(0), "view"), ("u3", t(130), "click"),                        // click past the 2h window: step 1
      ("u4", t(0), "view"), ("u4", t(5), "view"), ("u4", t(7), "click"),
      ("u4", t(7), "buy"),                                                  // buy not strictly later: step 2
      ("u5", t(0), "buy"),                                                  // never starts
      ("u6", t(0), "view"), ("u6", t(60), "view"), ("u6", t(125), "click")  // anchor stays at FIRST view: expired
    ).toDF("user", "ts", "etype")
    val got = graft.ops.Analytics.funnel(events, col("user"), col("ts"),
        col("etype"), Seq("view", "click", "buy"), "2 hours")
      .select("step", "step_name", "n_users")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 5L), (2, "click", 2L), (3, "buy", 1L)), s"got $got")
  }

  test("asofJoin: a right row's legitimate NULL is delivered, not back-filled") {
    // right row at ts=30 has v2 = NULL; a per-column carry would
    // back-fill v2 from the OLDER row at ts=20, mixing two right rows
    val left = Seq((1L, "k", 35L)).toDF("event_id", "key", "ts")
    val right = Seq(
      ("k", 20L, Some(2.0), Some("old")),
      ("k", 30L, Some(3.0), None: Option[String])
    ).toDF("key", "r_ts", "v1", "v2")
    val row = Analytics.asofJoin(left, right, Seq("key"), "ts", "r_ts")
      .select("v1", "v2").head()
    assert(row.getDouble(0) == 3.0)
    assert(row.isNullAt(1), s"v2 must stay NULL (row atomicity), got ${row.get(1)}")
  }

  test("asofJoin rejects colliding value-column names up front") {
    val l = Seq((1L, "k", 10L, 1.0)).toDF("id", "key", "ts", "v")
    val r = Seq(("k", 5L, 2.0)).toDF("key", "r_ts", "v")
    val e = intercept[IllegalArgumentException] {
      Analytics.asofJoin(l, r, Seq("key"), "ts", "r_ts")
    }
    assert(e.getMessage.contains("collid"))
  }

  test("asofJoin plans with no join operator: union + one key-partitioned window") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "ts")
    val r = Seq(("k", 5L, 2.0)).toDF("key", "r_ts", "v")
    val p = Analytics.asofJoin(l, r, Seq("key"), "ts", "r_ts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), s"expected a window stage:\n$p")
  }

  test("acfPacf: hand-computed lags on 1..5; short-series NULLs") {
    import spark.implicits._
    // x = 1..5: centered (-2,-1,0,1,2), den 10; r1 = 4/10, r2 = -1/10;
    // pacf1 = r1, pacf2 = (r2 - r1^2)/(1 - r1^2) = -0.26/0.84
    val s = (1 to 5).map(i => (i, i.toDouble)).toDF("t", "x")
    val r = Analytics.acfPacf(s, Seq(col("t")), col("x"), maxLag = 2)
      .collect().map(x => x.getInt(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(1) == ((4L, 0.4, 0.4)), s"$r")
    assert(r(2)._1 == 3L && r(2)._2 == -0.1, s"$r")
    assert(math.abs(r(2)._3 - (-0.26 / 0.84)) < 1e-6, s"$r")
    // series shorter than the lag: no pairs -> NULL acf/pacf
    val tiny = Seq((1, 1.0), (2, 2.0)).toDF("t", "x")
    val rt = Analytics.acfPacf(tiny, Seq(col("t")), col("x"), maxLag = 3)
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(rt(2).getLong(1) == 0L && rt(2).isNullAt(2) && rt(2).isNullAt(3))
    assert(rt(3).getLong(1) == 0L && rt(3).isNullAt(2))
  }

  test("theilsU: perfect one-way prediction, independence, constant-side NULL") {
    import spark.implicits._
    // b determines a (a = b), but a only partly... use a = b for the
    // perfect case: both U's are 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val rp = Analytics.theilsU(perfect, col("a"), col("b")).head()
    assert(rp.getAs[Double]("u_a_given_b") == 1.0 &&
      rp.getAs[Double]("u_b_given_a") == 1.0, s"$rp")
    // asymmetric: b -> a is deterministic (b=1,2 -> a=x; b=3 -> a=y),
    // a -> b is not: U(a|b) = 1, U(b|a) < 1
    val asym = Seq(("x", 1), ("x", 2), ("y", 3), ("x", 1), ("x", 2), ("y", 3))
      .toDF("a", "b")
    val ra = Analytics.theilsU(asym, col("a"), col("b")).head()
    assert(ra.getAs[Double]("u_a_given_b") == 1.0, s"$ra")
    assert(ra.getAs[Double]("u_b_given_a") < 1.0, s"$ra")
    // independent 2x2: MI 0, U's 0
    val ind = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("a", "b")
    val ri = Analytics.theilsU(ind, col("a"), col("b")).head()
    assert(ri.getAs[Double]("mi") == 0.0 &&
      ri.getAs[Double]("u_a_given_b") == 0.0, s"$ri")
    // constant a: H(a) = 0 -> U(a|b) NULL, not a division artifact
    val const = Seq(("x", 1), ("x", 2)).toDF("a", "b")
    assert(Analytics.theilsU(const, col("a"), col("b")).head().isNullAt(2))
  }

  test("mcnemar: hand-computed discordant chi2; agreement NULL") {
    import spark.implicits._
    // contingency: both right 3, only-A 6, only-B 1, both wrong 2
    // chi2 = (|6-1|-1)^2/7 = 16/7
    val rows = Seq.fill(3)((1, 1, 1)) ++ Seq.fill(6)((1, 0, 1)) ++
      Seq.fill(1)((0, 1, 1)) ++ Seq.fill(2)((0, 0, 1))
    val df = rows.toDF("pa", "pb", "y")
    val r = Analytics.mcnemar(df, col("pa"), col("pb"), col("y")).head()
    assert(r.getAs[Long]("n") == 12 && r.getAs[Long]("n_both_right") == 3 &&
      r.getAs[Long]("n_only_a") == 6 && r.getAs[Long]("n_only_b") == 1 &&
      r.getAs[Long]("n_both_wrong") == 2, s"$r")
    assert(r.getAs[Double]("chi2") ==
      BigDecimal(16.0 / 7).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(!r.getAs[Boolean]("reject_05"), s"$r") // 2.29 < ~3.84
    // classifiers that never disagree: no discordant pairs -> NULL chi2
    val same = Seq((1, 1, 1), (0, 0, 1)).toDF("pa", "pb", "y")
    val rs = Analytics.mcnemar(same, col("pa"), col("pb"), col("y")).head()
    assert(rs.isNullAt(5) && rs.isNullAt(7), s"$rs")
  }

  test("bradleyTerry: closed-form 2-item fit, chain ordering, 0-win finiteness") {
    import spark.implicits._
    // A beats B 3-1: MM fixed point pi_A = W_A/n = 0.75 (reached in one
    // step, stable thereafter)
    val ab = (Seq.fill(3)(("A", "B")) ++ Seq.fill(1)(("B", "A")))
      .toDF("w", "l")
    val r = Analytics.bradleyTerry(ab, col("w"), col("l"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map("A" -> ((3L, 4L, 0.75)), "B" -> ((1L, 4L, 0.25))), s"$r")
    // transitive chain: strengths respect the order
    val chain = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")).toDF("w", "l")
    val s = Analytics.bradleyTerry(chain, col("w"), col("l"))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(s("A") > s("B") && s("B") > s("C"), s"$s")
    // an item that never loses stays FINITE (fixed iteration contract)
    val nw = Seq(("A", "B"), ("A", "B")).toDF("w", "l")
    val f = Analytics.bradleyTerry(nw, col("w"), col("l"))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(f == Map("A" -> 1.0, "B" -> 0.0), s"$f")
    // self-pairs and NULL sides drop; nothing left -> loud failure
    val junk = Seq(("A", "A"), (null, "B")).toDF("w", "l")
    intercept[IllegalArgumentException] {
      Analytics.bradleyTerry(junk, col("w"), col("l"))
    }
  }

  test("preferenceCycles: planted Condorcet cycle, transitive zero, tie-undecided NULL") {
    import spark.implicits._
    // majority cycle A>B, B>C, C>A (2-1 each): 1 triangle, 1 cycle
    val cyc = (Seq.fill(2)(("A", "B")) ++ Seq(("B", "A")) ++
      Seq.fill(2)(("B", "C")) ++ Seq(("C", "B")) ++
      Seq.fill(2)(("C", "A")) ++ Seq(("A", "C"))).toDF("w", "l")
    val r = Analytics.preferenceCycles(cyc, col("w"), col("l")).head()
    assert(r.getAs[Long]("n_items") == 3 &&
      r.getAs[Long]("n_decided_pairs") == 3 &&
      r.getAs[Long]("n_triangles") == 1 && r.getAs[Long]("n_cycles") == 1 &&
      r.getAs[Double]("cycle_rate") == 1.0, s"$r")
    // transitive tournament: same triangle, zero cycles
    val tr = Seq(("A", "B"), ("B", "C"), ("A", "C")).toDF("w", "l")
    val rt = Analytics.preferenceCycles(tr, col("w"), col("l")).head()
    assert(rt.getAs[Long]("n_triangles") == 1 &&
      rt.getAs[Long]("n_cycles") == 0 &&
      rt.getAs[Double]("cycle_rate") == 0.0, s"$rt")
    // a tied pair is UNDECIDED: no edge, no triangle, NULL rate
    val tie = Seq(("A", "B"), ("B", "A")).toDF("w", "l")
    val rx = Analytics.preferenceCycles(tie, col("w"), col("l")).head()
    assert(rx.getAs[Long]("n_decided_pairs") == 0 &&
      rx.isNullAt(rx.fieldIndex("cycle_rate")), s"$rx")
  }

  test("krippendorffAlpha: brute-force coincidence differential with missing ratings; edges") {
    import spark.implicits._
    // independent reference: literal coincidence-matrix walk
    def brute(ratings: Seq[(Int, String)]): Option[Double] = {
      val byItem = ratings.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        .filter(_._2.size >= 2)
      if (byItem.isEmpty) return None
      val o = scala.collection.mutable.Map.empty[(String, String), Double]
      byItem.values.foreach { vs =>
        val m = vs.size
        for (g <- vs.indices; h <- vs.indices if g != h)
          o((vs(g), vs(h))) = o.getOrElse((vs(g), vs(h)), 0.0) + 1.0 / (m - 1)
      }
      val labels = byItem.values.flatten.toSeq.distinct
      val n = o.values.sum
      val doNum = o.collect { case ((c, k), v) if c != k => v }.sum
      val deNum = n * n - labels.map(c =>
        labels.map(k => o.getOrElse((c, k), 0.0)).sum).map(x => x * x).sum
      if (deNum <= 0) None else Some(1 - (n - 1) * doNum / deNum)
    }
    for (seed <- 29 to 33) {
      val rng = new scala.util.Random(seed)
      val ratings = (0 until 30).flatMap { i =>
        Seq.fill(1 + rng.nextInt(4))((i, s"l${rng.nextInt(3)}"))
      }
      val got = Analytics.krippendorffAlpha(ratings.toDF("item", "label"),
        "item", "label", dp = 9).head()
      val exp = brute(ratings)
      assert(exp.isDefined && math.abs(got.getAs[Double]("alpha") -
        exp.get) < 1e-6, s"seed $seed: $got vs $exp")
    }
    // perfect agreement (mixed labels) -> 1
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
      .toDF("item", "label")
    assert(Analytics.krippendorffAlpha(perfect, "item", "label")
      .head().getAs[Double]("alpha") == 1.0)
    // one label everywhere -> D_e = 0 -> NULL
    val const = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"))
      .toDF("item", "label")
    val rc = Analytics.krippendorffAlpha(const, "item", "label").head()
    assert(rc.isNullAt(rc.fieldIndex("alpha")), s"$rc")
    // no pairable item -> NULL
    val lone = Seq((1, "a"), (2, "b")).toDF("item", "label")
    val rl = Analytics.krippendorffAlpha(lone, "item", "label").head()
    assert(rl.getAs[Long]("n_items") == 0 &&
      rl.isNullAt(rl.fieldIndex("alpha")), s"$rl")
    // NULL items/labels are ABSENT ratings, not a category: result
    // equals the same table with the null rows removed
    val withNulls = Seq((Some(1), Some("a")), (Some(1), Some("a")),
      (Some(2), Some("a")), (Some(2), Some("b")),
      (Some(1), None), (None, Some("b")))
      .toDF("item", "label")
    val clean = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"))
      .toDF("item", "label")
    assert(Analytics.krippendorffAlpha(withNulls, "item", "label").head() ==
      Analytics.krippendorffAlpha(clean, "item", "label").head())
  }

  test("cochranQ: hand-computed Q; incomplete items dropped; unanimous NULL") {
    import spark.implicits._
    // C = (3,2,1), N = 6, sumR2 = 14: dev = 14 - 12 = 2, denom = 4,
    // Q = 3*2*2/4 = 3.0 < chi2_.95(2) = 5.9915
    val rows = Seq((1, "a", 1), (1, "b", 1), (1, "c", 0),
      (2, "a", 1), (2, "b", 0), (2, "c", 0),
      (3, "a", 1), (3, "b", 1), (3, "c", 1),
      (4, "a", 0), (4, "b", 0), (4, "c", 0)).toDF("i", "c", "s")
    val r = Analytics.cochranQ(rows, col("i"), col("c"), col("s") === 1)
      .head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n_items") == 4 &&
      r.getAs[Long]("n_items_dropped") == 0, s"$r")
    assert(r.getAs[Double]("q_stat") == 3.0, s"$r")
    assert(r.getAs[Double]("crit_05") == 5.991465 &&
      !r.getAs[Boolean]("reject_05"), s"$r")
    // an item missing a classifier drops entirely (complete design)
    val withHole = rows.unionByName(Seq((5, "a", 1), (5, "b", 0))
      .toDF("i", "c", "s"))
    val rh = Analytics.cochranQ(withHole, col("i"), col("c"), col("s") === 1)
      .head()
    assert(rh.getAs[Long]("n_items") == 4 &&
      rh.getAs[Long]("n_items_dropped") == 1 &&
      rh.getAs[Double]("q_stat") == 3.0, s"$rh")
    // a DUPLICATE rating must not mask a missing classifier: item 6 has
    // rows {a, a, c} — count 3 == k but only 2 distinct -> dropped
    val withDup = rows.unionByName(Seq((6, "a", 1), (6, "a", 0),
      (6, "c", 1)).toDF("i", "c", "s"))
    val rdup = Analytics.cochranQ(withDup, col("i"), col("c"),
      col("s") === 1).head()
    assert(rdup.getAs[Long]("n_items") == 4 &&
      rdup.getAs[Long]("n_items_dropped") == 1 &&
      rdup.getAs[Double]("q_stat") == 3.0, s"$rdup")
    // unanimous items only: denominator 0 -> NULL, never a divide
    val flat = Seq((1, "a", 1), (1, "b", 1), (2, "a", 0), (2, "b", 0))
      .toDF("i", "c", "s")
    val rf = Analytics.cochranQ(flat, col("i"), col("c"), col("s") === 1)
      .head()
    assert(rf.isNullAt(rf.fieldIndex("q_stat")) &&
      rf.isNullAt(rf.fieldIndex("reject_05")), s"$rf")
  }

  test("friedmanTest: hand-computed no-tie and tied chi2_F; incomplete blocks dropped") {
    import spark.implicits._
    // 3 blocks all ranking a<b<c: rbar = (1,2,3), dev = 14-12 = 2,
    // chi2_F = 12*3/12 * 2 = 6 > 5.9915 -> reject
    val rows = (1 to 3).flatMap(b => Seq((b, "a", 1.0), (b, "b", 2.0),
      (b, "c", 3.0))).toDF("b", "t", "v")
    val r = Analytics.friedmanTest(rows, col("b"), col("t"), col("v"))
      .head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n_blocks") == 3 &&
      r.getAs[Long]("n_blocks_dropped") == 0, s"$r")
    assert(r.getAs[Double]("chi2_f") == 6.0 &&
      r.getAs[Boolean]("reject_05"), s"$r")
    // tie in one block: b1 = (1, 1, 2) -> ranks (1.5, 1.5, 3);
    // blocks 2,3 unchanged (1,2,3); rbar_a = (1.5+1+1)/3, rbar_b =
    // (1.5+2+2)/3, rbar_c = 3; tie mass = 2 rows with ct=2 ->
    // sum(ct^2-1) = 6, C = 1 - 6/(3*3*8) = 11/12
    val tied = (Seq((1, "a", 1.0), (1, "b", 1.0), (1, "c", 2.0)) ++
      (2 to 3).flatMap(b => Seq((b, "a", 1.0), (b, "b", 2.0),
        (b, "c", 3.0)))).toDF("b", "t", "v")
    val rt = Analytics.friedmanTest(tied, col("b"), col("t"), col("v"))
      .head()
    val rb2 = math.pow(3.5 / 3, 2) + math.pow(5.5 / 3, 2) + 9.0
    val expect = (12.0 * 3 / 12 * (rb2 - 12.0)) / (11.0 / 12)
    assert(math.abs(rt.getAs[Double]("chi2_f") -
      BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9, s"$rt vs $expect")
    // incomplete block drops; fully-tied-everywhere -> C <= 0 -> NULL
    val withHole = rows.unionByName(Seq((9, "a", 1.0), (9, "b", 2.0))
      .toDF("b", "t", "v"))
    assert(Analytics.friedmanTest(withHole, col("b"), col("t"), col("v"))
      .head().getAs[Long]("n_blocks_dropped") == 1)
    // duplicate treatment must not mask a gap: block {a, a, c} dropped
    val withDup = rows.unionByName(Seq((8, "a", 1.0), (8, "a", 2.0),
      (8, "c", 3.0)).toDF("b", "t", "v"))
    val rdup = Analytics.friedmanTest(withDup, col("b"), col("t"),
      col("v")).head()
    assert(rdup.getAs[Long]("n_blocks") == 3 &&
      rdup.getAs[Long]("n_blocks_dropped") == 1 &&
      rdup.getAs[Double]("chi2_f") == 6.0, s"$rdup")
    val allTied = (1 to 2).flatMap(b => Seq((b, "a", 5.0), (b, "b", 5.0),
      (b, "c", 5.0))).toDF("b", "t", "v")
    val ra = Analytics.friedmanTest(allTied, col("b"), col("t"), col("v"))
      .head()
    assert(ra.isNullAt(ra.fieldIndex("chi2_f")), s"$ra")
  }

  test("weightedKappa: binary == unweighted cohenKappa; hand-computed QWK; constant-rater NULL") {
    import spark.implicits._
    // binary {0,1}: |d| and d^2 are both the 0/1 disagreement indicator,
    // so linear AND quadratic kappa_w == plain kappa
    val rng = new scala.util.Random(17)
    val ids = (0 until 200).map(i =>
      (i.toLong, rng.nextInt(2), rng.nextInt(2)))
    val a = ids.map(t => (t._1, t._2)).toDF("id", "score")
    val b = ids.map(t => (t._1, t._3)).toDF("id", "score")
    val plain = Analytics.cohenKappa(
      a.withColumnRenamed("score", "label"),
      b.withColumnRenamed("score", "label"), "id", "label", dp = 9)
      .head().getAs[Double]("kappa")
    for (w <- Seq("quadratic", "linear")) {
      val kw = Analytics.weightedKappa(a, b, "id", "score", w, dp = 9)
        .head().getAs[Double]("kappa_w")
      assert(math.abs(kw - plain) < 1e-8, s"$w: $kw vs $plain")
    }
    // hand-computed 3-level quadratic: scores (1,1),(2,3),(3,1):
    // wo = 0 + 1 + 4 = 5; marginals a: {1:1,2:1,3:1}, b: {1:2,3:1};
    // wes = sum na*nb*d^2 = (1*2*0+1*1*4)+(1*2*1+1*1*1)+(1*2*4+1*1*0)
    //     = 4 + 3 + 8 = 15; kappa = 1 - wo*n/wes = 1 - 15/15 = 0
    val ha = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "score")
    val hb = Seq((1L, 1), (2L, 3), (3L, 1)).toDF("id", "score")
    val hr = Analytics.weightedKappa(ha, hb, "id", "score").head()
    assert(hr.getAs[Long]("n_items") == 3 &&
      hr.getAs[Double]("kappa_w") == 0.0, s"$hr")
    // one rater constant AND the other constant -> wes = 0 -> NULL
    val ca = Seq((1L, 2), (2L, 2)).toDF("id", "score")
    val rc = Analytics.weightedKappa(ca, ca, "id", "score").head()
    assert(rc.isNullAt(rc.fieldIndex("kappa_w")), s"$rc")
  }

  test("kendallTauB: monotone +1/-1, brute-force differential, bounded-cells contract") {
    import spark.implicits._
    val mono = (1 to 10).map(i => (i, i * 2)).toDF("x", "y")
    assert(Analytics.kendallTauB(mono, col("x"), col("y"))
      .head().getAs[Double]("tau_b") == 1.0)
    val rev = (1 to 10).map(i => (i, -i)).toDF("x", "y")
    assert(Analytics.kendallTauB(rev, col("x"), col("y"))
      .head().getAs[Double]("tau_b") == -1.0)
    // brute force over random ordinal pairs with heavy ties
    def brute(ps: Seq[(Int, Int)]): Option[Double] = {
      var nc = 0.0; var nd = 0.0
      for (i <- ps.indices; j <- ps.indices if i < j) {
        val s = (ps(i)._1 - ps(j)._1).sign * (ps(i)._2 - ps(j)._2).sign
        if (s > 0) nc += 1 else if (s < 0) nd += 1
      }
      val n = ps.size.toDouble
      val n0 = n * (n - 1) / 2
      def tm(vs: Seq[Int]) = vs.groupBy(identity).values
        .map(g => g.size.toDouble * (g.size - 1) / 2).sum
      val d = (n0 - tm(ps.map(_._1))) * (n0 - tm(ps.map(_._2)))
      if (d <= 0) None else Some((nc - nd) / math.sqrt(d))
    }
    for (seed <- 61 to 63) {
      val rng = new scala.util.Random(seed)
      val ps = Seq.fill(80)((rng.nextInt(5), rng.nextInt(4)))
      val got = Analytics.kendallTauB(ps.toDF("x", "y"),
        col("x"), col("y"), dp = 9).head().getAs[Double]("tau_b")
      val exp = brute(ps)
      assert(exp.isDefined && math.abs(got - exp.get) < 1e-8,
        s"seed $seed: $got vs $exp")
    }
    // constant margin -> NULL; continuous data trips the cell bound
    val flat = (1 to 5).map(i => (1, i)).toDF("x", "y")
    val rf = Analytics.kendallTauB(flat, col("x"), col("y")).head()
    assert(rf.isNullAt(rf.fieldIndex("tau_b")), s"$rf")
    val wide = (1 to 50).map(i => (i, i)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Analytics.kendallTauB(wide, col("x"), col("y"), maxCells = 10)
    }
  }

  test("cochranQ / friedmanTest: multi-seed brute-force differentials on random complete designs") {
    import spark.implicits._
    def rd6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- 51 to 55) {
      val rng = new scala.util.Random(seed)
      val k = 3 + rng.nextInt(3)
      val nI = 12 + rng.nextInt(20)
      // Cochran: straight-line Q from the definition
      val m = Array.fill(nI, k)(rng.nextInt(2))
      val cj = (0 until k).map(j => (0 until nI).map(i => m(i)(j)).sum)
      val ri = (0 until nI).map(i => m(i).sum)
      val nTot = ri.sum
      val denom = k.toDouble * nTot - ri.map(r => r * r).sum
      val rows = for (i <- 0 until nI; j <- 0 until k)
        yield (i, s"c$j", m(i)(j))
      val got = Analytics.cochranQ(rows.toDF("i", "c", "s"),
        col("i"), col("c"), col("s") === 1).head()
      if (denom > 0) {
        val dev = cj.map(c => (c - nTot.toDouble / k) *
          (c - nTot.toDouble / k)).sum
        val q = k * (k - 1) * dev / denom
        assert(math.abs(got.getAs[Double]("q_stat") - rd6(q)) < 1e-6,
          s"seed $seed: $got vs $q")
      } else assert(got.isNullAt(got.fieldIndex("q_stat")), s"$got")
      // Friedman: straight-line tie-averaged block ranks
      val fv = Array.fill(nI, k)(rng.nextInt(5).toDouble)
      def ranks(vs: Array[Double]): Array[Double] =
        vs.map(v => vs.count(_ < v) + (vs.count(_ == v) + 1) / 2.0)
      val rk = fv.map(ranks)
      val rbar = (0 until k).map(j => (0 until nI).map(i => rk(i)(j)).sum / nI)
      val dev2 = rbar.map(r => (r - (k + 1) / 2.0) * (r - (k + 1) / 2.0)).sum
      val tie = fv.map(vs => vs.map(v => vs.count(_ == v)).map(t =>
        t.toDouble * t - 1).sum).sum
      val c = 1.0 - tie / (nI.toDouble * k * (k.toDouble * k - 1))
      val frows = for (i <- 0 until nI; j <- 0 until k)
        yield (i, s"t$j", fv(i)(j))
      val gf = Analytics.friedmanTest(frows.toDF("b", "t", "v"),
        col("b"), col("t"), col("v")).head()
      if (c > 0) {
        val stat = 12.0 * nI / (k * (k + 1.0)) * dev2 / c
        assert(math.abs(gf.getAs[Double]("chi2_f") - rd6(stat)) < 1e-5,
          s"seed $seed: $gf vs $stat")
      } else assert(gf.isNullAt(gf.fieldIndex("chi2_f")), s"$gf")
    }
  }

  test("krippendorffAlphaInterval: equals nominal alpha on binary data; brute-force differential") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // binary identity: squared-difference distance IS the 0/1
    // disagreement indicator, so interval alpha == nominal alpha
    val bin = (0 until 25).flatMap { i =>
      Seq.fill(1 + rng.nextInt(4))((i, rng.nextInt(2)))
    }
    val nom = Analytics.krippendorffAlpha(
      bin.toDF("item", "label"), "item", "label", dp = 9)
      .head().getAs[Double]("alpha")
    val ivl = Analytics.krippendorffAlphaInterval(
      bin.toDF("item", "v"), "item", "v", dp = 9)
      .head().getAs[Double]("alpha")
    assert(math.abs(nom - ivl) < 1e-8, s"nominal $nom vs interval $ivl")
    // brute-force coincidence walk with squared-difference metric
    def brute(ratings: Seq[(Int, Double)]): Option[Double] = {
      val byItem = ratings.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        .filter(_._2.size >= 2)
      if (byItem.isEmpty) return None
      var doSum = 0.0; var n = 0.0
      val all = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      byItem.values.foreach { vs =>
        val m = vs.size; n += m
        for (g <- vs.indices; h <- vs.indices if g != h) {
          val d = vs(g) - vs(h); doSum += d * d / (m - 1)
        }
        vs.foreach(v => all += ((v, 1.0)))
      }
      var deSum = 0.0
      for ((a, _) <- all; (b, _) <- all) deSum += (a - b) * (a - b)
      if (deSum <= 0) None else Some(1 - (n - 1) * doSum / deSum)
    }
    for (seed <- 41 to 45) {
      val r2 = new scala.util.Random(seed)
      val ratings = (0 until 20).flatMap { i =>
        Seq.fill(1 + r2.nextInt(4))((i, r2.nextInt(7).toDouble))
      }
      val got = Analytics.krippendorffAlphaInterval(
        ratings.toDF("item", "v"), "item", "v", dp = 9)
        .head().getAs[Double]("alpha")
      val exp = brute(ratings)
      assert(exp.isDefined && math.abs(got - exp.get) < 1e-6,
        s"seed $seed: $got vs $exp")
    }
    // constant values -> D_e = 0 -> NULL
    val const = Seq((1, 2.0), (1, 2.0), (2, 2.0), (2, 2.0)).toDF("item", "v")
    val rc = Analytics.krippendorffAlphaInterval(const, "item", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("alpha")), s"$rc")
  }

  test("effectSize: hand-computed d and g; degenerate NULLs") {
    import spark.implicits._
    // A = (1,2,3), B = (4,5,6): means 2/5, vars 1/1 -> pooled s = 1,
    // d = -3; g = d*(1 - 3/(4*6-9)) = -3*0.8 = -2.4
    val df = Seq((1, true), (2, true), (3, true),
      (4, false), (5, false), (6, false)).toDF("v", "a")
    val r = Analytics.effectSize(df, col("v"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("mean_diff") == -3.0 &&
      r.getAs[Double]("cohens_d") == -3.0 &&
      r.getAs[Double]("hedges_g") == -2.4, s"$r")
    // one-row cohort or zero pooled variance -> NULL d
    val tiny = Seq((1, true), (4, false), (5, false)).toDF("v", "a")
    assert(Analytics.effectSize(tiny, col("v"), col("a")).head().isNullAt(3))
    val flat = Seq((2, true), (2, true), (2, false), (2, false)).toDF("v", "a")
    assert(Analytics.effectSize(flat, col("v"), col("a")).head().isNullAt(3))
  }

  test("ljungBox: hand-computed Q on 1..5; short-series NULL Q") {
    import spark.implicits._
    // r1 = .4, r2 = -.1, n = 5: Q = 5*7*(.16/4 + .01/3) = 1.516667
    val s = (1 to 5).map(i => (i, i.toDouble)).toDF("t", "x")
    val r = Analytics.ljungBox(s, Seq(col("t")), col("x"), maxLag = 2).head()
    assert(r.getAs[Long]("n") == 5 && r.getAs[Int]("max_lag") == 2)
    assert(r.getAs[Double]("q_stat") == 1.516667, s"$r")
    val crit = 5.991464547107979 // exact chi2_0.95(2): small-df table arm
    assert(math.abs(r.getAs[Double]("crit_05") - crit) < 1e-6)
    assert(!r.getAs[Boolean]("reject_05"))
    // a lag with no pairs -> NULL Q and verdict
    val tiny = Seq((1, 1.0), (2, 2.0)).toDF("t", "x")
    val rt = Analytics.ljungBox(tiny, Seq(col("t")), col("x"), maxLag = 3).head()
    assert(rt.isNullAt(2) && rt.isNullAt(4), s"$rt")
  }

  test("robustStatsByGroup: each group's row equals global robustStats on that slice") {
    import spark.implicits._
    val df = ((1 to 20).map(v => ("A", v.toDouble)) ++ Seq(("A", 500.0)) ++
      (100 to 130).map(v => ("B", v.toDouble))).toDF("g", "v")
    val per = Analytics.robustStatsByGroup(df, col("g"), col("v"),
        trim = 0.1, exact = true)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("A", "B")) {
      val solo = Analytics.robustStats(df.where(col("g") === g), col("v"),
        trim = 0.1, exact = true).head().toSeq.take(6)
      per(g).zip(solo).foreach {
        // doubles to 1e-9 relative: the grouped pass accumulates the
        // stddev in a different order than the sliced global pass
        case (a: Double, b: Double) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
            s"group $g: $a vs $b")
        case (a, b) => assert(a == b, s"group $g: $a vs $b")
      }
    }
  }

  test("brierDecomposition: hand-computed Murphy terms; constant-per-bin residual is 0") {
    import spark.implicits._
    // bins 1,1,3,9: brier .13, ECE .25, REL .13, RES .25, UNC .25,
    // residual 0 (forecasts constant within every bin)
    val df = Seq((0.1, 0), (0.1, 0), (0.3, 1), (0.9, 1)).toDF("s", "y")
    val r = Analytics.brierDecomposition(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("n") == 4, s"$r")
    assert(r.getAs[Double]("brier") == 0.13 && r.getAs[Double]("ece") == 0.25 &&
      r.getAs[Double]("reliability") == 0.13 &&
      r.getAs[Double]("resolution") == 0.25 &&
      r.getAs[Double]("uncertainty") == 0.25 &&
      r.getAs[Double]("residual") == 0.0, s"$r")
    // mixed forecasts inside one bin: identity gap reported, not hidden
    val mixed = Seq((0.11, 0), (0.19, 1)).toDF("s", "y")
    val rm = Analytics.brierDecomposition(mixed, col("s"), col("y")).head()
    assert(rm.getAs[Double]("residual") != 0.0, s"$rm")
    // a non-null score with a NULL label drops ENTIRELY (not counted in
    // the bin's n with its label skipped): result equals the clean frame
    val withNull = Seq((Some(0.1), Some(0)), (Some(0.1), Some(0)),
      (Some(0.3), Some(1)), (Some(0.9), Some(1)), (Some(0.5), None))
      .toDF("s", "y")
    val rn = Analytics.brierDecomposition(withNull, col("s"), col("y")).head()
    assert(rn == r, s"$rn vs $r")
  }

  test("clusterAgreement NMI == mutualInformation mi/sqrt(h_a*h_b) (independent impls)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (0 until 150)
      .map(_ => (s"c${rng.nextInt(4)}", s"l${rng.nextInt(3)}"))
      .toDF("c", "l")
    val nmi = Analytics.clusterAgreement(df, col("c"), col("l"))
      .head().getAs[Double]("nmi")
    val m = Analytics.mutualInformation(df, col("c"), col("l"), dp = 9).head()
    val expect = m.getAs[Double]("mi") /
      math.sqrt(m.getAs[Double]("h_a") * m.getAs[Double]("h_b"))
    assert(math.abs(nmi - expect) < 1e-5, s"nmi=$nmi vs $expect")
  }

  test("psiBySlice: identical slices score equally, a shifted slice drifts") {
    import spark.implicits._
    val a = (1 to 100).map(v => ("A", v.toDouble))
    val b = (1 to 100).map(v => ("B", v.toDouble))
    val c = (1 to 100).map(v => ("C", 900.0 + v))
    val r = Analytics.psiBySlice((a ++ b ++ c).toDF("s", "v"),
        col("s"), col("v"), bins = 10)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getBoolean(3))).toMap
    assert(r.keySet == Set("A", "B", "C") && r.values.forall(_._1 == 100))
    // A and B are the same distribution -> identical PSI vs the pool
    assert(r("A") == r("B"), s"$r")
    // C sits in the far bin the others never touch -> clear drift
    assert(r("C")._2 > r("A")._2 && r("C")._3, s"$r")
    // one slice == the pool: only the smoothing-constant asymmetry
    // remains, far below the 0.25 rule
    val solo = Analytics.psiBySlice(a.toDF("s", "v"), col("s"), col("v"))
      .head()
    assert(solo.getDouble(2) < 0.01 && !solo.getBoolean(3), s"$solo")
    // bins empty across EVERY slice still carry their smoothing mass —
    // the pooled histogram rolls up from the zero-filled grid, matching
    // psiOverTime. Values {0,10} x2 vs {0,0,10}: bins 1..8 empty in
    // both slices; hand-computed PSI includes all 10 terms.
    val gap = Seq(("A", 0.0), ("A", 10.0), ("B", 0.0), ("B", 0.0),
      ("B", 10.0)).toDF("s", "v")
    val rg = Analytics.psiBySlice(gap, col("s"), col("v"), bins = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    def psi(cs: Seq[Double], n: Double, pool: Seq[Double], nb: Double) =
      BigDecimal(cs.zip(pool).map { case (c, cb) =>
        val p = (c + 0.5) / (n + 5); val q = (cb + 0.5) / (nb + 5)
        (p - q) * math.log(p / q)
      }.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pool = Seq(3.0) ++ Seq.fill(8)(0.0) ++ Seq(2.0)
    val expA = psi(Seq(1.0) ++ Seq.fill(8)(0.0) ++ Seq(1.0), 2, pool, 5)
    val expB = psi(Seq(2.0) ++ Seq.fill(8)(0.0) ++ Seq(1.0), 3, pool, 5)
    assert(math.abs(rg("A") - expA) < 1e-9 &&
      math.abs(rg("B") - expB) < 1e-9, s"$rg vs ($expA, $expB)")
  }

  test("clusterAgreement: hand-computed purity/NMI/ARI, perfect = 1s, degenerate NULLs") {
    import spark.implicits._
    // cells: A-x 3, A-y 1, B-y 2 -> purity 5/6; MI = .318257,
    // H(C) = .636514, H(L) = ln 2 -> NMI .479139;
    // idx 4, a 7, b 6, E 2.8, max 6.5 -> ARI 1.2/3.7
    val df = (Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq.fill(2)(("B", "y"))).toDF("c", "l")
    val r = Analytics.clusterAgreement(df, col("c"), col("l")).head()
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_clusters") == 2 &&
      r.getAs[Long]("n_labels") == 2, s"$r")
    assert(r.getAs[Double]("purity") == 0.833333, s"$r")
    assert(r.getAs[Double]("nmi") == 0.479139, s"$r")
    assert(r.getAs[Double]("ari") == 0.324324, s"$r")
    // clusters == labels: all three indexes are exactly 1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("c", "l")
    val rp = Analytics.clusterAgreement(perfect, col("c"), col("l")).head()
    assert(rp.getAs[Double]("purity") == 1.0 &&
      rp.getAs[Double]("nmi") == 1.0 && rp.getAs[Double]("ari") == 1.0, s"$rp")
    // one cluster: zero entropy -> NULL NMI; one cluster AND one label:
    // max == E -> NULL ARI too
    val oneC = Seq(("A", "x"), ("A", "y")).toDF("c", "l")
    val rc = Analytics.clusterAgreement(oneC, col("c"), col("l")).head()
    assert(rc.isNullAt(4), s"NMI must be NULL on zero cluster entropy: $rc")
    val trivial = Seq(("A", "x"), ("A", "x")).toDF("c", "l")
    val rt = Analytics.clusterAgreement(trivial, col("c"), col("l")).head()
    assert(rt.isNullAt(4) && rt.isNullAt(5), s"$rt")
  }

  test("madOutliers: hand-computed modified z, zero-MAD NULLs, approx path shape") {
    import spark.implicits._
    // 1..9 plus 1000: median 5.5; sorted |dev| = 0.5,0.5,1.5,1.5,2.5,
    // 2.5,3.5,3.5,4.5,994.5 -> MAD = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val r = Analytics.madOutliers(df, col("v"), exact = true)
      .collect().map(x => x.getDouble(0) ->
        (x.getAs[Double]("mad_z"), x.getAs[Boolean]("is_outlier"))).toMap
    val z1 = 0.6745 * (1.0 - 5.5) / 2.5
    assert(math.abs(r(1.0)._1 - z1) < 1e-12 && !r(1.0)._2, s"${r(1.0)}")
    assert(r(1000.0)._2, "the gross outlier must be flagged")
    assert(r.values.count(_._2) == 1, s"only the plant is out: $r")
    // >= half the mass on one value -> MAD 0 -> NULL scores, no ANSI error
    val flat = Seq(5.0, 5.0, 5.0, 9.0).toDF("v")
    val rf = Analytics.madOutliers(flat, col("v"), exact = true).collect()
    assert(rf.forall(_.isNullAt(1)), "zero MAD must NULL the scores")
    // approx default: same schema, flags the same plant at this size
    val ra = Analytics.madOutliers(df, col("v")).collect()
    assert(ra.count(_.getAs[Boolean]("is_outlier")) == 1)
  }

  test("ringNegatives: k per anchor, never self, wraps, deterministic, n<=k clamps") {
    import spark.implicits._
    val ids = (1L to 10L).toDF("id")
    val r = graft.ops.DataPrep.ringNegatives(ids, col("id"), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 30, s"10 anchors x 3: ${r.length}")
    assert(r.forall { case (a, n, _) => a != n }, "self-negative")
    r.groupBy(_._1).foreach { case (a, xs) =>
      assert(xs.map(_._2).distinct.length == 3, s"anchor $a repeats a negative")
    }
    // ring order is the md5 order: off=1 neighbors chain through ALL ids
    // (one cycle, not islands)
    val next = r.filter(_._3 == 1L).map(x => x._1 -> x._2).toMap
    val cycle = Iterator.iterate(1L)(next).drop(10).next()
    assert(cycle == 1L, "off=1 edges must form one full cycle")
    assert(graft.ops.DataPrep.ringNegatives(ids, col("id"), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(x => (x._1, x._3)).toSeq == r.sortBy(x => (x._1, x._3)).toSeq)
    // k >= n: each anchor gets exactly n-1 negatives
    val tiny = (1L to 3L).toDF("id")
    val rt = graft.ops.DataPrep.ringNegatives(tiny, col("id"), 5).collect()
    assert(rt.length == 6, s"3 anchors x 2 others: ${rt.length}")
  }

  test("kFold: deterministic group-keyed folds; audit sizes and skew sum up") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"src${i % 10}")).toDF("id", "src")
    val a = graft.ops.DataPrep.kFold(docs, col("src"), 5)
    // every row of a group shares a fold (the leakage guard), stable re-run
    assert(a.groupBy("src").agg(countDistinct(col("fold")).as("d"))
      .where(col("d") > 1).count() == 0)
    val b = graft.ops.DataPrep.kFold(docs, col("src"), 5)
    assert(a.collect().toSet == b.collect().toSet)
    val audit = graft.ops.DataPrep.kFoldAudit(a, "fold", 5).collect()
    assert(audit.map(_.getAs[Long]("n_test")).sum == 200)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_train") == 200 - r.getAs[Long]("n_test"))
      assert(r.getAs[Double]("skew") ==
        BigDecimal(r.getAs[Long]("n_test") * 5 / 200.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    intercept[IllegalArgumentException] {
      graft.ops.DataPrep.kFold(docs, col("src"), 1)
    }
  }

  test("hashSplit: deterministic, group-leakage-free, fractions validated") {
    val docs = graft.sources.Sources.table(spark, sf0001, "documents")
    val split = graft.ops.DataPrep.hashSplit(docs, col("source"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    // every source lands in EXACTLY one split (no leakage across splits)
    val perSplit = split.groupBy("split").agg(countDistinct(col("source")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalSources = docs.select(countDistinct(col("source"))).head().getLong(0)
    assert(perSplit.values.sum == totalSources,
      s"a source spans multiple splits: $perSplit vs $totalSources distinct")
    // deterministic: re-running yields the identical assignment
    val again = graft.ops.DataPrep.hashSplit(docs, col("source"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == first)
    intercept[IllegalArgumentException] {
      graft.ops.DataPrep.hashSplit(docs, col("source"), Seq("train" -> 0.5, "test" -> 0.2))
    }
  }

  test("binnedIntervalJoin matches the naive range join, inclusive boundaries") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // intervals spanning <1, exactly 1, and several bins (binSeconds=10)
    val points = (0L to 100L by 7).map(s => (s, ts(s))).toSeq.toDF("pid", "pts")
    val ivs = Seq(
      (1L, ts(3), ts(5)),    // inside one bin
      (2L, ts(10), ts(19)),  // exactly one bin
      (3L, ts(15), ts(64)),  // spans 6 bins
      (4L, ts(98), ts(98)),  // degenerate point interval
      (5L, ts(200), ts(210)) // matches nothing
    ).toDF("iid", "s", "e")
    val got = Analytics.binnedIntervalJoin(points, "pts", ivs, "s", "e", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(ivs)
      .where(col("pts") >= col("s") && col("pts") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"binned=$got vs naive=$want")
    assert(want.contains((98L, 4L))) // inclusive degenerate interval
    // every pair appears exactly ONCE despite multi-bin intervals
    val withDups = Analytics.binnedIntervalJoin(points, "pts", ivs, "s", "e", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(withDups.length == withDups.toSet.size, "duplicate pairs from bin explosion")
  }

  test("binnedIntervalJoin rejects colliding columns and non-positive bins") {
    val df = Seq((1L, new java.sql.Timestamp(0L))).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      Analytics.binnedIntervalJoin(df, "ts", df, "ts", "ts", 10L)
    }
    val iv = Seq((2L, new java.sql.Timestamp(0L), new java.sql.Timestamp(1L))).toDF("i", "s", "e")
    intercept[IllegalArgumentException] {
      Analytics.binnedIntervalJoin(df, "ts", iv, "s", "e", 0L)
    }
  }

  test("hashSample: deterministic, nested across rates, stratified thresholds") {
    import graft.ops.DataPrep
    val df = (0L until 2000L).toDF("id")
    val s10 = DataPrep.hashSample(df, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    val s10b = DataPrep.hashSample(df, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    assert(s10 == s10b, "same key + rate must give the same subset")
    val s50 = DataPrep.hashSample(df, col("id"), 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50), "lower-rate sample must nest inside higher-rate")
    // rates land near target (md5 buckets are uniform-ish)
    assert(math.abs(s10.size / 2000.0 - 0.1) < 0.03 && math.abs(s50.size / 2000.0 - 0.5) < 0.05)
    // stratified: stratum-specific rate applies, default elsewhere
    val strat = df.withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
    val kept = DataPrep.stratifiedHashSample(strat, col("id"), col("g"),
        Map("a" -> 1.0), defaultRate = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 2000L by 2).toSet, "rate 1.0 keeps all of stratum a, default 0 drops b")
    intercept[IllegalArgumentException] { DataPrep.hashSample(df, col("id"), 1.5) }
  }

  test("packByBudget: contiguous packs, overflow bounded by one row, all rows packed") {
    val docs = graft.sources.Sources.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long").as("toks"))
    val budget = 1024L
    val packed = graft.ops.DataPrep.packByBudget(docs, Seq(col("source")),
      Seq(col("doc_id")), col("toks"), budget)
    assert(packed.count() == docs.count()) // packing drops nothing
    val stats = packed.groupBy("source", "pack_id")
      .agg(sum("toks").as("pack_toks"), max("toks").as("max_row"))
      .collect()
    stats.foreach { r =>
      assert(r.getLong(2) <= budget + r.getLong(3),
        s"pack ${r.get(0)}/${r.get(1)} exceeds budget + one row: $r")
    }
    // pack ids are contiguous from 0 within each source
    val ids = packed.groupBy("source").agg(
      min("pack_id").as("mn"), max("pack_id").as("mx"),
      countDistinct(col("pack_id")).as("n")).collect()
    ids.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1,
        s"non-contiguous pack ids: $r")
    }
  }

  test("NULL and empty text degrade gracefully through text + dedup operators") {
    import graft.functions.{Dedup, GraftFunctions, TextFunctions => TF}
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "a real document with plenty of text to shingle and hash"),
      (2L, "a real document with plenty of text to shingle and hash"), // exact dup of 1
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    // per-row text functions: NULL in -> NULL out, no crash
    val r = docs.select(col("doc_id"),
      TF.tokenCountWs(col("text")).as("t"),
      GraftFunctions.langId(col("text")).as("l")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(3L).isNullAt(1) && r(3L).isNullAt(2))
    // minhash dedup: NULL-text rows drop out of featurization (their
    // shingle array is NULL -> the band explode emits nothing); the real
    // duplicate pair is still found and nothing throws
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .collect().map(p => (p.getLong(0), p.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // exact dedup groups NULLs by their (shared) hash without crashing
    assert(Dedup.exactDupGroups(docs, "doc_id", "text").count() >= 1)
  }

  test("l2Normalize scales to unit norm; zero vectors pass through") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0))).toDF("id", "v")
    val got = df.select(col("id"), graft.functions.Similarity.l2Normalize(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(0.6, 0.8))
    assert(got(2L) == Seq(0.0, 0.0)) // no NaN from a zero norm
  }

  test("groupCentroids: elementwise mean per group, positions preserved") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0)),
      ("a", Seq(3.0, 4.0, 5.0)),
      ("b", Seq(10.0, 0.0, -10.0))).toDF("g", "v")
    val got = graft.functions.Similarity.groupCentroids(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 3.0, 4.0))
    assert(got("b") == Seq(10.0, 0.0, -10.0))
  }

  test("decontamination: 13-gram overlap flags exactly the leaking docs") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix text then the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "completely unrelated content with no overlap whatsoever in any window"),
      (3L, "short"), // shorter than 13 chars: its single truncated gram can't match
      (4L, "quick brown fox jumps over the") // shares a >=13-char window
    ).toDF("doc_id", "text")
    val flagged = graft.functions.Decontam.contaminatedIds(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 4L), s"got $flagged")
    val kept = graft.functions.Decontam.dropContaminated(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("decontamination plan: broadcast left-semi, corpus not shuffled for the match") {
    val bench = Seq((1L, "a" * 40)).toDF("doc_id", "text")
    val corpus = Seq((2L, "b" * 40)).toDF("doc_id", "text")
    val p = graft.functions.Decontam.contaminatedIds(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected a broadcast left-semi match:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the gram match:\n$p")
  }

  test("bloom decontamination: superset of exact, no false keeps, in-scan corpus plan") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix text then the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "completely unrelated content with no overlap whatsoever in any window"),
      (3L, "short"),
      (4L, "quick brown fox jumps over the")
    ).toDF("doc_id", "text")
    val flagged = graft.functions.Decontam
      .contaminatedIdsBloom(corpus, bench, "doc_id", "text",
        expectedGrams = 1024, fpp = 1e-6)
      .collect().map(_.getLong(0)).toSet
    // no false negatives ever; at this fpp and corpus size, no FPs either
    assert(flagged == Set(1L, 4L), s"got $flagged")
    val kept = graft.functions.Decontam
      .dropContaminatedBloom(corpus, bench, "doc_id", "text",
        expectedGrams = 1024, fpp = 1e-6)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // a null text has no grams: kept by the drop path (parity with the
    // exact dropContaminated), never flagged by the id path
    val withNull = corpus.union(Seq((9L, Option.empty[String])).toDF("doc_id", "text"))
    val keptNull = graft.functions.Decontam
      .dropContaminatedBloom(withNull, bench, "doc_id", "text",
        expectedGrams = 1024, fpp = 1e-6)
      .collect().map(_.getLong(0)).toSet
    assert(keptNull == Set(2L, 3L, 9L), s"null-text doc must survive the bloom drop: $keptNull")
    // the 100 TB shape: the corpus side is scan + filter only — no
    // explode, no join, no exchange anywhere in the flagging plan (a
    // file-backed corpus, so ConvertToLocalRelation can't fold the
    // filter away as it does for the in-memory frames above)
    val fileCorpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = graft.functions.Decontam
      .contaminatedIdsBloom(fileCorpus, bench, "doc_id", "text",
        expectedGrams = 1024, fpp = 1e-6)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_contains_gram"), s"expected the fused in-scan predicate:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Generate") && !p.contains("Join"),
      s"corpus side must be a single shuffle-free scan:\n$p")
  }

  test("collectSample: tree-aggregated heap = global n-smallest-by-hash, layout-invariant") {
    import graft.functions.Pq
    import spark.implicits._
    val df = (0 until 500).map(i => Tuple1(Array.fill(4)(i.toFloat))).toDF("v")
    def sample(d: org.apache.spark.sql.DataFrame) =
      Pq.collectSample(d, "v", trainFraction = 1.0, seed = 11L, maxTrainRows = 64)
        .map(_.toSeq).toSeq
    val got = sample(df)
    assert(got.size == 64)
    // reference: the DataFrame orderBy+limit formulation it replaced
    val ref = df.orderBy(xxhash64(col("v"), lit(11L))).limit(64).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    assert(got == ref, "tree aggregation must select exactly the n smallest hashes, ascending")
    assert(got == sample(df.repartition(11)), "sample must not depend on physical layout")
    assert(got == sample(df.orderBy(col("v"))), "deterministic under re-sort too")
    // fewer rows than the bound: keep all; empty: empty
    assert(sample(df.limit(10)).size == 10)
    assert(sample(df.where(lit(false))).isEmpty)
  }

  test("product quantization: round-trip shapes, determinism, ADC = decoded distance, clone retrieval") {
    import graft.functions.{GraftFunctions, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cb = Pq.train(emb, "embedding", m = 8, ksub = 16, seed = 42L)
    assert(cb.dsub == 8 && cb.flat.length == 8 * 16 * 8)
    // encode: m codes in range, deterministic across evaluations
    val codes = emb.select(col("vec_id"), Pq.encode(col("embedding"), cb).as("c"))
    val c1 = codes.orderBy("vec_id").collect().map(_.getSeq[Int](1))
    val c2 = codes.orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(c1.toSeq == c2.toSeq)
    assert(c1.forall(cs => cs.length == 8 && cs.forall(t => t >= 0 && t < 16)))
    // ADC distance against a query's table == exact distance to the
    // DECODED corpus vector (the defining identity of ADC)
    val q = emb.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val check = emb.crossJoin(q)
      .select(
        Pq.adcDist(Pq.encode(col("embedding"), cb), Pq.adcTable(col("qvec"), cb), cb.ksub).as("adc"),
        aggregate(zip_with(
          Pq.decode(Pq.encode(col("embedding"), cb), cb), col("qvec"),
          (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
          lit(0.0), (acc, x) => acc + x).as("direct"))
      .select(max(abs(col("adc") - col("direct"))).as("max_err")).head().getDouble(0)
    assert(check < 1e-9, s"ADC distance must equal distance-to-decoded, max err $check")
    // reconstruction keeps vectors on the right side of the sphere: the
    // quality bound the sim_pq verdict pins (measured ~0.8 on this data)
    val recon = emb.select(avg(GraftFunctions.cosineSim(col("embedding"),
      Pq.decode(Pq.encode(col("embedding"), cb), cb))).as("r")).head().getDouble(0)
    info(f"avg reconstruction cosine: $recon%.4f")
    assert(recon > 0.5, f"reconstruction collapsed: $recon%.4f")
    // planted clones: identical vector -> identical codes -> ADC finds it
    val aug = emb.union(emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val knn = Pq.pqKnn(aug, "vec_id", "embedding", q, "qid", "qvec", k = 5, cb)
    val top = knn.where(col("rank") === 1).select("vec_id").head().getLong(0)
    assert(top == 1000000L, s"clone of query 0 must be rank 1, got $top")
  }

  test("IVFADC: index shapes, distance identity, cell pruning, clone retrieval") {
    import graft.functions.{IvfPq, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ix = IvfPq.train(emb, "embedding", nLists = 8, m = 8, ksub = 16, seed = 42L)
    assert(ix.nLists == 8 && ix.fine.m == 8 && ix.fine.ksub == 16)
    val index = IvfPq.encodeIndex(emb, "vec_id", "embedding", ix)
      .localCheckpoint(true)
    val rows = index.collect()
    assert(rows.forall { r =>
      val l = r.getInt(1); val cs = r.getSeq[Int](2)
      l >= 0 && l < 8 && cs.length == 8 && cs.forall(t => t >= 0 && t < 16)
    })
    assert(index.select("list").distinct().count() > 1,
      "coarse quantizer collapsed to one cell")
    // IVFADC distance identity: the reported dist of every candidate is
    // exactly ||(q − cell centroid) − decode(codes)||² — the asymmetric
    // distance the table lookups are defined to compute
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val knn = IvfPq.search(index, "vec_id", ix, q, "qid", "qvec", k = 5,
      nProbe = 8, scoreDp = 9) // all cells probed: identity must hold corpus-wide
    val dim = ix.coarse.dsub
    val cent = (0 until 8).map(t =>
      (t, (0 until dim).map(c => ix.coarse.flat(t * dim + c).toDouble).toArray))
      .toDF("list", "cvec")
    val direct = knn
      .join(index.toDF("vec_id", "list", "codes"), "vec_id")
      .join(q, "qid").join(cent, "list")
      .select(col("dist"),
        aggregate(zip_with(
          zip_with(col("qvec"), col("cvec"), (x, c) => x.cast("double") - c),
          Pq.decode(col("codes"), ix.fine),
          (r, d) => { val e = r - d.cast("double"); e * e }),
          lit(0.0), (acc, x) => acc + x).as("expect"))
    val maxErr = direct.select(max(abs(col("dist") - col("expect")))).head().getDouble(0)
    assert(maxErr < 1e-6, s"ADC-over-residual distance identity broken: $maxErr")
    // pruning: with nProbe=2 of 8 cells, the probe set covers a strict
    // minority of (query, cell) space
    val probed = IvfPq.probedLists(ix, q, "qid", "qvec", nProbe = 2)
    val sizes = index.groupBy("list").agg(count(lit(1L)).as("n"))
    val scanned = probed.join(sizes, "list").agg(sum("n")).head().getLong(0)
    val total = 3L * emb.count()
    assert(scanned * 2 < total, s"probing 2/8 cells scanned $scanned of $total")
    // planted clones: identical vector → same cell, same codes → its ADC
    // distance is the query's own residual quantization error → rank 1
    val aug = emb.union(emb.where(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val top = IvfPq.ivfPqKnn(aug, "vec_id", "embedding", q, "qid", "qvec",
        k = 3, nLists = 8, nProbe = 2, seed = 42L)
      .where(col("rank") === 1)
      .select(col("qid"), col("vec_id")).collect()
    assert(top.forall(r => r.getLong(1) == r.getLong(0) + 1000000L),
      s"every query's clone must be rank 1: ${top.mkString(",")}")
  }

  test("malformed vectors never reach ADC top-k (null dist would rank first under ASC)") {
    import graft.functions.{IvfPq, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant a null-vector row and a wrong-dimension row in the corpus
    val bad = Seq(
      (7000001L, null.asInstanceOf[Array[Float]]),
      (7000002L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val aug = emb.unionByName(bad)
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cb = Pq.train(emb, "embedding", m = 8, ksub = 16, seed = 42L)
    val pq = Pq.pqKnn(aug, "vec_id", "embedding", q, "qid", "qvec", k = 5, cb)
      .select("vec_id").as[Long].collect()
    assert(!pq.exists(_ >= 7000000L), s"malformed rows surfaced in pqKnn top-k: ${pq.toSeq}")
    val knn = IvfPq.ivfPqKnn(aug, "vec_id", "embedding", q, "qid", "qvec",
        k = 5, nLists = 8, nProbe = 8, seed = 42L)
      .select("vec_id").as[Long].collect()
    assert(!knn.exists(_ >= 7000000L), s"malformed rows surfaced in IVFADC top-k: ${knn.toSeq}")
  }

  test("IVFADC index survives a list-partitioned parquet round trip") {
    import graft.functions.IvfPq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ix = IvfPq.train(emb, "embedding", nLists = 8, m = 8, ksub = 16, seed = 42L)
    // the persistable-index protocol: write the codes parquet partitioned
    // by cell (so a probe only reads its cells' files), read it back, and
    // search must return exactly what the in-session index returns
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_ix").toFile.getAbsolutePath
    IvfPq.encodeIndex(emb, "vec_id", "embedding", ix)
      .write.mode("overwrite").partitionBy("list").parquet(dir)
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val direct = IvfPq.search(IvfPq.encodeIndex(emb, "vec_id", "embedding", ix),
      "vec_id", ix, q, "qid", "qvec", k = 5, nProbe = 4)
    val viaParquet = IvfPq.search(spark.read.parquet(dir),
      "vec_id", ix, q, "qid", "qvec", k = 5, nProbe = 4)
    assert(viaParquet.except(direct).isEmpty && direct.except(viaParquet).isEmpty,
      "parquet round-tripped index changed the search result")
  }

  test("IVFADC appendBatch: appended clones found without retraining, old rows untouched") {
    import graft.functions.IvfPq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ix = IvfPq.train(emb, "embedding", nLists = 8, m = 8, ksub = 16, seed = 42L)
    val index = IvfPq.encodeIndex(emb, "vec_id", "embedding", ix).localCheckpoint(true)
    val batch = emb.where(col("vec_id") < 3)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val appended = IvfPq.appendBatch(index, batch, "vec_id", "embedding", ix)
    // the original rows ride through unchanged — append is purely additive
    assert(appended.where(col("vec_id") < 2000000L).except(index).isEmpty &&
      index.except(appended.where(col("vec_id") < 2000000L)).isEmpty)
    // one search spans old + new: each query finds its appended clone at
    // rank 1 (identical vector ⇒ same cell, same codes)
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val knn = IvfPq.search(appended, "vec_id", ix, q, "qid", "qvec", k = 3, nProbe = 4)
    val cloneTop = knn.where(col("vec_id") === col("qid") + 2000000L && col("rank") === 1)
      .count()
    assert(cloneTop == 3, s"expected 3 appended clones at rank 1, got $cloneTop")
  }

  test("saltedJoin rejects join types that preserve the replicated side") {
    val a = Seq((1, "x")).toDF("k", "a")
    val b = Seq((1, "y")).toDF("k", "b")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, Seq("k"), saltFactor = 4, joinType = "full_outer")
    }
    assert(e.getMessage.contains("replicates"))
    // left-preserving types still work
    assert(Skew.saltedJoin(a, b, Seq("k"), 4, "left").count() == 1)
  }

  test("saltedJoin: content-derived salt is retry-stable and result-equivalent") {
    val skewed = (1 to 500).map(i => (i % 3, s"row_$i")).toDF("k", "payload")
    val dim = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 4)
    val plain = skewed.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").except(plain.select("k", "payload", "name")).isEmpty)
    // routing determinism: the salt assignment is a pure function of row
    // content, so two independent runs produce the identical salt per row
    // (monotonically_increasing_id would differ across partition layouts)
    val s1 = skewed.repartition(7).withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(4L))).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val s2 = skewed.repartition(2).withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(4L))).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(s1 == s2, "salt must not depend on partitioning/attempt layout")
  }

  test("chunkTokens: full coverage, overlap, short-doc and bounds behavior") {
    import graft.ops.DataPrep
    val doc = (1 to 40).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = DataPrep.chunkTokens(df, col("text"), chunkSize = 16, stride = 8)
      .select("doc_id", "chunk_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // starts 0,8,16,24 -> 4 windows; generation stops once a window reaches
    // the document end (a start-32 window would be a pure subset of the
    // start-24 one and duplicate training content)
    assert(d1.length == 4)
    assert(d1.head == (1 to 16).map(i => s"t$i").mkString(" "))
    assert(d1(1).startsWith("t9 "), "stride-8 window overlaps the previous by 8 tokens")
    assert(d1.last == (25 to 40).map(i => s"t$i").mkString(" "))
    // every token appears in >= 1 chunk (full coverage)
    val covered = d1.flatMap(_.split(" ")).toSet
    assert((1 to 40).forall(i => covered(s"t$i")))
    // a doc shorter than chunkSize yields exactly one whole-doc chunk
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c")))
    intercept[IllegalArgumentException] {
      DataPrep.chunkTokens(df, col("text"), chunkSize = 8, stride = 9)
    }
  }

  test("capPerGroup keeps exactly the top-k of each group under a total order") {
    import graft.ops.DataPrep
    val df = (for (g <- Seq("a", "b"); i <- 1 to 10) yield (g, i.toLong, (i % 5).toLong))
      .toDF("g", "id", "score")
    val kept = DataPrep.capPerGroup(df, Seq(col("g")),
        Seq(col("score").desc, col("id")), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // scores are i%5: top-3 by (score desc, id asc) = ids 4, 9 (score 4), 3 (score 3)
    assert(kept == Set(("a", 4L), ("a", 9L), ("a", 3L), ("b", 4L), ("b", 9L), ("b", 3L)))
    // k larger than any group passes everything through
    assert(DataPrep.capPerGroup(df, Seq(col("g")), Seq(col("id")), k = 100).count() == 20)
    intercept[IllegalArgumentException] {
      DataPrep.capPerGroup(df, Seq(col("g")), Seq(col("id")), k = 0)
    }
  }

  test("filterByQuantile: exact interpolated threshold; approx within rank error") {
    import graft.ops.DataPrep
    val df = (1L to 100L).toDF("v")
    // exact p75 of 1..100 interpolates to 75.25 -> keep 76..100
    val upper = DataPrep.filterByQuantile(df, col("v"), 0.75, exact = true)
      .collect().map(_.getLong(0)).toSet
    assert(upper == (76L to 100L).toSet)
    // keepUpper=false at p25 (=25.75) -> keep 1..25
    val lower = DataPrep.filterByQuantile(df, col("v"), 0.25, keepUpper = false, exact = true)
      .collect().map(_.getLong(0)).toSet
    assert(lower == (1L to 25L).toSet)
    // the sketch route lands within its rank-error bound
    val approx = DataPrep.filterByQuantile(df, col("v"), 0.75).count()
    assert(math.abs(approx - 25L) <= 2, s"approx kept $approx of expected ~25")
  }

  test("deterministicShuffle: reproducible seed-keyed permutation") {
    import graft.ops.DataPrep
    val df = (1L to 500L).toDF("id")
    def order(seed: Long) = DataPrep.deterministicShuffle(df, col("id"), seed)
      .select("id").collect().map(_.getLong(0)).toSeq
    val o1 = order(7L)
    assert(o1 == order(7L), "same seed must reproduce the same order")
    assert(o1.toSet == (1L to 500L).toSet, "a permutation keeps every row exactly once")
    assert(o1 != order(8L), "a different seed must give a different permutation")
    assert(o1 != (1L to 500L).toSeq, "the shuffled order must not be the identity")
  }

  test("rakeWeights converges weighted margins to the targets; rakeApply attaches per row") {
    // skewed 2x2 corpus; targets uniform on both margins
    val rows = Seq.fill(60)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val df = rows.zipWithIndex.map { case ((g, h), i) => (i.toLong, g, h) }
      .toDF("id", "g", "h")
    val cells = DataPrep.rakeWeights(df, "g", "h",
      Map("a" -> 0.5, "b" -> 0.5), Map("x" -> 0.5, "y" -> 0.5), iters = 25)
    val applied = DataPrep.rakeApply(df, "g", "h", cells)
    val m1 = applied.groupBy("g").agg(sum(col("weight")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m2 = applied.groupBy("h").agg(sum(col("weight")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq(m1("a"), m1("b"), m2("x"), m2("y")).foreach { w =>
      assert(math.abs(w - 50.0) < 0.01, s"margin off target: $w") }
    // weights exist on every row and are positive
    assert(applied.where(col("weight").isNull || col("weight") <= 0).count() == 0)
    intercept[IllegalArgumentException] {
      DataPrep.rakeWeights(df, "g", "h", Map("a" -> 0.5), Map("x" -> 0.5, "y" -> 0.5))
    }
  }

  test("poissonBootstrapMeanCI brackets the mean, reproduces exactly") {
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("v", col("id").cast("double"))
    def run() = Analytics.poissonBootstrapMeanCI(df, col("id"), col("v"),
      b = 100).collect()(0)
    val r = run()
    val (mean, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(mean == 500.5)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    // sd of the mean of 1..1000 is ~9.1; percentile bounds stay near ±2sd
    assert(hi - lo > 10 && hi - lo < 80, s"implausible CI width ${hi - lo}")
    assert(run() == r, "hash-driven bootstrap must be bit-reproducible")
  }

  test("randomizationTestMeanDiff: tiny p for a planted effect, large p for noise") {
    // group A shifted +100 vs B: no random reassignment can match it
    val effect = (1 to 200).map(i => (i.toLong, i <= 100, if (i <= 100) 100.0 + i % 7 else i % 7.0))
      .toDF("id", "a", "v")
    val r1 = Analytics.randomizationTestMeanDiff(effect, col("id"), col("a"),
      col("v"), b = 199).collect()(0)
    assert(math.abs(r1.getDouble(0) - 100.0) < 0.5 && r1.getDouble(1) == 0.005,
      s"planted effect must hit the minimum attainable p: $r1")
    // identical distributions: p must not be small
    val noise = (1 to 200).map(i => (i.toLong, i % 2 == 0, (i % 13).toDouble))
      .toDF("id", "a", "v")
    val p = Analytics.randomizationTestMeanDiff(noise, col("id"), col("a"),
      col("v"), b = 199).collect()(0).getDouble(1)
    assert(p > 0.05, s"null-true p-value implausibly small: $p")
  }

  test("normalCdf matches the normal table; bhAdjust reproduces the step-up by hand") {
    val probe = Seq(0.0, 1.959964, -1.959964, 3.0).toDF("x")
      .select(Analytics.normalCdf(col("x")).as("c")).collect().map(_.getDouble(0))
    assert(math.abs(probe(0) - 0.5) < 1e-7)
    assert(math.abs(probe(1) - 0.975) < 1e-4)
    assert(math.abs(probe(1) - (1.0 - probe(2))) < 1e-9, "symmetry")
    assert(probe(3) > 0.9986)
    val tests = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.05))
      .toDF("id", "p")
    val adj = Analytics.bhAdjust(tests, "p", col("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // matches R p.adjust(c(.01,.04,.03,.05), "BH") = .04 .05 .05 .05
    assert(adj == Map("a" -> 0.04, "b" -> 0.05, "c" -> 0.05, "d" -> 0.05),
      s"hand-computed BH mismatch: $adj")
  }

  test("rankBiasedOverlap: 1 for identical rankings, 0 for disjoint, ordered in between") {
    def ranking(docs: Seq[Long]) =
      docs.zipWithIndex.map { case (d, i) => ("q", d, i + 1) }
        .toDF("qid", "doc", "rank")
    val x = ranking(1L to 10L)
    val same = Analytics.rankBiasedOverlap(x, ranking(1L to 10L),
      "qid", "doc", "rank").collect()(0).getDouble(1)
    // identical top-10: RBO@10 = sum of all suffix weights = 0.651322
    assert(math.abs(same - 0.651322) < 1e-6, s"$same")
    val disjoint = Analytics.rankBiasedOverlap(x, ranking(11L to 20L),
      "qid", "doc", "rank").collect()(0).getDouble(1)
    assert(disjoint == 0.0)
    // agreeing only at rank 1 beats agreeing only at rank 10
    val topHit = Analytics.rankBiasedOverlap(x,
      ranking(1L +: (21L to 29L)), "qid", "doc", "rank")
      .collect()(0).getDouble(1)
    val tailHit = Analytics.rankBiasedOverlap(x,
      ranking((31L to 39L) :+ 10L), "qid", "doc", "rank")
      .collect()(0).getDouble(1)
    assert(topHit > tailHit && tailHit > 0.0, s"$topHit vs $tailHit")
  }

  test("effectiveSampleSize: uniform weights keep full power, skew halves it") {
    val uni = Seq.fill(100)(1.0).toDF("w")
    val r = Analytics.effectiveSampleSize(uni, col("w")).collect()(0)
    assert(r.getLong(0) == 100L && r.getDouble(2) == 100.0 && r.getDouble(3) == 1.0)
    // one row carrying half the total mass: ESS collapses well below n
    val skew = (Seq.fill(99)(1.0) :+ 99.0).toDF("w")
    val s = Analytics.effectiveSampleSize(skew, col("w")).collect()(0)
    assert(s.getDouble(2) < 5.0 && s.getDouble(3) > 20.0, s"$s")
  }

  test("mixtureBudget: exact waterfill, full-cap overflow, loud missing weight") {
    val avail = Seq(("A", 100L), ("B", 1000L)).toDF("src", "tokens")
    val w = Map("A" -> 1.0, "B" -> 1.0)
    val out = DataPrep.mixtureBudget(avail, "src", "tokens", w,
        budget = 600.0, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    // A caps at 200 (2 epochs); the freed budget flows to B at lambda=400
    assert(out("A") == ((200.0, 2.0, true)) && out("B") == ((400.0, 0.4, false)),
      s"$out")
    val over = DataPrep.mixtureBudget(avail, "src", "tokens", w,
        budget = 5000.0, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getBoolean(6))).toMap
    assert(over == Map("A" -> ((200.0, true)), "B" -> ((2000.0, true))), s"$over")
    intercept[Exception] {
      DataPrep.mixtureBudget(avail, "src", "tokens", Map("A" -> 1.0),
        budget = 100.0, maxEpochs = 1.0).collect()
    }
  }

  test("retrievalMetrics: hand-computed nDCG/MRR, zero rows, rel<=0 dropped") {
    val run = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 20L, 1.0), (1L, 30L, 2.0), (1L, 99L, 1.0),
      (2L, 50L, 1.0), (2L, 10L, 0.0)).toDF("query_id", "doc_id", "rel")
    val r = Analytics.retrievalMetrics(run, qrels, "query_id", "doc_id",
        "rank", "rel", k = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    // q1: first relevant at rank 2; only d20 (rel 1) inside k=2
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val ndcg1 = (1.0 / log2(3)) / (3.0 / log2(2) + 1.0 / log2(3))
    assert(r(1L)._1 == 3L && r(1L)._2 == 0.5, s"${r(1L)}")
    assert(math.abs(r(1L)._3 - ndcg1) < 1e-6, s"${r(1L)._3} vs $ndcg1")
    assert(r(1L)._4 == 0.5 && math.abs(r(1L)._5 - 1.0 / 3) < 1e-6)
    // q2: judged but nothing relevant retrieved (the rel=0 judgment on
    // the retrieved doc must NOT count) -> all-zero metrics row
    assert(r(2L) == ((1L, 0.0, 0.0, 0.0, 0.0)), s"${r(2L)}")
  }

  test("noveltyCurve: re-ingested content stops counting as new") {
    // shard 0: docs A,B; shard 1: B again + new C; shard 2: all repeats
    val df = Seq((0L, "A"), (0L, "B"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "C")).toDF("shard", "text")
    val out = DataPrep.noveltyCurve(df, col("shard"), "text")
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toList
    assert(out == List((0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L), (2L, 2L, 0L, 3L)),
      s"unexpected curve: $out")
  }

  test("splitLeakageAudit counts straddling pairs per unordered split pair") {
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "valid"))
      .toDF("id", "split")
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 4L)).toDF("id_a", "id_b")
    val out = DataPrep.splitLeakageAudit(assign, "id", "split", pairs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    // (1,2) and (2,1) both land in the unordered (test, train) cell
    assert(out == Set(("test", "train", 2L, true), ("train", "train", 1L, false),
      ("test", "valid", 1L, true)))
  }

  test("mixToTarget: binding stratum whole, others downsampled, unlisted dropped") {
    import graft.ops.DataPrep
    // a:1200 b:600 c:200 x:100; targets .5/.3/.2 -> budget = min(2400,
    // 2000, 1000) = 1000 -> keep a~500 b~300 c=200(all); x dropped
    val df = ((0 until 1200).map(i => (s"a$i", "a")) ++
              (0 until 600).map(i => (s"b$i", "b")) ++
              (0 until 200).map(i => (s"c$i", "c")) ++
              (0 until 100).map(i => (s"x$i", "x"))).toDF("id", "g")
    val mixed = DataPrep.mixToTarget(df, col("id"), col("g"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val counts = mixed.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("c", 0L) == 200L, "binding stratum must be kept whole")
    assert(!counts.contains("x"), "stratum absent from targets must be dropped")
    assert(math.abs(counts("a") - 500L) < 60, s"a ~ 500, got ${counts("a")}")
    assert(math.abs(counts("b") - 300L) < 45, s"b ~ 300, got ${counts("b")}")
    // deterministic: same inputs -> identical subset
    val again = DataPrep.mixToTarget(df, col("id"), col("g"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)).select("id").collect().map(_.getString(0)).toSet
    assert(mixed.select("id").collect().map(_.getString(0)).toSet == again)
    intercept[IllegalArgumentException] {
      DataPrep.mixToTarget(df, col("id"), col("g"), Map("a" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      DataPrep.mixToTarget(df, col("id"), col("g"), Map("zz" -> 1.0))
    }
  }

  test("cohortRetention: hand-computed matrix, offset-0 denominator") {
    import spark.implicits._
    // 10-second periods. u1 cohort p0 active {0,10,20}; u2 cohort p0
    // active {0,20}; u3 cohort p10 active {10}.
    val ev = Seq((1L, 0L), (1L, 5L), (1L, 12L), (1L, 25L),
                 (2L, 3L), (2L, 21L), (3L, 14L))
      .toDF("u", "sec").select(col("u"), timestamp_seconds(col("sec")).as("ts"))
    val m = Analytics.cohortRetention(ev, col("u"), col("ts"), 10L)
      .orderBy("cohort_period", "period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(m((0L, 0L)) == ((2L, 2L, 100.0)))
    assert(m((0L, 1L)) == ((1L, 2L, 50.0)))
    assert(m((0L, 2L)) == ((2L, 2L, 100.0)))
    assert(m((10L, 0L)) == ((1L, 1L, 100.0)))
    assert(m.size == 4, "a period with no active cohort member emits no row")
  }

  test("welchTTest: hand-computed t statistic and Welch-Satterthwaite df") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
              Seq(2.0, 4.0, 6.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = Analytics.welchTTest(df, col("g") === "a", col("v"), dp = 4).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    // t = (2-5)/sqrt(1/3 + (20/3)/4) = -3/sqrt(2); df = 4/0.9814815
    assert(r.getDouble(4) == -2.1213, s"t_stat ${r.getDouble(4)}")
    assert(r.getDouble(5) == 4.0755, s"welch_df ${r.getDouble(5)}")
  }

  test("skyline2D: matches brute-force dominance on a dense set; duplicates survive") {
    import spark.implicits._
    val pts = (0 until 200).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, r.nextInt(40).toDouble, r.nextInt(40).toDouble)
    }
    val df = pts.toDF("id", "x", "y").repartition(7)
    def brute(ps: Seq[(Long, Double, Double)]) = ps.filter { case (_, x, y) =>
      !ps.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(_._1).toSet
    val got = Analytics.skyline2D(df, col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts), s"missing=${brute(pts) -- got} extra=${got -- brute(pts)}")
    // identical maximal points do not dominate each other — both stay
    val dup = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 1.0, 1.0)).toDF("id", "x", "y")
    assert(Analytics.skyline2D(dup, col("x"), col("y"))
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    // degenerate bucket counts still exact
    assert(Analytics.skyline2D(df, col("x"), col("y"), buckets = 1)
      .select("id").as[Long].collect().toSet == brute(pts))
    assert(Analytics.skyline2D(df.where(lit(false)), col("x"), col("y")).count() == 0)
  }

  test("debounce: hand-computed bursts, per-key isolation, gap boundary") {
    import spark.implicits._
    // key a: events at 0, 100, 700, 750, 2000 with gap 600 → the
    // 100→700 gap is EXACTLY 600 and continues the burst, so bursts
    // are {0,100,700,750} and {2000}
    val ev = Seq(("a", 0L), ("a", 100L), ("a", 700L), ("a", 750L), ("a", 2000L),
                 ("b", 0L))
      .zipWithIndex.map { case ((k, sec), i) => (k, i.toLong, sec) }
      .toDF("k", "id", "sec")
      .select(col("k"), col("id"), timestamp_seconds(col("sec")).as("ts"))
    val m = Analytics.debounce(ev, Seq(col("k")), col("ts"), Seq(col("id")), 600L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m(("a", 1L)) == ((0L, 750L, 4L, 750L)),
      s"gap of exactly 600 (100→700) must NOT break the burst: ${m(("a", 1L))}")
    assert(m(("a", 2L)) == ((2000L, 2000L, 1L, 0L)))
    assert(m(("b", 1L)) == ((0L, 0L, 1L, 0L)), "keys must not chain into each other")
    assert(m.size == 3)
  }

  test("stickiness: hand-computed DAU/WAU, trailing window, multi-event days dedup") {
    import spark.implicits._
    // d1:{u1,u2} d2:{u1} d3:{u3}; u1 twice on d1 must count once
    val ev = Seq(("u1", "2026-01-01 01:00:00"), ("u1", "2026-01-01 09:00:00"),
                 ("u2", "2026-01-01 02:00:00"), ("u1", "2026-01-02 03:00:00"),
                 ("u3", "2026-01-03 04:00:00"))
      .toDF("u", "s").select(col("u"), col("s").cast("timestamp").as("ts"))
    val m = Analytics.stickiness(ev, col("u"), col("ts"), windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("2026-01-01") == ((2L, 2L, 1.0)), s"${m("2026-01-01")}")
    assert(m("2026-01-02") == ((1L, 2L, 0.5)), "window reaches back to d1")
    assert(m("2026-01-03") == ((1L, 2L, 0.5)), "u1 from d2 still in d3's window")
    assert(m.size == 3, "no phantom anchor days past the span")
  }

  test("sampleRatioMismatch: hand-computed chi2; non-even expected split") {
    import spark.implicits._
    // 60/40 against expected 50/50: chi2 = (60-50)²/50 + (40-50)²/50 = 4
    val df = ((1 to 60).map(_ => true) ++ (1 to 40).map(_ => false)).toDF("a")
    val r = Analytics.sampleRatioMismatch(df, col("a")).head()
    assert(r.getLong(0) == 60 && r.getLong(1) == 40)
    assert(r.getDouble(3) == 4.0 && r.getBoolean(4), s"chi2 4 > 3.841 flags: $r")
    // the same counts against an INTENDED 60/40 split are clean
    val ok = Analytics.sampleRatioMismatch(df, col("a"), expectedA = 0.6).head()
    assert(ok.getDouble(3) == 0.0 && !ok.getBoolean(4))
    intercept[IllegalArgumentException](
      Analytics.sampleRatioMismatch(df, col("a"), expectedA = 1.0))
  }

  test("gini: closed-form extremes and hand-computed middle") {
    import spark.implicits._
    def r6(x: Double) = math.BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // perfectly even: G = 0; one-holder: G = (n-1)/n
    val even = (1 to 10).map(i => (i.toLong, 1L, 5.0)).toDF("u", "e", "v")
    assert(Analytics.gini(even, col("u"), col("v")).head().getDouble(2) == 0.0)
    val one = ((1 to 9).map(i => (i.toLong, 0.0)) :+ (10L, 100.0)).toDF("u", "v")
    assert(Analytics.gini(one, col("u"), col("v")).head().getDouble(2) == r6(0.9))
    // hand case: x = (1,2,3,4) → G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    val mid = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("u", "v")
    val g = Analytics.gini(mid, col("u"), col("v")).head()
    assert(g.getLong(0) == 4 && g.getDouble(2) == 0.25, s"$g")
    assert(g.getDouble(3) == 1.0, "4 units: top-10 share is everything")
    // events collapse per unit before ranking
    val ev = Seq((1L, 1.0), (1L, 1.0), (2L, 2.0)).toDF("u", "v") // units hold 2, 2
    assert(Analytics.gini(ev, col("u"), col("v")).head().getDouble(2) == 0.0)
  }

  test("kaplanMeier: textbook product-limit values, censoring, all-fail collapse") {
    import spark.implicits._
    // durations 1e, 2e, 3c, 4e, 5c → S = 0.8, 0.6, 0.3 at t = 1, 2, 4;
    // censored times 3 and 5 emit no row but stay in the risk sets
    val d = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true), (5.0, false))
      .toDF("t", "e")
    val km = Analytics.kaplanMeier(d, col("t"), col("e"))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(km == Map(1.0 -> ((5L, 1L, 0.8)), 2.0 -> ((4L, 1L, 0.6)),
      4.0 -> ((2L, 1L, 0.3))), s"textbook KM: $km")
    // everyone fails at the last event time → S hits exactly 0
    val af = Seq((1.0, true), (2.0, true), (2.0, true)).toDF("t", "e")
    val k2 = Analytics.kaplanMeier(af, col("t"), col("e"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(k2(2.0) == 0.0, s"all-fail must collapse to 0, got $k2")
  }

  test("ksTest: hand-computed D on a planted shift; identical cohorts D=0") {
    // A = {1,2,3,4}, B = {3,4,5,6}: CDF gap peaks at v=2 (2/4 - 0/4)
    val df = (Seq(1, 2, 3, 4).map(v => (v, true)) ++
      Seq(3, 4, 5, 6).map(v => (v, false))).toDF("v", "ina")
    val r = Analytics.ksTest(df, col("v"), col("ina")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4, s"$r")
    assert(r.getDouble(2) == 0.5, s"$r")
    // crit = 1.358 * sqrt(8/16) ≈ 0.96, so no rejection at n=4
    assert(math.abs(r.getDouble(3) - 1.358 * math.sqrt(0.5)) < 1e-6)
    assert(!r.getBoolean(4))
    val same = (Seq(1, 2, 3).map(v => (v, true)) ++
      Seq(1, 2, 3).map(v => (v, false))).toDF("v", "ina")
    assert(Analytics.ksTest(same, col("v"), col("ina")).head().getDouble(2) == 0.0)
  }

  test("mannWhitneyU: hand-computed U with ties; z NULL when all tied") {
    // A = {1,2,2}, B = {2,3}: ranks 1, avg(2,3,4)=3 for the three 2s, 5
    // R_a = 1 + 3 + 3 = 7; U_a = 7 - 3*4/2 = 1; U_b = 6 - 1 = 5
    val df = (Seq(1, 2, 2).map(v => (v, true)) ++
      Seq(2, 3).map(v => (v, false))).toDF("v", "ina")
    val r = Analytics.mannWhitneyU(df, col("v"), col("ina")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 5.0, s"$r")
    // tie correction: ties = sum(t^3 - t) = 3^3-3 = 24 over n=5
    val s2 = (3.0 * 2 / 12) * ((5 + 1) - 24.0 / (5.0 * 4))
    assert(math.abs(r.getDouble(4) - (1.0 - 3.0) / math.sqrt(s2)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(5) - (1 - 2 * 1.0 / 6)) < 1e-6, s"$r")
    val tied = Seq((7, true), (7, false), (7, true)).toDF("v", "ina")
    assert(Analytics.mannWhitneyU(tied, col("v"), col("ina")).head().isNullAt(4))
  }

  test("rddEffect: hand-computed jump and intercept SE; bandwidth filter; degenerate NULL") {
    // left (x-c, y): (-3,0), (-2,2), (-1,1): b=.5, a=2, SSR=1.5,
    //   Var(a) = 1.5*(1/3 + 4/2) = 3.5
    // right: (1,10), (2,11), (3,12): exact line b=1, a=9, Var 0
    // effect = 7, se = sqrt(3.5)
    val df = Seq((7.0, 0.0), (8.0, 2.0), (9.0, 1.0),
      (11.0, 10.0), (12.0, 11.0), (13.0, 12.0),
      (30.0, 99.0)) // outside the bandwidth: must be ignored
      .toDF("x", "y")
    val r = Analytics.rddEffect(df, col("x"), col("y"),
      cutoff = 10.0, bandwidth = 5.0).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3, s"$r")
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 1.0, s"$r")
    assert(r.getDouble(4) == 7.0, s"$r")
    assert(math.abs(r.getDouble(5) - math.sqrt(3.5)) < 1e-6, s"$r")
    assert(r.getBoolean(6), s"$r")
    // an exact fit on BOTH sides: effect reported, se = 0 -> NULL verdict
    val exact = Seq((8.0, 1.0), (9.0, 2.0), (7.0, 0.0),
      (11.0, 6.0), (12.0, 7.0), (13.0, 8.0)).toDF("x", "y")
    val re = Analytics.rddEffect(exact, col("x"), col("y"), 10.0, 5.0).head()
    assert(re.getDouble(4) == 2.0 && re.getDouble(5) == 0.0 &&
      re.isNullAt(6), s"$re")
    // a side below 3 points: NULL effect
    val thin = Seq((9.0, 1.0), (8.0, 2.0),
      (11.0, 5.0), (12.0, 6.0), (13.0, 7.0)).toDF("x", "y")
    assert(Analytics.rddEffect(thin, col("x"), col("y"), 10.0, 5.0)
      .head().isNullAt(4))
  }

  test("ipwEffect: constant propensity reduces to arm means; ESS = n per arm; deterministic") {
    // constant feature -> the fitted propensity is the same for every
    // row -> the Hajek means ARE the arm means and ESS = n per arm
    val df = Seq((10.0, true, 1.0), (14.0, true, 1.0),
      (1.0, false, 1.0), (3.0, false, 1.0), (5.0, false, 1.0))
      .toDF("y", "t", "x")
    val r = Analytics.ipwEffect(df, col("y"), col("t"), Seq(col("x")),
      iters = 4).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 2 && r.getLong(2) == 3, s"$r")
    assert(r.getDouble(3) == 12.0 && r.getDouble(4) == 3.0, s"$r")
    assert(r.getDouble(5) == 9.0, s"$r")
    assert(math.abs(r.getDouble(6) - 2.0) < 1e-6 &&
      math.abs(r.getDouble(7) - 3.0) < 1e-6, s"$r")
    // a real covariate: ESS can only shrink below the arm counts, and
    // the estimate is a pure function of the data
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(120) {
      val x = rnd.nextInt(10) / 10.0
      val t = rnd.nextInt(10) / 10.0 < 0.3 + 0.4 * x // confounded arm
      (x * 10 + rnd.nextInt(5) + (if (t) 2 else 0), t, x)
    }
    val big = data.toDF("y", "t", "x")
    val b1 = Analytics.ipwEffect(big, col("y"), col("t"), Seq(col("x"))).head()
    val b2 = Analytics.ipwEffect(big, col("y"), col("t"), Seq(col("x"))).head()
    assert(b1 == b2, s"$b1 vs $b2")
    assert(b1.getDouble(6) <= b1.getLong(1) + 1e-9 &&
      b1.getDouble(7) <= b1.getLong(2) + 1e-9, s"ESS <= n per arm: $b1")
  }

  test("cochranArmitage: hand-computed trend z; flat rates 0; degenerate NULL") {
    def grp(g: String, succ: Int, fail: Int) =
      Seq.fill(succ)((g, true)) ++ Seq.fill(fail)((g, false))
    // rates 2/10, 5/10, 8/10 over scores 0,1,2:
    // T = 21 - 30*0.5 = 6; Var = .25*(50 - 900/30) = 5 -> z = 6/sqrt(5)
    val df = (grp("a", 2, 8) ++ grp("b", 5, 5) ++ grp("c", 8, 2))
      .toDF("g", "y")
    val r = Analytics.cochranArmitage(df, col("y"), col("g"),
      Seq("a", "b", "c")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 30, s"$r")
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 6.0, s"$r")
    assert(math.abs(r.getDouble(4) - 6.0 / math.sqrt(5.0)) < 1e-6, s"$r")
    assert(r.getBoolean(5), s"$r")
    // identical rates: T = 0, no trend
    val flat = (grp("a", 5, 5) ++ grp("b", 5, 5) ++ grp("c", 5, 5))
      .toDF("g", "y")
    val rf = Analytics.cochranArmitage(flat, col("y"), col("g"),
      Seq("a", "b", "c")).head()
    assert(rf.getDouble(3) == 0.0 && !rf.getBoolean(5), s"$rf")
    // unanimous success: zero variance -> NULL z
    val all = (grp("a", 5, 0) ++ grp("b", 5, 0)).toDF("g", "y")
    assert(Analytics.cochranArmitage(all, col("y"), col("g"),
      Seq("a", "b")).head().isNullAt(4))
  }

  test("smdBalance: hand-computed SMD; balanced arms; constant covariate NULL") {
    // cov "u": t = [1,3] (mean 2, var 2), c = [5,9] (mean 7, var 8)
    //   SMD = -5/sqrt(5); cov "v" identical across arms -> SMD 0
    // cov "w" constant everywhere -> pooled sd 0 -> NULL
    val df = Seq((true, 1.0, 1.0, 7.0), (true, 3.0, 2.0, 7.0),
      (false, 5.0, 1.0, 7.0), (false, 9.0, 2.0, 7.0))
      .toDF("t", "u", "v", "w")
    val r = Analytics.smdBalance(df, col("t"),
        Seq("u" -> col("u"), "v" -> col("v"), "w" -> col("w")))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("u").getDouble(1) == 2.0 && r("u").getDouble(2) == 7.0,
      s"${r("u")}")
    assert(math.abs(r("u").getDouble(3) - (-5.0 / math.sqrt(5.0))) < 1e-6,
      s"${r("u")}")
    assert(!r("u").getBoolean(4), s"${r("u")}")
    assert(r("v").getDouble(3) == 0.0 && r("v").getBoolean(4), s"${r("v")}")
    assert(r("w").isNullAt(3) && r("w").isNullAt(4), s"${r("w")}")
    // a NULL covariate drops the whole row (count matches the sums)
    val withNull = Seq((true, 1.0, Some(1.0)), (true, 3.0, None),
      (false, 5.0, Some(2.0)), (false, 9.0, Some(4.0)))
      .toDF("t", "u", "v")
    val rn = Analytics.smdBalance(withNull, col("t"),
        Seq("u" -> col("u"), "v" -> col("v")))
      .collect().map(x => x.getString(0) -> x).toMap
    // treated arm keeps only (1, 1): n_t = 1 -> below the n >= 2 bar
    assert(rn("u").getDouble(1) == 1.0 && rn("u").isNullAt(3), s"${rn("u")}")
  }

  test("cupedLift: hand-computed theta/lifts/variance reduction; constant covariate NULL") {
    // t: y = 2x over x=1..3; c: y = x over x=1..3
    // theta = 6/4 = 1.5; lift_raw = 4-2 = 2; x-means equal -> adj = 2
    // residual var = .25 per arm -> se_adj = sqrt(1/6)
    // vy_t = 4, vy_c = 1 -> se_raw = sqrt(5/3); var_reduction = 1-7/16
    val df = Seq((1.0, 2.0, true), (2.0, 4.0, true), (3.0, 6.0, true),
      (1.0, 1.0, false), (2.0, 2.0, false), (3.0, 3.0, false))
      .toDF("x", "y", "t")
    val r = Analytics.cupedLift(df, col("y"), col("x"), col("t")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3, s"$r")
    assert(r.getDouble(2) == 1.5, s"$r")
    assert(r.getDouble(3) == 2.0 && r.getDouble(5) == 2.0, s"$r")
    assert(math.abs(r.getDouble(4) - math.sqrt(5.0 / 3)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(6) - math.sqrt(1.0 / 6)) < 1e-6, s"$r")
    assert(r.getDouble(7) == 0.5625, s"$r")
    assert(r.getBoolean(8), s"$r")
    // constant covariate: var(x) = 0 -> theta and adjusted columns NULL,
    // raw lift still reported
    val const = Seq((5.0, 2.0, true), (5.0, 4.0, true),
      (5.0, 1.0, false), (5.0, 2.0, false)).toDF("x", "y", "t")
    val rc = Analytics.cupedLift(const, col("y"), col("x"), col("t")).head()
    assert(rc.isNullAt(2) && rc.isNullAt(5) && !rc.isNullAt(3), s"$rc")
    // an arm below 2 rows: everything NULL
    val tiny = Seq((1.0, 2.0, true), (1.0, 1.0, false), (2.0, 2.0, false))
      .toDF("x", "y", "t")
    assert(Analytics.cupedLift(tiny, col("y"), col("x"), col("t"))
      .head().isNullAt(3))
  }

  test("diffInDiff: hand-computed 2x2; baseline shift cancels; small cell NULL") {
    def cell(t: Boolean, p: Boolean, ys: Seq[Double]) =
      ys.map(y => (y, t, p))
    // t-pre [1,2], t-post [4,5]; c-pre [1,3], c-post [2,4]
    // DiD = (4.5-1.5) - (3-2) = 2; se = sqrt(.25+.25+1+1) = sqrt(2.5)
    val df = (cell(true, false, Seq(1, 2)) ++ cell(true, true, Seq(4, 5)) ++
      cell(false, false, Seq(1, 3)) ++ cell(false, true, Seq(2, 4)))
      .toDF("y", "t", "p")
    val r = Analytics.diffInDiff(df, col("y"), col("t"), col("p")).head()
    assert((0 to 3).map(r.getLong) == Seq(2L, 2L, 2L, 2L), s"$r")
    assert(r.getDouble(4) == 2.0, s"$r")
    assert(math.abs(r.getDouble(5) - math.sqrt(2.5)) < 1e-6, s"$r")
    assert(!r.getBoolean(6), s"$r")
    // a pure baseline shift of the treated group cancels out: DiD = 0
    val shifted = (cell(true, false, Seq(11, 12)) ++
      cell(true, true, Seq(12, 13)) ++
      cell(false, false, Seq(1, 2)) ++ cell(false, true, Seq(2, 3)))
      .toDF("y", "t", "p")
    assert(Analytics.diffInDiff(shifted, col("y"), col("t"), col("p"))
      .head().getDouble(4) == 0.0)
    // any cell below 2 rows: NULL estimate
    val missing = (cell(true, false, Seq(1, 2)) ++ cell(true, true, Seq(4)) ++
      cell(false, false, Seq(1, 3)) ++ cell(false, true, Seq(2, 4)))
      .toDF("y", "t", "p")
    assert(Analytics.diffInDiff(missing, col("y"), col("t"), col("p"))
      .head().isNullAt(4))
  }

  test("cramerVonMises: hand-computed T; identical 0; disjoint rejects; empty NULL") {
    // A = {0}, B = {1}: at 0 the CDF gap is 1 (t=1), at 1 it is 0
    // T = (1*1/4) * 1 = 0.25
    val df = Seq((0.0, true), (1.0, false)).toDF("v", "ina")
    val r = Analytics.cramerVonMises(df, col("v"), col("ina")).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 1, s"$r")
    assert(r.getDouble(2) == 0.25 && !r.getBoolean(3), s"$r")
    // identical distributions: T = 0
    val same = (Seq(1.0, 2.0, 3.0).map((_, true)) ++
      Seq(1.0, 2.0, 3.0).map((_, false))).toDF("v", "ina")
    assert(Analytics.cramerVonMises(same, col("v"), col("ina"))
      .head().getDouble(2) == 0.0)
    // fully separated 20-vs-20: sum t*(dF)^2 = (2870 + 2470)/400,
    // T = 0.25 * 13.35 = 3.3375 >> 0.461 -> reject
    val split = ((1 to 20).map(v => (v.toDouble, true)) ++
      (21 to 40).map(v => (v.toDouble, false))).toDF("v", "ina")
    val rs = Analytics.cramerVonMises(split, col("v"), col("ina")).head()
    assert(math.abs(rs.getDouble(2) - 3.3375) < 1e-6, s"$rs")
    assert(rs.getBoolean(3), s"$rs")
    // empty cohort: NULL statistic and verdict
    val one = Seq((1.0, true), (2.0, true)).toDF("v", "ina")
    val ro = Analytics.cramerVonMises(one, col("v"), col("ina")).head()
    assert(ro.isNullAt(2) && ro.isNullAt(3), s"$ro")
  }

  test("wassersteinDistance: unit shift is 1; identical 0; degenerate edges") {
    // A = {0,1}, B = {1,2}: every point shifted by 1 -> W1 = 1
    val df = Seq((0.0, true), (1.0, true), (1.0, false), (2.0, false))
      .toDF("v", "ina")
    val r = Analytics.wassersteinDistance(df, col("v"), col("ina")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 1.0, s"$r")
    // identical distributions: 0
    val same = (Seq(1.0, 2.0, 3.0).map((_, true)) ++
      Seq(1.0, 2.0, 3.0).map((_, false))).toDF("v", "ina")
    assert(Analytics.wassersteinDistance(same, col("v"), col("ina"))
      .head().getDouble(2) == 0.0)
    // scale check: doubling the shift doubles W1 (it is in data units)
    val far = Seq((0.0, true), (1.0, true), (2.0, false), (3.0, false))
      .toDF("v", "ina")
    assert(Analytics.wassersteinDistance(far, col("v"), col("ina"))
      .head().getDouble(2) == 2.0)
    // one distinct value: zero distance, still one row out
    val one = Seq((5.0, true), (5.0, false)).toDF("v", "ina")
    assert(Analytics.wassersteinDistance(one, col("v"), col("ina"))
      .head().getDouble(2) == 0.0)
    // empty cohort: NULL
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "ina")
    assert(Analytics.wassersteinDistance(oneSided, col("v"), col("ina"))
      .head().isNullAt(2))
  }

  test("jonckheereTest: hand-computed JT/z; k=2 equals Mann-Whitney with ties; flat NULL") {
    // A=[1,2], B=[3,4], C=[5,6]: every cross pair ordered -> JT = 12,
    // mean = (36-12)/4 = 6, Var = (6*5*17 - 3*2*1*9)/72 = 456/72 = 19/3
    // (equals the classic no-tie form (36*15 - 3*4*7)/72)
    val df = Seq(("A", 1), ("A", 2), ("B", 3), ("B", 4), ("C", 5), ("C", 6))
      .toDF("g", "v")
    val r = Analytics.jonckheereTest(df, col("v"), col("g"),
      Seq("A", "B", "C")).head()
    assert(r.getInt(0) == 3 && r.getLong(1) == 6, s"$r")
    assert(r.getDouble(2) == 12.0, s"$r")
    assert(math.abs(r.getDouble(3) - 6.0 / math.sqrt(19.0 / 3)) < 1e-6, s"$r")
    assert(r.getBoolean(4), s"$r")
    // k = 2 with heavy ties: |z_JT| must equal |z_MW| (independent
    // implementations; JT counts "later beats earlier", MW ranks A)
    val rnd = new scala.util.Random(31)
    val data = Seq.fill(120)((if (rnd.nextBoolean()) "A" else "B",
      rnd.nextInt(6)))
    val two = data.toDF("g", "v")
    val zj = Analytics.jonckheereTest(two, col("v"), col("g"),
      Seq("A", "B")).head().getDouble(3)
    val zm = Analytics.mannWhitneyU(two, col("v"), col("g") === "A")
      .head().getDouble(4)
    assert(math.abs(zj + zm) < 1e-9, s"JT $zj vs MW $zm")
    // all values identical: variance 0 -> NULL z and verdict
    val flat = Seq(("A", 5), ("B", 5)).toDF("g", "v")
    val rf = Analytics.jonckheereTest(flat, col("v"), col("g"),
      Seq("A", "B")).head()
    assert(rf.getDouble(2) == 0.5 && rf.isNullAt(3) && rf.isNullAt(4), s"$rf")
    // rows outside the given order are excluded
    val extra = Seq(("A", 1), ("B", 2), ("X", 99)).toDF("g", "v")
    assert(Analytics.jonckheereTest(extra, col("v"), col("g"),
      Seq("A", "B")).head().getLong(1) == 2)
  }

  test("partialCorr: confounder-only association vanishes; perfect control NULL") {
    // x = z + a, y = z + b with a, b orthogonal to z, to 1, and to each
    // other (a = (1,-1,-1,1), b = (1,-3,3,-1)): both raw correlations
    // are driven entirely by z, so the partial is EXACTLY 0
    val df = Seq((2.0, 2.0, 1.0), (1.0, -1.0, 2.0), (2.0, 6.0, 3.0),
      (5.0, 3.0, 4.0)).toDF("x", "y", "z")
    val r = Analytics.partialCorr(df, col("x"), col("y"), col("z")).head()
    assert(r.getLong(0) == 4, s"$r")
    assert(r.getDouble(1) > 0.3, s"raw r_xy should be confounded up: $r")
    assert(math.abs(r.getDouble(4)) < 1e-6, s"partial must vanish: $r")
    // differential vs direct moment arithmetic on seeded data
    val rnd = new scala.util.Random(23)
    val data = Seq.fill(60)((rnd.nextInt(10).toDouble,
      rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble))
    val d = Analytics.partialCorr(data.toDF("x", "y", "z"),
      col("x"), col("y"), col("z")).head()
    def corr(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.length
      val (su, sv) = (u.sum, v.sum)
      val cov = n * u.zip(v).map { case (a, b) => a * b }.sum - su * sv
      cov / math.sqrt((n * u.map(a => a * a).sum - su * su) *
        (n * v.map(a => a * a).sum - sv * sv))
    }
    val (xs, ys, zs) = (data.map(_._1), data.map(_._2), data.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(d.getDouble(4) - expect) < 1e-6, s"$d vs $expect")
    // x perfectly tracks z: nothing left to correlate -> NULL partial
    val perfect = Seq((1.0, 2.0, 1.0), (2.0, 5.0, 2.0), (3.0, 3.0, 3.0))
      .toDF("x", "y", "z")
    assert(Analytics.partialCorr(perfect, col("x"), col("y"), col("z"))
      .head().isNullAt(4))
    // constant column: its correlations are NULL, and so is the partial
    val const = Seq((1.0, 2.0, 7.0), (2.0, 5.0, 7.0), (3.0, 3.0, 7.0))
      .toDF("x", "y", "z")
    val rc = Analytics.partialCorr(const, col("x"), col("y"), col("z")).head()
    assert(rc.isNullAt(2) && rc.isNullAt(3) && rc.isNullAt(4), s"$rc")
  }

  test("cmhTest: hand-computed OR_MH and chi2; degenerate strata") {
    // two strata, each n=10: s1 (a,b,c,d)=(4,1,2,3), s2 (3,2,1,4)
    // OR = (1.2+1.2)/(0.2+0.2) = 6; E = 3+2 = 5, V = 2/3+2/3
    // chi2 = (7-5)^2/(4/3) = 3 -> not rejected at 3.8415
    def stratum(g: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
      Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))
    val df = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 3, 2, 1, 4))
      .toDF("g", "e", "y")
    val r = Analytics.cmhTest(df, col("g"), col("e"), col("y")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 20, s"$r")
    assert(r.getDouble(2) == 6.0, s"$r")
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-6, s"$r")
    assert(!r.getBoolean(4), s"$r")
    // all outcomes positive: V = 0 in every stratum -> NULL chi2; the
    // OR denominator is 0 too -> NULL or_mh
    val ally = Seq(("s", true, true), ("s", false, true)).toDF("g", "e", "y")
    val ra = Analytics.cmhTest(ally, col("g"), col("e"), col("y")).head()
    assert(ra.isNullAt(2) && ra.isNullAt(3) && ra.isNullAt(4), s"$ra")
    // single-row stratum contributes no variance but keeps its OR mass
    val tiny = (stratum("s1", 4, 1, 2, 3) ++ Seq(("s2", true, true)))
      .toDF("g", "e", "y")
    val rt = Analytics.cmhTest(tiny, col("g"), col("e"), col("y")).head()
    // OR = (4*3/10 + 0)/(1*2/10 + 0) = 6; V from s1 only = 2/3; the
    // n=1 stratum's E equals its a (1 = 1*1/1), so sa - se = 5 - 4 = 1
    assert(rt.getDouble(2) == 6.0, s"$rt")
    assert(math.abs(rt.getDouble(3) - 1.0 / (2.0 / 3)) < 1e-6, s"$rt")
  }

  test("pettittTest: hand-computed K and split point; ties; flat series") {
    // [1,2 | 10,11]: ranks 1..4, U = (-3,-4,-3) -> K=4 at t=2,
    // p = 2 exp(-96/80) = 2 exp(-1.2)
    val df = Seq((1, 1.0), (2, 2.0), (3, 10.0), (4, 11.0)).toDF("t", "v")
    val r = Analytics.pettittTest(df, Seq(col("t")), col("v")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4 && r.getLong(2) == 2, s"$r")
    assert(math.abs(r.getDouble(3) - 2.0 * math.exp(-1.2)) < 1e-6, s"$r")
    assert(!r.getBoolean(4), s"$r")
    // tie-averaged ranks: [5,5,7] -> 2r = (3,3,6), U = (-1,-2) -> K=2 at t=2
    val tied = Seq((1, 5.0), (2, 5.0), (3, 7.0)).toDF("t", "v")
    val rt = Analytics.pettittTest(tied, Seq(col("t")), col("v")).head()
    assert(rt.getLong(1) == 2 && rt.getLong(2) == 2, s"$rt")
    // flat series: K = 0, p clamps to 1, no rejection
    val flat = Seq((1, 5.0), (2, 5.0)).toDF("t", "v")
    val rf = Analytics.pettittTest(flat, Seq(col("t")), col("v")).head()
    assert(rf.getLong(1) == 0 && rf.getDouble(3) == 1.0 && !rf.getBoolean(4),
      s"$rf")
    // single row: no interior split exists -> NULL K
    val one = Analytics.pettittTest(Seq((1, 5.0)).toDF("t", "v"),
      Seq(col("t")), col("v")).head()
    assert(one.getLong(0) == 1 && one.isNullAt(1) && one.isNullAt(3), s"$one")
  }

  test("delongTest: hand-computed components; identical scorers NULL z; auc matches aucBrier") {
    // pos A-scores {3,1}, neg {2,0}: V10_A = {1, .5}, V01_A = {.5, 1}
    //   -> auc_a = .75, S10_A = S01_A = .125, var_a = .125
    // B: pos {3,0}, neg {2,1}: auc_b = .5, S10_B = .5, S01_B = 0,
    //   cov10 = .25, cov01 = 0 -> vdiff = (.125+.5-.5)/2 + .125/2 = .125
    //   z = .25/sqrt(.125) = .7071068
    val df = Seq((3.0, 3.0, 1), (1.0, 0.0, 1), (2.0, 2.0, 0), (0.0, 1.0, 0))
      .toDF("sa", "sb", "y")
    val r = Analytics.delongTest(df, col("sa"), col("sb"), col("y")).head()
    assert(r.getDouble(0) == 0.75 && r.getDouble(1) == 0.5, s"$r")
    assert(math.abs(r.getDouble(2) - math.sqrt(0.125)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - math.sqrt(0.125)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(5) - 0.25 / math.sqrt(0.125)) < 1e-6, s"$r")
    assert(!r.getBoolean(6) && r.getLong(7) == 2 && r.getLong(8) == 2, s"$r")
    // identical scorers: difference variance 0 -> z and verdict NULL
    val same = Analytics.delongTest(df, col("sa"), col("sa"), col("y")).head()
    assert(same.getDouble(4) == 0.0 && same.isNullAt(5) && same.isNullAt(6),
      s"$same")
    // differential: auc_a equals aucBrier's rank-sum AUC (independent
    // implementations) on 200 seeded rows with heavy ties
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)((rnd.nextInt(20).toDouble,
      rnd.nextInt(20).toDouble, rnd.nextInt(2)))
    val big = data.toDF("sa", "sb", "y")
    val d = Analytics.delongTest(big, col("sa"), col("sb"), col("y")).head()
    val a = Analytics.aucBrier(big, col("sa"), col("y")).head()
    val b = Analytics.aucBrier(big, col("sb"), col("y")).head()
    assert(math.abs(d.getDouble(0) - a.getDouble(0)) < 1e-6, s"$d vs $a")
    assert(math.abs(d.getDouble(1) - b.getDouble(0)) < 1e-6, s"$d vs $b")
  }

  test("cronbachAlpha: hand-computed alpha; incomplete subjects dropped; degenerate NULL") {
    // items a, b with b = 2a over subjects 1..3: var_a = 1, var_b = 4,
    // totals (3,6,9) var = 9 -> alpha = 2*(1 - 5/9) = 8/9
    val df = Seq((1, "a", 1.0), (1, "b", 2.0), (2, "a", 2.0), (2, "b", 4.0),
      (3, "a", 3.0), (3, "b", 6.0), (4, "a", 9.0)) // subj 4 misses item b
      .toDF("subj", "item", "v")
    val r = Analytics.cronbachAlpha(df, col("subj"), col("item"), col("v")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 3 && r.getLong(2) == 1, s"$r")
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 9.0, s"$r")
    assert(math.abs(r.getDouble(5) - 8.0 / 9) < 1e-6, s"$r")
    // duplicate (subject, item) ratings average into one cell: a second
    // (1, a) rating of 3.0 makes the cell 2.0, shifting totals but not
    // completeness
    val dup = Seq((1, "a", 1.0), (1, "a", 3.0), (1, "b", 2.0),
      (2, "a", 2.0), (2, "b", 4.0)).toDF("subj", "item", "v")
    val rd = Analytics.cronbachAlpha(dup, col("subj"), col("item"), col("v")).head()
    assert(rd.getLong(1) == 2 && rd.getLong(2) == 0, s"$rd")
    // anticorrelated items with constant totals: var_total = 0 -> NULL
    val const = Seq((1, "a", 1.0), (1, "b", 2.0), (2, "a", 2.0), (2, "b", 1.0))
      .toDF("subj", "item", "v")
    assert(Analytics.cronbachAlpha(const, col("subj"), col("item"), col("v"))
      .head().isNullAt(5))
    // single item: k/(k-1) undefined -> NULL
    val one = Seq((1, "a", 1.0), (2, "a", 2.0)).toDF("subj", "item", "v")
    assert(Analytics.cronbachAlpha(one, col("subj"), col("item"), col("v"))
      .head().isNullAt(5))
  }

  test("averagePrecision: hand-computed AP/best-F1 with tie blocks; NULL one-class") {
    // desc blocks: 0.9(c1,p1) P=1 | 0.8(c2,p1) P=2/3 | 0.7(c1,p0)
    //   | 0.6(c1,p1) P=3/5 | 0.5(c1,p0)
    // AP = (1 + 2/3 + 3/5)/3 = 34/45; best F1 at 0.6: 2*3/(5+3) = 0.75
    val df = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0))
      .toDF("s", "y")
    val r = Analytics.averagePrecision(df, col("s"), col("y")).head()
    assert(math.abs(r.getDouble(0) - 34.0 / 45) < 1e-6, s"$r")
    assert(r.getDouble(1) == 0.75, s"$r")
    assert(r.getLong(2) == 3 && r.getLong(3) == 3, s"$r")
    assert(r.getDouble(4) == 0.5, s"$r")
    // perfect separation: AP = 1 and best F1 = 1
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("s", "y")
    val rp = Analytics.averagePrecision(perfect, col("s"), col("y")).head()
    assert(rp.getDouble(0) == 1.0 && rp.getDouble(1) == 1.0, s"$rp")
    // one class only: the PR curve is undefined -> NULL ap/best_f1
    val onec = Seq((0.9, 1), (0.8, 1)).toDF("s", "y")
    val r1 = Analytics.averagePrecision(onec, col("s"), col("y")).head()
    assert(r1.isNullAt(0) && r1.isNullAt(1) && r1.getLong(2) == 2, s"$r1")
  }

  test("wilcoxonSignedRank: hand-computed W+/W-; ties averaged; zeros dropped") {
    // d = x-y = [1,-2,3,-4,5]: |d| distinct, ranks 1..5
    // W+ = 1+3+5 = 9, W- = 2+4 = 6; mean = 5*6/4 = 7.5
    // s2 = 5*6*11/24 = 13.75 (no ties)
    val df = Seq((2, 1), (0, 2), (4, 1), (0, 4), (6, 1)).toDF("x", "y")
    val r = Analytics.wilcoxonSignedRank(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 0, s"$r")
    assert(r.getDouble(2) == 9.0 && r.getDouble(3) == 6.0, s"$r")
    assert(math.abs(r.getDouble(4) - (9.0 - 7.5) / math.sqrt(13.75)) < 1e-6, s"$r")
    assert(r.isNullAt(5), s"reject_05 must be NULL below n=20: $r")

    // d = [1,1,-1,2,0]: zero dropped (n=4, n_zero=1); the three |d|=1
    // tie-average to rank 2, |d|=2 takes rank 4
    // W+ = 2+2+4 = 8, W- = 2; ties = 3^3-3 = 24
    // s2 = 4*5*9/24 - 24/48 = 7.5 - 0.5 = 7; z = (8-5)/sqrt(7)
    val tied = Seq((2, 1), (3, 2), (1, 2), (5, 3), (4, 4)).toDF("x", "y")
    val rt = Analytics.wilcoxonSignedRank(tied, col("x"), col("y")).head()
    assert(rt.getLong(0) == 4 && rt.getLong(1) == 1, s"$rt")
    assert(rt.getDouble(2) == 8.0 && rt.getDouble(3) == 2.0, s"$rt")
    assert(math.abs(rt.getDouble(4) - 3.0 / math.sqrt(7.0)) < 1e-6, s"$rt")

    // all differences zero: nothing to rank, NULL statistics, zero count
    val allz = Seq((1, 1), (2, 2)).toDF("x", "y")
    val rz = Analytics.wilcoxonSignedRank(allz, col("x"), col("y")).head()
    assert(rz.getLong(0) == 0 && rz.getLong(1) == 2, s"$rz")
    assert(rz.isNullAt(4) && rz.isNullAt(5), s"$rz")
  }

  test("ohlcBars: hand-computed bars; timestamp ties broken by the tie column") {
    import spark.implicits._
    val df = Seq(
      ("A", "2024-01-01 00:00:00", 1L, 10.0),
      ("A", "2024-01-01 05:00:00", 2L, 30.0),
      ("A", "2024-01-01 23:00:00", 3L, 20.0),
      ("A", "2024-01-02 01:00:00", 4L, 5.0),
      ("B", "2024-01-01 12:00:00", 6L, 9.0), // same ts: event id 5 opens,
      ("B", "2024-01-01 12:00:00", 5L, 7.0)) //           event id 6 closes
      .toDF("g", "ts", "eid", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Analytics.ohlcBars(df, col("g"), col("ts"), col("eid"), col("v"))
      .select(col("grp"), dayofmonth(col("bucket")).as("d"), col("n"),
        col("open"), col("high"), col("low"), col("close"), col("total"))
      .collect()
      .map(x => (x.getString(0), x.getInt(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5),
          x.getDouble(6), x.getDouble(7)))).toMap
    assert(r(("A", 1)) == ((3L, 10.0, 30.0, 10.0, 20.0, 60.0)), s"$r")
    assert(r(("A", 2)) == ((1L, 5.0, 5.0, 5.0, 5.0, 5.0)), s"$r")
    assert(r(("B", 1)) == ((2L, 7.0, 9.0, 7.0, 9.0, 16.0)), s"$r")
  }

  test("corrMatrix: ±1 on linear columns, NULL on constants, one row per pair") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("a", "b", "c", "k")
    val m = Analytics.corrMatrix(df, Seq("a", "b", "c", "k")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m.size == 6, s"$m")
    assert(m(("a", "b")).contains(1.0) && m(("a", "c")).contains(-1.0) &&
      m(("b", "c")).contains(-1.0), s"$m")
    assert(m(("a", "k")).isEmpty && m(("b", "k")).isEmpty &&
      m(("c", "k")).isEmpty, s"constant column must yield NULL: $m")
    intercept[IllegalArgumentException](Analytics.corrMatrix(df, Seq("a")))
  }

  test("degenerate inputs: empty cohorts / constant columns give NaN or NULL, never errors") {
    import spark.implicits._
    // ksTest: one empty cohort → the documented NaN, not a division
    // artifact (and no DIVIDE_BY_ZERO under the ANSI-on default)
    val oneSided = Seq(1, 2, 3).map(v => (v, true)).toDF("v", "ina")
    val ks = Analytics.ksTest(oneSided, col("v"), col("ina")).head()
    assert(ks.getLong(0) == 3 && ks.getLong(1) == 0, s"$ks")
    assert(ks.getDouble(2).isNaN && ks.getDouble(3).isNaN && !ks.getBoolean(4),
      s"$ks")
    // mannWhitneyU: empty cohort → NULL z and rank_biserial
    val mw = Analytics.mannWhitneyU(oneSided, col("v"), col("ina")).head()
    assert(mw.isNullAt(4) && mw.isNullAt(5), s"$mw")
    // mannWhitneyU: a single row (the tie correction divides by n−1)
    val mw1 = Analytics.mannWhitneyU(Seq((5, true)).toDF("v", "ina"),
      col("v"), col("ina")).head()
    assert(mw1.isNullAt(4) && mw1.isNullAt(5), s"$mw1")
    // zScreenPerGroup: constant column (sd_all = 0) → NULL z and p
    val const = Seq(("g1", 5.0), ("g2", 5.0)).toDF("g", "v")
    val zs = Analytics.zScreenPerGroup(const, col("g"), col("v")).collect()
    assert(zs.forall(r => r.isNullAt(2) && r.isNullAt(3)), zs.mkString(","))
    // giniCoefficient / gini: all-zero mass → NULL coefficient/shares
    val zeros = Seq((1L, 0.0), (2L, 0.0)).toDF("u", "v")
    assert(Analytics.giniCoefficient(zeros, col("v")).head().isNullAt(2))
    val gz = Analytics.gini(zeros, col("u"), col("v")).head()
    assert(gz.isNullAt(2) && gz.isNullAt(3), s"$gz")
  }

  test("fleissKappa: hand-computed case; <2-rating items excluded") {
    // i1 [a,a,b]: P=1/3; i2 [a,a,a]: P=1 -> Pbar=2/3
    // marginals a=5/6, b=1/6 -> pe=26/36 -> kappa = exactly -0.2
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a"),
      (3L, "b")).toDF("item", "label") // i3 has 1 rating: dropped
    val r = Analytics.fleissKappa(df, "item", "label").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 6, s"$r")
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(3) - 26.0 / 36) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - -0.2) < 1e-6, s"$r")
    // unanimous single-label ratings: pe = 1 -> NULL
    val u = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "label")
    assert(Analytics.fleissKappa(u, "item", "label").head().isNullAt(4))
  }

  test("cohenKappa: hand-computed 2x2 kappa; degenerate pe=1 is NULL") {
    // 10 items: agree on 6 (4 long, 2 short), disagree on 4
    // marginals: rater A long 6 short 4; rater B long 6 short 4
    // po = 0.6; pe = (6*6 + 4*4)/100 = 0.52; kappa = 0.08/0.48
    val a = (1 to 6).map(i => (i.toLong, "long")) ++
      (7 to 10).map(i => (i.toLong, "short"))
    val b = (1 to 4).map(i => (i.toLong, "long")) ++
      (5 to 6).map(i => (i.toLong, "short")) ++
      (7 to 8).map(i => (i.toLong, "long")) ++
      (9 to 10).map(i => (i.toLong, "short"))
    val r = Analytics.cohenKappa(a.toDF("id", "label"), b.toDF("id", "label"),
      "id", "label").head()
    assert(r.getLong(0) == 10 && r.getDouble(1) == 0.6 &&
      r.getDouble(2) == 0.52, s"$r")
    assert(math.abs(r.getDouble(3) - 0.08 / 0.48) < 1e-6, s"$r")
    // both raters constant and identical -> pe = 1 -> NULL, not 1.0
    val c = Seq((1L, "x"), (2L, "x")).toDF("id", "label")
    assert(Analytics.cohenKappa(c, c, "id", "label").head().isNullAt(3))
  }

  test("kAnonymity: hand-computed risk counts; NULL combos group") {
    import graft.ops.TableHealth
    import spark.implicits._
    // combos: (10,a)×3, (10,b)×1, (20,a)×2, (NULL,a)×2 → with k=2 the
    // singleton (10,b) is the only risky group
    val df = Seq((Some(10), "a"), (Some(10), "a"), (Some(10), "a"), (Some(10), "b"),
                 (Some(20), "a"), (Some(20), "a"), (None, "a"), (None, "a"))
      .toDF("zip", "seg")
    val r = TableHealth.kAnonymity(df, Seq(col("zip"), col("seg")), 2L).head()
    assert(r.getLong(0) == 8 && r.getLong(1) == 4)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1 && !r.getBoolean(4))
    // k=3: risky groups = (10,b):1, (20,a):2, (null,a):2 → 5 risky rows
    val r3 = TableHealth.kAnonymity(df, Seq(col("zip"), col("seg")), 3L).head()
    assert(r3.getLong(2) == 3 && r3.getLong(3) == 5)
    intercept[IllegalArgumentException](
      TableHealth.kAnonymity(df, Seq(col("zip")), 1L))
  }

  test("psiOverTime: baseline period reads exactly 0; a shifted period drifts") {
    import spark.implicits._
    // day 1: values clustered low; day 2: identical distribution (psi 0
    // vs baseline); day 3: shifted high (psi large)
    val rows =
      (1 to 50).map(i => ("2024-01-01 10:00:00", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("2024-01-02 10:00:00", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("2024-01-03 10:00:00", 90.0 + (i % 10)))
    val df = rows.toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val r = Analytics.psiOverTime(df, col("ts"), col("v"))
      .collect().map(x => x.getTimestamp(0).toString.take(10) ->
        ((x.getLong(1), x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r("2024-01-01") == ((50L, 0.0, false)), s"$r")
    assert(r("2024-01-02") == ((50L, 0.0, false)),
      s"identical distribution must read 0: $r")
    assert(r("2024-01-03")._2 > 1.0 && r("2024-01-03")._3,
      s"shifted period must drift: $r")
  }

  test("jsonKeyProfile: type classification, coverage, unparseable accounting") {
    import graft.ops.Profiler
    import spark.implicits._
    val df = Seq(
      """{"k": 69, "s": "hi", "f": 1.5, "b": true, "n": null, "o": {"x":1}}""",
      """{"k": -3, "s": "yo"}""",
      "not json",
      null.asInstanceOf[String]).toDF("j")
    val r = Profiler.jsonKeyProfile(df, col("j"))
      .collect().map(x => x.getString(0) -> x).toMap
    val k = r("k")
    // n_present, coverage (2 of 4 rows), distinct, ints
    assert(k.getLong(1) == 2 && k.getDouble(2) == 0.5 &&
      k.getLong(3) == 2 && k.getLong(4) == 2, s"$k")
    assert(r("f").getLong(5) == 1, s"float: ${r("f")}")
    assert(r("b").getLong(6) == 1, s"bool: ${r("b")}")
    assert(r("n").getLong(7) == 1, s"null: ${r("n")}")
    assert(r("o").getLong(8) == 1, s"nested: ${r("o")}")
    assert(r("s").getLong(9) == 2, s"string: ${r("s")}")
    // exactly one unparseable row ("not json"); the NULL row is neither
    // present nor unparseable
    assert(k.getLong(10) == 1, s"$k")
  }

  test("tCloseness: hand-computed TVD incl. absent categories and NULL sensitive") {
    import graft.ops.TableHealth
    import spark.implicits._
    // classes A (x,x,x,y) and B (x,y,y,z); global p = x .5, y .375, z .125
    // TVD(A) = ½(|.75−.5|+|.25−.375|+|0−.125|) = .25 ; TVD(B) = .25
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "z")).toDF("q", "s")
    val r = TableHealth.tCloseness(df, Seq(col("q")), col("s"), t = 0.2).head()
    assert(r.getLong(0) == 2 && r.getDouble(1) == 0.25, s"$r")
    assert(r.getLong(2) == 2 && r.getLong(3) == 8 && !r.getBoolean(4), s"$r")
    val ok = TableHealth.tCloseness(df, Seq(col("q")), col("s"), t = 0.3).head()
    assert(ok.getLong(2) == 0 && ok.getBoolean(4), s"$ok")
    // NULL sensitive is its own category: A (x,x,x,y) + C (null,null)
    // global p = x .5, y 1/6, null 1/3; TVD(A) = ½(.25 + 1/12 + 1/3)
    // = .333333 ; TVD(C) = ½(2/3 + .5 + 1/6) = .666667
    val dfn = Seq(("A", Some("x")), ("A", Some("x")), ("A", Some("x")),
      ("A", Some("y")), ("C", None), ("C", None)).toDF("q", "s")
    val rn = TableHealth.tCloseness(dfn, Seq(col("q")), col("s"), t = 0.5).head()
    assert(rn.getLong(0) == 2 && rn.getDouble(1) == 0.666667, s"$rn")
    assert(rn.getLong(2) == 1 && rn.getLong(3) == 2, s"$rn")
    intercept[IllegalArgumentException](
      TableHealth.tCloseness(df, Seq.empty, col("s"), t = 0.2))
  }

  test("benford: first-digit extraction, exclusions, expected fractions") {
    import graft.ops.TableHealth
    import spark.implicits._
    def r6(x: Double) = math.BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // values 10..19 (digit 1, ×10), 25 & 299 (digit 2, ×2), plus
    // excluded rows: 0, 0.7 (floors to 0), null, and -345 (digit 3 by abs)
    val vals = ((10 to 19).map(_.toDouble) ++ Seq(25.0, 299.0, 0.0, 0.7, -345.0))
      .map(Option(_)) :+ Option.empty[Double]
    val df = vals.toDF("v")
    val m = TableHealth.benford(df, col("v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1) == ((10L, r6(10.0 / 13), r6(math.log10(2.0)))))
    assert(m(2)._1 == 2L && m(3)._1 == 1L, "abs() feeds the digit; sub-1 and null drop")
    assert(m.size == 3)
    assert(m.values.map(_._1).sum == 13, "0, 0.7 and NULL are excluded")
  }

  test("columnRedundancy: duplicates by content, constants, per-key pairing") {
    import graft.ops.TableHealth
    import spark.implicits._
    val df = Seq((1L, "a", "a", "x", "p"), (2L, "b", "b", "x", "q"),
                 (3L, "c", "c", "x", "a")) // col e reuses 'a' at a DIFFERENT key
      .toDF("k", "c1", "c2", "c4", "e")
    val m = TableHealth.columnRedundancy(df, "k", Seq("c1", "c2", "c4", "e"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(m("c1") == ((false, None)), "first of the pair is the original")
    assert(m("c2") == ((false, Some("c1"))), "exact duplicate points at c1")
    assert(m("c4") == ((true, None)), "constant flagged, not a duplicate")
    assert(m("e") == ((false, None)),
      "same VALUE SET at different keys is NOT a duplicate column")
    intercept[IllegalArgumentException](
      TableHealth.columnRedundancy(df, "k", Seq.empty))
  }

  test("tableFingerprint: multiset-exact, layout-invariant, multiplicity-sensitive") {
    import graft.ops.TableHealth
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c")).toDF("id", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      TableHealth.tableFingerprint(d, Seq("id", "v")).head()
    val base = fp(df)
    assert(base.getLong(0) == 3)
    // gate-robust representation: 39-char zero-padded decimal string
    assert(base.getString(1).length == 39 &&
      base.getString(1).forall(_.isDigit),
      s"fingerprint must be a 39-digit zero-padded string: ${base.getString(1)}")
    assert(fp(df.repartition(5)).getString(1) == base.getString(1) &&
      fp(df.orderBy(col("v").desc)).getString(1) == base.getString(1),
      "fingerprint must not depend on order or layout")
    assert(fp(df.where(col("id") =!= 2)).getString(1) != base.getString(1))
    // a duplicated row changes the fingerprint (SUM, not XOR)
    assert(fp(df.union(df.limit(1))).getString(1) != base.getString(1))
    // null marking: ("2", NULL) must differ from ("2", "")
    val empt = Seq((1L, "a"), (2L, ""), (3L, "c")).toDF("id", "v")
    assert(fp(empt).getString(1) != base.getString(1))
  }

  test("mutualInformation: MI = H(A) when B determines A; 0 when independent") {
    import spark.implicits._
    def r6(x: Double) = math.BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // perfectly dependent: b = a, uniform over {x, y} → MI = H = ln 2
    val dep = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")).toDF("a", "b")
    val d = Analytics.mutualInformation(dep, col("a"), col("b")).head()
    assert(d.getLong(0) == 4)
    assert(d.getDouble(1) == r6(math.log(2)) && d.getDouble(4) == r6(math.log(2)),
      s"dependent uniform pair: H(A) = MI = ln 2: $d")
    assert(d.getDouble(3) == r6(math.log(2)), "H(A,B) = H(A) under determinism")
    // independent uniform 2×2: joint = product → MI = 0, H(A,B) = 2·ln 2
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Analytics.mutualInformation(ind, col("a"), col("b")).head()
    assert(i.getDouble(4) == 0.0, s"independence must give MI 0: $i")
    assert(i.getDouble(3) == r6(2 * math.log(2)))
  }

  test("cusum: hand-computed prefix-min form, alarm crossing semantics") {
    import spark.implicits._
    // x = [1,1,5,5], mean 3, slack 0.5 → dev [-2.5,-2.5,1.5,1.5],
    // t = [-2.5,-5,-3.5,-2], s = t − min(0, run-min t) = [0,0,1.5,3]
    val df = Seq(("k", 1, 1.0), ("k", 2, 1.0), ("k", 3, 5.0), ("k", 4, 5.0))
      .toDF("g", "i", "x")
    val r = Analytics.cusum(df, col("g"), Seq(col("i")), col("x"),
      slack = 0.5, h = 2.0).head()
    assert(r.getLong(1) == 4 && r.getDouble(2) == 3.0, s"max_cusum: $r")
    assert(r.getLong(3) == 1 && r.getInt(4) == 4,
      s"one upward crossing of h=2 at position 4: $r")
    // an in-control key: constant x → s ≡ −slack-accumulated ≤ 0, no alarm
    val flat = Seq(("k", 1, 3.0), ("k", 2, 3.0), ("k", 3, 3.0)).toDF("g", "i", "x")
    val f = Analytics.cusum(flat, col("g"), Seq(col("i")), col("x"), 0.5, 2.0).head()
    assert(f.getDouble(2) == 0.0 && f.getLong(3) == 0 && f.isNullAt(4),
      s"in-control key must not alarm: $f")
  }

  test("pChart: hand-computed binomial limits flag both directions") {
    import spark.implicits._
    // A: 50/100 defects, B: 2/100 → pooled 0.26, margin 3√(.26·.74/100)
    val df = ((1 to 100).map(i => ("A", i <= 50)) ++
              (1 to 100).map(i => ("B", i <= 2))).toDF("b", "d")
    val m = Analytics.pChart(df, col("b"), col("d"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(6), r.getBoolean(7))).toMap
    val margin = 3 * math.sqrt(0.26 * 0.74 / 100)
    def r6(x: Double) = math.BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("A") == ((100L, 50L, 0.5, r6(0.26 + margin), true)), s"A high: ${m("A")}")
    assert(m("B")._5, s"B below LCL must flag: ${m("B")}")
    // balanced buckets: nothing flags
    val ok = ((1 to 100).map(i => ("A", i <= 25)) ++ (1 to 100).map(i => ("B", i <= 27)))
      .toDF("b", "d")
    assert(Analytics.pChart(ok, col("b"), col("d"))
      .where(col("out_of_control")).count() == 0)
  }

  test("schemaCheck: ok/type_mismatch/missing/unexpected, metadata-only") {
    import spark.implicits._
    val df = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    val m = graft.ops.TableHealth.schemaCheck(df, Seq(
        "id" -> "BIGINT", "name" -> "string", "score" -> "int", "gone" -> "date"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), r.getString(3))).toMap
    assert(m("id") == ((Some("bigint"), Some("bigint"), "ok")), "case-insensitive type match")
    assert(m("name") == ((Some("string"), Some("string"), "ok")))
    assert(m("score") == ((Some("int"), Some("double"), "type_mismatch")))
    assert(m("gone") == ((Some("date"), None, "missing")))
    assert(m.size == 4, "no unexpected rows when the contract covers everything")
    val extra = graft.ops.TableHealth.schemaCheck(df, Seq("id" -> "bigint"))
      .where(col("status") === "unexpected").collect().map(_.getString(0)).toSet
    assert(extra == Set("name", "score"))
    intercept[IllegalArgumentException](
      graft.ops.TableHealth.schemaCheck(df, Seq.empty))
  }

  test("weightedSample: deterministic, weight-proportional, zero-weight excluded") {
    import graft.ops.DataPrep
    import spark.implicits._
    // one heavy key (weight 50) among 200 light keys (weight 1)
    val df = ((1 to 200).map(i => (i.toLong, 1.0)) :+ (999L, 50.0)).toDF("id", "w")
    def ids(seed: Long) = DataPrep.weightedSample(df, col("id"), col("w"), 20, seed)
      .select("id").as[Long].collect().toSeq
    assert(ids(3L) == ids(3L) && ids(3L).size == 20)
    assert(ids(3L) != ids(4L), "different seed, different draw")
    // P(heavy in top-20) ≈ 1 − Π(unweighted miss) — with w=50 among 250
    // total mass the heavy key appears in the vast majority of draws
    val hits = (1L to 20L).count(s => ids(s).contains(999L))
    assert(hits >= 16, s"heavy key drawn only $hits/20 seeds")
    // a light key must not dominate: no single light key in > half the draws...
    // (weight-1 keys have ~20/250 mass per draw)
    val zero = (Seq((1L, 0.0), (2L, -3.0), (3L, 1.0))).toDF("id", "w")
    assert(DataPrep.weightedSample(zero, col("id"), col("w"), 10)
      .select("id").as[Long].collect().toSeq == Seq(3L),
      "non-positive weights carry zero mass")
  }

  test("regressionByKey: exact line recovered; constant-x group degrades to NULL") {
    import spark.implicits._
    // group "p": y = 3x + 2 exactly → slope 3, intercept 2, r² = 1
    // group "c": constant x → zero variance → NULL fit, never ±Inf
    val df = (Seq((1.0, 5.0), (2.0, 8.0), (3.0, 11.0), (4.0, 14.0)).map(t => ("p", t._1, t._2)) ++
              Seq((7.0, 1.0), (7.0, 2.0), (7.0, 9.0)).map(t => ("c", t._1, t._2)))
      .toDF("g", "x", "y")
    val m = Analytics.regressionByKey(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val p = m("p")
    assert(p.getLong(1) == 4 && p.getDouble(2) == 3.0 && p.getDouble(3) == 2.0
      && p.getDouble(4) == 1.0, s"perfect line must fit exactly: $p")
    val c = m("c")
    assert(c.getLong(1) == 3 && c.isNullAt(2) && c.isNullAt(3),
      s"zero x-variance must yield NULL, not ±Inf: $c")
  }

  test("associationPairs: hand-computed support/confidence/lift; dedup; gate") {
    import spark.implicits._
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} — with a duplicate (1,a)
    // row that must NOT double-count. nb=4, c(a)=3 c(b)=3 c(c)=2,
    // pairs: ab:2 ac:2 bc:1
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
                 (3, "a"), (3, "c"), (4, "b")).toDF("b", "i")
    val m = Analytics.associationPairs(df, col("b"), col("i"),
        minPairCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    def r6(x: Double) =
      math.BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("a", "b")) == ((2L, 0.5, r6(2.0 / 3), r6(8.0 / 9))),
      s"ab: support 2/4, confidence 2/3, lift 2·4/(3·3): ${m(("a", "b"))}")
    assert(m(("a", "c"))._1 == 2L && m(("a", "c"))._4 == r6(8.0 / 6))
    assert(m(("b", "c"))._1 == 1L)
    // the gate drops the singleton pair
    val gated = Analytics.associationPairs(df, col("b"), col("i"), 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated == Set(("a", "b"), ("a", "c")))
  }

  test("transitionMatrix: per-key ordered pairs, row-normalized, no cross-key leak") {
    import spark.implicits._
    // u1: A,B,A,B  u2: A,A,C — u1's last B must NOT chain into u2's first A
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
                 (2L, 1L, "A"), (2L, 2L, "A"), (2L, 3L, "C"))
      .toDF("u", "t", "e")
    val m = Analytics.transitionMatrix(ev, col("u"), col("e"),
        Seq(col("t")), dp = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m(("A", "B")) == ((2L, 0.5)))
    assert(m(("A", "A")) == ((1L, 0.25)))
    assert(m(("A", "C")) == ((1L, 0.25)))
    assert(m(("B", "A")) == ((1L, 1.0)))
    assert(m.size == 4)
  }

  test("calibrationBins: hand-computed bins, gains ordering, clamp at 1.0") {
    import spark.implicits._
    // binary-exact scores (no rounding knife-edges): bin0 {1/16 y=0,
    // 1/32 y=1}, bin9 {31/32 y=1, 1.0 y=1} — score exactly 1.0 must
    // clamp into the last bin, not bin 10
    val df = Seq((0.0625, 0), (0.03125, 1), (0.96875, 1), (1.0, 1)).toDF("s", "y")
    val rows = Analytics.calibrationBins(df, col("s"), col("y"), bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == Set(0, 9))
    assert(rows(0) == ((2L, 0.046875, 0.5, 1.0, 1.0)),
      s"bin0: n=2 avg=3/64 rate=.5 cum shares end at 1: ${rows(0)}")
    assert(rows(9) == ((2L, 0.984375, 1.0, 0.5, 0.666667)),
      s"bin9 (top-down first): half the population, 2/3 of positives: ${rows(9)}")
    // a stray negative score clamps into bin 0, never a phantom
    // negative bin id distorting the cumulative shares
    val neg = Seq((-0.25, 0), (0.5, 1)).toDF("s", "y")
    val nb = Analytics.calibrationBins(neg, col("s"), col("y"), bins = 10)
      .collect().map(_.getInt(0)).toSet
    assert(nb == Set(0, 5), s"negative score must land in bin 0: $nb")
    // NULL scores are excluded, not silently clamped into the top bin
    // (Spark's least/greatest skip NULL arguments)
    val withNull = Seq((Some(0.5), 1), (None, 1)).toDF("s", "y")
    val rowsN = Analytics.calibrationBins(withNull, col("s"), col("y"), bins = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowsN == Map(5 -> 1L), s"NULL score must be excluded: $rowsN")
  }

  test("theilSenByKey: outlier-robust slope where OLS is dragged") {
    import spark.implicits._
    // y = 2x except one wild outlier at x=5 (y=100). Median pairwise
    // slope stays 2; OLS over the same points would be far above 2.
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0), (5.0, 100.0))
      .map { case (x, y) => ("k", x, y) }.toDF("g", "x", "y")
    val r = Analytics.theilSenByKey(df, col("g"), col("x"), col("y")).collect()
    assert(r.length == 1)
    val (slope, intercept, nPairs) =
      (r(0).getDouble(1), r(0).getDouble(2), r(0).getLong(3))
    assert(nPairs == 10L)
    assert(slope == 2.0, s"median pairwise slope must ignore the outlier: $slope")
    assert(intercept == 0.0, s"median(y - 2x) = 0: $intercept")
  }

  test("functionalDependency: holds vs violated, NULL counts as distinct") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "b"), (2, "c"), (3, null))
      .toDF("k", "v")
    val ok = graft.ops.TableHealth.functionalDependency(
      df.where(col("k") =!= 2), "fd_ok", Seq(col("k")), col("v")).collect()(0)
    assert(ok.getAs[Boolean]("holds") && ok.getAs[Long]("n_violating_keys") == 0L)
    val bad = graft.ops.TableHealth.functionalDependency(
      df, "fd_bad", Seq(col("k")), col("v")).collect()(0)
    assert(!bad.getAs[Boolean]("holds"))
    assert(bad.getAs[Long]("n_violating_keys") == 1L)
    assert(bad.getAs[Long]("max_distinct_dependent") == 2L)
    // NULL among non-NULLs is a violation of determinism
    val withNull = df.union(Seq((3, "z")).toDF("k", "v"))
    val nv = graft.ops.TableHealth.functionalDependency(
      withNull, "fd_null", Seq(col("k")), col("v")).collect()(0)
    assert(nv.getAs[Long]("n_violating_keys") == 2L,
      "key 3 maps to {NULL, z} — two distinct dependent values")
  }

  test("rfmSegments: deterministic quartiles, recency tier 1 = most recent") {
    import spark.implicits._
    // 4 entities, 1 event each at distinct times/amounts → every tier
    // is a singleton and fully determined by the sort
    val ts = (1 to 4).map(i => (i.toLong, s"2024-01-0$i 00:00:00", i * 10.0))
    val df = ts.toDF("e", "tss", "amt")
      .select(col("e"), to_timestamp(col("tss")).as("ts"), col("amt"))
    val cells = Analytics.rfmSegments(df, col("e"), col("ts"), col("amt"),
        asOfEpoch = 1706745600L, tiles = 4, exactTiles = true)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    // entity 4: most recent (r=1), all freq equal (tie → id: e1 f=1…e4 f=4),
    // highest amount (m=1)
    assert(cells.values.sum == 4 && cells.values.forall(_ == 1L))
    assert(cells.contains((1, 4, 1)), s"entity 4 = newest, last f-tie slot, richest: $cells")
    assert(cells.contains((4, 1, 4)), s"entity 1 = oldest, first f-tie slot, poorest: $cells")
  }

  test("weightedQuantiles: hand-computed weighted CDF cut points") {
    import spark.implicits._
    // values (10,w1) (20,w3) (30,w1): W=5, cum = 10→1, 20→4, 30→5
    val df = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 1.0), (99.0, 0.0))
      .toDF("v", "w") // zero-weight row must be ignored
    val got = Analytics.globalWeightedQuantiles(df, col("v"), col("w"),
        probes = Seq(0.2, 0.5, 0.8, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(0.2 -> 10.0, 0.5 -> 20.0, 0.8 -> 20.0, 1.0 -> 30.0),
      s"weighted CDF cuts: $got")
    intercept[IllegalArgumentException](
      Analytics.globalWeightedQuantiles(df, col("v"), col("w"), probes = Seq(0.0)))
  }

  test("cusumChangepoint: planted level shift located at the regime break") {
    import spark.implicits._
    // 10 points at 1.0 then 10 at 5.0: mean 3, S descends by 2 each
    // step to -20 at t=10, then climbs back — unique peak at the break
    val pts = ((1 to 10).map(i => ("a", i, 1.0)) ++
      (11 to 20).map(i => ("a", i, 5.0))).toDF("k", "t", "x")
    val r = Analytics.cusumChangepoint(pts, col("k"), col("t"), col("x")).head()
    assert(r.getAs[Long]("n_points") == 20 && r.getAs[Double]("mean") == 3.0)
    assert(r.getAs[Double]("max_abs_cusum") == 20.0 &&
      r.getAs[Int]("changepoint_at") == 10, s"peak at the break: $r")
    val sd6 = BigDecimal(math.sqrt(80.0 / 19))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(20.0 / (sd6 * math.sqrt(20.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("score") == want, s"normalized score: $r vs $want")
    // constant series: no spread, no changepoint signal
    val flat = (1 to 5).map(i => ("b", i, 2.0)).toDF("k", "t", "x")
    val f = Analytics.cusumChangepoint(flat, col("k"), col("t"), col("x")).head()
    assert(f.getAs[Double]("score") == 0.0 &&
      f.getAs[Double]("max_abs_cusum") == 0.0, s"flat series: $f")
  }

  test("giniCoefficient: 0 for equal values, (n-1)/n for total concentration") {
    import spark.implicits._
    val even = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    val e = Analytics.giniCoefficient(even, col("v")).head()
    assert(e.getLong(0) == 4 && e.getDouble(1) == 20.0 && e.getDouble(2) == 0.0,
      s"equal values → gini 0: $e")
    val conc = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    val c = Analytics.giniCoefficient(conc, col("v")).head()
    assert(c.getDouble(2) == 0.75, s"one owner of everything → (n-1)/n: $c")
  }

  test("rfmSegments: DEFAULT approx-boundary path agrees with exact ntile on tie-free data") {
    import spark.implicits._
    // 8 entities, 2 events each (f tie-free via event counts 1..8? no —
    // keep f constant-per-entity impossible tie-free with counts, so
    // give entity i exactly i events): recency/monetary also tie-free
    val rows = (1 to 8).flatMap { i =>
      (1 to i).map(j => (i.toLong, f"2024-01-$i%02d 00:00:00", i * 10.0 + j))
    }
    val df = rows.toDF("e", "tss", "amt")
      .select(col("e"), to_timestamp(col("tss")).as("ts"), col("amt"))
    def cells(exact: Boolean) =
      Analytics.rfmSegments(df, col("e"), col("ts"), col("amt"),
          asOfEpoch = 1706745600L, tiles = 4, exactTiles = exact)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(cells(false) == cells(true),
      s"approx boundaries must reproduce ntile tiers on tie-free, " +
        s"evenly-divisible data:\n${cells(false)}\n${cells(true)}")
    // plan shape: the default path must not contain a Window (ntile)
    val plan = Analytics.rfmSegments(df, col("e"), col("ts"), col("amt"),
      asOfEpoch = 1706745600L, tiles = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"default rfmSegments must not globally sort via ntile windows:\n$plan")
  }

  test("burstiness: hand-computed gap stats and burst share") {
    import spark.implicits._
    // key a: events at t = 0, 10, 20 s (regular, same minute) → gaps
    // {10,10}: mean 10, sd 0, cv 0; all 3 events in one minute → share 1.
    // key b: t = 0, 60, 180 → gaps {60,120}: mean 90, sd ~42.43; minutes
    // 0/60/180 → peak 1/3.
    val df = Seq(("a", 0L), ("a", 10L), ("a", 20L),
                 ("b", 0L), ("b", 60L), ("b", 180L))
      .toDF("k", "sec").select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val m = Analytics.burstiness(df, col("k"), col("ts")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("n_events") == 3 && a.getAs[Long]("span_sec") == 20)
    assert(a.getAs[Double]("mean_gap_sec") == 10.0 &&
      a.getAs[Double]("sd_gap_sec") == 0.0 && a.getAs[Double]("gap_cv") == 0.0)
    assert(a.getAs[Double]("peak_minute_share") == 1.0)
    val b = m("b")
    assert(b.getAs[Double]("mean_gap_sec") == 90.0)
    assert(b.getAs[Double]("sd_gap_sec") == 42.426407, s"sd: $b")
    assert(b.getAs[Double]("peak_minute_share") == 0.333333)
  }

  test("seasonalBaseline: weekday medians explain planted weekly structure") {
    import spark.implicits._
    // 4 weeks: Mondays always 100, Tuesdays always 10 (perfect weekly
    // pattern) → per-dow residuals are all 0 → ratio 0. 2024-01-01 is a
    // Monday (Spark dow 2).
    val rows = (0 until 4).flatMap { w =>
      Seq((s"2024-01-${"%02d".format(1 + 7 * w)} 12:00:00", 100.0),
          (s"2024-01-${"%02d".format(2 + 7 * w)} 12:00:00", 10.0))
    }
    val df = rows.toDF("tss", "v")
      .select(to_timestamp(col("tss")).as("ts"), col("v"))
    val out = Analytics.seasonalBaseline(df, col("ts"), col("v")).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(2, 3), "Mondays and Tuesdays only")
    assert(out(2).getAs[Long]("n_days") == 4 &&
      out(2).getAs[Double]("med_value") == 100.0)
    assert(out(3).getAs[Double]("med_value") == 10.0)
    assert(out(2).getAs[Double]("resid_var_ratio") == 0.0,
      "a perfect weekly pattern deseasonalizes to zero residual variance")
  }

  test("lDiversity: homogeneity attack visible where k-anonymity is blind") {
    import spark.implicits._
    // group (z1): 3 rows, all sensitive 'flu' → k-anonymous at k=3 but
    // 1-diverse; group (z2): 3 rows, 3 distinct conditions.
    val df = Seq(("z1", "flu"), ("z1", "flu"), ("z1", "flu"),
                 ("z2", "flu"), ("z2", "cold"), ("z2", "cough"))
      .toDF("zip", "cond")
    val k = graft.ops.TableHealth.kAnonymity(df, Seq(col("zip")), 3).collect()(0)
    assert(k.getAs[Boolean]("k_anonymous"), "k=3 passes")
    val l = graft.ops.TableHealth.lDiversity(df, Seq(col("zip")), col("cond"), 2)
      .collect()(0)
    assert(!l.getAs[Boolean]("l_diverse"), "z1 is homogeneous")
    assert(l.getAs[Long]("min_diversity") == 1L)
    assert(l.getAs[Long]("n_weak_groups") == 1L)
    assert(l.getAs[Long]("n_weak_rows") == 3L)
  }

  test("partitionAdvisor: width rule, floor at minPartitions, ceil division") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, "cdef"), (3L, null: String)).toDF("k", "s")
    val r = graft.ops.Skew.partitionAdvisor(df, Seq("k", "s"),
      targetPartitionBytes = 10L, minPartitions = 2).collect()(0)
    // bytes: 3 longs (24) + "ab"(2) + "cdef"(4) + null(0) = 30
    assert(r.getAs[Long]("n_rows") == 3 && r.getAs[Long]("est_bytes") == 30)
    assert(r.getAs[Double]("avg_row_bytes") == 10.0)
    assert(r.getAs[Long]("recommended_partitions") == 3, "ceil(30/10)")
    assert(r.getAs[Long]("rows_per_partition") == 1)
    // tiny table: the core floor wins
    val rMin = graft.ops.Skew.partitionAdvisor(df, Seq("k"), 1000000L, 8)
      .collect()(0)
    assert(rMin.getAs[Long]("recommended_partitions") == 8)
    // unknown type → explicit error, not a silent wrong estimate
    intercept[IllegalArgumentException] {
      graft.ops.Skew.partitionAdvisor(
        Seq((Seq(1), 2)).toDF("arr", "x"), Seq("arr"), 10L, 2)
    }
  }

  test("bestSplit: finds the planted perfect threshold; tie goes to smallest") {
    import spark.implicits._
    // label = (x > 2): splitting at x <= 2 separates perfectly → gain =
    // H(2/4) = ln 2; every other threshold is impure
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("x", "y")
    val r = Analytics.bestSplit(df, col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("threshold") == 2.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("gain") == ln2, s"perfect split gain = H(1/2): $r")
    assert(r.getAs[Long]("n_left") == 2 && r.getAs[Long]("n_right") == 2)
    assert(r.getAs[Double]("pos_rate_left") == 0.0 &&
      r.getAs[Double]("pos_rate_right") == 1.0)
    // uninformative label → all gains 0, tie broken by smallest threshold
    val flat = Seq((1.0, 1), (2.0, 1), (3.0, 1)).toDF("x", "y")
    val rf = Analytics.bestSplit(flat, col("x"), col("y")).collect()(0)
    assert(rf.getAs[Double]("gain") == 0.0 &&
      rf.getAs[Double]("threshold") == 1.0)
  }

  test("interpolateSeries: linear fill between observations, edges observed") {
    import spark.implicits._
    // key k: buckets 0→10.0, 30→40.0 with step 10 → bucket 10 = 20.0,
    // bucket 20 = 30.0 (linear), endpoints pass through unchanged
    val obs = Seq(("k", 0L, 10.0), ("k", 30L, 40.0)).toDF("g", "b", "x")
    val out = Analytics.interpolateSeries(obs, col("g"), col("b"), col("x"),
        step = 10L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out == Map(0L -> ((10.0, true)), 10L -> ((20.0, false)),
      20L -> ((30.0, false)), 30L -> ((40.0, true))))
  }

  test("weightedQuantiles: mass moves the cut where plain quantiles would not") {
    import spark.implicits._
    // values 1..4; weight 97 on value 4 → weighted median = 4 while the
    // unweighted median of the same values is 2.5
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 97.0))
      .map { case (v, w) => ("k", v, w) }.toDF("g", "v", "w")
    val r = Analytics.weightedQuantiles(df, col("g"), col("v"), col("w"),
      qs = Seq(0.5, 0.9)).collect()(0)
    assert(r.getAs[Double]("wq_50") == 4.0 && r.getAs[Double]("wq_90") == 4.0)
    assert(r.getAs[Double]("total_weight") == 100.0)
    // uniform weights reduce to the "first row at/after the rank" rule
    val u = Seq(1.0, 2.0, 3.0, 4.0).map(v => ("k", v, 1.0)).toDF("g", "v", "w")
    val ru = Analytics.weightedQuantiles(u, col("g"), col("v"), col("w"),
      qs = Seq(0.5)).collect()(0)
    assert(ru.getAs[Double]("wq_50") == 2.0, "cw 2 >= 0.5·4 at value 2")
  }

  test("cappedSessionStats: gap break plus duration-cap split") {
    import spark.implicits._
    // key u: events at 0..5h hourly with gap 90m never exceeded BUT cap
    // 2h splits the single gap-session into 3 (offsets 0-1h, 2-3h, 4-5h);
    // then a 4h silence starts session 4 at t=9h.
    val secs = Seq(0L, 3600L, 7200L, 10800L, 14400L, 18000L, 32400L)
    val df = secs.map(t => ("u", t)).toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val r = Analytics.cappedSessionStats(df, col("k"), col("ts"),
      gapSec = 5400L, capSec = 7200L).collect()(0)
    assert(r.getAs[Long]("n_sessions") == 4, s"3 cap splits + 1 gap: $r")
    assert(r.getAs[Long]("n_events") == 7)
    assert(r.getAs[Long]("max_session_events") == 2)
    assert(r.getAs[Long]("max_session_sec") == 3600L)
    // without the cap the same data is 2 sessions
    val rNoCap = Analytics.cappedSessionStats(df, col("k"), col("ts"),
      gapSec = 5400L, capSec = 1000000L).collect()(0)
    assert(rNoCap.getAs[Long]("n_sessions") == 2)
  }

  test("nullPatterns: joint-null signatures with shares") {
    import spark.implicits._
    val df = Seq((Some(1), Some(1)), (None, None), (None, None), (Some(1), None))
      .toDF("a", "b")
    val m = graft.ops.Profiler.nullPatterns(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("00") == ((1L, 0.25)) && m("11") == ((2L, 0.5)) &&
      m("01") == ((1L, 0.25)) && m.size == 3)
  }

  test("intervalAudit: overlaps, gaps, degenerate, open intervals") {
    import spark.implicits._
    // id a: [0,10) [10,20) [20,null) — tiles except the OPEN interval
    // has no successor → clean. id b: [0,10) [5,8) (overlap, and 5<8 ok)
    // then [15,15) (degenerate, gap before it).
    val iv = Seq(("a", 0L, Some(10L)), ("a", 10L, Some(20L)), ("a", 20L, None),
                 ("b", 0L, Some(10L)), ("b", 5L, Some(8L)), ("b", 15L, Some(15L)))
      .toDF("id", "f", "t")
    val r = graft.ops.TableHealth.intervalAudit(iv, col("id"), col("f"), col("t"))
      .collect()(0)
    assert(r.getAs[Long]("n_intervals") == 6 && r.getAs[Long]("n_ids") == 2)
    assert(r.getAs[Long]("n_degenerate") == 1, "the [15,15) interval")
    assert(r.getAs[Long]("n_overlaps") == 1, "[0,10) then next starts at 5")
    assert(r.getAs[Long]("n_gaps") == 1, "[5,8) then next starts at 15")
    assert(!r.getAs[Boolean]("tiles_cleanly"))
    // an open interval WITH a successor is an overlap
    val open = Seq(("x", 0L, None: Option[Long]), ("x", 5L, Some(9L)))
      .toDF("id", "f", "t")
    val ro = graft.ops.TableHealth.intervalAudit(open, col("id"), col("f"), col("t"))
      .collect()(0)
    assert(ro.getAs[Long]("n_overlaps") == 1)
    // a cleanly tiling history passes
    val clean = Seq(("c", 0L, Some(5L)), ("c", 5L, None: Option[Long]))
      .toDF("id", "f", "t")
    assert(graft.ops.TableHealth.intervalAudit(clean, col("id"), col("f"), col("t"))
      .collect()(0).getAs[Boolean]("tiles_cleanly"))
  }

  test("bloomPrunedJoin: exact vs plain join, rejects right-preserving types") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val small = Seq((10L, "x"), (500L, "y"), (999L, "z"), (1500L, "w"))
      .toDF("sk", "tag")
    val pruned = graft.ops.Skew.bloomPrunedJoin(big, Seq("k"), small, Seq("sk"),
        expectedKeys = 10L)
      .select("k", "payload", "tag").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "tag").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pruned == plain && plain.size == 3,
      "no false negatives; false positives die in the join")
    intercept[IllegalArgumentException] {
      graft.ops.Skew.bloomPrunedJoin(big, Seq("k"), small, Seq("sk"), 10L,
        joinType = "left_outer")
    }
  }

  test("isotonicCalibrate: PAV pools planted violators, preserves mass, excludes null scores") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bins 0..3 of 10 rows each with rates [0.1, 0.5, 0.3, 0.7]:
    // PAV pools bins 1,2 -> (5+3)/20 = 0.4; expected [0.1, 0.4, 0.4, 0.7]
    def mk(bin: Int, pos: Int, n: Int) = (0 until n).map(i =>
      (bin / 10.0 + 0.05, if (i < pos) 1 else 0))
    val df = (mk(0, 1, 10) ++ mk(1, 5, 10) ++ mk(2, 3, 10) ++ mk(3, 7, 10))
      .toDF("s", "y")
    val r = graft.ops.Analytics
      .isotonicCalibrate(df, col("s"), col("y"), bins = 10)
      .collect().map(x => x.getInt(0) ->
        (x.getLong(1), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(0) == ((10L, 0.1, 0.1)), s"${r(0)}")
    assert(r(1)._3 == 0.4 && r(2)._3 == 0.4, s"$r")
    assert(r(3) == ((10L, 0.7, 0.7)), s"${r(3)}")
    // weighted pooling: rates [0.8 (w5), 0.2 (w15)] -> both (4+3)/20 = 0.35
    val w = (mk(0, 4, 5) ++ mk(1, 3, 15)).toDF("s", "y")
    val rw = graft.ops.Analytics
      .isotonicCalibrate(w, col("s"), col("y"), bins = 10)
      .collect().map(x => x.getInt(0) -> x.getDouble(4)).toMap
    assert(rw(0) == 0.35 && rw(1) == 0.35, s"$rw")
    // invariants on a noisier fixture: monotone + weighted mass preserved
    val noisy = (0 until 200).map(i =>
      ((i % 40) / 40.0, if ((i * 7 + i % 13) % 3 == 0) 1 else 0)).toDF("s", "y")
    val rows = graft.ops.Analytics
      .isotonicCalibrate(noisy, col("s"), col("y"), bins = 8)
      .orderBy("bin").collect()
    val pavs = rows.map(_.getDouble(4))
    assert(pavs.zip(pavs.tail).forall { case (a, b) => a <= b + 1e-12 })
    val mass = rows.map(x => x.getLong(1) * x.getDouble(4)).sum
    val pos = rows.map(x => x.getLong(1) * x.getDouble(3)).sum
    assert(math.abs(mass - pos) < 1e-9)
    // null scores are excluded, not clamped into a bin
    val withNull = df.union(Seq((Option.empty[Double], 1)).toDF("s", "y"))
    assert(graft.ops.Analytics
      .isotonicCalibrate(withNull, col("s"), col("y"), bins = 10)
      .agg(org.apache.spark.sql.functions.sum(col("n"))).head().getLong(0) == 40L)
  }

  test("aucBrierByGroup: per-slice ranks match global aucBrier; one-class slice gives NULL auc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // slice a: perfect separation -> 1.0; slice b: reversed -> 0.0;
    // slice c: all positive -> NULL auc (rank-sum undefined)
    val df = Seq(
      ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0),
      ("b", 0.9, 0), ("b", 0.1, 1),
      ("c", 0.5, 1), ("c", 0.7, 1)).toDF("g", "s", "y")
    val r = graft.ops.Analytics
      .aucBrierByGroup(df, col("g"), col("s"), col("y"))
      .collect().map(x => x.getString(0) ->
        (Option(x.get(1)).map(_.asInstanceOf[Double]),
          x.getLong(3), x.getLong(4))).toMap
    assert(r("a") == ((Some(1.0), 2L, 2L)), s"${r("a")}")
    assert(r("b") == ((Some(0.0), 1L, 1L)), s"${r("b")}")
    assert(r("c") == ((None, 2L, 0L)), s"${r("c")}")
    // tie-averaging: ties across classes count half, matching aucBrier
    val ties = Seq(("t", 0.5, 1), ("t", 0.5, 0), ("t", 0.9, 1), ("t", 0.1, 0))
      .toDF("g", "s", "y")
    val grouped = graft.ops.Analytics
      .aucBrierByGroup(ties, col("g"), col("s"), col("y")).head()
    val global = graft.ops.Analytics
      .aucBrier(ties, col("s"), col("y")).head()
    assert(grouped.getDouble(1) == global.getDouble(0) &&
      grouped.getDouble(1) == 0.875, s"$grouped vs $global")
  }

  test("passAtK: hand-computed combinatorics, saturation, zero-correct, n<k exclusion") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // task A: n=4, c=2 -> pass@1 = 1/2, pass@2 = 1 - C(2,2)/C(4,2) = 5/6,
    // pass@3 = 1 (n-c < k); task B: n=4, c=0 -> 0 at every k
    val df = Seq(("A", 1), ("A", 1), ("A", 0), ("A", 0),
      ("B", 0), ("B", 0), ("B", 0), ("B", 0)).toDF("t", "ok")
    val r = graft.ops.Analytics
      .passAtK(df, col("t"), col("ok"), Seq(1, 2, 3, 5))
      .collect().map(x => x.getInt(0) -> (x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(r(1) == ((2L, Some(0.25))), s"${r(1)}")            // avg(0.5, 0)
    assert(r(2)._1 == 2L &&
      math.abs(r(2)._2.get - 5.0 / 12) < 1e-6, s"${r(2)}")
    assert(r(3) == ((2L, Some(0.5))), s"${r(3)}")             // avg(1, 0)
    // k = 5 > n = 4: no task can support it -> zero tasks, NULL mean
    assert(r(5) == ((0L, None)), s"${r(5)}")
    // pass@n equals the exhaustive truth: any correct sample -> 1
    val all = graft.ops.Analytics.passAtK(df, col("t"), col("ok"), Seq(4))
      .head()
    assert(all.getDouble(2) == 0.5, s"$all")
  }

  test("parityGaps: hand-computed spreads; one-class slices excluded from that spread") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // g1: sel 0.5, tpr 1.0, fpr 0.0; g2: sel 0.25, tpr 0.0, fpr ~0.333
    val df = Seq(
      ("g1", 1, 1), ("g1", 1, 1), ("g1", 0, 0), ("g1", 0, 0),
      ("g2", 1, 0), ("g2", 0, 1), ("g2", 0, 0), ("g2", 0, 0))
      .toDF("g", "y", "p")
    val r = graft.ops.Analytics
      .parityGaps(df, col("g"), col("y"), col("p")).head()
    assert(r.getLong(0) == 2L && r.getDouble(1) == 0.25, s"$r")
    assert(r.getDouble(2) == 1.0 &&
      math.abs(r.getDouble(3) - 1.0 / 3) < 1e-6, s"$r")
    // a slice with only positives has no FPR: it must not zero-fill
    // the fpr spread (gap stays 0 across the remaining slice alone)
    val onec = Seq(("a", 1, 1), ("a", 1, 0), ("b", 1, 1), ("b", 0, 1))
      .toDF("g", "y", "p")
    val ro = graft.ops.Analytics
      .parityGaps(onec, col("g"), col("y"), col("p")).head()
    assert(ro.getDouble(3) == 0.0, s"fpr spread over slice b only: $ro")
  }

  test("budgetSelect: greedy prefix by score, tie-broken by key, exact integer cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.7, 10L))
      .toDF("id", "s", "tok")
    val sel = graft.ops.DataPrep
      .budgetSelect(df, col("id"), col("s"), col("tok"), budget = 25L)
      .select(col("id"), col("cum_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel == Map(1L -> 10L, 2L -> 20L), s"$sel")
    // exact boundary: a row landing exactly on the budget is KEPT
    val exact = graft.ops.DataPrep
      .budgetSelect(df, col("id"), col("s"), col("tok"), budget = 30L)
    assert(exact.count() == 3L)
    // ties in score resolve by key ascending
    val ties = Seq((2L, 0.5, 10L), (1L, 0.5, 10L)).toDF("id", "s", "tok")
    val tsel = graft.ops.DataPrep
      .budgetSelect(ties, col("id"), col("s"), col("tok"), budget = 15L)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(tsel == Seq(1L), s"$tsel")
    // null score/token rows are dropped, not budget-poisoning
    val withNull = Seq((1L, Option(0.9), Option(10L)),
      (2L, Option.empty[Double], Option(10L)),
      (3L, Option(0.8), Option.empty[Long])).toDF("id", "s", "tok")
    assert(graft.ops.DataPrep
      .budgetSelect(withNull, col("id"), col("s"), col("tok"), 100L)
      .count() == 1L)
  }

  test("logRankTest: hand-computed hypergeometric terms; censoring leaves risk set without a death") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A: events at 1, 2; B: events at 2, 3.
    // t=1: E=1*2/4=.5, V=.25; t=2: rA=1 rB=2, dA=1 d=2, E=2/3, V=2/9;
    // t=3: nt=1 -> excluded. obs=2, exp=7/6, var=17/36.
    val df = Seq((1.0, true, true), (2.0, true, true),
      (2.0, true, false), (3.0, true, false)).toDF("t", "e", "a")
    val r = graft.ops.Analytics
      .logRankTest(df, col("t"), col("e"), col("a")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"$r")
    assert(math.abs(r.getDouble(2) - 7.0 / 6) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(3) - 17.0 / 36) < 1e-6, s"$r")
    val z = (2 - 7.0 / 6) / math.sqrt(17.0 / 36)
    assert(math.abs(r.getDouble(4) - z) < 1e-5 &&
      math.abs(r.getDouble(5) - z * z) < 1e-5, s"$r")
    // a censored subject leaves the risk set but is NOT a death:
    // t=2 has d=1 (B's event), dA=0, rA=1 -> E=1/3 not 2/3
    val cz = Seq((1.0, true, true), (2.0, false, true),
      (2.0, true, false), (3.0, true, false)).toDF("t", "e", "a")
    val rc = graft.ops.Analytics
      .logRankTest(cz, col("t"), col("e"), col("a")).head()
    assert(rc.getLong(1) == 1, s"$rc")
    assert(math.abs(rc.getDouble(2) - (0.5 + 1.0 / 3)) < 1e-6, s"$rc")
    // identical arms: zero variance of the difference only when no
    // mixed-risk death times exist; here z is defined and |z| small
    val same = Seq((1.0, true, true), (1.0, true, false),
      (2.0, true, true), (2.0, true, false)).toDF("t", "e", "a")
    val rs = graft.ops.Analytics
      .logRankTest(same, col("t"), col("e"), col("a")).head()
    assert(math.abs(rs.getDouble(4)) < 1e-9, s"symmetric arms -> z=0: $rs")
  }

  test("mixSchedule: endpoint fidelity, exact per-step budgets, cosine midpoint") {
    import spark.implicits._
    val w = Seq(("a", 0.8, 0.2), ("b", 0.2, 0.8)).toDF("source", "w_start", "w_end")
    val r = graft.ops.DataPrep.mixSchedule(w, steps = 3, stepBudget = 100L)
      .collect().map(x => (x.getInt(0), x.getString(1)) ->
        (x.getDouble(2), x.getLong(3))).toMap
    // endpoints reproduce the inputs; midpoint is the 50/50 mix
    assert(r((0, "a")) == ((0.8, 80L)) && r((2, "a")) == ((0.2, 20L)), s"$r")
    assert(r((1, "a")) == ((0.5, 50L)) && r((1, "b")) == ((0.5, 50L)), s"$r")
    // every step's tokens sum exactly to the budget, unnormalized input
    val odd = Seq(("a", 3.0, 1.0), ("b", 1.0, 1.0), ("c", 2.0, 1.0))
      .toDF("source", "w_start", "w_end")
    val sums = graft.ops.DataPrep.mixSchedule(odd, steps = 4, stepBudget = 997L)
      .groupBy("step").agg(org.apache.spark.sql.functions.sum("tokens").as("t"))
      .collect().map(_.getLong(1)).toSeq
    assert(sums == Seq.fill(4)(997L), s"$sums")
    // half-cosine: midpoint of an odd step count is still the mean mix
    val cosMid = graft.ops.DataPrep
      .mixSchedule(w, steps = 3, stepBudget = 100L, cosine = true)
      .where(org.apache.spark.sql.functions.col("step") === 1)
      .collect().map(x => x.getString(1) -> x.getDouble(2)).toMap
    assert(cosMid == Map("a" -> 0.5, "b" -> 0.5), s"$cosMid")
  }

  test("sprt: first-crossing decisions on planted walks; continue when the walk stays inside") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // p0 = .25 vs p1 = .75 -> per-step LLR = ±ln 3 ≈ ±1.0986;
    // alpha = beta = .05 -> thresholds ±ln 19 ≈ ±2.944: 3 same-sign
    // steps decide
    def run(rows: Seq[(String, Int, Boolean)]) = graft.ops.Analytics
      .sprt(rows.toDF("k", "i", "y"), col("k"), Seq(col("i")), col("y"),
        p0 = 0.25, p1 = 0.75, alpha = 0.05, beta = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getString(3), Option(r.get(4)).map(_.asInstanceOf[Int]))).toMap
    val ups = (1 to 5).map(i => ("up", i, true))
    val downs = (1 to 5).map(i => ("dn", i, false))
    val mix = (1 to 8).map(i => ("mx", i, i % 2 == 1))
    val r = run(ups ++ downs ++ mix)
    assert(r("up") == (("accept_h1", Some(3))), s"${r("up")}")
    assert(r("dn") == (("accept_h0", Some(3))), s"${r("dn")}")
    assert(r("mx") == (("continue", None)), s"${r("mx")}")
    // late reversal cannot undo the FIRST crossing
    val rev = (1 to 4).map(i => ("rv", i, true)) ++
      (5 to 20).map(i => ("rv", i, false))
    assert(run(rev)("rv")._1 == "accept_h1")
  }

  test("olsRobustSe: straight-line closed-form sandwich on a planted heteroscedastic fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((0.0, 1.1), (1.0, 2.8), (2.0, 5.9), (3.0, 6.2), (4.0, 9.7))
    val (n0, sx, sxx, sy, sxy) = (pts.size.toDouble, pts.map(_._1).sum,
      pts.map(p => p._1 * p._1).sum, pts.map(_._2).sum,
      pts.map(p => p._1 * p._2).sum)
    val det = n0 * sxx - sx * sx
    val (wb, wx) = ((sy * sxx - sx * sxy) / det, (n0 * sxy - sx * sy) / det)
    val es = pts.map { case (x, y) => (x, y - wb - wx * x) }
    val (e0, e1, e2) = (es.map(e => e._2 * e._2).sum,
      es.map(e => e._2 * e._2 * e._1).sum,
      es.map(e => e._2 * e._2 * e._1 * e._1).sum)
    val s00 = (sxx * sxx * e0 - 2 * sxx * sx * e1 + sx * sx * e2) / (det * det)
    val s11 = (sx * sx * e0 - 2 * n0 * sx * e1 + n0 * n0 * e2) / (det * det)
    val r = graft.ops.Analytics
      .olsRobustSe(pts.toDF("x", "y"), Seq(col("x")), col("y"))
      .orderBy("term").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("b", "x1"))
    assert(math.abs(r(0).getDouble(1) - wb) < 1e-6 &&
      math.abs(r(1).getDouble(1) - wx) < 1e-6, s"${r.toSeq}")
    assert(math.abs(r(0).getDouble(2) - math.sqrt(s00)) < 1e-6, s"${r.toSeq}")
    assert(math.abs(r(1).getDouble(2) - math.sqrt(s11)) < 1e-6, s"${r.toSeq}")
    // t = coef/se (rounded views of the same internals)
    assert(math.abs(r(1).getDouble(3) - wx / math.sqrt(s11)) < 1e-5)
  }

  test("ridgeRegression: exact fit at lambda 0, shrinkage vs straight-line solve, constant-target NULL R2") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // perfect line y = 1 + 2x: OLS recovers it exactly, R2 = 1
    val line = Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0)).toDF("x", "y")
    val ols = graft.ops.Analytics
      .ridgeRegression(line, Seq(col("x")), col("y"), lambda = 0.0).head()
    assert(math.abs(ols.getDouble(0) - 1.0) < 1e-9 &&
      math.abs(ols.getDouble(1) - 2.0) < 1e-9, s"$ols")
    assert(ols.getDouble(2) == 1.0 && ols.getLong(3) == 3L, s"$ols")
    // ridge shrinkage against a straight-line 2x2 normal-equation solve:
    // A = [[n, Sx], [Sx, Sxx + l]], b = [Sy, Sxy]
    val pts = Seq((0.0, 1.2), (1.0, 2.9), (2.0, 5.3), (3.0, 6.8))
    val l = 2.0
    val (n0, sx, sxx, sy, sxy) = (pts.size.toDouble, pts.map(_._1).sum,
      pts.map(p => p._1 * p._1).sum, pts.map(_._2).sum,
      pts.map(p => p._1 * p._2).sum)
    val det = n0 * (sxx + l) - sx * sx
    val (eb, ew) = ((sy * (sxx + l) - sx * sxy) / det,
      (n0 * sxy - sx * sy) / det)
    val ridge = graft.ops.Analytics
      .ridgeRegression(pts.toDF("x", "y"), Seq(col("x")), col("y"),
        lambda = l).head()
    assert(math.abs(ridge.getDouble(0) - eb) < 1e-6 &&
      math.abs(ridge.getDouble(1) - ew) < 1e-6, s"$ridge vs ($eb, $ew)")
    assert(math.abs(ridge.getDouble(1)) < 2.0, "ridge shrinks the slope")
    // constant target: SST = 0 -> R2 NULL, not a divide error
    val flat = Seq((0.0, 4.0), (1.0, 4.0)).toDF("x", "y")
    assert(graft.ops.Analytics
      .ridgeRegression(flat, Seq(col("x")), col("y"), lambda = 1.0)
      .head().isNullAt(2))
  }

  test("targetEncode: out-of-fold means verified row by row; prior fallbacks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "a", 1), (2L, "a", 0), (3L, "a", 1), (4L, "a", 1),
      (5L, "b", 0), (6L, "b", 0), (7L, "b", 1), (8L, "c", 1))
    val df = rows.toDF("k", "c", "y")
    val m = 2.0
    val got = graft.ops.DataPrep
      .targetEncode(df, col("k"), col("c"), col("y"), folds = 2, smoothing = m)
      .select(col("k"), col("c"), col("fold"), col("te"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getDouble(3))).toMap
    // straight-line recomputation from the folds the engine assigned
    val prior = rows.map(_._3).sum.toDouble / rows.size
    got.foreach { case (k, (c, fold, te)) =>
      val cat = rows.filter(_._2 == c)
      val oof = cat.filter(r => got(r._1)._2 != fold)
      val expected = (oof.map(_._3).sum + m * prior) / (oof.size + m)
      assert(math.abs(te - expected) < 1e-12,
        s"k=$k cat=$c fold=$fold: $te vs $expected")
    }
    // single-row category entirely inside one fold: own fold sees prior
    val c8 = got(8L)
    assert(math.abs(c8._3 - prior) < 1e-12, s"lone category -> prior: $c8")
    // NULL category rows fall back to the prior, not a dropped join
    val withNull = df.union(Seq((9L, Option.empty[String], 1)).toDF("k", "c", "y"))
    val nulls = graft.ops.DataPrep
      .targetEncode(withNull, col("k"), col("c"), col("y"), folds = 2,
        smoothing = m)
      .where(col("c").isNull).select(col("te")).collect()
    val prior2 = (rows.map(_._3).sum + 1).toDouble / (rows.size + 1)
    assert(nulls.length == 1 && math.abs(nulls(0).getDouble(0) - prior2) < 1e-12)
  }

  test("logisticRegressionGD: hand-computed first step, separable convergence, null-row drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one step from w = 0: sigma(0) = 0.5 -> g_b = avg(0.5 - y) = 0,
    // g_1 = avg((0.5 - y) x) = -0.5 -> w = (0, 0.5)
    val sep = Seq((1.0, 1), (-1.0, 0)).toDF("x", "y")
    val one = graft.ops.Analytics
      .logisticRegressionGD(sep, Seq(col("x")), col("y"), iters = 1).head()
    assert(one.getDouble(0) == 0.0 && one.getDouble(1) == 0.5, s"$one")
    // separable data: more iterations drive loss down, accuracy to 1
    val r8 = graft.ops.Analytics
      .logisticRegressionGD(sep, Seq(col("x")), col("y"), iters = 8).head()
    val r40 = graft.ops.Analytics
      .logisticRegressionGD(sep, Seq(col("x")), col("y"), iters = 40).head()
    assert(r8.getDouble(3) == 1.0 && r40.getDouble(3) == 1.0,
      s"separable -> perfect accuracy: $r8 / $r40")
    assert(r40.getDouble(2) < r8.getDouble(2),
      s"loss must keep falling: ${r8.getDouble(2)} -> ${r40.getDouble(2)}")
    // rows with NULL label/feature are dropped, not gradient-poisoning
    val withNull = Seq((Option(1.0), Option(1)), (Option(-1.0), Option(0)),
      (None, Option(1)), (Option(2.0), None)).toDF("x", "y")
    val rn = graft.ops.Analytics
      .logisticRegressionGD(withNull, Seq(col("x")), col("y"), iters = 1).head()
    assert(rn.getLong(4) == 2L && rn.getDouble(1) == 0.5, s"$rn")
  }

  test("neymanAllocation: size-x-stddev weights, largest-remainder integerization, degenerate strata") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A spread (sd ~7.07, n 2), B constant (sd 0), C singleton (sd NULL -> 0):
    // all weight lands on A
    val df = Seq(("A", 0.0), ("A", 10.0), ("B", 5.0), ("B", 5.0), ("C", 3.0))
      .toDF("g", "v")
    val r = graft.ops.DataPrep
      .neymanAllocation(df, col("g"), col("v"), 10L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(3), x.getLong(4))).toMap
    assert(r("A") == ((2L, 1.0, 10L)) && r("B") == ((2L, 0.0, 0L)), s"$r")
    assert(r("C") == ((1L, 0.0, 0L)), s"$r")
    // largest remainder: raw A = 5.833, B = 1.167 at n = 7 -> 6 + 1 = 7
    val mixed = Seq(("A", 0.0), ("A", 10.0), ("B", 0.0), ("B", 2.0))
      .toDF("g", "v")
    val m = graft.ops.DataPrep
      .neymanAllocation(mixed, col("g"), col("v"), 7L)
      .collect().map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(m == Map("A" -> 6L, "B" -> 1L), s"$m")
    // every stratum constant -> no variance signal -> NULL allocs
    val flat = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    assert(graft.ops.DataPrep
      .neymanAllocation(flat, col("g"), col("v"), 5L)
      .collect().forall(_.isNullAt(4)))
  }

  test("conformalThresholds: order statistics, over-n alphas NULL, ties by value") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 10).map(_.toDouble).toDF("s")
    val r = graft.ops.Analytics
      .conformalThresholds(df, col("s"), Seq(0.3, 0.5, 0.05))
      .collect().map(x => x.getDouble(0) ->
        (x.getLong(1), Option(x.get(3)).map(_.asInstanceOf[Double]))).toMap
    // k = ceil(11 * 0.7) = 8 -> 8.0; k = ceil(11 * 0.5) = 6 -> 6.0
    assert(r(0.3) == ((8L, Some(8.0))), s"${r(0.3)}")
    assert(r(0.5) == ((6L, Some(6.0))), s"${r(0.5)}")
    // ceil(11 * 0.95) = 11 > n = 10 -> threshold NULL
    assert(r(0.05) == ((11L, None)), s"${r(0.05)}")
    // duplicated values: the k-th order statistic is by VALUE
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("s")
    val r2 = graft.ops.Analytics
      .conformalThresholds(dup, col("s"), Seq(0.4))
      .head() // k = ceil(6 * 0.6) = 4 -> sorted(1,2,2,2,9)(4) = 2
    assert(r2.getLong(1) == 4L && r2.getDouble(3) == 2.0, s"$r2")
  }

  test("bestSplit buckets flag: bucketed == exact when the cut is a bucket max") {
    import spark.implicits._
    // x = 1..100, label = x > 60: the exact best threshold (60) is the
    // max of bucket 5 under 10 equi-width buckets, so bucketed == exact
    val df = (1 to 100).map(i => (i.toDouble, if (i > 60) 1 else 0)).toDF("x", "y")
    val exact = Analytics.bestSplit(df, col("x"), col("y")).head()
    val b10 = Analytics.bestSplit(df, col("x"), col("y"), buckets = 10).head()
    assert(b10 == exact, s"bucketed $b10 vs exact $exact")
    // more buckets than distinct values degenerates to exact
    val fine = Analytics.bestSplit(df, col("x"), col("y"), buckets = 1000).head()
    assert(fine == exact, s"fine-bucketed $fine vs exact $exact")
  }

  test("kaplanMeier buckets flag: fine buckets == exact; coarse matches hand-computed") {
    import spark.implicits._
    val d = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true), (5.0, false))
      .toDF("t", "e")
    val exact = Analytics.kaplanMeier(d, col("t"), col("e")).collect().toSet
    val fine = Analytics.kaplanMeier(d, col("t"), col("e"), buckets = 100)
      .collect().toSet
    assert(fine == exact, s"fine buckets must reproduce exact: $fine vs $exact")
    // buckets = 2 over [1,5]: bin [1,3) → t=2 (n=2, both events),
    // bin [3,5] → t=5 (n=3, one event):
    //   S(2) = 1 − 2/5 = 0.6;  S(5) = 0.6 · (1 − 1/3) = 0.4
    val coarse = Analytics.kaplanMeier(d, col("t"), col("e"), buckets = 2)
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(coarse == Map(2.0 -> 0.6, 5.0 -> 0.4), s"coarse KM: $coarse")
  }

  test("anovaF: textbook two-group F, eta squared, degenerate NULLs") {
    import spark.implicits._
    // A = (1,2,3), B = (4,5,6): SSB = 13.5, SSW = 4, df = (1,4) -> F = 13.5
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6))
      .toDF("g", "v")
    val r = Analytics.anovaF(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("f") == 13.5, s"$r")
    assert(r.getAs[Long]("df1") == 1 && r.getAs[Long]("df2") == 4)
    assert(r.getAs[Double]("eta_sq") == 0.771429, s"$r")
    // df2 = 4 < 20*df1: the chi2 limit over-rejects here, so the
    // verdict is NULL by contract (not a wrong boolean)
    assert(r.isNullAt(r.fieldIndex("reject_05")), s"$r")
    // one group -> NULL F; zero within-variance -> NULL F
    assert(Analytics.anovaF(df.where(col("g") === "A"), col("v"), col("g"))
      .head().isNullAt(2))
    val flat = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2)).toDF("g", "v")
    assert(Analytics.anovaF(flat, col("v"), col("g")).head().isNullAt(2))
  }

  test("kruskalWallis: no-tie and tied fixtures against hand-computed H") {
    import spark.implicits._
    // A = (1,2,3), B = (4,5,6): rank sums 6/15 -> H = 27/7 = 3.857143
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6))
      .toDF("g", "v")
    val r = Analytics.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("h") == 3.857143, s"$r")
    assert(r.getAs[Long]("df") == 1)
    val crit = 3.841458820694124 // exact chi2_0.95(1): small-df table arm
    assert(math.abs(r.getAs[Double]("crit_05") - crit) < 1e-6)
    assert(r.getAs[Boolean]("reject_05") == (3.857143 > crit))
    // ties: A = (1,1,2), B = (2,3,3): avg ranks 1.5/3.5/5.5,
    // H = 3.047619, tie factor 1 - 18/210 -> corrected 10/3
    val tied = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3), ("B", 3))
      .toDF("g", "v")
    val rt = Analytics.kruskalWallis(tied, col("v"), col("g")).head()
    assert(rt.getAs[Double]("h") == 3.333333, s"$rt")
    // all values identical -> tie correction 0 -> NULL H
    val const = Seq(("A", 7), ("B", 7)).toDF("g", "v")
    assert(Analytics.kruskalWallis(const, col("v"), col("g")).head().isNullAt(2))
  }

  test("kruskalWallis at k=2 equals mannWhitneyU z squared (independent implementations)") {
    import spark.implicits._
    // classical identity: the tie-corrected H statistic with two groups
    // IS the tie-corrected rank-sum z squared — a differential check
    // between two operators that share no code path
    val rng = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      (if (rng.nextBoolean()) "A" else "B", rng.nextInt(12).toDouble)
    }
    val df = rows.toDF("g", "v")
    val h = Analytics.kruskalWallis(df, col("v"), col("g"))
      .head().getAs[Double]("h")
    val z = Analytics.mannWhitneyU(df, col("v"), col("g") === "A")
      .head().getAs[Double]("z")
    // rounding on each side is 6 dp, so match at 1e-5
    assert(math.abs(h - z * z) < 1e-5, s"H=$h z^2=${z * z}")
  }

  test("brownForsythe == anovaF on hand-centered |x - median_g|; approx path same shape") {
    import spark.implicits._
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("g", "v")
    // medians: A -> 2.5, B -> 5 (interpolated); center by hand
    val z = Seq(("A", 1.5), ("A", 0.5), ("A", 0.5), ("A", 7.5),
      ("B", 1.0), ("B", 0.0), ("B", 1.0)).toDF("g", "z")
    val expect = Analytics.anovaF(z, col("z"), col("g")).head()
    val got = Analytics.brownForsythe(df, col("v"), col("g"), exact = true).head()
    assert(got == expect, s"$got vs $expect")
    // scale default (approx medians): the GK sketch returns a data
    // ELEMENT (A -> 2, not the interpolated 2.5), so the expectation is
    // anovaF over element-median-centered deviations
    val z2 = Seq(("A", 1.0), ("A", 0.0), ("A", 1.0), ("A", 8.0),
      ("B", 1.0), ("B", 0.0), ("B", 1.0)).toDF("g", "z")
    val expect2 = Analytics.anovaF(z2, col("z"), col("g")).head()
    val ap = Analytics.brownForsythe(df, col("v"), col("g")).head()
    assert(ap == expect2, s"approx $ap vs $expect2")
  }

  test("nelsonAalen: textbook hazard sums; fine buckets == exact") {
    import spark.implicits._
    val d = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true), (5.0, false))
      .toDF("t", "e")
    val na = Analytics.nelsonAalen(d, col("t"), col("e"))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    // H = 1/5, +1/4, +1/2; var = 1/25, +1/16, +1/4
    assert(na == Map(1.0 -> ((5L, 0.2, 0.04)), 2.0 -> ((4L, 0.45, 0.1025)),
      4.0 -> ((2L, 0.95, 0.3525))), s"textbook NA: $na")
    val fine = Analytics.nelsonAalen(d, col("t"), col("e"), buckets = 100)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(fine == na, s"fine buckets must reproduce exact: $fine")
  }

  test("trainer guards fail loudly: empty GD input, collinear OLS, degenerate PCA") {
    import spark.implicits._
    // logisticRegressionGD: zero rows survive the null filter
    val allNull = Seq((null.asInstanceOf[java.lang.Double], 1.0)).toDF("x", "y")
    val eGd = intercept[IllegalArgumentException] {
      Analytics.logisticRegressionGD(allNull, Seq(col("x")), col("y"))
    }
    assert(eGd.getMessage.contains("at least one row"), eGd.getMessage)
    // olsRobustSe: perfectly collinear features → singular X'X, not NaN
    val colin = (1 to 8).map(i => (i.toDouble, 2.0 * i, i + 0.5)).toDF("x1", "x2", "y")
    val eOls = intercept[IllegalArgumentException] {
      Analytics.olsRobustSe(colin, Seq(col("x1"), col("x2")), col("y"))
    }
    assert(eOls.getMessage.contains("singular"), eOls.getMessage)
    // ridgeRegression at lambda = 0 with a constant feature (duplicates
    // the intercept) hits the same shared pivot guard
    val const = (1 to 8).map(i => (3.0, i.toDouble)).toDF("x", "y")
    val eRidge = intercept[IllegalArgumentException] {
      Analytics.ridgeRegression(const, Seq(col("x")), col("y"), lambda = 0.0)
    }
    assert(eRidge.getMessage.contains("singular"), eRidge.getMessage)
    // PCA: empty corpus and n = 1 both fail loudly instead of NPE/NaN
    val empty = Seq.empty[Seq[Double]].toDF("v")
    val ePca = intercept[IllegalArgumentException] {
      graft.functions.Pca.covarianceMatrix(empty, "v", 2)
    }
    assert(ePca.getMessage.contains("no valid"), ePca.getMessage)
    val one = Seq(Seq(1.0, 2.0)).toDF("v")
    val ePca1 = intercept[IllegalArgumentException] {
      graft.functions.Pca.covarianceMatrix(one, "v", 2)
    }
    assert(ePca1.getMessage.contains("at least 2"), ePca1.getMessage)
  }

  test("jarqueBera: symmetric moments hand-computed; constant NULL; skewed rejects") {
    import spark.implicits._
    // {1..5}: m2 = 2, m3 = 0 (symmetric), m4 = 6.8
    // skew = 0, ex kurt = 6.8/4 - 3 = -1.3, JB = 5/6 * (0 + 1.69/4)
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val r = Analytics.jarqueBera(df, col("v")).head()
    assert(r.getLong(0) == 5, s"$r")
    assert(r.getDouble(1) == 0.0, s"$r")
    assert(math.abs(r.getDouble(2) - (-1.3)) < 1e-9, s"$r")
    assert(math.abs(r.getDouble(3) - 5.0 / 6.0 * (1.69 / 4.0)) < 1e-6, s"$r")
    assert(r.isNullAt(4), s"n < 20 must gate the verdict: $r")
    // constant column: zero variance -> all statistics NULL
    val const = Seq.fill(25)(7.0).toDF("v")
    val rc = Analytics.jarqueBera(const, col("v")).head()
    assert(rc.isNullAt(1) && rc.isNullAt(2) && rc.isNullAt(3) && rc.isNullAt(4))
    // 19 zeros + one 10 at n = 20: heavy right skew, verdict fires
    val skewed = (Seq.fill(19)(0.0) :+ 10.0).toDF("v")
    val rs = Analytics.jarqueBera(skewed, col("v")).head()
    assert(rs.getDouble(1) > 4.0 && rs.getDouble(2) > 14.0, s"$rs")
    assert(rs.getBoolean(4), s"$rs")
  }

  test("spiegelhalterZ: hand-computed z; zero-variance NULL; miscalibrated rejects") {
    import spark.implicits._
    // (p=.25,y=0),(p=.25,y=1): num = .25, var = 2*(.5^2*.25*.75) = .09375
    val df = Seq((0.25, 0.0), (0.25, 1.0)).toDF("p", "y")
    val r = Analytics.spiegelhalterZ(df, col("p"), col("y")).head()
    assert(r.getLong(0) == 2, s"$r")
    assert(math.abs(r.getDouble(1) - 0.25 / math.sqrt(0.09375)) < 1e-6, s"$r")
    assert(r.isNullAt(2), s"n < 20 must gate the verdict: $r")
    // p = 0.5 everywhere: (1-2p) = 0 -> zero variance -> NULL z
    val half = Seq.fill(30)((0.5, 1.0)).toDF("p", "y")
    val rh = Analytics.spiegelhalterZ(half, col("p"), col("y")).head()
    assert(rh.isNullAt(1) && rh.isNullAt(2), s"$rh")
    // 25 rows scored 0.1 but all positive: z = 18/1.2 = 15 -> reject
    val bad = Seq.fill(25)((0.1, 1.0)).toDF("p", "y")
    val rb = Analytics.spiegelhalterZ(bad, col("p"), col("y")).head()
    assert(math.abs(rb.getDouble(1) - 15.0) < 1e-9, s"$rb")
    assert(rb.getBoolean(2), s"$rb")
  }

  test("hosmerLemeshow: hand-computed HL; degenerate bins skipped; df gate") {
    import spark.implicits._
    // bin 2: O=1 E=1 (term 0); bin 5: O=2 E=2.2; bin 8: O=3 E=3.4;
    // bin 0: pbar = 0 -> skipped. HL = .04/.99 + .16/.51 = 0.354130
    val rows = Seq.fill(1)((0.25, 1.0)) ++ Seq.fill(3)((0.25, 0.0)) ++
      Seq.fill(2)((0.55, 1.0)) ++ Seq.fill(2)((0.55, 0.0)) ++
      Seq.fill(3)((0.85, 1.0)) ++ Seq.fill(1)((0.85, 0.0)) ++
      Seq.fill(2)((0.0, 0.0))
    val r = Analytics.hosmerLemeshow(rows.toDF("p", "y"), col("p"), col("y"))
      .head()
    assert(r.getLong(0) == 14 && r.getLong(1) == 3 && r.getLong(2) == 1, s"$r")
    assert(math.abs(r.getDouble(3) -
      (0.04 / 0.99 + 0.16 / 0.51)) < 1e-5, s"$r")
    assert(r.getLong(4) == 1 && !r.getBoolean(5), s"$r")
    // only two live bins: df < 1 -> df and verdict NULL
    val two = (Seq.fill(4)((0.25, 1.0)) ++ Seq.fill(4)((0.25, 0.0)) ++
      Seq.fill(4)((0.55, 1.0)) ++ Seq.fill(4)((0.55, 0.0))).toDF("p", "y")
    val rt = Analytics.hosmerLemeshow(two, col("p"), col("y")).head()
    assert(rt.getLong(1) == 2 && rt.isNullAt(4) && rt.isNullAt(5), s"$rt")
    // perfectly calibrated bins (O_k = E_k exactly): HL = 0, no reject
    val cal = (Seq.fill(1)((0.25, 1.0)) ++ Seq.fill(3)((0.25, 0.0)) ++
      Seq.fill(2)((0.5, 1.0)) ++ Seq.fill(2)((0.5, 0.0)) ++
      Seq.fill(3)((0.75, 1.0)) ++ Seq.fill(1)((0.75, 0.0))).toDF("p", "y")
    val rcAll = Analytics.hosmerLemeshow(cal, col("p"), col("y")).head()
    assert(rcAll.getDouble(3) == 0.0 && !rcAll.getBoolean(5), s"$rcAll")
  }

  test("mannKendallByKey: S/var hand-computed; ties zero variance; trend rejects") {
    import spark.implicits._
    // strictly increasing, n=5: S = 10, Var = 5*4*15/18, z = 9/sqrt(50/3)
    val up = (1 to 5).map(i => ("a", i, i)).toDF("k", "t", "v")
    val r = Analytics.mannKendallByKey(up, col("k"), col("t"), col("v")).head()
    assert(r.getString(0) == "a" && r.getLong(1) == 5, s"$r")
    assert(r.getDouble(2) == 10.0, s"$r")
    assert(math.abs(r.getDouble(3) - 300.0 / 18.0) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - 9.0 / math.sqrt(50.0 / 3.0)) < 1e-6, s"$r")
    assert(r.isNullAt(5), s"n < 10 must gate the verdict: $r")
    // all values tied: S = 0, tie term swallows the variance -> NULL z
    val flat = (1 to 6).map(i => ("a", i, 7)).toDF("k", "t", "v")
    val rf = Analytics.mannKendallByKey(flat, col("k"), col("t"), col("v"))
      .head()
    assert(rf.getDouble(2) == 0.0 && rf.getDouble(3) == 0.0, s"$rf")
    assert(rf.isNullAt(4) && rf.isNullAt(5), s"$rf")
    // strictly decreasing, n=10: S = -45, Var = 10*9*25/18 = 125 -> reject
    val down = (1 to 10).map(i => ("a", i, 11 - i)).toDF("k", "t", "v")
    val rd = Analytics.mannKendallByKey(down, col("k"), col("t"), col("v"))
      .head()
    assert(rd.getDouble(2) == -45.0 && rd.getDouble(3) == 125.0, s"$rd")
    assert(math.abs(rd.getDouble(4) - (-44.0 / math.sqrt(125.0))) < 1e-6, s"$rd")
    assert(rd.getBoolean(5), s"$rd")
  }

  test("rmst: censored trapezoid hand-computed; pre-event tau; absorbing zero") {
    import spark.implicits._
    // events at 2 and 4, one censored at 5; tau=6:
    // 2*1 + 2*(2/3) + 2*(1/3) = 4.0
    val d = Seq((2.0, true), (4.0, true), (5.0, false)).toDF("t", "e")
    val r = Analytics.rmst(d, col("t"), col("e"), tau = 6.0).head()
    assert(r.getLong(0) == 2 && r.getDouble(1) == 6.0, s"$r")
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-6, s"$r")
    // tau before the first event: survival is 1 throughout -> RMST = tau
    val re = Analytics.rmst(d, col("t"), col("e"), tau = 1.5).head()
    assert(re.getLong(0) == 0 && re.getDouble(2) == 1.5, s"$re")
    // everyone dies at t=1: area = 1*1 + (5-1)*0 = 1
    val dead = Seq((1.0, true), (1.0, true)).toDF("t", "e")
    val rz = Analytics.rmst(dead, col("t"), col("e"), tau = 5.0).head()
    assert(math.abs(rz.getDouble(2) - 1.0) < 1e-9, s"$rz")
    // event exactly at tau contributes no tail: 2*1 + 2*0.5 = 3
    val at = Seq((2.0, true), (4.0, true)).toDF("t", "e")
    val ra = Analytics.rmst(at, col("t"), col("e"), tau = 4.0).head()
    assert(math.abs(ra.getDouble(2) - 3.0) < 1e-9, s"$ra")
  }

  test("dunnTest: pooled-rank z hand-computed; BH separates the far pair; all-tied empty") {
    import spark.implicits._
    // a={1,2,3} b={4,5,6} c={7,8,9}: mean ranks 2/5/8, sigma2 = 5 per pair
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(7, 8, 9).map(("c", _))).toDF("g", "v")
    val rows = Analytics.dunnTest(df, col("v"), col("g"))
      .orderBy("g_a", "g_b").collect()
    assert(rows.length == 3, rows.mkString)
    val ab = rows(0); val ac = rows(1); val bc = rows(2)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b")
    assert(ab.getDouble(4) == 2.0 && ab.getDouble(5) == 5.0, s"$ab")
    assert(math.abs(ab.getDouble(6) - (-3.0 / math.sqrt(5.0))) < 1e-6, s"$ab")
    assert(math.abs(ac.getDouble(6) - (-6.0 / math.sqrt(5.0))) < 1e-6, s"$ac")
    // BH: only the a-c pair survives at 0.05
    assert(ac.getBoolean(9) && !ab.getBoolean(9) && !bc.getBoolean(9),
      rows.mkString)
    assert(ac.getDouble(8) < 0.05 && ab.getDouble(8) > 0.05, rows.mkString)
    // everything tied: the variance term collapses, no pair survives
    val flat = Seq(("a", 7), ("a", 7), ("b", 7), ("b", 7)).toDF("g", "v")
    assert(Analytics.dunnTest(flat, col("v"), col("g")).count() == 0)
  }

  test("aipwEffect: exact linear nuisances recover the constant effect; null effect zero") {
    import spark.implicits._
    // o = 2 + 3x + 5t exactly: per-arm OLS fits exactly, residual terms
    // vanish, ate = ate_om = 5 regardless of the propensity fit
    val xs = Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    val data = xs.flatMap(x => Seq((2.0 + 3.0 * x + 5.0, true, x),
      (2.0 + 3.0 * x, false, x))).toDF("o", "t", "x")
    val r = Analytics.aipwEffect(data, col("o"), col("t"), Seq(col("x")))
      .head()
    assert(r.getLong(0) == 12 && r.getLong(1) == 6 && r.getLong(2) == 6, s"$r")
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-3, s"$r")
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-3, s"$r")
    // no effect: both arms share the model, ate ~ 0
    val zero = xs.flatMap(x => Seq((2.0 + 3.0 * x, true, x),
      (2.0 + 3.0 * x, false, x))).toDF("o", "t", "x")
    val rz = Analytics.aipwEffect(zero, col("o"), col("t"), Seq(col("x")))
      .head()
    assert(math.abs(rz.getDouble(3)) < 1e-3 && math.abs(rz.getDouble(4)) < 1e-3,
      s"$rz")
    // an arm with too few rows for the OLS fails loudly
    val tiny = Seq((1.0, true, 0.5), (2.0, true, 0.7), (3.0, false, 0.1),
      (4.0, false, 0.9), (5.0, false, 0.3)).toDF("o", "t", "x")
    val e = intercept[IllegalArgumentException] {
      Analytics.aipwEffect(tiny, col("o"), col("t"), Seq(col("x")))
    }
    assert(e.getMessage.contains("each arm"), e.getMessage)
  }

  test("powerMde: hand-computed MDE and power; degenerate control NULL") {
    import spark.implicits._
    // treated 2/4, control 1/4: se0 = sqrt(.25*.75*.5), pc = 0.25
    val df = (Seq(true, true, false, false).map((true, _)) ++
      Seq(true, false, false, false).map((false, _))).toDF("t", "s")
    val r = Analytics.powerMde(df, col("t"), col("s")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4, s"$r")
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.5, s"$r")
    assert(r.getDouble(4) == 0.25, s"$r")
    val se0 = math.sqrt(0.25 * 0.75 * 0.5)
    val mde = (1.9599639845400545 + 0.8416212335729143) * se0
    assert(math.abs(r.getDouble(5) - mde) < 1e-6, s"$r")
    // x = .25/se0 - 1.96 = -1.1434: power ~ Phi(-1.14) ~ 0.126
    assert(r.getDouble(6) > 0.12 && r.getDouble(6) < 0.14, s"$r")
    // control never converts: pc = 0 -> design stats NULL
    val deg = (Seq(true, false).map((true, _)) ++
      Seq(false, false).map((false, _))).toDF("t", "s")
    val rd = Analytics.powerMde(deg, col("t"), col("s")).head()
    assert(rd.isNullAt(5) && rd.isNullAt(6), s"$rd")
  }

  test("ebShrinkage: MoM prior hand-computed; tiny group pulled in; flat NULL prior") {
    import spark.implicits._
    // rates .5, .3, 1.0: m=.6 v=.13 -> a+b = .24/.13-1, alpha=.6s beta=.4s
    val rows = Seq.fill(5)(("a", true)) ++ Seq.fill(5)(("a", false)) ++
      Seq.fill(3)(("b", true)) ++ Seq.fill(7)(("b", false)) ++
      Seq.fill(2)(("c", true))
    val r = Analytics.ebShrinkage(rows.toDF("g", "s"), col("g"), col("s"))
      .orderBy("grp").collect()
    val s = 0.24 / 0.13 - 1.0
    val al = BigDecimal(0.6 * s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val be = BigDecimal(0.4 * s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(0).getDouble(4) - al) < 1e-9, r.mkString)
    assert(math.abs(r(0).getDouble(5) - be) < 1e-9, r.mkString)
    // tiny 2/2 group shrinks well below 1.0; 10-row groups barely move
    val cShrunk = r(2).getDouble(6)
    assert(math.abs(cShrunk - (2.0 + al) / (2.0 + al + be)) < 1e-6, s"$cShrunk")
    assert(cShrunk < 0.9, s"$cShrunk")
    assert(math.abs(r(0).getDouble(6) - 0.5) < 0.01, r.mkString)
    // all groups at the same rate: v = 0 -> NULL prior, shrunk = raw
    val flat = Seq(("a", true), ("a", false), ("b", true), ("b", false))
    val rf = Analytics.ebShrinkage(flat.toDF("g", "s"), col("g"), col("s"))
      .orderBy("grp").collect()
    assert(rf.forall(_.isNullAt(4)) && rf.forall(_.getDouble(6) == 0.5),
      rf.mkString)
  }

  test("breslowDay: homogeneous strata give 0; opposed ORs positive; 1 stratum NULL") {
    import spark.implicits._
    def cell(g: String, e: Boolean, y: Boolean, k: Int) =
      Seq.fill(k)((g, e, y))
    // both strata at OR = 2 exactly -> psi = 2, a-tilde = a, BD = 0
    val homo = (cell("s1", true, true, 10) ++ cell("s1", true, false, 10) ++
      cell("s1", false, true, 5) ++ cell("s1", false, false, 10) ++
      cell("s2", true, true, 4) ++ cell("s2", true, false, 2) ++
      cell("s2", false, true, 2) ++ cell("s2", false, false, 2))
      .toDF("g", "e", "y")
    val r = Analytics.breslowDay(homo, col("g"), col("e"), col("y")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 2.0, s"$r")
    assert(math.abs(r.getDouble(3)) < 1e-6, s"$r")
    assert(r.getLong(4) == 1 && !r.getBoolean(5), s"$r")
    // opposed strata (OR 9 vs 1/9): BD strictly positive
    val het = (cell("s1", true, true, 9) ++ cell("s1", true, false, 1) ++
      cell("s1", false, true, 1) ++ cell("s1", false, false, 1) ++
      cell("s2", true, true, 1) ++ cell("s2", true, false, 9) ++
      cell("s2", false, true, 9) ++ cell("s2", false, false, 9))
      .toDF("g", "e", "y")
    val rh = Analytics.breslowDay(het, col("g"), col("e"), col("y")).head()
    assert(rh.getDouble(3) > 1.0, s"$rh")
    // a single stratum carries no homogeneity question: df/verdict NULL
    val one = (cell("s1", true, true, 5) ++ cell("s1", true, false, 5) ++
      cell("s1", false, true, 5) ++ cell("s1", false, false, 5))
      .toDF("g", "e", "y")
    val ro = Analytics.breslowDay(one, col("g"), col("e"), col("y")).head()
    assert(ro.getLong(1) == 1 && ro.isNullAt(3) && ro.isNullAt(4) &&
      ro.isNullAt(5), s"$ro")
  }

  test("tostEquivalence: equal means certify within wide margin, not narrow; se=0 NULL") {
    import spark.implicits._
    // ma = mb = 12, va = 4, vb = 1 -> se = sqrt(5/3)
    val df = (Seq(10.0, 12.0, 14.0).map((_, true)) ++
      Seq(11.0, 12.0, 13.0).map((_, false))).toDF("v", "a")
    val se = math.sqrt(4.0 / 3.0 + 1.0 / 3.0)
    val r = Analytics.tostEquivalence(df, col("v"), col("a"), delta = 3.0)
      .head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3, s"$r")
    assert(r.getDouble(2) == 0.0, s"$r")
    assert(math.abs(r.getDouble(3) - se) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - (-1.6448536269514722 * se)) < 1e-5,
      s"$r")
    assert(r.getBoolean(7), s"delta=3 > z95*se must certify: $r")
    // margin tighter than the CI: cannot certify
    val rn = Analytics.tostEquivalence(df, col("v"), col("a"), delta = 1.0)
      .head()
    assert(!rn.getBoolean(7), s"$rn")
    // zero variance both arms: se = 0 -> NULL verdict
    val const = (Seq(5.0, 5.0).map((_, true)) ++
      Seq(5.0, 5.0).map((_, false))).toDF("v", "a")
    val rc = Analytics.tostEquivalence(const, col("v"), col("a"), 1.0).head()
    assert(rc.isNullAt(3) && rc.isNullAt(7), s"$rc")
  }

  test("captureRecapture: Chapman estimate hand-computed; empty list NULL") {
    import spark.implicits._
    // nA=20 nB=10 m=5: Nhat = 21*11/6 - 1 = 37.5, var = 68.75
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(15)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(10)((false, false))
    val r = Analytics.captureRecapture(rows.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(r.getLong(0) == 20 && r.getLong(1) == 10 &&
      r.getLong(2) == 5 && r.getLong(3) == 25, s"$r")
    assert(r.getDouble(4) == 37.5, s"$r")
    assert(math.abs(r.getDouble(5) - math.sqrt(68.75)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(6) - 25.0 / 37.5) < 1e-6, s"$r")
    // detector B caught nothing: estimates NULL
    val oneSided = Seq.fill(4)((true, false)).toDF("a", "b")
    val ro = Analytics.captureRecapture(oneSided, col("a"), col("b")).head()
    assert(ro.getLong(1) == 0 && ro.isNullAt(4) && ro.isNullAt(5) &&
      ro.isNullAt(6), s"$ro")
  }

  test("classificationReport: per-class P/R/F1; unpredicted class; macro/micro rows") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a")).toDF("y", "p")
    val rows = Analytics.classificationReport(df, col("y"), col("p"))
      .orderBy("cls").collect()
    val byCls = rows.map(r => r.getString(0) -> r).toMap
    val a = byCls("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 3 && a.getLong(3) == 2, s"$a")
    assert(math.abs(a.getDouble(4) - 2.0 / 3) < 1e-6 &&
      math.abs(a.getDouble(5) - 2.0 / 3) < 1e-6 &&
      math.abs(a.getDouble(6) - 2.0 / 3) < 1e-6, s"$a")
    val b = byCls("b")
    assert(math.abs(b.getDouble(4) - 2.0 / 3) < 1e-6 &&
      b.getDouble(5) == 1.0 && math.abs(b.getDouble(6) - 0.8) < 1e-6, s"$b")
    // never predicted: NULL precision/F1, zero recall
    val c = byCls("c")
    assert(c.getLong(2) == 0 && c.isNullAt(4) && c.getDouble(5) == 0.0 &&
      c.isNullAt(6), s"$c")
    // macro treats NULLs as 0 (zero-division convention); micro = accuracy
    val ma = byCls("(macro)")
    assert(math.abs(ma.getDouble(4) - 4.0 / 9) < 1e-6 &&
      math.abs(ma.getDouble(5) - 5.0 / 9) < 1e-6, s"$ma")
    assert(math.abs(ma.getDouble(6) - (2.0 / 3 + 0.8) / 3) < 1e-6, s"$ma")
    val mi = byCls("(micro)")
    assert(math.abs(mi.getDouble(4) - 4.0 / 6) < 1e-6 &&
      mi.getDouble(4) == mi.getDouble(6), s"$mi")
  }

  test("regressionMetrics: hand-computed error table; constant actuals NULL r2") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 2.0), (4.0, 2.0))
      .toDF("y", "p")
    val r = Analytics.regressionMetrics(df, col("y"), col("p")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4, s"$r")
    assert(r.getDouble(2) == -0.5 && r.getDouble(3) == 1.0, s"$r")
    assert(math.abs(r.getDouble(4) - math.sqrt(1.5)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(5) - (1.0 + 1.0 / 3 + 0.5) / 4) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(6) - (-0.2)) < 1e-9, s"$r")
    // constant actuals: SStot = 0 -> R^2 undefined; zero actuals leave MAPE
    val const = Seq((3.0, 3.0), (3.0, 4.0)).toDF("y", "p")
    assert(Analytics.regressionMetrics(const, col("y"), col("p"))
      .head().isNullAt(6))
    val zeros = Seq((0.0, 1.0), (2.0, 2.0)).toDF("y", "p")
    val rz = Analytics.regressionMetrics(zeros, col("y"), col("p")).head()
    assert(rz.getLong(1) == 1 && rz.getDouble(5) == 0.0, s"$rz")
  }

  test("topKOverlap: identical scorers 1, reversed 0, partial hand-counted") {
    import spark.implicits._
    val df = (1 to 6).map(i => (i.toLong, i.toDouble, (7 - i).toDouble))
      .toDF("id", "a", "b")
    // same scorer: top-2 sets identical
    val r1 = Analytics.topKOverlap(df, col("id"), col("a"), col("a"), 2)
      .head()
    assert(r1.getInt(0) == 2 && r1.getLong(1) == 6 && r1.getLong(2) == 2,
      s"$r1")
    assert(r1.getDouble(3) == 1.0, s"$r1")
    assert(math.abs(r1.getDouble(4) - 2.0 / 6) < 1e-6, s"$r1")
    // reversed scorer: disjoint top-2 sets
    val r0 = Analytics.topKOverlap(df, col("id"), col("a"), col("b"), 2)
      .head()
    assert(r0.getLong(2) == 0 && r0.getDouble(3) == 0.0, s"$r0")
    // partial: top-4 of a = {6,5,4,3}, of b = {1,2,3,4} -> both = 2,
    // jaccard = 2/6
    val rp = Analytics.topKOverlap(df, col("id"), col("a"), col("b"), 4)
      .head()
    assert(rp.getLong(2) == 2 &&
      math.abs(rp.getDouble(3) - 2.0 / 6) < 1e-6, s"$rp")
  }

  test("theilInequality: equal units 0, concentrated ln(n), zeros contribute 0") {
    import spark.implicits._
    // perfectly equal: T = 0
    val eq = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0), ("d", 5.0))
      .toDF("u", "x")
    val re = Analytics.theilInequality(eq, col("u"), col("x")).head()
    assert(re.getLong(0) == 4 && re.getDouble(2) == 0.0 &&
      re.getDouble(3) == 0.0, s"$re")
    // one unit owns everything: T = ln(n), norm = 1
    val conc = Seq(("a", 12.0), ("b", 0.0), ("c", 0.0), ("d", 0.0))
      .toDF("u", "x")
    val rc = Analytics.theilInequality(conc, col("u"), col("x")).head()
    assert(math.abs(rc.getDouble(2) - math.log(4.0)) < 1e-6 &&
      math.abs(rc.getDouble(3) - 1.0) < 1e-6, s"$rc")
    // hand case: {1, 3}: mu = 2, T = ((1/2)ln(1/2) + (3/2)ln(3/2)) / 2
    val two = Seq(("a", 1.0), ("b", 3.0)).toDF("u", "x")
    val rt = Analytics.theilInequality(two, col("u"), col("x")).head()
    val expect = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    assert(math.abs(rt.getDouble(2) - expect) < 1e-6, s"$rt")
  }

  test("eceByGroup: calibrated slice 0, miscalibrated slice exposed") {
    import spark.implicits._
    val df = Seq(("g1", 0.5, 1.0), ("g1", 0.5, 0.0),
      ("g2", 0.1, 1.0), ("g2", 0.1, 1.0)).toDF("g", "s", "y")
    val rows = Analytics.eceByGroup(df, col("g"), col("s"), col("y"))
      .orderBy("grp").collect()
    assert(rows.length == 2, rows.mkString)
    assert(rows(0).getDouble(2) == 0.0 && rows(0).getDouble(3) == 0.25,
      s"${rows(0)}")
    assert(math.abs(rows(1).getDouble(2) - 0.9) < 1e-9 &&
      math.abs(rows(1).getDouble(3) - 0.81) < 1e-9, s"${rows(1)}")
  }

  test("rateRatioTest: hand-computed log-rate z; zero-event arm NULL") {
    import spark.implicits._
    val df = Seq((true, 20.0, 10.0), (false, 10.0, 10.0))
      .toDF("a", "ev", "t")
    val r = Analytics.rateRatioTest(df, col("a"), col("ev"), col("t"))
      .head()
    assert(r.getLong(0) == 20 && r.getLong(1) == 10, s"$r")
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 2.0, s"$r")
    val z = math.log(2.0) / math.sqrt(1.0 / 20 + 1.0 / 10)
    assert(math.abs(r.getDouble(7) - z) < 1e-6, s"$r")
    assert(!r.getBoolean(8), s"1.79 < 1.96 must not reject: $r")
    // an arm with zero events has no defined log rate ratio
    val zero = Seq((true, 0.0, 5.0), (false, 10.0, 10.0))
      .toDF("a", "ev", "t")
    val rz = Analytics.rateRatioTest(zero, col("a"), col("ev"), col("t"))
      .head()
    assert(rz.isNullAt(6) && rz.isNullAt(7) && rz.isNullAt(8), s"$rz")
  }

  test("shiftWeightedMetric: no-shift weights are flat; shift pulls toward target") {
    import spark.implicits._
    // domain independent of x: classifier ~ intercept-only, weighted
    // metric stays at the source mean
    val flat = (0 until 40).map { i =>
      val x = (i % 10) / 10.0
      (i % 2 == 0, x, if (x >= 0.5) 1.0 else 0.0)
    }.toDF("d", "x", "m")
    val rf = Analytics.shiftWeightedMetric(flat, col("d"), col("x"),
      col("m")).head()
    assert(rf.getLong(0) == 20 && rf.getLong(1) == 20, s"$rf")
    assert(math.abs(rf.getDouble(4) - rf.getDouble(2)) < 0.05, s"$rf")
    // target = high-x rows, metric = x: upweighting high-x source rows
    // must pull the estimate above the raw source mean, toward target
    val shifted = (0 until 40).map { i =>
      val x = (i % 10) / 10.0
      (x >= 0.6, x, x)
    }.toDF("d", "x", "m")
    val rs = Analytics.shiftWeightedMetric(shifted, col("d"), col("x"),
      col("m")).head()
    assert(rs.getDouble(4) > rs.getDouble(2), s"$rs")
    assert(rs.getDouble(3) > rs.getDouble(4),
      s"clipped ratios cannot overshoot the target here: $rs")
    assert(rs.getDouble(5) <= rs.getLong(0).toDouble + 1e-9, s"$rs")
  }

  test("periodogram: planted cycle peaks at its period; flat series zero power") {
    import spark.implicits._
    // pure 4-cycle: v = cos(2*pi*t/4) over 40 points
    val cyc = (0 until 40).map(t =>
      (t.toDouble, math.cos(2 * math.Pi * t / 4))).toDF("t", "v")
    val rows = Analytics.periodogram(cyc, col("t"), col("v"), Seq(2, 4, 8))
      .orderBy("period").collect()
    assert(rows.length == 3, rows.mkString)
    val byP = rows.map(r => r.getInt(0) -> r).toMap
    assert(byP(4).getBoolean(3), s"period 4 must peak: ${rows.mkString}")
    assert(!byP(2).getBoolean(3) && !byP(8).getBoolean(3), rows.mkString)
    assert(byP(4).getDouble(2) > 0.9,
      s"a pure tone holds ~all the variance: ${byP(4)}")
    assert(byP(4).getDouble(1) > 100 * math.max(byP(2).getDouble(1), 1e-9),
      rows.mkString)
    // constant series: zero centered mass everywhere
    val flat = (0 until 20).map(t => (t.toDouble, 5.0)).toDF("t", "v")
    val rf = Analytics.periodogram(flat, col("t"), col("v"), Seq(2, 4))
      .collect()
    assert(rf.forall(r => r.getDouble(1) < 1e-9 && r.isNullAt(2)),
      rf.mkString)
  }

  test("grangerTest: planted lead-lag rejects; small series withholds; AR-perfect NULL") {
    import spark.implicits._
    // y_t = x_{t-1} + small wiggle: x leads y, y's own lag is noise
    def x(t: Int) = ((t * 7) % 13).toDouble
    val rows = (1 to 30).map { t =>
      val yv = if (t == 1) 0.0 else x(t - 1) + ((t % 3) - 1) * 0.1
      (t, yv, x(t))
    }
    val r = Analytics.grangerTest(rows.toDF("t", "y", "x"), col("t"),
      col("y"), col("x")).head()
    assert(r.getLong(0) == 29, s"$r")
    assert(math.abs(r.getDouble(2) - 1.0) < 0.05,
      s"the x-lag coefficient must be ~1: $r")
    assert(r.getDouble(4) < r.getDouble(3), s"$r")
    assert(r.getDouble(5) > 3.842 && r.getBoolean(6), s"$r")
    // the same construction on 10 points: df2 < 20 withholds the verdict
    val few = (1 to 10).map { t =>
      val yv = if (t == 1) 0.0 else x(t - 1) + ((t % 3) - 1) * 0.1
      (t, yv, x(t))
    }
    val rf = Analytics.grangerTest(few.toDF("t", "y", "x"), col("t"),
      col("y"), col("x")).head()
    assert(rf.isNullAt(6), s"$rf")
    // y_t follows its own lag exactly: SSE_f = 0 -> no F, no verdict
    val ar = (1 to 30).map(t => (t, t.toDouble, x(t)))
    val ra = Analytics.grangerTest(ar.toDF("t", "y", "x"), col("t"),
      col("y"), col("x")).head()
    assert(ra.isNullAt(5) && ra.isNullAt(6), s"$ra")
  }

  test("overdispersionTest: regular counts reject low, bursty high; tiny hand case") {
    import spark.implicits._
    // all counts identical: VMR 0 -> z = -sqrt(2(n-1)-1), far low
    val flat = Seq.fill(25)(4).toDF("c")
    val rf = Analytics.overdispersionTest(flat, col("c")).head()
    assert(rf.getDouble(2) == 0.0 && rf.getDouble(3) == 0.0, s"$rf")
    assert(math.abs(rf.getDouble(4) - (-math.sqrt(47.0))) < 1e-6, s"$rf")
    assert(rf.getBoolean(5), s"$rf")
    // bursty: 20 zeros + 5 twenties
    val burst = (Seq.fill(20)(0) ++ Seq.fill(5)(20)).toDF("c")
    val rb = Analytics.overdispersionTest(burst, col("c")).head()
    assert(rb.getDouble(2) > 10.0 && rb.getDouble(4) > 10.0 &&
      rb.getBoolean(5), s"$rb")
    // n = 2 hand case: {3,5} -> vmr .5, chi2 .5, z = 0; verdict gated
    val two = Seq(3, 5).toDF("c")
    val rt = Analytics.overdispersionTest(two, col("c")).head()
    assert(rt.getDouble(2) == 0.5 && rt.getDouble(3) == 0.5 &&
      rt.getDouble(4) == 0.0 && rt.isNullAt(5), s"$rt")
  }

  test("regressionInfluence: planted outlier tops the table; guards fire") {
    import spark.implicits._
    val clean = (0 to 4).map(i => (i.toLong, i.toDouble, 2.0 + 3.0 * i))
    val df = (clean :+ ((99L, 10.0, 0.0))).toDF("id", "x", "y")
    val rows = Analytics.regressionInfluence(df, col("id"), col("x"),
      col("y"), topK = 3).collect()
    assert(rows.length == 3, rows.mkString)
    assert(rows.head.getLong(0) == 99L,
      s"the planted outlier must top Cook's table: ${rows.mkString}")
    assert(rows.head.getDouble(4) > rows(1).getDouble(4) ||
      rows.head.getDouble(5) > rows(1).getDouble(5), rows.mkString)
    // constant x / too-few rows fail loudly
    val constX = Seq((1L, 2.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0),
      (4L, 2.0, 4.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Analytics.regressionInfluence(constX, col("id"), col("x"), col("y"))
    }
    assert(e.getMessage.contains("constant x"), e.getMessage)
    val few = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0)).toDF("id", "x", "y")
    val e2 = intercept[IllegalArgumentException] {
      Analytics.regressionInfluence(few, col("id"), col("x"), col("y"))
    }
    assert(e2.getMessage.contains("more than 2"), e2.getMessage)
  }

  test("yuenTrimmedTest at vanishing trim equals the Welch z on the raw means") {
    import spark.implicits._
    // n < 1000 and trim 1e-4: floor(trim*n) = 0 -> no trimming, the
    // winsorized variance IS the sample variance: d = s^2/n, so z must
    // equal the plain Welch statistic computed from raw moments
    val a = Seq(3.0, 7.0, 8.0, 12.0, 1.0, 6.0)
    val b = Seq(5.0, 9.0, 11.0, 4.0, 13.0)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "ina")
    val r = Analytics.yuenTrimmedTest(df, col("v"), col("ina"),
      trim = 1e-4).head()
    def m(s: Seq[Double]) = s.sum / s.size
    def v(s: Seq[Double]) =
      s.map(x => (x - m(s)) * (x - m(s))).sum / (s.size - 1)
    val welch = (m(a) - m(b)) / math.sqrt(v(a) / a.size + v(b) / b.size)
    assert(r.getLong(2) == a.size && r.getLong(3) == b.size, s"$r")
    assert(math.abs(r.getDouble(8) - welch) < 1e-6,
      s"zero-trim Yuen must reduce to Welch: $r vs $welch")
  }

  test("numericAgreement: constant offset hits CCC not r; identical perfect; constant NULL") {
    import spark.implicits._
    // y = x + 2: r = 1 but CCC = 2v/(2v+4) with pop v = 1.25
    val df = Seq(1.0, 2.0, 3.0, 4.0).map(x => (x, x + 2)).toDF("x", "y")
    val r = Analytics.numericAgreement(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 4 && r.getDouble(1) == -2.0, s"$r")
    assert(r.getDouble(2) == -2.0 && r.getDouble(3) == -2.0,
      s"zero diff spread collapses the limits onto the bias: $r")
    assert(r.getDouble(4) == 1.0, s"$r")
    assert(math.abs(r.getDouble(5) - 2.5 / 6.5) < 1e-6, s"$r")
    // identical scorers: full concordance
    val same = Seq(1.0, 5.0, 9.0).map(x => (x, x)).toDF("x", "y")
    val rs = Analytics.numericAgreement(same, col("x"), col("y")).head()
    assert(rs.getDouble(1) == 0.0 && rs.getDouble(4) == 1.0 &&
      rs.getDouble(5) == 1.0, s"$rs")
    // a constant scorer admits no correlation
    val const = Seq((1.0, 3.0), (2.0, 3.0)).toDF("x", "y")
    val rc = Analytics.numericAgreement(const, col("x"), col("y")).head()
    assert(rc.isNullAt(4) && rc.isNullAt(5) && !rc.isNullAt(1), s"$rc")
  }

  test("pageTrendTest: perfect trend rejects; reverse does not; incomplete dropped") {
    import spark.implicits._
    // 12 complete blocks, values strictly increasing in the order
    val up = (1 to 12).flatMap(b => Seq((b, "a", 1.0), (b, "b", 2.0),
      (b, "c", 3.0))) ++ Seq((99, "a", 1.0), (99, "b", 2.0)) // incomplete
    val r = Analytics.pageTrendTest(up.toDF("b", "t", "v"), col("b"),
      col("t"), col("v"), Seq("a", "b", "c")).head()
    assert(r.getInt(0) == 3 && r.getLong(1) == 12 && r.getLong(2) == 1,
      s"$r")
    // L = 12 * (1 + 4 + 9) = 168, E = 144, Var = 24
    assert(r.getDouble(3) == 168.0 && r.getDouble(4) == 144.0, s"$r")
    assert(math.abs(r.getDouble(5) - 24.0 / math.sqrt(24.0)) < 1e-6, s"$r")
    assert(r.getBoolean(6), s"$r")
    // reverse the hypothesized order: z flips sign, one-sided no reject
    val rr = Analytics.pageTrendTest(up.toDF("b", "t", "v"), col("b"),
      col("t"), col("v"), Seq("c", "b", "a")).head()
    assert(rr.getDouble(5) < 0 && !rr.getBoolean(6), s"$rr")
    // below 12 blocks the normal verdict is withheld
    val few = (1 to 5).flatMap(b => Seq((b, "a", 1.0), (b, "b", 2.0),
      (b, "c", 3.0)))
    assert(Analytics.pageTrendTest(few.toDF("b", "t", "v"), col("b"),
      col("t"), col("v"), Seq("a", "b", "c")).head().isNullAt(6))
  }

  test("ratioMetricTest: delta-method var hand-computed; proportional arm zero var") {
    import spark.implicits._
    // A: (10,2),(20,3) -> R=6, var=0.64; B: (5,1),(15,3) -> R=5, var=0
    val df = Seq((10.0, 2.0, true), (20.0, 3.0, true),
      (5.0, 1.0, false), (15.0, 3.0, false)).toDF("y", "x", "a")
    val r = Analytics.ratioMetricTest(df, col("y"), col("x"), col("a"))
      .head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 6.0 && r.getDouble(3) == 5.0, s"$r")
    assert(r.getDouble(4) == 1.0, s"$r")
    assert(math.abs(r.getDouble(5) - 0.8) < 1e-9, s"$r")
    assert(math.abs(r.getDouble(6) - 1.25) < 1e-9, s"$r")
    assert(r.isNullAt(7), s"n < 20 must gate the verdict: $r")
    // a single-unit arm has no variance estimate
    val tiny = Seq((10.0, 2.0, true), (5.0, 1.0, false),
      (15.0, 3.0, false)).toDF("y", "x", "a")
    val rt = Analytics.ratioMetricTest(tiny, col("y"), col("x"), col("a"))
      .head()
    assert(rt.getDouble(2) == 5.0 && rt.isNullAt(5) && rt.isNullAt(6),
      s"$rt")
  }

  test("krippendorffAlphaOrdinal: hand-computed; perfect 1; binary == nominal") {
    import spark.implicits._
    // i1{1,2} i2{1,3} i3{2,2}: De = 180, Do = 53, alpha = 1 - 5*53/180
    val df = Seq((1, 1.0), (1, 2.0), (2, 1.0), (2, 3.0), (3, 2.0),
      (3, 2.0)).toDF("item", "lvl")
    val r = Analytics.krippendorffAlphaOrdinal(df, "item", "lvl").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 6 && r.getLong(2) == 3,
      s"$r")
    assert(math.abs(r.getDouble(3) - (1.0 - 5.0 * 53 / 180)) < 1e-6, s"$r")
    // unanimous items: D_o = 0 -> alpha = 1
    val perfect = Seq((1, 1.0), (1, 1.0), (2, 3.0), (2, 3.0))
      .toDF("item", "lvl")
    assert(Analytics.krippendorffAlphaOrdinal(perfect, "item", "lvl")
      .head().getDouble(3) == 1.0)
    // two-level scale: the single pair's delta^2 cancels -> == nominal
    val bin = Seq((1, 0.0), (1, 1.0), (2, 1.0), (2, 1.0), (3, 0.0),
      (3, 0.0), (4, 0.0), (4, 1.0), (4, 1.0)).toDF("item", "lvl")
    val ord = Analytics.krippendorffAlphaOrdinal(bin, "item", "lvl")
      .head().getDouble(3)
    val nom = Analytics.krippendorffAlpha(
      bin.select(col("item"), col("lvl").cast("string").as("label")),
      "item", "label").head().getDouble(3)
    assert(math.abs(ord - nom) < 1e-9, s"ordinal $ord vs nominal $nom")
  }

  test("aucConfidence: hand-computed Hanley-McNeil se; perfect separation; empty class") {
    import spark.implicits._
    // pos {0.4,0.8}, neg {0.2,0.6}: AUC .75, se^2 = .305357/4
    val df = Seq((0.4, 1), (0.8, 1), (0.2, 0), (0.6, 0)).toDF("s", "y")
    val r = Analytics.aucConfidence(df, col("s"), col("y")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 0.75, s"$r")
    val q1 = 0.75 / 1.25; val q2 = 1.125 / 1.75
    val se = math.sqrt((0.75 * 0.25 + (q1 - 0.5625) + (q2 - 0.5625)) / 4)
    assert(math.abs(r.getDouble(3) - se) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - (0.75 - 1.959963984540054 * se)) < 1e-5
      && r.getDouble(5) == 1.0, s"$r")
    // perfect separation: se = 0, CI degenerate at 1
    val perfect = Seq((0.8, 1), (0.9, 1), (0.1, 0), (0.2, 0)).toDF("s", "y")
    val rp = Analytics.aucConfidence(perfect, col("s"), col("y")).head()
    assert(rp.getDouble(2) == 1.0 && rp.getDouble(3) == 0.0 &&
      rp.getDouble(4) == 1.0, s"$rp")
    // one class only: no AUC
    val one = Seq((0.5, 1), (0.6, 1)).toDF("s", "y")
    assert(Analytics.aucConfidence(one, col("s"), col("y"))
      .head().isNullAt(2))
  }

  test("labelNoiseEstimate: confidently-contradicted labels counted; one-class NULL") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.8, true), (0.2, true),
      (0.1, false), (0.2, false), (0.7, false)).toDF("s", "y")
    val r = Analytics.labelNoiseEstimate(df, col("s"), col("y")).head()
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 3, s"$r")
    assert(math.abs(r.getDouble(3) - 19.0 / 30) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-6, s"$r")
    assert(r.getLong(5) == 1 && r.getLong(6) == 1, s"$r")
    assert(math.abs(r.getDouble(7) - 2.0 / 6) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(8) - 1.0 / 3) < 1e-6 &&
      math.abs(r.getDouble(9) - 1.0 / 3) < 1e-6, s"$r")
    // a single-class label column has no contradiction threshold
    val onecls = Seq((0.5, true), (0.9, true)).toDF("s", "y")
    val ro = Analytics.labelNoiseEstimate(onecls, col("s"), col("y")).head()
    assert(ro.isNullAt(7) && ro.isNullAt(8) && ro.isNullAt(9), s"$ro")
  }

  test("eventStudy: per-period effects vs base; base row zero; hand-computed se") {
    import spark.implicits._
    // p1: T{1,3} C{0,2} diff 1 (base); p2: T{4,6} C{1,3} diff 3 -> effect 2
    val df = Seq((1, true, 1.0), (1, true, 3.0), (1, false, 0.0),
      (1, false, 2.0), (2, true, 4.0), (2, true, 6.0), (2, false, 1.0),
      (2, false, 3.0)).toDF("p", "t", "y")
    val rows = Analytics.eventStudy(df, col("y"), col("t"), col("p"))
      .orderBy("period").collect()
    assert(rows.length == 2, rows.mkString)
    val base = rows(0); val p2 = rows(1)
    assert(base.getInt(0) == 1 && base.getDouble(3) == 1.0 &&
      base.getDouble(4) == 0.0, s"$base")
    assert(base.isNullAt(5) && base.isNullAt(6),
      s"base row must carry no se/z: $base")
    assert(p2.getDouble(3) == 3.0 && p2.getDouble(4) == 2.0, s"$p2")
    // all four cells var 2, n 2: se = sqrt(4 * 2/2) = 2; z = 1
    assert(p2.getDouble(5) == 2.0 && p2.getDouble(6) == 1.0, s"$p2")
  }

  test("oaxacaBlinder: exact linear outcome fully explained; flat covariates zero") {
    import spark.implicits._
    // o = 2 + 3x in BOTH groups, A has higher x: gap fully explained
    val df = (Seq(0.6, 0.8, 1.0, 0.9).map(x => (2 + 3 * x, true, x)) ++
      Seq(0.0, 0.2, 0.4, 0.1).map(x => (2 + 3 * x, false, x)))
      .toDF("o", "a", "x")
    val r = Analytics.oaxacaBlinder(df, col("o"), col("a"), Seq(col("x")))
      .head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4, s"$r")
    val gap = r.getDouble(4)
    assert(math.abs(gap - 3.0 * (0.825 - 0.175)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(5) - gap) < 1e-4,
      s"covariate-priced gap must absorb everything: $r")
    assert(math.abs(r.getDouble(6)) < 1e-4, s"$r")
    // same covariates, shifted outcome: all unexplained
    val shift = (Seq(0.1, 0.5, 0.9, 0.3).map(x => (10 + 3 * x, true, x)) ++
      Seq(0.1, 0.5, 0.9, 0.3).map(x => (2 + 3 * x, false, x)))
      .toDF("o", "a", "x")
    val rs = Analytics.oaxacaBlinder(shift, col("o"), col("a"),
      Seq(col("x"))).head()
    assert(math.abs(rs.getDouble(4) - 8.0) < 1e-6, s"$rs")
    assert(math.abs(rs.getDouble(5)) < 1e-4 &&
      math.abs(rs.getDouble(6) - 8.0) < 1e-4, s"$rs")
  }

  test("binaryDiagnostics: hand-computed MCC/Youden; degenerate predictor NULL") {
    import spark.implicits._
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(3)((false, false))
    val r = Analytics.binaryDiagnostics(rows.toDF("y", "p"),
      col("y"), col("p")).head()
    assert(r.getLong(0) == 10 && r.getLong(1) == 4 && r.getLong(2) == 1 &&
      r.getLong(3) == 2 && r.getLong(4) == 3, s"$r")
    assert(r.getDouble(5) == 0.7, s"$r")
    assert(math.abs(r.getDouble(6) - (4.0 / 6 + 3.0 / 4) / 2) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(7) - 10.0 / math.sqrt(600.0)) < 1e-6, s"$r")
    assert(math.abs(r.getDouble(8) - (4.0 / 6 + 3.0 / 4 - 1)) < 1e-6, s"$r")
    // predictor that always fires: tn = fn = 0 -> correlation undefined
    val always = Seq((true, true), (false, true)).toDF("y", "p")
    val ra = Analytics.binaryDiagnostics(always, col("y"), col("p")).head()
    assert(ra.getDouble(5) == 0.5 && ra.isNullAt(6) && ra.isNullAt(7) &&
      ra.isNullAt(8), s"$ra")
  }

  test("gumbelTailFit: MoM params on known maxima; return levels grow; flat NULL") {
    import spark.implicits._
    // blocks with maxima 10, 20, 30 (each block has a smaller decoy)
    val df = Seq(("b1", 10.0), ("b1", 1.0), ("b2", 20.0), ("b2", 5.0),
      ("b3", 30.0), ("b3", 2.0)).toDF("b", "v")
    val r = Analytics.gumbelTailFit(df, col("v"), col("b")).head()
    assert(r.getLong(0) == 3 && r.getDouble(1) == 30.0, s"$r")
    val sigma = 10.0 * (math.sqrt(6.0) / math.Pi)
    val mu = 20.0 - 0.5772156649015329 * sigma
    assert(math.abs(r.getDouble(2) - mu) < 1e-5, s"$r")
    assert(math.abs(r.getDouble(3) - sigma) < 1e-5, s"$r")
    val r10 = mu - sigma * math.log(-math.log(1.0 - 1.0 / 30.0))
    val r100 = mu - sigma * math.log(-math.log(1.0 - 1.0 / 300.0))
    assert(math.abs(r.getDouble(4) - r10) < 1e-5, s"$r")
    assert(math.abs(r.getDouble(5) - r100) < 1e-5, s"$r")
    assert(r.getDouble(5) > r.getDouble(4) &&
      r.getDouble(4) > r.getDouble(1), s"levels must extrapolate up: $r")
    // identical maxima: zero spread -> no fit
    val flat = Seq(("b1", 5.0), ("b2", 5.0), ("b3", 5.0)).toDF("b", "v")
    val rf = Analytics.gumbelTailFit(flat, col("v"), col("b")).head()
    assert(rf.isNullAt(2) && rf.isNullAt(4), s"$rf")
  }

  test("yuenTrimmedTest: outlier excised; hand-computed winsorized variance; flat NULL") {
    import spark.implicits._
    // A has a 100 outlier; 20% trim drops it -> trimmed means both 2
    val df = (Seq(0.0, 1.0, 2.0, 3.0, 100.0).map((_, true)) ++
      Seq(0.0, 1.0, 2.0, 3.0, 4.0).map((_, false))).toDF("v", "a")
    val r = Analytics.yuenTrimmedTest(df, col("v"), col("a")).head()
    assert(r.getLong(0) == 5 && r.getLong(2) == 3, s"$r")
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 2.0 &&
      r.getDouble(6) == 0.0, s"$r")
    // winsorized {1,1,2,3,3} both arms: d = 4/6 each, se = sqrt(4/3)
    assert(math.abs(r.getDouble(7) - math.sqrt(4.0 / 3.0)) < 1e-6, s"$r")
    assert(r.getDouble(8) == 0.0, s"$r")
    assert(r.isNullAt(9), s"n < 20 must gate the verdict: $r")
    // 20-vs-20 shifted: da = db = 385/132, z = -20/sqrt(770/132) -> reject
    val big = ((1 to 20).map(i => (i.toDouble, true)) ++
      (21 to 40).map(i => (i.toDouble, false))).toDF("v", "a")
    val rb = Analytics.yuenTrimmedTest(big, col("v"), col("a")).head()
    assert(rb.getLong(2) == 12 && rb.getDouble(4) == 10.5 &&
      rb.getDouble(5) == 30.5, s"$rb")
    assert(math.abs(rb.getDouble(8) - (-20.0 / math.sqrt(770.0 / 132.0)))
      < 1e-6, s"$rb")
    assert(rb.getBoolean(9), s"$rb")
    // all values identical: zero winsorized variance -> NULL z/verdict
    val flat = (Seq.fill(25)((7.0, true)) ++ Seq.fill(25)((7.0, false)))
      .toDF("v", "a")
    val rf = Analytics.yuenTrimmedTest(flat, col("v"), col("a")).head()
    assert(rf.isNullAt(7) && rf.isNullAt(8) && rf.isNullAt(9), s"$rf")
  }

  test("plattCalibration: line matches the GD fit; brier_raw exact; platt improves") {
    import spark.implicits._
    // well-separated scores, labels follow the score
    val rows = Seq.fill(10)((0.1, 0.0)) ++ Seq.fill(2)((0.1, 1.0)) ++
      Seq.fill(10)((0.9, 1.0)) ++ Seq.fill(2)((0.9, 0.0))
    val df = rows.toDF("s", "y")
    val r = Analytics.plattCalibration(df, col("s"), col("y")).head()
    assert(r.getLong(0) == 24, s"$r")
    // the published line IS the logisticRegressionGD fit
    val gd = Analytics.logisticRegressionGD(
      df.select(col("s").as("__s"), col("y").as("__y")),
      Seq(col("__s")), col("__y")).head()
    assert(r.getDouble(2) == gd.getDouble(0) &&
      r.getDouble(1) == gd.getDouble(1), s"$r vs $gd")
    assert(r.getDouble(1) > 0.0, s"positive association must fit A > 0: $r")
    // brier_raw = avg((s - y)^2) exactly
    val braw = rows.map { case (s, y) => (s - y) * (s - y) }.sum / 24.0
    assert(math.abs(r.getDouble(3) -
      BigDecimal(braw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9, s"$r")
    // after-Brier recomputed from the published line
    val (a, b) = (r.getDouble(1), r.getDouble(2))
    val bcal = rows.map { case (s, y) =>
      val p = 1.0 / (1.0 + math.exp(-(b + a * s)))
      (p - y) * (p - y)
    }.sum / 24.0
    assert(math.abs(r.getDouble(4) - bcal) < 1e-6, s"$r")
  }

  test("ebShrinkMeans: hand-computed Efron-Morris shrink, constant-data full shrink, K<3 NULL") {
    // groups A:[0,2] B:[3,5] C:[8,10] -> sigma2=2, tau2=46/3, B=3/49
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 3.0), ("b", 5.0),
      ("c", 8.0), ("c", 10.0)).toDF("k", "v")
    val out = Analytics.ebShrinkMeans(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    def rd(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == (1.0, rd(60.0 / 49), rd(3.0 / 49), rd(14.0 / 3)))
    assert(out("b") == (4.0, rd(198.0 / 49), rd(3.0 / 49), rd(14.0 / 3)))
    assert(out("c") == (9.0, rd(428.0 / 49), rd(3.0 / 49), rd(14.0 / 3)))
    // constant data: B = 1, every shrunk mean IS the grand mean
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0),
      ("c", 5.0), ("c", 5.0)).toDF("k", "v")
    Analytics.ebShrinkMeans(const, col("k"), col("v")).collect().foreach { r =>
      assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 1.0, s"$r")
    }
    // K = 2: verdict columns NULL, raw means still reported
    val two = Seq(("a", 1.0), ("a", 3.0), ("b", 4.0), ("b", 8.0)).toDF("k", "v")
    Analytics.ebShrinkMeans(two, col("k"), col("v")).collect().foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), s"$r")
    }
    // big group barely moves, tiny group moves hard (monotone weights)
    val skew = (1 to 100).map(i => ("big", 10.0 + (i % 3))) ++
      Seq(("tiny", 100.0), ("tiny", 102.0), ("mid", 50.0), ("mid", 51.0),
        ("mid", 52.0), ("mid", 49.0))
    val s2 = Analytics.ebShrinkMeans(skew.toDF("k", "v"), col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(s2("big") < s2("mid") && s2("mid") < s2("tiny"),
      s"weights must grow as n shrinks: $s2")
  }

  test("conformalCoverage: finite-sample quantile rank, slice audit, infinite-interval edge") {
    // ids chosen only for determinism; nonconformity |label - pred|
    val rows = (1L to 400L).map { i =>
      (i, if (i % 2 == 0) "even" else "odd",
        0.0, (i % 10).toDouble) // pred 0 -> nc = i % 10
    }
    val df = rows.toDF("id", "grp", "pred", "label")
    val out = Analytics.conformalCoverage(df, col("id"), col("grp"),
      col("pred"), col("label"), alpha = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3), r.getDouble(4))).toMap
    // qhat is a value from the nc domain {0..9}; both slices share it
    val (qE, qO) = (out("even")._4, out("odd")._4)
    assert(qE == qO && qE >= 0.0 && qE <= 9.0, s"$out")
    // nc is uniform over 0..9 in BOTH splits: coverage must sit near
    // (qhat+1)/10 and at/above the 0.8 guarantee for the 80% quantile
    out.values.foreach { case (n, cov, covFlag, q) =>
      assert(n > 0 && cov >= (q + 1) / 10.0 - 0.15 && cov <= (q + 1) / 10.0 + 0.15,
        s"coverage $cov inconsistent with qhat $q")
      assert(covFlag == (cov >= 0.8), s"$out")
    }
    // alpha so small that ceil((ncal+1)(1-alpha)) > ncal -> infinite
    // interval, coverage exactly 1 everywhere
    val tiny = (1L to 8L).map(i => (i, "g", 0.0, i.toDouble)).toDF("id", "grp", "pred", "label")
    val inf = Analytics.conformalCoverage(tiny, col("id"), col("grp"),
      col("pred"), col("label"), alpha = 0.01).head()
    assert(inf.getDouble(2) == 1.0 && inf.getBoolean(3) &&
      inf.getDouble(4).isPosInfinity, s"$inf")
  }

  test("embeddingDimDrift: shifted dimension scores hot, constant dims score zero") {
    val rows = (1 to 40).map { i =>
      val a = i % 2 == 0
      val v0 = (i % 7).toFloat + (if (a) 0f else 20f) // dim 0 shifted in B
      (i.toLong, a, Array(v0, 5f, (i % 3).toFloat))   // dim 1 constant,
    }                                                 // dim 2 identical dists
    val df = rows.toDF("id", "a", "vec")
    val out = Analytics.embeddingDimDrift(df, "vec", col("a"), bins = 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(0, 1, 2))
    assert(out(0)._1 == 20 && out(0)._2 == 20)
    // disjoint supports: dim 0 PSI far above the 0.2 "moved" bar
    assert(out(0)._3 > 1.0, s"shifted dim must be hot: $out")
    // constant dim: all mass in bin 0 both sides -> PSI exactly 0
    assert(out(1)._3 == 0.0, s"constant dim must score 0: $out")
    // near-identical distributions on dim 2: (i%3) histograms differ
    // by at most one count between the parity cohorts -> PSI tiny,
    // far below the shifted dim and below the 0.2 "moved" bar
    assert(out(2)._3 < 0.05 && out(2)._3 < out(0)._3 / 50,
      s"near-identical dists must score tiny: $out")
    // NULL vectors drop from both counts
    val withNull = rows.map(r => (r._1, r._2, r._3)) :+ ((99L, true, null.asInstanceOf[Array[Float]]))
    val n2 = Analytics.embeddingDimDrift(withNull.toDF("id", "a", "vec"),
      "vec", col("a")).where(col("dim") === 0).head()
    assert(n2.getLong(1) == 20 && n2.getLong(2) == 20, s"$n2")
  }
}
