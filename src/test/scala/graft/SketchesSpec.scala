package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._

/** Count-min + Misra–Gries heavy hitters: one-sided error and the εn
  * bound on a skewed distribution, layout-independence of the candidate
  * guarantee, exact-ranking recovery under clear gaps, determinism. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  // Zipf-ish: key "k<i>" appears ~1000/i times for i in 1..50, plus a
  // long tail of singletons — 1775 distinct keys, n ≈ 5700.
  private lazy val skewed = {
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"k$i")) ++
      (1 to 1500).map(i => s"tail$i")
    rows.toDF("w").repartition(7)
  }

  test("HLL sketches: partition-invariant union, accurate rollup, per-group reads") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", i % 997)).toDF("g", "v")
    val sk = Sketches.distinctSketches(df, Seq(col("g")), col("v"))
    assert(sk.count() == 3)
    // merged estimate over per-group sketches == single whole-set sketch
    val merged = sk.agg(Sketches.mergedDistinctEstimate(col("sketch"))).head.getLong(0)
    val direct = df.agg(hll_sketch_estimate(
      hll_sketch_agg(col("v"), lit(12)))).head.getLong(0)
    assert(merged == direct, s"union-of-parts $merged != whole-set $direct")
    // at this cardinality (997) the estimate is within 5% of exact
    assert(math.abs(merged - 997) <= 997 * 5 / 100)
    // physical layout must not change the sketch union
    val sk2 = Sketches.distinctSketches(df.repartition(13), Seq(col("g")), col("v"))
    val merged2 = sk2.agg(Sketches.mergedDistinctEstimate(col("sketch"))).head.getLong(0)
    assert(merged2 == merged)
  }

  test("KLL sketches: per-group reads, rollup across groups, rank-error bound") {
    // three groups with known distributions: uniform 1..1000 per group
    val df = (1 to 9000).map(i => (s"g${i % 3}", (i / 3 % 1000) + 1.0)).toDF("g", "v")
    val sk = df.groupBy("g").agg(graft.functions.Kll.sketchAgg(col("v"), k = 200).as("qs"))
    assert(sk.count() == 3)
    // per-group p50 within 5% rank error of the uniform median
    val reads = sk.select(col("g"),
      graft.functions.Kll.quantiles(col("qs"), Seq(0.5, 0.9)).as("q")).collect()
    reads.foreach { r =>
      val Seq(p50, p90) = r.getSeq[Double](1).toSeq
      assert(math.abs(p50 - 500.0) <= 50, s"p50 $p50 off for ${r.getString(0)}")
      assert(math.abs(p90 - 900.0) <= 50, s"p90 $p90 off for ${r.getString(0)}")
    }
    // rollup: merging the three group blobs estimates the union's quantiles
    val merged = sk.agg(graft.functions.Kll.mergeAgg(col("qs")).as("m"))
      .select(graft.functions.Kll.quantiles(col("m"), Seq(0.5)).as("q"))
      .head.getSeq[Double](0)
    assert(math.abs(merged.head - 500.0) <= 50, s"merged p50 ${merged.head}")
    // a sketch over a SHIFTED group dominates the merge's upper tail
    val shifted = (1 to 3000).map(i => ("hi", (i % 1000) + 10000.0)).toDF("g", "v")
    val both = df.union(shifted)
      .groupBy("g").agg(graft.functions.Kll.sketchAgg(col("v")).as("qs"))
      .agg(graft.functions.Kll.mergeAgg(col("qs")).as("m"))
      .select(graft.functions.Kll.quantiles(col("m"), Seq(0.99)).as("q"))
      .head.getSeq[Double](0)
    assert(both.head > 9000, s"p99 ${both.head} should sit in the shifted mass")
  }

  test("heavyHittersPerGroup: exact per-group top-k, heavy keys never lost, layout-proof") {
    // group a: x 40, y 30, z 5; group b: p 20, q 10 + singleton tail
    val rows = Seq.fill(40)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(5)(("a", "z")) ++ Seq.fill(20)(("b", "p")) ++
      Seq.fill(10)(("b", "q")) ++ (1 to 30).map(i => ("b", s"t$i"))
    val df = rows.toDF("g", "w").repartition(7)
    val top = graft.functions.Sketches
      .heavyHittersPerGroup(df, col("g"), col("w"), k = 2, mgCapacity = 8)
      .as[(String, String, Long)].collect().toSet
    assert(top == Set(("a", "x", 40L), ("a", "y", 30L),
      ("b", "p", 20L), ("b", "q", 10L)), s"got $top")
    // a different physical layout returns the same heavy keys
    val top2 = graft.functions.Sketches
      .heavyHittersPerGroup(df.repartition(3), col("g"), col("w"),
        k = 2, mgCapacity = 8)
      .as[(String, String, Long)].collect().toSet
    assert(top2 == top)
  }

  test("KLL: corrupt blob reads NULL, never throws") {
    val out = Seq(Array[Byte](1, 2, 3), null).toDF("b")
      .select(graft.functions.Kll.quantiles(col("b"), Seq(0.5)).as("q"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("KLL: nulls and NaNs are skipped; empty sketch reads NULL") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0))
      .toDF("v")
    val q = df.agg(graft.functions.Kll.sketchAgg(col("v")).as("qs"))
      .select(graft.functions.Kll.quantiles(col("qs"), Seq(0.0, 1.0)).as("q"))
      .head.getSeq[Double](0)
    assert(q == Seq(1.0, 3.0), s"min/max should be 1,3 got $q")
    val empty = Seq.empty[Double].toDF("v")
      .agg(graft.functions.Kll.sketchAgg(col("v")).as("qs"))
      .select(graft.functions.Kll.quantiles(col("qs"), Seq(0.5)).as("q"))
      .head
    assert(empty.isNullAt(0), "empty sketch must read NULL, not throw")
  }

  test("estimates are one-sided and within eps*n of exact counts") {
    val n = skewed.count()
    val sketch = Sketches.countMinSketchOf(skewed, col("w"), eps = 0.001)
    val exact = skewed.groupBy("w").count().as[(String, Long)].collect()
    exact.foreach { case (w, c) =>
      val est = sketch.estimateCount(w)
      assert(est >= c, s"$w: est $est < exact $c (must never undercount)")
      assert(est <= c + math.ceil(0.001 * n).toLong + 1,
        s"$w: est $est overshoots exact $c beyond eps*n")
    }
  }

  test("Misra-Gries candidates contain every heavy key under any row layout") {
    val heavy = (1 to 10).map(i => s"k$i").toSet // counts 100..1000 >> n/64
    for (layout <- Seq(skewed, skewed.repartition(1), skewed.repartition(16),
        skewed.orderBy("w"))) {
      val cands = Sketches.mgCandidates(layout, col("w"), mgCapacity = 64).toSet
      assert(heavy.subsetOf(cands),
        s"missing heavy keys: ${heavy -- cands}")
    }
  }

  test("heavyHitters recovers the exact top-k ranking when gaps clear eps*n") {
    val got = Sketches.heavyHitters(skewed, col("w"), k = 10, eps = 1e-4)
      .as[(String, Long)].collect().toSeq
    val want = skewed.groupBy("w").count().orderBy(desc("count"), col("w"))
      .limit(10).as[(String, Long)].collect().toSeq
    assert(got.map(_._1) == want.map(_._1), s"got $got want $want")
    // at this sketch width the 1775-key stream cannot collide: exact counts
    assert(got == want)
  }

  test("corpusJaccard: exact when unsaturated, ~1/sqrt(k) accurate when saturated") {
    val a = (0 until 10000).map(i => s"doc$i").toDF("k")
    val b = (5000 until 15000).map(i => s"doc$i").toDF("k")
    // saturated: 15000 distinct >> k=512; true J = 5000/15000
    val (est, used) = Sketches.corpusJaccard(a, b, col("k"), col("k"), k = 512)
    assert(used == 512)
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"est $est too far from 1/3")
    // unsaturated: sketches are complete, estimate is exact
    val a2 = (0 until 100).map(i => s"x$i").toDF("k")
    val b2 = (50 until 150).map(i => s"x$i").toDF("k")
    val (est2, used2) = Sketches.corpusJaccard(a2, b2, col("k"), col("k"), k = 4096)
    assert(used2 == 150 && est2 == 50.0 / 150.0, s"unsaturated must be exact: $est2")
    // determinism under different layouts
    val (est3, _) = Sketches.corpusJaccard(a.repartition(13), b.repartition(3),
      col("k"), col("k"), k = 512)
    assert(est3 == est)
    // disjoint and empty edges
    assert(Sketches.corpusJaccard(a2, (200 until 300).map(i => s"x$i").toDF("k"),
      col("k"), col("k"))._1 == 0.0)
    assert(Sketches.corpusJaccard(a2.where(lit(false)), b2, col("k"), col("k"))._1 == 0.0)
  }

  test("fixed seed makes the whole protocol deterministic") {
    val a = Sketches.heavyHitters(skewed, col("w"), k = 5, seed = 7)
      .as[(String, Long)].collect().toSeq
    val b = Sketches.heavyHitters(skewed.repartition(3), col("w"), k = 5, seed = 7)
      .as[(String, Long)].collect().toSeq
    assert(a == b)
  }
}
