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

  test("fixed seed makes the whole protocol deterministic") {
    val a = Sketches.heavyHitters(skewed, col("w"), k = 5, seed = 7)
      .as[(String, Long)].collect().toSeq
    val b = Sketches.heavyHitters(skewed.repartition(3), col("w"), k = 5, seed = 7)
      .as[(String, Long)].collect().toSeq
    assert(a == b)
  }
}
