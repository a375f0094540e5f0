package graft

import graft.functions.Pca
import org.apache.spark.sql.functions._

/** PCA semantics not pinned by the DuckDB covariance oracle: the driver
  * Jacobi eigen step (hand-computed 2×2, invariants on a seeded random
  * symmetric matrix) and the broadcast projection (projected variance =
  * eigenvalue, component orthonormality, null/ragged-row contract). */
class PcaSpec extends SparkSuite {

  private def closeTo(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("jacobiEigen: hand-computed 2x2 and identity fixtures") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; eigenvectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (ev, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(closeTo(ev(0), 3.0) && closeTo(ev(1), 1.0), ev.toSeq.toString)
    val s = 1.0 / math.sqrt(2.0)
    assert(closeTo(vecs(0)(0), s) && closeTo(vecs(0)(1), s), vecs(0).toSeq.toString)
    // canonical sign: largest-|entry| coordinate positive (first here)
    assert(closeTo(vecs(1)(0), s) && closeTo(vecs(1)(1), -s), vecs(1).toSeq.toString)
    // diagonal matrix: eigenvalues are the diagonal, sorted desc
    val (ev2, vecs2) = Pca.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(ev2.toSeq == Seq(5.0, 3.0, 1.0))
    assert(vecs2(0).toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("jacobiEigen invariants on a seeded random symmetric 8x8: A v = lambda v, orthonormal, trace") {
    val rnd = new scala.util.Random(7L)
    val d = 8
    val m = Array.fill(d, d)(0.0)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2.0 - 1.0
      m(i)(j) = x; m(j)(i) = x
    }
    val (ev, vecs) = Pca.jacobiEigen(m)
    // eigen pairs: ||A v - lambda v|| small
    for (c <- 0 until d) {
      val av = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * vecs(c)(j)).sum)
      val res = math.sqrt((0 until d).map(i => math.pow(av(i) - ev(c) * vecs(c)(i), 2)).sum)
      assert(res < 1e-8, s"component $c residual $res")
    }
    // orthonormal rows
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
      assert(closeTo(dot, if (a == b) 1.0 else 0.0, 1e-9), s"dot($a,$b)=$dot")
    }
    // eigenvalue sum = trace; sorted descending
    assert(closeTo(ev.sum, (0 until d).map(i => m(i)(i)).sum, 1e-9))
    assert(ev.toSeq == ev.toSeq.sortBy(-_))
  }

  test("covarianceUpper matches straight-line recomputation; n=1 gives NULL not ANSI error") {
    import spark.implicits._
    val rows = Seq(
      Seq(1.0f, 2.0f, 0.0f), Seq(3.0f, 0.0f, 1.0f),
      Seq(-1.0f, 4.0f, 2.0f), Seq(0.0f, 1.0f, -2.0f))
    val df = rows.toDF("v")
    val got = Pca.covarianceUpper(df, "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val cols = (0 until 3).map(i => rows.map(_(i).toDouble))
    def cov(a: Seq[Double], b: Seq[Double]): Double = {
      val (ma, mb) = (a.sum / a.size, b.sum / b.size)
      a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / (a.size - 1)
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(closeTo(got((i, j)), cov(cols(i), cols(j)), 1e-12), s"cov($i,$j)")
    // ragged / null rows dropped, not poisoning the matrix
    val ragged = (rows :+ Seq(9.0f)).toDF("v")
      .union(Seq(Option.empty[Seq[Float]]).toDF("v"))
    val got2 = Pca.covarianceUpper(ragged, "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(closeTo(got2((0, 1)), cov(cols(0), cols(1)), 1e-12))
    // single-row corpus: cov is NULL (guarded), no ANSI divide error
    val one = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    assert(Pca.covarianceUpper(one, "v", 3).collect().forall(_.isNullAt(3)))
  }

  test("fit + project on sf0.001 embeddings: projected variance tracks eigenvalues, components decorrelate") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64, k = 4)
    // eigenvalues descending, all >= 0 (covariance is PSD)
    assert(model.eigenvalues.toSeq == model.eigenvalues.toSeq.sortBy(-_))
    assert(model.eigenvalues.forall(_ >= -1e-9))
    val proj = Pca.project(emb, "embedding", model, "pca")
    val stats = proj.select((0 until 4).map(c =>
      var_samp(element_at(col("pca"), c + 1)).as(s"v$c")) ++
      Seq(covar_samp(element_at(col("pca"), 1),
        element_at(col("pca"), 2)).as("c01")): _*).head()
    // variance of projection c == eigenvalue c (definition of PCA)
    for (c <- 0 until 4)
      assert(closeTo(stats.getDouble(c), model.eigenvalues(c), 1e-6),
        s"var($c)=${stats.getDouble(c)} vs ${model.eigenvalues(c)}")
    // distinct components are uncorrelated in the projected space
    assert(math.abs(stats.getDouble(4)) < 1e-6)
    // explained ratios are cumulative and end below/at 1
    val ex = model.explained()
    assert(ex.map(_._4) == ex.map(_._4).sorted && ex.last._4 <= 1.0)
    // null / ragged vectors project to null
    import spark.implicits._
    val bad = Seq(Seq(1.0f)).toDF("embedding")
    assert(Pca.project(bad, "embedding", model, "pca").head().isNullAt(1))
  }

  test("whiten: unit variance and zero cross-covariance in the whitened space; dead components dropped") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64, k = 3)
    val w = Pca.whiten(emb, "embedding", model, "w")
    val stats = w.select(
      (0 until 3).map(c => var_samp(element_at(col("w"), c + 1)).as(s"v$c")) ++
        Seq(covar_samp(element_at(col("w"), 1), element_at(col("w"), 2)).as("c01")): _*)
      .head()
    for (c <- 0 until 3)
      assert(math.abs(stats.getDouble(c) - 1.0) < 1e-6, s"var($c)=${stats.getDouble(c)}")
    assert(math.abs(stats.getDouble(3)) < 1e-6)
    // a zero-variance component is dropped, not 1/sqrt(0)-amplified
    val degenerate = model.copy(eigenvalues = Array(model.eigenvalues(0), 0.0, 0.0))
    val w2 = Pca.whiten(emb, "embedding", degenerate, "w")
    assert(w2.select(org.apache.spark.sql.functions.size(col("w"))).head().getInt(0) == 1)
  }
}
