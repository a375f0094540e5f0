package graft.functions

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over embedding columns, shaped for a
  * 100 TB corpus:
  *
  *   1. The d×d sample covariance is ONE scan — each row expands to its
  *     upper-triangle (i, j, xᵢ·xⱼ, xᵢ, xⱼ) products in-scan (nested
  *     `transform` HOFs, no self-join) and partial aggregation collapses
  *     them map-side, so the exchange carries at most d(d+1)/2 rows per
  *     partition regardless of corpus size. Centering uses the
  *     E[xy] − E[x]E[y] identity so means need no separate pass.
  *   2. Eigendecomposition runs on the DRIVER over the collected d×d
  *     matrix (cyclic Jacobi rotations — the textbook symmetric-matrix
  *     method, e.g. Golub & Van Loan, Matrix Computations §8.5). The
  *     collect is bounded by d² (64-dim → 4 KB), the same
  *     bounded-driver-step discipline as DataPrep's IPF raking.
  *   3. Projection broadcasts the top-k component matrix as a literal
  *     and is pure in-scan HOF algebra — map-only, zero shuffles, the
  *     corpus never moves.
  *
  * Eigenvector sign is canonicalised (largest-|entry| coordinate made
  * positive) so results are deterministic across partitionings and
  * engines.
  */
object Pca {

  /** Upper-triangle sample covariance entries of a d-dim array column as
    * a DataFrame (i, j, n, cov) with 0-based i <= j — the auditable /
    * oracle-checkable face of the one-scan covariance pass. Rows whose
    * vector is null or not exactly `dim` long are dropped. */
  /** The one-scan flat moment pass shared by the public faces: each
    * row expands to its d(d+1)/2 upper-triangle PRODUCTS followed by
    * its d raw values (row-major: slot k < P is xᵢ·xⱼ for the k-th
    * (i, j) pair, slot P+i is xᵢ), as ONE flat double array — no
    * structs, no per-element (i, j) tags. The slot index IS the
    * identity, recovered by arithmetic afterwards; the struct-tagged
    * variant of this pass measured 2.2× slower at sf0.1 (r11
    * in-session; 4.5s vs 2.0s —
    * tagging every element triples the exploded row width and defeats
    * the scalar codegen, the ngramDiversity lesson again). Output:
    * (k, n, s) with map-side combine capping the exchange at
    * P + d rows per partition. */
  private def momentsFlat(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol)
    val prods = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        element_at(v, i + 1).cast("double") *
          element_at(v, j + 1).cast("double"))))
    df.where(v.isNotNull && size(v) === dim)
      .select(posexplode(concat(prods,
        transform(v, x => x.cast("double")))).as(Seq("k", "p")))
      .groupBy("k").agg(count(lit(1L)).as("n"), sum(col("p")).as("s"))
  }

  /** Row-major upper-triangle slot of (i, j), 0-based i <= j. */
  private def slotOf(i: Int, j: Int, dim: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  def covarianceUpper(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val p = dim * (dim + 1) / 2
    val m = momentsFlat(df, vecCol, dim)
    val mapping = df.sparkSession.createDataFrame(
        for (i <- 0 until dim; j <- i until dim)
          yield (slotOf(i, j, dim), i, j))
      .toDF("k", "i", "j")
    val means = m.where(col("k") >= p)
      .select((col("k") - p).as("__mi"), col("s").as("__sv"))
    m.where(col("k") < p)
      .join(broadcast(mapping), Seq("k"))
      .join(broadcast(means.toDF("i", "__si")), Seq("i"))
      .join(broadcast(means.toDF("j", "__sj")), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        // sample covariance needs n >= 2 (NULL otherwise — ANSI division
        // by the zero n−1 would throw, the heapsFit guard discipline)
        when(col("n") > 1,
          (col("s") - col("__si") * col("__sj") / col("n")) /
            (col("n") - 1)).as("cov"))
  }

  /** The full symmetric d×d sample covariance AND the per-dim means,
    * both from the SAME one-scan flat moment pass (the tail slots carry
    * Σxᵢ), collected to the driver — bounded by d², never by corpus
    * size, exactly one job. */
  private def covarianceAndMeans(df: DataFrame, vecCol: String,
      dim: Int): (Array[Array[Double]], Array[Double]) = {
    val p = dim * (dim + 1) / 2
    val rows = momentsFlat(df, vecCol, dim).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n"), r.getAs[Double]("s"))).toMap
    // fail loudly (the ridgeRegression discipline) instead of a map
    // NoSuchElementException on an empty/all-invalid corpus or NaN
    // covariances from the n-1 divisor at n=1
    require(rows.nonEmpty,
      s"PCA: no valid $dim-dim vectors in column '$vecCol'")
    require(rows(p)._1 >= 2,
      s"PCA needs at least 2 valid vectors, got ${rows(p)._1}")
    val means = Array.tabulate(dim)(i => rows(p + i)._2 / rows(p + i)._1)
    val a = Array.fill(dim, dim)(0.0)
    for (i <- 0 until dim; j <- i until dim) {
      val (n, sxy) = rows(slotOf(i, j, dim))
      val c = (sxy - rows(p + i)._2 * rows(p + j)._2 / n) / (n - 1)
      a(i)(j) = c; a(j)(i) = c
    }
    (a, means)
  }

  /** The full symmetric d×d sample covariance, collected to the driver
    * (bounded by d², never by corpus size). */
  def covarianceMatrix(df: DataFrame, vecCol: String,
      dim: Int): Array[Array[Double]] =
    covarianceAndMeans(df, vecCol, dim)._1

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending, eigenvector signs canonicalised (the coordinate of
    * largest absolute value is positive). Driver-side, O(d³) per sweep —
    * intended for the ≤ few-hundred-dim covariance of an embedding
    * column, not for data-sized matrices. */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    require(d >= 1 && m.forall(_.length == d), "matrix must be square")
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    // scale tolerance by the matrix magnitude so an all-tiny matrix
    // converges immediately instead of chasing absolute 1e-12
    val scale = math.max(1e-300, m.map(_.map(math.abs).max).max)
    var sweep = 0
    while (sweep < maxSweeps && math.sqrt(off()) > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol * scale * 1e-3) {
            // Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // canonical sign: largest-|entry| coordinate positive
      val amax = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(amax) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** Fitted top-k PCA model: per-dim means, eigenvalues (all d, desc),
    * and the k leading components (rows). */
  final case class PcaModel(means: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def k: Int = components.length
    def dim: Int = means.length
    /** Explained-variance summary, one row per kept component. */
    def explained(dp: Int = 6): Seq[(Int, Double, Double, Double)] = {
      val tot = eigenvalues.sum
      var cum = 0.0
      (0 until k).map { c =>
        cum += eigenvalues(c)
        def r(x: Double) = BigDecimal(x).setScale(dp,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        (c, r(eigenvalues(c)), r(eigenvalues(c) / tot), r(cum / tot))
      }
    }
  }

  /** Fit a top-`k` PCA on the covariance of `vecCol` — exactly ONE job:
    * covariance and means both come from the shared moment pass, the
    * eigen step is bounded driver work. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val (cov, means) = covarianceAndMeans(df, vecCol, dim)
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(means, evals, evecs.take(k))
  }

  /** Diagonal-covariance Mahalanobis² outlier score:
    * Σᵢ (xᵢ − μᵢ)² / σᵢ² over dims with σᵢ² > 0 (dead dims contribute 0 —
    * a constant coordinate carries no outlier signal). The O(n·d)
    * one-scan complement of kNN-distance outliers (O(n²·d)): per-dim
    * stats are ONE bounded aggregation (d rows collected — the IPF
    * bounded-driver-step discipline), then scoring ships them as
    * literals and is map-only; at 100 TB the corpus never shuffles.
    * Null / wrong-dimension vectors score null. */
  def diagMahalanobis(df: DataFrame, vecCol: String, dim: Int,
      out: String = "maha2"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol)
    val stats = df.where(v.isNotNull && size(v) === dim)
      .select(posexplode(v).as(Seq("__pos", "__x")))
      .groupBy("__pos")
      .agg(avg(col("__x").cast("double")).as("__m"),
        var_samp(col("__x").cast("double")).as("__s2"))
      .collect().map(r => r.getAs[Int]("__pos") ->
        (r.getAs[Double]("__m"), r.getAs[Double]("__s2"))).toMap
    val means = typedLit((0 until dim).map(i => stats(i)._1))
    val vars = typedLit((0 until dim).map(i => stats(i)._2))
    val score = aggregate(
      zip_with(v, sequence(lit(0), lit(dim - 1)), (x, i) => {
        val m = element_at(means, i + 1)
        val s2 = element_at(vars, i + 1)
        val d0 = x.cast("double") - m
        when(s2 > 0.0, d0 * d0 / s2).otherwise(lit(0.0))
      }), lit(0.0), (acc, x) => acc + x)
    df.withColumn(out, when(v.isNotNull && size(v) === dim, score))
  }

  /** Project `vecCol` onto a fitted model: out[c] = Σᵢ (xᵢ − μᵢ)·W[c][i].
    * The model ships as literals — map-only, zero shuffles. Rows whose
    * vector is null / wrong-dimension project to null. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      out: String = "pca"): DataFrame = {
    val v = col(vecCol)
    val means = typedLit(model.means.toSeq)
    val comps = typedLit(model.components.map(_.toSeq).toSeq)
    val proj = transform(sequence(lit(0), lit(model.k - 1)), c => {
      val w = element_at(comps, c + 1)
      aggregate(zip_with(v, sequence(lit(0), lit(model.dim - 1)), (x, i) =>
        (x.cast("double") - element_at(means, i + 1)) *
          element_at(w, i + 1)),
        lit(0.0), (acc, x) => acc + x)
    })
    df.withColumn(out,
      when(v.isNotNull && size(v) === model.dim, proj))
  }

  /** PCA-whitened projection: [[project]] with each component scaled by
    * 1/√λ, so the output coordinates have unit variance and zero
    * cross-covariance — the standard conditioning step before
    * cosine/Euclidean retrieval on anisotropic embeddings (dominant
    * directions stop swamping the metric). Components whose eigenvalue
    * is ≤ `eps` are DROPPED (scaling a zero-variance direction by 1/√λ
    * amplifies numeric noise unboundedly); same map-only, zero-shuffle
    * shape as [[project]]. */
  def whiten(df: DataFrame, vecCol: String, model: PcaModel,
      out: String = "white", eps: Double = 1e-12): DataFrame = {
    val kept = (0 until model.k).filter(c => model.eigenvalues(c) > eps)
    require(kept.nonEmpty, "no component has variance above eps")
    val scaled = model.copy(
      eigenvalues = kept.map(model.eigenvalues).toArray,
      components = kept.map(c => model.components(c).map(
        _ / math.sqrt(model.eigenvalues(c)))).toArray)
    project(df, vecCol, scaled, out)
  }
}
