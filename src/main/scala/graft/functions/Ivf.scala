package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the standard
  * scale path for embedding search next to LSH: partition the corpus
  * into `nLists` Voronoi cells (KMeans centroids), then answer each
  * query by scanning only its `nProbe` nearest cells.
  *
  * Scale shape: one training pass (sampled), one narrow assignment pass
  * (`model.transform` — no shuffle of vectors beyond the initial scan),
  * and per query a candidate set of ~nProbe/nLists of the corpus joined
  * by LIST-ID EQUALITY — the join key is a small int, vectors shuffle
  * once, and recall/cost trades off via nProbe with no plan change.
  * Centroids travel as a broadcast DataFrame, never as plan literals.
  */
object Ivf {

  /** Squared L2 distance between two array columns (KMeans assigns by
    * euclidean distance, so probe ranking must match its metric). */
  private[functions] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x)

  /** Exact k-NN of each query against only the probed cells.
    *
    * `trainFraction` samples the KMeans fit: centroid quality needs only
    * a representative sample, so at corpus scale the ML iterations (5
    * full passes otherwise) run over a small fraction — assignment cost
    * is unchanged and recall degrades negligibly (cells only gate
    * CANDIDATE generation; exact cosine re-ranks). Default 1.0 keeps
    * exact behavior at test SF; at 100 TB pass e.g. 1e-4.
    *
    * Cache protocol (same materialize-then-release shape as
    * [[Dedup.minhashNearDupPairs]]): the featurized corpus is persisted
    * for the duration of the call — the KMeans iterations, the
    * assignment pass and the probe join all read ONE materialized
    * array→vector conversion instead of recomputing it per consumer —
    * then released after the (small) result is captured eagerly.
    * `materialize = false` keeps full lineage and hands cache ownership
    * to the caller. */
  def ivfKnn(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      scoreDp: Int = 4, trainFraction: Double = 1.0,
      materialize: Boolean = true): DataFrame = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val spark = corpus.sparkSession

    val featurized = corpus.withColumn("__fv", array_to_vector(col(vecCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // few iterations suffice: cells only gate CANDIDATE generation (exact
    // cosine re-ranks); extra KMeans convergence buys little recall
    val trainSet =
      if (trainFraction >= 1.0) featurized
      else featurized.sample(withReplacement = false, trainFraction, seed)
    // random init, not k-means|| : the parallel init runs several extra
    // distributed passes to seed centroids, but cells only GATE candidate
    // generation here (exact cosine re-ranks), so cheap seeds suffice
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("__fv").setPredictionCol("__list")
      .fit(trainSet)
    val assigned = model.transform(featurized)
      .select(col(idCol), col(vecCol), col("__list"))

    // centroids as data (tiny: nLists rows), broadcast into the probe rank
    val centroids = spark.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("__list", "__centroid")
    val probeW = Window.partitionBy(col(qidCol)).orderBy(col("__cdist"), col("__list"))
    val probes = queries.select(col(qidCol), col(qvecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("__cdist", sqDist(col(qvecCol), col("__centroid")))
      .withColumn("__crank", row_number().over(probeW))
      .where(col("__crank") <= nProbe)
      .select(col(qidCol), col(qvecCol), col("__list"))

    val scored = probes.join(assigned, "__list")
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol),
        round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), scoreDp).as("cos"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cos").desc, col(idCol))
    val result = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    if (!materialize) result
    else {
      val out = result.localCheckpoint(true) // result is small: k rows per query
      featurized.unpersist(blocking = false)
      out
    }
  }
}
