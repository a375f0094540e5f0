package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Vectors are `array<float>` columns; all math is done in double via
  * higher-order functions (`zip_with` + `aggregate`) — codegen-friendly,
  * no UDFs, no driver-side vectors except the (small) query set, which is
  * broadcast.
  */
object Similarity {

  /** Σ a_i * b_i in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact k-NN of each query vector against the corpus: broadcast the
    * (small) query set, score all corpus rows, per-query top-k.
    * O(|corpus| * |queries| * dim) compute, ZERO shuffles of the corpus —
    * the only exchange is the top-k window on (query, score), and
    * WindowGroupLimit keeps per-partition heaps of size k. */
  def bruteForceKnn(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      scoreDp: Int = 4): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol),
        round(cosine(col(vecCol), col(qvecCol)), scoreDp).as("cos"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: bit j = sign(dot(v, plane_j)).
    * Planes are deterministic pseudo-random literals baked into the plan
    * (seeded driver-side), so the bucketing is reproducible and the
    * executor-side work is pure column math. */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Column] = (0 until numPlanes).map { _ =>
      array((0 until dim).map(_ => lit(rnd.nextGaussian())): _*)
    }
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, p) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate NN self-join via multi-table hyperplane LSH: `numTables`
    * independent hash tables of `numPlanes` bits each; vectors sharing a
    * (table, bucket) key are candidates, deduplicated, then ranked by
    * exact cosine. Recall ≈ 1-(1-p^numPlanes)^numTables with
    * p = 1 - θ/π — tune tables up / planes down for higher recall.
    * Shuffles carry only (id, table, bucket) triples and candidate id
    * pairs — never vector pairs; vectors are joined back once per
    * distinct candidate pair. */
  def annSelfJoin(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int, k: Int, numTables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val tb = explode(array((0 until numTables).map(t => struct(
      lit(t).as("tbl"),
      hyperplaneBucket(col(vecCol), dim, numPlanes, seed + t * 7919).as("bucket"))): _*))
    val bucketed = corpus.select(col(idCol), tb.as("tb"))
      .select(col(idCol), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cands = bucketed.toDF("id_a", "tbl", "bucket")
      .join(bucketed.toDF("id_b", "tbl", "bucket"), Seq("tbl", "bucket"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = corpus.select(col(idCol), col(vecCol))
    val scored = cands
      .join(vecs.toDF("id_a", "vec_a"), "id_a")
      .join(vecs.toDF("id_b", "vec_b"), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
