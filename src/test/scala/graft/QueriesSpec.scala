package graft

/** Smoke: every SparkEntry query runs on sf0.001 and yields rows, and every
  * oracle key has a matching query (driver contract). */
class QueriesSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001 with rows >= 1") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 1, s"$name returned no rows")
    }
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(0L).as("k"),
        col("id").as("v"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = graft.ops.Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.orderBy("name").collect().toSeq == plain.orderBy("name").collect().toSeq)
  }
}
