package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Source loaders beyond what the oracle queries exercise: the
  * catalog-table path (reference ValidatorTable.scala:228-261), csv/json
  * readers, and scan-level condition pushdown. */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("hiveTable reads catalog tables (temp view and saved table)") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").createOrReplaceTempView("graft_src_view")
    val viaView = Sources.hiveTable(spark, "graft_src_view", condition = Some("id > 1"))
    assert(viaView.collect().map(_.getString(1)).toSeq == Seq("b"))

    spark.sql("DROP TABLE IF EXISTS graft_src_tbl")
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "name")
      .write.mode("overwrite").saveAsTable("graft_src_tbl")
    val viaTable = Sources.hiveTable(spark, "graft_src_tbl", condition = Some("id >= 2"))
    assert(viaTable.count() == 2)
    spark.sql("DROP TABLE graft_src_tbl")
  }

  test("csv and json loaders round-trip with options") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    df.write.mode("overwrite").json(s"$dir/j")
    val csv = Sources.csv(spark, s"$dir/c",
      Map("header" -> "true", "inferSchema" -> "true"), condition = Some("id = 2"))
    assert(csv.collect().map(_.getAs[String]("name")).toSeq == Seq("beta"))
    val json = Sources.json(spark, s"$dir/j")
    assert(json.count() == 2)
  }

  test("writePartitioned: one file per partition value, sharding splits big partitions") {
    import java.nio.file.{Files, Paths}
    val docs = Sources.table(spark, sf0001, "documents")
    val out = Files.createTempDirectory("graft_pw").toString

    def filesPerPartition(base: String): Map[String, Int] = {
      val root = Paths.get(base)
      val dirs = Files.list(root).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
        .filter(p => p.getFileName.toString.startsWith("lang="))
        .map { p =>
          val n = Files.list(p).iterator()
          var c = 0
          while (n.hasNext) { if (n.next().toString.endsWith(".parquet")) c += 1 }
          p.getFileName.toString -> c
        }.toMap
    }

    Sources.writePartitioned(docs, s"$out/one", Seq("lang"))
    val one = filesPerPartition(s"$out/one")
    assert(one.nonEmpty && one.values.forall(_ == 1),
      s"expected exactly one file per lang partition, got $one")
    assert(spark.read.parquet(s"$out/one").count() == docs.count())

    Sources.writePartitioned(docs, s"$out/sharded", Seq("lang"), shardsPerPartition = 3)
    val sharded = filesPerPartition(s"$out/sharded")
    assert(sharded.values.forall(c => c >= 1 && c <= 3),
      s"expected 1..3 files per partition, got $sharded")
    assert(sharded.values.exists(_ > 1), s"salt never split a partition: $sharded")
    assert(spark.read.parquet(s"$out/sharded").count() == docs.count())

    // partition pruning: a lang filter must become a PartitionFilter, and
    // the shard column must not leak into the read schema
    val pruned = spark.read.parquet(s"$out/one").where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang filter did not prune partitions:\n$plan")
    assert(!pruned.columns.contains("__shard"))
  }

  test("condition reaches the parquet scan as a pushed filter") {
    val plan = Sources.parquet(spark, s"$sf0001/lineitem.parquet",
        condition = Some("l_orderkey = 1"))
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"),
      s"filter not pushed into scan:\n$plan")
    // column pruning: the scan reads only the projected columns
    assert(plan.contains("ReadSchema") && plan.contains("l_quantity") &&
      !plan.contains("l_comment"), "projection not pruned at scan")
  }

  test("co-bucketed tables join without an exchange (the pre-shuffled fact join)") {
    import org.apache.spark.sql.functions.col
    val base = "/root/repo/target/fixtures/bucketed"
    Sources.writeBucketed(Sources.table(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity"),
      "graft_li_bkt", s"$base/li", Seq("l_orderkey"), numBuckets = 4)
    Sources.writeBucketed(Sources.table(spark, sf0001, "orders")
        .select(col("o_orderkey"), col("o_totalprice")),
      "graft_ord_bkt", s"$base/ord", Seq("o_orderkey"), numBuckets = 4)
    // disable broadcast so the join must pick a distribution-requiring
    // strategy — bucketing must satisfy it without an Exchange
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Sources.hiveTable(spark, "graft_li_bkt")
        .join(Sources.hiveTable(spark, "graft_ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
