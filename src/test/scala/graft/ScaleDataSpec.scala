package graft

import org.apache.spark.sql.functions._

/** ScaleData invariants: key-offset replication must keep join fan-outs
  * 1:1 (every FK follows its PK's offset), refuse already-scaled input
  * (ADVICE r15: keys ≥ the offset would silently collide across
  * replicas), and honor the table filter. */
class ScaleDataSpec extends SparkSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("scaledata").toString

  test("replication offsets PKs and FKs together — join fan-out stays 1:1") {
    val out = tmpDir()
    graft.tools.ScaleData.generate(spark, sf0001, out, reps = 3,
      only = Set("orders", "customer"))
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    assert(o.count() == 3 * src.count(), "3 replicas of orders")
    // every order still matches exactly one customer (no cross-replica
    // fan-out: FK offset rides with the PK offset)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
    assert(joined.count() == o.count(),
      "each replicated order must join exactly its replica's customer")
    // replica 2 keys live in [2*OFF, 3*OFF)
    val r2 = o.where(col("o_orderkey") >= 20000000L &&
      col("o_orderkey") < 30000000L).count()
    assert(r2 == src.count(), s"replica-2 band holds one full copy, got $r2")
  }

  test("already-scaled input is refused (key >= offset would collide)") {
    val out = tmpDir()
    graft.tools.ScaleData.generate(spark, sf0001, out, reps = 2,
      only = Set("supplier"))
    val e = intercept[IllegalArgumentException] {
      graft.tools.ScaleData.generate(spark, out, tmpDir(), reps = 2,
        only = Set("supplier"))
    }
    assert(e.getMessage.contains("already"),
      s"error must name the already-scaled suspicion: ${e.getMessage}")
  }

  test("table filter writes only the named tables") {
    val out = tmpDir()
    graft.tools.ScaleData.generate(spark, sf0001, out, reps = 2,
      only = Set("embeddings"))
    val files = new java.io.File(out).list().toSet
    assert(files == Set("embeddings.parquet"),
      s"only embeddings should be written, got $files")
  }
}
