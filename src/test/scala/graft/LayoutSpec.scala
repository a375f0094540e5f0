package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: interleave arithmetic vs an independent bit-twiddling
  * reference, and the data-skipping payoff measured from real written
  * files' stats — the clustered layout must keep per-file ranges tight
  * on BOTH dimensions where a single-column sort only manages one. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: textbook per-bit Morton interleave. */
  private def mortonRef(buckets: Seq[Long], bits: Int): Long = {
    val n = buckets.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((buckets(j) >> i) & 1L) << (i * n + (n - 1 - j))
    z
  }

  test("interleave matches the reference morton code on random bucket ids") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(Layout.interleave(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].collect()
    val want = rows.map { case (a, b, c) => mortonRef(Seq(a, b, c), 8) }
    assert(got.toSeq == want)
    // head column owns the MSB: bucket ids (max, 0) beat (0, max)
    val Seq(hi, lo) = Seq((255L, 0L), (0L, 255L)).toDF("a", "b")
      .select(Layout.interleave(Seq(col("a"), col("b")), 8).as("z"))
      .as[Long].collect().toSeq
    assert(hi > lo)
  }

  test("rangeBucket: full [lo,hi] span maps onto [0, 2^bits) with nulls at 0") {
    val df = Seq[Option[Long]](Some(0L), Some(999L), Some(500L), None).toDF("v")
    val got = df.select(
      Layout.rangeBucket(col("v"), lit(0L), lit(999L), 8).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 255L, 128L, 0L))
  }

  test("z-order layout keeps per-file ranges tight on BOTH columns; 1-col sort does not") {
    val dir = Files.createTempDirectory("graft-layout").toFile
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    Layout.zorderWrite(li, s"$dir/z", Seq("l_partkey", "l_suppkey"), numFiles = 8, bits = 8)
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.parquet(s"$dir/sorted")

    def maxSpreadFraction(path: String): (Double, Double) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("p_lo"), max("l_partkey").as("p_hi"),
          min("l_suppkey").as("s_lo"), max("l_suppkey").as("s_hi"),
          count(lit(1)).as("n"))
        .collect()
      assert(stats.length == 8, s"expected 8 files, got ${stats.length}")
      val (pAll, sAll) = {
        val g = spark.read.parquet(path)
          .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
          .head()
        ((g.getLong(1) - g.getLong(0)).toDouble, (g.getLong(3) - g.getLong(2)).toDouble)
      }
      val pFrac = stats.map(r =>
        (r.getAs[Long]("p_hi") - r.getAs[Long]("p_lo")) / pAll).sum / stats.length
      val sFrac = stats.map(r =>
        (r.getAs[Long]("s_hi") - r.getAs[Long]("s_lo")) / sAll).sum / stats.length
      (pFrac, sFrac)
    }

    val (zp, zs) = maxSpreadFraction(s"$dir/z")
    val (sp, ss) = maxSpreadFraction(s"$dir/sorted")
    // single-col sort: near-perfect on the sort key, useless on the other
    assert(sp < 0.3, s"sorted layout partkey spread $sp")
    assert(ss > 0.8, s"sorted layout suppkey spread $ss should be ~full range")
    // z-order: BOTH dimensions bounded well below the full range
    assert(zp < 0.6, s"z layout partkey spread $zp")
    assert(zs < 0.75, s"z layout suppkey spread $zs")
    assert(math.max(zp, zs) < math.max(sp, ss) - 0.2,
      s"z worst-dim $zp/$zs must beat sort's $sp/$ss")

    // the payoff a stats-aware reader sees: a narrow suppkey predicate
    // prunes files under z-order, none under the suppkey-blind sort
    val sHi = spark.read.parquet(s"$dir/z").agg(max("l_suppkey")).head().getLong(0)
    val (zf, zPrun) = Layout.skippableFiles(
      spark.read.parquet(s"$dir/z"), "l_suppkey", 0L, sHi / 8)
    val (ff, fPrun) = Layout.skippableFiles(
      spark.read.parquet(s"$dir/sorted"), "l_suppkey", 0L, sHi / 8)
    assert(zf == 8 && ff == 8)
    assert(zPrun >= 3, s"z layout should skip >=3/8 files, skipped $zPrun")
    assert(fPrun == 0, s"suppkey-blind sort can skip nothing, skipped $fPrun")
  }

  test("rangeSortedAudit: full accounting, zero inversions, disjoint monotone shard ranges") {
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 100000).toDouble)
      .toDF("k").repartition(7) // scrambled input layout
    val m = Layout.rangeSortedAudit(df, "k", numShards = 8)
      .orderBy("min_key").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(m.map(_._1).sum == 10000, "every row accounted for")
    assert(m.forall(_._4 == 0L), s"in-shard inversions: ${m.toSeq}")
    // shard ranges are disjoint and monotone
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"overlapping shard ranges: $a then $b")
    case _ => () }
    assert(m.length <= 8 && m.length >= 2)
    // nulls are excluded from the audit, not silently counted
    val withNulls = (Seq[Option[Double]](None, None) ++ (1 to 50).map(i => Some(i.toDouble)))
      .toDF("k")
    assert(Layout.rangeSortedAudit(withNulls, "k", 2)
      .agg(sum("n_rows")).head().getLong(0) == 50)
  }

  test("shardAudit: detects disorder in an existing layout; read-back export re-verifies") {
    // deliberately unsorted single partition: the counter must SEE it
    val messy = Seq(5.0, 1.0, 4.0, 2.0, 3.0).toDF("k").coalesce(1)
    val bad = Layout.shardAudit(messy, "k").head()
    assert(bad.getLong(4) > 0, s"physical disorder must surface: $bad")
    // a written sorted export read back audits clean
    val dir = Files.createTempDirectory("audit").toString
    (1 to 2000).map(i => ((i * 48271) % 7919).toDouble).toDF("k")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$dir/x")
    val back = Layout.shardAudit(spark.read.parquet(s"$dir/x"), "k")
    assert(back.agg(sum("inversions")).head().getLong(0) == 0,
      "a sorted export must read back in order (parquet preserves row order per file)")
    assert(back.agg(sum("n_rows")).head().getLong(0) == 2000)
  }
}
