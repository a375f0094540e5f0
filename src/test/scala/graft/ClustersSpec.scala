package graft

import graft.functions.Clusters
import org.apache.spark.sql.functions._

/** Near-dup pair → cluster resolution (Clusters.connectedComponents /
  * dropNearDupMembers): exact component assignments on known graphs —
  * through BOTH the in-driver union-find gate and the distributed
  * doubling loop — pointer-doubling convergence on an adversarial
  * chain, and the keep-min / drop-rest dedup semantics. */
class ClustersSpec extends SparkSuite {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)], maxIter: Int = 25,
      localEdgeLimit: Long = 1L << 20) =
    Clusters.connectedComponents(
        pairs.toDF("id_a", "id_b"), "id_a", "id_b", maxIter, localEdgeLimit)
      .as[(Long, Long)].collect().toMap

  // every exact-assignment case runs through both resolution paths: the
  // size gate must never change the labels
  private val bothPaths = Seq("local" -> (1L << 20), "distributed" -> 0L)

  test("components of a forest: chain + triangle + isolated pair") {
    // 1-2-3 chain, {10,11,12} triangle, 20-21 pair; transitive closure
    // must label every member with its component's minimum
    for ((path, limit) <- bothPaths) {
      val got = components(Seq(
        (2L, 1L), (2L, 3L),
        (10L, 11L), (11L, 12L), (10L, 12L),
        (21L, 20L)), localEdgeLimit = limit)
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L),
        s"path=$path")
    }
  }

  test("bridging edge merges two clusters transitively") {
    // two far-apart clusters joined by one edge: min label must cross it
    for ((path, limit) <- bothPaths) {
      val got = components(Seq((5L, 6L), (100L, 101L), (6L, 100L)),
        localEdgeLimit = limit)
      assert(got.values.toSet == Set(5L), s"one component, global min ($path)")
      assert(got.keySet == Set(5L, 6L, 100L, 101L), s"path=$path")
    }
  }

  test("local and distributed resolution agree on a random graph with self-loops") {
    val rnd = new scala.util.Random(4242L)
    // self-loops stay IN: both paths must drop them identically — a node
    // appearing only in a self-loop is absent from the result on either
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
      Seq((500L, 500L))
    val local = components(pairs)
    val dist = components(pairs, localEdgeLimit = 0L)
    assert(local == dist, "size gate changed component labels")
    assert(!local.contains(500L), "self-loop-only node must not appear")
  }

  test("null endpoints are dropped identically by both paths") {
    val pairs = Seq((Some(1L), Some(2L)), (None, Some(7L)), (Some(8L), None))
      .toDF("id_a", "id_b")
    for ((path, limit) <- bothPaths) {
      val got = Clusters.connectedComponents(pairs, "id_a", "id_b",
          localEdgeLimit = limit)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L),
        s"null-endpoint rows must vanish, nodes 7/8 with them ($path): $got")
    }
  }

  test("localEdgeLimit at or above Int.MaxValue is rejected") {
    val e = intercept[IllegalArgumentException] {
      components(Seq((1L, 2L)), localEdgeLimit = Int.MaxValue.toLong)
    }
    assert(e.getMessage.contains("Int.MaxValue"))
  }

  test("adversarial chain converges in logarithmic rounds (pointer doubling)") {
    // a 512-node path is the worst case for plain propagation (O(n)
    // rounds); with label-pointer doubling the reached distance compounds
    // geometrically, so 15 rounds must suffice (2^15 >> 512). Descending
    // ids make the min label start at the FAR end of the chain. Forced
    // through the distributed loop — the chain is what the doubling
    // bound is about.
    val n = 512
    val chain = (1 until n).map(i => ((n - i).toLong, (n - i - 1).toLong))
    val got = components(chain, maxIter = 15, localEdgeLimit = 0L)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every node labeled with the chain min")
  }

  test("round cap throws rather than returning half-merged clusters") {
    val chain = (0 until 200).map(i => (i.toLong, (i + 1).toLong))
    val e = intercept[IllegalStateException] {
      components(chain, maxIter = 2, localEdgeLimit = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty pair list yields an empty (schema-correct) result") {
    for ((path, limit) <- bothPaths) {
      val empty = Clusters.connectedComponents(
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b",
        localEdgeLimit = limit)
      assert(empty.columns.toSeq == Seq("id", "component"), s"path=$path")
      assert(empty.count() == 0, s"path=$path")
    }
  }

  test("dropNearDupMembers keeps the min id per cluster and all non-members") {
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // clusters {1,3,5} and {6,7}; 0,2,4,8,9 in no pair
    val pairs = Seq((3L, 1L), (3L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val kept = Clusters.dropNearDupMembers(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 8L, 9L))
  }
}
