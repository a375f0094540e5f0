package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** r17 (VERDICT r16 #5): the exact→ANN bitext switch's recall, measured
  * — not hoped. Two claims, separately pinned:
  *
  *  1. PLANTED-pair recall at the production setting is 1.0, and
  *     structurally so: an exact clone gets the identical IVF cell
  *     (same argmin, same tie-break) and every vector's rank-1 probe
  *     is its own cell, so clone pairs always meet in the candidate
  *     stream. This is the pair class bitext mining exists for (true
  *     translation pairs are the HIGH-cosine outliers), and it is the
  *     `sim_bitext_recall` oracle anchor's claim.
  *
  *  2. ORGANIC-pair recall (every pair the exact scan mines, most of
  *     them borderline-margin pairs of this fixture's isotropic
  *     vectors) tracks the probed cell share — the measured curve at
  *     sf0.1 (nLists=45): nProbe 5→0.44, 9→0.59, 16→0.74, 23→0.85,
  *     32→0.95, 45→1.00. Isotropic data is IVF's worst case (no
  *     cluster structure to exploit), so the production sparse
  *     setting keeps roughly its probed share of borderline pairs;
  *     this spec pins the measured floor at the production setting
  *     and the ≥0.9 point of the curve so a silent recall regression
  *     (broken cell assignment, probe ranking, or margin plumbing)
  *     fails loudly.
  */
class BitextRecallSpec extends SparkSuite {

  import org.apache.spark.sql.DataFrame

  private def sides(): (DataFrame, DataFrame, Long, Long) = {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val xs = emb.where(col("label") % 2 === 0)
      .select(col("vec_id").as("xid"), col("embedding").as("xv"))
      .localCheckpoint(true)
    val ys = emb.where(col("label") % 2 === 1)
      .select(col("vec_id").as("yid"), col("embedding").as("yv"))
      .localCheckpoint(true)
    (xs, ys, xs.count(), ys.count())
  }

  private def recallAt(xs: DataFrame, ys: DataFrame, exact: DataFrame,
      nExact: Long, nLists: Int, nProbe: Int): Double = {
    val ann = Similarity.marginBitextPairsAnn(xs, "xid", "xv",
        ys, "yid", "yv", k = 4, minMargin = 1.0,
        nLists = nLists, nProbe = nProbe)
      .select("xid", "yid")
    exact.join(ann, Seq("xid", "yid"), "left_semi").count().toDouble / nExact
  }

  test("planted clones survive the sparse candidate stream at the production setting") {
    val (xs, ys0, nx, _) = sides()
    val planted = xs.where(col("xid") % 4 === 0)
      .select((col("xid") + 5000000L).as("yid"), col("xv").as("yv"))
    val ys = ys0.unionByName(planted).localCheckpoint(true)
    val nPlanted = planted.count()
    assert(nPlanted > 0, "fixture must plant at least one clone")
    val (nLists, nProbe) = Similarity.bitextAnnParams(nx + ys.count())
    assert(nProbe < nLists, "the production setting must actually be sparse here")
    val cand = Similarity.annCandidates(xs, "xid", "xv", ys, "yid", "yv",
        nLists, nProbe, seed = 42L, trainFraction = 1.0,
        maxTrainRows = 1 << 16)
      .where(col("role") === 0)
      .select(col("gid").as("xid"), col("oid").as("yid"))
    val hits = xs.where(col("xid") % 4 === 0)
      .select(col("xid"), (col("xid") + 5000000L).as("yid"))
      .join(cand, Seq("xid", "yid"), "left_semi").count()
    assert(hits == nPlanted,
      s"planted-pair candidate recall must be structural 1.0: $hits/$nPlanted")
  }

  test("organic-pair recall: measured floor at the production setting, >=0.9 at 70% probes") {
    val (xs, ys, nx, ny) = sides()
    val exact = Similarity.marginBitextPairs(xs, "xid", "xv",
        ys, "yid", "yv", k = 4, minMargin = 1.0, annPairThreshold = 0)
      .select("xid", "yid").localCheckpoint(true)
    val nExact = exact.count()
    assert(nExact > 50, s"fixture must mine a meaningful exact pair set, got $nExact")
    val (nLists, nProbe) = Similarity.bitextAnnParams(nx + ny)
    val atProd = recallAt(xs, ys, exact, nExact, nLists, nProbe)
    // measured 0.51 at sf0.001 (isotropic vectors: recall tracks the
    // probed share nProbe/nLists); 0.35 is the regression floor, not a
    // quality claim — the honest number lives in OPTIMIZATION_r17.md
    assert(atProd >= 0.35,
      f"production-setting organic recall regressed: $atProd%.3f (nProbe=$nProbe/$nLists)")
    val np90 = math.min(nLists, math.ceil(0.7 * nLists).toInt)
    val at70 = recallAt(xs, ys, exact, nExact, nLists, np90)
    assert(at70 >= 0.9,
      f"recall at 70%% probes must reach 0.9 on isotropic data: $at70%.3f (nProbe=$np90/$nLists)")
  }
}
