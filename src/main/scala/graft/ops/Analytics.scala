package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-grade relational operators beyond the reference's surface
  * (SURVEY.md §7 Phase 3). All are declarative DataFrame compositions —
  * Catalyst picks physical strategies (broadcast vs SMJ, partial aggs),
  * AQE re-plans at runtime. Nothing here collects data to the driver.
  */
object Analytics {

  /** Poisson-bootstrap confidence interval for a weighted mean — the
    * bootstrap that actually distributes: instead of resampling n rows
    * with replacement (which needs global coordination), each row
    * contributes to replicate `r` with a DETERMINISTIC Poisson(1)
    * pseudo-count derived from `md5(key:r)` (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams"). Replicate
    * means then bound the percentile interval.
    *
    * Determinism: the pseudo-count is a pure function of (key, r) — the
    * same CI reproduces across runs, engines and cluster sizes, and the
    * construction is restatable in SQL (the oracle recomputes it
    * exactly). The Poisson CDF is folded in as fixed literals, capped
    * at 7 (P[X>7] < 1e-8).
    *
    * Scale shape: the `b`-way replication happens IN-SCAN (explode of a
    * literal range, map-side partial agg) — the shuffle carries only
    * `b` groups; the percentile step sorts `b` rows (bounded by the
    * replicate count, not the data). CPU is b× the scan, the price of
    * any bootstrap — keep `b` in the hundreds. */
  def poissonBootstrapMeanCI(df: DataFrame, key: Column, value: Column,
      b: Int = 200, alpha: Double = 0.05, dp: Int = 6): DataFrame = {
    require(b >= 20, s"need at least 20 replicates, got $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    // inverse-CDF lookup of Poisson(1) on a 24-bit uniform from md5(key:r)
    val cdf = Seq(0.367879441, 0.735758882, 0.919698603, 0.981011843,
      0.996340153, 0.999405815, 0.999916758, 0.999989750)
    val u = conv(substring(md5(concat_ws(":", col("__k"), col("__r"))),
      1, 6), 16, 10).cast("double") / lit((1 << 24).toDouble)
    val w = cdf.zipWithIndex.foldRight(lit(8): Column) {
      case ((p, k), rest) => when(u < p, k).otherwise(rest)
    }
    val reps = df
      .select(key.cast("string").as("__k"), value.cast("double").as("__v"))
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .select(col("__r"), col("__v"), w.as("__w"))
      .groupBy("__r")
      .agg((sum(col("__w") * col("__v")) / sum(col("__w"))).as("__m"))
    val loRank = math.floor(alpha / 2 * b).toInt + 1
    val hiRank = b - math.floor(alpha / 2 * b).toInt
    val ranked = reps
      .withColumn("__rk", row_number().over(Window.orderBy(col("__m"), col("__r"))))
    df.agg(round(avg(value.cast("double")), dp).as("mean"))
      .crossJoin(ranked.where(col("__rk") === loRank)
        .select(round(col("__m"), dp).as("ci_lo")))
      .crossJoin(ranked.where(col("__rk") === hiRank)
        .select(round(col("__m"), dp).as("ci_hi")))
      .select(col("mean"), col("ci_lo"), col("ci_hi"),
        lit(b).cast("long").as("n_replicates"))
  }

  /** Randomization test for a difference in means between two slices:
    * is mean(value | inA) − mean(value | ¬inA) explainable by chance?
    * Each replicate reassigns every row to a pseudo-group by an
    * md5(key:r) coin (the Bernoulli(½) unconditional randomization
    * test — valid under the exchangeability null, and the assignment
    * that distributes: no global permutation state). The p-value is
    * `(1 + #{r : |d_r| ≥ |d_obs|}) / (b + 1)` with both sides rounded
    * to `dp` first, so the comparison — and therefore the p-value — is
    * a pure function of the data, reproducible across engines.
    *
    * Scale shape: in-scan b-way replication with map-side partial aggs
    * (shuffle carries b groups), the observed diff rides a 1-row
    * broadcast. CPU is b× the scan — the price of any resampling test. */
  def randomizationTestMeanDiff(df: DataFrame, key: Column, inA: Column,
      value: Column, b: Int = 199, dp: Int = 6): DataFrame = {
    require(b >= 19, s"need at least 19 replicates, got $b")
    val base = df.select(key.cast("string").as("__k"),
      inA.cast("boolean").as("__a"), value.cast("double").as("__v"))
    val obs = base.agg((avg(when(col("__a"), col("__v"))) -
      avg(when(!col("__a"), col("__v")))).as("__d0"))
    val u = conv(substring(md5(concat_ws(":", col("__k"), col("__r"))),
      1, 6), 16, 10).cast("double") / lit((1 << 24).toDouble)
    val reps = base
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .select(col("__r"), col("__v"), (u < 0.5).as("__fa"))
      .groupBy("__r")
      .agg((avg(when(col("__fa"), col("__v"))) -
        avg(when(!col("__fa"), col("__v")))).as("__d"))
    reps.crossJoin(obs)
      .agg(sum(when(round(abs(col("__d")), dp) >= round(abs(col("__d0")), dp),
        1L).otherwise(0L)).as("__ge"))
      .crossJoin(obs)
      .select(round(col("__d0"), dp).as("diff_obs"),
        round((col("__ge") + 1L) / lit((b + 1).toDouble), dp).as("p_value"),
        lit(b).cast("long").as("n_replicates"))
  }

  /** Truncated rank-biased overlap (Webber et al. 2010) between two
    * per-query rankings — the top-weighted similarity of two retrieval
    * systems (did the ANN index change what BM25 would have returned?
    * did a rerank actually move the top?). `RBO@k = Σ_{d≤k} (1−p)
    * p^{d−1} |A_d ∩ B_d| / d`, re-expressed per overlapping doc as a
    * suffix weight on `max(rank_a, rank_b)` so the whole metric is one
    * equi-join + one broadcast lookup — no per-depth pass.
    *
    * Weights are rounded to 12 decimals before use, making the metric
    * a pure function of the rank pairs (restatable in SQL, stable
    * across libm pow implementations). */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, qidCol: String,
      docCol: String, rankCol: String, p: Double = 0.9, k: Int = 10,
      dp: Int = 6): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(k > 0 && k <= 1000, s"k must be in (0,1000], got $k")
    val spark = a.sparkSession
    import spark.implicits._
    val weights = (1 to k).map { m =>
      val w = (1 - p) * (m to k).map(d => math.pow(p, d - 1) / d).sum
      (m, BigDecimal(w).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("__m", "__w")
    val ja = a.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).as("__ra")).where(col("__ra") <= k)
    val jb = b.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).as("__rb")).where(col("__rb") <= k)
    val contrib = ja.join(jb, Seq("qid", "__doc"))
      .select(col("qid"), greatest(col("__ra"), col("__rb")).as("__m"))
      .join(broadcast(weights), "__m")
      .groupBy("qid").agg(sum(col("__w")).as("__rbo"))
    a.select(col(qidCol).as("qid")).distinct()
      .join(contrib, Seq("qid"), "left")
      .select(col("qid"), round(coalesce(col("__rbo"), lit(0.0)), dp).as("rbo"))
  }

  /** Standard retrieval-evaluation metrics (TREC conventions) for a
    * ranked run against graded relevance judgments, one row per judged
    * query: reciprocal rank of the first relevant hit, nDCG@k with the
    * 2^rel−1 gain and log₂(rank+1) discount (Järvelin & Kekäläinen
    * 2002), precision@k, recall@k, and the judged-relevant count.
    * Queries with judgments but nothing relevant retrieved score 0 —
    * they are denominator rows a macro average must include. Judgments
    * with rel ≤ 0 are treated as not-relevant and dropped.
    *
    * Shuffle shape: one (query, doc) equi-join run⋈qrels, per-query
    * aggregates, and the ideal-DCG window — partitioned BY QUERY and
    * bounded by judgments per query, never corpus size. The float
    * discount is spelled `gain / (ln(rank+1) / ln 2)` term-for-term so
    * any engine reproduces the identical doubles. */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame, qidCol: String,
      docCol: String, rankCol: String, relCol: String, k: Int,
      dp: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val r = run.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).cast("long").as("__rank"))
    val q = qrels.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
        col(relCol).cast("double").as("__rel"))
      .where(col("__rel") > 0)
    def gain(c: Column) = pow(lit(2.0), c) - lit(1.0)
    def discount(pos: Column) = log(pos + lit(1)) / log(lit(2.0))
    val hits = r.join(q, Seq("qid", "__doc"))
      .groupBy("qid").agg(
        min(col("__rank")).as("__first"),
        sum(when(col("__rank") <= k, 1L).otherwise(0L)).as("__hits"),
        sum(when(col("__rank") <= k,
          gain(col("__rel")) / discount(col("__rank"))).otherwise(0.0))
          .as("__dcg"))
    val w = Window.partitionBy("qid").orderBy(col("__rel").desc, col("__doc"))
    val ideal = q.withColumn("__i", row_number().over(w))
      .where(col("__i") <= k)
      .groupBy("qid")
      .agg(sum(gain(col("__rel")) / discount(col("__i"))).as("__idcg"))
    val nrel = q.groupBy("qid").agg(count(lit(1L)).as("n_rel"))
    nrel.join(ideal, "qid").join(hits, Seq("qid"), "left")
      .select(col("qid").as(qidCol), col("n_rel"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), dp)
          .as("reciprocal_rank"),
        round(coalesce(col("__dcg") / col("__idcg"), lit(0.0)), dp)
          .as(s"ndcg_at_$k"),
        round(coalesce(col("__hits"), lit(0L)) / lit(k.toDouble), dp)
          .as(s"precision_at_$k"),
        round(coalesce(col("__hits"), lit(0L)) / col("n_rel"), dp)
          .as(s"recall_at_$k"))
  }

  /** Cohen's κ inter-annotator agreement (Cohen 1960) between two
    * labelings of the same items: observed agreement p₀ against the
    * chance agreement pₑ implied by each rater's label marginals,
    * κ = (p₀−pₑ)/(1−pₑ) — the label-quality gate before trusting
    * human (or LLM-judge) annotations enough to train on them.
    *
    * One item-keyed equi-join, then everything rides the
    * |labels|²-bounded confusion rollup — marginals, totals, and the
    * final scalar never touch item cardinality again. Items labeled by
    * only one rater are excluded (inner join). κ is NULL when pₑ = 1
    * (both raters constant and identical: agreement is undefined
    * there, not perfect). */
  def cohenKappa(a: DataFrame, b: DataFrame, idCol: String,
      labelCol: String, dp: Int = 6): DataFrame = {
    val ja = a.select(col(idCol).as("__id"),
      col(labelCol).cast("string").as("__la"))
    val jb = b.select(col(idCol).as("__id"),
      col(labelCol).cast("string").as("__lb"))
    val cm = ja.join(jb, "__id")
      .groupBy("__la", "__lb").agg(count(lit(1L)).as("__n"))
    val tot = cm.agg(sum(col("__n")).as("__tot"),
      sum(when(col("__la") === col("__lb"), col("__n")).otherwise(0L))
        .as("__agree"))
    val ma = cm.groupBy(col("__la").as("__l")).agg(sum("__n").as("__na"))
    val mb = cm.groupBy(col("__lb").as("__l")).agg(sum("__n").as("__nb"))
    // marginal products in doubles: n² overflows a long at ~3e9 items
    val pes = ma.join(mb, Seq("__l"), "full_outer")
      .agg(sum(coalesce(col("__na"), lit(0L)).cast("double") *
        coalesce(col("__nb"), lit(0L))).as("__pes"))
    val po = col("__agree").cast("double") / col("__tot")
    val pe = col("__pes") / (col("__tot").cast("double") * col("__tot"))
    tot.crossJoin(pes).select(
      col("__tot").as("n_items"),
      round(po, dp).as("po"), round(pe, dp).as("pe"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise(round((po - pe) / (lit(1) - pe), dp)).as("kappa"))
  }

  /** Weighted Cohen's κ (Cohen 1968) for ORDINAL ratings: two raters'
    * numeric scores joined on the item id, disagreement weighted by
    * |v_a − v_b| (`"linear"`) or (v_a − v_b)² (`"quadratic"` — the QWK
    * standard for score annotations):
    *
    *   κ_w = 1 − Σ o_ij·w_ij / Σ e_ij·w_ij,   e_ij = row_i·col_j / n
    *
    * computed on RAW score distances — the usual /(k−1) normalization
    * cancels in the ratio, so no level indexing is needed. On binary
    * {0,1} data both weightings equal unweighted [[cohenKappa]] (the
    * differential identity the spec pins). κ is NULL when the expected
    * weighted disagreement is 0 (a constant rater). One confusion
    * rollup (|levels|² rows), marginal self-join of level vectors —
    * nothing corpus-sized past the rollup. Returns
    * (n_items, wo, we, kappa_w). */
  def weightedKappa(a: DataFrame, b: DataFrame, idCol: String,
      scoreCol: String, weights: String = "quadratic",
      dp: Int = 6): DataFrame = {
    require(weights == "quadratic" || weights == "linear",
      s"weights must be quadratic|linear, got $weights")
    def w(d: Column): Column =
      if (weights == "quadratic") d * d else abs(d)
    val ja = a.select(col(idCol).as("__id"),
      col(scoreCol).cast("double").as("__va"))
    val jb = b.select(col(idCol).as("__id"),
      col(scoreCol).cast("double").as("__vb"))
    val cm = ja.join(jb, "__id")
      .where(col("__va").isNotNull && col("__vb").isNotNull)
      .groupBy("__va", "__vb").agg(count(lit(1L)).as("__n"))
      .localCheckpoint(true) // observed sum + both marginals read it
    val obs = cm.agg(sum(col("__n")).as("n_items"),
      coalesce(sum(col("__n").cast("double") *
        w(col("__va") - col("__vb"))), lit(0.0)).as("__wo"))
    val ma = cm.groupBy(col("__va").as("__v")).agg(sum("__n").as("__na"))
    val mb = cm.groupBy(col("__vb").as("__v")).agg(sum("__n").as("__nb"))
    val exp = ma.crossJoin(mb.select(col("__v").as("__v2"), col("__nb")))
      .agg(coalesce(sum(col("__na").cast("double") * col("__nb") *
        w(col("__v") - col("__v2"))), lit(0.0)).as("__wes"))
    obs.crossJoin(exp).select(
      col("n_items"),
      round(col("__wo") / col("n_items"), dp).as("wo"),
      round(col("__wes") / (col("n_items").cast("double") * col("n_items")),
        dp).as("we"),
      when(col("__wes") === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - col("__wo") * col("n_items") /
          col("__wes"), dp)).as("kappa_w"))
  }

  /** Kendall's τ-b rank correlation for BOUNDED ordinal scales (rating
    * pairs, bucketed scores — the monotone-association readout that,
    * unlike Spearman, is a direct probability statement: P(concordant)
    * − P(discordant), tie-adjusted):
    *
    *   τ_b = (n_c − n_d) / √((n₀ − n₁)(n₀ − n₂))
    *
    * with n₀ = n(n−1)/2 and n₁/n₂ the x/y marginal tie-pair masses.
    * Pair counting runs on the DISTINCT-CELL table: one (x, y) rollup,
    * then a strict-upper-triangle cell self-join — O(cells²), so the
    * contract bounds the scales (`maxCells`, default 4096 distinct
    * (x, y) cells — ordinal data, not continuous columns; use
    * Spearman via [[correlationStats]] for those). NULL when either
    * margin is constant. Returns (n, n_c, n_d, tau_b). */
  def kendallTauB(df: DataFrame, x: Column, y: Column,
      maxCells: Int = 4096, dp: Int = 6): DataFrame = {
    val cells = df.select(x.cast("double").as("__x"),
        y.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1L)).as("__n"))
      .localCheckpoint(true) // pair join + marginals + count read it
    require(cells.count() <= maxCells,
      s"kendallTauB: more than $maxCells distinct (x, y) cells — " +
        "this is the bounded-ordinal API; use Spearman for continuous data")
    val a = cells.select(col("__x").as("__xa"), col("__y").as("__ya"),
      col("__n").as("__na"))
    val bb = cells.select(col("__x").as("__xb"), col("__y").as("__yb"),
      col("__n").as("__nb"))
    // strict upper triangle in (x, y) lexicographic order: every
    // unordered cell pair exactly once
    val pairs = a.join(bb, col("__xa") < col("__xb") ||
        (col("__xa") === col("__xb") && col("__ya") < col("__yb")))
      .agg(
        coalesce(sum(when((col("__xa") < col("__xb") &&
            col("__ya") < col("__yb")) ||
          (col("__xa") > col("__xb") && col("__ya") > col("__yb")),
          col("__na").cast("double") * col("__nb")).otherwise(0.0)),
          lit(0.0)).as("__nc"),
        coalesce(sum(when((col("__xa") < col("__xb") &&
            col("__ya") > col("__yb")) ||
          (col("__xa") > col("__xb") && col("__ya") < col("__yb")),
          col("__na").cast("double") * col("__nb")).otherwise(0.0)),
          lit(0.0)).as("__nd"))
    val n = cells.agg(sum(col("__n")).as("n"))
    val tx = cells.groupBy("__x").agg(sum(col("__n")).as("__t"))
      .agg(coalesce(sum(col("__t").cast("double") * (col("__t") - 1) / 2),
        lit(0.0)).as("__n1"))
    val ty = cells.groupBy("__y").agg(sum(col("__n")).as("__t"))
      .agg(coalesce(sum(col("__t").cast("double") * (col("__t") - 1) / 2),
        lit(0.0)).as("__n2"))
    val n0 = col("n").cast("double") * (col("n") - 1) / 2
    val denom = sqrt((n0 - col("__n1")) * (n0 - col("__n2")))
    n.crossJoin(pairs).crossJoin(tx).crossJoin(ty).select(
      col("n"), col("__nc").cast("long").as("n_c"),
      col("__nd").cast("long").as("n_d"),
      when(n0 - col("__n1") <= 0.0 || n0 - col("__n2") <= 0.0,
        lit(null).cast("double"))
        .otherwise(round((col("__nc") - col("__nd")) / denom, dp))
        .as("tau_b"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test: the max vertical gap
    * between the empirical CDFs of cohort A (`inA`) and the rest —
    * the distribution-shape companion to the binned-PSI screen (PSI
    * needs a bin choice; KS does not). Reports D, the α=0.05 critical
    * value `1.358·√((n_a+n_b)/(n_a·n_b))` (Smirnov's asymptotic), and
    * the reject verdict.
    *
    * Scale shape: the samples collapse to a per-distinct-value
    * (count_a, count_b) histogram first; CDFs are two-phase
    * [[Windows.globalCumSum]] scans over that histogram (distinct
    * cardinality, never row count, and no single-reducer window);
    * the 1-row totals broadcast. Rows with NULL value drop; a NULL
    * `inA` counts as cohort B. Output is NaN when either cohort is
    * empty. */
  def ksTest(df: DataFrame, value: Column, inA: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select(value.cast("double").as("__v"),
        when(inA, 1L).otherwise(0L).as("__a"),
        when(inA, 0L).otherwise(1L).as("__b"))
      .where(col("__v").isNotNull)
    val h = s.groupBy("__v").agg(sum(col("__a")).as("__ca"),
      sum(col("__b")).as("__cb"))
    val c = Windows.globalCumSum(
      Windows.globalCumSum(h, Seq(col("__v")), col("__ca"), "__cuma"),
      Seq(col("__v")), col("__cb"), "__cumb")
    val tot = h.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    // the documented NaN-on-empty-cohort contract, made explicit: an
    // empty cohort must not reach the divisions at all (robust under
    // the repo's ANSI-on default regardless of operand coercions)
    val degenerate = col("__na") === 0L || col("__nb") === 0L
    val crit = when(degenerate, lit(Double.NaN)).otherwise(lit(1.358) *
      sqrt((col("__na") + col("__nb")) /
        (col("__na").cast("double") * col("__nb"))))
    c.crossJoin(broadcast(tot))
      .groupBy(col("__na"), col("__nb"))
      .agg(max(when(degenerate, lit(Double.NaN))
        .otherwise(abs(col("__cuma").cast("double") / col("__na") -
          col("__cumb").cast("double") / col("__nb")))).as("__d"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("__d"), dp).as("ks_d"),
        round(crit, dp).as("crit_05"),
        (col("__d") > crit).as("reject_05"))
  }

  /** 1-D Wasserstein-1 (earth mover's) distance between cohort A and
    * the rest:
    *
    *   W₁ = ∫ |F_A(x) − F_B(x)| dx
    *       = Σ_i |F_A(vᵢ) − F_B(vᵢ)| · (vᵢ₊₁ − vᵢ)
    *
    * over the sorted distinct values — the drift metric that reports
    * HOW FAR the mass moved in data units, where [[ksTest]] reports
    * only the largest CDF gap and PSI/KL go degenerate on
    * non-overlapping supports. The de-facto embedding/feature drift
    * number in modern eval stacks.
    *
    * Scale shape (the [[ksTest]] discipline): distinct-value
    * histogram, BOTH cohort CDFs in one two-phase
    * [[Windows.globalCumSums]] exchange, one [[Windows.globalRowNumber]]
    * pass + a rank-shifted self-join for the segment widths (vᵢ₊₁ −
    * vᵢ), 1-row rollup. The last value has no segment — correctly so,
    * both CDFs are 1 beyond it. W₁ is NULL when either cohort is
    * empty. */
  def wassersteinDistance(df: DataFrame, value: Column, inA: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select(value.cast("double").as("__v"),
        when(inA, 1L).otherwise(0L).as("__a"),
        when(inA, 0L).otherwise(1L).as("__b"))
      .where(col("__v").isNotNull)
    val h = s.groupBy("__v").agg(sum(col("__a")).as("__ca"),
      sum(col("__b")).as("__cb"))
    val c = Windows.globalCumSums(h, Seq(col("__v")),
      Seq((col("__ca"): Column) -> "__cuma", (col("__cb"): Column) -> "__cumb"))
    val r = Windows.globalRowNumber(c, Seq(col("__v")), "__rn")
    val nxt = r.select((col("__rn") - 1).as("__rn"), col("__v").as("__vn"))
    val seg = r.join(nxt, "__rn")
    val tot = h.agg(coalesce(sum(col("__ca")), lit(0L)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L)).as("__nb"))
    val ok = col("__na") > 0L && col("__nb") > 0L
    // agg without keys so a single-distinct-value input (no segments)
    // still yields its one result row
    val wsum = seg.crossJoin(broadcast(tot))
      .agg(sum(when(ok,
        abs(col("__cuma").cast("double") / col("__na") -
          col("__cumb").cast("double") / col("__nb")) *
          (col("__vn") - col("__v")))).as("__w"))
    wsum.crossJoin(broadcast(tot))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        when(ok, round(coalesce(col("__w"), lit(0.0)), dp)).as("w1"))
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955): does a
    * BINARY rate trend monotonically across ordered groups — the
    * pass-rate-vs-model-size / defect-rate-vs-time-bucket question
    * ([[jonckheereTest]] is its numeric-outcome sibling). With integer
    * scores sᵢ = 0..k−1 over the given order,
    *
    *   T = Σ sᵢ(rᵢ − nᵢp̄),  Var = p̄(1−p̄)·(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N)
    *
    * (rᵢ successes of nᵢ, p̄ pooled rate); z = T/√Var, two-sided 5%
    * verdict. All moments are exact integers. NULL z when the pooled
    * rate is 0 or 1 (no variance) or k < 2.
    *
    * Shape: ONE group-keyed rollup (k rows) and a 1-row closed form. */
  def cochranArmitage(df: DataFrame, success: Column, group: Column,
      orderedGroups: Seq[String], dp: Int = 6): DataFrame = {
    val k = orderedGroups.size
    require(k >= 2 && k <= 16, s"need 2..16 ordered groups, got $k")
    require(orderedGroups.distinct.size == k, "ordered groups must be distinct")
    val score = orderedGroups.zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (acc, (g, i)) =>
        when(group.cast("string") === g, i.toLong).otherwise(acc) }
    val base = df.select(score.as("__s"),
        success.cast("boolean").cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val per = base.groupBy("__s").agg(count(lit(1L)).as("__n"),
      sum(col("__y")).as("__r"))
    val a = per.agg(count(lit(1L)).as("k"),
      sum(col("__n")).as("__nn"), sum(col("__r")).as("__rr"),
      sum(col("__s") * col("__n")).as("__sn"),
      sum(col("__s") * col("__s") * col("__n")).as("__ssn"),
      sum(col("__s") * col("__r")).as("__sr"))
    val n = col("__nn").cast("double")
    val pbar = col("__rr") / n
    val t = col("__sr") - col("__sn") * pbar
    val vr = pbar * (lit(1.0) - pbar) *
      (col("__ssn") - col("__sn").cast("double") * col("__sn") / n)
    val safeVr = when(vr > 0.0, vr).otherwise(lit(1.0))
    val z = t / sqrt(safeVr)
    a.select(col("k"), col("__nn").as("n"),
      when(n > 0, round(pbar, dp)).as("pooled_rate"),
      round(t, dp).as("t_stat"),
      when(col("k") >= 2 && vr > 0.0, round(z, dp)).as("z"),
      when(col("k") >= 2 && vr > 0.0, abs(z) > lit(1.959963984540054))
        .as("reject_05"))
  }

  /** Standardized-mean-difference covariate balance table (the
    * propensity/observational-study pre-flight): for each covariate,
    *
    *   SMD = (x̄_t − x̄_c) / √((s²_t + s²_c)/2)
    *
    * |SMD| < 0.1 is the conventional "balanced" bar — read it BEFORE
    * trusting any non-randomized comparison ([[diffInDiff]],
    * [[cupedLift]] on observational arms). One row per covariate.
    *
    * Shape: ONE fused aggregate (6 conditional sums per covariate,
    * k ≤ 16 covariates by contract) and a k-row posexplode of the
    * 1-row verdict — the corpus is scanned once regardless of k. */
  def smdBalance(df: DataFrame, treated: Column,
      covariates: Seq[(String, Column)], dp: Int = 6): DataFrame = {
    require(covariates.nonEmpty && covariates.size <= 16,
      s"need 1..16 covariates, got ${covariates.size}")
    val t = treated.cast("boolean")
    // rows with ANY NULL covariate drop entirely — a row must not count
    // in n while its value skips the sums (the brierDecomposition
    // NULL-label lesson)
    val base = df.select((t.as("__t") +: covariates.zipWithIndex.map {
      case ((_, c), i) => c.cast("double").as(s"__x$i") }): _*)
      .where(covariates.indices.map(i => col(s"__x$i").isNotNull)
        .foldLeft(col("__t").isNotNull)(_ && _))
    val aggCols = covariates.indices.flatMap { i =>
      def s(arm: Boolean, e: Column, nm: String) =
        sum(when(col("__t") === arm, e).otherwise(lit(0.0)))
          .as(s"__${nm}$i")
      Seq(s(true, col(s"__x$i"), "st"), s(false, col(s"__x$i"), "sc"),
        s(true, col(s"__x$i") * col(s"__x$i"), "qt"),
        s(false, col(s"__x$i") * col(s"__x$i"), "qc"))
    } ++ Seq(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"))
    val w = base.agg(aggCols.head, aggCols.tail: _*)
    val nt = col("__nt").cast("double")
    val nc = col("__nc").cast("double")
    def safe(b: Column) = when(b =!= 0.0, b).otherwise(lit(1.0))
    val rows = covariates.zipWithIndex.map { case ((name, _), i) =>
      val mt = col(s"__st$i") / safe(nt)
      val mc = col(s"__sc$i") / safe(nc)
      val vt = (col(s"__qt$i") - col(s"__st$i") * col(s"__st$i") / safe(nt)) /
        safe(nt - 1)
      val vc = (col(s"__qc$i") - col(s"__sc$i") * col(s"__sc$i") / safe(nc)) /
        safe(nc - 1)
      val pooled = sqrt((vt + vc) / 2.0)
      val ok = col("__nt") >= 2 && col("__nc") >= 2
      struct(lit(name).as("covariate"),
        when(col("__nt") > 0, round(mt, dp)).as("mean_t"),
        when(col("__nc") > 0, round(mc, dp)).as("mean_c"),
        when(ok && pooled > 0.0, round((mt - mc) / safe(pooled), dp))
          .as("smd"),
        when(ok && pooled > 0.0, abs((mt - mc) / safe(pooled)) < 0.1)
          .as("balanced"))
    }
    w.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.covariate"), col("__r.mean_t"), col("__r.mean_c"),
        col("__r.smd"), col("__r.balanced"))
      .orderBy("covariate")
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    * adjust the experiment metric by its pre-period covariate,
    *
    *   y' = y − θ(x − x̄),   θ = cov(x, y) / var(x)
    *
    * and read the treatment lift off the adjusted means — the
    * industry-standard way to cut A/B variance (often 40-60% when the
    * pre-period correlates) without touching the point estimate's
    * unbiasedness. Reports θ, raw and adjusted lift, their standard
    * errors (per-arm residual variances), the pooled variance-reduction
    * ratio 1 − var(y′)/var(y), and a normal-approximation verdict on
    * the adjusted lift.
    *
    * Shape: ONE arm-keyed moment rollup (n, Σx, Σy, Σx², Σy², Σxy per
    * arm — 2 rows out) and a 1-row closed form; θ comes from the
    * pooled sums of the same rollup, so nothing scans twice. NULLs:
    * everything when either arm has < 2 rows; θ (and the adjusted
    * columns) when var(x) = 0. */
  def cupedLift(df: DataFrame, metric: Column, covariate: Column,
      treated: Column, dp: Int = 6): DataFrame = {
    val s = df.select(metric.cast("double").as("__y"),
        covariate.cast("double").as("__x"),
        treated.cast("boolean").as("__t"))
      .where(col("__y").isNotNull && col("__x").isNotNull &&
        col("__t").isNotNull)
    val per = s.groupBy("__t").agg(count(lit(1L)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    def arm(t: Boolean, c: String) =
      first(when(col("__t") === t, col(c)), ignoreNulls = true)
        .as(c + (if (t) "t" else "c"))
    val armCols = Seq("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")
      .flatMap(c => Seq(arm(true, c), arm(false, c)))
    val w = per.agg(armCols.head, armCols.tail: _*)
    val nt = col("__nt").cast("double")
    val nc = col("__nc").cast("double")
    val n = nt + nc
    val sx = col("__sxt") + col("__sxc")
    val sy = col("__syt") + col("__syc")
    val sxx = col("__sxxt") + col("__sxxc")
    val syy = col("__syyt") + col("__syyc")
    val sxy = col("__sxyt") + col("__sxyc")
    val varX = sxx - sx * sx / n
    val covXY = sxy - sx * sy / n
    // subexpression elimination can hoist a branch's division out of
    // its CaseWhen guard (ANSI divide-by-zero on degenerate inputs),
    // so every denominator that CAN be 0 is made intrinsically safe —
    // the guarded outputs never read the poisoned values
    def safe(b: Column) = when(b =!= 0.0, b).otherwise(lit(1.0))
    val theta = covXY / safe(varX)
    // per-arm sample variance of y and of the residual y − θx
    def vy(syyA: Column, syA: Column, nA: Column) =
      (syyA - syA * syA / nA) / safe(nA - 1)
    def vres(syyA: Column, sxxA: Column, sxyA: Column, syA: Column,
        sxA: Column, nA: Column) =
      (syyA - lit(2.0) * theta * sxyA + theta * theta * sxxA -
        (syA - theta * sxA) * (syA - theta * sxA) / nA) / safe(nA - 1)
    val liftRaw = col("__syt") / nt - col("__syc") / nc
    val liftAdj = liftRaw - theta * (col("__sxt") / nt - col("__sxc") / nc)
    val seRaw = sqrt(vy(col("__syyt"), col("__syt"), nt) / nt +
      vy(col("__syyc"), col("__syc"), nc) / nc)
    val vrt = vres(col("__syyt"), col("__sxxt"), col("__sxyt"),
      col("__syt"), col("__sxt"), nt)
    val vrc = vres(col("__syyc"), col("__sxxc"), col("__sxyc"),
      col("__syc"), col("__sxc"), nc)
    val seAdj = sqrt(vrt / nt + vrc / nc)
    val varY = syy - sy * sy / n
    val varRes = syy - lit(2.0) * theta * sxy + theta * theta * sxx -
      (sy - theta * sx) * (sy - theta * sx) / n
    val okN = col("__nt") >= 2 && col("__nc") >= 2
    val ok = okN && varX > 0.0
    w.select(
      col("__nt").as("n_t"), col("__nc").as("n_c"),
      when(ok, round(theta, dp)).as("theta"),
      when(okN, round(liftRaw, dp)).as("lift_raw"),
      when(okN, round(seRaw, dp)).as("se_raw"),
      when(ok, round(liftAdj, dp)).as("lift_adj"),
      when(ok, round(seAdj, dp)).as("se_adj"),
      when(ok && varY > 0.0, round(lit(1.0) - varRes / safe(varY), dp))
        .as("var_reduction"),
      when(ok && seAdj > 0.0, abs(liftAdj / seAdj) > lit(1.959963984540054))
        .as("reject_05"))
  }

  /** Difference-in-differences (the canonical 2×2 panel estimator):
    *
    *   DiD = (ȳ_treated,post − ȳ_treated,pre)
    *       − (ȳ_control,post − ȳ_control,pre)
    *
    * the causal lift under the parallel-trends assumption, when
    * treatment was NOT randomized (a rollout, a policy change) — the
    * question a plain post-period comparison answers wrongly whenever
    * the groups differ at baseline. SE is the unpooled four-cell
    * Welch form √(Σ s²ᵢ/nᵢ); normal-approximation verdict, NULL when
    * any cell has < 2 rows.
    *
    * Shape: ONE (treated, post) cell rollup — 4 rows — and a 1-row
    * closed form. */
  def diffInDiff(df: DataFrame, metric: Column, treated: Column,
      post: Column, dp: Int = 6): DataFrame = {
    val s = df.select(metric.cast("double").as("__y"),
        treated.cast("boolean").as("__t"), post.cast("boolean").as("__p"))
      .where(col("__y").isNotNull && col("__t").isNotNull &&
        col("__p").isNotNull)
    val per = s.groupBy("__t", "__p").agg(count(lit(1L)).as("__n"),
      sum(col("__y")).as("__s"), sum(col("__y") * col("__y")).as("__ss"))
    def cell(t: Boolean, p: Boolean, c: String) =
      first(when(col("__t") === t && col("__p") === p, col(c)),
        ignoreNulls = true)
        .as(c + (if (t) "t" else "c") + (if (p) "1" else "0"))
    val cellCols = for {
      c <- Seq("__n", "__s", "__ss"); t <- Seq(true, false)
      p <- Seq(true, false)
    } yield cell(t, p, c)
    val w = per.agg(cellCols.head, cellCols.tail: _*)
    def m(suf: String) = col("__s" + suf) / col("__n" + suf).cast("double")
    def v(suf: String) = (col("__ss" + suf) -
      col("__s" + suf) * col("__s" + suf) / col("__n" + suf)) /
      // intrinsically-safe denominator: the cupedLift hoisting note
      when(col("__n" + suf) > 1, (col("__n" + suf) - 1).cast("double"))
        .otherwise(lit(1.0))
    val did = (m("t1") - m("t0")) - (m("c1") - m("c0"))
    val se = sqrt(Seq("t1", "t0", "c1", "c0")
      .map(suf => v(suf) / col("__n" + suf)).reduce(_ + _))
    val ok = Seq("t1", "t0", "c1", "c0")
      .map(suf => coalesce(col("__n" + suf), lit(0L)) >= 2).reduce(_ && _)
    w.select(
      coalesce(col("__nt1"), lit(0L)).as("n_t_post"),
      coalesce(col("__nt0"), lit(0L)).as("n_t_pre"),
      coalesce(col("__nc1"), lit(0L)).as("n_c_post"),
      coalesce(col("__nc0"), lit(0L)).as("n_c_pre"),
      when(ok, round(did, dp)).as("did"),
      when(ok, round(se, dp)).as("se"),
      when(ok && se > 0.0, abs(did / se) > lit(1.959963984540054))
        .as("reject_05"))
  }

  /** Event study — [[diffInDiff]] unrolled per period: for every
    * period p, the treated−control gap relative to the BASE (earliest)
    * period's gap,
    *
    *   effect_p = (ȳ_T,p − ȳ_C,p) − (ȳ_T,base − ȳ_C,base)
    *
    * — the standard pre-trend/dynamics readout DiD's single post
    * number hides: flat pre-period effects VALIDATE parallel trends;
    * the post-period profile shows the effect ramping or decaying.
    * SE per period is the four-cell Welch form (treating the base-gap
    * estimate as independent across rows — the simple two-diffs form,
    * noted because regression event studies share the base across
    * coefficients). The base row reports effect 0 with NULL se/z by
    * construction; other rows get NULL se/z when any of the four
    * cells has < 2 rows.
    *
    * Shape: ONE period-keyed rollup (conditional count/avg/var per
    * arm), a 1-row base broadcast (limit 1 over the period-bounded
    * table), closed-form algebra per period row. */
  def eventStudy(df: DataFrame, metric: Column, treated: Column,
      period: Column, dp: Int = 6): DataFrame = {
    val s = df.select(metric.cast("double").as("__y"),
        treated.cast("boolean").as("__t"), period.as("__p"))
      .where(col("__y").isNotNull && col("__t").isNotNull &&
        col("__p").isNotNull)
    val per = s.groupBy("__p").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
      avg(when(col("__t"), col("__y"))).as("__mt"),
      avg(when(!col("__t"), col("__y"))).as("__mc"),
      var_samp(when(col("__t"), col("__y"))).as("__vt"),
      var_samp(when(!col("__t"), col("__y"))).as("__vc"))
    val base = per.orderBy(col("__p")).limit(1)
      .select(col("__p").as("__bp"), col("n_t").as("__bnt"),
        col("n_c").as("__bnc"), col("__mt").as("__bmt"),
        col("__mc").as("__bmc"), col("__vt").as("__bvt"),
        col("__vc").as("__bvc"))
    val joined = per.crossJoin(broadcast(base))
    val diff = col("__mt") - col("__mc")
    val baseDiff = col("__bmt") - col("__bmc")
    val isBase = col("__p") === col("__bp")
    val se = sqrt(col("__vt") / col("n_t") + col("__vc") / col("n_c") +
      col("__bvt") / col("__bnt") + col("__bvc") / col("__bnc"))
    val ok = !isBase && col("n_t") >= 2 && col("n_c") >= 2 &&
      col("__bnt") >= 2 && col("__bnc") >= 2 && se > 0.0
    val effect = when(isBase, lit(0.0)).otherwise(diff - baseDiff)
    joined.select(col("__p").as("period"), col("n_t"), col("n_c"),
        round(diff, dp).as("diff"),
        round(effect, dp).as("effect"),
        when(ok, round(se, dp)).as("se"),
        when(ok, round((diff - baseDiff) / se, dp)).as("z"))
      .orderBy("period")
  }

  /** Two-sample Cramér–von Mises criterion (Anderson 1962): the
    * WHOLE-CDF distribution test —
    *
    *   T = nm/(n+m)² · Σ_x t_x · (F_A(x) − F_B(x))²
    *
    * summed over the combined sample (t_x = multiplicity). Where
    * [[ksTest]] sees only the single largest CDF gap, CvM integrates
    * every gap — far more sensitive to broad, tail, or multi-modal
    * differences — and [[wassersteinDistance]] is its unsquared,
    * unit-carrying cousin. `reject_05` uses the asymptotic 5% critical
    * value T > 0.461 (exact under continuity; mildly approximate with
    * ties, like every rank test here) and is NULL when either cohort
    * is empty.
    *
    * Scale shape (the [[ksTest]] discipline): distinct-value
    * histogram, both CDFs in ONE two-phase [[Windows.globalCumSums]]
    * exchange, a 1-row rollup. */
  def cramerVonMises(df: DataFrame, value: Column, inA: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select(value.cast("double").as("__v"),
        when(inA, 1L).otherwise(0L).as("__a"),
        when(inA, 0L).otherwise(1L).as("__b"))
      .where(col("__v").isNotNull)
    val h = s.groupBy("__v").agg(sum(col("__a")).as("__ca"),
      sum(col("__b")).as("__cb"))
    val c = Windows.globalCumSums(h, Seq(col("__v")),
      Seq((col("__ca"): Column) -> "__cuma", (col("__cb"): Column) -> "__cumb"))
    val tot = h.agg(coalesce(sum(col("__ca")), lit(0L)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L)).as("__nb"))
    val ok = col("__na") > 0L && col("__nb") > 0L
    val dF = col("__cuma").cast("double") / col("__na") -
      col("__cumb").cast("double") / col("__nb")
    val sums = c.crossJoin(broadcast(tot))
      .agg(sum(when(ok, (col("__ca") + col("__cb")) * dF * dF)).as("__s"))
    val n = col("__na").cast("double")
    val m = col("__nb").cast("double")
    val t = n * m / ((n + m) * (n + m)) * col("__s")
    sums.crossJoin(broadcast(tot)).select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      when(ok, round(coalesce(t, lit(0.0)), dp)).as("cvm_t"),
      when(ok, coalesce(t, lit(0.0)) > 0.461).as("reject_05"))
  }

  /** Mann–Whitney U rank test (Wilcoxon rank-sum) for "does cohort A
    * stochastically dominate the rest": U from tie-averaged ranks,
    * the tie-corrected normal z, and the rank-biserial effect size
    * `1 − 2U_a/(n_a·n_b)` — the median-shift companion to [[ksTest]]
    * (KS sees any shape change; MWU targets location).
    *
    * Same scale shape as [[ksTest]]: per-distinct-value histogram,
    * one two-phase cumulative count for the tie-averaged ranks, 1-row
    * rollup. Tie-block rank sums are exact in doubles up to ~2⁵²
    * (ranks are integers-and-halves); z is NULL when the variance is
    * 0 (all values identical). */
  def mannWhitneyU(df: DataFrame, value: Column, inA: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select(value.cast("double").as("__v"),
        when(inA, 1L).otherwise(0L).as("__a"),
        when(inA, 0L).otherwise(1L).as("__b"))
      .where(col("__v").isNotNull)
    val h = s.groupBy("__v").agg(sum(col("__a")).as("__ca"),
        sum(col("__b")).as("__cb"))
      .withColumn("__ct", col("__ca") + col("__cb"))
    val r = Windows.globalCumSum(h, Seq(col("__v")), col("__ct"), "__cumt")
      .withColumn("__avgr",
        (col("__cumt") - col("__ct")).cast("double") + (col("__ct") + 1) / lit(2.0))
    val a = r.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      sum(col("__ca") * col("__avgr")).as("__ra"),
      sum(col("__ct").cast("double") * col("__ct") * col("__ct") - col("__ct"))
        .as("__ties"))
    val na = col("__na").cast("double")
    val nb = col("__nb")
    val n = col("__na") + col("__nb")
    val ua = col("__ra") - na * (col("__na") + 1) / lit(2)
    // n ≤ 1 would divide the tie correction by 0; an empty cohort makes
    // na·nb = 0 — both degenerate cases surface as NULL statistics, not
    // divisions (explicit under the repo's ANSI-on default)
    val sigma2 = when(n <= 1, lit(null).cast("double"))
      .otherwise((na * nb / lit(12)) *
        ((n + 1) - col("__ties") / (n.cast("double") * (n - 1))))
    a.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(ua, dp).as("u_a"),
      round(na * nb - ua, dp).as("u_b"),
      when(sigma2.isNull || isnan(sigma2) || sqrt(sigma2) === 0.0,
          lit(null).cast("double"))
        .otherwise(round((ua - na * nb / lit(2)) / sqrt(sigma2), dp)).as("z"),
      when(na * nb === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1) - lit(2) * ua / (na * nb), dp))
        .as("rank_biserial"))
  }

  /** Yuen's trimmed-mean two-sample test (Yuen 1974): compare LOCATION
    * robustly — each cohort's top and bottom ⌊trim·n⌋ values are
    * dropped from the mean and the variance is taken over the
    * WINSORIZED sample (tails clamped to the trim boundaries), giving
    *
    *   t = (m̄t_A − m̄t_B) / √(d_A + d_B),
    *   d_g = (wss_g − ws_g²/n_g) / (h_g(h_g−1)),  h_g = n_g − 2⌊trim·n⌋
    *
    * (the (n−1)·s²w/(h(h−1)) form with the sample-variance factor
    * cancelled). The gap in the robust tier this closes:
    * [[mannWhitneyU]] tests stochastic dominance, not means — under
    * unequal variances/shapes it can reject with equal trimmed means;
    * Yuen answers "did the TYPICAL value move" with outlier tails
    * excised, the right question for metric drift on heavy-tailed
    * corpus columns. Normal critical values (corpus-scale df, the
    * repo's z convention); `reject_05` is NULL when either h ≤ 1,
    * the pooled variance is 0, or either n < 20.
    *
    * Shape: the [[cramerVonMises]] envelope — per-distinct-value
    * histogram (the only corpus exchange), ONE two-phase
    * [[Windows.globalCumSums]] pass for both cohorts' CDFs, kept-count
    * interval arithmetic per histogram row, a 1-row rollup. */
  def yuenTrimmedTest(df: DataFrame, value: Column, inA: Column,
      trim: Double = 0.2, dp: Int = 6): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    val s = df.select(value.cast("double").as("__v"),
        when(inA, 1L).otherwise(0L).as("__a"),
        when(inA, 0L).otherwise(1L).as("__b"))
      .where(col("__v").isNotNull)
    val h = s.groupBy("__v").agg(sum(col("__a")).as("__ca"),
      sum(col("__b")).as("__cb"))
    val c = Windows.globalCumSums(h, Seq(col("__v")),
      Seq((col("__ca"): Column) -> "__cuma",
        (col("__cb"): Column) -> "__cumb"))
    val tot = h.agg(coalesce(sum(col("__ca")), lit(0L)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L)).as("__nb"))
    val withK = c.crossJoin(broadcast(tot))
      .withColumn("__ka", floor(lit(trim) * col("__na")).cast("long"))
      .withColumn("__kb", floor(lit(trim) * col("__nb")).cast("long"))
    val keptA = greatest(lit(0L), least(col("__cuma"), col("__na") - col("__ka")) -
      greatest(col("__cuma") - col("__ca"), col("__ka")))
    val keptB = greatest(lit(0L), least(col("__cumb"), col("__nb") - col("__kb")) -
      greatest(col("__cumb") - col("__cb"), col("__kb")))
    val agg = withK.agg(
      first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
      first(col("__ka")).as("__ka"), first(col("__kb")).as("__kb"),
      sum(keptA * col("__v")).as("__tsa"),
      sum(keptB * col("__v")).as("__tsb"),
      sum(keptA * col("__v") * col("__v")).as("__tqa"),
      sum(keptB * col("__v") * col("__v")).as("__tqb"),
      min(when(col("__cuma") >= col("__ka") + 1, col("__v"))).as("__vla"),
      min(when(col("__cuma") >= col("__na") - col("__ka"), col("__v")))
        .as("__vha"),
      min(when(col("__cumb") >= col("__kb") + 1, col("__v"))).as("__vlb"),
      min(when(col("__cumb") >= col("__nb") - col("__kb"), col("__v")))
        .as("__vhb"))
    val ha = col("n_a") - lit(2) * col("__ka")
    val hb = col("n_b") - lit(2) * col("__kb")
    val mta = when(ha > 0, col("__tsa") / ha)
    val mtb = when(hb > 0, col("__tsb") / hb)
    val wsa = col("__tsa") + col("__ka") * col("__vla") +
      col("__ka") * col("__vha")
    val wqa = col("__tqa") + col("__ka") * col("__vla") * col("__vla") +
      col("__ka") * col("__vha") * col("__vha")
    val wsb = col("__tsb") + col("__kb") * col("__vlb") +
      col("__kb") * col("__vhb")
    val wqb = col("__tqb") + col("__kb") * col("__vlb") * col("__vlb") +
      col("__kb") * col("__vhb") * col("__vhb")
    val da = (wqa - wsa * wsa / col("n_a")) /
      (ha.cast("double") * (ha - 1))
    val db = (wqb - wsb * wsb / col("n_b")) /
      (hb.cast("double") * (hb - 1))
    val ok = ha > 1 && hb > 1 && (da + db) > 0.0
    val z = (mta - mtb) / sqrt(da + db)
    agg.select(col("n_a"), col("n_b"), ha.as("h_a"), hb.as("h_b"),
      round(mta, dp).as("tmean_a"), round(mtb, dp).as("tmean_b"),
      round(mta - mtb, dp).as("diff"),
      when(ok, round(sqrt(da + db), dp)).as("se"),
      when(ok, round(z, dp)).as("z"),
      when(ok && col("n_a") >= 20 && col("n_b") >= 20, abs(z) > 1.96)
        .as("reject_05"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945): the PAIRED companion of
    * [[mannWhitneyU]] — "did metric x systematically move vs metric y on
    * the SAME items" (two scorers over one corpus, before/after a
    * pipeline change), without assuming the differences are normal.
    * Zero differences carry no sign information and are dropped before
    * ranking (the classic Wilcoxon convention); their count is reported.
    * |d| is ranked tie-averaged; W⁺/W⁻ are the positive/negative rank
    * sums; the tie-corrected normal z is
    *
    *   z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    *
    * Scale shape (the [[mannWhitneyU]] discipline): one row-level scan →
    * per-distinct-|d| histogram (the only corpus exchange), the
    * two-phase [[Windows.globalCumSum]] CDF for tie-averaged ranks, a
    * 1-row rollup. `reject_05` (two-sided, |z| > 1.96) is NULL when
    * n < 20 — the normal approximation is not trustworthy below that —
    * or when the tie-corrected variance is 0 (all |d| identical). */
  def wilcoxonSignedRank(df: DataFrame, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select((x.cast("double") - y.cast("double")).as("__d"))
      .where(col("__d").isNotNull)
    val h = s.groupBy(abs(col("__d")).as("__ad")).agg(
      sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__d") < 0, 1L).otherwise(0L)).as("__cn"),
      count(lit(1L)).as("__call"))
    val nz = h.where(col("__ad") > 0)
      .withColumn("__ct", col("__cp") + col("__cn"))
    val r = Windows.globalCumSum(nz, Seq(col("__ad")), col("__ct"), "__cum")
      .withColumn("__avgr",
        (col("__cum") - col("__ct")).cast("double") + (col("__ct") + 1) / lit(2.0))
    val a = r.agg(sum(col("__ct")).as("__n"),
      sum(col("__cp") * col("__avgr")).as("__wp"),
      sum(col("__cn") * col("__avgr")).as("__wn"),
      sum(col("__ct").cast("double") * col("__ct") * col("__ct") - col("__ct"))
        .as("__ties"))
    // the zero bucket is one histogram row; counting it is a second agg
    // over the bounded distinct-|d| table, not a second corpus scan
    val zeros = h.where(col("__ad") === 0)
      .agg(coalesce(sum(col("__call")), lit(0L)).as("n_zero"))
    val n = col("__n").cast("double")
    val mean = n * (n + 1) / lit(4.0)
    val sigma2 = n * (n + 1) * (lit(2.0) * n + 1) / lit(24.0) -
      col("__ties") / lit(48.0)
    val z = (col("__wp") - mean) / sqrt(sigma2)
    a.crossJoin(zeros).select(
      coalesce(col("__n"), lit(0L)).as("n"), col("n_zero"),
      round(col("__wp"), dp).as("w_plus"),
      round(col("__wn"), dp).as("w_minus"),
      when(col("__n").isNull || sigma2 <= 0.0, lit(null).cast("double"))
        .otherwise(round(z, dp)).as("z"),
      when(col("__n").isNull || sigma2 <= 0.0 || col("__n") < 20,
          lit(null).cast("boolean"))
        .otherwise(abs(z) > lit(1.959963984540054)).as("reject_05"))
  }

  /** Pettitt change-point test (Pettitt 1979): the RANK-based "did the
    * distribution shift, and when" — [[cusumChangepoint]]'s
    * nonparametric companion (CUSUM needs a mean/slack model; Pettitt
    * only needs an ordering). With tie-averaged value ranks r_i and
    * rows in `order` sequence,
    *
    *   U_t = 2·Σ_{i≤t} r_i − t(n+1),   K = max_{t<n} |U_t|
    *   p ≈ 2·exp(−6K² / (n³ + n²))     (the standard approximation)
    *
    * The split point is the t attaining K (earliest on ties). Doubled
    * ranks keep every statistic an exact integer, so the oracle
    * restates the algebra bit-for-bit.
    *
    * Scale shape: distinct-value histogram + one two-phase
    * [[Windows.globalCumSum]] for the tie-averaged ranks, a value-keyed
    * equi-join back, ONE more two-phase cumsum pass in time order
    * (rank sum and position share the exchange via
    * [[Windows.globalCumSums]]), and a 1-row max/argmax rollup — no
    * single-reducer window anywhere. `order` must be a total order
    * (tie-break it like q_ohlc); K is NULL when n < 2. */
  def pettittTest(df: DataFrame, order: Seq[Column], value: Column,
      dp: Int = 6): DataFrame = {
    require(order.nonEmpty, "pettittTest needs at least one order column")
    val s = df.select(order.zipWithIndex.map { case (c, i) =>
        c.as(s"__o$i") } :+ value.cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
    val oc = order.indices.map(i => col(s"__o$i"))
    val h = s.groupBy("__v").agg(count(lit(1L)).as("__c"))
    // 2× tie-averaged rank: 2·cum_incl − count + 1 (exact long)
    val r = Windows.globalCumSum(h, Seq(col("__v")), col("__c"), "__cum")
      .select(col("__v"), (col("__cum") * 2 - col("__c") + 1).as("__r2"))
    val ranked = s.join(r, "__v")
    val cum = Windows.globalCumSums(ranked, oc,
      Seq((col("__r2"): Column) -> "__s2", (lit(1L): Column) -> "__t"))
    val tot = h.agg(sum(col("__c")).as("__n"))
    val u = cum.crossJoin(broadcast(tot))
      .where(col("__t") < col("__n"))
      .select(col("__t"),
        abs(col("__s2") - col("__t") * (col("__n") + 1)).as("__au"))
    val m = u.agg(
        max(struct(col("__au"), (-col("__t")).as("__nt"))).as("__mx"))
      .crossJoin(broadcast(tot.select(coalesce(col("__n"), lit(0L))
        .as("__n"))))
    val n = col("__n").cast("double")
    val k = col("__mx").getField("__au")
    val p = lit(2.0) * exp(lit(-6.0) * k * k / (n * n * n + n * n))
    m.select(
      col("__n").as("n"),
      k.as("k_stat"),
      (-col("__mx").getField("__nt")).as("change_t"),
      when(col("__n") >= 2, round(least(p, lit(1.0)), dp)).as("p_approx"),
      when(col("__n") >= 2, least(p, lit(1.0)) < 0.05).as("reject_05"))
  }

  /** One-way ANOVA F (Fisher): does the mean of `value` differ across
    * the levels of `group`?  F = [SSB/(k−1)] / [SSW/(N−k)] with the
    * between/within sums of squares recovered from per-group
    * (n, Σx, Σx²) moments — the k-group mean test completing the
    * location family (t-test: 2 groups; MWU/KS: rank/shape; this:
    * k means). Also reports η² = SSB/SST effect size.
    *
    * Shape: ONE group-keyed moment rollup (the only corpus exchange,
    * |groups| rows out) and a 1-row verdict — no window, no join. The
    * 0.05 verdict compares F·df1 against [[chiSq95]](df1) — the
    * df2→∞ χ² limit of the F distribution, valid only when df2 ≫ df1;
    * `reject_05` is therefore NULL when df2 < 20·df1 (small-group API
    * use would otherwise over-reject: the true F crit at (1,4) is
    * 7.71 vs χ²'s 3.84). F is NULL when k < 2, N ≤ k, or SSW = 0. */
  def anovaF(df: DataFrame, value: Column, group: Column,
      dp: Int = 6): DataFrame = {
    val base = df.select(group.as("__g"), value.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__g").isNotNull)
    val per = base.groupBy("__g").agg(count(lit(1L)).as("__n"),
      sum(col("__v")).as("__s"), sum(col("__v") * col("__v")).as("__ss"))
    val tot = per.agg(
      count(lit(1L)).as("k"),
      sum(col("__n")).as("n"),
      sum(col("__s")).as("__ts"),
      sum(col("__ss")).as("__tss"),
      sum(col("__s") * col("__s") / col("__n")).as("__sb"))
    val ssb = col("__sb") - col("__ts") * col("__ts") / col("n")
    val ssw = col("__tss") - col("__sb")
    val sst = col("__tss") - col("__ts") * col("__ts") / col("n")
    val df1 = (col("k") - 1).cast("double")
    val df2 = (col("n") - col("k")).cast("double")
    val f = (ssb / df1) / (ssw / df2)
    val degenerate = col("k") < 2 || df2 <= 0 || ssw <= 0.0
    tot.select(col("k"), col("n"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(f, dp)).as("f"),
      (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
      when(sst > 0, round(ssb / sst, dp)).as("eta_sq"),
      // the χ² verdict is the df2→∞ limit of the F distribution; at
      // small df2 it substantially over-rejects (true F crit at (1,4)
      // is 7.71 vs χ²'s 3.84) — NULL, not a wrong verdict, unless
      // df2 >> df1 (the large-sample regime this engine targets)
      when(degenerate || df2 < lit(20.0) * df1, lit(null).cast("boolean"))
        .otherwise(f * df1 > chiSq95(df1)).as("reject_05"))
  }

  /** First-order partial correlation: the linear association of x and
    * y with the confounder z REGRESSED OUT of both —
    *
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²))
    *
    * the one-line answer to "is the metric pair really related, or do
    * both just track z" (doc length confounding quality vs score,
    * time confounding any pair of drifting metrics). Reports the three
    * raw correlations beside the partial so the comparison is in the
    * row.
    *
    * Shape: ONE fused moment aggregate (9 sums + count in a single
    * scan, map-side partial) and a 1-row closed form — no window, no
    * join, no second pass. Correlations are NULL for constant columns
    * (0 variance); the partial is NULL when either control correlation
    * is ±1 (nothing left to correlate). */
  def partialCorr(df: DataFrame, x: Column, y: Column, z: Column,
      dp: Int = 6): DataFrame = {
    val s = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"),
        z.cast("double").as("__z"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__z").isNotNull)
    val m = s.agg(count(lit(1L)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__z")).as("__sz"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__z") * col("__z")).as("__szz"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__z")).as("__sxz"),
      sum(col("__y") * col("__z")).as("__syz"))
    val n = col("__n").cast("double")
    def cov(sab: Column, sa: Column, sb: Column) = n * sab - sa * sb
    def varr(saa: Column, sa: Column) = n * saa - sa * sa
    val vx = varr(col("__sxx"), col("__sx"))
    val vy = varr(col("__syy"), col("__sy"))
    val vz = varr(col("__szz"), col("__sz"))
    def r(sab: Column, sa: Column, sb: Column, va: Column, vb: Column) =
      when(va > 0.0 && vb > 0.0, cov(sab, sa, sb) / sqrt(va * vb))
    val rxy = r(col("__sxy"), col("__sx"), col("__sy"), vx, vy)
    val rxz = r(col("__sxz"), col("__sx"), col("__sz"), vx, vz)
    val ryz = r(col("__syz"), col("__sy"), col("__sz"), vy, vz)
    val den = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    m.select(col("__n").as("n"),
      round(rxy, dp).as("r_xy"), round(rxz, dp).as("r_xz"),
      round(ryz, dp).as("r_yz"),
      when(rxy.isNotNull && rxz.isNotNull && ryz.isNotNull && den > 0.0,
        round((rxy - rxz * ryz) / sqrt(den), dp)).as("r_xy_given_z"))
  }

  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds ratio
    * (Mantel & Haenszel 1959): does a binary exposure move a binary
    * outcome CONSISTENTLY across strata — the stratified A/B readout
    * that a pooled 2×2 gets wrong whenever the strata differ in base
    * rate (Simpson's paradox). Per stratum s with cells (a,b,c,d) and
    * n_s rows:
    *
    *   OR_MH = Σ aᵢdᵢ/nᵢ / Σ bᵢcᵢ/nᵢ
    *   χ²    = (Σaᵢ − ΣEᵢ)² / ΣVᵢ,  Eᵢ = (a+b)(a+c)/n,
    *   Vᵢ    = (a+b)(c+d)(a+c)(b+d) / (n²(n−1))     ~ χ²(1)
    *
    * Strata with n < 2 contribute no variance (Vᵢ undefined) but stay
    * in the OR sums, the standard convention. OR is NULL when the
    * denominator Σbc/n is 0; χ² is NULL when ΣV = 0.
    *
    * Shape: ONE strata-keyed cell rollup (the only corpus exchange,
    * |strata| rows out) + a 1-row verdict on the shared [[chiSq95]]
    * closed form — no window, no join. */
  def cmhTest(df: DataFrame, strata: Column, exposed: Column,
      success: Column, dp: Int = 6): DataFrame = {
    val base = df.select(strata.as("__g"), exposed.cast("boolean").as("__e"),
        success.cast("boolean").as("__y"))
      .where(col("__g").isNotNull && col("__e").isNotNull &&
        col("__y").isNotNull)
    val per = base.groupBy("__g").agg(
      sum(when(col("__e") && col("__y"), 1L).otherwise(0L)).as("__a"),
      sum(when(col("__e") && !col("__y"), 1L).otherwise(0L)).as("__b"),
      sum(when(!col("__e") && col("__y"), 1L).otherwise(0L)).as("__c"),
      sum(when(!col("__e") && !col("__y"), 1L).otherwise(0L)).as("__d"))
    val n = (col("__a") + col("__b") + col("__c") + col("__d"))
      .cast("double")
    val agg = per.agg(
      count(lit(1L)).as("n_strata"),
      sum(n).as("__n"),
      sum(col("__a")).as("__sa"),
      sum(col("__a").cast("double") * col("__d") / n).as("__sad"),
      sum(col("__b").cast("double") * col("__c") / n).as("__sbc"),
      sum((col("__a") + col("__b")).cast("double") * (col("__a") + col("__c"))
        / n).as("__se"),
      sum(when(n > 1,
          (col("__a") + col("__b")).cast("double") * (col("__c") + col("__d"))
            * (col("__a") + col("__c")) * (col("__b") + col("__d"))
            / (n * n * (n - 1)))
        .otherwise(0.0)).as("__sv"))
    val d2 = col("__sa").cast("double") - col("__se")
    val chi2 = d2 * d2 / col("__sv")
    agg.select(col("n_strata"),
      coalesce(col("__n"), lit(0.0)).cast("long").as("n"),
      when(col("__sbc") > 0.0, round(col("__sad") / col("__sbc"), dp))
        .as("or_mh"),
      when(col("__sv") > 0.0, round(chi2, dp)).as("chi2"),
      when(col("__sv") > 0.0, chi2 > chiSq95(lit(1.0))).as("reject_05"))
  }

  /** Breslow–Day homogeneity test (Breslow & Day 1980, §IV.4): is the
    * odds ratio actually COMMON across strata — the assumption
    * [[cmhTest]] pools under without checking. Per stratum, the
    * expected exposed-success count ã under the MH common odds ratio ψ
    * solves the quadratic (ψ−1)ã² − [ψ(r₁+c₁) + (n−r₁−c₁)]ã + ψr₁c₁ = 0
    * (the root keeping all four expected cells positive; linear
    * ã = r₁c₁/n when ψ = 1), with asymptotic variance
    * V = 1/(1/ã + 1/(r₁−ã) + 1/(c₁−ã) + 1/(n−r₁−c₁+ã)); then
    * BD = Σ (a−ã)²/V is χ²(K−1) under homogeneity. A REJECT here means
    * q_cmh's pooled or_mh is averaging genuinely different effects —
    * report per-stratum ORs instead. (The small Tarone adjustment is
    * omitted; it shifts BD by O(1) in the last term and matters only
    * at tiny strata counts.)
    *
    * Strata where the root falls outside (max(0, r₁+c₁−n), min(r₁, c₁))
    * or V ≤ 0 (degenerate margins — an empty arm or outcome) carry no
    * information about ψ and are excluded; `n_used` counts the rest and
    * df = n_used − 1. `reject_05` (vs [[chiSq95]]) is NULL when
    * n_used < 2 or ψ is undefined.
    *
    * Shape: the [[cmhTest]] exchanges exactly — one stratum-keyed
    * 4-count rollup, a broadcast 1-row ψ, per-stratum closed-form
    * algebra on the strata-bounded table, 1 row out. */
  def breslowDay(df: DataFrame, strata: Column, exposed: Column,
      success: Column, dp: Int = 6): DataFrame = {
    val base = df.select(strata.as("__g"), exposed.cast("boolean").as("__e"),
        success.cast("boolean").as("__y"))
      .where(col("__g").isNotNull && col("__e").isNotNull &&
        col("__y").isNotNull)
    val per = base.groupBy("__g").agg(
      sum(when(col("__e") && col("__y"), 1L).otherwise(0L)).as("__a"),
      sum(when(col("__e") && !col("__y"), 1L).otherwise(0L)).as("__b"),
      sum(when(!col("__e") && col("__y"), 1L).otherwise(0L)).as("__c"),
      sum(when(!col("__e") && !col("__y"), 1L).otherwise(0L)).as("__d"))
    val nn = (col("__a") + col("__b") + col("__c") + col("__d"))
      .cast("double")
    val psiTab = per.agg(
      sum(col("__a").cast("double") * col("__d") / nn).as("__sad"),
      sum(col("__b").cast("double") * col("__c") / nn).as("__sbc"))
      .select(when(col("__sbc") > 0.0, col("__sad") / col("__sbc"))
        .as("__psi"))
    val r1 = (col("__a") + col("__b")).cast("double")
    val c1 = (col("__a") + col("__c")).cast("double")
    val psi = col("__psi")
    val aa = psi - 1.0
    val bp = psi * (r1 + c1) + (nn - r1 - c1)
    val cc = psi * r1 * c1
    val atil = when(abs(aa) < 1e-12, r1 * c1 / nn)
      .otherwise((bp - sqrt(bp * bp - lit(4.0) * aa * cc)) / (lit(2.0) * aa))
    val v = lit(1.0) / (lit(1.0) / atil + lit(1.0) / (r1 - atil) +
      lit(1.0) / (c1 - atil) + lit(1.0) / (nn - r1 - c1 + atil))
    val valid = psi.isNotNull &&
      atil > greatest(lit(0.0), r1 + c1 - nn) && atil < least(r1, c1) &&
      v > 0.0
    val term = (col("__a") - atil) * (col("__a") - atil) / v
    val agg = per.crossJoin(broadcast(psiTab)).agg(
      count(lit(1L)).as("n_strata"),
      sum(when(valid, 1L).otherwise(0L)).as("n_used"),
      sum(when(valid, term)).as("__bd"),
      first(psi).as("__p"))
    val dfree = (col("n_used") - 1).cast("double")
    agg.select(col("n_strata"), col("n_used"),
      round(col("__p"), dp).as("or_mh"),
      when(col("n_used") >= 2, round(coalesce(col("__bd"), lit(0.0)), dp))
        .as("bd_chi2"),
      when(col("n_used") >= 2, col("n_used") - 1).as("df"),
      when(col("n_used") < 2 || col("__p").isNull,
          lit(null).cast("boolean"))
        .otherwise(coalesce(col("__bd"), lit(0.0)) > chiSq95(dfree))
        .as("reject_05"))
  }

  /** χ²₀.₉₅(d): exact table constants for d ≤ 4 (Wilson–Hilferty is
    * ~2.5% LOW at d = 1 — 3.747 vs the true 3.841 — which made df=1
    * verdicts mildly anti-conservative), the Wilson–Hilferty cube
    * d·(1 − 2/(9d) + z₀.₉₅·√(2/(9d)))³ for d ≥ 5 (within ~0.3%
    * there). Restated verbatim — CASE arms included — by the DuckDB
    * oracles (a closed form both engines compute identically beats a
    * quantile table). */
  private def chiSq95(d: Column): Column = {
    val t = lit(2.0) / (lit(9.0) * d)
    when(d === 1.0, lit(3.841458820694124))
      .when(d === 2.0, lit(5.991464547107979))
      .when(d === 3.0, lit(7.814727903251179))
      .when(d === 4.0, lit(9.487729036781154))
      .otherwise(d * pow(lit(1.0) - t + lit(1.644853626951473) * sqrt(t), 3))
  }

  /** Scala twin of [[chiSq95]] for driver-side verdicts (ljungBox). */
  private def chiSq95Scala(d: Double): Double = d match {
    case 1.0 => 3.841458820694124
    case 2.0 => 5.991464547107979
    case 3.0 => 7.814727903251179
    case 4.0 => 9.487729036781154
    case _ =>
      val t = 2.0 / (9.0 * d)
      d * math.pow(1.0 - t + 1.644853626951473 * math.sqrt(t), 3)
  }

  /** Jonckheere–Terpstra ordered-alternative trend test (Jonckheere
    * 1954): does `value` increase MONOTONICALLY across the given group
    * ORDER — the question [[kruskalWallis]] cannot ask (KW sees "any
    * group differs"; JT is powered specifically against the ordered
    * alternative: quality degrading across time buckets, score rising
    * with model size). JT = Σ_{h<g} [#{x_h < x_g} + ½·ties], with the
    * full tie-corrected variance (Hollander & Wolfe):
    *
    *   Var = A/72 + B/(36·N(N−1)(N−2)) + C/(8·N(N−1))
    *   A = N(N−1)(2N+5) − Σᵢ nᵢ(nᵢ−1)(2nᵢ+5) − Σᵥ t(t−1)(2t+5)
    *   B = Σᵢ nᵢ(nᵢ−1)(nᵢ−2) · Σᵥ t(t−1)(t−2),
    *   C = Σᵢ nᵢ(nᵢ−1) · Σᵥ t(t−1)
    *
    * At k = 2 this IS Mann–Whitney (differential-spec-pinned,
    * including ties). JT is accumulated doubled so every pair count is
    * an exact integer.
    *
    * Scale shape: one distinct-value histogram with k conditional
    * count columns (the only corpus exchange), ONE two-phase
    * [[Windows.globalCumSums]] pass carrying all k per-group CDFs in a
    * single range exchange (no per-group single-reducer window), and a
    * 1-row rollup. k ≤ 8 by contract (the conditional-column unroll);
    * z is NULL when Var ≤ 0 (all values identical) or k < 2. */
  def jonckheereTest(df: DataFrame, value: Column, group: Column,
      orderedGroups: Seq[String], dp: Int = 6): DataFrame = {
    val k = orderedGroups.size
    require(k >= 2 && k <= 8,
      s"need 2..8 ordered groups, got $k")
    require(orderedGroups.distinct.size == k, "ordered groups must be distinct")
    val g = group.cast("string")
    val base = df.select(value.cast("double").as("__v"), g.as("__g"))
      .where(col("__v").isNotNull && col("__g").isin(orderedGroups: _*))
    val histCols = orderedGroups.zipWithIndex.map { case (gn, i) =>
      sum(when(col("__g") === gn, 1L).otherwise(0L)).as(s"__c$i")
    }
    val hist = base.groupBy("__v").agg(histCols.head, histCols.tail: _*)
    val cum = Windows.globalCumSums(hist, Seq(col("__v")),
      orderedGroups.indices.map(i => (col(s"__c$i"): Column) -> s"__cum$i"))
    // doubled JT contribution of the value block: for each group g,
    // c_g · Σ_{h<g} (2·below_h + ties_h)
    val jt2row = (1 until k).map { gi =>
      val before = (0 until gi).map { h =>
        (col(s"__cum$h") - col(s"__c$h")) * 2 + col(s"__c$h")
      }.reduce(_ + _)
      col(s"__c$gi") * before
    }.reduce(_ + _)
    val t = orderedGroups.indices.map(i => col(s"__c$i")).reduce(_ + _)
    val aggCols = // tie moments ride the same rollup as the statistic
      sum(jt2row).as("__jt2") ::
        sum(t * (t - 1) * (lit(2L) * t + 5)).as("__tt5") ::
        sum(t * (t - 1) * (t - 2)).as("__tt2") ::
        sum(t * (t - 1)).as("__tt1") ::
        orderedGroups.indices.map(i => sum(col(s"__c$i")).as(s"__n$i"))
          .toList
    val agg = cum.agg(aggCols.head, aggCols.tail: _*)
    val ns = orderedGroups.indices.map(i => col(s"__n$i"))
    val bigN = ns.reduce(_ + _)
    val sumN2 = ns.map(n => n * n).reduce(_ + _)
    val gn5 = ns.map(n => n * (n - 1) * (lit(2L) * n + 5)).reduce(_ + _)
    val gn2 = ns.map(n => n * (n - 1) * (n - 2)).reduce(_ + _)
    val gn1 = ns.map(n => n * (n - 1)).reduce(_ + _)
    val nD = bigN.cast("double")
    val a = nD * (nD - 1) * (lit(2.0) * nD + 5) - gn5 - col("__tt5")
    // the B and C terms' divisors hit 0 at N <= 2 / N <= 1; their
    // numerators are 0 there too (no triple/pair exists), so the guards
    // only dodge ANSI divide-by-zero, never change the value
    val vr = a / 72.0 +
      when(nD > 2, gn2.cast("double") * col("__tt2") /
        (lit(36.0) * nD * (nD - 1) * (nD - 2))).otherwise(0.0) +
      when(nD > 1, gn1.cast("double") * col("__tt1") /
        (lit(8.0) * nD * (nD - 1))).otherwise(0.0)
    val mean2 = (nD * nD - sumN2) / 2.0
    val z = (col("__jt2") - mean2) / (lit(2.0) * sqrt(vr))
    agg.select(lit(k).as("k"), bigN.as("n"),
      round(col("__jt2") / 2.0, dp).as("jt"),
      when(vr > 0.0, round(z, dp)).as("z"),
      when(vr > 0.0, abs(z) > lit(1.959963984540054)).as("reject_05"))
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952): the k-group rank test —
    * [[mannWhitneyU]] generalized past two cohorts, for "does ANY
    * group's distribution sit higher" without normality assumptions.
    * Tie-averaged ranks from the distinct-value histogram CDF, the
    * standard tie correction H/(1 − Σ(t³−t)/(N³−N)), and the χ²(k−1)
    * approximation for the 0.05 verdict (via [[chiSq95]], so the
    * oracle restates it exactly).
    *
    * Scale shape: one (value, group) rollup (the only corpus
    * exchange), a value-keyed rollup off it, the two-phase
    * [[Windows.globalCumSum]] CDF over the distinct-value table (no
    * single-reducer window for continuous columns), an equi-join back,
    * and |groups|-bounded algebra. H is NULL when every value is
    * identical (tie correction hits 0) or k < 2. */
  def kruskalWallis(df: DataFrame, value: Column, group: Column,
      dp: Int = 6): DataFrame = {
    val base = df.select(group.as("__g"), value.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__g").isNotNull)
    val cells = base.groupBy("__v", "__g").agg(count(lit(1L)).as("__c"))
    val hv = cells.groupBy("__v").agg(sum(col("__c")).as("__ct"))
    val ranked = Windows.globalCumSum(hv, Seq(col("__v")), col("__ct"), "__cum")
      .select(col("__v"), col("__ct"),
        // average of the tie run's positions
        ((col("__cum") - col("__ct")).cast("double") +
          (col("__ct") + 1) / lit(2.0)).as("__avgr"))
    val perG = cells.join(ranked, "__v").groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * col("__avgr")).as("__rg"))
    val ties = ranked.agg(coalesce(sum(col("__ct").cast("double") *
      col("__ct") * col("__ct") - col("__ct")), lit(0.0)).as("__tie"))
    val tot = perG.crossJoin(broadcast(ties)).agg(
      count(lit(1L)).as("k"),
      sum(col("__ng")).as("n"),
      sum(col("__rg") * col("__rg") / col("__ng")).as("__r2"),
      max(col("__tie")).as("__tie"))
    val n = col("n").cast("double")
    val h = lit(12.0) / (n * (n + 1)) * col("__r2") - lit(3.0) * (n + 1)
    val tieC = lit(1.0) - col("__tie") / (n * n * n - n)
    val hc = h / tieC
    val df1 = (col("k") - 1).cast("double")
    val degenerate = col("k") < 2 || tieC <= 0.0
    tot.select(col("k"), col("n"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(hc, dp)).as("h"),
      (col("k") - 1).as("df"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(chiSq95(df1), dp)).as("crit_05"),
      when(degenerate, lit(null).cast("boolean"))
        .otherwise(hc > chiSq95(df1)).as("reject_05"))
  }

  /** Dunn's post-hoc test (Dunn 1964) — WHICH groups differ once
    * [[kruskalWallis]] rejects: every pair (a, b) is compared on the
    * SAME pooled tie-averaged ranks KW used (re-ranking within each
    * pair, as pairwise Mann–Whitney would, breaks the family's shared
    * scale — the classical mistake Dunn's procedure exists to avoid):
    *
    *   z_ab = (R̄_a − R̄_b) / √[ (N(N+1)/12 − Σ(t³−t)/(12(N−1))) (1/n_a + 1/n_b) ]
    *
    * with two-sided p via [[normalCdf]] and Benjamini–Hochberg
    * adjustment over the k(k−1)/2 pairs ([[bhAdjust]] — the repo's
    * standing multiple-testing control; classic Dunn used Bonferroni,
    * which BH dominates). p is computed from the ROUNDED z (the
    * [[zScreenPerGroup]] consistency discipline); `reject_05` is
    * p_adj ≤ 0.05. Pairs whose variance term is non-positive (N < 2 or
    * everything tied) are dropped.
    *
    * Shape: the KW exchanges exactly — (value, group) cells, the
    * two-phase [[Windows.globalCumSum]] rank CDF, one group rollup —
    * then the pair table is a join of the GROUP-CARDINALITY-bounded
    * summary with itself (k(k−1)/2 rows; the BH window rides that
    * bounded table, never the corpus). */
  def dunnTest(df: DataFrame, value: Column, group: Column,
      dp: Int = 6): DataFrame = {
    val base = df.select(group.cast("string").as("__g"),
        value.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__g").isNotNull)
    val cells = base.groupBy("__v", "__g").agg(count(lit(1L)).as("__c"))
    val hv = cells.groupBy("__v").agg(sum(col("__c")).as("__ct"))
    val ranked = Windows.globalCumSum(hv, Seq(col("__v")), col("__ct"), "__cum")
      .select(col("__v"), col("__ct"),
        ((col("__cum") - col("__ct")).cast("double") +
          (col("__ct") + 1) / lit(2.0)).as("__avgr"))
    val perG = cells.join(ranked, "__v").groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * col("__avgr")).as("__rg"))
    val ties = ranked.agg(coalesce(sum(col("__ct").cast("double") *
      col("__ct") * col("__ct") - col("__ct")), lit(0.0)).as("__tie"))
    val tot = perG.agg(sum(col("__ng")).as("__N"))
    val a = perG.select(col("__g").as("g_a"), col("__ng").as("__na"),
      (col("__rg") / col("__ng")).as("__ra"))
    val b = perG.select(col("__g").as("g_b"), col("__ng").as("__nb"),
      (col("__rg") / col("__ng")).as("__rb"))
    val nD = col("__N").cast("double")
    val sigma2 = (nD * (nD + 1) / lit(12.0) -
        col("__tie") / (lit(12.0) * (nD - 1))) *
      (lit(1.0) / col("__na") + lit(1.0) / col("__nb"))
    val pairs = a.join(broadcast(b), col("g_a") < col("g_b"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .where(sigma2 > 0.0)
      .select(col("g_a"), col("g_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("__ra"), dp).as("mean_rank_a"),
        round(col("__rb"), dp).as("mean_rank_b"),
        round((col("__ra") - col("__rb")) / sqrt(sigma2), dp).as("z"))
    val withP = pairs.withColumn("p",
      round(lit(2.0) * (lit(1.0) - normalCdf(abs(col("z")))), dp))
    bhAdjust(withP, "p", concat(col("g_a"), lit("|"), col("g_b")), dp)
      .withColumn("reject_05", col("p_adj") <= 0.05)
  }

  /** Brown–Forsythe variance-homogeneity test (Brown & Forsythe 1974 —
    * Levene's test on MEDIAN-centered absolute deviations, the robust
    * form): [[anovaF]] applied to z = |x − median_g|. The gatekeeper
    * in front of mean tests (ANOVA assumes equal variances) and a
    * direct per-slice dispersion-drift probe.
    *
    * `exact = false` (default, the 100 TB path) takes group medians
    * from one mergeable approx_percentile rollup; `exact = true` is
    * the oracle-audit variant on Spark's exact percentile. Medians
    * broadcast back (|groups| rows); then the one-rollup [[anovaF]]
    * shape on z. */
  def brownForsythe(df: DataFrame, value: Column, group: Column,
      exact: Boolean = false, accuracy: Int = 10000,
      dp: Int = 6): DataFrame = {
    val base = df.select(group.as("__g0"), value.cast("double").as("__v0"))
      .where(col("__v0").isNotNull && col("__g0").isNotNull)
    val med =
      if (exact)
        // grouped rank selection, not the built-in's per-group boxed
        // map (r17 — bit-identical, see exactPercentileByGroup)
        exactPercentileByGroup(base, col("__g0"), col("__v0"),
          Seq(0.5 -> "__m")).withColumnRenamed("__g", "__g0")
      else
        base.groupBy("__g0").agg(
          approx_percentile(col("__v0"), lit(0.5), lit(accuracy)).as("__m"))
    val z = base.join(broadcast(med), "__g0")
      .select(col("__g0"), abs(col("__v0") - col("__m")).as("__z"))
    anovaF(z, col("__z"), col("__g0"), dp)
  }

  /** Fleiss' κ multi-rater agreement (Fleiss 1971) over a long table
    * of (item, label) ratings — [[cohenKappa]]'s N-rater sibling for
    * redundantly-annotated data: per-item pairwise agreement
    * `P_i = Σ_j n_ij(n_ij−1) / (n_i(n_i−1))` averaged across items,
    * against the chance agreement of the pooled label marginals.
    * Rating counts may vary per item (the P_i form generalizes);
    * items with fewer than 2 ratings carry no pairs and are excluded
    * everywhere (including the marginals). κ is NULL when pₑ = 1.
    *
    * Scale shape: one (item, label) rollup, one item rollup, and
    * label-cardinality marginals — the exchanges carry the rated-item
    * space, never the corpus. */
  def fleissKappa(ratings: DataFrame, itemCol: String, labelCol: String,
      dp: Int = 6): DataFrame = {
    val cell = ratings.groupBy(col(itemCol).as("__i"),
        col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1L)).as("__nij"))
    val perItem = cell.groupBy("__i").agg(
        sum(col("__nij")).as("__ni"),
        sum(col("__nij") * (col("__nij") - 1)).as("__pairs"))
      .where(col("__ni") >= 2)
    val kept = cell.join(perItem.select("__i"), "__i")
    val pb = perItem.agg(count(lit(1L)).as("n_items"),
      avg(col("__pairs").cast("double") /
        (col("__ni").cast("double") * (col("__ni") - 1))).as("__pbar"))
    val mg = kept.groupBy("__l").agg(sum(col("__nij")).as("__cj"))
      .agg(sum(col("__cj").cast("double") * col("__cj")).as("__sq"),
        sum(col("__cj")).as("__tot"))
    val pe = col("__sq") / (col("__tot").cast("double") * col("__tot"))
    pb.crossJoin(mg).select(col("n_items"), col("__tot").as("n_ratings"),
      round(col("__pbar"), dp).as("p_bar"), round(pe, dp).as("p_e"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise(round((col("__pbar") - pe) / (lit(1) - pe), dp))
        .as("kappa"))
  }

  /** Krippendorff's α (nominal data; Krippendorff, Content Analysis
    * §12): the agreement coefficient that SURVIVES missing ratings —
    * unlike [[fleissKappa]], which silently assumes comparable rating
    * counts, α is defined on whatever (item, label) ratings exist,
    * weighting each item's pairable ratings by 1/(m_u−1). Real
    * annotation tables (multi-rater labeling with skips) need exactly
    * this. Nominal distance metric; α = 1 − D_o/D_e over the
    * coincidence matrix, computed WITHOUT materializing the matrix:
    *
    *   Σ_{c≠k} o_ck = Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1)
    *   n_c = Σ_k o_ck = Σ_u n_uc   (items with m_u ≥ 2)
    *   α = 1 − (n−1) · Σ_{c≠k} o_ck / (n² − Σ_c n_c²)
    *
    * Items with fewer than 2 ratings carry no pairable values and are
    * excluded everywhere (the standard treatment). α is NULL when no
    * item is pairable or when every rating is one label (D_e = 0).
    * Returns (n_items, n_ratings, n_labels, alpha).
    *
    * Scale shape: one (item, label) rollup, one item rollup, one label
    * rollup — the [[fleissKappa]] exchanges exactly; nothing is
    * corpus-sized past the first rollup. */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      labelCol: String, dp: Int = 6): DataFrame = {
    // NULL items/labels drop up front (as in the interval twin): a
    // missing rating is ABSENCE, not a label category — and a NULL
    // item key would count into D_o via the item rollup while the
    // marginal equi-join dropped it, making α internally inconsistent
    val cell = ratings
      .where(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1L)).as("__nuc"))
      .localCheckpoint(true) // item rollup + label marginals both read it
    val perItem = cell.groupBy("__i").agg(
        sum(col("__nuc")).as("__mu"),
        sum(col("__nuc") * col("__nuc")).as("__sq"))
      .where(col("__mu") >= 2)
    val items = perItem.agg(count(lit(1L)).as("n_items"),
      coalesce(sum((col("__mu").cast("double") * col("__mu") - col("__sq")) /
        (col("__mu") - 1).cast("double")), lit(0.0)).as("__do"))
    val marg = cell.join(perItem.select("__i"), "__i")
      .groupBy("__l").agg(sum(col("__nuc")).as("__nc"))
      .agg(count(lit(1L)).as("n_labels"), sum(col("__nc")).as("__n"),
        sum(col("__nc").cast("double") * col("__nc")).as("__nc2"))
    val deNum = col("__n").cast("double") * col("__n") - col("__nc2")
    items.crossJoin(marg).select(
      col("n_items"), coalesce(col("__n"), lit(0L)).as("n_ratings"),
      col("n_labels"),
      when(col("n_items") === 0 || deNum <= 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) -
          (col("__n") - 1).cast("double") * col("__do") / deNum, dp))
        .as("alpha"))
  }

  /** Krippendorff's α for INTERVAL data (numeric ratings; squared
    * difference metric) — [[krippendorffAlpha]]'s companion for score
    * annotations (quality 1-5, reward-model scores) where "how far
    * apart" matters, still robust to missing ratings. Entirely from
    * moments, no coincidence matrix and no pair expansion:
    *
    *   D_o-num = Σ_u (m_u·Σv²_u − (Σv_u)²)/(m_u − 1)
    *   D_e-num = n·Σv² − (Σv)²        (over pairable items' ratings)
    *   α = 1 − (n−1)·D_o-num / D_e-num
    *
    * (the ordered-pair factor 2 cancels). Items with < 2 ratings are
    * excluded everywhere; α is NULL when nothing is pairable or all
    * values are equal (D_e = 0). On {0,1} data this equals the nominal
    * α exactly (δ² is the 0/1 disagreement indicator there) — the
    * differential identity the spec pins. ONE (item) moment rollup +
    * 1-row algebra. Returns (n_items, n_ratings, alpha). */
  def krippendorffAlphaInterval(ratings: DataFrame, itemCol: String,
      valueCol: String, dp: Int = 6): DataFrame = {
    val base = ratings.select(col(itemCol).as("__i"),
        col(valueCol).cast("double").as("__v"))
      .where(col("__i").isNotNull && col("__v").isNotNull)
    val perItem = base.groupBy("__i").agg(count(lit(1L)).as("__m"),
        sum(col("__v")).as("__s"), sum(col("__v") * col("__v")).as("__ss"))
      .where(col("__m") >= 2)
    perItem.agg(
        count(lit(1L)).as("n_items"),
        sum(col("__m")).as("__n"),
        coalesce(sum((col("__m") * col("__ss") - col("__s") * col("__s")) /
          (col("__m") - 1).cast("double")), lit(0.0)).as("__do"),
        sum(col("__s")).as("__ts"), sum(col("__ss")).as("__tss"))
      .select(col("n_items"), coalesce(col("__n"), lit(0L)).as("n_ratings"),
        when(col("n_items") === 0 ||
            col("__n") * col("__tss") - col("__ts") * col("__ts") <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(lit(1.0) - (col("__n") - 1).cast("double") *
            col("__do") /
            (col("__n") * col("__tss") - col("__ts") * col("__ts")), dp))
          .as("alpha"))
  }

  /** Krippendorff's α for ORDINAL data — the Likert/grade-scale member
    * of the α family ([[krippendorffAlpha]] treats 1-vs-2 and 1-vs-5 as
    * equally wrong; [[krippendorffAlphaInterval]] prices them by raw
    * numeric gap, which overweights arbitrary level spacing). The
    * ordinal metric prices a (c, k) disagreement by the MARGINAL MASS
    * between the levels,
    *
    *   δ²(c,k) = (Σ_{g=c..k} n_g − (n_c + n_k)/2)²
    *
    * so skipping a rarely-used middle level costs little and jumping
    * across popular ones costs much — Krippendorff's own prescription.
    * α = 1 − (n−1)·D_o/D_e with D_o = Σ_u Σ_{c≠k} n_uc·n_uk·δ²/(m_u−1)
    * and D_e = Σ_{c≠k} n_c·n_k·δ², the [[krippendorffAlpha]] algebra
    * with δ² inserted (δ²≡1 recovers it — on a 2-level scale the
    * single pair's δ² cancels, so ordinal == nominal exactly: the
    * differential the spec pins). Items with < 2 ratings drop, as in
    * the nominal twin; α is NULL when D_e ≤ 0.
    *
    * Shape: the (item, level) rollup is the only corpus exchange; the
    * level marginals, their cumulative sums, and the level-PAIR table
    * (|levels|² rows) are all bounded-scale algebra, and D_o's per-item
    * pair expansion joins item-keyed cells to the broadcast pair
    * table — ≤ |levels|² rows per item. */
  def krippendorffAlphaOrdinal(ratings: DataFrame, itemCol: String,
      levelCol: String, dp: Int = 6): DataFrame = {
    val cell = ratings
      .where(col(itemCol).isNotNull && col(levelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(levelCol).cast("double").as("__l"))
      .agg(count(lit(1L)).as("__nuc"))
      .localCheckpoint(true) // item rollup, marginals, and D_o all read it
    val perItem = cell.groupBy("__i").agg(sum(col("__nuc")).as("__mu"))
      .where(col("__mu") >= 2)
    val kept = cell.join(perItem, "__i")
    val marg = kept.groupBy("__l").agg(sum(col("__nuc")).as("__nc"))
    // the level table is bounded by the rating scale — window is safe
    val margCum = marg.withColumn("__cum",
      sum(col("__nc")).over(Window.orderBy(col("__l"))))
    val pa = margCum.select(col("__l").as("__lc"), col("__nc").as("__ncc"),
      col("__cum").as("__cumc"))
    val pb = margCum.select(col("__l").as("__lk"), col("__nc").as("__nck"),
      col("__cum").as("__cumk"))
    val delta = (col("__cumk") - col("__cumc")).cast("double") +
      (col("__ncc") - col("__nck")) / lit(2.0)
    val pairs = pa.join(broadcast(pb), col("__lc") < col("__lk"))
      .select(col("__lc"), col("__lk"), col("__ncc"), col("__nck"),
        (delta * delta).as("__d2"))
      .localCheckpoint(true) // D_e rollup + the broadcast D_o join
    val de = pairs.agg(coalesce(sum(lit(2.0) * col("__ncc") * col("__nck") *
      col("__d2")), lit(0.0)).as("__de"))
    val ka = kept.select(col("__i"), col("__l").as("__lc"),
      col("__nuc").as("__na"), col("__mu"))
    val kb = kept.select(col("__i"), col("__l").as("__lk"),
      col("__nuc").as("__nb"))
    val doNum = ka.join(kb, Seq("__i")).where(col("__lc") < col("__lk"))
      .join(broadcast(pairs.select("__lc", "__lk", "__d2")),
        Seq("__lc", "__lk"))
      .agg(coalesce(sum(lit(2.0) * col("__na") * col("__nb") * col("__d2") /
        (col("__mu") - 1).cast("double")), lit(0.0)).as("__do"))
    val counts = perItem.agg(count(lit(1L)).as("n_items"),
      coalesce(sum(col("__mu")), lit(0L)).as("n_ratings"))
    val nLevels = marg.agg(count(lit(1L)).as("n_levels"))
    val nD = col("n_ratings").cast("double")
    counts.crossJoin(nLevels).crossJoin(doNum).crossJoin(de).select(
      col("n_items"), col("n_ratings"), col("n_levels"),
      when(col("n_items") === 0 || col("__de") <= 0.0,
          lit(null).cast("double"))
        .otherwise(round(lit(1.0) - (nD - 1) * col("__do") / col("__de"),
          dp)).as("alpha"))
  }

  /** Cronbach's α (Cronbach 1951): internal-consistency reliability of
    * a k-item scale — do the k per-subject scores (k rubric criteria, k
    * probe questions per document, k judge prompts) measure ONE
    * underlying trait?
    *
    *   α = k/(k−1) · (1 − Σᵢ varᵢ / var_total)
    *
    * with varᵢ the sample variance of item i across complete subjects
    * and var_total the sample variance of per-subject TOTAL scores.
    * Complete-design contract (the [[cochranQ]] discipline): subjects
    * missing any of the k items are EXCLUDED and reported; duplicate
    * (subject, item) scores average into one cell first, so a repeated
    * rating cannot masquerade as a missing one.
    *
    * Shape: one (subject, item) cell rollup (the only corpus
    * exchange), a subject rollup and an item rollup off it (the item
    * pass joins back subject-keyed), 1-row verdict algebra. α is NULL
    * when k < 2, fewer than 2 complete subjects, or var_total = 0. */
  def cronbachAlpha(df: DataFrame, subject: Column, item: Column,
      score: Column, dp: Int = 6): DataFrame = {
    val base = df.select(subject.as("__s"), item.cast("string").as("__i"),
        score.cast("double").as("__v"))
      .where(col("__s").isNotNull && col("__i").isNotNull &&
        col("__v").isNotNull)
    val cells = base.groupBy("__s", "__i").agg(avg(col("__v")).as("__v"))
      .localCheckpoint(true) // k-count + subject + item passes read it
    val kdf = cells.agg(countDistinct(col("__i")).as("__k"))
    val per = cells.groupBy("__s")
      .agg(count(lit(1L)).as("__c"), sum(col("__v")).as("__t"))
      .crossJoin(broadcast(kdf))
    val complete = per.where(col("__c") === col("__k"))
      .localCheckpoint(true) // totals rollup + item-pass semi-join
    val subj = complete.agg(count(lit(1L)).as("__n"),
      sum(col("__t")).as("__st"), sum(col("__t") * col("__t")).as("__stt"),
      max(col("__k")).as("__kk"))
    val dropped = per.agg(count(lit(1L)).as("__ntot"))
    val items = cells.join(complete.select("__s"), Seq("__s"))
      .groupBy("__i").agg(count(lit(1L)).as("__in"),
        sum(col("__v")).as("__is"), sum(col("__v") * col("__v")).as("__iss"))
      .where(col("__in") >= 2)
      .agg(coalesce(sum((col("__iss") - col("__is") * col("__is") /
        col("__in")) / (col("__in") - 1).cast("double")), lit(0.0))
        .as("__sv"))
    val varT = (col("__stt") - col("__st") * col("__st") / col("__n")) /
      (col("__n") - 1).cast("double")
    subj.crossJoin(dropped).crossJoin(items).select(
      coalesce(col("__kk"), lit(0L)).as("k"),
      col("__n").as("n_subjects"),
      (col("__ntot") - col("__n")).as("n_dropped"),
      when(col("__n") >= 2, round(col("__sv"), dp)).as("sum_item_var"),
      when(col("__n") >= 2, round(varT, dp)).as("total_var"),
      when(col("__kk") >= 2 && col("__n") >= 2 && varT > 0.0,
        round(col("__kk") / (col("__kk") - 1).cast("double") *
          (lit(1.0) - col("__sv") / varT), dp)).as("alpha"))
  }

  /** Cochran's Q (Cochran 1950): do k binary classifiers/treatments
    * have the same success rate over the same items — [[mcnemar]]'s
    * k-way generalization, the first question of any multi-model eval
    * table. Complete-design contract: items missing any of the k
    * entries are EXCLUDED (reported as n_items_dropped).
    *
    *   Q = k(k−1)·Σ_j (C_j − N/k)² / (k·N − Σ_i R_i²)  ~  χ²(k−1)
    *
    * (C_j per-classifier successes, R_i per-item successes, N total).
    * Q is NULL when every kept item is unanimous (denominator 0) or
    * k < 2. Verdict via the shared [[chiSq95]]. Shape: one (item,
    * classifier) dedup-free long-table scan → item rollup + classifier
    * rollup; exchanges carry items and classifiers, never more. */
  def cochranQ(df: DataFrame, item: Column, classifier: Column,
      success: Column, dp: Int = 6): DataFrame = {
    val base = df.select(item.as("__i"), classifier.cast("string").as("__c"),
        success.cast("boolean").cast("int").as("__s"))
      .where(col("__i").isNotNull && col("__c").isNotNull &&
        col("__s").isNotNull)
      .localCheckpoint(true) // k-count + per-item + per-classifier reads
    val k = base.select(countDistinct(col("__c")).as("k"))
    // complete design = exactly one rating per classifier: both the
    // row count AND the distinct-classifier count must equal k (a
    // duplicate rating would otherwise mask a missing classifier)
    val perItem = base.groupBy("__i")
      .agg(count(lit(1L)).as("__cnt"),
        countDistinct(col("__c")).as("__dcnt"), sum(col("__s")).as("__r"))
      .crossJoin(broadcast(k))
    val kept = perItem.where(col("__cnt") === col("k") &&
      col("__dcnt") === col("k"))
      .localCheckpoint(true) // row sums + the classifier-side semi join
    val rows = kept.agg(count(lit(1L)).as("n_items"),
      coalesce(sum(col("__r")), lit(0L)).as("__nn"),
      coalesce(sum(col("__r") * col("__r")), lit(0L)).as("__r2"))
    val dropped = perItem.where(col("__cnt") =!= col("k") ||
        col("__dcnt") =!= col("k"))
      .agg(count(lit(1L)).as("n_items_dropped"))
    // Σ_j (C_j − N/k)² = ΣC_j² − N²/k (since ΣC_j = N) — so one
    // classifier rollup plus closed-form algebra, no second pass
    val cols = base.join(kept.select(col("__i")), "__i")
      .groupBy("__c").agg(sum(col("__s")).as("__cj"))
      .agg(count(lit(1L)).as("k"),
        coalesce(sum(col("__cj").cast("double") * col("__cj")), lit(0.0))
          .as("__cj2"))
    val out = cols.crossJoin(broadcast(rows)).crossJoin(broadcast(dropped))
    val kD = col("k").cast("double")
    val dev = col("__cj2") - col("__nn").cast("double") * col("__nn") / kD
    val denom = kD * col("__nn").cast("double") - col("__r2")
    val q = kD * (kD - 1) * dev / denom
    val df1 = kD - 1
    out.select(
      col("k"), col("n_items"), col("n_items_dropped"),
      when(col("k") < 2 || denom <= 0, lit(null).cast("double"))
        .otherwise(round(q, dp)).as("q_stat"),
      when(col("k") < 2, lit(null).cast("double"))
        .otherwise(round(chiSq95(df1), dp)).as("crit_05"),
      when(col("k") < 2 || denom <= 0, lit(null).cast("boolean"))
        .otherwise(q > chiSq95(df1)).as("reject_05"))
  }

  /** Friedman test (Friedman 1937): k treatments ranked WITHIN each of
    * n blocks — "does any system rank consistently higher" over
    * per-item scores, the rank-based complement of [[cochranQ]] (which
    * needs binary outcomes) and the blocked sibling of
    * [[kruskalWallis]] (which ignores blocking). Tie-averaged ranks
    * within block; the tie-corrected statistic
    *
    *   χ²_F = [12n/(k(k+1))·Σ_j (r̄_j − (k+1)/2)²] / C,
    *   C = 1 − Σ(t³−t) / (n·k(k²−1))
    *
    * ~ χ²(k−1). Complete-design contract as [[cochranQ]]: blocks
    * missing any treatment drop (n_blocks_dropped). NULL when C ≤ 0
    * (all blocks fully tied) or k < 2. Shape: one block-keyed rank
    * window (k rows per partition — the partition IS the block), then
    * treatment-sized rollups; nothing unpartitioned. */
  /** Page's L trend test (Page 1963): in a complete blocked design, do
    * the treatments trend in the HYPOTHESIZED order — the blocked
    * companion of [[jonckheereTest]], and what [[friedmanTest]] cannot
    * ask (Friedman sees "some treatment differs"; Page is powered
    * against the ordered alternative — model versions improving
    * release over release, checkpoint quality by step). L = Σⱼ wⱼ·Rⱼ
    * over order index wⱼ = 1..k and within-block rank sums Rⱼ, with
    *
    *   E[L] = b·k(k+1)²/4,   Var(L) = b·(k³−k)²/(144(k−1))
    *
    * and one-sided z = (L−E)/√Var (reject at z > 1.6448536269514722,
    * 5%). Ranks are tie-averaged; the classical variance assumes
    * continuity, so with heavy ties z is mildly approximate (the
    * repo-wide rank-test caveat). `reject_05` is NULL below 12 blocks
    * (exact tables territory) or for degenerate k/b. Complete-block
    * discipline is [[friedmanTest]]'s exactly: a block missing any
    * treatment (by distinct count — duplicates cannot mask gaps) is
    * dropped and counted; treatments outside `order` are ignored.
    *
    * Shape: the Friedman exchanges — block-keyed completeness rollup,
    * within-block k-row rank windows, one 1-row rollup. */
  def pageTrendTest(df: DataFrame, block: Column, treatment: Column,
      value: Column, order: Seq[String], dp: Int = 6): DataFrame = {
    require(order.size >= 2, s"need >= 2 ordered treatments, got $order")
    require(order.distinct.size == order.size, s"order repeats: $order")
    val k = order.size
    val base = df.select(block.as("__b"), treatment.cast("string").as("__t"),
        value.cast("double").as("__v"))
      .where(col("__b").isNotNull && col("__v").isNotNull &&
        col("__t").isin(order: _*))
      .localCheckpoint(true)
    val sizes = base.groupBy("__b").agg(count(lit(1L)).as("__cnt"),
      countDistinct(col("__t")).as("__dcnt"))
    val keptIds = sizes.where(col("__cnt") === k && col("__dcnt") === k)
      .select(col("__b"))
    val dropped = sizes.where(col("__cnt") =!= k || col("__dcnt") =!= k)
      .agg(count(lit(1L)).as("n_blocks_dropped"))
    val kept = base.join(keptIds, "__b")
    val w = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val te = Window.partitionBy(col("__b"), col("__v"))
    val weightExpr = order.zipWithIndex
      .foldLeft(lit(null).cast("double")) { case (acc, (t, i)) =>
        when(col("__t") === t, lit((i + 1).toDouble)).otherwise(acc) }
    val ranked = kept.select(col("__b"),
      (rank().over(w) + (count(lit(1L)).over(te) - 1) / 2.0).as("__r"),
      weightExpr.as("__w"))
    val agg = ranked.agg(
      (count(lit(1L)) / k).cast("long").as("n_blocks"),
      coalesce(sum(col("__r") * col("__w")), lit(0.0)).as("__l"))
    val n = col("n_blocks").cast("double")
    val kD = k.toDouble
    val eL = n * lit(kD * (kD + 1) * (kD + 1) / 4.0)
    val varL = n * lit((kD * kD * kD - kD) * (kD * kD * kD - kD) /
      (144.0 * (kD - 1)))
    val z = (col("__l") - eL) / sqrt(varL)
    val ok = col("n_blocks") > 0
    agg.crossJoin(broadcast(dropped)).select(
      lit(k).as("k"), col("n_blocks"), col("n_blocks_dropped"),
      when(ok, round(col("__l"), dp)).as("l_stat"),
      when(ok, round(eL, dp)).as("e_l"),
      when(ok, round(z, dp)).as("z"),
      when(col("n_blocks") >= 12, z > 1.6448536269514722).as("reject_05"))
  }

  def friedmanTest(df: DataFrame, block: Column, treatment: Column,
      value: Column, dp: Int = 6): DataFrame = {
    val base = df.select(block.as("__b"), treatment.cast("string").as("__t"),
        value.cast("double").as("__v"))
      .where(col("__b").isNotNull && col("__t").isNotNull &&
        col("__v").isNotNull)
      .localCheckpoint(true)
    val k = base.select(countDistinct(col("__t")).as("k"))
    // complete block = exactly one value per treatment (row count AND
    // distinct-treatment count both k — duplicates must not mask gaps)
    val sizes = base.groupBy("__b").agg(count(lit(1L)).as("__cnt"),
        countDistinct(col("__t")).as("__dcnt"))
      .crossJoin(broadcast(k))
    val keptIds = sizes.where(col("__cnt") === col("k") &&
      col("__dcnt") === col("k")).select(col("__b"))
    val droppedDf = sizes.where(col("__cnt") =!= col("k") ||
        col("__dcnt") =!= col("k"))
      .agg(count(lit(1L)).as("n_blocks_dropped"))
    val kept = base.join(keptIds, "__b")
    // tie-averaged within-block rank: rank() + (ties−1)/2, both windows
    // partitioned by the block (k-row partitions)
    val w = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val te = Window.partitionBy(col("__b"), col("__v"))
    val ranked = kept.select(col("__b"), col("__t"),
      (rank().over(w) + (count(lit(1L)).over(te) - 1) / 2.0).as("__r"),
      count(lit(1L)).over(te).as("__ct"))
    val perT = ranked.groupBy("__t").agg(avg(col("__r")).as("__rbar"),
      count(lit(1L)).as("__nb"))
    // tie masses: each within-block tie RUN of size t contributes t³−t;
    // a run of t rows each sees __ct = t, so sum((__ct²−1)) over rows
    // = Σ t(t²−1) = Σ(t³−t)
    val ties = ranked.agg(coalesce(sum(col("__ct").cast("double") *
      col("__ct") - 1.0), lit(0.0)).as("__tie"))
    // Σ_j (r̄_j − (k+1)/2)² = Σr̄² − k((k+1)/2)² because within-block
    // ranks sum to k(k+1)/2 exactly (so Σ_j r̄_j = k(k+1)/2)
    val agg = perT.agg(
      count(lit(1L)).as("k"),
      coalesce(max(col("__nb")), lit(0L)).as("n_blocks"),
      coalesce(sum(col("__rbar") * col("__rbar")), lit(0.0)).as("__rb2"))
    val kD = col("k").cast("double")
    val n = col("n_blocks").cast("double")
    val m = (kD + 1) / 2
    val raw = lit(12.0) * n / (kD * (kD + 1)) * (col("__rb2") - kD * m * m)
    val c = lit(1.0) - col("__tie") / (n * kD * (kD * kD - 1))
    val stat = raw / c
    val df1 = kD - 1
    val degenerate = col("k") < 2 || col("n_blocks") === 0 || c <= 0.0
    agg.crossJoin(broadcast(ties)).crossJoin(broadcast(droppedDf)).select(
      col("k"), col("n_blocks"), col("n_blocks_dropped"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(stat, dp)).as("chi2_f"),
      when(col("k") < 2, lit(null).cast("double"))
        .otherwise(round(chiSq95(df1), dp)).as("crit_05"),
      when(degenerate, lit(null).cast("boolean"))
        .otherwise(stat > chiSq95(df1)).as("reject_05"))
  }

  /** Bradley–Terry paired-preference strengths (Bradley & Terry 1952)
    * by Hunter's MM iteration (Hunter, Annals of Statistics 2004):
    *
    *   π_i ← W_i / Σ_{j≠i} n_ij/(π_i + π_j),   then normalize Σπ = 1
    *
    * over a (winner, loser) preference-pair table — the QA fit for
    * RLHF/eval preference data: strengths expose annotator drift and
    * item quality that raw win rates (ignoring opponent strength)
    * miss. Self-pairs and NULL sides drop. Items are BOUNDED by
    * contract (`maxItems`, default 1024 — models/sources/langs, not
    * documents; the driver collect is capped at maxItems² pair rows,
    * so 1024 bounds it at ~1M rows / tens of MB): one corpus rollup
    * to the ≤items² pairwise-count table, which is collected and
    * iterated on the DRIVER (the
    * IPF/PAV bounded-driver discipline; unlike logisticRegressionGD
    * there is no per-iteration scan at all). Exactly `iters` MM steps
    * from the uniform start — a FIXED trajectory, so the oracle can
    * unroll the identical recursion in SQL (the eval_logreg
    * precedent); items that never lose would diverge under exact MLE
    * (it does not exist), the fixed iteration count keeps both sides
    * finite and identical. Returns (item, n_wins, n_games, strength)
    * ordered by item. */
  def bradleyTerry(df: DataFrame, winner: Column, loser: Column,
      iters: Int = 20, maxItems: Int = 1024, dp: Int = 6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxItems >= 1 && maxItems <= 46340, // 46341² overflows Int
      s"maxItems must be in [1, 46340], got $maxItems")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(winner.cast("string").as("__w"),
        loser.cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    val pc = base.groupBy("__w", "__l").agg(count(lit(1L)).as("__c"))
      .limit(maxItems * maxItems + 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val itemSeq = pc.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    require(itemSeq.length <= maxItems,
      s"bradleyTerry: ${itemSeq.length} items exceeds maxItems=$maxItems " +
        "(items are models/sources/raters, not documents)")
    require(itemSeq.nonEmpty, "bradleyTerry needs at least one decided pair")
    val idx = itemSeq.zipWithIndex.toMap
    val k = itemSeq.length
    val wins = new Array[Double](k)
    val games = new Array[Double](k)
    val nij = scala.collection.mutable.Map.empty[(Int, Int), Double]
    pc.foreach { case (w, l, c) =>
      val (i, j) = (idx(w), idx(l))
      wins(i) += c; games(i) += c; games(j) += c
      val key = if (i < j) (i, j) else (j, i)
      nij(key) = nij.getOrElse(key, 0.0) + c
    }
    var pi = Array.fill(k)(1.0 / k)
    for (_ <- 1 to iters) {
      val denom = new Array[Double](k)
      nij.foreach { case ((i, j), n) =>
        val d = n / (pi(i) + pi(j))
        denom(i) += d; denom(j) += d
      }
      val raw = Array.tabulate(k)(i =>
        if (denom(i) > 0) wins(i) / denom(i) else 0.0)
      val s = raw.sum
      pi = if (s > 0) raw.map(_ / s) else raw
    }
    def rd(x: Double) = BigDecimal(x).setScale(dp,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    itemSeq.indices.map(i => (itemSeq(i), wins(i).toLong, games(i).toLong,
        rd(pi(i))))
      .toDF("item", "n_wins", "n_games", "strength")
      .orderBy("item")
  }

  /** Preference-transitivity audit over the same (winner, loser) table
    * as [[bradleyTerry]]: build the MAJORITY tournament (edge i→j when
    * i beats j strictly more often than j beats i; ties undecided),
    * then count directed 3-cycles (i→j→k→i — the Condorcet
    * inconsistencies that make a preference dataset unfit to fit) among
    * the triangles whose three pairs are all decided. Returns one row:
    * (n_items, n_decided_pairs, n_triangles, n_cycles, cycle_rate)
    * with cycle_rate = cycles/triangles (NULL when no triangle is
    * fully decided).
    *
    * Scale shape: ONE corpus rollup to unordered-pair win counts
    * (≤ items² rows); the majority-edge table and both triple joins run
    * on that bounded table — broadcast equi-joins, never the corpus. */
  def preferenceCycles(df: DataFrame, winner: Column,
      loser: Column, dp: Int = 6): DataFrame = {
    val base = df.select(winner.cast("string").as("__w"),
        loser.cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    val pair = base.select(least(col("__w"), col("__l")).as("__a"),
        greatest(col("__w"), col("__l")).as("__b"),
        when(col("__w") < col("__l"), 1L).otherwise(0L).as("__aw"))
      .groupBy("__a", "__b")
      .agg(sum(col("__aw")).as("__wa"),
        (count(lit(1L)) - sum(col("__aw"))).as("__wb"))
      .localCheckpoint(true) // edges + item count read it
    val edges = pair.where(col("__wa") =!= col("__wb"))
      .select(when(col("__wa") > col("__wb"), col("__a"))
          .otherwise(col("__b")).as("__u"),
        when(col("__wa") > col("__wb"), col("__b"))
          .otherwise(col("__a")).as("__v"))
      .localCheckpoint(true) // read by the two triple joins
    val nItems = pair.select(explode(array(col("__a"), col("__b")))
      .as("__i")).distinct().count()
    // undirected decided triangles: a<b<c with all three pairs decided
    val und = edges.select(least(col("__u"), col("__v")).as("__a"),
      greatest(col("__u"), col("__v")).as("__b"))
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.__b") === col("e2.__a"))
      .join(und.as("e3"), col("e3.__a") === col("e1.__a") &&
        col("e3.__b") === col("e2.__b"))
      .count()
    // directed 3-cycles, canonicalized to start at the smallest item
    val cyc = edges.as("d1")
      .join(edges.as("d2"), col("d1.__v") === col("d2.__u"))
      .join(edges.as("d3"), col("d2.__v") === col("d3.__u") &&
        col("d3.__v") === col("d1.__u"))
      .where(col("d1.__u") < col("d2.__u") && col("d1.__u") < col("d3.__u"))
      .count()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nItems, edges.count(), tri, cyc)).toDF(
        "n_items", "n_decided_pairs", "n_triangles", "n_cycles")
      .select(col("n_items"), col("n_decided_pairs"), col("n_triangles"),
        col("n_cycles"),
        when(col("n_triangles") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_cycles").cast("double") /
            col("n_triangles"), dp)).as("cycle_rate"))
  }

  /** Effective sample size and Kish design effect of a weighted corpus:
    * `ESS = (Σw)²/Σw²`, `deff = n·Σw²/(Σw)²` — what a reweighting
    * (raking, importance sampling, DSIR) actually cost in statistical
    * power. ONE aggregation job, map-side partial. */
  def effectiveSampleSize(df: DataFrame, weight: Column,
      dp: Int = 6): DataFrame = {
    val w = weight.cast("double")
    df.agg(count(lit(1L)).as("n"), sum(w).as("__sw"), sum(w * w).as("__sw2"))
      .select(col("n"), round(col("__sw"), dp).as("sum_w"),
        round(col("__sw") * col("__sw") / col("__sw2"), dp).as("ess"),
        round(col("n") * col("__sw2") / (col("__sw") * col("__sw")), dp)
          .as("deff"))
  }

  /** Standard normal CDF as pure Column algebra — Abramowitz–Stegun
    * 26.2.17 (max abs error 7.5e-8), so significance math stays inside
    * whole-stage codegen and restates literal-for-literal in SQL. */
  def normalCdf(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * abs(x))
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val phi = exp(lit(-0.5) * x * x) / lit(2.5066282746310002)
    val upper = lit(1.0) - phi * poly
    when(x >= 0, upper).otherwise(lit(1.0) - upper)
  }

  /** Per-group screening z-test: each group's mean against the global
    * mean, `z = (mean_g − mean_all) / (sd_all / √n_g)` with the
    * population sd, two-sided p via [[normalCdf]]. A SCREEN for "which
    * slices look off" feeding [[bhAdjust]] — not a replacement for a
    * two-sample test on the flagged slices ([[randomizationTestMeanDiff]]
    * is the confirmatory path). One map-side-partial rollup per group +
    * a 1-row global broadcast. */
  def zScreenPerGroup(df: DataFrame, group: Column, value: Column,
      dp: Int = 6): DataFrame = {
    val v = value.cast("double")
    val g = df.groupBy(group.as("grp"))
      .agg(count(lit(1L)).as("n"), avg(v).as("__m"))
    val all = df.agg(avg(v).as("__ma"), stddev_pop(v).as("__sd"))
    // p is computed from the ROUNDED z: the score is the published
    // statistic, and deriving p from it keeps the pair consistent and
    // engine-order-independent. A constant column (sd_all = 0) admits
    // no z at all — NULL, not a division artifact (explicit under the
    // repo's ANSI-on default).
    val z = when(col("__sd").isNull || col("__sd") === 0.0,
        lit(null).cast("double"))
      .otherwise(
        round((col("__m") - col("__ma")) / (col("__sd") / sqrt(col("n"))), dp))
    g.crossJoin(all)
      .select(col("grp"), col("n"), z.as("z"),
        round(lit(2.0) * (lit(1.0) - normalCdf(abs(z))), dp).as("p"))
  }

  /** Fixed-frequency periodogram over a bucketed series: for each
    * CANDIDATE period p, the spectral power
    *
    *   P(p) = (Σ v'ₜ·cos(2πt/p))² + (Σ v'ₜ·sin(2πt/p))²
    *
    * on the mean-centered series v', with `power_share` = P/Σv'² and
    * an `is_peak` flag on the arg-max — WHICH cycle dominates, the
    * question [[seasonalDecompose]] (given-period) and [[acf]]
    * (lag-domain, smeared across harmonics) answer only indirectly.
    * Candidates are explicit: a data-dependent frequency search would
    * need the full FFT; the curated-candidate form is the
    * SQL-restatable one and what a drift dashboard wants anyway
    * ("is it daily, weekly, or monthly?").
    *
    * Shape: a 1-row mean broadcast, then ONE aggregation carrying the
    * statically-unrolled cos/sin sums for every candidate (map-side
    * partial; the [[passAtK]] per-k union shape on the 1-row result).
    * Series is bucket-grain bounded by contract. Returns one row per
    * candidate: (period, power, power_share, is_peak). */
  def periodogram(df: DataFrame, t: Column, value: Column,
      periods: Seq[Int], dp: Int = 6): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"periods must be >= 2, got $periods")
    require(periods.distinct.size == periods.size, s"periods repeat: $periods")
    val base = df.select(t.cast("double").as("__t"),
        value.cast("double").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val m = base.agg(avg(col("__v")).as("__m"))
    val c = base.crossJoin(broadcast(m))
      .select(col("__t"), (col("__v") - col("__m")).as("__vc"))
    val aggs = periods.flatMap(p => Seq(
      sum(col("__vc") * cos(lit(2.0 * math.Pi / p) * col("__t")))
        .as(s"__c$p"),
      sum(col("__vc") * sin(lit(2.0 * math.Pi / p) * col("__t")))
        .as(s"__s$p"))) :+ sum(col("__vc") * col("__vc")).as("__ss")
    val one = c.agg(aggs.head, aggs.tail: _*)
    def pw(p: Int) = col(s"__c$p") * col(s"__c$p") +
      col(s"__s$p") * col(s"__s$p")
    val maxPw = periods.map(pw).reduce(greatest(_, _))
    periods.map(p => one.select(lit(p).as("period"),
        round(pw(p), dp).as("power"),
        when(col("__ss") > 0, round(pw(p) / col("__ss"), dp))
          .as("power_share"),
        (pw(p) === maxPw).as("is_peak")))
      .reduce(_ unionByName _).orderBy("period")
  }

  /** Granger causality test, lag 1 (Granger 1969): does yesterday's x
    * help predict today's y beyond yesterday's y —
    *
    *   restricted:  y_t ~ a + b·y_{t−1}
    *   full:        y_t ~ a + b·y_{t−1} + c·x_{t−1}
    *   F = (SSE_r − SSE_f) / (SSE_f / (n−3))
    *
    * the PREDICTIVE-precedence notion of causality ([[diffInDiff]]/
    * [[ipwEffect]] need an intervention; Granger needs only the two
    * series) — does ingest volume lead quality drift, does traffic
    * lead conversions. Input is a BOUNDED time-indexed series (the
    * [[theilSenByKey]] pre-aggregation contract — daily/bucket grain);
    * both nuisance fits ride the shared [[fitOlsRounded]] Cholesky
    * solve (betas rounded at dp, restated term-for-term by the
    * oracle), SSEs are one scan each with the betas as literals.
    * `reject_05` compares F against [[chiSq95]](1) — the df₂→∞ limit,
    * so it is NULL when n−3 < 20 (the [[anovaF]] small-df₂ discipline)
    * or SSE_f = 0. Returns 1 row:
    * (n, b_ylag, b_xlag, sse_r, sse_f, f_stat, reject_05). */
  def grangerTest(df: DataFrame, t: Column, y: Column, x: Column,
      dp: Int = 6): DataFrame = {
    val series = df.select(t.as("__t"), y.cast("double").as("__yv"),
        x.cast("double").as("__xv"))
      .where(col("__t").isNotNull && col("__yv").isNotNull &&
        col("__xv").isNotNull)
    // the series is bucket-grain bounded by contract — global lag OK
    val w = Window.orderBy(col("__t"))
    val base = series
      .withColumn("__x0", lag(col("__yv"), 1).over(w))
      .withColumn("__x1", lag(col("__xv"), 1).over(w))
      .where(col("__x0").isNotNull && col("__x1").isNotNull)
      .select(col("__yv").as("__o"), col("__x0"), col("__x1"))
      .localCheckpoint(true) // two OLS moment passes + two SSE scans
    val bF = fitOlsRounded(base, 2, "__o", dp)
    val bR = fitOlsRounded(base.select(col("__o"), col("__x0")), 1, "__o", dp)
    val eR = col("__o") - lit(bR(0)) - lit(bR(1)) * col("__x0")
    val eF = col("__o") - lit(bF(0)) - lit(bF(1)) * col("__x0") -
      lit(bF(2)) * col("__x1")
    val agg = base.agg(count(lit(1L)).as("n"),
      sum(eR * eR).as("__sser"), sum(eF * eF).as("__ssef"))
    val nD = col("n").cast("double")
    val f = (col("__sser") - col("__ssef")) / (col("__ssef") / (nD - 3))
    val ok = col("__ssef") > 0.0
    agg.select(col("n"),
      lit(bF(1)).as("b_ylag"), lit(bF(2)).as("b_xlag"),
      round(col("__sser"), dp).as("sse_r"),
      round(col("__ssef"), dp).as("sse_f"),
      when(ok, round(f, dp)).as("f_stat"),
      when(!ok || nD - 3 < 20, lit(null).cast("boolean"))
        .otherwise(f > chiSq95(lit(1.0))).as("reject_05"))
  }

  /** Poisson overdispersion test on count data: the dispersion index
    * VMR = s²/x̄ with (n−1)·VMR ~ χ²(n−1) under Poisson, normalized by
    * the classic √(2χ²) − √(2df−1) ~ N(0,1) approximation (sound for
    * the corpus-scale df here). Per-entity event counts that REJECT
    * high are bursty/clumped (bots, retry storms, scripted traffic —
    * [[debounce]]'s diagnosis sibling); rejecting low means
    * suspiciously REGULAR activity (rate limiters, cron). The verdict
    * [[gini]]/concentration tables gesture at but never test.
    * `reject_05` is two-sided, NULL when x̄ = 0, n < 20, or VMR is
    * undefined. ONE rollup (3 power sums), 1 row:
    * (n, mean, vmr, chi2, z, reject_05). */
  def overdispersionTest(df: DataFrame, count: Column,
      dp: Int = 6): DataFrame = {
    val c = count.cast("double")
    val a = df.where(count.isNotNull).select(c.as("__c"))
      .agg(org.apache.spark.sql.functions.count(lit(1L)).as("n"),
        sum(col("__c")).as("__s"), sum(col("__c") * col("__c")).as("__ss"))
    val nD = col("n").cast("double")
    val mean = col("__s") / nD
    val vr = (col("__ss") - col("__s") * col("__s") / nD) / (nD - 1)
    val vmr = vr / mean
    val chi2 = (nD - 1) * vmr
    val z = sqrt(lit(2.0) * chi2) - sqrt(lit(2.0) * (nD - 1) - 1)
    val ok = col("n") >= 2 && mean > 0.0
    a.select(col("n"),
      when(col("n") > 0, round(mean, dp)).as("mean"),
      when(ok, round(vmr, dp)).as("vmr"),
      when(ok, round(chi2, dp)).as("chi2"),
      when(ok, round(z, dp)).as("z"),
      when(ok && col("n") >= 20, abs(z) > 1.96).as("reject_05"))
  }

  /** Cook's-distance influence diagnostics for the simple regression
    * y ~ a + b·x (Cook 1977): per row, residual e, leverage
    * h = 1/n + (x−x̄)²/Sxx, and D = e²h/(2s²(1−h)²); returns the top-k
    * most influential rows — WHICH documents/users/outliers own the
    * fitted slope, the accountability view [[regressionMetrics]]'
    * aggregates can't give (one pathological row can hold a trend
    * hostage; this names it). Fit scalars (x̄, Sxx, a, b, s²) are
    * driver values ROUNDED at dp before scoring (the GD-weight
    * reproducibility discipline); ties in D break by id.
    *
    * Shape: one 1-row moment rollup, then an in-scan score with the
    * broadcast scalars and a TakeOrdered top-k — no sort, no join.
    * Requires n > 2 (s² needs df) and Sxx > 0 (non-constant x). */
  def regressionInfluence(df: DataFrame, id: Column, x: Column, y: Column,
      topK: Int = 10, dp: Int = 6): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val base = df.select(id.as("id"), x.cast("double").as("__x"),
        y.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // moment pass + scoring pass
    val r = base.agg(count(lit(1L)).as("n"), sum(col("__x")).as("sx"),
      sum(col("__y")).as("sy"), sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__y") * col("__y")).as("syy")).head()
    val n = r.getAs[Long]("n")
    require(n > 2, s"need more than 2 rows to estimate s^2, got $n")
    def rd(v: Double) = BigDecimal(v)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nD = n.toDouble
    val xbar = r.getAs[Double]("sx") / nD
    val sxxC = r.getAs[Double]("sxx") - r.getAs[Double]("sx") * xbar
    require(sxxC > 0, "constant x admits no regression")
    val b = (r.getAs[Double]("sxy") -
      r.getAs[Double]("sx") * r.getAs[Double]("sy") / nD) / sxxC
    val a0 = r.getAs[Double]("sy") / nD - b * xbar
    val sse = r.getAs[Double]("syy") - r.getAs[Double]("sy") *
      r.getAs[Double]("sy") / nD - b * b * sxxC
    val s2 = sse / (nD - 2)
    val (xbR, sxxR, bR, aR, s2R) = (rd(xbar), rd(sxxC), rd(b), rd(a0), rd(s2))
    val e = col("__y") - lit(aR) - lit(bR) * col("__x")
    val h = lit(1.0 / nD) + (col("__x") - lit(xbR)) * (col("__x") - lit(xbR)) /
      lit(sxxR)
    val d = e * e * h / (lit(2.0 * s2R) * (lit(1.0) - h) * (lit(1.0) - h))
    base.select(col("id"), col("__x").as("x"), col("__y").as("y"),
        round(e, dp).as("resid"), round(h, dp).as("leverage"),
        d.as("__d"))
      .orderBy(col("__d").desc, col("id"))
      .limit(topK)
      .select(col("id"), col("x"), col("y"), col("resid"), col("leverage"),
        round(col("__d"), dp).as("cooks_d"))
  }

  /** Numeric-scorer agreement: Bland–Altman bias and limits of
    * agreement (Bland & Altman, Lancet 1986) plus Lin's concordance
    * correlation coefficient (Lin, Biometrics 1989) —
    *
    *   CCC = 2σ_xy / (σ²_x + σ²_y + (μ_x − μ_y)²)
    *
    * — the NUMERIC twin of the κ family: two reward models or quality
    * scorers can correlate at r = 0.99 and still disagree by a
    * constant 2 points; Pearson misses that, CCC and the (bias ±
    * 1.96·sd_diff) limits don't. Population moments (the n-divisor;
    * at corpus n the distinction is cosmetic and the oracle restates
    * the same divisor). r and CCC are NULL when either scorer is
    * constant; limits need n ≥ 2.
    *
    * Shape: ONE whole-corpus rollup (6 power sums), 1 row out. */
  def numericAgreement(df: DataFrame, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val xc = x.cast("double")
    val yc = y.cast("double")
    val a = df.where(x.isNotNull && y.isNotNull)
      .select(xc.as("__x"), yc.as("__y"))
      .agg(count(lit(1L)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val nD = col("n").cast("double")
    val mx = col("__sx") / nD
    val my = col("__sy") / nD
    val vx = col("__sxx") / nD - mx * mx
    val vy = col("__syy") / nD - my * my
    val cxy = col("__sxy") / nD - mx * my
    val bias = mx - my
    // sd of per-row differences from the same moments:
    // var(x−y) = vx + vy − 2cxy
    val sdDiff = sqrt(vx + vy - lit(2.0) * cxy)
    val ok = col("n") >= 2 && vx > 0.0 && vy > 0.0
    val ccc = lit(2.0) * cxy / (vx + vy + bias * bias)
    a.select(col("n"),
      when(col("n") > 0, round(bias, dp)).as("bias"),
      when(col("n") >= 2, round(bias - lit(1.959963984540054) * sdDiff, dp))
        .as("loa_lo"),
      when(col("n") >= 2, round(bias + lit(1.959963984540054) * sdDiff, dp))
        .as("loa_hi"),
      when(ok, round(cxy / sqrt(vx * vy), dp)).as("pearson_r"),
      when(ok, round(ccc, dp)).as("ccc"))
  }

  /** Ratio-of-sums metric comparison with the delta-method CI: for
    * per-unit (numerator, denominator) pairs — revenue per session,
    * clicks per impression, tokens kept per doc — each arm's metric is
    * R = Σy/Σx, whose uncertainty a naive mean-of-ratios bootstrap gets
    * wrong; the delta method gives
    *
    *   var(R) = (σ²_y − 2R·σ_xy + R²·σ²_x) / (n·x̄²)
    *
    * from per-unit sample (co)variances (raw power sums, computed in
    * ONE conditional-aggregate pass for both arms). Reported: per-arm
    * ratios, the difference, its SE, z, and the 5% two-sided verdict —
    * NULL when either arm has n < 2 or Σx = 0; the verdict additionally
    * gated at n ≥ 20 per arm (the repo's normal-approximation floor).
    * THE missing piece next to [[powerMde]] (proportions) and plain
    * mean tests: most production metrics are ratios of sums.
    *
    * Shape: ONE whole-corpus rollup (10 conditional sums), 1 row. */
  def ratioMetricTest(df: DataFrame, num: Column, den: Column,
      inA: Column, dp: Int = 6): DataFrame = {
    val y = num.cast("double")
    val x = den.cast("double")
    val base = df.where(num.isNotNull && den.isNotNull && inA.isNotNull)
      .select(y.as("__y"), x.as("__x"), inA.cast("boolean").as("__a"))
    def arm(flag: Column, suf: String) = Seq(
      sum(when(flag, 1L).otherwise(0L)).as(s"n$suf"),
      sum(when(flag, col("__x"))).as(s"__sx$suf"),
      sum(when(flag, col("__y"))).as(s"__sy$suf"),
      sum(when(flag, col("__x") * col("__x"))).as(s"__sxx$suf"),
      sum(when(flag, col("__y") * col("__y"))).as(s"__syy$suf"),
      sum(when(flag, col("__x") * col("__y"))).as(s"__sxy$suf"))
    val aggs = arm(col("__a"), "_a") ++ arm(!col("__a"), "_b")
    val agg = base.agg(aggs.head, aggs.tail: _*)
    def ratio(suf: String) = col(s"__sy$suf") / col(s"__sx$suf")
    def varR(suf: String): Column = {
      val n = col(s"n$suf").cast("double")
      val r = ratio(suf)
      val vx = (col(s"__sxx$suf") - col(s"__sx$suf") * col(s"__sx$suf") / n) /
        (n - 1)
      val vy = (col(s"__syy$suf") - col(s"__sy$suf") * col(s"__sy$suf") / n) /
        (n - 1)
      val cxy = (col(s"__sxy$suf") - col(s"__sx$suf") * col(s"__sy$suf") / n) /
        (n - 1)
      val xbar = col(s"__sx$suf") / n
      (vy - lit(2.0) * r * cxy + r * r * vx) / (n * xbar * xbar)
    }
    val okA = col("n_a") >= 2 && col("__sx_a") =!= 0.0
    val okB = col("n_b") >= 2 && col("__sx_b") =!= 0.0
    val se = sqrt(varR("_a") + varR("_b"))
    val diff = ratio("_a") - ratio("_b")
    val ok = okA && okB && se > 0.0
    agg.select(col("n_a"), col("n_b"),
      when(col("__sx_a") =!= 0.0, round(ratio("_a"), dp)).as("ratio_a"),
      when(col("__sx_b") =!= 0.0, round(ratio("_b"), dp)).as("ratio_b"),
      when(okA && okB, round(diff, dp)).as("diff"),
      when(ok, round(se, dp)).as("se"),
      when(ok, round(diff / se, dp)).as("z"),
      when(ok && col("n_a") >= 20 && col("n_b") >= 20,
        abs(diff / se) > 1.959963984540054).as("reject_05"))
  }

  /** TOST equivalence test (Schuirmann 1987): is cohort A's mean
    * EQUIVALENT to the rest's within ±`delta` — the question every
    * "no significant difference" misreads (failing to reject H0 is not
    * evidence of equivalence; TOST makes equivalence the alternative).
    * Two one-sided Welch z tests: z₁ = (Δ+δ)/se against Δ ≤ −δ and
    * z₂ = (δ−Δ)/se against Δ ≥ δ; both must exceed z₀.₉₅
    * (1.6448536269514722) to declare equivalence at 5% — identically,
    * the 90% CI [Δ ± z₀.₉₅·se] must sit inside (−δ, δ), which is the
    * readout shipped beside the verdict. The pipeline use: "the
    * re-tokenized corpus's mean doc length is the same to within 50
    * chars" is a claim TOST can certify and a plain t-test never can.
    *
    * Normal (z) critical values — corpus-scale n makes Welch df
    * corrections vanish; `equivalent_05` is NULL when either cohort
    * has n < 2 or se = 0. Shape: ONE whole-corpus rollup (per-cohort
    * count/mean/variance via conditional aggregates), 1 row out. */
  def tostEquivalence(df: DataFrame, value: Column, inA: Column,
      delta: Double, dp: Int = 6): DataFrame = {
    require(delta > 0, s"delta must be positive, got $delta")
    val z95 = 1.6448536269514722
    val v = value.cast("double")
    val a = df.where(value.isNotNull && inA.isNotNull)
      .select(v.as("__v"), inA.cast("boolean").as("__a"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
        avg(when(col("__a"), col("__v"))).as("__ma"),
        avg(when(!col("__a"), col("__v"))).as("__mb"),
        var_samp(when(col("__a"), col("__v"))).as("__va"),
        var_samp(when(!col("__a"), col("__v"))).as("__vb"))
    val se = sqrt(col("__va") / col("n_a") + col("__vb") / col("n_b"))
    val diff = col("__ma") - col("__mb")
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se > 0.0
    a.select(col("n_a"), col("n_b"),
      round(diff, dp).as("diff"),
      when(ok, round(se, dp)).as("se"),
      when(ok, round(diff - lit(z95) * se, dp)).as("ci90_lo"),
      when(ok, round(diff + lit(z95) * se, dp)).as("ci90_hi"),
      lit(delta).as("delta"),
      when(ok, (diff + lit(delta)) / se > z95 &&
        (lit(delta) - diff) / se > z95).as("equivalent_05"))
  }

  /** Chapman capture–recapture estimate (Chapman 1951): how big is the
    * population two independent detectors are each catching part of —
    *
    *   N̂ = (n_A+1)(n_B+1)/(m+1) − 1,   m = |A ∩ B|
    *
    * with Seber's variance (n_A+1)(n_B+1)(n_A−m)(n_B−m)/((m+1)²(m+2)).
    * The pipeline reading: run two DIFFERENT near-dup detectors
    * (MinHash and SimHash, say) over the same corpus; the overlap of
    * their catch lists estimates the TRUE duplicate population,
    * `coverage_union` says what fraction the union actually caught,
    * and N̂ − n_union is the estimated count still slipping through —
    * turning "we caught 1.2M dups" into "an estimated 0.3M remain".
    * Assumes independent detectors and homogeneous catchability
    * (positively correlated detectors bias N̂ LOW — treat it as a
    * floor). Estimates are NULL when either list is empty.
    *
    * Shape: ONE whole-corpus rollup (3 conditional counts), 1 row
    * out. */
  def captureRecapture(df: DataFrame, caughtA: Column, caughtB: Column,
      dp: Int = 6): DataFrame = {
    val ca = caughtA.cast("boolean")
    val cb = caughtB.cast("boolean")
    val a = df.select(ca.as("__a"), cb.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("__a") || col("__b"), 1L).otherwise(0L)).as("n_union"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val m = col("n_both").cast("double")
    val nHat = (nA + 1) * (nB + 1) / (m + 1) - 1
    val varHat = (nA + 1) * (nB + 1) * (nA - m) * (nB - m) /
      ((m + 1) * (m + 1) * (m + 2))
    val ok = col("n_a") > 0 && col("n_b") > 0
    a.select(col("n_a"), col("n_b"), col("n_both"), col("n_union"),
      when(ok, round(nHat, dp)).as("n_hat"),
      when(ok, round(sqrt(varHat), dp)).as("se"),
      when(ok && nHat > 0, round(col("n_union") / nHat, dp))
        .as("coverage_union"))
  }

  /** Two-proportion power / minimum-detectable-effect analysis of an
    * A/B assignment: from the observed arm sizes and the CONTROL rate,
    * the design's MDE at α=0.05 (two-sided) and 80% power —
    *
    *   MDE = (z₀.₉₇₅ + z₀.₈₀)·√(p_c(1−p_c)(1/n_t + 1/n_c))
    *
    * (exact constants 1.9599639845400545 and 0.8416212335729143) — and
    * the ACHIEVED power for the lift actually observed,
    * Φ(|Δ|/se₀ − z₀.₉₇₅) via [[normalCdf]]. The pre-experiment sanity
    * readout every A/B table needs: a "significant" lift larger than
    * the MDE of a later, smaller replication is expected to vanish
    * (winner's curse), and an experiment whose observed power is ~5%
    * was never going to answer its question. se₀ uses the control rate
    * for both arms (the H0 design convention). Statistics are NULL
    * when either arm is empty or p_c is degenerate (0 or 1).
    *
    * Shape: ONE whole-corpus aggregation (4 conditional counts), 1 row
    * out. */
  def powerMde(df: DataFrame, treated: Column, success: Column,
      dp: Int = 6): DataFrame = {
    val zA = 1.9599639845400545
    val zB = 0.8416212335729143
    val a = df.select(treated.cast("boolean").as("__t"),
        success.cast("boolean").as("__s"))
      .where(col("__t").isNotNull && col("__s").isNotNull)
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t") && col("__s"), 1L).otherwise(0L)).as("__xt"),
        sum(when(!col("__t") && col("__s"), 1L).otherwise(0L)).as("__xc"))
    val pt = col("__xt").cast("double") / col("n_t")
    val pc = col("__xc").cast("double") / col("n_c")
    val se0 = sqrt(pc * (lit(1.0) - pc) *
      (lit(1.0) / col("n_t") + lit(1.0) / col("n_c")))
    val ok = col("n_t") > 0 && col("n_c") > 0 && pc > 0.0 && pc < 1.0
    a.select(col("n_t"), col("n_c"),
      when(col("n_c") > 0, round(pc, dp)).as("rate_c"),
      when(col("n_t") > 0, round(pt, dp)).as("rate_t"),
      when(col("n_t") > 0 && col("n_c") > 0, round(pt - pc, dp)).as("lift"),
      when(ok, round(lit(zA + zB) * se0, dp)).as("mde_80"),
      when(ok, round(normalCdf(abs(pt - pc) / se0 - lit(zA)), dp))
        .as("power_observed"))
  }

  /** Beta-binomial empirical-Bayes shrinkage of per-group rates
    * (Robbins 1956; the baseball-batting classic): fit a Beta(α, β)
    * prior to the observed per-group rates by method of moments —
    * α+β = m(1−m)/v − 1 over the group-rate mean m and sample
    * variance v — then report each group at its posterior mean
    * (xᵢ+α)/(nᵢ+α+β). Small groups shrink hard toward the pool, big
    * groups barely move: the per-source quality/pass-rate leaderboard
    * that stops a 3-document source from topping the table at 100%.
    * The MoM fit weights every group equally regardless of nᵢ (the
    * standard simple form; a likelihood fit would weight by nᵢ).
    * α and β are ROUNDED at dp before shrinking (the GD-weight
    * reproducibility discipline) and NULL — with shrunk = raw — when
    * the prior is undefined (v = 0, or v ≥ m(1−m) which implies a
    * non-positive concentration).
    *
    * Shape: one group-keyed rollup (map-side partial), a 1-row prior
    * rollup over the GROUP-cardinality-bounded table, broadcast back.
    * Returns one row per group:
    * (grp, n, successes, raw_rate, alpha, beta, shrunk_rate). */
  def ebShrinkage(df: DataFrame, group: Column, success: Column,
      dp: Int = 6): DataFrame = {
    val per = df.where(success.isNotNull)
      .groupBy(group.as("grp"))
      .agg(count(lit(1L)).as("n"),
        sum(when(success.cast("boolean"), 1L).otherwise(0L)).as("__x"))
      .withColumn("__r", col("__x").cast("double") / col("n"))
    val s = col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1.0
    val ok = col("__v") > 0.0 && s > 0.0
    val prior = per.agg(avg(col("__r")).as("__m"),
        var_samp(col("__r")).as("__v"))
      .select(round(when(ok, col("__m") * s), dp).as("alpha"),
        round(when(ok, (lit(1.0) - col("__m")) * s), dp).as("beta"))
    per.crossJoin(broadcast(prior))
      .select(col("grp"), col("n"), col("__x").as("successes"),
        round(col("__r"), dp).as("raw_rate"),
        col("alpha"), col("beta"),
        round(when(col("alpha").isNull, col("__r"))
          .otherwise((col("__x") + col("alpha")) /
            (col("n") + col("alpha") + col("beta"))), dp).as("shrunk_rate"))
  }

  /** Benjamini–Hochberg FDR adjustment over a table of test p-values:
    * `p_adj(k) = min over j ≥ k of (K·p_(j) / j)`, clamped to 1 — the
    * step-up control that keeps multi-metric drift dashboards honest.
    * `tie` must break p-value ties deterministically (the test id).
    *
    * The running-min window is ordered over the TEST table — one row
    * per hypothesis (metrics × slices), bounded by the dashboard size,
    * never by the data the p-values were computed from. */
  def bhAdjust(df: DataFrame, pCol: String, tie: Column,
      dp: Int = 6): DataFrame = {
    val wRank = Window.orderBy(col(pCol).asc, tie.asc)
    val wSuffix = Window.orderBy(col(pCol).desc, tie.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.crossJoin(df.agg(count(lit(1L)).cast("double").as("__K")))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("p_adj", round(least(lit(1.0),
        min(col(pCol) * col("__K") / col("__rk")).over(wSuffix)), dp))
      .drop("__rk", "__K")
  }

  /** Funnel analysis: how many users complete `steps` IN ORDER, each
    * event strictly later than the previous step's, all within `within`
    * of the user's FIRST first-step event (the anchor — the common
    * product-analytics convention, and the one an inequality-join SQL
    * oracle can restate exactly).
    *
    * Shape: ONE shuffle (groupBy user over only the step-relevant
    * events), then a sorted in-scan array fold advances a (step,
    * anchor, last) state machine per user — no self-joins, no k-way
    * shuffle cascade, which is what the naive per-step join plan costs.
    * Per-user state is that user's step-typed events; at 100 TB cap a
    * runaway key first (capPerGroup) — the fold itself is linear.
    *
    * Returns one row per step: (step, step_name, n_users reaching it). */
  def funnel(df: DataFrame, user: Column, ts: Column, event: Column,
      steps: Seq[String], within: String): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val stepsArr = array(steps.map(lit): _*)
    val init = struct(lit(0).as("step"),
      lit(null).cast("timestamp").as("anchor"),
      lit(null).cast("timestamp").as("last"))
    val folded = df.where(event.isin(steps: _*))
      .groupBy(user.as("__u"))
      .agg(sort_array(collect_list(struct(ts.as("t"), event.as("e")))).as("__evs"))
      .select(aggregate(col("__evs"), init, (st, ev) => {
        val idx = st.getField("step")
        val advance = idx < steps.size &&
          ev.getField("e") === element_at(stepsArr, idx + 1) &&
          (st.getField("last").isNull || ev.getField("t") > st.getField("last")) &&
          (st.getField("anchor").isNull ||
            ev.getField("t") <= st.getField("anchor") + expr(s"INTERVAL $within"))
        struct(
          when(advance, idx + 1).otherwise(idx).as("step"),
          when(advance && idx === 0, ev.getField("t"))
            .otherwise(st.getField("anchor")).as("anchor"),
          when(advance, ev.getField("t")).otherwise(st.getField("last")).as("last"))
      }).getField("step").as("__s"))
    folded
      .select(explode(sequence(lit(1), lit(steps.size))).as("step"), col("__s"))
      .groupBy("step")
      .agg(sum(when(col("__s") >= col("step"), 1L).otherwise(0L)).as("n_users"))
      .withColumn("step_name", element_at(stepsArr, col("step")))
      .select("step", "step_name", "n_users")
      .orderBy("step")
  }

  /** Star-schema dimension join: fact ⋈ small dims. Dims are explicitly
    * broadcast — at 100 TB the fact side never shuffles for these joins. */
  def dimJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (df, (dim, cond)) => df.join(broadcast(dim), cond) }

  /** Top-k rows per group, deterministic via explicit tie-break ordering.
    * row_number + filter compiles to a single window stage; with k small
    * Spark pushes a per-partition top-k (WindowGroupLimit) before the
    * shuffle, so the exchange carries only k rows per group per partition. */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }

  /** Global top-k with deterministic tie-break: TakeOrderedAndProject —
    * per-partition heaps, only k rows cross the network. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Running aggregate over an ordered per-key stream (ROWS UNBOUNDED
    * PRECEDING → CURRENT ROW). One shuffle on the partition keys. */
  def runningAgg(df: DataFrame, partition: Seq[Column], order: Seq[Column],
      agg: Column, name: String): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(name, agg.over(w))
  }

  /** Rolling event-time window aggregation: per row, each `aggs` entry
    * evaluated over the partition's rows with timestamps in
    * [t − windowSeconds, t] (inclusive, second granularity — the order
    * key is epoch seconds, so sub-second peers share a frame). The
    * trailing-window twin of [[runningAgg]]: RANGE frame over event time
    * instead of a row prefix. One shuffle on the partition keys; the
    * frame is evaluated in a single sorted pass per partition. */
  def rollingTimeAgg(df: DataFrame, partition: Seq[Column], ts: Column,
      windowSeconds: Long, aggs: Seq[(Column, String)]): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val w = Window.partitionBy(partition: _*).orderBy(unix_timestamp(ts))
      .rangeBetween(-windowSeconds, 0)
    aggs.foldLeft(df) { case (d, (a, n)) => d.withColumn(n, a.over(w)) }
  }

  /** Rolling z-score anomaly flags: each row compared against its
    * partition's trailing `windowSeconds` HISTORY — the frame EXCLUDES
    * the current row (and same-second peers), because an inclusive
    * window lets a spike inflate its own baseline: with n points the
    * inclusive z-score is bounded by (n−1)/√n, so a lone spike in a
    * small window can never trip k=3. is_anomaly ⟺ |v − mean| >
    * k·stddev, computed from `scoreDp`-ROUNDED window statistics so the
    * boundary decision is engine-deterministic; rows with fewer than
    * two history points (stddev null) are never flagged. Same cost as
    * any rolling aggregate: one shuffle on the partition keys, one
    * sorted pass. The event-stream monitoring primitive (billing
    * spikes, sensor glitches) over plain batch tables. */
  def rollingAnomalies(df: DataFrame, partition: Seq[Column], ts: Column,
      windowSeconds: Long, value: Column, k: Double = 3.0,
      scoreDp: Int = 6): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(partition: _*).orderBy(unix_timestamp(ts))
      .rangeBetween(-windowSeconds, -1)
    df.withColumn("roll_mean", round(avg(value).over(w), scoreDp))
      .withColumn("roll_std", round(stddev_samp(value).over(w), scoreDp))
      .withColumn("is_anomaly",
        col("roll_std").isNotNull &&
          abs(value - col("roll_mean")) > lit(k) * col("roll_std"))
  }

  /** Tumbling event-time window aggregation (batch twin of the streaming
    * path in graft.streaming). Emits the window start as epoch seconds so
    * results are engine-portable. */
  def tumblingAgg(df: DataFrame, ts: Column, width: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sliding event-time window aggregation: windows of `width` starting
    * every `slide` (width = k·slide ⇒ each event lands in k windows —
    * Spark's Expand, k output rows per input row before the partial
    * aggregate). Same epoch-aligned window convention and portable
    * epoch-seconds output as [[tumblingAgg]]. */
  def slidingAgg(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sessionization: groups a user's events into sessions separated by
    * gaps > `gap`. Uses session_window (state-store-compatible with the
    * streaming path); one shuffle on the keys. */
  def sessionAgg(df: DataFrame, ts: Column, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")

  /** As-of join (the time-series "attach the latest right row at or
    * before each left row's timestamp, per key" operator — Spark has no
    * built-in): implemented as union + last-value window, NOT a range
    * join. Tag each side, union on (keys, ts), and per key carry the
    * right side's values forward with `last(ignoreNulls)` over
    * (ts, side); left rows then read the most recent right values.
    *
    * Scale shape: ONE shuffle on the keys and a per-key sort — cost is
    * O(n log n) per key, independent of match distance. The naive range
    * join (l.ts >= r.ts) explodes to O(|L|·|R|) pairs per key before
    * aggregation; a 100 TB event stream cannot pay that.
    *
    * Semantics: inclusive (right row AT the left timestamp matches —
    * right sorts before left on ties); left rows with no prior right row
    * get NULLs, like a left outer as-of. `right` must be unique per
    * (keys, ts) — pre-aggregate otherwise (the window's last() among
    * same-(key, ts) right rows would be nondeterministic).
    *
    * Row atomicity: ALL right value columns travel as ONE struct carried
    * forward by a single last(ignoreNulls=true) — so a right row holding
    * a legitimate NULL in one value column delivers that NULL as-is. (A
    * per-column carry would back-fill the NULL from an OLDER right row,
    * mixing columns of different right rows in one output row.)
    *
    * `direction`: "backward" (default — latest right AT OR BEFORE the
    * left timestamp) or "forward" (earliest right AT OR AFTER it — the
    * "next reading" lookup). Forward mirrors the same union + window
    * plan with the frame and tie order reversed; both are inclusive at
    * equal timestamps. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"direction must be 'backward' or 'forward', got '$direction'")
    val rVals = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    val lCols = left.columns.toSeq.filterNot(keys.contains)
    val collisions = rVals.intersect(lCols)
    require(collisions.isEmpty,
      s"asofJoin: rename right-side value columns colliding with left: ${collisions.mkString(", ")}")
    if (rVals.isEmpty) return left.select((keys ++ lCols).map(col): _*)
    val rStruct = org.apache.spark.sql.types.StructType(
      rVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lTypes = lCols.map(c => c -> left.schema(c).dataType).toMap
    // tie order: the right row at an equal timestamp must fall INSIDE the
    // left row's frame — before it for the trailing backward frame, after
    // it for the leading forward frame
    val (leftTag, rightTag) = if (direction == "backward") (1, 0) else (0, 1)
    val l = left.select(keys.map(col) ++
      Seq(col(leftTs).as("__ts"), lit(leftTag).as("__side")) ++
      lCols.map(col) :+ lit(null).cast(rStruct).as("__rv"): _*)
    val r = right.select(keys.map(col) ++
      Seq(col(rightTs).as("__ts"), lit(rightTag).as("__side")) ++
      lCols.map(c => lit(null).cast(lTypes(c)).as(c)) :+
      struct(rVals.map(col): _*).as("__rv"): _*)
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts"), col("__side"))
    val carried =
      if (direction == "backward")
        last(col("__rv"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__rv"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    l.unionByName(r)
      .select((keys.map(col) ++ lCols.map(col) :+ col("__side")) :+
        carried.as("__rv"): _*)
      .where(col("__side") === leftTag)
      .select((keys.map(col) ++ lCols.map(col)) ++
        rVals.map(c => col("__rv").getField(c).as(c)): _*)
  }

  /** Robust column statistics — the outlier-resistant complement of the
    * check engine's mean/stddev colstats: `trim`-quantile thresholds,
    * trimmed mean (values outside [p_lo, p_hi] dropped), winsorized
    * sample stddev (values clamped to the thresholds), and trim
    * accounting. Two jobs: one threshold aggregate, then one scan with
    * the 1-row threshold table cross-joined in (broadcast). `exact`
    * chooses the percentile estimator — the default approx sketch is
    * mergeable (the 100 TB path, same tradeoff as
    * DataPrep.bucketByQuantiles); exact is the oracle-audit opt-in. */
  /** Binary-classifier evaluation in one pass: ROC-AUC via the
    * Mann-Whitney rank identity —
    *
    *   AUC = (Σ_{positives} rank(score) − n₊(n₊+1)/2) / (n₊·n₋)
    *
    * with TIE-AVERAGED ranks (exactly the probability a random positive
    * outranks a random negative, ties counting ½ — the trapezoidal ROC
    * area), plus the Brier score avg((p−y)²). The in-engine quality
    * gate for model-based curation scorers (quality classifiers,
    * LM-perplexity filters) against any labeled slice.
    *
    * Tie-averaged ranks come from the distinct-SCORE histogram CDF
    * (same trick as [[correlationStats]]' Spearman), and the CDF scan
    * is the two-phase [[Windows.globalCumSum]] — a continuous
    * classifier score has ~n distinct values, so an unpartitioned
    * window over the histogram would still be a corpus-sized
    * single-reducer sort at 100 TB. Returns one row:
    * (auc, brier, n_pos, n_neg). Scores must be non-null; labels 0/1. */
  def aucBrier(df: DataFrame, score: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val s = score.cast("double")
    val y = label.cast("double")
    val hist = df.groupBy(s.as("__s"))
      .agg(count(lit(1L)).as("__c"), sum(y).as("__pos"))
    // tie-averaged rank of every row with score v:
    //   cdf(v) − (c(v)+1)/2 + 1  where cdf is the inclusive running count
    val ranked = Windows.globalCumSum(hist, Seq(col("__s")), col("__c"), "__cdf")
      .select(col("__pos"),
        (col("__cdf") - (col("__c") + 1) / lit(2.0) + 1).as("__r"))
    val sums = ranked.agg(
      sum(col("__pos") * col("__r")).as("__rpos"),
      sum(col("__pos")).as("__np"))
    val totals = df.agg(count(lit(1L)).as("__n"),
      round(avg((s - y) * (s - y)), dp).as("brier"))
    sums.crossJoin(totals).select(
      round((col("__rpos") - col("__np") * (col("__np") + 1) / 2) /
        (col("__np") * (col("__n") - col("__np"))), dp).as("auc"),
      col("brier"),
      col("__np").cast("long").as("n_pos"),
      (col("__n") - col("__np")).cast("long").as("n_neg"))
  }

  /** ROC-AUC with the Hanley–McNeil confidence interval (Hanley &
    * McNeil, Radiology 1982): the same tie-averaged rank AUC as
    * [[aucBrier]], plus its closed-form standard error
    *
    *   se² = [A(1−A) + (n₊−1)(Q₁−A²) + (n₋−1)(Q₂−A²)] / (n₊·n₋),
    *   Q₁ = A/(2−A),  Q₂ = 2A²/(1+A)
    *
    * and the 95% normal CI (clamped to [0,1]) — the error bar the bare
    * AUC number always needed: an AUC of 0.71 on 50 positives and one
    * on 50k positives are different claims. [[delongTest]] compares
    * two correlated AUCs; this is the single-scorer readout. se/CI are
    * NULL when either class is empty.
    *
    * Shape: [[aucBrier]]'s exactly — score histogram, one two-phase
    * rank pass, a 1-row closed form. */
  def aucConfidence(df: DataFrame, score: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val s = score.cast("double")
    val y = label.cast("double")
    val hist = df.groupBy(s.as("__s"))
      .agg(count(lit(1L)).as("__c"), sum(y).as("__pos"))
    val ranked = Windows.globalCumSum(hist, Seq(col("__s")), col("__c"), "__cdf")
      .select(col("__pos"),
        (col("__cdf") - (col("__c") + 1) / lit(2.0) + 1).as("__r"))
    val sums = ranked.agg(
      sum(col("__pos") * col("__r")).as("__rpos"),
      sum(col("__pos")).as("__np"))
    val totals = df.agg(count(lit(1L)).as("__n"))
    val joined = sums.crossJoin(totals)
    val np = col("__np")
    val nn = col("__n") - col("__np")
    val a = (col("__rpos") - np * (np + 1) / 2) / (np * nn)
    val q1 = a / (lit(2.0) - a)
    val q2 = lit(2.0) * a * a / (lit(1.0) + a)
    val se = sqrt((a * (lit(1.0) - a) + (np - 1) * (q1 - a * a) +
      (nn - 1) * (q2 - a * a)) / (np * nn))
    val ok = np > 0.0 && nn > 0.0
    val zc = lit(1.959963984540054)
    joined.select(
      np.cast("long").as("n_pos"), nn.cast("long").as("n_neg"),
      when(ok, round(a, dp)).as("auc"),
      when(ok, round(se, dp)).as("se"),
      when(ok, round(greatest(lit(0.0), a - zc * se), dp)).as("ci95_lo"),
      when(ok, round(least(lit(1.0), a + zc * se), dp)).as("ci95_hi"))
  }

  /** Confident-learning label-noise estimate (the Northcutt et al.,
    * JAIR 2021 counting idea, binary form): using a scorer trusted
    * more than the labels, per-class confidence thresholds are the
    * class-conditional mean scores t₊ = mean(s | y=1),
    * t₋ = mean(s | y=0); a row labeled 0 scoring ≥ t₊ is confidently
    * mislabeled-negative, a row labeled 1 scoring ≤ t₋ confidently
    * mislabeled-positive. Reported: both suspect counts, the implied
    * overall noise rate, and the per-class rates — the LABEL-QUALITY
    * audit for bought/scraped/weak-supervision training labels, where
    * "how dirty is this" decides relabel-vs-drop before any training
    * run. Estimates are NULL when either class is empty (no
    * threshold exists).
    *
    * Shape: one 1-row threshold rollup (two conditional means), one
    * counting scan against the broadcast thresholds — two map-side-
    * partial passes, 1 row out. */
  def labelNoiseEstimate(df: DataFrame, score: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val s = score.cast("double")
    val y = label.cast("boolean")
    val base = df.where(s.isNotNull && y.isNotNull)
      .select(s.as("__s"), y.as("__y"))
    val th = base.agg(avg(when(col("__y"), col("__s"))).as("__tp"),
      avg(when(!col("__y"), col("__s"))).as("__tn"))
    val counted = base.crossJoin(broadcast(th)).agg(
      count(lit(1L)).as("n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("__y") && col("__s") >= col("__tp"), 1L).otherwise(0L))
        .as("n_flip_to_neg"),
      sum(when(col("__y") && col("__s") <= col("__tn"), 1L).otherwise(0L))
        .as("n_flip_to_pos"),
      first(col("__tp")).as("__tp"), first(col("__tn")).as("__tn"))
    val nPos = col("n_pos")
    val nNeg = col("n") - col("n_pos")
    val ok = col("__tp").isNotNull && col("__tn").isNotNull
    counted.select(col("n"), nPos.as("n_pos"), nNeg.as("n_neg"),
      round(col("__tp"), dp).as("thresh_pos"),
      round(col("__tn"), dp).as("thresh_neg"),
      col("n_flip_to_neg"), col("n_flip_to_pos"),
      when(ok, round((col("n_flip_to_neg") + col("n_flip_to_pos"))
        .cast("double") / col("n"), dp)).as("est_noise_rate"),
      when(ok && nNeg > 0, round(col("n_flip_to_neg").cast("double") / nNeg,
        dp)).as("rate_neg_labeled"),
      when(ok && nPos > 0, round(col("n_flip_to_pos").cast("double") / nPos,
        dp)).as("rate_pos_labeled"))
  }

  /** Average precision (the PR-curve area, sklearn's
    * `average_precision_score` convention) + best achievable F1 — the
    * precision-recall companion of [[aucBrier]]: under class imbalance
    * (the usual curation regime — few "bad" documents in a huge corpus)
    * ROC-AUC stays optimistically high while PR-AUC collapses, so both
    * belong on the scorer's report card.
    *
    * Tie handling is deterministic by construction: every DISTINCT
    * score is one threshold block, and
    *
    *   AP      = Σ_blocks (pos_s / n₊) · P(s)      (step interpolation)
    *   best_f1 = max_blocks 2·TP(s) / (N(s) + n₊)
    *
    * with TP/N the cumulative positives/rows at score ≥ s. Cumulative
    * counts come from ONE ascending two-phase
    * [[Windows.globalCumSums]] pass (both sums share the exchange)
    * flipped by the 1-row totals — no descending re-sort, no
    * single-reducer window over a continuous score. AP is NULL when
    * either class is absent (the PR curve is undefined). */
  def averagePrecision(df: DataFrame, score: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val s = score.cast("double")
    val y = label.cast("double")
    val hist = df.groupBy(s.as("__s"))
      .agg(count(lit(1L)).as("__c"), sum(y).as("__pos"))
    val cum = Windows.globalCumSums(hist, Seq(col("__s")),
      Seq((col("__c"): Column) -> "__cumc", (col("__pos"): Column) -> "__cump"))
    val tot = hist.agg(sum(col("__c")).as("__n"), sum(col("__pos")).as("__np"))
    // at-or-above-threshold counts from the ascending inclusive cumsum:
    // TP(s) = n+ − cump(≤s) + pos(s), N(s) = n − cumc(≤s) + c(s)
    val flipped = cum.crossJoin(broadcast(tot))
      .withColumn("__tp", col("__np") - col("__cump") + col("__pos"))
      .withColumn("__at", (col("__n") - col("__cumc") + col("__c")).cast("double"))
    flipped.agg(
      max(col("__np")).as("__npo"),
      max(col("__n")).as("__no"),
      sum(col("__pos") * col("__tp") / col("__at")).as("__apnum"),
      max(lit(2.0) * col("__tp") / (col("__at") + col("__np")))
        .as("__bestf1"))
    .select(
      when(col("__npo") > 0 && col("__no") > col("__npo"),
        round(col("__apnum") / col("__npo"), dp)).as("ap"),
      when(col("__npo") > 0 && col("__no") > col("__npo"),
        round(col("__bestf1"), dp)).as("best_f1"),
      col("__npo").cast("long").as("n_pos"),
      (col("__no") - col("__npo")).cast("long").as("n_neg"),
      when(col("__no") > 0, round(col("__npo") / col("__no").cast("double"), dp))
        .as("prevalence"))
  }

  /** DeLong's test (DeLong et al. 1988) for two CORRELATED ROC-AUCs —
    * "is scorer A significantly better than scorer B on the SAME
    * labeled items", the question [[aucBrier]] alone cannot answer
    * because the two AUCs share every item's noise. Uses the fast
    * mid-rank form of the structural components (Sun & Xu 2014):
    * for a positive item i and negative j,
    *
    *   V10(i) = (rank_all(xᵢ) − rank_pos(xᵢ)) / n₋
    *   V01(j) = 1 − (rank_all(x_j) − rank_neg(x_j)) / n₊
    *
    * AUC = mean V10 = mean V01; Var(AUC_A − AUC_B) =
    * (S10_A + S10_B − 2·S10_AB)/n₊ + (S01_A + S01_B − 2·S01_AB)/n₋
    * with S the sample (co)variances of the components.
    *
    * Exactness: components are accumulated as 2·(rank−rank) — integers
    * — so every moment sum is order-independent and exact in doubles
    * at oracle scale; the float algebra happens once, in the 1-row
    * verdict, identically in both engines.
    *
    * Scale shape: per scorer ONE distinct-score histogram + ONE
    * two-phase [[Windows.globalCumSums]] pass (global + per-class
    * mid-ranks share the exchange) + ONE score-keyed equi-join back;
    * the moment rollup is a single aggregate with conditional sums —
    * no item-keyed join between the models (both scores ride the same
    * row). z is NULL when either class has < 2 items or the variance
    * of the difference is 0 (e.g. identical scorers). */
  def delongTest(df: DataFrame, scoreA: Column, scoreB: Column,
      label: Column, dp: Int = 6): DataFrame = {
    val base = df.select(scoreA.cast("double").as("__sa"),
        scoreB.cast("double").as("__sb"), label.cast("double").as("__y"))
      .where(col("__sa").isNotNull && col("__sb").isNotNull &&
        col("__y").isNotNull)
      .localCheckpoint(true) // two rank joins read it
    def rankTable(s: String, suf: String): DataFrame = {
      val hist = base.groupBy(col(s).as(s + "k"))
        .agg(count(lit(1L)).as("__c"), sum(col("__y").cast("long")).as("__p"))
      val cum = Windows.globalCumSums(hist, Seq(col(s + "k")),
        Seq((col("__c"): Column) -> "__cc",
          (col("__p"): Column) -> "__cp"))
      // 2·rank_all = 2cc − c + 1; 2·rank_pos = 2cp − p + 1;
      // 2·rank_neg = 2(cc−cp) − (c−p) + 1  (all exact longs)
      cum.select(col(s + "k"),
        ((col("__cc") * 2 - col("__c")) - (col("__cp") * 2 - col("__p")))
          .as("__d10" + suf),
        ((col("__cc") * 2 - col("__c")) -
          ((col("__cc") - col("__cp")) * 2 - (col("__c") - col("__p"))))
          .as("__d01" + suf))
    }
    val ra = rankTable("__sa", "a")
    val rb = rankTable("__sb", "b")
    val rows = base
      .join(ra, col("__sa") === col("__sak")).drop("__sak")
      .join(rb, col("__sb") === col("__sbk")).drop("__sbk")
    val pos = col("__y") === 1.0
    val m = rows.agg(
      sum(col("__y").cast("long")).as("__np"),
      sum(when(pos, lit(0L)).otherwise(1L)).as("__nn"),
      sum(when(pos, col("__d10a"))).as("__spa"),
      sum(when(pos, col("__d10a") * col("__d10a"))).as("__sspa"),
      sum(when(pos, col("__d10b"))).as("__spb"),
      sum(when(pos, col("__d10b") * col("__d10b"))).as("__sspb"),
      sum(when(pos, col("__d10a") * col("__d10b"))).as("__spab"),
      sum(when(!pos, col("__d01a"))).as("__sna"),
      sum(when(!pos, col("__d01a") * col("__d01a"))).as("__ssna"),
      sum(when(!pos, col("__d01b"))).as("__snb"),
      sum(when(!pos, col("__d01b") * col("__d01b"))).as("__ssnb"),
      sum(when(!pos, col("__d01a") * col("__d01b"))).as("__snab"))
    val np = col("__np").cast("double")
    val nn = col("__nn").cast("double")
    val aucA = col("__spa") / (lit(2.0) * np * nn)
    val aucB = col("__spb") / (lit(2.0) * np * nn)
    def s10(ss: Column, s: Column) =
      (ss - s * s / np) / (lit(4.0) * nn * nn * (np - 1))
    def s01(ss: Column, s: Column) =
      (ss - s * s / nn) / (lit(4.0) * np * np * (nn - 1))
    val c10 = (col("__spab") - col("__spa") * col("__spb") / np) /
      (lit(4.0) * nn * nn * (np - 1))
    val c01 = (col("__snab") - col("__sna") * col("__snb") / nn) /
      (lit(4.0) * np * np * (nn - 1))
    val varA = s10(col("__sspa"), col("__spa")) / np +
      s01(col("__ssna"), col("__sna")) / nn
    val varB = s10(col("__sspb"), col("__spb")) / np +
      s01(col("__ssnb"), col("__snb")) / nn
    val vdiff = (s10(col("__sspa"), col("__spa")) +
        s10(col("__sspb"), col("__spb")) - lit(2.0) * c10) / np +
      (s01(col("__ssna"), col("__sna")) +
        s01(col("__ssnb"), col("__snb")) - lit(2.0) * c01) / nn
    val ok = col("__np") >= 2 && col("__nn") >= 2
    val z = (aucA - aucB) / sqrt(vdiff)
    m.select(
      when(col("__np") > 0 && col("__nn") > 0, round(aucA, dp)).as("auc_a"),
      when(col("__np") > 0 && col("__nn") > 0, round(aucB, dp)).as("auc_b"),
      when(ok, round(sqrt(varA), dp)).as("se_a"),
      when(ok, round(sqrt(varB), dp)).as("se_b"),
      when(ok && vdiff >= 0.0, round(sqrt(vdiff), dp)).as("se_diff"),
      when(ok && vdiff > 0.0, round(z, dp)).as("z"),
      when(ok && vdiff > 0.0, abs(z) > lit(1.959963984540054))
        .as("reject_05"),
      col("__np").as("n_pos"), col("__nn").as("n_neg"))
  }

  /** Per-slice [[aucBrier]]: the same tie-averaged rank-sum AUC + Brier
    * computed independently for every `group` value — the fairness /
    * per-source audit of a curation scorer (a classifier can hold 0.9
    * AUC overall while ranking one source's documents at chance). Same
    * distinct-score histogram trick, but the rank window is PARTITIONED
    * by group, so nothing funnels through one reducer at any group
    * cardinality. Groups that lack both classes report NULL auc (the
    * rank-sum is undefined — the heapsFit guard discipline, not an ANSI
    * divide error). Returns (grp, auc, brier, n_pos, n_neg). */
  def aucBrierByGroup(df: DataFrame, group: Column, score: Column,
      label: Column, dp: Int = 6): DataFrame = {
    val s = score.cast("double")
    val y = label.cast("double")
    val hist = df.groupBy(group.as("__g"), s.as("__s"))
      .agg(count(lit(1L)).as("__c"), sum(y).as("__pos"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("__cdf", sum(col("__c")).over(w))
      .select(col("__g"), col("__pos"),
        (col("__cdf") - (col("__c") + 1) / lit(2.0) + 1).as("__r"))
    val sums = ranked.groupBy(col("__g"))
      .agg(sum(col("__pos") * col("__r")).as("__rpos"),
        sum(col("__pos")).as("__np"))
    val totals = df.groupBy(group.as("__g"))
      .agg(count(lit(1L)).as("__n"),
        round(avg((s - y) * (s - y)), dp).as("brier"))
    sums.join(totals, "__g").select(col("__g").as("grp"),
      when(col("__np") > 0 && col("__n") > col("__np"),
        round((col("__rpos") - col("__np") * (col("__np") + 1) / 2) /
          (col("__np") * (col("__n") - col("__np"))), dp)).as("auc"),
      col("brier"),
      col("__np").cast("long").as("n_pos"),
      (col("__n") - col("__np")).cast("long").as("n_neg"))
  }

  /** Split-conformal calibration thresholds (Vovk et al.; Angelopoulos &
    * Bates, arXiv:2107.07511 §2): for each miscoverage level α, the
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score — filtering new data
    * at that threshold then guarantees ≥ 1−α coverage under
    * exchangeability. The calibrated way to turn any curation scorer
    * into a keep/drop rule with a stated error budget.
    *
    * Shape: ONE count job + one two-phase global rank
    * ([[graft.ops.Windows.globalRowNumber]] — range repartition, local
    * row_number, broadcast offsets; no single-reducer sort) + a rank ∈
    * {k_α} filter. α whose k exceeds n (tiny n) reports a NULL
    * threshold (the guarantee needs n ≥ (1−α)(n+1) samples). */
  def conformalThresholds(df: DataFrame, score: Column,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      s"alphas must be in (0,1), got $alphas")
    val scored = df.select(score.cast("double").as("__s"))
      .where(col("__s").isNotNull)
    val n = scored.count()
    // exact decimal ceil (the conformalCoverage discipline): FP
    // (1 - alpha) sits one ulp off for decimal alphas, bumping ceil a
    // rank high exactly when (n+1)(1-alpha) is an integer
    val ks = alphas.map(a => a ->
      (BigDecimal(n + 1) * (BigDecimal(1) - BigDecimal(a.toString)))
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong)
    val ranked = Windows.globalRowNumber(scored, Seq(col("__s")), "__rn")
      .where(col("__rn").isin(ks.map(_._2).filter(_ <= n): _*))
    val spec = ks.map { case (a, k) => (a, k, n) }
    df.sparkSession.createDataFrame(spec)
      .toDF("alpha", "k", "n")
      .join(ranked.select(col("__rn").as("k"), col("__s").as("threshold")),
        Seq("k"), "left")
      .select(col("alpha"), col("k"), col("n"), col("threshold"))
  }

  /** Logistic regression by full-batch gradient descent — the in-engine
    * trainer for quality-classifier-style curation scorers (binary
    * label, few dense features). Mean-gradient updates
    *
    *   w ← w − lr · avg((σ(w·x) − y) · x)
    *
    * from zero weights, `iters` iterations. Returns ONE row:
    * (w_b, w_1..w_d, loss = mean log-loss, accuracy, n).
    *
    * Shape: the classic bounded-driver-state iteration (the IPF / PCA
    * discipline): per iteration ONE corpus aggregation computes the
    * d+1 gradient sums with the current weights shipped as literals —
    * no per-row state, no shuffle beyond the aggregate, driver holds
    * d+1 doubles. The input projection is localCheckpoint-ed once so
    * `iters` scans re-read columnar memory, not parquet. Rows with a
    * NULL label or feature are dropped up front (they would null the
    * whole gradient). Deterministic: full-batch (no sampling, no
    * random init). */
  def logisticRegressionGD(df: DataFrame, features: Seq[Column],
      label: Column, iters: Int = 8, lr: Double = 1.0,
      dp: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val d = features.size
    val cols = label.cast("double").as("__y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__y").isNotNull +: (0 until d)
        .map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .localCheckpoint(true) // scanned iters+1 times
    // zero surviving rows would return NULL averages and NPE inside the
    // gradient loop — fail loudly up front (the ridgeRegression guard)
    require(base.count() > 0,
      "logisticRegressionGD needs at least one row with non-null label and features")
    def zOf(w: Array[Double]): Column =
      (0 until d).foldLeft(lit(w(0)): Column) { case (acc, i) =>
        acc + lit(w(i + 1)) * col(s"__x$i")
      }
    def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iters) {
      val p = sigmoid(zOf(w))
      val aggs = avg(p - col("__y")).as("g0") +: (0 until d).map(i =>
        avg((p - col("__y")) * col(s"__x$i")).as(s"g${i + 1}"))
      val g = base.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wv, j) => wv - lr * g.getDouble(j) }
    }
    val p = sigmoid(zOf(w))
    base.agg(
        avg(-(col("__y") * log(p) +
          (lit(1.0) - col("__y")) * log(lit(1.0) - p))).as("__loss"),
        avg(when((p > 0.5).cast("double") === col("__y"), 1.0)
          .otherwise(0.0)).as("__acc"),
        count(lit(1L)).as("n"))
      .select((0 to d).map(j =>
          round(lit(w(j)), dp).as(if (j == 0) "w_b" else s"w_$j")) ++
        Seq(round(col("__loss"), dp).as("loss"),
          round(col("__acc"), dp).as("accuracy"), col("n")): _*)
  }

  /** Sharp regression-discontinuity effect (Thistlethwaite & Campbell
    * 1960; local-linear form): when treatment switches ON at a cutoff
    * of a running variable (score ≥ threshold gets the new pipeline),
    * the causal jump is the gap between two side-local linear fits
    * evaluated AT the cutoff:
    *
    *   effect = â_R − â_L,   y ≈ a + b·(x − cutoff) per side,
    *   Var(â) = s²·(1/n + x̄²/Sxx)     (s² the residual variance)
    *
    * over x ∈ [cutoff − h, cutoff) and [cutoff, cutoff + h]. Reports
    * both slopes too — a slope mismatch warns the linear-local model
    * is strained. NULLs when a side has < 3 rows or zero x-variance;
    * the verdict additionally needs se > 0 (exact-fit data has no
    * noise estimate).
    *
    * Shape: ONE conditional-moment rollup (5 sums + count per side in
    * a single scan) and a 1-row closed form. */
  def rddEffect(df: DataFrame, running: Column, outcome: Column,
      cutoff: Double, bandwidth: Double, dp: Int = 6): DataFrame = {
    require(bandwidth > 0, s"bandwidth must be positive, got $bandwidth")
    val x = running.cast("double") - cutoff
    val base = df.select(x.as("__x"), outcome.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") >= -bandwidth && col("__x") <= bandwidth)
    val right = col("__x") >= 0.0
    def side(r: Boolean, e: Column, nm: String) =
      sum(when(if (r) right else !right, e).otherwise(lit(0.0)))
        .as(nm + (if (r) "r" else "l"))
    val aggCols = Seq(true, false).flatMap { r =>
      Seq(sum(when(if (r) right else !right, 1L).otherwise(0L))
          .as("__n" + (if (r) "r" else "l")),
        side(r, col("__x"), "__sx"), side(r, col("__y"), "__sy"),
        side(r, col("__x") * col("__x"), "__sxx"),
        side(r, col("__y") * col("__y"), "__syy"),
        side(r, col("__x") * col("__y"), "__sxy"))
    }
    val w = base.agg(aggCols.head, aggCols.tail: _*)
    def safe(b: Column) = when(b =!= 0.0, b).otherwise(lit(1.0))
    def fit(s: String) = {
      val n = col("__n" + s).cast("double")
      val sxx = col("__sxx" + s) - col("__sx" + s) * col("__sx" + s) / safe(n)
      val sxy = col("__sxy" + s) - col("__sx" + s) * col("__sy" + s) / safe(n)
      val b = sxy / safe(sxx)
      val a = (col("__sy" + s) - b * col("__sx" + s)) / safe(n)
      // residual variance via SSR = Σy² − aΣy − bΣxy, df = n − 2
      val s2 = (col("__syy" + s) - a * col("__sy" + s) -
        b * col("__sxy" + s)) / safe(n - 2)
      val va = s2 * (lit(1.0) / safe(n) +
        (col("__sx" + s) / safe(n)) * (col("__sx" + s) / safe(n)) / safe(sxx))
      (n, sxx, b, a, va)
    }
    val (nl, sxxl, bl, al, val_) = fit("l")
    val (nr, sxxr, br, ar, var_) = fit("r")
    val okL = nl >= 3 && sxxl > 0.0
    val okR = nr >= 3 && sxxr > 0.0
    val ok = okL && okR
    val effect = ar - al
    val se = sqrt(val_ + var_)
    w.select(col("__nl").as("n_l"), col("__nr").as("n_r"),
      when(okL, round(bl, dp)).as("slope_l"),
      when(okR, round(br, dp)).as("slope_r"),
      when(ok, round(effect, dp)).as("effect"),
      when(ok && val_ + var_ >= 0.0, round(se, dp)).as("se"),
      when(ok && se > 0.0, abs(effect / safe(se)) > lit(1.959963984540054))
        .as("reject_05"))
  }

  /** Inverse-propensity-weighted treatment effect (Horvitz & Thompson
    * 1952; Hajek-normalized): the model-based causal estimate when
    * treatment was not randomized — fit a propensity p̂(x) with the
    * in-engine [[logisticRegressionGD]] (treatment as the label), clip
    * it into [clip, 1−clip] (standard overlap trimming), and compare
    * the weighted outcome means
    *
    *   ATE = Σ t·y/p̂ / Σ t/p̂  −  Σ (1−t)·y/(1−p̂) / Σ (1−t)/(1−p̂)
    *
    * Also reports each arm's effective sample size (Σw)²/Σw² — the
    * overlap-health readout (ESS ≪ n means a few extreme weights own
    * the estimate). Completes the causal tier: [[smdBalance]] checks
    * raw balance, [[diffInDiff]]/[[cupedLift]] need panel structure,
    * IPW handles plain confounded cross-sections.
    *
    * Shape: the GD fit is `iters` bounded-driver aggregations over the
    * localCheckpoint'ed projection; the estimate is ONE more fused
    * aggregation with the ROUNDED (dp) fitted weights as literals —
    * rounded so the oracle's unrolled-CTE chain lands on bit-identical
    * propensities. Deterministic end to end. */
  def ipwEffect(df: DataFrame, outcome: Column, treated: Column,
      features: Seq[Column], iters: Int = 8, lr: Double = 1.0,
      clip: Double = 0.05, dp: Int = 6): DataFrame = {
    require(clip > 0 && clip < 0.5, s"clip must be in (0, 0.5), got $clip")
    val d = features.size
    val cols = outcome.cast("double").as("__o") +:
      treated.cast("boolean").cast("double").as("__t") +:
      features.zipWithIndex.map { case (f, i) =>
        f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__o").isNotNull +: col("__t").isNotNull +:
        (0 until d).map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .localCheckpoint(true) // GD iterations + the estimate scan
    val fit = logisticRegressionGD(base,
      (0 until d).map(i => col(s"__x$i")), col("__t"), iters, lr, dp).head()
    val w = (0 to d).map(fit.getDouble).toArray
    val z = (0 until d).foldLeft(lit(w(0)): Column) { case (acc, i) =>
      acc + lit(w(i + 1)) * col(s"__x$i") }
    val p = least(greatest(lit(1.0) / (lit(1.0) + exp(-z)), lit(clip)),
      lit(1.0 - clip))
    val wt = col("__t") / p
    val wc = (lit(1.0) - col("__t")) / (lit(1.0) - p)
    val a = base.agg(count(lit(1L)).as("n"), sum(col("__t")).as("__nt"),
      sum(wt).as("__swt"), sum(wt * col("__o")).as("__swty"),
      sum(wt * wt).as("__swt2"),
      sum(wc).as("__swc"), sum(wc * col("__o")).as("__swcy"),
      sum(wc * wc).as("__swc2"))
    a.select(col("n"), col("__nt").cast("long").as("n_t"),
      (col("n") - col("__nt")).cast("long").as("n_c"),
      when(col("__swt") > 0, round(col("__swty") / col("__swt"), dp))
        .as("mu_t"),
      when(col("__swc") > 0, round(col("__swcy") / col("__swc"), dp))
        .as("mu_c"),
      when(col("__swt") > 0 && col("__swc") > 0,
        round(col("__swty") / col("__swt") -
          col("__swcy") / col("__swc"), dp)).as("ate"),
      when(col("__swt2") > 0,
        round(col("__swt") * col("__swt") / col("__swt2"), dp)).as("ess_t"),
      when(col("__swc2") > 0,
        round(col("__swc") * col("__swc") / col("__swc2"), dp)).as("ess_c"))
  }

  /** Driver-side OLS fit shared by [[aipwEffect]] and [[oaxacaBlinder]]:
    * normal-equation moments in ONE rollup (columns `yName` +
    * `__x0..__x{d-1}`, intercept implicit), the shared pivot-guarded
    * [[cholesky]] solve, betas ROUNDED at dp (the GD-weight
    * reproducibility discipline — oracles restate the factor/
    * substitution chain term for term). */
  private def fitOlsRounded(arm: DataFrame, d: Int, yName: String,
      dp: Int): Array[Double] = {
    val m = d + 1
    def x(i: Int): Column = if (i == 0) lit(1.0) else col(s"__x${i - 1}")
    val moments =
      (for (i <- 0 until m; j <- i until m)
        yield sum(x(i) * x(j)).as(s"m_${i}_$j")) ++
      (0 until m).map(i => sum(x(i) * col(yName)).as(s"v_$i")) :+
      count(lit(1L)).as("n")
    val r = arm.agg(moments.head, moments.tail: _*).head()
    require(r.getAs[Long]("n") > m,
      s"each arm/group needs more rows than parameters ($m)")
    val a = Array.tabulate(m, m) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      r.getAs[Double](s"m_${lo}_$hi")
    }
    val rhs = Array.tabulate(m)(i => r.getAs[Double](s"v_$i"))
    val l = cholesky(a, m)
    val z = Array.fill(m)(0.0)
    for (i <- 0 until m)
      z(i) = (rhs(i) - (0 until i).map(k => l(i)(k) * z(k)).sum) / l(i)(i)
    val w = Array.fill(m)(0.0)
    for (i <- m - 1 to 0 by -1)
      w(i) = (z(i) - (i + 1 until m).map(k => l(k)(i) * w(k)).sum) / l(i)(i)
    w.map(v => BigDecimal(v)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Oaxaca–Blinder decomposition (Oaxaca 1973; Blinder 1973): split
    * the mean-outcome gap between cohort A and the reference cohort B
    * into the part EXPLAINED by covariate differences and the rest:
    *
    *   ȳ_A − ȳ_B = (x̄_A − x̄_B)'β_B  +  unexplained
    *
    * (the B-weights two-fold form: "what would A's outcome be if its
    * covariates were priced at B's coefficients"). The "why do sources
    * differ" analysis: if en docs score higher than the rest, is it
    * their length profile (explained) or something about en itself
    * (unexplained)? β_B from the shared [[fitOlsRounded]] Cholesky
    * solve; the intercept cancels in the explained term (x̄ diff of
    * the constant is 0).
    *
    * Shape: one localCheckpoint'ed scan, the reference-arm OLS moment
    * rollup, ONE means rollup, driver algebra — 1 row out:
    * (n_a, n_b, mean_a, mean_b, gap, explained, unexplained). */
  def oaxacaBlinder(df: DataFrame, outcome: Column, inA: Column,
      features: Seq[Column], dp: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val d = features.size
    val cols = outcome.cast("double").as("__o") +:
      inA.cast("boolean").as("__a") +:
      features.zipWithIndex.map { case (f, i) =>
        f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__o").isNotNull +: col("__a").isNotNull +:
        (0 until d).map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .localCheckpoint(true) // OLS moments + the means rollup
    val bB = fitOlsRounded(base.where(!col("__a")), d, "__o", dp)
    val aggCols: Seq[Column] =
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a") +:
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b") +:
      avg(when(col("__a"), col("__o"))).as("__ma") +:
      avg(when(!col("__a"), col("__o"))).as("__mb") +:
      (0 until d).flatMap(i => Seq(
        avg(when(col("__a"), col(s"__x$i"))).as(s"__xa$i"),
        avg(when(!col("__a"), col(s"__x$i"))).as(s"__xb$i")))
    val agg = base.agg(aggCols.head, aggCols.tail: _*)
    val gap = col("__ma") - col("__mb")
    val explained = (0 until d).map(i =>
      (col(s"__xa$i") - col(s"__xb$i")) * lit(bB(i + 1)))
      .reduce(_ + _)
    agg.select(col("n_a"), col("n_b"),
      round(col("__ma"), dp).as("mean_a"),
      round(col("__mb"), dp).as("mean_b"),
      round(gap, dp).as("gap"),
      round(explained, dp).as("explained"),
      round(gap - explained, dp).as("unexplained"))
  }

  /** Covariate-shift importance-weighted metric (the density-ratio
    * trick, Shimodaira 2000): estimate a metric's value ON the target
    * domain using only SOURCE-domain rows, by reweighting each source
    * row with w = ê(x)/(1−ê(x)) from a domain classifier
    * P(target | x) ([[logisticRegressionGD]], weights rounded at dp,
    * probabilities clipped — the [[ipwEffect]] nuisance discipline
    * exactly). The pipeline question this answers: "our labeled eval
    * set is last quarter's distribution — what would accuracy be on
    * TODAY's mix?" — without labeling today. Reported beside the
    * weighted estimate: both domains' raw metrics (when the target IS
    * labeled, metric_target vs metric_weighted measures how much of
    * the gap covariates explain) and the effective sample size of the
    * weights (a collapsed ESS means the domains barely overlap and
    * the estimate is resting on a handful of rows). Estimates are
    * NULL when a domain is empty.
    *
    * Shape: the GD chain + ONE conditional-rollup scan, 1 row out. */
  def shiftWeightedMetric(df: DataFrame, inTarget: Column, feature: Column,
      metric: Column, iters: Int = 8, lr: Double = 1.0,
      clip: Double = 0.05, dp: Int = 6): DataFrame = {
    require(clip > 0 && clip < 0.5, s"clip must be in (0, 0.5), got $clip")
    val base = df.select(inTarget.cast("boolean").cast("double").as("__d"),
        feature.cast("double").as("__x0"), metric.cast("double").as("__m"))
      .where(col("__d").isNotNull && col("__x0").isNotNull &&
        col("__m").isNotNull)
      .localCheckpoint(true) // GD iterations + the weighted rollup
    val fit = logisticRegressionGD(base, Seq(col("__x0")), col("__d"),
      iters, lr, dp).head()
    val (b0, b1) = (fit.getDouble(0), fit.getDouble(1))
    val p = least(greatest(
      lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("__x0")))),
      lit(clip)), lit(1.0 - clip))
    val w = p / (lit(1.0) - p)
    val src = lit(1.0) - col("__d")
    val a = base.agg(
      sum(src).as("__ns"), sum(col("__d")).as("__nt"),
      avg(when(col("__d") === 0.0, col("__m"))).as("__ms"),
      avg(when(col("__d") === 1.0, col("__m"))).as("__mt"),
      sum(src * w).as("__sw"), sum(src * w * col("__m")).as("__swm"),
      sum(src * w * w).as("__sw2"))
    a.select(col("__ns").cast("long").as("n_source"),
      col("__nt").cast("long").as("n_target"),
      round(col("__ms"), dp).as("metric_source"),
      round(col("__mt"), dp).as("metric_target"),
      when(col("__sw") > 0, round(col("__swm") / col("__sw"), dp))
        .as("metric_weighted"),
      when(col("__sw2") > 0,
        round(col("__sw") * col("__sw") / col("__sw2"), dp)).as("ess"))
  }

  /** AIPW / doubly-robust ATE (Robins, Rotnitzky & Zhao 1994): the
    * augmented estimator that combines [[ipwEffect]]'s propensity
    * weighting with per-arm outcome regressions —
    *
    *   ψᵢ = μ̂₁(xᵢ) − μ̂₀(xᵢ) + Tᵢ(Yᵢ−μ̂₁(xᵢ))/ê(xᵢ)
    *                         − (1−Tᵢ)(Yᵢ−μ̂₀(xᵢ))/(1−ê(xᵢ))
    *
    * ATE = mean(ψ), SE = sd(ψ)/√n (the influence-function variance).
    * Consistent if EITHER the propensity model or the outcome model is
    * right (double robustness) — the estimator to reach for when
    * neither nuisance fit is fully trusted, which is always.
    *
    * Nuisances: ê from [[logisticRegressionGD]] (bounded driver
    * iterations, weights ROUNDED at dp before scoring — the
    * [[ipwEffect]] reproducibility discipline), clipped to
    * [clip, 1−clip]; μ̂ₜ from per-arm OLS via the shared [[cholesky]]
    * normal equations (two (d+1)²-sum rollups), betas rounded at dp
    * likewise. `ate_om` (the outcome-model-only estimate mean(μ̂₁−μ̂₀))
    * is reported beside the AIPW `ate` — a large gap flags nuisance
    * disagreement. z is NULL when sd(ψ) = 0.
    *
    * Shape: one filtered localCheckpoint of (o, t, x…); the GD chain
    * (`iters` 1-row gradient jobs), two OLS moment rollups, one ψ
    * rollup — every stage a whole-corpus map-side-partial aggregation,
    * nothing driver-sized but (d+1)-vectors. */
  def aipwEffect(df: DataFrame, outcome: Column, treated: Column,
      features: Seq[Column], iters: Int = 8, lr: Double = 1.0,
      clip: Double = 0.05, dp: Int = 6): DataFrame = {
    require(clip > 0 && clip < 0.5, s"clip must be in (0, 0.5), got $clip")
    require(features.nonEmpty, "need at least one feature")
    val d = features.size
    val m = d + 1
    val cols = outcome.cast("double").as("__o") +:
      treated.cast("boolean").cast("double").as("__t") +:
      features.zipWithIndex.map { case (f, i) =>
        f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__o").isNotNull +: col("__t").isNotNull +:
        (0 until d).map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .localCheckpoint(true) // GD iterations + 2 OLS passes + the ψ scan
    val fit = logisticRegressionGD(base,
      (0 until d).map(i => col(s"__x$i")), col("__t"), iters, lr, dp).head()
    val pw = (0 to d).map(fit.getDouble).toArray
    val zLin = (0 until d).foldLeft(lit(pw(0)): Column) { case (acc, i) =>
      acc + lit(pw(i + 1)) * col(s"__x$i") }
    val p = least(greatest(lit(1.0) / (lit(1.0) + exp(-zLin)), lit(clip)),
      lit(1.0 - clip))
    val b1 = fitOlsRounded(base.where(col("__t") === 1.0), d, "__o", dp)
    val b0 = fitOlsRounded(base.where(col("__t") === 0.0), d, "__o", dp)
    def mu(bb: Array[Double]): Column =
      (0 until d).foldLeft(lit(bb(0)): Column) { case (acc, i) =>
        acc + lit(bb(i + 1)) * col(s"__x$i") }
    val mu1 = mu(b1)
    val mu0 = mu(b0)
    val psi = mu1 - mu0 + col("__t") * (col("__o") - mu1) / p -
      (lit(1.0) - col("__t")) * (col("__o") - mu0) / (lit(1.0) - p)
    val agg = base.select(psi.as("__psi"), (mu1 - mu0).as("__dom"),
        col("__t"))
      .agg(count(lit(1L)).as("n"), sum(col("__t")).as("__nt"),
        avg(col("__psi")).as("__ate"), avg(col("__dom")).as("__om"),
        stddev_samp(col("__psi")).as("__sd"))
    val se = col("__sd") / sqrt(col("n"))
    agg.select(col("n"), col("__nt").cast("long").as("n_t"),
      (col("n") - col("__nt")).cast("long").as("n_c"),
      round(col("__ate"), dp).as("ate"),
      round(col("__om"), dp).as("ate_om"),
      round(se, dp).as("se"),
      when(col("__sd") > 0, round(col("__ate") / se, dp)).as("z"))
  }

  /** Unbiased pass@k over per-task samples (Chen et al.,
    * arXiv:2107.03374 §2.1): with n samples and c correct for a task,
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)
    *
    * averaged over tasks — the standard code-eval readout, exact and
    * unbiased where the naive (c/n)ᵏ is not. Tasks with n < k cannot
    * support the estimator and are EXCLUDED from that k's mean (their
    * count is visible via n_tasks). The product is computed as
    * exp(Σ ln·) under c=0 / n−c<k guards so the factors are strictly
    * positive. One (task)-keyed rollup; everything after rides the
    * task-count-bounded table. Returns one row per k:
    * (k, n_tasks, pass_at_k). */
  def passAtK(df: DataFrame, task: Column, correct: Column,
      ks: Seq[Int], dp: Int = 6): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1, got $ks")
    val per = df.groupBy(task.as("__t"))
      .agg(count(lit(1L)).as("__n"),
        sum(correct.cast("double")).as("__c"))
    ks.map { k =>
      val n = col("__n")
      val c = col("__c")
      val logProd = aggregate(sequence(lit(0), lit(k - 1)),
        lit(0.0), (acc, i) => acc + log((n - c - i) / (n - i)))
      val p = when(c === 0.0, lit(0.0))
        .when(n - c < k, lit(1.0))
        .otherwise(lit(1.0) - exp(logProd))
      per.where(n >= k)
        .agg(count(lit(1L)).as("n_tasks"),
          round(avg(p), dp).as("pass_at_k"))
        .select(lit(k).as("k"), col("n_tasks"), col("pass_at_k"))
    }.reduce(_ unionByName _).orderBy("k")
  }

  /** Platt scaling (Platt 1999): fit P(y=1|s) = σ(A·s + B) by the
    * repo's bounded-iteration [[logisticRegressionGD]] and report the
    * recalibration line beside the Brier score BEFORE (raw score used
    * as probability — sensible only for scores already in [0,1]) and
    * AFTER. The LINE is the diagnosis [[brierDecomposition]]'s bins
    * can't give: A < 1 means over-confident tails, B ≠ −A/2-ish means
    * systematic bias; and unlike [[isotonicCalibrate]]'s step fit it
    * extrapolates smoothly and can't overfit sparse bins. Weights are
    * the GD output ROUNDED at dp (the [[ipwEffect]] reproducibility
    * discipline) — the after-Brier is computed with exactly the
    * published line.
    *
    * Shape: the GD chain (`iters` 1-row gradient jobs over one
    * localCheckpoint'ed scan) + ONE scoring rollup, 1 row out. */
  def plattCalibration(df: DataFrame, score: Column, label: Column,
      iters: Int = 8, lr: Double = 1.0, dp: Int = 6): DataFrame = {
    val base = df.select(score.cast("double").as("__s"),
        label.cast("double").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // GD iterations + the scoring scan
    val fit = logisticRegressionGD(base, Seq(col("__s")), col("__y"),
      iters, lr, dp).head()
    val b = fit.getDouble(0)
    val a = fit.getDouble(1)
    val p = lit(1.0) / (lit(1.0) + exp(-(lit(b) + lit(a) * col("__s"))))
    base.agg(count(lit(1L)).as("n"),
        avg((col("__s") - col("__y")) * (col("__s") - col("__y")))
          .as("__braw"),
        avg((p - col("__y")) * (p - col("__y"))).as("__bcal"))
      .select(col("n"), lit(a).as("slope"), lit(b).as("intercept"),
        round(col("__braw"), dp).as("brier_raw"),
        round(col("__bcal"), dp).as("brier_platt"))
  }

  /** Multi-class classification report: per-class precision/recall/F1
    * from one (label, pred) confusion rollup, plus `(macro)` and
    * `(micro)` summary rows — the per-class table [[aucBrier]]'s
    * threshold-free scores skip, and the first thing to read when a
    * language-ID or quality classifier ships: macro-F1 catches the
    * small class the accuracy number hides. Per class: P = tp/n_pred
    * (NULL when the class is never predicted), R = tp/n_true (NULL when
    * it never occurs), F1 = 2PR/(P+R) (NULL when both are 0 or either
    * is NULL). The macro row averages with NULLs as 0 (the scikit-learn
    * zero-division convention — an unpredicted class PULLS macro-P
    * down, it does not vanish); micro-P = micro-R = accuracy for
    * single-label classification, so the micro row carries accuracy in
    * all three columns.
    *
    * Shape: ONE corpus rollup to the |labels|²-bounded confusion table
    * (map-side partial); everything after rides that bounded table.
    * Returns (cls, n_true, n_pred, tp, precision, recall, f1) ordered
    * by cls, with "(macro)"/"(micro)" sorting first. */
  def classificationReport(df: DataFrame, label: Column, pred: Column,
      dp: Int = 6): DataFrame = {
    val base = df.select(label.cast("string").as("__y"),
        pred.cast("string").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val cells = base.groupBy("__y", "__p").agg(count(lit(1L)).as("__c"))
    val classes = cells.select(col("__y").as("cls"))
      .union(cells.select(col("__p").as("cls"))).distinct()
    val trueC = cells.groupBy(col("__y").as("cls"))
      .agg(sum(col("__c")).as("n_true"))
    val predC = cells.groupBy(col("__p").as("cls"))
      .agg(sum(col("__c")).as("n_pred"))
    val tpC = cells.where(col("__y") === col("__p"))
      .select(col("__y").as("cls"), col("__c").as("tp"))
    val per = classes
      .join(trueC, Seq("cls"), "left")
      .join(predC, Seq("cls"), "left")
      .join(tpC, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val p = when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred"))
    val r = when(col("n_true") > 0, col("tp").cast("double") / col("n_true"))
    val f1 = when(p.isNotNull && r.isNotNull && (p + r) > 0.0,
      lit(2.0) * p * r / (p + r))
    val perOut = per.select(col("cls"), col("n_true"), col("n_pred"),
      col("tp"), round(p, dp).as("precision"), round(r, dp).as("recall"),
      round(f1, dp).as("f1"))
    val summary = per.agg(sum(col("n_true")).as("__n"),
      sum(col("tp")).as("__tp"),
      avg(coalesce(p, lit(0.0))).as("__mp"),
      avg(coalesce(r, lit(0.0))).as("__mr"),
      avg(coalesce(f1, lit(0.0))).as("__mf"))
    val acc = col("__tp").cast("double") / col("__n")
    val macroRow = summary.select(lit("(macro)").as("cls"),
      col("__n").as("n_true"), col("__n").as("n_pred"), col("__tp").as("tp"),
      round(col("__mp"), dp).as("precision"),
      round(col("__mr"), dp).as("recall"), round(col("__mf"), dp).as("f1"))
    val microRow = summary.select(lit("(micro)").as("cls"),
      col("__n").as("n_true"), col("__n").as("n_pred"), col("__tp").as("tp"),
      round(acc, dp).as("precision"), round(acc, dp).as("recall"),
      round(acc, dp).as("f1"))
    perOut.unionByName(macroRow).unionByName(microRow)
  }

  /** Binary-classifier diagnostics in one aggregation: the 2×2 cells
    * plus accuracy, balanced accuracy, Matthews correlation
    * (MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) — the
    * single number that stays honest under class imbalance, where
    * accuracy and even F1 mislead) and Youden's J = TPR + TNR − 1.
    * MCC/balanced-acc/J are NULL when a marginal is empty (a
    * degenerate labeler or predictor — no correlation is defined).
    * The binary drill-down beside [[classificationReport]]'s
    * multi-class table. ONE 4-count map-side-partial scan, 1 row. */
  def binaryDiagnostics(df: DataFrame, label: Column, pred: Column,
      dp: Int = 6): DataFrame = {
    val y = label.cast("boolean")
    val p = pred.cast("boolean")
    val a = df.where(y.isNotNull && p.isNotNull)
      .select(y.as("__y"), p.as("__p"))
      .agg(sum(when(col("__y") && col("__p"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("__y") && col("__p"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("__y") && !col("__p"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("__y") && !col("__p"), 1L).otherwise(0L)).as("tn"))
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    val tpD = col("tp").cast("double")
    val tnD = col("tn").cast("double")
    val tpr = tpD / (col("tp") + col("fn"))
    val tnr = tnD / (col("tn") + col("fp"))
    val denom = (col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")) * (col("tn") + col("fp")) *
      (col("tn") + col("fn"))
    val ok = denom > 0.0
    a.select(n.as("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(n > 0, round((tpD + tnD) / n, dp)).as("accuracy"),
      when(ok, round((tpr + tnr) / lit(2.0), dp)).as("balanced_acc"),
      when(ok, round((tpD * tnD - col("fp").cast("double") * col("fn")) /
        sqrt(denom), dp)).as("mcc"),
      when(ok, round(tpr + tnr - lit(1.0), dp)).as("youden_j"))
  }

  /** Gumbel block-maxima tail fit by method of moments (the
    * Fisher–Tippett type-I domain — exponential-tailed metrics, which
    * corpus length/latency columns overwhelmingly are): block the data,
    * take per-block maxima, fit σ̂ = s·√6/π, μ̂ = m̄ − γ·σ̂
    * (γ = 0.5772156649015329), and report return levels
    * μ̂ − σ̂·ln(−ln(1 − 1/N)) — "the value exceeded about once per N
    * blocks". The CAPACITY-PLANNING readout: today's corpus shows
    * max_observed, but at 10×/100× the block count the fit says what
    * max to provision for — a question no empirical quantile can
    * answer beyond the data's edge. Fit is NULL with fewer than 2
    * blocks or zero variance across maxima.
    *
    * Shape: one block-keyed max rollup (map-side partial), one 1-row
    * moment pass over the block table, closed-form algebra. Returns
    * (n_blocks, max_observed, mu, sigma, ret_level_10x, ret_level_100x)
    * with the return levels at N = 10·blocks and 100·blocks. */
  def gumbelTailFit(df: DataFrame, value: Column, block: Column,
      dp: Int = 6): DataFrame = {
    val maxima = df.where(value.isNotNull && block.isNotNull)
      .groupBy(block.as("__b"))
      .agg(max(value.cast("double")).as("__m"))
    val a = maxima.agg(count(lit(1L)).as("n_blocks"),
      max(col("__m")).as("__mx"), avg(col("__m")).as("__avg"),
      stddev_samp(col("__m")).as("__sd"))
    val sigma = col("__sd") * lit(math.sqrt(6.0) / math.Pi)
    val mu = col("__avg") - lit(0.5772156649015329) * sigma
    val ok = col("n_blocks") >= 2 && col("__sd") > 0.0
    def retLevel(mult: Double): Column = {
      val nBig = lit(mult) * col("n_blocks")
      mu - sigma * log(-log(lit(1.0) - lit(1.0) / nBig))
    }
    a.select(col("n_blocks"), round(col("__mx"), dp).as("max_observed"),
      when(ok, round(mu, dp)).as("mu"),
      when(ok, round(sigma, dp)).as("sigma"),
      when(ok, round(retLevel(10.0), dp)).as("ret_level_10x"),
      when(ok, round(retLevel(100.0), dp)).as("ret_level_100x"))
  }

  /** Regression error metrics in one aggregation: bias (mean signed
    * error pred−actual), MAE, RMSE, MAPE (over actual ≠ 0 rows only —
    * `n_mape` reports how many qualified), and R² = 1 − SSE/SStot —
    * the one-row readout for any numeric predictor (length estimators,
    * quality regressors, forecast columns). R² is NULL when the
    * actuals are constant (SStot = 0; "explained variance" is
    * undefined, not 1), MAPE when no row has a non-zero actual.
    * SStot comes from raw power sums (Σy² − (Σy)²/n), so the whole
    * table is ONE map-side-partial scan, 1 row out. */
  def regressionMetrics(df: DataFrame, actual: Column, predicted: Column,
      dp: Int = 6): DataFrame = {
    val base = df.select(actual.cast("double").as("__y"),
        predicted.cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val e = col("__p") - col("__y")
    val a = base.agg(count(lit(1L)).as("n"),
      sum(when(col("__y") =!= 0.0, 1L).otherwise(0L)).as("n_mape"),
      sum(e).as("__se"), sum(abs(e)).as("__sae"), sum(e * e).as("__sse"),
      sum(col("__y")).as("__sy"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(when(col("__y") =!= 0.0, abs(e) / abs(col("__y")))).as("__sape"))
    val nD = col("n").cast("double")
    val sstot = col("__syy") - col("__sy") * col("__sy") / nD
    a.select(col("n"), col("n_mape"),
      when(col("n") > 0, round(col("__se") / nD, dp)).as("bias"),
      when(col("n") > 0, round(col("__sae") / nD, dp)).as("mae"),
      when(col("n") > 0, round(sqrt(col("__sse") / nD), dp)).as("rmse"),
      when(col("n_mape") > 0, round(col("__sape") / col("n_mape"), dp))
        .as("mape"),
      when(sstot > 0.0, round(lit(1.0) - col("__sse") / sstot, dp))
        .as("r2"))
  }

  /** Fairness parity gaps of a binary predictor across slices: per
    * group the selection rate avg(pred), TPR avg(pred | y=1) and FPR
    * avg(pred | y=0); the verdict row reports the max−min spread of
    * each — demographic-parity gap and the two equalized-odds gaps
    * (Hardt et al., NeurIPS 2016). Groups missing a class are excluded
    * from that class's spread (their rate is undefined, not zero). One
    * group-keyed rollup; the verdict rides the |groups|-bounded table.
    * One row: (n_groups, dp_gap, tpr_gap, fpr_gap). */
  def parityGaps(df: DataFrame, group: Column, label: Column,
      pred: Column, dp: Int = 6): DataFrame = {
    val y = label.cast("double")
    val p = pred.cast("double")
    df.groupBy(group.as("__g"))
      .agg(avg(p).as("__sel"),
        avg(when(y === 1.0, p)).as("__tpr"),
        avg(when(y === 0.0, p)).as("__fpr"))
      .agg(count(lit(1L)).as("n_groups"),
        round(max(col("__sel")) - min(col("__sel")), dp).as("dp_gap"),
        round(max(col("__tpr")) - min(col("__tpr")), dp).as("tpr_gap"),
        round(max(col("__fpr")) - min(col("__fpr")), dp).as("fpr_gap"))
  }

  /** Log-rank test (Mantel 1966) between two survival arms — the
    * hypothesis test [[kaplanMeier]] lacks: at each distinct event
    * time, arm A's observed deaths are compared with the hypergeometric
    * expectation d·n_A/n given the at-risk sets, and the standardized
    * sum is χ²₁ under "no difference". Right-censored rows (event =
    * false) leave the risk set without counting as deaths, exactly as
    * in the KM curve. One row:
    * (n_times, obs_a, exp_a, var_a, z, chi2) — z is NULL when the
    * variance is 0 (no time has both arms at risk with a death).
    *
    * Shape: one (time, arm) rollup of the subjects; at-risk counts come
    * from a per-arm running sum over the DISTINCT-TIME-bounded rollup
    * (two partitions, never subject-grain through a window); the
    * verdict rides that bounded table. */
  def logRankTest(df: DataFrame, time: Column, event: Column,
      inA: Column, dp: Int = 6): DataFrame = {
    val base = df.select(time.cast("double").as("__t"),
        event.cast("boolean").as("__e"), inA.cast("boolean").as("__a"))
      .where(col("__t").isNotNull)
    val cnt = base.groupBy(col("__t"), col("__a"))
      .agg(count(lit(1L)).as("__x"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("__d"))
    val grid = cnt.select("__t").distinct()
      .crossJoin(base.sparkSession.range(0, 2)
        .select((col("id") === 1).as("__a"))) // 2-row arm axis
      .join(cnt, Seq("__t", "__a"), "left")
      .select(col("__t"), col("__a"),
        coalesce(col("__x"), lit(0L)).as("__x"),
        coalesce(col("__d"), lit(0L)).as("__d"))
    val tot = base.groupBy(col("__a")).agg(count(lit(1L)).as("__N"))
    val wArm = Window.partitionBy(col("__a")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid.join(tot, Seq("__a"))
      .withColumn("__cx", sum(col("__x")).over(wArm))
      // at risk AT t = arm total − exits strictly before t
      .withColumn("__r", col("__N") - (col("__cx") - col("__x")))
    val perTime = atRisk.groupBy(col("__t"))
      .agg(sum(when(col("__a"), col("__d"))).as("__da"),
        sum(col("__d")).as("__dt"),
        sum(when(col("__a"), col("__r"))).as("__na"),
        sum(col("__r")).as("__nt"))
      .where(col("__dt") > 0 && col("__nt") > 1)
    perTime.agg(count(lit(1L)).as("n_times"),
        sum(col("__da")).cast("long").as("obs_a"),
        sum(col("__dt") * col("__na") / col("__nt")).as("__ea"),
        sum(col("__dt") * (col("__na") / col("__nt")) *
          (lit(1.0) - col("__na") / col("__nt")) *
          (col("__nt") - col("__dt")) / (col("__nt") - 1)).as("__va"))
      .select(col("n_times"), col("obs_a"),
        round(col("__ea"), dp).as("exp_a"),
        round(col("__va"), dp).as("var_a"),
        when(col("__va") > 0.0,
          round((col("obs_a") - col("__ea")) / sqrt(col("__va")), dp))
          .as("z"),
        when(col("__va") > 0.0,
          round((col("obs_a") - col("__ea")) * (col("obs_a") - col("__ea"))
            / col("__va"), dp)).as("chi2"))
  }

  /** Wald's SPRT (sequential probability ratio test, Wald 1945) per
    * key over Bernoulli outcomes: the cumulative log-likelihood ratio
    * of H1: p=p1 vs H0: p=p0 walks until it crosses
    * A = ln((1−β)/α) (accept H1) or B = ln(β/(1−α)) (accept H0) — the
    * sequential early-stopping companion of the fixed-horizon tests
    * (fewer samples on clear effects, error rates still bounded by
    * α/β). Returns per key: (key, n, llr_final, decision ∈
    * {accept_h1, accept_h0, continue}, decided_at = 1-based index of
    * the FIRST crossing, NULL while continuing).
    *
    * Shape: one key-partitioned ordered window (parallel by key) + a
    * key rollup — no single-reducer stage at any key cardinality. */
  def sprt(df: DataFrame, key: Column, order: Seq[Column], success: Column,
      p0: Double, p1: Double, alpha: Double = 0.05, beta: Double = 0.2,
      dp: Int = 6): DataFrame = {
    require(order.nonEmpty, "sprt needs ordering columns")
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"p0/p1 must be distinct probabilities, got $p0/$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta must be in (0,1), got $alpha/$beta")
    val (l1, l0) = (math.log(p1 / p0), math.log((1 - p1) / (1 - p0)))
    val (aThr, bThr) = (math.log((1 - beta) / alpha),
      math.log(beta / (1 - alpha)))
    val base = df.select((Seq(key.as("__k"),
      success.cast("boolean").as("__y")) ++ order): _*)
    val wOrd = Window.partitionBy(col("__k")).orderBy(order: _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = base
      .withColumn("__llr", sum(when(col("__y"), lit(l1)).otherwise(lit(l0)))
        .over(wRun))
      .withColumn("__i", row_number().over(wOrd))
    walked.groupBy(col("__k").as("key"))
      .agg(count(lit(1L)).as("n"),
        round(max(struct(col("__i"), col("__llr"))).getField("__llr"), dp)
          .as("llr_final"),
        min(when(col("__llr") >= aThr, col("__i"))).as("__up"),
        min(when(col("__llr") <= bThr, col("__i"))).as("__dn"))
      .select(col("key"), col("n"), col("llr_final"),
        when(col("__up").isNotNull &&
            (col("__dn").isNull || col("__up") <= col("__dn")), "accept_h1")
          .when(col("__dn").isNotNull, "accept_h0")
          .otherwise("continue").as("decision"),
        least(col("__up"), col("__dn")).as("decided_at"))
  }

  /** Driver-side Cholesky a = L·Lᵀ shared by [[olsRobustSe]] and
    * [[ridgeRegression]]. Each pivot is guarded: a singular XᵀX
    * (perfectly collinear features, or a constant feature duplicating
    * the intercept) would otherwise sqrt a non-positive pivot and
    * silently propagate NaN coefficients/SEs/t-stats. */
  private def cholesky(a: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val l = Array.fill(m, m)(0.0)
    for (i <- 0 until m; j <- 0 to i) {
      val s0 = (0 until j).map(k => l(i)(k) * l(j)(k)).sum
      if (i == j) {
        val pivot = a(i)(i) - s0
        // relative tolerance: exact collinearity leaves a rounding-noise
        // residue (~ulp·diag), not a clean <= 0 pivot
        require(pivot > 1e-10 * math.max(1.0, a(i)(i)),
          s"singular X'X at pivot $i — collinear (or constant) features")
        l(i)(j) = math.sqrt(pivot)
      } else l(i)(j) = (a(i)(j) - s0) / l(j)(j)
    }
    l
  }

  /** OLS with heteroscedasticity-robust (HC0, White 1980) standard
    * errors — point estimates without honest uncertainty invite
    * overreading, and the classical homoscedastic SEs are wrong for
    * most observational data. Two scans total: the normal-equation
    * moments (as [[ridgeRegression]]), then one residual-moment pass
    * Σ eᵢ²·xᵢxᵢᵀ with the fitted weights shipped as literals; the
    * sandwich (XᵀX)⁻¹ M (XᵀX)⁻¹ is bounded driver algebra. Returns one
    * row per coefficient: (term, coef, se_hc0, t_stat), terms "b",
    * "x1".."xd". */
  def olsRobustSe(df: DataFrame, features: Seq[Column], target: Column,
      dp: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val d = features.size
    val m = d + 1
    val cols = target.cast("double").as("__y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__y").isNotNull +: (0 until d)
        .map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .localCheckpoint(true) // scanned twice (moments + residual pass)
    def x(i: Int): Column = if (i == 0) lit(1.0) else col(s"__x${i - 1}")
    val moments =
      (for (i <- 0 until m; j <- i until m)
        yield sum(x(i) * x(j)).as(s"m_${i}_$j")) ++
      (0 until m).map(i => sum(x(i) * col("__y")).as(s"v_$i")) :+
      count(lit(1L)).as("n")
    val r = base.agg(moments.head, moments.tail: _*).head()
    val n = r.getAs[Long]("n")
    require(n > m, s"need more rows than parameters, got $n for $m")
    val a = Array.tabulate(m, m) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      r.getAs[Double](s"m_${lo}_$hi")
    }
    val b = Array.tabulate(m)(i => r.getAs[Double](s"v_$i"))
    // Cholesky of XᵀX, reused to solve for w and each column of (XᵀX)⁻¹
    val l = cholesky(a, m)
    def solve(rhs: Array[Double]): Array[Double] = {
      val z = Array.fill(m)(0.0)
      for (i <- 0 until m)
        z(i) = (rhs(i) - (0 until i).map(k => l(i)(k) * z(k)).sum) / l(i)(i)
      val w = Array.fill(m)(0.0)
      for (i <- m - 1 to 0 by -1)
        w(i) = (z(i) - (i + 1 until m).map(k => l(k)(i) * w(k)).sum) / l(i)(i)
      w
    }
    val w = solve(b)
    val ainv = Array.tabulate(m)(j =>
      solve(Array.tabulate(m)(i => if (i == j) 1.0 else 0.0)))
    // residual-moment pass: M = Σ e² x xᵀ with w as literals
    val e = (0 until d).foldLeft(col("__y") - lit(w(0)): Column) {
      case (acc, i) => acc - lit(w(i + 1)) * col(s"__x$i")
    }
    val e2 = e * e
    val mm = (for (i <- 0 until m; j <- i until m)
      yield sum(e2 * x(i) * x(j)).as(s"mm_${i}_$j"))
    val r2 = base.agg(mm.head, mm.tail: _*).head()
    val mMat = Array.tabulate(m, m) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      r2.getAs[Double](s"mm_${lo}_$hi")
    }
    // sandwich: S = Ainv M Ainv (Ainv columns are Ainv rows — symmetric)
    def mat(aa: Array[Array[Double]], bb: Array[Array[Double]]) =
      Array.tabulate(m, m)((i, j) =>
        (0 until m).map(k => aa(i)(k) * bb(k)(j)).sum)
    val s = mat(mat(ainv, mMat), ainv)
    def rd(x0: Double) = BigDecimal(x0).setScale(dp,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (0 until m).map { j =>
      val se = math.sqrt(s(j)(j))
      (if (j == 0) "b" else s"x$j", rd(w(j)), rd(se), rd(w(j) / se))
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("term", "coef", "se_hc0", "t_stat")
  }

  /** Ridge (L2) linear regression in ONE scan: the normal-equation
    * moments XᵀX, Xᵀy, yᵀy are a single aggregation (with an intercept
    * column folded in; (d+1)(d+2)/2 + d+2 sum expressions, partial-
    * aggregated — no explode, no shuffle beyond the final agg), then
    * the driver solves (XᵀX + λ·diag(0,1,…,1))w = Xᵀy by Cholesky over
    * the (d+1)×(d+1) matrix — bounded driver state, the IPF/PCA
    * discipline. λ does not penalize the intercept (standard). R² comes
    * from the same moments (SSE = wᵀXᵀXw − 2wᵀXᵀy + yᵀy), so the whole
    * fit is exactly one job. Returns one row:
    * (w_b, w_1..w_d, r2, n). NULL rows are dropped up front; R² is
    * NULL when the target is constant (SST = 0 — the heapsFit guard
    * discipline). */
  def ridgeRegression(df: DataFrame, features: Seq[Column], target: Column,
      lambda: Double = 0.0, dp: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val d = features.size
    val cols = target.cast("double").as("__y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__x$i") }
    val base = df.select(cols: _*)
      .where((col("__y").isNotNull +: (0 until d)
        .map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
    // x0 = 1 (intercept); moment names: m_i_j (i <= j), v_i = sum(xi*y)
    def x(i: Int): Column = if (i == 0) lit(1.0) else col(s"__x${i - 1}")
    val moments =
      (for (i <- 0 to d; j <- i to d)
        yield sum(x(i) * x(j)).as(s"m_${i}_$j")) ++
      (0 to d).map(i => sum(x(i) * col("__y")).as(s"v_$i")) ++
      Seq(sum(col("__y") * col("__y")).as("yy"), count(lit(1L)).as("n"))
    val r = base.agg(moments.head, moments.tail: _*).head()
    val n = r.getAs[Long]("n")
    require(n > 0, "ridgeRegression needs at least one non-null row")
    val a = Array.tabulate(d + 1, d + 1) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      r.getAs[Double](s"m_${lo}_$hi") +
        (if (i == j && i > 0) lambda else 0.0)
    }
    val b = Array.tabulate(d + 1)(i => r.getAs[Double](s"v_$i"))
    // Cholesky a = L·Lᵀ, then forward/back substitution (λ > 0 keeps
    // the ridged XᵀX positive-definite even under collinear features;
    // at λ = 0 the shared pivot guard fires instead of emitting NaN)
    val m = d + 1
    val l = cholesky(a, m)
    val z = Array.fill(m)(0.0)
    for (i <- 0 until m)
      z(i) = (b(i) - (0 until i).map(k => l(i)(k) * z(k)).sum) / l(i)(i)
    val w = Array.fill(m)(0.0)
    for (i <- m - 1 to 0 by -1)
      w(i) = (z(i) - (i + 1 until m).map(k => l(k)(i) * w(k)).sum) / l(i)(i)
    // SSE / SST from the same moments
    val xtxw = (0 until m).map(i => (0 until m).map(j => a(i)(j) * w(j)).sum
      - (if (i > 0) lambda * w(i) else 0.0)) // un-ridged XᵀX·w for SSE
    val sse = (0 until m).map(i => w(i) * xtxw(i)).sum -
      2.0 * (0 until m).map(i => w(i) * b(i)).sum + r.getAs[Double]("yy")
    val sst = r.getAs[Double]("yy") - b(0) * b(0) / n
    val r2 = if (sst > 0) Some(1.0 - sse / sst) else None
    def rd(x0: Double) = BigDecimal(x0).setScale(dp,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    df.sparkSession.createDataFrame(
        Seq((w.map(rd).toSeq, r2.map(rd), n)))
      .toDF("__w", "r2", "n")
      .select((0 until m).map(i => element_at(col("__w"), i + 1)
          .as(if (i == 0) "w_b" else s"w_$i")) ++
        Seq(col("r2"), col("n")): _*)
  }

  /** Regularize a bucketed time series onto a dense grid with forward
    * fill — the gap-filling step between event data and anything that
    * assumes regular sampling (trend models, drift monitors, joins on
    * time buckets). Input is one row per (keys, bucket) — produce it
    * with [[tumblingAgg]] or a groupBy on a floored epoch; this
    * operator adds the MISSING buckets of each key's [min, max] span
    * and forward-fills `valueCol` (an observed NULL counts as a gap).
    * Adds `is_observed` marking original rows.
    *
    * Scale shape: the grid generates IN the scan from each key's 1-row
    * span (sequence + explode — output-sensitive, no cross join
    * against a calendar table), and the fill is one keys-partitioned
    * window — a single exchange end to end. */
  def regularizeSeries(obs: DataFrame, keyCols: Seq[String], bucketCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val keys = keyCols.map(col)
    val span = obs.groupBy(keys: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val grid = span.select(keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(stepSeconds))).as(bucketCol): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ bucketCol, "left")
      .withColumn("is_observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the statistical sibling of [[driftPsi]] for CATEGORICAL
    * drift and leakage checks (is `label` independent of `source`? did
    * the class mix shift between shards?). Returns one row:
    * (chi2, dof, n, cramers_v) — Cramér's V = √(χ²/(n·(min(r,c)−1)))
    * normalizes the statistic to [0,1] for thresholding without a CDF.
    *
    * Scale shape: one groupBy over the (a,b) pair (cells ≤ |A|·|B| —
    * categorical by assumption), marginals derived from the SAME cell
    * counts (window sums over the cell table, not a second scan);
    * everything after the cell aggregation is cell-cardinality work.
    * Null categories are excluded (no category, no cell). */
  def chiSquare(df: DataFrame, a: Column, b: Column, dp: Int = 6): DataFrame = {
    val cells = df
      .where(a.isNotNull && b.isNotNull)
      .groupBy(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .agg(count(lit(1L)).as("__o"))
    val wa = Window.partitionBy(col("__a"))
    val wb = Window.partitionBy(col("__b"))
    val wAll = Window.partitionBy()
    val scored = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wAll))
      .withColumn("__e",
        col("__ra").cast("double") * col("__cb") / col("__n"))
      .withColumn("__t",
        (col("__o") - col("__e")) * (col("__o") - col("__e")) / col("__e"))
    // observed-zero cells contribute E (= (O-E)²/E at O=0) — they are
    // absent from the cell table, so add Σ_present (E - term-at-zero)
    // correction implicitly: χ² over ALL cells = Σ_all (O-E)²/E
    //   = Σ_present (O-E)²/E + Σ_absent E
    //   = Σ_present ((O-E)²/E - E) + Σ_all E, and Σ_all E = n
    scored.agg(
      round(sum(col("__t") - col("__e")) +
        max(col("__n")).cast("double"), dp).as("chi2"),
      ((countDistinct(col("__a")) - 1) *
        (countDistinct(col("__b")) - 1)).as("dof"),
      max(col("__n")).as("n"),
      round(when(least(countDistinct(col("__a")), countDistinct(col("__b"))) > 1,
        sqrt((sum(col("__t") - col("__e")) + max(col("__n"))) /
          (max(col("__n")) *
            (least(countDistinct(col("__a")), countDistinct(col("__b"))) - 1)))), dp)
        .as("cramers_v")) // V undefined (NULL) for a single-category side
  }

  /** Exponentially-weighted moving average over the trailing `window`
    * observations of each partition: ewma_t = Σᵢ(1−α)ⁱ·x_{t−i} /
    * Σᵢ(1−α)ⁱ (i = 0..w−1, current row heaviest) — trend smoothing for
    * metric streams, the complement of [[rollingAnomalies]]'s
    * spike detection. The window is FINITE by design: the infinite
    * recurrence is not expressible as a frame aggregate (and the
    * truncated tail's weight decays geometrically), while the finite
    * form is one window collect + an in-scan fold — a single partition
    * exchange, no self-joins, no recursion, and an external engine can
    * restate it exactly.
    *
    * Output adds `out` (rounded to `dp`) next to the input columns. */
  def ewma(df: DataFrame, partition: Seq[Column], order: Seq[Column],
      value: Column, alpha: Double, window: Int,
      out: String = "ewma", dp: Int = 6): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(window > 0, s"window must be positive, got $window")
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-(window - 1), 0)
    // frame order = order spec, so reverse() puts the CURRENT row first
    val rev = reverse(collect_list(value).over(w))
    val decay = lit(1.0 - alpha)
    val num = aggregate(
      zip_with(rev, sequence(lit(0), size(rev) - 1),
        (x, i) => x * pow(decay, i.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val den = aggregate(
      transform(sequence(lit(0), size(rev) - 1),
        i => pow(decay, i.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    df.withColumn(out, round(num / den, dp))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * merge several top-k rankings of the same id space into one list by
    * score(id) = Σ_lists 1/(k + rank). The standard hybrid-retrieval
    * combiner (BM25 ⊕ embedding-cosine) — rank-based, so incomparable
    * score scales never need calibration; `k` (=60 in the paper) damps
    * the head. Inputs are (id, 1-based rank) frames — BOUNDED top-k
    * lists by contract (rank assignment is the caller's ordering), so
    * the fusion aggregates #lists·topK rows regardless of corpus size.
    * Returns (id, rrf, n_lists), rrf rounded to `dp`. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], idCol: String,
      rankCol: String, k: Int = 60, dp: Int = 8): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, s"k must be non-negative, got $k")
    rankings.map(df => df.select(col(idCol), col(rankCol)))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(k) + col(rankCol))), dp).as("rrf"),
        count(lit(1L)).as("n_lists"))
  }

  /** CUSUM changepoint localization per key (Page 1954): over each
    * key's series ordered by `order`, the cumulative sum of deviations
    * from the key's mean S_i = Σ_{j≤i}(x_j − x̄) peaks in magnitude at
    * the most likely single shift point. PSI / mean-shift drift checks
    * say WHETHER a distribution moved; this says WHEN — the triage
    * step before splitting a corpus snapshot at the break.
    *
    * Emits per key: n_points, mean, sd, max_abs_cusum, changepoint_at
    * (the `order` value at the peak; ties → earliest), and score =
    * max|S| / (sd·√n) — the scale-free statistic (≳ 1.3 ≈ 95%
    * significance under the standardized Brownian-bridge null). A
    * constant series (sd = 0) scores 0.
    *
    * Shape: ONE key-partitioned exchange carries the per-key stats
    * window, the running sum, and the argmax aggregate (a struct-min:
    * (−|S|, order) picks the largest magnitude, earliest on ties).
    * Series length per key is the caller's grain (pre-aggregate to
    * day/hour buckets first, as the oracle query does). */
  def cusumChangepoint(df: DataFrame, key: Column, order: Column,
      x: Column, dp: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("__k"))
    val wo = w.orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = df.select(key.as("__k"), order.as("__o"),
        x.cast("double").as("__x"))
      .withColumn("__mean", avg(col("__x")).over(w))
      .withColumn("__sd", stddev_samp(col("__x")).over(w))
      .withColumn("__n", count(lit(1L)).over(w))
      .withColumn("__s", sum(col("__x") - col("__mean")).over(wo))
    st.groupBy(col("__k").as("key"))
      .agg(max(col("__n")).as("n_points"),
        round(max(col("__mean")), dp).as("mean"),
        round(max(col("__sd")), dp).as("sd"),
        min(struct((-abs(col("__s"))).as("na"), col("__o").as("o")))
          .as("__pk"))
      .select(col("key"), col("n_points"), col("mean"), col("sd"),
        round(-col("__pk.na"), dp).as("max_abs_cusum"),
        col("__pk.o").as("changepoint_at"),
        when(col("sd") > 0,
            round(-col("__pk.na") /
              (col("sd") * sqrt(col("n_points").cast("double"))), dp))
          .otherwise(lit(0.0)).as("score"))
  }

  /** GLOBAL (keyless) importance-weighted quantiles: for each probe p,
    * the smallest value whose cumulative weight reaches p·(total
    * weight). The whole-corpus companion of the per-key
    * [[weightedQuantiles]]: that one rides a key-partitioned window
    * (parallel by key), while a keyless cumulative weight has no
    * partition key to hide behind — so this builds the CDF with the
    * two-phase distributed cumsum instead of one reducer.
    *
    * Shape: the weighted CDF comes from [[Windows.globalCumSum]] (two
    * parallel exchanges, no single-reducer sort), the total is a 1-row
    * scalar broadcast, and ALL probes resolve in ONE conditional-min
    * aggregate over the cumulative table — one structural pass however
    * many probes. Determinism: rows tie-break (value, weight); equal
    * values share a quantile answer by construction, and INTEGER-VALUED
    * weights make the CDF comparisons exact (double weight sums group
    * differently under the two-phase cumsum — feed exact-typed weights
    * when p·W knife edges matter). Zero/negative weights are dropped
    * (a zero-weight row cannot own a quantile). */
  def globalWeightedQuantiles(df: DataFrame, value: Column, weight: Column,
      probes: Seq[Double], dp: Int = 6): DataFrame = {
    require(probes.nonEmpty && probes.forall(p => p > 0 && p <= 1),
      s"probes must be in (0, 1], got $probes")
    val base = df.select(value.cast("double").as("__v"),
        weight.cast("double").as("__w"))
      .where(col("__w") > 0)
    val cum = Windows.globalCumSum(base,
      Seq(col("__v"), col("__w")), col("__w"), out = "__cw")
    val aggs = probes.zipWithIndex.map { case (p, i) =>
      min(when(col("__cw") >= lit(p) * col("__wtotal"), col("__v")))
        .as(s"__q$i") // index-named: a probe like 0.2 would put a dot in the name
    }
    val wide = cum.crossJoin(base.agg(sum(col("__w")).as("__wtotal")))
      .agg(aggs.head, aggs.tail: _*)
    probes.zipWithIndex.map { case (p, i) =>
      wide.select(lit(p).as("p"), round(col(s"__q$i"), dp).as("value"))
    }.reduce(_ unionByName _).orderBy("p")
  }

  /** Gini coefficient of concentration over `value` (non-negative):
    * G = (2·Σᵢ i·vᵢ) / (n·Σv) − (n+1)/n with v ascending, i the
    * 1-based rank — the inequality/market-concentration verdict that
    * complements the ABC classification (q_abc) with one number.
    * Returns (n, total, gini). 0 = perfectly even, →1 = one row owns
    * everything.
    *
    * Shape: the global rank comes from [[Windows.globalRowNumber]]
    * (no single-reducer sort), then one aggregate. */
  def giniCoefficient(df: DataFrame, value: Column, dp: Int = 6): DataFrame = {
    val base = df.select(value.cast("double").as("__v"))
    val ranked = Windows.globalRowNumber(base,
      Seq(col("__v")), out = "__i")
    ranked.agg(count(lit(1L)).as("n"),
        sum(col("__v")).as("__s"),
        sum(col("__i") * col("__v")).as("__is"))
      // n = 0 or Σv = 0 admits no coefficient — NULL, not a 0/0
      // artifact (explicit under the repo's ANSI-on default)
      .select(col("n"), round(col("__s"), dp).as("total"),
        when(col("n") === 0 || col("__s") === 0.0, lit(null).cast("double"))
          .otherwise(round(lit(2.0) * col("__is") / (col("n") * col("__s")) -
            (col("n") + 1).cast("double") / col("n"), dp)).as("gini"))
  }

  /** Exact interpolated percentiles by distributed rank selection — a
    * 1-row frame with one column per requested (p, name).
    *
    * Spark's built-in exact `percentile` is an ImperativeAggregate over
    * an OpenHashMap of BOXED keys: measured 3.3–4.5s for two
    * percentiles over sf0.1's 600k-distinct lineitem prices in every
    * variant (r16 in-session), and at scale the map is per-partition
    * driver-merged state. This path rolls values up to (value → count)
    * first (map-side partials collapse duplicates; HashAggregate
    * spills where the built-in's map cannot), runs the proven
    * two-phase cumulative machinery over the DISTINCT values only
    * ([[graft.ops.Windows.globalCumSum]] — range exchange + local sums
    * + offset join, nothing driver-sized; r17, was a raw-row
    * globalRowNumber in r16), and one conditional-max pass: a value
    * row covers 0-based ranks [cum − c, cum − 1], selection plus
    * Percentile's OWN interpolation arithmetic, operation for
    * operation —
    * position = p·(n−1) (double·long), lower/higher = floor/ceil,
    * result = (higher−position)·lowerVal + (position−lower)·higherVal
    * — so results are bit-identical to the built-in (ties need no
    * ordering discipline: equal keys yield equal values at any tie
    * rank; NULLs are dropped as Percentile drops them; empty input →
    * NULL). */
  private[graft] def exactPercentileRow(df: DataFrame, c: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "exactPercentileRow needs at least one percentile")
    val nn = df.select(c.cast("double").as("__v")).where(col("__v").isNotNull)
    // r17: rank over a DISTINCT-VALUE count rollup, not over raw rows —
    // the (value → count) HashAggregate partial-aggregates map-side (a
    // 50-distinct column collapses before the exchange, where the r16
    // raw-row rank paid a full range sort of every row) and, unlike
    // Percentile's OpenHashMap buffer, spills gracefully when distinct
    // IS large. The cumulative count walk then selects values at the
    // same 0-based ranks the raw form ranked: a value row covers ranks
    // [cum − c, cum − 1].
    val cnt = nn.groupBy("__v").agg(count(lit(1L)).as("__c"))
    val ranked = graft.ops.Windows.globalCumSum(cnt, Seq(col("__v")),
      col("__c"), "__cum")
    val maxPos = nn.agg((count(lit(1L)) - 1L).as("__maxpos"))
    val aggs = ps.flatMap { case (p, name) =>
      val pos = lit(p) * col("__maxpos")
      Seq(
        max(when(col("__cum") - col("__c") <= floor(pos) &&
            floor(pos) < col("__cum"), col("__v")))
          .as(s"__lv_$name"),
        max(when(col("__cum") - col("__c") <= ceil(pos) &&
            ceil(pos) < col("__cum"), col("__v")))
          .as(s"__hv_$name"))
    } :+ first(col("__maxpos")).as("__maxpos")
    val row = ranked.crossJoin(maxPos).agg(aggs.head, aggs.tail: _*)
    row.select(ps.map { case (p, name) =>
      val pos = lit(p) * col("__maxpos")
      val lo = floor(pos)
      val hi = ceil(pos)
      when(hi === lo, col(s"__lv_$name"))
        .otherwise((hi.cast("double") - pos) * col(s"__lv_$name") +
          (pos - lo.cast("double")) * col(s"__hv_$name"))
        .as(name)
    }: _*)
  }

  /** Exact interpolated percentiles PER GROUP by within-group rank
    * selection — [[exactPercentileRow]]'s grouped sibling (VERDICT r16
    * #6). The built-in grouped `percentile` keeps one OpenHashMap of
    * BOXED keys PER GROUP inside every aggregation buffer — per-group
    * distinct-value state that merges through the shuffle and is the §5
    * executor-memory hazard exactly (it also never spills). This shape
    * pays a (group, value) COUNT ROLLUP — map-side partials collapse
    * duplicated values before any exchange, and HashAggregate spills
    * gracefully when distinct is large — then ONE within-group sort of
    * the distinct values shared by the cumulative and total count
    * windows, and a same-partitioning groupBy (no second exchange)
    * doing value-at-rank selection (a value row covers 0-based ranks
    * [cum − c, cum − 1]) with Percentile's OWN interpolation arithmetic
    * — results bit-identical to the built-in
    * (GroupedPercentileRankSpec).
    *
    * NULL values never enter the cumulative count and sort LAST, so no
    * selectable position reaches them (Percentile drops NULLs the same
    * way); a group whose values are ALL NULL keeps its row with NULL
    * percentiles, matching the built-in. Output: one row per group —
    * column `__g` plus one double per requested (p, name). */
  private[graft] def exactPercentileByGroup(df: DataFrame, g: Column,
      c: Column, ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "exactPercentileByGroup needs at least one percentile")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(g.as("__g"), c.cast("double").as("__v"))
    // r17 (same shape as the global form): rank over a per-group
    // DISTINCT-VALUE count rollup. The (g, value) HashAggregate
    // partial-aggregates map-side — a low-cardinality column (q_levene's
    // 50 quantity values) collapses before any exchange, where a raw
    // per-group sort paid O(n log n) over every row (measured 1.5→5.3s
    // at sf1 before this form) — and spills when distinct IS large,
    // unlike the built-in's per-group boxed map. NULL values keep their
    // (g, NULL) rollup row (so all-NULL groups keep a NULL-percentile
    // output row, like the built-in) but never enter the cumulative
    // count, and they sort last, so no selectable rank reaches them.
    val cnt = base.groupBy("__g", "__v").agg(count(lit(1L)).as("__c"))
    val wOrd = Window.partitionBy(col("__g")).orderBy(col("__v").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val nnc = when(col("__v").isNotNull, col("__c")).otherwise(0L)
    // both windows share one exchange + one (distinct-values) sort; a
    // value row covers 0-based ranks [cum − c, cum − 1] of its group
    val ranked = cnt.select(col("__g"), col("__v"), col("__c"),
      sum(nnc).over(wOrd).as("__cum"),
      (sum(nnc).over(wAll) - 1L).as("__maxpos"))
    val aggs = ps.flatMap { case (p, name) =>
      val pos = lit(p) * col("__maxpos")
      Seq(
        max(when(col("__v").isNotNull && col("__cum") - col("__c") <= floor(pos) &&
            floor(pos) < col("__cum"), col("__v"))).as(s"__lv_$name"),
        max(when(col("__v").isNotNull && col("__cum") - col("__c") <= ceil(pos) &&
            ceil(pos) < col("__cum"), col("__v"))).as(s"__hv_$name"))
    } :+ first(col("__maxpos")).as("__maxpos")
    ranked.groupBy("__g").agg(aggs.head, aggs.tail: _*)
      .select(col("__g") +: ps.map { case (p, name) =>
        val pos = lit(p) * col("__maxpos")
        val lo = floor(pos)
        val hi = ceil(pos)
        when(hi === lo, col(s"__lv_$name"))
          .otherwise((hi.cast("double") - pos) * col(s"__lv_$name") +
            (pos - lo.cast("double")) * col(s"__hv_$name"))
          .as(name)
      }: _*)
  }

  def robustStats(df: DataFrame, c: Column, trim: Double = 0.05,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    val v = c.cast("double")
    val thr =
      if (exact)
        exactPercentileRow(df, v, Seq(trim -> "__lo", (1 - trim) -> "__hi"))
      else
        // one GK sketch serves both thresholds (an array probe is one
        // insertion pass; two scalar probes would build the sketch twice)
        df.agg(approx_percentile(v, array(lit(trim), lit(1 - trim)),
            lit(accuracy)).as("__t"))
          .select(element_at(col("__t"), 1).as("__lo"),
            element_at(col("__t"), 2).as("__hi"))
    df.crossJoin(thr)
      .groupBy(col("__lo"), col("__hi"))
      .agg(
        avg(when(v.between(col("__lo"), col("__hi")), v)).as("trimmed_mean"),
        stddev_samp(least(greatest(v, col("__lo")), col("__hi"))).as("winsor_std"),
        count(lit(1L)).as("n"),
        sum(when(v < col("__lo") || v > col("__hi"), 1L).otherwise(0L)).as("n_trimmed"),
        // inclusive tail masses: rank-of-threshold diagnostics (on the
        // approx path, n_le_lo/n must sit within trim ± the GK rank
        // error — the free self-check of the sketch's guarantee)
        sum(when(v <= col("__lo"), 1L).otherwise(0L)).as("n_le_lo"),
        sum(when(v >= col("__hi"), 1L).otherwise(0L)).as("n_ge_hi"))
      .select(col("__lo").as("p_lo"), col("__hi").as("p_hi"),
        col("trimmed_mean"), col("winsor_std"), col("n"), col("n_trimmed"),
        col("n_le_lo"), col("n_ge_hi"))
  }

  /** External cluster validation against reference labels — the three
    * standard agreement indexes in one verdict row:
    *
    *   purity = Σ_c max_l n_cl / n
    *   NMI    = MI(C;L) / √(H(C)·H(L))      (Strehl & Ghosh 2002)
    *   ARI    = (Σ C(n_cl,2) − E) / (max − E), E = Σ_c C(n_c,2)·Σ_l C(n_l,2)/C(n,2)
    *            (Hubert & Arabie 1985)
    *
    * The quality gate for any clustering used in curation (IVF cells,
    * SemDedup cells, LPA communities) against known labels. NULL NMI
    * when either partition is degenerate (zero entropy); NULL ARI when
    * max == E (both partitions trivial).
    *
    * Shape: ONE (cluster, label) contingency rollup is the only corpus
    * exchange (|C|·|L| cells, localCheckpoint'ed — read four times for
    * marginals/indexes); everything after is cell-table algebra. */
  def clusterAgreement(df: DataFrame, cluster: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val cells = df.select(cluster.as("__c"), label.as("__l"))
      .where(col("__c").isNotNull && col("__l").isNotNull)
      .groupBy("__c", "__l").agg(count(lit(1L)).as("__n"))
      .localCheckpoint(true)
    def choose2(x: Column): Column = x * (x - 1) / lit(2.0)
    val mc = cells.groupBy("__c").agg(sum(col("__n")).as("__nc"))
    val ml = cells.groupBy("__l").agg(sum(col("__n")).as("__nl"))
    val tot = cells.agg(sum(col("__n")).cast("double").as("__t"))
    // per-cluster max (purity numerator) + pair index off the cell table
    val perC = cells.groupBy("__c").agg(max(col("__n")).as("__mx"))
      .agg(sum(col("__mx")).as("__pure"), count(lit(1L)).as("n_clusters"))
    val idx = cells.agg(sum(choose2(col("__n"))).as("__idx"))
    val hc = mc.crossJoin(tot).agg(
      sum(-(col("__nc") / col("__t")) * log(col("__nc") / col("__t")))
        .as("__hc"),
      sum(choose2(col("__nc"))).as("__a"))
    val hl = ml.crossJoin(tot).agg(
      sum(-(col("__nl") / col("__t")) * log(col("__nl") / col("__t")))
        .as("__hl"),
      sum(choose2(col("__nl"))).as("__b"),
      count(lit(1L)).as("n_labels"))
    val mi = cells
      .join(mc, "__c").join(ml, "__l").crossJoin(tot)
      .agg(sum((col("__n") / col("__t")) *
        log(col("__t") * col("__n") / (col("__nc") * col("__nl"))))
        .as("__mi"))
    val r = perC.crossJoin(idx).crossJoin(hc).crossJoin(hl)
      .crossJoin(mi).crossJoin(tot)
    val expPairs = col("__a") * col("__b") / choose2(col("__t"))
    val maxPairs = (col("__a") + col("__b")) / lit(2.0)
    r.select(col("__t").cast("long").as("n"),
      col("n_clusters"), col("n_labels"),
      round(col("__pure") / col("__t"), dp).as("purity"),
      when(col("__hc") > 0 && col("__hl") > 0,
        round(col("__mi") / sqrt(col("__hc") * col("__hl")), dp)).as("nmi"),
      when(abs(maxPairs - expPairs) > 0,
        round((col("__idx") - expPairs) / (maxPairs - expPairs), dp))
        .as("ari"))
  }

  /** Robust MAD outlier screen: the modified z-score
    * 0.6745·(x − median)/MAD (Iglewicz & Hoaglin 1993), with
    * MAD = median(|x − median|) — the dispersion measure a 50%
    * contamination cannot move, where mean/stddev z-scores break at one
    * gross outlier. The standard screen marks |z| > 3.5.
    *
    * Two percentile passes (median, then MAD over the centered scan) +
    * one map-only scoring scan with the two scalars broadcast.
    * `exact = false` (default, the 100 TB path) rides mergeable
    * approx_percentile sketches; `exact = true` is the oracle-audit
    * variant. A zero MAD (≥half the data on one value) yields NULL
    * scores, not a division artifact. Returns the input columns plus
    * (mad_z, is_outlier). */
  def madOutliers(df: DataFrame, c: Column, threshold: Double = 3.5,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val v = c.cast("double")
    def med(d: DataFrame, x: Column) =
      // exact path: the built-in, DELIBERATELY (r17 measured rejection
      // of the exactPercentileRow sweep here): the two medians are
      // sequential (MAD needs the median) and each 1-row result is
      // re-referenced by later crossJoins, so the rank machinery's
      // per-pass cost ran 3-4x — q_mad measured 0.36→1.9-2.8s warm at
      // sf0.1 and 0.38→2.0s at sf1. The §5 hazard doesn't apply: this
      // exact branch is the oracle-audit variant over bounded-distinct
      // audit columns (the buffer is distinct-bounded); the 100 TB
      // path is the approx default below.
      if (exact) d.agg(percentile(x, lit(0.5)).as("__m"))
      else d.agg(approx_percentile(x, lit(0.5), lit(accuracy)).as("__m"))
    val m = med(df, v)
    val mad = med(df.crossJoin(broadcast(m)), abs(v - col("__m")))
      .withColumnRenamed("__m", "__mad")
    val z = lit(0.6745) * (v - col("__m")) / col("__mad")
    df.crossJoin(broadcast(m)).crossJoin(broadcast(mad))
      .withColumn("mad_z", when(col("__mad") > 0, z))
      .withColumn("is_outlier",
        when(col("__mad") > 0, abs(col("mad_z")) > threshold))
      .drop("__m", "__mad")
  }

  /** Autocorrelation + partial autocorrelation of a REGULAR (bucketed)
    * series — the dependence fingerprint behind seasonality detection,
    * AR-order choice, and "is this metric still iid" monitoring:
    *
    *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * (the standard biased estimator over the full-series mean), with
    * PACF from the Durbin–Levinson recursion on the collected r_1..r_K
    * — bounded driver algebra over maxLag doubles (the IPF
    * bounded-driver-step discipline). Input is ONE ROW PER BUCKET
    * (build it with a time-bucket groupBy), so the single-partition
    * window is bounded by time resolution, never event count — the
    * [[kaplanMeier]] argument. One window pass carries ALL `maxLag`
    * leads (one exchange); one aggregation computes every lag's
    * moments. Returns (lag, n_pairs, acf, pacf) for lag ∈ [1, maxLag].
    * Lags with no pairs (series shorter than k) report NULLs. */
  /** Shared lag-moment pass for [[acfPacf]] and [[ljungBox]]: one
    * window pass carrying all `maxLag` leads, one aggregation — returns
    * (series length, per-lag (n_pairs, r_k)). */
  private def acfMoments(series: DataFrame, order: Seq[Column],
      value: Column, maxLag: Int): (Long, Seq[(Long, Option[Double])]) = {
    val xbarDf = series.agg(avg(value.cast("double")).as("__m"))
    val w = Window.orderBy(order: _*)
    val centered = series.crossJoin(broadcast(xbarDf))
      .select(((value.cast("double") - col("__m")).as("__c0") +: order): _*)
    val withLeads = (1 to maxLag).foldLeft(centered) { (d, k) =>
      d.withColumn(s"__c$k", lead(col("__c0"), k).over(w))
    }
    val aggs = (1 to maxLag).flatMap(k => Seq(
      sum(col("__c0") * col(s"__c$k")).as(s"__num$k"),
      count(col(s"__c$k")).as(s"__np$k"))) ++ Seq(
      sum(col("__c0") * col("__c0")).as("__den"),
      count(col("__c0")).as("__nt"))
    val r = withLeads.agg(aggs.head, aggs.tail: _*).head()
    val den = r.getAs[Double]("__den")
    val acfs = (1 to maxLag).map { k =>
      val np = r.getAs[Long](s"__np$k")
      if (np == 0 || den <= 0) (np, Option.empty[Double])
      else (np, Some(r.getAs[Double](s"__num$k") / den))
    }
    (r.getAs[Long]("__nt"), acfs)
  }

  def acfPacf(series: DataFrame, order: Seq[Column], value: Column,
      maxLag: Int, dp: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(order.nonEmpty, "acfPacf needs ordering columns")
    val spark = series.sparkSession
    val (_, acfs) = acfMoments(series, order, value, maxLag)
    // Durbin–Levinson: phi_{k,k} from r_1..r_k
    val rv = acfs.map(_._2.getOrElse(Double.NaN)).toArray
    val pacf = Array.fill(maxLag)(Double.NaN)
    val phi = Array.fill(maxLag + 1, maxLag + 1)(0.0)
    var vk = 1.0
    var ok = true
    for (k <- 1 to maxLag if ok) {
      if (rv(k - 1).isNaN || vk <= 0) ok = false
      else {
        val num = rv(k - 1) -
          (1 until k).map(j => phi(k - 1)(j) * rv(k - 1 - j)).sum
        phi(k)(k) = num / vk
        for (j <- 1 until k)
          phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
        vk *= (1.0 - phi(k)(k) * phi(k)(k))
        pacf(k - 1) = phi(k)(k)
      }
    }
    def rd(x: Double) = BigDecimal(x).setScale(dp,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (1 to maxLag).map { k =>
      val (np, a) = acfs(k - 1)
      (k, np, a.map(rd), if (pacf(k - 1).isNaN) None else Some(rd(pacf(k - 1))))
    }
    spark.createDataFrame(rows).toDF("lag", "n_pairs", "acf", "pacf")
      .orderBy("lag")
  }

  /** Ljung–Box portmanteau whiteness test (Ljung & Box 1978) over the
    * same [[acfMoments]] pass:
    *
    *   Q = n(n+2) Σ_{k=1..K} r_k²/(n−k)   ~  χ²(K) under iid
    *
    * — "is this metric still white noise" as one verdict row (the
    * monitoring complement of [[acfPacf]]'s per-lag readout). Same
    * bucketed-series contract; 0.05 verdict via the shared
    * [[chiSq95]] closed form. Q is NULL when any lag lacks pairs.
    * Returns (n, max_lag, q_stat, crit_05, reject_05). */
  def ljungBox(series: DataFrame, order: Seq[Column], value: Column,
      maxLag: Int, dp: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(order.nonEmpty, "ljungBox needs ordering columns")
    val spark = series.sparkSession
    val (n, acfs) = acfMoments(series, order, value, maxLag)
    def rd(x: Double) = BigDecimal(x).setScale(dp,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val q =
      if (acfs.exists(_._2.isEmpty) || n <= maxLag) None
      else Some(n * (n + 2.0) * (1 to maxLag).map { k =>
        val r = acfs(k - 1)._2.get
        r * r / (n - k)
      }.sum)
    val crit = chiSq95Scala(maxLag.toDouble)
    spark.createDataFrame(Seq(
        (n, maxLag, q.map(rd), rd(crit), q.map(_ > crit))))
      .toDF("n", "max_lag", "q_stat", "crit_05", "reject_05")
  }

  /** Per-group [[robustStats]]: trimmed mean, winsorized stddev, and
    * tail masses computed INDEPENDENTLY per group value — the
    * per-source/per-language length-hygiene table (a clean global
    * trimmed mean hides one source whose tail is all boilerplate).
    *
    * Shape: one group-keyed percentile rollup (mergeable
    * approx_percentile sketches by default — the 100 TB path; exact is
    * the oracle-audit opt-in), thresholds broadcast back (|groups|
    * rows), then one group-keyed stats pass. Nothing sorts globally at
    * any group cardinality. */
  def robustStatsByGroup(df: DataFrame, group: Column, c: Column,
      trim: Double = 0.05, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    val base = df.select(group.as("__g"), c.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__g").isNotNull)
    val v = col("__v")
    val thr =
      if (exact)
        // grouped rank selection, not the built-in's per-group boxed
        // map (r17 — bit-identical, see exactPercentileByGroup)
        exactPercentileByGroup(base, col("__g"), v,
          Seq(trim -> "__lo", (1 - trim) -> "__hi"))
      else
        base.groupBy("__g")
          .agg(approx_percentile(v, array(lit(trim), lit(1 - trim)),
            lit(accuracy)).as("__t"))
          .select(col("__g"), element_at(col("__t"), 1).as("__lo"),
            element_at(col("__t"), 2).as("__hi"))
    base.join(broadcast(thr), "__g")
      .groupBy(col("__g"), col("__lo"), col("__hi"))
      .agg(
        avg(when(v.between(col("__lo"), col("__hi")), v)).as("trimmed_mean"),
        stddev_samp(least(greatest(v, col("__lo")), col("__hi")))
          .as("winsor_std"),
        count(lit(1L)).as("n"),
        sum(when(v < col("__lo") || v > col("__hi"), 1L).otherwise(0L))
          .as("n_trimmed"))
      .select(col("__g").as("grp"), col("__lo").as("p_lo"),
        col("__hi").as("p_hi"), col("trimmed_mean"), col("winsor_std"),
        col("n"), col("n_trimmed"))
  }

  /** Distribution drift between two dataset versions on one numeric
    * column: Population Stability Index over `bins` equi-width buckets
    * spanning the COMBINED min/max —
    *
    *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
    *
    * with Laplace smoothing (c + 0.5)/(n + 0.5·bins) so empty buckets
    * stay finite and the number is deterministic. The standard
    * monitoring gate between corpus snapshots / train-serve windows
    * (rule of thumb: < 0.1 stable, > 0.25 drifted).
    *
    * Scale shape: one 2-row min/max aggregate over the union, then one
    * partial-aggregated bin-id groupBy per side (bin count rows each)
    * and a bins-sized merge — two scans total, shuffles carry only
    * (bin, count). Returns one row: (psi, n_a, n_b, n_bins). */
  def driftPsi(a: DataFrame, b: DataFrame, c: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val va = a.select(c.cast("double").as("__v")).where(col("__v").isNotNull)
    val vb = b.select(c.cast("double").as("__v")).where(col("__v").isNotNull)
    val bounds = va.unionAll(vb).agg(min("__v").as("__lo"), max("__v").as("__hi"))
    def hist(df: DataFrame, cnt: String) =
      df.crossJoin(bounds)
        .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(bins - 1), floor(
            (col("__v") - col("__lo")) / ((col("__hi") - col("__lo")) / bins))
            .cast("int"))).as("__bin"))
        .groupBy("__bin").agg(count(lit(1L)).as(cnt))
    val binIds = a.sparkSession.range(0, bins).select(col("id").cast("int").as("__bin"))
    val merged = binIds
      .join(hist(va, "__ca"), Seq("__bin"), "left")
      .join(hist(vb, "__cb"), Seq("__bin"), "left")
      .select(col("__bin"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    merged
      .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"),
        collect_list(struct(col("__bin"), col("__ca"), col("__cb"))).as("__h"))
      .select(col("n_a"), col("n_b"),
        aggregate(transform(col("__h"), s => {
          val p = (s.getField("__ca").cast("double") + 0.5) /
            (col("n_a").cast("double") + lit(0.5 * bins))
          val q = (s.getField("__cb").cast("double") + 0.5) /
            (col("n_b").cast("double") + lit(0.5 * bins))
          (p - q) * log(p / q)
        }), lit(0.0), (acc, x) => acc + x).as("psi"),
        lit(bins).as("n_bins"))
  }

  /** Per-DIMENSION embedding drift: [[driftPsi]]'s PSI computed for
    * every coordinate of an embedding column between two cohorts —
    * names WHICH dimensions moved, where the kernel MMD
    * ([[graft.functions.Similarity.mmdRff]]) only answers whether
    * anything did. The actionable follow-up readout: a handful of hot
    * dimensions usually traces to one upstream feature/encoder change,
    * while uniform low-grade drift across all dims reads as population
    * shift. Same conventions as driftPsi — equi-width bins over each
    * dimension's OWN min/max across both cohorts, Laplace
    * (c+0.5)/(n+0.5·bins) smoothing, degenerate (constant) dimensions
    * bin to 0 and score PSI 0.
    *
    * Shape: ONE posexplode scan → a d-row per-dim bounds rollup
    * broadcast back → one (dim, bin) rollup with map-side partials →
    * the dense d×bins grid (bounded) → a per-dim fold over the sorted
    * bin list. Never pairs rows; exchange volume is d·n scalars
    * partial-aggregated map-side. */
  def embeddingDimDrift(df: DataFrame, vecCol: String, inA: Column,
      bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val ex = df.where(col(vecCol).isNotNull &&
        inA.cast("boolean").isNotNull)
      .select(inA.cast("boolean").as("__a"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("__a"), col("dim"), col("__x").cast("double").as("__x"))
      .where(col("__x").isNotNull)
    val bounds = ex.groupBy("dim")
      .agg(min("__x").as("__lo"), max("__x").as("__hi"))
    val binned = ex.join(broadcast(bounds), Seq("dim"))
      .select(col("dim"), col("__a"),
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(bins - 1), floor((col("__x") - col("__lo")) /
            ((col("__hi") - col("__lo")) / bins)).cast("int"))).as("__bin"))
      .groupBy("dim", "__bin")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__cb"))
    val grid = bounds.select("dim").crossJoin(
        df.sparkSession.range(0, bins).select(col("id").cast("int").as("__bin")))
      .join(binned, Seq("dim", "__bin"), "left")
      .select(col("dim"), col("__bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    grid.groupBy("dim")
      .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"),
        array_sort(collect_list(struct(col("__bin"), col("__ca"),
          col("__cb")))).as("__h"))
      .select(col("dim"), col("n_a"), col("n_b"),
        round(aggregate(transform(col("__h"), s => {
          val p = (s.getField("__ca").cast("double") + 0.5) /
            (col("n_a").cast("double") + lit(0.5 * bins))
          val q = (s.getField("__cb").cast("double") + 0.5) /
            (col("n_b").cast("double") + lit(0.5 * bins))
          (p - q) * log(p / q)
        }), lit(0.0), (acc, x) => acc + x), dp).as("psi"))
      .orderBy("dim")
  }

  /** [[driftPsi]] unrolled over TIME: PSI of every `bucket` period's
    * value distribution against the FIRST period (the monitoring time
    * series a drift dashboard plots, not a single A/B number). Same
    * conventions as driftPsi — equi-width bins over the global min/max,
    * Laplace (c+0.5)/(n+0.5·bins) smoothing so empty bins stay finite
    * and deterministic; the baseline period's own row reads exactly 0.
    *
    * Scale shape: one global bounds row (broadcast), one
    * (period, bin)-keyed rollup of the scan, the dense period×bins grid
    * generated in-scan from the period summary (periods are
    * time-bounded, bins literal), and the baseline's `bins` rows
    * broadcast into the final period rollup. No window over data rows,
    * nothing all-pairs. */
  def psiOverTime(df: DataFrame, ts: Column, value: Column,
      bucket: String = "day", bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = df.select(date_trunc(bucket, ts).as("__p"),
        value.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__p").isNotNull)
    val bounds = v.agg(min("__v").as("__lo"), max("__v").as("__hi"),
      min("__p").as("__base"))
    val binned = v.crossJoin(broadcast(bounds))
      .select(col("__p"), col("__base"),
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(bins - 1), floor((col("__v") - col("__lo")) /
            ((col("__hi") - col("__lo")) / bins)).cast("int"))).as("__bin"))
    val cells = binned.groupBy("__p", "__bin").agg(count(lit(1L)).as("__c"))
    val grid = cells.groupBy("__p").agg(sum(col("__c")).as("__n"))
      .select(col("__p"), col("__n"),
        explode(sequence(lit(0), lit(bins - 1))).as("__bin"))
      .join(cells, Seq("__p", "__bin"), "left")
      .na.fill(0L, Seq("__c"))
    val baseCells = grid.crossJoin(broadcast(bounds.select(col("__base"))))
      .where(col("__p") === col("__base"))
      .select(col("__bin"), col("__c").as("__cb"), col("__n").as("__nb"))
    val p = (col("__c").cast("double") + 0.5) /
      (col("__n").cast("double") + lit(0.5 * bins))
    val q = (col("__cb").cast("double") + 0.5) /
      (col("__nb").cast("double") + lit(0.5 * bins))
    grid.join(broadcast(baseCells), "__bin")
      .groupBy(col("__p"))
      .agg(max(col("__n")).as("n"),
        round(sum((p - q) * log(p / q)), dp).as("psi"))
      .select(col("__p").as("period"), col("n"), col("psi"),
        (col("psi") > 0.25).as("drifted"))
      .orderBy("period")
  }

  /** Per-slice PSI against the POOLED corpus distribution — "which
    * source/shard/language drifted" in one verdict table, the slice
    * companion of [[psiOverTime]] (that one baselines on the first
    * period; this one on everything). Same equi-width bins over the
    * global min/max, same Laplace smoothing, same >0.25 drift rule of
    * thumb. Returns (slice, n, psi, drifted) ordered by slice.
    *
    * Shape: one 1-row min/max aggregate, ONE (slice, bin) rollup (the
    * only corpus exchange — the pooled histogram is the slice
    * histograms' own rollup, not a second scan), a |slices|×bins grid
    * fill, and a slice-keyed verdict rollup. */
  def psiBySlice(df: DataFrame, slice: Column, value: Column,
      bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = df.select(slice.as("__s"), value.cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__s").isNotNull)
    val bounds = v.agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val cells = v.crossJoin(broadcast(bounds))
      .select(col("__s"),
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(bins - 1), floor((col("__v") - col("__lo")) /
            ((col("__hi") - col("__lo")) / bins)).cast("int"))).as("__bin"))
      .groupBy("__s", "__bin").agg(count(lit(1L)).as("__c"))
      .localCheckpoint(true) // grid (and through it the pooled rollup) + totals read it
    val grid = cells.groupBy("__s").agg(sum(col("__c")).as("__n"))
      .select(col("__s"), col("__n"),
        explode(sequence(lit(0), lit(bins - 1))).as("__bin"))
      .join(cells, Seq("__s", "__bin"), "left")
      .na.fill(0L, Seq("__c"))
    // pooled histogram rolls up from the ZERO-FILLED grid — bins empty
    // across every slice still carry their smoothing mass in each
    // slice's PSI sum, exactly as psiOverTime's zero-filled baseline
    // does (an inner join against non-empty cells used to drop them)
    val pooled = grid.groupBy("__bin").agg(sum(col("__c")).as("__cb"))
      .crossJoin(cells.agg(sum(col("__c")).as("__nb")))
    val p = (col("__c").cast("double") + 0.5) /
      (col("__n").cast("double") + lit(0.5 * bins))
    val q = (col("__cb").cast("double") + 0.5) /
      (col("__nb").cast("double") + lit(0.5 * bins))
    grid.join(broadcast(pooled), "__bin")
      .groupBy(col("__s"))
      .agg(max(col("__n")).as("n"),
        round(sum((p - q) * log(p / q)), dp).as("psi"))
      .select(col("__s").as("slice"), col("n"), col("psi"),
        (col("psi") > 0.25).as("drifted"))
      .orderBy("slice")
  }

  /** Column-pair association in one result row: Pearson correlation,
    * sample covariance, and Spearman rank correlation. Pearson/covar are
    * single partial-aggregated co-moment passes. Spearman needs ranks:
    * computed as fractional (average) ranks via the VALUE-HISTOGRAM CDF
    * — a groupBy to per-value counts, a two-phase
    * [[Windows.globalCumSum]] over the (distinct-value-sized)
    * histogram, and an equi-join back — no per-row global sort window
    * AND no single-reducer histogram scan, so a continuous column with
    * ~n distinct values still rank-scans in parallel. Rows with a NULL
    * in either column are excluded (pairwise deletion, matching
    * corr/covar_samp). */
  def correlationStats(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // read three times: two rank joins + the agg
    def ranks(cn: String, out: String) = {
      val counts = base.groupBy(col(cn)).agg(count(lit(1L)).as("__c"))
      // average of the tie run's positions: cum − (c−1)/2
      Windows.globalCumSum(counts, Seq(col(cn)), col("__c"), "__cum")
        .select(col(cn), (col("__cum") - (col("__c") - 1) / 2.0).as(out))
    }
    base
      .join(ranks("__x", "__rx"), "__x")
      .join(ranks("__y", "__ry"), "__y")
      .agg(
        corr(col("__x"), col("__y")).as("pearson"),
        covar_samp(col("__x"), col("__y")).as("covar"),
        corr(col("__rx"), col("__ry")).as("spearman"))
  }

  /** Interval (point-in-range) join at scale: match point rows
    * (timestamp `ptsTs`) to interval rows ([`startCol`, `endCol`],
    * inclusive both ends) WITHOUT a range-join pair explosion. Intervals
    * explode to the fixed-width time bins they overlap, points take
    * their single bin, and the match is a bin EQUI-join + exact interval
    * filter. Every qualifying (point, interval) pair meets in exactly
    * one bin — the point's — so no post-join dedup is needed.
    *
    * Scale shape: the shuffle key is the bin, so both sides
    * hash-partition; an interval spanning k bins replicates k times —
    * pick `binSeconds` near the typical interval length (replication
    * ≈ avg(len)/binSeconds + 1). The naive `l.ts BETWEEN r.s AND r.e`
    * plans as a nested-loop over all pairs; a 100 TB event table cannot
    * pay that. Column names must not collide across the two inputs. */
  def binnedIntervalJoin(points: DataFrame, ptsTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val collisions = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(collisions.isEmpty,
      s"binnedIntervalJoin: rename colliding columns: ${collisions.mkString(", ")}")
    val w = lit(binSeconds)
    val pb = points.withColumn("__bin", floor(unix_timestamp(col(ptsTs)) / w))
    val ib = intervals.withColumn("__bin", explode(sequence(
      floor(unix_timestamp(col(startCol)) / w),
      floor(unix_timestamp(col(endCol)) / w))))
    pb.join(ib, "__bin")
      .where(col(ptsTs) >= col(startCol) && col(ptsTs) <= col(endCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join, binned: pairs of intervals with
    * `[aStart, aEnd] ∩ [bStart, bEnd] ≠ ∅` (inclusive bounds) — session
    * overlap, ad attribution windows, downtime correlation. The
    * generalization of [[binnedIntervalJoin]] from points to intervals:
    * each side explodes to the epoch-second bins it spans, candidates
    * come from the bin EQUI-join, a distinct pass collapses multi-bin
    * matches, and the exact inclusive-overlap predicate filters — no
    * nested-loop range join at any size. An interval contributes
    * (length/bin + 1) rows: size `binSeconds` near the typical interval
    * length; extremely long intervals fan out proportionally (the same
    * long-ranges caveat the point variant documents).
    *
    * Bounds are NUMERIC epoch seconds (callers with timestamps convert
    * via unix_timestamp first — keeps the operator unit-agnostic).
    * Column-name collisions between the two frames must be renamed
    * first (same contract as [[binnedIntervalJoin]]). */
  def binnedOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val collisions = a.columns.toSeq.intersect(b.columns.toSeq)
    require(collisions.isEmpty,
      s"binnedOverlapJoin: rename colliding columns: ${collisions.mkString(", ")}")
    val w = lit(binSize)
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / w).cast("long"),
          floor(col(e) / w).cast("long"))))
    binned(a, aStart, aEnd).join(binned(b, bStart, bEnd), "__bin")
      .drop("__bin").distinct()
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
  }

  /** Cohort retention: group users by the period of their FIRST event
    * (the cohort), then count how many of each cohort are active 0, 1,
    * 2, … periods later — the product-analytics retention matrix.
    * Periods are tumbling windows of `periodSeconds` over `ts`.
    *
    * Shape: one user-keyed aggregate finds each user's cohort period
    * AND the distinct set of periods they were active in (collected in
    * the same pass — the user's periods, bounded by the observation
    * span, not their event count), then the explode + (cohort, offset)
    * aggregate shuffles only (user, period) pairs. The raw event table
    * is scanned ONCE and never shuffled at event granularity.
    *
    * Returns (cohort_period, period_offset, n_active, cohort_size,
    * retention_pct), cohort_period as epoch seconds of the period
    * start. */
  def cohortRetention(df: DataFrame, user: Column, ts: Column,
      periodSeconds: Long, dp: Int = 2): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be positive, got $periodSeconds")
    val p = (unix_timestamp(ts) / periodSeconds).cast("long") * periodSeconds
    val perUser = df
      .select(user.as("__u"), p.as("__p"))
      .groupBy(col("__u"))
      .agg(min(col("__p")).as("__cohort"),
           collect_set(col("__p")).as("__periods"))
    val active = perUser
      .select(col("__u"), col("__cohort"),
        explode(col("__periods")).as("__p"))
      .groupBy(col("__cohort").as("cohort_period"),
        (((col("__p") - col("__cohort")) / periodSeconds).cast("long"))
          .as("period_offset"))
      .agg(count(lit(1L)).as("n_active"))
    // offset 0 contains every cohort member by construction (the first
    // event is in the cohort period) — reuse it as the denominator via
    // a narrow (cohort → size) broadcastable self-join
    val sizes = active.where(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_active").as("cohort_size"))
    active.join(sizes, "cohort_period")
      .select(col("cohort_period"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") * lit(100.0) / col("cohort_size"), dp)
          .as("retention_pct"))
  }

  /** Welch's two-sample t-test (unequal variances): is the mean of
    * `value` different between the two groups `inA` = true/false? The
    * experiment-analysis companion to [[chiSquare]] for numeric
    * outcomes. Returns one row: group sizes/means, the t statistic,
    * and the Welch–Satterthwaite degrees of freedom — thresholdable
    * without a CDF (|t| > ~2 ≈ p < 0.05 for df ≳ 30).
    *
    * Shape: ONE full scan with conditional aggregates (partial-agg
    * friendly sums, no pivot, no per-group sub-frames), one 1-row
    * result. Variances come from the Σx/Σx² identity computed in the
    * same pass. */
  def welchTTest(df: DataFrame, inA: Column, value: Column,
      dp: Int = 6): DataFrame = {
    val v = value.cast("double")
    def side(pred: Column, tag: String) = Seq(
      sum(when(pred, 1L).otherwise(0L)).as(s"__n$tag"),
      sum(when(pred, v).otherwise(0.0)).as(s"__s$tag"),
      sum(when(pred, v * v).otherwise(0.0)).as(s"__q$tag"))
    val aggs = side(inA, "a") ++ side(!inA, "b")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("*"),
        (col("__sa") / col("__na")).as("__ma"),
        (col("__sb") / col("__nb")).as("__mb"),
        // sample variance: (Σx² − n·mean²) / (n−1)
        ((col("__qa") - col("__sa") * col("__sa") / col("__na")) /
          (col("__na") - 1)).as("__va"),
        ((col("__qb") - col("__sb") * col("__sb") / col("__nb")) /
          (col("__nb") - 1)).as("__vb"))
      .select(col("*"),
        (col("__va") / col("__na")).as("__ea"),
        (col("__vb") / col("__nb")).as("__eb"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("__ma"), dp).as("mean_a"),
        round(col("__mb"), dp).as("mean_b"),
        round((col("__ma") - col("__mb")) /
          sqrt(col("__ea") + col("__eb")), dp).as("t_stat"),
        round(pow(col("__ea") + col("__eb"), 2) /
          (pow(col("__ea"), 2) / (col("__na") - 1) +
           pow(col("__eb"), 2) / (col("__nb") - 1)), dp).as("welch_df"))
  }

  /** One-sided upper CUSUM change-point scores per key (Page 1954):
    * s_i = max(0, s_{i−1} + (x_i − target − slack)) — the standard
    * sequential drift detector (data-quality regression onset, rate
    * shifts) that reacts to SUSTAINED small shifts a per-point z-score
    * never sees. `target` defaults to the key's own mean (self-
    * calibrating); an alarm fires where s crosses `h`.
    *
    * The recursion is NOT a window function, but it has a closed
    * prefix form: with t_i = Σ_{j≤i}(x_j − target − slack),
    * s_i = t_i − min(0, min_{j≤i} t_j) — two stacked running windows
    * over ONE key-partitioned exchange, no per-key fold, no UDAF.
    * Returns per-key (n, max_cusum, n_alarms, first_alarm_idx) where
    * n_alarms counts upward h-crossings (no post-alarm reset — each
    * sustained excursion counts once) and first_alarm_idx is the
    * 1-based position of the first crossing (NULL when in control). */
  def cusum(df: DataFrame, key: Column, order: Seq[Column], x: Column,
      slack: Double, h: Double, dp: Int = 6): DataFrame = {
    require(order.nonEmpty, "cusum needs ordering columns (plain named columns)")
    require(h > 0, s"alarm threshold must be positive, got $h")
    val base = df.select((Seq(key.as("__k"), x.cast("double").as("__x")) ++ order): _*)
    val wKey = Window.partitionBy(col("__k"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(order: _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = base
      .withColumn("__dev",
        col("__x") - avg(col("__x")).over(wKey) - lit(slack))
      .withColumn("__t", sum(col("__dev")).over(wRun))
      .withColumn("__s",
        col("__t") - least(lit(0.0), min(col("__t")).over(wRun)))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__alarm",
        col("__s") > h &&
          coalesce(lag(col("__s"), 1).over(wOrd) <= h, lit(true)))
    scored.groupBy(col("__k").as("key"))
      .agg(count(lit(1L)).as("n"),
        round(max(col("__s")), dp).as("max_cusum"),
        sum(when(col("__alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__alarm"), col("__i"))).cast("int").as("first_alarm_idx"))
  }

  /** Engagement stickiness: per day, the distinct active users that
    * day (DAU) and over the trailing `windowDays` (WAU/MAU), plus the
    * DAU/WAU ratio — the standard product-engagement summary. Exact
    * rolling DISTINCT does not decompose into a running window, so the
    * (user, day) table joins a trailing day range instead:
    *
    * Scale shape: events collapse to DISTINCT (user, day) first (one
    * partial-aggregated dedup — the only event-grain work); each
    * (user, day) row then EXPLODES to the `windowDays` anchor days it
    * serves and re-aggregates — no theta join, no per-day rescans,
    * |users·days|·window rows total. For extreme user counts swap the
    * exact distinct for [[graft.functions.Sketches.distinctSketches]]
    * merges. */
  def stickiness(df: DataFrame, user: Column, ts: Column,
      windowDays: Int = 7, dp: Int = 4): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = df.select(user.as("__u"),
        to_date(ts).as("__d")).distinct()
      .localCheckpoint(true) // scanned twice (DAU + window expansion)
    val dau = ud.groupBy(col("__d").as("day"))
      .agg(count(lit(1L)).as("dau"))
    val win = ud
      .select(col("__u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off"), col("__d"))
      .select(col("__u"), expr("date_add(__d, __off)").as("day"))
      .groupBy("day").agg(countDistinct(col("__u")).as("wau"))
    // inner join trims anchor days past the observed span
    dau.join(win, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), dp).as("stickiness"))
      .orderBy("day")
  }

  /** Sample-ratio mismatch (SRM) check: are experiment assignment
    * counts consistent with the intended split? The first gate of any
    * A/B readout — a biased assignment (bot filtering, logging loss,
    * redirect asymmetry) invalidates every downstream metric, and the
    * imbalance is usually too small to eyeball. One-degree-of-freedom
    * chi-square goodness of fit against `expectedA`; χ² > 3.84 ≈
    * p < 0.05. ONE conditional-sum scan, 1-row result. */
  def sampleRatioMismatch(df: DataFrame, inA: Column,
      expectedA: Double = 0.5, dp: Int = 6): DataFrame = {
    require(expectedA > 0 && expectedA < 1,
      s"expectedA must be in (0,1), got $expectedA")
    df.agg(sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(inA, 0L).otherwise(1L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        lit(expectedA).as("expected_a_frac"),
        round(
          pow(col("n_a") - (col("n_a") + col("n_b")) * expectedA, 2) /
            ((col("n_a") + col("n_b")) * expectedA) +
          pow(col("n_b") - (col("n_a") + col("n_b")) * (1 - expectedA), 2) /
            ((col("n_a") + col("n_b")) * (1 - expectedA)), dp).as("chi2"))
      .withColumn("srm_suspect", col("chi2") > 3.841)
  }

  /** Gini coefficient of a non-negative quantity across units (0 =
    * perfectly even, → 1 = one unit holds everything) + the top-share
    * concentration points — "how concentrated is revenue/traffic/token
    * volume across users/domains/sources", the economics complement of
    * [[graft.ops.Skew.diagnoseKeys]]'s per-key view.
    *
    * Computed from the identity over values sorted ascending:
    * G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n. Units first collapse to one
    * row each (partial-aggregated); the ascending rank then comes from
    * [[Windows.globalRowNumber]] — the two-phase range-partitioned
    * rank, never a single-reducer window over the unit table (units =
    * users/domains can be 10⁹ at 100 TB). The top-10 share needs no
    * second (descending) rank at all: `orderBy(desc).limit(10)` is a
    * TakeOrderedAndProject — per-partition top-10, merged at the
    * driver. `gini`/`top10_share` are NULL when total = 0 (all-zero
    * quantities) rather than a 0/0 artifact. */
  def gini(df: DataFrame, unit: Column, quantity: Column,
      dp: Int = 6): DataFrame = {
    val units = df.groupBy(unit.as("__u"))
      .agg(sum(quantity.cast("double")).as("__x"))
      .where(col("__x") >= 0)
    val ranked = Windows.globalRowNumber(units,
      Seq(col("__x"), col("__u")), out = "__i")
    val top10 = units.orderBy(col("__x").desc, col("__u").desc).limit(10)
      .agg(coalesce(sum(col("__x")), lit(0.0)).as("__top10"))
    ranked.agg(count(lit(1L)).as("n_units"),
        sum(col("__x")).as("__tot"),
        sum(col("__i") * col("__x")).as("__iw"))
      .crossJoin(top10)
      .select(col("n_units"),
        round(col("__tot"), 4).as("total"),
        when(col("n_units") === 0 || col("__tot") === 0.0,
            lit(null).cast("double"))
          .otherwise(round(lit(2.0) * col("__iw") /
              (col("n_units") * col("__tot"))
            - (col("n_units") + 1) / col("n_units").cast("double"), dp))
          .as("gini"),
        when(col("__tot") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("__top10") / col("__tot"), dp))
          .as("top10_share"))
  }

  /** Theil's T inequality index (Theil 1967): T = (1/n)Σ (xᵢ/μ)ln(xᵢ/μ)
    * over non-negative unit totals — [[gini]]'s information-theoretic
    * companion, and the one that DECOMPOSES: T is 0 at perfect
    * equality, ln(n) at total concentration, so `theil_norm` = T/ln(n)
    * lands in [0,1] comparable across table sizes (Gini compresses the
    * top tail; Theil is exactly sensitive there — the right lens for
    * "how concentrated is the corpus on a few domains"). Zero-total
    * units contribute 0 (x·ln x → 0). T is NULL when the total is 0 or
    * n < 2. One unit rollup + one 1-row pass with the broadcast mean:
    * (n_units, total, theil, theil_norm). */
  def theilInequality(df: DataFrame, unit: Column, quantity: Column,
      dp: Int = 6): DataFrame = {
    val units = df.groupBy(unit.as("__u"))
      .agg(sum(quantity.cast("double")).as("__x"))
      .where(col("__x") >= 0)
    val m = units.agg(count(lit(1L)).as("n_units"), avg(col("__x")).as("__m"),
      sum(col("__x")).as("__tot"))
    val term = when(col("__x") > 0,
      (col("__x") / col("__m")) * log(col("__x") / col("__m")))
      .otherwise(lit(0.0))
    val t = units.crossJoin(broadcast(m))
      .agg(first(col("n_units")).as("n_units"),
        first(col("__tot")).as("__tot"),
        avg(term).as("__t"))
    val ok = col("n_units") >= 2 && col("__tot") > 0.0
    t.select(col("n_units"), round(col("__tot"), 4).as("total"),
      when(ok, round(col("__t"), dp)).as("theil"),
      when(ok, round(col("__t") / log(col("n_units").cast("double")), dp))
        .as("theil_norm"))
  }

  /** Kaplan–Meier survival curve (product-limit estimator, JASA 1958)
    * over right-censored durations: one row per (subject, duration,
    * event?) in, the step function S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) out —
    * time-to-conversion, churn, time-to-failure with subjects still
    * alive at observation end correctly CENSORED rather than dropped
    * (dropping them biases every naive average).
    *
    * Scale shape: subjects collapse to a (duration → n_subjects,
    * n_events) histogram first (partial-aggregated); at-risk counts
    * are a SUFFIX sum and the product a cumulative exp∘Σln, both over
    * the distinct-duration table — its cardinality is bounded by time
    * resolution, not subject count, which is what makes the global
    * window acceptable. For truly CONTINUOUS durations, pass
    * `buckets > 0`: durations quantize to that many equi-width buckets
    * (each bucket reported at its largest observed duration, so the
    * curve stays a valid product-limit estimator over the coarsened
    * times) — the one-flag scale-safe form. Censored-only times
    * contribute factor 1 and are folded implicitly; output rows are
    * event times only. */
  def kaplanMeier(durations: DataFrame, duration: Column, isEvent: Column,
      dp: Int = 6, buckets: Int = 0): DataFrame = {
    val hist = survivalHist(durations, duration, isEvent, buckets)
    val wSuffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val factor = lit(1.0) - col("n_events") / col("n_risk")
    hist
      .withColumn("n_risk", sum(col("__n")).over(wSuffix))
      // ln of the positive factors only; any zero factor forces S to 0
      // from that time on via the min guard (sum-over-nulls never
      // reaches those rows' ELSE branch)
      .withColumn("__lnf", log(when(factor > 0, factor)))
      .withColumn("survival",
        when(min(factor).over(wCum) <= 0, lit(0.0))
          .otherwise(round(exp(sum(col("__lnf")).over(wCum)), dp)))
      .where(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"), col("survival"))
  }

  /** The (duration → n_subjects, n_events) histogram shared by
    * [[kaplanMeier]] and [[nelsonAalen]], with the optional equi-width
    * `buckets` quantization (each bucket reported at its LARGEST
    * observed duration: every subject in the bucket is at risk through
    * that time, so the product-limit / hazard-sum identities hold over
    * the coarsened grid). */
  private def survivalHist(durations: DataFrame, duration: Column,
      isEvent: Column, buckets: Int): DataFrame = {
    val raw = durations
      .select(duration.cast("double").as("t"), isEvent.cast("boolean").as("e"))
      .where(col("t").isNotNull)
    if (buckets <= 0)
      raw.groupBy("t")
        .agg(count(lit(1L)).as("__n"),
          sum(when(col("e"), 1L).otherwise(0L)).as("n_events"))
    else {
      val bounds = raw.agg(min(col("t")).as("__lo"), max(col("t")).as("__hi"))
      raw.crossJoin(broadcast(bounds))
        .select(col("t"), col("e"),
          when(col("__hi") === col("__lo"), lit(0)).otherwise(
            least(lit(buckets - 1), floor((col("t") - col("__lo")) /
              ((col("__hi") - col("__lo")) / buckets)).cast("int")))
            .as("__bin"))
        .groupBy(col("__bin"))
        .agg(max(col("t")).as("t"), count(lit(1L)).as("__n"),
          sum(when(col("e"), 1L).otherwise(0L)).as("n_events"))
        .drop("__bin")
    }
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) over
    * right-censored durations — [[kaplanMeier]]'s additive companion:
    *
    *   Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ     σ²(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ²
    *
    * The hazard view reads failure INTENSITY directly (slope changes
    * flag wear-in/wear-out regimes the survival curve smooths over) and
    * its estimator stays defined after the last event where KM's
    * product hits 0. Censoring/risk-set semantics, the distinct-duration
    * histogram shape, and the `buckets` quantization flag are all
    * shared with [[kaplanMeier]] (one exchange; windows ride the
    * time-resolution-bounded table). Output rows are event times only:
    * (t, n_risk, n_events, cum_hazard, var_hazard). */
  def nelsonAalen(durations: DataFrame, duration: Column, isEvent: Column,
      dp: Int = 6, buckets: Int = 0): DataFrame = {
    val hist = survivalHist(durations, duration, isEvent, buckets)
    val wSuffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_risk", sum(col("__n")).over(wSuffix))
      .withColumn("cum_hazard", round(sum(
        col("n_events").cast("double") / col("n_risk")).over(wCum), dp))
      .withColumn("var_hazard", round(sum(
        col("n_events").cast("double") /
          (col("n_risk").cast("double") * col("n_risk"))).over(wCum), dp))
      .where(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"),
        col("cum_hazard"), col("var_hazard"))
  }

  /** Restricted mean survival time (Irwin 1949; Royston & Parmar 2013):
    * the area under the [[kaplanMeier]] curve up to horizon `tau` —
    * "expected survival time over the next τ", the single-number
    * summary that stays defined under censoring where the plain mean
    * does not, and the standard effect measure when hazards are not
    * proportional (log-rank loses power there; RMST difference does
    * not). RMST = Σᵢ (tᵢ − tᵢ₋₁)·S(tᵢ₋₁) over event times ≤ τ, plus
    * the tail (τ − t_last)·S(t_last); with no events before τ it is
    * exactly τ.
    *
    * Shape: the [[kaplanMeier]] cost envelope — subjects collapse to
    * the shared distinct-duration histogram (the only corpus-width
    * exchange; `buckets` quantizes continuous durations exactly as
    * there), the product and the trapezoid integration ride windows
    * over that time-resolution-bounded table, 1 row out. The survival
    * factors integrate UNROUNDED; only the final area rounds. */
  def rmst(durations: DataFrame, duration: Column, isEvent: Column,
      tau: Double, dp: Int = 6, buckets: Int = 0): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val hist = survivalHist(durations, duration, isEvent, buckets)
    val wSuffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val factor = lit(1.0) - col("n_events") / col("n_risk")
    val km = hist
      .withColumn("n_risk", sum(col("__n")).over(wSuffix))
      .withColumn("__lnf", log(when(factor > 0, factor)))
      .withColumn("__sv",
        when(min(factor).over(wCum) <= 0, lit(0.0))
          .otherwise(exp(sum(col("__lnf")).over(wCum))))
      .where(col("n_events") > 0 && col("t") <= tau)
    val wOrd = Window.orderBy(col("t"))
    val integ = km
      .withColumn("__pt", lag(col("t"), 1, 0.0).over(wOrd))
      .withColumn("__ps", lag(col("__sv"), 1, 1.0).over(wOrd))
    integ.agg(count(lit(1L)).as("n_times"),
        coalesce(sum((col("t") - col("__pt")) * col("__ps")), lit(0.0))
          .as("__area"),
        max(col("t")).as("__tl"),
        expr("max_by(__sv, t)").as("__sl"))
      .select(col("n_times"), lit(tau).as("tau"),
        round(col("__area") + (lit(tau) - coalesce(col("__tl"), lit(0.0))) *
          coalesce(col("__sl"), lit(1.0)), dp).as("rmst"))
  }

  /** Debounce: collapse per-key event BURSTS (runs of events less than
    * `gapSeconds` apart) to one row each — duplicate-click suppression,
    * retry-storm collapsing, sensor chatter. A new burst starts where
    * the gap from the previous event is > `gapSeconds` (sessionization
    * at event grain, but returning burst SUMMARIES: first/last
    * timestamps, event count, span). One key-partitioned window
    * exchange carries the lag, the burst-id running sum, and the
    * (key, burst) rollup.
    *
    * Returns (keys…, burst_idx (1-based per key), burst_start epoch,
    * burst_end epoch, n_events, span_sec). */
  def debounce(df: DataFrame, keys: Seq[Column], ts: Column,
      tieBreak: Seq[Column], gapSeconds: Long): DataFrame = {
    require(keys.nonEmpty, "debounce needs at least one key column")
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val e = unix_timestamp(ts)
    val w = Window.partitionBy(keys: _*).orderBy(e +: tieBreak: _*)
    val marked = df
      .withColumn("__e", e)
      .withColumn("__new",
        when(col("__e") - lag(col("__e"), 1).over(w) > gapSeconds ||
          lag(col("__e"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__burst", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(keys :+ col("__burst").as("burst_idx"): _*)
      .agg(min(col("__e")).as("burst_start"),
        max(col("__e")).as("burst_end"),
        count(lit(1L)).as("n_events"),
        (max(col("__e")) - min(col("__e"))).as("span_sec"))
  }

  /** 2-D skyline (Pareto frontier, both dimensions MAXIMIZED): rows no
    * other row dominates, where a dominator is ≥ in both dimensions
    * and > in at least one (identical points do not dominate each
    * other — duplicates both survive, the standard skyline
    * convention). "Best tradeoffs" queries: newest-and-largest,
    * cheapest-and-fastest (negate a column to minimize it).
    *
    * Scale shape — the naive formulations are a nested-loop NOT
    * EXISTS (O(n²), the oracle's restatement) or a single global sort
    * + one-partition running max (the WindowExec bottleneck). Here
    * domination splits by an x-range bucket grid: a row is dominated
    * iff (a) some strictly-later BUCKET holds y' ≥ y — a suffix max
    * over the ≤`buckets`-row bucket table (the only unpartitioned
    * window, bounded rows by construction); (b) a strictly greater x
    * WITHIN its bucket holds y' ≥ y — a bucket-PARTITIONED window
    * over distinct x groups; or (c) an equal x holds y' > y — the
    * per-(bucket, x) max. One scan + bounded aggregates + equi-joins;
    * no global row sort, no O(n²). */
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val prepared = df
      .withColumn("__x", xCol.cast("double"))
      .withColumn("__y", yCol.cast("double"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val span = prepared.agg(min(col("__x")), max(col("__x"))).head()
    if (span.isNullAt(0)) return prepared.drop("__x", "__y").limit(0)
    val (lo, hi) = (span.getDouble(0), span.getDouble(1))
    val width = if (hi > lo) (hi - lo) / buckets else 1.0
    val bucketOf = least(floor((col("__x") - lit(lo)) / lit(width)),
      lit(buckets - 1L)).cast("long")
    val rows = prepared.withColumn("__b", bucketOf)
    // (c): per-(bucket, x) max, and (b): strictly-greater-x max within
    // the bucket via a 1-row-exclusive running window over DISTINCT x
    val perX = rows.groupBy(col("__b"), col("__x").as("__gx"))
      .agg(max(col("__y")).as("__gmax"))
      .withColumn("__inmax", max(col("__gmax")).over(
        Window.partitionBy(col("__b")).orderBy(col("__gx").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    // (a): strictly-later-bucket suffix max over the ≤`buckets`-row table
    val bucketMax = rows.groupBy(col("__b")).agg(max(col("__y")).as("__bmax"))
      .withColumn("__sufmax", max(col("__bmax")).over(
        Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__sufmax"))
    val flagged = rows
      .join(perX.withColumnRenamed("__b", "__pb"),
        col("__b") === col("__pb") && col("__x") === col("__gx"))
      .drop("__pb")
      .join(broadcast(bucketMax), "__b")
      .where(!(coalesce(col("__sufmax") >= col("__y"), lit(false)) ||
               coalesce(col("__inmax") >= col("__y"), lit(false)) ||
               col("__gmax") > col("__y")))
    flagged.drop("__b", "__x", "__y", "__gx", "__gmax", "__inmax", "__sufmax")
  }

  /** Mutual information between two categorical columns (nats), with
    * the marginal and joint entropies — [[chiSquare]]'s information-
    * theoretic sibling: how much knowing A tells you about B
    * (feature-leakage detection, redundant-dimension pruning,
    * split-key audits; MI = 0 ⟺ independent).
    *
    * One (a, b) cell aggregation; marginals ride window sums over the
    * |A|·|B|-bounded cell table (the chiSquare discipline), and every
    * entropy folds from the same cells: H(A) = −Σ_cells (c/n)·ln(ca/n)
    * since a's cells sum to ca. Absent cells contribute nothing (0·ln0
    * = 0 by convention and by construction here). */
  def mutualInformation(df: DataFrame, a: Column, b: Column,
      dp: Int = 6): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1L)).as("__c"))
    val wa = Window.partitionBy(col("__a"))
    val wb = Window.partitionBy(col("__b"))
    val withMarg = cells
      .withColumn("__ca", sum(col("__c")).over(wa))
      .withColumn("__cb", sum(col("__c")).over(wb))
      .crossJoin(cells.agg(sum(col("__c")).cast("double").as("__n")))
    val p = col("__c") / col("__n")
    withMarg.agg(
      sum(col("__c")).cast("long").as("n"),
      round(-sum(p * log(col("__ca") / col("__n"))), dp).as("h_a"),
      round(-sum(p * log(col("__cb") / col("__n"))), dp).as("h_b"),
      round(-sum(p * log(p)), dp).as("h_ab"),
      round(sum(p * log(col("__c") * col("__n") / (col("__ca") * col("__cb")))),
        dp).as("mi"))
  }

  /** Theil's uncertainty coefficients (Theil 1970) — the DIRECTIONAL
    * categorical-association pair [[mutualInformation]]'s symmetric MI
    * and [[chiSquare]]'s Cramér's V both miss:
    *
    *   U(a|b) = MI/H(a)   "how much of a does knowing b explain"
    *   U(b|a) = MI/H(b)
    *
    * Asymmetry is the point: postal code predicts city almost fully,
    * city barely predicts postal code — feature triage needs the
    * direction. Same one-contingency-rollup shape as
    * [[mutualInformation]] (all terms unrounded internally); a
    * zero-entropy (constant) side reports NULL for its coefficient.
    * One row: (n, mi, u_a_given_b, u_b_given_a). */
  def theilsU(df: DataFrame, a: Column, b: Column,
      dp: Int = 6): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1L)).as("__c"))
    val wa = Window.partitionBy(col("__a"))
    val wb = Window.partitionBy(col("__b"))
    val withMarg = cells
      .withColumn("__ca", sum(col("__c")).over(wa))
      .withColumn("__cb", sum(col("__c")).over(wb))
      .crossJoin(cells.agg(sum(col("__c")).cast("double").as("__n")))
    val p = col("__c") / col("__n")
    withMarg.agg(
        sum(col("__c")).cast("long").as("n"),
        (-sum(p * log(col("__ca") / col("__n")))).as("__ha"),
        (-sum(p * log(col("__cb") / col("__n")))).as("__hb"),
        sum(p * log(col("__c") * col("__n") / (col("__ca") * col("__cb"))))
          .as("__mi"))
      .select(col("n"), round(col("__mi"), dp).as("mi"),
        when(col("__ha") > 0, round(col("__mi") / col("__ha"), dp))
          .as("u_a_given_b"),
        when(col("__hb") > 0, round(col("__mi") / col("__hb"), dp))
          .as("u_b_given_a"))
  }

  /** McNemar's test (McNemar 1947, continuity-corrected) for comparing
    * two classifiers on the SAME evaluation rows — the paired test that
    * two independent accuracy numbers cannot replace (shared examples
    * correlate the errors):
    *
    *   χ² = (|b − c| − 1)² / (b + c)
    *
    * where b = rows only A gets right, c = rows only B gets right; the
    * concordant rows drop out by design. ONE aggregation (no window,
    * no join); verdict via the shared [[chiSq95]] χ²(1) closed form.
    * χ² is NULL when b + c = 0 (the classifiers never disagree).
    * Returns (n, n_both_right, n_only_a, n_only_b, n_both_wrong,
    * chi2, crit_05, reject_05). */
  def mcnemar(df: DataFrame, predA: Column, predB: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val ca = predA === label
    val cb = predB === label
    val agg = df.agg(count(lit(1L)).as("n"),
      sum(when(ca && cb, 1L).otherwise(0L)).as("n_both_right"),
      sum(when(ca && !cb, 1L).otherwise(0L)).as("n_only_a"),
      sum(when(!ca && cb, 1L).otherwise(0L)).as("n_only_b"),
      sum(when(!ca && !cb, 1L).otherwise(0L)).as("n_both_wrong"))
    val b = col("n_only_a").cast("double")
    val c = col("n_only_b").cast("double")
    val chi2 = (abs(b - c) - 1) * (abs(b - c) - 1) / (b + c)
    val crit = chiSq95(lit(1.0))
    agg.select(col("n"), col("n_both_right"), col("n_only_a"),
      col("n_only_b"), col("n_both_wrong"),
      when(b + c > 0, round(chi2, dp)).as("chi2"),
      round(crit, dp).as("crit_05"),
      when(b + c > 0, chi2 > crit).as("reject_05"))
  }

  /** Cohen's d / Hedges' g standardized effect size for the two-cohort
    * mean difference — the magnitude readout the [[welchTTest]] p-value
    * alone hides (at corpus scale EVERYTHING is significant; what
    * matters is whether the shift is 0.02σ or 0.8σ):
    *
    *   d = (x̄_a − x̄_b)/s_pooled,
    *   s_pooled = √(((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2))
    *   g = d·(1 − 3/(4(n_a+n_b) − 9))    (small-sample bias correction)
    *
    * ONE conditional-moment aggregation (no window, no join). NULL d
    * when either cohort has < 2 rows or the pooled variance is 0.
    * Rows with NULL value drop; NULL `inA` counts as cohort B. */
  def effectSize(df: DataFrame, value: Column, inA: Column,
      dp: Int = 6): DataFrame = {
    val v = value.cast("double")
    val s = df.select(v.as("__v"),
        when(inA, 1).otherwise(0).as("__a"))
      .where(col("__v").isNotNull)
    val agg = s.agg(
      count(when(col("__a") === 1, 1L)).as("n_a"),
      count(when(col("__a") === 0, 1L)).as("n_b"),
      avg(when(col("__a") === 1, col("__v"))).as("__ma"),
      avg(when(col("__a") === 0, col("__v"))).as("__mb"),
      var_samp(when(col("__a") === 1, col("__v"))).as("__va"),
      var_samp(when(col("__a") === 0, col("__v"))).as("__vb"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val sp2 = ((nA - 1) * col("__va") + (nB - 1) * col("__vb")) /
      (nA + nB - 2)
    val d = (col("__ma") - col("__mb")) / sqrt(sp2)
    val g = d * (lit(1.0) - lit(3.0) / (lit(4.0) * (nA + nB) - 9))
    agg.select(col("n_a"), col("n_b"),
      round(col("__ma") - col("__mb"), dp).as("mean_diff"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && sp2 > 0,
        round(d, dp)).as("cohens_d"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && sp2 > 0,
        round(g, dp)).as("hedges_g"))
  }

  /** p-chart (attribute control chart, Shewhart): per-bucket defect
    * rate against 3σ binomial control limits around the pooled rate —
    * the operations-monitoring classic for error/defect/violation
    * rates per hour/batch/shard. A bucket outside
    * p̄ ± σ·√(p̄(1−p̄)/n) is out of control; the limits are per-bucket
    * (wider for small buckets), which a naive fixed-threshold alert
    * gets wrong in both directions.
    *
    * One (bucket) aggregate + a 1-row pooled-rate cross join — two
    * tiny exchanges. The flag is computed on UNROUNDED doubles
    * (integer inputs + IEEE sqrt — engine-deterministic). */
  def pChart(df: DataFrame, bucket: Column, defect: Column,
      sigma: Double = 3.0, dp: Int = 6): DataFrame = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val per = df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1L)).as("n"),
        sum(when(defect, 1L).otherwise(0L)).as("defects"))
    val pooled = per.agg(
      (sum(col("defects")) / sum(col("n"))).as("__pbar"))
    val margin = lit(sigma) * sqrt(col("__pbar") * (lit(1.0) - col("__pbar")) / col("n"))
    val p = col("defects") / col("n")
    per.crossJoin(pooled).select(
      col("bucket"), col("n"), col("defects"),
      round(p, dp).as("rate"),
      round(col("__pbar"), dp).as("pooled_rate"),
      round(greatest(lit(0.0), col("__pbar") - margin), dp).as("lcl"),
      round(col("__pbar") + margin, dp).as("ucl"),
      (p > col("__pbar") + margin ||
        p < greatest(lit(0.0), col("__pbar") - margin)).as("out_of_control"))
  }

  /** Per-group ordinary least squares y ~ x: slope, intercept and r²
    * for every group in ONE aggregation pass — the "fit a line per
    * segment/source/day" primitive (trend slopes per cohort, price
    * elasticity per category, drift rate per feed).
    *
    * Built from Spark's numerically-stable streaming moment aggregates
    * (covar_pop / var_pop / corr are Welford-style partial-merge
    * aggregates, exactly what DuckDB's regr_* family computes): map-side
    * partials, no raw Σx² cancellation, no second pass. Degenerate
    * groups (constant x — zero variance) return NULL slope/intercept/r²
    * rather than ±Inf. */
  def regressionByKey(df: DataFrame, key: Column, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val xd = x.cast("double"); val yd = y.cast("double")
    val agg = df.groupBy(key.as("key"))
      .agg(count(lit(1L)).as("n"),
        covar_pop(yd, xd).as("__cov"), var_pop(xd).as("__vx"),
        var_pop(yd).as("__vy"), avg(xd).as("__mx"), avg(yd).as("__my"))
    // NULL divisors (nullif idiom), not when-guards or `corr`: Spark's
    // ANSI mode makes both corr() and a hoisted guarded division THROW
    // on zero-variance groups; dividing by a NULL-when-zero divisor
    // yields NULL in any mode. r² = cov²/(vx·vy) from the same moments.
    val slope = col("__cov") / when(col("__vx") > 0, col("__vx"))
    agg.select(col("key"), col("n"),
      round(slope, dp).as("slope"),
      round(col("__my") - slope * col("__mx"), dp).as("intercept"),
      round(col("__cov") * col("__cov") /
        when(col("__vx") > 0 && col("__vy") > 0,
          col("__vx") * col("__vy")), dp).as("r2"))
  }

  /** Market-basket association pairs: for every unordered item pair
    * occurring in ≥ `minPairCount` baskets, the support, confidence and
    * lift — the classic affinity/co-purchase/co-occurrence mining
    * surface (Agrawal & Srikant 1994's A-priori first step, which at
    * pair depth is exact without candidate pruning).
    *
    * Scale shape: baskets dedup to distinct (basket, item) rows first;
    * pair generation is a basket-keyed EQUI self-join (fanout bounded
    * by basket size, never corpus size — cap pathological baskets
    * upstream with [[graft.ops.DataPrep.capPerGroup]]); supports come
    * from partial-aggregated counts; the final cut is a TakeOrdered by
    * lift. Confidence is directional — reported for a→b with (a, b) in
    * item order (the item column's NATIVE ordering — numeric ids pair
    * as numbers and shuffle as 8 bytes, not strings); lift is
    * symmetric. */
  def associationPairs(df: DataFrame, basket: Column, item: Column,
      minPairCount: Long, k: Int, dp: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val items = df.select(basket.as("__b"), item.as("__i")).distinct()
    val nb = items.agg(countDistinct(col("__b")).cast("double").as("__nb"))
    val counts = items.groupBy(col("__i")).agg(count(lit(1L)).as("__c"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), "__b")
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1L)).as("n_baskets"))
      .where(col("n_baskets") >= minPairCount)
    pairs
      .join(counts.select(col("__i").as("item_a"), col("__c").as("__ca")), "item_a")
      .join(counts.select(col("__i").as("item_b"), col("__c").as("__cb")), "item_b")
      .crossJoin(nb)
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        round(col("n_baskets") / col("__nb"), dp).as("support"),
        round(col("n_baskets") / col("__ca"), dp).as("confidence"),
        round(col("n_baskets") * col("__nb") / (col("__ca") * col("__cb")), dp)
          .as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b")).limit(k)
  }

  /** First-order Markov transition matrix over per-key ordered event
    * sequences: for every observed (from_state, to_state) pair, the
    * transition count and the row-normalized probability — user-journey
    * analysis, next-event prediction baselines, session-flow QA.
    * `order` must make the per-key sequence deterministic (include a
    * tie-break after the timestamp).
    *
    * Shape: one key-partitioned window (lead) — the only event-
    * granularity exchange — then a (from, to) aggregate over state
    * pairs (partial-agg friendly; cardinality ≤ |states|²). The
    * probability denominator rides a window over the AGGREGATED pair
    * table, not the events. */
  def transitionMatrix(df: DataFrame, key: Column, event: Column,
      order: Seq[Column], dp: Int = 6): DataFrame = {
    require(order.nonEmpty, "transitionMatrix needs ordering columns")
    val w = Window.partitionBy(key).orderBy(order: _*)
    val pairs = df
      .select(event.as("from_state"),
        lead(event, 1).over(w).as("to_state"))
      .where(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1L)).as("n"))
    val totals = Window.partitionBy(col("from_state"))
    pairs.select(col("from_state"), col("to_state"), col("n"),
      round(col("n") / sum(col("n")).over(totals), dp).as("prob"))
  }

  /** Classifier calibration (reliability diagram) + cumulative gains in
    * one pass: scores in [0,1] land in `bins` equal-width buckets; each
    * bucket reports its population, mean predicted score, observed
    * positive rate (the calibration pair), and — reading buckets from
    * the HIGHEST scores down — the cumulative share of population and
    * of positives captured so far (the gains/lift curve: how many
    * positives the top-x% of scores would harvest). Complements
    * [[aucBrier]]: AUC ranks, calibration says whether 0.8 MEANS 80%.
    *
    * Shape: one aggregation keyed by bucket (cardinality ≤ `bins`,
    * partial-agg friendly — the only corpus-width exchange); the
    * cumulative window and grand totals ride the ≤`bins`-row table. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    // clamp BOTH ends: the contract is scores in [0,1], but a stray
    // negative must not mint a phantom negative bin id (it lands in bin
    // 0, exactly as a stray >1 lands in bins-1). NULL scores are
    // EXCLUDED up front — Spark's least/greatest skip NULL arguments,
    // so an unfiltered NULL would silently clamp into the TOP bin and
    // corrupt the curve.
    val b = greatest(lit(0), least(floor(score * bins), lit(bins - 1)))
      .cast("int")
    val agg = df.where(score.isNotNull)
      .select(b.as("bin"), score.as("__s"),
        label.cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1L)).as("n"), avg(col("__s")).as("__avg_s"),
        sum(col("__y")).as("__pos"))
    val desc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg.select(col("bin"), col("n"),
        round(col("__avg_s"), dp).as("avg_score"),
        round(col("__pos") / col("n"), dp).as("obs_rate"),
        round(sum(col("n")).over(desc) / sum(col("n")).over(tot), dp)
          .as("cum_pop_share"),
        round(sum(col("__pos")).over(desc) / sum(col("__pos")).over(tot), dp)
          .as("cum_pos_share"))
      .orderBy(col("bin"))
  }

  /** Murphy (1973) decomposition of the Brier score over the same
    * equal-width score bins as [[calibrationBins]], plus the expected
    * calibration error:
    *
    *   REL = Σ n_k(p̄_k − ȳ_k)²/n   (calibration — smaller is better)
    *   RES = Σ n_k(ȳ_k − ȳ)²/n     (discrimination — larger is better)
    *   UNC = ȳ(1 − ȳ)              (irreducible base-rate term)
    *   ECE = Σ n_k|p̄_k − ȳ_k|/n
    *
    * With binned (non-constant-per-bin) forecasts the identity
    * Brier = REL − RES + UNC holds only up to the within-bin
    * forecast-variance/covariance residual — reported explicitly as
    * `residual` instead of silently absorbed, so the readout is honest
    * about the binning. One bin-keyed aggregation (≤ `bins` rows — the
    * only corpus exchange; the raw Brier rides the same pass) + 1-row
    * algebra. Rows with a NULL score OR a NULL label drop up front
    * (a non-null score with a NULL label would otherwise count in the
    * bin's n while its label skipped the sums, skewing p̄_k, ȳ_k, ECE
    * and the Brier total); returns one row. */
  def brierDecomposition(df: DataFrame, score: Column, label: Column,
      bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val b = greatest(lit(0), least(floor(score * bins), lit(bins - 1)))
      .cast("int")
    val y = label.cast("double")
    val per = df.where(score.isNotNull && label.isNotNull)
      .select(b.as("__b"), score.cast("double").as("__s"), y.as("__y"))
      .groupBy("__b")
      .agg(count(lit(1L)).as("__n"), sum(col("__s")).as("__ss"),
        sum(col("__y")).as("__sy"),
        sum((col("__s") - col("__y")) * (col("__s") - col("__y")))
          .as("__sq"))
    val pk = col("__ss") / col("__n")
    val yk = col("__sy") / col("__n")
    val tot = per.agg(sum(col("__n")).as("n"), sum(col("__sy")).as("__ty"),
      sum(col("__sq")).as("__tsq"),
      sum(col("__n") * (pk - yk) * (pk - yk)).as("__rel"),
      sum(col("__n") * abs(pk - yk)).as("__ece"),
      sum(col("__n") * yk * yk).as("__syk2"))
    val nD = col("n").cast("double")
    val ybar = col("__ty") / nD
    val brier = col("__tsq") / nD
    val rel = col("__rel") / nD
    // Σ n_k(ȳ_k − ȳ)²/n = Σ n_k ȳ_k²/n − ȳ²
    val res = col("__syk2") / nD - ybar * ybar
    val unc = ybar * (lit(1.0) - ybar)
    tot.select(col("n"),
      round(brier, dp).as("brier"),
      round(col("__ece") / nD, dp).as("ece"),
      round(rel, dp).as("reliability"),
      round(res, dp).as("resolution"),
      round(unc, dp).as("uncertainty"),
      round(brier - (rel - res + unc), dp).as("residual"))
  }

  /** Top-k selection churn between two scorers: the Jaccard overlap of
    * the two top-k sets (deterministic (score desc, id) tie-break) —
    * the RETRAINING-STABILITY readout curation pipelines need before
    * swapping a quality model: an AUC delta of 0.002 can still replace
    * 40% of the selected corpus, and this measures exactly that.
    * `expected_random` = k/n is the overlap fraction two independent
    * scorers would produce — overlap below it means the scorers
    * actively disagree about the top. Requires k ≥ 1; when n < k both
    * top sets are the whole table, so jaccard reports the actual full
    * overlap 1.0 (denominator 2·min(k,n) − n_both; the old n ≥ k guard
    * returned NULL there, which misread as undefined — ADVICE r13).
    *
    * Shape: two two-phase [[Windows.globalRowNumber]] rank passes (no
    * single-reducer sort at any n), one id-keyed equi-join of the two
    * k-row selections, 1 row out:
    * (k, n, n_both, jaccard, expected_random). */
  def topKOverlap(df: DataFrame, id: Column, scoreA: Column,
      scoreB: Column, k: Int, dp: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(id.as("__id"), scoreA.cast("double").as("__sa"),
        scoreB.cast("double").as("__sb"))
      .where(col("__id").isNotNull && col("__sa").isNotNull &&
        col("__sb").isNotNull)
      .localCheckpoint(true) // ranked twice
    val topA = Windows.globalRowNumber(base,
        Seq(col("__sa").desc, col("__id")), out = "__ra")
      .where(col("__ra") <= k).select(col("__id"))
    val topB = Windows.globalRowNumber(base,
        Seq(col("__sb").desc, col("__id")), out = "__rb")
      .where(col("__rb") <= k).select(col("__id"))
    val both = topA.join(topB, Seq("__id")).agg(count(lit(1L)).as("n_both"))
    val n = base.agg(count(lit(1L)).as("n"))
    both.crossJoin(broadcast(n)).select(
      lit(k).as("k"), col("n"), col("n_both"),
      when(col("n") > 0,
        round(col("n_both").cast("double") /
          (lit(2L) * least(lit(k.toLong), col("n")) - col("n_both")),
          dp)).as("jaccard"),
      when(col("n") > 0, round(lit(k.toDouble) / col("n"), dp))
        .as("expected_random"))
  }

  /** Per-group expected calibration error: [[brierDecomposition]]'s
    * equal-width-bin ECE and Brier computed PER SLICE (per source, per
    * language, per model version) — a pooled ECE of 0.02 routinely
    * hides a slice at 0.15 (the [[aucBrierByGroup]] lesson applied to
    * calibration). Same bin convention, same NULL-label/score drop.
    * One (group, bin) rollup (map-side partial) + a group rollup —
    * returns (grp, n, ece, brier) per populated group. */
  def eceByGroup(df: DataFrame, group: Column, score: Column,
      label: Column, bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val b = greatest(lit(0), least(floor(score * bins), lit(bins - 1)))
      .cast("int")
    val per = df.where(score.isNotNull && label.isNotNull)
      .select(group.as("grp"), b.as("__b"),
        score.cast("double").as("__s"), label.cast("double").as("__y"))
      .groupBy(col("grp"), col("__b"))
      .agg(count(lit(1L)).as("__n"), sum(col("__s")).as("__ss"),
        sum(col("__y")).as("__sy"),
        sum((col("__s") - col("__y")) * (col("__s") - col("__y")))
          .as("__sq"))
    val pk = col("__ss") / col("__n")
    val yk = col("__sy") / col("__n")
    per.groupBy("grp")
      .agg(sum(col("__n")).as("n"),
        sum(col("__n") * abs(pk - yk)).as("__ece"),
        sum(col("__sq")).as("__tsq"))
      .select(col("grp"), col("n"),
        round(col("__ece") / col("n"), dp).as("ece"),
        round(col("__tsq") / col("n"), dp).as("brier"))
  }

  /** Two-sample Poisson rate-ratio test: arm A's event rate per unit
    * exposure against arm B's —
    *
    *   z = ln(r_A/r_B) / √(1/x_A + 1/x_B),   r = Σevents / Σexposure
    *
    * (the standard log-rate-ratio form, conditional on exposures) —
    * the COUNT-metric inference beside [[powerMde]] (proportions) and
    * [[ratioMetricTest]] (continuous ratios): crashes per
    * device-day, requests per active hour, where the denominator is
    * exposure TIME, not trials. Statistics are NULL when any arm has
    * zero events or zero exposure; `reject_05` additionally needs
    * x ≥ 10 per arm (the log-normal approximation floor). ONE 4-sum
    * rollup, 1 row:
    * (x_a, x_b, t_a, t_b, rate_a, rate_b, ratio, z, reject_05). */
  def rateRatioTest(df: DataFrame, inA: Column, events: Column,
      exposure: Column, dp: Int = 6): DataFrame = {
    val a = df.where(inA.isNotNull && events.isNotNull &&
        exposure.isNotNull)
      .select(inA.cast("boolean").as("__a"),
        events.cast("double").as("__e"), exposure.cast("double").as("__t"))
      .agg(sum(when(col("__a"), col("__e"))).as("__xa"),
        sum(when(!col("__a"), col("__e"))).as("__xb"),
        sum(when(col("__a"), col("__t"))).as("__ta"),
        sum(when(!col("__a"), col("__t"))).as("__tb"))
    val ra = col("__xa") / col("__ta")
    val rb = col("__xb") / col("__tb")
    val ok = col("__xa") > 0.0 && col("__xb") > 0.0 &&
      col("__ta") > 0.0 && col("__tb") > 0.0
    val z = log(ra / rb) / sqrt(lit(1.0) / col("__xa") +
      lit(1.0) / col("__xb"))
    a.select(col("__xa").cast("long").as("x_a"),
      col("__xb").cast("long").as("x_b"),
      round(col("__ta"), dp).as("t_a"), round(col("__tb"), dp).as("t_b"),
      when(col("__ta") > 0.0, round(ra, dp)).as("rate_a"),
      when(col("__tb") > 0.0, round(rb, dp)).as("rate_b"),
      when(ok, round(ra / rb, dp)).as("ratio"),
      when(ok, round(z, dp)).as("z"),
      when(ok && col("__xa") >= 10.0 && col("__xb") >= 10.0,
        abs(z) > 1.96).as("reject_05"))
  }

  /** Spiegelhalter's Z test of calibration (Spiegelhalter 1986): under
    * perfect calibration E[(y−p)(1−2p)] = 0 with known variance
    * Σ(1−2p)²p(1−p), so
    *
    *   Z = Σ(yᵢ−pᵢ)(1−2pᵢ) / √(Σ(1−2pᵢ)² pᵢ(1−pᵢ))
    *
    * is standard normal — a SIGNIFICANCE verdict on miscalibration
    * that, unlike [[brierDecomposition]]'s ECE, needs NO binning (every
    * prediction contributes at its own p, so it cannot be gamed by
    * within-bin cancellation). The complement, not a replacement: ECE
    * localizes WHERE the curve bends; Spiegelhalter answers WHETHER the
    * deviation clears chance.
    *
    * Shape: ONE whole-corpus aggregation (3 sums, map-side partial),
    * 1 row out — nothing to shuffle but the partials at any scale.
    * Rows with NULL score or label are dropped; p ∈ {0,1} predictions
    * contribute 0 variance and 0 numerator (exactly right: a certain,
    * correct prediction says nothing about calibration noise; a
    * certain, WRONG one makes |Z| → ∞, surfaced as NULL only when the
    * TOTAL variance is 0). `reject_05` is two-sided at |Z| > 1.96,
    * NULL when n < 20 (normal approximation floor, the
    * [[wilcoxonSignedRank]] convention) or variance is 0. */
  def spiegelhalterZ(df: DataFrame, score: Column, label: Column,
      dp: Int = 6): DataFrame = {
    val p = score.cast("double")
    val y = label.cast("double")
    val a = df.where(score.isNotNull && label.isNotNull)
      .select(p.as("__p"), y.as("__y"))
      .agg(count(lit(1L)).as("n"),
        sum((col("__y") - col("__p")) * (lit(1.0) - lit(2.0) * col("__p")))
          .as("__num"),
        sum((lit(1.0) - lit(2.0) * col("__p")) *
          (lit(1.0) - lit(2.0) * col("__p")) *
          col("__p") * (lit(1.0) - col("__p"))).as("__var"))
    val z = when(col("__var").isNull || col("__var") <= 0.0,
        lit(null).cast("double"))
      .otherwise(round(col("__num") / sqrt(col("__var")), dp))
    a.select(col("n"), z.as("z"),
      when(col("n") < 20 || z.isNull, lit(null).cast("boolean"))
        .otherwise(abs(z) > 1.96).as("reject_05"))
  }

  /** Hosmer–Lemeshow goodness-of-fit test (Hosmer & Lemeshow 1980) over
    * the SAME deterministic equal-width score bins as
    * [[brierDecomposition]] / [[calibrationBins]] (the classic decile
    * form cuts on score QUANTILES; equal-width keeps the binning
    * scan-local and exactly restatable — the repo-wide calibration-bin
    * convention, noted here because HL textbooks assume deciles):
    *
    *   HL = Σ_k (O_k − E_k)² / (n_k π̄_k (1 − π̄_k)),   π̄_k = E_k/n_k
    *
    * with O_k = observed positives, E_k = summed scores in bin k,
    * referred to χ²(g−2). Bins where the expected rate is degenerate
    * (π̄_k ∈ {0,1} — zero binomial variance, the term is undefined) are
    * excluded and counted in `g_skipped`; df = g_used − 2.
    *
    * Shape: ONE corpus aggregation keyed by bin (≤ `bins` rows,
    * map-side partial) + a 1-row rollup — the [[brierDecomposition]]
    * cost envelope exactly. `reject_05` is NULL when df < 1. */
  def hosmerLemeshow(df: DataFrame, score: Column, label: Column,
      bins: Int = 10, dp: Int = 6): DataFrame = {
    require(bins > 2, s"bins must exceed 2 (df = bins used - 2), got $bins")
    val b = greatest(lit(0), least(floor(score * bins), lit(bins - 1)))
      .cast("int")
    val per = df.where(score.isNotNull && label.isNotNull)
      .select(b.as("__b"), score.cast("double").as("__s"),
        label.cast("double").as("__y"))
      .groupBy("__b")
      .agg(count(lit(1L)).as("__n"), sum(col("__s")).as("__e"),
        sum(col("__y")).as("__o"))
    val pbar = col("__e") / col("__n")
    val live = pbar > 0.0 && pbar < 1.0
    val term = (col("__o") - col("__e")) * (col("__o") - col("__e")) /
      (col("__n") * pbar * (lit(1.0) - pbar))
    val tot = per.agg(sum(col("__n")).as("n"),
      count(lit(1L)).as("__g"),
      sum(when(live, 1L).otherwise(0L)).as("__gu"),
      sum(when(live, term)).as("__hl"))
    val dfree = (col("__gu") - 2L).cast("double")
    tot.select(col("n"), col("__gu").as("g_used"),
      (col("__g") - col("__gu")).as("g_skipped"),
      round(coalesce(col("__hl"), lit(0.0)), dp).as("hl"),
      when(col("__gu") >= 3L, col("__gu") - 2L).as("df"),
      when(col("__gu") < 3L, lit(null).cast("boolean"))
        .otherwise(coalesce(col("__hl"), lit(0.0)) > chiSq95(dfree))
        .as("reject_05"))
  }

  /** Jarque–Bera normality test (Jarque & Bera 1980): are the sample's
    * skewness and excess kurtosis jointly consistent with a normal
    * distribution —
    *
    *   JB = n/6 · (g₁² + g₂²/4),  g₁ = m₃/m₂^{3/2},  g₂ = m₄/m₂² − 3
    *
    * referred to χ²(2). The NORMALITY GATE in front of every
    * moment-based verdict in the repo (t-intervals, OLS residual
    * assumptions, [[zScreenPerGroup]]): run it on residuals or metric
    * columns before trusting a normal-theory p. [[ksTest]] /
    * [[cramerVonMises]] compare two SAMPLES; JB asks one sample against
    * the normal FAMILY (any mean/variance) — a different question.
    *
    * Shape: ONE whole-corpus aggregation (5 power sums, map-side
    * partial), 1 row out; central moments recovered from raw power sums
    * on the 1-row result. Power sums of order 4 overflow doubles'
    * integer range only past |v|~2¹³ at petarow counts — acceptable for
    * score-scale inputs; pre-center wide-range inputs if m₄ precision
    * matters. `reject_05` uses the exact χ²(2) constant 5.991464547
    * (the [[chiSq95]] table arm) and is NULL when n < 20 (JB's χ²
    * approximation is notoriously slow to converge — below that the
    * verdict would be noise) or when the variance is 0. */
  def jarqueBera(df: DataFrame, value: Column, dp: Int = 6): DataFrame = {
    val v = value.cast("double")
    val a = df.where(value.isNotNull).select(v.as("__v"))
      .agg(count(lit(1L)).as("n"), sum(col("__v")).as("__s1"),
        sum(col("__v") * col("__v")).as("__s2"),
        sum(col("__v") * col("__v") * col("__v")).as("__s3"),
        sum(col("__v") * col("__v") * col("__v") * col("__v")).as("__s4"))
    val nD = col("n").cast("double")
    val m = col("__s1") / nD
    val m2 = col("__s2") / nD - m * m
    val m3 = col("__s3") / nD - lit(3.0) * m * col("__s2") / nD +
      lit(2.0) * m * m * m
    val m4 = col("__s4") / nD - lit(4.0) * m * col("__s3") / nD +
      lit(6.0) * m * m * col("__s2") / nD - lit(3.0) * m * m * m * m
    val ok = col("n") > 0L && m2 > 0.0
    val skew = when(ok, m3 / pow(m2, 1.5))
    val kurt = when(ok, m4 / (m2 * m2) - lit(3.0))
    val jb = nD / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0))
    a.select(col("n"),
      round(skew, dp).as("skewness"),
      round(kurt, dp).as("ex_kurtosis"),
      round(jb, dp).as("jb"),
      when(col("n") < 20 || jb.isNull, lit(null).cast("boolean"))
        .otherwise(jb > 5.991464547107979).as("reject_05"))
  }

  /** Isotonic (PAV) probability calibration over the same equal-width
    * score bins as [[calibrationBins]]: per bin, the observed positive
    * rate is replaced by the pool-adjacent-violators fit — the unique
    * monotone non-decreasing step function minimizing weighted squared
    * error (Barlow et al., Statistical Inference under Order
    * Restrictions, 1972). Returns (bin, n, avg_score, raw_rate,
    * pav_rate) for the bins that are populated.
    *
    * Shape: ONE corpus aggregation keyed by bin (≤ `bins` rows, partial
    * aggregated map-side); PAV itself runs on the DRIVER over the
    * collected ≤`bins`-row table — the IPF bounded-driver-step
    * discipline. The fit is differentially checkable in SQL via the
    * minimax characterization pav(i) = max_{h≤i} min_{k≥i} avg(h..k),
    * which the oracle restates over the same bin table. NULL scores are
    * excluded up front (least/greatest would clamp them into a bin). */
  /** Pool-adjacent-violators over (weight, weighted-sum) pairs in their
    * given order: returns the fitted per-position values — the unique
    * monotone non-decreasing weighted-least-squares fit. Exposed for
    * property fuzzing (monotone / mass-preserving / minimax identity);
    * [[isotonicCalibrate]] is the Spark face. */
  private[graft] def pav(weights: Seq[Double],
      sums: Seq[Double]): Seq[Double] = {
    require(weights.length == sums.length && weights.forall(_ > 0),
      "pav needs positive weights aligned with sums")
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Double, Int)] // (weight, sum, member count)
    weights.zip(sums).foreach { case (w0, s0) =>
      var cur = (w0, s0, 1)
      while (blocks.nonEmpty &&
          blocks.last._2 / blocks.last._1 > cur._2 / cur._1) {
        val p = blocks.remove(blocks.length - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3 + cur._3)
      }
      blocks += cur
    }
    blocks.toSeq.flatMap { case (w, s0, k) => Seq.fill(k)(s0 / w) }
  }

  def isotonicCalibrate(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val b = greatest(lit(0), least(floor(score * bins), lit(bins - 1)))
      .cast("int")
    val agg = df.where(score.isNotNull)
      .select(b.as("bin"), score.as("__s"), label.cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1L)).as("n"), avg(col("__s")).as("__avg_s"),
        sum(col("__y")).as("__pos"))
      .orderBy(col("bin"))
    val rows = agg.collect().map(r => (r.getAs[Int]("bin"),
      r.getAs[Long]("n"), r.getAs[Double]("__avg_s"),
      r.getAs[Double]("__pos")))
    val fitted = pav(rows.map(_._2.toDouble), rows.map(_._4))
    val out = rows.zip(fitted).map { case ((bin, n, avgS, pos), f) =>
      (bin, n, avgS, pos / n, f)
    }.toSeq
    df.sparkSession.createDataFrame(out)
      .toDF("bin", "n", "avg_score", "raw_rate", "pav_rate")
  }

  /** Theil–Sen robust trend estimator per key: the slope is the MEDIAN
    * of all pairwise slopes (yⱼ−yᵢ)/(xⱼ−xᵢ) over xᵢ<xⱼ — up to ~29%
    * contamination leaves it standing where OLS ([[regressionByKey]])
    * follows a single corrupted point; the intercept is median(y − m·x).
    *
    * Shape: the pair set is built by a per-key equi-self-join — O(nₖ²)
    * rows per key BY DEFINITION of the estimator, so the contract is
    * bounded per-key series (pre-aggregate to daily/bucket grain first,
    * as the oracle query does: 30 daily points → 435 pairs). The join is
    * keyed (no cartesian): keys shuffle once, pairs never leave their
    * key's partition, and the medians are exact per-key percentiles over
    * the pair table. */
  def theilSenByKey(df: DataFrame, key: Column, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val pts = df.select(key.as("k"), x.cast("double").as("__x"),
      y.cast("double").as("__y"))
    val a = pts.select(col("k"), col("__x").as("__xa"), col("__y").as("__ya"))
    val bb = pts.select(col("k"), col("__x").as("__xb"), col("__y").as("__yb"))
    val slopes = a.join(bb, "k").where(col("__xa") < col("__xb"))
      .select(col("k"),
        ((col("__yb") - col("__ya")) / (col("__xb") - col("__xa"))).as("__m"))
    // r17: per-key medians by within-group rank selection (bit-identical
    // to the built-in — GroupedPercentileRankSpec), NOT the built-in's
    // per-group boxed map: the pair table is O(nₖ²) rows per key, so the
    // map was a distinct-slopes-sized aggregation buffer per key — the
    // exact §5 hazard this family's contract worries about. n_pairs
    // counts ALL pairs (NULL slopes included), as count(1) did.
    val med = exactPercentileByGroup(slopes, col("k"), col("__m"),
      Seq(0.5 -> "__slope")).withColumnRenamed("__g", "k")
    val m = slopes.groupBy("k").agg(count(lit(1L)).as("n_pairs"))
      .join(med, "k")
    val ic = exactPercentileByGroup(pts.join(m, "k"), col("k"),
        col("__y") - col("__slope") * col("__x"), Seq(0.5 -> "__ic"))
      .withColumnRenamed("__g", "k")
    m.join(ic, "k")
      .select(col("k").as("key"), round(col("__slope"), dp).as("slope"),
        round(col("__ic"), dp).as("intercept"), col("n_pairs"))
  }

  /** Mann–Kendall trend test per key (Mann 1945; Kendall 1975): IS
    * there a monotone trend at all — the SIGNIFICANCE companion of
    * [[theilSenByKey]], which estimates the slope but carries no
    * verdict. S = Σ_{i<j} sgn(vⱼ−vᵢ) over time order, the tie-corrected
    * variance Var(S) = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18, and the
    * continuity-corrected z = (S∓1)/√Var(S). Distribution-free: quality
    * drifting across ingestion months registers regardless of the
    * metric's shape, where OLS-slope t-tests assume normal residuals.
    *
    * Shape: the [[theilSenByKey]] contract exactly — the pair set is a
    * per-key equi-self-join (O(nₖ²) rows per key BY DEFINITION, so
    * pre-aggregate to a bounded time grain first); keys shuffle once,
    * pairs never leave their key's partition; n and the tie term are
    * per-key rollups. Points sharing a timestamp within a key form no
    * pair (strict `<`) — the estimator assumes one value per time, so
    * aggregate to the grain first. `reject_05` (two-sided, |z| > 1.96)
    * is NULL when n < 10 (the normal approximation floor for S) or
    * Var(S) = 0 (all values tied). */
  def mannKendallByKey(df: DataFrame, key: Column, t: Column, v: Column,
      dp: Int = 6): DataFrame = {
    // NULL t/v filtered like the sibling per-key tests (a NULL v makes
    // signum NULL and silently shrinks S); single-point keys survive
    // the left join below with S = 0, Var(S) = 0, NULL verdict —
    // previously the inner join dropped them entirely (ADVICE r13).
    val pts = df.select(key.as("k"), t.cast("double").as("__t"),
        v.cast("double").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val a = pts.select(col("k"), col("__t").as("__ta"), col("__v").as("__va"))
    val b = pts.select(col("k"), col("__t").as("__tb"), col("__v").as("__vb"))
    val sTab = a.join(b, "k").where(col("__ta") < col("__tb"))
      .groupBy("k").agg(sum(signum(col("__vb") - col("__va"))).as("__s"))
    val nTab = pts.groupBy("k").agg(count(lit(1L)).as("n"))
    val tieTab = pts.groupBy(col("k"), col("__v"))
      .agg(count(lit(1L)).as("__c"))
      .groupBy("k")
      .agg(sum(col("__c").cast("double") * (col("__c") - 1) *
        (lit(2) * col("__c") + 5)).as("__tt"))
    val nD = col("n").cast("double")
    val vs = (nD * (nD - 1) * (lit(2) * nD + 5) - col("__tt")) / lit(18.0)
    val s0 = coalesce(col("__s"), lit(0.0)) // zero-pair key: S = 0
    val zRaw = when(s0 > 0, (s0 - 1) / sqrt(vs))
      .when(s0 < 0, (s0 + 1) / sqrt(vs))
      .otherwise(lit(0.0))
    val z = when(vs <= 0.0, lit(null).cast("double")).otherwise(zRaw)
    nTab.join(sTab, Seq("k"), "left").join(tieTab, "k")
      .select(col("k").as("key"), col("n"),
        round(s0, dp).as("s"),
        round(vs, dp).as("var_s"),
        round(z, dp).as("z"),
        when(col("n") < 10 || z.isNull, lit(null).cast("boolean"))
          .otherwise(abs(z) > 1.96).as("reject_05"))
  }

  /** RFM segmentation (Hughes 1994 — the classic customer-value grid):
    * per entity, Recency (newest event vs `asOfEpoch`), Frequency
    * (event count) and Monetary (amount sum) each land in `tiles`
    * equal-population tiers; returns the populated (r, f, m) cells with
    * their populations — the marketing/churn/LTV triage table.
    *
    * Tier assignment is ntile over (metric, entity-id) — the id
    * tie-break makes equal-population cuts DETERMINISTIC (any engine
    * reproduces them exactly). Recency tier 1 = most recent (smallest
    * lag), f/m tier `tiles` = highest.
    *
    * Shape: one entity-keyed aggregation (the only corpus-width
    * exchange), then tier assignment. The DEFAULT (`exactTiles =
    * false`) path is the scale-safe one: tier boundaries come from one
    * mergeable approx_percentile pass over the entity table and each
    * entity lands in its tier by comparing against the (tiles-1)
    * broadcast cut values — no global sort at any cardinality; entities
    * sharing a boundary value share a tier (value-based, so true ties
    * cannot straddle a cut). `exactTiles = true` is the audit opt-in:
    * exact equal-population ntile over three global windows — a
    * single-reducer sort, so dimension-table-scale inputs only (it is
    * what the DuckDB oracle restates). Both paths agree whenever the
    * metric values are tie-free and the population divides evenly.
    * NULL metrics: pre-filter them — an entity with a NULL metric
    * tiers as 1 on the boundary path (NULL comparisons fall to the
    * otherwise-0 branch) but last under ntile's NULLS LAST; the
    * all-NULL case fails loudly at the boundary job. */
  def rfmSegments(df: DataFrame, entity: Column, ts: Column, amount: Column,
      asOfEpoch: Long, tiles: Int = 4, amountDp: Int = 2,
      exactTiles: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    // the monetary SUM is ranked at `amountDp` decimals: floating
    // accumulation order must not let two mathematically-equal totals
    // compare differently (the id tie-break then owns true ties)
    val per = df.groupBy(entity.as("__e"))
      .agg((lit(asOfEpoch) - max(unix_timestamp(ts))).as("__lag"),
        count(lit(1L)).as("__f"), round(sum(amount), amountDp).as("__m"))
    val tiered =
      if (exactTiles) {
        val r = ntile(tiles).over(Window.orderBy(col("__lag"), col("__e")))
        val f = ntile(tiles).over(Window.orderBy(col("__f").desc, col("__e")))
        val m = ntile(tiles).over(Window.orderBy(col("__m").desc, col("__e")))
        per.select(r.as("r_tier"), f.as("f_tier"), m.as("m_tier"))
      } else {
        // desc-ordered tiers (f/m: tier 1 = highest) ride the SAME
        // ascending-boundary helper by negating the metric
        val probes = lit((1 until tiles).map(_.toDouble / tiles).toArray)
        val cuts = per.agg(
          approx_percentile(col("__lag").cast("double"), probes,
            lit(accuracy)).as("__rb"),
          approx_percentile(-col("__f").cast("double"), probes,
            lit(accuracy)).as("__fb"),
          approx_percentile(-col("__m").cast("double"), probes,
            lit(accuracy)).as("__mb")).head()
        require((0 to 2).forall(i => !cuts.isNullAt(i)),
          "rfmSegments: a tier metric aggregated to NULL — empty input " +
            "or an all-NULL ts/amount column")
        def tierOf(v: Column, bs: Seq[Double]): Column =
          bs.map(b => when(v > lit(b), 1).otherwise(0))
            .reduce(_ + _) + lit(1)
        def bs(i: Int): Seq[Double] = cuts.getSeq[Double](i)
        per.select(
          tierOf(col("__lag").cast("double"), bs(0)).as("r_tier"),
          tierOf(-col("__f").cast("double"), bs(1)).as("f_tier"),
          tierOf(-col("__m").cast("double"), bs(2)).as("m_tier"))
      }
    tiered.groupBy("r_tier", "f_tier", "m_tier")
      .agg(count(lit(1L)).as("n_entities"))
  }

  /** Per-key event-timing burstiness signals — the behavioral bot/spam
    * screen run before human-activity data enters a training corpus:
    * machine traffic shows up as near-zero gap variance (metronome
    * retries), single-burst concentration (one minute owns the
    * session), or abnormal volume. Emits per key: event count, span,
    * mean/stddev/CV of inter-event gaps, and the busiest minute's share
    * of all events. Thresholds are the caller's policy; this computes
    * the evidence.
    *
    * Shape: ONE key-partitioned window pass (lag) fused with the
    * per-key aggregate, plus a (key, minute) sub-aggregate for the
    * burst share — both exchanges are key-/minute-bounded. Gap stats
    * need ≥2 events; keys below that emit NULL gap columns (volume
    * columns still real). */
  def burstiness(df: DataFrame, key: Column, ts: Column,
      dp: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val gaps = df.select(key.as("__k"), unix_timestamp(ts).as("__t"))
      .withColumn("__gap", col("__t") - lag(col("__t"), 1).over(w))
    val perKey = gaps.groupBy(col("__k"))
      .agg(count(lit(1L)).as("n_events"),
        (max(col("__t")) - min(col("__t"))).as("span_sec"),
        round(avg(col("__gap")), dp).as("mean_gap_sec"),
        round(stddev_samp(col("__gap")), dp).as("sd_gap_sec"),
        // cv from the UNROUNDED moments (rounding first would compound)
        round(stddev_samp(col("__gap")) / avg(col("__gap")), dp).as("gap_cv"))
    val burst = gaps
      .groupBy(col("__k"), (floor(col("__t") / 60) * 60).as("__min"))
      .agg(count(lit(1L)).as("__c"))
      .groupBy(col("__k"))
      .agg(max(col("__c")).as("__peak"))
    perKey.join(burst, "__k")
      .select(col("__k").as("key"), col("n_events"), col("span_sec"),
        col("mean_gap_sec"), col("sd_gap_sec"), col("gap_cv"),
        round(col("__peak") / col("n_events").cast("double"), dp)
          .as("peak_minute_share"))
  }

  /** Day-of-week seasonal baseline + deseasonalization audit: daily
    * totals of `value`, a per-weekday median/mean profile (the robust
    * seasonal component), and ONE verdict scalar — the residual
    * variance ratio var(daily − weekday median) / var(daily). A ratio
    * well under 1 says the weekday profile explains real structure;
    * subtract it before feeding CUSUM/z-score monitors ([[cusum]],
    * [[rollingAnomalies]]) or weekly seasonality re-fires them every
    * Monday. Dow follows Spark's `dayofweek` (1 = Sunday).
    *
    * Shape: one date-keyed aggregation is the only corpus-width
    * exchange; the profile, residual join (7-row broadcast) and
    * variance rollup all ride the |days|-bounded daily table. Daily
    * sums round at `sumDp` BEFORE the profile so floating accumulation
    * order cannot move a median. */
  def seasonalBaseline(df: DataFrame, ts: Column, value: Column,
      sumDp: Int = 4, dp: Int = 6): DataFrame = {
    val daily = df.groupBy(to_date(ts).as("__d"))
      .agg(round(sum(value), sumDp).as("__v"))
      .withColumn("__dow", dayofweek(col("__d")))
    // r17: the weekday median by within-group rank selection
    // (bit-identical — GroupedPercentileRankSpec) instead of the
    // built-in's per-group boxed map; count/mean stay one rollup and
    // join the 7-row median table.
    val med = exactPercentileByGroup(daily, col("__dow"), col("__v"),
      Seq(0.5 -> "__med")).withColumnRenamed("__g", "__dow")
    val prof = daily.groupBy(col("__dow"))
      .agg(count(lit(1L)).as("n_days"),
        round(avg(col("__v")), dp).as("mean_value"))
      .join(med, "__dow")
      .select(col("__dow"), col("n_days"),
        round(col("__med"), dp).as("med_value"), col("mean_value"))
    val ratio = daily
      .join(broadcast(prof.select(col("__dow"), col("med_value"))), "__dow")
      .agg(round(
        var_samp(col("__v") - col("med_value")) / var_samp(col("__v")), dp)
        .as("resid_var_ratio"))
    prof.crossJoin(ratio)
      .select(col("__dow").as("dow"), col("n_days"), col("med_value"),
        col("mean_value"), col("resid_var_ratio"))
  }

  /** Exact weighted quantiles per key: the smallest value whose
    * cumulative weight reaches q·(total weight) — duration-weighted
    * latency percentiles, token-weighted doc-length medians,
    * importance-weighted score cuts; plain quantiles silently answer a
    * different question when rows carry unequal mass.
    *
    * Shape: ONE key-partitioned window pass (cumulative weight ordered
    * by value — ties share a value, so tie order cannot change the
    * answer) fused into a per-key conditional-min aggregate; no
    * self-joins, no per-q passes. Exact by construction — for sketched
    * weighted quantiles at unbounded key cardinality, feed weights into
    * the KLL path instead. */
  def weightedQuantiles(df: DataFrame, key: Column, value: Column,
      weight: Column, qs: Seq[Double], dp: Int = 6): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    val w = Window.partitionBy(col("__k")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__k"))
    val cum = df.select(key.as("__k"), value.cast("double").as("__v"),
        weight.cast("double").as("__w"))
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__tw", sum(col("__w")).over(tot))
    val aggs = qs.map(q =>
      round(min(when(col("__cw") >= col("__tw") * q, col("__v"))), dp)
        .as(s"wq_${(q * 100).round}")) :+
      round(sum(col("__w")), dp).as("total_weight")
    cum.groupBy(col("__k").as("key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Sessionization with BOTH an idle-gap break and a max-duration cap:
    * a session ends after `gapSec` of silence OR at `capSec` from its
    * start (long-running machine sessions — exactly the traffic the
    * burstiness screen flags — otherwise produce unbounded sessions
    * that poison engagement metrics). The cap splits a gap-session at
    * fixed `capSec` offsets from its start. Returns per-key session
    * summaries.
    *
    * Shape: two window passes over the SAME key partitioning (gap
    * detection, then offset-within-session) — one exchange — and a
    * (key, session) aggregate. */
  def cappedSessionStats(df: DataFrame, key: Column, ts: Column,
      gapSec: Long, capSec: Long): DataFrame = {
    require(gapSec > 0 && capSec > 0, "gapSec and capSec must be positive")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val ws = Window.partitionBy(col("__k"), col("__gs"))
    val marked = df.select(key.as("__k"), unix_timestamp(ts).as("__t"))
      .withColumn("__brk",
        when(col("__t") - lag(col("__t"), 1).over(w) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("__gs", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__sub",
        floor((col("__t") - min(col("__t")).over(ws)) / capSec))
    marked.groupBy(col("__k"), col("__gs"), col("__sub"))
      .agg(count(lit(1L)).as("__n"),
        (max(col("__t")) - min(col("__t"))).as("__len"))
      .groupBy(col("__k").as("key"))
      .agg(count(lit(1L)).as("n_sessions"),
        sum(col("__n")).as("n_events"),
        max(col("__n")).as("max_session_events"),
        max(col("__len")).as("max_session_sec"))
  }

  /** Optimal binary split of a numeric feature against a binary label
    * by information gain — the decision-stump / supervised-binning
    * primitive (feature triage before model training, monotone-binning
    * seeds, leakage sniffing: a near-perfect split of the label by one
    * feature is usually a leak). Candidate thresholds are the feature's
    * DISTINCT values ("x ≤ v" splits); returns the best row:
    * (threshold, gain, n_left, n_right) with ties to the smallest
    * threshold.
    *
    * `buckets > 0` quantizes candidate thresholds to that many
    * equi-width feature buckets first (threshold = the largest OBSERVED
    * value in the bucket, so "x ≤ threshold" stays exact) — the
    * one-flag scale-safe form for continuous features, where the
    * distinct-value table is otherwise corpus-sized. 0 = every distinct
    * value (exact).
    *
    * Shape: one (value)-keyed aggregation (the only corpus exchange —
    * cardinality = |distinct feature values| or `buckets`), a single
    * two-phase [[Windows.globalCumSums]] over that value table (no
    * single-reducer window even when the feature is continuous), grand
    * totals broadcast from a 1-row aggregate, entropy algebra in-scan,
    * one TakeOrdered(1). */
  def bestSplit(df: DataFrame, feature: Column, label: Column,
      dp: Int = 6, buckets: Int = 0): DataFrame = {
    val base = df.select(feature.cast("double").as("__v"),
      label.cast("double").as("__y"))
    val cells =
      if (buckets <= 0)
        base.groupBy(col("__v"))
          .agg(count(lit(1L)).cast("double").as("__n"),
            sum(col("__y")).as("__p"))
      else {
        val bounds = base.agg(min(col("__v")).as("__lo"),
          max(col("__v")).as("__hi"))
        base.crossJoin(broadcast(bounds))
          .select(col("__v"), col("__y"),
            when(col("__hi") === col("__lo"), lit(0)).otherwise(
              least(lit(buckets - 1), floor((col("__v") - col("__lo")) /
                ((col("__hi") - col("__lo")) / buckets)).cast("int")))
              .as("__bin"))
          .groupBy(col("__bin"))
          .agg(max(col("__v")).as("__v"),
            count(lit(1L)).cast("double").as("__n"),
            sum(col("__y")).as("__p"))
          .drop("__bin")
      }
    def ent(p: Column): Column =
      when(p <= 0 || p >= 1, lit(0.0))
        .otherwise(-(p * log(p) + (lit(1.0) - p) * log(lit(1.0) - p)))
    val totals = cells.agg(sum(col("__n")).as("__nt"),
      sum(col("__p")).as("__pt"))
    val cum = Windows.globalCumSums(cells, Seq(col("__v")),
        Seq(col("__n") -> "__nl", col("__p") -> "__pl"))
      .crossJoin(broadcast(totals))
      .where(col("__nl") < col("__nt")) // the top value is not a split
    cum.select(col("__v").as("threshold"),
        round(ent(col("__pt") / col("__nt")) -
          (col("__nl") / col("__nt")) * ent(col("__pl") / col("__nl")) -
          ((col("__nt") - col("__nl")) / col("__nt")) *
            ent((col("__pt") - col("__pl")) / (col("__nt") - col("__nl"))), dp)
          .as("gain"),
        col("__nl").cast("long").as("n_left"),
        (col("__nt") - col("__nl")).cast("long").as("n_right"),
        round(col("__pl") / col("__nl"), dp).as("pos_rate_left"),
        round((col("__pt") - col("__pl")) / (col("__nt") - col("__nl")), dp)
          .as("pos_rate_right"))
      .orderBy(col("gain").desc, col("threshold"))
      .limit(1)
  }

  /** Linear interpolation of missing buckets inside each key's observed
    * span — [[regularizeSeries]]' forward-fill sibling for magnitudes
    * (fill a gauge between readings; ffill is right for states, linear
    * for levels). Dense grid generated IN the scan from each key's
    * 1-row span (no calendar cross join); each missing bucket takes
    * prev + (next − prev)·(distance/gap width). Returns (key, bucket,
    * value, is_observed).
    *
    * Shape: one key-keyed exchange carries the span aggregate, the
    * grid explode and the two fill windows (last-non-null backward,
    * first-non-null forward over the same partitioning). */
  def interpolateSeries(obs: DataFrame, key: Column, bucketCol: Column,
      value: Column, step: Long, dp: Int = 6): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val o = obs.select(key.as("__k"), bucketCol.cast("long").as("__b"),
      value.cast("double").as("__x"))
    val grid = o.groupBy(col("__k"))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col("__k"),
        explode(sequence(col("__lo"), col("__hi"), lit(step))).as("__b"))
    val joined = grid.join(o, Seq("__k", "__b"), "left")
    val back = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = joined
      .withColumn("__pv", last(col("__x"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(when(col("__x").isNotNull, col("__b")),
        ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__x"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", first(when(col("__x").isNotNull, col("__b")),
        ignoreNulls = true).over(fwd))
    filled.select(col("__k").as("key"), col("__b").as("bucket"),
      round(when(col("__x").isNotNull, col("__x"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          (col("__b") - col("__pb")) / (col("__nb") - col("__pb"))), dp)
        .as("value"),
      col("__x").isNotNull.as("is_observed"))
  }

  /** OHLC candlestick bars per (group, time bucket): open/high/low/close
    * + count/total/mean — the standard event-series summarization for
    * metering, pricing, and telemetry roll-ups. Open/close are
    * deterministic under timestamp ties via a (ts, tie) composite order
    * (min_by/max_by over a struct).
    *
    * Scale shape: ONE groupBy over (group, bucket) — all seven outputs
    * are map-side-partial built-in aggregates; no windows, no
    * self-joins. */
  def ohlcBars(df: DataFrame, group: Column, ts: Column, tie: Column,
      value: Column, bucket: String = "day", dp: Int = 6): DataFrame = {
    val v = value.cast("double")
    val ord = struct(ts, tie)
    df.groupBy(date_trunc(bucket, ts).as("bucket"), group.as("grp"))
      .agg(count(lit(1L)).as("n"),
        round(min_by(v, ord), dp).as("open"),
        round(max(v), dp).as("high"),
        round(min(v), dp).as("low"),
        round(max_by(v, ord), dp).as("close"),
        round(sum(v), dp).as("total"),
        round(avg(v), dp).as("mean"))
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE scan: a
    * single aggregate computes every var_pop/covar_pop (k + k(k−1)/2
    * codegen'd columns, map-side partial), then the bounded k×k result
    * assembles driver-side from the 1-row frame — the data is never
    * re-scanned per pair, which is what a corr()-per-pair loop would
    * cost. Constant columns yield NULL correlations (no 0/0), the
    * same guard discipline as [[heapsFit]]. Output: one row per
    * unordered pair (col_a < col_b by position), ordered. */
  def corrMatrix(df: DataFrame, cols: Seq[String], dp: Int = 6): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "corrMatrix columns must be distinct")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => var_pop(col(c).cast("double")).as(s"__v_$c")) ++
      pairs.map { case (a, b) =>
        covar_pop(col(a).cast("double"), col(b).cast("double")).as(s"__c_${a}_$b")
      } :+ count(lit(1L)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    pairs.map { case (a, b) =>
      val deg = col(s"__v_$a").isNull || col(s"__v_$b").isNull ||
        col(s"__v_$a") * col(s"__v_$b") === 0.0
      one.select(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        when(deg, lit(null).cast("double"))
          .otherwise(round(col(s"__c_${a}_$b") /
            sqrt(col(s"__v_$a") * col(s"__v_$b")), dp)).as("corr"))
    }.reduce(_ unionByName _).orderBy("col_a", "col_b")
  }

  /** Split-conformal coverage audit (Papadopoulos et al. 2002; Vovk's
    * inductive conformal convention, Angelopoulos & Bates 2023
    * tutorial): a deterministic md5-coin calibration half fixes the
    * conformal quantile q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    * nonconformity |label − pred|, and every SLICE of the held-out
    * half is audited against the marginal guarantee — per-group
    * coverage ≥ 1−α is what exchangeability promises ON AVERAGE, so a
    * slice far below target is direct evidence the model's errors are
    * not exchangeable across that slice (the conditional-coverage gap
    * every conformal deployment has to monitor).
    *
    * Output per group: (grp, n_test, coverage, covered — coverage ≥
    * 1−α on the unrounded fraction — qhat, target). q̂ = +∞ when
    * ⌈(n_cal+1)(1−α)⌉ > n_cal (calibration too small for the level:
    * the honest infinite interval, coverage 1 everywhere).
    *
    * Shape: split is per-row Column math ([[graft.ops.DataPrep
    * .hashBucket]] md5 coin — replayable in SQL); q̂ is ONE two-phase
    * [[Windows.globalRowNumber]] rank pass + a 1-row driver read (the
    * [[regressionInfluence]] bounded-driver discipline); the audit is
    * one group rollup with q̂ broadcast as a literal. */
  def conformalCoverage(df: DataFrame, id: Column, group: Column,
      pred: Column, label: Column, alpha: Double = 0.1,
      calibFrac: Double = 0.5, dp: Int = 6): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(calibFrac > 0 && calibFrac < 1,
      s"calibFrac in (0,1), got $calibFrac")
    // NOT checkpointed: the three consumers (calibration count, rank
    // pass, test audit) re-derive from the columnar scan, which at
    // 1M-row sf0.1 beats materializing the full frame (6.0s → 3.2s
    // incl. warmup, r14 in-session); determinism needs no pinning —
    // the md5 split and |label − pred| are pure row functions
    val base = df.select(id.as("__id"), group.as("grp"),
        abs(label.cast("double") - pred.cast("double")).as("__nc"))
      .where(col("__nc").isNotNull)
    val thr = math.round(calibFrac * 1000).toInt
    val coin = graft.ops.DataPrep.hashBucket(col("__id"), 1000) < thr
    val calib = base.where(coin)
    val test = base.where(!coin)
    val nCal = calib.count()
    require(nCal > 0, "empty calibration split")
    // k in EXACT decimal arithmetic: FP (1 - 0.2) is the double just
    // above 0.8, so math.ceil((n+1)*(1-alpha)) lands one rank high
    // whenever (n+1)(1-alpha) is an exact integer — caught against the
    // DuckDB restatement, whose 0.8 literal is a DECIMAL
    val k = (BigDecimal(nCal + 1) * (BigDecimal(1) - BigDecimal(alpha.toString)))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    val qhat =
      if (k > nCal) Double.PositiveInfinity
      else Windows.globalRowNumber(calib,
          Seq(col("__nc"), col("__id")), out = "__rn")
        .where(col("__rn") === k).head().getAs[Double]("__nc")
    val cov = avg(when(col("__nc") <= qhat, 1.0).otherwise(0.0))
    test.groupBy("grp")
      .agg(count(lit(1L)).as("n_test"), cov.as("__cov"))
      .select(col("grp"), col("n_test"),
        round(col("__cov"), dp).as("coverage"),
        (col("__cov") >= 1 - alpha).as("covered"),
        round(lit(qhat), dp).as("qhat"),
        lit(1 - alpha).as("target"))
      .orderBy("grp")
  }

  /** Empirical-Bayes (James–Stein) shrinkage of per-group MEANS toward
    * the grand mean (Efron & Morris 1975; the one-way random-effects
    * MoM estimator, Searle et al.) — the continuous companion of
    * [[ebShrinkage]]'s Beta-binomial RATE shrinkage: a small group's noisy mean borrows
    * strength from the corpus — THE fix for per-source quality scores
    * where a 30-doc source's raw mean whipsaws while a 30k-doc
    * source's barely moves. τ̂² = max(0, (SSB − (K−1)σ̂²) /
    * (N − Σn²/N)) with σ̂² the pooled within-group variance
    * SSW/(N−K); shrink weight B_k = (σ̂²/n_k)/(σ̂²/n_k + τ̂²);
    * shrunk_k = B_k·ȳ + (1−B_k)·ȳ_k. τ̂² = 0 (all signal is noise)
    * collapses every group to the grand mean; τ̂² large leaves raw
    * means alone. shrunk/weight are NULL when K < 3 or N ≤ K (no
    * within-group df).
    *
    * Shape: ONE per-key moment rollup (map-side partial) + a 1-row
    * global reduce of those K rows broadcast back — the corpus is
    * scanned once, the K-row table twice; no windows, no per-group
    * passes. */
  def ebShrinkMeans(df: DataFrame, key: Column, value: Column,
      dp: Int = 6): DataFrame = {
    val per = df.select(key.as("k"), value.cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy("k")
      .agg(count(lit(1L)).as("n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__ss"))
    val nD = col("n").cast("double")
    val tot = per.agg(
      sum(col("n")).as("__N"), count(lit(1L)).as("__K"),
      sum(col("__s")).as("__S"),
      sum(col("__ss") - col("__s") * col("__s") / nD).as("__ssw"),
      sum(col("__s") * col("__s") / nD).as("__sb0"),
      sum(nD * nD).as("__n2"))
    // the join-back side gets fresh attribute names: tot's plan subtree
    // contains per's attributes, and a crossJoin of per with an
    // aggregate-of-per makes bare col("__s") ambiguous at analysis
    val perR = per.select(col("k").as("key"), col("n"),
      col("__s").as("__ps"), col("__ss").as("__pss"))
    val joined = perR.crossJoin(broadcast(tot))
    val pn = col("n").cast("double")
    val bigN = col("__N").cast("double")
    val kD = col("__K").cast("double")
    val gm = col("__S") / bigN
    val sigma2 = col("__ssw") / (bigN - kD)           // pooled within
    val ssb = col("__sb0") - col("__S") * col("__S") / bigN
    val tau2 = greatest(lit(0.0),
      (ssb - (kD - 1) * sigma2) / (bigN - col("__n2") / bigN))
    val ok = col("__K") >= 3 && col("__N") > col("__K")
    // constant data: σ²=τ²=0 → define B=1 (full shrink to the grand
    // mean, which equals every raw mean) instead of 0/0
    val denom = sigma2 / pn + tau2
    val b = when(denom === 0.0, lit(1.0)).otherwise((sigma2 / pn) / denom)
    val mean = col("__ps") / pn
    joined.select(col("key"), col("n"),
        round(mean, dp).as("mean"),
        when(ok, round(b * gm + (lit(1.0) - b) * mean, dp)).as("shrunk"),
        when(ok, round(b, dp)).as("weight"),
        when(ok, round(gm, dp)).as("grand_mean"))
      .orderBy("key")
  }
}
