package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators: deterministic dataset splits and
  * sequence packing — the two assignment problems every LLM-corpus
  * pipeline hits between curation and the trainer.
  *
  * Both are per-row / windowed Column math: no joins, no driver-side
  * state, and (for splits) not even a shuffle — they run inside the scan
  * at any corpus size.
  */
object DataPrep {

  /** Deterministic hash bucket in [0, buckets): the first 4 hex chars of
    * md5(key as string). Unlike `sample()`/`randomSplit()`, the
    * assignment is a pure function of the KEY — stable across engines,
    * re-runs, cluster sizes and row order, so a corpus can be re-split
    * identically years later. md5 is engine-portable (same digest
    * everywhere), which is what makes the split oracle-checkable. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 0x10000, s"buckets must be in (0, 65536], got $buckets")
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % buckets
  }

  /** Label each row train/valid/test (or any split list) by hash bucket.
    * `fractions` are (label, fraction) in order, summing to 1.
    *
    * Leakage control: pass a GROUP column as `key` (source, author,
    * near-dup cluster id) and every row of that group lands in the same
    * split — splitting by row id instead leaks near-identical documents
    * across train and eval. Per-row Column math, zero shuffles. */
  def hashSplit(df: DataFrame, key: Column, fractions: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val b = hashBucket(key, 1000)
    val thresholds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(x => math.round(x * 1000).toInt)
    val label = fractions.map(_._1).zip(thresholds)
      .foldLeft(Option.empty[Column]) {
        case (None, (name, t)) => Some(when(b < t, name))
        case (Some(c), (name, t)) => Some(c.when(b < t, name))
      }.get
    df.withColumn(splitCol, label)
  }

  /** Deterministic k-fold cross-validation assignment: fold =
    * [[hashBucket]](key, k) — a pure function of the KEY, so folds are
    * stable across engines/re-runs/cluster sizes and reproducible
    * without storing the assignment. As with [[hashSplit]], pass a
    * GROUP key (source, author, near-dup cluster id) so correlated
    * rows share a fold instead of leaking across train/eval at every
    * rotation. Per-row Column math, zero shuffles. */
  def kFold(df: DataFrame, key: Column, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 0x10000, s"k must be in [2, 65536], got $k")
    df.withColumn(foldCol, hashBucket(key, k))
  }

  /** Deterministic in-corpus negative sampling for contrastive
    * training: order ids on the md5 HASH RING and give each anchor the
    * next `k` ids clockwise (wrapping) — negatives that are uniform
    * w.r.t. content (hash order is content-blind), reproducible across
    * engines/re-runs/partitionings (no `rand()`), and regenerable
    * instead of stored. Returns (id, neg_id, off) with off ∈ [1, k];
    * every anchor gets exactly min(k, n−1) negatives, never itself.
    *
    * Shape: one two-phase global rank ([[graft.ops.Windows
    * .globalRowNumber]] over the md5 order — no single-reducer sort),
    * an in-scan explode of the k offsets, and ONE rank equi-join;
    * nothing all-pairs at any corpus size. */
  def ringNegatives(df: DataFrame, id: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(id.as("id")).distinct()
    val ranked = Windows.globalRowNumber(base,
        Seq(md5(col("id").cast("string")), col("id")), "__r")
      .localCheckpoint(true) // read twice: anchors + candidates
    val n = ranked.agg(count(lit(1L)).as("__n"))
    val anchors = ranked.crossJoin(broadcast(n))
      .select(col("id"), col("__r"), col("__n"),
        explode(sequence(lit(1L), lit(k.toLong))).as("off"))
      .where(col("off") < col("__n")) // n <= k: only n-1 distinct others
      .select(col("id"), col("off"),
        (pmod(col("__r") - 1 + col("off"), col("__n")) + 1).as("__nr"))
    anchors.join(ranked.select(col("id").as("neg_id"), col("__r").as("__nr")),
        "__nr")
      .select(col("id"), col("neg_id"), col("off"))
  }

  /** Balance audit of a [[kFold]] assignment: per fold, the held-out
    * size, the train-complement size, and the skew ratio n_test·k/N
    * (1.0 = perfectly even; key-hash folds over few large groups CAN
    * skew — this is the check that catches it before a 100 TB
    * training run burns a rotation). One fold-keyed rollup + a
    * broadcast 1-row total. */
  def kFoldAudit(assign: DataFrame, foldCol: String, k: Int,
      dp: Int = 6): DataFrame = {
    val per = assign.groupBy(col(foldCol)).agg(count(lit(1L)).as("n_test"))
    val tot = per.agg(sum(col("n_test")).as("__n"))
    per.crossJoin(broadcast(tot))
      .select(col(foldCol), col("n_test"),
        (col("__n") - col("n_test")).as("n_train"),
        round(col("n_test") * lit(k) / col("__n").cast("double"), dp)
          .as("skew"))
  }

  /** Time-ordered train/test split with an EMBARGO gap — the
    * leakage-safe discipline for temporal data that [[hashSplit]]'s
    * key hashing cannot give: train is strictly before `cutoff`, test
    * strictly after `cutoff + embargo`, and the embargo band between
    * them is EXCLUDED so serial correlation (sessions, rolling
    * features, near-duplicate reposts) cannot bleed across the
    * boundary. Rows with NULL timestamps land in the embargo band
    * (never silently in train). Pure per-row Column math, zero
    * shuffles. */
  def timeSplit(df: DataFrame, ts: Column, cutoff: String,
      embargo: String, splitCol: String = "split"): DataFrame = {
    val c = lit(cutoff).cast("timestamp")
    val e = c + expr(s"INTERVAL $embargo")
    df.withColumn(splitCol,
      when(ts < c, "train").when(ts >= e, "test").otherwise("embargo"))
  }

  /** Deterministic Bernoulli sample: keep rows whose [[hashBucket]] of
    * `key` (10000 buckets) falls below `rate`·10000. Unlike `sample()`,
    * membership is a pure function of the key — the same subset
    * reproduces across engines, re-runs and cluster sizes, and two
    * samples at rates r1 < r2 are NESTED (the r1 sample is a subset of
    * the r2 sample), which makes scaling-law subsets consistent. Pure
    * per-row Column math inside the scan, zero shuffles. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(hashBucket(key, 10000) < math.round(rate * 10000).toInt)
  }

  /** Stratified [[hashSample]]: per-stratum rates (stratum value → rate),
    * `defaultRate` for unlisted strata. Used to rebalance a corpus
    * (e.g. downsample the dominant language) without a shuffle. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r"))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 10000).toInt)) {
      case (acc, (s, r)) =>
        when(stratum === lit(s), lit(math.round(r * 10000).toInt)).otherwise(acc)
    }
    df.where(hashBucket(key, 10000) < threshold)
  }

  /** Sliding-window token chunking: split each document's whitespace
    * tokens into windows of `chunkSize` starting every `stride` tokens
    * (stride < chunkSize ⇒ overlapping context windows; the last window
    * may be shorter). Returns the input columns plus (`chunkIdCol`,
    * `chunkCol`) — one output row per window.
    *
    * This is the other half of corpus shaping next to [[packByBudget]]:
    * packing BINS short documents into budget-sized groups, chunking
    * SPLITS long documents into trainer-sized windows. Pure in-scan
    * Column algebra (split → start offsets → slices → posexplode): no
    * shuffle, no state, output volume ≈ tokens/stride per doc. */
  def chunkTokens(df: DataFrame, text: Column, chunkSize: Int, stride: Int,
      chunkIdCol: String = "chunk_id", chunkCol: String = "chunk"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val toks = split(trim(text), "\\s+")
    // Window starts 0, stride, 2·stride, … capped at the stride-ceiling of
    // (tokens − chunkSize): generation stops once a window reaches the
    // document end, so no window is fully contained in the previous one
    // (trailing windows would otherwise duplicate training content). Every
    // token is still covered; a doc shorter than chunkSize yields exactly
    // one window.
    val lastStart = greatest(
      (((size(toks) - lit(chunkSize) + lit(stride - 1)) / lit(stride)).cast("int")
        * lit(stride)),
      lit(0))
    val starts = sequence(lit(0), lastStart, lit(stride))
    val windows = transform(starts, s => concat_ws(" ", slice(toks, s + 1, lit(chunkSize))))
    df.select(col("*"), posexplode(windows).as(Seq(chunkIdCol, chunkCol)))
  }

  /** Rebalance a corpus to TARGET mix proportions by downsampling — the
    * static data-mixing step of LLM corpus assembly (choose language /
    * domain weights, then realize them without upsampling).
    *
    * Given `targets` (stratum → weight, weights > 0), the largest
    * realizable corpus honoring the mix keeps `budget = min_s(n_s / w_s)`
    * weighted rows: the binding stratum is kept whole (rate 1.0) and
    * every other stratum is downsampled to `w_s · budget` rows via
    * [[stratifiedHashSample]] (deterministic, nested, engine-portable
    * md5 buckets). Strata absent from `targets` are dropped.
    *
    * Executes ONE tiny aggregation job at call time (stratum counts —
    * cardinality = #languages/#domains, collected to the driver to
    * derive rates); the sampling itself is per-row Column math inside
    * the scan, zero shuffles. */
  def mixToTarget(df: DataFrame, key: Column, stratum: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "need at least one target stratum")
    targets.foreach { case (s, w) => require(w > 0, s"target weight for '$s' must be > 0") }
    val counts: Map[String, Long] = df
      .groupBy(stratum.cast("string").as("__s")).agg(count(lit(1L)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no target stratum present in the corpus")
    val budget = present.map { case (s, w) => counts(s).toDouble / w }.min
    // the binding stratum's rate is 1.0 by construction, but w*(n/w)/n can
    // round to 1+ulp in double — clamp so the derived rate stays valid
    val rates = present.map { case (s, w) =>
      s -> math.min(1.0, w * budget / counts(s).toDouble)
    }
    stratifiedHashSample(df, key, stratum, rates, defaultRate = 0.0)
  }

  /** Token-budget mixture allocation with repetition caps — the
    * "design the training mix" solver: split a `budget` of tokens
    * across sources in proportion to target `weights`, but never take
    * more than `maxEpochs` passes over any source. Exact waterfilling:
    * with sources sorted by cap/weight, the unique scale λ solving
    * `Σ min(λ·w_s, cap_s) = budget` falls in one inter-ratio segment,
    * found with prefix/suffix window sums over the SOURCE table (tiny —
    * every window here is source-count-bounded). If the budget exceeds
    * total capacity, every source caps and the shortfall shows as
    * `epochs = maxEpochs` everywhere.
    *
    * A source without a weight fails loudly at run time (a silent drop
    * would starve it from the mix). */
  /** Temperature-scaled source sampling rates (the multilingual-mix
    * convention, e.g. mBERT/XLM-R exponent smoothing): from per-source
    * mass `n_s`, the sampling probability `p_s = n_s^α / Σ n^α` —
    * α = 1 reproduces natural proportions, α → 0 flattens toward
    * uniform, so low-resource sources are up-sampled without a
    * hand-tuned weight table. Emits natural share, smoothed share, and
    * the up/down-sampling factor per source.
    *
    * One source-keyed rollup + a 1-row total broadcast — the exchanges
    * carry the source space only. */
  def temperatureMix(df: DataFrame, srcCol: String, alpha: Double,
      dp: Int = 6): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val per = df.groupBy(col(srcCol).cast("string").as("source"))
      .agg(count(lit(1L)).as("n"))
      .withColumn("__pa", pow(col("n").cast("double"), alpha))
    val tot = per.agg(sum(col("n")).cast("double").as("__tn"),
      sum(col("__pa")).as("__ta"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        round(col("n") / col("__tn"), dp).as("natural_share"),
        round(col("__pa") / col("__ta"), dp).as("smoothed_share"),
        round((col("__pa") / col("__ta")) / (col("n") / col("__tn")), dp)
          .as("boost"))
      .orderBy("source")
  }

  def mixtureBudget(avail: DataFrame, srcCol: String, tokensCol: String,
      weights: Map[String, Double], budget: Double, maxEpochs: Double,
      dp: Int = 6): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val spark = avail.sparkSession
    import spark.implicits._
    // weights are RELATIVE (λ absorbs any scale), used exactly as
    // given — normalizing here would perturb them by a float division
    val wDf = weights.toSeq.toDF("src", "__wraw")
    val base = avail.select(col(srcCol).cast("string").as("src"),
        col(tokensCol).cast("double").as("avail_tokens"))
      .join(broadcast(wDf), Seq("src"), "left")
      .withColumn("__w", when(col("__wraw").isNull, raise_error(concat(
          lit("mixtureBudget: no weight for source "), col("src"))))
        .otherwise(col("__wraw")))
      .withColumn("cap", col("avail_tokens") * maxEpochs)
      .withColumn("__ratio", col("cap") / col("__w"))
    val wAsc = Window.orderBy(col("__ratio"), col("src"))
    val ann = base
      .withColumn("__cumCapPrev", coalesce(sum(col("cap")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("__sufW", sum(col("__w")).over(
        wAsc.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__prevRatio", coalesce(lag(col("__ratio"), 1).over(wAsc),
        lit(Double.NegativeInfinity)))
      .withColumn("__lam",
        (lit(budget) - col("__cumCapPrev")) / col("__sufW"))
    val lam = ann
      .where(col("__lam") < col("__ratio") && col("__lam") >= col("__prevRatio"))
      .agg(min(col("__lam")).as("__lambda"))
    ann.crossJoin(lam)
      .withColumn("alloc", round(when(col("__lambda").isNull, col("cap"))
        .otherwise(least(col("__lambda") * col("__w"), col("cap"))), dp))
      .select(col("src"), col("avail_tokens"),
        round(col("__w"), dp).as("weight"), round(col("cap"), dp).as("cap"),
        col("alloc"),
        round(col("alloc") / col("avail_tokens"), dp).as("epochs"),
        (col("alloc") === round(col("cap"), dp)).as("capped"))
  }

  /** Novelty curve over ordered shards (crawls, dumps, days): for each
    * shard, how many of its docs are NEW — content whose digest first
    * appears there — and the running distinct total. The marginal-value
    * diagnostic for "is the next crawl still worth ingesting?".
    *
    * Scale shape: one digest-keyed `min(shard)` rollup (map-side
    * partial) decides first appearance; everything after rides
    * shard-count-bounded aggregates (the running sum windows over the
    * SHARD table, not the corpus). */
  def noveltyCurve(df: DataFrame, shard: Column, textCol: String,
      dp: Int = 6): DataFrame = {
    val base = df.select(shard.cast("long").as("shard"),
      md5(col(textCol)).as("__d"))
    val perShard = base.groupBy("shard").agg(count(lit(1L)).as("n_docs"))
    val firsts = base.groupBy("__d").agg(min(col("shard")).as("shard"))
      .groupBy("shard").agg(count(lit(1L)).as("n_new"))
    val w = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perShard.join(firsts, Seq("shard"), "left")
      .select(col("shard"), col("n_docs"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty_rate",
        round(col("n_new") / col("n_docs").cast("double"), dp))
      .withColumn("cum_new", sum(col("n_new")).over(w))
  }

  /** Cross-split leakage audit: given a split assignment and a near-dup
    * PAIR table (from any dedup path — exact, MinHash, SemDedup), count
    * duplicate pairs per unordered split pair. A row with
    * `leaking = true` (the two sides land in different splits) is eval
    * contamination — the thing [[hashSplit]]'s group-key discipline
    * exists to prevent, now measurable after the fact.
    *
    * Scale shape: two id-keyed equi joins of the (already
    * output-sensitive) pair table against the tiny (id, split)
    * projection, then a category-bounded rollup. Nothing corpus-sized
    * shuffles. */
  def splitLeakageAudit(assign: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val a = assign.select(col(idCol).as(idACol), col(splitCol).as("__sa"))
    val b = assign.select(col(idCol).as(idBCol), col(splitCol).as("__sb"))
    pairs.select(idACol, idBCol).join(a, idACol).join(b, idBCol)
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1L)).as("n_pairs"))
      .withColumn("leaking", col("split_a") =!= col("split_b"))
  }

  /** Raking (iterative proportional fitting, Deming–Stephan 1940): fit
    * per-cell sampling weights so the WEIGHTED marginals over two
    * categorical columns match target proportions — the survey-statistics
    * workhorse, used in corpus design to hit a (language × source)
    * mixture without throwing rows away. Returns the contingency-cell
    * table `(c1, c2, n, weight)`: alternately scale each margin to its
    * target for `iters` rounds (each round: margin-1 factors, then
    * margin-2 factors on the updated weights).
    *
    * Scale shape: ONE aggregation job builds the contingency table
    * (map-side partial count; |c1|·|c2| cells, category-bounded — never
    * corpus-sized); IPF then iterates locally over the tiny cell table.
    * Apply to rows with [[rakeApply]] (a broadcast join on the cell key).
    * Targets are proportions over the OBSERVED categories; every
    * observed category must have a target (fails loudly otherwise —
    * a silent zero would delete the stratum). */
  def rakeWeights(df: DataFrame, col1: String, col2: String,
      target1: Map[String, Double], target2: Map[String, Double],
      iters: Int = 10, dp: Int = 6): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    require(target1.values.forall(_ > 0) && target2.values.forall(_ > 0),
      "target proportions must be positive")
    val spark = df.sparkSession
    val cells: Array[(String, String, Long)] = df
      .groupBy(col(col1).cast("string").as("__a"), col(col2).cast("string").as("__b"))
      .agg(count(lit(1L)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val missing1 = cells.map(_._1).distinct.filterNot(target1.contains)
    val missing2 = cells.map(_._2).distinct.filterNot(target2.contains)
    require(missing1.isEmpty && missing2.isEmpty,
      s"observed categories without a target: ${(missing1 ++ missing2).mkString(", ")}")
    val total = cells.map(_._3).sum.toDouble
    val t1 = target1.map { case (k, v) => k -> v * total }
    val t2 = target2.map { case (k, v) => k -> v * total }
    var w: Map[(String, String), Double] =
      cells.map { case (a, b, n) => (a, b) -> n.toDouble }.toMap
    for (_ <- 1 to iters) {
      val m1 = w.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
      w = w.map { case ((a, b), v) => (a, b) -> v * t1(a) / m1(a) }
      val m2 = w.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
      w = w.map { case ((a, b), v) => (a, b) -> v * t2(b) / m2(b) }
    }
    import spark.implicits._
    cells.toSeq.map { case (a, b, n) =>
      (a, b, n, BigDecimal(w((a, b)) / n.toDouble)
        .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF(col1, col2, "n", "weight")
  }

  /** Attach the raked per-cell weight to every row — a BROADCAST join on
    * the (category-bounded) cell table from [[rakeWeights]]. */
  def rakeApply(df: DataFrame, col1: String, col2: String,
      cellWeights: DataFrame): DataFrame =
    df.withColumn("__a", col(col1).cast("string"))
      .withColumn("__b", col(col2).cast("string"))
      .join(broadcast(cellWeights.select(col(col1).as("__a"), col(col2).as("__b"),
        col("weight"))), Seq("__a", "__b"), "left")
      .drop("__a", "__b")

  /** Per-group cap: keep at most `k` rows per `group`, ranked by `order`
    * (the web-curation "domain cap" — bound any one domain's share of the
    * corpus by keeping its top-k docs by quality). `order` must be a
    * TOTAL order (append a unique id as tie-break) or the kept subset is
    * nondeterministic across runs.
    *
    * One shuffle on the group key. Spark's WindowGroupLimit rule pushes
    * the rank<=k cut to a per-partition top-k BEFORE the exchange, so the
    * shuffle carries at most k rows per group per input partition — a
    * domain with a billion rows never assembles in one place. */
  def capPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    require(group.nonEmpty, "need at least one group column")
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** The corpus-quantile of `score` — ONE tiny aggregation job. The
    * default is `approx_percentile` (a mergeable sketch: map-side
    * partials, no global sort — the 100 TB route; `accuracy` bounds the
    * rank error at 1/accuracy). `exact = true` uses the exact
    * interpolated percentile (engine-portable semantics — matches
    * DuckDB/Postgres `quantile_cont`/`percentile_cont`), which buffers
    * per-partition values and is for modest cardinalities or oracles. */
  def quantileThreshold(df: DataFrame, score: Column, q: Double,
      exact: Boolean = false, accuracy: Int = 10000): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    // exact path: rank selection (bit-identical to the built-in —
    // PercentileRankSpec), not the boxed per-value aggregation map (r17)
    val row = if (exact)
      graft.ops.Analytics.exactPercentileRow(df, score, Seq(q -> "__t"))
        .select(col("__t").cast("double")).head
    else df.agg(
      percentile_approx(score, lit(q), lit(accuracy)).cast("double")).head
    require(!row.isNullAt(0),
      s"quantileThreshold: input has no non-null '$score' values (empty input?)")
    row.getDouble(0)
  }

  /** The 1-row aggregation computing ALL of `splits`' quantiles in ONE
    * job — exposed so plan tests can assert which percentile expression
    * the chosen path ships. Default `approx_percentile` (mergeable
    * sketch: map-side partials, bounded memory — the ONLY shape that
    * survives 100 TB); `exact = true` buffers every value in the
    * aggregation buffer and exists solely for small-scale oracle audits. */
  def quantileThresholdsDF(df: DataFrame, score: Column, splits: Seq[Double],
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(splits.nonEmpty && splits.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile splits must be in [0,1], got $splits")
    // exact path: rank selection (bit-identical to the built-in —
    // PercentileRankSpec), not the boxed per-value aggregation map (r17);
    // all splits ride the ONE ranked pass, assembled back into the array
    // shape callers expect
    if (exact)
      graft.ops.Analytics.exactPercentileRow(df, score,
          splits.zipWithIndex.map { case (q, i) => q -> s"__t$i" })
        // empty/all-null input: the built-in yields a NULL array, not an
        // array of NULLs — restate that (every split is null together)
        .select(when(col("__t0").isNull, lit(null))
          .otherwise(array(splits.indices.map(i =>
            col(s"__t$i").cast("double")): _*))
          .cast("array<double>").as("thresholds"))
    else {
      val pcts = array(splits.map(lit): _*)
      // approx_percentile preserves the input type (e.g. array<bigint>
      // for a bigint score) — normalize so callers always read doubles
      df.agg(percentile_approx(score, pcts, lit(accuracy))
        .cast("array<double>").as("thresholds"))
    }
  }

  /** Assign each row a named quantile bucket of `score` — the CCNet-style
    * head/middle/tail quality partition generalized to any split vector.
    * `names` has one more entry than `splits`, in ASCENDING score order
    * (names(0) = below the first split … names.last = at/above the last).
    * Thresholds come from [[quantileThresholdsDF]] (one tiny job, approx
    * by default — `exact` is the oracle-audit path only) and are folded
    * into the returned plan as LITERALS: bucket assignment is per-row
    * math inside the scan — no join, no second shuffle, nothing that
    * won't hold at corpus scale. */
  def bucketByQuantiles(df: DataFrame, score: Column, splits: Seq[Double],
      names: Seq[String], bucketCol: String = "bucket",
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(names.length == splits.length + 1,
      s"need ${splits.length + 1} bucket names for ${splits.length} splits, got ${names.length}")
    require(splits == splits.sorted, s"splits must be ascending, got $splits")
    val row = quantileThresholdsDF(df, score, splits, exact, accuracy).head
    require(!row.isNullAt(0),
      "bucketByQuantiles: input has no non-null score values (empty input?)")
    val ts = row.getSeq[Double](0)
    val ordered = ts.zip(names.init).foldRight(lit(names.last): Column) {
      case ((t, name), rest) => when(score < lit(t), name).otherwise(rest)
    }
    // neither a null nor a NaN score may silently land in the top
    // bucket (Spark orders NaN above every double, so the when-chain
    // would otherwise fall through to names.last for NaN)
    df.withColumn(bucketCol,
      when(score.isNull || score.cast("double").isNaN, lit(null)).otherwise(ordered))
  }

  /** Keep rows whose `score` is at or above (`keepUpper`, default) / at
    * or below the corpus `q`-quantile — quality-percentile filtering
    * ("drop the bottom quartile by LM score"). The threshold is derived
    * by [[quantileThreshold]] (one tiny job at call time) and folded into
    * the returned plan as a LITERAL: the filter itself is per-row math
    * inside the scan — no join, no second shuffle. */
  def filterByQuantile(df: DataFrame, score: Column, q: Double,
      keepUpper: Boolean = true, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val t = quantileThreshold(df, score, q, exact, accuracy)
    df.where(if (keepUpper) score >= lit(t) else score <= lit(t))
  }

  /** Deterministic shuffle key for `key` under `seed`: md5 of the
    * seed-prefixed key. A pure key function (like [[hashBucket]]):
    * the same (seed, key) orders identically across engines, re-runs and
    * cluster sizes; a different seed is a fresh independent permutation. */
  def shuffleKey(key: Column, seed: Long): Column =
    md5(concat(lit(seed.toString), key.cast("string")))

  /** Deterministic global shuffle — the training-order randomization step
    * (break source/crawl locality before sharding to the trainer).
    * Orders by [[shuffleKey]] with the key itself as tie-break, so the
    * permutation is total and reproducible. At scale this is Spark's
    * range-partitioned sort: sampled range bounds, one exchange, no
    * single-point assembly; `orderBy(...).limit(n)` collapses to a
    * TakeOrdered (no full sort) when only a prefix is needed. */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Long = 0L,
      keyCol: String = "shuffle_key"): DataFrame =
    df.withColumn(keyCol, shuffleKey(key, seed))
      .orderBy(col(keyCol), key)

  /** Sequence packing: within each `packKeys` group, walk rows in
    * `order` and assign pack ids by START offset of the running size —
    * pack = floor((cumsum - size) / budget). One window pass; cutting by
    * start offset means a pack may overflow `budget` by less than one
    * row's size (exact greedy first-fit is inherently sequential and
    * cannot be a single distributed pass). One shuffle on the pack keys;
    * at corpus scale the keys are shards, so the sort is per-shard. */
  def packByBudget(df: DataFrame, packKeys: Seq[Column], order: Seq[Column],
      size: Column, budget: Long, packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 =
      if (packKeys.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(packKeys: _*).orderBy(order: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // double division is exact here: offsets < 2^53
    df.withColumn(packCol,
      floor((sum(size).over(w) - size) / lit(budget.toDouble)).cast("long"))
  }

  /** Snapshot diff between two corpus versions: per-id status
    * added / removed / changed / unchanged — the primitive behind
    * incremental pipelines (re-run expensive operators only on
    * added+changed rows) and snapshot audits.
    *
    * Scale shape: each side is projected to (id, md5 digest) IN the scan
    * before the full-outer join, so the shuffle carries 32-byte digests
    * instead of document bodies — at 100 TB the diff costs one
    * id-keyed join of two narrow columns. md5 is the engine-portable
    * digest (same hex everywhere), matching [[hashBucket]]'s rationale;
    * multi-column content is joined with a \u0001 separator before
    * hashing so column boundaries cannot alias. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def dig(df: DataFrame, hc: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", contentCols.map(col): _*).cast("binary")).as(hc))
    dig(a, "__ha").join(dig(b, "__hb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") === col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Apply a CDC change batch to a snapshot — the upsert/delete merge
    * every incremental pipeline runs between [[snapshotDiff]] (what
    * changed) and [[scd2History]] (what the history looks like):
    * given `current` (one row per id) and `changes` (op ∈ I/U/D rows
    * with a version), produce the next snapshot. The LATEST change per
    * id wins (max version, op as deterministic tie-break); a winning
    * D drops the id, a winning I/U replaces (or inserts) the row.
    *
    * Scale shape: the winner resolution is one window over the CHANGE
    * BATCH (batch-sized, not snapshot-sized); the snapshot itself
    * pays one anti-join on id against the (small) changed-id set —
    * broadcastable whenever the batch is, so the standing corpus
    * never shuffles. Content columns must match between the two
    * frames. */
  def applyChanges(current: DataFrame, changes: DataFrame, idCol: String,
      opCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col(opCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    val survivors = latest.where(col(opCol) =!= "D")
      .drop(opCol, versionCol)
    current
      .join(broadcast(latest.select(col(idCol))), Seq(idCol), "left_anti")
      .unionByName(survivors)
  }

  /** SCD-2 history construction (Kimball & Ross, The Data Warehouse
    * Toolkit, 3rd ed. ch. 5): collapse versioned snapshot rows of each
    * entity into validity intervals — one row per contiguous run of
    * identical content, `[valid_from, valid_to)` keyed by the version
    * column, `valid_to` NULL for the open (current) run. The
    * slowly-changing-dimension builder every incremental pipeline needs
    * once it keeps more than one snapshot: metadata history, crawl
    * recrawls, label revisions.
    *
    * Input: one row per (id, version) *observation*; versions need not
    * be dense. A run ends at the next OBSERVED version whose content
    * digest differs; ids never observed again stay current (row-level
    * data cannot distinguish deletion from non-observation — pair with
    * [[snapshotDiff]] when the roster matters).
    *
    * Output: id, valid_from, valid_to, n_versions (observations in the
    * run), is_current, and the content columns at the run's start.
    *
    * Scale shape: ONE exchange on id (the window + the run groupBy both
    * ride it; the digest is computed in-scan). Content comparison is on
    * a 32-byte md5 of the -joined columns — same aliasing caveat
    * as [[snapshotDiff]] (NULL and empty string digest alike). Content
    * columns must be min-orderable (the run-start value is recovered as
    * min over the constant-content run, never a nondeterministic
    * first()). */
  def scd2History(snapshots: DataFrame, idCol: String, versionCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col(versionCol))
    val dg = md5(concat_ws("\u0001", contentCols.map(col): _*).cast("binary"))
    val aggs = Seq(min(col(versionCol)).as("valid_from"),
      count(lit(1L)).as("n_versions")) ++
      contentCols.map(c => min(col(c)).as(c))
    val runs = snapshots
      .withColumn("__dg", dg)
      .withColumn("__chg",
        when(lag(col("__dg"), 1).over(w).isNull ||
          lag(col("__dg"), 1).over(w) =!= col("__dg"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(w))
      .groupBy(col(idCol), col("__run"))
      .agg(aggs.head, aggs.tail: _*)
    val wr = Window.partitionBy(col(idCol)).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(Seq(col(idCol), col("valid_from"), col("valid_to"),
        col("n_versions"), col("valid_to").isNull.as("is_current")) ++
        contentCols.map(col): _*)
  }

  /** Deterministic uniform k-per-group sample: exactly min(k, |group|)
    * rows per group, chosen by ranking on the seeded content hash
    * [[shuffleKey]] — the bounded "show me a few examples per source /
    * cluster / language" primitive. Unlike `sample()` the selection is
    * a pure function of (key, seed): stable across runs, partitionings
    * and engine versions, so downstream eyeball sets and golden tests
    * don't churn. A different seed draws an independent sample.
    *
    * Scale shape: ONE group-keyed exchange; the rank-≤-k predicate on
    * row_number is pushed below the shuffle as a per-partition group
    * limit (WindowGroupLimit), so each map task ships at most k rows
    * per group it holds. Adds `sample_rank` (1..k, the stable draw
    * order). */
  def groupSample(df: DataFrame, group: Seq[Column], key: Column, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(group.nonEmpty, "need at least one group column")
    val w = Window.partitionBy(group: _*).orderBy(shuffleKey(key, seed), key)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Curriculum mixing schedule: interpolate per-source mixture weights
    * from `w_start` to `w_end` across `steps` checkpoints (linear, or
    * half-cosine with `cosine = true`) and integerize each step's
    * token allocation by largest remainder so every step sums EXACTLY
    * to `stepBudget` — the annealed data-mix plan (start at the natural
    * crawl mix, end at the curated target; the standard curriculum
    * shape). Input: one row per source with `source`, `w_start`,
    * `w_end` columns; weights are re-normalized within each step, so
    * ends need not sum to 1. Returns (step, source, share, tokens).
    *
    * Shape: the steps × sources grid is bounded on both axes; every
    * window rides that grid partitioned by step. */
  def mixSchedule(weights: DataFrame, steps: Int, stepBudget: Long,
      cosine: Boolean = false, dp: Int = 6): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(stepBudget > 0, s"stepBudget must be positive, got $stepBudget")
    val grid = weights.sparkSession.range(0, steps)
      .select(col("id").cast("int").as("step"))
    val t =
      if (steps == 1) lit(0.0)
      else col("step") / (steps - 1)
    val f = if (cosine) (lit(1.0) - cos(t * math.Pi)) / 2.0 else t
    val wStep = Window.partitionBy(col("step"))
    val rk = Window.partitionBy(col("step"))
      .orderBy(col("__frac").desc, col("source"))
    weights.crossJoin(grid) // bounded × bounded schedule grid
      .withColumn("__w", col("w_start") + f * (col("w_end") - col("w_start")))
      .withColumn("__share",
        when(sum(col("__w")).over(wStep) > 0.0,
          col("__w") / sum(col("__w")).over(wStep)))
      .withColumn("__raw", lit(stepBudget) * col("__share"))
      .withColumn("__fl", floor(col("__raw")))
      .withColumn("__frac", col("__raw") - floor(col("__raw")))
      .withColumn("__deficit", lit(stepBudget) - sum(col("__fl")).over(wStep))
      .withColumn("__rnk", row_number().over(rk))
      .select(col("step"), col("source"),
        round(col("__share"), dp).as("share"),
        when(col("__share").isNotNull,
          col("__fl") + when(col("__rnk") <= col("__deficit"), 1L)
            .otherwise(0L)).cast("long").as("tokens"))
  }

  /** Greedy token-budget selection: rank rows by `score` descending
    * (ties by `key`) and keep the longest prefix whose cumulative
    * `tokens` stays within `budget` — the "fill a training budget with
    * the best documents" primitive. Greedy-by-score is the exact
    * optimum of the fractional knapsack and the standard practical
    * policy for the 0/1 case at corpus scale.
    *
    * Shape: ONE two-phase global cumulative sum over (score desc, key)
    * ([[graft.ops.Windows.globalCumSum]] — range repartition + local
    * window + broadcast offsets; no single-reducer sort) and a filter.
    * Feed integer token counts: the cumsum is then exact and the
    * budget cut deterministic (double token weights group differently
    * across partitionings — the globalCumSum contract). Returns the
    * selected rows with their running total in `cumCol`. */
  def budgetSelect(df: DataFrame, key: Column, score: Column,
      tokens: Column, budget: Long, cumCol: String = "cum_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.withColumn("__score", score)
      .withColumn("__tok", tokens.cast("long"))
      .where(col("__score").isNotNull && col("__tok").isNotNull)
    Windows.globalCumSum(base, Seq(col("__score").desc, key),
        col("__tok"), out = cumCol)
      .where(col(cumCol) <= budget)
      .drop("__score", "__tok")
  }

  /** Out-of-fold smoothed target encoding (Micci-Barreca, SIGKDD
    * Explorations 2001 + the standard K-fold leakage guard): replace a
    * high-cardinality category with the target mean of OTHER folds'
    * rows in that category, shrunk toward the global prior:
    *
    *   te(cat, fold) = (Σtarget(cat) − Σtarget(cat, fold) + m·prior)
    *                 / (n(cat) − n(cat, fold) + m)
    *
    * A row never sees its own fold's labels — in-fold encoding leaks
    * the answer into the feature and inflates every downstream
    * validation score. Folds come from [[hashBucket]] over `key`
    * (deterministic, engine-portable md5). Unseen combinations (a
    * category entirely inside one fold) and NULL categories land on
    * the prior (the smoothing limit). Adds `fold` and `out` columns.
    *
    * Shape: one (category, fold) rollup — cardinality |cats|×folds,
    * partial-aggregated — a category-keyed second rollup, one keyed
    * equi-join back to the rows; the global prior is a 1-row
    * crossJoin. Nothing broadcasts by requirement (the encode table
    * can be as big as the category space) and nothing is all-pairs. */
  def targetEncode(df: DataFrame, key: Column, category: Column,
      target: Column, folds: Int = 5, smoothing: Double = 20.0,
      out: String = "te"): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    val withFold = df
      .withColumn("fold", hashBucket(key, folds))
      .withColumn("__t", target.cast("double"))
    val cf = withFold.groupBy(category.as("__cat"), col("fold"))
      .agg(sum(col("__t")).as("__sf"), count(lit(1L)).as("__nf"))
    val ct = cf.groupBy(col("__cat"))
      .agg(sum(col("__sf")).as("__sc"), sum(col("__nf")).as("__nc"))
    val prior = withFold.agg(avg(col("__t")).as("__prior"))
    val enc = cf.join(ct, "__cat")
      .crossJoin(prior) // 1-row prior
      .select(col("__cat"), col("fold"),
        ((col("__sc") - col("__sf")) + lit(smoothing) * col("__prior"))
          ./((col("__nc") - col("__nf")) + lit(smoothing)).as("__te"))
    withFold
      .withColumn("__cat", category)
      .join(enc, Seq("__cat", "fold"), "left")
      .crossJoin(prior)
      .withColumn(out, coalesce(col("__te"), col("__prior")))
      .drop("__cat", "__t", "__te", "__prior")
  }

  /** Neyman-optimal stratified sample allocation (Neyman, JRSS 1934;
    * Cochran, Sampling Techniques §5.5): to sample `sampleN` rows total
    * across strata minimizing the variance of the estimated mean,
    * allocate n_h ∝ N_h·S_h (stratum size × within-stratum stddev) —
    * big AND noisy strata get the samples; a big uniform stratum needs
    * few. The principled sizing step in front of stratified corpus
    * subsampling (per-source eval sets, quality-audit draws).
    *
    * Integerization is by largest remainder (floor everything, then +1
    * to the largest fractional parts, ties by stratum key) so
    * allocations sum EXACTLY to `sampleN`. Degenerate strata
    * (single-row → stddev NULL, or constant → 0) get weight 0; if ALL
    * weights are 0 the allocation is NULL (no variance signal — the
    * caller wants proportional allocation instead, documented, not a
    * silent fallback).
    *
    * Shape: ONE corpus aggregation keyed by stratum; everything after
    * rides the |strata|-bounded table (the unpartitioned windows are
    * bounded-table by construction). Returns
    * (stratum, n_rows, sd, weight, alloc). */
  def neymanAllocation(df: DataFrame, strata: Column, value: Column,
      sampleN: Long, dp: Int = 6): DataFrame = {
    require(sampleN > 0, s"sampleN must be positive, got $sampleN")
    val s = df.groupBy(strata.as("stratum"))
      .agg(count(lit(1L)).as("n_rows"),
        coalesce(stddev_samp(value.cast("double")), lit(0.0)).as("__sd"))
      .withColumn("__nhsh", col("n_rows") * col("__sd"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val raw = s.withColumn("__tot", sum(col("__nhsh")).over(tot))
      .withColumn("__wt",
        when(col("__tot") > 0.0, col("__nhsh") / col("__tot")))
      .withColumn("__raw", lit(sampleN) * col("__wt"))
      .withColumn("__fl", floor(col("__raw")))
      .withColumn("__frac", col("__raw") - floor(col("__raw")))
    val rk = Window.orderBy(col("__frac").desc, col("stratum"))
    raw
      .withColumn("__deficit", lit(sampleN) - sum(col("__fl")).over(tot))
      .withColumn("__rnk", row_number().over(rk))
      .select(col("stratum"), col("n_rows"),
        round(col("__sd"), dp).as("sd"),
        round(col("__wt"), dp).as("weight"),
        when(col("__wt").isNotNull,
          col("__fl") + when(col("__rnk") <= col("__deficit"), 1L)
            .otherwise(0L)).cast("long").as("alloc"))
  }

  /** Winsorize a numeric column: clip values below the `lo` quantile /
    * above the `hi` quantile to those thresholds — the TRANSFORM
    * companion of [[graft.ops.Analytics.robustStats]] (which reports);
    * tames heavy-tailed quality scores before averaging/mixing without
    * dropping rows. Adds `<col>_w` (clipped) and `was_clipped`.
    *
    * One tiny quantile job (approx sketch by default — the 100 TB
    * route; `exact` for oracle audits) folds both thresholds into the
    * scan as literals: no join, no second shuffle. */
  def winsorize(df: DataFrame, c: String, lo: Double = 0.05,
      hi: Double = 0.95, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got $lo/$hi")
    val thr = quantileThresholdsDF(df, col(c), Seq(lo, hi), exact, accuracy)
      .head().getSeq[Double](0)
    val (tLo, tHi) = (thr(0), thr(1))
    df.withColumn(s"${c}_w",
        least(greatest(col(c).cast("double"), lit(tLo)), lit(tHi)))
      .withColumn("was_clipped",
        col(c).isNotNull && (col(c) < tLo || col(c) > tHi))
  }

  /** Impute NULLs in a numeric column with a per-group statistic —
    * `median` (approx by default, exact opt-in) or `mean` — falling
    * back to the GLOBAL statistic for groups with no observed values.
    * Adds `<col>_f` (filled) and `was_imputed`. The repair step between
    * ingest and anything that treats NULL as zero.
    *
    * One (group, stat) aggregate broadcast back over the scan + a
    * 1-row global fallback — the fill itself never shuffles data
    * rows. */
  def imputeByGroup(df: DataFrame, c: String, group: Seq[String],
      stat: String = "median", exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(Seq("median", "mean").contains(stat), s"stat must be median or mean, got $stat")
    require(group.nonEmpty, "need at least one group column")
    val v = col(c).cast("double")
    def statAgg: Column = stat match {
      case "mean" => avg(v)
      case _ => percentile_approx(v, lit(0.5), lit(accuracy)).cast("double")
    }
    // exact median: rank selection per group / globally (bit-identical
    // to the built-in — GroupedPercentileRankSpec), not the boxed
    // per-group value map (r17)
    val exactMedian = stat == "median" && exact
    val perGroup =
      if (exactMedian)
        graft.ops.Analytics.exactPercentileByGroup(df,
            struct(group.map(col): _*), v, Seq(0.5 -> "__fill"))
          .select(group.map(n => col("__g").getField(n).as(n)) :+
            col("__fill"): _*)
      else df.groupBy(group.map(col): _*).agg(statAgg.as("__fill"))
    val globalRow =
      if (exactMedian)
        graft.ops.Analytics.exactPercentileRow(df, v, Seq(0.5 -> "__m"))
          .select(col("__m").cast("double")).head()
      else df.agg(statAgg.cast("double")).head()
    val globalFill = globalRow match {
      case r if r.isNullAt(0) => null
      case r => java.lang.Double.valueOf(r.getDouble(0))
    }
    df.join(broadcast(perGroup), group)
      .withColumn(s"${c}_f",
        coalesce(v, col("__fill"), lit(globalFill)))
      .withColumn("was_imputed", v.isNull)
      .drop("__fill")
  }

  /** Survivorship: collapse each duplicate CLUSTER (the output of
    * [[graft.functions.Clusters]] over any pair operator) into one
    * golden record — per field, the value of the LATEST row (by
    * `versionCol`) whose field is NON-NULL, the standard MDM merge
    * rule ("newest non-null wins"); a stale row's filled field beats a
    * fresh row's NULL. Ties on version break toward the larger value
    * (deterministic on any engine). Adds `n_members`.
    *
    * ONE cluster-keyed aggregate: each field rides a
    * max(struct(version, value)) over its non-null rows — partial-agg
    * friendly, no per-field joins, no window. */
  def goldenRecords(df: DataFrame, clusterCol: String, versionCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to merge")
    val aggs = fields.map { f =>
      max(when(col(f).isNotNull, struct(col(versionCol).as("v"), col(f).as("x"))))
        .getField("x").as(f)
    } :+ count(lit(1L)).as("n_members")
    df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic weighted sample WITHOUT replacement: k rows drawn
    * with probability proportional to `weight` — quality-weighted
    * corpus subsetting ("keep 1M docs, prefer high scores") without the
    * all-or-nothing of a threshold cut. Efraimidis–Spirakis A-ES
    * (IPL 2006): each row's draw key is −ln(u)/w with u uniform on
    * (0, 1]; the k SMALLEST keys are exactly a weighted sample without
    * replacement. u derives from the seeded md5 of `key` (the same
    * engine-portable uniform as [[hashBucket]]/[[shuffleKey]]), so the
    * draw is a pure function of (key, weight, seed) — stable across
    * runs, layouts and engines. Rows with weight ≤ 0 or NULL are
    * excluded (zero mass). Adds `aes_key` (the draw key).
    *
    * Scale shape: the key is in-scan hash arithmetic; selection is
    * `orderBy(key).limit(k)` — a TakeOrdered (per-partition top-k
    * heaps), no global sort, no per-group state. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // first 8 md5 hex chars → integer in [0, 2^32), +1 → u ∈ (0, 1]
    val u = (conv(substring(md5(concat(lit(seed.toString), key.cast("string"))),
        1, 8), 16, 10).cast("long") + 1).cast("double") / 4294967297.0
    df.where(weight.cast("double") > 0)
      .withColumn("aes_key", -log(u) / weight.cast("double"))
      .orderBy(col("aes_key"), key)
      .limit(k)
  }

  /** Quantile normalization of `target` onto `ref`'s distribution: each
    * target value maps to the reference value at ITS OWN percentile —
    * the distribution-alignment step when scores from different
    * classifiers/sources must be comparable before a global threshold
    * (quality filters trained per-source, perplexity from different
    * LMs). Exact linear interpolation of the reference order
    * statistics; ranks tie-break on `targetId` so the map is
    * deterministic.
    *
    * Shape — two paths, chosen by `exact`:
    *
    *   - DEFAULT (`exact = false`, the scale path): each side is
    *     summarized by ONE mergeable approx_percentile pass into a
    *     `gridSize`+1-point quantile grid that rides into the scan as a
    *     literal array; each target row's percentile (its position in
    *     the TARGET grid) and mapped value (interpolated REF grid at
    *     that percentile) are pure in-scan array arithmetic. No global
    *     sort, no join, any cardinality. Equal target values share a
    *     percentile (value-based, no id tie-break).
    *   - `exact = true` (the audit opt-in the oracle restates): exact
    *     rank assignment via one global sort per side and ONE equi-join
    *     on the floor-rank key; ranks tie-break on `targetId`, so the
    *     map is deterministic. Bounded-corpus inputs by contract.
    *
    * A single-row target maps to percentile 0.5 (its own median) on
    * both paths rather than 0/0 silently dropping the row. Returns
    * (id, value, percentile, mapped). */
  def quantileMap(ref: DataFrame, refVal: org.apache.spark.sql.Column,
      target: DataFrame, targetId: org.apache.spark.sql.Column,
      targetVal: org.apache.spark.sql.Column, dp: Int = 6,
      exact: Boolean = false, gridSize: Int = 1000,
      accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (!exact) {
      require(gridSize >= 1, s"gridSize must be >= 1, got $gridSize")
      // grid j ↦ quantile j/gridSize — exact when the side's distinct
      // count fits the summary's accuracy, approximate past it
      def grid(df: DataFrame, v: org.apache.spark.sql.Column): Seq[Double] = {
        val probes = lit((0 to gridSize).map(_.toDouble / gridSize).toArray)
        val row = df.agg(approx_percentile(v.cast("double"), probes,
          lit(accuracy)).as("__g")).head()
        // approx_percentile over zero rows returns NULL (not an empty
        // array) — check the cell, or getSeq(null).nonEmpty NPEs
        require(!row.isNullAt(0), "quantileMap side is empty")
        row.getSeq[Double](0)
      }
      val rg = grid(ref, refVal)
      val tg = grid(target, targetVal)
      require(rg.length == gridSize + 1 && tg.length == gridSize + 1,
        "quantile grid came back short — empty input side?")
      // Both lookups are O(1)-size ARRAY expressions over the literal
      // grids (size/filter/element_at), not per-cell expression trees —
      // a 1000-cell grid must not become a 1000-branch codegen method.
      val tga = typedlit(tg)
      val rga = typedlit(rg)
      val v = targetVal.cast("double")
      // percentile of v in the target grid: count of grid points <= v,
      // linear inside the straddling cell. cnt's lo is the LAST point
      // <= v and hi the first point > v, so hi > lo by construction —
      // flat runs of duplicated grid values cannot divide by zero
      // (equal values snap to the top edge of their run and so share a
      // percentile, matching the documented value-based semantics).
      val cnt = size(filter(tga, x => x <= v))
      val pLo = element_at(tga, cnt)
      val pHi = element_at(tga, cnt + 1)
      // a degenerate grid (min == max: single-row or all-equal target)
      // has no spread to interpolate — every row sits at its own
      // median, matching the exact path's n=1 rule. Decided at plan
      // time: the grids are driver-side values.
      val p =
        if (tg.head == tg.last) lit(0.5)
        else when(cnt === 0, lit(0.0))
          .when(cnt === gridSize + 1, lit(1.0))
          .otherwise((cnt - 1 + (v - pLo) / (pHi - pLo)) / gridSize)
      // inverse: ref grid value at percentile p, linear between cells
      val pos = p * gridSize
      val j = least(greatest(floor(pos), lit(0.0)), lit((gridSize - 1).toDouble))
        .cast("int")
      val mLo = element_at(rga, j + 1)
      val mHi = element_at(rga, j + 2)
      val mapped = mLo + (pos - j.cast("double")) * (mHi - mLo)
      return target.select(targetId.as("id"), v.as("value"),
          round(p, dp).as("percentile"),
          round(mapped, dp).as("mapped"))
    }
    val a = ref.select(refVal.cast("double").as("__v"))
      .withColumn("__i", row_number().over(Window.orderBy(col("__v"))) - 1)
    val na = a.count()
    require(na >= 2, s"reference needs >= 2 rows, got $na")
    val aw = a.withColumn("__vn", lead(col("__v"), 1).over(
      Window.orderBy(col("__i"))))
    val b = target.select(targetId.as("__id"), targetVal.cast("double").as("__t"))
      .withColumn("__p",
        // n=1 has no rank spread: (rn-1)/(n-1) is 0/0 — map the lone
        // row to its own median instead of NULLing it out of the join
        when(count(lit(1L)).over(Window.partitionBy()) === 1, lit(0.5))
          .otherwise(
            (row_number().over(Window.orderBy(col("__t"), col("__id"))) - 1)
              .cast("double") /
              (count(lit(1L)).over(Window.partitionBy()) - 1)))
    val pos = col("__p") * (na - 1)
    b.withColumn("__lo", floor(pos).cast("long"))
      .withColumn("__frac", pos - floor(pos))
      .join(aw.select(col("__i").as("__lo"), col("__v").as("__vlo"),
        col("__vn").as("__vhi")), "__lo")
      .select(col("__id").as("id"), col("__t").as("value"),
        round(col("__p"), dp).as("percentile"),
        round(col("__vlo") + col("__frac") *
          (coalesce(col("__vhi"), col("__vlo")) - col("__vlo")), dp)
          .as("mapped"))
  }
}
