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
}
