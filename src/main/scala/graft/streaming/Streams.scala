package graft.streaming

import graft.exec.Runner
import graft.model.CheckSpec
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the engine's batch operators re-expressed
  * over unbounded inputs (`readStream` → transform → `writeStream`).
  *
  * The reference has no streaming at all (SURVEY.md §1.1); these are the
  * Spark-first extensions of its aggregation model. Every operator here
  * uses event-time watermarks so state is bounded: at 100 TB/day the
  * state store only holds windows/keys newer than the watermark, and
  * late data beyond it is dropped deterministically.
  */
object Streams {

  /** State/shuffle partition count for a streaming query, derived from
    * expected STATE VOLUME instead of the session core count (guide
    * §2.2 partition sizing; VERDICT r16 #4). A streaming query's
    * stateful operators instantiate one state store PER shuffle
    * partition PER operator PER micro-batch — with the session's
    * local[32] inheritance, q_stream_join paid 256 HDFSBackedStateStore
    * open/evict/commit cycles per batch to hold ~40k rows of state
    * (recentProgress decomposition, OPTIMIZATION_r16). The rule:
    * one partition per `targetBytes` (default 64 MB — the low end of
    * the guide's 100 MB–1 GB shuffle-partition band, leaving headroom
    * for store overhead) of expected state, clamped to [1, 4096].
    * `expectedStateRows` is a conservative upper bound — for
    * AvailableNow full-drain fixtures, the input row count; in
    * production, the keys-within-watermark estimate. At sf0.1 (100k
    * events ≈ 13 MB) this yields 1; at 1 TB of state it yields the
    * same thousands a cluster would configure — production-sized by
    * formula, not by core count. */
  def statePartitions(expectedStateRows: Long, bytesPerRow: Long = 128L,
      targetBytes: Long = 64L << 20): Int = {
    require(bytesPerRow > 0 && targetBytes > 0, "sizes must be positive")
    val rows = math.max(0L, expectedStateRows)
    math.min(4096L, math.max(1L,
      (rows * bytesPerRow + targetBytes - 1) / targetBytes)).toInt
  }

  /** Run `body` (a streaming query: start → drain → stop) with
    * `spark.sql.shuffle.partitions` set to [[statePartitions]] of the
    * expected state volume, restoring the session value afterwards.
    * The conf is captured by the stream at its FIRST start and pinned
    * into the checkpoint, so this is the one place state partitioning
    * can be chosen; the batch reads around the stream keep the
    * session's own parallelism. */
  def withVolumeSizedState[T](s: org.apache.spark.sql.SparkSession,
      expectedStateRows: Long, bytesPerRow: Long = 128L)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, statePartitions(expectedStateRows, bytesPerRow).toString)
    try body finally s.conf.set(key, prev)
  }

  /** Tumbling event-time counts per key, watermarked. Late rows beyond
    * `watermark` are dropped; closed windows emit exactly once in append
    * mode. */
  def windowedCounts(stream: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(count(lit(1L)).as("n"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +: keys) :+ col("n"): _*)

  /** Event-time sessionization: rows within `gap` of each other merge
    * into one session (session_window is watermark-aware: a session
    * closes once the watermark passes its end). */
  def sessionCounts(stream: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(count(lit(1L)).as("n"))
      .select((col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +: keys) :+ col("n"): _*)

  /** Streaming exact dedup on key columns: state holds one entry per key
    * until the watermark passes its event time (dropDuplicates with
    * watermark — the streaming form of the exact-dedup operator). */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Per-key running aggregate via explicit state
    * (KeyValueGroupedDataset.mapGroupsWithState): count + sum per key
    * across micro-batches — the custom-state escape hatch for semantics
    * the built-in aggs can't express. */
  final case class KeyStats(key: String, n: Long, total: Double)

  def runningKeyStats(ds: Dataset[(String, Double)]): Dataset[KeyStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[KeyStats, KeyStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[KeyStats]) =>
          val prev = state.getOption.getOrElse(KeyStats(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { case (acc, (_, v)) =>
            KeyStats(key, acc.n + 1, acc.total + v)
          }
          state.update(next)
          next
      }
  }

  /** Streaming per-event z-score anomaly detection against each key's
    * EXPANDING history — the streaming twin of
    * [[graft.ops.Analytics.rollingAnomalies]]: each event scores
    * against the statistics of everything BEFORE it (the current event
    * never inflates its own baseline), then folds into the state.
    *
    * State per key is the Welford triple (n, mean, M2) — O(1) per key
    * regardless of stream length, numerically stable (Welford 1962),
    * and exactly mergeable across micro-batches because events within
    * a batch are processed in ascending `id` order and the state
    * carries the full prefix. z is emitted (rounded to `dp`) once the
    * history has ≥ 2 samples and positive variance; the flag fires on
    * |z| > k over the ROUNDED score for engine-deterministic
    * boundaries. An external engine restates the whole stream as an
    * expanding window (rows unbounded preceding .. 1 preceding). */
  final case class AnomalyState(n: Long, mean: Double, m2: Double)
  final case class AnomalyEvent(key: String, id: Long, value: Double,
      z: Option[Double], is_anomaly: Boolean)

  def anomalyMonitor(ds: Dataset[(String, Long, Double)], k: Double = 3.0,
      dp: Int = 6): Dataset[AnomalyEvent] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, AnomalyEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)],
            state: GroupState[AnomalyState]) =>
          var st = state.getOption.getOrElse(AnomalyState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, v) =>
            val zOpt =
              if (st.n >= 2) {
                val std = math.sqrt(st.m2 / (st.n - 1))
                if (std > 0)
                  Some(BigDecimal((v - st.mean) / std)
                    .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
                else None
              } else None
            val n1 = st.n + 1
            val d = v - st.mean
            val mean1 = st.mean + d / n1
            st = AnomalyState(n1, mean1, st.m2 + d * (v - mean1))
            AnomalyEvent(key, id, v, zOpt, zOpt.exists(z => math.abs(z) > k))
          }
          state.update(st)
          out.iterator
      }
  }

  /** One micro-batch of streaming near-dup corpus ingest (the body of
    * [[nearDupIngest]], public so restart idempotence is testable and so
    * batch backfills can reuse the exact streaming semantics):
    *
    *  1. WITHIN-batch near-dups collapse to their keep-min member
    *     ([[graft.functions.Dedup.minhashNearDupPairs]] →
    *     [[graft.functions.Clusters.dropNearDupMembers]]);
    *  2. survivors are matched AGAINST the standing signature index
    *     ([[graft.functions.Dedup.minhashNearDupAgainst]] — per-batch
    *     cost scales with the batch, not the corpus) and matches drop;
    *  3. the remaining docs' signatures append to the index as parquet
    *     under `batch=<batchId>` — overwrite per batch id, so a replayed
    *     micro-batch (foreachBatch is at-least-once after failure)
    *     rewrites its own partition instead of double-inserting: the
    *     index stays exactly-once without a log.
    *
    * Returns the surviving rows of `batch`, materialized (the caller's
    * sink and the index append must not observe different survivor sets
    * under speculative re-execution). */
  def nearDupIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, shingleK: Int = 5,
      numHashes: Int = 64, bands: Int = 16, tauPct: Int = 51): DataFrame = {
    import graft.functions.{Clusters, Dedup}
    val spark = batch.sparkSession
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val withinPairs = Dedup.minhashNearDupPairs(cached, idCol, textCol,
        shingleK, numHashes, bands, tauPct)
      val withinKept = Clusters.dropNearDupMembers(cached, idCol, withinPairs)
      // prior batches' partitions only; a same-id replay must not see its
      // own half-written partition as "the corpus"
      val prior = indexPartitions(indexDir, batchId)
      val survivors = (if (prior.isEmpty) withinKept else {
        val index = spark.read.parquet(prior: _*)
        val hits = Dedup.minhashNearDupAgainst(withinKept, index, idCol,
          textCol, shingleK, numHashes, bands, tauPct)
        withinKept.join(hits.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      }).localCheckpoint(true)
      Dedup.minhashFeaturize(survivors, idCol, textCol, shingleK, numHashes)
        .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
      survivors
    } finally cached.unpersist()
  }

  private def indexPartitions(indexDir: String, beforeBatch: Long): Seq[String] = {
    val root = new java.io.File(indexDir)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("batch=\\d+"))
      .filter(_.getName.stripPrefix("batch=").toLong < beforeBatch)
    parts.map(_.getPath).toSeq
  }

  /** Streaming near-dup corpus ingest: every micro-batch is near-dup
    * filtered (within itself, then against everything previously
    * admitted) and only novel documents reach `sink` — the arriving-crawl
    * pipeline as one declaration. The signature index lives as parquet at
    * `indexDir`, so the stream restarts from its checkpoint with the
    * corpus memory intact, and the SAME operator cascade serves batch
    * and stream ([[nearDupIngestBatch]]). State is in the index files,
    * not the state store: at 100 TB the index is a partitioned table,
    * not executor memory. */
  def nearDupIngest(stream: DataFrame, idCol: String, textCol: String,
      indexDir: String, shingleK: Int = 5, numHashes: Int = 64,
      bands: Int = 16, tauPct: Int = 51)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(nearDupIngestBatch(batch, batchId, idCol, textCol, indexDir,
          shingleK, numHashes, bands, tauPct), batchId)
      }

  /** One micro-batch of the streaming quantile monitor (public for
    * restart-idempotence tests and batch backfills): the batch's values
    * fold into a CUMULATIVE KLL sketch persisted as one blob-row
    * parquet per batch id. Overwrite-by-batch-id is the
    * [[nearDupIngestBatch]] exactly-once discipline — a replayed batch
    * re-reads the latest PRIOR cumulative blob and rewrites its own
    * partition, so the state stays exactly-once without a log. Returns
    * one row: (batch_id, n_seen, qs..., one estimate column per rank).
    *
    * Scale shape: one aggregation over the batch, then a 2-blob merge —
    * state is a single bounded mergeable blob (KBs at k=200), never
    * data rows; at 100 TB/day the per-trigger cost is the batch scan. */
  def quantileMonitorBatch(batch: DataFrame, batchId: Long, value: Column,
      stateDir: String, qs: Seq[Double], k: Int = 200): DataFrame = {
    import graft.functions.Kll
    require(qs.nonEmpty, "need at least one quantile rank")
    val spark = batch.sparkSession
    val batchBlob = batch
      .agg(Kll.sketchAgg(value, k).as("blob"),
        count(value.cast("double")).as("n"))
    val prior = indexPartitions(stateDir, batchId)
      .sortBy(_.split("batch=").last.toLong).lastOption
    val cum = prior.fold(batchBlob) { p =>
      batchBlob.unionByName(spark.read.parquet(p).select("blob", "n"))
        .agg(Kll.mergeAgg(col("blob"), k).as("blob"), sum(col("n")).as("n"))
    }.localCheckpoint(true) // one result row; written AND read below
    cum.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    cum.select(lit(batchId).as("batch_id"), col("n").as("n_seen"),
      Kll.quantiles(col("blob"), qs).as("estimates"))
  }

  /** One micro-batch of the streaming distinct-count monitor: the
    * batch's values fold into a CUMULATIVE HLL sketch (Spark's native
    * hll_sketch_agg / hll_union_agg blobs) persisted one blob-row
    * parquet per batch id — the same overwrite-by-batch-id
    * exactly-once discipline as [[quantileMonitorBatch]]. Returns one
    * row: (batch_id, n_rows_seen, distinct_estimate). State is one
    * bounded mergeable blob (2^lgK registers); at 100 TB/day the
    * per-trigger cost is the batch scan. */
  def distinctMonitorBatch(batch: DataFrame, batchId: Long, value: Column,
      stateDir: String, lgK: Int = 12): DataFrame = {
    val spark = batch.sparkSession
    val batchBlob = batch.agg(hll_sketch_agg(value, lit(lgK)).as("blob"),
      count(value).as("n"))
    val prior = indexPartitions(stateDir, batchId)
      .sortBy(_.split("batch=").last.toLong).lastOption
    val cum = prior.fold(batchBlob) { p =>
      batchBlob.unionByName(spark.read.parquet(p).select("blob", "n"))
        .agg(hll_union_agg(col("blob"), lit(false)).as("blob"),
          sum(col("n")).as("n"))
    }.localCheckpoint(true) // one row; written AND read below
    cum.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    cum.select(lit(batchId).as("batch_id"), col("n").as("n_rows_seen"),
      hll_sketch_estimate(col("blob")).cast("long").as("distinct_estimate"))
  }

  /** One micro-batch of the deterministic bottom-k sample monitor: the
    * batch's distinct keys get md5 priorities, merge with the prior
    * sample, and the k lexicographically-smallest (priority, key) rows
    * survive — a KMV-style UNIFORM sample of every distinct key the
    * stream has EVER seen, in bounded state, with zero randomness:
    * replaying any batch (or the whole stream) reproduces the sample
    * bit-for-bit, and the same rule run as one batch query gives the
    * identical rows (stream/batch parity by construction). State is ≤ k
    * rows of (key, priority) parquet under the overwrite-by-batch-id
    * exactly-once discipline ([[quantileMonitorBatch]]). Per-trigger
    * cost: the batch scan + a TakeOrdered(k). */
  def sampleMonitorBatch(batch: DataFrame, batchId: Long, key: Column,
      stateDir: String, k: Int = 256): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    val spark = batch.sparkSession
    val b = batch.select(key.cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
      .withColumn("priority", md5(col("key")))
    val prior = indexPartitions(stateDir, batchId)
      .sortBy(_.split("batch=").last.toLong).lastOption
    val merged = prior.fold(b) { p =>
      b.unionByName(spark.read.parquet(p).select("key", "priority"))
        .dropDuplicates("key")
    }
    val next = merged.orderBy(col("priority"), col("key")).limit(k)
      .localCheckpoint(true) // <= k rows; written AND read below
    next.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    next.select(lit(batchId).as("batch_id"), col("key"), col("priority"))
  }

  /** Streaming uniform-sample monitor: after every micro-batch, `sink`
    * receives the CURRENT deterministic bottom-k key sample of the
    * whole stream so far ([[sampleMonitorBatch]] per trigger) — the
    * "show me k random-but-replayable examples of everything we have
    * ingested" dashboard feed. */
  def sampleMonitor(stream: DataFrame, key: Column, stateDir: String,
      k: Int = 256)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(sampleMonitorBatch(batch, batchId, key, stateDir, k), batchId)
      }

  /** Streaming distinct-cardinality monitor: after every micro-batch,
    * `sink` receives the CUMULATIVE distinct estimate of `value` over
    * the whole stream so far — unique users/documents/keys from one
    * declaration, with HLL's mergeability carrying the error guarantee
    * through the per-batch unions. */
  def distinctMonitor(stream: DataFrame, value: Column, stateDir: String,
      lgK: Int = 12)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(distinctMonitorBatch(batch, batchId, value, stateDir, lgK),
          batchId)
      }

  /** Streaming quantile monitor: after every micro-batch, `sink`
    * receives the CUMULATIVE stream quantile estimates (batch_id,
    * n_seen, estimates array aligned with `qs`) — p50/p99 latency or
    * document-length percentiles over an unbounded stream from one
    * declaration, with the offline KLL error guarantee carried through
    * the merges. Same operator serves batch backfill
    * ([[quantileMonitorBatch]]). */
  def quantileMonitor(stream: DataFrame, value: Column, stateDir: String,
      qs: Seq[Double], k: Int = 200)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(quantileMonitorBatch(batch, batchId, value, stateDir, qs, k),
          batchId)
      }

  /** Streaming inverted-index ingest: every micro-batch is indexed
    * ALONE (one term-keyed exchange over the batch — cost ∝ batch,
    * never corpus) and appended as its own `batch=N` partition family
    * under `indexDir`, bucket-partitioned like
    * [[graft.functions.InvertedIndex.write]]. A document lives in
    * exactly one batch, so conjunctive search over the whole artifact
    * (partition discovery reads every batch; the bucket filter still
    * prunes directories) needs no merge or rebuild — the same
    * no-rebuild property as the near-dup signature index, with the
    * state in files, not the state store. */
  def indexIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, buckets: Int = 16): Unit = {
    import graft.functions.InvertedIndex
    InvertedIndex.build(batch, idCol, textCol)
      .withColumn("bucket", InvertedIndex.bucketOf(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/batch=$batchId")
  }

  def indexIngest(stream: DataFrame, idCol: String, textCol: String,
      indexDir: String, buckets: Int = 16): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        indexIngestBatch(batch, batchId, idCol, textCol, indexDir, buckets)
      }

  /** Per-micro-batch PSI drift monitor: every batch's value
    * distribution is scored against a STATIC reference with
    * [[graft.ops.Analytics.driftPsi]] — the same operator serving batch
    * and stream, so the alert threshold calibrated offline transfers
    * verbatim. One verdict row (batch_id, psi, n_a, n_b, n_bins) per
    * batch goes to `sink`; reference side is `n_a`. State lives in the
    * reference DataFrame (re-scanned per batch — broadcast-small by
    * contract, or pre-aggregate it), NOT the state store: at 100 TB the
    * per-batch cost is the batch scan plus a bins-sized merge. */
  def driftMonitor(stream: DataFrame, reference: DataFrame, c: Column,
      bins: Int = 10)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ops.Analytics.driftPsi(reference, batch, c, bins)
          .withColumn("batch_id", lit(batchId)), batchId)
      }

  /** Streaming EMBEDDING-drift monitor: per micro-batch, the
    * random-feature MMD² between the batch's vectors and a static
    * reference cohort ([[graft.functions.Similarity.mmdRff]]'s kernel
    * two-sample distance, scored batch-by-batch) — semantic drift in
    * an arriving embedding feed that scalar monitors ([[driftMonitor]]
    * over one column's PSI) cannot see: a topic shift that leaves
    * every marginal moment alone still moves the mean feature
    * embedding. The reference's D per-feature means are computed ONCE
    * (localCheckpoint) and re-joined per batch on the D-bounded
    * feature axis; per-batch work is one in-scan feature map + a
    * D-row rollup — cost tracks the batch, never the history.
    * Emits (batch_id, n, mmd2) per micro-batch. */
  def embeddingDriftMonitor(stream: DataFrame, reference: DataFrame,
      vecCol: String, numFeatures: Int = 64, gamma: Double = 1.0,
      seed: Long = 42L, dp: Int = 6)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.functions.Similarity
    // NULL vectors are dropped BEFORE the feature map on both sides:
    // rffFeatures(NULL) is a non-null array of nulls, so without this
    // filter the per-batch n counts rows that contribute nothing to
    // the feature means (ADVICE r13, same defect as mmdRff's).
    val refMeans = reference.where(col(vecCol).isNotNull)
      .select(posexplode(Similarity.rffFeatures(col(vecCol), numFeatures,
        gamma, seed)).as(Seq("__pos", "__v")))
      .groupBy("__pos").agg(avg(col("__v")).as("__mr"))
      .localCheckpoint(true) // one reference pass, reused every batch
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bm = batch.where(col(vecCol).isNotNull)
          .select(posexplode(Similarity.rffFeatures(col(vecCol),
            numFeatures, gamma, seed)).as(Seq("__pos", "__v")))
          .groupBy("__pos").agg(avg(col("__v")).as("__mb"),
            count(lit(1L)).as("__nb")) // each row lands once per feature
        val out = bm.join(refMeans, "__pos")
          .agg(coalesce(first(col("__nb")), lit(0L)).as("n"),
            round(coalesce(sum((col("__mb") - col("__mr")) *
              (col("__mb") - col("__mr"))), lit(0.0)), dp).as("mmd2"))
          .withColumn("batch_id", lit(batchId))
        sink(out, batchId)
      }
  }

  /** Watermarked stream-stream INTERVAL join — the attribution shape:
    * a right-side row matches a left-side row with the same `key` when
    * its timestamp lands in [l_ts, l_ts + within]. Both sides carry
    * watermarks, and the time-range predicate lets Spark bound the join
    * buffer: a buffered left row is evicted once the right watermark
    * passes l_ts + within (and symmetrically), so state is
    * O(arrival-rate · (watermark + within)) per side, NOT O(stream
    * history). Inner matches emit as soon as both rows have arrived —
    * no window-close wait. The left/right aliases survive into the
    * result: select `l.*` / `r.*` columns downstream. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lTs: String, rTs: String, watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(lTs, watermark).alias("l")
    val r = right.withWatermark(rTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rTs") >= col(s"l.$lTs") &&
        col(s"r.$rTs") <= col(s"l.$lTs") + expr(s"INTERVAL $within"))
  }

  /** Stream-static enrichment: join each micro-batch against a STATIC
    * dimension frame (user → account tier, item → category, host →
    * quality prior) — the lookup-table half of every streaming
    * pipeline. The dim side is hinted broadcast: micro-batches join
    * without shuffling the stream, stateless (nothing buffers across
    * batches, no watermark needed), and any stream output mode stays
    * legal. Spark re-plans the static side per micro-batch, so a dim
    * backed by a table/path picks up file-level updates between
    * batches; snapshot-pin a dim by `.cache()`-ing it first. Default
    * LEFT join: a stream row never drops because the dim is missing a
    * key — filter `dimCol.isNull` downstream to quarantine instead. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(keys.nonEmpty, "enrich needs at least one join key")
    stream.join(broadcast(dim), keys, joinType)
  }

  /** Continuous data-quality monitoring: the fused quick-check pass runs
    * per micro-batch (foreachBatch → Runner.verdictDF — one aggregate
    * scan of the batch, one verdict row out). `onBatch` receives
    * (batchId, verdict row); wire it to alerting or a report sink. The
    * stream itself is unmodified — this is a side-channel observer. */
  def checkMonitor(stream: DataFrame, checks: Seq[CheckSpec])(
      onBatch: (Long, Row) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) onBatch(batchId, Runner.verdictDF(batch, checks).head())
      }
}
