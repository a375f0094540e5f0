package graft.queries

import graft.ops.Analytics
import graft.queries.CheckQueries.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-grade relational extensions (SURVEY.md §7 Phase 3): joins,
  * windows, top-k, set ops, rollup/cube, event-time + session windows,
  * distinct counts, percentiles. Each has a DuckDB oracle except the
  * approx sketches (engine-specific results → rows-only check).
  *
  * Determinism rules for oracle parity: explicit ORDER BY with full
  * tie-breaks on both sides; `round(x, n)` on any double that accumulates
  * in engine-dependent order; counts CAST to BIGINT in DuckDB.
  */
object RelationalQueries {

  /** Right-censored signup→purchase durations (shared by q_survival's
    * Kaplan–Meier and q_hazard's Nelson–Aalen): per signup user, time to
    * first purchase at-or-after signup, censored at the corpus horizon. */
  private def signupToPurchaseDurations(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val signup = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(unix_timestamp(col("ts"))).as("s_ts"))
    val purchase = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), unix_timestamp(col("ts")).as("p_ts"))
    signup
      .join(purchase, col("p_uid") === col("user_id") &&
        col("p_ts") >= col("s_ts"), "left")
      .groupBy(col("user_id"), col("s_ts")).agg(min(col("p_ts")).as("c_ts"))
      .crossJoin(ev.agg(max(unix_timestamp(col("ts"))).as("__h")))
      .select((coalesce(col("c_ts"), col("__h")) - col("s_ts"))
          .cast("double").as("duration"),
        col("c_ts").isNotNull.as("is_event"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast dim join: orders ⋈ customer ⋈ nation, revenue per nation.
    // Dims broadcast → the fact side never shuffles for the join.
    "q_join_bcast" -> ((s, dir) =>
      Analytics.dimJoin(t(s, dir, "orders"), Seq(
          (t(s, dir, "customer"), col("o_custkey") === col("c_custkey")),
          (t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))))
        .groupBy("n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1L)).as("n_orders"))
        .orderBy("n_name")),

    // Fact-fact join: lineitem ⋈ orders (shuffle join on orderkey; AQE may
    // still broadcast at small SF), revenue by priority.
    "q_join_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
             count(lit(1L)).as("n_items"))
        .orderBy("o_orderpriority")),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1L)).as("n_with_orders"))
        .crossJoin(
          c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
            .agg(count(lit(1L)).as("n_without_orders")))
    }),

    // Per-group top-k via row_number window (WindowGroupLimit pushes the
    // top-k below the shuffle).
    "q_window_topk" -> ((s, dir) =>
      Analytics.topKPerGroup(t(s, dir, "lineitem"),
          Seq(col("l_suppkey")),
          Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"), col("rn"))
        .orderBy("l_suppkey", "rn")),

    // As-of join: each click event picks up the value of the user's most
    // recent purchase at or before its timestamp. Union + last-value
    // window — ONE shuffle on user_id, no range-join pair explosion.
    // Right side pre-aggregated to one row per (user, ts) so the match is
    // deterministic; DuckDB's native ASOF LEFT JOIN is the oracle.
    "q_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max(col("value")).as("asof_value"))
      // NULL-free output (has_match + sentinel) — a NULL double column
      // would hash as NaN and break engine-independent comparison
      Analytics.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts")
        .select(col("event_id"), col("user_id"),
          col("asof_value").isNotNull.as("has_match"),
          coalesce(col("asof_value"), lit(-1.0)).as("asof_value"))
        .orderBy("event_id")
    }),

    // Forward as-of: each click's NEXT purchase at-or-after its
    // timestamp — the same union + window plan with the frame reversed.
    "q_asof_fwd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max(col("value")).as("next_value"))
      Analytics.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
          direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("next_value").isNotNull.as("has_match"),
          coalesce(col("next_value"), lit(-1.0)).as("next_value"))
        .orderBy("event_id")
    }),

    // Interval (point-in-range) join via fixed-width bin equi-join — no
    // range-join pair explosion: per-event-type "first 30 minutes"
    // windows, counting ALL events landing inside each window. The
    // oracle is DuckDB's native inequality join; the engine must get
    // identical pairs from the binned equi-join + exact filter.
    "q_interval" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val iv = ev.groupBy(col("event_type").as("itype"))
        .agg(min(col("ts")).as("w_start"))
        .select(col("itype"), col("w_start"),
          (col("w_start") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      Analytics.binnedIntervalJoin(
          ev.select(col("event_id"), col("user_id"), col("ts")), "ts",
          iv, "w_start", "w_end", binSeconds = 1800L)
        .groupBy("itype")
        .agg(count(lit(1L)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("itype")
    }),

    // Running per-user aggregate over event time.
    "q_window_running" -> ((s, dir) =>
      Analytics.runningAgg(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          sum(col("value")), "running")
        .select(col("event_id"), col("user_id"), round(col("running"), 4).as("running"))
        .orderBy("event_id")),

    // Rolling 1-hour trailing window per user (count + sum): RANGE frame
    // over epoch seconds, one shuffle on user_id, single sorted pass.
    "q_rolling" -> ((s, dir) => {
      val r = Analytics.rollingTimeAgg(t(s, dir, "events"),
        Seq(col("user_id")), col("ts"), 3600,
        Seq(count(lit(1L)) -> "n_1h", sum(col("value")) -> "sum_1h"))
      r.select(col("event_id"), col("user_id"), col("n_1h"),
          round(col("sum_1h"), 4).as("sum_1h"))
        .orderBy("event_id")
    }),

    // Global top-k: TakeOrderedAndProject (k rows cross the network).
    "q_topk" -> ((s, dir) =>
      Analytics.topK(t(s, dir, "orders"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 10)
        .select("o_orderkey", "o_totalprice")),

    // Set operations over nation keys.
    "q_setops" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      c.intersect(su).agg(count(lit(1L)).as("n_both"))
        .crossJoin(c.except(su).agg(count(lit(1L)).as("n_cust_only")))
        .crossJoin(c.union(su).distinct().agg(count(lit(1L)).as("n_any")))
    }),

    // Hierarchical aggregates.
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1L)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("sum_qty"), col("n"))
        .orderBy("rf", "ls")),

    // CUBE rollup over two dimensions with grouping-id disambiguation.
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1L)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("pri"), col("n"))
        .orderBy("st", "pri")),

    // Tumbling event-time window (batch twin of the streaming path).
    "q_timewindow" -> ((s, dir) =>
      Analytics.tumblingAgg(t(s, dir, "events"), col("ts"), "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1L)).as("n"), round(sum("value"), 4).as("sum_value")))
        .select("w_start", "event_type", "n", "sum_value")
        .orderBy("w_start", "event_type")),

    // Streaming↔batch parity, oracle-visible: the SAME tumbling-window
    // aggregation as q_timewindow computed through Structured Streaming —
    // readStream over the events parquet, complete-mode windowed agg into
    // a memory sink, one AvailableNow pass — and returned as the query
    // result, which the driver hash-compares against the BATCH oracle in
    // DuckDB. Batch/stream unification is the whole point of declaring
    // the agg once; this makes it a correctness gate instead of a
    // ScalaTest-only assertion. Complete output mode is the HARNESS
    // choice (full result table over a bounded fixture, no watermark
    // cutoff to mirror in the oracle); unbounded production streams use
    // the append+watermark operators in streaming/Streams.scala, whose
    // state stays bounded.
    "q_stream_parity" -> ((s, dir) => {
      // the file-stream source monitors a DIRECTORY (that is its contract
      // — files arrive over time); the testdata table is a single file,
      // so stage it once into the build-output fixture area
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream")
      val staged = new java.io.File(stage, "events.parquet")
      // copy unconditionally: a stale staged copy after an in-place
      // fixture regen would silently diverge from the DuckDB oracle
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), staged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // same raw schema + ts normalization as the batch loader
      // (Sources.table): nanos-as-long and µs-NTZ encodings both map to
      // the session-timezone TimestampType the window/watermark ops need
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val stream = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select("ts", "event_type", "value")
      val counted = stream
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1L)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
      // per-dir sink name: active stream names must be session-unique,
      // and a lingering view from a prior (possibly failed) run for a
      // different dir must not be read back as this run's result
      val sink = s"q_stream_parity_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // state partitions sized by expected state volume (complete-mode
      // aggregate state ≤ the drained input), not the session core
      // count — see Streams.statePartitions (r17)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = counted.writeStream.format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(sink).orderBy("w_start", "event_type")
    }),

    // Streaming top-k: the stream maintains (event_type, user) counts as
    // complete-mode state (ranking is not a streaming-supported op — and
    // should not be: the top-k of an evolving aggregate is a READ-time
    // question); the rank-≤3 cut runs over the materialized state table,
    // partitioned by event_type (bounded groups). Hash-matched against
    // the batch oracle.
    "q_stream_topk" -> ((s, dir) => {
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream")
      val staged = new java.io.File(stage, "events.parquet")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), staged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val stream = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select("event_type", "user_id")
      val counted = stream.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1L)).as("n"))
      val sink = s"q_stream_topk_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // state partitions sized by expected state volume (complete-mode
      // aggregate state ≤ the drained input), not the session core
      // count — see Streams.statePartitions (r17)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = counted.writeStream.format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("n").desc, col("user_id"))
      s.table(sink)
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .orderBy("event_type", "rk")
    }),

    // Funnel analysis: view → click → purchase completion within 2 hours
    // of each user's FIRST view, strict step succession. One shuffle on
    // user + an in-scan sorted array fold (state machine) — no per-step
    // self-join cascade; the DuckDB oracle restates the same semantics
    // as stepwise min() inequality joins.
    "q_funnel" -> ((s, dir) =>
      Analytics.funnel(t(s, dir, "events"), col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"), "2 hours")),

    // Stream-stream watermarked interval join (attribution): purchases
    // landing within 30 minutes of a same-user view, as TWO file
    // streams inner-joined with the time-range predicate that lets
    // Spark evict join state behind the watermark. AvailableNow drains
    // the backlog in one pass; the appended pairs aggregate in batch to
    // per-user attribution counts the DuckDB inequality join recomputes
    // exactly (StreamingSpec proves the cross-micro-batch buffering and
    // late-arrival drop semantics the one-shot drain can't show).
    "q_stream_join" -> ((s, dir) => {
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream_j")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        new java.io.File(stage, "events.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      def src = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select("ts", "user_id", "event_type")
      val views = src.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      val buys = src.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("b_ts"))
      val pairs = graft.streaming.Streams.intervalJoin(
          views, buys, "user_id", "v_ts", "b_ts", "10 minutes", "30 minutes")
        .select(col("l.user_id").as("user_id"), col("v_ts"), col("b_ts"))
      val sink = s"q_stream_join_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // state partitions sized by expected state volume (both join
      // sides buffer within-watermark rows ≤ the drained input), not
      // the session core count — see Streams.statePartitions (r17)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = pairs.writeStream.format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(sink).groupBy("user_id")
        .agg(count(lit(1L)).as("n_attributed"))
        .orderBy("user_id")
    }),

    // Session windows (30 min gap) → sessions/events per user.
    "q_session" -> ((s, dir) =>
      Analytics.sessionAgg(t(s, dir, "events"), col("ts"), "30 minutes",
          Seq(col("user_id")), Seq(count(lit(1L)).as("cnt")))
        .groupBy("user_id")
        .agg(count(lit(1L)).as("n_sessions"), sum("cnt").as("n_events"))
        .orderBy("user_id")),

    // Exact distinct counts (shuffle-dedup partial aggregates).
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1L)).as("n_rows"))),

    // HLL sketches — constant memory at any scale. Made oracle-VISIBLE:
    // the exact distinct counts anchor the row (DuckDB recomputes them)
    // and the sketch estimates are verified in-engine within 15% — three
    // times the configured rsd (0.05 is a relative STANDARD DEVIATION,
    // a ~1σ miss rate of one in three; the 3σ band is a meaningful gate
    // that stays stable across regenerated data). The driver's check is
    // now "HLL error within 3·rsd", not "returns rows".
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey"))) * 100
          <= countDistinct(col("l_partkey")) * 15).as("parts_err_ok"),
        (abs(approx_count_distinct(col("l_orderkey")) - countDistinct(col("l_orderkey"))) * 100
          <= countDistinct(col("l_orderkey")) * 15).as("orders_err_ok"))),

    // Sliding event-time windows (1 h wide, 30 min slide): each event
    // lands in two windows via Expand before the partial aggregate.
    "q_slidewindow" -> ((s, dir) =>
      Analytics.slidingAgg(t(s, dir, "events"), col("ts"),
          "1 hour", "30 minutes", Seq(col("event_type")),
          Seq(count(lit(1L)).as("n"), round(sum("value"), 4).as("sum_value")))
        .select(col("w_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    // Pre-flight key-skew diagnostic: hottest event types with share,
    // ratio-to-mean-key-load, and the salt factor bounding a reducer at
    // 1000 rows — one scan + TakeOrdered at any corpus size.
    "q_skew_diag" -> ((s, dir) =>
      graft.ops.Skew.diagnoseKeys(t(s, dir, "events"), col("event_type"),
        topK = 10, targetRowsPerTask = 1000L)),

    // Incremental distinct via mergeable HLL sketches: per-half sketches
    // of the user population, merged WITHOUT rescanning — the
    // sketch-union estimate must (a) sit within the error bound, and
    // (b) equal the single-pass whole-corpus sketch estimate exactly
    // (register-wise max union is partitioning-invariant).
    "q_hll_incremental" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val halves = ev.withColumn("half",
        when(col("event_id") % 2 === 0, lit("a")).otherwise(lit("b")))
      val sk = graft.functions.Sketches.distinctSketches(
        halves, Seq(col("half")), col("user_id"))
      val unionEst = sk.agg(graft.functions.Sketches
        .mergedDistinctEstimate(col("sketch")).as("est_u"))
      val fullEst = ev.agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("est_f"))
      ev.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(unionEst).crossJoin(fullEst)
        .select(col("n_users"),
          (abs(col("est_u") - col("n_users")) * 100 <= col("n_users") * 5)
            .as("union_err_ok"),
          (abs(col("est_f") - col("n_users")) * 100 <= col("n_users") * 5)
            .as("full_err_ok"),
          (col("est_u") === col("est_f")).as("union_matches_full"))
    }),

    // Mergeable KLL quantile sketches — the rank counterpart of
    // q_hll_incremental: persist per-group blobs once, answer any later
    // percentile question (per group or rolled up) by merging KB blobs.
    // Verdicts bound each estimate's TRUE rank: est p-q must land between
    // the exact (q−ε) and (q+ε) quantiles (ε=0.05 ≫ KLL k=200's ~1.65%
    // rank error, so the verdict is stable under sketch randomization).
    "q_quantile_sketch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sk = ev.groupBy("event_type")
        .agg(graft.functions.Kll.sketchAgg(col("value")).as("qs"),
          count(lit(1L)).as("n"),
          expr("percentile(value, array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))").as("ex"))
      val perGroup = sk.select(col("event_type"), col("n"),
        graft.functions.Kll.quantiles(col("qs"), Seq(0.5, 0.9)).as("est"),
        col("ex"))
      val groups = perGroup.select(col("event_type"), col("n"),
        round(col("ex").getItem(1), 4).as("p50_exact"),
        round(col("ex").getItem(4), 4).as("p90_exact"),
        (col("est").getItem(0) >= col("ex").getItem(0) &&
          col("est").getItem(0) <= col("ex").getItem(2)).as("p50_ok"),
        (col("est").getItem(1) >= col("ex").getItem(3) &&
          col("est").getItem(1) <= col("ex").getItem(5)).as("p90_ok"))
      // rollup: merged per-group blobs vs the whole corpus's exact p50
      val merged = sk.agg(graft.functions.Kll.mergeAgg(col("qs")).as("m"))
        .select(graft.functions.Kll.quantiles(col("m"), Seq(0.5)).getItem(0).as("mp50"))
      val wholeEx = ev.agg(
        expr("percentile(value, array(0.45, 0.55))").as("wex"))
      val rollup = merged.crossJoin(wholeEx).select(
        (col("mp50") >= col("wex").getItem(0) &&
          col("mp50") <= col("wex").getItem(1)).as("rollup_ok"))
      groups.crossJoin(rollup).orderBy("event_type")
    }),

    // Exact percentiles (interpolated, R-7 — same method as DuckDB's
    // quantile_cont).
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"))),

    // In-engine binary-classifier evaluation: tie-aware ROC-AUC (Mann-
    // Whitney over the distinct-score histogram CDF — never a corpus
    // sort through one reducer) + quadratic (Brier-style) error.
    "q_auc" -> ((s, dir) =>
      Analytics.aucBrier(t(s, dir, "lineitem"),
        col("l_discount"), (col("l_quantity") > 25).cast("int"))),

    // DeLong paired-AUC comparison of the two q_mcnemar pseudo-scorers
    // on the q_mcnemar label: mid-rank structural components (Sun & Xu
    // 2014) accumulated as exact scaled integers, covariance-corrected
    // z for "is A's AUC really higher than B's on these SAME docs".
    "eval_delong" -> ((s, dir) =>
      Analytics.delongTest(t(s, dir, "documents"),
        col("n_chars") % 97, col("n_chars") % 89,
        (col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0).cast("int"))),

    // PR-curve readout of the SAME scorer/label as q_auc: average
    // precision (sklearn step convention — every distinct score is one
    // threshold block; 11 discount levels plant heavy tie blocks) and
    // the best F1 along the curve. The imbalance-honest companion of
    // the ROC row above.
    "eval_avg_precision" -> ((s, dir) =>
      Analytics.averagePrecision(t(s, dir, "lineitem"),
        col("l_discount"), (col("l_quantity") > 25).cast("int"))),

    // Exact join-size pre-flight from per-key counts — predicts
    // |lineitem ⋈ orders| without running the join; the verdict proves
    // the prediction equals the actual join's row count.
    "q_join_size" -> ((s, dir) => {
      val est = graft.ops.Skew.joinSizeEstimate(
        t(s, dir, "lineitem"), col("l_orderkey"),
        t(s, dir, "orders"), col("o_orderkey"))
      val actual = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1L)).as("actual_rows"))
      est.crossJoin(actual)
        .select(col("join_rows"), col("n_keys_both"), col("max_key_pairs"),
          (col("join_rows") === col("actual_rows")).as("matches_actual"))
    }),

    // Interval × interval overlap join, binned: user-1 half-hour windows
    // against user-2 one-hour windows — bin equi-join candidates,
    // distinct, exact inclusive-overlap filter; no nested-loop range
    // join. Verdict aggregates pin pair count and overlap mass.
    "q_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.where(col("user_id") === 1)
        .select(col("event_id").as("a_id"),
          unix_timestamp(col("ts")).as("a_start"),
          (unix_timestamp(col("ts")) + 1800).as("a_end"))
      val b = ev.where(col("user_id") === 2)
        .select(col("event_id").as("b_id"),
          unix_timestamp(col("ts")).as("b_start"),
          (unix_timestamp(col("ts")) + 3600).as("b_end"))
      Analytics.binnedOverlapJoin(a, "a_start", "a_end", b, "b_start", "b_end",
          binSize = 3600)
        .select(col("a_id"), col("b_id"),
          (least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start"))).as("ov"))
        .agg(count(lit(1L)).as("n_pairs"),
          sum(col("ov")).as("sum_overlap_sec"),
          max(col("ov")).as("max_overlap_sec"))
    }),

    // Streaming expanding-history z-score anomalies (Welford state in
    // flatMapGroupsWithState), drained via AvailableNow and rolled up
    // per user — the oracle restates the whole stream as an expanding
    // window (rows unbounded preceding .. 1 preceding).
    "q_stream_anomaly" -> ((s, dir) => {
      import s.implicits._
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        new java.io.File(stage, "events.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val stream = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .where(col("user_id") < 8 && col("value").isNotNull)
        .select(col("user_id").cast("string"), col("event_id"), col("value"))
        .as[(String, Long, Double)]
      val scored = graft.streaming.Streams.anomalyMonitor(stream, k = 3.0)
      val sink = s"q_stream_anomaly_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // state volume = the 8 monitored keys' Welford tuples (rows drain
      // through); sized by data volume, not core count (r17)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = scored.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(sink)
        .groupBy(col("key").cast("long").as("user_id"))
        .agg(count(lit(1L)).as("n_events"),
          count(col("z")).as("n_scored"),
          sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
          round(sum(abs(col("z"))), 4).as("sum_abs_z"))
        .orderBy("user_id")
    }),

    // Dense-grid regularization + forward fill of a bucketed series:
    // missing 30-min buckets of each user's span are generated in-scan
    // (sequence+explode from the 1-row span) and forward-filled — the
    // gap-filling step before anything that assumes regular sampling.
    "q_resample" -> ((s, dir) => {
      val obs = t(s, dir, "events").where(col("user_id") < 6)
        .groupBy(col("user_id"),
          (floor(unix_timestamp(col("ts")) / 1800) * 1800).cast("long").as("bucket"))
        .agg(round(max(col("value")), 4).as("v"))
      Analytics.regularizeSeries(obs, Seq("user_id"), "bucket", "v", 1800)
        .orderBy("user_id", "bucket")
    }),

    // Chi-square independence between event type and a user bucket —
    // categorical drift/leakage testing with Cramér's V effect size.
    // One (a,b) cell aggregation; marginals derived from the same cell
    // table; absent cells folded in via the Σ_all E = n identity.
    "q_chi2" -> ((s, dir) =>
      Analytics.chiSquare(t(s, dir, "events"),
        col("event_type"), col("user_id") % 5)),

    // Finite-window EWMA trend smoothing per user (window 5, α=0.5):
    // one window collect + an in-scan weighted fold — single exchange,
    // no self-join. The oracle restates the same weights via a bounded
    // row_number inequality join.
    "q_ewma" -> ((s, dir) =>
      Analytics.ewma(
          t(s, dir, "events").where(col("user_id") < 10)
            .select("event_id", "user_id", "ts", "value"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), alpha = 0.5, window = 5)
        .select("event_id", "ewma").orderBy("event_id")),

    // Rolling z-score anomalies: events more than 3 rolling stddevs
    // from their user's trailing-hour HISTORY (current row excluded —
    // see rollingAnomalies). Flag from rounded stats —
    // engine-deterministic boundary.
    // Per-type rollup (counts thin histories separately) so the result
    // has rows at EVERY scale factor — an anomaly-free window is data,
    // not an empty result; flagged-event detail stays on the API.
    // CUSUM changepoint per event type over daily volumes: WHERE the
    // series most likely shifted (PSI/mean-shift say whether, this
    // says when) — one key-partitioned exchange end to end.
    "q_cusum_changepoint" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1L)).cast("double").as("x"))
      Analytics.cusumChangepoint(daily, col("event_type"), col("day"),
          col("x"))
        .orderBy("key")
    }),

    // Pettitt rank change-point over the event value stream (total
    // order (ts, event_id)): the nonparametric "did the distribution
    // shift, and when" beside q_cusum_changepoint's mean-model CUSUM.
    // Doubled tie-averaged ranks keep U_t exactly integer.
    "q_pettitt" -> ((s, dir) =>
      Analytics.pettittTest(t(s, dir, "events"),
        Seq(col("ts"), col("event_id")), col("value"))),

    // Rolling z-score anomaly flags over a daily event series (trailing window mean/stddev, warmup NULLs).
    "q_anomaly" -> ((s, dir) =>
      Analytics.rollingAnomalies(t(s, dir, "events"), Seq(col("user_id")),
          col("ts"), 3600, col("value"), k = 3.0)
        .groupBy("event_type")
        .agg(count(lit(1L)).as("n_events"),
          sum(when(col("roll_std").isNull, 1L).otherwise(0L)).as("n_thin"),
          sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
          round(max(when(col("is_anomaly"), col("value"))), 4).as("max_anomaly_value"))
        .orderBy("event_type")),

    // Distribution drift (PSI, 10 equi-width bins over the combined
    // range, Laplace-smoothed): view-event values vs purchase-event
    // values — the snapshot/train-serve monitoring gate.
    // Log-rank two-arm survival comparison over per-user event counts
    // (the hypothesis test the Kaplan-Meier curve lacks): one
    // (time, arm) rollup, at-risk sets from per-arm running sums over
    // the distinct-time-bounded table, censoring honored.
    "q_logrank" -> ((s, dir) => {
      val subj = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1L)).as("t_obs"))
        .select(col("t_obs"), (col("user_id") % 4 =!= 0).as("ev"),
          (graft.ops.DataPrep.hashBucket(col("user_id"), 2) === 0)
            .as("arm_a"))
      graft.ops.Analytics
        .logRankTest(subj, col("t_obs"), col("ev"), col("arm_a"))
    }),

    // Wald SPRT per event type over a deterministic Bernoulli outcome:
    // key-partitioned cumulative LLR walk, first-crossing decision
    // against the alpha/beta thresholds; no single-reducer stage.
    "q_sprt" -> ((s, dir) =>
      graft.ops.Analytics.sprt(
          t(s, dir, "events"), col("event_type"),
          Seq(col("ts"), col("event_id")),
          graft.ops.DataPrep.hashBucket(col("event_id"), 100) < 35,
          p0 = 0.3, p1 = 0.5)
        .orderBy("key")),

    // Streaming drift monitor: the SAME driftPsi operator scored per
    // micro-batch (3 file-arrival batches of the purchase stream vs the
    // static view-events reference) through foreachBatch — the offline
    // PSI threshold transfers verbatim. The oracle restates all three
    // batch verdicts from the deterministic event_id % 3 batch split.
    "q_stream_drift" -> ((s, dir) => {
      val root = new java.io.File(
        s"/root/repo/target/fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/drift_stream")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(root); root.mkdirs()
      val stage = new java.io.File(root, "arrivals"); stage.mkdirs()
      val ev = t(s, dir, "events")
      val purch = ev.where(col("event_type") === "purchase")
        .select("event_id", "value")
      val now = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(root, s"__tmp$i")
        purch.where(pmod(col("event_id"), lit(3)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(stage, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        wipe(tmp)
        dst.setLastModified(now - 300000L + i * 60000L)
      }
      val schema = s.read.parquet(s"${stage.getPath}/b0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.getPath)
      val ref = ev.where(col("event_type") === "view")
      val out = s"$root/out"
      val q = graft.streaming.Streams
        .driftMonitor(stream, ref, col("value"), bins = 10) { (df, _) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.read.parquet(out)
        .select(col("batch_id"), round(col("psi"), 6).as("psi"),
          col("n_a"), col("n_b"), col("n_bins"))
        .orderBy("batch_id")
    }),

    // Streaming cumulative quantile monitor: 3 file-arrival batches of
    // the purchase stream fold into ONE persisted KLL blob (mergeable
    // state, bytes not rows); after the stream drains, every per-batch
    // estimate is rank-checked EXACTLY against the cumulative prefix it
    // summarized (|frac(v <= est) - q| <= 4% band, generous vs the
    // k=200 sketch's ~1.7% guarantee). Oracle anchors the cumulative
    // counts per batch and restates the verdict grid.
    // Streaming deterministic bottom-k key sample: three event batches
    // through sampleMonitor, final sample = the 32 smallest md5(user)
    // priorities over every user seen — which the oracle recomputes
    // directly (zero randomness, stream/batch parity by construction).
    "q_stream_sample" -> ((s, dir) => {
      val root = new java.io.File(
        s"/root/repo/target/fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/sample_stream")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(root); root.mkdirs()
      val stage = new java.io.File(root, "arrivals"); stage.mkdirs()
      val ev = t(s, dir, "events").select("event_id", "user_id")
      val now = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(root, s"__tmp$i")
        ev.where(pmod(col("event_id"), lit(3)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(stage, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        wipe(tmp)
        dst.setLastModified(now - 300000L + i * 60000L)
      }
      val schema = s.read.parquet(s"${stage.getPath}/b0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.getPath)
      val out = s"$root/out"
      val q = graft.streaming.Streams
        .sampleMonitor(stream, col("user_id"), s"$root/state", k = 32) {
          (df, _) => df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.read.parquet(out).where(col("batch_id") === 2)
        .select(col("key"), col("priority"))
        .orderBy("priority", "key")
    }),

    // Streaming cumulative quantile monitor: per-micro-batch KLL merge into one persisted blob, estimates rank-checked.
    "q_stream_quantile" -> ((s, dir) => {
      val qs = Seq(0.5, 0.9, 0.99)
      val root = new java.io.File(
        s"/root/repo/target/fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/quantile_stream")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(root); root.mkdirs()
      val stage = new java.io.File(root, "arrivals"); stage.mkdirs()
      val ev = t(s, dir, "events")
      val purch = ev.where(col("event_type") === "purchase")
        .select("event_id", "value")
      val now = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(root, s"__tmp$i")
        purch.where(pmod(col("event_id"), lit(3)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(stage, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        wipe(tmp)
        dst.setLastModified(now - 300000L + i * 60000L)
      }
      val schema = s.read.parquet(s"${stage.getPath}/b0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.getPath)
      val out = s"$root/out"
      val q = graft.streaming.Streams
        .quantileMonitor(stream, col("value"), s"$root/state", qs) { (df, _) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val est = s.read.parquet(out)
        .select(col("batch_id"), col("n_seen"),
          posexplode(col("estimates")).as(Seq("qi", "est")))
        .collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("n_seen"),
          qs(r.getAs[Int]("qi")), r.getAs[Double]("est")))
        .sortBy(x => (x._1, x._3))
      // exact rank of every estimate over the cumulative prefix it
      // summarized — ONE aggregation job for all 9 (batch, q) cells
      val cells = est.zipWithIndex.flatMap { case ((b, _, _, e), i) =>
        Seq(sum(when(pmod(col("event_id"), lit(3)) <= b &&
            col("value") <= e, 1.0).otherwise(0.0)).as(s"__hit$i"),
          sum(when(pmod(col("event_id"), lit(3)) <= b &&
            col("value").isNotNull, 1.0).otherwise(0.0)).as(s"__n$i"))
      }
      val fr = purch.agg(cells.head, cells.tail: _*).head()
      val rows = est.zipWithIndex.map { case ((b, n, qq, _), i) =>
        val frac = fr.getAs[Double](s"__hit$i") / fr.getAs[Double](s"__n$i")
        (b, qq, n, math.abs(frac - qq) <= 0.04)
      }
      import s.implicits._
      rows.toSeq.toDF("batch_id", "q", "n_seen", "rank_ok")
        .orderBy("batch_id", "q")
    }),

    // ACF + PACF (Durbin-Levinson) of the hourly event-count series:
    // the window rides the time-resolution-bounded bucket table (the
    // kaplanMeier argument); one pass carries all leads; PACF is
    // bounded driver recursion the oracle unrolls in closed form.
    "q_acf" -> ((s, dir) => {
      val series = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1L)).cast("double").as("x"))
      Analytics.acfPacf(series, Seq(col("h")), col("x"), maxLag = 3)
    }),

    // Ljung-Box whiteness verdict over the same hourly series/moments
    "q_ljung_box" -> ((s, dir) => {
      val series = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1L)).cast("double").as("x"))
      Analytics.ljungBox(series, Seq(col("h")), col("x"), maxLag = 3)
    }),

    // Streaming cumulative distinct-user monitor: 3 file-arrival
    // batches fold into ONE persisted HLL blob; each per-batch estimate
    // is checked against the exact distinct count of the prefix it
    // summarized (4% band vs lgK=12's ~1.6% standard error). The oracle
    // anchors the exact prefix counts and restates the verdicts.
    "q_stream_distinct" -> ((s, dir) => {
      val root = new java.io.File(
        s"/root/repo/target/fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/distinct_stream")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(root); root.mkdirs()
      val stage = new java.io.File(root, "arrivals"); stage.mkdirs()
      val ev = t(s, dir, "events").select("event_id", "user_id")
      val now = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(root, s"__tmp$i")
        ev.where(pmod(col("event_id"), lit(3)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(stage, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        wipe(tmp)
        dst.setLastModified(now - 300000L + i * 60000L)
      }
      val schema = s.read.parquet(s"${stage.getPath}/b0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.getPath)
      val out = s"$root/out"
      val q = graft.streaming.Streams
        .distinctMonitor(stream, col("user_id"), s"$root/state") { (df, _) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val est = s.read.parquet(out).collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Long]("n_rows_seen"), r.getAs[Long]("distinct_estimate")))
        .sortBy(_._1)
      // exact prefix distincts in ONE aggregation
      val exacts = est.map { case (b, _) =>
        countDistinct(when(pmod(col("event_id"), lit(3)) <= b,
          col("user_id"))).as(s"__d$b")
      }
      val ex = ev.agg(exacts.head, exacts.tail: _*).head()
      import s.implicits._
      est.map { case (b, (n, e)) =>
        val d = ex.getAs[Long](s"__d$b")
        (b, n, d, math.abs(e - d) <= 0.04 * d)
      }.toSeq.toDF("batch_id", "n_rows_seen", "n_exact", "est_ok")
        .orderBy("batch_id")
    }),

    // Per-source PSI against the POOLED length distribution — "which
    // source drifted" triage: one (slice, bin) rollup is the only
    // corpus exchange, the pooled histogram rolls up from it.
    "q_slice_psi" -> ((s, dir) =>
      Analytics.psiBySlice(t(s, dir, "documents"),
        col("source"), col("n_chars"), bins = 10)),

    // Population stability index between two cohorts on shared bins with add-epsilon smoothing.
    "q_drift_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Analytics.driftPsi(
          ev.where(col("event_type") === "view"),
          ev.where(col("event_type") === "purchase"),
          col("value"), bins = 10)
        .select(round(col("psi"), 6).as("psi"),
          col("n_a"), col("n_b"), col("n_bins"))
    }),

    // Pearson + covariance + Spearman (fractional ranks via the
    // value-histogram CDF, not a per-row global sort window).
    "q_corr" -> ((s, dir) =>
      Analytics.correlationStats(t(s, dir, "lineitem"),
          col("l_quantity"), col("l_extendedprice"))
        .select(round(col("pearson"), 6).as("pearson"),
          round(col("covar"), 2).as("covar"),
          round(col("spearman"), 6).as("spearman"))),

    // Partial correlation of quantity and revenue with the discount
    // regressed out of both: one fused 9-sum moment scan, 1-row closed
    // form — q_corr's confounder-aware companion.
    "q_partial_corr" -> ((s, dir) =>
      Analytics.partialCorr(t(s, dir, "lineitem"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))),

    // PSI drift time series: every day's value distribution vs the
    // first day (driftPsi's conventions unrolled over periods); the
    // baseline day must read exactly 0.
    "q_psi_over_time" -> ((s, dir) =>
      Analytics.psiOverTime(t(s, dir, "events"), col("ts"), col("value"))),

    // Full pairwise correlation matrix in ONE scan (k + k(k-1)/2
    // var/covar aggregates fused into a single map-side-partial job,
    // never a corr() re-scan per pair).
    "q_corr_matrix" -> ((s, dir) =>
      Analytics.corrMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // OHLC bars per (event_type, day): open/close deterministic under
    // ties via the (ts, event_id) composite order; one groupBy, all
    // seven outputs map-side-partial built-ins.
    "q_ohlc" -> ((s, dir) =>
      Analytics.ohlcBars(t(s, dir, "events"), col("event_type"),
          col("ts"), col("event_id"), col("value"))
        .orderBy("bucket", "grp")),

    // Robust stats (oracle-audit exact-percentile mode; the operator's
    // default is the mergeable approx sketch): 5%-trimmed mean +
    // winsorized stddev of the price column.
    // Rank-biased overlap between two per-lang top-10 rankings (by
    // length vs by a pseudo-random key): one equi-join + a broadcast
    // suffix-weight lookup; windows ride bounded per-lang groups.
    "q_rbo" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val a = d.select(col("lang"), col("doc_id"),
        row_number().over(Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))).as("rank"))
      val b = d.select(col("lang"), col("doc_id"),
        row_number().over(Window.partitionBy("lang")
          .orderBy((col("doc_id") % 97).asc, col("doc_id"))).as("rank"))
      Analytics.rankBiasedOverlap(a, b, "lang", "doc_id", "rank",
        p = 0.9, k = 10).orderBy("qid")
    }),

    // Retrieval evaluation: a deterministic term-frequency run (top-10
    // docs per query term, exact token counts — no floats in the
    // ranking) scored against graded judgments derived from the same
    // counts. MRR / nDCG@10 / precision / recall per query; windows
    // ride per-query groups.
    "q_retrieval_eval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select("doc_id", "text")
      def cnt(term: String) =
        size(filter(split(col("text"), " "), w => w === term))
      val scored = Seq(1L -> "spark", 2L -> "join", 3L -> "window").map {
        case (qid, term) => d.select(lit(qid).as("query_id"),
          col("doc_id"), cnt(term).cast("long").as("cnt"))
          .where(col("cnt") >= 1L)
      }.reduce(_ unionByName _)
      val w = Window.partitionBy("query_id")
        .orderBy(col("cnt").desc, col("doc_id"))
      val run = scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10).select("query_id", "doc_id", "rank")
      val qrels = scored.select(col("query_id"), col("doc_id"),
        when(col("cnt") >= 3L, 2.0).otherwise(1.0).as("rel"))
      Analytics.retrievalMetrics(run, qrels, "query_id", "doc_id",
        "rank", "rel", k = 10).orderBy("query_id")
    }),

    // Inter-annotator agreement: two deterministic "raters" label docs
    // long/short — one by the raw length threshold, one through a
    // doc_id-derived perturbation — and Cohen's kappa corrects their
    // raw agreement for chance. Everything after the item join rides
    // the 2x2 confusion rollup.
    "q_kappa" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id"),
        when(col("n_chars") >= 300, "long").otherwise("short").as("label"))
      val b = d.select(col("doc_id"),
        when(col("n_chars") + col("doc_id") % 50 >= 300, "long")
          .otherwise("short").as("label"))
      Analytics.cohenKappa(a, b, "doc_id", "label")
    }),

    // Two-sample KS drift test, en vs rest on doc length: CDFs ride
    // the distinct-value histogram through two-phase cumulative sums
    // (no single-reducer window over data rows).
    "q_ks_test" -> ((s, dir) =>
      Analytics.ksTest(t(s, dir, "documents"), col("n_chars"),
        col("lang") === "en")),

    // Sharp regression discontinuity with a PLANTED +10 jump at the
    // cutoff of a pseudo running variable: two side-local linear fits
    // from one conditional-moment scan; the estimate recovers the jump.
    "q_rdd" -> ((s, dir) =>
      Analytics.rddEffect(t(s, dir, "documents"),
        col("n_chars") % 200,
        (col("n_chars") % 89) +
          when(col("n_chars") % 200 >= 100, 10).otherwise(0),
        cutoff = 100.0, bandwidth = 50.0)),

    // Cochran-Armitage trend of the q_mcnemar label rate across the
    // five langs in alphabetical order: the binary-outcome sibling of
    // q_jonckheere, integer scores 0..4, exact moments.
    "q_cochran_armitage" -> ((s, dir) =>
      Analytics.cochranArmitage(t(s, dir, "documents"),
        col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0,
        col("lang"), Seq("de", "en", "es", "fr", "zh"))),

    // SMD covariate-balance table for a pseudo-treatment (doc_id%3):
    // the observational-study pre-flight — one fused scan, one row per
    // covariate, |SMD| < 0.1 balance verdicts.
    "q_smd_balance" -> ((s, dir) =>
      Analytics.smdBalance(t(s, dir, "documents"),
        col("doc_id") % 3 === 0,
        Seq("n_chars" -> col("n_chars"),
          "len_mod97" -> (col("n_chars") % 97),
          "id_mod13" -> (col("doc_id") % 13)))),

    // CUPED variance reduction: per-user event counts, first time half
    // as the pre-period covariate, second half as the metric, arm =
    // even user id. Integer counts keep every moment exact; theta and
    // both lifts come from ONE arm-keyed rollup.
    "q_cuped" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val b = ev.agg(min(unix_timestamp(col("ts"))).as("__mn"),
        max(unix_timestamp(col("ts"))).as("__mx"))
      val per = ev.crossJoin(broadcast(b)).groupBy("user_id")
        .agg(sum(when(unix_timestamp(col("ts")) * 2 <
            col("__mn") + col("__mx"), 1L).otherwise(0L)).as("x"),
          sum(when(unix_timestamp(col("ts")) * 2 >=
            col("__mn") + col("__mx"), 1L).otherwise(0L)).as("y"))
      Analytics.cupedLift(per, col("y"), col("x"),
        col("user_id") % 2 === 0)
    }),

    // Difference-in-differences on the same panel: per-(user, period)
    // event counts, treated = even user id — the causal lift under
    // parallel trends, four-cell Welch SE.
    "q_did" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val b = ev.agg(min(unix_timestamp(col("ts"))).as("__mn"),
        max(unix_timestamp(col("ts"))).as("__mx"))
      val per = ev.crossJoin(broadcast(b))
        .groupBy(col("user_id"),
          (unix_timestamp(col("ts")) * 2 >= col("__mn") + col("__mx"))
            .as("post"))
        .agg(count(lit(1L)).as("y"))
      Analytics.diffInDiff(per, col("y"), col("user_id") % 2 === 0,
        col("post"))
    }),

    // Fixed-frequency periodogram over daily event counts: which cycle
    // (2-8 days) dominates, from one statically-unrolled cos/sin
    // aggregation on the centered series — the dominant-period
    // detector beside q_seasonal's given-period decomposition.
    "q_periodogram" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(dayofmonth(col("ts")).as("d"))
        .agg(count(lit(1L)).as("y"))
      Analytics.periodogram(daily, col("d"), col("y"), (2 to 8))
    }),

    // Granger lag-1 on the daily (value-sum -> event-count) pair: does
    // yesterday's traffic value predict today's activity beyond
    // activity's own lag — predictive precedence, no intervention
    // needed; both nuisance OLS fits Cholesky-unrolled by the oracle.
    "q_granger" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1L)).as("y"), sum(col("value")).as("x"))
      Analytics.grangerTest(daily, col("d"), col("y"), col("x"))
    }),

    // Theil T inequality of per-customer revenue beside q_gini's
    // Lorenz view: top-tail-exact, ln(n)-normalized for cross-table
    // comparability.
    "q_theil_inequality" -> ((s, dir) =>
      Analytics.theilInequality(t(s, dir, "orders"),
        col("o_custkey"), col("o_totalprice"))),

    // Two-sample Poisson rate-ratio on per-user (purchases, active
    // days): count-per-exposure inference — the metric family where
    // the denominator is TIME, not trials.
    "q_rate_ratio" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("ev"),
          countDistinct(to_date(col("ts"))).as("days"))
      Analytics.rateRatioTest(perUser, col("user_id") % 2 === 0,
        col("ev"), col("days"))
    }),

    // Poisson overdispersion verdict on per-user event counts: VMR
    // chi-square via the sqrt-2-chi2 normal form — bursty (bots,
    // retries) rejects high, suspiciously regular (cron) rejects low.
    "q_overdispersion" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1L)).as("c"))
      Analytics.overdispersionTest(perUser, col("c"))
    }),

    // Cook's-distance top-10 over the standing (score, outcome) pair:
    // WHICH documents own the fitted slope — fit scalars rounded
    // driver-side (the GD discipline), scoring in-scan, TakeOrdered
    // top-k.
    "q_influence" -> ((s, dir) =>
      Analytics.regressionInfluence(t(s, dir, "documents"),
        col("doc_id"), (col("n_chars") % 97) / lit(96.0),
        col("n_chars") % 89, topK = 10)),

    // Ratio-of-sums A/B comparison (value per event across per-user
    // units) with the delta-method CI: the inference most production
    // metrics actually need — a naive mean-of-ratios SE is wrong for
    // Σy/Σx metrics.
    "q_ratio_metric" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(col("value")).as("y"), count(lit(1L)).as("x"))
      Analytics.ratioMetricTest(perUser, col("y"), col("x"),
        col("user_id") % 2 === 0)
    }),

    // Event study on the q_did panel unrolled per month: per-period
    // treated-control gaps relative to the earliest month — flat
    // pre-trends validate DiD's parallel-trends assumption, the post
    // profile shows effect dynamics.
    "q_event_study" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"),
          floor((dayofmonth(col("ts")) - 1) / lit(7.0)).as("wk"))
        .agg(count(lit(1L)).as("y"))
      Analytics.eventStudy(perUser, col("y"), col("user_id") % 2 === 0,
        col("wk"))
    }),

    // Cramer-von Mises on the same cohorts: the whole-CDF test (KS
    // sees only the largest gap; CvM integrates every gap).
    "q_cvm" -> ((s, dir) =>
      Analytics.cramerVonMises(t(s, dir, "documents"),
        col("n_chars"), col("lang") === "en")),

    // Gumbel block-maxima tail fit over daily event-value maxima:
    // method-of-moments location/scale and the 10x/100x return levels
    // — what max to provision for at 100x the data, which no empirical
    // quantile can say past the data's edge.
    "q_evt" -> ((s, dir) =>
      Analytics.gumbelTailFit(t(s, dir, "events"), col("value"),
        to_date(col("ts")))),

    // Yuen trimmed-mean test on the q_mann_whitney cohorts: did the
    // TYPICAL doc length move (20% tails excised, winsorized variance)
    // — the robust LOCATION verdict the rank test's stochastic-
    // dominance answer is not.
    "q_yuen" -> ((s, dir) =>
      Analytics.yuenTrimmedTest(t(s, dir, "documents"),
        col("n_chars"), col("lang") === "en", trim = 0.2)),

    // Jarque-Bera normality gate on order quantities: one 5-power-sum
    // rollup -> joint skewness/kurtosis chi2(2) verdict (the uniform
    // 1..50 quantity has ex. kurtosis ~ -1.2 -> loudly non-normal,
    // pinning the reject arm). Integral values keep the power sums
    // exact in doubles, so the oracle's sums match bit-for-bit.
    "q_jarque_bera" -> ((s, dir) =>
      Analytics.jarqueBera(t(s, dir, "lineitem"), col("l_quantity"))),

    // 1-D Wasserstein (earth mover's) distance on the same cohorts:
    // HOW FAR the length mass moved in characters — the quantitative
    // companion of q_ks_test's largest-gap verdict.
    "q_wasserstein" -> ((s, dir) =>
      Analytics.wassersteinDistance(t(s, dir, "documents"),
        col("n_chars"), col("lang") === "en")),

    // Mann-Whitney U on the same cohorts: tie-averaged ranks from one
    // two-phase cumulative count, tie-corrected z, rank-biserial
    // effect size.
    "q_mann_whitney" -> ((s, dir) =>
      Analytics.mannWhitneyU(t(s, dir, "documents"), col("n_chars"),
        col("lang") === "en")),

    // Cochran-Mantel-Haenszel across language strata: a pseudo-exposure
    // (even length) vs the q_mcnemar label, stratified by lang — the
    // Simpson's-paradox-proof pooled 2x2, with the MH common odds ratio.
    "q_cmh" -> ((s, dir) =>
      Analytics.cmhTest(t(s, dir, "documents"), col("lang"),
        col("n_chars") % 2 === 0,
        col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0)),

    // Breslow-Day homogeneity on the SAME stratified 2x2 panel: may
    // q_cmh pool at all? Per-stratum expected cells under the common
    // OR from the closed-form quadratic root, chi2(K-1) verdict.
    "q_breslow_day" -> ((s, dir) =>
      Analytics.breslowDay(t(s, dir, "documents"), col("lang"),
        col("n_chars") % 2 === 0,
        col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0)),

    // Wilcoxon signed-rank on two deterministic paired pseudo-metrics
    // over the SAME docs (the q_mcnemar construction, continuous): the
    // paired companion of q_mann_whitney — integer differences keep
    // every rank sum exact, the mod pair plants ties AND zeros so the
    // drop-zeros convention and tie correction are both exercised.
    "q_signed_rank" -> ((s, dir) =>
      Analytics.wilcoxonSignedRank(t(s, dir, "documents"),
        col("n_chars") % 97, col("n_chars") % 89)),

    // One-way ANOVA F on quantity by return flag: one group-keyed
    // moment rollup + 1-row verdict. Integer values keep every moment
    // exact in doubles, so the oracle matches bit-for-bit at 6 dp.
    "q_anova" -> ((s, dir) =>
      Analytics.anovaF(t(s, dir, "lineitem"), col("l_quantity"),
        col("l_returnflag"))),

    // Jonckheere-Terpstra ordered trend across the three return flags
    // (alphabetical order as the deterministic ordering): the
    // monotone-alternative companion of q_kruskal, full tie-corrected
    // variance over the 50-distinct-quantity tie blocks.
    "q_jonckheere" -> ((s, dir) =>
      Analytics.jonckheereTest(t(s, dir, "lineitem"), col("l_quantity"),
        col("l_returnflag"), Seq("A", "N", "R"))),

    // Kruskal-Wallis H on the same grouping: the k-group rank test —
    // tie-averaged ranks via the two-phase histogram CDF (50 distinct
    // quantities -> heavy ties exercise the correction), chi-square
    // verdict via the shared Wilson-Hilferty closed form.
    "q_kruskal" -> ((s, dir) =>
      Analytics.kruskalWallis(t(s, dir, "lineitem"), col("l_quantity"),
        col("l_returnflag"))),

    // Dunn's post-hoc pairwise comparisons AFTER q_kruskal rejects:
    // which flags differ, on the same pooled tie-averaged ranks, with
    // BH control over the 3 pairs — the drill-down KW itself cannot
    // answer.
    "q_dunn" -> ((s, dir) =>
      Analytics.dunnTest(t(s, dir, "lineitem"), col("l_quantity"),
        col("l_returnflag")).orderBy("g_a", "g_b")),

    // Brown-Forsythe variance homogeneity (Levene on median-centered
    // |deviations|): the equal-variance gate in front of ANOVA. Audit
    // variant on exact medians so DuckDB's quantile_cont restates them;
    // the API default is the mergeable approx_percentile path.
    "q_levene" -> ((s, dir) =>
      Analytics.brownForsythe(t(s, dir, "lineitem"), col("l_quantity"),
        col("l_linestatus"), exact = true)),

    // Fleiss' kappa over three deterministic raters (distinct
    // doc_id-keyed perturbations of the length threshold): per-item
    // pairwise agreement vs pooled-marginal chance; exchanges carry
    // the rated-item space.
    "q_fleiss" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def rater(k: Int) = d.select(col("doc_id").as("item"),
        when(col("n_chars") + (col("doc_id") * k) % 41 >= 300, "long")
          .otherwise("short").as("label"))
      Analytics.fleissKappa(
        rater(11).unionByName(rater(23)).unionByName(rater(37)),
        "item", "label")
    }),

    // Krippendorff's alpha over the SAME three raters WITH planted
    // missing ratings (rater 2 skips doc_id%4==0, rater 3 skips
    // doc_id%5==1 — docs hitting both are single-rated and excluded):
    // the agreement statistic that survives exactly this.
    "q_krippendorff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def rater(k: Int) = d.select(col("doc_id").as("item"),
        when(col("n_chars") + (col("doc_id") * k) % 41 >= 300, "long")
          .otherwise("short").as("label"))
      Analytics.krippendorffAlpha(
        rater(11)
          .unionByName(rater(23).where(col("item") % 4 =!= 0))
          .unionByName(rater(37).where(col("item") % 5 =!= 1)),
        "item", "label")
    }),

    // Quadratic-weighted kappa between two ordinal scorers — the QWK
    // standard for score-annotation agreement; weights on raw score
    // distances (the /(k-1) normalization cancels in the ratio).
    "q_wkappa" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ra = d.select(col("doc_id"), (col("n_chars") % 5).as("score"))
      val rb = d.select(col("doc_id"),
        ((col("n_chars") + col("doc_id") % 3) % 5).as("score"))
      Analytics.weightedKappa(ra, rb, "doc_id", "score",
        weights = "quadratic")
    }),

    // Kendall's tau-b between two bucketed ordinal scores: pair
    // counting on the distinct-cell table (bounded scales contract).
    "q_kendall" -> ((s, dir) =>
      Analytics.kendallTauB(t(s, dir, "documents"),
        floor((col("n_chars") % 97).cast("double") / 10),
        floor((col("n_chars") % 89).cast("double") / 10))),

    // Interval-metric Krippendorff over three NUMERIC raters with the
    // same planted skips — score annotations where distance matters.
    "q_kripp_interval" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def rater(k: Int) = d.select(col("doc_id").as("item"),
        ((col("n_chars") + col("doc_id") * k) % 41).cast("double").as("v"))
      Analytics.krippendorffAlphaInterval(
        rater(11)
          .unionByName(rater(23).where(col("item") % 4 =!= 0))
          .unionByName(rater(37).where(col("item") % 5 =!= 1)),
        "item", "v")
    }),

    // Page's L over three blocked pseudo-systems (s23 skipping every
    // 4th doc -> dropped blocks exercised): the ordered-alternative
    // trend test Friedman's any-difference answer is not.
    "q_page" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def sys(name: String, k: Int, keep: org.apache.spark.sql.Column) =
        d.where(keep).select(col("doc_id").as("item"),
          lit(name).as("sys"),
          ((col("n_chars") + col("doc_id") * k) % 41).as("score"))
      Analytics.pageTrendTest(
        sys("s11", 11, lit(true))
          .unionByName(sys("s23", 23, col("doc_id") % 4 =!= 0))
          .unionByName(sys("s37", 37, lit(true))),
        col("item"), col("sys"), col("score"),
        Seq("s11", "s23", "s37"))
    }),

    // Ordinal-metric Krippendorff over three 0-4 graders with the
    // same planted skips: disagreements priced by the marginal mass
    // between levels — the Likert-scale member between the nominal
    // and interval twins.
    "q_kripp_ordinal" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def rater(k: Int) = d.select(col("doc_id").as("item"),
        floor(((col("n_chars") + col("doc_id") * k) % 41)
          .cast("double") / 10).as("lvl"))
      Analytics.krippendorffAlphaOrdinal(
        rater(11)
          .unionByName(rater(23).where(col("item") % 4 =!= 0))
          .unionByName(rater(37).where(col("item") % 5 =!= 1)),
        "item", "lvl")
    }),

    // Cochran's Q over three deterministic pseudo-classifiers (the
    // q_mcnemar pair + a parity scorer), classifier c skipping every
    // 7th item — the k-way "same success rate?" eval-table gate with
    // the complete-design drop exercised.
    "q_cochran" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val y = col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0
      def clf(name: String, pred: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column) =
        d.where(keep).select(col("doc_id").as("item"),
          lit(name).as("clf"), (pred === y).as("ok"))
      Analytics.cochranQ(
        clf("a", (col("n_chars") % 97).cast("double") / 96 > 0.5, lit(true))
          .unionByName(clf("b",
            (col("n_chars") % 89).cast("double") / 88 > 0.5, lit(true)))
          .unionByName(clf("c", col("doc_id") % 2 === 0,
            col("doc_id") % 7 =!= 0)),
        col("item"), col("clf"), col("ok"))
    }),

    // Friedman blocked-rank test over three numeric scorers per doc
    // (scorer c skipping every 11th block): "does any system rank
    // consistently higher" with within-block ties tie-corrected.
    "q_friedman" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def scorer(name: String, v: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column) =
        d.where(keep).select(col("doc_id").as("item"),
          lit(name).as("trt"), v.cast("double").as("v"))
      Analytics.friedmanTest(
        scorer("a", col("n_chars") % 97, lit(true))
          .unionByName(scorer("b", col("n_chars") % 89, lit(true)))
          .unionByName(scorer("c", (col("n_chars") + col("doc_id")) % 101,
            col("doc_id") % 11 =!= 0)),
        col("item"), col("trt"), col("v"))
    }),

    // Cronbach's alpha over three correlated numeric "rubric items" per
    // doc (shared %97 component + independent perturbation; item c
    // skipping every 11th subject exercises the complete-design drop):
    // the internal-consistency readout beside the agreement (kappa/
    // alpha) family. Integer scores keep every moment exact.
    "q_cronbach" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def itm(name: String, v: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column) =
        d.where(keep).select(col("doc_id").as("subj"),
          lit(name).as("item"), v.cast("double").as("v"))
      Analytics.cronbachAlpha(
        itm("a", col("n_chars") % 97, lit(true))
          .unionByName(itm("b", (col("n_chars") % 97) + (col("n_chars") % 13),
            lit(true)))
          .unionByName(itm("c", (col("n_chars") % 97) + (col("doc_id") % 7),
            col("doc_id") % 11 =!= 0)),
        col("subj"), col("item"), col("v"))
    }),

    // Multi-slice drift dashboard with FDR control: per-source z-screen
    // of mean doc length (normal CDF as in-scan Column algebra), then
    // Benjamini–Hochberg step-up over the 20-row test table. Windows
    // ride the hypothesis table, never the corpus.
    "q_fdr_screen" -> ((s, dir) => {
      val z = Analytics.zScreenPerGroup(t(s, dir, "documents"),
        col("source"), col("n_chars"))
      Analytics.bhAdjust(z, "p", col("grp"))
        .select(col("grp").as("source"), col("n"), col("z"), col("p"),
          col("p_adj"), (col("p_adj") <= 0.10).as("significant"))
        .orderBy("source")
    }),

    // Randomization test: is the en-vs-rest mean doc length difference
    // chance? md5-coin pseudo-assignments per (doc, replicate) make the
    // null distribution — and the p-value — a pure function of the
    // data, recomputed exactly by the oracle.
    "q_permutation_test" -> ((s, dir) =>
      Analytics.randomizationTestMeanDiff(t(s, dir, "documents"),
        col("doc_id"), col("lang") === "en", col("n_chars"), b = 199)),

    // Poisson-bootstrap CI for the mean doc length: deterministic
    // md5-derived Poisson(1) pseudo-counts per (doc, replicate), so the
    // whole resampling plan — 200 replicate means and the percentile
    // bounds — is a pure function of the data and recomputed exactly by
    // the oracle. In-scan replication, b-group shuffle, b-row sort.
    "q_bootstrap_ci" -> ((s, dir) =>
      Analytics.poissonBootstrapMeanCI(t(s, dir, "documents"),
        col("doc_id"), col("n_chars"), b = 200, alpha = 0.05)),

    // Median / IQR / MAD robust location-scale profile per group (exact percentiles).
    "q_robust_stats" -> ((s, dir) =>
      Analytics.robustStats(t(s, dir, "lineitem"), col("l_extendedprice"),
          trim = 0.05, exact = true)
        .select(round(col("p_lo"), 6).as("p_lo"), round(col("p_hi"), 6).as("p_hi"),
          round(col("trimmed_mean"), 6).as("trimmed_mean"),
          round(col("winsor_std"), 6).as("winsor_std"),
          col("n"), col("n_trimmed"))),

    // Robust MAD outlier screen on doc lengths with 3 planted 50x
    // inflations: modified z = 0.6745(x-med)/MAD. Exact-percentile audit
    // variant (quantile_cont restates it); the API default rides approx
    // sketches. Verdict row: outlier count must catch the plants.
    "q_mad" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        (col("n_chars") * when(col("doc_id") < 3, 50).otherwise(1))
          .cast("double").as("x"))
      Analytics.madOutliers(d, col("x"), exact = true)
        .agg(count(lit(1L)).as("n"),
          sum(col("is_outlier").cast("long")).as("n_outliers"),
          round(max(col("mad_z")), 6).as("max_z"),
          round(min(col("mad_z")), 6).as("min_z"))
    }),

    // Per-source robust length hygiene: trimmed mean / winsorized std
    // per group, thresholds from one group-keyed percentile rollup
    // broadcast back. Exact audit variant (quantile_cont restates it);
    // the API default is the mergeable approx path.
    "q_robust_by_source" -> ((s, dir) =>
      Analytics.robustStatsByGroup(t(s, dir, "documents"),
          col("source"), col("n_chars"), trim = 0.1, exact = true)
        .select(col("grp"), round(col("p_lo"), 6).as("p_lo"),
          round(col("p_hi"), 6).as("p_hi"),
          round(col("trimmed_mean"), 6).as("trimmed_mean"),
          round(col("winsor_std"), 6).as("winsor_std"),
          col("n"), col("n_trimmed"))
        .orderBy("grp")),

    // The DEFAULT (scale) robustStats path under its own gate: approx
    // GK-sketch thresholds, NO exact percentile / global sort anywhere
    // (q_robust_stats above is the exact audit variant). The sketch's
    // rank guarantee is verified in-engine the cheap way — one extra
    // scan counts the fraction of rows at or below each approx
    // threshold, which must sit within trim ± 2·(rank-error bound
    // 1/accuracy) — and the oracle anchors the corpus (n) and restates
    // the verdicts (the q_rfm_scale / sim_ivf_sweep pattern).
    "q_robust_stats_scale" -> ((s, dir) => {
      val eps = 2.0 / 10000 // 2x the GK rank-error bound at accuracy 10000
      Analytics.robustStats(t(s, dir, "lineitem"), col("l_extendedprice"),
          trim = 0.05)
        .select(col("n"),
          (abs(col("n_le_lo") / col("n").cast("double") - 0.05) <= eps)
            .as("lo_rank_ok"),
          (abs(lit(1.0) - col("n_ge_hi") / col("n").cast("double") - 0.95)
            <= eps).as("hi_rank_ok"),
          (col("n_trimmed") <= (lit(0.1) + 2 * eps) * col("n"))
            .as("trim_frac_ok"))
    }),

    // Approximate percentiles (GK sketch). Made oracle-VISIBLE: the exact
    // interpolated percentiles anchor the row (DuckDB quantile_cont
    // recomputes them) and the sketch estimates are verified in-engine
    // within a 2% relative band — with accuracy=10000 the rank error is
    // n/10000, far inside that band at any test SF.
    "q_approx_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"),
        (abs(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          - expr("percentile(l_extendedprice, 0.5)"))
          <= expr("percentile(l_extendedprice, 0.5)") * 0.02).as("ap50_ok"),
        (abs(percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
          - expr("percentile(l_extendedprice, 0.99)"))
          <= expr("percentile(l_extendedprice, 0.99)") * 0.02).as("ap99_ok"))),

    // Cohort retention matrix: users bucketed by the day of their first
    // event, counted active N days later. One user-keyed aggregate
    // (cohort + distinct active periods in the SAME pass), then a
    // (cohort, offset) rollup — events never shuffle at event grain.
    "q_cohort" -> ((s, dir) =>
      Analytics.cohortRetention(t(s, dir, "events"),
          col("user_id"), col("ts"), periodSeconds = 86400L)
        .orderBy("cohort_period", "period_offset")),

    // Welch's two-sample t-test: purchase values, users split A/B by id
    // parity — the numeric-outcome experiment gate (chi2's sibling).
    // ONE scan, conditional sums, 1-row result.
    "q_ttest" -> ((s, dir) =>
      Analytics.welchTTest(
        t(s, dir, "events").where(col("event_type") === "purchase"),
        col("user_id") % 2 === 0, col("value"), dp = 4)),

    // First-order Markov transitions between event types per user:
    // one lead() window on user (the only event-grain exchange), then a
    // |states|²-bounded pair aggregate with row-normalized probability.
    "q_markov" -> ((s, dir) =>
      Analytics.transitionMatrix(t(s, dir, "events"),
          col("user_id"), col("event_type"),
          Seq(col("ts"), col("event_id")))
        .orderBy("from_state", "to_state")),

    // Per-group OLS (price ~ quantity per return flag): slope /
    // intercept / r² from Spark's Welford-style moment aggregates in
    // ONE pass — the same stable formulation DuckDB's regr_* family
    // restates.
    "q_regression" -> ((s, dir) =>
      Analytics.regressionByKey(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .withColumnRenamed("key", "l_returnflag")
        .orderBy("l_returnflag")),

    // Market-basket association pairs over order line items: support /
    // confidence / lift from a basket-keyed equi self-join (fanout
    // bounded by basket size) + TakeOrdered by lift.
    "q_basket" -> ((s, dir) =>
      Analytics.associationPairs(t(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey"), minPairCount = 3L, k = 20)),

    // Pivot to a wide per-bucket × event-type revenue matrix with an
    // EXPLICIT value list (no distinct-discovery pre-job — the
    // deterministic, 100 TB-safe form of pivot).
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
        .orderBy("bucket")),

    // Period-over-period reporting: weekly revenue with previous-week
    // delta — the lag window runs over the WEEK table (calendar-
    // bounded), not events.
    "q_pop" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val weekly = t(s, dir, "events")
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(round(sum("value"), 4).as("revenue"))
      weekly
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(
          Window.orderBy(col("week"))))
        .select(col("week"), col("revenue"),
          coalesce(col("prev_revenue"), lit(0.0)).as("prev_revenue"),
          // NULL divisor (ANSI-safe): first week and zero-revenue weeks
          // report NULL change rather than an error or ±Inf
          round((col("revenue") - col("prev_revenue")) /
            when(col("prev_revenue") =!= 0.0, col("prev_revenue")) * 100, 4)
            .as("pct_change"))
        .orderBy("week")
    }),

    // Out-of-order ingestion check: per user, rows whose event time
    // runs BACKWARD against the append order (event_id) — late/skewed
    // feed detection before any event-time logic trusts the data.
    "chk_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .select(col("user_id"),
          (col("ts") < col("__prev")).as("__viol"))
        .agg(count(lit(1L)).as("n_rows"),
          sum(when(col("__viol"), 1L).otherwise(0L)).as("n_violations"),
          countDistinct(when(col("__viol"), col("user_id"))).as("n_users_affected"))
        .withColumn("order_ok", col("n_violations") === 0L)
    }),

    // Revenue attribution, first-touch vs last-touch side by side: each
    // purchase credits (a) the user's most recent prior non-purchase
    // event and (b) their first-ever prior one — two ignore-nulls
    // window reads on ONE user-keyed exchange, then channel rollups.
    "q_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val p = t(s, dir, "events")
        .withColumn("last_touch",
          coalesce(last(touch, ignoreNulls = true).over(w), lit("none")))
        .withColumn("first_touch",
          coalesce(first(touch, ignoreNulls = true).over(w), lit("none")))
        .where(col("event_type") === "purchase")
      val lastAgg = p.groupBy(col("last_touch").as("channel"))
        .agg(count(lit(1L)).as("n_last"),
          round(sum("value"), 4).as("rev_last"))
      val firstAgg = p.groupBy(col("first_touch").as("channel"))
        .agg(count(lit(1L)).as("n_first"),
          round(sum("value"), 4).as("rev_first"))
      lastAgg.join(firstAgg, Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("rev_last"), lit(0.0)).as("rev_last"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("rev_first"), lit(0.0)).as("rev_first"))
        .orderBy("channel")
    }),

    // Streaming debounce via session windows, batch-parity-checked:
    // session_window(gap 601s) over second-truncated event time must
    // produce EXACTLY the burst structure of the batch debounce
    // (gap > 600 breaks — the [start, last+gap) end-exclusive session
    // matches the strict-inequality batch rule at 1s resolution). The
    // oracle is the batch windows rolled up per key.
    "q_stream_debounce" -> ((s, dir) => {
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream_d")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        new java.io.File(stage, "events.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      // append-mode sessions only emit once the watermark passes their
      // end — the globally-latest session never would. A sentinel
      // "flush" row 2h past the corpus horizon (user −1, dropped after
      // the drain) advances the watermark beyond every real session.
      val flushDir = new java.io.File(stage.getParentFile, "events_stream_d_flush")
      graft.sources.Sources.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
        .agg(max(col("ts")).as("ts"))
        .select(lit(-1L).as("user_id"), lit("__flush").as("event_type"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(flushDir.getPath)
      val main = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select(col("user_id"), col("event_type"), col("ts"))
      val flush = s.readStream
        .schema(s.read.parquet(flushDir.getPath).schema)
        .parquet(flushDir.getPath)
      val src = main.unionByName(flush)
        .select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
        .withWatermark("ts", "10 seconds")
      val sessions = src
        .groupBy(col("user_id"), col("event_type"),
          session_window(col("ts"), "601 seconds"))
        .agg(count(lit(1L)).as("n_events"))
      val sink = s"q_stream_debounce_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // session-window state ≤ the drained input; sized by data
      // volume, not core count (r17 — see Streams.statePartitions)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = sessions.writeStream.format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      s.table(sink)
        .where(col("user_id") >= 0) // drop the watermark-flush sentinel
        .groupBy("user_id", "event_type")
        .agg(count(lit(1L)).as("n_bursts"), sum(col("n_events")).as("n_events"))
        .orderBy("user_id", "event_type")
    }),

    // DAU / trailing-7-day WAU stickiness: events dedup to (user, day)
    // once, each row explodes to the anchor days it serves — exact
    // rolling distinct without a theta join or per-day rescans.
    "q_stickiness" -> ((s, dir) =>
      Analytics.stickiness(t(s, dir, "events"),
        col("user_id"), col("ts"), windowDays = 7)),

    // Calendar rollup: month × ISO-Monday-week revenue buckets —
    // date_trunc semantics must agree ACROSS engines (the classic
    // week-start pitfall), proven by the cross-engine compare.
    "q_date_rollup" -> ((s, dir) =>
      t(s, dir, "events").groupBy(
          date_trunc("month", col("ts")).cast("date").as("month"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(count(lit(1L)).as("n"), round(sum("value"), 4).as("revenue"))
        .orderBy("month", "week")),

    // Sample-ratio mismatch: are signup assignments consistent with a
    // 50/50 split by user parity? 1-df chi-square GOF, one scan.
    "q_srm" -> ((s, dir) =>
      Analytics.sampleRatioMismatch(
        t(s, dir, "events").where(col("event_type") === "signup"),
        col("user_id") % 2 === 0)),

    // Gini concentration of purchase revenue across users + top-10
    // share — units collapse first, rank windows run over unit rows.
    "q_gini_purchases" -> ((s, dir) =>
      Analytics.gini(t(s, dir, "events").where(col("event_type") === "purchase"),
        col("user_id"), col("value"))),

    // Kaplan–Meier time-to-conversion: signup → first later purchase,
    // users with no conversion CENSORED at the corpus horizon; at-risk
    // via suffix sum and the product limit via exp∘Σln over the
    // bounded distinct-duration table.
    "q_survival" -> ((s, dir) =>
      Analytics.kaplanMeier(signupToPurchaseDurations(s, dir),
        col("duration"), col("is_event")).orderBy("t")),

    // Nelson-Aalen cumulative hazard + variance over the SAME
    // right-censored signup->purchase durations as q_survival — the
    // additive hazard view next to KM's multiplicative survival view;
    // identical risk-set semantics, oracle restates the hazard sums.
    "q_hazard" -> ((s, dir) =>
      Analytics.nelsonAalen(signupToPurchaseDurations(s, dir),
        col("duration"), col("is_event")).orderBy("t")),

    // Restricted mean survival time over the SAME durations: area under
    // the q_survival KM curve up to tau = 200000s — "expected time to
    // purchase over the first ~55 hours", the censoring-safe single-
    // number summary; the oracle replays the whole KM chain + the lag
    // trapezoid.
    "q_rmst" -> ((s, dir) =>
      Analytics.rmst(signupToPurchaseDurations(s, dir),
        col("duration"), col("is_event"), tau = 200000.0)),

    // 2-D skyline (Pareto frontier maximizing recency AND value): the
    // bucket-grid decomposition — suffix max over a bounded bucket
    // table + bucket-partitioned windows — against DuckDB's literal
    // NOT EXISTS restatement of the dominance definition.
    "q_skyline" -> ((s, dir) =>
      Analytics.skyline2D(
          t(s, dir, "events").select(col("event_id"), col("ts"), col("value")),
          unix_timestamp(col("ts")), col("value"))
        .select(col("event_id"),
          unix_timestamp(col("ts")).as("ts_epoch"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")),

    // Debounce: collapse per-(user, type) bursts with gaps ≤ 10 min
    // into burst summaries — one key-partitioned window exchange.
    "q_debounce" -> ((s, dir) =>
      Analytics.debounce(t(s, dir, "events"),
          Seq(col("user_id"), col("event_type")), col("ts"),
          Seq(col("event_id")), gapSeconds = 600L)
        .orderBy("user_id", "event_type", "burst_idx")),

    // Mutual information between event type and a user bucket (nats),
    // with marginal/joint entropies — chi2's information-theoretic
    // sibling; all entropies fold from ONE |A|·|B|-bounded cell table.
    "q_mi" -> ((s, dir) =>
      Analytics.mutualInformation(t(s, dir, "events"),
        col("event_type"), col("user_id") % 5)),

    // Theil's U on the same pair: the DIRECTIONAL association readout
    // (U(a|b) vs U(b|a)) that symmetric MI / Cramer's V miss.
    "q_theils_u" -> ((s, dir) =>
      Analytics.theilsU(t(s, dir, "events"),
        col("event_type"), col("user_id") % 5)),

    // McNemar paired-classifier comparison: two deterministic pseudo-
    // classifiers over the SAME docs; the discordant-pair chi-square
    // with continuity correction, verdict on the shared closed form.
    "q_mcnemar" -> ((s, dir) =>
      Analytics.mcnemar(t(s, dir, "documents"),
        (col("n_chars") % 97) / lit(96.0) > 0.5,
        (col("n_chars") % 89) / lit(88.0) > 0.5,
        col("doc_id") % 3 === 0 || col("n_chars") % 5 === 0)),

    // Cohen's d / Hedges' g effect size of the en-vs-rest length shift:
    // one conditional-moment aggregation — the magnitude readout next
    // to q_ttest's significance.
    "q_effect_size" -> ((s, dir) =>
      Analytics.effectSize(t(s, dir, "documents"),
        col("n_chars"), col("lang") === "en")),

    // Split-conformal coverage audit per event_type: md5-coin
    // calibration half fixes qhat (the ceil((n+1)(1-alpha))-th
    // smallest |value - pred|), held-out slices audited against the
    // 1-alpha marginal guarantee — the conditional-coverage monitor.
    "q_conformal" -> ((s, dir) =>
      Analytics.conformalCoverage(
        t(s, dir, "events").where(col("value").isNotNull),
        col("event_id"), col("event_type"),
        (col("user_id") % 100).cast("double"), col("value"),
        alpha = 0.2)),

    // Empirical-Bayes (James-Stein) shrinkage of per-cohort means
    // toward the grand mean (Efron-Morris; one-way random-effects MoM
    // tau2): small cohorts borrow strength, big ones barely move.
    // A planted per-cohort effect (k/2 added to every value) makes
    // tau2 > 0 so the shrink is PARTIAL: weights vary with n instead
    // of collapsing to the homogeneous-data B=1 regime.
    "q_eb_shrink" -> ((s, dir) =>
      Analytics.ebShrinkMeans(
        t(s, dir, "events").where(col("value").isNotNull)
          .select(col("user_id"),
            (col("value") + (col("user_id") % 37).cast("double") / 2).as("v")),
        col("user_id") % 37, col("v"))),

    // CUSUM change-point scores per user (self-calibrated target,
    // slack 0.5, alarm at h=10): the sequential small-shift detector,
    // computed via the prefix-min closed form — two stacked running
    // windows on ONE user-keyed exchange, no per-key fold.
    "q_cusum" -> ((s, dir) =>
      Analytics.cusum(t(s, dir, "events").where(col("user_id") < 25),
          col("user_id"), Seq(col("ts"), col("event_id")), col("value"),
          slack = 0.5, h = 10.0, dp = 4)
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id")),

    // p-chart: error rate per user-bucket against 3σ binomial control
    // limits around the pooled rate — per-bucket limits widen for
    // small buckets, which fixed thresholds get wrong.
    "q_pchart" -> ((s, dir) =>
      Analytics.pChart(t(s, dir, "events"),
          col("user_id") % 20, col("event_type") === "error")
        .orderBy("bucket")),

    // Unpivot (melt): the wide bucket × event-type revenue matrix back
    // to long form — the inverse surface of q_pivot, a pure per-row
    // Expand (no shuffle beyond the wide frame's own aggregate).
    "q_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
      wide.unpivot(Array(col("bucket")),
          Array(col("click"), col("error"), col("purchase"),
            col("signup"), col("view")), "event_type", "revenue")
        .orderBy("bucket", "event_type")
    }),

    // Stream-static enrichment: the event stream joins a BROADCAST
    // customer dimension per micro-batch (stateless, no watermark),
    // drained with AvailableNow and rolled up per market segment; the
    // oracle is the identical batch left join.
    "q_stream_enrich" -> ((s, dir) => {
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_stream_e")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        new java.io.File(stage, "events.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val src = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select(col("event_id"), col("user_id"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val enriched = graft.streaming.Streams.enrich(src, dim, Seq("user_id"))
      val sink = s"q_stream_enrich_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      val q = enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table(sink)
        .groupBy(coalesce(col("c_mktsegment"), lit("none")).as("segment"))
        .agg(count(lit(1L)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("segment")
    }),

    // Semi-structured extraction: typed JSON-path pull from the props
    // column IN the scan (from_json with an EXPLICIT schema —
    // schema-on-read without an inference pass), nulls counting
    // malformed/missing keys; aggregated per event type.
    "q_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), "k INT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1L)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Classifier calibration + cumulative gains: ten score buckets with
    // observed positive rate and the top-down capture curve — one
    // bucket-keyed aggregation, windows over the ≤10-row bin table.
    "q_calibration" -> ((s, dir) =>
      Analytics.calibrationBins(t(s, dir, "lineitem"),
        col("l_quantity") / 50.0, (col("l_discount") >= 0.05).cast("int"),
        bins = 10)),

    // Theil–Sen robust trend per priority class over MONTHLY order
    // counts (80 points/key → ~3.2k pairs/key; the estimator's O(n²)
    // pair set is bounded by the pre-aggregation grain, which is the
    // documented contract).
    "q_theil_sen" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
        .agg(count(lit(1L)).as("cnt"))
      Analytics.theilSenByKey(monthly, col("prio"), col("m"), col("cnt"))
        .orderBy("key")
    }),

    // Mann-Kendall on the SAME monthly series: the distribution-free
    // trend VERDICT beside q_theil_sen's slope estimate — S from the
    // bounded per-key pair join, tie-corrected variance, continuity-
    // corrected z.
    "q_mann_kendall" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
        .agg(count(lit(1L)).as("cnt"))
      Analytics.mannKendallByKey(monthly, col("prio"), col("m"), col("cnt"))
        .orderBy("key")
    }),

    // Bloom-pruned fact⋈dim-subset join: the urgent-orders key set
    // rides a Bloom sketch probed IN the lineitem scan, so only
    // probable matches (≈1/5 of the fact table + fpp) reach the join
    // shuffle; results are EXACT (no false negatives; false positives
    // die in the join). Oracle is the plain join.
    "q_bloom_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      graft.ops.Skew.bloomPrunedJoin(
          t(s, dir, "lineitem"), Seq("l_orderkey"),
          urgent, Seq("o_orderkey"), expectedKeys = 300000L)
        .groupBy("l_returnflag")
        .agg(count(lit(1L)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("l_returnflag")
    }),

    // RFM grid: customers tiered by recency/frequency/monetary quartiles
    // (deterministic ntile — id tie-break), populated cells with counts.
    // As-of is fixed (1999-01-01 UTC), never wall-clock.
    // exactTiles: the oracle restates equal-population ntile, so the
    // query opts into the audit path; the engine DEFAULT is the
    // approx-boundary assignment that never sorts globally.
    "q_rfm" -> ((s, dir) =>
      Analytics.rfmSegments(t(s, dir, "orders"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"),
          asOfEpoch = 915148800L, tiles = 4, exactTiles = true)
        .orderBy("r_tier", "f_tier", "m_tier")),

    // Quantity-weighted price percentiles: the threshold question for
    // weighted populations (what price covers 90% of shipped UNITS,
    // not 90% of line items). Weighted CDF via the two-phase
    // distributed cumsum; integer-valued weights keep every cumulative
    // comparison exact across engines. All probes in one conditional
    // aggregate.
    "q_weighted_quantiles" -> ((s, dir) =>
      Analytics.globalWeightedQuantiles(t(s, dir, "lineitem"),
        col("l_extendedprice"), col("l_quantity"),
        probes = Seq(0.25, 0.5, 0.75, 0.9))),

    // Revenue-concentration Gini over per-customer revenue — the
    // one-number inequality verdict beside q_abc's class table; global
    // rank via the two-phase distributed row_number.
    "q_gini" -> ((s, dir) => {
      val per = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      Analytics.giniCoefficient(per, col("rev"))
    }),

    // The DEFAULT (scale) rfm path under its own oracle: tier cuts
    // from one approx_percentile pass, assignment by boundary
    // comparison. Spark's exact-regime quantile pick is the element at
    // rank ceil(p·n) — precisely DuckDB's quantile_disc — so the
    // oracle restates the boundaries verbatim (probe-verified on
    // n = 8/9/15/100). Proves the no-global-sort path, not just the
    // ntile audit path, is correctness-gated.
    "q_rfm_scale" -> ((s, dir) =>
      Analytics.rfmSegments(t(s, dir, "orders"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"),
          asOfEpoch = 915148800L, tiles = 4)
        .orderBy("r_tier", "f_tier", "m_tier")),

    // Per-user event-timing burstiness (bot/spam evidence): the 15 most
    // burst-concentrated users by busiest-minute share.
    "q_botscore" -> ((s, dir) =>
      Analytics.burstiness(t(s, dir, "events"), col("user_id"), col("ts"))
        .orderBy(col("peak_minute_share").desc, col("key"))
        .limit(15)),

    // Customer-concentration risk per nation: the single largest
    // customer's revenue share — the account-concentration number
    // behind "what if our biggest customer leaves". Customer-keyed
    // aggregate, nation rollup via max/sum, dims broadcast.
    "q_concentration" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
        .groupBy("n_name")
        .agg(count(lit(1L)).as("n_customers"),
          round(sum(col("rev")), 2).as("revenue"),
          round(max(col("rev")), 2).as("top_customer_rev"))
        .withColumn("top_share",
          round(col("top_customer_rev") / col("revenue"), 6))
        .orderBy("n_name")),

    // Repeat-purchase cadence: days between a customer's consecutive
    // orders, summarized exactly — the reorder-cycle number behind
    // replenishment and churn-risk models. One customer-keyed lag
    // window, ties broken by order key.
    "q_cadence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("t"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("t"))
        .withColumn("gap_days",
          (col("t") - lag(col("t"), 1).over(w)) / 86400.0)
        .where(col("gap_days").isNotNull)
        .agg(count(lit(1L)).as("n_intervals"),
          round(expr("percentile(gap_days, 0.5)"), 6).as("p50_days"),
          round(expr("percentile(gap_days, 0.9)"), 6).as("p90_days"),
          round(avg(col("gap_days")), 6).as("mean_days"))
    }),

    // Open-order backlog curve: orders opened minus orders fully
    // shipped per month, with the running backlog — the WIP trajectory
    // from two month-keyed aggregates and a window over the bounded
    // month table.
    "q_backlog" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val opened = t(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .as("ym"))
        .agg(count(lit(1L)).as("n_opened"))
      val closed = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
        .groupBy((year(col("last_ship")) * 100 + month(col("last_ship")))
          .as("ym"))
        .agg(count(lit(1L)).as("n_closed"))
      val w = Window.orderBy(col("ym"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      opened.join(closed, Seq("ym"), "full_outer")
        .select(col("ym"), coalesce(col("n_opened"), lit(0L)).as("n_opened"),
          coalesce(col("n_closed"), lit(0L)).as("n_closed"))
        .withColumn("backlog",
          sum(col("n_opened") - col("n_closed")).over(w))
        .orderBy("ym")
    }),

    // ABC inventory-style classification: customers ranked by revenue,
    // A = the head covering 80% of cumulative revenue, B = next 15%,
    // C = the tail — per-class counts and revenue shares. One
    // customer-keyed aggregate + cumulative windows over the bounded
    // customer table (2dp-ranked like RFM so equal totals cannot
    // diverge across engines).
    "q_abc" -> ((s, dir) => {
      val per = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      // the running revenue share comes from the two-phase distributed
      // cumulative sum (ops.Windows), not a single-reducer window: ABC
      // needs every entity ranked, so at fact-entity cardinality the
      // unpartitioned-window form is the scale killer. The grand total
      // rides the 1-row scalar-broadcast house pattern. The cumsum runs
      // in exact integer CENTS (rev is 2dp by construction): the
      // two-phase sum groups double additions differently from a
      // sequential window, and the A/B/C cut sits on a cum<=tot*0.8
      // knife edge — integer accumulation makes the classification
      // independent of partition boundaries and run-to-run stable.
      val perC = per.withColumn("__cents", round(col("rev") * 100).cast("long"))
      val cum = graft.ops.Windows.globalCumSum(perC,
        Seq(col("rev").desc, col("o_custkey")), col("__cents"), out = "__cumc")
      val classed = cum
        .crossJoin(perC.agg(sum(col("__cents")).as("__totc")))
        .withColumn("cls",
          when(col("__cumc") <= col("__totc") * 0.80, "A")
            .when(col("__cumc") <= col("__totc") * 0.95, "B")
            .otherwise("C"))
      classed.groupBy(col("cls"))
        .agg(count(lit(1L)).as("n_customers"),
          round(sum(col("rev")), 2).as("revenue"))
        .orderBy("cls")
    }),

    // New-vs-repeat revenue split per month: each order classified by
    // whether it is its customer's FIRST (one customer-keyed window),
    // then a month-keyed rollup — the acquisition-vs-retention revenue
    // lens.
    "q_new_repeat" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"),
          col("o_orderkey"))
        .withColumn("first_key",
          min(struct(col("ym"), col("o_orderkey"))).over(w).getField("o_orderkey"))
        .withColumn("kind",
          when(col("o_orderkey") === col("first_key"), "new").otherwise("repeat"))
      orders.groupBy("ym", "kind")
        .agg(count(lit(1L)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("ym", "kind")
    }),

    // Monetary-precision audit: values that are not exact 2-decimal
    // amounts, negatives, and zeros per money column — the "is this
    // column actually currency" intake check, one conditional scan.
    "chk_precision" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def audit(c: String) =
        li.agg(count(lit(1L)).as("n"),
          sum(when(round(col(c), 2) =!= col(c), 1L).otherwise(0L))
            .as("n_not_2dp"),
          sum(when(col(c) < 0, 1L).otherwise(0L)).as("n_negative"),
          sum(when(col(c) === 0, 1L).otherwise(0L)).as("n_zero"))
          .select(lit(c).as("column_name"), col("n"), col("n_not_2dp"),
            col("n_negative"), col("n_zero"))
      audit("l_extendedprice").unionByName(audit("l_discount"))
        .unionByName(audit("l_tax"))
        .orderBy("column_name")
    }),

    // Audience overlap: pairwise Jaccard of the USER sets behind each
    // event type — "do clickers also purchase" as set algebra; distinct
    // (type, user) pairs feed a type-keyed self-join bounded by
    // |types|² cells.
    "q_audience_overlap" -> ((s, dir) => {
      val sets = t(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
      val sizes = sets.groupBy("t").agg(count(lit(1L)).as("sz"))
      val inter = sets.toDF("ta", "u")
        .join(sets.toDF("tb", "u2"), col("u") === col("u2"))
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1L)).as("n_common"))
      inter
        .join(sizes.select(col("t").as("ta"), col("sz").as("sza")), "ta")
        .join(sizes.select(col("t").as("tb"), col("sz").as("szb")), "tb")
        .select(col("ta"), col("tb"), col("n_common"), col("sza"), col("szb"),
          round(col("n_common") /
            (col("sza") + col("szb") - col("n_common")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("ta", "tb")
    }),

    // Order cycle time: order date → LAST line shipment, exact
    // percentiles per priority — the fulfillment-latency metric; one
    // order-keyed max + a priority-keyed percentile rollup.
    "q_cycle_time" -> ((s, dir) => {
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(((max(unix_timestamp(col("l_shipdate"))) -
          first(unix_timestamp(col("o_orderdate")))) / 86400.0).as("days"))
      per.groupBy("o_orderpriority")
        .agg(count(lit(1L)).as("n_orders"),
          round(expr("percentile(days, 0.5)"), 6).as("p50_days"),
          round(expr("percentile(days, 0.95)"), 6).as("p95_days"),
          round(max(col("days")), 6).as("max_days"))
        .orderBy("o_orderpriority")
    }),

    // Log-log price elasticity per brand: OLS of ln(quantity) on
    // ln(unit price) — the slope IS the elasticity; rides the per-key
    // moment regression (one keyed conditional-sum scan).
    "q_elasticity" -> ((s, dir) =>
      Analytics.regressionByKey(
          t(s, dir, "lineitem")
            .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
            .where(col("l_quantity") > 0 && col("l_extendedprice") > 0),
          col("p_brand"),
          log(col("l_extendedprice") / col("l_quantity")),
          log(col("l_quantity")))
        .withColumnRenamed("key", "p_brand")
        .withColumnRenamed("slope", "elasticity")
        .orderBy("p_brand")),

    // Wald–Wolfowitz runs test on daily purchase totals vs their
    // median: too few sign runs = trending/regime-switching series,
    // too many = oscillation — the randomness sanity check behind
    // residual diagnostics. Exact integer runs count + the closed-form
    // z under the null.
    "q_runs_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy((floor(unix_timestamp(col("ts")) / 86400) * 86400)
          .cast("long").as("d"))
        .agg(round(sum(col("value")), 4).as("v"))
      val med = daily.agg(expr("percentile(v, 0.5)").as("m"))
      val signed = daily.crossJoin(med)
        .where(col("v") =!= col("m")) // ties to the median drop (standard)
        .select(col("d"), (col("v") > col("m")).cast("int").as("s"))
      val w = Window.orderBy(col("d"))
      val runs = signed
        .withColumn("chg",
          when(lag(col("s"), 1).over(w).isNull ||
            lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
        .agg(sum(col("chg")).as("n_runs"),
          sum(col("s")).cast("double").as("n_pos"),
          sum(lit(1L) - col("s")).cast("double").as("n_neg"))
      runs.select(col("n_runs"), col("n_pos").cast("long").as("n_above"),
        col("n_neg").cast("long").as("n_below"),
        round((col("n_runs") -
          (lit(2.0) * col("n_pos") * col("n_neg") /
            (col("n_pos") + col("n_neg")) + 1)) /
          sqrt(lit(2.0) * col("n_pos") * col("n_neg") *
            (lit(2.0) * col("n_pos") * col("n_neg") - col("n_pos") - col("n_neg")) /
            ((col("n_pos") + col("n_neg")) * (col("n_pos") + col("n_neg")) *
              (col("n_pos") + col("n_neg") - 1))), 6).as("runs_z"))
    }),

    // Inter-arrival gap percentiles per event type — the ops-latency
    // view of the stream (exact p50/p95/max of seconds between
    // consecutive same-type events). One type-keyed window + percentile
    // aggregate.
    "q_gap_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("t"))
        .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
        .where(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1L)).as("n_gaps"),
          round(expr("percentile(gap, 0.5)"), 6).as("p50_sec"),
          round(expr("percentile(gap, 0.95)"), 6).as("p95_sec"),
          max(col("gap")).as("max_sec"))
        .orderBy("event_type")
    }),

    // Autocorrelation of daily purchase totals at lags 1 and 7 — the
    // "is there weekly structure" companion to q_seasonal: ACF(7) ≫
    // ACF(1) says weekday profile, not momentum. Day-keyed aggregate,
    // lags over the |days|-bounded table, Pearson r from raw sums.
    "q_autocorr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy((floor(unix_timestamp(col("ts")) / 86400) * 86400)
          .cast("long").as("d"))
        .agg(round(sum(col("value")), 4).as("v"))
      val w = Window.orderBy(col("d"))
      val lagged = daily.select(col("v"),
        lag(col("v"), 1).over(w).as("l1"), lag(col("v"), 7).over(w).as("l7"))
      val pairs = lagged.select(lit(1).as("lag"), col("v").as("x"), col("l1").as("y"))
        .unionAll(lagged.select(lit(7).as("lag"), col("v").as("x"), col("l7").as("y")))
        .where(col("y").isNotNull)
      pairs.groupBy("lag")
        .agg(count(lit(1L)).as("n_pairs"),
          round((count(lit(1L)) * sum(col("x") * col("y")) -
            sum(col("x")) * sum(col("y"))) /
            (sqrt(count(lit(1L)) * sum(col("x") * col("x")) -
              sum(col("x")) * sum(col("x"))) *
             sqrt(count(lit(1L)) * sum(col("y") * col("y")) -
              sum(col("y")) * sum(col("y")))), 6).as("acf"))
        .orderBy("lag")
    }),

    // Growth accounting: per day, users split into new (first-ever
    // active), retained (also active the previous day), resurrected
    // (active before but not yesterday), churned (yesterday's actives
    // who went silent). One (user, day)-distinct pass, a user-keyed
    // lag window over the ACTIVITY table (not events), day-keyed
    // counts. The standard DAU decomposition.
    "q_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val act = t(s, dir, "events")
        .select(col("user_id").as("u"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("d"))
        .distinct()
      val w = Window.partitionBy(col("u")).orderBy(col("d"))
      val flagged = act
        .withColumn("prev", lag(col("d"), 1).over(w))
        .withColumn("status",
          when(col("prev").isNull, "new")
            .when(col("d") - col("prev") === 86400L, "retained")
            .otherwise("resurrected"))
      val active = flagged.groupBy(col("d"), col("status"))
        .agg(count(lit(1L)).as("n"))
      // churned on day X = users active on X-86400 with no activity on X
      val churned = flagged.select(col("u"), (col("d") + 86400L).as("d"))
        .join(act.select(col("u"), col("d")), Seq("u", "d"), "left_anti")
        .groupBy(col("d")).agg(count(lit(1L)).as("n"))
        .withColumn("status", lit("churned"))
      active.unionByName(churned.select("d", "status", "n"))
        .orderBy("d", "status")
    }),

    // The classic star join (TPC-H Q5 shape): local-supplier revenue
    // per nation within one region-year. Every dimension broadcasts;
    // the only shuffle-joined pair is lineitem ⋈ orders — the plan
    // shape that decides whether a 100 TB star query reads hours or
    // minutes (PlanSpec-asserted).
    "q_star_join" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" && year(col("o_orderdate")) === 1995)
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1L)).as("n_items"))
        .orderBy("n_name")),

    // 2-D density grid (hour-of-day × value decile): the heatmap
    // behind "when do large events happen" — one two-key aggregation,
    // cardinality ≤ 24·10.
    "q_histogram2d" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(hour(col("ts")).as("hour_of_day"),
          least(floor(col("value") / 10), lit(9L)).cast("int").as("value_decile"))
        .agg(count(lit(1L)).as("n"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy("hour_of_day", "value_decile")),

    // Rank movers: brands whose revenue RANK shifted most between the
    // early and late shipping periods — both periods ride ONE
    // conditional aggregation (no period self-join); ranks window over
    // the bounded brand table.
    "q_movers" -> ((s, dir) => {
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), year(col("l_shipdate")).as("y"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .groupBy("p_brand")
        .agg(round(sum(when(col("y") < 1995, col("rev")).otherwise(0.0)), 2)
            .as("rev_early"),
          round(sum(when(col("y") >= 1995, col("rev")).otherwise(0.0)), 2)
            .as("rev_late"))
      // both COMPLETE rankings (rank_delta needs every brand ranked
      // twice) come from the two-phase distributed row_number
      // (ops.Windows) — no single-reducer window even if the ranked
      // dimension ever grows past dimension-table scale
      val ranked = graft.ops.Windows.globalRowNumber(
        graft.ops.Windows.globalRowNumber(per,
          Seq(col("rev_early").desc, col("p_brand")), out = "rank_early"),
        Seq(col("rev_late").desc, col("p_brand")), out = "rank_late")
      ranked.select(col("p_brand"), col("rev_early"), col("rev_late"),
          col("rank_early").cast("int"), col("rank_late").cast("int"))
        .withColumn("rank_delta", col("rank_early") - col("rank_late"))
        .orderBy(abs(col("rank_delta")).desc, col("p_brand")).limit(10)
    }),

    // Session path mining: the most common full event-type journeys —
    // sessionize on a 30-minute gap, concatenate each session's ordered
    // types, count paths. One user-keyed window family + a path-keyed
    // count; paths stay strings, never nested structures, so the
    // exchange is narrow.
    "q_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      val sess = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("t"))
        .withColumn("brk",
          when(col("t") - lag(col("t"), 1).over(w) > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val paths = sess
        .groupBy(col("user_id"), col("sid"))
        .agg(concat_ws(">", transform(
          array_sort(collect_list(struct(col("t"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      paths.groupBy("path").agg(count(lit(1L)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(15)
    }),

    // Peak concurrency via the sweep line: each purchase opens a
    // 30-minute session; +1/-1 deltas ordered by (time, delta) with
    // ends before starts (half-open intervals), running sum, max. The
    // sweep is inherently time-sequential — at 100 TB shard it by
    // coarse time bucket and stitch boundary offsets; here the bounded
    // purchase stream rides one ordered window.
    "q_concurrency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t0 = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(unix_timestamp(col("ts")).as("t"))
      val sweep = t0.select(col("t"), lit(1).as("d"))
        .unionAll(t0.select((col("t") + 1800).as("t"), lit(-1).as("d")))
        .withColumn("run", sum(col("d")).over(Window.orderBy(col("t"), col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val peak = sweep.agg(max(col("run")).as("peak"))
      sweep.crossJoin(peak).where(col("run") === col("peak"))
        .agg(first(col("peak")).as("peak_concurrency"),
          min(col("t")).as("first_peak_epoch"))
        .crossJoin(t0.agg(count(lit(1L)).as("n_intervals")))
    }),

    // Funnel step latency: first view → earliest subsequent purchase
    // per user, summarized as exact percentiles — "how long does
    // conversion take", the time axis q_funnel's counts do not carry.
    "q_funnel_latency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val deltas = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("t"))
        .withColumn("fv",
          min(when(col("event_type") === "view", col("t"))).over(w))
        .where(col("event_type") === "purchase" &&
          col("fv").isNotNull && col("t") >= col("fv"))
        .groupBy("user_id").agg(min(col("t") - col("fv")).as("delta"))
      deltas.agg(count(lit(1L)).as("n_converted"),
        round(expr("percentile(delta, 0.5)"), 6).as("p50_sec"),
        round(expr("percentile(delta, 0.9)"), 6).as("p90_sec"),
        round(avg(col("delta")), 6).as("mean_sec"))
    }),

    // Wilson 95% score interval per segment: the CI that stays honest
    // at small n and extreme rates (the normal approximation does not)
    // — metric engineering's default error bar. One conditional-sum
    // scan, pure arithmetic.
    "q_wilson" -> ((s, dir) => {
      val z = 1.959964
      val z2 = z * z
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1L)).as("n"),
          avg(when(col("value") > 50, 1.0).otherwise(0.0)).as("__p"))
        .select(col("event_type"), col("n"), round(col("__p"), 6).as("rate"),
          round((col("__p") + lit(z2) / (col("n") * 2) -
            lit(z) * sqrt(col("__p") * (lit(1.0) - col("__p")) / col("n") +
              lit(z2) / (col("n") * col("n") * 4))) / (lit(1.0) + lit(z2) / col("n")), 6)
            .as("wilson_low"),
          round((col("__p") + lit(z2) / (col("n") * 2) +
            lit(z) * sqrt(col("__p") * (lit(1.0) - col("__p")) / col("n") +
              lit(z2) / (col("n") * col("n") * 4))) / (lit(1.0) + lit(z2) / col("n")), 6)
            .as("wilson_high"))
        .orderBy("event_type")
    }),

    // Decision-stump split: the l_discount threshold best separating
    // high-quantity lineitems by information gain — supervised binning
    // / leakage triage in one value-keyed pass.
    "q_best_split" -> ((s, dir) =>
      Analytics.bestSplit(t(s, dir, "lineitem"),
        col("l_discount"), (col("l_quantity") > 25).cast("int"))),

    // Linear interpolation of missing hourly buckets per user (levels,
    // not states — regularizeSeries' ffill sibling).
    "q_interpolate" -> ((s, dir) => {
      val hourly = t(s, dir, "events").where(col("user_id") < 10)
        .groupBy(col("user_id").as("k"),
          (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("b"))
        .agg(round(sum(col("value")), 4).as("x"))
      Analytics.interpolateSeries(hourly, col("k"), col("b"), col("x"),
          step = 3600L)
        .orderBy("key", "bucket")
    }),

    // Weighted quantiles: token/quantity-weighted percentiles — the
    // smallest value whose cumulative WEIGHT reaches q·total; one
    // window pass + conditional mins, exact.
    "q_wquantile" -> ((s, dir) =>
      Analytics.weightedQuantiles(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
          qs = Seq(0.5, 0.9))
        .orderBy("key")),

    // Sessionization with an idle-gap break AND a 2-hour duration cap —
    // machine traffic otherwise yields unbounded sessions.
    "q_sessions_capped" -> ((s, dir) =>
      Analytics.cappedSessionStats(t(s, dir, "events"), col("user_id"),
          col("ts"), gapSec = 1800L, capSec = 7200L)
        .orderBy("key")),

    // Null-pattern mining over PLANTED correlated nulls: which columns
    // go missing together (ingestion-path signatures, not per-column
    // tallies).
    "chk_null_patterns" -> ((s, dir) =>
      graft.ops.Profiler.nullPatterns(
        t(s, dir, "lineitem").select(
          when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")).as("a"),
          when(col("l_discount") < 0.02, lit(null)).otherwise(col("l_discount")).as("b"),
          when(col("l_returnflag") === "N" && col("l_discount") < 0.02,
            lit(null)).otherwise(col("l_tax")).as("c")),
        Seq("a", "b", "c")).orderBy("null_pattern")),

    // Day-of-week seasonal profile of daily purchase value + the
    // residual-variance verdict: does the weekday baseline explain
    // structure a flat monitor would re-alarm on weekly?
    "q_seasonal" -> ((s, dir) =>
      Analytics.seasonalBaseline(
          t(s, dir, "events").where(col("event_type") === "purchase"),
          col("ts"), col("value"))
        .orderBy("dow")),

    // Streaming latest-state materialization (the CDC upsert view):
    // max_by keyed state through Structured Streaming's complete-mode
    // aggregation, drained with AvailableNow — final per-user state
    // must hash-match the batch latest-per-key oracle exactly.
    "q_stream_upsert" -> ((s, dir) => {
      val dirKey = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val stage = new java.io.File(
        s"/root/repo/target/fixtures/$dirKey/events_upsert")
      val staged = new java.io.File(stage, "events.parquet")
      stage.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), staged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val stream = graft.sources.Sources.normalizeEventTs(
          s.readStream.schema(raw).parquet(stage.getPath))
        .select("user_id", "event_id", "ts", "event_type", "value")
      val latest = stream.groupBy(col("user_id"))
        .agg(max_by(
            struct(col("event_type"), round(col("value"), 4).as("value")),
            struct(col("ts"), col("event_id"))).as("__last"),
          count(lit(1L)).as("n_events"),
          max(unix_timestamp(col("ts"))).as("last_epoch"))
        .select(col("user_id"), col("__last.event_type").as("last_type"),
          col("__last.value").as("last_value"), col("n_events"),
          col("last_epoch"))
      val sink = s"q_stream_upsert_mem_${dirKey.replace('.', '_')}"
      s.catalog.dropTempView(sink)
      // complete-mode keyed state ≤ the drained input; sized by data
      // volume, not core count (r17 — see Streams.statePartitions)
      graft.streaming.Streams.withVolumeSizedState(s,
          s.read.parquet(s"$dir/events.parquet").count()) {
        val q = latest.writeStream.format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(sink).orderBy("user_id")
    }),
  )

  /** First 24 md5 bits of `expr` as a BIGINT in [0, 2²⁴), spelled with
    * per-nibble strpos arithmetic — the same version-proof form as
    * CheckQueries.duckRowHash. The `concat('0x',…) CAST` idiom this
    * replaces proved DuckDB-version-sensitive (the r09 red rows). */
  private def duckHex24(expr: String): String =
    (0 until 6).map { i =>
      val w = 1L << (4 * (5 - i))
      s"(CAST(strpos('0123456789abcdef', substr(md5($expr), ${i + 1}, 1)) " +
        s"AS BIGINT) - 1) * $w"
    }.mkString("(", " + ", ")")

  /** The q_periodogram oracle: the statically-unrolled per-candidate
    * cos/sin sums, powers, arg-max peak flag — generated for the same
    * period list the query passes. */
  private def periodogramOracle(periods: Seq[Int]): String = {
    val sums = periods.flatMap(p => Seq(
      s"sum(vc * cos(2 * pi() / $p * t)) AS c$p",
      s"sum(vc * sin(2 * pi() / $p * t)) AS s$p")).mkString(", ")
    val pws = periods.map(p => s"c$p * c$p + s$p * s$p AS p$p")
      .mkString(", ")
    val maxExpr = periods.map(p => s"p$p")
      .reduce((a, b) => s"greatest($a, $b)")
    val rows = periods.map(p =>
      s"SELECT $p AS period, round(p$p, 6) AS power, " +
      s"CASE WHEN ss > 0 THEN round(p$p / ss, 6) END AS power_share, " +
      s"p$p = mx AS is_peak FROM pw").mkString(" UNION ALL ")
    s"""WITH daily AS (SELECT CAST(dayofmonth(ts) AS DOUBLE) AS t,
       |  CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY dayofmonth(ts)),
       |m AS (SELECT avg(y) AS mn FROM daily),
       |c AS (SELECT t, y - mn AS vc FROM daily, m),
       |a AS (SELECT $sums, sum(vc * vc) AS ss FROM c),
       |px AS (SELECT *, $pws FROM a),
       |pw AS (SELECT *, $maxExpr AS mx FROM px)
       |$rows ORDER BY period""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_periodogram" -> periodogramOracle(2 to 8),
    "q_join_bcast" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_revenue" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_semi_anti" ->
      """SELECT
        | (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE EXISTS
        |   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
        | (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE NOT EXISTS
        |   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""".stripMargin,

    "q_window_topk" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, CAST(rn AS INT) AS rn
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,

    // DuckDB's native inequality join is the independent implementation
    // of the same inclusive point-in-interval semantics
    "q_interval" ->
      """WITH iv AS (SELECT event_type AS itype, min(ts) AS w_start,
        |    min(ts) + INTERVAL 30 MINUTE AS w_end FROM events GROUP BY 1)
        |SELECT itype, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM events ev JOIN iv ON ev.ts >= iv.w_start AND ev.ts <= iv.w_end
        |GROUP BY itype ORDER BY itype""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the independent implementation of
    // the same inclusive latest-at-or-before semantics
    "q_asof" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS asof_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     l AS (SELECT event_id, user_id, ts
        |           FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id,
        | r.asof_value IS NOT NULL AS has_match,
        | coalesce(r.asof_value, -1.0) AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // stepwise restatement (min-ts inequality join + equi join back to
    // the value) — DuckDB ASOF is only guaranteed for the backward form
    "q_asof_fwd" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS v FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click'),
        |nxt AS (SELECT l.event_id, min(r.ts) AS rts
        |        FROM l JOIN r USING (user_id)
        |        WHERE r.ts >= l.ts GROUP BY l.event_id)
        |SELECT l.event_id, l.user_id,
        | nxt.rts IS NOT NULL AS has_match,
        | coalesce(r2.v, -1.0) AS next_value
        |FROM l LEFT JOIN nxt USING (event_id)
        |LEFT JOIN r r2 ON r2.user_id = l.user_id AND r2.ts = nxt.rts
        |ORDER BY l.event_id""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
        |FROM events ORDER BY event_id""".stripMargin,

    "q_rolling" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_setops" ->
      """SELECT
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT DISTINCT c_nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier)) AS n_both,
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT DISTINCT c_nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier)) AS n_cust_only,
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT DISTINCT c_nationkey FROM customer UNION SELECT DISTINCT s_nationkey FROM supplier)) AS n_any""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        | sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin,

    "q_timewindow" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start,
        | event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Identical to q_timewindow's batch oracle — the engine side arrives
    // at it through the streaming runtime instead.
    "q_stream_topk" ->
      """WITH c AS (SELECT event_type, user_id,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY n DESC, user_id) AS rk FROM c)
        |SELECT event_type, user_id, n, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,

    "q_stream_parity" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start,
        | event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // stepwise earliest-match restatement of the anchored-window state
    // machine: t1 = first view; t2 = first click strictly after t1
    // within t1+2h; t3 = first purchase strictly after t2 within t1+2h
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > t1.t
        |    AND e.ts <= t1.t + INTERVAL 2 HOUR GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN t2 USING (user_id) JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t
        |    AND e.ts <= t1.t + INTERVAL 2 HOUR GROUP BY e.user_id)
        |SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM t2
        |UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM t3
        |ORDER BY step""".stripMargin,

    // the same inequality join, batch-exact: DuckDB's timestamps are
    // microseconds, matching the engine's ns div 1000 truncation
    "q_stream_join" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_attributed
        |FROM v JOIN b ON v.user_id = b.user_id
        | AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    "q_session" ->
      """WITH s AS (
        | SELECT user_id,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        | FROM events)
        |SELECT user_id, CAST(1 + sum(brk) AS BIGINT) AS n_sessions,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_count_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem""".stripMargin,

    "q_percentile" ->
      """SELECT round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
        |FROM lineitem""".stripMargin,

    "q_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        | true AS parts_err_ok, true AS orders_err_ok
        |FROM lineitem""".stripMargin,

    "q_approx_percentile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
        | true AS ap50_ok, true AS ap99_ok
        |FROM lineitem""".stripMargin,

    "q_stream_sample" ->
      """SELECT key, priority FROM (
        | SELECT DISTINCT CAST(user_id AS VARCHAR) AS key,
        |  md5(CAST(user_id AS VARCHAR)) AS priority
        | FROM events WHERE user_id IS NOT NULL
        | ORDER BY priority, key LIMIT 32)
        |ORDER BY priority, key""".stripMargin,

    "q_pettitt" ->
      """WITH s AS (SELECT ts, event_id, CAST(value AS DOUBLE) AS v
        |       FROM events WHERE value IS NOT NULL),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1),
        |r AS (SELECT v, CAST(2 * sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - c + 1 AS BIGINT) AS r2 FROM h),
        |cum AS (SELECT
        |  CAST(sum(r2) OVER w AS BIGINT) AS s2,
        |  CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS t
        | FROM s JOIN r USING (v)
        | WINDOW w AS (ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
        |u AS (SELECT t, abs(s2 - t * (n + 1)) AS au FROM cum, tot
        |      WHERE t < n),
        |m AS (SELECT max(au) AS k FROM u),
        |am AS (SELECT min(t) AS change_t FROM u, m WHERE au = k),
        |p AS (SELECT least(2.0 * exp(-6.0 * k * k /
        |  (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)), 1.0) AS pv,
        |  n, k FROM m, tot)
        |SELECT n, k AS k_stat, change_t,
        | CASE WHEN n >= 2 THEN round(pv, 6) END AS p_approx,
        | CASE WHEN n >= 2 THEN pv < 0.05 END AS reject_05
        |FROM p, am""".stripMargin,

    "q_cusum_changepoint" ->
      """WITH series AS (SELECT event_type AS k, CAST(ts AS DATE) AS d,
        |        CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT k, avg(x) AS mean, stddev_samp(x) AS sd,
        |        CAST(count(*) AS BIGINT) AS n FROM series GROUP BY k),
        |st AS (SELECT s.k, s.d,
        |        sum(s.x - m.mean) OVER (PARTITION BY s.k ORDER BY s.d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |       FROM series s JOIN m USING (k)),
        |pick AS (SELECT k, d, abs(cs) AS a,
        |        row_number() OVER (PARTITION BY k
        |          ORDER BY abs(cs) DESC, d) AS rn FROM st)
        |SELECT m.k AS key, m.n AS n_points, round(m.mean, 6) AS mean,
        | round(m.sd, 6) AS sd, round(p.a, 6) AS max_abs_cusum,
        | p.d AS changepoint_at,
        | CASE WHEN round(m.sd, 6) > 0
        |      THEN round(p.a / (round(m.sd, 6) * sqrt(m.n)), 6)
        |      ELSE 0.0 END AS score
        |FROM pick p JOIN m USING (k) WHERE p.rn = 1 ORDER BY key""".stripMargin,

    "q_anomaly" ->
      """WITH r AS (SELECT event_type, value,
        |  round(avg(value) OVER w, 6) AS roll_mean,
        |  round(stddev_samp(value) OVER w, 6) AS roll_std
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |              RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN roll_std IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_thin,
        | CAST(sum(CASE WHEN roll_std IS NOT NULL
        |   AND abs(value - roll_mean) > 3 * roll_std THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_anomalies,
        | round(max(CASE WHEN roll_std IS NOT NULL
        |   AND abs(value - roll_mean) > 3 * roll_std THEN value END), 4)
        |   AS max_anomaly_value
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_logrank" ->
      s"""WITH subj AS (SELECT CAST(count(*) AS DOUBLE) AS t,
        |        user_id % 4 != 0 AS e,
        |        ${PipelineQueries.duckHex16("CAST(user_id AS VARCHAR)")} % 2 = 0 AS a
        |       FROM events GROUP BY user_id),
        |cnt AS (SELECT t, a, count(*) AS x,
        |        sum(CASE WHEN e THEN 1 ELSE 0 END) AS d
        |       FROM subj GROUP BY 1, 2),
        |grid AS (SELECT ts.t, arms.a, coalesce(cnt.x, 0) AS x,
        |        coalesce(cnt.d, 0) AS d
        |       FROM (SELECT DISTINCT t FROM cnt) ts
        |       CROSS JOIN (SELECT unnest([false, true]) AS a) arms
        |       LEFT JOIN cnt ON ts.t = cnt.t AND arms.a = cnt.a),
        |tot AS (SELECT a, count(*) AS n0 FROM subj GROUP BY 1),
        |ar AS (SELECT grid.t, grid.a, grid.d,
        |        tot.n0 - (sum(grid.x) OVER (PARTITION BY grid.a
        |          ORDER BY grid.t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) - grid.x) AS r
        |       FROM grid JOIN tot ON grid.a = tot.a),
        |pt AS (SELECT t, sum(CASE WHEN a THEN d END) AS da, sum(d) AS dt,
        |        sum(CASE WHEN a THEN r END) AS na, sum(r) AS nt
        |       FROM ar GROUP BY 1 HAVING sum(d) > 0 AND sum(r) > 1),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
        |       CAST(sum(da) AS BIGINT) AS obs_a,
        |       sum(dt * na / nt) AS ea,
        |       sum(dt * (na / CAST(nt AS DOUBLE))
        |         * (1 - na / CAST(nt AS DOUBLE))
        |         * (nt - dt) / (nt - 1)) AS va
        |      FROM pt)
        |SELECT n_times, obs_a, round(ea, 6) AS exp_a, round(va, 6) AS var_a,
        | CASE WHEN va > 0 THEN round((obs_a - ea) / sqrt(va), 6) END AS z,
        | CASE WHEN va > 0 THEN
        |   round((obs_a - ea) * (obs_a - ea) / va, 6) END AS chi2
        |FROM f""".stripMargin,

    "q_sprt" -> {
      // the per-step LLR and thresholds interpolate the ENGINE's Scala
      // doubles at full precision (Double.toString round-trips), so the
      // cumulative walk is FP-identical on both sides — a libm ln()
      // difference at the 17th digit must not flip a knife-edge crossing
      val l1 = math.log(0.5 / 0.3)
      val l0 = math.log(0.5 / 0.7)
      val aT = math.log((1 - 0.2) / 0.05)
      val bT = math.log(0.2 / (1 - 0.05))
      s"""WITH d AS (SELECT event_type AS k, ts, event_id,
        |        CASE WHEN ${PipelineQueries.duckHex16("CAST(event_id AS VARCHAR)")} % 100 < 35
        |             THEN CAST($l1 AS DOUBLE)
        |             ELSE CAST($l0 AS DOUBLE) END AS step
        |       FROM events),
        |w AS (SELECT k,
        |        sum(step) OVER (PARTITION BY k ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
        |        row_number() OVER (PARTITION BY k ORDER BY ts, event_id) AS i
        |       FROM d),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |        arg_max(llr, i) AS llr_last,
        |        min(CASE WHEN llr >= CAST($aT AS DOUBLE) THEN i END) AS up,
        |        min(CASE WHEN llr <= CAST($bT AS DOUBLE) THEN i END) AS dn
        |       FROM w GROUP BY 1)
        |SELECT k AS key, n, round(llr_last, 6) AS llr_final,
        | CASE WHEN up IS NOT NULL AND (dn IS NULL OR up <= dn)
        |        THEN 'accept_h1'
        |      WHEN dn IS NOT NULL THEN 'accept_h0'
        |      ELSE 'continue' END AS decision,
        | CAST(least(up, dn) AS INT) AS decided_at
        |FROM g ORDER BY key""".stripMargin
    },

    "q_stream_drift" ->
      """WITH ref AS (SELECT value AS v FROM events
        |             WHERE event_type = 'view' AND value IS NOT NULL),
        |b AS (SELECT CAST(event_id % 3 AS BIGINT) AS batch_id, value AS v
        |      FROM events
        |      WHERE event_type = 'purchase' AND value IS NOT NULL),
        |ids AS (SELECT DISTINCT batch_id FROM b),
        |bd AS (SELECT ids.batch_id,
        |        least((SELECT min(v) FROM ref),
        |          (SELECT min(v) FROM b WHERE b.batch_id = ids.batch_id)) AS lo,
        |        greatest((SELECT max(v) FROM ref),
        |          (SELECT max(v) FROM b WHERE b.batch_id = ids.batch_id)) AS hi
        |       FROM ids),
        |ha AS (SELECT bd.batch_id, least(9, CAST(floor((ref.v - bd.lo)
        |         / ((bd.hi - bd.lo) / 10)) AS INT)) AS bin, count(*) AS c
        |       FROM ref, bd GROUP BY 1, 2),
        |hb AS (SELECT bd.batch_id, least(9, CAST(floor((b.v - bd.lo)
        |         / ((bd.hi - bd.lo) / 10)) AS INT)) AS bin, count(*) AS c
        |       FROM b JOIN bd ON b.batch_id = bd.batch_id GROUP BY 1, 2),
        |grid AS (SELECT ids.batch_id, g.bin
        |         FROM ids, (SELECT unnest(generate_series(0, 9)) AS bin) g),
        |m AS (SELECT grid.batch_id, grid.bin, coalesce(ha.c, 0) AS ca,
        |        coalesce(hb.c, 0) AS cb
        |      FROM grid
        |      LEFT JOIN ha ON grid.batch_id = ha.batch_id AND grid.bin = ha.bin
        |      LEFT JOIN hb ON grid.batch_id = hb.batch_id AND grid.bin = hb.bin),
        |t AS (SELECT batch_id, sum(ca) AS na, sum(cb) AS nb
        |      FROM m GROUP BY 1)
        |SELECT m.batch_id,
        | round(sum(((ca+0.5)/(t.na+5.0) - (cb+0.5)/(t.nb+5.0))
        |   * ln(((ca+0.5)/(t.na+5.0))/((cb+0.5)/(t.nb+5.0)))), 6) AS psi,
        | CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b, 10 AS n_bins
        |FROM m JOIN t ON m.batch_id = t.batch_id
        |GROUP BY m.batch_id, t.na, t.nb ORDER BY m.batch_id""".stripMargin,

    // cumulative prefix counts per batch + the engine's rank-band
    // verdicts over its own sketch estimates
    "q_stream_quantile" ->
      """WITH p AS (SELECT event_id % 3 AS b, value FROM events
        |           WHERE event_type = 'purchase'),
        |g AS (SELECT b, q FROM (SELECT unnest([0, 1, 2]) AS b),
        |       (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |          CAST(0.99 AS DOUBLE)]) AS q))
        |SELECT CAST(g.b AS BIGINT) AS batch_id, g.q AS q,
        | (SELECT CAST(count(value) AS BIGINT) FROM p WHERE p.b <= g.b)
        |   AS n_seen,
        | true AS rank_ok
        |FROM g ORDER BY 1, 2""".stripMargin,

    "q_drift_psi" ->
      """WITH va AS (SELECT value AS v FROM events
        |            WHERE event_type = 'view' AND value IS NOT NULL),
        |vb AS (SELECT value AS v FROM events
        |       WHERE event_type = 'purchase' AND value IS NOT NULL),
        |bd AS (SELECT min(v) AS lo, max(v) AS hi
        |       FROM (SELECT v FROM va UNION ALL SELECT v FROM vb)),
        |ha AS (SELECT least(9, CAST(floor((v - bd.lo) / ((bd.hi - bd.lo) / 10))
        |         AS INT)) AS bin, count(*) AS c FROM va, bd GROUP BY 1),
        |hb AS (SELECT least(9, CAST(floor((v - bd.lo) / ((bd.hi - bd.lo) / 10))
        |         AS INT)) AS bin, count(*) AS c FROM vb, bd GROUP BY 1),
        |bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |m AS (SELECT bins.bin, coalesce(ha.c, 0) AS ca, coalesce(hb.c, 0) AS cb
        |      FROM bins LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin)),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM m)
        |SELECT round(sum(((ca+0.5)/(t.na+5.0) - (cb+0.5)/(t.nb+5.0))
        |         * ln(((ca+0.5)/(t.na+5.0))/((cb+0.5)/(t.nb+5.0)))), 6) AS psi,
        | CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        | 10 AS n_bins
        |FROM m, t GROUP BY t.na, t.nb""".stripMargin,

    "q_corr" ->
      """WITH r AS (SELECT l_quantity AS x, l_extendedprice AS y,
        |  rank() OVER (ORDER BY l_quantity)
        |    + (count(*) OVER (PARTITION BY l_quantity) - 1)/2.0 AS rx,
        |  rank() OVER (ORDER BY l_extendedprice)
        |    + (count(*) OVER (PARTITION BY l_extendedprice) - 1)/2.0 AS ry
        | FROM lineitem)
        |SELECT round(corr(x, y), 6) AS pearson,
        | round(covar_samp(x, y), 2) AS covar,
        | round(corr(rx, ry), 6) AS spearman FROM r""".stripMargin,

    "q_psi_over_time" ->
      """WITH v AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS p,
        |  CAST(value AS DOUBLE) AS v
        | FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT min(v) AS lo, max(v) AS hi, min(p) AS base FROM v),
        |bn AS (SELECT p, CASE WHEN hi = lo THEN 0
        |  ELSE least(9, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))
        |  END AS bin FROM v, b),
        |cells AS (SELECT p, bin, count(*) AS c FROM bn GROUP BY p, bin),
        |per AS (SELECT p, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY p),
        |grid AS (SELECT per.p, per.n, g.bin,
        |   CAST(coalesce(cells.c, 0) AS BIGINT) AS c
        |  FROM per CROSS JOIN (SELECT unnest(range(10)) AS bin) g
        |  LEFT JOIN cells ON cells.p = per.p AND cells.bin = g.bin),
        |bc AS (SELECT bin, c AS cb, n AS nb FROM grid, b WHERE p = base),
        |raw AS (SELECT g.p, g.n, round(sum(
        |   ((CAST(g.c AS DOUBLE) + 0.5) / (CAST(g.n AS DOUBLE) + 5)
        |    - (CAST(bc.cb AS DOUBLE) + 0.5) / (CAST(bc.nb AS DOUBLE) + 5))
        |   * ln(((CAST(g.c AS DOUBLE) + 0.5) / (CAST(g.n AS DOUBLE) + 5))
        |      / ((CAST(bc.cb AS DOUBLE) + 0.5) / (CAST(bc.nb AS DOUBLE) + 5)))
        |  ), 6) AS psi
        | FROM grid g JOIN bc USING (bin) GROUP BY g.p, g.n)
        |SELECT p AS period, n, psi, psi > 0.25 AS drifted
        |FROM raw ORDER BY period""".stripMargin,

    // Durbin-Levinson unrolled in closed form for K=3
    "q_acf" ->
      """WITH s AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |        CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1),
        |m AS (SELECT avg(x) AS m FROM s),
        |c AS (SELECT h, x - m.m AS c0 FROM s, m),
        |l AS (SELECT c0, lead(c0, 1) OVER (ORDER BY h) AS c1,
        |       lead(c0, 2) OVER (ORDER BY h) AS c2,
        |       lead(c0, 3) OVER (ORDER BY h) AS c3 FROM c),
        |a AS (SELECT sum(c0 * c0) AS den,
        |       sum(c0 * c1) AS s1, CAST(count(c1) AS BIGINT) AS np1,
        |       sum(c0 * c2) AS s2, CAST(count(c2) AS BIGINT) AS np2,
        |       sum(c0 * c3) AS s3, CAST(count(c3) AS BIGINT) AS np3 FROM l),
        |r AS (SELECT np1, np2, np3, s1 / den AS r1, s2 / den AS r2,
        |       s3 / den AS r3 FROM a),
        |p AS (SELECT *, r1 AS p1,
        |       (r2 - r1 * r1) / (1 - r1 * r1) AS p2 FROM r),
        |pp AS (SELECT *, r1 * (1 - p2) AS phi21,
        |        (1 - r1 * r1) * (1 - p2 * p2) AS v2 FROM p),
        |f AS (SELECT *, (r3 - (phi21 * r2 + p2 * r1)) / v2 AS p3 FROM pp)
        |SELECT g.lag,
        | CASE g.lag WHEN 1 THEN np1 WHEN 2 THEN np2 ELSE np3 END AS n_pairs,
        | round(CASE g.lag WHEN 1 THEN r1 WHEN 2 THEN r2 ELSE r3 END, 6)
        |   AS acf,
        | round(CASE g.lag WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END, 6)
        |   AS pacf
        |FROM (SELECT unnest([1, 2, 3]) AS lag) g, f ORDER BY lag""".stripMargin,

    // q_acf's moment CTEs feeding the portmanteau sum + the shared
    // Wilson-Hilferty critical value
    "q_ljung_box" ->
      """WITH s AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |        CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1),
        |m AS (SELECT avg(x) AS m, CAST(count(*) AS BIGINT) AS n FROM s),
        |c AS (SELECT h, x - m.m AS c0 FROM s, m),
        |l AS (SELECT c0, lead(c0, 1) OVER (ORDER BY h) AS c1,
        |       lead(c0, 2) OVER (ORDER BY h) AS c2,
        |       lead(c0, 3) OVER (ORDER BY h) AS c3 FROM c),
        |a AS (SELECT sum(c0 * c0) AS den, sum(c0 * c1) AS s1,
        |       sum(c0 * c2) AS s2, sum(c0 * c3) AS s3 FROM l),
        |q AS (SELECT m.n, m.n * (m.n + 2.0) *
        |       ((s1 / den) * (s1 / den) / (m.n - 1)
        |        + (s2 / den) * (s2 / den) / (m.n - 2)
        |        + (s3 / den) * (s3 / den) / (m.n - 3)) AS q_stat,
        |       CAST(7.814727903251179 AS DOUBLE) AS crit
        |      FROM a, m)
        |SELECT n, 3 AS max_lag, round(q_stat, 6) AS q_stat,
        | round(crit, 6) AS crit_05, q_stat > crit AS reject_05
        |FROM q""".stripMargin,

    // exact prefix counts/distincts + the engine's HLL band verdicts
    "q_stream_distinct" ->
      """WITH p AS (SELECT event_id % 3 AS b, user_id FROM events)
        |SELECT CAST(g.b AS BIGINT) AS batch_id,
        | (SELECT CAST(count(user_id) AS BIGINT) FROM p WHERE p.b <= g.b)
        |   AS n_rows_seen,
        | (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM p
        |   WHERE p.b <= g.b) AS n_exact,
        | true AS est_ok
        |FROM (SELECT unnest([0, 1, 2]) AS b) g ORDER BY batch_id""".stripMargin,

    // q_psi_over_time's bin/smoothing algebra with the baseline = the
    // POOLED histogram (a rollup of the slice cells)
    "q_slice_psi" ->
      """WITH v AS (SELECT source AS s, CAST(n_chars AS DOUBLE) AS v
        | FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
        |bn AS (SELECT s, CASE WHEN hi = lo THEN 0
        |  ELSE least(9, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))
        |  END AS bin FROM v, b),
        |cells AS (SELECT s, bin, count(*) AS c FROM bn GROUP BY s, bin),
        |nb AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM cells),
        |per AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY s),
        |grid AS (SELECT per.s, per.n, g.bin,
        |   CAST(coalesce(cells.c, 0) AS BIGINT) AS c
        |  FROM per CROSS JOIN (SELECT unnest(range(10)) AS bin) g
        |  LEFT JOIN cells ON cells.s = per.s AND cells.bin = g.bin),
        |pool AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cb FROM grid GROUP BY bin),
        |raw AS (SELECT g.s, g.n, round(sum(
        |   ((CAST(g.c AS DOUBLE) + 0.5) / (CAST(g.n AS DOUBLE) + 5)
        |    - (CAST(pool.cb AS DOUBLE) + 0.5) / (CAST(nb.nb AS DOUBLE) + 5))
        |   * ln(((CAST(g.c AS DOUBLE) + 0.5) / (CAST(g.n AS DOUBLE) + 5))
        |      / ((CAST(pool.cb AS DOUBLE) + 0.5) / (CAST(nb.nb AS DOUBLE) + 5)))
        |  ), 6) AS psi
        | FROM grid g JOIN pool USING (bin) CROSS JOIN nb GROUP BY g.s, g.n)
        |SELECT s AS slice, n, psi, psi > 0.25 AS drifted
        |FROM raw ORDER BY slice""".stripMargin,

    // corr() per pair on the oracle side is fine — DuckDB's sample corr
    // equals the engine's covar_pop/sqrt(var_pop*var_pop) ratio exactly
    // (the n-1 factors cancel); 6dp rounding per the q_corr precedent
    "q_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           | CAST(count(*) AS BIGINT) AS n,
           | round(corr($a, $b), 6) AS corr FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    "q_ohlc" ->
      """WITH r AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  event_type AS grp, value,
        |  row_number() OVER (PARTITION BY date_trunc('day', ts), event_type
        |    ORDER BY ts, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY date_trunc('day', ts), event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events)
        |SELECT bucket, grp, CAST(count(*) AS BIGINT) AS n,
        | round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
        | round(max(value), 6) AS high,
        | round(min(value), 6) AS low,
        | round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
        | round(sum(value), 6) AS total,
        | round(avg(value), 6) AS mean
        |FROM r GROUP BY bucket, grp ORDER BY bucket, grp""".stripMargin,

    // same rankings, same max-rank suffix weights (the 12-decimal
    // literals the engine rounds to)
    "q_rbo" ->
      """WITH a AS (SELECT lang, doc_id, row_number() OVER
        |  (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS ra
        | FROM documents),
        |b AS (SELECT lang, doc_id, row_number() OVER
        |  (PARTITION BY lang ORDER BY doc_id % 97, doc_id) AS rb
        | FROM documents),
        |j AS (SELECT a.lang, greatest(a.ra, b.rb) AS m
        | FROM a JOIN b USING (lang, doc_id)
        | WHERE a.ra <= 10 AND b.rb <= 10),
        |q AS (SELECT DISTINCT lang FROM documents)
        |SELECT q.lang AS qid, round(coalesce(sum(CAST(CASE m
        |  WHEN 1 THEN 0.235416399426 WHEN 2 THEN 0.135416399426
        |  WHEN 3 THEN 0.090416399426 WHEN 4 THEN 0.063416399426
        |  WHEN 5 THEN 0.045191399426 WHEN 6 THEN 0.032069399426
        |  WHEN 7 THEN 0.022227899426 WHEN 8 THEN 0.014635885140
        |  WHEN 9 THEN 0.008657173890 WHEN 10 THEN 0.003874204890
        |  END AS DOUBLE)), 0), 6) AS rbo
        |FROM q LEFT JOIN j ON j.lang = q.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same histogram, same CDF-gap and critical-value arithmetic
    "q_ks_test" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |  CAST(sum(b) AS BIGINT) AS cb FROM s GROUP BY 1),
        |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
        |  sum(cb) OVER (ORDER BY v) AS cumb FROM h),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |d AS (SELECT t.na, t.nb,
        |  max(abs(CAST(c.cuma AS DOUBLE) / t.na -
        |          CAST(c.cumb AS DOUBLE) / t.nb)) AS ksd
        | FROM c, t GROUP BY 1, 2)
        |SELECT na AS n_a, nb AS n_b, round(ksd, 6) AS ks_d,
        | round(1.358 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb)), 6)
        |   AS crit_05,
        | ksd > 1.358 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb))
        |   AS reject_05
        |FROM d""".stripMargin,

    // same tie-averaged rank algebra, same tie-corrected variance
    "q_rdd" ->
      """WITH base AS (SELECT CAST(n_chars % 200 AS DOUBLE) - 100 AS x,
        |  CAST((n_chars % 89) +
        |   CASE WHEN n_chars % 200 >= 100 THEN 10 ELSE 0 END AS DOUBLE)
        |    AS y
        | FROM documents
        | WHERE n_chars IS NOT NULL
        |   AND CAST(n_chars % 200 AS DOUBLE) - 100 >= -50
        |   AND CAST(n_chars % 200 AS DOUBLE) - 100 <= 50),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        |  CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nl,
        |  sum(CASE WHEN x >= 0 THEN x ELSE 0 END) AS sxr,
        |  sum(CASE WHEN x < 0 THEN x ELSE 0 END) AS sxl,
        |  sum(CASE WHEN x >= 0 THEN y ELSE 0 END) AS syr,
        |  sum(CASE WHEN x < 0 THEN y ELSE 0 END) AS syl,
        |  sum(CASE WHEN x >= 0 THEN x * x ELSE 0 END) AS sxxr,
        |  sum(CASE WHEN x < 0 THEN x * x ELSE 0 END) AS sxxl,
        |  sum(CASE WHEN x >= 0 THEN y * y ELSE 0 END) AS syyr,
        |  sum(CASE WHEN x < 0 THEN y * y ELSE 0 END) AS syyl,
        |  sum(CASE WHEN x >= 0 THEN x * y ELSE 0 END) AS sxyr,
        |  sum(CASE WHEN x < 0 THEN x * y ELSE 0 END) AS sxyl
        | FROM base),
        |f AS (SELECT nl, nr,
        |  (sxyl - sxl * syl / nl) / (sxxl - sxl * sxl / nl) AS bl,
        |  (sxyr - sxr * syr / nr) / (sxxr - sxr * sxr / nr) AS br,
        |  sxxl - sxl * sxl / nl AS cxxl, sxxr - sxr * sxr / nr AS cxxr,
        |  nl AS _nl, nr AS _nr, sxl, sxr, syl, syr, syyl, syyr, sxyl,
        |  sxyr FROM a),
        |g AS (SELECT *,
        |  (syl - bl * sxl) / nl AS al, (syr - br * sxr) / nr AS ar FROM f),
        |h AS (SELECT *,
        |  (syyl - al * syl - bl * sxyl) / (nl - 2) AS s2l,
        |  (syyr - ar * syr - br * sxyr) / (nr - 2) AS s2r FROM g),
        |i AS (SELECT *,
        |  s2l * (1.0 / nl + (sxl / nl) * (sxl / nl) / cxxl) AS va_l,
        |  s2r * (1.0 / nr + (sxr / nr) * (sxr / nr) / cxxr) AS va_r FROM h)
        |SELECT nl AS n_l, nr AS n_r,
        | CASE WHEN nl >= 3 AND cxxl > 0 THEN round(bl, 6) END AS slope_l,
        | CASE WHEN nr >= 3 AND cxxr > 0 THEN round(br, 6) END AS slope_r,
        | CASE WHEN nl >= 3 AND cxxl > 0 AND nr >= 3 AND cxxr > 0
        |  THEN round(ar - al, 6) END AS effect,
        | CASE WHEN nl >= 3 AND cxxl > 0 AND nr >= 3 AND cxxr > 0
        |   AND va_l + va_r >= 0
        |  THEN round(sqrt(va_l + va_r), 6) END AS se,
        | CASE WHEN nl >= 3 AND cxxl > 0 AND nr >= 3 AND cxxr > 0
        |   AND sqrt(va_l + va_r) > 0
        |  THEN abs((ar - al) / sqrt(va_l + va_r)) > 1.959963984540054 END
        |   AS reject_05
        |FROM i""".stripMargin,

    "q_cochran_armitage" ->
      """WITH base AS (SELECT
        |  CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
        |   WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS s,
        |  CASE WHEN doc_id % 3 = 0 OR n_chars % 5 = 0 THEN 1 ELSE 0 END
        |    AS y
        | FROM documents),
        |per AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS r
        | FROM base WHERE s IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
        |  CAST(sum(s * n) AS BIGINT) AS sn,
        |  CAST(sum(s * s * n) AS BIGINT) AS ssn,
        |  CAST(sum(s * r) AS BIGINT) AS sr FROM per),
        |f AS (SELECT *, rr / CAST(nn AS DOUBLE) AS pbar,
        |  sr - sn * (rr / CAST(nn AS DOUBLE)) AS t FROM a),
        |g AS (SELECT *, pbar * (1.0 - pbar) *
        |  (ssn - CAST(sn AS DOUBLE) * sn / nn) AS vr FROM f)
        |SELECT k, nn AS n, round(pbar, 6) AS pooled_rate,
        | round(t, 6) AS t_stat,
        | CASE WHEN k >= 2 AND vr > 0 THEN round(t / sqrt(vr), 6) END AS z,
        | CASE WHEN k >= 2 AND vr > 0
        |  THEN abs(t / sqrt(vr)) > 1.959963984540054 END AS reject_05
        |FROM g""".stripMargin,

    "q_smd_balance" ->
      """WITH base AS (SELECT (doc_id % 3 = 0) AS t,
        |  CAST(n_chars AS DOUBLE) AS x0,
        |  CAST(n_chars % 97 AS DOUBLE) AS x1,
        |  CAST(doc_id % 13 AS DOUBLE) AS x2 FROM documents
        | WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |  CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |  sum(CASE WHEN t THEN x0 ELSE 0 END) AS st0,
        |  sum(CASE WHEN NOT t THEN x0 ELSE 0 END) AS sc0,
        |  sum(CASE WHEN t THEN x0 * x0 ELSE 0 END) AS qt0,
        |  sum(CASE WHEN NOT t THEN x0 * x0 ELSE 0 END) AS qc0,
        |  sum(CASE WHEN t THEN x1 ELSE 0 END) AS st1,
        |  sum(CASE WHEN NOT t THEN x1 ELSE 0 END) AS sc1,
        |  sum(CASE WHEN t THEN x1 * x1 ELSE 0 END) AS qt1,
        |  sum(CASE WHEN NOT t THEN x1 * x1 ELSE 0 END) AS qc1,
        |  sum(CASE WHEN t THEN x2 ELSE 0 END) AS st2,
        |  sum(CASE WHEN NOT t THEN x2 ELSE 0 END) AS sc2,
        |  sum(CASE WHEN t THEN x2 * x2 ELSE 0 END) AS qt2,
        |  sum(CASE WHEN NOT t THEN x2 * x2 ELSE 0 END) AS qc2
        | FROM base),
        |u AS (
        | SELECT 'n_chars' AS covariate, st0 AS st, sc0 AS sc, qt0 AS qt,
        |   qc0 AS qc, nt, nc FROM a
        | UNION ALL SELECT 'len_mod97', st1, sc1, qt1, qc1, nt, nc FROM a
        | UNION ALL SELECT 'id_mod13', st2, sc2, qt2, qc2, nt, nc FROM a),
        |f AS (SELECT covariate, nt, nc,
        |  st / CAST(nt AS DOUBLE) AS mt, sc / CAST(nc AS DOUBLE) AS mc,
        |  (qt - st * st / CAST(nt AS DOUBLE)) / (nt - 1) AS vt,
        |  (qc - sc * sc / CAST(nc AS DOUBLE)) / (nc - 1) AS vc FROM u),
        |g AS (SELECT *, sqrt((vt + vc) / 2.0) AS pooled FROM f)
        |SELECT covariate, round(mt, 6) AS mean_t, round(mc, 6) AS mean_c,
        | CASE WHEN nt >= 2 AND nc >= 2 AND pooled > 0
        |  THEN round((mt - mc) / pooled, 6) END AS smd,
        | CASE WHEN nt >= 2 AND nc >= 2 AND pooled > 0
        |  THEN abs((mt - mc) / pooled) < 0.1 END AS balanced
        |FROM g ORDER BY covariate""".stripMargin,

    "q_cuped" ->
      """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
        |        CAST(floor(epoch(max(ts))) AS BIGINT) AS mx FROM events),
        |per AS (SELECT user_id,
        |  CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2
        |    < b.mn + b.mx THEN 1 ELSE 0 END) AS DOUBLE) AS x,
        |  CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2
        |    >= b.mn + b.mx THEN 1 ELSE 0 END) AS DOUBLE) AS y
        | FROM events, b GROUP BY user_id, b.mn, b.mx),
        |a AS (SELECT (user_id % 2 = 0) AS t, CAST(count(*) AS BIGINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |  sum(y * y) AS syy, sum(x * y) AS sxy FROM per GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN t THEN n END) AS nt,
        |  max(CASE WHEN NOT t THEN n END) AS nc,
        |  max(CASE WHEN t THEN sx END) AS sxt,
        |  max(CASE WHEN NOT t THEN sx END) AS sxc,
        |  max(CASE WHEN t THEN sy END) AS syt,
        |  max(CASE WHEN NOT t THEN sy END) AS syc,
        |  max(CASE WHEN t THEN sxx END) AS sxxt,
        |  max(CASE WHEN NOT t THEN sxx END) AS sxxc,
        |  max(CASE WHEN t THEN syy END) AS syyt,
        |  max(CASE WHEN NOT t THEN syy END) AS syyc,
        |  max(CASE WHEN t THEN sxy END) AS sxyt,
        |  max(CASE WHEN NOT t THEN sxy END) AS sxyc FROM a),
        |f AS (SELECT *,
        |  CAST(nt AS DOUBLE) AS ntd, CAST(nc AS DOUBLE) AS ncd,
        |  CAST(nt AS DOUBLE) + nc AS n,
        |  sxt + sxc AS sx, syt + syc AS sy, sxxt + sxxc AS sxx,
        |  syyt + syyc AS syy, sxyt + sxyc AS sxy FROM w),
        |g AS (SELECT *,
        |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th FROM f),
        |h AS (SELECT *,
        |  syt / ntd - syc / ncd AS lraw,
        |  syt / ntd - syc / ncd - th * (sxt / ntd - sxc / ncd) AS ladj,
        |  sqrt((syyt - syt * syt / ntd) / (ntd - 1) / ntd +
        |       (syyc - syc * syc / ncd) / (ncd - 1) / ncd) AS seraw,
        |  sqrt((syyt - 2.0 * th * sxyt + th * th * sxxt -
        |        (syt - th * sxt) * (syt - th * sxt) / ntd) / (ntd - 1)
        |        / ntd +
        |       (syyc - 2.0 * th * sxyc + th * th * sxxc -
        |        (syc - th * sxc) * (syc - th * sxc) / ncd) / (ncd - 1)
        |        / ncd) AS seadj,
        |  syy - 2.0 * th * sxy + th * th * sxx -
        |   (sy - th * sx) * (sy - th * sx) / n AS vres,
        |  syy - sy * sy / n AS vy FROM g)
        |SELECT nt AS n_t, nc AS n_c,
        | CASE WHEN nt >= 2 AND nc >= 2 AND sxx - sx * sx / n > 0
        |  THEN round(th, 6) END AS theta,
        | CASE WHEN nt >= 2 AND nc >= 2 THEN round(lraw, 6) END AS lift_raw,
        | CASE WHEN nt >= 2 AND nc >= 2 THEN round(seraw, 6) END AS se_raw,
        | CASE WHEN nt >= 2 AND nc >= 2 AND sxx - sx * sx / n > 0
        |  THEN round(ladj, 6) END AS lift_adj,
        | CASE WHEN nt >= 2 AND nc >= 2 AND sxx - sx * sx / n > 0
        |  THEN round(seadj, 6) END AS se_adj,
        | CASE WHEN nt >= 2 AND nc >= 2 AND sxx - sx * sx / n > 0
        |   AND vy > 0 THEN round(1.0 - vres / vy, 6) END AS var_reduction,
        | CASE WHEN nt >= 2 AND nc >= 2 AND sxx - sx * sx / n > 0
        |   AND seadj > 0 THEN abs(ladj / seadj) > 1.959963984540054 END
        |   AS reject_05
        |FROM h""".stripMargin,

    "q_did" ->
      """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
        |        CAST(floor(epoch(max(ts))) AS BIGINT) AS mx FROM events),
        |per AS (SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) * 2 >= b.mn + b.mx AS post,
        |  CAST(count(*) AS DOUBLE) AS y
        | FROM events, b GROUP BY user_id, 2, b.mn, b.mx),
        |a AS (SELECT (user_id % 2 = 0) AS t, post,
        |  CAST(count(*) AS BIGINT) AS n, sum(y) AS s, sum(y * y) AS ss
        | FROM per GROUP BY 1, 2),
        |w AS (SELECT
        |  max(CASE WHEN t AND post THEN n END) AS nt1,
        |  max(CASE WHEN t AND NOT post THEN n END) AS nt0,
        |  max(CASE WHEN NOT t AND post THEN n END) AS nc1,
        |  max(CASE WHEN NOT t AND NOT post THEN n END) AS nc0,
        |  max(CASE WHEN t AND post THEN s END) AS st1,
        |  max(CASE WHEN t AND NOT post THEN s END) AS st0,
        |  max(CASE WHEN NOT t AND post THEN s END) AS sc1,
        |  max(CASE WHEN NOT t AND NOT post THEN s END) AS sc0,
        |  max(CASE WHEN t AND post THEN ss END) AS sst1,
        |  max(CASE WHEN t AND NOT post THEN ss END) AS sst0,
        |  max(CASE WHEN NOT t AND post THEN ss END) AS ssc1,
        |  max(CASE WHEN NOT t AND NOT post THEN ss END) AS ssc0 FROM a),
        |f AS (SELECT *,
        |  (st1 / CAST(nt1 AS DOUBLE) - st0 / CAST(nt0 AS DOUBLE)) -
        |  (sc1 / CAST(nc1 AS DOUBLE) - sc0 / CAST(nc0 AS DOUBLE)) AS did,
        |  sqrt((sst1 - st1 * st1 / nt1) / (nt1 - 1) / nt1 +
        |       (sst0 - st0 * st0 / nt0) / (nt0 - 1) / nt0 +
        |       (ssc1 - sc1 * sc1 / nc1) / (nc1 - 1) / nc1 +
        |       (ssc0 - sc0 * sc0 / nc0) / (nc0 - 1) / nc0) AS se FROM w)
        |SELECT nt1 AS n_t_post, nt0 AS n_t_pre, nc1 AS n_c_post,
        | nc0 AS n_c_pre,
        | CASE WHEN nt1 >= 2 AND nt0 >= 2 AND nc1 >= 2 AND nc0 >= 2
        |  THEN round(did, 6) END AS did,
        | CASE WHEN nt1 >= 2 AND nt0 >= 2 AND nc1 >= 2 AND nc0 >= 2
        |  THEN round(se, 6) END AS se,
        | CASE WHEN nt1 >= 2 AND nt0 >= 2 AND nc1 >= 2 AND nc0 >= 2
        |   AND se > 0 THEN abs(did / se) > 1.959963984540054 END
        |   AS reject_05
        |FROM f""".stripMargin,

    "q_granger" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |        CAST(count(*) AS DOUBLE) AS y, sum(value) AS x
        |       FROM events GROUP BY 1),
        |lagd AS (SELECT y AS o, lag(y) OVER (ORDER BY d) AS x0,
        |        lag(x) OVER (ORDER BY d) AS x1 FROM daily),
        |b AS (SELECT o, x0, x1 FROM lagd
        |      WHERE x0 IS NOT NULL AND x1 IS NOT NULL),
        |mm AS (SELECT CAST(count(*) AS DOUBLE) AS a00, sum(x0) AS a01,
        |        sum(x1) AS a02, sum(x0*x0) AS a11, sum(x0*x1) AS a12,
        |        sum(x1*x1) AS a22, sum(o) AS v0, sum(x0*o) AS v1,
        |        sum(x1*o) AS v2, CAST(count(*) AS BIGINT) AS n FROM b),
        |f1 AS (SELECT *, sqrt(a00) AS l00 FROM mm),
        |f2 AS (SELECT *, a01/l00 AS l10, a02/l00 AS l20, v0/l00 AS z0
        |       FROM f1),
        |f3 AS (SELECT *, sqrt(a11 - l10*l10) AS l11 FROM f2),
        |f4 AS (SELECT *, (a12 - l20*l10)/l11 AS l21,
        |        (v1 - l10*z0)/l11 AS z1 FROM f3),
        |f5 AS (SELECT *, sqrt(a22 - (l20*l20 + l21*l21)) AS l22 FROM f4),
        |f6 AS (SELECT *, (v2 - (l20*z0 + l21*z1))/l22 AS z2 FROM f5),
        |f7 AS (SELECT *, z2/l22 AS w2 FROM f6),
        |f8 AS (SELECT *, (z1 - l21*w2)/l11 AS w1 FROM f7),
        |f9 AS (SELECT *, (z0 - (l10*w1 + l20*w2))/l00 AS w0 FROM f8),
        |bf AS (SELECT round(w0, 6) AS f0, round(w1, 6) AS f1w,
        |        round(w2, 6) AS f2w FROM f9),
        |r1 AS (SELECT *, sqrt(a00) AS m00 FROM mm),
        |r2 AS (SELECT *, a01/m00 AS m10, v0/m00 AS y0 FROM r1),
        |r3 AS (SELECT *, sqrt(a11 - m10*m10) AS m11 FROM r2),
        |r4 AS (SELECT *, (v1 - m10*y0)/m11 AS y1 FROM r3),
        |r5 AS (SELECT *, y1/m11 AS u1 FROM r4),
        |br AS (SELECT round((y0 - m10*u1)/m00, 6) AS r0,
        |        round(u1, 6) AS r1w FROM r5),
        |ss AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum((o - br.r0 - br.r1w*x0)*(o - br.r0 - br.r1w*x0)) AS sser,
        |  sum((o - bf.f0 - bf.f1w*x0 - bf.f2w*x1)
        |    * (o - bf.f0 - bf.f1w*x0 - bf.f2w*x1)) AS ssef
        | FROM b, br, bf),
        |ff AS (SELECT *, (sser - ssef)
        |        / (ssef / (CAST(n AS DOUBLE) - 3)) AS f FROM ss)
        |SELECT n, (SELECT f1w FROM bf) AS b_ylag,
        | (SELECT f2w FROM bf) AS b_xlag,
        | round(sser, 6) AS sse_r, round(ssef, 6) AS sse_f,
        | CASE WHEN ssef > 0 THEN round(f, 6) END AS f_stat,
        | CASE WHEN ssef > 0 AND CAST(n AS DOUBLE) - 3 >= 20
        |      THEN f > 3.841458820694124 END AS reject_05
        |FROM ff""".stripMargin,

    "q_theil_inequality" ->
      """WITH u AS (SELECT o_custkey AS c, sum(o_totalprice) AS x
        |           FROM orders GROUP BY 1),
        |up AS (SELECT x FROM u WHERE x >= 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mu,
        |        sum(x) AS tot FROM up),
        |t AS (SELECT any_value(n) AS n, any_value(tot) AS tot,
        |        avg(CASE WHEN x > 0 THEN (x / mu) * ln(x / mu)
        |            ELSE 0.0 END) AS th
        |      FROM up, m)
        |SELECT n AS n_units, round(tot, 4) AS total,
        | CASE WHEN n >= 2 AND tot > 0 THEN round(th, 6) END AS theil,
        | CASE WHEN n >= 2 AND tot > 0
        |      THEN round(th / ln(CAST(n AS DOUBLE)), 6) END AS theil_norm
        |FROM t""".stripMargin,

    "q_rate_ratio" ->
      """WITH pu AS (SELECT user_id,
        |        CAST(count(*) FILTER (event_type = 'purchase') AS DOUBLE)
        |          AS ev,
        |        CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE) AS days
        |       FROM events GROUP BY 1),
        |a AS (SELECT sum(CASE WHEN user_id % 2 = 0 THEN ev END) AS xa,
        |        sum(CASE WHEN user_id % 2 <> 0 THEN ev END) AS xb,
        |        sum(CASE WHEN user_id % 2 = 0 THEN days END) AS ta,
        |        sum(CASE WHEN user_id % 2 <> 0 THEN days END) AS tb
        |       FROM pu),
        |f AS (SELECT *, xa / ta AS ra, xb / tb AS rb,
        |        xa > 0 AND xb > 0 AND ta > 0 AND tb > 0 AS ok FROM a),
        |g AS (SELECT *, ln(ra / rb) / sqrt(1.0 / xa + 1.0 / xb) AS z
        |      FROM f)
        |SELECT CAST(xa AS BIGINT) AS x_a, CAST(xb AS BIGINT) AS x_b,
        | round(ta, 6) AS t_a, round(tb, 6) AS t_b,
        | CASE WHEN ta > 0 THEN round(ra, 6) END AS rate_a,
        | CASE WHEN tb > 0 THEN round(rb, 6) END AS rate_b,
        | CASE WHEN ok THEN round(ra / rb, 6) END AS ratio,
        | CASE WHEN ok THEN round(z, 6) END AS z,
        | CASE WHEN ok AND xa >= 10 AND xb >= 10 THEN abs(z) > 1.96 END
        |   AS reject_05
        |FROM g""".stripMargin,

    "q_overdispersion" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS c
        |           FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(c) AS s,
        |        sum(c * c) AS ss FROM pu),
        |m AS (SELECT n, s / n AS mean,
        |        ((ss - s * s / n) / (n - 1)) / (s / n) AS vmr FROM a),
        |f AS (SELECT *, (CAST(n AS DOUBLE) - 1) * vmr AS chi2 FROM m),
        |g AS (SELECT *, sqrt(2.0 * chi2)
        |        - sqrt(2.0 * (CAST(n AS DOUBLE) - 1) - 1) AS z FROM f)
        |SELECT n, round(mean, 6) AS mean, round(vmr, 6) AS vmr,
        | round(chi2, 6) AS chi2, round(z, 6) AS z,
        | CASE WHEN n >= 20 AND mean > 0 THEN abs(z) > 1.96 END
        |   AS reject_05
        |FROM g""".stripMargin,

    "q_influence" ->
      """WITH d AS (SELECT doc_id AS id, CAST(n_chars % 97 AS DOUBLE)/96
        |        AS x, CAST(n_chars % 89 AS DOUBLE) AS y FROM documents),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |        sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
        |        sum(y * y) AS syy FROM d),
        |m1 AS (SELECT n, sx / n AS xbar0, sx, sy, sxx, sxy, syy FROM a),
        |m2 AS (SELECT *, sxx - sx * xbar0 AS sxxc FROM m1),
        |m3 AS (SELECT *, (sxy - sx * sy / n) / sxxc AS b0 FROM m2),
        |m4 AS (SELECT *, sy / n - b0 * xbar0 AS a0,
        |        syy - sy * sy / n - b0 * b0 * sxxc AS sse FROM m3),
        |m5 AS (SELECT n, round(xbar0, 6) AS xb, round(sxxc, 6) AS sxxr,
        |        round(b0, 6) AS br, round(a0, 6) AS ar,
        |        round(sse / (CAST(n AS DOUBLE) - 2), 6) AS s2 FROM m4),
        |sc AS (SELECT d.id, d.x, d.y, m5.s2, d.y - ar - br * d.x AS e,
        |        1.0 / n + (d.x - xb) * (d.x - xb) / sxxr AS h
        |       FROM d, m5),
        |dd AS (SELECT *, e * e * h /
        |        ((2.0 * s2) * (1.0 - h) * (1.0 - h)) AS cd FROM sc)
        |SELECT id, x, y, round(e, 6) AS resid, round(h, 6) AS leverage,
        | round(cd, 6) AS cooks_d
        |FROM dd ORDER BY cd DESC, id LIMIT 10""".stripMargin,

    "q_ratio_metric" ->
      """WITH pu AS (SELECT user_id, sum(value) AS y,
        |        CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1),
        |d AS (SELECT y, x, user_id % 2 = 0 AS a FROM pu
        |      WHERE y IS NOT NULL),
        |g AS (SELECT
        |  CAST(count(*) FILTER (a) AS BIGINT) AS n_a,
        |  sum(x) FILTER (a) AS sxa, sum(y) FILTER (a) AS sya,
        |  sum(x*x) FILTER (a) AS sxxa, sum(y*y) FILTER (a) AS syya,
        |  sum(x*y) FILTER (a) AS sxya,
        |  CAST(count(*) FILTER (NOT a) AS BIGINT) AS n_b,
        |  sum(x) FILTER (NOT a) AS sxb, sum(y) FILTER (NOT a) AS syb,
        |  sum(x*x) FILTER (NOT a) AS sxxb, sum(y*y) FILTER (NOT a) AS syyb,
        |  sum(x*y) FILTER (NOT a) AS sxyb FROM d),
        |v1 AS (SELECT *, sya / sxa AS ra, syb / sxb AS rb,
        |  (syya - sya*sya/n_a)/(n_a - 1) AS vya,
        |  (sxxa - sxa*sxa/n_a)/(n_a - 1) AS vxa,
        |  (sxya - sxa*sya/n_a)/(n_a - 1) AS cxya, sxa/n_a AS xba,
        |  (syyb - syb*syb/n_b)/(n_b - 1) AS vyb,
        |  (sxxb - sxb*sxb/n_b)/(n_b - 1) AS vxb,
        |  (sxyb - sxb*syb/n_b)/(n_b - 1) AS cxyb, sxb/n_b AS xbb
        | FROM g),
        |v2 AS (SELECT *,
        |  (vya - 2.0*ra*cxya + ra*ra*vxa)/(n_a*xba*xba) AS va,
        |  (vyb - 2.0*rb*cxyb + rb*rb*vxb)/(n_b*xbb*xbb) AS vb FROM v1),
        |f AS (SELECT *, sqrt(va + vb) AS se, ra - rb AS diff,
        |  n_a >= 2 AND sxa <> 0 AND n_b >= 2 AND sxb <> 0 AS okn
        | FROM v2)
        |SELECT n_a, n_b,
        | CASE WHEN sxa <> 0 THEN round(ra, 6) END AS ratio_a,
        | CASE WHEN sxb <> 0 THEN round(rb, 6) END AS ratio_b,
        | CASE WHEN okn THEN round(diff, 6) END AS diff,
        | CASE WHEN okn AND se > 0 THEN round(se, 6) END AS se,
        | CASE WHEN okn AND se > 0 THEN round(diff / se, 6) END AS z,
        | CASE WHEN okn AND se > 0 AND n_a >= 20 AND n_b >= 20
        |      THEN abs(diff / se) > 1.959963984540054 END AS reject_05
        |FROM f""".stripMargin,

    "q_event_study" ->
      """WITH pu AS (SELECT user_id,
        |        CAST(floor((dayofmonth(ts) - 1) / 7.0) AS BIGINT) AS p,
        |        CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2),
        |d AS (SELECT p, user_id % 2 = 0 AS t, y FROM pu),
        |per AS (SELECT p, CAST(count(*) FILTER (t) AS BIGINT) AS n_t,
        |        CAST(count(*) FILTER (NOT t) AS BIGINT) AS n_c,
        |        avg(y) FILTER (t) AS mt, avg(y) FILTER (NOT t) AS mc,
        |        var_samp(y) FILTER (t) AS vt,
        |        var_samp(y) FILTER (NOT t) AS vc
        |       FROM d GROUP BY 1),
        |b AS (SELECT * FROM per ORDER BY p LIMIT 1),
        |j AS (SELECT per.*, b.p AS bp, b.n_t AS bnt, b.n_c AS bnc,
        |       b.mt AS bmt, b.mc AS bmc, b.vt AS bvt, b.vc AS bvc
        |      FROM per, b),
        |f AS (SELECT p, n_t, n_c, mt - mc AS diff,
        |       CASE WHEN p = bp THEN 0.0
        |            ELSE (mt - mc) - (bmt - bmc) END AS effect,
        |       sqrt(vt / n_t + vc / n_c + bvt / bnt + bvc / bnc) AS se,
        |       p = bp AS isb, bmt, bmc, bnt, bnc FROM j)
        |SELECT p AS period, n_t, n_c, round(diff, 6) AS diff,
        | round(effect, 6) AS effect,
        | CASE WHEN NOT isb AND n_t >= 2 AND n_c >= 2 AND bnt >= 2
        |       AND bnc >= 2 AND se > 0 THEN round(se, 6) END AS se,
        | CASE WHEN NOT isb AND n_t >= 2 AND n_c >= 2 AND bnt >= 2
        |       AND bnc >= 2 AND se > 0
        |      THEN round((diff - (bmt - bmc)) / se, 6) END AS z
        |FROM f ORDER BY period""".stripMargin,

    "q_cvm" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |  CAST(sum(b) AS BIGINT) AS cb FROM s GROUP BY 1),
        |c AS (SELECT ca, cb,
        |  CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER w AS BIGINT) AS cumb FROM h
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |        CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |f AS (SELECT sum((ca + cb) *
        |  (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb) *
        |  (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)) AS s2
        | FROM c, tot),
        |g AS (SELECT CAST(na AS DOUBLE) * nb / ((na + nb) * (na + nb))
        |  * s2 AS t, na, nb FROM f, tot)
        |SELECT na AS n_a, nb AS n_b,
        | CASE WHEN na > 0 AND nb > 0 THEN round(coalesce(t, 0.0), 6) END
        |   AS cvm_t,
        | CASE WHEN na > 0 AND nb > 0 THEN coalesce(t, 0.0) > 0.461 END
        |   AS reject_05
        |FROM g""".stripMargin,

    "q_evt" ->
      """WITH m AS (SELECT CAST(ts AS DATE) AS b, max(value) AS mx
        |           FROM events WHERE value IS NOT NULL
        |             AND ts IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks, max(mx) AS mxx,
        |        avg(mx) AS m, stddev_samp(mx) AS sd FROM m),
        |c AS (SELECT *, sd * (sqrt(6.0) / pi()) AS sigma FROM a),
        |e AS (SELECT *, m - 0.5772156649015329 * sigma AS mu FROM c)
        |SELECT n_blocks, round(mxx, 6) AS max_observed,
        | CASE WHEN n_blocks >= 2 AND sd > 0 THEN round(mu, 6) END AS mu,
        | CASE WHEN n_blocks >= 2 AND sd > 0 THEN round(sigma, 6) END
        |   AS sigma,
        | CASE WHEN n_blocks >= 2 AND sd > 0 THEN round(mu - sigma *
        |   ln(-ln(1.0 - 1.0 / (10.0 * n_blocks))), 6) END AS ret_level_10x,
        | CASE WHEN n_blocks >= 2 AND sd > 0 THEN round(mu - sigma *
        |   ln(-ln(1.0 - 1.0 / (100.0 * n_blocks))), 6) END
        |   AS ret_level_100x
        |FROM e""".stripMargin,

    "q_yuen" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |  CAST(sum(b) AS BIGINT) AS cb FROM s GROUP BY 1),
        |c AS (SELECT v, ca, cb,
        |  CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER w AS BIGINT) AS cumb FROM h
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |        CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |k AS (SELECT na, nb, CAST(floor(0.2 * na) AS BIGINT) AS ka,
        |       CAST(floor(0.2 * nb) AS BIGINT) AS kb FROM tot),
        |agg AS (SELECT any_value(na) AS na, any_value(nb) AS nb,
        |  any_value(ka) AS ka, any_value(kb) AS kb,
        |  sum(greatest(0, least(cuma, na - ka)
        |    - greatest(cuma - ca, ka)) * v) AS tsa,
        |  sum(greatest(0, least(cumb, nb - kb)
        |    - greatest(cumb - cb, kb)) * v) AS tsb,
        |  sum(greatest(0, least(cuma, na - ka)
        |    - greatest(cuma - ca, ka)) * v * v) AS tqa,
        |  sum(greatest(0, least(cumb, nb - kb)
        |    - greatest(cumb - cb, kb)) * v * v) AS tqb,
        |  min(CASE WHEN cuma >= ka + 1 THEN v END) AS vla,
        |  min(CASE WHEN cuma >= na - ka THEN v END) AS vha,
        |  min(CASE WHEN cumb >= kb + 1 THEN v END) AS vlb,
        |  min(CASE WHEN cumb >= nb - kb THEN v END) AS vhb
        | FROM c, k),
        |f AS (SELECT na, nb, na - 2 * ka AS ha, nb - 2 * kb AS hb,
        |  CASE WHEN na - 2 * ka > 0 THEN tsa / (na - 2 * ka) END AS mta,
        |  CASE WHEN nb - 2 * kb > 0 THEN tsb / (nb - 2 * kb) END AS mtb,
        |  tsa + ka * vla + ka * vha AS wsa,
        |  tqa + ka * vla * vla + ka * vha * vha AS wqa,
        |  tsb + kb * vlb + kb * vhb AS wsb,
        |  tqb + kb * vlb * vlb + kb * vhb * vhb AS wqb
        | FROM agg),
        |g AS (SELECT *,
        |  (wqa - wsa * wsa / na) / (CAST(ha AS DOUBLE) * (ha - 1)) AS da,
        |  (wqb - wsb * wsb / nb) / (CAST(hb AS DOUBLE) * (hb - 1)) AS db
        | FROM f)
        |SELECT na AS n_a, nb AS n_b, ha AS h_a, hb AS h_b,
        | round(mta, 6) AS tmean_a, round(mtb, 6) AS tmean_b,
        | round(mta - mtb, 6) AS diff,
        | CASE WHEN ha > 1 AND hb > 1 AND da + db > 0
        |      THEN round(sqrt(da + db), 6) END AS se,
        | CASE WHEN ha > 1 AND hb > 1 AND da + db > 0
        |      THEN round((mta - mtb) / sqrt(da + db), 6) END AS z,
        | CASE WHEN ha > 1 AND hb > 1 AND da + db > 0
        |       AND na >= 20 AND nb >= 20
        |      THEN abs((mta - mtb) / sqrt(da + db)) > 1.96 END AS reject_05
        |FROM g""".stripMargin,

    "q_jarque_bera" ->
      """WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |           WHERE l_quantity IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s1,
        |        sum(v * v) AS s2, sum(v * v * v) AS s3,
        |        sum(v * v * v * v) AS s4 FROM s),
        |m AS (SELECT n,
        |        s2 / n - (s1 / n) * (s1 / n) AS m2,
        |        s3 / n - 3 * (s1 / n) * s2 / n
        |          + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |        s4 / n - 4 * (s1 / n) * s3 / n
        |          + 6 * (s1 / n) * (s1 / n) * s2 / n
        |          - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |       FROM a),
        |j AS (SELECT n,
        |        CASE WHEN n > 0 AND m2 > 0 THEN m3 / pow(m2, 1.5) END AS sk,
        |        CASE WHEN n > 0 AND m2 > 0 THEN m4 / (m2 * m2) - 3 END AS ku
        |       FROM m)
        |SELECT n, round(sk, 6) AS skewness, round(ku, 6) AS ex_kurtosis,
        | round(n / 6.0 * (sk * sk + ku * ku / 4), 6) AS jb,
        | CASE WHEN n >= 20 AND sk IS NOT NULL
        |      THEN n / 6.0 * (sk * sk + ku * ku / 4) > 5.991464547107979
        | END AS reject_05
        |FROM j""".stripMargin,

    "q_wasserstein" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |  CAST(sum(b) AS BIGINT) AS cb FROM s GROUP BY 1),
        |c AS (SELECT v,
        |  CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER w AS BIGINT) AS cumb FROM h
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |seg AS (SELECT v, cuma, cumb, lead(v) OVER (ORDER BY v) AS vn
        |        FROM c),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |        CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |w AS (SELECT sum(abs(CAST(cuma AS DOUBLE) / na -
        |        CAST(cumb AS DOUBLE) / nb) * (vn - v)) AS w1
        |      FROM seg, tot WHERE vn IS NOT NULL)
        |SELECT na AS n_a, nb AS n_b,
        | CASE WHEN na > 0 AND nb > 0 THEN round(coalesce(w1, 0.0), 6) END
        |   AS w1
        |FROM w, tot""".stripMargin,

    "q_mann_whitney" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |  CAST(sum(b) AS BIGINT) AS cb,
        |  CAST(sum(a) + sum(b) AS BIGINT) AS ct FROM s GROUP BY 1),
        |r AS (SELECT *, (sum(ct) OVER (ORDER BY v) - ct) +
        |   (ct + 1) / 2.0 AS avgr FROM h),
        |g AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb,
        |  sum(ca * avgr) AS ra,
        |  sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS ties FROM r),
        |f AS (SELECT na, nb, ra, ties,
        |  ra - CAST(na AS DOUBLE) * (na + 1) / 2 AS ua,
        |  (CAST(na AS DOUBLE) * nb / 12) * ((na + nb + 1) -
        |    ties / (CAST(na + nb AS DOUBLE) * (na + nb - 1))) AS s2
        | FROM g)
        |SELECT na AS n_a, nb AS n_b, round(ua, 6) AS u_a,
        | round(CAST(na AS DOUBLE) * nb - ua, 6) AS u_b,
        | CASE WHEN sqrt(s2) = 0 THEN NULL
        |  ELSE round((ua - CAST(na AS DOUBLE) * nb / 2) / sqrt(s2), 6) END
        |   AS z,
        | round(1 - 2 * ua / (CAST(na AS DOUBLE) * nb), 6) AS rank_biserial
        |FROM f""".stripMargin,

    "q_partial_corr" ->
      """WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |  CAST(l_extendedprice AS DOUBLE) AS y,
        |  CAST(l_discount AS DOUBLE) AS z FROM lineitem
        | WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |   AND l_discount IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |  sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
        |  sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz FROM s),
        |r AS (SELECT n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |   THEN (n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS rxy,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * szz - sz * sz > 0
        |   THEN (n * sxz - sx * sz) /
        |    sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) END AS rxz,
        |  CASE WHEN n * syy - sy * sy > 0 AND n * szz - sz * sz > 0
        |   THEN (n * syz - sy * sz) /
        |    sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) END AS ryz
        | FROM m)
        |SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
        | round(ryz, 6) AS r_yz,
        | CASE WHEN rxy IS NOT NULL AND rxz IS NOT NULL AND ryz IS NOT NULL
        |   AND (1 - rxz * rxz) * (1 - ryz * ryz) > 0
        |  THEN round((rxy - rxz * ryz) /
        |   sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) END AS r_xy_given_z
        |FROM r""".stripMargin,

    "q_cmh" ->
      """WITH base AS (SELECT lang AS g,
        |  (n_chars % 2 = 0) AS e,
        |  (doc_id % 3 = 0 OR n_chars % 5 = 0) AS y FROM documents),
        |per AS (SELECT g,
        |  CAST(sum(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |    AS d
        | FROM base GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  sum(CAST(a + b + c + d AS DOUBLE)) AS n,
        |  CAST(sum(a) AS BIGINT) AS sa,
        |  sum(CAST(a AS DOUBLE) * d / (a + b + c + d)) AS sad,
        |  sum(CAST(b AS DOUBLE) * c / (a + b + c + d)) AS sbc,
        |  sum(CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)) AS se,
        |  sum(CASE WHEN a + b + c + d > 1 THEN
        |    CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d) /
        |     (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d) *
        |      (a + b + c + d - 1))
        |   ELSE 0.0 END) AS sv
        | FROM per)
        |SELECT n_strata, CAST(n AS BIGINT) AS n,
        | CASE WHEN sbc > 0 THEN round(sad / sbc, 6) END AS or_mh,
        | CASE WHEN sv > 0 THEN round((sa - se) * (sa - se) / sv, 6) END
        |   AS chi2,
        | CASE WHEN sv > 0
        |  THEN (sa - se) * (sa - se) / sv > 3.841458820694124 END
        |   AS reject_05
        |FROM ag""".stripMargin,

    "q_breslow_day" ->
      """WITH b AS (SELECT lang AS g, n_chars % 2 = 0 AS e,
        |        doc_id % 3 = 0 OR n_chars % 5 = 0 AS y FROM documents),
        |per AS (SELECT g,
        |        CAST(count(*) FILTER (e AND y) AS BIGINT) AS a,
        |        CAST(count(*) FILTER (e AND NOT y) AS BIGINT) AS bb,
        |        CAST(count(*) FILTER (NOT e AND y) AS BIGINT) AS c,
        |        CAST(count(*) FILTER (NOT e AND NOT y) AS BIGINT) AS d
        |       FROM b GROUP BY 1),
        |ps AS (SELECT CASE WHEN
        |         sum(CAST(bb AS DOUBLE) * c / (a + bb + c + d)) > 0
        |        THEN sum(CAST(a AS DOUBLE) * d / (a + bb + c + d))
        |           / sum(CAST(bb AS DOUBLE) * c / (a + bb + c + d)) END
        |         AS psi
        |       FROM per),
        |t AS (SELECT a, CAST(a + bb + c + d AS DOUBLE) AS nn,
        |       CAST(a + bb AS DOUBLE) AS r1, CAST(a + c AS DOUBLE) AS c1,
        |       psi FROM per, ps),
        |q AS (SELECT a, nn, r1, c1, psi,
        |       CASE WHEN abs(psi - 1.0) < 1e-12 THEN r1 * c1 / nn
        |            ELSE (psi * (r1 + c1) + (nn - r1 - c1)
        |              - sqrt((psi * (r1 + c1) + (nn - r1 - c1))
        |                   * (psi * (r1 + c1) + (nn - r1 - c1))
        |                 - 4.0 * (psi - 1.0) * (psi * r1 * c1)))
        |              / (2.0 * (psi - 1.0)) END AS atil
        |      FROM t),
        |w AS (SELECT a, atil,
        |       1.0 / (1.0 / atil + 1.0 / (r1 - atil) + 1.0 / (c1 - atil)
        |         + 1.0 / (nn - r1 - c1 + atil)) AS v,
        |       psi IS NOT NULL AND atil > greatest(0.0, r1 + c1 - nn)
        |         AND atil < least(r1, c1) AS inb
        |      FROM q),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |        CAST(count(*) FILTER (inb AND v > 0) AS BIGINT) AS n_used,
        |        sum(CASE WHEN inb AND v > 0
        |             THEN (a - atil) * (a - atil) / v END) AS bd
        |       FROM w)
        |SELECT n_strata, n_used,
        | round((SELECT psi FROM ps), 6) AS or_mh,
        | CASE WHEN n_used >= 2 THEN round(coalesce(bd, 0.0), 6) END
        |   AS bd_chi2,
        | CASE WHEN n_used >= 2 THEN n_used - 1 END AS df,
        | CASE WHEN n_used >= 2 AND (SELECT psi FROM ps) IS NOT NULL
        |  THEN coalesce(bd, 0.0) >
        |    CASE WHEN n_used - 1 = 1 THEN 3.841458820694124
        |         WHEN n_used - 1 = 2 THEN 5.991464547107979
        |         WHEN n_used - 1 = 3 THEN 7.814727903251179
        |         WHEN n_used - 1 = 4 THEN 9.487729036781154
        |         ELSE (n_used - 1) * pow(1 - 2.0 / (9 * (n_used - 1)) +
        |           1.644853626951473 * sqrt(2.0 / (9 * (n_used - 1))), 3)
        |    END
        | END AS reject_05
        |FROM agg""".stripMargin,

    "q_signed_rank" ->
      """WITH s AS (SELECT CAST(n_chars % 97 AS DOUBLE) - (n_chars % 89) AS d
        | FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT abs(d) AS ad,
        |  CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |  CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM s GROUP BY 1),
        |nz AS (SELECT ad, cp, cn, cp + cn AS ct FROM h WHERE ad > 0),
        |r AS (SELECT *, (sum(ct) OVER (ORDER BY ad) - ct) +
        |   (ct + 1) / 2.0 AS avgr FROM nz),
        |a AS (SELECT CAST(sum(ct) AS BIGINT) AS n, sum(cp * avgr) AS wp,
        |  sum(cn * avgr) AS wn,
        |  sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS ties FROM r),
        |f AS (SELECT n, wp, wn,
        |  CAST(n AS DOUBLE) * (n + 1) / 4.0 AS mean,
        |  CAST(n AS DOUBLE) * (n + 1) * (2.0 * n + 1) / 24.0 - ties / 48.0
        |    AS s2 FROM a)
        |SELECT coalesce(n, 0) AS n,
        | coalesce((SELECT CAST(sum(cnt) AS BIGINT) FROM h WHERE ad = 0),
        |   0) AS n_zero,
        | round(wp, 6) AS w_plus, round(wn, 6) AS w_minus,
        | CASE WHEN n IS NULL OR s2 <= 0 THEN NULL
        |  ELSE round((wp - mean) / sqrt(s2), 6) END AS z,
        | CASE WHEN n IS NULL OR s2 <= 0 OR n < 20 THEN NULL
        |  ELSE abs((wp - mean) / sqrt(s2)) > 1.959963984540054 END
        |   AS reject_05
        |FROM f""".stripMargin,

    "q_anova" ->
      """WITH per AS (SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(l_quantity AS DOUBLE)) AS s,
        |        sum(CAST(l_quantity AS DOUBLE) * l_quantity) AS ss
        |       FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |       sum(s) AS ts, sum(ss) AS tss, sum(s * s / n) AS sb FROM per)
        |SELECT k, n,
        | round(((sb - ts * ts / n) / (k - 1)) / ((tss - sb) / (n - k)), 6) AS f,
        | CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
        | round((sb - ts * ts / n) / (tss - ts * ts / n), 6) AS eta_sq,
        | CASE WHEN (n - k) < 20 * (k - 1) THEN NULL
        |  ELSE ((sb - ts * ts / n) / (k - 1)) / ((tss - sb) / (n - k))
        |    * (k - 1) >
        |   CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |    WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |    ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |     1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))), 3)
        |   END END AS reject_05
        |FROM t""".stripMargin,

    "q_jonckheere" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |  l_returnflag AS g FROM lineitem
        | WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'N', 'R')),
        |h AS (SELECT v,
        |  CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |  CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        | FROM base GROUP BY 1),
        |cum AS (SELECT *,
        |  CAST(sum(c0) OVER w AS BIGINT) AS m0,
        |  CAST(sum(c1) OVER w AS BIGINT) AS m1,
        |  CAST(sum(c2) OVER w AS BIGINT) AS m2 FROM h
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT
        |  CAST(sum(c1 * ((m0 - c0) * 2 + c0) +
        |   c2 * ((m0 - c0) * 2 + c0 + (m1 - c1) * 2 + c1)) AS BIGINT)
        |    AS jt2,
        |  CAST(sum((c0 + c1 + c2) * (c0 + c1 + c2 - 1) *
        |   (2 * (c0 + c1 + c2) + 5)) AS BIGINT) AS tt5,
        |  CAST(sum((c0 + c1 + c2) * (c0 + c1 + c2 - 1) *
        |   (c0 + c1 + c2 - 2)) AS BIGINT) AS tt2,
        |  CAST(sum((c0 + c1 + c2) * (c0 + c1 + c2 - 1)) AS BIGINT) AS tt1,
        |  CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |  CAST(sum(c2) AS BIGINT) AS n2
        | FROM cum),
        |f AS (SELECT jt2, n0 + n1 + n2 AS n,
        |  n0 * n0 + n1 * n1 + n2 * n2 AS sn2,
        |  CAST(n0 + n1 + n2 AS DOUBLE) AS nd,
        |  n0 * (n0 - 1) * (2 * n0 + 5) + n1 * (n1 - 1) * (2 * n1 + 5) +
        |   n2 * (n2 - 1) * (2 * n2 + 5) AS gn5,
        |  n0 * (n0 - 1) * (n0 - 2) + n1 * (n1 - 1) * (n1 - 2) +
        |   n2 * (n2 - 1) * (n2 - 2) AS gn2,
        |  n0 * (n0 - 1) + n1 * (n1 - 1) + n2 * (n2 - 1) AS gn1,
        |  tt5, tt2, tt1 FROM a),
        |g AS (SELECT jt2, n, nd,
        |  (nd * nd - sn2) / 2.0 AS mean2,
        |  (nd * (nd - 1) * (2.0 * nd + 5) - gn5 - tt5) / 72.0 +
        |   CASE WHEN nd > 2 THEN CAST(gn2 AS DOUBLE) * tt2 /
        |    (36.0 * nd * (nd - 1) * (nd - 2)) ELSE 0.0 END +
        |   CASE WHEN nd > 1 THEN CAST(gn1 AS DOUBLE) * tt1 /
        |    (8.0 * nd * (nd - 1)) ELSE 0.0 END AS vr
        | FROM f)
        |SELECT 3 AS k, n, round(jt2 / 2.0, 6) AS jt,
        | CASE WHEN vr > 0 THEN round((jt2 - mean2) / (2.0 * sqrt(vr)), 6)
        |  END AS z,
        | CASE WHEN vr > 0
        |  THEN abs((jt2 - mean2) / (2.0 * sqrt(vr))) > 1.959963984540054
        |  END AS reject_05
        |FROM g""".stripMargin,

    "q_kruskal" ->
      """WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |        l_returnflag AS g, CAST(count(*) AS BIGINT) AS c
        |       FROM lineitem GROUP BY 1, 2),
        |hv AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |rk AS (SELECT v, ct, CAST(sum(ct) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS cum FROM hv),
        |r AS (SELECT v, ct,
        |       (cum - ct) + (ct + 1) / CAST(2 AS DOUBLE) AS avgr FROM rk),
        |pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, sum(c * avgr) AS rg
        |       FROM cells JOIN r USING (v) GROUP BY 1),
        |tie AS (SELECT sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS tie FROM r),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(ng) AS BIGINT) AS n, sum(rg * rg / ng) AS r2 FROM pg),
        |v AS (SELECT k, n,
        |       (CAST(12 AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1)) * r2
        |          - 3 * (CAST(n AS DOUBLE) + 1))
        |        / (1 - (SELECT tie FROM tie)
        |          / (CAST(n AS DOUBLE) * n * n - n)) AS h,
        |       CAST(k - 1 AS BIGINT) AS df,
        |       CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |        WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |        WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |        WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |        ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |         1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))),
        |         3) END AS crit
        |      FROM tt)
        |SELECT k, n, round(h, 6) AS h, df, round(crit, 6) AS crit_05,
        | h > crit AS reject_05
        |FROM v""".stripMargin,

    "q_dunn" ->
      """WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |        l_returnflag AS g, CAST(count(*) AS BIGINT) AS c
        |       FROM lineitem GROUP BY 1, 2),
        |hv AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |rk AS (SELECT v, ct, CAST(sum(ct) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS cum FROM hv),
        |r AS (SELECT v, ct,
        |       (cum - ct) + (ct + 1) / CAST(2 AS DOUBLE) AS avgr FROM rk),
        |pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, sum(c * avgr) AS rg
        |       FROM cells JOIN r USING (v) GROUP BY 1),
        |tie AS (SELECT sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS tie FROM r),
        |tt AS (SELECT CAST(sum(ng) AS BIGINT) AS nn FROM pg),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b, a.ng AS n_a, b.ng AS n_b,
        |        a.rg / a.ng AS ra, b.rg / b.ng AS rb,
        |        (CAST(nn AS DOUBLE) * (nn + 1) / 12.0 -
        |          (SELECT tie FROM tie) / (12.0 * (CAST(nn AS DOUBLE) - 1)))
        |          * (1.0 / a.ng + 1.0 / b.ng) AS s2
        |       FROM pg a JOIN pg b ON a.g < b.g, tt),
        |zz AS (SELECT g_a, g_b, n_a, n_b,
        |        round(ra, 6) AS mean_rank_a, round(rb, 6) AS mean_rank_b,
        |        round((ra - rb) / sqrt(s2), 6) AS z
        |       FROM pr WHERE s2 > 0),
        |pp AS (SELECT *, round(2 * (1 - (1 -
        |   (exp(-0.5 * z * z) / 2.5066282746310002) *
        |   ((1 / (1 + 0.2316419 * abs(z))) * (0.319381530 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (-0.356563782 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (1.781477937 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (-1.821255978 +
        |    (1 / (1 + 0.2316419 * abs(z))) * 1.330274429))))))), 6) AS p
        |  FROM zz),
        |r1 AS (SELECT *, row_number() OVER
        |        (ORDER BY p, g_a || '|' || g_b) AS rk2 FROM pp),
        |adj AS (SELECT g_a, g_b, n_a, n_b, mean_rank_a, mean_rank_b, z, p,
        |        round(least(1.0, min(p * (SELECT CAST(count(*) AS DOUBLE)
        |            FROM pp) / rk2)
        |          OVER (ORDER BY p DESC, g_a || '|' || g_b DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |          AS p_adj
        |       FROM r1)
        |SELECT *, p_adj <= 0.05 AS reject_05 FROM adj
        |ORDER BY g_a, g_b""".stripMargin,

    "q_levene" ->
      """WITH b AS (SELECT l_linestatus AS g,
        |        CAST(l_quantity AS DOUBLE) AS v FROM lineitem),
        |m AS (SELECT g, quantile_cont(v, 0.5) AS med FROM b GROUP BY 1),
        |z AS (SELECT b.g, abs(b.v - m.med) AS v FROM b JOIN m USING (g)),
        |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        sum(v) AS s, sum(v * v) AS ss FROM z GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |       sum(s) AS ts, sum(ss) AS tss, sum(s * s / n) AS sb FROM per)
        |SELECT k, n,
        | round(((sb - ts * ts / n) / (k - 1)) / ((tss - sb) / (n - k)), 6) AS f,
        | CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
        | round((sb - ts * ts / n) / (tss - ts * ts / n), 6) AS eta_sq,
        | CASE WHEN (n - k) < 20 * (k - 1) THEN NULL
        |  ELSE ((sb - ts * ts / n) / (k - 1)) / ((tss - sb) / (n - k))
        |    * (k - 1) >
        |   CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |    WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |    ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |     1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))), 3)
        |   END END AS reject_05
        |FROM t""".stripMargin,

    // same three raters, same pairwise-agreement and marginal algebra
    "q_fleiss" ->
      """WITH r AS (
        | SELECT doc_id AS item, CASE WHEN n_chars + (doc_id * 11) % 41
        |   >= 300 THEN 'long' ELSE 'short' END AS label FROM documents
        | UNION ALL SELECT doc_id, CASE WHEN n_chars + (doc_id * 23) % 41
        |   >= 300 THEN 'long' ELSE 'short' END FROM documents
        | UNION ALL SELECT doc_id, CASE WHEN n_chars + (doc_id * 37) % 41
        |   >= 300 THEN 'long' ELSE 'short' END FROM documents),
        |cell AS (SELECT item, label, CAST(count(*) AS BIGINT) AS nij
        | FROM r GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(nij) AS BIGINT) AS ni,
        |  CAST(sum(nij * (nij - 1)) AS BIGINT) AS pairs
        | FROM cell GROUP BY 1 HAVING sum(nij) >= 2),
        |pb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  avg(CAST(pairs AS DOUBLE) / (CAST(ni AS DOUBLE) * (ni - 1)))
        |    AS pbar FROM pi),
        |mg AS (SELECT sum(CAST(cj AS DOUBLE) * cj) AS sq,
        |  CAST(sum(cj) AS BIGINT) AS tot FROM (
        |   SELECT c.label, CAST(sum(c.nij) AS BIGINT) AS cj
        |   FROM cell c JOIN pi ON c.item = pi.item GROUP BY 1))
        |SELECT pb.n_items, mg.tot AS n_ratings,
        | round(pb.pbar, 6) AS p_bar,
        | round(mg.sq / (CAST(mg.tot AS DOUBLE) * mg.tot), 6) AS p_e,
        | CASE WHEN mg.sq / (CAST(mg.tot AS DOUBLE) * mg.tot) = 1 THEN NULL
        |  ELSE round((pb.pbar - mg.sq / (CAST(mg.tot AS DOUBLE) * mg.tot))
        |    / (1 - mg.sq / (CAST(mg.tot AS DOUBLE) * mg.tot)), 6) END
        |   AS kappa
        |FROM pb, mg""".stripMargin,

    // same three raters with the planted skips; the coincidence-matrix
    // identities restated: Do = sum_u (mu^2 - sum_c n_uc^2)/(mu-1),
    // n_c = sum_u n_uc over pairable items, De = n^2 - sum n_c^2
    "q_krippendorff" ->
      """WITH r AS (
        | SELECT doc_id AS item, CASE WHEN n_chars + (doc_id * 11) % 41
        |   >= 300 THEN 'long' ELSE 'short' END AS label FROM documents
        | UNION ALL SELECT doc_id, CASE WHEN n_chars + (doc_id * 23) % 41
        |   >= 300 THEN 'long' ELSE 'short' END FROM documents
        |   WHERE doc_id % 4 <> 0
        | UNION ALL SELECT doc_id, CASE WHEN n_chars + (doc_id * 37) % 41
        |   >= 300 THEN 'long' ELSE 'short' END FROM documents
        |   WHERE doc_id % 5 <> 1),
        |cell AS (SELECT item, label, CAST(count(*) AS BIGINT) AS nuc
        | FROM r GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(nuc) AS BIGINT) AS mu,
        |  CAST(sum(nuc * nuc) AS BIGINT) AS sq
        | FROM cell GROUP BY 1 HAVING sum(nuc) >= 2),
        |dn AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  coalesce(sum((CAST(mu AS DOUBLE) * mu - sq)
        |    / CAST(mu - 1 AS DOUBLE)), 0) AS do_ FROM pi),
        |ma AS (SELECT CAST(count(*) AS BIGINT) AS n_labels,
        |  CAST(sum(nc) AS BIGINT) AS n,
        |  sum(CAST(nc AS DOUBLE) * nc) AS nc2 FROM (
        |   SELECT c.label, CAST(sum(c.nuc) AS BIGINT) AS nc
        |   FROM cell c JOIN pi ON c.item = pi.item GROUP BY 1))
        |SELECT dn.n_items, coalesce(ma.n, 0) AS n_ratings, ma.n_labels,
        | CASE WHEN dn.n_items = 0
        |   OR (CAST(ma.n AS DOUBLE) * ma.n - ma.nc2) <= 0 THEN NULL
        |  ELSE round(1 - CAST(ma.n - 1 AS DOUBLE) * dn.do_
        |    / (CAST(ma.n AS DOUBLE) * ma.n - ma.nc2), 6) END AS alpha
        |FROM dn, ma""".stripMargin,

    "q_page" ->
      """WITH r AS (
        | SELECT doc_id AS b, 's11' AS t,
        |  CAST((n_chars + doc_id * 11) % 41 AS DOUBLE) AS v FROM documents
        | UNION ALL SELECT doc_id, 's23',
        |  CAST((n_chars + doc_id * 23) % 41 AS DOUBLE) FROM documents
        |  WHERE doc_id % 4 <> 0
        | UNION ALL SELECT doc_id, 's37',
        |  CAST((n_chars + doc_id * 37) % 41 AS DOUBLE) FROM documents),
        |sz AS (SELECT b, count(*) AS c, count(DISTINCT t) AS dc
        |       FROM r GROUP BY 1),
        |keep AS (SELECT b FROM sz WHERE c = 3 AND dc = 3),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM sz
        |        WHERE c <> 3 OR dc <> 3),
        |kk AS (SELECT r.* FROM r JOIN keep USING (b)),
        |rk AS (SELECT b, t, rank() OVER (PARTITION BY b ORDER BY v)
        |   + (count(*) OVER (PARTITION BY b, v) - 1) / 2.0 AS rr FROM kk),
        |ag AS (SELECT CAST(count(*) / 3 AS BIGINT) AS nb,
        |  coalesce(sum(rr * (CASE t WHEN 's11' THEN 1.0
        |    WHEN 's23' THEN 2.0 ELSE 3.0 END)), 0.0) AS l FROM rk),
        |f AS (SELECT nb, l, CAST(nb AS DOUBLE) * 12.0 AS el,
        |       CAST(nb AS DOUBLE) * 2.0 AS vl FROM ag)
        |SELECT 3 AS k, nb AS n_blocks,
        | (SELECT nd FROM drp) AS n_blocks_dropped,
        | CASE WHEN nb > 0 THEN round(l, 6) END AS l_stat,
        | CASE WHEN nb > 0 THEN round(el, 6) END AS e_l,
        | CASE WHEN nb > 0 THEN round((l - el) / sqrt(vl), 6) END AS z,
        | CASE WHEN nb >= 12
        |      THEN (l - el) / sqrt(vl) > 1.6448536269514722 END
        |   AS reject_05
        |FROM f""".stripMargin,

    "q_kripp_ordinal" ->
      """WITH r AS (
        | SELECT doc_id AS item, floor(CAST((n_chars + doc_id * 11) % 41
        |   AS DOUBLE) / 10) AS lvl FROM documents
        | UNION ALL SELECT doc_id, floor(CAST((n_chars + doc_id * 23) % 41
        |   AS DOUBLE) / 10) FROM documents WHERE doc_id % 4 <> 0
        | UNION ALL SELECT doc_id, floor(CAST((n_chars + doc_id * 37) % 41
        |   AS DOUBLE) / 10) FROM documents WHERE doc_id % 5 <> 1),
        |cell AS (SELECT item, lvl, CAST(count(*) AS BIGINT) AS nuc
        | FROM r GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(nuc) AS BIGINT) AS mu
        | FROM cell GROUP BY 1 HAVING sum(nuc) >= 2),
        |kept AS (SELECT c.item, c.lvl, c.nuc, pi.mu
        | FROM cell c JOIN pi ON c.item = pi.item),
        |marg AS (SELECT lvl, CAST(sum(nuc) AS BIGINT) AS nc
        | FROM kept GROUP BY 1),
        |mc AS (SELECT lvl, nc, CAST(sum(nc) OVER (ORDER BY lvl
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum FROM marg),
        |pr AS (SELECT a.lvl AS lc, b.lvl AS lk, a.nc AS ncc, b.nc AS nck,
        |  (CAST(b.cum - a.cum AS DOUBLE) + (a.nc - b.nc) / 2.0)
        |  * (CAST(b.cum - a.cum AS DOUBLE) + (a.nc - b.nc) / 2.0) AS d2
        | FROM mc a JOIN mc b ON a.lvl < b.lvl),
        |de AS (SELECT coalesce(sum(2.0 * ncc * nck * d2), 0.0) AS de
        | FROM pr),
        |dn AS (SELECT coalesce(sum(2.0 * ka.nuc * kb.nuc * pr.d2
        |   / CAST(ka.mu - 1 AS DOUBLE)), 0.0) AS do_
        | FROM kept ka JOIN kept kb ON ka.item = kb.item
        |   AND ka.lvl < kb.lvl
        | JOIN pr ON pr.lc = ka.lvl AND pr.lk = kb.lvl),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(coalesce(sum(mu), 0) AS BIGINT) AS n_ratings FROM pi),
        |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_levels FROM marg)
        |SELECT ct.n_items, ct.n_ratings, nl.n_levels,
        | CASE WHEN ct.n_items = 0 OR de.de <= 0 THEN NULL
        |  ELSE round(1 - (CAST(ct.n_ratings AS DOUBLE) - 1) * dn.do_
        |    / de.de, 6) END AS alpha
        |FROM ct, nl, dn, de""".stripMargin,

    // same confusion rollup, same raw-distance quadratic weights
    "q_wkappa" ->
      """WITH a AS (SELECT doc_id, CAST(n_chars % 5 AS DOUBLE) AS va
        | FROM documents),
        |b AS (SELECT doc_id,
        |  CAST((n_chars + doc_id % 3) % 5 AS DOUBLE) AS vb FROM documents),
        |cm AS (SELECT va, vb, CAST(count(*) AS BIGINT) AS n
        | FROM a JOIN b USING (doc_id) GROUP BY 1, 2),
        |o AS (SELECT CAST(sum(n) AS BIGINT) AS n_items,
        |  coalesce(sum(CAST(n AS DOUBLE) * (va - vb) * (va - vb)), 0)
        |    AS wo FROM cm),
        |ma AS (SELECT va AS v, CAST(sum(n) AS BIGINT) AS na FROM cm
        | GROUP BY 1),
        |mb AS (SELECT vb AS v2, CAST(sum(n) AS BIGINT) AS nb FROM cm
        | GROUP BY 1),
        |e AS (SELECT coalesce(sum(CAST(na AS DOUBLE) * nb
        |  * (v - v2) * (v - v2)), 0) AS wes FROM ma CROSS JOIN mb)
        |SELECT n_items, round(wo / n_items, 6) AS wo,
        | round(wes / (CAST(n_items AS DOUBLE) * n_items), 6) AS we,
        | CASE WHEN wes = 0 THEN NULL
        |  ELSE round(1 - wo * n_items / wes, 6) END AS kappa_w
        |FROM o, e""".stripMargin,

    // same distinct-cell pair counting, same tie-pair masses
    "q_kendall" ->
      """WITH s AS (SELECT
        |  floor(CAST(n_chars % 97 AS DOUBLE) / 10) AS x,
        |  floor(CAST(n_chars % 89 AS DOUBLE) / 10) AS y FROM documents),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM s
        | GROUP BY 1, 2),
        |p AS (SELECT
        |  coalesce(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |    OR (a.x > b.x AND a.y > b.y)
        |   THEN CAST(a.n AS DOUBLE) * b.n END), 0) AS nc,
        |  coalesce(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |    OR (a.x > b.x AND a.y < b.y)
        |   THEN CAST(a.n AS DOUBLE) * b.n END), 0) AS nd
        | FROM cells a JOIN cells b
        |  ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
        |t1 AS (SELECT coalesce(sum(CAST(t AS DOUBLE) * (t - 1) / 2), 0)
        |  AS n1 FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells
        |   GROUP BY x)),
        |t2 AS (SELECT coalesce(sum(CAST(t AS DOUBLE) * (t - 1) / 2), 0)
        |  AS n2 FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells
        |   GROUP BY y))
        |SELECT t.n, CAST(p.nc AS BIGINT) AS n_c, CAST(p.nd AS BIGINT) AS n_d,
        | CASE WHEN (CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - n1) <= 0
        |   OR (CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - n2) <= 0 THEN NULL
        |  ELSE round((p.nc - p.nd) /
        |   sqrt((CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - n1)
        |      * (CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - n2)), 6) END AS tau_b
        |FROM t, p, t1, t2""".stripMargin,

    // same raters as numeric scores, the moment identities restated:
    // Do = sum_u (mu*ss_u - s_u^2)/(mu-1), De = n*ss - s^2
    "q_kripp_interval" ->
      """WITH r AS (
        | SELECT doc_id AS item,
        |   CAST((n_chars + doc_id * 11) % 41 AS DOUBLE) AS v FROM documents
        | UNION ALL SELECT doc_id,
        |   CAST((n_chars + doc_id * 23) % 41 AS DOUBLE) FROM documents
        |   WHERE doc_id % 4 <> 0
        | UNION ALL SELECT doc_id,
        |   CAST((n_chars + doc_id * 37) % 41 AS DOUBLE) FROM documents
        |   WHERE doc_id % 5 <> 1),
        |pi AS (SELECT item, CAST(count(*) AS BIGINT) AS mu,
        |  sum(v) AS s, sum(v * v) AS ss
        | FROM r GROUP BY 1 HAVING count(*) >= 2),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(coalesce(sum(mu), 0) AS BIGINT) AS n,
        |  coalesce(sum((mu * ss - s * s) / CAST(mu - 1 AS DOUBLE)), 0)
        |    AS do_,
        |  coalesce(sum(s), 0) AS ts, coalesce(sum(ss), 0) AS tss FROM pi)
        |SELECT n_items, n AS n_ratings,
        | CASE WHEN n_items = 0 OR (n * tss - ts * ts) <= 0 THEN NULL
        |  ELSE round(1 - CAST(n - 1 AS DOUBLE) * do_ / (n * tss - ts * ts),
        |    6) END AS alpha
        |FROM ag""".stripMargin,

    // k=3 classifiers; Q restated via sum C_j^2 - N^2/k over kept items
    "q_cronbach" ->
      """WITH base AS (
        | SELECT doc_id AS s, 'a' AS i, CAST(n_chars % 97 AS DOUBLE) AS v
        |  FROM documents
        | UNION ALL
        | SELECT doc_id, 'b', CAST((n_chars % 97) + (n_chars % 13) AS DOUBLE)
        |  FROM documents
        | UNION ALL
        | SELECT doc_id, 'c', CAST((n_chars % 97) + (doc_id % 7) AS DOUBLE)
        |  FROM documents WHERE doc_id % 11 <> 0),
        |cells AS (SELECT s, i, avg(v) AS v FROM base GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS k FROM cells),
        |per AS (SELECT s, CAST(count(*) AS BIGINT) AS c, sum(v) AS t
        |        FROM cells GROUP BY 1),
        |comp AS (SELECT per.s, per.t FROM per, kk WHERE per.c = kk.k),
        |subj AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(t) AS st,
        |         sum(t * t) AS stt FROM comp),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM per),
        |im AS (SELECT i, CAST(count(*) AS BIGINT) AS inn, sum(v) AS isum,
        |        sum(v * v) AS iss
        |       FROM cells JOIN comp USING (s) GROUP BY 1),
        |iv AS (SELECT coalesce(sum((iss - isum * isum / inn) / (inn - 1)),
        |        0.0) AS sv FROM im WHERE inn >= 2)
        |SELECT kk.k AS k, n AS n_subjects, ntot - n AS n_dropped,
        | CASE WHEN n >= 2 THEN round(sv, 6) END AS sum_item_var,
        | CASE WHEN n >= 2 THEN round((stt - st * st / n) / (n - 1), 6) END
        |   AS total_var,
        | CASE WHEN kk.k >= 2 AND n >= 2
        |    AND (stt - st * st / n) / (n - 1) > 0
        |  THEN round(CAST(kk.k AS DOUBLE) / (kk.k - 1) *
        |   (1 - sv / ((stt - st * st / n) / (n - 1))), 6) END AS alpha
        |FROM subj, tot, kk, iv""".stripMargin,

    "q_cochran" ->
      """WITH d AS (SELECT doc_id,
        |  (doc_id % 3 = 0 OR n_chars % 5 = 0) AS y,
        |  (CAST(n_chars % 97 AS DOUBLE) / 96 > 0.5) AS pa,
        |  (CAST(n_chars % 89 AS DOUBLE) / 88 > 0.5) AS pb,
        |  (doc_id % 2 = 0) AS pc FROM documents),
        |r AS (SELECT doc_id AS item, 'a' AS clf, CAST(pa = y AS INT) AS s
        |  FROM d
        | UNION ALL SELECT doc_id, 'b', CAST(pb = y AS INT) FROM d
        | UNION ALL SELECT doc_id, 'c', CAST(pc = y AS INT) FROM d
        |  WHERE doc_id % 7 <> 0),
        |kk AS (SELECT CAST(count(DISTINCT clf) AS BIGINT) AS kg FROM r),
        |pi AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(count(DISTINCT clf) AS BIGINT) AS dcnt,
        |  CAST(sum(s) AS BIGINT) AS ri FROM r GROUP BY 1),
        |kept AS (SELECT pi.item, pi.ri FROM pi, kk
        | WHERE pi.cnt = kk.kg AND pi.dcnt = kk.kg),
        |rw AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(coalesce(sum(ri), 0) AS BIGINT) AS nn,
        |  CAST(coalesce(sum(ri * ri), 0) AS BIGINT) AS r2 FROM kept),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM pi, kk
        | WHERE pi.cnt <> kk.kg OR pi.dcnt <> kk.kg),
        |cj AS (SELECT r.clf, CAST(sum(r.s) AS BIGINT) AS cj FROM r
        | JOIN kept ON r.item = kept.item GROUP BY 1),
        |cs AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  coalesce(sum(CAST(cj AS DOUBLE) * cj), 0) AS cj2 FROM cj)
        |SELECT k, n_items, nd AS n_items_dropped,
        | CASE WHEN k < 2 OR (k * CAST(nn AS DOUBLE) - r2) <= 0 THEN NULL
        |  ELSE round(k * (k - 1) * (cj2 - CAST(nn AS DOUBLE) * nn / k)
        |    / (k * CAST(nn AS DOUBLE) - r2), 6) END AS q_stat,
        | CASE WHEN k < 2 THEN NULL ELSE round(
        |   CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |    WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |    ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |     1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))), 3)
        |   END, 6) END AS crit_05,
        | CASE WHEN k < 2 OR (k * CAST(nn AS DOUBLE) - r2) <= 0 THEN NULL
        |  ELSE k * (k - 1) * (cj2 - CAST(nn AS DOUBLE) * nn / k)
        |    / (k * CAST(nn AS DOUBLE) - r2) >
        |   CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |    WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |    ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |     1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))), 3)
        |   END END AS reject_05
        |FROM cs, rw, drp""".stripMargin,

    // same within-block tie-averaged ranks (rank() + (ct-1)/2), same
    // tie mass sum(ct^2-1), same closed-form deviation rb2 - k*m^2
    "q_friedman" ->
      """WITH r AS (SELECT doc_id AS item, 'a' AS trt,
        |  CAST(n_chars % 97 AS DOUBLE) AS v FROM documents
        | UNION ALL SELECT doc_id, 'b', CAST(n_chars % 89 AS DOUBLE)
        |  FROM documents
        | UNION ALL SELECT doc_id, 'c',
        |  CAST((n_chars + doc_id) % 101 AS DOUBLE) FROM documents
        |  WHERE doc_id % 11 <> 0),
        |kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS kg FROM r),
        |sz AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(count(DISTINCT trt) AS BIGINT) AS dcnt FROM r
        | GROUP BY 1),
        |kept AS (SELECT sz.item FROM sz, kk
        | WHERE sz.cnt = kk.kg AND sz.dcnt = kk.kg),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM sz, kk
        | WHERE sz.cnt <> kk.kg OR sz.dcnt <> kk.kg),
        |rk AS (SELECT r.item, r.trt,
        |  rank() OVER (PARTITION BY r.item ORDER BY r.v)
        |    + (count(*) OVER (PARTITION BY r.item, r.v) - 1)
        |      / CAST(2 AS DOUBLE) AS rr,
        |  count(*) OVER (PARTITION BY r.item, r.v) AS ct
        | FROM r JOIN kept ON r.item = kept.item),
        |pt AS (SELECT trt, avg(rr) AS rbar, CAST(count(*) AS BIGINT) AS nb
        | FROM rk GROUP BY 1),
        |tie AS (SELECT coalesce(sum(CAST(ct AS DOUBLE) * ct - 1), 0)
        |  AS tie FROM rk),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(coalesce(max(nb), 0) AS BIGINT) AS n_blocks,
        |  coalesce(sum(rbar * rbar), 0) AS rb2 FROM pt),
        |v AS (SELECT k, n_blocks, nd,
        |  CAST(12 AS DOUBLE) * n_blocks / (k * (CAST(k AS DOUBLE) + 1))
        |    * (rb2 - k * ((CAST(k AS DOUBLE) + 1) / 2)
        |       * ((CAST(k AS DOUBLE) + 1) / 2)) AS raw,
        |  1 - tie / (CAST(n_blocks AS DOUBLE) * k * (CAST(k AS DOUBLE) * k
        |    - 1)) AS c,
        |  CASE k - 1 WHEN 1 THEN CAST(3.841458820694124 AS DOUBLE)
        |   WHEN 2 THEN CAST(5.991464547107979 AS DOUBLE)
        |   WHEN 3 THEN CAST(7.814727903251179 AS DOUBLE)
        |   WHEN 4 THEN CAST(9.487729036781154 AS DOUBLE)
        |   ELSE (k - 1) * pow(1 - CAST(2 AS DOUBLE) / (9 * (k - 1)) +
        |    1.644853626951473 * sqrt(CAST(2 AS DOUBLE) / (9 * (k - 1))), 3)
        |  END AS crit
        | FROM ag, tie, drp)
        |SELECT k, n_blocks, nd AS n_blocks_dropped,
        | CASE WHEN k < 2 OR n_blocks = 0 OR c <= 0 THEN NULL
        |  ELSE round(raw / c, 6) END AS chi2_f,
        | CASE WHEN k < 2 THEN NULL ELSE round(crit, 6) END AS crit_05,
        | CASE WHEN k < 2 OR n_blocks = 0 OR c <= 0 THEN NULL
        |  ELSE raw / c > crit END AS reject_05
        |FROM v""".stripMargin,

    // same raters, same confusion-rollup marginal algebra
    "q_kappa" ->
      """WITH a AS (SELECT doc_id,
        |  CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS la
        | FROM documents),
        |b AS (SELECT doc_id,
        |  CASE WHEN n_chars + doc_id % 50 >= 300 THEN 'long'
        |       ELSE 'short' END AS lb FROM documents),
        |j AS (SELECT la, lb FROM a JOIN b USING (doc_id)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE la = lb) AS BIGINT) AS agree FROM j),
        |ma AS (SELECT la AS l, CAST(count(*) AS BIGINT) AS na
        | FROM j GROUP BY 1),
        |mb AS (SELECT lb AS l, CAST(count(*) AS BIGINT) AS nb
        | FROM j GROUP BY 1),
        |pes AS (SELECT sum(CAST(coalesce(na, 0) AS DOUBLE) *
        |   coalesce(nb, 0)) AS s
        | FROM ma FULL OUTER JOIN mb USING (l))
        |SELECT t.n AS n_items,
        | round(CAST(t.agree AS DOUBLE) / t.n, 6) AS po,
        | round(p.s / (CAST(t.n AS DOUBLE) * t.n), 6) AS pe,
        | CASE WHEN p.s / (CAST(t.n AS DOUBLE) * t.n) = 1 THEN NULL
        |  ELSE round((CAST(t.agree AS DOUBLE) / t.n -
        |    p.s / (CAST(t.n AS DOUBLE) * t.n)) /
        |    (1 - p.s / (CAST(t.n AS DOUBLE) * t.n)), 6) END AS kappa
        |FROM tot t, pes p""".stripMargin,

    // same run/qrels construction, same gain/discount arithmetic
    "q_retrieval_eval" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |s AS (
        | SELECT 1 AS query_id, doc_id,
        |   len(list_filter(ws, w -> w = 'spark')) AS cnt FROM d
        | UNION ALL SELECT 2, doc_id,
        |   len(list_filter(ws, w -> w = 'join')) FROM d
        | UNION ALL SELECT 3, doc_id,
        |   len(list_filter(ws, w -> w = 'window')) FROM d),
        |sc AS (SELECT * FROM s WHERE cnt >= 1),
        |run AS (SELECT query_id, doc_id, row_number() OVER
        |   (PARTITION BY query_id ORDER BY cnt DESC, doc_id) AS rank
        |  FROM sc QUALIFY rank <= 10),
        |qr AS (SELECT query_id, doc_id,
        |  CAST(CASE WHEN cnt >= 3 THEN 2.0 ELSE 1.0 END AS DOUBLE) AS rel
        | FROM sc),
        |hits AS (SELECT r.query_id, min(r.rank) AS first,
        |  CAST(count(*) AS BIGINT) AS h,
        |  sum((power(2, q.rel) - 1) / (ln(r.rank + 1) / ln(2))) AS dcg
        | FROM run r JOIN qr q
        |   ON r.query_id = q.query_id AND r.doc_id = q.doc_id
        | GROUP BY 1),
        |ideal AS (SELECT query_id,
        |  sum((power(2, rel) - 1) / (ln(i + 1) / ln(2))) AS idcg
        | FROM (SELECT query_id, rel, row_number() OVER
        |    (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS i
        |   FROM qr) WHERE i <= 10 GROUP BY 1),
        |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        | FROM qr GROUP BY 1)
        |SELECT n.query_id, n.n_rel,
        | round(coalesce(CAST(1 AS DOUBLE) / h.first, 0), 6)
        |   AS reciprocal_rank,
        | round(coalesce(h.dcg / i.idcg, 0), 6) AS ndcg_at_10,
        | round(coalesce(h.h, 0) / CAST(10 AS DOUBLE), 6) AS precision_at_10,
        | round(coalesce(h.h, 0) / CAST(n.n_rel AS DOUBLE), 6) AS recall_at_10
        |FROM nrel n JOIN ideal i ON n.query_id = i.query_id
        |LEFT JOIN hits h ON n.query_id = h.query_id
        |ORDER BY n.query_id""".stripMargin,

    // mirrors zScreenPerGroup + bhAdjust literal for literal: A-S
    // 26.2.17 polynomial, rounded p, step-up running min over the
    // 20-row test table
    "q_fdr_screen" ->
      """WITH g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
        |  avg(n_chars) AS m FROM documents GROUP BY 1),
        |a AS (SELECT avg(n_chars) AS ma, stddev_pop(n_chars) AS sd
        | FROM documents),
        |z AS (SELECT grp, n, round((m - a.ma) / (a.sd / sqrt(n)), 6) AS z
        | FROM g, a),
        |p AS (SELECT grp, n, z, round(2 * (1 - (1 -
        |   (exp(-0.5 * z * z) / 2.5066282746310002) *
        |   ((1 / (1 + 0.2316419 * abs(z))) * (0.319381530 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (-0.356563782 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (1.781477937 +
        |    (1 / (1 + 0.2316419 * abs(z))) * (-1.821255978 +
        |    (1 / (1 + 0.2316419 * abs(z))) * 1.330274429))))))), 6) AS p
        | FROM z),
        |r1 AS (SELECT grp, n, z, p,
        |  row_number() OVER (ORDER BY p, grp) AS rk FROM p),
        |adj AS (SELECT grp, n, z, p,
        |  round(least(1.0, min(p * (SELECT CAST(count(*) AS DOUBLE) FROM g) /
        |    rk) OVER (ORDER BY p DESC, grp DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_adj
        | FROM r1)
        |SELECT grp AS source, n, z, p, p_adj,
        | p_adj <= 0.10 AS significant
        |FROM adj ORDER BY source""".stripMargin,

    // mirrors Analytics.randomizationTestMeanDiff: same md5 coin, same
    // rounded-before-compare tail count, (1+ge)/(b+1) p-value
    "q_permutation_test" ->
      s"""WITH d0 AS (SELECT avg(CASE WHEN lang = 'en' THEN n_chars END) -
        |  avg(CASE WHEN lang != 'en' THEN n_chars END) AS d0 FROM documents),
        |reps AS (SELECT r.i AS r, d.n_chars,
        |  ${duckHex24("CAST(d.doc_id AS VARCHAR) || ':' || r.i")}
        |    / 16777216.0 < 0.5 AS fa
        | FROM documents d CROSS JOIN (SELECT unnest(range(199)) AS i) r),
        |m AS (SELECT r, avg(CASE WHEN fa THEN n_chars END) -
        |  avg(CASE WHEN NOT fa THEN n_chars END) AS d FROM reps GROUP BY r),
        |ge AS (SELECT CAST(sum(CASE WHEN round(abs(m.d), 6) >=
        |   round(abs((SELECT d0 FROM d0)), 6) THEN 1 ELSE 0 END) AS BIGINT) AS ge
        | FROM m)
        |SELECT round((SELECT d0 FROM d0), 6) AS diff_obs,
        | round((ge + 1) / 200.0, 6) AS p_value,
        | CAST(199 AS BIGINT) AS n_replicates FROM ge""".stripMargin,

    // mirrors Analytics.poissonBootstrapMeanCI literal for literal:
    // 24-bit md5 uniform, Poisson(1) CDF ladder, rank-6/rank-195 bounds
    "q_bootstrap_ci" ->
      s"""WITH reps AS (SELECT r.i AS r, d.n_chars,
        |  ${duckHex24("CAST(d.doc_id AS VARCHAR) || ':' || r.i")}
        |    / 16777216.0 AS u
        | FROM documents d CROSS JOIN (SELECT unnest(range(200)) AS i) r),
        |w AS (SELECT r, n_chars, CASE
        |  WHEN u < 0.367879441 THEN 0 WHEN u < 0.735758882 THEN 1
        |  WHEN u < 0.919698603 THEN 2 WHEN u < 0.981011843 THEN 3
        |  WHEN u < 0.996340153 THEN 4 WHEN u < 0.999405815 THEN 5
        |  WHEN u < 0.999916758 THEN 6 WHEN u < 0.999989750 THEN 7
        |  ELSE 8 END AS w FROM reps),
        |m AS (SELECT r, sum(w * n_chars) / CAST(sum(w) AS DOUBLE) AS m
        | FROM w GROUP BY r),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM m)
        |SELECT (SELECT round(avg(n_chars), 6) FROM documents) AS mean,
        | (SELECT round(m, 6) FROM rk WHERE rk = 6) AS ci_lo,
        | (SELECT round(m, 6) FROM rk WHERE rk = 195) AS ci_hi,
        | CAST(200 AS BIGINT) AS n_replicates""".stripMargin,

    "q_robust_stats" ->
      """WITH q AS (SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
        |            quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem)
        |SELECT round(q.lo, 6) AS p_lo, round(q.hi, 6) AS p_hi,
        | round(avg(CASE WHEN l_extendedprice BETWEEN q.lo AND q.hi
        |           THEN l_extendedprice END), 6) AS trimmed_mean,
        | round(stddev_samp(CASE WHEN l_extendedprice < q.lo THEN q.lo
        |                        WHEN l_extendedprice > q.hi THEN q.hi
        |                        ELSE l_extendedprice END), 6) AS winsor_std,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE l_extendedprice < q.lo
        |                          OR l_extendedprice > q.hi) AS BIGINT) AS n_trimmed
        |FROM lineitem, q GROUP BY q.lo, q.hi""".stripMargin,

    "q_robust_by_source" ->
      """WITH b AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS v
        | FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |q AS (SELECT g, quantile_cont(v, 0.1) AS lo,
        |       quantile_cont(v, 0.9) AS hi FROM b GROUP BY 1)
        |SELECT b.g AS grp, round(q.lo, 6) AS p_lo, round(q.hi, 6) AS p_hi,
        | round(avg(CASE WHEN v BETWEEN q.lo AND q.hi THEN v END), 6)
        |   AS trimmed_mean,
        | round(stddev_samp(CASE WHEN v < q.lo THEN q.lo
        |                        WHEN v > q.hi THEN q.hi ELSE v END), 6)
        |   AS winsor_std,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE v < q.lo OR v > q.hi) AS BIGINT)
        |   AS n_trimmed
        |FROM b JOIN q ON b.g = q.g
        |GROUP BY b.g, q.lo, q.hi ORDER BY grp""".stripMargin,

    "q_mad" ->
      """WITH x AS (SELECT CAST(n_chars * CASE WHEN doc_id < 3 THEN 50
        |        ELSE 1 END AS DOUBLE) AS x FROM documents),
        |m AS (SELECT quantile_cont(x, 0.5) AS m FROM x),
        |d AS (SELECT x.x, m.m, abs(x.x - m.m) AS ax FROM x, m),
        |md AS (SELECT quantile_cont(ax, 0.5) AS mad FROM d)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE abs(0.6745 * (x - m) / mad) > 3.5)
        |   AS BIGINT) AS n_outliers,
        | round(max(0.6745 * (x - m) / mad), 6) AS max_z,
        | round(min(0.6745 * (x - m) / mad), 6) AS min_z
        |FROM d, md""".stripMargin,

    // corpus anchor + the engine's GK rank-guarantee verdicts
    "q_robust_stats_scale" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        | true AS lo_rank_ok, true AS hi_rank_ok, true AS trim_frac_ok
        |FROM lineitem""".stripMargin,

    "q_hll_incremental" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | true AS union_err_ok, true AS full_err_ok,
        | true AS union_matches_full
        |FROM events""".stripMargin,

    "q_auc" ->
      """WITH d AS (SELECT l_discount AS s,
        |        CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS y
        |       FROM lineitem),
        |h AS (SELECT s, CAST(count(*) AS DOUBLE) AS c, sum(y) AS pos
        |      FROM d GROUP BY s),
        |r AS (SELECT pos, sum(c) OVER (ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - (c + 1)/2.0 + 1 AS rk FROM h),
        |t AS (SELECT sum(pos * rk) AS rpos, sum(pos) AS np FROM r),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |       round(avg((s - y)*(s - y)), 6) AS brier FROM d)
        |SELECT round((rpos - np*(np + 1)/2) / (np*(n - np)), 6) AS auc,
        | brier, CAST(np AS BIGINT) AS n_pos, CAST(n - np AS BIGINT) AS n_neg
        |FROM t, g""".stripMargin,

    "eval_delong" ->
      """WITH d AS (SELECT CAST(n_chars % 97 AS DOUBLE) AS sa,
        |        CAST(n_chars % 89 AS DOUBLE) AS sb,
        |        CASE WHEN doc_id % 3 = 0 OR n_chars % 5 = 0
        |         THEN 1.0 ELSE 0.0 END AS y
        |       FROM documents),
        |ha AS (SELECT sa AS v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(y) AS BIGINT) AS p FROM d GROUP BY 1),
        |ca AS (SELECT v, c, p,
        |  CAST(sum(c) OVER w AS BIGINT) AS cc,
        |  CAST(sum(p) OVER w AS BIGINT) AS cp FROM ha
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ra AS (SELECT v, (cc * 2 - c) - (cp * 2 - p) AS d10a,
        |  (cc * 2 - c) - ((cc - cp) * 2 - (c - p)) AS d01a FROM ca),
        |hb AS (SELECT sb AS v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(y) AS BIGINT) AS p FROM d GROUP BY 1),
        |cb AS (SELECT v, c, p,
        |  CAST(sum(c) OVER w AS BIGINT) AS cc,
        |  CAST(sum(p) OVER w AS BIGINT) AS cp FROM hb
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |rb AS (SELECT v, (cc * 2 - c) - (cp * 2 - p) AS d10b,
        |  (cc * 2 - c) - ((cc - cp) * 2 - (c - p)) AS d01b FROM cb),
        |rr AS (SELECT d.y, ra.d10a, ra.d01a, rb.d10b, rb.d01b
        |  FROM d JOIN ra ON d.sa = ra.v JOIN rb ON d.sb = rb.v),
        |m AS (SELECT CAST(sum(y) AS BIGINT) AS np,
        |  CAST(sum(1 - y) AS BIGINT) AS nn,
        |  CAST(sum(CASE WHEN y = 1 THEN d10a END) AS DOUBLE) AS spa,
        |  CAST(sum(CASE WHEN y = 1 THEN d10a * d10a END) AS DOUBLE) AS sspa,
        |  CAST(sum(CASE WHEN y = 1 THEN d10b END) AS DOUBLE) AS spb,
        |  CAST(sum(CASE WHEN y = 1 THEN d10b * d10b END) AS DOUBLE) AS sspb,
        |  CAST(sum(CASE WHEN y = 1 THEN d10a * d10b END) AS DOUBLE) AS spab,
        |  CAST(sum(CASE WHEN y = 0 THEN d01a END) AS DOUBLE) AS sna,
        |  CAST(sum(CASE WHEN y = 0 THEN d01a * d01a END) AS DOUBLE) AS ssna,
        |  CAST(sum(CASE WHEN y = 0 THEN d01b END) AS DOUBLE) AS snb,
        |  CAST(sum(CASE WHEN y = 0 THEN d01b * d01b END) AS DOUBLE) AS ssnb,
        |  CAST(sum(CASE WHEN y = 0 THEN d01a * d01b END) AS DOUBLE) AS snab
        | FROM rr),
        |f AS (SELECT np, nn,
        |  CAST(np AS DOUBLE) AS npd, CAST(nn AS DOUBLE) AS nnd,
        |  spa / (2.0 * np * nn) AS auca,
        |  spb / (2.0 * np * nn) AS aucb,
        |  (sspa - spa * spa / np) / (4.0 * nn * nn * (np - 1)) AS s10a,
        |  (sspb - spb * spb / np) / (4.0 * nn * nn * (np - 1)) AS s10b,
        |  (spab - spa * spb / np) / (4.0 * nn * nn * (np - 1)) AS c10,
        |  (ssna - sna * sna / nn) / (4.0 * np * np * (nn - 1)) AS s01a,
        |  (ssnb - snb * snb / nn) / (4.0 * np * np * (nn - 1)) AS s01b,
        |  (snab - sna * snb / nn) / (4.0 * np * np * (nn - 1)) AS c01
        | FROM m),
        |g AS (SELECT *,
        |  (s10a + s10b - 2.0 * c10) / npd + (s01a + s01b - 2.0 * c01) / nnd
        |    AS vdiff FROM f)
        |SELECT
        | CASE WHEN np > 0 AND nn > 0 THEN round(auca, 6) END AS auc_a,
        | CASE WHEN np > 0 AND nn > 0 THEN round(aucb, 6) END AS auc_b,
        | CASE WHEN np >= 2 AND nn >= 2
        |  THEN round(sqrt(s10a / npd + s01a / nnd), 6) END AS se_a,
        | CASE WHEN np >= 2 AND nn >= 2
        |  THEN round(sqrt(s10b / npd + s01b / nnd), 6) END AS se_b,
        | CASE WHEN np >= 2 AND nn >= 2 AND vdiff >= 0
        |  THEN round(sqrt(vdiff), 6) END AS se_diff,
        | CASE WHEN np >= 2 AND nn >= 2 AND vdiff > 0
        |  THEN round((auca - aucb) / sqrt(vdiff), 6) END AS z,
        | CASE WHEN np >= 2 AND nn >= 2 AND vdiff > 0
        |  THEN abs((auca - aucb) / sqrt(vdiff)) > 1.959963984540054 END
        |   AS reject_05,
        | np AS n_pos, nn AS n_neg
        |FROM g""".stripMargin,

    "eval_avg_precision" ->
      """WITH d AS (SELECT l_discount AS s,
        |        CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS y
        |       FROM lineitem),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS c, sum(y) AS pos
        |      FROM d GROUP BY s),
        |cum AS (SELECT *,
        |  sum(c) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
        |  sum(pos) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
        | FROM h),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n, sum(pos) AS np FROM h),
        |f AS (SELECT pos, np, n,
        |  np - cump + pos AS tp,
        |  CAST(n - cumc + c AS DOUBLE) AS at FROM cum, t),
        |a AS (SELECT max(np) AS np, max(n) AS n,
        |  sum(pos * tp / at) AS apnum,
        |  max(2.0 * tp / (at + np)) AS bestf1 FROM f)
        |SELECT
        | CASE WHEN np > 0 AND n > np THEN round(apnum / np, 6) END AS ap,
        | CASE WHEN np > 0 AND n > np THEN round(bestf1, 6) END AS best_f1,
        | CAST(np AS BIGINT) AS n_pos, CAST(n - np AS BIGINT) AS n_neg,
        | CASE WHEN n > 0 THEN round(np / CAST(n AS DOUBLE), 6) END
        |   AS prevalence
        |FROM a""".stripMargin,

    "q_join_size" ->
      """WITH ca AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS na
        |            FROM lineitem GROUP BY 1),
        |cb AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
        |       FROM orders GROUP BY 1)
        |SELECT CAST(sum(na * nb) AS BIGINT) AS join_rows,
        | CAST(count(*) AS BIGINT) AS n_keys_both,
        | CAST(max(na * nb) AS BIGINT) AS max_key_pairs,
        | true AS matches_actual
        |FROM ca JOIN cb USING (k)""".stripMargin,

    "q_overlap" ->
      """WITH a AS (SELECT epoch_us(ts)//1000000 AS a_start,
        |        epoch_us(ts)//1000000 + 1800 AS a_end
        |       FROM events WHERE user_id = 1),
        |b AS (SELECT epoch_us(ts)//1000000 AS b_start,
        |       epoch_us(ts)//1000000 + 3600 AS b_end
        |      FROM events WHERE user_id = 2),
        |p AS (SELECT least(a_end, b_end) - greatest(a_start, b_start) AS ov
        |      FROM a JOIN b ON a_start <= b_end AND b_start <= a_end)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(sum(ov) AS BIGINT) AS sum_overlap_sec,
        | CAST(max(ov) AS BIGINT) AS max_overlap_sec
        |FROM p""".stripMargin,

    "q_stream_anomaly" ->
      """WITH e AS (SELECT user_id, event_id, value FROM events
        |           WHERE user_id < 8 AND value IS NOT NULL),
        |r AS (SELECT user_id, value,
        |       count(*) OVER w AS cnt, avg(value) OVER w AS m,
        |       stddev_samp(value) OVER w AS sd
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT user_id, CASE WHEN cnt >= 2 AND sd > 0
        |       THEN round((value - m) / sd, 6) END AS z FROM r)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(z) AS BIGINT) AS n_scored,
        | CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_anomalies,
        | round(sum(abs(z)), 4) AS sum_abs_z
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_resample" ->
      """WITH obs AS (SELECT user_id,
        |        (epoch_us(ts) // 1000000 // 1800) * 1800 AS bucket,
        |        round(max(value), 4) AS v
        |       FROM events WHERE user_id < 6 GROUP BY 1, 2),
        |span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |         FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 1800)) AS bucket
        |         FROM span),
        |j AS (SELECT g.user_id, g.bucket, o.v, o.v IS NOT NULL AS is_observed
        |      FROM grid g LEFT JOIN obs o USING (user_id, bucket))
        |SELECT user_id, bucket,
        | last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        | is_observed
        |FROM j ORDER BY user_id, bucket""".stripMargin,

    "q_chi2" ->
      """WITH c AS (SELECT event_type AS a, CAST(user_id % 5 AS VARCHAR) AS b,
        |        CAST(count(*) AS BIGINT) AS o
        |       FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |       GROUP BY 1, 2),
        |m AS (SELECT a, sum(o) AS ra FROM c GROUP BY a),
        |k AS (SELECT b, sum(o) AS cb FROM c GROUP BY b),
        |t AS (SELECT c.o, m.ra * 1.0 * k.cb / (SELECT sum(o) FROM c) AS e
        |      FROM c JOIN m USING (a) JOIN k USING (b)),
        |s AS (SELECT sum((o - e)*(o - e)/e - e) AS p,
        |       (SELECT CAST(sum(o) AS DOUBLE) FROM c) AS n FROM t)
        |SELECT round(p + n, 6) AS chi2,
        | CAST(((SELECT count(*) FROM m) - 1) *
        |      ((SELECT count(*) FROM k) - 1) AS BIGINT) AS dof,
        | CAST(n AS BIGINT) AS n,
        | round(sqrt((p + n) / (n * (least((SELECT count(*) FROM m),
        |   (SELECT count(*) FROM k)) - 1))), 6) AS cramers_v
        |FROM s""".stripMargin,

    "q_ewma" ->
      """WITH e AS (SELECT event_id, user_id, value, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |       FROM events WHERE user_id < 10),
        |j AS (SELECT a.event_id,
        |       sum(b.value * pow(0.5, a.rn - b.rn)) AS num,
        |       sum(pow(0.5, a.rn - b.rn)) AS den
        |      FROM e a JOIN e b ON a.user_id = b.user_id
        |       AND b.rn BETWEEN a.rn - 4 AND a.rn
        |      GROUP BY 1)
        |SELECT event_id, round(num / den, 6) AS ewma
        |FROM j ORDER BY event_id""".stripMargin,

    "q_quantile_sketch" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | round(quantile_cont(value, 0.5), 4) AS p50_exact,
        | round(quantile_cont(value, 0.9), 4) AS p90_exact,
        | true AS p50_ok, true AS p90_ok, true AS rollup_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_slidewindow" ->
      """SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM (SELECT event_type, value,
        |       CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT)
        |         - 1800*k AS w_start
        |      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) t)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_skew_diag" ->
      """WITH c AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
        |       CAST(count(*) AS DOUBLE) AS nk FROM c)
        |SELECT key, n, round(100*n/t.total, 4) AS share_pct,
        | round(n/(t.total/t.nk), 4) AS vs_mean,
        | CAST(ceil(n/1000.0) AS INT) AS salt_reco
        |FROM c, t ORDER BY n DESC, key LIMIT 10""".stripMargin,

    "q_cohort" ->
      """WITH pu AS (SELECT user_id,
        |   (epoch_us(ts)//1000000 // 86400) * 86400 AS p FROM events),
        |c AS (SELECT user_id, min(p) AS cohort FROM pu GROUP BY 1),
        |a AS (SELECT DISTINCT pu.user_id, c.cohort, pu.p
        |      FROM pu JOIN c USING (user_id)),
        |act AS (SELECT cohort AS cohort_period,
        |   CAST((p - cohort)//86400 AS BIGINT) AS period_offset,
        |   CAST(count(*) AS BIGINT) AS n_active FROM a GROUP BY 1, 2),
        |sz AS (SELECT cohort_period, n_active AS cohort_size
        |       FROM act WHERE period_offset = 0)
        |SELECT act.cohort_period, act.period_offset, act.n_active,
        | sz.cohort_size,
        | round(act.n_active * 100.0 / sz.cohort_size, 2) AS retention_pct
        |FROM act JOIN sz USING (cohort_period)
        |ORDER BY cohort_period, period_offset""".stripMargin,

    "q_ttest" ->
      """WITH s AS (SELECT (user_id % 2 = 0) AS ina, value FROM events
        |           WHERE event_type = 'purchase'),
        |a AS (SELECT count(*) AS n, avg(value) AS m, var_samp(value) AS v
        |      FROM s WHERE ina),
        |b AS (SELECT count(*) AS n, avg(value) AS m, var_samp(value) AS v
        |      FROM s WHERE NOT ina)
        |SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        | round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,
        | round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 4) AS t_stat,
        | round(pow(a.v/a.n + b.v/b.n, 2) /
        |   (pow(a.v/a.n, 2)/(a.n-1) + pow(b.v/b.n, 2)/(b.n-1)), 4)
        |   AS welch_df
        |FROM a, b""".stripMargin,

    "q_markov" ->
      """WITH seq AS (SELECT event_type AS from_state,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_state FROM events),
        |p AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
        |      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n,
        | round(n * 1.0 / sum(n) OVER (PARTITION BY from_state), 6) AS prob
        |FROM p ORDER BY from_state, to_state""".stripMargin,

    "q_regression" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_basket" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b,
        |    l_partkey AS i FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM items),
        |c AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
        |p AS (SELECT a.i AS item_a, b.i AS item_b,
        |       CAST(count(*) AS BIGINT) AS n_baskets
        |      FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.item_a, p.item_b, p.n_baskets,
        | round(p.n_baskets / nb.n, 6) AS support,
        | round(p.n_baskets * 1.0 / ca.c, 6) AS confidence,
        | round(p.n_baskets * nb.n / (ca.c * cb.c), 6) AS lift
        |FROM p JOIN c ca ON p.item_a = ca.i JOIN c cb ON p.item_b = cb.i
        |CROSS JOIN nb
        |ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        | round(sum(value) FILTER (event_type = 'click'), 4) AS click,
        | round(sum(value) FILTER (event_type = 'error'), 4) AS error,
        | round(sum(value) FILTER (event_type = 'purchase'), 4) AS purchase,
        | round(sum(value) FILTER (event_type = 'signup'), 4) AS signup,
        | round(sum(value) FILTER (event_type = 'view'), 4) AS view
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_pop" ->
      """WITH w AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
        |    round(sum(value), 4) AS revenue FROM events GROUP BY 1),
        |l AS (SELECT week, revenue,
        |    lag(revenue) OVER (ORDER BY week) AS prev FROM w)
        |SELECT week, revenue, coalesce(prev, 0.0) AS prev_revenue,
        | round((revenue - prev) / nullif(prev, 0.0) * 100, 4) AS pct_change
        |FROM l ORDER BY week""".stripMargin,

    "chk_order" ->
      """WITH x AS (SELECT user_id,
        |   ts < lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)
        |     AS viol FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) FILTER (viol) AS BIGINT) AS n_violations,
        | CAST(count(DISTINCT CASE WHEN viol THEN user_id END) AS BIGINT)
        |   AS n_users_affected,
        | count(*) FILTER (viol) = 0 AS order_ok
        |FROM x""".stripMargin,

    "q_attribution" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type, value,
        |   coalesce(last_value(CASE WHEN event_type <> 'purchase'
        |       THEN event_type END IGNORE NULLS) OVER w, 'none') AS lt,
        |   coalesce(first_value(CASE WHEN event_type <> 'purchase'
        |       THEN event_type END IGNORE NULLS) OVER w, 'none') AS ft
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        |la AS (SELECT lt AS channel, CAST(count(*) AS BIGINT) AS n_last,
        |       round(sum(value), 4) AS rev_last FROM p GROUP BY 1),
        |fa AS (SELECT ft AS channel, CAST(count(*) AS BIGINT) AS n_first,
        |       round(sum(value), 4) AS rev_first FROM p GROUP BY 1)
        |SELECT coalesce(la.channel, fa.channel) AS channel,
        | coalesce(n_last, 0) AS n_last, coalesce(rev_last, 0.0) AS rev_last,
        | coalesce(n_first, 0) AS n_first, coalesce(rev_first, 0.0) AS rev_first
        |FROM la FULL OUTER JOIN fa ON la.channel = fa.channel
        |ORDER BY channel""".stripMargin,

    // batch debounce rolled up per key — streaming sessions must agree
    "q_stream_debounce" ->
      """WITH m AS (SELECT user_id, event_type, event_id,
        |   epoch_us(ts)//1000000 AS e,
        |   CASE WHEN epoch_us(ts)//1000000
        |         - lag(epoch_us(ts)//1000000) OVER w > 600
        |     OR lag(epoch_us(ts)//1000000) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS nb
        |  FROM events WINDOW w AS (PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(ts)//1000000, event_id)),
        |b AS (SELECT user_id, event_type,
        |   sum(nb) OVER (PARTITION BY user_id, event_type
        |     ORDER BY e, event_id ROWS UNBOUNDED PRECEDING) AS burst
        |  FROM m),
        |g AS (SELECT user_id, event_type, burst, count(*) AS n
        |      FROM b GROUP BY 1, 2, 3)
        |SELECT user_id, event_type,
        | CAST(count(*) AS BIGINT) AS n_bursts,
        | CAST(sum(n) AS BIGINT) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "q_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |            FROM events),
        |dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        |        FROM ud GROUP BY 1),
        |wau AS (SELECT a.day, CAST(count(DISTINCT ud.u) AS BIGINT) AS wau
        |        FROM dau a JOIN ud ON ud.d BETWEEN a.day - 6 AND a.day
        |        GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        | round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,

    "q_date_rollup" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        | CAST(date_trunc('week', ts) AS DATE) AS week,
        | CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS revenue
        |FROM events GROUP BY 1, 2 ORDER BY month, week""".stripMargin,

    "q_srm" ->
      """WITH c AS (SELECT
        |   CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
        |   CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b
        |  FROM events WHERE event_type = 'signup'),
        |x AS (SELECT n_a, n_b, CAST(0.5 AS DOUBLE) AS expected_a_frac,
        |   round(pow(n_a - (n_a + n_b) * 0.5, 2) / ((n_a + n_b) * 0.5)
        |     + pow(n_b - (n_a + n_b) * 0.5, 2) / ((n_a + n_b) * 0.5), 6)
        |     AS chi2 FROM c)
        |SELECT n_a, n_b, expected_a_frac, chi2,
        | chi2 > 3.841 AS srm_suspect FROM x""".stripMargin,

    "q_gini_purchases" ->
      """WITH u AS (SELECT user_id AS k, sum(value) AS x FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT x,
        |   row_number() OVER (ORDER BY x, k) AS i,
        |   row_number() OVER (ORDER BY x DESC, k DESC) AS rd
        |  FROM u)
        |SELECT CAST(count(*) AS BIGINT) AS n_units,
        | round(sum(x), 4) AS total,
        | round(2.0 * sum(i * x) / (count(*) * sum(x))
        |   - (count(*) + 1.0) / count(*), 6) AS gini,
        | round(sum(CASE WHEN rd <= 10 THEN x ELSE 0 END) / sum(x), 6)
        |   AS top10_share
        |FROM r""".stripMargin,

    "q_survival" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)//1000000) AS s_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, epoch_us(ts)//1000000 AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts)//1000000) AS h FROM events),
        |c AS (SELECT s.user_id, s.s_ts, min(p.p_ts) AS c_ts
        |      FROM s LEFT JOIN p ON p.user_id = s.user_id
        |        AND p.p_ts >= s.s_ts
        |      GROUP BY 1, 2),
        |d AS (SELECT CAST(coalesce(c_ts, h.h) - s_ts AS DOUBLE) AS t,
        |       c_ts IS NOT NULL AS e FROM c CROSS JOIN h),
        |hist AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (e) AS BIGINT) AS n_events
        |      FROM d GROUP BY 1),
        |r AS (SELECT t, n_events, CAST(sum(n) OVER (ORDER BY t
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |       AS BIGINT) AS n_risk FROM hist),
        |f AS (SELECT t, n_events, n_risk,
        |       1.0 - n_events * 1.0 / n_risk AS fac FROM r)
        |SELECT t, n_risk, n_events,
        | CASE WHEN min(fac) OVER wc <= 0 THEN 0.0
        |      ELSE round(exp(sum(ln(CASE WHEN fac > 0 THEN fac END))
        |        OVER wc), 6) END AS survival
        |FROM f WHERE n_events > 0
        |WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |  AND CURRENT ROW)""".stripMargin,

    // q_survival's CTE chain with the product replaced by the hazard
    // sums (censored-only rows contribute 0 hazard, so windowing after
    // the event filter is identical to the engine's window-then-filter)
    "q_hazard" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)//1000000) AS s_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, epoch_us(ts)//1000000 AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts)//1000000) AS h FROM events),
        |c AS (SELECT s.user_id, s.s_ts, min(p.p_ts) AS c_ts
        |      FROM s LEFT JOIN p ON p.user_id = s.user_id
        |        AND p.p_ts >= s.s_ts
        |      GROUP BY 1, 2),
        |d AS (SELECT CAST(coalesce(c_ts, h.h) - s_ts AS DOUBLE) AS t,
        |       c_ts IS NOT NULL AS e FROM c CROSS JOIN h),
        |hist AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (e) AS BIGINT) AS n_events
        |      FROM d GROUP BY 1),
        |r AS (SELECT t, n_events, CAST(sum(n) OVER (ORDER BY t
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |       AS BIGINT) AS n_risk FROM hist)
        |SELECT t, n_risk, n_events,
        | round(sum(CAST(n_events AS DOUBLE) / n_risk) OVER wc, 6)
        |   AS cum_hazard,
        | round(sum(CAST(n_events AS DOUBLE) /
        |   (CAST(n_risk AS DOUBLE) * n_risk)) OVER wc, 6) AS var_hazard
        |FROM r WHERE n_events > 0
        |WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |  AND CURRENT ROW)
        |ORDER BY t""".stripMargin,

    "q_rmst" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)//1000000) AS s_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, epoch_us(ts)//1000000 AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts)//1000000) AS h FROM events),
        |c AS (SELECT s.user_id, s.s_ts, min(p.p_ts) AS c_ts
        |      FROM s LEFT JOIN p ON p.user_id = s.user_id
        |        AND p.p_ts >= s.s_ts
        |      GROUP BY 1, 2),
        |d AS (SELECT CAST(coalesce(c_ts, h.h) - s_ts AS DOUBLE) AS t,
        |       c_ts IS NOT NULL AS e FROM c CROSS JOIN h),
        |hist AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (e) AS BIGINT) AS n_events
        |      FROM d GROUP BY 1),
        |r AS (SELECT t, n_events, CAST(sum(n) OVER (ORDER BY t
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |       AS BIGINT) AS n_risk FROM hist),
        |f AS (SELECT t, n_events, n_risk,
        |       1.0 - n_events * 1.0 / n_risk AS fac FROM r),
        |km AS (SELECT t, n_events,
        |       CASE WHEN min(fac) OVER wc <= 0 THEN 0.0
        |            ELSE exp(sum(ln(CASE WHEN fac > 0 THEN fac END))
        |              OVER wc) END AS sv
        |      FROM f
        |      WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW)),
        |e AS (SELECT t, sv FROM km WHERE n_events > 0 AND t <= 200000.0),
        |lg AS (SELECT t, sv, lag(t, 1, 0.0) OVER (ORDER BY t) AS pt,
        |       lag(sv, 1, 1.0) OVER (ORDER BY t) AS ps FROM e),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
        |       coalesce(sum((t - pt) * ps), 0.0) AS area,
        |       max(t) AS tl, arg_max(sv, t) AS sl FROM lg)
        |SELECT n_times, CAST(200000.0 AS DOUBLE) AS tau,
        | round(area + (200000.0 - coalesce(tl, 0.0)) * coalesce(sl, 1.0), 6)
        |   AS rmst
        |FROM a""".stripMargin,

    "q_skyline" ->
      """WITH p AS (SELECT event_id, epoch_us(ts)//1000000 AS x, value AS y
        |           FROM events)
        |SELECT p.event_id, p.x AS ts_epoch, round(p.y, 4) AS value
        |FROM p WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
        |ORDER BY event_id""".stripMargin,

    "q_debounce" ->
      """WITH m AS (SELECT user_id, event_type, event_id,
        |   epoch_us(ts)//1000000 AS e,
        |   CASE WHEN epoch_us(ts)//1000000
        |         - lag(epoch_us(ts)//1000000) OVER w > 600
        |     OR lag(epoch_us(ts)//1000000) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS nb
        |  FROM events WINDOW w AS (PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(ts)//1000000, event_id)),
        |b AS (SELECT user_id, event_type, e,
        |   sum(nb) OVER (PARTITION BY user_id, event_type
        |     ORDER BY e, event_id ROWS UNBOUNDED PRECEDING) AS burst
        |  FROM m)
        |SELECT user_id, event_type, CAST(burst AS BIGINT) AS burst_idx,
        | min(e) AS burst_start, max(e) AS burst_end,
        | CAST(count(*) AS BIGINT) AS n_events,
        | max(e) - min(e) AS span_sec
        |FROM b GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, burst_idx""".stripMargin,

    "q_mi" ->
      """WITH cells AS (SELECT event_type AS a, user_id % 5 AS b,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |m AS (SELECT c,
        |   sum(c) OVER (PARTITION BY a) AS ca,
        |   sum(c) OVER (PARTITION BY b) AS cb,
        |   (SELECT CAST(sum(c) AS DOUBLE) FROM cells) AS n
        |  FROM cells)
        |SELECT CAST(sum(c) AS BIGINT) AS n,
        | round(-sum((c/n) * ln(ca/n)), 6) AS h_a,
        | round(-sum((c/n) * ln(cb/n)), 6) AS h_b,
        | round(-sum((c/n) * ln(c/n)), 6) AS h_ab,
        | round(sum((c/n) * ln(c*n/(ca*cb))), 6) AS mi
        |FROM m""".stripMargin,

    "q_theils_u" ->
      """WITH cells AS (SELECT event_type AS a, user_id % 5 AS b,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |m AS (SELECT c,
        |   sum(c) OVER (PARTITION BY a) AS ca,
        |   sum(c) OVER (PARTITION BY b) AS cb,
        |   (SELECT CAST(sum(c) AS DOUBLE) FROM cells) AS n
        |  FROM cells),
        |agg AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |   -sum((c/n) * ln(ca/n)) AS ha, -sum((c/n) * ln(cb/n)) AS hb,
        |   sum((c/n) * ln(c*n/(ca*cb))) AS mi FROM m)
        |SELECT n, round(mi, 6) AS mi,
        | CASE WHEN ha > 0 THEN round(mi / ha, 6) END AS u_a_given_b,
        | CASE WHEN hb > 0 THEN round(mi / hb, 6) END AS u_b_given_a
        |FROM agg""".stripMargin,

    "q_mcnemar" ->
      """WITH d AS (SELECT
        |   (CAST(n_chars % 97 AS DOUBLE) / 96 > 0.5) AS pa,
        |   (CAST(n_chars % 89 AS DOUBLE) / 88 > 0.5) AS pb,
        |   (doc_id % 3 = 0 OR n_chars % 5 = 0) AS y
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(count(*) FILTER (pa = y AND pb = y) AS BIGINT) AS n_both_right,
        |   CAST(count(*) FILTER (pa = y AND pb <> y) AS BIGINT) AS n_only_a,
        |   CAST(count(*) FILTER (pa <> y AND pb = y) AS BIGINT) AS n_only_b,
        |   CAST(count(*) FILTER (pa <> y AND pb <> y) AS BIGINT) AS n_both_wrong
        |  FROM d),
        |v AS (SELECT *,
        |   (abs(CAST(n_only_a AS DOUBLE) - n_only_b) - 1)
        |     * (abs(CAST(n_only_a AS DOUBLE) - n_only_b) - 1)
        |     / (n_only_a + n_only_b) AS chi2,
        |   CAST(3.841458820694124 AS DOUBLE) AS crit
        |  FROM g)
        |SELECT n, n_both_right, n_only_a, n_only_b, n_both_wrong,
        | round(chi2, 6) AS chi2, round(crit, 6) AS crit_05,
        | chi2 > crit AS reject_05
        |FROM v""".stripMargin,

    "q_effect_size" ->
      """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |        coalesce(lang = 'en', false) AS a
        |       FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT CAST(count(*) FILTER (a) AS BIGINT) AS n_a,
        |       CAST(count(*) FILTER (NOT a) AS BIGINT) AS n_b,
        |       avg(v) FILTER (a) AS ma, avg(v) FILTER (NOT a) AS mb,
        |       var_samp(v) FILTER (a) AS va,
        |       var_samp(v) FILTER (NOT a) AS vb FROM s),
        |d AS (SELECT *, (ma - mb) / sqrt(((n_a - 1) * va + (n_b - 1) * vb)
        |        / (n_a + n_b - 2)) AS cd FROM g)
        |SELECT n_a, n_b, round(ma - mb, 6) AS mean_diff,
        | round(cd, 6) AS cohens_d,
        | round(cd * (1 - CAST(3 AS DOUBLE) / (4 * (n_a + n_b) - 9)), 6)
        |   AS hedges_g
        |FROM d""".stripMargin,

    // Split replayed with the md5-bucket rule; qhat = the
    // ceil((ncal+1)*0.8)-th smallest nonconformity (ORDER BY nc, id
    // OFFSET k-1); per-slice coverage on the held-out half. The NULL
    // filter mirrors the engine's __nc.isNotNull exactly (nc is NULL
    // iff value OR user_id is NULL), and the empty-rank corner
    // synthesizes qhat = +∞ — the engine's honest infinite interval
    // when ⌈(ncal+1)(1−α)⌉ > ncal — instead of an empty cross join
    // returning zero rows (ADVICE r14).
    "q_conformal" ->
      s"""WITH b AS (SELECT event_id AS id, event_type AS grp,
        |    abs(value - CAST(user_id % 100 AS DOUBLE)) AS nc,
        |    ${PipelineQueries.duckHex16("CAST(event_id AS VARCHAR)")} % 1000 < 500 AS coin
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS ncal FROM b WHERE coin),
        |r AS (SELECT nc, row_number() OVER (ORDER BY nc, id) AS rn
        |      FROM b WHERE coin),
        |q AS (SELECT coalesce(
        |        (SELECT r.nc FROM r, nn
        |         WHERE r.rn = CAST(ceil((nn.ncal + 1) * 0.8) AS BIGINT)),
        |        CAST('infinity' AS DOUBLE)) AS qhat),
        |t AS (SELECT grp, nc FROM b WHERE NOT coin)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_test,
        | round(avg(CASE WHEN nc <= q.qhat THEN 1.0 ELSE 0.0 END), 6)
        |   AS coverage,
        | avg(CASE WHEN nc <= q.qhat THEN 1.0 ELSE 0.0 END) >= 0.8
        |   AS covered,
        | round(q.qhat, 6) AS qhat, CAST(0.8 AS DOUBLE) AS target
        |FROM t, q GROUP BY grp, q.qhat ORDER BY grp""".stripMargin,

    // Same moment algebra: per-cohort (n, s, ss) rollup, 1-row totals,
    // sigma2 = SSW/(N-K), tau2 = max(0, (SSB-(K-1)sigma2)/(N-n2/N)),
    // B = (sigma2/n)/(sigma2/n + tau2) with the constant-data B=1 guard.
    "q_eb_shrink" ->
      """WITH d AS (SELECT user_id % 37 AS k,
        |            value + CAST(user_id % 37 AS DOUBLE) / 2 AS v
        |           FROM events WHERE value IS NOT NULL),
        |per AS (SELECT k, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
        |        sum(v * v) AS ss FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
        |        CAST(count(*) AS DOUBLE) AS kk, sum(s) AS st,
        |        sum(ss - s * s / n) AS ssw, sum(s * s / n) AS sb0,
        |        sum(CAST(n AS DOUBLE) * n) AS n2 FROM per),
        |c AS (SELECT nn, kk, st / nn AS gm, ssw / (nn - kk) AS sigma2,
        |       greatest(0, (sb0 - st * st / nn - (kk - 1) * (ssw / (nn - kk)))
        |         / (nn - n2 / nn)) AS tau2 FROM tot),
        |r AS (SELECT per.k, per.n, per.s / per.n AS mean, c.gm, c.nn, c.kk,
        |       CASE WHEN c.sigma2 / per.n + c.tau2 = 0 THEN 1.0
        |         ELSE (c.sigma2 / per.n) / (c.sigma2 / per.n + c.tau2) END AS b
        |      FROM per, c)
        |SELECT k AS key, n, round(mean, 6) AS mean,
        | CASE WHEN kk >= 3 AND nn > kk
        |   THEN round(b * gm + (1 - b) * mean, 6) END AS shrunk,
        | CASE WHEN kk >= 3 AND nn > kk THEN round(b, 6) END AS weight,
        | CASE WHEN kk >= 3 AND nn > kk THEN round(gm, 6) END AS grand_mean
        |FROM r ORDER BY key""".stripMargin,

    "q_cusum" ->
      """WITH b AS (SELECT user_id, ts, event_id,
        |   value - avg(value) OVER (PARTITION BY user_id) - 0.5 AS dev
        |  FROM events WHERE user_id < 25),
        |t AS (SELECT user_id, ts, event_id,
        |   sum(dev) OVER w AS t,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sc AS (SELECT user_id, i,
        |   t - least(0, min(t) OVER w) AS s
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |al AS (SELECT user_id, i, s,
        |   s > 10 AND coalesce(lag(s) OVER (PARTITION BY user_id ORDER BY i) <= 10,
        |     true) AS alarm
        |  FROM sc)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        | round(max(s), 4) AS max_cusum,
        | CAST(count(*) FILTER (alarm) AS BIGINT) AS n_alarms,
        | CAST(min(i) FILTER (alarm) AS INT) AS first_alarm_idx
        |FROM al GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_pchart" ->
      """WITH per AS (SELECT user_id % 20 AS bucket,
        |   CAST(count(*) AS BIGINT) AS n,
        |   CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS defects
        |  FROM events GROUP BY 1),
        |pool AS (SELECT sum(defects) * 1.0 / sum(n) AS pbar FROM per)
        |SELECT bucket, n, defects,
        | round(defects * 1.0 / n, 6) AS rate,
        | round(pool.pbar, 6) AS pooled_rate,
        | round(greatest(0, pool.pbar - 3 * sqrt(pool.pbar * (1 - pool.pbar) / n)), 6) AS lcl,
        | round(pool.pbar + 3 * sqrt(pool.pbar * (1 - pool.pbar) / n), 6) AS ucl,
        | (defects * 1.0 / n > pool.pbar + 3 * sqrt(pool.pbar * (1 - pool.pbar) / n)
        |  OR defects * 1.0 / n <
        |   greatest(0, pool.pbar - 3 * sqrt(pool.pbar * (1 - pool.pbar) / n)))
        |   AS out_of_control
        |FROM per CROSS JOIN pool ORDER BY bucket""".stripMargin,

    "q_unpivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket, event_type,
        | round(sum(value), 4) AS revenue
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q_stream_enrich" ->
      """SELECT coalesce(c_mktsegment, 'none') AS segment,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "q_json" ->
      """WITH x AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) - count(k) AS BIGINT) AS n_bad,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_calibration" ->
      """WITH d AS (SELECT l_quantity/50.0 AS s,
        |        CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END AS y
        |       FROM lineitem),
        |b AS (SELECT least(CAST(floor(s*10) AS INT), 9) AS bin,
        |       CAST(count(*) AS BIGINT) AS n, avg(s) AS avg_s, sum(y) AS pos
        |      FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tn, sum(pos) AS tp FROM b)
        |SELECT bin, n, round(avg_s, 6) AS avg_score,
        | round(pos/n, 6) AS obs_rate,
        | round(sum(n) OVER (ORDER BY bin DESC)/tn, 6) AS cum_pop_share,
        | round(sum(pos) OVER (ORDER BY bin DESC)/tp, 6) AS cum_pos_share
        |FROM b, t ORDER BY bin""".stripMargin,

    "q_theil_sen" ->
      """WITH pts AS (SELECT o_orderpriority AS k,
        |        CAST(year(o_orderdate)*12 + month(o_orderdate) AS DOUBLE) AS x,
        |        CAST(count(*) AS DOUBLE) AS y
        |       FROM orders GROUP BY 1, year(o_orderdate)*12 + month(o_orderdate)),
        |pr AS (SELECT a.k, (b.y - a.y)/(b.x - a.x) AS m
        |       FROM pts a JOIN pts b ON a.k = b.k AND a.x < b.x),
        |sl AS (SELECT k, quantile_cont(m, 0.5) AS slope,
        |        CAST(count(*) AS BIGINT) AS n_pairs FROM pr GROUP BY k)
        |SELECT p.k AS key, round(any_value(sl.slope), 6) AS slope,
        | round(quantile_cont(p.y - sl.slope*p.x, 0.5), 6) AS intercept,
        | any_value(sl.n_pairs) AS n_pairs
        |FROM pts p JOIN sl ON p.k = sl.k
        |GROUP BY p.k ORDER BY key""".stripMargin,

    "q_mann_kendall" ->
      """WITH pts AS (SELECT o_orderpriority AS k,
        |        CAST(year(o_orderdate)*12 + month(o_orderdate) AS DOUBLE) AS x,
        |        CAST(count(*) AS DOUBLE) AS y
        |       FROM orders GROUP BY 1, year(o_orderdate)*12 + month(o_orderdate)),
        |s AS (SELECT a.k AS k, sum(sign(b.y - a.y)) AS s
        |      FROM pts a JOIN pts b ON a.k = b.k AND a.x < b.x GROUP BY 1),
        |n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1),
        |tg AS (SELECT k, y, CAST(count(*) AS BIGINT) AS c
        |       FROM pts GROUP BY 1, 2),
        |tt AS (SELECT k, sum(CAST(c AS DOUBLE) * (c - 1) * (2 * c + 5)) AS tt
        |       FROM tg GROUP BY 1),
        |-- LEFT join + COALESCE: a single-point key forms zero pairs
        |-- (no s row) but must still report with S = 0 and a NULL
        |-- verdict, matching the engine (ADVICE r13)
        |j AS (SELECT n.k, n.n, COALESCE(s.s, 0.0) AS s,
        |        (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - tt.tt)
        |          / 18.0 AS vs
        |       FROM n LEFT JOIN s ON n.k = s.k JOIN tt ON n.k = tt.k),
        |z AS (SELECT k, n, s, vs,
        |        CASE WHEN vs > 0 THEN
        |          CASE WHEN s > 0 THEN (s - 1) / sqrt(vs)
        |               WHEN s < 0 THEN (s + 1) / sqrt(vs)
        |               ELSE 0.0 END END AS z
        |       FROM j)
        |SELECT k AS key, n, round(CAST(s AS DOUBLE), 6) AS s, round(vs, 6) AS var_s,
        | round(z, 6) AS z,
        | CASE WHEN n >= 10 AND z IS NOT NULL THEN abs(z) > 1.96 END
        |   AS reject_05
        |FROM z ORDER BY key""".stripMargin,

    "q_bloom_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_rfm" ->
      """WITH per AS (SELECT o_custkey AS e,
        |        915148800 - max(epoch_us(o_orderdate)//1000000) AS lag,
        |        CAST(count(*) AS BIGINT) AS f,
        |        round(sum(o_totalprice), 2) AS m
        |       FROM orders GROUP BY 1),
        |t AS (SELECT CAST(ntile(4) OVER (ORDER BY lag, e) AS INT) AS r_tier,
        |       CAST(ntile(4) OVER (ORDER BY f DESC, e) AS INT) AS f_tier,
        |       CAST(ntile(4) OVER (ORDER BY m DESC, e) AS INT) AS m_tier
        |      FROM per)
        |SELECT r_tier, f_tier, m_tier, CAST(count(*) AS BIGINT) AS n_entities
        |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_weighted_quantiles" ->
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |        CAST(l_quantity AS DOUBLE) AS w
        |       FROM lineitem WHERE l_quantity > 0),
        |c AS (SELECT v, sum(w) OVER (ORDER BY v, w
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |       sum(w) OVER () AS tw FROM b)
        |SELECT CAST(pr.p AS DOUBLE) AS p,
        | round(min(v) FILTER (cw >= pr.p * tw), 6) AS value
        |FROM c, (VALUES (0.25), (0.5), (0.75), (0.9)) pr(p)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gini" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |             FROM orders GROUP BY 1),
        |r AS (SELECT rev, row_number() OVER (ORDER BY rev) AS i FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n, round(sum(rev), 6) AS total,
        | round(2.0 * sum(i * rev) / (count(*) * sum(rev))
        |   - (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r""".stripMargin,

    "q_rfm_scale" ->
      """WITH per AS (SELECT o_custkey AS e,
        |        915148800 - max(epoch_us(o_orderdate)//1000000) AS lag,
        |        CAST(count(*) AS BIGINT) AS f,
        |        round(sum(o_totalprice), 2) AS m
        |       FROM orders GROUP BY 1),
        |b AS (SELECT
        |   quantile_disc(CAST(lag AS DOUBLE), [0.25, 0.5, 0.75]) AS rb,
        |   quantile_disc(CAST(-f AS DOUBLE), [0.25, 0.5, 0.75]) AS fb,
        |   quantile_disc(CAST(-m AS DOUBLE), [0.25, 0.5, 0.75]) AS mb
        |  FROM per),
        |t AS (SELECT
        |   CAST(1 + len(list_filter(b.rb, z -> CAST(per.lag AS DOUBLE) > z)) AS INT) AS r_tier,
        |   CAST(1 + len(list_filter(b.fb, z -> CAST(-per.f AS DOUBLE) > z)) AS INT) AS f_tier,
        |   CAST(1 + len(list_filter(b.mb, z -> CAST(-per.m AS DOUBLE) > z)) AS INT) AS m_tier
        |  FROM per, b)
        |SELECT r_tier, f_tier, m_tier, CAST(count(*) AS BIGINT) AS n_entities
        |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_botscore" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts)//1000000 AS t FROM events),
        |g AS (SELECT k, t, t - lag(t) OVER (PARTITION BY k ORDER BY t) AS gap
        |      FROM e),
        |per AS (SELECT k, CAST(count(*) AS BIGINT) AS n_events,
        |        max(t) - min(t) AS span_sec,
        |        round(avg(gap), 6) AS mean_gap_sec,
        |        round(stddev_samp(gap), 6) AS sd_gap_sec,
        |        round(stddev_samp(gap)/avg(gap), 6) AS gap_cv
        |       FROM g GROUP BY k),
        |mins AS (SELECT k, t//60*60 AS m, CAST(count(*) AS BIGINT) AS c
        |         FROM e GROUP BY 1, 2),
        |pk AS (SELECT k, max(c) AS peak FROM mins GROUP BY k)
        |SELECT per.k AS key, n_events, span_sec, mean_gap_sec, sd_gap_sec,
        | gap_cv, round(peak * 1.0 / n_events, 6) AS peak_minute_share
        |FROM per JOIN pk ON per.k = pk.k
        |ORDER BY peak_minute_share DESC, key LIMIT 15""".stripMargin,

    "q_concentration" ->
      """WITH per AS (SELECT n_name, o_custkey,
        |        round(sum(o_totalprice), 2) AS rev
        |       FROM orders JOIN customer ON o_custkey = c_custkey
        |       JOIN nation ON c_nationkey = n_nationkey
        |       GROUP BY 1, 2)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        | round(sum(rev), 2) AS revenue,
        | round(max(rev), 2) AS top_customer_rev,
        | round(round(max(rev), 2) / round(sum(rev), 2), 6) AS top_share
        |FROM per GROUP BY 1 ORDER BY n_name""".stripMargin,

    "q_cadence" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |        epoch_us(o_orderdate)//1000000 AS t FROM orders),
        |g AS (SELECT (t - lag(t) OVER (PARTITION BY o_custkey
        |        ORDER BY t, o_orderkey))/86400.0 AS gap_days FROM o)
        |SELECT CAST(count(*) AS BIGINT) AS n_intervals,
        | round(quantile_cont(gap_days, 0.5), 6) AS p50_days,
        | round(quantile_cont(gap_days, 0.9), 6) AS p90_days,
        | round(avg(gap_days), 6) AS mean_days
        |FROM g WHERE gap_days IS NOT NULL""".stripMargin,

    "q_backlog" ->
      """WITH op AS (SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
        |        CAST(count(*) AS BIGINT) AS n_opened FROM orders GROUP BY 1),
        |ls AS (SELECT l_orderkey, max(l_shipdate) AS last_ship
        |       FROM lineitem GROUP BY 1),
        |cl AS (SELECT year(last_ship)*100 + month(last_ship) AS ym,
        |        CAST(count(*) AS BIGINT) AS n_closed FROM ls GROUP BY 1),
        |j AS (SELECT coalesce(op.ym, cl.ym) AS ym,
        |       coalesce(n_opened, 0) AS n_opened,
        |       coalesce(n_closed, 0) AS n_closed
        |      FROM op FULL OUTER JOIN cl ON op.ym = cl.ym)
        |SELECT ym, n_opened, n_closed,
        | CAST(sum(n_opened - n_closed) OVER (ORDER BY ym
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS backlog
        |FROM j ORDER BY ym""".stripMargin,

    "q_abc" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |             FROM orders GROUP BY 1),
        |c AS (SELECT rev,
        |       sum(rev) OVER (ORDER BY rev DESC, o_custkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |       sum(rev) OVER () AS tot FROM per),
        |k AS (SELECT rev, CASE WHEN cum <= tot*0.80 THEN 'A'
        |       WHEN cum <= tot*0.95 THEN 'B' ELSE 'C' END AS cls FROM c)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_customers,
        | round(sum(rev), 2) AS revenue
        |FROM k GROUP BY 1 ORDER BY cls""".stripMargin,

    "q_new_repeat" ->
      """WITH o AS (SELECT o_custkey, o_totalprice, o_orderkey,
        |        year(o_orderdate)*100 + month(o_orderdate) AS ym
        |       FROM orders),
        |f AS (SELECT *, CASE WHEN row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY ym, o_orderkey) = 1 THEN 'new' ELSE 'repeat' END
        |        AS kind FROM o)
        |SELECT ym, kind, CAST(count(*) AS BIGINT) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM f GROUP BY 1, 2 ORDER BY ym, kind""".stripMargin,

    "chk_precision" ->
      """WITH a AS (
        | SELECT 'l_extendedprice' AS column_name, l_extendedprice AS v
        | FROM lineitem
        | UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        | UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT column_name, CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE round(v, 2) != v) AS BIGINT)
        |   AS n_not_2dp,
        | CAST(count(*) FILTER (WHERE v < 0) AS BIGINT) AS n_negative,
        | CAST(count(*) FILTER (WHERE v = 0) AS BIGINT) AS n_zero
        |FROM a GROUP BY 1 ORDER BY column_name""".stripMargin,

    "q_audience_overlap" ->
      """WITH sets AS (SELECT DISTINCT event_type AS t, user_id AS u
        |              FROM events),
        |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS sz FROM sets GROUP BY 1),
        |iv AS (SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT)
        |        AS n_common
        |       FROM sets a JOIN sets b ON a.u = b.u AND a.t < b.t
        |       GROUP BY 1, 2)
        |SELECT ta, tb, n_common, sa.sz AS sza, sb.sz AS szb,
        | round(n_common*1.0/(sa.sz + sb.sz - n_common), 6) AS jaccard
        |FROM iv JOIN sz sa ON iv.ta = sa.t JOIN sz sb ON iv.tb = sb.t
        |ORDER BY ta, tb""".stripMargin,

    "q_cycle_time" ->
      """WITH per AS (SELECT o_orderkey, o_orderpriority,
        |        (max(epoch_us(l_shipdate)//1000000)
        |          - min(epoch_us(o_orderdate)//1000000))/86400.0 AS days
        |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       GROUP BY 1, 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        | round(quantile_cont(days, 0.5), 6) AS p50_days,
        | round(quantile_cont(days, 0.95), 6) AS p95_days,
        | round(max(days), 6) AS max_days
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_elasticity" ->
      """WITH j AS (SELECT p_brand, ln(l_extendedprice/l_quantity) AS x,
        |        ln(l_quantity) AS y
        |       FROM lineitem JOIN part ON l_partkey = p_partkey
        |       WHERE l_quantity > 0 AND l_extendedprice > 0)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        | round(regr_slope(y, x), 6) AS elasticity,
        | round(regr_intercept(y, x), 6) AS intercept,
        | round(regr_r2(y, x), 6) AS r2
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (SELECT (epoch_us(ts)//1000000)//86400*86400 AS d,
        |        round(sum(value), 4) AS v
        |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |med AS (SELECT quantile_cont(v, 0.5) AS m FROM daily),
        |sg AS (SELECT d, CAST(v > m AS INT) AS s FROM daily, med
        |       WHERE v != m),
        |r AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
        |        OR lag(s) OVER (ORDER BY d) != s THEN 1 ELSE 0 END AS chg
        |      FROM sg),
        |t AS (SELECT CAST(sum(chg) AS BIGINT) AS n_runs,
        |       CAST(sum(s) AS DOUBLE) AS np,
        |       CAST(sum(1 - s) AS DOUBLE) AS nn FROM r)
        |SELECT n_runs, CAST(np AS BIGINT) AS n_above,
        | CAST(nn AS BIGINT) AS n_below,
        | round((n_runs - (2.0*np*nn/(np + nn) + 1))
        |   / sqrt(2.0*np*nn*(2.0*np*nn - np - nn)
        |     / ((np + nn)*(np + nn)*(np + nn - 1))), 6) AS runs_z
        |FROM t""".stripMargin,

    "q_gap_percentiles" ->
      """WITH e AS (SELECT event_type, event_id,
        |        epoch_us(ts)//1000000 AS t FROM events),
        |g AS (SELECT event_type, t - lag(t) OVER
        |        (PARTITION BY event_type ORDER BY t, event_id) AS gap
        |      FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        | round(quantile_cont(gap, 0.5), 6) AS p50_sec,
        | round(quantile_cont(gap, 0.95), 6) AS p95_sec,
        | max(gap) AS max_sec
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (SELECT (epoch_us(ts)//1000000)//86400*86400 AS d,
        |        round(sum(value), 4) AS v
        |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |lagged AS (SELECT v,
        |        lag(v, 1) OVER (ORDER BY d) AS l1,
        |        lag(v, 7) OVER (ORDER BY d) AS l7 FROM daily),
        |p AS (SELECT 1 AS lag, v AS x, l1 AS y FROM lagged
        |      UNION ALL SELECT 7, v, l7 FROM lagged),
        |f AS (SELECT lag, x, y FROM p WHERE y IS NOT NULL)
        |SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        | round((count(*)*sum(x*y) - sum(x)*sum(y))
        |   / (sqrt(count(*)*sum(x*x) - sum(x)*sum(x))
        |      * sqrt(count(*)*sum(y*y) - sum(y)*sum(y))), 6) AS acf
        |FROM f GROUP BY lag ORDER BY lag""".stripMargin,

    "q_growth" ->
      """WITH act AS (SELECT DISTINCT user_id AS u,
        |        (epoch_us(ts)//1000000)//86400*86400 AS d FROM events),
        |f AS (SELECT u, d, lag(d) OVER (PARTITION BY u ORDER BY d) AS prev
        |      FROM act),
        |st AS (SELECT d, CASE WHEN prev IS NULL THEN 'new'
        |        WHEN d - prev = 86400 THEN 'retained'
        |        ELSE 'resurrected' END AS status FROM f),
        |a AS (SELECT d, status, CAST(count(*) AS BIGINT) AS n
        |      FROM st GROUP BY 1, 2),
        |ch AS (SELECT f.d + 86400 AS d, 'churned' AS status,
        |        CAST(count(*) AS BIGINT) AS n
        |       FROM f WHERE NOT EXISTS (SELECT 1 FROM act
        |         WHERE act.u = f.u AND act.d = f.d + 86400)
        |       GROUP BY 1)
        |SELECT d, status, n FROM a
        |UNION ALL SELECT d, status, n FROM ch
        |ORDER BY d, status""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1995
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_histogram2d" ->
      """SELECT CAST(hour(ts) AS INT) AS hour_of_day,
        | CAST(least(floor(value/10), 9) AS INT) AS value_decile,
        | CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY hour_of_day, value_decile""".stripMargin,

    "q_movers" ->
      """WITH per AS (SELECT p_brand,
        |        round(sum(CASE WHEN year(l_shipdate) < 1995
        |          THEN l_extendedprice*(1.0 - l_discount) ELSE 0 END), 2)
        |          AS rev_early,
        |        round(sum(CASE WHEN year(l_shipdate) >= 1995
        |          THEN l_extendedprice*(1.0 - l_discount) ELSE 0 END), 2)
        |          AS rev_late
        |       FROM lineitem JOIN part ON l_partkey = p_partkey
        |       GROUP BY 1),
        |r AS (SELECT p_brand, rev_early, rev_late,
        |       CAST(row_number() OVER (ORDER BY rev_early DESC, p_brand)
        |         AS INT) AS rank_early,
        |       CAST(row_number() OVER (ORDER BY rev_late DESC, p_brand)
        |         AS INT) AS rank_late FROM per)
        |SELECT *, rank_early - rank_late AS rank_delta FROM r
        |ORDER BY abs(rank_early - rank_late) DESC, p_brand LIMIT 10""".stripMargin,

    "q_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |        epoch_us(ts)//1000000 AS t FROM events),
        |b AS (SELECT *, CASE WHEN t - lag(t) OVER
        |        (PARTITION BY user_id ORDER BY t, event_id) > 1800
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM b),
        |p AS (SELECT user_id, sid,
        |       string_agg(event_type, '>' ORDER BY t, event_id) AS path
        |      FROM g GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin,

    "q_concurrency" ->
      """WITH t0 AS (SELECT epoch_us(ts)//1000000 AS t FROM events
        |            WHERE event_type = 'purchase'),
        |sweep AS (SELECT t, 1 AS d FROM t0
        |          UNION ALL SELECT t + 1800, -1 FROM t0),
        |r AS (SELECT t, d, sum(d) OVER (ORDER BY t, d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |      FROM sweep),
        |p AS (SELECT max(run) AS peak FROM r)
        |SELECT CAST(p.peak AS BIGINT) AS peak_concurrency,
        | min(r.t) AS first_peak_epoch,
        | (SELECT CAST(count(*) AS BIGINT) FROM t0) AS n_intervals
        |FROM r, p WHERE r.run = p.peak GROUP BY p.peak""".stripMargin,

    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type,
        |        epoch_us(ts)//1000000 AS t FROM events),
        |f AS (SELECT user_id, min(t) FILTER (WHERE event_type = 'view') AS fv
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.user_id, min(e.t - f.fv) AS delta
        |      FROM e JOIN f ON e.user_id = f.user_id
        |      WHERE e.event_type = 'purchase' AND f.fv IS NOT NULL
        |        AND e.t >= f.fv
        |      GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        | round(quantile_cont(delta, 0.5), 6) AS p50_sec,
        | round(quantile_cont(delta, 0.9), 6) AS p90_sec,
        | round(avg(delta), 6) AS mean_sec
        |FROM d""".stripMargin,

    "q_wilson" ->
      """WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        avg(CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END) AS p
        |       FROM events GROUP BY 1)
        |SELECT event_type, n, round(p, 6) AS rate,
        | round((p + 3.841458881296/(n*2)
        |   - 1.959964*sqrt(p*(1.0-p)/n + 3.841458881296/(n*n*4)))
        |   / (1.0 + 3.841458881296/n), 6) AS wilson_low,
        | round((p + 3.841458881296/(n*2)
        |   + 1.959964*sqrt(p*(1.0-p)/n + 3.841458881296/(n*n*4)))
        |   / (1.0 + 3.841458881296/n), 6) AS wilson_high
        |FROM a ORDER BY event_type""".stripMargin,

    "q_best_split" ->
      """WITH cells AS (SELECT l_discount AS v, CAST(count(*) AS DOUBLE) AS n,
        |        sum(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END) AS p
        |       FROM lineitem GROUP BY 1),
        |cum AS (SELECT v,
        |        sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS nl,
        |        sum(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS pl,
        |        sum(n) OVER () AS nt, sum(p) OVER () AS pt FROM cells),
        |g AS (SELECT v AS threshold,
        |       round(
        |        (CASE WHEN pt/nt <= 0 OR pt/nt >= 1 THEN 0
        |         ELSE -((pt/nt)*ln(pt/nt) + (1-pt/nt)*ln(1-pt/nt)) END)
        |        - (nl/nt) * (CASE WHEN pl/nl <= 0 OR pl/nl >= 1 THEN 0
        |           ELSE -((pl/nl)*ln(pl/nl) + (1-pl/nl)*ln(1-pl/nl)) END)
        |        - ((nt-nl)/nt) * (CASE WHEN (pt-pl)/(nt-nl) <= 0
        |            OR (pt-pl)/(nt-nl) >= 1 THEN 0
        |           ELSE -(((pt-pl)/(nt-nl))*ln((pt-pl)/(nt-nl))
        |             + (1-(pt-pl)/(nt-nl))*ln(1-(pt-pl)/(nt-nl))) END), 6)
        |         AS gain,
        |       CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
        |       round(pl/nl, 6) AS pos_rate_left,
        |       round((pt-pl)/(nt-nl), 6) AS pos_rate_right
        |      FROM cum WHERE nl < nt)
        |SELECT * FROM g ORDER BY gain DESC, threshold LIMIT 1""".stripMargin,

    "q_interpolate" ->
      """WITH o AS (SELECT user_id AS k,
        |        (epoch_us(ts)//1000000)//3600*3600 AS b,
        |        round(sum(value), 4) AS x
        |       FROM events WHERE user_id < 10 GROUP BY 1, 2),
        |span AS (SELECT k, min(b) AS lo, max(b) AS hi FROM o GROUP BY 1),
        |grid AS (SELECT k, unnest(generate_series(lo, hi, 3600)) AS b FROM span),
        |j AS (SELECT grid.k, grid.b, o.x FROM grid
        |      LEFT JOIN o ON grid.k = o.k AND grid.b = o.b),
        |f AS (SELECT k, b, x,
        |       last_value(x IGNORE NULLS) OVER (PARTITION BY k ORDER BY b
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |       last_value(CASE WHEN x IS NOT NULL THEN b END IGNORE NULLS)
        |         OVER (PARTITION BY k ORDER BY b ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS pb,
        |       first_value(x IGNORE NULLS) OVER (PARTITION BY k ORDER BY b
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |       first_value(CASE WHEN x IS NOT NULL THEN b END IGNORE NULLS)
        |         OVER (PARTITION BY k ORDER BY b ROWS BETWEEN CURRENT ROW
        |           AND UNBOUNDED FOLLOWING) AS nb
        |      FROM j)
        |SELECT k AS key, b AS bucket,
        | round(CASE WHEN x IS NOT NULL THEN x
        |        ELSE pv + (nv - pv) * (b - pb) / (nb - pb) END, 6) AS value,
        | x IS NOT NULL AS is_observed
        |FROM f ORDER BY key, bucket""".stripMargin,

    "q_wquantile" ->
      """WITH c AS (SELECT l_returnflag AS k, l_extendedprice AS v,
        |        CAST(l_quantity AS DOUBLE) AS w,
        |        sum(l_quantity) OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |        sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
        |       FROM lineitem)
        |SELECT k AS key,
        | round(min(v) FILTER (WHERE cw >= 0.5*tw), 6) AS wq_50,
        | round(min(v) FILTER (WHERE cw >= 0.9*tw), 6) AS wq_90,
        | round(sum(w), 6) AS total_weight
        |FROM c GROUP BY k ORDER BY key""".stripMargin,

    "q_sessions_capped" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts)//1000000 AS t FROM events),
        |b AS (SELECT k, t, CASE WHEN t - lag(t) OVER
        |        (PARTITION BY k ORDER BY t) > 1800 THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |g AS (SELECT k, t, sum(brk) OVER (PARTITION BY k ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gs
        |      FROM b),
        |o AS (SELECT k, t, gs,
        |       (t - min(t) OVER (PARTITION BY k, gs)) // 7200 AS sub FROM g),
        |sess AS (SELECT k, gs, sub, CAST(count(*) AS BIGINT) AS n,
        |        max(t) - min(t) AS len FROM o GROUP BY 1, 2, 3)
        |SELECT k AS key, CAST(count(*) AS BIGINT) AS n_sessions,
        | CAST(sum(n) AS BIGINT) AS n_events,
        | CAST(max(n) AS BIGINT) AS max_session_events,
        | max(len) AS max_session_sec
        |FROM sess GROUP BY k ORDER BY key""".stripMargin,

    "chk_null_patterns" ->
      """WITH p AS (SELECT
        |  CASE WHEN l_returnflag = 'N' THEN '1' ELSE '0' END ||
        |  CASE WHEN l_discount < 0.02 THEN '1' ELSE '0' END ||
        |  CASE WHEN l_returnflag = 'N' AND l_discount < 0.02
        |    THEN '1' ELSE '0' END AS null_pattern
        | FROM lineitem),
        |g AS (SELECT null_pattern, CAST(count(*) AS BIGINT) AS n_rows
        |      FROM p GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS tot FROM g)
        |SELECT null_pattern, n_rows, round(n_rows/tot, 6) AS share
        |FROM g, t ORDER BY null_pattern""".stripMargin,

    // DuckDB dayofweek is 0 = Sunday; Spark's is 1 = Sunday → +1.
    "q_seasonal" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
        |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (SELECT dayofweek(d) + 1 AS dow, v FROM daily),
        |prof AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
        |        round(quantile_cont(v, 0.5), 6) AS med_value,
        |        round(avg(v), 6) AS mean_value
        |       FROM dd GROUP BY dow),
        |ratio AS (SELECT round(var_samp(dd.v - prof.med_value)
        |          / var_samp(dd.v), 6) AS resid_var_ratio
        |         FROM dd JOIN prof USING (dow))
        |SELECT dow, n_days, med_value, mean_value, resid_var_ratio
        |FROM prof, ratio ORDER BY dow""".stripMargin,

    "q_stream_upsert" ->
      """WITH r AS (SELECT user_id, event_type, round(value, 4) AS v,
        |        epoch_us(ts)//1000000 AS e,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |       FROM events),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       max(e) AS last_epoch FROM r GROUP BY 1)
        |SELECT a.user_id, r.event_type AS last_type, r.v AS last_value,
        | n_events, last_epoch
        |FROM a JOIN r ON a.user_id = r.user_id AND r.rn = 1
        |ORDER BY a.user_id""".stripMargin,
  )
}
