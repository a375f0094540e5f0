package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table and temporal table-health checks — the three intake
  * questions the single-table check engine (model/Checks.scala) cannot
  * ask because they span tables or the time axis:
  *
  *   - referential integrity: child keys with no parent (orphans);
  *   - freshness: how stale is the newest event vs an as-of point;
  *   - ingestion gaps: empty time buckets inside the observed span.
  *
  * Each returns a small verdict frame (1 row, or one per gap window)
  * and costs narrow scans: keys-only anti-join, a 1-row max aggregate,
  * and a bucket groupBy whose exchange carries (bucket, count). */
object TableHealth {

  /** Orphan audit: child rows whose `childKey` has no match among the
    * parent's `parentKey` values. The join ships DISTINCT keys only
    * (both sides project to one column before the anti-join — the
    * orphan-count-per-key rejoin is against the distinct-key result),
    * so the cost is key-cardinality, not table size. Returns one row:
    * (n_child, n_orphan_rows, n_orphan_keys, ref_ok). */
  def refIntegrity(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val ck = child.select(childKey.as("__k"))
    val orphanKeys = ck.distinct()
      .join(parent.select(parentKey.as("__k")).distinct(), Seq("__k"), "left_anti")
    val orphanRows = ck.join(orphanKeys, Seq("__k"), "left_semi")
    child.agg(count(lit(1L)).as("n_child"))
      .crossJoin(orphanRows.agg(count(lit(1L)).as("n_orphan_rows")))
      .crossJoin(orphanKeys.agg(count(lit(1L)).as("n_orphan_keys")))
      .withColumn("ref_ok", col("n_orphan_rows") === 0L)
  }

  /** Freshness vs an explicit `asOf` epoch second (explicit, never
    * wall-clock — a health check must be replayable): lag of the
    * newest `ts`, rows in the trailing `recentSeconds` window, and the
    * verdict lag ≤ `maxLagSeconds`. One partially-aggregated scan. */
  def freshness(df: DataFrame, ts: Column, asOfEpoch: Long,
      maxLagSeconds: Long, recentSeconds: Long = 3600L): DataFrame = {
    require(maxLagSeconds >= 0 && recentSeconds > 0, "bad thresholds")
    val e = unix_timestamp(ts)
    df.agg(
      max(e).as("newest_epoch"),
      sum(when(e > asOfEpoch - recentSeconds, 1L).otherwise(0L)).as("n_recent"))
      .select(col("newest_epoch"),
        (lit(asOfEpoch) - col("newest_epoch")).as("lag_sec"),
        col("n_recent"),
        (col("newest_epoch").isNotNull &&
          lit(asOfEpoch) - col("newest_epoch") <= maxLagSeconds).as("fresh_ok"))
  }

  /** Ingestion-gap audit: maximal runs of EMPTY `bucketSeconds` buckets
    * strictly inside the observed [min, max] span — the "did the feed
    * stop for two hours on Tuesday" question. One bucket groupBy
    * ((bucket, count) exchange), then gap detection over the bucket
    * table via lag — bucket-cardinality work, no dense grid
    * materialized. Returns one row per gap: (gap_start_epoch,
    * gap_end_epoch, n_missing), ordered. */
  def bucketGaps(df: DataFrame, ts: Column, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    import org.apache.spark.sql.expressions.Window
    val b = (floor(unix_timestamp(ts) / bucketSeconds) * bucketSeconds).cast("long")
    val buckets = df.select(b.as("__b")).groupBy("__b").agg(count(lit(1L)).as("__n"))
    val w = Window.orderBy(col("__b"))
    buckets
      .withColumn("__prev", lag(col("__b"), 1).over(w))
      .where(col("__prev").isNotNull &&
        col("__b") - col("__prev") > bucketSeconds)
      .select((col("__prev") + bucketSeconds).as("gap_start_epoch"),
        (col("__b") - bucketSeconds).as("gap_end_epoch"),
        ((col("__b") - col("__prev")) / bucketSeconds - 1).cast("long")
          .as("n_missing"))
      .orderBy("gap_start_epoch")
  }

  /** Order-independent content fingerprint of a table: row count plus
    * the SUM of a 60-bit md5-derived row hash over `cols` — the
    * cross-engine "did the migration/copy/rewrite preserve the data"
    * gate. Two tables agree on (n_rows, fingerprint) iff they hold the
    * same row MULTISET (up to astronomically-unlikely hash collisions);
    * any engine with md5 can recompute it — no row ordering, no
    * engine-specific hash, no sort. SUM (not XOR) so duplicate-row
    * pairs cannot cancel out; the accumulator is DECIMAL(38,0), which
    * cannot overflow below ~10²⁰ rows. The fingerprint is EMITTED as a
    * zero-padded 39-digit decimal STRING: a string compares bit-exact
    * through any downstream serialization (parquet, JSON, CSV, another
    * engine's DECIMAL/HUGEINT/BigInteger canonicalization), where a
    * 38-digit decimal's wire representation is engine-version
    * territory. Padding keeps lexicographic order = numeric order.
    *
    * Scale shape: one scan, partial-aggregated sum — the cheapest
    * possible whole-table assertion. Fields join under a 0x1f unit
    * separator with NULL marked 0x00, so neither ("ab","c")/("a","bc")
    * nor ("a",NULL) can alias. Cross-ENGINE use is exact for
    * integer/string/boolean columns; floating-point and temporal
    * columns cast to text under engine-specific formats (Spark prints
    * 1e7 as "1.0E7") — canonicalize those yourself first, or
    * fingerprint the stable columns. */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h = conv(substring(md5(canon), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.agg(count(lit(1L)).as("n_rows"),
      lpad(coalesce(sum(h), lit(0).cast("decimal(38,0)")).cast("string"),
        39, "0").as("fingerprint"))
  }

  /** k-anonymity audit: how many rows sit in a quasi-identifier
    * combination shared by FEWER than `k` rows — the standard
    * re-identification risk gate before releasing or sharing a
    * dataset (Sweeney 2002). A row whose (zip, age-band, …) combo is
    * rare is linkable to an individual even with names removed.
    *
    * One quasi-keyed aggregate ((quasi, count) exchange — cardinality
    * of the combo space, not the table), one 1-row rollup. Returns
    * (n_rows, n_groups, n_risky_groups, n_risky_rows, k_anonymous).
    * NULL quasi values group together (a NULL combo is itself a
    * linkable signature). */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi: _*).agg(count(lit(1L)).as("__n"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1L)).as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("n_risky_rows"))
      .withColumn("k_anonymous", col("n_risky_rows") === 0L)
  }

  /** Benford's-law first-digit audit (Benford 1938; the classic
    * fabricated-data / corrupted-feed screen for naturally-occurring
    * amounts): observed first-significant-digit frequencies vs
    * log₁₀(1 + 1/d), with the per-digit χ² contribution. Values are
    * floored to integers FIRST and the digit taken from the decimal
    * string — pure integer/string arithmetic, so both engines agree
    * exactly (a log₁₀/floor formulation puts boundary values like
    * 1000 on a float knife-edge). Zero/NULL values are excluded
    * (they have no significant digit). One digit-keyed aggregate +
    * a 1-row total. */
  def benford(df: DataFrame, c: Column, dp: Int = 6): DataFrame = {
    val v = floor(abs(c)).cast("long")
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val per = df.where(v >= 1)
      .groupBy(digit.as("digit")).agg(count(lit(1L)).as("n"))
    val total = per.agg(sum(col("n")).cast("double").as("__t"))
    per.crossJoin(total)
      .select(col("digit"), col("n"),
        round(col("n") / col("__t"), dp).as("obs_frac"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), dp)
          .as("exp_frac"),
        round(pow(col("n") - col("__t") * log(10.0, lit(1.0) + lit(1.0) / col("digit")), 2) /
          (col("__t") * log(10.0, lit(1.0) + lit(1.0) / col("digit"))), 4)
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** Column-redundancy audit: which columns are CONSTANT (at most one
    * distinct non-null value — dead weight in every scan) and which
    * are exact DUPLICATES of another column (denormalization residue,
    * double-joined attributes) — per column, a row-keyed multiset
    * digest (sum of md5(key ‖ value), the [[tableFingerprint]]
    * discipline applied column-wise) plus min/max; equal digests ⟺
    * equal column content under the key pairing.
    *
    * ONE scan computes every column's aggregates; the digest
    * comparison is driver-side over |cols| scalars. Returns one row
    * per column: (column_name, is_constant, duplicate_of) with
    * duplicate_of the lexicographically-first column holding identical
    * content (NULL for originals/uniques). */
  def columnRedundancy(df: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to audit")
    val spark = df.sparkSession
    import spark.implicits._
    def digest(c: String) =
      sum(conv(substring(md5(concat_ws("\u001f",
          col(keyCol).cast("string"),
          coalesce(col(c).cast("string"), lit("\u0000")))), 1, 15), 16, 10)
        .cast("decimal(38,0)")).as(s"__dig_$c")
    def constant(c: String) =
      (min(col(c).cast("string")) <=> max(col(c).cast("string"))).as(s"__c_$c")
    val aggs = cols.flatMap(c => Seq(digest(c), constant(c)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val digs = cols.map(c => c -> row.getAs[java.math.BigDecimal](s"__dig_$c")).toMap
    val firstByDig = digs.groupBy(_._2).map { case (d, xs) => d -> xs.keys.min }
    val out = cols.map { c =>
      val first = firstByDig(digs(c))
      (c, row.getAs[Boolean](s"__c_$c"),
        if (first == c) null.asInstanceOf[String] else first)
    }
    out.toDF("column_name", "is_constant", "duplicate_of")
      .orderBy("column_name")
  }

  /** Schema-drift check: the table's ACTUAL schema against the
    * `expected` (name → catalog type) contract — one row per column in
    * either side with status `ok` / `type_mismatch` / `missing` /
    * `unexpected`. The gate a pipeline runs BEFORE reading data: a
    * producer that renamed a column or widened a type fails here, at
    * metadata cost, not three jobs later in a cast error — and
    * `unexpected` surfaces silently-added columns a strict reader
    * would drop. METADATA-ONLY: touches `df.schema` (parquet footers /
    * catalog), scans zero rows at any table size.
    *
    * Type names are Spark catalog strings (`bigint`, `double`,
    * `string`, `timestamp_ntz`, …), lowercased. */
  def schemaCheck(df: DataFrame, expected: Seq[(String, String)]): DataFrame = {
    require(expected.nonEmpty, "expected schema must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val actual = df.schema.fields
      .map(f => f.name -> f.dataType.catalogString.toLowerCase).toMap
    val exp = expected.map { case (n, t) => (n, t.toLowerCase) }
    val expNames = exp.map(_._1).toSet
    val rows =
      exp.map { case (name, et) =>
        actual.get(name) match {
          case Some(at) if at == et => (name, et, at, "ok")
          case Some(at)             => (name, et, at, "type_mismatch")
          case None                 => (name, et, null.asInstanceOf[String], "missing")
        }
      } ++
      actual.toSeq.collect { case (name, at) if !expNames.contains(name) =>
        (name, null.asInstanceOf[String], at, "unexpected")
      }
    rows.toDF("column_name", "expected_type", "actual_type", "status")
      .orderBy("column_name")
  }

  /** Functional-dependency audit: does `determinant → dependent` hold —
    * i.e. is the dependent value constant within every determinant
    * group? Returns one row per candidate FD: total determinant keys,
    * how many keys map to ≥2 distinct dependent values, the worst key's
    * distinct count, and the violation rate. The discovery primitive
    * behind normalization checks ("is zip → city clean?"), merge-key
    * validation, and silent-denormalization drift alarms.
    *
    * Shape: ONE determinant-keyed aggregation per FD (partial-agg
    * friendly — `count(distinct)` within a key never sees the corpus),
    * then a ≤|keys|-row rollup to a single verdict row. Multiple FDs
    * over the same table run as separate aggregations but each stays a
    * single scan + one narrow (key, n_distinct) exchange. NULL
    * dependents count as a distinct value (a NULL among non-NULLs IS a
    * violation of determinism). */
  def functionalDependency(df: DataFrame, fdName: String,
      determinant: Seq[Column], dependent: Column, dp: Int = 6): DataFrame = {
    require(determinant.nonEmpty, "determinant must name at least one column")
    val keyCols = determinant.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val perKey = df
      .select(keyCols :+
        coalesce(dependent.cast("string"), lit("__fd_null__")).as("__d"): _*)
      .groupBy(determinant.indices.map(i => col(s"__k$i")): _*)
      .agg(countDistinct(col("__d")).as("__nd"))
    perKey.agg(
        count(lit(1L)).as("n_keys"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        max(col("__nd")).as("max_distinct_dependent"))
      .select(lit(fdName).as("fd"), col("n_keys"), col("n_violating_keys"),
        col("max_distinct_dependent"),
        round(col("n_violating_keys") / col("n_keys").cast("double"), dp)
          .as("violation_rate"),
        (col("n_violating_keys") === 0L).as("holds"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — [[kAnonymity]]'s
    * necessary complement: a group can hold ≥k rows yet expose its
    * members anyway when they all share ONE sensitive value (the
    * homogeneity attack k-anonymity cannot see). Counts, per
    * quasi-identifier group, the DISTINCT sensitive values, and reports
    * how many groups (and rows) fall below `l`. NULL sensitive values
    * count as one distinct value; NULL quasi combos group together —
    * same conventions as [[kAnonymity]].
    *
    * One quasi-keyed aggregate (count-distinct within the group — the
    * exchange carries the combo space, not the table), one 1-row
    * rollup: (n_rows, n_groups, min_diversity, n_weak_groups,
    * n_weak_rows, l_diverse). */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1L)).as("__n"),
        countDistinct(coalesce(sensitive.cast("string"), lit("__ld_null__")))
          .as("__d"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1L)).as("n_groups"),
        min(col("__d")).as("min_diversity"),
        sum(when(col("__d") < l, 1L).otherwise(0L)).as("n_weak_groups"),
        sum(when(col("__d") < l, col("__n")).otherwise(0L)).as("n_weak_rows"))
      .withColumn("l_diverse", col("n_weak_rows") === 0L)
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) — the
    * distributional complement of [[kAnonymity]]/[[lDiversity]]: even a
    * diverse equivalence class leaks when its SENSITIVE-value
    * distribution diverges from the table's (e.g. a class that is 90%
    * one diagnosis against a 10% base rate). Per quasi-identifier
    * class, the total-variation distance between the class's
    * categorical sensitive distribution and the global one:
    * `TVD = ½·(Σ_present |p_cs − p_s| + 1 − Σ_present p_s)` — the
    * absent-category mass folds in through the Σ-of-probabilities
    * identity, so no outer join against the category universe is
    * needed. NULL sensitive values are a category of their own (same
    * convention as lDiversity).
    *
    * Scale shape: one (class, value) rollup, one value rollup (the
    * category-cardinality-bounded broadcast side), one class rollup —
    * exchanges carry the class × category space, never the row count. */
  def tCloseness(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      t: Double, dp: Int = 6): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val qNames = quasi.indices.map(i => s"__q$i")
    val base = df.select(quasi.zip(qNames).map { case (c, n) => c.as(n) } :+
      coalesce(sensitive.cast("string"), lit("__tc_null__")).as("__s"): _*)
    val cell = base.groupBy(qNames.map(col) :+ col("__s"): _*)
      .agg(count(lit(1L)).as("__ncs"))
    val cls = cell.groupBy(qNames.map(col): _*).agg(sum(col("__ncs")).as("__nc"))
    val glob = cell.groupBy("__s").agg(sum(col("__ncs")).as("__ns"))
    val tot = cell.agg(sum(col("__ncs")).cast("double").as("__n"))
    val perClass = cell.join(cls, qNames)
      .join(broadcast(glob), Seq("__s"))
      .crossJoin(broadcast(tot))
      .groupBy(qNames.map(col): _*)
      .agg(max(col("__nc")).as("__size"),
        sum(abs(col("__ncs").cast("double") / col("__nc") -
          col("__ns").cast("double") / col("__n"))).as("__present"),
        sum(col("__ns").cast("double") / col("__n")).as("__covered"))
      .select(col("__size"),
        round((col("__present") + 1.0 - col("__covered")) / 2.0, dp).as("tvd"))
    perClass.agg(count(lit(1L)).as("n_classes"),
        round(max(col("tvd")), dp).as("max_tvd"),
        sum(when(col("tvd") > t, 1L).otherwise(0L)).as("n_violations"),
        sum(when(col("tvd") > t, col("__size")).otherwise(0L)).as("n_exposed_rows"))
      .withColumn("t_close", col("n_violations") === 0L)
  }

  /** Validity-interval integrity audit for SCD-2 / bitemporal tables:
    * per id (ordered by start), counts of OVERLAPS (next interval
    * starts before this one ends — two versions claim the same
    * instant), GAPS (next starts after this ends — an instant with no
    * version), and DEGENERATE intervals (end ≤ start). A clean history
    * tiles: every audit count zero. NULL end = open interval (+∞), so
    * an open interval with any successor is an overlap.
    *
    * One id-keyed window pass (lead) fused into a 1-row rollup —
    * interval-cardinality work, half-open [from, to) semantics. */
  def intervalAudit(df: DataFrame, id: Column, from: Column,
      to: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__id")).orderBy(col("__f"), col("__t"))
    val inf = lit(Long.MaxValue)
    df.select(id.as("__id"), from.cast("long").as("__f"),
        to.cast("long").as("__t"))
      .withColumn("__nf", lead(col("__f"), 1).over(w))
      .agg(count(lit(1L)).as("n_intervals"),
        countDistinct(col("__id")).as("n_ids"),
        sum(when(coalesce(col("__t"), inf) <= col("__f"), 1L).otherwise(0L))
          .as("n_degenerate"),
        sum(when(col("__nf") < coalesce(col("__t"), inf), 1L).otherwise(0L))
          .as("n_overlaps"),
        sum(when(col("__nf") > coalesce(col("__t"), inf), 1L).otherwise(0L))
          .as("n_gaps"))
      .withColumn("tiles_cleanly",
        col("n_degenerate") + col("n_overlaps") + col("n_gaps") === 0L)
  }
}
