package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-table column profiling in ONE scan — the generalization of the
  * check engine's per-column colstats pass (exec/Runner.scala's 2-pass
  * numeric stats; reference: ColumnBased.scala's per-check aggregates)
  * to every column at once: the "what is this table" first query of any
  * data intake.
  *
  * For each profiled column: row count, null count, APPROXIMATE distinct
  * cardinality (HLL — mergeable partial aggregation, the only sane
  * distinct at 100 TB), numeric min/max (numeric columns), and
  * min/max string length (string columns).
  *
  * Scale shape: every statistic is a partially-aggregated scalar, so the
  * whole profile is ONE fused scan + a 1-row exchange regardless of
  * table width or size — never a per-column pass, never a raw-value
  * shuffle. The single wide row then unpivots to one row per column via
  * inline() at zero extra cost (it is 1 row).
  */
object Profiler {

  /** Profile `columns` (default: all top-level columns) of `df`.
    * Output: (column, n_rows, n_nulls, n_distinct_est, min_num,
    * max_num, min_len, max_len), one row per column in the given
    * order; type-inapplicable stats are NULL. */
  def profileTable(df: DataFrame, columns: Seq[String] = Nil,
      rsd: Double = 0.02): DataFrame = {
    val names = if (columns.nonEmpty) columns else df.schema.fields.map(_.name).toSeq
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    names.foreach(n => require(byName.contains(n), s"no such column: $n"))

    def isNum(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }

    val aggs = Seq(count(lit(1L)).as("__n")) ++ names.zipWithIndex.flatMap {
      case (c, i) =>
        val base = Seq(
          count(col(c)).as(s"__nn$i"),
          approx_count_distinct(col(c), rsd).as(s"__d$i"))
        val num =
          if (isNum(byName(c)))
            Seq(min(col(c)).cast("double").as(s"__mn$i"),
              max(col(c)).cast("double").as(s"__mx$i"))
          else Seq(lit(null).cast("double").as(s"__mn$i"),
            lit(null).cast("double").as(s"__mx$i"))
        val len = byName(c) match {
          case StringType =>
            Seq(min(length(col(c))).as(s"__ln$i"),
              max(length(col(c))).as(s"__lx$i"))
          case _ => Seq(lit(null).cast("int").as(s"__ln$i"),
            lit(null).cast("int").as(s"__lx$i"))
        }
        base ++ num ++ len
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn$i")).as("n_nulls"),
        col(s"__d$i").as("n_distinct_est"),
        col(s"__mn$i").as("min_num"), col(s"__mx$i").as("max_num"),
        col(s"__ln$i").as("min_len"), col(s"__lx$i").as("max_len"))
    }
    wide.select(inline(array(rows: _*)))
  }

  /** Dataset-card manifest: the per-source composition summary every
    * released training corpus ships (datasheet/data-statement
    * practice): rows, corpus share, whitespace-token and char volume,
    * the source's dominant language with its share, and the
    * exact-duplicate rate within the source — the at-a-glance answers
    * to "what is in this mix and how clean is it".
    *
    * Shape: one (source, lang)-keyed aggregation carries counts/tokens/
    * chars (everything per-source then re-aggregates from the tiny cell
    * table), plus one separate source-keyed DISTINCT for the dup rate —
    * distinct texts cannot be summed across language cells (the same
    * text under two langs would double-count). Both exchanges ship
    * digests/counts, never text. */
  def datasetCard(docs: DataFrame, sourceCol: String, langCol: String,
      textCol: String, dp: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1L)).as("__n"),
        sum(size(graft.functions.TextFunctions.tokensWs(col(textCol)))
          .cast("long")).as("__toks"),
        sum(length(col(textCol)).cast("long")).as("__chars"))
    val uniq = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(countDistinct(md5(col(textCol))).as("__uniq"))
    val perSrc = Window.partitionBy(col("source"))
    val all = Window.partitionBy()
    val top = Window.partitionBy(col("source"))
      .orderBy(col("__n").desc, col("lang").asc)
    cells
      .withColumn("__rn", row_number().over(top))
      .withColumn("n_docs", sum(col("__n")).over(perSrc))
      .withColumn("__src_toks", sum(col("__toks")).over(perSrc))
      .withColumn("__src_chars", sum(col("__chars")).over(perSrc))
      .withColumn("__total", sum(col("__n")).over(all))
      .where(col("__rn") === 1)
      .join(uniq, "source")
      .select(col("source"), col("n_docs"),
        round(col("n_docs") / col("__total").cast("double"), dp)
          .as("corpus_share"),
        col("__src_toks").as("ws_tokens"), col("__src_chars").as("n_chars"),
        col("lang").as("top_lang"),
        round(col("__n") / col("n_docs").cast("double"), dp)
          .as("top_lang_share"),
        round(lit(1.0) - col("__uniq") / col("n_docs").cast("double"), dp)
          .as("exact_dup_rate"))
  }

  /** Null-pattern mining: rows grouped by their null SIGNATURE across
    * `cols` (a 0/1 string, column order as given) — which columns go
    * missing TOGETHER. Per-column null counts (what [[profileTable]]
    * reports) hide structure: "phone and email are null jointly in 30%
    * of rows" is an ingestion-path bug signature, not two independent
    * gaps. One signature-keyed aggregate (≤2^|cols| cells). */
  def nullPatterns(df: DataFrame, cols: Seq[String], dp: Int = 6): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    import org.apache.spark.sql.expressions.Window
    val sig = concat(cols.map(c =>
      when(col(c).isNull, lit("1")).otherwise(lit("0"))): _*)
    val per = df.select(sig.as("null_pattern"))
      .groupBy("null_pattern").agg(count(lit(1L)).as("n_rows"))
    val tot = Window.partitionBy()
    per.select(col("null_pattern"), col("n_rows"),
      round(col("n_rows") / sum(col("n_rows")).over(tot).cast("double"), dp)
        .as("share"))
  }

  /** Schema inference for a semi-structured JSON string column: per
    * top-level key, presence coverage, distinct-value count, and the
    * observed TYPE mix (int/float/bool/null/nested/string, classified
    * from the parsed scalar text) — what you read before promoting an
    * event-properties blob into typed columns. Unparseable rows are
    * counted separately (`from_json` → NULL map), never silently
    * dropped into the key stats.
    *
    * Scale shape: one scan parses + explodes the map (no per-key
    * re-extraction jobs); the single rollup is keyed by the key space,
    * not the row count. */
  def jsonKeyProfile(df: DataFrame, c: Column, dp: Int = 6): DataFrame = {
    val parsed = df.select(c.as("__raw"),
      from_json(c, MapType(StringType, StringType)).as("__m"))
    val totals = parsed.agg(
      count(lit(1L)).as("__n"),
      sum(when(col("__raw").isNotNull && col("__m").isNull, 1L)
        .otherwise(0L)).as("__bad"))
    val kv = parsed.where(col("__m").isNotNull)
      .select(explode(col("__m")).as(Seq("key", "__v")))
    val cls = when(col("__v").isNull, "null")
      .when(col("__v").rlike("^-?[0-9]+$"), "int")
      .when(col("__v").rlike("^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$"), "float")
      .when(col("__v").isin("true", "false"), "bool")
      .when(col("__v").rlike("^[\\[{]"), "nested")
      .otherwise("string")
    kv.withColumn("__c", cls)
      .groupBy("key")
      .agg(count(lit(1L)).as("n_present"),
        countDistinct(col("__v")).as("n_distinct"),
        sum(when(col("__c") === "int", 1L).otherwise(0L)).as("n_int"),
        sum(when(col("__c") === "float", 1L).otherwise(0L)).as("n_float"),
        sum(when(col("__c") === "bool", 1L).otherwise(0L)).as("n_bool"),
        sum(when(col("__c") === "null", 1L).otherwise(0L)).as("n_null"),
        sum(when(col("__c") === "nested", 1L).otherwise(0L)).as("n_nested"),
        sum(when(col("__c") === "string", 1L).otherwise(0L)).as("n_string"))
      .crossJoin(broadcast(totals))
      .select(col("key"), col("n_present"),
        round(col("n_present") / col("__n").cast("double"), dp)
          .as("coverage"),
        col("n_distinct"), col("n_int"), col("n_float"), col("n_bool"),
        col("n_null"), col("n_nested"), col("n_string"),
        col("__bad").as("n_unparseable"))
      .orderBy("key")
  }
}
