package graft.ops

import org.apache.spark.sql.DataFrame
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
}
