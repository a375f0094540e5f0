package graft.report

import graft.exec.{CheckResult, ColumnStats, TableResult}

/** Hand-rolled JSON rendering of run results (the offline resolver has no
  * JSON library beyond Spark's shaded Jackson; report shapes mirror the
  * reference's JSON report, ValidatorConfig.scala:73-90 / JsonUtils.scala). */
object JsonReport {

  def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(v: Any): String = v match {
    case null => "null"
    case s: String => esc(s)
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => render(n.toDouble)
    case d: Double =>
      if (d.isNaN || d.isInfinite) esc(d.toString) else d.toString
    case ColumnStats(cnt, mean, mn, mx, sd, hist) =>
      s"""{"count":$cnt,"mean":${render(mean)},"min":${render(mn)},"max":${render(mx)},""" +
        s""""stdDev":${render(sd)},"histogram":${render(hist)}}"""
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${esc(k.toString)}:${render(x)}" }.mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
    case other => esc(other.toString)
  }

  def checkJson(c: CheckResult): String =
    s"""{"label":${esc(c.label)},"failed":${c.failed},"message":${esc(c.message)},""" +
      s""""metrics":${render(c.metrics)}}"""

  def tableJson(t: TableResult): String =
    s"""{"table":${esc(t.table)},"rowCount":${t.rowCount},"failed":${t.failed},""" +
      s""""checks":[${t.results.map(checkJson).mkString(",")}],""" +
      s""""numErrorDetails":${t.errorDetails.size},""" +
      s""""timingsNs":${render(t.timings)}}"""

  /** Full-run report + the reference's status-line contract
    * (Main.scala:138-153). */
  def report(tables: Seq[TableResult]): String = {
    val failed = tables.exists(_.failed)
    s"""{"status":${esc(if (failed) "FAIL" else "PASS")},""" +
      s""""tables":[${tables.map(tableJson).mkString(",")}]}"""
  }

  def statusLine(tables: Seq[TableResult]): String =
    s"DATA_VALIDATOR_STATUS=${if (tables.exists(_.failed)) "FAIL" else "PASS"}"
}
