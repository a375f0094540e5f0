package graft.report

import graft.exec.{CheckResult, TableResult}

/** HTML rendering of run results (reference Reports.scala:13-19,
  * ValidatorTable.generateHTMLReport): plain string building — the
  * offline resolver has no templating library, and the report is small
  * driver-side output. */
object HtmlReport {

  private def escape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def status(failed: Boolean): String =
    if (failed) """<span class="fail">FAIL</span>"""
    else """<span class="pass">PASS</span>"""

  private def checkHtml(c: CheckResult): String =
    s"""<tr><td>${escape(c.label)}</td><td>${status(c.failed)}</td>""" +
      s"""<td>${escape(c.message)}</td></tr>"""

  /** Per-row failure examples, like the reference's HTML report
    * (Reports.scala:13-19): key + offending columns of up to
    * numErrorsToReport rows that violated a failed check. */
  private def detailsHtml(t: TableResult): String =
    if (t.errorDetails.isEmpty) ""
    else {
      val cols = t.errorDetails.head.schema.fieldNames.toSeq
      val header = cols.map(c => s"<th>${escape(c)}</th>").mkString
      val body = t.errorDetails.map { r =>
        "<tr>" + cols.indices.map { i =>
          val v = if (r.isNullAt(i)) "NULL" else r.get(i).toString
          s"<td>${escape(v)}</td>"
        }.mkString + "</tr>"
      }.mkString
      s"""<h3>error details (${t.errorDetails.size})</h3>""" +
        s"""<table border="1" class="details"><tr>$header</tr>$body</table>"""
    }

  private def tableHtml(t: TableResult): String = {
    val timers = t.timings.toSeq.sortBy(_._1).map { case (l, ns) =>
      s"""<li class="timer">${escape(l)}: ${ns / 1000000} ms</li>"""
    }.mkString
    s"""<h2>${escape(t.table)} ${status(t.failed)}</h2>""" +
      s"""<p>rowCount: ${t.rowCount}, errorDetails: ${t.errorDetails.size}</p>""" +
      s"""<table border="1"><tr><th>check</th><th>status</th><th>message</th></tr>""" +
      t.results.map(checkHtml).mkString + "</table>" +
      detailsHtml(t) +
      s"""<ul class="timers">$timers</ul>"""
  }

  def report(tables: Seq[TableResult]): String = {
    val failed = tables.exists(_.failed)
    "<!DOCTYPE html><html><head><title>Validator Report</title><style>" +
      ".pass{color:green}.fail{color:red}table{border-collapse:collapse}" +
      "td,th{padding:4px 8px}</style></head><body>" +
      s"<h1>Validator Report ${status(failed)}</h1><hr/>" +
      tables.map(tableHtml).mkString +
      "</body></html>"
  }
}
