package graft

import graft.exec.Runner
import graft.model._
import graft.report.JsonReport

/** Report-shape parity: events + per-stage ns timers serialized like the
  * reference (ValidatorEvent.scala:52-109, ValidatorConfig.scala:73-90).
  * Timer durations are nondeterministic, so the golden compare normalizes
  * `durationNs` before matching. */
class ReportSpec extends SparkSuite {
  import spark.implicits._

  test("full report golden: settings, varSubDict, events, timers, error details") {
    val df = Seq(("k1", -5), ("k2", 3), ("k3", -1)).toDF("key", "v")
    val result = Runner.run(spark,
      TableSpec("demo", _ => df, checks = Seq(
        MinNumRows(10, "rowcount"),
        NegativeCheck("v", Some("1"), "neg_v"),
        ColumnMaxCheck("v", Bound.Num(3), "max_v"),
        UniqueCheck(Seq("key"), "uniq"))),
      detailedErrors = true, numErrorsToReport = 2, numKeyCols = 1)

    val got = JsonReport.fullReport(Seq(result),
      numKeyCols = 1, numErrorsToReport = 2, detailedErrors = true,
      varSubDict = Seq("env" -> "test"), sparkVersion = "X.Y.Z", master = "local[test]")
      .replaceAll("\"durationNs\":\\d+", "\"durationNs\":0")
      .replaceAll("\"scalaVersion\":\"[^\"]+\"", "\"scalaVersion\":\"S\"")
      .replaceAll("\"javaVersion\":\"[^\"]+\"", "\"javaVersion\":\"J\"")

    val expected =
      """{"status":"FAIL","failed":true,"numKeyCols":1,"numErrorsToReport":2,""" +
        """"detailedErrors":true,"varSubDict":{"env":"test"},""" +
        """"buildInfo":{"name":"datavalidatorspark","version":"0.1.0","scalaVersion":"S",""" +
        """"sparkVersion":"X.Y.Z","javaVersion":"J"},""" +
        """"runtimeInfo":{"master":"local[test]"},""" +
        """"tables":[{"table":"demo","rowCount":3,"failed":true,"checks":[""" +
        """{"label":"rowcount","failed":true,"message":"rowCount 3 < 10 (70.00% short)",""" +
        """"metrics":{"rowCount":3,"minNumRows":10,"relativeErrorPct":70.0},""" +
        """"events":[{"type":"columnBasedCheckEvent","failed":true,""" +
        """"data":{"rowCount":"3","minNumRows":"10","relativeErrorPct":"70.0"},""" +
        """"msg":"rowCount 3 < 10 (70.00% short)"}]},""" +
        """{"label":"neg_v","failed":true,"message":"neg_v failed: 2 errors > limit 1",""" +
        """"metrics":{"errorCount":2,"errorLimit":1,"column":"v"},""" +
        """"events":[{"type":"counter","name":"errorCount","value":2},""" +
        """{"type":"counter","name":"errorCountThreshold","value":1},""" +
        """{"type":"checkEvent","failed":true,"label":"neg_v","errorCount":2}]},""" +
        """{"label":"max_v","failed":false,"message":"columnMaxCheck ok: max = 3.0",""" +
        """"metrics":{"column":"v","actual":3},""" +
        """"events":[{"type":"columnBasedCheckEvent","failed":false,""" +
        """"data":{"column":"v","actual":"3"},"msg":"columnMaxCheck ok: max = 3.0"}]},""" +
        """{"label":"uniq","failed":false,""" +
        """"message":"uniqueCheck(key): 0 duplicated key combinations",""" +
        """"metrics":{"columns":["key"],"duplicatedKeys":0},""" +
        """"events":[{"type":"columnBasedCheckEvent","failed":false,""" +
        """"data":{"columns":"List(key)","duplicatedKeys":"0"},""" +
        """"msg":"uniqueCheck(key): 0 duplicated key combinations"}]}],""" +
        """"numErrorDetails":2,"events":[""" +
        """{"type":"timer","label":"errorDetails","durationNs":0},""" +
        """{"type":"timer","label":"quickPass","durationNs":0},""" +
        """{"type":"timer","label":"unique_uniq","durationNs":0},""" +
        """{"type":"quickCheckError","row":{"key":"k1","v":-5}},""" +
        """{"type":"quickCheckError","row":{"key":"k3","v":-1}}]}]}"""

    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("HTML report renders status, checks and timers with escaping") {
    val df = Seq(("k<1>", -5)).toDF("key", "v")
    val result = Runner.run(spark, TableSpec("t&demo", _ => df,
      checks = Seq(NegativeCheck("v", None, "neg"))))
    val html = graft.report.HtmlReport.report(Seq(result))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("t&amp;demo"))                       // escaping
    assert(html.contains("""<span class="fail">FAIL</span>""")) // verdict
    assert(html.contains("neg"))
    assert(html.contains("""class="timer""""))
    // per-row failure examples (reference Reports.scala:13-19): the
    // offending row appears, keys escaped, under an error-details table
    assert(html.contains("error details (1)"))
    assert(html.contains("""<table border="1" class="details">"""))
    assert(html.contains("<th>key</th>") && html.contains("<th>v</th>"))
    assert(html.contains("<td>k&lt;1&gt;</td>") && html.contains("<td>-5</td>"))
  }

  test("report is valid JSON (spot-parse with Spark's JSON reader)") {
    val df = Seq(("a", 1)).toDF("key", "v")
    val result = Runner.run(spark, TableSpec("t", _ => df,
      checks = Seq(NullCheck("v", None, "nulls"), ColStats("v", "stats"))))
    val json = JsonReport.fullReport(Seq(result), 2, 10, detailedErrors = true, Nil)
    val parsed = spark.read.json(Seq(json).toDS())
    assert(parsed.columns.contains("tables"))
    assert(parsed.select("status").head().getString(0) == "PASS")
  }
}
