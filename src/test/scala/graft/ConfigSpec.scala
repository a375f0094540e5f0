package graft

import graft.config._
import graft.exec.Runner
import graft.model._

/** Config parsing, variable substitution and the CLI contract — mirrors
  * the reference's ConfigParserSpec / VarSubstitutionSpec / ConfigVarSpec
  * shapes on our snakeyaml-based layer. */
class ConfigSpec extends SparkSuite {

  private val fullYaml =
    s"""numKeyCols: 2
       |numErrorsToReport: 742
       |email:
       |  smtpHost: smtpHost
       |  subject: subject
       |  from: from
       |  to:
       |   - to
       |detailedErrors: true
       |vars:
       |  - name: foo
       |    value: bar
       |outputs:
       |  - filename: /tmp/graft_sample.json
       |  - pipe: cat > /dev/null
       |    ignoreError: true
       |tables:
       |  - db: foo
       |    table: bar
       |    keyColumns:
       |      - one
       |      - two
       |    checks:
       |      - type: rowCount
       |        minNumRows: 10294
       |      - type: nullCheck
       |        column: mdse_item_i
       |  - orcFile: LocalFile.orc
       |    condition: "foo < 10"
       |    checks:
       |      - type: nullCheck
       |        column: start_d
       |  - parquetFile: LocFile.parquet
       |    condition: "bar < 10"
       |    checks:
       |      - type: nullCheck
       |        column: end_d
       |  - format: llama
       |    checks:
       |      - type: nullCheck
       |        column: start_d
       |    options:
       |      key: value
       |    loadData:
       |      - data.llama
       |""".stripMargin

  test("full config round-trips to the typed model (all 4 source kinds)") {
    val cfg = ConfigParser.parse(fullYaml).fold(e => fail(e.mkString("; ")), identity)
    assert(cfg.numKeyCols == 2)
    assert(cfg.numErrorsToReport == 742)
    assert(cfg.detailedErrors)
    assert(cfg.email.contains(EmailConfig("smtpHost", "subject", "from", Seq("to"))))
    assert(cfg.vars == Seq(VarValue("foo", CVal.CStr("bar"))))
    assert(cfg.outputs == Seq(
      FileOutput("/tmp/graft_sample.json", append = false),
      PipeOutput("cat > /dev/null", ignoreError = true)))
    assert(cfg.tables.map(_.source) == Seq(
      HiveSource("foo", "bar"), OrcSource("LocalFile.orc"),
      ParquetSource("LocFile.parquet"),
      FormatSource("llama", Map("key" -> "value"), Seq("data.llama"))))
    assert(cfg.tables.head.keyColumns.contains(Seq("one", "two")))
    assert(cfg.tables.head.checks == Seq(
      MinNumRows(10294, "rowcount"), NullCheck("mdse_item_i", None, "nullcheck_mdse_item_i")))
    assert(cfg.tables(1).condition.contains("foo < 10"))
  }

  test("all ten check types decode with reference field names") {
    val yaml =
      """numKeyCols: 1
        |numErrorsToReport: 10
        |tables:
        |  - parquetFile: f.parquet
        |    checks:
        |      - { type: rowCount, minNumRows: 5 }
        |      - { type: nullCheck, column: a, threshold: "10%" }
        |      - { type: negativeCheck, column: b }
        |      - { type: rangeCheck, column: c, minValue: 0, maxValue: 10, inclusive: true }
        |      - { type: rangeCheck, column: c2, minValue: "`other" }
        |      - { type: stringLengthCheck, column: d, minLength: 1, maxLength: 8 }
        |      - { type: stringRegexCheck, column: e, regex: "^x" }
        |      - { type: columnMaxCheck, column: f, value: 42 }
        |      - { type: columnSumCheck, column: g, minValue: 1.5 }
        |      - { type: uniqueCheck, columns: [k1, k2] }
        |      - { type: colstats, column: h }
        |""".stripMargin
    val cfg = ConfigParser.parse(yaml).fold(e => fail(e.mkString("; ")), identity)
    val checks = cfg.tables.head.checks
    assert(checks == Seq(
      MinNumRows(5, "rowcount"),
      NullCheck("a", Some("10%"), "nullcheck_a"),
      NegativeCheck("b", None, "negcheck_b"),
      RangeCheck("c", Some(Bound.Num(0)), Some(Bound.Num(10)), inclusive = true, None, "rangecheck_c"),
      RangeCheck("c2", Some(Bound.Ref("other")), None, inclusive = false, None, "rangecheck_c2"),
      StringLengthCheck("d", Some(1), Some(8), None, "strlen_d"),
      StringRegexCheck("e", "^x", None, "regex_e"),
      ColumnMaxCheck("f", Bound.Num(42), "colmax_f"),
      ColumnSumCheck("g", Some(1.5), None, inclusive = false, "colsum_g"),
      UniqueCheck(Seq("k1", "k2"), "unique_k1_k2"),
      ColStats("h", "colstats_h")))
  }

  test("same-column same-type checks get uniquified labels") {
    val yaml =
      """numKeyCols: 1
        |numErrorsToReport: 10
        |tables:
        |  - parquetFile: f.parquet
        |    checks:
        |      - { type: nullCheck, column: a }
        |      - { type: nullCheck, column: a, threshold: "1" }
        |""".stripMargin
    val cfg = ConfigParser.parse(yaml).fold(e => fail(e.mkString("; ")), identity)
    assert(cfg.tables.head.checks.map(_.label) == Seq("nullcheck_a", "nullcheck_a_2"))
  }

  test("label uniquification survives a derived-label collision (a, a, a_2)") {
    val yaml =
      """numKeyCols: 1
        |numErrorsToReport: 10
        |tables:
        |  - parquetFile: f.parquet
        |    checks:
        |      - { type: nullCheck, column: a }
        |      - { type: nullCheck, column: a }
        |      - { type: nullCheck, column: a_2 }
        |""".stripMargin
    val cfg = ConfigParser.parse(yaml).fold(e => fail(e.mkString("; ")), identity)
    val labels = cfg.tables.head.checks.map(_.label)
    assert(labels.distinct.size == labels.size, s"labels collide: $labels")
  }

  test("present-but-mistyped check fields are errors, not silently dropped bounds") {
    val errs = ConfigParser.parse(
      """numKeyCols: 1
        |numErrorsToReport: 10
        |tables:
        |  - parquetFile: f.parquet
        |    checks:
        |      - { type: stringLengthCheck, column: d, minLength: 2.5, maxLength: 8 }
        |""".stripMargin).left.getOrElse(fail("expected errors"))
    assert(errs.exists(_.contains("'minLength' must be an integer")), errs.mkString("; "))
  }

  test("variable substitution: $var, ${var}, typed whole-string, interpolation") {
    val yaml =
      """numKeyCols: 1
        |numErrorsToReport: 10
        |vars:
        |  - name: minRows
        |    value: 42
        |  - name: col
        |    value: acct
        |tables:
        |  - parquetFile: $col.parquet
        |    condition: "${col}_bal < 10"
        |    checks:
        |      - { type: rowCount, minNumRows: $minRows }
        |      - { type: nullCheck, column: $col }
        |""".stripMargin
    val cfg = ConfigParser.parse(yaml).fold(e => fail(e.mkString("; ")), identity)
    assert(cfg.tables.head.source == ParquetSource("acct.parquet"))
    assert(cfg.tables.head.condition.contains("acct_bal < 10"))
    // $minRows was a whole-string reference to a NUMBER — typed replacement
    assert(cfg.tables.head.checks.head == MinNumRows(42, "rowcount"))
    assert(cfg.tables.head.checks(1) == NullCheck("acct", None, "nullcheck_acct"))
  }

  test("vars: env, shell and sql kinds resolve; cli-provided vars are usable") {
    val yaml =
      """numKeyCols: 1
        |numErrorsToReport: 10
        |vars:
        |  - name: home
        |    env: HOME
        |  - name: shellvar
        |    shell: echo hello
        |  - name: sqlvar
        |    sql: SELECT 41 + 1
        |tables:
        |  - parquetFile: $home/$shellvar/$sqlvar/$clivar.parquet
        |    checks:
        |      - { type: rowCount, minNumRows: 1 }
        |""".stripMargin
    val cfg = ConfigParser.parse(yaml, Map("clivar" -> "cli_value"), Some(spark))
      .fold(e => fail(e.mkString("; ")), identity)
    val home = sys.env("HOME")
    assert(cfg.tables.head.source == ParquetSource(s"$home/hello/42/cli_value.parquet"))
  }

  test("undefined variable, duplicate definition and self-reference are errors") {
    def errsOf(yaml: String): Seq[String] =
      ConfigParser.parse(yaml).left.getOrElse(fail("expected errors"))
    assert(errsOf(
      """numKeyCols: 1
        |numErrorsToReport: 1
        |tables:
        |  - parquetFile: $nope.parquet
        |    checks: [{ type: rowCount, minNumRows: 1 }]
        |""".stripMargin).exists(_.contains("undefined variable 'nope'")))
    assert(errsOf(
      """numKeyCols: 1
        |numErrorsToReport: 1
        |vars:
        |  - { name: a, value: one }
        |  - { name: a, value: two }
        |tables:
        |  - parquetFile: f.parquet
        |    checks: [{ type: rowCount, minNumRows: 1 }]
        |""".stripMargin).exists(_.contains("already defined")))
    assert(errsOf(
      """numKeyCols: 1
        |numErrorsToReport: 1
        |vars:
        |  - { name: a, value: $b }
        |tables:
        |  - parquetFile: f.parquet
        |    checks: [{ type: rowCount, minNumRows: 1 }]
        |""".stripMargin).exists(_.contains("may not reference")))
  }

  test("parse errors are accumulated, not first-only") {
    val errs = ConfigParser.parse(
      """numKeyCols: 1
        |tables:
        |  - parquetFile: f.parquet
        |    checks:
        |      - { type: wrongType, column: a }
        |      - { type: nullCheck }
        |""".stripMargin).left.getOrElse(fail("expected errors"))
    assert(errs.exists(_.contains("numErrorsToReport")))
    assert(errs.exists(_.contains("unknown check type 'wrongType'")))
    assert(errs.exists(_.contains("nullCheck needs 'column'")))
  }

  test("config file end-to-end: same results as the programmatic TableSpec") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toFile
    val cfgFile = new java.io.File(dir, "conf.yaml")
    val reportFile = new java.io.File(dir, "report.json")
    val yaml =
      s"""numKeyCols: 2
         |numErrorsToReport: 5
         |vars:
         |  - name: sf
         |    value: "$sf0001"
         |tables:
         |  - parquetFile: $$sf/customer.parquet
         |    condition: "c_custkey <= 100"
         |    checks:
         |      - { type: rowCount, minNumRows: 1000 }
         |      - { type: nullCheck, column: c_name }
         |      - { type: negativeCheck, column: c_acctbal }
         |""".stripMargin
    java.nio.file.Files.writeString(cfgFile.toPath, yaml)

    val cfg = ConfigParser.parseFile(cfgFile.getPath, Map.empty, Some(spark))
      .fold(e => fail(e.mkString("; ")), identity)
    val fromConfig = Runner.run(spark, cfg.tables.head.toTableSpec,
      cfg.detailedErrors, cfg.numErrorsToReport, cfg.numKeyCols)

    val programmatic = Runner.run(spark, TableSpec("t",
      s => s.read.parquet(s"$sf0001/customer.parquet"),
      condition = Some("c_custkey <= 100"),
      checks = Seq(MinNumRows(1000, "rowcount"),
        NullCheck("c_name", None, "nullcheck_c_name"),
        NegativeCheck("c_acctbal", None, "negcheck_c_acctbal"))),
      numErrorsToReport = 5)

    assert(fromConfig.rowCount == programmatic.rowCount)
    assert(fromConfig.results.map(r => (r.label, r.failed, r.metrics.get("errorCount"))) ==
      programmatic.results.map(r => (r.label, r.failed, r.metrics.get("errorCount"))))
    assert(fromConfig.failed) // rowCount 100 < 1000

    // CLI contract: report written, FAIL status, non-fatal
    val (fatal, validatorFail, report) = Main.run(spark,
      Main.Cli(config = cfgFile.getPath, jsonReport = Some(reportFile.getPath)))
    assert(!fatal)
    assert(validatorFail)
    assert(report.exists(_.contains("\"rowcount\"")))
    val written = java.nio.file.Files.readString(reportFile.toPath)
    assert(written.contains("\"status\":\"FAIL\""))
  }

  test("configCheck path: bad column in config is fatal, no checks run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg2").toFile
    val cfgFile = new java.io.File(dir, "conf.yaml")
    java.nio.file.Files.writeString(cfgFile.toPath,
      s"""numKeyCols: 2
         |numErrorsToReport: 5
         |tables:
         |  - parquetFile: $sf0001/customer.parquet
         |    checks:
         |      - { type: nullCheck, column: no_such_column }
         |""".stripMargin)
    val (fatal, validatorFail, report) = Main.run(spark, Main.Cli(config = cfgFile.getPath))
    assert(fatal)
    assert(!validatorFail)
    assert(report.isEmpty)
  }

  test("lint mode validates structure without executing shell/sql vars") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lint").toFile
    val canary = new java.io.File(dir, "canary")
    val cfgFile = new java.io.File(dir, "conf.yaml")
    java.nio.file.Files.writeString(cfgFile.toPath,
      s"""numKeyCols: 1
         |numErrorsToReport: 1
         |vars:
         |  - { name: sideeffect, shell: "touch ${canary.getPath}" }
         |  - { name: needsspark, sql: "SELECT 1" }
         |tables:
         |  - parquetFile: $$sideeffect/$$needsspark.parquet
         |    checks: [{ type: rowCount, minNumRows: 1 }]
         |""".stripMargin)
    val linted = ConfigParser.parseFile(cfgFile.getPath, lint = true)
    assert(linted.isRight, linted.left.getOrElse(Nil).mkString("; "))
    assert(!canary.exists(), "lint mode executed a shell command")
    // and a broken config still fails lint
    java.nio.file.Files.writeString(cfgFile.toPath, "numKeyCols: 1\n")
    assert(ConfigParser.parseFile(cfgFile.getPath, lint = true).isLeft)
  }

  test("configCheck reports missing keyColumns") {
    val spec = model.TableSpec("t",
      s => s.read.parquet(s"$sf0001/customer.parquet"),
      keyColumns = Some(Seq("c_custkey", "no_such_col")),
      checks = Seq(model.NullCheck("c_name")))
    val errs = exec.Runner.configCheck(spark, spec)
    assert(errs.exists(_.contains("key column 'no_such_col' not found")), errs.mkString("; "))
  }

  test("missing config file is fatal, not a crash") {
    val (fatal, validatorFail, report) = Main.run(spark,
      Main.Cli(config = "/no/such/config.yaml"))
    assert(fatal && !validatorFail && report.isEmpty)
  }

  test("Main.parseArgs: flags, vars, errors") {
    assert(Main.parseArgs(Seq("--config", "c.yaml", "--exitErrorOnFail")) ==
      Right(Main.Cli(config = "c.yaml", exitErrorOnFail = true)))
    assert(Main.parseArgs(Seq("--config", "c.yaml", "--vars", "a=1,b=two")) ==
      Right(Main.Cli(config = "c.yaml", vars = Map("a" -> "1", "b" -> "two"))))
    assert(Main.parseArgs(Seq()).isLeft)
    assert(Main.parseArgs(Seq("--config", "c.yaml", "--vars", "novalue")).isLeft)
    assert(Main.parseArgs(Seq("--bogus")).isLeft)
  }

  test("pipe output delivers the report to a program's stdin") {
    val f = java.nio.file.Files.createTempFile("graft_pipe", ".json")
    val r = report.ReportIO.pipe(s"cat > $f", "{\"piped\":true}")
    assert(r.isRight)
    assert(java.nio.file.Files.readString(f).contains("\"piped\":true"))
    // non-zero exit: error unless ignoreError
    assert(report.ReportIO.pipe("exit 3", "x").isLeft)
    assert(report.ReportIO.pipe("exit 3", "x", ignoreError = true).isRight)
  }

  test("report file append concatenates runs") {
    val f = java.nio.file.Files.createTempFile("graft_report", ".json")
    java.nio.file.Files.delete(f)
    report.ReportIO.writeFile(spark, f.toString, "{\"run\":1}", append = true)
    report.ReportIO.writeFile(spark, f.toString, "{\"run\":2}", append = true)
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size() == 2)
    assert(lines.get(0).contains("\"run\":1") && lines.get(1).contains("\"run\":2"))
  }

  test("pre-flight writability: good paths pass, impossible paths are diagnosed") {
    // creatable: missing file under an existing writable dir
    assert(report.ReportIO.canAppendOrCreate(spark, "/tmp/graft_preflight_new.json").isRight)
    // creatable through a missing subdir whose nearest ancestor is writable
    assert(report.ReportIO.canAppendOrCreate(spark,
      "/tmp/graft_preflight_missing_dir/sub/report.json").isRight)
    // appendable: existing file
    val f = java.nio.file.Files.createTempFile("graft_preflight", ".json")
    assert(report.ReportIO.canAppendOrCreate(spark, f.toString).isRight)
    // impossible: an existing FILE as ancestor (robust even when running
    // as root, which bypasses permission bits on the local FS)
    val under = s"$f/sub/report.json"
    val err = report.ReportIO.canAppendOrCreate(spark, under).left.getOrElse(fail("expected Left"))
    assert(err.contains("not writable"))
    // a directory as the report path is rejected
    assert(report.ReportIO.canAppendOrCreate(spark, "/tmp").isLeft)
  }

  test("bad output path fails fast: fatal BEFORE any check executes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_preflight_cfg").toFile
    val cfgFile = new java.io.File(dir, "conf.yaml")
    val f = java.nio.file.Files.createTempFile("graft_blocker", ".txt")
    val yaml =
      s"""numKeyCols: 2
         |numErrorsToReport: 5
         |outputs:
         |  - filename: $f/cannot/create/report.json
         |tables:
         |  - parquetFile: $sf0001/customer.parquet
         |    checks:
         |      - { type: rowCount, minNumRows: 1 }
         |""".stripMargin
    java.nio.file.Files.writeString(cfgFile.toPath, yaml)
    val (fatal, validatorFail, reportJson) = Main.run(spark, Main.Cli(config = cfgFile.getPath))
    assert(fatal)
    assert(!validatorFail)
    // report is None: the run aborted before the check phase, not after it
    assert(reportJson.isEmpty)
  }

  test("env-var taxonomy: present / unset / inaccessible / error are distinct") {
    import VarSub._
    assert(readEnv("X", _ => "v") == EnvPresent("v"))
    assert(readEnv("X", _ => null) == EnvUnset)
    assert(readEnv("X", _ => throw new SecurityException("denied"))
      .isInstanceOf[EnvInaccessible])
    assert(readEnv("X", _ => throw new IllegalStateException("boom"))
      .isInstanceOf[EnvError])

    def errOf(get: String => String): String = {
      val vs = new VarSub(get)
      vs.resolve(null, VarEnv("v", "NAME"))
      vs.errors.mkString("; ")
    }
    assert(errOf(_ => null).contains("not set"))
    assert(errOf(_ => throw new SecurityException("no")).contains("inaccessible"))
    assert(errOf(_ => throw new IllegalStateException("io")).contains("failed"))
    val ok = new VarSub(_ => "val")
    ok.resolve(null, VarEnv("v", "NAME"))
    assert(ok.errors.isEmpty && ok.entries == Seq("v" -> CVal.CStr("val")))
  }

  test("multiple undefined variables in one env/shell/sql source: all reported, none stale") {
    val vs = new VarSub
    vs.resolve(null, VarShell("x", "echo $a and $b"))
    assert(vs.errors.size == 1, s"expected one combined error, got: ${vs.errors}")
    assert(vs.errors.head.contains("'a'") && vs.errors.head.contains("'b'"))
  }

  test("mistyped keyColumns and email recipients are errors, not silent drops") {
    def errsOf(yaml: String): Seq[String] =
      ConfigParser.parse(yaml).left.getOrElse(fail("expected errors"))
    val base =
      """numKeyCols: 1
        |numErrorsToReport: 1
        |tables:
        |  - parquetFile: f.parquet
        |    keyColumns: %s
        |    checks: [{ type: rowCount, minNumRows: 1 }]
        |""".stripMargin
    assert(errsOf(base.format("notalist"))
      .exists(_.contains("'keyColumns' must be a list")))
    assert(errsOf(base.format("[ok, 42]"))
      .exists(_.contains("'keyColumns' entries must be strings")))
    val emailYaml =
      """numKeyCols: 1
        |numErrorsToReport: 1
        |email:
        |  smtpHost: h
        |  subject: s
        |  from: f
        |  to: [a@b.c, 7]
        |tables:
        |  - parquetFile: f.parquet
        |    checks: [{ type: rowCount, minNumRows: 1 }]
        |""".stripMargin
    assert(errsOf(emailYaml).exists(_.contains("'to' entries must be strings")))
  }

  test("committed flagship config parses: the CLI smoke's YAML cannot rot") {
    // scripts/flagship_smoke.sh drives configs/flagship.yaml through the
    // real CLI process; this guard keeps the committed YAML structurally
    // valid under plain `sbt test` (same CLI vars the script passes)
    val cliVars = Map("sf" -> "/sf", "fixdir" -> "/fix", "out" -> "/tmp", "minKey" -> "0")
    val cfg = ConfigParser.parseFile("configs/flagship.yaml", cliVars, lint = true)
      .fold(e => fail(e.mkString("; ")), identity)
    assert(cfg.tables.size == 3)
    assert(cfg.tables.map(_.source.getClass.getSimpleName) ==
      Seq("ParquetSource", "OrcSource", "FormatSource"))
    assert(cfg.outputs.size == 2)
    assert(cfg.tables.flatMap(_.checks).size == 9)
  }

  test("flagship config run: vars + two tables + file/pipe/html outputs in one pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flagship").toFile
    val cfgFile = new java.io.File(dir, "conf.yaml")
    val jsonOut = new java.io.File(dir, "report.json")
    val htmlOut = new java.io.File(dir, "report.html")
    val pipeOut = new java.io.File(dir, "piped.json")
    val yaml =
      s"""numKeyCols: 2
         |numErrorsToReport: 3
         |detailedErrors: true
         |vars:
         |  - name: sf
         |    value: "$sf0001"
         |  - name: home
         |    env: HOME
         |outputs:
         |  - filename: ${jsonOut.getPath}
         |  - pipe: cat > ${pipeOut.getPath}
         |tables:
         |  - parquetFile: $$sf/customer.parquet
         |    keyColumns: [c_custkey]
         |    checks:
         |      - { type: rowCount, minNumRows: 1 }
         |      - { type: negativeCheck, column: c_acctbal }
         |  - parquetFile: $$sf/lineitem.parquet
         |    condition: "l_quantity <= 50"
         |    checks:
         |      - { type: rowCount, minNumRows: 100 }
         |      - { type: stringRegexCheck, column: l_returnflag, regex: "^[ANR]$$" }
         |      - { type: uniqueCheck, columns: [l_orderkey, l_linenumber] }
         |""".stripMargin
    java.nio.file.Files.writeString(cfgFile.toPath, yaml)

    val (fatal, validatorFail, reportJson) = Main.run(spark,
      Main.Cli(config = cfgFile.getPath, htmlReport = Some(htmlOut.getPath)))
    assert(!fatal)
    // customer.c_acctbal has negatives in the testdata → FAIL is expected,
    // carried as validatorFail (exit -1 only with --exitErrorOnFail)
    assert(validatorFail)
    val json = reportJson.getOrElse(fail("no report"))
    // all sinks delivered the same report
    assert(java.nio.file.Files.readString(jsonOut.toPath).trim == json.trim)
    assert(java.nio.file.Files.readString(pipeOut.toPath).trim == json.trim)
    // report carries both tables, the resolved var dict, and error details
    assert(json.contains("customer.parquet") && json.contains("lineitem.parquet"))
    assert(json.contains(s""""sf":"$sf0001""""))
    assert(json.contains(s""""home":"${sys.env("HOME")}""""))
    assert(json.contains("\"quickCheckError\""))
    val html = java.nio.file.Files.readString(htmlOut.toPath)
    assert(html.contains("error details") && html.contains("c_custkey"))
  }
}
