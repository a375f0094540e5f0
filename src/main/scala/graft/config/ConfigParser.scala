package graft.config

import graft.model._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** YAML/JSON config text → [[GraftConfig]] — the reference's front door
  * (ConfigParser.scala:51-66, validator/JsonDecoders.scala:10-39),
  * rebuilt on snakeyaml (bundled with Spark) instead of circe-yaml.
  *
  * Pipeline: snakeyaml → [[CVal]] tree → resolve `vars` (CLI vars first,
  * first-write-wins) → substitute `$var`s through the rest of the tree →
  * typed decode with accumulated error messages. Decoding after
  * substitution is equivalent to the reference's per-field
  * `substituteVariables` copies and keeps the typed model substitution-free.
  */
object ConfigParser {

  /** Load from the filesystem, or from the classpath with a
    * `classpath:` prefix (ConfigParser.scala:38-49). */
  def parseFile(path: String, cliVars: Map[String, String] = Map.empty,
      spark: Option[SparkSession] = None,
      lint: Boolean = false): Either[Seq[String], GraftConfig] = {
    val text =
      try {
        if (path.startsWith("classpath:")) {
          val res = path.stripPrefix("classpath:")
          val is = getClass.getResourceAsStream(res)
          if (is == null) return Left(Seq(s"config '$res' not found on classpath"))
          try new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally is.close()
        } else
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
            java.nio.charset.StandardCharsets.UTF_8)
      } catch {
        case e: Exception => return Left(Seq(s"cannot read config '$path': ${e.getMessage}"))
      }
    parse(text, cliVars, spark, lint)
  }

  /** Standalone config linter (reference ConfigParser.main,
    * ConfigParser.scala:68-79): validates structure without side effects —
    * shell commands don't run, no Spark session starts (their variables
    * resolve to placeholders); exit 0 iff the config decodes. */
  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("usage: graft.config.ConfigParser <config-file>")
      sys.exit(1)
    }
    parseFile(args(0), lint = true) match {
      case Right(cfg) =>
        println(s"OK: ${cfg.tables.size} tables, " +
          s"${cfg.tables.map(_.checks.size).sum} checks, ${cfg.vars.size} vars")
      case Left(errors) =>
        errors.foreach(e => System.err.println(s"error: $e"))
        sys.exit(1)
    }
  }

  def parse(text: String, cliVars: Map[String, String] = Map.empty,
      spark: Option[SparkSession] = None,
      lint: Boolean = false): Either[Seq[String], GraftConfig] = {
    val root =
      try CVal.fromJava(new org.yaml.snakeyaml.Yaml().load[Any](text))
      catch { case e: Exception => return Left(Seq(s"YAML parse error: ${e.getMessage}")) }
    root match {
      case obj: CVal.CObj => decode(obj, cliVars, spark, lint)
      case other => Left(Seq(s"config root must be a mapping, got ${other.render.take(80)}"))
    }
  }

  private def decode(raw: CVal.CObj, cliVars: Map[String, String],
      spark: Option[SparkSession], lint: Boolean = false): Either[Seq[String], GraftConfig] = {
    val errs = mutable.ArrayBuffer[String]()

    // -- vars: resolved BEFORE substitution of the rest of the config
    val varSub = new VarSub
    varSub.addStrings(cliVars)
    val varSpecs = raw.get("vars") match {
      case Some(CVal.CArr(vs)) => vs.flatMap(v => decodeVar(v, errs))
      case Some(other) => errs += s"'vars' must be a list, got ${other.render.take(80)}"; Vector.empty
      case None => Vector.empty
    }
    varSpecs.foreach { v =>
      (v, spark) match {
        case (vs @ (_: VarShell | _: VarSql), _) if lint =>
          // lint mode: validate structure without running commands or SQL
          varSub.add(vs.name, CVal.CStr("0"))
        case (VarSql(name, _), None) =>
          errs += s"variable '$name' is sql-kind but no SparkSession was provided"
        case _ => varSub.resolve(spark.orNull, v)
      }
    }

    // -- substitute everything below the vars section
    val sub = CVal.CObj(raw.fields.map {
      case ("vars", v) => ("vars", v)
      case (k, v) => (k, varSub.substitute(v))
    })
    errs ++= varSub.errors

    def intField(key: String): Option[Int] = sub.get(key) match {
      case Some(CVal.CLong(n)) => Some(n.toInt)
      case Some(other) => errs += s"'$key' must be an integer, got ${other.render.take(40)}"; None
      case None => errs += s"missing required field '$key'"; None
    }
    val numKeyCols = intField("numKeyCols")
    val numErrors = intField("numErrorsToReport")
    val detailedErrors = sub.get("detailedErrors") match {
      case Some(CVal.CBool(b)) => b
      case Some(other) => errs += s"'detailedErrors' must be a boolean, got ${other.render.take(40)}"; true
      case None => true
    }
    val email = sub.get("email").flatMap(decodeEmail(_, errs))
    val outputs = sub.get("outputs") match {
      case Some(CVal.CArr(os)) => os.flatMap(decodeOutput(_, errs))
      case Some(other) => errs += s"'outputs' must be a list, got ${other.render.take(80)}"; Vector.empty
      case None => Vector.empty
    }
    val tables = sub.get("tables") match {
      case Some(CVal.CArr(ts)) => ts.flatMap(decodeTable(_, errs))
      case Some(other) => errs += s"'tables' must be a list, got ${other.render.take(80)}"; Vector.empty
      case None => errs += "missing required field 'tables'"; Vector.empty
    }

    if (errs.nonEmpty) Left(errs.toSeq.distinct)
    else Right(GraftConfig(numKeyCols.get, numErrors.get, email, detailedErrors,
      varSpecs, outputs, tables,
      varSub.entries.map { case (k, v) => k -> v.asInterpolation }))
  }

  private def decodeVar(v: CVal, errs: mutable.ArrayBuffer[String]): Option[VarSpec] = v match {
    case o: CVal.CObj =>
      (o.get("name"), o.get("value"), o.get("env"), o.get("shell"), o.get("sql")) match {
        case (Some(CVal.CStr(n)), Some(value), None, None, None) => Some(VarValue(n, value))
        case (Some(CVal.CStr(n)), None, Some(CVal.CStr(e)), None, None) => Some(VarEnv(n, e))
        case (Some(CVal.CStr(n)), None, None, Some(CVal.CStr(s)), None) => Some(VarShell(n, s))
        case (Some(CVal.CStr(n)), None, None, None, Some(CVal.CStr(q))) => Some(VarSql(n, q))
        case _ => errs += s"var must have 'name' and exactly one of value/env/shell/sql: ${v.render.take(120)}"; None
      }
    case other => errs += s"var entry must be a mapping: ${other.render.take(80)}"; None
  }

  private def decodeEmail(v: CVal, errs: mutable.ArrayBuffer[String]): Option[EmailConfig] = v match {
    case o: CVal.CObj =>
      (o.get("smtpHost"), o.get("subject"), o.get("from"), o.get("to")) match {
        case (Some(CVal.CStr(h)), Some(CVal.CStr(s)), Some(CVal.CStr(f)), Some(CVal.CArr(to))) =>
          // present-but-wrong-typed recipients are errors, not silent drops
          // (same policy as decodeCheck's badType)
          val bad = to.filterNot(_.isInstanceOf[CVal.CStr])
          if (bad.nonEmpty) {
            errs += s"email 'to' entries must be strings, got ${bad.map(_.render.take(40)).mkString(", ")}"
            None
          } else Some(EmailConfig(h, s, f, to.collect { case CVal.CStr(t) => t }))
        case _ => errs += s"email needs smtpHost/subject/from/to: ${v.render.take(120)}"; None
      }
    case other => errs += s"'email' must be a mapping: ${other.render.take(80)}"; None
  }

  private def decodeOutput(v: CVal, errs: mutable.ArrayBuffer[String]): Option[OutputSpec] = v match {
    case o: CVal.CObj if o.has("filename") =>
      (o.get("filename"), o.get("append")) match {
        case (Some(CVal.CStr(f)), Some(CVal.CBool(a))) => Some(FileOutput(f, a))
        case (Some(CVal.CStr(f)), None) => Some(FileOutput(f, append = false))
        case _ => errs += s"bad file output: ${v.render.take(120)}"; None
      }
    case o: CVal.CObj if o.has("pipe") =>
      (o.get("pipe"), o.get("ignoreError")) match {
        case (Some(CVal.CStr(p)), Some(CVal.CBool(i))) => Some(PipeOutput(p, i))
        case (Some(CVal.CStr(p)), None) => Some(PipeOutput(p, ignoreError = false))
        case _ => errs += s"bad pipe output: ${v.render.take(120)}"; None
      }
    case other => errs += s"output needs 'filename' or 'pipe': ${other.render.take(120)}"; None
  }

  /** Source dispatch in the reference's try-order: hive | orc | parquet |
    * format (ConfigParser.scala:20-25). */
  private def decodeTable(v: CVal, errs: mutable.ArrayBuffer[String]): Option[TableConfig] = v match {
    case o: CVal.CObj =>
      val source: Option[SourceSpec] =
        (o.get("db"), o.get("table"), o.get("orcFile"), o.get("parquetFile"), o.get("format")) match {
          case (Some(CVal.CStr(db)), Some(CVal.CStr(t)), _, _, _) => Some(HiveSource(db, t))
          case (_, _, Some(CVal.CStr(f)), _, _) => Some(OrcSource(f))
          case (_, _, _, Some(CVal.CStr(f)), _) => Some(ParquetSource(f))
          case (_, _, _, _, Some(CVal.CStr(fmt))) =>
            val options = o.get("options") match {
              case Some(CVal.CObj(fs)) => fs.collect { case (k, CVal.CStr(s)) => k -> s }.toMap
              case _ => Map.empty[String, String]
            }
            val loadData = o.get("loadData") match {
              case Some(CVal.CArr(ps)) => ps.collect { case CVal.CStr(p) => p }
              case _ => Vector.empty[String]
            }
            Some(FormatSource(fmt, options, loadData))
          case _ =>
            errs += s"table needs db+table, orcFile, parquetFile or format: ${v.render.take(120)}"
            None
        }
      val condition = o.get("condition").collect { case CVal.CStr(c) => c }
      // a typoed keyColumns must not silently disable error-detail keying
      // — present-but-wrong-typed is an error (decodeCheck's badType policy)
      val keyColumns = o.get("keyColumns") match {
        case Some(CVal.CArr(ks)) =>
          val bad = ks.filterNot(_.isInstanceOf[CVal.CStr])
          if (bad.nonEmpty) {
            errs += s"'keyColumns' entries must be strings, got ${bad.map(_.render.take(40)).mkString(", ")}"
            None
          } else Some(ks.collect { case CVal.CStr(k) => k })
        case Some(other) =>
          errs += s"'keyColumns' must be a list of strings, got ${other.render.take(60)}"
          None
        case None => None
      }
      val checks = o.get("checks") match {
        case Some(CVal.CArr(cs)) => uniquifyLabels(cs.flatMap(decodeCheck(_, errs)))
        case Some(other) => errs += s"'checks' must be a list: ${other.render.take(80)}"; Vector.empty
        case None => errs += s"table ${source.map(_.describe).getOrElse("?")} has no checks"; Vector.empty
      }
      source.map(TableConfig(_, condition, keyColumns, checks))
    case other => errs += s"table entry must be a mapping: ${other.render.take(80)}"; None
  }

  /** Check dispatch by `type` with the reference's field names
    * (JsonDecoders.scala:14-25). Labels don't exist in the reference
    * (results are positional); ours key the fused-pass aggregate columns,
    * so they are derived from type+column and uniquified. */
  private def decodeCheck(v: CVal, errs: mutable.ArrayBuffer[String]): Option[CheckSpec] = v match {
    case o: CVal.CObj =>
      // present-but-wrong-typed fields are ERRORS, not silently-dropped
      // bounds — a mistyped minLength would otherwise weaken the check
      // with no diagnostic
      def badType(k: String, want: String, got: CVal): None.type = {
        errs += s"'$k' must be $want, got ${got.render.take(60)}"; None
      }
      def str(k: String): Option[String] = o.get(k).flatMap {
        case CVal.CStr(s) => Some(s)
        case other => badType(k, "a string", other)
      }
      def int(k: String): Option[Int] = o.get(k).flatMap {
        case CVal.CLong(n) => Some(n.toInt)
        case other => badType(k, "an integer", other)
      }
      def boolOr(k: String, d: Boolean): Boolean = o.get(k).flatMap {
        case CVal.CBool(b) => Some(b)
        case other => badType(k, "a boolean", other)
      }.getOrElse(d)
      def bound(k: String): Option[Bound] = o.get(k).flatMap {
        case CVal.CLong(n) => Some(Bound.Num(n.toDouble))
        case CVal.CDbl(d) => Some(Bound.Num(d))
        case CVal.CStr(s) => Some(Bound.parse(s)) // backtick prefix → column ref
        case other => badType(k, "a number, string or `column ref", other)
      }
      def num(k: String): Option[Double] = o.get(k).flatMap {
        case CVal.CLong(n) => Some(n.toDouble)
        case CVal.CDbl(d) => Some(d)
        case other => badType(k, "a number", other)
      }
      val threshold = o.get("threshold").flatMap {
        case CVal.CStr(s) => Some(s)
        case CVal.CLong(n) => Some(n.toString)
        case CVal.CDbl(d) => Some(d.toString)
        case other => badType("threshold", "a string or number", other)
      }
      def col(forType: String): Option[String] = str("column") match {
        case some @ Some(_) => some
        case None => errs += s"$forType needs 'column': ${v.render.take(100)}"; None
      }
      str("type") match {
        case Some("rowCount") =>
          o.get("minNumRows").collect { case CVal.CLong(n) => n } match {
            case Some(n) => Some(MinNumRows(n, "rowcount"))
            case None => errs += s"rowCount needs integer 'minNumRows': ${v.render.take(100)}"; None
          }
        case Some("nullCheck") => col("nullCheck").map(c => NullCheck(c, threshold, s"nullcheck_$c"))
        case Some("negativeCheck") => col("negativeCheck").map(c => NegativeCheck(c, threshold, s"negcheck_$c"))
        case Some("rangeCheck") => col("rangeCheck").flatMap { c =>
          val (mn, mx) = (bound("minValue"), bound("maxValue"))
          if (mn.isEmpty && mx.isEmpty) {
            errs += s"rangeCheck needs minValue and/or maxValue: ${v.render.take(100)}"; None
          } else Some(RangeCheck(c, mn, mx, boolOr("inclusive", d = false), threshold, s"rangecheck_$c"))
        }
        case Some("stringLengthCheck") => col("stringLengthCheck").flatMap { c =>
          val (mn, mx) = (int("minLength"), int("maxLength"))
          if (mn.isEmpty && mx.isEmpty) {
            errs += s"stringLengthCheck needs minLength and/or maxLength: ${v.render.take(100)}"; None
          } else Some(StringLengthCheck(c, mn, mx, threshold, s"strlen_$c"))
        }
        case Some("stringRegexCheck") => col("stringRegexCheck").flatMap { c =>
          str("regex") match {
            case Some(re) => Some(StringRegexCheck(c, re, threshold, s"regex_$c"))
            case None => errs += s"stringRegexCheck needs 'regex': ${v.render.take(100)}"; None
          }
        }
        case Some("columnMaxCheck") => col("columnMaxCheck").flatMap { c =>
          bound("value") match {
            case Some(b) => Some(ColumnMaxCheck(c, b, s"colmax_$c"))
            case None => errs += s"columnMaxCheck needs 'value': ${v.render.take(100)}"; None
          }
        }
        case Some("columnSumCheck") => col("columnSumCheck").flatMap { c =>
          val (mn, mx) = (num("minValue"), num("maxValue"))
          if (mn.isEmpty && mx.isEmpty) {
            errs += s"columnSumCheck needs minValue and/or maxValue: ${v.render.take(100)}"; None
          } else Some(ColumnSumCheck(c, mn, mx, boolOr("inclusive", d = false), s"colsum_$c"))
        }
        case Some("uniqueCheck") =>
          o.get("columns") match {
            case Some(CVal.CArr(cs)) if cs.nonEmpty =>
              Some(UniqueCheck(cs.collect { case CVal.CStr(c) => c }, "unique_" + cs.collect {
                case CVal.CStr(c) => c }.mkString("_")))
            case _ => errs += s"uniqueCheck needs non-empty 'columns': ${v.render.take(100)}"; None
          }
        case Some("colstats") => col("colstats").map(c => ColStats(c, s"colstats_$c"))
        case Some(other) =>
          errs += s"unknown check type '$other' (choose one of: rowCount, nullCheck, negativeCheck, " +
            "rangeCheck, stringLengthCheck, stringRegexCheck, columnMaxCheck, columnSumCheck, " +
            "uniqueCheck, colstats)"
          None
        case None => errs += s"check needs a 'type': ${v.render.take(100)}"; None
      }
    case other => errs += s"check entry must be a mapping: ${other.render.take(80)}"; None
  }

  private def uniquifyLabels(checks: Vector[CheckSpec]): Vector[CheckSpec] = {
    val seen = mutable.Set[String]()
    checks.map { c =>
      if (seen.add(c.label)) c
      else {
        // suffix until free — a generated label may itself collide with a
        // later derived one (e.g. columns `a`, `a`, `a_2`)
        var n = 2
        while (!seen.add(s"${c.label}_$n")) n += 1
        val l = s"${c.label}_$n"
        c match {
          case x: NullCheck => x.copy(label = l)
          case x: NegativeCheck => x.copy(label = l)
          case x: RangeCheck => x.copy(label = l)
          case x: StringLengthCheck => x.copy(label = l)
          case x: StringRegexCheck => x.copy(label = l)
          case x: MinNumRows => x.copy(label = l)
          case x: ColumnMaxCheck => x.copy(label = l)
          case x: ColumnSumCheck => x.copy(label = l)
          case x: UniqueCheck => x.copy(label = l)
          case x: ColStats => x.copy(label = l)
        }
      }
    }
  }
}
