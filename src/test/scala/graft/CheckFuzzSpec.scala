package graft

import graft.exec.{ColumnStats, Runner}
import graft.model._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Random-config DIFFERENTIAL fuzzing of the check DSL.
  *
  * The reference engine's specs (RowBasedSpec, RangeCheckSpec, …) and this
  * repo's oracle rows are all fixed-case: nothing exercises the
  * COMBINATION space — N random checks × random columns/bounds/thresholds
  * × a table condition, through the full quick/first/detail/costly
  * lifecycle in one [[Runner.run]]. This suite generates 100 seeded
  * configs over a planted fixture (nulls, negatives, empty-string edge
  * lengths, duplicate keys, an all-NULL column, and an occasionally-empty
  * condition slice) and asserts every verdict equals an INDEPENDENT
  * straight-line recomputation: one `df.filter(<predicate restated
  * in-spec>).count()` per check plus plain-Scala threshold arithmetic —
  * no CheckCompiler, no fused pass, no shared code with the engine path
  * beyond the Column DSL itself.
  *
  * Every assertion message carries the config seed: a red case replays as
  * `mkChecks(new scala.util.Random(seed), df)`.
  */
class CheckFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val NRows = 240
  private lazy val fixture: DataFrame = {
    val rng = new scala.util.Random(991)
    val rows = (0 until NRows).map { i =>
      val iv: java.lang.Long =
        if (rng.nextInt(10) == 0) null else java.lang.Long.valueOf(rng.between(-50L, 51L))
      val dv: java.lang.Double =
        if (rng.nextInt(8) == 0) null else java.lang.Double.valueOf(math.rint(rng.between(-20.0, 80.0) * 4) / 4)
      val sv: String =
        if (rng.nextInt(12) == 0) null
        else Seq.fill(rng.nextInt(7))("abcxyz09".charAt(rng.nextInt(8))).mkString
      val kv = rng.nextInt(40).toLong // deliberately collides: unique fodder
      (i.toLong, iv, dv, sv, kv, null: String)
    }
    rows.toDF("id", "i", "d", "s", "k", "allnull").cache()
  }
  private val NumCols = Seq("i", "d", "k", "id")
  private val StrCols = Seq("s", "allnull")
  private val Regexes = Seq("^a.*", "[0-9]+", "^[a-z0-9]{0,3}$", ".*9$")

  // ---- independent semantics restatement (straight-line, per check) ----

  private def limitOf(thr: Option[String], n: Long): Long = thr match {
    case None => 0L
    case Some(raw) =>
      val t = raw.trim
      if (t.endsWith("%")) (t.stripSuffix("%").trim.toDouble * (n / 100.0)).toLong
      else { val v = t.toDouble; if (v < 1.0) (v * n).toLong else v.toLong }
  }

  private def boundCol(b: Bound) = b match {
    case Bound.Num(v) => lit(v)
    case Bound.Str(s) => lit(s)
    case Bound.Ref(c) => col(c)
  }

  /** Reference verdict for one check, recomputed with its own Spark jobs. */
  private def refVerdict(df: DataFrame, n: Long, chk: CheckSpec): Boolean = chk match {
    case NullCheck(c, thr, _) =>
      df.where(col(c).isNull).count() > limitOf(thr, n)
    case NegativeCheck(c, thr, _) =>
      df.where(col(c) < 0).count() > limitOf(thr, n)
    case RangeCheck(c, mn, mx, inc, thr, _) =>
      val lo = mn.map(b => if (inc) col(c) < boundCol(b) else col(c) <= boundCol(b))
      val hi = mx.map(b => if (inc) col(c) > boundCol(b) else col(c) >= boundCol(b))
      df.where((lo ++ hi).reduce(_ || _)).count() > limitOf(thr, n)
    case StringLengthCheck(c, mn, mx, thr, _) =>
      val errs = (mn.map(length(col(c)) < _) ++ mx.map(length(col(c)) > _))
        .reduce(_ || _)
      df.where(errs).count() > limitOf(thr, n)
    case StringRegexCheck(c, re, thr, _) =>
      df.where(col(c).isNotNull && !col(c).rlike(re)).count() > limitOf(thr, n)
    case MinNumRows(min, _) => n < min
    case ColumnMaxCheck(c, expected, _) =>
      val actual = df.agg(max(col(c))).head.get(0)
      (actual, expected) match {
        case (null, _) => true
        case (a: java.lang.Number, Bound.Num(e)) => a.doubleValue() != e
        case (a: String, Bound.Str(e)) => a != e
        case _ => true
      }
    case ColumnSumCheck(c, mn, mx, inc, _) =>
      val row = df.agg(sum(col(c).cast("double"))).head
      val s = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      mn.exists(m => if (inc) s < m else s <= m) ||
        mx.exists(m => if (inc) s > m else s >= m)
    case UniqueCheck(cols0, _) =>
      df.groupBy(cols0.map(col): _*).count().where(col("count") > 1).count() > 0
    case _: ColStats => false // never fails; stats compared separately
  }

  /** Straight-line ColStats recomputation: collect the (tiny) column and
    * redo count/mean/min/max/sample-stddev/10-bin histogram in plain
    * Scala (SecondPassStatsAggregator semantics, restated from scratch). */
  private def refStats(df: DataFrame, c: String): ColumnStats = {
    val xs = df.select(col(c).cast("double")).na.drop().as[Double].collect()
    if (xs.isEmpty) return ColumnStats(0L, 0.0, 0.0, 0.0, 0.0, Seq.fill(10)(0L))
    val n = xs.length
    val mean = xs.sum / n
    val (mn, mx) = (xs.min, xs.max)
    val sd = if (n > 1) math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)) else 0.0
    val bin = (mx - mn) / 10
    val hist = Array.fill(10)(0L)
    xs.foreach { x =>
      val b = if (bin == 0.0) 0 else math.min(9, math.floor((x - mn) / bin).toInt)
      hist(b) += 1
    }
    ColumnStats(n.toLong, mean, mn, mx, sd, hist.toSeq)
  }

  // ---- config generator ----

  private def mkThreshold(rng: scala.util.Random): Option[String] =
    rng.nextInt(5) match {
      case 0 => None
      case 1 => Some(rng.nextInt(30).toString)
      case 2 => Some(f"0.${rng.nextInt(999)}%03d")
      case 3 => Some(s"${rng.nextInt(100)}%")
      case _ => Some(s"${rng.nextInt(100)} %")
    }

  private def mkChecks(rng: scala.util.Random, df: DataFrame): Seq[CheckSpec] = {
    val n = 1 + rng.nextInt(8)
    (0 until n).map { i =>
      val label = s"c$i"
      rng.nextInt(10) match {
        case 0 => NullCheck(rng.shuffle(NumCols ++ StrCols).head, mkThreshold(rng), label)
        case 1 => NegativeCheck(rng.shuffle(NumCols).head, mkThreshold(rng), label)
        case 2 =>
          val c = rng.shuffle(NumCols).head
          val mn = if (rng.nextBoolean()) Some[Bound](Bound.Num(rng.between(-60.0, 20.0))) else None
          val mx =
            if (mn.isEmpty || rng.nextBoolean())
              Some[Bound](if (rng.nextInt(4) == 0) Bound.Ref(rng.shuffle(NumCols.filterNot(_ == c)).head)
                else Bound.Num(rng.between(0.0, 90.0)))
            else None
          RangeCheck(c, mn, mx, rng.nextBoolean(), mkThreshold(rng), label)
        case 3 =>
          val mn = if (rng.nextBoolean()) Some(rng.nextInt(4)) else None
          val mx = if (mn.isEmpty || rng.nextBoolean()) Some(rng.nextInt(8)) else None
          StringLengthCheck(rng.shuffle(StrCols).head, mn, mx, mkThreshold(rng), label)
        case 4 => StringRegexCheck(rng.shuffle(StrCols).head,
          Regexes(rng.nextInt(Regexes.size)), mkThreshold(rng), label)
        case 5 => MinNumRows(rng.between(0L, 2L * NRows), label)
        case 6 =>
          if (rng.nextBoolean()) {
            val c = rng.shuffle(NumCols).head
            // half the time aim at the TRUE max so the pass branch is hit
            val e =
              if (rng.nextBoolean()) {
                val m = df.agg(max(col(c).cast("double"))).head
                if (m.isNullAt(0)) 0.0 else m.getDouble(0)
              } else rng.between(-10.0, 90.0)
            ColumnMaxCheck(c, Bound.Num(e), label)
          } else ColumnMaxCheck("s", Bound.Str(if (rng.nextBoolean()) "zzz" else "ba"), label)
        case 7 =>
          val mn = if (rng.nextBoolean()) Some(rng.between(-5000.0, 5000.0)) else None
          val mx = if (mn.isEmpty || rng.nextBoolean()) Some(rng.between(0.0, 9000.0)) else None
          ColumnSumCheck(rng.shuffle(NumCols).head, mn, mx, rng.nextBoolean(), label)
        case 8 => UniqueCheck(rng.shuffle(Seq(Seq("k"), Seq("k", "i"), Seq("id"), Seq("s", "k"))).head, label)
        case _ => ColStats(rng.shuffle(NumCols).head, label)
      }
    }
  }

  test("100 random configs: every verdict equals the straight-line recomputation " +
      s"[seed base ${FuzzRound.base}]") {
    val conditions = Seq(None, Some("id % 3 != 0"), Some("k < 20"), Some("id < 0") /* empty */)
    var emptySeen = 0
    (FuzzRound.base until FuzzRound.base + 100).foreach { seed =>
      val rng = new scala.util.Random(seed)
      // java.util.Random's first small-seed draws are poorly mixed and
      // never hit index 3 across seeds 0..99 — pin every 10th config to
      // the empty slice so empty-table semantics are always exercised
      val cond =
        if (seed % 10 == 9) conditions.last
        else conditions(rng.nextInt(conditions.size))
      val checks = mkChecks(rng, fixture)
      val table = TableSpec(s"fuzz$seed", _ => fixture, cond, Some(Seq("id")), checks)
      assert(Runner.configCheck(spark, table).isEmpty,
        s"seed=$seed: generated config must lint clean")
      val res = Runner.run(spark, table, detailedErrors = true, numErrorsToReport = 10)
      val sliced = cond.fold(fixture)(fixture.where)
      val n = sliced.count()
      if (n == 0) emptySeen += 1
      assert(res.rowCount == n, s"seed=$seed: rowCount ${res.rowCount} != $n")
      checks.foreach { chk =>
        val expected = refVerdict(sliced, n, chk)
        val got = res.results.find(_.label == chk.label).get
        assert(got.failed == expected,
          s"seed=$seed check=$chk: engine=${got.failed} reference=$expected " +
            s"(metrics=${got.metrics}, cond=$cond, n=$n)")
        chk match {
          case cs: ColStats =>
            val exp = refStats(sliced, cs.column)
            val eng = got.metrics("stats").asInstanceOf[ColumnStats]
            assert(eng.count == exp.count && eng.histogram == exp.histogram &&
              math.abs(eng.mean - exp.mean) < 1e-9 &&
              math.abs(eng.stdDev - exp.stdDev) < 1e-9 &&
              eng.min == exp.min && eng.max == exp.max,
              s"seed=$seed colstats(${cs.column}): $eng != $exp")
          case _ => ()
        }
      }
      // error-detail pass: size == min(cap, union of failed checks' violations)
      val failedRow = checks.collect { case rc: RowCheckSpec if refVerdict(sliced, n, rc) => rc }
      if (failedRow.nonEmpty) {
        val union = failedRow.map {
          case NullCheck(c, _, _) => col(c).isNull
          case NegativeCheck(c, _, _) => col(c) < 0
          case RangeCheck(c, mn, mx, inc, _, _) =>
            ((mn.map(b => if (inc) col(c) < boundCol(b) else col(c) <= boundCol(b))) ++
              (mx.map(b => if (inc) col(c) > boundCol(b) else col(c) >= boundCol(b))))
              .reduce(_ || _)
          case StringLengthCheck(c, mn, mx, _, _) =>
            (mn.map(length(col(c)) < _) ++ mx.map(length(col(c)) > _)).reduce(_ || _)
          case StringRegexCheck(c, re, _, _) => col(c).isNotNull && !col(c).rlike(re)
        }.reduce(_ || _)
        val expectDetails = math.min(10L, sliced.where(union).count())
        assert(res.errorDetails.size.toLong == expectDetails,
          s"seed=$seed: detail rows ${res.errorDetails.size} != $expectDetails")
      } else assert(res.errorDetails.isEmpty, s"seed=$seed: details on no failed row checks")
    }
    assert(emptySeen > 0, "the empty-slice condition never drew — widen the pool")
  }

  // ---- the FULL front door: render each random config as YAML, parse it
  // through ConfigParser (the reference's entry format), run the decoded
  // TableSpec, and hold every verdict to the same straight-line
  // recomputation — covering serialize → decode → compile → execute.

  private def yamlCheck(chk: CheckSpec): String = {
    def thrY(t: Option[String]) =
      t.map(v => s""", threshold: "$v"""").getOrElse("")
    def b(x: Bound) = x match {
      case Bound.Num(v) => v.toString
      case Bound.Str(s) => "\"" + s + "\""
      case Bound.Ref(c) => "\"`" + c + "\""
    }
    chk match {
      case NullCheck(c, thr, _) =>
        s"      - { type: nullCheck, column: $c${thrY(thr)} }"
      case NegativeCheck(c, thr, _) =>
        s"      - { type: negativeCheck, column: $c${thrY(thr)} }"
      case RangeCheck(c, mn, mx, inc, thr, _) =>
        val bs = mn.map(m => s", minValue: ${b(m)}").getOrElse("") +
          mx.map(m => s", maxValue: ${b(m)}").getOrElse("")
        s"      - { type: rangeCheck, column: $c$bs, inclusive: $inc${thrY(thr)} }"
      case StringLengthCheck(c, mn, mx, thr, _) =>
        val bs = mn.map(m => s", minLength: $m").getOrElse("") +
          mx.map(m => s", maxLength: $m").getOrElse("")
        s"      - { type: stringLengthCheck, column: $c$bs${thrY(thr)} }"
      case StringRegexCheck(c, re, thr, _) =>
        s"""      - { type: stringRegexCheck, column: $c, regex: "$re"${thrY(thr)} }"""
      case MinNumRows(n, _) =>
        s"      - { type: rowCount, minNumRows: $n }"
      case ColumnMaxCheck(c, e, _) =>
        s"      - { type: columnMaxCheck, column: $c, value: ${b(e)} }"
      case ColumnSumCheck(c, mn, mx, inc, _) =>
        val bs = mn.map(m => s", minValue: $m").getOrElse("") +
          mx.map(m => s", maxValue: $m").getOrElse("")
        s"      - { type: columnSumCheck, column: $c$bs, inclusive: $inc }"
      case UniqueCheck(cols0, _) =>
        s"      - { type: uniqueCheck, columns: [${cols0.mkString(", ")}] }"
      case ColStats(c, _) =>
        s"      - { type: colstats, column: $c }"
    }
  }

  test("30 random configs through YAML -> ConfigParser -> Runner match the recomputation " +
      s"[seed base ${FuzzRound.base + 100}]") {
    val path = "target/fixtures/fuzz/fx.parquet"
    fixture.write.mode("overwrite").parquet(path)
    val conditions = Seq(None, Some("id % 3 != 0"), Some("k < 20"), Some("id < 0"))
    (FuzzRound.base + 100 until FuzzRound.base + 130).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val cond =
        if (seed % 10 == 9) conditions.last
        else conditions(rng.nextInt(conditions.size))
      val checks = mkChecks(rng, fixture)
      val yaml =
        s"""numKeyCols: 1
           |numErrorsToReport: 10
           |tables:
           |  - parquetFile: $path
           |    keyColumns: [id]
           |${cond.map(c => s"    condition: \"$c\"\n").getOrElse("")}    checks:
           |${checks.map(yamlCheck).mkString("\n")}
           |""".stripMargin
      val cfg = graft.config.ConfigParser.parse(yaml, Map.empty, Some(spark))
        .fold(errs => fail(s"seed=$seed: config did not parse: $errs\n$yaml"),
          identity)
      val table = cfg.tables.head.toTableSpec
      assert(table.checks.size == checks.size,
        s"seed=$seed: ${table.checks.size} checks decoded of ${checks.size}")
      val res = Runner.run(spark, table, detailedErrors = true,
        numErrorsToReport = 10)
      val sliced = cond.fold(fixture)(fixture.where)
      val n = sliced.count()
      table.checks.foreach { chk =>
        val expected = refVerdict(sliced, n, chk)
        val got = res.results.find(_.label == chk.label).get
        assert(got.failed == expected,
          s"seed=$seed check=$chk: engine=${got.failed} reference=$expected " +
            s"(metrics=${got.metrics}, cond=$cond, n=$n)\n$yaml")
      }
    }
  }
}
