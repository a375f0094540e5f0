package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Random-schema ROUND-TRIP fuzzing of the source loaders: generate 20
  * seeded DataFrames over a mixed type pool (long/int/double/string/
  * bool/timestamp, with NULLs and awkward string content — quotes,
  * commas, newlines, unicode), write with Spark's writers, read back
  * through [[graft.sources.Sources]], and assert multiset equality of
  * rows. Parquet/ORC/JSON read their own schema; CSV round-trips under
  * an EXPLICIT schema (inference is lossy by design) with quoting
  * escapes exercised. The fixed-case source oracles (chk_csv/chk_json/…)
  * prove one table each; this covers the schema/content space. */
class SourceFuzzSpec extends SparkSuite {

  private val base = "target/fixtures/sourcefuzz"

  private def randomDf(seed: Int, csvSafe: Boolean = false): DataFrame = {
    val rng = new scala.util.Random(seed)
    val nCols = 2 + rng.nextInt(5)
    val types: Seq[DataType] = (0 until nCols).map(_ =>
      rng.nextInt(6) match {
        case 0 => LongType
        case 1 => IntegerType
        case 2 => DoubleType
        case 3 => StringType
        case 4 => BooleanType
        case _ => TimestampType
      })
    val schema = StructType(types.zipWithIndex.map { case (t, i) =>
      StructField(s"c$i", t, nullable = true) })
    // CSV's writer trims leading/trailing whitespace by default and
    // conflates "" with null — the csv-safe pool drops those two shapes
    // but keeps commas/quotes/newlines/unicode (the quoting surface)
    val awkward =
      if (csvSafe) Seq("plain", "with,comma", "with\"quote", "with\nnewline",
        "tabs\there", "ünïcødé", "null")
      else Seq("plain", "with,comma", "with\"quote", "with\nnewline",
        "tabs\there", "ünïcødé", "", " lead/trail ", "null")
    val rows = (0 until 30).map { _ =>
      Row.fromSeq(types.map { t =>
        if (rng.nextInt(8) == 0) null
        else t match {
          case LongType => rng.nextLong() % 1000000L
          case IntegerType => rng.nextInt(100000) - 50000
          case DoubleType => math.rint(rng.nextDouble() * 1e8) / 1e3
          case StringType => awkward(rng.nextInt(awkward.size))
          case BooleanType => rng.nextBoolean()
          case TimestampType => new java.sql.Timestamp(
            1700000000000L + (rng.nextInt(100000000).toLong * 10))
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def canon(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity).map {
      case (k, v) => k -> v.size }

  test("20 random schemas round-trip through parquet, orc, json, and schema'd csv " +
      s"[seed base ${FuzzRound.base + 200}]") {
    // +200: disjoint from CheckFuzzSpec's base..base+130 range; the csv
    // pool below adds +1000, still inside one round's 100000-wide band
    (FuzzRound.base + 200 until FuzzRound.base + 220).foreach { seed =>
      val df = randomDf(seed)
      val expect = canon(df)
      val dir = s"$base/s$seed"
      df.write.mode("overwrite").parquet(s"$dir/p")
      assert(canon(graft.sources.Sources.parquet(spark, s"$dir/p")) == expect,
        s"seed=$seed parquet")
      df.write.mode("overwrite").orc(s"$dir/o")
      assert(canon(graft.sources.Sources.orc(spark, s"$dir/o")) == expect,
        s"seed=$seed orc")
      // JSON: read back under the WRITER's schema — inference would
      // widen ints and cannot represent a JSON-omitted all-null column
      df.write.mode("overwrite").json(s"$dir/j")
      val j = spark.read.schema(df.schema).json(s"$dir/j")
      assert(canon(j) == expect, s"seed=$seed json")
      // CSV: quoting/escaping must survive commas, quotes, embedded
      // newlines (multiLine) and unicode under an explicit schema; the
      // csv-safe pool avoids the writer's whitespace-trim and
      // empty-vs-null conflation, which are format limits, not bugs
      val cdf = randomDf(seed + 1000, csvSafe = true)
      val csvOpts = Map("header" -> "true", "multiLine" -> "true",
        "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      cdf.write.mode("overwrite").options(csvOpts).csv(s"$dir/c")
      val cs = spark.read.options(csvOpts).schema(cdf.schema).csv(s"$dir/c")
      assert(canon(cs) == canon(cdf), s"seed=$seed csv")
    }
  }
}
