package graft
import org.apache.spark.sql.SparkSession

/** One-shot fixture builder: derives the non-parquet copies (orc / csv /
  * json / hive-catalog) of the testdata tables under `target/fixtures`,
  * so standalone CLI runs (scripts/flagship_smoke.sh) and cold Bench /
  * Verify runs read pre-built sources instead of paying a write job
  * inside a timed or asserted region. */
object MakeFixtures {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-fixtures")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.queries.CheckQueries.materializeFixtures(spark, sfDir)
    finally spark.stop()
    println(s"[fixtures] ready under target/fixtures for $sfDir")
  }
}
