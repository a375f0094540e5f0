package graft

/** The spark.sql.extensions injection route: every native expression is
  * registered through SparkSessionExtensions and usable from SQL. */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects all native functions into a registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registerFunctions is private[sql] at the Scala level (public in
    // bytecode) — in production the session builder calls it during
    // spark.sql.extensions bootstrap; the test drives the same path
    classOf[org.apache.spark.sql.SparkSessionExtensions]
      .getMethod("registerFunctions",
        classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
      .invoke(ext, spark.sessionState.functionRegistry)
    val r = spark.sql(
      """SELECT
        | lang_id('the cat and the dog sat on the mat') AS lang,
        | round(cosine_sim(array(3.0D, 4.0D), array(4.0D, 3.0D)), 4) AS cos,
        | simhash64(array('a', 'b')) AS sh,
        | minhash_agree(array(1L, 2L), array(1L, 3L)) AS agree,
        | sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS inter,
        | size(minhash_sig(array('x', 'y'), 8)) AS sig_n,
        | size(char_shingle_hashes('abcdef', 3)) AS grams,
        | size(cosine_lsh_buckets(array(CAST(1.0 AS FLOAT)), 4, 2, 7L)) AS tables,
        | element_at(png_pixel_stats(png_gray_fixture(7L, 4, 2)), 4) AS px_sum
        |""".stripMargin).head()
    assert(r.getString(0) == "en")
    assert(r.getDouble(1) == 0.96)
    assert(r.getLong(3) == 1L) // one agreeing component
    assert(r.getLong(4) == 2L) // {2, 5}
    assert(r.getInt(5) == 8)
    assert(r.getInt(6) == 4)   // abc bcd cde def
    assert(r.getInt(7) == 2)   // one bucket id per table
    // pixels (7*31 + i*7) % 256 for i in 0..7, summed after a REAL
    // encode→decode round trip through the injected SQL functions
    assert(r.getLong(8) == 1420L)
  }
}
