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
    // a real serialized Bloom sketch as a SQL hex literal (the foldable
    // operand contract of bloom_any_contain)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(4, 0.01)
    bf.putLong(42L)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val sketchHex = bos.toByteArray.map(b => f"${b & 0xff}%02X").mkString
    val r = spark.sql(
      s"""SELECT
        | lang_id('the cat and the dog sat on the mat') AS lang,
        | round(cosine_sim(array(3.0D, 4.0D), array(4.0D, 3.0D)), 4) AS cos,
        | simhash64(array('a', 'b')) AS sh,
        | minhash_agree(array(1L, 2L), array(1L, 3L)) AS agree,
        | sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS inter,
        | size(minhash_sig(array('x', 'y'), 8)) AS sig_n,
        | size(char_shingle_hashes('abcdef', 3)) AS grams,
        | size(cosine_lsh_buckets(array(CAST(1.0 AS FLOAT)), 4, 2, 7L)) AS tables,
        | element_at(png_pixel_stats(png_gray_fixture(7L, 4, 2)), 4) AS px_sum,
        | element_at(png_pixel_stats(
        |   png_resize(png_gray_fixture(7L, 4, 2), 2, 1, false)), 3) AS rs_n,
        | size(png_frame_split(png_frames_fixture(2L, 4, 2))) AS nf,
        | element_at(wav_frame_stats(wav_pcm_fixture(3L), 80), 1) AS af,
        | bloom_any_contain(array(41L, 42L), X'$sketchHex') AS bloom_hit,
        | element_at(jpeg_rgb_stats(jpeg_subsample_fixture(5L, 1, 1, 2, 2)), 1) AS sub_w,
        | image_phash(png_noise_fixture(9L, 16, 16)) AS ph,
        | image_phash(png_to_jpeg(png_noise_fixture(9L, 16, 16), 12)) AS phj,
        | element_at(wav_spectral_stats(wav_tone_fixture(2L), 256, 8), 3) AS tone_bin,
        | wav_audio_fingerprint(wav_melody_fixture(4L), 128, 9) AS afp,
        | wav_audio_fingerprint(
        |   wav_scale_amplitude(wav_melody_fixture(4L), 1, 2), 128, 9) AS afp_scaled,
        | wav_audio_fingerprint(
        |   wav_requantize(wav_melody_fixture(4L), 8), 128, 9) AS afp_rq,
        | size(png_frame_split(png_noise_frames_fixture(3L, 8, 8, 1))) AS vid_nf,
        | element_at(gif_frame_stats(gif_gray_fixture(4L, 8, 4)), 1) AS gif_nf,
        | image_phash(element_at(gif_frame_split(gif_gray_fixture(4L, 8, 4)), 1)) AS gif_ph
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
    assert(r.getLong(9) == 2L)  // 4x2 resized to 2x1 → 2 samples
    assert(r.getInt(10) == 6)   // 4 + 2%3 = 6 frames
    assert(r.getLong(11) == 2L) // 208 samples / 80 → 2 full frames
    assert(r.getBoolean(12))    // inserted hash must hit
    assert(r.getLong(13) == 16L) // one 4:2:0 MCU = 16×16 px
    // pHash survives the SQL-injected lossy JPEG round trip
    assert(java.lang.Long.bitCount(r.getLong(14) ^ r.getLong(15)) <= 3)
    assert(r.getLong(16) == 3 + 2 % 8) // planted tone bin
    // audio fingerprint invariant under SQL-injected volume/requantize
    assert(java.lang.Long.bitCount(r.getLong(17) ^ r.getLong(18)) <= 4)
    assert(java.lang.Long.bitCount(r.getLong(17) ^ r.getLong(19)) <= 4)
    assert(r.getInt(20) == 4) // 5 + 3%3 = 5 frames, head-trimmed to 4
    assert(r.getLong(21) == 2 + 4 % 3) // animated GIF frame count via SQL
    assert(!r.isNullAt(22)) // GIF frame → PNG → pHash through SQL alone
    // round-8 string expressions ride the same injection route
    val r2 = spark.sql(
      """SELECT deflate_ratio(repeat('the cat sat ', 200), 6) AS dr,
        | normalize_text('Café', 'NFC', true, true) AS nt,
        | lcs_len(array('a', 'b', 'c'), array('a', 'x', 'b', 'y', 'c')) AS lcs,
        | token_edit_dist(array('a', 'b', 'c'), array('a', 'x', 'c')) AS ted
        |""".stripMargin).head()
    assert(r2.getDouble(0) < 0.05, s"injected deflate_ratio: ${r2.getDouble(0)}")
    assert(r2.getString(1) == "cafe", s"injected normalize_text: ${r2.getString(1)}")
    assert(r2.getInt(2) == 3, s"injected lcs_len: ${r2.getInt(2)}")
    assert(r2.getInt(3) == 1, s"injected token_edit_dist: ${r2.getInt(3)}")
  }
}
