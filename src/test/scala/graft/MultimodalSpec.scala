package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Binary-column (multimodal) operators: magic sniffing, PNG header
  * geometry, metadata struct, and the typed mapPartitions decode stage. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  // a minimal valid PNG header: signature + IHDR length/type + 64x32 dims
  private val pngHeader: Array[Byte] = Array[Byte](
    0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
    0, 0, 0, 0x0D, 'I', 'H', 'D', 'R',
    0, 0, 0, 0x40, 0, 0, 0, 0x20)
  private val jpegHeader: Array[Byte] =
    Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  // SOI + APP0/JFIF + SOF0 (precision 8, height 48, width 96, 1 component)
  private val jpegFull: Array[Byte] = Array[Byte](
    0xFF.toByte, 0xD8.toByte,
    0xFF.toByte, 0xE0.toByte, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
    0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
    0xFF.toByte, 0xC0.toByte, 0x00, 0x0B, 0x08, 0x00, 0x30, 0x00, 0x60, 0x01, 0x01, 0x11, 0x00)

  test("format sniffing by magic bytes") {
    val rows = Seq(
      (1L, pngHeader ++ "payload".getBytes),
      (2L, jpegHeader ++ "payload".getBytes),
      (3L, "GIF89a-something".getBytes),
      (4L, "RIFFxxxxWAVE".getBytes),
      (5L, "plain text bytes".getBytes)).toDF("id", "blob")
    val got = rows.select(col("id"), Multimodal.sniffFormat(col("blob")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "riff", 5L -> "unknown"))
  }

  test("PNG header geometry is read straight from the bytes") {
    val df = Seq((1L, pngHeader ++ Array.fill[Byte](10)(0))).toDF("id", "blob")
    val r = df.select(Multimodal.pngWidth(col("blob")), Multimodal.pngHeight(col("blob"))).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 32)
  }

  test("mediaMeta struct: bytes, format, hash, guarded dims") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, pngHeader ++ "x".getBytes),
      (2L, "just text".getBytes),
      (3L, jpegFull ++ "entropy".getBytes)).toDF("id", "blob")
    val rows = df.select(col("id"), Multimodal.mediaMeta(col("blob")).as("m"))
      .select("id", "m.n_bytes", "m.format", "m.width", "m.height").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == pngHeader.length + 1)
    assert(byId(1L).getString(2) == "png")
    assert(byId(1L).getInt(3) == 64 && byId(1L).getInt(4) == 32)
    assert(byId(2L).getString(2) == "unknown")
    assert(byId(2L).isNullAt(3) && byId(2L).isNullAt(4)) // dims only for png/jpeg
    assert(byId(3L).getString(2) == "jpeg")
    assert(byId(3L).getInt(3) == 96 && byId(3L).getInt(4) == 48)
  }

  test("JPEG SOF walk: geometry recovered, truncated/markerless blobs yield NULL") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, jpegFull),
      (2L, jpegHeader ++ "payload".getBytes), // sniffs jpeg but has no SOF
      (3L, "text".getBytes)).toDF("id", "blob")
    val rows = df.select(col("id"),
      Multimodal.jpegWidth(col("blob")).as("w"),
      Multimodal.jpegHeight(col("blob")).as("h")).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 96 && byId(1L).getInt(2) == 48)
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2))
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2))
    // direct parse used by the stub decoder agrees
    assert(graft.functions.JpegDims.parse(jpegFull).contains((96, 48)))
    assert(graft.functions.JpegDims.parse("nope".getBytes).isEmpty)
  }

  test("JPEG SOF with a declared length too short for geometry yields NULL, not garbage") {
    // SOI + SOF0 claiming len=4 (< 7 needed for precision+height+width),
    // followed by plausible trailing bytes that a naive reader would
    // misinterpret as geometry
    val corrupt = Array[Byte](
      0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xC0.toByte, 0x00, 0x04, 0x08, 0x00,
      0x30, 0x00, 0x60, 0x01, 0x01, 0x11, 0x00)
    assert(graft.functions.JpegDims.parse(corrupt).isEmpty,
      "corrupt SOF (len < 7) must not read the next segment's bytes as w/h")
  }

  // RIFF/WAVE with a LIST chunk BEFORE fmt (PCM stereo 48 kHz 16-bit) —
  // a fixed-offset reader would land inside LIST and mis-parse
  private val wavHeader: Array[Byte] = Array[Byte](
    'R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
    'L', 'I', 'S', 'T', 0x06, 0, 0, 0, 'I', 'N', 'F', 'O', 'a', 'b',
    'f', 'm', 't', ' ', 0x10, 0, 0, 0,
    0x01, 0x00, 0x02, 0x00, 0x80.toByte, 0xBB.toByte, 0x00, 0x00,
    0x00, 0xEE.toByte, 0x02, 0x00, 0x04, 0x00, 0x10, 0x00,
    'd', 'a', 't', 'a', 0, 0, 0, 0)

  test("WAV chunk walk: fmt found past a LIST chunk; corrupt/truncated yield NULL") {
    import graft.functions.WavInfo
    assert(WavInfo.parse(wavHeader ++ "samples".getBytes).contains((48000, 2, 16)))
    // odd-size leading chunk: the pad byte must be skipped to stay aligned
    val oddChunk = Array[Byte]('J', 'U', 'N', 'K', 0x03, 0, 0, 0, 1, 2, 3, 0) // 3 + pad
    val padded = wavHeader.take(12) ++ oddChunk ++ wavHeader.drop(26)
    assert(WavInfo.parse(padded).contains((48000, 2, 16)))
    // not RIFF / not WAVE / truncated before fmt payload
    assert(WavInfo.parse("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(WavInfo.parse("plain".getBytes).isEmpty)
    assert(WavInfo.parse(wavHeader.take(34)).isEmpty)
    // declared fmt size too small to contain the PCM fields
    val badFmt = wavHeader.clone
    badFmt(30) = 0x08 // fmt size 8 < 16
    assert(WavInfo.parse(badFmt).isEmpty)
    // zero channels marks a corrupt header, not an exotic file
    val zeroCh = wavHeader.clone
    zeroCh(36) = 0x00
    assert(WavInfo.parse(zeroCh).isEmpty)
  }

  test("wav Column accessors ride the same parse; non-riff rows are NULL") {
    val df = Seq(
      (1L, wavHeader ++ "audio".getBytes),
      (2L, "not audio".getBytes)).toDF("id", "blob")
    val rows = df.select(col("id"),
      Multimodal.wavSampleRate(col("blob")).as("r"),
      Multimodal.wavChannels(col("blob")).as("c"),
      Multimodal.wavBitsPerSample(col("blob")).as("b"),
      Multimodal.mediaMeta(col("blob")).getField("sample_rate").as("m")).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 48000 && byId(1L).getInt(2) == 2 && byId(1L).getInt(3) == 16)
    assert(byId(1L).getInt(4) == 48000)
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2) && byId(2L).isNullAt(3))
    assert(byId(2L).isNullAt(4))
  }

  test("Column builders are self-contained: fresh session, no register() call") {
    // newSession() has its own function registry — call_function-based
    // builders would fail analysis here with an undefined-function error
    val s2 = spark.newSession()
    import s2.implicits._
    val df = Seq((1L, jpegFull)).toDF("id", "blob")
    val r = df.select(
      Multimodal.jpegWidth(col("blob")).as("w"),
      graft.functions.GraftFunctions.simhash64(split(lit("a b c"), " ")).as("s")).head()
    assert(r.getInt(0) == 96)
    assert(!r.isNullAt(1))
  }

  test("decodeBatch streams partitions through the (stub) decoder with a typed schema") {
    val df = Seq(
      (10L, pngHeader ++ "pixels".getBytes),
      (11L, "not an image".getBytes)).toDF("doc_id", "blob").repartition(2)
    val decoded = Multimodal.decodeBatch(df, "doc_id", "blob")
    assert(decoded.schema.fieldNames.toSeq ==
      Seq("id", "format", "width", "height", "pixelsHash"))
    val byId = decoded.collect().map(d => d.id -> d).toMap
    assert(byId(10L).format == "png")
    assert(byId(10L).width == 64 && byId(10L).height == 32)
    assert(byId(11L).format == "unknown")
    assert(byId(11L).width > 0 && byId(11L).height > 0) // deterministic fake
    // determinism: same bytes -> same decode
    val again = Multimodal.decodeBatch(df, "doc_id", "blob").collect().map(d => d.id -> d).toMap
    assert(again == byId)
  }

  test("PNG codec round-trips every filter type and channel layout exactly") {
    import graft.functions.PngCodec
    val rnd = new scala.util.Random(7)
    // height 10 spans filters 0-4 twice; widths hit odd strides
    for (channels <- Seq(1, 2, 3, 4); width <- Seq(1, 5, 16)) {
      val px = Array.fill[Byte](width * 10 * channels)(rnd.nextInt(256).toByte)
      val png = PngCodec.encode8(width, 10, channels, px)
      val Some((w, h, ch, out)) = PngCodec.decode8(png)
      assert((w, h, ch) == (width, 10, channels))
      assert(out.toSeq == px.toSeq,
        s"filter reversal corrupted pixels at channels=$channels width=$width")
    }
  }

  test("PNG decode rejects corrupt / unsupported / truncated input as None") {
    import graft.functions.PngCodec
    val good = PngCodec.encode8(8, 4, 1, Array.fill[Byte](32)(9))
    assert(PngCodec.decode8(good).isDefined)
    // chunk-building helpers mirroring the PNG framing
    def be32(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunkOf(tag: String, body: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      be32(body.length) ++ tag.getBytes("US-ASCII") ++ body ++ be32(crc.getValue.toInt)
    }
    def readLen(o: Int) = ((good(o) & 0xff) << 24) | ((good(o + 1) & 0xff) << 16) |
      ((good(o + 2) & 0xff) << 8) | (good(o + 3) & 0xff)
    val sig = good.take(8)
    val ihdrBody = good.slice(16, 16 + readLen(8))
    val idatOff = 8 + 12 + readLen(8)
    val idatBody = good.slice(idatOff + 8, idatOff + 8 + readLen(idatOff))
    // a VALIDLY-FRAMED IDAT whose body is a strict prefix of the zlib
    // stream (length + CRC recomputed): exercises the inflate loop's
    // truncated-stream exit, not the chunk bounds check
    val truncated = sig ++ chunkOf("IHDR", ihdrBody) ++
      chunkOf("IDAT", idatBody.take(idatBody.length / 2)) ++
      chunkOf("IEND", Array.emptyByteArray)
    assert(PngCodec.decode8(truncated).isEmpty, "truncated zlib stream inside IDAT")
    // a zlib header with the FDICT bit set (0x78 0x20 — checksum-valid):
    // never legal in PNG; the decoder must reject it, not spin forever
    // waiting for a preset dictionary
    val fdict = sig ++ chunkOf("IHDR", ihdrBody) ++
      chunkOf("IDAT", Array[Byte](0x78, 0x20)) ++
      chunkOf("IEND", Array.emptyByteArray)
    assert(PngCodec.decode8(fdict).isEmpty, "FDICT stream must be rejected")
    // corrupt the IDAT CRC (zlib body untouched): framing check must fire
    val badCrc = good.clone()
    badCrc(idatOff + 8 + readLen(idatOff)) = (badCrc(idatOff + 8 + readLen(idatOff)) ^ 0x01).toByte
    assert(PngCodec.decode8(badCrc).isEmpty, "corrupt chunk CRC accepted")
    // dropping 17 bytes cuts the IDAT framing: bounds check must fire
    assert(PngCodec.decode8(good.dropRight(17)).isEmpty, "chunk runs past the buffer")
    // a declared chunk length near Int.MaxValue must not overflow the
    // bounds check into an out-of-bounds read
    val hugeLen = sig ++ chunkOf("IHDR", ihdrBody) ++
      (be32(0x7ffffff0) ++ "IDAT".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4))
    assert(PngCodec.decode8(hugeLen).isEmpty, "overflowing length field")
    assert(PngCodec.decode8("not a png at all".getBytes).isEmpty)
    assert(PngCodec.decode8(pngHeader ++ "garbage-idat".getBytes).isEmpty,
      "header-only blob has no decodable IDAT")
    // interlace=1 with a RECOMPUTED CRC, so the profile gate (not the
    // CRC check) is what rejects it
    val ihdrInterlaced = ihdrBody.clone(); ihdrInterlaced(12) = 1
    val interlaced = sig ++ chunkOf("IHDR", ihdrInterlaced) ++
      chunkOf("IDAT", idatBody) ++ chunkOf("IEND", Array.emptyByteArray)
    assert(PngCodec.decode8(interlaced).isEmpty, "Adam7 outside the supported profile")
  }

  test("decodeBatch PNG path hashes DECODED samples, not the compressed bytes") {
    import graft.functions.PngCodec
    val px = Array.tabulate[Byte](16 * 8)(i => ((i * 13 + 5) % 256).toByte)
    val df = Seq((1L, PngCodec.encode8(16, 8, 1, px))).toDF("doc_id", "blob")
    val d = Multimodal.decodeBatch(df, "doc_id", "blob").collect().head
    assert(d.format == "png" && d.width == 16 && d.height == 8)
    // pixelsHash is the FNV of DECODED samples — recompute independently
    var expect = 0xcbf29ce484222325L
    px.foreach { b => expect ^= (b & 0xffL); expect *= 0x100000001b3L }
    assert(d.pixelsHash == expect, "pixelsHash is not the decoded-sample hash")
  }

  test("decodeBatch JPEG path hashes DECODED samples for in-profile streams") {
    import graft.functions.{JpegCodec, Multimodal}
    import spark.implicits._
    val jpg = JpegCodec.encodeGrayBlocks(2, 1, Array(5, 230))
    val d = Multimodal.decodeBatch(Seq((1L, jpg)).toDF("doc_id", "blob"),
      "doc_id", "blob").collect().head
    assert(d.format == "jpeg" && d.width == 16 && d.height == 8)
    val Some((_, _, _, px)) = JpegCodec.decode(jpg)
    var expect = 0xcbf29ce484222325L
    px.foreach { b => expect ^= (b & 0xffL); expect *= 0x100000001b3L }
    assert(d.pixelsHash == expect, "pixelsHash must be the decoded-sample hash, not the bytes")
  }

  test("JPEG constant-block fixture decodes bit-exactly to the arithmetic rule") {
    import graft.functions.{JpegCodec, JpegGrayFixture, JpegPixelStats}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val id = 42L
    val jpg = JpegGrayFixture(Literal(id), 3, 2).nullSafeEval(id).asInstanceOf[Array[Byte]]
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "SOI framing")
    val Some((w, h, nc, px)) = JpegCodec.decode(jpg)
    assert((w, h, nc) == (24, 16, 1))
    val vals = Array.tabulate(6)(k => ((id * 31 + k * 7) % 256).toInt)
    for (y <- 0 until 16; x <- 0 until 24) {
      val k = (y / 8) * 3 + (x / 8)
      assert((px(y * 24 + x) & 0xff) == vals(k),
        s"pixel ($x,$y) expected block value ${vals(k)}, got ${px(y * 24 + x) & 0xff}")
    }
    val stats = JpegPixelStats(Literal(jpg)).nullSafeEval(jpg)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData].toLongArray()
    assert(stats.toSeq == Seq[Long](24, 16, 384, 64L * vals.map(_.toLong).sum,
      vals.min, vals.max))
  }

  test("JPEG AC coefficients round-trip the entropy path; IDCT matches a reference") {
    import graft.functions.JpegCodec
    // blocks exercising the AC machinery: long zero runs (ZRL), negative
    // values, high-frequency coefficients, saturating DC steps
    val rnd = new scala.util.Random(11)
    val blocks = Array.tabulate(4) { b =>
      val blk = new Array[Int](64)
      blk(0) = rnd.between(-120, 120)
      b match {
        case 0 => blk(1) = 5; blk(8) = -3 // low-frequency ACs
        case 1 => blk(63) = 7 // forces a ZRL chain to the last position
        case 2 => (1 until 64).foreach(i => blk(i) = rnd.between(-9, 10)) // dense
        case 3 => // DC-only
      }
      blk
    }
    val q = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    val jpg = JpegCodec.encodeGrayCoefficients(2, 2, q, blocks)
    val Some((w, h, nc, px)) = JpegCodec.decode(jpg)
    assert((w, h, nc) == (16, 16, 1))
    // reference: independent direct (non-separable) IDCT over the known
    // dequantized coefficients — if the decoder's Huffman/RLE/zigzag/
    // dequant recovered different coefficients, pixels diverge
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (b <- 0 until 4) {
      val coef = Array.tabulate(64)(i => blocks(b)(i).toDouble * q(i))
      val bx = b % 2; val by = b / 2
      for (r <- 0 until 8; cc <- 0 until 8) {
        var acc = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          acc += c(u) * c(v) * coef(v * 8 + u) *
            math.cos((2 * cc + 1) * u * math.Pi / 16) *
            math.cos((2 * r + 1) * v * math.Pi / 16)
        val expect = math.max(0, math.min(255, math.round(acc / 4.0 + 128.0))).toInt
        val got = px((by * 8 + r) * 16 + bx * 8 + cc) & 0xff
        assert(got == expect, s"block $b pixel ($cc,$r): expected $expect got $got")
      }
    }
  }

  test("JPEG 4:4:4 color decode: interleaved MCUs, dual tables, YCbCr to RGB") {
    import graft.functions.JpegCodec
    // constant blocks per component: only DC coefficients, exactly
    // representable, so Y/Cb/Cr planes are known and RGB must equal the
    // JFIF conversion computed independently here
    val qL = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    val qC = Array.tabulate(64)(i => if (i == 0) 8 else 24) // distinct chroma table
    val yv = Array(200, 64); val cbv = Array(90, 180); val crv = Array(160, 60)
    def dcBlocks(vals: Array[Int]) = vals.map { v =>
      val b = new Array[Int](64); b(0) = v - 128; b
    }
    val jpg = JpegCodec.encodeColor444Coefficients(2, 1, qL, qC,
      dcBlocks(yv), dcBlocks(cbv), dcBlocks(crv))
    val Some((w, h, nc, px)) = JpegCodec.decode(jpg)
    assert((w, h, nc) == (16, 8, 3))
    def cl(d: Double): Int = math.max(0, math.min(255, math.round(d))).toInt
    for (y <- 0 until 8; x <- 0 until 16) {
      val b = x / 8
      val (yy, cb, cr) = (yv(b).toDouble, cbv(b) - 128.0, crv(b) - 128.0)
      val expect = (cl(yy + 1.402 * cr), cl(yy - 0.344136 * cb - 0.714136 * cr),
        cl(yy + 1.772 * cb))
      val got = ((px((y * 16 + x) * 3) & 0xff), (px((y * 16 + x) * 3 + 1) & 0xff),
        (px((y * 16 + x) * 3 + 2) & 0xff))
      assert(got == expect, s"pixel ($x,$y): expected $expect got $got")
    }
  }

  test("JPEG 4:2:0 and 4:2:2 subsampling: multi-block MCUs, replication upsampling") {
    import graft.functions.JpegCodec
    val qL = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    val qC = Array.tabulate(64)(i => if (i == 0) 8 else 24)
    def dcBlocks(vals: Array[Int]) = vals.map { v =>
      val b = new Array[Int](64); b(0) = v - 128; b
    }
    def cl(d: Double): Int = math.max(0, math.min(255, math.round(d))).toInt
    // 4:2:0, one MCU: luma 2×2 blocks with distinct constants, one
    // chroma block replicated over all four — every (luma block, chroma)
    // pairing and the block→plane placement inside the MCU is visible
    val yv = Array(200, 64, 30, 150)
    val jpg = JpegCodec.encodeSubsampledCoefficients(1, 1, qL, qC, 2, 2,
      dcBlocks(yv), dcBlocks(Array(90)), dcBlocks(Array(160)))
    val Some((w, h, nc, px)) = JpegCodec.decode(jpg)
    assert((w, h, nc) == (16, 16, 3))
    for (y <- 0 until 16; x <- 0 until 16) {
      val b = (y / 8) * 2 + (x / 8)
      val (yy, cb, cr) = (yv(b).toDouble, 90 - 128.0, 160 - 128.0)
      val expect = (cl(yy + 1.402 * cr), cl(yy - 0.344136 * cb - 0.714136 * cr),
        cl(yy + 1.772 * cb))
      val got = ((px((y * 16 + x) * 3) & 0xff), (px((y * 16 + x) * 3 + 1) & 0xff),
        (px((y * 16 + x) * 3 + 2) & 0xff))
      assert(got == expect, s"4:2:0 pixel ($x,$y): expected $expect got $got")
    }
    // 4:2:2, two MCUs wide: horizontal-only subsampling — luma block is
    // x/8, chroma block x/16, no vertical replication
    val yv2 = Array(10, 240, 77, 130)
    val cbv2 = Array(70, 190); val crv2 = Array(140, 100)
    val jpg2 = JpegCodec.encodeSubsampledCoefficients(2, 1, qL, qC, 2, 1,
      dcBlocks(yv2), dcBlocks(cbv2), dcBlocks(crv2))
    val Some((w2, h2, nc2, px2)) = JpegCodec.decode(jpg2)
    assert((w2, h2, nc2) == (32, 8, 3))
    for (y <- 0 until 8; x <- 0 until 32) {
      val (yy, cb, cr) = (yv2(x / 8).toDouble, cbv2(x / 16) - 128.0, crv2(x / 16) - 128.0)
      val expect = (cl(yy + 1.402 * cr), cl(yy - 0.344136 * cb - 0.714136 * cr),
        cl(yy + 1.772 * cb))
      val got = ((px2((y * 32 + x) * 3) & 0xff), (px2((y * 32 + x) * 3 + 1) & 0xff),
        (px2((y * 32 + x) * 3 + 2) & 0xff))
      assert(got == expect, s"4:2:2 pixel ($x,$y): expected $expect got $got")
    }
    // restart markers count interleaved MCUs (not blocks): restart every
    // MCU with 2×2 luma means a reset after each SIX-block group
    val jpgR = JpegCodec.encodeSubsampledCoefficients(2, 1, qL, qC, 2, 2,
      dcBlocks(Array(10, 250, 13, 99, 180, 7, 33, 201)),
      dcBlocks(Array(90, 90)), dcBlocks(Array(160, 160)), restartInterval = 1)
    val Some((wr, hr, _, _)) = JpegCodec.decode(jpgR)
    assert((wr, hr) == (32, 16))
  }

  test("JPEG 4:2:0 AC coefficients place blocks correctly inside the MCU") {
    import graft.functions.JpegCodec
    // neutral chroma (constant 128 ⇒ DC 0) makes the R channel equal the
    // luma plane exactly (Y + 1.402·0), so a reference IDCT over the
    // known coefficients pins the multi-block-per-MCU placement AND the
    // entropy path under subsampling
    val qL = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    val qC = Array.tabulate(64)(i => if (i == 0) 8 else 24)
    val rnd = new scala.util.Random(13)
    val blocks = Array.tabulate(4) { b =>
      val blk = new Array[Int](64)
      blk(0) = rnd.between(-100, 100)
      if (b % 2 == 0) { blk(1) = 4; blk(8) = -6 }
      else (1 until 64).foreach(i => blk(i) = rnd.between(-5, 6))
      blk
    }
    val neutral = Array.fill(1)(new Array[Int](64))
    val jpg = JpegCodec.encodeSubsampledCoefficients(1, 1, qL, qC, 2, 2,
      blocks, neutral, neutral)
    val Some((w, h, nc, px)) = JpegCodec.decode(jpg)
    assert((w, h, nc) == (16, 16, 3))
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (b <- 0 until 4) {
      val coef = Array.tabulate(64)(i => blocks(b)(i).toDouble * qL(i))
      val bx = b % 2; val by = b / 2
      for (r <- 0 until 8; cc <- 0 until 8) {
        var acc = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          acc += c(u) * c(v) * coef(v * 8 + u) *
            math.cos((2 * cc + 1) * u * math.Pi / 16) *
            math.cos((2 * r + 1) * v * math.Pi / 16)
        val expect = math.max(0, math.min(255, math.round(acc / 4.0 + 128.0))).toInt
        val got = px(((by * 8 + r) * 16 + bx * 8 + cc) * 3) & 0xff
        assert(got == expect, s"block $b pixel ($cc,$r): expected $expect got $got")
      }
    }
  }

  test("JPEG restart markers: predictor resets and byte-aligned resync decode exactly") {
    import graft.functions.JpegCodec
    val q = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    val vals = Array(10, 250, 13, 99, 180, 7) // big DC jumps across restarts
    val blocks = vals.map { v => val b = new Array[Int](64); b(0) = v - 128; b }
    // restart every MCU: maximal marker density, every predictor reset
    for (ri <- Seq(1, 2)) {
      val jpg = JpegCodec.encodeGrayCoefficients(3, 2, q, blocks, restartInterval = ri)
      val Some((w, h, _, px)) = JpegCodec.decode(jpg)
      assert((w, h) == (24, 16))
      for (k <- 0 until 6) {
        val (bx, by) = (k % 3, k / 3)
        assert((px(by * 8 * 24 + bx * 8) & 0xff) == vals(k),
          s"restartInterval=$ri block $k: expected ${vals(k)}")
      }
    }
    // corrupt restart structure: wrong RST index must be refused
    val jpg1 = JpegCodec.encodeGrayCoefficients(3, 2, q, blocks, restartInterval = 1)
    var idx = -1
    for (i <- 2 until jpg1.length - 1)
      if ((jpg1(i) & 0xff) == 0xff && (jpg1(i + 1) & 0xff) == 0xd0 && idx < 0) idx = i
    assert(idx > 0, "fixture must contain RST0")
    val bad = jpg1.clone(); bad(idx + 1) = 0xd5.toByte // RST0 -> RST5, out of sequence
    assert(JpegCodec.decode(bad).isEmpty, "out-of-sequence restart accepted")
  }

  test("JPEG decode rejects out-of-profile and corrupt streams as None") {
    import graft.functions.JpegCodec
    val good = JpegCodec.encodeGrayBlocks(2, 1, Array(10, 200))
    assert(JpegCodec.decode(good).isDefined)
    // progressive SOF2: real format, outside the baseline profile
    val prog = good.clone()
    val sofAt = {
      var i = 2; while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1; i
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "progressive must be refused, not misdecoded")
    // truncated entropy segment
    assert(JpegCodec.decode(good.dropRight(8)).isEmpty, "truncated scan accepted")
    // zero quant entry = division garbage downstream: reject at DQT
    val zq = good.clone()
    val dqtAt = {
      var i = 2; while (!((zq(i) & 0xff) == 0xff && (zq(i + 1) & 0xff) == 0xdb)) i += 1; i
    }
    zq(dqtAt + 5) = 0
    assert(JpegCodec.decode(zq).isEmpty, "zero quantizer accepted")
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty, "SOI alone")
    // a 100-byte header declaring a huge image must not allocate planes
    val bomb = good.clone()
    bomb(sofAt + 5) = 0x7f; bomb(sofAt + 6) = 0xff.toByte // height 32767
    bomb(sofAt + 7) = 0x7f; bomb(sofAt + 8) = 0xff.toByte // width 32767
    assert(JpegCodec.decode(bomb).isEmpty, "decompression-bomb geometry accepted")
  }

  test("FFT matches a direct DFT; spectral stats obey Parseval and find the planted tone") {
    import graft.functions.{Fft, WavSpectralStats, WavToneFixture, WavPcmFixture}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    // FFT vs an O(n²) direct DFT on deterministic pseudo-random input
    val rnd = new scala.util.Random(7)
    val n = 64
    val x = Array.fill(n)(rnd.between(-2048, 2048).toDouble)
    val re = x.clone(); val im = new Array[Double](n)
    Fft.transform(re, im)
    for (k <- 0 until n) {
      var dr = 0.0; var di = 0.0
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        dr += x(t) * math.cos(a); di += x(t) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-6 && math.abs(im(k) - di) < 1e-6,
        s"bin $k: fft (${re(k)},${im(k)}) vs dft ($dr,$di)")
    }
    // Parseval on the sawtooth fixture: parseval_total == frameLen·Σx²
    // over full frames, computed integer-exactly from the rule
    for (id <- 0L until 8L) {
      val wav = WavPcmFixture(Literal(id)).nullSafeEval(id).asInstanceOf[Array[Byte]]
      val st = WavSpectralStats(Literal(wav), 64, 8).nullSafeEval(wav)
        .asInstanceOf[ArrayData].toLongArray()
      val len = 160 + (id % 8).toInt * 16
      val nf = len / 64
      val sumsq = (0 until nf * 64).map { i =>
        val v = (((id * 31 + i.toLong * 7) % 4096 + 4096) % 4096) - 2048
        v * v
      }.sum
      assert(st(0) == nf, s"id=$id frames")
      assert(st(1) == 64L * sumsq, s"id=$id parseval: ${st(1)} vs ${64L * sumsq}")
      // the 8 band energies + DC + (mirrored) upper half partition the
      // total: bands cover one-sided bins only, so 2·Σbands bounds it
      assert(st.drop(4).sum <= st(1), "band energies exceed total")
    }
    // planted pure tone: measured argmax bin equals the rule's bin and
    // carries ≥ 90% of one-sided energy
    for (id <- 0L until 8L) {
      val wav = WavToneFixture(Literal(id)).nullSafeEval(id).asInstanceOf[Array[Byte]]
      val st = WavSpectralStats(Literal(wav), 256, 8).nullSafeEval(wav)
        .asInstanceOf[ArrayData].toLongArray()
      assert(st(2) == 3 + (id % 8), s"id=$id peak bin ${st(2)}")
      assert(st(3) >= 90, s"id=$id tone not dominant: ${st(3)}%")
    }
    // degenerate input: shorter than one frame → NULL
    val shortWav = WavPcmFixture(Literal(0L)).nullSafeEval(0L).asInstanceOf[Array[Byte]]
    assert(WavSpectralStats(Literal(shortWav), 512, 8).nullSafeEval(shortWav) == null)
  }

  test("audio fingerprint: volume/requantize invariant, structure sensitive, short clip null") {
    import graft.functions.{WavAudioFingerprint, WavMelodyFixture, WavScaleAmplitude,
      WavRequantize, WavPcmFixture}
    import org.apache.spark.sql.catalyst.expressions.Literal
    def melody(id: Long) = WavMelodyFixture(Literal(id)).nullSafeEval(id)
      .asInstanceOf[Array[Byte]]
    def fp(b: Array[Byte]) = WavAudioFingerprint(Literal(b)).nullSafeEval(b)
      .asInstanceOf[Long]
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (id <- 0L until 12L) {
      val w = melody(id)
      val h = fp(w)
      // halving the volume scales every band energy by one constant —
      // the double difference cancels it (≤ rounding noise)
      val scaled = WavScaleAmplitude(Literal(w), 1, 2).nullSafeEval(w)
        .asInstanceOf[Array[Byte]]
      assert(ham(h, fp(scaled)) <= 4, s"id=$id volume change moved the fingerprint")
      // 8-bit requantization: wideband noise far below the band signal
      val rq = WavRequantize(Literal(w), 8).nullSafeEval(w).asInstanceOf[Array[Byte]]
      assert(ham(h, fp(rq)) <= 4, s"id=$id requantization moved the fingerprint")
    }
    // structurally different clips are far apart
    val hs = (0L until 12L).map(id => fp(melody(id)))
    for (i <- hs.indices; j <- i + 1 until hs.size)
      assert(ham(hs(i), hs(j)) >= 5, s"distinct clips $i,$j too close: ${ham(hs(i), hs(j))}")
    // a clip shorter than the 9 frames the 64 bits need → NULL, not a
    // mostly-padding fingerprint that collides everything
    val short0 = WavPcmFixture(Literal(0L)).nullSafeEval(0L).asInstanceOf[Array[Byte]]
    assert(WavAudioFingerprint(Literal(short0)).nullSafeEval(short0) == null)
    assert(WavAudioFingerprint(Literal("junk".getBytes)).nullSafeEval("junk".getBytes) == null)
  }

  test("WAV PCM fixture round-trips through parsePcm; stats match the sample rule") {
    import graft.functions.{WavInfo, WavPcmFixture, WavPcmStats}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val id = 13L
    val wav = WavPcmFixture(Literal(id)).nullSafeEval(id).asInstanceOf[Array[Byte]]
    // the fixture leads with a JUNK chunk — the geometry walker must
    // still find fmt (guards against fixed-offset parsing regressions)
    assert(WavInfo.parse(wav).contains((8000, 1, 16)))
    val Some((rate, ch, bits, s)) = WavInfo.parsePcm(wav)
    assert((rate, ch, bits) == (8000, 1, 16))
    val n = 160 + (id % 8).toInt * 16
    assert(s.length == n)
    val rule = (0 until n).map(i => (((id * 31 + i * 7) % 4096).toInt) - 2048)
    assert(s.toSeq == rule, "decoded samples must follow the arithmetic rule")
    val stats = WavPcmStats(Literal(wav)).nullSafeEval(wav)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData].toLongArray()
    assert(stats.toSeq == Seq[Long](8000, 1, 16, n, rule.map(_.toLong).sum,
      rule.min, rule.max, rule.map(v => v.toLong * v).sum))
  }

  test("parsePcm rejects non-PCM, truncated-data and unsupported-width blobs") {
    import graft.functions.{WavInfo, WavPcmFixture}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val wav = WavPcmFixture(Literal(1L)).nullSafeEval(1L).asInstanceOf[Array[Byte]]
    // data chunk declares more bytes than the blob carries → corrupt
    assert(WavInfo.parsePcm(wav.dropRight(10)).isEmpty, "overrunning data chunk accepted")
    // format code 2 (ADPCM): coded audio, not raw samples — must refuse
    val adpcm = wav.clone(); adpcm(32) = 2
    assert(WavInfo.parsePcm(adpcm).isEmpty, "non-PCM format decoded as PCM")
    assert(WavInfo.parse(adpcm).isDefined, "geometry walk still reads the fmt header")
    // 24-bit declared width: outside the supported profile
    val w24 = wav.clone(); w24(46) = 24
    assert(WavInfo.parsePcm(w24).isEmpty, "unsupported sample width accepted")
    // 8-bit path: excess-128 bytes decode centered
    val mono8 = Array[Byte]('R', 'I', 'F', 'F', 30, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0x40, 0x1F, 0, 0, 0x40, 0x1F, 0, 0, 1, 0, 8, 0,
      'd', 'a', 't', 'a', 3, 0, 0, 0, 0x80.toByte, 0x00, 0xFF.toByte, 0x00)
    val Some((r8, c8, b8, s8)) = WavInfo.parsePcm(mono8)
    assert((r8, c8, b8) == (8000, 1, 8) && s8.toSeq == Seq(0, -128, 127))
    assert(WavInfo.parsePcm("RIFFxxxxWAVE".getBytes).isEmpty, "no chunks → no decode")
    // a declared chunk size near Int.MaxValue must terminate the walk as
    // corrupt, not wrap the cursor negative and read out of bounds
    val bomb = Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F)
    assert(WavInfo.parse(bomb).isEmpty, "overflowing chunk size accepted by parse")
    assert(WavInfo.parsePcm(bomb).isEmpty, "overflowing chunk size accepted by parsePcm")
  }

  test("resize kernels: identity, exact 2x box mean, nearest duplication, channel independence") {
    import graft.functions.ImageOps
    val w = 6; val h = 4
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    // identity geometry is a no-op for both kernels
    assert(ImageOps.resizeNearest(px, w, h, 1, w, h).toSeq == px.toSeq)
    assert(ImageOps.resizeBilinear(px, w, h, 1, w, h).toSeq == px.toSeq)
    // 2x downscale bilinear == round-half-up mean of each 2x2 block
    val down = ImageOps.resizeBilinear(px, w, h, 1, w / 2, h / 2)
    for (y <- 0 until h / 2; x <- 0 until w / 2) {
      val s = (px((2 * y) * w + 2 * x) & 0xff) + (px((2 * y) * w + 2 * x + 1) & 0xff) +
        (px((2 * y + 1) * w + 2 * x) & 0xff) + (px((2 * y + 1) * w + 2 * x + 1) & 0xff)
      assert((down(y * (w / 2) + x) & 0xff) == (s + 2) / 4, s"bilinear 2x down at ($x,$y)")
    }
    // 2x upscale nearest duplicates each source pixel into a 2x2 block
    val up = ImageOps.resizeNearest(px, w, h, 1, 2 * w, 2 * h)
    for (y <- 0 until 2 * h; x <- 0 until 2 * w)
      assert(up(y * 2 * w + x) == px((y / 2) * w + x / 2), s"nearest 2x up at ($x,$y)")
    // non-integer scale: source index follows the half-pixel integer map
    val odd = ImageOps.resizeNearest(px, w, h, 1, 4, 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      val sx = ((2 * x + 1) * w) / (2 * 4); val sy = ((2 * y + 1) * h) / (2 * 3)
      assert(odd(y * 4 + x) == px(sy * w + sx))
    }
    // channels resize independently and stay interleaved
    val rgb = Array.tabulate(w * h * 3)(i => ((i % 3) * 50 + (i / 3) * 9 % 128).toByte)
    val rgbDown = ImageOps.resizeBilinear(rgb, w, h, 3, w / 2, h / 2)
    for (c <- 0 until 3) {
      val plane = Array.tabulate(w * h)(i => rgb(i * 3 + c))
      val planeDown = ImageOps.resizeBilinear(plane, w, h, 1, w / 2, h / 2)
      for (i <- 0 until (w / 2) * (h / 2))
        assert(rgbDown(i * 3 + c) == planeDown(i), s"channel $c drifted under interleave")
    }
  }

  test("PngResize expression re-encodes a real PNG whose pixels are the kernel output") {
    import graft.functions.{ImageOps, PngCodec, PngGrayFixture, PngResize}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val id = 23L
    val src = PngGrayFixture(Literal(id), 16, 8).nullSafeEval(id).asInstanceOf[Array[Byte]]
    val Some((_, _, _, srcPx)) = PngCodec.decode8(src)
    val out = PngResize(Literal(src), 8, 4, bilinear = true).nullSafeEval(src)
      .asInstanceOf[Array[Byte]]
    val Some((ow, oh, ch, outPx)) = PngCodec.decode8(out)
    assert((ow, oh, ch) == (8, 4, 1))
    assert(outPx.toSeq == ImageOps.resizeBilinear(srcPx, 16, 8, 1, 8, 4).toSeq)
    // garbage input → NULL, not a crash; absurd output geometry → NULL
    assert(PngResize(Literal("junk".getBytes), 4, 4, bilinear = false)
      .nullSafeEval("junk".getBytes) == null)
    assert(PngResize(Literal(src), 1 << 14, 1 << 14, bilinear = false)
      .nullSafeEval(src) == null, "bomb-cap geometry must be refused")
  }

  test("splitFrames round-trips a concatenated container; junk framing is refused") {
    import graft.functions.{ImageOps, PngCodec, PngFramesFixture}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val id = 7L // nf = 4 + 7%3 = 5
    val blob = PngFramesFixture(Literal(id), 8, 4).nullSafeEval(id).asInstanceOf[Array[Byte]]
    val Some(frames) = ImageOps.splitFrames(blob)
    assert(frames.length == 5)
    for (f <- frames.indices) {
      val Some((w, h, ch, px)) = PngCodec.decode8(frames(f))
      assert((w, h, ch) == (8, 4, 1))
      val rule = (0 until 32).map(i => (((id * 31 + f * 97 + i * 7) % 256).toInt).toByte)
      assert(px.toSeq == rule, s"frame $f pixels must follow the per-frame rule")
    }
    // the whole blob must be consumed: trailing junk is corruption
    assert(ImageOps.splitFrames(blob ++ Array[Byte](1, 2, 3)).isEmpty)
    // a truncated last frame is corruption, not a shorter video
    assert(ImageOps.splitFrames(blob.dropRight(4)).isEmpty)
    assert(ImageOps.splitFrames(Array.emptyByteArray).isEmpty)
  }

  test("WavFrameStats matches direct framing/zero-crossing math; degenerate input is NULL") {
    import graft.functions.{WavFrameStats, WavPcmFixture}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val id = 5L
    val wav = WavPcmFixture(Literal(id)).nullSafeEval(id).asInstanceOf[Array[Byte]]
    val n = 160 + (id % 8).toInt * 16
    val s = (0 until n).map(i => (((id * 31 + i * 7) % 4096).toInt) - 2048)
    val zc = (1 until n).count(i => (s(i - 1) < 0) != (s(i) < 0)).toLong
    val energies = s.grouped(64).filter(_.size == 64)
      .map(_.map(v => v.toLong * v).sum).toSeq
    val got = WavFrameStats(Literal(wav), 64).nullSafeEval(wav)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData].toLongArray()
    assert(got.toSeq == Seq((n / 64).toLong, zc, energies.max, energies.min))
    // frame longer than the signal → no full frame → NULL
    assert(WavFrameStats(Literal(wav), 100000).nullSafeEval(wav) == null)
    assert(WavFrameStats(Literal("junk".getBytes), 64).nullSafeEval("junk".getBytes) == null)
  }

  test("WavQualityStats: silence and clipping counted exactly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // minimal mono 16-bit PCM writer (mirrors the fixture layout)
    def wav(samples: Array[Int]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      def put(o: Int, s: String): Unit = s.zipWithIndex.foreach { case (c, i) => out(o + i) = c.toByte }
      def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
      def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
      put(0, "RIFF"); le32(4, 36 + dataLen); put(8, "WAVE")
      put(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
      le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
      put(36, "data"); le32(40, dataLen)
      samples.zipWithIndex.foreach { case (v, i) => le16(44 + 2 * i, v & 0xffff) }
      out
    }
    def q(b: Array[Byte]): Array[Long] =
      graft.functions.WavQualityStats(Literal(b), 1000, 100L, 4)
        .nullSafeEval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray()
    // 8 zero samples: 2 frames, both silent, none clipped
    assert(q(wav(Array.fill(8)(0))).toSeq == Seq(8L, 0L, 2L, 2L))
    // loud clipped signal: |1200| >= 1000 everywhere; energy >> 100
    assert(q(wav(Array.fill(8)(1200))).toSeq == Seq(8L, 8L, 2L, 0L))
    // negative clipping counts too; mixed frames: first frame quiet
    // (energy 4·25=100? no: 5²·4=100 — NOT < 100), second loud
    assert(q(wav(Array(4, 4, 4, 4, -1200, 1200, -1200, 1200))).toSeq ==
      Seq(8L, 4L, 2L, 1L), "frame of 4s has energy 64 < 100 -> silent")
    // shorter than one frame -> NULL
    assert(graft.functions.WavQualityStats(Literal(wav(Array(1))), 1000, 100L, 4)
      .nullSafeEval(wav(Array(1))) == null)
  }

  test("PngSharpness: blur ranks below texture; constant = 0; edge cases") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def moments(png: Array[Byte]): Option[(Long, Long, Long)] =
      Option(graft.functions.PngSharpness(Literal(png)).nullSafeEval(png)).map { r =>
        val a = r.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .toLongArray()
        (a(0), a(1), a(2))
      }
    def lapVar(png: Array[Byte]): Double = {
      val (n, s, ss) = moments(png).get
      ss.toDouble / n - (s.toDouble / n) * (s.toDouble / n)
    }
    // constant image: every Laplacian is 0
    val flat = graft.functions.PngCodec.encode8(8, 8, 1, Array.fill[Byte](64)(100.toByte))
    assert(moments(flat).get == ((36L, 0L, 0L)))
    // checkerboard (sharpest possible texture) scores high; its 2×2
    // block-upscaled version (a "blurrier" rendition of the same
    // pattern) scores LOWER — the discrimination the screen exists for
    val checker = graft.functions.PngCodec.encode8(8, 8, 1,
      Array.tabulate[Byte](64)(i => if ((i / 8 + i % 8) % 2 == 0) 0 else 255.toByte))
    val blocky = graft.functions.PngCodec.encode8(8, 8, 1,
      Array.tabulate[Byte](64)(i => if ((i / 16 + (i % 8) / 2) % 2 == 0) 0 else 255.toByte))
    assert(lapVar(checker) > lapVar(blocky) && lapVar(blocky) > 0.0,
      s"checker ${lapVar(checker)} vs blocky ${lapVar(blocky)}")
    // linear ramp: interior Laplacians are exactly 0 (second derivative)
    val ramp = graft.functions.PngCodec.encode8(8, 8, 1, Array.tabulate[Byte](64)(i => (i % 8 * 10).toByte))
    assert(moments(ramp).get == ((36L, 0L, 0L)))
    // no interior → NULL; junk bytes → NULL
    val tiny = graft.functions.PngCodec.encode8(2, 2, 1, Array.fill[Byte](4)(7))
    assert(moments(tiny).isEmpty)
    assert(graft.functions.PngSharpness(Literal("junk".getBytes))
      .nullSafeEval("junk".getBytes) == null)
  }
}
