package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pure-JVM PNG codec (PNG spec, RFC 2083 / W3C PNG second edition):
  * real zlib streams via `java.util.zip.Deflater`/`Inflater`, real
  * per-scanline filter application and reversal (all five filter types
  * 0-4 including Paeth), CRC-checked chunk framing. No external codec
  * library — this is the offline replacement for the formerly-stubbed
  * PNG decode path: geometry AND pixels now come from an actual decode.
  *
  * Scope: 8-bit-depth, non-interlaced images in the four byte-aligned
  * color layouts (gray, gray+alpha, RGB, RGBA — color types 0/4/2/6).
  * Palette and sub-byte depths return None rather than guessing.
  */
object PngCodec {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }
  private def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    case n => throw new IllegalArgumentException(s"unsupported channel count $n")
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String, body: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tagB = tag.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tagB); crc.update(body)
    out.write(be32(body.length)); out.write(tagB); out.write(body)
    out.write(be32(crc.getValue.toInt))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit samples (row-major, `channels` interleaved bytes per
    * pixel) as a real PNG. Each row r carries filter type r % 5 — the
    * encoder exercises every filter so a decoder that mishandles any of
    * them produces wrong pixels, not a wrong-looking file. */
  def encode8(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    val bpp = channels
    val stride = width * bpp
    require(pixels.length == stride * height,
      s"expected ${stride * height} samples, got ${pixels.length}")
    val raw = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      val ft = r % 5
      raw((stride + 1) * r) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(stride * r + i) & 0xff
        val a = if (i >= bpp) pixels(stride * r + i - bpp) & 0xff else 0
        val b = if (r > 0) pixels(stride * (r - 1) + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) pixels(stride * (r - 1) + i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw((stride + 1) * r + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height).put(8.toByte)
      .put(colorTypeOf(channels).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG: chunk walk → concatenated IDAT → Inflater → filter
    * reversal. Returns (width, height, channels, samples) or None for
    * anything outside the supported profile (or corrupt). */
  def decode8(b: Array[Byte], maxSamples: Long = 1L << 26): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 8 + 25 || !Signature.indices.forall(i => b(i) == Signature(i))) return None
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var o = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && o + 8 <= b.length) {
      val len = be32(o)
      // Long arithmetic: a crafted length near Int.MaxValue would wrap
      // the Int sum negative and slip past the bound straight into an
      // out-of-bounds read
      if (len < 0 || o.toLong + 12L + len > b.length) return None
      val tag = new String(b, o + 4, 4, "US-ASCII")
      // CRC check on the chunks we consume — corrupt framing is rejected,
      // not silently decoded
      if (tag == "IHDR" || tag == "IDAT") {
        val crc = new java.util.zip.CRC32()
        crc.update(b, o + 4, 4 + len)
        if (crc.getValue.toInt != be32(o + 8 + len)) return None
      }
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(o + 8); height = be32(o + 12)
          val bitDepth = b(o + 16) & 0xff
          channels = channelsOf(b(o + 17) & 0xff)
          val interlace = b(o + 20) & 0xff
          if (bitDepth != 8 || channels < 0 || interlace != 0) return None
          // decompression-bomb guard: the declared geometry bounds every
          // allocation below (raw + px ≈ 2×samples). 2^26 samples ≈ 64 MB
          // per buffer by default — a crafted ~100-byte header cannot
          // trigger multi-hundred-MB allocations on a scanning executor.
          if (width <= 0 || height <= 0 || width.toLong * height * channels > maxSamples) return None
        case "IDAT" =>
          // IDAT before IHDR is invalid framing, and accumulated
          // compressed bytes are bounded by what the declared geometry
          // could legitimately decompress to: raw filtered size plus the
          // deflate stored-block worst case (~5 bytes / 64 KiB) and the
          // 6-byte zlib envelope. Anything past that is a bomb or junk.
          if (width < 0) return None
          val rawCap = (width.toLong * channels + 1L) * height
          if (idat.size().toLong + len > rawCap + rawCap / 1000L + 1024L) return None
          idat.write(b, o + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      o += 12 + len
    }
    if (width < 0 || idat.size() == 0) return None
    val bpp = channels
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // 0 bytes with output space left means the stream is truncated
        // (needsInput) or demands a preset dictionary (FDICT — never valid
        // in PNG); both are unrecoverable, and looping on would spin
        // forever
        if (n == 0) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got != raw.length) return None
    val px = new Array[Byte](stride * height)
    var r = 0
    while (r < height) {
      val ft = raw((stride + 1) * r) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val f = raw((stride + 1) * r + 1 + i) & 0xff
        val a = if (i >= bpp) px(stride * r + i - bpp) & 0xff else 0
        val bb = if (r > 0) px(stride * (r - 1) + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) px(stride * (r - 1) + i - bpp) & 0xff else 0
        val x = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + bb
          case 3 => f + (a + bb) / 2
          case 4 => f + paeth(a, bb, c)
        }
        px(stride * r + i) = (x & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some((width, height, channels, px))
  }
}

/** id → real grayscale PNG fixture: pixel i of a width×height image is
  * (id·31 + i·7) mod 256 — an arithmetic rule an external oracle can
  * evaluate without a codec, while the bytes themselves are a genuine
  * deflate-compressed, filter-rotated PNG. */
case class PngGrayFixture(child: Expression, imgWidth: Int, imgHeight: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_gray_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_gray_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val px = new Array[Byte](imgWidth * imgHeight)
    var i = 0
    while (i < px.length) {
      px(i) = (((id * 31 + i.toLong * 7) % 256 + 256) % 256).toByte
      i += 1
    }
    PngCodec.encode8(imgWidth, imgHeight, 1, px)
  }

  override protected def withNewChildInternal(newChild: Expression): PngGrayFixture =
    copy(child = newChild)
}

/** PNG blob → array(width, height, n_samples, sample_sum, sample_min,
  * sample_max) computed from the DECODED samples (real inflate + filter
  * reversal — a decoder bug in any filter type corrupts the stats).
  * NULL for non-PNG / unsupported / corrupt input. */
case class PngPixelStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "png_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_pixel_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PngCodec.decode8(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, _, px)) =>
        // px is never empty: decode8 rejects non-positive dimensions
        var sum = 0L; var mn = 255L; var mx = 0L
        var i = 0
        while (i < px.length) {
          val v = (px(i) & 0xff).toLong
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        new GenericArrayData(Array(w.toLong, h.toLong, px.length.toLong, sum, mn, mx))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}

/** Laplacian sharpness moments of a decoded PNG (Pech-Pacheco et al.
  * 2000 — "variance of Laplacian", the standard no-reference blur/
  * focus screen for image curation: screenshots of text score high,
  * out-of-focus or upscaled photos score near zero). For every
  * INTERIOR pixel of channel 0: v = 4·p − left − right − up − down;
  * returns [n_interior, Σv, Σv²] as exact longs — variance is the
  * caller's one division, so the oracle compares integers, not
  * accumulated floats. NULL for undecodable bytes or images with no
  * interior (w or h < 3). In-scan per-row kernel. */
case class PngSharpness(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "png_sharpness"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_sharpness requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PngCodec.decode8(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, c, px)) if w >= 3 && h >= 3 =>
        val stride = w * c
        var n = 0L; var sum = 0L; var sumsq = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val i = y * stride + x * c
            val v = 4L * (px(i) & 0xff) - (px(i - c) & 0xff) -
              (px(i + c) & 0xff) - (px(i - stride) & 0xff) -
              (px(i + stride) & 0xff)
            n += 1; sum += v; sumsq += v * v
            x += 1
          }
          y += 1
        }
        new GenericArrayData(Array(n, sum, sumsq))
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): PngSharpness =
    copy(child = newChild)
}
