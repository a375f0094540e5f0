package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pure-JVM GIF codec (GIF89a specification, CompuServe 1990; the LZW
  * variant is Welch, IEEE Computer 1984, with GIF's variable code
  * width, CLEAR/EOI codes and LSB-first sub-block packing). No external
  * codec library.
  *
  * Decode scope: GIF87a and GIF89a, global AND local color tables,
  * interlaced and sequential frames, multi-frame animations (each frame
  * decoded over its own rectangle; disposal/compositing and the
  * transparency index are ignored — frames come back as independent
  * palette-mapped RGB rasters, which is what per-frame fingerprinting
  * wants). Malformed, truncated, or decompression-bomb input returns
  * None, never throws.
  *
  * Encode scope (fixture generation): grayscale-palette GIF89a with
  * REAL LZW compression (dictionary build, width bumps, table-full
  * CLEAR reset) and optional interlacing/animation — the encoder
  * exercises every decoder path with genuinely compressed streams.
  */
object GifCodec {

  final case class Frame(width: Int, height: Int, rgb: Array[Byte])
  final case class Image(width: Int, height: Int, frames: Array[Frame])

  // ---------------------------------------------------------------- LZW

  /** GIF-flavor LZW compress: emits CLEAR, then codes with the decoder-
    * mirrored width schedule (encoder bumps at nextFree == 2^width + 1 —
    * one step late, because the decoder's table trails by one entry),
    * CLEAR-resets when the table fills, ends with EOI. */
  private[graft] def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new BitWriter
    var width = minCodeSize + 1
    var table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextFree = eoi + 1
    def reset(): Unit = { table = scala.collection.mutable.HashMap.empty; nextFree = eoi + 1; width = minCodeSize + 1 }
    out.write(clear, width)
    if (data.nonEmpty) {
      var w = data(0) & 0xff // current prefix: a root, or a table code
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        table.get((w, k)) match {
          case Some(code) => w = code
          case None =>
            out.write(w, width)
            table.update((w, k), nextFree)
            nextFree += 1
            if (nextFree == (1 << width) + 1 && width < 12) width += 1
            if (nextFree > 4095) { out.write(clear, width); reset() }
            w = k
        }
        i += 1
      }
      out.write(w, width)
    }
    out.write(eoi, width)
    out.finish()
  }

  /** GIF-flavor LZW decompress into exactly `expected` bytes; None on
    * any malformed stream (bad code, early end, overflow). */
  private[graft] def lzwDecode(b: Array[Byte], off: Int, len: Int,
      minCodeSize: Int, expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var got = 0
    val reader = new BitReader(b, off, len)
    var width = minCodeSize + 1
    // dictionary as prefix-chain arrays (suffix byte + parent code)
    val suffix = new Array[Byte](4096)
    val parent = new Array[Int](4096)
    val buf = new Array[Byte](4096)
    var nextFree = eoi + 1
    var prev = -1
    def emit(code: Int): Int = { // returns first byte of the expansion
      var n = 0
      var c = code
      while (c >= clear) { buf(n) = suffix(c); n += 1; c = parent(c) } // roots are < clear
      val first = c
      if (got + n + 1 > expected) return -1
      out(got) = c.toByte; got += 1
      var j = n - 1
      while (j >= 0) { out(got) = buf(j); got += 1; j -= 1 }
      first
    }
    var done = false
    while (!done) {
      val code = reader.read(width)
      if (code < 0) return None // stream ran out before EOI
      if (code == clear) { nextFree = eoi + 1; width = minCodeSize + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a root
        if (got >= expected) return None
        out(got) = code.toByte; got += 1
        prev = code
      } else {
        val canAdd = nextFree < 4096
        if (code > nextFree || (code == nextFree && !canAdd)) return None
        if (code == nextFree) {
          // KwKwK: expand prev then its own first byte
          val tmp = nextFree // placeholder entry completed below
          suffix(tmp) = 0; parent(tmp) = prev
          val first = emit(prev)
          if (first < 0) return None
          if (got >= expected) return None
          out(got) = first.toByte; got += 1
          suffix(tmp) = first.toByte
          nextFree += 1
        } else {
          val first = emit(code)
          if (first < 0) return None
          if (canAdd) { suffix(nextFree) = first.toByte; parent(nextFree) = prev; nextFree += 1 }
        }
        if (nextFree == (1 << width) && width < 12) width += 1
        prev = code
      }
      if (got > expected) return None
    }
    if (got != expected) return None
    Some(out)
  }

  private final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) { bytes.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) bytes.write((acc & 0xff).toInt)
      bytes.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte], off: Int, len: Int) {
    private var acc = 0L
    private var nBits = 0
    private var p = off
    def read(width: Int): Int = {
      while (nBits < width) {
        if (p >= off + len) return -1
        acc |= (b(p) & 0xffL) << nBits
        p += 1; nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      v
    }
  }

  // ------------------------------------------------------------- encode

  private def interlaceRows(height: Int): Array[Int] = {
    val rows = new Array[Int](height)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); r <- start until height by step) {
      rows(n) = r; n += 1
    }
    rows
  }

  /** Encode gray frames (each width×height bytes — the byte IS the
    * palette index AND the gray level) as a real GIF89a. Odd-position
    * frames are written interlaced so animated fixtures exercise the
    * de-interlace path; multi-frame inputs get per-frame graphic
    * control blocks (delay `delayCs`) and the Netscape loop extension. */
  def encodeGray(width: Int, height: Int, frames: Seq[Array[Byte]],
      delayCs: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame must be ${width * height} bytes, got ${f.length}"))
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0xF7) // global color table, 8 bits, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    if (frames.size > 1) {
      // Netscape 2.0 looping application extension
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); le16(0); out.write(0)
    }
    frames.zipWithIndex.foreach { case (px, idx) =>
      if (frames.size > 1) {
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write(0) // no disposal, no transparency
        le16(delayCs); out.write(0); out.write(0)
      }
      val interlaced = idx % 2 == 1
      out.write(0x2C) // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      out.write(if (interlaced) 0x40 else 0x00) // no local table
      val ordered =
        if (!interlaced) px
        else {
          val o = new Array[Byte](px.length)
          val rows = interlaceRows(height)
          var n = 0
          while (n < height) {
            System.arraycopy(px, rows(n) * width, o, n * width, width)
            n += 1
          }
          o
        }
      out.write(8) // LZW minimum code size
      val lzw = lzwEncode(ordered, 8)
      var o = 0
      while (o < lzw.length) {
        val n = math.min(255, lzw.length - o)
        out.write(n); out.write(lzw, o, n)
        o += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode any supported GIF. `maxSamples` caps Σ frameW·frameH across
    * frames BEFORE any allocation — the decompression-bomb guard (a
    * 100-byte header cannot trigger huge allocations on an executor). */
  def decode(b: Array[Byte], maxSamples: Long = 1L << 26): Option[Image] = {
    if (b.length < 13) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val canvasW = le16(6); val canvasH = le16(8)
    val flags = b(10) & 0xff
    var o = 13
    var global: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (o + 3 * n > b.length) return None
      global = java.util.Arrays.copyOfRange(b, o, o + 3 * n)
      o += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var budget = maxSamples
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
      if (p >= b.length) -1 else p + 1
    }
    var done = false
    while (!done) {
      if (o >= b.length) return None
      (b(o) & 0xff) match {
        case 0x3B => done = true
        case 0x21 => // extension: label + sub-blocks, all skippable
          if (o + 2 > b.length) return None
          o = skipSubBlocks(o + 2)
          if (o < 0) return None
        case 0x2C =>
          if (o + 10 > b.length) return None
          val fw = le16(o + 5); val fh = le16(o + 7)
          val fflags = b(o + 9) & 0xff
          o += 10
          var palette = global
          if ((fflags & 0x80) != 0) {
            val n = 2 << (fflags & 7)
            if (o + 3 * n > b.length) return None
            palette = java.util.Arrays.copyOfRange(b, o, o + 3 * n)
            o += 3 * n
          }
          if (palette == null) return None
          if (fw <= 0 || fh <= 0) return None
          budget -= fw.toLong * fh
          if (budget < 0) return None
          if (o >= b.length) return None
          val mcs = b(o) & 0xff
          o += 1
          // concatenate the LZW sub-blocks (bounded by the remaining input)
          val lzwBuf = new java.io.ByteArrayOutputStream()
          var p = o
          while (p < b.length && (b(p) & 0xff) != 0) {
            val n = b(p) & 0xff
            if (p + 1 + n > b.length) return None
            lzwBuf.write(b, p + 1, n)
            p += 1 + n
          }
          if (p >= b.length) return None
          o = p + 1
          val lzw = lzwBuf.toByteArray
          val idx = lzwDecode(lzw, 0, lzw.length, mcs, fw * fh) match {
            case Some(d) => d
            case None => return None
          }
          val ordered =
            if ((fflags & 0x40) == 0) idx
            else {
              val d = new Array[Byte](idx.length)
              val rows = interlaceRows(fh)
              var n = 0
              while (n < fh) {
                System.arraycopy(idx, n * fw, d, rows(n) * fw, fw)
                n += 1
              }
              d
            }
          val nColors = palette.length / 3
          val rgb = new Array[Byte](fw * fh * 3)
          var i = 0
          while (i < ordered.length) {
            val ci = ordered(i) & 0xff
            if (ci >= nColors) return None
            rgb(3 * i) = palette(3 * ci)
            rgb(3 * i + 1) = palette(3 * ci + 1)
            rgb(3 * i + 2) = palette(3 * ci + 2)
            i += 1
          }
          frames += Frame(fw, fh, rgb)
        case _ => return None
      }
    }
    if (frames.isEmpty) return None
    Some(Image(canvasW, canvasH, frames.toArray))
  }
}

/** id → real animated grayscale GIF fixture: 2 + (id mod 3) frames,
  * frame f pixel i = (id·31 + f·97 + i·7) mod 256 — the same arithmetic
  * family as PngFramesFixture, so an external oracle evaluates decoded
  * stats with no codec. Odd frames are interlaced; the LZW streams are
  * genuinely compressed. */
case class GifGrayFixture(child: Expression, imgWidth: Int, imgHeight: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gif_gray_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_gray_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val n = 2 + (math.floorMod(id, 3L)).toInt
    val frames = (0 until n).map { f =>
      val px = new Array[Byte](imgWidth * imgHeight)
      var i = 0
      while (i < px.length) {
        px(i) = math.floorMod(id * 31 + f.toLong * 97 + i.toLong * 7, 256L).toByte
        i += 1
      }
      px
    }
    GifCodec.encodeGray(imgWidth, imgHeight, frames)
  }

  override protected def withNewChildInternal(newChild: Expression): GifGrayFixture =
    copy(child = newChild)
}

/** GIF blob → array(n_frames, width, height, n_samples, sample_sum,
  * sample_min, sample_max) over the DECODED palette-mapped RGB samples
  * of ALL frames (LZW, interlace, palette — a bug anywhere corrupts the
  * stats). NULL for non-GIF / unsupported / corrupt input. */
case class GifFrameStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frame_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_frame_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifCodec.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(img) =>
        var sum = 0L; var mn = 255L; var mx = 0L; var cnt = 0L
        img.frames.foreach { f =>
          var i = 0
          while (i < f.rgb.length) {
            val v = (f.rgb(i) & 0xff).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          cnt += f.rgb.length
        }
        new GenericArrayData(Array(img.frames.length.toLong,
          img.frames.head.width.toLong, img.frames.head.height.toLong,
          cnt, sum, mn, mx))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): GifFrameStats =
    copy(child = newChild)
}

/** Animated GIF → array of per-frame RGB PNG blobs: the bridge from a
  * real animation container into the frame-level pipeline (posexplode →
  * [[ImagePHash]] → banded Hamming join — the mm_video_dedup shape).
  * NULL when the blob is not a decodable GIF. */
case class GifFrameSplit(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frame_split"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_frame_split requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifCodec.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(img) =>
        val frames = img.frames.map(f =>
          PngCodec.encode8(f.width, f.height, 3, f.rgb): Any)
        new GenericArrayData(frames)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): GifFrameSplit =
    copy(child = newChild)
}
