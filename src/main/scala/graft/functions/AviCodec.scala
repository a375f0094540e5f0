package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** AVI (RIFF) video container support — the fifth real container format
  * next to PNG/JPEG/WAV/GIF, and the one that makes the video pipeline
  * end-to-end REAL: an MJPEG AVI's frames are genuine baseline JPEGs,
  * so `avi_frame_split` feeds the existing [[JpegCodec]] decode and
  * [[PHash]] dedup with no synthetic frame-concat container.
  *
  * Format per the public Microsoft "AVI RIFF File Reference"
  * (msdn, Video for Windows SDK 1992): RIFF('AVI ') wraps
  * LIST('hdrl') { 'avih' main header, LIST('strl'){ 'strh','strf' } }
  * and LIST('movi') { '00dc'/'00db' frame chunks, possibly nested in
  * LIST('rec ') groups }. All sizes little-endian; odd-size chunks are
  * padded to even (same RIFF rule as [[WavInfo]]).
  *
  * Native expressions for the [[WavInfo]] reason: the chunk walk
  * advances by each chunk's own size field — variable-offset iteration
  * Column algebra cannot express. Parsers never throw: any truncation,
  * overrun, or bomb-cap hit returns NULL for the row.
  */
object AviCodec {

  /** Decompression-bomb caps for the frame walk. */
  val MaxFrames = 1 << 16
  val MaxFrameBytes = 1L << 26

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    o + 4 <= b.length &&
      b(o) == t(0).toByte && b(o + 1) == t(1).toByte &&
      b(o + 2) == t(2).toByte && b(o + 3) == t(3).toByte

  /** (width, height, totalFrames, usecPerFrame, nStreams) from the
    * 'avih' main header inside LIST('hdrl'), or None. */
  def parseInfo(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val size = le32(b, oi + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(b, oi, "LIST") && tag(b, oi + 8, "hdrl")) {
        // walk hdrl children for 'avih'
        var p = o + 12
        val end = math.min(o + 8 + size, b.length.toLong)
        while (p + 8 <= end) {
          val pi = p.toInt
          val csz = le32(b, pi + 4)
          if (csz < 0 || csz > Int.MaxValue) return None
          if (tag(b, pi, "avih")) {
            // MainAVIHeader: usecPerFrame@0, totalFrames@16, streams@24,
            // width@32, height@36 — 40 bytes minimum to read them all
            if (csz < 40 || p + 8 + 40 > b.length) return None
            val usec = le32(b, pi + 8)
            val nf = le32(b, pi + 8 + 16)
            val ns = le32(b, pi + 8 + 24)
            val w = le32(b, pi + 8 + 32)
            val h = le32(b, pi + 8 + 36)
            if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
              nf > Int.MaxValue || usec > Int.MaxValue || ns > Int.MaxValue)
              return None
            return Some((w.toInt, h.toInt, nf.toInt, usec.toInt, ns.toInt))
          }
          p += 8 + csz + (csz & 1)
        }
        return None // hdrl without avih is malformed
      }
      o += 8 + size + (size & 1)
    }
    None
  }

  /** Stream-0 video frame payloads ('00dc'/'00db') from LIST('movi'),
    * including frames nested one level down in LIST('rec ') groups, in
    * file order. None when the container is not an AVI, has no movi
    * list, or trips a bomb cap. */
  def parseFrames(b: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var total = 0L
    def walkFrames(from: Long, end: Long, depth: Int): Boolean = {
      var p = from
      while (p + 8 <= end) {
        val pi = p.toInt
        val csz = le32(b, pi + 4)
        if (csz < 0 || csz > Int.MaxValue) return false
        if (tag(b, pi, "LIST") && tag(b, pi + 8, "rec ") && depth == 0) {
          if (!walkFrames(p + 12, math.min(p + 8 + csz, end), 1)) return false
        } else if (tag(b, pi, "00dc") || tag(b, pi, "00db")) {
          if (p + 8 + csz > b.length) return false // truncated frame
          total += csz
          if (out.size >= MaxFrames || total > MaxFrameBytes) return false
          out += java.util.Arrays.copyOfRange(b, pi + 8, pi + 8 + csz.toInt)
        }
        p += 8 + csz + (csz & 1)
      }
      true
    }
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val size = le32(b, oi + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(b, oi, "LIST") && tag(b, oi + 8, "movi")) {
        val end = math.min(o + 8 + size, b.length.toLong)
        if (!walkFrames(o + 12, end, 0)) return None
        return Some(out.toArray)
      }
      o += 8 + size + (size & 1)
    }
    None
  }

  // ---- writer (fixture side) ----

  private class W {
    val bos = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def fcc(t: String): Unit = t.foreach(c => bos.write(c.toInt))
    def bytes(a: Array[Byte]): Unit = bos.write(a, 0, a.length)
  }

  /** A real MJPEG AVI wrapping the given JPEG frames: full hdrl
    * (avih + one 'vids'/'MJPG' strl) and a movi list of '00dc' chunks,
    * even-padded per the RIFF rule. */
  def encodeMjpeg(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty, "need geometry and frames")
    val maxFrame = frames.map(_.length).max

    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val w = new W
      w.fcc(id); w.u32(payload.length.toLong); w.bytes(payload)
      if ((payload.length & 1) == 1) w.bos.write(0)
      w.bos.toByteArray
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] = {
      val w = new W
      w.fcc("LIST"); w.u32(children.length.toLong + 4); w.fcc(typ); w.bytes(children)
      if ((children.length & 1) == 1) w.bos.write(0)
      w.bos.toByteArray
    }

    val avih = { // MainAVIHeader, 56 bytes
      val w = new W
      w.u32(usecPerFrame.toLong); w.u32(0L); w.u32(0L); w.u32(0L)
      w.u32(frames.length.toLong); w.u32(0L); w.u32(1L); w.u32(maxFrame.toLong)
      w.u32(width.toLong); w.u32(height.toLong)
      (0 until 4).foreach(_ => w.u32(0L))
      w.bos.toByteArray
    }
    val strh = { // AVIStreamHeader, 56 bytes
      val w = new W
      w.fcc("vids"); w.fcc("MJPG")
      w.u32(0L); w.u32(0L) // flags, priority+language
      w.u32(0L) // initialFrames
      w.u32(math.max(1L, usecPerFrame.toLong)) // scale
      w.u32(1000000L) // rate: rate/scale = fps
      w.u32(0L) // start
      w.u32(frames.length.toLong) // length
      w.u32(maxFrame.toLong); w.u32(0xffffffffL) // suggestedBuffer, quality=-1
      w.u32(0L) // sampleSize
      w.u32(0L); w.u32((height.toLong << 16) | width.toLong) // rcFrame
      w.bos.toByteArray
    }
    val strf = { // BITMAPINFOHEADER, 40 bytes
      val w = new W
      w.u32(40L); w.u32(width.toLong); w.u32(height.toLong)
      w.u32((24L << 16) | 1L) // planes=1, bitcount=24
      w.fcc("MJPG")
      w.u32(width.toLong * height * 3); w.u32(0L); w.u32(0L); w.u32(0L); w.u32(0L)
      w.bos.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val w = new W
    w.fcc("RIFF"); w.u32(body.length.toLong + 4); w.fcc("AVI "); w.bytes(body)
    w.bos.toByteArray
  }
}

/** AVI blob → array(width, height, n_frames, usec_per_frame, n_streams)
  * from the main header, NULL when not a well-formed AVI. */
case class AviInfo(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "avi_info"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avi_info requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    try AviCodec.parseInfo(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, nf, usec, ns)) =>
        new GenericArrayData(Array(w, h, nf, usec, ns))
      case None => null
    } catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): AviInfo =
    copy(child = newChild)
}

/** AVI blob → array of per-frame video payload blobs (for MJPEG: real
  * JPEGs, decodable by jpeg_pixel_stats / image_phash), NULL when not a
  * well-formed AVI or over the bomb caps. */
case class AviFrameSplit(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "avi_frame_split"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avi_frame_split requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    try AviCodec.parseFrames(input.asInstanceOf[Array[Byte]]) match {
      case Some(frames) => new GenericArrayData(frames.asInstanceOf[Array[Any]])
      case None => null
    } catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): AviFrameSplit =
    copy(child = newChild)
}

/** id → real MJPEG AVI fixture: `nFrames` frames of (wBlocks·8)×
  * (hBlocks·8) grayscale baseline JPEGs, where block k of frame f is the
  * constant value ((id·1000 + f)·31 + k·7) mod 256 — the same arithmetic
  * rule as [[JpegGrayFixture]] with a per-frame id, so an external
  * oracle evaluates every decoded pixel with no codec while the bytes
  * are a genuine RIFF container of genuine Huffman-coded JPEGs. */
case class AviMjpegFixture(child: Expression, wBlocks: Int, hBlocks: Int,
    nFrames: Int)
    extends UnaryExpression with CodegenFallback {

  require(nFrames > 0, "need at least one frame")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_mjpeg_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avi_mjpeg_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val frames = (0 until nFrames).map { f =>
      val fid = id * 1000 + f
      val vals = Array.tabulate(wBlocks * hBlocks) { k =>
        (((fid * 31 + k.toLong * 7) % 256 + 256) % 256).toInt
      }
      JpegCodec.encodeGrayBlocks(wBlocks, hBlocks, vals)
    }
    AviCodec.encodeMjpeg(wBlocks * 8, hBlocks * 8, 40000, frames)
  }

  override protected def withNewChildInternal(newChild: Expression): AviMjpegFixture =
    copy(child = newChild)
}
