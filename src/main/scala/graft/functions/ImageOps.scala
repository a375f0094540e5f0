package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Image transforms over DECODED pixels — the feature-extraction tier a
  * training-data pipeline applies after decode (resize to model input
  * geometry, frame sampling from multi-frame containers).
  *
  * Sampling conventions are the half-pixel-center ones used by the major
  * tensor libraries (`align_corners = false`):
  *
  *   - nearest: src = floor((dst + 0.5) · srcDim / dstDim), computed in
  *     exact integer arithmetic as ((2·dst + 1) · srcDim) / (2 · dstDim);
  *   - bilinear: sample position (dst + 0.5) · srcDim / dstDim − 0.5,
  *     edge-clamped, 4-tap weighted average, round-half-up.
  *
  * Pure per-row JVM kernels wrapped in native expressions (same tier as
  * [[PngCodec]]): the work is per-blob byte crunching, so the operators
  * run inside the scan and nothing but the transformed blobs shuffles.
  */
object ImageOps {

  /** Nearest-neighbor resize of 8-bit interleaved samples. Exact integer
    * source mapping — an external oracle can reproduce it with integer
    * division alone. */
  def resizeNearest(px: Array[Byte], w: Int, h: Int, ch: Int,
      ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * ch)
    var y = 0
    while (y < oh) {
      val sy = (((2L * y + 1) * h) / (2L * oh)).toInt // < h by construction
      var x = 0
      while (x < ow) {
        val sx = (((2L * x + 1) * w) / (2L * ow)).toInt
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Bilinear resize of 8-bit interleaved samples, half-pixel centers,
    * edge clamp, round-half-up. For an exact 2× downscale the four taps
    * weigh 1/4 each, so every intermediate is a dyadic rational — the
    * result is bit-exact reproducible in any IEEE-754 engine. */
  def resizeBilinear(px: Array[Byte], w: Int, h: Int, ch: Int,
      ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * ch)
    var y = 0
    while (y < oh) {
      val syRaw = (y + 0.5) * h / oh - 0.5
      val sy = math.min(math.max(syRaw, 0.0), (h - 1).toDouble)
      val y0 = sy.toInt // sy >= 0, so toInt == floor
      val y1 = math.min(h - 1, y0 + 1)
      val fy = sy - y0
      var x = 0
      while (x < ow) {
        val sxRaw = (x + 0.5) * w / ow - 0.5
        val sx = math.min(math.max(sxRaw, 0.0), (w - 1).toDouble)
        val x0 = sx.toInt
        val x1 = math.min(w - 1, x0 + 1)
        val fx = sx - x0
        var c = 0
        while (c < ch) {
          val p00 = px((y0 * w + x0) * ch + c) & 0xff
          val p01 = px((y0 * w + x1) * ch + c) & 0xff
          val p10 = px((y1 * w + x0) * ch + c) & 0xff
          val p11 = px((y1 * w + x1) * ch + c) & 0xff
          val v = (1 - fy) * ((1 - fx) * p00 + fx * p01) +
            fy * ((1 - fx) * p10 + fx * p11)
          val r = math.floor(v + 0.5).toInt
          out((y * ow + x) * ch + c) =
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Split a blob holding one or more back-to-back PNG streams (the
    * MJPEG-style "concatenated stills" container shape) into its frames
    * by chunk-walk framing: each frame spans signature → IEND. Returns
    * None unless the ENTIRE blob is consumed by well-formed frames —
    * trailing junk or a malformed chunk list is corruption, not a
    * shorter video. Framing only: no CRC or pixel decode here (the
    * per-frame decoder re-verifies what it consumes). */
  def splitFrames(b: Array[Byte]): Option[Array[Array[Byte]]] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var o = 0
    while (o < b.length) {
      if (o + 8 > b.length || !sig.indices.forall(i => b(o + i) == sig(i))) return None
      var p = o + 8
      var end = -1
      while (end < 0) {
        if (p + 8 > b.length) return None
        val len = be32(p)
        if (len < 0 || p.toLong + 12L + len > b.length) return None
        val isEnd = b(p + 4) == 'I' && b(p + 5) == 'E' && b(p + 6) == 'N' && b(p + 7) == 'D'
        p += 12 + len
        if (isEnd) end = p
      }
      frames += java.util.Arrays.copyOfRange(b, o, end)
      o = end
    }
    if (frames.isEmpty) None else Some(frames.toArray)
  }
}

/** PNG blob → resized PNG blob: real decode ([[PngCodec.decode8]]) →
  * nearest/bilinear kernel → real re-encode ([[PngCodec.encode8]]), so
  * downstream stages (including [[PngPixelStats]]) see a genuine PNG and
  * any resize bug surfaces in decoded-pixel stats. NULL for non-PNG /
  * unsupported / corrupt input or a requested geometry outside the
  * decompression-bomb cap. */
case class PngResize(child: Expression, outW: Int, outH: Int, bilinear: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(outW > 0 && outH > 0, s"output geometry must be positive, got ${outW}x$outH")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_resize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_resize requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PngCodec.decode8(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, ch, px)) if outW.toLong * outH * ch <= (1L << 26) =>
        val resized =
          if (bilinear) ImageOps.resizeBilinear(px, w, h, ch, outW, outH)
          else ImageOps.resizeNearest(px, w, h, ch, outW, outH)
        PngCodec.encode8(outW, outH, ch, resized)
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): PngResize =
    copy(child = newChild)
}

/** id → multi-frame fixture: 4 + (id mod 3) real grayscale PNGs
  * back-to-back, frame f pixel i = (id·31 + f·97 + i·7) mod 256 — the
  * same oracle-evaluable-without-a-codec protocol as [[PngGrayFixture]],
  * extended with a per-frame term. */
case class PngFramesFixture(child: Expression, frameW: Int, frameH: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_frames_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_frames_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val nf = (4 + ((id % 3) + 3) % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nf) {
      val px = new Array[Byte](frameW * frameH)
      var i = 0
      while (i < px.length) {
        px(i) = (((id * 31 + f.toLong * 97 + i.toLong * 7) % 256 + 256) % 256).toByte
        i += 1
      }
      out.write(PngCodec.encode8(frameW, frameH, 1, px))
      f += 1
    }
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): PngFramesFixture =
    copy(child = newChild)
}

/** Multi-frame blob → array of per-frame PNG blobs ([[ImageOps
  * .splitFrames]]); NULL when the blob is not a well-formed frame
  * concatenation. Pairs with `posexplode` + a position predicate for
  * every-k-th frame sampling — the sampling itself stays declarative
  * Column algebra. */
case class PngFrameSplit(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "png_frame_split"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_frame_split requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageOps.splitFrames(input.asInstanceOf[Array[Byte]]) match {
      case Some(frames) => new GenericArrayData(frames.asInstanceOf[Array[Any]])
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): PngFrameSplit =
    copy(child = newChild)
}
