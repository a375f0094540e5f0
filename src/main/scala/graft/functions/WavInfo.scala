package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** WAV audio metadata from the container header, no codec: walk the RIFF
  * chunk list (RIFF/WAVE — public spec, Microsoft/IBM Multimedia
  * Programming Interface 1991 §"Waveform Audio File Format") to the
  * `fmt ` chunk and read sample rate / channel count / bits-per-sample
  * straight out of it. Returns array(sample_rate, channels,
  * bits_per_sample), or NULL when the input is not a RIFF/WAVE or carries
  * no well-formed fmt chunk (truncated or corrupt blob).
  *
  * A native expression for the same reason as [[JpegDims]]: the chunk
  * walk advances by each chunk's own 4-byte little-endian size field
  * (plus RIFF's odd-size pad byte) — variable-offset iteration that
  * bounded Column algebra can't express. A `fmt ` chunk is NOT
  * guaranteed to sit first after the WAVE tag (LIST/INFO chunks may
  * precede it), so a fixed-offset read would mis-parse valid files.
  */
case class WavInfo(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_info"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_info requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parse(input.asInstanceOf[Array[Byte]]) match {
      case Some((rate, ch, bits)) => new GenericArrayData(Array(rate, ch, bits))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavInfo =
    copy(child = newChild)
}

object WavInfo {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t(0).toByte && b(o + 1) == t(1).toByte &&
      b(o + 2) == t(2).toByte && b(o + 3) == t(3).toByte

  /** (sampleRate, channels, bitsPerSample) of the first `fmt ` chunk, or
    * None. Tolerates leading LIST/INFO/JUNK chunks; stops at truncation
    * instead of reading another chunk's bytes as audio parameters. */
  def parse(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var o = 12
    while (o + 8 <= b.length) {
      val size = le32(b, o + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(b, o, "fmt ")) {
        // PCM fmt payload: format(2) channels(2) rate(4) byteRate(4)
        // blockAlign(2) bits(2) — 16 bytes minimum; a declared size too
        // small to contain them marks a corrupt header
        if (size < 16 || o + 8 + 16 > b.length) return None
        val channels = le16(b, o + 10)
        val rate = le32(b, o + 12)
        val bits = le16(b, o + 22)
        if (channels == 0 || rate <= 0 || rate > Int.MaxValue || bits == 0) return None
        return Some((rate.toInt, channels, bits))
      }
      // RIFF chunks are word-aligned: odd payloads carry one pad byte
      o += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }
}
