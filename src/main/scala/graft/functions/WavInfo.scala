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
    // Long cursor: a declared chunk size near Int.MaxValue would wrap an
    // Int advance negative, slip past the loop guard and read a negative
    // index — the walk must terminate on overrun, not throw
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val size = le32(b, oi + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(b, oi, "fmt ")) {
        // PCM fmt payload: format(2) channels(2) rate(4) byteRate(4)
        // blockAlign(2) bits(2) — 16 bytes minimum; a declared size too
        // small to contain them marks a corrupt header
        if (size < 16 || oi + 8 + 16 > b.length) return None
        val channels = le16(b, oi + 10)
        val rate = le32(b, oi + 12)
        val bits = le16(b, oi + 22)
        if (channels == 0 || rate <= 0 || rate > Int.MaxValue || bits == 0) return None
        return Some((rate.toInt, channels, bits))
      }
      // RIFF chunks are word-aligned: odd payloads carry one pad byte
      o += 8L + size + (size & 1L)
    }
    None
  }

  /** REAL sample decode: (rate, channels, bits, samples) from a PCM
    * RIFF/WAVE — fmt chunk for the parameters, `data` chunk for the
    * payload. PCM needs no entropy codec: 16-bit samples are signed
    * little-endian words, 8-bit samples are unsigned bytes (per the
    * spec, stored excess-128) — returned centered to signed so both
    * widths share an amplitude convention. None when not RIFF/WAVE, not
    * integer PCM (format code 1), unsupported width, missing chunks, or
    * a data chunk whose declared size overruns the blob (corruption —
    * refuse rather than decode another chunk's bytes as audio). */
  def parsePcm(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // Long cursor — same overflow-safe walk as [[parse]]
    var o = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var pcmFmt = false
    var data: Option[(Int, Int)] = None // payload offset, byte length
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val oi = o.toInt
      val size = le32(b, oi + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(b, oi, "fmt ")) {
        if (size < 16 || oi + 8 + 16 > b.length) return None
        pcmFmt = le16(b, oi + 8) == 1 // integer PCM; anything else is coded audio
        val channels = le16(b, oi + 10)
        val rate = le32(b, oi + 12)
        val bits = le16(b, oi + 22)
        if (channels == 0 || rate <= 0 || rate > Int.MaxValue || bits == 0) return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (tag(b, oi, "data")) {
        if (o + 8L + size > b.length) return None
        data = Some((oi + 8, size.toInt))
      }
      o += 8L + size + (size & 1L)
    }
    (fmt, data) match {
      case (Some((rate, ch, bits)), Some((off, len))) if pcmFmt && bits == 16 =>
        val n = len / 2
        val s = new Array[Int](n)
        var i = 0
        while (i < n) { s(i) = (le16(b, off + 2 * i) << 16) >> 16; i += 1 }
        Some((rate, ch, bits, s))
      case (Some((rate, ch, bits)), Some((off, len))) if pcmFmt && bits == 8 =>
        val s = new Array[Int](len)
        var i = 0
        while (i < len) { s(i) = (b(off + i) & 0xff) - 128; i += 1 }
        Some((rate, ch, bits, s))
      case _ => None
    }
  }
}

/** id → real PCM WAV fixture: a genuine RIFF/WAVE byte stream (JUNK
  * chunk before `fmt ` so fixed-offset readers fail, mono 16-bit
  * 8000 Hz) whose sample i is ((id·31 + i·7) mod 4096) − 2048 over
  * 160 + (id mod 8)·16 samples — an arithmetic rule an external oracle
  * evaluates without touching the container, same protocol as
  * [[PngGrayFixture]]. */
case class WavPcmFixture(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_pcm_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_pcm_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val n = 160 + (((id % 8) + 8) % 8).toInt * 16
    val dataLen = n * 2
    // RIFF size = WAVE(4) + JUNK(8+4) + fmt(8+16) + data(8+dataLen)
    val riffSize = 4 + 12 + 24 + 8 + dataLen
    val out = new Array[Byte](8 + riffSize)
    def put(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { out(o + i) = s(i).toByte; i += 1 } }
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
    put(0, "RIFF"); le32(4, riffSize); put(8, "WAVE")
    put(12, "JUNK"); le32(16, 4) // 4 zero bytes already there
    put(24, "fmt "); le32(28, 16)
    le16(32, 1); le16(34, 1); le32(36, 8000); le32(40, 16000); le16(44, 2); le16(46, 16)
    put(48, "data"); le32(52, dataLen)
    var i = 0
    while (i < n) {
      val v = (((id * 31 + i.toLong * 7) % 4096 + 4096) % 4096).toInt - 2048
      le16(56 + 2 * i, v & 0xffff)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): WavPcmFixture =
    copy(child = newChild)
}

/** WAV blob → array(rate, channels, bits, n_samples, s_sum, s_min,
  * s_max, s_sumsq) computed from the DECODED PCM samples ([[WavInfo
  * .parsePcm]]) — integer moments, so an external oracle recomputes
  * them exactly and RMS/mean derive downstream without float drift.
  * NULL for non-PCM / corrupt / empty-data input. */
case class WavPcmStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_pcm_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_pcm_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((rate, ch, bits, s)) if s.nonEmpty =>
        var sum = 0L; var sumsq = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          sum += v; sumsq += v * v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        new GenericArrayData(Array(rate.toLong, ch.toLong, bits.toLong,
          s.length.toLong, sum, mn, mx, sumsq))
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

/** WAV blob → array(n_frames, zero_crossings, energy_max, energy_min):
  * windowed features over the DECODED PCM samples — the speech-pipeline
  * primitives (frame energy for voice-activity gating, zero-crossing
  * rate for voicing) computed in exact integer arithmetic so an external
  * oracle reproduces them from the sample rule alone.
  *
  *   - frames: consecutive non-overlapping windows of `frameLen`
  *     samples; a trailing partial window is ignored (standard framing);
  *   - zero crossings: count of adjacent sample pairs over the WHOLE
  *     signal whose signs differ (negative vs non-negative);
  *   - energy: per-frame sum of squared samples; max and min over full
  *     frames (16-bit amplitudes bound each frame's energy by
  *     frameLen · 2^30, so Long never overflows).
  *
  * NULL for non-PCM / corrupt input or when no full frame exists. */
case class WavFrameStats(child: Expression, frameLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(frameLen > 0, s"frameLen must be positive, got $frameLen")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_frame_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_frame_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((_, _, _, s)) if s.length >= frameLen =>
        var zc = 0L
        var i = 1
        while (i < s.length) {
          if ((s(i - 1) < 0) != (s(i) < 0)) zc += 1
          i += 1
        }
        val nf = s.length / frameLen
        var eMax = Long.MinValue; var eMin = Long.MaxValue
        var f = 0
        while (f < nf) {
          var e = 0L
          var j = f * frameLen
          val end = j + frameLen
          while (j < end) { val v = s(j).toLong; e += v * v; j += 1 }
          if (e > eMax) eMax = e
          if (e < eMin) eMin = e
          f += 1
        }
        new GenericArrayData(Array(nf.toLong, zc, eMax, eMin))
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavFrameStats =
    copy(child = newChild)
}
