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

  /** Minimal mono 16-bit PCM RIFF/WAVE writer — the shared fixture /
    * transform emitter (samples clamp to the 16-bit range). */
  private[functions] def writePcm16(rate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val riffSize = 4 + 24 + 8 + dataLen
    val out = new Array[Byte](8 + riffSize)
    def put(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { out(o + i) = s(i).toByte; i += 1 } }
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
    put(0, "RIFF"); le32(4, riffSize); put(8, "WAVE")
    put(12, "fmt "); le32(16, 16)
    le16(20, 1); le16(22, 1); le32(24, rate); le32(28, rate * 2); le16(32, 2); le16(34, 16)
    put(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, samples(i)))
      le16(44 + 2 * i, v & 0xffff)
      i += 1
    }
    out
  }
}

/** Iterative radix-2 Cooley–Tukey FFT, pure JVM — the spectral kernel
  * behind [[WavSpectralStats]]. Twiddles come from per-index cos/sin
  * (not the multiply-accumulated recurrence) so rounding stays at
  * O(log n · ε) and the Parseval identity below holds to far better
  * than half a ULP of the integer it is checked against. */
object Fft {

  /** In-place DFT of (re, im); length must be a power of two. */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      val ang = -2.0 * math.Pi / len
      var blk = 0
      while (blk < n) {
        var k = 0
        while (k < half) {
          val cr = math.cos(ang * k); val ci = math.sin(ang * k)
          val ar = re(blk + k); val ai = im(blk + k)
          val xr = re(blk + k + half); val xi = im(blk + k + half)
          val br = xr * cr - xi * ci
          val bi = xr * ci + xi * cr
          re(blk + k) = ar + br; im(blk + k) = ai + bi
          re(blk + k + half) = ar - br; im(blk + k + half) = ai - bi
          k += 1
        }
        blk += len
      }
      len <<= 1
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

/** id → pure-tone PCM WAV fixture: mono 16-bit 8000 Hz, 256 samples,
  * sample i = round(1000·cos(2π·k·i/256)) at integer frequency bin
  * k = 3 + (id mod 8). An integer-bin cosine concentrates ALL spectral
  * energy in DFT bin k (amplitude rounding adds only a vanishing
  * wideband floor), so [[WavSpectralStats]]'s measured peak bin must
  * equal the rule's k — an oracle-exact planted-tone check. */
case class WavToneFixture(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_tone_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_tone_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val k = 3 + (((id % 8) + 8) % 8).toInt
    val n = 256
    val dataLen = n * 2
    val riffSize = 4 + 24 + 8 + dataLen // WAVE + fmt + data
    val out = new Array[Byte](8 + riffSize)
    def put(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { out(o + i) = s(i).toByte; i += 1 } }
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
    put(0, "RIFF"); le32(4, riffSize); put(8, "WAVE")
    put(12, "fmt "); le32(16, 16)
    le16(20, 1); le16(22, 1); le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    put(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < n) {
      val v = math.round(1000.0 * math.cos(2.0 * math.Pi * k * i / n)).toInt
      le16(44 + 2 * i, v & 0xffff)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): WavToneFixture =
    copy(child = newChild)
}

/** id → "melody" PCM WAV fixture for audio dedup: 2048 samples at
  * 8000 Hz as eight 256-sample segments, each the SUM of nine cosines —
  * one centered in each [[WavAudioFingerprint]] band (bin 4+7j of a
  * 128-sample frame) with per-(id, segment, band) amplitude
  * 100 + (splitmix64(id·512 + s·64 + j) mod 8)·400 (a linear-in-id
  * rule mod 8 is periodic — ids 8 apart collided to IDENTICAL
  * fingerprints). Every band carries real
  * energy in every frame (a single pure tone would leave most band
  * energies ≈ 0, making the fingerprint's difference signs numerical
  * noise — measured: cross-id minimum collapsed to 5 bits on a sparse
  * fixture), the band-energy trajectory is structurally distinct per
  * id, and the waveform is band-limited so volume scaling and
  * requantization perturb the fingerprint by only a few bits — the
  * audio analogue of [[PngNoiseFixture]]'s smooth-noise lesson. */
case class WavMelodyFixture(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_melody_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_melody_fixture requires bigint id, got ${other.simpleString}")
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val samples = new Array[Int](2048)
    var s = 0
    while (s < 8) {
      var i = 0
      while (i < 256) {
        var acc = 0.0
        var j = 0
        while (j < 9) {
          val amp = 100 + (((splitmix64(id * 512 + s * 64 + j) % 8) + 8) % 8).toInt * 400
          // band j of a 128-sample frame spans bins [1+7j, 7+7j]; its
          // center bin 4+7j is 2·(4+7j) cycles per 256-sample segment
          acc += amp * math.cos(2.0 * math.Pi * (2 * (4 + 7 * j)) * i / 256.0)
          j += 1
        }
        samples(s * 256 + i) = math.round(acc).toInt
        i += 1
      }
      s += 1
    }
    WavInfo.writePcm16(8000, samples)
  }

  override protected def withNewChildInternal(newChild: Expression): WavMelodyFixture =
    copy(child = newChild)
}

/** WAV blob → same audio re-emitted with every sample scaled by
  * num/den (round-half-up toward +∞ per Math.round, clamped) — the
  * volume-change transform a re-encoded copy undergoes; the planted-
  * duplicate generator for audio dedup. NULL for non-PCM input. */
case class WavScaleAmplitude(child: Expression, num: Int, den: Int)
    extends UnaryExpression with CodegenFallback {
  require(den != 0, "denominator must be non-zero")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_scale_amplitude"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_scale_amplitude requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((rate, _, _, s)) =>
        WavInfo.writePcm16(rate,
          s.map(v => math.round(v.toDouble * num / den).toInt))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavScaleAmplitude =
    copy(child = newChild)
}

/** WAV blob → same audio with the low `dropBits` of every sample
  * zeroed — bit-depth reduction (e.g. dropBits = 8 is an 8-bit
  * re-quantization), the other common lossy audio transform. NULL for
  * non-PCM input. */
case class WavRequantize(child: Expression, dropBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(dropBits >= 1 && dropBits <= 14, s"dropBits must be in [1, 14], got $dropBits")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_requantize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_requantize requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((rate, _, _, s)) =>
        WavInfo.writePcm16(rate, s.map(v => (v >> dropBits) << dropBits))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavRequantize =
    copy(child = newChild)
}

/** WAV blob → 64-bit perceptual AUDIO fingerprint (Haitsma & Kalker,
  * "A Highly Robust Audio Fingerprinting System", ISMIR 2002): frame
  * the decoded PCM into `frameLen`-sample windows, compute `nBands`
  * band energies per frame over the one-sided non-DC spectrum, and
  * emit one bit per (frame m ≥ 1, band n) for the sign of the
  * time-AND-frequency energy difference
  * (E(m,n) − E(m,n+1)) − (E(m−1,n) − E(m−1,n+1)) — the published
  * construction. The double difference cancels both overall loudness
  * (volume scaling multiplies every energy by one constant) and
  * per-frame spectral tilt, which is exactly why re-encoded copies
  * land a few Hamming bits away. Bits fill from the earliest frames;
  * 64/(nBands−1) difference frames are required (NULL on shorter
  * clips — a fingerprint of mostly-zero padding would collide
  * everything). Pairs via [[Dedup.hammingNearDupPairs]], same as text
  * SimHash and image pHash. */
case class WavAudioFingerprint(child: Expression, frameLen: Int = 128, nBands: Int = 9)
    extends UnaryExpression with CodegenFallback {
  require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0,
    s"frameLen must be a power of two, got $frameLen")
  require(nBands >= 2 && (frameLen / 2 - 1) % nBands == 0,
    s"nBands must divide frameLen/2 - 1, got $nBands for frameLen $frameLen")
  require(64 % (nBands - 1) == 0,
    s"nBands - 1 must divide 64 bits, got ${nBands - 1}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_audio_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_audio_fingerprint requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((_, _, _, s)) =>
        val needFrames = 1 + 64 / (nBands - 1)
        val nf = s.length / frameLen
        if (nf < needFrames) return null
        val half = frameLen / 2
        val binsPerBand = (half - 1) / nBands
        val re = new Array[Double](frameLen)
        val im = new Array[Double](frameLen)
        val energies = Array.ofDim[Double](needFrames, nBands)
        var f = 0
        while (f < needFrames) {
          var i = 0
          while (i < frameLen) { re(i) = s(f * frameLen + i); im(i) = 0.0; i += 1 }
          Fft.transform(re, im)
          var k = 1
          while (k < 1 + nBands * binsPerBand) {
            energies(f)((k - 1) / binsPerBand) += re(k) * re(k) + im(k) * im(k)
            k += 1
          }
          f += 1
        }
        var hash = 0L
        var bit = 0
        var m = 1
        while (m < needFrames) {
          var n = 0
          while (n < nBands - 1) {
            val d = (energies(m)(n) - energies(m)(n + 1)) -
              (energies(m - 1)(n) - energies(m - 1)(n + 1))
            if (d > 0) hash |= 1L << bit
            bit += 1
            n += 1
          }
          m += 1
        }
        hash
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavAudioFingerprint =
    copy(child = newChild)
}

/** WAV blob → spectral features over the DECODED PCM samples, framed
  * into non-overlapping `frameLen`-sample windows (power of two;
  * trailing partial frame ignored, same framing as [[WavFrameStats]]):
  * array(n_frames, parseval_total, peak_bin, peak_frac_pct,
  * band_0 … band_{nBands−1}), all longs.
  *
  *   - `parseval_total`: Σ over frames of round(Σ_k |X_k|²) — by the
  *     Parseval identity for the unnormalized DFT this equals
  *     frameLen · Σ x² over the framed samples EXACTLY (the FFT's
  *     floating error is orders of magnitude below the 0.5 rounding
  *     margin at 16-bit amplitudes), which an external oracle recomputes
  *     from the integer sample rule without any FFT;
  *   - `peak_bin`: argmax of one-sided non-DC energy |X_k|², k ∈
  *     [1, frameLen/2], of the FIRST frame (lowest bin wins ties) — the
  *     planted-tone check;
  *   - `peak_frac_pct`: floor(100 · peak-bin energy / one-sided non-DC
  *     energy) of the first frame — tone dominance;
  *   - `band_j`: round(Σ frames Σ_{k ∈ band j} |X_k|²) over one-sided
  *     non-DC bins split evenly into `nBands` bands — the band-energy
  *     profile audio curation filters on (speech/music/noise balance).
  *
  * NULL for non-PCM / corrupt input or when no full frame exists. */
case class WavSpectralStats(child: Expression, frameLen: Int, nBands: Int)
    extends UnaryExpression with CodegenFallback {
  require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0,
    s"frameLen must be a power of two, got $frameLen")
  require(nBands > 0 && (frameLen / 2) % nBands == 0,
    s"nBands must divide frameLen/2, got $nBands for frameLen $frameLen")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_spectral_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_spectral_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((_, _, _, s)) if s.length >= frameLen =>
        val nf = s.length / frameLen
        val half = frameLen / 2
        val binsPerBand = half / nBands
        val re = new Array[Double](frameLen)
        val im = new Array[Double](frameLen)
        val bandAcc = new Array[Double](nBands)
        var total = 0L
        var peakBin = 1
        var peakFracPct = 0L
        var f = 0
        while (f < nf) {
          var i = 0
          while (i < frameLen) { re(i) = s(f * frameLen + i); im(i) = 0.0; i += 1 }
          Fft.transform(re, im)
          var frameTotal = 0.0
          i = 0
          while (i < frameLen) { frameTotal += re(i) * re(i) + im(i) * im(i); i += 1 }
          total += math.round(frameTotal)
          var oneSided = 0.0
          var bestE = -1.0
          var best = 1
          var k = 1
          while (k <= half) {
            val e = re(k) * re(k) + im(k) * im(k)
            oneSided += e
            bandAcc((k - 1) / binsPerBand) += e
            if (e > bestE) { bestE = e; best = k }
            k += 1
          }
          if (f == 0) {
            peakBin = best
            peakFracPct = if (oneSided > 0.0) (100.0 * bestE / oneSided).toLong else 0L
          }
          f += 1
        }
        val out = new Array[Long](4 + nBands)
        out(0) = nf.toLong; out(1) = total; out(2) = peakBin.toLong; out(3) = peakFracPct
        var j = 0
        while (j < nBands) { out(4 + j) = math.round(bandAcc(j)); j += 1 }
        new GenericArrayData(out)
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavSpectralStats =
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

/** Audio-quality screen over decoded PCM: clipping and silence — the
  * two standard reject signals of audio curation (a clipped recording
  * distorted at capture; a silent one carries no signal). Counts
  * samples at |s| ≥ `clipLevel` and `frameLen`-sample frames whose
  * energy Σs² falls below `silenceEnergy`; returns
  * [n_samples, n_clipped, n_frames, n_silent_frames] as exact longs
  * (threshold verdicts are the caller's policy). NULL for non-PCM or
  * shorter-than-one-frame audio. */
case class WavQualityStats(child: Expression, clipLevel: Int,
    silenceEnergy: Long, frameLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(clipLevel > 0 && silenceEnergy >= 0 && frameLen > 0,
    s"bad thresholds: clip=$clipLevel silence=$silenceEnergy frame=$frameLen")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_quality_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_quality_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavInfo.parsePcm(input.asInstanceOf[Array[Byte]]) match {
      case Some((_, _, _, s)) if s.length >= frameLen =>
        var clipped = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i)
          if (v >= clipLevel || v <= -clipLevel) clipped += 1
          i += 1
        }
        val nf = s.length / frameLen
        var silent = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var j = f * frameLen
          val end = j + frameLen
          while (j < end) { val v = s(j).toLong; e += v * v; j += 1 }
          if (e < silenceEnergy) silent += 1
          f += 1
        }
        new GenericArrayData(Array(s.length.toLong, clipped, nf.toLong, silent))
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): WavQualityStats =
    copy(child = newChild)
}
