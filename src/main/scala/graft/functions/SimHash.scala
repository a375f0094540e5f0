package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash (Charikar 2002): 64-bit locality-sensitive fingerprint of a
  * token multiset — near-identical documents differ in few bits, so
  * near-dup detection becomes a small-Hamming-distance join.
  *
  * Implemented as a native Catalyst `Expression` (not a Scala UDF): the
  * per-row work is a tight loop over token bytes with zero allocation
  * beyond the bit-count vector, evaluated directly on Tungsten's
  * `ArrayData`/`UTF8String` without serialization to JVM objects. A
  * 64-way higher-order-function composition could express this with
  * built-ins but would allocate per bit per token; this is the
  * "custom Expression beats UDF beats composition" case from the design
  * preference order.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = SimHash64.hash64(arr.getUTF8String(t))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (v(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** FNV-1a 64-bit over UTF-8 bytes with a murmur-style finalizer (public
    * constants). Deterministic across JVMs/runs. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // fmix64 finalizer for avalanche
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }
}

/** graft's custom Catalyst expressions, exposed two ways:
  *
  *   - **Column builders** (below): direct expression construction via
  *     [[org.apache.spark.sql.GraftColumn]] — self-contained, no session
  *     state, usable on any session without prior registration;
  *   - **SQL names**: [[register]] (per-session) or
  *     [[graft.GraftExtensions]] (spark.sql.extensions) make the same
  *     expressions callable from SQL text.
  */
object GraftFunctions {
  import org.apache.spark.sql.GraftColumn
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agree", exprs => MinHashAgree(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_shingle_hashes", exprs => CharShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id", exprs => LangIdExpr(exprs.head, TextFunctions.StopwordLists.toSeq), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jpeg_dims", exprs => JpegDims(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_info", exprs => WavInfo(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_gray_fixture", exprs => PngGrayFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_pixel_stats", exprs => PngPixelStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_sharpness", exprs => PngSharpness(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_lsh_buckets", exprs => CosineLshBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].longValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_resize", exprs => PngResize(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Boolean]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_frames_fixture", exprs => PngFramesFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_frame_split", exprs => PngFrameSplit(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_frame_stats", exprs => WavFrameStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_quality_stats", exprs => WavQualityStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].longValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_any_contain", exprs => BloomAnyContain(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "self_repeat_spans", exprs => SelfRepeatSpansExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gif_gray_fixture", exprs => GifGrayFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gif_frame_stats", exprs => GifFrameStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gif_frame_split", exprs => GifFrameSplit(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avi_mjpeg_fixture", exprs => AviMjpegFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avi_info", exprs => AviInfo(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avi_frame_split", exprs => AviFrameSplit(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jpeg_pixel_stats", exprs => JpegPixelStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_ratio", exprs => DeflateRatio(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => NormalizeText(exprs.head,
        exprs(1).eval().asInstanceOf[UTF8String].toString,
        exprs(2).eval().asInstanceOf[Boolean],
        exprs(3).eval().asInstanceOf[Boolean]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lcs_len", exprs => LcsLen(exprs.head, exprs(1)), "built-in")
  }

  /** tokens array<string> → 64-bit simhash. */
  def simhash64(c: Column): Column = GraftColumn(SimHash64(GraftColumn.expr(c)))

  /** shingles array<string> → array<long> minhash signature of n seeds. */
  def minhashSig(c: Column, numHashes: Int): Column =
    GraftColumn(MinHashSig(GraftColumn.expr(c), numHashes))

  /** #agreeing components of two signatures. */
  def minhashAgree(a: Column, b: Column): Column =
    GraftColumn(MinHashAgree(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** |A∩B| of two sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumn(SortedIntersectCount(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** text → sorted distinct 64-bit hashes of its char k-grams. */
  def charShingleHashes(c: Column, k: Int): Column =
    GraftColumn(CharShingleHashes(GraftColumn.expr(c), k))

  /** Jaro-Winkler similarity of two strings (standard semantics,
    * DuckDB-compatible). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumn(JaroWinkler(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Longest-common-subsequence length of two token arrays (ROUGE-L
    * kernel). */
  def lcsLen(a: Column, b: Column): Column =
    GraftColumn(LcsLen(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Token-level Levenshtein distance of two token arrays (word error
    * rate kernel). */
  def tokenEditDist(a: Column, b: Column): Column =
    GraftColumn(TokenEditDist(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Per-order clipped n-gram matches of a (cand, ref) token-array pair
    * — the BLEU/ROUGE-N overlap numerator as one in-scan kernel
    * (array<long> of size maxN). */
  def clippedGramMatches(cand: Column, ref: Column, maxN: Int): Column =
    GraftColumn(ClippedGramMatches(
      GraftColumn.expr(cand), GraftColumn.expr(ref), maxN))

  /** Character-gram sibling of [[clippedGramMatches]] (chrF numerator). */
  def clippedCharGramMatches(cand: Column, ref: Column, maxN: Int): Column =
    GraftColumn(ClippedCharGramMatches(
      GraftColumn.expr(cand), GraftColumn.expr(ref), maxN))

  /** Fused-loop cosine similarity of two vectors. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumn(CosineSim(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** JPEG blob → array(width, height) from its SOF header, NULL if absent. */
  def jpegDims(c: Column): Column = GraftColumn(JpegDims(GraftColumn.expr(c)))

  /** WAV blob → array(sample_rate, channels, bits_per_sample) from its
    * RIFF fmt chunk, NULL if absent/corrupt. */
  def wavInfo(c: Column): Column = GraftColumn(WavInfo(GraftColumn.expr(c)))

  /** One-pass language ID (same semantics as TextFunctions.langId). */
  def langId(c: Column): Column =
    GraftColumn(LangIdExpr(GraftColumn.expr(c), TextFunctions.StopwordLists.toSeq))

  /** vector → array<long> of per-table sign-LSH bucket ids. */
  def cosineLshBuckets(vec: Column, numPlanes: Int, numTables: Int, seed: Long): Column =
    GraftColumn(CosineLshBuckets(GraftColumn.expr(vec), numPlanes, numTables, seed))

  /** id → real grayscale PNG with the arithmetic pixel rule (fixture). */
  def pngGrayFixture(id: Column, width: Int, height: Int): Column =
    GraftColumn(PngGrayFixture(GraftColumn.expr(id), width, height))

  /** PNG blob → array(w, h, n_samples, sum, min, max) of DECODED samples. */
  def pngPixelStats(c: Column): Column = GraftColumn(PngPixelStats(GraftColumn.expr(c)))

  /** PNG bytes → [n_interior, lap_sum, lap_sumsq] Laplacian sharpness moments. */
  def pngSharpness(c: Column): Column = GraftColumn(PngSharpness(GraftColumn.expr(c)))

  /** WAV bytes → [n_samples, n_clipped, n_frames, n_silent] quality counts. */
  def wavQualityStats(c: Column, clipLevel: Int, silenceEnergy: Long,
      frameLen: Int): Column =
    GraftColumn(WavQualityStats(GraftColumn.expr(c), clipLevel, silenceEnergy, frameLen))

  /** id → real baseline JPEG with the arithmetic constant-block rule (fixture). */
  def jpegGrayFixture(id: Column, wBlocks: Int, hBlocks: Int): Column =
    GraftColumn(JpegGrayFixture(GraftColumn.expr(id), wBlocks, hBlocks))

  /** JPEG blob → array(w, h, n_samples, sum, min, max) of DECODED samples. */
  def jpegPixelStats(c: Column): Column = GraftColumn(JpegPixelStats(GraftColumn.expr(c)))

  /** id → real color 4:4:4 baseline JPEG with per-plane block rules (fixture). */
  def jpegColorFixture(id: Column, wBlocks: Int, hBlocks: Int): Column =
    GraftColumn(JpegColorFixture(GraftColumn.expr(id), wBlocks, hBlocks))

  /** id → real chroma-subsampled baseline JPEG (4:2:0 when sampH=sampV=2,
    * 4:2:2 when sampH=2, sampV=1) with per-plane block rules (fixture). */
  def jpegSubsampleFixture(id: Column, wMcu: Int, hMcu: Int, sampH: Int, sampV: Int): Column =
    GraftColumn(JpegSubsampleFixture(GraftColumn.expr(id), wMcu, hMcu, sampH, sampV))

  /** color JPEG blob → array(w, h, n_samples, r_sum, g_sum, b_sum) of DECODED RGB. */
  def jpegRgbStats(c: Column): Column = GraftColumn(JpegRgbStats(GraftColumn.expr(c)))

  /** id → real mono 16-bit PCM WAV with the arithmetic sample rule (fixture). */
  def wavPcmFixture(id: Column): Column = GraftColumn(WavPcmFixture(GraftColumn.expr(id)))

  /** WAV blob → array(rate, ch, bits, n, sum, min, max, sumsq) of DECODED
    * PCM samples. */
  def wavPcmStats(c: Column): Column = GraftColumn(WavPcmStats(GraftColumn.expr(c)))

  /** PNG blob → resized PNG blob (decode → nearest/bilinear kernel →
    * re-encode). */
  def pngResize(c: Column, outW: Int, outH: Int, bilinear: Boolean): Column =
    GraftColumn(PngResize(GraftColumn.expr(c), outW, outH, bilinear))

  /** id → multi-frame blob: 4 + (id mod 3) concatenated real PNGs with a
    * per-frame arithmetic pixel rule (fixture). */
  def pngFramesFixture(id: Column, frameW: Int, frameH: Int): Column =
    GraftColumn(PngFramesFixture(GraftColumn.expr(id), frameW, frameH))

  /** multi-frame blob → array of per-frame PNG blobs. */
  def pngFrameSplit(c: Column): Column = GraftColumn(PngFrameSplit(GraftColumn.expr(c)))

  /** WAV blob → array(n_frames, zero_crossings, energy_max, energy_min)
    * of DECODED PCM windowed features. */
  def wavFrameStats(c: Column, frameLen: Int): Column =
    GraftColumn(WavFrameStats(GraftColumn.expr(c), frameLen))

  /** WAV blob → array(n_frames, parseval_total, peak_bin, peak_frac_pct,
    * band energies…) — FFT features over decoded PCM frames. */
  def wavSpectralStats(c: Column, frameLen: Int, nBands: Int): Column =
    GraftColumn(WavSpectralStats(GraftColumn.expr(c), frameLen, nBands))

  /** id → pure-tone mono 16-bit PCM WAV at integer bin 3 + (id mod 8). */
  def wavToneFixture(id: Column): Column = GraftColumn(WavToneFixture(GraftColumn.expr(id)))

  /** id → 2048-sample 8-segment melody PCM WAV (audio-dedup fixture). */
  def wavMelodyFixture(id: Column): Column =
    GraftColumn(WavMelodyFixture(GraftColumn.expr(id)))

  /** WAV blob → volume-scaled (num/den) re-emission. */
  def wavScaleAmplitude(c: Column, num: Int, den: Int): Column =
    GraftColumn(WavScaleAmplitude(GraftColumn.expr(c), num, den))

  /** WAV blob → bit-depth-reduced re-emission (low dropBits zeroed). */
  def wavRequantize(c: Column, dropBits: Int): Column =
    GraftColumn(WavRequantize(GraftColumn.expr(c), dropBits))

  /** WAV blob → 64-bit Haitsma–Kalker perceptual audio fingerprint. */
  def wavAudioFingerprint(c: Column, frameLen: Int = 128, nBands: Int = 9): Column =
    GraftColumn(WavAudioFingerprint(GraftColumn.expr(c), frameLen, nBands))

  /** id → real animated grayscale GIF (LZW, interlaced odd frames) with
    * the arithmetic per-frame pixel rule (fixture). */
  def gifGrayFixture(id: Column, width: Int, height: Int): Column =
    GraftColumn(GifGrayFixture(GraftColumn.expr(id), width, height))

  /** GIF blob → array(n_frames, w, h, n_samples, sum, min, max) of
    * DECODED palette-mapped RGB samples across all frames. */
  def gifFrameStats(c: Column): Column = GraftColumn(GifFrameStats(GraftColumn.expr(c)))

  /** GIF blob → array of per-frame RGB PNG blobs (animation → frame
    * pipeline bridge). */
  def gifFrameSplit(c: Column): Column = GraftColumn(GifFrameSplit(GraftColumn.expr(c)))

  /** id → real MJPEG AVI container with the arithmetic per-frame
    * constant-block rule (fixture). */
  def aviMjpegFixture(id: Column, wBlocks: Int, hBlocks: Int, nFrames: Int): Column =
    GraftColumn(AviMjpegFixture(GraftColumn.expr(id), wBlocks, hBlocks, nFrames))

  /** AVI blob → array(width, height, n_frames, usec_per_frame,
    * n_streams) from the main header, NULL when malformed. */
  def aviInfo(c: Column): Column = GraftColumn(AviInfo(GraftColumn.expr(c)))

  /** AVI blob → array of per-frame video payloads (MJPEG: real JPEGs),
    * NULL when malformed — the real-container video → frame bridge. */
  def aviFrameSplit(c: Column): Column = GraftColumn(AviFrameSplit(GraftColumn.expr(c)))

  /** text → raw-DEFLATE compressed/raw byte ratio (compressibility
    * quality gate; sees repeated structure char entropy cannot). */
  def deflateRatio(c: Column, level: Int = 6): Column =
    GraftColumn(DeflateRatio(GraftColumn.expr(c), level))

  /** text → Unicode-normalized text (NFC/NFD/NFKC/NFKD), optionally
    * accent-stripped and case-folded — canonicalize BEFORE dedup. */
  def normalizeText(c: Column, form: String = "NFC",
      stripAccents: Boolean = false, caseFold: Boolean = false): Column =
    GraftColumn(NormalizeText(GraftColumn.expr(c), form, stripAccents, caseFold))
}
