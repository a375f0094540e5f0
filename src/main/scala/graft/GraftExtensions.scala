package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration route for graft's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes every function available in SQL and via `call_function` on all
  * sessions of the application — the idiomatic `SparkSessionExtensions`
  * injection point, equivalent to the per-session
  * [[graft.functions.GraftFunctions.register]] used programmatically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array",
      exprs => SimHash64(exprs.head))
    inject("minhash_sig", "minhash_sig(shingles, n) - n-component MinHash signature",
      exprs => MinHashSig(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("minhash_agree", "minhash_agree(a, b) - agreeing signature components",
      exprs => MinHashAgree(exprs.head, exprs(1)))
    inject("sorted_intersect_count", "sorted_intersect_count(a, b) - |A∩B| of sorted long arrays",
      exprs => SortedIntersectCount(exprs.head, exprs(1)))
    inject("char_shingle_hashes", "char_shingle_hashes(text, k) - sorted distinct k-gram hashes",
      exprs => CharShingleHashes(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("cosine_sim", "cosine_sim(a, b) - cosine similarity of two vectors",
      exprs => CosineSim(exprs.head, exprs(1)))
    inject("cosine_lsh_buckets", "cosine_lsh_buckets(vec, planes, tables, seed) - sign-LSH bucket ids",
      exprs => CosineLshBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].longValue()))
    inject("lang_id", "lang_id(text) - stopword language identification",
      exprs => LangIdExpr(exprs.head, TextFunctions.StopwordLists.toSeq))
    inject("jpeg_dims", "jpeg_dims(blob) - array(width, height) from a JPEG SOF header",
      exprs => JpegDims(exprs.head))
    inject("wav_info", "wav_info(blob) - array(rate, channels, bits) from a RIFF fmt chunk",
      exprs => WavInfo(exprs.head))
    inject("png_gray_fixture", "png_gray_fixture(id, w, h) - deterministic grayscale PNG fixture",
      exprs => PngGrayFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("png_pixel_stats", "png_pixel_stats(blob) - array(w, h, n, sum, min, max) of decoded samples",
      exprs => PngPixelStats(exprs.head))
    inject("jpeg_gray_fixture", "jpeg_gray_fixture(id, wb, hb) - deterministic constant-block baseline JPEG fixture",
      exprs => JpegGrayFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("jpeg_pixel_stats", "jpeg_pixel_stats(blob) - array(w, h, n, sum, min, max) of decoded samples",
      exprs => JpegPixelStats(exprs.head))
    inject("jpeg_color_fixture", "jpeg_color_fixture(id, wb, hb) - deterministic 4:4:4 color baseline JPEG fixture",
      exprs => JpegColorFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("jpeg_subsample_fixture", "jpeg_subsample_fixture(id, w_mcu, h_mcu, samp_h, samp_v) - deterministic chroma-subsampled (4:2:0/4:2:2) baseline JPEG fixture",
      exprs => JpegSubsampleFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue(),
        exprs(4).eval().asInstanceOf[Number].intValue()))
    inject("jpeg_rgb_stats", "jpeg_rgb_stats(blob) - array(w, h, n, r_sum, g_sum, b_sum) of decoded RGB samples",
      exprs => JpegRgbStats(exprs.head))
    inject("wav_pcm_fixture", "wav_pcm_fixture(id) - deterministic mono 16-bit PCM WAV fixture",
      exprs => WavPcmFixture(exprs.head))
    inject("wav_pcm_stats", "wav_pcm_stats(blob) - array(rate, ch, bits, n, sum, min, max, sumsq) of decoded PCM samples",
      exprs => WavPcmStats(exprs.head))
    inject("winnowed_anchors", "winnowed_anchors(hashes, stride) - array(struct(pos, g)) of winnowed sliding-window minima",
      exprs => WinnowedAnchorsExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("self_repeat_spans", "self_repeat_spans(token_hashes, k) - array(struct(s, e)) of intra-array repeated k-gram spans (first occurrence kept)",
      exprs => SelfRepeatSpansExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("png_resize", "png_resize(blob, out_w, out_h, bilinear) - decode, resize, re-encode a PNG",
      exprs => PngResize(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Boolean]))
    inject("png_frames_fixture", "png_frames_fixture(id, w, h) - deterministic multi-frame PNG-concat fixture",
      exprs => PngFramesFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("png_frame_split", "png_frame_split(blob) - array of per-frame PNG blobs from a concatenated container",
      exprs => PngFrameSplit(exprs.head))
    inject("wav_frame_stats", "wav_frame_stats(blob, frame_len) - array(n_frames, zero_crossings, energy_max, energy_min) of decoded PCM",
      exprs => WavFrameStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("bloom_any_contain", "bloom_any_contain(hashes, sketch) - true when any hash might be in the Bloom sketch",
      exprs => BloomAnyContain(exprs.head, exprs(1)))
    inject("wav_spectral_stats", "wav_spectral_stats(blob, frame_len, n_bands) - array(n_frames, parseval_total, peak_bin, peak_frac_pct, bands...) of FFT features over decoded PCM",
      exprs => WavSpectralStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("wav_tone_fixture", "wav_tone_fixture(id) - pure-tone mono 16-bit PCM WAV fixture at bin 3 + id mod 8",
      exprs => WavToneFixture(exprs.head))
    inject("wav_melody_fixture", "wav_melody_fixture(id) - 8-segment melody PCM WAV fixture for audio dedup",
      exprs => WavMelodyFixture(exprs.head))
    inject("wav_scale_amplitude", "wav_scale_amplitude(blob, num, den) - volume-scaled PCM re-emission",
      exprs => WavScaleAmplitude(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("wav_requantize", "wav_requantize(blob, drop_bits) - bit-depth-reduced PCM re-emission",
      exprs => WavRequantize(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("wav_audio_fingerprint", "wav_audio_fingerprint(blob, frame_len, n_bands) - 64-bit Haitsma-Kalker audio fingerprint",
      exprs => WavAudioFingerprint(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("image_phash", "image_phash(blob) - 64-bit perceptual hash of a PNG/JPEG image",
      exprs => ImagePHash(exprs.head))
    inject("png_noise_fixture", "png_noise_fixture(id, w, h) - deterministic noise grayscale PNG fixture",
      exprs => PngNoiseFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("png_to_jpeg", "png_to_jpeg(blob, quant_step) - lossy grayscale baseline JPEG re-encode of a PNG",
      exprs => PngToJpeg(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("png_noise_frames_fixture", "png_noise_frames_fixture(id, w, h, skip) - multi-frame smooth-noise video fixture, head-trimmed by skip",
      exprs => PngNoiseFramesFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()))
    inject("gif_gray_fixture", "gif_gray_fixture(id, w, h) - animated grayscale GIF fixture (real LZW, interlaced odd frames)",
      exprs => GifGrayFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("gif_frame_stats", "gif_frame_stats(blob) - array(n_frames, w, h, n_samples, sum, min, max) of decoded GIF RGB samples",
      exprs => GifFrameStats(exprs.head))
    inject("gif_frame_split", "gif_frame_split(blob) - array of per-frame RGB PNG blobs from an animated GIF",
      exprs => GifFrameSplit(exprs.head))
    inject("avi_mjpeg_fixture", "avi_mjpeg_fixture(id, w_blocks, h_blocks, n_frames) - deterministic MJPEG AVI fixture",
      exprs => AviMjpegFixture(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()))
    inject("avi_info", "avi_info(blob) - array(w, h, n_frames, usec_per_frame, n_streams) from an AVI main header",
      exprs => AviInfo(exprs.head))
    inject("avi_frame_split", "avi_frame_split(blob) - array of per-frame video payload blobs from an AVI movi list",
      exprs => AviFrameSplit(exprs.head))
    inject("kll_sketch_agg", "kll_sketch_agg(value, k) - mergeable KLL quantile sketch blob",
      exprs => KllSketchAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("kll_merge_agg", "kll_merge_agg(sketch, k) - union of KLL sketch blobs",
      exprs => KllMergeAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("kll_quantiles", "kll_quantiles(sketch, array(q...)) - quantile estimates from a KLL blob",
      exprs => KllQuantiles(exprs.head,
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray().toSeq))
    inject("deflate_ratio", "deflate_ratio(text, level) - raw-DEFLATE compressed/raw byte ratio of the UTF-8 text",
      exprs => DeflateRatio(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings",
      exprs => JaroWinkler(exprs.head, exprs(1)))
    inject("lcs_len", "lcs_len(a, b) - longest-common-subsequence length of two token arrays",
      exprs => LcsLen(exprs.head, exprs(1)))
    inject("token_edit_dist", "token_edit_dist(a, b) - token-level Levenshtein distance of two token arrays",
      exprs => TokenEditDist(exprs.head, exprs(1)))
    inject("normalize_text", "normalize_text(text, form, strip_accents, case_fold) - Unicode-normalized text",
      exprs => NormalizeText(exprs.head,
        exprs(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        exprs(2).eval().asInstanceOf[Boolean],
        exprs(3).eval().asInstanceOf[Boolean]))
  }
}
