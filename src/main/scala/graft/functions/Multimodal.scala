package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operators: media (image/audio/video) carried as
  * opaque `binary` columns with typed metadata alongside — the standard
  * lakehouse shape for a training-data pipeline at 100 TB (blobs stay in
  * columnar files; only compact metadata shuffles).
  *
  * Two tiers:
  *   - pure-Column metadata ops (format sniffing by magic bytes, byte
  *     length, content hash, PNG header geometry) — codegen-friendly, no
  *     UDF, run inside the scan;
  *   - a typed `mapPartitions` decode pipeline ([[decodeBatch]]) with a
  *     pluggable per-blob decoder — the Spark-side plumbing (schema,
  *     encoder, partition streaming) is real. PNG decode is REAL too
  *     (pure-JVM zlib + filter reversal, [[PngCodec]]); JPEG/audio
  *     remain header-walk stubs because no entropy-codec libraries
  *     exist in this environment.
  */
object Multimodal {

  /** Container format by magic bytes (public file signatures). */
  def sniffFormat(bin: Column): Column = {
    val h = hex(substring(bin, 1, 8)) // hex of the first 8 bytes
    when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("52494646"), "riff") // wav / webp / avi container
      .when(h.startsWith("424D"), "bmp")
      .when(h.startsWith("000000"), "mp4ish") // ftyp boxes start with size
      .otherwise("unknown")
  }

  def byteLength(bin: Column): Column = length(bin)

  def contentHash(bin: Column): Column = xxhash64(bin)

  /** PNG IHDR geometry straight from the header bytes (width at offset
    * 17..20, height at 21..24, big-endian — PNG spec): pure Column math,
    * no decode. Callers must guard on sniffFormat === "png". */
  def pngWidth(bin: Column): Column =
    conv(hex(substring(bin, 17, 4)), 16, 10).cast("int")
  def pngHeight(bin: Column): Column =
    conv(hex(substring(bin, 21, 4)), 16, 10).cast("int")

  /** JPEG geometry via the native SOF-marker walk ([[JpegDims]] — the
    * offsets are variable, unlike PNG's fixed IHDR, so this is the one
    * header parse that needs an expression). NULL when no frame header.
    * Self-contained (direct expression construction) — no session
    * registration needed. */
  def jpegWidth(bin: Column): Column = element_at(GraftFunctions.jpegDims(bin), 1)
  def jpegHeight(bin: Column): Column = element_at(GraftFunctions.jpegDims(bin), 2)

  /** WAV audio parameters via the native RIFF chunk walk ([[WavInfo]] —
    * chunk offsets are variable like JPEG's markers: LIST/INFO chunks may
    * precede `fmt `). NULL when no well-formed fmt chunk. Self-contained
    * — no session registration needed. */
  def wavSampleRate(bin: Column): Column = element_at(GraftFunctions.wavInfo(bin), 1)
  def wavChannels(bin: Column): Column = element_at(GraftFunctions.wavInfo(bin), 2)
  def wavBitsPerSample(bin: Column): Column = element_at(GraftFunctions.wavInfo(bin), 3)

  /** One metadata struct per blob — the column a pipeline materializes
    * next to the binary at ingest. Geometry is recovered headers-only for
    * png (fixed-offset IHDR) and jpeg (SOF walk); audio parameters for
    * riff/wav (chunk walk); other formats carry NULL metadata until their
    * decoder lands. Pure Column algebra — usable on any session without
    * registration. */
  def mediaMeta(bin: Column): Column = {
    val fmt = sniffFormat(bin)
    val wav = GraftFunctions.wavInfo(bin) // computed once, sliced thrice
    struct(
      byteLength(bin).as("n_bytes"),
      fmt.as("format"),
      contentHash(bin).as("content_hash"),
      when(fmt === "png", pngWidth(bin))
        .when(fmt === "jpeg", jpegWidth(bin)).as("width"),
      when(fmt === "png", pngHeight(bin))
        .when(fmt === "jpeg", jpegHeight(bin)).as("height"),
      when(fmt === "riff", element_at(wav, 1)).as("sample_rate"),
      when(fmt === "riff", element_at(wav, 2)).as("channels"),
      when(fmt === "riff", element_at(wav, 3)).as("bits_per_sample"))
  }

  /** Decoded-media record produced by the decode stage. */
  final case class DecodedMedia(
      id: Long, format: String, width: Int, height: Int, pixelsHash: Long)

  /** Default decoder. PNG and baseline JPEG are REAL decodes
    * ([[PngCodec.decode8]]: zlib inflate + filter reversal;
    * [[JpegCodec.decode]]: Huffman + dequant + IDCT — both pure JVM) —
    * pixelsHash is the FNV-1a of the decoded samples, so two encodings
    * of the same image agree and an entropy/transform bug changes the
    * hash. Out-of-profile JPEGs (progressive, subsampled) fall back to
    * header-walk geometry + content hash; a production deployment may
    * swap in a full codec without touching the pipeline shape. */
  def stubDecode(bytes: Array[Byte]): (String, Int, Int, Long) = {
    def fnv(b: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    PngCodec.decode8(bytes) match {
      case Some((w, ht, _, px)) => ("png", w, ht, fnv(px))
      case None =>
        // unsupported-profile PNG fallback: only trust the fixed-offset
        // dims if the first chunk really is a sane IHDR — a blob bearing
        // just the 8-byte signature must land in "unknown", not report
        // garbage (possibly negative) geometry as a png
        if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
            bytes(2) == 'N' && bytes(3) == 'G' &&
            bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R' &&
            be32(16) > 0 && be32(20) > 0)
          ("png", be32(16), be32(20), fnv(bytes)) // unsupported PNG profile: headers only
        else JpegCodec.decode(bytes) match {
          // real decode: hash of DECODED samples
          case Some((w, ht, _, px)) => ("jpeg", w, ht, fnv(px))
          case None => JpegDims.parse(bytes) match {
            // out-of-profile JPEG (progressive/subsampled): headers only
            case Some((w, ht)) => ("jpeg", w, ht, fnv(bytes))
            case None =>
              val h = fnv(bytes)
              ("unknown", 1 + (math.abs(h) % 4096).toInt,
                1 + (math.abs(h >> 12) % 4096).toInt, h)
          }
        }
    }
  }

  /** Decode stage as a typed partition-streaming map — the Scala analog
    * of a pandas-batch UDF: each partition's blobs stream through the
    * decoder without collecting to the driver, output is a typed Dataset
    * with a proper schema. Decoder is pluggable; default is [[stubDecode]]. */
  def decodeBatch(df: DataFrame, idCol: String, binCol: String,
      decode: Array[Byte] => (String, Int, Int, Long) = stubDecode): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, w, h, px) = decode(bytes)
        DecodedMedia(id, fmt, w, h, px)
      })
  }
}
