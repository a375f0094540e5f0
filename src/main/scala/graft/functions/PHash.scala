package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual image hashing (pHash) — the image analogue of SimHash:
  * a 64-bit fingerprint whose Hamming distance tracks VISUAL similarity,
  * so re-encoded (PNG→JPEG), re-compressed, and re-sized copies of one
  * image land within a few bits of each other while distinct images are
  * ~32 bits apart. The standard published construction (as popularized
  * by the open pHash project): normalize to 32×32 grayscale (bilinear),
  * take the 2D DCT-II, keep the 8×8 lowest-frequency block, and emit one
  * bit per coefficient — set iff the coefficient exceeds the mean of the
  * 63 AC entries (DC excluded: it is raw brightness, which re-encodes
  * shift freely).
  *
  * Scale shape: hashing is in-scan (native expression over the blob
  * column — one long out per image, no pixels ever shuffle); pairing
  * reuses [[Dedup.hammingNearDupPairs]] banding, so candidates come from
  * chunk equi-joins exactly like text SimHash. Decode reuses the repo's
  * own codecs — [[PngCodec]] and [[JpegCodec]] — so the operator needs
  * no image libraries and inherits their bomb caps and never-throw
  * contracts.
  */
object PHash {

  // c(u)·cos((2x+1)uπ/64) for the 32-point DCT-II, rows u < 8 only —
  // pHash keeps just the 8×8 low-frequency corner
  private val Cos32: Array[Array[Double]] = Array.tabulate(8, 32) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 64.0)
  }

  /** 64-bit perceptual hash of decoded 8-bit samples (1 = gray, 2 =
    * gray+alpha, 3 = RGB, 4 = RGBA; alpha is ignored, color collapses
    * to integer Rec.601 luma). */
  def pHash64(px: Array[Byte], w: Int, h: Int, ch: Int): Long = {
    val n = w * h
    val gray: Array[Byte] =
      if (ch == 1) px
      else {
        val g = new Array[Byte](n)
        var i = 0
        while (i < n) {
          g(i) =
            if (ch >= 3) {
              val r = px(i * ch) & 0xff
              val gg = px(i * ch + 1) & 0xff
              val b = px(i * ch + 2) & 0xff
              ((r * 299 + gg * 587 + b * 114 + 500) / 1000).toByte
            } else px(i * ch) // gray+alpha: luminance channel
          i += 1
        }
        g
      }
    val s = ImageOps.resizeBilinear(gray, w, h, 1, 32, 32)
    // separable DCT: tmp(u)(x) = Σy c(u)cos(...)·f(y,x), then
    // F(u,v) = Σx c(v)cos(...)·tmp(u)(x) — 8×32×32 + 8×8×32 mults
    val tmp = Array.ofDim[Double](8, 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        var acc = 0.0
        var y = 0
        while (y < 32) { acc += Cos32(u)(y) * (s(y * 32 + x) & 0xff); y += 1 }
        tmp(u)(x) = acc
        x += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 32) { acc += Cos32(v)(x) * tmp(u)(x); x += 1 }
        coef(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    var mean = 0.0
    var k = 1
    while (k < 64) { mean += coef(k); k += 1 }
    mean /= 63.0
    var hash = 0L
    k = 1
    while (k < 64) {
      if (coef(k) > mean) hash |= 1L << k
      k += 1
    }
    hash // bit 0 (DC) always clear
  }

  /** Decode any supported image blob (PNG, then baseline JPEG) and hash
    * it; None when neither codec accepts the bytes. */
  def ofBlob(b: Array[Byte]): Option[Long] =
    (PngCodec.decode8(b) orElse JpegCodec.decode(b))
      .map { case (w, h, ch, px) => pHash64(px, w, h, ch) }

  /** blob → 64-bit perceptual hash Column. */
  def imagePHash(c: Column): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn(ImagePHash(GraftColumn.expr(c)))
  }

  /** id → structurally-distinct pseudo-random grayscale PNG (fixture). */
  def pngNoiseFixture(id: Column, width: Int, height: Int): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn(PngNoiseFixture(GraftColumn.expr(id), width, height))
  }

  /** PNG blob → genuinely lossy grayscale baseline JPEG re-encode. */
  def pngToJpeg(c: Column, quantStep: Int): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn(PngToJpeg(GraftColumn.expr(c), quantStep))
  }

  /** id → multi-frame smooth-noise video fixture; skip > 0 trims the head. */
  def pngNoiseFramesFixture(id: Column, width: Int, height: Int, skip: Int = 0): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn(PngNoiseFramesFixture(GraftColumn.expr(id), width, height, skip))
  }
}

/** Image blob (PNG or baseline JPEG) → 64-bit perceptual hash; NULL for
  * undecodable input. In-scan: one long per image leaves the scan, the
  * pixels never do. */
case class ImagePHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_phash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_phash requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PHash.ofBlob(input.asInstanceOf[Array[Byte]]) match {
      case Some(h) => h
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): ImagePHash =
    copy(child = newChild)
}

/** id → real grayscale PNG of SMOOTH splitmix64-derived random content:
  * an 8×8 random grid bilinearly upsampled to the target geometry.
  * Structurally DISTINCT per id (unlike the gradient fixtures, whose
  * images differ only by a brightness shift that pHash is — correctly —
  * invariant to), yet band-limited like a real photograph, so planted
  * re-encodes and re-sizes of the SAME id land a few Hamming bits away
  * while distinct ids sit ~32 apart. (Raw per-pixel noise would not:
  * measured, a 48×48 bilinear downscale of white noise moves the pHash
  * up to 13 bits — resampling noise is aliasing, resampling band-limited
  * content is nearly lossless.) */
case class PngNoiseFixture(child: Expression, imgW: Int, imgH: Int)
    extends UnaryExpression with CodegenFallback {
  require(imgW > 0 && imgH > 0, "fixture geometry must be positive")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_noise_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_noise_fixture requires bigint id, got ${other.simpleString}")
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val grid = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      grid(i) = (splitmix64(id * 0x100000001b3L + i) & 0xff).toByte
      i += 1
    }
    PngCodec.encode8(imgW, imgH, 1,
      ImageOps.resizeBilinear(grid, 8, 8, 1, imgW, imgH))
  }

  override protected def withNewChildInternal(newChild: Expression): PngNoiseFixture =
    copy(child = newChild)
}

/** id → multi-frame video fixture for near-dup detection: 5 + (id mod 3)
  * smooth-noise PNG frames back-to-back ([[ImageOps.splitFrames]]
  * container shape), frame f seeded by splitmix64(id·1000003 + f·4099 + …)
  * — every frame structurally distinct from every other frame of every
  * video. `skip` drops the first frames: `skip = 1` is the classic
  * TRIMMED COPY (same content minus the head), the planted duplicate for
  * frame-level video dedup — its frames hash IDENTICALLY to the
  * original's frames 1…n, just at shifted positions. */
case class PngNoiseFramesFixture(child: Expression, imgW: Int, imgH: Int, skip: Int)
    extends UnaryExpression with CodegenFallback {
  require(imgW > 0 && imgH > 0, "fixture geometry must be positive")
  require(skip >= 0 && skip <= 4, s"skip must be in [0, 4], got $skip")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_noise_frames_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_noise_frames_fixture requires bigint id, got ${other.simpleString}")
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val nf = 5 + (((id % 3) + 3) % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = skip
    while (f < nf) {
      val grid = new Array[Byte](64)
      var i = 0
      while (i < 64) {
        grid(i) = (splitmix64(id * 1000003L + f * 4099L + i) & 0xff).toByte
        i += 1
      }
      out.write(PngCodec.encode8(imgW, imgH, 1,
        ImageOps.resizeBilinear(grid, 8, 8, 1, imgW, imgH)))
      f += 1
    }
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): PngNoiseFramesFixture =
    copy(child = newChild)
}

/** PNG blob → LOSSY grayscale baseline JPEG: real decode, Rec.601 luma
  * collapse, forward DCT + quantization at a uniform `quantStep`, real
  * entropy encode ([[JpegCodec.encodeGrayPixels]]). The transform a
  * re-compressed web copy actually undergoes — the planted-duplicate
  * generator for perceptual dedup. NULL for undecodable input. */
case class PngToJpeg(child: Expression, quantStep: Int)
    extends UnaryExpression with CodegenFallback {
  require(quantStep >= 4 && quantStep <= 255,
    s"quant step must be in [4, 255], got $quantStep")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_to_jpeg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_to_jpeg requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PngCodec.decode8(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, ch, px)) =>
        val gray: Array[Byte] =
          if (ch == 1) px
          else {
            val g = new Array[Byte](w * h)
            var i = 0
            while (i < w * h) {
              g(i) =
                if (ch >= 3) {
                  val r = px(i * ch) & 0xff
                  val gg = px(i * ch + 1) & 0xff
                  val b = px(i * ch + 2) & 0xff
                  ((r * 299 + gg * 587 + b * 114 + 500) / 1000).toByte
                } else px(i * ch)
              i += 1
            }
            g
          }
        val qtab = { val t = Array.fill(64)(quantStep); t(0) = 8; t }
        JpegCodec.encodeGrayPixels(w, h, gray, qtab)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): PngToJpeg =
    copy(child = newChild)
}
