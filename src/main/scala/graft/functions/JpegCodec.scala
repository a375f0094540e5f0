package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pure-JVM baseline JPEG codec — no ImageIO, no native libs.
  *
  * Decoder: baseline sequential DCT (SOF0), 8-bit precision, grayscale
  * or 3-component color with sampling factors 1–2 per axis — covering
  * 4:4:4, 4:2:2 (luma 2×1) and 4:2:0 (luma 2×2), the profiles real-world
  * web JPEGs actually use. The full entropy path is real: marker walk
  * (DQT/DHT/SOF0/DRI/SOS with multi-table segments), canonical Huffman
  * decode built from the stream's own BITS/HUFFVAL, byte-stuffing
  * (FF 00) and restart-marker handling, run-length AC decode (EOB/ZRL),
  * dezigzag, dequantization, a separable double-precision IDCT with
  * level shift and clamping, interleaved-MCU assembly (hᵢ×vᵢ blocks per
  * component per MCU, spec A.2.3), and replication (box) chroma
  * upsampling. 3-component scans convert JFIF YCbCr→RGB. Everything
  * outside the profile (progressive SOF2, arithmetic coding, 3–4×
  * sampling factors, 12-bit) returns None rather than garbage — same
  * contract as [[PngCodec]].
  *
  * Encoder: fixture-grade grayscale baseline writer used by the
  * oracle protocol. It entropy-codes arbitrary QUANTIZED coefficient
  * blocks (real Huffman + RLE + zigzag + stuffing), so the decoder's
  * entropy path is exercised by real streams. Constant-value blocks
  * carry only a DC coefficient — exactly representable through
  * DCT/quantization — so decode is bit-exact against an arithmetic
  * rule an external oracle evaluates without any codec (the same
  * trick [[PngGrayFixture]] plays with filter rotation).
  *
  * Format facts from the public JPEG spec (ITU-T T.81 / ISO 10918-1):
  * canonical code construction follows Annex C, the decoder control
  * flow Annex F; the zigzag order and table-class layout are spec
  * figures. Reference behavior: target/data-validator has no image
  * path — this surface comes from the builder brief's multimodal
  * requirements.
  */
object JpegCodec {

  /** zigzag index → natural (row-major) index, spec Figure A.6. */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // c[u][x] = C(u)·cos((2x+1)uπ/16); IDCT f = 1/4 Σu Σv c[u][x] c[v][y] F
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table from the DHT (BITS, HUFFVAL) pair: for each
    * code length, the smallest code and the index of its first symbol —
    * the Annex C/F decode structure. */
  private[functions] final class Huff(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** symbol → (code, length) for the encoder side. */
    lazy val encodeMap: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m += (vals(k) & 0xff) -> ((code, l))
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with FF00
    * unstuffing; restart markers are consumed by [[syncRestart]]. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    var truncated = false
    var markerHit = 0 // last non-RST marker seen mid-scan (0 = none)

    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { truncated = true; return 0 }
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { truncated = true; return 0 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed FF data byte
          else { markerHit = next; truncated = true; byte = 0 }
        }
        acc = byte
        nbits = 8
      }
      nbits -= 1
      ((acc >> nbits) & 1L).toInt
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker; false on anything
      * else (corrupt restart structure). */
    def syncRestart(expected: Int): Boolean = {
      nbits = 0
      markerHit = 0
      // an all-ones pad byte is 0xFF and carries a stuffed 0x00 — step
      // over the pair before expecting the marker
      if (pos + 2 <= b.length && (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == 0x00)
        pos += 2
      if (pos + 2 > b.length) return false
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 | expected)) return false
      pos += 2
      true
    }

    def decodeHuff(h: Huff): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.vals(h.valPtr(l) + code - h.minCode(l)) & 0xff
        code = (code << 1) | readBit()
        l += 1
      }
      truncated = true
      0
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JPEG to (width, height, nComponents, samples).
    * Samples are row-major: raw luminance for 1 component, interleaved
    * RGB (JFIF YCbCr→RGB) for 3. None outside the supported profile or
    * on corrupt framing/entropy data. `maxSamples` bounds allocations
    * against decompression-bomb headers (same guard as PngCodec). */
  def decode(b: Array[Byte], maxSamples: Long = 1L << 26): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2
    def u16(p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = -1; var height = -1
    var nComp = 0
    // per component: id, qtab idx, dc idx, ac idx, sampling factors
    val compId = new Array[Int](3); val compQ = new Array[Int](3)
    val compDc = new Array[Int](3); val compAc = new Array[Int](3)
    val compH = new Array[Int](3); val compV = new Array[Int](3)
    var restartInterval = 0

    while (o + 4 <= b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      var m = b(o + 1) & 0xff
      var p = o + 2
      while (m == 0xff && p < b.length) { m = b(p) & 0xff; p += 1 } // fill bytes
      o = p
      m match {
        case 0xd9 => return None // EOI before SOS completed
        case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman SOF
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (o + len > b.length || len < 8) return None
          val precision = b(o + 2) & 0xff
          height = u16(o + 3); width = u16(o + 5)
          nComp = b(o + 7) & 0xff
          if (precision != 8 || width <= 0 || height <= 0) return None
          if (nComp != 1 && nComp != 3) return None
          if (len < 8 + 3 * nComp) return None
          var c = 0
          while (c < nComp) {
            compId(c) = b(o + 8 + 3 * c) & 0xff
            val hv = b(o + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            // sampling factors 1–2 cover the real-world profiles: 4:4:4
            // (1×1 everywhere), 4:2:2 (luma 2×1) and 4:2:0 (luma 2×2);
            // 3–4× factors stay out of profile
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2) return None
            compQ(c) = b(o + 10 + 3 * c) & 0xff
            if (compQ(c) > 3) return None
            c += 1
          }
          // bound the MCU-PADDED planes, not just w×h: a 1×(2^26) image
          // pads to one full MCU column — with 2×2 luma that is 16 rows
          // per declared row. Single-component scans are non-interleaved
          // (one block per MCU, spec A.2), so their padding is 8×8.
          val mh = if (nComp == 1) 1 else math.max(compH(0), math.max(compH(1), compH(2)))
          val mv = if (nComp == 1) 1 else math.max(compV(0), math.max(compV(1), compV(2)))
          val mx = (width + 8L * mh - 1) / (8 * mh)
          val my = (height + 8L * mv - 1) / (8 * mv)
          var tot = 0L
          c = 0
          while (c < nComp) {
            val hc = if (nComp == 1) 1 else compH(c)
            val vc = if (nComp == 1) 1 else compV(c)
            tot += (mx * hc * 8) * (my * vc * 8)
            c += 1
          }
          if (tot > maxSamples) return None
          o += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / hierarchical: not baseline
        case 0xdb => // DQT: one or more tables
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (o + len > b.length) return None
          var p2 = o + 2
          while (p2 < o + len) {
            val pqtq = b(p2) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0x0f
            if (tq > 3 || pq > 1) return None
            val n = if (pq == 0) 64 else 128
            if (p2 + 1 + n > o + len) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) b(p2 + 1 + i) & 0xff else u16(p2 + 1 + 2 * i)
              if (t(i) == 0) return None
              i += 1
            }
            qtabs(tq) = t
            p2 += 1 + n
          }
          o += len
        case 0xc4 => // DHT: one or more tables
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (o + len > b.length) return None
          var p2 = o + 2
          while (p2 < o + len) {
            val tcth = b(p2) & 0xff
            val tc = tcth >> 4; val th = tcth & 0x0f
            if (tc > 1 || th > 3) return None
            if (p2 + 17 > o + len) return None
            val bits = Array.tabulate(16)(i => b(p2 + 1 + i) & 0xff)
            val total = bits.sum
            if (total > 256 || p2 + 17 + total > o + len) return None
            val vals = new Array[Byte](total)
            System.arraycopy(b, p2 + 17, vals, 0, total)
            val h = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            p2 += 17 + total
          }
          o += len
        case 0xdd => // DRI
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (len != 4 || o + len > b.length) return None
          restartInterval = u16(o + 2)
          o += len
        case 0xda => // SOS: decode the scan and return
          if (width < 0) return None
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (o + len > b.length || len < 6) return None
          val ns = b(o + 2) & 0xff
          if (ns != nComp) return None // non-interleaved multi-scan: out of profile
          // declared length must actually contain the component specs +
          // spectral bytes — a short len with a plausible ns would read
          // past the segment (and potentially the buffer)
          if (len < 6 + 2 * ns) return None
          var c = 0
          while (c < ns) {
            val cs = b(o + 3 + 2 * c) & 0xff
            val ci = compId.indexOf(cs)
            if (ci < 0 || ci >= nComp) return None
            val tdta = b(o + 4 + 2 * c) & 0xff
            compDc(ci) = tdta >> 4; compAc(ci) = tdta & 0x0f
            if (compDc(ci) > 3 || compAc(ci) > 3) return None
            c += 1
          }
          return decodeScan(b, o + len, width, height, nComp, compQ, compDc, compAc,
            compH, compV, qtabs, dcTabs, acTabs, restartInterval)
        case x if x >= 0xe0 && x <= 0xef => // APPn
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (len < 2 || o + len > b.length) return None
          o += len
        case 0xfe => // COM
          if (o + 2 > b.length) return None
          val len = u16(o)
          if (len < 2 || o + len > b.length) return None
          o += len
        case _ => return None // TEM/DNL/JPG/RSTn outside a scan: corrupt or unsupported
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, width: Int, height: Int,
      nComp: Int, compQ: Array[Int], compDc: Array[Int], compAc: Array[Int],
      compH: Array[Int], compV: Array[Int],
      qtabs: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int): Option[(Int, Int, Int, Array[Byte])] = {
    var c = 0
    while (c < nComp) {
      if (qtabs(compQ(c)) == null || dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
        return None
      c += 1
    }
    // Interleaved-MCU geometry (spec A.2.3): an MCU is hᵢ×vᵢ blocks of
    // each component i; the image is mcusX×mcusY MCUs, each plane padded
    // to its own block multiple. A single-component scan is
    // NON-interleaved (spec A.2.2): one block per MCU regardless of the
    // declared factors, so hc/vc collapse to 1.
    val hc = Array.tabulate(nComp)(i => if (nComp == 1) 1 else compH(i))
    val vc = Array.tabulate(nComp)(i => if (nComp == 1) 1 else compV(i))
    var maxH = 1; var maxV = 1
    c = 0
    while (c < nComp) {
      if (hc(c) > maxH) maxH = hc(c)
      if (vc(c) > maxV) maxV = vc(c)
      c += 1
    }
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val planeW = Array.tabulate(nComp)(i => mcusX * hc(i) * 8)
    val planes = Array.tabulate(nComp)(i => new Array[Byte](planeW(i) * mcusY * vc(i) * 8))
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val r = new BitReader(b, scanStart)
    var mcu = 0
    var rstIdx = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.syncRestart(rstIdx)) return None
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mcuY = mcu / mcusX; val mcuX = mcu % mcusX
      c = 0
      while (c < nComp) {
        val q = qtabs(compQ(c))
        var vb = 0
        while (vb < vc(c)) {
          var hb = 0
          while (hb < hc(c)) {
            val by = mcuY * vc(c) + vb
            val bx = mcuX * hc(c) + hb
            java.util.Arrays.fill(coef, 0)
            // DC: category + extend, difference-coded against the predictor
            val s = r.decodeHuff(dcTabs(compDc(c)))
            if (s > 11 || r.truncated) return None
            val diff = extend(r.receive(s), s)
            pred(c) += diff
            coef(0) = pred(c) * q(0)
            // AC run-length: (run, size) symbols with EOB and ZRL
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = r.decodeHuff(acTabs(compAc(c)))
              if (r.truncated) return None
              val run = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) {
                  // ZRL: sixteen zeros — spec-legal only while a coefficient
                  // slot remains after the skip; past 63 the stream is
                  // corrupt, same contract as the (run,size) bound below
                  k += 16
                  if (k > 63) return None
                } else done = true // EOB
              } else {
                k += run
                if (k > 63) return None
                coef(Zigzag(k)) = extend(r.receive(size), size) * q(k)
                k += 1
              }
            }
            if (r.truncated) return None
            // separable IDCT: t[u][y] = Σv c[v][y]·F[u][v], f = 1/4 Σu c[u][x]·t[u][y]
            var u = 0
            while (u < 8) {
              var y = 0
              while (y < 8) {
                var acc = 0.0
                var v = 0
                while (v < 8) { acc += CosTab(v)(y) * coef(u * 8 + v); v += 1 }
                tmp(u)(y) = acc
                y += 1
              }
              u += 1
            }
            val plane = planes(c)
            val pw = planeW(c)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var uu = 0
                // natural order: coef(row*8+col); rows transform over x via u
                while (uu < 8) { acc += CosTab(uu)(x) * tmp(uu)(y); uu += 1 }
                val px = math.round(acc / 4.0 + 128.0)
                val clamped = if (px < 0) 0 else if (px > 255) 255 else px.toInt
                plane((by * 8 + x) * pw + bx * 8 + y) = clamped.toByte
                x += 1
              }
              y += 1
            }
            hb += 1
          }
          vb += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop the MCU-padded planes to w×h, upsample subsampled chroma by
    // sample replication (the JFIF box filter — exact on the constant
    // blocks the oracle fixtures plant), and interleave
    val out = new Array[Byte](width * height * nComp)
    if (nComp == 1) {
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planes(0)((y * vc(0) / maxV) * planeW(0) + x * hc(0) / maxH) & 0xff
          val cb = (planes(1)((y * vc(1) / maxV) * planeW(1) + x * hc(1) / maxH) & 0xff) - 128
          val cr = (planes(2)((y * vc(2) / maxV) * planeW(2) + x * hc(2) / maxH) & 0xff) - 128
          def cl(d: Double): Byte = {
            val v = math.round(d)
            (if (v < 0) 0 else if (v > 255) 255 else v.toInt).toByte
          }
          out((y * width + x) * 3) = cl(yv + 1.402 * cr)
          out((y * width + x) * 3 + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
          out((y * width + x) * 3 + 2) = cl(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some((width, height, nComp, out))
  }

  // ---------------------------------------------------------------- encoder

  /** Annex-K-shaped luminance Huffman tables. Correctness does not hinge
    * on matching the spec byte-for-byte: the SAME (BITS, HUFFVAL) pair is
    * written to the stream's DHT and used to encode, so any valid pair
    * round-trips — but these are the standard public tables, so fixture
    * streams look like what real encoders emit. */
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val StdAcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode QUANTIZED coefficient blocks (natural row-major order,
    * row-major block order over a wBlocks×hBlocks grid) as a grayscale
    * baseline JPEG with quant table `qtab` (natural order). The real
    * entropy path: zigzag, DC difference coding, AC run-length with
    * EOB/ZRL, canonical Huffman, byte stuffing; `restartInterval > 0`
    * adds DRI + RSTn markers with predictor resets every that many
    * MCUs, exercising the decoder's restart resync. */
  def encodeGrayCoefficients(wBlocks: Int, hBlocks: Int, qtab: Array[Int],
      blocks: Array[Array[Int]], restartInterval: Int = 0): Array[Byte] = {
    require(blocks.length == wBlocks * hBlocks, "one coefficient block per grid cell")
    encodeBaseline(wBlocks, hBlocks, Seq(qtab), Seq((1, 1, blocks)), restartInterval)
  }

  /** Three-component 4:4:4 variant: Y uses quant/Huffman table 0,
    * Cb/Cr share table 1 (the conventional layout) — exercising the
    * decoder's multi-table DQT/DHT and interleaved-MCU paths. Blocks
    * are quantized coefficients per component. */
  def encodeColor444Coefficients(wBlocks: Int, hBlocks: Int,
      qtabLuma: Array[Int], qtabChroma: Array[Int],
      y: Array[Array[Int]], cb: Array[Array[Int]], cr: Array[Array[Int]],
      restartInterval: Int = 0): Array[Byte] = {
    require(y.length == wBlocks * hBlocks && cb.length == y.length && cr.length == y.length,
      "one coefficient block per grid cell per component")
    encodeBaseline(wBlocks, hBlocks, Seq(qtabLuma, qtabChroma),
      Seq((1, 1, y), (1, 1, cb), (1, 1, cr)), restartInterval)
  }

  /** Chroma-subsampled variant (`sampH`×`sampV` luma factors — (2,2) is
    * 4:2:0, (2,1) is 4:2:2): the image is `wMcu`×`hMcu` MCUs, luma
    * carries sampH·sampV blocks per MCU (plane-block-row-major over a
    * (wMcu·sampH)×(hMcu·sampV) grid), chroma one block per MCU at
    * wMcu×hMcu. Exercises the decoder's multi-block-per-MCU interleave
    * and chroma upsampling. */
  def encodeSubsampledCoefficients(wMcu: Int, hMcu: Int,
      qtabLuma: Array[Int], qtabChroma: Array[Int], sampH: Int, sampV: Int,
      y: Array[Array[Int]], cb: Array[Array[Int]], cr: Array[Array[Int]],
      restartInterval: Int = 0): Array[Byte] = {
    require(sampH >= 1 && sampH <= 2 && sampV >= 1 && sampV <= 2 && sampH * sampV > 1,
      "subsampled profiles have luma factors in 1..2 with at least one axis 2")
    require(y.length == wMcu * sampH * hMcu * sampV, "luma blocks cover the sampled grid")
    require(cb.length == wMcu * hMcu && cr.length == wMcu * hMcu,
      "one chroma block per MCU")
    encodeBaseline(wMcu, hMcu, Seq(qtabLuma, qtabChroma),
      Seq((sampH, sampV, y), (1, 1, cb), (1, 1, cr)), restartInterval)
  }

  /** `comps`: per component (h, v, blocks) where blocks are quantized
    * coefficient blocks in PLANE block-row-major order over a
    * (mcusX·h)×(mcusY·v) grid; the MCU loop interleaves them in spec
    * A.2.3 order (v rows × h cols per component per MCU). */
  private def encodeBaseline(mcusX: Int, mcusY: Int, qtabs: Seq[Array[Int]],
      comps: Seq[(Int, Int, Array[Array[Int]])], restartInterval: Int): Array[Byte] = {
    qtabs.foreach(q =>
      require(q.length == 64 && q.forall(v => v >= 1 && v <= 255), "8-bit quant table"))
    val nComp = comps.length
    val maxH = comps.map(_._1).max
    val maxV = comps.map(_._2).max
    // component c uses qtab/huff table 0 for luma, 1 for chroma
    def tabOf(c: Int): Int = if (c == 0) 0 else 1
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    qtabs.zipWithIndex.foreach { case (q, ti) =>
      marker(0xdb); u16(2 + 1 + 64); out.write(ti) // DQT, 8-bit
      var i = 0
      while (i < 64) { out.write(q(Zigzag(i))); i += 1 } // stored in zigzag order
    }
    (0 until qtabs.length).foreach { ti =>
      marker(0xc4); u16(2 + 1 + 16 + StdDcVals.length); out.write(ti) // DHT DC
      StdDcBits.foreach(out.write); out.write(StdDcVals, 0, StdDcVals.length)
      marker(0xc4); u16(2 + 1 + 16 + StdAcVals.length); out.write(0x10 | ti) // DHT AC
      StdAcBits.foreach(out.write); out.write(StdAcVals, 0, StdAcVals.length)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) } // DRI
    marker(0xc0); u16(2 + 6 + 3 * nComp) // SOF0: 8-bit
    out.write(8); u16(mcusY * 8 * maxV); u16(mcusX * 8 * maxH); out.write(nComp)
    (0 until nComp).foreach { c =>
      out.write(c + 1); out.write((comps(c)._1 << 4) | comps(c)._2); out.write(tabOf(c))
    }
    marker(0xda); u16(2 + 1 + 2 * nComp + 3) // SOS
    out.write(nComp)
    (0 until nComp).foreach { c =>
      out.write(c + 1); out.write((tabOf(c) << 4) | tabOf(c))
    }
    out.write(0); out.write(63); out.write(0)
    val dcH = (0 until qtabs.length).map(_ => new Huff(StdDcBits, StdDcVals).encodeMap)
    val acH = (0 until qtabs.length).map(_ => new Huff(StdAcBits, StdAcVals).encodeMap)
    val w = new BitWriter(out)
    def emit(sym: Int, tab: Map[Int, (Int, Int)]): Unit = {
      val (code, len) = tab(sym)
      w.write(code, len)
    }
    def emitValue(v: Int, s: Int): Unit =
      if (s > 0) w.write(if (v < 0) v + (1 << s) - 1 else v, s)
    def emitBlock(blk: Array[Int], c: Int, pred: Array[Int]): Unit = {
      require(blk.length == 64, "64 coefficients per block")
      val t = tabOf(c)
      val diff = blk(0) - pred(c)
      pred(c) = blk(0)
      val s = category(diff)
      require(s <= 11, s"DC difference $diff out of baseline range")
      emit(s, dcH(t)); emitValue(diff, s)
      var k = 1
      var zeros = 0
      while (k < 64) {
        val v = blk(Zigzag(k))
        if (v == 0) zeros += 1
        else {
          while (zeros > 15) { emit(0xf0, acH(t)); zeros -= 16 } // ZRL
          val sz = category(v)
          require(sz <= 10, s"AC coefficient $v out of baseline range")
          emit((zeros << 4) | sz, acH(t)); emitValue(v, sz)
          zeros = 0
        }
        k += 1
      }
      if (zeros > 0) emit(0x00, acH(t)) // EOB
    }
    val pred = new Array[Int](nComp)
    val nMcu = mcusX * mcusY
    var rstIdx = 0
    var mcu = 0
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.flush() // byte-align before the marker, pad bits all-ones
        marker(0xd0 | rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mcuY = mcu / mcusX; val mcuX = mcu % mcusX
      var c = 0
      while (c < nComp) {
        val (h, v, blocks) = comps(c)
        var vb = 0
        while (vb < v) {
          var hb = 0
          while (hb < h) {
            emitBlock(blocks((mcuY * v + vb) * (mcusX * h) + mcuX * h + hb), c, pred)
            hb += 1
          }
          vb += 1
        }
        c += 1
      }
      mcu += 1
    }
    w.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode 8-bit grayscale PIXELS as a real baseline JPEG: level shift,
    * forward DCT per 8×8 block (edge-replicated padding), quantization
    * against `qtab` (round half up), then the entropy encoder — the
    * genuinely LOSSY round-trip a re-compressed web image goes through,
    * used by [[PngToJpeg]] to plant realistic perceptual near-dups.
    * Quant steps are clamped to ≥4 so every quantized coefficient stays
    * inside baseline Huffman categories (|F| ≤ 2048 ⇒ |F|/4 ≤ 512 ⇒
    * category ≤ 10). */
  def encodeGrayPixels(w: Int, h: Int, px: Array[Byte], qtab: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h, "pixel buffer must match geometry")
    val q = qtab.map(v => math.min(255, math.max(4, v)))
    val wB = (w + 7) / 8; val hB = (h + 7) / 8
    val f = Array.ofDim[Double](8, 8)
    val blocks = Array.tabulate(wB * hB) { bi =>
      val bx = bi % wB; val by = bi / wB
      var y = 0
      while (y < 8) {
        val sy = math.min(h - 1, by * 8 + y)
        var x = 0
        while (x < 8) {
          f(y)(x) = (px(sy * w + math.min(w - 1, bx * 8 + x)) & 0xff) - 128.0
          x += 1
        }
        y += 1
      }
      val blk = new Array[Int](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          // F(u,v) = 1/4 Σy Σx f(y,x)·c(u)cos((2y+1)uπ/16)·c(v)cos((2x+1)vπ/16)
          // — the inverse of the decoder's IDCT (CosTab carries the c
          // factors), so coefficient (u,v) means the same thing there
          var acc = 0.0
          y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { acc += f(y)(x) * CosTab(u)(y) * CosTab(v)(x); x += 1 }
            y += 1
          }
          blk(u * 8 + v) = math.round(acc / 4.0 / q(u * 8 + v)).toInt
          v += 1
        }
        u += 1
      }
      blk
    }
    encodeGrayCoefficients(wB, hB, q, blocks, restartInterval)
  }

  /** Fixture quant table: DC step 8 makes a constant block's lone DC
    * coefficient 8·(v−128)/8 = v−128 — integers round-trip exactly. */
  private[functions] val FixtureQtab: Array[Int] = {
    val t = Array.fill(64)(16)
    t(0) = 8
    t
  }

  /** Grayscale baseline JPEG whose 8×8 block k is the CONSTANT value
    * `blockVals(k)` — only DC coefficients, exactly representable, so
    * the decoded image equals the block map bit-for-bit. */
  def encodeGrayBlocks(wBlocks: Int, hBlocks: Int, blockVals: Array[Int]): Array[Byte] = {
    require(blockVals.forall(v => v >= 0 && v <= 255), "block values are 8-bit samples")
    val blocks = blockVals.map { v =>
      val blk = new Array[Int](64)
      blk(0) = v - 128 // quantized DC under FixtureQtab: 8(v-128)/8
      blk
    }
    encodeGrayCoefficients(wBlocks, hBlocks, FixtureQtab, blocks)
  }
}

/** id → real baseline JPEG fixture: the 8×8 block k of a
  * (wBlocks·8)×(hBlocks·8) grayscale image is the constant value
  * (id·31 + k·7) mod 256 — an arithmetic rule an external oracle can
  * evaluate without a codec, while the bytes themselves are a genuine
  * Huffman-coded baseline JPEG the decoder must entropy-decode,
  * dequantize and IDCT. */
case class JpegGrayFixture(child: Expression, wBlocks: Int, hBlocks: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_gray_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_gray_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val vals = Array.tabulate(wBlocks * hBlocks) { k =>
      (((id * 31 + k.toLong * 7) % 256 + 256) % 256).toInt
    }
    JpegCodec.encodeGrayBlocks(wBlocks, hBlocks, vals)
  }

  override protected def withNewChildInternal(newChild: Expression): JpegGrayFixture =
    copy(child = newChild)
}

/** id → real COLOR (3-component 4:4:4) baseline JPEG fixture: block k
  * of the luma plane is (id·31 + k·7) mod 256, Cb is (id·17 + k·11)
  * mod 256, Cr is (id·23 + k·13) mod 256 — constant blocks, so the
  * decoded planes equal the rules exactly, and the RGB output is the
  * JFIF conversion of rule values: an external oracle reproduces it
  * with FLOOR(x + 0.5) clamped to [0, 255] (exactly Java's
  * Math.round), no codec required. Exercises the full interleaved-MCU
  * + dual-table + color-convert path under the correctness gate. */
case class JpegColorFixture(child: Expression, wBlocks: Int, hBlocks: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_color_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_color_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    def dcBlocks(mulId: Long, mulK: Long) = Array.tabulate(wBlocks * hBlocks) { k =>
      val blk = new Array[Int](64)
      blk(0) = (((id * mulId + k.toLong * mulK) % 256 + 256) % 256).toInt - 128
      blk
    }
    val qC = { val t = Array.fill(64)(24); t(0) = 8; t }
    JpegCodec.encodeColor444Coefficients(wBlocks, hBlocks, JpegCodec.FixtureQtab, qC,
      dcBlocks(31, 7), dcBlocks(17, 11), dcBlocks(23, 13))
  }

  override protected def withNewChildInternal(newChild: Expression): JpegColorFixture =
    copy(child = newChild)
}

/** id → real CHROMA-SUBSAMPLED baseline JPEG fixture (luma sampling
  * `sampH`×`sampV`: (2,2) = 4:2:0, (2,1) = 4:2:2 — the profiles
  * real-world web JPEGs overwhelmingly use). The image is wMcu×hMcu
  * MCUs: luma block k of the (wMcu·sampH)×(hMcu·sampV) grid is the
  * constant (id·31 + k·7) mod 256; chroma block j of the wMcu×hMcu grid
  * is (id·17 + j·11) mod 256 for Cb and (id·23 + j·13) mod 256 for Cr.
  * Constant blocks decode exactly, and replication upsampling keeps a
  * constant chroma block constant over its sampH×sampV luma blocks, so
  * an external oracle reproduces the full-resolution RGB arithmetically:
  * pixel (x,y) has Y = rule(block (y/8, x/8)) and Cb/Cr = rule(block
  * (y/(8·sampV), x/(8·sampH))), converted with FLOOR(v+0.5) clamped —
  * exactly Java's Math.round. Exercises multi-block-per-MCU interleave,
  * per-component predictors, and the upsampling path under the
  * correctness gate. */
case class JpegSubsampleFixture(child: Expression, wMcu: Int, hMcu: Int,
    sampH: Int, sampV: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_subsample_fixture"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_subsample_fixture requires bigint id, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    def dc(rule: Int => Long, n: Int) = Array.tabulate(n) { k =>
      val blk = new Array[Int](64)
      blk(0) = ((rule(k) % 256 + 256) % 256).toInt - 128
      blk
    }
    val qC = { val t = Array.fill(64)(24); t(0) = 8; t }
    JpegCodec.encodeSubsampledCoefficients(wMcu, hMcu, JpegCodec.FixtureQtab, qC,
      sampH, sampV,
      dc(k => id * 31 + k.toLong * 7, wMcu * sampH * hMcu * sampV),
      dc(k => id * 17 + k.toLong * 11, wMcu * hMcu),
      dc(k => id * 23 + k.toLong * 13, wMcu * hMcu))
  }

  override protected def withNewChildInternal(newChild: Expression): JpegSubsampleFixture =
    copy(child = newChild)
}

/** Color JPEG blob → array(width, height, n_samples, r_sum, g_sum,
  * b_sum) computed from the DECODED interleaved RGB samples. NULL for
  * non-JPEG, grayscale, unsupported-profile or corrupt input. */
case class JpegRgbStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_rgb_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_rgb_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegCodec.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, 3, px)) =>
        var r = 0L; var g = 0L; var bb = 0L
        var i = 0
        while (i < px.length) {
          r += px(i) & 0xff; g += px(i + 1) & 0xff; bb += px(i + 2) & 0xff
          i += 3
        }
        new GenericArrayData(Array(w.toLong, h.toLong, px.length.toLong, r, g, bb))
      case _ => null
    }

  override protected def withNewChildInternal(newChild: Expression): JpegRgbStats =
    copy(child = newChild)
}

/** JPEG blob → array(width, height, n_samples, sample_sum, sample_min,
  * sample_max) computed from the DECODED samples (real Huffman +
  * dequant + IDCT — an entropy or transform bug corrupts the stats).
  * NULL for non-JPEG / unsupported-profile / corrupt input. */
case class JpegPixelStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_pixel_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegCodec.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, _, px)) =>
        var sum = 0L; var mn = 255L; var mx = 0L
        var i = 0
        while (i < px.length) {
          val v = (px(i) & 0xff).toLong
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        new GenericArrayData(Array(w.toLong, h.toLong, px.length.toLong, sum, mn, mx))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): JpegPixelStats =
    copy(child = newChild)
}
