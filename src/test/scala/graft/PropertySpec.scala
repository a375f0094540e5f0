package graft

import graft.model.{Bound, Threshold}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the pure (non-Spark) kernels: the
  * threshold grammar, bound parsing, and the hash utilities backing the
  * dedup operators. */
object PropertySpec extends Properties("graft") {

  private val genValidThreshold: Gen[String] = Gen.oneOf(
    Gen.choose(0, 1000000).map(_.toString),
    Gen.choose(0.0, 0.999999).map(d => f"$d%.6f"),
    Gen.choose(0, 100).map(n => s"$n%"),
    Gen.choose(0, 100).map(n => s"$n %"))

  property("threshold: accepted strings evaluate to a non-negative limit") =
    forAll(genValidThreshold, Gen.choose(0L, 10000000L)) { (raw, rows) =>
      Threshold.isValid(raw) && Threshold(raw).errorLimit(rows) >= 0L
    }

  property("threshold: limit is monotone in rowCount for fraction forms") =
    forAll(Gen.choose(0.0, 0.999), Gen.choose(0L, 100000L), Gen.choose(0L, 100000L)) {
      (frac, a, b) =>
        val t = Threshold(f"$frac%.4f")
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        t.errorLimit(lo) <= t.errorLimit(hi)
    }

  property("threshold: junk is rejected") =
    forAll(Gen.oneOf(
      Gen.alphaStr.suchThat(s => s.nonEmpty && !s.forall(_.isDigit)),
      Gen.oneOf("-1", "1e3", ".5", "%", "25%%"))) { raw =>
      !Threshold.isValid(raw)
    }

  property("bound parse: numbers→Num") =
    forAll(Gen.choose(-1e9, 1e9)) { d => Bound.parse(d.toString) == Bound.Num(d) }

  property("bound parse: backtick→Ref") =
    forAll(Gen.identifier) { id => Bound.parse("`" + id) == Bound.Ref(id) }

  property("bound parse: non-numeric strings→Str") =
    forAll(Gen.alphaStr.suchThat(s => s.nonEmpty && s.toDoubleOption.isEmpty)) { s =>
      Bound.parse(s) == Bound.Str(s)
    }

  private val genBmpString: Gen[String] = Gen.oneOf(
    Gen.alphaStr,
    Gen.listOf(Gen.choose(32, 0x2fff).map(_.toChar)).map(_.mkString))

  property("fused gram probe walks exactly the CharShingleHashes gram set") =
    forAll(genBmpString, Gen.choose(1, 15)) { (s, n) =>
      // BloomContainsGram's window walk (hash each substringSQL window)
      // must cover precisely the distinct gram-hash set the composed
      // path probes — any divergence silently changes decontamination
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val cnt = math.max(u.numChars - n, 0) + 1
      val walked = (0 until cnt)
        .map(i => graft.functions.SimHash64.hash64(u.substringSQL(i + 1, n))).toSet
      val kernel = graft.functions.CharShingleHashes(
          org.apache.spark.sql.catalyst.expressions.Literal(u,
            org.apache.spark.sql.types.StringType), n)
        .nullSafeEval(u).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSet
      walked == kernel
    }

  property("deflate_ratio: total on arbitrary strings, bounded by block overhead, deterministic") =
    forAll(genBmpString) { s =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.StringType
      import org.apache.spark.unsafe.types.UTF8String
      val u = UTF8String.fromString(s)
      val e = graft.functions.DeflateRatio(Literal(u, StringType), 6)
      val r = e.nullSafeEval(u).asInstanceOf[Double]
      // empty → exactly 1.0; otherwise positive and bounded by raw
      // DEFLATE's worst case: a constant block overhead (~12 bytes)
      // that dominates only for tiny inputs
      val rawLen = u.getBytes.length.toDouble
      val ok = if (s.isEmpty) r == 1.0
               else r > 0 && r <= (rawLen + 12) / rawLen
      ok && e.nullSafeEval(u).asInstanceOf[Double] == r
    }

  property("normalize_text: total, idempotent, and NFC-convergent on arbitrary strings") =
    forAll(genBmpString,
        Gen.oneOf("NFC", "NFD", "NFKC", "NFKD"),
        Gen.oneOf(true, false), Gen.oneOf(true, false)) { (s, form, strip, fold) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.StringType
      import org.apache.spark.unsafe.types.UTF8String
      def run(x: String) = graft.functions.NormalizeText(
          Literal(UTF8String.fromString(x), StringType), form, strip, fold)
        .nullSafeEval(UTF8String.fromString(x)).asInstanceOf[UTF8String].toString
      val once = run(s)
      once == run(once) // idempotence is the canonicalization contract
    }

  property("mix64: collision-free over random long sets") =
    forAll(Gen.listOfN(200, Gen.long)) { xs =>
      val distinct = xs.distinct
      distinct.map(graft.functions.MinHashSig.mix64).distinct.size == distinct.size
    }

  property("minhash per-seed salts are pairwise distinct") =
    forAll(Gen.choose(1, 256)) { n =>
      graft.functions.MinHashSig.seeds(n).distinct.length == n
    }

  property("simhash string hash: deterministic and collision-free on distinct tokens") =
    forAll(Gen.listOfN(100, Gen.identifier)) { xs =>
      val distinct = xs.distinct.map(org.apache.spark.unsafe.types.UTF8String.fromString)
      Prop(distinct.map(graft.functions.SimHash64.hash64).distinct.size == distinct.size)
    }

  property("jpeg decode: random and mutated streams never throw — None, not exceptions") =
    forAll(Gen.oneOf(
      // pure noise (usually fails the SOI gate — exercises the cheap path)
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      // noise behind a valid SOI so the marker walk actually runs
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(bs => Array[Byte](0xff.toByte, 0xd8.toByte) ++ bs),
      // a VALID fixture with random byte flips: deep corruption of real
      // DQT/DHT/SOF/SOS/entropy structure — the hardest crash surface
      Gen.zip(Gen.choose(0L, 255L), Gen.listOf(
          Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue))))
        .map { case (id, flips) =>
          val base = graft.functions.JpegCodec.encodeGrayBlocks(3, 2,
            Array.tabulate(6)(k => ((id * 31 + k * 7) % 256).toInt))
          flips.foreach { case (pos, v) => base(pos % base.length) = v }
          base
        },
      // a VALID 4:2:0 subsampled fixture with random byte flips: the
      // multi-block-per-MCU interleave and upsampling geometry under
      // corruption (sampling factors, MCU counts, plane indexing)
      Gen.zip(Gen.choose(0L, 255L), Gen.listOf(
          Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue))))
        .map { case (id, flips) =>
          val base = graft.functions.JpegSubsampleFixture(
            org.apache.spark.sql.catalyst.expressions.Literal(id), 2, 2, 2, 2)
            .nullSafeEval(id).asInstanceOf[Array[Byte]]
          flips.foreach { case (pos, v) => base(pos % base.length) = v }
          base
        })) { bytes =>
      // the scan contract for untrusted corpora: an executor must get
      // None for garbage, never an exception that kills the whole job
      graft.functions.JpegCodec.decode(bytes) match { case _ => Prop(true) }
    }

  property("png/wav decode: random and mutated streams never throw — None, not exceptions") =
    forAll(Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      // mutated valid PNG: real chunk/zlib/filter structure, corrupted
      Gen.zip(Gen.choose(0L, 255L), Gen.listOf(
          Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue))))
        .map { case (seed, flips) =>
          val px = Array.tabulate(16 * 8)(i => ((seed * 31 + i * 7) % 256).toByte)
          val base = graft.functions.PngCodec.encode8(16, 8, 1, px)
          flips.foreach { case (pos, v) => base(pos % base.length) = v }
          base
        },
      // mutated valid WAV: real RIFF chunk list, corrupted
      Gen.zip(Gen.choose(0L, 255L), Gen.listOf(
          Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue))))
        .map { case (id, flips) =>
          val base = graft.functions.WavPcmFixture(
            org.apache.spark.sql.catalyst.expressions.Literal(id))
            .nullSafeEval(id).asInstanceOf[Array[Byte]]
          flips.foreach { case (pos, v) => base(pos % base.length) = v }
          base
        })) { bytes =>
      graft.functions.PngCodec.decode8(bytes) match { case _ => () }
      graft.functions.WavInfo.parse(bytes) match { case _ => () }
      graft.functions.WavInfo.parsePcm(bytes) match { case _ => Prop(true) }
    }

  property("frame split / resize / frame stats: random and mutated streams never throw") =
    forAll(Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      // mutated valid multi-frame container: real chunk framing, corrupted
      Gen.zip(Gen.choose(0L, 255L), Gen.listOf(
          Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue))))
        .map { case (id, flips) =>
          val base = graft.functions.PngFramesFixture(
            org.apache.spark.sql.catalyst.expressions.Literal(id), 8, 4)
            .nullSafeEval(id).asInstanceOf[Array[Byte]]
          flips.foreach { case (pos, v) => base(pos % base.length) = v }
          base
        })) { bytes =>
      graft.functions.ImageOps.splitFrames(bytes) match { case _ => () }
      graft.functions.PngResize(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes), 4, 4, bilinear = true)
        .nullSafeEval(bytes) match { case _ => () }
      graft.functions.WavFrameStats(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes), 64)
        .nullSafeEval(bytes) match { case _ => Prop(true) }
    }

  property("winnowed anchors: native deque selection matches the per-window argmin spec") =
    forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.choose(1, 8)) { (hs, stride) =>
      // small hash range forces ties, exercising the leftmost tie-break
      val h = hs.toArray
      // reference: leftmost argmin of every stride-window, deduplicated
      // in first-occurrence order — the Column formulation's semantics
      val expect =
        if (h.isEmpty) Seq.empty[Int]
        else (0 to math.max(h.length - stride, 0)).map { s =>
          val win = h.slice(s, math.min(s + stride, h.length))
          s + win.indexOf(win.min)
        }.distinct
      val got = graft.functions.WinnowedAnchorsExpr(
          org.apache.spark.sql.catalyst.expressions.Literal(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(h),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
          stride)
        .nullSafeEval(new org.apache.spark.sql.catalyst.util.GenericArrayData(h))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.toSeq.map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      Prop(got.map(_.getInt(0)) == expect &&
        got.forall(r => r.getLong(1) == h(r.getInt(0))))
    }

  // PAV (isotonic fit): for random weighted bin tables the fit must be
  // monotone non-decreasing, preserve total weighted mass, never leave
  // [min, max] of the raw rates, and equal the O(B^3) minimax
  // brute-force max_{h<=i} min_{k>=i} avg(h..k) — the same identity the
  // eval_isotonic DuckDB oracle restates.
  property("pav: monotone, mass-preserving, equals the minimax brute force") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(1, 50), Gen.choose(0, 50)))
        .suchThat(_.nonEmpty)) { cells =>
      val w = cells.map(_._1.toDouble)
      val s = cells.zip(w).map { case ((_, pos), wi) =>
        math.min(pos, wi.toInt).toDouble } // sums <= weights (rates in [0,1])
      val fit = graft.ops.Analytics.pav(w, s)
      val rates = w.zip(s).map { case (wi, si) => si / wi }
      val minimax = rates.indices.map { i =>
        (0 to i).map { h =>
          (i until rates.length).map { k =>
            val ww = w.slice(h, k + 1).sum
            s.slice(h, k + 1).sum / ww
          }.min
        }.max
      }
      val eps = 1e-9
      Prop(
        fit.zip(fit.tail).forall { case (a, b) => a <= b + eps } &&
        math.abs(fit.zip(w).map(p => p._1 * p._2).sum - s.sum) < 1e-6 &&
        fit.forall(v => v >= rates.min - eps && v <= rates.max + eps) &&
        fit.zip(minimax).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    }
}
