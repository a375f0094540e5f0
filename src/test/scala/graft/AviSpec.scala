package graft

import graft.functions.{AviCodec, JpegCodec}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** AVI (RIFF) MJPEG container: writer/parser round trips, nested
  * rec-list framing, RIFF pad-byte handling, corruption rejection, and
  * the never-throw fuzz property. Reference: Microsoft AVI RIFF File
  * Reference (Video for Windows SDK 1992). */
class AviSpec extends SparkSuite {
  import spark.implicits._

  private def fixtureFrames(id: Long, wb: Int, hb: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val fid = id * 1000 + f
      JpegCodec.encodeGrayBlocks(wb, hb,
        Array.tabulate(wb * hb)(k => (((fid * 31 + k.toLong * 7) % 256 + 256) % 256).toInt))
    }

  test("writer/parser round trip: header fields and byte-identical frames") {
    val frames = fixtureFrames(7L, 4, 2, 5)
    val avi = AviCodec.encodeMjpeg(32, 16, 40000, frames)
    assert(AviCodec.parseInfo(avi).contains((32, 16, 5, 40000, 1)))
    val got = AviCodec.parseFrames(avi).get
    assert(got.length == 5)
    got.zip(frames).foreach { case (g, f) =>
      assert(java.util.Arrays.equals(g, f), "frame bytes must survive the container")
    }
    // and each extracted frame fully decodes as a baseline JPEG
    got.foreach(f => assert(JpegCodec.decode(f).isDefined))
  }

  test("frames nested in LIST('rec ') groups are found; odd sizes pad") {
    // hand-build a movi whose second frame sits inside a rec group and
    // whose payloads have odd lengths (exercising the RIFF pad byte)
    def chunk(id: String, p: Array[Byte]): Array[Byte] = {
      val sz = Array[Byte]((p.length & 0xff).toByte, ((p.length >> 8) & 0xff).toByte,
        ((p.length >> 16) & 0xff).toByte, ((p.length >> 24) & 0xff).toByte)
      id.getBytes("ASCII") ++ sz ++ p ++
        (if ((p.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    }
    def list(t: String, c: Array[Byte]): Array[Byte] = {
      val payload = t.getBytes("ASCII") ++ c
      chunk("LIST", payload)
    }
    val f1 = Array[Byte](1, 2, 3) // odd
    val f2 = Array[Byte](4, 5, 6, 7)
    val f3 = Array[Byte](8) // odd
    val movi = list("movi",
      chunk("00dc", f1) ++ list("rec ", chunk("00dc", f2)) ++ chunk("00db", f3))
    val body = "AVI ".getBytes("ASCII") ++ movi
    val riff = chunk("RIFF", body)
    val got = AviCodec.parseFrames(riff).get
    assert(got.map(_.toSeq).toSeq == Seq(f1.toSeq, f2.toSeq, f3.toSeq))
    // no hdrl → info is None but frames still walk
    assert(AviCodec.parseInfo(riff).isEmpty)
  }

  test("corruption is rejected as None, never thrown") {
    val avi = AviCodec.encodeMjpeg(32, 16, 40000, fixtureFrames(3L, 4, 2, 3))
    assert(AviCodec.parseInfo("RIFX".getBytes ++ avi.drop(4)).isEmpty)
    assert(AviCodec.parseInfo(avi.take(10)).isEmpty)
    assert(AviCodec.parseFrames(avi.take(40)).isEmpty)
    // a frame whose declared size overruns the buffer is a truncation
    val cut = avi.take(avi.length - 3)
    assert(AviCodec.parseFrames(cut).isEmpty)
    // fuzz: single-byte mutations anywhere must parse or reject, not throw
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val m = avi.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      AviCodec.parseInfo(m)
      AviCodec.parseFrames(m)
    }
  }

  test("expressions: fixture decodes through the full JPEG pipeline in SQL") {
    GraftFunctions.register(spark)
    val row = Seq(11L).toDF("id").selectExpr(
      "avi_info(avi_mjpeg_fixture(id, 2, 2, 3)) AS info",
      "avi_frame_split(avi_mjpeg_fixture(id, 2, 2, 3)) AS fs")
      .select(col("info"),
        expr("transform(fs, f -> jpeg_pixel_stats(f)[3])").as("sums"))
      .head()
    assert(row.getSeq[Int](0) == Seq(16, 16, 3, 40000, 1))
    val expected = (0 until 3).map { f =>
      val fid = 11L * 1000 + f
      64L * (0 until 4).map(k => ((fid * 31 + k * 7) % 256 + 256) % 256).sum
    }
    assert(row.getSeq[Long](1) == expected)
  }
}
