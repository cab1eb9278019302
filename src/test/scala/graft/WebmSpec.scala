package graft

import graft.operators.{Multimodal, Webm}
import org.scalatest.funsuite.AnyFunSuite

/** Matroska/WebM EBML walker: round-trips against the independently written
  * [[Webm.encode]] fixture writer, all three lacing modes, unknown-size
  * segments, and hostile payloads. */
class WebmSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 97) & 0xffffff)
    val o = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", o)
    o.toByteArray
  }

  private val vTrack = Webm.TrackSpec(1, 1, "V_MJPEG", width = 64, height = 48)
  private val aTrack = Webm.TrackSpec(2, 2, "A_PCM/INT/LIT",
    sampleRate = 16000.0, channels = 2)

  test("meta: tracks, dimensions, audio params, duration, block count") {
    val frames = (0 until 3).map(jpeg(64, 48, _))
    val bytes = Webm.encode(Seq(vTrack, aTrack),
      Seq((1L, frames, 0), (2L, Seq(Array[Byte](1, 2, 3, 4)), 0)),
      durationSec = 2.5)
    val m = Webm.meta(bytes).get
    assert(m.docType == "webm")
    assert(m.timescaleNs == 1000000L)
    assert(math.abs(m.durationSec - 2.5) < 1e-9)
    assert(m.nBlocks == 4)
    val v = m.tracks.find(_.number == 1).get
    assert(v.trackType == 1 && v.codecId == "V_MJPEG" &&
      v.width == 64 && v.height == 48)
    val a = m.tracks.find(_.number == 2).get
    assert(a.trackType == 2 && a.codecId == "A_PCM/INT/LIT" &&
      a.sampleRate == 16000.0 && a.channels == 2)
  }

  test("trackFrames: no lacing — one SimpleBlock per frame, payloads exact") {
    val frames = (0 until 4).map(i => Array.tabulate[Byte](10 + i * 3)(j => (i * 50 + j).toByte))
    val bytes = Webm.encode(Seq(vTrack), Seq((1L, frames, 0)), 1.0)
    val got = Webm.trackFrames(bytes, 1).get
    assert(got.size == 4)
    frames.zip(got).foreach { case (w, g) => assert(w.sameElements(g)) }
  }

  test("trackFrames: Xiph lacing round-trips, including a 255-boundary size") {
    // 255 and 510 force multi-byte Xiph size runs (255+0, 255+255+0)
    val frames = Seq(100, 255, 510, 7).map(n => Array.tabulate[Byte](n)(j => (j * 13).toByte))
    val bytes = Webm.encode(Seq(vTrack), Seq((1L, frames, 1)), 1.0)
    val got = Webm.trackFrames(bytes, 1).get
    assert(got.size == 4)
    frames.zip(got).foreach { case (w, g) => assert(w.sameElements(g)) }
  }

  test("trackFrames: fixed lacing round-trips") {
    val frames = (0 until 5).map(i => Array.tabulate[Byte](96)(j => (i + j).toByte))
    val bytes = Webm.encode(Seq(vTrack), Seq((1L, frames, 2)), 1.0)
    val got = Webm.trackFrames(bytes, 1).get
    assert(got.size == 5)
    frames.zip(got).foreach { case (w, g) => assert(w.sameElements(g)) }
  }

  test("trackFrames: EBML lacing round-trips (growing and shrinking deltas)") {
    val frames = Seq(300, 120, 121, 5000, 4).map(n =>
      Array.tabulate[Byte](n)(j => (j * 7 + n).toByte))
    val bytes = Webm.encode(Seq(vTrack), Seq((1L, frames, 3)), 1.0)
    val got = Webm.trackFrames(bytes, 1).get
    assert(got.size == 5)
    frames.zip(got).foreach { case (w, g) => assert(w.sameElements(g)) }
  }

  test("trackFrames: filters to the requested track across clusters") {
    val v = (0 until 2).map(i => Array[Byte](i.toByte, 1, 2))
    val a = Seq(Array[Byte](9, 9))
    val bytes = Webm.encode(Seq(vTrack, aTrack),
      Seq((1L, Seq(v(0)), 0), (2L, a, 0), (1L, Seq(v(1)), 0)), 1.0)
    assert(Webm.trackFrames(bytes, 1).get.size == 2)
    assert(Webm.trackFrames(bytes, 2).get.size == 1)
    assert(Webm.trackFrames(bytes, 3).isEmpty) // no such track: no frames
  }

  test("unknown-size segment (streamed-muxer form) parses identically") {
    val frames = (0 until 3).map(jpeg(32, 32, _))
    val sized = Webm.encode(Seq(vTrack), Seq((1L, frames, 1)), 1.0)
    val streamed = Webm.encode(Seq(vTrack), Seq((1L, frames, 1)), 1.0,
      unknownSizeSegment = true)
    assert(Webm.meta(streamed).get == Webm.meta(sized).get)
    assert(Webm.trackFrames(streamed, 1).get.map(_.toSeq) ==
      Webm.trackFrames(sized, 1).get.map(_.toSeq))
  }

  test("matroska doctype accepted; foreign doctype rejected") {
    val f = Seq(Array[Byte](1))
    val mkv = Webm.encode(Seq(vTrack), Seq((1L, f, 0)), 1.0, docType = "matroska")
    assert(Webm.meta(mkv).get.docType == "matroska")
    val alien = Webm.encode(Seq(vTrack), Seq((1L, f, 0)), 1.0, docType = "zzz")
    assert(Webm.meta(alien).isEmpty)
  }

  test("jpegFrames: every block is a decodable JPEG; non-MJPEG codec → None") {
    val frames = (0 until 3).map(jpeg(48, 36, _))
    val bytes = Webm.encode(Seq(vTrack), Seq((1L, frames, 0)), 1.0)
    val got = Webm.jpegFrames(bytes).get
    assert(got.size == 3)
    got.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 48 && img.getHeight == 36)
    }
    // a VP8-coded track is metadata-only: no JPEG frames
    val vp8 = Webm.encode(Seq(vTrack.copy(codecId = "V_VP8")),
      Seq((1L, Seq(Array[Byte](0x10, 0x20)), 0)), 1.0)
    assert(Webm.jpegFrames(vp8).isEmpty)
    assert(Webm.meta(vp8).get.tracks.head.codecId == "V_VP8")
    // an MJPEG track whose block is NOT a JPEG is rejected, not half-read
    val lying = Webm.encode(Seq(vTrack), Seq((1L, Seq(Array[Byte](1, 2, 3)), 0)), 1.0)
    assert(Webm.jpegFrames(lying).isEmpty)
  }

  test("hostile payloads: truncation, lying sizes, garbage, deep nesting") {
    val frames = (0 until 2).map(jpeg(32, 32, _))
    val good = Webm.encode(Seq(vTrack), Seq((1L, frames, 0)), 1.0)
    // every truncation point returns None rather than throwing
    Seq(3, 7, 20, good.length / 2, good.length - 1).foreach { n =>
      assert(Webm.meta(good.take(n)).isEmpty, s"truncated at $n")
    }
    assert(Webm.meta(Array.fill(64)(7.toByte)).isEmpty)
    assert(Webm.meta(Array.emptyByteArray).isEmpty)
    // a lying inner size (child claims to extend past its parent)
    val lying = good.clone()
    // find the Tracks element and corrupt a size byte to 0xFE (huge vint)
    val idx = lying.indexOfSlice(Array(0x16.toByte, 0x54.toByte, 0xAE.toByte, 0x6B.toByte))
    assert(idx > 0)
    lying(idx + 4) = 0xFE.toByte
    assert(Webm.meta(lying).isEmpty)
    // pathological nesting: 64 unclosed BlockGroup headers
    val deep = Webm.encode(Seq(vTrack), Seq.empty, 1.0) ++
      Array.fill(64)(Array[Byte](0xA0.toByte, 0x82.toByte)).flatten
    Webm.meta(deep) // must terminate without stack overflow
  }

  test("non-Matroska containers are rejected by the cheap magic check") {
    assert(Webm.jpegFrames(Multimodal.encodeMinimalMp4(1.0, 64, 64)).isEmpty)
    assert(Webm.jpegFrames(jpeg(8, 8, 0)).isEmpty)
  }
}
