package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Vp8, Webp}

/** VP8 keyframe decoder conformance. No VP8 implementation ships in
  * this environment, so the algorithm is pinned by synthesizer
  * round-trips (the §8 reference boolean encoder against the §7
  * decoder, DC-residual frames against the closed-form replay) and
  * the independent SQL oracle; the default-table transcription caveat
  * is documented in [[Vp8]].
  */
class Vp8Spec extends AnyFunSuite {

  test("dc-residual frames round-trip the closed-form replay across quantizers") {
    for (qIdx <- Seq(0, 12, 25, 40, 63, 90, 127); seed <- Seq(1L, 7L)) {
      def yl(mx: Int, my: Int): Int = (((seed * 3 + mx * 5 + my * 11) % 25) - 12).toInt
      def ul(mx: Int, my: Int): Int = (((seed * 7 + mx * 3 + my * 9) % 13) - 6).toInt
      def vl(mx: Int, my: Int): Int = (((seed * 11 + mx * 9 + my * 5) % 13) - 6).toInt
      val frame = Vp8.synthVp8Frame(32, 32, qIdx, yl, ul, vl)
      val webp = Webp.synthVp8Lossy(frame)
      val got = Webp.yuv(webp)
      assert(got != null, s"q=$qIdx seed=$seed decode failed")
      assert(got.width == 32 && got.height == 32)
      val expY = Vp8.synthExpected(2, 2, qIdx, yl, chroma = false)
      val expU = Vp8.synthExpected(2, 2, qIdx, ul, chroma = true)
      val expV = Vp8.synthExpected(2, 2, qIdx, vl, chroma = true)
      // every pixel of MB (mx,my) must equal the closed-form value
      for (py <- 0 until 32; px <- 0 until 32) {
        val want = expY((py / 16) * 2 + (px / 16))
        assert((got.y(py * 32 + px) & 0xFF) == want,
          s"q=$qIdx seed=$seed y($px,$py)")
      }
      for (py <- 0 until 16; px <- 0 until 16) {
        val m = (py / 8) * 2 + (px / 8)
        assert((got.u(py * 16 + px) & 0xFF) == expU(m), s"u($px,$py)")
        assert((got.v(py * 16 + px) & 0xFF) == expV(m), s"v($px,$py)")
      }
    }
  }

  test("large grids, token categories, and crop dimensions") {
    // 6x4 MBs: the DC prediction recurrence runs a real wavefront;
    // levels span direct tokens and categories 1-3
    def yl(mx: Int, my: Int): Int = ((mx * 7 + my * 13) % 37) - 18
    def ul(mx: Int, my: Int): Int = ((mx * 5 + my * 3) % 9) - 4
    val frame = Vp8.synthVp8Frame(96, 64, 30, yl, ul, (x, y) => -ul(x, y))
    val got = Webp.yuv(Webp.synthVp8Lossy(frame))
    assert(got != null && got.width == 96 && got.height == 64)
    val exp = Vp8.synthExpected(6, 4, 30, yl, chroma = false)
    for (py <- 0 until 64; px <- 0 until 96)
      assert((got.y(py * 96 + px) & 0xFF) == exp((py / 16) * 6 + px / 16),
        s"y($px,$py)")
    // non-multiple-of-16 dims crop correctly
    val odd = Vp8.synthVp8Frame(20, 12, 10, (_, _) => 3, (_, _) => 1, (_, _) => -1)
    val oddGot = Webp.yuv(Webp.synthVp8Lossy(odd))
    assert(oddGot != null && oddGot.width == 20 && oddGot.height == 12)
    assert(oddGot.y.length == 20 * 12 && oddGot.u.length == 10 * 6)
  }

  test("classification: lossy VP8 decodes, animation stays the named gap") {
    val frame = Vp8.synthVp8Frame(32, 32, 20, (_, _) => 2, (_, _) => 0, (_, _) => 0)
    val webp = Webp.synthVp8Lossy(frame)
    assert(Webp.probe(webp)._1 == "vp8")
    assert(Multimodal.mediaDecodeClass(webp) == ("webp", "ok"))
    // a FAILING still VP8 decode stays the named gap: with the
    // default tables unpinned offline, failure cannot be attributed
    // to damage vs default-probability reliance (see Vp8 scaladoc)
    val bad = webp.clone()
    bad(bad.length - 4) = (bad(bad.length - 4) ^ 0x55).toByte
    val r = Multimodal.mediaDecodeClass(bad)
    assert(r._1 == "webp" &&
      (r._2 == "unsupported_profile" || r._2 == "ok"))
    val cut = webp.take(webp.length / 2)
    assert(Webp.yuv(cut) == null)
    // animation: the remaining named profile gap
    val anim = Webp.synthVp8xAnimStub(64, 48)
    assert(Webp.probe(anim) == ("vp8x-anim", 64, 48))
    assert(Multimodal.mediaDecodeClass(anim) == ("webp", "unsupported_profile"))
  }

  test("degrades, never throws: truncation, garbage, interframes") {
    val frame = Vp8.synthVp8Frame(32, 32, 20, (_, _) => 5, (_, _) => 2, (_, _) => 1)
    for (cut <- Seq(1, 3, 9, 11, frame.length / 2))
      assert(Vp8.decodeFrame(frame.take(cut), 0, cut) == null, s"cut=$cut")
    // interframe flag → not a still image
    val inter = frame.clone()
    inter(0) = (inter(0) | 1).toByte
    assert(Vp8.decodeFrame(inter, 0, inter.length) == null)
    // bad start code
    val badSc = frame.clone()
    badSc(4) = 0x77
    assert(Vp8.decodeFrame(badSc, 0, badSc.length) == null)
    // random bodies after a valid header shape never throw
    val r = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val body = new Array[Byte](40 + r.nextInt(200))
      r.nextBytes(body)
      Vp8.decodeFrame(frame.take(10) ++ body, 0, 10 + body.length)
    }
  }
}
