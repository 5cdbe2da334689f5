package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

/** FLAC decoder conformance. No FLAC implementation ships in this
  * environment (no JVM codec, no libFLAC, no Python binding), so the
  * pin follows the GIF-LZW precedent: the synthesizer emits REAL
  * frames — correct CRC-8/CRC-16, genuine Rice bitstreams, spec
  * subframe layouts — and decode must invert them exactly across
  * every shape; the CRC kernels themselves are pinned to the
  * published check values for their polynomials, and corruption
  * anywhere must be caught by the frame CRCs, not produce samples.
  */
class FlacSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(j => (((seed * 13 + j.toLong * 37) % 65536) - 32768).toInt)

  test("crc kernels match the published check values") {
    val check = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(check, 0, check.length) == 0xF4) // CRC-8 poly 0x07
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8) // CRC-16/BUYPASS
  }

  test("stream info round-trips") {
    val f = Flac.synthFlac(44100, 2, noise(64, 5) ++ noise(64, 6))
    val si = Flac.streamInfo(f)
    assert(si == Flac.StreamInfo(44100, 2, 16, 64))
    assert(Flac.isFlac(f))
    assert(!Flac.isFlac("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("fixed orders 0-2 round-trip across block boundaries") {
    for (mode <- Seq("fixed0", "fixed1", "fixed2"); n <- Seq(1, 100, 300, 513)) {
      val x = Array.tabulate(n)(j => ((j * 7) % 4096) - 2048)
      val f = Flac.synthFlac(16000, 1, x, blockSize = 128, mode = mode)
      val got = Flac.samples(f)
      assert(got != null, s"$mode n=$n decoded null")
      assert(got.toSeq == x.toSeq, s"$mode n=$n mismatch")
    }
  }

  test("verbatim and constant round-trip, full 16-bit range") {
    val x = noise(300, 11)
    x(0) = -32768; x(1) = 32767
    assert(Flac.samples(Flac.synthFlac(8000, 1, x, 256, "verbatim")).toSeq == x.toSeq)
    val const = Array.fill(200)(-1234)
    assert(Flac.samples(Flac.synthFlac(8000, 1, const, 64, "fixed0")).toSeq == const.toSeq)
  }

  test("stereo: independent and left/side decorrelation round-trip") {
    val n = 257
    val inter = Array.tabulate(2 * n) { k =>
      val j = k / 2
      if (k % 2 == 0) noise(n, 21)(j) else noise(n, 22)(j)
    }
    assert(Flac.samples(Flac.synthFlac(48000, 2, inter, 128, "verbatim")).toSeq ==
      inter.toSeq)
    assert(Flac.samples(Flac.synthFlac(48000, 2, inter, 128, "leftside")).toSeq ==
      inter.toSeq)
  }

  test("right/side and mid/side decorrelations round-trip") {
    // full-range noise exercises the mid channel's floor average and
    // the parity-bit reconstruction on BOTH parities, and ±32768/32767
    // extremes through the 17-bit side subframe
    val n = 301
    val inter = Array.tabulate(2 * n) { k =>
      val j = k / 2
      if (k % 2 == 0) noise(n, 23)(j) else noise(n, 24)(j)
    }
    inter(0) = -32768; inter(1) = 32767; inter(2) = 32767; inter(3) = -32768
    for (mode <- Seq("rightside", "midside"))
      assert(Flac.samples(Flac.synthFlac(48000, 2, inter, 128, mode)).toSeq ==
        inter.toSeq, s"$mode mismatch")
  }

  test("fixed orders 3-4 with multi-partition residuals round-trip") {
    // cubic-ish ramps keep order-3/4 residuals small but NONZERO;
    // blockSize 128 at po=2 puts the warm-up inside partition 0 and
    // three more partitions after it, and n=300 forces a short last
    // frame where the writer re-picks a lower partition order
    for (mode <- Seq("fixed3", "fixed4"); n <- Seq(128, 300)) {
      val x = Array.tabulate(n)(j => ((j * j % 977) * 7 % 4096) - 2048)
      val got = Flac.samples(Flac.synthFlac(16000, 1, x, 128, mode))
      assert(got != null && got.toSeq == x.toSeq, s"$mode n=$n mismatch")
    }
  }

  test("LPC subframes round-trip, including the RICE2 parameter path") {
    // lpc2: order-2 coefs (3,-1) shift 1 on a sawtooth; lpc8: order-8
    // mixed-sign coefs on full-range noise, whose residuals push the
    // Rice parameter past 14 and onto the 5-bit RICE2 method
    val saw = Array.tabulate(300)(j => ((j * 11) % 4096) - 2048)
    assert(Flac.samples(Flac.synthFlac(16000, 1, saw, 128, "lpc2")).toSeq ==
      saw.toSeq)
    val nz = noise(300, 27)
    assert(Flac.samples(Flac.synthFlac(16000, 1, nz, 128, "lpc8")).toSeq ==
      nz.toSeq)
  }

  test("raw-bits escape partitions round-trip, including raw = 0") {
    val nz = noise(300, 29)
    assert(Flac.samples(Flac.synthFlac(16000, 1, nz, 128, "escape")).toSeq ==
      nz.toSeq)
    // a linear ramp has all-zero order-1 residuals → raw = 0 partitions
    val ramp = Array.tabulate(200)(j => j - 100)
    assert(Flac.samples(Flac.synthFlac(16000, 1, ramp, 64, "escape")).toSeq ==
      ramp.toSeq)
  }

  test("wasted bits round-trip") {
    // samples divisible by 4 → 2 wasted bits; the decoder must shift
    // the reconstructed subframe back up
    val x = Array.tabulate(260)(j => ((((j * 7) % 4096) - 2048) / 4) * 4)
    assert(Flac.samples(Flac.synthFlac(16000, 1, x, 128, "wasted2")).toSeq ==
      x.toSeq)
  }

  test("corruption degrades to null via frame CRCs, never throws") {
    val good = Flac.synthFlac(16000, 1, noise(200, 31), 128, "fixed2")
    assert(Flac.samples(good) != null)
    // flips through DECODE-RELEVANT bytes: the total-sample count in
    // STREAMINFO (mismatch check), frame header (CRC-8), residual
    // bits and frame CRC-16. (Bytes like STREAMINFO's min-blocksize
    // or md5 are not decode-relevant; real decoders pass them too.)
    for (i <- Seq(25, 44, 50, good.length / 2, good.length - 3, good.length - 1)) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x11).toByte
      assert(Flac.samples(bad) == null, s"flip at $i not caught")
    }
    for (cut <- Seq(3, 10, 41, good.length - 2))
      assert(Flac.samples(java.util.Arrays.copyOf(good, cut)) == null, s"cut=$cut")
    assert(Flac.samples(noise(100, 41).map(_.toByte)) == null)
  }
}
