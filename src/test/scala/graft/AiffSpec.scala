package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aiff, Containers}

/** AIFF / AIFF-C conformance, pinned BOTH directions against
  * javax.sound (the JDK ships a real AIFF codec): AudioSystem-written
  * files decode through this walk, and [[Aiff.synthAiff]] output
  * reads back through AudioSystem — including the 80-bit extended
  * sample-rate floats both sides must agree on.
  */
class AiffSpec extends AnyFunSuite {

  private def snd(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(j => ((seed * 131 + j * 277) % 65536 - 32768).toShort)

  private def javaxWrite(rate: Float, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, channels, 2 * channels, rate, true) // big-endian
    val raw = new Array[Byte](samples.length * 2)
    for (j <- samples.indices) {
      raw(2 * j) = ((samples(j) >> 8) & 0xFF).toByte
      raw(2 * j + 1) = (samples(j) & 0xFF).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt,
      samples.length.toLong / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    bos.toByteArray
  }

  private def javaxRead(b: Array[Byte]): (Float, Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    val fmt = ais.getFormat
    val raw = ais.readAllBytes()
    ais.close()
    assert(fmt.getSampleSizeInBits == 16 && fmt.isBigEndian)
    val out = new Array[Short](raw.length / 2)
    for (j <- out.indices)
      out(j) = (((raw(2 * j) & 0xFF) << 8) | (raw(2 * j + 1) & 0xFF)).toShort
    (fmt.getSampleRate, fmt.getChannels, out)
  }

  test("javax.sound-written AIFF decodes through the walk") {
    for ((rate, ch, n) <- Seq((8000, 1, 500), (44100, 2, 1200),
        (22050, 1, 1)): Seq[(Int, Int, Int)]) {
      val data = snd(n * ch, rate % 97)
      val b = javaxWrite(rate.toFloat, ch, data)
      assert(Aiff.isAiff(b))
      val got = Aiff.samples(b)
      assert(got != null && got.toSeq == data.toSeq, s"$rate/$ch")
      val h = Aiff.header(b)
      assert(h != null && h._1 == rate && h._2 == ch && h._3 == 16)
      assert(Containers.parse(b).format == "aiff")
    }
  }

  test("synthAiff reads back through javax.sound") {
    for ((rate, ch) <- Seq((16000, 1), (48000, 2))) {
      val data = snd(900 * ch, rate % 89)
      val b = Aiff.synthAiff(rate, ch, data)
      val (gr, gc, got) = javaxRead(b)
      assert(gr == rate.toFloat && gc == ch)
      assert(got.toSeq == data.toSeq, s"$rate/$ch")
      // and through our own walk
      assert(Aiff.samples(b).toSeq == data.toSeq)
    }
  }

  test("AIFF-C: sowt byte order and G.711 companding") {
    val data = snd(800, 7)
    val sowt = Aiff.synthAiff(22050, 1, data, "sowt")
    assert(Aiff.samples(sowt).toSeq == data.toSeq)
    for (comp <- Seq("ulaw", "alaw")) {
      val b = Aiff.synthAiff(8000, 1, data, comp)
      val got = Aiff.samples(b)
      assert(got != null && got.length == data.length, comp)
      // companding is lossy: each decoded level is the NEAREST
      // codeword of the exact ITU expansion (shared with the WAV
      // G.711 path), so error is bounded by the largest segment step
      for (j <- data.indices)
        assert(math.abs(got(j) - data(j)) <= 1024, s"$comp@$j")
      // re-encoding the decoded levels is the identity
      assert(Aiff.samples(Aiff.synthAiff(8000, 1, got, comp)).toSeq ==
        got.toSeq, comp)
    }
  }

  test("profile gaps and damage split correctly") {
    val data = snd(200, 9)
    val b = Aiff.synthAiff(8000, 1, data, "sowt")
    // rewrite the compression type to fl32: sound file, named gap
    val idx = b.indexOfSlice("sowt".getBytes("US-ASCII"))
    assert(idx > 0)
    val fl = b.clone()
    "fl32".getBytes("US-ASCII").copyToArray(fl, idx)
    assert(Aiff.samples(fl) == null)
    assert(Aiff.unsupportedProfile(fl))
    assert(!Aiff.unsupportedProfile(b))
    // truncations and chunk damage degrade to null
    for (cut <- Seq(4, 11, 30, b.length / 2))
      assert(Aiff.samples(java.util.Arrays.copyOf(b, cut)) == null, s"$cut")
    val bad = b.clone()
    val commIdx = b.indexOfSlice("COMM".getBytes("US-ASCII"))
    bad(commIdx) = 'X'.toByte // COMM id damaged -> unknown chunk, no COMM
    assert(Aiff.samples(bad) == null)
    // an infinite 80-bit rate is damage, not a crash
    val badRate = Aiff.synthAiff(8000, 1, data)
    val commAt = badRate.indexOfSlice("COMM".getBytes("US-ASCII"))
    badRate(commAt + 16) = 0x7F.toByte
    badRate(commAt + 17) = 0xFF.toByte
    assert(Aiff.samples(badRate) == null)
  }
}
