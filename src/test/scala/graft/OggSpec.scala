package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Containers, Flac, Ogg}

/** Ogg container + Ogg-FLAC conformance. No Ogg implementation ships
  * in this environment, so the pin follows the FLAC/LZW precedent:
  * the synthesizer paginates REAL streams (correct CRC-32s, genuine
  * lacing tables, packets continued across pages, BOS/EOS flags) and
  * the walk must invert them exactly; corruption anywhere must be
  * caught by the page CRC, never decoded into samples.
  */
class OggSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(j => (((seed * 13 + j.toLong * 37) % 65536) - 32768).toInt)

  test("page crc kernel matches the published check value") {
    // CRC-32/MPEG-2 style but with init 0 and no final xor: the
    // CRC-32/POSIX ("cksum") parameters minus the length/xorout steps.
    // Pin via the identity used by the spec: a page whose CRC field
    // holds the computed value re-validates, and any bit flip breaks
    // it (direct check-value vectors for this exact variant are not
    // published; validation is structural + cross-shape below).
    val pkt = "the quick brown fox".getBytes("US-ASCII")
    val ogg = Ogg.synthOgg(Seq(pkt))
    assert(Ogg.packets(ogg).map(_.toSeq).toSeq == Seq(pkt.toSeq))
    for (i <- 0 until ogg.length) {
      val bad = ogg.clone()
      bad(i) = (bad(i) ^ 0x04).toByte
      assert(Ogg.packets(bad) == null, s"flip at $i not caught")
    }
  }

  test("packets reassemble across segments and pages") {
    // three packets: tiny, exactly 255 bytes (needs a 0-lacing
    // terminator), and 700 bytes (continues across pages at
    // maxSegsPerPage = 2)
    val p1 = Array.tabulate(9)(i => (i * 7).toByte)
    val p2 = Array.tabulate(255)(i => (i * 11).toByte)
    val p3 = Array.tabulate(700)(i => (i * 13).toByte)
    for (maxSegs <- Seq(1, 2, 32)) {
      val ogg = Ogg.synthOgg(Seq(p1, p2, p3), maxSegsPerPage = maxSegs)
      val got = Ogg.packets(ogg)
      assert(got != null && got.length == 3, s"maxSegs=$maxSegs")
      assert(got(0).toSeq == p1.toSeq && got(1).toSeq == p2.toSeq &&
        got(2).toSeq == p3.toSeq, s"maxSegs=$maxSegs content")
    }
    // truncation anywhere degrades to null
    val ogg = Ogg.synthOgg(Seq(p1, p2, p3), maxSegsPerPage = 2)
    for (cut <- Seq(3, 26, 30, ogg.length / 2, ogg.length - 1))
      assert(Ogg.packets(java.util.Arrays.copyOf(ogg, cut)) == null, s"cut=$cut")
  }

  test("page loss is detected even when every remaining page is CRC-clean") {
    // four pages of one packet each; walk them structurally
    val pkts = (0 until 4).map(i => Array.tabulate(40)(j => (i * 31 + j).toByte))
    val ogg = Ogg.synthOgg(pkts, maxSegsPerPage = 1)
    def pageBounds: Seq[(Int, Int)] = {
      var p = 0
      val out = Seq.newBuilder[(Int, Int)]
      while (p < ogg.length) {
        val nseg = ogg(p + 26) & 0xFF
        var dataLen = 0
        for (k <- 0 until nseg) dataLen += ogg(p + 27 + k) & 0xFF
        val len = 27 + nseg + dataLen
        out += ((p, len)); p += len
      }
      out.result()
    }
    val bounds = pageBounds
    assert(bounds.length == 4 && Ogg.packets(ogg) != null)
    // cut at an EXACT page boundary: every kept page is CRC-clean,
    // but the missing end-of-stream flag must fail the walk
    val cutAtBoundary = java.util.Arrays.copyOf(ogg, bounds(3)._1)
    assert(Ogg.packets(cutAtBoundary) == null)
    // drop a MIDDLE page at a packet boundary: the sequence-number
    // gap must fail the walk (RFC 3533's page-loss detector)
    val (dropOff, dropLen) = bounds(1)
    val dropped = new Array[Byte](ogg.length - dropLen)
    System.arraycopy(ogg, 0, dropped, 0, dropOff)
    System.arraycopy(ogg, dropOff + dropLen, dropped, dropOff,
      ogg.length - dropOff - dropLen)
    assert(Ogg.packets(dropped) == null)
  }

  test("ogg-flac round-trips through pagination shapes") {
    for ((mode, maxSegs) <- Seq(("fixed2", 3), ("verbatim", 2), ("fixed0", 64))) {
      val x = noise(330, 7)
      val ogg = Ogg.synthOggFlac(16000, 1, x, 128, mode, maxSegs)
      assert(Ogg.codec(ogg) == "oggflac")
      val si = Ogg.flacStreamInfo(ogg)
      assert(si != null && si.sampleRate == 16000 && si.channels == 1)
      val got = Ogg.flacSamples(ogg)
      assert(got != null && got.toSeq == x.toSeq, s"$mode/$maxSegs mismatch")
    }
    // stereo left/side through the container
    val n = 240
    val inter = Array.tabulate(2 * n) { k =>
      if (k % 2 == 0) noise(n, 3)(k / 2) else noise(n, 4)(k / 2)
    }
    assert(Ogg.flacSamples(Ogg.synthOggFlac(48000, 2, inter, 128,
      "leftside")).toSeq == inter.toSeq)
  }

  test("container probe names ogg codecs; classifier separates gaps") {
    val flac = Ogg.synthOggFlac(16000, 1, noise(200, 9), 128, "fixed2")
    val h = Containers.parse(flac)
    assert(h.format == "oggflac" && h.sampleRate == 16000 && h.channels == 1)
    val vorbis = Ogg.synthVorbisStub(44100, 2)
    assert(Containers.parse(vorbis).format == "ogg_vorbis")
    assert(Ogg.codec(vorbis) == "ogg_vorbis")
    // unrecognized first-packet magic stays a sound-but-unknown "ogg"
    val other = Ogg.synthOgg(Seq("mystery codec".getBytes("US-ASCII")))
    assert(Ogg.codec(other) == "ogg")
    // vorbis identification header fields survive synthesis (sanity
    // that the stub is spec-shaped, not arbitrary bytes)
    val vp = Ogg.packets(vorbis)(0)
    assert(vp(0) == 1 && new String(vp, 1, 6, "US-ASCII") == "vorbis")
  }

  test("flac frame damage inside a sound container degrades to null") {
    val ogg = Ogg.synthOggFlac(16000, 1, noise(300, 17), 128, "fixed2")
    // repair the page CRC after damaging an audio byte: the container
    // then validates, so the FLAC frame CRC must be the net that
    // catches it. Damage the LAST page's final bytes (audio frames).
    // Walk pages STRUCTURALLY (header + lacing sums), not by scanning
    // for "OggS", which packet data could coincidentally contain.
    var lastPage = -1
    var p = 0
    while (p < ogg.length) {
      lastPage = p
      val nseg = ogg(p + 26) & 0xFF
      var dataLen = 0
      for (k <- 0 until nseg) dataLen += ogg(p + 27 + k) & 0xFF
      p += 27 + nseg + dataLen
    }
    val bad = ogg.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x21).toByte
    // recompute that page's CRC so the container walk passes
    val pageLen = bad.length - lastPage
    val crc = Ogg.pageCrc(bad, lastPage, pageLen, lastPage + 22)
    bad(lastPage + 22) = (crc & 0xFF).toByte
    bad(lastPage + 23) = ((crc >> 8) & 0xFF).toByte
    bad(lastPage + 24) = ((crc >> 16) & 0xFF).toByte
    bad(lastPage + 25) = ((crc >> 24) & 0xFF).toByte
    assert(Ogg.packets(bad) != null) // container IS sound now
    assert(Ogg.flacSamples(bad) == null) // frame CRC catches the damage
  }
  test("opus packet metadata: TOC algebra, granule clock, header fields") {
    val pks = Seq((1, 1), (9, 2), (16, 3), (31, 1), (14, 2))
    val b = Ogg.synthOpus(2, 312, 48000, pks)
    val a = Ogg.audioMeta(b)
    assert(a != null && a.codec == "opus")
    assert(a.channels == 2 && a.preSkip == 312 && a.inputRate == 48000)
    assert(a.nAudioPackets == 5)
    val toc = pks.map { case (c, n) => n * Ogg.opusConfigSamples(c) }.sum
    assert(a.tocSamples == toc)
    assert(a.granuleEnd == 312L + toc)
    assert(a.durationMs == toc.toLong * 1000 / 48000)
    // TOC table spot checks against RFC 6716 §3.1
    assert(Ogg.opusConfigSamples(0) == 480) // SILK NB 10 ms
    assert(Ogg.opusConfigSamples(3) == 2880) // SILK NB 60 ms
    assert(Ogg.opusConfigSamples(14) == 480) // hybrid FB 10 ms
    assert(Ogg.opusConfigSamples(16) == 120) // CELT NB 2.5 ms
    assert(Ogg.opusConfigSamples(31) == 960) // CELT FB 20 ms
    // over-the-cap packets are malformed (121+ ms)
    assert(Ogg.opusPacketSamples(Array(((3 << 3) | 3).toByte, 3.toByte)) == -1)
    // code-3 without its count byte is malformed
    assert(Ogg.opusPacketSamples(Array(((1 << 3) | 3).toByte)) == -1)
  }

  test("vorbis packet metadata: identification header + granule duration") {
    val b = Ogg.synthVorbis(22050, 1, 6, 44100L)
    val a = Ogg.audioMeta(b)
    assert(a != null && a.codec == "vorbis")
    assert(a.channels == 1 && a.inputRate == 22050 && a.preSkip == 0)
    assert(a.nAudioPackets == 6 && a.tocSamples == -1L)
    assert(a.granuleEnd == 44100L && a.durationMs == 2000L)
    // classification still names the profile gap (payload undecoded)
    assert(Ogg.codec(b) == "ogg_vorbis")
    // the two-header stub (no setup) degrades to null, not garbage
    assert(Ogg.audioMeta(Ogg.synthVorbisStub(44100, 2)) == null)
  }

  test("audio metadata degrades on damage, never throws") {
    val b = Ogg.synthOpus(1, 0, 16000, Seq((1, 1), (9, 3)))
    assert(Ogg.audioMeta(b) != null)
    // CRC damage, truncation, and a flipped TOC byte region
    val bad = b.clone(); bad(b.length / 2) = (bad(b.length / 2) ^ 0x7).toByte
    assert(Ogg.audioMeta(bad) == null)
    assert(Ogg.audioMeta(b.take(b.length - 3)) == null)
    assert(Ogg.audioMeta(Array[Byte]('O', 'g', 'g', 'S')) == null)
    // an Ogg-FLAC stream is not an opus/vorbis metadata subject
    val flac = Ogg.synthOggFlac(16000, 1, Array.tabulate(64)(i => i * 3 - 90))
    assert(Ogg.audioMeta(flac) == null)
    assert(Ogg.flacSamples(flac) != null) // its own path still decodes
  }

}
