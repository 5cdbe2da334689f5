package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Containers, Flac, Id3, Mp3, Multimodal}

/** ID3v2 conformance: v2.3 (big-endian frame sizes) and v2.4
  * (syncsafe) round-trips across all three text encodings, byte-exact
  * strip so the codec beneath decodes, and classification of tagged
  * audio by what's UNDER the tag.
  */
class Id3Spec extends AnyFunSuite {

  private def flac(n: Int): Array[Byte] =
    Flac.synthFlac(16000, 1, Array.tabulate(n)(j =>
      ((j * 37) % 4096 - 2048)), 128, "fixed1")

  test("text frames round-trip in both versions and all encodings") {
    for (ver <- Seq(3, 4)) {
      val tagged = Id3.synthTag(ver, Seq(
        ("TIT2", "Tïtle Ünïcode", 0),
        ("TPE1", "ártist — ütf16", 1),
        ("TALB", "日本語アルバム", 3)), flac(100))
      val fr = Id3.textFrames(tagged).toMap
      assert(fr("TIT2") == "Tïtle Ünïcode", s"v2.$ver iso")
      assert(fr("TPE1") == "ártist — ütf16", s"v2.$ver utf16")
      assert(fr("TALB") == "日本語アルバム", s"v2.$ver utf8")
    }
  }

  test("strip is byte-exact: the codec beneath decodes") {
    val plain = flac(150)
    val tagged = Id3.synthTag(4, Seq(("TIT2", "x", 3)), plain)
    assert(Id3.strip(tagged).toSeq == plain.toSeq)
    assert(Flac.samples(Id3.strip(tagged)) != null)
    // identity for untagged input
    assert(Id3.strip(plain) eq plain)
    // damaged tag (declared size past input) degrades to null
    val short = java.util.Arrays.copyOf(tagged, 12)
    assert(Id3.strip(short) == null)
    assert(Id3.textFrames(short).isEmpty)
  }

  test("classification names what's under the tag") {
    val tagged = Id3.synthTag(3, Seq(("TIT2", "t", 0)), flac(100))
    val h = Containers.parse(tagged)
    assert(h.format == "flac" && h.sampleRate == 16000)
    assert(Multimodal.mediaDecodeClass(tagged) == ("flac", "ok"))
    // a corrupted codec under a sound tag is corrupt, not ok
    val bad = tagged.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x33).toByte
    assert(Multimodal.mediaDecodeClass(bad) == ("flac", "corrupt"))
    // an MP3 stream under a real tag names mp3 and WALKS its frames
    val mp3body = Mp3.synthMp3(1, 3, 0, mono = false, 3, _ => 9, _ % 2,
      withXing = false, (f, j) => ((f * 31 + j * 13) % 256).toByte)
    val mp3ish = Id3.synthTag(3, Seq(("TIT2", "t", 0)), mp3body)
    assert(Containers.parse(mp3ish).format == "mp3")
    assert(Multimodal.mediaDecodeClass(mp3ish) == ("mp3", "ok"))
    // truncated mid-frame under the tag: corrupt, not a profile gap
    assert(Multimodal.mediaDecodeClass(
      mp3ish.take(mp3ish.length - 7)) == ("mp3", "corrupt"))
  }
  test("unsynchronised tags de-stuff at each version's scope") {
    // 'ÿ' is 0xFF in ISO-8859-1 and FF 00 in UTF-16LE — both shapes
    // force stuffing, including the genuine-FF-00-in-payload case
    val frames = Seq(("TIT2", "ÿesÿ", 0), ("TPE1", "aÿb", 1))
    for (ver <- Seq(3, 4)) {
      val tagged = Id3.synthTag(ver, frames, flac(90), unsync = true)
      assert((tagged(5) & 0x80) != 0, s"v2.$ver unsync flag set")
      val fr = Id3.textFrames(tagged).toMap
      assert(fr("TIT2") == "ÿesÿ", s"v2.$ver iso-8859-1 text survives unsync")
      assert(fr("TPE1") == "aÿb", s"v2.$ver utf-16 text survives unsync")
      // strip stays byte-exact (sizes count post-unsync bytes)
      assert(Id3.strip(tagged).toSeq == flac(90).toSeq, s"v2.$ver strip")
      assert(Multimodal.mediaDecodeClass(tagged) == ("flac", "ok"))
    }
    // un-stuffed tags keep parsing exactly as before
    val plainTag = Id3.synthTag(4, frames, flac(90))
    assert(Id3.textFrames(plainTag).toMap.apply("TIT2") == "ÿesÿ")
  }

}
