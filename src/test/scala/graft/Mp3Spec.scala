package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Containers, Id3, Mp3, Multimodal}

/** MPEG-audio frame-walk conformance: synthesizer round-trips across
  * every version/layer/samplerate cell, tag transparency, Xing VBR,
  * and the degrade classes (truncation, sync loss, free format). No
  * JVM MP3 frame parser exists here to pin against; the frame-size
  * algebra is pinned by the independent DuckDB oracle replay
  * (`audio_mp3_metadata`) built from the same published tables.
  */
class Mp3Spec extends AnyFunSuite {

  private def pay(f: Int, j: Int): Byte = ((f * 31 + j * 13) % 256).toByte

  test("round-trips every version x layer x samplerate cell") {
    for (v <- Seq(1, 2, 25); layer <- Seq(1, 2, 3); sri <- Seq(0, 1, 2);
         mono <- Seq(true, false)) {
      val n = 4
      val b = Mp3.synthMp3(v, layer, sri, mono, n, _ => 9, f => f % 2,
        withXing = false, pay)
      val i = Mp3.parse(b)
      assert(i != null, s"v=$v l=$layer sri=$sri")
      assert(i.version == (v match {
        case 1 => "1"; case 2 => "2"; case _ => "2.5" }))
      assert(i.layer == layer && i.channels == (if (mono) 1 else 2))
      assert(i.nFrames == n && i.totalFrameBytes == b.length)
      assert(!i.vbr && i.xingFrames == -1L)
      // layout algebra: frame sizes match the published slot formula
      val spf = if (layer == 1) 384 else if (layer == 2) 1152
        else if (v == 1) 1152 else 576
      assert(i.samplesPerFrame == spf)
      assert(i.durationMs == n.toLong * spf * 1000 / i.sampleRate)
    }
  }

  test("ID3v2 front tag and ID3v1 trailer are transparent") {
    val core = Mp3.synthMp3(1, 3, 0, mono = false, 5, _ => 9, _ % 2,
      withXing = false, pay)
    val both = Id3.synthTag(4, Seq(("TIT2", "x", 3)), core) ++
      Mp3.synthId3v1("y")
    val i = Mp3.parse(both)
    assert(i != null && i.nFrames == 5 && i.totalFrameBytes == core.length)
    assert(Mp3.parse(core) == i.copy())
  }

  test("Xing header marks VBR and yields the frame count") {
    val b = Mp3.synthMp3(2, 3, 1, mono = false, 6, _ => 5, _ => 0,
      withXing = true, pay)
    val i = Mp3.parse(b)
    assert(i != null && i.vbr && i.xingFrames == 6L)
    // bitrate variation alone also flags VBR (no Xing)
    val v = Mp3.synthMp3(1, 2, 0, mono = true, 4,
      f => if (f % 2 == 1) 8 else 5, _ => 0, withXing = false, pay)
    val iv = Mp3.parse(v)
    assert(iv != null && iv.vbr && iv.xingFrames == -1L)
    assert(iv.bitrateKbps == Mp3.V1L2(5)) // first frame's
    // an "Info" header (LAME's CBR marker) yields the frame count but
    // must NOT set vbr
    val cbr = Mp3.synthMp3(2, 3, 1, mono = false, 6, _ => 5, _ => 0,
      withXing = true, pay)
    val off = 4 + 17 // V2 stereo side info
    assert(new String(cbr, off, 4, "US-ASCII") == "Xing")
    cbr(off) = 'I'; cbr(off + 1) = 'n'; cbr(off + 2) = 'f'; cbr(off + 3) = 'o'
    val ic = Mp3.parse(cbr)
    assert(ic != null && !ic.vbr && ic.xingFrames == 6L)
  }

  test("damage degrades: truncation, sync loss, reserved fields, free format") {
    val b = Mp3.synthMp3(1, 3, 0, mono = false, 3, _ => 9, _ => 1,
      withXing = false, pay)
    assert(Mp3.parse(b.take(b.length - 1)) == null) // truncated mid-frame
    val desync = b.clone()
    desync(b.length / 2) = 0 // likely corrupts a later header or length
    // must not throw either way
    Mp3.parse(desync)
    val reserved = b.clone()
    reserved(1) = (reserved(1) & ~0x08).toByte // version bits 01 = reserved
    assert(Mp3.parse(reserved) == null)
    // a free-format LEAD over rated frames tiles at no size: the
    // recovery fails and the profile check names the residue
    val free = b.clone()
    free(2) = (free(2) & 0x0F).toByte // bitrate index 0 = free format
    assert(Mp3.parse(free) == null)
    assert(Mp3.unsupportedProfile(free))
    assert(!Mp3.unsupportedProfile(b))
  }

  test("FREE-FORMAT streams recover their unsignaled frame size") {
    for ((version, layer, srIdx, mono, nf, base) <- Seq(
        (1, 1, 0, false, 5, 4 * 30), // Layer I: 4-byte slots
        (1, 3, 1, true, 4, 181),
        (2, 2, 2, false, 3, 96),
        (25, 3, 0, true, 6, 144))) {
      val b = Mp3.synthMp3Free(version, layer, srIdx, mono, nf, base,
        f => f % 2, pay)
      val i = Mp3.parse(b)
      assert(i != null, s"v$version L$layer")
      val slot = if (layer == 1) 4 else 1
      val wantBytes = (0 until nf).map(f => base + slot * (f % 2)).sum
      assert(i.nFrames == nf && i.totalFrameBytes == wantBytes,
        s"v$version L$layer layout")
      assert(!i.vbr && i.xingFrames == -1L)
      // derived bitrate: base*sr truncated by the layer's slot factor
      val div = layer match {
        case 1 => 48000L
        case 2 => 144000L
        case _ => if (version == 1) 144000L else 72000L
      }
      assert(i.bitrateKbps == (base.toLong * i.sampleRate / div).toInt,
        s"v$version L$layer kbps")
      assert(Multimodal.mediaDecodeClass(b) == ("mp3", "ok"))
      // ID3 tags stay transparent around free-format frames
      val wrapped = graft.operators.Id3.synthTag(4,
        Seq(("TIT2", "ff", 3)), b) ++ Mp3.synthId3v1("ff")
      val wi = Mp3.parse(wrapped)
      assert(wi != null && wi.nFrames == nf, s"v$version L$layer tagged")
    }
    // a LONE free-format frame proves no size — named, not corrupt
    val lone = Mp3.synthMp3Free(1, 3, 0, mono = true, 2, 120, _ => 0, pay)
      .take(120)
    assert(Mp3.parse(lone) == null)
    assert(Mp3.unsupportedProfile(lone))
    // truncation mid-frame degrades to null
    val full = Mp3.synthMp3Free(1, 3, 0, mono = true, 4, 120, _ => 0, pay)
    assert(Mp3.parse(full.take(full.length - 7)) == null)
  }

  test("classification: a full walk names untagged mp3, weak syncs stay unknown") {
    val b = Mp3.synthMp3(25, 2, 2, mono = true, 3, _ => 4, _ % 2,
      withXing = false, pay)
    val h = Containers.parse(b)
    assert(h.format == "mp3" && h.sampleRate == 8000 && h.channels == 1)
    assert(Multimodal.mediaDecodeClass(b) == ("mp3", "ok"))
    // a lone FF Ex sync with garbage does NOT classify as mp3
    val junk = Array[Byte](0xFF.toByte, 0xFB.toByte) ++
      Array.tabulate(60)(i => (i * 7).toByte)
    assert(Containers.parse(junk).format == "unknown")
    // single-frame streams stay unclassified (too weak to probe on)
    val one = Mp3.synthMp3(1, 3, 0, mono = false, 1, _ => 9, _ => 0,
      withXing = false, pay)
    assert(Containers.parse(one).format == "unknown")
  }
}
