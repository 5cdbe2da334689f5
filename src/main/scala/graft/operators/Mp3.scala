package graft.operators

/** MPEG audio (MP3) frame-header walk — the audit layer for the
  * dominant music/podcast corpus format. After [[Id3]] strips the
  * tag, the classifier names `mp3` but (until this file) read
  * nothing. This walks every frame header per the MPEG-1/2/2.5 audio
  * framing (ISO/IEC 11172-3 §2.4.1.3 and the 13818-3 / unofficial
  * 2.5 extensions): version/layer/bitrate/samplerate tables, padding
  * slots, CRC presence, the Xing/Info VBR header, ID3v1 trailers —
  * yielding frame counts, byte layout, duration and bitrate audit
  * columns. Full MDCT/polyphase sample synthesis stays a NAMED gap
  * (that's a psychoacoustic codec, not container work); the metadata
  * here is what corpus curation actually filters on. (Reference
  * scope: the ETL core `etl.go:12-68` has no media surface —
  * extension frontier.)
  *
  * Decode posture matches every decoder here: degrade-don't-throw,
  * per-blob scalar routines called from `mapPartitions`, no driver
  * state. Conformance is pinned by synthesizer round-trips across
  * all versions/layers plus the layout-algebra oracle
  * (`audio_mp3_metadata`).
  */
object Mp3 {

  /** Frame-walk result; `vbr` = bitrate varied across frames or a
    * Xing header was present; `xingFrames` = the Xing frame count
    * (-1 when absent).
    */
  final case class Mp3Info(version: String, layer: Int, channels: Int,
      sampleRate: Int, nFrames: Long, totalFrameBytes: Long,
      samplesPerFrame: Int, bitrateKbps: Int, vbr: Boolean, xingFrames: Long) {
    /** Truncating milliseconds, replayable as integer algebra. */
    def durationMs: Long = nFrames * samplesPerFrame * 1000L / sampleRate
  }

  // Bitrate tables in kbps, indexed by the 4-bit field (0 = free
  // format, 15 = invalid). MPEG-2 and 2.5 share tables.
  val V1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  val V1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  val V1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  val V2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  val V2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** The bitrate table for (version-class, layer): `v1` = MPEG-1,
    * else MPEG-2/2.5. Shared by the walk, the synthesizer, and the
    * oracle-SQL builder so the numbers can never diverge.
    */
  private[operators] def bitrateTable(v1: Boolean, layer: Int): Array[Int] =
    (v1, layer) match {
      case (true, 1) => V1L1
      case (true, 2) => V1L2
      case (true, _) => V1L3
      case (false, 1) => V2L1
      case (false, _) => V2L23
    }

  /** One parsed 4-byte frame header. */
  private final case class Header(verBits: Int, layer: Int, crc: Boolean,
      bitrateKbps: Int, bitrateIdx: Int, sampleRate: Int, srIdx: Int,
      padding: Int, channels: Int) {
    def versionString: String = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    def samplesPerFrame: Int = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (verBits == 3) 1152 else 576
    }
    /** Whole-frame length in bytes (header + CRC + payload). */
    def frameLen: Int = {
      val br = bitrateKbps * 1000
      layer match {
        case 1 => (12 * br / sampleRate + padding) * 4
        case 2 => 144 * br / sampleRate + padding
        case _ =>
          if (verBits == 3) 144 * br / sampleRate + padding
          else 72 * br / sampleRate + padding
      }
    }
  }

  /** Parse the header at `off`; null when it isn't a valid frame
    * header. Bitrate index 0 (FREE FORMAT) parses with
    * `bitrateKbps = 0` — its frame size is unsignaled, recovered by
    * [[parse]]'s free-format walk.
    */
  private def header(b: Array[Byte], off: Int): Header = {
    if (off + 4 > b.length) return null
    if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xE0) != 0xE0) return null
    val verBits = (b(off + 1) >> 3) & 3
    if (verBits == 1) return null // reserved
    val layerBits = (b(off + 1) >> 1) & 3
    if (layerBits == 0) return null // reserved
    val layer = 4 - layerBits
    val crc = (b(off + 1) & 1) == 0
    val bitrateIdx = (b(off + 2) >> 4) & 15
    if (bitrateIdx == 15) return null // invalid
    val srIdx = (b(off + 2) >> 2) & 3
    if (srIdx == 3) return null
    val sr = (verBits match {
      case 3 => SrV1; case 2 => SrV2; case _ => SrV25
    })(srIdx)
    val br = bitrateTable(verBits == 3, layer)(bitrateIdx)
    val padding = (b(off + 2) >> 1) & 1
    val channels = if (((b(off + 3) >> 6) & 3) == 3) 1 else 2
    Header(verBits, layer, crc, br, bitrateIdx, sr, srIdx, padding, channels)
  }

  /** True when a valid FREE-FORMAT header leads (bitrate index 0).
    * Free-format streams DECODE now (the walk recovers the unsignaled
    * frame size and verifies the stream tiles at it) — the classifier
    * consults this only after [[parse]] failed, so it names the
    * residual shapes the recovery genuinely can't measure: a lone
    * frame with no second sync, or a free-format lead over bytes that
    * tile at no size.
    */
  def unsupportedProfile(b0: Array[Byte]): Boolean = {
    val b = Id3.strip(b0)
    b != null && b.length >= 4 &&
      (b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0 &&
      ((b(1) >> 3) & 3) != 1 && ((b(1) >> 1) & 3) != 0 &&
      ((b(2) >> 4) & 15) == 0 && ((b(2) >> 2) & 3) != 3
  }

  /** Walk every frame: a leading ID3v2 tag and a trailing 128-byte
    * ID3v1 `TAG` block are transparent; version/layer/samplerate/
    * channel mode must stay constant across frames (one stream);
    * bitrate may vary (VBR). FREE-FORMAT streams (bitrate index 0)
    * walk too: the unsignaled frame size is recovered by scanning for
    * the next matching sync and verifying the whole stream tiles at
    * that size. Null on truncation, sync loss, or reserved fields —
    * degrade, don't throw.
    */
  def parse(b0: Array[Byte]): Mp3Info = {
    val b = Id3.strip(b0)
    if (b == null || b.length < 4) return null
    val first = header(b, 0)
    if (first == null) return null
    if (first.bitrateIdx == 0) return parseFree(b, first)

    /** Walk frames to exactly `end`; (frames, bytes, vbr) or null. */
    def walkTo(end: Int): (Long, Long, Boolean) = {
      var p = 0
      var n = 0L
      var bytes = 0L
      var vbr = false
      while (p < end) {
        val h = header(b, p)
        if (h == null) return null
        if (h.verBits != first.verBits || h.layer != first.layer ||
            h.srIdx != first.srIdx || h.channels != first.channels ||
            h.bitrateIdx == 0) // free frames can't mix into a rated stream
          return null
        if (h.bitrateIdx != first.bitrateIdx) vbr = true
        val len = h.frameLen
        if (len < 4 || p + len > end) return null // truncated mid-frame
        p += len
        n += 1
        bytes += len
      }
      if (n == 0) null else (n, bytes, vbr)
    }

    // an ID3v1 trailer is only stripped when the frame walk TILES to
    // the stripped end — entropy-coded audio can contain "TAG" at
    // length-128 by chance, and cutting there would break a valid file
    val hasTag = b.length >= 132 && b(b.length - 128) == 'T' &&
      b(b.length - 127) == 'A' && b(b.length - 126) == 'G'
    val walked =
      if (hasTag) {
        val t = walkTo(b.length - 128)
        if (t != null) t else walkTo(b.length)
      } else walkTo(b.length)
    if (walked == null) return null
    val (n, bytes, vbr) = walked
    val (xing, xingIsVbr) = xingFrames(b, first)
    // LAME writes "Xing" for VBR and "Info" for CBR — an Info header
    // must NOT flip the vbr audit column
    Mp3Info(first.versionString, first.layer, first.channels,
      first.sampleRate, n, bytes, first.samplesPerFrame, first.bitrateKbps,
      vbr || xingIsVbr, xing)
  }

  /** FREE-FORMAT walk (bitrate index 0): the frame size is
    * unsignaled, so recover it — scan for the next header matching
    * the first (free frames can only follow free frames), derive the
    * base size from that candidate minus the first frame's padding
    * slot, and VERIFY the whole stream tiles at it (per-frame padding
    * honored). Entropy bytes can fake a sync, so failed candidates
    * retry (bounded) — the verification pass is what real decoders
    * lean on too. The reported bitrate is the derived
    * `base*sampleRate/slotFactor` truncated to kbps, `vbr` false
    * (free format is constant-size by definition), no Xing.
    */
  private def parseFree(b: Array[Byte], first: Header): Mp3Info = {
    val slot = if (first.layer == 1) 4 else 1
    def matches(h: Header): Boolean =
      h != null && h.bitrateIdx == 0 && h.verBits == first.verBits &&
        h.layer == first.layer && h.srIdx == first.srIdx &&
        h.channels == first.channels
    def walkTo(end: Int, base: Int): (Long, Long) = {
      var p = 0
      var n = 0L
      var bytes = 0L
      while (p < end) {
        if (!matches(header(b, p))) return null
        val len = base + slot * ((b(p + 2) >> 1) & 1)
        if (p + len > end) return null
        p += len
        n += 1
        bytes += len
      }
      if (n < 2) null else (n, bytes) // a lone frame proves no size
    }
    val hasTag = b.length >= 132 && b(b.length - 128) == 'T' &&
      b(b.length - 127) == 'A' && b(b.length - 126) == 'G'
    var q = 8 // smallest conceivable frame: header + some payload
    var tried = 0
    while (q + 4 <= b.length && tried < 64) {
      if (matches(header(b, q))) {
        tried += 1
        val base = q - slot * first.padding
        if (base >= 8) {
          val walked =
            if (hasTag) {
              val t = walkTo(b.length - 128, base)
              if (t != null) t else walkTo(b.length, base)
            } else walkTo(b.length, base)
          if (walked != null) {
            val (n, bytes) = walked
            val div = first.layer match {
              case 1 => 48000L
              case 2 => 144000L
              case _ => if (first.verBits == 3) 144000L else 72000L
            }
            val kbps = (base.toLong * first.sampleRate / div).toInt
            return Mp3Info(first.versionString, first.layer, first.channels,
              first.sampleRate, n, bytes, first.samplesPerFrame, kbps,
              vbr = false, -1L)
          }
        }
      }
      q += 1
    }
    null
  }

  /** The Xing/Info frame count from the FIRST frame (Layer III
    * convention: after the zeroed side info) and whether the magic
    * was the VBR one ("Xing"; "Info" marks CBR); (-1, false) when
    * absent.
    */
  private def xingFrames(b: Array[Byte], h: Header): (Long, Boolean) = {
    if (h.layer != 3) return (-1L, false)
    val side =
      if (h.verBits == 3) { if (h.channels == 1) 17 else 32 }
      else { if (h.channels == 1) 9 else 17 }
    val off = 4 + (if (h.crc) 2 else 0) + side
    if (off + 8 > b.length) return (-1L, false)
    val magic = new String(b, off, 4, "US-ASCII")
    if (magic != "Xing" && magic != "Info") return (-1L, false)
    val flags = ((b(off + 4) & 0xFF) << 24) | ((b(off + 5) & 0xFF) << 16) |
      ((b(off + 6) & 0xFF) << 8) | (b(off + 7) & 0xFF)
    if ((flags & 1) == 0 || off + 12 > b.length) return (-1L, false)
    val n = ((b(off + 8) & 0xFF).toLong << 24) | ((b(off + 9) & 0xFF) << 16) |
      ((b(off + 10) & 0xFF) << 8) | (b(off + 11) & 0xFF)
    (n, magic == "Xing")
  }

  // ---- synthesizer -----------------------------------------------------

  /** A real MPEG audio stream: `nFrames` frames of (version 1/2/25,
    * layer 1-3), bitrate index per frame via `bitrateIdxFn`, padding
    * bit per frame via `padFn`, deterministic payload bytes via
    * `payload(frame, byteInPayload)`. `withXing` plants a Xing header
    * (frame count) after the first frame's zeroed side info — the
    * Layer III VBR convention. No CRC (protection bit set), like most
    * real encoders.
    */
  def synthMp3(version: Int, layer: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, bitrateIdxFn: Int => Int, padFn: Int => Int,
      withXing: Boolean, payload: (Int, Int) => Byte): Array[Byte] = {
    require(Seq(1, 2, 25).contains(version) && layer >= 1 && layer <= 3)
    require(srIdx >= 0 && srIdx <= 2 && nFrames >= 1)
    val verBits = version match { case 1 => 3; case 2 => 2; case _ => 0 }
    val out = new java.io.ByteArrayOutputStream()
    for (f <- 0 until nFrames) {
      val bi = bitrateIdxFn(f)
      require(bi >= 1 && bi <= 14, s"bitrate index $bi")
      val pad = padFn(f) & 1
      val h = Header(verBits, layer, crc = false,
        bitrateTable(verBits == 3, layer)(bi), bi,
        (verBits match { case 3 => SrV1; case 2 => SrV2; case _ => SrV25 })(srIdx),
        srIdx, pad, if (mono) 1 else 2)
      val len = h.frameLen
      val body = new Array[Byte](len)
      body(0) = 0xFF.toByte
      body(1) = (0xE0 | (verBits << 3) | ((4 - layer) << 1) | 1).toByte
      body(2) = ((bi << 4) | (srIdx << 2) | (pad << 1)).toByte
      body(3) = (if (mono) 0xC0 else 0x00).toByte
      var j = 4
      while (j < len) { body(j) = payload(f, j - 4); j += 1 }
      if (f == 0 && withXing) {
        require(layer == 3, "Xing is a Layer III convention")
        val side =
          if (verBits == 3) { if (mono) 17 else 32 }
          else { if (mono) 9 else 17 }
        val off = 4 + side
        require(off + 12 <= len, "first frame too small for Xing")
        java.util.Arrays.fill(body, 4, off, 0.toByte) // zeroed side info
        body(off) = 'X'; body(off + 1) = 'i'; body(off + 2) = 'n'
        body(off + 3) = 'g'
        body(off + 4) = 0; body(off + 5) = 0; body(off + 6) = 0
        body(off + 7) = 1 // flags: frames field present
        body(off + 8) = ((nFrames >> 24) & 0xFF).toByte
        body(off + 9) = ((nFrames >> 16) & 0xFF).toByte
        body(off + 10) = ((nFrames >> 8) & 0xFF).toByte
        body(off + 11) = (nFrames & 0xFF).toByte
      }
      out.write(body, 0, len)
    }
    out.toByteArray
  }

  /** A FREE-FORMAT stream (bitrate index 0): every frame is
    * `base + slot*pad` bytes (slot 4 for Layer I, 1 otherwise), size
    * signaled by NOTHING — the walk must recover it. Payload bytes
    * are masked to 0x7F so no false sync precedes the real frame-1
    * header (real free-format encoders can't promise that, which is
    * exactly why the walk retries candidates; fixtures keep the
    * recovery deterministic).
    */
  def synthMp3Free(version: Int, layer: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, base: Int, padFn: Int => Int,
      payload: (Int, Int) => Byte): Array[Byte] = {
    require(Seq(1, 2, 25).contains(version) && layer >= 1 && layer <= 3)
    require(srIdx >= 0 && srIdx <= 2 && nFrames >= 2 && base >= 8)
    val slot = if (layer == 1) 4 else 1
    require(layer != 1 || base % 4 == 0, "Layer I frames are 4-byte slotted")
    val verBits = version match { case 1 => 3; case 2 => 2; case _ => 0 }
    val out = new java.io.ByteArrayOutputStream()
    for (f <- 0 until nFrames) {
      val pad = padFn(f) & 1
      val len = base + slot * pad
      val body = new Array[Byte](len)
      body(0) = 0xFF.toByte
      body(1) = (0xE0 | (verBits << 3) | ((4 - layer) << 1) | 1).toByte
      body(2) = ((srIdx << 2) | (pad << 1)).toByte // bitrate index 0
      body(3) = (if (mono) 0xC0 else 0x00).toByte
      var j = 4
      while (j < len) { body(j) = (payload(f, j - 4) & 0x7F).toByte; j += 1 }
      out.write(body, 0, len)
    }
    out.toByteArray
  }

  /** A 128-byte ID3v1 trailer (title/artist zero-padded) — appended
    * raw after the last frame, the shape the walk must treat as
    * end-of-stream, not garbage.
    */
  def synthId3v1(title: String): Array[Byte] = {
    val t = new Array[Byte](128)
    t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
    val tb = title.getBytes("ISO-8859-1")
    System.arraycopy(tb, 0, t, 3, math.min(tb.length, 30))
    t
  }
}
