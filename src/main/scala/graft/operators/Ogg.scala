package graft.operators

import scala.collection.mutable.ArrayBuffer

/** From-scratch Ogg container walk + Ogg-FLAC decode.
  *
  * Ogg is the container the Xiph audio family ships in — `.oga`/
  * `.ogg` files carry FLAC, Vorbis, or Opus streams, and audio
  * corpora scraped from the web include all three. The CONTAINER is
  * pure algorithm (RFC 3533: page framing, lacing-value packet
  * reassembly, per-page CRC-32) and Ogg-FLAC decodes end-to-end
  * through the existing [[Flac]] frame decoder per the Xiph Ogg-FLAC
  * mapping; Vorbis and Opus payloads are NAMED as profile gaps
  * (their codecs are out of scope — psychoacoustic transforms, not
  * container work), never misclassified. (Reference scope note: the
  * ETL core `etl.go:12-68` has no media surface; extension frontier.)
  *
  * Decode posture matches every decoder here: degrade-don't-throw
  * (null on damage — the page CRC catches corruption), decompression
  * bomb cap on reassembled packet bytes, per-blob scalar routines for
  * `mapPartitions` ingest. No Ogg implementation ships in this
  * environment, so conformance is pinned the LZW/FLAC way: the
  * synthesizer paginates REAL streams (correct CRCs, genuine lacing,
  * continued packets across pages) and OggSpec pins
  * synthesizer↔decoder both directions.
  */
object Ogg {

  private val MaxPacketBytes = 1L << 30

  def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S'

  /** Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection, no
    * final xor (NOT the zlib CRC), computed with the CRC field
    * zeroed. Table-driven — this runs over EVERY byte of every crawl
    * audio blob on the mapPartitions hot path, where a bitwise kernel
    * would cost 8 shift/xor rounds per byte.
    */
  private val CrcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n << 24
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
      k += 1
    }
    c
  }

  private[graft] def pageCrc(b: Array[Byte], off: Int, len: Int,
      crcFieldAt: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      val v =
        if (off + i >= crcFieldAt && off + i < crcFieldAt + 4) 0
        else b(off + i) & 0xFF
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ v) & 0xFF)
      i += 1
    }
    crc
  }

  private def leU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL)) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** One page: header flags, stream serial, sequence number, and the
    * segment bytes with their lacing values (needed for packet
    * reassembly and loss detection).
    */
  private def leU64(b: Array[Byte], i: Int): Long =
    leU32(b, i) | (leU32(b, i + 4) << 32)

  private final case class Page(flags: Int, serial: Long, seq: Long,
      granule: Long, lacing: Array[Int], data: Array[Byte])

  /** Walk all pages, verifying each CRC. Null on damage anywhere —
    * a truncated header, a lacing table past the input, or a CRC
    * mismatch (degrade-don't-throw).
    */
  private def pages(b: Array[Byte]): Array[Page] = try {
    if (!isOgg(b)) return null
    val out = ArrayBuffer.empty[Page]
    var p = 0
    while (p < b.length) {
      if (p + 27 > b.length) return null
      if (!(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S'))
        return null
      if (b(p + 4) != 0) return null // stream structure version
      val flags = b(p + 5) & 0xFF
      val serial = leU32(b, p + 14)
      val nseg = b(p + 26) & 0xFF
      if (p + 27 + nseg > b.length) return null
      val lacing = Array.tabulate(nseg)(i => b(p + 27 + i) & 0xFF)
      val dataLen = lacing.sum
      val pageLen = 27 + nseg + dataLen
      if (p + pageLen > b.length) return null
      val want = leU32(b, p + 22).toInt
      if (pageCrc(b, p, pageLen, p + 22) != want) return null
      out += Page(flags, serial, leU32(b, p + 18), leU64(b, p + 6),
        lacing, java.util.Arrays.copyOfRange(b, p + 27 + nseg, p + pageLen))
      p += pageLen
    }
    out.toArray
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** Reassemble the packets of the FIRST logical bitstream (the
    * serial of the first begin-of-stream page): lacing values
    * concatenate segments, 255 continues a packet — across pages via
    * the continued-packet flag — and any value < 255 ends it. Pages
    * of other multiplexed/chained serials are skipped, not decoded
    * (grouped/chained Ogg carries independent streams; callers get
    * the primary one). Null on page damage, a sequence-number gap
    * (the RFC's page-loss detector — a stream cut at an exact page
    * boundary is otherwise CRC-clean), a missing end-of-stream flag
    * on the final page (same truncation shape), a continuity
    * violation, an unterminated final packet, or the reassembly bomb
    * cap.
    */
  def packets(b: Array[Byte]): Array[Array[Byte]] = {
    val w = walk(b)
    if (w == null) null else w._1
  }

  /** [[packets]] plus the END granule position of the first logical
    * stream (its EOS page's granule field) — the sample clock audio
    * mappings hang duration on.
    */
  private def walk(b: Array[Byte]): (Array[Array[Byte]], Long) = {
    val ps = pages(b)
    if (ps == null || ps.isEmpty) return null
    if ((ps(0).flags & 2) == 0) return null // first page must be BOS
    val serial = ps(0).serial
    val out = ArrayBuffer.empty[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    var open = false // a packet is mid-assembly across a page boundary
    var total = 0L
    var expectSeq = ps(0).seq // per-stream counter; BOS fixes the base
    var sawEos = false
    var endGranule = 0L
    for (pg <- ps if pg.serial == serial) {
      // -1 marks "no packet completes on this page" (all-continuation
      // or empty EOS pages); the stream clock is the last REAL granule
      if (pg.granule != -1L) endGranule = pg.granule
      if (pg.seq != expectSeq) return null // page loss / reorder
      expectSeq += 1
      if (sawEos) return null // pages after the end-of-stream flag
      if ((pg.flags & 4) != 0) sawEos = true
      if (((pg.flags & 1) != 0) != open) return null // continuity violation
      var off = 0
      for (l <- pg.lacing) {
        cur.write(pg.data, off, l)
        off += l
        total += l
        if (total > MaxPacketBytes) return null // reassembly bomb
        if (l < 255) {
          out += cur.toByteArray
          cur = new java.io.ByteArrayOutputStream()
          open = false
        } else open = true
      }
    }
    if (open) return null // stream ended mid-packet
    if (!sawEos) return null // cut at a page boundary: CRC-clean truncation
    (out.toArray, endGranule)
  }

  /** Codec name + (for Ogg-FLAC) STREAMINFO in ONE packets() walk —
    * the probe [[graft.operators.Containers.parse]] calls, so
    * classifying a blob doesn't re-walk and re-CRC the pages once per
    * question. Null when the container is damaged; the info half is
    * null for non-FLAC codecs.
    */
  def probe(b: Array[Byte]): (String, Flac.StreamInfo) = {
    val pk = packets(b)
    if (pk == null || pk.isEmpty) return null
    val h = pk(0)
    def hasMagic(at: Int, s: String): Boolean =
      h.length >= at + s.length && s.indices.forall(i => h(at + i) == s(i).toByte)
    if (h.length >= 5 && (h(0) & 0xFF) == 0x7F && hasMagic(1, "FLAC"))
      ("oggflac", flacInfoOf(h))
    else if (h.length >= 7 && h(0) == 1 && hasMagic(1, "vorbis")) ("ogg_vorbis", null)
    else if (hasMagic(0, "OpusHead")) ("ogg_opus", null)
    else if (h.length >= 7 && (h(0) & 0xFF) == 0x80 && hasMagic(1, "theora"))
      ("ogg_theora", null)
    else ("ogg", null)
  }

  /** Codec of the first logical stream, from its first packet's
    * magic: "oggflac", "ogg_vorbis", "ogg_opus", "ogg_theora", or
    * "ogg" when the container is sound but the codec is unrecognized.
    * Null when the container itself is damaged.
    */
  def codec(b: Array[Byte]): String = {
    val p = probe(b)
    if (p == null) null else p._1
  }

  /** STREAMINFO of an Ogg-FLAC stream (the Xiph mapping's first
    * packet is `7F 'FLAC' major minor nHeaders(2 BE)` followed by a
    * verbatim `fLaC` + STREAMINFO block). Null unless the stream is
    * sound Ogg-FLAC.
    */
  def flacStreamInfo(b: Array[Byte]): Flac.StreamInfo = {
    val p = probe(b)
    if (p == null) null else p._2
  }

  private def flacInfoOf(first: Array[Byte]): Flac.StreamInfo = {
    if (first.length < 9 + 4 + 4 + 34) return null
    if ((first(0) & 0xFF) != 0x7F || first(1) != 'F' || first(2) != 'L' ||
        first(3) != 'A' || first(4) != 'C') return null
    if (first(5) != 1) return null // mapping major version
    Flac.streamInfo(java.util.Arrays.copyOfRange(first, 9, first.length))
  }

  /** Decode an Ogg-FLAC stream to interleaved samples: reassemble
    * packets, parse the mapping header, skip the declared count of
    * following header packets (FLAC metadata blocks in packets —
    * typically one VORBIS_COMMENT), and run the remaining packets —
    * one FLAC frame each — through [[Flac.frameSamples]]. Null on
    * container damage, a non-FLAC stream, or frame corruption.
    */
  def flacSamples(b: Array[Byte]): Array[Int] = {
    val pk = packets(b)
    if (pk == null || pk.isEmpty) return null
    val info = flacInfoOf(pk(0))
    if (info == null) return null
    val nHeaders = ((pk(0)(7) & 0xFF) << 8) | (pk(0)(8) & 0xFF)
    val firstAudio = 1 + nHeaders
    if (firstAudio > pk.length) return null
    var len = 0
    var i = firstAudio
    while (i < pk.length) { len += pk(i).length; i += 1 }
    val frames = new Array[Byte](len)
    var off = 0
    i = firstAudio
    while (i < pk.length) {
      System.arraycopy(pk(i), 0, frames, off, pk(i).length)
      off += pk(i).length
      i += 1
    }
    Flac.frameSamples(frames, 0, info)
  }

  // ---- Opus / Vorbis packet metadata ---------------------------------

  /** Per-frame sample count (at the 48 kHz Opus clock) for a TOC
    * config number, RFC 6716 §3.1: SILK configs 0-11 run
    * 10/20/40/60 ms in bandwidth groups of four, hybrid 12-15 run
    * 10/20 ms in pairs, CELT 16-31 run 2.5/5/10/20 ms in groups of
    * four. Shared with the oracle-SQL builder.
    */
  def opusConfigSamples(config: Int): Int =
    if (config < 12) Array(480, 960, 1920, 2880)(config & 3)
    else if (config < 16) Array(480, 960)(config & 1)
    else Array(120, 240, 480, 960)(config & 3)

  /** Samples (48 kHz clock) carried by one Opus packet, from its TOC
    * byte and frame-count code; -1 for malformed packets (empty, a
    * code-3 packet without its count byte, zero frames, or over the
    * RFC's 120 ms packet cap).
    */
  def opusPacketSamples(p: Array[Byte]): Int = {
    if (p == null || p.length < 1) return -1
    val toc = p(0) & 0xFF
    val fs = opusConfigSamples(toc >> 3)
    val n = (toc & 3) match {
      case 0 => 1
      case 1 | 2 => 2
      case _ =>
        if (p.length < 2) return -1
        p(1) & 0x3F
    }
    if (n == 0) return -1
    val total = n * fs
    if (total > 5760) return -1 // RFC 6716: at most 120 ms per packet
    total
  }

  /** Audio-stream metadata for the two codecs whose PAYLOAD decode is
    * out of scope — the packet-walk layer that makes Opus/Vorbis
    * corpora auditable: identification-header fields, packet counts,
    * per-packet TOC durations (Opus), and the end-granule sample
    * clock. `tocSamples` is -1 for Vorbis (packet durations need the
    * codec's blocksize decode). Null when the container is damaged,
    * the header packets are malformed, or any Opus TOC is malformed —
    * degrade, don't throw.
    */
  final case class OggAudio(codec: String, channels: Int, preSkip: Int,
      inputRate: Int, nAudioPackets: Long, tocSamples: Long,
      granuleEnd: Long, durationMs: Long)

  def audioMeta(b: Array[Byte]): OggAudio = {
    val w = walk(b)
    if (w == null || w._1.isEmpty) return null
    val (pk, endGranule) = w
    val h = pk(0)
    def hasMagic(at: Int, m: String): Boolean =
      h.length >= at + m.length && m.indices.forall(i => h(at + i) == m(i).toByte)
    if (hasMagic(0, "OpusHead")) {
      // RFC 7845 §5.1: version (major nibble 0), channel count,
      // pre-skip LE16, input rate LE32; OpusTags must follow
      if (h.length < 19 || ((h(8) & 0xFF) >> 4) != 0) return null
      val channels = h(9) & 0xFF
      if (channels == 0) return null
      val preSkip = (h(10) & 0xFF) | ((h(11) & 0xFF) << 8)
      val inputRate = (leU32(h, 12) & 0xFFFFFFFFL).toInt
      if (pk.length < 2) return null
      val t = pk(1)
      if (t.length < 8 || !"OpusTags".indices.forall(i =>
        t(i) == "OpusTags".charAt(i).toByte)) return null
      var toc = 0L
      var i = 2
      while (i < pk.length) {
        val n = opusPacketSamples(pk(i))
        if (n < 0) return null
        toc += n
        i += 1
      }
      val played = math.max(0L, endGranule - preSkip)
      OggAudio("opus", channels, preSkip, inputRate, pk.length - 2L, toc,
        endGranule, played * 1000L / 48000L)
    } else if (h.length >= 30 && h(0) == 1 && hasMagic(1, "vorbis")) {
      // Vorbis I identification header: version LE32 (0), channels,
      // rate LE32; comment + setup headers follow, then audio packets
      if (leU32(h, 7) != 0) return null
      val channels = h(11) & 0xFF
      val rate = (leU32(h, 12) & 0xFFFFFFFFL).toInt
      if (channels == 0 || rate <= 0) return null
      if (pk.length < 3) return null // comment + setup expected
      if (!(pk(1).length >= 7 && pk(1)(0) == 3 &&
            "vorbis".indices.forall(i => pk(1)(i + 1) == "vorbis".charAt(i).toByte)))
        return null
      OggAudio("vorbis", channels, 0, rate, pk.length - 3L, -1L,
        endGranule, math.max(0L, endGranule) * 1000L / rate)
    } else null
  }

  // ---- synthesizer ---------------------------------------------------

  private def putLeU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
    b(i + 2) = ((v >> 16) & 0xFF).toByte; b(i + 3) = ((v >> 24) & 0xFF).toByte
  }

  /** Paginate packets into a REAL Ogg stream: lacing values in
    * 255-byte slices, `maxSegsPerPage` segments per page (a packet
    * needing more continues onto the next page with the
    * continued-packet flag — the cross-page shape real streams have),
    * BOS on the first page, EOS on the last, correct CRC-32 per page.
    */
  def synthOgg(packetSeq: Seq[Array[Byte]], serial: Long = 0x67726166L,
      maxSegsPerPage: Int = 32,
      packetGranules: Seq[Long] = null): Array[Byte] = {
    require(maxSegsPerPage >= 1 && maxSegsPerPage <= 255)
    require(packetGranules == null || packetGranules.length == packetSeq.length,
      "one granule per packet")
    // flatten to (lacing value, data slice) pairs in stream order;
    // terminal segments remember their packet so pages can carry the
    // granule of the last packet completing on them (the Ogg rule)
    final case class Seg(l: Int, src: Array[Byte], off: Int, packetIdx: Int,
        terminal: Boolean)
    val segs = ArrayBuffer.empty[Seg]
    for ((p, pi) <- packetSeq.zipWithIndex) {
      var off = 0
      while (p.length - off >= 255) {
        segs += Seg(255, p, off, pi, terminal = false); off += 255
      }
      segs += Seg(p.length - off, p, off, pi, terminal = true) // may be 0
    }
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var pageIdx = 0L
    var continued = false
    while (i < segs.length) {
      val n = math.min(maxSegsPerPage, segs.length - i)
      val page = segs.slice(i, i + n)
      val dataLen = page.map(_.l).sum
      val buf = new Array[Byte](27 + n + dataLen)
      buf(0) = 'O'; buf(1) = 'g'; buf(2) = 'g'; buf(3) = 'S'
      buf(4) = 0
      var flags = 0
      if (continued) flags |= 1
      if (i == 0) flags |= 2 // BOS
      if (i + n == segs.length) flags |= 4 // EOS
      buf(5) = flags.toByte
      // granule: the last packet COMPLETING on this page (per spec),
      // taken from packetGranules when supplied; -1 for pages where
      // no packet ends; legacy page index otherwise (granule is not
      // consumed by the non-audio decode paths)
      val lastTerm = page.reverseIterator.find(_.terminal)
      val granule =
        if (lastTerm.isEmpty) -1L
        else if (packetGranules != null) packetGranules(lastTerm.get.packetIdx)
        else pageIdx
      var g = granule
      for (k <- 0 until 8) { buf(6 + k) = (g & 0xFF).toByte; g >>= 8 }
      putLeU32(buf, 14, serial)
      putLeU32(buf, 18, pageIdx)
      buf(26) = n.toByte
      for (k <- 0 until n) buf(27 + k) = page(k).l.toByte
      var off = 27 + n
      for (s <- page) {
        System.arraycopy(s.src, s.off, buf, off, s.l)
        off += s.l
      }
      putLeU32(buf, 22, pageCrc(buf, 0, buf.length, 22) & 0xFFFFFFFFL)
      out.write(buf, 0, buf.length)
      continued = !page.last.terminal
      pageIdx += 1
      i += n
    }
    out.toByteArray
  }

  /** Real Ogg-FLAC stream per the Xiph mapping: first packet
    * `7F 'FLAC' 1 0 nHeaders=1` + verbatim `fLaC` + STREAMINFO, one
    * VORBIS_COMMENT metadata packet (the header the mapping expects
    * real muxers to write, exercising the decoder's header skip),
    * then one FLAC frame per packet. `maxSegsPerPage` below a frame's
    * segment count forces continued packets across pages.
    */
  def synthOggFlac(sampleRate: Int, channels: Int, interleaved: Array[Int],
      blockSize: Int = 256, mode: String = "fixed2",
      maxSegsPerPage: Int = 32): Array[Byte] = {
    val (flacHeader, frames) =
      Flac.synthFlacParts(sampleRate, channels, interleaved, blockSize, mode)
    val first = new java.io.ByteArrayOutputStream()
    first.write(0x7F)
    first.write("FLAC".getBytes("US-ASCII"))
    first.write(1); first.write(0) // mapping version 1.0
    first.write(0); first.write(1) // nHeaders = 1 (the comment packet)
    // flacHeader = "fLaC" + STREAMINFO block; the mapping wants the
    // last-metadata flag CLEAR here because a header packet follows
    val hdr = flacHeader.clone()
    hdr(4) = (hdr(4) & 0x7F).toByte
    first.write(hdr, 0, hdr.length)
    val vendor = "graft".getBytes("US-ASCII")
    val comment = new java.io.ByteArrayOutputStream()
    comment.write(0x84) // last metadata block, type 4 VORBIS_COMMENT
    val clen = 4 + vendor.length + 4
    comment.write((clen >> 16) & 0xFF); comment.write((clen >> 8) & 0xFF)
    comment.write(clen & 0xFF)
    comment.write(vendor.length); comment.write(0); comment.write(0); comment.write(0)
    comment.write(vendor, 0, vendor.length)
    comment.write(0); comment.write(0); comment.write(0); comment.write(0)
    synthOgg(Seq(first.toByteArray, comment.toByteArray) ++ frames,
      maxSegsPerPage = maxSegsPerPage)
  }

  /** A real Ogg-Opus stream per RFC 7845: OpusHead (version 1,
    * channels, pre-skip, input rate), OpusTags, then one audio packet
    * per `(config, nFrames)` with a correct RFC 6716 TOC byte (frame
    * count code 0/1/3) and deterministic payload bytes. Granule
    * positions run the 48 kHz sample clock: header pages at 0, audio
    * packet k at `preSkip + cumulative TOC samples` — so the end
    * granule minus pre-skip is exactly the TOC total, the invariant
    * [[audioMeta]] audits.
    */
  def synthOpus(channels: Int, preSkip: Int, inputRate: Int,
      packets: Seq[(Int, Int)],
      payload: (Int, Int) => Byte = (_, _) => 0x5A.toByte,
      maxSegsPerPage: Int = 32): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && preSkip >= 0)
    val head = new java.io.ByteArrayOutputStream()
    head.write("OpusHead".getBytes("US-ASCII"))
    head.write(1) // version
    head.write(channels)
    head.write(preSkip & 0xFF); head.write((preSkip >> 8) & 0xFF)
    for (k <- 0 until 4) head.write((inputRate >> (8 * k)) & 0xFF)
    head.write(0); head.write(0) // output gain 0
    head.write(0) // channel mapping family 0
    val tags = new java.io.ByteArrayOutputStream()
    tags.write("OpusTags".getBytes("US-ASCII"))
    val vendor = "graft".getBytes("US-ASCII")
    tags.write(vendor.length); tags.write(0); tags.write(0); tags.write(0)
    tags.write(vendor, 0, vendor.length)
    tags.write(0); tags.write(0); tags.write(0); tags.write(0) // 0 comments
    var granule = preSkip.toLong
    val audio = packets.zipWithIndex.map { case ((config, nFrames), k) =>
      require(config >= 0 && config <= 31 && nFrames >= 1 && nFrames <= 48)
      require(nFrames * opusConfigSamples(config) <= 5760,
        "over the RFC 120 ms packet cap")
      val out = new java.io.ByteArrayOutputStream()
      val code = nFrames match { case 1 => 0; case 2 => 1; case _ => 3 }
      out.write((config << 3) | (if (channels >= 2) 4 else 0) | code)
      if (code == 3) out.write(nFrames) // CBR, no padding: v=0 p=0 M=n
      val bodyLen = nFrames * 10 // equal CBR frame bodies
      for (j <- 0 until bodyLen) out.write(payload(k, j))
      granule += nFrames * opusConfigSamples(config)
      (out.toByteArray, granule)
    }
    synthOgg(Seq(head.toByteArray, tags.toByteArray) ++ audio.map(_._1),
      maxSegsPerPage = maxSegsPerPage,
      packetGranules = Seq(0L, 0L) ++ audio.map(_._2))
  }

  /** A Vorbis-headed stream with all THREE header packets
    * (identification, comment, setup-shaped stub) and `nAudio` stub
    * audio packets, end granule = `granuleEnd` — the container-level
    * shape [[audioMeta]] audits while the codec payload stays a named
    * gap.
    */
  def synthVorbis(sampleRate: Int, channels: Int, nAudio: Int,
      granuleEnd: Long,
      payload: (Int, Int) => Byte = (_, _) => 0x24.toByte): Array[Byte] = {
    val id = new java.io.ByteArrayOutputStream()
    id.write(1)
    id.write("vorbis".getBytes("US-ASCII"))
    for (k <- 0 until 4) id.write(0) // vorbis_version = 0
    id.write(channels)
    for (k <- 0 until 4) id.write((sampleRate >> (8 * k)) & 0xFF)
    for (k <- 0 until 12) id.write(0) // bitrate fields
    id.write(0xB8) // blocksize exponents 8/11
    id.write(1) // framing bit
    val comment = new java.io.ByteArrayOutputStream()
    comment.write(3)
    comment.write("vorbis".getBytes("US-ASCII"))
    val vendor = "graft".getBytes("US-ASCII")
    comment.write(vendor.length); comment.write(0); comment.write(0)
    comment.write(0)
    comment.write(vendor, 0, vendor.length)
    comment.write(0); comment.write(0); comment.write(0); comment.write(0)
    comment.write(1) // framing bit
    val setup = new java.io.ByteArrayOutputStream()
    setup.write(5)
    setup.write("vorbis".getBytes("US-ASCII"))
    for (k <- 0 until 16) setup.write((k * 7) & 0xFF) // stub body
    val audio = (0 until nAudio).map { k =>
      Array.tabulate(12 + (k % 5))(j => payload(k, j))
    }
    // granules: headers 0; audio packets step evenly to granuleEnd
    val gs = (1 to nAudio).map(k =>
      if (k == nAudio) granuleEnd else granuleEnd * k / math.max(1, nAudio))
    synthOgg(
      Seq(id.toByteArray, comment.toByteArray, setup.toByteArray) ++ audio,
      packetGranules = Seq(0L, 0L, 0L) ++ gs)
  }

  /** A Vorbis-headed Ogg stream (identification header magic + the
    * fields a real encoder writes, payload stubbed) — enough for the
    * classifier to NAME the profile gap; decoding Vorbis is out of
    * scope.
    */
  def synthVorbisStub(sampleRate: Int, channels: Int): Array[Byte] = {
    val h = new java.io.ByteArrayOutputStream()
    h.write(1)
    h.write("vorbis".getBytes("US-ASCII"))
    for (k <- 0 until 4) h.write(0) // vorbis_version = 0
    h.write(channels)
    for (k <- 0 until 4) h.write((sampleRate >> (8 * k)) & 0xFF)
    for (k <- 0 until 12) h.write(0) // bitrate fields
    h.write(0xB8) // blocksize exponents 8/11
    h.write(1) // framing bit
    synthOgg(Seq(h.toByteArray))
  }
}
