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
  private final case class Page(flags: Int, serial: Long, seq: Long,
      lacing: Array[Int], data: Array[Byte])

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
      out += Page(flags, serial, leU32(b, p + 18),
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
    for (pg <- ps if pg.serial == serial) {
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
    out.toArray
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
      maxSegsPerPage: Int = 32): Array[Byte] = {
    require(maxSegsPerPage >= 1 && maxSegsPerPage <= 255)
    // flatten to (lacing value, data slice) pairs in stream order
    final case class Seg(l: Int, src: Array[Byte], off: Int)
    val segs = ArrayBuffer.empty[Seg]
    for (p <- packetSeq) {
      var off = 0
      while (p.length - off >= 255) { segs += Seg(255, p, off); off += 255 }
      segs += Seg(p.length - off, p, off) // terminating segment (may be 0)
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
      // granule: not consumed by the decode path; -1 marks "no packet
      // ends here" only for all-continuation pages, else page index
      val granule = if (page.forall(_.l == 255)) -1L else pageIdx
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
      continued = page.last.l == 255
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
