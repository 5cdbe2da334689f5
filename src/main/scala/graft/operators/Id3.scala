package graft.operators

/** ID3v2 tags — the metadata block audio files in the wild carry
  * PREPENDED to their stream: music corpora ship FLAC/MP3 with an
  * `ID3` header in front, so a reader that keys on the codec magic
  * at byte 0 misclassifies perfectly decodable audio. Parse the tag
  * (v2.3/v2.4 headers with syncsafe sizes, text frames in all three
  * spec encodings), expose the fields the pipeline audits
  * (title/artist/album/year — attribution provenance), and STRIP the
  * tag so the codec beneath decodes — the audio-side analogue of the
  * EXIF pass. (Reference scope note: the ETL core `etl.go:12-68` has
  * no media surface; extension frontier.)
  *
  * Decode posture: degrade-don't-throw, per-blob scalar routines.
  * No JVM ID3 implementation exists here; conformance is pinned by
  * synthesizer round-trips across versions and encodings.
  */
object Id3 {

  def hasId3(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
      (b(3) & 0xFF) >= 2 && (b(3) & 0xFF) <= 4 && // major version 2.2-2.4
      // syncsafe size: all four high bits clear
      (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
      (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0

  /** 28-bit syncsafe integer at `i`. */
  private def syncsafe(b: Array[Byte], i: Int): Int =
    ((b(i) & 0x7F) << 21) | ((b(i + 1) & 0x7F) << 14) |
      ((b(i + 2) & 0x7F) << 7) | (b(i + 3) & 0x7F)

  /** Total tag length including the 10-byte header (and the footer,
    * when the v2.4 footer flag is set); -1 when no sound tag starts
    * at byte 0.
    */
  def tagLength(b: Array[Byte]): Int = {
    if (!hasId3(b)) return -1
    val size = syncsafe(b, 6)
    val footer = (b(5) & 0x10) != 0
    val total = 10 + size + (if (footer) 10 else 0)
    if (total > b.length) -1 else total
  }

  /** The bytes after the tag — the codec stream an ID3-prefixed blob
    * actually carries. Identity for untagged input; null when the
    * tag is damaged (declared size past the input).
    */
  def strip(b: Array[Byte]): Array[Byte] = {
    if (!hasId3(b)) return b
    val len = tagLength(b)
    if (len < 0) null
    else java.util.Arrays.copyOfRange(b, len, b.length)
  }

  /** Reverse ID3v2 unsynchronisation over `[from, until)`: every
    * `FF 00` pair collapses to `FF` (the writer inserted the `00` to
    * keep false MPEG sync patterns out of the tag).
    */
  private def deUnsync(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new Array[Byte](until - from)
    var i = from
    var o = 0
    while (i < until) {
      out(o) = b(i)
      o += 1
      if ((b(i) & 0xFF) == 0xFF && i + 1 < until && b(i + 1) == 0) i += 2
      else i += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  /** Text frames (`Txxx` ids) as (id, decoded text), in file order.
    * Handles the three spec text encodings — 0 = ISO-8859-1, 1 =
    * UTF-16 with BOM, 3 = UTF-8 (v2.4) — and skips non-text and
    * damaged frames rather than failing the tag (hand-tagged files
    * are messy; partial metadata beats none). Empty for untagged
    * input.
    *
    * Unsynchronisation (common from older writers) is reversed at the
    * scope each version defines: v2.3's tag flag stuffs the WHOLE tag
    * body after frame assembly (headers and sizes included), so the
    * body is de-stuffed before the frame walk; v2.4 stuffs per frame
    * (tag flag = all frames, or the per-frame format flag 0x02) with
    * the size field counting the stored stuffed bytes, so each
    * payload de-stuffs individually.
    */
  def textFrames(b: Array[Byte]): Seq[(String, String)] = {
    val total = tagLength(b)
    if (total < 0) return Seq.empty
    val major = b(3) & 0xFF
    if (major < 3) return Seq.empty // v2.2 3-char frames: named, not parsed
    val tagUnsync = (b(5) & 0x80) != 0
    val endRaw = total - (if ((b(5) & 0x10) != 0) 10 else 0)
    val (buf, start, end) =
      if (major == 3 && tagUnsync) {
        val d = deUnsync(b, 10, endRaw)
        (d, 0, d.length)
      } else (b, 10, endRaw)
    val out = Seq.newBuilder[(String, String)]
    var p = start
    // skip the extended header when present (flag bit 6)
    if ((b(5) & 0x40) != 0 && p + 4 <= end) {
      val ehSize =
        if (major == 4) syncsafe(buf, p)
        else ((buf(p) & 0xFF) << 24) | ((buf(p + 1) & 0xFF) << 16) |
          ((buf(p + 2) & 0xFF) << 8) | (buf(p + 3) & 0xFF)
      p += (if (major == 4) ehSize else 4 + ehSize)
    }
    while (p >= 0 && p + 10 <= end && buf(p) != 0) {
      val id = new String(buf, p, 4, "US-ASCII")
      val size =
        if (major == 4) syncsafe(buf, p + 4)
        else ((buf(p + 4) & 0xFF) << 24) | ((buf(p + 5) & 0xFF) << 16) |
          ((buf(p + 6) & 0xFF) << 8) | (buf(p + 7) & 0xFF)
      if (size < 0 || p + 10 + size > end) return out.result() // damaged: stop
      if (id.length == 4 && id.charAt(0) == 'T' && size >= 1) {
        val frameUnsync =
          major == 4 && (tagUnsync || (buf(p + 9) & 0x02) != 0)
        val pay =
          if (frameUnsync) deUnsync(buf, p + 10, p + 10 + size)
          else java.util.Arrays.copyOfRange(buf, p + 10, p + 10 + size)
        val enc = pay(0) & 0xFF
        val text = enc match {
          case 0 => new String(pay, 1, pay.length - 1, "ISO-8859-1")
          case 1 => new String(pay, 1, pay.length - 1, "UTF-16") // BOM-led
          case 3 => new String(pay, 1, pay.length - 1, "UTF-8")
          case _ => null // 2 = UTF-16BE without BOM: rare, skip
        }
        if (text != null)
          out += ((id, text.takeWhile(_ != '\u0000'))) // strip terminator
      }
      p += 10 + size
    }
    out.result()
  }

  // ---- synthesizer -----------------------------------------------------

  /** Writer-side unsynchronisation: insert `00` after every `FF`
    * byte. (The spec requires it only before `00`/`E0-FF` or at the
    * end; stuffing every `FF` is conservative and decodes to the
    * same bytes, since reversal collapses exactly `FF 00` pairs.)
    */
  private def unsyncStuff(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if ((b(i) & 0xFF) == 0xFF) out.write(0)
      i += 1
    }
    out.toByteArray
  }

  /** A real ID3v2 tag (major `version` 3 or 4) from (frameId, text,
    * encoding) triples, prepended to `payload`. Frame sizes are
    * syncsafe for v2.4 and plain big-endian for v2.3, per spec.
    * With `unsync` set, stuffing is applied at each version's scope:
    * v2.3 stuffs the assembled tag body (tag flag 0x80); v2.4 stuffs
    * each frame payload (tag flag + per-frame format flag 0x02, size
    * counting stored bytes).
    */
  def synthTag(version: Int, frames: Seq[(String, String, Int)],
      payload: Array[Byte], unsync: Boolean = false): Array[Byte] = {
    require(version == 3 || version == 4)
    val body = new java.io.ByteArrayOutputStream()
    for ((id, text, enc) <- frames) {
      require(id.length == 4)
      val tb = enc match {
        case 0 => text.getBytes("ISO-8859-1")
        case 1 => // BOM + UTF-16LE (a common writer choice)
          Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
        case 3 => text.getBytes("UTF-8")
        case other => sys.error(s"unsupported synth encoding $other")
      }
      val raw = enc.toByte +: tb
      val stored = if (unsync && version == 4) unsyncStuff(raw) else raw
      val size = stored.length
      body.write(id.getBytes("US-ASCII"), 0, 4)
      if (version == 4) {
        body.write((size >> 21) & 0x7F); body.write((size >> 14) & 0x7F)
        body.write((size >> 7) & 0x7F); body.write(size & 0x7F)
      } else {
        body.write((size >> 24) & 0xFF); body.write((size >> 16) & 0xFF)
        body.write((size >> 8) & 0xFF); body.write(size & 0xFF)
      }
      body.write(0)
      body.write(if (unsync && version == 4) 0x02 else 0) // frame flags
      body.write(stored, 0, stored.length)
    }
    val bb0 = body.toByteArray
    val bb = if (unsync && version == 3) unsyncStuff(bb0) else bb0
    val out = new java.io.ByteArrayOutputStream(10 + bb.length + payload.length)
    out.write('I'); out.write('D'); out.write('3')
    out.write(version); out.write(0) // minor
    out.write(if (unsync) 0x80 else 0) // flags
    out.write((bb.length >> 21) & 0x7F); out.write((bb.length >> 14) & 0x7F)
    out.write((bb.length >> 7) & 0x7F); out.write(bb.length & 0x7F)
    out.write(bb, 0, bb.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}
