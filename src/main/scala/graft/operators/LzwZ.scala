package graft.operators

/** From-scratch Unix `compress` `.Z` codec (LZW) — the format legacy
  * crawls and tape dumps still arrive in (`.tar.Z`, `.warc.Z`).
  *
  * Layout: magic `1F 9D`, one flags byte (bits 0-4 = max code width
  * 9..16, bit 7 = block mode with code 256 reserved as CLEAR), then
  * LZW codes packed LSB-first starting at 9 bits. Two historical
  * quirks every conformant codec must honor:
  *
  *  - codes are flushed in GROUPS OF EIGHT: on a width change or a
  *    clear, both sides realign to the next multiple of 8 code reads
  *    (8 codes at width w = exactly w bytes, so groups stay
  *    byte-aligned), discarding the padding;
  *  - width growth follows the `maxcode` SCHEDULE, not a simple
  *    power-of-two test: maxcode starts at 511 — even when the
  *    file's max width IS 9 — and a side grows (between writing a
  *    code and adding its entry on the encoder; before each read on
  *    the decoder) whenever its entry count exceeds maxcode, the new
  *    maxcode being `1 << maxBits` once width reaches maxBits, else
  *    `(1 << width) - 1`. The init's missing maxBits case is the
  *    canonical `-b9` degeneracy: a maxBits=9 stream still bumps to
  *    10-bit codes once entry 512 allocates, exactly as compress(1)
  *    and gzip behave (verified against gzip across all widths and
  *    shapes during development).
  *
  * The encoder emits CLEAR whenever the table fills — always legal,
  * and it exercises the reset path often at small widths. The
  * independent pin is commons-compress's read-only
  * ZCompressorInputStream plus a live `uncompress` (gzip) test:
  * both must byte-exactly read this encoder's streams. The reference
  * pipeline (etl-pack) has no codec layer; this extends the
  * crawl-ingest matrix.
  *
  * Per-blob scalar, degrade-don't-throw: null on any damage.
  */
object LzwZ {

  def isZ(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && (b(0) & 0xFF) == 0x1F &&
      (b(1) & 0xFF) == 0x9D

  /** Decode a whole `.Z` stream; null on damage, `cap` bounds the
    * expansion (bomb guard).
    */
  def decode(b: Array[Byte], cap: Long = 1L << 30): Array[Byte] = try {
    if (!isZ(b)) return null
    val flags = b(2) & 0xFF
    val maxBits = flags & 0x1F
    if (maxBits < 9 || maxBits > 16) return null
    if ((flags & 0x60) != 0) return null // reserved bits
    val block = (flags & 0x80) != 0
    val maxEnt = 1 << maxBits
    val prefix = new Array[Int](maxEnt)
    val suffix = new Array[Byte](maxEnt)
    val stack = new Array[Byte](maxEnt + 1)
    var width = 9
    var nextFree = if (block) 257 else 256
    var codesRead = 0
    var pos = 3
    var bitBuf = 0
    var bitCnt = 0
    def readCode(): Int = {
      while (bitCnt < width) {
        if (pos >= b.length) return -1
        bitBuf |= (b(pos) & 0xFF) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val c = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width
      bitCnt -= width
      codesRead += 1
      c
    }
    def realign(): Unit = {
      var skip = (8 - (codesRead % 8)) % 8
      while (skip > 0) { readCode(); skip -= 1 }
      bitBuf = 0 // drop any partial byte (defensive, groups align)
      bitCnt = 0
    }
    var maxcode = 511 // canonical init — no maxBits==9 special case
    def nextCode(): Int = {
      if (nextFree > maxcode) { // the pre-read growth check
        realign()
        width += 1
        maxcode = if (width == maxBits) maxEnt else (1 << width) - 1
      }
      readCode()
    }
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4 + 64, 1 << 20).toInt)
    var prev = -1
    var firstByte = 0
    var c = nextCode()
    while (c >= 0) {
      if (block && c == 256) {
        realign()
        nextFree = 257
        width = 9
        maxcode = 511
        prev = -1
      } else if (prev < 0) {
        if (c > 255) return null // first code must be a literal
        out.write(c)
        firstByte = c
        prev = c
      } else {
        var sp = 0
        var cur = c
        if (cur >= nextFree) { // KwKwK: only the next-to-add is legal
          if (cur != nextFree || nextFree >= maxEnt) return null
          stack(sp) = firstByte.toByte
          sp += 1
          cur = prev
        }
        while (cur > 255) { // chains strictly decrease: terminates
          stack(sp) = suffix(cur)
          sp += 1
          cur = prefix(cur)
        }
        firstByte = cur
        stack(sp) = cur.toByte
        sp += 1
        if (out.size().toLong + sp > cap) return null
        while (sp > 0) { sp -= 1; out.write(stack(sp) & 0xFF) }
        if (nextFree < maxEnt) {
          prefix(nextFree) = prev
          suffix(nextFree) = firstByte.toByte
          nextFree += 1
        }
        prev = c
      }
      c = nextCode()
    }
    out.toByteArray
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** Compress to `.Z` in block mode at `maxBits` (9-16, compress's
    * `-b` range). The growth check sits between writing a code and
    * adding its entry — compress(1)'s output() ordering — so both
    * sides switch at the same code index; a CLEAR resets the table
    * the moment it fills.
    */
  def encode(data: Array[Byte], maxBits: Int = 16): Array[Byte] = {
    require(maxBits >= 9 && maxBits <= 16, s"maxBits=$maxBits")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    out.write(0x1F)
    out.write(0x9D)
    out.write(0x80 | maxBits)
    val maxEnt = 1 << maxBits
    var width = 9
    var codesWritten = 0
    var bitBuf = 0L
    var bitCnt = 0
    def putCode(c: Int): Unit = {
      bitBuf |= (c.toLong & ((1L << width) - 1)) << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
      codesWritten += 1
    }
    def realignWrite(): Unit = {
      var skip = (8 - (codesWritten % 8)) % 8
      while (skip > 0) { putCode(0); skip -= 1 }
    }
    // (prevCode << 8 | byte) -> code, open-addressed; -1 = empty
    val hashBits = maxBits + 2
    val hashSize = 1 << hashBits
    val hKey = new Array[Int](hashSize)
    val hVal = new Array[Int](hashSize)
    def clearTable(): Unit = java.util.Arrays.fill(hKey, -1)
    def lookup(key: Int): Int = {
      var h = (key * 0x9E3779B1) >>> (32 - hashBits)
      while (true) {
        if (hKey(h) == -1) return -(h + 1) // insertion slot
        if (hKey(h) == key) return hVal(h)
        h = (h + 1) & (hashSize - 1)
      }
      0 // unreachable
    }
    clearTable()
    var nextFree = 257
    var maxcode = 511 // canonical init — no maxBits==9 special case
    var prev = -1
    def growCheck(): Unit =
      if (nextFree > maxcode) {
        realignWrite()
        width += 1
        maxcode = if (width == maxBits) maxEnt else (1 << width) - 1
      }
    var i = 0
    while (i < data.length) {
      val v = data(i) & 0xFF
      if (prev < 0) prev = v
      else {
        val key = (prev << 8) | v
        val r = lookup(key)
        if (r >= 0) prev = r
        else {
          putCode(prev)
          growCheck()
          if (nextFree < maxEnt) {
            val slot = -r - 1
            hKey(slot) = key
            hVal(slot) = nextFree
            nextFree += 1
            prev = v
          } else {
            // table full: CLEAR, reset, restart from this byte
            prev = v
            putCode(256)
            realignWrite()
            width = 9
            maxcode = 511
            nextFree = 257
            clearTable()
          }
        }
      }
      i += 1
    }
    if (prev >= 0) { putCode(prev); growCheck() }
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }
}
