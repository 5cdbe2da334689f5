package graft.operators

/** From-scratch DEFLATE64 ("enhanced deflate", ZIP method 9) decoder.
  *
  * Deflate64 is RFC 1951 deflate with three extensions (APPNOTE
  * 4.4.5): a 64 KiB history window, length code 285 carrying 16
  * extra bits over base 3 (matches to 65538 bytes), and distance
  * codes 30/31 (14 extra bits, bases 32769/49153). A standard
  * deflate stream is ALSO a valid deflate64 stream — UNLESS it uses
  * length code 285, which classic deflate defines as a bare 258 and
  * deflate64 redefines with 16 extra bits (the one genuine
  * incompatibility between the two). The JDK Deflater pins the
  * 285-free subset; commons-compress's Deflate64CompressorInputStream
  * is the independent pin for the extended semantics (it reads the
  * [[fixedBlock]] encoder's >258-length / >32K-distance streams).
  *
  * The reference pipeline (etl-pack) has no archive layer at all;
  * this closes the ZIP walk's deflate64 profile for real-world
  * dataset shards written by PKZIP with "enhanced deflate" on.
  *
  * Decoding is the canonical bit-at-a-time Huffman walk over
  * (count-per-length, symbol) tables — no per-symbol allocation, no
  * lookup tables rebuilt per block beyond the two length arrays.
  * Degrade-don't-throw: any structural violation returns null.
  */
object Inflate64 {

  // deflate64 length codes 257..285: (base, extra bits)
  private val LBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
    19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195,
    227, 3 /* 285: base 3, 16 extra — the deflate64 extension */)
  private val LExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 16)

  // deflate64 distance codes 0..31 (30/31 are the 64K extension)
  private val DBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
    65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073,
    4097, 6145, 8193, 12289, 16385, 24577, 32769, 49153)
  private val DExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14)

  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
    12, 3, 13, 2, 14, 1, 15)

  /** Canonical Huffman table: per-length symbol counts + symbols in
    * canonical order. Construction rejects oversubscribed length
    * sets; incomplete sets are tolerated (RFC 1951 allows the
    * single-distance-code degenerate form) — a probe into the
    * missing space fails at decode time instead.
    */
  private final class Huff(lens: Array[Int]) {
    val count = new Array[Int](16)
    var bad = false
    locally {
      var i = 0
      while (i < lens.length) { count(lens(i)) += 1; i += 1 }
      var left = 1
      var l = 1
      while (l <= 15) {
        left <<= 1
        left -= count(l)
        if (left < 0) bad = true
        l += 1
      }
    }
    val offs = new Array[Int](16)
    locally {
      var l = 1
      while (l < 15) { offs(l + 1) = offs(l) + count(l); l += 1 }
    }
    val sym = new Array[Int](lens.length)
    locally {
      val next = offs.clone()
      var i = 0
      while (i < lens.length) {
        if (lens(i) != 0) { sym(next(lens(i))) = i; next(lens(i)) += 1 }
        i += 1
      }
    }
  }

  private final class Bits(b: Array[Byte], start: Int, endExcl: Int) {
    var pos = start
    private var cur = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= endExcl) return -1
        cur = b(pos) & 0xFF
        pos += 1
        n = 8
      }
      val v = cur & 1
      cur >>= 1
      n -= 1
      v
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) {
        val t = bit()
        if (t < 0) return -1
        v |= t << i
        i += 1
      }
      v
    }
    def alignByte(): Unit = n = 0
  }

  /** One code off the stream (deflate codes accumulate MSB-first). */
  private def decodeSym(h: Huff, br: Bits): Int = {
    var code = 0
    var first = 0
    var index = 0
    var l = 1
    while (l <= 15) {
      val t = br.bit()
      if (t < 0) return -1
      code |= t
      val cnt = h.count(l)
      if (code - first < cnt) return h.sym(index + (code - first))
      index += cnt
      first += cnt
      first <<= 1
      code <<= 1
      l += 1
    }
    -1
  }

  private val FixedLit: Huff = {
    val lens = new Array[Int](288)
    for (i <- 0 until 144) lens(i) = 8
    for (i <- 144 until 256) lens(i) = 9
    for (i <- 256 until 280) lens(i) = 7
    for (i <- 280 until 288) lens(i) = 8
    new Huff(lens)
  }
  private val FixedDist: Huff = new Huff(Array.fill(32)(5))

  /** Inflate a raw deflate64 stream to exactly `outSize` bytes; null
    * on any structural damage, over/under-run, or a distance that
    * reaches before the start of output.
    */
  def inflate(b: Array[Byte], start: Int, endExcl: Int,
      outSize: Int): Array[Byte] = {
    if (outSize < 0) return null
    val br = new Bits(b, start, endExcl)
    val out = new Array[Byte](outSize)
    var outLen = 0
    var fin = false
    while (!fin) {
      val f = br.bit()
      if (f < 0) return null
      fin = f == 1
      br.bits(2) match {
        case 0 => // stored: align, LEN + ~LEN, raw copy
          br.alignByte()
          val len = br.bits(16)
          val nlen = br.bits(16)
          if (len < 0 || nlen < 0 || (len ^ 0xFFFF) != nlen) return null
          if (br.pos + len > endExcl || outLen + len > outSize) return null
          System.arraycopy(b, br.pos, out, outLen, len)
          br.pos += len
          outLen += len
        case 1 =>
          val r = block(FixedLit, FixedDist, br, out, outLen)
          if (r < 0) return null
          outLen = r
        case 2 =>
          val hlit = br.bits(5)
          val hdist = br.bits(5)
          val hclen = br.bits(4)
          if (hclen < 0) return null
          val nlit = hlit + 257
          val ndist = hdist + 1
          if (nlit > 288 || ndist > 32) return null
          val clLens = new Array[Int](19)
          var i = 0
          while (i < hclen + 4) {
            val v = br.bits(3)
            if (v < 0) return null
            clLens(ClOrder(i)) = v
            i += 1
          }
          val clH = new Huff(clLens)
          if (clH.bad) return null
          val lens = new Array[Int](nlit + ndist)
          var k = 0
          while (k < lens.length) {
            val s = decodeSym(clH, br)
            if (s < 0) return null
            if (s < 16) { lens(k) = s; k += 1 }
            else if (s == 16) {
              if (k == 0) return null
              val rep = br.bits(2)
              if (rep < 0 || k + 3 + rep > lens.length) return null
              val prev = lens(k - 1)
              var j = 0
              while (j < 3 + rep) { lens(k) = prev; k += 1; j += 1 }
            } else if (s == 17) {
              val rep = br.bits(3)
              if (rep < 0 || k + 3 + rep > lens.length) return null
              k += 3 + rep
            } else {
              val rep = br.bits(7)
              if (rep < 0 || k + 11 + rep > lens.length) return null
              k += 11 + rep
            }
          }
          if (lens(256) == 0) return null // no end-of-block code
          val litH = new Huff(java.util.Arrays.copyOfRange(lens, 0, nlit))
          val distH = new Huff(
            java.util.Arrays.copyOfRange(lens, nlit, nlit + ndist))
          if (litH.bad || distH.bad) return null
          val r = block(litH, distH, br, out, outLen)
          if (r < 0) return null
          outLen = r
        case _ => return null // type 3 reserved (or stream exhausted)
      }
    }
    if (outLen != outSize) return null
    out
  }

  /** Decode one Huffman block's symbols into `out`; new length or -1. */
  private def block(litH: Huff, distH: Huff, br: Bits, out: Array[Byte],
      outLen0: Int): Int = {
    var outLen = outLen0
    while (true) {
      val s = decodeSym(litH, br)
      if (s < 0) return -1
      if (s < 256) {
        if (outLen >= out.length) return -1
        out(outLen) = s.toByte
        outLen += 1
      } else if (s == 256) return outLen
      else {
        if (s > 285) return -1
        val li = s - 257
        val ex = br.bits(LExtra(li))
        if (ex < 0) return -1
        val len = LBase(li) + ex
        val d = decodeSym(distH, br)
        if (d < 0 || d > 31) return -1
        val dex = br.bits(DExtra(d))
        if (dex < 0) return -1
        val dist = DBase(d) + dex
        if (dist > outLen || outLen + len > out.length) return -1
        var j = 0
        while (j < len) { // byte-wise: overlapping copies replicate
          out(outLen) = out(outLen - dist)
          outLen += 1
          j += 1
        }
      }
    }
    -1
  }

  /** Greedy deflate64 COMPRESSOR over the full 64 KiB window and
    * 65538-byte match ceiling, emitted as one fixed-Huffman block —
    * the write side commons-compress lacks (its Deflate64 support is
    * read-only), pinned by its reader cross-reading every member.
    */
  private[graft] def encode(data: Array[Byte]): Array[Byte] = {
    val ops = Seq.newBuilder[(Int, Int)]
    LzGreedy.compress(data, 65536, 4, 65538)(lit => ops += ((lit, 0))) {
      (matched, dist) => ops += ((matched, dist))
    }
    fixedBlock(ops.result())
  }

  /** A single final FIXED-Huffman deflate64 block from literal/match
    * ops — the write side for the extension pins (every match is
    * emitted through code 285's 16 extra bits, so >258 lengths and
    * the 30/31 distance codes are actually exercised). Ops are
    * (byte, 0) literals or (len, dist) matches with len >= 3.
    */
  private[graft] def fixedBlock(ops: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(v: Int, k: Int): Unit = { // LSB-first stream order
      bitBuf |= (v.toLong & ((1L << k) - 1)) << bitCnt
      bitCnt += k
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def putCode(code: Int, len: Int): Unit = { // Huffman codes MSB-first
      var k = len - 1
      while (k >= 0) { putBits((code >> k) & 1, 1); k -= 1 }
    }
    def putLit(s: Int): Unit =
      if (s < 144) putCode(0x30 + s, 8)
      else if (s < 256) putCode(0x190 + (s - 144), 9)
      else if (s < 280) putCode(s - 256, 7)
      else putCode(0xC0 + (s - 280), 8)
    putBits(1, 1) // final
    putBits(1, 2) // fixed
    ops.foreach {
      case (lit, 0) => putLit(lit & 0xFF)
      case (len, dist) =>
        require(len >= 3 && len <= 65538 && dist >= 1 && dist <= 65536)
        putLit(285)
        putBits(len - 3, 16)
        var d = 31
        while (DBase(d) > dist) d -= 1
        putCode(d, 5)
        putBits(dist - DBase(d), DExtra(d))
    }
    putLit(256)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }
}
