package graft.operators

/** From-scratch raw-Snappy codec (the google/snappy format
  * description): varint uncompressed length, then tagged elements —
  * literals (6-bit length with 1-4 extra LE length bytes past 60)
  * and copies in the three offset widths (1-byte with the 3-bit
  * length field, 2-byte LE, 4-byte LE). Avro's "snappy" codec and
  * Parquet pages carry exactly this stream. Pinned BOTH directions
  * against snappy-java. Degrade-don't-throw: null on damage.
  */
object Snappy {

  /** Decode a raw stream; null on damage, `cap` bounds expansion. */
  def decode(b: Array[Byte], cap: Long = 1L << 30): Array[Byte] = try {
    if (b == null || b.isEmpty) return null
    // varint length
    var p = 0
    var total = 0L
    var shift = 0
    var more = true
    while (more) {
      if (p >= b.length || shift > 35) return null
      val c = b(p) & 0xFF
      total |= (c & 0x7FL) << shift
      shift += 7
      p += 1
      more = (c & 0x80) != 0
    }
    if (total < 0 || total > cap) return null
    val out = new Array[Byte](total.toInt)
    var o = 0
    while (p < b.length) {
      val tag = b(p) & 0xFF
      p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >> 2) + 1
          if (len > 60) {
            val extra = len - 60
            if (p + extra > b.length) return null
            var v = 0L
            var k = 0
            while (k < extra) { v |= (b(p + k) & 0xFFL) << (8 * k); k += 1 }
            p += extra
            if (v < 0 || v > Int.MaxValue - 1) return null
            len = v.toInt + 1
          }
          if (p + len > b.length || o + len > out.length) return null
          System.arraycopy(b, p, out, o, len)
          p += len
          o += len
        case t =>
          var len = 0
          var off = 0
          t match {
            case 1 =>
              if (p >= b.length) return null
              len = ((tag >> 2) & 7) + 4
              off = ((tag >> 5) << 8) | (b(p) & 0xFF)
              p += 1
            case 2 =>
              if (p + 2 > b.length) return null
              len = (tag >> 2) + 1
              off = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
              p += 2
            case _ =>
              if (p + 4 > b.length) return null
              len = (tag >> 2) + 1
              off = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
                ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
              p += 4
          }
          if (off <= 0 || off > o || o + len > out.length) return null
          var k = 0
          while (k < len) { // byte-wise: overlaps replicate
            out(o) = out(o - off)
            o += 1
            k += 1
          }
      }
    }
    if (o != out.length) return null
    out
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** Encode raw Snappy: greedy matches through the shared matcher,
    * emitted as 2-byte-offset copies (64-byte elements), literals
    * batched between them.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    // varint length
    var v = data.length.toLong
    do {
      val g = (v & 0x7F).toInt
      v >>>= 7
      out.write(if (v != 0) g | 0x80 else g)
    } while (v != 0)
    val lit = new java.io.ByteArrayOutputStream(64)
    def flushLit(): Unit = {
      if (lit.size() == 0) return
      val l = lit.toByteArray
      var q = 0
      while (q < l.length) {
        val n = math.min(l.length - q, 60) // 6-bit form only
        out.write((n - 1) << 2)
        out.write(l, q, n)
        q += n
      }
      lit.reset()
    }
    LzGreedy.compress(data, 65535, 4, 1 << 20)(lit.write) { (len, dist) =>
      flushLit()
      var remaining = len
      while (remaining > 0) {
        // a copy element carries 4..64 bytes; keep the tail >= 4
        val take =
          if (remaining > 64) math.min(64, remaining - 4) else remaining
        out.write(((take - 1) << 2) | 2)
        out.write(dist & 0xFF)
        out.write((dist >> 8) & 0xFF)
        remaining -= take
      }
    }
    flushLit()
    out.toByteArray
  }
}
