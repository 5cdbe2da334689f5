package graft.operators

/** From-scratch NumPy `.npy` / `.npz` readers — the format embedding
  * dumps and feature matrices actually ship in.
  *
  * `.npy` (the public numpy format spec): magic `\x93NUMPY`, version
  * (1.0 header-length u16 LE / 2.0 u32 LE), then the header DICT in
  * Python-literal syntax — `{'descr': '<i4', 'fortran_order': False,
  * 'shape': (3, 4), }` — parsed by a from-scratch reader for exactly
  * that literal subset, then the raw array data. Dtypes: little- and
  * big-endian i1/i2/i4/i8, u1, f4/f8, and bool; Fortran order is
  * honored by index arithmetic. Object/structured dtypes are named
  * profile gaps.
  *
  * `.npz` is a ZIP of `.npy` members — the existing [[Zip]] walk
  * composes. Pinned BOTH directions against real numpy via python3
  * (live-gated in the spec). Null on damage.
  */
object Npy {

  /** One decoded array: shape, C-order flattened values (widened to
    * Double for floats/bools, exact Long for ints).
    */
  final case class NpArray(shape: Array[Int], dtype: String,
      longs: Array[Long], doubles: Array[Double]) {
    def n: Int = if (longs != null) longs.length else doubles.length
  }

  def isNpy(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 && (b(0) & 0xFF) == 0x93 &&
      b(1) == 'N' && b(2) == 'U' && b(3) == 'M' && b(4) == 'P' && b(5) == 'Y'

  // ---- the header dict (python literal subset) -------------------------

  /** Parse `{'descr': '<i4', 'fortran_order': False, 'shape': (2, 3)}`;
    * returns (descr, fortran, shape) or null.
    */
  private[graft] def headerDict(s0: String): (String, Boolean, Array[Int]) = {
    val s = s0.trim
    if (!s.startsWith("{") || !s.endsWith("}")) return null
    var descr: String = null
    var fortran = false
    var fortranSeen = false
    var shape: Array[Int] = null
    var p = 1
    def ws(): Unit = while (p < s.length &&
      Character.isWhitespace(s.charAt(p))) p += 1
    def pyStr(): String = {
      ws()
      if (p >= s.length || (s.charAt(p) != '\'' && s.charAt(p) != '"'))
        return null
      val q = s.charAt(p)
      p += 1
      val e = s.indexOf(q, p)
      if (e < 0) return null
      val r = s.substring(p, e)
      p = e + 1
      r
    }
    def finish(): (String, Boolean, Array[Int]) =
      if (descr == null || shape == null || !fortranSeen) null
      else (descr, fortran, shape)
    while (p < s.length - 1) {
      ws()
      if (s.charAt(p) == ',') { p += 1 }
      else if (s.charAt(p) == '}') return finish()
      else {
        val key = pyStr()
        if (key == null) return null
        ws()
        if (p >= s.length || s.charAt(p) != ':') return null
        p += 1
        ws()
        key match {
          case "descr" =>
            descr = pyStr()
            if (descr == null) return null
          case "fortran_order" =>
            if (s.startsWith("False", p)) { fortran = false; p += 5 }
            else if (s.startsWith("True", p)) { fortran = true; p += 4 }
            else return null
            fortranSeen = true
          case "shape" =>
            if (s.charAt(p) != '(') return null
            p += 1
            val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
            var doneT = false
            while (!doneT) {
              ws()
              if (p >= s.length) return null
              if (s.charAt(p) == ')') { p += 1; doneT = true }
              else if (s.charAt(p) == ',') p += 1
              else {
                val st = p
                while (p < s.length && s.charAt(p).isDigit) p += 1
                if (p == st) return null
                val v = java.lang.Long.parseLong(s.substring(st, p))
                if (v < 0 || v > Int.MaxValue) return null
                dims += v.toInt
              }
            }
            shape = dims.toArray
          case _ => return null // unknown key: out of spec
        }
      }
    }
    finish()
  }

  /** Decode one `.npy` blob; null on damage or an out-of-subset
    * dtype (distinguish via [[unsupportedProfile]]).
    */
  def read(b: Array[Byte]): NpArray = try {
    if (!isNpy(b)) return null
    val major = b(6) & 0xFF
    val (hLen, dataStart0) =
      if (major == 1) ((b(8) & 0xFF) | ((b(9) & 0xFF) << 8), 10)
      else if (major == 2 || major == 3) {
        if (b.length < 12) return null
        (((b(8) & 0xFF) | ((b(9) & 0xFF) << 8) | ((b(10) & 0xFF) << 16) |
          ((b(11) & 0xFF) << 24)), 12)
      } else return null
    if (hLen < 0 || dataStart0 + hLen > b.length) return null
    val hd = headerDict(new String(b, dataStart0, hLen,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    if (hd == null) return null
    val (descr, fortran, shape) = hd
    val data = dataStart0 + hLen
    var count = 1L
    shape.foreach(d => count *= d)
    if (count < 0 || count > (1L << 28)) return null
    val little = !descr.startsWith(">")
    val code = descr.stripPrefix("<").stripPrefix(">")
      .stripPrefix("=").stripPrefix("|")
    val width = code match {
      case "i1" | "u1" | "b1" => 1
      case "i2" => 2
      case "i4" | "f4" => 4
      case "i8" | "f8" => 8
      case _ => return null // object/structured/unicode: named gap
    }
    if (data + count * width > b.length) return null
    // C-order output index -> source element index (fortran storage
    // permutes): decompose via C strides, recompose via F strides
    val cStrides: Array[Long] = {
      val st = new Array[Long](shape.length)
      var acc = 1L
      for (d <- shape.indices.reverse) { st(d) = acc; acc *= shape(d) }
      st
    }
    val fStrides: Array[Long] = {
      val st = new Array[Long](shape.length)
      var acc = 1L
      for (d <- shape.indices) { st(d) = acc; acc *= shape(d) }
      st
    }
    def srcIndex(ci: Long): Long =
      if (!fortran || shape.length <= 1) ci
      else {
        var rem = ci
        var fi = 0L
        for (d <- shape.indices) {
          fi += (rem / cStrides(d)) * fStrides(d)
          rem %= cStrides(d)
        }
        fi
      }
    def rawAt(idx: Long): Long = {
      val off = (data + idx * width).toInt
      var v = 0L
      if (little)
        for (k <- width - 1 to 0 by -1) v = (v << 8) | (b(off + k) & 0xFFL)
      else
        for (k <- 0 until width) v = (v << 8) | (b(off + k) & 0xFFL)
      v
    }
    def signed(v: Long): Long = {
      val shift = 64 - 8 * width
      (v << shift) >> shift
    }
    val isFloat = code == "f4" || code == "f8"
    val isBool = code == "b1"
    val isUnsigned = code == "u1"
    val longs = if (isFloat) null else new Array[Long](count.toInt)
    val doubles = if (isFloat) new Array[Double](count.toInt) else null
    var i = 0L
    while (i < count) {
      val v = rawAt(srcIndex(i))
      if (isFloat) {
        doubles(i.toInt) =
          if (width == 4) java.lang.Float.intBitsToFloat(v.toInt).toDouble
          else java.lang.Double.longBitsToDouble(v)
      } else if (isBool) {
        if (v != 0 && v != 1) return null
        longs(i.toInt) = v
      } else if (isUnsigned) longs(i.toInt) = v
      else longs(i.toInt) = signed(v)
      i += 1
    }
    NpArray(shape, code, longs, doubles)
  } catch {
    case _: IndexOutOfBoundsException => null
    case _: NumberFormatException => null
  }

  /** Structurally-sound `.npy` naming a dtype outside the subset. */
  def unsupportedProfile(b: Array[Byte]): Boolean = try {
    if (!isNpy(b)) return false
    val major = b(6) & 0xFF
    val (hLen, ds) =
      if (major == 1) ((b(8) & 0xFF) | ((b(9) & 0xFF) << 8), 10)
      else (((b(8) & 0xFF) | ((b(9) & 0xFF) << 8) | ((b(10) & 0xFF) << 16) |
        ((b(11) & 0xFF) << 24)), 12)
    if (hLen < 0 || ds + hLen > b.length) return false
    val hd = headerDict(new String(b, ds, hLen,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    hd != null && {
      val code = hd._1.stripPrefix("<").stripPrefix(">")
        .stripPrefix("=").stripPrefix("|")
      // object dtype decodes via the Pickle walk since r10 — failures
      // there are damage, not a profile gap
      !Set("i1", "u1", "b1", "i2", "i4", "i8", "f4", "f8",
        "O", "O8").contains(code)
    }
  } catch { case _: IndexOutOfBoundsException => false }

  /** All `.npy` members of an `.npz` (a ZIP of arrays), by member
    * name with the `.npy` suffix stripped (numpy's convention).
    */
  def npz(b: Array[Byte]): Array[(String, NpArray)] = {
    val members = Zip.members(b)
    if (members == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, NpArray)]
    members.foreach { case (name, data) =>
      val arr = read(data)
      if (arr == null) return null
      out += ((name.stripSuffix(".npy"), arr))
    }
    out.toArray
  }

  /** Elements of an OBJECT-dtype `.npy` (descr `|O` / `|O8`): the data
    * section is a pickle of the ndarray (numpy's write_array falls
    * back to `pickle.dump`), walked STRUCTURALLY by [[Pickle]] — the
    * `_reconstruct` + BUILD state carries the element list. Returns
    * (shape, elements) or null on damage / non-object dtype. Closes
    * the named object-dtype profile gap.
    */
  def readObjects(b: Array[Byte]): (Array[Long], Vector[Pickle.V]) = try {
    if (!isNpy(b)) return null
    val major = b(6) & 0xFF
    val (hLen, ds) =
      if (major == 1) ((b(8) & 0xFF) | ((b(9) & 0xFF) << 8), 10)
      else if (major == 2 || major == 3) {
        if (b.length < 12) return null
        (((b(8) & 0xFF) | ((b(9) & 0xFF) << 8) | ((b(10) & 0xFF) << 16) |
          ((b(11) & 0xFF) << 24)), 12)
      } else return null
    if (hLen < 0 || ds + hLen > b.length) return null
    val hd = headerDict(new String(b, ds, hLen,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    if (hd == null) return null
    val code = hd._1.stripPrefix("<").stripPrefix(">")
      .stripPrefix("=").stripPrefix("|")
    if (code != "O" && code != "O8") return null
    val tree = Pickle.parse(
      java.util.Arrays.copyOfRange(b, ds + hLen, b.length))
    if (tree == null) return null
    Pickle.ndarrayElements(tree)
  } catch { case _: IndexOutOfBoundsException => null }

  // ---- write side ------------------------------------------------------

  /** A real v1.0 `.npy` from longs (dtype `<i8`) or doubles
    * (`<f8`), C order.
    */
  def synthNpy(shape: Array[Int], longs: Array[Long],
      doubles: Array[Double]): Array[Byte] = {
    require((longs == null) != (doubles == null))
    val n = shape.product
    require(n == (if (longs != null) longs.length else doubles.length))
    val descr = if (longs != null) "<i8" else "<f8"
    val shapeStr = shape.length match {
      case 1 => s"(${shape(0)},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict =
      s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    // pad the header so data starts 64-aligned (the spec's rule)
    val base = 10 + dict.length + 1 // +1 for the trailing newline
    val pad = (64 - base % 64) % 64
    val hLen = dict.length + pad + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93); out.write('N'); out.write('U'); out.write('M')
    out.write('P'); out.write('Y')
    out.write(1); out.write(0)
    out.write(hLen & 0xFF); out.write((hLen >> 8) & 0xFF)
    out.write(dict.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    for (_ <- 0 until pad) out.write(' ')
    out.write('\n')
    def w64(v: Long): Unit =
      for (k <- 0 until 8) out.write(((v >> (8 * k)) & 0xFF).toInt)
    if (longs != null) longs.foreach(w64)
    else doubles.foreach(d => w64(java.lang.Double.doubleToLongBits(d)))
    out.toByteArray
  }

  /** An OBJECT-dtype `.npy`: `|O` header + a protocol-2 pickle of the
    * ndarray in numpy's own `_reconstruct` + BUILD shape (state =
    * (1, shape, dtype, False, elements)). Elements: null, Long (int32
    * range), String. The live numpy pin reads these back with
    * `np.load(allow_pickle=True)`.
    */
  def synthObjectNpy(shape: Array[Int], elements: Seq[Any]): Array[Byte] = {
    require(shape.product == elements.length)
    val pk = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = pk.write(v & 0xFF)
    def raw(s: String): Unit =
      pk.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    def le32(v: Long): Unit = {
      var k = 0; while (k < 4) { u8(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    def str(s: String): Unit = {
      val d = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u8('X'); le32(d.length); pk.write(d)
    }
    u8(0x80); u8(2)
    raw("cnumpy.core.multiarray\n_reconstruct\n")
    raw("cnumpy\nndarray\n")
    u8('K'); u8(0); u8(0x85) // (0,)
    u8(0x43); u8(1); u8('b') // b'b'
    u8(0x87) // TUPLE3 args
    u8('R') // _reconstruct(...)
    // state tuple: MARK, 5 items, 't'
    u8('(')
    u8('K'); u8(1) // version
    u8('(') // shape tuple
    shape.foreach { d => require(d >= 0 && d < 65536); u8('M'); u8(d & 0xFF); u8((d >> 8) & 0xFF) }
    u8('t')
    raw("cnumpy\ndtype\n") // dtype('O8')
    str("O8"); u8(0x89); u8(0x88)
    u8(0x87); u8('R')
    u8(0x89) // fortran_order = False
    u8(']'); u8('(') // elements
    elements.foreach {
      case null => u8('N')
      case n: Long => u8('J'); le32(n)
      case s: String => str(s)
      case other => throw new IllegalArgumentException(other.getClass.getName)
    }
    u8('e')
    u8('t') // close the state tuple
    u8('b') // BUILD
    u8('.')
    val pickle = pk.toByteArray
    // |O header, v1.0 framing
    val shapeStr = shape.length match {
      case 1 => s"(${shape(0)},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict =
      s"{'descr': '|O', 'fortran_order': False, 'shape': $shapeStr, }"
    val base = 10 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val hLen = dict.length + pad + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93); out.write('N'); out.write('U'); out.write('M')
    out.write('P'); out.write('Y')
    out.write(1); out.write(0)
    out.write(hLen & 0xFF); out.write((hLen >> 8) & 0xFF)
    out.write(dict.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    for (_ <- 0 until pad) out.write(' ')
    out.write('\n')
    out.write(pickle)
    out.toByteArray
  }

  /** A real `.npz`: a STORED zip of `.npy` members. */
  def synthNpz(arrays: Seq[(String, Array[Byte])]): Array[Byte] =
    Zip.synthZip(arrays.map { case (n, d) => (n + ".npy", d, false) })
}
