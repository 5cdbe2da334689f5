package graft.operators

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Python pickle STRUCTURAL decoder — protocols 0 through 5 of the
  * documented opcode machine (CPython's pickletools is the public
  * spec). Structural means: container and scalar opcodes evaluate for
  * real (ints, longs, floats, strings, bytes, bools, None, lists,
  * tuples, dicts, sets, the memo, MARK arithmetic, FRAMEs), while
  * object construction (GLOBAL/STACK_GLOBAL, REDUCE, NEWOBJ, BUILD)
  * produces OPAQUE nodes recording the callable and arguments instead
  * of executing anything — a pickle can therefore be read as DATA with
  * zero code execution, which is the only safe way to touch crawled
  * pickles. Out-of-subset opcodes (persistent ids, extension registry,
  * out-of-band buffers) are named profile gaps, not damage.
  *
  * Why it exists: numpy saves `dtype=object` arrays as a pickle of the
  * ndarray (`_reconstruct` + BUILD with the element list in the state
  * tuple) — [[ndarrayElements]] walks exactly that shape, closing
  * [[Npy]]'s object-dtype named gap.
  *
  * Live-pinned against python3's own pickle module (all six
  * protocols), like the sqlite3/email/numpy pins; [[synthPickle]]
  * writes protocol 0/2/4 streams for the corpus. Bomb caps: 1M stack
  * nodes, 64 MiB strings, depth via memo/container caps.
  */
object Pickle {

  sealed trait V
  case object PNone extends V
  final case class PBool(b: Boolean) extends V
  final case class PInt(v: Long) extends V
  final case class PBig(v: BigInt) extends V
  final case class PFloat(v: Double) extends V
  final case class PStr(s: String) extends V
  final case class PBytes(b: Array[Byte]) extends V
  /** Mutable buffers: APPENDS/SETITEMS mutate the SAME node the memo
    * holds, as in CPython.
    */
  final class PList(val items: scala.collection.mutable.ArrayBuffer[V]) extends V
  final class PDict(val items: scala.collection.mutable.ArrayBuffer[(V, V)]) extends V
  final class PSet(val items: scala.collection.mutable.ArrayBuffer[V]) extends V
  final case class PTuple(items: Vector[V]) extends V
  final case class PGlobal(module: String, name: String) extends V
  /** `callable(*args)` — recorded, never executed. */
  final case class PReduce(callable: V, args: V) extends V
  /** `obj.__setstate__(state)` — recorded, never executed. */
  final case class PBuild(obj: V, state: V) extends V

  private final class Err(msg: String)
    extends RuntimeException(msg, null, false, false)
  private final class Unsupported(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw new Err(msg)

  /** Parse one pickle; null on damage OR out-of-subset opcodes
    * (distinguish via [[unsupportedProfile]]).
    */
  def parse(b: Array[Byte]): V =
    try parseOrThrow(b)
    catch { case _: RuntimeException => null }

  /** True when parsing fails ONLY because of a named out-of-subset
    * opcode (persistent ids, extensions, out-of-band buffers).
    */
  def unsupportedProfile(b: Array[Byte]): Boolean =
    try { parseOrThrow(b); false }
    catch {
      case _: Unsupported => true
      case _: RuntimeException => false
    }

  private[graft] def parseOrThrow(b: Array[Byte]): V = {
    var p = 0
    def u8(): Int = {
      if (p >= b.length) fail("eof")
      val v = b(p) & 0xFF; p += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def u32(): Long = i32() & 0xFFFFFFFFL
    def u64(): Long = { var v = 0L; var k = 0; while (k < 8) { v |= u8().toLong << (8 * k); k += 1 }; v }
    def take(n: Long): Array[Byte] = {
      if (n < 0 || n > (1 << 26) || n > b.length - p) fail("bytes")
      val r = java.util.Arrays.copyOfRange(b, p, p + n.toInt); p += n.toInt; r
    }
    def line(): String = {
      val s = p
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length) fail("line eof")
      val r = new String(b, s, p - s, ISO_8859_1); p += 1; r
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[V]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val memo = new java.util.HashMap[Long, V]()
    def push(v: V): Unit = {
      if (stack.length > (1 << 20)) fail("stack bomb")
      stack += v
    }
    def pop(): V = {
      if (stack.isEmpty) fail("underflow")
      stack.remove(stack.length - 1)
    }
    def popMark(): Vector[V] = {
      if (marks.isEmpty) fail("no mark")
      val m = marks.remove(marks.length - 1)
      if (m > stack.length) fail("mark bounds")
      val items = stack.slice(m, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }
    def signedLE(d: Array[Byte]): V = {
      if (d.isEmpty) return PInt(0)
      // little-endian two's complement
      var big = BigInt(0)
      var k = d.length - 1
      while (k >= 0) { big = (big << 8) | BigInt(d(k) & 0xFF); k -= 1 }
      if ((d(d.length - 1) & 0x80) != 0) big -= BigInt(1) << (8 * d.length)
      if (big.isValidLong) PInt(big.toLong) else PBig(big)
    }
    var steps = 0
    while (true) {
      steps += 1
      if (steps > (1 << 22)) fail("op bomb")
      (u8(): @annotation.switch) match {
        case 0x80 => u8() // PROTO
        case 0x95 => u64() // FRAME length: framing only
        case '.' =>
          return pop()
        case 'N' => push(PNone)
        case 0x88 => push(PBool(true))
        case 0x89 => push(PBool(false))
        case 'K' => push(PInt(u8()))
        case 'M' => push(PInt(u16()))
        case 'J' => push(PInt(i32()))
        case 0x8a => push(signedLE(take(u8())))
        case 0x8b => push(signedLE(take(u32())))
        case 'L' => // proto-0 LONG: digits + optional trailing 'L'
          val s = line().stripSuffix("L")
          push(try {
            val big = BigInt(s)
            if (big.isValidLong) PInt(big.toLong) else PBig(big)
          } catch { case _: NumberFormatException => fail("long") })
        case 'I' =>
          line() match {
            case "01" => push(PBool(true))
            case "00" => push(PBool(false))
            case s => push(try PInt(s.toLong)
              catch { case _: NumberFormatException => fail("int") })
          }
        case 'G' => // BINFLOAT: big-endian IEEE double
          var v = 0L; var k = 0
          while (k < 8) { v = (v << 8) | u8(); k += 1 }
          push(PFloat(java.lang.Double.longBitsToDouble(v)))
        case 'F' => push(try PFloat(line().toDouble)
          catch { case _: NumberFormatException => fail("float") })
        case 0x8c => push(PStr(new String(take(u8()), UTF_8)))
        case 'X' => push(PStr(new String(take(u32()), UTF_8)))
        case 0x8d => push(PStr(new String(take(u64()), UTF_8)))
        case 'V' => // proto-0 UNICODE, raw-unicode-escape decoding:
          // backslash-uXXXX / -UXXXXXXXX are escapes, any other
          // backslash is literal (CPython's codec rule — pickle
          // pre-escapes real backslashes as \)
          val s = line()
          if (!s.contains('\\')) push(PStr(s))
          else {
            val sb = new StringBuilder
            var i = 0
            while (i < s.length) {
              val c = s.charAt(i)
              if (c == '\\' && i + 5 < s.length && s.charAt(i + 1) == 'u') {
                val cp = try Integer.parseInt(s.substring(i + 2, i + 6), 16)
                  catch { case _: NumberFormatException => fail("u escape") }
                sb.append(cp.toChar); i += 6
              } else if (c == '\\' && i + 9 < s.length && s.charAt(i + 1) == 'U') {
                val cp = try Integer.parseInt(s.substring(i + 2, i + 10), 16)
                  catch { case _: NumberFormatException => fail("U escape") }
                sb.appendAll(Character.toChars(cp)); i += 10
              } else { sb.append(c); i += 1 }
            }
            push(PStr(sb.toString))
          }
        case 'S' => // proto-0 STRING: repr with quotes + backslash escapes
          val s = line()
          if (s.length < 2 || s.head != s.last ||
              (s.head != '\'' && s.head != '"')) fail("str repr")
          val body = s.substring(1, s.length - 1)
          val sb = new StringBuilder
          var i = 0
          while (i < body.length) {
            val c = body.charAt(i)
            if (c == '\\' && i + 1 < body.length) {
              body.charAt(i + 1) match {
                case 'n' => sb.append('\n'); i += 2
                case 't' => sb.append('\t'); i += 2
                case 'r' => sb.append('\r'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case '\'' => sb.append('\''); i += 2
                case '"' => sb.append('"'); i += 2
                case 'x' =>
                  if (i + 3 >= body.length) fail("hex escape")
                  sb.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar)
                  i += 4
                case other => sb.append(other); i += 2
              }
            } else { sb.append(c); i += 1 }
          }
          push(PStr(sb.toString))
        case 'U' => push(PStr(new String(take(u8()), ISO_8859_1)))
        case 'T' => push(PStr(new String(take(u32()), ISO_8859_1)))
        case 0x43 => push(PBytes(take(u8())))
        case 'B' => push(PBytes(take(u32())))
        case 0x8e => push(PBytes(take(u64())))
        case 0x96 => push(PBytes(take(u64()))) // BYTEARRAY8: as bytes
        case ']' => push(new PList(scala.collection.mutable.ArrayBuffer.empty))
        case ')' => push(PTuple(Vector.empty))
        case '}' => push(new PDict(scala.collection.mutable.ArrayBuffer.empty))
        case 0x8f => push(new PSet(scala.collection.mutable.ArrayBuffer.empty))
        case '(' => marks += stack.length
        case 'l' =>
          push(new PList(scala.collection.mutable.ArrayBuffer.from(popMark())))
        case 't' => push(PTuple(popMark()))
        case 'd' =>
          val items = popMark()
          if (items.length % 2 != 0) fail("dict pairs")
          push(new PDict(scala.collection.mutable.ArrayBuffer.from(
            items.grouped(2).map(g => (g(0), g(1))))))
        case 0x85 => val a = pop(); push(PTuple(Vector(a)))
        case 0x86 => val b2 = pop(); val a = pop(); push(PTuple(Vector(a, b2)))
        case 0x87 =>
          val c = pop(); val b2 = pop(); val a = pop()
          push(PTuple(Vector(a, b2, c)))
        case 'a' =>
          val v = pop()
          stack.lastOption match {
            case Some(l: PList) => l.items += v
            case _ => fail("append target")
          }
        case 'e' =>
          val items = popMark()
          stack.lastOption match {
            case Some(l: PList) => l.items ++= items
            case _ => fail("appends target")
          }
        case 's' =>
          val v = pop(); val k = pop()
          stack.lastOption match {
            case Some(d: PDict) => d.items += ((k, v))
            case _ => fail("setitem target")
          }
        case 'u' =>
          val items = popMark()
          if (items.length % 2 != 0) fail("setitems pairs")
          stack.lastOption match {
            case Some(d: PDict) =>
              d.items ++= items.grouped(2).map(g => (g(0), g(1)))
            case _ => fail("setitems target")
          }
        case 0x90 => // ADDITEMS
          val items = popMark()
          stack.lastOption match {
            case Some(s2: PSet) => s2.items ++= items
            case _ => fail("additems target")
          }
        case 0x91 => // FROZENSET
          push(new PSet(scala.collection.mutable.ArrayBuffer.from(popMark())))
        case 'q' => memo.put(u8().toLong, stack.lastOption.getOrElse(fail("memo")))
        case 'r' => memo.put(u32(), stack.lastOption.getOrElse(fail("memo")))
        case 0x94 => memo.put(memo.size.toLong, stack.lastOption.getOrElse(fail("memo")))
        case 'p' => memo.put(line().toLong, stack.lastOption.getOrElse(fail("memo")))
        case 'g' =>
          val v = memo.get(line().toLong)
          if (v == null) fail("memo get"); push(v)
        case 'h' =>
          val v = memo.get(u8().toLong)
          if (v == null) fail("memo get"); push(v)
        case 'j' =>
          val v = memo.get(u32())
          if (v == null) fail("memo get"); push(v)
        case 'c' => push(PGlobal(line(), line()))
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          (module, name) match {
            case (PStr(m), PStr(n)) => push(PGlobal(m, n))
            case _ => fail("stack_global")
          }
        case 'R' => val args = pop(); val c = pop(); push(PReduce(c, args))
        case 0x81 => val args = pop(); val c = pop(); push(PReduce(c, args)) // NEWOBJ
        case 0x92 => // NEWOBJ_EX: cls, args, kwargs
          val kw = pop(); val args = pop(); val c = pop()
          push(PReduce(c, PTuple(Vector(args, kw))))
        case 'b' => val state = pop(); val obj = pop(); push(PBuild(obj, state))
        case '0' => pop()
        case '1' => popMark()
        case '2' => push(stack.lastOption.getOrElse(fail("dup")))
        case 'P' | 'Q' => throw new Unsupported("persistent id")
        case 0x82 | 0x83 | 0x84 => throw new Unsupported("extension registry")
        case 0x97 | 0x98 => throw new Unsupported("out-of-band buffer")
        case op => throw new Unsupported(s"opcode $op")
      }
    }
    fail("unreachable")
  }

  // ---- numpy object-ndarray interpretation --------------------------------

  /** The (shape, elements) of a pickled numpy OBJECT ndarray — the
    * `_reconstruct(ndarray, (0,), b'b')` REDUCE BUILDed with state
    * `(version, shape, dtype, fortran, element-list)`. Null when the
    * tree is not that shape.
    */
  def ndarrayElements(v: V): (Array[Long], Vector[V]) = v match {
    case PBuild(PReduce(PGlobal(m, "_reconstruct"), _), PTuple(state))
        if (m == "numpy.core.multiarray" || m == "numpy._core.multiarray") &&
          state.length == 5 =>
      val shape = state(1) match {
        case PTuple(dims) if dims.forall(_.isInstanceOf[PInt]) =>
          dims.map(_.asInstanceOf[PInt].v).toArray
        case _ => return null
      }
      state(4) match {
        case l: PList => (shape, l.items.toVector)
        case _ => null // raw-buffer state: a non-object dtype
      }
    case _ => null
  }

  // ---- synthetic writer ----------------------------------------------------

  /** Write a value tree as protocol 0, 2 or 4 (the shapes the corpus
    * cycles; the live python3 pin covers everything else). Accepts the
    * immutable subset: None/Boolean/Long/Double/String/Array[Byte]/
    * Seq (list)/Seq-of-(String, Any)-pairs (dict).
    */
  def synthPickle(v: Any, protocol: Int): Array[Byte] = {
    require(protocol == 0 || protocol == 2 || protocol == 4)
    val body = new java.io.ByteArrayOutputStream()
    var memoN = 0
    def raw(s: String): Unit = body.write(s.getBytes(ISO_8859_1))
    def u8(v0: Int): Unit = body.write(v0 & 0xFF)
    def le32(v0: Long): Unit = {
      var k = 0; while (k < 4) { u8(((v0 >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    def memoize(): Unit =
      if (protocol >= 4) u8(0x94)
      else if (protocol >= 2) { u8('q'); u8(memoN % 256) }
    def isDict(xs: Seq[_]): Boolean =
      xs.nonEmpty && xs.forall {
        case (_: String, _) => true
        case _ => false
      }
    def emit(x: Any): Unit = x match {
      case null => raw("N")
      case b: Boolean =>
        if (protocol == 0) raw(if (b) "I01\n" else "I00\n")
        else u8(if (b) 0x88 else 0x89)
      case n: Long =>
        if (protocol == 0) raw(s"I$n\n")
        else if (n >= 0 && n < 256) { u8('K'); u8(n.toInt) }
        else if (n >= 0 && n < 65536) { u8('M'); u8(n.toInt & 0xFF); u8((n >> 8).toInt) }
        else if (n >= Int.MinValue && n <= Int.MaxValue) { u8('J'); le32(n) }
        else {
          val big = BigInt(n)
          var nb = 1
          while (!(big >= -(BigInt(1) << (8 * nb - 1)) &&
              big < (BigInt(1) << (8 * nb - 1)))) nb += 1
          val tw = if (n < 0) big + (BigInt(1) << (8 * nb)) else big
          u8(0x8a); u8(nb)
          (0 until nb).foreach(k => u8(((tw >> (8 * k)) & 0xFF).toInt))
        }
      case d: Double =>
        if (protocol == 0) raw(s"F$d\n")
        else {
          u8('G')
          val bits = java.lang.Double.doubleToLongBits(d)
          var k = 7
          while (k >= 0) { u8(((bits >> (8 * k)) & 0xFF).toInt); k -= 1 }
        }
      case s: String =>
        if (protocol == 0) {
          val esc = s.flatMap {
            case '\\' => "\\\\"
            case '\'' => "\\'"
            case '\n' => "\\n"
            case c => c.toString
          }
          raw(s"S'$esc'\n")
        } else {
          val d = s.getBytes(UTF_8)
          if (protocol >= 4 && d.length < 256) { u8(0x8c); u8(d.length) }
          else { u8('X'); le32(d.length) }
          body.write(d)
        }
      case b: Array[Byte] =>
        if (protocol == 0) throw new IllegalArgumentException("bytes need proto 2+")
        if (protocol >= 4 && b.length < 256) { u8(0x43); u8(b.length) }
        else { u8('B'); le32(b.length) }
        body.write(b)
      case xs: Seq[_] if isDict(xs) =>
        if (protocol == 0) {
          raw("(d")
          xs.asInstanceOf[Seq[(Any, Any)]].foreach { case (k, v0) =>
            emit(k); emit(v0); raw("s")
          }
        } else {
          u8('}')
          memoize(); memoN += 1
          u8('(')
          xs.asInstanceOf[Seq[(Any, Any)]].foreach { case (k, v0) =>
            emit(k); emit(v0)
          }
          u8('u')
        }
      case xs: Seq[_] =>
        if (protocol == 0) {
          raw("(l")
          xs.foreach { e => emit(e); raw("a") }
        } else {
          u8(']')
          memoize(); memoN += 1
          u8('(')
          xs.foreach(emit)
          u8('e')
        }
      case other => throw new IllegalArgumentException(other.getClass.getName)
    }
    emit(v)
    raw(".")
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    if (protocol >= 2) { out.write(0x80); out.write(protocol) }
    if (protocol >= 4) {
      out.write(0x95) // FRAME
      var k = 0
      while (k < 8) { out.write(((payload.length.toLong >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    out.write(payload)
    out.toByteArray
  }
}
