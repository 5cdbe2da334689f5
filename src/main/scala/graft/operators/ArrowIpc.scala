package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch Arrow IPC reader — the columnar interchange format of
  * the ML data ecosystem (Feather V2 files, Arrow streams, flight
  * dumps). Implements the documented wire layout (arrow.apache.org
  * Columnar.rst + the flatbuffers wire format): a minimal flatbuffers
  * walker (root offsets, vtables, scalar/table/vector/string/struct
  * fields, unions), encapsulated-message framing (continuation marker,
  * 8-byte padded metadata and body, both pre-0.15 and current forms),
  * the FILE framing (ARROW1 magic, footer flatbuffer with its Block
  * index) and the STREAM framing (Schema message then RecordBatch
  * messages to EOS), Schema/Field/Type tables, and RecordBatch node +
  * buffer assembly with LSB-first validity bitmaps.
  *
  * Column subset — the shapes training-data tables actually use:
  * signed/unsigned Int 8/16/32/64, Float32/64, Bool, Utf8, Binary
  * (each nullable), with or without BodyCompression (LZ4-frame and
  * zstd buffer compression decode through the existing from-scratch
  * [[Lz4]]/[[Zstd]] cores). Named profile gaps, distinct from damage:
  * dictionary encoding, nested/list/struct/view types, big-endian
  * schemas.
  *
  * Pinned against the INDEPENDENT arrow-vector implementation on the
  * Spark classpath: ArrowFileWriter and ArrowStreamWriter bytes (both
  * framings, multiple batches, nulls, every subset type) must decode
  * value-exactly here (the write side is the interop pin; there is no
  * from-scratch encoder — the Xz posture). Degrade-don't-throw; bomb
  * caps: 1M rows/batch, 4096 columns, 1<<26-byte buffers.
  */
object ArrowIpc {

  private final class Err(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw new Err(msg)

  final case class ArrowTable(fieldNames: Array[String],
      fieldTypes: Array[String], rows: Array[Array[Any]])

  // ---- little-endian primitives -----------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = {
    if (i < 0 || i >= b.length) fail("oob")
    b(i) & 0xFF
  }
  private def i16(b: Array[Byte], i: Int): Int =
    (u8(b, i) | (u8(b, i + 1) << 8)).toShort.toInt
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def i64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFFL); k -= 1 }
    v
  }

  // ---- minimal flatbuffers walker -----------------------------------------

  /** A table position inside buffer `b`. Field lookup goes through the
    * vtable; 0 = field absent (default).
    */
  private final class Tab(val b: Array[Byte], val pos: Int) {
    private val vt = pos - i32(b, pos) // soffset: table -> vtable
    private val vtSize = u16(b, vt)
    /** Byte position of field `id`'s slot content, or 0 when absent. */
    def field(id: Int): Int = {
      val slot = 4 + id * 2
      if (slot + 2 > vtSize) return 0
      val off = u16(b, vt + slot)
      if (off == 0) 0 else pos + off
    }
    def byteF(id: Int, dflt: Int = 0): Int = {
      val f = field(id); if (f == 0) dflt else u8(b, f)
    }
    def shortF(id: Int, dflt: Int = 0): Int = {
      val f = field(id); if (f == 0) dflt else i16(b, f)
    }
    def intF(id: Int, dflt: Int = 0): Int = {
      val f = field(id); if (f == 0) dflt else i32(b, f)
    }
    def longF(id: Int, dflt: Long = 0L): Long = {
      val f = field(id); if (f == 0) dflt else i64(b, f)
    }
    def boolF(id: Int, dflt: Boolean = false): Boolean = {
      val f = field(id); if (f == 0) dflt else u8(b, f) != 0
    }
    def tableF(id: Int): Tab = {
      val f = field(id)
      if (f == 0) null else new Tab(b, f + i32(b, f))
    }
    def stringF(id: Int): String = {
      val f = field(id)
      if (f == 0) return null
      val s = f + i32(b, f)
      val n = i32(b, s)
      if (n < 0 || n > (1 << 26)) fail("fb string")
      new String(b, s + 4, n, UTF_8)
    }
    /** Vector start (position of element 0) and length. */
    def vectorF(id: Int): (Int, Int) = {
      val f = field(id)
      if (f == 0) return (0, 0)
      val v = f + i32(b, f)
      val n = i32(b, v)
      if (n < 0 || n > (1 << 22)) fail("fb vector")
      (v + 4, n)
    }
    def tableAt(vecStart: Int, idx: Int): Tab = {
      val p = vecStart + idx * 4
      new Tab(b, p + i32(b, p))
    }
  }

  private def root(b: Array[Byte], off: Int, len: Int): Tab = {
    if (len < 4) fail("fb root")
    new Tab(b, off + i32(b, off))
  }

  // ---- schema ----------------------------------------------------------

  /** (typeName, decoder kind). Kind encodes width/signedness compactly. */
  private final case class Col(name: String, tpe: String, nullable: Boolean)

  private def parseField(f: Tab): Col = {
    val name = Option(f.stringF(0)).getOrElse("")
    val nullable = f.boolF(1)
    val tt = f.byteF(2) // Type union tag (Schema.fbs enum order)
    val t = f.tableF(3)
    val tpe = tt match {
      case 2 => // Int
        val bw = if (t == null) 0 else t.intF(0)
        val signed = t != null && t.boolF(1)
        if (!Set(8, 16, 32, 64)(bw)) fail("int width")
        (if (signed) "i" else "u") + bw
      case 3 => // FloatingPoint
        (if (t == null) 2 else t.shortF(0)) match {
          case 1 => "f32"
          case 2 => "f64"
          case _ => fail("half floats: profile") // HALF: out of subset
        }
      case 4 => "bin"  // Binary
      case 5 => "utf8" // Utf8
      case 6 => "bool"
      case _ => fail("type profile") // nested/dict/view/...: named gap
    }
    val (_, nChildren) = f.vectorF(5)
    if (nChildren != 0) fail("children profile")
    if (f.field(4) != 0) fail("dictionary profile")
    Col(name, tpe, nullable)
  }

  private def parseSchema(s: Tab): Array[Col] = {
    if (s.shortF(0) != 0) fail("big-endian profile")
    val (vec, n) = s.vectorF(1)
    if (n < 0 || n > 4096) fail("field count")
    Array.tabulate(n)(i => parseField(s.tableAt(vec, i)))
  }

  // ---- record batch ----------------------------------------------------

  private def bitSet(validity: Array[Byte], row: Int): Boolean =
    (validity(row >> 3) & (1 << (row & 7))) != 0

  /** Decode one RecordBatch message against `cols`; appends rows. */
  private def decodeBatch(meta: Tab, body: Array[Byte], cols: Array[Col],
      rows: scala.collection.mutable.ArrayBuffer[Array[Any]]): Unit = {
    val nRows = meta.longF(0)
    if (nRows < 0 || nRows > (1 << 20)) fail("row bomb")
    // BodyCompression (codec 0 = LZ4 frame, 1 = zstd; method BUFFER):
    // each body buffer is [int64 LE uncompressed length][compressed
    // bytes], -1 marking a raw passthrough buffer — decoded through
    // the existing from-scratch Lz4/Zstd cores.
    val codec: Int = meta.tableF(3) match {
      case null => -1
      case bc =>
        if (bc.byteF(1) != 0) fail("compression method profile")
        bc.byteF(0) match {
          case c @ (0 | 1) => c
          case _           => fail("compression profile")
        }
    }
    val (nodesV, nNodes) = meta.vectorF(1)   // FieldNode structs: 16 B
    val (bufsV, nBufs) = meta.vectorF(2)     // Buffer structs: 16 B
    if (nNodes != cols.length) fail("node count")
    var bufIdx = 0
    def nextBuf(): (Long, Long) = {
      if (bufIdx >= nBufs) fail("buffer count")
      val p = bufsV + bufIdx * 16
      bufIdx += 1
      (i64(meta.b, p), i64(meta.b, p + 8))
    }
    def slice(off: Long, len: Long): Array[Byte] = {
      if (off < 0 || len < 0 || len > (1 << 26) || off + len > body.length)
        fail("buffer bounds")
      val raw = java.util.Arrays.copyOfRange(body, off.toInt, (off + len).toInt)
      if (codec < 0 || raw.length == 0) return raw
      if (raw.length < 8) fail("compressed buffer short")
      val unLen = i64(raw, 0)
      val payload = java.util.Arrays.copyOfRange(raw, 8, raw.length)
      if (unLen == -1L) return payload // stored raw (already-small buffer)
      if (unLen < 0 || unLen > (1 << 26)) fail("uncompressed bounds")
      val out = codec match {
        case 0 => Lz4.decode(payload, unLen + 1)
        case _ => Zstd.decode(payload)
      }
      if (out == null || out.length != unLen) fail("buffer codec")
      out
    }
    val n = nRows.toInt
    val colVals = cols.zipWithIndex.map { case (c, ci) =>
      val nodeP = nodesV + ci * 16
      val nullCount = i64(meta.b, nodeP + 8)
      val (vOff, vLen) = nextBuf()
      val validity =
        if (vLen == 0) null // all valid
        else slice(vOff, vLen)
      def valid(r: Int): Boolean =
        validity == null || (validity.length > (r >> 3) && bitSet(validity, r))
      c.tpe match {
        case "utf8" | "bin" =>
          val (oOff, oLen) = nextBuf()
          val (dOff, dLen) = nextBuf()
          val offs = slice(oOff, oLen)
          val data = slice(dOff, dLen)
          // post-slice: slice() may have DECOMPRESSED the buffer
          if (offs.length < (n + 1).toLong * 4 && n > 0) fail("offsets short")
          Array.tabulate[Any](n) { r =>
            if (!valid(r)) null
            else {
              val a = i32(offs, r * 4); val b2 = i32(offs, (r + 1) * 4)
              if (a < 0 || b2 < a || b2 > data.length) fail("offset bounds")
              if (c.tpe == "utf8") new String(data, a, b2 - a, UTF_8)
              else java.util.Arrays.copyOfRange(data, a, b2)
            }
          }
        case "bool" =>
          val (dOff, dLen) = nextBuf()
          val data = slice(dOff, dLen)
          Array.tabulate[Any](n) { r =>
            if (!valid(r)) null
            else data.length > (r >> 3) && bitSet(data, r)
          }
        case other =>
          val (dOff, dLen) = nextBuf()
          val data = slice(dOff, dLen)
          val width = other match {
            case "i8" | "u8" => 1
            case "i16" | "u16" => 2
            case "i32" | "u32" | "f32" => 4
            case _ => 8
          }
          if (data.length < n.toLong * width) fail("data short")
          Array.tabulate[Any](n) { r =>
            if (!valid(r)) null
            else other match {
              case "i8"  => u8(data, r).toByte.toLong
              case "u8"  => u8(data, r).toLong
              case "i16" => i16(data, r * 2).toLong
              case "u16" => u16(data, r * 2).toLong
              case "i32" => i32(data, r * 4).toLong
              case "u32" => i32(data, r * 4).toLong & 0xFFFFFFFFL
              case "i64" => i64(data, r * 8)
              case "u64" => i64(data, r * 8) // caller knows the tag
              case "f32" => java.lang.Float.intBitsToFloat(i32(data, r * 4)).toDouble
              case "f64" => java.lang.Double.longBitsToDouble(i64(data, r * 8))
              case _     => fail("width")
            }
          }
      }
    }
    var r = 0
    while (r < n) {
      rows += Array.tabulate[Any](cols.length)(ci => colVals(ci)(r))
      r += 1
    }
  }

  // ---- message framing ---------------------------------------------------

  /** Read one encapsulated message at `p`: (Message table, body slice,
    * next position); null message on EOS.
    */
  private def message(b: Array[Byte], p0: Int): (Tab, Array[Byte], Int) = {
    var p = p0
    if (p + 4 > b.length) fail("eof")
    var metaLen = i32(b, p)
    p += 4
    if (metaLen == -1) { // continuation marker, current framing
      if (p + 4 > b.length) fail("eof")
      metaLen = i32(b, p)
      p += 4
    }
    if (metaLen == 0) return (null, null, p) // EOS
    if (metaLen < 0 || metaLen > (1 << 24) || p + metaLen > b.length)
      fail("meta bounds")
    val msg = root(b, p, metaLen)
    p += metaLen
    val bodyLen = msg.longF(3)
    if (bodyLen < 0 || bodyLen > (1 << 26) || p + bodyLen > b.length)
      fail("body bounds")
    val body = java.util.Arrays.copyOfRange(b, p, (p + bodyLen).toInt)
    p += bodyLen.toInt
    // bodies are 8-byte padded on the wire; bodyLength already includes
    // the writer's padding in every arrow-vector version we pin against
    (msg, body, p)
  }

  def isArrowFile(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && b(0) == 'A' && b(1) == 'R' &&
      b(2) == 'R' && b(3) == 'O' && b(4) == 'W' && b(5) == '1' &&
      b(6) == 0 && b(7) == 0
  def isArrowStream(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      i32(b, 0) == -1 && i32(b, 4) > 0 && !isArrowFile(b)

  /** As [[read]] but surfacing the failure reason (spec diagnostics). */
  private[graft] def readOrThrow(b: Array[Byte]): ArrowTable =
    if (isArrowFile(b)) readMessages(b, 8, fileEnd(b))
    else if (isArrowStream(b)) readMessages(b, 0, b.length)
    else fail("not arrow")

  /** Read an Arrow IPC FILE or STREAM; null on damage/profile gap. */
  def read(b: Array[Byte]): ArrowTable = try {
    if (isArrowFile(b)) readMessages(b, 8, fileEnd(b))
    else if (isArrowStream(b)) readMessages(b, 0, b.length)
    else null
  } catch {
    case _: Err => null
    case _: RuntimeException => null
  }

  /** The byte just past the last encapsulated message in FILE framing
    * (start of the footer flatbuffer), located from the trailer.
    */
  private def fileEnd(b: Array[Byte]): Int = {
    if (b.length < 8 + 10) fail("file short")
    val tail = b.length - 6
    if (new String(b, tail, 6, UTF_8) != "ARROW1") fail("trailer magic")
    val footerLen = i32(b, tail - 4)
    if (footerLen < 0 || footerLen > tail - 4 - 8) fail("footer len")
    tail - 4 - footerLen
  }

  private def readMessages(b: Array[Byte], start: Int, end: Int): ArrowTable = {
    var p = start
    var cols: Array[Col] = null
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var guard = 0
    while (p < end && guard < (1 << 20)) {
      guard += 1
      val (msg, body, next) = message(b, p)
      p = next
      if (msg == null) p = end // EOS
      else {
        val headerType = msg.byteF(1)
        val header = msg.tableF(2)
        headerType match {
          case 1 => // Schema
            if (header == null) fail("schema missing")
            cols = parseSchema(header)
          case 3 => // RecordBatch
            if (cols == null) fail("batch before schema")
            if (header == null) fail("batch missing")
            decodeBatch(header, body, cols, rows)
          case 2 => fail("dictionary profile")
          case _ => () // Tensor/SparseTensor messages: skip
        }
      }
    }
    if (cols == null) fail("no schema")
    ArrowTable(cols.map(_.name), cols.map(_.tpe), rows.toArray)
  }

  /** Forensic class for the decode taxonomy. */
  def decodeClass(b: Array[Byte]): String =
    if (!isArrowFile(b) && !isArrowStream(b)) "not_arrow"
    else try {
      readMessages(b, if (isArrowFile(b)) 8 else 0,
        if (isArrowFile(b)) fileEnd(b) else b.length)
      "ok"
    } catch {
      case e: Err if e.getMessage.endsWith("profile") => "unsupported_profile"
      case _: RuntimeException => "corrupt"
    }
}
