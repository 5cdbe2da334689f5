package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** GGUF metadata walk — the LLM-era single-file weights format
  * (llama.cpp ecosystem), alongside safetensors in the tensor/table
  * family. Implements the documented layout (ggml's gguf.md spec,
  * version 3): magic `GGUF`, LE u32 version, tensor count, the
  * key/value metadata table (all 13 value types, including nested
  * arrays), then tensor descriptors (name, n_dims + dims, ggml type
  * id, data offset). The walk is METADATA-ONLY by design — quant-block
  * dequantization is a named gap, not needed for corpus accounting
  * (counting tensors, parameters and bytes per quant type is what a
  * training-data pipeline audits).
  *
  * Like safetensors: spec-constructed fixtures pin the layout
  * ([[synthGguf]] writes v3 files; no gguf implementation ships in
  * this container), damage degrades to null, bomb caps bound hostile
  * counts (1M KVs/tensors, 64 MiB strings, array nesting 8).
  */
object Gguf {

  /** One tensor descriptor: dims are in ggml order (fastest first). */
  final case class Tensor(name: String, dims: Array[Long], typeId: Int,
      offset: Long)
  final case class GgufFile(version: Int, kv: Map[String, Any],
      tensors: Array[Tensor])

  private final class Err(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw new Err(msg)

  def isGguf(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && b(0) == 'G' && b(1) == 'G' &&
      b(2) == 'U' && b(3) == 'F'

  /** ggml type ids → (name, block bytes, block elements) for the types
    * the llama.cpp ecosystem actually ships; unknown ids keep their
    * number. Public constants from ggml's type table.
    */
  val TypeNames: Map[Int, String] = Map(
    0 -> "f32", 1 -> "f16", 2 -> "q4_0", 3 -> "q4_1", 6 -> "q5_0",
    7 -> "q5_1", 8 -> "q8_0", 9 -> "q8_1", 10 -> "q2_k", 11 -> "q3_k",
    12 -> "q4_k", 13 -> "q5_k", 14 -> "q6_k", 15 -> "q8_k",
    16 -> "iq2_xxs", 17 -> "iq2_xs", 18 -> "iq3_xxs", 24 -> "i8",
    25 -> "i16", 26 -> "i32", 27 -> "i64", 28 -> "f64", 30 -> "bf16")

  private final class In(val b: Array[Byte]) {
    var p = 0
    def need(n: Int): Unit =
      if (n < 0 || n > b.length - p) fail("eof")
    def u8(): Int = { need(1); val v = b(p) & 0xFF; p += 1; v }
    def u32(): Long = {
      need(4)
      val v = ((b(p) & 0xFFL)) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
      p += 4; v
    }
    def u64(): Long = {
      need(8)
      var v = 0L
      var k = 7
      while (k >= 0) { v = (v << 8) | (b(p + k) & 0xFFL); k -= 1 }
      p += 8; v
    }
    def f32(): Float = java.lang.Float.intBitsToFloat(u32().toInt)
    def f64(): Double = java.lang.Double.longBitsToDouble(u64())
    def str(): String = {
      val n = u64()
      if (n < 0 || n > (1L << 26)) fail("string bomb")
      need(n.toInt)
      val s = new String(b, p, n.toInt, UTF_8)
      p += n.toInt
      s
    }
  }

  /** Read one typed value; widths per the spec's value-type table. */
  private def value(in: In, tpe: Int, depth: Int): Any = {
    if (depth > 8) fail("nesting")
    tpe match {
      case 0 => in.u8() // u8
      case 1 => in.u8().toByte.toInt // i8
      case 2 => { in.need(2); val v = (in.b(in.p) & 0xFF) | ((in.b(in.p + 1) & 0xFF) << 8); in.p += 2; v } // u16
      case 3 => { in.need(2); val v = ((in.b(in.p) & 0xFF) | ((in.b(in.p + 1) & 0xFF) << 8)).toShort.toInt; in.p += 2; v } // i16
      case 4 => in.u32() // u32 as Long
      case 5 => in.u32().toInt // i32
      case 6 => in.f32()
      case 7 => in.u8() != 0 // bool
      case 8 => in.str()
      case 9 => // array: [type u32][count u64][values]
        val at = in.u32().toInt
        val n = in.u64()
        if (n < 0 || n > (1L << 20)) fail("array bomb")
        val out = new Array[Any](n.toInt)
        var i = 0
        while (i < n) { out(i) = value(in, at, depth + 1); i += 1 }
        out.toVector
      case 10 => in.u64() // u64
      case 11 => in.u64() // i64
      case 12 => in.f64()
      case _  => fail("value type")
    }
  }

  /** Parse header + metadata + tensor descriptors; null on damage. */
  def read(b: Array[Byte]): GgufFile = try {
    if (!isGguf(b)) return null
    val in = new In(b)
    in.p = 4
    val version = in.u32().toInt
    if (version < 2 || version > 3) fail("version") // v1 had 32-bit counts
    val nTensors = in.u64()
    val nKv = in.u64()
    if (nTensors < 0 || nTensors > (1L << 20) || nKv < 0 || nKv > (1L << 20))
      fail("count bomb")
    var kv = Map.empty[String, Any]
    var i = 0L
    while (i < nKv) {
      val k = in.str()
      val t = in.u32().toInt
      kv += k -> value(in, t, 0)
      i += 1
    }
    val tensors = new Array[Tensor](nTensors.toInt)
    i = 0
    while (i < nTensors) {
      val name = in.str()
      val nd = in.u32().toInt
      if (nd < 0 || nd > 8) fail("dims")
      val dims = Array.fill(nd)(in.u64())
      if (dims.exists(d => d < 0 || d > (1L << 40))) fail("dim bomb")
      val tid = in.u32().toInt
      val off = in.u64()
      if (off < 0) fail("offset")
      tensors(i.toInt) = Tensor(name, dims, tid, off)
      i += 1
    }
    GgufFile(version, kv, tensors)
  } catch {
    case _: Err => null
    case _: RuntimeException => null
  }

  // ---- synthetic writer ---------------------------------------------------

  private final class Out {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xFF)
    def u32(v: Long): Unit = { var k = 0; while (k < 4) { b.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 } }
    def u64(v: Long): Unit = { var k = 0; while (k < 8) { b.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 } }
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v) & 0xFFFFFFFFL)
    def str(s: String): Unit = {
      val d = s.getBytes(UTF_8)
      u64(d.length)
      b.write(d)
    }
  }

  /** Spec-constructed v3 writer (metadata + descriptors only — tensor
    * data offsets are declared, no payload is appended; the walk under
    * test never reads past the descriptors). KV values cover string,
    * u32, f32, bool and a string array.
    */
  def synthGguf(kv: Seq[(String, Any)],
      tensors: Seq[(String, Array[Long], Int)]): Array[Byte] = {
    val o = new Out
    o.b.write("GGUF".getBytes(UTF_8))
    o.u32(3)
    o.u64(tensors.length)
    o.u64(kv.length)
    kv.foreach { case (k, v) =>
      o.str(k)
      v match {
        case s: String => o.u32(8); o.str(s)
        case n: Long   => o.u32(4); o.u32(n)   // u32
        case n: Int    => o.u32(5); o.u32(n.toLong & 0xFFFFFFFFL) // i32
        case f: Float  => o.u32(6); o.f32(f)
        case b: Boolean => o.u32(7); o.u8(if (b) 1 else 0)
        case xs: Seq[_] => // string array
          o.u32(9); o.u32(8); o.u64(xs.length)
          xs.foreach(x => o.str(x.toString))
        case other => throw new IllegalArgumentException(other.getClass.getName)
      }
    }
    var off = 0L
    tensors.foreach { case (name, dims, tid) =>
      o.str(name)
      o.u32(dims.length)
      dims.foreach(o.u64)
      o.u32(tid)
      o.u64(off)
      off += dims.product * 4 // nominal f32 spacing; offsets only declared
    }
    o.b.toByteArray
  }
}
