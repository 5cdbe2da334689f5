package graft.operators

/** From-scratch safetensors reader — the tensor-serialization format
  * model weights and embedding dumps ship in (the public
  * huggingface/safetensors spec): an 8-byte LE header length, a JSON
  * header mapping tensor names to `{dtype, shape, data_offsets}`
  * (plus the optional `__metadata__` string map), then one flat byte
  * buffer the offsets index into.
  *
  * Dtypes decoded: F64/F32/F16/BF16 (half/bfloat widened through
  * exact bit arithmetic), I64/I32/I16/I8, U8, BOOL. Offsets are
  * validated against the buffer and the element count against the
  * shape. Unknown dtypes are a named profile gap. JSON through the
  * shared [[MiniJson]]; null on damage.
  */
object Safetensors {

  final case class Tensor(name: String, dtype: String, shape: Array[Int],
      longs: Array[Long], doubles: Array[Double])

  private val Widths = Map("F64" -> 8, "F32" -> 4, "F16" -> 2,
    "BF16" -> 2, "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1,
    "U8" -> 1, "BOOL" -> 1)

  private def leU64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    for (k <- 7 to 0 by -1) v = (v << 8) | (b(i + k) & 0xFFL)
    v
  }

  def isSafetensors(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 && {
      val n = leU64(b, 0)
      n > 0 && n <= b.length - 8 && b(8) == '{'
    }

  /** Half-precision bits -> double (exact). */
  private[graft] def f16(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1F
    val mant = bits & 0x3FF
    if (exp == 0) sign * mant * math.pow(2, -24)
    else if (exp == 31) {
      if (mant == 0) sign * Double.PositiveInfinity else Double.NaN
    } else sign * (1024 + mant) * math.pow(2, exp - 25)
  }

  /** bfloat16 bits -> double: the top 16 bits of an IEEE float32. */
  private[graft] def bf16(bits: Int): Double =
    java.lang.Float.intBitsToFloat(bits << 16).toDouble

  /** Every tensor, header order; null on damage or an unknown
    * dtype (distinguish via [[unsupportedProfile]]).
    */
  def read(b: Array[Byte]): Array[Tensor] = try {
    if (!isSafetensors(b)) return null
    val hLen = leU64(b, 0).toInt
    val json = new String(b, 8, hLen,
      java.nio.charset.StandardCharsets.UTF_8)
    val root = MiniJson.parse(json) match {
      case m: scala.collection.mutable.LinkedHashMap[_, _] =>
        m.asInstanceOf[MiniJson.JObj]
      case _ => return null
    }
    val bufOff = 8 + hLen
    val bufLen = b.length - bufOff
    val out = scala.collection.mutable.ArrayBuffer.empty[Tensor]
    root.foreach { case (name, spec0) =>
      if (name != "__metadata__") {
        val spec = spec0 match {
          case m: scala.collection.mutable.LinkedHashMap[_, _] =>
            m.asInstanceOf[MiniJson.JObj]
          case _ => return null
        }
        val dtype = spec.getOrElse("dtype", null) match {
          case s: String => s
          case _ => return null
        }
        val shape = spec.getOrElse("shape", null) match {
          case a: scala.collection.mutable.ArrayBuffer[_] =>
            a.map {
              case d: java.lang.Double
                  if d.doubleValue() >= 0 &&
                    d.doubleValue() <= Int.MaxValue &&
                    d.doubleValue() == d.doubleValue().floor =>
                d.intValue()
              case _ => return null
            }.toArray
          case _ => return null
        }
        val offs = spec.getOrElse("data_offsets", null) match {
          case a: scala.collection.mutable.ArrayBuffer[_]
              if a.length == 2 =>
            a.map {
              case d: java.lang.Double if d.doubleValue() >= 0 &&
                  d.doubleValue() <= (1L << 40).toDouble =>
                d.longValue()
              case _ => return null
            }.toArray
          case _ => return null
        }
        val width = Widths.getOrElse(dtype, -1)
        if (width < 0) return null // unknown dtype: named gap
        var count = 1L
        shape.foreach(d => count *= d)
        if (count < 0 || count > (1L << 28)) return null
        val (begin, end) = (offs(0), offs(1))
        if (begin > end || end > bufLen ||
            end - begin != count * width) return null
        val isFloat = dtype.startsWith("F") || dtype.startsWith("BF")
        val longs = if (isFloat) null else new Array[Long](count.toInt)
        val doubles = if (isFloat) new Array[Double](count.toInt) else null
        var i = 0L
        while (i < count) {
          val off = (bufOff + begin + i * width).toInt
          var raw = 0L
          for (k <- width - 1 to 0 by -1)
            raw = (raw << 8) | (b(off + k) & 0xFFL) // LE
          dtype match {
            case "F64" =>
              doubles(i.toInt) = java.lang.Double.longBitsToDouble(raw)
            case "F32" =>
              doubles(i.toInt) =
                java.lang.Float.intBitsToFloat(raw.toInt).toDouble
            case "F16" => doubles(i.toInt) = f16(raw.toInt)
            case "BF16" => doubles(i.toInt) = bf16(raw.toInt)
            case "U8" => longs(i.toInt) = raw
            case "BOOL" =>
              if (raw != 0 && raw != 1) return null
              longs(i.toInt) = raw
            case _ => // signed ints
              val shift = 64 - 8 * width
              longs(i.toInt) = (raw << shift) >> shift
          }
          i += 1
        }
        out += Tensor(name, dtype, shape, longs, doubles)
      }
    }
    out.toArray
  } catch {
    case _: IllegalArgumentException => null
    case _: IndexOutOfBoundsException => null
  }

  /** Structurally-sound header naming a dtype outside the table. */
  def unsupportedProfile(b: Array[Byte]): Boolean = try {
    if (!isSafetensors(b)) return false
    val hLen = leU64(b, 0).toInt
    MiniJson.parse(new String(b, 8, hLen,
      java.nio.charset.StandardCharsets.UTF_8)) match {
      case m: scala.collection.mutable.LinkedHashMap[_, _] =>
        m.asInstanceOf[MiniJson.JObj].exists { case (k, v) =>
          k != "__metadata__" && (v match {
            case sp: scala.collection.mutable.LinkedHashMap[_, _] =>
              sp.asInstanceOf[MiniJson.JObj].getOrElse("dtype", null) match {
                case s: String => !Widths.contains(s)
                case _ => false
              }
            case _ => false
          })
        }
      case _ => false
    }
  } catch {
    case _: IllegalArgumentException => false
    case _: IndexOutOfBoundsException => false
  }

  /** A real safetensors file from I64/F32 tensors (C-order data). */
  def synth(tensors: Seq[(String, Array[Int], Either[Array[Long], Array[Float]])]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val entries = tensors.map { case (name, shape, data) =>
      val begin = buf.size().toLong
      data match {
        case Left(ls) => ls.foreach { v =>
          for (k <- 0 until 8) buf.write(((v >> (8 * k)) & 0xFF).toInt)
        }
        case Right(fs) => fs.foreach { f =>
          val bits = java.lang.Float.floatToIntBits(f)
          for (k <- 0 until 4) buf.write((bits >> (8 * k)) & 0xFF)
        }
      }
      val dtype = if (data.isLeft) "I64" else "F32"
      val shapeJson = shape.mkString("[", ",", "]")
      s""""$name":{"dtype":"$dtype","shape":$shapeJson,""" +
        s""""data_offsets":[$begin,${buf.size()}]}"""
    }
    val header = entries.mkString("{", ",", "}")
    val hb = header.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    for (k <- 0 until 8) out.write(((hb.length.toLong >> (8 * k)) & 0xFF).toInt)
    out.write(hb, 0, hb.length)
    val bb = buf.toByteArray
    out.write(bb, 0, bb.length)
    out.toByteArray
  }
}
