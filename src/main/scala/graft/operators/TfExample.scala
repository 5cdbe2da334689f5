package graft.operators

/** From-scratch tf.Example decoder — the protobuf payload inside
  * TFRecord training shards (tensorflow's example.proto /
  * feature.proto, public):
  *
  *   Example{ Features features = 1 }
  *   Features{ map<string, Feature> feature = 1 }
  *   Feature{ oneof: BytesList=1, FloatList=2, Int64List=3 }
  *   *List{ repeated value = 1 }   (float/int64 usually PACKED)
  *
  * Decoded through the protobuf WIRE format itself (tag varints,
  * wire types 0/1/2/5), not a generated class: unknown fields skip
  * by wire type, packed and unpacked repeated encodings both read,
  * duplicate map keys resolve last-wins (protobuf semantics).
  * Pinned by hand-computed golden vectors from the spec plus
  * round-trip with the from-scratch encoder. Null on damage.
  */
object TfExample {

  sealed trait FeatureValue
  final case class BytesList(values: Array[Array[Byte]]) extends FeatureValue
  final case class FloatList(values: Array[Float]) extends FeatureValue
  final case class Int64List(values: Array[Long]) extends FeatureValue

  private final class Wire(val b: Array[Byte], var p: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (true) {
        if (p >= end || shift > 63)
          throw new IllegalArgumentException("varint")
        val c = b(p) & 0xFF
        p += 1
        v |= (c & 0x7FL) << shift
        shift += 7
        if ((c & 0x80) == 0) return v
      }
      0L
    }
    def sub(): Wire = {
      val len = varint()
      if (len < 0 || len > end - p)
        throw new IllegalArgumentException("len")
      val w = new Wire(b, p, p + len.toInt)
      p += len.toInt
      w
    }
    def bytesField(): Array[Byte] = {
      val len = varint()
      if (len < 0 || len > end - p)
        throw new IllegalArgumentException("len")
      val r = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 =>
        if (p + 8 > end) throw new IllegalArgumentException("i64")
        p += 8
      case 2 =>
        val len = varint()
        if (len < 0 || len > end - p)
          throw new IllegalArgumentException("len")
        p += len.toInt
      case 5 =>
        if (p + 4 > end) throw new IllegalArgumentException("i32")
        p += 4
      case _ => throw new IllegalArgumentException(s"wt $wireType")
    }
    def fixed32(): Int = {
      if (p + 4 > end) throw new IllegalArgumentException("f32")
      val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
      p += 4
      v
    }
    def done: Boolean = p >= end
  }

  private def parseList(w: Wire, kind: Int): FeatureValue = kind match {
    case 1 => // BytesList: repeated bytes value = 1
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (!w.done) {
        val tag = w.varint()
        if ((tag >> 3) == 1 && (tag & 7) == 2) out += w.bytesField()
        else w.skip((tag & 7).toInt)
      }
      BytesList(out.toArray)
    case 2 => // FloatList: repeated float value = 1 (packed or not)
      val out = scala.collection.mutable.ArrayBuffer.empty[Float]
      while (!w.done) {
        val tag = w.varint()
        if ((tag >> 3) == 1 && (tag & 7) == 2) {
          val packed = w.sub()
          while (!packed.done)
            out += java.lang.Float.intBitsToFloat(packed.fixed32())
        } else if ((tag >> 3) == 1 && (tag & 7) == 5)
          out += java.lang.Float.intBitsToFloat(w.fixed32())
        else w.skip((tag & 7).toInt)
      }
      FloatList(out.toArray)
    case _ => // Int64List: repeated int64 value = 1 (packed or not)
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (!w.done) {
        val tag = w.varint()
        if ((tag >> 3) == 1 && (tag & 7) == 2) {
          val packed = w.sub()
          while (!packed.done) out += packed.varint()
        } else if ((tag >> 3) == 1 && (tag & 7) == 0) out += w.varint()
        else w.skip((tag & 7).toInt)
      }
      Int64List(out.toArray)
  }

  private def parseFeature(w: Wire): FeatureValue = {
    var v: FeatureValue = null
    while (!w.done) {
      val tag = w.varint()
      val f = (tag >> 3).toInt
      if ((tag & 7) == 2 && f >= 1 && f <= 3) v = parseList(w.sub(), f)
      else w.skip((tag & 7).toInt)
    }
    v
  }

  /** Decode one Example's feature map; null on damage. */
  def parse(b: Array[Byte]): Array[(String, FeatureValue)] = try {
    if (b == null) return null
    val out = scala.collection.mutable.LinkedHashMap.empty[String, FeatureValue]
    val ex = new Wire(b, 0, b.length)
    while (!ex.done) {
      val tag = ex.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // Features
        val fs = ex.sub()
        while (!fs.done) {
          val ftag = fs.varint()
          if ((ftag >> 3) == 1 && (ftag & 7) == 2) { // map entry
            val entry = fs.sub()
            var key: String = null
            var value: FeatureValue = null
            while (!entry.done) {
              val etag = entry.varint()
              (etag >> 3, etag & 7) match {
                case (1, 2) => key = new String(entry.bytesField(),
                  java.nio.charset.StandardCharsets.UTF_8)
                case (2, 2) => value = parseFeature(entry.sub())
                case (_, wt) => entry.skip(wt.toInt)
              }
            }
            if (key != null && value != null) out(key) = value
          } else fs.skip((ftag & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    out.toArray
  } catch {
    case _: IllegalArgumentException => null
    case _: IndexOutOfBoundsException => null
  }

  // ---- write side ------------------------------------------------------

  private def wVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    do {
      val g = (v & 0x7F).toInt
      v >>>= 7
      out.write(if (v != 0) g | 0x80 else g)
    } while (v != 0)
  }

  private def wLenField(out: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    wVarint(out, (field.toLong << 3) | 2)
    wVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  /** Encode a feature map as a real tf.Example (packed lists). */
  def synth(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val fs = new java.io.ByteArrayOutputStream()
    features.foreach { case (name, value) =>
      val list = new java.io.ByteArrayOutputStream()
      val kind = value match {
        case BytesList(vs) =>
          vs.foreach(v => wLenField(list, 1, v))
          1
        case FloatList(vs) =>
          val packed = new java.io.ByteArrayOutputStream()
          vs.foreach { f =>
            val bits = java.lang.Float.floatToIntBits(f)
            for (i <- 0 until 4) packed.write((bits >> (8 * i)) & 0xFF)
          }
          wLenField(list, 1, packed.toByteArray)
          2
        case Int64List(vs) =>
          val packed = new java.io.ByteArrayOutputStream()
          vs.foreach(wVarint(packed, _))
          wLenField(list, 1, packed.toByteArray)
          3
      }
      val feature = new java.io.ByteArrayOutputStream()
      wLenField(feature, kind, list.toByteArray)
      val entry = new java.io.ByteArrayOutputStream()
      wLenField(entry, 1, name.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      wLenField(entry, 2, feature.toByteArray)
      wLenField(fs, 1, entry.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream()
    wLenField(out, 1, fs.toByteArray)
    out.toByteArray
  }
}
