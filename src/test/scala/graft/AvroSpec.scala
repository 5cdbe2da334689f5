package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Avro

/** Avro object-container conformance, pinned BOTH directions against
  * the real Avro implementation on the classpath: DataFileWriter
  * streams (all six codecs) read through the from-scratch walk, and
  * [[Avro.synthAvro]] streams read back through DataFileReader.
  */
class AvroSpec extends AnyFunSuite {

  private val SchemaJson =
    """{"type":"record","name":"rec","fields":[
      |{"name":"name","type":"string"},
      |{"name":"val","type":["null","long"]},
      |{"name":"score","type":"double"},
      |{"name":"flag","type":"boolean"},
      |{"name":"data","type":"bytes"}]}""".stripMargin

  private def avroWrite(codec: String, n: Int): Array[Byte] = {
    import org.apache.avro._
    import org.apache.avro.file._
    import org.apache.avro.generic._
    val schema = new Schema.Parser().parse(SchemaJson)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    codec match {
      case "null" => ()
      case "deflate" => w.setCodec(CodecFactory.deflateCodec(6))
      case "snappy" => w.setCodec(CodecFactory.snappyCodec())
      case "zstandard" => w.setCodec(CodecFactory.zstandardCodec(3))
      case "bzip2" => w.setCodec(CodecFactory.bzip2Codec())
      case "xz" => w.setCodec(CodecFactory.xzCodec(1))
    }
    val bos = new java.io.ByteArrayOutputStream()
    w.create(schema, bos)
    for (i <- 0 until n) {
      val r = new GenericData.Record(schema)
      r.put("name", s"row-$i")
      r.put("val", if (i % 4 == 0) null else java.lang.Long.valueOf(i * 37L))
      r.put("score", i / 8.0)
      r.put("flag", i % 3 == 0)
      r.put("data", java.nio.ByteBuffer.wrap(
        Array.tabulate(i % 9)(j => ((i + j * 5) % 256).toByte)))
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  test("real-Avro files read back across all six codecs") {
    for (codec <- Seq("null", "deflate", "snappy", "zstandard",
        "bzip2", "xz")) {
      val b = avroWrite(codec, 500)
      assert(Avro.isAvro(b), codec)
      val got = Avro.read(b)
      assert(got != null, codec)
      assert(got.fieldNames.toSeq ==
        Seq("name", "val", "score", "flag", "data"), codec)
      assert(got.fieldTypes.toSeq ==
        Seq("string", "long?", "double", "boolean", "bytes"), codec)
      assert(got.rows.length == 500, codec)
      for (i <- 0 until 500) {
        val r = got.rows(i)
        assert(r(0) == s"row-$i", s"$codec/$i")
        if (i % 4 == 0) assert(r(1) == null, s"$codec/$i")
        else assert(r(1) == i * 37L, s"$codec/$i")
        assert(r(2) == i / 8.0, s"$codec/$i")
        assert(r(3) == (i % 3 == 0), s"$codec/$i")
        assert(r(4).asInstanceOf[Array[Byte]].toSeq ==
          Array.tabulate(i % 9)(j => ((i + j * 5) % 256).toByte).toSeq,
          s"$codec/$i")
      }
    }
  }

  test("synthAvro reads back through real Avro, all codecs") {
    import org.apache.avro.file._
    import org.apache.avro.generic._
    val names = Seq("name", "val", "score", "flag", "data")
    val types = Seq("string", "long?", "double", "boolean", "bytes")
    val rows = (0 until 700).map { i =>
      Seq[Any](s"n-$i", (if (i % 5 == 0) null else i * 31L), i * 0.5,
        i % 2 == 0, Array.tabulate(i % 7)(j => ((i * 3 + j) % 256).toByte))
    }
    for (codec <- Seq("null", "deflate", "snappy", "zstandard",
        "bzip2", "xz")) {
      val b = graft.operators.Avro.synthAvro(names, types, rows, codec,
        blockRows = 150) // multiple blocks
      // our own reader round-trips
      val mine = Avro.read(b)
      assert(mine != null && mine.rows.length == 700, codec)
      // real Avro agrees
      val rd = new DataFileReader(
        new SeekableByteArrayInput(b),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (rd.hasNext) {
        val r = rd.next()
        assert(r.get("name").toString == s"n-$i", s"$codec/$i")
        if (i % 5 == 0) assert(r.get("val") == null, s"$codec/$i")
        else assert(r.get("val") == i * 31L, s"$codec/$i")
        assert(r.get("score") == i * 0.5, s"$codec/$i")
        assert(r.get("flag") == (i % 2 == 0), s"$codec/$i")
        val bb = r.get("data").asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining())
        bb.get(arr)
        assert(arr.toSeq == Array.tabulate(i % 7)(j =>
          ((i * 3 + j) % 256).toByte).toSeq, s"$codec/$i")
        i += 1
      }
      rd.close()
      assert(i == 700, codec)
    }
  }

  test("damage and profile gaps split correctly") {
    val names = Seq("a", "b")
    val types = Seq("string", "long")
    val rows = (0 until 100).map(i => Seq[Any](s"s$i", i.toLong))
    val b = graft.operators.Avro.synthAvro(names, types, rows, "deflate")
    assert(Avro.read(b) != null)
    // sync marker damage quarantines
    val bad = b.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x44).toByte
    assert(Avro.read(bad) == null)
    // truncations
    for (cut <- Seq(2, 10, 60, b.length / 2))
      assert(Avro.read(java.util.Arrays.copyOf(b, cut)) == null, s"$cut")
    // xz DECODES since r10 — the named codec gap is an UNREGISTERED
    // name (byte-patched null -> legacy "lzo1", container untouched)
    val xz = avroWriteWithCodec("xz")
    assert(Avro.read(xz) != null)
    assert(!Avro.unsupportedProfile(xz))
    val lzo = graft.operators.Avro.synthAvro(names, types, rows, "null")
    val at = lzo.indexOfSlice("avro.codec".getBytes("US-ASCII"))
    System.arraycopy("lzo1".getBytes("US-ASCII"), 0, lzo,
      at + "avro.codec".length + 1, 4)
    assert(Avro.read(lzo) == null)
    assert(Avro.unsupportedProfile(lzo))
    assert(!Avro.unsupportedProfile(b))
    // out-of-subset schema (array field) is a named profile
    import org.apache.avro._
    import org.apache.avro.file._
    import org.apache.avro.generic._
    val s2 = new Schema.Parser().parse(
      """{"type":"record","name":"r2","fields":[
        |{"name":"xs","type":{"type":"array","items":"long"}}]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s2))
    val bos = new java.io.ByteArrayOutputStream()
    w.create(s2, bos)
    val rec = new GenericData.Record(s2)
    rec.put("xs", java.util.Arrays.asList(
      java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)))
    w.append(rec)
    w.close()
    val arrFile = bos.toByteArray
    assert(Avro.read(arrFile) == null)
    assert(Avro.unsupportedProfile(arrFile))
  }

  private def avroWriteWithCodec(codec: String): Array[Byte] = {
    import org.apache.avro._
    import org.apache.avro.file._
    import org.apache.avro.generic._
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r3","fields":[
        |{"name":"a","type":"long"}]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.xzCodec(1))
    val bos = new java.io.ByteArrayOutputStream()
    w.create(schema, bos)
    val rec = new GenericData.Record(schema)
    rec.put("a", java.lang.Long.valueOf(5L))
    w.append(rec)
    w.close()
    bos.toByteArray
  }
}
