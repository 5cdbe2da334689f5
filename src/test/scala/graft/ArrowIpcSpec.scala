package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ArrowIpc
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamWriter}

/** Arrow IPC conformance, pinned against the independent arrow-vector
  * implementation on the Spark classpath: its FILE and STREAM framings,
  * across multiple batches, nulls and every subset type, must decode
  * value-exactly through the from-scratch flatbuffers walker.
  */
class ArrowIpcSpec extends AnyFunSuite {

  private def withRoot[T](f: (RootAllocator, VectorSchemaRoot) => T): T = {
    val alloc = new RootAllocator()
    val big = new BigIntVector("id", alloc)
    val i32v = new IntVector("count", alloc)
    val f64 = new Float8Vector("score", alloc)
    val f32 = new Float4Vector("ratio", alloc)
    val bool = new BitVector("flag", alloc)
    val utf8 = new VarCharVector("name", alloc)
    val bin = new VarBinaryVector("blob", alloc)
    val root = new VectorSchemaRoot(java.util.List.of[FieldVector](
      big, i32v, f64, f32, bool, utf8, bin))
    try f(alloc, root)
    finally { root.close(); alloc.close() }
  }

  private def fill(root: VectorSchemaRoot, base: Int, n: Int): Unit = {
    root.allocateNew()
    val big = root.getVector("id").asInstanceOf[BigIntVector]
    val cnt = root.getVector("count").asInstanceOf[IntVector]
    val f64 = root.getVector("score").asInstanceOf[Float8Vector]
    val f32 = root.getVector("ratio").asInstanceOf[Float4Vector]
    val bool = root.getVector("flag").asInstanceOf[BitVector]
    val utf8 = root.getVector("name").asInstanceOf[VarCharVector]
    val bin = root.getVector("blob").asInstanceOf[VarBinaryVector]
    (0 until n).foreach { i =>
      val v = base + i
      big.setSafe(i, v * 1000L)
      if (v % 5 == 0) cnt.setNull(i) else cnt.setSafe(i, v)
      f64.setSafe(i, v / 4.0)
      f32.setSafe(i, v / 2.0f)
      bool.setSafe(i, if (v % 3 == 0) 1 else 0)
      if (v % 7 == 0) utf8.setNull(i)
      else utf8.setSafe(i, s"row-$v".getBytes("UTF-8"))
      bin.setSafe(i, Array.tabulate(v % 5)(j => ((v + j) % 256).toByte))
    }
    root.setRowCount(n)
  }

  private def check(t: ArrowIpc.ArrowTable, total: Int): Unit = {
    assert(t != null)
    assert(t.fieldNames.toSeq ==
      Seq("id", "count", "score", "ratio", "flag", "name", "blob"))
    assert(t.fieldTypes.toSeq ==
      Seq("i64", "i32", "f64", "f32", "bool", "utf8", "bin"))
    assert(t.rows.length == total)
    t.rows.zipWithIndex.foreach { case (r, i) =>
      assert(r(0) == i * 1000L, s"id $i")
      if (i % 5 == 0) assert(r(1) == null, s"count $i")
      else assert(r(1) == i.toLong, s"count $i")
      assert(r(2) == i / 4.0, s"score $i")
      assert(r(3) == (i / 2.0f).toDouble, s"ratio $i")
      assert(r(4) == (i % 3 == 0), s"flag $i")
      if (i % 7 == 0) assert(r(5) == null, s"name $i")
      else assert(r(5) == s"row-$i", s"name $i")
      assert(r(6).asInstanceOf[Array[Byte]].toSeq ==
        Array.tabulate(i % 5)(j => ((i + j) % 256).toByte).toSeq, s"blob $i")
    }
  }

  test("arrow-vector FILE framing decodes value-exactly (multi-batch)") {
    withRoot { (_, root) =>
      val bos = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      w.start()
      fill(root, 0, 40); w.writeBatch()
      fill(root, 40, 25); w.writeBatch()
      w.end(); w.close()
      val bytes = bos.toByteArray
      assert(ArrowIpc.isArrowFile(bytes))
      check(ArrowIpc.read(bytes), 65)
    }
  }

  test("arrow-vector STREAM framing decodes value-exactly") {
    withRoot { (_, root) =>
      val bos = new java.io.ByteArrayOutputStream()
      val w = new ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      w.start()
      fill(root, 0, 33); w.writeBatch()
      fill(root, 33, 10); w.writeBatch()
      w.end(); w.close()
      val bytes = bos.toByteArray
      assert(ArrowIpc.isArrowStream(bytes) && !ArrowIpc.isArrowFile(bytes))
      check(ArrowIpc.read(bytes), 43)
    }
  }

  test("LZ4 and ZSTD body compression decode via the from-scratch cores") {
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.compression.CommonsCompressionFactory
    for (codec <- Seq(CompressionUtil.CodecType.LZ4_FRAME,
        CompressionUtil.CodecType.ZSTD)) {
      withRoot { (_, root) =>
        val bos = new java.io.ByteArrayOutputStream()
        val w = new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(bos),
          new java.util.HashMap[String, String](),
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          CommonsCompressionFactory.INSTANCE, codec)
        w.start()
        fill(root, 0, 50); w.writeBatch()
        fill(root, 50, 30); w.writeBatch()
        w.end(); w.close()
        check(ArrowIpc.read(bos.toByteArray), 80)
      }
    }
  }

  test("profile gaps and damage split; fuzz never throws") {
    assert(ArrowIpc.read("not arrow".getBytes("UTF-8")) == null)
    assert(ArrowIpc.decodeClass("not arrow".getBytes("UTF-8")) == "not_arrow")
    val bytes = withRoot { (_, root) =>
      val bos = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      w.start(); fill(root, 0, 20); w.writeBatch(); w.end(); w.close()
      bos.toByteArray
    }
    assert(ArrowIpc.decodeClass(bytes) == "ok")
    // truncations and byte flips degrade, never throw
    (9 until bytes.length by 41).foreach { cut =>
      ArrowIpc.read(java.util.Arrays.copyOfRange(bytes, 0, cut))
    }
    val rnd = new scala.util.Random(3)
    (0 until 300).foreach { _ =>
      val mut = bytes.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      ArrowIpc.read(mut)
    }
  }
}
