package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Npy, Safetensors}

/** NumPy `.npy`/`.npz` + safetensors conformance, live-pinned
  * against the reference implementations: real numpy arrays (every
  * dtype/order in the subset) read back here, our synth arrays load
  * in numpy, and a safetensors file constructed independently in
  * pure python (per the public spec) decodes here.
  */
class NpySafetensorsSpec extends AnyFunSuite {

  private def py(script: String): (Int, String) = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    p.getOutputStream.close()
    (p.waitFor(), new String(p.getInputStream.readAllBytes(), "UTF-8"))
  }

  test("real numpy arrays read back: dtypes, orders, versions (gated)") {
    val dir = java.nio.file.Files.createTempDirectory("npy")
    try {
      val (rc, out) = py(
        s"""
           |import numpy as np, os
           |d = r'${dir.toString}'
           |np.save(os.path.join(d, 'i4.npy'),
           |        np.arange(24, dtype='<i4').reshape(2, 3, 4) * 7 - 11)
           |np.save(os.path.join(d, 'f8.npy'),
           |        np.linspace(-2, 2, 10, dtype='<f8'))
           |np.save(os.path.join(d, 'be.npy'),
           |        np.arange(6, dtype='>i2').reshape(3, 2) * 100)
           |np.save(os.path.join(d, 'fort.npy'),
           |        np.asfortranarray(np.arange(12, dtype='<i8').reshape(3, 4)))
           |np.save(os.path.join(d, 'b1.npy'),
           |        np.array([True, False, True]))
           |np.savez(os.path.join(d, 'z.npz'),
           |         a=np.arange(5, dtype='<i8'),
           |         b=np.array([1.5, -2.5]))
           |np.save(os.path.join(d, 'obj.npy'),
           |        np.array(['strings'], dtype=object), allow_pickle=True)
           |print('OK')
           |""".stripMargin)
      assume(rc == 0, s"numpy unavailable: $out")
      def load(n: String) = Npy.read(
        java.nio.file.Files.readAllBytes(dir.resolve(n)))
      val i4 = load("i4.npy")
      assert(i4 != null && i4.shape.toSeq == Seq(2, 3, 4))
      assert(i4.longs.toSeq == (0 until 24).map(_ * 7L - 11))
      val f8 = load("f8.npy")
      assert(f8 != null && f8.doubles.length == 10)
      assert(f8.doubles(0) == -2.0 && f8.doubles(9) == 2.0)
      val be = load("be.npy")
      assert(be != null && be.longs.toSeq ==
        Seq(0L, 100L, 200L, 300L, 400L, 500L))
      // fortran order: C-order read must match np.arange layout
      val fort = load("fort.npy")
      assert(fort != null && fort.longs.toSeq == (0L until 12L))
      val b1 = load("b1.npy")
      assert(b1 != null && b1.longs.toSeq == Seq(1L, 0L, 1L))
      // npz: the zip walk composes
      val z = Npy.npz(java.nio.file.Files.readAllBytes(dir.resolve("z.npz")))
      assert(z != null && z.length == 2)
      val byName = z.toMap
      assert(byName("a").longs.toSeq == (0L until 5L))
      assert(byName("b").doubles.toSeq == Seq(1.5, -2.5))
      // object dtype: numeric read refuses, but the Pickle walk
      // DECODES it since r10 (no longer a profile gap)
      val obj = java.nio.file.Files.readAllBytes(dir.resolve("obj.npy"))
      assert(Npy.read(obj) == null)
      assert(!Npy.unsupportedProfile(obj))
      assert(Npy.readObjects(obj) != null)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("synth arrays load in real numpy (gated)") {
    val dir = java.nio.file.Files.createTempDirectory("npyw")
    try {
      val longs = Array.tabulate(12L.toInt)(i => i * 31L - 7)
      java.nio.file.Files.write(dir.resolve("w.npy"),
        Npy.synthNpy(Array(3, 4), longs, null))
      java.nio.file.Files.write(dir.resolve("wz.npz"),
        Npy.synthNpz(Seq(
          ("x", Npy.synthNpy(Array(4), Array(9L, 8L, 7L, 6L), null)),
          ("y", Npy.synthNpy(Array(2), null, Array(0.25, -4.0))))))
      val (rc, out) = py(
        s"""
           |import numpy as np, os
           |d = r'${dir.toString}'
           |a = np.load(os.path.join(d, 'w.npy'))
           |assert a.shape == (3, 4) and a.dtype == np.int64
           |assert a.flatten().tolist() == [i*31 - 7 for i in range(12)]
           |z = np.load(os.path.join(d, 'wz.npz'))
           |assert z['x'].tolist() == [9, 8, 7, 6]
           |assert z['y'].tolist() == [0.25, -4.0]
           |print('OK')
           |""".stripMargin)
      assert(rc == 0 && out.trim == "OK", out)
      // and our own reader round-trips
      val back = Npy.read(java.nio.file.Files.readAllBytes(dir.resolve("w.npy")))
      assert(back != null && back.longs.toSeq == longs.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("safetensors: python-constructed file decodes; round-trip (gated)") {
    // the reference construction, in pure python per the public spec
    val (rc, hex) = py(
      """
        |import json, struct, binascii
        |buf = b''
        |header = {}
        |vals = [3, -5, 1000000]
        |buf0 = b''.join(struct.pack('<q', v) for v in vals)
        |header['ints'] = {'dtype': 'I64', 'shape': [3],
        |                  'data_offsets': [0, len(buf0)]}
        |fl = [1.5, -0.25]
        |buf1 = b''.join(struct.pack('<f', v) for v in fl)
        |header['floats'] = {'dtype': 'F32', 'shape': [2],
        |                    'data_offsets': [len(buf0), len(buf0)+len(buf1)]}
        |h16 = struct.pack('<e', 0.5) + struct.pack('<e', -2.0)
        |header['halves'] = {'dtype': 'F16', 'shape': [2],
        |  'data_offsets': [len(buf0)+len(buf1), len(buf0)+len(buf1)+4]}
        |header['__metadata__'] = {'origin': 'spec-test'}
        |hj = json.dumps(header).encode()
        |out = struct.pack('<Q', len(hj)) + hj + buf0 + buf1 + h16
        |print(binascii.hexlify(out).decode())
        |""".stripMargin)
    assume(rc == 0, s"python unavailable: $hex")
    val b = hex.trim.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Safetensors.isSafetensors(b))
    val ts = Safetensors.read(b)
    assert(ts != null && ts.length == 3)
    val byName = ts.map(t => t.name -> t).toMap
    assert(byName("ints").longs.toSeq == Seq(3L, -5L, 1000000L))
    assert(byName("floats").doubles.toSeq == Seq(1.5, -0.25))
    assert(byName("halves").doubles.toSeq == Seq(0.5, -2.0))
    // round-trip our own writer
    val mine = Safetensors.synth(Seq(
      ("a", Array(2, 2), Left(Array(1L, 2L, 3L, 4L))),
      ("b", Array(3), Right(Array(0.5f, 1.5f, -2f)))))
    val got = Safetensors.read(mine)
    assert(got != null && got.length == 2)
    assert(got(0).longs.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got(1).doubles.toSeq == Seq(0.5, 1.5, -2.0))
    // unknown dtype: named profile; bad offsets: damage
    val badDtype = new String(mine, 8, 40, "ISO-8859-1")
    val patched = mine.clone()
    val idx = new String(patched, "ISO-8859-1").indexOf("I64")
    patched(idx) = 'Q'
    assert(Safetensors.read(patched) == null)
    assert(Safetensors.unsupportedProfile(patched))
    for (cut <- Seq(3, 9, mine.length / 2, mine.length - 1))
      assert(Safetensors.read(
        java.util.Arrays.copyOf(mine, cut)) == null, s"cut=$cut")
  }
}
