package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Npy, Pickle}
import graft.operators.Pickle._

/** Pickle structural-decode conformance, live-pinned against python3's
  * own pickle module (all six protocols) and numpy's object-array
  * serialization — the sqlite3/email posture.
  */
class PickleSpec extends AnyFunSuite {

  private def py(script: String): (Int, String) = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }
  private def havePython: Boolean = py("import pickle")._1 == 0
  private def haveNumpy: Boolean = py("import numpy")._1 == 0

  /** Flatten our tree for comparison. */
  private def show(v: V): String = v match {
    case PNone => "None"
    case PBool(b) => if (b) "True" else "False"
    case PInt(n) => n.toString
    case PBig(n) => n.toString
    case PFloat(d) => d.toString
    case PStr(s) => s"'$s'"
    case PBytes(b) => "b" + b.map(x => f"${x & 0xFF}%02x").mkString
    case l: PList => l.items.map(show).mkString("[", ",", "]")
    case d: PDict => d.items.map { case (k, x) => show(k) + ":" + show(x) }.mkString("{", ",", "}")
    case s: PSet => s.items.map(show).mkString("set(", ",", ")")
    case PTuple(items) => items.map(show).mkString("(", ",", ")")
    case PGlobal(m, n) => s"$m.$n"
    case PReduce(c, a) => s"R[${show(c)}${show(a)}]"
    case PBuild(o, st) => s"B[${show(o)};${show(st)}]"
  }

  test("python3 pickles decode structurally across all six protocols (gated)") {
    assume(havePython, "python3 unavailable")
    val dir = java.nio.file.Files.createTempDirectory("pk")
    try {
      val (rc, log) = py(
        s"""import pickle
           |v = {'id': 42, 'big': 2**77, 'neg': -7, 'pi': 3.25,
           |     'name': 'h\\u00e9llo (x)', 'ok': True, 'none': None,
           |     'tags': ['a', 'b', 'a'], 'pair': (1, 'two'),
           |     'blob': b'\\x00\\x01\\xff', 'deep': [[1, [2, [3]]]]}
           |for p in range(6):
           |    open('$dir/p%d.pkl' % p, 'wb').write(pickle.dumps(v, p))
           |print('done')""".stripMargin)
      assert(rc == 0, log)
      def expected(blob: String) =
        "{'id':42,'big':151115727451828646838272,'neg':-7," +
          "'pi':3.25,'name':'héllo (x)','ok':True,'none':None," +
          "'tags':['a','b','a'],'pair':(1,'two')," + blob +
          ",'deep':[[1,[2,[3]]]]}"
      (0 until 6).foreach { proto =>
        val b = java.nio.file.Files.readAllBytes(dir.resolve(s"p$proto.pkl"))
        val v = Pickle.parse(b)
        assert(v != null, s"proto $proto")
        // protocols 0-2 predate the bytes opcodes: the blob is the
        // _codecs.encode REDUCE tree (recorded, not executed);
        // protocol 3+ carries real bytes
        val want =
          if (proto <= 2)
            expected("'blob':R[_codecs.encode('" + 0.toChar + 1.toChar +
              'ÿ' + "','latin1')]")
          else expected("'blob':b0001ff")
        assert(show(v) == want, s"proto $proto: ${show(v)}")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("synthPickle streams load back through python3 (gated)") {
    assume(havePython, "python3 unavailable")
    val v: Seq[(String, Any)] = Seq(
      "id" -> 1234567L, "name" -> "doc (one)", "ok" -> true,
      "score" -> 2.5, "none" -> null,
      "tags" -> Seq("x", "y"), "big" -> 9007199254740993L)
    val dir = java.nio.file.Files.createTempDirectory("pk2")
    try {
      for (proto <- Seq(0, 2, 4)) {
        java.nio.file.Files.write(dir.resolve(s"s$proto.pkl"),
          Pickle.synthPickle(v, proto))
      }
      val (rc, log) = py(
        s"""import pickle
           |want = {'id': 1234567, 'name': 'doc (one)', 'ok': True,
           |        'score': 2.5, 'none': None, 'tags': ['x', 'y'],
           |        'big': 9007199254740993}
           |for p in (0, 2, 4):
           |    got = pickle.load(open('$dir/s%d.pkl' % p, 'rb'))
           |    assert got == want, (p, got)
           |print('ok')""".stripMargin)
      assert(rc == 0, log)
      assert(log.contains("ok"))
      // and our own parser round-trips them
      for (proto <- Seq(0, 2, 4)) {
        val t = Pickle.parse(Pickle.synthPickle(v, proto))
        assert(t != null, s"proto $proto")
        assert(show(t).contains("'doc (one)'"), s"proto $proto")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("numpy object arrays: np.save reads here, synthObjectNpy loads there (gated)") {
    assume(haveNumpy, "numpy unavailable")
    val dir = java.nio.file.Files.createTempDirectory("pk3")
    try {
      val (rc, log) = py(
        s"""import numpy as np
           |a = np.empty(4, dtype=object)
           |a[0] = 'first'; a[1] = 17; a[2] = None; a[3] = 'l\\u00e1st'
           |np.save('$dir/obj.npy', a, allow_pickle=True)
           |print('saved')""".stripMargin)
      assert(rc == 0, log)
      val b = java.nio.file.Files.readAllBytes(dir.resolve("obj.npy"))
      val got = Npy.readObjects(b)
      assert(got != null)
      assert(got._1.toSeq == Seq(4L))
      assert(got._2.map(show) == Vector("'first'", "17", "None", "'lást'"))
      // plain numeric arrays still refuse through readObjects
      assert(Npy.readObjects(Npy.synthNpy(Array(2), Array(1L, 2L), null)) == null)
      // write direction: numpy loads our object npy
      java.nio.file.Files.write(dir.resolve("synth.npy"),
        Npy.synthObjectNpy(Array(3), Seq("ab", 99L, null)))
      val (rc2, log2) = py(
        s"""import numpy as np
           |a = np.load('$dir/synth.npy', allow_pickle=True)
           |assert a.shape == (3,), a.shape
           |assert a[0] == 'ab' and a[1] == 99 and a[2] is None, list(a)
           |print('ok')""".stripMargin)
      assert(rc2 == 0, log2)
      assert(log2.contains("ok"))
      // and our own reader agrees with our writer
      val mine = Npy.readObjects(Npy.synthObjectNpy(Array(3), Seq("ab", 99L, null)))
      assert(mine._2.map(show) == Vector("'ab'", "99", "None"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("profile gaps vs damage; fuzz never throws") {
    // persistent-id opcode: named gap
    assert(Pickle.parse(Array[Byte]('P', '1', '\n', '.')) == null)
    assert(Pickle.unsupportedProfile(Array[Byte]('P', '1', '\n', '.')))
    // damage: truncation, garbage
    assert(Pickle.parse(Array[Byte]('K')) == null)
    assert(!Pickle.unsupportedProfile(Array[Byte]('K')))
    assert(Pickle.parse("garbage!".getBytes("UTF-8")) == null)
    val good = Pickle.synthPickle(Seq("k" -> Seq(1L, 2L, 3L)), 4)
    val rnd = new scala.util.Random(9)
    (0 until 400).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Pickle.parse(mut) // must not throw
    }
    (1 until good.length).foreach { cut =>
      Pickle.parse(java.util.Arrays.copyOf(good, cut))
    }
  }
}
