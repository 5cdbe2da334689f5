package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sqlite

/** SQLite file-format conformance. The independent pin is the
  * reference implementation itself via python3's sqlite3 module
  * (live-gated): databases built by real SQLite read through this
  * walk, and [[Sqlite.synthDb]] databases query correctly through
  * real SQLite — covering multi-page B-trees, overflow chains, and
  * every serial type.
  */
class SqliteSpec extends AnyFunSuite {

  private def py(script: String): (Int, String) = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def havePython: Boolean =
    py("import sqlite3")._1 == 0

  test("real-SQLite databases read back (gated)") {
    assume(havePython, "python3 sqlite3 unavailable")
    val dir = java.nio.file.Files.createTempDirectory("sq")
    val f = dir.resolve("t.db")
    try {
      val (rc, log) = py(
        s"""
           |import sqlite3
           |c = sqlite3.connect(r'${f.toString}')
           |c.execute('CREATE TABLE samples (name TEXT, val INTEGER, score REAL, blob BLOB)')
           |rows = [(f'doc-{i}', i*37 if i % 5 else None, i/8.0,
           |         bytes((i*13+j) % 256 for j in range(i % 7)))
           |        for i in range(500)]
           |# one BIG text row forces an overflow chain
           |rows.append(('X' * 20000, 7, 0.5, b''))
           |c.executemany('INSERT INTO samples VALUES (?,?,?,?)', rows)
           |c.commit(); c.close()
           |""".stripMargin)
      assert(rc == 0, log)
      val b = java.nio.file.Files.readAllBytes(f)
      assert(Sqlite.isSqlite(b))
      val tables = Sqlite.tables(b)
      assert(tables != null && tables.exists(_._1 == "samples"))
      val rows = Sqlite.rows(b, "samples")
      assert(rows != null && rows.length == 501)
      for (i <- 0 until 500) {
        val r = rows(i)
        assert(r.rowid == i + 1)
        assert(r.values(0) == s"doc-$i", s"row $i")
        if (i % 5 == 0) assert(r.values(1) == null, s"row $i null")
        else assert(r.values(1) == (i * 37).toLong, s"row $i int")
        assert(r.values(2) == i / 8.0, s"row $i real")
        assert(r.values(3).asInstanceOf[Array[Byte]].toSeq ==
          Array.tabulate(i % 7)(j => ((i * 13 + j) % 256).toByte).toSeq,
          s"row $i blob")
      }
      // the overflow row survives the chain walk byte-exact
      assert(rows(500).values(0) == "X" * 20000)
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("synthDb databases query through real SQLite (gated)") {
    assume(havePython, "python3 sqlite3 unavailable")
    // enough rows to force leaf splits + an interior root, plus an
    // overflow-sized text value and every serial-type family
    val rows = (0 until 400).map { i =>
      Seq[Any](s"name-$i", i.toLong * 1000003L,
        (if (i % 4 == 0) null else i * 0.25),
        Array.tabulate(i % 9)(j => ((i + j * 7) % 256).toByte))
    } :+ Seq[Any]("Y" * 15000, 0L, 1.0, Array.emptyByteArray)
    val db = Sqlite.synthDb("samples",
      "name TEXT, val INTEGER, score REAL, data BLOB", rows)
    // our own reader round-trips it
    val got = Sqlite.rows(db, "samples")
    assert(got != null && got.length == rows.length)
    for ((want, r) <- rows.zip(got)) {
      assert(r.values(0) == want(0))
      assert(r.values(1) == want(1))
      (want(2), r.values(2)) match {
        case (null, v) => assert(v == null)
        case (d: Double, v) => assert(v == d)
        case _ => fail()
      }
      assert(r.values(3).asInstanceOf[Array[Byte]].toSeq ==
        want(3).asInstanceOf[Array[Byte]].toSeq)
    }
    // real SQLite agrees on counts and aggregates
    val dir = java.nio.file.Files.createTempDirectory("sqw")
    val f = dir.resolve("w.db")
    try {
      java.nio.file.Files.write(f, db)
      val (rc, out) = py(
        s"""
           |import sqlite3
           |c = sqlite3.connect(r'file:${f.toString}?mode=ro', uri=True)
           |n, s = c.execute('SELECT count(*), sum(val) FROM samples').fetchone()
           |big = c.execute('SELECT length(name) FROM samples WHERE rowid = 401').fetchone()[0]
           |first = c.execute('SELECT name, val, score FROM samples WHERE rowid = 2').fetchone()
           |print(n, s, big, first[0], first[1], first[2])
           |""".stripMargin)
      assert(rc == 0, out)
      val expSum = (0 until 400).map(_.toLong * 1000003L).sum
      assert(out.trim == s"401 $expSum 15000 name-1 1000003 0.25", out)
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("damage and profile gaps degrade, never throw") {
    val rows = (0 until 50).map(i => Seq[Any](s"n$i", i.toLong, null,
      Array.emptyByteArray))
    val db = Sqlite.synthDb("t", "a TEXT, b INTEGER, c REAL, d BLOB", rows)
    assert(Sqlite.rows(db, "missing") == null)
    for (cut <- Seq(10, 99, 120, db.length / 2))
      assert(Sqlite.rows(java.util.Arrays.copyOf(db, cut), "t") == null,
        s"cut=$cut")
    val bad = db.clone()
    bad(0) = 'X'.toByte
    assert(Sqlite.tables(bad) == null && !Sqlite.isSqlite(bad))
    // UTF-16 encoding flag: named profile, not damage
    val u16 = db.clone()
    u16(59) = 2
    assert(Sqlite.tables(u16) == null)
    assert(Sqlite.unsupportedProfile(u16))
    assert(!Sqlite.unsupportedProfile(db))
    // a corrupted page type inside the tree
    val pt = db.clone()
    pt(4096) = 10 // root page becomes an index leaf
    assert(Sqlite.rows(pt, "t") == null)
  }
}
