package graft.operators

/** From-scratch SQLite database-file reader — the single-file format
  * countless scraped datasets and annotation drops ship in. Reads
  * the documented on-disk structure (sqlite.org/fileformat2): the
  * 100-byte header, table B-trees (interior + leaf pages), cell
  * payload OVERFLOW chains with the exact local-payload split
  * formula, and the record serial-type system (ints 1-6, float64,
  * the 8/9 constant forms, text and blob). The schema table on page
  * 1 resolves table names to root pages.
  *
  * Scope: table B-trees in rollback-journal databases (the shipped-
  * file shape; a WAL snapshot's main file still reads). Index
  * B-trees, pointer maps (auto-vacuum), and non-UTF8 encodings are
  * named profile gaps. Degrade-don't-throw: null on damage.
  *
  * The write side ([[synthDb]]) builds real databases — leaf pages
  * split under an interior root, overflow chains emitted — that the
  * reference implementation reads back (live python3 sqlite3 pin in
  * the spec, both directions).
  */
object Sqlite {

  /** One decoded column value: NULL, Long, Double, String, or
    * Array[Byte].
    */
  type Value = Any

  final case class Row(rowid: Long, values: Array[Value])

  // "SQLite format 3" + NUL - built without a raw control byte so
  // the source file stays text to git
  private val Magic: Array[Byte] =
    "SQLite format 3".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte

  def isSqlite(b: Array[Byte]): Boolean =
    b != null && b.length >= 100 && (0 until 16).forall(i => b(i) == Magic(i))

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** (value, bytesConsumed) of a SQLite varint (big-endian 7-bit
    * groups, 9th byte carries 8 bits).
    */
  private def varint(b: Array[Byte], i: Int): (Long, Int) = {
    var v = 0L
    var k = 0
    while (k < 8) {
      if (i + k >= b.length) return null
      val c = b(i + k) & 0xFF
      v = (v << 7) | (c & 0x7F)
      k += 1
      if ((c & 0x80) == 0) return (v, k)
    }
    if (i + 8 >= b.length) return null
    ((v << 8) | (b(i + 8) & 0xFF), 9)
  }

  private final class Db(val b: Array[Byte]) {
    val pageSize: Int = {
      val raw = beU16(b, 16)
      if (raw == 1) 65536 else raw
    }
    val reserved: Int = b(20) & 0xFF
    val usable: Int = pageSize - reserved
    val encoding: Long = beU32(b, 56)
    // cap the declared page count by the actual file: a forged header
    // must not push pageOff past (or wrapped around) the array
    val nPages: Long = math.min(beU32(b, 28), b.length.toLong / pageSize)
    def pageOff(p: Long): Int = ((p - 1) * pageSize).toInt
    // overflow split thresholds for TABLE leaves (fileformat2 §B-tree)
    val maxLeaf: Int = usable - 35
    val minLeaf: Int = (usable - 12) * 32 / 255 - 23
  }

  /** Collect the payload bytes of one cell, following overflow pages
    * when the record outgrows its local share. Null on damage.
    */
  private def payload(db: Db, page: Int, cellOff: Int, total: Long,
      localAvail: Int): Array[Byte] = {
    val b = db.b
    // a payload can't exceed the file it lives in (also bounds the
    // preallocation below)
    if (total < 0 || total > b.length) return null
    val local =
      if (total <= db.maxLeaf) total.toInt
      else {
        val k = db.minLeaf + ((total - db.minLeaf) % (db.usable - 4)).toInt
        if (k <= db.maxLeaf) k else db.minLeaf
      }
    if (cellOff + local > b.length) return null
    if (local == total) {
      if (local > localAvail) return null
      return java.util.Arrays.copyOfRange(b, cellOff, cellOff + local)
    }
    if (cellOff + local + 4 > b.length) return null
    val out = new java.io.ByteArrayOutputStream(total.toInt)
    out.write(b, cellOff, local)
    var next = beU32(b, cellOff + local)
    var remaining = total - local
    var guard = 0
    while (remaining > 0) {
      guard += 1
      if (next <= 0 || next > db.nPages || guard > 100000) return null
      val po = db.pageOff(next)
      if (po + db.usable > b.length) return null
      val take = math.min(remaining, (db.usable - 4).toLong).toInt
      out.write(b, po + 4, take)
      remaining -= take
      next = beU32(b, po)
    }
    out.toByteArray
  }

  /** Decode one record payload into column values. */
  private def record(p: Array[Byte]): Array[Value] = {
    val h = varint(p, 0)
    if (h == null) return null
    val hdrSize = h._1
    if (hdrSize < h._2 || hdrSize > p.length) return null
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    var q = h._2
    while (q < hdrSize) {
      val t = varint(p, q)
      if (t == null) return null
      types += t._1
      q += t._2
    }
    val out = new Array[Value](types.length)
    var body = hdrSize.toInt
    for (i <- types.indices) {
      val t = types(i)
      def ints(n: Int): Long = {
        var v = 0L
        var k = 0
        while (k < n) { v = (v << 8) | (p(body + k) & 0xFF); k += 1 }
        // sign-extend from n bytes
        val shift = 64 - 8 * n
        (v << shift) >> shift
      }
      t match {
        case 0 => out(i) = null
        case 1 => out(i) = ints(1); body += 1
        case 2 => out(i) = ints(2); body += 2
        case 3 => out(i) = ints(3); body += 3
        case 4 => out(i) = ints(4); body += 4
        case 5 => out(i) = ints(6); body += 6
        case 6 => out(i) = ints(8); body += 8
        case 7 =>
          out(i) = java.lang.Double.longBitsToDouble(ints(8)); body += 8
        case 8 => out(i) = 0L
        case 9 => out(i) = 1L
        case n if n >= 12 && n % 2 == 0 =>
          // Bound the 64-bit serial type BEFORE narrowing: 2^33+12 would
          // otherwise truncate to len=0 and silently decode an empty blob.
          val lenL = (n - 12) / 2
          if (lenL < 0 || lenL > p.length - body) return null
          val len = lenL.toInt
          out(i) = java.util.Arrays.copyOfRange(p, body, body + len)
          body += len
        case n if n >= 13 =>
          val lenL = (n - 13) / 2
          if (lenL < 0 || lenL > p.length - body) return null
          val len = lenL.toInt
          out(i) = new String(p, body, len,
            java.nio.charset.StandardCharsets.UTF_8)
          body += len
        case _ => return null // 10/11 reserved
      }
      if (body > p.length) return null
    }
    out
  }

  /** Walk one table B-tree, collecting every leaf row in key order. */
  private def walk(db: Db, page: Long,
      out: scala.collection.mutable.ArrayBuffer[Row], depth: Int): Boolean = {
    if (depth > 40 || page <= 0 || page > db.nPages) return false
    val b = db.b
    val po = db.pageOff(page)
    val hdr = po + (if (page == 1) 100 else 0)
    if (hdr + 8 > b.length) return false
    val ptype = b(hdr) & 0xFF
    val nCells = beU16(b, hdr + 3)
    ptype match {
      case 13 => // table leaf
        var c = 0
        while (c < nCells) {
          val cp = beU16(b, hdr + 8 + 2 * c)
          if (po + cp >= b.length) return false
          val pl = varint(b, po + cp)
          if (pl == null) return false
          val rid = varint(b, po + cp + pl._2)
          if (rid == null) return false
          val dataOff = po + cp + pl._2 + rid._2
          val pay = payload(db, page.toInt, dataOff, pl._1,
            b.length - dataOff)
          if (pay == null) return false
          val vals = record(pay)
          if (vals == null) return false
          out += Row(rid._1, vals)
          c += 1
        }
        true
      case 5 => // table interior: 12-byte header, pointers from +12
        var c = 0
        while (c < nCells) {
          val cp = beU16(b, hdr + 12 + 2 * c)
          if (po + cp + 4 > b.length) return false
          if (!walk(db, beU32(b, po + cp), out, depth + 1)) return false
          c += 1
        }
        walk(db, beU32(b, hdr + 8), out, depth + 1) // right-most
      case _ => false // index pages inside a table tree = damage
    }
  }

  /** The schema table: (type, name, tbl_name, rootpage) rows. */
  def tables(b: Array[Byte]): Array[(String, Long)] = try {
    if (!isSqlite(b)) return null
    val db = new Db(b)
    if (db.encoding != 1) return null // UTF-16 encodings: named gap
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    if (!walk(db, 1, rows, 0)) return null
    rows.toArray.flatMap { r =>
      if (r.values.length >= 4 && r.values(0) == "table")
        r.values(1) match {
          case name: String => r.values(3) match {
            case root: java.lang.Long => Some((name, root.longValue()))
            case _ => None
          }
          case _ => None
        }
      else None
    }
  } catch {
    case _: IndexOutOfBoundsException => null
    case _: IllegalArgumentException => null
    case _: NegativeArraySizeException => null
  }

  /** Every row of `table`, in rowid order; null when absent/damaged. */
  def rows(b: Array[Byte], table: String): Array[Row] = try {
    val ts = tables(b)
    if (ts == null) return null
    ts.find(_._1 == table) match {
      case None => null
      case Some((_, root)) =>
        val db = new Db(b)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        if (!walk(db, root, out, 0)) null else out.toArray
    }
  } catch {
    case _: IndexOutOfBoundsException => null
    case _: IllegalArgumentException => null
    case _: NegativeArraySizeException => null
  }

  /** A UTF-16 or auto-vacuum database is a named profile, not
    * damage.
    */
  def unsupportedProfile(b: Array[Byte]): Boolean =
    isSqlite(b) && b.length >= 100 &&
      (beU32(b, 56) == 2 || beU32(b, 56) == 3 || beU32(b, 52) != 0)

  // ---- write side ------------------------------------------------------

  private def varintBytes(v: Long): Array[Byte] = {
    if (v < 0) { // 9-byte form
      val out = new Array[Byte](9)
      var x = v
      out(8) = (x & 0xFF).toByte
      x >>>= 8
      var i = 7
      while (i >= 0) { out(i) = (0x80 | (x & 0x7F)).toByte; x >>>= 7; i -= 1 }
      return out
    }
    val groups = scala.collection.mutable.ArrayBuffer.empty[Int]
    var x = v
    do { groups += (x & 0x7F).toInt; x >>>= 7 } while (x != 0)
    val out = new Array[Byte](groups.length)
    for (i <- out.indices)
      out(i) = ((groups(groups.length - 1 - i)) |
        (if (i < out.length - 1) 0x80 else 0)).toByte
    out
  }

  private def serial(v: Value): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case l: Long =>
      def be(n: Int): Array[Byte] =
        Array.tabulate(n)(i => ((l >> (8 * (n - 1 - i))) & 0xFF).toByte)
      if (l == 0) (8L, Array.emptyByteArray)
      else if (l == 1) (9L, Array.emptyByteArray)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) (1L, be(1))
      else if (l >= Short.MinValue && l <= Short.MaxValue) (2L, be(2))
      else if (l >= -(1L << 23) && l < (1L << 23)) (3L, be(3))
      else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, be(4))
      else if (l >= -(1L << 47) && l < (1L << 47)) (5L, be(6))
      else (6L, be(8))
    case d: Double =>
      val bits = java.lang.Double.doubleToLongBits(d)
      (7L, Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xFF).toByte))
    case s: String =>
      val u = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (13L + 2 * u.length, u)
    case a: Array[Byte] => (12L + 2 * a.length, a)
    case x => throw new IllegalArgumentException(s"value $x")
  }

  private def recordBytes(values: Seq[Value]): Array[Byte] = {
    val parts = values.map(serial)
    val typeB = parts.map(p => varintBytes(p._1))
    // the header-size varint counts ITSELF: fixpoint on its width
    val typesLen = typeB.map(_.length).sum
    var selfLen = 1
    while (varintBytes((typesLen + selfLen).toLong).length != selfLen)
      selfLen = varintBytes((typesLen + selfLen).toLong).length
    val hdrLen = typesLen + selfLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(varintBytes(hdrLen.toLong), 0, selfLen)
    typeB.foreach(t => out.write(t, 0, t.length))
    parts.foreach(p => out.write(p._2, 0, p._2.length))
    out.toByteArray
  }

  /** Build a real single-table database: `CREATE TABLE <table>
    * (<ddl>)` in the schema, rows at sequential rowids from 1. Leaf
    * pages split under one interior root when needed; records larger
    * than the local maximum spill to overflow chains. Page size
    * 4096, rollback-journal mode, UTF-8.
    */
  def synthDb(table: String, ddl: String,
      rowValues: Seq[Seq[Value]]): Array[Byte] = {
    val pageSize = 4096
    val usable = pageSize
    val maxLeaf = usable - 35
    val minLeaf = (usable - 12) * 32 / 255 - 23
    // ---- build leaf cells (payload splits to overflow) ----
    def makeCell(rowid: Long, rec: Array[Byte]): (Array[Byte], Array[Byte]) = {
      // returns (cell-without-overflow-pointer, overflowData or null)
      val pl = varintBytes(rec.length.toLong)
      val rid = varintBytes(rowid)
      if (rec.length <= maxLeaf)
        (pl ++ rid ++ rec, null)
      else {
        val k = minLeaf + (rec.length - minLeaf) % (usable - 4)
        val local = if (k <= maxLeaf) k else minLeaf
        (pl ++ rid ++ rec.take(local), rec.drop(local))
      }
    }
    // ---- page assembly: page 1 = header+schema, data pages from 2 ----
    final case class PendingLeaf(cells: Seq[(Array[Byte], Array[Byte])],
        rowids: Seq[Long])
    // pack cells into leaves
    val leaves = scala.collection.mutable.ArrayBuffer.empty[PendingLeaf]
    var curCells = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    var curRowids = scala.collection.mutable.ArrayBuffer.empty[Long]
    var curSize = 8 // leaf header
    for ((vals, idx) <- rowValues.zipWithIndex) {
      val rowid = idx + 1L
      val rec = recordBytes(vals)
      val (cell, over) = makeCell(rowid, rec)
      val cellTotal = cell.length + (if (over != null) 4 else 0)
      if (curCells.nonEmpty && curSize + 2 + cellTotal > usable) {
        leaves += PendingLeaf(curCells.toSeq, curRowids.toSeq)
        curCells = scala.collection.mutable.ArrayBuffer.empty
        curRowids = scala.collection.mutable.ArrayBuffer.empty
        curSize = 8
      }
      curCells += ((cell, over))
      curRowids += rowid
      curSize += 2 + cellTotal
    }
    leaves += PendingLeaf(curCells.toSeq, curRowids.toSeq)
    // page numbering: page 1 = header/schema, then root (if interior)
    // or single leaf; allocate:
    val multi = leaves.length > 1
    val rootPage = 2
    var nextPage = if (multi) 3 else 2
    val leafPageNums = leaves.map { _ => val p = nextPage; nextPage += 1; p }
    if (!multi) { /* single leaf IS the root at page 2 */ }
    // overflow chains allocate after leaves
    val built = scala.collection.mutable.LinkedHashMap.empty[Int, Array[Byte]]
    def buildOverflow(data: Array[Byte]): Int = {
      // returns first overflow page number
      var chunks = data.grouped(usable - 4).toSeq
      val nums = chunks.map { _ => val p = nextPage; nextPage += 1; p }
      for (i <- chunks.indices) {
        val pg = new Array[Byte](pageSize)
        val next = if (i + 1 < chunks.length) nums(i + 1) else 0
        pg(0) = ((next >> 24) & 0xFF).toByte
        pg(1) = ((next >> 16) & 0xFF).toByte
        pg(2) = ((next >> 8) & 0xFF).toByte
        pg(3) = (next & 0xFF).toByte
        System.arraycopy(chunks(i), 0, pg, 4, chunks(i).length)
        built(nums(i)) = pg
      }
      nums.head
    }
    def leafPage(pl: PendingLeaf): Array[Byte] = {
      val pg = new Array[Byte](pageSize)
      pg(0) = 13
      val n = pl.cells.length
      pg(3) = ((n >> 8) & 0xFF).toByte
      pg(4) = (n & 0xFF).toByte
      var content = usable
      for ((c, i) <- pl.cells.zipWithIndex) {
        val full =
          if (c._2 == null) c._1
          else {
            val first = buildOverflow(c._2)
            c._1 ++ Array[Byte](((first >> 24) & 0xFF).toByte,
              ((first >> 16) & 0xFF).toByte, ((first >> 8) & 0xFF).toByte,
              (first & 0xFF).toByte)
          }
        content -= full.length
        System.arraycopy(full, 0, pg, content, full.length)
        pg(8 + 2 * i) = ((content >> 8) & 0xFF).toByte
        pg(8 + 2 * i + 1) = (content & 0xFF).toByte
      }
      pg(5) = ((content >> 8) & 0xFF).toByte
      pg(6) = (content & 0xFF).toByte
      pg
    }
    for ((pl, i) <- leaves.zipWithIndex) built(leafPageNums(i)) = leafPage(pl)
    if (multi) {
      val pg = new Array[Byte](pageSize)
      pg(0) = 5
      val n = leaves.length - 1 // last leaf is the right-most pointer
      pg(3) = ((n >> 8) & 0xFF).toByte
      pg(4) = (n & 0xFF).toByte
      val rm = leafPageNums.last
      pg(8) = ((rm >> 24) & 0xFF).toByte
      pg(9) = ((rm >> 16) & 0xFF).toByte
      pg(10) = ((rm >> 8) & 0xFF).toByte
      pg(11) = (rm & 0xFF).toByte
      var content = usable
      for (i <- 0 until n) {
        val child = leafPageNums(i)
        val key = varintBytes(leaves(i).rowids.last)
        val cell = Array[Byte](((child >> 24) & 0xFF).toByte,
          ((child >> 16) & 0xFF).toByte, ((child >> 8) & 0xFF).toByte,
          (child & 0xFF).toByte) ++ key
        content -= cell.length
        System.arraycopy(cell, 0, pg, content, cell.length)
        pg(12 + 2 * i) = ((content >> 8) & 0xFF).toByte
        pg(12 + 2 * i + 1) = (content & 0xFF).toByte
      }
      pg(5) = ((content >> 8) & 0xFF).toByte
      pg(6) = (content & 0xFF).toByte
      built(rootPage) = pg
    }
    // ---- page 1: header + schema leaf ----
    val totalPages = nextPage - 1
    val p1 = new Array[Byte](pageSize)
    System.arraycopy(Magic, 0, p1, 0, 16)
    p1(16) = ((pageSize >> 8) & 0xFF).toByte
    p1(17) = (pageSize & 0xFF).toByte
    p1(18) = 1; p1(19) = 1 // file format versions
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // fractions (fixed by spec)
    def w32(off: Int, v: Long): Unit = {
      p1(off) = ((v >> 24) & 0xFF).toByte
      p1(off + 1) = ((v >> 16) & 0xFF).toByte
      p1(off + 2) = ((v >> 8) & 0xFF).toByte
      p1(off + 3) = (v & 0xFF).toByte
    }
    w32(24, 1) // change counter
    w32(28, totalPages.toLong)
    w32(44, 4) // schema format
    w32(48, 0) // default page cache
    w32(56, 1) // UTF-8
    w32(60, 0); w32(64, 0)
    w32(92, 1) // version-valid-for
    w32(96, 3045001L) // sqlite version number
    // schema leaf btree at offset 100
    val sql = s"CREATE TABLE $table ($ddl)"
    val schemaRec = recordBytes(Seq("table", table, table,
      rootPage.toLong, sql))
    val cell = varintBytes(schemaRec.length.toLong) ++ varintBytes(1L) ++
      schemaRec
    require(cell.length <= maxLeaf - 100, "schema record too large")
    p1(100) = 13
    p1(103) = 0; p1(104) = 1 // one cell
    val content = usable - cell.length
    System.arraycopy(cell, 0, p1, content, cell.length)
    p1(105) = ((content >> 8) & 0xFF).toByte // content-area start
    p1(106) = (content & 0xFF).toByte
    p1(108) = ((content >> 8) & 0xFF).toByte // cell pointer array
    p1(109) = (content & 0xFF).toByte        // (100 + 8-byte header)
    val out = new java.io.ByteArrayOutputStream(pageSize * totalPages)
    out.write(p1, 0, pageSize)
    for (p <- 2 to totalPages)
      out.write(built.getOrElse(p, new Array[Byte](pageSize)), 0, pageSize)
    out.toByteArray
  }
}
