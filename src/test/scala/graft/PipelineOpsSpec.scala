package graft

import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Merge, Profile, Redact, Search}

/** Specs for the warehouse-ops surface: profiler, merge, anomaly,
  * redaction, BM25 search.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("profile_table: counts, nulls, distincts, canonical min/max") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("b"), None),
      (3L, None, Some(2.5)),
      (4L, Some("a"), Some(1.5))
    ).toDF("id", "s", "v")
    val p = Profile.table(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("profile_table: approx variant shares the schema") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val exact = Profile.table(df, Seq("id", "s"))
    val approx = Profile.table(df, Seq("id", "s"), exact = false)
    assert(exact.schema == approx.schema)
    assert(approx.count() == 2)
  }

  test("merge upsert: updated, inserted, kept partition the output") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 99.0))
      .toDF("k", "name", "price")
    val out = Merge.upsert(target, updates, Seq("k"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    assert(out(1L) == (("a", 10.0, "kept")))
    assert(out(2L) == (("b2", 25.0, "updated")))
    assert(out(3L) == (("c", 30.0, "kept")))
    assert(out(9L) == (("new", 99.0, "inserted")))
    assert(out.size == 4)
  }

  test("merge upsert rejects mismatched schemas") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x", 2.0)).toDF("k", "v", "w")
    intercept[IllegalArgumentException] {
      Merge.upsert(a, b, Seq("k"))
    }
  }

  test("anomaly zscore flags exactly the planted outlier") {
    // 40 tight values + one far outlier per group.
    val rows = (for {
      g <- Seq("a", "b")
      i <- 1 to 40
    } yield (s"$g$i", g, 10.0 + (i % 3) * 0.01)) :+
      (("aX", "a", 500.0)) :+ (("bX", "b", 0.01))
    val df = rows.toDF("id", "grp", "value")
    val out = Anomaly.zscoreOutliers(df, "value", Seq("grp"), 3.0)
      .select("id").as[String].collect().toSet
    assert(out == Set("aX", "bX"))
  }

  test("anomaly MAD: flags the planted spike, zero-MAD flags nothing") {
    // spread 1..9 (MAD well-defined) + one far spike
    val rows = ((1 to 9).map(i => (i.toLong, i.toDouble)) :+ ((100L, 1000.0)))
    val df = rows.toDF("event_id", "value")
    val got = Anomaly.madOutliers(df, "value", threshold = 3.5)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(100L), s"flagged $got")
    // degenerate constant column → MAD 0 → guard yields zero flags,
    // never a divide-by-zero NaN flood
    val flat = (1 to 21).map(i => (i.toLong, 7.0)).toDF("event_id", "value")
    assert(Anomaly.madOutliers(flat, "value").count() == 0)
    // partition invariance (histogram counts are exact integers)
    val p = Anomaly.madOutliers(df.repartition(7), "value", threshold = 3.5)
      .select("event_id").as[Long].collect().toSet
    assert(p == got)
  }

  test("anomaly zscore: fixed-point moments are partition-invariant") {
    val df = Tables1.events(spark, sf001)
    val z1 = Anomaly.zscoreOutliers(df, "value", Seq("event_type"), 3.0)
      .select("event_id", "z").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val z2 = Anomaly.zscoreOutliers(df.repartition(13), "value",
        Seq("event_type"), 3.0)
      .select("event_id", "z").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(z1 == z2 && z1.nonEmpty)
  }

  test("redaction replaces email, ip, phone and counts hits") {
    val df = Seq(
      (1L, "mail a.b@c.org and x@y.io, call 555-1234 from 10.0.0.1"),
      (2L, "no pii here")
    ).toDF("id", "text")
    val out = Redact.redactPii(df, "text")
      .select("id", "n_email", "n_ip", "n_phone", "redacted").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) == ((2, 1, 1,
      "mail <EMAIL> and <EMAIL>, call <PHONE> from <IP>")))
    assert(out(2L) == ((0, 0, 0, "no pii here")))
  }

  test("redaction order: emails never half-eaten by the ip pattern") {
    val df = Seq((1L, "v1.2.3.4@host.com")).toDF("id", "text")
    val r = Redact.redactPii(df, "text").select("redacted")
      .as[String].head()
    assert(r == "<EMAIL>")
  }

  test("bm25: relevant docs rank first, k bounds the output") {
    val docs = Seq(
      (1L, "hash join hash join hash"),
      (2L, "hash once among many other words here now"),
      (3L, "window agg stream"),
      (4L, "totally unrelated text")
    ).toDF("doc_id", "text")
    val qs = Seq((0, "hash"), (0, "join")).toDF("query_id", "term")
    val out = Search.bm25TopK(docs, "doc_id", "text", qs, k = 2).collect()
    assert(out.length == 2)
    val top = out.find(_.getInt(3) == 1).get
    assert(top.getLong(1) == 1L) // the hash-join-dense doc wins
    assert(out.forall(_.getDouble(2) > 0.0))
  }

  test("rrfFuse: both-list docs beat single-list docs, exact integer scores") {
    val lex = Seq((0, 10L, 1), (0, 11L, 2), (0, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val den = Seq((0, 11L, 1), (0, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(lex, den), "query_id", "doc_id", k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getInt(3))).toMap
    // doc 11: ranks 2 (lex) + 1 (den) = 1000000/62 + 1000000/61
    assert(got(11L)._1 == 1000000L / 62 + 1000000L / 61)
    assert(got(11L)._2 == 1) // fused winner despite topping neither... both
    assert(got(10L)._1 == 1000000L / 61)
    // single-list docs trail the both-list doc
    assert(got(10L)._2 == 2 && got(13L)._2 == 3 && got(12L)._2 == 4)
  }

  test("cusumDrift finds the planted level shift, partition-invariant") {
    import java.sql.Timestamp
    def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    // user 1: value 10 for 10 events, then 20 for 10 events — the
    // cumulative deviation |n·p − i·S| peaks exactly at the shift
    val rows = (1 to 10).map(i => (i.toLong, 1L, 10.0, ts(i))) ++
      (11 to 20).map(i => (i.toLong, 1L, 20.0, ts(i)))
    val df = rows.toDF("event_id", "user_id", "value", "ts")
    val got = graft.operators.Anomaly
      .cusumDrift(df, "value", "ts", "event_id", Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1)
    assert(got.head._2 == 10L, s"drift peak should be at the shift: $got")
    // hand replay: mean = 15, prefix at i=10 is 100 -> p - i·mean = -50
    assert(math.abs(got.head._3 - (-50.0)) < 1e-9)
    val again = graft.operators.Anomaly
      .cusumDrift(df.repartition(7), "value", "ts", "event_id", Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("sessionPaths: gap splits sessions, paths order by time, top-k counts") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 1, session 1: a>b ; session 2 (2h later): c
      (101L, 1L, "a", ts(0)), (102L, 1L, "b", ts(10)), (103L, 1L, "c", ts(130)),
      // user 2, one session: a>b (same timestamps, id tie-break inside)
      (201L, 2L, "a", ts(5)), (202L, 2L, "b", ts(5)),
      // user 3, one session: c
      (301L, 3L, "c", ts(7))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.operators.Funnel.sessionPaths(ev, "user_id", "ts",
        "event_id", "event_type", gapSec = 1800L, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b" -> 2L, "c" -> 2L))
    // k bounds output with the (count desc, path) total order
    val top1 = graft.operators.Funnel.sessionPaths(ev, "user_id", "ts",
        "event_id", "event_type", gapSec = 1800L, k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("a>b"))
  }

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val oldV = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
    ).toDF("k", "s", "v")
    val newV = Seq(
      (1L, "a", 10),          // unchanged -> dropped
      (2L, "B", 20),          // case-insensitive hash -> unchanged
      (3L, "c", 99),          // update
      (5L, "e", 50)           // insert; 4 deleted
    ).toDF("k", "s", "v")
    val got = Merge.snapshotDiff(oldV, newV, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("tfidf top terms: rare term outranks common term, hand replay exact") {
    val docs = Seq(
      (1L, "alpha alpha alpha common"),
      (2L, "beta common common"),
      (3L, "gamma common"),
      (4L, "common common")
    ).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    // doc 1: alpha tf=3 df=1 -> 3 * (4<<20 // 1); common tf=1 df=4 -> 1<<20
    val a = out.find(t => t._1 == 1L && t._6 == 1).get
    assert(a._2 == "alpha" && a._5 == 3L * ((4L << 20) / 1))
    val c = out.find(t => t._1 == 1L && t._6 == 2).get
    assert(c._2 == "common" && c._5 == (4L << 20) / 4)
    // every doc emits <= 2 ranked rows, ranks contiguous from 1
    out.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._6).sorted.toSeq == (1 to g.length)) }
  }

  test("morton code interleaves bits (known values)") {
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
    val out = df.select(operators.Zorder.mortonCode(col("x"), col("y"), 8)
      .as("z")).as[Long].collect().toSeq
    // x=101b,y=011b -> z = x0 + y0<<1 + y1<<3 + x2<<4 = 1+2+8+16 = 27
    assert(out == Seq(27L, 0L, 21L, 42L))
  }

  test("z-ordered files bound BOTH dimensions (data-skipping layout)") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    operators.Zorder.writeZordered(df, s"$dir/t", numFiles = 16, "x", "y",
      bits = 6)
    val spans = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val p = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (p.getLong(1) - p.getLong(0), p.getLong(3) - p.getLong(2))
      }
    assert(spans.size > 4)
    // Files cover COMPACT rectangles in both dims — far below the
    // 63-wide global span (a single-key sort gives span 63 in the other
    // dim for EVERY file). A file whose code range straddles a top-level
    // Morton quadrant boundary can legitimately span wide in one dim, so
    // allow a few straddlers; a single-key layout would fail this for
    // every file.
    assert(spans.count { case (sx, sy) => sx <= 31 && sy <= 31 }
      >= spans.size - 3)
  }

  test("percentileRank equals percent_rank over (score, id)") {
    val df = Tables1.docs(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.TextOps.qualityScore(col("text")).as("q"))
    val viaOp = operators.TrainingOrder.percentileRank(df, "q", "doc_id")
      .select("doc_id", "pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaWindow = df.withColumn("pct", round(
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("q"), col("doc_id"))), 6))
      .select("doc_id", "pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaOp == viaWindow && viaOp.nonEmpty)
  }

  test("percentileRank is partition-invariant") {
    val df = Tables1.docs(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.TextOps.qualityScore(col("text")).as("q"))
    def run(d: org.apache.spark.sql.DataFrame) =
      operators.TrainingOrder.percentileRank(d, "q", "doc_id")
        .select("doc_id", "pct").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(df) == run(df.repartition(11)))
  }

  test("grouped HLL: sane per-group estimates, partition-invariant") {
    val ev = Tables1.events(spark, sf001)
    def run(d: org.apache.spark.sql.DataFrame) =
      operators.Sketches.hllDistinctByGroup(d, "event_type", "user_id")
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getDouble(3))).toMap
    val est = run(ev)
    assert(est.size == 5)
    est.values.foreach { case (exact, hll) =>
      assert(hll > exact * 0.5 && hll < exact * 2.0,
        s"HLL estimate $hll far from exact $exact")
    }
    assert(run(ev.repartition(13)) == est)
  }

  test("funnel: strict event-time order, per-stage earliest chain") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // u1: full chain in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: click BEFORE view — chain stops at view
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // u3: purchase before click — view->click only
      (3L, ts(1), "view"), (3L, ts(2), "purchase"), (3L, ts(3), "click"),
      // u4: never viewed — absent from output
      (4L, ts(1), "click"), (4L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = operators.Funnel.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out(1L) == ((false, false, false)))
    assert(out(2L) == ((false, true, true)))
    assert(out(3L) == ((false, false, true)))
    assert(!out.contains(4L))
  }

  test("url canonicalization: utm, fragment, host case") {
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM/Path?utm_source=a&id=3#frag",
        "https://www.ex.com/Path?id=3"),
      ("http://ex.com/p?id=1&utm_campaign=x&q=2", "http://ex.com/p?id=1&q=2"),
      ("http://ex.com/p?utm_a=1", "http://ex.com/p"),
      ("http://EX.com/p?utm_a=1&utm_b=2&z=9", "http://ex.com/p?z=9"),
      ("no-scheme/path?utm_x=1", "no-scheme/path"),
      ("http://ex.com/CasePreserved/PATH", "http://ex.com/CasePreserved/PATH"))
    val df = cases.map(_._1).zipWithIndex.map(_.swap).toDF("i", "u")
    val got = df.select(col("i"), operators.Urls.canonicalizeUrl(col("u")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i) == want, s"case $i")
    }
  }

  test("bm25 scores are partition-invariant (fixed-point term sums)") {
    val docs = Tables1.docs(spark, sf001)
    val qs = Seq((0, "hash"), (0, "join"), (1, "slow")).toDF("query_id", "term")
    def run(d: org.apache.spark.sql.DataFrame) =
      Search.bm25TopK(d, "doc_id", "text", qs, k = 5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    assert(run(docs) == run(docs.repartition(17)) && run(docs).nonEmpty)
  }
}

/** Tiny loader shims so the spec reads fixture tables through the same
  * path the queries do.
  */
private object Tables1 {
  def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.sources.Tables.load(s, dir, "events")
  def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.sources.Tables.load(s, dir, "documents")
}
