package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Retention}

class WarehouseOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention cohorts: staggered users land in their own cohorts") {
    import spark.implicits._
    val ev = Seq(
      // u1: first event Mon Jan 1 week, active again weeks +1 and +3
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      // u2: same cohort as u1, only week 0
      (2L, ts("2024-01-03 09:00:00")),
      // u3: cohort of Jan 8, active week 0 twice (counted once) and +1
      (3L, ts("2024-01-08 08:00:00")), (3L, ts("2024-01-10 08:00:00")),
      (3L, ts("2024-01-17 08:00:00")))
      .toDF("user_id", "ts")
    val out = Retention.cohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
  }

  test("cdc apply: last writer wins, trailing delete removes the key") {
    import spark.implicits._
    import graft.operators.Merge
    val changes = Seq(
      // key 1: upsert then newer upsert → latest value survives
      (1L, 10L, 100L, "a", false),
      (1L, 20L, 101L, "b", false),
      // key 2: upsert then delete → key disappears
      (2L, 10L, 102L, "c", false),
      (2L, 30L, 103L, "d", true),
      // key 3: delete then LATER upsert → key resurrects
      (3L, 10L, 104L, "e", true),
      (3L, 40L, 105L, "f", false),
      // key 4: same ts, tiebreak on change id (106 < 107)
      (4L, 50L, 106L, "g", false),
      (4L, 50L, 107L, "h", false)
    ).toDF("k", "ts", "chg_id", "v", "is_delete")
    val got = Merge.applyCdc(changes, Seq("k"), Seq("ts", "chg_id"), "is_delete")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 3L -> "f", 4L -> "h"))
    // partition invariance: exact integers + total order per key
    val again = Merge.applyCdc(changes.repartition(7), Seq("k"),
      Seq("ts", "chg_id"), "is_delete")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("scd2: closes current rows, appends changes, preserves closed history") {
    import spark.implicits._
    import graft.operators.Merge
    // key 1 already has a closed v1 and a current v2; key 2 only current v1
    val hist = Seq(
      (1L, 10L, 1, Some(2)), (1L, 12L, 2, None),
      (2L, 20L, 1, None))
      .toDF("k", "v", "valid_from", "valid_to")
    val changes = Seq((1L, 15L)).toDF("k", "v")
    val out = Merge.scd2(hist, changes, Seq("k"), version = 3)
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSeq
    assert(out == Seq(
      (1L, 10L, 1, 2),   // closed history untouched
      (1L, 12L, 2, 3),   // current row closed at v3
      (1L, 15L, 3, -1),  // change appended as new current
      (2L, 20L, 1, -1))) // unmatched key untouched
  }

  test("linkage: identical names link, disjoint names don't, jaccard exact") {
    import spark.implicits._
    import graft.operators.Linkage
    val a = Seq((1L, "navy blue lace"), (2L, "crimson rose")).toDF("id", "name")
    val b = Seq((10L, "navy blue lace"), (11L, "zzz qqq xxx")).toDF("id", "name")
    val out = Linkage.trigramJoin(a, b, "id", "name", "id", "name", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L))) // exact name match: jaccard = 1
    // identical strings: shared == union
    val row = Linkage.trigramJoin(a, b, "id", "name", "id", "name", 100)
      .head
    assert(row.getLong(2) == row.getLong(3))
  }

  test("gapfill: silent hours carry the last observed value forward") {
    import spark.implicits._
    import graft.operators.Gapfill
    val ev = Seq(
      (1L, ts("2024-01-01 00:15:00"), "a", 5L),
      (2L, ts("2024-01-01 00:45:00"), "a", 7L),  // same hour, later => wins
      (3L, ts("2024-01-01 03:10:00"), "a", 9L),  // hours 1-2 silent
      (4L, ts("2024-01-01 01:00:00"), "b", 1L))
      .toDF("event_id", "ts", "event_type", "cents")
    val out = Gapfill.hourlyFfill(ev, "event_type", "ts", "event_id",
        org.apache.spark.sql.functions.col("cents"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(out == Set(
      ("a", "2024-01-01 00:00:00.0", 7L),
      ("a", "2024-01-01 01:00:00.0", 7L),
      ("a", "2024-01-01 02:00:00.0", 7L),
      ("a", "2024-01-01 03:00:00.0", 9L),
      ("b", "2024-01-01 01:00:00.0", 1L)))
  }

  test("incremental agg: merge of per-batch states == full recompute") {
    import spark.implicits._
    val full = Seq(("a", 1L), ("a", 5L), ("b", -2L), ("a", 3L), ("b", 7L),
      ("c", 0L)).toDF("k", "v")
    val b1 = full.where(col("v") < 3)
    val b2 = full.where(col("v") >= 3)
    val merged = IncrementalAgg.merge(
      IncrementalAgg.state(b1, Seq("k"), "v"),
      IncrementalAgg.state(b2, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().toSeq
    val direct = IncrementalAgg.state(full, Seq("k"), "v")
      .orderBy("k").collect().toSeq
    assert(merged == direct)
  }

  test("collocation lift: hand-computed on a fixed bigram corpus") {
    import spark.implicits._
    import graft.functions.TextOps
    // "aa bb" x5 and "cc dd" x5 plus noise pairing cc with many partners:
    // (aa,bb) keeps maximal lift, diluted (cc,dd) scores lower.
    val docs = (Seq.fill(5)("aa bb") ++ Seq.fill(5)("cc dd") ++
      (1 to 5).map(i => s"cc x$i")).toDF("text")
    val out = TextOps.collocationLift(docs, "text", k = 10, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // N = 15 pairs, c_aa = c_bb = 5: lift(aa,bb) = 5*15*1e6/(5*5) = 3e6
    assert(out.head == ("aa", "bb", 5L, 3000000L))
    // c_cc = 10, c_dd = 5: lift(cc,dd) = 5*15*1e6/(10*5) = 1.5e6
    assert(out(1) == ("cc", "dd", 5L, 1500000L))
    assert(out.length == 2) // noise pairs fall below minCount
  }

  test("quarantine: violations listed sorted, NULL predicate = violation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Quality
    val df = Seq((1L, Some(10L), "ok"), (2L, Some(99L), "bad"),
      (3L, None, "bad")).toDF("id", "v", "tag")
    val out = Quality.quarantine(df, Seq("id"), Seq(
        "v_small" -> (col("v") <= 50),
        "tag_ok" -> (col("tag") === "ok")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out == Map(
      2L -> Seq("tag_ok", "v_small"),  // sorted names
      3L -> Seq("tag_ok", "v_small"))) // NULL v counts as violation
    assert(!out.contains(1L))
  }

  test("attribution: purchase takes the latest prior touch within window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TemporalJoins
    val conv = Seq((7L, ts("2024-03-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "conv_id")
    val touch = Seq(
      (7L, ts("2024-03-01 11:00:00"), 1L, "view"),
      (7L, ts("2024-03-01 11:30:00"), 2L, "click"), // latest => attributed
      (7L, ts("2024-02-01 09:00:00"), 3L, "view"))  // outside 24h
      .toDF("user_id", "touch_ts", "touch_id", "touch_type")
    val out = TemporalJoins.asofJoin(conv, touch, Seq("user_id"),
        "ts", "touch_ts", rightTie = Some("touch_id"),
        tolerance = Some(expr("INTERVAL 24 HOURS")))
      .select("conv_id", "touch_id", "touch_type").head
    assert((out.getLong(0), out.getLong(1), out.getString(2)) ==
      (100L, 2L, "click"))
  }

  test("linkage: A→B results transpose to B→A results") {
    import spark.implicits._
    import graft.operators.Linkage
    val a = Seq((1L, "navy blue lace"), (2L, "hot pink rose"),
      (3L, "pale navy blue")).toDF("id", "name")
    val b = Seq((10L, "navy blue laces"), (11L, "rose pink hot"))
      .toDF("id", "name")
    val ab = Linkage.trigramJoin(a, b, "id", "name", "id", "name", 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val ba = Linkage.trigramJoin(b, a, "id", "name", "id", "name", 40)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
        r.getLong(3))).toSet
    assert(ab == ba && ab.nonEmpty)
  }

  test("gapfill: grid is dense per group and exact at observed hours") {
    import spark.implicits._
    import graft.operators.Gapfill
    val ev = Seq(
      (1L, ts("2024-02-01 05:30:00"), "x", 3L),
      (2L, ts("2024-02-01 11:30:00"), "x", 8L))
      .toDF("event_id", "ts", "event_type", "cents")
    val out = Gapfill.hourlyFfill(ev, "event_type", "ts", "event_id",
        org.apache.spark.sql.functions.col("cents"))
      .orderBy("h").collect()
    assert(out.length == 7) // 05:00 .. 11:00 inclusive, no holes
    assert(out.head.getLong(2) == 3L && out.last.getLong(2) == 8L)
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L, 3L, 3L, 3L, 8L))
  }

  test("incremental agg: merge is associative across three batches") {
    import spark.implicits._
    val full = (1 to 30).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val parts = Seq(
      full.where(col("v") % 3 === 0), full.where(col("v") % 3 === 1),
      full.where(col("v") % 3 === 2))
      .map(IncrementalAgg.state(_, Seq("k"), "v"))
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(parts(0), parts(1), Seq("k")), parts(2), Seq("k"))
    val rightFold = IncrementalAgg.merge(
      parts(0), IncrementalAgg.merge(parts(1), parts(2), Seq("k")), Seq("k"))
    assert(leftFold.orderBy("k").collect().toSeq ==
      rightFold.orderBy("k").collect().toSeq)
    assert(leftFold.orderBy("k").collect().toSeq ==
      IncrementalAgg.state(full, Seq("k"), "v").orderBy("k").collect().toSeq)
  }
}
