package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins
import graft.sources.Tables

/** As-of and banded range joins must equal their naive (theta-join)
  * definitions row for row — the operators only change the PLAN shape.
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.load(spark, sf0001, "events")

  test("asofJoin equals the naive greatest-ts-at-or-before definition") {
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_id"))

    val got = TemporalJoins.asofJoin(clicks, views, Seq("user_id"),
        "ts", "view_ts", rightTie = Some("view_id"))
      .select("click_id", "view_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    // Naive: per click, the view with max (ts, id) among ts <= click.ts.
    val vrows = views.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val naive = clicks.collect().map { c =>
      val (cid, u, ts) = (c.getLong(0), c.getLong(1), c.getTimestamp(2))
      val best = vrows.filter(v => v._1 == u && !v._2.after(ts))
        .sortBy(v => (v._2.getTime, v._2.getNanos, v._3)).lastOption
      cid -> best.map(_._3)
    }.toMap
    assert(got == naive)
    assert(got.values.exists(_.isEmpty)) // some clicks precede any view
    assert(got.values.exists(_.nonEmpty))
  }

  test("asofJoin tolerance nulls out stale matches") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, t(100), "a"), (1L, t(5000), "b"))
      .toDF("k", "lts", "lp")
    val right = Seq((1L, t(90), "r1")).toDF("k", "rts", "rp")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "lts", "rts",
        tolerance = Some(expr("INTERVAL 60 SECONDS")))
      .select("lp", "rp").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").contains("r1")) // 10 s old: within tolerance
    assert(got("b").isEmpty)        // 4910 s old: stale
  }

  test("asofJoin tie at equal (key, ts): largest tie column wins; equal ts is inclusive") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, t(100), "x")).toDF("k", "lts", "lp")
    val right = Seq((1L, t(100), 7L), (1L, t(100), 9L), (1L, t(50), 1L))
      .toDF("k", "rts", "rid")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "lts", "rts",
        rightTie = Some("rid")).select("rid").head()
    assert(got.getLong(0) == 9L)
  }

  test("asofJoin carries right rows atomically when payload cells are null") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, t(300), "x")).toDF("k", "lts", "lp")
    // Latest right row has a NULL cell: the match must be (t200, null),
    // not a stitched (t200, "old") from the earlier row.
    val right = Seq((1L, t(100), Option("old")), (1L, t(200), None))
      .toDF("k", "rts", "rp")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "lts", "rts").head()
    assert(got.getTimestamp(3) == t(200))
    assert(got.isNullAt(4))
  }

  test("asofJoin ignores right rows with a NULL time (they sort NULLS FIRST)") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, t(100), "x")).toDF("k", "lts", "lp")
    val right = Seq((1L, Option.empty[java.sql.Timestamp], "ghost"))
      .toDF("k", "rts", "rp")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "lts", "rts").head()
    assert(got.isNullAt(3) && got.isNullAt(4), s"null-ts right row matched: $got")
  }

  test("rangeJoin equals the naive interval theta join, including multi-bucket intervals") {
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    // 45-minute windows against a 30-minute bucket: intervals span 2-3
    // buckets, so the bucket-dedup property (point side has ONE bucket)
    // is genuinely exercised.
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 45 MINUTES")).as("err_end"))

    val got = TemporalJoins.rangeJoin(clicks, errors, Seq("user_id"),
        "ts", "err_start", "err_end", bucketWidthUs = 30L * 60 * 1000000)
      .select("click_id", "error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = clicks.as("c").join(errors.as("e"),
        col("c.user_id") === col("e.user_id") &&
          col("c.ts") >= col("e.err_start") && col("c.ts") <= col("e.err_end"))
      .select("click_id", "error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.nonEmpty)
  }
}
