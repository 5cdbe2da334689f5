package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** Salting must preserve exact results vs the unsalted plans. */
class SkewSpec extends SparkSpec {

  test("salted join equals plain inner join, row for row") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "value")
    val users = Tables.load(spark, sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_user_events"))

    val plain = ev.join(users, "user_id")
      .select("event_id", "user_id", "n_user_events")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(ev, users, "user_id", saltFactor = 4)
      .select("event_id", "user_id", "n_user_events")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("two-phase skew aggregation equals direct aggregation") {
    val ev = Tables.load(spark, sf0001, "events")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.skewAggCountSum(ev, "event_type", "value", saltFactor = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct) // counts exact; sums checked separately below

    val directSum = ev.groupBy("event_type").agg(sum("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Skew.skewAggCountSum(ev, "event_type", "value", 4).collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - directSum(r.getString(0))) < 1e-6)
    }
  }
}
