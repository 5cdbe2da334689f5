package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing
import graft.sources.Tables

/** The scale property itself is asserted: a join between co-bucketed
  * tables must contain NO shuffle exchange — the write-time bucketing
  * replaced it. An unbucketed control join over the same data must
  * contain one, proving the assertion isn't vacuous.
  */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join runs with zero shuffle exchanges") {
    // (managed tables land in the session's default warehouse dir and are
    // dropped in the finally — warehouse.dir is static, not settable here)
    // force a real sort-merge join (no broadcast escape hatch) and look
    // at the executed plan without AQE renaming nodes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = Tables.load(spark, sf0001, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")

      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)

      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      // control: same join from the raw (unbucketed) tables DOES shuffle
      val control = orders.join(lineitem, "o_orderkey")
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"),
        "control join should shuffle - otherwise the assertion above is vacuous")

      // and the result is the same either way
      assert(joined.count() == control.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
