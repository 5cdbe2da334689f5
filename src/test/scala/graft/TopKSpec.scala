package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK
import graft.sources.Tables

/** The custom TopKPerKey physical operator must return exactly the rows
  * the window-function formulation returns, and must plan as the custom
  * exec over a single hash exchange.
  */
class TopKSpec extends SparkSpec {

  test("top-3 events per user equals the row_number window result") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "value")

    val viaWindow = ev.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))))
      .where(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet

    val viaTopK = TopK.perKey(ev, Seq("user_id"),
        Seq(col("value").desc, col("event_id").asc), k = 3)
      .collect().map(_.toSeq).toSet

    assert(viaTopK == viaWindow)
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("key", "score")
    val out = TopK.perKey(df, Seq("key"), Seq(col("score").desc), k = 5)
    assert(out.count() == 3)
  }

  test("plans as TopKPerKeyExec over one exchange, no sort") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "value")
    val df = TopK.perKey(ev, Seq("user_id"), Seq(col("value").desc), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Sort ["),
      s"unexpected sort in:\n$plan")
  }
}
