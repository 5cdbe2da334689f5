package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: bucket every user by the ISO week of
  * their first event (the cohort), then count distinct users active at
  * each whole-week offset from their cohort — the
  * (cohort_week × week_offset) retention matrix every product
  * analytics stack computes, and the reference's row-accounting
  * generalized from "rows moved" to "users retained".
  *
  * Scale shape: first-event extraction is one shuffle keyed by user;
  * the user→cohort join reuses that key (co-partitioned, no extra
  * exchange under AQE; broadcast when the user dimension is small);
  * the matrix aggregate is one more shuffle of
  * (cohort, offset, user) — distinct-by-user inside the aggregate, no
  * row-level state. Output is cohorts × offsets regardless of input
  * size.
  */
object Retention {

  /** (cohort_week DATE, week_offset LONG, n_users LONG), offset ≥ 0. */
  def cohorts(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val ev = graft.sources.Tables.rebalanceForCompute(events)
      .select(col(userCol).as("u"),
        to_date(date_trunc("week", col(tsCol))).as("w"))
      .where(col("u").isNotNull && col("w").isNotNull)
    val firstWeek = ev.groupBy("u").agg(min("w").as("cohort_week"))
    ev.join(firstWeek, "u")
      .groupBy(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }
}
