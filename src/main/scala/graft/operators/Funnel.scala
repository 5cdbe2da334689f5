package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: for each user, the earliest chain
  * of stage events in order (stage k strictly after the user's chosen
  * stage k−1 event) — product-analytics conversion, and for training
  * pipelines the interaction-sequence mining step (which sessions
  * contain a full impression→click→conversion chain).
  *
  * Per stage: one filter + one per-user min aggregation, then a join of
  * the per-user frontier onto the next stage's events. The event table
  * is scanned once per stage but never self-joined row-to-row — no
  * theta join, no per-user sort. The frontier (one row per user that
  * reached the stage, shrinking monotonically down the funnel) is the
  * only intermediate state; AQE broadcasts it when it fits and
  * shuffle-joins on the user key when it doesn't.
  */
object Funnel {

  /** `stages` are (label, predicate-column) pairs in funnel order.
    * Returns one row per user who reached stage 1, with nullable
    * `<label>_ts` timestamps for each stage (earliest chain respecting
    * strict event-time order).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val head = stages.head
    var frontier = events.where(head._2)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(s"${head._1}_ts"))
    for (((label, pred), prev) <- stages.tail.zip(stages.map(_._1))) {
      val next = events.where(pred)
        .select(col(userCol), col(tsCol))
        .join(frontier.select(col(userCol),
          col(s"${prev}_ts").as("__prev_ts")), userCol)
        .where(col(tsCol) > col("__prev_ts"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(s"${label}_ts"))
      frontier = frontier.join(next, Seq(userCol), "left")
    }
    frontier
  }
}
