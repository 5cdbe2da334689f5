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

  /** Time-bounded funnel (ClickHouse `windowFunnel` semantics): like
    * [[funnel]], but the whole chain must complete within
    * `windowSeconds` of the user's FIRST stage-1 event — "signed up and
    * converted within 24h", the conversion-window question plain
    * ordered funnels can't answer.
    *
    * Chain rule per user: stage-1 anchor = earliest stage-1 event;
    * stage k (k ≥ 2) = earliest stage-k event strictly after the
    * user's stage k−1 timestamp AND within `windowSeconds` of the
    * anchor. Greedy-earliest at every step, matching [[funnel]] (and
    * ClickHouse's default mode). Returns one row per user who reached
    * stage 1: each stage's nullable timestamp plus `depth` (number of
    * stages completed in the window).
    *
    * Same scale shape as [[funnel]]: one filter + per-user min-agg per
    * stage, frontier joins only — never a row-to-row self theta join.
    * The window bound rides the stage join as an extra inequality on
    * the already-joined frontier row, so no new shuffle appears.
    */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
      windowSeconds: Long,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val head = stages.head
    val anchorCol = s"${head._1}_ts"
    var frontier = events.where(head._2)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(anchorCol))
    for (((label, pred), prev) <- stages.tail.zip(stages.map(_._1))) {
      val next = events.where(pred)
        .select(col(userCol), col(tsCol))
        .join(frontier.select(col(userCol),
          col(s"${prev}_ts").as("__prev_ts"), col(anchorCol).as("__anchor")), userCol)
        .where(col(tsCol) > col("__prev_ts") &&
          unix_micros(col(tsCol)) - unix_micros(col("__anchor")) <=
            windowSeconds * 1000000L)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(s"${label}_ts"))
      frontier = frontier.join(next, Seq(userCol), "left")
    }
    val depth = stages.map { case (label, _) =>
      when(col(s"${label}_ts").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    frontier.withColumn("depth", depth)
  }

  /** Clickstream path mining: gap-sessionize events per user (same rule
    * as the streaming sessionizer), order each session's event types
    * into a `a>b>c` path string, and return the top-k paths by session
    * count — the user-journey summary product analytics asks for, and
    * for interaction-data curation the dominant-trajectory inventory.
    *
    * Determinism: events totalize on `(ts, idCol)`; the per-session
    * path is built by sorting the COLLECTED (ts, id, type) structs —
    * collect order is partition-dependent, the sorted array is not.
    * Scale shape: two shuffles (user window, session groupBy) plus a
    * path-count aggregation into a bounded global top-k
    * (TakeOrderedAndProject) — no full sort of the path table.
    */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(userCol))
      .orderBy(col("__us").asc, col(idCol).asc)
    val flagged = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = flagged.groupBy(col(userCol), col("session_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__us").as("u"),
          col(idCol).as("i"), col(typeCol).as("t")))),
        x => x.getField("t")), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }
}
