package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series gap fill: resample events onto a dense per-group hourly
  * grid and forward-fill the last observed value across silent hours —
  * the telemetry/resampling primitive behind every "carry the sensor
  * reading forward" dashboard, and the dense-grid complement of
  * [[TemporalJoins]]' as-of join (same carry-forward semantics, but
  * materializing the grid instead of joining to probe times).
  *
  * Determinism: the per-hour representative is the max (ts, id, value)
  * struct — latest event wins, unique id breaks timestamp ties; the
  * fill is `last(ignoreNulls)` over hour order, and the grid starts at
  * each group's first observed hour so no leading NULLs exist.
  *
  * Scale shape: per-hour last-event reduction is ONE
  * map-side-combinable shuffle of (group, hour) — the only pass over
  * the events; the grid explode and the forward-fill window run over
  * GRID rows (groups × hours), bounded by the time span, not the data
  * volume. At 100 TB of events the window never sees the fact table.
  */
object Gapfill {

  /** (group, h, v): dense hourly grid per group from its first to its
    * last observed hour, v = last observed `valueCol` at or before h.
    * `idCol` must be unique per row (timestamp tie-break).
    */
  def hourlyFfill(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: Column): DataFrame = {
    val ev = graft.sources.Tables.rebalanceForCompute(events)
      .select(col(groupCol).as("g"), col(tsCol).as("ts"),
        col(idCol).as("id"), valueCol.as("v0"))
      .where(col("ts").isNotNull)
      .withColumn("h", date_trunc("hour", col("ts")))
    val observed = ev.groupBy("g", "h")
      .agg(max(struct(col("ts"), col("id"), col("v0"))).as("s"))
      .select(col("g"), col("h"), col("s.v0").as("v_obs"))
    val grid = observed.groupBy("g")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("g"), explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    grid.join(observed, Seq("g", "h"), "left")
      .withColumn("v", last(col("v_obs"), ignoreNulls = true)
        .over(Window.partitionBy("g").orderBy("h")))
      .select("g", "h", "v")
  }

  /** Linear-interpolation resample: like [[hourlyFfill]] but silent
    * hours take the straight line between the surrounding observations
    * instead of carrying the last one — the sensor-calibration /
    * financial-curve variant. `centsCol` must be a NON-NEGATIVE integer
    * (fixed-point money/measurement): the interpolation
    * `(vp·(hn−h) + vn·(h−hp)) div (hn−hp)` then stays in nonnegative
    * 64-bit arithmetic, where truncating and flooring division agree —
    * the cross-engine determinism trap signed numerators would open.
    * Hours after the last observation fall back to forward fill.
    *
    * Same scale shape as [[hourlyFfill]]: one combinable shuffle over
    * events, windows over grid rows only.
    */
  def hourlyLinear(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, centsCol: Column): DataFrame = {
    val ev = graft.sources.Tables.rebalanceForCompute(events)
      .select(col(groupCol).as("g"), col(tsCol).as("ts"),
        col(idCol).as("id"), centsCol.as("v0"))
      .where(col("ts").isNotNull)
      .withColumn("h", date_trunc("hour", col("ts")))
    val observed = ev.groupBy("g", "h")
      .agg(max(struct(col("ts"), col("id"), col("v0"))).as("s"))
      .select(col("g"), col("h"), col("s.v0").as("v_obs"))
    val grid = observed.groupBy("g")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("g"), explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val joined = grid.join(observed, Seq("g", "h"), "left")
      .withColumn("hi", expr("unix_micros(h) DIV 3600000000"))
    val ord = Window.partitionBy("g").orderBy("hi")
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("vp", last(col("v_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("hp", last(when(col("v_obs").isNotNull, col("hi")),
        ignoreNulls = true).over(wPrev))
      .withColumn("vn", first(col("v_obs"), ignoreNulls = true).over(wNext))
      .withColumn("hn", first(when(col("v_obs").isNotNull, col("hi")),
        ignoreNulls = true).over(wNext))
      .withColumn("v",
        when(col("hn").isNull || col("hn") === col("hp"), col("vp"))
          .otherwise(expr("(vp * (hn - hi) + vn * (hi - hp)) DIV (hn - hp)")))
      .select("g", "h", "v")
  }
}
