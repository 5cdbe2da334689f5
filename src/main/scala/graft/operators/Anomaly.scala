package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection over a fixed-precision metric —
  * the telemetry-QA pass a pipeline runs over event streams (latencies,
  * purchase values) before trusting them as training signal.
  *
  * Determinism at scale: double sums are partition-order-dependent, so
  * the group moments are computed over the metric scaled to exact longs
  * (`round(value * scale)` — exact when the data has ≤ log10(scale)
  * decimal places). Integer sums are order-free, every intermediate
  * stays < 2^53, and the final mean/stddev/z arithmetic is a fixed
  * sequence of IEEE double ops — bit-identical on any engine, any
  * partitioning.
  *
  * Scale shape: one partial-aggregate shuffle for the per-group moments
  * (a handful of rows), broadcast back onto the stream — the event side
  * shuffles never.
  */
object Anomaly {

  /** Rows whose |z| exceeds `threshold` within their group, with the
    * z-score (4 dp) attached. `scale` must make `value * scale` integral
    * (default 100: two-decimal metrics).
    */
  def zscoreOutliers(df: DataFrame, valueCol: String,
      groupCols: Seq[String], threshold: Double = 3.0,
      scale: Long = 100L): DataFrame = {
    val v = df.withColumn("__v", round(col(valueCol) * lit(scale)).cast("long"))
    val stats = v.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__cnt"),
      sum(col("__v")).as("__s"),
      sum(col("__v") * col("__v")).as("__ss"))
    val mean = col("__s").cast("double") / col("__cnt")
    val variance = col("__ss").cast("double") / col("__cnt") - mean * mean
    val z = (col("__v").cast("double") - mean) / sqrt(variance)
    v.join(broadcast(stats), groupCols)
      .withColumn("z", round(z, 4))
      .where(abs(col("z")) > lit(threshold))
      .drop("__v", "__cnt", "__s", "__ss")
  }

  /** Cumulative-deviation drift detection (V-mask-style CUSUM, no
    * reset): per group, the point where the running sum deviates most
    * from the group's mean trend — `argmax_i |Σ_{j≤i} v_j − i·mean|` —
    * flagging level shifts that per-point z-scores miss.
    *
    * Exactness: the deviation is kept as the INTEGER `n·prefix_i − i·S`
    * (multiplying through by n avoids the mean division), prefix sums
    * run over the totalized `(ts, id)` order, and the argmax is one
    * struct-max aggregation with `(|raw|, −id)` — so the result is
    * bit-identical under any partitioning and replayable in SQL. The
    * reported `drift` rescales to value units (`raw / (n·scale)`) with
    * a single double division.
    *
    * Scale shape: one window shuffle (per-group prefix sums), a
    * broadcast of the per-group (n, S) moments, one struct-max
    * aggregation. The event side shuffles once.
    */
  def cusumDrift(df: DataFrame, valueCol: String, tsCol: String,
      idCol: String, groupCols: Seq[String],
      scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.withColumn("__v", round(col(valueCol) * lit(scale)).cast("long"))
      .withColumn("__us", unix_micros(col(tsCol)))
    val stats = v.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__us").asc, col(idCol).asc)
    val pre = v
      .withColumn("__p", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__i", row_number().over(w).cast("long"))
    val sc = pre.join(broadcast(stats), groupCols)
      .withColumn("__raw", col("__n") * col("__p") - col("__i") * col("__s"))
    val best = sc.groupBy(groupCols.map(col): _*)
      .agg(max(struct(abs(col("__raw")).as("a"), (-col(idCol)).as("ni"),
        col("__raw").as("r"), col("__n").as("n"))).as("__b"))
    best.select(groupCols.map(col) ++ Seq(
      (-col("__b.ni")).as("at_event"),
      round(col("__b.r").cast("double") /
        (col("__b.n") * lit(scale)).cast("double"), 6).as("drift")): _*)
  }

  /** Robust outliers via the modified z-score (Iglewicz–Hoaglin):
    * `0.6745 · (x − median) / MAD`, flagging |mz| > `threshold`
    * (canonical 3.5). Means and stddevs ([[zscoreOutliers]]) are
    * dragged by the very outliers being hunted; median/MAD have a 50%
    * breakdown point, so this is the pass heavy-tailed metrics need.
    *
    * Exact medians need a full sort at scale; instead both location
    * (median) and spread (MAD = median |x − median|) come from the
    * deterministic fixed-grid histogram sketch
    * ([[Sketches.histogramQuantiles]]) — two bounded aggregation
    * passes over the data (each shuffles ≤ `bins` rows), one broadcast
    * back, zero sorts. Value-space error ≤ one bin width, identical on
    * every engine, so the SQL oracle replays it verbatim.
    *
    * A zero MAD (≥ 50% of values identical) flags nothing: the modified
    * z-score is undefined there, and the standard fallback (meanAD)
    * trades robustness for exactly the contamination this op avoids.
    */
  def madOutliers(df: DataFrame, valueCol: String, threshold: Double = 3.5,
      bins: Int = 256): DataFrame = {
    // The sketch returns its 1-row result as a LOCAL relation (the
    // histogram pick happens driver-side, bounded by the fixed bin
    // constant) — so median and MAD become plain literals here: no
    // broadcast exchanges, no lineage cuts, no crossJoins. The whole
    // operator is four distributed aggregation jobs (stats + bin counts
    // per sketch, each shuffling ≤ `bins` rows) plus the final scoring
    // scan. Eager like the sketch itself.
    val v = col(valueCol).cast("double")
    val medRows = Sketches.histogramQuantiles(df, valueCol, bins, Seq(0.5))
      .select("est").collect()
    if (medRows.isEmpty)
      return df.withColumn("mz", lit(null).cast("double")).where(lit(false))
    val med = medRows(0).getDouble(0)
    val dev = df.select(abs(v - lit(med)).as("__ad"))
    val madRows = Sketches.histogramQuantiles(dev, "__ad", bins, Seq(0.5))
      .select("est").collect()
    val mad = if (madRows.isEmpty) 0.0 else madRows(0).getDouble(0)
    // Zero MAD (≥ 50% identical values) flags nothing, per the scaladoc.
    if (!(mad > 0))
      return df.withColumn("mz", lit(null).cast("double")).where(lit(false))
    df.withColumn("mz", round(lit(0.6745) * (v - lit(med)) / lit(mad), 4))
      .where(abs(col("mz")) > lit(threshold))
  }
}
