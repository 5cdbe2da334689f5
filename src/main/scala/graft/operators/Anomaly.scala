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
}
