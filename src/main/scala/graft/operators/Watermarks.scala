package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermark tuning from history — the question every streaming
  * deployment answers BEFORE picking `withWatermark(delay)`: how late
  * do events actually arrive, and what fraction would a given delay
  * drop? Lateness of an event = (max event time seen so far in arrival
  * order) − (its own event time); the lateness distribution is exactly
  * the curve a watermark delay cuts.
  *
  * The running max over arrival order LOOKS inherently sequential (a
  * global ordered window = one partition holding the whole table). It
  * is not: arrival keys bucket into ≤ 65,536 coarse ranges, per-bucket
  * maxima prefix-scan on the tiny bucket table, and each event combines
  * its bucket's carry-in with a WITHIN-bucket running max — the same
  * two-level decomposition as `TrainingOrder.shuffleOrder` / the
  * percentile ranks. Windows run either over the bucket table (bounded
  * rows) or partitioned by bucket (parallel); the event table itself
  * never sorts globally.
  */
object Watermarks {

  /** Lateness histogram: (lateness_bucket, n_events, max_lateness_us)
    * per `bucketWidthUs`-wide lateness band, ascending. `arrivalCol`
    * must be a monotone arrival key (ingest sequence / log offset) —
    * a non-negative long; `tsCol` the event-time timestamp.
    */
  def latenessAudit(df: DataFrame, arrivalCol: String, tsCol: String,
      bucketWidthUs: Long = 60000000L, arrivalBucket: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = df.select(col(arrivalCol).cast("long").as("seq"),
      unix_micros(col(tsCol)).as("us"))
      .withColumn("b", expr(s"seq div $arrivalBucket"))
    // Carry-in per bucket: max event time of all STRICTLY EARLIER
    // buckets — a prefix max over the bucket table (≤ seq_max/width
    // rows, bounded like shuffleOrder's 65k bucket counts).
    val bmax = us.groupBy("b").agg(max("us").as("bm"))
    val carry = bmax
      .withColumn("__runb", max(col("bm")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)))
      // strict prefix: shift the inclusive running max by one bucket
      .withColumn("carry", lag(col("__runb"), 1).over(Window.orderBy("b")))
      .select(col("b"), col("carry"))
    // Within-bucket running max is partitioned by bucket — parallel.
    val wIn = Window.partitionBy("b").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, 0)
    val late = us.join(carry, "b")
      .withColumn("runmax",
        greatest(max(col("us")).over(wIn), coalesce(col("carry"), lit(Long.MinValue))))
      .withColumn("lateness_us", col("runmax") - col("us"))
    late.groupBy(expr(s"lateness_us div $bucketWidthUs").as("lateness_bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(col("lateness_us")).as("max_lateness_us"))
      .orderBy("lateness_bucket")
  }
}
