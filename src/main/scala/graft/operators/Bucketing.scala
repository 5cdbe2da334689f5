package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed (pre-shuffled) table layout for co-located joins — the
  * standing answer to "this join shuffles 100 TB every night".
  *
  * Writing both sides `bucketBy(n, key)` hash-partitions the FILES by
  * join key once, at write time; every later equi-join or aggregation on
  * that key reads bucket i against bucket i with NO exchange in the
  * plan. For a fact table joined repeatedly on the same key (the
  * reference's transfer target, a dedup snapshot, a feature store), one
  * write-time shuffle replaces a per-query shuffle forever after.
  *
  * Rules for the layout to pay off (asserted in `BucketingSpec`):
  *   - both sides bucketed on the join key with the SAME bucket count
  *     (or a divisor — Spark coalesces buckets when enabled);
  *   - bucket count sized so one bucket ≈ one task's worth of data at
  *     target scale (128-256 MB);
  *   - `sortBy` the key within buckets → sort-merge join needs no
  *     per-task sort either.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table.
    *
    * The repartition on the bucket key is load-bearing: without it each
    * INPUT partition writes one file per bucket it holds rows for — up
    * to partitions × buckets small files (metadata blowup at exactly
    * the scale bucketing exists for). Repartitioned, each bucket is one
    * task's output: one file per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: resolves to a
    * sort-merge join with zero Exchange operators.
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
