package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus downsampling — the "at most k documents per
  * domain/language/source" cap every training-data pipeline applies
  * before mixing.
  *
  * Selection is by the smallest `(hash(id), id)` within each group:
  * a fixed pseudo-random-but-reproducible choice (re-running on the
  * same corpus keeps the same documents — unlike `sampleBy`, whose RNG
  * draw depends on partitioning), unbiased w.r.t. document order, and
  * expressible in any SQL engine for oracle checks.
  *
  * Scale shape: one hash per row (narrow map) into the bounded-heap
  * `TopKPerKey` operator — O(k) memory per group, one shuffle by group
  * key, no full per-group sort. The reservoir alternative at 100 TB
  * (window `row_number <= k`) sorts every group in full.
  */
object Sampling {

  /** Keep at most `k` rows per group, chosen deterministically by
    * `(hashFn(idCol as string), idCol)` ascending. `hashFn` defaults to
    * xxhash64 (fast path); pass `TextOps.md5Hash60` for an
    * oracle-reproducible variant.
    *
    * `idCol` must be a UNIQUE, NON-NULL key (a document id): uniqueness
    * is what makes the `(hash, id)` order total, hence the selection
    * deterministic. NULL ids sort LAST on both engines
    * (`asc_nulls_last`, matching SQL's default) — but multiple NULL-id
    * rows are mutually indistinguishable to the ordering, so which of
    * THEM survives an under-cut group is undefined.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int, hashFn: Column => Column = xxhash64(_)): DataFrame = {
    // collision-proof scratch column name
    val h = Iterator.from(0).map(i => s"__graft_cap_h$i")
      .find(n => !df.columns.contains(n)).get
    graft.plans.TopK.perKey(
      df.withColumn(h, hashFn(col(idCol).cast("string"))),
      groupCols, Seq(col(h).asc_nulls_last, col(idCol).asc_nulls_last), k)
      .drop(h)
  }
}
