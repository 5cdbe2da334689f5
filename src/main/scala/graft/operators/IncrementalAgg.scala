package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view refresh): keep
  * a per-key aggregate table current by merging the aggregate of a
  * DELTA batch into the standing aggregate STATE, never re-scanning
  * the standing fact table — the aggregate-side analogue of the
  * reference's incremental transfer (its dedup avoids re-SENDING old
  * rows; this avoids re-AGGREGATING them).
  *
  * Works for any algebraic aggregate — one whose state merges by an
  * associative op. Carried here: count (+), sum (+), min (min),
  * max (max); avg derives from sum/count at read time. The refresh
  * therefore touches ONLY the delta (one map-side-combined shuffle of
  * delta keys) plus the state table (key-for-key union-merge); at
  * 100 TB the fact table is never re-read, and with state and delta
  * partial both bucketed by key the merge is zero-exchange.
  */
object IncrementalAgg {

  /** Per-key algebraic state of `valueCol`:
    * (key…, n, sum_v, min_v, max_v). `sum_v` is an exact long so the
    * merge is order-free (callers pre-scale doubles to fixed-point).
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame = {
    require(keys.nonEmpty)
    graft.sources.Tables.rebalanceForCompute(df)
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol)).cast("long").as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /** Merge a delta's state into the standing state: union + one
    * re-aggregate over at most |state| + |delta keys| rows (NOT the
    * fact table). Result is bit-identical to `state(standing ∪ delta)`
    * because every carried aggregate is algebraic and the sum is
    * integer.
    */
  def merge(state0: DataFrame, deltaState: DataFrame, keys: Seq[String])
      : DataFrame = {
    require(state0.columns.toSeq == deltaState.columns.toSeq,
      "state schemas must match")
    state0.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
  }
}
