package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 upsert (MERGE INTO semantics as a batch operator): apply a
  * changes batch onto a target snapshot — matched keys take the update's
  * values, unmatched update keys insert, untouched target rows carry
  * through. This is the write-side half of the reference's incremental
  * transfer: its dedup filter decides WHAT is new; this operator folds
  * the new batch into the standing table.
  *
  * Scale shape: one full-outer shuffle join on the key columns — AQE
  * broadcasts the (typically small) updates side automatically, making
  * the target-side pass shuffle-free; with both sides bucketed on the
  * key ([[Bucketing]]) the join is zero-exchange. No driver state, no
  * collected key set — the 100 TB-safe form of the reference's in-RAM
  * snapshot map.
  */
object Merge {

  /** Returns the merged table plus an `action` column
    * (updated / inserted / kept). `updates` must share the target's
    * schema. Key columns must be non-null on both sides.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String])
      : DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(target.columns.toSeq == updates.columns.toSeq,
      s"schema mismatch: target ${target.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    val t = target.columns.foldLeft(target)((d, c) =>
      d.withColumnRenamed(c, s"__t_$c"))
    val u = updates.columns.foldLeft(updates)((d, c) =>
      d.withColumnRenamed(c, s"__u_$c"))
    val cond = keys.map(k => t(s"__t_$k") === u(s"__u_$k")).reduce(_ && _)
    val joined = t.join(u, cond, "full_outer")
    val matched = col(s"__u_${keys.head}").isNotNull &&
      col(s"__t_${keys.head}").isNotNull
    val inserted = col(s"__t_${keys.head}").isNull
    val outCols = target.columns.toSeq.map { c =>
      coalesce(col(s"__u_$c"), col(s"__t_$c")).as(c)
    }
    joined.select(outCols :+
      when(inserted, lit("inserted"))
        .when(matched, lit("updated"))
        .otherwise(lit("kept")).as("action"): _*)
  }
}
