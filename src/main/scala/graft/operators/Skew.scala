package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even a
  * split partition overwhelms a task, or when the aggregation itself (not
  * the join) is skewed. Both transforms preserve exact results:
  *   - salted join: the probe side scatters each row into one of
  *     `saltFactor` salted keys; the build side replicates each row to ALL
  *     salted keys, so every original match still meets exactly once;
  *   - two-phase aggregation: partial aggregates per (key, salt), then a
  *     final merge per key — the classic map-side-combine generalization
  *     for when combining itself needs spreading.
  */
object Skew {

  private val SALT = "__graft_salt"

  /** Deterministic per-row salt in [0, saltFactor): hash of the whole row
    * (stable across retries — no rand(), which breaks task re-execution).
    */
  private def rowSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int")

  /** Inner equi-join on `key` with the left (large, skewed) side salted and
    * the right (smaller) side replicated `saltFactor`×. Result equals the
    * plain inner join, row for row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn(SALT, rowSalt(left, saltFactor))
    val replicatedRight = right.withColumn(SALT,
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, SALT)).drop(SALT)
  }

  /** Two-phase skew-safe aggregation: count and sum per key where one key
    * may dominate. Phase 1 aggregates per (key, salt) — spreading the hot
    * key over `saltFactor` reducers — phase 2 merges the partials.
    */
  def skewAggCountSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 8): DataFrame = {
    val partial = df.withColumn(SALT, rowSalt(df, saltFactor))
      .groupBy(col(key), col(SALT))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(col(key))
      .agg(sum("__n").as("n_rows"), sum("__s").as("sum_value"))
  }
}
