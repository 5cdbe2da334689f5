package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign each document
  * to a fixed-token-budget pack, deterministically, so a downstream
  * tokenizer/loader can materialize one training sequence per pack.
  *
  * The assignment is the exclusive prefix sum of the token counts within
  * a partition (in `orderCol` order) divided by the budget:
  * `pack_id = floor((cumsum - n_tokens) / budget)`. That is a single
  * window expression both engines (and any SQL oracle) evaluate
  * identically; unlike greedy first-fit it lets a document straddle a
  * budget boundary, which a loader handles by truncating or spilling —
  * the trade for a closed-form, shuffle-once, order-stable plan.
  *
  * Scale: a running sum is sequential WITHIN each partition by
  * construction, so the caller chooses partition columns granular enough
  * that one partition fits an executor (e.g. `source` at test scale;
  * `(source, dt)` or `(source, shard)` at 100 TB). There is exactly one
  * shuffle — by the partition columns — and no driver-side state.
  */
object Packing {

  /** Per-row pack assignment: input columns plus `n_tokens` (the
    * evaluated `tokenCol`) and `pack_id`.
    */
  def assignPacks(df: DataFrame, partCols: Seq[String], orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("n_tokens", tokenCol)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / lit(budget.toDouble)))
      .drop("__cum")
  }
}
