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
    *
    * `orderCol` must be UNIQUE within each partition (a document id):
    * uniqueness is what makes the order — and therefore the assignment —
    * total and deterministic. The frame is ROWS-based explicitly;
    * the default RANGE frame would collapse order ties onto one
    * inclusive sum and blow the budget by the tie-group size.
    */
  def assignPacks(df: DataFrame, partCols: Seq[String], orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCol)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / lit(budget.toDouble)))
      .drop("__cum")
  }

  /** Per-document TOKEN SPANS within each pack — the loss-mask /
    * attention-boundary table emitted alongside a packed dataset (span
    * labels, per-doc loss weighting, and cross-doc attention masking
    * all key on "where does document d live inside pack p"). Spans are
    * in pack-token coordinates, separators excluded: start = sum of the
    * pack's earlier documents' tokens, end exclusive. One extra window
    * over the already-assigned rows; same determinism contract as
    * [[assignPacks]] (unique `orderCol` ⇒ total order ⇒ exact spans).
    */
  def spans(df: DataFrame, partCols: Seq[String], orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    val assigned = assignPacks(df, partCols, orderCol, tokenCol, budget)
    val w = Window.partitionBy((partCols :+ "pack_id").map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    assigned
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).cast("long"))
      .withColumn("end_tok", col("start_tok") + col("n_tokens"))
  }

  /** Materialize one training sequence per pack: documents of a pack
    * concatenated in `orderCol` order with `sep` between them, plus doc
    * and token accounting. Runs [[assignPacks]] then ONE aggregation —
    * the sort_array trick keeps concatenation order deterministic inside
    * an unordered hash aggregate (collect_list order is
    * partition-dependent; sorting the collected (order, text) structs
    * restores it). Per-group state is one pack's documents ≈ `budget`
    * tokens — bounded by construction, so group skew cannot OOM an
    * executor no matter the corpus size.
    */
  def materialize(df: DataFrame, partCols: Seq[String], orderCol: String,
      textCol: String, tokenCol: Column, budget: Int,
      sep: String = "\n\n"): DataFrame = {
    val assigned = assignPacks(df, partCols, orderCol, tokenCol, budget)
    assigned
      .groupBy((partCols :+ "pack_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(orderCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("sequence"))
  }
}
