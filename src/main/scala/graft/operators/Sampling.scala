package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

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

  /** Deterministic train/val/test split assignment: bucket each row by
    * a seed-keyed hash of its id into [0, 10000) and map cumulative
    * fraction ranges to labels. Row-local (a narrow map, no shuffle, no
    * RNG state), so membership is stable under corpus growth: adding
    * documents never moves an existing document between splits — the
    * property that keeps yesterday's test set uncontaminated by
    * tomorrow's training run.
    *
    * `fracs` are (label, fraction) in range order; fractions must sum
    * to 1 within 1e-9. Output adds `bucket` and `split`.
    */
  def assignSplit(df: DataFrame, idCol: String, seed: String,
      fracs: Seq[(String, Double)],
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    require(fracs.nonEmpty && math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fracs")
    val bucket = pmod(
      hashFn(concat(lit(seed), col(idCol).cast("string"))), lit(10000L))
    val cuts = fracs.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val split = fracs.zip(cuts).foldRight(lit(fracs.last._1)) {
      case (((label, _), cut), els) => when(bucket < cut, label).otherwise(els)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Corpus mixing: fill each group's token budget greedily in a
    * seed-keyed pseudo-random document order (hash, id) — the "sample
    * source X down to N tokens" step that turns raw per-source corpora
    * into a training mixture. A document is kept while the EXCLUSIVE
    * running token sum is under the group's budget, so the group's
    * kept-token total lands in [budget, budget + maxDocTokens) and a
    * budget never selects zero documents. Deterministic: membership
    * depends only on (seed, id, token counts), not partitioning.
    *
    * Output adds `n_tokens` and `keep`. One shuffle (by `groupCols`,
    * for the running sum); the same partition-granularity note as
    * [[Packing.assignPacks]] applies — at 100 TB, budget per
    * `(source, shard)` rather than per `source` keeps a partition's
    * rows on one executor.
    */
  def mixToBudget(df: DataFrame, groupCols: Seq[String], idCol: String,
      tokenCol: Column, budgets: Map[String, Long], seed: String,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    require(groupCols.size == 1,
      "budgets are keyed by the single group column's value")
    require(budgets.values.forall(_ > 0), s"budgets must be positive: $budgets")
    val h = hashFn(concat(lit(seed), col(idCol).cast("string")))
    // ROWS frame (unique idCol makes the order total; explicit frame
    // guards against RANGE peer-collapse if that ever changes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (els, (k, b)) => when(col(groupCols.head) === k, b).otherwise(els)
    }
    // groups with no budget entry are dropped (keep = false), and the
    // coalesce keeps the column non-nullable for writers/oracles
    df.withColumn("n_tokens", tokenCol)
      .withColumn("keep", coalesce(
        sum(col("n_tokens")).over(w) - col("n_tokens") < budget, lit(false)))
  }

  /** Per-source epoch allocation for a fixed training-token budget —
    * the "how many times does each source repeat" plan a run config is
    * built from (the repeated-data accounting of Muennighoff et al.
    * 2023): an equal `budget DIV n_sources` token share per source,
    * converted to epochs of that source's corpus and clamped at
    * `capMicro` (micro fixed-point epochs — repeating a small source
    * beyond ~4 epochs degrades, so the cap binds for tiny sources while
    * big sources train sub-epoch). One-pass by design: freed budget
    * from capped sources is NOT redistributed — allocation stays a pure
    * per-source function of (budget, S, n_s), so adding a source never
    * changes another source's plan (growth-stable, like hash splits).
    *
    * Output per source: `n_tokens`, `epochs_micro`, and the resulting
    * `tokens_taken = (epochs_micro · n_tokens) DIV 10⁶`. Exact 64-bit
    * integer arithmetic end to end. Scale shape: one partial-aggregated
    * count per source + a broadcast of the (tiny) source list size —
    * the corpus shuffles nothing.
    */
  def epochMix(df: DataFrame, groupCol: String, tokenCol: Column,
      budget: Long, capMicro: Long = 4000000L): DataFrame = {
    require(budget > 0 && capMicro > 0)
    val perSrc = df.groupBy(col(groupCol))
      .agg(sum(tokenCol).as("n_tokens"))
    val nSrc = perSrc.agg(count(lit(1)).as("n_sources"))
    perSrc.crossJoin(broadcast(nSrc))
      .withColumn("epochs_micro",
        least(lit(capMicro),
          expr(s"(($budget DIV n_sources) * 1000000) DIV greatest(n_tokens, 1)")))
      .withColumn("tokens_taken",
        expr("(epochs_micro * n_tokens) DIV 1000000"))
      .select(col(groupCol), col("n_tokens"), col("epochs_micro"),
        col("tokens_taken"))
  }

  /** Temperature-scaled (α = 0.5) multilingual sampling, XLM-style:
    * group g gets a share of `totalBudget` proportional to `n_g^α`,
    * flattening the head so low-resource groups survive the downsample.
    * α is fixed at ½ because `sqrt` is CORRECTLY ROUNDED under IEEE 754
    * in every engine — the weight `⌊√n_g · 2^20⌋` is therefore an exact
    * integer, the weight total is an order-free integer sum, and each
    * allocation `(B · w_g) div Σw` is exact 64-bit arithmetic (general
    * α would need `pow`, whose last ULP is engine-dependent).
    *
    * Within a group, kept rows are the smallest `(hash(seed‖id), id)` —
    * the same reproducible pseudo-random rule as [[capPerGroup]].
    * Output: the kept rows with `n_g` and `alloc` attached.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      totalBudget: Long, seed: String,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    require(totalBudget > 0)
    val weights = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"))
      .withColumn("w_fp",
        floor(sqrt(col("n_g").cast("double")) * lit(1048576L)).cast("long"))
    val tot = weights.agg(sum("w_fp").as("sum_w"))
    val alloc = weights.crossJoin(broadcast(tot))
      .withColumn("alloc",
        least(expr(s"($totalBudget * w_fp) div sum_w"), col("n_g")))
      .select(col(groupCol), col("n_g"), col("alloc"))
    val h = hashFn(concat(lit(seed), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.join(broadcast(alloc), Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("alloc"))
      .drop("__rn")
  }

  /** Deterministic stratified resampling toward target group shares —
    * the mixture-rebalancing step that turns an as-crawled distribution
    * (80% English, …) into the distribution the training run wants.
    * Each group gets acceptance probability
    * `p_g = min(1, share_g·N / n_g)` (uniform shares `1/G` when `shares`
    * is empty); a row is kept iff the 52-bit seed-keyed hash fraction of
    * its id falls below `p_g`. Membership depends only on
    * (seed, id, group counts) — never on partitioning or an RNG stream —
    * so reruns keep identical documents and the draw is unbiased w.r.t.
    * document order. Groups absent from a non-empty `shares` map get
    * share 0 (dropped).
    *
    * Scale shape: one tiny per-group count aggregate (groups = languages
    * / sources) joined back `broadcast()`; the accept test is then a
    * narrow codegen'd filter on the scan — no shuffle of the corpus.
    * The 52-bit hash is exact in a double, so `h < p·2^52` evaluates
    * bit-identically in every engine.
    */
  def resampleToTarget(df: DataFrame, groupCol: String, idCol: String,
      seed: String, shares: Map[String, Double] = Map.empty): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__ng"))
    val tot = counts.agg(sum("__ng").as("__n"),
      count(lit(1)).as("__ngroups"))
    val share =
      if (shares.isEmpty) lit(1.0) / col("__ngroups")
      else shares.foldLeft(lit(0.0): Column) { case (acc, (g, s)) =>
        when(col("__g") === g, lit(s)).otherwise(acc)
      }
    // broadcast the 1-row total like the siblings above — AQE would
    // pick it anyway, but an explicit hint keeps a copy-paste of this
    // pattern safe where the right side isn't provably tiny
    val p = counts.crossJoin(broadcast(tot))
      .select(col("__g"),
        least(lit(1.0), share * col("__n") / col("__ng")).as("__p"))
    val h52 = shiftright(
      TextOps.md5Hash60(concat_ws("_", lit(seed), col(idCol).cast("string"))),
      8).cast("double")
    df.join(broadcast(p), col(groupCol) === col("__g"))
      .where(h52 < col("__p") * lit(4503599627370496.0)) // 2^52
      .drop("__g", "__p")
  }

  /** Weighted priority sampling (Duffield–Lund–Thorup, JACM'07
    * "Priority sampling"): draw k rows with inclusion probability
    * increasing in `weightCol` AND keep subset sums estimable — each
    * kept row carries `est_weight = max(weight, τ)` where τ is the
    * (k+1)-th priority, making Σ est_weight over any kept subset an
    * unbiased estimator of that subset's true weight sum. This is the
    * "sample 10k documents but keep token counts estimable" primitive
    * a curation pipeline needs when it reports corpus composition from
    * a sample. Weights and τ are carried in 2^26 fixed point
    * (`est_weight_fp = max(w·2^26, τ)`) so every comparison is exact
    * integer math.
    *
    * Priority q = (w · 2^26) div (hash₂₆(id, seed) + 1) in exact 64-bit
    * integers (hash₂₆ = top 26 bits of the md5-60 hash, so q ≤ w·2^26
    * never overflows for w up to ~2^37): a deterministic, seed-keyed
    * stand-in for the paper's w/u with u ∈ (0,1] uniform. Ties broken
    * by id → total order → reproducible sample, SQL-replayable oracle.
    *
    * Scale shape: one narrow hash map, then ONE bounded global top-(k+1)
    * (TakeOrderedAndProject — per-partition heaps, no full sort); τ is
    * the boundary row, split off with a 1-row broadcast join rather
    * than a driver action. The corpus itself never shuffles.
    */
  /** Shared priority computation for [[prioritySample]] /
    * [[prioritySamplePerGroup]]: q = (w·2^26) div (hash₂₆(seed, id)+1),
    * exact in 64-bit for weights up to ~2^37.
    */
  private def withPriority(df: DataFrame, idCol: String,
      weightCol: String, seed: String): DataFrame = {
    val h26 = shiftright(TextOps.md5Hash60(
      concat_ws("_", lit(seed), col(idCol).cast("string"))), 34) + lit(1L)
    df.withColumn("__h", h26)
      .withColumn("priority_fp",
        expr(s"(cast(`$weightCol` as bigint) * 67108864L) div __h"))
      .drop("__h")
  }

  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k >= 1, "need k >= 1")
    val withQ = withPriority(df, idCol, weightCol, seed)
    // ONE bounded global top-(k+1): TakeOrderedAndProject (per-partition
    // heaps, no full sort). The k+1-row window ranking after it runs on
    // k+1 rows — not the 1-partition-full-table anti-pattern.
    val topK1 = withQ
      .orderBy(col("priority_fp").desc, col(idCol).asc).limit(k + 1)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("priority_fp").desc, col(idCol).asc)))
    // τ = the (k+1)-th priority; absent (≤ k rows total) → τ = 0, and
    // est_weight degenerates to the exact weight as the paper requires.
    val tau = broadcast(topK1.where(col("__rn") === k + 1)
      .select(col("priority_fp").as("__tau")))
    topK1.where(col("__rn") <= k)
      .join(tau, lit(true), "left")
      .withColumn("est_weight_fp",
        greatest(col(weightCol).cast("long") * lit(67108864L),
          coalesce(col("__tau"), lit(0L))))
      .drop("__rn", "__tau")
  }

  /** Per-group [[prioritySample]]: an independent weighted k-sample
    * (with its own τ) inside every group — "16 length-weighted docs
    * per language, composition still estimable". The group-wide
    * top-(k+1) runs through the bounded-heap `TopKPerKey` operator
    * (O(k) state per group, one shuffle by group key, no per-group
    * full sort); the rank/τ window after it touches ≤ k+1 rows per
    * group. τ is joined back per group — no driver action.
    */
  def prioritySamplePerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int, seed: String): DataFrame = {
    require(k >= 1 && groupCols.nonEmpty, "need k >= 1 and a group key")
    val withQ = withPriority(df, idCol, weightCol, seed)
    val topK1 = graft.plans.TopK.perKey(withQ, groupCols,
        Seq(col("priority_fp").desc, col(idCol).asc), k + 1)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("priority_fp").desc, col(idCol).asc)))
    val tau = topK1.where(col("__rn") === k + 1)
      .select(groupCols.map(col) :+ col("priority_fp").as("__tau"): _*)
    topK1.where(col("__rn") <= k)
      .join(tau, groupCols, "left")
      .withColumn("est_weight_fp",
        greatest(col(weightCol).cast("long") * lit(67108864L),
          coalesce(col("__tau"), lit(0L))))
      .drop("__rn", "__tau")
  }
}
