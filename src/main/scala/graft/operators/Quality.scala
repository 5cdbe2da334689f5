package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality quarantine (constraint checking): evaluate a rule set
  * over every row, quarantine the rows that violate any rule together
  * with the sorted list of violated rule names — the validating sibling
  * of the reference's sanitization pass (W1 rewrites bad cells; this
  * REPORTS bad rows so a pipeline can dead-letter them instead of
  * silently shipping them).
  *
  * A rule predicate evaluating to NULL (e.g. a comparison on a NULL
  * cell) counts as a VIOLATION — unknown is not a pass, the standard
  * dead-letter posture.
  *
  * Scale shape: one narrow map evaluating all predicates per row (one
  * codegen'd projection, no shuffle) + the filter; output size is the
  * violation count, not the table.
  */
object Quality {

  /** Rows violating ≥1 rule: id columns + `violations ARRAY<STRING>`
    * (rule names, sorted).
    */
  def quarantine(df: DataFrame, idCols: Seq[String],
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val flags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("violations",
        array_sort(filter(array(flags: _*), v => v.isNotNull)))
      .where(size(col("violations")) > 0)
      .select(idCols.map(col) :+ col("violations"): _*)
  }

  /** Blocklist audit — the banned-term filter every web-corpus pipeline
    * runs before training: per document, the whole-word hit count
    * against `terms`, the distinct matched terms (sorted,
    * comma-joined), and a keep/flag/drop action (`drop` at ≥ `dropAt`
    * hits, `flag` at ≥ `flagAt`).
    *
    * Scale shape: the blocklist is a literal array inside one
    * codegen'd narrow projection — no join, no shuffle, no UDF; the
    * corpus is scanned once in place. A blocklist too large for a
    * literal (100k+ phrases) would switch to a broadcast join on
    * exploded tokens; for the word lists actually used (hundreds of
    * terms) the in-expression form is strictly cheaper.
    */
  def blocklistAudit(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], flagAt: Int = 1, dropAt: Int = 3): DataFrame = {
    require(terms.nonEmpty && flagAt >= 1 && dropAt >= flagAt)
    val termArr = array(terms.map(lit): _*)
    // NULL text audits as zero hits (keep), not a NULL row
    val hits = filter(
      coalesce(graft.functions.TextOps.tokens(col(textCol)),
        array().cast("array<string>")),
      t => array_contains(termArr, t))
    df.select(col(idCol), hits.as("__h"))
      .select(
        col(idCol),
        size(col("__h")).cast("long").as("n_hits"),
        array_join(array_sort(array_distinct(col("__h"))), ",").as("hit_terms"),
        when(size(col("__h")) >= dropAt, lit("drop"))
          .when(size(col("__h")) >= flagAt, lit("flag"))
          .otherwise(lit("keep")).as("action"))
  }

  /** Gopher-style rule-bundle document filter (Rae et al. 2021 §A1.1,
    * public): the hard quality gates a web corpus passes BEFORE any
    * model-based scoring —
    *   - token count within [`minTokens`, `maxTokens`],
    *   - mean token length within [3, 6] characters,
    *   - type-token ratio ≥ 0.35 (loops/boilerplate repeat vocabulary),
    *   - ≥ 1 English stopword hit (the "is this prose at all" test).
    * Emits per document the integer evidence (`n_tokens`,
    * `mean_len_micro`, `ttr_micro`, `sw_hits` — micro fixed-point, no
    * float thresholds to drift across engines), the FIRST failing rule
    * name in the fixed order above (`'' `= clean), and the `keep` bit.
    * Reporting the reason, not just the bit, is what makes the filter
    * tunable: curation dashboards histogram reject reasons per source.
    *
    * Scale shape: one codegen'd narrow projection per row — no shuffle,
    * no UDF; the corpus is scanned once in place.
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 20, maxTokens: Long = 80): DataFrame = {
    val toks = coalesce(graft.functions.TextOps.tokens(col(textCol)),
      array().cast("array<string>"))
    val en = graft.functions.TextOps.stopwords("en")
    df.select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("__len"),
        size(array_distinct(toks)).cast("long").as("__dist"),
        size(filter(toks, t => t.isInCollection(en))).cast("long").as("sw_hits"))
      .select(
        col(idCol),
        col("n_tokens"),
        expr("(__len * 1000000) DIV greatest(n_tokens, 1)").as("mean_len_micro"),
        expr("(__dist * 1000000) DIV greatest(n_tokens, 1)").as("ttr_micro"),
        col("sw_hits"))
      .withColumn("reject_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("mean_len_micro") < 3000000L ||
            col("mean_len_micro") > 6000000L, "mean_len")
          .when(col("ttr_micro") < 350000L, "low_ttr")
          .when(col("sw_hits") < 1L, "no_stopwords")
          .otherwise(""))
      .withColumn("keep", col("reject_reason") === "")
  }

  /** Per-group unigram total-variation distance from the corpus-wide
    * token distribution — the mixture diagnostic that says HOW different
    * each source/language is from the blend (0 = identical distribution,
    * →1 = disjoint vocabulary). Computed exactly:
    * `TV(g) = ½·(Σ_present |c_gt·n − c_t·n_g| / (n_g·n) + (n − Σ_present c_t)/n)`
    * — the second term folds every token ABSENT from group g
    * (|0 − c_t/n| summed) via Σ_absent = n − Σ_present, so only observed
    * (group, token) rows are ever materialized. All sums are exact
    * integers (order-free under any partitioning); doubles appear only
    * in the final per-group expression, which every engine evaluates
    * identically.
    *
    * Scale shape: the corpus is tokenized ONCE into a partial-aggregated
    * (group, token) count table; the per-token corpus count comes from a
    * window over that table partitioned by token (scales with vocabulary,
    * never a global partition), per-group totals are a tiny broadcast
    * join. Counts beyond ~3·10⁹ tokens × large groups need the
    * decimal(38,0) widening of the `c_gt·n` products (int64 documented
    * limit).
    */
  def unigramDivergence(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tok = graft.sources.Tables.rebalanceForCompute(df)
      .select(col(groupCol).as("g"),
        explode(graft.functions.TextOps.tokens(col(textCol))).as("t"))
    // The (group, token) count table feeds three consumers (the
    // per-token window, the per-group totals, and through them the
    // grand total) — cut its lineage so the tokenize-explode-aggregate
    // pipeline runs once, not once per reference.
    val cgt = graft.sources.Tables.cutLineage(
      tok.groupBy("g", "t").agg(count(lit(1)).as("cgt")))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("t")
    val withCt = cgt.withColumn("ct", sum("cgt").over(wt))
    val ng = cgt.groupBy("g").agg(sum("cgt").as("ng"))
    val n = ng.agg(sum("ng").as("n"))
    withCt
      .join(broadcast(ng), Seq("g"))
      .crossJoin(broadcast(n))
      .groupBy(col("g").as(groupCol), col("ng").as("n_tokens"), col("n"))
      .agg(sum(abs(col("cgt") * col("n") - col("ct") * col("ng"))).as("sd"),
        sum("ct").as("st"))
      .select(col(groupCol), col("n_tokens"),
        round(lit(0.5) * (col("sd") / (col("n_tokens") * col("n")) +
          (col("n") - col("st")) / col("n")), 6).as("tv_dist"))
  }
}
