package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with a held-out evaluation/benchmark set, so they can be
  * dropped (or down-weighted) before training. The standard published
  * recipe (GPT-3 appendix C / PaLM / Llama, all public) is exactly this
  * n-gram-overlap test.
  *
  * Scale shape: the benchmark side is eval suites — thousands of
  * documents against a 100 TB corpus — so its distinct-gram set is
  * explicitly `broadcast()`: the corpus side keeps its partitioning, no
  * shuffle of corpus grams ever happens, and the whole job is one
  * narrow explode + broadcast hash LEFT join + one partial-aggregated
  * groupBy per corpus document. If a benchmark ever outgrew broadcast
  * range, dropping the hint degrades gracefully to a shuffled join.
  */
object Decontaminate {

  /** Per corpus document: `n_grams` (distinct word n-grams),
    * `n_contaminated` (of those, how many appear anywhere in
    * `bench`), `contam_frac`, and the `contaminated` flag.
    * Documents shorter than `n` tokens contribute one truncated gram
    * (the whole document) — [[TextOps.wordShingles]]' convention — so
    * a short duplicated doc still matches.
    */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // tokens materialized into a column FIRST: Spark does not CSE HOF
    // lambda children, so shingling directly over tokens(text) would
    // re-tokenize the document once per gram (the quadratic nested-HOF
    // trap this repo hit on winnowing)
    def grams(df: DataFrame) = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(col("id"), explode(TextOps.wordShingles(col("__t"), n)).as("g"))
    val benchGrams = broadcast(
      grams(bench).select("g").distinct().withColumn("__hit", lit(1)))
    grams(corpus)
      .join(benchGrams, Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_contaminated"))
      .select(
        col("id"),
        col("n_grams"),
        col("n_contaminated"),
        round(col("n_contaminated") / col("n_grams"), 6).as("contam_frac"),
        (col("n_contaminated") > 0).as("contaminated"))
  }

  /** Semantic (embedding-space) decontamination — the companion to the
    * n-gram test above: flag corpus vectors whose cosine similarity to
    * ANY benchmark vector reaches `threshold`, reporting the best
    * match. Catches paraphrased/reworded benchmark leakage that exact
    * n-gram overlap misses (the published recipe behind
    * embedding-based contamination audits).
    *
    * Scale shape: mirrors [[overlap]] — the benchmark side is tiny
    * (eval suites vs a 100 TB corpus) and explicitly `broadcast()`;
    * the corpus is scanned once in place, scored against the broadcast
    * vectors in a codegen'd dot product, thresholded EARLY (before any
    * aggregation state), and reduced per corpus id by a hash-aggregate
    * `max_by` — no window sort, no corpus shuffle beyond the per-id
    * combine of already-filtered survivors.
    */
  def semantic(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    import graft.expressions.VecOps
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("c_vec"),
      VecOps.norm(col(vecCol)).as("c_nrm"))
    val b = broadcast(bench.select(col(idCol).as("bench_id"),
      col(vecCol).as("b_vec"), VecOps.norm(col(vecCol)).as("b_nrm")))
    c.join(b)
      .withColumn("cos", round(
        VecOps.dot(col("c_vec"), col("b_vec")) / (col("c_nrm") * col("b_nrm")), 6))
      .where(col("cos") >= lit(threshold))
      .groupBy("id")
      // best benchmark match; cos ties break on the SMALLEST bench id
      // (negated in the ordering struct) to mirror the oracle's
      // `ORDER BY cos DESC, bench_id` rank
      .agg(max_by(struct(col("bench_id"), col("cos")),
        struct(col("cos"), -col("bench_id"))).as("m"))
      .select(col("id"), col("m.bench_id").as("bench_id"), col("m.cos").as("cos"))
  }
}
