package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-LM document scoring (CCNet-style quality filter): train a
  * unigram model on the corpus itself, score each document by its
  * mean per-token surprisal — rare-/garbage-vocabulary documents
  * score high, fluent common-vocabulary documents low. The classic
  * pipeline uses LM perplexity; the semantics here are identical in
  * shape (mean −log₂ p(token)) with one deliberate twist for engine
  * parity: surprisal is the INTEGER floor-log₂
  *
  *   bits(t) = ⌊log₂ ((N + V) div (c_t + 1))⌋
  *
  * of the add-one-smoothed inverse probability — computed as
  * `length(bin(x)) − 1`, pure integer/string ops, so Spark and any
  * SQL oracle agree bit-for-bit (the [[Search.rationalIdf]] trick:
  * drop the transcendental, keep the monotone ranking; within 1 bit
  * of the real log, exact at powers of two).
  *
  * Scale shape: tokenize+explode is narrow; vocab counts are ONE
  * map-side-combinable shuffle; (N, V) is a two-long scalar
  * broadcast; surprisal joins back token→bits (broadcast under AQE
  * while the vocab is small, shuffled-hash beyond); per-doc mean is
  * one more shuffle keyed by doc id. No driver materialization of
  * anything corpus-sized.
  *
  * Tokens = [[graft.functions.TextOps.tokens]] (lowercased
  * whitespace split). Zero-token documents drop out (no tokens to
  * average — same in the SQL replay's inner join).
  */
object LmScore {

  /** (id, n_tokens, avg_bits): mean integer surprisal per document,
    * avg_bits rounded to 6 dp.
    */
  def unigramSurprisal(df0: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    val words = df.select(col(idCol).as("id"),
      explode(graft.functions.TextOps.tokens(col(textCol))).as("t"))
    val vocab = words.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val bits = vocab.crossJoin(broadcast(totals))
      .withColumn("bits",
        (length(bin(expr("(n + v) div (c + 1)"))) - 1).cast("long"))
      .select("t", "bits")
    words.join(bits, "t")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("__sb"))
      .select(col("id"), col("n_tokens"),
        round(col("__sb").cast("double") / col("n_tokens"), 6)
          .as("avg_bits"))
  }
}
