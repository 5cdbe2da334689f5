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

  /** Conditional bigram surprisal — the next-order LM filter: a
    * document whose WORD PAIRS are improbable scores high even when
    * every individual word is common ("the the the" fools a unigram
    * model, not this). Same integer floor-log₂ contract as
    * [[unigramSurprisal]], applied to the add-one-smoothed conditional:
    *
    *   bits(w₂|w₁) = ⌊log₂ ((c(w₁) + V) div (c(w₁,w₂) + 1))⌋
    *
    * with c(w₁) the CONTEXT count (occurrences of w₁ as a bigram left
    * side) and V the corpus unigram vocabulary — the standard add-one
    * conditional denominator.
    *
    * Scale shape: bigram expansion is one narrow indexed-transform
    * (each token pairs with its successor — no self-join); context and
    * bigram counts are two map-side-combinable shuffles; V rides a
    * 1-row broadcast; score-back joins on the bigram key (broadcast
    * under AQE while the bigram table is small). Documents with < 2
    * tokens have no bigrams and drop out, as in the SQL replay.
    *
    * @return (id, n_bigrams, avg_bits), avg_bits rounded to 6 dp.
    */
  def bigramSurprisal(df0: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    val toks = df.select(col(idCol).as("id"),
      graft.functions.TextOps.tokens(col(textCol)).as("ts"))
    // Spark SQL array subscripts are 0-based: slice drops the last
    // token, lambda index i addresses it, ts[i + 1] is its successor.
    val pairs = toks.where(size(col("ts")) >= 2)
      .select(col("id"), explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), " +
          "(x, i) -> struct(x AS w1, ts[i + 1] AS w2))")).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val ctx = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = df.select(
        explode(graft.functions.TextOps.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val bits = big.join(ctx, "w1").crossJoin(broadcast(vocab))
      .withColumn("bits",
        (length(bin(expr("(c1 + v) div (c12 + 1)"))) - 1).cast("long"))
      .select("w1", "w2", "bits")
    pairs.join(bits, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("__sb"))
      .select(col("id"), col("n_bigrams"),
        round(col("__sb").cast("double") / col("n_bigrams"), 6)
          .as("avg_bits"))
  }
}
