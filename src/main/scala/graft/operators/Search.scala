package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** BM25 lexical top-k retrieval — the sparse complement to the dense ANN
  * path in [[Similarity]]: a curation pipeline uses it for benchmark
  * decontamination lookups, targeted corpus slicing ("all docs about X"),
  * and hybrid (lexical + embedding) retrieval.
  *
  * Scale shape: the corpus tokenizes once (narrow map); postings are
  * pruned to the query vocabulary BEFORE the term-frequency shuffle by a
  * broadcast semi-join (query sets are tiny; the corpus never shuffles
  * full postings); document frequencies come off the pruned postings;
  * and ranking runs through the bounded-heap `TopK.perKey` operator —
  * O(k) memory per query, no full per-query sort.
  *
  * Determinism: the default `idf` is the classical
  * `ln(1 + (N - df + ½)/(df + ½))` — but `ln` is a libm call whose last
  * ULP differs across engines, so for cross-engine oracle checks
  * [[rationalIdf]] drops the log: `(2N − 2df + 1)/(2df + 1)` is the same
  * odds ratio computed entirely in exact 64-bit integers (every
  * intermediate < 2^53, so the one double division is bit-identical in
  * any IEEE engine). Rankings differ between the two idfs only when the
  * log's compression changes relative term weight — both are monotone
  * per-term, and both are deterministic given the corpus.
  */
object Search {

  val K1Num = 12L // k1 = 1.2 as a rational (12/10)
  val BNum = 75L  // b = 0.75 as a rational (75/100)

  /** Per-(query, doc) micro-score (1e-6 units, exact long sum), given
    * exact-integer inputs. See the object doc for the rational form:
    * num = idfNum * 22 * tf * S, den = idfDen * (10*tf*S + 3*S + 9*dl*N)
    * folds k1 = 1.2, b = 0.75 and avgdl = S/N into one integer fraction.
    */
  private def rationalTermMicro(n: Column, df: Column, tf: Column,
      dl: Column, s: Column): Column = {
    val num = (lit(2) * n - lit(2) * df + lit(1)) * lit(22) * tf * s
    val den = (lit(2) * df + lit(1)) *
      (lit(10) * tf * s + lit(3) * s + lit(9) * dl * n)
    round(num.cast("double") / den.cast("double") * lit(1e6)).cast("long")
  }

  /** Top-k BM25 matches per query. `queries` is a small DataFrame of
    * `(queryIdCol, termCol)` rows — one row per query term, lowercase.
    * Output: (query_id, doc id, score DOUBLE rounded to 6 dp, rank).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String = "query_id",
      termCol: String = "term", k: Int = 10): DataFrame = {
    val toks = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    // Corpus stats: one row, joined to every posting (broadcast).
    val stats = toks.agg(count(lit(1)).as("__n"), sum("__dl").as("__s"))
    val vocab = queries.select(col(termCol).as("__term")).distinct()
    // Postings pruned to the query vocabulary BEFORE the (doc, term)
    // shuffle: at 100 TB the explode is a narrow map and the broadcast
    // semi-join keeps only query-relevant tokens flowing into groupBy.
    val tf = toks.select(col(idCol), col("__dl"),
        explode(col("__toks")).as("__term"))
      .join(broadcast(vocab), "__term")
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    val perTerm = queries
      .select(col(queryIdCol), col(termCol).as("__term"))
      .join(tf, "__term")
      .join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__micro", rationalTermMicro(
        col("__n"), col("__df"), col("__tf"), col("__dl"), col("__s")))
    val scored = perTerm.groupBy(col(queryIdCol), col(idCol))
      .agg(sum("__micro").as("__micro")) // exact long sum: order-free
    val top = graft.plans.TopK.perKey(scored, Seq(queryIdCol),
      Seq(col("__micro").desc, col(idCol).asc), k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(queryIdCol))
          .orderBy(col("__micro").desc, col(idCol).asc)))
      .withColumn("score", round(col("__micro") / lit(1e6), 6))
      .select(col(queryIdCol), col(idCol), col("score"), col("rank"))
  }

  /** Per-document top-k terms by tf·idf with a RATIONAL idf surrogate:
    * `score_fp = tf * ((N << 20) div df)` — exact 64-bit integers, so the
    * distributed ranking is bit-identical to a serial replay. The
    * surrogate is monotone in tf and in 1/df (what tf·idf orders by);
    * like [[bm25TopK]]'s rational idf it trades the log's compression
    * for cross-engine exactness.
    *
    * Scale shape: tokenize (narrow map) → one (doc, term) shuffle for tf
    * → term-level df off the tf table (second small shuffle) → broadcast
    * df + N back onto tf → bounded-heap top-k per doc. The df table is
    * vocabulary-sized (≪ corpus), hence broadcast.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val tf = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(n))
      .withColumn("score_fp", col("tf") * expr("(n_docs * 1048576) div df"))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score_fp"))
    val top = graft.plans.TopK.perKey(scored, Seq(idCol),
      Seq(col("score_fp").desc, col("term").asc), k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol))
        .orderBy(col("score_fp").desc, col("term").asc)))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval combiner: each input ranking contributes
    * `scale div (c + rank)` per (query, doc), summed across rankings.
    * RRF uses only RANKS, so a BM25 list and a cosine-ANN list fuse
    * without score calibration; the floor division keeps every
    * contribution an exact integer (order-free sums, engine-exact).
    *
    * Scale shape: union of k-bounded ranking tables (tiny — k rows per
    * query per ranking) → one (query, doc) aggregation → bounded-heap
    * top-k. The expensive work happened upstream in the retrievers.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      k: Int, c: Long = 60L, scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty && c >= 0 && scale > 0)
    val unioned = rankings
      .map(_.select(col(queryCol), col(idCol), col("rank")))
      .reduce(_ unionByName _)
    val scored = unioned
      .withColumn("__contrib", expr(s"${scale}L div (${c}L + rank)"))
      .groupBy(col(queryCol), col(idCol))
      .agg(sum("__contrib").as("rrf_fp"))
    val top = graft.plans.TopK.perKey(scored, Seq(queryCol),
      Seq(col("rrf_fp").desc, col(idCol).asc), k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(queryCol))
        .orderBy(col("rrf_fp").desc, col(idCol).asc)))
  }
}
