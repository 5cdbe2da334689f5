package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Quality, Sampling, Similarity}
import graft.sources.Tables

/** Unit checks for the tokenizer-training / mixture-rebalancing batch:
  * BPE merge induction + apply, stratified resampling, unigram
  * total-variation divergence, centroid-cosine outliers, and the
  * blocklist audit. Hand-computable fixtures; oracle parity is covered
  * by the driver queries.
  */
class MixtureOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bpe: merges learn the hand-computed sequence, greedy-leftmost") {
    val df = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val got = Bpe.merges(df, "text", numMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // vocab: low×3 " l  o  w ", lower×1 " l  o  w  e  r "
    // pairs (l,o):4 (o,w):4 (w,e):1 (e,r):1 → tie on 4 breaks (a,b) asc
    assert(got.toSeq == Seq(
      (1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
  }

  test("bpe: encode applies merges in rank order; counts are exact") {
    val df = Seq((1L, "low low lower"), (2L, "war"), (3L, "")).toDF("doc_id", "text")
    val m = Bpe.merges(Seq((0L, "low low low lower")).toDF("doc_id", "text"),
      "text", numMerges = 4)
    val got = Bpe.encode(df, "doc_id", "text", m).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: low→[low] low→[low] lower→[low er]→[lower] (merge 4 fuses
    // it) = 3 words, 3 tokens
    // doc2: war has no learned merge → w a r = 3 tokens
    // doc3: empty → 0 / 0
    assert(got.toSeq == Seq((1L, 3L, 3L), (2L, 1L, 3L), (3L, 0L, 0L)))
  }

  test("bpe: maxVocab cap keeps the most frequent words, exact above |vocab|") {
    val df = Seq((1L, "low low low lower rare")).toDF("doc_id", "text")
    val full = Bpe.merges(df, "text", numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // any cap ≥ |vocab| (3 words) is exact — identical to the default
    val atCap = Bpe.merges(df, "text", numMerges = 2, maxVocab = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(atCap.toSeq == full.toSeq)
    // cap 2 keeps {low×3, lower×1} (count desc, word asc drops rare×1):
    // pairs unchanged for l/o/w, so merge 1 is still (l,o) with count 4
    val capped = Bpe.merges(df, "text", numMerges = 1, maxVocab = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(capped.toSeq == Seq(("l", "o", 4L)))
  }

  test("bpe: greedy-leftmost replace ('aaaa'→'aa aa', 'aaa'→'aa a')") {
    val train = Seq((0L, "aa aa aa")).toDF("doc_id", "text") // merge (a,a)
    val m = Bpe.merges(train, "text", numMerges = 1)
    val df = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.encode(df, "doc_id", "text", m).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L))) // aa|aa and aa|a
  }

  test("resampleToTarget: deterministic, partition-invariant, respects p=1") {
    val docs = Tables.load(spark, sf0001, "documents")
    val a = Sampling.resampleToTarget(docs, "lang", "doc_id", "s1")
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.resampleToTarget(docs.repartition(7), "lang", "doc_id", "s1")
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    // groups at/below the uniform target (p=1) keep every row
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = full.values.sum.toDouble / full.size
    val kept = Sampling.resampleToTarget(docs, "lang", "doc_id", "s1")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (g, n) =>
      if (n <= target) assert(kept.getOrElse(g, 0L) == n, s"lang=$g")
      else assert(kept.getOrElse(g, 0L) <= n, s"lang=$g")
    }
    // a different seed draws a different subset (overwhelmingly likely)
    val c = Sampling.resampleToTarget(docs, "lang", "doc_id", "s2")
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq != c.toSeq)
  }

  test("unigramDivergence: 0 for identical halves, 0.5 for disjoint halves") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val tv0 = Quality.unigramDivergence(same, "source", "text")
      .select("tv_dist").as[Double].collect()
    assert(tv0.forall(_ == 0.0))
    // disjoint equal-sized vocabularies vs the 50/50 blend → TV = 0.5
    val disj = Seq(("a", "x x y"), ("b", "u u v")).toDF("source", "text")
    val tvd = Quality.unigramDivergence(disj, "source", "text")
      .select("tv_dist").as[Double].collect()
    assert(tvd.forall(_ == 0.5))
  }

  test("centroidCosine: singleton label → cos exactly 1; null-safe") {
    val df = Seq(
      (1L, 0, Array(0.5f, 0.25f, -0.125f)),
      (2L, 1, Array(1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidCosine(df, "label", "vec_id", "embedding")
      .orderBy("id").collect()
    assert(got(0).getDouble(2) == 1.0) // own centroid of a singleton
    // label 1: centroid sums to the zero vector → nb = 0 → null cosine
    assert(got(1).isNullAt(2) && got(2).isNullAt(2))
  }

  test("blocklistAudit: whole-word hits, thresholds, null text audits clean") {
    val df = Seq(
      (1L, "slow sort big slow"), // 4 hits → drop
      (2L, "slowly big"),         // 1 hit (slowly is NOT slow) → flag
      (3L, "fast"),               // 0 hits → keep
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Quality.blocklistAudit(df, "doc_id", "text",
        Seq("slow", "big", "sort"), flagAt = 1, dropAt = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, "big,slow,sort", "drop"),
      (2L, 1L, "big", "flag"),
      (3L, 0L, "", "keep"),
      (4L, 0L, "", "keep")))
  }
}
