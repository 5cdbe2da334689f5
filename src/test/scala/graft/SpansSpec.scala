package graft

import org.apache.spark.sql.functions._
import graft.operators.Spans

/** Duplicate-span detection/removal on handcrafted corpora where the
  * expected spans are known exactly, plus invariants on fixture data.
  */
class SpansSpec extends SparkSpec {

  import spark.implicits._

  // A 12-token passage shared by docs 1 and 2 (offset differently),
  // doc 3 unique, doc 4 shorter than k.
  private val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private lazy val corpus = Seq(
    (1L, s"intro one two $passage tail1 tail2"),
    (2L, s"$passage closing words here"),
    (3L, "completely unique words that appear nowhere else in the corpus at all honestly"),
    (4L, "too short")
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds the shared passage with exact boundaries") {
    val spans = Spans.duplicatedSpans(corpus, "doc_id", "text", k = 10)
      .orderBy("doc_id").collect()
    // passage = 12 tokens; in doc 1 it starts at token 4 (intro one two),
    // in doc 2 at token 1.
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 4L, 15L, 12L), (2L, 1L, 12L, 12L)))
  }

  test("spans shorter than k and unique docs produce no spans") {
    val spans = Spans.duplicatedSpans(corpus, "doc_id", "text", k = 13)
    assert(spans.count() == 0)
  }

  test("two distant repeats in one doc pair merge only when overlapping") {
    // Shared run of exactly k=4: one island per occurrence region.
    val df = Seq(
      (1L, "a b c d X X X X X a b c d"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(df, "doc_id", "text", k = 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 repeats "a b c d" at 1..4 and 10..13 (distance > k: two spans)
    assert(spans.toSeq == Seq((1L, 1L, 4L), (1L, 10L, 13L), (2L, 1L, 4L)))
  }

  test("removeDuplicateSpans keeps the first occurrence, strips the rest") {
    val cleaned = Spans.removeDuplicateSpans(corpus, "doc_id", "text", k = 10)
      .orderBy("doc_id").collect()
    val byId = cleaned.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 holds the canonical (lowest doc_id) copy: untouched.
    assert(byId(1L) == (s"intro one two $passage tail1 tail2", 17L, 0L))
    // doc 2 loses the whole 12-token passage, keeps its tail.
    assert(byId(2L) == ("closing words here", 3L, 12L))
    // unique and short docs unchanged.
    assert(byId(3L)._3 == 0L && byId(4L)._3 == 0L)
    assert(byId(4L)._1 == "too short")
  }

  test("xxhash64 production path equals the md5 oracle path") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    def run(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Spans.duplicatedSpans(docs, "doc_id", "text", k = 10, hashFn = h)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(graft.functions.TextOps.md5Hash60) == run(xxhash64(_)))
  }

  test("fixture invariants: spans >= k tokens, removal conserves tokens") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val spans = Spans.duplicatedSpans(docs, "doc_id", "text", k = 10)
    assert(spans.where(col("span_tokens") < 10).count() == 0)
    assert(spans.count() > 0) // the synthetic corpus does repeat itself
    val rem = Spans.removeDuplicateSpans(docs, "doc_id", "text", k = 10)
    assert(rem.count() == docs.count())
    // n_kept must equal the clean text's token count (round-trip check).
    val bad = rem.where(
      graft.functions.TextOps.tokenCount(col("clean_text")).cast("long")
        =!= col("n_kept")).count()
    assert(bad == 0)
  }
}
