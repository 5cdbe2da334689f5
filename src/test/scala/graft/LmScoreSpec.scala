package graft

import org.apache.spark.sql.functions._
import graft.operators.LmScore
import graft.sources.Tables

class LmScoreSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("unigramSurprisal: rare vocabulary scores above common vocabulary") {
    // 'the the the' repeated everywhere vs one doc of hapaxes.
    val df = docs(
      1L -> "the cat sat", 2L -> "the dog sat", 3L -> "the cat ran",
      4L -> "zyx qwv jkl")
    val out = LmScore.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(4) > out(1) && out(4) > out(2) && out(4) > out(3))
  }

  test("unigramSurprisal: hand-computed bits on a tiny corpus") {
    // corpus: a a b  -> N=3, V=2; bits(a)=floor(log2((3+2) div (2+1)))=0
    // bits(b)=floor(log2(5 div 2))=1
    val out = LmScore.unigramSurprisal(docs(1L -> "a a b"), "doc_id", "text")
      .head
    assert(out.getLong(1) == 3)
    assert(out.getDouble(2) == math.rint(1.0 / 3 * 1e6) / 1e6)
  }

  test("unigramSurprisal: zero-token and null docs drop out") {
    val df = docs(1L -> "hello world", 2L -> "   ", 3L -> null)
    val out = LmScore.unigramSurprisal(df, "doc_id", "text")
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("unigramSurprisal: invariant under repartitioning") {
    val d = Tables.load(spark, sf0001, "documents")
    val a = LmScore.unigramSurprisal(d, "doc_id", "text")
      .orderBy("id").collect().toSeq
    val b = LmScore.unigramSurprisal(d.repartition(5), "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
