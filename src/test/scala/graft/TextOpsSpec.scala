package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).first().get(0)

  test("token count splits on whitespace, drops empties") {
    assert(one(TextOps.tokenCount($"text"), "a  b\tc\nd ") == 4)
  }

  test("word shingles of 'a b c d' with n=2") {
    val got = one(TextOps.wordShingles(TextOps.tokens($"text"), 2), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSeq == Seq("a b", "b c", "c d"))
  }

  test("chunkDocs: overlapping windows, document order, never zero rows") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = TextOps.chunkDocs(Seq((1L, doc)).toDF("id", "text"), "id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    // stride 3, nc = ceil((10-1)/3) = 3: starts 1,4,7 — full coverage
    assert(got.toSeq == Seq(
      (0, "w1 w2 w3 w4", 4), (1, "w4 w5 w6 w7", 4), (2, "w7 w8 w9 w10", 4)))
    // no overlap: chunks partition the document exactly
    val flat = TextOps.chunkDocs(Seq((1L, doc)).toDF("id", "text"), "id", "text",
        chunkTokens = 3, overlap = 0)
      .orderBy("chunk_id").collect().map(_.getString(2)).mkString(" ")
    assert(flat == doc)
    // whitespace-only doc still yields one (empty) chunk
    val empty = TextOps.chunkDocs(Seq((1L, "  \t ")).toDF("id", "text"),
        "id", "text", chunkTokens = 4, overlap = 1).collect()
    assert(empty.length == 1 && empty(0).getString(2) == ""
      && empty(0).getInt(3) == 0)
  }

  test("vocabTopK: count-desc order with deterministic token tie-break at the cut") {
    val df = Seq("b b a a c d").toDF("text")
    // counts: a=2 b=2 c=1 d=1; k=3 cuts inside the c/d tie -> c wins
    val got = TextOps.vocabTopK(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("langid: stopword argmax picks the right language") {
    assert(one(TextOps.langId($"text"), "the cat and the dog is here") == "en")
    assert(one(TextOps.langId($"text"), "el perro y la casa de que") == "es")
    assert(one(TextOps.langId($"text"), "der hund und die katze ist von") == "de")
    assert(one(TextOps.langId($"text"), "le chien et les chats est une") == "fr")
    assert(one(TextOps.langId($"text"), "这是一段中文文本内容测试") == "zh")
    assert(one(TextOps.langId($"text"), "xyzzy plugh") == "und")
  }

  test("quality score stays in [0,1]") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val mm = docs.select(min(TextOps.qualityScore(col("text"))).as("lo"),
      max(TextOps.qualityScore(col("text"))).as("hi")).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("all three winnowing implementations agree per doc") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents").limit(50)
    val viaExpr = docs.select(col("doc_id"),
        md5(array_join(TextOps.winnowFingerprints(col("text")), "")).as("fp"),
        size(TextOps.winnowFingerprints(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val viaTable = TextOps.winnowTable(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val wf = graft.expressions.WinnowFingerprint.of(col("text"))
    val viaCodegen = docs.select(col("doc_id"),
        wf.getField("fp_winnow"), wf.getField("n_winnow"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(viaTable == viaExpr)
    assert(viaCodegen == viaExpr)
  }

  test("WinnowMinima array equals the expression-form minima set") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents").limit(50)
    val mismatched = docs.select(
        graft.expressions.WinnowMinima.of(col("text")).as("m"),
        TextOps.winnowFingerprints(col("text")).as("e"))
      .where(col("m") =!= col("e")).count()
    assert(mismatched == 0)
  }

  test("winnowing fingerprint is order-sensitive, wordset fingerprint is not") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "dog lazy the over jumps fox brown quick the"
    val fwA = one(TextOps.wordSetFingerprint($"text"), a)
    val fwB = one(TextOps.wordSetFingerprint($"text"), b)
    assert(fwA == fwB) // same bag of words
    val winA = one(md5(array_join(TextOps.winnowFingerprints($"text"), "")), a)
    val winB = one(md5(array_join(TextOps.winnowFingerprints($"text"), "")), b)
    assert(winA != winB) // rolling char grams see the order
  }
}
