package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup
import graft.sources.Tables

/** Equivalence and completeness checks for the approximate dedup family
  * against exact brute force on the small fixture.
  */
class DedupExtSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  /** Exact brute-force word-shingle Jaccard pairs (the oracle shape). */
  private def brutePairs(n: Int, threshold: Double): Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), n).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(TextOps.jaccard(col("sh_a"), col("sh_b")) >= threshold)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("MinHashSig expression is bit-identical to the explode+min aggregation") {
    val sh = docs.select(col("doc_id").as("id"),
        array_sort(transform(
          TextOps.wordShingles(TextOps.tokens(col("text")), 3),
          s => xxhash64(s))).as("hs"))
      .where(size(col("hs")) > 0)
    val viaAgg = sh.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(min(xxhash64(col("h"), lit(0))).as("s0"),
        (1 until 32).map(k => min(xxhash64(col("h"), lit(k))).as(s"s$k")): _*)
      .select(col("id"), array((0 until 32).map(k => col(s"s$k")): _*).as("sig"))
    val viaExpr = sh.select(col("id"),
      graft.expressions.MinHashSig.signature(col("hs"), 32).as("sig"))
    assert(viaExpr.join(viaAgg, "id")
      .where(viaExpr("sig") =!= viaAgg("sig")).count() == 0)
    assert(viaExpr.count() == viaAgg.count() && viaExpr.count() > 0)
    // interpreted eval path agrees with codegen
    val one = sh.limit(1).select(col("hs")).collect()(0).getSeq[Long](0)
    val interp = graft.expressions.MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        one, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), 32)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val fromDf = viaExpr.join(sh.limit(1), "id").select("sig")
      .collect()(0).getSeq[Long](0)
    assert(interp == fromDf)
  }

  test("minhash LSH finds exactly the brute-force pairs on fixture data") {
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleLen = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brutePairs(3, 0.5))
  }

  test("size-blocked ngram jaccard equals brute force (blocking is lossless)") {
    val blocked = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      shingleLen = 2, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brutePairs(2, 0.6))
  }

  test("simhash pigeonhole join is complete for hamming <= 3") {
    // Brute-force hamming pairs from the signatures themselves.
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.simhash64(TextOps.tokens(col("text"))).as("sim"))
    val a = sigs.select(col("id").as("id_a"), col("sim").as("sim_a"))
    val b = sigs.select(col("id").as("id_b"), col("sim").as("sim_b"))
    val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val joined = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(joined == brute)
  }

  test("near-dup operators accept non-Long id columns (string ids)") {
    val sdocs = docs.select(concat(lit("doc_"), col("doc_id")).as("doc_id"), col("text"))
    val pairs = Dedup.minhashNearDups(sdocs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val longPairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (s"doc_${r.getLong(0)}", s"doc_${r.getLong(1)}")).toSet
    // Same families found; ordering of (a,b) may flip because string ids
    // sort lexicographically ("doc_10" < "doc_9") — compare unordered.
    def unordered(s: Set[(String, String)]) =
      s.map { case (a, b) => if (a < b) (a, b) else (b, a) }
    assert(unordered(pairs) == unordered(longPairs))
  }

  test("exact dedup groups cover all rows exactly once") {
    val out = Dedup.exactByKey(docs, "doc_id", lower(substring(col("text"), 1, 40)))
    assert(out.agg(sum("n_dups")).first().getLong(0) == docs.count())
  }

  test("incremental minhash equals the cross-split slice of the symmetric op") {
    val newDf = docs.where(col("doc_id") % 5 === 0)
    val oldDf = docs.where(col("doc_id") % 5 =!= 0)
    val inc = Dedup.minhashIncremental(newDf, oldDf, "doc_id", "text",
        shingleLen = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // symmetric pairs (id_a < id_b) reoriented to (new, old), cross-split only
    val sym = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleLen = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        Seq((a, b, j), (b, a, j)) // both orientations
      }
      .filter { case (n, o, _) => n % 5 == 0 && o % 5 != 0 }
      .toSet
    assert(inc == sym)
    assert(inc.nonEmpty, "fixture should contain cross-split near-dups")
  }

  test("containment: directed, exact on a synthetic snippet-in-article pair") {
    import spark.implicits._
    // article = snippet + lots of extra text; J(snippet, article) is low
    // but containment(snippet -> article) = 1
    val snippet = "alpha beta gamma delta epsilon zeta"
    val extra = (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val df = Seq((1L, snippet), (2L, s"$snippet $extra"),
      (3L, "unrelated totally different text here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        shingleLen = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 2L)),
      s"expected only snippet->article, got ${out.mkString(",")}")
    assert(out.head._3 == 1.0) // every snippet shingle is in the article
    // symmetric jaccard must NOT pair them at its usual threshold
    val j = Dedup.ngramJaccardNearDups(df, "doc_id", "text",
      shingleLen = 2, threshold = 0.6)
    assert(j.count() == 0)
  }

  test("containment on the fixture: every pair verifies against brute force") {
    val sh = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), 2).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val brute = a.crossJoin(b).where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("c"),
        size(col("sh_a")).as("sz"))
      .where(col("c") * 1000 >= col("sz") * 700 && col("sz") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleLen = 2, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute)
  }
}
