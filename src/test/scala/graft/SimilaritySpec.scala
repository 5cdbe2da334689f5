package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("cosine is 1 for identical vectors, symmetric otherwise") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(3f, 2f, 1f))).toDF("vec_id", "embedding")
    val pairs = Similarity.bruteForcePairs(df, "vec_id", "embedding", threshold = -1)
      .collect()
    assert(pairs.length == 1)
    val c = pairs(0).getDouble(2)
    assert(c > 0.7 && c < 0.72) // 10/14 = 0.714...
    val self = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 1)
    assert(self.where(col("cos") > 0.999).count() == 0) // self excluded
  }

  test("LSH top-k ranks candidates identically to brute force where they overlap") {
    val q = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, tables = 8, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // LSH scores must agree exactly with brute-force scores for any
    // (query, neighbor) it returns; recall is reported, not asserted ==1.
    val bruteScores = brute.map { case (q2, n, c) => (q2, n) -> c }.toMap
    lsh.foreach { case (q2, n, c) =>
      bruteScores.get((q2, n)).foreach(bc => assert(bc == c))
    }
    val recall = lsh.count { case (q2, n, _) => bruteScores.contains((q2, n)) }.toDouble / brute.size
    info(s"LSH top-k recall vs brute force: $recall")
    // The fixture embeddings are random and near-orthogonal (max pairwise
    // cosine ~0.5), so hyperplane buckets carry little signal — recall here
    // is a smoke floor. On clustered real embeddings recall tracks
    // 1-(1-p^bits)^tables with p = 1 - angle/pi.
    assert(recall > 0.0)
  }

  test("IVF top-k: scores agree with brute force, partitions cover the corpus") {
    val q = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      cells = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // any returned (query, neighbor) must carry the exact brute-force score
    ivf.foreach { case (q2, n, c) =>
      brute.get((q2, n)).foreach(bc => assert(bc == c)) }
    val recall = ivf.count { case (q2, n, _) => brute.contains((q2, n)) }.toDouble / brute.size
    info(s"IVF top-k recall vs brute force (nprobe=4/16): $recall")
    assert(recall > 0.0)
    // probing ALL cells must recover brute force exactly (candidate gen
    // is a partition, not a filter)
    val full = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      cells = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full == brute)
    // deterministic: repeated runs identical
    val again = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      cells = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("LSH near-dup pairs are a subset of brute-force pairs with equal scores") {
    val brute = Similarity.bruteForcePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.lshNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(brute))
  }

  test("random projection: deterministic, linear, matches explicit plane dot") {
    import spark.implicits._
    val a = Array.tabulate(64)(i => (i % 5 - 2).toFloat)
    val b = Array.tabulate(64)(i => (i % 3 - 1).toFloat)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a), (2L, b), (3L, sum)).toDF("vec_id", "embedding")
    val got = Similarity.randomProject(df, "vec_id", "embedding", outDims = 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    // projection is linear: p(a + b) == p(a) + p(b) (up to the round-6)
    (0 until 4).foreach { j =>
      assert(math.abs(got(3L)(j) - (got(1L)(j) + got(2L)(j))) < 2e-6)
    }
    // p0 of `a` equals the explicit double fold over projPlaneValues(0)
    val want = a.map(_.toDouble).zip(Similarity.projPlaneValues(0))
      .foldLeft(0.0) { case (acc, (x, p)) => acc + x * p }
    assert(got(1L)(0) == math.rint(want * 1e6) / 1e6 ||
      math.abs(got(1L)(0) - want) < 1e-6)
    // deterministic across invocations
    val again = Similarity.randomProject(df, "vec_id", "embedding", outDims = 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(again == got)
  }

  test("mutual top-1: aligned pairs survive, hub's extra suitors filtered") {
    import spark.implicits._
    // a1<->b1 aligned; a2 and a3 both point at hub b2, but b2's nearest
    // is a2 -> (a2,b2) mutual, (a3,b2) one-directional only.
    val a = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val b = Seq(
      (11L, Array(0.99f, 0.01f, 0f)),
      (12L, Array(0.05f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualTop1(a, b, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (2L, 12L)))
  }

  test("hard negatives: different label, contiguous ranks, driver-replay top-1") {
    val q = emb.where(col("vec_id") < 5)
    val rows = Similarity.hardNegatives(emb, q, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Any]("q_label") != r.getAs[Any]("n_label"))
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id"))
    }
    // per-query ranks are 1..n contiguous, cos non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to g.length))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // driver-side replay: top-1 for query 0 is the true different-label argmax
    val all = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Any](1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val (qid, qlab, qv) = all.find(_._1 == 0L).get
    val want = all.filter(t => t._1 != qid && t._2 != qlab)
      .map(t => (math.rint(cos(qv, t._3) * 1e6) / 1e6, t._1))
      .maxBy { case (c, id) => (c, -id) }
    val got = rows.filter(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Int]("rank") == 1).head
    assert(got.getAs[Long]("neighbor_id") == want._2)
    assert(math.abs(got.getAs[Double]("cos") - want._1) < 1e-6)
  }
}
