package graft

import org.apache.spark.sql.functions._
import graft.operators.Kmeans
import graft.sources.Tables

class KmeansSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("fitCentroids: k*dims rows, sizes sum to corpus, pos covers dims") {
    val out = Kmeans.fitCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 2).cache()
    val cids = out.select("cid").distinct().count()
    assert(cids <= 4 && cids >= 1)
    // every surviving cluster carries all 64 positions
    val perCid = out.groupBy("cid").count().collect()
    perCid.foreach(r => assert(r.getLong(1) == 64, s"cid ${r.get(0)}"))
    // n is constant across positions of one cluster; sizes sum to corpus
    val sizes = out.where(col("pos") === 1).agg(sum("n")).head.getLong(0)
    assert(sizes == emb.count())
    out.unpersist()
  }

  test("fitCentroids: iterations strictly reduce total within-cluster cost") {
    // Lloyd's algorithm never increases the objective; with distinct
    // real data and few seeds, 1 -> 3 iterations must improve it here.
    def cost(iters: Int): Double = {
      val cents = Kmeans.fitCentroids(emb, "vec_id", "embedding",
        k = 4, iters = iters)
        .collect().groupBy(_.getLong(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getLong(1)).map(_.getDouble(2))
        }
      val vecs = emb.select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      vecs.map { v =>
        cents.values.map(c =>
          v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }
    assert(cost(3) < cost(1))
  }

  test("ivfTrainedTopK: exact scores, full-probe = brute force, deterministic") {
    import graft.operators.Similarity
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") < 5)
    val cents = Kmeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfk = Similarity.ivfTrainedTopK(emb, q, "vec_id", "embedding", 5,
      cents, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivfk.nonEmpty)
    // any returned (query, neighbor) carries the exact brute-force score
    ivfk.foreach { case (q2, n, c) =>
      brute.get((q2, n)).foreach(bc => assert(bc == c)) }
    val recall = ivfk.count { case (q2, n, _) =>
      brute.contains((q2, n)) }.toDouble / brute.size
    info(s"trained-IVF recall vs brute force (nprobe=2/4): $recall")
    assert(recall > 0.0)
    // probing ALL cells recovers brute force exactly
    val full = Similarity.ivfTrainedTopK(emb, q, "vec_id", "embedding", 5,
      cents, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full == brute)
  }

  test("semanticNearDups: subset of brute-force pairs with equal scores") {
    import graft.operators.Similarity
    val cents = Kmeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val brute = Similarity.bruteForcePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sem = Similarity.semanticNearDups(emb, "vec_id", "embedding",
        cents, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sem.subsetOf(brute))
    info(s"semantic recall vs brute force: ${sem.size}/${brute.size}")
    assert(sem.nonEmpty)
  }

  test("fitCentroids: deterministic across runs and partitionings") {
    val a = Kmeans.fitCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("cid", "pos").collect().toSeq
    val b = Kmeans.fitCentroids(emb.repartition(7), "vec_id", "embedding",
      k = 4, iters = 2).orderBy("cid", "pos").collect().toSeq
    assert(a == b)
  }
}
