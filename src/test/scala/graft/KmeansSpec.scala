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

  test("fitCentroids: deterministic across runs and partitionings") {
    val a = Kmeans.fitCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("cid", "pos").collect().toSeq
    val b = Kmeans.fitCentroids(emb.repartition(7), "vec_id", "embedding",
      k = 4, iters = 2).orderBy("cid", "pos").collect().toSeq
    assert(a == b)
  }
}
