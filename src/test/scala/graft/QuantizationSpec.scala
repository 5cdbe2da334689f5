package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** int8 quantization: codes match the scalar definition exactly, the
  * integer dot is exact, and ranking is well-formed.
  */
class QuantizationSpec extends SparkSpec {

  private def quantize(v: Array[Float]): Array[Long] = {
    val mx = v.map(x => math.abs(x.toDouble)).max
    val scale = mx / 127.0
    if (scale == 0) v.map(_ => 0L)
    else v.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
  }

  test("int8TopK ranks by the exact integer dot of the scalar-defined codes") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = Similarity.int8TopK(e, e.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 4).collect()

    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.keySet == Set(0L, 1L, 2L))
    perQuery.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 4))
      // qdot non-increasing with rank, and each qdot equals the scalar
      // recomputation — codes in [-127, 127].
      sorted.sliding(2).foreach(p =>
        assert(p(0).getLong(2) >= p(1).getLong(2)))
      sorted.foreach { r =>
        val expect = quantize(vecs(qid)).zip(quantize(vecs(r.getLong(1))))
          .map { case (a, b) => a * b }.sum
        assert(r.getLong(2) == expect, s"q=$qid n=${r.getLong(1)}")
        quantize(vecs(r.getLong(1))).foreach(c => assert(math.abs(c) <= 127))
      }
    }
  }

  test("centroids: within fixed-point quantum of the naive mean, partition-invariant") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.centroids(e, "label", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val naive = e.collect()
      .map(r => r.getInt(2) -> r.getSeq[Float](1).toArray)
      .groupBy(_._1).map { case (lbl, vs) =>
        val arrs = vs.map(_._2)
        lbl -> arrs.head.indices.map(i =>
          arrs.map(_(i).toDouble).sum / arrs.length).toArray
      }
    naive.foreach { case (lbl, mean) =>
      mean.zipWithIndex.foreach { case (m, i) =>
        val c = got((lbl, i + 1L))
        assert(math.abs(c - m) < 1.0 / (1 << 20) + 1e-6, s"label=$lbl pos=$i")
      }
    }
    val got13 = Similarity.centroids(e.repartition(13), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == got13)
  }

  test("zero vector quantizes to all-zero codes (no NaN)") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 2f, -3f)))
      .toDF("vec_id", "embedding")
    val (codes, _) = Similarity.quantizeInt8(col("embedding"))
    val got = df.select(col("vec_id"), codes.as("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(got(1L) == Seq(0f, 0f, 0f))
    assert(got(2L) == Seq(42f, 85f, -127f))
  }
}
