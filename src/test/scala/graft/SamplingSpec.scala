package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpec {

  test("capPerGroup: at most k per group, deterministic, a subset") {
    val docs = Tables.load(spark, sf0001, "documents")
    val capped = Sampling.capPerGroup(docs, Seq("lang"), "doc_id", k = 10)
    val got = capped.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // at most k per group; groups smaller than k keep everything
    val perLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    val fullSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(10L, fullSizes(lang)), s"lang=$lang") }
    // every selected id really is in the corpus (subset, no duplication)
    assert(got.map(_._1).distinct.length == got.length)

    // deterministic: same selection on rerun and under different
    // partitioning
    val again = Sampling.capPerGroup(docs.repartition(7), Seq("lang"),
      "doc_id", k = 10).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)

    // selection rule: exactly the k smallest (hash, id) per group
    val expected = docs.withColumn("__h", xxhash64(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("__h"), col("doc_id"))))
      .where(col("rn") <= 10).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)

    // md5 variant selects by the oracle-reproducible hash
    val md5Sel = Sampling.capPerGroup(docs, Seq("lang"), "doc_id", 10,
      hashFn = TextOps.md5Hash60).count()
    assert(md5Sel == got.length)
  }
}
