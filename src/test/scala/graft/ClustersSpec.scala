package graft

import graft.operators.Clusters
import graft.sources.Tables

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, star, and disjoint pairs all label to min id") {
    // chain 1-2-3-4, star 10-(11,12,13), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: distributed loop (localEdgeLimit=0) gives same labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, localEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: non-integral ids fall back to the distributed loop") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("dedup clusters: every cluster has exactly one keeper") {
    val docs = Tables.load(spark, sf0001, "documents")
    val out = Clusters.dedupClusters(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    val perCluster = out.groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("is_keeper").cast("int")).as("keepers"))
      .collect()
    assert(perCluster.forall(_.getLong(1) == 1L))
  }

  test("clustersOver: unioned detector pair streams bridge into one cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val universe = (1L to 6L).toDF("doc_id")
    val textPairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val embPairs = Seq((2L, 3L)).toDF("id_a", "id_b") // bridges 1-2 to 3
    val got = Clusters.clustersOver(universe, "doc_id",
        textPairs.union(embPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), // merged across detectors
      (4L, 4L, true), (5L, 4L, false),
      (6L, 6L, true)))                                  // untouched singleton
  }

  test("keepBestPerCluster: argmax quality wins, min id on ties, singletons keep") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val universe = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7),
      (5L, 0.9), (6L, 0.9)).toDF("id", "quality")
    // cluster {1,2,3}: 2 has max quality; cluster {5,6}: tie 0.9 -> min id 5
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Clusters.keepBestPerCluster(universe, "id", pairs, col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true),                  // singleton keeps itself
      (5L, 5L, true), (6L, 5L, false)))
  }
}
