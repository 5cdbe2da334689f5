package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Fixed-point PageRank: checked against an independent serial Scala
  * replay of the integer recurrence, and for partition-invariance (the
  * exactness claim that justifies integer arithmetic in the first place).
  */
class GraphSpec extends SparkSpec {

  /** Serial reference: same recurrence as Graph.pageRankInt, plain Scala. */
  private def serialPageRank(edges: Seq[(Long, Long)], iters: Int,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val base = ((dampDen - dampNum) * scale / dampDen) / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val share = r.flatMap { case (node, rv) =>
        outdeg.get(node).map(d => node -> rv / d) }
      val inflow = es.flatMap { case (s, d) => share.get(s).map(d -> _) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(node =>
        node -> (base + dampNum * inflow.getOrElse(node, 0L) / dampDen)).toMap
    }
    r
  }

  private val diamond: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
    (3L, 4L), (4L, 3L), (4L, 5L)) // 5 is dangling (no out-edges)

  test("pageRankInt matches the serial integer replay exactly") {
    import spark.implicits._
    val edges = diamond.toDF("src", "dst")
    val got = Graph.pageRankInt(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = serialPageRank(diamond, 3)
    assert(got == want)
    // hub node 3 (3 in-edges) outranks the dangling leaf 5 (1 in-edge)
    assert(got(3L) > got(5L))
  }

  test("pageRankInt is partition-invariant (bit-identical ranks)") {
    import spark.implicits._
    val e1 = diamond.toDF("src", "dst").repartition(1)
    val e7 = diamond.toDF("src", "dst").repartition(7)
    val r1 = Graph.pageRankInt(e1, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val r7 = Graph.pageRankInt(e7, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(r1 == r7)
  }

  /** Serial reference for hitsInt: same integer recurrence, plain Scala. */
  private def serialHits(edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000L): Map[String, (Long, Long)] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val aRaw = nodes.map(n =>
        n -> es.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val ma = aRaw.values.max
      auth = aRaw.map { case (n, v) => n -> v * scale / ma }
      val hRaw = nodes.map(n =>
        n -> es.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val mh = hRaw.values.max
      hub = hRaw.map { case (n, v) => n -> v * scale / mh }
    }
    nodes.map(n => n -> (auth(n), hub(n))).toMap
  }

  test("hitsInt matches the serial integer replay on a bipartite graph") {
    import spark.implicits._
    val es = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c3", "s1"),
      ("c3", "s3"))
    val got = Graph.hitsInt(es.toDF("src", "dst"), "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = serialHits(es, 2)
    assert(got == want)
    // s1 (3 in-edges from strong hubs) is the top authority; pure hubs
    // carry zero authority, pure authorities zero hubness
    assert(got("s1")._1 == 1000000L)
    assert(got("c1")._1 == 0L && got("s1")._2 == 0L)
  }

  test("hitsInt is partition-invariant") {
    import spark.implicits._
    val es = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c3", "s1"),
      ("c3", "s3"), ("c2", "s3"))
    def run(parts: Int) =
      Graph.hitsInt(es.toDF("src", "dst").repartition(parts),
          "src", "dst", iterations = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(7))
  }

  test("bfsDepth: min-hop from nearest seed, unreached nodes absent") {
    import spark.implicits._
    // chain 1->2->3->4->5, seed {1}; 6->7 disconnected
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsDepth(es.toDF("src", "dst"), "src", "dst",
        seeds, "node", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // two seeds: nearest wins
    val got2 = Graph.bfsDepth(es.toDF("src", "dst"), "src", "dst",
        Seq(1L, 4L).toDF("node"), "node", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
  }

  test("supplier co-purchase graph at sf0.001: all nodes ranked, ranks positive") {
    val li = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val edges = li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
      .where(col("src") =!= col("dst")).select("src", "dst")
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst"))).distinct().count()
    val ranks = Graph.pageRankInt(edges, "src", "dst", iterations = 2).collect()
    assert(ranks.length == nNodes)
    assert(ranks.forall(_.getLong(1) > 0L))
  }
}
