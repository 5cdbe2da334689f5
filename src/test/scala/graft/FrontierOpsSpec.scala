package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Skyline}

/** Round-4 frontier operators: skyline correctness vs the quadratic
  * definition, bucket-width invariance, LPA community semantics, and
  * personalized-PageRank seed locality.
  */
class FrontierOpsSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random points (LCG) — no Math.random in tests.
  private val pts: Seq[(Long, Long, Long)] = {
    var s = 12345L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 40) % 1000 }
    (1L to 200L).map(i => (i, next(), next()))
  }

  private def bruteFrontier(ps: Seq[(Long, Long, Long)]): Set[Long] =
    ps.filter { case (_, c, g) =>
      !ps.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.map(_._1).toSet

  test("skyline matches the quadratic NOT-EXISTS definition") {
    val df = pts.toDF("id", "cost", "gain")
    val got = Skyline.frontier2d(df, "cost", "gain", bucketWidth = 100L)
      .where(col("is_frontier")).select("id").as[Long].collect().toSet
    assert(got == bruteFrontier(pts))
  }

  test("skyline is bucket-width invariant") {
    val df = pts.toDF("id", "cost", "gain")
    val widths = Seq(1L, 7L, 100L, 1000000L)
    val results = widths.map { w =>
      Skyline.frontier2d(df, "cost", "gain", w)
        .where(col("is_frontier")).select("id").as[Long].collect().toSet
    }
    assert(results.distinct.size == 1)
  }

  test("skyline keeps exact duplicates of a frontier point") {
    val df = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 20L, 4L))
      .toDF("id", "cost", "gain")
    val got = Skyline.frontier2d(df, "cost", "gain", 10L)
      .where(col("is_frontier")).select("id").as[Long].collect().toSet
    // duplicates don't dominate each other; (20,4) is dominated by (10,5)
    assert(got == Set(1L, 2L))
  }

  test("label propagation separates two bridged triangles") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).map(labels).distinct == Seq(1L))
    assert(Seq(4L, 5L, 6L).map(labels).distinct == Seq(4L))
  }

  test("personalized PageRank: mass stays near the seed side") {
    // Two disconnected 2-cycles; seed only in the first.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("s")
    val ranks = Graph.personalizedPageRankInt(edges, "src", "dst",
        seeds, "s", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks(1L) > 0 && ranks(2L) > 0)
    // the unseeded component receives zero teleport and zero inflow
    assert(ranks(3L) == 0L && ranks(4L) == 0L)
    // nearly all walk mass stays in the seeded component (damping only)
    assert(ranks(1L) + ranks(2L) > 900000000000L)
  }

  test("personalized PageRank is identical with and without lineage cuts") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("s")
    def run(cut: Boolean) =
      Graph.personalizedPageRankInt(edges, "src", "dst", seeds, "s",
        iterations = 2, truncateLineage = cut)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(true) == run(false))
  }
}
