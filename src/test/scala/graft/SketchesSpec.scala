package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

/** Sketch correctness: estimates land inside their theoretical error
  * envelopes, degenerate regimes are exact, and Count-Min keeps its
  * one-sided (never-underestimate) guarantee.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.load(spark, sf0001, "lineitem")

  test("KMV: estimate within expected relative error of exact") {
    val r = Sketches.kmvDistinct(li, "l_orderkey", k = 64).head()
    val (exact, est) = (r.getLong(1), r.getDouble(2))
    // KMV σ ≈ 1/√(k-2) ≈ 12.7%; 4σ envelope keeps the spec stable
    // while still catching broken math (off by 2× etc.).
    assert(math.abs(est - exact) / exact < 0.51, s"exact=$exact est=$est")
  }

  test("KMV: fewer distinct keys than k is exact") {
    val small = (1 to 10).flatMap(i => Seq(i, i)).toDF("key")
    val r = Sketches.kmvDistinct(small, "key", k = 64).head()
    assert(r.getLong(1) == 10 && r.getDouble(2) == 10.0)
  }

  test("HLL: estimate within expected relative error; registers deterministic") {
    val r = Sketches.hllDistinct(li, "l_orderkey", m = 64).head()
    val (exact, est) = (r.getLong(1), r.getDouble(2))
    assert(exact > 2.5 * 64, "fixture must be in the raw-estimator regime")
    // HLL σ ≈ 1.04/√64 = 13%; 4σ envelope.
    assert(math.abs(est - exact) / exact < 0.52, s"exact=$exact est=$est")
    val r2 = Sketches.hllDistinct(li, "l_orderkey", m = 64).head()
    assert(r.getDouble(2) == r2.getDouble(2))
  }

  test("Count-Min: never underestimates, and is near-exact at low collision load") {
    val sketch = Sketches.cmsSketch(li, "l_suppkey", depth = 4, width = 256)
    val keys = li.select("l_suppkey").distinct()
    val est = Sketches.cmsEstimate(sketch, keys, "l_suppkey", depth = 4, width = 256)
    val exact = li.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    val joined = est.join(exact, "l_suppkey")
      .select(col("cms_est"), col("n")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getLong(0) >= r.getLong(1), s"CMS underestimated: $r"))
    // Distinct suppliers ≪ width: most cells are collision-free, so the
    // majority of estimates must be exactly the true count.
    val exactHits = joined.count(r => r.getLong(0) == r.getLong(1))
    assert(exactHits * 2 > joined.length,
      s"only $exactHits/${joined.length} exact")
  }

  test("histogram quantiles: within one bin width of the exact quantile") {
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val est = graft.operators.Sketches
      .histogramQuantiles(li, "l_extendedprice", bins = 256, qs = qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val Array(mn, mx) = li.agg(min("l_extendedprice"), max("l_extendedprice"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val binW = (mx - mn) / 256.0
    val exact = li.stat.approxQuantile("l_extendedprice", qs.toArray, 0.0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= binW + 1e-9,
        s"q=$q est=${est(q)} exact=$ex binW=$binW")
    }
    // partition invariance
    val est13 = graft.operators.Sketches
      .histogramQuantiles(li.repartition(13), "l_extendedprice", bins = 256, qs = qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(est == est13)
  }

  test("sketches are partition-invariant (mergeability in practice)") {
    // A sketch built from 13 partitions must equal the 1-partition build:
    // min/max/sum merges are associative-commutative, which is exactly
    // what lets the 1000-executor build produce the same answer.
    val shuffled = li.repartition(13)
    assert(Sketches.kmvDistinct(li, "l_orderkey", 64).head().getDouble(2) ==
      Sketches.kmvDistinct(shuffled, "l_orderkey", 64).head().getDouble(2))
    assert(Sketches.hllDistinct(li, "l_orderkey", 64).head().getDouble(2) ==
      Sketches.hllDistinct(shuffled, "l_orderkey", 64).head().getDouble(2))
    val a = Sketches.cmsSketch(li, "l_suppkey").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Sketches.cmsSketch(shuffled, "l_suppkey").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("sketches are one row and carry their parameters") {
    val kmv = Sketches.kmvDistinct(li.limit(500), "l_orderkey", k = 16)
    assert(kmv.columns.toSeq == Seq("k", "n_exact", "kmv_est"))
    assert(kmv.count() == 1)
    val hll = Sketches.hllDistinct(li.limit(5000), "l_orderkey", m = 32)
    assert(hll.columns.toSeq == Seq("m", "n_exact", "hll_est"))
    assert(hll.head().getInt(0) == 32)
  }

  test("CMS join cardinality: never under-counts, exact when collision-free") {
    import spark.implicits._
    // a: key k repeated k times (k=1..8); b: each key once + misses
    val a = (1 to 8).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = ((1 to 8) ++ Seq(100, 101)).map(_.toLong).toDF("k")
    val truth = (1 to 8).map(_.toLong).sum // Σ k·1 = 36
    // wide sketch: 10 distinct keys over 4×1024 cells -> collisions
    // are overwhelmingly unlikely; est should be exact
    val est = Sketches.cmsJoinCardinality(a, "k", b, "k",
      depth = 4, width = 1024).head().getLong(0)
    assert(est == truth, s"est $est != $truth")
    // narrow sketch: collisions allowed, but never an under-count
    val estNarrow = Sketches.cmsJoinCardinality(a, "k", b, "k",
      depth = 2, width = 4).head().getLong(0)
    assert(estNarrow >= truth)
    // fixture-scale sanity: lineitem ⋈ orders
    val o = Tables.load(spark, sf0001, "orders")
    val est2 = Sketches.cmsJoinCardinality(li, "l_orderkey",
      o, "o_orderkey").head().getLong(0)
    val true2 = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(est2 >= true2)
  }
}
