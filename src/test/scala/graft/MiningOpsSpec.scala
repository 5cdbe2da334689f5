package graft

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Graph, Sampling, Sketches}

/** Round-4 mining operators, each checked against an independent serial
  * Scala replay (triangles: brute-force enumeration; funnel: greedy
  * chain walk; KMV set ops: exact small-set identity; priority
  * sampling: the τ estimation-weight invariants from the paper).
  */
class MiningOpsSpec extends SparkSpec {

  // ---- triangle counting -------------------------------------------------

  /** Brute force: count triangles per node by enumerating all triples. */
  private def serialTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct
    val counts = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.sorted.combinations(3)
      if und((a, b)) && und((a, c)) && und((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    nodes.map(n => n -> counts(n)).toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4 plus a pendant node") {
    // K4 = 4 triangles, every K4 node in 3; node 5 hangs off node 4.
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val got = runTriangles(k4 :+ (4L, 5L))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangleCounts matches brute force on a hashed random graph") {
    // Deterministic pseudo-random sparse graph on 24 nodes.
    val edges = for {
      a <- 0L until 24L; b <- 0L until 24L
      if a < b && (a * 31 + b * 17) % 5 == 0
    } yield (a, b)
    assert(runTriangles(edges) == serialTriangles(edges))
  }

  test("triangleCounts: direction and duplicate edges are immaterial") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ base.map(_.swap) ++ base // dups + reversed
    assert(runTriangles(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- windowed funnel ---------------------------------------------------

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("windowFunnel: chain completes only inside the window") {
    import spark.implicits._
    // user 1: view@0, click@100, purchase@200  -> depth 3 (window 300)
    // user 2: view@0, click@400 (outside 300)  -> depth 1
    // user 3: view@0, click@100, purchase@350  -> depth 2
    // user 4: click@50 only                    -> absent (never stage 1)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(100), "click"), (1L, ts(200), "purchase"),
      (2L, ts(0), "view"), (2L, ts(400), "click"),
      (3L, ts(0), "view"), (3L, ts(100), "click"), (3L, ts(350), "purchase"),
      (4L, ts(50), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.windowFunnel(ev, "user_id", "ts", 300L, Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .select("user_id", "depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("windowFunnel: anchor is the FIRST stage-1 event") {
    import spark.implicits._
    // Second view@500 would allow the click@700 chain, but the anchor
    // stays at the first view@0 — click@700 is outside 0+300.
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(500), "view"), (1L, ts(700), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.windowFunnel(ev, "user_id", "ts", 300L, Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click")))
      .select("user_id", "depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("windowFunnel with a huge window equals the plain funnel") {
    val ev = graft.sources.Tables.load(spark, sf0001, "events")
    val stages = Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    val plain = Funnel.funnel(ev, "user_id", "ts", stages)
      .collect().map(_.toSeq).toSet
    val windowed = Funnel
      .windowFunnel(ev, "user_id", "ts", 10L * 365 * 86400, stages)
      .drop("depth").collect().map(_.toSeq).toSet
    assert(plain == windowed)
  }

  // ---- KMV set operations ------------------------------------------------

  test("kmvSetOps is exact when the union fits inside k") {
    import spark.implicits._
    val a = (1 to 30).toDF("id")   // |A|=30
    val b = (21 to 40).toDF("id")  // |B|=20, |A∩B|=10, |A∪B|=40
    val r = Sketches.kmvSetOps(a, "id", b, "id", k = 64).collect().head
    assert(r.getAs[Double]("union_est") == 40.0)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("intersect_est") - 10.0) < 1e-9)
  }

  test("kmvSetOps estimates are near-exact at k close to |A∪B|") {
    import spark.implicits._
    val a = (1 to 300).toDF("id")
    val b = (201 to 500).toDF("id") // union 500, intersection 100
    val r = Sketches.kmvSetOps(a, "id", b, "id", k = 256).collect().head
    val u = r.getAs[Double]("union_est")
    val i = r.getAs[Double]("intersect_est")
    assert(u > 350 && u < 700, s"union_est=$u")
    assert(i > 40 && i < 200, s"intersect_est=$i")
  }

  test("kmvSetOps: disjoint sets give zero intersection") {
    import spark.implicits._
    val a = (1 to 100).toDF("id")
    val b = (1001 to 1100).toDF("id")
    val r = Sketches.kmvSetOps(a, "id", b, "id", k = 32).collect().head
    assert(r.getAs[Double]("jaccard_est") == 0.0)
    assert(r.getAs[Double]("intersect_est") == 0.0)
  }

  // ---- HLL union ---------------------------------------------------------

  test("hllUnion: merged estimate equals the single-sketch estimate " +
      "of the union, and disjoint sides roughly add") {
    import spark.implicits._
    val a = (1 to 1000).toDF("id")
    val b = (801 to 1800).toDF("id") // union = 1..1800
    val u = graft.operators.Sketches.hllUnion(a, "id", b, "id", m = 64)
      .collect().head
    val direct = graft.operators.Sketches
      .hllDistinct((1 to 1800).toDF("id"), "id", m = 64)
      .collect().head.getAs[Double]("hll_est")
    // register-wise max IS the union sketch: merged estimate must equal
    // the estimate of sketching the union directly — exactly.
    assert(u.getAs[Double]("union_est") == direct)
    // per-side estimates in a plausible band (~13% rel error at m=64)
    assert(math.abs(u.getAs[Double]("est_a") - 1000) < 400)
    assert(math.abs(u.getAs[Double]("est_b") - 1000) < 400)
  }

  // ---- bigram surprisal --------------------------------------------------

  test("bigramSurprisal: repeated-pair documents score lower than " +
      "unique-pair ones; n_bigrams = tokens - 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b a b a b a b"),  // one dominant bigram pattern
      (2L, "a c b d a e b f a g b h"),  // every pair rare
      (3L, "solo")                       // < 2 tokens: drops out
    ).toDF("doc_id", "text")
    val got = graft.operators.LmScore
      .bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_bits"))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 11L && got(2L)._1 == 11L)
    assert(got(1L)._2 < got(2L)._2)
  }

  // ---- priority sampling -------------------------------------------------

  test("prioritySample: k rows, τ-floored weights, deterministic") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i % 17 + 1)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 20, seed = "s1")
      .collect()
    assert(got.length == 20)
    // est_weight_fp = max(w·2^26, τ) ≥ w·2^26 on every kept row
    got.foreach { r =>
      assert(r.getAs[Long]("est_weight_fp") >=
        r.getAs[Long]("w") * 67108864L)
    }
    // τ is shared: every row whose priority exceeds its own weight's
    // fixed point reports exactly τ — so the distinct est values that
    // are NOT w·2^26 collapse to one (τ itself).
    val taus = got.map(r => r.getAs[Long]("est_weight_fp"))
      .filter(v => !got.exists(r => r.getAs[Long]("w") * 67108864L == v))
    assert(taus.distinct.length <= 1)
    // deterministic across runs
    val again = Sampling.prioritySample(df, "id", "w", k = 20, seed = "s1")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == got.map(_.getAs[Long]("id")).toSet)
  }

  test("prioritySample returns everything when the table has ≤ k rows") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, 10L)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 10, seed = "s")
      .collect()
    assert(got.length == 5)
    // no τ → estimation weight degenerates to the exact weight
    got.foreach(r => assert(r.getAs[Long]("est_weight_fp") ==
      10L * 67108864L))
  }

  test("prioritySamplePerGroup: independent per-group samples with " +
      "per-group τ floors") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (s"g${i % 3}", i, i % 11 + 1))
      .toDF("g", "id", "w")
    val got = Sampling
      .prioritySamplePerGroup(df, Seq("g"), "id", "w", k = 10, seed = "s")
      .collect()
    assert(got.length == 30)
    assert(got.groupBy(_.getAs[String]("g")).forall(_._2.length == 10))
    // per-group: the kept set equals the serial top-10 by (q desc, id)
    val all = Sampling.prioritySamplePerGroup(df, Seq("g"), "id", "w",
      k = 1000, seed = "s").collect() // k > group size: everything kept
    assert(all.length == 300)
    val serial = all.groupBy(_.getAs[String]("g")).toSeq.flatMap {
      case (_, rs) =>
        rs.sortBy(r => (-r.getAs[Long]("priority_fp"), r.getAs[Long]("id")))
          .take(10).map(r => r.getAs[Long]("id")).toSeq
    }.toSet
    assert(got.map(_.getAs[Long]("id")).toSet == serial)
  }

  // ---- lateness audit ----------------------------------------------------

  test("latenessAudit matches a serial running-max replay across " +
      "bucket boundaries") {
    import spark.implicits._
    // Arrival seq 0..199 with event times jittered backwards — spans
    // many 16-wide arrival buckets so carry-in paths are exercised.
    val rows = (0L until 200L).map { i =>
      (i, ((i * 60) - (i * 37 % 11) * 25) * 1000000L) // micros
    }
    val df = rows.toDF("seq", "us")
      .select(col("seq"), expr("timestamp_micros(us)").as("ts"))
    val got = graft.operators.Watermarks
      .latenessAudit(df, "seq", "ts", bucketWidthUs = 10000000L,
        arrivalBucket = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // serial replay
    var mx = Long.MinValue
    val lat = rows.sortBy(_._1).map { case (_, us) =>
      mx = math.max(mx, us); mx - us
    }
    val want = lat.groupBy(_ / 10000000L).map { case (b, xs) =>
      (b, xs.size.toLong, xs.max)
    }.toSeq.sorted
    assert(got.toSeq.sorted == want)
  }

  test("prioritySample favors heavy rows") {
    import spark.implicits._
    // 100 rows of weight 1, 10 rows of weight 1000
    val df = ((1L to 100L).map(i => (i, 1L)) ++
      (101L to 110L).map(i => (i, 1000L))).toDF("id", "w")
    val kept = Sampling.prioritySample(df, "id", "w", k = 15, seed = "s2")
      .collect().map(_.getAs[Long]("id")).toSet
    // all heavy rows should dominate the sample
    assert((101L to 110L).count(kept) >= 8)
  }
}
