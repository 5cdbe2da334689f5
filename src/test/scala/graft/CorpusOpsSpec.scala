package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Gapfill, Graph, Multimodal, Quality, Sampling}
import graft.sources.Tables

/** Round-4 corpus batch: Gopher rule-bundle filter, vocabulary coverage,
  * epoch-mix planning, dHash, PCM voice-activity segments, 2-hop reach,
  * and the stateful running-total stream≡batch equivalence.
  */
class CorpusOpsSpec extends SparkSpec {
  import org.apache.spark.sql.Dataset

  private def docs = Tables.load(spark, sf0001, "documents")

  private def media(corpus: Dataset[Multimodal.MediaFile]) = {
    import spark.implicits._
    Multimodal.shapeForDecode(corpus.toDF(), 4).as[Multimodal.MediaFile]
  }

  test("gopherFilter: keep bit matches reject_reason; evidence is consistent") {
    val out = Quality.gopherFilter(docs, "doc_id", "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val reason = r.getAs[String]("reject_reason")
      assert(r.getAs[Boolean]("keep") == reason.isEmpty)
      val n = r.getAs[Long]("n_tokens")
      // The first-match rule order is part of the contract.
      if (n < 20) assert(reason == "too_short")
      else if (n > 80) assert(reason == "too_long")
      assert(r.getAs[Long]("ttr_micro") <= 1000000L)
    }
    // The fixture must exercise both branches or the filter proves nothing.
    assert(out.exists(_.getAs[Boolean]("keep")))
    assert(out.exists(!_.getAs[Boolean]("keep")))
  }

  test("epochMix: cap binds, taken tokens are consistent, plan is per-source pure") {
    val out = Sampling.epochMix(docs, "source",
      TextOps.tokenCount(col("text")).cast("long"), budget = 20000L).collect()
    assert(out.length == docs.select("source").distinct().count())
    out.foreach { r =>
      val e = r.getAs[Long]("epochs_micro")
      assert(e >= 0 && e <= 4000000L)
      assert(r.getAs[Long]("tokens_taken") ==
        e * r.getAs[Long]("n_tokens") / 1000000L)
    }
  }

  test("dhash: partition-invariant, dims match the generator, differs from ahash") {
    import spark.implicits._
    val corpus = Multimodal.demoPixelCorpus(spark, docs)
    val one = Multimodal.dhash(spark, media(corpus)).collect()
      .map(h => h.media_id -> h).toMap
    val other = Multimodal.dhash(spark,
        media(corpus.repartition(7))).collect()
      .map(h => h.media_id -> h).toMap
    assert(one == other) // exact integers ⇒ bit-identical under any layout
    one.values.foreach { h =>
      assert(h.width == 8 + h.media_id % 9 && h.height == 8 + h.media_id % 7)
    }
    // Gradient bits are a different signal than brightness bits.
    val ah = Multimodal.ahash(spark, media(corpus)).collect()
      .map(h => h.media_id -> (h.hash_hi, h.hash_lo)).toMap
    assert(one.exists { case (id, h) => (h.hash_hi, h.hash_lo) != ah(id) })
  }

  test("vadSegments: segments are disjoint, in-range, and energy-consistent") {
    import spark.implicits._
    val corpus = Multimodal.demoAudioCorpus(spark, docs)
    val segs = Multimodal.vadSegments(spark, media(corpus)).collect()
      .groupBy(_.media_id)
    assert(segs.nonEmpty)
    segs.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.seg_idx)
      assert(sorted.map(_.seg_idx).toSeq == sorted.indices.toSeq)
      val nf = (500 + id % 300).toInt / 64
      sorted.foreach { s =>
        assert(s.start_frame >= 0 && s.end_frame < nf)
        assert(s.n_frames == s.end_frame - s.start_frame + 1)
        assert(s.seg_energy > 0)
      }
      // Maximal runs: consecutive segments never touch.
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.start_frame > a.end_frame + 1)
        case _ =>
      }
    }
  }

  test("twoHopReach: exact distance-2 counts on a known graph") {
    import spark.implicits._
    // Path 1-2-3-4 plus spur 2-5.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))
      .toDF("src", "dst")
    val got = Graph.twoHopReach(edges, "src", "dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("keyframe fingerprints: one row per sync sample, equal bytes ⇒ equal fp") {
    import spark.implicits._
    val corpus = Multimodal.demoVideoCorpus(spark, docs)
    val fps = Multimodal.keyframeFingerprints(spark, media(corpus)).collect()
    val byId = fps.groupBy(_.media_id)
    byId.foreach { case (id, ks) =>
      assert(ks.length == ((4 + id % 5 + 1) / 2).toInt) // sync = every other sample
      assert(ks.forall(k => k.sample_idx % 2 == 0))
    }
    // The generator makes byte content a function of ((id*131+s*17)%256, size):
    // same class ⇒ identical bytes ⇒ identical fp.
    val classes = fps.groupBy(k =>
      (((k.media_id * 131 + k.sample_idx * 17) % 256), k.n_bytes))
    classes.values.foreach(ks => assert(ks.map(_.fp).distinct.length == 1))
  }

  test("bloom-pruned join is hash-identical to the plain join") {
    import graft.operators.Bloom
    val dims = Tables.load(spark, sf0001, "part")
      .where(col("p_size") === 1).select(col("p_partkey"))
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_quantity")
    val bloom = Bloom.build(dims, "p_partkey")
    val maybe = Bloom.probe(li.select("l_partkey"), "l_partkey", bloom)
      .where(col("maybe_seen")).select("l_partkey")
    val pruned = li.join(broadcast(maybe), Seq("l_partkey"), "left_semi")
      .join(broadcast(dims), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    val plain = li.join(dims, col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    assert(pruned.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("kCore: peeling drops leaves, keeps the clique") {
    import spark.implicits._
    // Triangle+tail: 1-2-3 clique (deg 2 each) with pendant 3-4.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.kCore(edges, "src", "dst", k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Node 4 (deg 1) peels in sweep 1; the triangle survives at deg 2.
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("asofNearest: closest match either direction, earlier wins ties, tolerance nulls") {
    import spark.implicits._
    import graft.operators.TemporalJoins
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val left = Seq((1L, ts(100), 10L), (1L, ts(500), 11L), (1L, ts(5000), 12L))
      .toDF("k", "lt", "lid")
    // rights at 90 (10 before click 100) and 110 (10 after): tie → earlier.
    val right = Seq((1L, ts(90), 20L), (1L, ts(110), 21L), (1L, ts(460), 22L))
      .toDF("k", "rt", "rid")
    val got = TemporalJoins.asofNearest(left, right, Seq("k"), "lt", "rt",
        tolerance = expr("INTERVAL 60 SECONDS"), rightTie = Some("rid"))
      .select("lid", "rid").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(
      10L -> 20L, // |100-90| == |110-100| → earlier (90) wins
      11L -> 22L, // 460 is closer than 110 (and within tolerance)
      12L -> -1L)) // nothing within 60s of 5000
  }

  test("windowed uniques: dedup-then-count behind readStream equals batch on closed windows") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val sp = graft.streaming.StreamingPipeline
    val events = Tables.load(spark, sf0001, "events")
    val maxTsUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    // Append emits a window only once it CLOSES against the watermark
    // (end <= max event time - delay); the final open day stays in state.
    val dayUs = 86400L * 1000000; val delayUs = 3600L * 1000000
    val closed = sp.windowedUniques(events, "ts", "user_id")
      .where(unix_micros(col("window_start")) + dayUs <= maxTsUs - delayUs)
      .collect().map(_.toSeq).toSet
    val streamed = sp.windowedUniques(
      sp.streamTable(spark, sf0001, "events").withWatermark("ts", "1 hour"),
      "ts", "user_id")
    val q = streamed.writeStream.format("memory").queryName("uniq_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("uniq_out").collect().map(_.toSeq).toSet
    assert(got == closed)
    assert(closed.nonEmpty)
  }

  test("token offsets: spans index back into the normalized text") {
    import graft.functions.TextOps
    val norm = docs.select(col("doc_id"),
      TextOps.normalizeText(col("text")).as("norm"))
    val ex = norm.select(col("doc_id"), col("norm"),
      posexplode(split(col("norm"), " ")).as(Seq("token_idx", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("token_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rows = ex.withColumn("start",
        coalesce(sum(length(col("token"))).over(w), lit(0)) + col("token_idx"))
      .select(col("norm"), col("token"), col("start")).collect()
    rows.foreach { r =>
      val (nrm, tok, st) = (r.getString(0), r.getString(1), r.getAs[Number](2).intValue)
      assert(nrm.substring(st, st + tok.length) == tok) // the span IS the token
    }
  }

  test("basket triples: the Apriori prune equals naive enumeration") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val a = li.select(col("ok"), col("pk").as("p1"))
    val b = li.select(col("ok"), col("pk").as("p2"))
    val c = li.select(col("ok"), col("pk").as("p3"))
    val naive = a.join(b, Seq("ok")).join(c, Seq("ok"))
      .where(col("p1") < col("p2") && col("p2") < col("p3"))
      .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .collect().map(_.toSeq).toSet
    val pruned = graft.queries.CorpusQueries
      .queries("basket_triples")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(pruned == naive && naive.nonEmpty)
  }

  test("hourlyLinear: interpolates the straight line, ffills the tail") {
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000)
    // Observations at hours 0 (v=100) and 3 (v=400); hour 5 trailing obs 0.
    val ev = Seq(("a", ts(0), 1L, 100L), ("a", ts(3), 2L, 400L),
        ("b", ts(0), 3L, 50L))
      .toDF("g", "ts", "id", "cents")
    val got = Gapfill.hourlyLinear(ev, "g", "ts", "id", col("cents"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2))).toSet
    assert(got == Set(("a", 0L, 100L), ("a", 1L, 200L), ("a", 2L, 300L),
      ("a", 3L, 400L), ("b", 0L, 50L)))
  }

  test("plan shapes: bloom prune broadcasts, gopher filter never shuffles") {
    def plan(name: String) = graft.queries.CorpusQueries
      .queries(name)(spark, sf001).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val bloom = plan("join_bloom_pruned")
    assert(bloom.contains("BroadcastHashJoin"),
      "bloom-pruned join must broadcast the filter/dim sides")
    // The Gopher filter is a pure narrow projection: any Exchange means
    // a refactor broke the no-shuffle contract (the final orderBy is
    // display-only and excluded by planning just the filter).
    val gopher = graft.operators.Quality
      .gopherFilter(Tables.load(spark, sf001, "documents"), "doc_id", "text")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!gopher.contains("Exchange"), "gopherFilter must stay shuffle-free")
  }

  test("streaming CDC apply over multiple batches equals one-shot applyCdc") {
    import java.nio.file.Files
    val sp = graft.streaming.StreamingPipeline
    val shaped = Tables.load(spark, sf0001, "events").select(
      col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
      col("event_type"), col("value"),
      (col("event_type") === "error").as("is_delete"))
    val oneShot = graft.operators.Merge
      .applyCdc(shaped, Seq("user_id"), Seq("ts_us", "event_id"), "is_delete")
      .collect().map(_.toSeq).toSet

    // 4 source files + maxFilesPerTrigger=1 → 4 micro-batches in
    // ARBITRARY event-time order; the apply must still converge.
    val src = Files.createTempDirectory("graft-cdc-src").toString
    shaped.repartition(4).write.mode("overwrite").parquet(src)
    val tgt = Files.createTempDirectory("graft-cdc-tgt").toString
    val chk = Files.createTempDirectory("graft-cdc-chk").toString
    val stream = spark.readStream.schema(shaped.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = sp.cdcApplyStreaming(stream, Seq("user_id"),
      Seq("ts_us", "event_id"), "is_delete", tgt, chk)
    q.awaitTermination()
    // Consumers read past the tombstones (delete winners stay physically
    // present so late older changes can never resurrect a deleted key).
    val got = sp.readCdcTarget(spark, tgt).get
      .where(!col("is_delete"))
      .select(shaped.columns.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
    assert(got == oneShot)
  }

  test("running totals: streaming state equals the batch window sum") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val events = Tables.load(spark, sf0001, "events")
      .select("user_id", "event_id", "ts", "value")
    val batch = graft.streaming.StreamingPipeline.runningTotalsBatch(events)
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.StreamingPipeline.runningTotalsStreaming(
      spark, graft.streaming.StreamingPipeline.streamTable(spark, sf0001, "events"))
    val q = streamed.writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("running_out")
      .select("user_id", "event_id", "ts_us", "cents", "running_cents")
      .collect().map(_.toSeq).toSet
    assert(got == batch)
  }
}
