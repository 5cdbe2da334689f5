package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.StreamingPipeline

/** Structured-Streaming behavior: exactly-once incremental transfer via
  * checkpointed AvailableNow runs, and batch/stream equivalence of the
  * shared event-time transforms.
  */
class StreamingSpec extends SparkSpec {

  test("incremental transfer: second run with same checkpoint writes nothing") {
    val tgt = Files.createTempDirectory("graft-stream-tgt").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString

    val q1 = StreamingPipeline.incrementalTransfer(spark, sf0001, "events", tgt, chk)
    q1.awaitTermination()
    val afterFirst = spark.read.parquet(tgt).count()
    assert(afterFirst == Tables.load(spark, sf0001, "events").count())

    val q2 = StreamingPipeline.incrementalTransfer(spark, sf0001, "events", tgt, chk)
    q2.awaitTermination()
    val afterSecond = spark.read.parquet(tgt).count()
    assert(afterSecond == afterFirst) // checkpoint offsets: zero duplicates
  }

  test("directory-shaped parquet tables stream their part files (no silent zero-row run)") {
    val root = Files.createTempDirectory("graft-dirtab").toString
    Tables.load(spark, sf0001, "events").limit(100)
      .write.parquet(s"$root/evdir.parquet") // Spark's own dir layout
    val tgt = Files.createTempDirectory("graft-dirtab-tgt").toString
    val chk = Files.createTempDirectory("graft-dirtab-chk").toString
    StreamingPipeline.incrementalTransfer(spark, root, "evdir", tgt, chk)
      .awaitTermination()
    assert(spark.read.parquet(tgt).count() == 100)
  }

  test("streaming sessionization equals batch sessionization") {
    val events = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.sessionizeBatch(events, "user_id", "ts", lit(1800))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet

    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val streamed = StreamingPipeline.sessionizeStreaming(
      spark, StreamingPipeline.streamTable(spark, sf0001, "events"), 1800)
    val q = streamed.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sessions_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(got == batch)
  }

  test("streaming gap alerts equal the batch lag-window program") {
    val events = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.gapAlertsBatch(events, 3600L)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty) // fixture must actually exercise the alert path

    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val streamed = StreamingPipeline.gapAlertsStreaming(
      spark, StreamingPipeline.streamTable(spark, sf0001, "events"), 3600L)
    val q = streamed.writeStream.format("memory").queryName("gaps_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("gaps_out")
      .select("user_id", "ts_us", "prev_ts_us", "gap_s")
      .collect().map(_.toSeq).toSet
    assert(got == batch)
  }

  test("gap alerts: cross-batch chaining works; out-of-order batch fails loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

    // in-order multi-batch: the gap spans the batch boundary and is
    // measured against the STORED last-seen, not just within-batch
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val ev = in.toDF().toDF("user_id", "ts")
    val out = StreamingPipeline.gapAlertsStreaming(spark, ev, 3600L)
    val q = out.writeStream.format("memory").queryName("gap_mb")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(100)), (1L, ts(200)))
      q.processAllAvailable()
      in.addData((1L, ts(10000))) // 9800s gap vs batch-1 tail
      q.processAllAvailable()
      val got = spark.table("gap_mb")
        .select("user_id", "ts_us", "prev_ts_us", "gap_s")
        .collect().map(_.toSeq).toSet
      assert(got == Set(Seq(1L, 10000000000L, 200000000L, 9800L)))
    } finally q.stop()

    // out-of-order across batches: the documented contract violation
    // must FAIL the query with the enforcement message, never emit
    // silently-wrong gaps
    val in2 = MemoryStream[(Long, java.sql.Timestamp)]
    val ev2 = in2.toDF().toDF("user_id", "ts")
    val out2 = StreamingPipeline.gapAlertsStreaming(spark, ev2, 3600L)
    val q2 = out2.writeStream.format("memory").queryName("gap_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData((7L, ts(10000)))
      q2.processAllAvailable()
      in2.addData((7L, ts(100))) // older than stored last-seen
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        q2.awaitTermination(30000)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("out-of-order batch")),
        s"wrong failure: ${msgs(ex).mkString(" | ")}")
    } finally q2.stop()
  }

  test("watermarked tumbling agg: Append emits exactly the closed windows") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val events = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.tumblingAgg(events, "ts")

    val agg = StreamingPipeline.tumblingAggWatermarked(
      StreamingPipeline.streamTable(spark, sf0001, "events"), "ts",
      width = "1 day", delay = "1 hour")
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("wm_out").collect().map(_.toSeq).toSet

    // Append + watermark emits a window when the watermark (max event
    // time - delay) passes its END; windows still open at end-of-input
    // stay in state. The emitted set must be exactly the batch windows
    // that closed under the final watermark — deterministic on a finite
    // fixture.
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val wmMs = maxTs - 3600L * 1000
    val closed = batch.where(
      col("window_start").cast("long") * 1000 + 86400000L <= wmMs)
      .collect().map(_.toSeq).toSet
    assert(got == closed)
    assert(got.nonEmpty) // fixture spans > 1 day + delay, so some close
    // and not everything closes (the last window is always still open)
    assert(got.size < batch.count())
  }

  test("sliding agg: batch result and each event lands in width/slide windows") {
    val events = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.slidingAgg(events, "ts",
      width = "1 day", slide = "6 hours")
    // total weighted count = 4x the event count (every event in 4 windows)
    val total = batch.agg(sum("n_events")).head().getLong(0)
    assert(total == 4 * events.count())
    // streaming run behind readStream (Complete mode — no watermark here)
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val agg = StreamingPipeline.slidingAgg(
      StreamingPipeline.streamTable(spark, sf0001, "events"), "ts",
      width = "1 day", slide = "6 hours")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("slide_out").collect().map(_.toSeq).toSet ==
      batch.collect().map(_.toSeq).toSet)
  }

  test("windowed heavy hitters: streamed counts + rank equals one-shot batch") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val events = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.topKPerWindow(
      StreamingPipeline.windowedCounts(events, "ts", "user_id", "1 day"),
      "user_id", 5)
    // stateful half behind readStream, stateless rank on the sink table
    val counts = StreamingPipeline.windowedCounts(
      StreamingPipeline.streamTable(spark, sf0001, "events"),
      "ts", "user_id", "1 day")
    val q = counts.writeStream.format("memory").queryName("hitters_counts")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = StreamingPipeline.topKPerWindow(
      spark.table("hitters_counts"), "user_id", 5)
    assert(streamed.collect().map(_.toSeq).toSet ==
      batch.collect().map(_.toSeq).toSet)
    assert(batch.count() > 0)
  }

  test("stream-static enrich: streaming equals batch, dims broadcast") {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    def dims = Seq(
      Tables.load(spark, sf0001, "customer")
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        -> (col("user_id") === col("c_custkey")),
      Tables.load(spark, sf0001, "nation").select("n_nationkey", "n_name")
        -> (col("c_nationkey") === col("n_nationkey")))
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val batch = StreamingPipeline.enrich(ev, dims)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // plan uses broadcast joins, not shuffles
    val plan = StreamingPipeline.enrich(ev, dims)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val enriched = StreamingPipeline.enrich(
      StreamingPipeline.streamTable(spark, sf0001, "events")
        .select("event_id", "user_id", "event_type", "value"), dims)
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("enrich_out").collect().map(_.toSeq).toSet == batch)
  }

  test("stream-stream interval join: streaming equals batch attribution") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def split(ev: org.apache.spark.sql.DataFrame) = (
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts")),
      ev.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts")))
    val (bc, bv) = split(Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type"))
    val batch = StreamingPipeline.intervalJoin(bc, bv, "user_id", "v_user",
        "click_ts", "view_ts", 1800)
      .select("click_id", "view_id").collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // two independent stream readers (a self-join on one reader is
    // ambiguous), both watermarked — required for stream-stream joins
    val (sc, sv) = (
      split(StreamingPipeline.streamTable(spark, sf0001, "events")
        .select("event_id", "ts", "user_id", "event_type"))._1
        .withWatermark("click_ts", "1 hour"),
      split(StreamingPipeline.streamTable(spark, sf0001, "events")
        .select("event_id", "ts", "user_id", "event_type"))._2
        .withWatermark("view_ts", "1 hour"))
    val joined = StreamingPipeline.intervalJoin(sc, sv, "user_id", "v_user",
        "click_ts", "view_ts", 1800)
      .select("click_id", "view_id")
    val q = joined.writeStream.format("memory").queryName("ivj_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("ivj_out").collect().map(_.toSeq).toSet == batch)
  }

  test("stream-stream LEFT OUTER interval join: inner rows exact, " +
      "outer nulls only for proven-unmatched rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def split(ev: org.apache.spark.sql.DataFrame) = (
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts")),
      ev.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts")))
    val (bc, bv) = split(Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type"))
    val batch = StreamingPipeline.intervalJoinLeftOuter(bc, bv, "user_id",
        "v_user", "click_ts", "view_ts", 1800)
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    val batchInner = batch.filter(_._2 != -1L)
    val (sc, sv) = (
      split(StreamingPipeline.streamTable(spark, sf0001, "events")
        .select("event_id", "ts", "user_id", "event_type"))._1
        .withWatermark("click_ts", "1 hour"),
      split(StreamingPipeline.streamTable(spark, sf0001, "events")
        .select("event_id", "ts", "user_id", "event_type"))._2
        .withWatermark("view_ts", "1 hour"))
    val joined = StreamingPipeline.intervalJoinLeftOuter(sc, sv, "user_id",
        "v_user", "click_ts", "view_ts", 1800)
      .select("click_id", "view_id")
    val q = joined.writeStream.format("memory").queryName("ivjl_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ivjl_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // Every inner match must be emitted; null-extensions may lag the
    // final watermark (rows the watermark hasn't yet proven unmatched
    // are withheld, never fabricated) — so: inner ⊆ got ⊆ batch.
    assert(batchInner.subsetOf(got), "streaming lost inner matches")
    assert(got.subsetOf(batch), "streaming fabricated rows")
  }

  test("continuous sessionization: sessions emit once closed, survive batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds")
    val out = StreamingPipeline.sessionizeContinuous(spark, events, gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("cont_sessions")
      .outputMode(OutputMode.Append()).start()
    def emitted(): Set[Seq[Any]] = spark.table("cont_sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet

    try {
      // batch 1: one session's worth of events for user 1 + user 2
      in.addData((1L, ts(100)), (1L, ts(200)), (2L, ts(150)))
      q.processAllAvailable()
      assert(emitted().isEmpty) // watermark hasn't passed session end + gap

      // batch 2: a much later event — the OLD session is now closeable,
      // but the watermark only advances AFTER this batch, so emission
      // happens on the next trigger
      in.addData((1L, ts(5000)))
      q.processAllAvailable()

      // batch 3: watermark (5000s) now exceeds 200s+1800s — the first
      // session emits, split across three batches of state
      in.addData((1L, ts(10000)))
      q.processAllAvailable()
      assert(emitted().contains(Seq(1L, ts(100), ts(200), 2L)))
      assert(emitted().contains(Seq(2L, ts(150), ts(150), 1L))) // timeout fired
      assert(!emitted().exists(r => r(1) == ts(5000))) // 5000 still open

      // advance watermark past 5000+gap: that session closes too
      in.addData((1L, ts(20000)))
      q.processAllAvailable()
      in.addData((1L, ts(30000)))
      q.processAllAvailable()
      assert(emitted().contains(Seq(1L, ts(5000), ts(5000), 1L)))
      assert(emitted().contains(Seq(1L, ts(10000), ts(10000), 1L)))
      // the final tail (20000, 30000 are separate sessions; 30000 open)
      assert(!emitted().exists(r => r(1) == ts(30000)))
    } finally q.stop()
  }

  test("built-in session_window behind readStream matches the batch result") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ev = Tables.load(spark, sf0001, "events")
    val batch = StreamingPipeline.sessionWindowAgg(ev, "user_id", "ts")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // Append mode emits a session only once the watermark passes its
    // end, and sessions inside the final watermark delay stay in state
    // when the query stops. A far-future sentinel event (user -1) pushes
    // the end-of-input watermark past every REAL session; the sentinel's
    // own session stays un-emitted (its end is beyond the watermark), so
    // the emitted set is exactly the batch program's on the real events.
    val tmp = java.nio.file.Files.createTempDirectory("sesswin").toString
    ev.write.parquet(s"$tmp/events.parquet") // directory-shaped table
    ev.agg(max(col("ts")).as("ts")).select(
        lit(-1L).as("event_id"),
        expr("ts + INTERVAL 240 HOURS").as("ts"),
        lit(-1L).as("user_id"),
        lit("view").as("event_type"),
        lit(0.0d).as("value"),
        lit("{}").as("props"))
      .write.mode("append").parquet(s"$tmp/events.parquet")
    val agg = StreamingPipeline.sessionWindowAgg(
      StreamingPipeline.streamTable(spark, tmp, "events")
        .withWatermark("ts", "1 hour"), "user_id", "ts")
    val q = agg.writeStream.format("memory").queryName("sesswin_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("sesswin_out").collect().map(_.toSeq).toSet == batch)
  }

  test("transformWithState running totals equal the batch window program") {
    // The StatefulProcessor API executes only on RocksDB.
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = StreamingPipeline.runningTotalsBatch(
        Tables.load(spark, sf0001, "events")
          .select("user_id", "event_id", "ts", "value"))
        .collect().map(_.toSeq).toSet
      val streamed = StreamingPipeline.runningTotalsTws(
        spark, StreamingPipeline.streamTable(spark, sf0001, "events"))
      val q = streamed.writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("tws_out")
        .select("user_id", "event_id", "ts_us", "cents", "running_cents")
        .collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateful streaming runs unchanged on the RocksDB state store") {
    // At 100 TB the default HDFS-backed store keeps every key in
    // executor heap; RocksDB spills state to local disk and is the
    // production provider. Same Column program, same results — only the
    // provider conf differs, proven here on the watermarked session
    // aggregation (merge-heavy, the hardest state shape we use).
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val agg = StreamingPipeline.sessionWindowAgg(
        StreamingPipeline.streamTable(spark, sf0001, "events")
          .withWatermark("ts", "1 hour"), "user_id", "ts")
      val q = agg.writeStream.format("memory").queryName("rocks_out")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Append emits only watermark-closed sessions; every emitted row
      // must agree with the batch program (subset relation), and the
      // bulk of sessions must have flushed.
      val batch = StreamingPipeline.sessionWindowAgg(
        Tables.load(spark, sf0001, "events"), "user_id", "ts")
        .collect().map(_.toSeq).toSet
      val got = spark.table("rocks_out").collect().map(_.toSeq).toSet
      assert(got.nonEmpty && got.subsetOf(batch),
        s"RocksDB-backed result diverged: ${got.size} rows vs batch ${batch.size}")
      assert(got.size >= batch.size / 2, "most sessions should have flushed")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("tumbling agg behind readStream matches the batch result") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val batch = StreamingPipeline.tumblingAgg(
      Tables.load(spark, sf0001, "events"), "ts")
      .collect().map(_.toSeq).toSet

    val agg = StreamingPipeline.tumblingAgg(
      StreamingPipeline.streamTable(spark, sf0001, "events"), "ts")
    val q = agg.writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("tumbling_out").collect().map(_.toSeq).toSet
    assert(got == batch)
  }
}
