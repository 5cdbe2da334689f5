package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingPipeline

/** At-least-once → exactly-once: the streaming dedup must drop
  * redelivered copies even when the redelivery lands in a LATER
  * micro-batch than the original (state-store path, not per-batch
  * dropDuplicates).
  */
class StreamDedupSpec extends SparkSpec {

  test("redelivered events across micro-batches emit exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = in.toDF().toDF("event_id", "ts", "payload")
    val out = StreamingPipeline.dedupExactlyOnce(events, Seq("event_id"), "ts",
      redeliveryHorizon = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, t(100), "a"), (2L, t(110), "b"), (2L, t(110), "b"))
      q.processAllAvailable()
      // Redeliver 1 and 2 in a LATER batch, plus a new event.
      in.addData((1L, t(100), "a"), (2L, t(110), "b"), (3L, t(120), "c"))
      q.processAllAvailable()
      in.addData((3L, t(120), "c"), (4L, t(130), "d"))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select("event_id", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("batch shape of the same program is a plain dropDuplicates") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("event_id", "payload")
      .withColumn("ts", current_timestamp())
    val got = StreamingPipeline.dedupExactlyOnce(df, Seq("event_id"), "ts")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
