package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom
import graft.sources.Tables

/** Bloom membership: zero false negatives always; false positives
  * appear under load and never break the definitely-new guarantee.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives on the fixture key stream") {
    val ev = Tables.load(spark, sf0001, "events")
      .withColumn("key", concat_ws("_", col("user_id"), col("event_type")))
    val snapshot = ev.where(pmod(col("event_id"), lit(2)) === 0)
    val incoming = ev.where(pmod(col("event_id"), lit(2)) === 1)
    val bloom = Bloom.build(snapshot, "key", m = 4096, k = 3)
    val probed = Bloom.probe(incoming, "key", bloom, m = 4096, k = 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val seen = snapshot.select("key").distinct()
      .collect().map(_.getString(0)).toSet
    // every truly-seen incoming key MUST be maybe_seen
    probed.foreach { case (key, maybe) =>
      if (seen(key)) assert(maybe, s"false negative on $key")
    }
    assert(probed.nonEmpty)
  }

  test("a saturated filter reports false positives; a roomy one stays tight") {
    val build = (1 to 200).map(i => s"k$i").toDF("key")
    val probeNew = (201 to 400).map(i => s"k$i").toDF("key")
    // m=64 bits for 200 keys: saturated, most probes collide.
    val tight = Bloom.probe(probeNew, "key",
        Bloom.build(build, "key", m = 64, k = 2), m = 64, k = 2)
      .where(col("maybe_seen")).count()
    assert(tight > 0, "saturated filter must produce false positives")
    // m=8192 bits for 200 keys: ε ≈ (1-e^(-kn/m))^k ≈ 0.5% — allow 5%.
    val roomy = Bloom.probe(probeNew, "key",
        Bloom.build(build, "key", m = 8192, k = 3), m = 8192, k = 3)
      .where(col("maybe_seen")).count()
    assert(roomy <= 10, s"fp count $roomy out of 200 unseen keys")
  }

  test("filter contents are deterministic and bounded by m") {
    val keys = (1 to 500).map(i => s"key-$i").toDF("key")
    val a = Bloom.build(keys, "key", m = 1024, k = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Bloom.build(keys, "key", m = 1024, k = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    assert(a.forall(p => p >= 0 && p < 1024))
    assert(a.distinct.length == a.length)
  }
}
