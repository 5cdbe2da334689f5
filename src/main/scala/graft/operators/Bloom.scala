package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Bloom-filter membership for incremental dedup at scale.
  *
  * The reference's incremental mode holds the target window's row-hash
  * set fully in provider RAM (`consumer.go:89-95`,
  * `provider.go:171-177` — its documented scale ceiling). The Spark
  * anti-join (`IncrementalDedup`) removes the RAM ceiling; this Bloom
  * filter removes the SHUFFLE: a filter of m bits summarizes the seen
  * side, the probe is a broadcast lookup, and only "maybe seen" rows
  * (true duplicates + an ε of false positives) continue to the exact
  * anti-join. At 100 TB that turns "shuffle both sides" into "broadcast
  * m bits + shuffle the duplicates".
  *
  * Deterministic by construction: bit positions come from one pluggable
  * base hash (md5Hash60 for oracle replay, xxhash64 in production) via
  * Kirsch–Mitzenmacher double hashing — so an external engine can
  * replay filter CONTENTS, not just behavior. The filter is held
  * relationally as its distinct set-bit positions (≤ m rows): the
  * per-partition position sets union exactly like real bitmaps OR, and
  * a physical deployment would pack them into a bitmap broadcast
  * (Spark's own `DataFrameStatFunctions.bloomFilter` builds one on the
  * driver; the relational form keeps build distributed and contents
  * checkable).
  */
object Bloom {

  /** The k bit positions of a key: (h1 + i·h2) mod m, i < k, from the
    * two 30-bit halves of the base hash (K–M double hashing).
    */
  def positions(key: Column, m: Int, k: Int,
      hashFn: Column => Column = TextOps.md5Hash60): Column = {
    val h = hashFn(key.cast("string"))
    val h1 = pmod(h, lit(1073741824L))
    val h2 = shiftrightunsigned(h, 30)
    array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m))): _*)
  }

  /** Build: the distinct set-bit positions over all keys — one narrow
    * map + one partial-agg shuffle of at most m counters.
    */
  def build(df: DataFrame, keyCol: String, m: Int = 4096, k: Int = 3,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame =
    // Rebalanced: the hash+explode map is CPU-bound and must not be
    // serialized by a few-row-group input (no-op on healthy inputs).
    graft.sources.Tables.rebalanceForCompute(df)
      .select(explode(positions(col(keyCol), m, k, hashFn)).as("pos")).distinct()

  /** Probe: per DISTINCT key of `df(keyCol)`, `maybe_seen` — true iff
    * ALL k positions are set. False ⇒ definitely not in the build set
    * (no false negatives); true ⇒ present with probability 1-ε,
    * ε ≈ (1-e^(-kn/m))^k. `min(hit)` rather than `sum(hit) = k` keeps
    * the predicate correct when a key's k positions collide.
    *
    * The filter is broadcast (≤ m rows), so probing is a narrow map +
    * broadcast join + partial agg by key — the probe side's data rows
    * never shuffle (only its distinct keys do). Callers filter their
    * rows with a broadcast semi/anti join against the returned keys —
    * or, on a real cluster, pack `build`'s output into a bitmap and
    * probe with a scalar expression, skipping even the key shuffle.
    */
  def probe(df: DataFrame, keyCol: String, bloom: DataFrame, m: Int = 4096,
      k: Int = 3, hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    require(keyCol != "pos" && keyCol != "__pos" && keyCol != "__hit",
      s"key column '$keyCol' collides with probe's scratch/filter columns")
    // No rebalance here: the distinct's own hash shuffle already spreads
    // the keys across the cluster, so the downstream positions() hashing
    // is parallel regardless of the input's row-group layout (unlike
    // build(), where the hash map runs BEFORE any shuffle).
    val withPos = df.select(col(keyCol)).distinct()
      .withColumn("__pos", explode(positions(col(keyCol), m, k, hashFn)))
    withPos.join(
        broadcast(bloom.withColumn("__hit", lit(1))),
        withPos("__pos") === bloom("pos"), "left")
      .groupBy(col(keyCol))
      .agg((min(coalesce(col("__hit"), lit(0))) === 1).as("maybe_seen"))
  }
}
