package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the
  * trained coarse quantizer the reference pipeline lacks (its only
  * "model" is a hash set, `consumer.go:89-95`); here it upgrades
  * [[Similarity.ivfTopK]]'s fixed pseudo-random anchors to
  * data-adapted cells, and is the standard corpus-clustering /
  * semantic-dedup primitive of LLM data pipelines.
  *
  * Determinism contract (driver-oracle replayable, like
  * [[Similarity.centroids]]):
  *   - seeds: the k lowest-id vectors (total order on ids), not
  *     random restarts;
  *   - assignment: squared L2 computed as a SEQUENTIAL left fold of
  *     `(x_i − c_i)²` over double-widened components — the same IEEE
  *     op sequence DuckDB's `list_sum(list_transform(...))` runs —
  *     ties broken by smallest centroid id;
  *   - update: component sums in FIXED-POINT (`floor(x·2^20)` as
  *     long; integer addition is order-free, so partial aggregation
  *     stays map-side combinable), divided back as
  *     `(s.toDouble / n) / 2^20` — bit-identical on every engine.
  *
  * Scale shape per iteration: assignment is a NARROW map (k
  * sequential-fold distances per row against broadcast-literal
  * centroids — no join, no shuffle); the update is posexplode + ONE
  * shuffle of (cid, pos) partial sums, k·dims cells total regardless
  * of corpus size. Centroids (k·dims doubles) ride the closure like
  * MLlib's own k-means broadcast. Iterations are driver-sequenced
  * Spark jobs — each materializes only the k·dims aggregate, never
  * the corpus.
  *
  * An empty cluster simply drops out (no rows aggregate to its id) —
  * identical behavior in the SQL replay.
  */
object Kmeans {

  /** The fitted model: (cid, centroid) pairs, cid-sorted, centroids
    * unrounded — the coarse quantizer [[Similarity.ivfTrainedTopK]]
    * serves with.
    */
  def fit(df0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scaleBits: Int = 20): Seq[(Long, Array[Double])] =
    run(df0, idCol, vecCol, k, iters, scaleBits)._1()

  /** Final exploded centroids: (cid, pos, c, n) — pos 1-based, c
    * rounded to 6 dp for output (iteration-internal centroids stay
    * unrounded), n = cluster size. k·dims rows.
    */
  def fitCentroids(df0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scaleBits: Int = 20): DataFrame = {
    val lastAgg = run(df0, idCol, vecCol, k, iters, scaleBits)._2
    lastAgg.select(col("cid"), col("pos"), round(col("c"), 6).as("c"),
      col("n"))
  }

  private def run(df0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scaleBits: Int)
      : (() => Seq[(Long, Array[Double])], DataFrame) = {
    val q = (1L << scaleBits).toDouble
    val df = graft.sources.Tables.rebalanceForCompute(df0)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))

    // Seeds: the k lowest ids, exploded to (cid, pos, c) like every
    // later iteration — one tiny job.
    val seedRows = df.orderBy("id").limit(k)
      .select(col("id").as("cid"), posexplode(col("v")).as(Seq("p0", "c")))
      .select(col("cid"), (col("p0") + 1).cast("long").as("pos"), col("c"))
      .collect()
    var cents: Seq[(Long, Array[Double])] = regroup(seedRows)

    var lastAgg: DataFrame = null
    for (i <- 1 to iters) {
      val assigned = df.withColumn("cid", nearestCid(col("v"), cents))
      lastAgg = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("p0", "x")))
        .select(col("cid"), (col("p0") + 1).cast("long").as("pos"),
          floor(col("x") * lit(q)).cast("long").as("fx"))
        .groupBy("cid", "pos")
        .agg(sum("fx").as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          ((col("s").cast("double") / col("n")) / lit(q)).as("c"),
          col("n"))
      // The final round's collect is deferred: fitCentroids returns the
      // plan itself (one job saved), and fit()'s lazy val only runs it
      // when the trained model is actually read.
      if (i < iters) cents = regroup(lastAgg.select("cid", "pos", "c").collect())
    }
    val finalAgg = lastAgg
    (() => regroup(finalAgg.select("cid", "pos", "c").collect()), finalAgg)
  }

  /** argmin-distance centroid id: array_sort of (d, cid) structs is a
    * lexicographic sort, so element 1 = min distance with smallest-id
    * tie-break (the [[Similarity.ivfTopK]] probe idiom).
    */
  private[operators] def nearestCid(v: Column, cents: Seq[(Long, Array[Double])])
      : Column = {
    val entries = cents.map { case (cid, c) =>
      struct(sqDist(v, c).as("d"), lit(cid).as("cid"))
    }
    element_at(array_sort(array(entries: _*)), 1).getField("cid")
  }

  /** The `nprobe` nearest centroid ids, nearest-first (same
    * lexicographic (d, cid) order as [[nearestCid]]) — the query-side
    * probe list of trained IVF.
    */
  private[operators] def nearestCids(v: Column,
      cents: Seq[(Long, Array[Double])], nprobe: Int): Column = {
    val entries = cents.map { case (cid, c) =>
      struct(sqDist(v, c).as("d"), lit(cid).as("cid"))
    }
    slice(transform(array_sort(array(entries: _*)), s => s.getField("cid")),
      1, nprobe)
  }

  /** Sequential left fold of (v_i − c_i)²: `aggregate` evaluates the
    * merge left-to-right from 0.0, the exact op order of the oracle's
    * `list_sum(list_transform(range, i -> (v[i]-c[i])^2))`.
    */
  private def sqDist(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, typedlit(c), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  private def regroup(rows: Array[org.apache.spark.sql.Row])
      : Seq[(Long, Array[Double])] =
    rows.map(r => (r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
      .groupBy(_._1).toSeq
      .map { case (cid, ps) =>
        val arr = new Array[Double](ps.map(_._2).max)
        ps.foreach { case (_, pos, c) => arr(pos - 1) = c }
        (cid, arr)
      }.sortBy(_._1)
}
