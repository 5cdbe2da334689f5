package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic global shuffle for training order: every epoch-0 data
  * loader wants the corpus in a reproducible pseudo-random total order.
  * The order key is `(md5(seed || id), id)` — seed-keyed, uniform,
  * engine-portable — and the output is a dense global rank
  * `shuffle_pos` in that order.
  *
  * Scale shape: an unpartitioned `row_number()` window would move every
  * row to ONE partition (Spark warns exactly this). Instead the frame
  * is range-partitioned and sorted by the key — a distributed sort —
  * and ranks come from per-partition offsets (`zipWithIndex`: one extra
  * O(#partitions) count job, then a narrow map). No single-partition
  * stage anywhere, so the op survives arbitrary corpus size.
  */
object TrainingOrder {

  /** Append a dense 0-based `shuffle_pos` in the seed-keyed shuffle
    * order. `idCol` must be unique and non-null (it tiebreaks md5
    * collisions into a total order; with it the result is exactly
    * reproducible across runs, partitionings, and engines).
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String): DataFrame = {
    require(!df.columns.contains("shuffle_pos"),
      "input already has a shuffle_pos column")
    val k = Iterator.from(0).map(i => s"__graft_ord_k$i")
      .find(n => !df.columns.contains(n)).get
    // persisted because zipWithIndex's size-count job materializes every
    // sorted partition — without the persist the full distributed sort
    // would run twice (once to count, once for the consuming action).
    // Left to LRU/session teardown like the dedup shingle caches.
    val sorted = df
      .withColumn(k, md5(concat(lit(seed), col(idCol).cast("string"))))
      .orderBy(col(k), col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema.add("shuffle_pos", LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(ranked, schema).drop(k)
  }
}
