package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle for training order: every epoch-0 data
  * loader wants the corpus in a reproducible pseudo-random total order.
  * The order key is `(md5(seed || id), id)` — seed-keyed, uniform,
  * engine-portable — and the output is a dense global rank
  * `shuffle_pos` in that order.
  *
  * Scale shape: an unpartitioned `row_number()` window would move every
  * row to ONE partition (Spark warns exactly this). Instead ranks come
  * from BUCKET OFFSETS: the first 4 hex chars of the md5 key split the
  * order into 65,536 lexicographic buckets; one tiny aggregation counts
  * each bucket (collected bounded at 65,536 rows and broadcast back),
  * and a per-bucket `row_number()` window adds the within-bucket rank.
  * One shuffle by bucket, no persisted intermediate, no RDD round-trip,
  * and the md5 key makes every bucket ≈ corpus/65,536 rows — skew-free
  * by construction at any corpus size.
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
    val b = s"${k}_b"
    val keyed = df
      .withColumn(k, md5(concat(lit(seed), col(idCol).cast("string"))))
      .withColumn(b, substring(col(k), 1, 4))
    // bucket -> rows-before-it offset; the bucket id is a PREFIX of the
    // sort key, so lexicographic bucket order == global key order
    val counts = keyed.groupBy(b).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)((acc, p) => acc + p._2))
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF(b, "__off"))
    val w = Window.partitionBy(col(b)).orderBy(col(k), col(idCol))
    keyed
      .join(offDf, b)
      .withColumn("shuffle_pos",
        col("__off") + row_number().over(w).cast("long") - 1L)
      .drop(k, b, "__off")
  }

  /** Corpus-wide percentile rank of a [0,1] score column (quality
    * percentiles for curation thresholds) — `percent_rank()` over
    * `(score, id)` without the single-partition window.
    *
    * Same bucket-offset scheme as [[shuffleOrder]], with the bucket
    * being a VALUE prefix: `floor(score * nBuckets)` is monotone in the
    * score, so lexicographic bucket order == global score order; one
    * tiny count aggregation (≤ `nBuckets` rows, broadcast back) plus a
    * per-bucket window gives the dense global rank. Out-of-range scores
    * clamp into the end buckets (still order-consistent).
    *
    * Appends `pct` = rank/(n−1) rounded to 6 dp — exactly SQL's
    * `percent_rank() OVER (ORDER BY score, id)` since the `(score, id)`
    * order is total (`idCol` unique, non-null).
    */
  def percentileRank(df: DataFrame, scoreCol: String, idCol: String,
      nBuckets: Int = 4096): DataFrame = {
    require(!df.columns.contains("pct"), "input already has a pct column")
    val b = Iterator.from(0).map(i => s"__graft_pct_b$i")
      .find(n => !df.columns.contains(n)).get
    val keyed = df.withColumn(b,
      greatest(least(floor(col(scoreCol) * nBuckets), lit(nBuckets - 1)),
        lit(0)).cast("int"))
    val counts = keyed.groupBy(b).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)((acc, p) => acc + p._2))
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF(b, "__off"))
    val w = Window.partitionBy(col(b)).orderBy(col(scoreCol), col(idCol))
    keyed
      .join(offDf, b)
      .withColumn("pct", round(
        (col("__off") + row_number().over(w).cast("long") - 1L)
          .cast("double") / lit(math.max(n - 1L, 1L)), 6))
      .drop(b, "__off")
  }
}
