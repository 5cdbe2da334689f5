package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sort-clustered table layout — the write-side half of scan pruning.
  *
  * `writeSorted` range-partitions on the cluster columns and sorts
  * within each partition before writing, so every output file covers a
  * DISJOINT range of the cluster key and every parquet row group is
  * sorted. Readers then prune point/range predicates to O(1) files via
  * file/row-group min-max stats instead of scanning the table — at
  * 100 TB the difference between touching gigabytes and touching
  * everything. Complements `Bucketing` (hash-clustered, for joins):
  * range clustering serves RANGE predicates and ordered scans.
  *
  * The reference has no layout control (it streams INSERT batches,
  * `clickhouse/writer/main.go:95-120`); this is the lever its target
  * tables get from ClickHouse's ORDER BY key, applied to data-lake
  * files.
  */
object Layout {

  /** Write `df` as `numFiles` range-disjoint, internally-sorted parquet
    * files clustered on `cols`. Range boundaries come from Spark's
    * reservoir sampling of the key distribution, so files are
    * ~equal-sized even on skewed keys.
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int,
      cols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numFiles > 0 && cols.nonEmpty, "need numFiles > 0 and cluster cols")
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, bytesBefore: Long)

  /** Small-file compaction — the standing maintenance job of any
    * incrementally-written lake table. Streaming/incremental appends
    * leave thousands of KB-scale files per partition; every downstream
    * scan then pays per-file open/footer/seek costs and the scheduler
    * drowns in splits. Compaction rewrites the table as
    * `ceil(bytes / targetFileBytes)` files — range-clustered + sorted
    * when `cols` are given (preserving [[writeSorted]]'s min-max
    * pruning), round-robin otherwise.
    *
    * Writes to `outPath` rather than in place: an in-place rewrite needs
    * a table format with a commit protocol (Delta/Iceberg manifests) to
    * stay atomic under concurrent readers; path-swap is the primitive
    * this library exposes, and the caller owns the swap.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 128L << 20,
      cols: Seq[String] = Nil): CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(hPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    val shaped =
      if (cols.nonEmpty)
        df.repartitionByRange(n, cols.map(col): _*)
          .sortWithinPartitions(cols.map(col): _*)
      else df.repartition(n)
    shaped.write.mode(SaveMode.Overwrite).parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    CompactStats(parts.length, after, bytes)
  }
}
