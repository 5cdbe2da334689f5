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
}
