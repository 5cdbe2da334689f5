package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader that tolerates parquet TIMESTAMP(NANOS) columns.
  *
  * Spark has no nanosecond timestamp type; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` a NANOS column arrives as a
  * raw Long of nanos-since-epoch. We inspect the parquet footer to find
  * those columns and rebuild them as proper TimestampType via
  * `timestamp_micros(col div 1000)` — a floor to microseconds, which is
  * exactly what DuckDB's `CAST(ts_ns AS TIMESTAMP)` does, keeping the
  * oracle comparison aligned.
  */
object Tables {

  /** Column names in `path` whose parquet logical type is TIMESTAMP(NANOS). */
  def nanosTimestampCols(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).getOrElse(return Seq.empty)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      reader.getFileMetaData.getSchema.getFields.asScala.collect {
        case f if f.isPrimitive &&
          (f.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == TimeUnit.NANOS
            case _ => false
          }) => f.getName
      }.toSeq
    } finally reader.close()
  }

  /** Load `dir/name.parquet` with nanos columns normalized to TimestampType. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    nanosTimestampCols(spark, path).foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
    }
  }

  /** Guard for CPU-bound narrow transforms (shingling, fingerprinting,
    * per-row hashing, brute-force vector scans): parquet scans cannot
    * split a row group, so a table written as few large row groups scans
    * as few tasks no matter how many cores exist — a single-file
    * single-row-group input runs the whole downstream map SINGLE-THREADED
    * while the rest of the cluster idles.
    *
    * If (and only if) the scan's partition count is under half the
    * default parallelism, redistribute rows round-robin across the
    * executors. On real many-file inputs (any 100 TB table) the
    * condition is false and this is a no-op — the shuffle cost is only
    * ever paid on inputs small enough that it is trivially cheap, and
    * only ahead of compute heavy enough to dwarf it.
    */
  def rebalanceForCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2))
      df.repartition(target)
    else df
  }
}
