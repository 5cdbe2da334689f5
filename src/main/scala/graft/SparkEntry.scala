package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries, CapabilityQueries, ClassicQueries, CorpusQueries, ExtensionQueries, FrontierQueries, MiningQueries, ParityQueries, PipelineQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps every implemented SURVEY §2 operator (and extension) to a
  * runnable DataFrame program; `oracleSql` gives the DuckDB-equivalent SQL
  * the driver hash-compares against.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference pipeline shape — window-filtered scan, row hash,
    * incremental anti-join vs a half-window snapshot, aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q7_incremental_antijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries ++
      StreamingQueries.queries ++ CapabilityQueries.queries ++
      AnalyticsQueries.queries ++ PipelineQueries.queries ++
      MiningQueries.queries ++ CorpusQueries.queries ++
      ClassicQueries.queries ++ FrontierQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ExtensionQueries.oracleSql ++
      StreamingQueries.oracleSql ++ CapabilityQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ PipelineQueries.oracleSql ++
      MiningQueries.oracleSql ++ CorpusQueries.oracleSql ++
      ClassicQueries.oracleSql ++ FrontierQueries.oracleSql
}
