package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiler: per-column row/null/distinct counts
  * and min/max — the first query anyone runs against an unfamiliar
  * 100 TB table, and the statistics layer a transfer pipeline records
  * per run (the reference logs per-run row accounting; this is the
  * column-level generalization).
  *
  * Scale shape: ONE scan. All per-column aggregates ride a single
  * `agg(...)`; Spark plans the N distinct-counts via one Expand
  * (N× rows into a partial aggregate — the standard multi-distinct
  * plan), not N scans of the table. For tables where exact distincts
  * are too hot, `exact = false` swaps in `approx_count_distinct`
  * (HLL++, single-pass, no Expand) — same output schema.
  *
  * min/max are emitted as canonical strings so heterogeneous column
  * types share one output schema. Doubles print shortest-round-trip in
  * both Spark and DuckDB (identical below the 1e7 scientific-notation
  * switch); timestamps print `yyyy-MM-dd HH:mm:ss`.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String], exact: Boolean = true)
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
