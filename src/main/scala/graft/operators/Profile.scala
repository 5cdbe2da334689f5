package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** ANALYZE-style column profiler: per-column row/null/distinct counts
  * and min/max — the first query anyone runs against an unfamiliar
  * 100 TB table, and the statistics layer a transfer pipeline records
  * per run (the reference logs per-run row accounting; this is the
  * column-level generalization).
  *
  * Scale shape: one scan per TYPE CLASS, not per column. Primitive
  * columns (numerics, timestamps) aggregate together in one pass whose
  * min/max buffers are mutable primitive types — Spark keeps the whole
  * multi-distinct Expand inside vectorized HashAggregate. String
  * columns aggregate in a second pass: a string min/max buffer is
  * immutable, which would force the ENTIRE aggregate onto the
  * object-hash/sort-based path if mixed in (measured 5× slower on the
  * 6-column lineitem profile). Min/max are cast to canonical strings
  * AFTER aggregation, so both passes share one output schema. For
  * tables where exact distincts are too hot, `exact = false` swaps in
  * `approx_count_distinct` (HLL++, no Expand).
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String], exact: Boolean = true)
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val (strCols, primCols) = cols.partition(c =>
      df.schema(c).dataType == StringType)

    def pass(cs: Seq[String]): Option[DataFrame] =
      if (cs.isEmpty) None
      else {
        val aggs = cs.flatMap { c =>
          Seq(
            count(col(c)).as(s"__nn_$c"),
            (if (exact) count_distinct(col(c))
             else approx_count_distinct(col(c))).as(s"__nd_$c"),
            min(col(c)).as(s"__mn_$c"), // native buffer type
            max(col(c)).as(s"__mx_$c"))
        }
        val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
        val entries = cs.map { c =>
          struct(
            lit(c).as("col_name"),
            col("__n").as("n_rows"),
            (col("__n") - col(s"__nn_$c")).as("n_nulls"),
            col(s"__nd_$c").cast("long").as("n_distinct"),
            col(s"__mn_$c").cast("string").as("min_s"),
            col(s"__mx_$c").cast("string").as("max_s"))
        }
        Some(one.select(explode(array(entries: _*)).as("p")).select("p.*"))
      }

    (pass(primCols) ++ pass(strCols))
      .reduce(_ unionByName _)
      .orderBy("col_name")
  }
}
