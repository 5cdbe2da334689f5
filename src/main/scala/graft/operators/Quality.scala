package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality quarantine (constraint checking): evaluate a rule set
  * over every row, quarantine the rows that violate any rule together
  * with the sorted list of violated rule names — the validating sibling
  * of the reference's sanitization pass (W1 rewrites bad cells; this
  * REPORTS bad rows so a pipeline can dead-letter them instead of
  * silently shipping them).
  *
  * A rule predicate evaluating to NULL (e.g. a comparison on a NULL
  * cell) counts as a VIOLATION — unknown is not a pass, the standard
  * dead-letter posture.
  *
  * Scale shape: one narrow map evaluating all predicates per row (one
  * codegen'd projection, no shuffle) + the filter; output size is the
  * violation count, not the table.
  */
object Quality {

  /** Rows violating ≥1 rule: id columns + `violations ARRAY<STRING>`
    * (rule names, sorted).
    */
  def quarantine(df: DataFrame, idCols: Seq[String],
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val flags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("violations",
        array_sort(filter(array(flags: _*), v => v.isNotNull)))
      .where(size(col("violations")) > 0)
      .select(idCols.map(col) :+ col("violations"): _*)
  }
}
