package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.types.UniversalType

/** The reference's full-row hash (`/root/reference/etl.go:61-68`):
  * lowercase each cell's universal string encoding, sort the cell VALUES
  * (not the columns), concatenate, MD5-hex.
  *
  * Semantics preserved exactly (golden digests in `etl_test.go:9-53`):
  *   - insensitive to column order AND to which column holds which value
  *     (a permuted multiset of values collides — `etl_test.go:26-35`);
  *   - case-insensitive;
  *   - NULL hashes as the empty string (`mysql/mysql.go:109-112`).
  *
  * Implementation is pure built-in Catalyst expressions — md5 / array_join /
  * array_sort / transform / lower are all codegen'd, so the hash stays inside
  * whole-stage codegen with no UDF boundary. At 100 TB this runs as a narrow
  * map over the scan with zero shuffle.
  */
object RowHash {

  /** Hash pre-encoded string cells (the reference's native input shape).
    * Implemented as the single codegen'd [[graft.expressions.RowHashMd5]]
    * expression; the equivalent built-in composition
    * `md5(array_join(array_sort(transform(array(...), lower))))` falls out
    * of whole-stage codegen (higher-order lambdas are interpreted).
    */
  def ofCells(cells: Seq[Column]): Column = {
    val safe = cells.map(c => coalesce(c.cast("string"), lit("")))
    graft.expressions.RowHashMd5.of(safe)
  }

  /** Hash typed columns by first applying the universal cell encoding
    * (datetime → RFC3339, date → yyyy-MM-dd, NULL → "", else cast string),
    * so numeric/datetime formatting matches what the reference would hash.
    */
  def ofColumns(df: DataFrame, names: Seq[String]): Column = {
    val fields = df.schema.fields.filter(f => names.contains(f.name))
    val byName = names.map(n => fields.find(_.name == n).get)
    ofCells(byName.map(f => UniversalType.universalCell(col(f.name), f.dataType)))
  }

  /** Hash every column of `df` (the reference hashes whole rows). */
  def ofAllColumns(df: DataFrame): Column =
    ofColumns(df, df.schema.fieldNames.toIndexedSeq)

  /** Append the hash as a column. */
  def withRowHash(df: DataFrame, hashCol: String = "row_hash"): DataFrame =
    df.withColumn(hashCol, ofAllColumns(df))
}
