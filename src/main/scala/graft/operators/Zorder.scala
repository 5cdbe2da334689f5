package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two integer
  * dimensions into one sort key so that sorting by the key keeps rows
  * close in BOTH dimensions — the multi-column data-skipping layout
  * (Delta/Iceberg `ZORDER BY`) for tables queried by either or both of
  * two keys. A single-key sorted layout ([[graft.sources.Layout]])
  * prunes one dimension perfectly and the other not at all; Z-order
  * prunes both to ~sqrt(files) at 100 TB.
  *
  * The code is a pure bit-shuffle expression — 2·bits shift/mask terms
  * OR'd together, fully inside whole-stage codegen, no UDF — and
  * [[mortonCodeSql]] emits the byte-equivalent ANSI SQL so external
  * engines (and the DuckDB oracle) reproduce the exact key.
  */
object Zorder {

  /** Morton code of two non-negative ints using the low `bits` bits of
    * each (values are masked, so out-of-range inputs fold rather than
    * corrupt neighbors' bits).
    */
  def mortonCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same bit-shuffle as ANSI SQL over column expressions — one
    * source of truth for cross-engine oracle checks.
    */
  def mortonCodeSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Write `df` as `numFiles` files range-disjoint in the Morton code
    * of `(xCol, yCol)` — each file then covers a compact rectangle-ish
    * region of the 2-D key space, so min/max stats prune point and
    * range predicates on EITHER column.
    */
  def writeZordered(df: DataFrame, path: String, numFiles: Int,
      xCol: String, yCol: String, bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val z = Iterator.from(0).map(i => s"__graft_z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(z, mortonCode(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode(mode).parquet(path)
  }
}
