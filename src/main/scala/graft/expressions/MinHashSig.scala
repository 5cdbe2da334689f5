package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature over an `array<bigint>` shingle-hash set:
  * position k of the result = min over shingles h of
  * `xxhash64(h, k)` — EXACTLY Spark's `xxhash64(col, lit(k))` chain
  * (`hashInt(k, hashLong(h, 42))` — the position literal is an Int, so
  * Spark hashes it through the 4-byte path), so signatures and the band keys
  * built from them are bit-identical to the explode + `numHashes` ×
  * `min(xxhash64(...))` aggregation this replaces.
  *
  * Why it exists: the aggregation formulation explodes every shingle
  * into its own row and shuffles a groupBy to reassemble documents —
  * at sf0.1 that is millions of transient rows and a full exchange for
  * what is per-row arithmetic. Here the whole signature is one pass
  * over the array inside whole-stage codegen (the shared inner hash
  * `hashLong(h, 42)` is also computed once per shingle instead of once
  * per signature position — half the hash work), the explode and the
  * shuffle disappear, and shingling + signatures + band keys fuse into
  * a single stage. At 100 TB this removes the largest exchange in the
  * MinHash dedup path; band-bucket joins downstream are unchanged.
  *
  * Empty sets: callers filter `size(hs) > 0` first (the aggregation
  * formulation dropped shingle-less documents implicitly; such
  * documents can never pair).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(x.getLong(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashInt(k, base)
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName for every local — see FloatVecDot.doGenCode.
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $v = $xxh.hashInt($k, $base);
         |    if ($v < $out[$k]) $out[$k] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def signature(hs: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), numHashes))
}
