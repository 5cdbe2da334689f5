package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns, accumulating in
  * double with strict left-to-right order — bit-identical to the
  * `aggregate(zip_with(...))` fold it replaces, but compiled into the
  * whole-stage loop instead of interpreted per element.
  *
  * Why it exists: Spark's higher-order functions (`transform`, `aggregate`,
  * `zip_with`) evaluate their lambda interpreted, per element, per row. A
  * brute-force pair scan doing 12.5M × 3 folds × 64 elements that way is
  * ~40 s at sf0.1; this expression does the same work inside codegen in
  * ~1 s. The preference order from SURVEY §7.3 applies: built-ins first,
  * custom Expression only where built-ins can't express it efficiently —
  * this is that case.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot expects two array<float> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local: when both inputs are non-nullable the
      // body is emitted unwrapped at the enclosing scope, so two instances
      // in one projection would otherwise collide in Janino.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd intersection count of two SORTED `array<bigint>` columns via
  * a linear merge scan — no hash set, no boxing. Replaces
  * `size(array_intersect(a, b))` in the dedup verification joins, where
  * millions of candidate pairs × ~30 µs of OpenHashSet work per pair was
  * the dominant cost. Inputs MUST be sorted ascending and distinct
  * (graft's shingle sets are produced by `array_sort(array_distinct(…))`).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect_count expects two array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see FloatVecDot.doGenCode.
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $n = $a.numElements(), $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd thresholded Jaccard over two SORTED distinct `array<bigint>`
  * columns: returns J(A,B) = |A∩B| / |A∪B| when J ≥ `threshold`, else
  * -1.0 — with EARLY EXIT. J ≥ t requires c ≥ ⌈t/(1+t)·(|A|+|B|)⌉;
  * during the merge scan the reachable intersection is bounded by
  * c + min(remaining_a, remaining_b), so a pair whose bound falls below
  * the requirement aborts mid-scan. On near-dup workloads almost all
  * candidate pairs are negatives that abort after a fraction of the
  * merge, cutting the dominant verification cost ~3-4× vs a full
  * intersection count. The returned Jaccard for passing pairs is exactly
  * the full-scan value (the early exit only fires on pairs that cannot
  * pass).
  *
  * `threshold` must be a foldable non-null double in [0, 1).
  */
case class SortedLongJaccardGE(left: Expression, right: Expression,
    thresholdExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = thresholdExpr

  private lazy val threshold: Double =
    thresholdExpr.eval(null).asInstanceOf[Double]

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    })
    if (!arraysOk) TypeCheckResult.TypeCheckFailure(
      s"sorted_long_jaccard_ge expects two array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    else if (thresholdExpr.dataType != DoubleType || !thresholdExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "sorted_long_jaccard_ge threshold must be a foldable double")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard_ge"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val th = t.asInstanceOf[Double]
    // required = ceil(th/(1+th) * (n+m)) without FP ceil drift:
    // c*(1+th) >= th*(n+m)  ⟺  c >= th*(n+m)/(1+th)
    val required = math.ceil(th * (n + m) / (1.0 + th) - 1e-9).toInt
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (c + math.min(n - i, m - j) < required) return -1.0
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val jac = if (n + m - c == 0) 0.0 else c.toDouble / (n + m - c)
    if (jac >= th) jac else -1.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      // freshName for every local — see FloatVecDot.doGenCode.
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val req = ctx.freshName("req")
      val rem = ctx.freshName("rem")
      val jac = ctx.freshName("jac")
      val th = threshold
      s"""
         |int $n = $a.numElements(), $m = $b.numElements();
         |int $req = (int) java.lang.Math.ceil($th * ($n + $m) / (1.0 + $th) - 1e-9);
         |int $i = 0, $j = 0, $c = 0;
         |${ev.value} = -1.0;
         |while ($i < $n && $j < $m) {
         |  int $rem = ($n - $i < $m - $j) ? ($n - $i) : ($m - $j);
         |  if ($c + $rem < $req) { $c = -1; break; }
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if ($c >= 0) {
         |  double $jac = ($n + $m - $c == 0) ? 0.0
         |    : ((double) $c) / ($n + $m - $c);
         |  if ($jac >= $th) { ${ev.value} = $jac; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, thresholdExpr = newThird)
}

object VecOps {
  /** Column-level dot product of two float-array columns (double result). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Euclidean norm of a float-array column. */
  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Intersection count of two sorted, distinct long-array columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Early-exit thresholded Jaccard of two sorted distinct long-array
    * columns: J(a,b) when ≥ threshold, else -1.0.
    */
  def sortedJaccardGE(a: Column, b: Column, threshold: Double): Column =
    ColumnBridge.column(SortedLongJaccardGE(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      org.apache.spark.sql.catalyst.expressions.Literal(threshold)))
}
