package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime core for [[WinnowFingerprint]]: one linear pass per document. */
object WinnowUtil {

  private val hexAlphabet = "0123456789abcdef".toCharArray

  private def md5Hex8(md: MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](8)
    var j = 0
    while (j < 4) {
      out(j * 2) = hexAlphabet((d(j) >> 4) & 0xf)
      out(j * 2 + 1) = hexAlphabet(d(j) & 0xf)
      j += 1
    }
    new String(out)
  }

  private def md5Hex32(md: MessageDigest, bytes: Array[Byte]): UTF8String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = hexAlphabet((d(j) >> 4) & 0xf).toByte
      out(j * 2 + 1) = hexAlphabet(d(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Winnowing in one pass: char k-gram md5-prefix hashes (code-point
    * substrings via UTF8String, matching Spark `substring`), sliding
    * window-of-w minima via a monotonic deque, distinct minima sorted and
    * md5'd. Returns struct(fp_winnow: string, n_winnow: int) —
    * byte-identical to the expression/window formulations.
    */
  def winnow(text: UTF8String, k: Int, w: Int): InternalRow = {
    val md = MessageDigest.getInstance("MD5")
    val minima = minimaSet(md, text, k, w)
    val sb = new java.lang.StringBuilder(minima.size() * 8)
    val it = minima.iterator()
    while (it.hasNext) sb.append(it.next())
    val fp = md5Hex32(md, sb.toString.getBytes("UTF-8"))
    InternalRow(fp, minima.size())
  }

  /** The raw sorted-distinct winnow minima behind [[winnow]] as an array
    * column — collision mining equality-joins on its elements.
    */
  def winnowSet(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val minima = minimaSet(MessageDigest.getInstance("MD5"), text, k, w)
    val out = new Array[AnyRef](minima.size())
    val it = minima.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  private def minimaSet(md: MessageDigest, text: UTF8String, k: Int,
      w: Int): java.util.TreeSet[String] = {
    val len = text.numChars()
    val nGrams = math.max(len - k + 1, 1)
    val hashes = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      // UTF8String.substring(start, until) is code-point based — same
      // semantics as Spark's substring(text, i+1, k).
      hashes(i) = md5Hex8(md, text.substring(i, math.min(i + k, len)).getBytes)
      i += 1
    }
    val nWins = math.max(nGrams - w + 1, 1)
    val minima = new java.util.TreeSet[String]()
    // Monotonic deque of indices; front = index of current window minimum.
    val deque = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(p)) deque.pollLast()
      deque.addLast(p)
      if (deque.peekFirst() <= p - w) deque.pollFirst()
      if (p >= w - 1 && p - w + 1 < nWins) minima.add(hashes(deque.peekFirst()))
      p += 1
    }
    if (minima.isEmpty) {
      // document shorter than one full window: single window over all
      var best = hashes(0); i = 1
      while (i < nGrams) { if (hashes(i) < best) best = hashes(i); i += 1 }
      minima.add(best)
    }
    minima
  }
}

/** Whole-document winnowing fingerprint as ONE codegen'd expression: a
  * narrow map over the scan, no explode, no shuffle, each gram hashed
  * once (the naive nested-HOF composition re-evaluates grams per window —
  * quadratic per row; the explode+window form is linear but pays a full
  * shuffle+sort of one row per gram).
  */
case class WinnowFingerprint(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fp_winnow", StringType, nullable = false),
    StructField("n_winnow", IntegerType, nullable = false)))
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowUtil.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  def of(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, w))
}

/** The sorted-distinct winnow minima as an `array<string>` column — same
  * one-pass kernel as [[WinnowFingerprint]], exposed element-wise so
  * collision mining can explode + equality-join on individual minima.
  */
case class WinnowMinima(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_minima"

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.winnowSet(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowUtil.winnowSet($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMinima {
  def of(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowMinima(ColumnBridge.expression(text), k, w))
}
