package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the first step
  * of text canonicalization before hashing/dedup (decomposed "é" and
  * composed "é" must produce the same fingerprint, or near-dup recall
  * silently drops on any non-ASCII corpus).
  *
  * Why an Expression and not a UDF: this sits on the hot path in front
  * of every fingerprint/shingle, and a Scala UDF would break
  * whole-stage codegen there (SURVEY §7.3 preference order). The
  * generated code short-circuits via `Normalizer.isNormalized` — for
  * already-NFC text (all ASCII, i.e. most of a web corpus) no new
  * string is allocated.
  *
  * Oracle-portable: DuckDB's `nfc_normalize()` implements the same
  * (Unicode-standard) transformation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string arg, got ${t.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  // numBytes == numChars <=> pure ASCII <=> already NFC: the dominant
  // web-corpus case skips even the UTF-16 decode; non-ASCII rows probe
  // isNormalized on the decoded string before allocating a new one.
  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    if (u.numBytes == u.numChars) s
    else {
      val str = u.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("s")
      s"""
         |if ($c.numBytes() == $c.numChars()) {
         |  ${ev.value} = $c;
         |} else {
         |  String $tmp = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized(
         |      $tmp, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : UTF8String.fromString(java.text.Normalizer.normalize(
         |        $tmp, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def of(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
