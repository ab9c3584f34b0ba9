package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression
  * — the canonical-composition pass of a text-cleaning pipeline
  * (comparing or deduplicating text without it treats "é" and
  * "é" as different documents).
  *
  * Spark ships no normalization builtin, and the usual Scala-UDF route
  * breaks whole-stage codegen around it; like [[DayTimeDurationLex]],
  * the computation is one static Java call inside the generated stage.
  * A fast-path scan skips the Normalizer allocation entirely for pure
  * ASCII, which at typical web-corpus ratios is most rows.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.NfcNormalize$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Column-level wrapper. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Static entry point for generated code. ASCII input (all bytes
    * < 0x80) is NFC by construction and returned as-is, without even
    * decoding to String.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val ascii = {
      var i = 0
      var ok = true
      while (ok && i < n) { if ((s.getByte(i) & 0x80) != 0) ok = false; i += 1 }
      ok
    }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}
