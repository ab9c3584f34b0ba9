package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical xsd:dayTimeDuration lexical form from signed decimal
  * seconds, as a native codegen'd Catalyst expression.
  *
  * The pure-Column formulation (nested when/concat over decimal modulo)
  * expands to a conditional tree Spark's subexpression elimination can't
  * share (conditional branches are skipped), which pushed the enclosing
  * stage past the JVM 64 KB method limit and back to interpreted
  * execution (PLANS.md round-3 known cost on sp27_date_arith). Here the
  * whole computation is one static Java call inside whole-stage codegen.
  * [reference: lib/oxsdatatypes/src/duration.rs · Duration Display]
  */
case class DayTimeDurationLex(child: Expression) extends UnaryExpression {

  // child is always DecimalType(38,6) — the Column wrapper casts.
  override def dataType: DataType = StringType
  override def prettyName: String = "daytime_duration_lex"

  override protected def nullSafeEval(input: Any): Any =
    DayTimeDurationLex.canonical(input.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.DayTimeDurationLex$$.MODULE$$.canonical($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DayTimeDurationLex = copy(child = newChild)
}

object DayTimeDurationLex {

  /** Column-level wrapper. */
  def lex(c: Column): Column =
    ColumnBridge.column(DayTimeDurationLex(ColumnBridge.expression(c)))

  /** Static entry point for generated code: canonical lexical form
    * ("PT0S", "-P1DT2H3M4.5S", no zero components, seconds with
    * trailing zeros stripped).
    */
  def canonical(secs: Decimal): UTF8String = {
    val bd = secs.toJavaBigDecimal
    if (bd.signum() == 0) return UTF8String.fromString("PT0S")
    val total = bd.abs()
    val whole = total.longValue()
    val frac = total.subtract(java.math.BigDecimal.valueOf(whole))
    val d = whole / 86400L
    val rem = whole % 86400L
    val h = rem / 3600L
    val m = (rem % 3600L) / 60L
    val sNum = java.math.BigDecimal.valueOf(rem % 60L).add(frac)
    val sb = new java.lang.StringBuilder(24)
    if (bd.signum() < 0) sb.append('-')
    sb.append('P')
    if (d > 0) sb.append(d).append('D')
    if (h > 0 || m > 0 || sNum.signum() != 0) {
      sb.append('T')
      if (h > 0) sb.append(h).append('H')
      if (m > 0) sb.append(m).append('M')
      if (sNum.signum() != 0)
        sb.append(sNum.stripTrailingZeros().toPlainString()).append('S')
    }
    UTF8String.fromString(sb.toString)
  }
}
