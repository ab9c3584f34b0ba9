package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Sequential-fold float-array dot product as a native Catalyst
  * expression (primitive loop + codegen), replacing the pure-Column
  * `aggregate(zip_with(a, b, (x,y) => xD*yD), 0.0, +)` formulation.
  *
  * Higher-order functions are CodegenFallback: every embedding dot
  * product ran interpreted with per-element boxing — measured
  * 12–28 µs per 64-dim cosine, the dominant cost of every similarity
  * operator at scale (dd12's 100× assignment spent 60 s here). This
  * expression does the same arithmetic as one tight primitive loop
  * inside whole-stage codegen.
  *
  * Bit-compatibility contract (locked by GoldenSpec's byte-exact
  * outputs): identical element order, identical IEEE ops
  * (float→double cast, double multiply, double add from 0.0), and
  * identical null semantics — mismatched lengths or a null element
  * yield NULL, exactly like zip_with's null padding propagating
  * through the fold.
  */
case class DotSeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_seq needs two array<float> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotSeq.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}R =
        graft.expr.DotSeq$$.MODULE$$.dot($a, $b);
      if (${ev.value}R == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}R.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotSeq = copy(left = newLeft, right = newRight)
}

object DotSeq {

  /** Shared by interpreted eval and generated code. Returns null (the
    * SQL NULL) on length mismatch or a null element — matching the
    * zip_with fold it replaces.
    */
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-level wrapper. */
  def dotCol(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotSeq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
