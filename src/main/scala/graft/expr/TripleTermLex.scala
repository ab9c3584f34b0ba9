package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.QuotedTriple

/** RDF 1.2 output-edition conversion for quoted-triple lexicals: maps
  * the engine's canonical CG-star token `<< s p o >>` to the 1.2
  * triple-term spelling `<<( s p o )>>` (recursively), as a native
  * codegen'd expression — one static call per row, so 1.2-edition
  * serialization stays inside whole-stage codegen. Both spellings
  * denote the same stored term; this is purely a writer concern
  * (rdf12-concepts triple terms; the reverse direction is handled at
  * parse time, where both spellings decode to one canonical lex).
  */
case class TripleTermLex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "triple_term_lex"

  override protected def nullSafeEval(input: Any): Any =
    TripleTermLex.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expr.TripleTermLex$$.MODULE$$.convert($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): TripleTermLex = copy(child = newChild)
}

object TripleTermLex {

  /** Column wrapper over a canonical-lex string column. */
  def convert(c: Column): Column =
    ColumnBridge.column(TripleTermLex(ColumnBridge.expression(c)))

  /** Static entry point for generated code. */
  def convert(lex: UTF8String): UTF8String = {
    if (lex == null) return null
    val out = QuotedTriple.tripleTermLex(lex.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}
