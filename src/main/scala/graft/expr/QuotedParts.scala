package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.{QuotedTriple, Term}

/** Component extraction for RDF-star quoted triples: parses the
  * canonical "<< s p o >>" lex (see QuotedTriple) into a struct of
  * three Term structs, as a native codegen'd expression — one static
  * Java call per row inside whole-stage codegen, so SPARQL-star
  * patterns with variables inside the quoted position stay a scan +
  * projection (no join, no UDF). Malformed input yields null (SPARQL
  * error semantics). [reference: lib/oxrdf/src/triple.rs · Triple;
  * lib/spargebra RDF-star grammar productions]
  */
case class QuotedParts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuotedParts.schema
  override def nullable: Boolean = true
  override def prettyName: String = "quoted_parts"

  override protected def nullSafeEval(input: Any): Any =
    QuotedParts.parts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expr.QuotedParts$$.MODULE$$.parts($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
    code
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuotedParts = copy(child = newChild)
}

object QuotedParts {

  val schema: StructType = StructType(Seq(
    StructField("s", Term.schema, nullable = true),
    StructField("p", Term.schema, nullable = true),
    StructField("o", Term.schema, nullable = true)))

  /** Column wrapper over a canonical-lex string column. */
  def parts(c: Column): Column =
    ColumnBridge.column(QuotedParts(ColumnBridge.expression(c)))

  /** Static entry point for generated code. Returns null on malformed
    * input (only reachable for non-canonical strings, which the engine
    * never produces).
    */
  def parts(lex: UTF8String): InternalRow = {
    if (lex == null) return null
    val decoded = QuotedTriple.decode(lex.toString)
    if (decoded == null) return null
    def row(t: QuotedTriple.QTerm): InternalRow = InternalRow(
      t.kind,
      if (t.lex == null) null else UTF8String.fromString(t.lex),
      if (t.dt == null) null else UTF8String.fromString(t.dt),
      if (t.lang == null) null else UTF8String.fromString(t.lang))
    InternalRow(row(decoded(0)), row(decoded(1)), row(decoded(2)))
  }
}
