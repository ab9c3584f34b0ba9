package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.SparqlExpr
import graft.io.{Results, TpchRdf}
import graft.model.Term
import graft.parser.SparqlParser

class ResultsSpec extends AnyFunSuite {
  import TestSpark._

  lazy val sols = SparqlParser.execute(
    s"""PREFIX : <${TpchRdf.ns}>
       SELECT ?rn ?l WHERE { ?r :name ?rn ; :label ?l .
         FILTER(LANGMATCHES(LANG(?l), "de")) } ORDER BY ?rn""",
    TpchRdf.quads(spark, sf))

  test("SPARQL JSON results format") {
    val json = Results.toJson(sols)
    assert(json.startsWith("""{"head":{"vars":["rn","l"]}"""))
    assert(json.contains(""""type":"literal""""))
    assert(json.contains(""""xml:lang":"de""""))
    // 5 regions -> 5 bindings
    assert("\"rn\":".r.findAllIn(json).length == 5)
  }

  test("CSV and TSV results formats") {
    val csv = Results.toCsv(sols)
    assert(csv.startsWith("rn,l\r\n"))
    assert(csv.contains("AFRICA,africa"))
    val tsv = Results.toTsv(sols)
    assert(tsv.startsWith("?rn\t?l\r\n"))
    assert(tsv.contains("\"AFRICA\"\t\"africa\"@de"))
  }

  test("custom function registry (with_custom_function parity)") {
    SparqlExpr.registerFunction("urn:graft:shout",
      args => SparqlExpr.fn("UCASE", args))
    val c = SparqlExpr.fn("urn:graft:shout", Seq(Term.strLit(lit("abc"))))
    val r = spark.range(1).select(c("lex")).head.getString(0)
    assert(r == "ABC")
    intercept[IllegalArgumentException](SparqlExpr.fn("urn:none", Nil))
  }
}
