package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algebra.Algebra._
import graft.expr.SparqlExpr
import graft.io.{Tables, TpchRdf}
import graft.io.TpchRdf.P
import graft.model.Term

/** Custom aggregate surface (SURVEY.md §2.12, the reference's
  * with_custom_aggregate_function): registered aggregates run inside the
  * engine's Group node, built either from functions.* aggregates or a
  * typed Aggregator via functions.udaf.
  */
class CustomAggSpec extends AnyFunSuite {
  import TestSpark._

  /** Longest lexical form; ties broken by max string (deterministic). */
  private object LongestLex extends Aggregator[String, String, String] {
    def zero: String = ""
    def reduce(b: String, a: String): String =
      if (a == null) b
      else if (a.length > b.length || (a.length == b.length && a > b)) a
      else b
    def merge(x: String, y: String): String = reduce(x, y)
    def finish(r: String): String = r
    def bufferEncoder = org.apache.spark.sql.Encoders.STRING
    def outputEncoder = org.apache.spark.sql.Encoders.STRING
  }

  test("registered custom aggregates evaluate inside Group") {
    import spark.implicits._
    SparqlExpr.registerAggregate("LEX_COUNT_DISTINCT",
      (c, _) => Term.intLit(countDistinct(c("lex"))))
    SparqlExpr.registerAggregate("LONGEST_LEX",
      (c, _) => Term.strLit(udaf(LongestLex).apply(c("lex"))))

    val gp = Group(
      Bgp(TriplePattern(V("c"), I(P("inNation")), V("n")),
        TriplePattern(V("c"), I(P("name")), V("cname"))),
      Seq("n"),
      Seq("cnt" -> AggCall("LEX_COUNT_DISTINCT", Some(EVar("cname"))),
        "big" -> AggCall("LONGEST_LEX", Some(EVar("cname")))))
    val got = graft.exec.Translator
      .translate(gp, TpchRdf.quads(spark, sf)).df
      .select(
        element_at(split(col("n")("lex"), "/"), -1).cast("long").as("nk"),
        col("cnt")("lex").cast("long").as("cnt"),
        col("big")("lex").as("big"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .toMap

    val expected = Tables(spark, sf, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nk"))
      .agg(countDistinct(col("c_name")).as("cnt"),
        max_by(col("c_name"),
          struct(length(col("c_name")), col("c_name"))).as("big"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .toMap

    assert(got == expected)
  }

  test("unregistered aggregate still fails loudly") {
    val gp = Group(Bgp(TriplePattern(V("c"), I(P("name")), V("x"))),
      Nil, Seq("out" -> AggCall("NO_SUCH_AGG", Some(EVar("x")))))
    intercept[IllegalArgumentException] {
      graft.exec.Translator.translate(gp, TpchRdf.quads(spark, sf))
    }
  }
}
