package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra.Algebra._
import graft.exec.{ServiceExec, Translator}
import graft.io.TpchRdf
import graft.io.TpchRdf.P
import graft.parser.SparqlParser

/** SERVICE federation (SURVEY.md §2.12; oxigraph: lib/spareval/src/
  * service.rs · ServiceHandler + SPARQL 1.1 Federated Query §18.8).
  * This build has no HTTP client, so behavior matches the reference
  * compiled without `http-client`: unhandled SERVICE errors, SERVICE
  * SILENT degrades to the unit solution, and a registered handler
  * evaluates the body locally.
  */
class ServiceSpec extends AnyFunSuite {
  import TestSpark._

  private val prologue = s"PREFIX : <${TpchRdf.ns}>\n"

  test("parser: SERVICE and SERVICE SILENT with iri and var endpoints") {
    val q = SparqlParser.parse(prologue +
      "SELECT ?s WHERE { SERVICE <http://ex.org/sparql> { ?s :p ?o } }")
    val Select(p1) = q: @unchecked
    def findService(gp: GraphPattern): Option[Service] = gp match {
      case s: Service => Some(s)
      case Join(l, r) => findService(l).orElse(findService(r))
      case Project(i, _) => findService(i)
      case Filter(_, i) => findService(i)
      case _ => None
    }
    val Some(s1) = findService(p1): @unchecked
    assert(s1.name == I("http://ex.org/sparql") && !s1.silent)

    val q2 = SparqlParser.parse(prologue +
      "SELECT ?s WHERE { ?s :p ?e . SERVICE SILENT ?e { ?s :q ?o } }")
    val Select(p2) = q2: @unchecked
    val Some(s2) = findService(p2): @unchecked
    assert(s2.name == V("e") && s2.silent)
  }

  test("unregistered SERVICE throws; variable endpoint throws") {
    val quads = TpchRdf.quads(spark, sf)
    val ex = intercept[UnsupportedOperationException] {
      SparqlParser.execute(prologue +
        "SELECT ?n WHERE { SERVICE <http://nowhere.example/> { ?n :name ?x } }",
        quads).collect()
    }
    assert(ex.getMessage.contains("no handler"))
    intercept[UnsupportedOperationException] {
      SparqlParser.execute(prologue +
        "SELECT ?n WHERE { ?n :name ?x . SERVICE ?n { ?n :name ?x } }",
        quads).collect()
    }
  }

  test("SERVICE SILENT with no handler is the unit solution (join identity)") {
    val quads = TpchRdf.quads(spark, sf)
    val base = SparqlParser.execute(prologue +
      "SELECT ?rn WHERE { ?r :inRegion ?g . ?g :name ?rn }", quads)
      .select(col("rn")("lex")).collect().map(_.getString(0)).sorted
    val withSilent = SparqlParser.execute(prologue +
      """SELECT ?rn WHERE { ?r :inRegion ?g . ?g :name ?rn .
           SERVICE SILENT <http://nowhere.example/> { ?z :nope ?w } }""",
      quads).select(col("rn")("lex")).collect().map(_.getString(0)).sorted
    assert(withSilent.sameElements(base))
  }

  test("pq22_service gate query matches the relational oracle shape") {
    val got = SparkEntry.queries("pq22_service")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cust = graft.io.Tables(spark, sf, "customer")
    val nat = graft.io.Tables(spark, sf, "nation")
    val want = cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_name"), col("n_name")).orderBy(col("c_name"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("custom function call by IRI through the text pipeline") {
    val quads = TpchRdf.quads(spark, sf)
    graft.expr.SparqlExpr.registerFunction(TpchRdf.ns + "fn/shout", args =>
      graft.model.Term.strLit(
        concat(upper(args(0)("lex")), args(1)("lex"))))
    val got = SparqlParser.execute(prologue +
      """SELECT ?rn ?d WHERE {
           ?r :inRegion ?g . ?g :name ?rn .
           BIND(<http://example.org/fn/shout>(?rn, "!") AS ?d)
         } ORDER BY ?rn""", quads)
      .select(col("rn")("lex"), col("d")("lex"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.nonEmpty &&
      got.forall { case (rn, d) => d == rn.toUpperCase + "!" })
  }

  test("registered handler evaluates the body and joins on shared vars") {
    val quads = TpchRdf.quads(spark, sf)
    ServiceExec.register("local:test-nations", (gp, sp) =>
      Translator.translate(gp, TpchRdf.quads(sp, sf)).df)
    try {
      val got = SparqlParser.execute(prologue +
        """SELECT ?nname WHERE {
             ?n :inRegion ?r . SERVICE <local:test-nations> { ?n :name ?nname }
           } ORDER BY ?nname""", quads)
        .select(col("nname")("lex")).collect().map(_.getString(0))
      val want = Translator.translate(
        Bgp(TriplePattern(V("n"), I(P("inRegion")), V("r")),
          TriplePattern(V("n"), I(P("name")), V("nname"))), quads)
        .df.select(col("nname")("lex")).collect().map(_.getString(0)).sorted
      assert(got.sameElements(want))
    } finally ServiceExec.unregister("local:test-nations")
  }
}
