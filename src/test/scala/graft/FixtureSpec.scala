package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{RdfIO, Results}
import graft.parser.SparqlParser
import graft.testsuite.W3cManifest

/** Golden fixtures, driven by a W3C-style manifest (FIXTURES.md §C;
  * reference: testsuite/src/manifest.rs + sparql_evaluator.rs): the
  * cases in src/test/resources/sparql are listed in manifest.ttl using
  * the mf:/qt: vocabulary, parsed by W3cManifest with the repo's own
  * Turtle parser. Dropping a W3C suite checkout (its manifest + files)
  * into resources runs it unmodified.
  *
  * QueryEvaluationTest: data + query vs expected results (TSV or XML
  * result formats). Ordered queries (ORDER BY) compare exact row order;
  * others compare as multisets. Positive/NegativeSyntaxTest kinds:
  * the query must parse / must be rejected.
  */
class FixtureSpec extends AnyFunSuite {
  import TestSpark._

  private val manifest =
    Paths.get(getClass.getResource("/sparql/manifest.ttl").toURI)
  private val entries = W3cManifest.load(manifest)

  assert(entries.nonEmpty, "manifest.ttl yielded no entries")

  private def read(p: Path): String = Files.readString(p)

  private def fmt(p: Path): String = {
    val n = p.toString; n.substring(n.lastIndexOf('.') + 1)
  }

  /** Assemble a test dataset: default-graph file + labeled named-graph
    * files (rdfs:label, or the file IRI when unlabeled — the W3C
    * query-suite convention).
    */
  private def dataset(default: Option[Path],
      graphs: Seq[W3cManifest.GraphRef]) = {
    import org.apache.spark.sql.functions.col
    val base = default
      .map(p => RdfIO.read(spark, p.toString, fmt(p)))
      .getOrElse(GraftStore.empty(spark).quads)
    graphs.foldLeft(base) { (acc, g) =>
      val label = g.label.getOrElse(g.file.toUri.toString)
      acc.unionByName(RdfIO.read(spark, g.file.toString, fmt(g.file))
        .withColumn("g", graft.model.Term.iri(label)))
    }
  }

  /** Canonical N-Quads lines (sorted): dataset equality for bnode-free
    * fixtures — the W3C compare is graph isomorphism, which coincides
    * on ground data.
    */
  private def canon(quads: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    import graft.model.Term
    quads.select(concat(
      RdfIO.formatTerm(col("s")), lit(" "),
      RdfIO.formatTerm(col("p")), lit(" "),
      RdfIO.formatTerm(col("o")),
      when(col("g")("kind") === Term.DefaultGraphKind, lit(""))
        .otherwise(concat(lit(" "), RdfIO.formatTerm(col("g")))),
      lit(" .")).as("v"))
      .collect().map(_.getString(0)).sorted.toSeq
  }

  for (e <- entries.sortBy(_.name)) e.kind match {
    case "UpdateEvaluationTest" =>
      test(s"fixture: ${e.name} (update eval)") {
        val req = read(e.query.getOrElse(fail(s"${e.name}: no request")))
        val got = GraftStore(dataset(e.data, e.graphData))
          .update(req).quads
        val want = dataset(e.resultData, e.resultGraphs)
        // bnode-tolerant: canonical labels first (ground data unaffected)
        val (cg, cw) = (canon(graft.model.Canon.canonicalize(got)),
          canon(graft.model.Canon.canonicalize(want)))
        assert(cg == cw,
          s"update result dataset differs:\ngot  $cg\nwant $cw")
      }
    case "QueryEvaluationTest" =>
      test(s"fixture: ${e.name}") {
        val query = read(e.query.getOrElse(fail(s"${e.name}: no query")))
        // dataset: default-graph file (any RDF format by extension) +
        // qt:graphData named graphs
        assert(e.data.nonEmpty || e.graphData.nonEmpty,
          s"${e.name}: no data")
        val quads = dataset(e.data, e.graphData)
        val sols = SparqlParser.execute(query, quads)
        val resultFile = e.result.getOrElse(fail(s"${e.name}: no result"))
        val rfName = resultFile.toString
        if (rfName.endsWith(".nt") || rfName.endsWith(".ttl")) {
          // graph result (CONSTRUCT/DESCRIBE): compare by isomorphism —
          // bnodes in the template/result are matched via canonical
          // labels, the W3C comparison semantics
          import org.apache.spark.sql.functions.col
          val gotQuads = sols.select(
            graft.model.Term.defaultGraph.as("g"),
            col("s"), col("p"), col("o"))
          val want = RdfIO.read(spark, rfName, fmt(resultFile))
          val (cg, cw) = (canon(graft.model.Canon.canonicalize(gotQuads)),
            canon(graft.model.Canon.canonicalize(want)))
          assert(cg == cw,
            s"graphs not isomorphic:\ngot  $cg\nwant $cw")
        } else {
          val ordered = query.toUpperCase.contains("ORDER BY")
          val expectedTsv = resultFile.toString match {
            case f if f.endsWith(".tsv") => read(resultFile)
            case f if f.endsWith(".srx") || f.endsWith(".xml") =>
              // normalize XML expected results through the engine's own
              // TSV writer so both sides share one canonical form
              Results.toTsv(Results.fromXml(spark, read(resultFile)))
            case f => fail(s"${e.name}: unsupported result format $f")
          }
          val got = Results.toTsv(sols)
          def rows(s: String): Seq[String] =
            s.split("\r\n").toSeq.filter(_.nonEmpty)
          val (g, x) = (rows(got), rows(expectedTsv))
          assert(g.head == x.head, s"header mismatch: ${g.head} vs ${x.head}")
          if (ordered) assert(g == x, s"ordered rows differ:\ngot  $g\nwant $x")
          else assert(g.tail.sorted == x.tail.sorted,
            s"row multisets differ:\ngot  ${g.tail.sorted}\nwant ${x.tail.sorted}")
        }
      }
    case k if k.startsWith("PositiveSyntaxTest") =>
      test(s"fixture: ${e.name} (positive syntax)") {
        SparqlParser.parse(
          read(e.query.getOrElse(fail(s"${e.name}: no query"))))
      }
    case k if k.startsWith("NegativeSyntaxTest") =>
      test(s"fixture: ${e.name} (negative syntax)") {
        intercept[Exception] {
          SparqlParser.parse(
            read(e.query.getOrElse(fail(s"${e.name}: no query"))))
        }
      }
    case k if k.startsWith("PositiveUpdateSyntaxTest") =>
      test(s"fixture: ${e.name} (positive update syntax)") {
        SparqlParser.parseUpdateText(
          read(e.query.getOrElse(fail(s"${e.name}: no request"))))
      }
    case k if k.startsWith("NegativeUpdateSyntaxTest") =>
      test(s"fixture: ${e.name} (negative update syntax)") {
        intercept[Exception] {
          SparqlParser.parseUpdateText(
            read(e.query.getOrElse(fail(s"${e.name}: no request"))))
        }
      }
    case other =>
      test(s"fixture: ${e.name}") {
        cancel(s"manifest test kind not supported yet: '$other'")
      }
  }
}
