package graft.testsuite

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ListBuffer
import graft.io.RdfIO.TermRow
import graft.io.TurtleParser
import graft.model.Term

/** W3C test-suite manifest reader (reference: testsuite/src/manifest.rs ·
  * `TestManifest` — SURVEY.md provenance convention): parses the
  * `manifest.ttl` vocabulary (mf:/qt:/ut:) with the repo's own Turtle
  * parser and yields entries a harness can drive, so whole W3C suites
  * run unmodified the day a checkout is dropped into resources.
  *
  * Driver-side by design: manifests are catalog-scale documents (one
  * file naming the cases), never data-path.
  */
object W3cManifest {
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val Mf =
    "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val Qt =
    "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  private val Ut = "http://www.w3.org/2009/sparql/tests/test-update#"
  private val Rdfs = "http://www.w3.org/2000/01/rdf-schema#"

  /** A named-graph constituent of a test dataset: the file plus the
    * graph name (rdfs:label in the W3C update vocabulary; when absent
    * the harness falls back to the file's IRI, the query-suite
    * convention).
    */
  final case class GraphRef(file: Path, label: Option[String])

  /** One test case. `kind` is the local name of the rdf:type
    * (QueryEvaluationTest, PositiveSyntaxTest11, NegativeSyntaxTest11,
    * UpdateEvaluationTest, …). Paths are resolved against the manifest's
    * directory; `query` is the action file itself for syntax tests.
    * For UpdateEvaluationTest the expected RESULT is a dataset, not a
    * results file: `resultData` (default graph) + `resultGraphs`.
    */
  final case class Entry(
      id: String,
      kind: String,
      name: String,
      query: Option[Path],
      data: Option[Path],
      graphData: Seq[GraphRef],
      result: Option[Path],
      resultData: Option[Path] = None,
      resultGraphs: Seq[GraphRef] = Nil)

  def load(manifest: Path): Seq[Entry] = {
    val dir = manifest.toAbsolutePath.getParent
    val quads = new TurtleParser(Files.readString(manifest)).parse()
    def key(t: TermRow): (Byte, String) = (t.kind, t.lex)
    val bySP = quads.groupBy(q => (key(q.s), q.p.lex))
    def objs(s: TermRow, p: String): Seq[TermRow] =
      bySP.getOrElse((key(s), p), Nil).map(_.o)
    def obj(s: TermRow, p: String): Option[TermRow] = objs(s, p).headOption

    def rdfList(head: TermRow): Seq[TermRow] = {
      val out = ListBuffer[TermRow]()
      var cur = head
      var guard = 0
      while (!(cur.kind == Term.IriKind.toByte && cur.lex == Rdf + "nil") &&
        guard < 100000) {
        obj(cur, Rdf + "first").foreach(out += _)
        obj(cur, Rdf + "rest") match {
          case Some(rest) => cur = rest
          case None => return out.toSeq // malformed tail: stop cleanly
        }
        guard += 1
      }
      out.toSeq
    }

    // Manifest IRIs are file-relative (the W3C layout); the parser keeps
    // them as written, so resolve here. Fragments (`<#case>`) identify
    // entries, not files.
    def filePath(t: TermRow): Option[Path] = t match {
      case TermRow(k, lex, _, _) if k == Term.IriKind.toByte =>
        if (lex.startsWith("file:"))
          Some(Paths.get(java.net.URI.create(lex)))
        else if (lex.contains("://")) None // non-file IRI: not a local path
        else Some(dir.resolve(lex.stripPrefix("./").takeWhile(_ != '#')))
      case _ => None
    }

    def localName(iri: String): String = {
      val h = iri.lastIndexOf('#')
      if (h >= 0) iri.substring(h + 1)
      else iri.substring(iri.lastIndexOf('/') + 1)
    }

    def entryOf(e: TermRow): Entry = {
      val kind = objs(e, Rdf + "type").collectFirst {
        case t if t.kind == Term.IriKind.toByte &&
          (t.lex.startsWith(Mf) || t.lex.startsWith(Ut)) => localName(t.lex)
      }.getOrElse("")
      val name = obj(e, Mf + "name").map(_.lex)
        .getOrElse(localName(e.lex))
      val action = obj(e, Mf + "action")
      // syntax tests: the action IS the query file; eval tests: a node
      // with qt:query/ut:request + data
      val query = action.flatMap { a =>
        if (a.kind == Term.IriKind.toByte) filePath(a)
        else (obj(a, Qt + "query") orElse obj(a, Ut + "request"))
          .flatMap(filePath)
      }
      val data = action.filter(_.kind != Term.IriKind.toByte).flatMap { a =>
        (obj(a, Qt + "data") orElse obj(a, Ut + "data")).flatMap(filePath)
      }
      def graphRef(g: TermRow): Option[GraphRef] =
        if (g.kind == Term.IriKind.toByte)
          filePath(g).map(GraphRef(_, None))
        else obj(g, Ut + "graph").flatMap(filePath).map(
          GraphRef(_, obj(g, Rdfs + "label").map(_.lex)))
      val graphData = action.toSeq
        .filter(_.kind != Term.IriKind.toByte)
        .flatMap(a => objs(a, Qt + "graphData") ++ objs(a, Ut + "graphData"))
        .flatMap(graphRef)
      val resultNode = obj(e, Mf + "result")
      val result = resultNode.flatMap(filePath)
      val resultData = resultNode
        .filter(_.kind != Term.IriKind.toByte)
        .flatMap(r => obj(r, Ut + "data").flatMap(filePath))
      val resultGraphs = resultNode.toSeq
        .filter(_.kind != Term.IriKind.toByte)
        .flatMap(r => objs(r, Ut + "graphData")).flatMap(graphRef)
      Entry(e.lex, kind, name, query, data, graphData, result,
        resultData, resultGraphs)
    }

    val manifests = quads.collect {
      case q if q.p.lex == Rdf + "type" &&
        q.o.kind == Term.IriKind.toByte &&
        q.o.lex == Mf + "Manifest" => q.s
    }.distinct
    val fromIncludes = manifests
      .flatMap(m => obj(m, Mf + "include")).flatMap(rdfList)
      .flatMap(filePath).filter(Files.exists(_)).flatMap(load)
    val own = manifests
      .flatMap(m => obj(m, Mf + "entries")).flatMap(rdfList)
      .map(entryOf)
    own ++ fromIncludes
  }
}
