package graft.io

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** JSON-LD parser, EXPANDED FORM ONLY (oxigraph: lib/oxjsonld). Full
  * JSON-LD requires @context processing (remote contexts, term
  * definitions, compaction rules) — out of scope offline; expanded
  * documents (arrays of node objects with absolute-IRI keys, @value /
  * @id / @type / @language / @graph / @list) cover the interchange
  * format produced by jsonld.expand() everywhere.
  */
final class JsonLdParser(content: String) {
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val out = ListBuffer[QuadRow]()
  private var bn = 0
  private val DG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)

  private def fresh(): TermRow = {
    bn += 1
    TermRow(Term.BlankKind.toByte, s"jb$bn", null, null)
  }
  private def ref(id: String): TermRow =
    if (id.startsWith("_:"))
      TermRow(Term.BlankKind.toByte, id.substring(2), null, null)
    else TermRow(Term.IriKind.toByte, id, null, null)
  private def iri(v: String) = TermRow(Term.IriKind.toByte, v, null, null)

  def parse(): Seq[QuadRow] = {
    val root = new ObjectMapper().readTree(content)
    val nodes = if (root.isArray) root.elements.asScala.toSeq else Seq(root)
    nodes.foreach(n => nodeObject(n, DG))
    out.toSeq
  }

  /** Scalar JSON -> RDF literal (JSON-LD value coercion rules). */
  private def scalarLit(v: JsonNode): TermRow =
    if (v.isBoolean)
      TermRow(Term.LiteralKind.toByte, v.asBoolean.toString,
        Term.XsdBoolean, null)
    else if (v.isIntegralNumber)
      TermRow(Term.LiteralKind.toByte, v.asLong.toString,
        Term.XsdInteger, null)
    else if (v.isNumber)
      TermRow(Term.LiteralKind.toByte, v.asDouble.toString,
        Term.XsdDouble, null)
    else TermRow(Term.LiteralKind.toByte, v.asText, Term.XsdString, null)

  /** One value entry of a property -> term (emitting nested triples). */
  private def valueTerm(v: JsonNode, g: TermRow): TermRow =
    if (v.isObject) {
      if (v.has("@value")) {
        val lex = v.get("@value")
        if (v.has("@type"))
          TermRow(Term.LiteralKind.toByte, lex.asText,
            v.get("@type").asText, null)
        else if (v.has("@language"))
          TermRow(Term.LiteralKind.toByte, lex.asText, Term.RdfLangString,
            v.get("@language").asText)
        else scalarLit(lex)
      } else if (v.has("@list")) {
        val items = v.get("@list").elements.asScala.toSeq
        if (items.isEmpty) iri(RdfNs + "nil")
        else {
          val nodes = items.map(_ => fresh())
          for (((n, item), idx) <- nodes.zip(items).zipWithIndex) {
            out += QuadRow(g, n, iri(RdfNs + "first"), valueTerm(item, g))
            out += QuadRow(g, n, iri(RdfNs + "rest"),
              if (idx == items.size - 1) iri(RdfNs + "nil")
              else nodes(idx + 1))
          }
          nodes.head
        }
      } else nodeObject(v, g) // node object (possibly just {"@id": ...})
    } else scalarLit(v)

  /** A node object: emits its triples into graph `g`, returns subject. */
  private def nodeObject(n: JsonNode, g: TermRow): TermRow = {
    val subj =
      if (n.has("@id")) ref(n.get("@id").asText) else fresh()
    if (n.has("@type"))
      asArray(n.get("@type")).foreach(t =>
        out += QuadRow(g, subj, iri(RdfNs + "type"), ref(t.asText)))
    if (n.has("@graph"))
      asArray(n.get("@graph")).foreach(child => nodeObject(child, subj))
    n.fields.asScala.foreach { e =>
      val key = e.getKey
      if (!key.startsWith("@"))
        asArray(e.getValue).foreach { v =>
          out += QuadRow(g, subj, iri(key), valueTerm(v, g))
        }
    }
    subj
  }

  private def asArray(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) n.elements.asScala.toSeq else Seq(n)
}
