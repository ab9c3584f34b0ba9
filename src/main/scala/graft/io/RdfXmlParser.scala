package graft.io

import scala.collection.mutable.ListBuffer
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** RDF/XML parser (oxigraph: lib/oxrdfxml): DOM-based, one document per
  * task (RdfIO feeds whole files, same per-FILE parallelism as Turtle —
  * RDF/XML is not line-splittable either).
  *
  * Subset: rdf:RDF roots, rdf:Description and typed node elements,
  * rdf:about / rdf:nodeID / fresh bnodes, property elements with
  * rdf:resource / rdf:nodeID / rdf:datatype / nested node elements /
  * text literals, xml:lang inheritance, non-rdf property attributes as
  * string literals. Not yet: rdf:parseType (Resource/Collection/Literal),
  * rdf:li / containers, rdf:ID / xml:base relative resolution, reification.
  */
final class RdfXmlParser(content: String) {
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"
  private val out = ListBuffer[QuadRow]()
  private var bn = 0
  private val DG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)

  private def fresh(): TermRow = {
    bn += 1
    TermRow(Term.BlankKind.toByte, s"rx$bn", null, null)
  }
  private def iri(v: String) = TermRow(Term.IriKind.toByte, v, null, null)

  private def childElements(e: org.w3c.dom.Element): Seq[org.w3c.dom.Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item)
      .collect { case el: org.w3c.dom.Element => el }
  }

  private def qname(e: org.w3c.dom.Node): String =
    Option(e.getNamespaceURI).getOrElse("") + e.getLocalName

  def parse(): Seq[QuadRow] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // no DTDs: entity expansion is an attack surface, not a feature
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    val nodes =
      if (qname(root) == RdfNs + "RDF") childElements(root) else Seq(root)
    nodes.foreach(n => nodeElement(n, None))
    out.toSeq
  }

  /** A node element: emits its triples, returns its subject term. */
  private def nodeElement(e: org.w3c.dom.Element,
      lang0: Option[String]): TermRow = {
    val lang = Option(e.getAttributeNS(XmlNs, "lang")).filter(_.nonEmpty)
      .orElse(lang0)
    val subj =
      if (e.hasAttributeNS(RdfNs, "about")) iri(e.getAttributeNS(RdfNs, "about"))
      else if (e.hasAttributeNS(RdfNs, "nodeID"))
        TermRow(Term.BlankKind.toByte, e.getAttributeNS(RdfNs, "nodeID"),
          null, null)
      else fresh()
    if (qname(e) != RdfNs + "Description")
      out += QuadRow(DG, subj, iri(RdfNs + "type"), iri(qname(e)))
    // property attributes (non-rdf, non-xmlns, non-xml:lang)
    val attrs = e.getAttributes
    (0 until attrs.getLength).map(attrs.item).foreach { a =>
      val ns = Option(a.getNamespaceURI).getOrElse("")
      if (ns != RdfNs && ns != XmlNs &&
        ns != "http://www.w3.org/2000/xmlns/" && a.getLocalName != null &&
        !(ns.isEmpty && a.getLocalName == "xmlns"))
        out += QuadRow(DG, subj, iri(qname(a)),
          TermRow(Term.LiteralKind.toByte, a.getNodeValue,
            Term.XsdString, null))
    }
    // property elements
    childElements(e).foreach { pe =>
      val pred = iri(qname(pe))
      val plang = Option(pe.getAttributeNS(XmlNs, "lang")).filter(_.nonEmpty)
        .orElse(lang)
      val obj: TermRow =
        if (pe.hasAttributeNS(RdfNs, "resource"))
          iri(pe.getAttributeNS(RdfNs, "resource"))
        else if (pe.hasAttributeNS(RdfNs, "nodeID"))
          TermRow(Term.BlankKind.toByte, pe.getAttributeNS(RdfNs, "nodeID"),
            null, null)
        else if (pe.hasAttributeNS(RdfNs, "datatype"))
          TermRow(Term.LiteralKind.toByte, pe.getTextContent,
            pe.getAttributeNS(RdfNs, "datatype"), null)
        else childElements(pe) match {
          case Seq(nested) => nodeElement(nested, plang)
          case Seq() => plang match {
            case Some(l) => TermRow(Term.LiteralKind.toByte,
              pe.getTextContent, Term.RdfLangString, l)
            case None => TermRow(Term.LiteralKind.toByte,
              pe.getTextContent, Term.XsdString, null)
          }
          case _ => throw new IllegalArgumentException(
            s"unsupported RDF/XML property content in <${qname(pe)}>")
        }
      out += QuadRow(DG, subj, pred, obj)
    }
    subj
  }
}
