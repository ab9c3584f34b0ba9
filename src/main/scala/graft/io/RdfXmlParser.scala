package graft.io

import scala.collection.mutable.ListBuffer
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** RDF/XML parser (oxigraph: lib/oxrdfxml): DOM-based, one document per
  * task (RdfIO feeds whole files, same per-FILE parallelism as Turtle —
  * RDF/XML is not line-splittable either).
  *
  * Covers the RDF/XML 1.1 grammar as modern parsers implement it:
  * rdf:RDF roots, rdf:Description and typed node elements, rdf:about /
  * rdf:ID / rdf:nodeID / fresh bnodes, property elements with
  * rdf:resource / rdf:nodeID / rdf:datatype / nested node elements /
  * text literals, rdf:parseType Resource / Collection / Literal,
  * rdf:li container membership renumbering, xml:base inheritance with
  * relative-IRI resolution, xml:lang inheritance, property-element
  * rdf:ID reification, and non-rdf property attributes as string
  * literals; entities/CDATA come free with the DOM. Deliberately
  * absent, like the reference's oxrdfxml: the RDF 1.0 attributes
  * removed in 2004 (rdf:aboutEach, rdf:aboutEachPrefix, rdf:bagID).
  * xml:base follows XML Base §4.3 (relative values resolve against the
  * parent's base; fragments are dropped at use time by RFC 3986 §5.3)
  * and rdf:datatype resolves like every other URI-reference.
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

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"RDF/XML: $msg")
  /** rdf:ID / rdf:nodeID values are NCNames. XML's NameStartChar-minus-
    * colon is exactly PN_CHARS_U and NameChar is exactly PN_CHARS|'.'
    * (same codepoint ranges in both grammars), so the shared Term
    * predicates give the exact unicode classes.
    */
  private def ncName(s: String): Boolean =
    s.nonEmpty && Term.isPnCharsU(s.head) &&
      s.tail.forall(c => Term.isPnChar(c) || c == '.')
  /** constraint-id: each rdf:ID is unique per document+base. */
  private val usedIds = scala.collection.mutable.Set[String]()
  private def registerId(resolved: String): Unit =
    if (!usedIds.add(resolved)) err(s"duplicate rdf:ID <$resolved>")
  /** RDF 1.0 attributes removed in 2004 — an error, never data. */
  private val RemovedAttrs = Seq("aboutEach", "aboutEachPrefix", "bagID")
  /** rdf:* locals that are pure syntax — forbidden as node element
    * names and as property attributes.
    */
  private val SyntaxTerms = Set("RDF", "ID", "about", "parseType",
    "resource", "nodeID", "li", "aboutEach", "aboutEachPrefix", "bagID",
    "datatype")

  /** RFC 3986 resolution (shared resolver; full merge + dot-segment
    * handling — the old per-parser approximation also misread
    * schemes without authority, e.g. urn:, as relative).
    */
  private def resolve(base: Option[String], v: String): String =
    graft.model.IriResolve.resolve(base.getOrElse(""), v)

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
    // DOCTYPE with an INTERNAL subset is legal RDF/XML and common in
    // the wild (<!ENTITY xsd "http://...#"> namespace shorthands), so
    // internal entities expand. Everything external stays off: no
    // external general/parameter entities, no external DTD fetch
    // (zero egress, no XXE), and FEATURE_SECURE_PROCESSING caps total
    // expansion (billion-laughs).
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://xml.org/sax/features/external-general-entities",
      false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities",
      false)
    f.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd",
      false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(true)
    val doc = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    val rootBase = Option(root.getAttributeNS(XmlNs, "base")).filter(_.nonEmpty)
    val nodes =
      if (qname(root) == RdfNs + "RDF") childElements(root) else Seq(root)
    nodes.foreach(n => nodeElement(n, None, rootBase))
    out.toSeq
  }

  /** Serialize an element's child nodes as literal XML (parseType
    * Literal; datatype rdf:XMLLiteral).
    */
  private def innerXml(e: org.w3c.dom.Element): String = {
    val tf = javax.xml.transform.TransformerFactory.newInstance()
      .newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION,
      "yes")
    val sw = new java.io.StringWriter()
    val nl = e.getChildNodes
    (0 until nl.getLength).foreach { i =>
      tf.transform(new javax.xml.transform.dom.DOMSource(nl.item(i)),
        new javax.xml.transform.stream.StreamResult(sw))
    }
    sw.toString
  }

  /** A node element: emits its triples, returns its subject term. */
  private def nodeElement(e: org.w3c.dom.Element, lang0: Option[String],
      base0: Option[String]): TermRow = {
    val lang = Option(e.getAttributeNS(XmlNs, "lang")).filter(_.nonEmpty)
      .map(Term.normLang).orElse(lang0)
    // XML Base §4.3: a RELATIVE xml:base resolves against the parent
    // element's base (it does not replace it verbatim); IriResolve
    // drops any base fragment at use time per RFC 3986 §5.3
    val base = Option(e.getAttributeNS(XmlNs, "base")).filter(_.nonEmpty)
      .map(b => resolve(base0, b)).orElse(base0)
    RemovedAttrs.find(e.hasAttributeNS(RdfNs, _))
      .foreach(a => err(s"rdf:$a was removed from RDF in 2004"))
    // node element names must not be syntax terms (rdf:li, rdf:RDF, …)
    if (qname(e).startsWith(RdfNs) &&
      SyntaxTerms(qname(e).stripPrefix(RdfNs)))
      err(s"<${qname(e)}> is not a node element")
    // grammar: at most ONE of rdf:about / rdf:ID / rdf:nodeID
    val idAttrs =
      Seq("about", "ID", "nodeID").filter(e.hasAttributeNS(RdfNs, _))
    if (idAttrs.length > 1)
      err(s"node element carries ${idAttrs.map("rdf:" + _).mkString(" and ")}")
    val subj =
      if (e.hasAttributeNS(RdfNs, "about"))
        iri(resolve(base, e.getAttributeNS(RdfNs, "about")))
      else if (e.hasAttributeNS(RdfNs, "ID")) {
        val id = e.getAttributeNS(RdfNs, "ID")
        if (!ncName(id)) err(s"rdf:ID '$id' is not an NCName")
        val r = resolve(base, "#" + id); registerId(r); iri(r)
      } else if (e.hasAttributeNS(RdfNs, "nodeID")) {
        val nid = e.getAttributeNS(RdfNs, "nodeID")
        if (!ncName(nid)) err(s"rdf:nodeID '$nid' is not an NCName")
        TermRow(Term.BlankKind.toByte, nid, null, null)
      } else fresh()
    if (qname(e) != RdfNs + "Description")
      out += QuadRow(DG, subj, iri(RdfNs + "type"), iri(qname(e)))
    emitPropertyAttrs(subj, propertyAttrs(e), lang, base)
    propertyElements(subj, childElements(e), lang, base)
    subj
  }

  /** Attributes of `e` matching propertyAttr (grammar §7.2.25):
    * non-syntax attrs from any namespace. rdf:Description and rdf:li
    * are excluded from propertyAttributeURIs — an error in attribute
    * position, never string-literal properties.
    */
  private def propertyAttrs(e: org.w3c.dom.Element): Seq[org.w3c.dom.Node] = {
    val attrs = e.getAttributes
    (0 until attrs.getLength).map(attrs.item).filter { a =>
      val ns = Option(a.getNamespaceURI).getOrElse("")
      if (ns == RdfNs &&
        (a.getLocalName == "Description" || a.getLocalName == "li"))
        err(s"rdf:${a.getLocalName} is not allowed as a property attribute")
      ns != XmlNs && ns != "http://www.w3.org/2000/xmlns/" &&
        a.getLocalName != null &&
        !(ns == RdfNs && SyntaxTerms(a.getLocalName)) &&
        !(ns.isEmpty && a.getLocalName == "xmlns")
    }
  }

  /** propertyAttr triples on `subj`: rdf:type takes a resolved IRI
    * object; any other attribute a plain literal carrying the
    * in-scope xml:lang (§7.2.11: literal-language = e.language).
    */
  private def emitPropertyAttrs(subj: TermRow, as: Seq[org.w3c.dom.Node],
      lang: Option[String], base: Option[String]): Unit =
    as.foreach { a =>
      val ns = Option(a.getNamespaceURI).getOrElse("")
      if (ns == RdfNs && a.getLocalName == "type")
        out += QuadRow(DG, subj, iri(RdfNs + "type"),
          iri(resolve(base, a.getNodeValue)))
      else out += QuadRow(DG, subj, iri(qname(a)), lang match {
        case Some(l) => TermRow(Term.LiteralKind.toByte, a.getNodeValue,
          Term.RdfLangString, l)
        case None => TermRow(Term.LiteralKind.toByte, a.getNodeValue,
          Term.XsdString, null)
      })
    }

  /** Property elements of one subject (shared by node elements and
    * parseType="Resource" implicit nodes). rdf:li renumbers per subject
    * element (rdf:_1, rdf:_2, ... — container membership properties).
    */
  private def propertyElements(subj: TermRow,
      pes: Seq[org.w3c.dom.Element], lang: Option[String],
      base: Option[String]): Unit = {
    var liN = 0
    pes.foreach { pe =>
      RemovedAttrs.find(pe.hasAttributeNS(RdfNs, _))
        .foreach(a => err(s"rdf:$a was removed from RDF in 2004"))
      // property element names must not be syntax terms (rdf:li aside)
      if (qname(pe).startsWith(RdfNs) && {
        val l = qname(pe).stripPrefix(RdfNs)
        l == "Description" || (l != "li" && SyntaxTerms(l))
      }) err(s"<${qname(pe)}> is not a property element")
      val pred =
        if (qname(pe) == RdfNs + "li") { liN += 1; iri(RdfNs + "_" + liN) }
        else iri(qname(pe))
      val plang = Option(pe.getAttributeNS(XmlNs, "lang")).filter(_.nonEmpty)
        .map(Term.normLang).orElse(lang)
      val pbase = Option(pe.getAttributeNS(XmlNs, "base")).filter(_.nonEmpty)
        .map(b => resolve(base, b)).orElse(base) // XML Base §4.3
      val parseType =
        Option(pe.getAttributeNS(RdfNs, "parseType")).filter(_.nonEmpty)
      // conflicting object forms on one property element
      val objAttrs = Seq("resource", "nodeID", "datatype")
        .filter(pe.hasAttributeNS(RdfNs, _))
      if (objAttrs.length > 1) err(s"property element carries " +
        objAttrs.map("rdf:" + _).mkString(" and "))
      if (parseType.isDefined && objAttrs.nonEmpty)
        err(s"rdf:parseType with rdf:${objAttrs.head}")
      // propertyAttr is only in the emptyPropertyElt production —
      // never with parseType or rdf:datatype (grammar §7.2.21)
      val pAttrs = propertyAttrs(pe)
      if (pAttrs.nonEmpty && parseType.isDefined)
        err(s"rdf:parseType with property attributes on <${qname(pe)}>")
      if (pAttrs.nonEmpty && pe.hasAttributeNS(RdfNs, "datatype"))
        err(s"rdf:datatype with property attributes on <${qname(pe)}>")
      if ((pe.hasAttributeNS(RdfNs, "resource") ||
        pe.hasAttributeNS(RdfNs, "nodeID")) && childElements(pe).nonEmpty)
        err(s"<${qname(pe)}> with rdf:${objAttrs.head} must be empty")
      if (pe.hasAttributeNS(RdfNs, "nodeID") &&
        !ncName(pe.getAttributeNS(RdfNs, "nodeID")))
        err(s"rdf:nodeID '${pe.getAttributeNS(RdfNs, "nodeID")}' " +
          "is not an NCName")
      val obj: TermRow = parseType match {
        case Some("Resource") =>
          // implicit blank node whose property elements are pe's children
          val b = fresh()
          propertyElements(b, childElements(pe), plang, pbase)
          b
        case Some("Collection") =>
          val items = childElements(pe).map(nodeElement(_, plang, pbase))
          if (items.isEmpty) iri(RdfNs + "nil")
          else {
            val cells = items.map(_ => fresh())
            for (((cell, item), idx) <- cells.zip(items).zipWithIndex) {
              out += QuadRow(DG, cell, iri(RdfNs + "first"), item)
              out += QuadRow(DG, cell, iri(RdfNs + "rest"),
                if (idx == items.size - 1) iri(RdfNs + "nil")
                else cells(idx + 1))
            }
            cells.head
          }
        // grammar §7.2.20 parseTypeOtherPropertyElt: any parseType
        // other than Resource/Collection is treated as "Literal"
        case Some(_) =>
          TermRow(Term.LiteralKind.toByte, innerXml(pe),
            RdfNs + "XMLLiteral", null)
        case None =>
          if (pe.hasAttributeNS(RdfNs, "resource")) {
            val r =
              iri(resolve(pbase, pe.getAttributeNS(RdfNs, "resource")))
            emitPropertyAttrs(r, pAttrs, plang, pbase); r
          } else if (pe.hasAttributeNS(RdfNs, "nodeID")) {
            val r = TermRow(Term.BlankKind.toByte,
              pe.getAttributeNS(RdfNs, "nodeID"), null, null)
            emitPropertyAttrs(r, pAttrs, plang, pbase); r
          } else if (pe.hasAttributeNS(RdfNs, "datatype"))
            // rdf:datatype is a URI-reference (grammar §7.2.22):
            // relative values resolve against the in-scope base
            TermRow(Term.LiteralKind.toByte, pe.getTextContent,
              resolve(pbase, pe.getAttributeNS(RdfNs, "datatype")), null)
          else if (pAttrs.nonEmpty) {
            // emptyPropertyElt with propertyAttr*: the object is an
            // implicit blank node carrying the attribute triples
            if (childElements(pe).nonEmpty || pe.getTextContent.trim.nonEmpty)
              err(s"<${qname(pe)}> with property attributes must be empty")
            val r = fresh()
            emitPropertyAttrs(r, pAttrs, plang, pbase)
            r
          }
          else childElements(pe) match {
            case Seq(nested) => nodeElement(nested, plang, pbase)
            case Seq() => plang match {
              case Some(l) => TermRow(Term.LiteralKind.toByte,
                pe.getTextContent, Term.RdfLangString, l)
              case None => TermRow(Term.LiteralKind.toByte,
                pe.getTextContent, Term.XsdString, null)
            }
            case _ => throw new IllegalArgumentException(
              s"unsupported RDF/XML property content in <${qname(pe)}>")
          }
      }
      out += QuadRow(DG, subj, pred, obj)
      // rdf:ID on a property element reifies the statement
      if (pe.hasAttributeNS(RdfNs, "ID")) {
        val id = pe.getAttributeNS(RdfNs, "ID")
        if (!ncName(id)) err(s"rdf:ID '$id' is not an NCName")
        val st = iri(resolve(pbase, "#" + id))
        registerId(st.lex)
        out += QuadRow(DG, st, iri(RdfNs + "type"), iri(RdfNs + "Statement"))
        out += QuadRow(DG, st, iri(RdfNs + "subject"), subj)
        out += QuadRow(DG, st, iri(RdfNs + "predicate"), pred)
        out += QuadRow(DG, st, iri(RdfNs + "object"), obj)
      }
    }
  }
}
