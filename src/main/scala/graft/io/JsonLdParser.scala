package graft.io

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** JSON-LD parser (oxigraph: lib/oxjsonld): expanded form plus LOCAL
  * `@context` processing — term definitions (string and expanded form
  * with @id / @type / @language / @container), prefix (compact-IRI)
  * expansion, @vocab and @base, default @language, keyword aliases,
  * context arrays and null-resets, nested node-object contexts
  * (inherit + override), and scoped contexts (property-scoped via a
  * term definition's @context, type-scoped via a matched @type's term
  * definition). Remote contexts (a string entry in @context) are
  * rejected — zero egress; the one documented deviation.
  */
final class JsonLdParser(content: String) {
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val out = ListBuffer[QuadRow]()
  private var bn = 0
  private val DG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)

  /** One term definition from an @context. `typ` is "@id" or a datatype
    * IRI; `container` is "@list" when list-coercing; `reverse` terms
    * ({"@reverse": iri}) emit their triples object-to-subject.
    */
  private case class TermDef(iri: String, typ: Option[String] = None,
      lang: Option[String] = None, container: Option[String] = None,
      scoped: Option[JsonNode] = None, reverse: Boolean = false)

  /** Active context. `aliases` maps user keys to JSON-LD keywords. */
  private case class Ctx(terms: Map[String, TermDef] = Map.empty,
      vocab: Option[String] = None, base: Option[String] = None,
      lang: Option[String] = None, aliases: Map[String, String] = Map.empty) {

    def keyword(key: String): String = aliases.getOrElse(key, key)

    /** Expand a property key to an absolute IRI (None = drop, per the
      * JSON-LD algorithm for unmapped keys without @vocab).
      */
    def expandKey(key: String): Option[String] =
      terms.get(key).map(_.iri).orElse {
        val c = key.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (key.substring(0, c), key.substring(c + 1))
          if (local.startsWith("//")) Some(key) // absolute like http://
          else terms.get(pfx).map(_.iri + local).orElse(Some(key))
        } else vocab.map(_ + key)
      }

    /** Expand an @id / @type VALUE (base-relative, compact, or term). */
    def expandRef(v: String): String =
      if (v.startsWith("_:")) v
      else terms.get(v).map(_.iri).getOrElse {
        val c = v.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (v.substring(0, c), v.substring(c + 1))
          if (local.startsWith("//")) v
          else terms.get(pfx).map(_.iri + local).getOrElse(v)
        } else base.map(b => resolve(b, v)).getOrElse(v)
      }

    private def resolve(b: String, rel: String): String =
      graft.model.IriResolve.resolve(b, rel) // shared RFC 3986 resolver
  }

  private def parseContext(node: JsonNode, parent: Ctx): Ctx = {
    if (node.isNull) return Ctx() // null context resets
    if (node.isArray)
      return node.elements.asScala.foldLeft(parent)((c, n) =>
        parseContext(n, c))
    if (node.isTextual)
      throw new IllegalArgumentException(
        s"remote @context not supported (zero egress): ${node.asText}")
    var ctx = parent
    node.fields.asScala.foreach { e =>
      (e.getKey, e.getValue) match {
        case ("@vocab", v) =>
          ctx = ctx.copy(vocab = if (v.isNull) None else Some(v.asText))
        case ("@base", v) =>
          ctx = ctx.copy(base = if (v.isNull) None else Some(v.asText))
        case ("@language", v) =>
          ctx = ctx.copy(lang =
            if (v.isNull) None else Some(Term.normLang(v.asText)))
        case ("@version", _) => // 1.1 marker, nothing to do
        case (term, v) if v.isTextual && v.asText.startsWith("@") =>
          ctx = ctx.copy(aliases = ctx.aliases + (term -> v.asText))
        case (term, v) if v.isTextual =>
          ctx = ctx.copy(terms =
            ctx.terms + (term -> TermDef(ctx.expandRef(v.asText))))
        case (term, v) if v.isObject =>
          val rev = v.has("@reverse")
          if (rev && v.has("@id"))
            err(s"term '$term' has both @reverse and @id")
          val id =
            if (rev) ctx.expandRef(v.get("@reverse").asText)
            else if (v.has("@id")) ctx.expandRef(v.get("@id").asText)
            else ctx.expandKey(term).getOrElse(term)
          val typ = Option(v.get("@type")).map(_.asText)
            .map(t => if (t == "@id" || t == "@vocab") "@id"
                      else if (t == "@json") "@json"
                      else ctx.expandRef(t))
          val lang = Option(v.get("@language"))
            .map(l => if (l.isNull) "" else Term.normLang(l.asText))
          val cont = Option(v.get("@container")).map(_.asText)
          if (rev && (cont.contains("@list") || cont.contains("@language")))
            err(s"term '$term': @reverse with ${cont.get} container")
          // scoped (term-level) context: raw node kept, parsed against
          // the ACTIVE context at each use site (property or type)
          val scoped = Option(v.get("@context"))
          ctx = ctx.copy(terms = ctx.terms +
            (term -> TermDef(id, typ, lang, cont, scoped, rev)))
        case _ =>
      }
    }
    ctx
  }

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"JSON-LD: $msg")

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
    nodes.foreach(n => nodeObject(n, DG, Ctx()))
    out.toSeq
  }

  /** Scalar JSON -> RDF literal (JSON-LD value coercion rules), shaped
    * by the property's term definition / context default language.
    */
  private def scalarLit(v: JsonNode, td: Option[TermDef],
      ctx: Ctx): TermRow =
    if (v.isBoolean)
      TermRow(Term.LiteralKind.toByte, v.asBoolean.toString,
        Term.XsdBoolean, null)
    else if (v.isIntegralNumber)
      TermRow(Term.LiteralKind.toByte, v.asLong.toString,
        Term.XsdInteger, null)
    else if (v.isNumber)
      TermRow(Term.LiteralKind.toByte, v.asDouble.toString,
        Term.XsdDouble, null)
    else td.flatMap(_.typ) match {
      case Some("@id") => ref(ctx.expandRef(v.asText))
      case Some(dt) => TermRow(Term.LiteralKind.toByte, v.asText, dt, null)
      case None =>
        // term language ("" clears the default) else context default
        val lang = td.flatMap(_.lang).orElse(ctx.lang).filter(_.nonEmpty)
        lang match {
          case Some(l) =>
            TermRow(Term.LiteralKind.toByte, v.asText, Term.RdfLangString, l)
          case None =>
            TermRow(Term.LiteralKind.toByte, v.asText, Term.XsdString, null)
        }
    }

  /** JCS-style canonical JSON for rdf:JSON literals: object keys
    * sorted, no whitespace, strings JSON-escaped. Numbers: integrals
    * minimal, doubles via Double.toString — a documented deviation
    * from full ES6 shortest-round-trip serialization for exotic
    * floating values.
    */
  private def canonicalJson(n: JsonNode): String =
    if (n.isObject)
      n.fields.asScala.toSeq.sortBy(_.getKey).map(e =>
        com.fasterxml.jackson.databind.node.TextNode.valueOf(e.getKey)
          .toString + ":" + canonicalJson(e.getValue))
        .mkString("{", ",", "}")
    else if (n.isArray)
      n.elements.asScala.map(canonicalJson).mkString("[", ",", "]")
    else if (n.isTextual)
      com.fasterxml.jackson.databind.node.TextNode.valueOf(n.asText).toString
    else if (n.isNull) "null"
    else if (n.isBoolean) n.asBoolean.toString
    else if (n.isIntegralNumber) n.asLong.toString
    else n.asDouble.toString

  /** One value entry of a property -> term (emitting nested triples). */
  private def valueTerm(v: JsonNode, g: TermRow, ctx: Ctx,
      td: Option[TermDef]): TermRow =
    // {"@type": "@json"} coercion: the WHOLE value — scalar, array, or
    // object, even value-object-shaped — is an rdf:JSON literal
    if (td.exists(_.typ.contains("@json")))
      TermRow(Term.LiteralKind.toByte, canonicalJson(v),
        RdfNs + "JSON", null)
    else if (v.isObject) {
      val vk = ctx.keyword _
      val valueKey = v.fieldNames.asScala.find(k => vk(k) == "@value")
      val listKey = v.fieldNames.asScala.find(k => vk(k) == "@list")
      if (valueKey.isDefined) {
        val lex = v.get(valueKey.get)
        val typeKey = v.fieldNames.asScala.find(k => vk(k) == "@type")
        val langKey = v.fieldNames.asScala.find(k => vk(k) == "@language")
        // value object validity (JSON-LD 1.1 §9.5): only @value/@type/
        // @language/@direction/@index keys; @type and @language are
        // exclusive; @value must be a scalar (null = drop the entry)
        val allowed = Set("@value", "@type", "@language", "@direction",
          "@index")
        v.fieldNames.asScala.find(k => !allowed(vk(k)))
          .foreach(k => err(s"invalid value object key '$k'"))
        if (typeKey.isDefined && langKey.isDefined)
          err("@value with both @type and @language")
        // {"@value": ..., "@type": "@json"}: ANY JSON value is legal
        // and becomes an rdf:JSON literal in canonical form
        val jsonTyped = typeKey.exists(k =>
          v.get(k).isTextual && vk(v.get(k).asText) == "@json")
        if (lex.isContainerNode && !jsonTyped)
          err("@value must be a scalar or null")
        if (jsonTyped)
          TermRow(Term.LiteralKind.toByte, canonicalJson(lex),
            RdfNs + "JSON", null)
        else if (lex.isNull) null
        else if (typeKey.isDefined)
          TermRow(Term.LiteralKind.toByte, lex.asText,
            ctx.expandRef(v.get(typeKey.get).asText), null)
        else if (langKey.isDefined)
          TermRow(Term.LiteralKind.toByte, lex.asText, Term.RdfLangString,
            Term.normLang(v.get(langKey.get).asText))
        else scalarLit(lex, None, Ctx()) // explicit @value: no coercion
      } else if (listKey.isDefined) listTerm(
        v.get(listKey.get).elements.asScala.toSeq, g, ctx, td)
      else nodeObject(v, g, ctx) // node object (possibly just {"@id"})
    } else if (td.exists(_.container.contains("@list")) && v.isArray)
      listTerm(v.elements.asScala.toSeq, g, ctx, td)
    else scalarLit(v, td, ctx)

  private def listTerm(items: Seq[JsonNode], g: TermRow, ctx: Ctx,
      td: Option[TermDef]): TermRow = {
    val itemTd = td.map(_.copy(container = None))
    // evaluate items FIRST: a {"@value": null} entry yields a null
    // term and drops out of the list exactly like a bare JSON null
    val terms = items.filterNot(_.isNull)
      .map(valueTerm(_, g, ctx, itemTd)).filter(_ != null)
    terms match {
      case Seq() => iri(RdfNs + "nil")
      case live =>
        val nodes = live.map(_ => fresh())
        for (((n, t), idx) <- nodes.zip(live).zipWithIndex) {
          out += QuadRow(g, n, iri(RdfNs + "first"), t)
          out += QuadRow(g, n, iri(RdfNs + "rest"),
            if (idx == live.size - 1) iri(RdfNs + "nil")
            else nodes(idx + 1))
        }
        nodes.head
    }
  }

  /** A node object: emits its triples into graph `g`, returns subject. */
  private def nodeObject(n: JsonNode, g: TermRow, parentCtx: Ctx): TermRow = {
    val ctx0 =
      if (n.has("@context")) parseContext(n.get("@context"), parentCtx)
      else parentCtx
    val kw = ctx0.keyword _
    def field(keyword: String): Option[JsonNode] =
      n.fields.asScala.find(e => kw(e.getKey) == keyword).map(_.getValue)
    val subj = field("@id") match {
      case Some(id) =>
        if (!id.isTextual) err(s"@id must be a string, got $id")
        ref(ctx0.expandRef(id.asText))
      case None => fresh()
    }
    val typeVals = field("@type").toSeq.flatMap(asArray).map(_.asText)
    typeVals.foreach(x =>
      out += QuadRow(g, subj, iri(RdfNs + "type"),
        ref(ctx0.expandRef(x))))
    // type-scoped contexts: a matched @type whose term definition
    // carries @context extends the active context for this node
    val ctx = typeVals.foldLeft(ctx0) { (c, t) =>
      c.terms.get(t).flatMap(_.scoped)
        .map(parseContext(_, c)).getOrElse(c)
    }
    field("@graph").foreach(gn =>
      asArray(gn).foreach(child => nodeObject(child, subj, ctx)))
    // @reverse map: { "prop": node objects } — triples point INTO subj
    // (values must be node objects; a literal is an error)
    field("@reverse").foreach { rn =>
      if (!rn.isObject) err("@reverse must be a map of properties")
      rn.fields.asScala.foreach { e =>
        ctx.expandKey(e.getKey).foreach { p =>
          asArray(e.getValue).filterNot(_.isNull).foreach { v =>
            val t = valueTerm(v, g, ctx, ctx.terms.get(e.getKey))
            if (t == null || t.kind == Term.LiteralKind.toByte)
              err(s"invalid @reverse value for '${e.getKey}' (literal)")
            out += QuadRow(g, t, iri(p), subj)
          }
        }
      }
    }
    // @included (JSON-LD 1.1): sibling node objects in the same graph
    field("@included").foreach(in =>
      asArray(in).foreach(child => nodeObject(child, g, ctx)))
    // @nest (JSON-LD 1.1): a nest key's object(s) contribute their
    // entries as if they sat directly on this node
    def propEntries(node: JsonNode): Seq[(String, JsonNode)] =
      node.fields.asScala.toSeq.map(e => e.getKey -> e.getValue).flatMap {
        case (k, value) if kw(k) == "@nest" =>
          asArray(value).flatMap { nv =>
            if (!nv.isObject) err("@nest value must be a node object")
            if (nv.fieldNames.asScala.exists(f => kw(f) == "@value"))
              err("@nest value must not be a value object")
            propEntries(nv)
          }
        case (k, value) => Seq(k -> value)
      }
    propEntries(n).foreach { case (key, value) =>
      if (!key.startsWith("@") && !kw(key).startsWith("@"))
        ctx.expandKey(key).foreach { p =>
          val td = ctx.terms.get(key)
          // property-scoped context applies while processing the values
          val vctx = td.flatMap(_.scoped)
            .map(parseContext(_, ctx)).getOrElse(ctx)
          val cont = td.flatMap(_.container)
          if (cont.contains("@index") && value.isObject) {
            // index map: keys are opaque indexes, values are the data
            value.fields.asScala.foreach(ix =>
              asArray(ix.getValue).foreach { v =>
                val t = valueTerm(v, g, vctx, td)
                if (t != null) {
                  if (td.exists(_.reverse)) {
                    if (t.kind == Term.LiteralKind.toByte)
                      err(s"invalid @reverse value for '$key' (literal)")
                    out += QuadRow(g, t, iri(p), subj)
                  } else out += QuadRow(g, subj, iri(p), t)
                }
              })
          } else if (cont.contains("@language") && value.isObject) {
            // language map: keys are BCP47 tags, values the strings
            value.fields.asScala.foreach(lv =>
              asArray(lv.getValue).foreach(v =>
                out += QuadRow(g, subj, iri(p),
                  TermRow(Term.LiteralKind.toByte, v.asText,
                    Term.RdfLangString, Term.normLang(lv.getKey)))))
          } else {
            val vs =
              if (cont.contains("@list") && value.isArray)
                Seq(value) // one list, not n values
              else asArray(value) // @set and no-container: n values
            vs.foreach { v =>
              // null values mean "no value" in JSON-LD: dropped, and
              // {"@value": null} drops the same way
              if (!v.isNull) {
                val t = valueTerm(v, g, vctx, td)
                if (t != null) {
                  // {"@reverse": iri} term definitions emit reversed
                  if (td.exists(_.reverse)) {
                    if (t.kind == Term.LiteralKind.toByte)
                      err(s"invalid @reverse value for '$key' (literal)")
                    out += QuadRow(g, t, iri(p), subj)
                  } else out += QuadRow(g, subj, iri(p), t)
                }
              }
            }
          }
        }
    }
    subj
  }

  private def asArray(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) n.elements.asScala.toSeq else Seq(n)
}
