package graft.io

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** JSON-LD parser (oxigraph: lib/oxjsonld): expanded form plus LOCAL
  * `@context` processing — term definitions (string and expanded form
  * with @id / @type / @language / @direction / @container), prefix
  * (compact-IRI) expansion, @vocab and @base, default @language and
  * @direction, keyword aliases, context arrays and null-resets, nested
  * node-object contexts (inherit + override), scoped contexts
  * (property-scoped via a term definition's @context, type-scoped via
  * a matched @type's term definition) with JSON-LD 1.1 propagation
  * semantics (@propagate; type-scoped contexts revert at nested node
  * objects by default), and @protected term definitions. Remote
  * contexts (a string entry in @context) are rejected — zero egress;
  * the one documented deviation.
  *
  * `rdfDirection` selects the toRdf base-direction mode: None (the
  * default) drops @direction like JSON-LD 1.0 consumers;
  * "i18n-datatype" mints https://www.w3.org/ns/i18n#{lang}_{dir}
  * datatypes; "compound-literal" reifies value/language/direction on
  * a fresh bnode.
  */
final class JsonLdParser(content: String,
    rdfDirection: Option[String] = None) {
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val I18nNs = "https://www.w3.org/ns/i18n#"
  private val out = ListBuffer[QuadRow]()
  private var bn = 0
  private val DG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)

  /** One term definition from an @context. `typ` is "@id" or a datatype
    * IRI; `container` holds the @container keyword set (JSON-LD 1.1
    * allows arrays like ["@graph","@id"]); `reverse` terms
    * ({"@reverse": iri}) emit their triples object-to-subject; `dir` is
    * "ltr"/"rtl" ("" = explicit null clears the context default);
    * `prot` marks a @protected definition.
    */
  private case class TermDef(iri: String, typ: Option[String] = None,
      lang: Option[String] = None, container: Set[String] = Set.empty,
      scoped: Option[JsonNode] = None, reverse: Boolean = false,
      dir: Option[String] = None, prot: Boolean = false,
      prefixOk: Boolean = false, indexProp: Option[String] = None)

  /** Active context. `aliases` maps user keys to JSON-LD keywords;
    * `prev` is the context to revert to when descending into a nested
    * node object (set by non-propagating contexts — type-scoped by
    * default, any context carrying @propagate: false).
    */
  private case class Ctx(terms: Map[String, TermDef] = Map.empty,
      vocab: Option[String] = None, base: Option[String] = None,
      lang: Option[String] = None, dir: Option[String] = None,
      aliases: Map[String, String] = Map.empty, prev: Option[Ctx] = None) {

    def keyword(key: String): String = aliases.getOrElse(key, key)

    /** The context a nested node object starts from: non-propagating
      * layers applied at the parent node drop away.
      */
    def descend: Ctx = prev.getOrElse(this)

    /** Expand a property key to an absolute IRI (None = drop, per the
      * JSON-LD algorithm for unmapped keys without @vocab).
      */
    def expandKey(key: String): Option[String] =
      terms.get(key).map(td => Option(td.iri)).getOrElse {
        val c = key.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (key.substring(0, c), key.substring(c + 1))
          if (local.startsWith("//")) Some(key) // absolute like http://
          // JSON-LD 1.1 prefix rule: only simple terms ending in a
          // gen-delim or expanded terms carrying @prefix: true act as
          // prefixes; otherwise the compact IRI stands as its own IRI
          else terms.get(pfx).filter(_.prefixOk).map(_.iri + local)
            .orElse(Some(key))
        } else vocab.map(_ + key)
      }

    /** Expand an @id VALUE (base-relative, compact, or term). */
    def expandRef(v: String): String =
      if (v.startsWith("_:")) v
      else terms.get(v).flatMap(td => Option(td.iri)).getOrElse {
        val c = v.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (v.substring(0, c), v.substring(c + 1))
          if (local.startsWith("//")) v
          else terms.get(pfx).filter(_.prefixOk).map(_.iri + local)
            .getOrElse(v)
        } else base.map(b => resolve(b, v)).getOrElse(v)
      }

    /** Expand an @type value / type-map key / value-object datatype:
      * IRI expansion with vocab=TRUE — term defs and compact IRIs
      * first, then the VOCAB mapping, then base resolution (r12 fix:
      * these positions previously base-resolved like @id values, so
      * `"@type": "T"` under @vocab emitted the garbage relative IRI
      * `T` instead of vocab+T).
      */
    def expandTypeRef(v: String): String =
      if (v.startsWith("_:")) v
      else terms.get(v).flatMap(td => Option(td.iri)).getOrElse {
        val c = v.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (v.substring(0, c), v.substring(c + 1))
          if (local.startsWith("//")) v
          else terms.get(pfx).filter(_.prefixOk).map(_.iri + local)
            .getOrElse(v)
        } else vocab.map(_ + v)
          .orElse(base.map(b => resolve(b, v))).getOrElse(v)
      }

    /** IRI expansion with vocab=true and documentRelative=FALSE — the
      * Create Term Definition mode: term-definition values (@id,
      * @reverse, coercion datatypes, simple string defs) consult term
      * defs, compact IRIs and the vocab mapping but never base-resolve.
      */
    def expandTermValue(v: String): String =
      if (v.startsWith("_:")) v
      else terms.get(v).flatMap(td => Option(td.iri)).getOrElse {
        val c = v.indexOf(':')
        if (c > 0) {
          val (pfx, local) = (v.substring(0, c), v.substring(c + 1))
          if (local.startsWith("//")) v
          else terms.get(pfx).filter(_.prefixOk).map(_.iri + local)
            .getOrElse(v)
        } else vocab.map(_ + v).getOrElse(v)
      }

    private def resolve(b: String, rel: String): String =
      graft.model.IriResolve.resolve(b, rel) // shared RFC 3986 resolver
  }

  private def checkDir(d: String): String =
    if (d == "ltr" || d == "rtl") d
    else err(s"invalid @direction '$d' (must be \"ltr\" or \"rtl\")")

  /** Parse a local context against `parent`. `defaultPropagate` is
    * false for type-scoped contexts (they revert at nested nodes
    * unless the context says @propagate: true); `overrideProtected`
    * is true for property-scoped contexts, which may redefine
    * protected terms; `clearPrev` makes a propagating application
    * absorb any pending revert (property-scoped contexts continue to
    * apply inside nested node objects).
    */
  private def parseContext(node: JsonNode, parent: Ctx,
      defaultPropagate: Boolean = true, overrideProtected: Boolean = false,
      clearPrev: Boolean = false): Ctx = {
    if (node.isNull) { // null context resets
      if (parent.terms.values.exists(_.prot) && !overrideProtected)
        err("cannot nullify a context holding protected terms")
      return Ctx()
    }
    if (node.isArray)
      return node.elements.asScala.foldLeft(parent)((c, n) =>
        parseContext(n, c, defaultPropagate, overrideProtected, clearPrev))
    if (node.isTextual)
      // JSON-LD 1.1 API error code "loading remote context failed":
      // this engine never dereferences (zero egress), so every remote
      // context reference fails with the spec's taxonomy name
      throw new IllegalArgumentException("JSON-LD: loading remote " +
        s"context failed (zero egress): ${node.asText}")
    if (!node.isObject) // API error code "invalid local context"
      err(s"invalid local context: ${node.getNodeType}")
    val propagate = Option(node.get("@propagate")).map { p =>
      if (!p.isBoolean) err("@propagate must be a boolean")
      p.asBoolean
    }.getOrElse(defaultPropagate)
    val protDefault = Option(node.get("@protected")).exists(_.asBoolean)
    var ctx = parent
    // a @protected term may only be redefined identically, or from a
    // property-scoped context (overrideProtected)
    def define(term: String, d: TermDef): Unit = {
      parent.terms.get(term).foreach { old =>
        if (old.prot && !overrideProtected && d.copy(prot = old.prot) != old)
          err(s"protected term redefinition: '$term'")
      }
      ctx = ctx.copy(terms = ctx.terms + (term -> d))
    }
    // Create Term Definition is ON DEMAND (spec §4.2): a term's value
    // may reference terms/prefixes defined LATER in the same context
    // object — ensure() recursively defines dependencies first, with
    // the spec's "cyclic IRI mapping" error on genuine cycles.
    val ctxKeywords = Set("@vocab", "@base", "@language", "@direction",
      "@version", "@propagate", "@protected", "@import")
    val entries: Map[String, JsonNode] = node.fields.asScala
      .filterNot(e => ctxKeywords(e.getKey))
      .map(e => e.getKey -> e.getValue).toMap
    val keywords = Set("@id", "@type", "@value", "@language", "@direction",
      "@list", "@set", "@reverse", "@graph", "@index", "@included",
      "@nest", "@none", "@json", "@container", "@prefix") ++ ctxKeywords
    var done = Set[String]()
    var defining = List[String]()
    def ensure(name: String): Unit =
      if (!done(name) && entries.contains(name)) {
        if (defining.contains(name)) err(s"cyclic IRI mapping: '$name'")
        defining ::= name
        defineEntry(name, entries(name))
        defining = defining.tail
        done += name
      }
    // ensure any term/prefix a value string depends on before expanding
    def ensureFor(v: String): Unit = {
      ensure(v)
      val c = v.indexOf(':')
      if (c > 0) ensure(v.substring(0, c))
    }
    def expandTermValueD(v: String): String =
      { ensureFor(v); ctx.expandTermValue(v) }
    def expandTypeRefD(v: String): String =
      { ensureFor(v); ctx.expandTypeRef(v) }
    def defineEntry(term: String, v: JsonNode): Unit = if (
      term.startsWith("@")) {
      // keywords may not be redefined — except @type, which 1.1 allows
      // to gain @container: @set (+@protected); toRdf output is
      // unchanged either way, arrays were always legal @type values.
      // Keyword-LOOKALIKE term names (@foo) are ignored with the same
      // rule as keyword-lookalike values.
      if (keywords(term)) {
        val ok = term == "@type" && v.isObject &&
          v.fields.asScala.forall { e =>
            (e.getKey == "@container" && e.getValue.isTextual &&
              e.getValue.asText == "@set") || e.getKey == "@protected"
          }
        if (!ok) err(s"keyword redefinition: '$term'")
      }
    } else v match {
      case v if v.isNull =>
        // explicit null definition: blocks @vocab/prefix expansion of
        // the key even when a vocab mapping is active
        define(term, TermDef(null, prot = protDefault))
      case v if v.isTextual && v.asText.startsWith("@") =>
        // only true keywords alias; keyword-LOOKALIKE values make the
        // term definition ignored entirely (spec: terms that look
        // like keywords MUST be ignored)
        if (keywords(v.asText))
          ctx = ctx.copy(aliases = ctx.aliases + (term -> v.asText))
      case v if v.isTextual =>
        val id = expandTermValueD(v.asText)
        // simple terms act as prefixes iff their IRI ends in a
        // gen-delim character (JSON-LD 1.1 §4.4)
        val pfxOk = id.nonEmpty && ":/?#[]@".contains(id.last)
        define(term, TermDef(id, prot = protDefault, prefixOk = pfxOk))
      case v if v.isObject =>
        val rev = v.has("@reverse")
        if (rev && v.has("@id"))
          err(s"term '$term' has both @reverse and @id")
        val id =
          if (rev) expandTermValueD(v.get("@reverse").asText)
          else if (v.has("@id")) expandTermValueD(v.get("@id").asText)
          else {
            // the term's own name expands as a compact IRI / vocab
            // key — WITHOUT a self-lookup (that would read as a cycle)
            val c = term.indexOf(':')
            if (c > 0) {
              ensure(term.substring(0, c))
              ctx.expandKey(term).getOrElse(term)
            } else ctx.vocab.map(_ + term).getOrElse(term)
          }
        val typ = Option(v.get("@type")).map(_.asText).flatMap(t =>
          if (t == "@none") None // 1.1: explicit "no coercion"
          else Some(
            if (t == "@id" || t == "@vocab" || t == "@json") t
            else expandTypeRefD(t)))
        val lang = Option(v.get("@language"))
          .map(l => if (l.isNull) "" else Term.normLang(l.asText))
        val dir = Option(v.get("@direction"))
          .map(d => if (d.isNull) "" else checkDir(d.asText))
        // @container takes a keyword or (1.1) an array of keywords
        val cont: Set[String] = Option(v.get("@container")).map { c =>
          if (c.isNull) Set.empty[String]
          else if (c.isArray) c.elements.asScala.map(_.asText).toSet
          else Set(c.asText)
        }.getOrElse(Set.empty)
        val known = Set("@list", "@set", "@index", "@language", "@id",
          "@type", "@graph", "@none")
        cont.find(!known(_)).foreach(c =>
          err(s"term '$term': unknown @container '$c'"))
        // reverse terms may only carry @set / @index containers (§9.24
        // "invalid reverse property")
        if (rev && (cont -- Set("@set", "@index")).nonEmpty)
          err(s"term '$term': @reverse with ${cont.mkString(",")} " +
            "container")
        val prot = Option(v.get("@protected")).map(_.asBoolean)
          .getOrElse(protDefault)
        // expanded terms are prefixes only with an explicit
        // @prefix: true (JSON-LD 1.1 §4.4)
        val pfxOk = Option(v.get("@prefix")).exists { p =>
          if (!p.isBoolean) err(s"invalid @prefix value on '$term'")
          p.asBoolean
        }
        // property-based data indexing (1.1 §4.6.1): index-map keys
        // become VALUES of this property instead of dropping
        val idxProp = Option(v.get("@index")).map { ip =>
          if (!cont("@index"))
            err(s"term '$term': @index requires an @index container")
          if (!ip.isTextual) err(s"term '$term': invalid @index value")
          expandTypeRefD(ip.asText)
        }
        // scoped (term-level) context: raw node kept, parsed against
        // the ACTIVE context at each use site (property or type)
        val scoped = Option(v.get("@context"))
        define(term, TermDef(id, typ, lang, cont, scoped, rev, dir, prot,
          pfxOk, idxProp))
      case _ =>
    }
    // keyword entries apply BEFORE any term definition regardless of
    // document order (Context Processing steps 5.x precede Create Term
    // Definition) — a vocab/base declared after a term in source order
    // still shapes that term's expansion
    node.fields.asScala.foreach { e =>
      (e.getKey, e.getValue) match {
        case ("@vocab", v) =>
          if (!v.isNull && !v.isTextual) // "invalid vocab mapping"
            err(s"invalid vocab mapping: $v")
          // IRI expansion with vocab=true, documentRelative=true (r12):
          // a RELATIVE @vocab concatenates onto the previous vocab
          // mapping, else resolves against @base — it was previously
          // taken verbatim, producing relative property IRIs
          ctx = ctx.copy(vocab =
            if (v.isNull) None else Some(expandTypeRefD(v.asText)))
        case ("@base", v) =>
          if (!v.isNull && !v.isTextual) // "invalid base IRI"
            err(s"invalid base IRI: $v")
          ctx = ctx.copy(base = if (v.isNull) None else Some(v.asText))
        case ("@language", v) =>
          if (!v.isNull && !v.isTextual) // "invalid default language"
            err(s"invalid default language: $v")
          ctx = ctx.copy(lang =
            if (v.isNull) None else Some(Term.normLang(v.asText)))
        case ("@direction", v) =>
          ctx = ctx.copy(dir =
            if (v.isNull) None else Some(checkDir(v.asText)))
        case ("@version", v) => // "invalid @version value": only 1.1
          if (!(v.isNumber && v.asDouble == 1.1))
            err(s"invalid @version value: $v (must be the number 1.1)")
        case ("@import", v) =>
          // @import always names a remote context document — same
          // zero-egress failure as a string @context entry
          throw new IllegalArgumentException("JSON-LD: loading remote " +
            s"context failed (zero egress @import): $v")
        case _ =>
      }
    }
    node.fields.asScala.foreach(e =>
      if (!ctxKeywords(e.getKey)) ensure(e.getKey))
    if (propagate) { if (clearPrev) ctx.copy(prev = None) else ctx }
    else ctx.copy(prev = Some(parent.descend))
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
    rdfDirection.foreach(m =>
      if (m != "i18n-datatype" && m != "compound-literal" && m != "native")
        err(s"unknown rdfDirection mode '$m'"))
    val root = new ObjectMapper().readTree(content)
    val nodes = if (root.isArray) root.elements.asScala.toSeq else Seq(root)
    nodes.foreach(n => nodeObject(n, DG, Ctx(), docPos = true))
    out.toSeq
  }

  /** A directed string under the active rdfDirection mode (§8 of the
    * JSON-LD-to-RDF algorithm). `g` receives the compound-literal
    * reification triples when that mode is on.
    */
  private def directedLit(text: String, lang: Option[String], dir: String,
      g: TermRow): TermRow = rdfDirection match {
    // extension mode beyond the JSON-LD 1.1 pair: RDF 1.2 native
    // directional literals (rdf:dirLangString, "lang--dir" tag) —
    // the lossless target when the downstream store speaks RDF 1.2
    case Some("native") => lang match {
      case Some(l) => TermRow(Term.LiteralKind.toByte, text,
        Term.RdfDirLangString, Term.normLang(l) + "--" + dir)
      case None => err("@direction without @language cannot map to " +
        "rdf:dirLangString (native mode); use i18n-datatype")
    }
    case Some("i18n-datatype") =>
      TermRow(Term.LiteralKind.toByte, text,
        I18nNs + lang.getOrElse("").toLowerCase + "_" + dir, null)
    case Some("compound-literal") =>
      val b = fresh()
      out += QuadRow(g, b, iri(RdfNs + "value"),
        TermRow(Term.LiteralKind.toByte, text, Term.XsdString, null))
      lang.foreach(l => out += QuadRow(g, b, iri(RdfNs + "language"),
        TermRow(Term.LiteralKind.toByte, l.toLowerCase, Term.XsdString,
          null)))
      out += QuadRow(g, b, iri(RdfNs + "direction"),
        TermRow(Term.LiteralKind.toByte, dir, Term.XsdString, null))
      b
    case _ => // default mode: direction is dropped, like JSON-LD 1.0
      lang match {
        case Some(l) =>
          TermRow(Term.LiteralKind.toByte, text, Term.RdfLangString, l)
        case None =>
          TermRow(Term.LiteralKind.toByte, text, Term.XsdString, null)
      }
  }

  /** Scalar JSON -> RDF literal (JSON-LD value coercion rules), shaped
    * by the property's term definition / context default language and
    * base direction.
    */
  private def scalarLit(v: JsonNode, td: Option[TermDef],
      ctx: Ctx, g: TermRow): TermRow =
    if (v.isBoolean) {
      // a coerced datatype overrides the native xsd:boolean default
      val dt = td.flatMap(_.typ)
        .filter(t => t != "@id" && t != "@json" && t != "@vocab")
      TermRow(Term.LiteralKind.toByte, v.asBoolean.toString,
        dt.getOrElse(Term.XsdBoolean), null)
    }
    else if (v.isNumber) {
      val dt = td.flatMap(_.typ)
        .filter(t => t != "@id" && t != "@json" && t != "@vocab")
      val (lex, dty) = numLex(v, dt)
      TermRow(Term.LiteralKind.toByte, lex, dty, null)
    }
    else td.flatMap(_.typ) match {
      case Some("@id") => ref(ctx.expandRef(v.asText))
      case Some("@vocab") => ref(ctx.expandTypeRef(v.asText))
      case Some(dt) => TermRow(Term.LiteralKind.toByte, v.asText, dt, null)
      case None =>
        // term language/direction ("" clears the default) else context
        val lang = td.flatMap(_.lang).orElse(ctx.lang).filter(_.nonEmpty)
        val dir = td.flatMap(_.dir).orElse(ctx.dir).filter(_.nonEmpty)
        dir match {
          case Some(d) => directedLit(v.asText, lang, d, g)
          case None => lang match {
            case Some(l) =>
              TermRow(Term.LiteralKind.toByte, v.asText,
                Term.RdfLangString, l)
            case None =>
              TermRow(Term.LiteralKind.toByte, v.asText, Term.XsdString,
                null)
          }
        }
    }

  /** JSON number -> RDF lexical + datatype per Object-to-RDF (r12
    * wave 2): a number is a DOUBLE when it has a non-zero fractional
    * part or |v| >= 1e21 — by VALUE, not source lexical, so 1e2 is the
    * integer 100 — or when the coerced datatype IS xsd:double;
    * integers use exact big-integer lexicals (no silent Long overflow
    * for 20-digit literals).
    */
  private def numLex(v: JsonNode, dt: Option[String]): (String, String) = {
    val asDbl = dt.contains(Term.XsdDouble) || {
      if (v.isIntegralNumber)
        v.bigIntegerValue.abs.toString.length > 21 // >= 1e21: 22+ digits
      else {
        val d = v.asDouble
        d.isNaN || d.isInfinite || d != Math.rint(d) || Math.abs(d) >= 1e21
      }
    }
    if (asDbl) (canonicalDouble(v.asDouble), dt.getOrElse(Term.XsdDouble))
    else {
      val lex =
        if (v.isIntegralNumber) v.bigIntegerValue.toString
        else java.math.BigDecimal.valueOf(v.asDouble)
          .toBigInteger.toString
      (lex, dt.getOrElse(Term.XsdInteger))
    }
  }

  /** XSD canonical xsd:double lexical form (single leading digit,
    * at least one fraction digit, E exponent): 5.5 -> "5.5E0",
    * 100 -> "1.0E2" — what the JSON-LD Object-to-RDF algorithm
    * requires for native non-integral numbers.
    */
  private def canonicalDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "INF"
    else if (d.isNegInfinity) "-INF"
    else new java.text.DecimalFormat("0.0###############E0",
      new java.text.DecimalFormatSymbols(java.util.Locale.ROOT)).format(d)

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
        val dirKey = v.fieldNames.asScala.find(k => vk(k) == "@direction")
        // value object validity (JSON-LD 1.1 §9.5): only @value/@type/
        // @language/@direction/@index keys; @type excludes both
        // @language and @direction; @value must be a scalar (null =
        // drop the entry)
        val allowed = Set("@value", "@type", "@language", "@direction",
          "@index")
        v.fieldNames.asScala.find(k => !allowed(vk(k)))
          .foreach(k => err(s"invalid value object key '$k'"))
        // an explicit null @language/@direction is "not present"
        val langN = langKey.map(v.get).filterNot(_.isNull)
        if (typeKey.isDefined && langN.isDefined)
          err("@value with both @type and @language")
        if (typeKey.isDefined && dirKey.isDefined &&
          !v.get(dirKey.get).isNull)
          err("@value with both @type and @direction")
        // {"@value": ..., "@type": "@json"}: ANY JSON value is legal
        // and becomes an rdf:JSON literal in canonical form
        val jsonTyped = typeKey.exists(k =>
          v.get(k).isTextual && vk(v.get(k).asText) == "@json")
        if (lex.isContainerNode && !jsonTyped)
          err("@value must be a scalar or null")
        val dir = dirKey.map(v.get).filterNot(_.isNull)
          .map(d => checkDir(d.asText))
        if (dir.isDefined && !lex.isTextual && !lex.isNull)
          err("@direction on a non-string @value")
        if (langN.isDefined && !lex.isTextual && !lex.isNull && !jsonTyped)
          err("invalid language-tagged value: @language on a " +
            "non-string @value")
        if (jsonTyped)
          TermRow(Term.LiteralKind.toByte, canonicalJson(lex),
            RdfNs + "JSON", null)
        else if (lex.isNull) null
        else if (typeKey.isDefined) {
          // datatype IRIs expand with vocab=true; a NUMBER @value
          // converts per Object-to-RDF: canonical double when it has a
          // fraction or the datatype IS xsd:double, else integer lexical
          val dt = ctx.expandTypeRef(v.get(typeKey.get).asText)
          val lexS =
            if (lex.isNumber) numLex(lex, Some(dt))._1
            else if (lex.isBoolean) lex.asBoolean.toString
            else lex.asText
          TermRow(Term.LiteralKind.toByte, lexS, dt, null)
        }
        else if (dir.isDefined)
          directedLit(lex.asText,
            langN.map(l => Term.normLang(l.asText)), dir.get, g)
        else if (langN.isDefined)
          TermRow(Term.LiteralKind.toByte, lex.asText, Term.RdfLangString,
            Term.normLang(langN.get.asText))
        else scalarLit(lex, None, Ctx(), g) // explicit @value: no coercion
      } else if (listKey.isDefined) listTerm(
        v.get(listKey.get).elements.asScala.toSeq, g, ctx, td)
      else nodeObject(v, g, ctx) // node object (possibly just {"@id"})
    } else if (td.exists(_.container.contains("@list")) && v.isArray)
      listTerm(v.elements.asScala.toSeq, g, ctx, td)
    else scalarLit(v, td, ctx, g)

  /** Unwrap explicit set objects — `{"@set": [...]}`, optionally with
    * `@index` — into their member values, recursively (JSON-LD
    * expansion: @set is pure syntactic sugar in ANY value position;
    * r12 fix — such objects previously parsed as NODE OBJECTS, minting
    * a blank node and silently dropping the members). Any other key
    * alongside @set is the spec's invalid-set-or-list-object error.
    */
  private def flattenSets(vs: Seq[JsonNode],
      kw: String => String): Seq[JsonNode] =
    vs.flatMap { v =>
      // nested ARRAYS flatten recursively in value positions (the
      // expansion algorithm appends expanded-array items) — only under
      // an @list container do they become nested lists, and listTerm
      // bypasses this flattening for exactly that reason
      if (v.isArray) flattenSets(v.elements.asScala.toSeq, kw)
      else if (v.isObject) {
        val fields = v.fieldNames.asScala.toSeq
        if (fields.exists(f => kw(f) == "@set")) {
          fields.find(f => kw(f) != "@set" && kw(f) != "@index")
            .foreach(f => err(s"invalid set or list object key '$f'"))
          flattenSets(asArray(
            v.get(fields.find(f => kw(f) == "@set").get)), kw)
        } else Seq(v)
      } else Seq(v)
    }

  private def listTerm(items: Seq[JsonNode], g: TermRow, ctx: Ctx,
      td: Option[TermDef]): TermRow = {
    val itemTd = td.map(_.copy(container = Set.empty[String]))
    // evaluate items FIRST: a {"@value": null} entry yields a null
    // term and drops out of the list exactly like a bare JSON null;
    // explicit @set objects unwrap into the surrounding list; a nested
    // ARRAY here is a NESTED LIST (JSON-LD 1.1 lifted the
    // list-of-lists restriction), so it must dodge flattenSets'
    // value-position array flattening
    val terms = items.flatMap { item =>
      if (item.isArray)
        Seq(listTerm(item.elements.asScala.toSeq, g, ctx, itemTd))
      else flattenSets(Seq(item), ctx.keyword _).filterNot(_.isNull)
        .map(valueTerm(_, g, ctx, itemTd)).filter(_ != null)
    }
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

  /** A node object: emits its triples into graph `g`, returns subject.
    * `docPos` marks document/graph position (top level, inside another
    * @graph): there an object carrying ONLY @graph (+@context) is the
    * transparent document wrapper — its children stay in the CURRENT
    * graph (JSON-LD expansion drops the @graph-only shell when the
    * active property is null or @graph); in property position the same
    * shape is a graph OBJECT naming a fresh bnode graph.
    */
  private def nodeObject(n: JsonNode, g: TermRow, incoming: Ctx,
      docPos: Boolean = false): TermRow = {
    // entering a new node object reverts non-propagating contexts
    // (type-scoped layers, @propagate: false) applied at the parent
    val parentCtx = incoming.descend
    val ctx0 =
      if (n.has("@context")) parseContext(n.get("@context"), parentCtx)
      else parentCtx
    val kw = ctx0.keyword _
    def field(keyword: String): Option[JsonNode] =
      n.fields.asScala.find(e => kw(e.getKey) == keyword).map(_.getValue)
    if (docPos && field("@graph").isDefined &&
      n.fieldNames.asScala.forall(k =>
        k == "@context" || kw(k) == "@graph")) {
      asArray(field("@graph").get)
        .foreach(c => nodeObject(c, g, ctx0, docPos = true))
      return fresh() // wrapper has no triples; subject never referenced
    }
    val subj = field("@id") match {
      case Some(id) =>
        if (!id.isTextual) err(s"@id must be a string, got $id")
        ref(ctx0.expandRef(id.asText))
      case None => fresh()
    }
    val typeVals = field("@type").toSeq.flatMap(asArray).map { t =>
      if (!t.isTextual) err(s"@type values must be strings, got $t")
      t.asText
    }
    typeVals.foreach(x =>
      out += QuadRow(g, subj, iri(RdfNs + "type"),
        ref(ctx0.expandTypeRef(x))))
    // type-scoped contexts: a matched @type whose term definition
    // carries @context extends the active context for THIS node (they
    // do not propagate into nested node objects unless they say
    // @propagate: true — the descend() above reverts them). The spec
    // applies them in LEXICOGRAPHIC order of the type strings, not
    // document order.
    val ctx = typeVals.sorted.foldLeft(ctx0) { (c, t) =>
      c.terms.get(t).flatMap(_.scoped)
        .map(parseContext(_, c, defaultPropagate = false)).getOrElse(c)
    }
    field("@graph").foreach(gn =>
      asArray(gn).foreach(child =>
        nodeObject(child, subj, ctx, docPos = true)))
    // @reverse map: { "prop": node objects } — triples point INTO subj
    // (values must be node objects; a literal is an error)
    field("@reverse").foreach { rn =>
      if (!rn.isObject) err("@reverse must be a map of properties")
      rn.fields.asScala.foreach { e =>
        ctx.expandKey(e.getKey).foreach { p =>
          asArray(e.getValue).filterNot(_.isNull).foreach { v =>
            // a list object can never be a reverse value (§9.13:
            // "invalid reverse property value")
            if (v.isObject && v.fieldNames.asScala.exists(f =>
              kw(f) == "@list"))
              err(s"invalid reverse property value for '${e.getKey}' " +
                "(list object)")
            val t = valueTerm(v, g, ctx, ctx.terms.get(e.getKey))
            if (t == null || t.kind == Term.LiteralKind.toByte)
              err(s"invalid @reverse value for '${e.getKey}' (literal)")
            out += QuadRow(g, t, iri(p), subj)
          }
        }
      }
    }
    // @included (JSON-LD 1.1): sibling node objects in the same graph
    // (a value object here is invalid — §9.14)
    field("@included").foreach(in =>
      asArray(in).foreach { child =>
        if (!child.isObject || child.fieldNames.asScala.exists(f =>
          kw(f) == "@value"))
          err("@included values must be node objects")
        nodeObject(child, g, ctx)
      })
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
          // property-scoped context applies while processing the
          // values AND inside nested node objects (clearPrev absorbs
          // any pending type-scoped revert); it may override
          // protected terms
          val vctx = td.flatMap(_.scoped)
            .map(parseContext(_, ctx, overrideProtected = true,
              clearPrev = true)).getOrElse(ctx)
          val cont = td.map(_.container).getOrElse(Set.empty[String])
          val vkw = vctx.keyword _
          // a map entry value evaluates without the container (the map
          // layer is consumed here)
          val entryTd = td.map(_.copy(container = Set.empty[String]))
          def emit(t: TermRow): Unit =
            if (t != null) {
              if (td.exists(_.reverse)) {
                if (t.kind == Term.LiteralKind.toByte)
                  err(s"invalid @reverse value for '$key' (literal)")
                out += QuadRow(g, t, iri(p), subj)
              } else out += QuadRow(g, subj, iri(p), t)
            }
          if (cont("@graph")) {
            // graph container: each entry is graph CONTENT; the graph
            // name is the map key under @graph+@id (expandRef; @none =
            // fresh), a fresh bnode otherwise; the property links the
            // subject to the graph name
            if (cont("@id") && value.isObject) {
              value.fields.asScala.foreach { e =>
                val gName =
                  if (vkw(e.getKey) == "@none") fresh()
                  else ref(vctx.expandRef(e.getKey))
                asArray(e.getValue).foreach { v =>
                  if (!v.isNull) {
                    if (!v.isObject) err("@graph map entry must be a " +
                      "node object")
                    nodeObject(v, gName, vctx)
                  }
                }
                out += QuadRow(g, subj, iri(p), gName)
              }
            } else if (cont("@index") && value.isObject) {
              // @graph+@index map: keys are opaque indexes that drop;
              // each ITEM is content of its own fresh bnode graph
              value.fields.asScala.foreach(e =>
                asArray(e.getValue).foreach { v =>
                  if (!v.isNull) {
                    if (!v.isObject) err("@graph map entry must be a " +
                      "node object")
                    val gName = fresh()
                    nodeObject(v, gName, vctx)
                    out += QuadRow(g, subj, iri(p), gName)
                  }
                })
            } else asArray(value).foreach { v =>
              if (!v.isNull) {
                if (!v.isObject)
                  err("@graph container entry must be a node object")
                val gName = fresh()
                nodeObject(v, gName, vctx)
                out += QuadRow(g, subj, iri(p), gName)
              }
            }
          } else if (cont("@id") && value.isObject) {
            // id map: keys name the entry nodes (an explicit @id in the
            // entry wins; "@none" keys add nothing)
            value.fields.asScala.foreach { e =>
              asArray(e.getValue).foreach { v =>
                if (!v.isNull) {
                  if (!v.isObject) err("@id map entry must be a node object")
                  val on =
                    v.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                  val hasId =
                    on.fieldNames.asScala.exists(f => vkw(f) == "@id")
                  if (!hasId && vkw(e.getKey) != "@none")
                    on.put("@id", e.getKey)
                  emit(valueTerm(v, g, vctx, entryTd))
                }
              }
            }
          } else if (cont("@type") && value.isObject) {
            // type map: each entry node gains the key as an rdf:type
            // ("@none" keys add nothing)
            value.fields.asScala.foreach { e =>
              asArray(e.getValue).foreach { v =>
                if (!v.isNull) {
                  if (!v.isObject)
                    err("@type map entry must be a node object")
                  val t = valueTerm(v, g, vctx, entryTd)
                  if (t != null && vkw(e.getKey) != "@none")
                    out += QuadRow(g, t, iri(RdfNs + "type"),
                      ref(vctx.expandTypeRef(e.getKey)))
                  emit(t)
                }
              }
            }
          } else if (cont("@index") && value.isObject) {
            // index map: keys are opaque indexes, values are the data
            // (explicit @set objects unwrap like any value position).
            // With property-based indexing the key also lands on each
            // entry node as a string value of the index property
            val ipOpt = td.flatMap(_.indexProp)
            value.fields.asScala.foreach(ix =>
              flattenSets(asArray(ix.getValue), vkw)
                .filterNot(_.isNull).foreach { v =>
                  val t = valueTerm(v, g, vctx, entryTd)
                  if (t != null) ipOpt.foreach { ip =>
                    if (vkw(ix.getKey) != "@none") {
                      if (t.kind == Term.LiteralKind.toByte)
                        err("property-based index entries must be " +
                          "node objects")
                      out += QuadRow(g, t, iri(ip),
                        TermRow(Term.LiteralKind.toByte, ix.getKey,
                          Term.XsdString, null))
                    }
                  }
                  emit(t)
                })
          } else if (cont("@language") && value.isObject) {
            // language map: keys are BCP47 tags ("@none"/alias = no
            // language), values the strings; the term or context
            // default @direction applies to every entry
            val mdir = td.flatMap(_.dir).orElse(vctx.dir)
              .filter(_.nonEmpty)
            value.fields.asScala.foreach(lv =>
              asArray(lv.getValue).filterNot(_.isNull).foreach { v =>
                if (!v.isTextual)
                  err("language map values must be strings")
                val lang =
                  if (vkw(lv.getKey) == "@none") None
                  else Some(Term.normLang(lv.getKey))
                val t = mdir match {
                  case Some(d) => directedLit(v.asText, lang, d, g)
                  case None => lang match {
                    case Some(l) => TermRow(Term.LiteralKind.toByte,
                      v.asText, Term.RdfLangString, l)
                    case None => TermRow(Term.LiteralKind.toByte,
                      v.asText, Term.XsdString, null)
                  }
                }
                out += QuadRow(g, subj, iri(p), t)
              })
          } else {
            val vs =
              if (td.exists(_.typ.contains("@json")))
                Seq(value) // @json captures the WHOLE value — an array
                // is ONE JSON literal (W3C js04), not n values
              else if (cont.contains("@list") && value.isArray)
                Seq(value) // one list, not n values
              else // @set-container and no-container: n values, with
                // explicit {"@set": [...]} value objects unwrapped
                flattenSets(asArray(value), vkw)
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
