package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.JsonLdParser
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** Construction-directed JSON-LD fuzz (round 12): generate the
  * EXPECTED quads first, then render them through randomized surface
  * shapes — term definitions (simple/expanded, forward-referencing
  * prefixes), compact IRIs, @vocab, keyword aliases, default
  * @language, @set wrappers, nested arrays, language maps, value
  * objects, named graphs, depth-1 embedded bnode nodes — whose
  * expansion is exact by construction. The same lockstep idea as
  * GrammarFuzzSpec uses for SPARQL text. Every bnode carries an
  * explicit label, so comparison is exact SET equality — no
  * isomorphism search, any divergence is a real parser bug.
  */
class JsonLdFuzzSpec extends AnyFunSuite {

  private val X = "http://x/"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val F = JsonNodeFactory.instance

  // ---- model -----------------------------------------------------------
  sealed trait Obj
  private case class ORef(id: String) extends Obj // IRI or _:label
  private case class OStr(s: String) extends Obj
  private case class OLang(s: String, lang: String) extends Obj
  private case class OInt(n: Long) extends Obj
  private case class OBool(b: Boolean) extends Obj
  private case class Node(id: String, types: Seq[String],
      props: Seq[(String, Seq[Obj])],
      // @reverse-map edges: (pred, target ids) => quad (target, pred, id)
      rev: Seq[(String, Seq[String])] = Nil)
  // graphs: (None = default graph, Some(name) = named), each with nodes
  private case class Doc(graphs: Seq[(Option[String], Seq[Node])])

  // ---- expected quads --------------------------------------------------
  private def term(kind: Byte, lex: String, dt: String = null,
      lang: String = null) = TermRow(kind, lex, dt, lang)
  private def ref(id: String): TermRow =
    if (id.startsWith("_:")) term(Term.BlankKind.toByte, id.drop(2))
    else term(Term.IriKind.toByte, id)
  private def objTerm(o: Obj): TermRow = o match {
    case ORef(id) => ref(id)
    case OStr(s) => term(Term.LiteralKind.toByte, s, Term.XsdString)
    case OLang(s, l) =>
      term(Term.LiteralKind.toByte, s, Term.RdfLangString, l)
    case OInt(n) =>
      term(Term.LiteralKind.toByte, n.toString, Term.XsdInteger)
    case OBool(b) =>
      term(Term.LiteralKind.toByte, b.toString, Term.XsdBoolean)
  }
  private val DG = term(Term.DefaultGraphKind.toByte, null)
  private def expected(doc: Doc): Set[QuadRow] =
    (for {
      (gOpt, nodes) <- doc.graphs
      g = gOpt.map(ref).getOrElse(DG)
      n <- nodes
      q <- n.types.map(ty => QuadRow(g, ref(n.id),
          term(Term.IriKind.toByte, Rdf + "type"), ref(ty))) ++
        n.props.flatMap { case (p, os) =>
          os.map(o => QuadRow(g, ref(n.id),
            term(Term.IriKind.toByte, p), objTerm(o)))
        } ++
        n.rev.flatMap { case (p, ts) =>
          ts.map(t => QuadRow(g, ref(t),
            term(Term.IriKind.toByte, p), ref(n.id)))
        }
    } yield q).toSet

  // ---- generators ------------------------------------------------------
  private val langs = Seq("en", "fr")
  private def iriNode(k: Int) = s"${X}n$k"
  private def pred(k: Int) = s"${X}p$k"
  private def typ(k: Int) = s"${X}T$k"

  private val genObj: Gen[Obj] = Gen.frequency(
    3 -> Gen.choose(0, 5).map(k => ORef(iriNode(k))),
    2 -> Gen.choose(0, 3).map(k => ORef(s"_:b$k")),
    3 -> Gen.oneOf("a", "b", "c", "d").map(OStr),
    2 -> Gen.zip(Gen.oneOf("x", "y"), Gen.oneOf(langs))
      .map { case (s, l) => OLang(s, l) },
    2 -> Gen.choose(0L, 9L).map(OInt),
    1 -> Gen.oneOf(true, false).map(OBool))

  private def genNode(id: String): Gen[Node] = for {
    nt <- Gen.choose(0, 2)
    types <- Gen.listOfN(nt, Gen.choose(0, 2).map(typ))
    np <- Gen.choose(0, 3)
    props <- Gen.listOfN(np, for {
      p <- Gen.choose(0, 3).map(pred)
      no <- Gen.choose(1, 3)
      os <- Gen.listOfN(no, genObj)
    } yield p -> os)
    nr <- Gen.frequency(3 -> Gen.const(0), 1 -> Gen.const(1))
    revs <- Gen.listOfN(nr, for {
      p <- Gen.choose(0, 3).map(pred)
      nt2 <- Gen.choose(1, 2)
      ts <- Gen.listOfN(nt2, Gen.oneOf(
        Gen.choose(0, 5).map(iriNode),
        Gen.choose(0, 3).map(k => s"_:b$k")))
    } yield p -> ts)
    // one JSON key per predicate — a repeated key would overwrite in
    // the rendered object, not merge
  } yield Node(id, types.distinct,
    props.groupBy(_._1).map { case (p, ps) =>
      p -> ps.flatMap(_._2)
    }.toSeq,
    revs.groupBy(_._1).map { case (p, ps) =>
      p -> ps.flatMap(_._2).distinct
    }.toSeq)

  private val genDoc: Gen[Doc] = for {
    nIri <- Gen.choose(1, 3)
    nB <- Gen.choose(0, 2)
    ids <- Gen.const((0 until nIri).map(iriNode) ++
      (0 until nB).map(k => s"_:b$k"))
    defNodes <- Gen.sequence[Seq[Node], Node](ids.map(genNode))
    named <- Gen.option(for {
      g <- Gen.oneOf(s"${X}g1", "_:bg")
      n <- genNode(iriNode(4))
      n2 <- genNode(s"_:b3")
    } yield (Some(g), Seq(n, n2)))
  } yield Doc(Seq((None, defNodes)) ++ named.toSeq)

  // surface-shape configuration, randomized per document
  private case class Cfg(usePrefix: Boolean, useVocab: Boolean,
      aliasId: Boolean, aliasType: Boolean, defaultLang: Option[String],
      // per-pred term specs: (termName, expanded, coerceId, langMapOk,
      // langNull, idxMap)
      terms: Map[String, (String, Boolean, Boolean, Boolean, Boolean, Boolean)],
      ctxTermsFirst: Boolean, seed: Long)

  private val genCfg: Gen[Cfg] = for {
    up <- Gen.oneOf(true, false)
    uv <- Gen.oneOf(true, false)
    ai <- Gen.oneOf(true, false)
    at <- Gen.oneOf(true, false)
    dl <- Gen.option(Gen.oneOf(langs))
    nt <- Gen.choose(0, 4)
    tks <- Gen.listOfN(nt, Gen.choose(0, 3))
    specs <- Gen.sequence[Seq[(String, (String, Boolean, Boolean, Boolean, Boolean, Boolean))],
      (String, (String, Boolean, Boolean, Boolean, Boolean, Boolean))](
      tks.distinct.map { k =>
        for {
          exp <- Gen.oneOf(true, false)
          coerce <- Gen.oneOf(true, false)
          lm <- Gen.oneOf(true, false)
          ln <- Gen.oneOf(true, false)
          ix <- Gen.oneOf(true, false)
        } yield pred(k) -> (s"t$k", exp, exp && coerce, exp && lm,
          exp && ln, exp && !lm && ix)
      })
    ctf <- Gen.oneOf(true, false)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield Cfg(up, uv, ai, at, dl, specs.toMap, ctf, seed)

  // ---- rendering -------------------------------------------------------
  private def render(doc: Doc, cfg: Cfg): String = {
    val rnd = new scala.util.Random(cfg.seed)
    val root = F.arrayNode()

    def ctxNode(): ObjectNode = {
      val c = F.objectNode()
      def keywords(): Unit = {
        if (cfg.usePrefix) c.put("ex", X)
        if (cfg.useVocab) c.put("@vocab", X)
        if (cfg.aliasId) c.put("id", "@id")
        if (cfg.aliasType) c.put("type", "@type")
        cfg.defaultLang.foreach(l => c.put("@language", l))
      }
      def termDefs(): Unit = cfg.terms.foreach {
        case (p, (name, expanded, coerce, langMap, langNull, idxMap)) =>
          // the term's IRI value itself renders as compact / vocab /
          // absolute — forward references exercise on-demand defs
          val iriForm =
            if (cfg.usePrefix && rnd.nextBoolean()) "ex:" + p.substring(X.length)
            else if (cfg.useVocab && rnd.nextBoolean()) p.substring(X.length)
            else p
          if (!expanded) c.put(name, iriForm)
          else {
            val d = F.objectNode()
            d.put("@id", iriForm)
            if (coerce) d.put("@type", "@id")
            if (langMap) d.put("@container", "@language")
            if (idxMap) d.put("@container", "@index")
            if (langNull) d.putNull("@language")
            c.set[ObjectNode](name, d)
          }
      }
      if (cfg.ctxTermsFirst) { termDefs(); keywords() }
      else { keywords(); termDefs() }
      c
    }

    def idForm(id: String): String =
      if (id.startsWith("_:")) id
      else if (cfg.usePrefix && rnd.nextBoolean())
        "ex:" + id.substring(X.length)
      else id

    def keyForm(p: String): String = cfg.terms.get(p) match {
      case Some((name, _, _, _, _, _)) => name
      case None =>
        if (cfg.usePrefix && rnd.nextBoolean())
          "ex:" + p.substring(X.length)
        else p // absolute IRI key
    }

    def typeForm(ty: String): String =
      if (cfg.usePrefix && rnd.nextBoolean())
        "ex:" + ty.substring(X.length)
      else if (cfg.useVocab && rnd.nextBoolean()) ty.substring(X.length)
      else ty

    // a bare string picks up the context default @language — or turns
    // into an IRI under @type: @id coercion — so render via an
    // explicit value object whenever either could reinterpret it
    def strNode(s: String, termLangNull: Boolean, coerceId: Boolean) =
      if (!coerceId && (cfg.defaultLang.isEmpty || termLangNull))
        F.textNode(s)
      else { val v = F.objectNode(); v.put("@value", s); v }

    def langNode(s: String, l: String, termLangNull: Boolean,
        coerceId: Boolean) =
      if (!coerceId && !termLangNull && cfg.defaultLang.contains(l) &&
        rnd.nextBoolean()) F.textNode(s)
      else {
        val v = F.objectNode()
        v.put("@value", s); v.put("@language", l); v
      }

    def objNode(o: Obj, coerceId: Boolean, termLangNull: Boolean,
        inline: Map[String, Node]): com.fasterxml.jackson.databind.JsonNode =
      o match {
        case ORef(id) if inline.contains(id) =>
          nodeObject(inline(id), Map.empty)
        case ORef(id) =>
          if (coerceId && !id.startsWith("_:")) F.textNode(idForm(id))
          else {
            val v = F.objectNode()
            v.put(if (cfg.aliasId && rnd.nextBoolean()) "id" else "@id",
              idForm(id))
            v
          }
        case OStr(s) => strNode(s, termLangNull, coerceId)
        case OLang(s, l) => langNode(s, l, termLangNull, coerceId)
        case OInt(n) => F.numberNode(n)
        case OBool(b) => F.booleanNode(b)
      }

    def nodeObject(n: Node, inline: Map[String, Node]): ObjectNode = {
      val o = F.objectNode()
      o.put(if (cfg.aliasId && rnd.nextBoolean()) "id" else "@id",
        idForm(n.id))
      if (n.types.nonEmpty) {
        val ta = F.arrayNode()
        n.types.foreach(ty => ta.add(typeForm(ty)))
        o.set[ObjectNode](
          if (cfg.aliasType && rnd.nextBoolean()) "type" else "@type",
          if (n.types.size == 1 && rnd.nextBoolean())
            F.textNode(typeForm(n.types.head))
          else ta)
      }
      n.props.foreach { case (p, os) =>
        val spec = cfg.terms.get(p)
        val coerceId = spec.exists(_._3)
        val langMap = spec.exists(_._4)
        val termLangNull = spec.exists(_._5)
        val idxMap = spec.exists(_._6)
        val key = keyForm(p)
        // language-map rendering: only when the term has the container
        // AND every value is language-tagged
        val allLang = os.forall(_.isInstanceOf[OLang])
        if (langMap && allLang && rnd.nextBoolean()) {
          val m = F.objectNode()
          os.collect { case OLang(s, l) => (l, s) }.groupBy(_._1)
            .foreach { case (l, vs) =>
              val a = F.arrayNode()
              vs.foreach(v => a.add(v._2))
              m.set[ObjectNode](l, a)
            }
          o.set[ObjectNode](key, m)
        } else if (idxMap && rnd.nextBoolean()) {
          // index map: opaque keys drop; values render as usual
          val m = F.objectNode()
          val groups = os.zipWithIndex.groupBy(_._2 % (1 + rnd.nextInt(2)))
          groups.foreach { case (gi, entries) =>
            val a = F.arrayNode()
            entries.foreach { case (ob, _) =>
              a.add(objNode(ob, coerceId, termLangNull, inline))
            }
            m.set[ObjectNode](s"i$gi", a)
          }
          o.set[ObjectNode](key, m)
        } else {
          val arr = F.arrayNode()
          os.foreach { ob =>
            val node = objNode(ob, coerceId, termLangNull, inline)
            // nested arrays flatten in value positions — wrap some
            if (rnd.nextInt(4) == 0) {
              val w = F.arrayNode(); w.add(node); arr.add(w)
            } else arr.add(node)
          }
          // a container-map term must always take a plain ARRAY here:
          // any bare object value (value object, @set wrapper) would
          // read as a language/index map — container-map
          // interpretation is unconditional for map values
          val rendered: com.fasterxml.jackson.databind.JsonNode =
            if (langMap || idxMap) arr
            else if (os.size == 1 && rnd.nextBoolean()) arr.get(0)
            else if (rnd.nextInt(4) == 0) {
              val s = F.objectNode(); s.set[ObjectNode]("@set", arr); s
            } else arr
          o.set[ObjectNode](key, rendered)
        }
      }
      if (n.rev.nonEmpty) {
        val rm = F.objectNode()
        n.rev.foreach { case (p, targets) =>
          val a = F.arrayNode()
          targets.foreach { t =>
            val v = F.objectNode(); v.put("@id", idForm(t)); a.add(v)
          }
          rm.set[ObjectNode](keyForm(p), a)
        }
        o.set[ObjectNode]("@reverse", rm)
      }
      o
    }

    doc.graphs.foreach { case (gOpt, nodes) =>
      // depth-1 inlining: bnode subjects referenced exactly once in
      // this graph, whose own objects hold no bnode refs, and that
      // aren't referenced from any OTHER graph or used as a graph name
      val graphNames = doc.graphs.flatMap(_._1).toSet
      val allRefs = doc.graphs.flatMap(_._2)
        .flatMap(_.props.flatMap(_._2)).collect { case ORef(id) => id }
      val localRefs = nodes.flatMap(_.props.flatMap(_._2))
        .collect { case ORef(id) => id }
      val inlineable = nodes.filter { n =>
        n.id.startsWith("_:") && !graphNames.contains(n.id) &&
          allRefs.count(_ == n.id) == 1 &&
          localRefs.count(_ == n.id) == 1 &&
          n.props.flatMap(_._2).forall {
            case ORef(id) => !id.startsWith("_:")
            case _ => true
          }
      }.map(n => n.id -> n).toMap
      val topNodes = nodes.filterNot(n => inlineable.contains(n.id))
      val rendered = topNodes.map(nodeObject(_, inlineable))
      gOpt match {
        case None => rendered.foreach(root.add)
        case Some(g) =>
          val w = F.objectNode()
          w.put("@id", g)
          val ga = F.arrayNode()
          rendered.foreach(ga.add)
          w.set[ObjectNode]("@graph", ga)
          root.add(w)
      }
    }

    // one shared context on a document wrapper
    val wrapper = F.objectNode()
    wrapper.set[ObjectNode]("@context", ctxNode())
    wrapper.set[ObjectNode]("@graph", root)
    new ObjectMapper().writeValueAsString(wrapper)
  }

  test("construction-directed JSON-LD fuzz: rendered docs expand to " +
      "their source quads exactly") {
    val prop = Prop.forAllNoShrink(genDoc, genCfg) { (doc, cfg) =>
      val json = render(doc, cfg)
      val got = new JsonLdParser(json).parse().toSet
      val exp = expected(doc)
      val ok = got == exp
      if (!ok) {
        val missing = exp -- got
        val extra = got -- exp
        println(s"JSONLD FUZZ MISMATCH\ndoc: $json\n" +
          s"missing: ${missing.mkString("\n         ")}\n" +
          s"extra:   ${extra.mkString("\n         ")}")
      }
      ok
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "150").toInt), prop)
    assert(result.passed, s"jsonld fuzz failed: ${result.status}")
  }
}
