package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.model.Term

/** Differential UPDATE fuzzing (VERDICT r8 next #9): random small
  * update sequences — INSERT/DELETE DATA, DELETE WHERE, DELETE/INSERT
  * WHERE, CLEAR/CREATE/DROP — rendered as SPARQL Update TEXT (the
  * parser is in the loop) and applied through [[GraftStore.update]],
  * checked against a naive driver-side quad-set model implementing the
  * spec's semantics directly: WHERE evaluates against the PRE-state,
  * deletes apply before inserts, graph ops maintain the registry.
  */
class UpdateFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // ---- term / quad universe -------------------------------------------
  // terms are tagged strings: "I" + iri | "L" + integer lexical
  private def iri(n: Int) = "I" + s"http://x/i$n"
  private def lit(n: Int) = "L" + n.toString
  private val preds = (0 until 3).map(n => s"http://x/p$n")
  private val graphs = Seq("", "http://x/g1", "http://x/g2") // "" = default

  private type Q = (String, String, String, String) // g(lex or ""), s, p, o

  private def sparqlTerm(t: String): String =
    if (t.startsWith("I")) s"<${t.tail}>" else t.tail

  // ---- generators -------------------------------------------------------
  private val genS = Gen.choose(0, 3).map(iri)
  private val genO = Gen.frequency(3 -> Gen.choose(0, 3).map(iri),
    1 -> Gen.choose(0, 5).map(lit))
  private val genP = Gen.oneOf(preds)
  private val genG = Gen.oneOf(graphs)
  private val genQuad: Gen[Q] =
    for { g <- genG; s <- genS; p <- genP; o <- genO } yield (g, s, p, o)

  /** One triple pattern: each position var or constant; vars a/b/c. */
  private case class TP(s: Either[String, String], p: Either[String, String],
      o: Either[String, String]) // Left = var name, Right = tagged term
  private val genTP: Gen[TP] = for {
    s <- Gen.frequency(2 -> Gen.const(Left("a")), 1 -> genS.map(Right(_)))
    p <- Gen.frequency(1 -> Gen.const(Left("b")), 2 -> genP.map(p =>
      Right("I" + p)))
    o <- Gen.frequency(2 -> Gen.const(Left("c")), 1 -> genO.map(Right(_)))
  } yield TP(s, p, o)

  private sealed trait Op
  private case class InsData(qs: Seq[Q]) extends Op
  private case class DelData(qs: Seq[Q]) extends Op
  private case class DelWhere(g: String, tp: TP) extends Op
  private case class Modify(g: String, del: Option[TP], ins: Option[TP],
      where: TP,
      /** render as `WITH <g> …` with BARE templates/WHERE instead of
        * explicit GRAPH wrapping — same semantics, different surface
        * syntax (only meaningful for a named graph context)
        */
      useWith: Boolean = false,
      /** render a `USING <g>` clause: the WHERE's default graph becomes
        * that named graph (§3.1.3); templates stay wherever they are
        * (bare = the real default graph)
        */
      usingG: Option[String] = None,
      /** render a `USING NAMED <g>` clause: the WHERE dataset's NAMED
        * set becomes {g} — GRAPH patterns consult it
        */
      usingNamedG: Option[String] = None) extends Op
  private case class ClearG(g: String) extends Op
  private case class CreateG(g: String) extends Op
  private case class DropG(g: String) extends Op

  /** Template positions must be var-compatible with the WHERE pattern
    * (engine + spec: unbound template vars skip the quad; keeping
    * template vars ⊆ where vars sidesteps that corner here — the
    * ill-formed-skip has its own fixtures).
    */
  private def genTemplate(where: TP): Gen[TP] = {
    def pos(w: Either[String, String], const: Gen[String]) =
      w match {
        case Left(v) => Gen.frequency(2 -> Gen.const(Left(v)),
          1 -> const.map(Right(_)))
        case Right(_) => const.map(Right(_))
      }
    for {
      s <- pos(where.s, genS)
      p <- pos(where.p, genP.map("I" + _))
      o <- pos(where.o, genO)
    } yield TP(s, p, o)
  }

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, genQuad)).map(InsData(_)),
    2 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, genQuad)).map(DelData(_)),
    2 -> (for { g <- genG; tp <- genTP } yield DelWhere(g, tp)),
    3 -> (for {
      g <- genG; w <- genTP
      d <- Gen.option(genTemplate(w)); i <- Gen.option(genTemplate(w))
      if d.nonEmpty || i.nonEmpty
      useWith <- Gen.oneOf(true, false)
    } yield Modify(g, d, i, w, useWith = useWith && g.nonEmpty)),
    // textual USING / USING NAMED: the WHERE dataset becomes
    // (default := USING graph | empty, named := {USING NAMED} | empty)
    // — a bare WHERE consults the default side, a GRAPH-wrapped WHERE
    // the named side; templates keep their own (real) target
    2 -> (for {
      ug <- Gen.option(Gen.oneOf(graphs.tail))
      un <- Gen.option(Gen.oneOf(graphs.tail))
      if ug.nonEmpty || un.nonEmpty
      g <- if (un.isEmpty) Gen.const("") else genG
      w <- genTP
      d <- Gen.option(genTemplate(w)); i <- Gen.option(genTemplate(w))
      if d.nonEmpty || i.nonEmpty
    } yield Modify(g, d, i, w, usingG = ug, usingNamedG = un)),
    1 -> Gen.oneOf(graphs.tail).map(ClearG(_)),
    1 -> Gen.oneOf(graphs.tail).map(CreateG(_)),
    1 -> Gen.oneOf(graphs.tail).map(DropG(_)))

  private val genSeq: Gen[(Seq[Q], List[Op], Option[String])] = for {
    init <- Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, genQuad))
    ops <- Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, genOp))
    // protocol-injected using-graph-uri: applies to every
    // pattern-matching op (the injection path rejects textual USING,
    // so strip those; WITH is accepted — USING overrides it)
    pu <- Gen.frequency(3 -> Gen.const(None),
      1 -> Gen.oneOf(graphs.tail).map(Some(_)))
  } yield (init.distinct,
    if (pu.isEmpty) ops
    else ops.map {
      // the injection path rejects textual USING and WITH (§2.2.3) —
      // render those ops without the conflicting clause
      case m: Modify if m.usingG.nonEmpty || m.usingNamedG.nonEmpty =>
        m.copy(usingG = None, usingNamedG = None)
      case m: Modify if m.useWith => m.copy(useWith = false)
      case op => op
    }, pu)

  // ---- SPARQL text rendering -------------------------------------------
  private def quadBlock(qs: Seq[Q]): String =
    qs.map { case (g, s, p, o) =>
      val t = s"${sparqlTerm(s)} <$p> ${sparqlTerm(o)} ." // p is raw
      if (g.isEmpty) t else s"GRAPH <$g> { $t }"
    }.mkString(" ")

  private def tpText(tp: TP): String = {
    def r(x: Either[String, String]) =
      x.fold(v => s"?$v", sparqlTerm)
    s"${r(tp.s)} ${r(tp.p)} ${r(tp.o)} ."
  }
  private def wrapped(g: String, body: String): String =
    if (g.isEmpty) body else s"GRAPH <$g> { $body }"

  private def text(op: Op): String = op match {
    case InsData(qs) => s"INSERT DATA { ${quadBlock(qs)} }"
    case DelData(qs) => s"DELETE DATA { ${quadBlock(qs)} }"
    case DelWhere(g, tp) => s"DELETE WHERE { ${wrapped(g, tpText(tp))} }"
    case Modify(g, d, i, w, useWith, usingG, usingNamedG) =>
      if (usingG.nonEmpty || usingNamedG.nonEmpty) {
        val del = d.map(t => s"DELETE { ${wrapped(g, tpText(t))} } ")
          .getOrElse("")
        val ins = i.map(t => s"INSERT { ${wrapped(g, tpText(t))} } ")
          .getOrElse("")
        val u = usingG.map(x => s"USING <$x> ").getOrElse("")
        val un = usingNamedG.map(x => s"USING NAMED <$x> ").getOrElse("")
        s"${del}${ins}${u}${un}WHERE { ${wrapped(g, tpText(w))} }"
      } else if (useWith) {
        val del = d.map(t => s"DELETE { ${tpText(t)} } ").getOrElse("")
        val ins = i.map(t => s"INSERT { ${tpText(t)} } ").getOrElse("")
        s"WITH <$g> ${del}${ins}WHERE { ${tpText(w)} }"
      } else {
        val del = d.map(t => s"DELETE { ${wrapped(g, tpText(t))} } ")
          .getOrElse("")
        val ins = i.map(t => s"INSERT { ${wrapped(g, tpText(t))} } ")
          .getOrElse("")
        s"${del}${ins}WHERE { ${wrapped(g, tpText(w))} }"
      }
    case ClearG(g) => s"CLEAR GRAPH <$g>"
    case CreateG(g) => s"CREATE SILENT GRAPH <$g>"
    case DropG(g) => s"DROP SILENT GRAPH <$g>"
  }

  // ---- naive model -------------------------------------------------------
  private case class Model(quads: Set[Q], registry: Set[String]) {
    def graphExists(g: String): Boolean =
      registry(g) || quads.exists(_._1 == g)
  }

  private def matchTp(tp: TP, q: (String, String, String))
      : Option[Map[String, String]] = {
    def m(x: Either[String, String], v: String,
        b: Map[String, String]): Option[Map[String, String]] = x match {
      case Right(c) => if (c == v) Some(b) else None
      case Left(name) => b.get(name) match {
        case Some(bound) => if (bound == v) Some(b) else None
        case None => Some(b + (name -> v))
      }
    }
    for {
      b1 <- m(tp.s, q._1, Map.empty)
      b2 <- m(tp.p, "I" + q._2, b1)
      b3 <- m(tp.o, q._3, b2)
    } yield b3
  }

  private def instantiate(tp: TP, b: Map[String, String], g: String)
      : Option[Q] = {
    def r(x: Either[String, String]) = x.fold(b.get, Some(_))
    for { s <- r(tp.s); p <- r(tp.p); o <- r(tp.o)
      // literals are not valid subjects/predicates: the engine skips
      // ill-formed instantiations; mirror it
      if s.startsWith("I") && p.startsWith("I") }
      yield (g, s, p.tail, o)
  }

  private def bindingsIn(m: Model, g: String, tp: TP)
      : Seq[Map[String, String]] =
    m.quads.toSeq.filter(_._1 == g)
      .flatMap(q => matchTp(tp, (q._2, q._3, q._4)))

  private def applyOp(m: Model, op: Op,
      pu: Option[String] = None): Model = op match {
    case InsData(qs) => m.copy(quads = m.quads ++ qs)
    case DelData(qs) => m.copy(quads = m.quads -- qs)
    case DelWhere(g, tp) =>
      // a bare pattern matches the WHERE default graph — replaced by
      // the injected using graph; a GRAPH-wrapped pattern consults the
      // dataset's NAMED set, which an injected dataset leaves EMPTY
      // (using-graph-uri without using-named-graph-uri, like FROM
      // without FROM NAMED) — so it matches nothing
      val bs =
        if (g.isEmpty) bindingsIn(m, pu.getOrElse(""), tp)
        else if (pu.isDefined) Seq.empty
        else bindingsIn(m, g, tp)
      val dels = bs.flatMap(b => instantiate(tp, b, g))
      m.copy(quads = m.quads -- dels)
    case Modify(g, d, i, w, useWith, usingG, usingNamedG) =>
      // USING/USING NAMED (textual or injected) replace the WHERE
      // dataset: default := USING graphs | EMPTY, named := USING
      // NAMED set | EMPTY. A bare WHERE consults the default side, a
      // GRAPH-wrapped one the named side; templates keep their own
      // target. (The generator never combines WITH with an injection
      // — the engine rejects that.)
      val dataset: Option[(Option[String], Set[String])] =
        if (usingG.nonEmpty || usingNamedG.nonEmpty)
          Some((usingG, usingNamedG.toSet))
        else pu.map(p => (Some(p), Set.empty[String]))
      val bs = dataset match {
        case Some((dflt, named)) =>
          if (g.isEmpty)
            dflt.map(bindingsIn(m, _, w)).getOrElse(Seq.empty)
          else if (named(g)) bindingsIn(m, g, w)
          else Seq.empty
        case None => bindingsIn(m, g, w)
      }
      val dels = d.toSeq.flatMap(t => bs.flatMap(b => instantiate(t, b, g)))
      val inss = i.toSeq.flatMap(t => bs.flatMap(b => instantiate(t, b, g)))
      m.copy(quads = m.quads -- dels ++ inss)
    case ClearG(g) =>
      Model(m.quads.filterNot(_._1 == g),
        if (m.graphExists(g)) m.registry + g else m.registry)
    case CreateG(g) => m.copy(registry = m.registry + g)
    case DropG(g) =>
      Model(m.quads.filterNot(_._1 == g), m.registry - g)
  }

  // ---- engine side -------------------------------------------------------
  private def quadsDf(qs: Seq[Q]) = {
    def term(t: String): Row =
      if (t.startsWith("I")) Row(Term.IriKind.toByte, t.tail, null, null)
      else Row(Term.LiteralKind.toByte, t.tail, Term.XsdInteger, null)
    val dg = Row(Term.DefaultGraphKind.toByte, null, null, null)
    val rows = qs.map { case (g, s, p, o) =>
      Row(if (g.isEmpty) dg else Row(Term.IriKind.toByte, g, null, null),
        term(s), term("I" + p), term(o))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2),
      org.apache.spark.sql.types.StructType(Seq("g", "s", "p", "o").map(n =>
        org.apache.spark.sql.types.StructField(n, Term.schema, true))))
  }

  private def canonStore(st: GraftStore): Set[Q] =
    st.quads.collect().map { r =>
      def tag(t: Row) =
        if (t.getByte(0) == Term.IriKind.toByte) "I" + t.getString(1)
        else "L" + t.getString(1)
      val g = r.getAs[Row]("g")
      val gl = if (g.getByte(0) == Term.DefaultGraphKind.toByte) ""
        else g.getString(1)
      (gl, tag(r.getAs[Row]("s")), r.getAs[Row]("p").getString(1),
        tag(r.getAs[Row]("o")))
    }.toSet

  test("random update sequences match the naive quad-set model " +
      "(quads AND named-graph registry)") {
    val prop = Prop.forAllNoShrink(genSeq) { case (init, ops, pu) =>
      val updateText = ops.map(text).mkString(" ;\n")
      val modelEnd = ops.foldLeft(Model(init.toSet, Set.empty))(
        (m, op) => applyOp(m, op, pu))
      val st = GraftStore(quadsDf(init))
        .update(updateText, pu.toSeq, Nil)
      val engineQuads = canonStore(st)
      val modelGraphs = modelEnd.registry ++
        modelEnd.quads.map(_._1).filter(_.nonEmpty)
      val ok = engineQuads == modelEnd.quads &&
        st.namedGraphs.toSet == modelGraphs
      if (!ok) {
        println(s"UPDATE MISMATCH\ninit=$init\ntext=\n$updateText\n" +
          s"model=${modelEnd.quads.toSeq.sorted}\n" +
          s"engine=${engineQuads.toSeq.sorted}\n" +
          s"modelGraphs=$modelGraphs engineGraphs=${st.namedGraphs}")
      }
      ok
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_UPDATE_FUZZ_N", "60").toInt), prop)
    assert(result.passed, s"update differential failed: ${result.status}")
  }
}
