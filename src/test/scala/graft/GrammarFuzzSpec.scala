package graft

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.algebra.Algebra._
import graft.model.Term
import graft.parser.SparqlParser

/** Text-level grammar fuzzing (the reference tests its parser with
  * sparql-smith-generated queries): generate SPARQL TEXT and the algebra
  * the parser is SPECIFIED to produce, in lockstep; then compare the
  * parsed query's execution against the hand-built algebra's execution
  * on random data. Catches tokenizer/precedence/scoping bugs that the
  * algebra-level DifferentialSpec can never see.
  */
class GrammarFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private val ns = "http://x/"
  private val preds = Seq("p0", "p1", "p2")
  private def node(n: Int) = s"${ns}n$n"

  // ---- random data ----------------------------------------------------
  private val genQuad: Gen[(String, String, Either[String, Long])] = for {
    s <- Gen.choose(0, 5)
    p <- Gen.oneOf(preds)
    o <- Gen.oneOf(
      Gen.choose(0, 5).map(i => Left(node(i))),
      Gen.choose(0L, 5L).map(Right(_)))
  } yield (node(s), ns + p, o)
  // each quad optionally carries an RDF-star annotation:
  // << s p o >> :src <s> joins the data so quoted patterns can match
  private val genData: Gen[Seq[((String, String, Either[String, Long]), Boolean)]] =
    Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n,
      Gen.zip(genQuad, Gen.frequency(4 -> Gen.const(false),
        1 -> Gen.const(true)))))

  private def quadsDf(
      data: Seq[((String, String, Either[String, Long]), Boolean)]) = {
    import graft.model.QuotedTriple
    def iri(v: String) = Row(Term.IriKind.toByte, v, null, null)
    def lit(v: Long) =
      Row(Term.LiteralKind.toByte, v.toString, Term.XsdInteger, null)
    def q(v: Either[String, Long]) = v.fold(
      x => QuotedTriple.QTerm(Term.IriKind.toByte, x, null, null),
      n => QuotedTriple.QTerm(Term.LiteralKind.toByte, n.toString,
        Term.XsdInteger, null))
    val dg = Row(Term.DefaultGraphKind.toByte, null, null, null)
    val rows = data.flatMap { case ((s, p, o), annotated) =>
      val base = Row(dg, iri(s), iri(p), o.fold(iri, lit))
      if (!annotated) Seq(base)
      else Seq(base, Row(dg,
        Row(Term.QuotedKind.toByte,
          QuotedTriple.encode(q(Left(s)), q(Left(p)), q(o)), null, null),
        iri(ns + "src"), iri(s)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), Term.quadSchema)
  }

  // ---- paired text + algebra generator --------------------------------
  private final case class Piece(text: String, alg: GraphPattern)

  private val genVar: Gen[String] = Gen.oneOf("a", "b", "c", "d")
  private def term(v: Either[String, Int]): (String, TermPat) = v match {
    case Left(name) => (s"?$name", V(name))
    case Right(i) => (s":n$i", I(node(i)))
  }

  private val genPlainTriple: Gen[Piece] = for {
    s <- Gen.oneOf(genVar.map(Left(_)), Gen.choose(0, 5).map(Right(_)))
    p <- Gen.oneOf(preds)
    o <- Gen.frequency(
      3 -> genVar.map(Left(_)),
      1 -> Gen.choose(0, 5).map(Right(_)))
  } yield {
    val (st, sa) = term(s); val (ot, oa) = term(o)
    Piece(s"$st :$p $ot .", Bgp(TriplePattern(sa, I(ns + p), oa)))
  }

  // SPARQL-star: quoted-triple pattern in subject position against the
  // :src annotations the data generator emits
  private val genStarTriple: Gen[Piece] = for {
    s <- Gen.oneOf(genVar.map(Left(_)), Gen.choose(0, 5).map(Right(_)))
    p <- Gen.oneOf(preds)
    o <- Gen.frequency(
      3 -> genVar.map(Left(_)),
      1 -> Gen.choose(0, 5).map(Right(_)))
    av <- genVar
  } yield {
    val (st, sa) = term(s); val (ot, oa) = term(o)
    Piece(s"<< $st :$p $ot >> :src ?$av .",
      Bgp(TriplePattern(Q(sa, I(ns + p), oa), I(ns + "src"), V(av))))
  }

  private val genTriple: Gen[Piece] =
    Gen.frequency(6 -> genPlainTriple, 1 -> genStarTriple)

  /** Paired path TEXT + the Path algebra the grammar's precedence
    * SPECIFIES (rules [88]–[94]): '|' binds loosest, then '/', then
    * '^', with the ?, +, * mods postfix on a primary; parens and NPS
    * are primaries. Text is emitted UNPARENTHESIZED (except the
    * explicit paren arm) so the parser's precedence is what gets
    * checked.
    */
  private def genPathPair(depth: Int): Gen[(String, Path)] = {
    val prim: Gen[(String, Path)] = Gen.frequency(
      5 -> Gen.oneOf(preds).map(p => (s":$p", PLink(ns + p): Path)),
      1 -> (for {
        fwd <- Gen.someOf(preds); inv <- Gen.someOf(preds)
        if fwd.nonEmpty || inv.nonEmpty
        bare <- Gen.oneOf(true, false)
      } yield {
        val items = fwd.map(p => s":$p") ++ inv.map(p => s"^:$p")
        val alg: Path = PNeg(fwd.map(ns + _).toSeq, inv.map(ns + _).toSeq)
        if (bare && items.size == 1) (s"!${items.head}", alg)
        else (items.mkString("!(", "|", ")"), alg)
      }),
      (if (depth > 0) 1 else 0) -> Gen.lzy(
        genPathPair(depth - 1).map { case (t, a) => (s"($t)", a) }))
    val elt: Gen[(String, Path)] = for {
      (t, a) <- prim; mod <- Gen.frequency(4 -> Gen.const(""),
        1 -> Gen.oneOf("?", "+", "*"))
    } yield mod match {
      case "" => (t, a)
      case "?" => (t + "?", PZeroOrOne(a))
      case "+" => (t + "+", POneOrMore(a))
      case _ => (t + "*", PZeroOrMore(a))
    }
    val inv: Gen[(String, Path)] = Gen.frequency(
      4 -> elt, 1 -> elt.map { case (t, a) => ("^" + t, PInv(a)) })
    val seq: Gen[(String, Path)] =
      Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, inv)).map(xs =>
        (xs.map(_._1).mkString("/"),
          xs.map(_._2).reduceLeft(PSeq(_, _))))
    Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, seq)).map(xs =>
      (xs.map(_._1).mkString("|"),
        xs.map(_._2).reduceLeft(PAlt(_, _))))
  }

  private val genPathTriple: Gen[Piece] = for {
    s <- Gen.oneOf(genVar.map(Left(_)), Gen.choose(0, 5).map(Right(_)))
    o <- Gen.frequency(3 -> genVar.map(Left(_)),
      1 -> Gen.choose(0, 5).map(Right(_)))
    (pt, pa) <- genPathPair(1)
  } yield {
    val (st, sa) = term(s); val (ot, oa) = term(o)
    Piece(s"$st $pt $ot .", PathPattern(sa, pa, oa))
  }

  /** One group graph pattern: mirrors the parser's accumulation rules
    * (triples JOIN in order, OPTIONAL left-joins the accumulated group,
    * UNION groups join in, group-level FILTERs wrap the whole group).
    */
  private val genTripleGroup: Gen[Piece] =
    Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, genTriple)).map { ts =>
      val alg = ts.map(_.alg).reduceLeft[GraphPattern](Join(_, _))
      Piece(ts.map(_.text).mkString("{ ", " ", " }"), alg)
    }

  private def genGroup(depth: Int): Gen[Piece] = for {
    triples <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genTriple))
    extras <- if (depth == 0) Gen.const(Seq.empty[Int])
      else Gen.someOf(Seq(1, 2, 3, 4, 5, 6, 7, 8)).map(_.toSeq)
    optG <- genTripleGroup
    u1 <- genTripleGroup; u2 <- genTripleGroup
    minusG <- genTripleGroup
    existsG <- genTripleGroup
    existsPos <- Gen.oneOf(true, false)
    pathT <- genPathTriple
    subG <- genTripleGroup
    subVarPick <- Gen.choose(0, 3)
    filtVar <- genVar
    filtN <- Gen.choose(0, 5)
    valVar <- genVar
    bindVar <- Gen.oneOf("x", "y")
  } yield {
    var acc: GraphPattern = Bgp()
    def add(g: GraphPattern): Unit = acc = acc match {
      case Bgp(ps @ _*) if ps.isEmpty => g
      case a => Join(a, g)
    }
    val sb = new StringBuilder("{\n")
    triples.foreach { t => sb.append("  " + t.text + "\n"); add(t.alg) }
    if (extras.contains(1)) { // OPTIONAL
      sb.append(s"  OPTIONAL ${optG.text}\n")
      acc = LeftJoin(acc, optG.alg, None)
    }
    if (extras.contains(2)) { // UNION pair
      sb.append(s"  ${u1.text} UNION ${u2.text}\n")
      add(Union(u1.alg, u2.alg))
    }
    if (extras.contains(3)) { // VALUES
      sb.append(s"  VALUES ?$valVar { :n0 :n2 }\n")
      add(ValuesPat(Seq(valVar),
        Seq(Seq(Some(I(node(0)))), Seq(Some(I(node(2)))))))
    }
    if (extras.contains(4)) { // BIND (fresh var)
      sb.append(s"  BIND(?$filtVar + 1 AS ?$bindVar)\n")
      acc = Extend(acc, bindVar,
        EFn("+", EVar(filtVar), ELit("1", Term.XsdInteger)))
    }
    if (extras.contains(5)) { // MINUS applies to the group so far
      sb.append(s"  MINUS ${minusG.text}\n")
      acc = Minus(acc, minusG.alg)
    }
    if (extras.contains(7)) { // property path in text (precedence)
      sb.append("  " + pathT.text + "\n")
      add(pathT.alg)
    }
    if (extras.contains(8)) { // subselect joins in by projected vars
      val scope = inScopeVars(subG.alg).toSeq.sorted
      if (scope.nonEmpty) {
        val vs = Seq(scope(subVarPick % scope.size))
        sb.append(
          s"  { SELECT ${vs.map("?" + _).mkString(" ")} " +
            s"WHERE ${subG.text} }\n")
        add(Project(subG.alg, vs))
      }
    }
    if (extras.contains(6)) { // FILTER [NOT] EXISTS wraps the group
      val kw = if (existsPos) "EXISTS" else "NOT EXISTS"
      sb.append(s"  FILTER $kw ${existsG.text}\n")
      acc = Filter(EExists(existsG.alg, existsPos), acc)
    }
    // group-level FILTER wraps the accumulated group (parser rule)
    val withFilter = if (depth > 0) {
      sb.append(s"  FILTER(?$filtVar < $filtN || isIRI(?$filtVar))\n")
      Filter(EFn("||",
        EFn("<", EVar(filtVar), ELit(filtN.toString, Term.XsdInteger)),
        EFn("isIRI", EVar(filtVar))), acc)
    } else acc
    sb.append("}")
    Piece(sb.toString, withFilter)
  }

  test("CONSTRUCT instantiation matches naive §16.2 semantics " +
      "(unbound-skip, ill-formed-skip, set dedup)") {
    // template positions: a body var (sometimes one that can bind a
    // LITERAL — ill-formed in subject position, skipped), an absent
    // var (always unbound — the whole triple skips), or constants
    type TT = (Either[String, String], String, Either[String, String])
    val genBodyTriple: Gen[(String, String, String)] = for {
      s <- genVar; p <- Gen.oneOf(preds); o <- genVar
    } yield (s, p, o)
    def pos(bodyVars: Seq[String]): Gen[Either[String, String]] =
      Gen.frequency(
        4 -> Gen.oneOf(bodyVars).map(Left(_)),
        1 -> Gen.const(Left("z")), // never bound
        2 -> Gen.choose(0, 5).map(n => Right(s":n$n")))
    val gen = for {
      body <- Gen.chooseNum(1, 2).flatMap(n =>
        Gen.listOfN(n, genBodyTriple))
      bodyVars = body.flatMap(t => Seq(t._1, t._3)).distinct
      tmpl <- Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, for {
        s <- pos(bodyVars); p <- Gen.oneOf(preds); o <- pos(bodyVars)
      } yield (s, p, o): TT))
    } yield (body, tmpl)
    val prop = Prop.forAllNoShrink(genData, gen) {
      case (data, (body, tmpl)) =>
        val quads = quadsDf(data)
        def tText(x: Either[String, String]) = x.fold("?" + _, identity)
        val text = s"PREFIX : <$ns>\nCONSTRUCT { " +
          tmpl.map(t => s"${tText(t._1)} :${t._2} ${tText(t._3)} . ")
            .mkString +
          "} WHERE { " +
          body.map(t => s"?${t._1} :${t._2} ?${t._3} . ").mkString + "}"
        // naive: BGP solutions over the plain (non-star) triples
        type B = Map[String, Either[String, Long]]
        val plain = data.map(_._1)
        val sols = body.foldLeft(Seq(Map.empty: B)) { case (acc, (sv, p, ov)) =>
          for {
            b <- acc
            (s, pp, o) <- plain
            if pp == ns + p
            b1 <- (b.get(sv) match {
              case Some(x) => if (x == Left(s)) Some(b) else None
              case None => Some(b + (sv -> (Left(s): Either[String, Long])))
            }).toSeq
            b2 <- (b1.get(ov) match {
              case Some(x) => if (x == o) Some(b1) else None
              case None => Some(b1 + (ov -> o))
            }).toSeq
          } yield b2
        }
        def term(x: Either[String, String], b: B)
            : Option[Either[String, Long]] = x match {
          case Left(v) => b.get(v)
          case Right(c) =>
            if (c.startsWith(":n")) Some(Left(node(c.drop(2).toInt)))
            else Some(Left(c))
        }
        val expected = (for {
          b <- sols; (sv, p, ov) <- tmpl
          s <- term(sv, b); o <- term(ov, b)
          // ill-formed skip: a literal subject never emits
          if s.isLeft
        } yield (s, ns + p, o)).toSet
        val df = SparqlParser.execute(text, quads)
        val got = df.collect().map { r =>
          def read(t: Row): Either[String, Long] =
            if (t.getByte(0) == Term.IriKind.toByte) Left(t.getString(1))
            else Right(t.getString(1).toLong)
          (read(r.getAs[Row]("s")), r.getAs[Row]("p").getString(1),
            read(r.getAs[Row]("o")))
        }.toSet
        if (got != expected)
          println(s"CONSTRUCT MISMATCH\n$text\ndata=$data\n" +
            s"expected=$expected\ngot=$got")
        got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "40").toInt), prop)
    assert(result.passed, s"construct fuzz failed: ${result.status}")
  }

  test("CONSTRUCT template bnodes mint fresh per solution " +
      "(§16.2.1, isomorphism compare)") {
    // term of the compared graphs: Left(ground) or Right(bnode label);
    // expected-side bnodes are keyed (template label, solution index),
    // got-side bnodes carry whatever lex the engine minted — equality
    // is up to bnode bijection (RDF graph isomorphism)
    type G = Either[String, Long]
    type T = Either[G, String]
    type Tr = (T, String, T)
    // template position: body var / constant / template bnode label
    sealed trait P
    case class PV(v: String) extends P
    case class PC(n: Int) extends P
    case class PB(l: String) extends P
    val genBodyTriple: Gen[(String, String, String)] = for {
      s <- genVar; p <- Gen.oneOf(preds); o <- genVar
    } yield (s, p, o)
    def pos(bodyVars: Seq[String]): Gen[P] = Gen.frequency(
      3 -> Gen.oneOf(bodyVars).map(PV),
      1 -> Gen.choose(0, 5).map(PC),
      3 -> Gen.oneOf("b0", "b1").map(PB))
    val gen = for {
      body <- Gen.chooseNum(1, 2).flatMap(n =>
        Gen.listOfN(n, genBodyTriple))
      bodyVars = body.flatMap(t => Seq(t._1, t._3)).distinct
      tmpl <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, for {
        s <- pos(bodyVars); p <- Gen.oneOf(preds); o <- pos(bodyVars)
      } yield (s, p, o)))
      if tmpl.exists(t => Seq(t._1, t._3).exists(_.isInstanceOf[PB]))
    } yield (body, tmpl)
    // small data keeps solution counts (and so bnode counts) testable
    val genSmallData = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.zip(genQuad, Gen.const(false))))
    val prop = Prop.forAllNoShrink(genSmallData, gen) {
      case (data, (body, tmpl)) =>
        def pText(x: P) = x match {
          case PV(v) => s"?$v"
          case PC(n) => s":n$n"
          case PB(l) => s"_:$l"
        }
        val text = s"PREFIX : <$ns>\nCONSTRUCT { " +
          tmpl.map(t => s"${pText(t._1)} :${t._2} ${pText(t._3)} . ")
            .mkString +
          "} WHERE { " +
          body.map(t => s"?${t._1} :${t._2} ?${t._3} . ").mkString + "}"
        type B = Map[String, G]
        val plain = data.map(_._1)
        val sols = body.foldLeft(Seq(Map.empty: B)) {
          case (acc, (sv, p, ov)) =>
            for {
              b <- acc
              (s, pp, o) <- plain
              if pp == ns + p
              b1 <- (b.get(sv) match {
                case Some(x) => if (x == Left(s)) Some(b) else None
                case None => Some(b + (sv -> (Left(s): G)))
              }).toSeq
              b2 <- (b1.get(ov) match {
                case Some(x) => if (x == o) Some(b1) else None
                case None => Some(b1 + (ov -> o))
              }).toSeq
            } yield b2
        }
        if (sols.size > 12) true // keep the iso search tractable
        else {
          // naive §16.2.1: label ℓ in solution i is the bnode (ℓ, i) —
          // shared across the template within a solution, fresh across
          // solutions
          def term(x: P, b: B, i: Int): Option[T] = x match {
            case PV(v) => b.get(v).map(Left(_))
            case PC(n) => Some(Left(Left(node(n))))
            case PB(l) => Some(Right(s"$l#$i"))
          }
          val expected: Set[Tr] = (for {
            (b, i) <- sols.zipWithIndex; (sv, p, ov) <- tmpl
            s <- term(sv, b, i); o <- term(ov, b, i)
            if (s match { // a literal subject is ill-formed: skip
              case Left(Right(_)) => false
              case _ => true
            })
          } yield (s, ns + p, o)).toSet
          val df = SparqlParser.execute(text, quadsDf(data))
          val got: Set[Tr] = df.collect().map { r =>
            def read(t: Row): T = t.getByte(0) match {
              case k if k == Term.IriKind.toByte => Left(Left(t.getString(1)))
              case k if k == Term.BlankKind.toByte => Right(t.getString(1))
              case _ => Left(Right(t.getString(1).toLong))
            }
            (read(r.getAs[Row]("s")), r.getAs[Row]("p").getString(1),
              read(r.getAs[Row]("o")))
          }.toSet
          // graph isomorphism: find a bnode bijection got -> expected.
          // Backtracking with partial-consistency pruning; graphs here
          // are small (≤ 12 solutions × 2 labels) and ground anchors
          // individualize most bnodes, so the search is tiny in practice
          def labels(ts: Set[Tr]) = ts.toSeq
            .flatMap(t => Seq(t._1, t._3))
            .collect { case Right(l) => l }
          val gl = labels(got)
          val glOrdered = gl.distinct.sortBy(l => -gl.count(_ == l))
          val el = labels(expected).distinct
          def mapT(t: T, m: Map[String, String]): T = t match {
            case Right(l) => Right(m.getOrElse(l, l)); case x => x
          }
          def mapTr(tr: Tr, m: Map[String, String]): Tr =
            (mapT(tr._1, m), tr._2, mapT(tr._3, m))
          var steps = 0
          def search(rem: List[String], avail: Set[String],
              m: Map[String, String]): Boolean = {
            steps += 1
            if (steps > 100000) false
            else rem match {
              case Nil => got.map(mapTr(_, m)) == expected
              case h :: t => avail.exists { e =>
                val m2 = m + (h -> e)
                val ok = got.forall { tr =>
                  val bs = Seq(tr._1, tr._3).collect { case Right(l) => l }
                  bs.isEmpty || !bs.forall(m2.contains) ||
                    expected.contains(mapTr(tr, m2))
                }
                ok && search(t, avail - e, m2)
              }
            }
          }
          val isIso = got.size == expected.size &&
            glOrdered.size == el.size &&
            search(glOrdered.toList, el.toSet, Map.empty)
          if (!isIso)
            println(s"CONSTRUCT BNODE MISMATCH\n$text\ndata=$data\n" +
              s"expected=$expected\ngot=$got\nsteps=$steps")
          isIso
        }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "40").toInt), prop)
    assert(result.passed, s"construct bnode fuzz failed: ${result.status}")
  }

  test("CONSTRUCT bnode freshness: shared within a solution, " +
      "distinct across solutions (directed)") {
    val data = Seq(((node(0), ns + "p0", Left(node(1)): Either[String, Long]), false),
      ((node(2), ns + "p0", Left(node(3)): Either[String, Long]), false))
    val df = SparqlParser.execute(
      s"PREFIX : <$ns>\nCONSTRUCT { _:x :q ?s . _:x :r :n5 . } " +
        "WHERE { ?s :p0 ?o }", quadsDf(data))
    val rows = df.collect()
    assert(rows.length == 4, rows.mkString("\n"))
    def bn(r: Row) = r.getAs[Row]("s").getString(1)
    val byPred = rows.groupBy(_.getAs[Row]("p").getString(1))
    val qRows = byPred(ns + "q"); val rRows = byPred(ns + "r")
    // two solutions → two DISTINCT bnodes on each template triple
    assert(qRows.map(bn).distinct.length == 2, "fresh per solution")
    assert(rRows.map(bn).distinct.length == 2, "fresh per solution")
    // within a solution the label ?x is ONE bnode: the :q triple for
    // subject n0 and some :r triple share their bnode, pairwise
    assert(qRows.map(bn).toSet == rRows.map(bn).toSet,
      "same label => same bnode within each solution")
  }

  test("CONSTRUCT template internal reifier << s p o ~ >> (wave 28)") {
    val data = Seq(((node(0), ns + "p0", Left(node(1)): Either[String, Long]), false),
      ((node(2), ns + "p0", Left(node(3)): Either[String, Long]), false))
    val df = SparqlParser.execute(
      s"PREFIX : <$ns>\nCONSTRUCT { << ?s :q ?o ~ >> :note \"n\" . } " +
        "WHERE { ?s :p0 ?o }", quadsDf(data))
    val rows = df.collect()
    // per solution: r rdf:reifies <<(s q o)>> plus r :note "n"
    assert(rows.length == 4, rows.mkString("\n"))
    val reifies = rows.filter(_.getAs[Row]("p").getString(1).endsWith("reifies"))
    val notes = rows.filter(_.getAs[Row]("p").getString(1) == ns + "note")
    assert(reifies.length == 2 && notes.length == 2)
    // the note subjects are exactly the reifier bnodes, pairwise fresh
    def s1(r: Row) = r.getAs[Row]("s").getString(1)
    assert(reifies.map(s1).toSet == notes.map(s1).toSet)
    assert(reifies.map(s1).distinct.length == 2)
    assert(reifies.forall(_.getAs[Row]("o").getByte(0) ==
      graft.model.Term.QuotedKind.toByte))
  }

  test("BIND(BNODE()) column is consistent across CONSTRUCT template " +
      "branches (nondeterministic-column multi-consumer, r12 class)") {
    val data = Seq(((node(0), ns + "p0", Left(node(1)): Either[String, Long]), false),
      ((node(2), ns + "p0", Left(node(3)): Either[String, Long]), false))
    val df = SparqlParser.execute(
      s"PREFIX : <$ns>\nCONSTRUCT { ?s :x ?b . ?b :y ?o . } " +
        "WHERE { ?s :p0 ?o . BIND(BNODE() AS ?b) }", quadsDf(data))
    val rows = df.collect()
    assert(rows.length == 4, rows.mkString("\n"))
    val byPred = rows.groupBy(_.getAs[Row]("p").getString(1))
    // the ?b minted for a solution must be the SAME term in the :x
    // triple's object and the :y triple's subject — if the template
    // union re-evaluates the uuid() column per branch, they diverge
    val xB = byPred(ns + "x").map(_.getAs[Row]("o").getString(1)).toSet
    val yB = byPred(ns + "y").map(_.getAs[Row]("s").getString(1)).toSet
    assert(xB == yB, s"bnode identity split across branches: $xB vs $yB")
    assert(xB.size == 2, "fresh per solution")
  }

  test("parsed text executes identically to the specified algebra") {
    val prop = Prop.forAllNoShrink(genData, genGroup(1)) { (data, piece) =>
      val quads = quadsDf(data)
      val text = s"PREFIX : <$ns>\nSELECT * WHERE ${piece.text}"
      val parsed = SparqlParser.execute(text, quads)
      val direct = graft.exec.Translator.translate(piece.alg, quads)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
        val cols = df.columns.sorted
        if (cols.isEmpty) Seq.fill(df.count().toInt)("[]")
        else df.select(cols.head, cols.tail: _*).collect()
          .map(_.toString).sorted.toSeq
      }
      val (g, e) = (rows(parsed), rows(direct.df))
      if (g != e)
        println(s"TEXT/ALGEBRA MISMATCH\nquery:\n$text\nalg: ${piece.alg}\n" +
          s"data: $data\nparsed: $g\ndirect: $e")
      g == e
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "25").toInt), prop)
    assert(result.passed, s"grammar fuzz failed: ${result.status}")
  }
}
