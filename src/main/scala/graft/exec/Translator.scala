package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Term
import graft.algebra.Algebra._
import graft.expr.SparqlExpr
import graft.expr.SparqlExpr._
import graft.io.{DfQuadSource, QuadSource}

/** Algebra -> DataFrame translation: the engine core.
  *
  * Plays the role of the reference's evaluator (oxigraph:
  * lib/spareval/src/eval.rs · SimpleEvaluator) but declaratively: every
  * algebra node becomes a Catalyst logical plan fragment, so predicate
  * pushdown / join strategy / AQE replace the reference's hand-rolled
  * Volcano closures and its sparopt join-algorithm annotations
  * (SURVEY.md §3.4, §4).
  *
  * A solution sequence is a DataFrame with one Term-struct column per
  * variable; SQL NULL == SPARQL unbound. `sure` tracks variables that are
  * provably bound, letting shared-variable joins stay equi-joins
  * (hash-joinable) instead of degrading to the compatibility theta-join
  * (SURVEY.md §7.3-3).
  */
object Translator {

  /** Graph scope for BGP evaluation (SPARQL dataset semantics). */
  sealed trait GraphCtx
  case object DefaultG extends GraphCtx
  final case class FixedG(iri: String) extends GraphCtx
  final case class VarG(v: String) extends GraphCtx

  final case class Sol(df: DataFrame, vars: Set[String], sure: Set[String],
      cls: Map[String, Term.VClass] = Map.empty) {
    def bind: String => Option[Column] =
      n => if (vars(n)) Some(col(n)) else None
    /** Inference-lattice lookup for SparqlExpr hint params. */
    def hint: String => Option[Term.VClass] = cls.get
  }

  /** Merge the two sides' value-class claims across a join. A claim for
    * a shared variable survives only when the joined output value is
    * guaranteed to come from a claiming side: both agree, or the
    * claiming side is `sure` (the output coalesce always picks it — for
    * a right-side claim only under inner join, where the compatibility
    * clause forces equality).
    */
  private def mergeCls(l: Sol, r: Sol,
      joinType: String): Map[String, Term.VClass] = joinType match {
    case "left_semi" | "left_anti" => l.cls
    case _ =>
      val shared = l.vars & r.vars
      val lOnly = l.cls.filter { case (v, _) => !shared(v) }
      val rOnly = r.cls.filter { case (v, _) => !shared(v) }
      val merged = shared.flatMap { v =>
        (l.cls.get(v), r.cls.get(v)) match {
          case (Some(a), Some(b)) if a == b => Some(v -> a)
          case (Some(a), _) if l.sure(v) => Some(v -> a)
          case (_, Some(b)) if r.sure(v) && joinType == "inner" =>
            Some(v -> b)
          case _ => None
        }
      }
      lOnly ++ rOnly ++ merged
  }

  private def varName(tp: TermPat): Option[String] = tp match {
    case V(n) => Some(n)
    case B(id) => Some("_bnode_" + id)
    case _ => None
  }

  private def constFilter(c: Column, tp: TermPat): Option[Column] = tp match {
    case I(iri) => Some(c("kind") === Term.IriKind && c("lex") === iri)
    case L(lex, dt, lang) => Some(
      c("kind") === Term.LiteralKind && c("lex") === lex && c("dt") === dt &&
        lang.map(l => c("lang") === l).getOrElse(c("lang").isNull))
    // quoted pattern: fully constant compares as one canonical lex
    // (pushdown-friendly); with inner variables only the kind is known
    // here — components bind/filter via QuotedParts in scanPattern
    case q: Q => Some(constQLex(q) match {
      case Some(lexv) => c("kind") === Term.QuotedKind && c("lex") === lexv
      case None => c("kind") === Term.QuotedKind
    })
    case _ => None
  }

  /** Canonical lex of a fully-constant quoted pattern. */
  private def constQLex(q: Q): Option[String] = {
    import graft.model.QuotedTriple
    def qt(tp: TermPat): Option[QuotedTriple.QTerm] = tp match {
      case I(iri) =>
        Some(QuotedTriple.QTerm(Term.IriKind.toByte, iri, null, null))
      case L(lex, dt, lang) => Some(QuotedTriple.QTerm(
        Term.LiteralKind.toByte, lex, dt, lang.orNull))
      case q2: Q => constQLex(q2).map(l =>
        QuotedTriple.QTerm(Term.QuotedKind.toByte, l, null, null))
      case _ => None
    }
    for { s <- qt(q.s); p <- qt(q.p); o <- qt(q.o) }
      yield QuotedTriple.encode(s, p, o)
  }

  /** Term-struct literal for a constant pattern (path closure seeds). */
  private def constCol(tp: TermPat): Option[Column] = tp match {
    case I(iri) => Some(Term.iri(iri))
    case L(lex, dt, lang) => Some(lang match {
      case Some(l) => Term.taggedLit(lit(lex), l)
      case None => Term.typedLit(lit(lex), dt)
    })
    case q: Q => constQLex(q).map(l => Term.quoted(lit(l)))
    case _ => None
  }

  /** One triple pattern over the quad store -> solution DF. A constant
    * predicate goes through QuadSource.byPredicate — the partition-pruned
    * path on a PartitionedQuadStore (the reference's index choice).
    */
  private def scanPattern(src: QuadSource, tp: TriplePattern,
      ctx: GraphCtx, encode: Column => Column = identityEncode): Sol = {
    val base = tp.p match {
      case I(iri) => src.byPredicate(iri)
      case _ => src.all
    }
    val gFiltered = ctx match {
      case DefaultG => base.where(col("g")("kind") === Term.DefaultGraphKind)
      case FixedG(iri) => base.where(
        col("g")("kind") === Term.IriKind && col("g")("lex") === iri)
      case VarG(_) => base.where(col("g")("kind") =!= Term.DefaultGraphKind)
    }
    val positions = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
    val filtered = positions.foldLeft(gFiltered) { case (df, (pos, pat)) =>
      constFilter(col(pos), pat).map(df.where).getOrElse(df)
    }
    // variable bindings: position columns, plus quoted-triple components
    // extracted via QuotedParts (scan + projection — no join, no UDF)
    val qConds = scala.collection.mutable.ListBuffer[Column]()
    def qBinds(part: Column, pat: TermPat): Seq[(String, Column)] =
      pat match {
        case q2: Q if constQLex(q2).isEmpty =>
          qConds += part("kind") === Term.QuotedKind
          val parts = graft.expr.QuotedParts.parts(part("lex"))
          Seq(q2.s -> "s", q2.p -> "p", q2.o -> "o").flatMap {
            case (cp, f) => qBinds(parts(f), cp)
          }
        case other =>
          constFilter(part, other).foreach(qConds += _)
          varName(other).map(_ -> part).toSeq
      }
    val varPos: Seq[(String, Column)] = positions.flatMap { case (pos, pat) =>
      pat match {
        // top-level kind/const filter already applied by `filtered`
        case q: Q if constQLex(q).isEmpty =>
          val parts = graft.expr.QuotedParts.parts(col(pos)("lex"))
          Seq(q.s -> "s", q.p -> "p", q.o -> "o").flatMap {
            case (cp, f) => qBinds(parts(f), cp)
          }
        case other => varName(other).map(_ -> col(pos)).toSeq
      }
    } ++ (ctx match { case VarG(v) => Seq(v -> col("g")); case _ => Nil })
    val condFiltered = qConds.foldLeft(filtered)((df, c) => df.where(c))
    val eqConstrained = varPos.groupBy(_._1).values
      .filter(_.size > 1)
      .foldLeft(condFiltered) { (df, dups) =>
        dups.map(_._2).sliding(2).foldLeft(df) { case (d, Seq(c1, c2)) =>
          d.where(c1 === c2)
        }
      }
    val proj = varPos.map(_._1).distinct.map { v =>
      encode(varPos.find(_._1 == v).get._2).as(v)
    }
    val vs = varPos.map(_._1).toSet
    // seed the inference lattice from the predicate catalog (object
    // position only; id-encoded scans skip it — ids aren't term structs)
    val cls = (tp.p, varName(tp.o)) match {
      case (I(iri), Some(ov)) if encode eq identityEncode =>
        src.predClass(iri).map(ov -> _).toMap
      case _ => Map.empty[String, Term.VClass]
    }
    Sol(eqConstrained.select(proj: _*), vs, vs, cls)
  }

  private val identityEncode: Column => Column = identity

  /** Flatten a conjunctive region (nested Joins + BGP patterns) into its
    * leaves, so the whole region is join-ordered together.
    */
  private def conjuncts(gp: GraphPattern): Seq[GraphPattern] = gp match {
    case Join(l, r) => conjuncts(l) ++ conjuncts(r)
    case Bgp(ps @ _*) if ps.nonEmpty => ps.map(p => Bgp(p))
    case other => Seq(other)
  }

  /** Greedy connectivity-aware join ordering over a conjunctive region —
    * port of the reference's bound-term-counting reorder (oxigraph:
    * lib/sparopt/src/optimizer.rs · reorder_joins), applied at
    * translation time; AQE re-plans physically at runtime. Guarantees a
    * connected part (equi-join) is always preferred over a cartesian.
    */
  /** Dictionary-encoded execution flag (SURVEY.md §4.2): BGP-only
    * conjunctions join on 128-bit term ids (16-byte shuffle keys instead
    * of 4-field string structs) and decode lexical forms only at the
    * conjunction boundary — the reference's numeric_encoder / lazy-decode
    * shape. Off by default; enable with -Dgraft.dictExec=true.
    */
  private def dictExec: Boolean =
    java.lang.Boolean.getBoolean("graft.dictExec") ||
      sys.env.get("GRAFT_DICT_EXEC").contains("true")

  /** Per-source term dictionary (id2 -> term), cached and persisted like
    * the reference keeps id2str open alongside the indexes.
    */
  private val dictCache =
    scala.collection.concurrent.TrieMap.empty[QuadSource, DataFrame]
  private def dictFor(src: QuadSource): DataFrame =
    dictCache.getOrElseUpdate(src, {
      val q = src.all
      Seq("s", "p", "o", "g")
        .map(c => q.select(graft.io.DictStore.termId2(col(c)).as("id"),
          col(c).as("term")))
        .reduce(_ unionByName _)
        .dropDuplicates("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Id-space evaluation of an all-BGP conjunction: scan leaves project
    * term ids, the greedy join chain runs on ids, and every variable is
    * decoded by one dictionary join at the end (output-cardinality cost
    * only). Constant filters run on the raw scans BEFORE encoding, so
    * pushdown is unchanged.
    */
  private def translateConjunctionIds(tps: Seq[TriplePattern],
      src: QuadSource, ctx: GraphCtx): Sol = {
    val dict = dictFor(src)
    val sols = tps.map(tp =>
      scanPattern(src, tp, ctx, graft.io.DictStore.termId2))
    val remaining = scala.collection.mutable.ListBuffer(sols.zip(tps): _*)
    var acc: Sol = null
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val next =
        if (acc == null) remaining.maxBy { case (_, tp) =>
          Seq(tp.s, tp.p, tp.o).count(varName(_).isEmpty) }
        else remaining.maxBy { case (sol, tp) =>
          (sol.vars & bound).size * 10 +
            Seq(tp.s, tp.p, tp.o).count(varName(_).isEmpty) }
      remaining -= next
      acc = if (acc == null) next._1 else joinSols(acc, next._1, "inner")
      bound ++= next._1.vars
    }
    val vars = acc.vars.toSeq.sorted
    val decoded = vars.foldLeft(acc.df) { (d, v) =>
      d.join(dict.select(col("id").as(s"__k_$v"), col("term").as(s"__t_$v")),
        col(v) === col(s"__k_$v"))
        .drop(v, s"__k_$v")
        .withColumnRenamed(s"__t_$v", v)
    }
    Sol(decoded.select(vars.map(col): _*), acc.vars, acc.sure)
  }

  private def translateConjunction(parts: Seq[GraphPattern],
      src: QuadSource, ctx: GraphCtx): Sol = {
    def constants(gp: GraphPattern): Int = gp match {
      case Bgp(tp) => Seq(tp.s, tp.p, tp.o).count(varName(_).isEmpty)
      case PathPattern(s, _, o) => Seq(s, o).count(varName(_).isEmpty) + 1
      case _: ValuesPat => 3 // inline data: tiny by construction
      case _ => 0
    }
    val bgpLeaves = parts.collect { case Bgp(tp) => tp }
    // quoted patterns need term structs (component extraction), so the
    // id-encoded path skips conjunctions containing them
    def hasQ(tp: TriplePattern): Boolean =
      Seq(tp.s, tp.p, tp.o).exists(_.isInstanceOf[Q])
    if (dictExec && bgpLeaves.length == parts.length &&
        bgpLeaves.length >= 2 && !bgpLeaves.exists(hasQ))
      return translateConjunctionIds(bgpLeaves, src, ctx)
    val remaining = scala.collection.mutable.ListBuffer(parts: _*)
    var acc: Sol = null
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val next =
        if (acc == null) remaining.maxBy(constants)
        else remaining.maxBy { p =>
          val shared = (inScopeVars(p) & bound).size
          shared * 10 + constants(p)
        }
      remaining -= next
      val sol = next match {
        // Closure-bearing path whose endpoint is already bound by the
        // accumulated join: seed the fixpoint with the bound values
        // (the reference's ALP-from-node, generalized to a node set).
        case pp @ PathPattern(s, path, o)
            if acc != null && PathExec.hasClosure(path) =>
          def accSeed(tp: TermPat): Option[PathExec.Seed] = varName(tp)
            .filter(v => acc.vars(v) && acc.sure(v))
            .map(v => PathExec.Seed(
              acc.df.select(col(v).as("n")).distinct(),
              zeroIncludesSeed = false))
          translatePath(pp, src, ctx, accSeed(s), accSeed(o))
        case _ => translate(next, src, ctx)
      }
      acc = if (acc == null) sol else joinSols(acc, sol, "inner")
      bound ++= sol.vars
    }
    acc
  }

  /** A post-join operation hoisted out of a LATERAL right side: a
    * correlated scalar filter conjunct or a correlated BIND. Order
    * matters (a hoisted filter may reference a hoisted BIND variable),
    * so they travel as one sequence.
    */
  private sealed trait HoistOp
  private final case class HFilt(e: Expr) extends HoistOp
  private final case class HExt(v: String, ex: Expr) extends HoistOp

  /** Hoist correlated scalar filters and correlated BINDs out of the
    * conjunctive spine (Filter/Extend over Join/Extend/Lateral) of a
    * LATERAL right side. Returns (rebuilt tree, ordered post-join ops,
    * variables whose binding moved post-join). A filter conjunct hoists
    * when it references left vars outside its own scope (evaluable only
    * after the join) or references an already-hoisted BIND variable; a
    * BIND hoists under the same correlation test. Both are sound
    * because everything on the spine is an inner join: filtering /
    * extending after l⋈r is exactly the substitution semantics.
    */
  private def hoist(gp: GraphPattern,
      lVars: Set[String]): (GraphPattern, Seq[HoistOp], Set[String]) =
    gp match {
      case Filter(e, i) =>
        val (i2, up0, hv) = hoist(i, lVars)
        val scope = inScopeVars(i) -- hv
        val (exs, scalars) = splitConjuncts(e)
        // EXISTS-bearing scalars never hoist: a hoisted conjunct is
        // compiled directly (no mark-join rewrite), so they stay put
        // and lateralJoinSafe/existsSemi decide their routing
        val (up, stay) = scalars.partition { s =>
          val vs = exprVars(s)
          !hasExists(s) && ((vs & hv).nonEmpty ||
            (!(vs & lVars).subsetOf(scope) &&
              (vs -- lVars).subsetOf(scope ++ hv)))
        }
        val keep: Seq[Expr] = exs ++ stay
        val rebuilt =
          if (keep.isEmpty) i2
          else Filter(keep.reduce((a, b) => EFn("&&", a, b)), i2)
        (rebuilt, up0 ++ up.map(HFilt.apply), hv)
      case Join(a, b) =>
        val (a2, ua, ha) = hoist(a, lVars); val (b2, ub, hb) = hoist(b, lVars)
        (Join(a2, b2), ua ++ ub, ha ++ hb)
      case Lateral(a, b) =>
        val (a2, ua, ha) = hoist(a, lVars); val (b2, ub, hb) = hoist(b, lVars)
        (Lateral(a2, b2), ua ++ ub, ha ++ hb)
      case Extend(i, v, ex) =>
        val (i2, u, hv) = hoist(i, lVars)
        val vs = exprVars(ex)
        val correlated = (vs & hv).nonEmpty ||
          !(vs & lVars).subsetOf(inScopeVars(i) -- hv)
        if (correlated && !lVars(v) && !hasExists(ex))
          (i2, u :+ HExt(v, ex), hv + v)
        else (Extend(i2, v, ex), u, hv)
      case other => (other, Nil, Set.empty[String])
    }

  /** Every variable a pattern tree references: bound pattern positions
    * plus every expression occurrence (filters, BIND bodies, EXISTS
    * scopes, order keys, group keys/agg inputs). Used to detect a
    * hoisted BIND variable still referenced in-tree — that shape cannot
    * be rewritten bottom-up and must throw, not silently mis-bind.
    */
  private def treeRefs(gp: GraphPattern): Set[String] = gp match {
    // expression positions walk with exprExistsRefs, NOT exprVars:
    // exprVars' EExists case sees only the interior's in-scope vars,
    // blind to expression-position refs (a hoisted BIND var referenced
    // only inside an EXISTS interior's filter would dangle undetected
    // and evaluate unbound — silently wrong). exprExistsRefs applies
    // the full §18.6 substRefs reachability.
    case Filter(e, i) => exprExistsRefs(e) ++ treeRefs(i)
    case Extend(i, _, ex) => exprExistsRefs(ex) ++ treeRefs(i)
    case Join(a, b) => treeRefs(a) ++ treeRefs(b)
    case Lateral(a, b) => treeRefs(a) ++ treeRefs(b)
    case LeftJoin(a, b, f) => treeRefs(a) ++ treeRefs(b) ++
      f.map(exprExistsRefs).getOrElse(Set.empty)
    case Minus(a, b) => treeRefs(a) ++ treeRefs(b)
    case Union(a, b) => treeRefs(a) ++ treeRefs(b)
    case GraphPat(_, i) => treeRefs(i)
    case Project(i, vs) => treeRefs(i) ++ vs
    case Distinct(i) => treeRefs(i)
    case Reduced(i) => treeRefs(i)
    case Slice(i, _, _) => treeRefs(i)
    case OrderBy(i, ks) => treeRefs(i) ++ ks.flatMap(k => exprExistsRefs(k._1))
    case Group(i, keys, aggs) => treeRefs(i) ++ keys ++
      aggs.flatMap(_._2.expr.map(exprExistsRefs).getOrElse(Set.empty))
    case other => inScopeVars(other) // Bgp, PathPattern, ValuesPat
  }

  /** Every variable §18.6 `Substitute` can reach inside a pattern —
    * all pattern positions (including MINUS right sides, which bind
    * nothing in-scope but ARE substituted into) plus every expression
    * position, recursing through nested EXISTS. The `renameApart` flag
    * selects the subselect rule: EXISTS renames hidden subselect
    * variables apart (a var bound inside a `SELECT` but not projected
    * is a fresh variable — locked by exists-subselect-hidden), so the
    * Project case discounts them; LATERAL's locked subselect-shell
    * rule instead descends, so hidden vars still count. AS positions
    * (BIND targets, aggregate output names) are never substituted and
    * are excluded — for EXISTS nonemptiness the compatible-join merge
    * is equivalent either way.
    */
  private def substRefs(gp: GraphPattern, renameApart: Boolean)
      : Set[String] = {
    def refs(e: Expr): Set[String] = e match {
      case EVar(n) => Set(n)
      case EFn(_, args @ _*) => args.flatMap(refs).toSet
      // EXISTS interiors always use the EXISTS rule for THEIR
      // subselects, wherever the enclosing pattern sits
      case EExists(p, _) => substRefs(p, renameApart = true)
      case _ => Set.empty
    }
    gp match {
      case b: Bgp => inScopeVars(b)
      case p: PathPattern => inScopeVars(p)
      case v: ValuesPat => inScopeVars(v)
      case Join(l, r) => substRefs(l, renameApart) ++ substRefs(r, renameApart)
      case Lateral(l, r) =>
        substRefs(l, renameApart) ++ substRefs(r, renameApart)
      case Union(l, r) =>
        substRefs(l, renameApart) ++ substRefs(r, renameApart)
      case Minus(l, r) =>
        substRefs(l, renameApart) ++ substRefs(r, renameApart)
      case LeftJoin(l, r, f) => substRefs(l, renameApart) ++
        substRefs(r, renameApart) ++ f.toSeq.flatMap(refs)
      case Filter(e, i) => refs(e) ++ substRefs(i, renameApart)
      case Extend(i, _, ex) => substRefs(i, renameApart) ++ refs(ex)
      case Project(i, vs) =>
        val inner = substRefs(i, renameApart)
        if (renameApart) inner -- (inScopeVars(i) -- vs) else inner
      case Distinct(i) => substRefs(i, renameApart)
      case Reduced(i) => substRefs(i, renameApart)
      case Slice(i, _, _) => substRefs(i, renameApart)
      case OrderBy(i, ks) =>
        substRefs(i, renameApart) ++ ks.flatMap(k => refs(k._1))
      case Group(i, _, aggs) => substRefs(i, renameApart) ++
        aggs.flatMap(a => a._2.expr.toSeq.flatMap(refs)) ++
        aggs.flatMap(a => a._2.orderBy.flatMap(k => refs(k._1)))
      case GraphPat(name, i) => vars(name) ++ substRefs(i, renameApart)
      case Service(name, i, _) => vars(name) ++ substRefs(i, renameApart)
    }
  }

  /** Outer vars an EXISTS pattern correlates on, under the §18.6
    * rename-apart rule for subselect-hidden variables.
    */
  private def existsRefs(p: GraphPattern, outer: Set[String]): Set[String] =
    substRefs(p, renameApart = true) & outer

  /** Expression-level variant of [[existsRefs]] for scalar conjuncts
    * that carry nested EXISTS (`?x || EXISTS{…}`).
    */
  private def exprExistsRefs(e: Expr): Set[String] = e match {
    case EVar(n) => Set(n)
    case EFn(_, args @ _*) => args.flatMap(exprExistsRefs).toSet
    case EExists(p, _) => substRefs(p, renameApart = true)
    case _ => Set.empty
  }

  /** §18.6 rename-apart: alpha-rename, inside every subselect interior
    * of an EXISTS pattern, the variables that are bound there but NOT
    * projected AND collide with an outer name — they are fresh
    * variables, so per-binding evaluation (which descends through
    * projections) must not correlate them. Bottom-up so nested
    * subselects rename first.
    */
  private def renameHidden(gp: GraphPattern, outer: Set[String])
      : GraphPattern = {
    var n = 0
    val taken = scala.collection.mutable.Set.empty[String]
    taken ++= allVars(gp) ++= outer
    def fresh(v: String): String = {
      var c = s"__ra${n}_$v"; n += 1
      while (taken(c)) { c = s"__ra${n}_$v"; n += 1 }
      taken += c; c
    }
    def walkExpr(e: Expr): Expr = e match {
      case EFn(name, args @ _*) => EFn(name, args.map(walkExpr): _*)
      case EExists(p, pos) => EExists(walk(p), pos)
      case other => other
    }
    def walk(p: GraphPattern): GraphPattern = p match {
      case Project(i, vs) =>
        val i1 = walk(i)
        val hidden = (inScopeVars(i1) -- vs) & outer
        val m = hidden.map(v => v -> fresh(v)).toMap
        Project(if (m.isEmpty) i1 else renameVars(i1, m), vs)
      case Join(l, r) => Join(walk(l), walk(r))
      case Lateral(l, r) => Lateral(walk(l), walk(r))
      case Union(l, r) => Union(walk(l), walk(r))
      case Minus(l, r) => Minus(walk(l), walk(r))
      case LeftJoin(l, r, f) => LeftJoin(walk(l), walk(r), f.map(walkExpr))
      case Filter(e, i) => Filter(walkExpr(e), walk(i))
      case Extend(i, v, ex) => Extend(walk(i), v, walkExpr(ex))
      case Distinct(i) => Distinct(walk(i))
      case Reduced(i) => Reduced(walk(i))
      case Slice(i, off, lim) => Slice(walk(i), off, lim)
      case OrderBy(i, ks) =>
        OrderBy(walk(i), ks.map(k => (walkExpr(k._1), k._2)))
      case Group(i, keys, aggs) => Group(walk(i), keys,
        aggs.map { case (nm, a) => (nm, a.copy(
          expr = a.expr.map(walkExpr),
          orderBy = a.orderBy.map(k => (walkExpr(k._1), k._2))))
        })
      case GraphPat(name, i) => GraphPat(name, walk(i))
      case Service(name, i, s) => Service(name, walk(i), s)
      case leaf => leaf
    }
    walk(gp)
  }

  private def checkNoDangling(gp: GraphPattern, hv: Set[String]): Unit = {
    val dangling = hv & treeRefs(gp)
    if (dangling.nonEmpty) throw new UnsupportedOperationException(
      "correlated LATERAL: BIND variable(s) " + dangling.mkString(", ") +
        " are referenced in a position that cannot be hoisted post-join")
  }

  /** Apply hoisted ops post-join in their original bottom-up order. */
  private def applyHoisted(s: Sol, ops: Seq[HoistOp]): Sol =
    ops.foldLeft(s) {
      case (sol, HFilt(e)) =>
        Sol(sol.df.where(coalesce(SparqlExpr.compileBool(e, sol.bind),
          lit(false))), sol.vars, sol.sure, sol.cls)
      case (sol, HExt(v, ex)) =>
        Sol(sol.df.withColumn(v, SparqlExpr.compile(ex, sol.bind)),
          sol.vars + v, sol.sure,
          SparqlExpr.exprClass(ex, sol.hint)
            .map(k => sol.cls + (v -> k)).getOrElse(sol.cls - v))
    }

  /** Correlated LATERAL (SPARQL 1.2 / oxigraph extension: the right side
    * is evaluated once per left solution with its bindings substituted).
    *
    * Two Spark-first rewrites cover the useful surface without per-row
    * re-execution:
    *  - a "join-safe" right side (monotone patterns; OPTIONAL/MINUS only
    *    when their correlation flows through their own left part)
    *    evaluates bottom-up and equi-joins on the shared variables —
    *    substitution and join coincide for these shapes;
    *  - a subselect shell Slice(Project(OrderBy(core))) becomes the
    *    top-k-per-binding window rewrite: join the core, rank per left
    *    binding, slice ranks — one shuffle, no driver loops.
    * Anything else (per-binding aggregation, re-binding an outer var)
    * still throws rather than silently decorrelating.
    */
  /** Is `gp` "join-safe" under substitution from `lVars`: bottom-up
    * evaluation plus an equi/compat join on the shared variables
    * coincides with per-binding substitution (§18.5/§18.6). Shared by
    * LATERAL and the EXISTS routing (existsSemi).
    */
  private def lateralJoinSafe(lVars: Set[String])
      (gp0: GraphPattern): Boolean = {
    // A scalar filter conjunct is bottom-up-safe when every left var it
    // references is bound inside its own scope (join handles the
    // correlation), OR when it also references a non-left var its scope
    // does not bind — then it evaluates to error -> false under both
    // bottom-up and substitution semantics (unbound either way).
    // EXISTS never errors, so EXISTS-bearing conjuncts instead require
    // every substitution-visible ref (incl. expression positions and
    // MINUS right sides INSIDE the EXISTS) to be scope-bound.
    def scalarOk(s: Expr, scope: Set[String]): Boolean =
      if (hasExists(s)) (exprExistsRefs(s) & lVars).subsetOf(scope)
      else {
        val vs = exprVars(s)
        (vs & lVars).subsetOf(scope) || !(vs -- lVars).subsetOf(scope)
      }
    def filterOk(e: Expr, scope: Set[String]): Boolean = {
      val (exs, scalars) = splitConjuncts(e)
      exs.forall(ex => existsRefs(ex.pattern, lVars).subsetOf(scope)) &&
        scalars.forall(scalarOk(_, scope))
    }
    def joinSafe(gp: GraphPattern): Boolean = gp match {
      case _: Bgp | _: PathPattern | _: ValuesPat => true
      case Join(a, b) => joinSafe(a) && joinSafe(b)
      case Lateral(a, b) => joinSafe(a) && joinSafe(b)
      case Filter(e, i) => joinSafe(i) && filterOk(e, inScopeVars(i))
      case Extend(i, v, ex) => joinSafe(i) && !lVars(v) &&
        ((if (hasExists(ex)) exprExistsRefs(ex) else exprVars(ex)) &
          lVars).subsetOf(inScopeVars(i))
      case Union(a, b) => joinSafe(a) && joinSafe(b)
      case GraphPat(_, i) => joinSafe(i)
      case LeftJoin(a, b, filt) => joinSafe(a) && joinSafe(b) &&
        (inScopeVars(b) & lVars).subsetOf(inScopeVars(a)) &&
        filt.forall(f => scalarOk(f, inScopeVars(a) ++ inScopeVars(b)))
      case Minus(a, b) => joinSafe(a) && minusSideSafe(b) && {
        val bl = inScopeVars(b) & lVars
        bl.subsetOf(inScopeVars(a)) && {
          // §18.5 over σ-domains: substituted (outer) vars do not count
          // toward the MINUS domain-overlap test. Bottom-up Minus DOES
          // count them, so join-equivalence additionally needs the
          // overlap decision to coincide: either nothing is substituted,
          // or some live (non-outer) shared var is provably bound on
          // both sides AND every substituted var is surely bound in `a`
          // (a sometimes-unbound substituted var in `a` is vacuously
          // compatible with ANY `b` value bottom-up, where substitution
          // pins it to the outer constant). Otherwise the per-binding
          // rewrite handles the overlap per row.
          val live = (inScopeVars(a) & inScopeVars(b)) -- lVars
          bl.isEmpty ||
            (live.nonEmpty &&
              live.forall(v => sureIn(a, v) && sureIn(b, v)) &&
              bl.forall(v => sureIn(a, v)))
        }
      }
      case _ => false
    }
    // Inside a MINUS right side, nothing bottom-up pins a left var
    // except the anti-join's compat on scope-bound pattern vars — so a
    // left-var ref is only safe as a pattern var in a monotone
    // position. Expression refs, inner MINUS right sides, EXISTS
    // interiors and anything non-monotone route to per-binding when
    // they touch lVars.
    def minusSideSafe(gp: GraphPattern): Boolean = gp match {
      case _: Bgp | _: PathPattern | _: ValuesPat => true
      case Join(x, y) => minusSideSafe(x) && minusSideSafe(y)
      case Union(x, y) => minusSideSafe(x) && minusSideSafe(y)
      case GraphPat(_, i) => minusSideSafe(i)
      case Filter(e, i) => minusSideSafe(i) &&
        (exprExistsRefs(e) & lVars).isEmpty
      case Extend(i, v, ex) => minusSideSafe(i) && !lVars(v) &&
        (exprExistsRefs(ex) & lVars).isEmpty
      case Minus(x, y) => minusSideSafe(x) &&
        (substRefs(y, renameApart = false) & lVars).isEmpty
      case other =>
        (substRefs(other, renameApart = false) & lVars).isEmpty
    }
    joinSafe(gp0)
  }

  private def translateLateral(l: GraphPattern, r: GraphPattern,
      src: QuadSource, ctx: GraphCtx): Sol =
    lateralSol(translate(l, src, ctx), inScopeVars(l), r, src, ctx)

  /** LATERAL with an already-evaluated left side: `ls0` are the left
    * solutions, `lVars` the substitution domain (every `ls0` var the
    * right side may reference — for a nested σ(Lateral) this includes
    * the OUTER domain, whose bindings ride in `ls0`'s rows).
    */
  private def lateralSol(ls0: Sol, lVars: Set[String],
      r: GraphPattern, src: QuadSource, ctx: GraphCtx): Sol = {
    require(!ls0.vars("__lid"),
      "lateralSol caller must stash an enclosing __lid tag first")
    def joinSafe(gp: GraphPattern): Boolean = lateralJoinSafe(lVars)(gp)

    // Correlated scalar filter conjuncts AND correlated BINDs in
    // conjunctive position (Filter/Extend over Join/Extend/Lateral
    // chains) reference left vars their own scope does not bind.
    // Bottom-up they would see unbound -> error and silently drop every
    // row / bind nothing; because they sit above only inner joins,
    // applying them AFTER the l⋈r join IS the substitution semantics —
    // hoist them out, preserving bottom-up order (a hoisted filter may
    // reference a hoisted BIND's variable, so the ops interleave).
    val (rH, rUp, rHv) = hoist(r, lVars)
    checkNoDangling(rH, rHv)
    if (joinSafe(rH))
      return applyHoisted(joinSols(ls0,
        translate(rH, src, ctx), "inner"), rUp)

    // subselect shell: peel Slice / Distinct / Project / OrderBy down to
    // a join-safe core (correlation vars hidden by the projection are
    // restored because the JOIN happens before the projection applies)
    var node = r
    var offset = 0L; var limit = -1L; var hasSlice = false
    var distinct = false
    var proj: Option[Seq[String]] = None
    var orderKeys: Seq[(Expr, Boolean)] = Nil
    val shellExtends = scala.collection.mutable.ListBuffer[(String, Expr)]()
    var peeling = true
    while (peeling) node match {
      case Slice(i, off, lim) if !hasSlice =>
        hasSlice = true; offset = off; limit = lim; node = i
      case Distinct(i) => distinct = true; node = i
      case Project(i, vs) if proj.isEmpty => proj = Some(vs); node = i
      case OrderBy(i, ks) if orderKeys.isEmpty => orderKeys = ks; node = i
      case Extend(i, v, ex) if !lVars(v) =>
        shellExtends += ((v, ex)); node = i // applied inner-to-outer below
      case _ => peeling = false
    }
    def applyExtends(sol0: Sol): Sol =
      shellExtends.reverse.foldLeft(sol0) { case (s, (v, ex0)) =>
        // EXISTS as a value inside a peeled BIND → mark join first
        // (evaluated post-join, so the left bindings substitute)
        val (sM, Seq(ex), aux) = markExists(s, Seq(ex0), src, ctx)
        Sol(sM.df.withColumn(v, SparqlExpr.compile(ex, sM.bind))
          .drop(aux: _*), s.vars + v, s.sure)
      }
    node match {
      // per-binding aggregation: tag each left row, outer-join the
      // group's input, aggregate per (row id, group keys) with the
      // padding row blanked — one shuffle, no per-row re-execution.
      // Keys-empty groups yield exactly one row per binding (left outer);
      // keyed groups drop match-less bindings (inner), per SPARQL.
      case Group(ginner0, gkeys, gaggs) if {
            val (g2, _, ghv) = hoist(ginner0, lVars)
            joinSafe(g2) && (ghv & treeRefs(g2)).isEmpty
          } =>
        val (ginner, gUp, _) = hoist(ginner0, lVars)
        val ls = ls0
        val lsId = Sol(ls.df.withColumn("__lid", monotonically_increasing_id()),
          ls.vars + "__lid", ls.sure + "__lid")
        val rs0 = translate(ginner, src, ctx)
        val rsM = Sol(rs0.df.withColumn("__rmark", lit(true)),
          rs0.vars + "__rmark", rs0.sure + "__rmark")
        val jt = if (gkeys.isEmpty) "left_outer" else "inner"
        val joined0 = joinSols(lsId, rsM, jt)
        // Hoisted ops from the group input apply BEFORE aggregation:
        // correlated BINDs add their columns (extends never drop rows,
        // filters never change values, so extends-then-filters preserves
        // the interleaved order). Keys-empty groups must keep a padding
        // row per binding (COUNT=0 when every match fails the filter),
        // so there we blank __rmark instead of dropping the row; keyed
        // groups drop filtered rows outright (match-less bindings drop).
        val withExt = gUp.foldLeft(joined0) {
          case (sol, HExt(v, ex)) =>
            Sol(sol.df.withColumn(v, SparqlExpr.compile(ex, sol.bind)),
              sol.vars + v, sol.sure, sol.cls)
          case (sol, _) => sol
        }
        val gFilts = gUp.collect { case HFilt(e) => e }
        val joined =
          if (gFilts.isEmpty) withExt
          else {
            val cond = gFilts.map(e => coalesce(
              SparqlExpr.compileBool(e, withExt.bind), lit(false)))
              .reduce(_ && _)
            if (gkeys.isEmpty)
              Sol(withExt.df.withColumn("__rmark",
                when(col("__rmark").isNotNull && cond, lit(true))),
                withExt.vars, withExt.sure - "__rmark")
            else Sol(withExt.df.where(cond), withExt.vars, withExt.sure)
          }
        val allKeys = ("__lid" +: (ls.vars.toSeq ++ gkeys)).distinct
        var grouped = applyExtends(groupAggregate(joined, allKeys, gaggs,
          e => when(col("__rmark").isNotNull, e)))
        if (hasSlice) {
          // slice of the per-binding groups (argmax-per-binding idiom):
          // rank the group rows within each left row id
          import org.apache.spark.sql.expressions.Window
          val sortCols =
            if (orderKeys.nonEmpty) orderKeys.map { case (e, asc) =>
              val k = sortKey(SparqlExpr.compile(e, grouped.bind))
              if (asc) k.asc else k.desc
            }
            else (gkeys ++ gaggs.map(_._1)).sorted
              .map(v => sortKey(col(v)).asc)
          val w = Window.partitionBy(col("__lid")).orderBy(sortCols: _*)
          grouped = Sol(
            grouped.df.withColumn("__rn", row_number().over(w))
              .where(col("__rn") > offset &&
                (if (limit >= 0) col("__rn") <= offset + limit
                 else lit(true)))
              .drop("__rn"),
            grouped.vars, grouped.sure)
        }
        val outVars0 =
          ls.vars ++ gkeys ++ gaggs.map(_._1) ++ shellExtends.map(_._1)
        val outVars = proj.map(vs => ls.vars ++ vs).getOrElse(outVars0)
        var gdf = grouped.df
        // DISTINCT dedups within each per-binding evaluation, so keep
        // __lid through it: duplicate left solutions each contribute
        // their own (identical) output rows under multiset semantics.
        if (distinct) gdf = gdf.select(
          ("__lid" +: outVars.toSeq.sorted).map(v =>
            (if (grouped.vars(v)) col(v) else nullTerm).as(v)): _*)
          .distinct().drop("__lid")
        else gdf = gdf.select(outVars.toSeq.sorted.map(v =>
          (if (grouped.vars(v)) col(v) else nullTerm).as(v)): _*)
        return Sol(gdf, outVars, ls.sure & outVars)
      case _ =>
    }

    val (nodeH, nUp, nHv) = hoist(node, lVars)
    checkNoDangling(nodeH, nHv)

    // Tag left rows with a unique id: DISTINCT and the top-k window are
    // per left SOLUTION (multiset semantics), not per left value tuple —
    // duplicate left rows each get their own k rows / their own dedup.
    // ls0 already evaluated (lateralSol parameter). PERSISTED (r12): the
    // tagged frame feeds several consumers (per-binding combines,
    // restoreOuter, keys-empty padding) — without the persist each
    // consumer re-derives the whole outer lineage AND re-evaluates
    // monotonically_increasing_id, which is only correct while every
    // materialization keeps the exact same partition layout.
    val ls = Sol(scratchTag(ls0.df.withColumn("__lid",
        monotonically_increasing_id())),
      ls0.vars + "__lid", ls0.sure + "__lid")

    val pb = new PerBinding(ls, lVars, ls0.sure, src)

    val (joined0, rsVars): (Sol, Set[String]) =
      if (joinSafe(nodeH)) {
        val rs = translate(nodeH, src, ctx)
        (joinSols(ls, rs, "inner"), rs.vars)
      } else (pb.perBinding(nodeH, ctx), inScopeVars(nodeH))
    val joined = applyHoisted(applyExtends(joined0), nUp)
    var df = joined.df
    if (distinct) {
      val dCols = ("__lid" +: proj.getOrElse(
        (rsVars ++ shellExtends.map(_._1)).toSeq)
        .filter(joined.vars)).distinct
      df = df.dropDuplicates(dCols)
    }
    if (hasSlice) {
      import org.apache.spark.sql.expressions.Window
      val sortCols =
        if (orderKeys.nonEmpty) orderKeys.map { case (e, asc) =>
          val k = sortKey(SparqlExpr.compile(e, joined.bind))
          if (asc) k.asc else k.desc
        }
        else (joined.vars -- ls.vars).toSeq.sorted.map(v => sortKey(col(v)).asc)
      val w = Window.partitionBy(col("__lid")).orderBy(sortCols: _*)
      df = df.withColumn("__rn", row_number().over(w))
        .where(col("__rn") > offset &&
          (if (limit >= 0) col("__rn") <= offset + limit else lit(true)))
        .drop("__rn")
    }
    // the peeled projection hides pattern vars; ones the left binds
    // only SOMETIMES revert to the outer value in the merged solution
    val hidden = proj.map(p => ((ls0.vars & rsVars) -- p.toSet)
      .filterNot(ls0.sure).toSeq.sorted).getOrElse(Nil)
    val df2 = pb.restoreOuter(df, hidden)
    val outVars = ls0.vars ++ proj.map(_.toSet)
      .getOrElse(rsVars ++ shellExtends.map(_._1))
    Sol(df2.select(outVars.toSeq.sorted.map(v =>
      (if (joined.vars(v)) col(v) else nullTerm).as(v)): _*),
      outVars, (joined.sure & outVars) -- hidden)
  }

  /** Per-binding (§18.5 substitution) evaluation engine, shared by
    * correlated LATERAL and correlated EXISTS (existsSemi/existsHits).
    * `ls` is the outer solution tagged with a unique `__lid` row id
    * (riding in `vars` so every join keeps it), `lVars` the
    * substitution domain (the outer in-scope vars), `sure0` the outer
    * sure-bound set without the tag.
    *
    * Join-safe cores hoist their correlated conjuncts and inner-join
    * the left (substitution = join for those shapes); σ distributes
    * over LeftJoin / Minus / Union / Filter / Group / Slice / Project,
    * so cross-correlated shapes RECURSE on both sides and recombine
    * __lid-keyed — every per-binding scope stays separate while each
    * combine is one hash-joinable shuffle. An UNCORRELATED subtree
    * (no σ-visible outer refs) evaluates standalone once and joins —
    * translate handles shapes with no σ arm. Anything else throws
    * rather than silently decorrelating.
    */
  private final class PerBinding(ls: Sol, lVars: Set[String],
      sure0: Set[String], src: QuadSource) {
    private def joinSafe(gp: GraphPattern): Boolean =
      lateralJoinSafe(lVars)(gp)

    /** Projection-hidden vars that the right side binds and the left
      * sometimes does NOT bind: the projection hides the PATTERN
      * binding, so the merged solution reverts to the OUTER value
      * (unbound where the left row is unbound) — restore per __lid.
      * Surely-outer-bound vars need no restore: substitution pinned the
      * pattern value to the outer constant already.
      */
    def restoreOuter(df: DataFrame, hidden: Seq[String]): DataFrame =
      if (hidden.isEmpty) df
      else {
        val outers = ls.df.select(col("__lid") +:
          hidden.map(v => col(v).as("__out_" + v)): _*)
        hidden.foldLeft(df.join(outers, "__lid")) { (d, v) =>
          d.withColumn(v, col("__out_" + v)).drop("__out_" + v)
        }
      }

    def perBinding(p: GraphPattern, pctx: GraphCtx): Sol = {
      val (pH, pUp, pHv) = hoist(p, lVars)
      checkNoDangling(pH, pHv)
      val core: Sol =
        if (joinSafe(pH) ||
            // uncorrelated subtree: σ touches nothing inside it, so one
            // standalone evaluation paired with every left row IS the
            // per-binding semantics (and covers shapes with no σ arm)
            (substRefs(pH, renameApart = false) & lVars).isEmpty)
          joinSols(ls, translate(pH, src, pctx), "inner")
        else pH match {
          // a named-graph wrapper around an unsafe core: σ evaluates
          // the core against that graph — recurse with FixedG.
          // Graph distributes over Union (§18.2.2.3) — same rewrite as
          // the bottom-up arm, so mixed unions complete per branch.
          case GraphPat(n, Union(a0, b0)) =>
            perBinding(Union(GraphPat(n, a0), GraphPat(n, b0)), pctx)
          case GraphPat(I(iri), i0) =>
            completeGraphName(perBinding(i0, FixedG(iri)), i0, I(iri), src)
          // GRAPH ?g wrapper: σ(Graph(?g,P),μ) = Union over named graphs
          // gi of Join(σ(P eval'd in D[gi]), {?g→gi}) — the row-carrying
          // VarG translation realizes the union (leaf scans bind ?g from
          // the quads), and because the Graph wrapper sits OUTSIDE every
          // structural operator of the core, ?g acts as a strict equi-key
          // in each per-binding combine below (both sides bind it sure)
          // and never counts toward a MINUS overlap domain (sharedAB is
          // computed from the algebra, where ?g is ctx-bound, not
          // pattern-bound). An outer-bound ?g degenerates to the
          // substituted-constant case through the ls-side compat join.
          case GraphPat(V(gv), i0) =>
            completeGraphName(perBinding(i0, VarG(gv)), i0, V(gv), src)
          // Cross-correlated OPTIONAL: σ(LeftJoin(A,B,F),μ) =
          // LeftJoin(σA, σB, σF) — evaluate BOTH sides per binding and
          // left-outer join them (shared __lid + left vars + a/b vars).
          case LeftJoin(a0, b0, filt) =>
            leftJoinFiltered(perBinding(a0, pctx), perBinding(b0, pctx),
              filt, src, pctx)
          // Cross-correlated MINUS: σ(Minus(A,B),μ) = Minus(σA,σB) with
          // the §18.5 disjoint-domain rule over the σ-DOMAINS — bound
          // left vars are substituted constants and do not count toward
          // the overlap test, so the overlap conjunct ranges only over
          // the live (non-left) shared vars. A SOMETIMES-unbound left
          // var flips per row between "substituted" (outer bound — a
          // constant, outside the σ-domain) and "live" (outer unbound —
          // a pattern var, counts toward the overlap) — decided per
          // __lid by an outer-boundedness marker joined from the tagged
          // left, so the overlap conjunct is row-dynamic.
          case Minus(a0, b0) =>
            val A = perBinding(a0, pctx)
            val B = perBinding(b0, pctx)
            val sharedAB = inScopeVars(a0) & inScopeVars(b0)
            val leftShared = sharedAB & lVars
            val maybe = (leftShared -- sure0).toSeq.sorted
            val live = (sharedAB -- lVars).toSeq.sorted
            if (live.isEmpty && maybe.isEmpty) A
            else {
              val aDf =
                if (maybe.isEmpty) A.df
                else A.df.join(ls.df.select(col("__lid") +:
                  maybe.map(v => col(v).isNull.as("__ob_" + v)): _*),
                  "__lid")
              val rRenamed = B.df.select(B.vars.toSeq.sorted.map(v =>
                col(v).as("__r_" + v)): _*)
              def rc(v: String) = col("__r_" + v)
              val sharedAll = (A.vars & B.vars).toSeq.sorted
              val compat = sharedAll.map(v =>
                if (A.sure(v) && B.sure(v)) col(v) === rc(v)
                else coalesce(col(v) === rc(v), lit(true))).reduce(_ && _)
              val overlap = (live.map(v =>
                col(v).isNotNull && rc(v).isNotNull) ++
                maybe.map(v => col("__ob_" + v) &&
                  col(v).isNotNull && rc(v).isNotNull)).reduce(_ || _)
              Sol(aDf.join(rRenamed, compat && overlap, "left_anti")
                .drop(maybe.map("__ob_" + _): _*),
                A.vars, A.sure, A.cls)
            }
          // Cross-correlated FILTER: σ(Filter(F,P),μ) = Filter(σF,σP).
          // EXISTS conjuncts route through existsSemi (per-binding
          // substitution down to THIS row's full scope — outer vars
          // AND pattern vars); EXISTS nested inside scalar conjuncts
          // become mark-join markers; scalar conjuncts compile over the
          // combined row (left vars present = substitution).
          case Filter(e, i0) =>
            val (existsConjs, scalarConjs) = splitConjuncts(e)
            val base = perBinding(i0, pctx)
            val afterExists = existsConjs.foldLeft(base) {
              case (sol, EExists(pe, pos)) =>
                existsSemi(sol, pe, pos, src, pctx)
            }
            val (marked, scalars2, aux) =
              markExists(afterExists, scalarConjs, src, pctx)
            val filtered = scalars2.foldLeft(marked) { (sol, ex) =>
              Sol(sol.df.where(coalesce(
                SparqlExpr.compileBool(ex, sol.bind, sol.hint),
                lit(false))), sol.vars, sol.sure, sol.cls)
            }
            Sol(filtered.df.drop(aux: _*), afterExists.vars,
              afterExists.sure, afterExists.cls)
          // Nested correlated AGGREGATE (a grouped subselect under a
          // correlated OPTIONAL/UNION branch): aggregate the
          // per-binding input per (__lid, left vars, group keys).
          // Keys-empty groups yield exactly ONE row per binding — pad
          // match-less bindings with a blanked row so COUNT=0 / SUM=0
          // emerge from the engine's own empty-group semantics; keyed
          // groups drop match-less bindings (SPARQL), and the
          // surrounding branch combine (e.g. OPTIONAL's left-outer)
          // reinstates them unbound.
          case Group(ginner0, gkeys, gaggs) =>
            val base = perBinding(ginner0, pctx)
            val marked = Sol(base.df.withColumn("__rmark", lit(true)),
              base.vars, base.sure, base.cls)
            val input =
              if (gkeys.nonEmpty) marked
              else {
                val missing = ls.df.join(
                  base.df.select(col("__lid")).distinct(),
                  Seq("__lid"), "left_anti")
                val padCols = marked.df.columns.toSeq.map(c =>
                  if (ls.vars(c)) col(c)
                  else if (c == "__rmark")
                    lit(null).cast("boolean").as(c)
                  else nullTerm.as(c))
                Sol(marked.df.unionByName(missing.select(padCols: _*)),
                  marked.vars,
                  marked.sure -- (marked.vars -- ls.vars), marked.cls)
              }
            val allKeys =
              ("__lid" +: (ls.vars.toSeq.sorted ++ gkeys)).distinct
            groupAggregate(input, allKeys, gaggs,
              e => when(col("__rmark").isNotNull, e))

          // Nested correlated subselect with LIMIT/OFFSET: peel the
          // parser's Slice(Distinct?(Project?(OrderBy?))) shell and
          // realize the slice as a per-__lid row_number window — the
          // same construction the top-level shell peel uses, applied
          // inside the recursion (e.g. a LIMIT subselect under a
          // correlated OPTIONAL branch).
          case Slice(inner0, off, lim) =>
            val (core2, keys, proj2, dist) = peelSliceShell(inner0)
            val base = perBinding(core2, pctx)
            import org.apache.spark.sql.expressions.Window
            var df = base.df
            if (dist) {
              val dCols = ("__lid" +: proj2.getOrElse(
                (base.vars -- ls.vars).toSeq.sorted)
                .filter(base.vars)).distinct
              df = df.dropDuplicates(dCols)
            }
            val sortCols =
              if (keys.nonEmpty) sortColumns(base, core2, keys)
              else (base.vars -- ls.vars).toSeq.sorted
                .map(v => sortKey(col(v)).asc)
            val w = Window.partitionBy(col("__lid")).orderBy(sortCols: _*)
            df = df.withColumn("__rn", row_number().over(w))
              .where(col("__rn") > off &&
                (if (lim >= 0) col("__rn") <= off + lim else lit(true)))
              .drop("__rn")
            proj2 match {
              case Some(vs) =>
                val hidden = ((lVars & inScopeVars(core2)) -- vs.toSet)
                  .filterNot(sure0).toSeq.sorted
                val keepSet = base.vars & (vs.toSet ++ lVars + "__lid")
                Sol(restoreOuter(df, hidden)
                  .select(keepSet.toSeq.sorted.map(col): _*),
                  keepSet, (base.sure & keepSet) -- hidden,
                  (base.cls -- hidden).view.filterKeys(keepSet).toMap)
              case None => Sol(df, base.vars, base.sure, base.cls)
            }
          // σ over a nested PROJECT: substitution descends through the
          // projection (the same rule the top-level subselect shell
          // peel applies — correlation vars hidden by the projection
          // still correlate, because the per-binding join happens
          // before the projection applies); the projection then hides
          // the non-projected pattern vars, with the outer vars and
          // the __lid tag riding along for the merge. Bag semantics:
          // a column drop never changes multiplicity. (EXISTS patterns
          // rename THEIR hidden vars apart BEFORE reaching here —
          // renameHidden — so this lateral rule stays locked.)
          case Project(i0, vs) =>
            val base = perBinding(i0, pctx)
            val hidden = ((lVars & inScopeVars(i0)) -- vs.toSet)
              .filterNot(sure0).toSeq.sorted
            val keepSet = base.vars & (vs.toSet ++ lVars + "__lid")
            val keep = keepSet.toSeq.sorted
            Sol(restoreOuter(base.df, hidden).select(keep.map(col): _*),
              keepSet, (base.sure & keepSet) -- hidden,
              (base.cls -- hidden).view.filterKeys(keepSet).toMap)
          // σ distributes over Distinct/Reduced: a per-binding DISTINCT
          // is a global dedup over the __lid-tagged row (the left vars
          // are functionally dependent on __lid, so deduping the full
          // extension IS per-left-solution dedup over the σ-domain).
          case Distinct(i0) =>
            val base = perBinding(i0, pctx)
            Sol(base.df.dropDuplicates(base.vars.toSeq.sorted),
              base.vars, base.sure, base.cls)
          case Reduced(i0) =>
            val base = perBinding(i0, pctx)
            Sol(base.df.dropDuplicates(base.vars.toSeq.sorted),
              base.vars, base.sure, base.cls)
          // σ distributes over Join and Extend too — recurse so an
          // unsafe core nested under them still evaluates per binding.
          case Join(a0, b0) =>
            joinSols(perBinding(a0, pctx), perBinding(b0, pctx), "inner")
          case Extend(i0, v, ex0) if !lVars(v) =>
            val base0 = perBinding(i0, pctx)
            // EXISTS as a value inside the BIND body → mark join first
            val (base, Seq(ex), aux) =
              markExists(base0, Seq(ex0), src, pctx)
            Sol(base.df
              .withColumn(v, SparqlExpr.compile(ex, base.bind))
              .drop(aux: _*),
              base0.vars + v, base0.sure,
              SparqlExpr.exprClass(ex0, base0.hint)
                .map(k => base0.cls + (v -> k)).getOrElse(base0.cls - v))
          // Extend RE-BINDING an outer var: substitution cannot touch
          // the AS position, so σμ(Extend(P,v,e)) = Extend(σμ(P),v,σμ(e))
          // binds v in a σ-domain that never contains it; LATERAL's
          // final merge with μ then requires term-equal values — the
          // re-bound value JOINS compatibly rather than replacing. An
          // erroring e leaves v unbound in the σ-solution, which merges
          // freely, keeping the outer value (error-as-unbound).
          case Extend(i0, v, ex0) =>
            val base0 = perBinding(i0, pctx)
            val (base, Seq(ex), aux) =
              markExists(base0, Seq(ex0), src, pctx)
            val value = SparqlExpr.compile(ex, base.bind)
            Sol(base.df
              .where(col(v).isNull || value.isNull || value === col(v))
              .withColumn(v, coalesce(col(v), value))
              .drop(aux: _*),
              base0.vars, base0.sure, base0.cls - v)
          // σ distributes over Union: evaluate each branch per binding
          // and bag-union with var padding (translate's Union shape).
          case Union(a0, b0) =>
            val A = perBinding(a0, pctx)
            val B = perBinding(b0, pctx)
            val allVs = (A.vars ++ B.vars).toSeq.sorted
            def pad(s: Sol): DataFrame =
              s.df.select(allVs.map(v =>
                (if (s.vars(v)) col(v) else nullTerm).as(v)): _*)
            val uCls = (A.cls.keySet ++ B.cls.keySet).flatMap { v =>
              (A.cls.get(v), B.cls.get(v)) match {
                case (Some(x), Some(y)) => if (x == y) Some(v -> x) else None
                case (Some(x), None) => if (B.vars(v)) None else Some(v -> x)
                case (None, Some(y)) => if (A.vars(v)) None else Some(v -> y)
                case _ => None
              }
            }.toMap
            Sol(pad(A).unionByName(pad(B)), A.vars ++ B.vars,
              A.sure & B.sure, uCls)
          // σ distributes over a nested LATERAL: σμ(Lateral(A,B)) pairs
          // each σμ(A) solution μ' with eval(σμ'(B)) — and since μ's
          // bindings ride in every per-binding row of σμ(A), running
          // the LATERAL machinery with σμ(A) AS the left side and the
          // WIDENED domain (outer ∪ scope(A)) is exactly that. This
          // evaluation's __lid tag is just another left var for the
          // inner lateral — stash it under a fresh name around the
          // call so the inner machinery owns the tag name.
          case Lateral(a0, b0) =>
            val A = perBinding(a0, pctx)
            var k = 0; var nm = "__olid0"
            while (A.vars(nm)) { k += 1; nm = s"__olid$k" }
            val stashed = Sol(A.df.withColumnRenamed("__lid", nm),
              A.vars - "__lid" + nm, A.sure - "__lid" + nm, A.cls)
            // nm rides as an outer var (so projections keep it and no
            // Union arm pads the LONG tag with a null Term struct)
            val res = lateralSol(stashed, lVars ++ inScopeVars(a0) + nm,
              b0, src, pctx)
            Sol(res.df.withColumnRenamed(nm, "__lid"),
              res.vars - nm + "__lid",
              if (res.sure(nm)) res.sure - nm + "__lid" else res.sure,
              res.cls)
          // a BARE correlated ORDER BY (no enclosing Slice): the inner
          // order is unobservable after the per-binding join — a
          // SPARQL solution sequence loses its order through Join/
          // LeftJoin — so evaluate the child ignoring the sort
          // (§18.5 ToList only matters under a slice, which the Slice
          // arms above handle with real per-__lid windows). This is
          // what the reference does: such queries run, order-less.
          case OrderBy(i0, _) => perBinding(i0, pctx)
          case _ =>
            throw new UnsupportedOperationException(
              "correlated LATERAL over this pattern shape is not " +
                s"supported (core: ${pH.getClass.getSimpleName})")
        }
      applyHoisted(core, pUp)
    }
  }

  /** Path pattern -> solution. Constant endpoints become closure seeds
    * (and are additionally filtered below — Catalyst pushes those filters
    * into the leaf scans for non-closure paths); `extraS`/`extraO` carry
    * join-derived seeds from translateConjunction.
    */
  private def translatePath(pp: PathPattern, src: QuadSource, ctx: GraphCtx,
      extraS: Option[PathExec.Seed], extraO: Option[PathExec.Seed]): Sol = {
    val PathPattern(s, path, o) = pp
    val spark = src.all.sparkSession
    def constSeed(tp: TermPat): Option[PathExec.Seed] = constCol(tp).map(c =>
      PathExec.Seed(spark.range(1).select(c.as("n")),
        zeroIncludesSeed = true))
    val pairs = PathExec.eval(path, src, ctx,
      constSeed(s).orElse(extraS), constSeed(o).orElse(extraO))
    var df = pairs
    constFilter(col("ps"), s).foreach(f => df = df.where(f))
    constFilter(col("po"), o).foreach(f => df = df.where(f))
    // GRAPH ?g scope: the per-graph pg column binds the graph variable
    // (same contract as scanPattern's VarG binding); a graph variable
    // shared with an endpoint constrains by equality first.
    val gVar: Option[String] = ctx match {
      case VarG(v) => Some(v)
      case _ => None
    }
    val gCols: Seq[(String, Column)] = gVar.map(v => v -> col("pg")).toSeq
    def out(df: DataFrame, cols: Seq[(String, Column)]): Sol = {
      val all = (cols ++ gCols).distinctBy(_._1)
      val constrained = gVar match {
        case Some(v) if cols.exists(_._1 == v) =>
          df.where(col("pg") === cols.find(_._1 == v).get._2)
        case _ => df
      }
      Sol(constrained.select(all.map { case (n, c) => c.as(n) }: _*),
        all.map(_._1).toSet, all.map(_._1).toSet)
    }
    (varName(s), varName(o)) match {
      case (Some(a), Some(b)) if a == b =>
        out(df.where(col("ps") === col("po")), Seq(a -> col("ps")))
      case (Some(a), Some(b)) =>
        out(df, Seq(a -> col("ps"), b -> col("po")))
      case (Some(a), None) => out(df, Seq(a -> col("ps")))
      case (None, Some(b)) => out(df, Seq(b -> col("po")))
      case (None, None) => out(df, Nil)
    }
  }

  /** General join of two solutions on SPARQL-compatible mappings.
    * Equi-join fast path when every shared variable is provably bound on
    * both sides; null-tolerant compatibility join otherwise.
    */
  private def joinSols(l: Sol, r: Sol, joinType: String,
      extraFilter: Option[(String => Option[Column]) => Column] = None): Sol = {
    val shared = (l.vars & r.vars).toSeq.sorted
    val rRenamed = r.df.select(r.vars.toSeq.sorted.map(v =>
      col(v).as("__r_" + v)): _*)
    def rc(v: String): Column = col("__r_" + v)
    val allSure = shared.forall(v => l.sure(v) && r.sure(v))
    val eqCond: Option[Column] = shared match {
      case Seq() => None
      case vs if allSure => Some(vs.map(v => col(v) === rc(v)).reduce(_ && _))
      case vs => Some(vs.map(v => coalesce(col(v) === rc(v), lit(true)))
        .reduce(_ && _))
    }
    // bind for a filter evaluated in the combined scope
    val combinedBind: String => Option[Column] = n =>
      if (shared.contains(n)) Some(coalesce(col(n), rc(n)))
      else if (l.vars(n)) Some(col(n))
      else if (r.vars(n)) Some(rc(n))
      else None
    val filterCond = extraFilter.map(f => coalesce(f(combinedBind), lit(false)))
    val cond = (eqCond, filterCond) match {
      case (Some(a), Some(b)) => a && b
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => lit(true)
    }
    val joined = l.df.join(rRenamed, cond, joinType)
    joinType match {
      case "left_semi" | "left_anti" => Sol(joined, l.vars, l.sure, l.cls)
      case _ =>
        val outVars = (l.vars ++ r.vars).toSeq.sorted
        val proj = outVars.map { v =>
          if (l.vars(v) && r.vars(v)) coalesce(col(v), rc(v)).as(v)
          else if (l.vars(v)) col(v)
          else rc(v).as(v)
        }
        val sure =
          if (joinType == "inner")
            l.sure ++ r.sure
          else l.sure ++ (r.sure -- r.vars) // left outer: right vars may be null
        Sol(joined.select(proj: _*), l.vars ++ r.vars, sure,
          mergeCls(l, r, joinType))
    }
  }

  def translate(gp: GraphPattern, quads: DataFrame): Sol =
    translate(gp, DfQuadSource(quads), DefaultG)
  def translate(gp: GraphPattern, quads: DataFrame, ctx: GraphCtx): Sol =
    translate(gp, DfQuadSource(quads), ctx)
  def translate(gp: GraphPattern, quads: DataFrame,
      classes: Map[String, Term.VClass]): Sol =
    translate(gp, DfQuadSource(quads, classes), DefaultG)

  def translate(gp: GraphPattern, src: QuadSource, ctx: GraphCtx): Sol =
    gp match {

    case Bgp(ps @ _*) =>
      if (ps.isEmpty) {
        // empty BGP: one empty solution (unit of join)
        val spark = src.all.sparkSession
        Sol(spark.range(1).select(lit(1).as("__unit")).drop("__unit")
          .select(), Set.empty, Set.empty)
      } else if (ps.length == 1) scanPattern(src, ps.head, ctx)
      else translateConjunction(ps.map(p => Bgp(p)), src, ctx)

    case pp: PathPattern => translatePath(pp, src, ctx, None, None)

    case j: Join => translateConjunction(conjuncts(j), src, ctx)

    case Lateral(l, r) => translateLateral(l, r, src, ctx)

    case LeftJoin(l, r, filt) =>
      leftJoinFiltered(translate(l, src, ctx), translate(r, src, ctx),
        filt, src, ctx)

    case Minus(l, r) =>
      val ls = translate(l, src, ctx)
      val rs = translate(r, src, ctx)
      val shared = (ls.vars & rs.vars).toSeq.sorted
      if (shared.isEmpty) ls
      else {
        val rRenamed = rs.df.select(rs.vars.toSeq.sorted.map(v =>
          col(v).as("__r_" + v)): _*)
        def rc(v: String) = col("__r_" + v)
        if (shared.forall(v => ls.sure(v) && rs.sure(v))) {
          // Every shared var is provably bound on both sides: the
          // disjoint-domain clause is statically true and compatibility
          // degenerates to equality — a hash-joinable equi anti join
          // (the plan that survives scale; BNLJ does not).
          val eq = shared.map(v => col(v) === rc(v)).reduce(_ && _)
          Sol(ls.df.join(rRenamed, eq, "left_anti"), ls.vars, ls.sure)
        } else {
          val compat = shared.map(v => coalesce(col(v) === rc(v), lit(true)))
            .reduce(_ && _)
          val anyBothBound = shared.map(v =>
            col(v).isNotNull && rc(v).isNotNull).reduce(_ || _)
          Sol(ls.df.join(rRenamed, compat && anyBothBound, "left_anti"),
            ls.vars, ls.sure)
        }
      }

    case Union(l, r) =>
      val ls = translate(l, src, ctx)
      val rs = translate(r, src, ctx)
      val allVars = (ls.vars ++ rs.vars).toSeq.sorted
      def pad(s: Sol): DataFrame =
        s.df.select(allVars.map(v =>
          (if (s.vars(v)) col(v) else nullTerm).as(v)): _*)
      // class claims survive a union when the branches agree (a var
      // bound in only one branch pads null in the other — nulls satisfy
      // every claim)
      val uCls = (ls.cls.keySet ++ rs.cls.keySet).flatMap { v =>
        (ls.cls.get(v), rs.cls.get(v)) match {
          case (Some(a), Some(b)) => if (a == b) Some(v -> a) else None
          case (Some(a), None) => if (rs.vars(v)) None else Some(v -> a)
          case (None, Some(b)) => if (ls.vars(v)) None else Some(v -> b)
          case _ => None
        }
      }.toMap
      Sol(pad(ls).unionByName(pad(rs)), ls.vars ++ rs.vars,
        ls.sure & rs.sure, uCls)

    case Filter(expr, inner) =>
      // EXISTS/NOT EXISTS conjuncts become semi/anti joins (SURVEY
      // §2.3), routed per §18.6 substitution semantics by existsSemi
      val (existsConjs, scalarConjs) = splitConjuncts(expr)
      val in = translate(inner, src, ctx)
      val afterExists = existsConjs.foldLeft(in) {
        case (sol, EExists(p, pos)) => existsSemi(sol, p, pos, src, ctx)
      }
      // EXISTS nested INSIDE a scalar conjunct (e.g. `?x || EXISTS{…}`)
      // becomes a mark-join boolean variable first
      val (marked, scalars2, aux) =
        markExists(afterExists, scalarConjs, src, ctx)
      val filtered = scalars2.foldLeft(marked) { (sol, e) =>
        Sol(sol.df.where(coalesce(
          SparqlExpr.compileBool(e, sol.bind, sol.hint),
          lit(false))), sol.vars, sol.sure, sol.cls)
      }
      Sol(filtered.df.drop(aux: _*), afterExists.vars, afterExists.sure,
        afterExists.cls)

    case Extend(inner, v, expr) =>
      val in0 = translate(inner, src, ctx)
      // EXISTS as a value (BIND(EXISTS{…} AS ?e)) → mark-join marker
      val (in, Seq(expr2), aux) = markExists(in0, Seq(expr), src, ctx)
      val c = SparqlExpr.compile(expr2, in.bind, in.hint)
      val ext = in.df.withColumn(v, c).drop(aux: _*)
      // BNODE()/UUID()/STRUUID()/RAND() mint per-EVALUATION values:
      // a frame carrying such a column that later feeds >1 consumer
      // (CONSTRUCT template branches, self-joins, EXISTS probes) must
      // materialize once — re-evaluations only agree while the
      // partition layout stays identical, the same divergence class as
      // the __lid/__mid row ids caught at the r12 10× scale leg
      val pinned = if (nondetExpr(expr)) scratchTag(ext) else ext
      Sol(pinned, in0.vars + v, in0.sure,
        SparqlExpr.exprClass(expr, in0.hint)
          .map(k => in0.cls + (v -> k)).getOrElse(in0.cls - v))

    case Project(inner, vs) =>
      val in = translate(inner, src, ctx)
      // Under GRAPH ?g the graph variable joins OUTSIDE the subselect
      // (§18.2.2.3: Graph(var, P) = Join(eval(P, D[g]), {(var, g)})), so
      // a projection that hides it must still carry it upward.
      val keep = ctx match {
        case VarG(gv) if !vs.contains(gv) && in.vars(gv) => Seq(gv)
        case _ => Nil
      }
      val outVs = vs ++ keep
      Sol(in.df.select(outVs.map(v =>
        (if (in.vars(v)) col(v) else nullTerm).as(v)): _*),
        outVs.toSet, in.sure & outVs.toSet,
        in.cls.filter(kv => outVs.contains(kv._1)))

    case Distinct(inner) =>
      val in = translate(inner, src, ctx)
      Sol(in.df.distinct(), in.vars, in.sure, in.cls)

    case Reduced(inner) => // spec allows treating REDUCED as DISTINCT
      val in = translate(inner, src, ctx)
      Sol(in.df.distinct(), in.vars, in.sure, in.cls)

    case Slice(inner, offset, limit) =>
      // Inside GRAPH ?g the subselect evaluates per named graph
      // (§18.2.2.3), so OFFSET/LIMIT apply PER GRAPH — a row_number
      // window over the graph variable, ordered by the subselect's own
      // sort keys (arbitrary-but-valid pick when it has none), replaces
      // the global slice.
      def globalSlice(): Sol = {
        val in = translate(inner, src, ctx)
        var df = in.df
        if (offset > 0) df = df.offset(offset.toInt)
        if (limit >= 0) df = df.limit(limit.toInt)
        Sol(df, in.vars, in.sure, in.cls)
      }
      ctx match {
        case VarG(gv) =>
          // The parser always builds Slice(Distinct?(Project(OrderBy(…))))
          // for non-`SELECT *` subselects, so the ORDER BY is NOT Slice's
          // direct child — peel the Distinct/Project shell down to it
          // (same discipline as the LATERAL subselect-shell peel).
          // Matching only a direct OrderBy child would lose the sort keys
          // and the window below would order by lit(1): a correct-looking
          // plan locally, but a NONDETERMINISTIC per-graph LIMIT once a
          // hash exchange destroys the inner sort on a real cluster.
          val (core, sortKeys, sliceProj, sliceDistinct) =
            peelSliceShell(inner)
          val in = translate(core, src, ctx)
          if (!in.vars(gv)) {
            // graph var never bound below (pattern-free body) — the
            // global slice over the untouched subtree is the fallback
            globalSlice()
          } else {
            import org.apache.spark.sql.expressions.Window
            // DISTINCT dedups BEFORE the slice. SPARQL restricts
            // SELECT DISTINCT + ORDER BY to projected variables, so with
            // DISTINCT the projection+dedup run first and the sort keys
            // compile over the deduped rows; without it the window runs
            // over the full rows (sort keys may use hidden vars) and the
            // projection applies after the slice — row-identical.
            def projectTo(s: Sol, dedup: Boolean): Sol = sliceProj match {
              case Some(vs0) =>
                val vs = if (!vs0.contains(gv) && s.vars(gv)) vs0 :+ gv
                         else vs0
                val df0 = s.df.select(vs.map(v =>
                  (if (s.vars(v)) col(v) else nullTerm).as(v)): _*)
                Sol(if (dedup) df0.distinct() else df0, vs.toSet,
                  s.sure & vs.toSet, s.cls.filter(kv => vs.contains(kv._1)))
              case None =>
                if (dedup) Sol(s.df.distinct(), s.vars, s.sure, s.cls)
                else s
            }
            val pre = if (sliceDistinct) projectTo(in, dedup = true) else in
            val w0 = Window.partitionBy(col(gv))
            val w =
              if (sortKeys.nonEmpty)
                w0.orderBy(sortColumns(pre, core, sortKeys): _*)
              else w0.orderBy(lit(1))
            val hi =
              if (limit >= 0) col("__rn") <= lit(offset + limit) else lit(true)
            val sliced = Sol(pre.df.withColumn("__rn", row_number().over(w))
              .where(col("__rn") > lit(offset) && hi).drop("__rn"),
              pre.vars, pre.sure, pre.cls)
            if (sliceDistinct) sliced else projectTo(sliced, dedup = false)
          }
        case _ => globalSlice()
      }

    case OrderBy(inner, keys) =>
      val in0 = translate(inner, src, ctx)
      // EXISTS in an ORDER BY key (a valid BuiltInCall position) →
      // mark-join marker first. The marker is a boolean Term whose lex
      // order ("false" < "true") IS its §15.1 value order, so the
      // EVar sort-key branches stay correct for it.
      val (in, keys2, aux) = {
        val (m, rewritten, a) = markExists(in0, keys.map(_._1), src, ctx)
        (m, rewritten.zip(keys.map(_._2)), a)
      }
      Sol(in.df.orderBy(sortColumns(in, inner, keys2): _*)
        .drop(aux: _*), in0.vars, in0.sure, in0.cls)

    case Group(inner, keys, aggs) =>
      translateGroup(inner, keys, aggs, src, ctx)

    case ValuesPat(vs, rows) =>
      val spark = src.all.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        vs.map(v => org.apache.spark.sql.types.StructField(v, Term.schema, true)))
      val data = rows.map { row =>
        org.apache.spark.sql.Row(row.map {
          case None => null
          case Some(I(iri)) =>
            org.apache.spark.sql.Row(Term.IriKind.toByte, iri, null, null)
          case Some(L(lex, dt, lang)) =>
            org.apache.spark.sql.Row(Term.LiteralKind.toByte, lex, dt,
              lang.orNull)
          case Some(q: Q) => constQLex(q) match {
            case Some(l) =>
              org.apache.spark.sql.Row(Term.QuotedKind.toByte, l, null, null)
            case None => throw new IllegalArgumentException(
              "VALUES quoted triples must be constant: " + q)
          }
          case Some(other) => throw new IllegalArgumentException(
            s"VALUES supports IRIs and literals, got $other")
        }: _*)
      }
      val sure = vs.zipWithIndex.collect {
        case (v, i) if rows.forall(_(i).isDefined) => v
      }.toSet
      Sol(spark.createDataFrame(
        spark.sparkContext.parallelize(data.toList), schema), vs.toSet, sure)

    // §18.2.2.3: Graph distributes over Union — ⋃gi Join(eval(P1 ∪ P2,
    // D[gi]), {g→gi}) = Graph(g,P1) ∪ Graph(g,P2) — so a MIXED union
    // (one branch consults the active graph, one doesn't) gets its
    // catalog completion decided per branch. Plan-neutral otherwise.
    case GraphPat(name, Union(a, b)) =>
      translate(Union(GraphPat(name, a), GraphPat(name, b)), src, ctx)

    case GraphPat(name, inner) => name match {
      case I(iri) =>
        completeGraphName(translate(inner, src, FixedG(iri)),
          inner, name, src)
      case V(v) =>
        completeGraphName(translate(inner, src, VarG(v)), inner, name, src)
      case other =>
        throw new IllegalArgumentException(s"GRAPH name pattern: $other")
    }

    case Service(name, inner, silent) =>
      // Registered handler → local evaluation of the body; otherwise the
      // no-egress build behaves like the reference without http-client:
      // error, or the unit solution under SILENT (§18.8 / spareval
      // service.rs). Variable endpoints require a handler lookup at
      // eval time, which a static translation cannot do — SILENT
      // degrades gracefully, non-SILENT throws.
      def unit: Sol = {
        val spark = src.all.sparkSession
        Sol(spark.range(1).select(lit(1).as("__unit")).drop("__unit")
          .select(), Set.empty, Set.empty)
      }
      name match {
        case I(iri) => ServiceExec.get(iri) match {
          case Some(h) =>
            val df = h.eval(inner, src.all.sparkSession)
            val vs = df.columns.toSet
            Sol(df, vs, if (h.totalBindings) vs else Set.empty)
          case None if silent => unit
          case None => throw new UnsupportedOperationException(
            s"SERVICE <$iri>: no handler registered and this build has " +
              "no HTTP client (use ServiceExec.register, or SERVICE SILENT)")
        }
        case _ if silent => unit
        case other => throw new UnsupportedOperationException(
          s"SERVICE with a variable endpoint ($other) requires SILENT " +
            "or a registered handler")
      }
  }

  /** EXISTS used as a VALUE (BIND(EXISTS{…} AS ?e), FILTER(?x || EXISTS…))
    * rather than as a filter conjunct: rewrite each nested EExists into a
    * boolean marker variable computed by a mark join — semi-join the left
    * solutions (tagged with a per-row id, the lateral `__lid` pattern)
    * against the subpattern, then equi-join the surviving ids back as a
    * `true` marker; misses coalesce to `false`. Two equi joins per
    * EXISTS, no driver work, multiplicity preserved (semi never
    * duplicates and ids are unique).
    *
    * Returns the marked Sol, the rewritten expressions, and the synthetic
    * columns to drop once the consumer has compiled them.
    */
  /** §18.2.2.7 LeftJoin with an arbitrary condition. A plain scalar
    * condition compiles into the outer join; an EXISTS-bearing one
    * cannot (EXISTS needs its own subplan), so decompose per the spec
    * definition LeftJoin = Filter(expr, Join(Ω1,Ω2)) ∪ Diff(Ω1,Ω2,expr):
    * tag left rows, inner-join the compatible pairs, run the normal
    * filter flow on the pairs (EXISTS via existsSemi — §18.6
    * substitution over μ1∪μ2 — and mark joins for nested EXISTS), then
    * anti-join back the left rows with no surviving pair, right vars
    * unbound. Three hash joins, no per-row work.
    */
  private def leftJoinFiltered(A: Sol, B: Sol, filt: Option[Expr],
      src: QuadSource, ctx: GraphCtx): Sol = filt match {
    case Some(f) if hasExists(f) =>
      var k = 0; var id = "__ljid0"
      while (A.vars(id) || B.vars(id)) { k += 1; id = s"__ljid$k" }
      // persisted (r12): consumed by the pair join AND the bare
      // anti-join — the dual-consumer id-stability rule
      val tagged = Sol(scratchTag(A.df.withColumn(id,
          monotonically_increasing_id())),
        A.vars + id, A.sure + id, A.cls)
      val pairs = joinSols(tagged, B, "inner")
      val (existsConjs, scalarConjs) = splitConjuncts(f)
      val afterExists = existsConjs.foldLeft(pairs) {
        case (sol, EExists(p, pos)) => existsSemi(sol, p, pos, src, ctx)
      }
      val (marked, scalars2, aux) =
        markExists(afterExists, scalarConjs, src, ctx)
      val keptDf = scalars2.foldLeft(marked.df) { (df, e) =>
        df.where(coalesce(
          SparqlExpr.compileBool(e, marked.bind, marked.hint), lit(false)))
      }.drop(aux: _*)
      val outVars = (A.vars ++ B.vars).toSeq.sorted
      val bare = tagged.df
        .join(keptDf.select(col(id)).distinct(), Seq(id), "left_anti")
        .select(outVars.map(v =>
          (if (A.vars(v)) col(v) else nullTerm).as(v)): _*)
      Sol(keptDf.select(outVars.map(col): _*).unionByName(bare),
        A.vars ++ B.vars, A.sure ++ (B.sure -- B.vars),
        mergeCls(A, B, "left_outer"))
    case _ =>
      joinSols(A, B, "left_outer", filt.map(f =>
        (b: String => Option[Column]) => SparqlExpr.compileBool(f, b)))
  }

  /** Row ids (unique `idCol` column of `cur.df`, NOT in `cur.vars`)
    * whose EXISTS evaluation of `p` under §18.6 substitution is
    * nonempty: the id rides as the per-binding `__lid` tag and the
    * FULL outer row is the substitution domain, so expression-position
    * correlation, MINUS right sides, UNION/OPTIONAL arms and nested
    * EXISTS all evaluate per binding (the LATERAL σ machinery).
    * Callers rename-apart subselect-hidden vars first (renameHidden).
    */
  private def existsHits(cur: Sol, idCol: String, p: GraphPattern,
      src: QuadSource, ctx: GraphCtx): DataFrame = {
    // an enclosing per-binding scope's __lid is just another outer var
    // here — stash it under a fresh name so THIS evaluation owns the tag
    val (df0, vars0, sure0) =
      if (!cur.vars("__lid")) (cur.df, cur.vars, cur.sure)
      else {
        var k = 0
        var nm = "__olid0"
        while (cur.vars(nm)) { k += 1; nm = s"__olid$k" }
        (cur.df.withColumnRenamed("__lid", nm),
          cur.vars - "__lid" + nm,
          if (cur.sure("__lid")) cur.sure - "__lid" + nm else cur.sure)
      }
    val ls = Sol(df0.withColumnRenamed(idCol, "__lid"),
      vars0 + "__lid", sure0 + "__lid", cur.cls - "__lid")
    new PerBinding(ls, vars0, sure0, src).perBinding(p, ctx)
      .df.select(col("__lid").as(idCol)).distinct()
  }

  /** Filter `sol` by (NOT) EXISTS(p0) under §18.6 substitution:
    * rename subselect-hidden vars apart, then pick the cheapest correct
    * plan — a plain semi/anti join when the pattern is uncorrelated or
    * its correlation coincides with the compat equi-join
    * (lateralJoinSafe); otherwise tag row ids and evaluate per binding
    * (existsHits). */
  private def existsSemi(sol: Sol, p0: GraphPattern, pos: Boolean,
      src: QuadSource, ctx: GraphCtx): Sol = {
    val p = renameHidden(p0, sol.vars)
    val jt = if (pos) "left_semi" else "left_anti"
    if (existsRefs(p, sol.vars).isEmpty || lateralJoinSafe(sol.vars)(p))
      joinSols(sol, translate(p, src, ctx), jt)
    else {
      // persisted (r12): consumed by existsHits AND the semi join back —
      // same dual-consumer id-stability rule as lateralSol's __lid
      val tagged = scratchTag(sol.df.withColumn("__eid",
        monotonically_increasing_id()))
      val hits = existsHits(Sol(tagged, sol.vars, sol.sure, sol.cls),
        "__eid", p, src, ctx)
      Sol(tagged.join(hits, Seq("__eid"), jt).drop("__eid"),
        sol.vars, sol.sure, sol.cls)
    }
  }

  /** Persist + track a row-id-tagged frame: every
    * `monotonically_increasing_id` tag that feeds MORE THAN ONE
    * consumer must materialize exactly once — separate materializations
    * re-evaluate the id expression and are only consistent while the
    * partition layout stays identical, and they re-derive the whole
    * upstream lineage besides (measured: 2 full outer rebuilds per
    * EXISTS at the 10× scale leg). Tracked as scratch so long-lived
    * sessions release it after materializing (Bench/Verify discipline).
    */
  private def scratchTag(df: DataFrame): DataFrame =
    graft.ops.ScratchCaches.track(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Does the expression mint a fresh value per evaluation? (BNODE in
    * both arities — the labeled form rides monotonically_increasing_id
    * — plus the uuid/random builtins.)
    */
  private def nondetExpr(e: Expr): Boolean = e match {
    case EFn(name, args @ _*) =>
      val n = name.toUpperCase(java.util.Locale.ROOT)
      n == "BNODE" || n == "UUID" || n == "STRUUID" || n == "RAND" ||
        args.exists(nondetExpr)
    case _ => false
  }

  private def markExists(in0: Sol, exprs: Seq[Expr], src: QuadSource,
      ctx: GraphCtx): (Sol, Seq[Expr], Seq[String]) = {
    val markers = scala.collection.mutable.ArrayBuffer[(String, EExists)]()
    def strip(e: Expr): Expr = e match {
      case ex: EExists =>
        val m = s"__ex${markers.length}"; markers += (m -> ex); EVar(m)
      case EFn(name, args @ _*) => EFn(name, args.map(strip): _*)
      case other => other
    }
    val rewritten = exprs.map(strip)
    if (markers.isEmpty) return (in0, rewritten, Nil)
    var df = in0.df.withColumn("__mid", monotonically_increasing_id())
    markers.foreach { case (m, EExists(p0, pos)) =>
      // each iteration consumes df twice (hit derivation + the marker
      // left-outer join) — persist per iteration, same rule as __eid
      df = scratchTag(df)
      val cur = Sol(df, in0.vars, in0.sure, in0.cls)
      val p = renameHidden(p0, in0.vars)
      val hits =
        if (existsRefs(p, in0.vars).isEmpty ||
            lateralJoinSafe(in0.vars)(p))
          joinSols(cur, translate(p, src, ctx), "left_semi").df
            .select(col("__mid"))
        else existsHits(cur, "__mid", p, src, ctx)
      val hitIds = hits.withColumn(m, Term.boolLit(lit(true)))
      df = df.join(hitIds, Seq("__mid"), "left_outer")
        .withColumn(m,
          if (pos) coalesce(col(m), Term.boolLit(lit(false)))
          else when(col(m).isNull, Term.boolLit(lit(true)))
            .otherwise(Term.boolLit(lit(false))))
    }
    val names = markers.map(_._1).toSeq
    (Sol(df, in0.vars ++ names, in0.sure ++ names, in0.cls),
      rewritten, names :+ "__mid")
  }

  private def splitConjuncts(e: Expr): (Seq[EExists], Seq[Expr]) = e match {
    case EFn("&&", a, b) =>
      val (e1, s1) = splitConjuncts(a); val (e2, s2) = splitConjuncts(b)
      (e1 ++ e2, s1 ++ s2)
    case ex: EExists => (Seq(ex), Nil)
    case EFn("!", inner) => inner match {
      case EExists(p, pos) => (Seq(EExists(p, !pos)), Nil)
      case _ => (Nil, Seq(e))
    }
    case other => (Nil, Seq(other))
  }

  /** True when every binding site of `v` in the pattern is a subject,
    * predicate or graph-name position — term class is then statically
    * IRI-or-bnode (never a literal). Conservative: any literal-capable
    * site (object position, BIND, VALUES, aggregate output) returns
    * false.
    */
  /** Can the path match with ZERO steps (start node = end node)? */
  private def zeroable(p: Path): Boolean = p match {
    case PZeroOrMore(_) | PZeroOrOne(_) => true
    case PSeq(a, b) => zeroable(a) && zeroable(b)
    case PAlt(a, b) => zeroable(a) || zeroable(b)
    case PInv(q) => zeroable(q)
    case _ => false
  }

  /** Is the SUBJECT position of this path guaranteed IRI-or-blank?
    * False whenever the start node can be an object: inverse steps,
    * inverse negated-property sets, and zero-length-capable paths
    * (§18.4 zero-length pairs range over ALL graph nodes, literals
    * included — `?s :p* "lit"` binds ?s to the literal itself).
    */
  private def pathSubjIriOnly(p: Path): Boolean = p match {
    case PLink(_) => true
    case PNeg(_, inv) => inv.isEmpty
    case PSeq(a, b) =>
      pathSubjIriOnly(a) && (!zeroable(a) || pathSubjIriOnly(b))
    case PAlt(a, b) => pathSubjIriOnly(a) && pathSubjIriOnly(b)
    case POneOrMore(q) => pathSubjIriOnly(q)
    case PInv(_) | PZeroOrMore(_) | PZeroOrOne(_) => false
  }

  private def iriOnly(gp: GraphPattern, v: String): Boolean = gp match {
    case Bgp(ps @ _*) => ps.forall(tp => !varName(tp.o).contains(v))
    case PathPattern(s, path, o) => !varName(o).contains(v) &&
      (!varName(s).contains(v) || pathSubjIriOnly(path))
    case Join(l, r) => iriOnly(l, v) && iriOnly(r, v)
    case Lateral(l, r) => iriOnly(l, v) && iriOnly(r, v)
    case LeftJoin(l, r, _) => iriOnly(l, v) && iriOnly(r, v)
    case Minus(l, _) => iriOnly(l, v)
    case Union(l, r) => iriOnly(l, v) && iriOnly(r, v)
    case Filter(_, i) => iriOnly(i, v)
    case Extend(i, x, _) => x != v && iriOnly(i, v)
    case Project(i, _) => iriOnly(i, v)
    case Distinct(i) => iriOnly(i, v)
    case Reduced(i) => iriOnly(i, v)
    case Slice(i, _, _) => iriOnly(i, v)
    case OrderBy(i, _) => iriOnly(i, v)
    case Group(i, keys, aggs) =>
      aggs.forall(_._1 != v) && (!keys.contains(v) || iriOnly(i, v))
    case ValuesPat(vs, _) => !vs.contains(v)
    case GraphPat(_, i) => iriOnly(i, v)
    // SERVICE bindings come from an external handler — no static claim
    case Service(_, i, _) => false
  }

  /** Nulls-last variant of the sort key, so MIN/SAMPLE skip unbound. */
  private def sortKeyNullsLast(t: Column): Column = struct(
    when(t.isNull, 9)
      .when(t("kind") === Term.BlankKind, 1)
      .when(t("kind") === Term.IriKind, 2).otherwise(3).as("cls"),
    sortKey(t).getField("num").as("num"),
    sortKey(t).getField("numx").as("numx"),
    sortKey(t).getField("lex").as("lex"),
    sortKey(t).getField("dt").as("dt"),
    sortKey(t).getField("lang").as("lang"))

  /** ORDER BY key columns for a translated solution (shared by the
    * OrderBy case and the per-graph Slice window).
    */
  /** Peel a subselect's modifier shell down to its ORDER BY:
    * `Slice(Distinct?(Project?(OrderBy(core))))` is the parser's
    * canonical nesting, so Slice's sort keys live two levels down.
    * Returns (core below the OrderBy, sort keys, projection vars,
    * distinct?). Exposed for the plan-lock spec: losing the keys here
    * silently degrades a per-graph ordered LIMIT to an arbitrary pick.
    */
  private[graft] def peelSliceShell(inner: GraphPattern)
      : (GraphPattern, Seq[(Expr, Boolean)], Option[Seq[String]], Boolean) = {
    var node = inner
    var dist = false
    var proj: Option[Seq[String]] = None
    var keys: Seq[(Expr, Boolean)] = Nil
    var peeling = true
    while (peeling) node match {
      case Distinct(i) if !dist && proj.isEmpty => dist = true; node = i
      case Reduced(i) if !dist && proj.isEmpty => dist = true; node = i
      case Project(i, vs) if proj.isEmpty => proj = Some(vs); node = i
      case OrderBy(i, ks) => keys = ks; node = i; peeling = false
      case _ => peeling = false
    }
    (node, keys, proj, dist)
  }

  private def sortColumns(in: Sol, inner: GraphPattern,
      keys: Seq[(Expr, Boolean)]): Seq[Column] =
    keys.map { case (e, asc) =>
      val k = e match {
        // static term-class shortcut (sparopt type-inference spirit):
        // a var bound only in subject/predicate/graph positions can
        // never be a literal, so the numeric/temporal/datatype ranks
        // are dead code — order by (class, lex) alone
        case EVar(v) if in.vars(v) && iriOnly(inner, v) =>
          struct(
            when(col(v).isNull, 0)
              .when(col(v)("kind") === Term.BlankKind, 1)
              .otherwise(2).as("cls"),
            coalesce(col(v)("lex"), lit("")).as("lex"))
        // inferred value class prunes the dead rank branches (VNum
        // drops the temporal regex tree from measure sorts)
        case EVar(v) if in.vars(v) && in.cls.contains(v) =>
          sortKey(col(v), in.cls.get(v))
        case _ => sortKey(SparqlExpr.compile(e, in.bind, in.hint))
      }
      if (asc) k.asc else k.desc
    }

  private def hasExists(e: Expr): Boolean = e match {
    case _: EExists => true
    case EFn(_, args @ _*) => args.exists(hasExists)
    case _ => false
  }

  /** Does any pattern leaf of `gp` evaluate against the ACTIVE graph —
    * i.e. is there a Bgp/Path leaf (or an EXISTS, which evaluates its
    * pattern in the active graph) not shadowed by a nested GRAPH?
    * Conservative toward `true`: `true` keeps the row-carrying
    * translation as-is, `false` enables the catalog completion below.
    */
  private def consultsActiveGraph(gp: GraphPattern): Boolean = gp match {
    case Bgp(ps @ _*) => ps.nonEmpty
    case _: PathPattern => true
    case _: ValuesPat => false
    case GraphPat(_, _) => false // nested GRAPH overrides the active graph
    case Join(a, b) => consultsActiveGraph(a) || consultsActiveGraph(b)
    case Union(a, b) => consultsActiveGraph(a) || consultsActiveGraph(b)
    case Lateral(a, b) => consultsActiveGraph(a) || consultsActiveGraph(b)
    case LeftJoin(a, b, f) => consultsActiveGraph(a) ||
      consultsActiveGraph(b) || f.exists(hasExists)
    case Minus(a, b) => consultsActiveGraph(a) || consultsActiveGraph(b)
    case Filter(e, i) => hasExists(e) || consultsActiveGraph(i)
    case Extend(i, _, ex) => hasExists(ex) || consultsActiveGraph(i)
    case Project(i, _) => consultsActiveGraph(i)
    case Distinct(i) => consultsActiveGraph(i)
    case Reduced(i) => consultsActiveGraph(i)
    case Slice(i, _, _) => consultsActiveGraph(i)
    case OrderBy(i, ks) => ks.exists(k => hasExists(k._1)) ||
      consultsActiveGraph(i)
    case Group(i, _, aggs) => consultsActiveGraph(i) ||
      aggs.exists(_._2.expr.exists(hasExists))
    case _ => true // unknown shape: be conservative, change nothing
  }

  /** §18.2.2.3 completion for GRAPH over a pattern that never consults
    * the active graph (empty group `GRAPH ?g {}`, a nested GRAPH, pure
    * VALUES) — there the row-carrying translation's leaf scans never
    * touch the wrapper's graph name, so the spec's union-over-graphs
    * Join must be applied explicitly:
    *  - Graph(var, P) = ⋃ over named gi of Join(eval(P, D[gi]), {var→gi}):
    *    eval(P, D[gi]) is identical per gi, so cross-join the catalog
    *    when the var is fresh (the standard "enumerate named graphs"
    *    idiom), semi-join it when the pattern bound the var itself
    *    (sure) — the Join keeps exactly the values that ARE graph
    *    names. A sometimes-unbound self-bound var (VALUES with UNDEF)
    *    keeps the uncompleted translation — documented corner.
    *  - Graph(iri, P) is the EMPTY multiset when iri is not a graph
    *    name in the dataset — gate the rows on catalog membership
    *    (in a quad table, absent ⟺ zero quads).
    */
  /** The dataset's named-graph catalog as single-column `g` term rows:
    * graphs holding quads, plus the source's empty-graph registry
    * (CREATEd/CLEARed graphs a quad table cannot represent).
    */
  private def namedGraphCatalog(src: QuadSource): DataFrame = {
    val fromQuads = src.all
      .where(col("g")("kind") =!= Term.DefaultGraphKind)
      .select(col("g"))
    val extra = src.extraNamedGraphs
    val all0 =
      if (extra.isEmpty) fromQuads
      else extra.map(i =>
        fromQuads.sparkSession.range(1).select(Term.iri(i).as("g")))
        .foldLeft(fromQuads)(_ unionByName _)
    all0.distinct()
  }

  private def completeGraphName(sol: Sol, inner: GraphPattern,
      name: TermPat, src: QuadSource): Sol = {
    if (consultsActiveGraph(inner)) sol
    else name match {
      case V(v) =>
        val cat = namedGraphCatalog(src).select(col("g").as(v))
        if (!sol.vars(v))
          Sol(sol.df.crossJoin(cat), sol.vars + v, sol.sure + v, sol.cls)
        else if (sol.sure(v))
          Sol(sol.df.join(cat, Seq(v), "left_semi"),
            sol.vars, sol.sure, sol.cls)
        else {
          // sometimes-unbound self-bound var (VALUES with UNDEF): the
          // spec's Join with {var→gi} is a COMPATIBLE join — unbound
          // rows fan out over the whole catalog, bound rows gate on
          // membership, and the var is surely a graph name afterwards.
          // The catalog is metadata-scale: broadcast.
          val cg = "__cat_" + v
          val cat2 = namedGraphCatalog(src).select(col("g").as(cg))
          Sol(sol.df.join(broadcast(cat2),
              col(v).isNull || col(v) === col(cg), "inner")
            .withColumn(v, coalesce(col(v), col(cg))).drop(cg),
            sol.vars, sol.sure + v, sol.cls - v)
        }
      case I(iri) if !src.extraNamedGraphs.contains(iri) =>
        val gate = src.all
          .where(col("g")("kind") === Term.IriKind &&
            col("g")("lex") === iri).limit(1).select()
        Sol(sol.df.crossJoin(gate), sol.vars, sol.sure, sol.cls)
      case _ => sol // registry-known iri: exists, no gate needed
    }
  }

  private def translateGroup(inner: GraphPattern, keys: Seq[String],
      aggs0: Seq[(String, AggCall)], src: QuadSource, ctx: GraphCtx): Sol = {
    val in0 = translate(inner, src, ctx)
    // EXISTS inside aggregate arguments (SUM(IF(EXISTS{…},1,0))) or a
    // GROUP_CONCAT order key → mark-join markers BEFORE aggregation.
    // Markers are deterministic per solution, so COUNT(DISTINCT *)
    // over vars-plus-markers counts the same solutions.
    val flat = aggs0.flatMap(a =>
      a._2.expr.toSeq ++ a._2.orderBy.map(_._1))
    val (in, rewrittenFlat, _) = markExists(in0, flat, src, ctx)
    val it = rewrittenFlat.iterator
    val aggs = aggs0.map { case (nm, c) =>
      (nm, c.copy(
        expr = c.expr.map(_ => it.next()),
        orderBy = c.orderBy.map { case (_, asc) => (it.next(), asc) }))
    }
    // Inside GRAPH ?g the pattern evaluates once PER named graph
    // (§18.2.2.3), so an aggregate written there groups per graph — the
    // graph variable joins the keys implicitly.
    val keys2 = ctx match {
      case VarG(gv) if !keys.contains(gv) && in.vars(gv) => keys :+ gv
      case _ => keys
    }
    ctx match {
      case VarG(gv) if keys.isEmpty && in.vars(gv) =>
        // An IMPLICIT group (no GROUP BY keys) evaluated per named graph
        // must emit its empty-group row (COUNT=0, SUM=0, GROUP_CONCAT=""
        // …) for every named graph with ZERO matching rows — grouping
        // the row-carrying translation by ?g alone silently drops them.
        // Pad one marked-null row per missing graph from the dataset's
        // named-graph catalog and blank the aggregate inputs on it (the
        // same padding-row trick as the per-binding LATERAL rewrite), so
        // the engine's own empty-group semantics apply unchanged.
        val catalog = namedGraphCatalog(src).select(col("g").as(gv))
        val missing = catalog.join(in.df.select(col(gv)).distinct(),
          Seq(gv), "left_anti")
        val padCols = in.df.columns.toSeq.map(c =>
          if (c == gv) col(gv) else nullTerm.as(c))
        val padded = in.df.withColumn("__gmark", lit(true))
          .unionByName(missing.select(padCols: _*)
            .withColumn("__gmark", lit(null).cast("boolean")))
        groupAggregate(Sol(padded, in.vars, in.sure, in.cls), keys2, aggs,
          e => when(col("__gmark"), e))
      case _ =>
        groupAggregate(in, keys2, aggs)
    }
  }

  /** Aggregation core over an existing solution. `wrap` guards each
    * aggregate input (and the COUNT(*) row marker) — the per-binding
    * LATERAL rewrite uses it to blank the padding row a left-outer join
    * introduces for match-less bindings.
    */
  private def groupAggregate(in: Sol, keys: Seq[String],
      aggs: Seq[(String, AggCall)],
      wrap: Column => Column = identity): Sol = {
    import org.apache.spark.sql.types._
    val DV = DecimalType(38, 12)
    val aggCols = scala.collection.mutable.ListBuffer[Column]()
    val post = scala.collection.mutable.ListBuffer[Column]()
    aggs.zipWithIndex.foreach { case ((outName, call), i) =>
      val e = call.expr.map(x => wrap(SparqlExpr.compile(x, in.bind)))
      def n(suffix: String) = s"__a${i}_$suffix"
      call.fn match {
        case "COUNT_STAR" =>
          // COUNT(DISTINCT *) counts distinct whole solutions: one struct
          // over every in-scope var (a struct is itself never null, so
          // solutions with unbound positions still count)
          aggCols += (if (call.distinct) {
            val vs = in.vars.toSeq.sorted.map(col)
            countDistinct(wrap(if (vs.isEmpty) lit(1) else struct(vs: _*)))
          } else count(wrap(lit(1)))).as(n("c"))
          post += Term.intLit(col(n("c"))).as(outName)
        case "COUNT" =>
          val x = e.get
          aggCols += (if (call.distinct) countDistinct(x) else count(x)).as(n("c"))
          post += Term.intLit(col(n("c"))).as(outName)
        case "SUM" | "AVG" =>
          val x = e.get
          val dv = numDec(x)
          val db = numDbl(x)
          aggCols += (if (call.distinct) sum_distinct(dv) else sum(dv)).as(n("sd"))
          aggCols += (if (call.distinct) sum_distinct(db) else sum(db)).as(n("sb"))
          aggCols += max(when(Term.isNumericLit(x),
            when(x("dt") === Term.XsdDouble, 3)
              .when(x("dt") === Term.XsdFloat, 2)
              .when(x("dt") === Term.XsdDecimal, 1).otherwise(0))).as(n("r"))
          // error-input flag: a PRESENT non-numeric term is a type error
          // for op:numeric-add; an errored/unbound evaluation (NULL) is
          // NOT — ListEval/Flatten drop evaluation errors before the set
          // function (cf. agg-sum-promotion vs agg-sum-error fixtures)
          aggCols += max(when(x.isNotNull && !Term.isNumericLit(x), 1)
            .otherwise(0)).as(n("nn"))
          // AVG(DISTINCT) divides the DISTINCT sum by the DISTINCT
          // count (§18.5.1.5 over Distinct(M)) — a plain count here
          // silently deflated every duplicate-bearing distinct average
          aggCols += (if (call.distinct) countDistinct(dv) else count(dv))
            .as(n("cnt"))
          val sd = col(n("sd")); val sb = col(n("sb")); val r = col(n("r"))
          val bad = col(n("nn")) === 1
          if (call.fn == "SUM")
            post += when(bad, nullTerm)
              .when(col(n("cnt")) === 0, Term.intLit(lit(0L)))
              .when(r === 3, Term.doubleLit(sb))
              // float-only input: op:numeric-add stays in float — the
              // result datatype is xsd:float, value rounded to f32
              .when(r === 2,
                Term.typedLit(SparqlExpr.fltLex(sb), Term.XsdFloat))
              .when(r === 0, Term.intLit(sd.cast(DecimalType(38, 0))
                .cast(LongType)))
              .otherwise(Term.decimalLit(SparqlExpr.decLex(sd))).as(outName)
          else
            // §18.5.1.5: Avg(M) = 0 when Count(M) = 0 (defined via
            // Sum/Count — same integer 0 as the empty Sum)
            post += when(bad, nullTerm)
              .when(col(n("cnt")) === 0, Term.intLit(lit(0L)))
              .when(r === 3, Term.doubleLit(sb / col(n("cnt"))))
              .when(r === 2, Term.typedLit(
                SparqlExpr.fltLex(sb / col(n("cnt"))), Term.XsdFloat))
              .otherwise(Term.decimalLit(SparqlExpr.decLex(
                (sd / col(n("cnt"))).cast(DV)))).as(outName)
        case "MIN" =>
          aggCols += min_by(e.get, sortKeyNullsLast(e.get)).as(n("m"))
          post += col(n("m")).as(outName)
        case "MAX" =>
          aggCols += max_by(e.get, sortKey(e.get)).as(n("m"))
          post += col(n("m")).as(outName)
        case "SAMPLE" =>
          aggCols += min_by(e.get, sortKeyNullsLast(e.get)).as(n("m"))
          post += col(n("m")).as(outName)
        case "GROUP_CONCAT" =>
          val x = e.get
          if (call.orderBy.isEmpty) {
            // documented deviation: input order is nondeterministic in a
            // distributed bag, so elements sort by SPARQL TERM ORDER
            // (numeric values numerically, not lexicographically), lex
            // as tiebreak — same comparator family as ORDER BY
            val elem = struct(sortKey(x).as("__k"), x("lex").as("__lex"))
            val cmp = (l: Column, r: Column) =>
              when(l("__k") < r("__k"), -1).when(l("__k") > r("__k"), 1)
                .otherwise(when(l("__lex") < r("__lex"), -1)
                  .when(l("__lex") > r("__lex"), 1).otherwise(0))
            val sorted = array_sort(collect_list(elem), cmp)
            val lexes0 = transform(sorted, s => s("__lex"))
            val lexes =
              if (call.distinct) array_distinct(lexes0) else lexes0
            aggCols += array_join(lexes, call.separator).as(n("g"))
            post += Term.strLit(col(n("g"))).as(outName)
          } else {
            // explicit `; ORDER BY …`: collect (key…, lex) structs and
            // sort with a comparator honoring per-key ASC/DESC over the
            // SPARQL term-order keys; lex is the final ascending
            // tiebreak so the result is deterministic
            val keyCols = call.orderBy.zipWithIndex.map { case ((oe, _), j) =>
              sortKey(wrap(SparqlExpr.compile(oe, in.bind))).as(s"__k$j")
            }
            val dirs = call.orderBy.map(_._2)
            val elem = struct((keyCols :+ x("lex").as("__lex")): _*)
            val cmp = (l: Column, r: Column) => {
              val lexCmp = when(l("__lex") < r("__lex"), -1)
                .when(l("__lex") > r("__lex"), 1).otherwise(0)
              dirs.zipWithIndex.foldRight(lexCmp) { case ((asc, j), tail) =>
                val (lo, hi) = if (asc) (-1, 1) else (1, -1)
                // null keys (error/unbound) fall through as equal
                when(l(s"__k$j") < r(s"__k$j"), lo)
                  .when(l(s"__k$j") > r(s"__k$j"), hi)
                  .otherwise(tail)
              }
            }
            val sorted = array_sort(collect_list(elem), cmp)
            val lexes0 = transform(sorted, s => s("__lex"))
            val lexes = if (call.distinct) array_distinct(lexes0) else lexes0
            aggCols += array_join(lexes, call.separator).as(n("g"))
            post += Term.strLit(col(n("g"))).as(outName)
          }
        case other => SparqlExpr.customAggregate(other) match {
          case Some(f) =>
            aggCols += f(e.get, call.distinct).as(n("m"))
            post += col(n("m")).as(outName)
          case None => throw new IllegalArgumentException(
            s"aggregate not implemented: $other")
        }
      }
    }
    val grouped =
      if (keys.isEmpty) in.df.agg(aggCols.head, aggCols.tail.toSeq: _*)
      else in.df.groupBy(keys.map(col): _*)
        .agg(aggCols.head, aggCols.tail.toSeq: _*)
    val finalCols = keys.map(col) ++ post
    // aggregate outputs have statically-known value classes (COUNT/SUM/
    // AVG numeric, GROUP_CONCAT string, MIN/MAX/SAMPLE inherit)
    val aggCls: Map[String, Term.VClass] = aggs.flatMap {
      case (out, call) => call.fn match {
        case "COUNT" | "COUNT_STAR" => Some(out -> Term.VNum)
        case "SUM" | "AVG" => Some(out -> Term.VNum)
        case "GROUP_CONCAT" => Some(out -> Term.VStr)
        case "MIN" | "MAX" | "SAMPLE" => call.expr match {
          case Some(EVar(k)) => in.cls.get(k).map(out -> _)
          case _ => None
        }
        case _ => None
      }
    }.toMap
    Sol(grouped.select(finalCols: _*), keys.toSet ++ aggs.map(_._1).toSet,
      (in.sure & keys.toSet),
      in.cls.filter(kv => keys.contains(kv._1)) ++ aggCls)
  }
}
