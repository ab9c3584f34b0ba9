package graft.algebra

/** SPARQL algebra ADT — the engine IR.
  *
  * Mirrors the reference's parsed algebra (oxigraph: lib/spargebra/src/
  * algebra.rs · `GraphPattern`, `Expression`, `PropertyPathExpression`,
  * `AggregateExpression`; lib/spargebra/src/term.rs · `TermPattern`) —
  * the *shape* of the IR, not its implementation. Queries are built
  * programmatically until the parser lands (SURVEY.md §7.2 step 7).
  */
object Algebra {

  // ---- term patterns -------------------------------------------------
  sealed trait TermPat
  final case class V(name: String) extends TermPat // variable
  final case class I(iri: String) extends TermPat // named node
  final case class L(lex: String, dt: String, lang: Option[String] = None)
      extends TermPat // literal
  final case class B(id: String) extends TermPat // blank node (as variable-like)
  case object DefaultGraphPat extends TermPat // default graph in quad data
  /** RDF-star quoted-triple pattern `<< s p o >>` in subject/object
    * position (spargebra RDF-star grammar: TermPattern::Triple).
    * Components may be variables; fully-constant patterns compare as one
    * canonical term.
    */
  final case class Q(s: TermPat, p: TermPat, o: TermPat) extends TermPat

  object L {
    import graft.model.Term._
    def str(s: String): L = L(s, XsdString)
    def int(i: Long): L = L(i.toString, XsdInteger)
    def dec(d: BigDecimal): L = L(d.toString, XsdDecimal)
    def dbl(d: Double): L = L(d.toString, XsdDouble)
    def bool(b: Boolean): L = L(b.toString, XsdBoolean)
  }

  final case class TriplePattern(s: TermPat, p: TermPat, o: TermPat)

  // ---- property paths (spargebra · PropertyPathExpression) -----------
  sealed trait Path
  final case class PLink(iri: String) extends Path
  final case class PInv(p: Path) extends Path
  final case class PSeq(a: Path, b: Path) extends Path
  final case class PAlt(a: Path, b: Path) extends Path
  final case class PZeroOrOne(p: Path) extends Path
  final case class POneOrMore(p: Path) extends Path
  final case class PZeroOrMore(p: Path) extends Path
  /** Negated property set `!(p1|…|^q1|…)`: `iris` are the forward
    * exclusions, `invIris` the inverse ones. Per SPARQL §18.2.2.5 each
    * component exists only when its list is non-empty.
    */
  final case class PNeg(iris: Seq[String], invIris: Seq[String] = Nil)
      extends Path

  // ---- expressions (spargebra · Expression) --------------------------
  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class EIri(iri: String) extends Expr
  final case class ELit(lex: String, dt: String, lang: Option[String] = None)
      extends Expr
  /** Builtin call by SPARQL name: "&&", "||", "!", "=", "<", "+", "STR",
    * "REGEX", ... — dispatched in SparqlExpr.
    */
  final case class EFn(name: String, args: Expr*) extends Expr
  final case class EExists(pattern: GraphPattern, positive: Boolean = true)
      extends Expr

  object ELit {
    import graft.model.Term._
    def int(i: Long): ELit = ELit(i.toString, XsdInteger)
    def dbl(d: Double): ELit = ELit(d.toString, XsdDouble)
    def str(s: String): ELit = ELit(s, XsdString)
    def bool(b: Boolean): ELit = ELit(b.toString, XsdBoolean)
  }

  // ---- aggregates (spargebra · AggregateExpression) ------------------
  final case class AggCall(
      fn: String, // COUNT | SUM | AVG | MIN | MAX | SAMPLE | GROUP_CONCAT | COUNT_STAR
      expr: Option[Expr],
      distinct: Boolean = false,
      separator: String = " ",
      // GROUP_CONCAT element order (extension syntax `; ORDER BY c...`,
      // as in ARQ). Empty = the documented default: elements sorted by
      // SPARQL term order, because "input order" is not well defined
      // over a distributed bag.
      orderBy: Seq[(Expr, Boolean)] = Nil)

  // ---- graph patterns (spargebra · GraphPattern) ---------------------
  sealed trait GraphPattern
  final case class Bgp(patterns: TriplePattern*) extends GraphPattern
  final case class PathPattern(s: TermPat, path: Path, o: TermPat)
      extends GraphPattern
  final case class Join(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class LeftJoin(l: GraphPattern, r: GraphPattern,
      filter: Option[Expr] = None) extends GraphPattern
  final case class Minus(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class Union(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class Filter(expr: Expr, inner: GraphPattern) extends GraphPattern
  final case class Extend(inner: GraphPattern, v: String, expr: Expr)
      extends GraphPattern
  final case class Project(inner: GraphPattern, vars: Seq[String])
      extends GraphPattern
  final case class Distinct(inner: GraphPattern) extends GraphPattern
  final case class Reduced(inner: GraphPattern) extends GraphPattern
  final case class Slice(inner: GraphPattern, offset: Long, limit: Long)
      extends GraphPattern // limit < 0 => none
  final case class OrderBy(inner: GraphPattern, keys: Seq[(Expr, Boolean)])
      extends GraphPattern // (expr, ascending)
  final case class Group(inner: GraphPattern, keys: Seq[String],
      aggs: Seq[(String, AggCall)]) extends GraphPattern
  final case class ValuesPat(vars: Seq[String],
      rows: Seq[Seq[Option[TermPat]]]) extends GraphPattern
  final case class GraphPat(name: TermPat, inner: GraphPattern)
      extends GraphPattern
  /** SPARQL 1.2 / oxigraph extension: right evaluated per left binding. */
  final case class Lateral(l: GraphPattern, r: GraphPattern)
      extends GraphPattern
  /** SPARQL 1.1 Federated Query `SERVICE (SILENT)? name { inner }`
    * (spargebra · GraphPattern::Service). Evaluation dispatches to a
    * registered handler (spareval/src/service.rs · ServiceHandler); with
    * no handler the reference without its `http-client` feature errors,
    * and SILENT turns that failure into the unit solution (§18.8).
    */
  final case class Service(name: TermPat, inner: GraphPattern,
      silent: Boolean = false) extends GraphPattern

  // ---- query forms (spargebra/src/query.rs · Query) ------------------
  sealed trait QueryForm
  final case class Select(pattern: GraphPattern) extends QueryForm
  final case class Ask(pattern: GraphPattern) extends QueryForm
  final case class Construct(template: Seq[TriplePattern],
      pattern: GraphPattern) extends QueryForm
  final case class Describe(pattern: GraphPattern, vars: Seq[String])
      extends QueryForm

  // ---- updates (spargebra/src/update.rs · GraphUpdateOperation) ------
  sealed trait UpdateOp
  final case class InsertData(quads: Seq[(TermPat, TriplePattern)])
      extends UpdateOp
  final case class DeleteData(quads: Seq[(TermPat, TriplePattern)])
      extends UpdateOp
  /** Templates are QUAD patterns (update.rs · GraphUpdateOperation::
    * DeleteInsert holds Vec<QuadPattern>): each triple carries a graph
    * position — DefaultGraphPat, a constant IRI (GRAPH <g> block / WITH
    * default), or a variable bound in `where` (GRAPH ?g block).
    */
  final case class DeleteInsert(
      delete: Seq[(TermPat, TriplePattern)],
      insert: Seq[(TermPat, TriplePattern)],
      where: GraphPattern,
      /** USING / USING NAMED (§3.1.3): the dataset WHERE matches
        * against, exactly like FROM on queries; template effects still
        * hit the full store. USING overrides WITH for matching.
        */
      using: Seq[String] = Nil,
      usingNamed: Seq[String] = Nil,
      /** The WITH graph, when the operation was written with one —
        * already folded into the templates and (absent USING) the
        * WHERE; recorded so the protocol layer can enforce §2.2.3's
        * rule that using-graph-uri parameters may not combine with a
        * WITH/USING-bearing operation.
        */
      withGraph: Option[String] = None) extends UpdateOp
  final case class ClearGraph(graph: Option[String]) extends UpdateOp
  /** DROP removes the graph's quads AND its entry in the store-level
    * named-graph registry (GraftStore tracks empty graphs; the bare
    * quad-table path treats Drop ≡ Clear). `None` = the default graph.
    */
  final case class DropGraph(graph: Option[String]) extends UpdateOp
  /** CLEAR/DROP NAMED and ALL targets (SPARQL 1.1 Update §3.2.3/§3.2.2:
    * GraphRefAll ::= GraphRef | DEFAULT | NAMED | ALL).
    */
  case object ClearNamed extends UpdateOp
  case object ClearAll extends UpdateOp
  case object DropNamed extends UpdateOp
  case object DropAll extends UpdateOp
  /** Graph management (update.rs · GraphUpdateOperation::{Copy,Move,Add,
    * Load,Create}); `None` = the default graph. CREATE registers an empty
    * graph in the store-level registry (no quad effect).
    */
  final case class CopyGraph(from: Option[String], to: Option[String])
      extends UpdateOp
  final case class MoveGraph(from: Option[String], to: Option[String])
      extends UpdateOp
  final case class AddGraph(from: Option[String], to: Option[String])
      extends UpdateOp
  final case class LoadGraph(source: String, into: Option[String])
      extends UpdateOp
  final case class CreateGraph(iri: String) extends UpdateOp

  /** Variables bound by a pattern (used for join planning). */
  def vars(tp: TermPat): Set[String] = tp match {
    case V(n) => Set(n)
    case B(id) => Set("_bnode_" + id)
    case Q(s, p, o) => vars(s) ++ vars(p) ++ vars(o)
    case _ => Set.empty
  }

  /** Variables an expression references. EExists contributes its
    * pattern's in-scope vars (they correlate with the enclosing scope).
    */
  def exprVars(e: Expr): Set[String] = e match {
    case EVar(n) => Set(n)
    case EFn(_, args @ _*) => args.flatMap(exprVars).toSet
    case EExists(p, _) => inScopeVars(p)
    case _ => Set.empty
  }

  def inScopeVars(gp: GraphPattern): Set[String] = gp match {
    case Bgp(ps @ _*) =>
      ps.flatMap(p => vars(p.s) ++ vars(p.p) ++ vars(p.o)).toSet
    case PathPattern(s, _, o) => vars(s) ++ vars(o)
    case Join(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case LeftJoin(l, r, _) => inScopeVars(l) ++ inScopeVars(r)
    case Minus(l, _) => inScopeVars(l)
    case Union(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case Filter(_, i) => inScopeVars(i)
    case Extend(i, v, _) => inScopeVars(i) + v
    case Project(_, vs) => vs.toSet
    case Distinct(i) => inScopeVars(i)
    case Reduced(i) => inScopeVars(i)
    case Slice(i, _, _) => inScopeVars(i)
    case OrderBy(i, _) => inScopeVars(i)
    case Group(_, keys, aggs) => keys.toSet ++ aggs.map(_._1)
    case ValuesPat(vs, _) => vs.toSet
    case GraphPat(name, i) => inScopeVars(i) ++ vars(name)
    case Lateral(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case Service(_, i, _) => inScopeVars(i)
  }

  /** Static "surely bound": v is bound in EVERY solution of gp. Used by
    * join-equivalence checks (e.g. the MINUS-in-LATERAL overlap rule)
    * that need a variable provably non-null without translating first.
    * Conservative: false when in doubt (BIND may error to unbound,
    * VALUES may hold UNDEF, OPTIONAL/MINUS right sides don't count).
    */
  def sureIn(gp: GraphPattern, v: String): Boolean = gp match {
    case b: Bgp => inScopeVars(b)(v)
    case p: PathPattern => inScopeVars(p)(v)
    case ValuesPat(vs, rows) =>
      vs.indexOf(v) match {
        case -1 => false
        case i => rows.forall(r => r(i).isDefined)
      }
    case Join(l, r) => sureIn(l, v) || sureIn(r, v)
    case Lateral(l, r) => sureIn(l, v) || sureIn(r, v)
    case Union(l, r) => sureIn(l, v) && sureIn(r, v)
    case LeftJoin(l, _, _) => sureIn(l, v)
    case Minus(l, _) => sureIn(l, v)
    case Filter(_, i) => sureIn(i, v)
    case Extend(i, _, _) => sureIn(i, v)
    case Distinct(i) => sureIn(i, v)
    case Reduced(i) => sureIn(i, v)
    case Slice(i, _, _) => sureIn(i, v)
    case OrderBy(i, _) => sureIn(i, v)
    case Project(i, vs) => vs.contains(v) && sureIn(i, v)
    case GraphPat(name, i) => sureIn(i, v) || vars(name)(v)
    case _ => false
  }

  /** Every variable NAME appearing anywhere in the tree — pattern
    * positions, expression references, AS targets, projection lists,
    * group keys and aggregate output names, EXISTS interiors. A
    * conservative superset used for fresh-name generation and
    * rename-apart collision checks.
    */
  def allVars(gp: GraphPattern): Set[String] = {
    def ev(e: Expr): Set[String] = e match {
      case EVar(n) => Set(n)
      case EFn(_, args @ _*) => args.flatMap(ev).toSet
      case EExists(p, _) => allVars(p)
      case _ => Set.empty
    }
    gp match {
      case b: Bgp => inScopeVars(b)
      case p: PathPattern => inScopeVars(p)
      case v: ValuesPat => inScopeVars(v)
      case Join(l, r) => allVars(l) ++ allVars(r)
      case Lateral(l, r) => allVars(l) ++ allVars(r)
      case Union(l, r) => allVars(l) ++ allVars(r)
      case Minus(l, r) => allVars(l) ++ allVars(r)
      case LeftJoin(l, r, f) =>
        allVars(l) ++ allVars(r) ++ f.toSeq.flatMap(ev)
      case Filter(e, i) => ev(e) ++ allVars(i)
      case Extend(i, v, e) => allVars(i) ++ ev(e) + v
      case Project(i, vs) => allVars(i) ++ vs
      case Distinct(i) => allVars(i)
      case Reduced(i) => allVars(i)
      case Slice(i, _, _) => allVars(i)
      case OrderBy(i, ks) => allVars(i) ++ ks.flatMap(k => ev(k._1))
      case Group(i, keys, aggs) => allVars(i) ++ keys ++ aggs.map(_._1) ++
        aggs.flatMap(a => a._2.expr.toSeq.flatMap(ev)) ++
        aggs.flatMap(a => a._2.orderBy.flatMap(k => ev(k._1)))
      case GraphPat(name, i) => vars(name) ++ allVars(i)
      case Service(name, i, _) => vars(name) ++ allVars(i)
    }
  }

  /** Homomorphic variable rename over a pattern tree: every occurrence
    * of a name in `m`'s domain — pattern positions (including inside
    * quoted-triple patterns), expression references, AS targets,
    * projection lists, group keys/aggregate names, EXISTS interiors —
    * is replaced. Used by the EXISTS rename-apart rule (§18.6:
    * subselect-hidden variables are fresh, never correlated).
    */
  def renameVars(gp: GraphPattern, m: Map[String, String]): GraphPattern = {
    def rn(n: String): String = m.getOrElse(n, n)
    def rt(tp: TermPat): TermPat = tp match {
      case V(n) => V(rn(n))
      case Q(s, p, o) => Q(rt(s), rt(p), rt(o))
      case other => other
    }
    def rtp(tp: TriplePattern): TriplePattern =
      TriplePattern(rt(tp.s), rt(tp.p), rt(tp.o))
    def re(e: Expr): Expr = e match {
      case EVar(n) => EVar(rn(n))
      case EFn(name, args @ _*) => EFn(name, args.map(re): _*)
      case EExists(p, pos) => EExists(renameVars(p, m), pos)
      case other => other
    }
    gp match {
      case Bgp(ps @ _*) => Bgp(ps.map(rtp): _*)
      case PathPattern(s, path, o) => PathPattern(rt(s), path, rt(o))
      case Join(l, r) => Join(renameVars(l, m), renameVars(r, m))
      case Lateral(l, r) => Lateral(renameVars(l, m), renameVars(r, m))
      case Union(l, r) => Union(renameVars(l, m), renameVars(r, m))
      case Minus(l, r) => Minus(renameVars(l, m), renameVars(r, m))
      case LeftJoin(l, r, f) =>
        LeftJoin(renameVars(l, m), renameVars(r, m), f.map(re))
      case Filter(e, i) => Filter(re(e), renameVars(i, m))
      case Extend(i, v, e) => Extend(renameVars(i, m), rn(v), re(e))
      case Project(i, vs) => Project(renameVars(i, m), vs.map(rn))
      case Distinct(i) => Distinct(renameVars(i, m))
      case Reduced(i) => Reduced(renameVars(i, m))
      case Slice(i, off, lim) => Slice(renameVars(i, m), off, lim)
      case OrderBy(i, ks) =>
        OrderBy(renameVars(i, m), ks.map(k => (re(k._1), k._2)))
      case Group(i, keys, aggs) => Group(renameVars(i, m), keys.map(rn),
        aggs.map { case (n, a) => (rn(n), a.copy(
          expr = a.expr.map(re),
          orderBy = a.orderBy.map(k => (re(k._1), k._2))))
        })
      case ValuesPat(vs, rows) => ValuesPat(vs.map(rn), rows)
      case GraphPat(name, i) => GraphPat(rt(name), renameVars(i, m))
      case Service(name, i, s) => Service(rt(name), renameVars(i, m), s)
    }
  }
}
