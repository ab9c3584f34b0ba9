package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Term
import graft.algebra.Algebra._
import graft.expr.SparqlExpr.nullTerm

/** Query-form execution: SELECT / ASK / CONSTRUCT / DESCRIBE
  * (oxigraph: lib/spargebra/src/query.rs · Query; evaluation entry
  * lib/oxigraph/src/sparql/mod.rs · evaluate_query — SURVEY.md §2.9).
  */
object QueryExec {

  def select(gp: GraphPattern, quads: DataFrame): DataFrame =
    Translator.translate(gp, quads).df

  // ---- QuadSource entry points (r12): callers holding an INDEXED
  // store (per-predicate vertical partition, TpchRdf.source) route
  // pattern scans through its pruned byPredicate slices --------------
  def select(gp: GraphPattern, store: graft.io.QuadSource): DataFrame =
    Translator.translate(gp, store, Translator.DefaultG).df

  def ask(gp: GraphPattern, store: graft.io.QuadSource): DataFrame = {
    val sol = Translator.translate(gp, store, Translator.DefaultG)
    sol.df.limit(1)
      .agg(count(lit(1)).as("n"))
      .select((col("n") > 0).as("result"))
  }

  def construct(template: Seq[TriplePattern], gp: GraphPattern,
      store: graft.io.QuadSource): DataFrame =
    instantiate(template,
      Translator.translate(gp, store, Translator.DefaultG))

  def describe(gp: GraphPattern, v: String,
      store: graft.io.QuadSource): DataFrame =
    describeSol(Translator.translate(gp, store, Translator.DefaultG),
      Seq(v), store.all)

  /** SELECT with a predicate->value-class catalog (type-inference
    * lattice seed; see QuadSource.predClass).
    */
  def select(gp: GraphPattern, quads: DataFrame,
      classes: Map[String, Term.VClass]): DataFrame =
    Translator.translate(gp, quads, classes).df

  private def src(quads: DataFrame, registry: Seq[String]) =
    graft.io.DfQuadSource(quads, Map.empty, registry)

  /** SELECT with the store's empty-graph registry (GRAPH catalog
    * completion sees CREATEd/CLEARed zero-quad graphs).
    */
  def select(gp: GraphPattern, quads: DataFrame,
      registry: Seq[String]): DataFrame =
    Translator.translate(gp, src(quads, registry), Translator.DefaultG).df

  def ask(gp: GraphPattern, quads: DataFrame,
      registry: Seq[String]): DataFrame = {
    val sol = Translator.translate(gp, src(quads, registry),
      Translator.DefaultG)
    sol.df.limit(1)
      .agg(count(lit(1)).as("n"))
      .select((col("n") > 0).as("result"))
  }

  def construct(template: Seq[TriplePattern], gp: GraphPattern,
      quads: DataFrame, registry: Seq[String]): DataFrame =
    instantiate(template, Translator.translate(gp, src(quads, registry),
      Translator.DefaultG))

  def describe(gp: GraphPattern, vs: Seq[String], quads: DataFrame,
      registry: Seq[String]): DataFrame =
    describeSol(Translator.translate(gp, src(quads, registry),
      Translator.DefaultG), vs, quads)

  /** FROM / FROM NAMED dataset construction (SPARQL §13.2; oxigraph:
    * spargebra/src/query.rs · QueryDataset, spareval/src/dataset.rs):
    * when either clause is present the active dataset is exactly the
    * listed graphs — FROM graphs merge into the default graph, FROM
    * NAMED graphs stay named, everything else disappears.
    */
  def applyDataset(quads: DataFrame, defaults: Seq[String],
      named: Seq[String]): DataFrame = {
    if (defaults.isEmpty && named.isEmpty) quads
    else {
      def inGraphs(iris: Seq[String]): DataFrame =
        quads.where(col("g")("kind") === Term.IriKind &&
          col("g")("lex").isin(iris: _*))
      val d =
        if (defaults.isEmpty) quads.where(lit(false))
        else inGraphs(defaults).select(Term.defaultGraph.as("g"),
          col("s"), col("p"), col("o"))
      val n =
        if (named.isEmpty) quads.where(lit(false))
        else inGraphs(named)
      d.unionByName(n)
    }
  }

  /** ASK -> single-row DataFrame with boolean column `result`. */
  def ask(gp: GraphPattern, quads: DataFrame): DataFrame = {
    val sol = Translator.translate(gp, quads)
    sol.df.limit(1)
      .agg(count(lit(1)).as("n"))
      .select((col("n") > 0).as("result"))
  }

  /** Instantiate a triple template against a solution: the CONSTRUCT core
    * (reference builds triples row-by-row; here it's a projection + union).
    */
  private def termCol(sol: Translator.Sol)(tp: TermPat): Column = tp match {
    case V(n) => if (sol.vars(n)) col(n) else nullTerm
    case I(iri) => Term.iri(iri)
    case L(lex, dt, lang) => lang match {
      case Some(l) => Term.taggedLit(lit(lex), l)
      case None => Term.typedLit(lit(lex), dt)
    }
    // Template bnode labels are scoped to the template and mint a FRESH
    // bnode per solution (§16.2.1 / Update §3.1.3.2) — even when the
    // pattern binds a like-named label (separate scopes; DELETE WHERE,
    // the one form whose template bnodes would have to mean matched
    // values, rejects them at parse per §19.6 note 8). Same label +
    // same solution => same bnode across the whole template, via the
    // __brow row id withBnodeRows pins.
    case B(id) =>
      Term.bnode(concat(lit("tb"),
        md5(concat(lit(id), lit("#"), col("__brow").cast("string")))))
    // CONSTRUCT-star: build the quoted term from its (possibly
    // variable) components via the canonical token renderer
    case Q(s, p, o) =>
      val (cs, cp, co) =
        (termCol(sol)(s), termCol(sol)(p), termCol(sol)(o))
      when(cs.isNull || cp.isNull || co.isNull, nullTerm)
        .otherwise(Term.quoted(concat(lit("<< "),
          graft.expr.SparqlExpr.ntToken(cs), lit(" "),
          graft.expr.SparqlExpr.ntToken(cp), lit(" "),
          graft.expr.SparqlExpr.ntToken(co), lit(" >>"))))
    case DefaultGraphPat => nullTerm
  }

  /** Does the template mention a bnode label (each mints fresh per
    * solution and needs the row id attached)?
    */
  private def hasFreshBnodes(ts: Seq[TriplePattern]): Boolean = {
    def in(tp: TermPat): Boolean = tp match {
      case B(_) => true
      case Q(s, p, o) => in(s) || in(p) || in(o)
      case _ => false
    }
    ts.exists(t => in(t.s) || in(t.p) || in(t.o))
  }

  /** Attach the per-solution row id fresh template bnodes hash on.
    * localCheckpoint pins the ids: every template branch of the union
    * reads the SAME materialized rows, so one solution keeps one id
    * across all its instantiated triples.
    */
  private def withBnodeRows(sol: Translator.Sol): Translator.Sol =
    sol.copy(df = sol.df
      .withColumn("__brow", monotonically_increasing_id())
      .localCheckpoint())

  def instantiate(template: Seq[TriplePattern], sol0: Translator.Sol): DataFrame = {
    val sol =
      if (hasFreshBnodes(template)) withBnodeRows(sol0) else sol0
    val tc = termCol(sol) _
    template.map { t =>
      sol.df.select(tc(t.s).as("s"), tc(t.p).as("p"), tc(t.o).as("o"))
    }.reduce(_ unionByName _)
      // triples with unbound components are skipped (SPARQL §16.2.1),
      // as are ill-formed instantiations — a literal subject or a
      // non-IRI predicate is silently dropped, not an error (§16.2.3)
      .where(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
      .where(col("s")("kind") =!= Term.LiteralKind &&
        col("p")("kind") === Term.IriKind)
      .distinct()
  }

  /** Quad-template instantiation for DELETE/INSERT … WHERE: each
    * template triple carries a graph position. An unbound or non-IRI
    * graph binding skips the quad, the same rule §16.2.1 applies to
    * unbound triple components.
    */
  def instantiateQuads(template: Seq[(TermPat, TriplePattern)],
      sol0: Translator.Sol): DataFrame = {
    val sol =
      if (hasFreshBnodes(template.map(_._2))) withBnodeRows(sol0)
      else sol0
    val tc = termCol(sol) _
    template.map { case (g, t) =>
      val gc = g match {
        case DefaultGraphPat => Term.defaultGraph
        case I(iri) => Term.iri(iri)
        case V(n) =>
          if (sol.vars(n)) when(col(n)("kind") === Term.IriKind, col(n))
          else nullTerm
        case other => throw new IllegalArgumentException(
          s"bad graph term in update template: $other")
      }
      sol.df.select(gc.as("g"), tc(t.s).as("s"), tc(t.p).as("p"),
        tc(t.o).as("o"))
    }.reduce(_ unionByName _)
      .where(col("g").isNotNull && col("s").isNotNull &&
        col("p").isNotNull && col("o").isNotNull)
      // ill-formed instantiations skipped, as in `instantiate` (§16.2.3).
      // The GRAPH slot is filtered too: the V(…) branch above already
      // nulls non-IRI bindings, but the kind check here keeps a
      // literal/quoted-triple graph term from ever emitting an invalid
      // quad through any template branch.
      .where(col("s")("kind") =!= Term.LiteralKind &&
        col("p")("kind") === Term.IriKind &&
        col("g")("kind") =!= Term.LiteralKind &&
        col("g")("kind") =!= Term.QuotedKind)
      .distinct()
  }

  def construct(template: Seq[TriplePattern], gp: GraphPattern,
      quads: DataFrame): DataFrame =
    instantiate(template, Translator.translate(gp, quads))

  /** DESCRIBE ?v: all default-graph triples whose subject is a binding of v. */
  def describe(gp: GraphPattern, v: String, quads: DataFrame): DataFrame =
    describe(gp, Seq(v), quads)

  /** DESCRIBE over several resources: union of per-variable bindings,
    * expanded to the Concise Bounded Description — blank-node objects
    * of included triples are described transitively (seeded frontier
    * fixpoint, same discipline as the path closures: each round joins
    * only the NEW bnodes, localCheckpoint cuts lineage).
    */
  def describe(gp: GraphPattern, vs: Seq[String], quads: DataFrame)
      : DataFrame =
    describeSol(Translator.translate(gp, quads), vs, quads)

  private def describeSol(sol: Translator.Sol, vs: Seq[String],
      quads: DataFrame): DataFrame = {
    val dg = quads.where(col("g")("kind") === Term.DefaultGraphKind)
    val subjects = vs.map(v => sol.df.select(col(v).as("__subj")))
      .reduce(_ unionByName _).distinct()
    var acc = dg.join(subjects, col("s") === col("__subj"))
      .select(col("s"), col("p"), col("o"))
    var frontier = acc.where(col("o")("kind") === Term.BlankKind)
      .select(col("o").as("__subj")).distinct()
      .except(subjects).localCheckpoint(eager = true)
    var rounds = 0
    while (frontier.limit(1).count() > 0 && rounds < 32) {
      val next = dg.join(frontier, col("s") === col("__subj"))
        .select(col("s"), col("p"), col("o"))
      acc = acc.unionByName(next)
      frontier = next.where(col("o")("kind") === Term.BlankKind)
        .select(col("o").as("__subj")).distinct()
        .except(acc.select(col("s").as("__subj")).distinct())
        .localCheckpoint(eager = true)
      rounds += 1
    }
    acc.distinct()
  }
}
