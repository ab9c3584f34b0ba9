package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Term
import graft.algebra.Algebra._
import graft.io.QuadSource
import Translator.{DefaultG, FixedG, GraphCtx, VarG}

/** Property-path evaluation (SURVEY.md §2.7).
  *
  * Mirrors the semantics of the reference's PathEvaluator (oxigraph:
  * lib/spareval/src/eval.rs · PathEvaluator; SPARQL 1.1 §9.1 ALP with
  * visited-set, i.e. SET semantics for closures) — realized as relational
  * composition plus a distributed semi-naive fixpoint for `+`/`*`:
  * each iteration joins the frontier against the (reused, cached) edge
  * relation, removes already-seen pairs, and localCheckpoints to cut the
  * lineage — the pattern that survives scale-up (bounded lineage, AQE-
  * planned joins, no driver-side data movement beyond an empty-check).
  */
object PathExec {

  /** Max fixpoint iterations (graph diameter bound); matches the spirit of
    * the reference's recursion limits without changing semantics for any
    * graph with diameter below the cap.
    */
  val MaxIterations = 64

  private def gFilter(ctx: GraphCtx): Column = ctx match {
    case DefaultG => col("g")("kind") === Term.DefaultGraphKind
    case FixedG(iri) =>
      col("g")("kind") === Term.IriKind && col("g")("lex") === iri
    case VarG(_) => col("g")("kind") =!= Term.DefaultGraphKind
  }

  /** Evaluate a path over the quad table -> DataFrame("ps", "po") of
    * connected term pairs. SET semantics (distinct pairs).
    */
  def eval(path: Path, src: QuadSource, ctx: GraphCtx): DataFrame = path match {
    case PLink(iri) =>
      src.byPredicate(iri).where(gFilter(ctx))
        .select(col("s").as("ps"), col("o").as("po"))

    case PInv(p) =>
      eval(p, src, ctx).select(col("po").as("ps"), col("ps").as("po"))

    case PSeq(a, b) =>
      val l = eval(a, src, ctx).select(col("ps"), col("po").as("mid"))
      val r = eval(b, src, ctx).select(col("ps").as("mid2"), col("po"))
      l.join(r, col("mid") === col("mid2"))
        .select(col("ps"), col("po")).distinct()

    case PAlt(a, b) =>
      eval(a, src, ctx).union(eval(b, src, ctx)).distinct()

    case PNeg(iris) =>
      src.all.where(gFilter(ctx) && col("p")("kind") === Term.IriKind &&
        !col("p")("lex").isin(iris: _*))
        .select(col("s").as("ps"), col("o").as("po")).distinct()

    case PZeroOrOne(p) =>
      eval(p, src, ctx).union(identityPairs(src, ctx)).distinct()

    case POneOrMore(p) => closure(eval(p, src, ctx).distinct())

    case PZeroOrMore(p) =>
      closure(eval(p, src, ctx).distinct())
        .union(identityPairs(src, ctx)).distinct()
  }

  /** Zero-length path: every term appearing as subject or object. */
  private def identityPairs(src: QuadSource, ctx: GraphCtx): DataFrame = {
    val g = src.all.where(gFilter(ctx))
    g.select(col("s").as("n"))
      .union(g.select(col("o").as("n"))).distinct()
      .select(col("n").as("ps"), col("n").as("po"))
  }

  /** Distributed semi-naive transitive closure with bounded lineage. */
  private def closure(edges0: DataFrame): DataFrame = {
    val edges = edges0.localCheckpoint(true)
    var result = edges
    var frontier = edges
    var i = 0
    while (i < MaxIterations && !frontier.isEmpty) {
      val stepped = frontier.select(col("ps"), col("po").as("mid"))
        .join(edges.select(col("ps").as("mid2"), col("po")),
          col("mid") === col("mid2"))
        .select(col("ps"), col("po")).distinct()
      frontier = stepped.except(result).localCheckpoint(true)
      result = result.union(frontier).distinct().localCheckpoint(true)
      i += 1
    }
    result
  }
}
