package graft.update

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Term
import graft.algebra.Algebra._
import graft.exec.{QueryExec, Translator}

/** SPARQL Update as batch quad-table transformations (SURVEY.md §2.10;
  * oxigraph: lib/spargebra/src/update.rs · GraphUpdateOperation,
  * lib/oxigraph/src/sparql/update.rs · SimpleUpdateEvaluator).
  * Transactions/MVCC are out of scope — updates are pure DataFrame
  * set transforms; persistence = overwrite parquet.
  */
object UpdateExec {

  private[update] def templQuads(template: Seq[(TermPat, TriplePattern)],
      where: GraphPattern, quads: DataFrame): DataFrame =
    QueryExec.instantiateQuads(template,
      Translator.translate(where, quads))

  /** Parse and apply a SPARQL Update string (possibly `;`-chained). */
  def executeText(update: String, quads: DataFrame): DataFrame =
    graft.parser.SparqlParser.parseUpdateText(update)
      .foldLeft(quads)((q, op) => apply(op, q))

  /** Quad effect plus the named-graph-registry effect (oxigraph:
    * lib/oxigraph/src/storage · named graph set; Store::insert_named_graph).
    * `graphs` holds graphs that exist while possibly empty — explicitly
    * CREATEd, or left behind by CLEAR — and is metadata-scale (graph
    * names only, like the predicate catalog). Graphs that hold quads are
    * implicit and never need registering; DROP removes both quads and
    * the registry entry, CLEAR removes quads but keeps the graph alive.
    * SILENT-tolerant by design: CREATE of an existing graph and
    * CLEAR/DROP of an absent one are no-ops, not errors.
    */
  def applyWithGraphs(op: UpdateOp, quads: DataFrame,
      graphs: Set[String]): (DataFrame, Set[String]) =
    (apply(op, quads), graphsAfter(op, quads, graphs))

  /** The registry effect alone (shared by the full-rebuild path above
    * and the partition-delta path in [[DeltaUpdate]], which must not
    * materialize the transformed quad table just to learn it).
    */
  def graphsAfter(op: UpdateOp, quads: DataFrame,
      graphs: Set[String]): Set[String] = {
    def live: Set[String] = // non-empty named graphs, collected on demand
      quads.where(col("g")("kind") === Term.IriKind)
        .select(col("g")("lex")).distinct()
        .collect().map(_.getString(0)).toSet
    op match {
      case CreateGraph(i) => graphs + i
      case ClearGraph(Some(i)) =>
        // CLEAR keeps an EXISTING graph alive (empty) but must not
        // conjure one that never existed — only register the target if
        // it is already registered or currently holds quads
        if (graphs(i) || live(i)) graphs + i else graphs
      case ClearNamed | ClearAll => graphs ++ live
      case DropGraph(Some(i)) => graphs - i
      case DropNamed | DropAll => Set.empty[String]
      case CopyGraph(_, Some(t)) => graphs + t
      case MoveGraph(f, t) => graphs -- f.toSet ++ t.toSet
      case AddGraph(_, Some(t)) => graphs + t
      case LoadGraph(_, Some(t)) => graphs + t
      case _ => graphs
    }
  }

  def apply(op: UpdateOp, quads: DataFrame): DataFrame = op match {
    case DeleteInsert(del, ins, where, using, usingNamed, _) =>
      // USING builds the match dataset like FROM does for queries; the
      // delete/insert effects still apply to the FULL store
      val matchQuads =
        if (using.isEmpty && usingNamed.isEmpty) quads
        else QueryExec.applyDataset(quads, using, usingNamed)
      val deletes =
        if (del.isEmpty) null else templQuads(del, where, matchQuads)
      val inserts =
        if (ins.isEmpty) null else templQuads(ins, where, matchQuads)
      var out = quads
      if (deletes != null) out = out.except(deletes)
      if (inserts != null) out = out.unionByName(inserts).distinct()
      out

    case ClearGraph(None) =>
      quads.where(col("g")("kind") =!= Term.DefaultGraphKind)
    case ClearGraph(Some(iri)) =>
      quads.where(!(col("g")("kind") === Term.IriKind &&
        col("g")("lex") === iri))
    // DROP has the same quad effect as CLEAR; the registry difference
    // (DROP unregisters, CLEAR leaves an empty graph) lives in
    // applyWithGraphs / GraftStore.
    case DropGraph(g) => apply(ClearGraph(g), quads)
    case ClearNamed | DropNamed =>
      quads.where(col("g")("kind") === Term.DefaultGraphKind)
    case ClearAll | DropAll => quads.limit(0)

    case InsertData(qs) =>
      quads.unionByName(constQuads(quads, qs)).distinct()
    case DeleteData(qs) =>
      quads.except(constQuads(quads, qs))

    // graph management: pure relational retargeting of the g column
    case CopyGraph(f, t) =>
      if (f == t) quads
      else quads.where(!graphFilter(t)).unionByName(retarget(quads, f, t))
    case MoveGraph(f, t) =>
      if (f == t) quads
      else quads.where(!graphFilter(t) && !graphFilter(f))
        .unionByName(retarget(quads, f, t))
    case AddGraph(f, t) =>
      if (f == t) quads
      else quads.unionByName(retarget(quads, f, t)).distinct()
    case LoadGraph(source, into) =>
      val fmt = source.substring(source.lastIndexOf('.') + 1)
      val loaded = graft.io.RdfIO.read(quads.sparkSession, source, fmt)
        .select(graphCol(into).as("g"), col("s"), col("p"), col("o"))
      quads.unionByName(loaded).distinct()
    case CreateGraph(_) => quads // empty graphs are implicit in a quad table
  }

  private def graphFilter(g: Option[String]): Column = g match {
    case None => col("g")("kind") === Term.DefaultGraphKind
    case Some(iri) =>
      col("g")("kind") === Term.IriKind && col("g")("lex") === iri
  }
  private def graphCol(g: Option[String]): Column = g match {
    case None => Term.defaultGraph
    case Some(iri) => Term.iri(iri)
  }
  private def retarget(quads: DataFrame, f: Option[String],
      t: Option[String]): DataFrame =
    quads.where(graphFilter(f))
      .select(graphCol(t).as("g"), col("s"), col("p"), col("o"))

  private[update] def constQuads(quads: DataFrame,
      qs: Seq[(TermPat, TriplePattern)]): DataFrame = {
    import graft.model.QuotedTriple
    // request-scoped bnode freshness: a new salt per execution
    val bnodeSalt = java.util.UUID.randomUUID().toString
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def qt(tp: TermPat): QuotedTriple.QTerm = tp match {
      case I(iri) => QuotedTriple.QTerm(Term.IriKind.toByte, iri, null, null)
      case L(lex, dt, lang) => QuotedTriple.QTerm(
        Term.LiteralKind.toByte, lex, dt, lang.orNull)
      case Q(s2, p2, o2) => QuotedTriple.QTerm(
        Term.QuotedKind.toByte, enc(s2, p2, o2), null, null)
      case other => throw new IllegalArgumentException(
        s"ground term required in quoted triple, got $other")
    }
    def enc(s: TermPat, p: TermPat, o: TermPat): String =
      QuotedTriple.encode(qt(s), qt(p), qt(o))
    def c(tp: TermPat): Column = tp match {
      case I(iri) => Term.iri(iri)
      case L(lex, dt, lang) => lang match {
        case Some(l) => Term.taggedLit(lit(lex), l)
        case None => Term.typedLit(lit(lex), dt)
      }
      case Q(s, p, o) => Term.quoted(lit(enc(s, p, o)))
      // INSERT DATA bnode labels are request-scoped (§3.1.1): each
      // execution mints fresh bnodes, same label => same bnode within
      // the request. The parser rejects bnodes in DELETE DATA, so this
      // branch only ever fires on the insert side.
      case B(id) => Term.bnode(lit("db" + md5Hex(bnodeSalt + "#" + id)))
      case other => throw new IllegalArgumentException(
        s"ground term required in data block, got $other")
    }
    def g(tp: TermPat): Column = tp match {
      case I(iri) => Term.iri(iri)
      case _ => Term.defaultGraph
    }
    qs.map { case (graph, t) =>
      quads.sparkSession.range(1).select(
        g(graph).as("g"), c(t.s).as("s"), c(t.p).as("p"), c(t.o).as("o"))
    }.reduce(_ unionByName _)
  }
}
