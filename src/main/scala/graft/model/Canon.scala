package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blank-node canonicalization over quad DataFrames (g,s,p,o term
  * structs) — the analogue of the reference's dataset canonicalization
  * entry point [reference: lib/oxrdf/src/dataset.rs · canonicalize],
  * re-expressed as a distributed hash-based color-refinement fixpoint
  * (1-dim Weisfeiler-Leman, the "iso-canonical" shape of Hogan,
  * ISWC'15 / ACM TWEB'17 — public algorithm).
  *
  * Dataflow per refinement round (all shuffles carry only
  * (id, hash)-width rows, never full quads):
  *   1. join bnode occurrences with the current color table (shuffle on
  *      bnode lex),
  *   2. regroup per quad to build the quad signature = hash of the four
  *      positions with bnodes replaced by their colors (shuffle on quad
  *      id),
  *   3. fold each bnode's incident (position, quad-signature) multiset
  *      into its next color (shuffle on bnode lex).
  * Rounds converge in O(log diameter) for real data; the color
  * partition refines monotonically because each new color hashes the
  * old one in.
  *
  * Ties after the fixpoint (WL-equivalent bnodes: automorphism orbits,
  * or isomorphic disjoint components) are split by simultaneous
  * individuation — one deterministic member of every tied group gets a
  * distinguishing mark, then refinement reruns. For automorphism
  * orbits the choice of member provably cannot change the canonical
  * output; for WL-equivalent but non-automorphic structures (regular
  * gadget graphs) a full Hogan branch-and-minimize would be needed and
  * this implementation instead documents the deviation: the final
  * label rank falls back to the input lexical as tiebreak, which is
  * deterministic but not relabeling-invariant on those graphs. Real
  * RDF (lists, reification, skolem chains) converges without ever
  * reaching that corner.
  *
  * Quoted-triple terms (kind=4) are treated as opaque ground lexicals;
  * bnodes inside them keep their labels (documented deviation — the
  * reference's canonicalization predates RDF-star quoting too).
  */
object Canon {

  /** Refinement + individuation round cap — same posture as
    * PathExec.MaxIterations: adversarial symmetric datasets (thousands
    * of isomorphic components) stop refining here and fall back to the
    * lex tiebreak instead of hanging.
    */
  val MaxRounds = 64

  private val seed1 = lit(0x9e3779b9L)

  /** Ground rendering of a term position for signature hashing —
    * bnode positions are excluded (they get colors instead).
    */
  private def groundSig(t: Column): Column =
    concat_ws("", t("kind").cast(StringType), t("lex"),
      coalesce(t("dt"), lit("")), coalesce(t("lang"), lit("")))

  private val positions = Seq("g", "s", "o")

  /** Canonicalize: returns the quads with every blank-node label
    * replaced by its canonical label `c0, c1, …` (rank of the final
    * color in sorted order). Two isomorphic datasets produce identical
    * output quad sets (modulo the documented WL corner above).
    */
  def canonicalize(quads: DataFrame): DataFrame = {
    val spark = quads.sparkSession
    import spark.implicits._

    val q = quads.withColumn("__qid", monotonically_increasing_id())
      .localCheckpoint()

    // (qid, pos, b): one row per bnode occurrence; pos ∈ {g,s,o}
    // (predicates are IRIs in this model).
    val occ = q.select(col("__qid"), explode(array(positions.map(p =>
        struct(lit(p).as("pos"), col(p).as("t"))): _*)).as("e"))
      .where(col("e")("t")("kind") === Term.BlankKind)
      .select(col("__qid"), col("e")("pos").as("pos"),
        col("e")("t")("lex").as("b"))
      .localCheckpoint()

    // ground part of each quad's signature (bnode positions blanked)
    val groundPart = q.select(col("__qid"), xxhash64(concat_ws("",
      (positions :+ "p").map(p =>
        when(col(p)("kind") === Term.BlankKind, lit("_"))
          .otherwise(groundSig(col(p)))): _*)).as("gsig"))
      .localCheckpoint()

    val bnodes = occ.select(col("b")).distinct().localCheckpoint()
    val total = bnodes.count()
    if (total == 0) return quads

    var colors = bnodes.withColumn("c", lit(0L))
    var distinctColors = 1L
    var rounds = 0
    var done = distinctColors == total

    while (!done && rounds < MaxRounds) {
      // quad signature under current coloring
      val qsig = occ.join(colors, "b")
        .groupBy(col("__qid"))
        .agg(xxhash64(concat_ws(",", sort_array(collect_list(
          concat_ws(":", col("pos"), col("c").cast(StringType))))))
          .as("bsig"))
        .join(groundPart, "__qid")
        .select(col("__qid"), xxhash64(col("gsig"), col("bsig")).as("qs"))

      // next color: old color + sorted incident (pos, qsig) multiset
      val next = occ.join(qsig, "__qid")
        .select(col("b"), concat_ws(":", col("pos"),
          col("qs").cast(StringType)).as("contrib"))
        .groupBy(col("b"))
        .agg(xxhash64(concat_ws(",", sort_array(collect_list(
          col("contrib"))))).as("nc"))
        .join(colors, "b")
        .select(col("b"), xxhash64(col("c"), col("nc"), seed1).as("c"))
        .localCheckpoint()

      val n = next.select(col("c")).distinct().count()
      if (n == distinctColors) {
        if (n == total) { colors = next; done = true }
        else {
          // WL fixpoint with ties: individuate one deterministic member
          // of every tied color group, then keep refining.
          val tieGroups = next.groupBy(col("c"))
            .agg(count(lit(1)).as("sz"), min(col("b")).as("pick"))
            .where(col("sz") > 1)
            .select(col("pick"))
          colors = next.join(tieGroups.withColumn("mark", lit(1L)),
              next("b") === tieGroups("pick"), "left")
            .select(next("b"),
              when(col("mark").isNotNull,
                xxhash64(col("c"), lit("ind"))).otherwise(col("c"))
                .as("c"))
            .localCheckpoint()
        }
      } else { colors = next; distinctColors = n }
      rounds += 1
    }

    // Final labels: rank over (color, lex) — the lex tiebreak only
    // fires on the documented WL corner (or past the round cap).
    // Scalable two-pass ranking (no global window): sorted distinct
    // keys zipWithIndex'd, then joined back.
    val keys = colors.select(col("c"), col("b")).sort(col("c"), col("b"))
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getLong(0), r.getString(1), i) }
      .toDF("c", "b", "rank")
    val labels = keys.select(col("b"),
      concat(lit("c"), col("rank").cast(StringType)).as("nb"))

    def relabel(df: DataFrame, pos: String): DataFrame = {
      val t = col(pos)
      df.join(labels.withColumnRenamed("b", s"__b_$pos")
          .withColumnRenamed("nb", s"__nb_$pos"),
          t("kind") === Term.BlankKind && t("lex") === col(s"__b_$pos"),
          "left")
        .withColumn(pos,
          when(t("kind") === Term.BlankKind,
            struct(t("kind").as("kind"), col(s"__nb_$pos").as("lex"),
              t("dt").as("dt"), t("lang").as("lang")))
          .otherwise(t))
        .drop(s"__b_$pos", s"__nb_$pos")
    }

    positions.foldLeft(q.drop("__qid"))(relabel)
      .select(col("g"), col("s"), col("p"), col("o"))
  }

  /** Dataset isomorphism (modulo the documented WL corner): canonical
    * forms compared as sets.
    */
  def isomorphic(a: DataFrame, b: DataFrame): Boolean = {
    val ca = canonicalize(a)
    val cb = canonicalize(b)
    ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty
  }
}
