package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Term

/** Storage abstraction for quad scans — the Spark analogue of the
  * reference's index choice (oxigraph: lib/oxigraph/src/storage/mod.rs ·
  * StorageReader::quads_for_pattern picking one of 9 sort permutations).
  *
  * Here the "index" is physical layout: a predicate-partitioned parquet
  * store (S2RDF-style vertical partitioning, VLDB'16) lets a scan with a
  * constant predicate read only that predicate's partition directories —
  * at 100 TB this is the difference between scanning everything and
  * scanning one property table.
  */
trait QuadSource {
  /** All quads (g,s,p,o term structs). */
  def all: DataFrame
  /** Quads whose predicate is the given IRI — the hot path for BGP
    * triple patterns with constant predicate (the overwhelmingly common
    * case; every pattern the TPC-H queries use).
    */
  def byPredicate(iri: String): DataFrame
  /** Static value-space class of this predicate's OBJECT values, when
    * the catalog knows it (schema-owner-declared, or load-time
    * statistics via QuadSource.inferPredicateClasses). Feeds the
    * translation-time type-inference lattice; None = no pruning.
    */
  def predClass(iri: String): Option[Term.VClass] = None
  /** Named graphs that EXIST while holding zero quads (CREATEd or
    * CLEARed — GraftStore's empty-graph registry). A quad table cannot
    * represent them, so the GRAPH catalog (graph enumeration, absent-
    * graph gating, empty-graph aggregate padding) unions these names
    * in. Metadata-scale by construction.
    */
  def extraNamedGraphs: Seq[String] = Nil
}

object QuadSource {
  import Term.{VClass, VNum, VTemporal, VStr, VBool, VOther}

  /** One-pass statistics build: predicate -> object value-space class,
    * kept only when uniform across every object of that predicate (the
    * load-time analogue of a column catalog — at scale this runs once
    * per dataset alongside the bulk load and is persisted with the
    * store, never per query).
    */
  def inferPredicateClasses(quads: DataFrame): Map[String, VClass] = {
    val o = col("o")
    val cls = when(o("kind") =!= Term.LiteralKind, "other")
      .when(o("dt").isin(Term.numericTypes: _*), "num")
      .when(o("dt").isin(Term.XsdDateTime, Term.XsdDate, Term.XsdTime,
        Term.XsdGYear, Term.XsdGYearMonth, Term.XsdGMonth,
        Term.XsdGMonthDay, Term.XsdGDay), "temporal")
      .when(o("dt").isin(Term.XsdString, Term.RdfLangString,
        Term.RdfDirLangString), "str")
      .when(o("dt") === Term.XsdBoolean, "bool")
      .otherwise("other")
    quads.where(col("p")("kind") === Term.IriKind)
      .groupBy(col("p")("lex").as("pred"))
      .agg(collect_set(cls).as("classes"))
      .where(size(col("classes")) === 1)
      .select(col("pred"), element_at(col("classes"), 1).as("cls"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1) match {
        case "num" => VNum
        case "temporal" => VTemporal
        case "str" => VStr
        case "bool" => VBool
        case _ => VOther
      }))
      .toMap
  }
}

/** In-memory/cached DataFrame store: predicate filter is a plain filter
  * (Catalyst prunes union branches via constant folding). `classes` is
  * the optional predicate->value-class catalog (see
  * QuadSource.predClass). `index` is an optional in-memory VERTICAL
  * PARTITION of the store (r12): per-predicate pre-filtered (usually
  * persisted) DataFrames, the cached-store analogue of
  * [[PartitionedQuadStore]]'s partition pruning — a constant-predicate
  * scan reads a predicate-sized relation with a predicate-sized plan
  * instead of filtering the whole store through its full union plan on
  * every pattern.
  */
final case class DfQuadSource(df: DataFrame,
    classes: Map[String, Term.VClass] = Map.empty,
    registry: Seq[String] = Nil,
    index: Map[String, DataFrame] = Map.empty) extends QuadSource {
  def all: DataFrame = df
  override def extraNamedGraphs: Seq[String] = registry
  def byPredicate(iri: String): DataFrame =
    index.getOrElse(iri,
      df.where(col("p")("kind") === Term.IriKind && col("p")("lex") === iri))
  override def predClass(iri: String): Option[Term.VClass] =
    classes.get(iri)
}

/** Predicate-partitioned parquet store: one directory per predicate local
  * key; byPredicate reads prune partitions at planning time
  * (PartitionFilters in the scan, verified in PlansSpec).
  */
final class PartitionedQuadStore(spark: SparkSession, path: String)
    extends QuadSource {
  def all: DataFrame = spark.read.parquet(path)
    .select(col("g"), col("s"), col("p"), col("o"))
  def byPredicate(iri: String): DataFrame =
    spark.read.parquet(path)
      .where(col("p_key") === PartitionedQuadStore.key(iri) &&
        col("p")("kind") === Term.IriKind && col("p")("lex") === iri)
      .select(col("g"), col("s"), col("p"), col("o"))
}

/** Predicate-partitioned AND subject-bucketed table store: the 100 TB
  * co-location layout. `p_key` partition directories give the same
  * planning-time pruning as [[PartitionedQuadStore]]; `CLUSTERED BY
  * (s_key) SORTED BY (s_key) INTO n BUCKETS` makes every scan of the
  * store hash-distributed AND sorted on the subject key, so a star BGP
  * (many patterns sharing ?s) sort-merge-joins its pattern scans with
  * ZERO exchanges and ZERO sorts — the join that dominates SPARQL at
  * warehouse scale stops shuffling the data entirely (locked by
  * PlansSpec). `s_key` = kind|lex is injective over subject terms
  * (subjects are never literals, so dt/lang never discriminate), making
  * an s_key equi-join equivalent to the s struct equi-join.
  *
  * Needs a session catalog (`saveAsTable`) — the standard deployment on
  * a real cluster; the directory stores remain the catalog-free path.
  */
final class BucketedQuadStore(spark: SparkSession, table: String,
    classes: Map[String, Term.VClass] = Map.empty) extends QuadSource {
  def all: DataFrame =
    spark.table(table).select(col("g"), col("s"), col("p"), col("o"))
  def byPredicate(iri: String): DataFrame = keyed(iri)
    .select(col("g"), col("s"), col("p"), col("o"))
  /** Pruned scan keeping the bucket key — join two of these on `s_key`
    * and the bucketed layout serves distribution + order directly.
    */
  def keyed(iri: String): DataFrame =
    spark.table(table)
      .where(col("p_key") === PartitionedQuadStore.key(iri) &&
        col("p")("kind") === Term.IriKind && col("p")("lex") === iri)
      .select(col("s_key"), col("g"), col("s"), col("p"), col("o"))
  override def predClass(iri: String): Option[Term.VClass] =
    classes.get(iri)
}

object BucketedQuadStore {
  /** Injective subject key (kind|lex); a plain string so bucket pruning
    * and bucketed joins stay inside Spark's native bucketing support.
    */
  private val sKey: Column =
    concat_ws("|", col("s")("kind").cast("string"), col("s")("lex"))

  /** Write quads as a predicate-partitioned, subject-bucketed table.
    * `path` makes it an external table at that location (otherwise the
    * session warehouse dir).
    */
  def write(quads: DataFrame, table: String, buckets: Int = 64,
      path: Option[String] = None): Unit = {
    val w = quads
      .withColumn("p_key", when(col("p")("kind") === Term.IriKind,
        PartitionedQuadStore.keyCol).otherwise("_other"))
      .withColumn("s_key", sKey)
      .write.mode("overwrite")
      .partitionBy("p_key")
      .bucketBy(buckets, "s_key").sortBy("s_key")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def apply(spark: SparkSession, table: String,
      classes: Map[String, Term.VClass] = Map.empty): BucketedQuadStore =
    new BucketedQuadStore(spark, table, classes)
}

object PartitionedQuadStore {
  /** Partition key: predicate local name (readable dirs); the full
    * predicate filter stays on top, so collisions are only a pruning
    * granularity concern, never a correctness one.
    */
  def key(iri: String): String =
    iri.substring(math.max(iri.lastIndexOf('/'), iri.lastIndexOf('#')) + 1)

  private[graft] val keyCol: Column =
    element_at(split(regexp_replace(col("p")("lex"), "#", "/"), "/"), -1)

  /** Write a quad DataFrame as a predicate-partitioned store. */
  def write(quads: DataFrame, path: String): Unit =
    quads
      .withColumn("p_key",
        when(col("p")("kind") === Term.IriKind, keyCol).otherwise("_other"))
      .write.mode("overwrite").partitionBy("p_key").parquet(path)

  def apply(spark: SparkSession, path: String): PartitionedQuadStore =
    new PartitionedQuadStore(spark, path)
}
