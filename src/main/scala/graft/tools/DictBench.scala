package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TpchRdf

/** The dict-exec phase-2 gate measurement (NEXT.md: "do NOT flip the
  * default without a shuffle-bound workload measurement"): BGP-heavy
  * join chains over a 10×-scaled quad store, struct joins (default) vs
  * id-space joins (-Dgraft.dictExec=true), per-query medians.
  *
  * Scaling replicates the sf0.1 quad table with replica-suffixed entity
  * IRIs (predicates and graphs untouched): per-replica join structure
  * is preserved, so join cardinality grows linearly and the measurement
  * isolates shuffle-width effects, which is exactly what dict-exec
  * targets (16-byte id keys vs 4-field string structs).
  *
  * Usage: runMain graft.tools.DictBench <sfDir> <factor>
  */
object DictBench {

  // join chain: order -> customer -> nation -> region (4 hops, 5 BGPs)
  val ChainQuery: String = s"""PREFIX : <${TpchRdf.ns}>
    SELECT ?rn (COUNT(*) AS ?cnt) WHERE {
      ?o :orderedBy ?c . ?o :totalprice ?tp .
      ?c :inNation ?n . ?n :inRegion ?r . ?r :name ?rn .
    } GROUP BY ?rn"""

  // star: one hub variable, 4 property legs
  val StarQuery: String = s"""PREFIX : <${TpchRdf.ns}>
    SELECT (COUNT(*) AS ?cnt) WHERE {
      ?c :name ?cn . ?c :acctbal ?b . ?c :mktsegment ?m .
      ?c :inNation ?n .
    }"""

  /** Entity IRIs get a replica suffix; predicates, graphs, literals and
    * the shared region/nation names stay as-is.
    */
  private def suffixEntities(t: Column, rep: Int): Column =
    when(t("kind") === graft.model.Term.IriKind &&
      t("lex").rlike(TpchRdf.ns + "(customer|order|nation|region|supplier)/"),
      struct(t("kind").as("kind"),
        concat(t("lex"), lit(s"_r$rep")).as("lex"),
        t("dt").as("dt"), t("lang").as("lang"))).otherwise(t)

  def scaledQuads(quads: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { rep =>
      if (rep == 0) quads
      else quads.select(col("g"),
        suffixEntities(col("s"), rep).as("s"), col("p"),
        suffixEntities(col("o"), rep).as("o"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val quads = scaledQuads(TpchRdf.quads(spark, sfDir), factor)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[dictbench] quads: ${quads.count()} (factor $factor)")

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s((s.length - 1) / 2) }
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      graft.parser.SparqlParser.execute(q, quads).count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = for {
      mode <- Seq("false", "true")
      (qn, q) <- Seq("chain" -> ChainQuery, "star" -> StarQuery)
    } yield {
      System.setProperty("graft.dictExec", mode)
      run(q) // warmup (codegen + dict build amortize here)
      val m = median((1 to 3).map(_ => run(q)))
      println(s"[dictbench] dictExec=$mode $qn median=$m")
      (s"${qn}_dict_$mode", m)
    }
    println(results.map { case (k, v) =>
      "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v)
    }.mkString("{\"metric\":\"dictbench\",", ",", s""","factor":$factor}"""))
    spark.stop()
  }
}
