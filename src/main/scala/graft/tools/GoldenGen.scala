package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Golden-output generator for the no_oracle gate queries (sketches,
  * simhash, LSH/IVF ANN): DuckDB can't mirror their hash internals, so
  * their regression net is a committed byte-exact dump of the sf0.001
  * result. Every query in the list is deterministic by construction
  * (hash-derived planes, fixed sketch seeds, bit-reproducible folds),
  * which is what makes a golden file meaningful.
  *
  * Usage: runMain graft.tools.GoldenGen <sfDir> <outDir>
  * (committed output lives in src/test/resources/golden; GoldenSpec
  * compares against it)
  */
object GoldenGen {

  // q25_kll_quantiles is absent from the byte-exact list: DataSketches
  // KLL compaction flips ThreadLocalRandom coins (not seedable), so its
  // exact quantile values legitimately vary run-to-run — the golden net
  // caught this as a flake. Its golden is instead a BOUNDS file (below):
  // exact sorted-input values at rank (q ± KllSlack)·n, which every
  // correct coin sequence and merge order must land inside, and which a
  // broken merge/serialization path lands far outside.
  // r12: the SparkEntry.queries entries for these names became oracle
  // GATES (exact-vs-approximate bound checks the driver hash-verifies);
  // the byte-exact golden net stays pointed at the RAW approximate
  // outputs via these builders, under the same golden filenames.
  val raws: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dd4_simhash" -> (graft.queries.Pipeline.rawSimhash(_, _)),
    "dd12_semdedup" -> (graft.queries.Pipeline.rawSemdedup(_, _)),
    "ann2_lsh_topk" -> (graft.queries.Pipeline.rawAnn2(_, _)),
    "ann3_ivf_topk" -> (graft.queries.Pipeline.rawAnn3(_, _)),
    "ann4_pq_topk" -> (graft.queries.Pipeline.rawAnn4(_, _)),
    "q20_approx_distinct" -> (graft.queries.Extra.rawApproxDistinct(_, _)),
    "q23_hll_merge" -> (graft.queries.Extra.rawHllMerge(_, _)),
    "q26_theta_overlap" -> (graft.queries.Extra.rawTheta(_, _)))

  /** Rank slack for the q25 bounds golden: 3× the k=200 KLL normalized
    * rank error (~1.65%), rounded up — wide enough that no legitimate
    * coin sequence flakes, narrow enough that a real defect escapes it.
    */
  val KllSlack = 0.05

  /** Bounds golden for q25: per l_returnflag, exact values at rank
    * (q − slack)·n and (q + slack)·n of the sorted l_quantity multiset,
    * for q ∈ {0.5, 0.9} (the query's quantiles). sf0.001 lineitem is
    * ~6k rows — the driver-side sort is test-scale only.
    */
  def kllBoundsCanon(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val groups = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").cast("string"),
        col("l_quantity").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
    val lines = groups.map { case (f, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def at(p: Double) =
        sorted(math.max(0, math.min(n - 1, (p * n).toInt)))
      val cells = Seq(0.5, 0.9).flatMap(q =>
        Seq(at(q - KllSlack), at(q + KllSlack)))
      (Seq(f, n.toString) ++
        cells.map(java.lang.Double.toString)).mkString("\t")
    }
    (s"# KLL BOUNDS slack=$KllSlack (see GoldenGen.kllBoundsCanon)" +
      "\nl_returnflag\tn\tq50_lo\tq50_hi\tq90_lo\tq90_hi\n" +
      lines.mkString("\n") + "\n")
  }

  private def canonValue(v: Any): String = v match {
    case null => "NULL"
    case d: Double => java.lang.Double.toString(d)
    case f: Float => java.lang.Float.toString(f)
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: Seq[_] => s.map(canonValue).mkString("[", ",", "]")
    case r: Row => r.toSeq.map(canonValue).mkString("(", ",", ")")
    case x => x.toString
  }

  /** Header + rows in canonical sorted order, one line each. */
  def canon(df: DataFrame): String = {
    val header = df.columns.mkString("\t")
    val rows = df.collect()
      .map(_.toSeq.map(canonValue).mkString("\t")).sorted
    (header +: rows).mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for ((n, mk) <- raws) {
      val df = mk(spark, sfDir)
      Files.writeString(Paths.get(outDir, s"$n.golden"), canon(df))
      println(s"[golden] wrote $n")
    }
    Files.writeString(Paths.get(outDir, "q25_kll_quantiles.golden"),
      kllBoundsCanon(spark, sfDir))
    println("[golden] wrote q25_kll_quantiles (bounds)")
    spark.stop()
  }
}
