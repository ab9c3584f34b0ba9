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

  // q25_kll_quantiles is deliberately ABSENT: DataSketches KLL
  // compaction flips ThreadLocalRandom coins (not seedable), so its
  // exact quantile values legitimately vary run-to-run — the golden
  // net caught this as a flake. Its regression coverage stays the
  // SketchSpec rank-error bounds, which hold for every coin sequence.
  val names = Seq("dd4_simhash", "dd12_semdedup", "ann2_lsh_topk",
    "ann3_ivf_topk", "ann4_pq_topk", "q20_approx_distinct",
    "q23_hll_merge", "q26_theta_overlap")

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
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      Files.writeString(Paths.get(outDir, s"$n.golden"), canon(df))
      println(s"[golden] wrote $n")
    }
    spark.stop()
  }
}
