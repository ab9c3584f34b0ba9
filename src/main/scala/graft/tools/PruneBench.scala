package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.{PartitionedQuadStore, TpchRdf}

/** Partition-pruning evidence at scale: writes the 10×-scaled quad
  * table as the predicate-partitioned store and times a
  * constant-predicate scan through the pruned path (byPredicate →
  * PartitionFilters on p_key) vs the same logical filter over the
  * unpartitioned column (reads every partition). QuadStoreSpec locks
  * the plan shape at sf0.001; this records the runtime effect at 10×.
  *
  * Usage: runMain graft.tools.PruneBench <sfDir> <factor>
  */
object PruneBench {
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
    val path = "target/scale10_quads"
    PartitionedQuadStore.write(
      DictBench.scaledQuads(TpchRdf.quads(spark, sfDir), factor), path)
    val store = PartitionedQuadStore(spark, path)
    val pred = TpchRdf.P("acctbal")
    def median(xs: Seq[Double]) = { val s = xs.sorted; s((s.length - 1) / 2) }
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    store.all.count() // warm FS cache both ways
    // wall-clock at this size is flat (page cache + task overhead); the
    // load-bearing numbers are files/bytes actually read by the scan
    def scanStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // drive THIS plan instance (count() would re-plan and leave these
      // metrics untouched)
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      val scans = qe.executedPlan.collectLeaves()
      val files = scans.flatMap(_.metrics.get("numFiles").map(_.value)).sum
      val bytes = scans.flatMap(_.metrics.get("filesSize").map(_.value)).sum
      (files, bytes)
    }
    val prunedDf = store.byPredicate(pred)
    val fullDf = store.all.where(
      col("p")("kind") === graft.model.Term.IriKind &&
        col("p")("lex") === pred)
    val (pf, pb) = scanStats(prunedDf)
    val (ff, fb) = scanStats(fullDf)
    val pruned = median((1 to 3).map(_ =>
      time(store.byPredicate(pred).count())))
    val full = median((1 to 3).map(_ => time(fullDf.count())))
    println(s"""{"metric":"prunebench","pruned_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, pruned)},"full_scan_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, full)},"pruned_files":$pf,"full_files":$ff,"pruned_bytes":$pb,"full_bytes":$fb,"factor":$factor}""")
    spark.stop()
  }
}
