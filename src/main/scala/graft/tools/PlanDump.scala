package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit utility: print the executed plan of any
  * SparkEntry gate query plus a one-line exchange/sort census — the
  * evidence PLANS.md quotes. r12: accepts a comma-separated name list
  * (one JVM for a whole audit sweep) and an optional output directory
  * (one `<name><fileSuffix>.txt` per query — the plans/r12 evidence
  * files).
  *
  * Usage: runMain graft.tools.PlanDump <q1[,q2,...]> [sfDir] [outDir] [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val text =
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString
          val census = "exchanges=" +
            "Exchange".r.findAllIn(plan).length +
            " sorts=" + "\\bSort\\b".r.findAllIn(plan).length
          s"=== $name ===\n$census\n$plan"
        } catch {
          case e: Throwable => s"=== $name ===\nFAILED: ${e.getMessage}"
        }
      outDir match {
        case Some(d) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/$name$suffix.txt"), text + "\n")
          println(s"[plandump] wrote $d/$name$suffix.txt")
        case None => println(text)
      }
      graft.ops.ScratchCaches.releaseAll()
    }
    spark.stop()
  }
}
