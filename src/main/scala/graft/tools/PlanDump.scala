package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit utility: print the executed plan of any
  * SparkEntry gate query plus a one-line exchange/sort census — the
  * evidence PLANS.md quotes.
  *
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== $name ===")
    println("exchanges=" + "Exchange".r.findAllIn(plan).length +
      " sorts=" + "\\bSort\\b".r.findAllIn(plan).length)
    println(plan)
    spark.stop()
  }
}
