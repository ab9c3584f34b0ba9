package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: time + plan-dump the PerBinding gates (sp33/sp34) at a
  * given SF dir, to localize the super-linear step the r12 scale leg
  * exposed (sp33 45× / sp34 34× cost at 10× data).
  */
object PerBindingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    val which = if (args.length > 1) args(1) else "sp33_exists_subst"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.io.TpchRdf.quads(spark, dir).count() // warm store
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          stages.add(f"stage ${i.stageId}%4d ${
            (i.completionTime.getOrElse(0L) -
              i.submissionTime.getOrElse(0L)) / 1e3}%8.2fs " +
            f"in=${m.inputMetrics.recordsRead}%12d " +
            f"sr=${m.shuffleReadMetrics.recordsRead}%12d " +
            f"sw=${m.shuffleWriteMetrics.recordsWritten}%12d  " +
            i.name.take(60))
        }
      })
    val df = graft.SparkEntry.queries(which)(spark, dir)
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"[probe] $which rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    Thread.sleep(500)
    stages.forEach(s => println(s))
    spark.stop()
  }
}
