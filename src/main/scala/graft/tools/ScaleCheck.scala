package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-CORRECTNESS harness (round 12): under ScaleUp's
  * disjoint-replica construction, a query whose rows are
  * one-per-fact-entity (no LIMIT, no global aggregate, no shared-dim
  * row in the output, no cross-replica linkage) must return EXACTLY
  * `factor` × its base row count. The round-12 per-binding bug
  * (row-id divergence under AQE — sp33 returned 37,419 of 149,990
  * rows at 10×) was invisible to every small-SF oracle and ONLY
  * caught by this check, so it runs as a standing gate after
  * Translator changes.
  *
  * Usage: runMain graft.tools.ScaleCheck <baseDir> <scaleDir> <factor>
  */
object ScaleCheck {

  /** Queries whose result cardinality provably scales linearly:
    * per-entity rows over replicated fact tables (shared dimension
    * tables contribute join columns, never output rows of their own),
    * with constant filters on replicated value columns.
    */
  val linear: Seq[String] = Seq(
    "sp1_bgp_filter", "sp2_optional", "sp3_union", "sp4_minus",
    "sp5_exists", "sp6_values", "sp15_bind", "sp33_exists_subst",
    "sp34_lateral_exists", "pq1_select_filter", "pq2_optional",
    "pq5_exists", "q5_join_semi", "q6_join_anti",
    "dd1_exact_dedup", "dd2_ngram_jaccard", "ts1_langid",
    "ev2_sessions")

  def main(args: Array[String]): Unit = {
    val Array(base, scaled, f) = args.take(3)
    val factor = f.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var fails = 0
    for (name <- linear) {
      val fn = graft.SparkEntry.queries(name)
      val nb = fn(spark, base).count()
      graft.ops.ScratchCaches.releaseAll()
      val ns = fn(spark, scaled).count()
      graft.ops.ScratchCaches.releaseAll()
      val ok = ns == nb * factor
      if (!ok) fails += 1
      println(f"${if (ok) "ok  " else "FAIL"} $name%-22s base=$nb%8d " +
        f"scaled=$ns%10d expected=${nb * factor}%10d")
    }
    println(s"${linear.size - fails}/${linear.size} scale-linear checks passed")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
