package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-CORRECTNESS harness (round 12): under ScaleUp's
  * disjoint-replica construction, result cardinalities are predictable
  * functions of the replication factor, and a row count that breaks
  * the prediction at scale is a wrong answer no small-SF oracle can
  * see. The round-12 per-binding bug (row-id divergence under AQE —
  * sp33 returned 37,419 of 149,990 rows at 10×) was caught ONLY this
  * way, so this runs as a standing gate after Translator changes.
  *
  * Two gates:
  *  - `linear`: rows scale EXACTLY factor× (per-fact-entity outputs,
  *    no shared-dim rows): checked against one scaled dir.
  *  - `affine`: rows(f) = a·f + c (shared dimension tables contribute
  *    the constant part c; global/grouped aggregates are a = 0).
  *    Checked against TWO scaled dirs via the division-free cross
  *    ratio (r1 − nb)·(f2 − f1) == (r2 − r1)·(f1 − 1), which any
  *    layout-divergence row loss breaks.
  *
  * Usage:
  *   runMain graft.tools.ScaleCheck <base> <scaled> <factor>
  *   runMain graft.tools.ScaleCheck <base> <s1> <f1> <s2> <f2>
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

  /** Queries whose cardinality is affine in the factor. Excluded by
    * design: LIMIT/top-k families (sp16, q8, ts3, ts12), sampling
    * (ts5), packing/binning with rounding (ts14), candidate-count
    * approximations whose output size is data-layout dependent (ann2,
    * dd4 simhash, dd12 semdedup), value-range self-joins that scale
    * quadratically (q18_range_join), and four measured-benign data
    * artifacts of the ScaleUp construction (r12 sweep at 2×/5×):
    * pq3_group_having (HAVING over counts that scale — groups cross
    * the threshold, 21→25→25), dd5_embed_sim (rotation decorrelation
    * is pairwise-imperfect: replica r vs r+d repeats the base-vs-rot-d
    * correlation, so above-threshold pairs replicate super-linearly),
    * mm2_audio_frames (frame counts derive from text length, which
    * the rNx token prefixes inflate), ts8_winnow (fingerprint density
    * rides hash tie patterns of the prefixed tokens, ±0.5%).
    */
  val affine: Seq[String] = Seq(
    // SPARQL over the TPC-H quad store
    "sp7_agg", "sp8_path_seq", "sp9_path_plus", "sp10_path_star",
    "sp11_graph", "sp12_graph_var", "sp13_construct", "sp14_ask",
    "sp17_update", "sp18_clear_graph", "sp19_subselect", "sp20_describe",
    "sp21_path_neg", "sp22_path_zero_one", "sp23_string_fns",
    "sp24_insert_data", "sp25_groupconcat", "sp26_conditional",
    "sp27_date_arith", "sp28_path_seeded", "sp29_graph_mgmt",
    "sp30_graph_lifecycle", "sp31_update_with_graph", "sp32_update_using",
    "pq4_path_plus", "pq6_graph", "pq7_ask",
    "pq8_construct", "pq9_values_bind", "pq10_subselect", "pq11_update_text",
    "pq12_lang", "pq13_from", "pq14_describe", "pq15_lateral",
    "pq16_lateral_agg", "pq17_lateral_bind", "pq18_time", "pq19_rdfstar",
    "pq20_lateral_group_bind", "pq21_rdfstar_update", "pq22_service",
    "pq23_groupconcat_order", "pq24_dirlang",
    // relational family
    "q1_agg", "q2_filter_project", "q3_join_inner", "q4_join_left",
    "q7_agg_distinct", "q9_union_distinct", "q10_values_join",
    "q16_window", "q17_rollup", "q19_asof_join", "q20_approx_distinct",
    "q21_intersect", "q22_except", "q23_hll_merge", "q24_salted_join",
    "q25_kll_quantiles", "q26_theta_overlap", "q27_cube",
    "q28_grouping_sets",
    // pipeline operators
    "ann1_brute_topk", "dd3_minhash_lsh",
    "dd7_dup_clusters", "dd9_bloom_clean", "dd10_dedup_apply",
    "dd11_ngram_decontam", "dd13_priority_dedup", "dd15_span_stats",
    "dd16_span_removal", "dd17_containment",
    "ev1_hourly_windows", "ev3_json_agg", "ev4_sliding_windows",
    "ev5_funnel", "mm1_media_features",
    "mm3_video_frames", "ts2_quality", "ts4_repetition", "ts6_domain_cap",
    "ts7_token_counts", "ts9_clean_normalize",
    "ts10_pii_scrub", "ts11_chunking", "ts17_length_percentiles",
    "ts20_mix_plan", "ts23_quality_classifier")

  private def count(spark: SparkSession, name: String, dir: String): Long = {
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    graft.ops.ScratchCaches.releaseAll()
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var fails = 0
    var ran = 0
    val base = args(0)
    if (args.length >= 5) {
      val (s1, f1) = (args(1), args(2).toInt)
      val (s2, f2) = (args(3), args(4).toInt)
      for (name <- affine ++ linear) {
        val nb = count(spark, name, base)
        val r1 = count(spark, name, s1)
        val r2 = count(spark, name, s2)
        val affOk =
          (r1 - nb) * (f2 - f1) == (r2 - r1) * (f1 - 1)
        val linOk = !linear.contains(name) ||
          (r1 == nb * f1 && r2 == nb * f2)
        val ok = affOk && linOk
        ran += 1
        if (!ok) fails += 1
        println(f"${if (ok) "ok  " else "FAIL"} $name%-24s base=$nb%8d " +
          f"f$f1=$r1%9d f$f2=$r2%9d" +
          (if (!affOk) "  NOT AFFINE" else "") +
          (if (!linOk) "  NOT LINEAR" else ""))
      }
    } else {
      val (scaled, factor) = (args(1), args(2).toInt)
      for (name <- linear) {
        val nb = count(spark, name, base)
        val ns = count(spark, name, scaled)
        val ok = ns == nb * factor
        ran += 1
        if (!ok) fails += 1
        println(f"${if (ok) "ok  " else "FAIL"} $name%-24s base=$nb%8d " +
          f"scaled=$ns%10d expected=${nb * factor}%10d")
      }
    }
    println(s"${ran - fails}/$ran scale checks passed")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
