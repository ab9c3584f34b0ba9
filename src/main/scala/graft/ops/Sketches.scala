package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch operators for 100 TB-scale approximate analytics: HLL
  * distinct-count partials that MERGE without rescanning (the property
  * that matters on a cluster — daily partials roll up to monthly counts
  * as a sketch union, not a re-aggregation of raw data), and a
  * pure-DataFrame count-min sketch for heavy hitters.
  *
  * HLL uses Spark's Apache DataSketches integration (hll_sketch_agg /
  * hll_union_agg — codegen'd, mergeable, standard error ~1.04/sqrt(2^lgK)).
  * Count-min is seeded xxhash64 rows: depth×width counters, point query =
  * min over depth rows; one-sided guarantee (estimate >= true count).
  */
object Sketches {

  // ---- HyperLogLog (DataSketches HLL) --------------------------------

  /** Per-group HLL partial sketches: the narrow, mergeable aggregate you
    * persist instead of raw ids.
    */
  def hllPartials(df: DataFrame, keys: Seq[String], value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Merge partials down to a coarser key set; estimate distinct count.
    * No raw-data rescan — union of sketches only.
    */
  def hllMerge(partials: DataFrame, keys: Seq[String]): DataFrame = {
    val grouped =
      if (keys.isEmpty) partials.agg(hll_union_agg(col("hll")).as("hll"))
      else partials.groupBy(keys.map(col): _*)
        .agg(hll_union_agg(col("hll")).as("hll"))
    grouped.withColumn("approx_distinct", hll_sketch_estimate(col("hll")))
  }

  // ---- Count-min sketch ----------------------------------------------

  /** Build a count-min sketch table (seed, bucket, cnt) over `value`
    * with `depth` hash rows and `width` buckets. Distributed shape: one
    * explode to depth rows, one groupBy on the (seed, bucket) pair —
    * uniform short keys, counters bounded by depth×width regardless of
    * input size. Sketches over different inputs MERGE by summing
    * matching (seed, bucket) cells.
    */
  def countMinBuild(df: DataFrame, value: Column, depth: Int = 5,
      width: Int = 1024): DataFrame =
    df.select(value.as("v"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("seed"), col("v"))
      .groupBy(col("seed"), pmod(xxhash64(col("seed"), col("v")), lit(width))
        .as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for candidate values against a sketch:
    * min over the depth rows (classic CM estimate; >= true count).
    */
  def countMinQuery(sketch: DataFrame, candidates: DataFrame,
      value: Column, width: Int = 1024): DataFrame = {
    val cand = candidates.select(value.as("v")).distinct()
    val depth = sketch.select(max(col("seed"))).head().getInt(0) + 1
    cand
      .select(col("v"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket", pmod(xxhash64(col("seed"), col("v")), lit(width)))
      .join(sketch, Seq("seed", "bucket"), "left_outer")
      .groupBy(col("v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge two compatible count-min sketches (same depth/width). */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("seed"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
}
