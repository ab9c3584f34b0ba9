package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plays the role of the reference's storage layer
  * (lib/oxigraph/src/storage/mod.rs · StorageReader): in a Spark-native
  * engine the "store" is columnar parquet and the "index choice" is
  * Catalyst predicate pushdown + column pruning, so this is deliberately
  * just a thin path convention.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan fan-out for sources feeding EXPENSIVE per-row
    * compute (shingling, gram hashing, winnowing, dot products).
    *
    * A small parquet input is a single row group, so its scan is ONE
    * task and every map-side transformation downstream serializes on
    * one core — measured: dd8's winnow pass ran 13 stages with 14 total
    * tasks on local[32]. Round-robin repartitioning to the session's
    * parallelism spreads that compute across every core for the price
    * of shuffling the (tiny, by precondition) input once.
    *
    * Scale-adaptive, not a tuned constant (guide §2.5): the fan-out
    * fires only when the scan has FEWER partitions than the session's
    * parallelism. At 100 TB a source has thousands of splits, the
    * condition is false, and this is the identity — no accidental
    * full-corpus shuffle. Row-level results are unchanged (round-robin
    * placement feeds only keyed aggregates/joins downstream; Spark
    * sorts before round-robin repartition, so retries are stable too).
    */
  def fanOut(df: DataFrame): DataFrame = {
    // Scan-shape gate (r13, advice): probing df.rdd.getNumPartitions on
    // an input with upstream shuffles eagerly materializes those stages
    // under AQE and recomputes them at action time. fanOut exists for
    // raw scans; a wide operator anywhere in the plan means the input is
    // already exchange-partitioned — return it untouched, don't probe.
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Sort | _: Window | _: Distinct |
          _: Deduplicate | _: RepartitionOperation | _: GlobalLimit) => p
    }.isDefined
    if (wide) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
