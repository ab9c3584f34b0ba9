package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * A row is kept iff the first 8 hex chars of md5(key) sort below the
  * stratum's threshold. That makes the sample a pure, stateless FILTER:
  * no RNG state, no shuffle, no driver coordination — reproducible
  * bit-for-bit across engines, runs and cluster sizes, which is what a
  * 100 TB mixing pipeline needs (re-running a stage must not resample).
  * Hex-string comparison is order-equivalent to comparing the 32-bit
  * value, so the keep probability is rate to within 2^-32.
  */
object Sampling {

  /** Threshold hex string for a keep-rate in [0, 1]. "g" sorts above
    * every hex digit, so rate >= 1 keeps all rows (a 9-char "100000000"
    * would compare LEXICOGRAPHICALLY below "f…" and drop ~94%).
    */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, math.min(0xffffffffL, math.round(rate * 4294967296.0)))}%08x"

  /** The md5 hash-order key: sampling keeps rows whose bucket sorts
    * below the rate threshold, so ordering by it gives a deterministic
    * "first n of the sample" (Similarity's bounded k-means train set).
    */
  def bucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Uniform deterministic sample at `rate` keyed by `key`. */
  def deterministicSample(df: DataFrame, key: Column,
      rate: Double): DataFrame =
    df.where(bucket(key) < lit(hexThreshold(rate)))

  /** Per-stratum rates (e.g. language mixing weights); strata missing
    * from `rates` fall back to `defaultRate`. The rate table compiles
    * into the filter expression itself (strata counts are mix-config
    * scale), so this too is a shuffle-free scan-time filter.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultRate))) { case (acc, (s, r)) =>
        when(stratum === s, lit(hexThreshold(r))).otherwise(acc)
      }
    df.where(bucket(key) < thr)
  }

  /** Per-stratum cap: keep the top `k` rows of each stratum under
    * `order` (make it total — tiebreak on a unique key — or the cap is
    * nondeterministic). One shuffle on the stratum key; at 100 TB a
    * pathologically hot stratum (one domain = half the corpus) should
    * be pre-filtered by `deterministicSample` before ranking, since a
    * rank window cannot be salted without changing its meaning.
    */
  def perStratumTopK(df: DataFrame, stratum: Column, order: Seq[Column],
      k: Int): DataFrame =
    df.withColumn("__rn",
      row_number().over(Window.partitionBy(stratum).orderBy(order: _*)))
      .where(col("__rn") <= k).drop("__rn")

  /** Training-mix plan: per stratum (source/domain/language), the
    * current token inventory and the sampling rate that hits a target
    * token budget under the given mixture weights (the Pile-style data
    * mixing table every multi-source training run starts from).
    * `target_tokens` = floor(budget · weight); `sample_rate` =
    * target/current (> 1 means the stratum must be UPSAMPLED — fed to
    * [[resampleToMix]] as epochs-with-fraction). Strata missing from
    * `weights` get weight 0. One stratum-keyed aggregation; the weight
    * table compiles into the projection (mix-config scale). All
    * arithmetic is integer counts + one IEEE multiply/floor and one
    * division — bit-exact cross-engine.
    */
  def mixPlan(df: DataFrame, tokenCount: Column, stratum: Column,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.select(stratum.as("stratum"), tokenCount.as("__tc"), w.as("__w"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tc")).as("n_tokens"),
        min(col("__w")).as("__w"))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        floor(lit(budgetTokens.toDouble) * col("__w")).cast("long")
          .as("target_tokens"))
      .withColumn("sample_rate",
        col("target_tokens").cast("double") / col("n_tokens"))
  }

  /** Apply a mixture: emit each row `floor(rate)` times plus one more
    * iff its md5 bucket sorts under the fractional remainder — exact
    * deterministic up/down-sampling in one scan (rate 2.5 = every row
    * twice, half the rows — hash-chosen — a third time; rate 0.4 = the
    * deterministic 40%). No shuffle, no RNG state: the same properties
    * as [[deterministicSample]], extended to rates above 1 for the
    * upsampling half of a mix plan. Output rows carry `copy` in
    * 1..n_copies; rows with zero copies vanish at the filter.
    */
  def resampleToMix(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    def whole(r: Double): Long = math.floor(r).toLong
    val base = rates.toSeq.sortBy(_._1).foldLeft(
      lit(whole(defaultRate))) { case (acc, (s, r)) =>
        when(stratum === s, lit(whole(r))).otherwise(acc)
      }
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultRate - whole(defaultRate)))) {
      case (acc, (s, r)) =>
        when(stratum === s, lit(hexThreshold(r - whole(r)))).otherwise(acc)
    }
    df.withColumn("n_copies",
        base + when(bucket(key) < thr, 1L).otherwise(0L))
      .where(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** Statistics-driven cleaning: keep rows whose `value` is at least
    * their stratum's p-th percentile (nearest-rank, [[exactPercentiles]])
    * — the adaptive version of a fixed length floor: each language/
    * source sets its own threshold from its own distribution. The
    * threshold table is stratum-count-sized and BROADCAST; the filter
    * itself is then map-side — the corpus never shuffles.
    */
  def percentileFloorFilter(df: DataFrame, stratum: Column, value: Column,
      p: Double): DataFrame = {
    val pcol = s"p${(p * 100).round}"
    val thr = exactPercentiles(df, stratum, value, Seq(p))
      .withColumnRenamed("__st", "__thr_st")
    df.join(broadcast(thr), stratum === col("__thr_st"))
      .where(value >= col(pcol))
      .drop("__thr_st", pcol)
  }

  /** Exact per-stratum percentiles by nearest-rank arithmetic: the
    * element at row_number == ceil(p·n) of the stratum's sorted values.
    * No interpolation and no engine-specific quantile definition — the
    * same rank formula runs verbatim in any SQL engine, and the picked
    * value is well-defined under ties (the sorted multiset's r-th
    * element does not depend on tie order). One per-stratum sort window
    * + one stratum aggregation; length-style inputs make the sort cheap
    * and the stratum count bounds the output.
    */
  def exactPercentiles(df: DataFrame, stratum: Column, value: Column,
      ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col("__st"))
    val ranked = df.select(stratum.as("__st"), value.as("__v"))
      .withColumn("__rn", row_number().over(w.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(w))
    val picks = ps.map { p =>
      max(when(col("__rn") ===
        ceil(lit(p) * col("__n")).cast("long"), col("__v")))
        .as(s"p${(p * 100).round}")
    }
    ranked.groupBy(col("__st")).agg(picks.head, picks.tail: _*)
  }
}
