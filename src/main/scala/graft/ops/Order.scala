package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus ordering and sequence packing.
  *
  * Training pipelines need a bit-reproducible global shuffle of the corpus
  * (so a run can be resumed / audited) and the "concatenate then chop into
  * context windows" bookkeeping that turns documents into fixed-size
  * training sequences. Both need a GLOBAL rank / prefix sum — the naive
  * `row_number().over(Window.orderBy(...))` forces every row through a
  * single partition, which is exactly the anti-pattern that dies at scale.
  *
  * Instead both use the classic two-phase distributed ranking shape:
  *   1. bucket rows by the first byte of the md5 shuffle key (256 buckets,
  *      order-aligned with the key and uniform by construction);
  *   2. rank / prefix-sum WITHIN each bucket (shuffle on the bucket id
  *      only, 32..256-way parallel);
  *   3. compute each bucket's exclusive offset from the 256-row bucket
  *      totals (metadata-scale) and broadcast-join it back.
  * The only single-partition exchange in the plan carries <=256 aggregated
  * rows; the data path never converges. At 1000 executors the bucket fan
  * can be widened by taking more key bytes — the shape is unchanged.
  */
object Order {

  private val SK = "__sk"
  private val B = "__b"

  /** Seeded shuffle key: md5(seed || key), uniform and reproducible —
    * same construction DuckDB mirrors as md5(seed || CAST(key AS VARCHAR)).
    */
  def shuffleKey(key: Column, seed: String): Column =
    md5(concat(lit(seed), key.cast("string")))

  /** First hex byte of the shuffle key as an order-aligned bucket id:
    * __sk < __sk' across buckets iff __b <= __b', so per-bucket ranks plus
    * exclusive bucket offsets compose to the exact global rank. */
  private def bucketOf(sk: Column): Column =
    conv(substring(sk, 1, 2), 16, 10).cast("int")

  private def withKey(df: DataFrame, key: Column, seed: String): DataFrame =
    df.withColumn(SK, shuffleKey(key, seed)).withColumn(B, bucketOf(col(SK)))

  /** Exclusive per-bucket offsets of `agg` (one row per bucket id).
    * The window runs over at most 256 rows — metadata scale, like the
    * predicate catalog in QuadSource — and the result is broadcast. */
  private def exclusiveOffsets(perBucket: DataFrame, total: String): DataFrame =
    perBucket.withColumn(
      "__off",
      coalesce(
        sum(col(total)).over(
          Window.orderBy(B).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))

  /** Bit-reproducible global shuffle order: every row gets `position` =
    * its rank (0-based) under (md5(seed||key), key). Equivalent single-node
    * semantics: row_number() OVER (ORDER BY md5(seed||key), key) - 1. */
  def trainingOrder(df: DataFrame, key: Column, seed: String): DataFrame = {
    val keyed = withKey(df, key, seed)
    val offs = exclusiveOffsets(
      keyed.groupBy(col(B)).agg(count(lit(1)).as("__n")), "__n")
    val w = Window.partitionBy(B).orderBy(col(SK), key)
    keyed
      .join(broadcast(offs.select(col(B), col("__off"))), B)
      .withColumn("position",
        (col("__off") + row_number().over(w) - 1).cast("long"))
      .drop(SK, B, "__off")
  }

  /** Concat-and-chop sequence packing bookkeeping: documents are laid out
    * in the seeded shuffle order and the resulting token stream is cut
    * into fixed `capacity`-token training sequences. Emits, per document,
    * the exclusive global token offset and the derived placement
    * (start_bin / start_off / end_bin). Documents longer than `capacity`
    * simply span several bins — the chop is positional, not aligned. */
  def packOrder(df: DataFrame, key: Column, tokens: Column, seed: String,
                capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val keyed = withKey(df, key, seed).withColumn("__t", tokens.cast("long"))
    val offs = exclusiveOffsets(
      keyed.groupBy(col(B)).agg(sum(col("__t")).as("__n")), "__n")
    val w = Window.partitionBy(B).orderBy(col(SK), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = col("__off") + coalesce(sum(col("__t")).over(w), lit(0L))
    keyed
      .join(broadcast(offs.select(col(B), col("__off"))), B)
      .withColumn("n_tokens", col("__t"))
      .withColumn("tok_off", cum)
      // `div` = exact integral division (a double `/` would round past 2^53)
      .withColumn("start_bin", expr(s"tok_off div $capacity"))
      .withColumn("start_off", pmod(col("tok_off"), lit(capacity.toLong)))
      .withColumn("end_bin",
        when(col("n_tokens") > 0,
          expr(s"(tok_off + n_tokens - 1) div $capacity"))
          .otherwise(expr(s"tok_off div $capacity")))
      .drop(SK, B, "__off", "__t")
  }
}
