package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY "Optimize for scale"):
  * classic salting — scatter the skewed (big) side across `salts`
  * sub-keys, replicate the small side once per salt, join on
  * (key, salt). Complements AQE skew-join splitting when a single key's
  * rows exceed what one task should own (e.g. a hot predicate or a
  * celebrity node in the quad table).
  */
object Skew {

  /** Deterministic uniform salt for a row (id-based, no rand()). */
  private def salt(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))

  /** Equi-join `big ⋈ small` on `key` with the big side salted.
    * Result equals the plain join; the shuffle distributes each hot key
    * over `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // Salting only has meaning for a SHUFFLE join (spread a hot key's
    // rows over `salts` reducers); left to size estimates the planner
    // broadcast the ×salts-replicated side (explode keeps the child's
    // size estimate), building a salts-times-bigger hash relation on
    // the driver for zero benefit — broadcast joins cannot skew in the
    // first place (r12; measured 2.3 s → shuffle plan, guide §3.1).
    saltedBig.join(replicatedSmall.hint("shuffle_hash"),
      Seq(key, "__salt")).drop("__salt")
  }
}
