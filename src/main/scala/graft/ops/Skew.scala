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
    *
    * Join strategy is SIZE-GATED (r13, guide §3.1), not forced: r12
    * hinted SHUFFLE_HASH unconditionally — correct reasoning at scale
    * (a broadcast join cannot spread a hot key, and explode keeps the
    * child's size estimate, so the planner was building a ×salts hash
    * relation) but a driver-measured 4× regression locally, where the
    * replicated side is tiny and a broadcast join skips shuffling the
    * big side entirely (broadcast joins have no reducers to skew — the
    * hot key streams through map tasks). So: if the ×salts-replicated
    * small side still fits the session's broadcast threshold, broadcast
    * it explicitly (deterministic — not left to the explode-blinded
    * estimate); only past the threshold force the shuffle join that
    * salting exists for.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    val threshold = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      big.sparkSession.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10MB"))
    val replicatedSize =
      small.queryExecution.optimizedPlan.stats.sizeInBytes * salts
    val rightSide =
      if (threshold > 0 && replicatedSize <= threshold)
        broadcast(replicatedSmall)
      else replicatedSmall.hint("shuffle_hash")
    saltedBig.join(rightSide, Seq(key, "__salt")).drop("__salt")
  }
}
