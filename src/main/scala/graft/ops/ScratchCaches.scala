package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for SCRATCH caches — intermediate tables the dedup/ANN ops
  * persist internally because Catalyst does not reuse exchanges across
  * self-join aliases (the dd2/dd3/dd4 persist discipline; the persisted
  * subtree is referenced by the RETURNED lazy plan, so the op itself
  * cannot unpersist without forcing evaluation and hiding the plan).
  *
  * Per-query batch sessions never need this: the process exits and the
  * caches die with it. A LONG-LIVED session (a [[graft.server.SparqlServer]]
  * host, a notebook, a multi-stage pipeline driver) must release scratch
  * caches after materializing each op's result, or the cache manager
  * accumulates orphaned tables until LRU eviction starts thrashing real
  * working sets:
  *
  * {{{
  *   val pairs = Dedup.ngramJaccardPairs(docs, 8, 10)
  *   pairs.write.parquet(out)   // materialize FIRST
  *   ScratchCaches.releaseAll() // then release (non-blocking unpersist)
  * }}}
  *
  * Releasing before the consuming action is safe but wasteful: the plan
  * recomputes the subtree (correctness is never at stake). `unpersist`
  * is idempotent, so ops that already release their own scratch (the
  * connected-components fixpoint) may also be tracked here.
  */
object ScratchCaches {
  private val tracked =
    scala.collection.mutable.LinkedHashSet[DataFrame]()

  /** Register a persisted scratch frame; returns it for chaining. */
  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    tracked += df; df
  }

  /** Scratch frames registered since the last release. */
  def activeCount: Int = synchronized(tracked.size)

  /** Non-blocking unpersist of every tracked scratch frame. Call after
    * the consuming action (write/collect) of the op that produced them.
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist())
    tracked.clear()
  }
}
