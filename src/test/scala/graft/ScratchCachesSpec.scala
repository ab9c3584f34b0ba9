package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, ScratchCaches}

/** Persist lifecycle hygiene (VERDICT r8 "what's wrong" #2): the ops
  * that persist shared subtrees internally register them with
  * [[ScratchCaches]], and a long-lived session releases them after
  * materializing — the cache manager must return to baseline, or
  * repeated pipeline calls accumulate orphans until LRU eviction
  * thrashes real working sets.
  */
class ScratchCachesSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three"), // short (< k tokens)
      (4L, "one two three"),
      (5L, "")) // empty
      .toDF("doc_id", "text")
  }

  test("soak: repeated pairs ops + releaseAll return the cache manager " +
    "to baseline") {
    ScratchCaches.releaseAll()
    // Leak property = NO NEW persistent RDDs survive releaseAll, i.e.
    // the surviving id set is a subset of the baseline ids. Comparing
    // COUNTS was flaky in a shared JVM (r13): persistentRdds is a
    // weak-value map, so stale entries whose owner DataFrames earlier
    // suites dropped vanish whenever a full GC runs mid-test, shrinking
    // the count below baseline with zero scratch leaked.
    val base = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 3).foreach { _ =>
      Dedup.ngramJaccardPairs(docs, 8, 10).count()
      Dedup.minhashLshPairs(docs).count()
      Dedup.simhashPairs(docs).count()
      assert(ScratchCaches.activeCount > 0,
        "ops stopped registering their scratch persists")
      ScratchCaches.releaseAll()
      assert(ScratchCaches.activeCount == 0)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- base
    assert(leaked.isEmpty,
      s"scratch caches leaked past releaseAll: rdd ids $leaked")
  }

  test("retention mode: releaseAll is a no-op under retain; retained{} " +
    "restores the mode and force-releases at exit") {
    ScratchCaches.releaseAll()
    // subset-of-baseline assertions for the same GC-robustness reason
    // as the soak test above
    val base = spark.sparkContext.getPersistentRDDs.keySet
    assert(!ScratchCaches.retain)
    ScratchCaches.retained {
      assert(ScratchCaches.retain)
      Dedup.ngramJaccardPairs(docs, 8, 10).count()
      val warm = ScratchCaches.activeCount
      assert(warm > 0)
      ScratchCaches.releaseAll() // no-op while retaining
      assert(ScratchCaches.activeCount == warm,
        "releaseAll dropped scratch despite retention")
      Dedup.minhashLshPairs(docs).count()
      assert(ScratchCaches.activeCount > warm)
    }
    assert(!ScratchCaches.retain, "retained{} leaked the mode")
    assert(ScratchCaches.activeCount == 0, "retained{} did not release")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- base).isEmpty,
      "scratch caches leaked past retained{}")
    // manual toggle path: setRetain(true) + forced release
    ScratchCaches.setRetain(true)
    Dedup.simhashPairs(docs).count()
    ScratchCaches.releaseAll()
    assert(ScratchCaches.activeCount > 0)
    ScratchCaches.releaseAll(force = true)
    assert(ScratchCaches.activeCount == 0)
    ScratchCaches.setRetain(false)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- base).isEmpty)
  }

  test("containmentPairs persists exactly two scratch tables — one " +
    "tokenization feeds the k-gram table AND every short-length pass") {
    ScratchCaches.releaseAll()
    val pairs = Dedup.containmentPairs(docs, k = 8).collect()
    // equal long texts contain each other (both directions); equal
    // short texts likewise; the empty doc is contained by nothing here
    assert(pairs.length == 4, pairs.mkString(", "))
    assert(ScratchCaches.activeCount == 2,
      s"expected th + gram table only, got ${ScratchCaches.activeCount}")
    ScratchCaches.releaseAll()
  }
}
