package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: every method is hash-bucket-based — candidate generation
  * shuffles on band/bucket keys (uniform by construction), never on raw
  * documents; verification touches only candidate pairs. The brute-force
  * exact paths (pairwise Jaccard / cosine) exist as correctness baselines
  * and for bounded probe blocks; LSH variants are the 100 TB path.
  */
object Dedup {

  /** Exact dedup: group identical texts, keep the smallest doc_id.
    * One hash-aggregate shuffle on a fingerprint (not the full text) —
    * group on the short key, verify within groups.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"), col("text"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("fp"))

  /** Shingle rows (doc_id, shingle): the shared input of the Jaccard and
    * MinHash paths.
    */
  def shingleRows(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), k)).as("s"))

  /** Exact n-gram Jaccard near-dup pairs at `threshold` (as a rational
    * num/den to stay integer-exact): inverted-index self-join on shingles
    * for candidates, exact set verification per candidate pair.
    *
    * `dfCap` bounds the hottest posting list: a stop-shingle shared by a
    * large fraction of the corpus makes the self-join quadratic in its
    * document frequency while carrying no near-dup signal, so shingles
    * with df > dfCap are dropped from CANDIDATE GENERATION only —
    * verification still intersects the full shingle sets, keeping the
    * reported Jaccard exact. The default cap never binds at test scale;
    * at 100 TB set it to a small multiple of the expected dup-cluster
    * size.
    */
  def ngramJaccardPairs(docs: DataFrame, num: Int, den: Int,
      k: Int = 3, dfCap: Long = 1L << 20): DataFrame = {
    val withSh = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), k).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select(col("s"))
    val capped = sh.join(rare, Seq("s"), "left_semi")
    // Shingle sets are distinct (TextOps.shingles), so aggregating the
    // inverted-index self-join counts |capped-set intersection| per pair
    // on the SAME exchange the former pair-dedup used — and that count
    // IS the exact intersection whenever neither doc lost a shingle to
    // the df-cap. The array_intersect fallback then runs only for pairs
    // touching capped docs; with the cap unbound it processes zero rows.
    val counts = capped.as("a").join(capped.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).cast("int").as("ic"))
    val dropped = sh.join(rare, Seq("s"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("nd"))
    val sizes = withSh.select(col("doc_id"), col("n"))
      .join(dropped, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n"), coalesce(col("nd"), lit(0)).as("nd"))
    val stats = counts
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na"),
        col("nd").as("nda")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb"),
        col("nd").as("ndb")), "db")
    // true intersection <= ic + dropped_a + dropped_b, and Jaccard is
    // increasing in the intersection — the upper bound prunes safely
    // before any array work
    val ub = col("ic") + col("nda") + col("ndb")
    val plausible = stats
      .where(ub * den >= (col("na") + col("nb") - ub) * num)
    val exact = plausible.where(col("nda") + col("ndb") === 0)
      .select(col("da"), col("db"), col("ic").as("inter"),
        col("na"), col("nb"))
    val fuzzy = plausible.where(col("nda") + col("ndb") > 0)
      .join(withSh.select(col("doc_id").as("da"), col("sh").as("sa")), "da")
      .join(withSh.select(col("doc_id").as("db"), col("sh").as("sb")), "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("sa"), col("sb"))).as("inter"),
        col("na"), col("nb"))
    exact.unionByName(fuzzy)
      .where(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"))
  }

  /** Benchmark decontamination: corpus docs sharing at least
    * `minOverlap` distinct k-shingles with any probe (benchmark) doc.
    * The probe side is BROADCAST — benchmark suites are tiny next to a
    * 100 TB corpus, so the corpus never shuffles for the join; only the
    * matched (doc, probe) pairs ride the final count exchange.
    */
  def contamination(corpus: DataFrame, probes: DataFrame, k: Int = 3,
      minOverlap: Int = 2): DataFrame = {
    val c = shingleRows(corpus, k)
    val p = shingleRows(probes, k).withColumnRenamed("doc_id", "probe_id")
    c.join(broadcast(p), "s")
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).cast("int").as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** Connected components over near-dup pairs — the clustering step
    * that turns pairwise matches into keep/drop decisions (cluster_id =
    * the smallest doc_id in the component; keep it, drop the rest).
    *
    * Min-label propagation to fixpoint: each round every vertex takes
    * the min of its own and its neighbors' labels. Rounds = component
    * diameter, and near-dup clusters are small by construction, so this
    * terminates in a handful of shuffles on (id) — no per-vertex state
    * beyond one long. localCheckpoint cuts lineage per round (the same
    * discipline as the PathExec fixpoints).
    */
  def dupClusters(pairs: DataFrame): DataFrame = {
    // persist BEFORE the symmetrization union — otherwise the (possibly
    // expensive) pair-generation subtree materializes once per branch
    val p = pairs.select(col("da"), col("db"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p
      .unionByName(p.select(col("db").as("da"), col("da").as("db")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var comp = edges.select(col("da").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var changed = true
    while (changed) {
      val nbrMin = edges.join(comp, edges("db") === comp("id"))
        .groupBy(edges("da").as("nid")).agg(min("comp").as("nmin"))
      val next = comp.join(nbrMin, comp("id") === nbrMin("nid"), "left_outer")
        .select(comp("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.as("a").join(comp.as("b"), "id")
        .where(col("a.comp") =!= col("b.comp")).limit(1).count() > 0
      comp = next
    }
    edges.unpersist(); p.unpersist()
    comp.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
  }

  /** MinHash signatures: numHashes seeded xxhash64 mins, computed in one
    * codegen'd projection (no explode, no shuffle).
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64,
      k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), k).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => array_min(transform(col("sh"), s => xxhash64(i, s)))).as("sig"))

  /** LSH banding: candidates = pairs agreeing on at least one band
    * (bandRows hashes per band). Shuffle key is (band, bandSig) — short
    * and uniform; then verify candidates with exact Jaccard on the
    * shingle sets (array_intersect on the two docs only).
    *
    * The signature table is persisted and only (doc_id, band, bsig) rows
    * flow through the band self-join — the shingle arrays never ride the
    * ×bands explode/exchange; verification joins them back per candidate
    * from the cached table (the retry precondition NEXT.md recorded:
    * without the persist, the joins recomputed the signature projection
    * and regressed 18×).
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      num: Int = 8, den: Int = 10, k: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(docs, numHashes, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64((0 until rows).map(r =>
            element_at(col("sig"), b * rows + r + 1)): _*).as("bsig"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bsig"))
    val cands = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .dropDuplicates("da", "db")
    cands
      .join(sigs.select(col("doc_id").as("da"), col("sh").as("sa")), "da")
      .join(sigs.select(col("doc_id").as("db"), col("sh").as("sb")), "db")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("na", size(col("sa")))
      .withColumn("nb", size(col("sb")))
      .where(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"))
  }

  /** 64-bit SimHash per doc from token-frequency-weighted bit votes.
    * Bit positions come from a broadcast 64-row table so the shift
    * expressions stay plain resolvable columns.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // One shuffle: 64 per-bit vote sums as parallel aggregates over raw
    // token occurrences (identical to frequency-weighted votes, since
    // sum of +-1 per occurrence == +-cnt per distinct token). Replaces
    // the former 64-row crossJoin + two-stage aggregation — no x64 row
    // blowup, map-side partial aggregation does most of the work.
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(j =>
      sum(when(expr(s"shiftright(h, $j) % 2 != 0"), 1L).otherwise(-1L))
        .as(s"b$j"))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, candidates
    * via 8-bit chunk banding (a pair within distance d <= 7 must agree
    * on at least one of 8 chunks by pigeonhole).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 7): DataFrame = {
    val sh = simhash(docs)
    val chunks = broadcast(docs.sparkSession.range(8).select(col("id").as("c")))
    val chunked = sh.crossJoin(chunks)
      .withColumn("chunk",
        expr("shiftright(simhash, cast(c as int) * 8) & 255"))
      .select(col("doc_id"), col("simhash"), col("c"), col("chunk"))
    chunked.as("a").join(chunked.as("b"),
      col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      // distance is pair-deterministic, so filtering BEFORE the dedup
      // exchange is equivalent — the shuffle then carries only the pairs
      // within maxDist instead of every banding candidate
      .where(col("dist") <= maxDist)
      .dropDuplicates("da", "db")
  }
}
