package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.ops._

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  lazy val docs = Tables(spark, sf, "documents")
  lazy val emb = Tables(spark, sf, "embeddings")

  test("minhash LSH finds every exact-jaccard pair (recall = 1 here)") {
    val exact = Dedup.ngramJaccardPairs(docs, 8, 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 64, 16, 8, 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == exact, s"LSH verified output must equal exact pairs")
  }

  test("native MinHashSig is bit-identical to the HOF formulation") {
    // the contract the native expression must keep: per (i, s) the
    // Spark hash chain xxhash64(i, s) (seed 42, children in order),
    // NULL shingles skipped by the chain, empty arrays -> all-null sig
    val sh = TextOps.shingles(TextOps.tokens(col("text")), 3)
    val hof = transform(sequence(lit(0), lit(64 - 1)),
      i => array_min(transform(col("sh"), s => xxhash64(i, s))))
    val both = docs.select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"),
        graft.expr.MinHashSig.sigCol(col("sh"), 64).as("native"),
        hof.as("hof"))
    assert(both.where(not(col("native") <=> col("hof"))).isEmpty,
      "native minhash signature diverged from the HOF formulation")
    // null-shingle and empty-array corners (filtered out upstream in
    // minhashSignatures, but the expression must still match)
    import spark.implicits._
    val corner = Seq(
      (1L, Seq("a b c", null, "d e f")),
      (2L, Seq.empty[String])).toDF("doc_id", "sh")
    val c2 = corner.select(
      graft.expr.MinHashSig.sigCol(col("sh"), 8).as("native"),
      transform(sequence(lit(0), lit(7)),
        i => array_min(transform(col("sh"), s => xxhash64(i, s))))
        .as("hof"))
    assert(c2.where(not(col("native") <=> col("hof"))).isEmpty,
      "corner-case minhash parity failed")
  }

  test("df-cap drops stop-shingle-only candidates but keeps exact Jaccard") {
    import spark.implicits._
    // docs 1/2 are near-dups; 3/4 share ONLY the stop shingle, which
    // appears in every doc (df = 4)
    val tiny = Seq(
      (1L, "stop stop stop alpha beta gamma delta"),
      (2L, "stop stop stop alpha beta gamma epsilon"),
      (3L, "stop stop stop one two three four five six seven"),
      (4L, "stop stop stop eight nine ten eleven twelve thirteen fourteen"))
      .toDF("doc_id", "text")
    // no cap: the 1-2 pair qualifies at 3/10 (shares stop + alpha/beta...)
    val uncapped = Dedup.ngramJaccardPairs(tiny, 3, 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)))
    // cap df<=3: the "stop stop stop" shingle (df 4) leaves candidate
    // generation; 1-2 still found via their other shared shingles, and
    // their reported Jaccard is still computed on the FULL sets
    val capped = Dedup.ngramJaccardPairs(tiny, 3, 10, 3, dfCap = 3L)
    val cappedPairs = capped.select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.contains((1L, 2L)))
    val row = capped.where(col("da") === 1L && col("db") === 2L).head()
    val uncappedRow = Dedup.ngramJaccardPairs(tiny, 3, 10)
      .where(col("da") === 1L && col("db") === 2L).head()
    assert(row.getAs[Int]("inter") == uncappedRow.getAs[Int]("inter"),
      "verification must use full shingle sets, not the capped index")
    // 3-4 share only the stop shingle: candidate only without the cap
    assert(!cappedPairs.contains((3L, 4L)))
  }

  test("simhash banding tables: wide keys, pigeonhole-complete") {
    // d <= 3: 4 tables of one 16-bit block — 65,536 key values each
    val t3 = Dedup.simhashTables(3)
    assert(t3.length == 4)
    assert(t3.forall(bs => bs.length == 1 && bs.head._2 == 16))
    // d = 7: C(9,2) = 36 tables keyed on two blocks, >= 14 bits each —
    // the bucket-key space is 2^14+ per table, not the old 2^8
    val t7 = Dedup.simhashTables(7)
    assert(t7.length == 36)
    assert(t7.forall(bs => bs.length == 2 && bs.map(_._2).sum >= 14))
    // block layouts tile the full 64 bits with no overlap
    for (m <- Seq(4, 9, 12)) {
      val bs = Dedup.simhashBlocks(m)
      assert(bs.map(_._2).sum == 64)
      assert(bs.map { case (s, w) => s until (s + w) }.flatten.toSet
        == (0 until 64).toSet)
    }
  }

  test("simhash candidate generation is exact vs brute-force hamming") {
    // banding must find EVERY pair within maxDist (pigeonhole), so on a
    // bounded slice the output equals the all-pairs hamming filter
    val slice = docs.limit(120)
    val sh = Dedup.simhash(slice)
      .select(col("doc_id"), col("simhash")).persist()
    val brute = sh.as("a").join(sh.as("b"),
      col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .where(col("dist") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairs(slice, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sh.unpersist()
    assert(banded == brute,
      s"banding missed ${brute -- banded} / invented ${banded -- brute}")
  }

  test("simhash near-dups recall >= 0.8 of jaccard near-dups") {
    val jacc = Dedup.ngramJaccardPairs(docs, 8, 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, 7)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty, "simhash should find near-dup pairs")
    val recall = (jacc & sim).size.toDouble / jacc.size
    assert(recall >= 0.8, s"recall $recall too low; missing ${jacc -- sim}")
  }

  test("LSH ANN cosines are bounded by brute-force top-1 per query") {
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(emb, col("vec_id") < 10, 5,
      tables = 4, bits = 4)
      .collect()
    assert(lsh.nonEmpty, "LSH buckets should yield candidates")
    lsh.foreach { r =>
      assert(r.getDouble(3) <= brute(r.getLong(0)) + 1e-12,
        s"LSH cos must not exceed brute-force best for query ${r.getLong(0)}")
    }
  }

  test("IVF ANN cosines are bounded by brute force and recall is sane") {
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteTop1 = Similarity.bruteTopK(emb, col("vec_id") < 10, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 10, 5)
      .collect()
    assert(ivf.nonEmpty)
    // exactness within probed lists: no IVF cosine can beat brute top-1
    ivf.foreach { r =>
      assert(r.getDouble(3) <= bruteTop1(r.getLong(0)) + 1e-12)
    }
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfPairs).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall implausibly low")
  }

  test("PQ ANN: rerank cosines exact, recall sane, codes well-formed") {
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteTop1 = Similarity.bruteTopK(emb, col("vec_id") < 10, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val pq = Similarity.pqTopK(emb, col("vec_id") < 10, 5).collect()
    assert(pq.nonEmpty)
    // rerank is exact within candidates: nothing can beat brute top-1
    pq.foreach { r =>
      assert(r.getDouble(3) <= bruteTop1(r.getLong(0)) + 1e-12)
    }
    val pqPairs = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pqPairs).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall implausibly low")
    // codes: m entries, all within [0, ksub)
    val b = Similarity.pqTrainLocal(emb)
    val codes = Similarity.pqEncode(emb, b).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == b.m && cs.forall(c => c >= 0 && c < b.ksub))
    }
  }

  test("IVF k-means refinement strictly improves recall over seed centroids") {
    // queries DISJOINT from the seed-centroid ids (lowest vec_ids):
    // a query that IS a centroid probes its own list exactly, which
    // inflates seed recall and hides what refinement buys
    val qPred = col("vec_id") >= 100 && col("vec_id") < 120
    val brute = Similarity.bruteTopK(emb, qPred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(iters: Int): Double = {
      val pairs = Similarity.ivfTopK(emb, qPred, 5, refineIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & pairs).size.toDouble / brute.size
    }
    val seedR = recallAt(0)
    val refinedR = recallAt(3)
    assert(refinedR > seedR,
      s"Lloyd refinement should improve recall: seed=$seedR refined=$refinedR")
    // and refinement must be deterministic: same centroids bit-for-bit
    val c1 = Similarity.ivfCentroids(emb, 16, 3).orderBy("list_id").collect()
    val c2 = Similarity.ivfCentroids(emb, 16, 3).orderBy("list_id").collect()
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq)
  }

  test("redaction: emails, URLs, phone runs masked with exact counts") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or call +1-555-123-4567 now"),
      (2L, "see https://ex.org/a?b=c@d and http://plain.io stop"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.co c.d@e.fg one number 12345678")
    ).toDF("doc_id", "text")
    val r = d.select(col("doc_id"), TextOps.redact(col("text")).as("red"),
      TextOps.redactionCounts(col("text")).as("rc")).orderBy("doc_id").collect()
    assert(r(0).getString(1) == "mail me at <EMAIL> or call <PHONE> now")
    // the URL pattern eats the embedded @ before the email pass runs
    assert(r(1).getString(1) == "see <URL> and <URL> stop")
    assert(r(2).getString(1) == "no pii here at all")
    assert(r(3).getString(1) == "two mails <EMAIL> <EMAIL> one number <PHONE>")
    def rc(i: Int) = r(i).getStruct(2)
    assert(rc(0).getInt(0) == 0 && rc(0).getInt(1) == 1 && rc(0).getInt(2) == 1)
    assert(rc(1).getInt(0) == 2 && rc(1).getInt(1) == 0 && rc(1).getInt(2) == 0)
    assert(rc(3).getInt(1) == 2 && rc(3).getInt(2) == 1)
  }

  test("repetition stats: known repeats measured exactly") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> top "a b" x3
      (2L, "x y z w"),            // all distinct
      (3L, "solo")                // too short for bigrams
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 6 && r(0).getLong(4) == 3)
    assert(math.abs(r(0).getDouble(2) - 3.0 / 5) < 1e-12) // 5 bigrams, 2 distinct
    assert(r(1).getDouble(2) == 0.0 && r(1).getLong(4) == 1)
    assert(r(2).getLong(1) == 1 && r(2).getLong(4) == 0L &&
      r(2).getDouble(5) == 0.0)
  }

  test("stratified sample: deterministic, monotone in rate, rate-accurate") {
    val half = Sampling.deterministicSample(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quarter = Sampling.deterministicSample(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.deterministicSample(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == again, "same rate must resample identically")
    assert(quarter.subsetOf(half), "lower rate nests inside higher rate")
    val n = docs.count().toDouble
    assert(math.abs(half.size / n - 0.5) < 0.1)
    assert(Sampling.deterministicSample(docs, col("doc_id"), 1.0).count()
      == docs.count(), "rate 1.0 keeps everything")
    assert(Sampling.deterministicSample(docs, col("doc_id"), 0.0).count()
      == 0, "rate 0.0 keeps nothing")
  }

  test("BPE-ish segmentation splits letter/digit/punct runs") {
    import spark.implicits._
    val d = Seq((1L, "hello world42 a-b")).toDF("doc_id", "text")
    val segs = d.select(TextOps.bpeTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(segs == Seq("hello", " world", "42", " a", "-", "b"))
    val counts = TextOps.tokenCounts(d).collect()(0)
    assert(counts.getLong(1) == 3 && counts.getLong(2) == 6)
  }

  test("winnowing: the SIGMOD'03 guarantee and selection density hold") {
    import spark.implicits._
    // Build docs from a shared 8-token run (>= k+w-1 = 6: MUST yield a
    // shared fingerprint) embedded in distinct noise, plus an unrelated
    // doc; tokens drawn from disjoint vocabularies so no accidental
    // gram collisions.
    val shared = (0 until 8).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"zeta eta $shared theta iota kappa"),
      (3L, "lone wolf text with no overlap at all here")).toDF(
      "doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "8-token shared run must survive winnowing in both docs")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty,
      "disjoint-vocabulary doc must share nothing")
    // density: winnowing selects ~2/(w+1) of gram hashes; assert the
    // coarse upper bound (never more than the gram count, and strictly
    // fewer on these 12+-gram docs)
    val nGrams = docs.select(col("doc_id"),
      size(TextOps.ngrams(TextOps.tokens(col("text")), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, s) =>
      assert(s.size < nGrams(id), s"doc $id selected all grams") }
    // pair detection end-to-end: only (1,2) at minShared=1
    val pairs = Dedup.winnowPairs(docs, 1)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("winnowing: short docs collapse to one fingerprint, empty to none") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs).collect()
    // doc 1: 2 grams < w=4 windows -> single overall min; doc 2: no
    // 3-grams -> no rows
    assert(fps.length == 1 && fps.head.getLong(0) == 1L)
  }

  test("dup clustering: chains collapse to one component") {
    import spark.implicits._
    // 1-2-3-4 is a path (diameter 3, needs >1 propagation round); 9-10
    // is separate
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("da", "db")
    val comp = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      9L -> 9L, 10L -> 9L))
  }

  test("dup clustering: O(log n) rounds on a long chain, cap enforced") {
    import spark.implicits._
    // a 200-node path — component diameter 199. Min-label propagation
    // needed ~199 rounds here; large-star/small-star must stay
    // logarithmic. Also scrambled ids so orientation isn't pre-sorted.
    val n = 200
    val ids = new scala.util.Random(42).shuffle((0L until n).toVector)
    val chain = (0 until n - 1).map(i =>
      (math.min(ids(i), ids(i + 1)), math.max(ids(i), ids(i + 1))))
      .toDF("da", "db")
    val (comp, rounds) = Dedup.dupClustersWithRounds(chain)
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L),
      "every chain node must label to the min id 0")
    assert(rounds <= 12, s"chain of $n took $rounds double-rounds")
    assert(rounds <= Dedup.MaxCcRounds)
  }

  test("dup clustering handles many mixed components with scrambled ids") {
    import spark.implicits._
    // stars, triangles, and reversed chains in one edge list
    val edges = Seq(
      (5L, 1L), (5L, 9L), (5L, 7L),            // star centered off-min
      (20L, 21L), (21L, 22L), (20L, 22L),      // triangle
      (33L, 31L), (31L, 32L), (32L, 30L))      // chain, mixed order
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("da", "db")
    val got = Dedup.dupClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 7L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L))
  }

  test("contamination flags shingle overlap with broadcast probes") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely different words here entirely now")).toDF("doc_id", "text")
    val probes = Seq(
      (1L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, probes, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // shared 3-shingles: "the quick brown", "quick brown fox",
    // "brown fox jumps" = 3
    assert(hits.toSeq == Seq((100L, 1L, 3)))
  }

  test("bloom decontamination is exact: equals the plain anti-join") {
    import spark.implicits._
    // corpus with exact copies of two benchmark docs + clean docs
    val bench = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "alpha beta gamma"),         // contaminated (== bench 1)
      (101L, "delta epsilon zeta"),       // contaminated (== bench 2)
      (102L, "totally clean document"),
      (103L, "another clean one here"),
      (104L, "alpha beta gamma extra"))   // near but not exact: clean
      .toDF("doc_id", "text")
    val clean = Dedup.bloomDecontaminate(corpus, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(102L, 103L, 104L))
    // differential vs the no-bloom exact anti-join, on real corpus data
    val c = docs.where(col("doc_id") >= 20)
    val b = docs.where(col("doc_id") < 20)
    val viaBloom = Dedup.bloomDecontaminate(c, b)
    val viaAnti = c.select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
      .join(b.select(TextOps.fingerprint(col("text")).as("fp")),
        Seq("fp"), "left_anti")
      .select("doc_id", "fp")
    assert(viaBloom.except(viaAnti).isEmpty && viaAnti.except(viaBloom).isEmpty)
  }

  test("cleanText strips markup, collapses whitespace, composes NFC") {
    import spark.implicits._
    val in = Seq(
      "<p class=\"x\">hello   <b>world</b></p>",
      "tabs\t\tand\nnewlines",
      "accent: e\u0301 composed",     // NFC: e + U+0301 -> U+00E9
      "plain ascii untouched",
      "\u00e9 already composed").toDF("t")
    val out = in.select(TextOps.cleanText(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "hello world",
      "tabs and newlines",
      "accent: \u00e9 composed",
      "plain ascii untouched",
      "\u00e9 already composed"))
  }

  test("scrubPii redacts emails, IPs, phone runs; counts match") {
    import spark.implicits._
    val in = Seq(
      "write to alice.b+spam@mail.example.org today",
      "server at 192.168.0.1 responded",
      "call +44 20 7946 0958 now",
      "mixed: bob@x.io from 10.0.0.7, dial 555 123 4567",
      "nothing to hide here").toDF("t")
    val out = in.select(TextOps.scrubPii(col("t")).as("s"),
      TextOps.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(
      ("write to <EMAIL> today", 1L),
      ("server at <IP> responded", 1L),
      ("call <PHONE> now", 1L),
      ("mixed: <EMAIL> from <IP>, dial <PHONE>", 3L),
      ("nothing to hide here", 0L)))
  }

  test("chunks: overlapping windows cover the text, ids dense") {
    import spark.implicits._
    val in = Seq((1L, "a" * 450), (2L, "xy")).toDF("doc_id", "text")
    val got = TextOps.chunks(in, 200, 150)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2).length))
    // doc 1: offsets 0,150,300 -> lens 200,200,150; doc 2: one short chunk
    assert(got.toSeq == Seq((1L, 0L, 200), (1L, 1L, 200), (1L, 2L, 150),
      (2L, 0L, 2)))
    // reconstruction: stride-aligned prefixes concatenate to the source
    val full = TextOps.chunks(in.where(col("doc_id") === 1), 200, 150)
      .orderBy("chunk_id").collect()
      .map(_.getString(2)).map(_.take(150)).mkString
    assert(full == "a" * 450)
  }

  test("bm25: term-dense docs rank first, absent terms score nothing") {
    import spark.implicits._
    val in = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "nothing relevant in here at all")).toDF("doc_id", "text")
    val got = TextOps.bm25(in, Seq("spark"))
      .orderBy(col("score").desc).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "rank by term density")
    assert(got.forall(_._2 > 0) && got.length == 2,
      "docs without any query term don't appear")
  }

  test("per-domain cap keeps exactly k rows per stratum, longest first") {
    val capped = Sampling.perStratumTopK(docs, col("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), 2)
    val bySrc = capped.groupBy("source").count().collect()
    assert(bySrc.nonEmpty && bySrc.forall(_.getLong(1) <= 2))
    val srcMax = docs.groupBy("source").agg(max("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    capped.groupBy("source").agg(max("n_chars").as("got")).collect()
      .foreach(r => assert(r.getLong(1) == srcMax(r.getString(0)),
        "cap must retain each stratum's max"))
  }

  test("multimodal stub decode matches columnar fingerprint") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
      .toDF().select(col("doc_id"), col("checksum"))
    val colFp = docs.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
    val joined = feats.join(colFp, "doc_id")
      .where(col("checksum") =!= col("fp")).count()
    assert(joined == 0, "mapPartitions stub and Column fingerprint agree")
  }

  test("audio frame sampling: geometry from metadata, features exact") {
    import spark.implicits._
    // "abab" alternates around 128? No: use chars straddling 128 via
    // explicit bytes — text is ASCII (<128) so samples are all negative;
    // zero-cross must then be 0 and peak = 128 - min char code.
    val one = Seq((0L, "aaaabbbbccccdddd")).toDF("doc_id", "text")
    val fr = Multimodal.audioFrames(spark, Multimodal.asAudio(one), 4, 2)
      .collect().sortBy(_.frame_idx)
    // doc_id 0 -> sample_rate 8000 -> frame 32 samples, hop 16; 16 chars
    // < 32 samples -> no full frame
    assert(fr.isEmpty)
    val two = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    // doc_id 1 -> 12000 Hz -> frame 48, hop 24; frames at 0,24,48 -> 3
    val fr2 = Multimodal.audioFrames(spark, Multimodal.asAudio(two), 4, 2)
      .collect().sortBy(_.frame_idx)
    assert(fr2.length == 3 && fr2.map(_.start_ms).toSeq == Seq(0L, 2L, 4L))
    val s = 'a'.toInt - 128 // -31
    assert(fr2.forall(f => f.n_samples == 48 && f.sum_sq == 48L * s * s &&
      f.peak == 31 && f.zero_cross == 0 &&
      f.rms == math.sqrt((48L * s * s).toDouble / 48)))
  }

  test("training order equals the single-partition reference rank") {
    import org.apache.spark.sql.expressions.Window
    val ord = Order.trainingOrder(docs, col("doc_id"), "s7")
      .select(col("doc_id"), col("position"))
    // reference: the naive global window (fine on a test-sized input)
    val ref = docs.select(col("doc_id"),
        md5(concat(lit("s7"), col("doc_id").cast("string"))).as("k"))
      .withColumn("refpos",
        row_number().over(Window.orderBy(col("k"), col("doc_id")))
          .cast("long") - 1)
    val bad = ord.join(ref, "doc_id")
      .where(col("position") =!= col("refpos")).count()
    assert(bad == 0, "bucketed two-phase rank must equal the global rank")
    // positions are a permutation of 0..n-1
    val n = docs.count()
    assert(ord.agg(min("position"), max("position"),
      countDistinct("position")).head() ==
      org.apache.spark.sql.Row(0L, n - 1, n))
  }

  test("pack offsets are the exact prefix sums of the shuffled order") {
    val p = Order.packOrder(docs, col("doc_id"),
        size(TextOps.tokens(col("text"))), "s7", 256)
      .select("doc_id", "n_tokens", "tok_off", "start_bin", "start_off",
        "end_bin")
      .collect().sortBy(_.getAs[Long]("tok_off"))
    var cum = 0L
    p.foreach { r =>
      assert(r.getAs[Long]("tok_off") == cum, s"gap at ${r}")
      assert(r.getAs[Long]("start_bin") == cum / 256)
      assert(r.getAs[Long]("start_off") == cum % 256)
      val n = r.getAs[Long]("n_tokens")
      val endBin = if (n > 0) (cum + n - 1) / 256 else cum / 256
      assert(r.getAs[Long]("end_bin") == endBin)
      cum += n
    }
    assert(cum > 0, "fixture must contain tokens")
  }

  test("dedupApply keeps exactly the canonical member of each cluster") {
    val clusters = Dedup.dupClusters(Dedup.ngramJaccardPairs(docs, 8, 10))
    val survivors = Dedup.dedupApply(docs, clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cl = clusters.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    assert(cl.nonEmpty, "fixture should produce clusters")
    cl.foreach { case (d, c) =>
      assert(survivors.contains(d) == (d == c),
        s"doc $d (cluster $c) kept=${survivors.contains(d)}")
    }
    val clustered = cl.map(_._1).toSet
    val n = docs.count()
    assert(survivors.size ==
      n - clustered.size + cl.count { case (d, c) => d == c })
  }

  test("token familiarity: counts and single-division average") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "b zz")).toDF("doc_id", "text")
    val got = TextOps.tokenFamiliarity(tiny).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // freqs: a=2, b=2, zz=1
    assert(got(1L) == (((2 + 2 + 2) / 3.0, 2L, 2L)))
    assert(got(2L) == (((2 + 1) / 2.0, 1L, 2L)))
  }

  test("video keyframe sampling: stride geometry and exact luma stats") {
    import spark.implicits._
    // doc_id 1 -> fps 18, width 12, height 8 -> frame 96 bytes;
    // 200 chars -> 2 full frames, every-3rd sampling keeps frame 0 only
    val one = Seq((1L, "ab" * 100)).toDF("doc_id", "text")
    val fr = Multimodal.videoFrames(spark, Multimodal.asVideo(one), 3)
      .collect()
    assert(fr.length == 1 && fr.head.frame_idx == 0)
    val f = fr.head
    assert(f.n_px == 96 && f.byte_off == 0 && f.ts_ms == 0)
    assert(f.sum_luma == 48L * ('a'.toInt + 'b'.toInt))
    assert(f.min_luma == 'a'.toInt && f.max_luma == 'b'.toInt)
    // 5 frames -> every-3rd keeps 0 and 3; ts of frame 3 at 18fps = 166ms
    val two = Seq((1L, "x" * 480)).toDF("doc_id", "text")
    val fr2 = Multimodal.videoFrames(spark, Multimodal.asVideo(two), 3)
      .collect().sortBy(_.frame_idx)
    assert(fr2.map(_.frame_idx).toSeq == Seq(0, 3))
    assert(fr2(1).ts_ms == 3L * 1000 / 18 && fr2(1).byte_off == 288L)
  }

  test("exact percentiles equal the sorted multiset's nearest-rank picks") {
    val got = Sampling.exactPercentiles(docs, col("lang"),
        col("n_chars").cast("long"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val by = docs.select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    by.foreach { case (lang, vs) =>
      def pick(p: Double) = vs(math.ceil(p * vs.length).toInt - 1)
      assert(got(lang) == ((pick(0.5), pick(0.9), pick(0.99))), lang)
    }
  }

  test("vocab matches a local word count") {
    val got = TextOps.vocab(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = docs.select("doc_id", "text").collect()
    val occ = new scala.collection.mutable.HashMap[String, Long]()
    val dfq = new scala.collection.mutable.HashMap[String, Set[Long]]()
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getString(1).split(" ", -1).foreach { w =>
        occ(w) = occ.getOrElse(w, 0L) + 1
        dfq(w) = dfq.getOrElse(w, Set.empty[Long]) + id
      }
    }
    assert(got.size == occ.size)
    occ.foreach { case (w, c) =>
      assert(got(w) == ((c, dfq(w).size.toLong)), s"mismatch for '$w'")
    }
  }

  test("incremental dedup equals the full self-join restricted to new docs") {
    val full = Dedup.ngramJaccardPairs(docs, 8, 10)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val touchingNew = full.filter { case (a, b) => a >= 400 || b >= 400 }
      // the op reports (new, corpus) for cross pairs
      .map { case (a, b) => if (a >= 400) (a, b) else if (b >= 400) (b, a)
        else (a, b) }
    val inc = Dedup.incrementalJaccardPairs(
      docs.where(col("doc_id") < 400), docs.where(col("doc_id") >= 400),
      8, 10)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == touchingNew,
      s"incremental pairs diverge: extra ${inc -- touchingNew}, " +
        s"missing ${touchingNew -- inc}")
  }

  test("priority dedup keeps the longest cluster member; singletons stay") {
    val clusters = Dedup.dupClusters(Dedup.ngramJaccardPairs(docs, 8, 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty)
    val kept = Dedup.dedupApplyByPriority(docs, Dedup.dupClusters(
        Dedup.ngramJaccardPairs(docs, 8, 10)), -col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lens = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly one survivor per cluster: the max-length (min-id tiebreak)
    clusters.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1)
      val want = ids.minBy(id => (-lens(id), id))
      assert(ids.filter(kept).toSeq == Seq(want))
    }
    // docs in no cluster survive
    val clustered = clusters.map(_._1).toSet
    docs.select("doc_id").collect().map(_.getLong(0))
      .filterNot(clustered).foreach(id => assert(kept(id)))
  }

  test("percentile floor filter: threshold equals the stratum's p10") {
    val got = Sampling.percentileFloorFilter(docs, col("lang"),
      col("n_chars").cast("long"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.map(_._3).sorted
      val thr = sorted(math.ceil(0.1 * g.length).toInt - 1)
      g.foreach { case (id, _, v) =>
        assert(got(id) == (v >= thr), s"doc $id: v=$v thr=$thr")
      }
    }
  }

  test("mix plan: targets floor the budget split, rates exact") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c d", "s1"), (2L, "e f", "s1"),
      (3L, "g h i", "s2"), (4L, "j", "s3"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.mixPlan(tiny, size(TextOps.tokens(col("text"))),
      col("source"), Map("s1" -> 0.5, "s2" -> 0.3), 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("s1") == ((2L, 6L, 500L, 500.0 / 6)))
    assert(got("s2") == ((1L, 3L, math.floor(1000 * 0.3).toLong,
      math.floor(1000 * 0.3) / 3)))
    assert(got("s3") == ((1L, 1L, 0L, 0.0))) // unlisted stratum: weight 0
  }

  test("mix apply: copy counts are floor(rate) + hash fraction, exact") {
    val applied = Sampling.resampleToMix(docs, col("doc_id"), col("source"),
      Map("src0" -> 2.5, "src1" -> 0.4))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(applied.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    applied.foreach { case (id, src, n) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expected = src match {
        case "src0" => 2L + (if (hex < "80000000") 1 else 0)
        case "src1" => if (hex < "66666666") 1L else 0L
        case _ => 1L
      }
      assert(n == expected, s"doc $id ($src): $n copies, expected $expected")
    }
    // downsampled stratum loses its over-threshold rows entirely
    val src1Kept = applied.count(_._2 == "src1")
    val src1All = docs.where(col("source") === "src1").count()
    assert(src1Kept < src1All)
  }

  test("semdedup pairs: exact cosines, subset of brute force, sane recall") {
    val tau = 0.4
    val got = Similarity.semdedupPairs(emb, tau)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty, "fixture should contain semantic near-dups")
    // full-space truth over the same threshold (probe = everything)
    val brute = Similarity.cosinePairs(emb, tau, lit(true))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // precision 1 with bit-exact cosines: every reported pair is a true
    // pair with the identical sequential-fold cosine
    got.foreach { case (k, c) =>
      assert(brute.contains(k), s"pair $k not in brute-force truth")
      assert(brute(k) == c, s"cosine drift for $k")
    }
    // recall < 1 by construction (cross-cluster pairs unseen) but the
    // clustering must catch a solid fraction at this nlist
    val recall = got.size.toDouble / brute.size
    assert(recall >= 0.5, s"semdedup recall $recall < 0.5")
  }

  test("ngram-overlap contamination: self-overlap is total, frac exact") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // identical: frac 1
      (11L, "alpha beta gamma delta epsilon nu xi omicron pi rho"),
      (12L, "one two three four five six seven")) // disjoint: frac 0
      .toDF("doc_id", "text")
    val got = Dedup.ngramOverlapContamination(corpus, bench, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(10L) == ((2L, 2L, 1.0)))
    // doc 11: 6 distinct 5-grams, only "alpha..epsilon" in the bench set
    assert(got(11L) == ((6L, 1L, 1.0 / 6)))
    assert(got(12L) == ((3L, 0L, 0.0)))
    // minFrac filter drops clean docs
    val flagged = Dedup.ngramOverlapContamination(corpus, bench, 5, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L))
  }

  test("unigram perplexity: tiny-corpus exact cross-entropy") {
    import spark.implicits._
    // corpus: 4 tokens total — "a" freq 2, "b" freq 1, "c" freq 1
    val tiny = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextOps.unigramPerplexity(tiny)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1: -(2*log2(2/4) + log2(1/4))/3 = (2*1 + 2)/3 = 4/3 bits
    val h1 = 4.0 / 3
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - math.rint(h1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got(1L)._3 - math.rint(math.pow(2, h1) * 1e4) / 1e4) < 1e-9)
    // doc 2: -log2(1/4) = 2 bits, perplexity 4
    assert(got(2L) == ((1L, 2.0, 4.0)))
  }

  test("duplicated spans: overlap-merge, disjoint islands, exact bounds") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b c d e f g h"),             // fully covered via overlap
      (2L, "z1 a b c d e z2 z3"),          // one 5-token span [1,5]
      (3L, "p1 p2 e f g h p3 p4"),         // one 4-token span [2,5]
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"),     // unique — no spans
      (5L, "a b c d m1 m2 m3 m4 m5 e f g h")) // two DISJOINT islands
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(tiny, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((1L, 0, 7), (2L, 1, 5), (3L, 2, 5),
      (5L, 0, 3), (5L, 9, 12)))
    val stats = Dedup.spanStats(tiny, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(stats == Map(1L -> ((1L, 8L, 8)), 2L -> ((1L, 5L, 8)),
      3L -> ((1L, 4L, 8)), 5L -> ((2L, 8L, 13))))
  }

  test("span removal: earliest copy keeps text, later copies cut exactly") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z1 a b c d e z2 z3"),
      (3L, "p1 p2 e f g h p3 p4"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (5L, "a b c d m1 m2 m3 m4 m5 e f g h"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(tiny, 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(got(1L) == (("a b c d e f g h", 8)))       // owner: untouched
    assert(got(2L) == (("z1 z2 z3", 3)))
    assert(got(3L) == (("p1 p2 p3 p4", 4)))
    assert(got(4L) == (("u1 u2 u3 u4 u5 u6 u7 u8", 8)))
    assert(got(5L) == (("m1 m2 m3 m4 m5", 5)))        // both islands cut
  }

  test("quality classifier: exact linear score, sigmoid in bounds") {
    import spark.implicits._
    val tiny = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    // ttr = 1, stop = 1/3, ntok = 3, avg token len = 3
    val score = -2.0 + 2.0 * 1.0 + 3.0 * (1.0 / 3) + 0.004 * 3 + -0.5 * 3.0
    val r = TextOps.qualityClassifier(tiny).head
    assert(r.getDouble(1) == score, "bit-identical same-order IEEE sum")
    assert(math.abs(r.getDouble(2) - 1.0 / (1.0 + math.exp(-score))) < 1e-3)
    val all = TextOps.qualityClassifier(docs).collect()
    assert(all.forall(x => x.getDouble(2) > 0 && x.getDouble(2) < 1))
  }

  test("containment: token-aligned only, both directions for equals") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "pre w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 post"),   // contains 1
      (3L, "xw1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),           // char-level trap
      (4L, "a1 a2 a3 a4 a5"),
      (5L, "a1 a2 a3 a4 a5"))                             // equal: both ways
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(tiny, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 5L), (5L, 4L)),
      s"boundary padding must reject the mid-token match; got $got")
  }

  test("containment: short docs (< k tokens) are found, incl. equal pairs") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "x y"),                          // 2 tokens, contained in 3
      (2L, "solo"),                         // 1 token, contained in 3
      (3L, "a x y b solo c"),
      (4L, "m n"), (5L, "m n"),             // equal short: both directions
      (6L, "q r s"))                        // short but contained nowhere
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(tiny, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 3L), (4L, 5L), (5L, 4L)),
      s"short-doc fallback missed/over-matched: $got")
  }

  test("containment: corpus-hot opening boilerplate does not defeat the probe") {
    import spark.implicits._
    // every doc OPENS with the same k tokens (head gram df = n) — the
    // old head-gram probe made every doc a candidate of every other;
    // the rarest-gram probe keys each doc on its unique tail instead.
    // Only doc 1 is genuinely contained (doc 2 embeds it verbatim).
    val tiny = Seq(
      (1L, "legal header boiler plate u1 u2"),
      (2L, "pre legal header boiler plate u1 u2 post"),
      (3L, "legal header boiler plate v1 v2"),
      (4L, "legal header boiler plate w1 w2"),
      (5L, "legal header boiler plate z1 z2"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(tiny, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("gram keys are 128-bit two-channel structs (span-removal safety)") {
    import spark.implicits._
    // removeDuplicateSpans deletes text on key equality alone, so the
    // key MUST stay 128-bit (two independent channels): at 64 bits a
    // trillion-gram corpus makes birthday collisions — and so wrong
    // deletions — certain. Lock the schema so a regression to a single
    // long fails here, not in production.
    val g = Dedup.gramKeyRows(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), 4)
    val gf = g.schema("g").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case other => fail(s"gram key must be a struct, got $other")
    }
    assert(gf == Seq("h1", "h2"))
    // the channels are independent hashes, not copies
    val r = g.collect()
    assert(r.nonEmpty && r.forall { row =>
      val k = row.getStruct(row.fieldIndex("g"))
      k.getLong(0) != k.getLong(1)
    })
  }

  test("DotSeq native expression: value, length, null, empty contract") {
    import spark.implicits._
    val one = Seq(1).toDF("x")
    def d(a: String, b: String) = one.select(Similarity.dotSeq(
      expr(a).cast("array<float>"), expr(b).cast("array<float>")))
    assert(d("array(1.0, 2.0)", "array(3.0, 4.0)").head.getDouble(0) == 11.0)
    assert(d("array(1.0)", "array(1.0, 2.0)").head.isNullAt(0),
      "length mismatch must be NULL (zip_with padding semantics)")
    assert(d("array(1.0, cast(null as float))", "array(1.0, 2.0)")
      .head.isNullAt(0), "null element must be NULL")
    assert(d("array()", "array()").head.getDouble(0) == 0.0)
    // bit-identical to the legacy HOF fold it replaced
    val legacy = aggregate(zip_with(
      expr("array(0.1, -2.3, 7.7)").cast("array<float>"),
      expr("array(1.5, 0.33, -9.1)").cast("array<float>"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val row = one.select(Similarity.dotSeq(
      expr("array(0.1, -2.3, 7.7)").cast("array<float>"),
      expr("array(1.5, 0.33, -9.1)").cast("array<float>")).as("n"),
      legacy.as("l")).head
    assert(row.getDouble(0) == row.getDouble(1), "must match the HOF fold bit-for-bit")
  }

  test("cross perplexity: exact smoothed entropy on a tiny corpus") {
    import spark.implicits._
    val ref = Seq((10L, "a a b")).toDF("doc_id", "text")
    val d = Seq((1L, "a c")).toDF("doc_id", "text")
    // n_ref = 3, v_ref = 2, denom = 6; p(a) = 3/6, p(c OOV) = 1/6
    val h = -(math.log(3.0 / 6) / math.log(2) +
      math.log(1.0 / 6) / math.log(2)) / 2
    val r = TextOps.crossPerplexity(d, ref).head
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - h) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.pow(2, h)) < 1e-12)
  }

  test("collocations: exact counts, IEEE-exact lift, PMI consistent") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // n_tok = 7, n_bg = 5; c(a) = c(b) = 3; c(ab) = 3
    val r = TextOps.collocations(tiny, minCount = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) == (("a", "b")))
    assert(row.getLong(2) == 3 && row.getLong(3) == 3 && row.getLong(4) == 3)
    val lift = (3.0 * 7 * 7) / (5.0 * 3 * 3)
    assert(row.getDouble(5) == lift, "lift must be IEEE-exact")
    assert(math.abs(row.getDouble(6) - math.log(lift) / math.log(2)) < 1e-12)
  }

  test("span invariants hold on the real corpus") {
    val st = Dedup.spanStats(docs, 8).collect()
    assert(st.forall(r => r.getLong(2) <= r.getInt(3)),
      "dup_tokens must never exceed n_tok")
    val sp = Dedup.duplicateSpans(docs, 8).collect()
    assert(sp.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= r.getInt(2) &&
      r.getInt(2) < r.getInt(4)), "span bounds inside the document")
  }
}
