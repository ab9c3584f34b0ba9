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
    val lsh = Similarity.lshTopK(emb, col("vec_id") < 10, 5, planes = 4)
      .collect()
    assert(lsh.nonEmpty, "LSH buckets should yield candidates")
    lsh.foreach { r =>
      assert(r.getDouble(3) <= brute(r.getLong(0)) + 1e-12,
        s"LSH cos must not exceed brute-force best for query ${r.getLong(0)}")
    }
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
}
