package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Dot products are SEQUENTIAL double folds over the array order
  * (functions.aggregate): per-row work, no cross-row float accumulation,
  * so the result is bit-for-bit reproducible regardless of partitioning —
  * and identical to any engine folding the same IEEE ops in the same
  * order (the DuckDB oracle mirrors it with list_reduce).
  * Brute-force top-k is the correctness baseline; the random-hyperplane
  * LSH variant is the 100 TB path (bucket join instead of cross join).
  */
object Similarity {

  /** Deterministic (ordered-fold) double dot product of two float arrays. */
  def dotSeq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity as a deterministic double. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotSeq(a, b) / (sqrt(normA) * sqrt(normB))

  /** Vectors with their squared norm (deterministic double). */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm2", dotSeq(col("embedding"), col("embedding")))

  /** All pairs in a probe block with cosine >= threshold (near-dup scan).
    * `probe` bounds the left side so the quadratic stays a block, not a
    * full cross product.
    */
  def cosinePairs(emb: DataFrame, threshold: Double,
      probe: Column): DataFrame = {
    val v = withNorm(emb)
    val a = v.where(probe)
      .select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("norm2").as("na"))
    val b = v.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("norm2").as("nb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos", cosine(col("ea"), col("eb"), col("na"), col("nb")))
      .where(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Brute-force cosine top-k for each query vector (exact ANN baseline).
    * Ties broken by candidate id: fully deterministic.
    */
  def bruteTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val v = withNorm(emb)
    val q = v.where(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("norm2").as("qn"))
    val c = v.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("norm2").as("cn"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane sign for (plane j, dim i):
    * xxhash64 parity stands in for a N(0,1) draw's sign — public-knowledge
    * SRP-LSH (Charikar 2002) with a hash-derived plane.
    */
  private def planeSign(j: Int, i: Column): Column =
    when(pmod(xxhash64(lit(j), i), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH bucket key: `planes`-bit signature of sign
    * patterns. Same bucket => candidate. The scale path: shuffle on the
    * short bucket key, quadratic work only within buckets.
    */
  def srpBucket(e: Column, planes: Int): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(e, sequence(lit(0), size(e) - 1),
          (x, i) => x.cast(DoubleType) * planeSign(j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, expr(s"shiftleft(cast(1 as bigint), $j)")).otherwise(0L)
    }.reduce(_ + _)

  /** IVF coarse quantizer: `nlist` centroids, every vector assigned to
    * its nearest list. Centroids are taken deterministically from the
    * corpus (lowest vec_ids) — at scale you would k-means them; the
    * harness needs reproducibility more than centroid quality, and the
    * probe/rerank dataflow is identical either way. Assignment is one
    * broadcast join + a per-vector argmax (no shuffle of the corpus).
    */
  def ivfAssign(emb: DataFrame, nlist: Int): DataFrame = {
    val cents = withNorm(emb).orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("list_id"), col("embedding").as("cent"),
        col("norm2").as("cnorm2"))
    val v = withNorm(emb)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("list_id"))
    v.crossJoin(broadcast(cents))
      .withColumn("cscore",
        cosine(col("embedding"), col("cent"), col("norm2"), col("cnorm2")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("vec_id"), col("embedding"), col("norm2"), col("list_id"))
  }

  /** ANN top-k via IVF: queries probe their `nprobe` nearest centroid
    * lists and rerank exactly within them. The 100 TB shape: candidate
    * generation shuffles on the short list_id key; the corpus is scanned
    * once for assignment (persist the assignment table in practice).
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(emb, nlist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = withNorm(emb).orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("list_id"), col("embedding").as("cent"),
        col("norm2").as("cnorm2"))
    val q = withNorm(emb).where(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("norm2").as("qn"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cscore").desc, col("list_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cscore", cosine(col("qe"), col("cent"), col("qn"),
        col("cnorm2")))
      .withColumn("__rn", row_number().over(wq)).where(col("__rn") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("list_id"))
    val cands = probes.join(assigned, Seq("list_id"))
      .where(col("qid") =!= col("vec_id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .withColumn("cos", cosine(col("qe"), col("embedding"), col("qn"),
        col("norm2")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("cid"), col("rank"), col("cos"))
  }

  /** ANN top-k via SRP-LSH: exact rerank within matching buckets.
    * Recall < 1 by construction; pair with bruteTopK to measure.
    */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int,
      planes: Int = 8): DataFrame = {
    val v = withNorm(emb).withColumn("bucket",
      srpBucket(col("embedding"), planes))
    val q = v.where(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("norm2").as("qn"), col("bucket"))
    val c = v.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("norm2").as("cn"), col("bucket"))
    val scored = q.join(c, Seq("bucket")).where(col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }
}
