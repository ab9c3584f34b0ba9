package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._

/** One-off measurement harness for the round-12 no_oracle→oracle
  * conversion: prints the actual per-query ANN recalls, dedup-family
  * recall/precision, and sketch relative/rank errors at a given SF so
  * the committed gate bounds are chosen from measured values (bounds in
  * the gates must hold with wide margin at the driver's verify SF).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables(spark, dir, "embeddings")
    val docs = Tables(spark, dir, "documents")
    val li = Tables(spark, dir, "lineitem")

    // --- ANN recall per qid -------------------------------------------
    val exact = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("qid", "cid").cache()
    def annRecall(name: String, ap: org.apache.spark.sql.DataFrame): Unit = {
      val hits = exact.join(ap.select("qid", "cid"), Seq("qid", "cid"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      val per = exact.select("qid").distinct()
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("h"), lit(0L)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      println(s"$name per-qid hits/5: " + per.map(_._2).mkString(","))
      println(s"$name min=" + per.map(_._2).min + " mean=" +
        per.map(_._2).sum / 10.0)
    }
    annRecall("ann2_lsh", Similarity.lshTopK(emb, col("vec_id") < 10, 5))
    annRecall("ann3_ivf", Similarity.ivfTopK(emb, col("vec_id") < 10, 5))
    annRecall("ann4_pq", Similarity.pqTopK(emb, col("vec_id") < 10, 5))

    // --- simhash recall vs exact jaccard pairs ------------------------
    val exactPairs = Dedup.ngramJaccardPairs(docs, 8, 10)
      .select("da", "db").cache()
    val simPairs = Dedup.simhashPairs(docs, 7).select("da", "db")
    val nExact = exactPairs.count()
    val nRec = exactPairs.join(simPairs, Seq("da", "db")).count()
    println(s"dd4 simhash: exact=$nExact recovered=$nRec recall=" +
      (nRec.toDouble / nExact))

    // --- semdedup recall/precision vs brute cosine pairs --------------
    val brute = Similarity.cosinePairs(emb, 0.4, lit(true))
      .select("va", "vb").cache()
    val sem = Similarity.semdedupPairs(emb, 0.4).select("va", "vb").cache()
    val nB = brute.count(); val nS = sem.count()
    val nI = brute.join(sem, Seq("va", "vb")).count()
    println(s"dd12 semdedup: brute=$nB sem=$nS inter=$nI recall=" +
      (nI.toDouble / nB) + " precision=" + (nI.toDouble / nS))

    // --- HLL rel errors ------------------------------------------------
    val q20 = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    println("q20 rel errs: " + q20.map { case (f, a, e) =>
      f + "=" + math.abs(a - e).toDouble / e }.mkString(" "))
    val merged = Sketches.hllMerge(
      Sketches.hllPartials(li, Seq("l_returnflag"), col("l_partkey")),
      Seq("l_returnflag"))
      .collect().map(r => (r.getString(0),
        r.getAs[Number]("approx_distinct").doubleValue()))
    val exactD = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    println("q23 rel errs: " + merged.map { case (f, a) =>
      f + "=" + math.abs(a - exactD(f)) / exactD(f) }.mkString(" "))

    // --- KLL rank errors ------------------------------------------------
    val kll = Sketches.kllMerge(
      Sketches.kllPartials(li, Seq("l_returnflag"), col("l_quantity")),
      Seq("l_returnflag"), Seq(0.5, 0.9))
      .collect().map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Double]("q50"), r.getAs[Double]("q90")))
    for ((f, q50, q90) <- kll; (q, est) <- Seq((0.5, q50), (0.9, q90))) {
      val n = li.where(col("l_returnflag") === f).count().toDouble
      val le = li.where(col("l_returnflag") === f &&
        col("l_quantity") <= est).count() / n
      val lt = li.where(col("l_returnflag") === f &&
        col("l_quantity") < est).count() / n
      println(f"q25 $f q=$q est=$est rank_le=$le%.4f rank_lt=$lt%.4f " +
        f"err=${math.max(q - le, lt - q)}%.4f")
    }

    // --- theta rel errors -----------------------------------------------
    val pa = Sketches.thetaMerge(Sketches.thetaPartials(
      li.where(col("l_returnflag") === "A"), Nil, col("l_partkey")), Nil)
    val pb = Sketches.thetaMerge(Sketches.thetaPartials(
      li.where(col("l_returnflag") === "R"), Nil, col("l_partkey")), Nil)
    val so = Sketches.thetaSetOps(pa, pb, Nil).collect()(0)
    val aSet = li.where(col("l_returnflag") === "A")
      .select("l_partkey").distinct()
    val rSet = li.where(col("l_returnflag") === "R")
      .select("l_partkey").distinct()
    val eI = aSet.join(rSet, Seq("l_partkey")).count()
    val eD = aSet.join(rSet, Seq("l_partkey"), "left_anti").count()
    println(s"q26 theta: estI=${so.getAs[Double]("approx_intersection")} " +
      s"exactI=$eI estD=${so.getAs[Double]("approx_difference")} exactD=$eD")
    spark.stop()
  }
}
