package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-test data generator: replicate the pipeline tables
  * (documents / embeddings / events) `factor`× with DISJOINT replicas,
  * for measuring how the dedup/ANN/text/events operators scale beyond
  * the largest driver-generated SF.
  *
  * Disjointness is the point: ids are shifted per replica and every
  * document token is prefixed with a replica tag, so near-dup structure
  * (dup clusters, shingle postings, simhash buckets) replicates instead
  * of cross-linking — output sizes then scale linearly by construction
  * and any super-linear RUNTIME growth is attributable to the operator,
  * not to a quadratically denser dataset.
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {

  val IdOffset = 100000000L

  def scaleDocs(docs: DataFrame, factor: Int): DataFrame = {
    val reps = (0 until factor).map { r =>
      val shifted =
        docs.withColumn("doc_id", col("doc_id") + lit(r * IdOffset))
      if (r == 0) shifted
      else shifted.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"r${r}x$$1"))
    }
    val out = reps.reduce(_.unionByName(_))
    if (out.columns.contains("n_chars"))
      out.withColumn("n_chars",
        length(col("text")).cast(docs.schema("n_chars").dataType))
    else out
  }

  /** Replicas circular-shift the vector by r positions: norm-preserving
    * and decorrelating (cosine of a random vector against its own
    * rotation is ~0), so cross-replica near-dup pairs don't appear and
    * dd5/ann output sizes scale linearly, like the doc-token prefixes.
    */
  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { r =>
      val shifted =
        if (r == 0) emb
        else emb.withColumn("embedding", concat(
          slice(col("embedding"), lit(r + 1), size(col("embedding"))),
          slice(col("embedding"), 1, r)))
      shifted.withColumn("vec_id", col("vec_id") + lit(r * IdOffset))
    }.reduce(_.unionByName(_))

  def scaleEvents(ev: DataFrame, factor: Int): DataFrame =
    (0 until factor).map(r =>
      ev.withColumn("event_id", col("event_id") + lit(r * IdOffset))
        .withColumn("user_id", col("user_id") + lit(r * IdOffset)))
      .reduce(_.unionByName(_))

  /** Replicate a TPC-H fact table with shifted surrogate keys: every
    * key in `keys` moves by r·IdOffset per replica, so replicas are
    * entity-DISJOINT subgraphs over the same fixed dimension tables
    * (region/nation stay shared, like scaling the fact side of a real
    * warehouse). Filter-bearing value columns (names, segments, dates)
    * replicate unchanged, so constant-filter selectivities — and
    * therefore result sizes — scale linearly by construction.
    */
  def scaleKeyed(df: DataFrame, keys: Seq[String], factor: Int): DataFrame =
    (0 until factor).map { r =>
      keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(r * IdOffset))
      }
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val Array(in, out, f) = args.take(3)
    val factor = f.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events goes through Events.read so any physical ts encoding
    // (TIMESTAMP(NANOS), TIMESTAMP_MICROS, int64) normalizes to the
    // plain int64 nanos the ev queries consume.
    def rd(t: String) = spark.read.parquet(s"$in/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.repartition(64).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    wr(scaleDocs(rd("documents"), factor), "documents")
    wr(scaleEmbeddings(rd("embeddings"), factor), "embeddings")
    wr(scaleEvents(graft.ops.Events.read(spark, in), factor), "events")
    // TPC-H side (for the sp/pq/q families + the quad store): facts
    // replicate with disjoint keys, dims stay shared
    if (new java.io.File(s"$in/lineitem.parquet").exists()) {
      wr(rd("region"), "region")
      wr(rd("nation"), "nation")
      wr(scaleKeyed(rd("customer"), Seq("c_custkey"), factor), "customer")
      wr(scaleKeyed(rd("supplier"), Seq("s_suppkey"), factor), "supplier")
      wr(scaleKeyed(rd("part"), Seq("p_partkey"), factor), "part")
      wr(scaleKeyed(rd("orders"), Seq("o_orderkey", "o_custkey"), factor),
        "orders")
      wr(scaleKeyed(rd("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"), factor), "lineitem")
    }
    spark.stop()
  }
}
