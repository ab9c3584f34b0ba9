package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plays the role of the reference's storage layer
  * (lib/oxigraph/src/storage/mod.rs · StorageReader): in a Spark-native
  * engine the "store" is columnar parquet and the "index choice" is
  * Catalyst predicate pushdown + column pruning, so this is deliberately
  * just a thin path convention.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
