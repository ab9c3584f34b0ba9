package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join and spreads hot keys") {
    // skew: every lineitem keyed to one hot supplier bucket
    val li = Tables(spark, sf, "lineitem")
      .withColumn("hot", (col("l_suppkey") % 2).cast("long"))
    val dim = spark.range(2).select(col("id").as("hot"),
      concat(lit("bucket_"), col("id")).as("label"))
    val plain = li.join(dim, Seq("hot"))
      .groupBy("label").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(38,6)")).as("q"))
    val salted = Skew.saltedJoin(li, dim, "hot", salts = 8)
      .groupBy("label").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(38,6)")).as("q"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the salted key space is genuinely wider than the raw key space
    val saltedKeys = li.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        xxhash64(monotonically_increasing_id()), lit(8L)))
      .select("hot", "__salt").distinct().count()
    assert(saltedKeys > 2, s"expected > 2 salted keys, got $saltedKeys")
  }
}
