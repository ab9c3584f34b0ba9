package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query runs and has a matching oracle") {
    assert(SparkEntry.queries.nonEmpty)
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg aggregates all lineitem rows") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .head.getLong(0)
    val li = graft.io.Tables(spark, sf, "lineitem").count()
    assert(total == li)
  }

  test("q6_join_anti is non-degenerate (returns rows)") {
    assert(SparkEntry.queries("q6_join_anti")(spark, sf).count() > 0)
  }

  test("q8 offset+limit windows the global sort") {
    val rows = SparkEntry.queries("q8_sort_limit_offset")(spark, sf).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sorted.reverse))
  }
}
