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

  test("grouping-sets family equals the union of its component " +
      "groupings (naive model)") {
    // ROLLUP(a,b) = {(a,b),(a),()}, CUBE(a,b) = {(a,b),(a),(b),()},
    // GROUPING SETS enumerates explicitly. Model each set as its own
    // groupBy with the absent keys nulled, union, and compare — over
    // real data (lineitem) so empty-string/NULL corners ride along.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    val li = graft.io.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag").as("a"), col("l_linestatus").as("b"),
        col("l_quantity").cast("decimal(38,6)").as("q"))
    def grouped(keys: Seq[String]): DataFrame = {
      val sel: Seq[Column] = Seq(
        (if (keys.contains("a")) col("a") else lit(null)).as("a"),
        (if (keys.contains("b")) col("b") else lit(null)).as("b"),
        col("n"), col("sq"))
      (if (keys.isEmpty) li.groupBy() else li.groupBy(keys.map(col): _*))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
        .select(sel: _*)
    }
    def canon(df: DataFrame): Seq[String] =
      df.collect().toSeq.map(r => (0 until 4).map(i =>
        String.valueOf(r.get(i))).mkString("|")).sorted
    val rollup = li.rollup(col("a"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(col("a"), col("b"), col("n"), col("sq"))
    assert(canon(rollup) ==
      canon(grouped(Seq("a", "b")).union(grouped(Seq("a")))
        .union(grouped(Nil))))
    val cube = li.cube(col("a"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(col("a"), col("b"), col("n"), col("sq"))
    assert(canon(cube) ==
      canon(grouped(Seq("a", "b")).union(grouped(Seq("a")))
        .union(grouped(Seq("b"))).union(grouped(Nil))))
    val gsets = li.groupingSets(
      Seq(Seq(col("a")), Seq(col("b")), Seq()), col("a"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(col("a"), col("b"), col("n"), col("sq"))
    assert(canon(gsets) ==
      canon(grouped(Seq("a")).union(grouped(Seq("b")))
        .union(grouped(Nil))))
  }
}
