package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.ops.Sketches

/** Sketch error-bound assertions (no DuckDB oracle possible by design —
  * sketches are implementation-defined; the guarantees ARE the spec).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  lazy val li = Tables(spark, sf, "lineitem")

  test("HLL partials merge to the global estimate within error bounds") {
    // daily-partition analogue: partial per returnflag, merged to global
    val partials = Sketches.hllPartials(li, Seq("l_returnflag"),
      col("l_partkey"), lgK = 12)
    assert(partials.count() >= 2) // genuinely multiple partials merged
    val merged = Sketches.hllMerge(partials, Nil)
    val est = merged.select(col("approx_distinct")).head().getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    // lgK=12 -> stderr ~1.04/sqrt(4096) ~= 1.6%; assert within 5 sigma
    val tol = math.max(5 * 0.0163 * exact, 10.0)
    assert(math.abs(est - exact) <= tol,
      s"HLL estimate $est vs exact $exact (tol $tol)")
    // per-group merge equals direct per-group sketching
    val perGroup = Sketches.hllMerge(partials, Seq("l_returnflag"))
    assert(perGroup.count() == partials.count())
  }

  test("KLL quantile partials merge within rank-error bounds") {
    // repartition so per-partition sketching yields several partials
    // per key — the merge path is then genuinely exercised
    val partials = Sketches.kllPartials(li.repartition(4),
      Seq("l_returnflag"), col("l_quantity"))
    assert(partials.count() > partials.select("l_returnflag").distinct.count())
    val merged = Sketches.kllMerge(partials, Nil, Seq(0.5, 0.9))
    val est50 = merged.select(col("q50")).head().getDouble(0)
    val est90 = merged.select(col("q90")).head().getDouble(0)
    val exact = li.stat.approxQuantile("l_quantity", Array(0.5, 0.9), 0.0)
    // k=200 -> normalized rank error ~1.65%; translate via the value
    // spread (quantity is ~uniform 1..50, so 5% rank ~ 2.5 in value)
    assert(math.abs(est50 - exact(0)) <= 3.0,
      s"q50 $est50 vs ${exact(0)}")
    assert(math.abs(est90 - exact(1)) <= 3.0,
      s"q90 $est90 vs ${exact(1)}")
    // keyed merge keeps one row per group with quantile columns
    val perGroup = Sketches.kllMerge(partials, Seq("l_returnflag"),
      Seq(0.5))
    assert(perGroup.columns.contains("q50"))
    assert(perGroup.count() ==
      partials.select("l_returnflag").distinct.count())
  }

  test("theta sketches estimate set intersection and difference") {
    // two overlapping id sets with KNOWN overlap via quantity bands
    val a = li.where(col("l_quantity") <= 30)
    val b = li.where(col("l_quantity") >= 20)
    val sa = Sketches.thetaMerge(
      Sketches.thetaPartials(a.repartition(4), Nil, col("l_partkey")), Nil)
    val sb = Sketches.thetaMerge(
      Sketches.thetaPartials(b.repartition(4), Nil, col("l_partkey")), Nil)
    val ops = Sketches.thetaSetOps(sa, sb, Nil).head()
    val exactI = a.select("l_partkey").intersect(b.select("l_partkey"))
      .count().toDouble
    val exactD = a.select("l_partkey").except(b.select("l_partkey"))
      .count().toDouble
    val estI = ops.getAs[Double]("approx_intersection")
    val estD = ops.getAs[Double]("approx_difference")
    // lgK=12 union/intersection error is a few percent; allow 10% + slack
    assert(math.abs(estI - exactI) <= math.max(0.10 * exactI, 20.0),
      s"intersection $estI vs $exactI")
    assert(math.abs(estD - exactD) <= math.max(0.15 * exactD, 20.0),
      s"difference $estD vs $exactD")
    // union estimate sanity via merge of the two sides
    val both = Sketches.thetaMerge(
      Sketches.thetaPartials(a.unionByName(b), Nil, col("l_partkey")), Nil)
    val exactU = a.select("l_partkey").union(b.select("l_partkey"))
      .distinct().count().toDouble
    val estU = both.head().getAs[Double]("approx_distinct")
    assert(math.abs(estU - exactU) <= math.max(0.10 * exactU, 20.0))
  }

  test("count-min estimates are one-sided and tight for heavy hitters") {
    val sketch = Sketches.countMinBuild(li, col("l_suppkey"), 5, 1024)
    assert(sketch.count() <= 5 * 1024) // bounded regardless of input size
    val candidates = li.select(col("l_suppkey")).distinct().limit(50)
    val est = Sketches.countMinQuery(sketch, candidates, col("l_suppkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_suppkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = li.count()
    est.foreach { case (k, e) =>
      val t = exact(k)
      assert(e >= t, s"CM estimate $e below true $t for $k (must not be)")
      // eps = e/width ~= 2.7/1024; allow 3x slack on the w.h.p. bound
      assert(e <= t + 3 * (math.E / 1024) * n,
        s"CM estimate $e too far above true $t for $k")
    }
  }

  test("count-min sketches merge by cell-wise sum") {
    val half1 = li.where(col("l_orderkey") % 2 === 0)
    val half2 = li.where(col("l_orderkey") % 2 =!= 0)
    val merged = Sketches.countMinMerge(
      Sketches.countMinBuild(half1, col("l_suppkey"), 5, 1024),
      Sketches.countMinBuild(half2, col("l_suppkey"), 5, 1024))
    val whole = Sketches.countMinBuild(li, col("l_suppkey"), 5, 1024)
    assert(merged.except(whole).count() == 0 &&
      whole.except(merged).count() == 0,
      "merged halves must equal the whole-input sketch cell-for-cell")
  }
}
