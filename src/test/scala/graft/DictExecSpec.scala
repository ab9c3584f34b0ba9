package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Dictionary-encoded execution parity: with -Dgraft.dictExec=true the
  * BGP join chain runs on 128-bit term ids with decode-at-boundary, and
  * must produce bit-identical results to the struct path on every
  * BGP-heavy gate query.
  */
class DictExecSpec extends AnyFunSuite {
  import TestSpark._

  private val bgpHeavy = Seq(
    "sp1_bgp_filter", "sp4_minus", "sp5_exists", "sp6_values", "sp7_agg",
    "sp11_graph", "sp16_orderby_slice", "sp19_subselect", "sp25_groupconcat",
    "pq1_select_filter", "pq3_group_having", "pq10_subselect")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("dictExec results match struct-path results on BGP-heavy queries") {
    for (q <- bgpHeavy) {
      System.clearProperty("graft.dictExec")
      val structPath = rows(q)
      System.setProperty("graft.dictExec", "true")
      val idPath =
        try rows(q)
        finally System.clearProperty("graft.dictExec")
      assert(idPath == structPath,
        s"$q diverged under dictExec: ${idPath.diff(structPath).take(3)} vs " +
          s"${structPath.diff(idPath).take(3)}")
    }
  }

  test("id-space joins shuffle ids, not term structs") {
    import graft.algebra.Algebra._
    import graft.io.TpchRdf.P
    System.setProperty("graft.dictExec", "true")
    try {
      val gp = Bgp(
        TriplePattern(V("c"), I(P("inNation")), V("n")),
        TriplePattern(V("n"), I(P("name")), V("nn")),
        TriplePattern(V("c"), I(P("acctbal")), V("b")))
      val sol = graft.exec.Translator.translate(
        gp, graft.io.TpchRdf.quads(spark, sf))
      // all three vars decode back to terms at the boundary
      assert(sol.df.columns.sorted.toSeq == Seq("b", "c", "n", "nn"))
      val r = sol.df.head()
      assert(r.getAs[Row]("nn").getString(1) != null) // lexical form present
    } finally System.clearProperty("graft.dictExec")
  }
}
