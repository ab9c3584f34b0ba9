package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra.Algebra._
import graft.exec.Translator
import graft.io.{DfQuadSource, PartitionedQuadStore, TpchRdf}
import graft.io.TpchRdf.P

class QuadStoreSpec extends AnyFunSuite {
  import TestSpark._

  lazy val storePath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_store").toString
    PartitionedQuadStore.write(TpchRdf.quads(spark, sf), p)
    p
  }

  val gp: GraphPattern = Filter(
    EFn(">", EVar("b"), ELit("5000", graft.model.Term.XsdDecimal)),
    Bgp(
      TriplePattern(V("c"), I(P("inNation")), V("n")),
      TriplePattern(V("c"), I(P("acctbal")), V("b")),
      TriplePattern(V("c"), I(P("name")), V("cname"))))

  test("partitioned store returns the same solutions as the DF store") {
    val store = PartitionedQuadStore(spark, storePath)
    val viaStore = Translator.translate(gp, store, Translator.DefaultG).df
    val viaDf = Translator.translate(gp,
      DfQuadSource(TpchRdf.quads(spark, sf)), Translator.DefaultG).df
    assert(viaStore.count() == viaDf.count())
    assert(viaStore.except(viaDf).isEmpty && viaDf.except(viaStore).isEmpty)
  }

  test("constant-predicate scan prunes partitions (PartitionFilters)") {
    val store = PartitionedQuadStore(spark, storePath)
    val scan = store.byPredicate(P("acctbal"))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("p_key"),
      s"expected partition pruning on p_key in:\n$physical")
    // the filter must be a partition-level equality, not a data filter
    assert(physical.contains("p_key = acctbal") ||
      physical.matches("(?s).*PartitionFilters.*acctbal.*"),
      s"p_key equality must appear as a partition filter in:\n$physical")
    // and the store layout is genuinely vertical: one dir per predicate
    val dirs = new java.io.File(storePath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p_key="))
    assert(dirs.length > 5, s"expected per-predicate dirs, got ${dirs.length}")
  }

  test("predicate partition keys are readable local names") {
    assert(PartitionedQuadStore.key(P("acctbal")) == "acctbal")
    assert(PartitionedQuadStore.key(
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type") == "type")
  }
}
