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

  test("bucketed store: star join on s_key runs with zero exchanges") {
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files
      .createTempDirectory("graft_bucketed").toString
    graft.io.BucketedQuadStore.write(TpchRdf.quads(spark, sf),
      "graft_bucketed_test", buckets = 8, path = Some(loc))
    val store = graft.io.BucketedQuadStore(spark, "graft_bucketed_test")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = store.keyed(P("acctbal"))
        .select(col("s_key"), col("o").as("bal"))
      val b = store.keyed(P("name"))
        .select(col("s_key"), col("o").as("nm"))
      val j = a.join(b, "s_key")
      j.count() // materialize so AQE settles the final plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        "expected a sort-merge join over bucketed scans:\n" + plan)
      assert(!plan.contains("Exchange"),
        "bucketed star join must not shuffle either side:\n" + plan)
      assert(plan.contains("SelectedBucketsCount") ||
        plan.toLowerCase.contains("bucket"),
        "scan must be bucketed:\n" + plan)
      // correctness: same pairs as the plain struct-keyed join
      val quads = TpchRdf.quads(spark, sf)
      def side(p: String) = quads
        .where(col("p")("kind") === graft.model.Term.IriKind &&
          col("p")("lex") === p)
        .select(col("s"), col("o"))
      val expect = side(P("acctbal")).as("x")
        .join(side(P("name")).as("y"), col("x.s") === col("y.s"))
      assert(j.count() == expect.count(),
        "bucketed s_key join must equal the struct equi-join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_test")
    }
  }
}
