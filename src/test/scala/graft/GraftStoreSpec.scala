package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra.Algebra.{I, L}
import graft.model.Term

/** The Store façade (oxigraph Store / pyoxigraph parity — SURVEY §3.1):
  * load/query/update/dump/scan as one user-facing object, immutable
  * batch-dataset semantics instead of transactions.
  */
class GraftStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): java.nio.file.Path =
    Files.createTempDirectory("graftstore")

  private def sampleStore(): GraftStore = {
    val d = tmpDir()
    val nt = d.resolve("data.nt")
    Files.writeString(nt,
      """<http://x/a> <http://x/p> <http://x/b> .
        |<http://x/b> <http://x/p> <http://x/c> .
        |<http://x/a> <http://x/name> "alpha" .
        |""".stripMargin)
    GraftStore.fromFile(spark, nt.toString, "nt")
  }

  test("fromFile + query + size") {
    val st = sampleStore()
    assert(st.size == 3 && !st.isEmpty)
    val rows = st.query(
      "SELECT ?o WHERE { <http://x/a> <http://x/p> ?o }")
      .select(col("o")("lex")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("http://x/b"))
  }

  test("update returns a new store; original unchanged") {
    val st = sampleStore()
    val st2 = st.update(
      "INSERT DATA { <http://x/d> <http://x/p> <http://x/e> }")
    assert(st2.size == 4 && st.size == 3)
  }

  test("load into a named graph; namedGraphs reports it") {
    val d = tmpDir()
    val extra = d.resolve("extra.nt")
    Files.writeString(extra, "<http://y/s> <http://y/q> \"v\" .\n")
    val st = sampleStore().load(extra.toString, Some("urn:g:x"))
    assert(st.namedGraphs == Seq("urn:g:x"))
    val got = st.query(
      "SELECT ?s WHERE { GRAPH <urn:g:x> { ?s <http://y/q> ?v } }")
      .select(col("s")("lex")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("http://y/s"))
  }

  test("dumpNQuads roundtrip") {
    val st = sampleStore()
    val out = tmpDir().resolve("dump").toString
    st.dumpNQuads(out)
    val back = GraftStore(graft.io.RdfIO.readNQuads(spark, out))
    assert(back.size == st.size)
  }

  test("save/open predicate-partitioned roundtrip") {
    val st = sampleStore()
    val out = tmpDir().resolve("store").toString
    st.save(out)
    val back = GraftStore.open(spark, out)
    assert(back.size == st.size)
    val rows = back.query(
      "SELECT ?n WHERE { ?s <http://x/name> ?n }")
      .select(col("n")("lex")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("alpha"))
  }

  test("quadsForPattern bound-prefix scan") {
    val st = sampleStore()
    assert(st.quadsForPattern(s = Some(I("http://x/a"))).count() == 2)
    assert(st.quadsForPattern(p = Some(I("http://x/name")),
      o = Some(L("alpha", Term.XsdString))).count() == 1)
    assert(st.quadsForPattern().count() == 3)
  }

  test("explain shows algebra and Spark plan") {
    val st = sampleStore()
    val e = st.explain("SELECT ?o WHERE { <http://x/a> <http://x/p> ?o }")
    assert(e.contains("== SPARQL algebra ==") && e.contains("Project"))
    assert(e.contains("== Spark plan ==") && e.contains("Scan"))
  }
}
