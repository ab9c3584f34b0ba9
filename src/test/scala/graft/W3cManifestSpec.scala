package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.testsuite.W3cManifest

class W3cManifestSpec extends AnyFunSuite {

  private def write(dir: java.nio.file.Path, name: String,
      content: String): java.nio.file.Path = {
    val p = dir.resolve(name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p
  }

  test("manifest entries: eval, syntax kinds, paths resolve to the dir") {
    val dir = Files.createTempDirectory("mf")
    val m = write(dir, "manifest.ttl",
      """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
        |@prefix qt: <http://www.w3.org/2001/sw/DataAccess/tests/test-query#> .
        |<> rdf:type mf:Manifest ;
        |  mf:entries ( <#e1> <#s1> <#n1> ) .
        |<#e1> rdf:type mf:QueryEvaluationTest ;
        |  mf:name "eval one" ;
        |  mf:action [ qt:query <q/one.rq> ; qt:data <d/one.nt> ;
        |              qt:graphData <d/g1.nt> ] ;
        |  mf:result <r/one.srx> .
        |<#s1> rdf:type mf:PositiveSyntaxTest11 ;
        |  mf:name "syn ok" ; mf:action <q/ok.rq> .
        |<#n1> rdf:type mf:NegativeSyntaxTest11 ;
        |  mf:name "syn bad" ; mf:action <q/bad.rq> .
        |""".stripMargin)
    val es = W3cManifest.load(m)
    assert(es.map(_.name) == Seq("eval one", "syn ok", "syn bad"))
    val e1 = es.head
    assert(e1.kind == "QueryEvaluationTest")
    assert(e1.query.get == dir.resolve("q/one.rq"))
    assert(e1.data.get == dir.resolve("d/one.nt"))
    assert(e1.graphData ==
      Seq(W3cManifest.GraphRef(dir.resolve("d/g1.nt"), None)))
    assert(e1.result.get == dir.resolve("r/one.srx"))
    // syntax tests: action IS the query file, no data/result
    assert(es(1).kind == "PositiveSyntaxTest11" &&
      es(1).query.get == dir.resolve("q/ok.rq") && es(1).data.isEmpty)
    assert(es(2).kind == "NegativeSyntaxTest11")
  }

  test("mf:include recurses into sub-manifests") {
    val dir = Files.createTempDirectory("mf")
    write(dir, "sub/manifest.ttl",
      """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
        |@prefix qt: <http://www.w3.org/2001/sw/DataAccess/tests/test-query#> .
        |<> rdf:type mf:Manifest ; mf:entries ( <#child> ) .
        |<#child> rdf:type mf:QueryEvaluationTest ; mf:name "child" ;
        |  mf:action [ qt:query <c.rq> ; qt:data <c.nt> ] ;
        |  mf:result <c.tsv> .
        |""".stripMargin)
    val root = write(dir, "manifest.ttl",
      """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
        |<> rdf:type mf:Manifest ; mf:include ( <sub/manifest.ttl> ) .
        |""".stripMargin)
    val es = W3cManifest.load(root)
    assert(es.map(_.name) == Seq("child"))
    assert(es.head.query.get == dir.resolve("sub/c.rq"))
  }

  test("the repo's own fixture manifest lists every fixture dir") {
    val root = new java.io.File(
      getClass.getResource("/sparql").toURI).toPath
    val es = W3cManifest.load(root.resolve("manifest.ttl"))
    // every dir holding an expected results/graph file must be listed
    // as an eval test (graph-result tests expect .nt/.ttl — compared by
    // isomorphism — instead of .tsv)
    val dirs = root.toFile.listFiles()
      .filter(d => d.isDirectory && Seq("expected.tsv", "expected.nt",
        "expected.ttl").exists(f => new java.io.File(d, f).exists()))
      .map(_.getName).toSet
    val evals = es.filter(_.kind == "QueryEvaluationTest").map(_.name).toSet
    assert(evals == dirs,
      s"manifest out of sync with fixture dirs: missing ${dirs -- evals}, stale ${evals -- dirs}")
  }
}
