package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{RdfIO, TpchRdf}

class RdfIOSpec extends AnyFunSuite {
  import TestSpark._

  test("N-Triples line parser handles escapes, datatypes, lang tags") {
    val q = RdfIO.parseLine(
      """<http://e/s> <http://e/p> "a\"b\ncé"^^<http://www.w3.org/2001/XMLSchema#string> .""",
      allowGraph = false).get
    assert(q.o.lex == "a\"b\ncé")
    val l = RdfIO.parseLine(
      """_:b1 <http://e/p> "hola"@es-419 .""", allowGraph = false).get
    assert(l.s.kind == 1 && l.o.lang == "es-419")
    assert(RdfIO.parseLine("# comment", allowGraph = false).isEmpty)
    assert(RdfIO.parseLine("   ", allowGraph = false).isEmpty)
    val nq = RdfIO.parseLine(
      """<http://e/s> <http://e/p> "x" <http://e/g> .""",
      allowGraph = true).get
    assert(nq.g.lex == "http://e/g")
  }

  test("quads -> N-Quads -> quads roundtrip is lossless") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nq").toString
    val quads = TpchRdf.quads(spark, sf)
    RdfIO.writeNQuads(quads, dir)
    val back = RdfIO.readNQuads(spark, dir)
    assert(back.count() == quads.count())
    assert(back.except(quads).count() == 0 &&
      quads.except(back).count() == 0, "roundtrip must be lossless")
  }

  test("format facade dispatches and rejects unknown formats") {
    intercept[IllegalArgumentException](RdfIO.read(spark, "/tmp/x", "turtle"))
  }
}
