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

  test("Turtle reader: prefixes, abbreviations, bnode lists, shorthand") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl")
    java.nio.file.Files.writeString(dir.resolve("data.ttl"),
      """@prefix ex: <http://e/> .
        |@base <http://base/> .
        |# a comment
        |ex:a a ex:Thing ;
        |   ex:name "Ann"@en , "Anne" ;
        |   ex:size 42 ;
        |   ex:score 3.5 ;
        |   ex:big 1.0E6 ;
        |   ex:ok true ;
        |   ex:knows [ ex:name "Bob" ] .
        |<rel> ex:p ex:a .
        |_:b1 ex:p "x"^^<http://www.w3.org/2001/XMLSchema#token> .
        |""".stripMargin)
    val df = RdfIO.read(spark, dir.toString + "/data.ttl", "ttl")
    val rows = df.collect()
    assert(rows.length == 11)
    def lexes(p: String) = rows.filter(_.getAs[org.apache.spark.sql.Row]("p")
      .getString(1) == s"http://e/$p")
      .map(_.getAs[org.apache.spark.sql.Row]("o"))
    assert(lexes("name").map(_.getString(1)).toSet == Set("Ann", "Anne", "Bob"))
    assert(lexes("size").head.getString(2).endsWith("integer"))
    assert(lexes("score").head.getString(2).endsWith("decimal"))
    assert(lexes("big").head.getString(2).endsWith("double"))
    assert(lexes("ok").head.getString(1) == "true")
    // @base resolution for relative IRIs
    assert(rows.exists(_.getAs[org.apache.spark.sql.Row]("s")
      .getString(1) == "http://base/rel"))
    // rdf:type via 'a'
    assert(rows.exists(_.getAs[org.apache.spark.sql.Row]("p")
      .getString(1).endsWith("#type")))
  }

  test("format facade dispatches and rejects unknown formats") {
    intercept[IllegalArgumentException](RdfIO.read(spark, "/tmp/x", "rdfxml"))
  }
}
