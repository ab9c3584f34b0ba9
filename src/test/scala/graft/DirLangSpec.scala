package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparqlExpr
import graft.io.{RdfIO, Results}
import graft.model.Term
import graft.parser.SparqlParser

/** RDF 1.2 directional language-tagged strings (rdf:dirLangString,
  * `"lex"@lang--dir`) end to end: the LANG_DIR token in every text
  * parser, the combined-tag storage invariant, the SPARQL 1.2 builtins
  * (LANGDIR, STRLANGDIR, hasLANG, hasLANGDIR, LANG stripping), writer
  * round-trips, and the results formats' dir serialization.
  */
class DirLangSpec extends AnyFunSuite {
  import TestSpark._

  private def lex(c: org.apache.spark.sql.Column) = {
    val r = spark.range(1).select(c.as("t")).head()
    Option(r.getAs[Row]("t")).map(t =>
      (t.getString(1), t.getString(2), t.getString(3)))
  }
  private def s(v: String) = Term.strLit(lit(v))
  private def f(name: String, args: org.apache.spark.sql.Column*) =
    SparqlExpr.fn(name, args)
  private val DL = Term.RdfDirLangString

  test("LANG_DIR token: accepted forms and rejections in NT/Turtle/SPARQL") {
    val q = RdfIO.parseLine(
      """<http://x/s> <http://x/p> "text"@en--ltr .""",
      allowGraph = false).get
    assert(q.o.dt == DL && q.o.lang == "en--ltr")
    // base language still lowercases; subtags survive
    val q2 = RdfIO.parseLine(
      """<http://x/s> <http://x/p> "t"@EN-Latn--rtl .""",
      allowGraph = false).get
    assert(q2.o.dt == DL && q2.o.lang == "en-latn--rtl")
    // the direction is exactly lowercase ltr/rtl
    for (bad <- Seq("@en--LTR", "@en--up", "@en--", "@--ltr", "@en---ltr"))
      assertThrows[Exception](RdfIO.parseLine(
        s"""<http://x/s> <http://x/p> "t"$bad .""", allowGraph = false))
    // Turtle
    val dir = java.nio.file.Files.createTempDirectory("graft_dlt")
    java.nio.file.Files.writeString(dir.resolve("d.ttl"),
      """@prefix : <http://x/> . :s :p "text"@ar--rtl .""")
    val tq = RdfIO.readTurtle(spark, dir.resolve("d.ttl").toString).head()
    assert(tq.getAs[Row]("o").getString(2) == DL &&
      tq.getAs[Row]("o").getString(3) == "ar--rtl")
    // SPARQL text: a dirLang literal is a constant pattern AND a term
    val quads = RdfIO.readTurtle(spark, dir.resolve("d.ttl").toString)
    val hit = SparqlParser.execute(
      """SELECT ?s WHERE { ?s <http://x/p> "text"@ar--rtl }""", quads)
    assert(hit.count() == 1)
    val miss = SparqlParser.execute(
      """SELECT ?s WHERE { ?s <http://x/p> "text"@ar }""", quads)
    assert(miss.count() == 0, "plain @ar must NOT match @ar--rtl")
    assertThrows[Exception](SparqlParser.parse(
      """SELECT ?s WHERE { ?s ?p "x"@en--LTR }"""))
  }

  test("SPARQL 1.2 builtins: LANG/LANGDIR/hasLANG/hasLANGDIR/STRLANGDIR") {
    val d = Term.dirLangLit(lit("text"), lit("en"), lit("ltr"))
    val l = Term.langLit(lit("text"), lit("en"))
    assert(lex(f("LANG", d)).map(_._1) == Some("en"), "LANG strips --dir")
    assert(lex(f("LANG", l)).map(_._1) == Some("en"))
    assert(lex(f("LANGDIR", d)).map(_._1) == Some("ltr"))
    assert(lex(f("LANGDIR", l)).map(_._1) == Some(""))
    assert(lex(f("LANGDIR", s("plain"))).map(_._1) == Some(""))
    assert(lex(f("LANGDIR", Term.iri("http://x"))).isEmpty, "non-literal errs")
    assert(lex(f("hasLANG", d)).map(_._1) == Some("true"))
    assert(lex(f("hasLANG", l)).map(_._1) == Some("true"))
    assert(lex(f("hasLANG", s("p"))).map(_._1) == Some("false"))
    assert(lex(f("hasLANGDIR", d)).map(_._1) == Some("true"))
    assert(lex(f("hasLANGDIR", l)).map(_._1) == Some("false"))
    assert(lex(f("hasLANG", Term.iri("http://x"))).isEmpty)
    // constructor
    assert(lex(f("STRLANGDIR", s("t"), s("EN"), s("rtl"))) ==
      Some(("t", DL, "en--rtl")))
    assert(lex(f("STRLANGDIR", s("t"), s("en"), s("up"))).isEmpty)
    assert(lex(f("STRLANGDIR", s("t"), s("en--x"), s("ltr"))).isEmpty)
    // STRLANG cannot smuggle a direction through its tag
    assert(lex(f("STRLANG", s("t"), s("en--ltr"))).isEmpty)
    // accessors agree with the constructor
    assert(lex(f("DATATYPE", d)).map(_._1) == Some(DL))
    assert(lex(f("STR", d)).map(_._1) == Some("text"))
    // string fns operate on dirLang and preserve the full tag
    assert(lex(f("STRLEN", d)).map(_._1) == Some("4"))
    assert(lex(f("UCASE", d)) == Some(("TEXT", DL, "en--ltr")))
    assert(lex(f("SUBSTR", d, Term.intLit(lit("1")), Term.intLit(lit("2"))))
      == Some(("te", DL, "en--ltr")))
    // CONCAT: direction survives only when EVERY arg carries it
    val d2 = Term.dirLangLit(lit("!"), lit("en"), lit("ltr"))
    assert(lex(f("CONCAT", d, d2)) == Some(("text!", DL, "en--ltr")))
    assert(lex(f("CONCAT", d, l)).map(r => (r._1, r._2)) ==
      Some(("texttext", Term.XsdString)), "mixed dir degrades to simple")
    // LANGMATCHES sees the base language
    assert(lex(f("LANGMATCHES", f("LANG", d), s("en"))).map(_._1) ==
      Some("true"))
    // term equality: the three forms are pairwise distinct
    assert(lex(f("sameTerm", d, l)).map(_._1) == Some("false"))
    val dr = Term.dirLangLit(lit("text"), lit("en"), lit("rtl"))
    assert(lex(f("sameTerm", d, dr)).map(_._1) == Some("false"))
  }

  test("writers round-trip @en--ltr (NT/NQ/Turtle/TriG/TSV/JSON-LD); " +
      "RDF/XML rejects") {
    import spark.implicits._
    val nq = """<http://x/s> <http://x/p> "text"@en--ltr .
               |<http://x/s> <http://x/p> "نص"@ar--rtl <http://x/g> .
               |<http://x/s> <http://x/p> "plain"@en .""".stripMargin
    val in = java.nio.file.Files.createTempDirectory("graft_dlw")
    java.nio.file.Files.writeString(in.resolve("d.nq"), nq)
    val quads = RdfIO.readNQuads(spark, in.resolve("d.nq").toString)
    for (fmt <- Seq("nq", "trig")) {
      val out = java.nio.file.Files.createTempDirectory(s"graft_dlw_$fmt")
      RdfIO.write(quads, out.toString, fmt)
      val back = RdfIO.read(spark, out.toString + "/part-*", fmt)
      assert(back.except(quads).count() == 0 &&
        quads.except(back).count() == 0, s"$fmt round-trip lossless")
    }
    // JSON-LD: the writer emits the split @language/@direction form;
    // reading under rdfDirection=native restores dirLangString (the
    // default read mode drops direction, like any JSON-LD 1.0 consumer)
    val outLd = java.nio.file.Files.createTempDirectory("graft_dlw_ld")
    RdfIO.write(quads, outLd.toString, "jsonld")
    val backLd = RdfIO.readJsonLd(spark, outLd.toString + "/part-*",
      Some("native"))
    assert(backLd.except(quads).count() == 0 &&
      quads.except(backLd).count() == 0, "jsonld native round-trip lossless")
    // triple formats round-trip the default-graph slice
    val triples = quads.where(col("g")("kind") === Term.DefaultGraphKind)
    for (fmt <- Seq("nt", "ttl")) {
      val out = java.nio.file.Files.createTempDirectory(s"graft_dlw_$fmt")
      RdfIO.write(quads, out.toString, fmt)
      val back = RdfIO.read(spark, out.toString + "/part-*", fmt)
        .select("s", "p", "o")
      assert(back.except(triples.select("s", "p", "o")).count() == 0 &&
        triples.select("s", "p", "o").except(back).count() == 0,
        s"$fmt round-trip lossless")
    }
    // JSON-LD emits the SPLIT form, never the combined tag
    val ld = graft.io.JsonLdWriter.jsonLdString(quads)
    assert(ld.contains(""""@direction":"ltr"""") && !ld.contains("--ltr"), ld)
    // RDF/XML cannot express direction: loud error, not silent dropping
    val ex = intercept[Exception] {
      val out = java.nio.file.Files.createTempDirectory("graft_dlw_rdf")
      RdfIO.write(quads, out.toString, "rdf")
    }
    assert(ex.getMessage != null)
  }

  test("results formats carry direction (JSON dir member, XML its:dir)") {
    val sol = spark.range(1).select(
      Term.dirLangLit(lit("text"), lit("en"), lit("ltr")).as("x"),
      Term.langLit(lit("b"), lit("fr")).as("y"))
    val json = Results.toJson(sol)
    assert(json.contains(""""xml:lang":"en","dir":"ltr""""), json)
    assert(!json.contains("en--ltr"), json)
    val backJ = Results.fromJson(spark, json).head()
    assert(backJ.getAs[Row]("x").getString(2) == DL &&
      backJ.getAs[Row]("x").getString(3) == "en--ltr")
    assert(backJ.getAs[Row]("y").getString(2) == Term.RdfLangString)
    val xml = Results.toXml(sol)
    assert(xml.contains("""xml:lang="en" its:dir="ltr""""), xml)
    assert(xml.contains("xmlns:its="), xml)
    assert(!xml.contains("en--ltr"), xml)
    val backX = Results.fromXml(spark, xml).head()
    assert(backX.getAs[Row]("x").getString(2) == DL &&
      backX.getAs[Row]("x").getString(3) == "en--ltr")
    // TSV uses the N-Triples token: combined tag, parsed back exactly
    val tsv = Results.toTsv(sol)
    assert(tsv.contains("@en--ltr"), tsv)
    val backT = Results.fromTsv(spark, tsv).head()
    assert(backT.getAs[Row]("x").getString(2) == DL &&
      backT.getAs[Row]("x").getString(3) == "en--ltr")
    // invalid inbound directions are rejected, not mangled
    assertThrows[Exception](Results.fromJson(spark,
      """{"head":{"vars":["x"]},"results":{"bindings":[
        |{"x":{"type":"literal","value":"t","xml:lang":"en","dir":"up"}}
        |]}}""".stripMargin))
    assertThrows[Exception](Results.fromJson(spark,
      """{"head":{"vars":["x"]},"results":{"bindings":[
        |{"x":{"type":"literal","value":"t","dir":"ltr"}}]}}""".stripMargin))
  }

  test("JSON-LD rdfDirection=native maps @direction to dirLangString") {
    import graft.io.JsonLdParser
    val rows = new JsonLdParser(
      """{"@id": "http://x/s",
        | "http://x/p": {"@value": "t", "@language": "EN",
        |                "@direction": "rtl"}}""".stripMargin,
      Some("native")).parse()
    assert(rows.size == 1 && rows.head.o.dt == DL &&
      rows.head.o.lang == "en--rtl")
    // direction without language has no dirLangString form
    assertThrows[Exception](new JsonLdParser(
      """{"http://x/p": {"@value": "t", "@direction": "rtl"}}""",
      Some("native")).parse())
    // and the writer's split form reads back losslessly under native
    import spark.implicits._
    val quads = spark.createDataset(rows).toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
    val out = java.nio.file.Files.createTempDirectory("graft_dlnat")
    graft.io.JsonLdWriter.write(quads, out.toString)
    val back = RdfIO.readJsonLd(spark, out.toString + "/part-*",
      Some("native"))
    assert(back.except(quads).count() == 0 &&
      quads.except(back).count() == 0)
  }

  test("dirLang terms survive quoted triples and GROUP/DISTINCT") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dlq")
    java.nio.file.Files.writeString(dir.resolve("d.ttl"),
      """@prefix : <http://x/> .
        |:s :p "a"@en--ltr , "a"@en , "a"@en--rtl , "a"@en--ltr .
        |<< :s :p "a"@en--ltr >> :src :w .""".stripMargin)
    val quads = RdfIO.readTurtle(spark, dir.resolve("d.ttl").toString)
    // four distinct terms collapse to three under DISTINCT
    val n = SparqlParser.execute(
      "SELECT DISTINCT ?o WHERE { ?s <http://x/p> ?o }", quads).count()
    assert(n == 3, s"en / en--ltr / en--rtl are distinct terms, got $n")
    // the quoted-triple pattern matches the identical dirLang object
    val star = SparqlParser.execute(
      """SELECT ?w WHERE { << ?s <http://x/p> "a"@en--ltr >> <http://x/src> ?w }""",
      quads)
    assert(star.count() == 1)
    val none = SparqlParser.execute(
      """SELECT ?w WHERE { << ?s <http://x/p> "a"@en >> <http://x/src> ?w }""",
      quads)
    assert(none.count() == 0)
  }
}
