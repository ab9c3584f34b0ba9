package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.SparqlExpr
import graft.io.{Results, TpchRdf}
import graft.model.Term
import graft.parser.SparqlParser

class ResultsSpec extends AnyFunSuite {
  import TestSpark._

  lazy val sols = SparqlParser.execute(
    s"""PREFIX : <${TpchRdf.ns}>
       SELECT ?rn ?l WHERE { ?r :name ?rn ; :label ?l .
         FILTER(LANGMATCHES(LANG(?l), "de")) } ORDER BY ?rn""",
    TpchRdf.quads(spark, sf))

  test("SPARQL JSON results format") {
    val json = Results.toJson(sols)
    assert(json.startsWith("""{"head":{"vars":["rn","l"]}"""))
    assert(json.contains(""""type":"literal""""))
    assert(json.contains(""""xml:lang":"de""""))
    // 5 regions -> 5 bindings
    assert("\"rn\":".r.findAllIn(json).length == 5)
  }

  test("CSV and TSV results formats") {
    val csv = Results.toCsv(sols)
    assert(csv.startsWith("rn,l\r\n"))
    assert(csv.contains("AFRICA,africa"))
    val tsv = Results.toTsv(sols)
    assert(tsv.startsWith("?rn\t?l\r\n"))
    assert(tsv.contains("\"AFRICA\"\t\"africa\"@de"))
  }

  test("SPARQL XML results format") {
    val xml = Results.toXml(sols)
    assert(xml.startsWith(
      """<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#""""))
    assert(xml.contains("""<variable name="rn"/>"""))
    assert(xml.contains("""<literal xml:lang="de">africa</literal>"""))
    assert("<result>".r.findAllIn(xml).length == 5)
    // escaping: no raw ampersands/angles survive in content
    val inner = xml.replaceAll("<[^>]+>", "")
    assert(!inner.contains("<") && !inner.contains(">"))
  }

  test("JSON results roundtrip: toJson -> fromJson is lossless") {
    val back = Results.fromJson(spark, Results.toJson(sols))
    assert(back.columns.toSeq == sols.columns.toSeq)
    assert(back.count() == sols.count())
    assert(back.except(sols).count() == 0 &&
      sols.except(back).count() == 0)
  }

  test("fromXml rejects a literal with both xml:lang and datatype " +
      "(wave 13)") {
    intercept[Exception](Results.fromXml(spark,
      """<?xml version="1.0"?>
        |<sparql xmlns="http://www.w3.org/2005/sparql-results#">
        |<head><variable name="a"/></head><results><result>
        |<binding name="a"><literal xml:lang="en"
        |  datatype="http://x/dt">v</literal></binding>
        |</result></results></sparql>""".stripMargin))
  }

  test("fromJson rejects malformed SELECT documents (wave 9)") {
    // missing results.bindings is a malformed response, not 0 rows
    intercept[Exception](
      Results.fromJson(spark, """{"head":{"vars":["x"]}}"""))
    intercept[Exception](Results.fromJson(spark,
      """{"head":{"vars":["x"]},"results":{"bindings":[
        {"x":{"type":"wat","value":"v"}}]}}"""))
  }

  test("TSV results roundtrip: toTsv -> fromTsv is lossless") {
    // include an unbound cell via a query with OPTIONAL-shaped nulls
    val withNull = sols.unionByName(
      sols.limit(1).select(col("rn"),
        SparqlExpr.nullTerm.as("l")))
    val back = Results.fromTsv(spark, Results.toTsv(withNull))
    assert(back.columns.toSeq == withNull.columns.toSeq)
    assert(back.count() == withNull.count())
    assert(back.except(withNull).count() == 0 &&
      withNull.except(back).count() == 0)
  }

  test("TSV cells accept RDF 1.2 triple-term tokens <<( )>>") {
    val tsv = "?x\n<<( <http://x/s> <http://x/p> \"v\" )>>\n"
    val df = Results.fromTsv(spark, tsv)
    val t = df.head().getAs[org.apache.spark.sql.Row]("x")
    assert(t.getByte(0) == Term.QuotedKind.toByte)
    // identical to the CG spelling
    val cg = Results.fromTsv(spark,
      "?x\n<< <http://x/s> <http://x/p> \"v\" >>\n")
    assert(t == cg.head().getAs[org.apache.spark.sql.Row]("x"))
  }

  test("XML results roundtrip: toXml -> fromXml is lossless") {
    val withNull = sols.unionByName(
      sols.limit(1).select(col("rn"),
        SparqlExpr.nullTerm.as("l")))
    val back = Results.fromXml(spark, Results.toXml(withNull))
    assert(back.columns.toSeq == withNull.columns.toSeq)
    assert(back.count() == withNull.count())
    assert(back.except(withNull).count() == 0 &&
      withNull.except(back).count() == 0)
  }

  test("CSV results roundtrip: toCsv -> fromCsv (lossy to plain literals)") {
    val back = Results.fromCsv(spark, Results.toCsv(sols))
    assert(back.columns.toSeq == sols.columns.toSeq)
    assert(back.count() == sols.count())
    // CSV keeps lexical forms only — compare against the lexical
    // projection of the source, as plain literals (spec §4 lossiness)
    val lex = sols.select(sols.columns.map(c =>
      struct(lit(Term.LiteralKind).cast("byte").as("kind"),
        col(c)("lex").as("lex"), lit(Term.XsdString).as("dt"),
        lit(null).cast("string").as("lang")).as(c)): _*)
    assert(back.except(lex).count() == 0 && lex.except(back).count() == 0)
  }

  test("fromCsv: RFC 4180 framing — quotes, embedded newlines, unbound") {
    val csv = "a,b\r\n" +
      "plain,\"with,comma\"\r\n" +
      "\"line1\nline2\",\r\n" +          // multi-line cell; unbound b
      "\"he said \"\"hi\"\"\",\"\"\r\n"  // escaped quotes; quoted empty
    val df = Results.fromCsv(spark, csv)
    val rows = df.orderBy(col("a")("lex")).collect()
    assert(rows.length == 3)
    def lex(r: org.apache.spark.sql.Row, i: Int) =
      Option(r.getAs[org.apache.spark.sql.Row](i)).map(_.getString(1))
    assert(rows.exists(r => lex(r, 0).contains("with,comma") ||
      lex(r, 1).contains("with,comma")))
    assert(lex(rows(1), 0).contains("line1\nline2") && rows(1).isNullAt(1))
    assert(lex(rows(0), 0).contains("he said \"hi\"") &&
      lex(rows(0), 1).contains("")) // quoted "" = empty literal, bound
    intercept[IllegalArgumentException] {
      Results.fromCsv(spark, "a,b\r\n\"unterminated")
    }
  }

  test("ASK boolean results: all four formats write and read back") {
    val ask = SparqlParser.execute(
      s"PREFIX : <${TpchRdf.ns}> ASK { ?r :name ?rn }",
      TpchRdf.quads(spark, sf))
    assert(Results.toJson(ask) == """{"head":{},"boolean":true}""")
    assert(Results.toXml(ask).contains("<boolean>true</boolean>"))
    assert(Results.toCsv(ask) == "true\r\n")
    assert(Results.toTsv(ask) == "true\r\n")
    for (back <- Seq(
        Results.fromJson(spark, Results.toJson(ask)),
        Results.fromXml(spark, Results.toXml(ask)),
        Results.fromCsv(spark, Results.toCsv(ask)),
        Results.fromTsv(spark, Results.toTsv(ask)))) {
      assert(back.columns.toSeq == Seq("__ask"))
      assert(back.head.getAs[org.apache.spark.sql.Row](0)
        .getString(1) == "true")
      // and a round-tripped boolean re-serializes as a boolean document
      assert(Results.toCsv(back) == "true\r\n")
    }
  }

  test("fromXml handles bnode/typed terms and ASK booleans") {
    val xml = """<?xml version="1.0"?>
      <sparql xmlns="http://www.w3.org/2005/sparql-results#">
        <head><variable name="a"/><variable name="b"/></head>
        <results>
          <result><binding name="a"><uri>http://x/1</uri></binding></result>
          <result>
            <binding name="a"><bnode>n1</bnode></binding>
            <binding name="b"><literal
              datatype="http://www.w3.org/2001/XMLSchema#integer">5</literal>
            </binding>
          </result>
        </results>
      </sparql>"""
    val df = Results.fromXml(spark, xml).orderBy(col("a")("lex"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[org.apache.spark.sql.Row]("a")
      .getByte(0) == Term.IriKind.toByte)
    assert(rows(0).isNullAt(1))
    assert(rows(1).getAs[org.apache.spark.sql.Row]("a")
      .getByte(0) == Term.BlankKind.toByte)
    assert(rows(1).getAs[org.apache.spark.sql.Row]("b")
      .getString(2) == Term.XsdInteger)
    val ask = Results.fromXml(spark,
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">
           <head/><boolean>true</boolean></sparql>""")
    assert(ask.columns.toSeq == Seq("__ask"))
    assert(ask.head.getAs[org.apache.spark.sql.Row](0).getString(1) == "true")
  }

  test("JSON/XML/TSV roundtrip quoted triples (RDF-star results)") {
    val q = SparqlExpr.fn("TRIPLE", Seq(
      graft.model.Term.iri("http://x/s"), graft.model.Term.iri("http://x/p"),
      graft.model.Term.typedLit(lit("5"), Term.XsdInteger)))
    val df = spark.range(1).select(q.as("t"),
      graft.model.Term.strLit(lit("note")).as("n"))
    for (roundtrip <- Seq(
      (d: org.apache.spark.sql.DataFrame) =>
        Results.fromJson(spark, Results.toJson(d)),
      (d: org.apache.spark.sql.DataFrame) =>
        Results.fromXml(spark, Results.toXml(d)),
      (d: org.apache.spark.sql.DataFrame) =>
        Results.fromTsv(spark, Results.toTsv(d)))) {
      val back = roundtrip(df)
      assert(back.count() == 1)
      val t = back.head.getAs[org.apache.spark.sql.Row]("t")
      assert(t.getByte(0) == Term.QuotedKind.toByte)
      assert(t.getString(1) ==
        "<< <http://x/s> <http://x/p> \"5\"^^<" + Term.XsdInteger + "> >>")
    }
  }

  test("TSV 1.2 edition renders quoted terms as <<( )>> triple terms") {
    val q = SparqlExpr.fn("TRIPLE", Seq(
      graft.model.Term.iri("http://x/s"), graft.model.Term.iri("http://x/p"),
      SparqlExpr.fn("TRIPLE", Seq(
        graft.model.Term.iri("http://x/a"), graft.model.Term.iri("http://x/b"),
        graft.model.Term.iri("http://x/c")))))
    val df = spark.range(1).select(q.as("t"))
    val tsv = Results.toTsv12(df)
    assert(tsv.contains(
      "<<( <http://x/s> <http://x/p> <<( <http://x/a> <http://x/b> " +
        "<http://x/c> )>> )>>"), tsv)
    assert(!tsv.matches("(?s).*<<[^(].*"), s"CG token leaked: $tsv")
    // the TSV parser reads both spellings back to the same term
    val back = Results.fromTsv(spark, tsv)
    val t = back.head.getAs[org.apache.spark.sql.Row]("t")
    assert(t.getByte(0) == Term.QuotedKind.toByte)
    assert(Results.fromTsv(spark, Results.toTsv(df)).head
      .getAs[org.apache.spark.sql.Row]("t") == t)
  }

  test("wave 27: TSV 1.2 roundtrips hostile terms inside triple terms") {
    // quoted triples whose components carry TSV-hostile content — tab,
    // newline, quote, backslash literals, dirLang tags, datatypes,
    // bnodes — must survive toTsv12 -> fromTsv as the same term, and
    // the 1.2 cell must never leak a CG token
    def lit(lex: String, dt: String = null, lang: String = null) =
      org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit(Term.LiteralKind.toByte)
          .as("kind"),
        org.apache.spark.sql.functions.lit(lex).as("lex"),
        (if (dt == null) org.apache.spark.sql.functions
          .lit(null).cast("string")
         else org.apache.spark.sql.functions.lit(dt)).as("dt"),
        (if (lang == null) org.apache.spark.sql.functions
          .lit(null).cast("string")
         else org.apache.spark.sql.functions.lit(lang)).as("lang"))
    val hostiles = Seq(
      lit("tab\there"), lit("nl\nthere"), lit("q\"uote"),
      lit("back\\slash"), lit("mixed\t\"x\\\n"),
      lit("dir", Term.RdfDirLangString, "ar--rtl"),
      lit("5", Term.XsdInteger))
    for (h <- hostiles) {
      val q = SparqlExpr.fn("TRIPLE", Seq(
        graft.model.Term.iri("http://x/s"),
        graft.model.Term.iri("http://x/p"), h))
      // once plain, once nested one level deeper
      val qq = SparqlExpr.fn("TRIPLE", Seq(
        graft.model.Term.iri("http://x/a"),
        graft.model.Term.iri("http://x/b"), q))
      for (term <- Seq(q, qq)) {
        val df = spark.range(1).select(term.as("t"))
        val tsv = Results.toTsv12(df)
        assert(!tsv.matches("(?s).*<<[^(].*"), s"CG token leaked: $tsv")
        val back = Results.fromTsv(spark, tsv)
          .head.getAs[org.apache.spark.sql.Row]("t")
        val orig = df.head.getAs[org.apache.spark.sql.Row]("t")
        assert(back == orig, s"hostile 1.2 roundtrip drifted:\n$tsv\n" +
          s"orig=$orig\nback=$back")
      }
    }
  }

  test("fromJson handles unbound vars and typed/bnode terms") {
    val json = """{"head":{"vars":["a","b"]},"results":{"bindings":[
      {"a":{"type":"uri","value":"http://x/1"}},
      {"a":{"type":"bnode","value":"n1"},
       "b":{"type":"literal","value":"5",
            "datatype":"http://www.w3.org/2001/XMLSchema#integer"}}]}}"""
    val df = Results.fromJson(spark, json).orderBy(col("a")("lex"))
    val rows = df.collect()
    assert(rows.length == 2)
    val r0 = rows(0).getAs[org.apache.spark.sql.Row]("a")
    assert(r0.getByte(0) == Term.IriKind.toByte &&
      r0.getString(1) == "http://x/1")
    assert(rows(0).isNullAt(1)) // unbound b
    val r1b = rows(1).getAs[org.apache.spark.sql.Row]("b")
    assert(r1b.getString(2) == Term.XsdInteger)
  }

  test("custom function registry (with_custom_function parity)") {
    SparqlExpr.registerFunction("urn:graft:shout",
      args => SparqlExpr.fn("UCASE", args))
    val c = SparqlExpr.fn("urn:graft:shout", Seq(Term.strLit(lit("abc"))))
    val r = spark.range(1).select(c("lex")).head.getString(0)
    assert(r == "ABC")
    intercept[IllegalArgumentException](SparqlExpr.fn("urn:none", Nil))
  }

  test("results roundtrip fuzz: adversarial terms survive JSON, XML, " +
      "and TSV byte-exactly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // escaping-hostile lexical forms: framing quotes, backslashes,
    // newlines/tabs/CRs (XML line-end normalization!), markup chars,
    // astral unicode, number/keyword look-alikes, term look-alikes
    val hostile = Seq("", "\"", "\\", "\n", "\t", "\r\n", "a\"b\\c",
      "line1\nline2", "col\tcol", "<x>&'y'", "中𐀀", "1", "true",
      "1.5e3", "\"\"\"", "'''", " padded ", "_:fake", "?var", "a,b")
    val genLit: Gen[Row] = for {
      lex <- Gen.oneOf(hostile)
      shape <- Gen.choose(0, 3)
    } yield shape match {
      case 0 => Row(Term.LiteralKind.toByte, lex, Term.XsdString, null)
      case 1 => Row(Term.LiteralKind.toByte, lex, "http://dt/x", null)
      case 2 => Row(Term.LiteralKind.toByte, lex, Term.RdfLangString, "en")
      case _ =>
        Row(Term.LiteralKind.toByte, lex, Term.RdfLangString, "en-us")
    }
    val genIri: Gen[Row] = Gen.oneOf("http://x/α", "http://x/a?b=c&d=e",
      "urn:uuid:1-2", "http://x/%20esc", "http://x/𐀀")
      .map(i => Row(Term.IriKind.toByte, i, null, null))
    val genBnode: Gen[Row] = Gen.oneOf("b0", "b1", "x-1.y")
      .map(b => Row(Term.BlankKind.toByte, b, null, null))
    val genTerm: Gen[Row] = Gen.frequency(5 -> genLit, 2 -> genIri,
      1 -> genBnode, 1 -> Gen.const(null: Row))
    val schema = StructType(Seq(
      StructField("a", Term.schema), StructField("b", Term.schema)))
    val prop = Prop.forAllNoShrink(
      Gen.chooseNum(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genTerm, genTerm)))) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (x, y) => Row(x, y) }, 2), schema)
      def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
        d.select("a", "b").collect().map(_.toString).sorted.toSeq
      val base = canon(df)
      val viaJson = canon(Results.fromJson(spark, Results.toJson(df)))
      val viaXml = canon(Results.fromXml(spark, Results.toXml(df)))
      val viaTsv = canon(Results.fromTsv(spark, Results.toTsv(df)))
      if (viaJson != base) println(s"JSON roundtrip: $base -> $viaJson")
      if (viaXml != base) println(s"XML roundtrip: $base -> $viaXml")
      if (viaTsv != base) println(s"TSV roundtrip: $base -> $viaTsv")
      viaJson == base && viaXml == base && viaTsv == base
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "30").toInt), prop)
    assert(result.passed, s"results roundtrip fuzz failed: ${result.status}")
  }
}
