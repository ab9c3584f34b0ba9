package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{QuotedTriple, Term}

/** N-Triples / N-Quads source and sink.
  *
  * Mirrors the reference's line-oriented parsers (oxigraph:
  * lib/oxttl/src/ntriples.rs, nquads.rs, shared line_formats.rs) but as a
  * SPLITTABLE Spark source: spark.read.text gives line-aligned splits, so
  * a 100 TB dump parses fully in parallel with no coordination — the
  * property the reference's push/pull parser gets from chunked feeding,
  * recovered here from the data format itself (SURVEY.md §2.1).
  * Serialization is pure Column ops (codegen'd concat/escape).
  */
object RdfIO {

  final case class TermRow(kind: Byte, lex: String, dt: String, lang: String)
  final case class QuadRow(g: TermRow, s: TermRow, p: TermRow, o: TermRow)

  private val DefaultG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)

  // ---------------- parsing (executor-side, line at a time) -----------
  final class LineParser(line: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg in N-Triples line: $line")

    private def unescape(s: String): String = {
      if (!s.contains('\\')) return s
      val sb = new StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        if (s(j) == '\\' && j + 1 < s.length) {
          j += 1
          s(j) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'
            case 'r' => sb += '\r'; case 'b' => sb += '\b'
            case 'f' => sb += '\f'; case '"' => sb += '"'
            case '\'' => sb += '\''; case '\\' => sb += '\\'
            case 'u' =>
              sb += Integer.parseInt(s.substring(j + 1, j + 5), 16).toChar
              j += 4
            case 'U' =>
              sb.appendAll(Character.toChars(
                Integer.parseInt(s.substring(j + 1, j + 9), 16)))
              j += 8
            case c => sb += c
          }
        } else sb += s(j)
        j += 1
      }
      sb.toString
    }

    def parseTerm(objPos: Boolean = false): TermRow = {
      ws()
      if (i >= line.length) fail("unexpected end")
      line(i) match {
        // RDF 1.2 triple term <<( s p o )>> — object position only by
        // grammar; same QuotedKind encoding as the star form below
        case '<' if i + 2 < line.length && line(i + 1) == '<' &&
            line(i + 2) == '(' =>
          if (!objPos)
            fail("triple terms <<( ... )>> may only appear as objects")
          i += 3
          val s = parseTerm(); val p = parseTerm()
          val o = parseTerm(objPos = true)
          validateSP(s, p)
          ws()
          if (i + 2 >= line.length || line(i) != ')' ||
            line(i + 1) != '>' || line(i + 2) != '>')
            fail("unterminated triple term")
          i += 3
          def q(t: TermRow) = QuotedTriple.QTerm(t.kind, t.lex, t.dt, t.lang)
          TermRow(Term.QuotedKind.toByte,
            QuotedTriple.encode(q(s), q(p), q(o)), null, null)
        // RDF-star quoted triple << s p o >> (N-Triples-star)
        case '<' if i + 1 < line.length && line(i + 1) == '<' =>
          i += 2
          val s = parseTerm(); val p = parseTerm()
          val o = parseTerm(objPos = true)
          validateSP(s, p)
          ws()
          if (i + 1 >= line.length || line(i) != '>' || line(i + 1) != '>')
            fail("unterminated quoted triple")
          i += 2
          def q(t: TermRow) = QuotedTriple.QTerm(t.kind, t.lex, t.dt, t.lang)
          TermRow(Term.QuotedKind.toByte,
            QuotedTriple.encode(q(s), q(p), q(o)), null, null)
        case '<' =>
          val end = line.indexOf('>', i)
          if (end < 0) fail("unterminated IRI")
          val iri = line.substring(i + 1, end); i = end + 1
          TermRow(Term.IriKind.toByte, unescape(iri), null, null)
        case '_' =>
          if (i + 1 >= line.length || line(i + 1) != ':') fail("bad bnode")
          i += 2
          val start = i
          // BLANK_NODE_LABEL: first char PN_CHARS_U or [0-9]; interior
          // '.' and PN_CHARS are label chars; a trailing dot run is
          // the statement terminator
          while (i < line.length &&
            (Term.isPnChar(line(i)) || line(i) == '.')) i += 1
          var end = i
          while (end > start && line(end - 1) == '.') end -= 1
          i = end
          if (end == start) fail("empty blank node label")
          if (!(Term.isPnCharsU(line(start)) ||
            (line(start) >= '0' && line(start) <= '9')))
            fail("blank node label must start with PN_CHARS_U or a digit")
          TermRow(Term.BlankKind.toByte, line.substring(start, end), null, null)
        case '"' =>
          i += 1
          val start = i
          while (i < line.length && line(i) != '"') {
            if (line(i) == '\\') i += 1 // skip escaped char
            i += 1
          }
          if (i >= line.length) fail("unterminated literal")
          val lex = unescape(line.substring(start, i)); i += 1
          if (i + 1 < line.length && line(i) == '^' && line(i + 1) == '^') {
            i += 2
            val dtTerm = parseTerm()
            TermRow(Term.LiteralKind.toByte, lex, dtTerm.lex, null)
          } else if (i < line.length && line(i) == '@') {
            i += 1
            val start2 = i
            while (i < line.length && (line(i).isLetterOrDigit || line(i) == '-'))
              i += 1
            val tag = line.substring(start2, i)
            // LANG_DIR (N-Triples 1.2): plain LANGTAG, or `--ltr/--rtl`
            // initial-text-direction -> rdf:dirLangString
            Term.langTag(tag) match {
              case Some((l, dt)) =>
                TermRow(Term.LiteralKind.toByte, lex, dt, l)
              case None => fail(s"bad language tag '@$tag'")
            }
          } else TermRow(Term.LiteralKind.toByte, lex, Term.XsdString, null)
        case c => fail(s"unexpected char '$c'")
      }
    }

    /** Grammar position checks shared by statements and quoted inners:
      * subject ::= IRIREF | BLANK_NODE_LABEL (| quoted triple, star),
      * predicate ::= IRIREF.
      */
    def validateSP(s: TermRow, p: TermRow): Unit = {
      if (s.kind == Term.LiteralKind.toByte) fail("literal subject")
      if (p.kind != Term.IriKind.toByte) fail("predicate must be an IRI")
    }

    /** triple or quad; returns null for blank/comment lines */
    def parseStatement(allowGraph: Boolean): QuadRow = {
      ws()
      if (i >= line.length || line(i) == '#') return null
      val s = parseTerm()
      val p = parseTerm()
      val o = parseTerm(objPos = true)
      validateSP(s, p)
      ws()
      val g =
        if (allowGraph && i < line.length && line(i) != '.') parseTerm()
        else DefaultG
      // graph label (N-Quads rule [6]): IRIREF or BLANK_NODE_LABEL only
      if (g.kind != Term.DefaultGraphKind.toByte &&
        g.kind != Term.IriKind.toByte && g.kind != Term.BlankKind.toByte)
        fail("graph label must be an IRI or blank node")
      ws()
      if (i >= line.length || line(i) != '.') fail("missing final '.'")
      QuadRow(g, s, p, o)
    }
  }

  def parseLine(line: String, allowGraph: Boolean): Option[QuadRow] =
    Option(new LineParser(line).parseStatement(allowGraph))

  /** Read N-Triples (default graph) as a quad DataFrame. */
  def readNTriples(spark: SparkSession, path: String): DataFrame =
    readLines(spark, path, allowGraph = false)

  /** Read N-Quads as a quad DataFrame. */
  def readNQuads(spark: SparkSession, path: String): DataFrame =
    readLines(spark, path, allowGraph = true)

  private def readLines(spark: SparkSession, path: String,
      allowGraph: Boolean): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(l => parseLine(l, allowGraph))
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }

  /** STREAMING N-Triples / N-Quads ingestion: a `readStream` over a
    * line-oriented directory (the Structured Streaming file source —
    * new files picked up per micro-batch), parsed by the same
    * [[parseLine]] the batch readers use, so streamed quads are
    * row-identical to a batch parse of the same files. The continuous
    * analogue of the reference's bulk loader for an ever-growing crawl
    * drop directory; compose with `writeStream` into a parquet quad
    * store (append mode — the source is monotone).
    */
  def readNTriplesStream(spark: SparkSession, path: String): DataFrame =
    readLinesStream(spark, path, allowGraph = false)

  def readNQuadsStream(spark: SparkSession, path: String): DataFrame =
    readLinesStream(spark, path, allowGraph = true)

  private def readLinesStream(spark: SparkSession, path: String,
      allowGraph: Boolean): DataFrame = {
    import spark.implicits._
    spark.readStream.textFile(path)
      .flatMap(l => parseLine(l, allowGraph))
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }

  /** Read Turtle: small files parse task-per-FILE (parallel across
    * files); files above the split threshold go through
    * [[TurtleSplit]]'s two-pass chunked parser for split-level
    * parallelism on single huge documents (SURVEY.md §2.1 v2), falling
    * back per file when the safety scan disqualifies it.
    */
  def readTurtle(spark: SparkSession, path: String): DataFrame =
    TurtleSplit.read(spark, path)

  /** Read RDF/XML: DOM parse per FILE (not line-splittable), parallel
    * across files like Turtle.
    */
  def readRdfXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      // blank files appear in written directories (one per empty
      // partition) — an empty document is an empty graph, not an error
      .flatMap { case (_, content) =>
        if (content.trim.isEmpty) Nil
        else new RdfXmlParser(content).parse() }
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }

  /** Read N3 (one document per FILE; see TurtleParser's n3 mode for the
    * supported subset — formulas become blank-named graphs).
    */
  def readN3(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        new TurtleParser(content, n3 = true).parse() }
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }

  /** Read expanded-form JSON-LD (one document per FILE, parallel across
    * files; see JsonLdParser for the supported subset). `rdfDirection`
    * selects the base-direction mode for @direction strings: None
    * drops direction (JSON-LD 1.0 behavior), "i18n-datatype" or
    * "compound-literal" preserve it per the JSON-LD-to-RDF §8 option.
    */
  def readJsonLd(spark: SparkSession, path: String,
      rdfDirection: Option[String] = None): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        new JsonLdParser(content, rdfDirection).parse() }
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }

  /** Format dispatch facade (oxigraph: lib/oxrdfio · RdfParser). */
  def read(spark: SparkSession, path: String, format: String): DataFrame =
    format.toLowerCase match {
      case "nt" | "ntriples" | "application/n-triples" =>
        readNTriples(spark, path)
      case "nq" | "nquads" | "application/n-quads" => readNQuads(spark, path)
      case "ttl" | "turtle" | "text/turtle" => readTurtle(spark, path)
      case "trig" | "application/trig" => readTurtle(spark, path)
      case "rdf" | "rdfxml" | "application/rdf+xml" => readRdfXml(spark, path)
      case "jsonld" | "application/ld+json" => readJsonLd(spark, path)
      case "n3" | "text/n3" => readN3(spark, path)
      case other => throw new IllegalArgumentException(
        s"unsupported RDF format: $other " +
          "(supported: nt, nq, ttl, trig, rdf, jsonld, n3)")
    }

  /** Serializer facade, the write direction of [[read]] (oxigraph:
    * lib/oxrdfio · RdfSerializer). Triple formats (nt/ttl/rdf) take the
    * default-graph slice view of a quad frame; quad formats keep graphs.
    */
  def write(quads: DataFrame, path: String, format: String): Unit =
    write(quads, path, format, edition12 = false)

  /** As [[write]]; `edition12 = true` selects the RDF 1.2 output
    * edition for the line/Turtle family: quoted triples serialize as
    * triple terms `<<( s p o )>>` (object position only — a quoted
    * SUBJECT errors loudly, since 1.2 gives it no spelling).
    */
  def write(quads: DataFrame, path: String, format: String,
      edition12: Boolean): Unit = {
    def triples =
      (if (quads.columns.contains("g"))
        quads.where(col("g")("kind") === Term.DefaultGraphKind)
      else quads).select("s", "p", "o")
    def no12(fmt: String): Unit = if (edition12)
      throw new IllegalArgumentException(
        s"the RDF 1.2 output edition applies to nt/nq/ttl/trig, not $fmt")
    format.toLowerCase match {
      case "nt" | "ntriples" | "application/n-triples" =>
        writeNTriples(triples, path, edition12)
      case "nq" | "nquads" | "application/n-quads" =>
        writeNQuads(quads, path, edition12)
      case "ttl" | "turtle" | "text/turtle" =>
        TurtleWriter.writeTurtle(triples, path, edition12 = edition12)
      case "trig" | "application/trig" =>
        TurtleWriter.writeTriG(quads, path, edition12 = edition12)
      case "rdf" | "rdfxml" | "application/rdf+xml" =>
        no12(format); RdfXmlWriter.write(triples, path)
      case "jsonld" | "application/ld+json" =>
        no12(format)
        JsonLdWriter.write(
          if (quads.columns.contains("g")) quads
          else quads.withColumn("g", graft.model.Term.defaultGraph), path)
      // every Turtle document is a valid N3 document (N3 is a strict
      // superset), so the N3 sink is the Turtle serializer
      case "n3" | "text/n3" =>
        no12(format); TurtleWriter.writeTurtle(triples, path)
      case other => throw new IllegalArgumentException(
        s"unsupported RDF output format: $other " +
          "(supported: nt, nq, ttl, trig, rdf, jsonld, n3)")
    }
  }

  // ---------------- serialization (pure Column ops) -------------------
  private[io] def escape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")

  /** Format one term column as its N-Triples token. With
    * `edition12 = true` quoted triples render as RDF 1.2 triple terms
    * `<<( s p o )>>` (recursively) instead of the CG-star `<< >>` lex.
    */
  def formatTerm(t: Column, edition12: Boolean = false): Column =
    when(t("kind") === Term.IriKind, concat(lit("<"), t("lex"), lit(">")))
      .when(t("kind") === Term.BlankKind, concat(lit("_:"), t("lex")))
      // quoted triple: lex already IS the canonical N-Triples-star token
      .when(t("kind") === Term.QuotedKind,
        if (edition12) graft.expr.TripleTermLex.convert(t("lex"))
        else t("lex"))
      .otherwise(concat(lit("\""), escape(t("lex")), lit("\""),
        when(t("lang").isNotNull, concat(lit("@"), t("lang")))
          .when(t("dt").isNotNull && t("dt") =!= Term.XsdString,
            concat(lit("^^<"), t("dt"), lit(">")))
          .otherwise(lit(""))))

  /** Subject token: under the 1.2 edition a quoted-triple SUBJECT has
    * no spelling (triple terms are object-only by grammar) — loud
    * error, the RDF/XML-writer precedent for inexpressible terms.
    */
  private def subjectTerm(t: Column, edition12: Boolean): Column =
    if (!edition12) formatTerm(t)
    else when(t("kind") === Term.QuotedKind, raise_error(concat(
      lit("RDF 1.2 edition: a quoted triple in SUBJECT position has " +
        "no triple-term spelling (object-only): "), t("lex"))))
      .otherwise(formatTerm(t, edition12 = true))

  /** Serialize quads to N-Quads text (named graph appended when present). */
  def writeNQuads(quads: DataFrame, path: String,
      edition12: Boolean = false): Unit =
    quads.select(concat(
      subjectTerm(col("s"), edition12), lit(" "),
      formatTerm(col("p")), lit(" "),
      formatTerm(col("o"), edition12),
      when(col("g")("kind") === Term.DefaultGraphKind, lit(""))
        .otherwise(concat(lit(" "), formatTerm(col("g")))),
      lit(" .")).as("value"))
      .write.mode("overwrite").text(path)

  def writeNTriples(triples: DataFrame, path: String,
      edition12: Boolean = false): Unit =
    triples.select(concat(
      subjectTerm(col("s"), edition12), lit(" "),
      formatTerm(col("p")), lit(" "),
      formatTerm(col("o"), edition12), lit(" .")).as("value"))
      .write.mode("overwrite").text(path)
}
