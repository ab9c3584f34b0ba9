package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF term representation as a flat Spark struct.
  *
  * Mirrors the reference's term model (oxigraph: lib/oxrdf/src/triple.rs ·
  * `Term`; lib/oxigraph/src/storage/numeric_encoder.rs · `EncodedTerm`)
  * but as a Catalyst-friendly StructType instead of an enum encoding:
  * plain struct columns keep predicate pushdown, whole-stage codegen and
  * struct equality/ordering alive (SURVEY.md §1.5, §7.3-6).
  *
  *   kind: 0=IRI, 1=blank node, 2=literal, 3=default graph
  *   lex : lexical form (IRI string / bnode id / literal lexical form)
  *   dt  : datatype IRI for literals, null otherwise;
  *         plain string literals carry xsd:string, lang strings
  *         rdf:langString (matches RDF 1.1)
  *   lang: BCP47 tag for language-tagged strings, else null
  */
object Term {
  val IriKind: Int = 0
  val BlankKind: Int = 1
  val LiteralKind: Int = 2
  val DefaultGraphKind: Int = 3
  /** RDF-star quoted triple (oxrdf: Subject::Triple / Term::Triple):
    * `lex` holds the canonical N-Triples-star rendering "<< s p o >>"
    * (single spaces, canonical escapes), so sameTerm / equality / joins
    * stay plain struct comparisons and the components are recoverable
    * by a deterministic parse (QuotedTriple).
    */
  val QuotedKind: Int = 4

  val schema: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("lex", StringType, nullable = true),
    StructField("dt", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  val quadSchema: StructType = StructType(Seq(
    StructField("g", schema, nullable = false),
    StructField("s", schema, nullable = false),
    StructField("p", schema, nullable = false),
    StructField("o", schema, nullable = false)))

  // Well-known datatype IRIs (lib/oxrdf/src/vocab.rs)
  val xsd = "http://www.w3.org/2001/XMLSchema#"
  val XsdString: String = xsd + "string"
  val XsdBoolean: String = xsd + "boolean"
  val XsdInteger: String = xsd + "integer"
  val XsdDecimal: String = xsd + "decimal"
  val XsdFloat: String = xsd + "float"
  val XsdDouble: String = xsd + "double"
  val XsdDateTime: String = xsd + "dateTime"
  val XsdDate: String = xsd + "date"
  val XsdTime: String = xsd + "time"
  val XsdGYear: String = xsd + "gYear"
  val XsdGYearMonth: String = xsd + "gYearMonth"
  val XsdGMonth: String = xsd + "gMonth"
  val XsdGMonthDay: String = xsd + "gMonthDay"
  val XsdGDay: String = xsd + "gDay"
  val XsdDuration: String = xsd + "duration"
  val XsdDayTimeDuration: String = xsd + "dayTimeDuration"
  val XsdYearMonthDuration: String = xsd + "yearMonthDuration"
  val RdfLangString: String = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  val RdfDirLangString: String = "http://www.w3.org/1999/02/22-rdf-syntax-ns#dirLangString"

  val numericTypes: Seq[String] = Seq(
    XsdInteger, XsdDecimal, XsdFloat, XsdDouble,
    xsd + "int", xsd + "long", xsd + "short", xsd + "byte",
    xsd + "nonNegativeInteger", xsd + "positiveInteger",
    xsd + "negativeInteger", xsd + "nonPositiveInteger",
    xsd + "unsignedInt", xsd + "unsignedLong", xsd + "unsignedShort",
    xsd + "unsignedByte")

  private def term(kind: Int, lex: Column, dt: Column, lang: Column): Column =
    struct(
      lit(kind).cast(ByteType).as("kind"),
      lex.cast(StringType).as("lex"),
      dt.cast(StringType).as("dt"),
      lang.cast(StringType).as("lang"))

  /** IRI term column from a string column/literal. */
  /** PN_CHARS_BASE (Turtle [163s] / SPARQL [164]) — the exact grammar
    * ranges, NOT Character.isLetter: letters by codepoint block, ZWNJ/
    * ZWJ, and astral planes 1–14 (#x10000–#xEFFFF). Astral codepoints
    * are handled char-wise: a high surrogate ≤ U+DB7F is exactly the
    * first half of a codepoint ≤ #xEFFFF (UTF-8-decoded strings never
    * carry lone surrogates, so accepting the halves independently is
    * equivalent to accepting the pair).
    */
  def isPnCharsBase(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= 0x00C0 && c <= 0x00D6) || (c >= 0x00D8 && c <= 0x00F6) ||
      (c >= 0x00F8 && c <= 0x02FF) || (c >= 0x0370 && c <= 0x037D) ||
      (c >= 0x037F && c <= 0x1FFF) || (c >= 0x200C && c <= 0x200D) ||
      (c >= 0x2070 && c <= 0x218F) || (c >= 0x2C00 && c <= 0x2FEF) ||
      (c >= 0x3001 && c <= 0xD7FF) || (c >= 0xF900 && c <= 0xFDCF) ||
      (c >= 0xFDF0 && c <= 0xFFFD) ||
      (Character.isHighSurrogate(c) && c <= 0xDB7F) ||
      Character.isLowSurrogate(c)

  /** PN_CHARS_U: PN_CHARS_BASE | '_'. The legal FIRST character of a
    * blank-node label or VARNAME (with digits), and of PN_LOCAL (with
    * digits, ':' and PLX). */
  def isPnCharsU(c: Char): Boolean = isPnCharsBase(c) || c == '_'

  /** PN_CHARS continuation character (Turtle [166s] / SPARQL [167]):
    * PN_CHARS_U plus '-', digits, the middle dot U+00B7, combining
    * marks U+0300–U+036F, and U+203F/U+2040 — shared by the SPARQL/
    * Turtle/N-Triples name scanners so decomposed-unicode names
    * (e + combining acute) parse like their NFC forms. Continuation
    * ONLY: leading digits/'-'/marks are reserved — scanners must gate
    * the first char on isPnCharsU/isPnCharsBase per production.
    */
  def isPnChar(c: Char): Boolean =
    isPnCharsU(c) || (c >= '0' && c <= '9') || c == '-' || c == 0x00B7 ||
      (c >= 0x0300 && c <= 0x036F) || c == 0x203F || c == 0x2040

  def iri(c: Column): Column = term(IriKind, c, lit(null), lit(null))
  def iri(s: String): Column = iri(lit(s))

  /** Blank node with the given id column. */
  def bnode(c: Column): Column = term(BlankKind, c, lit(null), lit(null))

  /** Typed literal. */
  def typedLit(lex: Column, dt: String): Column =
    term(LiteralKind, lex, lit(dt), lit(null))

  /** Simple (xsd:string) literal. */
  def strLit(c: Column): Column = typedLit(c, XsdString)

  /** Language-tagged string. Tags are ASCII-lowercased at construction
    * (RDF 1.1 value space is lowercase; oxrdf does the same), so term
    * equality, DISTINCT, and LANG() all see the canonical form. */
  def langLit(lex: Column, lang: Column): Column =
    term(LiteralKind, lex, lit(RdfLangString), lower(lang))

  /** Directional language-tagged string (RDF 1.2
    * rdf:dirLangString): the lang slot holds the combined
    * `lang--dir` token — the same shape the N-Triples 1.2 LANG_DIR
    * production serializes — so writers emit it verbatim and term
    * equality keeps `"a"@en`, `"a"@en--ltr`, `"a"@en--rtl` distinct.
    * LANG()/LANGDIR() split on the `--`, which cannot occur inside a
    * plain tag (every LANGTAG subtag is non-empty). */
  def dirLangLit(lex: Column, lang: Column, dir: Column): Column =
    term(LiteralKind, lex, lit(RdfDirLangString),
      concat(lower(lang), lit("--"), dir))

  /** Lang literal from an already-normalized tag that may carry a
    * `--dir` suffix (parser output): picks rdf:langString or
    * rdf:dirLangString from the tag shape. */
  def taggedLit(lex: Column, tag: String): Column =
    term(LiteralKind, lex,
      lit(if (tag.contains("--")) RdfDirLangString else RdfLangString),
      lit(tag))

  /** Column twin of [[taggedLit]] for dynamic tags (e.g. CONCAT's
    * surviving-tag rule, where the tag comes from an argument). */
  def taggedLitCol(lex: Column, tag: Column): Column =
    term(LiteralKind, lex,
      when(tag.contains("--"), lit(RdfDirLangString))
        .otherwise(lit(RdfLangString)), tag)

  /** Parse an RDF 1.2 LANG_DIR token (the text after '@'): a plain
    * LANGTAG yields rdf:langString, a `--ltr`/`--rtl` suffix yields
    * rdf:dirLangString with the combined normalized tag; anything else
    * (bad subtags, unknown/uppercase direction, dangling '--') is None.
    * Shared by every parser that scans `"lit"@tag`. */
  def langTag(tag: String): Option[(String, String)] = {
    val i = tag.indexOf("--")
    if (i < 0) {
      if (tag.matches("[a-zA-Z]+(-[a-zA-Z0-9]+)*"))
        Some((normLang(tag), RdfLangString))
      else None
    } else {
      val (base, dir) = (tag.substring(0, i), tag.substring(i + 2))
      if (base.matches("[a-zA-Z]+(-[a-zA-Z0-9]+)*") &&
        (dir == "ltr" || dir == "rtl"))
        Some((normLang(base) + "--" + dir, RdfDirLangString))
      else None
    }
  }

  /** String-side twin of the langLit lowercasing, for row-based parsers. */
  def normLang(tag: String): String =
    if (tag == null) null else tag.toLowerCase(java.util.Locale.ROOT)

  def intLit(c: Column): Column = typedLit(c, XsdInteger)
  def decimalLit(c: Column): Column = typedLit(c, XsdDecimal)
  def doubleLit(c: Column): Column = typedLit(c, XsdDouble)
  def boolLit(c: Column): Column = typedLit(c, XsdBoolean)
  def dateTimeLit(c: Column): Column =
    typedLit(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), XsdDateTime)

  /** Quoted triple term from its canonical lex (see QuotedKind). */
  def quoted(c: Column): Column = term(QuotedKind, c, lit(null), lit(null))

  val defaultGraph: Column =
    term(DefaultGraphKind, lit(null), lit(null), lit(null))

  /** True when the term column is a literal with a numeric datatype. */
  def isNumericLit(t: Column): Column =
    t("kind") === LiteralKind && t("dt").isin(numericTypes: _*)

  /** Static value-space class of a term — the type-inference lattice
    * element (oxigraph: lib/sparopt/src/type_inference.rs ·
    * VariableTypes, re-expressed as value spaces rather than node
    * kinds). Used for comparison/sort-key pruning: when a variable's
    * class is statically known, the other value-space branches of the
    * dynamic dispatch are dead code.
    */
  sealed trait VClass
  case object VNum extends VClass
  case object VTemporal extends VClass
  case object VStr extends VClass
  case object VBool extends VClass
  case object VOther extends VClass
}
