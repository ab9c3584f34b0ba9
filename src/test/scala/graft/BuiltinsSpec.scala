package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparqlExpr
import graft.model.Term

/** Direct evaluation coverage for every SparqlExpr builtin: each one
  * evaluates on a literal row and yields the SPARQL-spec value (or NULL
  * for type errors). Catches unresolved functions / bad when-chains that
  * the query gate might not reach.
  */
class BuiltinsSpec extends AnyFunSuite {
  import TestSpark._

  private def lex(c: org.apache.spark.sql.Column): (Option[String], Option[String], Option[String]) = {
    val r = spark.range(1).select(c.as("t")).head()
    Option(r.getAs[Row]("t")) match {
      case None => (None, None, None)
      case Some(t) => (Option(t.getString(1)), Option(t.getString(2)),
        Option(t.getString(3)))
    }
  }
  private def i(s: String) = Term.iri(s)
  private def n(v: String, dt: String = Term.XsdInteger) =
    Term.typedLit(lit(v), dt)
  private def s(v: String) = Term.strLit(lit(v))
  private def f(name: String, args: org.apache.spark.sql.Column*) =
    SparqlExpr.fn(name, args)

  test("logic and conditionals") {
    assert(lex(f("&&", f("=", n("1"), n("1")), f("<", n("1"), n("2"))))._1 ==
      Some("true"))
    assert(lex(f("||", f("=", n("1"), n("2")), f(">", n("3"), n("2"))))._1 ==
      Some("true"))
    assert(lex(f("!", f("=", n("1"), n("1"))))._1 == Some("false"))
    assert(lex(f("IF", f("<", n("1"), n("2")), s("yes"), s("no")))._1 ==
      Some("yes"))
    assert(lex(f("COALESCE", SparqlExpr.nullTerm, s("x")))._1 == Some("x"))
    assert(lex(f("BOUND", SparqlExpr.nullTerm))._1 == Some("false"))
    // error && false = false (SPARQL 3-valued)
    assert(lex(f("&&", f("<", s("a"), n("1")), f("=", n("1"), n("2"))))._1 ==
      Some("false"))
  }

  test("comparison with promotion; IN") {
    assert(lex(f("=", n("5"), n("5.0", Term.XsdDecimal)))._1 == Some("true"))
    assert(lex(f("<", n("2"), n("10.5", Term.XsdDecimal)))._1 == Some("true"))
    assert(lex(f("<=", n("2"), n("2.0", Term.XsdDouble)))._1 == Some("true"))
    assert(lex(f(">=", n("3"), n("2.9", Term.XsdDouble)))._1 == Some("true"))
    assert(lex(f("IN", n("2"), n("1"), n("2"), n("3")))._1 == Some("true"))
    assert(lex(f("sameTerm", i("http://a"), i("http://a")))._1 == Some("true"))
    // incomparable: string vs int -> error (null)
    assert(lex(f("<", s("a"), n("1")))._1.isEmpty)
  }

  test("term tests, accessors, constructors") {
    assert(lex(f("isIRI", i("http://a")))._1 == Some("true"))
    assert(lex(f("isLiteral", s("x")))._1 == Some("true"))
    assert(lex(f("isNumeric", n("4")))._1 == Some("true"))
    assert(lex(f("isBlank", s("x")))._1 == Some("false"))
    assert(lex(f("STR", i("http://a")))._1 == Some("http://a"))
    val lng = Term.langLit(lit("bonjour"), lit("fr"))
    assert(lex(f("LANG", lng))._1 == Some("fr"))
    assert(lex(f("LANG", s("x")))._1 == Some(""))
    assert(lex(f("DATATYPE", n("4")))._1 == Some(Term.XsdInteger))
    assert(lex(f("IRI", s("http://b")))._1 == Some("http://b"))
    val sd = lex(f("STRDT", s("7"), i(Term.XsdInteger)))
    assert(sd._1 == Some("7") && sd._2 == Some(Term.XsdInteger))
    val sl = lex(f("STRLANG", s("hi"), s("en")))
    assert(sl._1 == Some("hi") && sl._3 == Some("en"))
    assert(lex(f("STRUUID"))._1.get.matches("[0-9a-f-]{36}"))
    assert(lex(f("UUID"))._1.get.startsWith("urn:uuid:"))
    assert(lex(f("BNODE"))._1.isDefined)
  }

  test("strings") {
    assert(lex(f("STRLEN", s("héllo")))._1 == Some("5"))
    assert(lex(f("UCASE", s("ab")))._1 == Some("AB"))
    assert(lex(f("LCASE", s("AB")))._1 == Some("ab"))
    assert(lex(f("SUBSTR", s("abcde"), n("2"), n("3")))._1 == Some("bcd"))
    assert(lex(f("SUBSTR", s("abcde"), n("3")))._1 == Some("cde"))
    assert(lex(f("CONCAT", s("a"), s("b"), s("c")))._1 == Some("abc"))
    assert(lex(f("CONTAINS", s("foobar"), s("oba")))._1 == Some("true"))
    assert(lex(f("STRSTARTS", s("foobar"), s("foo")))._1 == Some("true"))
    assert(lex(f("STRENDS", s("foobar"), s("bar")))._1 == Some("true"))
    assert(lex(f("STRBEFORE", s("abc#def"), s("#")))._1 == Some("abc"))
    assert(lex(f("STRAFTER", s("abc#def"), s("#")))._1 == Some("def"))
    assert(lex(f("STRBEFORE", s("abc"), s("#")))._1 == Some(""))
    assert(lex(f("REGEX", s("abc123"), s("^[a-z]+[0-9]+$")))._1 == Some("true"))
    assert(lex(f("REGEX", s("ABC"), s("abc"), s("i")))._1 == Some("true"))
    assert(lex(f("REPLACE", s("a1b2"), s("[0-9]"), s("_")))._1 == Some("a_b_"))
    assert(lex(f("ENCODE_FOR_URI", s("a b/c")))._1 == Some("a%20b%2Fc"))
    assert(lex(f("LANGMATCHES", s("en-US"), s("en")))._1 == Some("true"))
    assert(lex(f("LANGMATCHES", s("fr"), s("*")))._1 == Some("true"))
    // lang preservation through string ops
    val up = lex(f("UCASE", Term.langLit(lit("ab"), lit("en"))))
    assert(up._1 == Some("AB") && up._3 == Some("en"))
    // CODEPOINT semantics (XPath/SPARQL count characters, not UTF-16
    // units): an astral char (U+10000, surrogate pair in the JVM) is
    // ONE character for STRLEN/SUBSTR, and percent-encodes per UTF-8
    assert(lex(f("STRLEN", s("a𐀀b")))._1 == Some("3"))
    assert(lex(f("SUBSTR", s("a𐀀b"), n("2"), n("1")))._1 == Some("𐀀"))
    assert(lex(f("SUBSTR", s("a𐀀b"), n("3")))._1 == Some("b"))
    assert(lex(f("UCASE", s("straße")))._1 == Some("STRASSE"))
    assert(lex(f("ENCODE_FOR_URI", s("𐀀")))._1 == Some("%F0%90%80%80"))
    assert(lex(f("CONTAINS", s("a𐀀b"), s("𐀀")))._1 == Some("true"))
  }

  test("string edge semantics: §17.4.3 compatibility, CONCAT lang, XPath SUBSTR") {
    def en(x: String) = Term.langLit(lit(x), lit("en"))
    def cy(x: String) = Term.langLit(lit(x), lit("cy"))
    // CONCAT() with NO args (ExpressionList ::= NIL) is the empty
    // simple literal, not a plan-build crash
    val c0 = lex(f("CONCAT"))
    assert(c0._1 == Some("") && c0._3.isEmpty)
    // CONCAT: common tag survives, any mismatch degrades to simple
    val cc = lex(f("CONCAT", en("a"), en("b")))
    assert(cc._1 == Some("ab") && cc._3 == Some("en"))
    val cm = lex(f("CONCAT", en("a"), s("b")))
    assert(cm._1 == Some("ab") && cm._3.isEmpty)
    // argument compatibility: tagged arg2 must match arg1's tag
    assert(lex(f("CONTAINS", en("abc"), en("b")))._1 == Some("true"))
    assert(lex(f("CONTAINS", en("abc"), cy("b")))._1.isEmpty) // error
    assert(lex(f("STRBEFORE", en("abc"), cy("b")))._1.isEmpty) // error
    // match keeps arg1's lang; NO match is the SIMPLE literal ""
    val m = lex(f("STRBEFORE", en("abc"), s("bc")))
    assert(m._1 == Some("a") && m._3 == Some("en"))
    val nm = lex(f("STRBEFORE", en("abc"), s("z")))
    assert(nm._1 == Some("") && nm._3.isEmpty)
    val me = lex(f("STRAFTER", en("abc"), en("")))
    assert(me._1 == Some("abc") && me._3 == Some("en"))
    // XPath fn:substring: window clips at position 1, args round
    assert(lex(f("SUBSTR", s("hello"), n("0"), n("2")))._1 == Some("h"))
    assert(lex(f("SUBSTR", s("hello"), n("-1"), n("3")))._1 == Some("h"))
    assert(lex(f("SUBSTR", s("hello"), n("1.6", Term.XsdDecimal),
      n("2")))._1 == Some("el"))
  }

  test("ADJUST: XPath adjust-*-to-timezone (SEP-0002)") {
    def dt(v: String) = Term.typedLit(lit(v), Term.XsdDateTime)
    def d(v: String) = Term.typedLit(lit(v), Term.XsdDate)
    def tm(v: String) = Term.typedLit(lit(v), Term.XsdTime)
    def dur(v: String) = Term.typedLit(lit(v), Term.XsdDayTimeDuration)
    // timezoned input: same instant, local clock shifts to the new zone
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00-07:00"),
      dur("-PT10H")))._1 == Some("2002-03-07T07:00:00-10:00"))
    // zoneless input: clock kept, offset attached
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00"),
      dur("-PT10H")))._1 == Some("2002-03-07T10:00:00-10:00"))
    // empty string strips the timezone, keeping local time
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00-07:00"), s("")))._1 ==
      Some("2002-03-07T10:00:00"))
    // date crosses midnight backward when re-zoned (XPath example)
    assert(lex(f("ADJUST", d("2002-03-07-07:00"), dur("-PT10H")))._1 ==
      Some("2002-03-06-10:00"))
    assert(lex(f("ADJUST", d("2002-03-07"), dur("-PT10H")))._1 ==
      Some("2002-03-07-10:00"))
    // time wraps mod 24h (XPath example); zero offset renders Z
    assert(lex(f("ADJUST", tm("10:00:00-07:00"), dur("PT10H30M")))._1 ==
      Some("03:30:00+10:30"))
    assert(lex(f("ADJUST", tm("10:00:00-07:00"), dur("PT0S")))._1 ==
      Some("17:00:00Z"))
    // out-of-range / fractional-minute / year-month offsets error
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00"), dur("PT15H")))._1.isEmpty)
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00"), dur("PT10H5S")))._1.isEmpty)
    assert(lex(f("ADJUST", dt("2002-03-07T10:00:00"),
      Term.typedLit(lit("P1M"), Term.XsdYearMonthDuration)))._1.isEmpty)
  }

  test("numerics with promotion") {
    assert(lex(f("+", n("2"), n("3")))._1 == Some("5"))
    val div = lex(f("/", n("7"), n("2")))
    assert(div._1.exists(_.startsWith("3.5")) &&
      div._2 == Some(Term.XsdDecimal), s"int/int -> decimal, got $div")
    assert(lex(f("*", n("2"), n("2.5", Term.XsdDouble)))._2 ==
      Some(Term.XsdDouble))
    // XPath promotion: float stays float unless a double participates
    val ff = lex(f("+", n("2.5", Term.XsdFloat), n("0.5", Term.XsdFloat)))
    assert(ff._1 == Some("3.0") && ff._2 == Some(Term.XsdFloat),
      s"float+float -> float, got $ff")
    assert(lex(f("*", n("2", Term.XsdFloat), n("2.5", Term.XsdDouble)))._2 ==
      Some(Term.XsdDouble))
    assert(lex(f("+", n("2"), n("0.5", Term.XsdFloat)))._2 ==
      Some(Term.XsdFloat))
    assert(lex(f("ABS", n("-3.5", Term.XsdFloat)))._2 == Some(Term.XsdFloat))
    assert(lex(f("UMINUS", n("4.5", Term.XsdFloat)))._2 == Some(Term.XsdFloat))
    assert(lex(f("/", n("1"), n("0")))._1.isEmpty) // div by zero -> error
    assert(lex(f("UMINUS", n("4")))._1 == Some("-4"))
    assert(lex(f("ABS", n("-3")))._1 == Some("3"))
    assert(lex(f("CEIL", n("2.1", Term.XsdDecimal)))._1.exists(_.startsWith("3")))
    assert(lex(f("FLOOR", n("2.9", Term.XsdDecimal)))._1.exists(_.startsWith("2")))
    assert(lex(f("ROUND", n("2.5", Term.XsdDecimal)))._1.exists(_.startsWith("3")))
    assert(lex(f("RAND"))._2 == Some(Term.XsdDouble))
  }

  test("xsd:time and G-type comparisons; tz partial order") {
    val t1 = n("10:20:30", Term.XsdTime)
    val t2 = n("11:00:00", Term.XsdTime)
    assert(lex(f("<", t1, t2))._1 == Some("true"))
    assert(lex(f("HOURS", t1))._1 == Some("10"))
    assert(lex(f("MINUTES", t1))._1 == Some("20"))
    assert(lex(f("SECONDS", n("10:20:30.25", Term.XsdTime)))._1 ==
      Some("30.25"))
    assert(lex(f("TZ", n("10:00:00+05:00", Term.XsdTime)))._1 ==
      Some("+05:00"))
    // G-types compare within their own type (1972 leap-year filler)
    assert(lex(f("<", n("2023", Term.XsdGYear),
      n("2024", Term.XsdGYear)))._1 == Some("true"))
    assert(lex(f("<", n("2023-05", Term.XsdGYearMonth),
      n("2023-06", Term.XsdGYearMonth)))._1 == Some("true"))
    assert(lex(f("<", n("--02-29", Term.XsdGMonthDay),
      n("--03-01", Term.XsdGMonthDay)))._1 == Some("true"))
    assert(lex(f("<", n("--03", Term.XsdGMonth),
      n("--04", Term.XsdGMonth)))._1 == Some("true"))
    assert(lex(f("<", n("---05", Term.XsdGDay),
      n("---06", Term.XsdGDay)))._1 == Some("true"))
    // cross-type temporal comparison is an error, not an answer
    assert(lex(f("<", n("2023", Term.XsdGYear),
      n("2023-05", Term.XsdGYearMonth)))._1.isEmpty)
    // tz-less vs tz'd within the ±14h window: indeterminate -> error
    val noTz = n("2024-01-01T12:00:00", Term.XsdDateTime)
    val tzd = n("2024-01-01T12:00:00Z", Term.XsdDateTime)
    val far = n("2024-01-03T12:00:00Z", Term.XsdDateTime)
    assert(lex(f("<", noTz, tzd))._1.isEmpty)
    assert(lex(f("=", noTz, tzd))._1.isEmpty)
    assert(lex(f("<", noTz, far))._1 == Some("true"))
    // component extraction reads the local value, not the UTC instant
    assert(lex(f("HOURS",
      n("2024-01-01T10:00:00+05:00", Term.XsdDateTime)))._1 == Some("10"))
    // time +- dayTimeDuration wraps modulo 24 h; time - time -> duration
    val t23 = n("23:30:00", Term.XsdTime)
    val plus = lex(f("+", t23, n("PT2H", Term.XsdDayTimeDuration)))
    assert(plus._1 == Some("01:30:00") && plus._2 == Some(Term.XsdTime),
      s"time wrap, got $plus")
    assert(lex(f("-", t23, n("PT30M", Term.XsdDayTimeDuration)))._1 ==
      Some("23:00:00"))
    assert(lex(f("-", t23, n("22:30:00", Term.XsdTime)))._1 == Some("PT1H"))
    // time - dateTime is an error (filler date must not leak)
    assert(lex(f("-", t23,
      n("2024-01-01T10:00:00", Term.XsdDateTime)))._1.isEmpty)
    // yearMonthDuration arithmetic: calendar months with day clamping
    val jan31 = n("2024-01-31T00:00:00", Term.XsdDateTime)
    assert(lex(f("+", jan31, n("P1M", Term.XsdYearMonthDuration)))._1 ==
      Some("2024-02-29T00:00:00")) // leap-year clamp
    assert(lex(f("-", jan31, n("P1Y", Term.XsdYearMonthDuration)))._1 ==
      Some("2023-01-31T00:00:00"))
    assert(lex(f("+", n("2024-01-15", Term.XsdDate),
      n("P2M", Term.XsdDuration)))._1 == Some("2024-03-15"))
    // lexical-space violations stay errors
    assert(lex(f("+", jan31, n("P1M", Term.XsdDayTimeDuration)))._1.isEmpty)
    assert(lex(f("+", jan31,
      n("PT1M", Term.XsdYearMonthDuration)))._1.isEmpty)
    // duration value comparison: equality across subtypes by field
    // pair; order within each subtype
    assert(lex(f("=", n("P1D", Term.XsdDuration),
      n("PT24H", Term.XsdDayTimeDuration)))._1 == Some("true"))
    assert(lex(f("=", n("P1Y", Term.XsdYearMonthDuration),
      n("P12M", Term.XsdDuration)))._1 == Some("true"))
    assert(lex(f("<", n("PT1H30M", Term.XsdDayTimeDuration),
      n("PT2H", Term.XsdDayTimeDuration)))._1 == Some("true"))
    assert(lex(f("<", n("P1Y", Term.XsdYearMonthDuration),
      n("P14M", Term.XsdYearMonthDuration)))._1 == Some("true"))
    // cross-subtype order is undefined -> error
    assert(lex(f("<", n("P1M", Term.XsdYearMonthDuration),
      n("P30D", Term.XsdDayTimeDuration)))._1.isEmpty)
    // constructor casts for time and the duration family
    val tc = lex(f("xsd:time", n("2024-01-01T10:20:30", Term.XsdDateTime)))
    assert(tc._1 == Some("10:20:30") && tc._2 == Some(Term.XsdTime))
    assert(lex(f("xsd:time", s("07:08:09")))._2 == Some(Term.XsdTime))
    assert(lex(f("xsd:time", s("25:00:00x")))._1.isEmpty)
    assert(lex(f("xsd:duration", s("P1Y2M3DT4H")))._2 ==
      Some(Term.XsdDuration))
    assert(lex(f("xsd:dayTimeDuration", s("P1DT2H")))._2 ==
      Some(Term.XsdDayTimeDuration))
    assert(lex(f("xsd:dayTimeDuration", s("P1M")))._1.isEmpty)
    assert(lex(f("xsd:yearMonthDuration", s("P1Y2M")))._2 ==
      Some(Term.XsdYearMonthDuration))
    assert(lex(f("xsd:yearMonthDuration", s("P1DT2H")))._1.isEmpty)
    assert(lex(f("xsd:duration", s("nope")))._1.isEmpty)
  }

  test("BNODE labeled form: per-row stable, cross-row fresh") {
    // same label within one solution -> same bnode; different labels differ
    val df = spark.range(2).select(
      f("BNODE", s("a")).as("x"), f("BNODE", s("a")).as("y"),
      f("BNODE", s("b")).as("z"))
    val rows = df.collect()
    for (r <- rows) {
      val (x, y, z) = (r.getAs[Row]("x"), r.getAs[Row]("y"), r.getAs[Row]("z"))
      assert(x.getByte(0) == Term.BlankKind.toByte)
      assert(x.getString(1) == y.getString(1), "same label, same row")
      assert(x.getString(1) != z.getString(1), "different label")
    }
    // same label across solutions -> distinct bnodes
    assert(rows(0).getAs[Row]("x").getString(1) !=
      rows(1).getAs[Row]("x").getString(1), "fresh across rows")
    // non-string argument is an error
    assert(lex(f("BNODE", n("1")))._1.isEmpty)
  }

  test("RDF-star TRIPLE/SUBJECT/PREDICATE/OBJECT round-trip") {
    val t = f("TRIPLE", i("http://x/s"), i("http://x/p"), n("5"))
    val tv = lex(t)
    assert(tv._1 == Some(
      "<< <http://x/s> <http://x/p> \"5\"^^<" + Term.XsdInteger + "> >>"))
    assert(lex(f("isTRIPLE", t))._1 == Some("true"))
    assert(lex(f("isTRIPLE", i("http://x/s")))._1 == Some("false"))
    assert(lex(f("SUBJECT", t))._1 == Some("http://x/s"))
    assert(lex(f("PREDICATE", t))._1 == Some("http://x/p"))
    val o = lex(f("OBJECT", t))
    assert(o._1 == Some("5") && o._2 == Some(Term.XsdInteger))
    // nested: TRIPLE with a quoted subject; OBJECT(SUBJECT(..)) digs in
    val nested = f("TRIPLE", t, i("http://x/q"), s("v"))
    assert(lex(f("OBJECT", f("SUBJECT", nested)))._1 == Some("5"))
    // errors: literal subject / non-IRI predicate / non-triple accessor
    assert(lex(f("TRIPLE", s("x"), i("http://x/p"), n("1")))._1.isEmpty)
    assert(lex(f("TRIPLE", i("http://x/s"), s("p"), n("1")))._1.isEmpty)
    assert(lex(f("SUBJECT", i("http://x/s")))._1.isEmpty)
    // sameTerm over quoted terms is structural equality
    assert(lex(f("sameTerm", t,
      f("TRIPLE", i("http://x/s"), i("http://x/p"), n("5"))))._1 ==
      Some("true"))
  }

  test("boolean value-space equality accepts 1/0 lexicals") {
    val t1 = Term.typedLit(lit("1"), Term.XsdBoolean)
    val tt = Term.typedLit(lit("true"), Term.XsdBoolean)
    val f0 = Term.typedLit(lit("0"), Term.XsdBoolean)
    assert(lex(f("=", t1, tt))._1 == Some("true"))
    assert(lex(f("=", f0, tt))._1 == Some("false"))
    assert(lex(f("<", f0, t1))._1 == Some("true"))
  }

  test("datetime") {
    val dt = Term.typedLit(lit("2024-03-05T10:20:30"), Term.XsdDateTime)
    assert(lex(f("YEAR", dt))._1 == Some("2024"))
    assert(lex(f("MONTH", dt))._1 == Some("3"))
    assert(lex(f("DAY", dt))._1 == Some("5"))
    assert(lex(f("HOURS", dt))._1 == Some("10"))
    assert(lex(f("MINUTES", dt))._1 == Some("20"))
    assert(lex(f("SECONDS", dt))._1 == Some("30"))
    assert(lex(f("NOW"))._2 == Some(Term.XsdDateTime))
  }

  test("temporal value system: TZ/TIMEZONE, fractions, durations, casts") {
    val dtz = Term.typedLit(lit("2024-03-05T10:20:30.5+05:30"),
      Term.XsdDateTime)
    val dtp = Term.typedLit(lit("2024-03-05T10:20:30"), Term.XsdDateTime)
    val d = Term.typedLit(lit("2024-03-05"), Term.XsdDate)
    // fractional seconds come from the lexical form
    assert(lex(f("SECONDS", dtz))._1 == Some("30.5"))
    assert(lex(f("SECONDS", dtp))._1 == Some("30"))
    // TZ: literal timezone string, "" when absent
    assert(lex(f("TZ", dtz))._1 == Some("+05:30"))
    assert(lex(f("TZ", dtp))._1 == Some(""))
    // TIMEZONE: dayTimeDuration, error (null) when absent
    assert(lex(f("TIMEZONE", dtz)) ==
      (Some("PT5H30M"), Some(Term.XsdDayTimeDuration), None))
    assert(lex(f("TIMEZONE", dtp))._1 == None)
    assert(lex(f("TIMEZONE",
      Term.typedLit(lit("2024-03-05T00:00:00Z"), Term.XsdDateTime)))._1 ==
      Some("PT0S"))
    // timezone-normalized comparison: 10:00+05:00 == 05:00Z
    assert(lex(f("=",
      Term.typedLit(lit("2024-03-05T10:00:00+05:00"), Term.XsdDateTime),
      Term.typedLit(lit("2024-03-05T05:00:00Z"), Term.XsdDateTime)))._1 ==
      Some("true"))
    // dateTime + dayTimeDuration
    val dur = Term.typedLit(lit("P1DT2H30M"), Term.XsdDayTimeDuration)
    assert(lex(f("+", dtp, dur))._1 == Some("2024-03-06T12:50:30"))
    assert(lex(f("-", dtp, dur))._1 == Some("2024-03-04T07:50:30"))
    // date + duration stays a date
    assert(lex(f("+", d, Term.typedLit(lit("P30D"),
      Term.XsdDayTimeDuration))) ==
      (Some("2024-04-04"), Some(Term.XsdDate), None))
    // dateTime - dateTime -> canonical dayTimeDuration
    assert(lex(f("-", dtp,
      Term.typedLit(lit("2024-03-04T07:50:30"), Term.XsdDateTime)))._1 ==
      Some("P1DT2H30M"))
    assert(lex(f("-", dtp, dtp))._1 == Some("PT0S"))
    assert(lex(f("-",
      Term.typedLit(lit("2024-03-04T00:00:00"), Term.XsdDateTime),
      Term.typedLit(lit("2024-03-05T00:00:00"), Term.XsdDateTime)))._1 ==
      Some("-P1D"))
    // constructor casts
    assert(lex(f("xsd:dateTime", d)) ==
      (Some("2024-03-05T00:00:00"), Some(Term.XsdDateTime), None))
    assert(lex(f("xsd:dateTime", s("2024-03-05T10:20:30")))._2 ==
      Some(Term.XsdDateTime))
    assert(lex(f("xsd:dateTime", s("nope")))._1 == None)
    assert(lex(f("xsd:date", dtz)) ==
      (Some("2024-03-05+05:30"), Some(Term.XsdDate), None))
    assert(lex(f("xsd:date", s("2024-03-05")))._2 == Some(Term.XsdDate))
    assert(lex(f("xsd:date", s("2024-13-05")))._1 == None)
    assert(lex(f("xsd:float", s("1.5"))) ==
      (Some("1.5"), Some(Term.XsdFloat), None))
    assert(lex(f("xsd:float", s("INF")))._1 == Some("INF"))
    assert(lex(f("xsd:float", s("nope")))._1 == None)
  }

  test("hashing and casts") {
    assert(lex(f("MD5", s("abc")))._1 ==
      Some("900150983cd24fb0d6963f7d28e17f72"))
    assert(lex(f("SHA1", s("abc")))._1 ==
      Some("a9993e364706816aba3e25717850c26c9cd0d89d"))
    assert(lex(f("SHA256", s("abc")))._1.get.length == 64)
    assert(lex(f("SHA384", s("abc")))._1.get.length == 96)
    assert(lex(f("SHA512", s("abc")))._1.get.length == 128)
    assert(lex(f("xsd:integer", s("42")))._1 == Some("42"))
    assert(lex(f("xsd:integer", s("x")))._1.isEmpty) // bad lexical -> error
    assert(lex(f("xsd:double", s("1.5")))._2 == Some(Term.XsdDouble))
    assert(lex(f("xsd:boolean", s("1")))._1 == Some("true"))
    assert(lex(f("xsd:string", n("9")))._1 == Some("9"))
    // XSD lexical-space edges: whitespace facet collapses for casts
    // from string; boolean accepts ONLY true/false/1/0 (case matters);
    // "+5" integer sign; "1." decimal; signed INF spellings
    assert(lex(f("xsd:integer", s(" 42 ")))._1 == Some("42"))
    assert(lex(f("xsd:integer", s("+5")))._1 == Some("5"))
    assert(lex(f("xsd:boolean", s(" true ")))._1 == Some("true"))
    assert(lex(f("xsd:boolean", s("TRUE")))._1.isEmpty) // error
    assert(lex(f("xsd:boolean", s("0")))._1 == Some("false"))
    assert(lex(f("xsd:decimal", s("1.")))._1.isDefined)
    assert(lex(f("xsd:double", s("-INF")))._1 == Some("-INF"))
    assert(lex(f("xsd:double", s("Infinity")))._1.isEmpty) // not XSD
    assert(lex(f("xsd:double", s(" INF ")))._1 == Some("INF"))
    val bi = lex(f("xsd:integer", f("xsd:boolean", s("1"))))
    assert(bi._1 == Some("1") && bi._2 == Some(Term.XsdInteger))
  }
}
