package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Term
import graft.model.Term._
import graft.algebra.Algebra._

/** SPARQL expression evaluation as Catalyst Column combinators.
  *
  * Plays the role of the reference's expression evaluator
  * (oxigraph: lib/spareval/src/eval.rs, expression section) with the
  * error monad mapped onto SQL NULL: a SPARQL evaluation error is a NULL
  * term, which FILTER drops (EBV null) and BIND leaves unbound — exactly
  * the reference's error-propagation discipline (SURVEY.md §2.2, §2.8).
  *
  * All terms are Term.schema structs; every builtin both consumes and
  * produces term structs so expressions compose freely.
  */
object SparqlExpr {

  val nullTerm: Column = lit(null).cast(Term.schema)

  /** numeric promotion rank: integer(0) < decimal(1) < float(2) < double(3) */
  private def rank(t: Column): Column =
    when(t("dt") === XsdDouble, 3)
      .when(t("dt") === XsdFloat, 2)
      .when(t("dt") === XsdDecimal, 1)
      .when(t("dt").isin(numericTypes: _*), 0)
      .otherwise(lit(null).cast(IntegerType))

  private val DV = DecimalType(38, 12)
  /** exact numeric value (decimal) of a numeric literal, else null */
  def numDec(t: Column): Column =
    when(Term.isNumericLit(t), t("lex").try_cast(DV))
      .otherwise(lit(null).cast(DV))
  /** double numeric value of a numeric literal, else null. XSD spells
    * the special values INF/-INF (Spark's parser wants Infinity).
    */
  def numDbl(t: Column): Column =
    when(Term.isNumericLit(t),
      when(t("dt").isin(XsdDouble, XsdFloat) && t("lex") === "INF",
        lit(Double.PositiveInfinity))
        .when(t("dt").isin(XsdDouble, XsdFloat) && t("lex") === "-INF",
          lit(Double.NegativeInfinity))
        .otherwise(t("lex").try_cast(DoubleType)))
      .otherwise(lit(null).cast(DoubleType))

  /** XSD lexical form of a double value (INF/-INF/NaN canonical names). */
  def dblLex(c: Column): Column =
    when(isnan(c), lit("NaN"))
      .when(c === Double.PositiveInfinity, lit("INF"))
      .when(c === Double.NegativeInfinity, lit("-INF"))
      .otherwise(c.cast(StringType))

  /** xsd:float lexical: the double result rounded to f32 (XPath float
    * ops are performed in float precision; overflow becomes ±INF).
    */
  def fltLex(c: Column): Column = {
    val f = c.cast(FloatType)
    when(isnan(f), lit("NaN"))
      .when(f === Float.PositiveInfinity, lit("INF"))
      .when(f === Float.NegativeInfinity, lit("-INF"))
      .otherwise(f.cast(StringType))
  }

  /** Trailing timezone part of a temporal lexical form: "Z", "+05:00",
    * "" when absent (xsd:dateTime/date lexical space).
    */
  private val TzRe = "(Z|[+-]\\d{2}:\\d{2})$"
  private def tzPart(lex: Column): Column = regexp_extract(lex, TzRe, 1)

  /** Signed offset seconds of a timezone part ("" and "Z" are 0). */
  private def tzOffsetSecs(tz: Column): Column =
    when(tz === "" || tz === "Z", lit(0L))
      .otherwise(when(tz.startsWith("-"), -1L).otherwise(1L) *
        (substring(tz, 2, 2).cast(LongType) * 3600L +
          substring(tz, 5, 2).cast(LongType) * 60L))

  private val temporalTypes = Seq(XsdDateTime, XsdDate, XsdTime,
    XsdGYear, XsdGYearMonth, XsdGMonth, XsdGMonthDay, XsdGDay)

  /** Instant value of a temporal literal, timezone-normalized to UTC
    * (session timezone must be UTC — set by the entry points).
    * xsd:time and the 7-field G-types map onto the timeline with the
    * XSD reference fillers (time on an arbitrary shared date; month/day
    * types on 1972, a leap year, so --02-29 is valid). Cross-TYPE
    * comparability is enforced by the callers (cmpFamily), not here.
    */
  private def tsValRaw(t: Column, utcNormalize: Boolean): Column = {
    val lex = t("lex")
    val base = regexp_replace(lex, TzRe, "")
    val dt = t("dt")
    val full =
      when(dt.isin(XsdDateTime, XsdDate), base)
        .when(dt === XsdTime, concat(lit("1972-12-31T"), base))
        .when(dt === XsdGYear, concat(base, lit("-01-01")))
        .when(dt === XsdGYearMonth, concat(base, lit("-01")))
        .when(dt === XsdGMonthDay, concat(lit("1972-"),
          regexp_extract(base, "^--(\\d{2}-\\d{2})$", 1)))
        .when(dt === XsdGMonth, concat(lit("1972-"),
          regexp_extract(base, "^--(\\d{2})$", 1), lit("-01")))
        .when(dt === XsdGDay, concat(lit("1972-01-"),
          regexp_extract(base, "^---(\\d{2})$", 1)))
    val ts0 = try_to_timestamp(full, lit("yyyy-MM-dd['T'HH:mm:ss[.SSSSSS]]"))
    val res =
      if (utcNormalize)
        ts0 - make_dt_interval(lit(0), lit(0), lit(0),
          tzOffsetSecs(tzPart(lex)).cast(DecimalType(18, 6)))
      else ts0
    when(t("kind") === LiteralKind && dt.isin(temporalTypes: _*), res)
      .otherwise(lit(null).cast(TimestampType))
  }
  private def tsVal(t: Column): Column = tsValRaw(t, utcNormalize = true)
  /** Local (own-timezone) value — XPath component extraction reads the
    * value as written, not the UTC-normalized instant.
    */
  private def tsLocal(t: Column): Column = tsValRaw(t, utcNormalize = false)

  private def isDtLit(t: Column): Column =
    t("kind") === LiteralKind && t("dt").isin(XsdDateTime, XsdDate, XsdTime)
  private def isTemporalLit(t: Column): Column =
    t("kind") === LiteralKind && t("dt").isin(temporalTypes: _*)

  /** XSD temporal types are comparable only within one primitive type
    * (dateTime/date cross-comparison is kept as a documented deviation
    * the relational gates rely on).
    */
  private def cmpFamily(a: Column, b: Column): Column =
    (isDtLit(a) && isDtLit(b)) || a("dt") === b("dt")

  /** XSD §3.2.7.4 partial order: a timezone-less instant vs a
    * timezone'd one is indeterminate (=> SPARQL error) unless they lie
    * more than ±14 h apart on the timeline — the full range of legal
    * timezone offsets.
    */
  private def tzIndet(a: Column, b: Column): Column =
    ((tzPart(a("lex")) === "") =!= (tzPart(b("lex")) === "")) &&
      abs(unix_micros(tsVal(a)) - unix_micros(tsVal(b))) <=
        lit(14L * 3600L * 1000000L)
  private def isDurLit(t: Column): Column =
    t("kind") === LiteralKind &&
      t("dt").isin(XsdDayTimeDuration, XsdDuration, XsdYearMonthDuration)

  /** Signed total seconds (decimal) of a dayTimeDuration lexical form.
    * Minutes/seconds are extracted from the part after 'T' only — in
    * "P1M" the M is MONTHS, not minutes. Durations with year/month
    * fields (Y anywhere, M before T) have no fixed seconds value and
    * yield null (callers surface that as an evaluation error); the
    * reference evaluates yearMonthDuration arithmetic separately.
    */
  /** xsd:duration lexical space (at least one component present). */
  private val DurRe =
    "^-?P(?=.)(\\d+Y)?(\\d+M)?(\\d+D)?(T(?=.)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$"

  private def durSecs(lex: Column): Column = {
    val datePart = regexp_extract(lex, "^-?P([^T]*)", 1)
    val timePart = regexp_extract(lex, "T(.*)$", 1)
    def comp(src: Column, re: String): Column =
      coalesce(regexp_extract(src, re, 1).try_cast(DecimalType(38, 6)),
        lit(0).cast(DecimalType(38, 6)))
    val total = comp(datePart, "(\\d+)D") * 86400 +
      comp(timePart, "(\\d+)H") * 3600 + comp(timePart, "(\\d+)M") * 60 +
      comp(timePart, "(\\d+(?:\\.\\d+)?)S")
    when(datePart.rlike("[YM]"), lit(null).cast(DecimalType(38, 6)))
      .otherwise((when(lex.startsWith("-"), -1).otherwise(1) * total)
        .cast(DecimalType(38, 6)))
  }

  /** Canonical xsd:dayTimeDuration lexical form from signed seconds —
    * a native codegen'd expression (see DayTimeDurationLex for why the
    * pure-Column formulation was retired).
    */
  private def durLex(secs: Column): Column =
    DayTimeDurationLex.lex(secs.cast(DecimalType(38, 6)))

  /** Canonical dateTime lexical form of a timestamp: no fraction when
    * zero, micros with trailing zeros stripped otherwise; `tz` carries
    * the original timezone part ("" keeps the result zoneless, anything
    * else is rendered as the UTC-normalized "Z").
    */
  private def dtLexOut(ts: Column, tz: Column): Column = {
    val frac = date_format(ts, "SSSSSS")
    concat(
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
      when(frac =!= "000000",
        concat(lit("."), regexp_replace(frac, "0+$", ""))).otherwise(lit("")),
      when(tz === "", lit("")).otherwise(lit("Z")))
  }

  /** Signed total months of the year/month fields of a duration
    * lexical (the M before 'T' is months; after 'T' it is minutes).
    */
  private def durMonths(lex: Column): Column = {
    val datePart = regexp_extract(lex, "^-?P([^T]*)", 1)
    def comp(re: String): Column =
      coalesce(regexp_extract(datePart, re, 1).try_cast(LongType), lit(0L))
    when(lex.startsWith("-"), -1L).otherwise(1L) *
      (comp("(\\d+)Y") * 12L + comp("(\\d+)M"))
  }

  /** Signed day/time seconds of a duration lexical, Y/M fields allowed
    * alongside (unlike durSecs, which rejects them — full xsd:duration
    * arithmetic adds the month part separately).
    */
  private def durDtSecs(lex: Column): Column = {
    val datePart = regexp_extract(lex, "^-?P([^T]*)", 1)
    val timePart = regexp_extract(lex, "T(.*)$", 1)
    def comp(src: Column, re: String): Column =
      coalesce(regexp_extract(src, re, 1).try_cast(DecimalType(38, 6)),
        lit(0).cast(DecimalType(38, 6)))
    ((when(lex.startsWith("-"), -1).otherwise(1)) *
      (comp(datePart, "(\\d+)D") * 86400 + comp(timePart, "(\\d+)H") * 3600 +
        comp(timePart, "(\\d+)M") * 60 +
        comp(timePart, "(\\d+(?:\\.\\d+)?)S"))).cast(DecimalType(38, 6))
  }

  /** dateTime/date/time ± duration (XPath op:add-*Duration-to-*): the
    * month component applies first (calendar arithmetic with day
    * clamping, XSD 1.1 E.3.1 via Spark's year-month interval), then the
    * day/time seconds; keeps the argument's datatype, normalizes any
    * timezone to Z. A month component on xsd:dayTimeDuration (or a
    * day/time component on xsd:yearMonthDuration) violates that type's
    * lexical space and errors.
    */
  private def dtPlusDur(t: Column, dur: Column, negate: Boolean): Column = {
    val sgn = if (negate) -1 else 1
    val months = durMonths(dur("lex")) * sgn
    val secs = durDtSecs(dur("lex")) * sgn
    val badType =
      (dur("dt") === XsdDayTimeDuration && months =!= 0L) ||
        (dur("dt") === XsdYearMonthDuration && secs =!= 0)
    val res0 = tsVal(t) + make_ym_interval(lit(0),
      months.cast(IntegerType)) + make_dt_interval(lit(0), lit(0), lit(0),
      secs.cast(DecimalType(18, 6)))
    val res = when(badType, lit(null).cast(TimestampType)).otherwise(res0)
    when(res.isNull, nullTerm)
      .when(t("dt") === XsdDate,
        Term.typedLit(
          concat(date_format(res, "yyyy-MM-dd"),
            when(tzPart(t("lex")) === "", lit("")).otherwise(lit("Z"))),
          XsdDate))
      // op:add-dayTimeDuration-to-time: arithmetic modulo 24 h — taking
      // the time-of-day of the shifted instant IS the mod (the filler
      // date absorbs day rollover)
      .when(t("dt") === XsdTime, {
        val frac = date_format(res, "SSSSSS")
        Term.typedLit(concat(
          date_format(res, "HH:mm:ss"),
          when(frac =!= "000000",
            concat(lit("."), regexp_replace(frac, "0+$", "")))
            .otherwise(lit("")),
          when(tzPart(t("lex")) === "", lit("")).otherwise(lit("Z"))),
          XsdTime)
      })
      .otherwise(Term.typedLit(dtLexOut(res, tzPart(t("lex"))), XsdDateTime))
  }

  /** dateTime - dateTime -> xsd:dayTimeDuration (op:subtract-dateTimes). */
  private def dtMinusDt(a: Column, b: Column): Column = {
    val secs = ((unix_micros(tsVal(a)) - unix_micros(tsVal(b)))
      .cast(DecimalType(38, 6)) / 1000000L).cast(DecimalType(38, 6))
    when(tsVal(a).isNull || tsVal(b).isNull, nullTerm)
      // time-of-day only subtracts against time-of-day (the filler date
      // would otherwise leak into a time - dateTime difference)
      .when((a("dt") === XsdTime) =!= (b("dt") === XsdTime), nullTerm)
      .otherwise(Term.typedLit(durLex(secs), XsdDayTimeDuration))
  }

  private def isStrTerm(t: Column): Column =
    t("kind") === LiteralKind && t("dt").isin(
      XsdString, RdfLangString, RdfDirLangString)

  /** Canonical N-Triples token of a term column (mirrors
    * QuotedTriple.renderTerm exactly — both sides of the quoted-triple
    * codec must agree byte-for-byte for equality to stay structural).
    */
  private def ntEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
  def ntToken(t: Column): Column =
    when(t("kind") === IriKind, concat(lit("<"), t("lex"), lit(">")))
      .when(t("kind") === BlankKind, concat(lit("_:"), t("lex")))
      .when(t("kind") === QuotedKind, t("lex"))
      .otherwise(concat(lit("\""), ntEscape(t("lex")), lit("\""),
        when(t("lang").isNotNull, concat(lit("@"), t("lang")))
          .when(t("dt").isNotNull && t("dt") =!= XsdString,
            concat(lit("^^<"), t("dt"), lit(">")))
          .otherwise(lit(""))))

  /** One component of a quoted-triple term (SUBJECT/PREDICATE/OBJECT). */
  private def quotedPart(t: Column, field: String): Column =
    when(t.isNull || t("kind") =!= QuotedKind, nullTerm)
      .otherwise(QuotedParts.parts(t("lex"))(field))

  /** Effective boolean value (SPARQL §17.2.2); evaluation error => null. */
  def ebv(t: Column): Column =
    when(t.isNull, lit(null).cast(BooleanType))
      .when(t("kind") =!= LiteralKind, lit(null).cast(BooleanType))
      .when(t("dt") === XsdBoolean, t("lex").isin("true", "1"))
      .when(t("dt").isin(XsdDouble, XsdFloat),
        !isnan(t("lex").try_cast(DoubleType)) &&
          coalesce(t("lex").try_cast(DoubleType) =!= 0.0, lit(false)))
      .when(t("dt").isin(numericTypes: _*),
        coalesce(t("lex").try_cast(DV) =!= 0, lit(false)))
      .when(t("dt").isin(XsdString, RdfLangString, RdfDirLangString),
        length(t("lex")) > 0)
      .otherwise(lit(null).cast(BooleanType))

  /** Wrap a (possibly-null) boolean column as an xsd:boolean term. */
  def boolTerm(c: Column): Column =
    when(c.isNull, nullTerm)
      .otherwise(Term.boolLit(when(c, "true").otherwise("false")))

  /** RDF term equality (sameTerm): structural struct equality. */
  def sameTerm(a: Column, b: Column): Column = a <=> b

  /** SPARQL value equality `=`: numeric by value w/ promotion, strings by
    * lex+lang, datetimes by instant, IRIs/bnodes structurally; incompatible
    * literal comparisons are errors (null).
    */
  def valueEq(a: Column, b: Column): Column = {
    val bothNum = Term.isNumericLit(a) && Term.isNumericLit(b)
    val bothTs = tsVal(a).isNotNull && tsVal(b).isNotNull
    when(a.isNull || b.isNull, lit(null).cast(BooleanType))
      .when(bothNum,
        when(rank(a) >= 2 || rank(b) >= 2, numDbl(a) === numDbl(b))
          .otherwise(numDec(a) === numDec(b)))
      .when(bothTs && !cmpFamily(a, b), lit(null).cast(BooleanType))
      .when(bothTs && tzIndet(a, b), lit(null).cast(BooleanType))
      .when(bothTs, tsVal(a) === tsVal(b))
      // op:duration-equal compares the months and seconds fields
      // separately, across subtypes (P0Y = PT0S; P1D = PT24H)
      .when(isDurLit(a) && isDurLit(b),
        durMonths(a("lex")) === durMonths(b("lex")) &&
          durDtSecs(a("lex")) === durDtSecs(b("lex")))
      .when(isStrTerm(a) && isStrTerm(b),
        a("lex") === b("lex") && coalesce(a("lang") === b("lang"),
          a("lang").isNull && b("lang").isNull))
      .when(a("dt") === XsdBoolean && b("dt") === XsdBoolean,
        a("lex").isin("true", "1") === b("lex").isin("true", "1"))
      .when(a("kind") =!= LiteralKind || b("kind") =!= LiteralKind, a <=> b)
      .when(a("dt") === b("dt"), a("lex") === b("lex"))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** SPARQL order comparison a < b (value spaces only; incomparable => null). */
  def valueLt(a: Column, b: Column): Column = {
    val bothNum = Term.isNumericLit(a) && Term.isNumericLit(b)
    val bothTs = tsVal(a).isNotNull && tsVal(b).isNotNull
    when(a.isNull || b.isNull, lit(null).cast(BooleanType))
      .when(bothNum,
        when(rank(a) >= 2 || rank(b) >= 2, numDbl(a) < numDbl(b))
          .otherwise(numDec(a) < numDec(b)))
      .when(bothTs && !cmpFamily(a, b), lit(null).cast(BooleanType))
      .when(bothTs && tzIndet(a, b), lit(null).cast(BooleanType))
      .when(bothTs, tsVal(a) < tsVal(b))
      // duration order exists within each subtype only (XPath defines
      // lt for yearMonthDuration and dayTimeDuration, not xsd:duration)
      .when(a("dt") === XsdDayTimeDuration && b("dt") === XsdDayTimeDuration,
        durDtSecs(a("lex")) < durDtSecs(b("lex")))
      .when(a("dt") === XsdYearMonthDuration &&
        b("dt") === XsdYearMonthDuration,
        durMonths(a("lex")) < durMonths(b("lex")))
      .when(isStrTerm(a) && isStrTerm(b), a("lex") < b("lex"))
      .when(a("dt") === XsdBoolean && b("dt") === XsdBoolean,
        !a("lex").isin("true", "1") && b("lex").isin("true", "1"))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** Total SPARQL ORDER BY key: unbound < blank < IRI < literal; literals
    * ranked numeric/temporal/string within (SURVEY.md §2.5). One orderable
    * struct reused by OrderBy, MIN/MAX and top-k.
    */
  def sortKey(t: Column, cls: Option[VClass] = None): Column = struct(
    when(t.isNull, 0).when(t("kind") === BlankKind, 1)
      .when(t("kind") === IriKind, 2)
      // quoted triples order after literals (SPARQL 1.2 extended
      // ordering); within the bucket the canonical lex is the tiebreak
      .when(t("kind") === QuotedKind, 4)
      .otherwise(3).as("cls"),
    // static class pruning: a known value space makes the other rank
    // branches dead code (VNum drops the tsVal regex/timestamp tree —
    // the hottest expression in ORDER BY over measures)
    (cls match {
      case Some(VNum) =>
        coalesce(when(Term.isNumericLit(t), numDbl(t)), lit(Double.MaxValue))
      case Some(VTemporal) => coalesce(
        when(tsVal(t).isNotNull, unix_timestamp(tsVal(t)).cast(DoubleType)),
        lit(Double.MaxValue))
      // booleans order by VALUE (false < true): the lex tiebreak alone
      // inverts non-canonical lexicals ("1"^^xsd:boolean before "false")
      case Some(VBool) => coalesce(
        when(t("dt") === XsdBoolean,
          when(t("lex").isin("true", "1"), 1.0d).otherwise(0.0d)),
        lit(Double.MaxValue))
      case Some(_) => lit(Double.MaxValue)
      case None => coalesce(
        when(Term.isNumericLit(t), numDbl(t)),
        when(t("dt") === XsdBoolean,
          when(t("lex").isin("true", "1"), 1.0d).otherwise(0.0d)),
        // duration subtypes order by value within their space, like
        // valueLt (PT10H after PT2H; the lex tiebreak would invert)
        when(t("dt") === XsdDayTimeDuration,
          durDtSecs(t("lex")).cast(DoubleType)),
        when(t("dt") === XsdYearMonthDuration,
          durMonths(t("lex")).cast(DoubleType)),
        when(tsVal(t).isNotNull, unix_timestamp(tsVal(t)).cast(DoubleType)),
        lit(Double.MaxValue))
    }).as("num"),
    // exact-decimal tiebreak: integers beyond 2^53 compare equal in the
    // double rank; the DV value keeps them totally ordered (rounding to
    // double is monotone, so num-then-numx is consistent)
    (cls match {
      case Some(VNum) | None =>
        coalesce(when(Term.isNumericLit(t), numDec(t)), lit(0).cast(DV))
      case Some(_) => lit(0).cast(DV)
    }).as("numx"),
    coalesce(t("lex"), lit("")).as("lex"),
    coalesce(t("dt"), lit("")).as("dt"),
    coalesce(t("lang"), lit("")).as("lang"))

  /** Numeric binary op with XSD promotion (int/int division -> decimal;
    * integer ops stay integer; float/double compute in double).
    */
  def arith(op: String, a: Column, b: Column): Column = {
    val r = greatest(rank(a), rank(b))
    val bothNum = Term.isNumericLit(a) && Term.isNumericLit(b)
    def dop(x: Column, y: Column): Column = op match {
      case "+" => x + y
      case "-" => x - y
      case "*" => x * y
      // XPath op:numeric-divide: float/double division by zero is IEEE
      // (±INF, NaN), never an error — only the exact branches error.
      // `y === 0.0` also matches -0.0, whose sign must flip the INF
      // (IEEE sign(x/y) = sign(x)*sign(y)); the zero's sign survives
      // only in its string form.
      case "/" =>
        val zsign =
          when(y.cast(StringType).startsWith("-"), -1.0d).otherwise(1.0d)
        when(y === 0.0,
          when(x > 0, zsign * Double.PositiveInfinity)
            .when(x < 0, zsign * Double.NegativeInfinity)
            .otherwise(lit(Double.NaN)))
          .otherwise(x / y)
    }
    def decop(x: Column, y: Column): Column = op match {
      case "+" => (x + y).cast(DV)
      case "-" => (x - y).cast(DV)
      case "*" => (x * y).cast(DV)
      case "/" => when(y === 0, lit(null).cast(DV)).otherwise((x / y).cast(DV))
    }
    val decRes = decop(numDec(a), numDec(b))
    val dblRes = dop(numDbl(a), numDbl(b))
    val intResult = rank(a) === 0 && rank(b) === 0 && lit(op != "/")
    when(!bothNum || a.isNull || b.isNull, nullTerm)
      .when(r === 3,
        when(dblRes.isNull, nullTerm)
          .otherwise(Term.typedLit(dblLex(dblRes), XsdDouble)))
      // XPath promotion: float∘float (or float∘exact) stays xsd:float
      .when(r === 2,
        when(dblRes.isNull, nullTerm)
          .otherwise(Term.typedLit(fltLex(dblRes), XsdFloat)))
      .when(intResult && decRes.isNotNull,
        Term.intLit(decRes.cast(DecimalType(38, 0)).cast(LongType)))
      .otherwise(when(decRes.isNull, nullTerm)
        .otherwise(Term.decimalLit(decLex(decRes))))
  }

  /** Compile an algebra expression to a term-struct Column.
    * `bind`: variable name -> term column (missing => unbound/null).
    * EExists must be rewritten to joins by the Translator before compile.
    *
    * Boolean-valued operators route through compileBool and only wrap in
    * a term struct at the boundary: ebv(boolTerm(x)) round-trips would
    * otherwise multiply the argument tree ~10x per nesting level, which
    * after Catalyst's projection collapse becomes an exponentially large
    * expression (a real OOM on 3-deep boolean filters).
    */
  def compile(e: Expr, bind: String => Option[Column],
      hint: String => Option[VClass] = noHints): Column = {
    def c(x: Expr): Column = compile(x, bind, hint)
    e match {
      case EVar(n) => bind(n).getOrElse(nullTerm)
      case EIri(i) => Term.iri(i)
      case ELit(lex, dt, lang) => lang match {
        case Some(l) => Term.taggedLit(lit(lex), l)
        case None => Term.typedLit(lit(lex), dt)
      }
      case EExists(_, _) =>
        throw new IllegalStateException(
          "EXISTS must be rewritten to a semi/anti join by the Translator")
      case EFn("IF", cond, t, f) =>
        // SPARQL §17.4.1.2: an error in the condition propagates (it does
        // NOT select the else branch).
        val cb = compileBool(cond, bind, hint)
        when(cb, c(t)).when(!cb, c(f)).otherwise(nullTerm)
      case EFn(op @ ("+" | "-"), x, y) =>
        compileArith(op, x, y, bind)
      case EFn(name, _*) if boolFns(name) =>
        boolTerm(compileBool(e, bind, hint))
      case EFn(name, args @ _*) => fn(name, args.map(c))
    }
  }

  private val boolFns = Set("&&", "||", "!", "=", "!=", "<", ">", "<=", ">=",
    "IN", "BOUND", "sameTerm", "isIRI", "isBlank", "isLiteral", "isNumeric",
    "CONTAINS", "STRSTARTS", "STRENDS", "REGEX", "LANGMATCHES")

  /** Statically-known datatype of an expression, when the syntax fixes it
    * (a literal, a constructor cast) — a micro type-inference in the
    * spirit of the reference's sparopt lattice. Used to prune dead
    * branches from the +/- dispatch: the full numeric-promotion tree AND
    * both temporal trees inlined per operator blow whole-stage codegen
    * past the JVM's 64 KB method limit (observed on the date-arith gate
    * query; Spark then falls back to interpreted execution).
    */
  private def staticDt(e: Expr): Option[String] = e match {
    case ELit(_, dt, None) => Some(dt)
    case ELit(_, _, Some(l)) =>
      Some(if (l.contains("--")) RdfDirLangString else RdfLangString)
    case EFn("xsd:dateTime", _*) => Some(XsdDateTime)
    case EFn("xsd:date", _*) => Some(XsdDate)
    case EFn("xsd:integer", _*) => Some(XsdInteger)
    case EFn("xsd:decimal", _*) => Some(XsdDecimal)
    case EFn("xsd:double", _*) => Some(XsdDouble)
    case EFn("xsd:float", _*) => Some(XsdFloat)
    case EFn("STR", _*) => Some(XsdString)
    case EFn("STRLEN", _*) => Some(XsdInteger)
    case _ => None
  }
  private def isDurType(dt: String): Boolean =
    dt == XsdDayTimeDuration || dt == XsdDuration ||
      dt == XsdYearMonthDuration
  private def isDtType(dt: String): Boolean =
    dt == XsdDateTime || dt == XsdDate || dt == XsdTime
  private def isNumType(dt: String): Boolean = numericTypes.contains(dt)

  /** Value-space class for comparison pruning. */
  /** No-inference hint (the default for every caller without a Sol). */
  val noHints: String => Option[VClass] = _ => None

  /** Static value-space class: from the expression's own syntax, or —
    * for a variable — from the caller's inference lattice (predicate
    * catalog / BIND / aggregate classes threaded through the Sol).
    */
  private def staticClass(e: Expr,
      hint: String => Option[VClass]): Option[VClass] = e match {
    case EVar(n) => hint(n)
    case _ => staticDt(e).map { dt =>
      if (isNumType(dt)) VNum
      else if (isDtType(dt) || temporalTypes.contains(dt)) VTemporal
      else if (dt == XsdString || dt == RdfLangString ||
        dt == RdfDirLangString) VStr
      else if (dt == XsdBoolean) VBool
      else VOther
    }
  }

  /** Class of an expression a Translator Extend binds (public face of
    * staticClass for the Sol lattice).
    */
  def exprClass(e: Expr,
      hint: String => Option[VClass]): Option[VClass] = staticClass(e, hint)

  /** Comparison hint: the single value-space class both operands must
    * inhabit for the comparison to succeed, when one side's syntax (or
    * inferred variable class) fixes it. None = full dynamic dispatch.
    */
  private def cmpHint(x: Expr, y: Expr,
      hint: String => Option[VClass]): Option[VClass] =
    (staticClass(x, hint), staticClass(y, hint)) match {
      case (Some(a), Some(b)) => if (a == b && a != VOther) Some(a) else None
      case (Some(a), None) if a != VOther => Some(a)
      case (None, Some(b)) if b != VOther => Some(b)
      case _ => None
    }

  private def nullBool: Column = lit(null).cast(BooleanType)

  /** valueLt restricted to one value space (the other branches are
    * statically dead — prunes tsVal's regex/timestamp trees from every
    * numeric filter, the hottest expression path in the gate suite).
    */
  private def valueLtHint(a: Column, b: Column, cls: VClass): Column =
    cls match {
      case VNum =>
        when(a.isNull || b.isNull, nullBool)
          .when(Term.isNumericLit(a) && Term.isNumericLit(b),
            when(rank(a) >= 2 || rank(b) >= 2, numDbl(a) < numDbl(b))
              .otherwise(numDec(a) < numDec(b)))
          .otherwise(nullBool)
      case VTemporal =>
        when(a.isNull || b.isNull, nullBool)
          .when(tsVal(a).isNotNull && tsVal(b).isNotNull,
            when(!cmpFamily(a, b) || tzIndet(a, b), nullBool)
              .otherwise(tsVal(a) < tsVal(b)))
          .otherwise(nullBool)
      case VStr =>
        when(a.isNull || b.isNull, nullBool)
          .when(isStrTerm(a) && isStrTerm(b), a("lex") < b("lex"))
          .otherwise(nullBool)
      case VBool =>
        when(a.isNull || b.isNull, nullBool)
          .when(a("dt") === XsdBoolean && b("dt") === XsdBoolean,
            !a("lex").isin("true", "1") && b("lex").isin("true", "1"))
          .otherwise(nullBool)
      case VOther => valueLt(a, b)
    }

  /** valueEq restricted to one value space; kind mismatches stay plain
    * structural inequality (false), incompatible literals stay errors.
    */
  private def valueEqHint(a: Column, b: Column, cls: VClass): Column =
    cls match {
      case VNum =>
        when(a.isNull || b.isNull, nullBool)
          .when(Term.isNumericLit(a) && Term.isNumericLit(b),
            when(rank(a) >= 2 || rank(b) >= 2, numDbl(a) === numDbl(b))
              .otherwise(numDec(a) === numDec(b)))
          .when(a("kind") =!= LiteralKind || b("kind") =!= LiteralKind, a <=> b)
          .otherwise(nullBool)
      case VTemporal =>
        when(a.isNull || b.isNull, nullBool)
          .when(tsVal(a).isNotNull && tsVal(b).isNotNull,
            when(!cmpFamily(a, b) || tzIndet(a, b), nullBool)
              .otherwise(tsVal(a) === tsVal(b)))
          .when(a("kind") =!= LiteralKind || b("kind") =!= LiteralKind, a <=> b)
          .otherwise(nullBool)
      case VStr =>
        when(a.isNull || b.isNull, nullBool)
          .when(isStrTerm(a) && isStrTerm(b),
            a("lex") === b("lex") && coalesce(a("lang") === b("lang"),
              a("lang").isNull && b("lang").isNull))
          .when(a("kind") =!= LiteralKind || b("kind") =!= LiteralKind, a <=> b)
          .otherwise(nullBool)
      case VBool =>
        when(a.isNull || b.isNull, nullBool)
          .when(a("dt") === XsdBoolean && b("dt") === XsdBoolean,
            a("lex").isin("true", "1") === b("lex").isin("true", "1"))
          .when(a("kind") =!= LiteralKind || b("kind") =!= LiteralKind, a <=> b)
          .otherwise(nullBool)
      case VOther => valueEq(a, b)
    }

  /** `+`/`-` with static-type pruning; falls back to the full dynamic
    * dispatch (fn) only when neither argument's value space is known.
    */
  private def compileArith(op: String, x: Expr, y: Expr,
      bind: String => Option[Column]): Column = {
    val cx = compile(x, bind); val cy = compile(y, bind)
    val neg = op == "-"
    (staticDt(x), staticDt(y)) match {
      case (Some(a), _) if isNumType(a) => arith(op, cx, cy)
      case (_, Some(b)) if isNumType(b) => arith(op, cx, cy)
      case (_, Some(b)) if isDurType(b) => dtPlusDur(cx, cy, negate = neg)
      case (Some(a), _) if isDurType(a) && !neg =>
        dtPlusDur(cy, cx, negate = false)
      case (Some(a), Some(b)) if isDtType(a) && isDtType(b) && neg =>
        dtMinusDt(cx, cy)
      case (Some(a), _) if isDtType(a) && neg =>
        when(isDurLit(cy), dtPlusDur(cx, cy, negate = true))
          .when(isDtLit(cy), dtMinusDt(cx, cy))
          .otherwise(nullTerm)
      case (Some(a), _) if isDtType(a) =>
        when(isDurLit(cy), dtPlusDur(cx, cy, negate = false))
          .otherwise(nullTerm)
      case (_, Some(b)) if isDtType(b) && neg =>
        when(isDtLit(cx), dtMinusDt(cx, cy)).otherwise(nullTerm)
      case (_, Some(b)) if isDtType(b) =>
        when(isDurLit(cx), dtPlusDur(cy, cx, negate = false))
          .otherwise(nullTerm)
      case _ => fn(op, Seq(cx, cy))
    }
  }

  /** Compile a boolean-valued expression directly to a Boolean column
    * (SQL NULL three-valued logic == SPARQL error semantics: error&&false
    * = false, error||true = true). Non-boolean expressions fall back to
    * EBV of their term value.
    */
  def compileBool(e: Expr, bind: String => Option[Column],
      hint: String => Option[VClass] = noHints): Column = {
    def b(x: Expr): Column = compileBool(x, bind, hint)
    def c(x: Expr): Column = compile(x, bind, hint)
    def eqC(x: Expr, y: Expr): Column = cmpHint(x, y, hint) match {
      case Some(k) => valueEqHint(c(x), c(y), k)
      case None => valueEq(c(x), c(y))
    }
    def ltC(x: Expr, y: Expr): Column = cmpHint(x, y, hint) match {
      case Some(k) => valueLtHint(c(x), c(y), k)
      case None => valueLt(c(x), c(y))
    }
    e match {
      case EFn("&&", x, y) => b(x) && b(y)
      case EFn("||", x, y) => b(x) || b(y)
      case EFn("!", x) => !b(x)
      case EFn("=", x, y) => eqC(x, y)
      case EFn("!=", x, y) => !eqC(x, y)
      case EFn("<", x, y) => ltC(x, y)
      case EFn(">", x, y) => ltC(y, x)
      case EFn("<=", x, y) => !ltC(y, x)
      case EFn(">=", x, y) => !ltC(x, y)
      // `x IN ()` is the empty disjunction: false for every x (§17.4.1.9)
      case EFn("IN", args @ _*) if args.lengthCompare(1) == 0 => lit(false)
      case EFn("IN", args @ _*) =>
        val h = c(args.head)
        args.tail.map(x => cmpHint(args.head, x, hint) match {
          case Some(k) => valueEqHint(h, c(x), k)
          case None => valueEq(h, c(x))
        }).reduce(_ || _)
      case EFn("BOUND", x) => c(x).isNotNull
      case EFn("sameTerm", x, y) => sameTerm(c(x), c(y))
      // other EFns compile via the builtin table (NOT via compile(), which
      // would route boolean fns back here)
      case EFn(name, args @ _*) => ebv(fn(name, args.map(c)))
      case _ => ebv(c(e))
    }
  }

  /** Custom function registry — the extension point the reference exposes
    * as QueryEvaluator::with_custom_function (oxigraph: lib/spareval;
    * SURVEY.md §2.12): an IRI (or name) mapped to a Column combinator
    * over term structs. Registered names win over nothing — builtins are
    * matched first, customs resolve what the builtin table misses.
    */
  private val customFns =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Column] => Column]

  def registerFunction(name: String, f: Seq[Column] => Column): Unit =
    customFns(name) = f

  /** Custom aggregate registry — the reference's
    * QueryEvaluator::with_custom_aggregate_function (oxigraph:
    * lib/spareval; SURVEY.md §2.12): a name mapped to an aggregate Column
    * combinator (value column, DISTINCT?) -> term-struct result. Built
    * from org.apache.spark.sql.functions aggregates or a
    * functions.udaf(Aggregator) — both stay whole-plan Catalyst.
    */
  private val customAggs = scala.collection.concurrent.TrieMap
    .empty[String, (Column, Boolean) => Column]

  def registerAggregate(name: String, f: (Column, Boolean) => Column): Unit =
    customAggs(name) = f

  def customAggregate(name: String): Option[(Column, Boolean) => Column] =
    customAggs.get(name)

  /** Builtin dispatch (SPARQL 1.1 §17.4 <-> SURVEY.md §2.8). */
  def fn(name: String, a: Seq[Column]): Column = name match {
    // logic — 3-valued with error=null; error && false = false
    case "&&" => boolTerm(ebv(a(0)) && ebv(a(1)))
    case "||" => boolTerm(ebv(a(0)) || ebv(a(1)))
    case "!" => boolTerm(!ebv(a(0)))
    case "IF" =>
      when(ebv(a(0)), a(1)).when(!ebv(a(0)), a(2)).otherwise(nullTerm)
    // grammatical zero-arg form: no expression produces a value -> error
    case "COALESCE" => if (a.isEmpty) nullTerm else coalesce(a: _*)
    case "BOUND" => boolTerm(a(0).isNotNull)
    // comparison
    case "=" => boolTerm(valueEq(a(0), a(1)))
    case "!=" => boolTerm(!valueEq(a(0), a(1)))
    case "<" => boolTerm(valueLt(a(0), a(1)))
    case ">" => boolTerm(valueLt(a(1), a(0)))
    case "<=" => boolTerm(!valueLt(a(1), a(0)))
    case ">=" => boolTerm(!valueLt(a(0), a(1)))
    case "IN" => // `x IN ()`: empty disjunction -> false (§17.4.1.9)
      if (a.lengthCompare(1) == 0) boolTerm(lit(false))
      else boolTerm(a.tail.map(x => valueEq(a(0), x))
        .reduce((x, y) => x || y))
    case "sameTerm" => boolTerm(sameTerm(a(0), a(1)))
    // term tests / accessors / constructors
    case "isIRI" => boolTerm(when(a(0).isNull, lit(null).cast(BooleanType))
      .otherwise(a(0)("kind") === IriKind))
    case "isBlank" => boolTerm(when(a(0).isNull, lit(null).cast(BooleanType))
      .otherwise(a(0)("kind") === BlankKind))
    case "isLiteral" => boolTerm(when(a(0).isNull, lit(null).cast(BooleanType))
      .otherwise(a(0)("kind") === LiteralKind))
    case "isNumeric" => boolTerm(when(a(0).isNull, lit(null).cast(BooleanType))
      .otherwise(Term.isNumericLit(a(0))))
    // RDF-star (SPARQL 1.2 §17.4.2.8-ish; oxigraph TRIPLE/SUBJECT/...)
    case "isTRIPLE" => boolTerm(when(a(0).isNull, lit(null).cast(BooleanType))
      .otherwise(a(0)("kind") === QuotedKind))
    case "TRIPLE" =>
      // subject must be IRI/bnode/quoted, predicate an IRI, else error
      when(a(0).isNull || a(1).isNull || a(2).isNull ||
        a(0)("kind") === LiteralKind || a(1)("kind") =!= IriKind, nullTerm)
        .otherwise(Term.quoted(concat(lit("<< "), ntToken(a(0)), lit(" "),
          ntToken(a(1)), lit(" "), ntToken(a(2)), lit(" >>"))))
    case "SUBJECT" => quotedPart(a(0), "s")
    case "PREDICATE" => quotedPart(a(0), "p")
    case "OBJECT" => quotedPart(a(0), "o")
    case "STR" => when(a(0).isNull || a(0)("kind") === BlankKind, nullTerm)
      .otherwise(Term.strLit(a(0)("lex")))
    // LANG strips a dirLangString's `--dir` suffix: the base language
    // only ("--" cannot occur inside a plain tag, so substring_index
    // is exact; with no "--" it returns the whole tag)
    case "LANG" => when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
      .otherwise(Term.strLit(
        substring_index(coalesce(a(0)("lang"), lit("")), "--", 1)))
    // SPARQL 1.2: base direction of a literal — "ltr"/"rtl" for
    // rdf:dirLangString, "" for every other literal, error otherwise
    case "LANGDIR" =>
      when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
        .otherwise(Term.strLit(
          when(coalesce(a(0)("lang"), lit("")).contains("--"),
            substring_index(a(0)("lang"), "--", -1)).otherwise(lit(""))))
    // SPARQL 1.2: does the literal carry a language tag / a direction?
    case "hasLANG" => boolTerm(
      when(a(0).isNull || a(0)("kind") =!= LiteralKind,
        lit(null).cast(BooleanType))
        .otherwise(a(0)("lang").isNotNull))
    case "hasLANGDIR" => boolTerm(
      when(a(0).isNull || a(0)("kind") =!= LiteralKind,
        lit(null).cast(BooleanType))
        .otherwise(coalesce(a(0)("lang"), lit("")).contains("--")))
    case "DATATYPE" => when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
      .otherwise(Term.iri(a(0)("dt")))
    case "IRI" => when(a(0).isNull, nullTerm)
      .when(a(0)("kind") === IriKind, a(0))
      .when(isStrTerm(a(0)), Term.iri(a(0)("lex")))
      .otherwise(nullTerm)
    case "BNODE" if a.isEmpty => Term.bnode(expr("uuid()"))
    // labeled form (§17.4.2.9): same label -> same bnode within one
    // solution, distinct across solutions — a row-unique id salts the
    // label so the mapping is per-row stable and cross-row fresh
    case "BNODE" =>
      when(a(0).isNull || !isStrTerm(a(0)), nullTerm)
        .otherwise(Term.bnode(concat(lit("bl"), md5(concat(a(0)("lex"),
          lit("#"), monotonically_increasing_id().cast(StringType))))))
    case "STRDT" => when(isStrTerm(a(0)) && a(1)("kind") === IriKind,
      Term.typedLit(a(0)("lex"), "")
        .withField("dt", a(1)("lex"))).otherwise(nullTerm)
    // a tag containing "--" would collide with the dirLangString
    // encoding (use STRLANGDIR for that) — error like other bad args
    case "STRLANG" => when(isStrTerm(a(0)) && isStrTerm(a(1)) &&
      !a(1)("lex").contains("--"),
      Term.langLit(a(0)("lex"), a(1)("lex"))).otherwise(nullTerm)
    // SPARQL 1.2: directional language-tagged string constructor;
    // the direction must be exactly "ltr" or "rtl"
    case "STRLANGDIR" => when(isStrTerm(a(0)) && isStrTerm(a(1)) &&
      isStrTerm(a(2)) && !a(1)("lex").contains("--") &&
      a(2)("lex").isin("ltr", "rtl"),
      Term.dirLangLit(a(0)("lex"), a(1)("lex"), a(2)("lex")))
      .otherwise(nullTerm)
    case "UUID" => Term.iri(concat(lit("urn:uuid:"), expr("uuid()")))
    case "STRUUID" => Term.strLit(expr("uuid()"))
    // strings (argument-compatibility: both plain or same-lang)
    case "STRLEN" => strFn1(a(0))(l => Term.intLit(length(l)))
    case "UCASE" => strPreserve(a(0))(upper)
    case "LCASE" => strPreserve(a(0))(lower)
    case "SUBSTR" =>
      if (a.length == 3) strPreserveDyn(a(0), substring3(_, a(1), a(2)))
      else strPreserveDyn(a(0), substring2(_, a(1)))
    case "CONCAT" if a.isEmpty =>
      // CONCAT() — grammatical (ExpressionList ::= NIL) — is the empty
      // simple literal (fn:concat with zero args)
      Term.strLit(lit(""))
    case "CONCAT" =>
      // §17.4.3.12: a language tag survives only when EVERY argument
      // carries that same tag; any plain/xsd:string argument (or a tag
      // mismatch) degrades the result to a simple literal
      val clex = concat(a.map(_("lex")): _*)
      val l0 = a.head("lang")
      val sameLang = l0.isNotNull && a.map(x => x("lang") <=> l0)
        .reduce(_ && _)
      // taggedLitCol keeps a shared `lang--dir` tag a dirLangString
      // (direction survives only when every argument carries it)
      when(a.map(isStrTerm).reduce(_ && _),
        when(sameLang, Term.taggedLitCol(clex, l0)).otherwise(Term.strLit(clex)))
        .otherwise(nullTerm)
    case "CONTAINS" => str2Bool(a(0), a(1))((x, y) => x.contains(y))
    case "STRSTARTS" => str2Bool(a(0), a(1))((x, y) => x.startsWith(y))
    case "STRENDS" => str2Bool(a(0), a(1))((x, y) => x.endsWith(y))
    // §17.4.3.14/15: match (incl. empty needle) keeps arg1's lang/
    // datatype; NO match yields the SIMPLE literal "" (not ""@lang);
    // incompatible argument languages are an error (§17.4.3.1)
    case "STRBEFORE" => strCut(a(0), a(1),
      (x, n) => substring(x, lit(1), instr(x, n) - 1))
    case "STRAFTER" => strCut(a(0), a(1),
      (x, n) => x.substr(instr(x, n) + length(n), lit(Int.MaxValue)))
    case "ENCODE_FOR_URI" => strFn1(a(0))(l =>
      Term.strLit(url_encode_rfc3986(l)))
    case "REGEX" =>
      val flags = if (a.length > 2) a(2)("lex") else lit("")
      boolTerm(when(!isStrTerm(a(0)), lit(null).cast(BooleanType))
        .otherwise(regexp_like(a(0)("lex"),
          concat(when(length(flags) > 0, concat(lit("(?"), flags, lit(")")))
            .otherwise(lit("")), a(1)("lex")))))
    case "REPLACE" =>
      val flags = if (a.length > 3) a(3)("lex") else lit("")
      val pat = concat(
        when(length(flags) > 0, concat(lit("(?"), flags, lit(")")))
          .otherwise(lit("")), a(1)("lex"))
      // fn:replace FORX0003: a pattern that matches the zero-length
      // string is an error (Java regex would instead interleave the
      // replacement at every position)
      when(regexp_like(lit(""), pat), nullTerm)
        .otherwise(strPreserveDyn(a(0),
          x => regexp_replace(x, pat, a(2)("lex"))))
    case "LANGMATCHES" =>
      boolTerm(when(!isStrTerm(a(0)) || !isStrTerm(a(1)),
        lit(null).cast(BooleanType))
        .otherwise(a(1)("lex") === "*" && length(a(0)("lex")) > 0 ||
          lower(a(0)("lex")) === lower(a(1)("lex")) ||
          lower(a(0)("lex")).startsWith(concat(lower(a(1)("lex")), lit("-")))))
    // numerics (+/- also dispatch the temporal value space: XPath
    // op:add/subtract-dayTimeDuration-to-dateTime, op:subtract-dateTimes)
    case "+" =>
      when(isDtLit(a(0)) && isDurLit(a(1)), dtPlusDur(a(0), a(1), negate = false))
        .when(isDurLit(a(0)) && isDtLit(a(1)), dtPlusDur(a(1), a(0), negate = false))
        .otherwise(arith("+", a(0), a(1)))
    case "-" =>
      when(isDtLit(a(0)) && isDurLit(a(1)), dtPlusDur(a(0), a(1), negate = true))
        .when(isDtLit(a(0)) && isDtLit(a(1)), dtMinusDt(a(0), a(1)))
        .otherwise(arith("-", a(0), a(1)))
    case "*" | "/" => arith(name, a(0), a(1))
    // sign REVERSAL (op:numeric-unary-minus), not 0-x: -(0e0) is -0.0
    case "UMINUS" => arith("*", Term.intLit(lit(-1L)), a(0))
    case "ABS" => numFn1(a(0))(abs, abs)
    case "CEIL" => numFn1(a(0))(x => ceil(x).cast(DV), x => ceil(x).cast(DoubleType))
    case "FLOOR" => numFn1(a(0))(x => floor(x).cast(DV), x => floor(x).cast(DoubleType))
    // fn:round: ties go toward POSITIVE INFINITY (round(-2.5) = -2) —
    // floor(x + 0.5), not Spark round's half-away-from-zero. Doubles at
    // |x| >= 2^52 are already integral (and floor()'s long return would
    // overflow), so they pass through.
    case "ROUND" => numFn1(a(0))(
      x => floor(x + lit(new java.math.BigDecimal("0.5"))).cast(DV),
      x => when(abs(x) >= lit(4.503599627370496e15), x)
        .otherwise(floor(x + lit(0.5)).cast(DoubleType)))
    case "RAND" => Term.doubleLit(rand())
    // date/time
    case "YEAR" => tsFn1(a(0))(x => Term.intLit(year(x)))
    case "MONTH" => tsFn1(a(0))(x => Term.intLit(month(x)))
    case "DAY" => tsFn1(a(0))(x => Term.intLit(dayofmonth(x)))
    case "HOURS" => tsFn1(a(0))(x => Term.intLit(hour(x)))
    case "MINUTES" => tsFn1(a(0))(x => Term.intLit(minute(x)))
    case "SECONDS" =>
      // fractional seconds from the lexical form (the instant extraction
      // would truncate to whole seconds)
      when(a(0).isNull || a(0)("kind") =!= LiteralKind ||
        !a(0)("dt").isin(XsdDateTime, XsdTime) || tsVal(a(0)).isNull,
        nullTerm)
        .otherwise(Term.decimalLit(regexp_replace(regexp_replace(
          regexp_replace(
            coalesce(
              nullif(regexp_extract(a(0)("lex"),
                "(?:T|^)\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)", 1), lit("")),
              lit("0")),
            "^0(\\d)", "$1"),
          "(\\.\\d*?)0+$", "$1"), "\\.$", "")))
    case "TZ" =>
      when(!isTemporalLit(a(0)), nullTerm)
        .otherwise(Term.strLit(tzPart(a(0)("lex"))))
    case "TIMEZONE" =>
      // xsd:dayTimeDuration of the explicit timezone; error when absent
      when(!isTemporalLit(a(0)) || tzPart(a(0)("lex")) === "", nullTerm)
        .otherwise(Term.typedLit(
          durLex(tzOffsetSecs(tzPart(a(0)("lex"))).cast(DecimalType(38, 6))),
          XsdDayTimeDuration))
    case "ADJUST" =>
      // SPARQL 1.2 SEP-0002 / XPath fn:adjust-{dateTime,date,time}-to-
      // timezone (oxigraph: spareval Function::Adjust). Second argument:
      // a dayTimeDuration in whole minutes within ±PT14H sets the
      // timezone — a timezoned input keeps its instant (local clock
      // shifts), a zoneless input keeps its clock (offset attaches);
      // the empty string "" removes the timezone, keeping local time.
      val t = a(0); val z = a(1)
      val off = durSecs(z("lex")).cast(LongType)
      val setTz = isDurLit(z) && off.isNotNull &&
        abs(off) <= lit(14L * 3600L) && off % 60L === 0L
      val strip = isStrTerm(z) && z("lex") === ""
      val hasTz = tzPart(t("lex")) =!= ""
      // target local wall-clock: shifted instant when re-zoning a
      // timezoned value, the as-written clock otherwise
      val local = when(setTz && hasTz, tsVal(t) +
        make_dt_interval(lit(0), lit(0), lit(0),
          off.cast(DecimalType(18, 6)))).otherwise(tsLocal(t))
      val frac = date_format(local, "SSSSSS")
      val fracLex = when(frac =!= "000000",
        concat(lit("."), regexp_replace(frac, "0+$", ""))).otherwise(lit(""))
      val tzLex = when(strip, lit(""))
        .when(off === 0L, lit("Z"))
        .otherwise(concat(when(off < 0L, lit("-")).otherwise(lit("+")),
          lpad((abs(off) / 3600L).cast(IntegerType).cast(StringType),
            2, "0"), lit(":"),
          lpad(((abs(off) % 3600L) / 60L).cast(IntegerType)
            .cast(StringType), 2, "0")))
      when(t.isNull || z.isNull || t("kind") =!= LiteralKind ||
        !t("dt").isin(XsdDateTime, XsdDate, XsdTime) || local.isNull ||
        !(coalesce(setTz, lit(false)) || coalesce(strip, lit(false))),
        nullTerm)
        .when(t("dt") === XsdDate, Term.typedLit(
          concat(date_format(local, "yyyy-MM-dd"), tzLex), XsdDate))
        .when(t("dt") === XsdTime, Term.typedLit(
          concat(date_format(local, "HH:mm:ss"), fracLex, tzLex), XsdTime))
        .otherwise(Term.typedLit(
          concat(date_format(local, "yyyy-MM-dd'T'HH:mm:ss"), fracLex,
            tzLex), XsdDateTime))
    case "NOW" => Term.dateTimeLit(current_timestamp())
    // hashing
    case "MD5" => strFn1(a(0))(l => Term.strLit(md5(l.cast(BinaryType))))
    case "SHA1" => strFn1(a(0))(l => Term.strLit(sha1(l.cast(BinaryType))))
    case "SHA256" => strFn1(a(0))(l => Term.strLit(sha2(l.cast(BinaryType), 256)))
    case "SHA384" => strFn1(a(0))(l => Term.strLit(sha2(l.cast(BinaryType), 384)))
    case "SHA512" => strFn1(a(0))(l => Term.strLit(sha2(l.cast(BinaryType), 512)))
    // constructor casts xsd:*
    case "xsd:integer" => castNum(a(0), XsdInteger, DecimalType(38, 0))
    case "xsd:decimal" => castNum(a(0), XsdDecimal, DV)
    case "xsd:double" => castFloating(a(0), DoubleType, XsdDouble)
    case "xsd:float" => castFloating(a(0), FloatType, XsdFloat)
    case "xsd:dateTime" =>
      val lex = trim(a(0)("lex"))
      val tz = tzPart(lex)
      val base = regexp_replace(lex, TzRe, "")
      when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
        .when(a(0)("dt") === XsdDateTime, a(0))
        .when(a(0)("dt") === XsdDate,
          Term.typedLit(concat(base, lit("T00:00:00"), tz), XsdDateTime))
        .when(isStrTerm(a(0)) &&
          try_to_timestamp(base,
            lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")).isNotNull,
          Term.typedLit(lex, XsdDateTime))
        .otherwise(nullTerm)
    case "xsd:date" =>
      val lex = trim(a(0)("lex"))
      val tz = tzPart(lex)
      when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
        .when(a(0)("dt") === XsdDate, a(0))
        .when(a(0)("dt") === XsdDateTime,
          Term.typedLit(concat(substring(lex, 1, 10), tz), XsdDate))
        .when(isStrTerm(a(0)) &&
          regexp_like(lex, lit("^\\d{4}-\\d{2}-\\d{2}(Z|[+-]\\d{2}:\\d{2})?$")) &&
          try_to_timestamp(substring(lex, 1, 10), lit("yyyy-MM-dd")).isNotNull,
          Term.typedLit(lex, XsdDate))
        .otherwise(nullTerm)
    case "xsd:boolean" => when(a(0).isNull, nullTerm)
      // numeric source: false iff 0 or NaN (F&O casting rules)
      .when(Term.isNumericLit(a(0)), Term.boolLit(
        when(numDbl(a(0)) === 0.0 || isnan(numDbl(a(0))), lit("false"))
          .otherwise(lit("true"))))
      // string source: XSD whiteSpace=collapse trims around the
      // boolean lexical ("  true " casts; "TRUE" stays an error)
      .when((isStrTerm(a(0)) || a(0)("dt") === Term.XsdBoolean) &&
        trim(a(0)("lex")).isin("true", "false", "1", "0"),
        Term.boolLit(trim(a(0)("lex")).isin("true", "1").cast(StringType)))
      .otherwise(nullTerm)
    // F&O §19.1.2: casting a NUMERIC/BOOLEAN to string goes through the
    // VALUE, not the source lexical — xsd:string(0.5e1) is "5", not
    // "0.5e1". Integral float/double values print without a point or
    // exponent (the XPath integer-range rule); non-integral ones keep
    // the platform double rendering (documented corner: XPath switches
    // to scientific at 1e6, Java at 1e7). IRIs and other literals keep
    // STR semantics (lexical / IRI string).
    case "xsd:string" => {
      val t = a(0)
      val v = numDbl(t)
      val intish = !isnan(v) && v === floor(v) && abs(v) < 1e15
      when(t.isNull || t("kind") === BlankKind, nullTerm)
        .when(Term.isNumericLit(t), Term.strLit(
          when(rank(t) === 0, trim(t("lex")).try_cast(LongType)
            .cast(StringType))
          .when(rank(t) === 1, decLex(numDec(t)))
          .otherwise(when(isnan(v), lit("NaN"))
            .when(v === Double.PositiveInfinity, lit("INF"))
            .when(v === Double.NegativeInfinity, lit("-INF"))
            .when(intish, v.cast(LongType).cast(StringType))
            .otherwise(when(rank(t) === 2, v.cast(FloatType)
              .cast(StringType)).otherwise(v.cast(StringType))))))
        .when(t("kind") === LiteralKind && t("dt") === Term.XsdBoolean,
          Term.strLit(when(t("lex").isin("true", "1"), "true")
            .otherwise("false")))
        .otherwise(Term.strLit(t("lex")))
    }
    case "xsd:time" => {
      val lex = trim(a(0)("lex"))
      when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
        .when(a(0)("dt") === XsdTime, a(0))
        .when(a(0)("dt") === XsdDateTime, Term.typedLit(
          regexp_extract(lex, "T(.*)$", 1), XsdTime))
        .when(isStrTerm(a(0)) && regexp_like(lex, lit(
          "^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$")),
          Term.typedLit(lex, XsdTime))
        .otherwise(nullTerm)
    }
    // duration constructors: accept strings/durations whose lexical
    // form fits the target subtype's space
    case "xsd:duration" =>
      when(a(0).isNull || a(0)("kind") =!= LiteralKind, nullTerm)
        .when(isDurLit(a(0)), Term.typedLit(a(0)("lex"), XsdDuration))
        .when(isStrTerm(a(0)) && regexp_like(trim(a(0)("lex")), lit(DurRe)),
          Term.typedLit(trim(a(0)("lex")), XsdDuration))
        .otherwise(nullTerm)
    case "xsd:dayTimeDuration" =>
      val lex = when(isDurLit(a(0)) || isStrTerm(a(0)),
        trim(a(0)("lex"))).otherwise(lit(null))
      when(a(0).isNull || lex.isNull || !regexp_like(lex, lit(DurRe)) ||
        durMonths(lex) =!= 0L, nullTerm)
        .otherwise(Term.typedLit(lex, XsdDayTimeDuration))
    case "xsd:yearMonthDuration" =>
      val lex = when(isDurLit(a(0)) || isStrTerm(a(0)),
        trim(a(0)("lex"))).otherwise(lit(null))
      when(a(0).isNull || lex.isNull || !regexp_like(lex, lit(DurRe)) ||
        durDtSecs(lex) =!= 0, nullTerm)
        .otherwise(Term.typedLit(lex, XsdYearMonthDuration))
    case other => customFns.get(other) match {
      case Some(f) => f(a)
      case None =>
        throw new IllegalArgumentException(s"builtin not implemented: $other")
    }
  }

  // --- small private helpers -----------------------------------------
  private def strFn1(t: Column)(f: Column => Column): Column =
    when(t.isNull || !isStrTerm(t), nullTerm).otherwise(f(t("lex")))
  /** apply a lex transform preserving the lang/datatype of the input */
  private def strPreserve(t: Column)(f: Column => Column): Column =
    strPreserveDyn(t, f)
  private def strPreserveDyn(t: Column, f: Column => Column): Column =
    when(t.isNull || !isStrTerm(t), nullTerm)
      .otherwise(struct(lit(LiteralKind).cast(ByteType).as("kind"),
        f(t("lex")).cast(StringType).as("lex"), t("dt").as("dt"),
        t("lang").as("lang")))
  /** §17.4.3.1 argument compatibility: arg2 plain/xsd:string goes with
    * anything stringy; a language-tagged arg2 requires arg1 to carry the
    * identical tag.
    */
  private def argCompat(x: Column, y: Column): Column =
    isStrTerm(x) && isStrTerm(y) &&
      (y("lang").isNull || (x("lang") <=> y("lang")))
  private def str2Bool(x: Column, y: Column)(f: (Column, Column) => Column): Column =
    boolTerm(when(!argCompat(x, y), lit(null).cast(BooleanType))
      .otherwise(f(x("lex"), y("lex"))))
  /** STRBEFORE/STRAFTER shell: compat check, then lang/datatype of arg1
    * on a match and the simple literal "" on no match.
    */
  private def strCut(x: Column, y: Column,
      f: (Column, Column) => Column): Column =
    when(x.isNull || y.isNull || !argCompat(x, y), nullTerm)
      .otherwise(when(instr(x("lex"), y("lex")) > 0,
        struct(lit(LiteralKind).cast(ByteType).as("kind"),
          f(x("lex"), y("lex")).cast(StringType).as("lex"),
          x("dt").as("dt"), x("lang").as("lang")))
        .otherwise(Term.strLit(lit(""))))
  /** XPath fn:substring semantics (what the reference evaluates): both
    * args round (not truncate), the window [start, start+len) clips to
    * position 1, so start 0 or negative shortens the result instead of
    * shifting it.
    */
  private def substring2(l: Column, from: Column): Column =
    l.substr(greatest(round(numDec(from), 0).cast(IntegerType), lit(1)),
      lit(Int.MaxValue))
  private def substring3(l: Column, from: Column, len: Column): Column = {
    val st = round(numDec(from), 0).cast(IntegerType)
    val begin = greatest(st, lit(1))
    l.substr(begin,
      greatest(st + round(numDec(len), 0).cast(IntegerType) - begin, lit(0)))
  }
  private def url_encode_rfc3986(l: Column): Column =
    // java URLEncoder-style via reflect-free builtin: percent-encode all but unreserved
    regexp_replace(
      url_encode(l), lit("\\+"), lit("%20"))
  /** XSD canonical decimal lexical: fractional trailing zeros drop, a
    * bare trailing point drops, "-0" normalizes to "0" — computed
    * decimals must print the canonical representation the reference
    * emits (oxsdatatypes Decimal), not the storage scale.
    */
  def decLex(c: Column): Column = {
    val s = regexp_replace(regexp_replace(c.cast(StringType),
      "(\\.\\d*?)0+$", "$1"), "\\.$", "")
    when(s === "-0", lit("0")).otherwise(s)
  }

  private def numFn1(t: Column)(fd: Column => Column, fdb: Column => Column): Column =
    when(t.isNull || !Term.isNumericLit(t), nullTerm)
      .when(rank(t) === 3, Term.typedLit(dblLex(fdb(numDbl(t))), XsdDouble))
      .when(rank(t) === 2, Term.typedLit(fltLex(fdb(numDbl(t))), XsdFloat))
      .when(rank(t) === 0, Term.intLit(fd(numDec(t)).cast(DecimalType(38, 0)).cast(LongType)))
      .otherwise(Term.decimalLit(decLex(fd(numDec(t)))))
  private def tsFn1(t: Column)(f: Column => Column): Column =
    when(tsLocal(t).isNull, nullTerm).otherwise(f(tsLocal(t)))
  private def castOrNull(lex: Column, dt: DataType, dtIri: String): Column = {
    val v = lex.try_cast(dt)
    when(v.isNull, nullTerm).otherwise(Term.typedLit(v.cast(StringType), dtIri))
  }

  // XSD lexical spaces for the string-source cast paths (F&O casting:
  // a string casts only via the target's own lexical space — Spark's
  // looser parsers would admit "12.5" as integer or "inf" as double)
  private val IntLexRe = "^[+-]?\\d+$"
  private val DecLexRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"
  private val FloatLexRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$"

  private def isBoolSrc(t: Column): Column =
    t("kind") === LiteralKind && t("dt") === Term.XsdBoolean
  private def boolNum(t: Column): Column =
    when(t("lex").isin("true", "1"), lit(1)).otherwise(lit(0))
  /** truncate a decimal toward zero (xsd:integer cast semantics) */
  private def truncDec(v: Column): Column =
    when(v >= 0, floor(v)).otherwise(ceil(v))

  private def castNum(t: Column, dtIri: String, dt: DecimalType): Column = {
    val lex = trim(t("lex"))
    val strRe = if (dtIri == XsdInteger) IntLexRe else DecLexRe
    // numeric source value in the target space; the integer target
    // truncates fractional sources toward zero. An integral-rank source
    // keeps the full 38-digit lexical path (numDec is only (38,12)).
    val numV =
      if (dtIri == XsdInteger)
        when(rank(t) === 0, lex.try_cast(dt))
          .when(rank(t) === 1, truncDec(numDec(t)).try_cast(dt))
          .otherwise(truncDec(numDbl(t).try_cast(DV)).try_cast(dt))
      else
        when(rank(t) <= 1, lex.try_cast(dt))
          .otherwise(numDbl(t).try_cast(dt))
    def out(v: Column): Column =
      if (dtIri == XsdInteger) Term.intLit(v.cast(LongType))
      else Term.decimalLit(decLex(v))
    when(t.isNull, nullTerm)
      .when(isBoolSrc(t), out(boolNum(t).cast(dt)))
      .when(Term.isNumericLit(t),
        when(numV.isNull, nullTerm).otherwise(out(numV)))
      .when(isStrTerm(t) && regexp_like(lex, lit(strRe)), {
        val v = lex.try_cast(dt)
        when(v.isNull, nullTerm).otherwise(out(v))
      })
      .otherwise(nullTerm)
  }

  private def castFloating(t: Column, dt: DataType, dtIri: String): Column = {
    val lex = trim(t("lex"))
    val special = when(lex.isin("INF", "+INF"), lit("INF"))
      .when(lex === "-INF", lit("-INF"))
      .when(lex === "NaN", lit("NaN"))
      .otherwise(lit(null).cast(StringType))
    when(t.isNull, nullTerm)
      .when(isBoolSrc(t), Term.typedLit(
        boolNum(t).cast(dt).cast(StringType), dtIri))
      .when((Term.isNumericLit(t) || isStrTerm(t)) && special.isNotNull,
        Term.typedLit(special, dtIri))
      .when(Term.isNumericLit(t), castOrNull(lex, dt, dtIri))
      .when(isStrTerm(t) && regexp_like(lex, lit(FloatLexRe)),
        castOrNull(lex, dt, dtIri))
      .otherwise(nullTerm)
  }
}
