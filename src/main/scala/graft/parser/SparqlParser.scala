package graft.parser

import graft.algebra.Algebra._
import graft.model.Term

/** SPARQL 1.1 parser: query text -> algebra, performing the spec's
  * syntax-to-algebra translation during the parse exactly like the
  * reference grammar does (oxigraph: lib/spargebra/src/parser.rs —
  * OPTIONAL becomes LeftJoin, group-level FILTERs wrap the group,
  * aggregates are hoisted into Group, solution modifiers nest
  * Distinct/OrderBy/Slice).
  *
  * Recursive descent over a cursor; supported subset: SELECT / ASK /
  * CONSTRUCT / DESCRIBE with PREFIX/BASE, BGPs with ';' ',' 'a'
  * abbreviations, blank-node property lists, RDF collections,
  * property paths (^ / | + * ? !, incl. inverse in negated sets),
  * OPTIONAL, FILTER (incl. [NOT] EXISTS), BIND, MINUS, UNION, GRAPH,
  * VALUES, sub-SELECT, expressions with full operator precedence,
  * aggregates with GROUP BY (vars and (expr AS ?v)) / HAVING,
  * DISTINCT/REDUCED, ORDER BY, LIMIT/OFFSET. Not yet: federation,
  * DESCRIBE *, CONSTRUCT solution modifiers.
  */
final class SparqlParser(input: String) {
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfFirst = RdfNs + "first"
  private val RdfRest = RdfNs + "rest"
  private val RdfNil = RdfNs + "nil"
  private var pos = 0
  private var base = ""
  private val prefixes = scala.collection.mutable.Map[String, String]()
  private var anonVar = 0
  /** §19.6: a blank node label may be used in only ONE basic graph
    * pattern. Labels of the BGP being parsed live in `curBgpLabels`;
    * any non-FILTER group element or group close moves them to
    * `closedBgpLabels`, where a reuse is a syntax error. Tracking is
    * on only inside WHERE-pattern triples blocks (CONSTRUCT templates
    * and update quad blocks have their own bnode scoping rules).
    */
  private val closedBgpLabels = scala.collection.mutable.Set[String]()
  private val curBgpLabels = scala.collection.mutable.Set[String]()
  private var trackBnodeLabels = false
  private def flushBgpLabels(): Unit = {
    closedBgpLabels ++= curBgpLabels; curBgpLabels.clear()
  }
  /** FROM / FROM NAMED graphs of the outermost query (SPARQL §13.2). */
  var fromDefault: Seq[String] = Nil
  var fromNamed: Seq[String] = Nil

  final case class ParseError(msg: String, at: Int) extends
    RuntimeException(s"$msg at offset $at: ...${input.slice(at, at + 40)}...")

  // ---------------- cursor utilities ----------------
  private def ws(): Unit = {
    var go = true
    while (go) {
      while (pos < input.length && input(pos).isWhitespace) pos += 1
      if (pos < input.length && input(pos) == '#') {
        while (pos < input.length && input(pos) != '\n') pos += 1
      } else go = false
    }
  }
  private def peek(s: String): Boolean = {
    ws()
    input.regionMatches(true, pos, s, 0, s.length) && {
      !s.head.isLetter || nameBoundary(pos + s.length)
    }
  }
  /** Longest-match keyword boundary: a keyword candidate ending at
    * `after` is only a keyword if the name token does not continue —
    * any PN_CHARS continuation (incl. '-' and unicode marks: `a-b` is
    * a legal PN_PREFIX, with interior dots) makes it a longer name,
    * and a PNAME_NS colon makes the whole token a PNAME (`a:p`,
    * `GRAPH:g` are prefixed names, never keyword + name). A bare DOT
    * after the keyword is the statement terminator (`?s ?p true.`).
    */
  private def nameBoundary(after: Int): Boolean = {
    if (after >= input.length) return true
    var p = after
    while (p < input.length &&
      (Term.isPnChar(input(p)) || input(p) == '.')) p += 1
    while (p > after && input(p - 1) == '.') p -= 1
    p == after && !(p < input.length && input(p) == ':')
  }
  /** The rdf:type keyword `a` — unlike every other keyword it is
    * case-SENSITIVE (grammar rule [9] quotes a lowercase terminal).
    */
  private def peekTypeKw(): Boolean = {
    ws()
    pos < input.length && input(pos) == 'a' && nameBoundary(pos + 1)
  }
  private def eatTypeKw(): Boolean =
    if (peekTypeKw()) { pos += 1; true } else false
  private def peekSym(s: String): Boolean = {
    ws(); input.regionMatches(false, pos, s, 0, s.length)
  }
  private def eat(s: String): Boolean = {
    if (peek(s)) { pos += s.length; true } else false
  }
  private def eatSym(s: String): Boolean = {
    if (peekSym(s)) { pos += s.length; true } else false
  }
  private def expect(s: String): Unit =
    if (!eat(s) && !eatSym(s)) throw ParseError(s"expected '$s'", pos)
  private def fail(msg: String): Nothing = throw ParseError(msg, pos)

  // ---------------- terminals ----------------
  private def parseVarName(): String = {
    ws()
    if (pos >= input.length || (input(pos) != '?' && input(pos) != '$'))
      fail("expected variable")
    pos += 1
    val start = pos
    // VARNAME (rule [166]): first char PN_CHARS_U or [0-9], then name
    // chars incl. the middle dot and combining marks ('-' is NOT a
    // var char)
    while (pos < input.length &&
      (input(pos) == '_' || (input(pos) != '-' &&
        graft.model.Term.isPnChar(input(pos))))) pos += 1
    if (pos == start) fail("empty variable name")
    if (!(Term.isPnCharsU(input(start)) ||
      (input(start) >= '0' && input(start) <= '9')))
      fail("variable name must start with PN_CHARS_U or a digit")
    input.substring(start, pos)
  }

  private def parseIriRef(): String = {
    ws(); expect("<")
    val start = pos
    while (pos < input.length && input(pos) != '>') {
      // IRIREF (rule [139]) excludes control chars, space, and
      // <>"{}|^` — a raw '\' is only legal as a UCHAR escape
      val c = input(pos)
      if (c <= ' ' || "<\"{}|^`".indexOf(c) >= 0)
        fail(s"illegal character '$c' in IRI")
      if (c == '\\' && !(pos + 1 < input.length &&
        (input(pos + 1) == 'u' || input(pos + 1) == 'U')))
        fail("illegal '\\' in IRI (only \\u/\\U escapes)")
      pos += 1
    }
    val iri = graft.model.RdfEscapes.unescapeIri(input.substring(start, pos))
    expect(">")
    graft.model.IriResolve.resolve(base, iri)
  }

  private def tryPrefixedName(): Option[String] = {
    ws()
    val start = pos
    var p = pos
    // PN_PREFIX (rule [168]): first char PN_CHARS_BASE, then PN_CHARS
    // plus interior dots
    while (p < input.length &&
      (Term.isPnChar(input(p)) || input(p) == '.')) p += 1
    while (p > start && input(p - 1) == '.') p -= 1
    if (p > start && !Term.isPnCharsBase(input(start))) return None
    if (p < input.length && input(p) == ':') {
      val pfx = input.substring(start, p)
      prefixes.get(pfx) match {
        case Some(ns) =>
          pos = p + 1
          // PN_LOCAL (rule [169]): name chars incl. mid ':'; PLX =
          // PN_LOCAL_ESC ('\'+punct, contributing the RAW char to the
          // IRI) or PERCENT ('%'HEX HEX, kept VERBATIM — §19.2 note:
          // %-encoding in local names is not decoded)
          def isHex(c: Char) = c.isDigit ||
            (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
          val toks = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
          var cont = true
          while (cont && pos < input.length) {
            val c = input(pos)
            // first char is PN_CHARS_U | ':' | [0-9] | PLX — a leading
            // '.', '-', or mark ends the token at the colon (`ex:` is
            // itself a valid PNAME_NS prefixed name)
            val bareOk =
              if (toks.isEmpty) Term.isPnCharsU(c) || c == ':' ||
                (c >= '0' && c <= '9')
              else Term.isPnChar(c) || c == '.' || c == ':'
            if (bareOk) { toks += ((c.toString, false)); pos += 1 }
            else if (c == '\\' && pos + 1 < input.length &&
              "_~.-!$&'()*+,;=/?#@%".indexOf(input(pos + 1)) >= 0) {
              toks += ((input(pos + 1).toString, true)); pos += 2
            } else if (c == '%' && pos + 2 < input.length &&
              isHex(input(pos + 1)) && isHex(input(pos + 2))) {
              toks += ((input.substring(pos, pos + 3), true)); pos += 3
            } else cont = false
          }
          // a trailing UNESCAPED '.' is a triple terminator, not part
          // of the name (an escaped `\.` stays)
          while (toks.nonEmpty && toks.last == ((".", false))) {
            toks.remove(toks.length - 1); pos -= 1
          }
          Some(ns + toks.map(_._1).mkString)
        case None => None
      }
    } else None
  }

  private def parseIri(): String = {
    ws()
    if (peekSym("<")) parseIriRef()
    else tryPrefixedName().getOrElse(fail("expected IRI"))
  }

  private def parseString(): String = {
    ws()
    val quote = if (eatSym("\"\"\"")) "\"\"\""
    else if (eatSym("'''")) "'''"
    else if (eatSym("\"")) "\"" else if (eatSym("'")) "'"
    else fail("expected string")
    val sb = new StringBuilder
    while (pos < input.length && !input.startsWith(quote, pos)) {
      if (input(pos) == '\\' && pos + 1 < input.length) {
        pos += 1
        input(pos) match {
          // UCHAR (grammar §19.2): \uXXXX / \UXXXXXXXX codepoint escapes
          case 'u' if pos + 4 < input.length =>
            sb += Integer.parseInt(input.substring(pos + 1, pos + 5), 16)
              .toChar
            pos += 4
          case 'U' if pos + 8 < input.length =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(input.substring(pos + 1, pos + 9), 16)))
            pos += 8
          case c => sb += (c match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'b' => '\b'; case 'f' => '\f'
            case '\\' | '"' | '\'' => c
            // ECHAR (rule [160]) allows exactly tbnrf"'\ — anything
            // else after '\' is a syntax error, not a passthrough
            case other => fail(s"illegal string escape '\\$other'")
          })
        }
      } else sb += input(pos)
      pos += 1
    }
    expect(quote)
    sb.toString
  }

  /** literal with optional @lang / ^^datatype */
  private def parseRdfLiteral(): L = {
    val lex = parseString()
    if (eatSym("^^")) L(lex, parseIri())
    else if (pos < input.length && input(pos) == '@') {
      pos += 1
      val start = pos
      while (pos < input.length &&
        (input(pos).isLetterOrDigit || input(pos) == '-')) pos += 1
      val tag = input.substring(start, pos)
      // LANGTAG ::= '@' [a-zA-Z]+ ('-' [a-zA-Z0-9]+)* (rule [145]);
      // SPARQL 1.2 LANG_DIR adds optional '--ltr'/'--rtl'
      Term.langTag(tag) match {
        case Some((l, dt)) => L(lex, dt, Some(l))
        case None => fail(s"malformed language tag '@$tag'")
      }
    } else L(lex, Term.XsdString)
  }

  private def parseNumber(): L = {
    ws()
    val start = pos
    if (pos < input.length && (input(pos) == '+' || input(pos) == '-')) pos += 1
    var isDec = false; var isDouble = false
    // numeric grammar (rules [146-148]): at most ONE '.', and only when
    // digits follow (DECIMAL requires [0-9]+ after the dot — `1.` is
    // INTEGER then the statement dot, `1..5` is a syntax error, not one
    // token) OR an exponent follows (DOUBLE [148] allows an empty
    // fraction: `1.e5`); exponents need digits (optionally signed)
    def digitAt(i: Int) = i < input.length && input(i).isDigit
    def expAt(i: Int) = i < input.length &&
      (input(i) == 'e' || input(i) == 'E') &&
      (digitAt(i + 1) ||
        (i + 1 < input.length && (input(i + 1) == '+' ||
          input(i + 1) == '-') && digitAt(i + 2)))
    while (pos < input.length && (input(pos).isDigit ||
      (input(pos) == '.' && !isDec && !isDouble &&
        (digitAt(pos + 1) || expAt(pos + 1))) ||
      ((input(pos) == 'e' || input(pos) == 'E') && !isDouble &&
        (digitAt(pos + 1) ||
          ((pos + 1 < input.length && (input(pos + 1) == '+' ||
            input(pos + 1) == '-')) && digitAt(pos + 2)))) ||
      ((input(pos) == '+' || input(pos) == '-') &&
        (input(pos - 1) == 'e' || input(pos - 1) == 'E')))) {
      if (input(pos) == '.') isDec = true
      if (input(pos) == 'e' || input(pos) == 'E') isDouble = true
      pos += 1
    }
    val lex = input.substring(start, pos)
    if (lex.isEmpty || lex == "+" || lex == "-") fail("expected number")
    L(lex, if (isDouble) Term.XsdDouble
    else if (isDec) Term.XsdDecimal else Term.XsdInteger)
  }

  /** Object-position flag: RDF 1.2 triple terms `<<( s p o )>>` are
    * grammatically restricted to object positions (triple objects,
    * collection items, VALUES data, nested triple-term objects). */
  private var objCtx = false
  private def inObj[A](body: => A): A = {
    val saved = objCtx; objCtx = true
    try body finally objCtx = saved
  }
  private def nonObj[A](body: => A): A = {
    val saved = objCtx; objCtx = false
    try body finally objCtx = saved
  }

  /** `reifier ::= '~' (Var | iri | BlankNode)?` — a bare `~` mints a
    * fresh bnode. Shared by the annotation runs and the internal
    * reifiedTriple form across pattern, CONSTRUCT and quad templates.
    */
  private def parseReifierTerm(): TermPat = {
    ws()
    val r: TermPat =
      if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
        V(parseVarName())
      else if (pos < input.length && input(pos) == '[') {
        expect("["); expect("]")
        anonVar += 1; B(s"anon$anonVar")
      } else if (pos < input.length && (input(pos) == '<' ||
        input(pos) == '_' || input(pos) == ':' ||
        Term.isPnCharsBase(input(pos))))
        nonObj(parseVarOrTerm())
      else { anonVar += 1; B(s"anon$anonVar") }
    r match {
      case _: V | _: I | _: B => r
      case _ => fail("a reifier must be a variable, IRI, or blank node")
    }
  }

  /** SPARQL 1.2 `reifiedTriple ::= '<<' rtSubject verb rtObject
    * reifier? '>>'`: with an INTERNAL reifier the term denotes the
    * reifier and `emit` receives `r rdf:reifies <<( s p o )>>` — a
    * pattern join or a template triple, per call site; without one it
    * stays the CG quoted-triple term this engine implements.
    */
  private def parseReifiedTriple(emit: TriplePattern => Unit): TermPat = {
    expect("<<")
    def component(): TermPat = {
      ws()
      if (peekSym("<<") && !peekSym("<<(")) parseReifiedTriple(emit)
      else parseVarOrTerm()
    }
    val qs = nonObj(component())
    val qp = nonObj(parseVarOrTerm())
    val qo = inObj(component())
    ws()
    val rei =
      if (peekSym("~")) { expect("~"); Some(parseReifierTerm()) } else None
    ws()
    expect(">>")
    qs match {
      case _: L => fail("literal subject in quoted triple")
      case _ =>
    }
    qp match {
      case _: V | _: I =>
      case _ => fail("quoted-triple predicate must be a variable or IRI")
    }
    rei match {
      case Some(r) =>
        emit(TriplePattern(r, I(RdfNs + "reifies"), Q(qs, qp, qo)))
        r
      case None => Q(qs, qp, qo)
    }
  }

  private def parseVarOrTerm(): TermPat = {
    ws()
    if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
      V(parseVarName())
    else if (peekSym("<<(")) {
      // RDF 1.2 triple term: same term model as the quoted-triple
      // pattern, but the `<<( )>>` spelling is object-only by grammar
      if (!objCtx)
        fail("triple terms <<( ... )>> may only appear in object position")
      expect("<<(")
      val qs = nonObj(parseVarOrTerm()); val qp = nonObj(parseVarOrTerm())
      val qo = inObj(parseVarOrTerm())
      ws(); expect(")>>")
      qs match {
        case _: L => fail("literal subject in triple term")
        case _ =>
      }
      qp match {
        case _: V | _: I =>
        case _ => fail("triple-term predicate must be a variable or IRI")
      }
      Q(qs, qp, qo)
    }
    else if (peekSym("<<")) {
      // RDF-star quoted-triple pattern (SPARQL-star grammar: subject is
      // var/iri/bnode/quotedTP — never a literal; predicate var/iri only)
      expect("<<")
      val qs = nonObj(parseVarOrTerm()); val qp = nonObj(parseVarOrTerm())
      val qo = inObj(parseVarOrTerm())
      ws(); expect(">>")
      qs match {
        case _: L => fail("literal subject in quoted triple")
        case _ =>
      }
      qp match {
        case _: V | _: I =>
        case _ => fail("quoted-triple predicate must be a variable or IRI")
      }
      Q(qs, qp, qo)
    }
    else if (peekSym("<")) I(parseIriRef())
    else if (peekSym("\"") || peekSym("'")) parseRdfLiteral()
    else if (peek("true")) { eat("true"); L("true", Term.XsdBoolean) }
    else if (peek("false")) { eat("false"); L("false", Term.XsdBoolean) }
    else if (pos < input.length &&
      (input(pos).isDigit || input(pos) == '+' || input(pos) == '-' ||
        input(pos) == '.')) parseNumber()
    else if (peekSym("_:")) { pos += 2
      val start = pos
      // BLANK_NODE_LABEL (rule [142]): first char PN_CHARS_U or [0-9];
      // interior '.' and PN_CHARS (incl. '-' and unicode marks) are
      // label chars; a trailing dot run belongs to the statement
      while (pos < input.length &&
        (Term.isPnChar(input(pos)) || input(pos) == '.')) pos += 1
      var lEnd = pos
      while (lEnd > start && input(lEnd - 1) == '.') lEnd -= 1
      pos = lEnd
      if (lEnd == start) fail("empty blank node label")
      if (!(Term.isPnCharsU(input(start)) ||
        (input(start) >= '0' && input(start) <= '9')))
        fail("blank node label must start with PN_CHARS_U or a digit")
      val lbl = input.substring(start, lEnd)
      if (trackBnodeLabels) {
        if (closedBgpLabels(lbl) && !curBgpLabels(lbl))
          fail(s"blank node label _:$lbl used in more than one basic " +
            "graph pattern (§19.6)")
        curBgpLabels += lbl
      }
      B(lbl)
    }
    else tryPrefixedName().map(I).getOrElse(fail("expected term"))
  }

  // ---------------- property paths ----------------
  private def parsePath(): Path = parsePathAlt()
  private def parsePathAlt(): Path = {
    var p = parsePathSeq()
    while (eatSym("|")) p = PAlt(p, parsePathSeq())
    p
  }
  private def parsePathSeq(): Path = {
    var p = parsePathElt()
    while (eatSym("/")) p = PSeq(p, parsePathElt())
    p
  }
  private def parsePathElt(): Path = {
    val inv = eatSym("^")
    var p = parsePathPrimary()
    ws()
    if (eatSym("+")) p = POneOrMore(p)
    else if (eatSym("*")) p = PZeroOrMore(p)
    else if (pos < input.length && input(pos) == '?' &&
      (pos + 1 >= input.length || !input(pos + 1).isLetterOrDigit)) {
      pos += 1; p = PZeroOrOne(p)
    }
    if (inv) PInv(p) else p
  }
  private def parsePathPrimary(): Path = {
    ws()
    if (eatSym("!")) {
      val fwd = scala.collection.mutable.ListBuffer[String]()
      val inv = scala.collection.mutable.ListBuffer[String]()
      def elt(): Unit = {
        val (isInv, iri) = parsePathNegElt()
        if (isInv) inv += iri else fwd += iri
      }
      if (eatSym("(")) {
        elt()
        while (eatSym("|")) elt()
        expect(")")
      } else elt()
      PNeg(fwd.toSeq, inv.toSeq)
    } else if (eatSym("(")) {
      val p = parsePath(); expect(")"); p
    } else if (eatTypeKw()) {
      PLink("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    } else PLink(parseIri())
  }
  /** One element of a negated property set: (inverse?, iri). */
  private def parsePathNegElt(): (Boolean, String) = {
    val isInv = eatSym("^")
    val iri =
      if (eatTypeKw()) "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
      else parseIri()
    (isInv, iri)
  }

  /** is the verb position a plain IRI (triple pattern) or a real path */
  private def pathAsIri(p: Path): Option[String] = p match {
    case PLink(i) => Some(i)
    case _ => None
  }

  // ---------------- triples block ----------------
  private def parseTriplesBlock(): Seq[GraphPattern] = {
    val wasTracking = trackBnodeLabels
    trackBnodeLabels = true
    try parseTriplesBlock0()
    finally trackBnodeLabels = wasTracking
  }
  private def parseTriplesBlock0(): Seq[GraphPattern] = {
    val out = scala.collection.mutable.ListBuffer[GraphPattern]()

    /** subject/object position: plain term or `[ props ]` blank-node
      * property list (emits its triples, returns the fresh bnode).
      */
    def termOrBnodeList(): TermPat = {
      ws()
      if (peekSym("[")) {
        expect("[")
        anonVar += 1
        val b = B(s"anon$anonVar")
        ws()
        if (!peekSym("]")) propertyList(b)
        expect("]")
        b
      } else if (peekSym("(")) {
        // RDF collection ( e1 e2 ... ) -> rdf:first/rdf:rest chain
        expect("(")
        val items = scala.collection.mutable.ListBuffer[TermPat]()
        // collection items are object positions (rdf:first objects)
        while (!eatSym(")")) items += inObj(termOrBnodeList())
        if (items.isEmpty) I(RdfNil)
        else {
          val nodes = items.map { _ => anonVar += 1; B(s"anon$anonVar") }
          for (((node, item), idx) <- nodes.zip(items).zipWithIndex) {
            out += Bgp(TriplePattern(node, I(RdfFirst), item))
            val rest: TermPat =
              if (idx == items.size - 1) I(RdfNil) else nodes(idx + 1)
            out += Bgp(TriplePattern(node, I(RdfRest), rest))
          }
          nodes.head
        }
      } else if (peekSym("<<") && !peekSym("<<("))
        parseReifiedTriple(tp => out += Bgp(tp))
      else parseVarOrTerm()
    }

    def propertyList(s: TermPat): Unit = {
      var moreProps = true
      while (moreProps) {
        ws()
        val verb: Either[Path, String] =
          if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
            Right(parseVarName())
          else Left(parsePath())
        var moreObjs = true
        while (moreObjs) {
          val o = inObj(termOrBnodeList())
          verb match {
            case Right(v) => out += Bgp(TriplePattern(s, V(v), o))
            case Left(p) => pathAsIri(p) match {
              case Some(iri) => out += Bgp(TriplePattern(s, I(iri), o))
              case None => out += PathPattern(s, p, o)
            }
          }
          ws()
          // Annotation run (SPARQL 1.2 `(reifier | annotationBlock)*`
          // over the star chain): `{| q v |}` without a reifier matches
          // the QUOTED form of the triple (CG semantics); `~r` (r a
          // var/iri/bnode, or fresh when bare) adds the pattern
          // `r rdf:reifies <<(s p o)>>` and retargets later blocks
          def quotedPat(): TermPat = {
            val vp: TermPat = verb match {
              case Right(v) => V(v)
              case Left(p) => pathAsIri(p).map(I)
                .getOrElse(fail("annotation/reifier on a property path"))
            }
            Q(s, vp, o)
          }
          var annTarget: TermPat = null
          var run = true
          while (run) {
            if (peekSym("{|")) {
              expect("{|")
              propertyList(
                if (annTarget == null) quotedPat() else annTarget)
              expect("|}")
              ws()
            } else if (peekSym("~")) {
              expect("~")
              val r = parseReifierTerm()
              out += Bgp(TriplePattern(r, I(RdfNs + "reifies"), quotedPat()))
              annTarget = r
              ws()
            } else run = false
          }
          moreObjs = eatSym(",")
        }
        moreProps = eatSym(";")
        ws()
        // a ';' may dangle before any terminator, including an
        // annotation block's '|}'
        if (moreProps && (pos >= input.length || input(pos) == '.' ||
          input(pos) == '}' || input(pos) == ']' ||
          input(pos) == '|')) moreProps = false
      }
    }

    var more = true
    while (more) {
      ws()
      val wasBnodeList = peekSym("[")
      val s = termOrBnodeList()
      ws()
      // only a `[ ... ]` subject may omit its own property list
      if (!wasBnodeList ||
        (pos < input.length && input(pos) != '.' && input(pos) != '}'))
        propertyList(s)
      more = eatSym(".")
      ws()
      if (pos >= input.length || input(pos) == '}' ||
        startsGraphPatternNotTriples) more = false
    }
    out.toSeq
  }

  private def startsGraphPatternNotTriples: Boolean =
    peek("OPTIONAL") || peek("FILTER") || peek("BIND") || peek("MINUS") ||
      peek("LATERAL") || peek("GRAPH") || peek("SERVICE") ||
      peek("VALUES") || peekSym("{")

  // ---------------- group graph pattern ----------------
  private def parseGroupGraphPattern(): GraphPattern = {
    expect("{")
    ws()
    if (peek("SELECT")) { val sub = parseSelect(); expect("}"); sub }
    else {
      var acc: GraphPattern = Bgp()
      val filters = scala.collection.mutable.ListBuffer[Expr]()
      def add(g: GraphPattern): Unit =
        acc = if (isEmptyBgp(acc)) g else Join(acc, g)
      var done = false
      while (!done) {
        ws()
        // any group element other than a FILTER ends the current BGP
        // for the §19.6 blank-node-label rule (filters are collected
        // without splitting the surrounding triples)
        if (peekSym("}") || (startsGraphPatternNotTriples &&
          !peek("FILTER"))) flushBgpLabels()
        if (peekSym("}")) done = true
        else if (peek("OPTIONAL")) {
          eat("OPTIONAL")
          val inner = parseGroupGraphPattern()
          acc = inner match {
            case Filter(f, p) => LeftJoin(acc, p, Some(f))
            case p => LeftJoin(acc, p, None)
          }
        } else if (peek("FILTER")) {
          eat("FILTER"); filters += parseConstraint()
        } else if (peek("BIND")) {
          eat("BIND"); expect("(")
          val e = parseExpression(); expect("AS")
          val v = parseVarName(); expect(")")
          // §19.8 rule [60] note: the BIND target must not be in scope
          // from the group so far — a SYNTAX error, not a shadow
          if (inScopeVars(acc)(v))
            fail(s"BIND would rebind in-scope variable ?$v")
          acc = Extend(acc, v, e)
        } else if (peek("MINUS")) {
          eat("MINUS"); acc = Minus(acc, parseGroupGraphPattern())
        } else if (peek("LATERAL")) { // SPARQL 1.2 / oxigraph extension
          eat("LATERAL"); acc = Lateral(acc, parseGroupGraphPattern())
        } else if (peek("GRAPH")) {
          eat("GRAPH")
          ws()
          val name: TermPat =
            if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
              V(parseVarName())
            else I(parseIri())
          add(GraphPat(name, parseGroupGraphPattern()))
        } else if (peek("SERVICE")) {
          eat("SERVICE")
          val silent = eat("SILENT")
          ws()
          val name: TermPat =
            if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
              V(parseVarName())
            else I(parseIri())
          add(Service(name, parseGroupGraphPattern(), silent))
        } else if (peek("VALUES")) {
          add(parseInlineData())
        } else if (peekSym("{")) {
          var g = parseGroupGraphPattern()
          while (peek("UNION")) { eat("UNION"); g = Union(g, parseGroupGraphPattern()) }
          add(g)
        } else {
          parseTriplesBlock().foreach(add)
        }
        eatSym(".")
      }
      expect("}")
      filters.foldLeft(acc)((a, f) => Filter(f, a))
    }
  }
  private def isEmptyBgp(g: GraphPattern): Boolean = g match {
    case Bgp(ps @ _*) => ps.isEmpty
    case _ => false
  }

  private def parseInlineData(): ValuesPat = {
    expect("VALUES")
    ws()
    val vars = scala.collection.mutable.ListBuffer[String]()
    val multi = eatSym("(")
    if (multi) { while (!eatSym(")")) vars += parseVarName() }
    else vars += parseVarName()
    // rule [62]: a variable may appear at most once in the block
    vars.groupBy(identity).find(_._2.length > 1).foreach { case (v, _) =>
      fail(s"variable ?$v repeated in VALUES") }
    expect("{")
    // DataBlockValue (rule [65]): iri, literal, or UNDEF — variables
    // and blank nodes are a syntax error; quoted triples (SPARQL-star
    // extension) are allowed when ground
    def dataValue(): TermPat = {
      val t = inObj(parseVarOrTerm()) // triple terms are data values
      def ok(tp: TermPat): Boolean = tp match {
        case _: V | _: B => false
        case Q(s, p, o) => ok(s) && ok(p) && ok(o)
        case _ => true
      }
      if (!ok(t)) fail("VALUES data must be an IRI, literal, or UNDEF")
      t
    }
    val rows = scala.collection.mutable.ListBuffer[Seq[Option[TermPat]]]()
    while (!eatSym("}")) {
      if (multi) {
        expect("(")
        val row = scala.collection.mutable.ListBuffer[Option[TermPat]]()
        while (!eatSym(")")) {
          if (peek("UNDEF")) { eat("UNDEF"); row += None }
          else row += Some(dataValue())
        }
        if (row.length != vars.length)
          fail(s"VALUES row has ${row.length} terms for ${vars.length} " +
            "variables")
        rows += row.toSeq
      } else {
        if (peek("UNDEF")) { eat("UNDEF"); rows += Seq(None) }
        else rows += Seq(Some(dataValue()))
      }
    }
    ValuesPat(vars.toSeq, rows.toSeq)
  }

  // ---------------- expressions ----------------
  private def parseConstraint(): Expr = {
    ws()
    if (peekSym("(")) { expect("("); val e = parseExpression(); expect(")"); e }
    else parsePrimaryExpression() // builtin call / EXISTS
  }

  private def parseExpression(): Expr = parseOr()
  private def parseOr(): Expr = {
    var e = parseAnd()
    while (eatSym("||")) e = EFn("||", e, parseAnd())
    e
  }
  private def parseAnd(): Expr = {
    var e = parseRelational()
    while (eatSym("&&")) e = EFn("&&", e, parseRelational())
    e
  }
  private def parseRelational(): Expr = {
    val e = parseAdditive()
    ws()
    if (eatSym("!=")) EFn("!=", e, parseAdditive())
    else if (eatSym("<=")) EFn("<=", e, parseAdditive())
    else if (eatSym(">=")) EFn(">=", e, parseAdditive())
    else if (eatSym("=")) EFn("=", e, parseAdditive())
    else if (peekSym("<") && !peekSym("<http")) { eatSym("<"); EFn("<", e, parseAdditive()) }
    else if (eatSym(">")) EFn(">", e, parseAdditive())
    else if (peek("NOT")) { eat("NOT"); expect("IN")
      expect("(")
      val items = scala.collection.mutable.ListBuffer[Expr](e)
      if (!peekSym(")")) { items += parseExpression()
        while (eatSym(",")) items += parseExpression() }
      expect(")")
      EFn("!", EFn("IN", items.toSeq: _*))
    }
    else if (peek("IN")) { eat("IN")
      expect("(")
      val items = scala.collection.mutable.ListBuffer[Expr](e)
      if (!peekSym(")")) { items += parseExpression()
        while (eatSym(",")) items += parseExpression() }
      expect(")")
      EFn("IN", items.toSeq: _*)
    }
    else e
  }
  private def parseAdditive(): Expr = {
    var e = parseMultiplicative()
    var go = true
    while (go) {
      ws()
      if (eatSym("+")) e = EFn("+", e, parseMultiplicative())
      else if (peekSym("-") && !peekSym("->")) { eatSym("-"); e = EFn("-", e, parseMultiplicative()) }
      else go = false
    }
    e
  }
  private def parseMultiplicative(): Expr = {
    var e = parseUnary()
    var go = true
    while (go) {
      ws()
      if (eatSym("*")) e = EFn("*", e, parseUnary())
      else if (eatSym("/")) e = EFn("/", e, parseUnary())
      else go = false
    }
    e
  }
  private def parseUnary(): Expr = {
    ws()
    if (eatSym("!")) EFn("!", parseUnary())
    else if (eatSym("-")) EFn("UMINUS", parseUnary())
    else if (eatSym("+")) parseUnary()
    else parsePrimaryExpression()
  }

  private val builtins = Set(
    "BOUND", "COALESCE", "IF", "STR", "LANG", "LANGMATCHES", "DATATYPE",
    "IRI", "URI", "BNODE", "STRDT", "STRLANG", "UUID", "STRUUID",
    "STRLEN", "SUBSTR", "UCASE", "LCASE", "CONCAT", "CONTAINS",
    "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI",
    "REGEX", "REPLACE", "ABS", "CEIL", "FLOOR", "ROUND", "RAND",
    "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "NOW",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "ISIRI", "ISURI",
    "ISBLANK", "ISLITERAL", "ISNUMERIC", "SAMETERM", "TZ", "TIMEZONE",
    "ISTRIPLE", "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ADJUST",
    "LANGDIR", "STRLANGDIR", "HASLANG", "HASLANGDIR")
  private val aggNames = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
    "GROUP_CONCAT")

  /** Aggregate calls found while parsing projection/having expressions:
    * replaced by fresh variables and hoisted into the Group node, like
    * the reference grammar's aggregate hoisting.
    */
  private val hoistedAggs =
    scala.collection.mutable.ListBuffer[(String, AggCall)]()

  /** Fixed arities from the §17.4 grammar rules — the generic arg-list
    * parse would otherwise accept IF(c,t) or STRLEN() and fail (or
    * worse, misevaluate) only at query time. Variadic builtins
    * (CONCAT, COALESCE, custom IRIs) are deliberately absent.
    */
  private val fnArity: Map[String, (Int, Int)] = Map(
    "IF" -> (3, 3), "REGEX" -> (2, 3), "SUBSTR" -> (2, 3),
    "REPLACE" -> (3, 4), "STRDT" -> (2, 2), "STRLANG" -> (2, 2),
    "STRLEN" -> (1, 1), "UCASE" -> (1, 1), "LCASE" -> (1, 1),
    "BOUND" -> (1, 1), "DATATYPE" -> (1, 1), "LANG" -> (1, 1),
    "LANGMATCHES" -> (2, 2), "CONTAINS" -> (2, 2),
    "STRSTARTS" -> (2, 2), "STRENDS" -> (2, 2),
    "STRBEFORE" -> (2, 2), "STRAFTER" -> (2, 2),
    "sameTerm" -> (2, 2), "isIRI" -> (1, 1), "isBlank" -> (1, 1),
    "isLiteral" -> (1, 1), "isNumeric" -> (1, 1), "isTRIPLE" -> (1, 1),
    "STR" -> (1, 1), "ABS" -> (1, 1), "CEIL" -> (1, 1),
    "FLOOR" -> (1, 1), "ROUND" -> (1, 1), "ENCODE_FOR_URI" -> (1, 1),
    "MD5" -> (1, 1), "SHA1" -> (1, 1), "SHA256" -> (1, 1),
    "SHA384" -> (1, 1), "SHA512" -> (1, 1),
    "YEAR" -> (1, 1), "MONTH" -> (1, 1), "DAY" -> (1, 1),
    "HOURS" -> (1, 1), "MINUTES" -> (1, 1), "SECONDS" -> (1, 1),
    "TIMEZONE" -> (1, 1), "TZ" -> (1, 1),
    "NOW" -> (0, 0), "RAND" -> (0, 0), "UUID" -> (0, 0),
    "STRUUID" -> (0, 0), "BNODE" -> (0, 1),
    "TRIPLE" -> (3, 3), "SUBJECT" -> (1, 1), "PREDICATE" -> (1, 1),
    "OBJECT" -> (1, 1),
    // SPARQL 1.2 directional language strings
    "LANGDIR" -> (1, 1), "STRLANGDIR" -> (3, 3),
    "hasLANG" -> (1, 1), "hasLANGDIR" -> (1, 1))

  private def canonicalFn(name: String): String = name.toUpperCase match {
    case "ISIRI" | "ISURI" => "isIRI"
    case "ISBLANK" => "isBlank"
    case "ISLITERAL" => "isLiteral"
    case "ISNUMERIC" => "isNumeric"
    case "SAMETERM" => "sameTerm"
    case "ISTRIPLE" => "isTRIPLE"
    case "HASLANG" => "hasLANG"
    case "HASLANGDIR" => "hasLANGDIR"
    case "URI" => "IRI"
    case up => up
  }

  private def parsePrimaryExpression(): Expr = {
    ws()
    if (peekSym("(")) { expect("("); val e = parseExpression(); expect(")"); e }
    else if (peekSym("<<") || peekSym("<<(")) {
      // SPARQL-star embedded triple / 1.2 ExprTripleTerm <<( )>> in
      // expression position: sugar for the TRIPLE(...) constructor
      // over its components
      val oneTwo = peekSym("<<(")
      if (oneTwo) expect("<<(") else expect("<<")
      def toExpr(tp: TermPat): Expr = tp match {
        case V(n) => EVar(n)
        case I(iri) => EIri(iri)
        case L(lex, dt, lang) => ELit(lex, dt, lang)
        case Q(s2, p2, o2) => EFn("TRIPLE", toExpr(s2), toExpr(p2), toExpr(o2))
        case other => fail(s"unsupported term in embedded triple: $other")
      }
      val s = nonObj(parseVarOrTerm()); val p = nonObj(parseVarOrTerm())
      val o = inObj(parseVarOrTerm())
      ws(); if (oneTwo) expect(")>>") else expect(">>")
      EFn("TRIPLE", toExpr(s), toExpr(p), toExpr(o))
    }
    else if (peek("EXISTS")) { eat("EXISTS"); EExists(parseGroupGraphPattern()) }
    else if (peek("NOT")) { eat("NOT"); expect("EXISTS")
      EExists(parseGroupGraphPattern(), positive = false) }
    else if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
      EVar(parseVarName())
    else if (peekSym("\"") || peekSym("'")) {
      val l = parseRdfLiteral(); ELit(l.lex, l.dt, l.lang)
    }
    else if (peek("true")) { eat("true"); ELit("true", Term.XsdBoolean) }
    else if (peek("false")) { eat("false"); ELit("false", Term.XsdBoolean) }
    else if (pos < input.length && (input(pos).isDigit ||
      ((input(pos) == '+' || input(pos) == '-' || input(pos) == '.') &&
        pos + 1 < input.length && (input(pos + 1).isDigit || input(pos + 1) == '.')))) {
      val l = parseNumber(); ELit(l.lex, l.dt, l.lang)
    }
    else {
      // keyword function, aggregate, or IRI (cast / constant)
      val start = pos
      var p = pos
      while (p < input.length && (input(p).isLetterOrDigit || input(p) == '_')) p += 1
      val word = input.substring(start, p).toUpperCase
      if (aggNames.contains(word)) { pos = p; parseAggregate(word) }
      else if (builtins.contains(word)) {
        pos = p
        val fn = canonicalFn(word)
        ws()
        if (peekSym("(")) {
          expect("(")
          val args = scala.collection.mutable.ListBuffer[Expr]()
          if (!peekSym(")")) {
            args += parseExpression()
            while (eatSym(",")) args += parseExpression()
          }
          expect(")")
          fnArity.get(fn).foreach { case (lo, hi) =>
            if (args.length < lo || args.length > hi)
              fail(s"$fn takes ${if (lo == hi) s"$lo" else s"$lo-$hi"} " +
                s"argument(s), got ${args.length}")
          }
          EFn(fn, args.toSeq: _*)
        } else EFn(fn) // NOW / RAND / UUID without args? (grammar has ())
      } else {
        // IRI: constant term, constructor cast iri(expr), or a custom
        // function call by IRI (spareval · with_custom_function parity:
        // dispatch key is the raw IRI, resolved in SparqlExpr.compile
        // against the registerFunction registry)
        val iri = parseIri()
        ws()
        if (peekSym("(")) {
          expect("(")
          val args = scala.collection.mutable.ListBuffer[Expr]()
          if (!peekSym(")")) {
            args += parseExpression()
            while (eatSym(",")) args += parseExpression()
          }
          expect(")")
          if (iri.startsWith(Term.xsd)) {
            if (args.length != 1) fail("constructor cast takes one argument")
            EFn("xsd:" + iri.stripPrefix(Term.xsd), args.head)
          } else EFn(iri, args.toSeq: _*)
        } else EIri(iri)
      }
    }
  }

  // SPARQL 1.1 §18.2.4.1: aggregates cannot nest — SUM(COUNT(?x)) is a
  // syntax error, caught here while parsing the outer aggregate's arg
  private var inAggregate = false

  private def parseAggregate(word: String): Expr = try {
    if (inAggregate) fail(s"aggregate $word nested inside another aggregate")
    inAggregate = true
    expect("(")
    val distinct = eat("DISTINCT")
    val call =
      if (word == "COUNT" && eatSym("*")) AggCall("COUNT_STAR", None, distinct)
      else {
        val e = parseExpression()
        if (word == "GROUP_CONCAT") {
          // `; SEPARATOR = str` (spec) and `; ORDER BY cond+` (extension,
          // ARQ-style) in either order
          var sep = " "
          var ord: Seq[(Expr, Boolean)] = Nil
          while (eatSym(";")) {
            if (peek("SEPARATOR")) { eat("SEPARATOR"); expect("=")
              sep = parseString() }
            else { expect("ORDER"); expect("BY")
              ord = parseOrderConditions() }
          }
          AggCall("GROUP_CONCAT", Some(e), distinct, sep, ord)
        } else AggCall(word, Some(e), distinct)
      }
    expect(")")
    val v = s"__agg${hoistedAggs.size}"
    hoistedAggs += v -> call
    EVar(v)
  } finally inAggregate = false

  // ---------------- query forms ----------------
  private def parsePrologue(): Unit = {
    var go = true
    while (go) {
      if (peek("PREFIX")) {
        eat("PREFIX"); ws()
        // PNAME_NS (rule [140]): empty, or PN_CHARS_BASE then
        // PN_CHARS/interior dots — one token, colon attached
        val start = pos
        while (pos < input.length &&
          (Term.isPnChar(input(pos)) || input(pos) == '.')) pos += 1
        while (pos > start && input(pos - 1) == '.') pos -= 1
        val name = input.substring(start, pos)
        if (name.nonEmpty && !Term.isPnCharsBase(name.head))
          fail(s"prefix '$name' must start with PN_CHARS_BASE")
        if (pos >= input.length || input(pos) != ':')
          fail("expected ':' after PREFIX name")
        pos += 1
        prefixes(name) = parseIriRef()
      } else if (peek("BASE")) { eat("BASE"); base = parseIriRef() }
      else if (peek("VERSION")) {
        // SPARQL 1.2 VersionDecl: VERSION then a plain string literal.
        // "1.1" and "1.2" are the language versions this engine speaks;
        // an unknown version is a loud error, not a silent downgrade
        eat("VERSION"); ws()
        if (pos >= input.length ||
          (input(pos) != '"' && input(pos) != '\'')) fail(
          "VERSION takes a string literal")
        val v = parseString()
        if (v != "1.1" && v != "1.2")
          fail(s"unsupported SPARQL VERSION \"$v\"")
      }
      else go = false
    }
  }

  private def parseSelect(): GraphPattern = {
    expect("SELECT")
    val aggMark = hoistedAggs.size // aggregates hoisted from THIS scope
    val distinct = eat("DISTINCT")
    val reduced = !distinct && eat("REDUCED")
    val projections =
      scala.collection.mutable.ListBuffer[(String, Option[Expr])]()
    var star = false
    ws()
    if (eatSym("*")) star = true
    else {
      var go = true
      while (go) {
        ws()
        if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
          projections += parseVarName() -> None
        else if (peekSym("(")) {
          expect("(")
          val e = parseExpression()
          expect("AS")
          val v = parseVarName()
          expect(")")
          projections += v -> Some(e)
        } else go = false
      }
    }
    parseDatasetClauses()
    eat("WHERE")
    var pattern = parseGroupGraphPattern()

    // GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET
    var groupKeys: Option[Seq[String]] = None
    if (peek("GROUP")) {
      eat("GROUP"); expect("BY")
      val keys = scala.collection.mutable.ListBuffer[String]()
      var gk = true
      while (gk) {
        ws()
        // GroupCondition ::= BuiltInCall | FunctionCall
        //   | '(' Expression ('AS' Var)? ')' | Var          (rule [20])
        // Expression keys always bind-and-group-on a variable; without
        // AS the variable is synthesized (internal, never projected).
        def bindKey(e: Expr, asVar: Option[String]): Unit = {
          val v = asVar.getOrElse(s"__gk${keys.length}")
          pattern = Extend(pattern, v, e)
          keys += v
        }
        if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
          keys += parseVarName()
        else if (peekSym("(")) {
          expect("(")
          val e = parseExpression()
          val asVar = if (eat("AS")) Some(parseVarName()) else None
          expect(")")
          bindKey(e, asVar)
        } else if (!peek("HAVING") && !peek("ORDER") && !peek("LIMIT") &&
          !peek("OFFSET") && !peek("VALUES") && pos < input.length &&
          (input(pos).isLetter || input(pos) == '<')) {
          // bare BuiltInCall / FunctionCall key, e.g. GROUP BY STR(?x)
          bindKey(parseExpression(), None)
        } else gk = false
      }
      // GroupClause requires GroupCondition+ (rule [19]): a bare
      // 'GROUP BY' with no condition is a syntax error
      if (keys.isEmpty)
        fail("GROUP BY requires at least one condition")
      groupKeys = Some(keys.toSeq)
    }
    var having: Option[Expr] = None
    if (peek("HAVING")) {
      eat("HAVING"); having = Some(parseConstraint())
      // HavingClause takes a constraint LIST (grammar rule [21]):
      // additional constraints conjoin
      ws()
      while (peekSym("(")) {
        having = Some(EFn("&&", having.get, parseConstraint())); ws()
      }
    }

    var orderKeys: Seq[(Expr, Boolean)] = Nil
    if (peek("ORDER")) { eat("ORDER"); expect("BY")
      orderKeys = parseOrderConditions() }
    var limit = -1L; var offset = 0L
    var sawLimit = false; var sawOffset = false
    var lo = true
    while (lo) {
      // LimitOffsetClauses (rule [25]): each clause at most ONCE
      if (peek("LIMIT")) {
        if (sawLimit) fail("duplicate LIMIT clause")
        sawLimit = true; eat("LIMIT"); limit = parseSliceCount("LIMIT")
      } else if (peek("OFFSET")) {
        if (sawOffset) fail("duplicate OFFSET clause")
        sawOffset = true; eat("OFFSET"); offset = parseSliceCount("OFFSET")
      } else lo = false
    }
    // trailing ValuesClause (grammar rule [28]); joins the solutions
    // after HAVING, before SELECT expressions (§18.2.4.6)
    val trailingValues: Option[ValuesPat] = {
      ws()
      if (peek("VALUES")) Some(parseInlineData()) else None
    }

    // assemble: aggregates parsed in this SELECT's scope
    val myAggs = hoistedAggs.drop(aggMark).toList
    hoistedAggs.remove(aggMark, hoistedAggs.size - aggMark)
    val hasAggs = myAggs.nonEmpty || groupKeys.isDefined
    // grammar-level scope rules (§18.2.4.1 / shared W3C syntax tests):
    // a projection variable may be assigned only once, and with
    // aggregation in play a bare projected variable must be a group key
    locally {
      val names = projections.map(_._1)
      names.diff(names.distinct).headOption.foreach(v =>
        fail(s"variable ?$v assigned more than once in SELECT"))
      // §18.2.4.1 / §19.8: (expr AS ?v) may not re-bind a variable
      // already in scope of the WHERE pattern
      val patVars = inScopeVars(pattern)
      projections.collectFirst { case (v, Some(_)) if patVars(v) => v }
        .foreach(v => fail(
          s"SELECT alias ?$v is already in scope of the WHERE pattern"))
      if (hasAggs) {
        val keys = groupKeys.getOrElse(Nil).toSet
        projections.collectFirst { case (v, None) if !keys(v) => v }
          .foreach(v => fail(
            s"variable ?$v projected alongside aggregates but not grouped"))
        // same scope rule for HAVING and ORDER BY: after grouping only
        // group keys, aggregates (already hoisted to __agg vars), and
        // projection aliases are visible. EXISTS subpatterns are their
        // own scope — only plain variable references count here.
        def plainVars(e: Expr): Set[String] = e match {
          case EVar(n) => Set(n)
          case EFn(_, args @ _*) => args.flatMap(plainVars).toSet
          case _ => Set.empty
        }
        val visible = keys ++ projections.collect { case (v, Some(_)) => v }
        def checkScope(e: Expr, where: String): Unit =
          plainVars(e).find(v => !visible(v) && !v.startsWith("__agg"))
            .foreach(v => fail(
              s"ungrouped variable ?$v in $where of an aggregate query"))
        having.foreach(checkScope(_, "HAVING"))
        orderKeys.foreach { case (e, _) => checkScope(e, "ORDER BY") }
      }
    }
    if (hasAggs) {
      val keys = groupKeys.getOrElse(Nil)
      pattern = Group(pattern, keys, myAggs)
    }
    having.foreach(h => pattern = Filter(h, pattern))
    trailingValues.foreach(v => pattern = Join(pattern, v))
    // projection expressions become Extends over the (grouped) pattern
    projections.foreach { case (v, Some(e)) => pattern = Extend(pattern, v, e)
      case _ => }
    if (orderKeys.nonEmpty) pattern = OrderBy(pattern, orderKeys)
    if (!star) pattern = Project(pattern, projections.map(_._1).toSeq)
    else if (hasAggs) fail("SELECT * with aggregates unsupported")
    if (distinct || reduced) pattern = Distinct(pattern)
    if (limit >= 0 || offset > 0) pattern = Slice(pattern, offset, limit)
    pattern
  }

  /** OrderCondition list (§18.2.4.4): ASC/DESC bracketted expressions,
    * bare variables, bracketted expressions, and bare Constraints — a
    * builtin call (`ORDER BY STRLEN(?x)`) or a function call by IRI.
    */
  private def parseOrderConditions(): Seq[(Expr, Boolean)] = {
    val keys = scala.collection.mutable.ListBuffer[(Expr, Boolean)]()
    var go = true
    while (go) {
      ws()
      if (pos >= input.length || input(pos) == '}' ||
        input(pos) == ')' || input(pos) == ';' || // GROUP_CONCAT(…; ORDER BY …)
        peek("LIMIT") || peek("OFFSET") || peek("VALUES")) go = false
      else if (peek("ASC")) { eat("ASC"); expect("(")
        keys += parseExpression() -> true; expect(")") }
      else if (peek("DESC")) { eat("DESC"); expect("(")
        keys += parseExpression() -> false; expect(")") }
      else if (input(pos) == '?' || input(pos) == '$')
        keys += EVar(parseVarName()) -> true
      else if (peekSym("(")) { expect("(")
        keys += parseExpression() -> true; expect(")") }
      else {
        // a bare OrderCondition is a Constraint: BuiltInCall or
        // FunctionCall only (rule [24]) — a literal (`ORDER BY 1`) or
        // plain IRI must be rejected, not folded into the key list
        val e = parsePrimaryExpression()
        e match {
          case _: EFn | _: EExists => keys += e -> true
          // aggregate calls were hoisted to an __agg var during parse
          case EVar(n) if n.startsWith("__agg") => keys += e -> true
          case _ => fail("ORDER BY condition must be a variable, " +
            "bracketted expression, or function call")
        }
      }
    }
    // OrderClause (rule [23]) requires at LEAST one condition
    if (keys.isEmpty) fail("ORDER BY requires at least one condition")
    keys.toSeq
  }

  /** Trailing ORDER BY / LIMIT / OFFSET (CONSTRUCT and DESCRIBE forms). */
  private def parseSolutionModifiers(p0: GraphPattern): GraphPattern = {
    var pattern = p0
    if (peek("ORDER")) {
      eat("ORDER"); expect("BY")
      pattern = OrderBy(pattern, parseOrderConditions())
    }
    var limit = -1L; var offset = 0L
    var sawLimit = false; var sawOffset = false
    var lo = true
    while (lo) {
      if (peek("LIMIT")) {
        if (sawLimit) fail("duplicate LIMIT clause")
        sawLimit = true; eat("LIMIT"); limit = parseSliceCount("LIMIT")
      } else if (peek("OFFSET")) {
        if (sawOffset) fail("duplicate OFFSET clause")
        sawOffset = true; eat("OFFSET"); offset = parseSliceCount("OFFSET")
      } else lo = false
    }
    if (limit >= 0 || offset > 0) pattern = Slice(pattern, offset, limit)
    pattern
  }

  /** LIMIT/OFFSET argument: the grammar takes an UNSIGNED INTEGER
    * (rules [26]/[27] use INTEGER, which has no sign).
    */
  private def parseSliceCount(kw: String): Long = {
    ws()
    if (pos < input.length && (input(pos) == '-' || input(pos) == '+'))
      fail(s"$kw takes an unsigned integer")
    val n = parseNumber()
    if (n.dt != Term.XsdInteger) fail(s"$kw takes an integer")
    n.lex.toLong
  }

  /** ConstructTemplate (rule [73]): triples with the full TriplesNode
    * surface — labeled and anonymous blank nodes (`[ props ]`, `[]`)
    * and RDF collections. Template blank nodes instantiate FRESH per
    * solution downstream (QueryExec.instantiate hashes label × row).
    */
  private def parseConstructTemplate(): Seq[TriplePattern] = {
    expect("{")
    val out = scala.collection.mutable.ListBuffer[TriplePattern]()
    def verb(): TermPat = {
      ws()
      if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
        V(parseVarName())
      else if (eatTypeKw())
        I("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      else I(parseIri())
    }
    def node(): TermPat = {
      ws()
      if (peekSym("[")) {
        expect("["); anonVar += 1
        val b = B(s"anon$anonVar")
        ws()
        if (!peekSym("]")) props(b)
        expect("]"); b
      } else if (peekSym("(") ) {
        expect("(")
        val items = scala.collection.mutable.ListBuffer[TermPat]()
        while (!eatSym(")")) items += inObj(node())
        if (items.isEmpty) I(RdfNil)
        else {
          val nodes = items.map { _ => anonVar += 1; B(s"anon$anonVar") }
          for (((n0, item), idx) <- nodes.zip(items).zipWithIndex) {
            out += TriplePattern(n0, I(RdfFirst), item)
            val rest: TermPat =
              if (idx == items.size - 1) I(RdfNil) else nodes(idx + 1)
            out += TriplePattern(n0, I(RdfRest), rest)
          }
          nodes.head
        }
      } else if (peekSym("<<") && !peekSym("<<("))
        parseReifiedTriple(tp => out += tp)
      else parseVarOrTerm()
    }
    def props(s: TermPat): Unit = {
      var moreProps = true
      while (moreProps) {
        ws()
        val p = verb()
        var moreObjs = true
        while (moreObjs) {
          val o = inObj(node())
          out += TriplePattern(s, p, o)
          ws()
          // SPARQL-star annotation blocks in templates: each block's
          // props attach to the quoted form of the emitted triple
          var annTarget: TermPat = null
          var run = true
          while (run) {
            if (peekSym("{|")) {
              expect("{|")
              props(if (annTarget == null) Q(s, p, o) else annTarget)
              expect("|}")
              ws()
            } else if (peekSym("~")) {
              // template reifier: same 1.2 sugar as the pattern side
              expect("~")
              val r = parseReifierTerm()
              out += TriplePattern(r, I(RdfNs + "reifies"), Q(s, p, o))
              annTarget = r
              ws()
            } else run = false
          }
          moreObjs = eatSym(",")
        }
        moreProps = eatSym(";")
        ws()
        if (moreProps && (pos >= input.length || input(pos) == '.' ||
          input(pos) == '}' || input(pos) == ']' ||
          input(pos) == '|')) moreProps = false
      }
    }
    while (!peekSym("}")) {
      ws()
      val wasBnodeList = peekSym("[")
      val s = node()
      ws()
      if (!wasBnodeList ||
        (pos < input.length && input(pos) != '.' && input(pos) != '}'))
        props(s)
      eatSym(".")
    }
    expect("}")
    out.toSeq
  }

  // ---------------- updates (spargebra/src/update.rs grammar) ---------
  /** QuadPattern block: triples with optional `GRAPH <iri>/?var { … }`
    * sub-blocks; bare triples land in `defaultG` (DefaultGraphPat, or
    * the WITH graph).
    */
  private def parseQuadBlock(
      defaultG: TermPat): Seq[(TermPat, TriplePattern)] = {
    expect("{")
    val out = scala.collection.mutable.ListBuffer[(TermPat, TriplePattern)]()
    def subjectBlock(g: TermPat): Unit = {
      def node(): TermPat = {
        ws()
        if (peekSym("[")) {
          // TriplesTemplate admits TriplesNode (rule [52]); the
          // DELETE-side bnode prohibitions are enforced downstream
          // (noBnodes / the QuadData ground check)
          expect("["); anonVar += 1
          val b = B(s"anon$anonVar")
          ws()
          if (!peekSym("]")) props(b)
          expect("]"); b
        } else if (peekSym("<<") && !peekSym("<<("))
          // internal reifier form lands its rdf:reifies quad in the
          // enclosing graph, like the post-object `~r` sugar below
          parseReifiedTriple(tp => out += g -> tp)
        else parseVarOrTerm()
      }
      def props(s: TermPat): Unit = {
        var moreProps = true
        while (moreProps) {
          ws()
          val p: TermPat =
            if (pos < input.length &&
              (input(pos) == '?' || input(pos) == '$'))
              V(parseVarName())
            else if (eatTypeKw())
              I("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
            else I(parseIri())
          var moreObjs = true
          while (moreObjs) {
            val o = inObj(node())
            out += g -> TriplePattern(s, p, o)
            ws()
            // 1.2 reifier sugar in quad data: `~r` adds the
            // r rdf:reifies <<(s p o)>> quad in the same graph
            while (peekSym("~")) {
              expect("~")
              val r = parseReifierTerm()
              out += g -> TriplePattern(r, I(RdfNs + "reifies"), Q(s, p, o))
              ws()
            }
            moreObjs = eatSym(",")
          }
          moreProps = eatSym(";")
          ws()
          if (moreProps && (pos >= input.length || input(pos) == '.' ||
            input(pos) == '}' || input(pos) == ']')) moreProps = false
        }
      }
      ws()
      val wasBnodeList = peekSym("[")
      val s = node()
      ws()
      if (!wasBnodeList ||
        (pos < input.length && input(pos) != '.' && input(pos) != '}'))
        props(s)
      eatSym(".")
    }
    var done = false
    while (!done) {
      ws()
      if (peekSym("}")) done = true
      else if (peek("GRAPH")) {
        eat("GRAPH")
        ws()
        val g: TermPat =
          if (pos < input.length && (input(pos) == '?' || input(pos) == '$'))
            V(parseVarName())
          else I(parseIri())
        expect("{")
        while (!peekSym("}")) subjectBlock(g)
        expect("}")
        eatSym(".")
      } else subjectBlock(defaultG)
    }
    expect("}")
    out.toSeq
  }

  private def parseQuadData(): Seq[(TermPat, TriplePattern)] = {
    val out = parseQuadBlock(DefaultGraphPat)
    // QuadData is ground by grammar (§19.8 rule [48]): variables are a
    // SYNTAX error here, not an evaluation error
    def ground(tp: TermPat): Boolean = tp match {
      case V(_) => false
      case Q(s, p, o) => ground(s) && ground(p) && ground(o)
      case _ => true
    }
    for ((g, t) <- out)
      if (!ground(g) || !ground(t.s) || !ground(t.p) || !ground(t.o))
        fail("variables are not allowed in INSERT/DELETE DATA")
    out
  }

  /** Grammar notes 8/9 (§19.6): blank nodes are disallowed in DELETE
    * DATA, DELETE WHERE, and the DELETE template of DELETE/INSERT.
    */
  private def noBnodes(qs: Seq[(TermPat, TriplePattern)],
      ctx: String): Seq[(TermPat, TriplePattern)] = {
    def has(tp: TermPat): Boolean = tp match {
      case B(_) => true
      case Q(s, p, o) => has(s) || has(p) || has(o)
      case _ => false
    }
    for ((g, t) <- qs)
      if (has(g) || has(t.s) || has(t.p) || has(t.o))
        fail(s"blank nodes are not allowed in $ctx")
    qs
  }

  /** DELETE WHERE shorthand: the quad template doubles as the pattern —
    * per-graph groups become GRAPH-scoped BGPs.
    */
  private def quadsToPattern(
      qs: Seq[(TermPat, TriplePattern)]): GraphPattern =
    if (qs.isEmpty) Bgp() // DELETE WHERE { } — grammatical, a no-op
    else qs.groupBy(_._1).toSeq.sortBy(_._1.toString).map { case (g, ts) =>
      val bgp = Bgp(ts.map(_._2): _*)
      g match {
        case DefaultGraphPat => bgp: GraphPattern
        case other => GraphPat(other, bgp)
      }
    }.reduce(Join(_, _))

  def parseUpdate(): Seq[UpdateOp] = {
    parsePrologue()
    val ops = scala.collection.mutable.ListBuffer[UpdateOp]()
    var go = true
    while (go) {
      ws()
      if (pos >= input.length) go = false
      else if (peek("WITH") || peek("INSERT") || peek("DELETE")) {
        // WITH <g> (§3.1.3): default graph for both templates AND the
        // WHERE match; only legal on the Modify form, not DATA.
        val withG: Option[String] =
          if (peek("WITH")) { eat("WITH"); Some(parseIri()) } else None
        val defaultG: TermPat =
          withG.map(I(_): TermPat).getOrElse(DefaultGraphPat)
        // USING overrides WITH for the WHERE match (§3.1.3)
        def wrapWhere(p: GraphPattern, u: Seq[String],
            un: Seq[String]): GraphPattern =
          if (u.nonEmpty || un.nonEmpty) p
          else withG.map(g => GraphPat(I(g), p): GraphPattern).getOrElse(p)
        def parseUsing(): (Seq[String], Seq[String]) = {
          val u = scala.collection.mutable.ListBuffer[String]()
          val un = scala.collection.mutable.ListBuffer[String]()
          while (peek("USING")) {
            eat("USING")
            if (peek("NAMED")) { eat("NAMED"); un += parseIri() }
            else u += parseIri()
          }
          (u.toSeq, un.toSeq)
        }
        if (peek("INSERT")) {
          eat("INSERT")
          if (peek("DATA")) {
            if (withG.isDefined) fail("WITH is not allowed on INSERT DATA")
            eat("DATA"); ops += InsertData(parseQuadData())
          } else {
            val ins = parseQuadBlock(defaultG)
            val (u, un) = parseUsing()
            eat("WHERE")
            ops += DeleteInsert(Nil, ins,
              wrapWhere(parseGroupGraphPattern(), u, un), u, un, withG)
          }
        } else if (peek("DELETE")) {
          eat("DELETE")
          if (peek("DATA")) {
            if (withG.isDefined) fail("WITH is not allowed on DELETE DATA")
            eat("DATA")
            ops += DeleteData(noBnodes(parseQuadData(), "DELETE DATA"))
          } else if (peek("WHERE")) { // DELETE WHERE { quad tmpl }
            // rule [40] has no WITH slot; [41] requires a QuadPattern
            // right after DELETE
            if (withG.isDefined)
              fail("WITH is not allowed on DELETE WHERE")
            eat("WHERE")
            val tmpl = noBnodes(parseQuadBlock(defaultG), "DELETE WHERE")
            ops += DeleteInsert(tmpl, Nil, quadsToPattern(tmpl))
          } else {
            val del =
              noBnodes(parseQuadBlock(defaultG), "a DELETE template")
            val ins =
              if (peek("INSERT")) { eat("INSERT"); parseQuadBlock(defaultG) }
              else Nil
            val (u, un) = parseUsing()
            eat("WHERE")
            ops += DeleteInsert(del, ins,
              wrapWhere(parseGroupGraphPattern(), u, un), u, un, withG)
          }
        } else fail("WITH must be followed by DELETE or INSERT")
      } else if (peek("CLEAR") || peek("DROP")) {
        // GraphRefAll ::= GRAPH iri | DEFAULT | NAMED | ALL (§3.2.2/3)
        val drop = peek("DROP")
        eat(if (drop) "DROP" else "CLEAR"); eat("SILENT")
        if (peek("GRAPH")) {
          eat("GRAPH"); val i = parseIri()
          ops += (if (drop) DropGraph(Some(i)) else ClearGraph(Some(i)))
        } else if (peek("DEFAULT")) {
          eat("DEFAULT")
          ops += (if (drop) DropGraph(None) else ClearGraph(None))
        } else if (peek("NAMED")) {
          eat("NAMED"); ops += (if (drop) DropNamed else ClearNamed)
        } else if (peek("ALL")) {
          eat("ALL"); ops += (if (drop) DropAll else ClearAll)
        } else fail("expected GRAPH <iri>, DEFAULT, NAMED or ALL after " +
          (if (drop) "DROP" else "CLEAR"))
      } else if (peek("CREATE")) {
        eat("CREATE"); eat("SILENT"); expect("GRAPH")
        ops += CreateGraph(parseIri())
      } else if (peek("LOAD")) {
        eat("LOAD"); eat("SILENT")
        val src = parseIri()
        val into =
          if (eat("INTO")) { expect("GRAPH"); Some(parseIri()) } else None
        ops += LoadGraph(src, into)
      } else if (peek("COPY") || peek("MOVE") || peek("ADD")) {
        val kind =
          if (eat("COPY")) "COPY" else if (eat("MOVE")) "MOVE"
          else { eat("ADD"); "ADD" }
        eat("SILENT")
        def graphRef(): Option[String] =
          if (eat("DEFAULT")) None
          else { eat("GRAPH"); Some(parseIri()) }
        val from = graphRef()
        expect("TO")
        val to = graphRef()
        ops += (kind match {
          case "COPY" => CopyGraph(from, to)
          case "MOVE" => MoveGraph(from, to)
          case _ => AddGraph(from, to)
        })
      } else fail("expected INSERT, DELETE, LOAD, CLEAR, DROP, CREATE, " +
        "COPY, MOVE or ADD")
      ws()
      if (!eatSym(";")) go = false
      // rule [3]: Update ::= Prologue ( Update1 ( ';' Update )? )? —
      // each ';' opens a fresh Update with its own Prologue, so
      // PREFIX/BASE may (re)declare between operations
      else parsePrologue()
    }
    ws()
    if (pos < input.length) fail("unexpected trailing input")
    ops.toSeq
  }

  /** DatasetClause* — every query form takes FROM / FROM NAMED between
    * its head and WHERE (rules [10]–[13]).
    */
  private def parseDatasetClauses(): Unit =
    while (peek("FROM")) {
      eat("FROM")
      if (eat("NAMED")) fromNamed :+= parseIri()
      else fromDefault :+= parseIri()
    }

  def parseQuery(): QueryForm = {
    parsePrologue()
    ws()
    val form =
      if (peek("SELECT")) Select(parseSelect())
      else if (peek("ASK")) { eat("ASK"); parseDatasetClauses()
        eat("WHERE"); Ask(parseGroupGraphPattern()) }
      else if (peek("CONSTRUCT")) {
        eat("CONSTRUCT")
        ws()
        if (peek("FROM") || peek("WHERE")) {
          // CONSTRUCT WHERE { bgp } shorthand (§10.2.2): the template IS
          // the pattern; only triple patterns allowed, which is exactly
          // what the template parser accepts. Dataset clauses precede
          // the WHERE, which is MANDATORY in this form (rule [10]).
          parseDatasetClauses()
          expect("WHERE")
          val tmpl = parseConstructTemplate()
          val where = parseSolutionModifiers(Bgp(tmpl: _*))
          Construct(tmpl, where)
        } else {
          val tmpl = parseConstructTemplate()
          parseDatasetClauses()
          eat("WHERE")
          var where = parseGroupGraphPattern()
          // solution modifiers apply to the WHERE solutions before the
          // template instantiates (SPARQL §16.2)
          where = parseSolutionModifiers(where)
          Construct(tmpl, where)
        }
      }
      else if (peek("DESCRIBE")) {
        eat("DESCRIBE")
        val vars = scala.collection.mutable.ListBuffer[String]()
        val iris = scala.collection.mutable.ListBuffer[String]()
        var star = false
        var go = true
        while (go) {
          ws()
          if (eatSym("*")) { star = true; go = false }
          else if (pos < input.length &&
            (input(pos) == '?' || input(pos) == '$'))
            vars += parseVarName()
          else if (peekSym("<")) iris += parseIriRef()
          else tryPrefixedName() match {
            case Some(iri) => iris += iri
            case None => go = false
          }
        }
        if (!star && vars.isEmpty && iris.isEmpty)
          fail("DESCRIBE needs a resource")
        parseDatasetClauses()
        var pattern: GraphPattern =
          if (peek("WHERE")) { eat("WHERE"); parseGroupGraphPattern() }
          else Bgp()
        if (star) vars ++= inScopeVars(pattern).toSeq.sorted
        pattern = parseSolutionModifiers(pattern)
        // constant resources: bind each to a fresh var via inline data
        val iriVars = iris.toSeq.zipWithIndex.map { case (iri, idx) =>
          val v = s"__desc$idx"
          pattern = Join(pattern, ValuesPat(Seq(v), Seq(Seq(Some(I(iri))))))
          v
        }
        Describe(pattern, vars.toSeq ++ iriVars)
      }
      else fail("expected SELECT, ASK, CONSTRUCT or DESCRIBE")
    // a mis-parse must be loud: leftover input means some clause was
    // silently skipped (e.g. an unsupported solution modifier), which
    // would otherwise return wrong answers instead of an error
    ws()
    if (pos < input.length) fail("unexpected trailing input")
    form
  }
}

object SparqlParser {
  def parse(query: String): QueryForm = new SparqlParser(query).parseQuery()

  def parseUpdateText(update: String): Seq[UpdateOp] =
    new SparqlParser(update).parseUpdate()

  /** Parse and execute against a quad table (honoring FROM/FROM NAMED). */
  def execute(query: String, quads: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    executeProtocol(query, quads, Nil, Nil)

  /** Parse and execute against an indexed QuadSource (r12): queries
    * without FROM/FROM NAMED run straight over the store — constant-
    * predicate scans hit its per-predicate slices; a query carrying its
    * own dataset clause falls back to the dataset-rewritten quad table
    * (the rewrite invalidates any per-predicate index by construction).
    */
  def execute(query: String, store: graft.io.QuadSource)
      : org.apache.spark.sql.DataFrame = {
    import graft.exec.QueryExec
    val parser = new SparqlParser(query)
    val form = parser.parseQuery()
    if (parser.fromDefault.nonEmpty || parser.fromNamed.nonEmpty)
      executeParsed(form, QueryExec.applyDataset(store.all,
        parser.fromDefault, parser.fromNamed), parser.fromNamed)
    else form match {
      case Select(p) => QueryExec.select(p, store)
      case Ask(p) => QueryExec.ask(p, store)
      case Construct(t, p) => QueryExec.construct(t, p, store)
      case Describe(p, vs) => describeVs(p, vs, store)
    }
  }

  private def describeVs(p: graft.algebra.Algebra.GraphPattern,
      vs: Seq[String], store: graft.io.QuadSource)
      : org.apache.spark.sql.DataFrame = {
    import graft.exec.QueryExec
    vs match {
      case Seq(v) => QueryExec.describe(p, v, store)
      case _ => QueryExec.describe(p, vs, store.all, Nil)
    }
  }

  private def executeParsed(form: QueryForm,
      dataset: org.apache.spark.sql.DataFrame, reg: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import graft.exec.QueryExec
    form match {
      case Select(p) => QueryExec.select(p, dataset, reg)
      case Ask(p) => QueryExec.ask(p, dataset, reg)
      case Construct(t, p) => QueryExec.construct(t, p, dataset, reg)
      case Describe(p, vs) => QueryExec.describe(p, vs, dataset, reg)
    }
  }

  def execute(query: String, quads: org.apache.spark.sql.DataFrame,
      registry: Seq[String]): org.apache.spark.sql.DataFrame =
    executeProtocol(query, quads, Nil, Nil, registry)

  /** Execute with a PROTOCOL-specified dataset (SPARQL 1.1 Protocol
    * §2.1.4: `default-graph-uri`/`named-graph-uri` parameters OVERRIDE
    * the query's own FROM/FROM NAMED). Empty protocol dataset falls
    * back to the query's. `registry` is the store's empty-graph list;
    * under an explicit dataset the named graphs are EXACTLY the listed
    * ones (§13.2) — each listed graph exists as a dataset graph even
    * when it holds no quads, so the list itself becomes the registry.
    */
  def executeProtocol(query: String, quads: org.apache.spark.sql.DataFrame,
      protoDefault: Seq[String], protoNamed: Seq[String],
      registry: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    import graft.exec.QueryExec
    val parser = new SparqlParser(query)
    val form = parser.parseQuery()
    val explicit = protoDefault.nonEmpty || protoNamed.nonEmpty ||
      parser.fromDefault.nonEmpty || parser.fromNamed.nonEmpty
    val dataset =
      if (protoDefault.nonEmpty || protoNamed.nonEmpty)
        QueryExec.applyDataset(quads, protoDefault, protoNamed)
      else QueryExec.applyDataset(quads, parser.fromDefault,
        parser.fromNamed)
    val reg =
      if (!explicit) registry
      else if (protoDefault.nonEmpty || protoNamed.nonEmpty) protoNamed
      else parser.fromNamed
    form match {
      case Select(p) => QueryExec.select(p, dataset, reg)
      case Ask(p) => QueryExec.ask(p, dataset, reg)
      case Construct(t, p) => QueryExec.construct(t, p, dataset, reg)
      case Describe(p, vs) => QueryExec.describe(p, vs, dataset, reg)
    }
  }
}
