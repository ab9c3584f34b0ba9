package graft.io

import scala.collection.mutable.ListBuffer
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** Turtle / TriG parser (oxigraph: lib/oxttl/src/turtle.rs + terse.rs
  * + trig.rs): prefix-stateful, so a document parses as a unit — RdfIO
  * feeds whole files (per-FILE parallelism; SURVEY.md §2.1: Turtle is
  * not line-splittable, N-Quads is the parallel bulk format).
  *
  * Subset: @prefix/@base (+ SPARQL-style PREFIX/BASE), prefixed names,
  * 'a', ';' ',' object lists, blank node labels and property lists
  * [ ... ], collections ( ... ), numeric/boolean shorthand literals,
  * quoted literals with @lang / ^^dt and long quotes, TriG graph blocks
  * (`<g> { ... }`, `GRAPH <g> { ... }`, `{ ... }`).
  *
  * With `n3 = true` (oxigraph: lib/oxttl/src/n3.rs) the grammar grows
  * N3 features: quick variables `?x` (universals, materialized as
  * stable blank nodes), `@forAll` / `@forSome` quantifier declarations
  * (quantified symbols substitute to blank nodes), operator predicates
  * `=` (owl:sameAs), `=>` (log:implies) and `<=` (reversed implies),
  * and formula terms `{ ... }` — each formula's triples land in a
  * fresh blank-node-named graph and the formula term IS that graph
  * name (quoting-as-named-graph, a documented deviation from true N3
  * quoting), and paths `t!p` / `t^p` (each step materializes a fresh
  * bnode plus its step triple).
  */
final class TurtleParser(input: String, n3: Boolean = false,
    /** Disambiguates GENERATED (anonymous) blank-node labels across
      * parallel parses of one document's chunks ([[TurtleSplit]]) —
      * labeled `_:x` bnodes keep their document-scoped labels, so they
      * unify across chunks; generated ones must NOT collide.
      */
    bnodeTag: String = "") {
  private var pos = 0
  private var base = ""
  private val prefixes = scala.collection.mutable.Map[String, String]()
  private var bnodeN = 0
  private val out = ListBuffer[QuadRow]()
  private val DG = TermRow(Term.DefaultGraphKind.toByte, null, null, null)
  /** current graph context (TriG blocks); default graph otherwise */
  private var graph: TermRow = DG
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private def rdfIri(local: String) =
    TermRow(Term.IriKind.toByte, RdfNs + local, null, null)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(
    s"Turtle parse error: $msg at ...${input.slice(pos, pos + 40)}")

  private def ws(): Unit = {
    var go = true
    while (go) {
      while (pos < input.length && input(pos).isWhitespace) pos += 1
      if (pos < input.length && input(pos) == '#') {
        while (pos < input.length && input(pos) != '\n') pos += 1
      } else go = false
    }
  }
  /** Case-insensitive keyword peek with a TOKEN BOUNDARY: the char
    * after the keyword must not continue a prefixed name (letters,
    * digits, `_`, `-`, `:`) — otherwise `base:a`/`trueblood:x`
    * statements would misparse as a BASE directive / boolean. A `.`
    * counts as a boundary (it terminates `true.` statements; pname
    * prefixes with mid-dots starting in a keyword are ambiguous and
    * resolve to the keyword, as in other Turtle parsers).
    */
  private def peekKeyword(s: String): Boolean = {
    ws()
    input.regionMatches(true, pos, s, 0, s.length) && {
      val j = pos + s.length
      j >= input.length || {
        val c = input(j)
        !c.isLetterOrDigit && c != '_' && c != '-' && c != ':'
      }
    }
  }
  private def eatSym(s: String): Boolean = {
    ws()
    if (input.regionMatches(false, pos, s, 0, s.length)) {
      pos += s.length; true
    } else false
  }
  private def expect(s: String): Unit =
    if (!eatSym(s)) fail(s"expected '$s'")

  private def parseIriRef(): String = {
    expect("<")
    val start = pos
    while (pos < input.length && input(pos) != '>') pos += 1
    val iri = graft.model.RdfEscapes.unescapeIri(input.substring(start, pos))
    expect(">")
    graft.model.IriResolve.resolve(base, iri)
  }

  /** Characters PN_LOCAL_ESC may escape (Turtle rule [172s] — same
    * set as SPARQL).
    */
  private val PnLocalEsc = "_~.-!$&'()*+,;=/?#@%"
  private def isHex(c: Char) =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def parsePrefixedName(): String = {
    val start = pos
    // PN_PREFIX: PN_CHARS (incl. combining marks) plus interior dots
    while (pos < input.length &&
      (Term.isPnChar(input(pos)) || input(pos) == '.')) pos += 1
    while (pos > start && input(pos - 1) == '.') pos -= 1
    val pfx = input.substring(start, pos)
    if (pos >= input.length || input(pos) != ':') fail(s"bad prefixed name")
    pos += 1
    val ns = prefixes.getOrElse(pfx, fail(s"undefined prefix '$pfx:'"))
    // PN_LOCAL (rule [168s]): name chars plus ':', '.', PERCENT-encoded
    // pairs, and PN_LOCAL_ESC backslash escapes (resolved to the raw
    // char); a trailing run of bare dots is the statement terminator
    val sb = new StringBuilder
    var dots = 0 // bare '.' run pending acceptance (interior only)
    var go = true
    while (go && pos < input.length) {
      val c = input(pos)
      if (c == '.') { dots += 1; pos += 1 }
      else if (Term.isPnChar(c) || c == ':') {
        sb.append("." * dots); dots = 0
        sb += c; pos += 1
      } else if (c == '\\' && pos + 1 < input.length &&
        PnLocalEsc.indexOf(input(pos + 1)) >= 0) {
        sb.append("." * dots); dots = 0
        sb += input(pos + 1); pos += 2
      } else if (c == '%' && pos + 2 < input.length &&
        isHex(input(pos + 1)) && isHex(input(pos + 2))) {
        sb.append("." * dots); dots = 0
        sb.append(input.substring(pos, pos + 3)); pos += 3
      } else go = false
    }
    pos -= dots // give trailing dots back (statement terminator)
    ns + sb.toString
  }

  private def parseString(): String = {
    val quote =
      if (eatSym("\"\"\"")) "\"\"\"" else if (eatSym("'''")) "'''"
      else if (eatSym("\"")) "\"" else if (eatSym("'")) "'"
      else fail("expected string")
    val sb = new StringBuilder
    while (pos < input.length && !input.startsWith(quote, pos)) {
      if (input(pos) == '\\' && pos + 1 < input.length) {
        pos += 1
        input(pos) match {
          // UCHAR: \uXXXX / \UXXXXXXXX codepoint escapes
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
            case other => other // incl. \\ \" \'
          })
        }
      } else sb += input(pos)
      pos += 1
    }
    expect(quote)
    sb.toString
  }

  private def freshBnode(): TermRow = {
    bnodeN += 1
    TermRow(Term.BlankKind.toByte, s"tb$bnodeTag$bnodeN", null, null)
  }

  // ---- N3 state ------------------------------------------------------
  private val OwlSameAs = "http://www.w3.org/2002/07/owl#sameAs"
  private val LogImplies = "http://www.w3.org/2000/10/swap/log#implies"
  /** @forAll/@forSome-declared symbols and ?quickVars -> blank nodes. */
  private val quantified = scala.collection.mutable.Map[String, TermRow]()
  private def quantVar(key: String): TermRow =
    quantified.getOrElseUpdate(key,
      TermRow(Term.BlankKind.toByte, "v_" + key.replaceAll("[^A-Za-z0-9]", "_"),
        null, null))
  /** Substitute a quantified symbol with its variable blank node. */
  private def subst(t: TermRow): TermRow =
    if (n3 && t.kind == Term.IriKind.toByte)
      quantified.getOrElse(t.lex, t)
    else t

  /** N3 formula term: triples land in a fresh blank-named graph; the
    * graph name is the formula's term value.
    */
  private def parseFormula(): TermRow = {
    val fid = freshBnode()
    val saved = graph
    graph = fid
    ws()
    while (pos < input.length && input(pos) != '}') {
      val s = parseTerm()
      ws()
      if (pos < input.length && input(pos) != '.' && input(pos) != '}')
        predicateObjectList(s)
      eatSym(".")
      ws()
    }
    expect("}")
    graph = saved
    fid
  }

  /** N3 path suffixes `t!p` (object of p from t) and `t^p` (subject of
    * p leading to t): each step materializes a fresh bnode and the
    * step's triple; the path value is the final bnode (oxttl n3.rs
    * path handling). Adjacent only — `^^` stays the datatype marker.
    */
  private def parseTerm(): TermRow = {
    var t = parsePrimaryTerm()
    while (n3 && pos < input.length &&
        (input(pos) == '!' ||
          (input(pos) == '^' &&
            (pos + 1 >= input.length || input(pos + 1) != '^')))) {
      val fwd = input(pos) == '!'
      pos += 1
      val p = parsePrimaryTerm()
      val b = freshBnode()
      if (fwd) out += QuadRow(graph, t, p, b)
      else out += QuadRow(graph, b, p, t)
      t = b
    }
    t
  }

  private def parsePrimaryTerm(): TermRow = {
    ws()
    if (pos >= input.length) fail("unexpected end")
    input(pos) match {
      case '{' if n3 => pos += 1; parseFormula()
      case '?' if n3 =>
        pos += 1
        val start = pos
        while (pos < input.length && (input(pos).isLetterOrDigit ||
          input(pos) == '_')) pos += 1
        quantVar("?" + input.substring(start, pos))
      // RDF-star quoted triple << s p o >> (Turtle-star)
      case '<' if pos + 1 < input.length && input(pos + 1) == '<' =>
        pos += 2
        val qs = parseTerm(); val qp = parseTerm(); val qo = parseTerm()
        ws()
        expect(">>")
        quotedTerm(qs, qp, qo)
      case '<' => subst(TermRow(Term.IriKind.toByte, parseIriRef(), null, null))
      case '_' =>
        pos += 2 // _:
        val start = pos
        // BLANK_NODE_LABEL (rule [141s]): interior '.' and PN_CHARS
        // are label chars; a trailing dot run is the statement dot
        while (pos < input.length &&
          (Term.isPnChar(input(pos)) || input(pos) == '.')) pos += 1
        var end = pos
        while (end > start && input(end - 1) == '.') end -= 1
        pos = end
        TermRow(Term.BlankKind.toByte, input.substring(start, end), null, null)
      case '"' | '\'' =>
        val lex = parseString()
        if (eatSym("^^")) {
          val dt = if (input(pos) == '<') parseIriRef() else parsePrefixedName()
          TermRow(Term.LiteralKind.toByte, lex, dt, null)
        } else if (pos < input.length && input(pos) == '@') {
          pos += 1
          val s2 = pos
          while (pos < input.length && (input(pos).isLetterOrDigit ||
            input(pos) == '-')) pos += 1
          val tag = input.substring(s2, pos)
          // LANGTAG (rule [144s]): letters, then '-'-led alnum subtags —
          // digits in the primary tag or a dangling '-' are errors
          if (!tag.matches("[a-zA-Z]+(-[a-zA-Z0-9]+)*"))
            fail(s"bad language tag '@$tag'")
          TermRow(Term.LiteralKind.toByte, lex, Term.RdfLangString,
            Term.normLang(tag))
        } else TermRow(Term.LiteralKind.toByte, lex, Term.XsdString, null)
      case '[' =>
        pos += 1
        val b = freshBnode()
        ws()
        if (input(pos) != ']') predicateObjectList(b)
        expect("]")
        b
      case '(' =>
        // collection ( e1 e2 ... ) -> rdf:first/rdf:rest chain
        pos += 1
        val items = ListBuffer[TermRow]()
        ws()
        while (pos < input.length && input(pos) != ')') {
          items += parseTerm(); ws()
        }
        expect(")")
        if (items.isEmpty) rdfIri("nil")
        else {
          val nodes = items.map(_ => freshBnode())
          for (((n, item), idx) <- nodes.zip(items).zipWithIndex) {
            out += QuadRow(graph, n, rdfIri("first"), item)
            out += QuadRow(graph, n, rdfIri("rest"),
              if (idx == items.size - 1) rdfIri("nil") else nodes(idx + 1))
          }
          nodes.head
        }
      case c if c.isDigit || c == '+' || c == '-' || c == '.' =>
        val start = pos
        if (c == '+' || c == '-') pos += 1
        var isDec = false; var isDbl = false
        while (pos < input.length && (input(pos).isDigit ||
          input(pos) == '.' || input(pos) == 'e' || input(pos) == 'E' ||
          ((input(pos) == '+' || input(pos) == '-') &&
            (input(pos - 1) == 'e' || input(pos - 1) == 'E')))) {
          if (input(pos) == '.') isDec = true
          if (input(pos) == 'e' || input(pos) == 'E') isDbl = true
          pos += 1
        }
        var lex = input.substring(start, pos)
        // a trailing '.' is the statement terminator, not part of a number
        if (lex.endsWith(".")) { lex = lex.dropRight(1); pos -= 1
          isDec = lex.contains('.') }
        // INTEGER/DECIMAL/DOUBLE (rules [19]-[21]): one dot at most,
        // exponents need digits — the scan is greedy, so validate the
        // token it produced ("1.2.3", "1e" must be rejected, not stored)
        if (!lex.matches(
          "[+-]?(\\d+\\.?\\d*([eE][+-]?\\d+)?|\\.\\d+([eE][+-]?\\d+)?)"))
          fail(s"bad numeric literal '$lex'")
        TermRow(Term.LiteralKind.toByte, lex,
          if (isDbl) Term.XsdDouble
          else if (isDec) Term.XsdDecimal else Term.XsdInteger, null)
      case 't' if peekKeyword("true") =>
        pos += 4; TermRow(Term.LiteralKind.toByte, "true", Term.XsdBoolean, null)
      case 'f' if peekKeyword("false") =>
        pos += 5; TermRow(Term.LiteralKind.toByte, "false", Term.XsdBoolean, null)
      case _ => subst(TermRow(Term.IriKind.toByte, parsePrefixedName(),
        null, null))
    }
  }

  private def parsePredicate(): TermRow = {
    ws()
    if (input(pos) == 'a' && pos + 1 < input.length &&
      (input(pos + 1).isWhitespace))
      { pos += 1
        TermRow(Term.IriKind.toByte,
          "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", null, null) }
    else if (input(pos) == '<')
      TermRow(Term.IriKind.toByte, parseIriRef(), null, null)
    else TermRow(Term.IriKind.toByte, parsePrefixedName(), null, null)
  }

  private def predicateObjectList(s: TermRow): Unit = {
    var moreProps = true
    while (moreProps) {
      // N3 operator predicates come before the general verb forms
      // ("<=" is checked before an IRI's '<'; its 2nd char disambiguates)
      val (p, reversed) =
        if (n3 && eatSym("=>"))
          (TermRow(Term.IriKind.toByte, LogImplies, null, null), false)
        else if (n3 && eatSym("<="))
          (TermRow(Term.IriKind.toByte, LogImplies, null, null), true)
        else if (n3 && peekSymbolEq())
          { eatSym("=")
            (TermRow(Term.IriKind.toByte, OwlSameAs, null, null), false) }
        else (subst(parsePredicate()), false)
      var moreObjs = true
      while (moreObjs) {
        val o = parseTerm()
        if (reversed) out += QuadRow(graph, o, p, s)
        else out += QuadRow(graph, s, p, o)
        ws()
        // Turtle-star annotation {| q v ; ... |}: asserts the triple AND
        // annotates the quoted form of it
        if (!reversed && pos + 1 < input.length && input(pos) == '{' &&
            input(pos + 1) == '|') {
          pos += 2
          predicateObjectList(quotedTerm(s, p, o))
          expect("|}")
        }
        moreObjs = eatSym(",")
      }
      moreProps = eatSym(";")
      // rule [7]: the ';' separator repeats with nothing between
      // (`:s :p 1 ; ; :q 2 .`), and may dangle before the terminator
      while (moreProps && eatSym(";")) ()
      ws()
      if (moreProps && (pos >= input.length || input(pos) == '.' ||
        input(pos) == ']' || input(pos) == '}')) moreProps = false
    }
  }

  private def quotedTerm(s: TermRow, p: TermRow, o: TermRow): TermRow = {
    def q(t: TermRow) = graft.model.QuotedTriple.QTerm(t.kind, t.lex, t.dt, t.lang)
    TermRow(Term.QuotedKind.toByte,
      graft.model.QuotedTriple.encode(q(s), q(p), q(o)), null, null)
  }

  /** A bare '=' verb (not '=>' which eatSym checks first). */
  private def peekSymbolEq(): Boolean = {
    ws()
    pos < input.length && input(pos) == '=' &&
      (pos + 1 >= input.length || input(pos + 1) != '>')
  }

  def parse(): Seq[QuadRow] = {
    while ({ ws(); pos < input.length }) {
      // '@prefix'/'@base' are case-SENSITIVE terminals and END with
      // '.'; the SPARQL-style forms are case-insensitive and take NO
      // dot (rules [4]-[6s]). The '@' forms can't collide with a
      // prefixed name, so ':' right after the keyword is fine
      // (`@prefix: <u> .` declares the empty prefix).
      def atDirective(kw: String): Boolean =
        input.startsWith(kw, pos) && {
          val j = pos + kw.length
          j >= input.length || { val c = input(j)
            !c.isLetterOrDigit && c != '_' && c != '-' }
        }
      if (atDirective("@prefix") || peekKeyword("PREFIX")) {
        val atForm = atDirective("@prefix")
        pos += (if (atForm) 7 else 6)
        ws()
        val start = pos
        while (pos < input.length && input(pos) != ':') pos += 1
        val name = input.substring(start, pos).trim
        pos += 1
        prefixes(name) = parseIriRef()
        if (atForm) expect(".")
      } else if (atDirective("@base") || peekKeyword("BASE")) {
        val atForm = atDirective("@base")
        pos += (if (atForm) 5 else 4)
        base = parseIriRef()
        if (atForm) expect(".")
      } else if (n3 && (peekKeyword("@forAll") || peekKeyword("@forSome"))) {
        // quantifier declaration: map each symbol to a variable bnode
        if (!eatSym("@forAll")) expect("@forSome")
        var more = true
        while (more) {
          val t = parseTerm()
          if (t.kind == Term.IriKind.toByte) quantified(t.lex) = quantVar(t.lex)
          more = eatSym(",")
        }
        eatSym(".")
      } else if (!n3 && eatSym("{")) { // TriG: anonymous default-graph block
        parseBlock(DG)
      } else if (peekKeyword("GRAPH") &&
        pos + 5 < input.length && !input(pos + 5).isLetterOrDigit &&
        input(pos + 5) != ':' && input(pos + 5) != '_') {
        pos += 5
        val g = parseTerm()
        expect("{")
        parseBlock(g)
      } else {
        val wasBnodeList = !n3 && pos < input.length && input(pos) == '['
        val s = parseTerm()
        ws()
        // Turtle subjects are IRIs, bnodes, collections, or (star)
        // quoted triples — never literals (N3 is more permissive)
        if (!n3 && s.kind == Term.LiteralKind.toByte)
          fail("literal subject")
        if (!n3 && pos < input.length && input(pos) == '{') { // TriG: <g> { }
          pos += 1
          parseBlock(s)
        } else {
          if (pos < input.length && input(pos) != '.') predicateObjectList(s)
          // only a '[ props ]' subject may omit its predicate list
          // (rule [6]: triples ::= subject predicateObjectList | ...)
          else if (!wasBnodeList) fail("statement with no predicate")
          expect(".")
        }
      }
      ws()
    }
    out.toSeq
  }

  /** TriG graph block body: triples emitted into graph `g`. */
  private def parseBlock(g: TermRow): Unit = {
    val saved = graph
    graph = g
    ws()
    while (pos < input.length && input(pos) != '}') {
      val wasBnodeList = input(pos) == '['
      val s = parseTerm()
      ws()
      if (s.kind == Term.LiteralKind.toByte) fail("literal subject")
      if (pos < input.length && input(pos) != '.' && input(pos) != '}')
        predicateObjectList(s)
      else if (!wasBnodeList) fail("statement with no predicate")
      eatSym(".")
      ws()
    }
    expect("}")
    // TriG wrappedGraph takes NO trailing '.' (rule [5g]) — a dot after
    // '}' is the next statement's problem, i.e. a syntax error
    graph = saved
  }
}
