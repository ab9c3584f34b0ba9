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
  */
final class TurtleParser(input: String) {
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
  private def peekKeyword(s: String): Boolean = {
    ws(); input.regionMatches(true, pos, s, 0, s.length)
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
    val iri = input.substring(start, pos)
    expect(">")
    if (iri.contains(":")) iri else base + iri
  }

  private def parsePrefixedName(): String = {
    val start = pos
    while (pos < input.length &&
      (input(pos).isLetterOrDigit || input(pos) == '_' || input(pos) == '-'))
      pos += 1
    val pfx = input.substring(start, pos)
    if (pos >= input.length || input(pos) != ':') fail(s"bad prefixed name")
    pos += 1
    val ns = prefixes.getOrElse(pfx, fail(s"undefined prefix '$pfx:'"))
    val ls = pos
    while (pos < input.length && (input(pos).isLetterOrDigit ||
      input(pos) == '_' || input(pos) == '-' || input(pos) == '.')) pos += 1
    var end = pos
    while (end > ls && input(end - 1) == '.') end -= 1
    pos = end
    ns + input.substring(ls, end)
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
        sb += (input(pos) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case '"' => '"'; case '\'' => '\''; case '\\' => '\\'
          case c => c
        })
      } else sb += input(pos)
      pos += 1
    }
    expect(quote)
    sb.toString
  }

  private def freshBnode(): TermRow = {
    bnodeN += 1
    TermRow(Term.BlankKind.toByte, s"tb$bnodeN", null, null)
  }

  private def parseTerm(): TermRow = {
    ws()
    if (pos >= input.length) fail("unexpected end")
    input(pos) match {
      case '<' => TermRow(Term.IriKind.toByte, parseIriRef(), null, null)
      case '_' =>
        pos += 2 // _:
        val start = pos
        while (pos < input.length && (input(pos).isLetterOrDigit ||
          input(pos) == '_')) pos += 1
        TermRow(Term.BlankKind.toByte, input.substring(start, pos), null, null)
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
          TermRow(Term.LiteralKind.toByte, lex, Term.RdfLangString,
            input.substring(s2, pos))
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
        TermRow(Term.LiteralKind.toByte, lex,
          if (isDbl) Term.XsdDouble
          else if (isDec) Term.XsdDecimal else Term.XsdInteger, null)
      case 't' if peekKeyword("true") =>
        pos += 4; TermRow(Term.LiteralKind.toByte, "true", Term.XsdBoolean, null)
      case 'f' if peekKeyword("false") =>
        pos += 5; TermRow(Term.LiteralKind.toByte, "false", Term.XsdBoolean, null)
      case _ => TermRow(Term.IriKind.toByte, parsePrefixedName(), null, null)
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
      val p = parsePredicate()
      var moreObjs = true
      while (moreObjs) {
        val o = parseTerm()
        out += QuadRow(graph, s, p, o)
        moreObjs = eatSym(",")
      }
      moreProps = eatSym(";")
      ws()
      if (moreProps && (pos >= input.length || input(pos) == '.' ||
        input(pos) == ']')) moreProps = false
    }
  }

  def parse(): Seq[QuadRow] = {
    ws()
    while (pos < input.length) {
      if (peekKeyword("@prefix") || peekKeyword("PREFIX")) {
        if (!eatSym("@prefix")) { expect("PREFIX") }
        ws()
        val start = pos
        while (pos < input.length && input(pos) != ':') pos += 1
        val name = input.substring(start, pos).trim
        pos += 1
        prefixes(name) = parseIriRef()
        eatSym(".")
      } else if (peekKeyword("@base") || peekKeyword("BASE")) {
        if (!eatSym("@base")) { expect("BASE") }
        base = parseIriRef()
        eatSym(".")
      } else if (eatSym("{")) { // TriG: anonymous default-graph block
        parseBlock(DG)
      } else if (peekKeyword("GRAPH") &&
        pos + 5 < input.length && !input(pos + 5).isLetterOrDigit &&
        input(pos + 5) != ':' && input(pos + 5) != '_') {
        pos += 5
        val g = parseTerm()
        expect("{")
        parseBlock(g)
      } else {
        val s = parseTerm()
        ws()
        if (pos < input.length && input(pos) == '{') { // TriG: <g> { ... }
          pos += 1
          parseBlock(s)
        } else {
          if (pos < input.length && input(pos) != '.') predicateObjectList(s)
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
      val s = parseTerm()
      ws()
      if (pos < input.length && input(pos) != '.' && input(pos) != '}')
        predicateObjectList(s)
      eatSym(".")
      ws()
    }
    expect("}")
    eatSym(".")
    graph = saved
  }
}
