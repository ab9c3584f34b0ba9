package graft.model

/** Canonical encoding of RDF-star quoted triples (oxrdf:
  * lib/oxrdf/src/triple.rs · Triple Display; SPARQL 1.2 embedded
  * triples).
  *
  * A quoted triple is stored as one Term struct with kind=QuotedKind and
  * `lex` = the canonical N-Triples-star rendering "<< s p o >>": single
  * spaces between tokens, literals with the canonical escape set
  * (\\ \" \n \r), nested quoted triples recursively in the same form.
  * Canonicality makes term equality = string equality (sameTerm, joins,
  * DISTINCT all stay struct comparisons), and the fixed shape makes
  * component extraction a deterministic single-pass parse — the
  * QuotedParts native expression calls [[decode]] per row.
  */
object QuotedTriple {

  /** One decoded component in Term-struct field order. */
  final case class QTerm(kind: Byte, lex: String, dt: String, lang: String)

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** N-Triples token of one component (quoted lex is already canonical). */
  def renderTerm(kind: Byte, lex: String, dt: String, lang: String): String =
    kind.toInt match {
      case Term.IriKind => "<" + lex + ">"
      case Term.BlankKind => "_:" + lex
      case Term.QuotedKind => lex
      case _ =>
        val base = "\"" + escape(lex) + "\""
        if (lang != null) base + "@" + lang
        else if (dt != null && dt != Term.XsdString) base + "^^<" + dt + ">"
        else base
    }

  def encode(s: QTerm, p: QTerm, o: QTerm): String =
    "<< " + renderTerm(s.kind, s.lex, s.dt, s.lang) + " " +
      renderTerm(p.kind, p.lex, p.dt, p.lang) + " " +
      renderTerm(o.kind, o.lex, o.dt, o.lang) + " >>"

  /** Re-render a canonical CG-star lex `<< s p o >>` as the RDF 1.2
    * triple-term spelling `<<( s p o )>>`, recursing into nested quoted
    * components (sparql12-query §4.2.3 / rdf12-concepts triple terms —
    * both spellings denote the SAME term in this engine, so this is a
    * serialization-edition concern only). Returns null on malformed
    * input (unreachable for engine-produced lexicals).
    */
  def tripleTermLex(canonical: String): String = {
    val parts = decode(canonical)
    if (parts == null) return null
    // The 1.2 grammars restrict a triple term's SUBJECT to IRI/bnode —
    // a nested quoted triple there has no <<( … )>> spelling at ANY
    // depth, so error loudly like the writers' top-level subject check
    // (rdf12 N-Triples ttSubject; silently emitting would produce
    // non-conformant 1.2-edition output).
    if (parts(0).kind.toInt == Term.QuotedKind)
      throw new IllegalArgumentException(
        "RDF 1.2 edition: a quoted triple in the SUBJECT slot of a " +
          "triple term has no spelling (IRI/bnode only): " + canonical)
    def tok(t: QTerm): String =
      if (t.kind.toInt == Term.QuotedKind) tripleTermLex(t.lex)
      else renderTerm(t.kind, t.lex, t.dt, t.lang)
    "<<( " + tok(parts(0)) + " " + tok(parts(1)) + " " +
      tok(parts(2)) + " )>>"
  }

  /** Parse the canonical form back into its three components; returns
    * null on any shape violation (malformed input => SPARQL error).
    */
  def decode(canonical: String): Array[QTerm] = {
    val p = new Parser(canonical)
    try {
      val r = p.quoted()
      p.ws()
      if (p.pos != canonical.length) null else r
    } catch { case _: Exception => null }
  }

  private final class Parser(s: String) {
    var pos = 0
    def ws(): Unit = while (pos < s.length && s.charAt(pos) == ' ') pos += 1
    private def fail(): Nothing = throw new IllegalArgumentException(s)
    private def expect(tok: String): Unit = {
      if (!s.startsWith(tok, pos)) fail()
      pos += tok.length
    }

    def quoted(): Array[QTerm] = {
      ws(); expect("<<")
      val a = term(); val b = term(); val c = term()
      ws(); expect(">>")
      Array(a, b, c)
    }

    private def unescape(t: String): String = {
      if (t.indexOf('\\') < 0) return t
      val sb = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        if (t.charAt(i) == '\\' && i + 1 < t.length) {
          i += 1
          t.charAt(i) match {
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t'); case '"' => sb.append('"')
            case '\\' => sb.append('\\'); case c => sb.append(c)
          }
        } else sb.append(t.charAt(i))
        i += 1
      }
      sb.toString
    }

    def term(): QTerm = {
      ws()
      if (pos >= s.length) fail()
      if (s.startsWith("<<", pos)) {
        val start = pos
        val parts = quoted() // validates; lex is the canonical substring
        val _ = parts
        QTerm(Term.QuotedKind.toByte, s.substring(start, pos), null, null)
      } else s.charAt(pos) match {
        case '<' =>
          val end = s.indexOf('>', pos)
          if (end < 0) fail()
          val iri = s.substring(pos + 1, end); pos = end + 1
          QTerm(Term.IriKind.toByte, iri, null, null)
        case '_' =>
          expect("_:")
          val start = pos
          while (pos < s.length && s.charAt(pos) != ' ') pos += 1
          QTerm(Term.BlankKind.toByte, s.substring(start, pos), null, null)
        case '"' =>
          pos += 1
          val start = pos
          while (pos < s.length && s.charAt(pos) != '"') {
            if (s.charAt(pos) == '\\') pos += 1
            pos += 1
          }
          if (pos >= s.length) fail()
          val lex = unescape(s.substring(start, pos)); pos += 1
          if (s.startsWith("^^<", pos)) {
            pos += 3
            val end = s.indexOf('>', pos)
            if (end < 0) fail()
            val dt = s.substring(pos, end); pos = end + 1
            QTerm(Term.LiteralKind.toByte, lex, dt, null)
          } else if (pos < s.length && s.charAt(pos) == '@') {
            pos += 1
            val start2 = pos
            while (pos < s.length && s.charAt(pos) != ' ') pos += 1
            val tag = s.substring(start2, pos)
            // a `--dir` suffix means rdf:dirLangString (RDF 1.2)
            QTerm(Term.LiteralKind.toByte, lex,
              if (tag.contains("--")) Term.RdfDirLangString
              else Term.RdfLangString, tag)
          } else QTerm(Term.LiteralKind.toByte, lex, Term.XsdString, null)
        case _ => fail()
      }
    }
  }
}
