package graft.model

/** UCHAR numeric escapes (\uXXXX / \UXXXXXXXX) shared by the SPARQL and
  * Turtle-family grammars (SPARQL 1.1 §19.2, N-Triples/Turtle UCHAR):
  * legal in IRIREF and in string literals alongside the ECHAR set.
  */
object RdfEscapes {

  /** Resolve UCHAR escapes in an IRIREF body (the only escapes IRIREF
    * allows). Fast path: no backslash, no allocation.
    */
  def unescapeIri(s: String): String =
    if (s.indexOf('\\') < 0) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 6 <= s.length && s.charAt(i + 1) == 'u') {
          sb += hex(s, i + 2, i + 6).toChar
          i += 6
        } else if (c == '\\' && i + 10 <= s.length && s.charAt(i + 1) == 'U') {
          sb.appendAll(Character.toChars(hex(s, i + 2, i + 10)))
          i += 10
        } else if (c == '\\' && i + 1 < s.length &&
                   (s.charAt(i + 1) == 'u' || s.charAt(i + 1) == 'U')) {
          throw new IllegalArgumentException(
            s"truncated \\${s.charAt(i + 1)} escape in IRI: $s")
        } else { sb += c; i += 1 }
      }
      sb.toString
    }

  private def hex(s: String, from: Int, until: Int): Int =
    try Integer.parseInt(s.substring(from, until), 16)
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"invalid hex digits in IRI escape: ${s.substring(from - 2, until)}")
    }
}
