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
        if (c == '\\' && i + 5 <= s.length && s.charAt(i + 1) == 'u') {
          sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
          i += 6
        } else if (c == '\\' && i + 9 <= s.length && s.charAt(i + 1) == 'U') {
          sb.appendAll(Character.toChars(
            Integer.parseInt(s.substring(i + 2, i + 10), 16)))
          i += 10
        } else { sb += c; i += 1 }
      }
      sb.toString
    }
}
