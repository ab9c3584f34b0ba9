package graft.model

/** RFC 3986 §5 reference resolution, shared by every parser that takes
  * a BASE (SPARQL, Turtle/TriG, RDF/XML, JSON-LD). String-based — no
  * java.net.URI, whose parser rejects the IRI code points RDF allows.
  *
  * Implements the §5.2.2 transform including merge() and
  * remove_dot_segments, so `<a>`, `<../x>`, `<#f>`, `<?q>`, `</abs>`
  * and `<//host/p>` all resolve correctly against bases with or
  * without trailing slashes — the corner the previous per-parser
  * "append to the last slash" approximations got wrong.
  */
object IriResolve {

  /** RFC 3986 appendix B splitter (groups: scheme, authority incl.
    * leading //, path, query incl. ?, fragment incl. #).
    */
  private val Rfc =
    "^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(//[^/?#]*)?([^?#]*)(\\?[^#]*)?(#.*)?$".r

  /** Does the reference carry a scheme (making it absolute)? */
  def hasScheme(ref: String): Boolean = {
    val c = ref.indexOf(':')
    c > 0 && ref.substring(0, c).forall(ch =>
      ch.isLetterOrDigit || ch == '+' || ch == '-' || ch == '.') &&
      ref.head.isLetter
  }

  /** remove_dot_segments (§5.2.4). */
  private[model] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', if (in.startsWith("/")) 1 else 0)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }

  /** Resolve `ref` against `base` (§5.2.2). An empty or absent base
    * returns the reference unchanged (a bare relative IRI stays
    * relative, matching the parsers' no-BASE behavior).
    */
  def resolve(base: String, ref: String): String = {
    if (base == null || base.isEmpty || hasScheme(ref)) return ref
    val Rfc(bScheme, bAuth, bPath, bQuery, _) = base
    val Rfc(_, rAuth, rPath, rQuery, rFrag) = ref
    def s(x: String) = Option(x).getOrElse("")
    val (auth, path, query) =
      if (rAuth != null) (rAuth, removeDotSegments(s(rPath)), s(rQuery))
      else if (s(rPath).isEmpty)
        (s(bAuth), s(bPath), if (rQuery != null) rQuery else s(bQuery))
      else if (rPath.startsWith("/"))
        (s(bAuth), removeDotSegments(rPath), s(rQuery))
      else {
        // merge (§5.2.3): base with authority and empty path -> "/ref",
        // else replace everything after the base path's last '/'
        val merged =
          if (bAuth != null && s(bPath).isEmpty) "/" + rPath
          else {
            val cut = s(bPath).lastIndexOf('/')
            if (cut < 0) rPath else bPath.substring(0, cut + 1) + rPath
          }
        (s(bAuth), removeDotSegments(merged), s(rQuery))
      }
    val scheme = if (bScheme != null) bScheme + ":" else ""
    scheme + auth + path + query + s(rFrag)
  }
}
