package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{JsonLdParser, RdfIO}
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** Hand-ported JSON-LD 1.1 API toRdf cases (round 12, verdict #7): the
  * expected side is written as N-Quads FROM THE SPEC's algorithms, not
  * from this parser — mismatches are investigation targets, exactly
  * like the hand-ported SPARQL manifest fixtures. Comparison is RDF
  * dataset isomorphism (bnode bijection over s/o/g positions).
  *
  * Modeled on the W3C json-ld-api test suite shapes (expand/toRdf);
  * the real corpus remains environment-blocked (NEXT.md standing
  * request) — these pin the most load-bearing algorithm steps.
  */
class JsonLdSuiteSpec extends AnyFunSuite {

  private def nq(lines: String): Seq[QuadRow] =
    lines.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(l => RdfIO.parseLine(l, allowGraph = true).get).toSeq

  private def label(t: TermRow): Option[String] =
    if (t.kind == Term.BlankKind.toByte) Some(t.lex) else None

  /** Dataset isomorphism via backtracking bnode bijection (small
    * graphs; ground anchors individualize almost every node).
    */
  private def isomorphic(got: Seq[QuadRow], exp: Seq[QuadRow]): Boolean = {
    if (got.size != exp.size) return false
    val gl = got.flatMap(q => Seq(q.s, q.o, q.g).flatMap(label)).distinct
    val el = exp.flatMap(q => Seq(q.s, q.o, q.g).flatMap(label)).distinct
    if (gl.size != el.size) return false
    val expSet = exp.toSet
    def mapT(t: TermRow, m: Map[String, String]): TermRow =
      if (t.kind == Term.BlankKind.toByte)
        t.copy(lex = m.getOrElse(t.lex, t.lex))
      else t
    def mapQ(q: QuadRow, m: Map[String, String]): QuadRow =
      QuadRow(mapT(q.g, m), mapT(q.s, m), mapT(q.p, m), mapT(q.o, m))
    def search(rem: List[String], avail: Set[String],
        m: Map[String, String]): Boolean = rem match {
      case Nil => got.map(mapQ(_, m)).toSet == expSet
      case h :: t => avail.exists { e =>
        val m2 = m + (h -> e)
        val ok = got.forall { q =>
          val bs = Seq(q.s, q.o, q.g).flatMap(label)
          bs.isEmpty || !bs.forall(m2.contains) ||
            expSet.contains(mapQ(q, m2))
        }
        ok && search(t, avail - e, m2)
      }
    }
    search(gl.toList, el.toSet, Map.empty)
  }

  private def check(name: String, jsonld: String, expected: String,
      rdfDirection: Option[String] = None): Unit = test(s"toRdf: $name") {
    val got = new JsonLdParser(jsonld, rdfDirection).parse()
    val exp = nq(expected)
    assert(isomorphic(got, exp),
      s"$name:\n  got: ${got.mkString("\n       ")}\n" +
        s"  exp: ${exp.mkString("\n       ")}")
  }

  private val X = "http://x/"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  check("plain string value",
    s"""{"@id": "${X}s", "${X}p": "v"}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("explicit typed value object",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "5", "@type": "${Xsd}integer"}}""",
    s"""<${X}s> <${X}p> "5"^^<${Xsd}integer> .""")

  check("native integer canonicalizes",
    s"""{"@id": "${X}s", "${X}p": 5}""",
    s"""<${X}s> <${X}p> "5"^^<${Xsd}integer> .""")

  check("native double canonicalizes to XSD canonical form",
    s"""{"@id": "${X}s", "${X}p": 5.5}""",
    s"""<${X}s> <${X}p> "5.5E0"^^<${Xsd}double> .""")

  check("native boolean",
    s"""{"@id": "${X}s", "${X}p": true}""",
    s"""<${X}s> <${X}p> "true"^^<${Xsd}boolean> .""")

  check("language-tagged value object",
    s"""{"@id": "${X}s", "${X}p": {"@value": "chat", "@language": "fr"}}""",
    s"""<${X}s> <${X}p> "chat"@fr .""")

  check("context default @language applies to plain strings",
    s"""{"@context": {"@language": "en"},
      "@id": "${X}s", "${X}p": "v", "${X}q": 5}""",
    s"""<${X}s> <${X}p> "v"@en .
      <${X}s> <${X}q> "5"^^<${Xsd}integer> .""")

  check("term @language: null clears the default",
    s"""{"@context": {"@language": "en",
      "p": {"@id": "${X}p", "@language": null}},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("@type: @id coercion makes the string an IRI",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "@id"}},
      "@id": "${X}s", "p": "${X}o"}""",
    s"""<${X}s> <${X}p> <${X}o> .""")

  check("@vocab expands terms and string @type values",
    s"""{"@context": {"@vocab": "$X"},
      "@id": "${X}s", "@type": "T", "p": "v"}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .
      <${X}s> <${X}p> "v" .""")

  check("compact IRI in property and @type position",
    s"""{"@context": {"ex": "$X"},
      "@id": "ex:s", "ex:p": {"@value": "1", "@type": "ex:dt"}}""",
    s"""<${X}s> <${X}p> "1"^^<${X}dt> .""")

  check("keyword aliases",
    s"""{"@context": {"id": "@id", "type": "@type", "value": "@value"},
      "id": "${X}s", "type": "${X}T",
      "${X}p": {"value": "v"}}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .
      <${X}s> <${X}p> "v" .""")

  check("multiple @type values",
    s"""{"@id": "${X}s", "@type": ["${X}A", "${X}B"]}""",
    s"""<${X}s> <${Rdf}type> <${X}A> .
      <${X}s> <${Rdf}type> <${X}B> .""")

  check("@list becomes an rdf:first/rest chain",
    s"""{"@id": "${X}s", "${X}p": {"@list": ["a", "b"]}}""",
    s"""<${X}s> <${X}p> _:l0 .
      _:l0 <${Rdf}first> "a" .
      _:l0 <${Rdf}rest> _:l1 .
      _:l1 <${Rdf}first> "b" .
      _:l1 <${Rdf}rest> <${Rdf}nil> .""")

  check("empty @list is rdf:nil directly",
    s"""{"@id": "${X}s", "${X}p": {"@list": []}}""",
    s"""<${X}s> <${X}p> <${Rdf}nil> .""")

  check("nested @list",
    s"""{"@id": "${X}s", "${X}p": {"@list": [{"@list": ["a"]}]}}""",
    s"""<${X}s> <${X}p> _:o0 .
      _:o0 <${Rdf}first> _:i0 .
      _:o0 <${Rdf}rest> <${Rdf}nil> .
      _:i0 <${Rdf}first> "a" .
      _:i0 <${Rdf}rest> <${Rdf}nil> .""")

  check("@set unwraps",
    s"""{"@id": "${X}s", "${X}p": {"@set": ["a", "b"]}}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .""")

  check("@reverse node map",
    s"""{"@id": "${X}s",
      "@reverse": {"${X}p": {"@id": "${X}o"}}}""",
    s"""<${X}o> <${X}p> <${X}s> .""")

  check("reverse term definition",
    s"""{"@context": {"children": {"@reverse": "${X}parent"}},
      "@id": "${X}s", "children": [{"@id": "${X}c"}]}""",
    s"""<${X}c> <${X}parent> <${X}s> .""")

  check("labeled and fresh blank nodes",
    s"""{"@id": "_:b0", "${X}p": {"${X}q": "v"}}""",
    s"""_:a <${X}p> _:b .
      _:b <${X}q> "v" .""")

  check("named graph via @id + @graph",
    s"""{"@id": "${X}g", "@graph": [
      {"@id": "${X}s", "${X}p": "v"}]}""",
    s"""<${X}s> <${X}p> "v" <${X}g> .""")

  check("@graph document wrapper stays in the default graph",
    s"""{"@context": {"ex": "$X"},
      "@graph": [{"@id": "ex:s", "ex:p": "v"}]}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("language map container",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@language"}},
      "@id": "${X}s", "p": {"en": "cat", "fr": "chat"}}""",
    s"""<${X}s> <${X}p> "cat"@en .
      <${X}s> <${X}p> "chat"@fr .""")

  check("@index container: indexes drop from the output",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "p": {"i1": "a", "i2": "b"}}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .""")

  check("@id map container",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@id"}},
      "@id": "${X}s", "p": {"${X}o1": {"${X}q": "a"}}}""",
    s"""<${X}s> <${X}p> <${X}o1> .
      <${X}o1> <${X}q> "a" .""")

  check("@json literal canonicalizes with sorted keys",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "@json"}},
      "@id": "${X}s", "p": {"b": 1, "a": true}}""",
    "<" + X + "s> <" + X + "p> " +
      "\"{\\\"a\\\":true,\\\"b\\\":1}\"^^<" + Rdf + "JSON> .")

  check("@nest is transparent",
    s"""{"@context": {"meta": "@nest"},
      "@id": "${X}s", "meta": {"${X}p": "v"}}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("relative IRIs resolve against @base",
    s"""{"@context": {"@base": "http://base/dir/"},
      "@id": "s", "${X}p": {"@id": "../up"}}""",
    s"""<http://base/dir/s> <${X}p> <http://base/up> .""")

  check("@vocab relative to @base when itself relative",
    s"""{"@context": {"@base": "http://base/", "@vocab": "v#"},
      "@id": "http://x/s", "p": "o"}""",
    s"""<http://x/s> <http://base/v#p> "o" .""")

  check("value @direction drops by default (no dirLang in plain mode)",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "v", "@language": "ar", "@direction": "rtl"}}""",
    s"""<${X}s> <${X}p> "v"@ar .""")

  check("value @direction with i18n-datatype mode",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "v", "@language": "ar", "@direction": "rtl"}}""",
    s"""<${X}s> <${X}p> "v"^^<https://www.w3.org/ns/i18n#ar_rtl> .""",
    rdfDirection = Some("i18n-datatype"))

  check("@included nodes land beside the including node",
    s"""{"@id": "${X}s", "${X}p": "v",
      "@included": [{"@id": "${X}t", "${X}q": "w"}]}""",
    s"""<${X}s> <${X}p> "v" .
      <${X}t> <${X}q> "w" .""")

  check("term definition with @id: null blocks expansion",
    s"""{"@context": {"skip": null},
      "@id": "${X}s", "skip": "dropped", "${X}p": "kept"}""",
    s"""<${X}s> <${X}p> "kept" .""")

  check("node reference object (no properties) emits only the edge",
    s"""{"@id": "${X}s", "${X}p": {"@id": "${X}o"}}""",
    s"""<${X}s> <${X}p> <${X}o> .""")

  check("scoped context on a type applies inside the node",
    s"""{"@context": {"T": {"@id": "${X}T",
        "@context": {"p": "${X}scoped"}}},
      "@id": "${X}s", "@type": "T", "p": "v"}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .
      <${X}s> <${X}scoped> "v" .""")

  check("property-scoped context",
    s"""{"@context": {"p": {"@id": "${X}p",
        "@context": {"q": "${X}inner"}}},
      "@id": "${X}s", "p": {"@id": "${X}o", "q": "v"}}""",
    s"""<${X}s> <${X}p> <${X}o> .
      <${X}o> <${X}inner> "v" .""")
}
