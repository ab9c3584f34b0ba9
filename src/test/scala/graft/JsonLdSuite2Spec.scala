package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{JsonLdParser, RdfIO}
import graft.io.RdfIO.{QuadRow, TermRow}
import graft.model.Term

/** Hand-ported JSON-LD 1.1 toRdf cases, wave 2 (round 12, NEXT lead 2):
  * the expected side is written from the spec's algorithms (expansion +
  * Deserialize-JSON-LD-to-RDF), weighted toward the areas wave 1 found
  * bugs in — container maps with scoped contexts, @graph containers,
  * native-number edges (1e2 / 1e21 / big integers / -0.0), JSON-LD 1.1
  * prefix rules, forward term references, value-object validity.
  * Comparison is RDF dataset isomorphism, same harness as wave 1.
  */
class JsonLdSuite2Spec extends AnyFunSuite {

  private def nq(lines: String): Seq[QuadRow] =
    lines.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(l => RdfIO.parseLine(l, allowGraph = true).get).toSeq

  private def label(t: TermRow): Option[String] =
    if (t.kind == Term.BlankKind.toByte) Some(t.lex) else None

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
      rdfDirection: Option[String] = None): Unit = test(s"toRdf2: $name") {
    val got = new JsonLdParser(jsonld, rdfDirection).parse()
    val exp = nq(expected)
    assert(isomorphic(got, exp),
      s"$name:\n  got: ${got.mkString("\n       ")}\n" +
        s"  exp: ${exp.mkString("\n       ")}")
  }

  private def checkErr(name: String, jsonld: String,
      fragment: String): Unit = test(s"toRdf2 err: $name") {
    val e = intercept[IllegalArgumentException] {
      new JsonLdParser(jsonld).parse()
    }
    assert(e.getMessage.contains(fragment),
      s"wanted '$fragment' in: ${e.getMessage}")
  }

  private val X = "http://x/"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  // ---- forward references inside one context object (Create Term
  // Definition resolves dependencies on demand, order-independent) ----

  check("forward reference: term uses a prefix defined later",
    s"""{"@context": {"p": "ex:p", "ex": "$X"},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("forward reference: @vocab-free chained terms",
    s"""{"@context": {"a": "b:x", "b": "ex:", "ex": "$X"},
      "@id": "${X}s", "a": "v"}""",
    s"""<${X}s> <${X}x> "v" .""")

  check("forward reference in expanded @id",
    s"""{"@context": {"p": {"@id": "ex:p", "@type": "@id"},
        "ex": "$X"},
      "@id": "${X}s", "p": "${X}o"}""",
    s"""<${X}s> <${X}p> <${X}o> .""")

  check("forward reference in coercion datatype",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "ex:dt"},
        "ex": "$X"},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}p> "v"^^<${X}dt> .""")

  // ---- JSON-LD 1.1 prefix rules ----

  check("expanded term definition is NOT a prefix without @prefix",
    s"""{"@context": {"p": {"@id": "${X}name"}},
      "@id": "${X}s", "p:q": "as-is", "${X}kept": "v"}""",
    // "p:q" keeps its colon and therefore stands as its own IRI
    // (scheme "p") — the jsonld.js answer, per IRI expansion
    s"""<${X}s> <p:q> "as-is" .
      <${X}s> <${X}kept> "v" .""")

  check("expanded term definition with @prefix: true IS a prefix",
    s"""{"@context": {"p": {"@id": "${X}name#", "@prefix": true}},
      "@id": "${X}s", "p:q": "v"}""",
    s"""<${X}s> <${X}name#q> "v" .""")

  check("simple term ending in gen-delim is a prefix",
    s"""{"@context": {"p": "${X}sub/"},
      "@id": "${X}s", "p:q": "v"}""",
    s"""<${X}s> <${X}sub/q> "v" .""")

  check("simple term NOT ending in gen-delim is not a prefix",
    s"""{"@context": {"p": "${X}name"},
      "@id": "${X}s", "p:q": "as-is", "p": "v"}""",
    s"""<${X}s> <p:q> "as-is" .
      <${X}s> <${X}name> "v" .""")

  // ---- native number edges ----

  check("1e2 is an integer by value",
    s"""{"@id": "${X}s", "${X}p": 1e2}""",
    s"""<${X}s> <${X}p> "100"^^<${Xsd}integer> .""")

  check("1e21 graduates to xsd:double",
    s"""{"@id": "${X}s", "${X}p": 1e21}""",
    s"""<${X}s> <${X}p> "1.0E21"^^<${Xsd}double> .""")

  check("integer literal above Long range stays exact below 1e21",
    s"""{"@id": "${X}s", "${X}p": 10000000000000000000}""",
    s"""<${X}s> <${X}p> "10000000000000000000"^^<${Xsd}integer> .""")

  check("integer literal at 1e21 becomes a double",
    s"""{"@id": "${X}s", "${X}p": 1000000000000000000000}""",
    s"""<${X}s> <${X}p> "1.0E21"^^<${Xsd}double> .""")

  check("negative zero double is integer zero by value",
    s"""{"@id": "${X}s", "${X}p": -0.0}""",
    s"""<${X}s> <${X}p> "0"^^<${Xsd}integer> .""")

  check("coerced xsd:double forces double lexical on an integral",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "${Xsd}double"}},
      "@id": "${X}s", "p": 3}""",
    s"""<${X}s> <${X}p> "3.0E0"^^<${Xsd}double> .""")

  check("non-integral with non-double coercion keeps double lexical",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "${Xsd}decimal"}},
      "@id": "${X}s", "p": 5.5}""",
    s"""<${X}s> <${X}p> "5.5E0"^^<${Xsd}decimal> .""")

  // ---- value-object validity ----

  checkErr("@language on a non-string @value",
    s"""{"@id": "${X}s", "${X}p": {"@value": 5, "@language": "en"}}""",
    "language")

  check("@language: null inside a value object clears to plain string",
    s"""{"@context": {"@language": "en"},
      "@id": "${X}s", "${X}p": {"@value": "v", "@language": null}}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("value object ignores the context default language",
    s"""{"@context": {"@language": "en"},
      "@id": "${X}s", "${X}p": {"@value": "v"}}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("@value with @index is valid; index drops",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "v", "@language": "fr", "@index": "i"}}""",
    s"""<${X}s> <${X}p> "v"@fr .""")

  // ---- term-definition corners ----

  check("@type: @none in a term definition blocks coercion",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "@none"}},
      "@id": "${X}s", "p": 5}""",
    s"""<${X}s> <${X}p> "5"^^<${Xsd}integer> .""")

  check("@type: @vocab coercion expands with the vocab mapping",
    s"""{"@context": {"@vocab": "${X}v#",
        "p": {"@id": "${X}p", "@type": "@vocab"}},
      "@id": "${X}s", "p": "o"}""",
    s"""<${X}s> <${X}p> <${X}v#o> .""")

  // ---- containers ----

  check("@graph+@index container: each entry is its own graph",
    s"""{"@context": {"p": {"@id": "${X}p",
        "@container": ["@graph", "@index"]}},
      "@id": "${X}s", "p": {"i1": {"@id": "${X}a", "${X}q": "v"}}}""",
    s"""<${X}s> <${X}p> _:g .
      <${X}a> <${X}q> "v" _:g .""")

  check("@graph+@index container: two entries, two graphs",
    s"""{"@context": {"p": {"@id": "${X}p",
        "@container": ["@graph", "@index"]}},
      "@id": "${X}s", "p": {
        "i1": {"@id": "${X}a", "${X}q": "1"},
        "i2": {"@id": "${X}b", "${X}q": "2"}}}""",
    s"""<${X}s> <${X}p> _:g1 .
      <${X}s> <${X}p> _:g2 .
      <${X}a> <${X}q> "1" _:g1 .
      <${X}b> <${X}q> "2" _:g2 .""")

  check("language map @none key emits a plain string",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@language"}},
      "@id": "${X}s", "p": {"en": "cat", "@none": "thing"}}""",
    s"""<${X}s> <${X}p> "cat"@en .
      <${X}s> <${X}p> "thing" .""")

  check("language map aliased @none key",
    s"""{"@context": {"none": "@none",
        "p": {"@id": "${X}p", "@container": "@language"}},
      "@id": "${X}s", "p": {"none": "thing"}}""",
    s"""<${X}s> <${X}p> "thing" .""")

  check("property-based index map adds the key as a property value",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index",
        "@index": "${X}prop"}},
      "@id": "${X}s", "p": {"k1": {"@id": "${X}a", "${X}q": "v"},
        "k2": {"@id": "${X}b"}}}""",
    s"""<${X}s> <${X}p> <${X}a> .
      <${X}s> <${X}p> <${X}b> .
      <${X}a> <${X}q> "v" .
      <${X}a> <${X}prop> "k1" .
      <${X}b> <${X}prop> "k2" .""")

  check("property-based index map @none key adds no property",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index",
        "@index": "${X}prop"}},
      "@id": "${X}s", "p": {"@none": {"@id": "${X}a"}}}""",
    s"""<${X}s> <${X}p> <${X}a> .""")

  checkErr("@index in a term definition without an @index container",
    s"""{"@context": {"p": {"@id": "${X}p", "@index": "${X}prop"}},
      "@id": "${X}s", "p": "v"}""",
    "@index requires")

  check("index map @none key behaves like any index",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "p": {"@none": "a", "i": "b"}}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .""")

  check("nested arrays under a @list container are lists of lists",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@list"}},
      "@id": "${X}s", "p": [["a"], ["b"]]}""",
    s"""<${X}s> <${X}p> _:o0 .
      _:o0 <${Rdf}first> _:i0 .
      _:o0 <${Rdf}rest> _:o1 .
      _:i0 <${Rdf}first> "a" .
      _:i0 <${Rdf}rest> <${Rdf}nil> .
      _:o1 <${Rdf}first> _:i1 .
      _:o1 <${Rdf}rest> <${Rdf}nil> .
      _:i1 <${Rdf}first> "b" .
      _:i1 <${Rdf}rest> <${Rdf}nil> .""")

  check("empty inner list inside a @list container",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@list"}},
      "@id": "${X}s", "p": [[]]}""",
    s"""<${X}s> <${X}p> _:o0 .
      _:o0 <${Rdf}first> <${Rdf}nil> .
      _:o0 <${Rdf}rest> <${Rdf}nil> .""")

  check("id map with scoped context on the term",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@id",
        "@context": {"q": "${X}scoped"}}},
      "@id": "${X}s", "p": {"${X}o1": {"q": "v"}}}""",
    s"""<${X}s> <${X}p> <${X}o1> .
      <${X}o1> <${X}scoped> "v" .""")

  check("type map with scoped context on the term",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@type",
        "@context": {"q": "${X}scoped"}}},
      "@id": "${X}s", "p": {"${X}T": {"@id": "${X}o", "q": "v"}}}""",
    s"""<${X}s> <${X}p> <${X}o> .
      <${X}o> <${Rdf}type> <${X}T> .
      <${X}o> <${X}scoped> "v" .""")

  check("index map over node objects keeps entry identity",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "p": {"i": [{"@id": "${X}a"}, {"@id": "${X}b"}]}}""",
    s"""<${X}s> <${X}p> <${X}a> .
      <${X}s> <${X}p> <${X}b> .""")

  // ---- type-scoped context interactions ----

  check("two type-scoped contexts apply in lexicographic type order",
    s"""{"@context": {
        "B": {"@id": "${X}B", "@context": {"p": "${X}fromB"}},
        "A": {"@id": "${X}A", "@context": {"p": "${X}fromA"}}},
      "@id": "${X}s", "@type": ["B", "A"], "p": "v"}""",
    s"""<${X}s> <${Rdf}type> <${X}A> .
      <${X}s> <${Rdf}type> <${X}B> .
      <${X}s> <${X}fromB> "v" .""")

  check("type-scoped context with @propagate: true survives nesting",
    s"""{"@context": {"T": {"@id": "${X}T",
        "@context": {"@propagate": true, "q": "${X}deep"}}},
      "@id": "${X}s", "@type": "T",
      "${X}p": {"@id": "${X}o", "q": "v"}}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .
      <${X}s> <${X}p> <${X}o> .
      <${X}o> <${X}deep> "v" .""")

  check("property-scoped context continues into deeper nodes",
    s"""{"@context": {"p": {"@id": "${X}p",
        "@context": {"q": "${X}inner"}}},
      "@id": "${X}s", "p": {"@id": "${X}o1",
        "q": {"@id": "${X}o2", "q": "v"}}}""",
    s"""<${X}s> <${X}p> <${X}o1> .
      <${X}o1> <${X}inner> <${X}o2> .
      <${X}o2> <${X}inner> "v" .""")

  // ---- graph objects in property position ----

  check("@graph-only object in property position is a graph object",
    s"""{"@id": "${X}s", "${X}p":
      {"@graph": [{"@id": "${X}a", "${X}q": "v"}]}}""",
    s"""<${X}s> <${X}p> _:g .
      <${X}a> <${X}q> "v" _:g .""")

  check("nested @graph wrapper inside a named graph stays in it",
    s"""{"@id": "${X}g", "@graph": [
      {"@graph": [{"@id": "${X}s", "${X}p": "v"}]}]}""",
    s"""<${X}s> <${X}p> "v" <${X}g> .""")

  // ---- @reverse corners ----

  checkErr("@list value under @reverse is invalid",
    s"""{"@id": "${X}s",
      "@reverse": {"${X}p": {"@list": [{"@id": "${X}o"}]}}}""",
    "reverse")

  check("@reverse inside a named graph stays in that graph",
    s"""{"@id": "${X}g", "@graph": [{"@id": "${X}s",
      "@reverse": {"${X}p": {"@id": "${X}o"}}}]}""",
    s"""<${X}o> <${X}p> <${X}s> <${X}g> .""")

  // ---- misc expansion behaviors ----

  check("top-level free-floating value object emits nothing",
    s"""[{"@value": "free"}, {"@id": "${X}s", "${X}p": "v"}]""",
    s"""<${X}s> <${X}p> "v" .""")

  check("unmapped keys without @vocab drop silently",
    s"""{"@id": "${X}s", "name": "dropped", "${X}p": "kept"}""",
    s"""<${X}s> <${X}p> "kept" .""")

  check("keyword-lookalike term definition is ignored",
    s"""{"@context": {"@fancy": "${X}fancy"},
      "@id": "${X}s", "@fancy": "dropped", "${X}p": "kept"}""",
    s"""<${X}s> <${X}p> "kept" .""")

  check("null @value inside a plain array drops the entry",
    s"""{"@id": "${X}s", "${X}p": ["a", {"@value": null}, "b"]}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .""")

  check("explicit @set flattens under an @index container entry",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "p": {"i": {"@set": ["a", "b"]}}}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .""")

  check("bnode property subjects chain through @reverse terms",
    s"""{"@context": {"rev": {"@reverse": "${X}p"}},
      "${X}q": "anchor", "rev": {"${X}r": "v"}}""",
    s"""_:s <${X}q> "anchor" .
      _:o <${X}p> _:s .
      _:o <${X}r> "v" .""")

  check("compact IRI with empty local part",
    s"""{"@context": {"ex": "${X}sub#"},
      "@id": "ex:", "${X}p": "v"}""",
    s"""<${X}sub#> <${X}p> "v" .""")

  check("@id value that is a compact IRI with a term prefix",
    s"""{"@context": {"ex": "$X"},
      "@id": "ex:s", "${X}p": {"@id": "ex:o"}}""",
    s"""<${X}s> <${X}p> <${X}o> .""")

  check("direction from context default under i18n mode",
    s"""{"@context": {"@language": "ar", "@direction": "rtl"},
      "@id": "${X}s", "${X}p": "v"}""",
    s"""<${X}s> <${X}p> "v"^^<https://www.w3.org/ns/i18n#ar_rtl> .""",
    rdfDirection = Some("i18n-datatype"))

  check("language map inherits the default direction (i18n mode)",
    s"""{"@context": {"@direction": "rtl",
        "p": {"@id": "${X}p", "@container": "@language"}},
      "@id": "${X}s", "p": {"ar": "v"}}""",
    s"""<${X}s> <${X}p> "v"^^<https://www.w3.org/ns/i18n#ar_rtl> .""",
    rdfDirection = Some("i18n-datatype"))

  check("boolean with a coerced datatype",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "${Xsd}string"}},
      "@id": "${X}s", "p": true}""",
    s"""<${X}s> <${X}p> "true"^^<${Xsd}string> .""")

  checkErr("@reverse term with an @id container is invalid",
    s"""{"@context": {"rev": {"@reverse": "${X}p", "@container": "@id"}},
      "@id": "${X}s", "rev": {"${X}o": {}}}""",
    "@reverse with")

  check("@reverse term with an @index container works",
    s"""{"@context": {"rev": {"@reverse": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "rev": {"i": {"@id": "${X}o"}}}""",
    s"""<${X}o> <${X}p> <${X}s> .""")

  check("context array: later layers override earlier",
    s"""{"@context": [{"p": "${X}old"}, {"p": "${X}new"}],
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}new> "v" .""")

  check("null context mid-array resets prior terms",
    s"""{"@context": [{"p": "${X}old", "@language": "en"}, null,
        {"q": "${X}q"}],
      "@id": "${X}s", "q": "v"}""",
    s"""<${X}s> <${X}q> "v" .""")

  check("aliased @direction key in a value object",
    s"""{"@context": {"dir": "@direction", "val": "@value",
        "lang": "@language"},
      "@id": "${X}s", "${X}p":
        {"val": "v", "lang": "ar", "dir": "rtl"}}""",
    s"""<${X}s> <${X}p> "v"@ar .""")

  check("graph container with @set behaves like plain graph container",
    s"""{"@context": {"p": {"@id": "${X}p",
        "@container": ["@graph", "@set"]}},
      "@id": "${X}s", "p": [{"@id": "${X}a", "${X}q": "v"}]}""",
    s"""<${X}s> <${X}p> _:g .
      <${X}a> <${X}q> "v" _:g .""")

  check("explicit @graph object under a graph container nests once",
    s"""{"@id": "${X}s", "${X}p":
      {"@graph": [{"@id": "${X}a", "${X}q": "v"},
        {"@id": "${X}b", "${X}q": "w"}]}}""",
    s"""<${X}s> <${X}p> _:g .
      <${X}a> <${X}q> "v" _:g .
      <${X}b> <${X}q> "w" _:g .""")

  check("type coercion on an @id map entry's inner strings",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@id"},
        "q": {"@id": "${X}q", "@type": "@id"}},
      "@id": "${X}s", "p": {"${X}o1": {"q": "${X}t"}}}""",
    s"""<${X}s> <${X}p> <${X}o1> .
      <${X}o1> <${X}q> <${X}t> .""")

  check("deeply nested @nest chains flatten",
    s"""{"@context": {"n1": "@nest", "n2": "@nest"},
      "@id": "${X}s", "n1": {"n2": {"${X}p": "v"}}}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("explicit @json value object with null @value",
    s"""{"@id": "${X}s", "${X}p": {"@value": null, "@type": "@json"}}""",
    "<" + X + "s> <" + X + "p> \"null\"^^<" + Rdf + "JSON> .")

  check("@json term coercion captures a value-object-SHAPED map verbatim",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "@json"}},
      "@id": "${X}s", "p": {"@value": null, "@type": "@json"}}""",
    "<" + X + "s> <" + X + "p> " +
      "\"{\\\"@type\\\":\\\"@json\\\",\\\"@value\\\":null}\"" +
      "^^<" + Rdf + "JSON> .")

  check("numeric keys in a language map are just tags-by-name",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@language"}},
      "@id": "${X}s", "p": {"EN-US": "v"}}""",
    s"""<${X}s> <${X}p> "v"@en-us .""")

  check("id map whose entry carries its own @id wins over the key",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@id"}},
      "@id": "${X}s", "p": {"${X}key": {"@id": "${X}own", "${X}q": "v"}}}""",
    s"""<${X}s> <${X}p> <${X}own> .
      <${X}own> <${X}q> "v" .""")

  checkErr("@import fails loudly under zero egress",
    s"""{"@context": {"@import": "http://remote/ctx.jsonld"},
      "@id": "${X}s", "${X}p": "v"}""",
    "loading remote context failed")

  checkErr("cyclic IRI mapping errors",
    s"""{"@context": {"a": "b:x", "b": "a:y"},
      "@id": "${X}s", "a": "v"}""",
    "cyclic IRI mapping")

  check("term whose value is another term aliases its IRI",
    s"""{"@context": {"p2": "p1", "p1": "${X}p"},
      "@id": "${X}s", "p2": "v"}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("native double inside @json keeps JSON form, not XSD canonical",
    s"""{"@context": {"p": {"@id": "${X}p", "@type": "@json"}},
      "@id": "${X}s", "p": [1.5, true]}""",
    "<" + X + "s> <" + X + "p> " +
      "\"[1.5,true]\"^^<" + Rdf + "JSON> .")

  check("@vocab empty string resolves to @base",
    s"""{"@context": {"@base": "$X", "@vocab": ""},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}p> "v" .""")

  check("relative @id forms: dot segments, fragment, query",
    s"""{"@context": {"@base": "http://b/dir/file"},
      "@id": "#f", "${X}p": [{"@id": "?q=1"}, {"@id": "../up"}]}""",
    s"""<http://b/dir/file#f> <${X}p> <http://b/dir/file?q=1> .
      <http://b/dir/file#f> <${X}p> <http://b/up> .""")

  check("two terms mapping one IRI merge in the output",
    s"""{"@context": {"a": "${X}p", "b": "${X}p"},
      "@id": "${X}s", "a": "1", "b": "2"}""",
    s"""<${X}s> <${X}p> "1" .
      <${X}s> <${X}p> "2" .""")

  check("term with only @container falls back to @vocab for its IRI",
    s"""{"@context": {"@vocab": "$X",
        "p": {"@container": "@list"}},
      "@id": "${X}s", "p": ["a"]}""",
    s"""<${X}s> <${X}p> _:l .
      _:l <${Rdf}first> "a" .
      _:l <${Rdf}rest> <${Rdf}nil> .""")

  check("language tags lowercase at every site",
    s"""{"@id": "${X}s",
      "${X}p": {"@value": "v", "@language": "EN-Us"}}""",
    s"""<${X}s> <${X}p> "v"@en-us .""")

  check("reverse term with @type: @id coercion",
    s"""{"@context": {"rev": {"@reverse": "${X}p", "@type": "@id"}},
      "@id": "${X}s", "rev": "${X}o"}""",
    s"""<${X}o> <${X}p> <${X}s> .""")

  check("list container with @type: @id coerced items",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@list",
        "@type": "@id"}},
      "@id": "${X}s", "p": ["${X}a", "${X}b"]}""",
    s"""<${X}s> <${X}p> _:l0 .
      _:l0 <${Rdf}first> <${X}a> .
      _:l0 <${Rdf}rest> _:l1 .
      _:l1 <${Rdf}first> <${X}b> .
      _:l1 <${Rdf}rest> <${Rdf}nil> .""")

  check("type-scoped context can swap @vocab for the node",
    s"""{"@context": {"@vocab": "${X}v1#",
        "T": {"@id": "${X}T", "@context": {"@vocab": "${X}v2#"}}},
      "@id": "${X}s", "@type": "T", "p": "v"}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .
      <${X}s> <${X}v2#p> "v" .""")

  check("aliased @list key in a value object",
    s"""{"@context": {"list": "@list"},
      "@id": "${X}s", "${X}p": {"list": ["a"]}}""",
    s"""<${X}s> <${X}p> _:l .
      _:l <${Rdf}first> "a" .
      _:l <${Rdf}rest> <${Rdf}nil> .""")

  check("@included nests recursively",
    s"""{"@id": "${X}s", "${X}p": "v",
      "@included": [{"@id": "${X}t", "${X}q": "w",
        "@included": [{"@id": "${X}u", "${X}r": "x"}]}]}""",
    s"""<${X}s> <${X}p> "v" .
      <${X}t> <${X}q> "w" .
      <${X}u> <${X}r> "x" .""")

  check("index map entries may be plain scalars",
    s"""{"@context": {"p": {"@id": "${X}p", "@container": "@index"}},
      "@id": "${X}s", "p": {"i": [1, "a"]}}""",
    s"""<${X}s> <${X}p> "1"^^<${Xsd}integer> .
      <${X}s> <${X}p> "a" .""")

  check("compound-literal without @language keeps value + direction",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "v", "@direction": "ltr"}}""",
    s"""<${X}s> <${X}p> _:c .
      _:c <${Rdf}value> "v" .
      _:c <${Rdf}direction> "ltr" .""",
    rdfDirection = Some("compound-literal"))

  check("@type may be redefined with @container: @set only",
    s"""{"@context": {"@type": {"@container": "@set"}},
      "@id": "${X}s", "@type": ["${X}T"]}""",
    s"""<${X}s> <${Rdf}type> <${X}T> .""")

  checkErr("any other keyword redefinition errors",
    s"""{"@context": {"@value": "${X}v"},
      "@id": "${X}s", "${X}p": "v"}""",
    "keyword redefinition")

  checkErr("@type redefinition beyond @container: @set errors",
    s"""{"@context": {"@type": {"@id": "${X}t"}},
      "@id": "${X}s", "${X}p": "v"}""",
    "keyword redefinition")

  check("keyword-lookalike term NAME is ignored",
    s"""{"@context": {"@fancy": "${X}fancy"},
      "@id": "${X}s", "${X}p": "kept"}""",
    s"""<${X}s> <${X}p> "kept" .""")

  check("simple term definition values expand with @vocab",
    s"""{"@context": {"@vocab": "$X", "p": "q"},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}q> "v" .""")

  check("@vocab declared after the term still shapes it",
    s"""{"@context": {"p": "q", "@vocab": "$X"},
      "@id": "${X}s", "p": "v"}""",
    s"""<${X}s> <${X}q> "v" .""")

  check("expanded @id values expand with @vocab too",
    s"""{"@context": {"@vocab": "$X",
        "p": {"@id": "q", "@type": "@id"}},
      "@id": "${X}s", "p": "${X}o"}""",
    s"""<${X}s> <${X}q> <${X}o> .""")

  check("nested arrays flatten in plain value positions",
    s"""{"@id": "${X}s", "${X}p": [["a"], "b", [["c"]]]}""",
    s"""<${X}s> <${X}p> "a" .
      <${X}s> <${X}p> "b" .
      <${X}s> <${X}p> "c" .""")

  check("nested array inside an explicit @list stays a nested list",
    s"""{"@id": "${X}s", "${X}p": {"@list": [["a"]]}}""",
    s"""<${X}s> <${X}p> _:o0 .
      _:o0 <${Rdf}first> _:i0 .
      _:o0 <${Rdf}rest> <${Rdf}nil> .
      _:i0 <${Rdf}first> "a" .
      _:i0 <${Rdf}rest> <${Rdf}nil> .""")

  check("top-level empty @graph emits nothing",
    s"""[{"@graph": []}, {"@id": "${X}s", "${X}p": "v"}]""",
    s"""<${X}s> <${X}p> "v" .""")

  check("compound-literal mode reifies value, language and direction",
    s"""{"@id": "${X}s", "${X}p":
      {"@value": "v", "@language": "AR", "@direction": "rtl"}}""",
    s"""<${X}s> <${X}p> _:c .
      _:c <${Rdf}value> "v" .
      _:c <${Rdf}language> "ar" .
      _:c <${Rdf}direction> "rtl" .""",
    rdfDirection = Some("compound-literal"))
}
