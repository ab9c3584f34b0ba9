package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra.Algebra._
import graft.model.Term
import graft.parser.SparqlParser

class ParserSpec extends AnyFunSuite {
  import TestSpark._

  val pfx = "PREFIX : <http://example.org/>\n"

  test("parses a BGP with abbreviations into algebra") {
    val q = SparqlParser.parse(pfx +
      "SELECT ?n WHERE { ?c :name ?n ; :acctbal ?b . ?c a :Customer . }")
    val Select(Project(bgpish, vars)) = q: @unchecked
    assert(vars == Seq("n"))
    def count(g: GraphPattern): Int = g match {
      case Join(l, r) => count(l) + count(r)
      case Bgp(ps @ _*) => ps.length
      case _ => 0
    }
    assert(count(bgpish) == 3)
  }

  test("parses paths, filters, optional, values, union") {
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x (:a/:b)|^:c+ ?y . }").isInstanceOf[Select])
    assert(SparqlParser.parse(pfx +
      """SELECT ?x WHERE { { ?x :p ?y } UNION { ?x :q ?y }
         OPTIONAL { ?y :r ?z } FILTER(?y > 3 && !BOUND(?z)) }""")
      .isInstanceOf[Select])
    assert(SparqlParser.parse(pfx +
      """SELECT ?x WHERE { VALUES (?x ?y) { (:a 1) (UNDEF "s"@en) }
         ?x :p ?y . MINUS { ?x :bad true } }""").isInstanceOf[Select])
  }

  test("DESCRIBE forms parse to Describe algebra") {
    val Describe(_, vs) = SparqlParser.parse(pfx +
      "DESCRIBE ?c WHERE { ?c :name ?n }"): @unchecked
    assert(vs == Seq("c"))
    // constant resource: fresh var bound via inline data, no WHERE needed
    val Describe(p, vs2) = SparqlParser.parse(pfx +
      "DESCRIBE <http://example.org/customer/0>"): @unchecked
    assert(vs2.length == 1)
    def hasValues(g: GraphPattern): Boolean = g match {
      case ValuesPat(_, _) => true
      case Join(l, r) => hasValues(l) || hasValues(r)
      case _ => false
    }
    assert(hasValues(p))
    val Describe(_, vs3) = SparqlParser.parse(pfx +
      "DESCRIBE ?a ?b WHERE { ?a :knows ?b }"): @unchecked
    assert(vs3 == Seq("a", "b"))
  }

  test("CONSTRUCT solution modifiers and DESCRIBE *") {
    val Construct(_, w) = SparqlParser.parse(pfx +
      """CONSTRUCT { ?c :seg ?s } WHERE { ?c :mktsegment ?s }
         ORDER BY ?c LIMIT 5"""): @unchecked
    val Slice(OrderBy(_, keys), off, lim) = w: @unchecked
    assert(keys == Seq(EVar("c") -> true) && off == 0 && lim == 5)
    val Describe(_, vs) = SparqlParser.parse(pfx +
      "DESCRIBE * WHERE { ?a :knows ?b } LIMIT 3"): @unchecked
    assert(vs == Seq("a", "b"))
  }

  test("RDF collections desugar to rdf:first/rdf:rest chains") {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val q = SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :list (1 2 3) . }")
    val Select(Project(gp, _)) = q: @unchecked
    def triples(g: GraphPattern): Seq[TriplePattern] = g match {
      case Join(l, r) => triples(l) ++ triples(r)
      case Bgp(ps @ _*) => ps
      case _ => Nil
    }
    val ts = triples(gp)
    // 1 membership triple + 3 first + 3 rest
    assert(ts.length == 7)
    assert(ts.count(_.p == I(rdf + "first")) == 3)
    assert(ts.count(_.p == I(rdf + "rest")) == 3)
    assert(ts.count(_.o == I(rdf + "nil")) == 1)
    // empty collection is rdf:nil itself
    val q2 = SparqlParser.parse(pfx + "SELECT ?x WHERE { ?x :list () . }")
    val Select(Project(gp2, _)) = q2: @unchecked
    assert(triples(gp2) ==
      Seq(TriplePattern(V("x"), I("http://example.org/list"), I(rdf + "nil"))))
  }

  test("GROUP BY expression keys bind then group") {
    val q = SparqlParser.parse(pfx +
      """SELECT ?seg (COUNT(*) AS ?n) WHERE { ?c :mktsegment ?s }
         GROUP BY (UCASE(?s) AS ?seg)""")
    val Select(Project(gp, _)) = q: @unchecked
    def findGroup(g: GraphPattern): Option[Group] = g match {
      case grp: Group => Some(grp)
      case Extend(i, _, _) => findGroup(i)
      case Project(i, _) => findGroup(i)
      case _ => None
    }
    val Some(Group(Extend(_, v, EFn("UCASE", _)), keys, _)) =
      findGroup(gp): @unchecked
    assert(v == "seg" && keys == Seq("seg"))
  }

  test("inverse elements in negated property sets") {
    val Select(Project(gp, _)) = SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x !(:p|^:q|^:r) ?y }"): @unchecked
    def findPath(g: GraphPattern): Option[Path] = g match {
      case PathPattern(_, p, _) => Some(p)
      case Join(l, r) => findPath(l).orElse(findPath(r))
      case _ => None
    }
    val Some(PNeg(fwd, inv)) = findPath(gp): @unchecked
    assert(fwd == Seq("http://example.org/p"))
    assert(inv == Seq("http://example.org/q", "http://example.org/r"))
  }

  test("RDF-star quoted-triple patterns parse in subject/object") {
    val q = SparqlParser.parse(pfx +
      "SELECT ?s ?c WHERE { << ?s :age ?a >> :certainty ?c . }")
    val Select(Project(inner, _)) = q: @unchecked
    def findQ(g: GraphPattern): Option[TriplePattern] = g match {
      case Bgp(ps @ _*) => ps.find(_.s.isInstanceOf[Q])
      case Join(l, r) => findQ(l).orElse(findQ(r))
      case other => None
    }
    val tp = findQ(inner).get
    val Q(V("s"), I(p), V("a")) = tp.s: @unchecked
    assert(p == "http://example.org/age")
    // nested quoted + object position + constant components
    val q2 = SparqlParser.parse(pfx +
      """SELECT ?x WHERE { ?x :says << << :a :b :c >> :d "v" >> . }""")
    val Select(Project(inner2, _)) = q2: @unchecked
    def findO(g: GraphPattern): Option[TermPat] = g match {
      case Bgp(ps @ _*) => ps.map(_.o).find(_.isInstanceOf[Q])
      case Join(l, r) => findO(l).orElse(findO(r))
      case other => None
    }
    val Some(Q(nested: Q, I(_), L("v", Term.XsdString, None))) =
      findO(inner2): @unchecked
    assert(nested.s == I("http://example.org/a"))
    // expression builtins
    assert(SparqlParser.parse(pfx +
      """SELECT ?t WHERE { ?x :p ?y .
         BIND(TRIPLE(?x, :p, ?y) AS ?t)
         FILTER(isTRIPLE(?t) && BOUND(SUBJECT(?t))) }""")
      .isInstanceOf[Select])
  }

  test("malformed queries are rejected, not misparsed") {
    val bad = Seq(
      pfx + "SELECT ?x WHERE { ?x :p ?y",                 // unclosed group
      pfx + "SELECT ?x WHERE { << ?x :p >> :q 1 . }",     // 2-part quoted
      pfx + "SELECT ?x WHERE { << ?x :p ?y :z >> :q 1 . }", // 4-part quoted
      pfx + "SELECT ?x WHERE { ?x :p ?y . FILTER( }",     // broken filter
      pfx + "SELECT ?x WHERE { ?x :p ?y {| :q |} }",      // annot, no object
      pfx + "SELECT ?x WHERE { VALUES ?v { ",             // unclosed VALUES
      "SELECT ?x WHERE { ?x unknown:p ?y . }")            // unbound prefix
    for (q <- bad)
      assertThrows[Exception](SparqlParser.parse(q))
  }

  test("string escapes, datatypes, comments survive the parse") {
    val Select(Project(Filter(f, _), _)) = SparqlParser.parse(pfx +
      """SELECT ?x # trailing comment
         WHERE { ?x :p ?v .
         FILTER(?v != "a\"b\nc"^^<http://www.w3.org/2001/XMLSchema#string>) }"""): @unchecked
    val EFn("!=", _, ELit(lex, dt, _)) = f: @unchecked
    assert(lex == "a\"b\nc" && dt == Term.XsdString)
  }

  test("parsed text query equals programmatic algebra results (sp1)") {
    val quads = graft.io.TpchRdf.quads(spark, sf)
    val text = SparqlParser.execute(pfx +
      """SELECT ?cname ?b WHERE {
           ?c :inNation ?n . ?n :inRegion ?r . ?r :name "ASIA" .
           ?c :acctbal ?b ; :name ?cname . FILTER(?b > 5000.00)
         } ORDER BY ?cname""", quads)
    val prog = graft.queries.Sparql.queries("sp1_bgp_filter")(spark, sf)
    val t = text.select(text("cname")("lex"), text("b")("lex")).collect()
      .map(_.toSeq).toSet
    val p = prog.collect().map(r => Seq(r.get(0), r.get(1).toString)).toSet
    assert(t.map(_.map(_.toString)) == p.map(_.map(_.toString)))
  }

  test("aggregate hoisting: GROUP BY + HAVING + projection exprs") {
    val q = SparqlParser.parse(pfx +
      """SELECT ?n (COUNT(*) AS ?c) (SUM(?b) AS ?s) WHERE {
           ?x :inNation ?n ; :acctbal ?b } GROUP BY ?n
         HAVING (COUNT(*) > 2) ORDER BY ?n""")
    assert(q.isInstanceOf[Select])
    val df = SparqlParser.execute(pfx +
      """SELECT ?n (COUNT(*) AS ?c) WHERE {
           ?x :inNation ?n ; :acctbal ?b } GROUP BY ?n""",
      graft.io.TpchRdf.quads(spark, sf))
    assert(df.count() == 25)
  }

  test("blank-node property lists desugar to bnode-var triples") {
    val q = SparqlParser.parse(pfx +
      "SELECT ?n WHERE { ?c :knows [ :name ?n ; :age 5 ] . }")
    def pats(g: GraphPattern): Seq[TriplePattern] = g match {
      case Join(l, r) => pats(l) ++ pats(r)
      case Bgp(ps @ _*) => ps
      case Project(i, _) => pats(i)
      case _ => Nil
    }
    val Select(inner) = q: @unchecked
    val ps = pats(inner)
    assert(ps.length == 3)
    val bnodes = ps.flatMap(p => Seq(p.s, p.o)).collect { case b: B => b }
    assert(bnodes.distinct.length == 1, "one shared fresh bnode")
    // executes end-to-end (bnode becomes a join variable)
    val df = SparqlParser.execute(pfx +
      "SELECT ?rn WHERE { ?r :locatedIn [ ] ; :name ?rn . }",
      graft.io.TpchRdf.quads(spark, sf))
    assert(df.count() > 0)
  }

  test("rejects malformed queries") {
    intercept[RuntimeException](SparqlParser.parse("SELECT ?x WHERE"))
    intercept[RuntimeException](SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p ?y } trailing"))
    // NB `:undefinedprefix:p` would be ONE valid pname since r10 —
    // PN_LOCAL allows ':' (rule [169]) — so use an undeclared prefix
    intercept[RuntimeException](SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x undefinedprefix:p ?y }"))
    intercept[RuntimeException](SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { :a :p :b } trailing"))
  }

  test("probe wave 4 positives: path bracketing, GROUP_CONCAT " +
      "separators, PN_LOCAL escapes, dataset clauses all parse") {
    val probes = Seq(
      "SELECT ?x WHERE { ?x (:p/:q)+ ?y }",
      "SELECT ?x WHERE { ?x ^(:p/:q) ?y }",
      "SELECT ?x WHERE { ?x ^:p* ?y }",
      "SELECT ?x WHERE { ?x :p/(:q|:r)*/:s ?y }",
      "SELECT ?x WHERE { ?x ((:p)) ?y }",
      "SELECT ?x WHERE { ?x !(:p|^:q) ?y }",
      "SELECT ?x WHERE { ?x !^:p ?y }",
      "SELECT ?x WHERE { ?x a? ?y }",
      "SELECT ?x WHERE { ?x (:p+)? ?y }",
      "SELECT ?x WHERE { ?x !a ?y }",
      "SELECT ?x WHERE { ?x (:p|:q)/(:r|:s) ?y }",
      "SELECT (GROUP_CONCAT(?n; SEPARATOR='') AS ?c) WHERE { ?x :n ?n }",
      "SELECT (GROUP_CONCAT(?n; separator=\"-\") AS ?c) WHERE { ?x :n ?n }",
      "SELECT (GROUP_CONCAT(DISTINCT ?n; SEPARATOR=\", \") AS ?c) " +
        "WHERE { ?x :n ?n }",
      "SELECT (GROUP_CONCAT(?n ; SEPARATOR = \"\\t\") AS ?c) " +
        "WHERE { ?x :n ?n }",
      "SELECT ?y WHERE { :x\\~\\!\\$\\&\\'\\*\\+\\,\\;\\=\\/\\?\\- :p ?y }",
      "SELECT ?y WHERE { ?y :p :o\\.k }",
      "SELECT ?y WHERE { :a.b.c :p ?y }",
      "DESCRIBE ?x FROM <http://g/1> FROM NAMED <http://g/2> " +
        "WHERE { GRAPH ?g { ?x :p ?o } }",
      "DESCRIBE :a FROM <http://g/1>",
      "DESCRIBE * FROM <http://g/1> WHERE { ?x :p ?o }",
      "ASK FROM <http://g/1> WHERE { ?x :p ?o }",
      "CONSTRUCT { ?x :p ?o } FROM <http://g/1> WHERE { ?x :p ?o }",
      "CONSTRUCT FROM <http://g/1> WHERE { ?x :p ?o }")
    probes.foreach(q => SparqlParser.parse(pfx + q))
  }

  test("CONSTRUCT WHERE shorthand equals the explicit form") {
    val quads = graft.io.TpchRdf.quads(spark, sf)
    val short = SparqlParser.execute(pfx +
      "CONSTRUCT WHERE { ?r :name ?n }", quads)
    val full = SparqlParser.execute(pfx +
      "CONSTRUCT { ?r :name ?n } WHERE { ?r :name ?n }", quads)
    assert(short.count() == full.count() && short.count() > 0)
    assert(short.except(full).count() == 0)
  }

  test("trailing VALUES clause joins the query solutions") {
    val quads = graft.io.TpchRdf.quads(spark, sf)
    val df = SparqlParser.execute(pfx +
      """SELECT ?rn WHERE { ?r :name ?rn . ?r :locatedIn :world }
         ORDER BY ?rn VALUES ?rn { "ASIA" "EUROPE" }""", quads)
    val got = df.collect().map(_.getStruct(0).getString(1)).toSeq
    assert(got == Seq("ASIA", "EUROPE"))
  }

  test("CLEAR/DROP graph-ref targets parse to distinct ops") {
    assert(SparqlParser.parseUpdateText(
      "CLEAR GRAPH <urn:g> ; CLEAR SILENT DEFAULT ; CLEAR NAMED ; CLEAR ALL")
      == Seq(ClearGraph(Some("urn:g")), ClearGraph(None),
        ClearNamed, ClearAll))
    assert(SparqlParser.parseUpdateText(
      "DROP SILENT GRAPH <urn:g> ; DROP DEFAULT ; DROP NAMED ; DROP ALL")
      == Seq(DropGraph(Some("urn:g")), DropGraph(None), DropNamed, DropAll))
    intercept[RuntimeException](
      SparqlParser.parseUpdateText("DROP SOMETHING"))
  }

  test("ORDER BY accepts bare constraints (builtin / function calls)") {
    val q = SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p ?y } ORDER BY STRLEN(?y) DESC(?x)")
    val Select(Project(OrderBy(_, keys), _)) = q: @unchecked
    assert(keys == Seq(EFn("STRLEN", EVar("y")) -> true, EVar("x") -> false))
  }

  test("IRI UCHAR escapes: valid resolve, truncated/non-hex are clean errors") {
    import graft.model.RdfEscapes.unescapeIri
    assert(unescapeIri("http://x/\\u00e9") == "http://x/é")
    assert(unescapeIri("http://x/\\U0001F600") == "http://x/😀")
    // trailing truncated escapes must raise a syntax error, not
    // StringIndexOutOfBoundsException
    intercept[IllegalArgumentException](unescapeIri("http://x/\\uABC"))
    intercept[IllegalArgumentException](unescapeIri("http://x/\\U0001F60"))
    intercept[IllegalArgumentException](unescapeIri("http://x/\\uZZZZ"))
  }

  test("DELETE WHERE { } parses to a no-op, not a crash") {
    val ops = SparqlParser.parseUpdateText(pfx + "DELETE WHERE { }")
    assert(ops.length == 1) // empty template + empty pattern = no-op
  }

  test("wave 22: LIMIT/OFFSET commute; NOT IN; unary chains; base chain") {
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p 1 } OFFSET 2 LIMIT 3") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p 1 } LIMIT 3 OFFSET 2") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p ?y FILTER(?y NOT IN (1, 2)) }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p ?y FILTER(!!?y && -?y < 0) }") != null)
    // Turtle @base chain resolves each base against the previous one
    val qs = new graft.io.TurtleParser(
      "@base <http://h/a/> .\n@base <sub/> .\n<x> <http://p/> 1 .")
      .parse()
    assert(qs.head.s.lex == "http://h/a/sub/x")
  }

  test("waves 16-17: prologue per update op; keyword-case booleans; " +
      "COUNT(DISTINCT *); bare-builtin GROUP BY; SERVICE ?var") {
    // rule [3]: each ';' opens a fresh Update with its own Prologue
    val ops = SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { :a :p 1 } ; PREFIX y: <http://y/>\n" +
      "INSERT DATA { y:a y:p 2 }")
    assert(ops.length == 2)
    // SPARQL keywords are case-insensitive — including TRUE/FALSE
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p TRUE . ?x :q FaLsE }") != null)
    // COUNT(DISTINCT *) is grammatical (rule [127])
    assert(SparqlParser.parse(pfx +
      "SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?x :p ?y }") != null)
    // GROUP BY takes a bare BuiltInCall (rule [20])
    assert(SparqlParser.parse(pfx +
      "SELECT (COUNT(*) AS ?n) WHERE { ?x :p ?y } GROUP BY STR(?x)")
      != null)
    // SERVICE names a variable endpoint (rule [59])
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { SERVICE SILENT ?ep { ?x :p ?y } }") != null)
  }

  test("wave 20: SPARQL-star annotation chains and template annotations") {
    // annotation is a '*' repetition: chained blocks all annotate the
    // same triple
    val q = SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?s :p ?o {| :q 1 |} {| :r ?x |} }")
    assert(q != null)
    // annotations in CONSTRUCT templates attach to the quoted triple
    val c = SparqlParser.parse(pfx +
      "CONSTRUCT { ?s :p ?o {| :src :here |} } WHERE { ?s :p ?o }")
    val Construct(tmpl, _) = c: @unchecked
    assert(tmpl.size == 2)
    assert(tmpl.exists(t => t.s.isInstanceOf[Q]),
      s"expected a quoted-subject annotation triple in $tmpl")
    // a ';' may dangle before '|}'; an empty block stays illegal
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?s :p ?o {| :q ?x ; |} }") != null)
    intercept[Exception](SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?s :p ?o {| |} }"))
    // paths and literal subjects stay illegal inside quoted triples
    intercept[Exception](SparqlParser.parse(pfx +
      "SELECT ?x WHERE { << ?a :p/:q ?b >> :r ?x }"))
    intercept[Exception](SparqlParser.parse(pfx +
      "SELECT ?x WHERE { << 1 :p ?b >> :r ?x }"))
  }

  test("wave 15: keyword boundary uses PN_CHARS — 'a-b' prefixes, " +
      "'true.' terminator") {
    // 'a-b' is a legal PN_PREFIX ('-' is a PN_CHARS continuation), so
    // 'a-b:p' must parse as one PNAME, never the 'a' type keyword
    val q = SparqlParser.parse("PREFIX a-b: <http://y/>\n" +
      "SELECT ?x WHERE { ?x a-b:p 1 }")
    assert(q != null)
    // interior dots: 'a.b:p' is a PNAME with prefix 'a.b'
    val qd = SparqlParser.parse("PREFIX a.b: <http://y/>\n" +
      "SELECT ?x WHERE { ?x a.b:p 1 }")
    assert(qd != null)
    // a bare DOT after a keyword is still the statement terminator
    val qt = SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p true. ?x :q false. }")
    assert(qt != null)
    // and 'a' as rdf:type followed by DOT still works
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x a :T. ?x :q 1 }") != null)
  }

  test("wave 25: keyword-adjacent unicode — CJK/astral PN_CHARS block " +
      "keyword recognition; unicode VARNAME continuations") {
    // a CJK char is PN_CHARS_BASE: 'a中:p' is one PNAME, never the 'a'
    // type keyword followed by garbage
    assert(SparqlParser.parse("PREFIX a中: <http://y/>\n" +
      "SELECT ?x WHERE { ?x a中:p 1 }") != null)
    // an astral-plane char (U+10000, via surrogate pair) continues a
    // prefix the same way
    assert(SparqlParser.parse("PREFIX a𐀀: <http://y/>\n" +
      "SELECT ?x WHERE { ?x a𐀀:p 1 }") != null)
    // 'a:b' itself is a PNAME with prefix 'a' (longest match), not the
    // type keyword followed by ':b'
    assert(SparqlParser.parse("PREFIX a: <http://y/>\n" +
      "SELECT ?x WHERE { ?x a:b 1 }") != null)
    // 'true' is a legal PN_PREFIX: 'true:p' is a PNAME, not a boolean
    assert(SparqlParser.parse("PREFIX true: <http://y/>\n" +
      "SELECT ?x WHERE { ?x true:p true }") != null)
    // VARNAME continuations: middle dot U+00B7, combining mark U+0300,
    // and an astral first char
    assert(SparqlParser.parse(pfx +
      "SELECT ?a·b WHERE { ?a·b :p 1 }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?ab̀ WHERE { ?ab̀ :p 1 }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?𐀀x WHERE { ?𐀀x :p 1 }") != null)
    // no whitespace needed between a keyword and a following var
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { GRAPH?g { ?x :p 1 } }") != null)
    // keywords are legal prefix AND local names
    assert(SparqlParser.parse("PREFIX select: <http://y/>\n" +
      "SELECT ?x WHERE { ?x select:select 1 }") != null)
  }

  test("wave 26: empty groups, filter-only patterns, NPS forms, " +
      "HAVING under implicit grouping") {
    assert(SparqlParser.parse(pfx + "SELECT ?x WHERE {}") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { FILTER(true) }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x :p ?y OPTIONAL { FILTER(?y > 1) } }") != null)
    // negated property sets: bare, inverse-only, mixed
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x !:p ?y }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x !(^:p) ?y }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { ?x !(:p|^:q|:r) ?y }") != null)
    // HAVING with implicit grouping (no GROUP BY clause)
    assert(SparqlParser.parse(pfx +
      "SELECT (COUNT(*) AS ?n) WHERE { ?x :p ?y } " +
      "HAVING (COUNT(*) > 0)") != null)
  }

  test("SPARQL 1.2 / Turtle 1.2 VERSION declarations") {
    assert(SparqlParser.parse("VERSION \"1.2\"\n" + pfx +
      "SELECT ?x WHERE { ?x :p ?y }") != null)
    assert(SparqlParser.parse(pfx + "VERSION '1.1'\n" +
      "SELECT ?x WHERE { ?x :p ?y }") != null)
    assertThrows[Exception](SparqlParser.parse(
      "VERSION \"2.0\"\nSELECT ?x WHERE { ?x ?p ?y }"))
    assertThrows[Exception](SparqlParser.parse(
      "VERSION 1.2\nSELECT ?x WHERE { ?x ?p ?y }"))
    def ttl(doc: String) = new graft.io.TurtleParser(doc).parse()
    assert(ttl("""@version "1.2" . @prefix : <http://x/> . :s :p :o .""")
      .size == 1)
    assert(ttl("""VERSION "1.2" @prefix : <http://x/> . :s :p :o .""")
      .size == 1)
    assertThrows[Exception](ttl("""@version "3" . """))
    assertThrows[Exception](ttl("""@version "1.2"  """)) // missing dot
  }

  test("ExprTripleTerm: <<( )>> in expression position = TRIPLE(...)") {
    val a = SparqlParser.parse(pfx +
      "SELECT ?t WHERE { ?x :p ?y BIND(<<( ?x :p ?y )>> AS ?t) }")
    val b = SparqlParser.parse(pfx +
      "SELECT ?t WHERE { ?x :p ?y BIND(<< ?x :p ?y >> AS ?t) }")
    val c = SparqlParser.parse(pfx +
      "SELECT ?t WHERE { ?x :p ?y BIND(TRIPLE(?x, :p, ?y) AS ?t) }")
    assert(a == b && b == c)
    assertThrows[Exception](SparqlParser.parse(pfx +
      "SELECT ?t WHERE { BIND(<<( ?x :p ?y >> AS ?t) }"))
  }

  test("reifier sugar desugars to exactly its rdf:reifies expansion") {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    // pattern side: ~?r == explicit reifies pattern with a triple term
    val sugar = SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?s :p ?o ~?r . ?r :n ?v }")
    val expanded = SparqlParser.parse(pfx +
      s"SELECT ?r WHERE { ?s :p ?o . ?r <${rdf}reifies> <<( ?s :p ?o )>> . " +
      "?r :n ?v }")
    assert(sugar == expanded)
    // block-after-reifier == reifies pattern + properties on the reifier
    val sugar2 = SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?s :p ?o ~?r {| :n ?v |} }")
    assert(sugar2 == expanded)
    // CG block without a reifier targets the quoted term, NOT a reifier
    val cg = SparqlParser.parse(pfx +
      "SELECT ?v WHERE { ?s :p ?o {| :n ?v |} }")
    val cgExpanded = SparqlParser.parse(pfx +
      "SELECT ?v WHERE { ?s :p ?o . << ?s :p ?o >> :n ?v }")
    assert(cg == cgExpanded)
  }

  test("wave 27: SPARQL reifier runs, object-list distribution, case") {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    // mixed run: each block annotates ITS preceding reifier
    val run = SparqlParser.parse(pfx +
      "SELECT * WHERE { ?s :p ?o ~?r1 {| :n 1 |} ~?r2 {| :n 2 |} }")
    val runExp = SparqlParser.parse(pfx +
      s"""SELECT * WHERE { ?s :p ?o .
        ?r1 <${rdf}reifies> <<( ?s :p ?o )>> . ?r1 :n 1 .
        ?r2 <${rdf}reifies> <<( ?s :p ?o )>> . ?r2 :n 2 }""")
    assert(run == runExp)
    // reifiers distribute per OBJECT in an object list
    val ol = SparqlParser.parse(pfx +
      "SELECT * WHERE { ?s :p ?o1 ~?r1 , ?o2 ~?r2 }")
    val olExp = SparqlParser.parse(pfx +
      s"""SELECT * WHERE { ?s :p ?o1 .
        ?r1 <${rdf}reifies> <<( ?s :p ?o1 )>> . ?s :p ?o2 .
        ?r2 <${rdf}reifies> <<( ?s :p ?o2 )>> }""")
    assert(ol == olExp)
    // same reifier var on two triples joins (no special casing)
    assert(SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?s :p ?o ~?r . ?a :q ?b ~?r }") != null)
    // VERSION keyword is case-insensitive like every SPARQL keyword
    assert(SparqlParser.parse("version \"1.2\"\n" + pfx +
      "SELECT ?x WHERE { ?x ?p <<( :a :b :c )>> }") != null)
    // doubled tilde: two reifiers of the same triple (bare + named)
    val dbl = SparqlParser.parse(pfx +
      "SELECT * WHERE { ?s :p ?o ~~?r }")
    assert(dbl != null)
    // malformed stays loud
    for (bad <- Seq(
      "SELECT * WHERE { ?s :p ?o ~\"lit\" }",   // literal reifier
      "SELECT * WHERE { ?s :p ?o ~?r {| |} }",  // empty block
      "SELECT * WHERE { ?s :p , ?o ~?r }"))     // object-less comma
      assertThrows[Exception](SparqlParser.parse(pfx + bad))
  }

  test("RDF 1.2 reifiers in CONSTRUCT templates and update quad data") {
    assert(SparqlParser.parse(pfx +
      "CONSTRUCT { ?s :p ?o ~?r } WHERE { ?s :p ?o . ?r :src ?s }") != null)
    assert(SparqlParser.parse(pfx +
      "CONSTRUCT { ?s :p ?o ~:r {| :conf 0.9 |} } WHERE { ?s :p ?o }")
      != null)
    // update data: reifier quad lands in the same graph
    assert(SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { :s :p :o ~:r }") != null)
    assert(SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { GRAPH :g { :s :p :o ~ } }") != null)
    // internal reifier form accepted at every template position
    assert(SparqlParser.parse(pfx +
      "CONSTRUCT { << ?s :p ?o ~?r >> :note \"n\" } WHERE { ?s :p ?o }")
      != null)
    assert(SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { :a :q << :s :p :o ~:r >> }") != null)
    assert(SparqlParser.parseUpdateText(pfx +
      "INSERT DATA { GRAPH :g { :a :q << :s :p :o ~ >> } }") != null)
  }

  test("RDF 1.2 triple terms in SPARQL: object positions only") {
    // object of a triple pattern, with variables inside
    assert(SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?r :reifies <<( ?s :p ?o )>> }") != null)
    // collection item, VALUES data (ground), CONSTRUCT template object
    assert(SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?r :q ( <<( :s :p :o )>> ) }") != null)
    assert(SparqlParser.parse(pfx +
      "SELECT ?x WHERE { VALUES ?x { <<( :s :p 1 )>> } }") != null)
    assert(SparqlParser.parse(pfx +
      "CONSTRUCT { ?r :reifies <<( ?s :p ?o )>> } " +
      "WHERE { ?r :src ?s . ?s :p ?o }") != null)
    // nested in the object slot of another triple term
    assert(SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?r :q <<( ?s :p <<( :a :b :c )>> )>> }") != null)
    // both spellings denote the same pattern
    val a = SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?r :reifies <<( ?s :p ?o )>> }")
    val b = SparqlParser.parse(pfx +
      "SELECT ?r WHERE { ?r :reifies << ?s :p ?o >> }")
    assert(a == b)
    // subject / predicate / triple-term-subject positions are errors
    for (bad <- Seq(
      "SELECT ?x WHERE { <<( :s :p :o )>> :q ?x }",
      "SELECT ?x WHERE { ?x <<( :s :p :o )>> ?y }",
      "SELECT ?r WHERE { ?r :q <<( <<( :a :b :c )>> :p ?o )>> }",
      "SELECT ?r WHERE { ?r :q <<( \"lit\" :p ?o )>> }",
      "SELECT ?r WHERE { ?r :q <<( :s :p :o >> }"))
      assertThrows[Exception](SparqlParser.parse(pfx + bad))
  }
}
