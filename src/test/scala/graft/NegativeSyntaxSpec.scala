package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.SparqlParser

/** Negative syntax cases — the W3C `NegativeSyntaxTest11` analogue the
  * reference's testsuite/ runs (SURVEY.md §5): every malformed query or
  * update must raise a parse error, never mis-parse into a runnable
  * (wrong) algebra. Positive-syntax coverage lives in ParserSpec /
  * GrammarFuzzSpec; FixtureSpec holds the evaluation suite.
  */
class NegativeSyntaxSpec extends AnyFunSuite {

  private val pfx = "PREFIX : <http://x/>\n"

  private val badQueries = Seq(
    "empty input" -> "",
    "keyword soup" -> "SELECT WHERE",
    "missing closing brace" -> (pfx + "SELECT ?x WHERE { ?x :p ?y"),
    "missing WHERE body" -> (pfx + "SELECT ?x"),
    "trailing garbage" -> (pfx + "SELECT ?x WHERE { ?x :p ?y } nonsense"),
    "unterminated string" -> (pfx + "SELECT ?x WHERE { ?x :p \"abc }"),
    "unterminated long string" ->
      (pfx + "SELECT ?x WHERE { ?x :p \"\"\"abc }"),
    "unterminated IRI" -> (pfx + "SELECT ?x WHERE { ?x <http://x/p ?y }"),
    "undefined prefix" -> "SELECT ?x WHERE { ?x undef:p ?y }",
    "bad variable" -> (pfx + "SELECT ? WHERE { ?x :p ?y }"),
    "FILTER without parens" -> (pfx + "SELECT ?x WHERE { ?x :p ?y FILTER }"),
    "BIND without AS" -> (pfx + "SELECT ?x WHERE { BIND(1 ?x) }"),
    "VALUES arity mismatch is a parse-time shape" ->
      (pfx + "SELECT ?x WHERE { VALUES (?a ?b) { (1) } }"),
    "cast with two args" ->
      ("PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n" + pfx +
        "SELECT ?r WHERE { ?x :p ?y . BIND(xsd:integer(?y, 2) AS ?r) }"),
    "unclosed embedded triple" ->
      (pfx + "SELECT ?x WHERE { << ?x :p ?y :q ?z }"),
    "ORDER BY garbage" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y } ORDER BY 😀"),
    "double dot in triples block" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y . . ?y :q ?z }"),
    "SERVICE without group" ->
      (pfx + "SELECT ?x WHERE { SERVICE <http://e/> ?x :p ?y }"),
    "BIND rebinding an in-scope variable" ->
      (pfx + "SELECT ?y WHERE { ?x :p ?y . BIND(1 AS ?y) }"),
    // --- probe wave 4 (r10): grammar corners ---
    "negated property set over a sequence" ->
      (pfx + "SELECT ?x WHERE { ?x !(:p/:q) ?y }"),
    "negated property set with modifier inside" ->
      (pfx + "SELECT ?x WHERE { ?x !(:p*) ?y }"),
    "double path inverse" -> (pfx + "SELECT ?x WHERE { ?x ^^:p ?y }"),
    "empty path group" -> (pfx + "SELECT ?x WHERE { ?x () ?y }"),
    "GROUP_CONCAT unknown modifier keyword" ->
      (pfx + "SELECT (GROUP_CONCAT(?n; FOO=\"|\") AS ?c) WHERE { ?x :n ?n }"),
    "GROUP_CONCAT separator without semicolon" ->
      (pfx + "SELECT (GROUP_CONCAT(?n SEPARATOR=\"|\") AS ?c) WHERE { ?x :n ?n }"),
    "GROUP_CONCAT non-string separator" ->
      (pfx + "SELECT (GROUP_CONCAT(?n; SEPARATOR=5) AS ?c) WHERE { ?x :n ?n }"),
    "GROUP_CONCAT two expressions" ->
      (pfx + "SELECT (GROUP_CONCAT(?n, ?m) AS ?c) WHERE { ?x :n ?n }"),
    "invalid PN_LOCAL_ESC char" ->
      (pfx + "SELECT ?y WHERE { :a\\xb :p ?y }"),
    "invalid percent in local name" ->
      (pfx + "SELECT ?y WHERE { :a%2zb :p ?y }"),
    "DESCRIBE with no resource" -> (pfx + "DESCRIBE FROM <http://g/1>"),
    "dataset clause after WHERE" ->
      (pfx + "DESCRIBE ?x WHERE { ?x :p ?o } FROM <http://g/1>"),
    // --- probe wave 5 (r10): aggregate scope, ORDER BY conditions,
    // §19.6 bnode labels, case-sensitive `a`, VALUES data terms ---
    "ungrouped variable in HAVING" ->
      (pfx + "SELECT ?x (SUM(?y) AS ?s) WHERE { ?x :p ?y . ?x :q ?z } " +
        "GROUP BY ?x HAVING(?z > 1)"),
    "ungrouped variable in ORDER BY under GROUP BY" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y } GROUP BY ?x ORDER BY ?y"),
    "ORDER BY bare integer" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y } ORDER BY 1"),
    "ORDER BY boolean literal" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y } ORDER BY true"),
    "blank node label reused across sibling groups" ->
      (pfx + "SELECT ?v WHERE { { _:b :p ?v } { _:b :q ?v } }"),
    "blank node label reused across OPTIONAL" ->
      (pfx + "SELECT ?v WHERE { _:b :p ?v OPTIONAL { ?v :q ?w } _:b :r ?z }"),
    "uppercase A as the type keyword" ->
      (pfx + "SELECT ?x WHERE { ?x A ?y }"),
    "VALUES with variable in data row" ->
      (pfx + "SELECT * WHERE { VALUES ?a { ?b } }"),
    "VALUES with blank node in data row" ->
      (pfx + "SELECT * WHERE { VALUES ?a { _:b } }"),
    // --- probe wave 12 (r10): expression grammar ---
    "chained relational comparison" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y FILTER(1 < 2 < 3) }"),
    "IF with two arguments" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y FILTER(IF(true, 1) = 1) }"),
    "STRLEN with no arguments" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y FILTER(STRLEN() = 0) }"),
    "REPLACE with two arguments" ->
      (pfx + "SELECT (REPLACE(?y, \"a\") AS ?r) WHERE { ?x :p ?y }"),
    // --- probe wave 15 (r11): first-char strictness ---
    "prefix declared starting with a digit" ->
      ("PREFIX 1a: <http://x/>\nSELECT ?x WHERE { ?x 1a:p 1 }"),
    "prefix declared starting with an underscore" ->
      ("PREFIX _a: <http://x/>\nSELECT ?x WHERE { ?x _a:p 1 }"),
    "prefix name split from its colon" ->
      ("PREFIX ab : <http://x/>\nSELECT ?x WHERE { ?x ab:p 1 }"),
    "variable starting with a combining mark" ->
      (pfx + "SELECT ?̀x WHERE { ?̀x :p 1 }"),
    "blank node label starting with a dash" ->
      (pfx + "SELECT ?x WHERE { _:-a :p ?x }"),
    "local name starting with a dash strands the dash" ->
      (pfx + "SELECT ?x WHERE { ?x :-p 1 }"),
    // --- probe waves 16-17 (r11) ---
    "CONSTRUCT short form without WHERE" ->
      (pfx + "CONSTRUCT FROM <http://g/> { ?s :p ?o }"),
    "VALUES with a repeated variable" ->
      (pfx + "SELECT ?a WHERE { VALUES (?a ?a) { (1 2) } }"),
    "GRAPH with a literal name" ->
      (pfx + "SELECT ?x WHERE { GRAPH \"g\" { ?x :p 1 } }"),
    "property path in a CONSTRUCT template" ->
      (pfx + "CONSTRUCT { ?s :p/:q ?o } WHERE { ?s :p ?o }"),
    // --- probe wave 22 (r11): solution-modifier order is fixed ---
    "duplicate LIMIT clause" ->
      (pfx + "SELECT ?x WHERE { ?x :p 1 } LIMIT 3 LIMIT 4"),
    "negative LIMIT" -> (pfx + "SELECT ?x WHERE { ?x :p 1 } LIMIT -1"),
    "ORDER BY after LIMIT" ->
      (pfx + "SELECT ?x WHERE { ?x :p 1 } LIMIT 3 ORDER BY ?x"),
    "ORDER BY before HAVING" ->
      (pfx + "SELECT (COUNT(*) AS ?n) WHERE { ?x :p ?y } GROUP BY ?x " +
        "ORDER BY ?n HAVING (?n > 0)"),
    "FROM after WHERE" ->
      (pfx + "SELECT ?x WHERE { ?x :p 1 } FROM <http://g/>"),
    "IN list with a trailing comma" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y FILTER(?y IN (1, 2,)) }"),
    // --- probe wave 25 (r11): keyword-adjacent unicode positions ---
    "variable starting with a middle dot" ->
      (pfx + "SELECT ?·a WHERE { ?·a :p 1 }"),
    "variable with a dash strands an expression" ->
      (pfx + "SELECT ?a-b WHERE { ?a-b :p 1 }"),
    "variable with an interior dot" ->
      (pfx + "SELECT ?a.b WHERE { ?a.b :p 1 }"),
    "astral char beyond PN_CHARS_BASE (U+F0000) in a variable" ->
      (pfx + "SELECT ?󰀀x WHERE { ?󰀀x :p 1 }"),
    "language tag with a non-ASCII letter" ->
      (pfx + "SELECT ?x WHERE { ?x :p \"v\"@ab中 }"),
    // --- probe wave 26 (r11): aggregate projection scope, NPS shape,
    // removed path quantifiers ---
    "SELECT * under GROUP BY" ->
      (pfx + "SELECT * WHERE { ?x :p ?y } GROUP BY ?x"),
    "ungrouped variable projected under GROUP BY" ->
      (pfx + "SELECT ?y WHERE { ?x :p ?y } GROUP BY ?x"),
    "path quantifier braces (not in SPARQL 1.1)" ->
      (pfx + "SELECT ?x WHERE { ?x :p{2} ?y }"),
    "empty negated property set" ->
      (pfx + "SELECT ?x WHERE { ?x !() ?y }"),
    "literal inside a negated property set" ->
      (pfx + "SELECT ?x WHERE { ?x !(:p|\"v\") ?y }"),
    "GROUP BY with no condition" ->
      (pfx + "SELECT (COUNT(*) AS ?n) WHERE { ?x :p ?y } GROUP BY"),
    "aggregate inside BIND" ->
      (pfx + "SELECT ?x WHERE { ?x :p ?y BIND(COUNT(*) AS ?n) }"))

  private val badUpdates = Seq(
    "INSERT DATA with variable" ->
      (pfx + "INSERT DATA { ?x :p :b }"),
    "DELETE without template or WHERE" -> (pfx + "DELETE"),
    "CLEAR without target" -> (pfx + "CLEAR"),
    "COPY missing TO" -> (pfx + "COPY GRAPH <urn:a> GRAPH <urn:b>"),
    "update trailing garbage" ->
      (pfx + "INSERT DATA { :a :p :b } nonsense"),
    "unknown op" -> (pfx + "FROBNICATE GRAPH <urn:a>"),
    "WITH on INSERT DATA" ->
      (pfx + "WITH <urn:g> INSERT DATA { :a :p :b }"),
    "WITH without DELETE or INSERT" -> (pfx + "WITH <urn:g> CLEAR ALL"),
    "USING before the template" ->
      (pfx + "INSERT USING <urn:g> { :a :p :b } WHERE { ?s :q ?o }"),
    "quad data with variable graph" ->
      (pfx + "INSERT DATA { GRAPH ?g { :a :p :b } }"),
    // --- probe wave 11 (r10): quad-block shape, WITH cardinality ---
    "nested GRAPH blocks in quad data" ->
      (pfx + "INSERT DATA { GRAPH <urn:g1> { GRAPH <urn:g2> { :a :p 1 } } }"),
    "GRAPH without braces in quad data" ->
      (pfx + "INSERT DATA { GRAPH <urn:g1> :a :p 1 }"),
    "duplicate WITH clause" ->
      (pfx + "WITH <urn:g1> WITH <urn:g2> DELETE { ?s :p ?o } " +
        "WHERE { ?s :p ?o }"))

  for ((name, q) <- badQueries)
    test(s"negative query syntax: $name") {
      intercept[Exception](SparqlParser.parse(q))
    }

  for ((name, u) <- badUpdates)
    test(s"negative update syntax: $name") {
      intercept[Exception](SparqlParser.parseUpdateText(u))
    }
}
