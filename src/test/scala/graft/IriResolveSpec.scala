package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.IriResolve.resolve

/** RFC 3986 §5.4 reference-resolution examples (normal + abnormal),
  * verbatim — the shared resolver backs BASE handling in the SPARQL,
  * Turtle/TriG, RDF/XML, and JSON-LD parsers.
  */
class IriResolveSpec extends AnyFunSuite {
  private val base = "http://a/b/c/d;p?q"

  private val normal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  private val abnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y")

  test("RFC 3986 §5.4.1 normal examples") {
    for ((ref, want) <- normal)
      assert(resolve(base, ref) == want, s"resolve($base, $ref)")
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    for ((ref, want) <- abnormal)
      assert(resolve(base, ref) == want, s"resolve($base, $ref)")
  }

  test("corner bases: no authority, empty path, urn schemes") {
    // scheme-without-authority references are absolute, never merged
    assert(resolve("http://b/doc", "urn:uuid:1") == "urn:uuid:1")
    // authority + empty path: merge starts at "/"
    assert(resolve("http://h", "g") == "http://h/g")
    // empty base leaves the reference alone (no-BASE parser behavior)
    assert(resolve("", "a/b") == "a/b")
    // base with a trailing slash keeps the directory
    assert(resolve("http://b/dir/", "a") == "http://b/dir/a")
    assert(resolve("http://b/dir/", "../a") == "http://b/a")
  }
}
