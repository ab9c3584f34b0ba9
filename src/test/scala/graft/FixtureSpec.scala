package graft

import java.io.File
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{RdfIO, Results}
import graft.parser.SparqlParser

/** Reference-style golden fixtures (FIXTURES.md §C; mirrors the W3C
  * rdf-tests layout the reference's testsuite/ consumes): each case dir
  * holds data.nt + query.rq + expected.tsv (W3C TSV results). Ordered
  * queries (ORDER BY) compare exact row order; others compare as
  * multisets.
  */
class FixtureSpec extends AnyFunSuite {
  import TestSpark._

  private val root = new File(getClass.getResource("/sparql").toURI)

  for (dir <- root.listFiles().filter(_.isDirectory).sortBy(_.getName)) {
    test(s"fixture: ${dir.getName}") {
      val query = Files.readString(Paths.get(dir.getPath, "query.rq"))
      val expected = Files.readString(Paths.get(dir.getPath, "expected.tsv"))
      val quads = RdfIO.readNTriples(spark, s"${dir.getPath}/data.nt")
      val got = Results.toTsv(SparqlParser.execute(query, quads))
      val ordered = query.toUpperCase.contains("ORDER BY")
      def rows(s: String): Seq[String] =
        s.split("\r\n").toSeq.filter(_.nonEmpty)
      val (g, e) = (rows(got), rows(expected))
      assert(g.head == e.head, s"header mismatch: ${g.head} vs ${e.head}")
      if (ordered) assert(g == e, s"ordered rows differ:\ngot  $g\nwant $e")
      else assert(g.tail.sorted == e.tail.sorted,
        s"row multisets differ:\ngot  ${g.tail.sorted}\nwant ${e.tail.sorted}")
    }
  }
}
