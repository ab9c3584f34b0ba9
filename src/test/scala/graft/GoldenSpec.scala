package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GoldenGen

/** Byte-exact golden outputs for the no_oracle gate queries: the specs
  * elsewhere assert bounds (sketch error, ANN recall); this one fails
  * loudly if a hash path changes at all. Regenerate intentionally with
  *   runMain graft.tools.GoldenGen /root/testdata/sf0.001 src/test/resources/golden
  * and review the diff like any other semantic change.
  */
class GoldenSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, mk) <- GoldenGen.raws) {
    test(s"golden: $name matches committed sf0.001 output") {
      val expected = Files.readString(Paths.get(
        getClass.getResource(s"/golden/$name.golden").toURI))
      val got = GoldenGen.canon(mk(spark, sf))
      assert(got == expected,
        s"$name drifted from golden output — if intentional, regenerate " +
          "with graft.tools.GoldenGen and review the diff")
    }
  }

  test("golden: q25_kll_quantiles estimates inside committed rank bounds") {
    // KLL compaction is irreducibly randomized (DataSketches uses
    // ThreadLocalRandom), so this golden is a BOUNDS file: exact sorted-
    // input values at rank (q ± slack)·n. Every legitimate coin sequence
    // and merge order lands inside; a broken merge/serialization path
    // lands far outside.
    val lines = Files.readString(Paths.get(
      getClass.getResource("/golden/q25_kll_quantiles.golden").toURI))
      .linesIterator.filterNot(l => l.startsWith("#") || l.isEmpty).toSeq
    val bounds = lines.drop(1).map { l =>
      val c = l.split("\t")
      c(0) -> (c(2).toDouble, c(3).toDouble, c(4).toDouble, c(5).toDouble)
    }.toMap
    val got = graft.queries.Extra.rawKll(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == bounds.keySet, "return-flag set drifted")
    got.foreach { case (f, q50, q90) =>
      val (l50, h50, l90, h90) = bounds(f)
      assert(q50 >= l50 && q50 <= h50,
        s"$f q50=$q50 outside committed bounds [$l50,$h50]")
      assert(q90 >= l90 && q90 <= h90,
        s"$f q90=$q90 outside committed bounds [$l90,$h90]")
    }
  }
}
