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

  for (name <- GoldenGen.names) {
    test(s"golden: $name matches committed sf0.001 output") {
      val expected = Files.readString(Paths.get(
        getClass.getResource(s"/golden/$name.golden").toURI))
      val got = GoldenGen.canon(SparkEntry.queries(name)(spark, sf))
      assert(got == expected,
        s"$name drifted from golden output — if intentional, regenerate " +
          "with graft.tools.GoldenGen and review the diff")
    }
  }
}
