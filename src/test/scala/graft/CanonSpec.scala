package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.RdfIO
import graft.model.{Canon, Term}

/** Blank-node canonicalization: relabeling invariance, orbit stability,
  * component separation — the guarantees golden-dataset comparison and
  * isomorphism checks lean on.
  */
class CanonSpec extends AnyFunSuite {
  import TestSpark._

  private def nq(lines: String*): DataFrame = {
    val f = Files.createTempFile("canon", ".nq")
    Files.writeString(f, lines.mkString("", " .\n", " .\n"))
    RdfIO.readNQuads(spark, f.toString)
  }

  private def lines(df: DataFrame): Seq[String] =
    df.select(concat(
      RdfIO.formatTerm(col("s")), lit(" "),
      RdfIO.formatTerm(col("p")), lit(" "),
      RdfIO.formatTerm(col("o")),
      when(col("g")("kind") === Term.DefaultGraphKind, lit(""))
        .otherwise(concat(lit(" "), RdfIO.formatTerm(col("g")))))
      .as("v")).collect().map(_.getString(0)).sorted.toSeq

  test("relabeling invariance: bnode chain + branches canonicalize equally") {
    val a = nq(
      "_:a <http://x/p> _:b", "_:b <http://x/p> _:c",
      "_:c <http://x/v> \"leaf\"", "_:a <http://x/r> \"root\"",
      "<http://x/s> <http://x/q> _:b")
    val b = nq( // same shape, scrambled labels
      "_:z <http://x/p> _:k", "_:k <http://x/p> _:m",
      "_:m <http://x/v> \"leaf\"", "_:z <http://x/r> \"root\"",
      "<http://x/s> <http://x/q> _:k")
    val ca = lines(Canon.canonicalize(a))
    val cb = lines(Canon.canonicalize(b))
    assert(ca == cb)
    assert(ca.size == 5)
    // distinct bnodes stay distinct under canonical labels
    val labels = Canon.canonicalize(a)
      .select(explode(array(col("s"), col("o"))).as("t"))
      .where(col("t")("kind") === Term.BlankKind)
      .select(col("t")("lex")).distinct().count()
    assert(labels == 3, s"expected 3 canonical labels, got $labels")
  }

  test("ground quads pass through unchanged") {
    val g = nq(
      "<http://x/s> <http://x/p> \"v\"",
      "<http://x/s> <http://x/p> <http://x/o> <http://x/g>")
    assert(lines(Canon.canonicalize(g)) == lines(g))
  }

  test("automorphic 2-cycle: stable across relabelings") {
    val a = nq("_:a <http://x/p> _:b", "_:b <http://x/p> _:a")
    val b = nq("_:q <http://x/p> _:r", "_:r <http://x/p> _:q")
    assert(lines(Canon.canonicalize(a)) == lines(Canon.canonicalize(b)))
    assert(lines(Canon.canonicalize(a)).size == 2)
  }

  test("isomorphic disjoint components keep distinct labels (no merge)") {
    val a = nq(
      "_:a <http://x/p> \"x\"", "_:b <http://x/p> \"x\"",
      "_:c <http://x/p> \"x\"")
    val ca = Canon.canonicalize(a)
    assert(ca.count() == 3, "quads must not merge under canonical labels")
    val distinctLabels = ca.select(col("s")("lex")).distinct().count()
    assert(distinctLabels == 3)
    // and the canonical form is still relabeling-invariant
    val b = nq(
      "_:p <http://x/p> \"x\"", "_:q <http://x/p> \"x\"",
      "_:r <http://x/p> \"x\"")
    assert(lines(ca) == lines(Canon.canonicalize(b)))
  }

  test("bnode graph names are canonicalized too") {
    val a = nq("<http://x/s> <http://x/p> _:g1", "<http://x/s2> <http://x/p2> <http://x/o> _:g1")
    val b = nq("<http://x/s> <http://x/p> _:h9", "<http://x/s2> <http://x/p2> <http://x/o> _:h9")
    assert(lines(Canon.canonicalize(a)) == lines(Canon.canonicalize(b)))
  }

  test("isomorphic(): relabeled copies yes, different shapes no") {
    val chain2 = nq("_:a <http://x/p> _:b", "_:b <http://x/p> \"end\"")
    val chain2r = nq("_:m <http://x/p> _:n", "_:n <http://x/p> \"end\"")
    val chain3 = nq("_:a <http://x/p> _:b", "_:b <http://x/p> _:c",
      "_:c <http://x/p> \"end\"")
    assert(Canon.isomorphic(chain2, chain2r))
    assert(!Canon.isomorphic(chain2, chain3))
  }

  test("fuzz: canonicalization is invariant under random bnode " +
      "relabelings (incl. bnode graph names)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val labels = Vector("b0", "b1", "b2", "b3", "b4", "b5")
    val genTerm: Gen[String] = Gen.frequency(
      2 -> Gen.choose(0, 3).map(n => s"<http://x/i$n>"),
      4 -> Gen.oneOf(labels).map("_:" + _),
      1 -> Gen.choose(0, 2).map(n => "\"v" + n + "\""))
    val genQuad: Gen[String] = for {
      s <- genTerm.suchThat(!_.startsWith("\""))
      p <- Gen.choose(0, 2).map(n => s"<http://x/p$n>")
      o <- genTerm
      g <- Gen.frequency(3 -> Gen.const(""),
        1 -> Gen.oneOf(labels).map(" _:" + _),
        1 -> Gen.const(" <http://x/g>"))
    } yield s"$s $p $o$g"
    val genDoc: Gen[List[String]] =
      Gen.chooseNum(1, 14).flatMap(Gen.listOfN(_, genQuad))
    val prop = Prop.forAllNoShrink(
      genDoc, Gen.const(()).flatMap(_ => Gen.oneOf(
        labels.permutations.toSeq.take(720)))) { (doc, perm) =>
      val mapping = labels.zip(perm).toMap
      val relabeled = doc.map(q => labels.foldLeft(q)((acc, l) =>
        acc.replace("_:" + l + " ", "_:" + mapping(l) + "X ")
          .replaceAll("_:" + l + "$", "_:" + mapping(l) + "X")))
      val (ca, cb) =
        (lines(Canon.canonicalize(nq(doc: _*))),
          lines(Canon.canonicalize(nq(relabeled: _*))))
      if (ca != cb)
        println(s"CANON MISMATCH\ndoc=$doc\nrelabeled=$relabeled\n" +
          s"ca=$ca\ncb=$cb")
      ca == cb
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(
        sys.env.getOrElse("GRAFT_FUZZ_N", "25").toInt), prop)
    assert(result.passed, s"canon fuzz failed: ${result.status}")
  }
}
