package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Splittable Turtle ingestion (SURVEY §2.1 v2): chunked parse parity
  * against the sequential whole-file parser on a multi-MB document,
  * boundary-detection unit corners, and the safety fallback.
  */
class TurtleSplitSpec extends AnyFunSuite {
  import TestSpark._

  test("endsStatement: boundary corners") {
    assert(TurtleSplit.endsStatement(":s :p :o ."))
    assert(TurtleSplit.endsStatement(":s :p 1.")) // int + statement dot
    assert(TurtleSplit.endsStatement(""":s :p "x.y" ."""))
    assert(TurtleSplit.endsStatement(":s :p :o . # trailing comment"))
    assert(TurtleSplit.endsStatement(":s :p <http://x/a.b> ."))
    assert(TurtleSplit.endsStatement("@prefix p: <http://x#> ."))
    assert(TurtleSplit.endsStatement(":s :p << :a :b \"#c\" >> ."))
    assert(!TurtleSplit.endsStatement(":s :p :o ;"))
    assert(!TurtleSplit.endsStatement(":s :p 1.5"))
    assert(!TurtleSplit.endsStatement(""":s :p "ends with dot.""""))
    assert(!TurtleSplit.endsStatement(":s :p :a\\.")) // escaped PN dot
    assert(!TurtleSplit.endsStatement("# just a comment ."))
    assert(!TurtleSplit.endsStatement(""))
  }

  /** A multi-MB document with prefixed names, IRIs with dots, strings
    * containing dots/hashes/semicolons, comments, anonymous + labeled
    * bnodes, predicate/object lists, and typed/lang literals.
    */
  private def bigDoc(n: Int): String = {
    val sb = new StringBuilder
    sb.append("@prefix ex: <http://example.org/v#> .\n")
    sb.append("@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n")
    sb.append("# header comment\n")
    (0 until n).foreach { i =>
      sb.append(s"ex:s$i ex:p ex:o$i ; ex:q ${"\"" + s"dot. #hash; $i" +
        "\""}@en .\n")
      sb.append(s"ex:s$i ex:n ${i % 97}.5 . # c$i\n")
      sb.append(s"<http://example.org/a.b/$i> ex:w " +
        s"${"\"" + i + "\""}^^xsd:integer .\n")
      if (i % 50 == 0)
        sb.append(s"ex:s$i ex:anon [ ex:inner ${i} ] .\n")
      if (i % 77 == 0)
        sb.append(s"_:shared ex:seen ex:s$i .\n")
    }
    sb.result()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    // anonymous bnode labels differ by construction between the two
    // parsers — compare with generated labels normalized (labeled
    // bnodes like _:shared keep their document-scoped label)
    def norm(c: org.apache.spark.sql.Column) =
      when(c("kind") === graft.model.Term.BlankKind &&
        c("lex").startsWith("tb"), lit("tbANON")).otherwise(c("lex"))
    df.select(concat_ws("|", col("s")("kind"), norm(col("s")),
      col("p")("lex"), col("o")("kind"), norm(col("o")),
      coalesce(col("o")("dt"), lit("")),
      coalesce(col("o")("lang"), lit("")))
      .as("v")).collect().map(_.getString(0)).sorted.toSeq
  }

  test("chunked parse parity with the whole-file parser on a multi-MB " +
    "document; anonymous-bnode counts preserved") {
    val d = Files.createTempDirectory("tsplit")
    val f = d.resolve("big.ttl")
    Files.writeString(f, bigDoc(12000))
    assert(Files.size(f) > (1L << 20), "test doc not big enough")
    val split = TurtleSplit.readSplit(spark, f.toString)
    assert(split.isDefined, "safety scan wrongly disqualified the doc")
    val seq = {
      import spark.implicits._
      spark.sparkContext.wholeTextFiles(f.toString)
        .flatMap { case (_, c) => new TurtleParser(c).parse() }.toDF()
    }
    val (a, b) = (canon(split.get), canon(seq))
    assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
    assert(a == b, "chunked parse diverged from the sequential parse")
    // distinct anonymous bnodes must match too (no cross-chunk merges)
    import org.apache.spark.sql.functions._
    def anonCount(df: org.apache.spark.sql.DataFrame) =
      df.where(col("s")("kind") === graft.model.Term.BlankKind &&
        col("s")("lex").startsWith("tb"))
        .select(countDistinct(col("s")("lex"))).head.getLong(0)
    assert(anonCount(split.get) == anonCount(seq))
  }

  test("the public read() splits big files and still reads small ones") {
    val d = Files.createTempDirectory("tsplit2")
    Files.writeString(d.resolve("big.ttl"), bigDoc(6000))
    Files.writeString(d.resolve("small.ttl"),
      "@prefix ex: <http://example.org/v#> .\nex:a ex:b ex:c .\n")
    spark.conf.set("graft.turtle.splitThreshold", "65536")
    try {
      val got = TurtleSplit.read(spark, d.toString)
      val seq = {
        import spark.implicits._
        spark.sparkContext.wholeTextFiles(d.toString + "/*.ttl")
          .flatMap { case (_, c) => new TurtleParser(c).parse() }.toDF()
      }
      assert(canon(got) == canon(seq))
    } finally spark.conf.unset("graft.turtle.splitThreshold")
  }

  test("isDirectiveLine: keyword needs a token boundary") {
    assert(TurtleSplit.isDirectiveLine("@prefix ex: <http://x#> ."))
    assert(TurtleSplit.isDirectiveLine("  PREFIX ex: <http://x#>"))
    assert(TurtleSplit.isDirectiveLine("base <http://x/>"))
    assert(TurtleSplit.isDirectiveLine("BASE <http://x/>"))
    assert(TurtleSplit.isDirectiveLine("BASE<http://x/>")) // adjacent IRI
    // Turtle 1.2 version directives
    assert(TurtleSplit.isDirectiveLine("""@version "1.2" ."""))
    assert(TurtleSplit.isDirectiveLine("""VERSION "1.2""""))
    assert(TurtleSplit.isDirectiveLine("""version"1.2""""))
    // subjects that merely START with the keyword chars are content
    assert(!TurtleSplit.isDirectiveLine("base:a :p :o ."))
    assert(!TurtleSplit.isDirectiveLine("baseline:x :p :o ."))
    assert(!TurtleSplit.isDirectiveLine("prefix:x :p :o ."))
    assert(!TurtleSplit.isDirectiveLine("prefixes:x :p :o ."))
    assert(!TurtleSplit.isDirectiveLine("version:x :p :o ."))
    assert(!TurtleSplit.isDirectiveLine("versioned:x :p :o ."))
  }

  test("keyword-prefixed subjects split-parse without duplication") {
    val d = Files.createTempDirectory("tsplit4")
    val sb = new StringBuilder
    sb.append("@prefix base: <http://example.org/b#> .\n")
    sb.append("@prefix baseline: <http://example.org/l#> .\n")
    sb.append("@prefix prefix: <http://example.org/p#> .\n")
    (0 until 9000).foreach { i =>
      sb.append(s"base:a$i base:p base:o$i .\n")
      sb.append(s"baseline:x$i baseline:p $i .\n")
      sb.append(s"prefix:y$i prefix:p prefix:z$i .\n")
    }
    val f = d.resolve("kw.ttl")
    Files.writeString(f, sb.result())
    val split = TurtleSplit.readSplit(spark, f.toString)
    assert(split.isDefined)
    val seq = {
      import spark.implicits._
      spark.sparkContext.wholeTextFiles(f.toString)
        .flatMap { case (_, c) => new TurtleParser(c).parse() }.toDF()
    }
    assert(split.get.count() == 27000)
    assert(canon(split.get) == canon(seq))
  }

  test("anonymous bnodes from different files never unify") {
    import org.apache.spark.sql.functions._
    def doc(n: Int) = {
      val sb = new StringBuilder("@prefix ex: <http://x#> .\n")
      (0 until n).foreach(i => sb.append(s"ex:s$i ex:anon [ ex:v $i ] .\n"))
      sb.result()
    }
    def anonLabels(df: org.apache.spark.sql.DataFrame) =
      df.where(col("s")("kind") === graft.model.Term.BlankKind)
        .select(col("s")("lex")).collect().map(_.getString(0)).toSet
    // small pair (whole-file path) and big pair (split path)
    for ((n, thr) <- Seq((40, "1048576"), (9000, "65536"))) {
      val d = Files.createTempDirectory("tsplit5")
      Files.writeString(d.resolve("one.ttl"), doc(n))
      Files.writeString(d.resolve("two.ttl"), doc(n))
      spark.conf.set("graft.turtle.splitThreshold", thr)
      try {
        val got = TurtleSplit.read(spark, d.toString)
        val labels = anonLabels(got)
        assert(labels.size == 2 * n,
          s"expected ${2 * n} distinct anonymous bnodes, got ${labels.size}")
      } finally spark.conf.unset("graft.turtle.splitThreshold")
    }
  }

  /** A multi-MB TriG document: named-graph blocks (IRI, pname, GRAPH
    * keyword, default `{` block), bare default-graph statements between
    * blocks, blocks large enough to span many partitions.
    */
  private def bigTrig(n: Int): String = {
    val sb = new StringBuilder
    sb.append("@prefix ex: <http://example.org/v#> .\n")
    sb.append("ex:pre ex:p ex:o0 .\n") // bare default-graph statement
    sb.append("ex:g1 {\n") // pname-labeled block spanning partitions
    (0 until n).foreach(i => sb.append(s"ex:a$i ex:p ex:b$i .\n"))
    sb.append("}\n")
    sb.append("<http://example.org/g2> {\n")
    (0 until n).foreach(i =>
      sb.append(s"ex:c$i ex:q ${"\"" + s"v{$i}" + "\""} .\n"))
    sb.append("}\n")
    sb.append("GRAPH ex:g3 {\n")
    (0 until n / 2).foreach(i => sb.append(s"ex:d$i ex:r $i .\n"))
    sb.append("}\n")
    sb.append("{\n") // anonymous default-graph block
    (0 until n / 4).foreach(i => sb.append(s"ex:e$i ex:s ex:f$i .\n"))
    sb.append("}\n")
    sb.append("ex:post ex:p ex:o1 .\n")
    sb.result()
  }

  test("TriG chunked parse parity: graph context survives partition " +
    "splits (blocks larger than one partition)") {
    val d = Files.createTempDirectory("tsplit-trig")
    val f = d.resolve("big.trig")
    Files.writeString(f, bigTrig(20000))
    assert(Files.size(f) > (1L << 20))
    val split = TurtleSplit.readSplit(spark, f.toString)
    assert(split.isDefined, "safety scan wrongly disqualified the TriG doc")
    val seq = {
      import spark.implicits._
      spark.sparkContext.wholeTextFiles(f.toString)
        .flatMap { case (_, c) => new TurtleParser(c).parse() }.toDF()
    }
    import org.apache.spark.sql.functions._
    def canonQ(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(concat_ws("|", col("g")("kind"),
        coalesce(col("g")("lex"), lit("")), col("s")("lex"),
        col("p")("lex"), col("o")("kind"), col("o")("lex"))
        .as("v")).collect().map(_.getString(0)).sorted.toSeq
    val (a, b) = (canonQ(split.get), canonQ(seq))
    assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
    assert(a == b, "TriG chunked parse diverged from the sequential parse")
  }

  test("TriG safety fallback: inline one-liner blocks and unclosed " +
    "blocks disqualify; read() still parses via whole-file") {
    val d = Files.createTempDirectory("tsplit-trig2")
    val inline = d.resolve("inline.trig")
    Files.writeString(inline,
      "@prefix ex: <http://x#> .\nex:g { ex:a ex:b ex:c . }\n" +
        "ex:g2 {\nex:d ex:e ex:f .\n}\n")
    assert(TurtleSplit.readSplit(spark, inline.toString).isEmpty)
    spark.conf.set("graft.turtle.splitThreshold", "1")
    try assert(TurtleSplit.read(spark, inline.toString).count() == 2)
    finally spark.conf.unset("graft.turtle.splitThreshold")
  }

  test("safety fallback: long strings, mid-file directives " +
    "disqualify; read() still parses correctly via whole-file") {
    val d = Files.createTempDirectory("tsplit3")
    val longStr = d.resolve("long.ttl")
    Files.writeString(longStr,
      "@prefix ex: <http://x#> .\nex:a ex:b \"\"\"multi\nline.\n\"\"\" .\n")
    assert(TurtleSplit.readSplit(spark, longStr.toString).isEmpty)
    val midDirective = d.resolve("mid.ttl")
    Files.writeString(midDirective,
      "@prefix ex: <http://x#> .\nex:a ex:b ex:c .\n" +
        "@prefix zz: <http://y#> .\nzz:a zz:b zz:c .\n")
    assert(TurtleSplit.readSplit(spark, midDirective.toString).isEmpty)
    spark.conf.set("graft.turtle.splitThreshold", "1")
    try {
      assert(TurtleSplit.read(spark, longStr.toString).count() == 1)
      assert(TurtleSplit.read(spark, midDirective.toString).count() == 2)
    } finally spark.conf.unset("graft.turtle.splitThreshold")
  }
}
