package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Term

/** Splittable Turtle ingestion (SURVEY §2.1 v2): a single multi-GB
  * Turtle document parses with split-level parallelism instead of one
  * `wholeTextFiles` task — the remaining big-ingest parity gap for
  * 100 TB loads (N-Triples/N-Quads have streamed + split since r8).
  *
  * Two-pass scheme per large file:
  *
  *  1. '''Directive + safety scan''' (one distributed pass over lines):
  *     collect `@prefix`/`@base`/`PREFIX`/`BASE` lines in order and
  *     decide splittability. The file falls back to the sequential
  *     whole-file parser when anything order- or state-dependent
  *     appears: long (triple-quoted) strings — the only lexical form
  *     that lets a line start inside a string; `{`/`}` anywhere (TriG
  *     blocks carry a graph context chunks cannot see; braces inside
  *     literals are indistinguishable without full lexing, so they
  *     disqualify conservatively); a directive after the first
  *     statement, a multi-line directive, or a redefined prefix (the
  *     collected header would misresolve earlier/later uses).
  *
  *  2. '''Chunked parse''': `textFile` splits the file into contiguous
  *     byte-range partitions. Within each partition, lines between the
  *     first and last STATEMENT BOUNDARY parse locally with the pass-1
  *     directive header prepended; the fragments before the first and
  *     after the last boundary (partial statements crossing partition
  *     edges, possibly chaining through boundary-less partitions) are
  *     tiny — one statement each — and stitch + parse driver-side.
  *
  * A statement boundary is a line whose last code character (strings
  * respected, IRI/quoted-triple brackets respected, comments stripped)
  * is an unescaped `.` — sound for documents with no long strings:
  * single-quoted strings cannot contain raw newlines, so line-local
  * lexing never starts mid-string, and `.` can end a line's code only
  * as a statement terminator (decimal digits, PN_LOCAL dots and IRI
  * dots are never line-final code: PN_LOCAL cannot END with an
  * unescaped dot, IRIREFs end with `>`).
  *
  * Labeled bnodes (`_:x`) are document-scoped and unify across chunks;
  * ANONYMOUS bnode labels are disambiguated per chunk via the parser's
  * `bnodeTag`.
  */
object TurtleSplit {

  /** Files at or below this size parse whole-file (task-per-file is
    * already parallel across many small files; splitting only pays on
    * big documents). Override with `graft.turtle.splitThreshold`.
    */
  val DefaultSplitThreshold: Long = 8L << 20

  /** Last/second-to-last non-whitespace CODE characters of a line:
    * tracks single-line strings (escape-aware), `<`…`>` bracket depth
    * (IRIREFs and `<<`…`>>` quoted triples, where `#` is not a
    * comment), and `#` comments. Returns true iff the line ends, code-
    * wise, with an unescaped `.` — a statement boundary in documents
    * with no long strings.
    */
  private[io] def endsStatement(line: String): Boolean = {
    var i = 0
    var inStr: Char = 0 // 0 = outside, else the quote char
    var depth = 0 // <...> nesting (IRIREF / quoted triple)
    var last: Char = 0
    var prev: Char = 0
    var done = false
    while (i < line.length && !done) {
      val c = line(i)
      if (inStr != 0) {
        if (c == '\\') i += 1 // skip the escaped char
        else if (c == inStr) { inStr = 0; prev = last; last = c }
        else { prev = last; last = c }
      } else c match {
        case '"' | '\'' => inStr = c; prev = last; last = c
        case '#' if depth == 0 => done = true // comment to EOL
        case '<' => depth += 1; prev = last; last = c
        case '>' => if (depth > 0) depth -= 1; prev = last; last = c
        case w if w.isWhitespace => // whitespace: not code
        case other => prev = last; last = other
      }
      i += 1
    }
    last == '.' && prev != '\\'
  }

  /** First non-ws token is a Turtle directive keyword. */
  private[io] def isDirectiveLine(line: String): Boolean = {
    val t = line.dropWhile(_.isWhitespace)
    t.startsWith("@prefix") || t.startsWith("@base") ||
      t.regionMatches(true, 0, "PREFIX", 0, 6) ||
      t.regionMatches(true, 0, "BASE", 0, 4)
  }

  private def isContentLine(line: String): Boolean = {
    val t = line.dropWhile(_.isWhitespace)
    t.nonEmpty && !t.startsWith("#") && !isDirectiveLine(line)
  }

  private case class Scan(
      directives: Vector[(Long, String)], // (line idx, text), in order
      minContent: Long, // first statement line, Long.MaxValue if none
      disqualified: Boolean)

  private def scanFile(spark: SparkSession, file: String,
      parallelism: Int): Scan = {
    val zero = Scan(Vector.empty, Long.MaxValue, disqualified = false)
    spark.sparkContext.textFile(file, parallelism)
      .zipWithIndex()
      .map { case (line, idx) =>
        val disq = line.contains("\"\"\"") || line.contains("'''") ||
          line.contains("{") || line.contains("}") ||
          // a directive that does not close on its own line would need
          // cross-line stitching in the header — rare; fall back
          (isDirectiveLine(line) && !endsStatement(line))
        if (isDirectiveLine(line))
          Scan(Vector((idx, line)), Long.MaxValue, disq)
        else if (isContentLine(line)) Scan(Vector.empty, idx, disq)
        else Scan(Vector.empty, Long.MaxValue, disq)
      }
      .fold(zero) { (a, b) =>
        Scan((a.directives ++ b.directives).sortBy(_._1),
          math.min(a.minContent, b.minContent),
          a.disqualified || b.disqualified)
      }
  }

  /** Parse one large Turtle file with split-level parallelism, or None
    * when pass 1 disqualifies it (caller falls back to whole-file).
    */
  private[io] def readSplit(spark: SparkSession, file: String)
      : Option[DataFrame] = {
    val parallelism = spark.sparkContext.defaultParallelism
    val scan = scanFile(spark, file, parallelism)
    val names = scan.directives.map(_._2.dropWhile(_.isWhitespace))
      .filter(d => d.startsWith("@prefix") ||
        d.regionMatches(true, 0, "PREFIX", 0, 6))
      .map(_.split(":", 2).head) // up to the prefix name's colon
    val safe = !scan.disqualified &&
      scan.directives.forall(_._1 < scan.minContent) &&
      names.distinct.size == names.size
    if (!safe) return None

    val header = scan.directives.map(_._2).mkString("", "\n", "\n")
    val lines = spark.sparkContext.textFile(file, parallelism)
    // per partition: parse the boundary-aligned middle with the header
    // prepended; ship the edge fragments (≤ one statement each) keyed
    // by partition for driver-side stitching
    val pieces = lines.mapPartitionsWithIndex { (pi, it) =>
      val arr = it.toArray
      val bIdx = arr.indices.filter(i => endsStatement(arr(i)))
      if (bIdx.isEmpty) {
        // no boundary: the whole partition is one edge fragment
        Iterator(Left((pi, arr.mkString("\n"), "", false)))
      } else {
        val first = bIdx.head
        val last = bIdx.last
        val head = arr.slice(0, first + 1).mkString("\n")
        val tail = arr.slice(last + 1, arr.length).mkString("\n")
        val middle = arr.slice(first + 1, last + 1).mkString("\n")
        val quads = new TurtleParser(header + middle, bnodeTag = s"c${pi}x")
          .parse()
        Iterator(Left((pi, head, tail, true))) ++ quads.map(Right(_))
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    import spark.implicits._
    val middleDf = pieces.flatMap {
      case Right(q) => Some(q)
      case _ => None
    }.toDF()

    // stitch edge fragments in partition order: a partition without a
    // boundary chains its whole content into the pending statement
    val frags = pieces.flatMap {
      case Left(f) => Some(f)
      case _ => None
    }.collect().sortBy(_._1)
    val stitched = scala.collection.mutable.ListBuffer[String]()
    var pending = new StringBuilder
    frags.foreach { case (_, head, tail, hasBoundary) =>
      pending.append(head).append('\n')
      if (hasBoundary) {
        stitched += pending.result()
        pending = new StringBuilder(tail).append('\n')
      }
    }
    stitched += pending.result()
    val edgeQuads = stitched.zipWithIndex.flatMap { case (text, i) =>
      new TurtleParser(header + text, bnodeTag = s"f${i}x").parse()
    }
    val edgeDf = spark.createDataset(edgeQuads.toSeq).toDF()

    val out = middleDf.unionByName(edgeDf)
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
    // pin the rows, then drop the piece cache (the fragment collect
    // already ran; without the checkpoint the union would re-parse)
    val pinned = out.localCheckpoint(true)
    pieces.unpersist()
    Some(pinned)
  }

  /** Read Turtle at `path` (file, directory, or glob): files above the
    * split threshold go through the two-pass chunked parser when pass 1
    * proves it safe; everything else takes the task-per-file parser.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val threshold = spark.conf.getOption("graft.turtle.splitThreshold")
      .map(_.toLong).getOrElse(DefaultSplitThreshold)
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Seq[org.apache.hadoop.fs.FileStatus] =
      (if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
      else Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil))
        .filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_"))
    val (big, small) = files.partition(_.getLen > threshold)

    val smallDf: Option[DataFrame] =
      if (small.isEmpty) None
      else Some(wholeFileRead(spark,
        small.map(_.getPath.toString).mkString(",")))
    val bigDfs = big.map { f =>
      val fp = f.getPath.toString
      readSplit(spark, fp).getOrElse(wholeFileRead(spark, fp))
    }
    (smallDf.toSeq ++ bigDfs) match {
      case Nil => wholeFileRead(spark, path) // empty dir: schema only
      case dfs => dfs.reduce(_ unionByName _)
    }
  }

  /** The sequential task-per-file parser (the r8 path; also the
    * fallback for disqualified big files).
    */
  private def wholeFileRead(spark: SparkSession, paths: String)
      : DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(paths)
      .flatMap { case (_, content) => new TurtleParser(content).parse() }
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }
}
