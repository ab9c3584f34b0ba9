package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Term

/** Splittable Turtle/TriG ingestion (SURVEY §2.1 v2/v3): a single
  * multi-GB document parses with split-level parallelism instead of one
  * `wholeTextFiles` task — the remaining big-ingest parity gap for
  * 100 TB loads (N-Triples/N-Quads have streamed + split since r8).
  *
  * Two-pass scheme per large file:
  *
  *  1. '''Directive + block + safety scan''' (one distributed pass,
  *     per-partition summaries combined driver-side): collect
  *     `@prefix`/`@base`/`PREFIX`/`BASE` lines in order, classify every
  *     line, and decide splittability. TriG graph blocks are tracked as
  *     OPEN (`[GRAPH] label? {` as the line's whole code) / CLOSE (`}`
  *     alone) events; a parenthesis prefix-scan over the per-partition
  *     event summaries gives each partition its INCOMING graph context,
  *     so chunks parse with the right graph even when the block opened
  *     partitions earlier. The file falls back to the sequential
  *     whole-file parser when anything order- or state-dependent
  *     appears: long (triple-quoted) strings — the only lexical form
  *     that lets a line start inside a string; braces NOT in
  *     well-formed open/close lines (inline `<g> { :a :b :c . }`
  *     one-liners, `} <g2> {`, anonymous `[] {` graph labels); a
  *     directive after the first statement, a multi-line directive, or
  *     a redefined prefix; block events that do not alternate.
  *
  *  2. '''Chunked parse''': `textFile` splits the file into contiguous
  *     byte-range partitions (deterministic, so pass 1's summaries
  *     align). Within each partition, lines between the first and last
  *     BOUNDARY (a statement-terminating line, or a block open/close
  *     line) parse locally with the pass-1 directive header prepended
  *     and the incoming graph context re-opened synthetically
  *     (`label {` … `}`); the fragments before the first and after the
  *     last boundary (partial statements crossing partition edges,
  *     possibly chaining through boundary-less partitions) are tiny —
  *     one statement each — and stitch + parse driver-side with THEIR
  *     context wrapped the same way.
  *
  * A statement boundary is a line whose last code character (strings
  * respected, IRI/quoted-triple brackets respected, comments stripped)
  * is an unescaped `.` — sound for documents with no long strings:
  * single-quoted strings cannot contain raw newlines, so line-local
  * lexing never starts mid-string, and `.` can end a line's code only
  * as a statement terminator (decimal digits, PN_LOCAL dots and IRI
  * dots are never line-final code: PN_LOCAL cannot END with an
  * unescaped dot, IRIREFs end with `>`). Block open/close lines are
  * also boundaries: in a well-formed document no statement spans them.
  *
  * Labeled bnodes (`_:x`) are document-scoped and unify across chunks
  * (including bnode graph labels); ANONYMOUS bnode labels are
  * disambiguated per chunk AND per file via the parser's `bnodeTag`.
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

  /** First non-ws token is a Turtle directive keyword. The keyword must
    * end at a TOKEN BOUNDARY (whitespace, or `<` of the IRIREF — Turtle
    * allows adjacent tokens): a statement whose subject merely STARTS
    * with the keyword chars (`base:a :p :o .`, `baseline:x …`) is
    * content, not a directive — misclassifying it would fold it into
    * the pass-1 header and re-parse it once per chunk (duplicated
    * triples). `@`-forms are exempt: a line-initial `@` can only start
    * a directive in Turtle.
    */
  private[io] def isDirectiveLine(line: String): Boolean = {
    val t = line.dropWhile(_.isWhitespace)
    def boundary(k: Int) =
      t.length > k && (t(k).isWhitespace || t(k) == '<')
    // VERSION takes a string literal, so its boundary set is ws/quote
    def strBoundary(k: Int) =
      t.length > k && (t(k).isWhitespace || t(k) == '"' || t(k) == '\'')
    t.startsWith("@prefix") || t.startsWith("@base") ||
      t.startsWith("@version") ||
      (t.regionMatches(true, 0, "PREFIX", 0, 6) && boundary(6)) ||
      (t.regionMatches(true, 0, "BASE", 0, 4) && boundary(4)) ||
      (t.regionMatches(true, 0, "VERSION", 0, 7) && strBoundary(7))
  }

  // ---- line classification (pass 1 + pass 2 share it) -----------------

  private[io] sealed trait LineClass
  private[io] case object Blank extends LineClass // ws / comment only
  private[io] case object DirectiveLine extends LineClass
  /** `[GRAPH] label? {` — `pre` is the code before the brace, re-emitted
    * as the synthetic re-open in later chunks.
    */
  private[io] final case class BlockOpen(pre: String) extends LineClass
  private[io] case object BlockClose extends LineClass // code is `}`
  private[io] final case class Statement(boundary: Boolean)
    extends LineClass
  private[io] case object Unsafe extends LineClass

  /** The line's code text: comments stripped, string-literal INNARDS
    * replaced with a placeholder (so braces inside strings never read
    * as block delimiters), quotes kept. None when a single-line string
    * fails to close by EOL (invalid without long strings → unsafe).
    */
  private def codeOf(line: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    var inStr: Char = 0
    var depth = 0
    var done = false
    while (i < line.length && !done) {
      val c = line(i)
      if (inStr != 0) {
        if (c == '\\') i += 1
        else if (c == inStr) { inStr = 0; sb.append(c) }
        else sb.append('\u0001') // opaque string content
      } else c match {
        case '"' | '\'' => inStr = c; sb.append(c)
        case '#' if depth == 0 => done = true
        case '<' => depth += 1; sb.append(c)
        case '>' => if (depth > 0) depth -= 1; sb.append(c)
        case other => sb.append(other)
      }
      i += 1
    }
    if (inStr != 0) None else Some(sb.result())
  }

  private[io] def classify(line: String): LineClass = {
    if (line.contains("\"\"\"") || line.contains("'''")) return Unsafe
    codeOf(line) match {
      case None => Unsafe
      case Some(code) =>
        val t = code.trim
        if (t.isEmpty) Blank
        else if (isDirectiveLine(line))
          // provably single-line: @-form closed by its dot, or a
          // SPARQL-form whose IRIREF closes on this line — anything
          // else might span lines and corrupt the collected header
          if (endsStatement(line) || t.endsWith(">")) DirectiveLine
          else Unsafe
        else if (t.indexOf('{') >= 0 || t.indexOf('}') >= 0) {
          if (t == "}") BlockClose
          else if (t.endsWith("{") && t.count(_ == '{') == 1 &&
            !t.contains('}')) {
            val pre = t.dropRight(1).trim
            val label =
              if (pre.regionMatches(true, 0, "GRAPH", 0, 5) &&
                (pre.length == 5 || pre(5).isWhitespace || pre(5) == '<'))
                pre.substring(5).trim
              else pre
            // label must be one token: an IRIREF, a prefixed name, or a
            // LABELED bnode (empty = default-graph block). Anonymous
            // `[]` labels would mint different bnodes per chunk; any
            // placeholder means a string got here — both unsafe.
            val ok = label.isEmpty ||
              (!label.exists(_.isWhitespace) && !label.contains('[') &&
                !label.contains('\u0001') && !label.contains('"') &&
                !label.contains('\''))
            if (ok) BlockOpen(pre) else Unsafe
          } else Unsafe // inline one-liner block, `} <g> {`, nested …
        } else Statement(endsStatement(line))
    }
  }

  private def isBoundary(c: LineClass): Boolean = c match {
    case Statement(true) | BlockOpen(_) | BlockClose => true
    case _ => false
  }

  // ---- pass 1: per-partition summaries + driver combine ---------------

  private case class PartSummary(
      directives: Vector[String], // in order within the partition
      directiveBeforeContent: Boolean, // all directives precede content
      hasContent: Boolean,
      unsafe: Boolean,
      // block events, collapsed: C? (O C)* O? alternation
      leadingClose: Boolean,
      firstEventIsOpen: Boolean,
      hasEvents: Boolean,
      endsOpen: Option[String],
      malformed: Boolean)

  private def summarize(lines: Iterator[String]): PartSummary = {
    var directives = Vector.empty[String]
    var seenContent = false
    var dirAfterContent = false
    var unsafe = false
    var leadingClose = false
    var firstEventIsOpen = false
    var hasEvents = false
    var open: Option[String] = None // currently-open block (local view)
    var sawOpen = false
    var malformed = false
    lines.foreach { line =>
      classify(line) match {
        case Blank =>
        case DirectiveLine =>
          if (seenContent) dirAfterContent = true
          directives :+= line
        case Unsafe => unsafe = true
        case Statement(_) => seenContent = true
        case BlockOpen(pre) =>
          seenContent = true
          if (!hasEvents) firstEventIsOpen = true
          hasEvents = true
          if (open.isDefined) malformed = true // nested open
          open = Some(pre); sawOpen = true
        case BlockClose =>
          seenContent = true
          if (!hasEvents) { leadingClose = true; hasEvents = true }
          else if (open.isDefined) open = None
          else malformed = true // close while locally closed
      }
    }
    PartSummary(directives, !dirAfterContent, seenContent, unsafe,
      leadingClose, firstEventIsOpen, hasEvents, open, malformed)
  }

  /** Parse one large Turtle/TriG file with split-level parallelism, or
    * None when pass 1 disqualifies it (caller falls back to
    * whole-file).
    */
  private[io] def readSplit(spark: SparkSession, file: String)
      : Option[DataFrame] = {
    val parallelism = spark.sparkContext.defaultParallelism
    val summaries = spark.sparkContext.textFile(file, parallelism)
      .mapPartitionsWithIndex((pi, it) => Iterator((pi, summarize(it))))
      .collect().sortBy(_._1).map(_._2)

    // directive safety: single-line, all before any content, unique
    val firstContent = summaries.indexWhere(_.hasContent)
    val dirsOk = summaries.forall(_.directiveBeforeContent) &&
      (firstContent < 0 ||
        summaries.drop(firstContent + 1).forall(_.directives.isEmpty))
    val directives = summaries.toVector.flatMap(_.directives)
    val names = directives.map(_.dropWhile(_.isWhitespace))
      .filter(d => d.startsWith("@prefix") ||
        d.regionMatches(true, 0, "PREFIX", 0, 6))
      .map(_.split(":", 2).head) // up to the prefix name's colon
    // block prefix-scan: incoming context per partition
    val incoming = new Array[Option[String]](summaries.length + 1)
    var ctx: Option[String] = None
    var blocksOk = true
    summaries.zipWithIndex.foreach { case (s, pi) =>
      incoming(pi) = ctx
      if (s.leadingClose && ctx.isEmpty) blocksOk = false
      if (ctx.isDefined && s.hasEvents && s.firstEventIsOpen)
        blocksOk = false // open inside an open block
      if (s.malformed) blocksOk = false
      if (s.hasEvents) ctx = s.endsOpen
    }
    incoming(summaries.length) = ctx
    if (ctx.isDefined) blocksOk = false // unclosed block at EOF

    val safe = summaries.forall(!_.unsafe) && dirsOk && blocksOk &&
      names.distinct.size == names.size
    if (!safe) return None

    val header = directives.mkString("", "\n", "\n")
    // per-FILE component in the bnode tag: two large files read in one
    // call must not unify their anonymous bnodes just because they share
    // partition indices ('p' separates hex from decimal unambiguously)
    val ftag = fileTag(file)
    val inB = spark.sparkContext.broadcast(incoming)
    val lines = spark.sparkContext.textFile(file, parallelism)
    // per partition: parse the boundary-aligned middle with the header
    // prepended and the incoming block context re-opened; ship the edge
    // fragments (≤ one statement each) keyed by partition for driver-
    // side stitching
    val pieces = lines.mapPartitionsWithIndex { (pi, it) =>
      val arr = it.toArray
      val cls = arr.map(classify)
      val bIdx = arr.indices.filter(i => isBoundary(cls(i)))
      if (bIdx.isEmpty) {
        // no boundary: the whole partition is one edge fragment
        Iterator(Left((pi, arr.mkString("\n"), "", false)))
      } else {
        val first = bIdx.head
        val last = bIdx.last
        // block open/close boundary lines carry no statement text:
        // they stay in the middle so head/tail fragments are pure
        // statement pieces and contexts stay consistent
        val firstInMiddle = !cls(first).isInstanceOf[Statement]
        val lastInMiddle = !cls(last).isInstanceOf[Statement]
        val head =
          arr.slice(0, if (firstInMiddle) first else first + 1)
            .mkString("\n")
        val tail = arr.slice(last + 1, arr.length).mkString("\n")
        val midFrom = if (firstInMiddle) first else first + 1
        val middle = arr.slice(midFrom, last + 1).mkString("\n")
        val openPre = inB.value(pi).map(p => s"$p {\n").getOrElse("")
        val closePost =
          if (inB.value(pi + 1).isDefined) "\n}" else ""
        val quads = new TurtleParser(
          header + openPre + middle + closePost,
          bnodeTag = s"c${ftag}p${pi}x").parse()
        Iterator(Left((pi, head, tail, true))) ++ quads.map(Right(_))
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    import spark.implicits._
    val middleDf = pieces.flatMap {
      case Right(q) => Some(q)
      case _ => None
    }.toDF()

    // stitch edge fragments in partition order: a partition without a
    // boundary chains its whole content into the pending statement;
    // each stitched statement parses under the context where its chain
    // started (outgoing context of the partition before it)
    val frags = pieces.flatMap {
      case Left(f) => Some(f)
      case _ => None
    }.collect().sortBy(_._1)
    val stitched =
      scala.collection.mutable.ListBuffer[(String, Option[String])]()
    var pending = new StringBuilder
    var pendCtx: Option[String] = incoming(0)
    frags.foreach { case (pi, head, tail, hasBoundary) =>
      pending.append(head).append('\n')
      if (hasBoundary) {
        stitched += ((pending.result(), pendCtx))
        pending = new StringBuilder(tail).append('\n')
        pendCtx = incoming(pi + 1)
      }
    }
    stitched += ((pending.result(), pendCtx))
    val edgeQuads = stitched.zipWithIndex.flatMap {
      case ((text, fctx), i) =>
        val body = fctx match {
          case Some(pre) => s"$pre {\n$text\n}"
          case None => text
        }
        new TurtleParser(header + body,
          bnodeTag = s"f${ftag}p${i}x").parse()
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

  /** Read Turtle/TriG at `path` (file, directory, or glob): files above
    * the split threshold go through the two-pass chunked parser when
    * pass 1 proves it safe; everything else takes the task-per-file
    * parser.
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

  /** Stable per-file bnode-tag component (hex of a path hash; 'p'
    * separators keep hex/decimal segments unambiguous downstream).
    */
  private def fileTag(path: String): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(path) & 0xffffffffL)

  /** The sequential task-per-file parser (the r8 path; also the
    * fallback for disqualified big files). Anonymous bnode labels carry
    * the file tag so distinct documents read together never unify them.
    */
  private def wholeFileRead(spark: SparkSession, paths: String)
      : DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(paths)
      .flatMap { case (p, content) =>
        new TurtleParser(content, bnodeTag = s"w${fileTag(p)}x").parse()
      }
      .toDF()
      .select(col("g").cast(Term.schema), col("s").cast(Term.schema),
        col("p").cast(Term.schema), col("o").cast(Term.schema))
  }
}
