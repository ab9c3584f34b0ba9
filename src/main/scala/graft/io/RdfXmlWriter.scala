package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Term

/** RDF/XML serializer sink (reference surface: oxigraph RdfSerializer
  * RDF/XML direction — lib/oxrdfxml/src/serializer.rs · RdfXmlSerializer).
  *
  * Same Spark split as [[TurtleWriter]]: per-term rendering (XML
  * escaping, QName splitting, attribute choice) is codegen'd Column
  * work; the sequential part — grouping a subject run into one
  * rdf:Description element and wrapping each part in an rdf:RDF root —
  * is a narrow mapPartitions over pre-rendered strings.
  *
  * Every part file is a complete standalone RDF/XML document (the
  * format has no concatenation story, unlike Turtle; readers — ours
  * included — parse RDF/XML per FILE, so a directory of parts is the
  * natural dataset form).
  *
  * Deviations, matching the reference's behavior where the format
  * cannot express the model: predicates whose IRI has no valid NCName
  * tail and quoted-triple terms raise at write time (oxrdfxml refuses
  * both); named graphs are out of scope (triples in, like writeNTriples).
  */
object RdfXmlWriter {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** XML attribute/text escaping (amp first). A raw CR would be
    * NORMALIZED to LF by every conforming XML parser (XML 1.0 §2.11),
    * so it must leave as a character reference to survive a roundtrip.
    */
  private def xmlEsc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
      "\"", "&quot;"), "\r", "&#13;")

  // longest NCName-ish tail of the predicate IRI becomes the element
  // local name; the (non-greedy) head is the per-element namespace
  private val QnameRe = "^(.+?)([A-Za-z_][A-Za-z0-9_.-]*)$"

  /** One serialized property element (self-closing for resource
    * objects, text content for literals).
    */
  private def propElem(p: Column, o: Column): Column = {
    val ns = regexp_extract(p("lex"), QnameRe, 1)
    val local = regexp_extract(p("lex"), QnameRe, 2)
    val open = concat(lit("    <n:"), local,
      lit(" xmlns:n=\""), xmlEsc(ns), lit("\""))
    val elem = when(o("kind") === Term.IriKind,
        concat(open, lit(" rdf:resource=\""), xmlEsc(o("lex")), lit("\"/>")))
      .when(o("kind") === Term.BlankKind,
        concat(open, lit(" rdf:nodeID=\""), o("lex"), lit("\"/>")))
      .when(o("kind") === Term.QuotedKind,
        raise_error(lit("RDF/XML cannot serialize quoted triples")))
      .otherwise(concat(open,
        // RDF/XML has no directional-literal form (RDF 1.2 does not
        // extend the XML syntax): fail loudly, like quoted triples
        when(o("lang").isNotNull && o("lang").contains("--"),
          raise_error(concat(lit("RDF/XML cannot serialize " +
            "rdf:dirLangString literals (tag "), o("lang"), lit(")"))))
        .when(o("lang").isNotNull,
          concat(lit(" xml:lang=\""), o("lang"), lit("\"")))
          .when(o("dt").isNotNull && o("dt") =!= Term.XsdString,
            concat(lit(" rdf:datatype=\""), xmlEsc(o("dt")), lit("\"")))
          .otherwise(lit("")),
        lit(">"), xmlEsc(o("lex")), lit("</n:"), local, lit(">")))
    when(local === "" || ns === "",
      raise_error(concat(lit("predicate IRI has no XML-serializable " +
        "local name: "), p("lex")))).otherwise(elem)
  }

  /** Subject identification attribute of the rdf:Description element. */
  private def subjAttr(s: Column): Column =
    when(s("kind") === Term.BlankKind,
      concat(lit("rdf:nodeID=\""), s("lex"), lit("\"")))
      .when(s("kind") === Term.QuotedKind,
        raise_error(lit("RDF/XML cannot serialize quoted triples")))
      .otherwise(concat(lit("rdf:about=\""), xmlEsc(s("lex")), lit("\"")))

  /** Serialize triples (s, p, o) as RDF/XML part documents. */
  def write(triples: DataFrame, path: String): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    val tok = triples
      .select(subjAttr(col("s")).as("sa"),
        propElem(col("p"), col("o")).as("pe"))
      .repartition(col("sa"))
      .sortWithinPartitions("sa", "pe")
      .as[(String, String)]
    val lines = tok.mapPartitions { it =>
      val out = scala.collection.mutable.Queue[String]()
      var started = false
      var closed = false
      var curS: String = null
      def push(sa: String, pe: String): Unit = {
        if (!started) {
          out += "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
          out += s"""<rdf:RDF xmlns:rdf="$RdfNs">"""
          started = true
        }
        if (sa != curS) {
          if (curS != null) out += "  </rdf:Description>"
          out += s"  <rdf:Description $sa>"
          curS = sa
        }
        out += pe
      }
      new Iterator[String] {
        def hasNext: Boolean = {
          while (out.isEmpty && it.hasNext) {
            val r = it.next(); push(r._1, r._2)
          }
          if (out.isEmpty && !closed) {
            closed = true
            if (started) { out += "  </rdf:Description>"; out += "</rdf:RDF>" }
          }
          out.nonEmpty
        }
        def next(): String = out.dequeue()
      }
    }
    lines.write.mode("overwrite").text(path)
  }
}
