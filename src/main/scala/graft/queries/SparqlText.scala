package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.TpchRdf
import graft.parser.SparqlParser

/** SPARQL *text* queries: the full pipeline parser -> algebra ->
  * translator -> DataFrame, oracle-checked. Proves a reference user can
  * paste their SPARQL and run it here (SURVEY.md §3.4).
  */
object SparqlText {
  private def str(v: String): Column = col(v)("lex")
  // lex -> DOUBLE output (decimal output columns are not hash-stable;
  // see Sparql.dbl)
  private def dbl(v: String): Column = col(v)("lex").cast(DoubleType)
  private def int64(v: String): Column = col(v)("lex").cast(LongType)

  private val prologue = s"PREFIX : <${TpchRdf.ns}>\n"

  // r12: indexed source — see Sparql.run
  private def run(s: SparkSession, dir: String, q: String): DataFrame =
    SparqlParser.execute(prologue + q, TpchRdf.source(s, dir))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // text form of sp1: BGP + FILTER + ORDER BY
    "pq1_select_filter" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname ?b WHERE {
             ?c :inNation ?n . ?n :inRegion ?r .
             ?r :name "ASIA" .
             ?c :acctbal ?b ; :name ?cname .
             FILTER(?b > 5000.00)
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"), dbl("b").as("bal"))
    },

    // OPTIONAL with inner filter
    "pq2_optional" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname ?tp WHERE {
             ?c :name ?cname ; :acctbal ?b .
             OPTIONAL { ?o :orderedBy ?c ; :totalprice ?tp .
                        FILTER(?tp > 300000.00) }
           }""")
        .select(str("cname").as("c_name"), dbl("tp").as("bigprice"))
        .orderBy(col("c_name"), col("bigprice"))
    },

    // aggregates: GROUP BY + HAVING + expression projection
    "pq3_group_having" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?nname (COUNT(*) AS ?cnt) (SUM(?b) AS ?total)
           WHERE {
             ?c :inNation ?n . ?n :name ?nname . ?c :acctbal ?b .
           } GROUP BY ?nname HAVING (COUNT(*) > 50) ORDER BY ?nname""")
        .select(str("nname").as("n_name"), int64("cnt").as("cnt"),
          dbl("total").as("total"))
    },

    // property path: transitive closure from text syntax
    "pq4_path_plus" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?x ?y WHERE { ?x :locatedIn+ ?y } ORDER BY ?x ?y""")
        .select(str("x").as("x"), str("y").as("y"))
    },

    // EXISTS + IN + UNION pieces
    "pq5_exists" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname ?seg WHERE {
             ?c :name ?cname ; :mktsegment ?seg .
             FILTER EXISTS { ?o :orderedBy ?c ; :totalprice ?tp .
                             FILTER(?tp > 300000.00) }
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"), str("seg").as("seg"))
    },

    // GRAPH scoping + cross-graph join from text
    "pq6_graph" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT ?sname ?nname WHERE {
             GRAPH <${TpchRdf.G_SUPPLIERS}> { ?s :name ?sname ; :inNation ?n }
             ?n :name ?nname .
           } ORDER BY ?sname""")
        .select(str("sname").as("s_name"), str("nname").as("n_name"))
    },

    // ASK text form
    "pq7_ask" -> { (s, dir) =>
      run(s, dir,
        """ASK { ?c :acctbal ?b . FILTER(?b > 9000.00) }""")
    },

    // CONSTRUCT text form
    "pq8_construct" -> { (s, dir) =>
      run(s, dir,
        """CONSTRUCT { ?c :segment ?seg . ?c :type "customer" }
           WHERE { ?c :mktsegment ?seg }""")
        .select(col("s")("lex").as("s"), col("p")("lex").as("p"),
          col("o")("lex").as("o"))
        .orderBy(col("s"), col("p"), col("o"))
    },

    // VALUES + BIND + arithmetic from text
    "pq9_values_bind" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname ?dbl WHERE {
             VALUES ?rn { "ASIA" "EUROPE" }
             ?c :inNation ?n . ?n :inRegion ?r . ?r :name ?rn .
             ?c :name ?cname ; :acctbal ?b .
             BIND(?b * 2 AS ?dbl)
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"), dbl("dbl").as("dblbal"))
    },

    // SPARQL Update text: chained INSERT..WHERE ; DELETE WHERE ; CLEAR
    "pq11_update_text" -> { (s, dir) =>
      val updated = graft.update.UpdateExec.executeText(prologue +
        s"""INSERT { ?c :vip "true" } WHERE { ?c :acctbal ?b .
              FILTER(?b > 7000.00) } ;
            DELETE WHERE { ?o :priority ?p } ;
            CLEAR GRAPH <${TpchRdf.G_SUPPLIERS}>""",
        TpchRdf.store(s, dir))
      updated.agg(count(lit(1)).as("cnt"))
    },

    // language-tagged literals: LANG / LANGMATCHES (§2.8)
    "pq12_lang" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?rn ?l WHERE {
             ?r :name ?rn ; :label ?l .
             FILTER(LANGMATCHES(LANG(?l), "de"))
           } ORDER BY ?rn""")
        .select(str("rn").as("r_name"), str("l").as("label"))
    },

    // DESCRIBE text form: constant resource, no WHERE clause (§2.9)
    "pq14_describe" -> { (s, dir) =>
      run(s, dir, s"DESCRIBE <${TpchRdf.ns}customer/0>")
        .select(col("s")("lex").as("s"), col("p")("lex").as("p"),
          col("o")("lex").as("o"))
        .orderBy(col("p"), col("o"))
    },

    // correlated LATERAL: top-2 customers by balance per nation via the
    // per-binding window rewrite (SPARQL 1.2 / oxigraph extension)
    "pq15_lateral" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?nname ?cname ?b WHERE {
             ?n :inRegion ?r ; :name ?nname .
             LATERAL {
               SELECT ?c ?cname ?b WHERE {
                 ?c :inNation ?n ; :name ?cname ; :acctbal ?b .
               } ORDER BY DESC(?b) ?cname LIMIT 2
             }
           } ORDER BY ?nname ?cname""")
        .select(str("nname").as("n_name"), str("cname").as("c_name"),
          dbl("b").as("bal"))
    },

    // per-binding LATERAL aggregation: max customer balance per nation
    // (keys-empty correlated group -> one row per binding, match-less
    // bindings keep unbound aggregates)
    "pq16_lateral_agg" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?nname ?m WHERE {
             ?n :inRegion ?r ; :name ?nname .
             LATERAL { SELECT (MAX(?b) AS ?m) WHERE {
               ?c :inNation ?n ; :acctbal ?b } }
           } ORDER BY ?nname""")
        .select(str("nname").as("n_name"), dbl("m").as("m"))
    },

    // correlated BIND inside LATERAL (the hoisted-Extend rewrite): the
    // BIND body mixes a left-bound var (?nname) with right-bound ones,
    // so it must evaluate per left binding, not bottom-up
    "pq17_lateral_bind" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?t ?b WHERE {
             ?n :name ?nname ; :inRegion ?r .
             LATERAL { ?c :inNation ?n ; :name ?cname ; :acctbal ?b .
                       BIND(CONCAT(?nname, "/", ?cname) AS ?t)
                       FILTER(?b > 9000.00) }
           } ORDER BY ?t""")
        .select(str("t").as("t"), dbl("b").as("bal"))
    },

    // per-binding aggregation OVER a correlated BIND: the hoisted
    // Extend lands between the join and the aggregation (keys-empty
    // group -> one row per binding)
    "pq20_lateral_group_bind" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?nname ?m WHERE {
             ?n :name ?nname ; :inRegion ?r .
             LATERAL { SELECT (MAX(?t) AS ?m) WHERE {
               ?c :inNation ?n ; :name ?cname .
               BIND(CONCAT(?nname, "/", ?cname) AS ?t) } }
           } ORDER BY ?nname""")
        .select(str("nname").as("n_name"), str("m").as("m"))
    },

    // RDF-star expression surface through the full text pipeline:
    // TRIPLE constructor, isTRIPLE, component accessor + sameTerm over
    // quoted terms (pattern-level RDF-star is fixture-covered; this
    // keeps the oracle-checkable gate on TPC-H data)
    "pq19_rdfstar" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname ?b WHERE {
             ?c :name ?cname ; :acctbal ?b .
             BIND(TRIPLE(?c, :acctbal, ?b) AS ?t)
             FILTER(isTRIPLE(?t) && sameTerm(OBJECT(?t), ?b)
                    && ?b > 9500.00)
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"), dbl("b").as("bal"))
    },

    // RDF-star through update templates AND pattern matching at engine
    // scale: INSERT a quoted annotation per matching customer, then
    // destructure it back with a quoted pattern (QuotedParts path)
    "pq21_rdfstar_update" -> { (s, dir) =>
      val updated = graft.update.UpdateExec.executeText(prologue +
        """INSERT { << ?c :acctbal ?b >> :flag "hi" } WHERE {
             ?c :acctbal ?b . FILTER(?b > 9500.00) }""",
        TpchRdf.store(s, dir))
      SparqlParser.execute(prologue +
        """SELECT ?cname ?b WHERE {
             << ?c :acctbal ?b >> :flag "hi" .
             ?c :name ?cname .
           } ORDER BY ?cname""", updated)
        .select(str("cname").as("c_name"), dbl("b").as("bal"))
    },

    // xsd:time literals: value-space comparison + component extraction
    "pq18_time" -> { (s, dir) =>
      run(s, dir,
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?rname ?h WHERE {
             ?r :name ?rname .
             VALUES (?rname ?tm) {
               ("AFRICA" "08:30:00"^^xsd:time)
               ("AMERICA" "12:45:10"^^xsd:time)
               ("ASIA" "23:05:00"^^xsd:time)
               ("EUROPE" "00:15:30"^^xsd:time)
               ("MIDDLE EAST" "06:00:00"^^xsd:time) }
             BIND(HOURS(?tm) AS ?h)
             FILTER(?tm > "05:00:00"^^xsd:time)
           } ORDER BY ?rname""")
        .select(str("rname").as("r_name"), int64("h").as("h"))
    },

    // SERVICE federation (§2.12 ServiceHandler parity): a registered
    // local handler evaluates the SERVICE body — here a pseudo-endpoint
    // serving the same dataset's nation names — and its solutions join
    // into the outer group on the shared variable. Also exercises
    // SERVICE SILENT with no handler: the unit solution (join identity),
    // per SPARQL 1.1 Federated Query §2.2 / oxigraph without http-client.
    "pq22_service" -> { (s, dir) =>
      graft.exec.ServiceExec.register("local:nations", (gp, sp) =>
        graft.exec.Translator.translate(gp, TpchRdf.quads(sp, dir)).df)
      run(s, dir,
        """SELECT ?cname ?nname WHERE {
             ?c :name ?cname ; :inNation ?n .
             SERVICE <local:nations> { ?n :name ?nname }
             SERVICE SILENT <local:unreachable> { ?x :nope ?y }
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"), str("nname").as("n_name"))
    },

    // FROM: named graph merged into the default graph (§13.2 dataset)
    "pq13_from" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT ?sname FROM <${TpchRdf.G_SUPPLIERS}>
            WHERE { ?s :name ?sname } ORDER BY ?sname""")
        .select(str("sname").as("s_name"))
    },

    // subselect with aggregation joined to outer pattern, from text
    "pq10_subselect" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?cname WHERE {
             ?c :inNation ?n ; :acctbal ?b ; :name ?cname .
             { SELECT ?n (AVG(?b2) AS ?av) WHERE {
                 ?c2 :inNation ?n ; :acctbal ?b2 . } GROUP BY ?n }
             FILTER(?b > ?av)
           } ORDER BY ?cname""")
        .select(str("cname").as("c_name"))
    },

    // ordered GROUP_CONCAT (extension `; ORDER BY`): element order is
    // DESC balance with name tiebreak — DuckDB mirrors it with
    // string_agg(... ORDER BY), making the extension oracle-checkable
    "pq23_groupconcat_order" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?nname (GROUP_CONCAT(?cname; ORDER BY DESC(?b) ?cname; SEPARATOR=",") AS ?names)
           WHERE { ?c :inNation ?n ; :name ?cname ; :acctbal ?b .
                   ?n :name ?nname }
           GROUP BY ?nname ORDER BY ?nname""")
        .select(str("nname").as("n_name"), str("names").as("names"))
    },

    // SPARQL 1.2 directional language strings: STRLANGDIR constructs an
    // rdf:dirLangString, LANG/LANGDIR/hasLANGDIR take it apart; the @en
    // region label (plain langString) shows the "" direction contrast
    "pq24_dirlang" -> { (s, dir) =>
      run(s, dir,
        """SELECT ?rname ?tag ?dlbl ?edir WHERE {
             ?r :name ?rname ; :label ?elbl .
             FILTER(LANG(?elbl) = "en")
             BIND(STRLANGDIR(?rname, "AR", "rtl") AS ?d)
             FILTER(hasLANGDIR(?d) && !hasLANGDIR(?elbl))
             BIND(CONCAT(LANG(?d), "--", LANGDIR(?d)) AS ?tag)
             BIND(STR(UCASE(?d)) AS ?dlbl)
             BIND(LANGDIR(?elbl) AS ?edir)
           } ORDER BY ?rname""")
        .select(str("rname").as("r_name"), str("tag").as("tag"),
          str("dlbl").as("dlbl"), str("edir").as("edir"))
    })

  val oracle: Map[String, String] = Map(
    "pq1_select_filter" -> Sparql.oracle("sp1_bgp_filter"),
    "pq2_optional" -> Sparql.oracle("sp2_optional"),
    "pq3_group_having" ->
      """SELECT n_name, count(*) AS cnt,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS total
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING count(*) > 50 ORDER BY n_name""",
    "pq4_path_plus" -> Sparql.oracle("sp9_path_plus"),
    "pq5_exists" -> Sparql.oracle("sp5_exists"),
    "pq6_graph" -> Sparql.oracle("sp11_graph"),
    "pq7_ask" -> Sparql.oracle("sp14_ask"),
    "pq8_construct" -> Sparql.oracle("sp13_construct"),
    "pq9_values_bind" ->
      """SELECT c_name,
        CAST(CAST(c_acctbal AS DECIMAL(38,2)) * 2 AS DOUBLE) AS dblbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE') ORDER BY c_name""",
    "pq10_subselect" -> Sparql.oracle("sp19_subselect"),
    "pq12_lang" ->
      """SELECT r_name, lower(r_name) AS label FROM region ORDER BY r_name""",
    "pq24_dirlang" ->
      """SELECT r_name, 'ar--rtl' AS tag, upper(r_name) AS dlbl,
        '' AS edir FROM region ORDER BY r_name""",
    "pq13_from" ->
      """SELECT s_name FROM supplier ORDER BY s_name""",
    "pq22_service" ->
      """SELECT c_name, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        ORDER BY c_name""",
    "pq23_groupconcat_order" ->
      """SELECT n_name,
        string_agg(c_name, ',' ORDER BY CAST(c_acctbal AS DECIMAL(38,2)) DESC, c_name) AS names
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "pq14_describe" ->
      s"""SELECT s, p, o FROM (
        SELECT '${TpchRdf.ns}customer/' || c_custkey AS s,
               '${TpchRdf.ns}name' AS p, c_name AS o
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${TpchRdf.ns}acctbal',
          CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR)
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${TpchRdf.ns}mktsegment', c_mktsegment
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${TpchRdf.ns}inNation', '${TpchRdf.ns}nation/' || c_nationkey
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${TpchRdf.ns}locatedIn', '${TpchRdf.ns}nation/' || c_nationkey
          FROM customer WHERE c_custkey = 0)
        ORDER BY p, o""",
    "pq15_lateral" ->
      """WITH ranked AS (
        SELECT n_name, c_name, CAST(c_acctbal AS DECIMAL(38,2)) AS bal,
          row_number() OVER (PARTITION BY n_nationkey
            ORDER BY CAST(c_acctbal AS DECIMAL(38,2)) DESC, c_name) AS rn
        FROM nation JOIN customer ON c_nationkey = n_nationkey)
        SELECT n_name, c_name, CAST(CAST(bal AS VARCHAR) AS DOUBLE) AS bal
        FROM ranked WHERE rn <= 2 ORDER BY n_name, c_name""",
    "pq16_lateral_agg" ->
      """SELECT n_name,
        CAST(CAST(max(CAST(c_acctbal AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
          AS m
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "pq17_lateral_bind" ->
      """SELECT n_name || '/' || c_name AS t,
        CAST(CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
          AS bal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 9000.00 ORDER BY t""",
    "pq20_lateral_group_bind" ->
      """SELECT n_name, max(n_name || '/' || c_name) AS m
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "pq19_rdfstar" ->
      """SELECT c_name,
        CAST(CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
          AS bal
        FROM customer WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 9500.00
        ORDER BY c_name""",
    "pq21_rdfstar_update" ->
      """SELECT c_name,
        CAST(CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
          AS bal
        FROM customer WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 9500.00
        ORDER BY c_name""",
    "pq18_time" ->
      """SELECT r_name, CAST(h AS BIGINT) AS h FROM region
        JOIN (VALUES ('AFRICA', 8), ('AMERICA', 12), ('ASIA', 23),
          ('MIDDLE EAST', 6)) AS v(vn, h) ON r_name = vn
        ORDER BY r_name""",
    "pq11_update_text" ->
      """SELECT (SELECT count(*) * 5 FROM customer)
        + (SELECT count(*) * 3 FROM nation)
        + (SELECT count(*) * 4 FROM region)
        + (SELECT count(*) * 4 FROM orders)
        + (SELECT count(*) FROM customer
           WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 7000) AS cnt""")
}
