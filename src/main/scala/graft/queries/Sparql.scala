package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.algebra.Algebra._
import graft.exec.{QueryExec, Translator}
import graft.io.TpchRdf
import graft.io.TpchRdf.P
import graft.update.UpdateExec

/** SPARQL-engine queries: each builds algebra programmatically (parser
  * lands later, SURVEY.md §7.2), runs it through Translator over the
  * TpchRdf quad table, and projects term structs back to plain SQL values
  * so the DuckDB oracle can check the whole path end-to-end.
  */
object Sparql {
  private def str(v: String): Column = col(v)("lex")
  // term lexical form -> DOUBLE output column. Decimal output columns are
  // not oracle-hash-stable (str() scale padding); string->double parse is
  // correctly rounded in both engines, so the value hashes identically
  // regardless of the lex's trailing zeros.
  private def dbl(v: String): Column = col(v)("lex").cast(DoubleType)
  private def int64(v: String): Column = col(v)("lex").cast(LongType)

  // r12: the indexed source routes constant-predicate scans through
  // the store's per-predicate cached slices (TpchRdf.source)
  private def run(s: SparkSession, dir: String, gp: GraphPattern): DataFrame =
    QueryExec.select(gp, TpchRdf.source(s, dir))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // BGP + FILTER + ORDER BY through the algebra (§2.2, §2.3, §2.5)
    "sp1_bgp_filter" -> { (s, dir) =>
      val gp = OrderBy(
        Filter(EFn(">", EVar("b"), ELit("5000", graft.model.Term.XsdDecimal)),
          Bgp(
            TriplePattern(V("c"), I(P("inNation")), V("n")),
            TriplePattern(V("n"), I(P("inRegion")), V("r")),
            TriplePattern(V("r"), I(P("name")), L.str("ASIA")),
            TriplePattern(V("c"), I(P("acctbal")), V("b")),
            TriplePattern(V("c"), I(P("name")), V("cname")))),
        Seq(EVar("cname") -> true))
      run(s, dir, gp).select(str("cname").as("c_name"), dbl("b").as("bal"))
    },

    // OPTIONAL with filter inside the join scope (§2.3 LeftJoin)
    "sp2_optional" -> { (s, dir) =>
      val gp = LeftJoin(
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
        Bgp(TriplePattern(V("o"), I(P("orderedBy")), V("c")),
          TriplePattern(V("o"), I(P("totalprice")), V("tp"))),
        Some(EFn(">", EVar("tp"), ELit("300000", graft.model.Term.XsdDecimal))))
      run(s, dir, gp)
        .select(str("cname").as("c_name"), dbl("tp").as("bigprice"))
        .orderBy(col("c_name"), col("bigprice"))
    },

    // UNION with tagging BIND (§2.6)
    "sp3_union" -> { (s, dir) =>
      // nations/regions also carry :name in the default graph, so the
      // customer branch narrows by subject IRI prefix (STRSTARTS/STR)
      val customers = Filter(
        EFn("STRSTARTS", EFn("STR", EVar("x")),
          ELit.str(TpchRdf.ns + "customer/")),
        Extend(Bgp(TriplePattern(V("x"), I(P("name")), V("name"))),
          "src", ELit.str("customer")))
      val suppliers = Extend(GraphPat(I(TpchRdf.G_SUPPLIERS),
        Bgp(TriplePattern(V("x"), I(P("name")), V("name")))),
        "src", ELit.str("supplier"))
      run(s, dir, Union(customers, suppliers))
        .select(str("name").as("name"), str("src").as("src"))
        .orderBy(col("name"), col("src"))
    },

    // MINUS (§2.3): customers minus those with a >400k order
    "sp4_minus" -> { (s, dir) =>
      val gp = OrderBy(Minus(
        // :acctbal pattern narrows subjects to customers (suppliers'
        // acctbal lives in the named graph)
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
        Filter(EFn(">", EVar("tp"), ELit("400000", graft.model.Term.XsdDecimal)),
          Bgp(TriplePattern(V("o"), I(P("orderedBy")), V("c")),
            TriplePattern(V("o"), I(P("totalprice")), V("tp"))))),
        Seq(EVar("cname") -> true))
      run(s, dir, gp).select(str("cname").as("c_name"))
    },

    // FILTER EXISTS -> semi join (§2.3)
    "sp5_exists" -> { (s, dir) =>
      val gp = OrderBy(Filter(
        EExists(Filter(
          EFn(">", EVar("tp"), ELit("300000", graft.model.Term.XsdDecimal)),
          Bgp(TriplePattern(V("o"), I(P("orderedBy")), V("c")),
            TriplePattern(V("o"), I(P("totalprice")), V("tp"))))),
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("mktsegment")), V("seg")))),
        Seq(EVar("cname") -> true))
      run(s, dir, gp).select(str("cname").as("c_name"), str("seg").as("seg"))
    },

    // §18.6 EXISTS substitution, σ-domain MINUS rule: ?c is outer-bound
    // inside the EXISTS, so it is a CONSTANT there — the MINUS sides
    // share no live variable (σ-domains {o} vs {o2}) and the MINUS
    // removes nothing; EXISTS reduces to "the customer has an order".
    // A bottom-up compat evaluation would share ?c across the MINUS and
    // empty the pattern (zero rows) — this gate pins the spec rule.
    "sp33_exists_subst" -> { (s, dir) =>
      val gp = OrderBy(Filter(
        EExists(Minus(
          Bgp(TriplePattern(V("o"), I(P("orderedBy")), V("c"))),
          Bgp(TriplePattern(V("o2"), I(P("orderedBy")), V("c"))))),
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("mktsegment")), V("seg")))),
        Seq(EVar("cname") -> true))
      run(s, dir, gp).select(str("cname").as("c_name"), str("seg").as("seg"))
    },

    // EXISTS inside a correlated LATERAL body (r12): the EXISTS
    // correlates on BOTH the outer ?c and the body's ?o — the latter
    // ONLY in expression position (?o2 != ?o), the r11s4 hard class —
    // so existsSemi routes it through the per-binding σ engine
    // (__lid-keyed hash joins). Semantics: each customer's orders that
    // have a SIBLING order by the same customer. Also the sp33 scale
    // companion: the 10×/100× PerBinding legs run this shape.
    "sp34_lateral_exists" -> { (s, dir) =>
      val gp = Lateral(
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
        Filter(
          EExists(Filter(EFn("!=", EVar("o2"), EVar("o")),
            Bgp(TriplePattern(V("o2"), I(P("orderedBy")), V("c"))))),
          Bgp(TriplePattern(V("o"), I(P("orderedBy")), V("c")),
            TriplePattern(V("o"), I(P("totalprice")), V("tp")))))
      run(s, dir, gp)
        .select(str("cname").as("c_name"), dbl("tp").as("price"))
        .orderBy(col("c_name"), col("price"))
    },

    // VALUES joined into a BGP (§2.6)
    "sp6_values" -> { (s, dir) =>
      val gp = Join(
        Bgp(
          TriplePattern(V("c"), I(P("inNation")), V("n")),
          TriplePattern(V("n"), I(P("inRegion")), V("r")),
          TriplePattern(V("r"), I(P("name")), V("rn")),
          TriplePattern(V("c"), I(P("name")), V("cname"))),
        ValuesPat(Seq("rn"),
          Seq(Seq(Some(L.str("ASIA"))), Seq(Some(L.str("EUROPE"))))))
      run(s, dir, gp).select(str("cname").as("c_name"), str("rn").as("r_name"))
        .orderBy(col("c_name"))
    },

    // GROUP BY + COUNT/SUM/MAX aggregates over terms (§2.4)
    "sp7_agg" -> { (s, dir) =>
      val gp = Group(
        Bgp(TriplePattern(V("c"), I(P("inNation")), V("n")),
          TriplePattern(V("n"), I(P("name")), V("nname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
        Seq("nname"),
        Seq("cnt" -> AggCall("COUNT_STAR", None),
          "total" -> AggCall("SUM", Some(EVar("b"))),
          "maxbal" -> AggCall("MAX", Some(EVar("b")))))
      run(s, dir, gp)
        .select(str("nname").as("n_name"), int64("cnt").as("cnt"),
          dbl("total").as("total"), dbl("maxbal").as("maxbal"))
        .orderBy(col("n_name"))
    },

    // sequence property path (§2.7)
    "sp8_path_seq" -> { (s, dir) =>
      val gp = Join(
        PathPattern(V("c"), PSeq(PLink(P("inNation")), PLink(P("inRegion"))),
          V("r")),
        Bgp(TriplePattern(V("r"), I(P("name")), V("rname")),
          TriplePattern(V("c"), I(P("name")), V("cname"))))
      run(s, dir, gp)
        .select(str("cname").as("c_name"), str("rname").as("r_name"))
        .orderBy(col("c_name"))
    },

    // transitive closure + over the 3-level locatedIn chain (§2.7)
    "sp9_path_plus" -> { (s, dir) =>
      val gp = PathPattern(V("x"), POneOrMore(PLink(P("locatedIn"))), V("y"))
      run(s, dir, gp)
        .select(str("x").as("x"), str("y").as("y"))
        .orderBy(col("x"), col("y"))
    },

    // zero-or-more from a fixed start (§2.7)
    "sp10_path_star" -> { (s, dir) =>
      val gp = PathPattern(I(TpchRdf.ns + "nation/3"),
        PZeroOrMore(PLink(P("locatedIn"))), V("y"))
      run(s, dir, gp).select(str("y").as("y")).orderBy(col("y"))
    },

    // bound-subject transitive closure over the longest :locatedIn chain
    // (§2.7): the seeded-fixpoint path — 3 hops from one customer
    "sp28_path_seeded" -> { (s, dir) =>
      val gp = PathPattern(I(TpchRdf.ns + "customer/7"),
        POneOrMore(PLink(P("locatedIn"))), V("y"))
      run(s, dir, gp).select(str("y").as("y")).orderBy(col("y"))
    },

    // temporal value system (§2.8): date + dayTimeDuration, dateTime
    // subtraction -> canonical duration, TZ accessor
    "sp27_date_arith" -> { (s, dir) =>
      import graft.model.Term
      val gp = OrderBy(
        Extend(
          Extend(
            Extend(
              Bgp(TriplePattern(V("o"), I(P("orderdate")), V("d"))),
              "due", EFn("+", EVar("d"),
                ELit("P30D", Term.XsdDayTimeDuration))),
            "age", EFn("-", EFn("xsd:dateTime", EVar("d")),
              ELit("1990-01-01T00:00:00", Term.XsdDateTime))),
          "tzs", EFn("TZ", EVar("d"))),
        Seq(EVar("o") -> true))
      run(s, dir, gp).select(str("o").as("o"), str("due").as("due"),
        str("age").as("age"), str("tzs").as("tzs"))
    },

    // GRAPH <iri> scoping + cross-graph join (§2.9)
    "sp11_graph" -> { (s, dir) =>
      val gp = Join(
        GraphPat(I(TpchRdf.G_SUPPLIERS),
          Bgp(TriplePattern(V("sup"), I(P("name")), V("sname")),
            TriplePattern(V("sup"), I(P("inNation")), V("n")))),
        Bgp(TriplePattern(V("n"), I(P("name")), V("nname"))))
      run(s, dir, gp)
        .select(str("sname").as("s_name"), str("nname").as("n_name"))
        .orderBy(col("s_name"))
    },

    // GRAPH ?g: iterate named graphs, bind the graph IRI (§2.9)
    "sp12_graph_var" -> { (s, dir) =>
      val gp = GraphPat(V("g"),
        Bgp(TriplePattern(V("sup"), I(P("name")), V("sname"))))
      run(s, dir, gp).select(str("g").as("g"), str("sname").as("s_name"))
        .orderBy(col("s_name"))
    },

    // CONSTRUCT template instantiation (§2.9)
    "sp13_construct" -> { (s, dir) =>
      val template = Seq(
        TriplePattern(V("c"), I(P("segment")), V("seg")),
        TriplePattern(V("c"), I(P("type")), L.str("customer")))
      val gp = Bgp(TriplePattern(V("c"), I(P("mktsegment")), V("seg")))
      QueryExec.construct(template, gp, TpchRdf.quads(s, dir))
        .select(col("s")("lex").as("s"), col("p")("lex").as("p"),
          col("o")("lex").as("o"))
        .orderBy(col("s"), col("p"), col("o"))
    },

    // ASK (§2.9)
    "sp14_ask" -> { (s, dir) =>
      val gp = Filter(EFn(">", EVar("b"),
        ELit("9000", graft.model.Term.XsdDecimal)),
        Bgp(TriplePattern(V("c"), I(P("acctbal")), V("b"))))
      QueryExec.ask(gp, TpchRdf.quads(s, dir))
    },

    // BIND arithmetic + string builtins (§2.2 Extend, §2.8)
    "sp15_bind" -> { (s, dir) =>
      val gp = Extend(
        Extend(Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
          "dblbal", EFn("*", EVar("b"), ELit.int(2))),
        "namelen", EFn("STRLEN", EVar("cname")))
      run(s, dir, gp)
        .select(str("cname").as("c_name"), dbl("dblbal").as("dblbal"),
          int64("namelen").cast(LongType).as("namelen"))
        .orderBy(col("c_name"))
    },

    // ORDER BY term ordering + OFFSET/LIMIT through the engine (§2.5)
    "sp16_orderby_slice" -> { (s, dir) =>
      val gp = Slice(OrderBy(
        Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
          TriplePattern(V("c"), I(P("acctbal")), V("b"))),
        Seq(EVar("b") -> false, EVar("cname") -> true)), 5, 10)
      run(s, dir, gp).select(str("cname").as("c_name"), dbl("b").as("bal"))
    },

    // SPARQL UPDATE: INSERT..WHERE then query the updated store (§2.10)
    "sp17_update" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val upd = DeleteInsert(
        delete = Nil,
        insert = Seq(DefaultGraphPat ->
          TriplePattern(V("c"), I(P("vip")), L.str("true"))),
        where = Filter(EFn(">", EVar("b"),
          ELit("7000", graft.model.Term.XsdDecimal)),
          Bgp(TriplePattern(V("c"), I(P("acctbal")), V("b")))))
      val updated = UpdateExec(upd, quads)
      val gp = Group(Bgp(TriplePattern(V("c"), I(P("vip")), V("v"))),
        Nil, Seq("cnt" -> AggCall("COUNT_STAR", None)))
      QueryExec.select(gp, updated).select(int64("cnt").as("cnt"))
    },

    // CLEAR GRAPH + whole-store count: checks quad construction itself
    "sp18_clear_graph" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val updated = UpdateExec(ClearGraph(Some(TpchRdf.G_SUPPLIERS)), quads)
      updated.agg(count(lit(1)).as("cnt"))
    },

    // GROUP_CONCAT (distinct, sorted) + SAMPLE + MIN aggregates (§2.4)
    "sp25_groupconcat" -> { (s, dir) =>
      val gp = Group(
        Bgp(TriplePattern(V("c"), I(P("inNation")), V("n")),
          TriplePattern(V("c"), I(P("mktsegment")), V("seg")),
          TriplePattern(V("c"), I(P("acctbal")), V("b")),
          TriplePattern(V("n"), I(P("name")), V("nname"))),
        Seq("nname"),
        Seq("segs" -> AggCall("GROUP_CONCAT", Some(EVar("seg")),
          distinct = true, separator = ","),
          "minbal" -> AggCall("MIN", Some(EVar("b"))),
          "anybal" -> AggCall("SAMPLE", Some(EVar("b")))))
      run(s, dir, gp)
        .select(str("nname").as("n_name"), str("segs").as("segs"),
          dbl("minbal").as("minbal"), dbl("anybal").as("anybal"))
        .orderBy(col("n_name"))
    },

    // subselect: per-nation AVG joined back, FILTER above-average (§2.4)
    "sp19_subselect" -> { (s, dir) =>
      val gp = OrderBy(Filter(EFn(">", EVar("b"), EVar("av")),
        Join(
          Bgp(TriplePattern(V("c"), I(P("inNation")), V("n")),
            TriplePattern(V("c"), I(P("acctbal")), V("b")),
            TriplePattern(V("c"), I(P("name")), V("cname"))),
          Group(Bgp(TriplePattern(V("c2"), I(P("inNation")), V("n")),
            TriplePattern(V("c2"), I(P("acctbal")), V("b2"))),
            Seq("n"), Seq("av" -> AggCall("AVG", Some(EVar("b2"))))))),
        Seq(EVar("cname") -> true))
      run(s, dir, gp).select(str("cname").as("c_name"))
    })

  private val cIri = s"'${TpchRdf.ns}customer/' || c_custkey"
  private val nIriC = s"'${TpchRdf.ns}nation/' || c_nationkey"
  private val nIri = s"'${TpchRdf.ns}nation/' || n_nationkey"
  private val rIriN = s"'${TpchRdf.ns}region/' || n_regionkey"
  private val rIri = s"'${TpchRdf.ns}region/' || r_regionkey"

  val oracle: Map[String, String] = Map(
    "sp1_bgp_filter" ->
      """SELECT c_name, CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS DOUBLE) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND CAST(c_acctbal AS DECIMAL(38,2)) > 5000
        ORDER BY c_name""",
    "sp2_optional" ->
      """SELECT c_name,
        CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS DOUBLE) AS bigprice
        FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND CAST(o_totalprice AS DECIMAL(38,2)) > 300000
        ORDER BY c_name, bigprice NULLS FIRST""",
    "sp3_union" ->
      """SELECT name, src FROM (
        SELECT c_name AS name, 'customer' AS src FROM customer
        UNION ALL SELECT s_name AS name, 'supplier' AS src FROM supplier)
        ORDER BY name, src""",
    "sp4_minus" ->
      """SELECT c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND CAST(o_totalprice AS DECIMAL(38,2)) > 400000)
        ORDER BY c_name""",
    "sp5_exists" ->
      """SELECT c_name, c_mktsegment AS seg FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND CAST(o_totalprice AS DECIMAL(38,2)) > 300000)
        ORDER BY c_name""",
    "sp33_exists_subst" ->
      """SELECT c_name, c_mktsegment AS seg FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_name""",
    "sp34_lateral_exists" ->
      """SELECT c_name, CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS DOUBLE)
          AS price
        FROM customer JOIN orders o ON o.o_custkey = c_custkey
        WHERE EXISTS (SELECT 1 FROM orders o2
          WHERE o2.o_custkey = c_custkey
            AND o2.o_orderkey != o.o_orderkey)
        ORDER BY c_name, price""",
    "sp6_values" ->
      """SELECT c_name, r_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE') ORDER BY c_name""",
    "sp7_agg" ->
      """SELECT n_name, count(*) AS cnt,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS total,
        CAST(max(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS maxbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "sp8_path_seq" ->
      """SELECT c_name, r_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey ORDER BY c_name""",
    "sp9_path_plus" ->
      s"""WITH e AS (
        SELECT $cIri AS src, $nIriC AS dst FROM customer
        UNION ALL SELECT $nIri, $rIriN FROM nation
        UNION ALL SELECT $rIri, '${TpchRdf.WORLD}' FROM region)
        SELECT src AS x, dst AS y FROM (
          SELECT src, dst FROM e
          UNION SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src
          UNION SELECT a.src, c.dst FROM e a JOIN e b ON a.dst = b.src
            JOIN e c ON b.dst = c.src)
        ORDER BY x, y""",
    "sp10_path_star" ->
      s"""SELECT y FROM (
        SELECT '${TpchRdf.ns}nation/3' AS y
        UNION ALL SELECT $rIriN FROM nation WHERE n_nationkey = 3
        UNION ALL SELECT '${TpchRdf.WORLD}') ORDER BY y""",
    "sp28_path_seeded" ->
      s"""SELECT y FROM (
        SELECT $nIriC AS y FROM customer WHERE c_custkey = 7
        UNION ALL SELECT $rIriN FROM customer
          JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = 7
        UNION ALL SELECT '${TpchRdf.WORLD}') ORDER BY y""",
    "sp27_date_arith" ->
      s"""SELECT '${TpchRdf.ns}order/' || o_orderkey AS o,
        CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due,
        'P' || date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
          || 'D' AS age,
        '' AS tzs
        FROM orders ORDER BY o""",
    "sp11_graph" ->
      """SELECT s_name, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey ORDER BY s_name""",
    "sp12_graph_var" ->
      s"""SELECT '${TpchRdf.G_SUPPLIERS}' AS g, s_name FROM supplier
        ORDER BY s_name""",
    "sp13_construct" ->
      s"""SELECT s, p, o FROM (
        SELECT $cIri AS s, '${P("segment")}' AS p, c_mktsegment AS o FROM customer
        UNION SELECT $cIri, '${P("type")}', 'customer' FROM customer)
        ORDER BY s, p, o""",
    "sp14_ask" ->
      """SELECT EXISTS (SELECT 1 FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 9000) AS result""",
    "sp15_bind" ->
      """SELECT c_name,
        CAST(CAST(c_acctbal AS DECIMAL(38,2)) * 2 AS DOUBLE) AS dblbal,
        length(c_name) AS namelen
        FROM customer ORDER BY c_name""",
    "sp16_orderby_slice" ->
      """SELECT c_name, CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS DOUBLE) AS bal
        FROM customer
        ORDER BY CAST(c_acctbal AS DECIMAL(38,2)) DESC, c_name
        LIMIT 10 OFFSET 5""",
    "sp17_update" ->
      """SELECT count(*) AS cnt FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 7000""",
    "sp18_clear_graph" ->
      """SELECT (SELECT count(*) * 5 FROM customer)
        + (SELECT count(*) * 3 FROM nation)
        + (SELECT count(*) * 4 FROM region)
        + (SELECT count(*) * 5 FROM orders) AS cnt""",
    "sp25_groupconcat" ->
      """SELECT n_name,
        array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs,
        CAST(min(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS minbal,
        CAST(min(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS anybal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "sp19_subselect" ->
      """SELECT c_name FROM customer JOIN (
        SELECT c_nationkey AS nk,
          CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) / count(*) AS av
        FROM customer GROUP BY c_nationkey) t ON c_nationkey = nk
        WHERE CAST(c_acctbal AS DOUBLE) > av ORDER BY c_name""")
}
