package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.algebra.Algebra._
import graft.exec.QueryExec
import graft.io.{Tables, TpchRdf}
import graft.io.TpchRdf.P
import graft.ops.Events
import graft.update.UpdateExec

/** Coverage widening: window functions, ROLLUP, range + as-of joins,
  * DESCRIBE, negated/zero-or-one property paths, string builtins through
  * the SPARQL engine, INSERT DATA, approximate aggregates.
  */
object Extra {
  private val D = DecimalType(38, 6)

  type Q = (SparkSession, String) => DataFrame

  // ---- raw sketch outputs (golden/bounds-netted in GoldenSpec) -------
  // The queries-map sketch entries are ORACLE GATES (r12): estimate vs
  // in-Spark exact with measured-bound booleans, so the driver can
  // hash-verify them. The raw estimates keep their committed nets.
  private[graft] def rawApproxDistinct(s: SparkSession,
      dir: String): DataFrame =
    Tables(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))
  private[graft] def rawHllMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    graft.ops.Sketches.hllMerge(graft.ops.Sketches.hllPartials(
        li, Seq("l_returnflag"), col("l_partkey")), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_distinct"))
      .join(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_distinct")),
        "l_returnflag")
      .orderBy(col("l_returnflag"))
  }
  private[graft] def rawKll(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.kllMerge(graft.ops.Sketches.kllPartials(
        Tables(s, dir, "lineitem"), Seq("l_returnflag"), col("l_quantity")),
      Seq("l_returnflag"), Seq(0.5, 0.9))
      .select(col("l_returnflag"), col("q50"), col("q90"))
      .orderBy(col("l_returnflag"))
  private[graft] def rawTheta(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val pa = graft.ops.Sketches.thetaMerge(graft.ops.Sketches
      .thetaPartials(li.where(col("l_returnflag") === "A"), Nil,
        col("l_partkey")), Nil)
    val pb = graft.ops.Sketches.thetaMerge(graft.ops.Sketches
      .thetaPartials(li.where(col("l_returnflag") === "R"), Nil,
        col("l_partkey")), Nil)
    graft.ops.Sketches.thetaSetOps(pa, pb, Nil)
      .select(col("approx_intersection"), col("approx_difference"))
  }

  val queries: Map[String, Q] = Map(
    // box sentinel (r12, verdict #4): a fixed full-scan aggregate whose
    // plan NEVER changes round to round — per-round drift on this query
    // is host noise by definition, so bench-total swings decompose into
    // box drift (sentinel moved) vs code regression (sentinel flat)
    "q00_box_sentinel" -> { (s, dir) =>
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(D)).cast(StringType).cast(DoubleType)
          .as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast(StringType)
          .cast(DoubleType).as("sum_price"))
    },

    // window functions: ranking + running aggregate per partition
    "q16_window" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").where(col("l_suppkey") < 20)
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).cast(LongType).as("rn"),
        sum(col("l_quantity").cast(D)).over(
          w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(StringType).cast(DoubleType).as("running_qty"),
        lag(col("l_orderkey"), 1).over(w).as("prev_order"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // grouping sets via ROLLUP (extension beyond SPARQL; SURVEY §2.4)
    "q17_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast(StringType)
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // range (theta) join: price falls in a bracket table
    "q18_range_join" -> { (s, dir) =>
      import s.implicits._
      val brackets = Seq((0, 0.0, 1000.0), (1, 1000.0, 10000.0),
        (2, 10000.0, 50000.0), (3, 50000.0, 1e9))
        .toDF("bracket", "lo", "hi")
      Tables(s, dir, "lineitem")
        .join(broadcast(brackets),
          col("l_extendedprice") >= col("lo") &&
            col("l_extendedprice") < col("hi"))
        .groupBy(col("bracket"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(D)).cast(StringType)
            .cast(DoubleType).as("sum_price"))
        .orderBy(col("bracket"))
    },

    // as-of join: for each 'error' event, the most recent prior 'login'
    // by the same user (union + running last_value: the scalable shape —
    // one shuffle on user_id, no per-row subqueries)
    "q19_asof_join" -> { (s, dir) =>
      val ev = Events.read(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
      val logins = ev.where(col("event_type") === "login")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      errors.unionByName(logins)
        .withColumn("login_ts",
          last(when(col("side") === 1, col("ts")), ignoreNulls = true).over(w))
        .where(col("side") === 0)
        .select(col("user_id"), col("event_id"),
          expr("(ts - login_ts) div 1000000000").as("secs_since_login"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // mergeable HLL sketch workflow gate (r12): per-group partials
    // unioned to the estimate, compared in-Spark against the exact
    // distinct count (which the oracle recomputes); measured rel err
    // <= 0.0095 at sf0.01/0.1 — bound 0.05
    "q23_hll_merge" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val partials = graft.ops.Sketches.hllPartials(
        li, Seq("l_returnflag"), col("l_partkey"))
      graft.ops.Sketches.hllMerge(partials, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("approx_distinct"))
        .join(li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_distinct")),
          "l_returnflag")
        .select(col("l_returnflag"), col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("within_bound"))
        .orderBy(col("l_returnflag"))
    },

    // mergeable KLL quantile workflow gate (r12): merged per-group
    // estimates rank-checked in-Spark against the raw data (tie-safe
    // two-sided: count(v<=est)/n >= q-eps AND count(v<est)/n <= q+eps);
    // measured rank err <= 0.005, eps = 0.05 = 3x the k=200 KLL 99%
    // normalized rank error (compaction is randomized — GoldenGen note)
    "q25_kll_quantiles" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val est = rawKll(s, dir)
      val eps = 0.05
      li.join(broadcast(est), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_quantity") <= col("q50"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("l_quantity") < col("q50"), 1L).otherwise(0L))
            .as("lt50"),
          sum(when(col("l_quantity") <= col("q90"), 1L).otherwise(0L))
            .as("le90"),
          sum(when(col("l_quantity") < col("q90"), 1L).otherwise(0L))
            .as("lt90"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("le50") >= col("n_rows") * (0.5 - eps) &&
            col("lt50") <= col("n_rows") * (0.5 + eps)).as("q50_ok"),
          (col("le90") >= col("n_rows") * (0.9 - eps) &&
            col("lt90") <= col("n_rows") * (0.9 + eps)).as("q90_ok"))
        .orderBy(col("l_returnflag"))
    },

    // theta-sketch set-algebra gate (r12): intersection/difference
    // estimates compared in-Spark against the exact distinct-set ops
    // (which the oracle recomputes); measured rel err 0 at sf0.01
    // (exact mode) and 0.0064 at sf0.1 — tolerance 5% of the union + 1
    "q26_theta_overlap" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      // (r13 A/B: persisting aSet/rSet measured SLOWER — 0.90 → 1.10 s —
      // ReusedExchange already shares the scan+distinct subtrees within
      // the single action; the cache barrier only added jobs.)
      val aSet = li.where(col("l_returnflag") === "A")
        .select("l_partkey").distinct()
      val rSet = li.where(col("l_returnflag") === "R")
        .select("l_partkey").distinct()
      val exact = aSet.join(rSet, Seq("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("exact_inter"))
        .crossJoin(broadcast(aSet.join(rSet, Seq("l_partkey"), "left_anti")
          .agg(count(lit(1)).as("exact_diff"))))
      rawTheta(s, dir).crossJoin(broadcast(exact))
        .withColumn("tol",
          (col("exact_inter") + col("exact_diff")) * 0.05 + 1.0)
        .select(col("exact_inter"), col("exact_diff"),
          (abs(col("approx_intersection") - col("exact_inter")) <=
            col("tol")).as("inter_ok"),
          (abs(col("approx_difference") - col("exact_diff")) <=
            col("tol")).as("diff_ok"))
    },

    // skew-salted join: hot orderkeys scattered over salt sub-keys,
    // result provably equal to the plain join (oracle-checked)
    "q24_salted_join" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.ops.Skew.saltedJoin(li, o, "l_orderkey", 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast(StringType)
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    },

    // approximate-distinct gate (r12): HLL++ estimate compared in-Spark
    // against the exact count (which the oracle recomputes); measured
    // rel err <= 0.027 at sf0.01/0.1 (default rsd 0.05) — bound 0.1
    "q20_approx_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.1).as("within_bound"))
        .orderBy(col("l_returnflag"))
    },

    // DESCRIBE a fixed resource (§2.9)
    "sp20_describe" -> { (s, dir) =>
      val gp = Bgp(TriplePattern(V("c"), I(P("name")), V("n")))
      QueryExec.describe(
        Filter(EFn("=", EFn("STR", EVar("c")),
          ELit.str(TpchRdf.ns + "customer/0")), gp), "c",
        TpchRdf.source(s, dir))
        .select(col("s")("lex").as("s"), col("p")("lex").as("p"),
          col("o")("lex").as("o"))
        .orderBy(col("p"), col("o"))
    },

    // negated property set !(:inNation|:locatedIn) over customers (§2.7)
    "sp21_path_neg" -> { (s, dir) =>
      val gp = Join(
        PathPattern(V("c"), PNeg(Seq(P("inNation"), P("locatedIn"),
          P("name"))), V("o")),
        Bgp(TriplePattern(V("c"), I(P("acctbal")), V("b"))))
      QueryExec.select(gp, TpchRdf.source(s, dir))
        .select(col("c")("lex").as("c"), col("o")("lex").as("o"))
        .orderBy(col("c"), col("o"))
    },

    // zero-or-one path (§2.7): region :locatedIn? from region subjects
    "sp22_path_zero_one" -> { (s, dir) =>
      val gp = Join(
        Bgp(TriplePattern(V("r"), I(P("name")), V("rn")),
          TriplePattern(V("r"), I(P("locatedIn")), I(TpchRdf.WORLD))),
        PathPattern(V("r"), PZeroOrOne(PLink(P("locatedIn"))), V("y")))
      QueryExec.select(gp, TpchRdf.source(s, dir))
        .select(col("rn")("lex").as("r_name"), col("y")("lex").as("y"))
        .orderBy(col("r_name"), col("y"))
    },

    // string builtins through the engine: STRBEFORE/STRAFTER/REPLACE/
    // REGEX/SUBSTR/STRLEN (§2.8)
    "sp23_string_fns" -> { (s, dir) =>
      val gp = Filter(EFn("REGEX", EVar("cname"), ELit.str("^Customer#0*1[0-9]$")),
        Extend(
          Extend(
            Extend(Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
              TriplePattern(V("c"), I(P("acctbal")), V("b"))),
              "before", EFn("STRBEFORE", EVar("cname"), ELit.str("#"))),
            "after", EFn("STRAFTER", EVar("cname"), ELit.str("#"))),
          "masked", EFn("REPLACE", EVar("cname"), ELit.str("[0-9]"),
            ELit.str("x"))))
      QueryExec.select(gp, TpchRdf.source(s, dir))
        .select(col("cname")("lex").as("c_name"),
          col("before")("lex").as("before"),
          col("after")("lex").as("after"),
          col("masked")("lex").as("masked"))
        .orderBy(col("c_name"))
    },

    // set ops beyond SPARQL: INTERSECT / EXCEPT (§2.6 internal rewrites)
    "q21_intersect" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast(IntegerType).as("nk"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_nationkey").cast(IntegerType).as("nk"))
      c.intersect(sup).orderBy(col("nk"))
    },
    "q22_except" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast(IntegerType).as("nk"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_nationkey").cast(IntegerType).as("nk"))
      c.except(sup).orderBy(col("nk"))
    },

    // the rest of the grouping-sets family (r11): CUBE and explicit
    // GROUPING SETS — one shuffle each (Spark expands the sets map-side
    // via Expand, partial-aggregates, then exchanges once on the
    // grouping-id-extended key; no per-set rescan at any scale)
    "q27_cube" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast(StringType)
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    "q28_grouping_sets" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast(StringType)
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // boolean logic + conditionals through the engine (§2.8 EBV)
    "sp26_conditional" -> { (s, dir) =>
      val gp = OrderBy(Filter(
        EFn("||", EFn("!", EFn("=", EVar("tier"), ELit.str("low"))),
          EFn(">", EFn("STRLEN", EVar("cname")), ELit.int(100))),
        Extend(
          Bgp(TriplePattern(V("c"), I(P("name")), V("cname")),
            TriplePattern(V("c"), I(P("acctbal")), V("b"))),
          "tier", EFn("IF",
            EFn(">=", EVar("b"), ELit("5000", graft.model.Term.XsdDecimal)),
            ELit.str("high"), ELit.str("low")))),
        Seq(EVar("cname") -> true))
      QueryExec.select(gp, TpchRdf.source(s, dir))
        .select(col("cname")("lex").as("c_name"),
          col("tier")("lex").as("tier"))
    },

    // graph management COPY/ADD/DROP chain through the update text
    // parser (§2.10): copy suppliers out, merge them into the default
    // graph, drop the scratch graph
    "sp29_graph_mgmt" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val updated = UpdateExec.executeText(
        s"""COPY GRAPH <${TpchRdf.G_SUPPLIERS}> TO GRAPH <urn:x-graft:tmp> ;
            ADD GRAPH <urn:x-graft:tmp> TO DEFAULT ;
            DROP GRAPH <urn:x-graft:tmp>""", quads)
      updated.agg(count(lit(1)).as("cnt"))
    },

    // full graph lifecycle through the update text parser (§2.10):
    // CREATE registers, INSERT DATA targets two graphs, DROP removes
    // one, CLEAR empties the other — total count returns to base and
    // the only surviving named-graph quads are the suppliers
    "sp30_graph_lifecycle" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val updated = UpdateExec.executeText(
        """CREATE GRAPH <urn:x-graft:t1> ;
           INSERT DATA {
             GRAPH <urn:x-graft:t1> { <urn:x-graft:a> <urn:x-graft:p> "1" .
                                      <urn:x-graft:a> <urn:x-graft:p> "2" }
             GRAPH <urn:x-graft:t2> { <urn:x-graft:a> <urn:x-graft:p> "3" } } ;
           DROP SILENT GRAPH <urn:x-graft:t2> ;
           CLEAR GRAPH <urn:x-graft:t1>""", quads)
      updated.agg(count(lit(1)).as("cnt"),
        count(when(col("g")("kind") === graft.model.Term.IriKind, 1))
          .as("named_cnt"))
    },

    // GRAPH-targeted DELETE/INSERT templates + WITH (§2.10): insert
    // matches into a named graph, then WITH-scope a delete to it
    "sp31_update_with_graph" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val updated = UpdateExec.executeText(
        s"""INSERT { GRAPH <urn:x-graft:vip> { ?c <urn:x-graft:vip> ?b } }
            WHERE { ?c <${P("acctbal")}> ?b . FILTER(?b > 7000) } ;
            WITH <urn:x-graft:vip> DELETE { ?c ?p ?b }
            WHERE { ?c ?p ?b . FILTER(?b > 9000) }""", quads)
      updated.where(col("g")("kind") === graft.model.Term.IriKind &&
        col("g")("lex") === "urn:x-graft:vip")
        .agg(count(lit(1)).as("cnt"))
    },

    // USING re-scopes the update WHERE like FROM (§2.10): match
    // suppliers inside their named graph, write into the default graph
    "sp32_update_using" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val updated = UpdateExec.executeText(
        s"""INSERT { ?s <urn:x-graft:snapshot> ?b }
            USING <${TpchRdf.G_SUPPLIERS}>
            WHERE { ?s <${P("acctbal")}> ?b }""", quads)
      updated.where(col("p")("lex") === "urn:x-graft:snapshot")
        .agg(count(lit(1)).as("cnt"),
          count(when(col("g")("kind") === graft.model.Term.DefaultGraphKind,
            1)).as("in_default"))
    },

    // INSERT DATA + DELETE DATA ground quads (§2.10)
    "sp24_insert_data" -> { (s, dir) =>
      val quads = TpchRdf.store(s, dir)
      val added = UpdateExec(InsertData(Seq(
        (I("urn:x-graft:g"), TriplePattern(I("urn:x-graft:s"),
          I("urn:x-graft:p"), L.str("v1"))),
        (I("urn:x-graft:g"), TriplePattern(I("urn:x-graft:s"),
          I("urn:x-graft:p"), L.str("v2"))))), quads)
      val afterDelete = UpdateExec(DeleteData(Seq(
        (I("urn:x-graft:g"), TriplePattern(I("urn:x-graft:s"),
          I("urn:x-graft:p"), L.str("v2"))))), added)
      afterDelete.agg(count(lit(1)).as("cnt"))
    })

  val oracle: Map[String, String] = Map(
    "q00_box_sentinel" ->
      """SELECT count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM lineitem""",
    // r12 sketch gates: the oracle recomputes the exact side and
    // asserts the bound booleans (measured margins in the query docs)
    "q20_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        true AS within_bound FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q23_hll_merge" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct,
        true AS within_bound FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q25_kll_quantiles" ->
      """SELECT l_returnflag, count(*) AS n_rows, true AS q50_ok,
        true AS q90_ok FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q26_theta_overlap" ->
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem
          WHERE l_returnflag = 'A'),
        r AS (SELECT DISTINCT l_partkey FROM lineitem
          WHERE l_returnflag = 'R'),
        i AS (SELECT count(*) c FROM (SELECT * FROM a INTERSECT SELECT * FROM r)),
        d AS (SELECT count(*) c FROM (SELECT * FROM a EXCEPT SELECT * FROM r))
        SELECT i.c AS exact_inter, d.c AS exact_diff,
          true AS inter_ok, true AS diff_ok FROM i, d""",
    "q16_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        row_number() OVER w AS rn,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER
          (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_qty,
        lag(l_orderkey, 1) OVER w AS prev_order
        FROM lineitem WHERE l_suppkey < 20
        WINDOW w AS (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ORDER BY l_suppkey, rn""",
    "q17_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q18_range_join" ->
      """SELECT bracket, count(*) AS n,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM lineitem JOIN (VALUES (0, 0.0, 1000.0), (1, 1000.0, 10000.0),
          (2, 10000.0, 50000.0), (3, 50000.0, 1e9)) AS b(bracket, lo, hi)
        ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY bracket ORDER BY bracket""",
    "q19_asof_join" ->
      """SELECT e.user_id, e.event_id,
        (epoch_ns(e.ts) - epoch_ns(l.ts)) // 1000000000 AS secs_since_login
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'login') l
        ON e.user_id = l.user_id AND e.ts >= l.ts
        ORDER BY e.user_id, e.event_id""",
    "q24_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
          AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q21_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
        INTERSECT SELECT CAST(s_nationkey AS INTEGER) FROM supplier
        ORDER BY nk""",
    "q22_except" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
        EXCEPT SELECT CAST(s_nationkey AS INTEGER) FROM supplier
        ORDER BY nk""",
    "q27_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q28_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "sp26_conditional" ->
      """SELECT c_name,
        CASE WHEN CAST(c_acctbal AS DECIMAL(38,2)) >= 5000
          THEN 'high' ELSE 'low' END AS tier
        FROM customer
        WHERE NOT (CASE WHEN CAST(c_acctbal AS DECIMAL(38,2)) >= 5000
            THEN 'high' ELSE 'low' END = 'low')
          OR length(c_name) > 100
        ORDER BY c_name""",
    "sp20_describe" ->
      s"""SELECT s, p, o FROM (
        SELECT '${TpchRdf.ns}customer/' || c_custkey AS s,
               '${P("name")}' AS p, c_name AS o FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${P("acctbal")}', CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR)
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${P("mktsegment")}', c_mktsegment FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${P("inNation")}', '${TpchRdf.ns}nation/' || c_nationkey
          FROM customer WHERE c_custkey = 0
        UNION ALL SELECT '${TpchRdf.ns}customer/' || c_custkey,
          '${P("locatedIn")}', '${TpchRdf.ns}nation/' || c_nationkey
          FROM customer WHERE c_custkey = 0)
        ORDER BY p, o""",
    "sp21_path_neg" ->
      s"""SELECT '${TpchRdf.ns}customer/' || c_custkey AS c, o FROM (
        SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS o
          FROM customer
        UNION ALL SELECT c_custkey, c_mktsegment FROM customer)
        ORDER BY c, o""",
    "sp22_path_zero_one" ->
      s"""SELECT r_name, y FROM (
        SELECT r_name, '${TpchRdf.ns}region/' || r_regionkey AS y FROM region
        UNION ALL SELECT r_name, '${TpchRdf.WORLD}' FROM region)
        ORDER BY r_name, y""",
    "sp23_string_fns" ->
      """SELECT c_name,
        CASE WHEN strpos(c_name, '#') > 0
          THEN substring(c_name, 1, strpos(c_name, '#') - 1) ELSE '' END AS "before",
        CASE WHEN strpos(c_name, '#') > 0
          THEN substring(c_name, strpos(c_name, '#') + 1) ELSE '' END AS "after",
        regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked
        FROM customer WHERE regexp_matches(c_name, '^Customer#0*1[0-9]$')
        ORDER BY c_name""",
    "sp29_graph_mgmt" ->
      """SELECT (SELECT count(*) * 5 FROM customer)
        + (SELECT count(*) * 3 FROM nation)
        + (SELECT count(*) * 4 FROM region)
        + (SELECT count(*) * 5 FROM orders)
        + (SELECT count(*) * 6 FROM supplier) AS cnt""",
    "sp24_insert_data" ->
      """SELECT (SELECT count(*) * 5 FROM customer)
        + (SELECT count(*) * 3 FROM nation)
        + (SELECT count(*) * 4 FROM region)
        + (SELECT count(*) * 5 FROM orders)
        + (SELECT count(*) * 3 FROM supplier) + 1 AS cnt""",
    "sp30_graph_lifecycle" ->
      """SELECT (SELECT count(*) * 5 FROM customer)
        + (SELECT count(*) * 3 FROM nation)
        + (SELECT count(*) * 4 FROM region)
        + (SELECT count(*) * 5 FROM orders)
        + (SELECT count(*) * 3 FROM supplier) AS cnt,
        (SELECT count(*) * 3 FROM supplier) AS named_cnt""",
    "sp31_update_with_graph" ->
      """SELECT count(*) AS cnt FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(38,2)) > 7000
          AND NOT (CAST(c_acctbal AS DECIMAL(38,2)) > 9000)""",
    "sp32_update_using" ->
      """SELECT count(*) AS cnt, count(*) AS in_default FROM supplier""")
}
