package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables

/** Relational operator spine — SURVEY.md §2 checklist exercised directly as
  * DataFrame ops over the TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Determinism rules (oracle hash-matches bit-for-bit):
  *  - per-row arithmetic in double (IEEE ops are engine-independent),
  *    aggregated sums in DECIMAL(38,6) (exact, order-independent);
  *  - averages derived as cast(sum as double)/count, never engine `avg`;
  *  - OUTPUT columns may only be BIGINT/INT, DOUBLE, VARCHAR, BOOLEAN.
  *    Never DECIMAL (str() scale-padding: "9898.90" vs float "9898.9"),
  *    never DATE/TIMESTAMP (datetime.date vs pandas Timestamp repr) —
  *    the driver hash canonicalizes both sides differently. Exact decimal
  *    sums stay internal; cast to DOUBLE (correctly-rounded in both
  *    engines while the scaled value fits 2^53) or VARCHAR at the end;
  *  - every query ends in a total, tie-free ORDER BY mirrored in the SQL.
  */
object Relational {
  private val D = DecimalType(38, 6)
  private def dec(c: Column): Column = c.cast(D)
  /** Exact decimal aggregate -> hash-stable double output column. The
    * VARCHAR hop matters: decimal->string is exact and string->double is
    * correctly rounded in BOTH engines at any magnitude, while DuckDB's
    * direct decimal->double cast is off by 1 ulp once the unscaled value
    * exceeds 2^53 (reached near TPC-H SF1 for scale-6 price sums).
    */
  private def outD(c: Column): Column =
    c.cast(StringType).cast(DoubleType)

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // §2.4 hash aggregation, multiple agg functions, group keys (TPC-H Q1)
    "q1_agg" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          outD(sum(dec(col("l_quantity")))).as("sum_qty"),
          outD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          outD(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // §2.2 scan + filter + project with parquet pushdown; §2.5 limit
    "q2_filter_project" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1999-01-01").cast(TimestampType) &&
          col("l_discount") > 0.05 && col("l_quantity") < 10.0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // §2.3 inner equi-join chain (broadcast-able dims) + agg
    "q3_join_inner" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          outD(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("r_name"))
    },

    // §2.3 left outer join, unmatched rows -> 0 via coalesce
    "q4_join_left" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          outD(coalesce(sum(dec(col("o_totalprice"))), dec(lit(0))))
            .as("sum_price"))
        .orderBy(col("c_custkey"))
    },

    // §2.3 semi join (EXISTS)
    "q5_join_semi" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val big = Tables(s, dir, "orders").where(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // §2.3 anti join (NOT EXISTS)
    "q6_join_anti" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val big = Tables(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // §2.4 DISTINCT aggregate variants
    "q7_agg_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          outD(sum_distinct(dec(col("l_quantity")))).as("sumd_qty"))
        .orderBy(col("l_returnflag"))
    },

    // §2.5 ORDER BY multi-key asc/desc + OFFSET + LIMIT
    "q8_sort_limit_offset" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10).limit(20)
    },

    // §2.6 union + distinct
    "q9_union_distinct" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast(IntegerType).as("nk"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_nationkey").cast(IntegerType).as("nk"))
      c.union(sup).distinct().orderBy(col("nk"))
    },

    // §2.6 VALUES inline data joined into the query
    "q10_values_join" -> { (s, dir) =>
      import s.implicits._
      val v = Seq(("BUILDING", 1), ("AUTOMOBILE", 2), ("MACHINERY", 3))
        .toDF("seg", "code")
      Tables(s, dir, "customer")
        .join(broadcast(v), col("c_mktsegment") === col("seg"))
        .groupBy(col("seg"), col("code"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("code"))
    },

    // §2.8 string scalar functions
    "q11_scalar_strings" -> { (s, dir) =>
      Tables(s, dir, "part")
        .where(col("p_name").startsWith("s"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_name"), 1, 5).as("pre5"),
          length(col("p_name")).cast(LongType).as("len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("bt"),
          instr(col("p_name"), "widget").cast(LongType).as("pos"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"))
        .orderBy(col("p_partkey"))
    },

    // §2.8 numeric scalar functions (abs/ceil/floor/round, integer->decimal division)
    "q12_scalar_numeric" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("absq"),
          ceil(col("l_extendedprice") / 1000.0).as("ceilp"),
          floor(col("l_extendedprice") / 1000.0).as("floorp"),
          round(col("l_discount") * 100.0).cast(LongType).as("disc_pct"),
          (col("l_extendedprice") * col("l_extendedprice")).as("price_sq"),
          sqrt(col("l_quantity")).as("sqrtq"),
          pmod(col("l_partkey"), lit(7L)).as("pk_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // §2.8 date/time extraction
    "q13_scalar_datetime" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast(LongType).as("y"),
          quarter(col("o_orderdate")).cast(LongType).as("q"))
        .agg(count(lit(1)).as("n"),
          outD(sum(dec(col("o_totalprice")))).as("sum_price"),
          date_format(min(to_date(col("o_orderdate"))), "yyyy-MM-dd")
            .as("first_day"),
          date_format(max(to_date(col("o_orderdate"))), "yyyy-MM-dd")
            .as("last_day"))
        .orderBy(col("y"), col("q"))
    },

    // §2.8 hashing functions
    "q14_scalar_hash" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .where(col("c_custkey") < 100)
        .select(col("c_custkey"),
          md5(col("c_name").cast(BinaryType)).as("h_md5"),
          sha2(col("c_name").cast(BinaryType), 256).as("h_sha256"))
        .orderBy(col("c_custkey"))
    },

    // §2.8 conditionals: IF / COALESCE / CASE / NULLIF semantics
    "q15_conditional" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", lit("done"))
            .when(col("o_orderstatus") === "O", lit("open"))
            .otherwise(lit("other")).as("status_word"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
            lit("UNSPECIFIED")).as("prio"),
          when(col("o_totalprice") > 200000.0, col("o_totalprice"))
            .otherwise(lit(null).cast(DoubleType)).as("big_price"))
        .orderBy(col("o_orderkey"))
        .limit(500)
    })

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS net_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05 AND l_quantity < 10.0
        ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    "q3_join_inner" ->
      """SELECT r_name, count(*) AS n_cust,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""",
    "q4_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6))), CAST(0 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q5_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey""",
    "q6_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey""",
    "q7_agg_distinct" ->
      """SELECT l_returnflag,
        count(DISTINCT l_partkey) AS nd_part,
        count(DISTINCT l_suppkey) AS nd_supp,
        CAST(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sumd_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q8_sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20 OFFSET 10""",
    "q9_union_distinct" ->
      """SELECT DISTINCT nk FROM (
        SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
        UNION ALL SELECT CAST(s_nationkey AS INTEGER) AS nk FROM supplier)
        ORDER BY nk""",
    "q10_values_join" ->
      """SELECT seg, code, count(*) AS n_cust
        FROM (VALUES ('BUILDING', 1), ('AUTOMOBILE', 2), ('MACHINERY', 3)) AS v(seg, code)
        JOIN customer ON c_mktsegment = seg
        GROUP BY seg, code ORDER BY code""",
    "q11_scalar_strings" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        substring(p_name, 1, 5) AS pre5, length(p_name) AS len,
        concat(p_brand, '/', p_type) AS bt,
        CAST(instr(p_name, 'widget') AS BIGINT) AS pos,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel
        FROM part WHERE p_name LIKE 's%' ORDER BY p_partkey""",
    "q12_scalar_numeric" ->
      """SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25.0) AS absq,
        CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS ceilp,
        CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS floorp,
        CAST(round(l_discount * 100.0) AS BIGINT) AS disc_pct,
        l_extendedprice * l_extendedprice AS price_sq,
        sqrt(l_quantity) AS sqrtq,
        l_partkey % 7 AS pk_mod
        FROM lineitem WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber""",
    "q13_scalar_datetime" ->
      """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        count(*) AS n,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
        CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_day,
        CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_day
        FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate)
        ORDER BY y, q""",
    "q14_scalar_hash" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
        FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""",
    "q15_conditional" ->
      """SELECT o_orderkey,
        CASE WHEN o_orderstatus = 'F' THEN 'done'
             WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status_word,
        coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS prio,
        CASE WHEN o_totalprice > 200000.0 THEN o_totalprice ELSE NULL END AS big_price
        FROM orders ORDER BY o_orderkey LIMIT 500""")
}
