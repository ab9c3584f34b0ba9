package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator checklist of SURVEY.md §2 realized as named
  * DataFrame programs over the driver's parquet tables; `oracleSql` gives
  * the DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Sparql.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.SparqlText.queries ++
      graft.queries.Extra.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Sparql.oracle ++
      graft.queries.Pipeline.oracle ++ graft.queries.SparqlText.oracle ++
      graft.queries.Extra.oracle
}
