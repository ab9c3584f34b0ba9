package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.algebra.Algebra.GraphPattern

/** SERVICE evaluation dispatch — the Spark analogue of the reference's
  * pluggable federation hook (oxigraph: lib/spareval/src/service.rs ·
  * `ServiceHandler`, registered via `QueryEvaluator::with_service_handler`;
  * the HTTP implementation lives in lib/oxigraph/src/sparql/http/ and is
  * feature-gated).
  *
  * This build has zero egress, so there is no default HTTP handler —
  * exactly the reference compiled without `http-client`: an unhandled
  * SERVICE errors, and `SERVICE SILENT` turns that failure into the unit
  * solution (SPARQL 1.1 Federated Query §2.2). Callers may register a
  * handler per endpoint IRI; the handler receives the inner graph pattern
  * and returns a solution DataFrame (one term-struct column per variable,
  * NULL = unbound), which then joins into the enclosing group like any
  * other pattern.
  */
object ServiceExec {

  /** `eval` maps the SERVICE body to a solution DataFrame.
    * `totalBindings` declares that no returned binding is NULL — it lets
    * the translator keep the equi-join fast path (a handler that can
    * return partial solutions must set it false and accept the
    * compatibility-join fallback).
    */
  final case class Handler(eval: (GraphPattern, SparkSession) => DataFrame,
      totalBindings: Boolean = true)

  private val handlers =
    new scala.collection.concurrent.TrieMap[String, Handler]

  def register(endpoint: String, h: Handler): Unit =
    handlers.put(endpoint, h)
  def register(endpoint: String,
      eval: (GraphPattern, SparkSession) => DataFrame): Unit =
    handlers.put(endpoint, Handler(eval))
  def unregister(endpoint: String): Unit = handlers.remove(endpoint)
  def get(endpoint: String): Option[Handler] = handlers.get(endpoint)
}
