package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs, no shuffles
  * until an explicit aggregation) — the per-row work parallelizes
  * embarrassingly at 100 TB.
  */
object TextOps {

  val FingerprintMod = 1000000007L

  /** Whitespace tokens (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles ("n-gram" units for Jaccard/MinHash). */
  def shingles(ws: Column, k: Int = 3): Column =
    when(size(ws) < k, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k))))))

  /** Rolling polynomial fingerprint over characters:
    * h = fold(chars)(h * 31 + code  mod  1e9+7). Deterministic and cheap;
    * used for exact-dup detection without materializing full texts.
    */
  def fingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * 31 + ascii(c), lit(FingerprintMod)))

  // tiny marker-word profiles; honest n-gram/stopword-voting heuristic
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"))

  /** Marker-token count for one language profile. */
  def langScore(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isin(langMarkers(lang): _*)))

  /** Language-ID by stopword-profile voting with a fixed tie order
    * (en > de > es), 'und' when no marker hits.
    */
  def langId(ws: Column): Column = {
    val en = langScore(ws, "en"); val de = langScore(ws, "de")
    val es = langScore(ws, "es")
    when(en === 0 && de === 0 && es === 0, lit("und"))
      .when(en >= de && en >= es, lit("en"))
      .when(de >= es, lit("de"))
      .otherwise(lit("es"))
  }

  /** Quality metrics: all integer-exact (oracle-friendly) plus a derived
    * double ratio (deterministic: int/int division in IEEE doubles).
    */
  def qualityMetrics(doc: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = tokens(col(textCol))
    doc.select(
      col("doc_id"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      size(ws).cast(LongType).as("n_tokens"),
      size(array_distinct(ws)).cast(LongType).as("n_distinct"),
      aggregate(transform(ws, w => length(w)), lit(0),
        (a, x) => a + x).cast(LongType).as("sum_token_len"),
      langScore(ws, "en").cast(LongType).as("n_stopwords"))
      .withColumn("type_token_ratio",
        col("n_distinct").cast(DoubleType) / col("n_tokens"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast(DoubleType) / col("n_tokens"))
  }
}
