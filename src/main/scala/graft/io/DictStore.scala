package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary term encoding — the v2 performance path (SURVEY.md §4.2,
  * §7.2-10), mirroring the reference's fixed-size term encoding
  * (oxigraph: lib/oxigraph/src/storage/numeric_encoder.rs · EncodedTerm /
  * StrHash + id2str): joins, dedup and shuffles operate on 8-byte ids
  * instead of 4-field string structs; lexical forms are joined back only
  * at output projection (the reference's lazy decode).
  *
  * Ids are xxhash64 over all four term fields. 64-bit collisions over a
  * realistic vocabulary (~1e9 terms -> ~3% birthday-collision risk at
  * 1e9, ~0 at 1e8) make this a demonstrator; the round-2 integration
  * uses two 64-bit hashes (128-bit, like the reference's StrHash).
  */
object DictStore {

  /** id for a term struct column. */
  def termId(t: Column): Column =
    xxhash64(t("kind"), coalesce(t("lex"), lit("")),
      coalesce(t("dt"), lit("")), coalesce(t("lang"), lit("")))

  /** 128-bit id: two independently-seeded xxhash64 halves (the salt
    * literal acts as the seed), like the reference's 128-bit StrHash —
    * birthday-collision risk at 1e12 terms is ~1e-14, safe to treat as
    * injective at any realistic vocabulary.
    */
  def termId2(t: Column): Column = {
    def half(salt: Int) =
      xxhash64(lit(salt), t("kind"), coalesce(t("lex"), lit("")),
        coalesce(t("dt"), lit("")), coalesce(t("lang"), lit("")))
    struct(half(1).as("h1"), half(2).as("h2"))
  }

  /** Encode a quad table: (ids DF, dictionary DF id -> term). */
  def encode(quads: DataFrame): (DataFrame, DataFrame) = {
    val enc = quads.select(
      termId(col("g")).as("g_id"), termId(col("s")).as("s_id"),
      termId(col("p")).as("p_id"), termId(col("o")).as("o_id"))
    val dict = Seq("g", "s", "p", "o")
      .map(c => quads.select(termId(col(c)).as("id"), col(c).as("term")))
      .reduce(_ unionByName _)
      .dropDuplicates("id")
    (enc, dict)
  }

  /** Decode an id column back to a term struct by dictionary join. */
  def decode(df: DataFrame, dict: DataFrame, idCol: String,
      outCol: String): DataFrame =
    df.join(dict.select(col("id").as(idCol), col("term").as(outCol)), idCol)
      .drop(idCol)
}
