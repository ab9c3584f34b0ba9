package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DictStore, TpchRdf}

/** Dictionary-encoded execution demonstrator: a BGP join chain on 8-byte
  * ids produces the same result as the term-struct path, with joins
  * hashing longs instead of 4-field structs.
  */
class DictStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("id-encoded BGP join chain matches term-struct execution") {
    val quads = TpchRdf.quads(spark, sf)
    val (enc, dict) = DictStore.encode(quads)

    // customer -> nation -> region names, id-space joins, decode at output
    def pat(p: String) = {
      val pid = spark.range(1)
        .select(DictStore.termId(graft.model.Term.iri(TpchRdf.P(p))).as("pid"))
        .head().getLong(0)
      enc.where(col("p_id") === pid)
    }
    val idResult = pat("inNation")
      .select(col("s_id").as("c"), col("o_id").as("n"))
      .join(pat("inRegion").select(col("s_id").as("n"), col("o_id").as("r")),
        "n")
      .join(pat("name").select(col("s_id").as("r"), col("o_id").as("rname")),
        "r")
      .select(col("c"), col("rname"))
    val decoded = DictStore.decode(
      DictStore.decode(idResult, dict, "c", "cterm"), dict, "rname", "rterm")
      .select(col("cterm")("lex").as("c"), col("rterm")("lex").as("rname"))

    // reference: same chain on term structs
    def spat(p: String) = quads.where(
      col("p")("kind") === 0 && col("p")("lex") === TpchRdf.P(p))
    val structResult = spat("inNation")
      .select(col("s").as("cs"), col("o").as("ns"))
      .join(spat("inRegion").select(col("s").as("ns"), col("o").as("rs")),
        "ns")
      .join(spat("name").select(col("s").as("rs"), col("o").as("rn")), "rs")
      .select(col("cs")("lex").as("c"), col("rn")("lex").as("rname"))

    assert(decoded.count() == structResult.count())
    assert(decoded.except(structResult).isEmpty &&
      structResult.except(decoded).isEmpty)
    // sanity: no id collisions across the dictionary at this scale
    val (ids, distinctIds) = {
      val d = DictStore.encode(quads)._2
      (d.count(), d.select("id").distinct().count())
    }
    assert(ids == distinctIds)
  }
}
