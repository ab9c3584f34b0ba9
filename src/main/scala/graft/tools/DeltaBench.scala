package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftStore
import graft.io.TpchRdf

/** Measures the partition-delta UPDATE path (update/DeltaUpdate)
  * against the full rebuild + save on a persisted predicate-partitioned
  * store — the BASELINE.md 100× evidence for verdict item "pq11/update
  * at scale". Usage: `runMain graft.tools.DeltaBench <sfDir> <workDir>`.
  *
  * The update rewrites ONE predicate (`mktsegment` → `segment2`):
  * the delta path should touch 2 partition directories regardless of
  * store size, while the full rebuild rewrites every partition —
  * O(changed partitions) vs O(store).
  */
object DeltaBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }
    val quads = TpchRdf.quads(spark, sfDir)
    val (_, tSave) = timed {
      GraftStore(quads).save(s"$workDir/store")
    }
    val upd =
      s"""DELETE { ?s <${TpchRdf.P("mktsegment")}> ?o }
         |INSERT { ?s <${TpchRdf.P("segment2")}> ?o }
         |WHERE { ?s <${TpchRdf.P("mktsegment")}> ?o }""".stripMargin
    val (_, tDelta) = timed {
      GraftStore.updateInPlace(spark, s"$workDir/store", upd)
    }
    // undo via the full-rebuild path for the comparison measurement
    val undo = upd.replace("segment2", "__swap__")
      .replace("mktsegment", "segment2")
      .replace("__swap__", "mktsegment")
    val (_, tFull) = timed {
      val st = GraftStore.open(spark, s"$workDir/store")
      val next = st.update(undo)
      GraftStore(next.quads.localCheckpoint(true), next.emptyGraphs)
        .save(s"$workDir/store")
    }
    val n = GraftStore.open(spark, s"$workDir/store").size
    println(s"""{"metric":"delta_update","save_sec":$tSave,""" +
      s""""delta_sec":$tDelta,"full_rebuild_sec":$tFull,""" +
      s""""quads":$n,"sf":"$sfDir"}""")
    spark.stop()
  }
}
