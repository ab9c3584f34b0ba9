package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Events

/** Structured Streaming parity for the event operators (SURVEY.md §2.11):
  * the same tumbling-window aggregation as the batch path, driven through
  * readStream + watermark + memory sink over the static events parquet.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  // The driver's events parquet has carried both TIMESTAMP(NANOS) (read
  // as raw int64 nanos via the legacy conf) and TIMESTAMP_MICROS across
  // rounds — probe the physical type once and adapt the stream schema +
  // the micros conversion, mirroring Events.read's normalization.
  private lazy val tsType: DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
  }
  private def eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))
  private def tsMicro = tsType match {
    case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
    case _ => timestamp_micros(expr("ts div 1000"))
  }

  test("streaming N-Quads ingestion equals the batch parse (two waves)") {
    import graft.io.RdfIO
    val dir = java.nio.file.Files.createTempDirectory("ntstream")
    java.nio.file.Files.writeString(dir.resolve("w1.nq"),
      """<http://x/a> <http://x/p> "1" .
        |<http://x/b> <http://x/p> <http://x/c> <http://x/g1> .
        |""".stripMargin)
    val stream = RdfIO.readNQuadsStream(spark, dir.toString)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("nq_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.table("nq_stream").count() == 2)
      // second wave: a later file lands in the drop directory
      java.nio.file.Files.writeString(dir.resolve("w2.nq"),
        """<http://x/d> <http://x/p> "x"@en .
          |""".stripMargin)
      q.processAllAvailable()
      val got = spark.table("nq_stream")
      val want = RdfIO.readNQuads(spark, dir.toString)
      assert(got.count() == 3)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed quads must be row-identical to the batch parse")
    } finally q.stop()
  }

  test("streaming tumbling windows match the batch aggregation") {
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts_micro", tsMicro)
      .withWatermark("ts_micro", "1 hour")
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ev_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_stream")
        .select(unix_timestamp(col("window.start")).as("start_sec"),
          col("event_type"), col("n_events"))
      val expected = Events.tumblingHourly(Events.read(spark, sf))
        .select((col("hour_bucket") * 3600).as("start_sec"),
          col("event_type"), col("n_events"))
      assert(got.count() > 0)
      assert(got.except(expected).count() == 0 &&
        expected.except(got).count() == 0,
        "streaming and batch hourly windows must agree")
    } finally q.stop()
  }

  test("session_window agrees with gap-based sessionization") {
    // Events.read output is always int64 nanos
    val ev = Events.read(spark, sf)
      .withColumn("ts_micro", timestamp_micros(expr("ts div 1000")))
    val viaSessionWindow = ev
      .groupBy(session_window(col("ts_micro"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val viaGaps = Events.sessions(Events.read(spark, sf))
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(viaSessionWindow.except(viaGaps).count() == 0 &&
      viaGaps.except(viaSessionWindow).count() == 0,
      "native session_window and lag/cumsum sessionization must agree")
  }

  test("streaming dedup via dropDuplicatesWithinWatermark") {
    // duplicate the stream (union with itself) -> exact-dup events
    val base = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val doubled = base.union(base)
      .withColumn("ts_micro", tsMicro)
      .withWatermark("ts_micro", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = doubled.writeStream.outputMode("append")
      .format("memory").queryName("ev_dedup").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_dedup").count()
      val expected = Events.read(spark, sf).count()
      assert(got == expected,
        s"stream dedup should restore unique events: got $got, want $expected")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: batch parity + streaming close") {
    import org.apache.spark.sql.functions._
    // batch leg: flushAtEnd makes the stateful fold equal the
    // window-function decomposition exactly
    val ev = Events.read(spark, sf)
    val statefulSumm = Events.sessionsStateful(ev, flushAtEnd = true)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val viaWindows = Events.sessions(ev)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(statefulSumm.except(viaWindows).count() == 0 &&
      viaWindows.except(statefulSumm).count() == 0,
      "stateful fold must equal window sessionization")

    // streaming leg: event-time timeouts close idle sessions as the
    // watermark passes them; emitted sessions are a nonempty subset of
    // the batch result over the SAME micro-truncated timestamps
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", unix_micros(tsMicro) * lit(1000L))
    val q = Events.sessionsStateful(stream.toDF(), flushAtEnd = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_sessions_state").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("ev_sessions_state")
      val evMicro = ev.withColumn("ts", expr("(ts div 1000) * 1000"))
      val batchAll = Events.sessionsStateful(evMicro, flushAtEnd = true).toDF()
      assert(emitted.count() > 0, "watermark must close some sessions")
      assert(emitted.except(batchAll).count() == 0,
        "every emitted session must be a batch gap-session")
    } finally q.stop()
  }
}
