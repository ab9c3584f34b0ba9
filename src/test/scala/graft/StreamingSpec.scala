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

  test("streaming tumbling windows match the batch aggregation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts_micro", timestamp_micros(expr("ts div 1000")))
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
}
