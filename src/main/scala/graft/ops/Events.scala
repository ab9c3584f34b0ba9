package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators, batch-first (SURVEY.md §2.11 — the reference
  * has no streaming subsystem; this is extension surface). The same
  * transforms run under Structured Streaming with `readStream` +
  * `withWatermark` (see StreamingSpec).
  *
  * All window arithmetic runs in exact int64 nanos — no precision loss,
  * and integer semantics the DuckDB oracle reproduces via epoch_ns().
  * `read` normalizes whatever the parquet physically carries to that
  * form: TIMESTAMP(NANOS) is read as raw nanos (legacy conf — Spark's
  * vectorized reader refuses it otherwise), TIMESTAMP_MICROS converts
  * via unix_micros * 1000 (exact), and an already-long column (e.g. a
  * tools.ScaleUp copy) passes through.
  */
object Events {

  val HourNs = 3600L * 1000000000L
  val SessionGapNs = 1800L * 1000000000L // 30 min

  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      // NTZ reinterprets as UTC instants (sessions here run UTC), which
      // is exactly how DuckDB's epoch_ns reads the same naive column
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
  }

  /** Tumbling hourly windows per event type: exact nanos bucketing. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      // integral `div`, not `/`: double division loses ns precision at 1e18
      .groupBy(expr(s"ts div $HourNs").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // exact decimal sum internally; DOUBLE at the output boundary
        // (decimal output columns are not oracle-hash-stable)
        sum(col("value").cast(DecimalType(38, 6))).cast(StringType)
          .cast(DoubleType)
          .as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sliding windows (1 h window, 30 min slide): each event lands in
    * exactly two windows; realized as an explode over the two window ids
    * — integer-exact ns arithmetic, identical under batch and streaming
    * (`window(ts, "1 hour", "30 minutes")` is the streaming twin).
    */
  def slidingHourly(events: DataFrame): DataFrame = {
    val slide = HourNs / 2
    events
      .withColumn("w", explode(array(
        expr(s"ts div $slide"), expr(s"ts div $slide") - 1)))
      .groupBy(col("w").as("window_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 6))).cast(StringType)
          .cast(DoubleType)
          .as("sum_value"))
  }

  /** Gap-based sessionization (30 min): classic lag + cumulative-sum
    * session ids, then per-user session stats. Partitioned by user —
    * scales with user count, skew bounded by per-user event counts.
    */
  def sessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessioned = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > SessionGapNs, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("(max(ts) - min(ts)) div 1000000000").as("duration_sec"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        max("duration_sec").as("max_duration_sec"))
  }

  /** One closed session, as emitted by [[sessionsStateful]]. */
  final case class SessionRow(user_id: Long, session_start: Long,
      session_end: Long, n_events: Int)

  /** Per-user sessionizer state: current-session bounds + count. */
  final case class SessState(start: Long, last: Long, n: Int)

  /** Custom stateful sessionization through
    * `KeyValueGroupedDataset.flatMapGroupsWithState` — the custom-state
    * streaming surface (same 30-min gap rule as [[sessions]], emitting
    * one row PER closed session instead of per-user summaries).
    *
    * Streaming: state carries the open session per user; an
    * EventTimeTimeout at (last event + gap) flushes idle sessions once
    * the watermark passes them, so output is append-mode and exactly
    * the gap-closed sessions. Batch: Spark invokes the function once
    * per group with all rows and timeouts never fire, so
    * `flushAtEnd = true` emits the residual open session, making the
    * batch run EQUAL to the window-based [[sessions]] decomposition
    * (asserted in StreamingSpec).
    *
    * State size is O(1) per active user — the scale story for
    * sessionizing an unbounded stream that a window-function pass
    * (which needs the whole history per user) cannot give.
    */
  def sessionsStateful(events: DataFrame, flushAtEnd: Boolean = false,
      watermarkDelay: String = "1 second")
      : org.apache.spark.sql.Dataset[SessionRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gap = SessionGapNs
    def fn(uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[SessState]): Iterator[SessionRow] = {
      var out = List.empty[SessionRow]
      var st = state.getOption
      if (state.hasTimedOut) {
        st.foreach(s => out ::= SessionRow(uid, s.start, s.last, s.n))
        state.remove()
        st = None
      } else {
        val sorted = rows.map(_._2).toArray.sorted
        for (t <- sorted) st match {
          case Some(s) if t - s.last <= gap =>
            st = Some(SessState(s.start, t, s.n + 1))
          case Some(s) =>
            out ::= SessionRow(uid, s.start, s.last, s.n)
            st = Some(SessState(t, t, 1))
          case None => st = Some(SessState(t, t, 1))
        }
        if (flushAtEnd) {
          st.foreach(s => out ::= SessionRow(uid, s.start, s.last, s.n))
        } else st.foreach { s =>
          state.update(s)
          // event-time timeout in ms: fires once the watermark passes
          // the session's gap horizon
          state.setTimeoutTimestamp((s.last + gap) / 1000000L)
        }
      }
      out.reverse.iterator
    }
    // the event-time column must be attached (withWatermark) AND kept
    // through the stateful operator's input for EventTimeTimeout; batch
    // runs skip the watermark (no-op there)
    val withEvt = events
      .select(col("user_id").cast(LongType).as("user_id"),
        col("ts").cast(LongType).as("ts"),
        timestamp_micros(expr("ts div 1000")).as("__evt"))
    val marked =
      if (events.isStreaming) withEvt.withWatermark("__evt", watermarkDelay)
      else withEvt
    marked.as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Funnel analysis: signup -> purchase conversion within one hour,
    * computed with a single user-partitioned window pass (next-purchase
    * timestamp via a forward-looking min), not per-row subqueries.
    */
  def signupConversion(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events
      .withColumn("next_purchase_ts",
        min(when(col("event_type") === "purchase", col("ts"))).over(w))
      .where(col("event_type") === "signup")
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("next_purchase_ts").isNotNull &&
          col("next_purchase_ts") > col("ts") &&
          col("next_purchase_ts") <= col("ts") + HourNs, 1L).otherwise(0L))
          .as("n_converted"))
  }

  /** JSON property extraction + aggregation (events.props is JSON text). */
  def jsonAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(pmod(col("k"), lit(7L)).as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).cast(StringType)
          .cast(DoubleType)
          .as("sum_value"),
        min("k").as("min_k"), max("k").as("max_k"))
}
