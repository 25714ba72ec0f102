package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` stream table.
  *
  * The reference has no streaming operators (SURVEY.md §2.1: "Streaming —
  * ABSENT"); this module is part of the engine's extended surface. Every
  * transform is a pure `DataFrame => DataFrame` so the SAME code path runs
  * in batch (for the DuckDB-oracle correctness gate) and under
  * `readStream`/`writeStream` (for the streaming specs) — the idiomatic
  * Spark "unified batch/streaming" design.
  *
  * Scale notes (100 TB): windowed aggregations are keyed by
  * (event_type, window) — state is bounded by watermark eviction, and the
  * pre-shuffle partial aggregation keeps the exchange small. Session windows
  * use the built-in `session_window`, which merges overlapping sessions in
  * state without a per-key sort. The stateful variant
  * ([[sessionizeStateful]]) demonstrates custom state with
  * `flatMapGroupsWithState` + event-time timeout for semantics the built-in
  * can't express (e.g. emitting per-session aggregates with custom close
  * conditions).
  */
object EventStream {

  /** Schema of the driver's events table as stored: `ts` is parquet
    * TIMESTAMP(MICROS) without UTC adjustment → TIMESTAMP_NTZ. Needed by
    * `spark.readStream.schema(...)` — streaming file sources require an
    * explicit schema. */
  val schemaMicros: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Lift `ts` to this module's epoch-NANOS-long contract from whatever
    * the source carries: already-long ts passes through; timestamp ts
    * (µs precision) converts exactly (×1000). NTZ wall-clock is taken as
    * UTC — every session here runs spark.sql.session.timeZone=UTC, which
    * matches how DuckDB's oracle reads the same NTZ column natively. All
    * downstream time math stays exact integer arithmetic on the long. */
  def tsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _ => df.withColumn("ts",
      unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }

  /** Open the events table as a micro-batch file stream (ts lifted to the
    * epoch-nanos contract). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    tsNanos(spark.readStream.schema(schemaMicros).parquet(dir))

  /** Epoch-nanos `ts` → proper event-time timestamp column (lifting ts
    * first if the caller hands a raw timestamp-typed frame). */
  def withEventTime(df: DataFrame): DataFrame =
    tsNanos(df).withColumn("event_time",
      timestamp_micros((col("ts") / lit(1000L)).cast("long")))

  /** Watermarked tumbling-window aggregate: events per (type, hour).
    * Streaming-safe: state for a window is dropped `delay` after its end. */
  def hourlyAgg(df: DataFrame, delay: String = "2 hours"): DataFrame =
    withEventTime(df)
      .withWatermark("event_time", delay)
      .groupBy(col("event_type"), window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("event_type"), col("window.start").as("hour_start"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with the built-in session window: sessions
    * close after `gap` of per-user inactivity. */
  def sessionAgg(df: DataFrame, gap: String = "30 minutes",
      delay: String = "2 hours"): DataFrame =
    withEventTime(df)
      .withWatermark("event_time", delay)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Watermarked stream-stream INTERVAL join: each click joined to the same
    * user's views from the preceding `window`. Both sides carry watermarks
    * and the join condition bounds the event-time range, so Structured
    * Streaming can evict buffered state once the watermark passes — the
    * canonical bounded-state stream-stream join (without the range bound
    * the state would grow forever). Works identically on batch frames
    * (same code path — used by the spec as its own oracle). */
  def clickViewJoin(events: DataFrame, window: String = "10 minutes",
      delay: String = "30 minutes"): DataFrame = {
    val e = withEventTime(events)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", delay)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", delay)
    clicks.join(views,
      col("user_id") === col("v_user_id") &&
        col("view_time") >= col("click_time") - expr(s"INTERVAL $window") &&
        col("view_time") < col("click_time"))
      .select(col("click_id"), col("user_id"), col("view_id"))
  }

  /** Streaming exact dedup: drop repeated (user_id, event_id) arrivals with
    * BOUNDED state — `dropDuplicatesWithinWatermark` evicts seen-key state
    * once the watermark passes, so a long-lived training-data ingest stream
    * (at-least-once upstream → exactly-once-per-key downstream) never
    * accumulates unbounded dedup state. Batch twin: plain dropDuplicates. */
  def dedupStream(df: DataFrame, delay: String = "2 hours"): DataFrame =
    withEventTime(df)
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_id")

  // ---- custom state: flatMapGroupsWithState sessionization ----

  case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(startSec: Long, lastSec: Long, nEvents: Long,
      sumValue: Double)

  case class SessionOut(user_id: Long, session_start_sec: Long,
      session_end_sec: Long, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization: one state record per live user session,
    * closed (emitted) when the inactivity gap elapses. Demonstrates
    * `flatMapGroupsWithState` for session semantics the built-in
    * `session_window` can't carry (running aggregates inside the state,
    * custom close conditions).
    *
    * `flushOpen = true` (batch mode): open sessions are emitted at
    * end-of-group — the whole input is one "micro-batch", so every session
    * is final. `flushOpen = false` (streaming): open sessions stay in state
    * and close via the event-time timeout once the watermark passes
    * `lastSec + gap` — the input stream must carry a watermark.
    *
    * Within a group, events may arrive unordered — the handler sorts each
    * micro-batch's slice (bounded memory: one user's events per batch, not
    * the stream's history).
    */
  def sessionizeStateful(spark: SparkSession, events: Dataset[Event],
      gapSec: Long, flushOpen: Boolean = true): Dataset[SessionOut] = {
    import spark.implicits._
    val timeout = if (flushOpen) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.EventTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        case (user: Long, it: Iterator[Event],
            state: GroupState[SessionState]) =>
          val secs = it.map(e => (e.ts / 1000000000L, e.value)).toSeq.sorted
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          secs.foreach { case (sec, v) =>
            cur match {
              case Some(s) if sec - s.lastSec <= gapSec =>
                cur = Some(s.copy(lastSec = sec, nEvents = s.nEvents + 1,
                  sumValue = s.sumValue + v))
              case Some(s) =>
                closed += SessionOut(user, s.startSec, s.lastSec, s.nEvents,
                  s.sumValue)
                cur = Some(SessionState(sec, sec, 1L, v))
              case None =>
                cur = Some(SessionState(sec, sec, 1L, v))
            }
          }
          cur match {
            case Some(s) if state.hasTimedOut || flushOpen =>
              closed += SessionOut(user, s.startSec, s.lastSec, s.nEvents,
                s.sumValue)
              state.remove()
            case Some(s) =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSec + gapSec) * 1000L + 1L)
            case None => if (state.exists) state.remove()
          }
          closed.result().iterator
      }
  }
}
