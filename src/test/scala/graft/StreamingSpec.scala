package graft

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("streaming-spec").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** File streaming sources require a directory: stage the events parquet
    * into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("file-stream hourly agg equals batch hourly agg") {
    val batch = EventStream.hourlyAgg(
      spark.read.parquet(s"$sf/events.parquet"))
      .orderBy("event_type", "hour_start").collect()

    val q = EventStream.hourlyAgg(EventStream.readStream(spark, eventsDir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly")
      .orderBy("event_type", "hour_start").collect()

    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("session_window agg runs on a stream and matches batch totals") {
    val batch = EventStream.sessionAgg(
      spark.read.parquet(s"$sf/events.parquet"))
    val batchTotal = batch.agg(sum("n_events")).head.getLong(0)

    val q = EventStream.sessionAgg(EventStream.readStream(spark, eventsDir))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamedTotal = spark.table("sessions")
      .agg(sum("n_events")).head.getLong(0)

    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(batchTotal == nEvents)
    assert(streamedTotal == nEvents)
  }

  test("stateful sessionization: batch flush matches window-lag oracle") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val sessions = EventStream.sessionizeStateful(spark, events, gapSec = 1800L)
    // oracle: n_sessions per user via lag() (same logic as q_events_sessions)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
    val oracle = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("sec", (col("ts") / lit(1000000000L)).cast("long"))
      .withColumn("prev", lag("sec", 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("sec") - col("prev") > 1800, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("ns").as("n_sessions"))
    val got = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val diff = got.join(oracle, Seq("user_id"))
      .filter(got("n_sessions") =!= oracle("n_sessions")).count()
    assert(diff == 0)
    // event conservation: every event lands in exactly one session
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    assert(total == events.count())
  }

  test("streaming stateful sessionization closes sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val nanos = (s: Long) => s * 1000000000L
    // user 1: two events 10s apart (one session), then a third past the gap
    mem.addData(
      EventStream.Event(1L, nanos(100), 1L, "c", 1.0),
      EventStream.Event(2L, nanos(110), 1L, "c", 2.0))
    // keep event_time in the plan: it carries the watermark the
    // event-time timeout needs (.as[Event] tolerates the extra column)
    val withTime = EventStream.withEventTime(mem.toDF())
      .withWatermark("event_time", "0 seconds")
      .as[EventStream.Event]
    val q = EventStream.sessionizeStateful(spark, withTime,
        gapSec = 60L, flushOpen = false)
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // nothing closed yet: watermark at 110, session open until 170
      assert(spark.table("stateful_sessions").count() == 0)
      // an event far past the gap advances the watermark → closes session 1
      mem.addData(EventStream.Event(3L, nanos(1000), 1L, "c", 3.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(4L, nanos(2000), 2L, "c", 0.0))
      q.processAllAvailable()
      val closed = spark.table("stateful_sessions")
        .orderBy("session_start_sec").collect()
      assert(closed.length >= 1)
      val first = closed.head
      assert(first.getAs[Long]("session_start_sec") == 100L)
      assert(first.getAs[Long]("session_end_sec") == 110L)
      assert(first.getAs[Long]("n_events") == 2L)
      assert(first.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }
}
