package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming layer: the reference's event bus is a bounded in-memory ring
  * feeding SSE/webhooks (event_bus.py:47-97) and its usage logs are
  * append-only tables (usage_tracker.py) — on Spark both map onto Structured
  * Streaming over an append-only event source.
  *
  * Two production shapes:
  *  - windowed usage analytics: watermarked sliding-window counts per event
  *    type (the streaming form of [[graft.analytics.Analytics.searchQuality]]);
  *  - running feedback nets via `flatMapGroupsWithState` — the incremental
  *    form of the R6 feedback signal, so the batch RRF pipeline can read an
  *    always-current feedback table instead of re-aggregating history.
  *
  * Transformations are defined on DataFrames, so every function here works
  * identically on a batch frame (tests/oracles) and a `readStream` frame.
  */
object EventStream {

  /** Watermarked per-type tumbling-window counts (event-bus analytics). */
  def windowedEventCounts(events: DataFrame,
                          window: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Gap-based sessionization of the usage log — the canonical stateful
    * analytics shape over an event stream: consecutive events of a user
    * belong to one session while the gap stays under `gapUs` (30 min
    * default, the industry-standard web-analytics cutoff). This is the
    * BATCH form (lag + running-sum islands, windows partitioned per user —
    * no global order); the streaming form is the same state machine under
    * a ProcessingTime/EventTime timeout, which
    * [[runningFeedbackNets]]-style `mapGroupsWithState` already
    * demonstrates. Output: (user_id, session_idx, n_events, start_us,
    * dur_us) — epoch-microsecond longs, exact in both engines. */
  def sessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("_us"))
      .withColumn("_new", when(lag("_us", 1).over(w).isNull ||
        col("_us") - lag("_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("_new").over(upTo))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("_us").as("start_us"),
        (max("_us") - min("_us")).as("dur_us"))
  }

  case class FeedbackEvent(memoryId: Long, signal: String, tsMicros: Long)
  case class FeedbackNet(memoryId: Long, net: Long, nEvents: Long)

  /** Running feedback net per memory via mapGroupsWithState — incremental
    * R6 (usage_tracker.py:324-342 as a stream). */
  def runningFeedbackNets(feedback: DataFrame): DataFrame = {
    val spark = feedback.sparkSession
    import spark.implicits._
    feedback
      .select(col("memory_id").as("memoryId"), col("signal"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[FeedbackEvent]
      .groupByKey(_.memoryId)
      .mapGroupsWithState[FeedbackNet, FeedbackNet](GroupStateTimeout.NoTimeout) {
        (id: Long, events: Iterator[FeedbackEvent], state: GroupState[FeedbackNet]) =>
          val prev = state.getOption.getOrElse(FeedbackNet(id, 0L, 0L))
          val delta = events.foldLeft((0L, 0L)) { case ((net, n), e) =>
            (net + (if (e.signal == "useful") 1L else -1L), n + 1)
          }
          val next = FeedbackNet(id, prev.net + delta._1, prev.nEvents + delta._2)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Wire a file-based event stream end-to-end (readStream → transform →
    * memory sink); used by the streaming spec and as the deployment shape. */
  def startWindowedCounts(spark: SparkSession, sourceDir: String,
                          queryName: String): StreamingQuery = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val stream = spark.readStream.schema(schema).json(sourceDir)
    windowedEventCounts(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .start()
  }
}
