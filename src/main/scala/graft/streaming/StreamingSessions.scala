package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming sessionization — q32's `session_window` aggregate run
  * incrementally: gap-merged per-user sessions maintained in the state
  * store, FINALIZED and appended once the event-time watermark passes
  * a session's close (no later event can extend or merge it). The
  * watermark bounds both state (open sessions only) and output
  * (each session emitted exactly once) — the canonical
  * unbounded-ingest shape for the session family.
  *
  * One aggregation definition serves both modes ([[sessions]]); the
  * batch twin is q32 itself. Equivalence is the honest streaming
  * subset: a finite stream's final watermark stops short of the last
  * events, so sessions still open at end-of-stream remain in state —
  * the spec asserts every emitted session matches batch EXACTLY and
  * that nothing safely-closable was withheld.
  */
object StreamingSessions {

  val Gap = "30 minutes"
  val Watermark = "1 hour"

  /** Shared aggregation: per-user gap sessions, µs-exact bounds. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), Gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))

  /** Start the sessionizer over a parquet events path into an
    * in-memory sink named `queryName` (append mode — finalized
    * sessions only). */
  def startFileStream(spark: SparkSession, path: String,
      queryName: String): StreamingQuery =
    sessions(
      graft.Tables.eventsStream(spark, path).withWatermark("ts", Watermark))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
