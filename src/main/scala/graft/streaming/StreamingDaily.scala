package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming extension (SURVEY §2.12, §7.5): the batch
  * daily-totals aggregate (A3) re-expressed as an incremental query —
  * tumbling event-time windows + watermark for bounded state and
  * late-data discard. The batch and streaming variants share one
  * aggregation definition, so equivalence is testable (and is tested):
  * stream over a finite directory == batch over the same directory.
  *
  * At scale this is the standing ingest pipeline: `readStream` over an
  * arriving-files directory (or Kafka source), state in the default
  * HDFS-backed store keyed by (window, event_type) — cardinality
  * bounded by watermark horizon × type count, not by input volume.
  */
object StreamingDaily {

  /** Shared aggregation: hourly totals per event type. Decimal-exact
    * sum (same discipline as the batch oracles). */
  def hourlyTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Batch twin over the same input — the equivalence oracle. */
  def hourlyTotalsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: `dropDuplicates` with a watermark bounds
    * the dedup state to the watermark horizon — the streaming face of
    * the dedup family (batch: q17). Duplicate keys arriving within the
    * horizon are dropped across micro-batches; later-than-watermark
    * re-arrivals age out of state (documented at-least-once edge). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")

  /** Start the stream over a parquet directory into an in-memory sink
    * named `queryName`. Finite-directory smoke: processAllAvailable()
    * then read `spark.table(queryName)`. */
  def startFileStream(spark: SparkSession, dir: String,
      queryName: String): StreamingQuery = {
    // ts-layout adaptation (nanos-long vs timestamp[us]) lives in ONE
    // place: graft.Tables. A second copy of the conversion here is how
    // the r12 testdata regeneration broke two loaders at once.
    val raw = graft.Tables.eventsStream(spark, dir)
    hourlyTotals(raw).writeStream
      .outputMode(OutputMode.Complete()) // agg w/o append-finalized windows
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
