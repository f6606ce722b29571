package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.sources.Versioned

/** The cumulative replay-marker table shared by every streaming lake
  * twin ([[StreamingLakeAppend]], [[StreamingLakeTakedown]],
  * [[StreamingClusters]]).
  *
  * Each row is a (stream_id, batch_id) PAIR, not a bare batch id:
  * Spark streaming checkpoints are per query, so two streams composed
  * on one lake both number their batches from 0 — a marker keyed by
  * batch id alone would let stream A's ingest of batch N make stream
  * B silently drop its own batch N as "replayed" (data loss), and
  * each stream's replacing-rewrite would clobber the other's history
  * (review finding, r16). One SHARED table (not one per stream) keeps
  * the carry-forward contract for external publishers a single name,
  * and the cumulative union preserves every stream's rows through
  * every stream's rewrite — so the twins compose on one lake.
  *
  * Scale note: the marker is one ~tens-of-bytes row per micro-batch
  * per stream — a year of 1-minute batches from ten streams is ~5M
  * rows, megabytes. The replay probe reads only this table, never the
  * data it marks. */
private[streaming] object BatchMarkers {

  val Table = "batch_marker"

  /** The newest surviving marker table, normalized to the
    * (graft_stream_id, graft_batch_id) schema — probed backward past
    * interloper versions that did not carry it, bounded by retention
    * (the [[StreamingClusters]] replay discipline). Legacy
    * single-column markers normalize to stream id "" so a modern
    * probe never matches them. */
  def newest(spark: SparkSession, lakeBase: String): Option[DataFrame] =
    Versioned.newestVersionWith(spark, lakeBase, Table)
      .map(v => normalize(Versioned.readAt(spark, lakeBase, Table, v)))

  private def normalize(d: DataFrame): DataFrame =
    if (d.columns.contains("graft_stream_id"))
      d.select(col("graft_stream_id"), col("graft_batch_id"))
    else d.select(lit("").as("graft_stream_id"),
      col("graft_batch_id"))

  /** ONE membership probe of the newest surviving marker — O(1) in
    * stream age, keyed on both columns. */
  def isReplayed(markers: Option[DataFrame], streamId: String,
      batchId: Long): Boolean =
    markers.exists(_.filter(col("graft_stream_id") === streamId &&
      col("graft_batch_id") === batchId).head(1).nonEmpty)

  /** prev markers ∪ (streamId, batchId) — the next version's
    * cumulative marker table. */
  def appended(spark: SparkSession, markers: Option[DataFrame],
      streamId: String, batchId: Long): DataFrame = {
    import spark.implicits._
    val row = Seq((streamId, batchId))
      .toDF("graft_stream_id", "graft_batch_id")
    markers.map(_.unionByName(row)).getOrElse(row)
  }
}
