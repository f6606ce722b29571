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
  * Scale note: each stream retains only its [[RetainPerStream]] most
  * recent ids (safe because checkpoint commits are monotone — see
  * there), so the marker stays ≤ streams × [[RetainPerStream]] tiny
  * rows forever; the replay probe reads only this table, never the
  * data it marks. */
private[streaming] object BatchMarkers {

  val Table = "batch_marker"

  /** The newest surviving marker table, normalized to the
    * (graft_stream_id, graft_batch_id) schema — probed backward past
    * interloper versions that did not carry it, bounded by retention
    * (the [[StreamingClusters]] replay discipline). Legacy
    * single-column markers normalize to stream id "": modern streams
    * never match them, but the one stream that predates the keyed
    * scheme probes them via `alsoLegacy` (see [[isReplayed]]). */
  def newest(spark: SparkSession, lakeBase: String): Option[DataFrame] =
    Versioned.newestVersionWith(spark, lakeBase, Table)
      .map(v => normalize(Versioned.readAt(spark, lakeBase, Table, v)))

  private def normalize(d: DataFrame): DataFrame =
    if (d.columns.contains("graft_stream_id"))
      d.select(col("graft_stream_id"), col("graft_batch_id"))
    else d.select(lit("").as("graft_stream_id"),
      col("graft_batch_id"))

  /** ONE membership probe of the newest surviving marker — O(1) in
    * stream age, keyed on both columns.
    *
    * `alsoLegacy`: the stream that predates the keyed scheme
    * ([[StreamingClusters]]) also matches pre-upgrade single-column
    * markers (normalized to stream id ""), so a batch whose marker
    * landed before the upgrade but whose checkpoint commit was lost —
    * the exact crash window markers exist for — is still recognized
    * as replayed after upgrading instead of double-ingesting once
    * (advice-low, r17). Safe to keep on indefinitely: "" can only
    * come from a pre-upgrade table (every modern stream writes a
    * non-empty id), and only this one stream existed then. */
  def isReplayed(markers: Option[DataFrame], streamId: String,
      batchId: Long, alsoLegacy: Boolean = false): Boolean = {
    val idMatch =
      if (alsoLegacy)
        col("graft_stream_id") === streamId || col("graft_stream_id") === ""
      else col("graft_stream_id") === streamId
    markers.exists(_.filter(idMatch &&
      col("graft_batch_id") === batchId).head(1).nonEmpty)
  }

  /** How many recent batch ids each stream's marker retains. The
    * marker exists to catch a crash REPLAY, and Spark's checkpoint
    * commits batches monotonically — after a crash, `foreachBatch`
    * redelivers only the last uncommitted batch, never one committed
    * long ago — so a window of the most recent ids is sufficient with
    * enormous margin. Without the bound the cumulative table grows a
    * row per batch AND is rewritten whole per batch: O(batches²)
    * total marker bytes over a stream's life — a year of 1-minute
    * batches would rewrite a 500k-row table every minute by the end. */
  val RetainPerStream = 1024

  /** prev markers ∪ (streamId, batchId), with each stream's rows
    * trimmed to its [[RetainPerStream]] most recent ids — the next
    * version's marker table, bounded for an indefinitely running
    * stream. */
  def appended(spark: SparkSession, markers: Option[DataFrame],
      streamId: String, batchId: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    import spark.implicits._
    val row = Seq((streamId, batchId))
      .toDF("graft_stream_id", "graft_batch_id")
    val all = markers.map(_.unionByName(row)).getOrElse(row)
    all.withColumn("__rn", row_number().over(Window
        .partitionBy(col("graft_stream_id"))
        .orderBy(col("graft_batch_id").desc)))
      .filter(col("__rn") <= RetainPerStream)
      .drop("__rn")
  }
}
