package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sources.Versioned

/** Streamed takedown into a merge-on-read lake table —
  * [[StreamingLakeAppend]]'s removal twin (r17), and the streaming
  * face of the GDPR/right-to-forget shape the merge-on-read design
  * exists for: each micro-batch of key tombstones lands as ONE
  * [[Versioned.removePublish]] (bytes written ∝ the batch's DISTINCT
  * keys — a few KB retire any number of standing rows; no standing
  * byte is rewritten), and the lake's [[Versioned.setAutoCompact]]
  * policy bounds the tombstone chain the stream itself accretes, with
  * the compaction fold physically DELETING the tombstoned rows — the
  * point where "forgotten" stops meaning "filtered at read" and
  * starts meaning "gone from storage".
  *
  * Replay discipline is [[BatchMarkers]]'s, shared with the append
  * twin: the cumulative (stream, batch) marker table is atomically
  * REPLACED in the same version as the tombstone entry
  * (`removePublish(replacing = …)`), and a crash-replayed batch is
  * recognized with one membership probe of the newest surviving
  * marker — keyed on BOTH columns, so an append stream and a takedown
  * stream composed on one lake (the natural ingest-plus-forget
  * deployment) never mistake each other's batch N for their own
  * ([[StreamingLakeTakedownSpec]] pins exactly that composition).
  *
  * Semantics note (merge-on-read fold order is the table's
  * semantics): a tombstone removes rows from entries BEFORE it in the
  * chain; a row appended AFTER the takedown with the same key is new
  * data, not a resurrection — stream and batch agree on this by
  * construction because both are one `removePublish` per batch. */
object StreamingLakeTakedown {

  /** Apply one micro-batch of tombstone keys, idempotently on
    * `batchId`. The batch's columns ARE the anti-join keys
    * ([[Versioned.removePublish]]'s contract). Returns the version
    * serving this batch (committed now, or recognized from a prior
    * crash). */
  private[graft] def takedownBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, lakeBase: String, table: String): Long = {
    val cur = Versioned.currentVersion(spark, lakeBase).getOrElse(
      sys.error(s"streamed takedown: $lakeBase has no committed version — " +
        "bootstrap the lake with one Versioned.publish first"))
    if (batch.isEmpty) return cur // an empty batch must not burn a version
    val streamId = s"takedown:$table"
    val markers = BatchMarkers.newest(spark, lakeBase)
    if (BatchMarkers.isReplayed(markers, streamId, batchId)) cur
    else Versioned.removePublish(spark, lakeBase, table, batch,
      replacing = Seq(BatchMarkers.Table ->
        BatchMarkers.appended(spark, markers, streamId, batchId)))
  }

  /** Start streaming a directory of parquet tombstone-key files
    * against `table` at `lakeBase`, one remove-publish per
    * micro-batch. `schema` is the key schema — its columns are the
    * anti-join keys. */
  def start(spark: SparkSession, inDir: String, lakeBase: String,
      table: String, checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = Int.MaxValue): StreamingQuery =
    LedgerStream.start(spark, inDir, checkpointDir, schema,
      maxFilesPerTrigger) { (batch, batchId) =>
      takedownBatch(spark, batch, batchId, lakeBase, table)
      ()
    }
}
