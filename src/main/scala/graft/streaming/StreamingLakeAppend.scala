package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sources.Versioned

/** Streamed append-only ingest into a merge-on-read lake table — the
  * 100 TB front door, assembled from the engine's own parts (r16):
  * each micro-batch lands as ONE [[Versioned.appendPublish]] (bytes
  * written ∝ the batch, every standing byte untouched), and the lake's
  * [[Versioned.setAutoCompact]] policy bounds the fold debt the stream
  * itself accretes — the writer that crosses the threshold compacts
  * the tail on its way out, so an unattended stream can run
  * indefinitely without an external maintenance scheduler
  * ([[StreamingLakeAppendSpec]] pins the bounded depth and the value
  * identity through the policy's rewrites).
  *
  * Replay discipline ([[StreamingClusters]]'s, shared via
  * [[Versioned.newestVersionWith]]): `foreachBatch` can re-deliver a
  * batch after a crash between publish and checkpoint commit, so each
  * publish atomically REPLACES a cumulative `batch_marker` table in
  * the same version as its append entry (`appendPublish(replacing =
  * …)` — a carried ref could never change, and a separate marker
  * publish would tear the batch-and-marker pair the replay probe
  * relies on). A replayed id is recognized with one membership probe
  * of the newest surviving marker table — robust against interloper
  * versions that did or did not carry the marker, bounded by
  * retention.
  *
  * Contrast with [[StreamingClusters]]: that twin REWRITES the corpus
  * per version (self-contained versions + artifact maintenance); this
  * one is the manifest-native ingest — append entry + marker rewrite
  * per batch, nothing else touched. An ingest needing both (accreting
  * lake + maintained artifacts) composes them: this twin for the
  * table, the chain maintenance against the version it returns. */
object StreamingLakeAppend {

  /** Ingest one micro-batch, idempotently on `batchId`. `keys`
    * forwards to [[Versioned.appendPublish]]'s disjointness check
    * (Nil for keyless event streams). Returns the version serving
    * this batch (committed now, or recognized from a prior crash). */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, lakeBase: String, table: String,
      keys: Seq[String] = Nil): Long = {
    val cur = Versioned.currentVersion(spark, lakeBase).getOrElse(
      sys.error(s"streamed append: $lakeBase has no committed version — " +
        "bootstrap the lake with one Versioned.publish first"))
    if (batch.isEmpty) return cur // an empty batch must not burn a version
    // markers key on (stream, batch): checkpoints are per query, so a
    // sibling stream's batch N must not read as OUR replay
    // ([[BatchMarkers]]; review finding, r16)
    val streamId = s"append:$table"
    val markers = BatchMarkers.newest(spark, lakeBase)
    if (BatchMarkers.isReplayed(markers, streamId, batchId)) cur
    else Versioned.appendPublish(spark, lakeBase, table, batch, keys,
      replacing = Seq(BatchMarkers.Table ->
        BatchMarkers.appended(spark, markers, streamId, batchId)))
  }

  /** Start streaming a directory of parquet files into `table` at
    * `lakeBase`, one append-publish per micro-batch. */
  def start(spark: SparkSession, inDir: String, lakeBase: String,
      table: String, checkpointDir: String, schema: StructType,
      keys: Seq[String] = Nil,
      maxFilesPerTrigger: Int = Int.MaxValue): StreamingQuery =
    LedgerStream.start(spark, inDir, checkpointDir, schema,
      maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(spark, batch, batchId, lakeBase, table, keys)
      ()
    }
}
