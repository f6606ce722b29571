package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.Dedup
import graft.sources.Versioned

/** Streaming ingest that keeps the duplicate-CLUSTER assignment
  * current — the ingest-side twin of q119's version-chained
  * maintenance, completing the streaming symmetry for the newest
  * artifact family (windows / signatures / IVF / CMS all have ingest
  * twins; the transitive closure now does too).
  *
  * Each micro-batch: (1) publish lake version v+1 with the batch as
  * the change table (`documents_delta`) and the accreted corpus as
  * `documents` — the change-data-feed contract every incremental
  * chain consumes; (2) run the cluster chain's maintenance merge to
  * v+1 ([[Dedup.clusterAssignmentAt]] — the SAME engine as batch
  * q119: star-contracted previous assignment + delta pair probe,
  * never a corpus re-pairing). A batch that bridges two standing
  * clusters merges them, exactly as in batch mode, because the
  * engine is shared rather than mirrored.
  *
  * Replay discipline: `foreachBatch` can re-deliver a batch after a
  * crash between side effect and checkpoint commit. Overwrite-by-
  * batch-id (the ledger twins' idempotency) does not fit a publish —
  * versions are immutable — so each publish carries a CUMULATIVE
  * `batch_marker` table (every batch id ever ingested, one long per
  * batch: prev markers ∪ this id), and a replayed batch detects
  * itself with ONE membership probe of the newest surviving marker
  * table — O(1) in stream age for the probe, and robust against a
  * version committed by ANYONE ELSE landing between a batch's
  * publish and its replay, whether or not that publisher carried
  * `batch_marker` forward (non-carriers are found by probing
  * backward to the newest surviving version that has one — bounded
  * by retention, which must cover the publish-to-replay window;
  * review findings, r15). It then re-ensures the
  * artifact, which [[graft.sources.ArtifactStore]] serves from the
  * already-published result. A genuine concurrent publisher race
  * still fails loudly via the lake's claim protocol — replay safety
  * here never weakens writer exclusivity.
  *
  * Cost model, stated honestly (as [[Versioned.mergePublish]] does):
  * the carry-forward lake REWRITES the corpus per version — the
  * price of self-contained version dirs. The MAINTENANCE is
  * incremental regardless (artifact + delta + signature index reads
  * only); at 100 TB the publish side would ride a manifest format
  * (Delta/Iceberg) while this seam stays unchanged.
  */
object StreamingClusters {

  /** Ingest one micro-batch, idempotently on `batchId` (see replay
    * discipline above). Package-visible seam so the spec can prove
    * replay does not double-publish and that stream ≡ batch. */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, lakeBase: String): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    val cur = Versioned.currentVersion(spark, lakeBase)
    // replay detection: ONE membership probe of the newest surviving
    // version's CUMULATIVE marker table. The common case (this stream
    // is the only publisher, or the interloper carried the marker
    // forward) finds it at the CURRENT version — one existence probe,
    // O(1) in stream age. But Versioned.publish drops unlisted tables,
    // so a version committed by a publisher that did NOT carry
    // batch_marker would otherwise make the stream look marker-less
    // and double-ingest a crash-replayed batch (review finding, r15);
    // instead, probe BACKWARD to the newest surviving version that
    // has one — bounded by the lake's retention, which is therefore a
    // correctness knob here: retention must cover the window in which
    // an external non-carrying publisher can land between a publish
    // and its replay (external publishers SHOULD carry batch_marker).
    // markers key on (stream, batch) — a sibling stream composed on
    // this lake numbers its own batches from 0 ([[BatchMarkers]])
    val streamId = "clusters:documents"
    val markers = cur.flatMap(_ => BatchMarkers.newest(spark, lakeBase))
    // alsoLegacy: this stream predates the keyed marker scheme, so a
    // pre-upgrade single-column marker must still suppress its replay
    val replayed =
      BatchMarkers.isReplayed(markers, streamId, batchId, alsoLegacy = true)
    val v = if (replayed) cur.get else {
      val docs = cur match {
        case Some(c) =>
          Versioned.readAt(spark, lakeBase, "documents", c).unionByName(batch)
        case None => batch
      }
      Versioned.publish(spark, lakeBase, Seq(
        Versioned.TableSpec("documents", docs),
        Versioned.TableSpec("documents_delta", batch),
        Versioned.TableSpec(BatchMarkers.Table,
          BatchMarkers.appended(spark, markers, streamId, batchId))))
    }
    Dedup.clusterAssignmentAt(spark, lakeBase, v)
    ()
  }

  /** The assignment at the lake's current version — what a dedup
    * consumer (q42-style representative picking, cluster-keyed
    * splits) reads between ingest ticks. */
  def currentAssignment(spark: SparkSession, lakeBase: String): DataFrame = {
    val v = Versioned.currentVersion(spark, lakeBase).getOrElse(
      sys.error(s"streaming clusters: no committed version at $lakeBase"))
    Dedup.clusterAssignmentAt(spark, lakeBase, v)
  }

  /** Start ingesting a directory of parquet document files into the
    * versioned lake at `lakeBase`, maintaining the cluster artifact
    * per micro-batch. */
  def start(spark: SparkSession, inDir: String, lakeBase: String,
      checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = Int.MaxValue): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, lakeBase)
      }
      .start()
}
