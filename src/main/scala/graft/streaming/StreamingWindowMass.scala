package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.Dedup

/** Streaming verbatim-overlap scoring: q107's batch-vs-corpus window
  * mass ([[Dedup.massAgainstWindowIndex]] — one definition, both
  * execution modes) applied AT INGEST. Each arriving document is
  * scored for how much of it already exists verbatim in the standing
  * corpus — the ExactSubstr ingest gate: a score, not a binary
  * verdict, so downstream policy (drop, trim, keep-with-weight)
  * stays a policy choice, which is why this seam writes a LEDGER
  * rather than routing into kept/dup like [[StreamingDeltaDedup]].
  *
  * Stateless per-batch scoring against a static index (no state
  * store, no watermark); `foreachBatch` + idempotent Overwrite into
  * per-`graft_batch_id` directories so a crash-replayed batch
  * overwrites its earlier attempt.
  *
  * Scale shape: the distinct-window set is derived once at [[start]]
  * and cached — in production it is the persisted `win-` artifact the
  * batch pipeline already maintains ([[Dedup.windowIndex]]), so each
  * micro-batch costs |batch windows| × join, never a corpus re-scan.
  */
object StreamingWindowMass {

  /** Score one micro-batch, idempotently on `batchId`. Package-visible
    * seam so the spec can prove replay does not duplicate rows and
    * that stream ≡ batch q107. */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      idx: DataFrame, outDir: String): Unit = {
    Dedup.massAgainstWindowIndex(batch, idx)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/scored/graft_batch_id=$batchId")
    ()
  }

  /** Read the scored ledger back as one frame. */
  def readSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/scored").drop("graft_batch_id")

  /** Start the scoring ingest over a directory of parquet document
    * files, scoring each batch against the distinct windows of
    * `corpus` (any frame with doc_id + text). */
  def start(spark: SparkSession, inDir: String, outDir: String,
      schema: StructType, corpus: DataFrame): StreamingQuery = {
    val idx = Dedup.distinctWindowsOf(corpus).persist()
    idx.count()

    val query = spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, idx, outDir)
      }
      .start()
    // index cache released when the query ends (same lifecycle + race
    // guard as StreamingDeltaDedup)
    val qid = query.id
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (e.id == qid) {
            idx.unpersist()
            spark.streams.removeListener(this)
          }
      }
    spark.streams.addListener(listener)
    if (!query.isActive) {
      idx.unpersist()
      spark.streams.removeListener(listener)
    }
    query
  }
}
