package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the MinHash+LSH pipeline of
  * [[graft.queries.Dedup]] as a STATEFUL stream — every arriving
  * document is checked against all previously-seen documents sharing
  * any of its band buckets, across micro-batch boundaries. This is the
  * ingestion-time shape of corpus dedup: reject a near-dup before it
  * ever lands, instead of sweeping the corpus afterwards.
  *
  * Shape: signatures are the same batch `minhashSignatures` projection
  * (narrow, no shuffle); each doc fans out to its `NumBands` band
  * buckets; `flatMapGroupsWithState` keyed by bucket keeps the
  * signatures seen in that bucket and emits verified candidate pairs
  * (estimated Jaccard ≥ threshold) on arrival. A pair that collides in
  * several buckets is emitted once per colliding bucket — dedupe
  * downstream if exact-once pairs matter (the batch twin's `distinct`).
  *
  * Scale: state is O(corpus × NumBands) signatures, sharded by bucket
  * key across executors. [[expiringCandidatePairs]] bounds it with a
  * ProcessingTime timeout per bucket (stale buckets drop their
  * signatures — dedup against the recent window, the batch pipeline
  * owns full history). Replayed doc_ids are idempotent
  * (already-seen ids neither emit nor duplicate state) — safe under
  * at-least-once delivery.
  */
object StreamingDedup {

  final case class DocSig(doc_id: Long, bucket: String, mhs: Seq[String])
  final case class BucketState(docs: List[DocEntry])
  final case class DocEntry(doc_id: Long, mhs: Seq[String])
  final case class DupCandidate(doc_a: Long, doc_b: Long, est_jaccard: Double)

  import graft.queries.Dedup.{NumHashes, BandSize}
  private val NumBands = NumHashes / BandSize

  private def estJaccard(a: Seq[String], b: Seq[String]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / NumHashes

  def updateBucket(threshold: Double)(bucket: String,
      docs: Iterator[DocSig], state: GroupState[BucketState])
      : Iterator[DupCandidate] = {
    var seen = state.getOption.getOrElse(BucketState(Nil)).docs
    val out = Seq.newBuilder[DupCandidate]
    // doc_id order: deterministic emission within a micro-batch
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      if (!seen.exists(_.doc_id == d.doc_id)) { // at-least-once replay safe
        seen.foreach { prev =>
          val est = estJaccard(prev.mhs, d.mhs)
          if (est >= threshold)
            out += DupCandidate(math.min(prev.doc_id, d.doc_id),
              math.max(prev.doc_id, d.doc_id), est)
        }
        seen = DocEntry(d.doc_id, d.mhs) :: seen
      }
    }
    state.update(BucketState(seen))
    out.result().iterator
  }

  /** Wire the operator over a (streaming or batch) `(doc_id, text)`
    * frame. Emits verified candidate pairs as they become knowable. */
  def candidatePairs(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.5): Dataset[DupCandidate] = {
    import spark.implicits._
    val sig = graft.queries.Dedup.minhashSignatures(docs)
    val perBucket = (0 until NumBands).map(b =>
        sig.select(col("doc_id"), col(s"band$b").as("bucket"),
          array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("mhs")))
      .reduce(_ unionByName _)
      .filter(col("bucket").isNotNull) // short docs never bucket
      .as[DocSig]
    perBucket.groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateBucket(threshold))
  }

  /** [[candidatePairs]] with bounded state: a bucket untouched for
    * `ttlMs` of processing time drops its signatures — the production
    * posture for an endless ingest stream (dedup only against the
    * recent window; a full-history dedup is the batch pipeline's job).
    * Semantics inside the window are identical. */
  def expiringCandidatePairs(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.5,
      ttlMs: Long = 24L * 3600 * 1000): Dataset[DupCandidate] = {
    import spark.implicits._
    val sig = graft.queries.Dedup.minhashSignatures(docs)
    val perBucket = (0 until NumBands).map(b =>
        sig.select(col("doc_id"), col(s"band$b").as("bucket"),
          array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("mhs")))
      .reduce(_ unionByName _)
      .filter(col("bucket").isNotNull)
      .as[DocSig]
    perBucket.groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        expiringBucketUpdate(threshold, ttlMs) _)
  }

  /** TTL-wrapped bucket update, named so TestGroupState drives both
    * branches (see [[StatefulOps.expiringUpdate]]). */
  def expiringBucketUpdate(threshold: Double, ttlMs: Long)(bucket: String,
      ds: Iterator[DocSig], state: GroupState[BucketState])
      : Iterator[DupCandidate] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out = updateBucket(threshold)(bucket, ds, state)
      state.setTimeoutDuration(ttlMs)
      out
    }
}
