package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingLmScores

/** Streaming frozen-LM scoring ≡ batch: the union of per-batch score
  * frames must land on exactly the one-pass corpus table, and the
  * buckets served over it on exactly the batch cut — the doc-keyed
  * algebra proven across real micro-batch boundaries, replays
  * included. */
class StreamingLmScoresSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("multi-batch streamed scores union to exactly the batch corpus table") {
    val in = Files.createTempDirectory("graft-lmstream-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-lmstream-out").toString
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    docs.repartition(3).write.parquet(in)
    // the frozen model: trained once, BEFORE the stream — batch
    // boundaries must not be able to see it move
    val lm = TextOps.lmOf(docs).localCheckpoint()

    val schema = spark.read.parquet(in).schema
    val q = StreamingLmScores.start(spark, in, out, schema, lm,
      maxFilesPerTrigger = 1)
    try q.awaitTermination(120000) finally q.stop()

    val fs = new org.apache.hadoop.fs.Path(s"$out/scores")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/scores"))
      .count(_.getPath.getName.startsWith("graft_batch_id="))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    assert(snap(StreamingLmScores.readScores(spark, out))
      == snap(TextOps.lmScoreOf(docs, lm)),
      "streamed score union diverged from the one-pass corpus table")

    // the served cut equals the batch cut over the same scores —
    // thresholds recomputed per read, never maintained state
    val gotBuckets = StreamingLmScores.readBuckets(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
    val wantBuckets = TextOps.lmBucketsOf(TextOps.lmScoreOf(docs, lm))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
    assert(gotBuckets == wantBuckets,
      "served buckets diverged from the batch tercile cut")
  }

  test("replays never duplicate; compaction is value-invisible") {
    val out = Files.createTempDirectory("graft-lmstream-replay").toString
    val lm = TextOps.lmOf(
      Seq((0L, "aa aa aa aa aa aa", "en")).toDF("doc_id", "text", "lang"))
      .localCheckpoint()
    val b0 = Seq((1L, "aa aa bb", "en"), (2L, "aa", "de"))
      .toDF("doc_id", "text", "lang")
    StreamingLmScores.writeBatch(b0, lm, 0L, out)
    val once = snap(StreamingLmScores.readScores(spark, out))
    StreamingLmScores.writeBatch(b0, lm, 0L, out) // crash replay, same id
    assert(snap(StreamingLmScores.readScores(spark, out)) == once,
      "replayed batch duplicated doc-keyed rows")
    assert(once.keySet == Set(1L, 2L))

    // accumulate two more batches, then fold the ledger: value-identical
    StreamingLmScores.writeBatch(
      Seq((3L, "bb bb", "fr")).toDF("doc_id", "text", "lang"), lm, 1L, out)
    StreamingLmScores.writeBatch(
      Seq((4L, "aa bb", "en")).toDF("doc_id", "text", "lang"), lm, 2L, out)
    val pre = snap(StreamingLmScores.readScores(spark, out))
    StreamingLmScores.compactLedger(spark, out, keepLast = 1)
    assert(snap(StreamingLmScores.readScores(spark, out)) == pre,
      "ledger compaction changed the standing scores")
  }
}
