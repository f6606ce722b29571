package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingDsir

/** Streaming DSIR count accumulation ≡ batch: summing per-batch
  * class-count tables must land on exactly the one-pass corpus table —
  * the linear-statistic algebra proven across real micro-batch
  * boundaries, replays included. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("multi-batch streamed counts sum to exactly the batch corpus table") {
    val in = Files.createTempDirectory("graft-dsir-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-dsir-out").toString
    val docs = Tables(spark, sfDir, "documents").select(col("text"), col("lang"))
    docs.repartition(3).write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingDsir.start(spark, in, out, schema, maxFilesPerTrigger = 1)
    try q.awaitTermination(120000) finally q.stop()

    val fs = new org.apache.hadoop.fs.Path(s"$out/counts")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/counts"))
      .count(_.getPath.getName.startsWith("graft_batch_id="))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    assert(snap(StreamingDsir.readCounts(spark, out))
      == snap(TextOps.dsirCountsOf(docs)),
      "streamed count sum diverged from the one-pass corpus table")
  }

  test("replays never double-count; compaction is value-invisible") {
    val out = Files.createTempDirectory("graft-dsir-replay").toString
    val b0 = Seq(("alpha beta beta", "en"), ("gamma", "de"))
      .toDF("text", "lang")
    StreamingDsir.writeBatch(b0, 0L, out)
    val once = snap(StreamingDsir.readCounts(spark, out))
    StreamingDsir.writeBatch(b0, 0L, out) // crash replay, same id
    assert(snap(StreamingDsir.readCounts(spark, out)) == once,
      "replayed batch double-counted")
    assert(once.values.map(_._1).sum == 3L) // en: alpha beta beta
    assert(once.values.map(_._2).sum == 1L) // de: gamma

    // accumulate two more batches, then fold the ledger: value-identical
    StreamingDsir.writeBatch(Seq(("alpha", "fr")).toDF("text", "lang"), 1L, out)
    StreamingDsir.writeBatch(Seq(("beta", "en")).toDF("text", "lang"), 2L, out)
    val pre = snap(StreamingDsir.readCounts(spark, out))
    StreamingDsir.compactLedger(spark, out, keepLast = 1)
    assert(snap(StreamingDsir.readCounts(spark, out)) == pre,
      "ledger compaction changed the standing counts")
  }
}
