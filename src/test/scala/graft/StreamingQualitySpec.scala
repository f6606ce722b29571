package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingQuality

/** Streaming quality gate ≡ batch q14 filter, on real documents plus
  * planted junk: the accepted set must be exactly what the batch
  * filter accepts, and the planted low-quality doc must land in the
  * reject sink (kept for audit, not dropped). */
class StreamingQualitySpec extends SparkSpec {

  test("streamed quality filter accepts exactly the batch filter's rows") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-squal-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-squal-out").toString
    val minScore = 0.25

    // corpus slice + planted extremes: an all-stopword doc scores 0
    // (stopword_ratio 1), a long content-word doc scores high.
    // Deterministic predicate, not LIMIT — the frame is re-evaluated
    // for the batch-equality assertion below and LIMIT without ORDER
    // BY may pick a different subset per execution.
    val real = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 100)
    val planted = Seq(
      (900001L, "en", Seq.fill(50)("the a and of").mkString(" ")),
      (900002L, "en", Seq.fill(60)("substantial informative content words")
        .mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val docs = real.unionByName(planted)
    docs.write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingQuality.start(spark, in, out, schema, minScore)
    try q.awaitTermination(120000) finally q.stop()

    val accepted = StreamingQuality.readSink(spark, s"$out/accepted")
    val rejected = StreamingQuality.readSink(spark, s"$out/rejected")

    // stream ≡ batch: same transform, same predicate, same rows
    val batchAccepted = TextOps.withQuality(docs)
      .filter(col("quality_score") >= minScore)
      .select("doc_id").as[Long].collect().toSet
    assert(accepted.select("doc_id").as[Long].collect().toSet
      == batchAccepted)
    // nothing lost: every input row is in exactly one sink
    assert(accepted.count() + rejected.count() == docs.count())

    // planted extremes routed as designed
    val rejIds = rejected.select("doc_id").as[Long].collect().toSet
    assert(rejIds.contains(900001L), "all-stopword doc must be rejected")
    assert(accepted.filter(col("doc_id") === 900002L).count() == 1L)
    // the reject sink keeps the score evidence for audit
    assert(rejected.filter(col("doc_id") === 900001L)
      .head().getAs[Double]("quality_score") == 0.0)
  }

  test("adaptive ingest gate ≡ batch q61 on per-language thresholds") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-squal-ad-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-squal-ad-out").toString

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 200)
    docs.write.parquet(in)

    // train half: q61's thresholds learned batch-side over the same
    // corpus, collected to the driver-side map (|langs| rows, bounded)
    val thresholds = TextOps.qualityThresholds(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(thresholds.size >= 2, "corpus slice should span languages")

    val schema = spark.read.parquet(in).schema
    val q = StreamingQuality.startAdaptive(
      spark, in, out, schema, thresholds)
    try q.awaitTermination(120000) finally q.stop()

    // serve half ≡ the batch gate's kept set, doc for doc
    val streamed = StreamingQuality.readSink(spark, s"$out/accepted")
      .select("doc_id").as[Long].collect().toSet
    val batch = TextOps.qualityGate(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch,
      s"adaptive stream diverged from batch gate: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    // a language missing from the map falls back, not crashes
    assert(StreamingQuality.readSink(spark, s"$out/accepted").count() +
      StreamingQuality.readSink(spark, s"$out/rejected").count()
      == docs.count())
  }

  test("redelivering a batchId does not duplicate sink rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-squal-replay").toString
    val scored = TextOps.withQuality(Seq(
      (1L, "en", Seq.fill(60)("substantial informative content words")
        .mkString(" ")),
      (2L, "en", Seq.fill(50)("the a and of").mkString(" ")))
      .toDF("doc_id", "lang", "text"))

    // crash-replay shape: foreachBatch re-invoked with the SAME
    // batchId and (deterministically reconstructed) same rows —
    // the overwrite-by-batchId write must absorb it, not append
    StreamingQuality.writeBatch(scored, 7L, out,
      col("quality_score") >= 0.25)
    StreamingQuality.writeBatch(scored, 7L, out,
      col("quality_score") >= 0.25)

    assert(StreamingQuality.readSink(spark, s"$out/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(StreamingQuality.readSink(spark, s"$out/rejected")
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))

    // a DIFFERENT batchId is new data and must land alongside
    StreamingQuality.writeBatch(scored, 8L, out,
      col("quality_score") >= 0.25)
    assert(StreamingQuality.readSink(spark, s"$out/accepted").count() == 2L)
  }
}
