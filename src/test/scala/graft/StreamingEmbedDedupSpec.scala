package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{Similarity, TextOps}
import graft.streaming.StreamingEmbedDedup

/** Streaming embedding dedup ≡ batch q103: streaming the q103 delta
  * vectors against the q103 corpus index (same frozen codebook
  * artifact) must quarantine exactly the vectors q103 flags, with the
  * same dup_of attribution — one shared definition, proven. */
class StreamingEmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed embed dedup quarantines exactly the batch q103 dups") {
    val in = Files.createTempDirectory("graft-ed-in").toString + "/vecs"
    val out = Files.createTempDirectory("graft-ed-out").toString
    val all = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("_k", TextOps.uniformKeyOf(col("vec_id")))
    all.filter(col("_k") < 0.1).drop("_k").write.parquet(in)
    val corpus = all.filter(col("_k") >= 0.1).drop("_k")

    val schema = spark.read.parquet(in).schema
    val q = StreamingEmbedDedup.start(spark, in, out, schema, corpus,
      codebookSource = Tables(spark, sfDir, "embeddings"))
    try q.awaitTermination(120000) finally q.stop()

    val batch = Similarity.q103DeltaEmbedDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val streamedDup = StreamingEmbedDedup.readSink(spark, s"$out/dup")
      .select($"vec_id", $"dup_of").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamedKept = StreamingEmbedDedup.readSink(spark, s"$out/kept")
      .select("vec_id").as[Long].collect().toSet

    val batchDups = batch.collect { case (id, (1L, ref)) => id -> ref }.toMap
    assert(streamedDup == batchDups,
      s"stream/batch dup divergence: $streamedDup vs $batchDups")
    assert(streamedKept == batch.keySet -- batchDups.keySet,
      "kept sink must hold exactly the non-dup delta vectors")
    assert(streamedKept.nonEmpty)
  }

  test("redelivering a batchId does not duplicate rows in either sink") {
    val out = Files.createTempDirectory("graft-ed-replay").toString
    val cbSrc = Seq((0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((100L, Seq(0.9f, 0.1f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)), // clone of the corpus vector
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f))) // orthogonal — kept
      .toDF("vec_id", "embedding")
    val cb = Similarity.frozenCodebook(cbSrc)
    val corpusIdx = Similarity.assignCells(corpus, cb)
    StreamingEmbedDedup.writeBatch(batch, 3L, corpusIdx, cb, out)
    val kept1 = StreamingEmbedDedup.readSink(spark, s"$out/kept")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val dup1 = StreamingEmbedDedup.readSink(spark, s"$out/dup")
      .select("vec_id").as[Long].collect().sorted.toSeq
    StreamingEmbedDedup.writeBatch(batch, 3L, corpusIdx, cb, out)
    val kept2 = StreamingEmbedDedup.readSink(spark, s"$out/kept")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val dup2 = StreamingEmbedDedup.readSink(spark, s"$out/dup")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept1 == kept2 && dup1 == dup2)
    assert(dup1 == Seq(1L), s"clone must be quarantined: $dup1")
    assert(kept1 == Seq(2L), s"distinct vector must pass: $kept1")
    // the quarantined row carries its evidence
    val dupOf = StreamingEmbedDedup.readSink(spark, s"$out/dup")
      .select("dup_of").as[Long].collect().toSeq
    assert(dupOf == Seq(100L))
  }
}
