package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TextOps}
import graft.streaming.StreamingDeltaDedup

/** Streaming delta dedup ≡ batch q76: streaming the q76 delta docs
  * against the q76 corpus index must quarantine exactly the docs q76
  * flags, with the same dup_of attribution — one shared definition,
  * proven, not assumed. */
class StreamingDeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed delta dedup quarantines exactly the batch q76 dups") {
    val in = Files.createTempDirectory("graft-dd-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-dd-out").toString
    val all = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("_k", TextOps.uniformKeyOf(col("doc_id")))
    all.filter(col("_k") < 0.1).drop("_k").write.parquet(in)
    val corpus = all.filter(col("_k") >= 0.1).drop("_k")

    val schema = spark.read.parquet(in).schema
    val q = StreamingDeltaDedup.start(spark, in, out, schema, corpus)
    try q.awaitTermination(120000) finally q.stop()

    val batch = Dedup.q76DeltaDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val streamedDup = StreamingDeltaDedup.readSink(spark, s"$out/dup")
      .select($"doc_id", $"dup_of").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamedKept = StreamingDeltaDedup.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().toSet

    val batchDups = batch.collect { case (id, (1L, ref)) => id -> ref }.toMap
    assert(streamedDup == batchDups,
      s"stream/batch dup divergence: $streamedDup vs $batchDups")
    assert(streamedKept == batch.keySet -- batchDups.keySet,
      "kept sink must hold exactly the non-dup delta docs")
    assert(streamedKept.nonEmpty)
  }

  test("redelivering a batchId does not duplicate rows in either sink") {
    val out = Files.createTempDirectory("graft-dd-replay").toString
    val corpus = Seq((100L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "x y z w v u t s r q"), // clone of the corpus doc
      (2L, "completely different words here nothing shared at all ok"))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(corpus)
    StreamingDeltaDedup.writeBatch(batch, 3L, corpusSigs, out)
    val kept1 = StreamingDeltaDedup.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val dup1 = StreamingDeltaDedup.readSink(spark, s"$out/dup")
      .select("doc_id").as[Long].collect().sorted.toSeq
    StreamingDeltaDedup.writeBatch(batch, 3L, corpusSigs, out)
    val kept2 = StreamingDeltaDedup.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val dup2 = StreamingDeltaDedup.readSink(spark, s"$out/dup")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept1 == kept2 && dup1 == dup2)
    assert(dup1 == Seq(1L), s"clone must be quarantined: $dup1")
    assert(kept1 == Seq(2L), s"distinct doc must pass: $kept1")
    // the quarantined row carries its evidence
    val dupOf = StreamingDeltaDedup.readSink(spark, s"$out/dup")
      .select("dup_of").as[Long].collect().toSeq
    assert(dupOf == Seq(100L))
  }
}
