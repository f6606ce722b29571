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

  test("versioned embed dedup: a lake publish changes routing for later batches only") {
    import graft.sources.Versioned
    val lake = Files.createTempDirectory("graft-ed-lake").toString + "/lake"
    val in = Files.createTempDirectory("graft-ed-vin").toString + "/vecs"
    val out = Files.createTempDirectory("graft-ed-vout").toString
    def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
    val centroid = 0L -> Seq(1.0f, 0.0f, 0.0f, 0.0f) // the frozen codebook
    val vecA = 100L -> Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val vecB = 200L -> Seq(0.0f, 0.0f, 0.0f, 1.0f) // absent until v2

    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("embeddings", vecs(centroid, vecA)),
      Versioned.TableSpec("embeddings_delta", vecs(centroid, vecA))))

    // batch 1: a near-clone of A (dup) and a near-clone of the
    // still-unknown B (must pass)
    vecs(1001L -> Seq(0.0f, 0.0f, 0.99f, 0.05f),
         1002L -> Seq(0.0f, 0.0f, 0.05f, 0.99f))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val q1 = StreamingEmbedDedup.startVersioned(spark, in, out, schema, lake)
    try q1.awaitTermination(120000) finally q1.stop()

    // the ingest pipeline publishes v2 adding B as the change table —
    // the incremental IVF artifact appends B under the frozen centroid
    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("embeddings", vecs(centroid, vecA, vecB)),
      Versioned.TableSpec("embeddings_delta", vecs(vecB))))

    // batch 2: same two directions under fresh ids
    vecs(2001L -> Seq(0.0f, 0.0f, 0.99f, 0.05f),
         2002L -> Seq(0.0f, 0.0f, 0.05f, 0.99f))
      .coalesce(1).write.mode("append").parquet(in)
    val q2 = StreamingEmbedDedup.startVersioned(spark, in, out, schema, lake)
    try q2.awaitTermination(120000) finally q2.stop()

    val kept = StreamingEmbedDedup.readSink(spark, s"$out/kept")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val dup = StreamingEmbedDedup.readSink(spark, s"$out/dup")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("dup_of")).toMap
    // batch 1 under v1: A-clone quarantined, B-clone passed; batch 2
    // under v2: BOTH quarantined — and the publish did not rewrite
    // batch 1's routing (1002 stays kept)
    assert(kept == Seq(1002L), s"history must keep 1002 only: $kept")
    assert(dup.keySet == Set(1001L, 2001L, 2002L), s"dups: $dup")
    assert(dup(1001L) == 100L && dup(2001L) == 100L)
    assert(dup(2002L) == 200L, "batch 2's B-clone must attribute to the v2 vector")
    // the v2 routing came from the incremental IVF chain
    assert(graft.sources.ArtifactStore.readIfPresent(
      spark, Similarity.ivfIndexArtifact(lake, 2L)).nonEmpty)
  }
}
