package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TextOps}
import graft.streaming.StreamingWindowMass

/** Streaming window-mass ≡ batch q107: streaming the q107 delta docs
  * against the q107 standing corpus must score every doc identically —
  * one shared kernel, proven, not assumed. */
class StreamingWindowMassSpec extends SparkSpec {
  import spark.implicits._

  test("streamed window mass scores exactly the batch q107 rows") {
    val in = Files.createTempDirectory("graft-wm-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-wm-out").toString
    val all = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("_k", TextOps.uniformKeyOf(col("doc_id")))
    all.filter(col("_k") < 0.1).drop("_k").write.parquet(in)
    val corpus = all.filter(col("_k") >= 0.1).drop("_k")

    val schema = spark.read.parquet(in).schema
    val q = StreamingWindowMass.start(spark, in, out, schema, corpus)
    try q.awaitTermination(120000) finally q.stop()

    val batch = Dedup.q107DeltaWindowMass(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val streamed = StreamingWindowMass.readSink(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed == batch,
      s"stream/batch score divergence: $streamed vs $batch")
    assert(streamed.values.exists(_._2 > 0),
      "no overlap scored — fixture is vacuous")
  }

  test("versioned scorer: a corpus publish changes scoring for later batches only") {
    import graft.sources.Versioned
    val lake = Files.createTempDirectory("graft-wm-lake").toString + "/lake"
    val in = Files.createTempDirectory("graft-wm-vin").toString + "/docs"
    val out = Files.createTempDirectory("graft-wm-vout").toString
    val textA = "alpha corpus passage long enough to roll several full " +
      "windows of forty characters through the hash"
    val textB = "beta corpus passage that is absent at first and becomes " +
      "standing corpus only at version two of the lake"

    // v1: the lake knows only textA (delta = everything, first publish)
    val v1docs = Seq((100L, textA)).toDF("doc_id", "text")
    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("documents", v1docs),
      Versioned.TableSpec("documents_delta", v1docs)))

    // batch 1: one doc duplicating textA, one duplicating textB
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val q1 = StreamingWindowMass.startVersioned(spark, in, out, schema, lake)
    try q1.awaitTermination(120000) finally q1.stop()

    // the ingest pipeline publishes v2 adding textB, with textB as the
    // version's change table — exactly what the incremental index
    // maintenance consumes
    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("documents", Seq((100L, textA), (200L, textB))
        .toDF("doc_id", "text")),
      Versioned.TableSpec("documents_delta",
        Seq((200L, textB)).toDF("doc_id", "text"))))

    // batch 2: the same two texts under fresh ids, scored after the
    // publish (same checkpoint — the restarted AvailableNow run picks
    // up only the new file; the per-batch version probe is the same
    // code path a long-running trigger takes between batches)
    Seq((3L, textA), (4L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val q2 = StreamingWindowMass.startVersioned(spark, in, out, schema, lake)
    try q2.awaitTermination(120000) finally q2.stop()

    val scored = StreamingWindowMass.readSink(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // batch 1, scored under v1: textA fully duplicated, textB unknown
    assert(scored(1L)._2 > 0, s"textA must overlap v1: ${scored(1L)}")
    assert(scored(2L)._2 == 0, s"textB unknown at v1: ${scored(2L)}")
    // batch 2, scored under v2: textB is now standing corpus — the
    // publish changed scoring for the SUBSEQUENT batch...
    assert(scored(3L)._2 > 0, s"textA must still overlap at v2: ${scored(3L)}")
    assert(scored(4L)._2 == scored(4L)._1,
      s"textB must be fully duplicated at v2: ${scored(4L)}")
    // ...and ONLY the subsequent batch: batch 1's ledger rows kept
    // their v1 scores (doc 2 still reads 0)
    assert(scored(2L)._2 == 0, "a later publish must not rewrite history")
    // the v2 index came from the incremental chain: both version
    // artifacts exist (v1 full-built, v2 merged from v1 + delta)
    assert(graft.sources.ArtifactStore.readIfPresent(
      spark, Dedup.windowIndexArtifact(lake, 1L)).nonEmpty)
    assert(graft.sources.ArtifactStore.readIfPresent(
      spark, Dedup.windowIndexArtifact(lake, 2L)).nonEmpty)
  }

  test("redelivering a batchId overwrites, never duplicates, its scores") {
    val out = Files.createTempDirectory("graft-wm-replay").toString
    val pad = ("the quick brown fox jumps over one lazy dog and then naps " * 2)
    val corpus = Seq((100L, pad + "shared tail of this corpus document"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, pad + "completely novel continuation written fresh"),
      (2L, "short"))
      .toDF("doc_id", "text")
    val idx = Dedup.distinctWindowsOf(corpus)
    StreamingWindowMass.writeBatch(batch, 5L, idx, out)
    val first = StreamingWindowMass.readSink(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    StreamingWindowMass.writeBatch(batch, 5L, idx, out)
    val second = StreamingWindowMass.readSink(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(first == second, "replayed batch changed the ledger")
    assert(first.map(_._1) == Seq(1L, 2L))
    // doc 1 shares its padded prefix with the corpus doc; doc 2 is
    // shorter than one window and must score (0, 0)
    val d1 = first.find(_._1 == 1L).get
    assert(d1._3 > 0, s"shared-prefix doc scored no overlap: $d1")
    assert(first.find(_._1 == 2L).get._2 == 0L)
  }
}
