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
