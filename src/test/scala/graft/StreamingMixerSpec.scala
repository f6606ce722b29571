package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingMixer

/** Streaming mixer ≡ batch sampling: with q54's exact rates, the kept
  * set must be exactly q54SampleMix's ids — the stream-static filter
  * and the batch query share one key definition, so the equality is
  * bit-for-bit, not statistical. */
class StreamingMixerSpec extends SparkSpec {
  import spark.implicits._

  private val rates = Seq(("en", 0.25), ("es", 0.5)).toDF("lang", "rate")

  test("streamed mixing keeps exactly the batch q54 sample") {
    val in = Files.createTempDirectory("graft-mix-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-mix-out").toString
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    corpus.write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingMixer.start(spark, in, out, schema, rates)
    try q.awaitTermination(120000) finally q.stop()

    val kept = StreamingMixer.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().toSet
    // q54 uses the same rates (en .25, es .5, else keep) and the same
    // md5-uniform key — the stream must reproduce it exactly
    val batch = TextOps.q54SampleMix(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batch,
      s"stream/batch diverge: ${(kept diff batch) ++ (batch diff kept)}")
    // sanity: the mixer actually dropped something, and kept something
    assert(kept.nonEmpty && kept.size < corpus.count())
  }

  test("redelivering a mixer batchId does not duplicate rows") {
    val out = Files.createTempDirectory("graft-mix-replay").toString
    val batch = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 50)
    StreamingMixer.writeBatch(batch, 7L, rates, out)
    val first = StreamingMixer.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // crash-replay of the same batchId: same rows, not doubled
    StreamingMixer.writeBatch(batch, 7L, rates, out)
    val second = StreamingMixer.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(first == second && first.nonEmpty)
  }

  test("duplicate lang rows in the rate table do not duplicate docs") {
    val in = Files.createTempDirectory("graft-mix-dup-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-mix-dup-out").toString
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 200)
    corpus.write.parquet(in)
    // a q74 output unioned across runs: en appears twice with
    // conflicting rates — start() must canonicalize (min wins), not
    // fan out the join
    val dupRates = rates.union(Seq(("en", 0.75)).toDF("lang", "rate"))
    val schema = spark.read.parquet(in).schema
    val q = StreamingMixer.start(spark, in, out, schema, dupRates)
    try q.awaitTermination(120000) finally q.stop()
    val kept = StreamingMixer.readSink(spark, s"$out/kept")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept.size == kept.distinct.size, "fan-out duplicated docs")
    // min-rate resolution: identical to running with en->0.25 alone
    val canonical = StreamingMixer.readSink(spark, {
      val out2 = Files.createTempDirectory("graft-mix-dup-ref").toString
      StreamingMixer.writeBatch(
        spark.read.parquet(in), 0L,
        Seq(("en", 0.25), ("es", 0.5)).toDF("lang", "rate"), out2)
      s"$out2/kept"
    }).select("doc_id").as[Long].collect().toSet
    assert(kept.toSet == canonical)
  }

  test("languages missing from the rate table pass through entirely") {
    val out = Files.createTempDirectory("graft-mix-dflt").toString
    val batch = Seq((1L, "xx", "a"), (2L, "xx", "b"), (3L, "xx", "c"))
      .toDF("doc_id", "lang", "text")
    StreamingMixer.writeBatch(batch, 0L, rates, out)
    assert(StreamingMixer.readSink(spark, s"$out/kept").count() == 3L)
  }
}
