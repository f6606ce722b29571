package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingDecontam

/** Streaming decontamination ≡ batch q53 probe, on real documents plus
  * planted extremes: the flagged set must be exactly what the batch
  * probe flags, a verbatim copy of an eval document must be caught,
  * and a no-overlap document must pass clean. */
class StreamingDecontamSpec extends SparkSpec {

  test("streamed decontamination flags exactly the batch probe's docs") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-decon-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-decon-out").toString

    val d = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    // q53's eval slice standing in for a benchmark table
    val evalSet = d.filter(col("doc_id") % 50 === 0)
    // verbatim eval text → must be flagged (shares every 3-gram)
    val evalText = evalSet.orderBy("doc_id").select("text")
      .head().getString(0)
    val planted = Seq(
      (900001L, "en", evalText),
      // unique gibberish tokens → shares no 3-gram, must pass clean
      (900002L, "en", (1 to 40).map(i => s"zqx${i}vw").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val corpus = d.filter(col("doc_id") < 100 && col("doc_id") % 50 =!= 0)
      .unionByName(planted)
    corpus.write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingDecontam.start(spark, in, out, schema, evalSet)
    try q.awaitTermination(120000) finally q.stop()

    val clean = StreamingDecontam.readSink(spark, s"$out/clean")
    val flagged = StreamingDecontam.readSink(spark, s"$out/flagged")

    // stream ≡ batch: same probe, same eval set, same flagged ids
    val batchFlagged = TextOps.decontaminate(corpus, evalSet)
      .filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.select("doc_id").as[Long].collect().toSet == batchFlagged)
    // nothing lost: every input row is in exactly one sink
    assert(clean.count() + flagged.count() == corpus.count())

    // planted extremes routed as designed, with audit evidence kept
    assert(flagged.filter(col("doc_id") === 900001L).count() == 1L,
      "verbatim eval copy must be flagged")
    assert(flagged.filter(col("doc_id") === 900001L)
      .head().getAs[Long]("n_shared_ngrams") > 0L)
    assert(clean.filter(col("doc_id") === 900002L).count() == 1L,
      "no-overlap doc must pass clean")
  }

  test("redelivering a decontamination batchId does not duplicate rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-decon-replay").toString
    val evalSet = Seq((1000L, "en", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "lang", "text")
    val grams = TextOps.evalGrams(evalSet).persist()
    val batch = Seq(
      (1L, "en", "alpha beta gamma delta"), // overlaps → flagged
      (2L, "en", "uno dos tres cuatro cinco")) // clean
      .toDF("doc_id", "lang", "text")

    // crash-replay shape: same batchId, same rows — overwrite, not append
    StreamingDecontam.writeBatch(batch, 3L, grams, out)
    StreamingDecontam.writeBatch(batch, 3L, grams, out)
    assert(StreamingDecontam.readSink(spark, s"$out/flagged")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(StreamingDecontam.readSink(spark, s"$out/clean")
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))

    // a DIFFERENT batchId is new data and must land alongside
    StreamingDecontam.writeBatch(batch, 4L, grams, out)
    assert(StreamingDecontam.readSink(spark, s"$out/clean").count() == 2L)
    grams.unpersist()
    ()
  }
}
