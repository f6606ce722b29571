package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Versioned
import graft.sources.Versioned.TableSpec
import graft.queries.TextOps
import graft.streaming.StreamingTokenize

/** Ingestion-time tokenization: micro-batches of NEW documents encode
  * under the FROZEN standing model (trained once, before the stream)
  * and land in the versioned lake through the crash-idempotent
  * streamed-append discipline. Pins: (1) value identity per document
  * against the serving seam (`tokenizeText`) — the streamed shards,
  * the batch queries and `POST /tokenize` can never disagree; (2) a
  * re-run over the same checkpoint publishes nothing; (3) novel
  * words absent from the training corpus fall back to codepoint-level
  * ids (frozen-model posture) rather than retraining. */
class StreamingTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val modelDir = "/root/testdata/sf0.001"

  test("streamed batches tokenize under the frozen model, idempotently") {
    val in = Files.createTempDirectory("graft-stok-in").toString + "/docs"
    val lake = Files.createTempDirectory("graft-stok-lake").toString + "/lake"
    val ck = Files.createTempDirectory("graft-stok-ck").toString
    val merges = TextOps.bpeLearn(spark, modelDir)
      .map { case (l, r, _) => (l, r) }
    // bootstrap: the standing corpus's own tokens table
    val standing = Tables(spark, modelDir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.BpeEncode.encodeIds(col("text"), merges).as("ids"))
      .select(col("doc_id"), col("source"),
        size(col("ids")).cast("long").as("n_tokens"), col("ids"))
    Versioned.publish(spark, lake, Seq(TableSpec("tokens", standing)))
    val nStanding = standing.count()
    // incoming docs: standing-vocabulary words plus a NOVEL word the
    // frozen model never saw ("zzqxj" → codepoint-level fallback)
    val someWords = Tables(spark, modelDir, "documents")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(4)
      .collect().map(_.getString(0)).toSeq
    val incoming = (0 until 6).map { i =>
      (1000000L + i, s"src${i % 2}",
        (someWords ++ Seq("zzqxj")).mkString(" ") + s" ${someWords.head}")
    }.toDF("doc_id", "source", "text")
    incoming.repartition(3).write.parquet(in)
    val q = StreamingTokenize.start(spark, in, modelDir, lake, "tokens",
      ck, incoming.schema, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val cur = Versioned.currentVersion(spark, lake).get
    assert(cur > 1L, "stream published nothing")
    val out = Versioned.read(spark, lake, "tokens")
    assert(out.count() == nStanding + 6)
    // value identity with the serving seam, per streamed document
    val got = out.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    incoming.collect().foreach { r =>
      val (_, _, toks) = TextOps.tokenizeText(spark, modelDir, r.getString(2))
      assert(got(r.getLong(0)) == toks.flatMap(_.ids),
        s"doc ${r.getLong(0)} diverged from the serving path")
    }
    // the novel word fell back to codepoint ids (no merged symbol can
    // cover it — every id in its span is below 0x110000)
    val novelIds = TextOps.tokenizeText(spark, modelDir, "zzqxj")
      ._3.head.ids
    assert(novelIds.length == 5 && novelIds.forall(_ < 0x110000L),
      s"frozen model should char-split a novel word: $novelIds")
    // replay: same checkpoint re-run publishes nothing
    val q2 = StreamingTokenize.start(spark, in, modelDir, lake, "tokens",
      ck, incoming.schema, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(Versioned.currentVersion(spark, lake).contains(cur),
      "re-run of a completed stream must not publish")
  }
}
