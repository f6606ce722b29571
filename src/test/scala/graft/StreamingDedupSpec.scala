package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** Cross-batch near-dup detection: a duplicate arriving in a LATER
  * micro-batch must pair with its original from an earlier one, and
  * the streamed pair set must equal the batch pipeline's over the same
  * corpus. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // same planted corpus recipe as DedupSpec: 40 distinct docs, 3
  // near-dups of doc 0, 1 exact dup of doc 1
  private val corpus: Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(7)
    def doc(): String =
      (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, doc()))
    val nearDups = (0 until 3).map { j =>
      val words = base(0)._2.split(" ")
      words(10 + j) = "CHANGED" + j
      (100L + j, words.mkString(" "))
    }
    base ++ nearDups :+ (200L, base(1)._2)
  }

  test("duplicates arriving in later batches pair with earlier originals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(spark,
        input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_pairs").start()
    try {
      // batch 1: all originals — corpus has no dups yet, so few pairs
      input.addData(corpus.filter(_._1 < 100L): _*)
      q.processAllAvailable()
      // batch 2: the near-dups and exact dup arrive LATER
      input.addData(corpus.filter(_._1 >= 100L): _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_pairs")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.contains((0L, 100L)), "cross-batch near-dup missed")
      assert(streamed.contains((1L, 200L)), "cross-batch exact dup missed")

      // stream ≡ batch: same pairs as the batch pipeline on the same corpus
      val dir = Files.createTempDirectory("graft-sdedup").toString
      corpus.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length($"text"))
        .write.parquet(s"$dir/documents.parquet")
      val batch = graft.queries.Dedup.minhashCandidatePairs(spark, dir)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"stream-batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("expiring bucket update: live buckets pair + arm TTL; timeouts drop state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamingDedup.{BucketState, DocEntry, DocSig}
    val mhsA = (0 until 8).map(i => s"h$i")
    val mhsB = mhsA.updated(0, "different") // 7/8 equal → est 0.875
    // live path: a prior doc in state pairs with the arriving one
    val live = TestGroupState.create[BucketState](
      optionalState = org.apache.spark.api.java.Optional.of(
        BucketState(List(DocEntry(1L, mhsA)))),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    val out = StreamingDedup.expiringBucketUpdate(0.5, 1000L)("b",
      Iterator(DocSig(2L, "b", mhsB)), live).toSeq
    assert(out.map(c => (c.doc_a, c.doc_b)) == Seq((1L, 2L)))
    assert(out.head.est_jaccard == 0.875)
    assert(live.exists && live.get.docs.size == 2)
    // timed-out path: signatures dropped, nothing emitted
    val dead = TestGroupState.create[BucketState](
      optionalState = org.apache.spark.api.java.Optional.of(
        BucketState(List(DocEntry(1L, mhsA)))),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = true)
    val none = StreamingDedup.expiringBucketUpdate(0.5, 1000L)("b",
      Iterator.empty, dead)
    assert(none.isEmpty && dead.isRemoved,
      "expired bucket must drop its signatures")
  }

  test("replayed doc_ids are idempotent (at-least-once safety)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(spark,
        input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("replay_pairs").start()
    try {
      val pair = corpus.filter(t => t._1 == 0L || t._1 == 100L)
      input.addData(pair: _*)
      q.processAllAvailable()
      input.addData(pair: _*) // redelivery of the same documents
      q.processAllAvailable()
      val rows = spark.table("replay_pairs")
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // emitted once per colliding bucket, but the REPLAY adds nothing
      assert(rows.nonEmpty && rows.toSet == Set((0L, 100L)))
      val afterFirst = rows.length
      input.addData(pair: _*)
      q.processAllAvailable()
      assert(spark.table("replay_pairs").count() == afterFirst)
    } finally q.stop()
  }
}
