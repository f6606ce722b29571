package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Analytics
import graft.streaming.StreamingCms

/** Streaming sketch accumulation ≡ batch: summing per-batch Count-Min
  * matrices must land on exactly the one-pass corpus sketch — the
  * linear-sketch algebra proven, not assumed, across real micro-batch
  * boundaries. */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streamed sketch sums to exactly the batch corpus sketch") {
    val in = Files.createTempDirectory("graft-cms-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-cms-out").toString
    val docs = Tables(spark, sfDir, "documents").select(col("text"))
    docs.repartition(3).write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingCms.start(spark, in, out, schema, maxFilesPerTrigger = 1)
    try q.awaitTermination(120000) finally q.stop()

    // the run was genuinely multi-batch — otherwise the merge is vacuous
    val fs = new org.apache.hadoop.fs.Path(s"$out/sketch")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/sketch"))
      .count(_.getPath.getName.startsWith("graft_batch_id="))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    val streamed = StreamingCms.readSketch(spark, out).as[Seq[Long]].head()
    val batch = Analytics.cmsOf(docs).as[Seq[Long]].head()
    assert(streamed == batch,
      "streamed sketch sum diverged from the one-pass corpus sketch")
    assert(streamed.sum > 0, "fixture is vacuous — empty sketch")
  }

  test("a crash-replayed batch overwrites its earlier attempt, never double-counts") {
    val out = Files.createTempDirectory("graft-cms-replay").toString
    val docsA = Seq("alpha beta beta", "gamma").toDF("text")
    StreamingCms.writeBatch(docsA, 7L, out)
    val once = StreamingCms.readSketch(spark, out).as[Seq[Long]].head()
    // replay of the SAME batch id (crash between sink write and
    // checkpoint commit): the ledger must end up identical
    StreamingCms.writeBatch(docsA, 7L, out)
    val twice = StreamingCms.readSketch(spark, out).as[Seq[Long]].head()
    assert(twice == once, "replayed batch double-counted")
    // every depth row counts each of the 4 token occurrences once
    assert(once.sum == 4L * Analytics.CmsDepth,
      s"expected 4 occurrences x depth, got ${once.sum}")

    // a DIFFERENT batch id does accumulate
    StreamingCms.writeBatch(Seq("alpha").toDF("text"), 8L, out)
    val plus = StreamingCms.readSketch(spark, out).as[Seq[Long]].head()
    assert(plus.sum == 5L * Analytics.CmsDepth)
    assert(plus.zip(once).forall { case (a, b) => a >= b },
      "accumulation must be monotone per counter")
  }
}
