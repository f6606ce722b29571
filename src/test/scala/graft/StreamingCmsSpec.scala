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

  test("ledger compaction is value-invisible and heals every crash window") {
    val out = Files.createTempDirectory("graft-cms-compact").toString
    def batchDocs(b: Long) = Seq(s"tok$b common").toDF("text")
    (0L to 4L).foreach(b => StreamingCms.writeBatch(batchDocs(b), b, out))
    def sketch() = StreamingCms.readSketch(spark, out).as[Seq[Long]].head()
    val before = sketch()

    StreamingCms.compactLedger(spark, out, keepLast = 2)
    assert(sketch() == before, "compaction changed the standing sketch")
    val root = new org.apache.hadoop.fs.Path(s"$out/sketch")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def parts() = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("graft_batch_id=")).toSet
    assert(parts() == Set("graft_batch_id=-1", "graft_batch_id=3",
      "graft_batch_id=4"), s"fold left ${parts()}")
    // idempotent: nothing foldable remains below the horizon
    StreamingCms.compactLedger(spark, out, keepLast = 2)
    assert(sketch() == before && parts().size == 3)
    // a kept batch's replay stays idempotent after compaction
    StreamingCms.writeBatch(batchDocs(4L), 4L, out)
    assert(sketch() == before, "kept-batch replay double-counted")

    // the manifest is retired once its deletions are confirmed —
    // steady-state reads are a single existence probe, not one delete
    // RPC per folded batch forever
    val manifest = new org.apache.hadoop.fs.Path(root,
      "graft_batch_id=-1/_folded")
    assert(!fs.exists(manifest), "manifest must retire after heal")

    // crash window 1 (after promote, before source deletion): a folded
    // batch dir still on disk WITH the manifest still live — the exact
    // shape that would DOUBLE-COUNT under sum semantics; the read-side
    // heal must delete the leftover, then retire the manifest
    StreamingCms.writeBatch(batchDocs(2L), 2L, out)
    val mo = fs.create(manifest, true)
    try mo.write("0,1,2".getBytes("UTF-8")) finally mo.close()
    assert(sketch() == before, "resurrected folded batch double-counted")
    assert(!parts().contains("graft_batch_id=2"),
      "heal must delete the manifest-recorded leftover")
    assert(!fs.exists(manifest), "manifest must retire after the heal")

    // crash window 2 (between the swap renames): compacted partition
    // moved aside to the backup name — heal restores it
    val tgt = new org.apache.hadoop.fs.Path(root, "graft_batch_id=-1")
    val bak = new org.apache.hadoop.fs.Path(root, "_compact_backup")
    assert(fs.rename(tgt, bak))
    assert(sketch() == before, "backup restore lost the compacted fold")
    assert(fs.exists(tgt) && !fs.exists(bak))

    // crash window 3 (before promote): a stale staging dir is ignored
    // and cleared
    val staging = new org.apache.hadoop.fs.Path(root, "_compact_staging")
    fs.mkdirs(staging)
    assert(sketch() == before)
    assert(!fs.exists(staging), "heal must clear stale staging")
  }
}
