package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Analytics
import graft.streaming.StreamingKmv

/** Streaming KMV accumulation ≡ batch: the bottom-k merge of per-batch
  * sketches must land on exactly the one-pass per-source corpus
  * sketches — the mergeability identity proven, not assumed, across
  * real micro-batch boundaries. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streamed sketches merge to exactly the batch corpus sketches") {
    val in = Files.createTempDirectory("graft-kmv-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-kmv-out").toString
    val docs = Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
    docs.repartition(3).write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingKmv.start(spark, in, out, schema, maxFilesPerTrigger = 1)
    try q.awaitTermination(120000) finally q.stop()

    // the run was genuinely multi-batch — otherwise the merge is vacuous
    val fs = new org.apache.hadoop.fs.Path(s"$out/sketch")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/sketch"))
      .count(_.getPath.getName.startsWith("graft_batch_id="))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), col("mins"), col("n_docs"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val streamed = rows(StreamingKmv.readSketches(spark, out))
    val batch = rows(Analytics.kmvSketchOf(docs))
    assert(streamed == batch,
      "streamed bottom-k merge diverged from the one-pass corpus sketches")
    assert(streamed.nonEmpty && streamed.forall(_._2.nonEmpty),
      "fixture is vacuous — empty sketches")
  }

  test("a crash-replayed batch overwrites its earlier attempt, never double-merges") {
    val out = Files.createTempDirectory("graft-kmv-replay").toString
    val a = Seq(("web", "alpha"), ("web", "beta"), ("book", "gamma"))
      .toDF("source", "text")
    StreamingKmv.writeBatch(a, 7L, out)
    def rows() = StreamingKmv.readSketches(spark, out)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val once = rows()
    // replay of the SAME batch id (crash between sink write and
    // checkpoint commit): the ledger must end up identical — for the
    // set column trivially, for the n_docs SUM only because of the
    // overwrite
    StreamingKmv.writeBatch(a, 7L, out)
    assert(rows() == once, "replayed batch double-merged")
    assert(once.map(_._3).sum == 3L, "n_docs must count the batch once")

    // a DIFFERENT batch id accumulates: a repeated text adds NO new
    // minimum (distinct semantics across batches), a fresh text does
    StreamingKmv.writeBatch(
      Seq(("web", "alpha"), ("web", "delta")).toDF("source", "text"), 8L, out)
    val plus = rows().map { case (s, m, n) => s -> ((m, n)) }.toMap
    val web0 = once.find(_._1 == "web").get
    assert(plus("web")._2 == 4L, "n_docs must sum across distinct batches")
    assert(plus("web")._1.toSet.subsetOf(
      (web0._2.toSet ++ Analytics.kmvSketchOf(
        Seq(("web", "delta")).toDF("source", "text"))
        .collect().head.getSeq[Long](1).toSet)),
      "merged minima must come from the union of batch minima")
    assert(plus("web")._1.size == 3,
      "alpha re-ingested must not add a duplicate minimum")
    assert(plus("book") == ((once.find(_._1 == "book").get._2, 1L)),
      "untouched source must carry through bit-identically")
  }

  test("ledger compaction is value-invisible; the n_docs sum survives the crash windows") {
    val out = Files.createTempDirectory("graft-kmv-compact").toString
    def batchDocs(b: Long) = Seq(
      ("web", s"doc-$b-x"), ("web", s"doc-$b-y"), ("book", s"doc-$b-z"))
      .toDF("source", "text")
    (0L to 4L).foreach(b => StreamingKmv.writeBatch(batchDocs(b), b, out))
    def rows() = StreamingKmv.readSketches(spark, out)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val before = rows()
    assert(before.map(_._3).sum == 15L, "fixture: 5 batches x 3 docs")

    StreamingKmv.compactLedger(spark, out, keepLast = 2)
    assert(rows() == before, "compaction changed the standing sketches")
    val root = new org.apache.hadoop.fs.Path(s"$out/sketch")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def parts() = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("graft_batch_id=")).toSet
    assert(parts() == Set("graft_batch_id=-1", "graft_batch_id=3",
      "graft_batch_id=4"), s"fold left ${parts()}")

    // the double-count window: a folded batch dir back on disk after
    // the promote, manifest still live — 3 phantom docs unless the
    // read-side heal deletes it (the minima forgive by idempotence;
    // the n_docs SUM does not), after which the manifest retires
    val manifest = new org.apache.hadoop.fs.Path(root,
      "graft_batch_id=-1/_folded")
    StreamingKmv.writeBatch(batchDocs(1L), 1L, out)
    val mo = fs.create(manifest, true)
    try mo.write("0,1,2".getBytes("UTF-8")) finally mo.close()
    assert(rows() == before, "resurrected folded batch inflated n_docs")
    assert(!parts().contains("graft_batch_id=1"))
    assert(!fs.exists(manifest), "manifest must retire after the heal")

    // swap-crash window: compacted partition aside under the backup
    // name — heal restores it with every source's count intact
    val tgt = new org.apache.hadoop.fs.Path(root, "graft_batch_id=-1")
    val bak = new org.apache.hadoop.fs.Path(root, "_compact_backup")
    assert(fs.rename(tgt, bak))
    assert(rows() == before, "backup restore lost folded batches")
    assert(fs.exists(tgt) && !fs.exists(bak))
  }
}
