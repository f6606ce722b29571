package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.streaming.StreamingTfGrain

/** Streaming grain accumulation ≡ batch: the union of per-batch
  * (term, doc_id, tf) grains must be value-identical to the one-pass
  * corpus grain, and the q101 inverted-index head served from it must
  * hash-match the batch build — q122's stream twin, proven across
  * real micro-batch boundaries. */
class StreamingTfGrainSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streamed grain ≡ one-pass corpus grain; index head identical") {
    val in = Files.createTempDirectory("graft-tfg-in").toString + "/docs"
    val out = Files.createTempDirectory("graft-tfg-out").toString
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    docs.repartition(3).write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingTfGrain.start(spark, in, out, schema,
      maxFilesPerTrigger = 1)
    try q.awaitTermination(120000) finally q.stop()

    // the run was genuinely multi-batch — otherwise the union is vacuous
    val fs = new org.apache.hadoop.fs.Path(s"$out/grain")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/grain"))
      .count(_.getPath.getName.startsWith("graft_batch_id="))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    // grain value-identity, both set-difference directions
    val streamed = StreamingTfGrain.readGrain(spark, out)
    val batch = TextOps.tfGrainOf(docs)
    assert(streamed.exceptAll(batch).count() == 0, "streamed grain has extras")
    assert(batch.exceptAll(streamed).count() == 0, "streamed grain lost rows")

    // and the consumer-visible artifact — the q101/q122 inverted-index
    // head — is row-identical when served from the streamed grain
    val idxStream = TextOps.invertedIndexFrom(streamed).collect().toSeq
    val idxBatch = TextOps.invertedIndexFrom(batch).collect().toSeq
    assert(idxStream == idxBatch, "index head diverged from batch build")
    assert(idxBatch.nonEmpty, "fixture is vacuous — empty index")
  }

  test("a crash-replayed batch overwrites its earlier attempt, never double-counts") {
    val out = Files.createTempDirectory("graft-tfg-replay").toString
    val docsA = Seq((1L, "alpha beta beta"), (2L, "gamma")).toDF("doc_id", "text")
    StreamingTfGrain.writeBatch(docsA, 7L, out)
    val once = StreamingTfGrain.readGrain(spark, out)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // replay of the SAME batch id (crash between sink write and
    // checkpoint commit): the ledger must end up identical
    StreamingTfGrain.writeBatch(docsA, 7L, out)
    val twice = StreamingTfGrain.readGrain(spark, out)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(twice == once, "replayed batch double-counted tf")
    // the grain is exact: beta has tf 2 in doc 1
    assert(once.contains(Seq("beta", 1L, 2L)), s"grain wrong: $once")

    // a DIFFERENT batch id does accumulate — disjoint docs, pure union
    StreamingTfGrain.writeBatch(
      Seq((3L, "alpha")).toDF("doc_id", "text"), 8L, out)
    val plus = StreamingTfGrain.readGrain(spark, out)
    assert(plus.count() == once.size + 1L)
    assert(plus.filter($"doc_id" === 3L && $"term" === "alpha" && $"tf" === 1L)
      .count() == 1L)
  }

  test("ledger compaction is value-invisible; duplicate-rows crash window heals") {
    val out = Files.createTempDirectory("graft-tfg-compact").toString
    def batchDocs(b: Long) = Seq((b * 10 + 1, s"tok$b common"),
      (b * 10 + 2, s"only$b")).toDF("doc_id", "text")
    (0L to 4L).foreach(b => StreamingTfGrain.writeBatch(batchDocs(b), b, out))
    def grain() = StreamingTfGrain.readGrain(spark, out)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val before = grain()

    StreamingTfGrain.compactLedger(spark, out, keepLast = 2)
    assert(grain() == before, "compaction changed the standing grain")
    val root = new org.apache.hadoop.fs.Path(s"$out/grain")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def parts() = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("graft_batch_id=")).toSet
    assert(parts() == Set("graft_batch_id=-1", "graft_batch_id=3",
      "graft_batch_id=4"), s"fold left ${parts()}")

    // the duplicate-rows window: a folded batch dir back on disk after
    // the promote, manifest still live — its docs' grain rows would
    // appear TWICE in the union (doubling every downstream df/tf
    // aggregate) unless the read-side heal deletes it, after which
    // the manifest retires
    val manifest = new org.apache.hadoop.fs.Path(root,
      "graft_batch_id=-1/_folded")
    StreamingTfGrain.writeBatch(batchDocs(0L), 0L, out)
    val mo = fs.create(manifest, true)
    try mo.write("0,1,2".getBytes("UTF-8")) finally mo.close()
    assert(grain() == before, "resurrected folded batch duplicated grain rows")
    assert(!parts().contains("graft_batch_id=0"))
    assert(!fs.exists(manifest), "manifest must retire after the heal")

    // a kept batch's replay stays idempotent after compaction
    StreamingTfGrain.writeBatch(batchDocs(4L), 4L, out)
    assert(grain() == before, "kept-batch replay duplicated grain rows")
  }
}
