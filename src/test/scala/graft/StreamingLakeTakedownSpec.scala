package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.Versioned
import graft.sources.Versioned.TableSpec
import graft.streaming.{StreamingLakeAppend, StreamingLakeTakedown}

/** Streamed takedown ([[graft.streaming.StreamingLakeTakedown]], r17):
  * stream ≡ batch value identity through tombstones, replay
  * idempotency (incl. behind a non-carrying interloper), removed keys
  * never resurrect through the auto-compaction fold, chain depth stays
  * bounded, and — the r16 review finding — an append stream and a
  * takedown stream composed on ONE lake never mistake each other's
  * batch ids for their own replays. */
class StreamingLakeTakedownSpec extends SparkSpec {
  import spark.implicits._

  private def facts(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))
  private def keys(ks: Int*) = ks.map(_.toLong).toDF("k")
  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("multi-batch streamed takedown ≡ the batch removePublish result") {
    val in = Files.createTempDirectory("graft-slt-in").toString + "/tombs"
    val lakeS = Files.createTempDirectory("graft-slt-s").toString + "/lake"
    val lakeB = Files.createTempDirectory("graft-slt-b").toString + "/lake"
    Seq(lakeS, lakeB).foreach(l =>
      Versioned.publish(spark, l, Seq(TableSpec("t", facts(0, 100)))))
    // three tombstone files in ONE flat dir (the file stream does not
    // recurse) → three micro-batches
    new java.io.File(in).mkdirs()
    Seq(keys(3, 5), keys(5, 70, 71), keys(99)).zipWithIndex.foreach {
      case (d, i) =>
        val tmp = Files.createTempDirectory(s"graft-slt-w$i").toString + "/w"
        d.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(in, s"tomb-$i.parquet"))
    }
    val ck = Files.createTempDirectory("graft-slt-ck").toString
    val q = StreamingLakeTakedown.start(spark, in, lakeS, "t", ck,
      keys(0).schema, maxFilesPerTrigger = 1)
    q.awaitTermination()
    // batch twin: same removals in one publish each
    Versioned.removePublish(spark, lakeB, "t", keys(3, 5))
    Versioned.removePublish(spark, lakeB, "t", keys(5, 70, 71))
    Versioned.removePublish(spark, lakeB, "t", keys(99))
    val got = collectSet(Versioned.read(spark, lakeS, "t"))
    assert(got == collectSet(Versioned.read(spark, lakeB, "t")))
    assert(got == collectSet(facts(0, 100)
      .filter(!col("k").isin(3, 5, 70, 71, 99))))
    // a second identical stream run (same checkpoint) is a no-op
    val cur = Versioned.currentVersion(spark, lakeS).get
    val q2 = StreamingLakeTakedown.start(spark, in, lakeS, "t", ck,
      keys(0).schema, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(Versioned.currentVersion(spark, lakeS).contains(cur),
      "re-run of a completed takedown stream must not publish")
  }

  test("crash-replayed tombstone batch is recognized, even behind a non-carrying interloper") {
    val lake = Files.createTempDirectory("graft-slt-rp").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 10))))
    val v1 = StreamingLakeTakedown.takedownBatch(spark, keys(1, 2), 0L, lake, "t")
    assert(Versioned.currentVersion(spark, lake).contains(v1))
    // direct replay: no new version, same rows
    StreamingLakeTakedown.takedownBatch(spark, keys(1, 2), 0L, lake, "t")
    assert(Versioned.currentVersion(spark, lake).contains(v1))
    assert(Versioned.read(spark, lake, "t").count() == 8)
    // interloper WITHOUT the marker table, then the lost replay
    Versioned.publish(spark, lake, Seq(
      TableSpec("t2", facts(500, 505))), carry = Seq("t"))
    val vAfter = Versioned.currentVersion(spark, lake)
    StreamingLakeTakedown.takedownBatch(spark, keys(1, 2), 0L, lake, "t")
    assert(Versioned.currentVersion(spark, lake) == vAfter,
      "replay behind a non-carrying interloper must not re-publish")
    // a NEW batch re-establishes the marker chain with every prior id
    StreamingLakeTakedown.takedownBatch(spark, keys(7), 1L, lake, "t")
    val ids = Versioned.read(spark, lake, "batch_marker")
      .select("graft_batch_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L), s"marker chain lost ids: $ids")
    assert(collectSet(Versioned.read(spark, lake, "t"))
      == collectSet(facts(0, 10).filter(!col("k").isin(1, 2, 7))))
  }

  test("auto-compaction bounds the tombstone chain; removed keys stay gone from storage") {
    val lake = Files.createTempDirectory("graft-slt-ac").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 60))))
    Versioned.setAutoCompact(spark, lake, 5)
    (0 until 12).foreach { i =>
      StreamingLakeTakedown.takedownBatch(spark, keys(i * 3), i.toLong,
        lake, "t")
      val cur = Versioned.currentVersion(spark, lake).get
      assert(Versioned.entryChainAt(spark, lake, "t", cur).size <= 5,
        s"streamed tombstone chain unbounded after batch $i")
    }
    val removed = (0 until 12).map(_ * 3)
    assert(collectSet(Versioned.read(spark, lake, "t")) == collectSet(
      facts(0, 60).filter(!col("k").isin(removed: _*))))
    assert(Versioned.read(spark, lake, "t")
      .filter(col("k").isin(removed.map(_.toLong): _*)).count() == 0,
      "read resurrected removed keys")
    // after one full fold, the removed keys are PHYSICALLY gone — the
    // point of the takedown path: forgotten means gone from storage,
    // not filtered at read
    Versioned.compactMorTailPublish(spark, lake, "t")
    val cur = Versioned.currentVersion(spark, lake).get
    val onDisk = spark.read
      .parquet(Versioned.tableFiles(spark, lake, "t", cur): _*)
      .select("k").collect().map(_.getLong(0)).toSet
    val residue = removed.map(_.toLong).toSet.intersect(onDisk)
    assert(residue.isEmpty, s"physical residue after the fold: $residue")
    // marker table survived every policy compaction
    assert(Versioned.read(spark, lake, "batch_marker").count() == 12)
  }

  test("append stream and takedown stream compose on one lake without marker collisions") {
    // BOTH streams use batch ids starting at 0 — the r16 medium
    // finding: a bare-batch-id marker would make stream B's batch 0
    // look replayed once stream A ingested ITS batch 0
    val lake = Files.createTempDirectory("graft-slt-mix").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 20))))
    val vA = StreamingLakeAppend.ingestBatch(spark, facts(20, 30), 0L,
      lake, "t", Seq("k"))
    assert(Versioned.currentVersion(spark, lake).contains(vA))
    // takedown batch 0 MUST apply (same id, different stream)
    val vT = StreamingLakeTakedown.takedownBatch(spark, keys(0, 25), 0L,
      lake, "t")
    assert(vT > vA, "takedown batch 0 dropped as the append's replay")
    assert(collectSet(Versioned.read(spark, lake, "t"))
      == collectSet(facts(0, 30).filter(!col("k").isin(0, 25))))
    // and each stream's own replay is still recognized
    assert(StreamingLakeAppend.ingestBatch(spark, facts(20, 30), 0L,
      lake, "t", Seq("k")) == vT)
    assert(StreamingLakeTakedown.takedownBatch(spark, keys(0, 25), 0L,
      lake, "t") == vT)
    // the shared marker carries both streams' histories
    val pairs = Versioned.read(spark, lake, "batch_marker")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pairs == Set(("append:t", 0L), ("takedown:t", 0L)))
  }
}
