package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.sources.Versioned
import graft.sources.Versioned.TableSpec
import graft.streaming.StreamingLakeAppend

/** Streamed merge-on-read ingest: every micro-batch is one
  * append-publish (bytes ∝ batch, standing files untouched), a
  * crash-replayed batch never lands twice — even behind interloper
  * versions that did not carry the marker table — and the lake's
  * auto-compaction policy bounds the fold depth the stream accretes,
  * changing no value. */
class StreamingLakeAppendSpec extends SparkSpec {
  import spark.implicits._

  private def facts(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("multi-batch streamed appends accrete the table; bytes ∝ batch") {
    val in = Files.createTempDirectory("graft-sla-in").toString + "/rows"
    val lake = Files.createTempDirectory("graft-sla-lake").toString + "/lake"
    val ck = Files.createTempDirectory("graft-sla-ck").toString
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 100))))
    val standing = Versioned.tableFiles(spark, lake, "t", 1L).toSet
    val fsv = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtimes = standing.map(p => p -> fsv.getFileStatus(
      new org.apache.hadoop.fs.Path(p)).getModificationTime).toMap

    facts(100, 160).repartition(3).write.parquet(in)
    val q = StreamingLakeAppend.start(spark, in, lake, "t", ck,
      facts(0, 1).schema, keys = Seq("k"), maxFilesPerTrigger = 1)
    q.awaitTermination()
    assert(collectSet(Versioned.read(spark, lake, "t"))
      == collectSet(facts(0, 160)))
    // standing files untouched across every streamed publish
    val cur = Versioned.currentVersion(spark, lake).get
    assert(standing.subsetOf(Versioned.tableFiles(spark, lake, "t", cur).toSet))
    standing.foreach(p => assert(fsv.getFileStatus(
      new org.apache.hadoop.fs.Path(p)).getModificationTime == mtimes(p),
      s"standing file rewritten by a streamed append: $p"))
    // a second identical stream run (same checkpoint) is a no-op:
    // AvailableNow re-delivery + marker probe ⇒ no new version
    val q2 = StreamingLakeAppend.start(spark, in, lake, "t", ck,
      facts(0, 1).schema, keys = Seq("k"), maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(Versioned.currentVersion(spark, lake).contains(cur),
      "re-run of a completed stream must not publish")
  }

  test("crash-replayed batch is recognized, even behind a non-carrying interloper") {
    val lake = Files.createTempDirectory("graft-sla-rp").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 10))))
    val v1 = StreamingLakeAppend.ingestBatch(spark,
      facts(10, 20), 0L, lake, "t", Seq("k"))
    assert(Versioned.currentVersion(spark, lake).contains(v1))
    // direct replay: no new version, no duplicate rows
    StreamingLakeAppend.ingestBatch(spark, facts(10, 20), 0L, lake, "t", Seq("k"))
    assert(Versioned.currentVersion(spark, lake).contains(v1))
    assert(Versioned.read(spark, lake, "t").count() == 20)
    // interloper WITHOUT the marker table (publish drops unlisted
    // tables), then the lost replay: the backward marker probe must
    // still recognize batch 0
    Versioned.publish(spark, lake, Seq(
      TableSpec("t2", facts(500, 505))), carry = Seq("t"))
    val vAfter = Versioned.currentVersion(spark, lake)
    assert(!Versioned.tableExists(spark, lake, "batch_marker", vAfter.get))
    StreamingLakeAppend.ingestBatch(spark, facts(10, 20), 0L, lake, "t", Seq("k"))
    assert(Versioned.currentVersion(spark, lake) == vAfter,
      "replay behind a non-carrying interloper must not re-publish")
    // a NEW batch after the interloper re-establishes the marker chain
    // carrying every prior id
    StreamingLakeAppend.ingestBatch(spark, facts(20, 30), 1L, lake, "t", Seq("k"))
    val ids = Versioned.read(spark, lake, "batch_marker")
      .select("graft_batch_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L), s"marker chain lost ids: $ids")
  }

  test("a mid-stream batch introduces a new column; the fold and the policy absorb it") {
    import org.apache.spark.sql.functions.lit
    val lake = Files.createTempDirectory("graft-sla-evo").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 50))))
    Versioned.setAutoCompact(spark, lake, 4)
    // batches 0-1: the original schema; batch 2 onward: the producer
    // upgraded and emits a `src` column (additive evolution arrives
    // THROUGH the stream, not an offline migration)
    StreamingLakeAppend.ingestBatch(spark, facts(50, 60), 0L, lake, "t", Seq("k"))
    StreamingLakeAppend.ingestBatch(spark, facts(60, 70), 1L, lake, "t", Seq("k"))
    val evolved = facts(70, 80).withColumn("src", lit("v2-producer"))
    StreamingLakeAppend.ingestBatch(spark, evolved, 2L, lake, "t", Seq("k"))
    val cur = Versioned.read(spark, lake, "t")
    assert(cur.count() == 80)
    assert(cur.filter(col("src").isNull).count() == 70,
      "pre-evolution rows must serve null in the new column")
    assert(collectSet(cur.filter(col("src") === "v2-producer")
        .select("k", "v"))
      == collectSet(facts(70, 80)), "evolved batch rows lost")
    // a replay of the evolved batch is still a no-op
    val v = Versioned.currentVersion(spark, lake)
    StreamingLakeAppend.ingestBatch(spark, evolved, 2L, lake, "t", Seq("k"))
    assert(Versioned.currentVersion(spark, lake) == v)
    // keep streaming past the policy threshold: the compaction fold
    // crosses the schema boundary without losing the column or a value
    (3 to 6).foreach(i => StreamingLakeAppend.ingestBatch(spark,
      facts(80 + (i - 3) * 10, 90 + (i - 3) * 10).withColumn("src",
        lit("v2-producer")), i.toLong, lake, "t", Seq("k")))
    val after = Versioned.read(spark, lake, "t")
    assert(after.count() == 120)
    assert(after.filter(col("src").isNull).count() == 70)
    assert(after.filter(col("src") === "v2-producer").count() == 50)
    val depth = Versioned.entryChainAt(spark, lake, "t",
      Versioned.currentVersion(spark, lake).get).size
    assert(depth <= 4, s"policy stopped bounding after evolution: $depth")
  }

  test("auto-compaction bounds a long streamed chain without changing a value") {
    val lake = Files.createTempDirectory("graft-sla-ac").toString + "/lake"
    Versioned.publish(spark, lake, Seq(TableSpec("t", facts(0, 50))))
    Versioned.setAutoCompact(spark, lake, 5)
    (0 until 10).foreach { i =>
      StreamingLakeAppend.ingestBatch(spark,
        facts(50 + i * 10, 60 + i * 10), i.toLong, lake, "t", Seq("k"))
      val cur = Versioned.currentVersion(spark, lake).get
      assert(Versioned.entryChainAt(spark, lake, "t", cur).size <= 5,
        s"streamed fold depth unbounded after batch $i")
    }
    assert(collectSet(Versioned.read(spark, lake, "t"))
      == collectSet(facts(0, 150)))
    // the marker table survived every policy compaction (carried by
    // reference through compactMorTailPublish)
    assert(Versioned.read(spark, lake, "batch_marker").count() == 10)
  }
}
