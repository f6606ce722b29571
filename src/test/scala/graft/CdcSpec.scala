package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Versioned
import graft.sources.Versioned.TableSpec

/** Change data capture over the versioned lake: the feed must be the
  * exact multiset difference the fold semantics imply — upserts as
  * delete+insert pairs, within-window churn netted out, evolved
  * schemas aligned — computed from the manifest window when history
  * is pure MOR and by honest full diff when it was rewritten. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def mkBase() =
    Files.createTempDirectory("graft-cdc").toString + "/lake"

  private def facts(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))

  private def changes(base: String, from: Long, to: Long) =
    Versioned.changesBetween(spark, base, "t", from, to)
      .collect()
      .map(r => (r.getAs[String]("_change"), r.getAs[Long]("k"),
        r.getAs[Any]("v")))
      .toSet

  test("append-only window: inserts only, standing rows silent") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 10))))
    Versioned.appendPublish(spark, base, "t", facts(10, 13), Seq("k"))
    assert(changes(base, 1L, 2L) ==
      Set(("insert", 10L, 100L), ("insert", 11L, 110L), ("insert", 12L, 120L)))
    // same-version window is empty
    assert(changes(base, 2L, 2L).isEmpty)
  }

  test("MOR upsert window: delete+insert pairs, untouched rows absent") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 10))))
    Versioned.mergePublish(spark, base, "t",
      Seq((3L, 999L), (20L, 2000L)).toDF("k", "v"), Seq("k"),
      rewrite = false)
    assert(changes(base, 1L, 2L) == Set(
      ("delete", 3L, 30L),      // the replaced row's OLD value
      ("insert", 3L, 999L),     // its new value
      ("insert", 20L, 2000L)))  // tombstone of an absent key: no delete
  }

  test("removal window: deletes carry the removed rows' values") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 6))))
    Versioned.removePublish(spark, base, "t",
      Seq(2L, 4L, 99L).toDF("k")) // 99 is absent: no phantom delete
    assert(changes(base, 1L, 2L) ==
      Set(("delete", 2L, 20L), ("delete", 4L, 40L)))
  }

  test("one tombstone kills rows of every earlier entry; the feed is consume-promptly") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 5))))
    Versioned.appendPublish(spark, base, "t", facts(100, 101), Seq("k"))
    Versioned.removePublish(spark, base, "t", Seq(100L, 1L).toDF("k"))
    // the v2→v3 window: one tombstone kills both the v1-standing row
    // and the v2-appended one, each exactly once
    assert(changes(base, 2L, 3L) ==
      Set(("delete", 100L, 1000L), ("delete", 1L, 10L)))
    // GC keeps current+previous only: after the NEXT publish the
    // v2-based window is gone — the feed must be consumed promptly
    Versioned.appendPublish(spark, base, "t", facts(200, 201), Seq("k"))
    intercept[RuntimeException](changes(base, 2L, 4L))
    assert(changes(base, 3L, 4L) == Set(("insert", 200L, 2000L)))
  }

  test("evolved schema rides the feed; missing columns read null") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 3))))
    Versioned.appendPublish(spark, base, "t",
      Seq((7L, 70L, "fresh")).toDF("k", "v", "note"), Seq("k"))
    val rows = Versioned.changesBetween(spark, base, "t", 1L, 2L).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("note") == "fresh")
    assert(rows.head.getAs[String]("_change") == "insert")
  }

  test("a rewritten window falls back to full diff; pure layout change is empty") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 50))))
    Versioned.appendPublish(spark, base, "t", facts(50, 60), Seq("k"))
    Versioned.compactPublish(spark, base, "t", Seq("k"), files = 2)
    // v2 -> v3 is a rewrite with identical content: the feed is empty
    assert(changes(base, 2L, 3L).isEmpty)
    // COW merge after the compaction: full-diff path reports the pair
    Versioned.mergePublish(spark, base, "t",
      Seq((5L, 555L)).toDF("k", "v"), Seq("k"), rewrite = true)
    assert(changes(base, 3L, 4L) ==
      Set(("delete", 5L, 50L), ("insert", 5L, 555L)))
  }

  test("raised retention keeps multi-version CDC windows alive") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 5))))
    Versioned.setRetention(spark, base, 4)
    Versioned.appendPublish(spark, base, "t", facts(10, 11), Seq("k"))
    Versioned.removePublish(spark, base, "t", Seq(1L, 10L).toDF("k"))
    Versioned.appendPublish(spark, base, "t", facts(20, 21), Seq("k"))
    assert(Versioned.listVersions(spark, base) == Seq(1L, 2L, 3L, 4L))
    // the 3-publish window from v1: churn nets out (k=10 appended then
    // removed), k=1 died once, k=20 arrived
    assert(changes(base, 1L, 4L) ==
      Set(("delete", 1L, 10L), ("insert", 20L, 200L)))
    // time travel to the oldest retained version still serves k=1
    assert(Versioned.readAt(spark, base, "t", 1L).count() == 5)
    // lowering retention collects the excess on the next publish
    Versioned.setRetention(spark, base, 2)
    Versioned.appendPublish(spark, base, "t", facts(30, 31), Seq("k"))
    assert(Versioned.listVersions(spark, base) == Seq(4L, 5L))
    intercept[RuntimeException](Versioned.readAt(spark, base, "t", 3L))
  }

  test("GC'd versions refuse CDC loudly") {
    val base = mkBase()
    Versioned.publish(spark, base, Seq(TableSpec("t", facts(0, 5))))
    Versioned.appendPublish(spark, base, "t", facts(5, 6), Seq("k"))
    Versioned.appendPublish(spark, base, "t", facts(6, 7), Seq("k"))
    Versioned.appendPublish(spark, base, "t", facts(7, 8), Seq("k"))
    val e = intercept[RuntimeException](changes(base, 1L, 4L))
    assert(e.getMessage.contains("garbage-collected"), e.getMessage)
  }
}
