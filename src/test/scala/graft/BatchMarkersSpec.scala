package graft.streaming

import graft.SparkSpec

/** [[BatchMarkers]] — the shared replay-marker discipline (r17):
  * (stream, batch) keying and the per-stream retention bound that
  * keeps an indefinitely running stream's marker table from growing
  * a row per batch while being rewritten whole per batch. */
class BatchMarkersSpec extends SparkSpec {
  import spark.implicits._

  test("appended trims each stream to its most recent ids, streams independently") {
    val a = (0L until 1500L).map(("append:t", _))
    val b = (0L until 9L).map(("takedown:t", _))
    val standing = (a ++ b).toDF("graft_stream_id", "graft_batch_id")
    val next = BatchMarkers.appended(spark, Some(standing), "append:t", 1500L)
    val byStream = next.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byStream("takedown:t") == (0L until 9L).toSet,
      "a small stream's history must be untouched")
    val kept = byStream("append:t")
    assert(kept.size == BatchMarkers.RetainPerStream)
    // the NEWEST ids survive — exactly the window a crash replay can hit
    assert(kept == ((1501L - BatchMarkers.RetainPerStream) until 1501L).toSet)
  }

  test("isReplayed keys on both columns and sees through the trim") {
    val standing = ((0L until 2000L).map(("append:t", _)) ++
      Seq(("takedown:t", 3L))).toDF("graft_stream_id", "graft_batch_id")
    val m = Some(BatchMarkers.appended(spark, Some(standing), "append:t", 2000L))
    assert(BatchMarkers.isReplayed(m, "append:t", 2000L), "just-added id")
    assert(BatchMarkers.isReplayed(m, "append:t", 1999L), "recent id")
    assert(BatchMarkers.isReplayed(m, "takedown:t", 3L),
      "the sibling stream's id survives the other stream's trim")
    assert(!BatchMarkers.isReplayed(m, "takedown:t", 1999L),
      "stream B must not see stream A's batch as its own replay")
    assert(!BatchMarkers.isReplayed(m, "append:t", 1L),
      "an id older than the retention window is trimmed (checkpoint " +
        "monotonicity makes its replay impossible)")
  }

  test("alsoLegacy matches pre-upgrade markers (stream id \"\"); modern streams don't") {
    // a pre-upgrade single-column marker table normalizes to "" — the
    // one stream that predates the keyed scheme must still suppress a
    // replay of a batch whose checkpoint commit was lost mid-upgrade
    val standing = (Seq(("", 7L)) ++ Seq(("append:t", 3L)))
      .toDF("graft_stream_id", "graft_batch_id")
    val m = Some(standing)
    assert(BatchMarkers.isReplayed(m, "clusters:documents", 7L,
      alsoLegacy = true), "legacy marker must suppress the upgrade replay")
    assert(!BatchMarkers.isReplayed(m, "clusters:documents", 7L),
      "modern probes must NOT match legacy markers")
    assert(!BatchMarkers.isReplayed(m, "clusters:documents", 8L,
      alsoLegacy = true), "legacy matching still keys on batch id")
    assert(BatchMarkers.isReplayed(m, "append:t", 3L, alsoLegacy = true),
      "alsoLegacy widens, never narrows, the modern match")
  }
}
