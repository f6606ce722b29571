package graft

import graft.streaming.StreamingDaily

class StreamingSpec extends SparkSpec {

  test("streaming hourly totals == batch twin over the same directory") {
    val q = StreamingDaily.startFileStream(spark, s"$sfDir/events.parquet",
      "stream_hourly")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_hourly")
      val batch = StreamingDaily.hourlyTotalsBatch(
        Tables(spark, sfDir, "events"))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0, "stream-only rows")
      assert(batch.exceptAll(streamed).count() == 0, "batch-only rows")
    } finally q.stop()
  }

  test("streaming sessionize: finalized sessions ≡ batch q32, none withheld") {
    import graft.streaming.StreamingSessions
    import org.apache.spark.sql.functions._
    val q = StreamingSessions.startFileStream(spark,
      s"$sfDir/events.parquet", "stream_sessions")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = graft.queries.EventsOps.q32Sessionize(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // append mode emits only watermark-finalized sessions — every
      // emitted row must match batch EXACTLY (same merge, same bounds)
      assert(streamed.nonEmpty, "no sessions finalized")
      assert((streamed -- batch).isEmpty,
        s"streamed sessions absent from batch: ${(streamed -- batch).take(3)}")
      // completeness: anything closing safely before the final
      // watermark (max ts − watermark − gap margin) must have emitted
      val maxTs = Tables(spark, sfDir, "events")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val safeClose = maxTs - (60L + 30L) * 60 * 1000000
      val withheld = batch.filter(_._3 < safeClose) -- streamed
      assert(withheld.isEmpty,
        s"safely-closable sessions withheld: ${withheld.take(3)}")
    } finally q.stop()
  }

  test("watermark metadata is attached for state cleanup") {
    // batch planning elides watermarks entirely — assert on the
    // STREAMING plan, where the watermark bounds state
    val stream = Tables.eventsStream(spark, s"$sfDir/events.parquet")
    val df = StreamingDaily.hourlyTotals(stream)
    assert(df.queryExecution.logical.toString.contains("EventTimeWatermark"))
  }
}
