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

  test("watermark metadata is attached for state cleanup") {
    // batch planning elides watermarks entirely — assert on the
    // STREAMING plan, where the watermark bounds state
    val stream = Tables.eventsStream(spark, s"$sfDir/events.parquet")
    val df = StreamingDaily.hourlyTotals(stream)
    assert(df.queryExecution.logical.toString.contains("EventTimeWatermark"))
  }
}
