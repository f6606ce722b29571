package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{UserEvent, UserSnapshot}

/** flatMapGroupsWithState behavior across micro-batches: state must
  * accumulate between batches and the burst flag must fire only on a
  * dense run of events. */
class StatefulSpec extends SparkSpec {

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Long)] // (event_id, ts_us)
    val deduped = graft.streaming.StreamingDaily.dedupedEvents(
      input.toDS().toDF("event_id", "ts_us")
        .withColumn("ts", timestamp_micros($"ts_us")))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, 1000L), (2L, 2000L), (1L, 1000L)) // in-batch dup
      q.processAllAvailable()
      input.addData((2L, 2000L), (3L, 3000L)) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("expiring update: live users accumulate + set a TTL; timeouts drop state") {
    import org.apache.spark.sql.streaming.TestGroupState
    // live path: same semantics as updateUser, plus a timeout armed
    val live = TestGroupState.create[StatefulOps.UserState](
      optionalState = org.apache.spark.api.java.Optional.empty(), timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val out = StatefulOps.expiringUpdate(3600L * 1000)(1L,
      Iterator(StatefulOps.UserEvent(1, 0L), StatefulOps.UserEvent(1, 5L)), live)
    assert(out.toSeq.exists(_.count == 2))
    assert(live.exists && live.get.count == 2)
    // TTL armed relative to the batch clock: 1000 + ttl
    assert(live.getTimeoutTimestampMs.get() == 1000L + 3600L * 1000)
    // timed-out path: state dropped, nothing emitted
    val dead = TestGroupState.create[StatefulOps.UserState](
      optionalState = org.apache.spark.api.java.Optional.of(
        StatefulOps.UserState(9, 9, 0, 0)),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    val none = StatefulOps.expiringUpdate(3600L * 1000)(1L, Iterator.empty, dead)
    assert(none.isEmpty && dead.isRemoved,
      "timed-out user must drop state and emit nothing")
  }

  test("state accumulates across micro-batches; burst detection fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val query = StatefulOps.monitor(spark, input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("snapshots").start()
    try {
      // batch 1: user 1 quiet (2 events, spread), user 2 idle
      input.addData(UserEvent(1, 0L), UserEvent(1, 120L * 1000000))
      query.processAllAvailable()
      val s1 = spark.table("snapshots").as[UserSnapshot].collect()
      assert(s1.exists(s => s.user_id == 1 && s.count == 2 && !s.burst))

      // batch 2: user 1 bursts — 5 events within one minute
      input.addData((1 to 5).map(i =>
        UserEvent(1, 200L * 1000000 + i * 1000000)): _*)
      query.processAllAvailable()
      val s2 = spark.table("snapshots").as[UserSnapshot].collect()
      // count proves state carried over (2 from batch 1 + 5 new)
      assert(s2.exists(s => s.user_id == 1 && s.count == 7 && s.burst),
        s"got: ${s2.mkString(", ")}")
    } finally query.stop()
  }
}
