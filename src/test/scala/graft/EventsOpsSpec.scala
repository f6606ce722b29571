package graft

import java.nio.file.Files
import graft.queries.EventsOps

/** Planted-sequence semantics for the funnel: order matters, not mere
  * presence — the property the oracle's random data exercises only in
  * aggregate. */
class EventsOpsSpec extends SparkSpec {

  test("q58 funnel counts only in-order step matches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-funnel").toString
    def ns(s: Long) = s * 1000000000L // parquet ts column is epoch-ns
    Seq(
      // user 1: the full ordered funnel
      (1L, "view", ns(10)), (1L, "click", ns(20)), (1L, "purchase", ns(30)),
      // user 2: click BEFORE the first view → stops at step 1
      (2L, "click", ns(10)), (2L, "view", ns(20)),
      // user 3: purchase BEFORE the matched click → stops at step 2
      (3L, "view", ns(10)), (3L, "purchase", ns(15)), (3L, "click", ns(20)),
      // user 4: never viewed → no step at all
      (4L, "click", ns(10)), (4L, "purchase", ns(20)))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val row = EventsOps.q58Funnel(spark, dir).head()
    assert(row.getLong(0) == 3, s"viewers: $row")
    assert(row.getLong(1) == 2, s"view→click (users 1,3): $row")
    assert(row.getLong(2) == 1, s"full funnel (user 1 only): $row")
  }
}
