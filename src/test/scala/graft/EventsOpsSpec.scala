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

  test("q62 flags the planted extreme value and only it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-outlier").toString
    val rows = (1L to 20L).map(i => (i, "click", 10.0)) :+ (99L, "click", 100.0)
    // ts present because the Tables loader normalizes it (epoch-ns long)
    rows.map { case (id, t, v) => (id, t, v, id * 1000000000L) }
      .toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")

    val out = EventsOps.q62Outliers(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(99L),
      s"only the planted extreme should flag: ${out.toSeq}")
    val r = out.head
    assert(r.getDouble(5) > 2.0, s"zscore must exceed the gate: $r")
    // driver-side replay of the exact moment arithmetic
    val vs = rows.map(_._3)
    val n = vs.length.toDouble
    val mean = vs.sum / n
    val sd = math.sqrt((n * vs.map(v => v * v).sum - vs.sum * vs.sum)
      / (n * (n - 1.0)))
    assert(math.abs(r.getDouble(3) - mean) < 1e-12)
    assert(math.abs(r.getDouble(4) - sd) < 1e-12)
  }

  test("q59 cohort triangle assigns users to first-activity week") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cohort").toString
    val origin = 1704067200000000L // 2024-01-01 in µs
    val week = 7L * 24 * 3600 * 1000000L
    def ts(w: Long, offsetS: Long) = (origin + w * week + offsetS * 1000000L) * 1000L
    Seq(
      // user 1: cohort week 0, returns weeks 1 and 2 (twice — distinct!)
      (1L, "view", ts(0, 10)), (1L, "view", ts(1, 10)),
      (1L, "view", ts(2, 10)), (1L, "click", ts(2, 20)),
      // user 2: cohort week 0, never returns
      (2L, "view", ts(0, 30)),
      // user 3: cohort week 1 only
      (3L, "view", ts(1, 40)))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val got = EventsOps.q59Cohort(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // users 1,2 in cohort 0
      (0L, 1L) -> 1L, // user 1 back in week 1
      (0L, 2L) -> 1L, // user 1 back in week 2 (two events, one user)
      (1L, 0L) -> 1L  // user 3's own cohort
    ), s"unexpected triangle: $got")
  }

  test("q92: spike fires only on >2× the trailing mean with full history; gaps use row frames") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-spike").toString
    def ns(hour: Long, i: Long) = (hour * 3600000000L + i * 1000L) * 1000L
    val rows =
      // type a: flat 1/h for hours 0-2, burst of 3 in hour 3, calm hour 4
      (Seq(0L, 1L, 2L).map(h => ("a", ns(h, 0))) ++
        (0 until 3).map(i => ("a", ns(3, i.toLong))) ++
        Seq(("a", ns(4, 0))) ++
        // type b: hours 0,1,2 then a GAP to hour 10 — the row-based
        // frame still sees three prior observed hours
        Seq(0L, 1L, 2L, 10L).map(h => ("b", ns(h, 0))))
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.EventsOps.q92RateSpike(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // early rows never spike (incomplete history)
    assert(got(("a", 0L)) == ((1L, 0L, 0L, 0L)))
    assert(got(("a", 1L)) == ((1L, 1L, 1L, 0L)))
    assert(got(("a", 2L)) == ((1L, 2L, 2L, 0L)))
    // 3 events vs trailing sum 3: 9 > 6 → spike
    assert(got(("a", 3L)) == ((3L, 3L, 3L, 1L)))
    // back to 1 vs trailing 1+1+3=5: 3 > 10 is false
    assert(got(("a", 4L)) == ((1L, 5L, 3L, 0L)))
    // gap: hour 10 sees rows 0,1,2 as its 3 predecessors
    assert(got(("b", 10L)) == ((1L, 3L, 3L, 0L)))
  }

  test("q88: pair counts match a driver-side replay; marginals consistent") {
    val ut = graft.Tables(spark, sfDir, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = ut.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expectedPairs = byUser.values.flatMap(ts =>
      for (a <- ts; b <- ts if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val perType = ut.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nUsers = byUser.size.toLong

    val rows = EventsOps.q88Cooccurrence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val gotPairs = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotPairs == expectedPairs, "co-occurrence counts diverge")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not in canonical order")
      assert(r.getLong(3) == perType(r.getString(0)))
      assert(r.getLong(4) == perType(r.getString(1)))
      assert(r.getLong(5) == nUsers)
      // both-count can never exceed either marginal
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }
}
