package graft

import org.apache.spark.sql.functions._
import graft.queries.DataQuality

/** Validation-operator specs (q30/q31/q40 are oracle-gated; q100's
  * invariants are asserted here plus the oracle hash check). */
class DataQualitySpec extends SparkSpec {

  test("q100: top-1 is the true max key; ranks dense; shares consistent") {
    val out = DataQuality.q100KeySkew(spark, sfDir).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val ranks = out.map(_.getAs[Int]("rank")).toSeq
    assert(ranks == (1 to out.length))
    // counts non-increasing in rank order; ties broken by ascending key
    val ns = out.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted(Ordering[Long].reverse))
    out.sliding(2).foreach { w =>
      if (w.length == 2 && w(0).getAs[Long]("n") == w(1).getAs[Long]("n"))
        assert(w(0).getAs[Long]("user_id") < w(1).getAs[Long]("user_id"))
    }
    // the true max from an independent aggregation
    val trueMax = Tables(spark, sfDir, "events")
      .groupBy("user_id").count().agg(max("count")).head.getLong(0)
    assert(out.head.getAs[Long]("n") == trueMax)
    // share = n / n_rows with the table's real row count
    val nRows = Tables(spark, sfDir, "events").count()
    assert(out.head.getAs[Long]("n_rows") == nRows)
    assert(out.head.getAs[Double]("share") ==
      trueMax.toDouble / nRows.toDouble)
    // skew factor: max/mean ≥ 1, and > 1 unless perfectly uniform
    val sk = out.head.getAs[Double]("skew_factor")
    assert(sk >= 1.0)
  }

  test("q100: planted hot key dominates the profile") {
    import spark.implicits._
    val skewed = (1L to 1000L).map(i => (if (i <= 900) 7L else i, "e"))
      .toDF("user_id", "event_type")
    skewed.createOrReplaceTempView("_skew_probe")
    val counts = skewed.groupBy("user_id").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("user_id")).limit(1).head
    assert(top.getAs[Long]("user_id") == 7L && top.getAs[Long]("n") == 900L)
  }
}
