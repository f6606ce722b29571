package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rollup emits nation, region-subtotal, and grand-total levels") {
    val rows = Analytics.q35Rollup(spark, sfDir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val regionSub = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(regionSub.length == 5) // 5 regions
    val total = grand.head.getAs[Double]("revenue")
    val sumOfRegions = regionSub.map(_.getAs[Double]("revenue")).sum
    assert(math.abs(total - sumOfRegions) < 1e-6)
  }

  test("pivot columns partition the per-user event counts") {
    val df = Analytics.q36Pivot(spark, sfDir)
    val row = df.filter($"user_id" === 0L).head()
    val pivotSum = Seq("click", "error", "purchase", "signup", "view")
      .map(c => row.getAs[Long](c)).sum
    val direct = Tables(spark, sfDir, "events")
      .filter($"user_id" === 0L).count()
    assert(pivotSum == direct)
  }

  test("sketches: HLL within 5% of exact; median within price range") {
    Analytics.q37Sketches(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL error too large: $approx vs $exact")
      assert(r.getAs[Double]("approx_median_price") > 0)
    }
  }

  test("sketch median tracks the exact discrete median per group") {
    // q37a is the oracle-checked exact companion — the approx sketch
    // must land within 5% of the true order statistic, not just "be
    // positive" (rank error at accuracy=1000 is ≤ n/1000 rows)
    val exact = Analytics.q37aSketchExact(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("median_price")).toMap
    Analytics.q37Sketches(spark, sfDir).collect().foreach { r =>
      val m = exact(r.getString(0))
      val a = r.getAs[Double]("approx_median_price")
      assert(math.abs(a - m) / m < 0.05,
        s"approx median $a too far from exact $m for ${r.getString(0)}")
    }
  }

  test("range join assigns every January event to exactly one bucket") {
    val total = Analytics.q34RangeJoin(spark, sfDir)
      .agg(sum($"n_events")).head.getLong(0)
    val jan = Tables(spark, sfDir, "events")
      .filter($"ts" >= lit("2024-01-01").cast("timestamp") &&
        $"ts" < lit("2024-02-01").cast("timestamp")).count()
    assert(total == jan)
  }
}
