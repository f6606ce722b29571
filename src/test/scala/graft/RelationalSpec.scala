package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("every registered query returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // documented rows-only ops (engine-specific hashes / mapPartitions
    // kernels — see SparkEntry.oracleSql scaladoc); each has its own spec
    val allowed = Set("q19_simhash", "q22_lsh_buckets", "q23_ivf_ann",
      "q25_multimodal_features", "q37_sketches", "q38_embed_neardup",
      "q39_etl_parity")
    assert((missing -- allowed).isEmpty, s"queries without oracle: $missing")
  }

  test("q1 groups by (returnflag, linestatus) with positive sums") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.length >= 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q4 topk is sorted descending and bounded at 10") {
    val rev = Relational.q4TopK(spark, sfDir).collect().map(_.getAs[Double]("revenue"))
    assert(rev.length == 10)
    assert(rev.sameElements(rev.sorted.reverse))
  }

  test("q5 rank never exceeds 3 and starts at 1 per customer") {
    val df = Relational.q5WindowRank(spark, sfDir)
    assert(df.agg(max($"rn")).head.getInt(0) <= 3)
    val firsts = df.groupBy($"o_custkey").agg(min($"rn").as("m"))
      .filter($"m" =!= 1).count()
    assert(firsts == 0)
  }

  test("q8 partitions customers exactly") {
    val total = Tables(spark, sfDir, "customer").count()
    val agg = Relational.q8SemiAnti(spark, sfDir)
      .agg(sum($"with_orders" + $"without_orders")).head.getLong(0)
    assert(agg == total)
  }

  test("q12 gauss recovers the extracted number") {
    assert(Relational.q12GaussMissing(spark, sfDir).head.getLong(0) == 57L)
  }
}
