package graft

import org.apache.spark.sql.functions._
import graft.operators.CoarseQuantizer

/** Distributed k-means|| trainer: partition-layout determinism (the
  * property the BigDecimal cost sum and id-keyed coins exist for),
  * quality parity with the bounded-sample trainer, and basic shape. */
class KMeansParallelSpec extends SparkSpec {

  private def unitize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def avgMaxCos(cents: Array[Array[Double]],
      pts: Array[Array[Double]]): Double =
    pts.map { v =>
      val u = unitize(v)
      cents.map(c => c.zip(u).map { case (a, b) => a * b }.sum).max
    }.sum / pts.length

  test("k-means|| is bit-deterministic across partition layouts") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = CoarseQuantizer.trainParallel(spark,
      emb.repartition(3), "vec_id", "embedding", k = 8)
    val b = CoarseQuantizer.trainParallel(spark,
      emb.repartition(17), "vec_id", "embedding", k = 8)
    assert(a.length == 8 && b.length == 8)
    a.zip(b).foreach { case (x, y) =>
      assert(x.sameElements(y),
        "different partitionings must give identical centroids") }
    // unit centroids
    a.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("k-means|| quality matches the bounded-sample trainer") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pts = emb.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val k = 8
    val sampleCents = CoarseQuantizer.train(pts, k, iters = 10)
    val parCents = CoarseQuantizer.trainParallel(spark, emb,
      "vec_id", "embedding", k)
    val qSample = avgMaxCos(sampleCents, pts)
    val qPar = avgMaxCos(parCents, pts)
    // same objective, different seeding — must land in the same band
    assert(qPar >= qSample - 0.05,
      s"k-means|| quality $qPar too far below sample trainer $qSample")
  }
}
