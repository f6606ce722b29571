package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // skewed fact: one hot key carrying 90% of rows
  private lazy val big = {
    val hot = (1 to 9000).map(i => (1L, i))
    val rest = (1 to 1000).map(i => ((i % 50 + 2).toLong, i))
    (hot ++ rest).toDF("k", "payload")
  }
  private lazy val small = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "attr")

  test("salted join equals plain join exactly") {
    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("hot-key-only salting equals plain join exactly") {
    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.hotKeySaltedJoin(big, small, "k",
      hotKeys = Seq(1L), factor = 4)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt actually spreads the hot key across partitions") {
    val salted = big.filter($"k" === 1L)
      .withColumn("_salt", (rand(seed = 42) * 8).cast("int"))
    val saltCard = salted.select("_salt").distinct().count()
    assert(saltCard >= 6, s"salt should spread over ~8 values, got $saltCard")
  }
}
