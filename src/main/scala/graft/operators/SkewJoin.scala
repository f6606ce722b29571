package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling joins (the task's 100 TB posture, SURVEY §4.2).
  *
  * First line of defense is AQE's skew-join split (enabled in
  * GraftSession). Salting is the manual fallback for the cases AQE
  * can't fix — e.g. a single hot key that must stream through one
  * reducer, or skew under a non-AQE-splittable operator:
  *
  * The big side gets a random salt in [0, factor); the SMALL side is
  * replicated `factor` times with every salt value; the join key
  * becomes (key, salt), spreading each hot key over `factor` reducers.
  * Results are exactly equal to the unsalted join (proven in
  * SkewJoinSpec), at the cost of `factor`× the small side — which is
  * why the small side must be the replicated one.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `factor` ways. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = big.withColumn("_salt",
      (rand(seed = 42) * factor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Variant that only salts the listed hot keys (cheaper: the small
    * side is replicated just for those); everything else joins plain. */
  def hotKeySaltedJoin(big: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Any], factor: Int = 8): DataFrame = {
    val isHot: Column = col(key).isin(hotKeys: _*)
    val plain = big.filter(!isHot).join(small.filter(!isHot), Seq(key))
    val salted = saltedInnerJoin(
      big.filter(isHot), small.filter(isHot), key, factor)
    // align column order before union (join key ordering is identical)
    plain.unionByName(salted)
  }
}
