package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Load-time validation operators (SURVEY J3, S7, §1.3): Spark does
  * not enforce FK or VARCHAR constraints, so the engine validates them
  * relationally — anti-joins for referential integrity, predicates for
  * schema caps — exactly what the reference delegates to MySQL DDL.
  *
  * All counts, so every check is oracle-exact; a violation count of 0
  * is the passing state a load job asserts before commit.
  */
object DataQuality {

  // --------------------------------------------------------------- q30
  /** Referential integrity via left-anti joins: orphaned orders
    * (no customer), orphaned lineitems (no order), orphaned customers
    * (no nation). One row of violation counts. */
  def q30FkCheck(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val lineitem = Tables(spark, dir, "lineitem")
    val nation = Tables(spark, dir, "nation")
    // one lazy plan, no driver-side actions: each anti-join reduces to
    // a scalar count, cross-joined into a single validation row
    val orphanOrders = orders.join(customer,
      col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    val orphanLines = lineitem.join(orders,
      col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    val orphanCust = customer.join(broadcast(nation),
      col("c_nationkey") === col("n_nationkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_customers"))
    orphanOrders.crossJoin(orphanLines).crossJoin(orphanCust)
  }

  // --------------------------------------------------------------- q31
  /** Schema-cap validation (the DDL's VARCHAR/DECIMAL bounds as
    * predicates): per-table counts of rows violating length or
    * magnitude limits, one pass each. */
  def q31SchemaCaps(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val part = Tables(spark, dir, "part")
    customer.agg(
      count(when(length(col("c_name")) > 25, 1)).as("c_name_over_25"),
      count(when(abs(col("c_acctbal")) > lit(99999.99), 1)).as("c_acctbal_over_cap"),
      count(when(col("c_mktsegment").isNull || col("c_mktsegment") === "", 1))
        .as("c_mktsegment_empty"))
      .crossJoin(part.agg(
        count(when(length(col("p_name")) > 55, 1)).as("p_name_over_55"),
        count(when(col("p_size") < 1 || col("p_size") > 50, 1)).as("p_size_out_of_range")))
  }

  // --------------------------------------------------------------- q40
  /** One-pass table profile (the notebook's A7 generalized): per-column
    * null counts, numeric min/max, exact distinct cardinalities —
    * single aggregate over one scan, the profiling a pipeline runs
    * before committing a load. (At 100 TB the distinct counts switch
    * to approx_count_distinct — q37 covers the sketch variant.) */
  def q40Profile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").agg(
      count(lit(1)).as("n_rows"),
      count(when(col("c_name").isNull, 1)).as("nulls_c_name"),
      count(when(col("c_acctbal").isNull, 1)).as("nulls_c_acctbal"),
      min(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("min_acctbal"),
      max(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("max_acctbal"),
      countDistinct(col("c_nationkey")).as("distinct_nations"),
      countDistinct(col("c_mktsegment")).as("distinct_segments"))

  // --------------------------------------------------------------- q100
  /** Join-key skew profile — the diagnostic a pipeline runs BEFORE
    * shuffling 100 TB on a key: per-key cardinalities collapsed to a
    * profile table, the top-10 heavy hitters with their row share, and
    * the skew factor max/mean (1.0 = perfectly uniform; ≫1 = salt this
    * key or let AQE split it — the decision input for
    * [[graft.operators.SkewJoin]]).
    *
    * Scale shape: ONE hash-agg shuffle of the fact table compresses it
    * to |distinct keys| rows; that profile is localCheckpoint'd because
    * it has two consumers (top-k and the global summary) — without the
    * checkpoint each consumer would rescan the fact table. Top-k over
    * the profile is TakeOrderedAndProject (no global sort), the window
    * ranks 10 rows, and the global summary is a 1-row re-agg. Nothing
    * downstream of the first shuffle touches fact-table cardinality.
    *
    * Share and skew are single IEEE divisions of exact integer
    * aggregates — the identical expression tree the oracle builds, so
    * the row hash-matches cross-engine. */
  def q100KeySkew(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val global = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("n_max"))
    // unpartitioned window, BOUNDED: input is the 10-row `.limit`
    // above — adjudicated-benign single-partition warning (r19 #3)
    val top = counts.orderBy(col("n").desc, col("user_id")).limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("user_id"))))
    top.crossJoin(global)
      .select(col("rank"), col("user_id"), col("n"),
        (col("n").cast("double") / col("n_rows").cast("double")).as("share"),
        col("n_keys"), col("n_rows"),
        (col("n_max").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_factor"))
      .orderBy(col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_fk_check"   -> (q30FkCheck _),
    "q31_schema_caps" -> (q31SchemaCaps _),
    "q40_profile"    -> (q40Profile _),
    "q100_key_skew"  -> (q100KeySkew _))

  val oracle: Map[String, String] = Map(
    "q30_fk_check" ->
      """SELECT
        | (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphan_orders,
        | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
        | (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS orphan_customers""".stripMargin,
    "q40_profile" ->
      """SELECT COUNT(*) AS n_rows,
        | COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS nulls_c_name,
        | COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END) AS nulls_c_acctbal,
        | CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_acctbal,
        | CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_acctbal,
        | COUNT(DISTINCT c_nationkey) AS distinct_nations,
        | COUNT(DISTINCT c_mktsegment) AS distinct_segments
        |FROM customer""".stripMargin,
    "q31_schema_caps" ->
      """SELECT
        | (SELECT COUNT(CASE WHEN length(c_name) > 25 THEN 1 END) FROM customer) AS c_name_over_25,
        | (SELECT COUNT(CASE WHEN abs(c_acctbal) > 99999.99 THEN 1 END) FROM customer) AS c_acctbal_over_cap,
        | (SELECT COUNT(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 END) FROM customer) AS c_mktsegment_empty,
        | (SELECT COUNT(CASE WHEN length(p_name) > 55 THEN 1 END) FROM part) AS p_name_over_55,
        | (SELECT COUNT(CASE WHEN p_size < 1 OR p_size > 50 THEN 1 END) FROM part) AS p_size_out_of_range""".stripMargin,
    // q100: share and skew_factor are the identical IEEE expression
    // trees Spark builds (one double cast per exact-integer aggregate,
    // same operator order), so the doubles hash-match bit-for-bit
    "q100_key_skew" ->
      """WITH c AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY user_id),
        |g AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(max(n) AS BIGINT) AS n_max
        | FROM c),
        |t AS (
        | SELECT user_id, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, user_id) AS INT) AS rank
        | FROM c QUALIFY rank <= 10)
        |SELECT t.rank, t.user_id, t.n,
        | CAST(t.n AS DOUBLE) / CAST(g.n_rows AS DOUBLE) AS share,
        | g.n_keys, g.n_rows,
        | CAST(g.n_max AS DOUBLE) * CAST(g.n_keys AS DOUBLE)
        |   / CAST(g.n_rows AS DOUBLE) AS skew_factor
        |FROM t CROSS JOIN g ORDER BY t.rank""".stripMargin)
}
