package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module; each entry has a DuckDB
  * oracle in `oracleSql` unless the operator is not SQL-expressible
  * (those get the driver's weaker rows-only check and a ScalaTest spec).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's daily_company_totals view (SURVEY A3+J1). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q10DailyTotals(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.EventsOps.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.DataQuality.queries ++
      graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted (⇒ driver rows-only check +
    * dedicated ScalaTest): q19_simhash, q22_lsh_buckets, q23_ivf_ann
    * (engine-specific hashes / non-SQL kernels), q25 (mapPartitions
    * stub decode). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.EventsOps.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.DataQuality.oracle ++
      graft.queries.Analytics.oracle
}
