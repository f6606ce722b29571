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

  /** The reference ETL run end-to-end as a gate query: full
    * clean/quarantine pipeline on the reference's own CSV, reduced to
    * its audit row (counts + reason breakdown). Rows-only check — the
    * oracle mechanism only covers the sf tables — but the same
    * pipeline is golden-tested against the reference's committed
    * outputs in GoldenEtlSpec (exact row-set equality). */
  def q39EtlParity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val r = graft.etl.ChargesEtl.run(spark,
      graft.etl.ChargesEtl.findReferenceCsv())
    // sort_array, not orderBy: collect_list gives no order guarantee
    // across shuffles
    val reasons = r.critical.groupBy("_critical_reason").count()
      .agg(concat_ws(",", sort_array(
        collect_list(concat(col("_critical_reason"), lit(":"), col("count")))))
        .as("reason_breakdown"))
    val summary = r.original.agg(count(lit(1)).as("n_original"))
      .crossJoin(r.clean.agg(count(lit(1)).as("n_clean")))
      .crossJoin(r.critical.agg(count(lit(1)).as("n_critical")))
      .crossJoin(r.companies.agg(count(lit(1)).as("n_company_pairs")))
      .crossJoin(reasons)
    // materialize the single audit row, then release the run's cache —
    // repeated invocations (bench iterations) must not accumulate
    // cached partitions. The bounded collect is 1 row by construction.
    val row = summary.collect().toSeq
    r.release()
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(row).asJava), summary.schema)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q39_etl_parity" -> (q39EtlParity _)) ++
    graft.queries.Relational.queries ++
      graft.queries.EventsOps.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.MediaContainers.queries ++
      graft.queries.DataQuality.queries ++
      graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted (⇒ driver rows-only check +
    * dedicated ScalaTest), each for a stated reason:
    *  - q23_ivf_ann: approximate-by-design (probe-limited recall); its
    *    correctness statement is recall-vs-exact-q21, asserted in
    *    SimilaritySpec — an exact SQL mirror would defeat the point.
    *  - q37_sketches: HLL/approx-percentile sketch internals are
    *    engine-specific; error bounds are asserted in AnalyticsSpec,
    *    and the deterministic subset (exact counts + discrete
    *    quantiles) is oracle-hash-checked as q37a_sketch_exact.
    *  (q38_embed_neardup graduated to a full oracle in round 10 —
    *  q22's bucket replay composed with q21's decimal cosine.)
    *  - q39_etl_parity: input is the reference's CSV, not the sf
    *    tables the oracle harness mounts; the same pipeline is
    *    golden-tested against the reference's committed outputs in
    *    GoldenEtlSpec (exact row-set equality). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.EventsOps.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.MediaContainers.oracle ++
      graft.queries.DataQuality.oracle ++
      graft.queries.Analytics.oracle
}
