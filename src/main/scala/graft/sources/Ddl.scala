package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog DDL bootstrap (SURVEY S7) — the Spark-native equivalent of
  * the reference's schema script (sql/01_schema.sql:5-19) and view
  * definition (sql/02_view.sql:4-11).
  *
  * `CREATE TABLE IF NOT EXISTS … USING parquet` against the session
  * catalog: re-runnable by construction, like the reference's
  * `IF NOT EXISTS` MySQL DDL. MySQL's PRIMARY KEY / FOREIGN KEY /
  * NOT NULL constraints don't exist in Spark's catalog — their
  * semantics live in the load path instead (PK dedup in
  * [[graft.etl.ChargesEtl]]'s companiesTable, keyed upserts in
  * [[Sinks]], FK verification as the q30 anti-join check).
  *
  * The view is a CATALOG view over the catalog tables (unlike
  * [[graft.etl.ChargesEtl.registerDailyTotalsView]]'s temp view over
  * in-flight frames): it survives session restarts and is visible to
  * any catalog-sharing client, matching the reference's persistent
  * MySQL view.
  */
object Ddl {

  /** Create the charges/companies tables if absent. Safe to call on
    * every run — an existing table (and its data) is left untouched.
    * Tables are external (`LOCATION $baseDir/<name>`): a FRESH catalog
    * (new JVM, in-memory session catalog) re-adopts the data a
    * previous run left at the same location, so re-running the ETL
    * process end-to-end never fails on "location already exists" the
    * way a managed-table bootstrap would. */
  def bootstrap(spark: SparkSession, baseDir: String): Unit = {
    // the catalog flow owns these names: a session temp view named
    // `charges`/`companies` would SHADOW the catalog tables for every
    // later `spark.table` resolution and silently corrupt the load
    Seq("companies", "charges").foreach(spark.catalog.dropTempView)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS companies (
        |  company_id   STRING NOT NULL,
        |  company_name STRING NOT NULL)
        |USING parquet LOCATION '$baseDir/companies'""".stripMargin)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS charges (
        |  id         STRING NOT NULL,
        |  company_id STRING NOT NULL,
        |  amount     DECIMAL(16,2) NOT NULL,
        |  status     STRING NOT NULL,
        |  created_at TIMESTAMP NOT NULL,
        |  updated_at TIMESTAMP)
        |USING parquet LOCATION '$baseDir/charges'""".stripMargin)
  }

  /** The reference's daily_company_totals as a persistent catalog view
    * (sql/02_view.sql:4-11). */
  def createDailyTotalsView(spark: SparkSession): Unit =
    spark.sql(
      """CREATE OR REPLACE VIEW daily_company_totals_cat AS
        |SELECT c.company_name,
        |       CAST(ch.created_at AS DATE) AS transaction_date,
        |       SUM(ch.amount) AS total_amount
        |FROM charges ch JOIN companies c ON ch.company_id = c.company_id
        |GROUP BY c.company_name, CAST(ch.created_at AS DATE)
        |""".stripMargin)

  /** Idempotent keyed load into a bootstrapped catalog table —
    * `INSERT IGNORE`/upsert semantics relationally: existing keys are
    * kept (first-wins, the MySQL PK behavior the reference relies on),
    * new keys appended. Re-running the same batch is a no-op.
    *
    * In-batch duplicates: MySQL's "first-wins" is an arrival-order
    * notion that a distributed frame does not have. Pass `orderCol`
    * (e.g. an ingest-sequence column) to dedupe deterministically —
    * lowest `orderCol` per key wins, exactly the reference's
    * first-in-file-order semantics. Without it, `dropDuplicates`
    * keeps an ARBITRARY row per key under parallel execution, so the
    * caller must hand in a frame that is already key-unique (both
    * current callers do: `companiesTable` and `charges` are
    * PK-deduped by `_row_id` inside the ETL). */
  def loadIfAbsent(spark: SparkSession, df: DataFrame, table: String,
      keyCols: Seq[String], orderCol: Option[String] = None): Unit = {
    absentRows(spark, df, table, keyCols, orderCol)
      .write.mode(SaveMode.Append).insertInto(table)
  }

  /** The rows of `df` whose keys are not yet in `table`, ready to
    * append.
    *
    * Scale shape: the existing-keys side is PRUNED to the incoming
    * batch's key range (min/max of the leading key, one bounded 1-row
    * aggregate) before the anti-join. An incremental batch touches a
    * narrow slice of a huge table — without the range filter every
    * load anti-joins a full scan of all accumulated history; with it,
    * parquet min/max stats skip every row group outside the batch's
    * range. Same touched-scope discipline as [[Sinks]]' scoped upsert.
    * Correctness is unaffected: an existing key outside the batch's
    * leading-key range can't equal any batch key. */
  private[sources] def absentRows(spark: SparkSession, df: DataFrame,
      table: String, keyCols: Seq[String],
      orderCol: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max, min, row_number}
    import org.apache.spark.sql.expressions.Window
    val existing = spark.table(table)
    val deduped = orderCol match {
      case Some(oc) =>
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(oc))
        df.withColumn("_lia_rn", row_number().over(w))
          .filter(col("_lia_rn") === 1).drop("_lia_rn")
      case None => df.dropDuplicates(keyCols)
    }
    // bounds come from the raw batch (same key set as deduped — which
    // duplicate survives can't change min/max), so the window/dedup
    // isn't computed twice
    val k1 = keyCols.head
    val bounds = df.agg(min(col(k1)).as("lo"), max(col(k1)).as("hi"))
      .head()
    val existingKeys =
      if (bounds.isNullAt(0)) existing.filter(lit(false)) // empty batch
      else existing.filter(
        col(k1) >= lit(bounds.get(0)) && col(k1) <= lit(bounds.get(1)))
    deduped
      .join(existingKeys.select(keyCols.map(col): _*).dropDuplicates(),
        keyCols, "left_anti")
      .select(existing.columns.map(col).toIndexedSeq: _*)
  }
}
