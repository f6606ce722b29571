package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** CLI entry mirroring `python etl/03_transform_and_load.py` (SURVEY
  * §3.1): extract → transform → audit CSVs → table load, with the
  * run-count report the reference prints (reference :97-99,:159-160).
  *
  * Usage: runMain graft.etl.EtlRunner <csvPath> <outDir> [--incremental]
  *
  * Two load modes:
  *  - default: both tables publish as ONE atomic version
  *    ([[graft.sources.Versioned]] — the S5 single-transaction
  *    semantics of the reference's two-table MySQL load);
  *  - `--incremental`: the reference's actual statement semantics
  *    (`INSERT IGNORE` companies, `ON DUPLICATE KEY UPDATE` charges)
  *    at scale — companies via [[graft.sources.Sinks.insertIfAbsent]],
  *    charges via [[graft.sources.Sinks.upsertPartitioned]] so a daily
  *    batch rewrites only its `part_date` directories, not the table.
  *
  * At 100 TB the audit trail would also be parquet with CSV export
  * only on demand (SURVEY S2).
  */
object EtlRunner {

  /** The full run, parameterized for tests (main owns the session). */
  def run(spark: SparkSession, csvPath: String, outDir: String,
      incremental: Boolean = false): ChargesEtl.Result = {
    import org.apache.spark.sql.functions.{col, to_date}
    // startup recovery: heal any table a previous process left
    // mid-swap before touching the lake (VERDICT r4: recoverSwap
    // existed but nothing invoked it automatically)
    graft.sources.Lake.recoverAll(spark, outDir)
    graft.sources.Lake.recoverAll(spark, s"$outDir/inc")

    val r = ChargesEtl.run(spark, csvPath)

    def writeCsv(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true")
        // the reference's audit CSVs serialize midnight timestamps
        // date-only (pandas to_csv); match that format
        .option("timestampFormat", "yyyy-MM-dd")
        .csv(s"$outDir/$name")

    writeCsv(r.clean, "df_clean")
    writeCsv(r.critical, "df_critical")

    val chargesPartitioned =
      r.charges.withColumn("part_date", to_date(col("created_at")))
    if (incremental) {
      // reference statement semantics, partition-scoped: a batch's
      // I/O ∝ the part_date dirs it touches
      graft.sources.Sinks.insertIfAbsent(spark, r.companiesTable,
        s"$outDir/inc/companies", Seq("company_id"))
      graft.sources.Sinks.upsertPartitioned(spark, chargesPartitioned,
        s"$outDir/inc/charges", Seq("id"), "part_date")
    } else {
      // Both tables publish as ONE atomic version (S5: the reference
      // commits companies+charges in a single MySQL transaction — a
      // reader must never see new companies next to old charges). The
      // commit point is one marker-file create; a crash anywhere
      // before it leaves the previous version fully readable. Charges
      // stay date-partitioned inside the version — the 100 TB layout
      // (SURVEY §7.3 step 8): date-ranged view queries prune dirs.
      // charges registers its probe machinery at publish: zone maps on
      // (amount, created_at) — the reference's own F6 negative-amount
      // and F7 date-window probes (api/main.py date filters,
      // sql/02_view.sql) then prune files instead of full-scanning —
      // and a bloom on id, the reference's PK (sql/01_schema.sql:11),
      // so point lookups open ~1 file. GoldenEtlSpec asserts identical
      // rows through readPruned/readPoint plus files actually skipped.
      graft.sources.Versioned.publish(spark, s"$outDir/tables", Seq(
        graft.sources.Versioned.TableSpec("companies", r.companiesTable),
        graft.sources.Versioned.TableSpec("charges", chargesPartitioned,
          partitionBy = Seq("part_date"),
          statsCols = Seq("amount", "created_at"),
          bloomCols = Seq("id"))))
    }

    // S7 catalog flow (reference sql/01_schema.sql + 02_view.sql):
    // bootstrap IF-NOT-EXISTS tables, keyed first-wins load, catalog
    // view — all idempotent, so re-running the ETL never fails
    graft.sources.Ddl.bootstrap(spark, s"$outDir/catalog")
    graft.sources.Ddl.loadIfAbsent(spark, r.companiesTable,
      "companies", Seq("company_id"))
    graft.sources.Ddl.loadIfAbsent(spark, r.charges, "charges", Seq("id"))
    graft.sources.Ddl.createDailyTotalsView(spark)
    r
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    require(positional.length == 2,
      "usage: EtlRunner <csvPath> <outDir> [--incremental]")
    val incremental = flags.contains("--incremental")
    val Array(csvPath, outDir) = positional
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (Spark's default timestamp encoding) carries no usable
      // parquet statistics — created_at zone maps would silently never
      // prune (the engine-session discipline, r16)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = run(spark, csvPath, outDir, incremental)
    println(s"Total original: ${r.original.count()}")
    println(s"Total clean: ${r.clean.count()}")
    println(s"Total critical: ${r.critical.count()}")
    println(s"Companies insertadas: ${r.companies.count()}")
    println(s"Charges insertadas/actualizadas: ${r.charges.count()}")
    r.release()
    spark.stop()
  }
}
