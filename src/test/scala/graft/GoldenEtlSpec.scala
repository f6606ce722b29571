package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.ChargesEtl

/** Golden-output parity against the reference's own committed ETL run
  * (SURVEY §5.2.1): exact row-set equality with df_clean.csv /
  * df_critical.csv and the count quintuple 10000/9986/14/5/9986. */
class GoldenEtlSpec extends SparkSpec {
  import spark.implicits._

  private val refDir = "/root/reference"
  // directory-listing resolution of the accented filename — immune to
  // path-encoding quirks, no glob metadata-probe WARN
  private lazy val result = ChargesEtl.run(spark, ChargesEtl.findReferenceCsv(refDir))

  /** Canonical comparable form: amounts as double, timestamps as
    * yyyy-MM-dd strings (how pandas serialized the golden CSVs). */
  private def canon(df: DataFrame, cols: Seq[String]): DataFrame = {
    val c = df
      .withColumn("amount", col("amount").cast("double"))
      .withColumn("created_at", date_format(col("created_at"), "yyyy-MM-dd"))
      .withColumn("updated_at", date_format(col("updated_at"), "yyyy-MM-dd"))
    c.select(cols.map(col): _*)
  }

  private def readGolden(path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .withColumn("amount", col("amount").try_cast("double"))

  private val cleanCols = Seq("id", "company_name", "company_id", "amount",
    "status", "created_at", "updated_at")

  test("count quintuple matches the published run: 10000/9986/14/5/9986") {
    assert(result.original.count() == 10000L)
    assert(result.clean.count() == 9986L)
    assert(result.critical.count() == 14L)
    assert(result.companies.count() == 5L)
    // after INSERT IGNORE, only 3 distinct company_id PKs survive
    assert(result.companiesTable.count() == 3L)
    assert(result.charges.count() == 9986L)
  }

  test("clean rows equal df_clean.csv exactly (row-set, both directions)") {
    val got = canon(result.clean, cleanCols)
    val want = canon(readGolden(s"$refDir/df_clean.csv"), cleanCols)
    assert(got.exceptAll(want).count() == 0, "rows we produced but golden lacks")
    assert(want.exceptAll(got).count() == 0, "golden rows we failed to produce")
  }

  test("critical rows equal df_critical.csv exactly, including reasons") {
    val cols = cleanCols :+ "_critical_reason"
    val got = canon(result.critical, cols)
    val want = canon(readGolden(s"$refDir/df_critical.csv"), cols)
    assert(got.exceptAll(want).count() == 0, "rows we produced but golden lacks")
    assert(want.exceptAll(got).count() == 0, "golden rows we failed to produce")
  }

  test("quarantine reason breakdown matches BASELINE.md") {
    val reasons = result.critical.groupBy("_critical_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons == Map(
      "missing_id" -> 3L, "missing_company_id" -> 4L,
      "invalid_amount" -> 4L, "missing_created_at" -> 3L))
  }

  test("daily_company_totals view answers the readme spot-check queries") {
    ChargesEtl.registerDailyTotalsView(spark, result)
    val eq = spark.sql(
      "SELECT * FROM daily_company_totals WHERE transaction_date = DATE'2019-03-16'")
    assert(eq.count() > 0)
    val between = spark.sql(
      """SELECT * FROM daily_company_totals
        |WHERE transaction_date BETWEEN DATE'2019-03-16' AND DATE'2022-05-31'""".stripMargin)
    assert(between.count() > 0)
    // grand total over the view == sum over clean charges
    val viaView = between.agg(sum($"total_amount")).head.getDecimal(0)
    val direct = result.charges
      .filter($"created_at" >= lit("2019-03-16").cast("timestamp"))
      .agg(sum($"amount")).head.getDecimal(0)
    assert(viaView.compareTo(direct) == 0)
  }

  test("name fill recovered null names from the company group") {
    // input lines 733/2201/2202 had null name + valid company_id
    // (FIXTURES.md §2) — they must come out as MiPasajefy, never null
    val nulls = result.clean.filter($"company_name".isNull ||
      $"company_name".isin("", "nan", "<NA>")).count()
    assert(nulls == 0)
  }

  test("release() drops the run's cached RDD — repeated runs don't grow") {
    result.clean.count() // materialize the shared lazy result first
    val before = spark.sparkContext.getPersistentRDDs.size
    // a distinct path: an identical plan would be deduped by the
    // CacheManager and hide the growth this test guards against
    val tmp = java.nio.file.Files.createTempFile("graft-golden", ".csv")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(ChargesEtl.findReferenceCsv(refDir)), tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val r = ChargesEtl.run(spark, tmp.toString)
    r.clean.count()
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    r.release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() must unregister the run's cache")
  }

  test("ingest id assignment is distributed (no single-task coalesce)") {
    val plan = ChargesEtl.readRaw(spark, ChargesEtl.findReferenceCsv(refDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Coalesce"), s"readRaw must not coalesce:\n$plan")
    assert(!plan.contains("ExistingRDD"),
      s"readRaw must stay declarative (no RDD round-trip):\n$plan")
    assert(plan.contains("monotonically_increasing_id"), plan)
  }

  test("EtlRunner incremental mode: reference statement semantics, idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft-etlrun").toString
    val csv = ChargesEtl.findReferenceCsv(refDir)
    Seq("charges", "companies").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")) // fresh catalog for this run
    val r1 = graft.etl.EtlRunner.run(spark, csv, out, incremental = true)
    try {
      val charges = spark.read.parquet(s"$out/inc/charges")
      val companies = spark.read.parquet(s"$out/inc/companies")
      assert(charges.count() == 9986 && companies.count() == 3)
      // part_date layout: date dirs exist, I/O of a re-run is scoped
      assert(new java.io.File(s"$out/inc/charges").listFiles()
        .count(_.getName.startsWith("part_date=")) > 100)
    } finally r1.release()
    // re-run (the reference's upsert replay): same counts, no dups
    val r2 = graft.etl.EtlRunner.run(spark, csv, out, incremental = true)
    try {
      assert(spark.read.parquet(s"$out/inc/charges").count() == 9986)
      assert(spark.read.parquet(s"$out/inc/companies").count() == 3)
    } finally r2.release()
  }

  test("ETL lake probes run pruned: F6/F7 through readPruned, PK through readPoint") {
    import graft.sources.Versioned
    val out = java.nio.file.Files.createTempDirectory("graft-etlprune").toString
    val csv = ChargesEtl.findReferenceCsv(refDir)
    Seq("charges", "companies").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    val r = graft.etl.EtlRunner.run(spark, csv, out)
    try {
      val lake = s"$out/tables"
      val v = Versioned.currentVersion(spark, lake).get
      val full = Versioned.read(spark, lake, "charges")

      // F7: the reference's date-window view query (api/main.py §/query,
      // sql/02_view.sql) as a created_at range — identical rows, files
      // actually skipped at the manifest level
      // a window derived from the data itself: the first ~30 days of
      // charges — non-empty by construction, partial by construction
      // (the corpus spans years)
      val minTs = full.agg(min($"created_at")).head.getTimestamp(0)
      val lo = minTs
      val hi = new java.sql.Timestamp(
        minTs.getTime + 30L * 24 * 3600 * 1000)
      val pruned = Versioned.readPruned(spark, lake, "charges",
        "created_at", lo, hi)
      val fullRows = full
        .filter($"created_at" >= lit(lo) && $"created_at" <= lit(hi))
        .collect().map(_.toSeq).toSet
      assert(pruned.collect().map(_.toSeq).toSet == fullRows)
      assert(fullRows.nonEmpty)
      val sel = Versioned.prunedSelectionAt(spark, lake, "charges", v,
        "created_at", lo, hi)
      val (selected, total) = sel.head._2.get
      assert(selected.size < total,
        s"date window skipped nothing: ${selected.size}/$total")

      // F6 family: an amount range probe prunes too (decimal zone map)
      val aPruned = Versioned.readPruned(spark, lake, "charges",
        "amount", new java.math.BigDecimal("9000.00"),
        new java.math.BigDecimal("10000.00"))
      assert(aPruned.collect().map(_.toSeq).toSet == full
        .filter($"amount" >= lit(9000.0) && $"amount" <= lit(10000.0))
        .collect().map(_.toSeq).toSet)

      // PK point probe (sql/01_schema.sql:11 — charges.id): identical
      // row through the bloom, ~1 file opened
      val someId = full.orderBy($"id").limit(1)
        .collect().head.getString(0)
      val point = Versioned.readPoint(spark, lake, "charges", "id", someId)
      assert(point.collect().map(_.toSeq).toSet ==
        full.filter($"id" === someId).collect().map(_.toSeq).toSet)
      val psel = Versioned.pointSelectionAt(spark, lake, "charges", v,
        "id", someId)
      val (pSelected, pTotal) = psel.head._2.get
      assert(pSelected.size < pTotal,
        s"PK probe skipped nothing: ${pSelected.size}/$pTotal")
    } finally r.release()
  }
}
