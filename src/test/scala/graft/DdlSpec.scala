package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.ChargesEtl
import graft.sources.Ddl

/** S7 catalog bootstrap: IF-NOT-EXISTS DDL, first-wins keyed load,
  * catalog view — and the re-run / fresh-catalog paths that make the
  * flow idempotent like the reference's MySQL schema script. */
class DdlSpec extends SparkSpec {

  private def cleanCatalog(): Unit =
    Seq("charges", "companies").foreach { t =>
      // temp views shadow catalog tables AND take DROP TABLE
      // precedence — clear them first or the drop below is a no-op
      // on the actual table
      spark.catalog.dropTempView(t)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }

  test("bootstrap + load + view is idempotent and survives a fresh catalog") {
    cleanCatalog()
    val base = Files.createTempDirectory("graft-ddl").toString
    val r = ChargesEtl.run(spark, ChargesEtl.findReferenceCsv())

    Ddl.bootstrap(spark, base)
    Ddl.loadIfAbsent(spark, r.companiesTable, "companies", Seq("company_id"))
    Ddl.loadIfAbsent(spark, r.charges, "charges", Seq("id"))
    Ddl.createDailyTotalsView(spark)

    val nCompanies = spark.table("companies").count()
    val nCharges = spark.table("charges").count()
    assert(nCompanies == 3L) // PK-deduped companies (GoldenEtlSpec)
    assert(nCharges == 9986L)

    // re-run: same DDL + same batches → no failure, no duplicates
    Ddl.bootstrap(spark, base)
    Ddl.loadIfAbsent(spark, r.companiesTable, "companies", Seq("company_id"))
    Ddl.loadIfAbsent(spark, r.charges, "charges", Seq("id"))
    assert(spark.table("companies").count() == nCompanies)
    assert(spark.table("charges").count() == nCharges)

    // the catalog view answers the reference's readme spot-check shape
    val total = spark.sql(
      """SELECT total_amount FROM daily_company_totals_cat
        |WHERE transaction_date = DATE'2019-03-16'
        |ORDER BY company_name""".stripMargin).count()
    assert(total > 0)

    // fresh catalog (new JVM simulation): drop the table entries —
    // external tables keep their files — then re-bootstrap and verify
    // the data is re-adopted without error
    cleanCatalog()
    Ddl.bootstrap(spark, base)
    assert(spark.table("charges").count() == nCharges,
      "fresh catalog must re-adopt existing table data")
    assert(spark.table("companies").count() == nCompanies)

    r.release()
    cleanCatalog()
  }

  test("loadIfAbsent keeps existing keys (MySQL PK first-wins)") {
    import spark.implicits._
    cleanCatalog()
    val base = Files.createTempDirectory("graft-ddl2").toString
    Ddl.bootstrap(spark, base)
    Ddl.loadIfAbsent(spark,
      Seq(("c1", "Alpha")).toDF("company_id", "company_name"),
      "companies", Seq("company_id"))
    Ddl.loadIfAbsent(spark,
      Seq(("c1", "CHANGED"), ("c2", "Beta")).toDF("company_id", "company_name"),
      "companies", Seq("company_id"))
    val out = spark.table("companies").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("c1" -> "Alpha", "c2" -> "Beta"))
    cleanCatalog()
  }

  test("loadIfAbsent with orderCol dedupes in-batch keys deterministically") {
    import spark.implicits._
    cleanCatalog()
    val base = Files.createTempDirectory("graft-ddl3").toString
    Ddl.bootstrap(spark, base)
    // in-batch duplicate keys with an explicit ingest sequence: the
    // lowest-sequence row must win (MySQL first-in-file-order), not an
    // arbitrary partition's — repartition(8) scrambles physical order
    val batch = Seq(
      ("c9", "Third", 30L), ("c9", "First", 10L), ("c9", "Second", 20L),
      ("c8", "Only", 5L))
      .toDF("company_id", "company_name", "_seq")
      .repartition(8)
    Ddl.loadIfAbsent(spark, batch, "companies", Seq("company_id"),
      orderCol = Some("_seq"))
    val out = spark.table("companies").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("c9" -> "First", "c8" -> "Only"))
    cleanCatalog()
  }
}
