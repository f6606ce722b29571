package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.etl.ChargesEtl

/** Operator-level vectors for the coercion family (SURVEY §5.2.4) and
  * generator-based dirty-row invariants — one Spark pass over a
  * generated batch, row-level assertions in memory. */
class EtlUnitSpec extends SparkSpec {
  import spark.implicits._

  private def runPipeline(rows: Seq[(String, String, String, String, String, String, String)]) = {
    val df = rows.toDF("id", "name", "company_id", "amount", "status",
      "created_at", "paid_at")
      .withColumn("_row_id", monotonically_increasing_id())
    ChargesEtl.maskReasons(ChargesEtl.transform(df))
  }

  test("_row_id order equals file order across MANY input splits") {
    // Guards the internal-behavior dependency documented at
    // ChargesEtl.readRaw: monotonically_increasing_id sorts in file
    // order because Spark packs one file's splits in offset order.
    // Prior coverage only ever read single-split CSVs; here the file is
    // forced through a lowered maxPartitionBytes so a packing change in
    // a Spark upgrade (or a big real input) can't silently reorder the
    // group-first fill.
    val dir = java.nio.file.Files.createTempDirectory("graft-splits")
    val csv = dir.resolve("wide.csv")
    val n = 5000
    val body = (0 until n).map { i =>
      f"r$i%05d,name$i%05d,c$i%05d,1.00,paid,2019-01-01,2019-01-02"
    }
    java.nio.file.Files.write(csv,
      ("id,name,company_id,amount,status,created_at,paid_at" +: body)
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "16384") // ~16 splits
      conf.set("spark.sql.files.openCostInBytes", "0")
      val raw = ChargesEtl.readRaw(spark, csv.toString)
      assert(raw.rdd.getNumPartitions > 4,
        s"test must exercise a multi-split read, got ${raw.rdd.getNumPartitions}")
      val ids = raw.orderBy("_row_id").select("id").collect().map(_.getString(0))
      assert(ids.length == n)
      assert(ids.sameElements((0 until n).map(i => f"r$i%05d")),
        "_row_id sort order diverged from file order on a multi-split CSV")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }

  test("C1 rounding vectors reproduce numpy's scaled half-even exactly") {
    // numpy rounds rint(x*100)/100 — on the SCALED binary value:
    // 2.675*100 == 267.5 exactly → half-even → 2.68 (np.round agrees;
    // note Python's builtin round(2.675,2) gives 2.67 — different
    // algorithm, and NOT what pandas uses); 0.125*100 == 12.5 → 0.12;
    // 0.135*100 == 13.500000000000002 → 0.14
    val out = runPipeline(Seq(
      ("a", "n", "c", "2.675", "paid", "2019-01-01", ""),
      ("b", "n", "c", "0.125", "paid", "2019-01-01", ""),
      ("c", "n", "c", "0.135", "paid", "2019-01-01", ""),
      ("d", "n", "c", "66.16", "paid", "2019-01-01", "")))
      .select("id", "amount").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 2.68)
    assert(out("b") == 0.12)
    assert(out("c") == 0.14)
    assert(out("d") == 66.16)
  }

  test("C2 date format matrix: only strict yyyy-MM-dd survives") {
    val out = runPipeline(Seq(
      ("a", "n", "c", "1", "paid", "2019-02-27T00:00:00", ""), // ISO → null
      ("b", "n", "c", "1", "paid", "20190516", ""),            // compact → null
      ("c", "n", "c", "1", "paid", "2019-05-16", ""),          // strict → ok
      ("d", "n", "c", "1", "paid", "", "")))                   // empty → null
      .select("id", "created_at", "_critical_reason").collect()
      .map(r => r.getString(0) -> (r.isNullAt(1), r.getString(2))).toMap
    assert(out("a") == ((true, "missing_created_at")))
    assert(out("b") == ((true, "missing_created_at")))
    assert(out("c")._1 == false && out("c")._2 == "")
    assert(out("d") == ((true, "missing_created_at")))
  }

  test("C4/C5: overflow-to-inf and decimal-cap both quarantine as invalid_amount") {
    val out = runPipeline(Seq(
      ("a", "n", "c", "3.0e213231213123", "paid", "2019-01-01", ""), // → inf
      ("b", "n", "c", "21321323123121133.0", "paid", "2019-01-01", ""), // > cap
      ("c", "n", "c", "99999999999999.98", "paid", "2019-01-01", ""), // within cap
      ("d", "n", "c", "not_a_number", "paid", "2019-01-01", "")))     // junk
      .select("id", "amount", "_critical_reason").collect()
      .map(r => r.getString(0) -> (r.isNullAt(1), r.getString(2))).toMap
    assert(out("a") == ((true, "invalid_amount")))
    assert(out("b") == ((true, "invalid_amount")))
    assert(out("c")._1 == false && out("c")._2 == "")
    assert(out("d") == ((true, "invalid_amount")))
  }

  test("multi-violation rows carry pipe-joined reasons in mask order") {
    val out = runPipeline(Seq(
      ("", "n", "c", "bad", "paid", "2019-01-01", ""),
      ("", "n", "", "bad", "", "nope", "")))
      .select("_critical_reason").collect().map(_.getString(0)).toSet
    assert(out.contains("missing_id|invalid_amount"))
    assert(out.contains(
      "missing_id|missing_company_id|invalid_amount|missing_created_at|missing_status"))
  }

  test("invariant: every generated dirty row lands in exactly one bucket, critical ⇔ tagged") {
    val genField = Gen.oneOf(
      Gen.const(""), Gen.const("nan"), Gen.alphaNumStr.map(_.take(8)),
      Gen.const("  padded  "))
    val genAmount = Gen.oneOf(
      Gen.choose(-1e6, 1e6).map(_.toString), Gen.const(""),
      Gen.const("junk"), Gen.const("3.0e400"), Gen.const("1e15"))
    val genDate = Gen.oneOf(
      Gen.const("2019-03-16"), Gen.const(""), Gen.const("20190316"),
      Gen.const("2019-03-16T00:00:00"))
    val genRow = for {
      id <- genField; name <- genField; cid <- genField
      amt <- genAmount; st <- genField; cr <- genDate; pd <- genDate
    } yield (id, name, cid, amt, st, cr, pd)
    val rows = Gen.listOfN(300, genRow)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get

    val masked = runPipeline(rows)
    val n = masked.count()
    assert(n == 300L)
    val isCritical = col("_critical_reason") =!= ""
    val nCrit = masked.filter(isCritical).count()
    val nClean = masked.filter(!isCritical).count()
    assert(nCrit + nClean == n, "split must partition exactly")
    // critical ⇔ at least one rule mask true
    val mismatch = masked.filter(
      (col("_r_id") || col("_r_company_id") || col("_r_amount") ||
        col("_r_created_at") || col("_r_status")) =!= isCritical).count()
    assert(mismatch == 0)
  }
}
