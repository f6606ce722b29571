package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.ChargesEtl

/** Guard for readRaw's internal-behavior dependency (ADVICE r5): the
  * "`_row_id` sort order IS file order" claim rests on Spark's split
  * packing keeping equal-size chunks of ONE file in offset order.
  * GoldenEtlSpec only ever exercises single-split CSVs; this spec
  * forces a multi-split read (lowered maxPartitionBytes) so a Spark
  * upgrade or a >maxPartitionBytes input that silently reordered the
  * group-first fill would fail HERE, not in production. */
class RowIdOrderSpec extends SparkSpec {

  test("multi-split CSV: _row_id order equals file order") {
    val n = 20000
    val rows = (0 until n).map { i =>
      f"r$i%06d,name$i,c${i % 7},${i % 1000}.25,paid,2019-03-${i % 28 + 1}%02d,"
    }
    val csv = Files.createTempDirectory("graft-rowid")
      .resolve("wide.csv")
    Files.write(csv,
      ("id,name,company_id,amount,status,created_at,paid_at\n"
        + rows.mkString("\n") + "\n").getBytes(UTF_8))
    val fileBytes = Files.size(csv)

    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // force ~16 splits of the one file
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (fileBytes / 16).max(1024L).toString)
      val raw = ChargesEtl.readRaw(spark, csv.toString)
      // the premise: this read really is multi-split
      val nParts = raw.rdd.getNumPartitions
      assert(nParts > 4,
        s"test must exercise a multi-split read, got $nParts partitions")
      // _row_id sort order == file order (ids were written in order)
      val ids = raw.orderBy(col("_row_id"))
        .select("id").collect().map(_.getString(0))
      assert(ids.length == n)
      assert(ids.sameElements((0 until n).map(i => f"r$i%06d")),
        "sorting by _row_id must reproduce file order across splits")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
