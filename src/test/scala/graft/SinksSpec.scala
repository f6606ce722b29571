package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("insertIfAbsent: INSERT IGNORE semantics — existing keys untouched") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val first = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.insertIfAbsent(spark, first, dir, Seq("k"))
    // second batch: existing key 2 with NEW value must be ignored
    val second = Seq((2L, "CHANGED"), (3L, "c"), (3L, "dup-in-batch")).toDF("k", "v")
    Sinks.insertIfAbsent(spark, second, dir, Seq("k"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == "b", "INSERT IGNORE must keep the original row")
  }

  test("upsertParquet: ON DUPLICATE KEY UPDATE semantics — incoming wins") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    Sinks.upsertParquet(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    Sinks.upsertParquet(spark, Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("upsert is idempotent (reference re-run semantics)") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val batch = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    Sinks.upsertParquet(spark, batch, dir, Seq("k"))
    Sinks.upsertParquet(spark, batch, dir, Seq("k"))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("jdbc upsert statement matches the reference's MySQL shape") {
    val sql = Sinks.upsertSql("charges",
      Seq("id", "company_id", "amount"), Seq("id"))
    assert(sql ==
      "INSERT INTO charges (id, company_id, amount) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE company_id = VALUES(company_id), amount = VALUES(amount)")
  }
}
