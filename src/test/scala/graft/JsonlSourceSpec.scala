package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JsonlSource

/** JSONL ingest must parse good lines, quarantine (not drop, not
  * fail on) malformed ones, and keep the raw line for audit. */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("clean/quarantine split parses good lines and captures bad ones raw") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "hello world"}""",
      """{"doc_id": 2, "lang": "es", "text": "hola"}""",
      """this line is not json at all""",
      """{"doc_id": "noT_a_number", "lang": "en", "text": "bad id type"}""",
      """{"doc_id": 3, "lang": "fr", "text": "bonjour"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val sp = JsonlSource.readSplit(spark, dir, schema)
    val clean = sp.clean.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(clean == Set((1L, "en", "hello world"), (2L, "es", "hola"),
      (3L, "fr", "bonjour")))
    // schema of the clean frame is exactly the declared one
    assert(sp.clean.schema.fieldNames.toSeq == Seq("doc_id", "lang", "text"))

    val quarantined = sp.quarantine.select("raw_line").collect()
      .map(_.getString(0)).toSet
    assert(quarantined.size == 2, s"expected 2 quarantined lines: $quarantined")
    assert(quarantined.exists(_.contains("not json at all")))
    assert(quarantined.exists(_.contains("noT_a_number")),
      "a type-mismatched line is corrupt, not silently null-coerced")
    // nothing lost, nothing duplicated
    assert(sp.clean.count() + sp.quarantine.count() == lines.size)
  }

  test("quarantined corpus flows into the text operators unchanged") {
    // the clean side must be a drop-in documents frame
    val dir = Files.createTempDirectory("graft-jsonl2").toString
    val lines = (1 to 20).map(i =>
      s"""{"doc_id": $i, "lang": "en", "text": "token one two three $i"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      (lines :+ "garbage{{{").mkString("\n").getBytes(StandardCharsets.UTF_8))
    val sp = JsonlSource.readSplit(spark, dir, schema)
    val counted = sp.clean
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
    assert(counted.agg(min(col("n_tokens"))).head().getInt(0) == 5)
    assert(counted.count() == 20)
  }
}
