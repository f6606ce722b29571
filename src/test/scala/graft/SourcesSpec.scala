package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source-format coverage beyond parquet/CSV: JSON-lines and ORC
  * round-trips preserve schema and values (the formats a lake ingests
  * besides its native parquet). */
class SourcesSpec extends SparkSpec {

  private lazy val events = Tables(spark, sfDir, "events")

  test("JSON-lines round-trip preserves rows (explicit schema read)") {
    val dir = Files.createTempDirectory("graft-json").toString + "/e"
    // default JSON timestampFormat drops sub-millisecond digits — pin
    // a microsecond format on both sides
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite")
      .option("timestampFormat", tsFmt).json(dir)
    val back = spark.read.schema(events.schema)
      .option("timestampFormat", tsFmt).json(dir)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0)
  }

  test("ORC round-trip preserves rows and types") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/e"
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == events.schema)
    assert(back.exceptAll(events).count() == 0)
  }

  test("zstd-compressed partitioned parquet reads back identically") {
    val dir = Files.createTempDirectory("graft-zstd").toString + "/e"
    graft.sources.Lake.writeDatePartitioned(events, "ts", dir)
    val back = spark.read.parquet(dir).drop("part_date")
    assert(back.count() == events.count())
    val f = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part_date="))
    assert(f.nonEmpty)
  }
}
