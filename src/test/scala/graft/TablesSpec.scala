package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `events` loader's contract at the LOADER, not 14 stack
  * traces downstream: whatever parquet generation the testdata ships
  * with — ts as a raw nanos long (the TIMESTAMP(NANOS) legacy-conf
  * read) or as timestamp[us] — `Tables(…, "events")` must resolve with
  * `ts: TimestampType` carrying the same µs instants. The r12 testdata
  * regeneration flipped the layout and the only failures were
  * downstream DATATYPE_MISMATCH stacks; this suite names the loader. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one row at a known instant: 2024-03-01T12:34:56.789012Z
  private val micros = 1709296496789012L

  private def loaderContract(dir: String): Unit = {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must load as TimestampType, got ${df.schema("ts").dataType}")
    val got = df.select(unix_micros($"ts")).as[Long].head()
    assert(got == micros, s"expected $micros µs, got $got")
  }

  test("nanos-long generation: ts long is truncated to a µs timestamp") {
    val dir = java.nio.file.Files.createTempDirectory("tables_nanos").toString
    // a LongType ts column is exactly what the legacy nanosAsLong conf
    // yields for TIMESTAMP(NANOS) parquet — same loader branch
    Seq((1L, micros * 1000L + 999L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    loaderContract(dir)
  }

  test("timestamp[us] generation: ts passes through unshifted") {
    val dir = java.nio.file.Files.createTempDirectory("tables_us").toString
    Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    loaderContract(dir)
  }

  test("live testdata: events resolves, ts is TimestampType, rows exist") {
    val df = Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("streaming loader shares the adaptation (schema matches batch)") {
    val stream = Tables.eventsStream(spark, s"$sfDir/events.parquet")
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    assert(stream.schema.fieldNames.toSet ==
      Tables(spark, sfDir, "events").schema.fieldNames.toSet)
  }
}
