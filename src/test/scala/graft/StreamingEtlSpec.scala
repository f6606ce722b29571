package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.StreamingEtl

class StreamingEtlSpec extends SparkSpec {

  test("streamed CSV splits into the reference's 9986/14 clean/critical") {
    val in = Files.createTempDirectory("graft-setl-in")
    val out = Files.createTempDirectory("graft-setl-out").toString
    // "arrive" the reference CSV in the watched directory
    val src = Files.list(Paths.get("/root/reference"))
      .filter(p => p.getFileName.toString.endsWith(".csv") &&
        p.getFileName.toString.startsWith("data_prueba"))
      .findFirst().get()
    Files.copy(src, in.resolve("batch1.csv"), StandardCopyOption.REPLACE_EXISTING)

    val q = StreamingEtl.start(spark, in.toString, out)
    try q.awaitTermination(120000) finally q.stop()

    val clean = spark.read.parquet(s"$out/clean")
    val critical = spark.read.parquet(s"$out/critical")
    assert(clean.count() == 9986L)
    assert(critical.count() == 14L)
    // same quarantine semantics as batch, streamed
    assert(critical.columns.contains("_critical_reason"))
  }
}
