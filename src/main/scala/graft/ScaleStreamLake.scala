package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.streaming.{StreamingLakeAppend, StreamingLakeTakedown}

/** Streamed lake ingest + takedown at 1× and 10× standing rows — the
  * r17 probe for VERDICT r16 "Next #6" (the one r16 family without a
  * 10×-row measurement), extended to the new takedown twin.
  *
  * The claims under test, per standing-corpus size N ∈ {1×, 10×}:
  *  - per-batch publish cost is ∝ the BATCH, not N: wall time and
  *    bytes written per streamed append stay flat as N grows 10×;
  *  - the auto-compact policy bounds fold depth throughout the run
  *    (trajectory recorded per batch), and only its crossings pay
  *    more than batch-sized I/O;
  *  - the replay probe (one membership probe of the cumulative
  *    marker) stays milliseconds and FLAT in N — it reads the marker
  *    table, never the data;
  *  - a streamed takedown batch writes tombstone-sized bytes
  *    regardless of N.
  * Emits one JSON line with per-scale cells. */
object ScaleStreamLake {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(t0: Long): Double = math.round((System.nanoTime() - t0) / 1e6) / 1e3
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f == null || !f.exists()) 0L
        else if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      walk(new java.io.File(p))
    }

    def facts(lo: Long, hi: Long) = spark.range(lo, hi, 1, 16).select(
      col("id").as("k"),
      concat(lit("payload-"), lpad(col("id") % 99991, 12, "0")).as("v"))

    val batchRows = 50000L
    val batches = 8

    def cell(scaleTag: String, standing: Long): String = {
      val lake = java.nio.file.Files
        .createTempDirectory(s"graft-ssl-$scaleTag").toString + "/lake"
      Versioned.publish(spark, lake,
        Seq(Versioned.TableSpec("t", facts(0, standing))))
      Versioned.setAutoCompact(spark, lake, 6)
      val baseBytes = dirBytes(lake)
      var prev = baseBytes
      val appends = (0 until batches).map { i =>
        val lo = standing + i * batchRows
        val t0 = System.nanoTime()
        StreamingLakeAppend.ingestBatch(spark, facts(lo, lo + batchRows),
          i.toLong, lake, "t", Seq("k"))
        val s = secs(t0)
        val now = dirBytes(lake)
        val delta = now - prev
        prev = now
        val cur = Versioned.currentVersion(spark, lake).get
        val depth = Versioned.entryChainAt(spark, lake, "t", cur).size
        (s, delta, depth)
      }
      // replay probe: the already-ingested batch 0 — one marker probe
      val tR = System.nanoTime()
      StreamingLakeAppend.ingestBatch(spark, facts(standing, standing + 1),
        0L, lake, "t", Seq("k"))
      val replaySecs = secs(tR)
      // streamed takedown batch: 1000 tombstone keys against N+appends
      val tombs = spark.range(0, 1000, 1, 4)
        .select((col("id") * (standing / 1000)).as("k"))
      val beforeTd = dirBytes(lake)
      val tT = System.nanoTime()
      StreamingLakeTakedown.takedownBatch(spark, tombs, 0L, lake, "t")
      val tdSecs = secs(tT)
      val tdBytes = dirBytes(lake) - beforeTd
      // takedown audit: the whole 1000-key batch in ONE read
      // (readPointIn) vs a per-key probe loop (8 sample keys) —
      // the reason the batch probe exists
      val keys = (0 until 1000).map(i => i.toLong * (standing / 1000))
      val tA = System.nanoTime()
      val residue = Versioned.readPointIn(spark, lake, "t", "k", keys).count()
      val auditBatchSecs = secs(tA)
      val tL = System.nanoTime()
      keys.take(8).foreach(k =>
        Versioned.readPoint(spark, lake, "t", "k", k).count())
      val auditLoop8Secs = secs(tL)
      s""""$scaleTag":{"standing_rows":$standing,""" +
        s""""standing_bytes":$baseBytes,""" +
        s""""append_secs":[${appends.map(_._1).mkString(",")}],""" +
        s""""append_delta_bytes":[${appends.map(_._2).mkString(",")}],""" +
        s""""depth_trajectory":[${appends.map(_._3).mkString(",")}],""" +
        s""""replay_probe_secs":$replaySecs,""" +
        s""""takedown_secs":$tdSecs,"takedown_delta_bytes":$tdBytes,""" +
        s""""audit_batch1000_secs":$auditBatchSecs,""" +
        s""""audit_residue":$residue,""" +
        s""""audit_loop8_secs":$auditLoop8Secs}"""
    }

    val c1 = cell("1x", 1000000L)
    val c10 = cell("10x", 10000000L)
    println(s"""{"batch_rows":$batchRows,"batches":$batches,$c1,$c10}""")
    spark.stop()
  }
}
