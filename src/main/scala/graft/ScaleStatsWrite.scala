package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Publish-time I/O of stats/bloom-tracked writes — the r17 probe for
  * VERDICT r16 "What's missing #1".
  *
  * The r16 sidecar builders ran AFTER the write: a footer walk for
  * min/max (metadata-sized) and a full column re-scan per Bloom
  * sidecar — so a bloom-tracked publish read the table it had just
  * written (input ≈ table bytes, ×2 total I/O). r17's
  * [[graft.sources.StatsWrite]] emits both sidecars from the write
  * tasks: input bytes for the same publish should be ~zero beyond the
  * source itself.
  *
  * Measured via a SparkListener summing task input bytes, on a
  * generated (zero-input) frame, so every byte READ is attributable
  * to sidecar construction. Cells: write+sidecars via the write-task
  * path vs the r16 shape (native write, then legacy collectors), at
  * 2M rows — plus the byte identity of the sidecars both paths
  * produce. Emits one JSON line. */
object ScaleStatsWrite {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new AtomicLong(0)
    val recordsRead = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
    })
    def readPhase[A](f: => A): (A, (Long, Long), Double) = {
      // listener events are async — give the bus a moment to drain
      // (listenerBus.waitUntilEmpty is private API; a settle sleep is
      // measurement-grade here)
      Thread.sleep(1500)
      bytesRead.set(0)
      recordsRead.set(0)
      val t0 = System.nanoTime()
      val a = f
      val secs = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      Thread.sleep(1500)
      (a, (bytesRead.get(), recordsRead.get()), secs)
    }

    val n = 2000000L
    val df = spark.range(0, n, 1, 16).select(
      col("id").as("k"),
      concat(lit("name-"), lpad(col("id") % 99991, 8, "0")).as("name"),
      (col("id").cast("decimal(16,2)") / 100).as("amount"))
    val statsCols = Seq("k", "amount")
    val bloomCols = Seq("k", "name")

    val root = java.nio.file.Files
      .createTempDirectory("graft-scale-sw").toString
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }

    // r17 path: write tasks emit the sidecars
    val (_, (readNew, recsNew), secsNew) = readPhase {
      graft.sources.StatsWrite.write(spark, df, s"$root/new",
        statsCols, bloomCols)
    }
    val tableBytes = dirBytes(s"$root/new")

    // r16 shape: native write, then the legacy collectors re-scan
    val (_, (readOld, recsOld), secsOld) = readPhase {
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("compression", "zstd").parquet(s"$root/old")
      graft.sources.ZoneMaps.writeSidecar(spark, s"$root/old", statsCols)
      graft.sources.ZoneBlooms.writeSidecar(spark, s"$root/old", bloomCols)
    }

    // partitioned cells (r17: the rolling writer — the ETL charges
    // shape): same frame + a 16-value date partition column
    val dp = df.withColumn("part_date",
      expr("date_add(date'2024-01-01', cast(k % 16 as int))"))
    val (_, (readNewP, recsNewP), secsNewP) = readPhase {
      graft.sources.StatsWrite.writePartitioned(spark, dp, s"$root/newp",
        Seq("part_date"), statsCols, bloomCols)
    }
    val (_, (readOldP, recsOldP), secsOldP) = readPhase {
      dp.repartition(col("part_date"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("compression", "zstd")
        .partitionBy("part_date").parquet(s"$root/oldp")
      graft.sources.ZoneMaps.writeSidecar(spark, s"$root/oldp", statsCols)
      graft.sources.ZoneBlooms.writeSidecar(spark, s"$root/oldp", bloomCols)
    }
    val zmp1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/newp/_zonemap.tsv"))
    graft.sources.ZoneMaps.writeSidecar(spark, s"$root/newp", statsCols)
    val zmp2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/newp/_zonemap.tsv"))
    val identicalP = java.util.Arrays.equals(zmp1, zmp2)

    // sanity: the write-task sidecars equal what the legacy collectors
    // would derive from the same files (byte identity, StatsWriteSpec's
    // pin, re-checked here on the 2M-row shape)
    val zm1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/new/_zonemap.tsv"))
    graft.sources.ZoneMaps.writeSidecar(spark, s"$root/new", statsCols)
    val zm2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/new/_zonemap.tsv"))
    val identical = java.util.Arrays.equals(zm1, zm2)

    // skew cells (r18, VERDICT r17 wrong #1): a deliberately HOT-keyed
    // partitioned publish — 90% of rows in ONE date (the reference's
    // charges shape). The r17 writer serialized the hot value into one
    // task/one file with an O(rows) bloom hash buffer; the salted
    // writer must spread it over >1 concurrent write task and multiple
    // target-bounded files. Concurrency is read from the file names
    // (each final file carries its writing task's index) plus the
    // listener's distinct-task count for the write stage.
    val hot = spark.range(0, n, 1, 16).select(
      col("id").as("k"),
      concat(lit("name-"), lpad(col("id") % 99991, 8, "0")).as("name"),
      (col("id").cast("decimal(16,2)") / 100).as("amount"),
      when(col("id") % 10 < 9, lit("2024-01-01").cast("date"))
        .otherwise(expr("date_add(date'2024-02-01', cast(id % 7 as int))"))
        .as("part_date"))
    val (_, (readHot, recsHot), secsHot) = readPhase {
      graft.sources.StatsWrite.writePartitioned(spark, hot, s"$root/hot",
        Seq("part_date"), statsCols, bloomCols,
        targetRowsPerFile = 200000L)
    }
    val hotFiles = new java.io.File(s"$root/hot/part_date=2024-01-01")
      .list().filter(_.endsWith(".parquet")).toSeq
    val hotTasks = hotFiles.map(_.split("-")(1)).distinct.size
    val maxHotFileRows = hotFiles.map(f => spark.read.parquet(
      s"$root/hot/part_date=2024-01-01/$f").count()).max
    // sidecars over the skew-split layout still match the legacy
    // re-scan byte-for-byte
    val zmh1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/hot/_zonemap.tsv"))
    graft.sources.ZoneMaps.writeSidecar(spark, s"$root/hot", statsCols)
    val zmh2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/hot/_zonemap.tsv"))
    val identicalH = java.util.Arrays.equals(zmh1, zmh2)

    // compaction-fold cell (r19, VERDICT r18 directive #7): the HOT
    // frame lives in a versioned lake — partition-published, a flat
    // MoR append and a tombstone accrete chain debt, then
    // compactPartitioned re-materializes the fold through the salted
    // writer. The salt discipline must survive the composition: the
    // hot value still writes from >1 task into target-bounded files.
    val lake = s"$root/lake"
    graft.sources.Versioned.publish(spark, lake,
      Seq(graft.sources.Versioned.TableSpec("t", hot,
        partitionBy = Seq("part_date"), statsCols = statsCols,
        bloomCols = Seq("name"), targetRowsPerFile = 200000L)))
    graft.sources.Versioned.appendPublish(spark, lake, "t",
      spark.range(n, n + 100000L).select(
        col("id").as("k"),
        concat(lit("name-"), lpad(col("id") % 99991, 8, "0")).as("name"),
        (col("id").cast("decimal(16,2)") / 100).as("amount"),
        lit("2024-01-01").cast("date").as("part_date")))
    graft.sources.Versioned.removePublish(spark, lake, "t",
      spark.range(0, 50000L).select(col("id").as("k")))
    val (_, (readFold, recsFold), secsFold) = readPhase {
      graft.sources.Versioned.compactPartitioned(spark, lake, "t",
        Seq("part_date"), targetRowsPerFile = 200000L)
    }
    val foldChain = graft.sources.Versioned
      .entryChainAt(spark, lake, "t", 4L)
    val foldDir = new java.io.File(
      new java.io.File(lake, foldChain.head._2), "part_date=2024-01-01")
    val foldFiles = foldDir.list().filter(_.endsWith(".parquet")).toSeq
    val foldTasks = foldFiles.map(_.split("-")(1)).distinct.size
    val foldMaxRows = foldFiles.map(f => spark.read.parquet(
      s"$foldDir/$f").count()).max
    val foldHotRows = n * 9 / 10 + 100000L - 45000L // minus tombstoned hot rows

    println(s"""{"rows":$n,"table_bytes":$tableBytes,""" +
      s""""writetask_read_bytes":$readNew,"writetask_read_records":$recsNew,""" +
      s""""writetask_secs":$secsNew,""" +
      s""""rescan_read_bytes":$readOld,"rescan_read_records":$recsOld,""" +
      s""""rescan_secs":$secsOld,""" +
      s""""zonemap_byte_identical":$identical,""" +
      s""""part_writetask_read_bytes":$readNewP,""" +
      s""""part_writetask_read_records":$recsNewP,""" +
      s""""part_writetask_secs":$secsNewP,""" +
      s""""part_rescan_read_bytes":$readOldP,""" +
      s""""part_rescan_read_records":$recsOldP,""" +
      s""""part_rescan_secs":$secsOldP,""" +
      s""""part_zonemap_byte_identical":$identicalP,""" +
      s""""hot_rows":${n * 9 / 10},"hot_files":${hotFiles.size},""" +
      s""""hot_write_tasks":$hotTasks,""" +
      s""""hot_max_file_rows":$maxHotFileRows,""" +
      s""""hot_read_bytes":$readHot,"hot_read_records":$recsHot,""" +
      s""""hot_secs":$secsHot,""" +
      s""""hot_zonemap_byte_identical":$identicalH,""" +
      s""""fold_hot_rows":$foldHotRows,"fold_hot_files":${foldFiles.size},""" +
      s""""fold_hot_write_tasks":$foldTasks,""" +
      s""""fold_hot_max_file_rows":$foldMaxRows,""" +
      s""""fold_read_bytes":$readFold,"fold_read_records":$recsFold,""" +
      s""""fold_secs":$secsFold}""")
    spark.stop()
  }
}
