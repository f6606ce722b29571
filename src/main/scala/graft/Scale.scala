package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Empirical scale evidence (VERDICT r12 #8): runs the most expensive
  * queries under the cluster posture and records per-query physical
  * traffic — shuffle read/write bytes, input bytes, memory/disk spill —
  * from stage-level task metrics via a SparkListener. This validates
  * the 100 TB design claims (e.g. the dedup family's Σ bucket² bound)
  * with measured bytes, not just plan shapes: a query whose shuffle
  * volume is a small multiple of its input reads like its cost model
  * says it should; one that shuffles 50× its input does not.
  *
  * Run it under a BOUNDED heap (`java -Xmx2g -cp …` — see SCALE.md) so
  * spill behavior is exercised honestly instead of being masked by a
  * 128 GiB sandbox heap.
  *
  * Emits one JSON line per query plus a `scale_out.json` mirror.
  */
object Scale {

  /** Stage-level aggregate collector. LongAdders because listener
    * callbacks arrive on the event bus thread while queries run. */
  final class Collector extends SparkListener {
    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    val memSpill = new LongAdder
    val diskSpill = new LongAdder
    val input = new LongAdder
    val peakExecMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val stagesSeen = new LongAdder
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stagesSeen.increment()
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
        input.add(m.inputMetrics.bytesRead)
        peakExecMem.getAndAccumulate(m.peakExecutionMemory, math.max)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // default: the bench's most expensive tail — the queries whose
    // scale story carries the most weight
    val names = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES",
      "q97_delta_entity_canon,q96_subword_budget,q99_cluster_cohesion," +
        "q73_source_dup_rate,q89_winsorize,q18_minhash_lsh,q102_semantic_dedup")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // shuffle partitions default to the core count, but are a separate
    // knob: at a fixed heap the per-task working set scales with
    // |data| / partitions, so scaling data WITHOUT scaling partitions
    // manufactures spill — the 10× evidence run uses this to show
    // spill is a partitioning knob, not a scaling wall (SCALE.md)
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
    val lines = names.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"SCALE WARN: unknown query $name"); None
        case Some(fn) =>
          // cold-run each query on a collector of its own; artifact
          // builds (signature/IVF indexes) charge their one-per-corpus
          // scan to the first query that needs them — called out in
          // SCALE.md rather than hidden by pre-warming
          val c = new Collector
          spark.sparkContext.addSparkListener(c)
          val t0 = System.nanoTime()
          // noop sink, not count(): count() lets Catalyst prune every
          // unreferenced column — a window query collapses to a bare
          // scan and the metrics measure nothing. noop materializes
          // every output column exactly as a real writer would.
          val r =
            try {
              val df = fn(spark, sfDir)
              df.write.format("noop").mode("overwrite").save()
              Right(df.columns.length.toLong)
            } catch { case t: Throwable => Left(t.toString.take(200)) }
          val secs = (System.nanoTime() - t0) / 1e9
          // drain the event bus before detaching: poll until the
          // stage-completed count is stable across two consecutive
          // 100 ms windows (listenerBus.waitUntilEmpty is
          // private[spark]); a fixed sleep under-reports on a loaded
          // box when straggler events land after removal. Bounded at
          // 5 s so a wedged bus can't hang the evidence tool.
          var stable = 0
          var last = -1L
          var polls = 0
          while (stable < 2 && polls < 50) {
            Thread.sleep(100)
            val now = c.stagesSeen.sum
            if (now == last) stable += 1 else { stable = 0; last = now }
            polls += 1
          }
          spark.sparkContext.removeSparkListener(c)
          Some(r match {
            case Right(n) =>
              s"""{"query":"$name","cols":$n,"secs":${math.round(secs * 1000) / 1000.0},""" +
                s""""input_mb":${mb(c.input.sum)},"shuffle_read_mb":${mb(c.shuffleRead.sum)},""" +
                s""""shuffle_write_mb":${mb(c.shuffleWrite.sum)},"spill_mem_mb":${mb(c.memSpill.sum)},""" +
                s""""spill_disk_mb":${mb(c.diskSpill.sum)},"peak_exec_mem_mb":${mb(c.peakExecMem.get)}}"""
            case Left(e) =>
              s"""{"query":"$name","error":"${e.replace("\"", "'")}"}"""
          })
      }
    }
    val heap = Runtime.getRuntime.maxMemory()
    val out =
      s"""{"sf":"$sfDir","cpus":$cpus,"heap_mb":${mb(heap)},"queries":[${lines.mkString(",")}]}"""
    println(out)
    try Files.write(Paths.get("scale_out.json"),
      (out + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case t: Throwable =>
      System.err.println(s"SCALE WARN: mirror write failed: $t") }
    spark.stop()
  }
}
