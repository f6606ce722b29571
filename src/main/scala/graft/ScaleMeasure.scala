package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shared listener + measurement scaffolding for the scale harnesses
  * ([[ScaleIncr]], [[ScaleBucket]]) — one definition of the stage
  * collector, the poll-until-stable drain (the r13 ADVICE fix for the
  * fixed-sleep under-report), and the JSON fragment format, so a
  * change to the stability heuristic or the metric set cannot drift
  * between harnesses. */
object ScaleMeasure {

  final class Collector extends SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.LongAdder
    val input = new java.util.concurrent.atomic.LongAdder
    val output = new java.util.concurrent.atomic.LongAdder
    val stages = new java.util.concurrent.atomic.LongAdder
    val tasks = new java.util.concurrent.atomic.LongAdder
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.increment()
      tasks.add(s.stageInfo.numTasks)
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        input.add(m.inputMetrics.bytesRead)
        output.add(m.outputMetrics.bytesWritten)
      }
    }
  }

  /** Run `work`, wait for the listener bus to drain (stage count
    * stable across two 100 ms polls, bounded at 5 s), and return one
    * `"label":{secs, input_mb, shuffle_write_mb, tasks}` JSON
    * fragment. `tasks` is the scheduling-cost axis: for a scan it is
    * ∝ the files the planner actually handed out — the number zone-map
    * pruning cuts even when parquet's own row-group pushdown already
    * bounds the bytes. */
  def measure(spark: SparkSession, label: String)(work: => Unit): String = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    val t0 = System.nanoTime()
    work
    val secs = (System.nanoTime() - t0) / 1e9
    var stable = 0; var last = -1L; var polls = 0
    while (stable < 2 && polls < 50) {
      Thread.sleep(100)
      val now = c.stages.sum
      if (now == last) stable += 1 else { stable = 0; last = now }
      polls += 1
    }
    spark.sparkContext.removeSparkListener(c)
    def mb(b: Long) = math.round(b / 1048.576) / 1000.0
    s""""$label":{"secs":${math.round(secs * 1000) / 1000.0},""" +
      s""""input_mb":${mb(c.input.sum)},""" +
      s""""shuffle_write_mb":${mb(c.shuffleWrite.sum)},""" +
      s""""output_mb":${mb(c.output.sum)},""" +
      s""""tasks":${c.tasks.sum}}"""
  }
}
