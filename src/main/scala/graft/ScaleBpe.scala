package graft

import org.apache.spark.sql.SparkSession

import graft.queries.TextOps

/** BPE training cost vs merge-round count — the r16 substrate probe.
  *
  * The r15 implementation ran one distributed Spark job per merge
  * round: correct, and measured flat vs CORPUS size (SCALE.md r15),
  * but each round paid a ~1 s scheduling floor for a pair-count over
  * ≤ [[TextOps.BpeWordCap]] rows — at a realistic 32k-merge
  * vocabulary that is days of job-launch latency for kilobytes of
  * state. r16 moves the merge loop into driver memory (one bounded
  * collect of the capped word table, then plain Scala); the
  * distributed part of training remains the ONE corpus scan that
  * builds the word-frequency table.
  *
  * This harness measures the two costs separately: the word-count
  * scan (corpus-bound, unchanged), then the merge loop at 8 and 512
  * rounds. The claim to verify: loop time is no longer ∝
  * rounds × job-launch latency — 512 rounds must cost far under the
  * ~512 s the per-round-job shape would pay, and the per-round cost
  * must sit in the microsecond-to-millisecond range of an in-memory
  * pair count. Emits one JSON line. */
object ScaleBpe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(t0: Long): Double = math.round((System.nanoTime() - t0) / 1e6) / 1e3

    // the distributed part: one corpus scan → capped (word, n, s)
    // table, pinned so the loop probes below measure the LOOP only
    val tScan0 = System.nanoTime()
    val words = TextOps.bpeTrainingTable(spark, sfDir).localCheckpoint()
    val nWords = words.count()
    val scanSecs = secs(tScan0)

    // warm the collect path once so JIT/IO noise stays out of the
    // measured cells
    TextOps.bpeTrain(words, rounds = 1)

    val t8 = System.nanoTime()
    val m8 = TextOps.bpeTrain(words, rounds = 8)
    val s8 = secs(t8)

    val t512 = System.nanoTime()
    val m512 = TextOps.bpeTrain(words, rounds = 512)
    val s512 = secs(t512)

    // full-depth cell: the sf corpora draw from a small vocabulary, so
    // 512 rounds exhaust early there — this synthetic 8192-distinct-
    // word table (seeded, 8–16 chars) sustains all 512 rounds at the
    // cap the real training table is bounded by, measuring the
    // per-round cost at full state size
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val synth = (0 until 8192).map { _ =>
      val len = 8 + rnd.nextInt(9)
      Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct.zipWithIndex.map { case (w, i) =>
      (w.map(c => s" $c ").mkString, 1L + (i % 50)) }
      .toDF("s", "n").localCheckpoint()
    val nSynth = synth.count()
    val tFull = System.nanoTime()
    val mFull = TextOps.bpeTrain(synth, rounds = 512)
    val sFull = secs(tFull)

    println(s"""{"sf":"$sfDir","vocab_words":$nWords,""" +
      s""""word_count_scan_secs":$scanSecs,""" +
      s""""merges_8":${m8.size},"loop_secs_8":$s8,""" +
      s""""merges_512":${m512.size},"loop_secs_512":$s512,""" +
      s""""synth_vocab":$nSynth,"synth_merges_512":${mFull.size},""" +
      s""""synth_loop_secs_512":$sFull,""" +
      s""""synth_secs_per_round":${math.round(sFull / 512 * 1e6) / 1e6}}""")
    spark.stop()
  }
}
