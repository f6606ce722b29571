package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Metadata-plane scaling of the versioned lake — the r18 probe for
  * VERDICT r17 "Next #7".
  *
  * `/lake/status`, `/lake/history`, and version GC are walks over
  * version markers, ref files, and data dirs — O(surviving versions ×
  * tables) metadata reads, entirely independent of data bytes. The
  * scale question is whether a lake that has absorbed 10× the
  * PUBLISHES (many small streaming appends — the file-count explosion
  * case) still answers its ops endpoints and commits its next publish
  * in flat time, or whether history accretes into every call.
  *
  * The design answer is retention + auto-compaction: GC keeps only
  * `retention` version manifests (and the dirs they reference), and
  * the compaction policy folds the MoR chain, so BOTH the history walk
  * and the standing dir count are bounded by policy knobs, not by
  * lifetime publish count. This probe measures it: two lakes, same
  * knobs (retention 10, auto-compact 5), 30 vs 300 tiny appends;
  * cells are the status walk (current version's chain depths), the
  * history walk (every surviving version's chains — exactly what
  * `GET /lake/history` runs), the tail publish latency (includes GC),
  * and the standing data-dir count. Flat ⇒ bounded; emits one JSON
  * line. */
object ScaleManifest {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft-scale-manifest").toString

    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, math.round((System.nanoTime() - t0) / 1e3) / 1e3)
    }

    def build(nPub: Int): (String, Double) = {
      val base = s"$root/lake$nPub"
      Versioned.publish(spark, base, Seq(Versioned.TableSpec("t",
        spark.range(0, 1000).select(col("id").as("k"),
          (col("id") * 2).as("v")))))
      Versioned.setRetention(spark, base, 10)
      Versioned.setAutoCompact(spark, base, 5)
      val tail = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to nPub).foreach { i =>
        val (_, t) = ms(Versioned.appendPublish(spark, base, "t",
          spark.range(i * 10000L, i * 10000L + 50)
            .select(col("id").as("k"), (col("id") * 2).as("v"))))
        if (i > nPub - 5) tail += t
      }
      (base, math.round(tail.sum / tail.size * 1000) / 1000.0)
    }

    /** The `/lake/status` walk: current version's tables + chain
      * depths (pure ref metadata). */
    def statusWalk(base: String): Int = {
      val v = Versioned.currentVersion(spark, base).get
      Versioned.listTables(spark, base, v)
        .map(t => Versioned.entryChainAt(spark, base, t, v).size).sum
    }

    /** The `/lake/history` walk: every surviving version's tables +
      * chains — the manifest-level change audit. */
    def historyWalk(base: String): Int =
      Versioned.listVersions(spark, base).sorted.map { v =>
        Versioned.listTables(spark, base, v)
          .map(t => Versioned.entryChainAt(spark, base, t, v).size).sum
      }.sum

    def dataDirs(base: String): Int = {
      val d = new java.io.File(s"$base/_data")
      if (!d.exists()) 0 else d.list().length
    }

    def cells(nPub: Int): String = {
      val (base, tailPubMs) = build(nPub)
      val (chainNow, statusMs) = ms(statusWalk(base))
      val (chainAll, historyMs) = ms(historyWalk(base))
      val surviving = Versioned.listVersions(spark, base).size
      s""""publishes":$nPub,"surviving_versions":$surviving,""" +
        s""""status_ms":$statusMs,"history_ms":$historyMs,""" +
        s""""tail_publish_ms":$tailPubMs,""" +
        s""""chain_entries_current":$chainNow,""" +
        s""""chain_entries_all_versions":$chainAll,""" +
        s""""data_dirs":${dataDirs(base)},""" +
        s""""rows":${Versioned.read(spark, base, "t").count()}"""
    }

    val oneX = cells(30)
    val tenX = cells(300)
    println(s"""{"x1":{$oneX},"x10":{$tenX}}""")
    spark.stop()
  }
}
