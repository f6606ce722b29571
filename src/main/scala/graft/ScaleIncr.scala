package graft

import org.apache.spark.sql.SparkSession

/** Marginal-cost evidence for the incremental index chains
  * (q113/q114/q115): measures ONE version bump's maintenance —
  * `merge(index(v−1), derive(delta))` — against the from-scratch
  * rebuild of the same version, on whatever corpus
  * `SPARK_GRAFT_SF_DIR` points at (pair with [[SynthCorpus]] for
  * beyond-sf0.1 scale). The v2 window-index artifact is deleted first
  * so the maintenance step itself is timed, not a cache read; the
  * chain origin (v1) is kept, exactly the state a daily ingest is in
  * when a new version lands. Emits one JSON line.
  */
object ScaleIncr {

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
    import graft.queries.Dedup

    val base = Dedup.versionedCorpus(spark, sfDir)
    Dedup.windowIndexAt(spark, base, 1L) // chain origin stays cached

    def delete(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    def measure(label: String)(work: => Unit): String =
      ScaleMeasure.measure(spark, label)(work)

    // maintenance step in isolation: v2 artifact absent, v1 present —
    // the daily-ingest state; windowIndexAt publishes the merge
    delete(Dedup.windowIndexArtifact(base, 2L))
    val incr = measure("incremental_maintenance") {
      Dedup.windowIndexAt(spark, base, 2L).count()
    }
    // comparator: the same artifact from scratch (prior chain deleted
    // so the fallback branch runs — the pre-r14 economics)
    delete(Dedup.windowIndexArtifact(base, 2L))
    delete(Dedup.windowIndexArtifact(base, 1L))
    val full = measure("full_rebuild") {
      Dedup.windowIndexAt(spark, base, 2L).count()
    }
    // restore the chain for whoever runs next
    Dedup.windowIndexAt(spark, base, 1L)

    // the CLUSTER chain (r14): same daily-ingest framing. The
    // incremental step is star-contraction + a delta-restricted band
    // probe; the comparator is the fallback full build — whole-corpus
    // band self-join + closure. Both read the same signature index
    // artifact, so the measured difference is exactly the maintenance
    // law's value, not I/O noise.
    Dedup.signatureIndexAt(spark, base, 1L)
    Dedup.signatureIndexAt(spark, base, 2L)
    Dedup.clusterAssignmentAt(spark, base, 1L)
    delete(Dedup.clusterArtifact(base, 2L))
    val ccIncr = measure("cc_incremental") {
      Dedup.clusterAssignmentAt(spark, base, 2L).count()
    }
    delete(Dedup.clusterArtifact(base, 2L))
    delete(Dedup.clusterArtifact(base, 1L))
    val ccFull = measure("cc_full_rebuild") {
      Dedup.clusterAssignmentAt(spark, base, 2L).count()
    }
    Dedup.clusterAssignmentAt(spark, base, 1L) // restore
    println(s"""{"sf":"$sfDir","cpus":$cpus,$incr,$full,$ccIncr,$ccFull}""")
    spark.stop()
  }
}
