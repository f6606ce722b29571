package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the bucketed index artifacts: the SAME
  * published window-index files are probed twice by the q107 delta
  * scorer — once read through the catalog table that declares the
  * bucket layout, once read as plain parquet — so the only variable
  * is whether the engine KNOWS the layout. Broadcast is disabled
  * (the 100 TB posture: the index does not fit in one executor);
  * the declared layout should delete the index side's exchange, i.e.
  * the shuffle-write bytes drop by roughly the index's keyed size
  * while input bytes stay equal. Emits one JSON line for SCALE.md.
  */
object ScaleBucket {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{Dedup, TextOps}

    def measure(label: String)(work: => Unit): String =
      ScaleMeasure.measure(spark, label)(work)

    // the delta batch q107 scores, and the published bucketed artifact
    val batch = Tables(spark, sfDir, "documents")
      .filter(TextOps.uniformKeyOf(col("doc_id")) < Dedup.DeltaFracLit)
      .localCheckpoint() // identical input to both postures, built once
    val bucketed = Dedup.windowIndex(spark, sfDir) // ensures it exists

    // the same files, layout undeclared: plain parquet read
    val plainIdx = spark.read.parquet(
      Dedup.windowIndexPath(spark, sfDir))

    // materialize through sum(dup_windows): a bare count() lets the
    // optimizer ELIMINATE the probe join entirely (left join with a
    // unique-keyed aggregate side, no columns consumed)
    def probe(idx: org.apache.spark.sql.DataFrame): Unit = {
      Dedup.massAgainstWindowIndex(batch, idx)
        .agg(sum(col("dup_windows"))).collect()
      ()
    }
    // warm both paths first (JIT, page cache, codegen) so the measured
    // pair differs only in the declared layout
    probe(bucketed); probe(plainIdx)
    val withLayout = measure("probe_bucketed")(probe(bucketed))
    val withoutLayout = measure("probe_plain")(probe(plainIdx))
    println(s"""{"sf":"$sfDir","cpus":$cpus,$withLayout,$withoutLayout}""")
    spark.stop()
  }
}
