package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× row-count probe of the lake lifecycle family (q134–q140 +
  * q149/q150, r17: + q154 streamed-lifecycle and q156 partitioned
  * rolling-writer) — originally the one family whose SCALE evidence
  * was file-count axes only (r15).
  *
  * [[SynthCorpus]] scales the TEXT corpus and carries the relational
  * tables through unscaled (dims stay dims), so this harness builds
  * its own 10× lineitem/orders: each row replicated `factor`× with
  * the join/cluster keys offset by a per-replica stride (key ranges
  * grow ∝ rows, value distributions unchanged — the q134/q136 probes
  * derive their ranges from max(key), so they stay a fixed ~10%
  * fraction at both scales by construction).
  *
  * Each query runs COLD (bootstraps its fingerprint-keyed lake: the
  * full publish → maintain → probe lifecycle, bytes ∝ the table) and
  * WARM (lake committed: the serving read path only). The claims
  * under test at 10×: warm task counts track FILES × selectivity, not
  * rows (zone maps/z-order plan from the sidecar; the lake file count
  * is fixed at [[graft.queries.Relational]]'s ZonemapFiles); warm
  * input bytes track selectivity × rows (the honest axis that must
  * grow); CDC window diffs and MoR folds stay ∝ the change. Emits one
  * JSON line. */
object ScaleLake {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_LAKE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq(
      "q134_zonemap_scan", "q135_mor_scan", "q136_zorder_rect",
      "q138_tail_compact_scan", "q139_cdc_scan", "q140_zorder_tail_rect",
      "q149_zonemap_decimal", "q150_autocompact_scan", "q152_zonemap_date",
      "q153_bloom_point", "q154_takedown_stream", "q156_part_prune")

    def runAll(dir: String, tag: String): Seq[String] =
      queries.flatMap { q =>
        val fn = SparkEntry.queries(q)
        Seq("cold", "warm").map(phase =>
          ScaleMeasure.measure(spark, s"$q.$tag.$phase") {
            // noop sink: materialize every output column like a real
            // writer; cold bootstraps the lake, warm re-reads it
            fn(spark, dir).write.format("noop").mode("overwrite").save()
          })
      }

    // ---- 1× ----------------------------------------------------------
    val frags1 = runAll(sfDir, "x1")

    // ---- factor× lineitem/orders -------------------------------------
    val big = Files.createTempDirectory("graft-lake-synth").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val okStride = math.max(
      li.agg(max(col("l_orderkey"))).head.getLong(0),
      ord.agg(max(col("o_orderkey"))).head.getLong(0)) + 1
    val pkStride = li.agg(max(col("l_partkey"))).head.getLong(0) + 1
    li.withColumn("r", explode(expr(s"sequence(0, ${factor - 1})")))
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * okStride)
      .withColumn("l_partkey", col("l_partkey") + col("r") * pkStride)
      .drop("r")
      .write.parquet(s"$big/lineitem.parquet")
    ord.withColumn("r", explode(expr(s"sequence(0, ${factor - 1})")))
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * okStride)
      .drop("r")
      .write.parquet(s"$big/orders.parquet")
    val frags10 = runAll(big, s"x$factor")

    println(s"""{"sf":"$sfDir","factor":$factor,""" +
      (frags1 ++ frags10).mkString(",") + "}")
    spark.stop()
  }
}
