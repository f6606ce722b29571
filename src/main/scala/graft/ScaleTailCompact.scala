package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.sources.Versioned.TableSpec

/** Partial vs full OPTIMIZE, measured: twin sf lakes take the SAME
  * history — one clustered base publish + five ~0.5% appends — then
  * one runs [[Versioned.compactPublish]] (full rewrite) and the other
  * [[Versioned.compactTailPublish]] (tail only, threshold below the
  * base dir's bytes). Claims under test:
  *   1. Full OPTIMIZE writes ≈ the whole table; tail OPTIMIZE writes
  *      ≈ the appended tail — the ratio is table/tail, which at 100 TB
  *      decides whether nightly maintenance is feasible at all.
  *   2. Both retire the read-path debt the same way where it matters:
  *      the post-compaction fold is 1 dir (full) vs 2 dirs (tail) and
  *      the task counts show it.
  *   3. Value identity: both lakes serve bit-identical digests after
  *      their compactions.
  * Run on an otherwise-idle box; emits one JSON line. */
object ScaleTailCompact {

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

    val scratch = java.nio.file.Files.createTempDirectory("graft-scaletail")
    val full = s"$scratch/full"; val tail = s"$scratch/tail"
    val keys = Seq("l_orderkey", "l_linenumber")
    val lineitem = Tables(spark, sfDir, "lineitem")
    val base = lineitem.filter(col("l_orderkey") % 200 >= 5)
      .repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    def slice(i: Int) = lineitem.filter(col("l_orderkey") % 200 === i)
      .dropDuplicates(keys)

    val frags = scala.collection.mutable.ArrayBuffer[String]()
    frags += ScaleMeasure.measure(spark, "publish_v1_twice") {
      for (b <- Seq(full, tail))
        Versioned.publish(spark, b,
          Seq(TableSpec("lineitem", base, statsCols = Seq("l_orderkey"))))
    }
    frags += ScaleMeasure.measure(spark, "append_5_twice") {
      for (b <- Seq(full, tail); i <- 0 until 5)
        Versioned.appendPublish(spark, b, "lineitem", slice(i))
    }

    def digest(b: String): (Long, Double) = {
      val r = Versioned.read(spark, b, "lineitem").agg(count(lit(1)),
        sum(col("l_quantity").cast("decimal(28,2)")).cast("double")).head
      (r.getLong(0), r.getDouble(1))
    }
    val fs = new org.apache.hadoop.fs.Path(tail)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(
      s"$tail/_data/lineitem-00000001")).getLength

    frags += ScaleMeasure.measure(spark, "optimize_full") {
      Versioned.compactPublish(spark, full, "lineitem",
        Seq("l_orderkey"), files = 16)
    }
    frags += ScaleMeasure.measure(spark, "optimize_tail") {
      val v = Versioned.compactTailPublish(spark, tail, "lineitem",
        sortBy = Seq("l_orderkey"), files = 2, smallBytes = baseBytes)
      require(v == 7L, s"tail compaction expected v7, got $v")
    }
    var dFull: (Long, Double) = null
    var dTail: (Long, Double) = null
    frags += ScaleMeasure.measure(spark, "read_full") {
      dFull = digest(full)
    }
    frags += ScaleMeasure.measure(spark, "read_tail") {
      dTail = digest(tail)
    }
    require(dFull == dTail, s"twin divergence: $dFull vs $dTail")
    val nDirsTail = Versioned
      .tableFiles(spark, tail, "lineitem",
        Versioned.currentVersion(spark, tail).get)
      .map(p => p.substring(0, p.lastIndexOf('/'))).distinct.size

    println(s"""{"sf":"$sfDir","tail_dirs_after":$nDirsTail,""" +
      frags.mkString(",") + "}")
    spark.stop()
  }
}
