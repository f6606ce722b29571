package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.sources.Versioned.TableSpec

/** Merge-on-read write amplification, measured: the SAME ~1% upsert
  * delta lands in twin sf lakes, once copy-on-write
  * ([[Versioned.mergePublish]] default) and once merge-on-read
  * (`rewrite = false`), then a ~1% tombstone removal and a compaction
  * land on the MOR lake. Claims under test:
  *   1. COW write bytes ≈ the whole table; MOR write bytes ≈ the
  *      delta — the ratio is the table/delta ratio, which at 100 TB
  *      is the difference between a feasible daily merge and not.
  *   2. The MOR read-path debt is real but bounded: reading through
  *      the 2-entry chain + tombstone costs measurably more tasks than
  *      the COW read, and compaction retires it (post-compaction read
  *      ≡ COW read shape).
  *   3. Value identity everywhere: COW and MOR serve bit-identical
  *      digests after the merge, and compaction changes nothing.
  * Run on an otherwise-idle box; emits one JSON line. */
object ScaleMor {

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

    val scratch = java.nio.file.Files.createTempDirectory("graft-scalemor")
    val cow = s"$scratch/cow"; val mor = s"$scratch/mor"
    val lineitem = Tables(spark, sfDir, "lineitem")
    // ~1% of orders' lineitems, amounts bumped — a plausible daily
    // correction batch; key = (orderkey, linenumber). The synthetic
    // corpus repeats line numbers within an order, so the delta is
    // deduped to one row per key (MERGE requires unique source keys);
    // both postures then replace each matched GROUP with that one row
    // — same semantics, compared below by digest.
    val keys = Seq("l_orderkey", "l_linenumber")
    val delta = lineitem.filter(col("l_orderkey") % 100 === 42)
      .withColumn("l_quantity", col("l_quantity") + 1)
      .dropDuplicates(keys)
    val tombs = lineitem.filter(col("l_orderkey") % 100 === 43)
      .select(keys.map(col): _*)

    def digest(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)),
        sum(col("l_quantity").cast("decimal(28,2)")).cast("double")).head
      (r.getLong(0), r.getDouble(1))
    }

    val frags = scala.collection.mutable.ArrayBuffer[String]()
    frags += ScaleMeasure.measure(spark, "publish_v1_twice") {
      Versioned.publish(spark, cow, Seq(TableSpec("lineitem", lineitem)))
      Versioned.publish(spark, mor, Seq(TableSpec("lineitem", lineitem)))
    }
    frags += ScaleMeasure.measure(spark, "cow_merge") {
      Versioned.mergePublish(spark, cow, "lineitem", delta, keys)
    }
    frags += ScaleMeasure.measure(spark, "mor_merge") {
      Versioned.mergePublish(spark, mor, "lineitem", delta, keys,
        rewrite = false)
    }
    var dCow: (Long, Double) = null
    var dMor: (Long, Double) = null
    frags += ScaleMeasure.measure(spark, "read_cow") {
      dCow = digest(Versioned.read(spark, cow, "lineitem"))
    }
    frags += ScaleMeasure.measure(spark, "read_mor_chain") {
      dMor = digest(Versioned.read(spark, mor, "lineitem"))
    }
    require(dCow == dMor, s"COW/MOR divergence: $dCow vs $dMor")
    frags += ScaleMeasure.measure(spark, "mor_remove") {
      Versioned.removePublish(spark, mor, "lineitem", tombs)
    }
    var dPre: (Long, Double) = null
    var dPost: (Long, Double) = null
    frags += ScaleMeasure.measure(spark, "read_mor_chain3") {
      dPre = digest(Versioned.read(spark, mor, "lineitem"))
    }
    frags += ScaleMeasure.measure(spark, "mor_compact") {
      Versioned.compactPublish(spark, mor, "lineitem",
        Seq("l_orderkey", "l_linenumber"), files = 16)
    }
    frags += ScaleMeasure.measure(spark, "read_compacted") {
      dPost = digest(Versioned.read(spark, mor, "lineitem"))
    }
    require(dPre == dPost,
      s"compaction changed values: $dPre vs $dPost")

    println(s"""{"sf":"$sfDir","delta_rows":${delta.count()},""" +
      s""""tomb_rows":${tombs.count()},""" + frags.mkString(",") + "}")
    spark.stop()
  }
}
