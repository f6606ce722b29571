package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.sources.Versioned.TableSpec

/** Z-order vs lexicographic clustering, measured on the SAME data
  * (sf lineitem) with the SAME per-file zone maps over
  * (l_orderkey, l_partkey). Twin lakes — lex = compactPublish on
  * l_orderkey (stats on both columns), zed = zorderPublish on both —
  * probed three ways: the leading column, the SECOND column (the one
  * lexicographic clustering abandons), and the 2-D rectangle. The
  * claim: z-order buys second-column and rectangle pruning at a
  * bounded cost in leading-column pruning (the Morton locality
  * trade). Value identity asserted per probe across the twins. Run on
  * an otherwise-idle box; emits one JSON line. */
object ScaleZorder {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val files = sys.env.get("SPARK_GRAFT_ZONE_FILES")
      .flatMap(_.toIntOption).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("graft-scalezorder")
    val lex = s"$scratch/lex"; val zed = s"$scratch/zed"
    val cols = Seq("l_orderkey", "l_partkey")
    val lineitem = Tables(spark, sfDir, "lineitem").repartition(files)
    Versioned.publish(spark, lex,
      Seq(TableSpec("lineitem", lineitem, statsCols = cols)))
    Versioned.publish(spark, zed,
      Seq(TableSpec("lineitem", lineitem, statsCols = cols)))
    Versioned.compactPublish(spark, lex, "lineitem", Seq("l_orderkey"), files)
    Versioned.zorderPublish(spark, zed, "lineitem", cols, files)

    val m = Versioned.read(spark, zed, "lineitem")
      .agg(max(col("l_orderkey")), max(col("l_partkey"))).head
    val (maxK, maxP) = (m.getLong(0), m.getLong(1))
    val kR = (maxK * 2 / 10, maxK * 3 / 10) // ~10% of the key space
    val pR = (maxP * 3 / 10, maxP * 4 / 10)

    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("l_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }
    def nsel(base: String, ranges: Seq[(String, Any, Any)]): Int = {
      val st = graft.sources.ZoneMaps.readSidecar(spark,
        Versioned.prunedSelectionAt(spark, base, "lineitem", 2L,
          ranges.head._1, ranges.head._2, ranges.head._3).head._1).get
      graft.sources.ZoneMaps.selectFilesMulti(st, ranges).map(_.size).getOrElse(-1)
    }

    val probes = Seq(
      "orderkey" -> Seq(("l_orderkey", kR._1: Any, kR._2: Any)),
      "partkey"  -> Seq(("l_partkey", pR._1: Any, pR._2: Any)),
      "rect"     -> Seq(("l_orderkey", kR._1: Any, kR._2: Any),
                        ("l_partkey", pR._1: Any, pR._2: Any)))

    val sels = probes.map { case (nm, rs) =>
      s""""sel_$nm":{"lex":${nsel(lex, rs)},"zed":${nsel(zed, rs)},"files":$files}"""
    }
    val frags = probes.flatMap { case (nm, rs) =>
      var dLex: (Long, Long) = null
      var dZed: (Long, Long) = null
      val a = ScaleMeasure.measure(spark, s"lex_$nm") {
        dLex = digest(Versioned.readPrunedMulti(spark, lex, "lineitem", rs))
      }
      val b = ScaleMeasure.measure(spark, s"zed_$nm") {
        dZed = digest(Versioned.readPrunedMulti(spark, zed, "lineitem", rs))
      }
      require(dLex == dZed, s"twin divergence on $nm: $dLex vs $dZed")
      Seq(a, b)
    }
    println(s"""{"sf":"$sfDir",""" + (sels ++ frags).mkString(",") + "}")
    spark.stop()
  }
}
