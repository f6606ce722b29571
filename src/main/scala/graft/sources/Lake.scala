package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table layout for the 100 TB posture (SURVEY §4.2 partition pruning,
  * §7.3 step 8).
  *
  * Facts are laid out date-partitioned (`part_date=YYYY-MM-DD/` dirs):
  * a date-ranged query then reads only matching directories — the scan
  * shows `PartitionFilters` and I/O scales with the date range, not
  * the table. Within partitions, files stay near the 128 MB scan
  * target via a pre-write `repartition` on the partition column (one
  * shuffle, no small-files problem).
  *
  * Bucketing (`bucketBy` on the join key) is the companion layout for
  * co-located fact⋈fact joins — it needs a catalog (`saveAsTable`), so
  * it ships as an opt-in here and is exercised in LakeSpec.
  */
object Lake {

  /** Write `df` date-partitioned by `tsCol`'s date. zstd: the right
    * storage/scan-cpu tradeoff for cold analytical data at scale. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("part_date", to_date(col(tsCol)))
      .repartition(col("part_date")) // 1 writer set per partition dir
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("part_date")
      .parquet(path)

  /** Read back; date predicates on `part_date` prune directories. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Small-files compaction: rewrite a parquet dir into files near the
    * 128 MB scan target. Streaming appends and partitioned writes both
    * accrete small files; compaction restores scan efficiency (fewer
    * tasks, fuller columnar pages). Staging + atomic rename so readers
    * never see a half-compacted table. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, (bytes / targetFileBytes).toInt)
    val staging = path + ".compacting"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(staging)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }

  /** Bucketed catalog table for shuffle-free equi-joins on `keyCol`:
    * two tables bucketed the same way join with zero exchange. */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
      table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
}
