package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Always parquet + explicit path; schema comes from the files'
  * footers (columnar, self-describing) so scans get column pruning
  * and predicate pushdown for free. At 100 TB these would be
  * catalog tables partitioned on their date keys — the loader is the
  * single seam where that swap happens.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects (µs is its max precision). Read nanos as long via the
    * legacy conf, then truncate to a µs timestamp — matching DuckDB's
    * `CAST(ts AS TIMESTAMP)` truncation so oracle values line up. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      // integer `div`, not `/`: ns epochs (~1.7e18) overflow double precision
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view so `spark.sql` queries and the
    * DuckDB oracle share one set of table names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Metadata fingerprint of a table path — md5 over every file's
    * (path, length, mtime). The content-address key for derived
    * artifacts (signature index, subword vocabulary): a changed table
    * produces a new key, so staleness is impossible by construction
    * and the check costs one listing, never a scan. */
  def fileFingerprint(spark: SparkSession, path: String): String = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).sortBy(_.getPath.toString)
      else Array(fs.getFileStatus(p))
    val s = statuses
      .map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
