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

  /** `events.ts` has shipped in two generations of the testdata:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — µs is
    * its max precision — so the legacy conf reads it as a raw nanos
    * long) and plain timestamp[us]. Branch on the type the footer
    * actually resolves to, not on an assumption: a long is nanos and
    * gets truncated to µs (matching DuckDB's µs semantics), a
    * timestamp passes through. Either way callers see one contract:
    * `ts: TimestampType` at µs precision. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** ts-layout adaptation shared by the batch and streaming loaders. */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: ns epochs (~1.7e18) overflow double precision
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        // TIMESTAMP_NTZ: same µs instants; every session here runs UTC,
        // so the cast is a re-tag, not a clock shift
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

  /** Streaming twin of `events`: `readStream` needs an explicit schema,
    * so borrow the batch reader's footer-resolved one, then apply the
    * same ts adaptation. `path` may be the parquet file itself (file
    * streams list a directory, so a file streams its parent under a
    * glob) or a directory of arriving files. */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val f = new java.io.File(path)
    val (base, glob) =
      if (f.isFile) (f.getParent, Some(f.getName)) else (path, None)
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
    normalizeEventsTs(
      glob.fold(reader)(g => reader.option("pathGlobFilter", g)).parquet(base))
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
