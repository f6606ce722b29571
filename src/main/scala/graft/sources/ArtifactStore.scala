package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-once publication of content-addressed derived tables — the
  * seam behind the persisted signature index
  * ([[graft.queries.Dedup.signatureIndex]]) and PQ code table
  * ([[graft.queries.Similarity.pqCodesIndex]]).
  *
  * Contract: the caller keys the output path by a fingerprint of the
  * SOURCE data ([[graft.Tables.fileFingerprint]] — file metadata, one
  * listing, never a scan), so a changed source produces a new path and
  * staleness is impossible by construction; the builder must be
  * deterministic, so a republish or a lost publish race yields a
  * value-identical table. Publish is write-to-staging + atomic rename
  * (the [[Lake]] swap discipline); an `out` directory without its
  * `_SUCCESS` marker is a crashed publish and is cleared before
  * retrying.
  */
object ArtifactStore {

  /** The artifact at `out`, if a completed publish exists there —
    * never builds. The probe incremental maintenance runs against its
    * previous version ([[graft.queries.Dedup.windowIndexAt]]): a
    * present predecessor means merge-the-delta, an absent one means
    * full build. */
  def readIfPresent(spark: SparkSession, out: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(outPath, "_SUCCESS")))
      Some(spark.read.parquet(out))
    else None
  }

  /** Whether a completed publish exists at `out` — the `_SUCCESS`
    * probe alone, no reader construction: the cheap existence check a
    * resume-from-newest walk wants (one FS call per probe, never a
    * parquet footer read). */
  def exists(spark: SparkSession, out: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(new Path(outPath, "_SUCCESS"))
  }

  /** [[readIfPresent]] through the bucketed-catalog registration: the
    * returned frame ADVERTISES its hash-partitioned layout, so a
    * downstream join or aggregate on `bucketCol` plans without an
    * exchange on this side. The plain [[readIfPresent]] over the same
    * files would read fine but re-shuffle — which is exactly the
    * standing-side exchange incremental maintenance exists to avoid. */
  def readIfPresentBucketed(spark: SparkSession, out: String,
      bucketCol: String, buckets: Int): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(outPath, "_SUCCESS")))
      Some(bucketedTable(spark, out, bucketCol, buckets))
    else None
  }

  /** Read the table at `out`, building and atomically publishing it
    * first when absent. `build` is evaluated only on a miss. */
  def readOrPublish(spark: SparkSession, out: String)
      (build: => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
      val staging = new Path(outPath.getParent,
        s".staging-${outPath.getName}-${java.util.UUID.randomUUID}")
      build.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      fs.mkdirs(outPath.getParent)
      // an `out` without _SUCCESS is a crashed publish — clear it; a
      // failed rename means a concurrent winner published a
      // value-identical table — drop ours and read theirs
      if (fs.exists(outPath) && !fs.exists(new Path(outPath, "_SUCCESS")))
        fs.delete(outPath, true)
      if (!fs.rename(staging, outPath)) fs.delete(staging, true)
    }
    spark.read.parquet(out)
  }

  /** [[readOrPublish]] with a BUCKETED layout: the artifact is written
    * hash-partitioned (and sorted) by `bucketCol` into `buckets`
    * files, and read back through a catalog table that declares that
    * layout — so every consumer joining or aggregating on `bucketCol`
    * gets the index side WITHOUT an Exchange: only the probe (delta)
    * side shuffles. That is the asymmetry that matters at 100 TB: the
    * standing index is the big side, the daily batch the small one,
    * and a plain-parquet artifact forces the big side through a
    * corpus-sized exchange on every probe.
    *
    * Mechanics, since path-based writes cannot carry bucket metadata:
    * the frame is written via a throwaway EXTERNAL catalog table at a
    * staging path (Spark's `bucketBy` encodes the bucket id in each
    * file name), the table entry is dropped (external ⇒ files stay),
    * and the staging dir promotes by the same atomic rename as
    * [[readOrPublish]]. Readers re-register a session-local external
    * table over the published path declaring the same CLUSTERED BY
    * spec — file names carry the bucket assignment, so the layout
    * survives JVMs while the catalog entry (in-memory) does not.
    * Callers must fold the bucket parameters into the artifact path:
    * a layout change must be a new artifact, never a reinterpreted
    * one. */
  def readOrPublishBucketed(spark: SparkSession, out: String,
      bucketCol: String, buckets: Int, prealigned: Boolean = false)
      (build: => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
      val staging = new Path(outPath.getParent,
        s".staging-${outPath.getName}-${java.util.UUID.randomUUID}")
      val stageTable =
        s"graft_stage_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      // repartition on the bucket key first: bucketBy splits each
      // WRITE TASK's rows across its buckets, so an unaligned upstream
      // partitioning writes tasks×buckets small files; pre-hashing on
      // the same key (same Murmur3 HashPartitioning) collapses that to
      // one file per bucket. A PREALIGNED builder promises every input
      // partition already holds exactly one bucket's rows (e.g. a
      // bucketed previous artifact unioned with a bucket-repartitioned
      // delta) — skipping the repartition here is what lets an
      // incremental maintenance write O(|delta|) shuffle instead of
      // re-exchanging the standing index; the cost is one file per
      // CONTRIBUTING PARTITION per bucket (bucket ids ride in file
      // names, so multi-file buckets stay valid bucketed reads).
      val frame = if (prealigned) build
        else build.repartition(buckets,
          org.apache.spark.sql.functions.col(bucketCol))
      frame
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .option("path", staging.toString)
        .saveAsTable(stageTable)
      spark.sql(s"DROP TABLE IF EXISTS $stageTable") // external: files stay
      fs.mkdirs(outPath.getParent)
      if (fs.exists(outPath) && !fs.exists(new Path(outPath, "_SUCCESS")))
        fs.delete(outPath, true)
      if (!fs.rename(staging, outPath)) fs.delete(staging, true)
    }
    bucketedTable(spark, out, bucketCol, buckets)
  }

  /** Session-local registration of a published bucketed artifact (see
    * [[readOrPublishBucketed]]). Idempotent per session; the table
    * name is derived from the path, so distinct artifacts never
    * collide and a re-read is a catalog hit.
    *
    * HARD INVARIANT: a published artifact path is immutable — the
    * content-addressing contract (path = fingerprint of the source +
    * layout parameters) makes in-place replacement a caller bug, never
    * a supported operation. The catalog entry is still guarded against
    * it: the `_SUCCESS` mtime at registration is recorded in the table
    * properties, and a registration that finds a DIFFERENT mtime under
    * the same path (a deleted-and-republished artifact in one session)
    * drops and recreates the entry from the current parquet footers
    * instead of serving stale schema/layout metadata. */
  private def bucketedTable(spark: SparkSession, out: String,
      bucketCol: String, buckets: Int): DataFrame = {
    import org.apache.hadoop.fs.Path
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(out.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(16)
    val name = s"graft_art_$digest"
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    val mtime = fs.getFileStatus(new Path(outPath, "_SUCCESS"))
      .getModificationTime.toString
    if (spark.catalog.tableExists(name)) {
      val recorded = spark.sql(s"SHOW TBLPROPERTIES $name")
        .where(org.apache.spark.sql.functions.col("key") ===
          "graft.success.mtime")
        .collect().headOption.map(_.getString(1))
      if (!recorded.contains(mtime))
        spark.sql(s"DROP TABLE $name")
    }
    if (!spark.catalog.tableExists(name)) {
      val schemaDdl = spark.read.parquet(out).schema.toDDL
      spark.sql(
        s"""CREATE TABLE $name ($schemaDdl) USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
           |INTO $buckets BUCKETS
           |LOCATION '$out'
           |TBLPROPERTIES ('graft.success.mtime' = '$mtime')""".stripMargin)
    }
    spark.table(name)
  }
}
