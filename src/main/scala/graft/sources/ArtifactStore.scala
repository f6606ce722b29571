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
}
