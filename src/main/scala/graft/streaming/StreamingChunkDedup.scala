package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.TextOps

/** Streaming span-level dedup: q56's corpus-wide chunk dedup
  * ([[TextOps.chunkify]]/[[TextOps.firstOccurrence]]/
  * [[TextOps.reassemble]] — one definition, both modes) applied at
  * ingest, against a PERSISTENT chunk ledger that spans micro-batches
  * and restarts. A chunk that ever reached the corpus never enters it
  * again; each arriving document is rewritten to its surviving chunks.
  *
  * State design: instead of a state store holding every chunk (the
  * ledger grows with the corpus — unbounded for mapGroupsWithState),
  * seen-chunk hashes live in a parquet ledger directory partitioned by
  * `graft_batch_id`. Each batch
  *  1. first-occurrence-dedups WITHIN the batch (q56's aggregate),
  *  2. left-anti joins against the ledger EXCLUDING its own batch
  *     partition — the exclusion is what makes crash-replay exact:
  *     a redelivered batch does not see the chunks its failed attempt
  *     already registered, so it reproduces the same survivors —
  *  3. overwrites its own ledger partition and clean-output partition.
  * Deterministic replay + idempotent overwrite = exactly-once results,
  * the same seam as [[StreamingQuality]]/[[StreamingDecontam]].
  *
  * Scale: the anti-join is a hash join keyed on the md5 chunk hash
  * (128-bit — no birthday risk at corpus scale); the ledger is
  * hash-compact (one 32-char string per distinct chunk ever seen) and
  * append-only, so ledger partitions stay prunable by batch. Ordering
  * note: "first occurrence" under streaming means first ARRIVAL
  * (earlier batch wins); within a batch, q56's (doc_id, idx) rule.
  */
object StreamingChunkDedup {

  /** Ledger hashes seen by batches OTHER than `excludeBatch` (see
    * class doc for why replay must not see its own prior attempt).
    * Missing/empty ledger → empty frame. */
  private[graft] def readLedger(spark: SparkSession, ledgerDir: String,
      excludeBatch: Long): DataFrame = {
    val p = new Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasOther = fs.exists(p) && fs.listStatus(p).exists { st =>
      st.isDirectory && st.getPath.getName.startsWith("graft_batch_id=") &&
        st.getPath.getName != s"graft_batch_id=$excludeBatch"
    }
    if (!hasOther) {
      import spark.implicits._
      Seq.empty[String].toDF("h")
    } else
      spark.read.parquet(ledgerDir)
        .filter(col("graft_batch_id") =!= excludeBatch)
        .select(col("h"))
  }

  /** Dedup one micro-batch against the ledger, idempotently on
    * `batchId`. Package-visible seam so the spec can prove replay and
    * cross-batch suppression without a running stream. */
  private[graft] def writeBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, outDir: String, chunkWords: Int = 10): Unit = {
    val ledgerDir = s"$outDir/ledger"
    val inBatch = TextOps.firstOccurrence(TextOps.chunkify(batch, chunkWords))
      .withColumn("h", md5(col("chunk")))
    val fresh = inBatch
      .join(readLedger(spark, ledgerDir, batchId), Seq("h"), "left_anti")
      .persist()
    fresh.select(col("h"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$ledgerDir/graft_batch_id=$batchId")
    val perDoc = TextOps.reassemble(fresh.drop("h"))
    batch.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/clean/graft_batch_id=$batchId")
    fresh.unpersist()
    ()
  }

  /** Read the deduplicated output back as one frame. */
  def readSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/clean").drop("graft_batch_id")

  /** Reserved ledger partition holding compacted history. Negative on
    * purpose: no real batchId collides with it, and `readLedger`'s
    * exclusion (`=!= batchId`) always keeps it visible. */
  private val CompactedBatch = -1L

  /** Merge old per-batch ledger partitions into the reserved
    * compacted partition. One dir per micro-batch is correct but
    * accumulates forever — partition discovery over tens of
    * thousands of dirs is its own scale problem. Compaction folds
    * everything EXCEPT the newest `keepLast` batch partitions (and
    * dedups hashes while at it).
    *
    * Safety: replay only ever redelivers batches at the stream's
    * checkpoint frontier, so partitions older than `keepLast` batches
    * can never be replayed — folding them into the compacted
    * partition (which every batch's anti-join sees) preserves
    * exactly-once. Folding a batch still inside the replay horizon
    * WOULD break it (its chunks would become visible to its own
    * replay); `keepLast` must cover the frontier, and the default of
    * 2 does for AvailableNow/once-per-trigger streams. The fold
    * itself is crash-safe: the source dirs stay on disk until the new
    * compacted partition is live (a checked backup-swap, not
    * delete-then-rename), so a crash at any step leaves every hash
    * recoverable — the entry recovery below finishes an interrupted
    * swap, and at worst duplicate hashes remain (harmless for an
    * anti-join probe), never missing ones. Run between triggers, not
    * concurrently with a batch write — mid-swap the compacted
    * partition is briefly absent from discovery. */
  def compactLedger(spark: SparkSession, outDir: String,
      keepLast: Int = 2): Unit = {
    val ledgerDir = s"$outDir/ledger"
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val target = new Path(root, s"graft_batch_id=$CompactedBatch")
    // underscore names: partition discovery ignores them, where a
    // `graft_batch_id=-1.swapbackup` dir (Lake's naming) would poison
    // the ledger's partition-column inference
    val staging = new Path(root, "_compact_staging")
    val backup = new Path(root, "_compact_backup")
    // recovery from a prior crash between the two swap renames: the
    // backup IS the compacted partition (and the foldable sources it
    // merged are still on disk — they are only deleted after promote)
    if (!fs.exists(target) && fs.exists(backup) &&
        !fs.rename(backup, target))
      sys.error(s"compact: could not restore $backup to $target")
    fs.delete(backup, true)  // stale from a completed prior swap
    fs.delete(staging, true) // stale from a crashed prior write
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("graft_batch_id="))
      .map(st => st.getPath.getName.stripPrefix("graft_batch_id=").toLong)
    val foldable = parts.filter(_ != CompactedBatch)
      .sorted.dropRight(keepLast)
    if (foldable.isEmpty) return
    val srcDirs = (CompactedBatch +: foldable)
      .map(b => new Path(root, s"graft_batch_id=$b"))
      .filter(fs.exists(_)).map(_.toString)
    val merged = spark.read.parquet(srcDirs: _*).select(col("h")).distinct()
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // checked backup-swap (Lake.promoteStaging's discipline): staging
    // holds old-compacted ∪ foldable, so whichever rename a crash
    // interrupts, every hash still exists in target, backup+sources,
    // or staging+sources — and recovery above restores discovery
    if (fs.exists(target) && !fs.rename(target, backup))
      sys.error(s"compact: could not move $target aside to $backup")
    if (!fs.rename(staging, target)) {
      if (fs.exists(backup)) fs.rename(backup, target)
      sys.error(s"compact: could not promote $staging to $target")
    }
    fs.delete(backup, true)
    foldable.foreach(b =>
      fs.delete(new Path(root, s"graft_batch_id=$b"), true))
  }

  /** Start the deduplicating ingest over a directory of parquet
    * document files. */
  def start(spark: SparkSession, inDir: String, outDir: String,
      schema: StructType, chunkWords: Int = 10): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch.sparkSession, batch, batchId, outDir, chunkWords)
      }
      .start()
}
