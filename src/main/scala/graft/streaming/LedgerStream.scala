package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The shared ingest scaffold of every batch-ledger streaming twin
  * (DSIR / KMV / tf-grain / CMS / LM scores): a parquet file stream,
  * AvailableNow trigger, checkpoint under the twin's own output dir,
  * and a per-batch sink. The posture — trigger choice, checkpoint
  * layout, batch-size bounding — lives HERE once; five verbatim
  * copies meant a posture fix applied to four of them would leave the
  * fifth silently divergent (review finding, r15). Each twin keeps
  * its own `writeBatch` (the semantics); this is only the plumbing. */
private[streaming] object LedgerStream {

  /** Start streaming `inDir`'s parquet files into `sink`, one call
    * per micro-batch. `maxFilesPerTrigger` bounds batch size (and, in
    * the specs, forces genuinely multi-batch execution). */
  def start(spark: SparkSession, inDir: String, outDir: String,
      schema: StructType, maxFilesPerTrigger: Int)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(sink)
      .start()
}
