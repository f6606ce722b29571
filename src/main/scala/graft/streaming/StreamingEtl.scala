package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.etl.ChargesEtl

/** Streaming ingest variant of the reference ETL (SURVEY §3.1 made
  * incremental): CSV files arriving in a directory stream through the
  * SAME transform + quarantine split as the batch pipeline, and
  * `foreachBatch` routes each micro-batch to the clean/critical sinks.
  *
  * `foreachBatch` is the right seam because the split produces TWO
  * outputs from one stream — a plain streaming sink can't fork — and
  * because it reuses the batch transform verbatim: one definition,
  * both execution modes (same guarantee StreamingDaily makes for the
  * aggregate). At scale the sinks would be a transactional table
  * format; append-mode parquet keeps the demo self-contained.
  *
  * The group-wise name fill (A1) is deliberately NOT applied here —
  * it is a cross-row operation whose "first in file order" semantics
  * do not extend to an unbounded stream (each batch would fill from a
  * different prefix). Streamed rows keep their raw names; the fill
  * runs in the batch compaction pass, where the reference's semantics
  * are well-defined.
  */
object StreamingEtl {

  /** Start the streaming split over `inDir` (a directory of CSVs). */
  def start(spark: SparkSession, inDir: String, outDir: String)
      : StreamingQuery = {
    val raw = spark.readStream
      .option("header", "true")
      .schema(ChargesEtl.rawSchema)
      .csv(inDir)
      // streaming rows have no file order; the fill that needs it is
      // batch-only (see scaladoc) so any constant works here
      .withColumn("_row_id", lit(0L))

    val masked = ChargesEtl.maskReasons(ChargesEtl.transform(raw))
    val isCritical = col("_critical_reason") =!= ""

    masked.writeStream
      .outputMode("append")
      // checkpoint => exactly-once file processing across restarts
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        b.filter(isCritical)
          .drop("_r_id", "_r_company_id", "_r_amount", "_r_created_at",
            "_r_status", "_row_id")
          .write.mode(SaveMode.Append).parquet(s"$outDir/critical")
        b.filter(!isCritical)
          .drop("_critical_reason", "_r_id", "_r_company_id", "_r_amount",
            "_r_created_at", "_r_status", "_row_id")
          .write.mode(SaveMode.Append).parquet(s"$outDir/clean")
        b.unpersist()
        ()
      }
      .start()
  }
}
