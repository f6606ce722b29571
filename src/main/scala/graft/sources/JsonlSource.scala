package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) document source — the de-facto
  * interchange format of LLM training corpora: one JSON object per
  * line, safely splittable, append-friendly.
  *
  * Posture matches the engine's CSV ETL (reference
  * `etl/03_transform_and_load.py:26-30` semantics, §2.1 S1 /
  * §2.3 coerce-to-null):
  *  - EXPLICIT schema, never `inferSchema` — inference is a full
  *    extra pass over the input before the real job (fatal at
  *    100 TB) and silently widens types between runs.
  *  - PERMISSIVE parse with a corrupt-record capture column: one
  *    malformed line must neither kill the ingest (FAILFAST) nor
  *    vanish (DROPMALFORMED). It lands in the quarantine frame with
  *    the raw line preserved for audit — the same clean/critical
  *    split the batch ETL applies to CSV rows.
  */
object JsonlSource {

  final case class Split(clean: DataFrame, quarantine: DataFrame)

  private val CorruptCol = "_graft_corrupt_line"

  /** Read `path` as JSONL against `schema`, split into parsed rows
    * and quarantined raw lines. Implemented as `text` scan +
    * `from_json` rather than `spark.read.json`: the file source's
    * corrupt-record column cannot be referenced on its own without
    * caching the whole input (Spark's QUERY_ONLY_CORRUPT_RECORD
    * restriction) — a non-starter when the input dwarfs any cache.
    * `from_json` carries the corrupt capture INSIDE the row struct,
    * so both sides of the split are plain column predicates over one
    * uncached scan. The quarantine frame keeps the full (null-padded)
    * parse plus `raw_line` so audits can count per-field damage. */
  def readSplit(spark: SparkSession, path: String,
      schema: StructType): Split = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    // a line is corrupt if it failed to parse entirely OR any field
    // failed to convert (from_json sets the capture field either way)
    val bad = col("r").isNull || col(s"r.$CorruptCol").isNotNull
    Split(
      clean = parsed.filter(!bad).select(col("r.*")).drop(CorruptCol),
      quarantine = parsed.filter(bad)
        .select(col("r.*"), col("value").as("raw_line")).drop(CorruptCol))
  }
}
