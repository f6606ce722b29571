package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted partition-wise.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[StubDecoder]]) — what is real
  * and tested is everything Spark-side: the binary column schema, the
  * `mapPartitions` batch shape (one decoder init per partition, not
  * per row — exactly how a JNI/FFmpeg decoder would be amortized), the
  * typed output schema, and partition preservation.
  */
object Multimodal {

  /** A decoded media record: fake dims + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      features: Array[Float])

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * from the payload bytes so tests are exact. A real deployment
    * swaps `decode` for the codec call; the Spark plumbing around it
    * is unchanged. */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      // fake "dimensions" derived from content
      val width = 64 + (math.abs(payload.headOption.getOrElse(0: Byte).toInt) % 192)
      val height = 64 + (n % 192)
      // block-sum "features": 8 buckets of byte sums, normalized
      val feats = new Array[Float](8)
      var i = 0
      while (i < n) {
        feats(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      MediaFeatures(docId, width, height, n, feats)
    }
  }

  /** Documents with the text re-encoded as a binary payload column +
    * metadata — the storage schema for media at scale (payload stays
    * opaque/columnar; metadata is prunable without touching bytes). */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text").cast("binary")).as("byte_len"),
        col("source").as("origin"),
        col("lang").as("lang_tag")).as("meta"))

  // --------------------------------------------------------------- q24
  /** Metadata pass over binary payloads: length + content hash —
    * pure column ops on the binary type, oracle-checkable. */
  def q24MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      col("meta.origin").as("origin"))
      .orderBy(col("doc_id"))

  // --------------------------------------------------------------- q25
  /** Partition-wise decode + feature extraction. `mapPartitions` (not
    * per-row UDF) so a real decoder initializes once per partition and
    * processes a batch — the Spark-side shape of a Pandas-UDF/Arrow
    * batch kernel, in Scala. Rows-only check + MultimodalSpec. */
  def q25MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] = withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    payloads
      .mapPartitions { it =>
        // per-partition decoder init would happen here (amortized)
        it.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
      }
      .toDF()
      .withColumn("feat_sum",
        aggregate(col("features"), lit(0.0),
          (acc, x) => acc + x.cast("double")))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_multimodal_meta"     -> (q24MultimodalMeta _),
    "q25_multimodal_features" -> (q25MultimodalFeatures _))

  val oracle: Map[String, String] = Map(
    "q24_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | md5(text) AS payload_md5, source AS origin
        |FROM documents ORDER BY doc_id""".stripMargin)
}
