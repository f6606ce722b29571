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

  /** A decoded media record: fake dims + fixed-width feature vector.
    * `lane_sums` is the exact integer form of the features (unsigned
    * byte sums per lane) — kept alongside the float view so downstream
    * checks can be bit-exact while consumers still get floats. */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      lane_sums: Array[Long],
      features: Array[Float])

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * from the payload bytes so tests are exact. A real deployment
    * swaps `decode` for the codec call; the Spark plumbing around it
    * is unchanged. All arithmetic is integer (unsigned-byte lane sums,
    * normalized by one float division at the end) so the decode is
    * reproducible in any engine — the property the oracle check needs. */
  object StubDecoder {
    final val Lanes = 8
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      // fake "dimensions" derived from content (unsigned first byte)
      val width = 64 + ((payload.headOption.getOrElse(0: Byte) & 0xff) % 192)
      val height = 64 + (n % 192)
      // block-sum "features": 8 lanes of unsigned byte sums
      val lanes = new Array[Long](Lanes)
      var i = 0
      while (i < n) {
        lanes(i % Lanes) += (payload(i) & 0xff)
        i += 1
      }
      val feats = new Array[Float](Lanes)
      i = 0
      while (i < Lanes) { feats(i) = lanes(i).toFloat / 255.0f; i += 1 }
      MediaFeatures(docId, width, height, n, lanes, feats)
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
    * batch kernel, in Scala.
    *
    * The emitted columns are oracle-safe scalars: the exact integer
    * lane sums (comma-joined) instead of the raw `array<float>` — a
    * raw array column is unsortable/unhashable for the driver's pandas
    * compare, and the integer form is bit-exact across engines anyway.
    * `feat_sum` is one IEEE double division of the total byte sum. */
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
      .select(
        col("doc_id"), col("width"), col("height"), col("n_bytes"),
        concat_ws(",", transform(col("lane_sums"), _.cast("string")))
          .as("lane_sums"),
        (aggregate(col("lane_sums"), lit(0L), (a, x) => a + x).cast("double")
          / lit(255.0)).as("feat_sum"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_multimodal_meta"     -> (q24MultimodalMeta _),
    "q25_multimodal_features" -> (q25MultimodalFeatures _))

  val oracle: Map[String, String] = Map(
    "q24_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | md5(text) AS payload_md5, source AS origin
        |FROM documents ORDER BY doc_id""".stripMargin,
    // StubDecoder is pure byte math over the UTF-8 payload; the corpus
    // is ASCII (verified octet_length == length), so per-char codepoints
    // ARE the payload bytes and the decode is fully SQL-expressible.
    "q25_multimodal_features" ->
      """WITH b AS (
        | SELECT doc_id, length(text) AS n_bytes,
        |  list_transform(range(1, length(text) + 1),
        |                 i -> ascii(substr(text, i, 1))) AS bytes
        | FROM documents),
        |l AS (
        | SELECT doc_id, n_bytes,
        |  64 + (bytes[1] % 192) AS width,
        |  64 + (n_bytes % 192) AS height,
        |  list_transform(range(0, 8), k -> coalesce(
        |    list_sum(list_transform(range(1 + CAST(k AS INT), CAST(n_bytes AS INT) + 1, 8),
        |                            i -> bytes[i])), 0)) AS lanes,
        |  coalesce(list_sum(bytes), 0) AS total
        | FROM b)
        |SELECT doc_id, width, height, n_bytes,
        | array_to_string(lanes, ',') AS lane_sums,
        | CAST(total AS DOUBLE) / 255.0 AS feat_sum
        |FROM l ORDER BY doc_id""".stripMargin)
}
