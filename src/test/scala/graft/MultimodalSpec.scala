package graft

import org.apache.spark.sql.functions._
import graft.queries.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload schema: binary column + prunable metadata struct") {
    val df = Multimodal.withPayload(spark, sfDir)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    // metadata-only projection must not deserialize payload bytes
    val metaOnly = df.select($"doc_id", $"meta.byte_len")
    assert(metaOnly.count() > 0)
  }

  test("stub decode is deterministic and batch-shaped") {
    val a = Multimodal.q25MultimodalFeatures(spark, sfDir).collect()
    val b = Multimodal.q25MultimodalFeatures(spark, sfDir).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { r =>
      // oracle-safe scalar schema: 8 exact integer lane sums, no raw arrays
      assert(r.getAs[String]("lane_sums").split(",").length == 8)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 256)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }

  test("decoder: feature sum equals normalized byte sum") {
    val payload = "hello world".getBytes("UTF-8")
    val m = Multimodal.StubDecoder.decode(7L, payload)
    val expected = payload.map(b => (b & 0xff) / 255.0f).sum
    assert(math.abs(m.features.sum - expected) < 1e-4)
    assert(m.n_bytes == payload.length)
    assert(m.lane_sums.sum == payload.map(b => (b & 0xff).toLong).sum)
    assert(m.features.length == 8 && m.lane_sums.length == 8)
  }

  test("q25 feat_sum matches total byte sum / 255 exactly") {
    val rows = Multimodal.q25MultimodalFeatures(spark, sfDir).limit(50).collect()
    rows.foreach { r =>
      val total = r.getAs[String]("lane_sums").split(",").map(_.toLong).sum
      assert(r.getAs[Double]("feat_sum") == total.toDouble / 255.0)
    }
  }
}
