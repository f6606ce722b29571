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

  test("real decoder: planted PNG decodes bit-exactly through the seam") {
    // PNG is lossless, so pixel values — and therefore gray_sum and the
    // block-average grid — are EXACT, not approximate. 8×8 image: left
    // half gray 50, right half gray 200.
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = if (x < 4) 50 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf), "PNG writer missing")
    val png = buf.toByteArray

    val rows = Multimodal.decodeImages(
      Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
        .toDS(), gridW = 2, gridH = 2)
      .orderBy("doc_id").collect()

    val ok = rows(0)
    assert(ok.getAs[Boolean]("ok"))
    assert(ok.getAs[Int]("width") == 8 && ok.getAs[Int]("height") == 8)
    assert(ok.getAs[Long]("gray_sum") == 32L * 50 + 32L * 200)
    // 2×2 grid: left cells average 50, right cells 200 (exact)
    assert(ok.getAs[String]("grid") == "50,200,50,200")

    // corrupt payload is DATA (ok=false row), not a task failure
    val bad = rows(1)
    assert(!bad.getAs[Boolean]("ok"))
    assert(bad.getAs[Int]("width") == 0 && bad.getAs[String]("grid") == "")
  }

  test("real decoder: planted JPEG decodes with exact dims, plausible raster") {
    // JPEG is lossy — assert structure (dims, ok) exactly and the
    // raster approximately: a uniform mid-gray image must come back
    // within a few DCT quant steps of itself.
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, (128 << 16) | (128 << 8) | 128)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", buf), "JPEG writer missing")

    val row = Multimodal.decodeImages(Seq((7L, buf.toByteArray)).toDS())
      .collect().head
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Int]("width") == 16 && row.getAs[Int]("height") == 12)
    val meanGray = row.getAs[Long]("gray_sum").toDouble / (16 * 12)
    assert(math.abs(meanGray - 128.0) < 4.0,
      s"uniform gray-128 JPEG decoded to mean $meanGray")
  }

  test("real decoder: planted WAV decodes with exact sample stats") {
    // the WAV is HAND-ROLLED (canonical 44-byte RIFF header + PCM
    // 16-bit LE data) so the fixture is independent of the javax.sound
    // WRITER — the decoder under test parses bytes we constructed from
    // the spec of the format, not bytes its own library produced.
    def wav(samples: Seq[Int], channels: Int, rate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    // mono: samples 0..999 → sum 499500; stereo: ±k pairs → sum 0,
    // 300 frames from 600 samples; includes negative values so the
    // sign handling of the little-endian 16-bit read is exercised
    val mono = wav(0 until 1000, channels = 1, rate = 8000)
    val stereo = wav((1 to 300).flatMap(k => Seq(k, -k)),
      channels = 2, rate = 44100)
    val rows = Multimodal.decodeAudio(Seq(
      (1L, mono), (2L, stereo),
      (3L, "definitely not audio bytes".getBytes("UTF-8"))).toDS())
      .orderBy("doc_id").collect()

    val m = rows(0)
    assert(m.getAs[Boolean]("ok"))
    assert(m.getAs[Int]("channels") == 1)
    assert(m.getAs[Int]("sample_rate") == 8000)
    assert(m.getAs[Long]("n_frames") == 1000L)
    assert(m.getAs[Long]("sample_sum") == 499500L)
    assert(m.getAs[Long]("sample_min") == 0L)
    assert(m.getAs[Long]("sample_max") == 999L)

    val s = rows(1)
    assert(s.getAs[Boolean]("ok"))
    assert(s.getAs[Int]("channels") == 2)
    assert(s.getAs[Int]("sample_rate") == 44100)
    assert(s.getAs[Long]("n_frames") == 300L)
    assert(s.getAs[Long]("sample_sum") == 0L)
    assert(s.getAs[Long]("sample_min") == -300L)
    assert(s.getAs[Long]("sample_max") == 300L)

    // corrupt payload is DATA (ok=false row), not a task failure
    val bad = rows(2)
    assert(!bad.getAs[Boolean]("ok"))
    assert(bad.getAs[Long]("n_frames") == 0L)
  }

  test("real decoder: 24-bit PCM is data (converted to 16-bit), never a corrupt row") {
    // hand-rolled 24-bit PCM WAV; samples are k·256 so the JDK's
    // 24→16-bit conversion (drop the low byte) yields exactly k and
    // the stats stay integer-assertable
    def wav24(samples: Seq[Int], channels: Int, rate: Int): Array[Byte] = {
      val dataLen = samples.length * 3
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)
        .putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 3)
        .putShort((channels * 3).toShort)
        .putShort(24)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach { v =>
        bb.put((v & 0xff).toByte)
          .put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
      }
      bb.array()
    }
    val clip = wav24((0 until 500).map(_ * 256) ++
      Seq(-256 * 200), channels = 1, rate = 8000)
    val row = Multimodal.decodeAudio(Seq((1L, clip)).toDS()).collect().head
    assert(row.getAs[Boolean]("ok"),
      "valid 24-bit PCM must decode, not report corrupt")
    assert(row.getAs[Int]("channels") == 1)
    assert(row.getAs[Int]("sample_rate") == 8000)
    assert(row.getAs[Long]("n_frames") == 501L)
    // the JDK's 24→16 conversion applies its own rounding (measured:
    // not a plain low-byte drop), so the stats are banded, not exact —
    // the contract under test is "wide PCM is decoded as linear data",
    // not the converter's rounding rule
    val sum = row.getAs[Long]("sample_sum")
    val expected = (0 until 500).sum.toLong - 200L
    assert(math.abs(sum - expected) <= 501L,
      s"sum $sum outside ±1/sample of $expected")
    assert(math.abs(row.getAs[Long]("sample_min") + 200L) <= 1L)
    assert(math.abs(row.getAs[Long]("sample_max") - 499L) <= 1L)
  }

  test("real decoder: FLAC decodes with exact sample stats through the seam") {
    import spark.implicits._
    // hand-picked samples: stats are computable on paper
    val l = Array(100, -200, 300, -400, 500)
    val r = Array(1, 2, 3, 4, 5)
    val flac = graft.functions.FlacCodec.encode(
      Array(l, r), 44100, bps = 16, blockSize = 4, stereoMode = 3)
    val rows = Multimodal.decodeAudio(Seq(
        (1L, flac),
        (2L, flac.take(flac.length / 2)),       // truncated → data
        (3L, "fLaC".getBytes ++ Array[Byte](9)) // header-only garbage
      ).toDS()).orderBy("doc_id").collect()
    val good = rows(0)
    assert(good.getBoolean(1), "valid FLAC must decode")
    assert(good.getInt(2) == 2 && good.getInt(3) == 44100)
    assert(good.getLong(4) == 5)                       // frames
    assert(good.getLong(5) == (l.sum + r.sum).toLong)  // Σ samples
    assert(good.getLong(6) == -400L && good.getLong(7) == 500L)
    assert(!rows(1).getBoolean(1) && !rows(2).getBoolean(1),
      "corrupt FLAC payloads are rows, not task failures")
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

  test("resize kernel: block means on hand-checked vectors; tiny inputs") {
    // 32 bytes of value 10 then 32 of value 20, 16 cells of 4 bytes:
    // first 8 cells avg 10, last 8 avg 20
    val payload = (Array.fill(32)(10) ++ Array.fill(32)(20)).map(_.toByte)
    val cells = Multimodal.resizeCells(payload, 16)
    assert(cells.take(8).forall(_ == 10L) && cells.drop(8).forall(_ == 20L))
    // fewer bytes than cells: empty cells are 0, no crash
    val tiny = Multimodal.resizeCells("ab".getBytes("UTF-8"), 16)
    assert(tiny.length == 16 && tiny.count(_ > 0) == 2)
    assert(Multimodal.resizeCells(Array.emptyByteArray, 16).forall(_ == 0L))
  }

  test("frame sampler: stride and cap behave like keyframe selection") {
    // 300 bytes of value 1 → frames of 32: sums 32 except last (300-288=12)
    val payload = Array.fill(300)(1.toByte)
    val frames = Multimodal.sampleFrames(payload, 32, 4, 8)
    // sampled frame starts: 0, 128, 256 (k=0,4,8; k=12 → 384 ≥ 300)
    assert(frames.toSeq == Seq(32L, 32L, 32L))
    // cap: huge payload keeps at most 8 frames
    val big = Array.fill(32 * 4 * 20)(1.toByte)
    assert(Multimodal.sampleFrames(big, 32, 4, 8).length == 8)
    assert(Multimodal.sampleFrames(Array.emptyByteArray, 32, 4, 8).isEmpty)
  }
}
