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

  /** REAL image decode — `javax.imageio` ships JPEG/PNG codecs in the
    * JDK, so this path needs no external library. It rides the exact
    * same `mapPartitions` seam as the stub family: per-partition init
    * (ImageIO's disk cache off — decode stays in memory), batch
    * iteration, typed output. The stub family stays as the
    * oracle-checkable twin; this is the production decode for payloads
    * that really are images. All raster math is integer-accumulated so
    * a decoded (lossless) image yields bit-exact stats. */
  object ImageDecoder {
    final case class DecodedImage(
        doc_id: Long,
        ok: Boolean,
        width: Int,
        height: Int,
        gray_sum: Long,     // Σ floor((r+g+b)/3) over pixels — exact
        grid: Array[Long])  // block-averaged gray grid, row-major

    /** Decode one payload; `None` when the bytes are not a decodable
      * image (the caller emits an ok=false row — corrupt media is data,
      * not an exception, at 100 TB). */
    def decode(docId: Long, bytes: Array[Byte], gridW: Int, gridH: Int)
        : DecodedImage = {
      // javax.imageio codecs throw RuntimeExceptions (CMMException,
      // ArrayIndexOutOfBoundsException, NegativeArraySizeException) on
      // some malformed payloads — corrupt media must stay data, so
      // anything non-fatal maps to the ok=false row, not a task failure.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null)
        DecodedImage(docId, ok = false, 0, 0, 0L, Array.empty)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var graySum = 0L
        val grid = new Array[Long](gridW * gridH)
        val cnt = new Array[Long](gridW * gridH)
        var y = 0
        while (y < h) {
          val gy = math.min((y.toLong * gridH / h).toInt, gridH - 1)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            graySum += gray
            val gx = math.min((x.toLong * gridW / w).toInt, gridW - 1)
            grid(gy * gridW + gx) += gray
            cnt(gy * gridW + gx) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < grid.length) {
          if (cnt(i) > 0) grid(i) /= cnt(i)
          i += 1
        }
        DecodedImage(docId, ok = true, w, h, graySum, grid)
      }
    }
  }

  /** Decode a (doc_id, payload) dataset of real images into dims +
    * exact grayscale stats + a `gridW`×`gridH` block-average thumbnail
    * — the real-codec counterpart of [[q44MultimodalResize]]. Corrupt
    * payloads come back as ok=false rows, never task failures. */
  def decodeImages(payloads: Dataset[(Long, Array[Byte])],
      gridW: Int = 4, gridH: Int = 4): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads
      .mapPartitions { it =>
        // per-partition decoder init: keep ImageIO off its disk cache
        // (one JVM-wide flag, cheap to re-set; the per-partition hook
        // is where a JNI codec would load its native lib once)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          ImageDecoder.decode(id, bytes, gridW, gridH)
        }
      }
      .toDF()
      .select(col("doc_id"), col("ok"), col("width"), col("height"),
        col("gray_sum"),
        concat_ws(",", transform(col("grid"), _.cast("string"))).as("grid"))
  }

  /** REAL audio decode — `javax.sound.sampled` ships WAV/AIFF/AU
    * parsers in the JDK, so like [[ImageDecoder]] this path needs no
    * external library. Same seam, same contract: per-partition init,
    * batch iteration, corrupt payloads as ok=false DATA rows (the
    * javax.sound parsers throw `UnsupportedAudioFileException`,
    * `IOException`, and assorted RuntimeExceptions on malformed
    * headers — all non-fatal throws map to the failure row). Sample
    * stats are integer-accumulated over the decoded PCM frames, so a
    * lossless payload yields bit-exact sums a spec can assert against
    * the planted samples. */
  object AudioDecoder {
    final case class DecodedAudio(
        doc_id: Long,
        ok: Boolean,
        channels: Int,
        sample_rate: Int,   // Hz, truncated — WAV stores it integral
        n_frames: Long,     // sample frames actually decoded
        sample_sum: Long,   // Σ signed sample values over all channels
        sample_min: Long,
        sample_max: Long)

    private def failed(docId: Long) =
      DecodedAudio(docId, ok = false, 0, 0, 0L, 0L, 0L, 0L)

    /** Decode one payload. Non-PCM encodings (μ-law, a-law) are routed
      * through the JDK's own converter to 16-bit signed PCM first, so
      * the stats are always over linear samples. FLAC payloads (the
      * JDK ships no FLAC provider) route to the engine's own
      * [[graft.functions.FlacCodec]] — a real compressed-audio decode
      * in the same corrupt-as-data seam (r16; the remaining lossy
      * codecs, MP3/Vorbis, still need a codec dependency: their
      * documented slot is the per-partition init hook in
      * [[Multimodal.decodeAudio]], and a DSP reimplementation could
      * not be oracle-gated bit-exactly, so it is deliberately out). */
    private def statsOf(docId: Long, channels: Int, sampleRate: Int,
        samples: Array[Array[Int]]): DecodedAudio = {
      var sum = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var n = 0L
      samples.foreach(_.foreach { s =>
        sum += s
        if (s < mn) mn = s
        if (s > mx) mx = s
        n += 1
      })
      if (n == 0L) failed(docId)
      else DecodedAudio(docId, ok = true, channels, sampleRate,
        n / channels, sum, mn, mx)
    }

    def decode(docId: Long, bytes: Array[Byte]): DecodedAudio = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
          bytes(2) == 'a' && bytes(3) == 'C')
        return graft.functions.FlacCodec.decode(bytes) match {
          case Left(_) => failed(docId)
          case Right(d) => statsOf(docId, d.channels, d.sampleRate, d.samples)
        }
      // RIFF/WAVE routes through the engine's IMA ADPCM decoder first
      // (the JDK ships no 0x11 provider); a non-ADPCM WAV (fmt tag 1
      // PCM, 6/7 µ-law/a-law) falls through to the JDK converter, a
      // CORRUPT ADPCM stream falls through and fails there too —
      // corrupt is data either way (r17, the lossy codec member)
      if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
          bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
        graft.functions.AdpcmCodec.decode(bytes) match {
          case Right(d) => return statsOf(docId, d.channels, d.sampleRate, d.samples)
          case Left(_) => () // not IMA / corrupt → JDK path below
        }
      try {
        val raw = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = raw.getFormat
        // normalize EVERYTHING to ≤16-bit signed PCM through the JDK
        // converter — not just non-PCM encodings: a valid 24/32-bit or
        // float PCM clip is DATA, not corruption, and must land in the
        // stats rather than in an ok=false row (review r14: the
        // PCM-passthrough shortcut misclassified wide PCM as corrupt)
        val pcm =
          if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits <= 16) raw
          else AudioSystem.getAudioInputStream(
            new AudioFormat(
              AudioFormat.Encoding.PCM_SIGNED,
              fmt.getSampleRate, 16, fmt.getChannels,
              2 * fmt.getChannels, fmt.getSampleRate, false), raw)
        val f = pcm.getFormat
        val channels = f.getChannels
        val bytesPerSample = (f.getSampleSizeInBits + 7) / 8
        if (bytesPerSample < 1 || bytesPerSample > 2) return failed(docId)
        val big = f.isBigEndian
        val frameBytes = bytesPerSample * channels
        val buf = new Array[Byte](frameBytes * 1024)
        var sum = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var frames = 0L
        var read = pcm.read(buf)
        while (read > 0) {
          // a read may end mid-frame only at EOF of a truncated
          // payload; whole samples only
          val usable = read - (read % bytesPerSample)
          var i = 0
          while (i < usable) {
            val s: Int =
              if (bytesPerSample == 1) buf(i).toInt // PCM_SIGNED 8-bit
              else if (big) (buf(i) << 8) | (buf(i + 1) & 0xff)
              else (buf(i + 1) << 8) | (buf(i) & 0xff)
            sum += s
            if (s < mn) mn = s
            if (s > mx) mx = s
            i += bytesPerSample
          }
          frames += usable / frameBytes
          read = pcm.read(buf)
        }
        if (frames == 0L) failed(docId)
        else DecodedAudio(docId, ok = true, channels,
          f.getSampleRate.toInt, frames, sum, mn, mx)
      } catch { case scala.util.control.NonFatal(_) => failed(docId) }
    }
  }

  /** Decode a (doc_id, payload) dataset of real audio clips into
    * format metadata + exact signed-sample stats — the audio
    * counterpart of [[decodeImages]], riding the identical
    * `mapPartitions` seam (decode failure is data, not a task
    * failure). */
  /** PERCEPTUAL-CODEC SEAM — the formal deferral (r18, carried from
    * r16/r17). The codec family splits on oracle-gateability:
    * integer-exact codecs (PCM/WAV here, FLAC in [[graft.functions
    * .FlacCodec]], IMA ADPCM in [[graft.functions.AdpcmCodec]] — the
    * lossy slot) decode to bit-exact samples a DuckDB oracle can
    * replay, and all three ship decoded and gated. Perceptual codecs
    * (MP3/Vorbis/Opus) CANNOT be gated that way: their reference
    * decoders specify float DSP whose output legitimately differs in
    * the last ulp across implementations, so the honest check is
    * spectral distance against a reference decode, not a hash.
    * Shipping one therefore needs a decoder DEPENDENCY, and this
    * build disallows new libraryDependencies (offline resolver).
    * Named candidates for when that constraint lifts, all pure-JVM
    * (no JNI, so executor provisioning stays jar-only): JLayer
    * (javazoom, MP3), JOrbis (javazoom, Vorbis), Concentus (a Java
    * port of libopus). Integration shape is ALREADY BUILT: register
    * the decoder in the per-partition init slot below (where a JNI
    * codec would load its native lib), have [[AudioDecoder.decode]]
    * sniff the container magic (ID3/0xFFEx for MP3, OggS for
    * Vorbis/Opus) before the javax.sound fallback, and keep decode
    * failure as DATA (`ok = false`), never a task failure — the
    * corrupt-as-data contract every decode seam here follows. */
  def decodeAudio(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads
      .mapPartitions { it =>
        // per-partition init hook: javax.sound providers are located
        // via a ServiceLoader scan on first use — forcing it here once
        // per partition keeps the per-row path scan-free (a JNI codec
        // would load its native lib in this slot; a pure-JVM
        // perceptual decoder — see the seam note above — registers
        // here too)
        javax.sound.sampled.AudioSystem.getAudioFileTypes()
        it.map { case (id, bytes) => AudioDecoder.decode(id, bytes) }
      }
      .toDF()
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

  /** STUB resize kernel: block-average the payload bytes onto a fixed
    * `cells`-wide grid — the 1-D stand-in for image downsampling.
    * Integer mean per cell (floor), deterministic, SQL-expressible. */
  def resizeCells(payload: Array[Byte], cells: Int): Array[Long] = {
    val n = payload.length
    val out = new Array[Long](cells)
    var i = 0
    while (i < cells) {
      val start = (i.toLong * n / cells).toInt
      val end = ((i + 1).toLong * n / cells).toInt
      var s = 0L
      var j = start
      while (j < end) { s += payload(j) & 0xff; j += 1 }
      out(i) = if (end > start) s / (end - start) else 0L
      i += 1
    }
    out
  }

  /** STUB frame sampler: treat the payload as fixed-size frames and
    * keep every `stride`-th frame's byte sum, up to `maxFrames` — the
    * video keyframe-sampling shape (decode only what you keep). */
  def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int,
      maxFrames: Int): Array[Long] = {
    val n = payload.length
    val out = Seq.newBuilder[Long]
    var k = 0
    var kept = 0
    while (k.toLong * frameBytes < n && kept < maxFrames) {
      val start = k * frameBytes
      val end = math.min(start + frameBytes, n)
      var s = 0L
      var j = start
      while (j < end) { s += payload(j) & 0xff; j += 1 }
      out += s
      kept += 1
      k += stride
    }
    out.result().toArray
  }

  // --------------------------------------------------------------- q44
  /** "Resize" over binary payloads: fixed 16-cell block-average grid
    * per document, partition-wise like q25. */
  def q44MultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => // decoder init amortized per partition
        it.map { case (id, bytes) =>
          (id, bytes.length, resizeCells(bytes, 16).mkString(","))
        }
      }
      .toDF("doc_id", "n_bytes", "cells")
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- q45
  /** Frame sampling over binary payloads: 32-byte frames, every 4th
    * frame kept, at most 8 — per-doc sampled-frame byte sums. */
  def q45FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val frames = sampleFrames(bytes, 32, 4, 8)
          (id, (bytes.length + 31) / 32, frames.length,
            frames.mkString(","))
        }
      }
      .toDF("doc_id", "n_frames_total", "n_frames_kept", "frame_sums")
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------- q151
  /** Real FLAC decode, oracle-gated end-to-end (r16): each document
    * ships a deterministic PCM clip — `sample(c, i) = ((doc_id·131 +
    * c·17 + i·31) mod 4001) − 2000`, `1 + doc_id % 2` channels,
    * `8000 + (doc_id % 3)·4000` Hz, `480 + (doc_id % 7)·96` samples —
    * ENCODED to a spec-conformant FLAC stream
    * ([[graft.functions.FlacCodec]]: fixed predictors, Rice
    * residuals, stereo docs cycling all four channel modes so the
    * decoder's left-side/right-side/mid-side paths run under the
    * gate) and DECODED back through [[decodeAudio]]'s magic-sniffing
    * seam. The DuckDB oracle recomputes the sample statistics
    * directly from the formula, so a hash match proves
    * decode ∘ encode ≡ identity over the whole corpus — a Rice or
    * predictor bug anywhere corrupts a sum. Every 29th document ships
    * a half-truncated stream: corrupt is DATA (`ok = 0` row), per the
    * media-family contract. Scale shape: per-row kernel, no shuffle
    * beyond the final order. */
  def q151FlacDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the codec kernel is pure per-row CPU over an 8-byte input row —
    // spread an under-parallel scan so encode+decode use every core
    // (no-op when the input already has enough splits)
    val payloads = graft.operators.Spread.byKey(
        Tables(spark, dir, "documents").select(col("doc_id")), col("doc_id"))
      .as[Long]
      .map { id =>
        val ch = (1 + id % 2).toInt
        val sr = (8000 + (id % 3) * 4000).toInt
        val n = (480 + (id % 7) * 96).toInt
        val pcm = Array.tabulate(ch, n)((c, i) =>
          (((id * 131 + c * 17 + i.toLong * 31) % 4001) - 2000).toInt)
        // odd ids are stereo; cycle all four stereo channel modes
        val mode = if (ch == 2) ((id / 2) % 4).toInt else 0
        val enc = graft.functions.FlacCodec.encode(pcm, sr, bps = 16,
          blockSize = 256, stereoMode = mode)
        (id, if (id % 29 == 0) enc.take(enc.length / 2) else enc)
      }
    decodeAudio(payloads)
      .select(
        col("doc_id"),
        col("ok").cast("long").as("ok"),
        col("channels").cast("long").as("channels"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_frames"),
        when(col("ok"), expr("n_frames * 1000000 div sample_rate"))
          .otherwise(0L).as("duration_us"),
        col("sample_sum"), col("sample_min"), col("sample_max"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------- q155
  /** Real LOSSY audio decode, oracle-gated end-to-end (r17; the
    * carried "lossy-codec PCM decode" member): each document ships a
    * deterministic clip — `x(c, i) = ((doc_id·131 + c·17 + 7·i² +
    * 31·i) mod 4001) − 2000`, `1 + doc_id % 2` channels, `57 +
    * (doc_id % 5)·16` samples, `8000 + (doc_id % 3)·4000` Hz —
    * encoded to a WAVE_FORMAT_IMA_ADPCM stream
    * ([[graft.functions.AdpcmCodec]]: 4-bit adaptive quantization,
    * genuinely lossy) at 57 samples per block, so MULTI-BLOCK framing
    * (per-block verbatim-predictor restarts) and STEREO channel
    * interleaving are both under the gate, and decoded back through
    * [[decodeAudio]]'s magic-sniffing seam. Unlike q151's lossless
    * member, decoded ≠ input here — so the DuckDB oracle replays the
    * codec's INTEGER STATE MACHINE itself (a recursive CTE over the
    * published step/index tables, anchored per (doc, channel, block):
    * quantize, reconstruct, clamp), and a hash match proves the
    * engine's encoder and decoder implement exactly the specified
    * arithmetic, sample for sample. Every 23rd document ships a
    * half-truncated stream: corrupt is data (`ok = 0`). Scale shape:
    * per-row kernel, no shuffle beyond the final order — and the
    * per-partition init slot where an MP3/JNI codec would load stays
    * untouched. */
  def q155AdpcmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // q151's spread note: per-row codec CPU over 8-byte rows
    val payloads = graft.operators.Spread.byKey(
        Tables(spark, dir, "documents").select(col("doc_id")), col("doc_id"))
      .as[Long]
      .map { id =>
        val sr = (8000 + (id % 3) * 4000).toInt
        val ch = (1 + id % 2).toInt // odd ids stereo — interleave gated
        val n = (57 + (id % 5) * 16).toInt
        val pcm = Array.tabulate(ch, n)((c, i) =>
          (((id * 131 + c * 17 + 7L * i * i + 31L * i) % 4001) - 2000).toInt)
        // 57 samples per block → up to 3 blocks per clip: the
        // per-block header restart (verbatim first sample, index 0)
        // is under the oracle, not just the unit spec
        val enc = graft.functions.AdpcmCodec.encode(pcm, sr,
          samplesPerBlock = 57)
        (id, if (id % 23 == 0) enc.take(enc.length / 2) else enc)
      }
    decodeAudio(payloads)
      .select(
        col("doc_id"),
        col("ok").cast("long").as("ok"),
        col("channels").cast("long").as("channels"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_frames"),
        when(col("ok"), expr("n_frames * 1000000 div sample_rate"))
          .otherwise(0L).as("duration_us"),
        col("sample_sum"), col("sample_min"), col("sample_max"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_multimodal_meta"     -> (q24MultimodalMeta _),
    "q25_multimodal_features" -> (q25MultimodalFeatures _),
    "q44_multimodal_resize"   -> (q44MultimodalResize _),
    "q45_frame_sample"        -> (q45FrameSample _),
    "q151_flac_decode"        -> (q151FlacDecode _),
    "q155_adpcm_decode"       -> (q155AdpcmDecode _))

  val oracle: Map[String, String] = Map(
    // q155: the oracle replays the IMA ADPCM state machine itself —
    // the published 89-entry step table and index adjustments, the
    // sequential quantize/reconstruct/clamp arithmetic — as a
    // recursive CTE, so the hash pins the engine's encoder AND
    // decoder to the specified integer semantics sample by sample
    "q155_adpcm_decode" ->
      """WITH RECURSIVE p AS (
        | SELECT doc_id,
        |  1 + doc_id % 2 AS channels,
        |  8000 + (doc_id % 3) * 4000 AS sample_rate,
        |  57 + (doc_id % 5) * 16 AS n
        | FROM documents),
        |st(i, step) AS (VALUES
        | (0,7),(1,8),(2,9),(3,10),(4,11),(5,12),(6,13),(7,14),(8,16),
        | (9,17),(10,19),(11,21),(12,23),(13,25),(14,28),(15,31),(16,34),
        | (17,37),(18,41),(19,45),(20,50),(21,55),(22,60),(23,66),(24,73),
        | (25,80),(26,88),(27,97),(28,107),(29,118),(30,130),(31,143),
        | (32,157),(33,173),(34,190),(35,209),(36,230),(37,253),(38,279),
        | (39,307),(40,337),(41,371),(42,408),(43,449),(44,494),(45,544),
        | (46,598),(47,658),(48,724),(49,796),(50,876),(51,963),(52,1060),
        | (53,1166),(54,1282),(55,1411),(56,1552),(57,1707),(58,1878),
        | (59,2066),(60,2272),(61,2499),(62,2749),(63,3024),(64,3327),
        | (65,3660),(66,4026),(67,4428),(68,4871),(69,5358),(70,5894),
        | (71,6484),(72,7132),(73,7845),(74,8630),(75,9493),(76,10442),
        | (77,11487),(78,12635),(79,13899),(80,15289),(81,16818),
        | (82,18500),(83,20350),(84,22385),(85,24623),(86,27086),
        | (87,29794),(88,32767)),
        |dec AS (
        | SELECT p.doc_id, c.c, b.t,
        |  CAST((p.doc_id * 131 + c.c * 17 + 7 * b.t * b.t
        |        + 31 * b.t) % 4001 - 2000 AS BIGINT) AS pred,
        |  0 AS idx
        | FROM p
        | JOIN (VALUES (0), (1)) c(c) ON c.c < p.channels
        | JOIN (VALUES (0), (57), (114)) b(t) ON b.t < p.n
        | WHERE p.doc_id % 23 <> 0
        | UNION ALL
        | SELECT doc_id, c, t,
        |  GREATEST(-32768, LEAST(32767,
        |    CASE WHEN diff < 0 THEN pred0 - vpdiff
        |         ELSE pred0 + vpdiff END)) AS pred,
        |  GREATEST(0, LEAST(88, idx0 + CASE q WHEN 4 THEN 2 WHEN 5 THEN 4
        |    WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END)) AS idx
        | FROM (
        |  SELECT doc_id, c, t, pred0, idx0, diff, step,
        |   CASE WHEN ad >= step THEN 1 ELSE 0 END AS b2,
        |   ad - b2 * step AS r2,
        |   CASE WHEN r2 >= (step >> 1) THEN 1 ELSE 0 END AS b1,
        |   r2 - b1 * (step >> 1) AS r1,
        |   CASE WHEN r1 >= (step >> 2) THEN 1 ELSE 0 END AS b0,
        |   (step >> 3) + b2 * step + b1 * (step >> 1) + b0 * (step >> 2)
        |     AS vpdiff,
        |   b2 * 4 + b1 * 2 + b0 AS q
        |  FROM (
        |   SELECT d.doc_id, d.c, d.t + 1 AS t, d.pred AS pred0,
        |    d.idx AS idx0, st.step AS step,
        |    ((d.doc_id * 131 + d.c * 17 + 7 * (d.t + 1) * (d.t + 1)
        |      + 31 * (d.t + 1)) % 4001 - 2000) - d.pred AS diff,
        |    ABS(((d.doc_id * 131 + d.c * 17 + 7 * (d.t + 1) * (d.t + 1)
        |      + 31 * (d.t + 1)) % 4001 - 2000) - d.pred) AS ad
        |   FROM dec d
        |   JOIN p ON p.doc_id = d.doc_id
        |   JOIN st ON st.i = d.idx
        |   WHERE d.t + 1 < p.n AND (d.t + 1) % 57 <> 0) z1) z2),
        |g AS (
        | SELECT d.doc_id,
        |  CAST(1 AS BIGINT) AS ok,
        |  CAST(p.channels AS BIGINT) AS channels,
        |  CAST(p.sample_rate AS BIGINT) AS sample_rate,
        |  CAST(COUNT(*) // p.channels AS BIGINT) AS n_frames,
        |  CAST((COUNT(*) // p.channels) * 1000000 // p.sample_rate
        |       AS BIGINT) AS duration_us,
        |  CAST(SUM(d.pred) AS BIGINT) AS sample_sum,
        |  CAST(MIN(d.pred) AS BIGINT) AS sample_min,
        |  CAST(MAX(d.pred) AS BIGINT) AS sample_max
        | FROM dec d JOIN p ON p.doc_id = d.doc_id
        | GROUP BY d.doc_id, p.channels, p.sample_rate)
        |SELECT doc_id, ok, channels, sample_rate, n_frames, duration_us,
        |       sample_sum, sample_min, sample_max
        |FROM g
        |UNION ALL
        |SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM p WHERE doc_id % 23 = 0
        |ORDER BY doc_id""".stripMargin,
    "q151_flac_decode" ->
      """WITH p AS (
        | SELECT doc_id,
        |  1 + doc_id % 2 AS channels,
        |  8000 + (doc_id % 3) * 4000 AS sample_rate,
        |  480 + (doc_id % 7) * 96 AS n
        | FROM documents),
        |s AS (
        | SELECT p.doc_id, p.channels, p.sample_rate, p.n,
        |  CAST(SUM(((p.doc_id * 131 + c.c * 17 + i.i * 31) % 4001) - 2000)
        |       AS BIGINT) AS ssum,
        |  CAST(MIN(((p.doc_id * 131 + c.c * 17 + i.i * 31) % 4001) - 2000)
        |       AS BIGINT) AS smin,
        |  CAST(MAX(((p.doc_id * 131 + c.c * 17 + i.i * 31) % 4001) - 2000)
        |       AS BIGINT) AS smax
        | FROM p, generate_series(0, 1055) i(i), generate_series(0, 1) c(c)
        | WHERE i.i < p.n AND c.c < p.channels
        | GROUP BY 1, 2, 3, 4)
        |SELECT doc_id,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE 1 END AS BIGINT) AS ok,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE channels END AS BIGINT)
        |   AS channels,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE sample_rate END AS BIGINT)
        |   AS sample_rate,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE n END AS BIGINT)
        |   AS n_frames,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0
        |           ELSE n * 1000000 // sample_rate END AS BIGINT)
        |   AS duration_us,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE ssum END AS BIGINT)
        |   AS sample_sum,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE smin END AS BIGINT)
        |   AS sample_min,
        | CAST(CASE WHEN doc_id % 29 = 0 THEN 0 ELSE smax END AS BIGINT)
        |   AS sample_max
        |FROM s ORDER BY doc_id""".stripMargin,
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
        |FROM l ORDER BY doc_id""".stripMargin,
    // resizeCells: cell i covers bytes [i*n//16, (i+1)*n//16), value =
    // floor-mean. ASCII corpus ⇒ codepoints are the bytes (as q25).
    "q44_multimodal_resize" ->
      """WITH b AS (
        | SELECT doc_id, length(text) AS n,
        |  list_transform(range(1, length(text) + 1),
        |                 i -> ascii(substr(text, i, 1))) AS bytes
        | FROM documents),
        |c AS (
        | SELECT doc_id, n,
        |  list_transform(range(0, 16), k ->
        |   CASE WHEN ((k+1)*n)//16 > (k*n)//16 THEN
        |     list_sum(list_transform(
        |       range(CAST((k*n)//16 AS INT) + 1, CAST(((k+1)*n)//16 AS INT) + 1),
        |       i -> bytes[i])) // (((k+1)*n)//16 - (k*n)//16)
        |   ELSE 0 END) AS cells
        | FROM b)
        |SELECT doc_id, CAST(n AS INT) AS n_bytes,
        | array_to_string(cells, ',') AS cells
        |FROM c ORDER BY doc_id""".stripMargin,
    // sampleFrames(32, stride 4, max 8): frame k∈{0,4,8,…} while
    // k*32 < n and kept < 8; sum of bytes [k*32, min(k*32+32, n)).
    "q45_frame_sample" ->
      """WITH b AS (
        | SELECT doc_id, length(text) AS n,
        |  list_transform(range(1, length(text) + 1),
        |                 i -> ascii(substr(text, i, 1))) AS bytes
        | FROM documents),
        |f AS (
        | SELECT doc_id, n,
        |  list_transform(
        |    list_filter(range(0, 8), j -> j*4*32 < n),
        |    j -> list_sum(list_transform(
        |      range(CAST(j*4*32 AS INT) + 1,
        |            CAST(least(j*4*32 + 32, n) AS INT) + 1),
        |      i -> bytes[i]))) AS frames
        | FROM b)
        |SELECT doc_id,
        | CAST((n + 31) // 32 AS INT) AS n_frames_total,
        | CAST(len(frames) AS INT) AS n_frames_kept,
        | array_to_string(frames, ',') AS frame_sums
        |FROM f ORDER BY doc_id""".stripMargin)
}
