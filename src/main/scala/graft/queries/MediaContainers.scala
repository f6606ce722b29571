package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Compressed-media CONTAINER parsing — the metadata layer of the
  * multimodal seam (reference tie-in: the opaque-payload storage model
  * of `Multimodal.withPayload`; extends r14's WAV/AIFF decode to the
  * formats real corpora actually carry).
  *
  * A 100 TB media-curation pipeline filters, buckets, and dedups on
  * container metadata (duration, rate, channels, track layout) long
  * before it spends a single codec cycle — the metadata pass touches
  * only the first kilobytes of each payload and is pure byte math, so
  * it belongs in the same `mapPartitions` batch seam as the image and
  * WAV decoders. These parsers read the PUBLIC container framings:
  *
  *  - MP3: ID3v2 skip (syncsafe size) + MPEG-1 Layer III frame-header
  *    walk (bitrate/samplerate tables, padding bit, frame-length
  *    formula `144·bitrate/rate + pad`), counting whole frames.
  *  - OGG: page walk (`OggS` capture pattern, lacing-segment payload
  *    sizes), identification-header sniff for both Opus (`OpusHead`:
  *    channel count, pre-skip, 48 kHz granule clock) and Vorbis
  *    (`\x01vorbis`: channel count, rate = granule clock); duration
  *    from the final page's granule position. Page CRCs are not
  *    verified — integrity is the storage layer's job, and a metadata
  *    probe that checksums every page reads the whole payload,
  *    defeating its own point.
  *  - FLAC: `fLaC` magic + STREAMINFO bitfield (20-bit rate, 3-bit
  *    channels, 5-bit sample size, 36-bit total-sample count).
  *  - MP4/ISO-BMFF: box walk (32-bit and 64-bit `size`+fourcc,
  *    size-0 extends-to-EOF), `moov` recursion, `mvhd` version 0/1
  *    timescale+duration, `trak` count.
  *
  * What is deliberately NOT here: PCM decode of the lossy codecs
  * (MP3/Opus/Vorbis/AAC frames). That genuinely requires a codec
  * library — a dependency this build does not take — and the decode
  * seam is already proven by the real WAV path
  * ([[Multimodal.decodeAudio]]): a JNI codec drops into the same
  * per-partition-init slot with no plumbing change.
  *
  * The sandbox corpus has no real media bytes, so [[synthContainer]]
  * builds REAL container bytes (valid headers, frames, pages, boxes)
  * deterministically from each document's (doc_id, text length) — and
  * that determinism is what makes the probe oracle-checkable: the
  * DuckDB oracle replays the generator arithmetic, so a hash match
  * proves builder∘parser = identity on every metadata field over the
  * whole corpus, while MediaContainersSpec pins the parsers against
  * fixed byte vectors the builder never emits (padding bits, Vorbis
  * streams, 64-bit boxes, version-1 mvhd, truncations, garbage). */
object MediaContainers {

  /** One probed payload. `units` is the format's native length count
    * (MP3: frames; OGG: pages; FLAC: total samples; MP4: duration
    * ticks); `sample_rate` doubles as the MP4 timescale and `channels`
    * as its track count — one flat schema keeps the probe a single
    * columnar pass. `ok` is INT 0/1 for oracle-compare portability. */
  final case class MediaProbe(
      doc_id: Long,
      fmt: String,
      sample_rate: Int,
      channels: Int,
      units: Long,
      duration_ms: Long,
      ok: Int)

  private def failed(docId: Long) = MediaProbe(docId, "err", 0, 0, 0L, 0L, 0)

  // ------------------------------------------------------------ helpers
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  // ---------------------------------------------------------------- MP3
  object Mp3 {
    /** MPEG-1 Layer III bitrate table (kbps), index 1–14; 0 = free,
      * 15 = reserved — both rejected. */
    private val BitrateKbps =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    /** MPEG-1 sample-rate table, index 0–2; 3 = reserved. */
    private val SampleRate = Array(44100, 48000, 32000)
    val SamplesPerFrame = 1152

    /** Walk the frame chain. Trailing bytes that don't parse as a
      * whole frame (a truncated tail, an APEv2/ID3v1 trailer) end the
      * walk without failing — real MP3 files end that way; zero valid
      * frames is the failure. */
    def parse(docId: Long, b: Array[Byte]): MediaProbe = {
      var pos = 0
      // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        pos = 10 + size
      }
      var frames = 0L
      var sr = 0; var ch = 0
      while (pos >= 0 && pos + 4 <= b.length && {
        val ok = u8(b, pos) == 0xff && (u8(b, pos + 1) & 0xe0) == 0xe0 &&
          ((u8(b, pos + 1) >> 3) & 3) == 3 && // MPEG-1 only
          ((u8(b, pos + 1) >> 1) & 3) == 1    // Layer III only
        ok
      }) {
        val brIdx = (u8(b, pos + 2) >> 4) & 0xf
        val srIdx = (u8(b, pos + 2) >> 2) & 3
        if (brIdx < 1 || brIdx > 14 || srIdx > 2) pos = -1
        else {
          val pad = (u8(b, pos + 2) >> 1) & 1
          val mode = (u8(b, pos + 3) >> 6) & 3
          val flen = 144 * (BitrateKbps(brIdx) * 1000) / SampleRate(srIdx) + pad
          if (pos + flen > b.length) pos = -1 // truncated final frame
          else {
            if (frames == 0L) { sr = SampleRate(srIdx); ch = if (mode == 3) 1 else 2 }
            frames += 1; pos += flen
          }
        }
      }
      if (frames == 0L) failed(docId)
      else MediaProbe(docId, "mp3", sr, ch, frames,
        frames * SamplesPerFrame * 1000L / sr, 1)
    }

    /** Real CBR frames: ID3v2 tag of `docId % 100` body bytes, then
      * `1 + byteLen % 7` frames at 128 kbps, rate index `byteLen % 3`
      * (44100/48000/32000), mono when doc_id is odd. */
    def build(docId: Long, byteLen: Long): Array[Byte] = {
      val tagBody = (docId % 100).toInt
      val srIdx = (byteLen % 3).toInt
      val nFrames = (1 + byteLen % 7).toInt
      val flen = 144 * 128000 / SampleRate(srIdx)
      val out = new Array[Byte](10 + tagBody + nFrames * flen)
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3
      out(6) = ((tagBody >> 21) & 0x7f).toByte
      out(7) = ((tagBody >> 14) & 0x7f).toByte
      out(8) = ((tagBody >> 7) & 0x7f).toByte
      out(9) = (tagBody & 0x7f).toByte
      var pos = 10 + tagBody
      val fill = (docId & 0xff).toByte
      var f = 0
      while (f < nFrames) {
        out(pos) = 0xff.toByte
        out(pos + 1) = 0xfb.toByte                 // MPEG-1 L3, no CRC
        out(pos + 2) = ((9 << 4) | (srIdx << 2)).toByte // 128 kbps, no pad
        out(pos + 3) = (if (docId % 2 == 1) 0xc0 else 0x00).toByte
        java.util.Arrays.fill(out, pos + 4, pos + flen, fill)
        pos += flen; f += 1
      }
      out
    }
  }

  // ---------------------------------------------------------------- OGG
  object Ogg {
    /** Page walk + id-header sniff (Opus/Vorbis). Duration comes from
      * the last page's granule position minus the Opus pre-skip, on
      * the codec's granule clock (Opus: fixed 48 kHz; Vorbis: the id
      * header's rate). */
    def parse(docId: Long, b: Array[Byte]): MediaProbe = {
      var pos = 0
      var pages = 0L
      var lastGranule = 0L
      var preskip = 0
      var ch = 0
      var clock = 0
      var sawId = false
      var bad = false
      while (!bad && pos + 27 <= b.length && ascii(b, pos, 4) == "OggS") {
        if (u8(b, pos + 4) != 0) bad = true
        else {
          val granule = le64(b, pos + 6)
          val nseg = u8(b, pos + 26)
          if (pos + 27 + nseg > b.length) bad = true
          else {
            var payloadLen = 0
            var s = 0
            while (s < nseg) { payloadLen += u8(b, pos + 27 + s); s += 1 }
            val pOff = pos + 27 + nseg
            if (pOff + payloadLen > b.length) bad = true
            else {
              if (pages == 0L) {
                if (payloadLen >= 19 && ascii(b, pOff, 8) == "OpusHead") {
                  ch = u8(b, pOff + 9); preskip = le16(b, pOff + 10)
                  clock = 48000; sawId = true
                } else if (payloadLen >= 30 && u8(b, pOff) == 1 &&
                    ascii(b, pOff + 1, 6) == "vorbis") {
                  ch = u8(b, pOff + 11); clock = le32(b, pOff + 12).toInt
                  preskip = 0; sawId = true
                } else bad = true
              }
              if (!bad) {
                if (granule >= 0L) lastGranule = granule // -1 = no packet ends
                pages += 1; pos = pOff + payloadLen
              }
            }
          }
        }
      }
      if (pages == 0L || !sawId || clock <= 0) failed(docId)
      else MediaProbe(docId, "ogg", clock, ch, pages,
        math.max(0L, lastGranule - preskip) * 1000L / clock, 1)
    }

    /** One page with a single-segment payload (payload < 255 bytes by
      * construction here). CRC field left zero — see object scaladoc. */
    def page(htype: Int, granule: Long, seq: Int,
        payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255, "single-lacing builder")
      val out = new Array[Byte](27 + 1 + payload.length)
      out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
      out(5) = htype.toByte
      var i = 0
      while (i < 8) { out(6 + i) = ((granule >>> (8 * i)) & 0xff).toByte; i += 1 }
      out(18) = (seq & 0xff).toByte // serial stays 0; seq LE low byte; CRC 0
      out(26) = 1
      out(27) = payload.length.toByte
      System.arraycopy(payload, 0, out, 28, payload.length)
      out
    }

    /** Opus stream: BOS id page + `byteLen % 3` audio pages + EOS page
      * whose granule is `preskip + 960·(1 + byteLen % 50)` — i.e.
      * `20·(1 + byteLen % 50)` ms at the 48 kHz granule clock. */
    def build(docId: Long, byteLen: Long): Array[Byte] = {
      val ch = (1 + docId % 2).toInt
      val preskip = 312
      val samples = 960L * (1 + byteLen % 50)
      val id = new Array[Byte](19)
      "OpusHead".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(id)
      id(8) = 1; id(9) = ch.toByte
      id(10) = (preskip & 0xff).toByte; id(11) = ((preskip >> 8) & 0xff).toByte
      id(12) = (48000 & 0xff).toByte; id(13) = ((48000 >> 8) & 0xff).toByte
      val dataPages = (byteLen % 3).toInt
      val body = Array.fill(40)((docId & 0xff).toByte)
      val pagesBuf = scala.collection.mutable.ArrayBuffer(page(2, 0L, 0, id))
      var i = 0
      while (i < dataPages) {
        val g = math.min(preskip + 960L * (i + 1), preskip + samples)
        pagesBuf += page(0, g, i + 1, body)
        i += 1
      }
      pagesBuf += page(4, preskip + samples, dataPages + 1,
        Array.fill(10)((docId & 0xff).toByte))
      pagesBuf.flatten.toArray
    }
  }

  // --------------------------------------------------------------- FLAC
  object Flac {
    /** `fLaC` + first metadata block must be STREAMINFO (the spec
      * mandates it); rate/channels/bits/total unpacked from the
      * 64-bit bitfield. */
    def parse(docId: Long, b: Array[Byte]): MediaProbe = {
      if (b.length < 42 || ascii(b, 0, 4) != "fLaC") return failed(docId)
      if ((u8(b, 4) & 0x7f) != 0) return failed(docId) // STREAMINFO first
      if (be24(b, 5) < 34) return failed(docId)
      val v = be64(b, 18)
      val sr = ((v >>> 44) & 0xfffff).toInt
      val ch = (((v >>> 41) & 0x7) + 1).toInt
      val total = v & 0xfffffffffL // 36 bits
      if (sr <= 0) failed(docId)
      else MediaProbe(docId, "flac", sr, ch, total, total * 1000L / sr, 1)
    }

    def buildRaw(sr: Int, ch: Int, bps: Int, total: Long): Array[Byte] = {
      val out = new Array[Byte](42)
      out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
      out(4) = 0x80.toByte // last-metadata-block, type 0
      out(7) = 34          // STREAMINFO length
      out(8) = 0x10; out(9) = 0x00   // min block 4096
      out(10) = 0x10; out(11) = 0x00 // max block 4096
      val v = (sr.toLong << 44) | ((ch - 1).toLong << 41) |
        ((bps - 1).toLong << 36) | (total & 0xfffffffffL)
      var i = 0
      while (i < 8) { out(18 + i) = ((v >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
      out // md5 bytes 26–41 stay zero
    }

    /** Rate from {44100, 48000, 96000} by `byteLen % 3`; channel count
      * by doc parity; `4096·(1 + byteLen % 20)` total samples. */
    def build(docId: Long, byteLen: Long): Array[Byte] = {
      val sr = Array(44100, 48000, 96000)((byteLen % 3).toInt)
      buildRaw(sr, (1 + docId % 2).toInt, 16, 4096L * (1 + byteLen % 20))
    }
  }

  // ---------------------------------------------------------------- MP4
  object Mp4 {
    /** Top-level box walk, `moov` recursion: `mvhd` (version 0 or 1)
      * yields timescale+duration, `trak` children are counted. 64-bit
      * extended sizes and size-0 (extends to EOF) handled; a box that
      * overruns the payload fails the parse. */
    def parse(docId: Long, b: Array[Byte]): MediaProbe = {
      var pos = 0
      var timescale = 0L
      var duration = 0L
      var tracks = 0
      var sawMoov = false
      var bad = false
      while (!bad && pos + 8 <= b.length) {
        val size32 = be32(b, pos)
        val fourcc = ascii(b, pos + 4, 4)
        var hdr = 8
        val size =
          if (size32 == 1L) {
            if (pos + 16 > b.length) { bad = true; 0L }
            else { hdr = 16; be64(b, pos + 8) }
          } else if (size32 == 0L) (b.length - pos).toLong
          else size32
        if (!bad && (size < hdr || pos + size > b.length)) bad = true
        if (!bad) {
          if (fourcc == "moov") {
            sawMoov = true
            var c = pos + hdr
            val end = pos + size.toInt
            while (!bad && c + 8 <= end) {
              val cs32 = be32(b, c)
              val cc = ascii(b, c + 4, 4)
              var chdr = 8
              val cs =
                if (cs32 == 1L) {
                  if (c + 16 > end) { bad = true; 0L }
                  else { chdr = 16; be64(b, c + 8) }
                } else if (cs32 == 0L) (end - c).toLong
                else cs32
              if (!bad && (cs < chdr || c + cs > end)) bad = true
              if (!bad) {
                if (cc == "mvhd" && c + chdr + 4 <= end) {
                  val ver = u8(b, c + chdr)
                  if (ver == 0 && c + chdr + 20 <= end) {
                    timescale = be32(b, c + chdr + 12)
                    duration = be32(b, c + chdr + 16)
                  } else if (ver == 1 && c + chdr + 32 <= end) {
                    timescale = be32(b, c + chdr + 20)
                    duration = be64(b, c + chdr + 24)
                  }
                } else if (cc == "trak") tracks += 1
                c += cs.toInt
              }
            }
          }
          if (!bad) pos += size.toInt
        }
      }
      if (bad || !sawMoov || timescale <= 0L) failed(docId)
      else MediaProbe(docId, "mp4", timescale.toInt, tracks, duration,
        duration * 1000L / timescale, 1)
    }

    private def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      val size = out.length.toLong
      out(0) = ((size >>> 24) & 0xff).toByte; out(1) = ((size >>> 16) & 0xff).toByte
      out(2) = ((size >>> 8) & 0xff).toByte; out(3) = (size & 0xff).toByte
      fourcc.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(out, 4)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }

    private def mvhdV0(timescale: Long, duration: Long): Array[Byte] = {
      val body = new Array[Byte](100) // fullbox(4)+ctime(4)+mtime(4)+ts(4)+dur(4)+rest zeros
      def putBe32(off: Int, v: Long): Unit = {
        body(off) = ((v >>> 24) & 0xff).toByte; body(off + 1) = ((v >>> 16) & 0xff).toByte
        body(off + 2) = ((v >>> 8) & 0xff).toByte; body(off + 3) = (v & 0xff).toByte
      }
      putBe32(12, timescale); putBe32(16, duration)
      box("mvhd", body)
    }

    /** ftyp + moov(mvhd + traks): timescale from {600, 1000, 90000}
      * by `byteLen % 3`, duration `100·(1 + byteLen % 30)` ticks,
      * `1 + docId % 2` tracks (tkhd-only trak stubs). */
    def build(docId: Long, byteLen: Long): Array[Byte] = {
      val ts = Array(600, 1000, 90000)((byteLen % 3).toInt)
      val dur = 100L * (1 + byteLen % 30)
      val nTrak = (1 + docId % 2).toInt
      val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0))
      val traks = (0 until nTrak)
        .map(_ => box("trak", box("tkhd", new Array[Byte](84))))
      val moov = box("moov", (mvhdV0(ts, dur) +: traks).flatten.toArray)
      ftyp ++ moov
    }
  }

  /** Magic-sniffing dispatch — the probe never needs to be told the
    * format (a real lake's payload column carries mixed media). */
  def probe(docId: Long, b: Array[Byte]): MediaProbe =
    if (b.length >= 4 && ascii(b, 0, 4) == "OggS") Ogg.parse(docId, b)
    else if (b.length >= 4 && ascii(b, 0, 4) == "fLaC") Flac.parse(docId, b)
    else if (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      Mp3.parse(docId, b)
    else if (b.length >= 2 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0)
      Mp3.parse(docId, b)
    else if (b.length >= 8 && ascii(b, 4, 4) == "ftyp") Mp4.parse(docId, b)
    else failed(docId)

  /** Deterministic per-document container: format cycles with
    * `doc_id % 4` (mp3/ogg/flac/mp4); every 29th document gets
    * unparseable bytes to keep the corrupt-as-data path exercised at
    * corpus scale. */
  def synthContainer(docId: Long, byteLen: Long): Array[Byte] =
    if (docId % 29 == 0)
      Array(0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte, 0x00.toByte)
    else (docId % 4) match {
      case 0 => Mp3.build(docId, byteLen)
      case 1 => Ogg.build(docId, byteLen)
      case 2 => Flac.build(docId, byteLen)
      case _ => Mp4.build(docId, byteLen)
    }

  // --------------------------------------------------------------- q133
  /** Container-metadata probe over the whole corpus: build the real
    * bytes, parse them back through the magic-sniffing probe — one
    * map-only pass (no shuffle except the presentation sort), the
    * exact shape a first-pass media filter has at 100 TB. The oracle
    * replays the GENERATOR arithmetic, so a hash match proves the
    * parsers recover every planted field from real container bytes. */
  def q133MediaProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("bl"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // per-partition init slot (amortized codec/table setup in a
        // real decoder); these parsers are allocation-light pure fns
        it.map { case (id, bl) => probe(id, synthContainer(id, bl)) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_media_probe" -> (q133MediaProbe _))

  val oracle: Map[String, String] = Map(
    "q133_media_probe" ->
      """WITH d AS (SELECT doc_id, length(text) AS bl FROM documents),
        |p AS (
        | SELECT doc_id, bl,
        |  CASE WHEN doc_id % 29 = 0 THEN 'err'
        |       WHEN doc_id % 4 = 0 THEN 'mp3'
        |       WHEN doc_id % 4 = 1 THEN 'ogg'
        |       WHEN doc_id % 4 = 2 THEN 'flac'
        |       ELSE 'mp4' END AS fmt
        | FROM d)
        |SELECT doc_id, fmt,
        | CAST(CASE fmt
        |   WHEN 'mp3'  THEN CASE bl % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
        |   WHEN 'ogg'  THEN 48000
        |   WHEN 'flac' THEN CASE bl % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 96000 END
        |   WHEN 'mp4'  THEN CASE bl % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END
        |   ELSE 0 END AS INT) AS sample_rate,
        | CAST(CASE fmt
        |   WHEN 'mp3'  THEN 2 - doc_id % 2
        |   WHEN 'ogg'  THEN 1 + doc_id % 2
        |   WHEN 'flac' THEN 1 + doc_id % 2
        |   WHEN 'mp4'  THEN 1 + doc_id % 2
        |   ELSE 0 END AS INT) AS channels,
        | CAST(CASE fmt
        |   WHEN 'mp3'  THEN 1 + bl % 7
        |   WHEN 'ogg'  THEN 2 + bl % 3
        |   WHEN 'flac' THEN 4096 * (1 + bl % 20)
        |   WHEN 'mp4'  THEN 100 * (1 + bl % 30)
        |   ELSE 0 END AS BIGINT) AS units,
        | CAST(CASE fmt
        |   WHEN 'mp3'  THEN ((1 + bl % 7) * 1152 * 1000)
        |     // (CASE bl % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)
        |   WHEN 'ogg'  THEN 20 * (1 + bl % 50)
        |   WHEN 'flac' THEN (4096 * (1 + bl % 20) * 1000)
        |     // (CASE bl % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 96000 END)
        |   WHEN 'mp4'  THEN (100 * (1 + bl % 30) * 1000)
        |     // (CASE bl % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END)
        |   ELSE 0 END AS BIGINT) AS duration_ms,
        | CAST(CASE WHEN fmt = 'err' THEN 0 ELSE 1 END AS INT) AS ok
        |FROM p ORDER BY doc_id""".stripMargin)
}
