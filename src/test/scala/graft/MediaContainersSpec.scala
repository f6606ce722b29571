package graft

import graft.queries.MediaContainers
import graft.queries.MediaContainers.{Flac, MediaProbe, Mp3, Mp4, Ogg}

/** Byte-vector pins for the compressed-media container parsers —
  * including shapes the deterministic builder never emits (padding
  * bits, Vorbis streams, version-1 mvhd, 64-bit boxes, truncations),
  * so the parsers are proven against the FORMATS, not just against
  * their own round-trip. */
class MediaContainersSpec extends SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  /** The oracle arithmetic, in Scala — one place, shared by the
    * round-trip test so a drift between builder, parser, and the
    * DuckDB oracle SQL cannot hide. */
  private def expected(docId: Long, bl: Long): MediaProbe = {
    if (docId % 29 == 0) return MediaProbe(docId, "err", 0, 0, 0L, 0L, 0)
    (docId % 4) match {
      case 0 =>
        val sr = Array(44100, 48000, 32000)((bl % 3).toInt)
        val frames = 1 + bl % 7
        MediaProbe(docId, "mp3", sr, (2 - docId % 2).toInt, frames,
          frames * 1152 * 1000 / sr, 1)
      case 1 =>
        MediaProbe(docId, "ogg", 48000, (1 + docId % 2).toInt, 2 + bl % 3,
          20 * (1 + bl % 50), 1)
      case 2 =>
        val sr = Array(44100, 48000, 96000)((bl % 3).toInt)
        val total = 4096L * (1 + bl % 20)
        MediaProbe(docId, "flac", sr, (1 + docId % 2).toInt, total,
          total * 1000 / sr, 1)
      case _ =>
        val ts = Array(600, 1000, 90000)((bl % 3).toInt)
        val dur = 100L * (1 + bl % 30)
        MediaProbe(docId, "mp4", ts, (1 + docId % 2).toInt, dur,
          dur * 1000 / ts, 1)
    }
  }

  test("round-trip: builder∘parser = identity over every format branch") {
    // covers all fmt × rate-index × parity × corrupt combinations
    for (docId <- 0L to 31L; bl <- Seq(0L, 1L, 2L, 5L, 29L, 157L, 406L, 4099L)) {
      val got = MediaContainers.probe(docId, MediaContainers.synthContainer(docId, bl))
      assert(got == expected(docId, bl), s"docId=$docId bl=$bl")
    }
  }

  test("mp3: ID3-less stream, padding bit, and truncated tail") {
    // two frames at 44100/128k: first padded (418 B), second not (417 B)
    val f1 = Array(0xff, 0xfb, 0x92, 0x00).map(_.toByte) ++ new Array[Byte](414)
    val f2 = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte) ++ new Array[Byte](413)
    val two = Mp3.parse(7L, f1 ++ f2)
    assert(two == MediaProbe(7L, "mp3", 44100, 2, 2L, 2L * 1152 * 1000 / 44100, 1))
    // truncating the second frame mid-body drops it but keeps the first
    val trunc = Mp3.parse(7L, (f1 ++ f2).dropRight(10))
    assert(trunc.units == 1L && trunc.ok == 1)
    // an ID3v1-style trailer after the last frame ends the walk cleanly
    val trailer = Mp3.parse(7L, f1 ++ "TAGsomething".getBytes("US-ASCII"))
    assert(trailer.units == 1L && trailer.ok == 1)
    // reserved bitrate index (15) in the only frame = no valid frames
    val bad = Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte) ++ new Array[Byte](400)
    assert(Mp3.parse(7L, bad).ok == 0)
    assert(Mp3.parse(7L, "garbage bytes".getBytes("US-ASCII")).ok == 0)
  }

  test("mp3: mono mode bits and 48 kHz rate index decode") {
    val p = MediaContainers.probe(3L, Mp3.build(3L, 1L)) // odd id = mono; bl%3=1 = 48000
    assert(p.channels == 1 && p.sample_rate == 48000)
  }

  test("ogg: hand-built Vorbis stream uses the id header's rate as clock") {
    val id = new Array[Byte](30)
    id(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(id, 1)
    id(11) = 2 // channels
    id(12) = (44100 & 0xff).toByte; id(13) = ((44100 >> 8) & 0xff).toByte
    val bos = Ogg.page(2, 0L, 0, id)
    val eos = Ogg.page(4, 44100L * 3, 1, new Array[Byte](8))
    val p = Ogg.parse(5L, bos ++ eos)
    assert(p == MediaProbe(5L, "ogg", 44100, 2, 2L, 3000L, 1))
  }

  test("ogg: truncated page header / foreign first packet fail as data") {
    val good = Ogg.build(1L, 10L)
    assert(Ogg.parse(1L, good.dropRight(good.length - 20)).ok == 0)
    val alien = Ogg.page(2, 0L, 0, "NotAnIdHeaderHere123".getBytes("US-ASCII"))
    assert(Ogg.parse(1L, alien).ok == 0)
  }

  test("flac: 36-bit total-sample count and 20-bit rate unpack exactly") {
    val total = (1L << 35) + 5L
    val p = Flac.parse(9L, Flac.buildRaw(655350, 8, 24, total))
    assert(p.sample_rate == 655350 && p.channels == 8 && p.units == total)
    assert(p.duration_ms == total * 1000L / 655350)
    // first metadata block not STREAMINFO = refuse
    val wrongType = Flac.buildRaw(44100, 2, 16, 100L)
    wrongType(4) = 0x84.toByte // type 4 (VORBIS_COMMENT)
    assert(Flac.parse(9L, wrongType).ok == 0)
    assert(Flac.parse(9L, "fLaX".getBytes("US-ASCII") ++ new Array[Byte](40)).ok == 0)
  }

  test("mp4: version-1 mvhd, 64-bit box size, unknown boxes skipped") {
    def box(cc: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ cc.getBytes("US-ASCII") ++ body
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(90000L) ++ be64(270000L)) // v1: ts after 8-byte times
    val trak = box("trak", box("tkhd", new Array[Byte](84)))
    val moovBody = mvhd1 ++ trak ++ trak ++ trak
    // moov with a 64-bit extended size header
    val moov64 = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moovBody.length) ++ moovBody
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4))
    val free = box("free", new Array[Byte](11))
    val p = Mp4.parse(4L, ftyp ++ free ++ moov64)
    assert(p == MediaProbe(4L, "mp4", 90000, 3, 270000L, 3000L, 1))
    // no moov anywhere = failure, not zeros
    assert(Mp4.parse(4L, ftyp ++ free).ok == 0)
    // a child box overrunning moov = failure
    val overrun = box("moov", be32(9999L) ++ "mvhd".getBytes("US-ASCII"))
    assert(Mp4.parse(4L, ftyp ++ overrun).ok == 0)
  }

  test("q133 probes the corpus map-only and matches the generator math") {
    val rows = MediaContainers.q133MediaProbe(spark, sfDir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val got = MediaProbe(r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getInt(6))
      val bl = sparkTextLen(got.doc_id)
      assert(got == expected(got.doc_id, bl), s"doc ${got.doc_id}")
    }
    // map-only: no exchange below the presentation sort
    val plan = MediaContainers.q133MediaProbe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      "probe must not hash-exchange — it is a per-row map pass")
  }

  private lazy val textLens: Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
  private def sparkTextLen(docId: Long): Long = textLens(docId)
}
