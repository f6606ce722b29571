package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.AdpcmCodec

/** [[graft.functions.AdpcmCodec]] — the lossy audio member (r17).
  * Unlike FLAC there is no lossless round-trip to pin; the contracts
  * are: decode∘encode is DETERMINISTIC and equals an independent
  * in-test replay of the published state machine; quantization error
  * is bounded by the adaptive step; stereo interleaving and
  * multi-block framing round-trip; corrupt payloads are Left, never
  * a wrong sample. */
class AdpcmCodecSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  /** Independent replay of the IMA recommendation: same tables, the
    * arithmetic written against the spec text (not the codec's
    * methods), consuming the INPUT signal like the encoder does. */
  private def replay(xs: Array[Int]): Array[Int] = {
    val step = AdpcmCodec.StepTab
    val itab = AdpcmCodec.IdxTab
    val out = new Array[Int](xs.length)
    out(0) = xs(0)
    var pred = xs(0)
    var idx = 0
    var t = 1
    while (t < xs.length) {
      val s = step(idx)
      val diff = xs(t) - pred
      var d = math.abs(diff)
      var q = 0
      if (d >= s) { q |= 4; d -= s }
      if (d >= s / 2) { q |= 2; d -= s / 2 }
      if (d >= s / 4) q |= 1
      val vp = s / 8 + (if ((q & 4) != 0) s else 0) +
        (if ((q & 2) != 0) s / 2 else 0) + (if ((q & 1) != 0) s / 4 else 0)
      pred = math.max(-32768, math.min(32767,
        if (diff < 0) pred - vp else pred + vp))
      idx = math.max(0, math.min(88, idx + itab(q)))
      out(t) = pred
      t += 1
    }
    out
  }

  test("decode∘encode equals the independent state-machine replay") {
    val clipGen = for {
      n <- Gen.choose(2, 700)
      amp <- Gen.oneOf(60, 800, 20000)
      xs <- Gen.listOfN(n, Gen.choose(-amp, amp))
    } yield xs.toArray
    samples(clipGen, 30).zipWithIndex.foreach { case (xs, i) =>
      val enc = AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 249)
      val dec = AdpcmCodec.decode(enc)
      assert(dec.isRight, s"case $i: ${dec.left}")
      val got = dec.toOption.get
      assert(got.sampleRate == 8000 && got.channels == 1)
      // every block restarts at its own verbatim first sample with
      // the header-carried index (0) — replay per block
      val want = xs.grouped(249).flatMap(replay).toArray
      assert(got.samples(0).toSeq == want.toSeq, s"case $i diverged")
    }
  }

  test("the codec is genuinely lossy, with step-bounded error") {
    // a jumpy signal cannot be represented exactly in 4 bits/sample
    val xs = Array.tabulate(200)(i => ((i * i * 97) % 30011) - 15005)
    val dec = AdpcmCodec.decode(
      AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 201))
      .toOption.get.samples(0)
    assert(dec.toSeq != xs.toSeq, "4-bit ADPCM reproduced a wild signal exactly?")
    // but the first sample is verbatim and the decode tracks the input
    assert(dec(0) == xs(0))
    val replayed = replay(xs)
    assert(dec.toSeq == replayed.toSeq)
  }

  test("stereo interleaving and multi-block framing round-trip the replay") {
    val l = Array.tabulate(500)(i => ((i * 37) % 2801) - 1400)
    val r = Array.tabulate(500)(i => ((i * 53 + 7) % 3301) - 1650)
    // 500 samples, 57 per block → 9 blocks, final block padded
    val enc = AdpcmCodec.encode(Array(l, r), 16000, samplesPerBlock = 57)
    val got = AdpcmCodec.decode(enc).toOption.get
    assert(got.channels == 2 && got.sampleRate == 16000)
    assert(got.samples(0).length == 500 && got.samples(1).length == 500)
    // per-block independent replay: each block restarts at its own
    // verbatim first sample with index carried in the header (0)
    def blockReplay(xs: Array[Int], spb: Int): Array[Int] =
      xs.grouped(spb).flatMap(replay).toArray
    assert(got.samples(0).toSeq == blockReplay(l, 57).toSeq, "left channel")
    assert(got.samples(1).toSeq == blockReplay(r, 57).toSeq, "right channel")
  }

  test("legal RIFF orderings decode identically: fact after data, odd-length chunks") {
    // 100 samples, 57/block → 2 blocks with padding the fact total
    // must clip away even when fact FOLLOWS data (legal RIFF ordering;
    // advice-low r17: the scanner used to stop at data and decode the
    // encoder padding as real samples)
    val xs = Array.tabulate(100)(i => (i * 41 % 1201) - 600)
    val enc = AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 57)
    val want = AdpcmCodec.decode(enc).toOption.get
    assert(want.samples(0).length == 100)
    // rebuild: RIFF(12) ++ fmt(8+20) ++ [LIST odd chunk] ++ data ++ fact
    val riff = enc.slice(0, 12)
    val fmt = enc.slice(12, 40)
    val fact = enc.slice(40, 52)
    val data = enc.slice(52, enc.length)
    val odd = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](7, 8, 9) ++
      Array[Byte](0) // 3-byte body + RIFF pad byte
    val reordered = riff ++ fmt ++ odd ++ data ++ fact
    val got = AdpcmCodec.decode(reordered)
    assert(got.isRight, s"reordered stream rejected: $got")
    assert(got.toOption.get.samples(0).toSeq == want.samples(0).toSeq,
      "fact-after-data decoded differently (padding leaked as samples?)")
    // without ANY fact chunk the total honestly falls back to whole
    // blocks (114 samples incl. padding) — the ordering fix must not
    // invent a total
    val noFact = riff ++ fmt ++ data
    assert(AdpcmCodec.decode(noFact).toOption.get.samples(0).length == 114)
    // two data chunks are corrupt, not silently first-wins
    assert(AdpcmCodec.decode(riff ++ fmt ++ data ++ data ++ fact).isLeft)
  }

  test("trailing garbage after fmt+data is tolerated; before them it is fatal") {
    // encoder footers / torn copies past the payload are common in the
    // wild — once fmt and data are in hand, a malformed trailing chunk
    // stops the scan instead of rejecting the file (advice-low, r19)
    val xs = Array.tabulate(100)(i => (i * 41 % 1201) - 600)
    val enc = AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 57)
    val want = AdpcmCodec.decode(enc).toOption.get.samples(0).toSeq
    // ≥8 bytes that parse as a tag with an absurd length
    val garbage = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 127) ++ Array[Byte](1, 2, 3)
    val got = AdpcmCodec.decode(enc ++ garbage)
    assert(got.isRight, s"trailing garbage rejected a decodable file: $got")
    assert(got.toOption.get.samples(0).toSeq == want)
    // under 8 trailing bytes never even looked like a chunk — still fine
    assert(AdpcmCodec.decode(enc ++ Array[Byte](9, 9, 9)).isRight)
    // but garbage BEFORE data (fmt parsed, data not yet) is still fatal:
    // the file's payload genuinely cannot be located
    val riff = enc.slice(0, 12)
    val fmt = enc.slice(12, 40)
    val rest = enc.slice(40, enc.length) // fact ++ data
    assert(AdpcmCodec.decode(riff ++ fmt ++ garbage ++ rest).isLeft,
      "garbage before the data chunk must stay fatal")
  }

  test("corrupt payloads are Left, never a wrong sample") {
    val xs = Array.tabulate(121)(i => (i * 31 % 997) - 498)
    val enc = AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 121)
    assert(AdpcmCodec.decode(enc.take(enc.length / 2)).isLeft, "truncated")
    assert(AdpcmCodec.decode(Array[Byte](1, 2, 3)).isLeft, "garbage")
    assert(AdpcmCodec.decode(enc.take(11)).isLeft, "header only")
    // flip the fmt tag to PCM: honest not-IMA Left (the decodeAudio
    // seam then falls through to the JDK path)
    val pcmTag = enc.clone()
    pcmTag(20) = 1
    assert(AdpcmCodec.decode(pcmTag).isLeft)
    // a step index out of range is corrupt, not a crash
    val badIdx = enc.clone()
    val dataOff = enc.indexOfSlice("data".getBytes) + 8
    badIdx(dataOff + 2) = 120.toByte // channel header index byte
    assert(AdpcmCodec.decode(badIdx).isLeft)
  }

  test("decodeAudio routes WAV/IMA payloads through the codec, corrupt as data") {
    import spark.implicits._
    val xs = Array.tabulate(57)(i => (i * 13 % 301) - 150)
    val enc = AdpcmCodec.encode(Array(xs), 8000, samplesPerBlock = 57)
    val rows = graft.queries.Multimodal.decodeAudio(
        Seq((1L, enc), (2L, enc.take(enc.length / 3))).toDS())
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(4), r.getLong(5))).toMap
    val want = replay(xs)
    assert(rows(1L) == ((true, 57L, want.map(_.toLong).sum)))
    assert(rows(2L)._1 == false, "truncated ADPCM must be an ok=false row")
  }
}
