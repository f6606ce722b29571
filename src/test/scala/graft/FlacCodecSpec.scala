package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FlacCodec
import graft.functions.FlacCodec.{BitWriter, crc8, crc16, writeUtf8Num}

/** FLAC codec kernels: lossless round-trip over every encoder mode,
  * decoder-only format features exercised on HAND-BUILT bitstreams
  * (LPC, rice2, partitioned residuals, wasted bits — bytes we
  * constructed from the spec, not bytes the encoder produced), and
  * the corrupt-as-data contract on malformed input. */
class FlacCodecSpec extends AnyFunSuite {

  private def pcm(seed: Long, ch: Int, n: Int): Array[Array[Int]] =
    Array.tabulate(ch, n) { (c, i) =>
      val r = new scala.util.Random(seed * 7919 + c * 104729 + i)
      // mix of smooth + noise so FIXED orders 0-2 all get picked
      (math.sin(i / 9.0) * 5000).toInt + r.nextInt(101) - 50
    }

  private def roundTrip(samples: Array[Array[Int]], sr: Int,
      blockSize: Int, mode: Int, bps: Int = 16): Unit = {
    val bytes = FlacCodec.encode(samples, sr, bps, blockSize, mode)
    FlacCodec.decode(bytes) match {
      case Left(e) => fail(s"decode failed: $e (mode=$mode bs=$blockSize)")
      case Right(d) =>
        assert(d.sampleRate == sr && d.channels == samples.length &&
          d.bps == bps)
        samples.indices.foreach { c =>
          assert(d.samples(c).toSeq == samples(c).toSeq,
            s"channel $c differs (mode=$mode bs=$blockSize)")
        }
    }
  }

  test("lossless round-trip: mono/stereo, all stereo modes, partial final frame") {
    // n deliberately NOT a blocksize multiple → final partial frame
    roundTrip(pcm(1, 1, 700), 44100, 256, 0)
    (0 to 3).foreach(m => roundTrip(pcm(2 + m, 2, 700), 48000, 256, m))
    // blocksize larger than the clip → single short frame
    roundTrip(pcm(9, 2, 100), 8000, 4096, 3)
    // 8-bit samples
    val small = pcm(11, 1, 300).map(_.map(_ % 120))
    roundTrip(small, 16000, 192, 0, bps = 8)
  }

  test("round-trip property: 40 seeded random shape/mode/bps configs") {
    val rnd = new scala.util.Random(7)
    (0 until 40).foreach { t =>
      val ch = 1 + rnd.nextInt(2)
      val n = 1 + rnd.nextInt(1500)
      val bps = if (rnd.nextBoolean()) 16 else 8
      val lim = if (bps == 16) 32768 else 128
      val samples = Array.fill(ch, n)(rnd.nextInt(2 * lim) - lim)
      val bs = Seq(192, 256, 576, 1024)(rnd.nextInt(4))
      val mode = if (ch == 2) rnd.nextInt(4) else 0
      val sr = 8000 + rnd.nextInt(90000)
      withClue(s"config $t: ch=$ch n=$n bps=$bps bs=$bs mode=$mode") {
        roundTrip(samples, sr, bs, mode, bps)
      }
    }
  }

  test("constant, tiny, and empty clips") {
    roundTrip(Array(Array.fill(500)(-123)), 8000, 256, 0) // CONSTANT
    roundTrip(Array(Array(42)), 8000, 256, 0)             // 1 sample
    val empty = FlacCodec.encode(Array(Array.emptyIntArray), 8000)
    assert(FlacCodec.decode(empty).exists(_.samples(0).isEmpty))
  }

  test("corrupt payloads are Left, never a wrong sample") {
    val good = FlacCodec.encode(pcm(3, 2, 600), 44100, 16, 256, 3)
    assert(FlacCodec.decode(good).isRight)
    assert(FlacCodec.decode("nope".getBytes).isLeft)
    assert(FlacCodec.decode(good.take(10)).isLeft)
    assert(FlacCodec.decode(good.take(good.length / 2)).isLeft)
    // flip one bit mid-frame → a CRC must catch it (or the parse dies);
    // either way the contract is Left, not silently-wrong samples
    val flipped = good.clone()
    flipped(good.length - 20) = (flipped(good.length - 20) ^ 0x10).toByte
    assert(FlacCodec.decode(flipped).isLeft, "bit flip went unnoticed")
  }

  /** Hand-build one mono frame around the given subframe-writer so
    * decoder-only features can be pinned from spec-constructed bytes.
    * Returns the full stream (STREAMINFO + frame). */
  private def handStream(blockSize: Int, bps: Int, total: Int)(
      writeSubframe: BitWriter => Unit): Array[Byte] = {
    val head = graft.queries.MediaContainers.Flac.buildRaw(8000, 1, bps, total)
    val bw = new BitWriter
    bw.writeBits(0x3ffe, 14); bw.writeBits(0, 1); bw.writeBits(0, 1)
    bw.writeBits(0x7, 4)  // 16-bit blocksize follows
    bw.writeBits(0x0, 4)  // rate from STREAMINFO
    bw.writeBits(0x0, 4)  // 1 channel
    bw.writeBits(if (bps == 16) 0x4 else 0x1, 3)
    bw.writeBits(0, 1)
    writeUtf8Num(bw, 0L)
    bw.writeBits((blockSize - 1).toLong, 16)
    bw.bytes += crc8(bw.bytes.toArray, 0, bw.bytes.length).toByte
    writeSubframe(bw)
    bw.alignByte()
    val body0 = bw.bytes.toArray
    val c = crc16(body0, 0, body0.length)
    bw.bytes += ((c >> 8) & 0xff).toByte
    bw.bytes += (c & 0xff).toByte
    head ++ bw.bytes.toArray
  }

  test("decoder-only: LPC subframe with rice2 + partitioned residuals") {
    // order-2 LPC: s[k] = r[k] + ((3*s[k-1] - s[k-2]) >> 2)
    val warm = Array(100, 90)
    val res = Array(5, -3, 0, 2, -1, 7) // blockSize 8, order 2
    val bytes = handStream(8, 16, 8) { bw =>
      bw.writeBits(0, 1)
      bw.writeBits(32L | 1L, 6) // LPC, order 2
      bw.writeBits(0, 1)        // no wasted bits
      warm.foreach(s => bw.writeBits(s.toLong & 0xffff, 16))
      bw.writeBits(11L, 4)      // precision 12
      bw.writeBits(2L, 5)       // shift 2
      bw.writeBits(3L & 0xfff, 12)          // c0 = 3
      bw.writeBits(-1L & 0xfff, 12)         // c1 = -1
      bw.writeBits(1, 2)        // rice2 (5-bit params)
      bw.writeBits(1, 4)        // partition order 1 → two partitions
      // partition 0: blockSize/2 - order = 2 residuals, param 2
      bw.writeBits(2L, 5)
      res.take(2).foreach { r =>
        val u = (r << 1) ^ (r >> 31)
        bw.writeUnary(u >>> 2); bw.writeBits(u.toLong & 3, 2)
      }
      // partition 1: 4 residuals, param 3
      bw.writeBits(3L, 5)
      res.drop(2).foreach { r =>
        val u = (r << 1) ^ (r >> 31)
        bw.writeUnary(u >>> 3); bw.writeBits(u.toLong & 7, 3)
      }
    }
    val expected = {
      val s = warm ++ new Array[Int](6)
      (2 until 8).foreach(k =>
        s(k) = res(k - 2) + ((3 * s(k - 1) - s(k - 2)) >> 2))
      s.toSeq
    }
    FlacCodec.decode(bytes) match {
      case Left(e) => fail(s"LPC decode failed: $e")
      case Right(d) => assert(d.samples(0).toSeq == expected)
    }
  }

  test("decoder-only: wasted bits shift decoded samples back up") {
    // VERBATIM at bps-1 with wasted=1 ⇒ every sample even, ×2
    val vals = Array(10, -20, 30, -40)
    val bytes = handStream(4, 16, 4) { bw =>
      bw.writeBits(0, 1)
      bw.writeBits(1L, 6)  // VERBATIM
      bw.writeBits(1, 1)   // wasted-bits flag
      bw.writeUnary(0)     // unary 0 ⇒ wasted = 1
      vals.foreach(v => bw.writeBits(v.toLong & 0x7fff, 15)) // 16-1 bits
    }
    FlacCodec.decode(bytes) match {
      case Left(e) => fail(s"wasted-bits decode failed: $e")
      case Right(d) => assert(d.samples(0).toSeq == vals.map(_ * 2).toSeq)
    }
  }

  test("rice escape partitions decode as raw n-bit residuals") {
    // FIXED order 0, rice 4-bit param = escape (0b1111) → 5-bit raw
    // size, residuals stored verbatim
    val vals = Array(3, -4, 7, 0)
    val bytes = handStream(4, 16, 4) { bw =>
      bw.writeBits(0, 1)
      bw.writeBits(8L, 6)  // FIXED order 0
      bw.writeBits(0, 1)
      bw.writeBits(0, 2)   // rice 4-bit
      bw.writeBits(0, 4)   // partition order 0
      bw.writeBits(0xfL, 4) // escape
      bw.writeBits(5L, 5)  // raw 5-bit residuals
      vals.foreach(v => bw.writeBits(v.toLong & 0x1f, 5))
    }
    FlacCodec.decode(bytes) match {
      case Left(e) => fail(s"escape decode failed: $e")
      case Right(d) => assert(d.samples(0).toSeq == vals.toSeq)
    }
  }

  test("utf8-coded frame numbers round-trip across byte-count boundaries") {
    Seq(0L, 1L, 0x7fL, 0x80L, 0x7ffL, 0x800L, 0xffffL, 0x10000L,
      0x1fffffL, 0x3ffffffL, 0x7fffffffL, (1L << 36) - 1).foreach { v =>
      val bw = new BitWriter
      writeUtf8Num(bw, v)
      val br = new FlacCodec.BitReader(bw.bytes.toArray)
      assert(FlacCodec.readUtf8Num(br) == v, s"v=$v")
    }
  }
}
