package graft.functions

/** IMA ADPCM (WAVE format tag 0x11) codec — the LOSSY member of the
  * audio codec family (r17; VERDICT r15/r16 "What's missing" carried
  * item). Implemented from the public specification (IMA Digital
  * Audio Focus/Technical Working Groups recommended ADPCM, 1992; the
  * `WAVE_FORMAT_IMA_ADPCM` container layout from the Multimedia
  * Programming Interface and Data Specifications / RIFF registry;
  * reference behavior `/root/reference/readme.md` media rows).
  *
  * Why THIS lossy codec and not MP3/Vorbis: the engine's correctness
  * discipline requires decoded output an independent oracle can
  * replay digit for digit. MP3/Vorbis decode is float DSP
  * (IMDCT/synthesis filterbanks) whose bit-exactness is
  * implementation-defined — a from-scratch decoder could not be
  * oracle-gated, and a binary codec dependency is unavailable here
  * (its documented slot remains [[graft.queries.Multimodal.decodeAudio]]'s
  * per-partition init hook). IMA ADPCM is genuinely lossy (4 bits per
  * 16-bit sample, adaptive quantization) AND exactly specified over
  * integers: encoder and decoder share one reconstruction rule, so
  * `decode ∘ encode` is deterministic and a DuckDB recursive CTE can
  * replay the whole state machine independently (q155 — the same
  * gate discipline as q151's lossless FLAC member).
  *
  * Coverage: mono and stereo, any fixed samples-per-block (4-byte
  * channel header: initial 16-bit predictor = the block's first
  * sample, step index, reserved byte; then 4-byte nibble groups
  * interleaved per channel, low nibble first). Truncated or
  * malformed payloads are honest `Left` — corrupt is data, never a
  * wrong sample. */
object AdpcmCodec {

  final case class Decoded(sampleRate: Int, channels: Int,
      samples: Array[Array[Int]]) // samples(channel)(i)

  /** The 89-entry step-size table of the IMA recommendation. */
  private[graft] val StepTab: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment by the nibble's magnitude bits (nibble & 7). */
  private[graft] val IdxTab: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampPred(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  private def clampIdx(v: Int): Int =
    if (v < 0) 0 else if (v > 88) 88 else v

  /** One quantize step: (nibble, newPred, newIdx) for input `x` under
    * state (pred, idx). The reconstruction inside IS the decoder —
    * encoder and decoder share it by construction, which is what
    * makes decode∘encode deterministic. */
  private[graft] def encStep(x: Int, pred: Int, idx: Int): (Int, Int, Int) = {
    val step = StepTab(idx)
    val diff = x - pred
    val sign = if (diff < 0) 8 else 0
    var d = if (diff < 0) -diff else diff
    var q = 0
    if (d >= step) { q |= 4; d -= step }
    if (d >= (step >> 1)) { q |= 2; d -= step >> 1 }
    if (d >= (step >> 2)) q |= 1
    val vpdiff = (step >> 3) +
      (if ((q & 4) != 0) step else 0) +
      (if ((q & 2) != 0) step >> 1 else 0) +
      (if ((q & 1) != 0) step >> 2 else 0)
    val p2 = clampPred(if (sign != 0) pred - vpdiff else pred + vpdiff)
    (sign | q, p2, clampIdx(idx + IdxTab(q)))
  }

  /** One dequantize step: (newPred, newIdx) — the shared
    * reconstruction rule, reading a stored nibble. */
  private[graft] def decStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = StepTab(idx)
    val q = nib & 7
    val vpdiff = (step >> 3) +
      (if ((q & 4) != 0) step else 0) +
      (if ((q & 2) != 0) step >> 1 else 0) +
      (if ((q & 1) != 0) step >> 2 else 0)
    val p2 = clampPred(if ((nib & 8) != 0) pred - vpdiff else pred + vpdiff)
    (p2, clampIdx(idx + IdxTab(q)))
  }

  // ------------------------------------------------------------ encode

  /** Encode PCM to a WAVE_FORMAT_IMA_ADPCM (0x11) RIFF stream. All
    * channels must share a length; `samplesPerBlock` must be
    * 1 + 8·k. The initial step index of every block is 0 (stored in
    * the header, so any conformant decoder agrees). */
  def encode(pcm: Array[Array[Int]], sampleRate: Int,
      samplesPerBlock: Int = 505): Array[Byte] = {
    val ch = pcm.length
    require(ch == 1 || ch == 2, s"1 or 2 channels, got $ch")
    val n = pcm.head.length
    require(pcm.forall(_.length == n), "channel length mismatch")
    require(samplesPerBlock > 1 && (samplesPerBlock - 1) % 8 == 0,
      s"samplesPerBlock must be 1+8k, got $samplesPerBlock")
    val groupsPerBlock = (samplesPerBlock - 1) / 8
    val blockAlign = ch * (4 + 4 * groupsPerBlock)
    val nBlocks = if (n == 0) 0 else (n + samplesPerBlock - 1) / samplesPerBlock

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def tag(s: String): Unit = s.foreach(c => w8(c.toInt))

    val dataBytes = nBlocks * blockAlign
    tag("RIFF"); w32(4 + 8 + 20 + 8 + 4 + 8 + dataBytes); tag("WAVE")
    tag("fmt "); w32(20)
    w16(0x11); w16(ch); w32(sampleRate)
    val avgBps = sampleRate * blockAlign / samplesPerBlock
    w32(avgBps); w16(blockAlign); w16(4) // bits per (encoded) sample
    w16(2); w16(samplesPerBlock) // cbSize, wSamplesPerBlock
    tag("fact"); w32(4); w32(n)
    tag("data"); w32(dataBytes)

    var b = 0
    while (b < nBlocks) {
      val lo = b * samplesPerBlock
      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        pred(c) = pcm(c)(lo) // sample 0 ships verbatim
        idx(c) = 0
        w16(pred(c)); w8(idx(c)); w8(0)
        c += 1
      }
      var g = 0
      while (g < groupsPerBlock) {
        c = 0
        while (c < ch) {
          var byteIdx = 0
          while (byteIdx < 4) {
            var packed = 0
            var half = 0
            while (half < 2) {
              val t = lo + 1 + g * 8 + byteIdx * 2 + half
              // past-end samples pad as a repeat of the running
              // predictor (nibble for diff 0) — decoders ignore them
              // via the fact-chunk total
              val x = if (t < n) pcm(c)(t) else pred(c)
              val (nib, p2, i2) = encStep(x, pred(c), idx(c))
              pred(c) = p2; idx(c) = i2
              packed |= (nib & 0xf) << (4 * half) // low nibble first
              half += 1
            }
            w8(packed)
            byteIdx += 1
          }
          c += 1
        }
        g += 1
      }
      b += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode a WAVE_FORMAT_IMA_ADPCM RIFF stream. Left on anything
    * malformed: wrong magic/format tag, truncated chunks, a data
    * chunk that is not whole blocks, an index out of range. */
  def decode(bytes: Array[Byte]): Either[String, Decoded] = {
    var p = 0
    def r8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def r16(): Int = { val v = r8() | (r8() << 8); v }
    def r16s(): Int = { val v = r16(); if (v >= 0x8000) v - 0x10000 else v }
    def r32(): Int = r16() | (r16() << 16)
    def need(k: Int): Boolean = p + k <= bytes.length
    def tagIs(s: String): Boolean = {
      if (!need(4)) return false
      val ok = (0 until 4).forall(i => (bytes(p + i) & 0xff) == s(i).toInt)
      p += 4; ok
    }
    try {
      if (!tagIs("RIFF")) return Left("not RIFF")
      if (!need(4)) return Left("truncated RIFF size"); r32()
      if (!tagIs("WAVE")) return Left("not WAVE")
      var sampleRate = 0; var ch = 0; var blockAlign = 0
      var samplesPerBlock = 0; var haveFmt = false
      var totalSamples = -1
      var dataFrom = -1; var dataLen = -1
      // scan ALL chunks, not just up to the first data chunk: RIFF
      // permits a fact chunk AFTER data (advice-low, r17 — stopping
      // early made the total fall back to cap, decoding encoder
      // padding as real samples); odd-length chunk bodies carry a pad
      // byte that must be skipped or every later tag misparses
      var stopScan = false
      while (!stopScan && p + 8 <= bytes.length) {
        val tag = new String(Array(bytes(p), bytes(p + 1), bytes(p + 2),
          bytes(p + 3)).map(b => (b & 0xff).toChar)); p += 4
        val len = r32()
        // long arithmetic: a hostile length near Int.MaxValue would
        // overflow `p + len` negative and sail past this bounds check
        if (len < 0 || p.toLong + len > bytes.length) {
          // trailing garbage AFTER fmt+data already parsed (an encoder
          // footer, a torn copy past the payload) must not reject a
          // decodable file — stop scanning instead (advice-low, r19);
          // before both are in hand a malformed chunk is still fatal
          if (haveFmt && dataFrom >= 0) stopScan = true
          else return Left("truncated chunk")
        } else {
        tag match {
          case "fmt " =>
            if (len < 20) return Left("short fmt")
            val fmtTag = r16()
            if (fmtTag != 0x11) return Left(s"not IMA ADPCM: tag $fmtTag")
            ch = r16(); sampleRate = r32(); r32(); blockAlign = r16()
            val bits = r16()
            if (bits != 4) return Left(s"unsupported bits $bits")
            if (len >= 20) { r16(); samplesPerBlock = r16() }
            p += len - 20
            haveFmt = true
          case "fact" =>
            if (len < 4) return Left("short fact")
            totalSamples = r32(); p += len - 4
          case "data" =>
            if (dataFrom >= 0) return Left("duplicate data chunk")
            dataFrom = p; dataLen = len; p += len
          case _ => p += len
        }
        if (len % 2 == 1 && p < bytes.length) p += 1 // RIFF pad byte
        }
      }
      if (!haveFmt) return Left("no fmt chunk")
      if (dataFrom < 0) return Left("no data chunk")
      if (ch < 1 || ch > 2) return Left(s"unsupported channels $ch")
      if (sampleRate <= 0) return Left("zero sample rate")
      if (samplesPerBlock <= 1 || (samplesPerBlock - 1) % 8 != 0)
        return Left(s"bad samplesPerBlock $samplesPerBlock")
      val groupsPerBlock = (samplesPerBlock - 1) / 8
      if (blockAlign != ch * (4 + 4 * groupsPerBlock))
        return Left("blockAlign disagrees with samplesPerBlock")
      if (dataLen % blockAlign != 0) return Left("data not whole blocks")
      val nBlocks = dataLen / blockAlign
      val cap = nBlocks * samplesPerBlock
      val total =
        if (totalSamples >= 0) {
          if (totalSamples > cap) return Left("fact exceeds data")
          totalSamples
        } else cap
      val outS = Array.fill(ch)(new Array[Int](total))
      p = dataFrom
      var b = 0
      var written = 0
      while (b < nBlocks) {
        val pred = new Array[Int](ch)
        val idx = new Array[Int](ch)
        var c = 0
        while (c < ch) {
          pred(c) = r16s(); idx(c) = r8(); r8()
          if (idx(c) > 88) return Left(s"step index ${idx(c)} out of range")
          c += 1
        }
        val base = b * samplesPerBlock
        c = 0
        while (c < ch) {
          if (base < total) outS(c)(base) = pred(c)
          c += 1
        }
        if (base < total) written = math.min(total, base + 1)
        var g = 0
        while (g < groupsPerBlock) {
          c = 0
          while (c < ch) {
            var byteIdx = 0
            while (byteIdx < 4) {
              val packed = r8()
              var half = 0
              while (half < 2) {
                val nib = (packed >> (4 * half)) & 0xf
                val (p2, i2) = decStep(nib, pred(c), idx(c))
                pred(c) = p2; idx(c) = i2
                val t = base + 1 + g * 8 + byteIdx * 2 + half
                if (t < total) { outS(c)(t) = p2; written = math.max(written, t + 1) }
                half += 1
              }
              byteIdx += 1
            }
            c += 1
          }
          g += 1
        }
        b += 1
      }
      Right(Decoded(sampleRate, ch, outS))
    } catch {
      case _: ArrayIndexOutOfBoundsException => Left("truncated stream")
    }
  }
}
