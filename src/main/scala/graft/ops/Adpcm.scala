package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Compressed-audio decode: IMA ADPCM (WAVE format tag 0x11) and
  * G.711 µ-law / A-law (tags 0x07 / 0x06) — the audio counterpart of
  * the video codec matrix. All three are pure integer arithmetic, so
  * a cross-engine oracle can replay every sample exactly: G.711 is a
  * stateless per-byte expansion; IMA ADPCM threads (predictor, step
  * index) state through the nibble stream the same way the CRAM
  * decoder threads a previous frame.
  *
  * IMA ADPCM (IMA "Recommended Practices for Enhancing Digital Audio
  * Compatibility", the DVI/IMA 4-bit scheme as carried in WAVE
  * blocks): per channel block header `predictor:int16 LE,
  * stepIndex:u8, reserved:u8`, then 4-bit codes low-nibble-first.
  * The header predictor IS the block's first output sample; each
  * code then advances
  * {{{
  *   delta = step>>3 (+ step if bit2) (+ step>>1 if bit1) (+ step>>2 if bit0)
  *   pred  = clamp16(pred + (bit3 ? -delta : +delta))
  *   index = clamp(index + indexTable(code), 0, 88)
  * }}}
  * — the bitwise form, not the multiply approximation, so
  * encode/decode/oracle agree bit-for-bit.
  *
  * G.711 decode follows the CCITT segment layout (sign/segment/
  * mantissa; µ-law bias 0x84 and bit-inversion, A-law 0x55 XOR with
  * inverted sign convention), producing the standard 13/14-bit
  * linear values as int16.
  *
  * AdpcmSpec pins hand-stepped vectors for all three; the
  * `mm_adpcm_features` / `mm_g711_features` queries decode real RIFF
  * containers built row-locally and are hash-checked against a
  * DuckDB replay (recursive CTE for the ADPCM state thread).
  */
object Adpcm {

  /** IMA step-size table (89 entries). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA step-index adjustment per 4-bit code. */
  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** One IMA decode step: (pred, index, code) → (pred', index');
    * pred' is the emitted sample. */
  def step(pred: Int, index: Int, code: Int): (Int, Int) = {
    val st = StepTable(index)
    var delta = st >> 3
    if ((code & 4) != 0) delta += st
    if ((code & 2) != 0) delta += st >> 1
    if ((code & 1) != 0) delta += st >> 2
    val p = clamp16(if ((code & 8) != 0) pred - delta else pred + delta)
    val i = math.min(88, math.max(0, index + IndexTable(code & 0xf)))
    (p, i)
  }

  /** Decode one mono IMA block slice `[off, off+len)`: 4-byte header
    * then nibble codes, low nibble first. Returns all samples
    * including the header predictor (so a block of `len` bytes yields
    * `1 + 2*(len-4)` samples). None if the slice can't hold a header
    * or the step index is out of table range (malformed stream —
    * same decline-to-None contract as the other codecs).
    */
  def decodeMonoBlock(b: Array[Byte], off: Int, len: Int): Option[Array[Short]] = {
    if (len < 4 || off + len > b.length) return None
    var pred = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt
    var index = b(off + 2) & 0xff
    if (index > 88) return None
    val nCodes = (len - 4) * 2
    val out = new Array[Short](1 + nCodes)
    out(0) = pred.toShort
    var k = 0
    while (k < nCodes) {
      val byte = b(off + 4 + (k >> 1)) & 0xff
      val code = if ((k & 1) == 0) byte & 0xf else byte >> 4
      val (p, i) = step(pred, index, code)
      pred = p; index = i
      out(k + 1) = p.toShort
      k += 1
    }
    Some(out)
  }

  /** Encoder twin: pick, per sample, the code whose decode lands
    * nearest, updating state with the SAME [[step]] arithmetic so
    * encoder and decoder predictors never diverge (standard IMA
    * encode: sign bit from the error, then greedy bits against
    * step, step/2, step/4). Emits a single mono block with the given
    * seed state; `samples` are the codes' targets (the header sample
    * is `pred0` itself, not consumed from the input).
    */
  def encodeMonoBlock(samples: Array[Short], pred0: Short, index0: Int): Array[Byte] = {
    require(index0 >= 0 && index0 <= 88, "step index out of range")
    require(samples.length % 2 == 0, "nibble codes must pack to whole bytes")
    val out = ArrayBuffer[Byte](
      (pred0 & 0xff).toByte, ((pred0 >> 8) & 0xff).toByte,
      index0.toByte, 0.toByte)
    var pred = pred0.toInt
    var index = index0
    var k = 0
    var pending = 0
    while (k < samples.length) {
      val st = StepTable(index)
      var diff = samples(k) - pred
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      if (diff >= st) { code |= 4; diff -= st }
      if (diff >= (st >> 1)) { code |= 2; diff -= st >> 1 }
      if (diff >= (st >> 2)) code |= 1
      val (p, i) = step(pred, index, code)
      pred = p; index = i
      if ((k & 1) == 0) pending = code
      else out += (pending | (code << 4)).toByte
      k += 1
    }
    out.toArray
  }

  // -------------------------------------------------------------------
  // MS ADPCM (WAVE format tag 0x02)

  /** MS ADPCM per-code delta scaling (÷256 after multiply, floor 16). */
  val MsAdaptationTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** The seven standard predictor coefficient pairs (×256 fixed
    * point); a stream's `fmt ` extension may carry more, and the
    * block header's predictor byte indexes this table. */
  val MsCoefPairs: Array[(Int, Int)] = Array(
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232))

  /** One MS ADPCM decode step. The two-tap predictor divides by 256
    * with TRUNCATION toward zero (C `/` semantics — load-bearing for
    * cross-engine exactness when the weighted sum is negative); the
    * delta adaptation divides likewise and is clamped to
    * [16, 32767] — the int16 domain its block-header storage field
    * implies, which also keeps every intermediate product exactly
    * representable in 32 bits on any engine (an unclamped delta
    * grows ×3 per extreme code and overflows on adversarial
    * streams). Returns (newSample, newDelta).
    */
  def msStep(samp1: Int, samp2: Int, coef1: Int, coef2: Int,
      delta: Int, code: Int): (Int, Int) = {
    val signed = if (code >= 8) code - 16 else code
    val pred = (samp1 * coef1 + samp2 * coef2) / 256
    val samp = clamp16(pred + signed * delta)
    val d = math.min(32767,
      math.max(16, (MsAdaptationTable(code & 0xf) * delta) / 256))
    (samp, d)
  }

  /** Decode one mono MS ADPCM block slice `[off, off+len)`: 7-byte
    * header (predictor index u8, initial delta int16, sample1 int16,
    * sample2 int16), then 4-bit codes HIGH nibble first (the
    * opposite order from IMA). The header samples are the block's
    * first two outputs, OLDER first (sample2 then sample1), so a
    * block of `len` bytes yields `2 + 2*(len-7)` samples. None on a
    * header that can't fit, a predictor index outside the
    * coefficient table, or a non-positive initial delta.
    */
  def decodeMsMonoBlock(b: Array[Byte], off: Int, len: Int,
      coefs: Array[(Int, Int)] = MsCoefPairs): Option[Array[Short]] = {
    if (len < 7 || off + len > b.length) return None
    val predIdx = b(off) & 0xff
    if (predIdx >= coefs.length) return None
    var delta = ((b(off + 1) & 0xff) | ((b(off + 2) & 0xff) << 8)).toShort.toInt
    if (delta <= 0) return None
    var samp1 = ((b(off + 3) & 0xff) | ((b(off + 4) & 0xff) << 8)).toShort.toInt
    var samp2 = ((b(off + 5) & 0xff) | ((b(off + 6) & 0xff) << 8)).toShort.toInt
    val (coef1, coef2) = coefs(predIdx)
    val nCodes = (len - 7) * 2
    val out = new Array[Short](2 + nCodes)
    out(0) = samp2.toShort
    out(1) = samp1.toShort
    var k = 0
    while (k < nCodes) {
      val byte = b(off + 7 + (k >> 1)) & 0xff
      val code = if ((k & 1) == 0) byte >> 4 else byte & 0xf
      val (samp, d) = msStep(samp1, samp2, coef1, coef2, delta, code)
      samp2 = samp1; samp1 = samp; delta = d
      out(k + 2) = samp.toShort
      k += 1
    }
    Some(out)
  }

  // -------------------------------------------------------------------
  // G.711

  /** µ-law byte → linear int16 (CCITT G.711, bias 0x84, stored
    * bit-inverted). */
  def ulawToPcm(b: Int): Int = {
    val u = ~b & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear int16 (CCITT G.711, 0x55 XOR; sign bit SET
    * means non-negative). */
  def alawToPcm(b: Int): Int = {
    val a = b ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case _ => (t + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear int16 → µ-law byte (the searchless segment encode;
    * inverse of [[ulawToPcm]] on its own output). */
  def pcmToUlaw(pcm: Int): Int = {
    val sign = if (pcm < 0) 0x80 else 0
    val mag = math.min(if (pcm < 0) -pcm else pcm, 32635) + 0x84
    // segment s holds magnitudes in [0x100 << (s-1), (0x100 << s) - 1]
    var seg = 0
    var probe = mag >> 8
    while (probe > 0) { probe >>= 1; seg += 1 }
    val mant = (mag >> (seg + 3)) & 0x0f
    ~(sign | (seg << 4) | mant) & 0xff
  }
}
