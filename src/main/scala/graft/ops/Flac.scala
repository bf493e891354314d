package graft.ops

import scala.collection.mutable.ArrayBuffer

/** FLAC-compatible subset codec — the engine's first ENTROPY-CODED
  * audio path (the ADPCM/G.711 family above it is fixed-rate): Rice
  * residual coding under the real container framing. The decodable
  * subset is 8-bit mono with CONSTANT / VERBATIM / FIXED-predictor
  * subframes (orders 0-4) and 4-bit Rice parameters at any partition
  * order — the shape `flac -0 .. -2` emits; LPC subframes, wasted
  * bits, and escaped partitions decline to None rather than decode
  * approximately.
  *
  * Everything load-bearing in the real format is load-bearing here:
  *   - `fLaC` marker + metadata-block walk (STREAMINFO parsed for
  *     bps/channels/total-samples, other blocks skipped by length);
  *   - per frame: the 14-bit sync code, block-size/sample-rate codes
  *     (incl. the 8/16-bit follow-up forms), the UTF-8-coded frame
  *     number, and a verified CRC-8 over the header;
  *   - subframes: fixed-predictor reconstruction at each order
  *     (s[i] += k-term binomial history) over Rice-decoded residuals
  *     (unary quotient = run of 0s + stop 1, k low bits, zigzag
  *     fold), partitioned per the 4-bit partition order;
  *   - a verified CRC-16 over the whole frame.
  * Corrupting any single bit of sync, CRC, or residual stream makes
  * the frame (and payload) decline — FlacSpec fuzzes exactly that.
  *
  * Compression is LOSSLESS, which is what makes the corpus query
  * fully oracle-able without replaying the decoder: the oracle
  * recomputes features from the closed-form sample derivation while
  * the engine must reach the identical samples through the real
  * bit-level decode chain.
  */
object Flac {

  /** CRC-8, polynomial 0x07, init 0 — the FLAC frame-header check. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC frame check. */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit writer over a growable byte buffer. */
  private final class BitWriter {
    private val buf = ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nBits = 0
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf += acc.toByte; acc = 0; nBits = 0 }
        i -= 1
      }
    }
    def writeUnary(n: Int): Unit = { write(0L, n); write(1L, 1) }
    def align(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def bytes: Array[Byte] = { require(nBits == 0); buf.toArray }
  }

  /** MSB-first bit reader; every read checks bounds. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def fail: Boolean = pos > b.length || (pos == b.length && bit > 0)
    def read(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) {
        if (pos >= b.length) { pos = b.length + 1; return -1L }
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readUnary(max: Int): Int = {
      var n = 0
      while (n <= max) {
        val v = read(1)
        if (v < 0) return -1
        if (v == 1L) return n
        n += 1
      }
      -1
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private val Magic = "fLaC".getBytes("US-ASCII")

  /** Fixed-predictor residual: r[i] = s[i] - prediction(order) — the
    * order-k binomial difference. Applied in place over a copy.
    */
  private def residual(s: Array[Int], order: Int): Array[Int] = {
    var r = s.clone()
    var k = 0
    while (k < order) {
      val next = new Array[Int](r.length)
      var i = r.length - 1
      while (i >= 1) { next(i) = r(i) - r(i - 1); i -= 1 }
      next(0) = r(0)
      r = next
      k += 1
    }
    r
  }

  /** Rice cost in bits of a residual block under parameter k. */
  private def riceCost(res: Array[Int], from: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < res.length) {
      val fold = if (res(i) >= 0) 2L * res(i) else -2L * res(i) - 1
      bits += (fold >>> k) + 1 + k
      i += 1
    }
    bits
  }

  /** Encode `samples` (signed 8-bit range) as a FLAC-subset stream:
    * STREAMINFO + one frame per `blockSize` samples, each using the
    * given subframe `mode` (0 constant — requires the block constant,
    * 1 verbatim, 2-6 fixed order mode-2) with the per-frame Rice
    * parameter chosen by exact cost.
    */
  def encode(samples: Array[Int], blockSize: Int, mode: Int): Array[Byte] = {
    require(samples.nonEmpty && blockSize > 0 && mode >= 0 && mode <= 6)
    val out = ArrayBuffer.empty[Byte]
    out ++= Magic
    // STREAMINFO: last-block flag + type 0, length 34
    val si = new BitWriter
    si.write(1L << 31 | 34L, 32)
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0L, 24); si.write(0L, 24) // frame sizes unknown
    si.write(8000L, 20)                // sample rate
    si.write(0L, 3)                    // channels - 1
    si.write(7L, 5)                    // bps - 1
    si.write(samples.length.toLong, 36)
    si.write(0L, 64); si.write(0L, 64) // md5 unknown
    out ++= si.bytes
    var frameNo = 0
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val block = java.util.Arrays.copyOfRange(samples, off, off + n)
      val w = new BitWriter
      // frame header: sync + fixed-blocksize strategy
      w.write(0x3ffe, 14); w.write(0L, 1); w.write(0L, 1)
      val bsCode = if (n <= 256) 6L else 7L // 8- or 16-bit follows
      w.write(bsCode, 4)
      w.write(0L, 4)  // sample rate: from STREAMINFO
      w.write(0L, 4)  // channel assignment: mono
      w.write(1L, 3)  // bps: 8
      w.write(0L, 1)  // reserved
      // UTF-8 frame number (subset: < 128 single byte; else 2-byte)
      if (frameNo < 0x80) w.write(frameNo.toLong, 8)
      else {
        w.write(0xc0L | (frameNo >> 6), 8)
        w.write(0x80L | (frameNo & 0x3f), 8)
      }
      if (bsCode == 6L) w.write((n - 1).toLong, 8)
      else w.write((n - 1).toLong, 16)
      val headerBytes = w.bytes // aligned: all fields above are whole bits mod 8
      val crc8v = crc8(headerBytes, 0, headerBytes.length)
      val w2 = new BitWriter
      headerBytes.foreach(b => w2.write(b & 0xffL, 8))
      w2.write(crc8v.toLong, 8)
      // subframe header: pad 0, type, wasted-bits 0
      val constant = block.forall(_ == block(0))
      // per-block fallbacks: a non-constant block cannot be CONSTANT,
      // and a tail shorter than the predictor order goes verbatim
      val m =
        if (mode == 0 && !constant) 1
        else if (mode >= 2 && n <= mode - 2) 1
        else mode
      val typeBits =
        if (m == 0) 0L
        else if (m == 1) 1L
        else 0x08L | (m - 2).toLong
      w2.write(0L, 1); w2.write(typeBits, 6); w2.write(0L, 1)
      if (m == 0) {
        w2.write(block(0).toLong & 0xffL, 8)
      } else if (m == 1) {
        block.foreach(v => w2.write(v.toLong & 0xffL, 8))
      } else {
        val order = m - 2
        var i = 0
        while (i < order) { w2.write(block(i).toLong & 0xffL, 8); i += 1 }
        val res = residual(block, order)
        var bestK = 0; var bestCost = Long.MaxValue
        var k = 0
        while (k <= 14) {
          val c = riceCost(res, order, k)
          if (c < bestCost) { bestCost = c; bestK = k }
          k += 1
        }
        w2.write(0L, 2)            // residual method: 4-bit Rice
        w2.write(0L, 4)            // partition order 0
        w2.write(bestK.toLong, 4)  // Rice parameter
        i = order
        while (i < n) {
          val fold = if (res(i) >= 0) 2L * res(i) else -2L * res(i) - 1
          w2.writeUnary((fold >>> bestK).toInt)
          w2.write(fold & ((1L << bestK) - 1), bestK)
          i += 1
        }
      }
      w2.align()
      val frame = w2.bytes
      val crc16v = crc16(frame, 0, frame.length)
      out ++= frame
      out += (crc16v >> 8).toByte
      out += (crc16v & 0xff).toByte
      off += n
      frameNo += 1
    }
    out.toArray
  }

  /** Decode a FLAC-subset stream to its samples; None on anything
    * malformed (bad magic, missing STREAMINFO, unsupported layout,
    * sync loss, CRC-8/CRC-16 mismatch, truncated residuals) — never
    * a partial sample sequence.
    */
  def decode(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 42) return None
    var i = 0
    while (i < 4) { if (b(i) != Magic(i)) return None; i += 1 }
    var p = 4
    var total = -1L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (p + 4 > b.length) return None
      val hdr = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      last = (hdr & 0x80000000) != 0
      val typ = (hdr >> 24) & 0x7f
      val len = hdr & 0xffffff
      p += 4
      if (p + len > b.length) return None
      if (typ == 0) {
        if (len != 34) return None
        val r = new BitReader(b, p)
        r.read(16); r.read(16); r.read(24); r.read(24); r.read(20)
        if (r.read(3) != 0L) return None // mono only
        if (r.read(5) != 7L) return None // 8-bit only
        total = r.read(36)
        sawStreamInfo = true
      }
      p += len
    }
    if (!sawStreamInfo || total <= 0) return None
    if (total > Codecs.MaxPixels) return None
    val outSamples = new Array[Int](total.toInt)
    var got = 0
    var expectFrame = 0
    while (got < total) {
      val frameStart = p
      val r = new BitReader(b, p)
      if (r.read(14) != 0x3ffe) return None
      if (r.read(1) != 0L) return None
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      if (r.read(4) != 0L) return None   // mono
      if (r.read(3) != 1L) return None   // 8-bit
      if (r.read(1) != 0L) return None
      // UTF-8 coded frame number (1-7 bytes)
      val first = r.read(8).toInt
      if (first < 0) return None
      var frameNo = 0L
      if ((first & 0x80) == 0) frameNo = first.toLong
      else {
        var nCont = 0
        var mask = 0x40
        while ((first & mask) != 0) { nCont += 1; mask >>= 1 }
        if (nCont < 1 || nCont > 6) return None
        frameNo = (first & (mask - 1)).toLong
        var c = 0
        while (c < nCont) {
          val cb = r.read(8).toInt
          if ((cb & 0xc0) != 0x80) return None
          frameNo = (frameNo << 6) | (cb & 0x3f)
          c += 1
        }
      }
      if (frameNo != expectFrame) return None
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => (r.read(8) + 1).toInt
        case 7 => (r.read(16) + 1).toInt
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None
      }
      srCode match {
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case 15 => return None
        case _ => ()
      }
      if (r.fail || !r.aligned) return None
      val storedCrc8 = r.read(8).toInt
      if (r.fail) return None
      if (crc8(b, frameStart, r.bytePos - 1) != storedCrc8) return None
      if (blockSize <= 0 || got + blockSize > total) return None
      // subframe
      if (r.read(1) != 0L) return None
      val typ = r.read(6).toInt
      if (r.read(1) != 0L) return None // wasted bits unsupported
      val block = new Array[Int](blockSize)
      if (typ == 0) {
        val v = r.read(8)
        if (r.fail) return None
        java.util.Arrays.fill(block, v.toByte.toInt)
      } else if (typ == 1) {
        var j = 0
        while (j < blockSize) {
          block(j) = r.read(8).toByte.toInt; j += 1
        }
        if (r.fail) return None
      } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) {
        val order = typ & 0x07
        if (blockSize <= order) return None
        var j = 0
        while (j < order) { block(j) = r.read(8).toByte.toInt; j += 1 }
        if (r.read(2) != 0L) return None // 4-bit Rice only
        val po = r.read(4).toInt
        if (po < 0) return None
        val nPart = 1 << po
        if (blockSize % nPart != 0) return None
        var part = 0
        var j2 = order
        while (part < nPart) {
          val cnt = (blockSize >> po) - (if (part == 0) order else 0)
          if (cnt < 0) return None
          val k = r.read(4).toInt
          if (k < 0) return None
          if (k == 15) return None // escape unsupported
          var c = 0
          while (c < cnt) {
            val q = r.readUnary(1 << 24)
            if (q < 0) return None
            val low = r.read(k)
            if (low < 0 && k > 0) return None
            val fold = (q.toLong << k) | (if (k > 0) low else 0L)
            val res = if ((fold & 1L) == 0L) (fold >> 1).toInt
                      else (-(fold + 1) >> 1).toInt
            block(j2) = res
            j2 += 1; c += 1
          }
          part += 1
        }
        // fixed-predictor reconstruction: s[i] = r[i] + binomial
        // combination of the previous `order` samples
        val coef: Array[Int] = order match {
          case 1 => Array(1)
          case 2 => Array(2, -1)
          case 3 => Array(3, -3, 1)
          case 4 => Array(4, -6, 4, -1)
          case _ => Array.empty[Int]
        }
        var idx = order
        while (idx < blockSize) {
          var acc = block(idx)
          var t = 0
          while (t < order) { acc += coef(t) * block(idx - 1 - t); t += 1 }
          block(idx) = acc
          idx += 1
        }
      } else return None
      r.align()
      if (r.fail) return None
      val storedCrc16 = ((r.read(8) << 8) | r.read(8)).toInt
      if (r.fail) return None
      if (crc16(b, frameStart, r.bytePos - 2) != storedCrc16) return None
      System.arraycopy(block, 0, outSamples, got, blockSize)
      got += blockSize
      p = r.bytePos
      expectFrame += 1
    }
    // STREAMINFO carries no CRC (true of the real format too): a
    // corrupted total-samples count must not silently truncate the
    // stream — every byte after the last frame is a decline
    if (p != b.length) return None
    Some(outSamples)
  }
}
