package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Microsoft Video 1 ("CRAM" / MSVC, 8-bit palettized) — the classic
  * vector-quantization AVI codec, and this engine's first
  * INTER-FRAME codec: a frame may skip blocks, meaning "keep the
  * previous frame's pixels there", so decode threads state across
  * the chunk sequence.
  *
  * Bitstream (MS spec; 16-bit little-endian words, byteA = low):
  *  - blocks are 4×4, scanned left→right, BOTTOM→top;
  *  - byteB in [0x84,0x87]: skip — count = ((byteB−0x84)<<8)|byteA
  *    blocks retained from the previous frame;
  *  - byteB < 0x80: 2-color — this word is the 16-bit pixel mask
  *    (bit k: row k/4 from the block's bottom, column k%4; set bit →
  *    color A), followed by colors A, B;
  *  - byteB in [0x80,0x83] ∪ [0x88,0x8F]: solid — all 16 pixels take
  *    byteA;
  *  - byteB ≥ 0x90: 8-color — mask word, then A₀B₀…A₃B₃ for the four
  *    2×2 quadrants (q0 bottom-left, q1 bottom-right, q2 top-left,
  *    q3 top-right).
  *
  * The mask's high byte doubles as the mode selector, so not every
  * mask is directly representable: the encoder normalizes by
  * swapping colors and inverting mask bits — pixel-preserving — to
  * force bit 15 = 0 for 2-color blocks and bits 15,12 = 1 (quadrant
  * 3/2 swaps) for 8-color blocks. CramSpec pins hand-built literal
  * streams per mode so the wire layout, not just the round-trip, is
  * what's verified.
  *
  * Frames are top-down index surfaces at the API (like the RLE8
  * codec); width/height must be multiples of 4.
  */
object Cram {

  /** fourcc 'CRAM' as a little-endian BITMAPINFOHEADER code. */
  val Fourcc: Int = 'C'.toInt | ('R'.toInt << 8) | ('A'.toInt << 16) |
    ('M'.toInt << 24)

  /** Top-down array offset of block-local pixel (row `r` counted
    * from the block's BOTTOM, column `c` from the left) for scan-
    * order block `bi` in a w×h frame — the one layout rule every
    * path (decode, encode, fixture synthesis) must share.
    */
  def pixelOffset(bi: Int, r: Int, c: Int, w: Int, h: Int): Int = {
    val blocksWide = w / 4
    val bx = bi % blocksWide
    val byFromBottom = bi / blocksWide
    (h - 1 - (byFromBottom * 4 + r)) * w + bx * 4 + c
  }

  // -------------------------------------------------------------------
  // decode

  /** Decode one frame chunk. `prev` is the previous frame's top-down
    * index surface (required for skip blocks; a skip in the first
    * frame is a structural violation). None on truncation, overrun,
    * or a skip with no previous frame.
    */
  def decode(
      data: Array[Byte], w: Int, h: Int,
      prev: Option[Array[Byte]]): Option[Array[Byte]] = {
    if (w <= 0 || h <= 0 || w % 4 != 0 || h % 4 != 0) return None
    if (prev.exists(_.length != w * h)) return None
    val out = new Array[Byte](w * h)
    val blocksWide = w / 4
    val blocksHigh = h / 4
    var i = 0
    var skip = 0
    var bi = 0 // block index in scan order (left→right, bottom→top)
    val totalBlocks = blocksWide * blocksHigh

    def px(bi: Int, r: Int, c: Int): Int = pixelOffset(bi, r, c, w, h)

    while (bi < totalBlocks) {
      if (skip > 0) {
        val p = prev.getOrElse(return None)
        var k = 0
        while (k < 16) { val o = px(bi, k / 4, k % 4); out(o) = p(o); k += 1 }
        skip -= 1
        bi += 1
      } else {
        if (i + 2 > data.length) return None
        val a = data(i) & 0xff
        val b = data(i + 1) & 0xff
        i += 2
        if ((b & 0xfc) == 0x84) {
          skip = ((b - 0x84) << 8) | a
          if (skip == 0 || prev.isEmpty) return None
        } else if (b < 0x80) { // 2-color
          if (i + 2 > data.length) return None
          val mask = (b << 8) | a
          val cA = data(i); val cB = data(i + 1); i += 2
          var k = 0
          while (k < 16) {
            out(px(bi, k / 4, k % 4)) =
              if (((mask >> k) & 1) == 1) cA else cB
            k += 1
          }
          bi += 1
        } else if (b >= 0x90) { // 8-color
          if (i + 8 > data.length) return None
          val mask = (b << 8) | a
          val colors = java.util.Arrays.copyOfRange(data, i, i + 8)
          i += 8
          var k = 0
          while (k < 16) {
            val r = k / 4; val c = k % 4
            val q = (if (r >= 2) 2 else 0) + (if (c >= 2) 1 else 0)
            out(px(bi, r, c)) =
              if (((mask >> k) & 1) == 1) colors(2 * q)
              else colors(2 * q + 1)
            k += 1
          }
          bi += 1
        } else { // solid (0x80-0x83, 0x88-0x8F)
          var k = 0
          while (k < 16) { out(px(bi, k / 4, k % 4)) = a.toByte; k += 1 }
          bi += 1
        }
      }
    }
    if (skip > 0) None else Some(out)
  }

  // -------------------------------------------------------------------
  // encode (write-side twin)

  /** Encode one top-down frame against an optional previous frame:
    * per block, emit skip (equal to prev), solid (1 distinct index),
    * 2-color, or 8-color (≤2 distinct per 2×2 quadrant); throws if a
    * block needs more colors than the codec can carry — the fixture
    * generator stays inside the representable set by construction.
    */
  def encodeFrame(
      frame: Array[Byte], w: Int, h: Int,
      prev: Option[Array[Byte]]): Array[Byte] = {
    require(w % 4 == 0 && h % 4 == 0, "dims must be multiples of 4")
    require(frame.length == w * h, "bad frame size")
    val blocksWide = w / 4
    val totalBlocks = blocksWide * (h / 4)
    val out = ArrayBuffer.empty[Byte]
    def word(a: Int, b: Int): Unit = { out += a.toByte; out += b.toByte }

    def px(bi: Int, r: Int, c: Int): Int = pixelOffset(bi, r, c, w, h)
    def blockPixels(bi: Int): Array[Byte] =
      Array.tabulate(16)(k => frame(px(bi, k / 4, k % 4)))

    var bi = 0
    var pendingSkip = 0
    def flushSkip(): Unit =
      while (pendingSkip > 0) {
        val n = math.min(pendingSkip, 0x3ff)
        word(n & 0xff, 0x84 | (n >> 8))
        pendingSkip -= n
      }

    while (bi < totalBlocks) {
      val pix = blockPixels(bi)
      val same = prev.exists { p =>
        (0 until 16).forall(k => p(px(bi, k / 4, k % 4)) == pix(k))
      }
      if (same) pendingSkip += 1
      else {
        flushSkip()
        val distinct = pix.distinct
        if (distinct.length == 1) {
          word(pix(0) & 0xff, 0x80) // solid
        } else if (distinct.length == 2) {
          var cA = distinct(0); var cB = distinct(1)
          var mask = 0
          (0 until 16).foreach(k => if (pix(k) == cA) mask |= (1 << k))
          if ((mask & 0x8000) != 0) { // bit 15 must be 0: swap colors
            mask = ~mask & 0xffff; val t = cA; cA = cB; cB = t
          }
          word(mask & 0xff, mask >> 8)
          out += cA; out += cB
        } else {
          // 8-color: per-quadrant ≤ 2 distinct
          val colors = new Array[Byte](8)
          var mask = 0
          for (q <- 0 until 3 + 1) {
            val ks = (0 until 16).filter { k =>
              val r = k / 4; val c = k % 4
              ((if (r >= 2) 2 else 0) + (if (c >= 2) 1 else 0)) == q
            }
            val qpix = ks.map(pix)
            val qd = qpix.distinct
            require(qd.length <= 2,
              s"block $bi quadrant $q needs ${qd.length} colors")
            val a = qd(0); val b = if (qd.length == 2) qd(1) else qd(0)
            colors(2 * q) = a; colors(2 * q + 1) = b
            ks.foreach(k => if (pix(k) == a) mask |= (1 << k))
          }
          // byteB must be >= 0x90: force bits 15 (q3) and 12 (q2) set
          def swapQ(q: Int, bits: Seq[Int]): Unit = {
            val t = colors(2 * q)
            colors(2 * q) = colors(2 * q + 1); colors(2 * q + 1) = t
            bits.foreach(k => mask ^= (1 << k))
          }
          if ((mask & 0x8000) == 0) swapQ(3, Seq(10, 11, 14, 15))
          if ((mask & 0x1000) == 0) swapQ(2, Seq(8, 9, 12, 13))
          word(mask & 0xff, mask >> 8)
          out ++= colors
        }
        bi += 1
        // skip handled above; non-skip advanced here
      }
      if (same) bi += 1
    }
    flushSkip()
    out.toArray
  }
}
