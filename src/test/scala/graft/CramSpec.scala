package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cram

/** Wire-level pins for the MS Video 1 (CRAM) codec: hand-built
  * literal streams per block mode (so the BYTE layout, not just the
  * encoder/decoder round-trip, is what's verified), the inter-frame
  * skip contract, and the mask-normalization rules.
  */
class CramSpec extends AnyFunSuite {

  private val (w, h) = (4, 4) // one block

  test("solid block: hand-built stream decodes to a constant surface") {
    val d = Cram.decode(Array[Byte](0x2a, 0x80.toByte), w, h, None).get
    assert(d.forall(_ == 0x2a))
    // the 0x88-0x8F selector range is solid too
    val d2 = Cram.decode(Array[Byte](7, 0x8f.toByte), w, h, None).get
    assert(d2.forall(_ == 7))
  }

  test("2-color block: bit k paints row k/4 from the BOTTOM, col k%4") {
    // mask 0x0001 -> only bit 0 set: bottom-left pixel = color A
    val d = Cram.decode(
      Array[Byte](0x01, 0x00, 10, 20), w, h, None).get
    assert(d(Cram.pixelOffset(0, 0, 0, w, h)) == 10) // bottom-left
    assert(d(Cram.pixelOffset(0, 3, 3, w, h)) == 20) // top-right
    assert(d.count(_ == 10) == 1 && d.count(_ == 20) == 15)
  }

  test("8-color block: quadrants bottom-left, bottom-right, top-left, " +
    "top-right with their own color pairs") {
    // mask 0x9000: bits 15 and 12 set (the selector-forcing bits);
    // colors A0..B3 = 1..8
    val d = Cram.decode(
      Array[Byte](0x00, 0x90.toByte, 1, 2, 3, 4, 5, 6, 7, 8),
      w, h, None).get
    // bit 12 -> row 3, col 0 -> top-left quadrant (q2) color A = 5
    assert(d(Cram.pixelOffset(0, 3, 0, w, h)) == 5)
    // bit 15 -> row 3, col 3 -> top-right quadrant (q3) color A = 7
    assert(d(Cram.pixelOffset(0, 3, 3, w, h)) == 7)
    // unset bit in q0 -> color B0 = 2
    assert(d(Cram.pixelOffset(0, 0, 0, w, h)) == 2)
  }

  test("skip: copies the previous frame; invalid without one") {
    val prev = Array.tabulate(16)(_.toByte)
    val d = Cram.decode(Array[Byte](0x01, 0x84.toByte), w, h,
      Some(prev)).get
    assert(d.sameElements(prev))
    assert(Cram.decode(Array[Byte](0x01, 0x84.toByte), w, h, None).isEmpty)
    assert(Cram.decode(Array[Byte](0x00, 0x84.toByte), w, h,
      Some(prev)).isEmpty) // zero-count skip is malformed
  }

  test("truncation: every prefix of a valid stream decodes or returns " +
    "None — never throws") {
    val stream = Array[Byte](0x00, 0x90.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    (0 until stream.length).foreach { n =>
      assert(Cram.decode(stream.take(n), w, h, None).isEmpty)
    }
  }

  test("encoder round-trips arbitrary representable frames and " +
    "normalizes masks into the selector ranges") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val (fw, fh) = (8, 8)
      // per 4x4 block choose a mode and paint representable content
      val frame = new Array[Byte](fw * fh)
      (0 until 4).foreach { bi =>
        rnd.nextInt(3) match {
          case 0 => // solid
            val v = rnd.nextInt(256).toByte
            (0 until 16).foreach(k =>
              frame(Cram.pixelOffset(bi, k / 4, k % 4, fw, fh)) = v)
          case 1 => // 2-color with an arbitrary (possibly bit-15) mask
            val a = rnd.nextInt(256).toByte; val b = rnd.nextInt(256).toByte
            val mask = rnd.nextInt(0x10000)
            (0 until 16).foreach(k =>
              frame(Cram.pixelOffset(bi, k / 4, k % 4, fw, fh)) =
                if (((mask >> k) & 1) == 1) a else b)
          case _ => // 8-color
            val cs = Array.fill(8)(rnd.nextInt(256).toByte)
            val mask = rnd.nextInt(0x10000)
            (0 until 16).foreach { k =>
              val r = k / 4; val c = k % 4
              val q = (if (r >= 2) 2 else 0) + (if (c >= 2) 1 else 0)
              frame(Cram.pixelOffset(bi, r, c, fw, fh)) =
                if (((mask >> k) & 1) == 1) cs(2 * q) else cs(2 * q + 1)
            }
        }
      }
      val enc = Cram.encodeFrame(frame, 8, 8, None)
      // wire invariant: re-decode recovers the pixels exactly
      assert(Cram.decode(enc, 8, 8, None).get.sameElements(frame))
      // inter-frame: encoding against itself is pure skip codes
      val enc2 = Cram.encodeFrame(frame, 8, 8, Some(frame))
      assert(enc2.length == 2 && (enc2(1) & 0xfc) == 0x84)
      assert(Cram.decode(enc2, 8, 8, Some(frame)).get.sameElements(frame))
    }
  }
}
