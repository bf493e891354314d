package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Codecs, Jpeg}
import scala.collection.mutable.ArrayBuffer

/** Pins the from-scratch baseline JPEG decoder.
  *
  * The first test is fully hand-computed — literal marker bytes and a
  * hand-packed entropy segment with a known flat-block answer — so the
  * canonical-Huffman convention, EXTEND, dequant, and the DC IDCT path
  * are pinned independently of the test-side encoder. The remaining
  * tests use a small in-spec encoder (its own canonical-code builder
  * and bit packer) plus an independent O(8^4) direct-sum reference
  * IDCT, so a mutual encoder/decoder bug can't cancel on the pixel
  * comparison.
  */
class JpegSpec extends AnyFunSuite {

  // ---- test-side encoder ------------------------------------------------

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical code assignment per T.81 C.2 (same convention as any
    * JPEG writer): shorter lengths first, codes increment then shift.
    */
  private def canonicalCodes(
      counts: Array[Int], syms: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) {
        m += syms(k) -> ((code, l))
        code += 1
        k += 1
      }
      code <<= 1
    }
    m.result()
  }

  /** MSB-first bit packer with 0xFF00 stuffing and 1-padding. */
  private final class BitW {
    val out = new ArrayBuffer[Byte]()
    private var acc = 0
    private var n = 0
    def bits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out += acc.toByte
          if (acc == 0xff) out += 0x00.toByte
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) bits((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def magnitudeBits(v: Int, cat: Int): Int =
    if (v >= 0) v else v + (1 << cat) - 1

  // DC: 12 categories at 4 bits; AC: all 162 standard symbols at 8 bits
  private val dcCounts = { val c = new Array[Int](16); c(3) = 12; c }
  private val dcSyms = (0 to 11).toArray
  private val acSyms: Array[Int] =
    (Seq(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val acCounts = { val c = new Array[Int](16); c(7) = acSyms.length; c }
  private val dcCodes = canonicalCodes(dcCounts, dcSyms)
  private val acCodes = canonicalCodes(acCounts, acSyms)

  /** Encode one block's quantized coefficients (natural order). */
  private def encodeBlock(w: BitW, coef: Array[Int], pred: Int): Int = {
    val dc = coef(0)
    val diff = dc - pred
    val cat = category(diff)
    val (c, l) = dcCodes(cat)
    w.bits(c, l)
    if (cat > 0) w.bits(magnitudeBits(diff, cat), cat)
    var k = 1
    var lastNz = 63
    while (lastNz >= 1 && coef(zigzag(lastNz)) == 0) lastNz -= 1
    while (k <= lastNz) {
      var run = 0
      while (coef(zigzag(k)) == 0) { run += 1; k += 1 }
      while (run >= 16) { val (zc, zl) = acCodes(0xf0); w.bits(zc, zl); run -= 16 }
      val v = coef(zigzag(k))
      val s = category(v)
      val (ac, al) = acCodes((run << 4) | s)
      w.bits(ac, al)
      w.bits(magnitudeBits(v, s), s)
      k += 1
    }
    if (lastNz < 63) { val (ec, el) = acCodes(0x00); w.bits(ec, el) }
    dc
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte, (len >> 8).toByte, (len & 0xff).toByte) ++
      payload
  }

  private def dqtAllOnes(tq: Int): Array[Byte] =
    seg(0xdb, Array(tq.toByte) ++ Array.fill(64)(1.toByte))

  private def dhtSeg(tc: Int, th: Int, counts: Array[Int], syms: Array[Int]): Array[Byte] =
    seg(0xc4, Array(((tc << 4) | th).toByte) ++ counts.map(_.toByte) ++
      syms.map(_.toByte))

  private def sof0(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    seg(0xc0, Array(8.toByte, (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte, comps.length.toByte) ++
      comps.flatMap { case (id, ch, cv, tq) =>
        Seq(id.toByte, ((ch << 4) | cv).toByte, tq.toByte)
      })

  private def sosHeader(comps: Seq[Int]): Array[Byte] =
    seg(0xda, Array(comps.length.toByte) ++
      comps.flatMap(id => Seq(id.toByte, 0x00.toByte)) ++
      Array(0.toByte, 63.toByte, 0.toByte))

  /** Direct O(8^4) reference IDCT — independent of the decoder's
    * separable implementation.
    */
  private def referenceIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var acc = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        acc += cu / 2.0 * cv / 2.0 * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val s = math.round(acc + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, s))
    }
    out
  }

  // ---- tests ------------------------------------------------------------

  test("hand-computed literal: flat gray block decodes to exactly 131") {
    // DC table: single 1-bit code '0' -> category 2.
    // AC table: single 1-bit code '0' -> EOB.
    // Entropy bits: 0 (cat2) 11 (diff=3) 0 (EOB), 1-padded = 0110_1111.
    // Quant DC step 8 => F00 = 24; IDCT of DC-only = F00/8 = 3; +128.
    val dqt = seg(0xdb, Array(0.toByte) ++
      (8 +: Seq.fill(63)(1)).map(_.toByte).toArray)
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqt ++
        dhtSeg(0, 0, { val c = new Array[Int](16); c(0) = 1; c }, Array(2)) ++
        dhtSeg(1, 0, { val c = new Array[Int](16); c(0) = 1; c }, Array(0x00)) ++
        sof0(8, 8, Seq((1, 1, 1, 0))) ++
        sosHeader(Seq(1)) ++
        Array(0x6f.toByte, 0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).get
    assert(d.kind == "jpeg" && d.width == 8 && d.height == 8)
    assert(d.gray.forall(b => (b & 0xff) == 131))
  }

  test("hand-computed literal: single AC coefficient makes a cosine ramp") {
    // One extra entropy symbol: zigzag index 1 = horizontal freq u=1.
    // DC table: '0'->cat0. AC canonical over two lengths: (0,5)=0x05
    // gets 1-bit code '0', EOB gets 2-bit code '10' — which also pins
    // multi-length canonical assignment against a literal stream.
    // Entropy: DC cat0 '0'; AC 0x05 '0' + bits '10100' (extend(20,5)
    // = 20); EOB '10'. Bits: 0 0 10100 10 -> 0x29, then 1-pad -> 0x7F.
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, { val c = new Array[Int](16); c(0) = 1; c }, Array(0)) ++
        dhtSeg(1, 0, { val c = new Array[Int](16); c(0) = 1; c(1) = 1; c },
          Array(0x05, 0x00)) ++
        sof0(8, 8, Seq((1, 1, 1, 0))) ++
        sosHeader(Seq(1)) ++
        Array(0x29.toByte, 0x7f.toByte, 0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).get
    // expected: s(x,y) = F(1,0) * alpha(1)/2 cos((2x+1)pi/16)
    //                  * alpha(0)/2, F = 20
    for (y <- 0 until 8; x <- 0 until 8) {
      val exp = math.round(
        20.0 * (1.0 / math.sqrt(2.0) / 2.0) * (1.0 / 2.0) *
          math.cos((2 * x + 1) * math.Pi / 16.0) + 128.0).toInt
      assert(math.abs((d.gray(y * 8 + x) & 0xff) - exp) <= 1,
        s"($x,$y): got ${d.gray(y * 8 + x) & 0xff}, want ~$exp")
    }
    // the ramp is horizontal: rows identical, columns strictly decreasing
    // over the first half (cos positive-to-negative)
    assert((0 until 8).forall(y => d.gray(y * 8) == d.gray(0)))
    assert((d.gray(0) & 0xff) > (d.gray(7) & 0xff))
  }

  test("random sparse blocks round-trip against the reference IDCT") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val coef = new Array[Int](64)
      coef(0) = rnd.nextInt(512) - 256
      for (_ <- 0 until 12) {
        val pos = 1 + rnd.nextInt(63)
        coef(pos) = rnd.nextInt(201) - 100
      }
      val w = new BitW
      encodeBlock(w, coef, 0)
      w.flush()
      val jpg =
        Array(0xff.toByte, 0xd8.toByte) ++
          dqtAllOnes(0) ++
          dhtSeg(0, 0, dcCounts, dcSyms) ++
          dhtSeg(1, 0, acCounts, acSyms) ++
          sof0(8, 8, Seq((1, 1, 1, 0))) ++
          sosHeader(Seq(1)) ++
          w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
      val d = Jpeg.decode(jpg).getOrElse(fail("decode declined"))
      val ref = referenceIdct(coef)
      for (i <- 0 until 64)
        assert(math.abs((d.gray(i) & 0xff) - ref(i)) <= 1,
          s"pixel $i: got ${d.gray(i) & 0xff}, ref ${ref(i)}")
    }
  }

  test("4:2:0 three-component: luma quadrants placed, chroma skipped") {
    // 16x16, Y sampling 2x2 (4 blocks/MCU), Cb/Cr 1x1. Flat Y blocks
    // with DCs 8,16,24,32 -> quadrant grays 129,130,131,132 (qt=1:
    // dc/8 + 128). Chroma blocks: DC diff 0 + EOB (ignored content).
    val w = new BitW
    var pred = 0
    for (dc <- Seq(8, 16, 24, 32)) { // Y blocks: order (0,0)(1,0)(0,1)(1,1)
      val c = new Array[Int](64); c(0) = dc
      pred = encodeBlock(w, c, pred)
    }
    var cbPred = 0
    val z = new Array[Int](64)
    cbPred = encodeBlock(w, z, cbPred) // Cb
    var crPred = 0
    crPred = encodeBlock(w, z, crPred) // Cr
    w.flush()
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++ dqtAllOnes(1) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acCounts, acSyms) ++
        sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1))) ++
        sosHeader(Seq(1, 2, 3)) ++
        w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).getOrElse(fail("decode declined"))
    assert(d.width == 16 && d.height == 16)
    def px(x: Int, y: Int): Int = d.gray(y * 16 + x) & 0xff
    assert(px(0, 0) == 129 && px(7, 7) == 129)
    assert(px(8, 0) == 130 && px(15, 7) == 130)
    assert(px(0, 8) == 131 && px(7, 15) == 131)
    assert(px(8, 8) == 132 && px(15, 15) == 132)
  }

  test("decodeColor: 4:2:0 chroma planes reconstructed at natural resolution") {
    // same stream shape as the grayscale 4:2:0 test, but chroma blocks
    // now carry real content: Cb flat 140 (DC 96), Cr an AC-only
    // cosine pattern checked against the independent reference IDCT
    val w = new BitW
    var pred = 0
    for (dc <- Seq(8, 16, 24, 32)) {
      val c = new Array[Int](64); c(0) = dc
      pred = encodeBlock(w, c, pred)
    }
    val cbBlock = new Array[Int](64); cbBlock(0) = 96
    encodeBlock(w, cbBlock, 0)
    val crBlock = new Array[Int](64); crBlock(1) = 40; crBlock(8) = -25
    encodeBlock(w, crBlock, 0)
    w.flush()
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++ dqtAllOnes(1) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acCounts, acSyms) ++
        sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1))) ++
        sosHeader(Seq(1, 2, 3)) ++
        w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decodeColor(jpg).getOrElse(fail("color decode declined"))
    assert(d.width == 16 && d.height == 16)
    assert(d.planes.length == 3)
    val Seq(y, cb, cr) = d.planes
    // luma identical to the grayscale surface's answer
    assert(y.width == 16 && y.height == 16)
    assert((y.data(0) & 0xff) == 129 && (y.data(15 * 16 + 15) & 0xff) == 132)
    // chroma at natural quarter resolution, not upsampled
    assert(cb.width == 8 && cb.height == 8 && cb.data.length == 64)
    assert(cr.width == 8 && cr.height == 8)
    assert(cb.data.forall(b => (b & 0xff) == 140)) // 96/8 + 128
    val want = referenceIdct(crBlock) // qt all ones: coef = dequant
    (0 until 64).foreach { i =>
      assert((cr.data(i) & 0xff) == want(i),
        s"cr[$i]: ${cr.data(i) & 0xff} vs ${want(i)}")
    }
    // and the grayscale surface still works on the same bytes
    assert(Jpeg.decode(jpg).get.gray.sameElements(y.data))
  }

  test("decodeColor: progressive streams and malformed input decline") {
    assert(Jpeg.decodeColor(null).isEmpty)
    assert(Jpeg.decodeColor(Array[Byte](1, 2, 3)).isEmpty)
    // progressive DC stream (valid for decode()) declines in color
    val w = new BitW
    val (c0, l0) = dcCodes(0)
    w.bits(c0, l0); w.flush()
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        seg(0xc2, Array(8.toByte, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)) ++
        sosDcHeader(Seq(1), al = 0) ++
        w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    assert(Jpeg.decode(jpg).isDefined, "grayscale DC preview should work")
    assert(Jpeg.decodeColor(jpg).isEmpty, "color surface is sequential-only")
  }

  test("encodeDc420 fixtures round-trip: every plane reads back its DC bytes") {
    // 2x1 MCUs: 8 luma + 2 cb + 2 cr block values, all distinct,
    // including 0/255 extremes and a sign flip across a DC diff
    val yB = Array(0, 255, 17, 240, 128, 1, 254, 99)
    val cb = Array(7, 200)
    val cr = Array(255, 0)
    val jpg = graft.ops.Jpeg.encodeDc420(yB, cb, cr, 2, 1)
    val d = Jpeg.decodeColor(jpg).getOrElse(fail("fixture declined"))
    assert(d.width == 32 && d.height == 16)
    val Seq(py, pcb, pcr) = d.planes
    assert(py.width == 32 && py.height == 16)
    assert(pcb.width == 16 && pcb.height == 8)
    // every 8x8 block is constant at its target byte
    def block(p: Jpeg.Plane, bx: Int, by: Int): Set[Int] =
      (for (y <- 0 until 8; x <- 0 until 8)
        yield p.data((by * 8 + y) * p.width + bx * 8 + x) & 0xff).toSet
    for (r <- 0 until 2; c <- 0 until 4)
      assert(block(py, c, r) == Set(yB(r * 4 + c)),
        s"y block ($c,$r): ${block(py, c, r)} vs ${yB(r * 4 + c)}")
    for (m <- 0 until 2) {
      assert(block(pcb, m, 0) == Set(cb(m)))
      assert(block(pcr, m, 0) == Set(cr(m)))
    }
    // the grayscale surface agrees on luma
    assert(Jpeg.decode(jpg).get.gray.sameElements(py.data))
  }

  test("restart markers resync and reset DC predictors") {
    // 8x24 grayscale = 3 MCUs; DRI=1 -> RST0 after MCU0, RST1 after
    // MCU1. Each block encodes DC=40 as a FRESH diff (pred reset);
    // without the reset the 2nd/3rd blocks would decode to 80/120.
    val mcuStreams = (0 until 3).map { _ =>
      val w = new BitW
      val c = new Array[Int](64); c(0) = 40
      encodeBlock(w, c, 0)
      w.flush()
      w.out.toArray
    }
    val entropy = mcuStreams(0) ++ Array(0xff.toByte, 0xd0.toByte) ++
      mcuStreams(1) ++ Array(0xff.toByte, 0xd1.toByte) ++ mcuStreams(2)
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acCounts, acSyms) ++
        seg(0xdd, Array(0.toByte, 1.toByte)) ++ // DRI = 1
        sof0(8, 24, Seq((1, 1, 1, 0))) ++
        sosHeader(Seq(1)) ++
        entropy ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).getOrElse(fail("decode declined"))
    assert(d.gray.forall(b => (b & 0xff) == 133)) // 40/8 + 128
  }

  test("edge clipping: 12x10 image keeps only in-bounds pixels") {
    // 12x10 with 1x1 sampling = 2x2 MCUs of 8x8; right/bottom blocks
    // are clipped. Flat DC=16 everywhere -> every surviving pixel 130.
    val w = new BitW
    var pred = 0
    for (_ <- 0 until 4) {
      val c = new Array[Int](64); c(0) = 16
      pred = encodeBlock(w, c, pred)
    }
    w.flush()
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acCounts, acSyms) ++
        sof0(12, 10, Seq((1, 1, 1, 0))) ++
        sosHeader(Seq(1)) ++
        w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).getOrElse(fail("decode declined"))
    assert(d.width == 12 && d.height == 10 && d.gray.length == 120)
    assert(d.gray.forall(b => (b & 0xff) == 130))
  }

  test("declines: malformed progressive scan, 12-bit, truncated entropy, dim bombs") {
    def base(sof: Array[Byte], entropy: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, 0xd8.toByte) ++ dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++ dhtSeg(1, 0, acCounts, acSyms) ++
        sof ++ sosHeader(Seq(1)) ++ entropy
    // progressive SOF2 whose first scan is NOT a DC scan (Se=63 from
    // the sequential header) — must decline, not misread it
    val sof2 = { val s = sof0(8, 8, Seq((1, 1, 1, 0))); s(1) = 0xc2.toByte; s }
    assert(Jpeg.decode(base(sof2, Array(0x6f.toByte))).isEmpty)
    // 12-bit precision
    val sof12 = { val s = sof0(8, 8, Seq((1, 1, 1, 0))); s(4) = 12.toByte; s }
    assert(Jpeg.decode(base(sof12, Array(0x6f.toByte))).isEmpty)
    // truncated entropy segment (no bytes at all)
    assert(Jpeg.decode(base(sof0(8, 8, Seq((1, 1, 1, 0))), Array())).isEmpty)
    // dim bomb: 60000 x 60000 declared (over MaxPixels) — must decline
    // before allocating
    assert(Jpeg.decode(
      base(sof0(60000, 60000, Seq((1, 1, 1, 0))), Array(0x6f.toByte))).isEmpty)
    // garbage after SOI
    assert(Jpeg.decode(Array(0xff.toByte, 0xd8.toByte, 0x12.toByte,
      0x34.toByte)).isEmpty)
  }

  private def sosDcHeader(comps: Seq[Int], al: Int): Array[Byte] =
    seg(0xda, Array(comps.length.toByte) ++
      comps.flatMap(id => Seq(id.toByte, 0x00.toByte)) ++
      Array(0.toByte, 0.toByte, al.toByte)) // Ss=0 Se=0 Ah=0, Al

  // progressive AC table: adds EOB1/EOB2 (0x10/0x20) to the
  // sequential symbol set
  private val acpSyms: Array[Int] =
    (Seq(0x00, 0x10, 0x20, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val acpCounts = { val c = new Array[Int](16); c(7) = acpSyms.length; c }
  private val acpCodes = canonicalCodes(acpCounts, acpSyms)

  private def sosProgHeader(
      comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
    seg(0xda, Array(comps.length.toByte) ++
      comps.flatMap(id => Seq(id.toByte, 0x00.toByte)) ++
      Array(ss.toByte, se.toByte, ((ah << 4) | al).toByte))

  test("progressive multi-scan: spectral selection + refinement match the reference IDCT") {
    // 16x8 grayscale SOF2, two blocks, four scans exercising every
    // progressive path: DC first at Al=1, AC first with an EOBRUN
    // covering block B, AC refinement (corrections + newly-nonzero +
    // EOB0), DC refinement. Final quantized coefficients (qt all 1s):
    //   A: DC 10, zz1 = 5, zz2 = -3, zz5 = -1
    //   B: DC -7, zz3 = 1
    val s1 = new BitW // DC first, Al=1: sends C0 >> 1 (arithmetic)
    locally {
      val (c3, l3) = dcCodes(3); s1.bits(c3, l3) // A: diff 5
      s1.bits(magnitudeBits(5, 3), 3)
      val (c4, l4) = dcCodes(4); s1.bits(c4, l4) // B: diff -4-5 = -9
      s1.bits(magnitudeBits(-9, 4), 4)
      s1.flush()
    }
    val s2 = new BitW // AC first, band 1-63, Al=1: |C| >> 1, sign kept
    locally {
      val (c02, l02) = acpCodes(0x02); s2.bits(c02, l02) // zz1: 5>>1 = 2
      s2.bits(magnitudeBits(2, 2), 2)
      val (c01, l01) = acpCodes(0x01); s2.bits(c01, l01) // zz2: -(3>>1) = -1
      s2.bits(magnitudeBits(-1, 1), 1)
      val (e1, el1) = acpCodes(0x10); s2.bits(e1, el1) // EOB1
      s2.bits(0, 1) // extension 0: EOBRUN = 2 (rest of A + all of B)
      s2.flush()
    }
    val s3 = new BitW // AC refinement, band 1-63, Ah=1 Al=0
    locally {
      // A: zz5 newly nonzero (-1) after run of 2 zero-history slots;
      // corrections for zz1 (4->5: bit 1) and zz2 (-2->-3: bit 1)
      // ride behind the sign bit in decoder consumption order
      val (c21, l21) = acpCodes(0x21); s3.bits(c21, l21)
      s3.bits(0, 1) // sign: negative
      s3.bits(1, 1) // correction zz1
      s3.bits(1, 1) // correction zz2
      val (e0, el0) = acpCodes(0x00); s3.bits(e0, el0) // EOB0 ends A
      // B: zz3 newly nonzero (+1) after 2 zero slots, then EOB0
      s3.bits(c21, l21)
      s3.bits(1, 1) // sign: positive
      s3.bits(e0, el0)
      s3.flush()
    }
    val s4 = new BitW // DC refinement: one bit per block (10&1, -7&1)
    locally { s4.bits(0, 1); s4.bits(1, 1); s4.flush() }
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acpCounts, acpSyms) ++
        seg(0xc2, Array(8.toByte, 0, 8, 0, 16, 1, 1, 0x11, 0).map(_.toByte)) ++
        sosProgHeader(Seq(1), 0, 0, 0, 1) ++ s1.out.toArray ++
        sosProgHeader(Seq(1), 1, 63, 0, 1) ++ s2.out.toArray ++
        sosProgHeader(Seq(1), 1, 63, 1, 0) ++ s3.out.toArray ++
        sosProgHeader(Seq(1), 0, 0, 1, 0) ++ s4.out.toArray ++
        Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).getOrElse(fail("progressive decode declined"))
    assert(d.kind == "jpeg", s"AC scans present -> full resolution, got ${d.kind}")
    assert(d.width == 16 && d.height == 8)
    val blockA = new Array[Int](64)
    blockA(0) = 10; blockA(zigzag(1)) = 5
    blockA(zigzag(2)) = -3; blockA(zigzag(5)) = -1
    val blockB = new Array[Int](64)
    blockB(0) = -7; blockB(zigzag(3)) = 1
    val wantA = referenceIdct(blockA)
    val wantB = referenceIdct(blockB)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert((d.gray(y * 16 + x) & 0xff) == wantA(y * 8 + x),
        s"A($x,$y): ${d.gray(y * 16 + x) & 0xff} vs ${wantA(y * 8 + x)}")
      assert((d.gray(y * 16 + 8 + x) & 0xff) == wantB(y * 8 + x),
        s"B($x,$y): ${d.gray(y * 16 + 8 + x) & 0xff} vs ${wantB(y * 8 + x)}")
    }
  }

  test("progressive 4:2:0: chroma AC scans are marker-skipped, luma reconstructs") {
    // 16x16 3-component progressive: interleaved DC scan (chroma
    // entropy-decoded to keep position), then a chroma AC scan whose
    // body is arbitrary non-FF bytes (the decoder must cross it by
    // marker search WITHOUT parsing), then the luma AC scan
    val s1 = new BitW // interleaved DC, Al=0: Y blocks 8,16,24,32; Cb 0; Cr 0
    locally {
      var pred = 0
      for (dc <- Seq(8, 16, 24, 32)) {
        val diff = dc - pred
        val cat = category(diff)
        val (c, l) = dcCodes(cat); s1.bits(c, l)
        if (cat > 0) s1.bits(magnitudeBits(diff, cat), cat)
        pred = dc
      }
      val (c0, l0) = dcCodes(0)
      s1.bits(c0, l0) // Cb diff 0
      s1.bits(c0, l0) // Cr diff 0
      s1.flush()
    }
    val s3 = new BitW // luma AC, band 1-63: zz1 = 40 in block 0, EOB1 covers rest
    locally {
      val (c6, l6) = acpCodes(0x06); s3.bits(c6, l6)
      s3.bits(magnitudeBits(40, 6), 6)
      val (e2, el2) = acpCodes(0x20); s3.bits(e2, el2)
      s3.bits(0, 2) // EOBRUN = 4: ends block 0, covers blocks 1-3
      s3.flush()
    }
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++ dqtAllOnes(1) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acpCounts, acpSyms) ++
        seg(0xc2, Array(8.toByte, 0, 16, 0, 16, 3,
          1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)) ++
        sosProgHeader(Seq(1, 2, 3), 0, 0, 0, 0) ++ s1.out.toArray ++
        sosProgHeader(Seq(2), 1, 63, 0, 0) ++
          Array[Byte](0x12, 0x34, 0x56) ++ // never parsed: marker-skipped
        sosProgHeader(Seq(1), 1, 63, 0, 0) ++ s3.out.toArray ++
        Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).getOrElse(fail("decode declined"))
    assert(d.kind == "jpeg" && d.width == 16 && d.height == 16)
    val b0 = new Array[Int](64); b0(0) = 8; b0(zigzag(1)) = 40
    val want0 = referenceIdct(b0)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((d.gray(y * 16 + x) & 0xff) == want0(y * 8 + x),
        s"block0($x,$y)")
    // flat DC-only quadrants elsewhere (dc/8 + 128)
    assert((d.gray(0 * 16 + 15) & 0xff) == 130)
    assert((d.gray(15 * 16 + 0) & 0xff) == 131)
    assert((d.gray(15 * 16 + 15) & 0xff) == 132)
  }

  test("progressive DC-first scan decodes to the 1/8-scale preview") {
    // 16x16 grayscale progressive: 4 luma blocks with DC values that
    // put block means at 131, 59, 214, 128 (pred-chained diffs)
    val means = Seq(131, 59, 214, 128)
    val w = new BitW
    var pred = 0
    means.foreach { m =>
      val dc = 8 * (m - 128)
      val diff = dc - pred
      pred = dc
      val cat = category(diff)
      val (c, l) = dcCodes(cat)
      w.bits(c, l)
      if (cat > 0) w.bits(magnitudeBits(diff, cat), cat)
    }
    w.flush()
    val sof2 = { val s = sof0(16, 16, Seq((1, 1, 1, 0))); s(1) = 0xc2.toByte; s }
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++ dqtAllOnes(0) ++
      dhtSeg(0, 0, dcCounts, dcSyms) ++ sof2 ++ sosDcHeader(Seq(1), 0) ++
      w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).get
    assert(d.kind == "jpeg_dc")
    assert(d.width == 2 && d.height == 2)
    assert(d.gray.map(_ & 0xff).toSeq == means)
  }

  test("progressive DC scan honors the successive-approximation shift (Al)") {
    // one 8x8 block, Al=1: coded diff 4 means DC = 4 << 1 = 8 →
    // pixel = 8/8 + 128 = 129
    val w = new BitW
    val diff = 4
    val cat = category(diff)
    val (c, l) = dcCodes(cat)
    w.bits(c, l)
    w.bits(magnitudeBits(diff, cat), cat)
    w.flush()
    val sof2 = { val s = sof0(8, 8, Seq((1, 1, 1, 0))); s(1) = 0xc2.toByte; s }
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++ dqtAllOnes(0) ++
      dhtSeg(0, 0, dcCounts, dcSyms) ++ sof2 ++ sosDcHeader(Seq(1), 1) ++
      w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).get
    assert(d.kind == "jpeg_dc" && d.width == 1 && d.height == 1)
    assert((d.gray(0) & 0xff) == 129)
  }

  test("progressive 4:2:0 DC scan: chroma blocks consumed, luma grid placed") {
    // 16x16, 4:2:0 (luma 2x2 blocks per MCU + one block each chroma):
    // one MCU total; luma DCs chain 8,8,8,8 → all four preview pixels
    // 129; chroma DCs are zero diffs that must still be consumed
    val w = new BitW
    var pred = 0
    (0 until 4).foreach { _ =>
      val dc = 8
      val diff = dc - pred
      pred = dc
      val cat = category(diff)
      val (c, l) = dcCodes(cat)
      w.bits(c, l)
      if (cat > 0) w.bits(magnitudeBits(diff, cat), cat)
    }
    // chroma: two components, one block each, diff 0 (category 0)
    (0 until 2).foreach { _ =>
      val (c, l) = dcCodes(0)
      w.bits(c, l)
    }
    w.flush()
    val sof2 = {
      val s = sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)))
      s(1) = 0xc2.toByte; s
    }
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++ dqtAllOnes(0) ++
      dhtSeg(0, 0, dcCounts, dcSyms) ++ sof2 ++
      sosDcHeader(Seq(1, 2, 3), 0) ++
      w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Jpeg.decode(jpg).get
    assert(d.kind == "jpeg_dc" && d.width == 2 && d.height == 2)
    assert(d.gray.map(_ & 0xff).toSeq == Seq(129, 129, 129, 129))
  }

  test("Codecs.decode routes baseline JPEG to the real decoder") {
    val w = new BitW
    val c = new Array[Int](64); c(0) = 24
    encodeBlock(w, c, 0)
    w.flush()
    val jpg =
      Array(0xff.toByte, 0xd8.toByte) ++
        dqtAllOnes(0) ++
        dhtSeg(0, 0, dcCounts, dcSyms) ++
        dhtSeg(1, 0, acCounts, acSyms) ++
        sof0(8, 8, Seq((1, 1, 1, 0))) ++
        sosHeader(Seq(1)) ++
        w.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Codecs.decode(jpg)
    assert(d.nonEmpty && d.get.kind == "jpeg")
    assert(d.get.gray.forall(b => (b & 0xff) == 131))
  }

  test("progressive encoder twin: 3-scan stream round-trips bit-exactly") {
    import graft.ops.PerceptualHash
    val md = java.security.MessageDigest.getInstance("MD5")
    // md5 bytes include odd/even and high/low values — the refinement
    // bit and the negative-coefficient arithmetic both get exercised
    val grid = Array.tabulate[Byte](5 * 3)(i => md.digest(s"p$i".getBytes)(0))
    val jpg = PerceptualHash.encodeProgressiveBlocks(grid, 5, 3)
    val d = Jpeg.decode(jpg).get
    // the AC scan was sent (all-zero band as EOB runs) -> FULL
    // resolution, not the DC preview
    assert(d.kind == "jpeg" && d.width == 40 && d.height == 24)
    for (by <- 0 until 3; bx <- 0 until 5; y <- 0 until 8; x <- 0 until 8)
      assert(d.gray((by * 8 + y) * 40 + bx * 8 + x) == grid(by * 5 + bx),
        s"block ($bx,$by) pixel ($x,$y)")
    // sanity: the refinement scan is load-bearing — some grid value
    // must have an odd (v - 128), else the test proves nothing
    assert(grid.exists(b => (((b & 0xff) - 128) & 1) == 1))
    // and a single large grid exercises the multi-symbol EOBn split
    val big = Array.tabulate[Byte](64 * 8)(i => (i % 251).toByte)
    val dBig = Jpeg.decode(
      PerceptualHash.encodeProgressiveBlocks(big, 64, 8)).get
    assert(dBig.width == 512 && dBig.height == 64)
    assert(dBig.gray(0) == big(0) && dBig.gray(511) == big(63))
  }
}
