package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Jpeg, JpegArith, PerceptualHash}

/** Arithmetic-coded JPEG (SOF9): the QM coder and the Annex F
  * sequential model are pinned three ways — (1) raw binary round-trip
  * through the coder pair across biased context mixes, (2) lossless
  * block-constant image round-trip through the full container, and
  * (3) cross-entropy equality: identical quantized coefficients
  * encoded through BOTH entropy coders (the independently-oracled
  * Huffman path and the arithmetic path) must decode to identical
  * pixels, which checks the statistical model against an
  * implementation that shares none of its code.
  */
class JpegArithSpec extends AnyFunSuite {

  test("Table D.3 structural invariants hold") {
    assert(JpegArith.tableInvariantsHold)
  }

  test("QM coder round-trips biased decision streams; stuffing invariant") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val nCtx = 1 + rnd.nextInt(8)
      val bias = Array.fill(nCtx)(rnd.nextDouble())
      val n = 2000 + rnd.nextInt(3000)
      val ctxs = Array.fill(n)(rnd.nextInt(nCtx))
      val bits = Array.tabulate(n)(i =>
        if (rnd.nextDouble() < bias(ctxs(i))) 1 else 0)
      val out = new java.io.ByteArrayOutputStream()
      val enc = new JpegArith.Encoder(out)
      val encSt = new Array[Byte](nCtx)
      var i = 0
      while (i < n) { enc.encode(encSt, ctxs(i), bits(i)); i += 1 }
      enc.flush()
      val bytes = out.toByteArray
      // framing: 0xFF never starts a marker inside entropy data
      var j = 0
      while (j < bytes.length - 1) {
        if ((bytes(j) & 0xff) == 0xff)
          assert((bytes(j + 1) & 0xff) == 0x00,
            s"trial $trial: unstuffed 0xFF at $j")
        j += 1
      }
      assert((bytes.last & 0xff) != 0xff, "trailing 0xFF needs its stuff byte")
      val dec = new JpegArith.Decoder(bytes, 0, bytes.length)
      val decSt = new Array[Byte](nCtx)
      i = 0
      while (i < n) {
        assert(dec.decode(decSt, ctxs(i)) == bits(i),
          s"trial $trial: decision $i diverged")
        i += 1
      }
    }
  }

  test("block-constant arithmetic JPEG round-trips bit-exactly") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grid = Array.tabulate[Byte](5 * 4)(i => md.digest(s"g$i".getBytes)(0))
    val jpg = JpegArith.encodeGrayBlocks(grid, 5, 4)
    val d = Jpeg.decode(jpg).get
    assert(d.kind == "jpeg_arith" && d.width == 40 && d.height == 32)
    // every 8x8 block constant at its grid value
    for (by <- 0 until 4; bx <- 0 until 5; y <- 0 until 8; x <- 0 until 8)
      assert(d.gray((by * 8 + y) * 40 + bx * 8 + x) == grid(by * 5 + bx))
  }

  test("restart markers reset coder, statistics and predictors") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grid = Array.tabulate[Byte](7 * 3)(i => md.digest(s"r$i".getBytes)(0))
    val plain = Jpeg.decode(JpegArith.encodeGrayBlocks(grid, 7, 3)).get
    for (ri <- Seq(1, 3, 9)) {
      val restarted =
        Jpeg.decode(JpegArith.encodeGrayBlocks(grid, 7, 3, ri)).get
      assert(restarted.gray.sameElements(plain.gray), s"interval $ri")
    }
  }

  test("cross-entropy: same coefficients, Huffman vs arithmetic, same pixels") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val bw = 1 + rnd.nextInt(4)
      val bh = 1 + rnd.nextInt(3)
      val blocks = Seq.tabulate(bw * bh) { _ =>
        val c = new Array[Int](64)
        c(0) = rnd.nextInt(2001) - 1000 // DC in [-1000, 1000]
        // sparse AC: a few small, occasionally large magnitudes
        val nAc = rnd.nextInt(20)
        for (_ <- 0 until nAc) {
          val k = 1 + rnd.nextInt(63)
          c(JpegArith.ZigZag(k)) =
            if (rnd.nextInt(10) == 0) rnd.nextInt(2047) - 1023
            else rnd.nextInt(81) - 40
        }
        c
      }
      val huff = Jpeg.decode(PerceptualHash.encodeJpegCoefs(blocks, bw, bh))
        .getOrElse(fail(s"trial $trial: huffman stream declined"))
      val arit = Jpeg.decode(JpegArith.encodeGrayCoefs(blocks, bw, bh))
        .getOrElse(fail(s"trial $trial: arithmetic stream declined"))
      assert(huff.width == arit.width && huff.height == arit.height)
      assert(huff.gray.sameElements(arit.gray),
        s"trial $trial: entropy coders disagree on decoded pixels")
    }
  }

  test("dense high-magnitude blocks exercise the long category chains") {
    // every AC slot nonzero, magnitudes spanning all category chains
    val c = new Array[Int](64)
    c(0) = -1000
    for (k <- 1 to 63)
      c(JpegArith.ZigZag(k)) = (if (k % 2 == 0) 1 else -1) * ((k * 16) % 1023 + 1)
    val blocks = Seq(c, c.map(-_), Array.fill(64)(0))
    val huff = Jpeg.decode(PerceptualHash.encodeJpegCoefs(blocks, 3, 1)).get
    val arit = Jpeg.decode(JpegArith.encodeGrayCoefs(blocks, 3, 1)).get
    assert(huff.gray.sameElements(arit.gray))
  }

  test("color 4:2:0: arithmetic and Huffman codings decode to identical planes") {
    val rnd = new scala.util.Random(3)
    for (trial <- 0 until 5) {
      val (mx, my) = (1 + rnd.nextInt(3), 1 + rnd.nextInt(2))
      val y = Array.fill(4 * mx * my)(rnd.nextInt(256))
      val cb = Array.fill(mx * my)(rnd.nextInt(256))
      val cr = Array.fill(mx * my)(rnd.nextInt(256))
      val huff = Jpeg.decodeColor(Jpeg.encodeDc420(y, cb, cr, mx, my))
        .getOrElse(fail(s"trial $trial: huffman color declined"))
      val arit = Jpeg.decodeColor(JpegArith.encodeDc420Arith(y, cb, cr, mx, my))
        .getOrElse(fail(s"trial $trial: arithmetic color declined"))
      assert(huff.width == arit.width && huff.height == arit.height)
      assert(huff.planes.length == 3 && arit.planes.length == 3)
      for (p <- 0 until 3)
        assert(huff.planes(p).data.sameElements(arit.planes(p).data),
          s"trial $trial: plane $p diverged")
      // grayscale surface agrees too, and carries the arith kind
      val gray = Jpeg.decode(JpegArith.encodeDc420Arith(y, cb, cr, mx, my)).get
      assert(gray.kind == "jpeg_arith")
      assert(gray.gray.sameElements(
        Jpeg.decode(Jpeg.encodeDc420(y, cb, cr, mx, my)).get.gray))
    }
  }

  test("SOF10: progressive arithmetic completes the four-mode matrix") {
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 8) {
      val bw = 1 + rnd.nextInt(4)
      val bh = 1 + rnd.nextInt(3)
      val blocks = Seq.tabulate(bw * bh) { _ =>
        val c = new Array[Int](64)
        c(0) = rnd.nextInt(2001) - 1000
        val nAc = rnd.nextInt(24)
        for (_ <- 0 until nAc) {
          val k = 1 + rnd.nextInt(63)
          c(JpegArith.ZigZag(k)) =
            if (rnd.nextInt(8) == 0) rnd.nextInt(2047) - 1023
            else rnd.nextInt(81) - 40 // includes ±1 magnitudes: the
          // newly-nonzero-in-refinement path is exercised
        }
        c
      }
      val seqHuff = Jpeg.decode(PerceptualHash.encodeJpegCoefs(blocks, bw, bh)).get
      val seqArith = Jpeg.decode(JpegArith.encodeGrayCoefs(blocks, bw, bh)).get
      val progArith = Jpeg.decode(JpegArith.encodeGrayProgressive(blocks, bw, bh))
        .getOrElse(fail(s"trial $trial: SOF10 stream declined"))
      assert(progArith.kind == "jpeg")
      assert(progArith.width == seqHuff.width && progArith.height == seqHuff.height)
      assert(progArith.gray.sameElements(seqHuff.gray),
        s"trial $trial: progressive arithmetic != sequential Huffman")
      assert(progArith.gray.sameElements(seqArith.gray),
        s"trial $trial: progressive arithmetic != sequential arithmetic")
    }
  }

  test("SOF10: restart markers re-prime every scan identically") {
    val rnd = new scala.util.Random(23)
    val blocks = Seq.tabulate(10) { _ =>
      val c = new Array[Int](64)
      c(0) = rnd.nextInt(512) - 256
      for (k <- 1 to 63 if rnd.nextInt(4) == 0)
        c(JpegArith.ZigZag(k)) = rnd.nextInt(41) - 20
      c
    }
    val plain = Jpeg.decode(JpegArith.encodeGrayProgressive(blocks, 5, 2)).get
    for (ri <- Seq(1, 3, 7)) {
      val restarted = Jpeg.decode(
        JpegArith.encodeGrayProgressive(blocks, 5, 2, ri)).get
      assert(restarted.gray.sameElements(plain.gray), s"interval $ri")
    }
  }

  test("SOF10: corpus-grid fixtures round-trip bit-exactly") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grid = Array.tabulate(4 * 2)(i => md.digest(s"s$i".getBytes)(0) & 0xff)
    val blocks = grid.toSeq.map { v =>
      val c = new Array[Int](64); c(0) = 8 * (v - 128); c
    }
    val d = Jpeg.decode(JpegArith.encodeGrayProgressive(blocks, 4, 2)).get
    for (by <- 0 until 2; bx <- 0 until 4; y <- 0 until 8; x <- 0 until 8)
      assert((d.gray((by * 8 + y) * 32 + bx * 8 + x) & 0xff) == grid(by * 4 + bx))
  }

  test("SOF10 4:2:0: interleaved arithmetic DC scan yields the luma preview") {
    // hand-built progressive-arithmetic color stream: one interleaved
    // DC-only scan (Y 2x2 + Cb + Cr, per-component conditioning
    // contexts); the grayscale surface stores luma DCs and decodes to
    // the 1/8-scale preview, consuming chroma decisions to stay in
    // bit-sync — the interleaved dcScanPassArith path.
    val (mx, my) = (2, 1)
    val rnd = new scala.util.Random(29)
    val y = Array.fill(4 * mx * my)(rnd.nextInt(256))
    val cb = Array.fill(mx * my)(rnd.nextInt(256))
    val cr = Array.fill(mx * my)(rnd.nextInt(256))
    val out = new java.io.ByteArrayOutputStream()
    def u8o(v: Int): Unit = out.write(v & 0xff)
    def u16o(v: Int): Unit = { u8o(v >> 8); u8o(v) }
    u16o(0xffd8)
    u16o(0xffdb); u16o(2 + 1 + 64); u8o(0x00)
    (0 until 64).foreach(_ => u8o(8)) // all 8s: DC/8 + 128 = v exactly
    u16o(0xffca); u16o(8 + 9); u8o(8); u16o(16 * my); u16o(16 * mx)
    u8o(3); u8o(1); u8o(0x22); u8o(0); u8o(2); u8o(0x11); u8o(0)
    u8o(3); u8o(0x11); u8o(0)
    u16o(0xffda); u16o(6 + 6); u8o(3)
    u8o(1); u8o(0x00); u8o(2); u8o(0x00); u8o(3); u8o(0x00)
    u8o(0); u8o(0); u8o(0) // Ss=0 Se=0 Ah=0 Al=0
    val cond = new JpegArith.Conditioning
    val stats = new JpegArith.Stats(3)
    val enc = new JpegArith.Encoder(out)
    val preds = new Array[Int](3)
    def dc(ci: Int, v: Int): Unit =
      preds(ci) = JpegArith.encodeDc(enc, stats, cond, ci, 0, preds(ci),
        v - 128)
    for (mcu <- 0 until mx * my) {
      val (ux, uy) = (mcu % mx, mcu / mx)
      for (by <- 0 until 2; bx <- 0 until 2)
        dc(0, y((uy * 2 + by) * (2 * mx) + ux * 2 + bx))
      dc(1, cb(mcu)); dc(2, cr(mcu))
    }
    enc.flush()
    u16o(0xffd9)
    val d = Jpeg.decode(out.toByteArray).get
    assert(d.kind == "jpeg_dc") // DC-only progressive -> 1/8 preview
    // one preview pixel per luma block: 2mx x 2my
    assert(d.width == 2 * mx && d.height == 2 * my)
    for (by <- 0 until 2 * my; bx <- 0 until 2 * mx)
      assert((d.gray(by * 2 * mx + bx) & 0xff) == y(by * 2 * mx + bx),
        s"block ($bx,$by)")
  }

  test("corrupted entropy data never throws, never hangs") {
    val rnd = new scala.util.Random(11)
    val good = JpegArith.encodeGrayBlocks(
      Array.tabulate[Byte](12)(i => (i * 21).toByte), 4, 3)
    // locate the SOS payload start
    var sos = 2
    while (!((good(sos) & 0xff) == 0xff && (good(sos + 1) & 0xff) == 0xda))
      sos += 1
    val dataStart = sos + 2 + (((good(sos + 2) & 0xff) << 8) | (good(sos + 3) & 0xff))
    for (_ <- 0 until 200) {
      val fuzzed = good.clone()
      val n = 1 + rnd.nextInt(6)
      for (_ <- 0 until n) {
        val at = dataStart + rnd.nextInt(fuzzed.length - dataStart)
        fuzzed(at) = rnd.nextInt(256).toByte
      }
      // must terminate and either decline or decode 32x24 — the QM
      // decoder feeds zeros past truncation/markers, the magnitude
      // chains are bounded by the 0x8000 corruption guard
      Jpeg.decode(fuzzed).foreach { d =>
        assert(d.width == 32 && d.height == 24)
      }
    }
  }

  test("malformed arithmetic structure declines") {
    val good = JpegArith.encodeGrayBlocks(Array.fill[Byte](2)(7), 2, 1)
    // progressive-arithmetic SOF10 is out of scope
    val sof10 = good.clone()
    val sofAt = {
      var i = 2
      while (!((sof10(i) & 0xff) == 0xff && (sof10(i + 1) & 0xff) == 0xc9))
        i += 1
      i
    }
    sof10(sofAt + 1) = 0xca.toByte
    assert(Jpeg.decode(sof10).isEmpty)
    // DAC with L > U is structurally invalid
    val badDac = good.clone()
    val dacAt = {
      var i = 2
      while (!((badDac(i) & 0xff) == 0xff && (badDac(i + 1) & 0xff) == 0xcc))
        i += 1
      i
    }
    badDac(dacAt + 5) = 0x01.toByte // DC entry value: U=0, L=1
    assert(Jpeg.decode(badDac).isEmpty)
  }
}
