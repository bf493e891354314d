package graft.ops

/** From-scratch baseline JPEG decoder — JDK-only, no codec library.
  *
  * Scope (the sequential-Huffman subset that covers the vast majority
  * of real-world JPEGs):
  *
  *   - SOF0 (baseline) and SOF1 (extended sequential), 8-bit
  *     precision, 1-4 components, one interleaved scan.
  *   - DQT 8- and 16-bit tables, DHT canonical Huffman tables, DRI
  *     restart intervals with RST0-7 resync, 0xFF00 byte stuffing.
  *   - Any sampling layout where the luma component is full-resolution
  *     (h = hmax, v = vmax) — i.e. 4:4:4, 4:2:2, 4:2:0, 4:1:1 and
  *     grayscale. Chroma blocks are entropy-decoded (the bit stream
  *     is interleaved, so they must be) but never dequantized or
  *     IDCT'd: the normalized decode surface is grayscale
  *     ([[Codecs.Decoded]]) and JFIF luma IS the Y channel, so the
  *     Cb/Cr planes are dead weight we skip — roughly halving the
  *     arithmetic for 4:2:0 corpora at 100 TB inventory scale.
  *   - Progressive (SOF2), FULL multi-scan reconstruction (T.81
  *     Annex G): interleaved/per-component DC scans, per-component
  *     spectral-selection AC scans with EOBRUN, and successive-
  *     approximation refinement of both, accumulated into a
  *     quantized-coefficient store and IDCT'd at EOI. A stream with
  *     at least one luma AC scan yields a full-resolution `jpeg`
  *     decode (bands never sent remain zero — the approximation the
  *     stream itself declares); a DC-only stream yields the 1/8-scale
  *     `jpeg_dc` preview (one pixel per luma block). Non-luma scans
  *     are skipped by marker search without entropy decoding —
  *     chroma AC is the bulk of a progressive stream's bits, all of
  *     it bypassed on the grayscale surface.
  *   - Arithmetic entropy coding decodes for real through the QM
  *     coder + statistical models ([[JpegArith]]): sequential SOF9
  *     (Annex F, kind `jpeg_arith`) AND progressive SOF10 (Annex G —
  *     Al-scaled DC model, fixed-bin DC refinement, per-block
  *     end-of-band AC first/refinement), with DAC conditioning and
  *     restart re-initialization in both. All four 8-bit DCT modes —
  *     sequential/progressive × Huffman/arithmetic — decode.
  *   - Lossless/differential modes, 12-bit precision, and DNL
  *     decline to None — callers fall back to the declared stub,
  *     same contract as every other [[Codecs]] path.
  *
  * All sizes/dims are validated against attacker-controlled input
  * (same adversarial contract as [[MediaHeaders]]): a malformed blob
  * returns None, never throws and never allocates unbounded memory.
  *
  * Reference behavior: the reference tool inherits JPEG decode from
  * its GUI toolkit's image plumbing (dbimport/window.py uses Qt); this
  * is the from-scratch Spark-side equivalent for corpus feature
  * extraction.
  */
object Jpeg {

  /** Natural-order index for each zigzag position: block in natural
    * (row-major) order at `ZigZag(k)` receives the k-th coefficient
    * of the entropy stream.
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 8-point DCT-III basis: Basis(u)(x) = alpha(u)/2 * cos((2x+1)uπ/16)
    * so that s(x,y) = Σ_u Σ_v Basis(u)(x) Basis(v)(y) F(u,v).
    */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val alpha = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    alpha / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table in the mincode/maxcode/valptr form of the
    * JPEG spec (ITU T.81 F.2.2.3): decode reads bits MSB-first,
    * extending the code until it falls inside some length's range.
    */
  private final class HuffTable(counts: Array[Int], symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int =
      symbols(valPtr(len) + code - minCode(len)) & 0xff
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0, var pred: Int = 0)

  /** Thrown internally on malformed entropy data; converted to None
    * at the decode() boundary — never escapes to callers.
    */
  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  /** Entropy-coded-segment bit reader: MSB-first, 0xFF00 destuffed,
    * RST markers consumed only via [[restart]].
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var bits = 0

    private def fill(): Unit = {
      if (pos >= b.length) corrupt()
      var v = b(pos) & 0xff
      pos += 1
      if (v == 0xff) {
        if (pos >= b.length) corrupt()
        val m = b(pos) & 0xff
        if (m == 0x00) pos += 1 // stuffed data byte
        else corrupt() // marker mid-segment (incl. unexpected RST/EOI)
        v = 0xff
      }
      acc = (acc << 8) | v
      bits += 8
    }

    def readBit(): Int = {
      if (bits == 0) fill()
      bits -= 1
      (acc >> bits) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.symbol(len, code)
        code = (code << 1) | readBit()
        len += 1
      }
      corrupt()
    }

    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      bits = 0 // discard partial byte
      // a 1-padded final byte of 0xFF was written stuffed (FF 00) —
      // skip the pair before expecting the marker (T.81 B.1.1.5)
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == 0x00) pos += 2
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + (n & 7))) corrupt()
      pos += 2
    }
  }

  /** Sign-extend an s-bit magnitude per T.81 F.2.2.1 (EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** One decoded component plane at its NATURAL (possibly subsampled)
    * resolution — chroma of a 4:2:0 stream comes back quarter-size;
    * upsampling is a consumer choice, not decode work.
    */
  final case class Plane(width: Int, height: Int, data: Array[Byte])

  /** A color decode: planes in SOF order (Y first, then Cb, Cr for
    * the standard 3-component JFIF layout). `width`/`height` are the
    * full-resolution image dims (= the luma plane's).
    */
  final case class ColorDecoded(width: Int, height: Int, planes: Seq[Plane])

  /** Decode a baseline JPEG to grayscale (the luma plane). None on any
    * unsupported feature or malformed structure.
    */
  def decode(b: Array[Byte]): Option[Codecs.Decoded] = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8)
      return None
    try decodeMarkers(b, color = false).map {
      case Left(d) => d
      case Right(_) => return None // unreachable: color=false
    }
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Decode a SEQUENTIAL baseline JPEG with full chroma
    * reconstruction: every component's blocks are dequantized and
    * IDCT'd into its own natural-resolution plane (the grayscale
    * surface entropy-decodes chroma but skips their arithmetic; this
    * path is the opt-in color sibling for color-moment features).
    * Progressive streams decline to None — the DC preview stays a
    * grayscale-only surface.
    */
  def decodeColor(b: Array[Byte]): Option[ColorDecoded] = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8)
      return None
    try decodeMarkers(b, color = true).flatMap {
      case Right(c) => Some(c)
      case Left(_) => None // unreachable: color=true
    }
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decodeMarkers(b: Array[Byte], color: Boolean)
      : Option[Either[Codecs.Decoded, ColorDecoded]] = {
    val quant = new Array[Array[Int]](4) // natural-order dequant tables
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var arith = false
    val cond = new JpegArith.Conditioning

    var p = 2
    while (p + 4 <= b.length) {
      if (u8(b, p) != 0xff) return None
      // optional fill bytes before a marker are legal (T.81 B.1.1.2)
      var m = u8(b, p + 1)
      while (m == 0xff && p + 2 < b.length) { p += 1; m = u8(b, p + 1) }
      val seg = p + 4 // first payload byte (past marker + length)
      if (m == 0xd9) return None // EOI before SOS
      val len = be16(b, p + 2)
      if (len < 2 || p + 2 + len > b.length) return None
      m match {
        case 0xdb => // DQT: one or more (Pq|Tq, 64 values) tables
          if (!parseDqt(b, seg, p + 2 + len, quant)) return None
        case 0xc4 => // DHT: one or more (Tc|Th, counts[16], symbols)
          if (!parseDht(b, seg, p + 2 + len, dcTabs, acTabs)) return None
        case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca =>
          // SOF0/1 sequential Huffman, SOF2 progressive Huffman,
          // SOF9 sequential arithmetic, SOF10 progressive arithmetic
          if (comps != null) return None
          progressive = m == 0xc2 || m == 0xca
          arith = m == 0xc9 || m == 0xca
          if (u8(b, seg) != 8) return None // 8-bit precision only
          height = be16(b, seg + 1)
          width = be16(b, seg + 3)
          val nc = u8(b, seg + 5)
          if (nc < 1 || nc > 4 || len != 8 + 3 * nc) return None
          if (width <= 0 || height <= 0 ||
            width.toLong * height > Codecs.MaxPixels) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            val c = Component(u8(b, o), u8(b, o + 1) >> 4,
              u8(b, o + 1) & 15, u8(b, o + 2))
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
              return None
            c
          }
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcb |
            0xcd | 0xce | 0xcf =>
          // lossless / differential modes: unsupported (all four DCT
          // modes — SOF0/1/2/9/10 — are handled above)
          return None
        case 0xcc => // DAC: arithmetic conditioning (Tc|Tb, value) pairs
          if (!parseDac(b, seg, p + 2 + len, cond)) return None
        case 0xdd => // DRI
          if (len != 4) return None
          restartInterval = be16(b, seg)
        case 0xda => // SOS: scan header, then entropy data to EOI
          if (comps == null) return None
          val ns = u8(b, seg)
          if (ns != comps.length || len != 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cs = u8(b, seg + 1 + 2 * i)
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTab = u8(b, seg + 2 + 2 * i) >> 4
            c.acTab = u8(b, seg + 2 + 2 * i) & 15
            if (c.dcTab > 3 || c.acTab > 3) return None
            i += 1
          }
          if (progressive) {
            if (color) return None // color surface is sequential-only
            // hand the whole remaining stream (this SOS through EOI,
            // including between-scan DHT/DQT/DRI/DAC) to the
            // multi-scan progressive decoder
            return decodeProgressive(b, p, comps, quant, dcTabs, acTabs,
              restartInterval, width, height, arith, cond).map(Left(_))
          }
          if (arith)
            return decodeScanArith(b, p + 2 + len, comps, quant, cond,
              width, height, restartInterval, color)
          // Ss=0, Se=63, Ah=Al=0 for sequential; tolerate the bytes
          return decodeScan(b, p + 2 + len, comps, quant, dcTabs, acTabs,
            width, height, restartInterval, color)
        case _ => // APPn, COM, and anything else: skip by length
      }
      p += 2 + len
    }
    None
  }

  private def decodeScan(
      b: Array[Byte], scanStart: Int, comps: Array[Component],
      quant: Array[Array[Int]], dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable], width: Int, height: Int,
      restartInterval: Int, color: Boolean)
      : Option[Either[Codecs.Decoded, ColorDecoded]] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val luma = comps(0)
    // the grayscale surface needs a full-resolution luma plane; JFIF
    // puts Y first with h=hmax, v=vmax in every standard layout
    if (luma.h != hmax || luma.v != vmax) return None
    for (c <- comps) {
      if (quant(c.tq) == null) return None
      if (dcTabs(c.dcTab) == null || acTabs(c.acTab) == null) return None
    }
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component planes at NATURAL resolution (T.81 A.1.1:
    // ceil(width·h/hmax) × ceil(height·v/vmax)); grayscale mode
    // allocates only luma's — chroma is entropy-decoded, never stored
    val planeW = comps.map(c => (width * c.h + hmax - 1) / hmax)
    val planeH = comps.map(c => (height * c.v + vmax - 1) / vmax)
    val planes = Array.tabulate(comps.length) { i =>
      if (i == 0 || color) new Array[Byte](planeW(i) * planeH(i)) else null
    }
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val r = new BitReader(b, scanStart)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val keep = ci == 0 || color
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            decodeBlock(r, c, dcTabs(c.dcTab), acTabs(c.acTab), coef,
              keepCoefs = keep)
            if (keep)
              idctInto(coef, quant(c.tq), tmp, planes(ci),
                planeW(ci), planeH(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (color)
      Some(Right(ColorDecoded(width, height,
        comps.indices.map(i => Plane(planeW(i), planeH(i), planes(i))))))
    else Some(Left(Codecs.Decoded("jpeg", width, height, planes(0))))
  }

  /** Sequential arithmetic-coded scan (SOF9): same MCU walk and IDCT
    * as [[decodeScan]], but blocks come from the QM decoder +
    * Annex F statistical model ([[JpegArith]]). Restart markers reset
    * the coder, the statistics areas, the DC contexts and predictors
    * (T.81 F.2.1.3.1); entropy data stops AT markers (the QM decoder
    * feeds zeros past them), so restarts are located by scanning for
    * the first unstuffed 0xFF.
    */
  private def decodeScanArith(
      b: Array[Byte], scanStart: Int, comps: Array[Component],
      quant: Array[Array[Int]], cond: JpegArith.Conditioning,
      width: Int, height: Int, restartInterval: Int, color: Boolean)
      : Option[Either[Codecs.Decoded, ColorDecoded]] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val luma = comps(0)
    if (luma.h != hmax || luma.v != vmax) return None
    for (c <- comps) if (quant(c.tq) == null) return None
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val planeW = comps.map(c => (width * c.h + hmax - 1) / hmax)
    val planeH = comps.map(c => (height * c.v + vmax - 1) / vmax)
    val planes = Array.tabulate(comps.length) { i =>
      if (i == 0 || color) new Array[Byte](planeW(i) * planeH(i)) else null
    }
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val dec = new JpegArith.Decoder(b, scanStart, b.length)
    val stats = new JpegArith.Stats(comps.length)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // locate the marker: stuffing guarantees the first 0xFF not
        // followed by 0x00 IS a marker
        var q = dec.pos
        while (q + 1 < b.length &&
          !((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00)) q += 1
        if (q + 1 >= b.length ||
          (b(q + 1) & 0xff) != (0xd0 + (rstIdx & 7))) corrupt()
        dec.pos = q + 2
        dec.reinit()
        stats.reset()
        rstIdx = (rstIdx + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val keep = ci == 0 || color
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            c.pred = JpegArith.decodeBlock(dec, stats, cond, ci,
              c.dcTab, c.acTab, c.pred, coef, ZigZag, () => corrupt())
            if (keep)
              idctInto(coef, quant(c.tq), tmp, planes(ci),
                planeW(ci), planeH(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (color)
      Some(Right(ColorDecoded(width, height,
        comps.indices.map(i => Plane(planeW(i), planeH(i), planes(i))))))
    else Some(Left(Codecs.Decoded("jpeg_arith", width, height, planes(0))))
  }

  /** Parse one DAC segment into the conditioning tables (T.81 B.2.4.3:
    * (Tc|Tb, value) pairs — DC value packs U|L, AC value is Kx).
    * False = malformed.
    */
  private def parseDac(
      b: Array[Byte], seg: Int, end: Int,
      cond: JpegArith.Conditioning): Boolean = {
    var q = seg
    while (q + 2 <= end) {
      val tc = u8(b, q) >> 4
      val tb = u8(b, q) & 15
      val v = u8(b, q + 1)
      if (tb > 3) return false
      if (tc == 0) {
        val l = v & 15
        val u = v >> 4
        if (l > u) return false
        cond.dcL(tb) = l; cond.dcU(tb) = u
      } else if (tc == 1) {
        if (v < 1 || v > 63) return false
        cond.acK(tb) = v
      } else return false
      q += 2
    }
    q == end
  }

  /** Consume the expected RSTn inside arithmetic entropy data: zero
    * stuffing guarantees the first 0xFF not followed by 0x00 IS the
    * marker; the coder is then re-primed from the byte after it.
    */
  private def arithRestart(
      b: Array[Byte], dec: JpegArith.Decoder, n: Int): Unit = {
    var q = dec.pos
    while (q + 1 < b.length &&
      !((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00)) q += 1
    if (q + 1 >= b.length || (b(q + 1) & 0xff) != (0xd0 + (n & 7)))
      corrupt()
    dec.pos = q + 2
    dec.reinit()
  }

  /** Arithmetic DC scan (SOF10 first pass or refinement): the first
    * pass runs the sequential DC model over the Al-scaled domain per
    * component; refinement is one fixed-bin decision per block
    * (G.1.3.2 — value-independent, like its Huffman raw-bit twin).
    * Returns the position of the next marker.
    */
  private def dcScanPassArith(
      b: Array[Byte], entStart: Int, comps: Array[Component],
      scomps: Array[Component], cond: JpegArith.Conditioning,
      coef: Array[Int], blocksX: Int, blocksY: Int,
      hmax: Int, vmax: Int, width: Int, height: Int,
      restartInterval: Int, ah: Int, al: Int): Int = {
    val luma = comps(0)
    val interleaved = scomps.length > 1
    val dec = new JpegArith.Decoder(b, entStart, b.length)
    val stats = new JpegArith.Stats(comps.length)
    scomps.foreach(_.pred = 0)
    val compIdx = scomps.map(c => comps.indexWhere(_ eq c))
    val (unitsX, unitsY) =
      if (interleaved)
        ((width + 8 * hmax - 1) / (8 * hmax),
          (height + 8 * vmax - 1) / (8 * vmax))
      else {
        val c = scomps(0)
        (((width * c.h + hmax - 1) / hmax + 7) / 8,
          ((height * c.v + vmax - 1) / vmax + 7) / 8)
      }
    var unit = 0
    val total = unitsX * unitsY
    var rstIdx = 0
    while (unit < total) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        arithRestart(b, dec, rstIdx)
        rstIdx = (rstIdx + 1) & 7
        stats.reset()
        scomps.foreach(_.pred = 0)
      }
      val ux = unit % unitsX
      val uy = unit / unitsX
      var ci = 0
      while (ci < scomps.length) {
        val c = scomps(ci)
        val (bh, bv) = if (interleaved) (c.h, c.v) else (1, 1)
        var by = 0
        while (by < bv) {
          var bx = 0
          while (bx < bh) {
            val px = if (interleaved) ux * c.h + bx else ux
            val py = if (interleaved) uy * c.v + by else uy
            val store = (c eq luma) && px < blocksX && py < blocksY
            val off = (py * blocksX + px) * 64
            if (ah == 0) {
              c.pred = JpegArith.decodeDc(dec, stats, cond, compIdx(ci),
                c.dcTab, c.pred, () => corrupt())
              if (store) coef(off) = c.pred << al
            } else {
              val bit = dec.decode(stats.fixed, 0)
              if (store && bit == 1) coef(off) |= 1 << al
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      unit += 1
    }
    nextMarker(b, dec.pos)
  }

  /** Arithmetic luma AC scan: spectral-selection first pass or
    * successive-approximation refinement, per-block models from
    * [[JpegArith]] (no EOBRUN — arithmetic codes the end-of-band
    * decision per block). Returns the position of the next marker.
    */
  private def acScanPassArith(
      b: Array[Byte], entStart: Int, acTbl: Int,
      cond: JpegArith.Conditioning, coef: Array[Int],
      blocksX: Int, blocksY: Int, restartInterval: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    val dec = new JpegArith.Decoder(b, entStart, b.length)
    val stats = new JpegArith.Stats(1)
    var unit = 0
    val total = blocksX * blocksY
    var rstIdx = 0
    while (unit < total) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        arithRestart(b, dec, rstIdx)
        rstIdx = (rstIdx + 1) & 7
        stats.reset()
      }
      val off = unit * 64
      if (ah == 0)
        JpegArith.decodeAcFirst(dec, stats, cond, acTbl, coef, off,
          ZigZag, ss, se, al, () => corrupt())
      else
        JpegArith.decodeAcRefine(dec, stats, acTbl, coef, off,
          ZigZag, ss, se, al, () => corrupt())
      unit += 1
    }
    nextMarker(b, dec.pos)
  }

  /** Parse one DQT segment (possibly several tables). False = malformed. */
  private def parseDqt(
      b: Array[Byte], seg: Int, end: Int, quant: Array[Array[Int]]): Boolean = {
    var q = seg
    while (q < end) {
      val pq = u8(b, q) >> 4
      val tq = u8(b, q) & 15
      if (tq > 3 || pq > 1) return false
      val step = if (pq == 0) 1 else 2
      if (q + 1 + 64 * step > end) return false
      val t = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val v = if (pq == 0) u8(b, q + 1 + i) else be16(b, q + 1 + 2 * i)
        t(ZigZag(i)) = v
        i += 1
      }
      quant(tq) = t
      q += 1 + 64 * step
    }
    true
  }

  /** Parse one DHT segment (possibly several tables). False = malformed. */
  private def parseDht(
      b: Array[Byte], seg: Int, end: Int,
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable]): Boolean = {
    var q = seg
    while (q < end) {
      val tc = u8(b, q) >> 4
      val th = u8(b, q) & 15
      if (tc > 1 || th > 3 || q + 17 > end) return false
      val counts = Array.tabulate(16)(i => u8(b, q + 1 + i))
      val total = counts.sum
      if (total > 256 || q + 17 + total > end) return false
      val syms = java.util.Arrays.copyOfRange(b, q + 17, q + 17 + total)
      val t = new HuffTable(counts, syms)
      if (tc == 0) dcTabs(th) = t else acTabs(th) = t
      q += 17 + total
    }
    true
  }

  /** Position of the next true marker at/after `from`: entropy-coded
    * data can contain 0xFF only as a stuffed pair (FF 00) or an RSTn,
    * so the first FF followed by anything else IS the next marker
    * (T.81 B.1.1.5). This is what lets non-luma progressive scans be
    * skipped without entropy-decoding them.
    */
  private def nextMarker(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if (u8(b, p) == 0xff) {
        val m = u8(b, p + 1)
        if (m != 0x00 && !(m >= 0xd0 && m <= 0xd7)) return p
        p += 2
      } else p += 1
    }
    corrupt()
  }

  /** Full progressive (SOF2) decoding, T.81 Annex G: the stream is a
    * sequence of scans — an interleaved (or per-component) DC scan
    * first, then per-component spectral-selection AC scans and
    * successive-approximation refinement scans for both — all
    * accumulating into one quantized-coefficient store that is
    * dequantized + IDCT'd at EOI.
    *
    * Grayscale surface economics carry over: only LUMA coefficients
    * are stored and reconstructed. Non-luma single-component scans
    * are skipped via [[nextMarker]] without entropy decoding at all
    * (chroma AC is the bulk of a progressive stream's bits);
    * interleaved DC scans decode chroma only to keep bit position
    * (first pass) or consume exactly one bit per block (refinement).
    *
    * Output: full-resolution kind `jpeg` once at least one luma AC
    * scan contributed (bands the stream never sent remain zero — the
    * approximation the stream itself declares); a DC-only stream
    * still yields the 1/8-scale `jpeg_dc` preview (one pixel per
    * block: dequantizedDC/8 + 128, no basis arithmetic needed).
    *
    * Memory: the coefficient store is 64 ints per luma block ≈ 4
    * bytes/pixel, bounded by the same [[Codecs.MaxPixels]] cap as
    * every decode path.
    */
  private def decodeProgressive(
      b: Array[Byte], sosPos: Int, comps: Array[Component],
      quant: Array[Array[Int]], dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable], restartInterval0: Int,
      width: Int, height: Int, arith: Boolean = false,
      cond: JpegArith.Conditioning = new JpegArith.Conditioning)
      : Option[Codecs.Decoded] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val luma = comps(0)
    if (luma.h != hmax || luma.v != vmax) return None
    if (quant(luma.tq) == null) return None
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val coef = new Array[Int](blocksX * blocksY * 64)
    var restartInterval = restartInterval0
    var acSeen = false
    var firstScan = true

    var p = sosPos
    while (p + 2 <= b.length) {
      if (u8(b, p) != 0xff) return None
      var m = u8(b, p + 1)
      while (m == 0xff && p + 2 < b.length) { p += 1; m = u8(b, p + 1) }
      if (m == 0xd9) // EOI: reconstruct
        return Some(finishProgressive(
          coef, quant(luma.tq), width, height, blocksX, blocksY, acSeen))
      if (p + 4 > b.length) return None
      val len = be16(b, p + 2)
      if (len < 2 || p + 2 + len > b.length) return None
      val seg = p + 4
      m match {
        case 0xdb =>
          if (!parseDqt(b, seg, p + 2 + len, quant)) return None
          p += 2 + len
        case 0xc4 =>
          if (!parseDht(b, seg, p + 2 + len, dcTabs, acTabs)) return None
          p += 2 + len
        case 0xcc =>
          if (!parseDac(b, seg, p + 2 + len, cond)) return None
          p += 2 + len
        case 0xdd =>
          if (len != 4) return None
          restartInterval = be16(b, seg)
          p += 2 + len
        case 0xda =>
          val ns = u8(b, seg)
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scomps = new Array[Component](ns)
          var i = 0
          while (i < ns) {
            val cs = u8(b, seg + 1 + 2 * i)
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTab = u8(b, seg + 2 + 2 * i) >> 4
            c.acTab = u8(b, seg + 2 + 2 * i) & 15
            if (c.dcTab > 3 || c.acTab > 3) return None
            scomps(i) = c
            i += 1
          }
          val ss = u8(b, seg + 1 + 2 * ns)
          val se = u8(b, seg + 2 + 2 * ns)
          val ah = u8(b, seg + 3 + 2 * ns) >> 4
          val al = u8(b, seg + 3 + 2 * ns) & 15
          // G.1.1.1.1: the first scan must be DC at Ah=0; AC scans are
          // single-component with a band inside 1..63
          if (ss > 63 || se > 63 || se < ss || al > 13) return None
          if (ss == 0 && se != 0) return None
          if (ss > 0 && ns != 1) return None
          if (firstScan && (ss != 0 || ah != 0)) return None
          firstScan = false
          val entStart = p + 2 + len
          val lumaInScan = scomps.exists(_ eq comps(0))
          if (!lumaInScan) {
            // scan without luma: nothing to store, and marker search
            // crosses its entropy data without decoding a single bit
            // (arithmetic scans end at a marker the same way)
            p = nextMarker(b, entStart)
          } else if (ss == 0) {
            p = if (arith)
              dcScanPassArith(b, entStart, comps, scomps, cond, coef,
                blocksX, blocksY, hmax, vmax, width, height,
                restartInterval, ah, al)
            else dcScanPass(b, entStart, comps, scomps, dcTabs, coef,
              blocksX, blocksY, hmax, vmax, width, height,
              restartInterval, ah, al)
          } else if (arith) {
            acSeen = true
            p = acScanPassArith(b, entStart, luma.acTab, cond, coef,
              blocksX, blocksY, restartInterval, ss, se, ah, al)
          } else {
            if (acTabs(luma.acTab) == null) return None
            acSeen = true
            p = acScanPass(b, entStart, acTabs(luma.acTab), coef,
              blocksX, blocksY, restartInterval, ss, se, ah, al)
          }
        case _ => p += 2 + len // APPn/COM between scans
      }
    }
    None // ran off the end without EOI
  }

  /** One DC scan (first pass Ah=0 or refinement Ah>0), interleaved or
    * single-component. Returns the position of the next marker.
    */
  private def dcScanPass(
      b: Array[Byte], entStart: Int, comps: Array[Component],
      scomps: Array[Component], dcTabs: Array[HuffTable],
      coef: Array[Int], blocksX: Int, blocksY: Int,
      hmax: Int, vmax: Int, width: Int, height: Int,
      restartInterval: Int, ah: Int, al: Int): Int = {
    val luma = comps(0)
    val interleaved = scomps.length > 1
    for (c <- scomps)
      if (ah == 0 && dcTabs(c.dcTab) == null) corrupt()
    val r = new BitReader(b, entStart)
    scomps.foreach(_.pred = 0)
    // unit grid: MCUs when interleaved, the single component's block
    // raster otherwise (T.81 A.2.2)
    val (unitsX, unitsY) =
      if (interleaved)
        ((width + 8 * hmax - 1) / (8 * hmax),
          (height + 8 * vmax - 1) / (8 * vmax))
      else {
        val c = scomps(0)
        (((width * c.h + hmax - 1) / hmax + 7) / 8,
          ((height * c.v + vmax - 1) / vmax + 7) / 8)
      }
    var unit = 0
    val total = unitsX * unitsY
    var rstIdx = 0
    while (unit < total) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        scomps.foreach(_.pred = 0)
      }
      val ux = unit % unitsX
      val uy = unit / unitsX
      var ci = 0
      while (ci < scomps.length) {
        val c = scomps(ci)
        val (bh, bv) = if (interleaved) (c.h, c.v) else (1, 1)
        var by = 0
        while (by < bv) {
          var bx = 0
          while (bx < bh) {
            val px = if (interleaved) ux * c.h + bx else ux
            val py = if (interleaved) uy * c.v + by else uy
            val store = (c eq luma) && px < blocksX && py < blocksY
            val off = (py * blocksX + px) * 64
            if (ah == 0) {
              val s = r.decodeHuff(dcTabs(c.dcTab))
              if (s > 11) corrupt()
              c.pred += extend(r.readBits(s), s)
              if (store) coef(off) = c.pred << al
            } else {
              // refinement: exactly one bit per block, value-independent
              val bit = r.readBit()
              if (store && bit == 1) coef(off) |= 1 << al
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      unit += 1
    }
    nextMarker(b, r.pos)
  }

  /** One luma AC scan: spectral-selection first pass (Ah=0, T.81
    * G.1.2.2 with EOBRUN) or successive-approximation refinement
    * (Ah>0, G.1.2.3 with correction bits). Returns the position of
    * the next marker.
    */
  private def acScanPass(
      b: Array[Byte], entStart: Int, ac: HuffTable, coef: Array[Int],
      blocksX: Int, blocksY: Int, restartInterval: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    val r = new BitReader(b, entStart)
    var eobrun = 0
    var unit = 0
    val total = blocksX * blocksY
    var rstIdx = 0
    while (unit < total) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        eobrun = 0
      }
      val off = unit * 64
      if (ah == 0) eobrun = acFirstBlock(r, ac, coef, off, ss, se, al, eobrun)
      else eobrun = acRefineBlock(r, ac, coef, off, ss, se, al, eobrun)
      unit += 1
    }
    nextMarker(b, r.pos)
  }

  /** AC spectral-selection first pass for one block (G.1.2.2). */
  private def acFirstBlock(
      r: BitReader, ac: HuffTable, coef: Array[Int], off: Int,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1 // block is all zero in band
    var k = ss
    while (k <= se) {
      val rs = r.decodeHuff(ac)
      val run = rs >> 4
      val s = rs & 15
      if (s == 0) {
        if (run == 15) k += 16 // ZRL
        else {
          var eob = (1 << run) - 1
          if (run > 0) eob += r.readBits(run)
          return eob // this block done; eob more all-zero blocks follow
        }
      } else {
        k += run
        if (k > se || s > 10) corrupt()
        coef(off + ZigZag(k)) = extend(r.readBits(s), s) << al
        k += 1
      }
    }
    0
  }

  /** AC successive-approximation refinement for one block (G.1.2.3):
    * newly-nonzero coefficients arrive as ±2^Al; every already-nonzero
    * coefficient passed over receives a correction bit that, when set
    * and not yet present, moves the value one 2^Al step away from
    * zero. The bit-test uses the SIGNED value (two's complement), the
    * convention of the spec's flow and every interoperable decoder.
    */
  private def acRefineBlock(
      r: BitReader, ac: HuffTable, coef: Array[Int], off: Int,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var k = ss
    def correct(idx: Int): Unit =
      if (r.readBit() == 1 && (coef(idx) & p1) == 0)
        coef(idx) += (if (coef(idx) >= 0) p1 else m1)
    if (eobrunIn > 0) {
      // inside an EOB run: only correction bits for nonzero history
      while (k <= se) {
        val idx = off + ZigZag(k)
        if (coef(idx) != 0) correct(idx)
        k += 1
      }
      return eobrunIn - 1
    }
    var eobrun = 0
    while (k <= se && eobrun == 0) {
      val rs = r.decodeHuff(ac)
      var run = rs >> 4
      val s = rs & 15
      var newVal = 0
      if (s == 0) {
        if (run != 15) { // EOB(run): finish this block with corrections
          eobrun = (1 << run) - 1
          if (run > 0) eobrun += r.readBits(run)
          run = 64 // consume the rest of the band below
        }
        // run == 15 (ZRL): pass over 16 zero-history positions
      } else {
        if (s != 1) corrupt() // refinement only creates ±1 (<<Al)
        newVal = if (r.readBit() == 1) p1 else m1
      }
      var done = false
      while (!done && k <= se) {
        val idx = off + ZigZag(k)
        if (coef(idx) != 0) correct(idx)
        else if (run == 0 && eobrun == 0) {
          if (newVal != 0) coef(idx) = newVal
          done = true
        } else run -= 1
        k += 1
      }
    }
    eobrun
  }

  /** EOI reconstruction: full-resolution IDCT when AC scans
    * contributed; the 1/8-scale DC preview otherwise.
    */
  private def finishProgressive(
      coef: Array[Int], qt: Array[Int], width: Int, height: Int,
      blocksX: Int, blocksY: Int, acSeen: Boolean): Codecs.Decoded =
    if (acSeen) {
      val gray = new Array[Byte](width * height)
      val one = new Array[Int](64)
      val tmp = new Array[Double](64)
      var blk = 0
      while (blk < blocksX * blocksY) {
        System.arraycopy(coef, blk * 64, one, 0, 64)
        idctInto(one, qt, tmp, gray, width, height,
          (blk % blocksX) * 8, (blk / blocksX) * 8)
        blk += 1
      }
      Codecs.Decoded("jpeg", width, height, gray)
    } else {
      val outW = (width + 7) / 8
      val outH = (height + 7) / 8
      val gray = new Array[Byte](outW * outH)
      val dcQ = qt(0)
      var blk = 0
      while (blk < outW * outH) {
        val v = math.round((coef(blk * 64) * dcQ).toDouble / 8.0).toInt + 128
        gray(blk) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        blk += 1
      }
      Codecs.Decoded("jpeg_dc", outW, outH, gray)
    }

  /** Fixture encoder: a DC-only 4:2:0 three-component baseline stream
    * whose decode is EXACTLY predictable — every 8×8 block carries
    * only a DC coefficient under an all-8s quant table, so block (with
    * quantized DC = v−128) reconstructs to the constant pixel v
    * (IDCT of a DC-only block is dequantizedDC/8 + 128 = v, no
    * floating-point sensitivity). This is what lets a cross-engine
    * oracle recompute color moments from the generative byte
    * derivation while the Spark side REALLY decodes: Huffman, dequant,
    * per-component IDCT, subsampled plane placement
    * ([[graft.ops.Multimodal]]'s color media table).
    *
    * `yBlocks` is the (2·mcusX)×(2·mcusY) row-major grid of luma
    * block values (0-255); `cb`/`cr` are one value per MCU. Dims are
    * exact multiples of 16, so no edge clipping anywhere.
    */
  private[graft] def encodeDc420(
      yBlocks: Array[Int], cb: Array[Int], cr: Array[Int],
      mcusX: Int, mcusY: Int): Array[Byte] = {
    require(yBlocks.length == 4 * mcusX * mcusY &&
      cb.length == mcusX * mcusY && cr.length == mcusX * mcusY)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    def bytes(bs: Int*): Unit = bs.foreach(v => out += v.toByte)
    def seg(marker: Int, payload: Seq[Int]): Unit = {
      bytes(0xff, marker, (payload.length + 2) >> 8,
        (payload.length + 2) & 0xff)
      payload.foreach(v => out += v.toByte)
    }
    bytes(0xff, 0xd8) // SOI
    seg(0xdb, 0 +: Seq.fill(64)(8)) // DQT 0: all 8s
    // DC table 0: categories 0..11 as the twelve length-4 codes
    seg(0xc4, Seq(0x00) ++ { val c = new Array[Int](16); c(3) = 12; c } ++
      (0 to 11))
    // AC table 0: the single symbol EOB as the one length-1 code
    seg(0xc4, Seq(0x10) ++ { val c = new Array[Int](16); c(0) = 1; c } ++
      Seq(0x00))
    val w = 16 * mcusX
    val h = 16 * mcusY
    seg(0xc0, Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // SOF0: Y 2x2, Cb/Cr 1x1
    seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    // entropy: MSB-first packer with FF00 stuffing, 1-padded flush
    var acc = 0
    var nb = 0
    def putBits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) {
          out += acc.toByte
          if (acc == 0xff) out += 0x00.toByte
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    val preds = new Array[Int](3)
    def dcBlock(ci: Int, value: Int): Unit = {
      val coefQ = value - 128
      val diff = coefQ - preds(ci)
      preds(ci) = coefQ
      val s = cat(diff)
      putBits(s, 4) // canonical length-4 code for category s IS s
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      putBits(0, 1) // EOB: the length-1 code for symbol 0x00
    }
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          dcBlock(0, yBlocks((my * 2 + by) * (2 * mcusX) + mx * 2 + bx))
          bx += 1
        }
        by += 1
      }
      dcBlock(1, cb(mcu))
      dcBlock(2, cr(mcu))
      mcu += 1
    }
    if (nb > 0) putBits((1 << (8 - nb)) - 1, 8 - nb) // flush
    bytes(0xff, 0xd9) // EOI
    out.toArray
  }

  /** Decode one 8x8 block's coefficients (zigzag order → natural order
    * in `coef`). With keepCoefs=false only the bit stream is advanced
    * and the DC predictor maintained — chroma blocks on the grayscale
    * surface.
    */
  private def decodeBlock(
      r: BitReader, c: Component, dc: HuffTable, ac: HuffTable,
      coef: Array[Int], keepCoefs: Boolean): Unit = {
    if (keepCoefs) java.util.Arrays.fill(coef, 0)
    val s = r.decodeHuff(dc)
    if (s > 11) corrupt()
    val diff = extend(r.readBits(s), s)
    c.pred += diff
    if (keepCoefs) coef(0) = c.pred
    var k = 1
    while (k < 64) {
      val rs = r.decodeHuff(ac)
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL: sixteen zeros
        else return // EOB
      } else {
        k += run
        if (k > 63 || size > 10) corrupt()
        val v = extend(r.readBits(size), size)
        if (keepCoefs) coef(ZigZag(k)) = v
        k += 1
      }
    }
  }

  /** Dequantize + separable 2-D IDCT + level shift, clamped, written
    * into the output plane at (x0, y0) with edge clipping.
    */
  private def idctInto(
      coef: Array[Int], qt: Array[Int], tmp: Array[Double],
      out: Array[Byte], w: Int, h: Int, x0: Int, y0: Int): Unit = {
    // rows: for each v (vertical freq) produce row-transformed samples
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          val f = coef(v * 8 + u)
          if (f != 0) acc += Basis(u)(x) * (f * qt(v * 8 + u))
          u += 1
        }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      val py = y0 + y
      if (py < h) {
        var x = 0
        while (x < 8) {
          val px = x0 + x
          if (px < w) {
            var acc = 0.0
            var vv = 0
            while (vv < 8) { acc += Basis(vv)(y) * tmp(vv * 8 + x); vv += 1 }
            val s = math.round(acc + 128.0).toInt
            out(py * w + px) =
              (if (s < 0) 0 else if (s > 255) 255 else s).toByte
          }
          x += 1
        }
      }
      y += 1
    }
  }
}
