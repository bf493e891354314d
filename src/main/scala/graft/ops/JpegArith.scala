package graft.ops

/** QM arithmetic coder + the sequential-DCT statistical model of
  * ITU-T T.81 (JPEG) Annexes D and F — the entropy coding behind
  * SOF9 streams, implemented from the published flowcharts:
  *
  *   - The binary coder is the spec's register machine: 16-bit
  *     interval register A renormalized into [0x8000, 0x10000), code
  *     register C with a bit-position counter CT, MPS/LPS conditional
  *     exchange when the LPS sub-interval Qe exceeds the MPS's
  *     (D.1.4/D.2.4), carry propagation over stacked 0xFF bytes on
  *     the encode side, and zero-byte stuffing after every 0xFF so
  *     entropy data can never alias a marker (same framing rule as
  *     Huffman segments).
  *   - Probability estimation is the spec's 113-state Qe transition
  *     table (Table D.3 — Qe value, next-state-on-MPS,
  *     next-state-on-LPS, MPS-switch flag), stored packed, plus the
  *     conventional 114th non-adaptive state pinned at Qe≈0.5 used
  *     for coin-flip decisions (AC coefficient signs). Each context
  *     is one byte: bit 7 the current MPS sense, bits 0-6 the state.
  *   - The statistical model (Annex F, sequential DCT) conditions DC
  *     difference coding on the previous difference's five-way
  *     classification (zero / ±small / ±large, thresholds from the
  *     L/U conditioning bounds), and AC coding on the zigzag index k
  *     (three contexts per k: end-of-block decision, zero/nonzero,
  *     first magnitude decision) with shared magnitude-category
  *     chains split at the Kx conditioning index. Statistics, DC
  *     predictors and DC contexts all reset at restart markers.
  *   - The progressive variants (Annex G, SOF10) reuse the same
  *     machinery: DC first runs the sequential model over the
  *     Al-scaled domain; DC refinement is one fixed-bin decision per
  *     block; AC first is the sequential AC model band-limited with
  *     values stored `<< Al`; AC refinement codes correction bits at
  *     context `3(k−1)+2` for previously-nonzero coefficients and
  *     fixed-bin signs for newly-nonzero ones, with the end-of-band
  *     decision existing only past the previous scan's last nonzero
  *     index (both sides derive it from the block state).
  *
  * Reference behavior anchored at `/root/reference` inventory surface
  * (media payload decode); the arithmetic option itself is specified
  * only by T.81 — conformance here is pinned by encoder/decoder
  * round-trips and by pixel-equality against the independently
  * verified Huffman path on identical coefficient blocks
  * (JpegArithSpec), since no third-party arithmetic streams exist in
  * this sandbox.
  */
private[graft] object JpegArith {

  /** Zigzag position → natural (row-major) index, T.81 Figure A.6. */
  private[graft] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Table D.3 packed as (Qe << 16) | (NMPS << 8) | (SWITCH << 7) |
    * NLPS. Index 113 is the fixed-probability bin (never transitions,
    * never switches).
    */
  private val Tab: Array[Int] = {
    // (qe, nlps, nmps, switch) rows in state order
    val rows: Array[(Int, Int, Int, Int)] = Array(
      (0x5a1d, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
      (0x080b, 18, 4, 0), (0x03d8, 20, 5, 0), (0x01da, 23, 6, 0),
      (0x00e5, 25, 7, 0), (0x006f, 28, 8, 0), (0x0036, 30, 9, 0),
      (0x001a, 33, 10, 0), (0x000d, 35, 11, 0), (0x0006, 9, 12, 0),
      (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5a7f, 15, 15, 1),
      (0x3f25, 36, 16, 0), (0x2cf2, 38, 17, 0), (0x207c, 39, 18, 0),
      (0x17b9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0cef, 43, 21, 0),
      (0x09a1, 45, 22, 0), (0x072f, 46, 23, 0), (0x055c, 48, 24, 0),
      (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
      (0x01b1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00f5, 57, 30, 0),
      (0x00b7, 59, 31, 0), (0x008a, 60, 32, 0), (0x0068, 62, 33, 0),
      (0x004e, 63, 34, 0), (0x003b, 32, 35, 0), (0x002c, 33, 9, 0),
      (0x5ae1, 37, 37, 1), (0x484c, 64, 38, 0), (0x3a0d, 65, 39, 0),
      (0x2ef1, 67, 40, 0), (0x261f, 68, 41, 0), (0x1f33, 69, 42, 0),
      (0x19a8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
      (0x0e74, 74, 46, 0), (0x0bfb, 75, 47, 0), (0x09f8, 77, 48, 0),
      (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05cd, 48, 51, 0),
      (0x04de, 50, 52, 0), (0x040f, 50, 53, 0), (0x0363, 51, 54, 0),
      (0x02d4, 52, 55, 0), (0x025c, 53, 56, 0), (0x01f8, 54, 57, 0),
      (0x01a4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
      (0x00f6, 58, 61, 0), (0x00cb, 59, 62, 0), (0x00ab, 61, 63, 0),
      (0x008f, 61, 32, 0), (0x5b12, 65, 65, 1), (0x4d04, 80, 66, 0),
      (0x412c, 81, 67, 0), (0x37d8, 82, 68, 0), (0x2fe8, 83, 69, 0),
      (0x293c, 84, 70, 0), (0x2379, 86, 71, 0), (0x1edf, 87, 72, 0),
      (0x1aa9, 87, 73, 0), (0x174e, 72, 74, 0), (0x1424, 72, 75, 0),
      (0x119c, 74, 76, 0), (0x0f6b, 74, 77, 0), (0x0d51, 75, 78, 0),
      (0x0bb6, 77, 79, 0), (0x0a40, 77, 48, 0), (0x5832, 80, 81, 1),
      (0x4d1c, 88, 82, 0), (0x438e, 89, 83, 0), (0x3bdd, 90, 84, 0),
      (0x34ee, 91, 85, 0), (0x2eae, 92, 86, 0), (0x299a, 93, 87, 0),
      (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4ca9, 95, 90, 0),
      (0x44d9, 96, 91, 0), (0x3e22, 97, 92, 0), (0x3824, 99, 93, 0),
      (0x32b4, 99, 94, 0), (0x2e17, 93, 86, 0), (0x56a8, 95, 96, 1),
      (0x4f46, 101, 97, 0), (0x47e5, 102, 98, 0), (0x41cf, 103, 99, 0),
      (0x3c3d, 104, 100, 0), (0x375e, 99, 93, 0), (0x5231, 105, 102, 0),
      (0x4c0f, 106, 103, 0), (0x4639, 107, 104, 0), (0x415e, 103, 99, 0),
      (0x5627, 105, 106, 1), (0x50e7, 108, 107, 0), (0x4b85, 109, 103, 0),
      (0x5597, 110, 109, 0), (0x504f, 111, 107, 0), (0x5a10, 110, 111, 1),
      (0x5522, 112, 109, 0), (0x59eb, 112, 111, 1),
      (0x5a1d, 113, 113, 0)) // fixed-probability bin
    rows.map { case (qe, nlps, nmps, sw) =>
      (qe << 16) | (nmps << 8) | (sw << 7) | nlps
    }
  }

  /** Structural invariants a valid Table D.3 must satisfy — exposed
    * for the spec (values themselves are pinned by round-trip +
    * cross-entropy pixel equality).
    */
  private[graft] def tableInvariantsHold: Boolean =
    Tab.length == 114 && Tab.zipWithIndex.forall { case (p, i) =>
      val qe = p >>> 16
      val nm = (p >> 8) & 0xff
      val nl = p & 0x7f
      val sw = (p & 0x80) != 0
      qe > 0 && qe < 0x8000 && nm < 114 && nl < 114 &&
        (!sw || qe > 0x5000) // switches only happen near Qe = 0.5
    }

  private val FixedBin = 113

  // ---- Annex D.1: encoder ----

  /** QM encoder writing into `out`. One instance per
    * entropy-coded segment (restart interval); statistics live
    * outside (caller resets them with the coder).
    */
  final class Encoder(out: java.io.ByteArrayOutputStream) {
    private var c = 0L
    private var a = 0x10000L
    private var ct = 11
    private var buffer = -1 // pending byte; -1 = nothing yet
    private var sc = 0 // stacked 0xFF bytes (may still carry)
    private var zc = 0 // pending 0x00 bytes (droppable at flush)

    private def emit(v: Int): Unit = out.write(v & 0xff)

    /** One renormalization byte-out step (D.1.6): the byte is C bits
      * 19-26; >0xFF propagates a carry through the pending buffer and
      * turns stacked 0xFFs into 0x00s; =0xFF stacks; else the pending
      * bytes retire (0xFF always chased by a stuffed 0x00).
      */
    private def byteOut(): Unit = {
      val t = (c >> 19).toInt
      if (t > 0xff) {
        if (buffer >= 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0)
        }
        zc += sc // carry turned the stacked 0xFFs into 0x00s
        sc = 0
        buffer = t & 0xff
      } else if (t == 0xff) {
        sc += 1
      } else {
        if (buffer == 0) zc += 1
        else if (buffer >= 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          emit(buffer)
        }
        if (sc > 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          while (sc > 0) { emit(0xff); emit(0); sc -= 1 }
        }
        buffer = t
      }
      c &= 0x7ffffL
      ct += 8
    }

    /** Encode one binary decision in context `st(i)` (D.1.4). */
    def encode(st: Array[Byte], i: Int, bit: Int): Unit = {
      val sv = st(i) & 0xff
      val packed = Tab(sv & 0x7f)
      val qe = (packed >>> 16).toLong
      a -= qe
      if (bit != (sv >> 7)) { // LPS
        if (a >= qe) { c += a; a = qe } // no conditional exchange
        st(i) = ((sv & 0x80) ^ (packed & 0xff)).toByte // NLPS + switch
      } else { // MPS
        if (a >= 0x8000L) return // still normalized — no estimation
        if (a < qe) { c += a; a = qe } // conditional exchange
        st(i) = ((sv & 0x80) ^ ((packed >> 8) & 0xff)).toByte // NMPS
      }
      while (a < 0x8000L) {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      }
    }

    /** Terminate (D.1.8): clear as many trailing C bits as the final
      * interval allows, flush the register, retire pending bytes.
      */
    def flush(): Unit = {
      val t = (c + a - 1) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xf8000000L) != 0) { // final carry
        if (buffer >= 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0)
        }
        zc += sc // carried stacked 0xFFs became 0x00s — still pending
        sc = 0
      } else {
        if (buffer == 0) zc += 1 // a zero buffer stays droppable
        else if (buffer >= 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          emit(buffer)
        }
        if (sc > 0) {
          while (zc > 0) { emit(0); zc -= 1 }
          while (sc > 0) { emit(0xff); emit(0); sc -= 1 }
        }
      }
      // two final register bytes; trailing zeros are droppable, but a
      // nonzero tail retires every pending zero before it (D.1.8's
      // Discard_final_zeros works right-to-left, not on each byte)
      if ((c & 0x7fff800L) != 0) {
        while (zc > 0) { emit(0); zc -= 1 }
        val b1 = ((c >> 19) & 0xff).toInt
        emit(b1)
        if (b1 == 0xff) emit(0)
        if ((c & 0x7f800L) != 0) {
          val b2 = ((c >> 11) & 0xff).toInt
          emit(b2)
          if (b2 == 0xff) emit(0)
        }
      }
      buffer = -1
      sc = 0
      zc = 0
    }
  }

  // ---- Annex D.2: decoder ----

  /** QM decoder over `b(start until end)`. Reaching a marker or the
    * end of the slice feeds zero bytes (the spec's convention — the
    * model stops asking once its symbols are decoded). `pos` stops AT
    * the 0xFF of any marker so the caller can consume restarts.
    */
  final class Decoder(b: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    private var c = 0L
    private var a = 0L
    private var ct = -16 // bootstrap: two byte fetches re-prime A

    def reinit(): Unit = { c = 0; a = 0; ct = -16 }

    private def fetch(): Int = {
      if (pos >= end) 0
      else {
        val v = b(pos) & 0xff
        if (v != 0xff) { pos += 1; v }
        else {
          var q = pos + 1 // optional fill bytes before the next byte
          while (q < end && (b(q) & 0xff) == 0xff) q += 1
          if (q < end && (b(q) & 0xff) == 0x00) { pos = q + 1; 0xff }
          else 0 // marker (or truncated stream): feed zeros, hold pos
        }
      }
    }

    /** Decode one binary decision in context `st(i)` (D.2.4); deferred
      * renormalization + byte feeding first (D.2.6).
      */
    def decode(st: Array[Byte], i: Int): Int = {
      while (a < 0x8000L) {
        ct -= 1
        if (ct < 0) {
          c = (c << 8) | fetch()
          ct += 8
          if (ct < 0) { ct += 1; if (ct == 0) a = 0x8000L }
        }
        a <<= 1
      }
      val sv = st(i) & 0xff
      val packed = Tab(sv & 0x7f)
      val qe = (packed >>> 16).toLong
      a -= qe
      val aligned = a << ct
      if (c >= aligned) { // upper sub-interval
        c -= aligned
        val bit =
          if (a < qe) { // conditional exchange: upper was the MPS
            st(i) = ((sv & 0x80) ^ ((packed >> 8) & 0xff)).toByte
            sv >> 7
          } else {
            st(i) = ((sv & 0x80) ^ (packed & 0xff)).toByte
            (sv >> 7) ^ 1
          }
        a = qe
        bit
      } else if (a < 0x8000L) {
        if (a < qe) { // conditional exchange: lower was the LPS
          st(i) = ((sv & 0x80) ^ (packed & 0xff)).toByte
          (sv >> 7) ^ 1
        } else {
          st(i) = ((sv & 0x80) ^ ((packed >> 8) & 0xff)).toByte
          sv >> 7
        }
      } else sv >> 7
    }
  }

  // ---- Annex F.1.4 / F.2: the sequential-DCT statistical model ----

  /** Conditioning bounds: DC L/U thresholds and the AC Kx split, per
    * table slot (set by a DAC segment; T.81 defaults otherwise).
    */
  final class Conditioning {
    val dcL: Array[Int] = Array.fill(4)(0)
    val dcU: Array[Int] = Array.fill(4)(1)
    val acK: Array[Int] = Array.fill(4)(5)
  }

  /** Per-scan statistics areas + DC conditioning contexts. One
    * instance per scan; [[reset]] at restart markers.
    */
  final class Stats(nComponents: Int) {
    val dc: Array[Array[Byte]] = Array.fill(4)(new Array[Byte](64))
    val ac: Array[Array[Byte]] = Array.fill(4)(new Array[Byte](256))
    val fixed: Array[Byte] = Array(FixedBin.toByte)
    val dcContext: Array[Int] = new Array[Int](nComponents)
    def reset(): Unit = {
      dc.foreach(java.util.Arrays.fill(_, 0.toByte))
      ac.foreach(java.util.Arrays.fill(_, 0.toByte))
      fixed(0) = FixedBin.toByte
      java.util.Arrays.fill(dcContext, 0)
    }
  }

  /** Decode one DC difference against `pred` in the (possibly
    * Al-scaled) prediction domain (F.2.4.1 / G: the DC-first model is
    * the sequential model over the point-transformed values — the
    * caller scales by `<< Al` when storing).
    */
  def decodeDc(
      dec: Decoder, stats: Stats, cond: Conditioning, ci: Int,
      dcTbl: Int, pred: Int, corrupt: () => Nothing): Int = {
    val dst = stats.dc(dcTbl)
    val base = stats.dcContext(ci)
    if (dec.decode(dst, base) == 0) { stats.dcContext(ci) = 0; pred }
    else {
      val sign = dec.decode(dst, base + 1)
      var si = base + 2 + sign
      var m = 0
      if (dec.decode(dst, si) != 0) {
        m = 1
        si = 20 // X1: shared magnitude-category chain
        while (dec.decode(dst, si) != 0) {
          m <<= 1
          if (m == 0x8000) corrupt()
          si += 1
        }
      }
      stats.dcContext(ci) =
        if (m < ((1 << cond.dcL(dcTbl)) >> 1)) 0
        else if (m > ((1 << cond.dcU(dcTbl)) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      var v = m
      si += 14 // magnitude-bit states sit 14 past the category chain
      var mm = m
      while ({ mm >>= 1; mm != 0 })
        if (dec.decode(dst, si) != 0) v |= mm
      v += 1
      if (sign != 0) pred - v else pred + v
    }
  }

  /** Decode one block's AC band `ss..se` into `coef` (natural order),
    * values scaled `<< al` on store (F.2.4.2; sequential = the
    * `ss=1, se=63, al=0` special case; G.1.3's AC-first scan is the
    * general form).
    */
  def decodeAcFirst(
      dec: Decoder, stats: Stats, cond: Conditioning, acTbl: Int,
      coef: Array[Int], off: Int, zigzag: Array[Int],
      ss: Int, se: Int, al: Int,
      corrupt: () => Nothing): Unit = {
    val ast = stats.ac(acTbl)
    var k = ss
    var eob = false
    while (k <= se && !eob) {
      var si = 3 * (k - 1)
      if (dec.decode(ast, si) != 0) eob = true
      else {
        while (dec.decode(ast, si + 1) == 0) {
          si += 3; k += 1
          if (k > se) corrupt()
        }
        val sign = dec.decode(stats.fixed, 0)
        si += 2
        var m = 0
        if (dec.decode(ast, si) != 0) {
          m = 1
          if (dec.decode(ast, si) != 0) {
            m = 2
            si = if (k <= cond.acK(acTbl)) 189 else 217
            while (dec.decode(ast, si) != 0) {
              m <<= 1
              if (m == 0x8000) corrupt()
              si += 1
            }
          }
        }
        var v = m
        si += 14
        var mm = m
        while ({ mm >>= 1; mm != 0 })
          if (dec.decode(ast, si) != 0) v |= mm
        v += 1
        coef(off + zigzag(k)) = (if (sign != 0) -v else v) << al
        k += 1
      }
    }
  }

  /** AC successive-approximation refinement for one block's band
    * (G.1.3.3): previously-nonzero coefficients take a correction bit
    * in context `3(k−1)+2`; newly-nonzero ones announce at `+1` with
    * a fixed-bin sign; the end-of-band decision only exists past the
    * PREVIOUS scan's last nonzero index (kex), which both sides
    * derive from the block state itself.
    */
  def decodeAcRefine(
      dec: Decoder, stats: Stats, acTbl: Int,
      coef: Array[Int], off: Int, zigzag: Array[Int],
      ss: Int, se: Int, al: Int,
      corrupt: () => Nothing): Unit = {
    val ast = stats.ac(acTbl)
    val p1 = 1 << al
    val m1 = -1 << al
    var kex = se
    while (kex >= ss && coef(off + zigzag(kex)) == 0) kex -= 1
    var k = ss
    var eob = false
    while (k <= se && !eob) {
      var si = 3 * (k - 1)
      if (k > kex && dec.decode(ast, si) != 0) eob = true
      else {
        var done = false
        while (!done) {
          val idx = off + zigzag(k)
          if (coef(idx) != 0) {
            if (dec.decode(ast, si + 2) != 0)
              coef(idx) += (if (coef(idx) < 0) m1 else p1)
            done = true
          } else if (dec.decode(ast, si + 1) != 0) {
            coef(idx) = if (dec.decode(stats.fixed, 0) != 0) m1 else p1
            done = true
          } else {
            si += 3; k += 1
            if (k > se) corrupt()
          }
        }
        k += 1
      }
    }
  }

  /** Decode one block's coefficients into `coef` (natural order,
    * assumed zeroed) and return the new DC prediction (F.2.4.1-2).
    * `zigzag` maps zigzag position → natural index.
    */
  def decodeBlock(
      dec: Decoder, stats: Stats, cond: Conditioning, ci: Int,
      dcTbl: Int, acTbl: Int, pred: Int, coef: Array[Int],
      zigzag: Array[Int], corrupt: () => Nothing): Int = {
    val newPred = decodeDc(dec, stats, cond, ci, dcTbl, pred, corrupt)
    coef(0) = newPred
    decodeAcFirst(dec, stats, cond, acTbl, coef, 0, zigzag, 1, 63, 0,
      corrupt)
    newPred
  }

  /** Minimal SOF9 (sequential arithmetic) grayscale encoder over
    * QUANTIZED coefficient blocks (natural order, flat all-ones quant
    * table — nothing is rounded, so the decoder's IDCT reconstructs
    * the exact inverse transform of these coefficients). Emits an
    * explicit DAC with the default conditioning (L=0, U=1, Kx=5) to
    * exercise the parser, optional restart markers every
    * `restartInterval` MCUs (= blocks, single component) with full
    * coder/statistics re-initialization. Write-side twin of
    * [[graft.ops.Jpeg]]'s `decodeScanArith`.
    */
  private[graft] def encodeGrayCoefs(
      coefBlocks: Seq[Array[Int]], bw: Int, bh: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(bw > 0 && bh > 0 && coefBlocks.length == bw * bh,
      s"block grid ${coefBlocks.length} != $bw x $bh")
    require(bw * 8 <= 0xffff && bh * 8 <= 0xffff, "dims exceed JPEG u16")
    require(coefBlocks.forall(_.length == 64), "blocks must be 8x8")
    val out = new java.io.ByteArrayOutputStream()
    def u8o(v: Int): Unit = out.write(v & 0xff)
    def u16o(v: Int): Unit = { u8o(v >> 8); u8o(v) }
    u16o(0xffd8) // SOI
    u16o(0xffdb); u16o(2 + 1 + 64); u8o(0x00) // DQT: table 0, all ones
    (0 until 64).foreach(_ => u8o(1))
    u16o(0xffc9); u16o(8 + 3); u8o(8); u16o(bh * 8); u16o(bw * 8) // SOF9
    u8o(1); u8o(1); u8o(0x11); u8o(0)
    u16o(0xffcc); u16o(2 + 4) // DAC: defaults, made explicit
    u8o(0x00); u8o(0x10) // DC table 0: U=1, L=0
    u8o(0x10); u8o(0x05) // AC table 0: Kx=5
    if (restartInterval > 0) { u16o(0xffdd); u16o(4); u16o(restartInterval) }
    u16o(0xffda); u16o(6 + 2); u8o(1); u8o(1); u8o(0x00) // SOS
    u8o(0); u8o(63); u8o(0)
    val cond = new Conditioning
    var stats = new Stats(1)
    var enc = new Encoder(out)
    var pred = 0
    var rstIdx = 0
    var i = 0
    while (i < coefBlocks.length) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        enc.flush()
        u16o(0xffd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        enc = new Encoder(out)
        stats = new Stats(1)
        pred = 0
      }
      pred = encodeBlock(enc, stats, cond, 0, 0, 0, pred, coefBlocks(i),
        ZigZag)
      i += 1
    }
    enc.flush()
    u16o(0xffd9) // EOI
    out.toByteArray
  }

  /** 4:2:0 COLOR arithmetic JPEG, the SOF9 twin of
    * `Jpeg.encodeDc420`: three components (Y 2×2, Cb/Cr 1×1), all-8s
    * quant, DC-only blocks at `value − 128`, interleaved MCU order —
    * exercising the per-component DC conditioning contexts the
    * grayscale path never touches. All components share conditioning
    * table 0 (defaults via an explicit DAC).
    */
  private[graft] def encodeDc420Arith(
      yBlocks: Array[Int], cb: Array[Int], cr: Array[Int],
      mcusX: Int, mcusY: Int): Array[Byte] = {
    require(yBlocks.length == 4 * mcusX * mcusY &&
      cb.length == mcusX * mcusY && cr.length == mcusX * mcusY)
    val out = new java.io.ByteArrayOutputStream()
    def u8o(v: Int): Unit = out.write(v & 0xff)
    def u16o(v: Int): Unit = { u8o(v >> 8); u8o(v) }
    u16o(0xffd8)
    u16o(0xffdb); u16o(2 + 1 + 64); u8o(0x00) // DQT 0: all 8s
    (0 until 64).foreach(_ => u8o(8))
    val w = 16 * mcusX
    val h = 16 * mcusY
    u16o(0xffc9); u16o(8 + 9); u8o(8); u16o(h); u16o(w); u8o(3) // SOF9
    u8o(1); u8o(0x22); u8o(0) // Y 2x2
    u8o(2); u8o(0x11); u8o(0) // Cb
    u8o(3); u8o(0x11); u8o(0) // Cr
    u16o(0xffcc); u16o(2 + 4) // DAC defaults
    u8o(0x00); u8o(0x10); u8o(0x10); u8o(0x05)
    u16o(0xffda); u16o(6 + 6); u8o(3) // SOS
    u8o(1); u8o(0x00); u8o(2); u8o(0x00); u8o(3); u8o(0x00)
    u8o(0); u8o(63); u8o(0)
    val cond = new Conditioning
    val stats = new Stats(3)
    val enc = new Encoder(out)
    val preds = new Array[Int](3)
    val coef = new Array[Int](64)
    def block(ci: Int, value: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      coef(0) = value - 128
      preds(ci) = encodeBlock(enc, stats, cond, ci, 0, 0, preds(ci), coef,
        ZigZag)
    }
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          block(0, yBlocks((my * 2 + by) * (2 * mcusX) + mx * 2 + bx))
          bx += 1
        }
        by += 1
      }
      block(1, cb(mcu))
      block(2, cr(mcu))
      mcu += 1
    }
    enc.flush()
    u16o(0xffd9)
    out.toByteArray
  }

  /** PROGRESSIVE arithmetic (SOF10) grayscale encoder over QUANTIZED
    * coefficient blocks — five scans covering every Annex G
    * arithmetic coding procedure:
    *
    *   1. DC first at Al=1 (sequential DC model over `dc >> 1`),
    *   2. AC first, band 1..31, Al=1 (spectral selection),
    *   3. AC first, band 32..63, Al=1,
    *   4. DC refinement (Ah=1 → Al=0): one fixed-bin decision per
    *      block carrying the live low bit,
    *   5. AC refinement, band 1..63 (Ah=1 → Al=0): correction bits
    *      for previously-nonzero coefficients, fixed-bin signs for
    *      newly-nonzero ones, per-block end-of-band decisions.
    *
    * `x = ((x>>1)<<1) | (x&1)` holds in two's complement and the AC
    * point transform divides toward zero, so ANY coefficient block
    * reconstructs exactly — the flat all-ones quant then makes the
    * decoded pixels the exact inverse transform, comparable
    * bit-for-bit against the sequential Huffman/arithmetic codings of
    * the same blocks. Optional restart markers re-prime the coder and
    * statistics every `restartInterval` blocks within each scan.
    */
  private[graft] def encodeGrayProgressive(
      coefBlocks: Seq[Array[Int]], bw: Int, bh: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(bw > 0 && bh > 0 && coefBlocks.length == bw * bh,
      s"block grid ${coefBlocks.length} != $bw x $bh")
    require(bw * 8 <= 0xffff && bh * 8 <= 0xffff, "dims exceed JPEG u16")
    require(coefBlocks.forall(_.length == 64), "blocks must be 8x8")
    val out = new java.io.ByteArrayOutputStream()
    def u8o(v: Int): Unit = out.write(v & 0xff)
    def u16o(v: Int): Unit = { u8o(v >> 8); u8o(v) }
    u16o(0xffd8)
    u16o(0xffdb); u16o(2 + 1 + 64); u8o(0x00) // DQT 0: all ones
    (0 until 64).foreach(_ => u8o(1))
    u16o(0xffca); u16o(8 + 3); u8o(8); u16o(bh * 8); u16o(bw * 8) // SOF10
    u8o(1); u8o(1); u8o(0x11); u8o(0)
    u16o(0xffcc); u16o(2 + 4) // DAC: defaults, made explicit
    u8o(0x00); u8o(0x10); u8o(0x10); u8o(0x05)
    if (restartInterval > 0) { u16o(0xffdd); u16o(4); u16o(restartInterval) }
    val cond = new Conditioning
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      u16o(0xffda); u16o(6 + 2); u8o(1); u8o(1); u8o(0x00)
      u8o(ss); u8o(se); u8o((ah << 4) | al)
    }
    /** Run one scan: fresh coder + statistics, restart markers every
      * `restartInterval` blocks, flush at the end.
      */
    def scan(perBlock: (Encoder, Stats, Array[Int]) => Unit)
        (onRestart: () => Unit = () => ()): Unit = {
      var enc = new Encoder(out)
      var stats = new Stats(1)
      var rstIdx = 0
      var i = 0
      while (i < coefBlocks.length) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          enc.flush()
          u16o(0xffd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          enc = new Encoder(out)
          stats = new Stats(1)
          onRestart()
        }
        perBlock(enc, stats, coefBlocks(i))
        i += 1
      }
      enc.flush()
    }
    // scan 1: DC first, Al=1
    sos(0, 0, 0, 1)
    var pred = 0
    scan((enc, stats, coef) =>
      pred = encodeDc(enc, stats, cond, 0, 0, pred, coef(0) >> 1))(
      () => pred = 0)
    // scans 2+3: AC first, split band, Al=1
    for ((lo, hi) <- Seq((1, 31), (32, 63))) {
      sos(lo, hi, 0, 1)
      scan((enc, stats, coef) =>
        encodeAcFirst(enc, stats, cond, 0, coef, ZigZag, lo, hi, 1))()
    }
    // scan 4: DC refinement, Ah=1 -> Al=0 (fixed-bin bit per block)
    sos(0, 0, 1, 0)
    scan((enc, stats, coef) =>
      enc.encode(stats.fixed, 0, coef(0) & 1))()
    // scan 5: AC refinement, full band, Ah=1 -> Al=0
    sos(1, 63, 1, 0)
    scan((enc, stats, coef) =>
      encodeAcRefine(enc, stats, 0, coef, ZigZag, 1, 63, 1, 0))()
    u16o(0xffd9)
    out.toByteArray
  }

  /** Block-constant grayscale arithmetic JPEG: value v becomes the
    * exact DC 8·(v−128) with zero AC — the same losslessly-codable
    * subset as the Huffman twin `encodeJpegBlocks`, so decoded pixels
    * equal the input grid bit-exactly.
    */
  private[graft] def encodeGrayBlocks(
      blocks: Array[Byte], bw: Int, bh: Int,
      restartInterval: Int = 0): Array[Byte] =
    encodeGrayCoefs(
      blocks.toSeq.map { v =>
        val c = new Array[Int](64)
        c(0) = 8 * ((v & 0xff) - 128)
        c
      }, bw, bh, restartInterval)

  /** Encode one DC value against `pred` (same scaled domain as
    * [[decodeDc]]); returns `value` as the new prediction.
    */
  def encodeDc(
      enc: Encoder, stats: Stats, cond: Conditioning, ci: Int,
      dcTbl: Int, pred: Int, value: Int): Int = {
    val dst = stats.dc(dcTbl)
    val base = stats.dcContext(ci)
    val diff = value - pred
    if (diff == 0) {
      enc.encode(dst, base, 0)
      stats.dcContext(ci) = 0
    } else {
      enc.encode(dst, base, 1)
      var v = diff
      var sign = 0
      if (v > 0) enc.encode(dst, base + 1, 0)
      else { v = -v; sign = 1; enc.encode(dst, base + 1, 1) }
      var si = base + 2 + sign
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(dst, si, 1)
        m = 1
        var v2 = v
        si = 20
        while ({ v2 >>= 1; v2 != 0 }) {
          enc.encode(dst, si, 1)
          m <<= 1
          si += 1
        }
      }
      enc.encode(dst, si, 0)
      stats.dcContext(ci) =
        if (m < ((1 << cond.dcL(dcTbl)) >> 1)) 0
        else if (m > ((1 << cond.dcU(dcTbl)) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      si += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 })
        enc.encode(dst, si, if ((mm & v) != 0) 1 else 0)
    }
    value
  }

  /** Encode one block's AC band `ss..se`, point-transformed by `al`
    * (division toward zero). Sequential = `(1, 63, 0)`.
    */
  def encodeAcFirst(
      enc: Encoder, stats: Stats, cond: Conditioning, acTbl: Int,
      coef: Array[Int], zigzag: Array[Int], ss: Int, se: Int,
      al: Int): Unit = {
    val ast = stats.ac(acTbl)
    def scaled(k: Int): Int = {
      val v = coef(zigzag(k))
      if (v < 0) -((-v) >> al) else v >> al
    }
    var ke = se
    while (ke >= ss && scaled(ke) == 0) ke -= 1
    var k = ss
    while (k <= ke) {
      var si = 3 * (k - 1)
      enc.encode(ast, si, 0) // not end-of-block
      while (scaled(k) == 0) {
        enc.encode(ast, si + 1, 0)
        si += 3; k += 1
      }
      enc.encode(ast, si + 1, 1)
      var v = scaled(k)
      if (v > 0) enc.encode(stats.fixed, 0, 0)
      else { v = -v; enc.encode(stats.fixed, 0, 1) }
      si += 2
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(ast, si, 1)
        m = 1
        var v2 = v
        if ({ v2 >>= 1; v2 != 0 }) {
          enc.encode(ast, si, 1)
          m = 2
          si = if (k <= cond.acK(acTbl)) 189 else 217
          while ({ v2 >>= 1; v2 != 0 }) {
            enc.encode(ast, si, 1)
            m <<= 1
            si += 1
          }
        }
      }
      enc.encode(ast, si, 0)
      si += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 })
        enc.encode(ast, si, if ((mm & v) != 0) 1 else 0)
      k += 1
    }
    if (ke < se) enc.encode(ast, 3 * (k - 1), 1) // end-of-block
  }

  /** AC refinement encoder (G.1.3.3), mirror of [[decodeAcRefine]]:
    * `ah` is the previous scan's point transform, `al = ah − 1`.
    */
  def encodeAcRefine(
      enc: Encoder, stats: Stats, acTbl: Int,
      coef: Array[Int], zigzag: Array[Int], ss: Int, se: Int,
      ah: Int, al: Int): Unit = {
    val ast = stats.ac(acTbl)
    def absShift(k: Int, s: Int): Int = math.abs(coef(zigzag(k))) >> s
    var ke = se
    while (ke >= ss && absShift(ke, al) == 0) ke -= 1
    var kex = ke
    while (kex >= ss && absShift(kex, ah) == 0) kex -= 1
    var k = ss
    while (k <= ke) {
      var si = 3 * (k - 1)
      if (k > kex) enc.encode(ast, si, 0) // band continues
      var done = false
      while (!done) {
        val t = absShift(k, al)
        if (t > 1) { // previously nonzero: correction bit
          enc.encode(ast, si + 2, t & 1)
          done = true
        } else if (t == 1) { // newly nonzero this scan
          enc.encode(ast, si + 1, 1)
          enc.encode(stats.fixed, 0, if (coef(zigzag(k)) < 0) 1 else 0)
          done = true
        } else {
          enc.encode(ast, si + 1, 0)
          si += 3; k += 1
        }
      }
      k += 1
    }
    if (ke < se) enc.encode(ast, 3 * (k - 1), 1) // end-of-band
  }

  /** Encode one block (F.1.4): DC difference against `pred`, then AC
    * run/EOB structure. `coef` natural order; returns the new pred.
    */
  def encodeBlock(
      enc: Encoder, stats: Stats, cond: Conditioning, ci: Int,
      dcTbl: Int, acTbl: Int, pred: Int, coef: Array[Int],
      zigzag: Array[Int]): Int = {
    val newPred = encodeDc(enc, stats, cond, ci, dcTbl, pred, coef(0))
    encodeAcFirst(enc, stats, cond, acTbl, coef, zigzag, 1, 63, 0)
    newPred
  }
}
