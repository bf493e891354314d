package graft.ops

/** REAL (non-stub) pixel/PCM decode for the container formats whose
  * codecs are pure JDK territory — no external library involved:
  *
  *   - BMP: uncompressed 24/32-bit BITMAPINFOHEADER — pixel rows are
  *     plain offsets (4-byte-aligned rows, bottom-up unless height is
  *     negative).
  *   - PNG: IDAT inflate via `java.util.zip.Inflater` (in the JDK) +
  *     the five scanline unfilter types (None/Sub/Up/Average/Paeth),
  *     8-bit depth, color types 0/2/4/6, non-interlaced.
  *   - WAV: PCM sample extraction (8/16-bit, any channel count,
  *     mono-mixed) from the RIFF `fmt `/`data` chunks.
  *   - GIF: from-scratch LZW decode of the first frame's index stream
  *     (variable code width, clear/end codes, KwKwK case), palette
  *     collapse, 4-pass interlace.
  *   - AVI: uncompressed (`##db`) frame extraction from the RIFF
  *     tree; compressed (`##dc`) streams self-described by a `strf`
  *     BITMAPINFOHEADER — Microsoft RLE8 (`biCompression = 1`) and
  *     RLE4 (`biCompression = 2`, nibble runs) expanded from scratch
  *     with their color tables; headerless MJPEG sniffed per chunk.
  *   - JPEG: sequential decode from scratch ([[Jpeg]]:
  *     DQT/DHT/DRI/SOF0-1/SOS, restart markers, dequant + IDCT) with
  *     BOTH entropy codings — baseline Huffman and SOF9 QM-arithmetic
  *     ([[JpegArith]]) — plus multi-scan progressive (SOF2); luma
  *     plane on this surface, full chroma via `Jpeg.decodeColor`.
  *
  * Everything decodes to one normalized surface — an unsigned-byte
  * grayscale buffer (images: BT.601 integer luma; audio: 16-bit
  * samples quantized to bytes) — so the downstream feature pipeline
  * (histogram/mean/thumbnail in [[Multimodal]]) is format-agnostic.
  * The classic-AVI codec family (MJPEG, RLE8, RLE4, CRAM) is
  * complete as scoped; modern inter-frame codecs stay behind
  * [[Multimodal.FakeCodec]]'s declared stub.
  *
  * Pinned by MultimodalSpec against hand-assembled container bytes
  * (known pixels → hand-applied filters → deflate → decode must
  * return the originals bit-exactly).
  */
object Codecs {

  /** One decoded payload: images are (width × height) grayscale;
    * audio is (n_frames × 1) quantized samples.
    */
  final case class Decoded(
      kind: String, width: Int, height: Int, gray: Array[Byte])

  /** Upper bound on decoded pixels per payload (32M ≈ a 5792×5792
    * image; RGBA working buffers ≤ ~170 MB, bounded even with a full
    * task slot's worth decoding concurrently). Headers are
    * attacker-controlled: without a cap, a 60-byte blob declaring
    * 50000×50000 makes the decoder allocate gigabytes (or overflow
    * Int arithmetic into a crash) before any pixel data is validated.
    * Over-cap payloads decline to None and fall back to the stub like
    * any other undecodable input.
    */
  private[ops] val MaxPixels: Long = 1L << 25

  /** True when w×h describes a plausibly decodable image: positive
    * dims whose product (computed in Long — w*h can wrap Int) fits
    * [[MaxPixels]].
    */
  private def saneDims(w: Int, h: Int): Boolean =
    w > 0 && h > 0 && w.toLong * h <= MaxPixels

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** BT.601 integer luma — the standard RGB→gray weighting. */
  private def luma(r: Int, g: Int, b: Int): Byte =
    ((299 * r + 587 * g + 114 * b) / 1000).toByte

  /** Uncompressed 24/32-bit BMP → grayscale. Rows are padded to 4
    * bytes and stored bottom-up unless the height field is negative
    * (top-down); pixels are BGR(A) order.
    */
  private[graft] def bmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0 || (bpp != 24 && bpp != 32) || !saneDims(w, h))
      return None
    val bytesPp = bpp / 8
    // row size in Long: w near Int.MaxValue would wrap w*bytesPp and
    // forge a negative rowSize that slips past the bounds check below
    val rowSize = ((w.toLong * bytesPp + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + rowSize * h > b.length)
      return None
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val sy = if (topDown) y else h - 1 - y
      // bounds-checked above: dataOff + rowSize*h <= b.length, so the
      // Long row base always fits an Int here
      val base = (dataOff + sy * rowSize).toInt
      var x = 0
      while (x < w) {
        val p = base + x * bytesPp
        gray(y * w + x) = luma(u8(b, p + 2), u8(b, p + 1), u8(b, p))
        x += 1
      }
      y += 1
    }
    Some(Decoded("bmp", w, h, gray))
  }

  private def paeth(a: Int, bb: Int, c: Int): Int = {
    val p = a + bb - c
    val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
  }

  /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per pass. */
  private[graft] val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** PNG → grayscale: chunk walk, concatenated-IDAT inflate, per-
    * scanline unfilter, channel collapse. 8-bit depth, color types
    * 0 (gray) / 2 (rgb) / 3 (palette, PLTE lookup) / 4 (gray+alpha)
    * / 6 (rgba); both interlace methods — Adam7 passes are each an
    * independently-filtered sub-image (the `up`/`prior` references
    * point at the SAME pass's previous scanline, never the full
    * image's), unfiltered at pass geometry and scattered into place.
    */
  private[graft] def png(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 33) return None
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(b, i) != sig(i)) return None; i += 1 }
    // IHDR is always the first chunk
    if (be32(b, 8) != 13 || !chunkTypeIs(b, 12, "IHDR")) return None
    val w = be32(b, 16); val h = be32(b, 20)
    val bitDepth = u8(b, 24); val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (!saneDims(w, h) || bitDepth != 8 || interlace > 1) return None
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // gather IDAT payloads (+ PLTE for palette images)
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var p = 33 // first chunk after IHDR (8 sig + 25 IHDR)
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || p + 12L + len > b.length) return None
      if (chunkTypeIs(b, p + 4, "IDAT")) idat.write(b, p + 8, len)
      else if (palette == null && chunkTypeIs(b, p + 4, "PLTE"))
        palette = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
      else if (chunkTypeIs(b, p + 4, "IEND")) done = true
      p += 12 + len
    }
    if (colorType == 3 && (palette == null || palette.isEmpty ||
        palette.length % 3 != 0)) return None
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    val bpp = channels // bytes per pixel at depth 8
    val passes = if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    val passDims = passes.map { case (xs, ys, xst, yst) =>
      val pw = if (w > xs) (w - xs + xst - 1) / xst else 0
      val ph = if (h > ys) (h - ys + yst - 1) / yst else 0
      (pw, ph)
    }
    val expected = passDims.map { case (pw, ph) =>
      if (pw > 0 && ph > 0) ph.toLong * (1L + pw.toLong * bpp) else 0L
    }.sum
    if (expected <= 0 || expected > Int.MaxValue) return None
    val raw = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // truncated stream — or one declaring a preset dictionary
        // (FDICT): there inflate returns 0 with needsInput() still
        // false, which would spin this loop forever on a crafted blob
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter each pass against its own previous scanline, then
    // scatter pixels to their full-image positions
    val px = new Array[Byte](w * h * bpp)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (xs, ys, xst, yst) = passes(pi)
      val (pw, ph) = passDims(pi)
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        val pass = new Array[Byte](ph * stride)
        var y = 0
        while (y < ph) {
          val f = u8(raw, off + y * (1 + stride))
          val rowIn = off + y * (1 + stride) + 1
          val rowOut = y * stride
          var x = 0
          while (x < stride) {
            val cur = u8(raw, rowIn + x)
            val a = if (x >= bpp) u8(pass, rowOut + x - bpp) else 0
            val up = if (y > 0) u8(pass, rowOut - stride + x) else 0
            val c =
              if (x >= bpp && y > 0) u8(pass, rowOut - stride + x - bpp)
              else 0
            val v = f match {
              case 0 => cur
              case 1 => cur + a
              case 2 => cur + up
              case 3 => cur + (a + up) / 2
              case 4 => cur + paeth(a, up, c)
              case _ => return None
            }
            pass(rowOut + x) = v.toByte
            x += 1
          }
          y += 1
        }
        var yy = 0
        while (yy < ph) {
          var xx = 0
          while (xx < pw) {
            val src = (yy * pw + xx) * bpp
            val dst = ((ys + yy * yst) * w + (xs + xx * xst)) * bpp
            var ch = 0
            while (ch < bpp) { px(dst + ch) = pass(src + ch); ch += 1 }
            xx += 1
          }
          yy += 1
        }
        off += ph * (1 + stride)
      }
      pi += 1
    }
    // collapse channels to gray (alpha ignored; palette → BT.601)
    val gray = new Array[Byte](w * h)
    var j = 0
    while (j < w * h) {
      val o = j * channels
      gray(j) =
        if (colorType == 3) {
          val idx = u8(px, o)
          if (3 * idx + 2 >= palette.length) return None
          luma(u8(palette, 3 * idx), u8(palette, 3 * idx + 1),
            u8(palette, 3 * idx + 2))
        } else if (channels >= 3) luma(u8(px, o), u8(px, o + 1), u8(px, o + 2))
        else px(o)
      j += 1
    }
    Some(Decoded("png", w, h, gray))
  }

  private def chunkTypeIs(b: Array[Byte], off: Int, t: String): Boolean =
    off + 4 <= b.length &&
      b(off) == t.charAt(0).toByte && b(off + 1) == t.charAt(1).toByte &&
      b(off + 2) == t.charAt(2).toByte && b(off + 3) == t.charAt(3).toByte

  /** WAV PCM → mono-mixed quantized samples: 16-bit LE signed samples
    * map to unsigned bytes via (s + 32768) >> 8; 8-bit samples are
    * already unsigned. Channels average per frame. Chunk sizes read
    * UNSIGNED with a Long cursor (same adversarial-input contract as
    * [[MediaHeaders]]).
    */
  private[graft] final case class WavInfo(
      tag: Int, channels: Int, bits: Int, blockAlign: Int,
      dataOff: Int, dataLen: Int, fmtOff: Int, fmtLen: Int)

  /** Shared RIFF/WAVE fmt+data extraction: first fmt / first data win
    * (matching the header sniffer's first-chunk semantics); Riff.walk
    * carries the termination contract for untrusted sizes.
    */
  private[graft] def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var tag = -1; var channels = 0; var bits = 0; var blockAlign = 0
    var sawFmt = false
    var dataOff = -1; var dataLen = 0
    var fmtOff = -1; var fmtLen = 0
    MediaHeaders.Riff.walk[Unit](b, 12L, b.length.toLong) { (p, size) =>
      if (!sawFmt && b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' &&
        b(p + 3) == ' ' && p + 8 + 16 <= b.length) {
        val d = p + 8
        sawFmt = true
        tag = le16(b, d)
        channels = le16(b, d + 2)
        blockAlign = le16(b, d + 12)
        bits = le16(b, d + 14)
        fmtOff = d
        fmtLen = math.min(size, (b.length - d).toLong).toInt
      } else if (dataOff < 0 && b(p) == 'd' && b(p + 1) == 'a' &&
        b(p + 2) == 't' && b(p + 3) == 'a') {
        dataOff = p + 8
        dataLen = math.min(size, (b.length - dataOff).toLong).toInt
      }
      None
    }
    if (!sawFmt || dataOff < 0) None
    else Some(WavInfo(tag, channels, bits, blockAlign, dataOff, dataLen,
      fmtOff, fmtLen))
  }

  /** MS ADPCM coefficient table from the `fmt ` extension
    * (cbSize, wSamplesPerBlock, wNumCoef, then int16 pairs); the
    * standard seven-pair table when the extension is absent or
    * truncated. A stream-declared table smaller than a block's
    * predictor index makes that block decline, exactly like any
    * other malformed header.
    */
  private def msCoefTable(b: Array[Byte], info: WavInfo): Array[(Int, Int)] = {
    val d = info.fmtOff
    if (info.fmtLen < 22) return Adpcm.MsCoefPairs
    val nCoef = le16(b, d + 20)
    if (nCoef <= 0 || nCoef > 64 || info.fmtLen < 22 + 4 * nCoef)
      return Adpcm.MsCoefPairs
    Array.tabulate(nCoef) { i =>
      (le16(b, d + 22 + 4 * i).toShort.toInt,
        le16(b, d + 24 + 4 * i).toShort.toInt)
    }
  }

  /** Decoded 16-bit mono samples for the exact-arithmetic audio
    * formats: PCM-16 mono (tag 1), G.711 A-law/µ-law mono (6/7), IMA
    * ADPCM mono (0x11, complete blocks only — the header predictor is
    * each block's first sample). Mono-only BY CONTRACT: this is the
    * bit-exact path the oracled queries hash, and channel mixing
    * would reintroduce a rounding convention; multichannel audio
    * flows through [[wav]]'s gray mapping instead.
    */
  private[graft] def wavSamples16(b: Array[Byte]): Option[Array[Short]] = {
    val info = wavInfo(b).getOrElse(return None)
    import info._
    if (channels != 1 || dataLen <= 0) return None
    tag match {
      case 1 if bits == 16 =>
        val n = dataLen / 2
        if (n <= 0) return None
        Some(Array.tabulate(n)(i => le16(b, dataOff + 2 * i).toShort))
      case 6 | 7 if bits == 8 =>
        val dec: Int => Int =
          if (tag == 7) Adpcm.ulawToPcm else Adpcm.alawToPcm
        Some(Array.tabulate(dataLen)(i => dec(u8(b, dataOff + i)).toShort))
      case 0x11 if bits == 4 && blockAlign > 4 =>
        val nBlocks = dataLen / blockAlign
        if (nBlocks <= 0) return None
        val out = new scala.collection.mutable.ArrayBuffer[Short](
          nBlocks * (1 + 2 * (blockAlign - 4)))
        var blk = 0
        while (blk < nBlocks) {
          val s = Adpcm.decodeMonoBlock(b, dataOff + blk * blockAlign,
            blockAlign).getOrElse(return None)
          out ++= s
          blk += 1
        }
        Some(out.toArray)
      case 2 if bits == 4 && blockAlign > 7 =>
        val coefs = msCoefTable(b, info)
        val nBlocks = dataLen / blockAlign
        if (nBlocks <= 0) return None
        val out = new scala.collection.mutable.ArrayBuffer[Short](
          nBlocks * (2 + 2 * (blockAlign - 7)))
        var blk = 0
        while (blk < nBlocks) {
          val s = Adpcm.decodeMsMonoBlock(b, dataOff + blk * blockAlign,
            blockAlign, coefs).getOrElse(return None)
          out ++= s
          blk += 1
        }
        Some(out.toArray)
      case _ => None
    }
  }

  private[graft] def wav(b: Array[Byte]): Option[Decoded] = {
    val info = wavInfo(b).getOrElse(return None)
    val fmtOk = info.tag == 1
    val channels = info.channels
    val bits = info.bits
    val dataOff = info.dataOff
    val dataLen = info.dataLen
    if (!fmtOk || channels <= 0 || (bits != 8 && bits != 16)) {
      // compressed mono formats: decode through the exact path, then
      // the same (s+32768)>>8 gray mapping as PCM-16
      return wavSamples16(b).flatMap { s =>
        if (s.isEmpty) None
        else Some(Decoded("wav", s.length, 1,
          s.map(v => ((v + 32768) >> 8).toByte)))
      }
    }
    val bytesPerSample = bits / 8
    val frameBytes = channels * bytesPerSample
    val frames = dataLen / frameBytes
    if (frames <= 0) return None
    val gray = new Array[Byte](frames)
    var f = 0
    while (f < frames) {
      var sum = 0L
      var ch = 0
      while (ch < channels) {
        val o = dataOff + f * frameBytes + ch * bytesPerSample
        sum += (if (bits == 16) (le16(b, o).toShort.toInt + 32768) >> 8
                else u8(b, o))
        ch += 1
      }
      gray(f) = (sum / channels).toByte
      f += 1
    }
    Some(Decoded("wav", frames, 1, gray))
  }

  /** GIF → grayscale: logical-screen/palette parse, first image
    * frame's LZW-compressed index stream decoded from scratch (the
    * GIF LZW variant: variable code width m+1..12, clear/end codes,
    * dictionary rebuilt on clear), palette indices collapsed to BT.601
    * luma, Adam-free 4-pass interlace honored. 87a and 89a; animation
    * frames beyond the first are out of scope (inventory semantics:
    * one representative frame).
    */
  private[graft] def gif(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return None
    val gctFlag = (u8(b, 10) & 0x80) != 0
    val gctSize = 2 << (u8(b, 10) & 0x07)
    var p = 13
    var palette: Array[Byte] = null
    if (gctFlag) {
      if (p + 3 * gctSize > b.length) return None
      palette = java.util.Arrays.copyOfRange(b, p, p + 3 * gctSize)
      p += 3 * gctSize
    }
    while (p < b.length) {
      u8(b, p) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label, then sub-blocks to terminator
          p += 2
          while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
          p += 1
        case 0x2c =>
          if (p + 10 > b.length) return None
          val w = le16(b, p + 5); val h = le16(b, p + 7)
          val packed = u8(b, p + 9)
          val interlaced = (packed & 0x40) != 0
          // le16 dims are <= 65535 each, but 65535² still overflows
          // the Int pixel count handed to lzwDecode
          if (!saneDims(w, h)) return None
          p += 10
          if ((packed & 0x80) != 0) { // local color table wins
            val n = 2 << (packed & 0x07)
            if (p + 3 * n > b.length) return None
            palette = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
            p += 3 * n
          }
          if (palette == null || w <= 0 || h <= 0 || p >= b.length) return None
          val minCode = u8(b, p); p += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the length-prefixed data sub-blocks
          val comp = new java.io.ByteArrayOutputStream()
          while (p < b.length && u8(b, p) != 0) {
            val n = u8(b, p)
            if (p + 1 + n > b.length) return None
            comp.write(b, p + 1, n)
            p += 1 + n
          }
          return lzwDecode(minCode, comp.toByteArray, w * h).map { idx =>
            val seq = new Array[Byte](w * h)
            var si = 0
            // interlaced GIFs store rows in four passes (8/8/4/2 stride)
            val order: Array[Int] =
              if (!interlaced) Array.tabulate(h)(identity)
              else ((0 until h by 8) ++ (4 until h by 8) ++
                (2 until h by 4) ++ (1 until h by 2)).toArray
            var r = 0
            while (r < h) {
              val dr = order(r)
              var x = 0
              while (x < w) {
                val ci = (idx(si) & 0xff) * 3
                seq(dr * w + x) =
                  if (ci + 2 < palette.length)
                    luma(u8(palette, ci), u8(palette, ci + 1), u8(palette, ci + 2))
                  else 0
                si += 1; x += 1
              }
              r += 1
            }
            Decoded("gif", w, h, seq)
          }
        case _ => return None
      }
    }
    None
  }

  /** ANIMATED GIF → per-frame grayscale canvases: walks every image
    * descriptor, compositing each frame's (possibly sub-rectangle,
    * possibly transparent-keyed) pixels onto the logical screen with
    * the GIF89a disposal semantics — 0/1 leave in place, 2 restore
    * the rect to the background color, 3 restore the pre-frame
    * canvas. Transparency (GCE flag + index) skips pixels, letting
    * the previous frame show through — GIF's inter-frame prediction.
    * Returns one full-canvas snapshot per frame; None on any
    * malformed structure (rect outside the screen, missing palette,
    * truncated LZW), never a partial sequence.
    */
  private[graft] def gifFrames(b: Array[Byte]): Option[Seq[Decoded]] = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return None
    val sw = le16(b, 6); val sh = le16(b, 8)
    if (!saneDims(sw, sh)) return None
    val gctFlag = (u8(b, 10) & 0x80) != 0
    val gctSize = 2 << (u8(b, 10) & 0x07)
    val bgIndex = u8(b, 11)
    var p = 13
    var gct: Array[Byte] = null
    if (gctFlag) {
      if (p + 3 * gctSize > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, p, p + 3 * gctSize)
      p += 3 * gctSize
    }
    def lumaOf(pal: Array[Byte], idx: Int): Byte =
      if (pal != null && 3 * idx + 2 < pal.length)
        luma(u8(pal, 3 * idx), u8(pal, 3 * idx + 1), u8(pal, 3 * idx + 2))
      else 0
    val bgGray = lumaOf(gct, bgIndex)
    val canvas = Array.fill[Byte](sw * sh)(bgGray)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Decoded]
    var disposal = 0
    var transparent = -1
    while (p < b.length) {
      u8(b, p) match {
        case 0x3b =>
          return if (frames.isEmpty) None else Some(frames.toSeq)
        case 0x21 =>
          if (p + 2 > b.length) return None
          val label = u8(b, p + 1)
          var q = p + 2
          if (label == 0xf9 && q + 5 <= b.length && u8(b, q) >= 4) {
            val packed = u8(b, q + 1)
            disposal = (packed >> 2) & 7
            transparent = if ((packed & 1) != 0) u8(b, q + 4) else -1
          }
          while (q < b.length && u8(b, q) != 0) q += 1 + u8(b, q)
          p = q + 1
        case 0x2c =>
          if (p + 10 > b.length) return None
          val fx = le16(b, p + 1); val fy = le16(b, p + 3)
          val fw = le16(b, p + 5); val fh = le16(b, p + 7)
          val packed = u8(b, p + 9)
          val interlaced = (packed & 0x40) != 0
          if (fw <= 0 || fh <= 0 || fx + fw > sw || fy + fh > sh)
            return None
          p += 10
          var pal = gct
          if ((packed & 0x80) != 0) {
            val n = 2 << (packed & 0x07)
            if (p + 3 * n > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
            p += 3 * n
          }
          if (pal == null || p >= b.length) return None
          val minCode = u8(b, p); p += 1
          if (minCode < 2 || minCode > 8) return None
          val comp = new java.io.ByteArrayOutputStream()
          while (p < b.length && u8(b, p) != 0) {
            val n = u8(b, p)
            if (p + 1 + n > b.length) return None
            comp.write(b, p + 1, n)
            p += 1 + n
          }
          p += 1 // block terminator
          val idx = lzwDecode(minCode, comp.toByteArray, fw * fh)
            .getOrElse(return None)
          val before = if (disposal == 3) canvas.clone() else null
          val order: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else ((0 until fh by 8) ++ (4 until fh by 8) ++
              (2 until fh by 4) ++ (1 until fh by 2)).toArray
          var r = 0
          var si = 0
          while (r < fh) {
            val dr = fy + order(r)
            var x = 0
            while (x < fw) {
              val ci = idx(si) & 0xff
              if (ci != transparent)
                canvas(dr * sw + fx + x) = lumaOf(pal, ci)
              si += 1; x += 1
            }
            r += 1
          }
          frames += Decoded("gif", sw, sh, canvas.clone())
          disposal match {
            case 2 =>
              var yy = fy
              while (yy < fy + fh) {
                var xx = fx
                while (xx < fx + fw) {
                  canvas(yy * sw + xx) = bgGray; xx += 1
                }
                yy += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          disposal = 0
          transparent = -1
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** Baseline grayscale TIFF, BOTH byte orders: `II`/`MM` header →
    * IFD entry walk → strip assembly, honoring Compression 1 (none)
    * and 32773 (PackBits) and PhotometricInterpretation 0/1 —
    * WhiteIsZero (0) stores INVERTED samples, so a decoder ignoring
    * the tag returns a negated image. Every multi-byte read (magic,
    * IFD offset, tag/type/count, SHORT-in-value-field, external
    * offset/count arrays) goes through the file's declared byte
    * order; TIFF 6.0 left-justifies an inline value at the value
    * field's first byte in both orders. Strip offset/count arrays may
    * be SHORT or LONG. None on any malformed structure (bad magic,
    * truncated IFD, strip overrun, PackBits not consuming its strip
    * exactly), never a partial surface.
    */
  private[graft] def tiff(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8) return None
    val little = b(0) == 'I' && b(1) == 'I'
    if (!little && !(b(0) == 'M' && b(1) == 'M')) return None
    def r16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (little) le16(b, i) else (u8(b, i) << 8) | u8(b, i + 1)
    def r32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (little) le32(b, i) & 0xffffffffL else be32(b, i) & 0xffffffffL
    if (r16(2) != 42) return None
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val nEntries = r16(ifd.toInt)
    if (nEntries <= 0 || ifd + 2 + 12L * nEntries + 4 > b.length) return None
    // tag -> element values, widened to Long; SHORT(3) and LONG(4)
    // only (the baseline grayscale set needs no rationals)
    val tags = scala.collection.mutable.Map.empty[Int, Array[Long]]
    var k = 0
    while (k < nEntries) {
      val e = ifd.toInt + 2 + 12 * k
      val tag = r16(e); val typ = r16(e + 2); val cnt = r32(e + 4)
      if (typ == 3 || typ == 4) {
        val sz = if (typ == 3) 2 else 4
        if (cnt < 0 || cnt > (1 << 16)) return None
        val base =
          if (cnt * sz <= 4) e + 8
          else {
            val off = r32(e + 8)
            if (off < 0 || off + cnt * sz > b.length) return None
            off.toInt
          }
        val vals = new Array[Long](cnt.toInt)
        var j = 0
        while (j < cnt) {
          vals(j) = if (typ == 3) r16(base + 2 * j).toLong else r32(base + 4 * j)
          if (vals(j) < 0) return None
          j += 1
        }
        tags(tag) = vals
      }
      k += 1
    }
    def one(tag: Int): Option[Long] =
      tags.get(tag).filter(_.length == 1).map(_.head)
    val w = one(256).getOrElse(return None).toInt
    val h = one(257).getOrElse(return None).toInt
    if (!saneDims(w, h)) return None
    if (one(258).getOrElse(8L) != 8L) return None
    if (one(277).getOrElse(1L) != 1L) return None
    val comp = one(259).getOrElse(1L)
    if (comp != 1L && comp != 32773L) return None
    val photo = one(262).getOrElse(return None)
    if (photo != 0L && photo != 1L) return None
    val rps = one(278).getOrElse(h.toLong).toInt
    if (rps <= 0) return None
    val nStrips = (h + rps - 1) / rps
    val offs = tags.getOrElse(273, return None)
    val cnts = tags.getOrElse(279, return None)
    if (offs.length != nStrips || cnts.length != nStrips) return None
    val gray = new Array[Byte](w * h)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rps, h - strip * rps)
      val need = rows * w
      val off = offs(strip); val len = cnts(strip)
      if (off < 0 || len < 0 || off + len > b.length) return None
      val dst = strip * rps * w
      if (comp == 1L) {
        if (len != need) return None
        System.arraycopy(b, off.toInt, gray, dst, need)
      } else {
        // PackBits: n>=0 copies n+1 literals; -127<=n<=-1 repeats the
        // next byte 1-n times; -128 is a no-op. The strip must
        // produce exactly its rows and consume exactly its bytes.
        var i = off.toInt; val end = (off + len).toInt
        var o = 0
        while (o < need) {
          if (i >= end) return None
          val n = b(i); i += 1
          if (n >= 0) {
            val c = n + 1
            if (i + c > end || o + c > need) return None
            System.arraycopy(b, i, gray, dst + o, c); i += c; o += c
          } else if (n != -128) {
            val c = 1 - n
            if (i >= end || o + c > need) return None
            java.util.Arrays.fill(gray, dst + o, dst + o + c, b(i))
            i += 1; o += c
          }
        }
        if (i != end) return None
      }
      strip += 1
    }
    if (photo == 0L) {
      var i = 0
      while (i < gray.length) { gray(i) = (~gray(i)).toByte; i += 1 }
    }
    Some(Decoded("tiff", w, h, gray))
  }

  /** From-scratch GIF-variant LZW decode: codes read LSB-first at a
    * width that grows from `minCode`+1 to 12 as the dictionary fills,
    * `clear` resets the table, `end` stops. Returns exactly
    * `expected` index bytes or None on any corruption/truncation.
    */
  private[graft] def lzwDecode(
      minCode: Int, data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val endCode = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Byte](maxDict)
    val stack = new Array[Byte](maxDict)
    var width = minCode + 1
    var dictSize = clear + 2
    val out = new java.io.ByteArrayOutputStream(expected)
    val totalBits = data.length * 8L
    var bitPos = 0L
    def readCode(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0; var i = 0
      while (i < width) {
        val bp = bitPos + i
        if (((data((bp >> 3).toInt) >> (bp & 7).toInt) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    // expand a code onto the stack (reversed); returns length, -1 bad
    def expand(code: Int): Int = {
      var c = code; var n = 0
      while (c >= clear + 2) {
        if (n >= maxDict) return -1
        stack(n) = suffix(c); n += 1; c = prefix(c)
      }
      if (c >= clear) return -1 // chain must end in a literal
      stack(n) = c.toByte; n += 1
      n
    }
    def emit(n: Int): Unit = {
      var i = n - 1
      while (i >= 0 && out.size() < expected) { out.write(stack(i)); i -= 1 }
    }
    var prev = -1
    var running = true
    while (running && out.size() < expected) {
      val code = readCode()
      if (code < 0 || code == endCode) running = false
      else if (code == clear) {
        width = minCode + 1; dictSize = clear + 2; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None
        val n = expand(code); if (n < 0) return None
        emit(n); prev = code
      } else {
        var n = 0
        if (code < dictSize) { n = expand(code); if (n < 0) return None }
        else if (code == dictSize) {
          // KwKwK case: string(prev) + first(string(prev))
          n = expand(prev); if (n < 0) return None
          val first = stack(n - 1)
          // shift up by one and append first at the BOTTOM (reversed)
          var i = n
          while (i > 0) { stack(i) = stack(i - 1); i -= 1 }
          stack(0) = first
          n += 1
        } else return None
        emit(n)
        if (dictSize < maxDict) {
          prefix(dictSize) = prev
          suffix(dictSize) = stack(n - 1) // first byte of current string
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (out.size() == expected) Some(out.toByteArray) else None
  }

  /** Uncompressed-AVI frame extraction: walk the RIFF tree to the
    * `movi` LIST and return every `##db` chunk's bytes (uncompressed
    * DIB frames — the only AVI codec that IS no codec). Chunk sizes
    * unsigned, Long cursor (untrusted input).
    */
  private[graft] def aviFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] =
    aviFrameChunks(b).map(_.collect { case (false, f) => f })

  /** Declared video-stream format of an AVI: the first `vids` stream's
    * `strf` BITMAPINFOHEADER (compression fourcc/code, bit depth) plus
    * its color table collapsed to a 256-entry grayscale LUT (each
    * RGBQUAD through the same BT.601 integer luma as every other
    * decoder here; entries past the declared `biClrUsed` stay identity
    * so an 8bpp stream with a short palette still resolves). This is
    * how a real AVI reader decides what `##dc` chunks contain —
    * headerless fixtures (no `strl` LIST) return None and consumers
    * fall back to per-chunk sniffing (MJPEG).
    */
  final case class AviFormat(
      compression: Int, bitCount: Int, grayLut: Array[Byte])

  /** BI_RLE8 — the `biCompression` code for Microsoft RLE8. */
  private[graft] val BiRle8 = 1

  /** BI_RLE4 — the `biCompression` code for Microsoft RLE4. */
  private[graft] val BiRle4 = 2

  private[graft] def aviVideoFormat(b: Array[Byte]): Option[AviFormat] = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'A' || b(9) != 'V' ||
      b(10) != 'I' || b(11) != ' ')
      return None
    def listIs(p: Int, kind: String): Boolean =
      p + 12 <= b.length && b(p) == 'L' && b(p + 1) == 'I' &&
        b(p + 2) == 'S' && b(p + 3) == 'T' &&
        b(p + 8) == kind(0) && b(p + 9) == kind(1) &&
        b(p + 10) == kind(2) && b(p + 11) == kind(3)
    def fourccIs(p: Int, t: String): Boolean =
      p + 4 <= b.length && b(p) == t(0) && b(p + 1) == t(1) &&
        b(p + 2) == t(2) && b(p + 3) == t(3)
    MediaHeaders.Riff.walk[AviFormat](b, 12L, b.length.toLong) { (p, size) =>
      if (!listIs(p, "hdrl")) None
      else {
        val hdrlEnd = math.min(p + 8L + size, b.length.toLong)
        MediaHeaders.Riff.walk[AviFormat](b, p + 12L, hdrlEnd) { (sp, ssize) =>
          if (!listIs(sp, "strl")) None
          else {
            val strlEnd = math.min(sp + 8L + ssize, b.length.toLong)
            // a strl describes ONE stream: require its strh to be video
            val isVids = MediaHeaders.Riff.walk[Boolean](
              b, sp + 12L, strlEnd) { (cp, _) =>
                if (fourccIs(cp, "strh")) Some(fourccIs(cp + 8, "vids"))
                else None
              }.getOrElse(false)
            if (!isVids) None
            else MediaHeaders.Riff.walk[AviFormat](
              b, sp + 12L, strlEnd) { (cp, cs) =>
                if (!fourccIs(cp, "strf") || cs < 40 ||
                  cp + 8L + cs > b.length) None
                else {
                  val d = cp + 8
                  val bitCount = le16(b, d + 14)
                  val compression = le32(b, d + 16)
                  val declared = le32(b, d + 32) // biClrUsed; 0 = 2^bpp
                  val entries = math.min(
                    if (declared != 0) declared
                    else if (bitCount > 0 && bitCount <= 8) 1 << bitCount
                    else 0,
                    ((cs - 40) / 4).toInt)
                  val lut = Array.tabulate(256)(_.toByte) // identity tail
                  var i = 0
                  while (i < entries && i < 256) {
                    val q = d + 40 + i * 4 // RGBQUAD: blue, green, red, 0
                    lut(i) = luma(u8(b, q + 2), u8(b, q + 1), u8(b, q))
                    i += 1
                  }
                  Some(AviFormat(compression, bitCount, lut))
                }
              }
          }
        }
      }
    }
  }

  /** Microsoft RLE8 frame decode (BI_RLE8, the `biCompression = 1`
    * codec of 8bpp AVIs and BMPs): bottom-up rows of (count, index)
    * run pairs with the three escapes — end-of-line `00 00`,
    * end-of-bitmap `00 01`, position delta `00 02 dx dy` — and
    * absolute mode `00 n≥3` (n literal indices, word-aligned).
    * Pixels the stream never touches (possible after a delta or a
    * short row) take index 0, the conventional background. Output is
    * the top-down grayscale surface every other decoder produces,
    * indices resolved through `grayLut`. None on any structural
    * violation: overrun past the row/bitmap edge, a truncated run or
    * escape, or a stream that ends without end-of-bitmap — the same
    * all-or-nothing contract as the rest of the codec set.
    */
  private[graft] def rle8Decode(
      data: Array[Byte], w: Int, h: Int,
      grayLut: Array[Byte]): Option[Array[Byte]] = {
    if (!saneDims(w, h) || grayLut.length != 256) return None
    val idx = new Array[Byte](w * h) // bottom-up index surface
    var x = 0
    var y = 0 // bitmap space: row 0 is the BOTTOM row
    var i = 0
    var done = false
    while (!done) {
      if (i + 2 > data.length) return None // ran out before EOB
      val n = u8(data, i)
      val v = u8(data, i + 1)
      i += 2
      if (n > 0) {
        if (y >= h || x + n > w) return None
        var k = y * w + x
        val end = k + n
        while (k < end) { idx(k) = v.toByte; k += 1 }
        x += n
      } else v match {
        case 0 => x = 0; y += 1 // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta: skip right dx, up dy (bitmap space)
          if (i + 2 > data.length) return None
          x += u8(data, i); y += u8(data, i + 1); i += 2
          if (x > w || y > h) return None
        case lit => // absolute: lit literal indices, word-aligned
          if (y >= h || x + lit > w) return None
          if (i + lit + (lit & 1) > data.length) return None
          System.arraycopy(data, i, idx, y * w + x, lit)
          x += lit
          i += lit + (lit & 1)
      }
    }
    val gray = new Array[Byte](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        gray(yy * w + xx) = grayLut(u8(idx, (h - 1 - yy) * w + xx))
        xx += 1
      }
      yy += 1
    }
    Some(gray)
  }

  /** Microsoft RLE4 frame decode (BI_RLE4, `biCompression = 2`, the
    * 4bpp sibling of [[rle8Decode]]): the same bottom-up state
    * machine with NIBBLE payloads — an encoded run of `n` pixels
    * ALTERNATES the two nibbles of its value byte (high first, so a
    * solid run writes `(v<<4)|v`), absolute mode packs its `n`
    * literal indices two nibbles per byte (then word-aligns the byte
    * count exactly as RLE8 aligns its literal bytes), and the three
    * escapes — end-of-line, end-of-bitmap, position delta — are
    * byte-identical to RLE8's. Indices resolve through the same
    * 256-entry `grayLut`; a 4bpp palette occupies entries 0–15 and
    * the identity tail never fires. None on any structural
    * violation, the all-or-nothing contract of the codec set.
    */
  private[graft] def rle4Decode(
      data: Array[Byte], w: Int, h: Int,
      grayLut: Array[Byte]): Option[Array[Byte]] = {
    if (!saneDims(w, h) || grayLut.length != 256) return None
    val idx = new Array[Byte](w * h) // bottom-up index surface
    var x = 0
    var y = 0 // bitmap space: row 0 is the BOTTOM row
    var i = 0
    var done = false
    while (!done) {
      if (i + 2 > data.length) return None // ran out before EOB
      val n = u8(data, i)
      val v = u8(data, i + 1)
      i += 2
      if (n > 0) {
        if (y >= h || x + n > w) return None
        val hi = ((v >> 4) & 0xf).toByte
        val lo = (v & 0xf).toByte
        var k = y * w + x
        var j = 0
        while (j < n) {
          idx(k) = if ((j & 1) == 0) hi else lo
          k += 1; j += 1
        }
        x += n
      } else v match {
        case 0 => x = 0; y += 1 // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta: skip right dx, up dy (bitmap space)
          if (i + 2 > data.length) return None
          x += u8(data, i); y += u8(data, i + 1); i += 2
          if (x > w || y > h) return None
        case lit => // absolute: lit literal NIBBLES, word-aligned bytes
          if (y >= h || x + lit > w) return None
          val nb = (lit + 1) / 2
          if (i + nb + (nb & 1) > data.length) return None
          var k = y * w + x
          var j = 0
          while (j < lit) {
            val b = u8(data, i + (j >> 1))
            idx(k) = (if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf).toByte
            k += 1; j += 1
          }
          x += lit
          i += nb + (nb & 1)
      }
    }
    val gray = new Array[Byte](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        gray(yy * w + xx) = grayLut(u8(idx, (h - 1 - yy) * w + xx))
        xx += 1
      }
      yy += 1
    }
    Some(gray)
  }

  /** All video frame chunks of an AVI's `movi` LIST, tagged compressed
    * (`##dc` — e.g. MJPEG, where each chunk is a complete baseline
    * JPEG stream [[Jpeg]] decodes) or uncompressed (`##db` raw DIB).
    * Other AVI codecs also ship as `##dc`; whether a compressed chunk
    * is decodable is the consumer's per-chunk decision (a failed
    * [[Jpeg.decode]] falls back like any other undecodable payload).
    */
  private[graft] def aviFrameChunks(
      b: Array[Byte]): Option[Vector[(Boolean, Array[Byte])]] = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'A' || b(9) != 'V' ||
      b(10) != 'I' || b(11) != ' ')
      return None
    val frames = Vector.newBuilder[(Boolean, Array[Byte])]
    var found = false
    MediaHeaders.Riff.walk[Unit](b, 12L, b.length.toLong) { (p, size) =>
      if (b(p) == 'L' && b(p + 1) == 'I' && b(p + 2) == 'S' &&
        b(p + 3) == 'T' && p + 12 <= b.length && b(p + 8) == 'm' &&
        b(p + 9) == 'o' && b(p + 10) == 'v' && b(p + 11) == 'i') {
        found = true
        val end = math.min(p + 8L + size, b.length.toLong)
        MediaHeaders.Riff.walk[Unit](b, p + 12L, end) { (cp, cs) =>
          // '##db' = uncompressed DIB, '##dc' = compressed frame
          if (b(cp + 2) == 'd' &&
            (b(cp + 3) == 'b' || b(cp + 3) == 'c') &&
            cp + 8L + cs <= end && cs <= Int.MaxValue)
            frames += ((b(cp + 3) == 'c',
              java.util.Arrays.copyOfRange(b, cp + 8, cp + 8 + cs.toInt)))
          None
        }: Unit
      }
      None
    }
    if (found) Some(frames.result()) else None
  }

  /** Decode a payload with the real JDK-only codecs; None = format
    * unrecognized or outside the decodable subset (callers fall back
    * to [[Multimodal.FakeCodec]]).
    */
  def decode(payload: Array[Byte]): Option[Decoded] =
    if (payload == null || payload.length < 2) None
    else png(payload).orElse(bmp(payload)).orElse(gif(payload))
      .orElse(tiff(payload)).orElse(wav(payload))
      .orElse(Jpeg.decode(payload))
}
