package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection over binary image columns
  * — media-level dedup, the visual sibling of [[Dedup.simhashPairs]].
  *
  * Pipeline: payload bytes → real decode ([[Codecs.decode]]) → area-
  * average resample to the canonical 9×8 grid → 64-bit difference
  * hash (dHash: each bit compares horizontally adjacent grays, so the
  * signature is invariant to uniform brightness/contrast shifts) →
  * pigeonhole banding on 16-bit quarters → exact Hamming verification.
  *
  * With 4 bands over 64 bits, any pair at Hamming distance ≤ 3 has at
  * least one untouched band (pigeonhole), so candidate generation is
  * EXHAUSTIVE at the default threshold and the verified result is
  * exact — which is what lets `mm_near_dup` carry a full DuckDB
  * oracle: the fixture's images are deterministic (md5-derived pixels,
  * see [[syntheticImages]]), so the oracle recomputes pixels
  * arithmetically while the engine round-trips them through actual BMP
  * bytes and the [[Codecs]] decoder — hash equality proves the whole
  * codec path lossless, not just the hash algebra.
  *
  * Scale: signatures are one narrow `mapPartitions` scan over payloads
  * (the batch-codec shape — payload bytes never shuffle; 8 bytes per
  * image leave the scan); banding shuffles (band, key, doc_id) rows
  * only; verification joins signatures back by id — the same
  * bucket-join economics as every other dedup path here.
  */
object PerceptualHash {

  /** Canonical dHash grid: 9 columns × 8 rows → 8×8 = 64 bits. */
  private val GridW = 9
  private val GridH = 8

  /** 24-bit uncompressed BMP (bottom-up, rows padded to 4 bytes) from
    * a grayscale buffer — from-scratch encoder, the write-side twin of
    * [[Codecs.bmp]]. r = g = b = gray, so the decoder's BT.601 luma
    * reconstructs the exact input byte ((299g+587g+114g)/1000 = g).
    */
  /** GIF-variant LZW encode, literal codes only: every index is
    * emitted as its own code while tracking the DECODER's dictionary
    * growth (an entry per emitted code after the first, width bump
    * when the size hits 2^width, cap 4096) so the bit widths stay in
    * lockstep — the classic "uncompressed GIF" technique, wire-valid
    * for any decoder and trivially deterministic.
    */
  private def lzwEncodeLiterals(idx: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    var dictSize = clear + 2
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    def write(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8
      }
    }
    write(clear)
    var first = true
    idx.foreach { i =>
      write(i & 0xff)
      if (first) first = false
      else if (dictSize < 4096) {
        dictSize += 1
        if (dictSize == (1 << width) && width < 12) width += 1
      }
    }
    write(end)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** One animated-GIF frame spec: a sub-rectangle of palette indices
    * placed at (x, y), drawn with `disposal` and an optional
    * transparent index. */
  final case class GifFrame(
      x: Int, y: Int, w: Int, h: Int, idx: Array[Byte],
      disposal: Int = 0, transparent: Int = -1)

  /** Animated GIF89a encoder — the write-side twin of
    * [[Codecs.gifFrames]]: global color table, a graphic-control
    * extension per frame (disposal + transparency), image descriptors
    * at their offsets, literal-LZW pixel data.
    */
  def encodeGifAnim(sw: Int, sh: Int, gct: Array[Byte],
      frames: Seq[GifFrame], bgIndex: Int = 0): Array[Byte] = {
    require(gct.length % 3 == 0 && gct.nonEmpty, "bad palette")
    val nColors = gct.length / 3
    require(Integer.bitCount(nColors) == 1 && nColors >= 4,
      "palette size must be a power of two >= 4")
    val minCode = math.max(2, 32 - Integer.numberOfLeadingZeros(nColors - 1))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    le16(sw); le16(sh)
    val sizeField = 31 - Integer.numberOfLeadingZeros(nColors) - 1
    out.write(0x80 | sizeField) // GCT present
    out.write(bgIndex); out.write(0)
    out.write(gct, 0, gct.length)
    frames.foreach { f =>
      require(f.idx.length == f.w * f.h, "bad frame surface")
      // graphic control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      val packed = ((f.disposal & 7) << 2) |
        (if (f.transparent >= 0) 1 else 0)
      out.write(packed); le16(0)
      out.write(if (f.transparent >= 0) f.transparent else 0)
      out.write(0) // terminator
      // image descriptor
      out.write(0x2c)
      le16(f.x); le16(f.y); le16(f.w); le16(f.h)
      out.write(0) // no local table, not interlaced
      out.write(minCode)
      val lzw = lzwEncodeLiterals(f.idx, minCode)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // data terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** PackBits encode (TIFF 6.0 §9): runs of ≥2 equal bytes become a
    * fill packet (header 1-run, one byte), everything else literal
    * packets (header n-1, n bytes), both capped at 128.
    */
  private def packBitsEncode(src: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = from; val end = from + len
    while (i < end) {
      var run = 1
      while (i + run < end && src(i + run) == src(i) && run < 128) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(src(i)); i += run
      } else {
        var lit = i + 1
        while (lit < end && lit - i < 128 &&
          !(lit + 1 < end && src(lit + 1) == src(lit))) lit += 1
        out.write(lit - i - 1); out.write(src, i, lit - i)
        i = lit
      }
    }
    out.toByteArray
  }

  /** Grayscale baseline TIFF encoder — the write-side twin of
    * [[Codecs.tiff]], parameterized over the three axes the decoder
    * must honor: byte order (`II` little / `MM` big — EVERY multi-byte
    * field is written in it), Compression (none / PackBits per
    * strip), and PhotometricInterpretation (WhiteIsZero stores the
    * complement of each sample). Strips of `rowsPerStrip` rows; the
    * IFD sits after the strip data with offset/count arrays external
    * when they exceed the 4-byte inline value field.
    */
  def encodeTiff(gray: Array[Byte], w: Int, h: Int,
      bigEndian: Boolean, packBits: Boolean, whiteIsZero: Boolean,
      rowsPerStrip: Int = 4): Array[Byte] = {
    require(gray.length == w * h, "bad surface")
    val stored =
      if (!whiteIsZero) gray
      else gray.map(v => (~v).toByte)
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      if (packBits) packBitsEncode(stored, s * rowsPerStrip * w, rows * w)
      else java.util.Arrays.copyOfRange(
        stored, s * rowsPerStrip * w, (s * rowsPerStrip + rows) * w)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16(v >>> 16); w16(v & 0xffff) }
      else { w16(v & 0xffff); w16(v >>> 16) }
    out.write(if (bigEndian) 'M' else 'I')
    out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    val stripBase = 8
    val offsets = strips.scanLeft(stripBase)(_ + _.length)
    val ifdOff = offsets.last
    w32(ifdOff)
    strips.foreach(s => out.write(s, 0, s.length))
    // 9 entries, ascending tag order (TIFF requires it)
    val entries = 9
    val arraysOff = ifdOff + 2 + 12 * entries + 4
    val inline = nStrips == 1
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3 && cnt == 1) { w16(value); w16(0) } else w32(value)
    }
    w16(entries)
    entry(256, 3, 1, w)                                   // ImageWidth
    entry(257, 3, 1, h)                                   // ImageLength
    entry(258, 3, 1, 8)                                   // BitsPerSample
    entry(259, 3, 1, if (packBits) 32773 else 1)          // Compression
    entry(262, 3, 1, if (whiteIsZero) 0 else 1)           // Photometric
    entry(273, 4, nStrips,
      if (inline) offsets(0) else arraysOff)              // StripOffsets
    entry(277, 3, 1, 1)                                   // SamplesPerPixel
    entry(278, 3, 1, rowsPerStrip)                        // RowsPerStrip
    entry(279, 4, nStrips,
      if (inline) strips(0).length else arraysOff + 4 * nStrips)
    w32(0) // next-IFD terminator
    if (!inline) {
      offsets.init.foreach(w32)
      strips.foreach(s => w32(s.length))
    }
    out.toByteArray
  }

  /** Palette (color type 3, depth 8) PNG encoder — the write-side
    * twin of [[Codecs.png]]'s palette + interlace paths. Rows are
    * filter-0; with `interlaced` the index surface is emitted as the
    * seven Adam7 passes (each pass its own scanline run), which the
    * decoder must unfilter at pass geometry and scatter back — an
    * interlaced and a sequential encode of the same surface MUST
    * decode identically, and the oracled query pins exactly that.
    */
  def encodePng(idx: Array[Byte], w: Int, h: Int,
      palette: Array[Byte], interlaced: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && idx.length == w * h, "bad index surface")
    require(palette.nonEmpty && palette.length % 3 == 0, "bad palette")
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(tag.getBytes).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes)
      crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(3.toByte) // depth 8, palette
      .put(0.toByte).put(0.toByte)
      .put(if (interlaced) 1.toByte else 0.toByte)
      .array()
    val passes =
      if (interlaced) Codecs.Adam7 else Array((0, 0, 1, 1))
    val rawOut = new java.io.ByteArrayOutputStream()
    passes.foreach { case (xs, ys, xst, yst) =>
      val pw = if (w > xs) (w - xs + xst - 1) / xst else 0
      val ph = if (h > ys) (h - ys + yst - 1) / yst else 0
      var y = 0
      while (y < ph) {
        rawOut.write(0) // filter type 0
        var x = 0
        while (x < pw) {
          rawOut.write(idx((ys + y * yst) * w + (xs + x * xst)) & 0xff)
          x += 1
        }
        y += 1
      }
    }
    val raw = rawOut.toByteArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outBytes = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      outBytes.write(buf, 0, n)
    }
    deflater.end()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("PLTE", palette) ++
      chunk("IDAT", outBytes.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  def encodeBmp(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // same pixel bound as the decoder: keeps rowSize*h (3x the pixel
    // count plus padding) safely inside Int arithmetic
    require(w > 0 && h > 0 && w.toLong * h <= Codecs.MaxPixels,
      s"dims $w x $h outside the encodable range")
    require(gray.length == w * h, s"gray buffer ${gray.length} != $w x $h")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24 // planes, bpp (compression 0 already)
    le32(34, dataSize)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val g = gray(y * w + x)
        val p = base + x * 3
        out(p) = g; out(p + 1) = g; out(p + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Area-average (box) resample to `tw`×`th` — integer-exact via the
    * standard fixed-point sum: each target cell averages the source
    * box [x*sw/tw, (x+1)*sw/tw) × [y*sh/th, (y+1)*sh/th), so an
    * integer-ratio downsample (18×16 → 9×8) is the plain mean of each
    * block.
    */
  private[graft] def resizeArea(
      gray: Array[Byte], sw: Int, sh: Int, tw: Int, th: Int
  ): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * sh / th
      val y1 = math.max(y0 + 1, (ty + 1) * sh / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * sw / tw
        val x1 = math.max(x0 + 1, (tx + 1) * sw / tw)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * sw + x) & 0xff; x += 1 }
          y += 1
        }
        out(ty * tw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** The 64-bit difference hash of a 9×8 grid: bit r*8+c is set when
    * gray(r,c) < gray(r,c+1).
    */
  private[graft] def dHashBits(grid: Array[Byte]): Long = {
    var sig = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if ((grid(r * GridW + c) & 0xff) < (grid(r * GridW + c + 1) & 0xff))
          sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** dHash of an arbitrary decoded image (resampled to the canonical
    * grid first); None for non-image payloads.
    */
  def dHash(d: Codecs.Decoded): Option[Long] =
    if (d.kind == "wav" || d.width <= 0 || d.height <= 0) None
    else Some(dHashBits(
      if (d.width == GridW && d.height == GridH) d.gray
      else resizeArea(d.gray, d.width, d.height, GridW, GridH)))

  /** Audio envelope bins: 64 + 1, giving 64 adjacent comparisons. */
  private val EnvBins = 65

  /** The 64-bit envelope-difference hash of decoded audio: box-average
    * the sample stream to 65 bins, bit i compares bin i against bin
    * i+1 — the 1-D sibling of [[dHash]], with the same invariance to
    * uniform gain shifts. None for non-audio payloads.
    */
  def audioHash(d: Codecs.Decoded): Option[Long] =
    if (d.kind != "wav" || d.width <= 0) None
    else {
      val bins =
        if (d.width == EnvBins) d.gray
        else resizeArea(d.gray, d.width, 1, EnvBins, 1)
      var sig = 0L
      var i = 0
      while (i < EnvBins - 1) {
        if ((bins(i) & 0xff) < (bins(i + 1) & 0xff)) sig |= 1L << i
        i += 1
      }
      Some(sig)
    }

  /** Minimal uncompressed-AVI encoder: RIFF `AVI ` with an `hdrl`
    * list carrying the `avih` main header (frame count, dimensions)
    * and a `movi` list of raw `00db` DIB frames — each frame is the
    * pixel-array section of [[encodeBmp]]'s output (bottom-up padded
    * BGR rows, no file header), which is exactly what "uncompressed
    * DIB frame" means in the container. Write-side twin of
    * [[Codecs.aviFrames]] + [[MediaHeaders]]' avi sniffer.
    */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] =
    aviContainer(frames.map(f => {
      val bmp = encodeBmp(f, w, h)
      java.util.Arrays.copyOfRange(bmp, 54, bmp.length)
    }), compressed = false, w, h)

  /** Shared RIFF/AVI skeleton: `hdrl`/`avih` header + one `movi` LIST
    * of per-frame chunks (`00db` raw DIB or `00dc` compressed). When
    * `strl` is given it is appended inside `hdrl` after `avih` — the
    * stream-description LIST a self-describing codec (RLE8) needs.
    */
  private def aviContainer(
      frameData: Seq[Array[Byte]], compressed: Boolean, w: Int, h: Int,
      strl: Option[Array[Byte]] = None
  ): Array[Byte] = {
    require(frameData.nonEmpty, "AVI needs at least one frame")
    val avih = new Array[Byte](56)
    def le32At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
    }
    le32At(avih, 16, frameData.length)
    le32At(avih, 32, w); le32At(avih, 36, h)
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + data.length + (data.length & 1))
      fourcc.zipWithIndex.foreach { case (c, i) => out(i) = c.toByte }
      le32At(out, 4, data.length)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ children)
    val fourcc = if (compressed) "00dc" else "00db"
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih) ++ strl.getOrElse(Array.emptyByteArray)) ++
      list("movi", frameData.flatMap(d => chunk(fourcc, d)).toArray)
    chunk("RIFF", body)
  }

  /** Microsoft-RLE8 AVI encoder: a self-describing container — `strl`
    * LIST with a `vids`/`MRLE` `strh` and a `strf` BITMAPINFOHEADER
    * declaring `biCompression = BI_RLE8`, 8bpp, and a 256-entry
    * RGBQUAD color table — plus one `00dc` RLE8-compressed chunk per
    * frame. Input frames are top-down w×h palette-index surfaces;
    * `palette` maps index → gray level and is written as the neutral
    * RGBQUAD (v,v,v,0), which survives the decoder's BT.601 integer
    * luma bit-exactly (equal channels collapse to the channel value).
    * Write-side twin of [[Codecs.aviVideoFormat]] +
    * [[Codecs.rle8Decode]].
    */
  def encodeRle8Avi(
      frames: Seq[Array[Byte]], w: Int, h: Int,
      palette: Array[Byte] = Array.tabulate(256)(_.toByte)): Array[Byte] = {
    require(palette.length == 256, "RLE8 palette must have 256 entries")
    require(frames.forall(_.length == w * h),
      s"every frame must be ${w}x$h indices")
    def le32At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
    }
    def le16At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
    }
    def put4cc(a: Array[Byte], i: Int, t: String): Unit =
      t.zipWithIndex.foreach { case (c, k) => a(i + k) = c.toByte }
    val strh = new Array[Byte](56)
    put4cc(strh, 0, "vids"); put4cc(strh, 4, "MRLE")
    le32At(strh, 32, frames.length) // dwLength
    val strf = new Array[Byte](40 + 256 * 4)
    le32At(strf, 0, 40) // biSize
    le32At(strf, 4, w); le32At(strf, 8, h)
    le16At(strf, 12, 1) // biPlanes
    le16At(strf, 14, 8) // biBitCount
    le32At(strf, 16, Codecs.BiRle8)
    le32At(strf, 32, 256) // biClrUsed
    var i = 0
    while (i < 256) {
      val v = palette(i)
      val q = 40 + i * 4
      strf(q) = v; strf(q + 1) = v; strf(q + 2) = v // b, g, r
      i += 1
    }
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + data.length + (data.length & 1))
      put4cc(out, 0, fourcc)
      le32At(out, 4, data.length)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    val strl = chunk("LIST",
      "strl".getBytes("US-ASCII") ++ chunk("strh", strh) ++ chunk("strf", strf))
    aviContainer(frames.map(rle8Encode(_, w, h)), compressed = true, w, h,
      Some(strl))
  }

  /** Microsoft-RLE4 AVI encoder — [[encodeRle8Avi]]'s container with
    * `biCompression = BI_RLE4`, 4bpp, and a 16-entry RGBQUAD color
    * table; frames are top-down w×h surfaces of 4-bit indices
    * (values 0–15). Write-side twin of [[Codecs.rle4Decode]].
    */
  def encodeRle4Avi(
      frames: Seq[Array[Byte]], w: Int, h: Int,
      palette: Array[Byte] = Array.tabulate(16)(i => (i * 17).toByte)
  ): Array[Byte] = {
    require(palette.length == 16, "RLE4 palette must have 16 entries")
    require(frames.forall(f => f.length == w * h && f.forall(b => (b & 0xff) < 16)),
      s"every frame must be ${w}x$h indices in 0..15")
    def le32At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
    }
    def le16At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
    }
    def put4cc(a: Array[Byte], i: Int, t: String): Unit =
      t.zipWithIndex.foreach { case (c, k) => a(i + k) = c.toByte }
    val strh = new Array[Byte](56)
    put4cc(strh, 0, "vids"); put4cc(strh, 4, "MRLE")
    le32At(strh, 32, frames.length) // dwLength
    val strf = new Array[Byte](40 + 16 * 4)
    le32At(strf, 0, 40) // biSize
    le32At(strf, 4, w); le32At(strf, 8, h)
    le16At(strf, 12, 1) // biPlanes
    le16At(strf, 14, 4) // biBitCount
    le32At(strf, 16, Codecs.BiRle4)
    le32At(strf, 32, 16) // biClrUsed
    var i = 0
    while (i < 16) {
      val v = palette(i)
      val q = 40 + i * 4
      strf(q) = v; strf(q + 1) = v; strf(q + 2) = v // b, g, r
      i += 1
    }
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + data.length + (data.length & 1))
      put4cc(out, 0, fourcc)
      le32At(out, 4, data.length)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    val strl = chunk("LIST",
      "strl".getBytes("US-ASCII") ++ chunk("strh", strh) ++ chunk("strf", strf))
    aviContainer(frames.map(rle4Encode(_, w, h)), compressed = true, w, h,
      Some(strl))
  }

  /** MS Video 1 (CRAM) AVI encoder — same self-describing container
    * as [[encodeRle8Avi]] with `biCompression = 'CRAM'` and per-frame
    * [[Cram.encodeFrame]] chunks, each encoded against the previous
    * frame so unchanged blocks become skip codes (the inter-frame
    * path the decoder must thread state through).
    */
  def encodeCramAvi(
      frames: Seq[Array[Byte]], w: Int, h: Int,
      palette: Array[Byte] = Array.tabulate(256)(_.toByte)): Array[Byte] = {
    require(palette.length == 256, "CRAM palette must have 256 entries")
    require(frames.forall(_.length == w * h),
      s"every frame must be ${w}x$h indices")
    def le32At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
    }
    def le16At(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
    }
    def put4cc(a: Array[Byte], i: Int, t: String): Unit =
      t.zipWithIndex.foreach { case (c, k) => a(i + k) = c.toByte }
    val strh = new Array[Byte](56)
    put4cc(strh, 0, "vids"); put4cc(strh, 4, "CRAM")
    le32At(strh, 32, frames.length)
    val strf = new Array[Byte](40 + 256 * 4)
    le32At(strf, 0, 40)
    le32At(strf, 4, w); le32At(strf, 8, h)
    le16At(strf, 12, 1)
    le16At(strf, 14, 8)
    le32At(strf, 16, Cram.Fourcc)
    le32At(strf, 32, 256)
    var i = 0
    while (i < 256) {
      val v = palette(i)
      val q = 40 + i * 4
      strf(q) = v; strf(q + 1) = v; strf(q + 2) = v
      i += 1
    }
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + data.length + (data.length & 1))
      put4cc(out, 0, fourcc)
      le32At(out, 4, data.length)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    val strl = chunk("LIST",
      "strl".getBytes("US-ASCII") ++ chunk("strh", strh) ++ chunk("strf", strf))
    val encoded = frames.zipWithIndex.map { case (f, idx) =>
      Cram.encodeFrame(f, w, h,
        if (idx == 0) None else Some(frames(idx - 1)))
    }
    aviContainer(encoded, compressed = true, w, h, Some(strl))
  }

  /** RLE8-compress one top-down index frame: bottom-up rows, encoded
    * runs for stretches of ≥3 equal indices, absolute mode for
    * literal stretches of ≥3 (word-aligned), single (1,v)/(2,v) pairs
    * for the short leftovers, end-of-line after every row,
    * end-of-bitmap last. Every pixel is written — the encoder never
    * emits deltas, so decode is total (no index-0 backfill on this
    * producer's output).
    */
  private def rle8Encode(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var y = h - 1
    while (y >= 0) { // file order is bottom-up
      val row = y * w
      var x = 0
      while (x < w) {
        var run = 1
        while (x + run < w && run < 255 && idx(row + x + run) == idx(row + x))
          run += 1
        if (run >= 3) {
          out.write(run); out.write(idx(row + x) & 0xff)
          x += run
        } else {
          // literal stretch: extend until the next ≥3 run or 255 cap
          var end = x + run
          var endRun = 0
          while (end < w && end - x < 253 && endRun < 3) {
            endRun = 1
            while (end + endRun < w && endRun < 3 &&
              idx(row + end + endRun) == idx(row + end)) endRun += 1
            if (endRun < 3) end += endRun
          }
          val lit = end - x
          if (lit >= 3) {
            out.write(0); out.write(lit)
            var k = 0
            while (k < lit) { out.write(idx(row + x + k) & 0xff); k += 1 }
            if ((lit & 1) == 1) out.write(0) // word alignment
          } else {
            var k = 0
            while (k < lit) {
              out.write(1); out.write(idx(row + x + k) & 0xff); k += 1
            }
          }
          x = end
        }
      }
      out.write(0); out.write(0) // end of line
      y -= 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** [[rle8Encode]]'s nibble sibling: solid runs emit `(n, (v<<4)|v)`
    * (the decoder's alternation collapses on equal nibbles), literal
    * stretches of ≥3 go absolute with two nibbles per byte and the
    * byte count word-aligned, shorter stretches emit length-1 runs
    * with the index in the HIGH nibble.
    */
  private def rle4Encode(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var y = h - 1
    while (y >= 0) { // file order is bottom-up
      val row = y * w
      var x = 0
      while (x < w) {
        var run = 1
        while (x + run < w && run < 255 && idx(row + x + run) == idx(row + x))
          run += 1
        if (run >= 3) {
          val v = idx(row + x) & 0xf
          out.write(run); out.write((v << 4) | v)
          x += run
        } else {
          // literal stretch: extend until the next ≥3 run or 253 cap
          var end = x + run
          var endRun = 0
          while (end < w && end - x < 253 && endRun < 3) {
            endRun = 1
            while (end + endRun < w && endRun < 3 &&
              idx(row + end + endRun) == idx(row + end)) endRun += 1
            if (endRun < 3) end += endRun
          }
          val lit = end - x
          if (lit >= 3) {
            out.write(0); out.write(lit)
            var b = 0
            var k = 0
            while (k < lit) {
              val nib = idx(row + x + k) & 0xf
              if ((k & 1) == 0) b = nib << 4
              else { out.write(b | nib); b = 0 }
              k += 1
            }
            if ((lit & 1) == 1) out.write(b) // trailing high nibble
            if ((((lit + 1) / 2) & 1) == 1) out.write(0) // word alignment
          } else {
            var k = 0
            while (k < lit) {
              out.write(1); out.write((idx(row + x + k) & 0xf) << 4); k += 1
            }
          }
          x = end
        }
      }
      out.write(0); out.write(0) // end of line
      y -= 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** Minimal baseline-JPEG encoder for BLOCK-CONSTANT grayscale images
    * — the write-side twin of [[Jpeg.decode]] on the losslessly-
    * codable subset. Input is a `bw`×`bh` grid of block values; the
    * output JPEG is `8bw`×`8bh` with each 8×8 block constant. A
    * constant block has an exact DCT: DC = 8·(v−128), every AC zero —
    * so with a flat all-1s quant table nothing is rounded and
    * [[Jpeg]]'s double-precision IDCT reconstructs v bit-exactly
    * (round(DC/8 + 128) = v). That exactness is what lets MJPEG
    * fixtures carry the same arithmetic DuckDB oracle as uncompressed
    * ones. Tables are minimal custom DHTs (12 four-bit DC categories,
    * a single one-bit EOB code), not the Annex-K defaults — nothing
    * here is copied table data beyond the spec-mandated structure.
    */
  def encodeJpegBlocks(blocks: Array[Byte], bw: Int, bh: Int): Array[Byte] = {
    require(bw > 0 && bh > 0 && blocks.length == bw * bh,
      s"block grid ${blocks.length} != $bw x $bh")
    require(bw * 8 <= 0xffff && bh * 8 <= 0xffff, "dims exceed JPEG u16")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    // SOI
    u16(0xffd8)
    // DQT: table 0, 8-bit, all ones (no quantization loss)
    u16(0xffdb); u16(2 + 1 + 64); u8(0x00)
    (0 until 64).foreach(_ => u8(1))
    // SOF0: 8-bit, one component, no subsampling
    u16(0xffc0); u16(8 + 3); u8(8); u16(bh * 8); u16(bw * 8); u8(1)
    u8(1); u8(0x11); u8(0)
    // DHT DC table 0: twelve categories 0..11, all four-bit codes
    u16(0xffc4); u16(2 + 17 + 12); u8(0x00)
    (1 to 16).foreach(l => u8(if (l == 4) 12 else 0))
    (0 until 12).foreach(u8)
    // DHT AC table 0: a single one-bit code for EOB
    u16(0xffc4); u16(2 + 17 + 1); u8(0x10)
    (1 to 16).foreach(l => u8(if (l == 1) 1 else 0))
    u8(0x00)
    // SOS: one component, tables 0/0, full spectral range
    u16(0xffda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // entropy data: per block (raster order) DC diff + EOB, stuffed
    var acc = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    var pred = 0
    var i = 0
    while (i < blocks.length) {
      val dc = 8 * ((blocks(i) & 0xff) - 128)
      val diff = dc - pred
      pred = dc
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1 // 2^(cat-1) <= mag < 2^cat
      putBits(cat, 4) // DC category, four-bit code = symbol value
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      putBits(0, 1) // EOB
      i += 1
    }
    if (nbits > 0) { // 1-pad the final byte (T.81 F.1.2.3)
      val pad = 8 - nbits
      acc = (acc << pad) | ((1 << pad) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
    }
    u16(0xffd9) // EOI
    out.toByteArray
  }

  /** General grayscale baseline-HUFFMAN encoder over QUANTIZED
    * coefficient blocks (natural order, flat all-ones quant — the
    * lossless-transform subset, like [[encodeJpegBlocks]] but with
    * full AC run-length coding). Tables are deliberately naive —
    * 4-bit DC category codes and a flat 9-bit code for every AC
    * (run, size) symbol — valid canonical Huffman tables that no
    * spec-default stream shares, so the decoder's table machinery is
    * exercised, not memorized. Exists to cross-check the arithmetic
    * entropy path: the same coefficients through both entropy coders
    * must decode to identical pixels (JpegArithSpec).
    */
  private[graft] def encodeJpegCoefs(
      coefBlocks: Seq[Array[Int]], bw: Int, bh: Int): Array[Byte] = {
    require(bw > 0 && bh > 0 && coefBlocks.length == bw * bh,
      s"block grid ${coefBlocks.length} != $bw x $bh")
    require(coefBlocks.forall(_.length == 64), "blocks must be 8x8")
    val zz = graft.ops.JpegArith.ZigZag
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 1 + 64); u8(0x00)
    (0 until 64).foreach(_ => u8(1))
    u16(0xffc0); u16(8 + 3); u8(8); u16(bh * 8); u16(bw * 8); u8(1)
    u8(1); u8(0x11); u8(0)
    // DHT DC 0: twelve 4-bit category codes
    u16(0xffc4); u16(2 + 17 + 12); u8(0x00)
    (1 to 16).foreach(l => u8(if (l == 4) 12 else 0))
    (0 until 12).foreach(u8)
    // DHT AC 0: all 256 (run, size) symbols — 255 at 9 bits + the
    // last at 10 (a DHT length count is one byte, so 256 can't sit on
    // a single length); canonical codes, all-ones never assigned
    u16(0xffc4); u16(2 + 17 + 256); u8(0x10)
    (1 to 16).foreach(l => u8(if (l == 9) 255 else if (l == 10) 1 else 0))
    (0 until 256).foreach(u8)
    u16(0xffda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    var acc = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def mag(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    var pred = 0
    for (coef <- coefBlocks) {
      val diff = coef(0) - pred
      pred = coef(0)
      val s = cat(diff)
      require(s <= 11, s"DC difference $diff exceeds baseline range")
      putBits(s, 4)
      if (s > 0) putBits(mag(diff, s), s)
      var ke = 63
      while (ke > 0 && coef(zz(ke)) == 0) ke -= 1
      var k = 1
      var run = 0
      while (k <= ke) {
        val v = coef(zz(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { putBits(0xf0, 9); run -= 16 } // ZRL
          val sz = cat(v)
          require(sz <= 10, s"AC coefficient $v exceeds baseline range")
          putBits((run << 4) | sz, 9)
          putBits(mag(v, sz), sz)
          run = 0
        }
        k += 1
      }
      if (ke < 63) putBits(0x00, 9) // EOB
    }
    if (nbits > 0) {
      val pad = 8 - nbits
      acc = (acc << pad) | ((1 << pad) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
    }
    u16(0xffd9)
    out.toByteArray
  }

  /** Three-scan PROGRESSIVE grayscale encoder over block-constant
    * grids — the write-side twin of `Jpeg`'s multi-scan progressive
    * decoder on the losslessly-codable subset:
    *
    *   1. DC first scan at successive approximation Al=1 — codes the
    *      diff chain of `(v−128) >> 1` (arithmetic shift; the DQT is
    *      all 8s so the STORED quantized DC is `v−128`, whose low bit
    *      actually varies — an all-1s table would make every
    *      refinement bit trivially zero).
    *   2. DC refinement scan (Ah=1, Al=0) — one raw bit per block,
    *      the low bit of `v−128` (`x = (x>>1)<<1 | (x&1)` holds in
    *      two's complement, so reconstruction is exact for negative
    *      coefficients too).
    *   3. AC first scan (Ss=1..63) — the whole band is zero for
    *      block-constant images, coded as EOBn run-length symbols
    *      (category + offset bits), the progressive-only coding path
    *      a sequential stream never exercises.
    *
    * Decode reconstructs the grid bit-exactly at full resolution
    * (kind `jpeg`), so corpus fixtures carry the md5-grid oracle
    * through the successive-approximation machinery end-to-end.
    */
  private[graft] def encodeProgressiveBlocks(
      blocks: Array[Byte], bw: Int, bh: Int): Array[Byte] = {
    require(bw > 0 && bh > 0 && blocks.length == bw * bh,
      s"block grid ${blocks.length} != $bw x $bh")
    require(bw * 8 <= 0xffff && bh * 8 <= 0xffff, "dims exceed JPEG u16")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 1 + 64); u8(0x00) // DQT 0: all 8s
    (0 until 64).foreach(_ => u8(8))
    u16(0xffc2); u16(8 + 3); u8(8); u16(bh * 8); u16(bw * 8); u8(1) // SOF2
    u8(1); u8(0x11); u8(0)
    u16(0xffc4); u16(2 + 17 + 12); u8(0x00) // DHT DC: 12 4-bit cats
    (1 to 16).foreach(l => u8(if (l == 4) 12 else 0))
    (0 until 12).foreach(u8)
    u16(0xffc4); u16(2 + 17 + 256); u8(0x10) // DHT AC: 255@9 + 1@10
    (1 to 16).foreach(l => u8(if (l == 9) 255 else if (l == 10) 1 else 0))
    (0 until 256).foreach(u8)
    // per-scan bit packer (each scan's data is 1-padded independently)
    var acc = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushScan(): Unit = if (nbits > 0) {
      val pad = 8 - nbits
      acc = (acc << pad) | ((1 << pad) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      u16(0xffda); u16(6 + 2); u8(1); u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    // scan 1: DC first, Al=1
    sos(0, 0, 0, 1)
    var pred = 0
    for (b <- blocks) {
      val scaled = ((b & 0xff) - 128) >> 1
      val diff = scaled - pred
      pred = scaled
      val s = cat(diff)
      putBits(s, 4)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    flushScan()
    // scan 2: DC refinement, Ah=1 -> Al=0 — one raw bit per block
    sos(0, 0, 1, 0)
    for (b <- blocks) putBits(((b & 0xff) - 128) & 1, 1)
    flushScan()
    // scan 3: AC first, full band, all zero -> pure EOBn run coding
    sos(1, 63, 0, 0)
    var run = blocks.length
    while (run > 0) {
      val n = math.min(run, 32767)
      val r = 31 - Integer.numberOfLeadingZeros(n)
      putBits(r << 4, 9) // EOBn symbol at the flat 9-bit code
      if (r > 0) putBits(n - (1 << r), r)
      run -= n
    }
    flushScan()
    u16(0xffd9)
    out.toByteArray
  }

  /** MJPEG AVI: same RIFF skeleton as [[encodeAvi]] but `00dc` chunks,
    * each a complete [[encodeJpegBlocks]] stream. `w`/`h` are the
    * decoded frame dims written into `avih` (8·bw × 8·bh).
    */
  def encodeMjpegAvi(
      frameBlocks: Seq[Array[Byte]], bw: Int, bh: Int): Array[Byte] =
    aviContainer(frameBlocks.map(encodeJpegBlocks(_, bw, bh)),
      compressed = true, bw * 8, bh * 8)

  /** Parse one raw DIB frame (bottom-up padded BGR rows) back to
    * grayscale — the frame-level core of [[Codecs.bmp]].
    */
  private def dibToGray(dib: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    // w/h come from the avih header — attacker-controlled: bound the
    // pixel count BEFORE the row arithmetic (a near-MaxInt width would
    // overflow an Int rowSize negative and slip the length check)
    if (w <= 0 || h <= 0 || w.toLong * h > Codecs.MaxPixels) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (rowSize.toLong * h > dib.length) return None
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val base = (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val p = base + x * 3
        gray(y * w + x) = (((dib(p + 2) & 0xff) * 299 +
          (dib(p + 1) & 0xff) * 587 + (dib(p) & 0xff) * 114) / 1000).toByte
        x += 1
      }
      y += 1
    }
    Some(gray)
  }

  /** Clip-level signature of an AVI payload: dHash each uncompressed
    * frame, then a ROTATE-then-XOR fold (acc = rotl(acc,1) ^ h) — the
    * compact LSH key. The rotation is load-bearing: a plain XOR fold
    * cancels identical frames pairwise, so every static clip (all
    * frames equal, common in practice) would collapse to signature 0
    * and pair with every other static clip. With rotation the fold is
    * rotl(h0,n-1) ^ … ^ hn — frame order and repetition both leave
    * their mark, while a few flipped pixels in any one frame still
    * flip only a few clip bits. Per-frame relations remain available
    * via [[dHash]] over frames where aligned comparison is wanted.
    */
  def videoHash(payload: Array[Byte]): Option[Long] =
    aviFrameGrays(payload).map { case (w, h, grays) =>
      grays
        .map(g => dHashBits(
          if (w == GridW && h == GridH) g
          else resizeArea(g, w, h, GridW, GridH)))
        .foldLeft(0L)((acc, hash) => java.lang.Long.rotateLeft(acc, 1) ^ hash)
    }

  /** Decode every frame of an AVI payload to grayscale: (width,
    * height, per-frame gray buffers). `##db` chunks parse as raw DIBs.
    * `##dc` chunks dispatch on the container's declared stream format
    * ([[Codecs.aviVideoFormat]]) the way a real AVI reader does: a
    * `strf` declaring `BI_RLE8` routes through [[Codecs.rle8Decode]]
    * with its color table, `BI_RLE4` through [[Codecs.rle4Decode]]
    * (4bpp palette); anything else — including the headerless
    * fixtures that predate `strl` support — falls back to
    * [[Jpeg.decode]] (MJPEG, a complete JPEG per chunk) and must
    * match the container dims. None when the payload is not an AVI or
    * ANY frame fails to parse — the all-or-nothing contract
    * [[videoHash]] relies on. Shared with
    * [[Multimodal.extractFeatures]]'s real-decode video branch.
    */
  private[graft] def aviFrameGrays(
      payload: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    val fmt = Codecs.aviVideoFormat(payload)
    for {
      hdr <- MediaHeaders.sniff(payload) if hdr.format == "avi"
      chunks <- Codecs.aviFrameChunks(payload) if chunks.nonEmpty
      grays = fmt match {
        // CRAM is inter-frame: decode threads the previous frame's
        // index surface through the chunk sequence (a stateless
        // flatMap cannot express skip blocks)
        case Some(f) if f.compression == Cram.Fourcc && f.bitCount == 8 =>
          chunks.foldLeft(
            (Vector.empty[Array[Byte]], Option.empty[Array[Byte]])) {
            case ((acc, prev), (true, data)) =>
              Cram.decode(data, hdr.width, hdr.height, prev) match {
                case Some(idxSurface) =>
                  (acc :+ idxSurface.map(b => f.grayLut(b & 0xff)),
                    Some(idxSurface))
                case None => (acc, prev) // length check below fails
              }
            case (st, (false, _)) => st
          }._1
        case _ => chunks.flatMap {
          case (false, dib) => dibToGray(dib, hdr.width, hdr.height)
          case (true, data) => fmt match {
            case Some(f)
              if f.compression == Codecs.BiRle8 && f.bitCount == 8 =>
              Codecs.rle8Decode(data, hdr.width, hdr.height, f.grayLut)
            case Some(f)
              if f.compression == Codecs.BiRle4 && f.bitCount == 4 =>
              Codecs.rle4Decode(data, hdr.width, hdr.height, f.grayLut)
            case _ => Jpeg.decode(data).collect {
              case d if d.width == hdr.width && d.height == hdr.height =>
                d.gray
            }
          }
        }
      }
      if grays.length == chunks.length
    } yield (hdr.width, hdr.height, grays.toVector)
  }

  /** Minimal PCM WAV encoder (8-bit mono, the losslessly-decodable
    * subset of [[Codecs.wav]]) — write-side twin like [[encodeBmp]].
    */
  def encodeWav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val out = new Array[Byte](44 + samples.length)
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def tag(i: Int, t: String): Unit =
      t.zipWithIndex.foreach { case (c, j) => out(i + j) = c.toByte }
    tag(0, "RIFF"); le32(4, 36 + samples.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    out(20) = 1 // PCM
    out(22) = 1 // mono
    le32(24, sampleRate); le32(28, sampleRate) // byte rate = rate x 1 x 1
    out(32) = 1 // block align
    out(34) = 8 // bits per sample
    tag(36, "data"); le32(40, samples.length)
    System.arraycopy(samples, 0, out, 44, samples.length)
    out
  }

  /** Deterministic image table over the documents fixture: doc k's
    * payload is a 9×8 24-bit BMP whose pixel i is the first md5 byte
    * of token (i mod ntokens) — content-derived like every other
    * fixture derivation here, so exact-duplicate TEXTS yield
    * bit-identical IMAGES (and the oracle can recompute every pixel in
    * SQL). Note the prefix semantics: docs longer than 72 tokens map
    * only their first 72, so texts differing past that bound are
    * image-identical by construction (pinned by the spec's brute-force
    * recompute). Stands in for an image column arriving from storage.
    */
  def syntheticImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, toks) =>
          val gray = new Array[Byte](GridW * GridH)
          var i = 0
          while (i < gray.length) {
            val tok = toks(i % toks.size)
            gray(i) = md.digest(
              tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
            i += 1
          }
          (id, encodeBmp(gray, GridW, GridH))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-image dHash signatures off a (doc_id, payload) relation via
    * the REAL decoder; undecodable payloads drop (logged by absence —
    * an inventory pass, [[MediaHeaders]], owns the triage story).
    */
  def signatures(images: DataFrame): DataFrame =
    signaturesBy(images, d => dHash(d))

  /** Per-clip envelope-hash signatures (audio payloads). */
  def audioSignatures(clips: DataFrame): DataFrame =
    signaturesBy(clips, d => audioHash(d))

  private def signaturesBy(
      payloads: DataFrame, hash: Codecs.Decoded => Option[Long]
  ): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Codecs.decode(payload).flatMap(hash).map(id -> _)
      })
      .toDF("doc_id", "sig")
  }

  /** Deterministic audio table over the documents fixture: doc k's
    * payload is an 8-bit mono PCM WAV of 65 samples, sample i = first
    * md5 byte of token (i mod ntokens) — the audio sibling of
    * [[syntheticImages]], same oracle-recomputable derivation, same
    * prefix semantics past 65 tokens.
    */
  def syntheticClips(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, toks) =>
          val pcm = new Array[Byte](EnvBins)
          var i = 0
          while (i < pcm.length) {
            pcm(i) = md.digest(toks(i % toks.size)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
            i += 1
          }
          (id, encodeWav(pcm))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Near-duplicate audio pairs at Hamming ≤ `maxHamming` over the
    * synthetic fixture clips — identical banding economics to
    * [[nearDupPairs]].
    */
  def audioNearDupPairs(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    nearDupPairsOfSigs(audioSignatures(syntheticClips(s, dir)),
      maxHamming, scope)

  /** Number of frames in each synthetic fixture video. */
  private val VideoFrames = 4

  /** doc_id offset of the PLANTED near-duplicate twin clips/vectors —
    * far above any fixture doc_id at any SF AND above ScaleGen's
    * k·10⁷ shard offsets (so scale-dir runs never alias a twin to a
    * shard document); the even offset keeps twin parity (codec
    * selection) matching the original's.
    */
  private[graft] val TwinOffset = 900000000L

  /** Which docs get a planted twin: sparse, and deliberately not a
    * multiple of the %2 codec carve or the %10 index carves.
    */
  private[graft] def hasTwin(id: Long): Boolean = id % 100 == 7

  /** Deterministic video table over the documents fixture: doc k's
    * payload is a 4-frame AVI whose frame f carries the 72 values
    * v(f,i) = first md5 byte of token ((f·72 + i) mod ntokens) — the
    * video sibling of [[syntheticImages]], oracle-recomputable. Even
    * doc ids encode uncompressed (9×8 `00db` DIB frames, pixel i =
    * v(f,i)); odd doc ids encode MJPEG (72×64 `00dc` baseline-JPEG
    * frames, 8×8 block (r,c) constant at v(f, r·9+c)). The MJPEG
    * block layout is chosen so the canonical-grid box resample
    * (72×64 → 9×8, each cell exactly one block's mean) reproduces the
    * SAME 9×8 grid as the uncompressed path — so both codecs yield
    * identical [[videoHash]] signatures for identical token streams
    * and `mm_video_near_dup`'s arithmetic oracle covers both without
    * caring which codec a row took.
    */
  def syntheticVideos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, toks) =>
          val frames = (0 until VideoFrames).map { f =>
            val gray = new Array[Byte](GridW * GridH)
            var i = 0
            while (i < gray.length) {
              gray(i) = md.digest(toks((f * gray.length + i) % toks.size)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
              i += 1
            }
            gray
          }
          def enc(fr: Seq[Array[Byte]]) =
            if (id % 2 == 0) encodeAvi(fr, GridW, GridH)
            else encodeMjpegAvi(fr, GridW, GridH)
          val base = (id, enc(frames))
          // PLANTED near-dup twins (doc_id + TwinOffset): one column-0
          // pixel forced to 255 in each of frames 0-2 — each edit
          // flips at most ONE dHash comparison of its frame, i.e. at
          // most one clip-signature bit after the rotate-xor fold
          // (clip bits 3, 10, 17 — two in band 0, one in band 1), so
          // twin↔original Hamming ≤ 3 by construction and the
          // pigeonhole banding ALWAYS surfaces the pair. Keeps the
          // mm_video_near_dup oracle's positive path live: the md5
          // token reach (288 positions) means the raw corpus never
          // collides on its own.
          if (hasTwin(id)) {
            val tf = frames.map(_.clone())
            tf(0)(0) = -1; tf(1)(GridW) = -1; tf(2)(2 * GridW) = -1
            Seq(base, (id + TwinOffset, enc(tf)))
          } else Seq(base)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-clip XOR-folded frame-dHash signatures (video payloads). */
  def videoSignatures(clips: DataFrame): DataFrame = {
    import clips.sparkSession.implicits._
    clips.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        videoHash(payload).map(id -> _)
      })
      .toDF("doc_id", "sig")
  }

  /** Near-duplicate video pairs at clip-signature Hamming ≤
    * `maxHamming` over the synthetic fixture videos.
    *
    * Output bound: pair enumeration is inherently Ω(output), and
    * output grows QUADRATICALLY in duplicate-class size — a clip
    * mirrored n times contributes C(n,2) pairs (SCALE_r13 §2 measured
    * 56× pair volume at 10× corpus as identical-signature classes
    * grew 3 → 16 members). Use this form when the pairs themselves
    * are the product (link tables, provenance audits); for dedup
    * decisions at scale use [[videoClusters]] (node-proportional
    * output, identical components) or, decode-free over a committed
    * corpus, [[SigIndex.clusters]].
    */
  def videoNearDupPairs(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    nearDupPairsOfSigs(videoSignatures(syntheticVideos(s, dir)),
      maxHamming, scope)

  /** Duplicate-CLIP clusters: every fixture clip labeled with its
    * connected component over the Hamming ≤ `maxHamming` near-dup
    * graph — the bounded-output twin of [[videoNearDupPairs]]. Pair
    * enumeration is inherently Ω(output), and output grows
    * quadratically in identical-clip class sizes (a viral clip
    * mirrored n times contributes C(n,2) pairs; the 10× scale leg
    * measured the top identical-signature class growing 3 → 16
    * members, SCALE_r13 §2). This form stays NODE-proportional:
    * identical signatures collapse to one representative per class
    * FIRST (one groupBy — an n-member class costs n rows, never
    * C(n,2) join outputs), the banded join and components run over
    * distinct-signature representatives only, and members inherit
    * their representative's label. Exactly equivalent to components
    * over ALL pairs: class members are at Hamming 0 of each other and
    * at identical distances to every other clip, so they are
    * interchangeable vertices (spec-pinned against the all-pairs
    * derivation). Labels are component minima ([[graft.ops.Dedup]]'s
    * convention): (doc_id, component_id, keep).
    */
  def videoClusters(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope): DataFrame =
    nearDupClustersOfSigs(
      videoSignatures(syntheticVideos(s, dir)), maxHamming, scope)

  /** Image sibling of [[videoClusters]] — same collapse-first
    * economics over the dHash signatures.
    */
  def imageClusters(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope): DataFrame =
    nearDupClustersOfSigs(
      signatures(syntheticImages(s, dir)), maxHamming, scope)

  /** Audio sibling of [[videoClusters]] — same collapse-first
    * economics over the envelope hashes.
    */
  def audioClusters(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope): DataFrame =
    nearDupClustersOfSigs(
      audioSignatures(syntheticClips(s, dir)), maxHamming, scope)

  /** Collapse-first clustering over any (doc_id, sig) relation —
    * media-agnostic (the image/audio/video cluster forms all route
    * here), and split out so the spec can pin the class-collapse
    * behavior on crafted identical-signature classes (the corpus
    * fixture has none at spec scale; the 10× scale corpus is where
    * they appear).
    */
  private[graft] def nearDupClustersOfSigs(
      sigsDf: DataFrame, maxHamming: Int,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None): DataFrame = {
    // cached: signatures feed the class groupBy AND the member-label
    // join back
    val sigs = scope.cache(sigsDf)
    // collapse key = the signature itself, sound because an identical
    // sig determines every Hamming distance (unlike embeddings, where
    // a signature does not determine the exact cosine)
    val classes = scope.cache(sigs.groupBy("sig")
      .agg(min(col("doc_id")).as("rep")))
    val repPairs = nearDupPairsOfSigs(
      classes.select(col("rep").as("doc_id"), col("sig")),
      maxHamming, scope, maxBandFreq)
    Dedup.labelComponents(
      sigs.join(classes, Seq("sig")).select(col("doc_id"), col("rep")),
      "doc_id",
      repPairs.select(col("doc_a").as("u"), col("doc_b").as("v")), scope)
  }

  /** Near-duplicate image pairs at Hamming distance ≤ `maxHamming`
    * over the synthetic fixture images. Exhaustive for maxHamming < 4
    * (see class doc); larger thresholds would need more bands.
    */
  def nearDupPairs(
      s: SparkSession, dir: String, maxHamming: Int = 3,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    nearDupPairsOfSigs(signatures(syntheticImages(s, dir)), maxHamming, scope)

  /** Banding + verification over any (doc_id, sig) relation — split
    * out so the spec can pin the pigeonhole contract on crafted
    * signatures.
    *
    * `maxBandFreq` is the HOT-BAND guard, the media port of
    * [[Similarity.bandedCandidateIds]]' star-cap (media band keys are
    * the same 64-plane/4-band decomposition, so the shared candidate
    * machinery applies verbatim): the identical-signature collapse
    * upstream handles exact duplicate classes, but a dense region of
    * NEAR-identical signatures — distinct sigs sharing 3 of 4 band
    * keys, e.g. a template image family differing in a few low-band
    * bits — still lands its whole population in the shared buckets
    * and the self-join goes quadratic in the region size. Buckets
    * above the cap are star-capped (member↔min-id rep, n−1 candidates
    * instead of C(n,2)); verification stays exact `bit_count` either
    * way, so nothing persists and no score is ever skewed. Degrade
    * direction, documented: the 4-band pigeonhole exhaustiveness at
    * Hamming < 4 holds WITHIN the cap — pairs between non-rep members
    * of a hot bucket are surfaced only through their other (cold)
    * bands or not at all, and components can under-merge across a
    * region wider than the threshold; on a true Hamming-clique (every
    * member ≤ maxHamming from the rep) components are unchanged.
    * [[SigIndex.guardDrift]] is the telemetry that says when the cap
    * is live.
    */
  private[graft] def nearDupPairsOfSigs(
      sigsDf: DataFrame, maxHamming: Int,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None
  ): DataFrame = {
    require(maxHamming < 4, "4-band pigeonhole is exhaustive only below 4")
    // cached: the signature scan (decode + hash per payload) feeds
    // both sides of the band self-join
    val sigs = scope.cache(sigsDf)
    maxBandFreq match {
      case None =>
        val banded = sigs.select(col("doc_id"), col("sig"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("sig"), b * 16)
                .bitwiseAND(0xffffL).as("key"))): _*)).as("bk"))
          .select(col("doc_id"), col("sig"),
            col("bk.band").as("band"), col("bk.key").as("key"))
        val a = banded.toDF("doc_a", "sig_a", "band", "key")
        val b = banded.toDF("doc_b", "sig_b", "band", "key")
        a.join(b, Seq("band", "key"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
          .select(col("doc_a"), col("doc_b"),
            expr("bit_count(sig_a ^ sig_b)").cast("int").as("hamming"))
          .filter(col("hamming") <= maxHamming)
      case Some(_) =>
        // id-only star-capped candidates via the shared machinery,
        // signatures re-attached post-dedup (16-byte rows — the
        // Similarity convention). dropDuplicates("doc_id"): duplicate
        // input rows (a doc live in two index segments) must not
        // re-expand through the two sig-attach joins into duplicate
        // pairs — the unguarded branch gets this from its 4-column
        // distinct, so the guarded branch dedups explicitly (doc_id
        // determines sig by the ingested-once contract, so the
        // id-keyed dedup of 16-byte rows is exact; ADVICE r15)
        val uniq = sigs.dropDuplicates("doc_id")
        val candIds = Similarity.bandedCandidateIds(
          uniq.select(col("doc_id").as("vec_id"), col("sig")),
          numPlanes = 64, numBands = 4, maxBandFreq, scope)
          .toDF("doc_a", "doc_b")
        val s16 = uniq.select(col("doc_id"), col("sig"))
        candIds
          .join(s16.toDF("doc_a", "sig_a"), "doc_a")
          .join(s16.toDF("doc_b", "sig_b"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            expr("bit_count(sig_a ^ sig_b)").cast("int").as("hamming"))
          .filter(col("hamming") <= maxHamming)
    }
  }
}
