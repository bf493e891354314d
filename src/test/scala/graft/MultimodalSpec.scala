package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("payload metadata round-trips the binary column") {
    val meta = Multimodal.payloadMeta(spark, sf()).orderBy("media_id")
    val doc = spark.read.parquet(s"${sf()}/documents.parquet")
      .orderBy("doc_id").select("doc_id", "text").head()
    val m = meta.head()
    assert(m.getLong(0) == doc.getLong(0))
    val bytes = doc.getString(1).getBytes("UTF-8")
    assert(m.getInt(2) == bytes.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    assert(m.getString(3) == hex)
  }

  test("feature extraction: histogram covers all decoded pixels") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf()))
    val f = feats.filter(_.media_id == 0L).head()
    assert(f.histogram.length == 16)
    assert(f.thumbnail.length == 16)
    assert(f.histogram.sum > 0)
    assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
  }

  test("feature extraction is partitioning-independent") {
    val a = Multimodal.featureSummary(spark, sf())
      .orderBy("media_id").limit(5).collect().toSeq
    val b = Multimodal.extractFeatures(
        Multimodal.mediaTable(spark, sf()).repartition(7))
      .toDF().select(col("media_id"), col("media_type"), col("decoder"),
        col("n_bytes"), col("mean_byte"))
      .orderBy("media_id").limit(5).collect().toSeq
    assert(a == b)
  }

  test("frame sampling emits only video rows with stride") {
    val frames = Multimodal.sampledFrames(spark, sf(), stride = 4)
    val ids = frames.select("media_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 3 == 2), "only doc_id % 3 == 2 rows are video")
    val idx = frames.filter(col("media_id") === ids.head)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == (0 until idx.length).toSeq)
  }

  test("realMediaTable: every payload decodes through a real codec") {
    val feats = Multimodal.featureSummaryReal(spark, sf())
    val byDec = feats.groupBy("decoder").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDec.keySet == Set("bmp", "wav", "avi"), s"got $byDec")
    assert(!byDec.contains("stub"))
    // type follows doc_id % 3 and the decoder follows the type
    val mismatched = feats.filter(
      (col("media_type") === "image" && col("decoder") =!= "bmp") ||
        (col("media_type") === "audio" && col("decoder") =!= "wav") ||
        (col("media_type") === "video" && col("decoder") =!= "avi")).count()
    assert(mismatched == 0)
  }

  test("featureSummaryReal: decoded mean matches a direct md5 recompute") {
    val row = Multimodal.featureSummaryReal(spark, sf())
      .filter(col("media_type") === "image").orderBy("media_id").head()
    val id = row.getLong(0)
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") === id).head().getAs[String]("text")
      .toLowerCase.split("\\s+").toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = (0 until 72).map(i =>
      md.digest(toks(i % toks.size).getBytes("UTF-8"))(0) & 0xff)
    assert(row.getAs[Double]("mean_byte") == px.sum.toDouble / 72)
    val hist = new Array[Long](16)
    px.foreach(p => hist(p >> 4) += 1)
    assert(row.getAs[String]("hist") == hist.mkString(","))
  }

  test("frameFeatures: strided real-AVI frames with recomputable means") {
    val ff = Multimodal.frameFeatures(spark, sf(), stride = 2)
    assert(ff.select("media_id").distinct().collect()
      .forall(_.getLong(0) % 3 == 2))
    val idx = ff.select("frame_idx").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 2), "4-frame clips sampled at stride 2")
    assert(ff.filter(col("frame_bytes") =!= 224).count() == 0)
    // frame 2's mean differs from frame 0's for some doc (the frames
    // really are distinct slices of the token stream, not repeats)
    val pivot = ff.groupBy("media_id")
      .agg(countDistinct("frame_mean").as("n")).filter(col("n") === 2)
    assert(pivot.count() > 0)
  }

  // ---- REAL header sniffing (graft.ops.MediaHeaders) ----------------
  // Containers below are assembled byte-by-byte from their published
  // layouts — the parser is pinned against the format, not a library.

  private def be32(v: Int) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Int) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)

  private def pngBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth 8, rgba

  private def bmpBytes(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0)

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  private def wavBytes(rate: Int, ch: Int, bits: Int): Array[Byte] =
    "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits) ++
      "data".getBytes ++ le32(0)

  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      // APP0 segment first (length 16), then SOF0
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3)

  test("media header sniffing reads real container layouts") {
    import graft.ops.MediaHeaders
    val png = MediaHeaders.sniff(pngBytes(640, 480)).get
    assert(png == MediaHeaders.MediaHeader("png", 640, 480, 4, -1, 8))
    val bmp = MediaHeaders.sniff(bmpBytes(31, 17)).get
    assert(bmp.format == "bmp" && bmp.width == 31 && bmp.height == 17
      && bmp.bitDepth == 24)
    val gif = MediaHeaders.sniff(gifBytes(99, 44)).get
    assert(gif.format == "gif" && gif.width == 99 && gif.height == 44)
    val wav = MediaHeaders.sniff(wavBytes(44100, 2, 16)).get
    assert(wav == MediaHeaders.MediaHeader("wav", -1, -1, 2, 44100, 16))
    val jpg = MediaHeaders.sniff(jpegBytes(1920, 1080)).get
    assert(jpg.format == "jpeg" && jpg.width == 1920 && jpg.height == 1080
      && jpg.channels == 3)
    // arbitrary bytes (the text-payload fixture) sniff as nothing
    assert(MediaHeaders.sniff("not a media file".getBytes).isEmpty)
    assert(MediaHeaders.sniff(Array.empty[Byte]).isEmpty)
  }

  // ---- REAL decode (graft.ops.Codecs, JDK-only) ---------------------

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] =
    be32(data.length) ++ typ.getBytes ++ data ++ be32(0) // CRC unchecked

  private def pngFile(
      w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      pngChunk("IDAT", deflate(raw)) ++
      pngChunk("IEND", Array.empty[Byte])

  test("PNG decode: all five filter types invert bit-exactly") {
    import graft.ops.Codecs
    // 4x5 grayscale (colorType 0, bpp 1): known pixels, one scanline
    // per filter type, filters applied FORWARD here by hand — the
    // decoder must invert them back to exactly these values
    val px = Array(
       10,  60,  60, 200,
       13,  60, 190, 201,
       40,  93, 190, 231,
      255,   0, 128,  17,
       90, 190,   7,  77).map(_.toByte)
    val w = 4
    def p(y: Int, x: Int): Int = px(y * w + x) & 0xff
    val raw = new java.io.ByteArrayOutputStream()
    // y=0: None
    raw.write(0); (0 until w).foreach(x => raw.write(p(0, x)))
    // y=1: Sub — cur - left
    raw.write(1); (0 until w).foreach(x =>
      raw.write((p(1, x) - (if (x > 0) p(1, x - 1) else 0)) & 0xff))
    // y=2: Up — cur - above
    raw.write(2); (0 until w).foreach(x => raw.write((p(2, x) - p(1, x)) & 0xff))
    // y=3: Average — cur - floor((left + above)/2)
    raw.write(3); (0 until w).foreach(x =>
      raw.write((p(3, x) - ((if (x > 0) p(3, x - 1) else 0) + p(2, x)) / 2) & 0xff))
    // y=4: Paeth
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pr = a + b - c
      val pa = math.abs(pr - a); val pb = math.abs(pr - b); val pc = math.abs(pr - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    raw.write(4); (0 until w).foreach { x =>
      val a = if (x > 0) p(4, x - 1) else 0
      val c = if (x > 0) p(3, x - 1) else 0
      raw.write((p(4, x) - paeth(a, p(3, x), c)) & 0xff)
    }
    val dec = Codecs.png(pngFile(w, 5, 0, raw.toByteArray)).get
    assert(dec.kind == "png" && dec.width == w && dec.height == 5)
    assert(dec.gray.toSeq == px.toSeq)
  }

  test("PNG decode: RGB collapses to BT.601 luma; palette/interlace rejected") {
    import graft.ops.Codecs
    // 2x1 RGB (colorType 2): red and mid-gray, filter None
    val raw = Array[Byte](0, 255.toByte, 0, 0, 100, 100, 100)
    val dec = Codecs.png(pngFile(2, 1, 2, raw)).get
    assert(dec.gray.toSeq == Seq((299 * 255 / 1000).toByte, 100.toByte))
    // palette color type is out of the decodable subset
    assert(Codecs.png(pngFile(2, 1, 3, raw)).isEmpty)
    // truncated IDAT must fail cleanly, not throw
    val trunc = pngFile(64, 64, 0, Array.fill[Byte](8)(1))
    assert(Codecs.png(trunc).isEmpty)
  }

  test("BMP decode: bottom-up rows, 4-byte padding, BGR order") {
    import graft.ops.Codecs
    // 3x2 24-bit: rows are 9 bytes padded to 12, stored bottom-up.
    // logical top row: red, green, blue; bottom row: white, black, gray
    def bgr(b: Int, g: Int, r: Int) = Array[Byte](b.toByte, g.toByte, r.toByte)
    // the file stores the logical BOTTOM row first (bottom-up layout)
    val fileRow0 = bgr(255, 255, 255) ++ bgr(0, 0, 0) ++ bgr(128, 128, 128) ++
      Array[Byte](0, 0, 0) // logical bottom: white, black, gray
    val fileRow1 = bgr(0, 0, 255) ++ bgr(0, 255, 0) ++ bgr(255, 0, 0) ++
      Array[Byte](0, 0, 0) // logical top: red, green, blue
    val data = fileRow0 ++ fileRow1
    val hdr = "BM".getBytes ++ le32(54 + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      new Array[Byte](20)
    val dec = Codecs.bmp(hdr ++ data).get
    assert(dec.width == 3 && dec.height == 2)
    def luma(r: Int, g: Int, b: Int) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
    // decoded top-down: row 0 = file's LAST stored row
    assert(dec.gray.toSeq == Seq(
      luma(255, 0, 0), luma(0, 255, 0), luma(0, 0, 255),
      255.toByte, 0.toByte, 128.toByte))
  }

  test("WAV decode: 16-bit stereo PCM mono-mixes and quantizes") {
    import graft.ops.Codecs
    // 3 frames of L/R 16-bit samples with known values
    val samples = Seq[(Int, Int)]((0, 0), (32767, 32767), (-32768, 0))
    val data = samples.flatMap { case (l, r) => le16(l & 0xffff) ++ le16(r & 0xffff) }.toArray
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(8000 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val dec = Codecs.wav(wav).get
    assert(dec.kind == "wav" && dec.width == 3 && dec.height == 1)
    // (s + 32768) >> 8 per channel, averaged: (128,128)->128,
    // (255,255)->255, (0,128)->64
    assert(dec.gray.toSeq == Seq(128.toByte, 255.toByte, 64.toByte))
  }

  /** LSB-first LZW bit packer: (code, width) pairs → GIF data bytes.
    * A packer, not an encoder — the code sequence (including width
    * growth points) is derived by hand in each test.
    */
  private def packLzw(codes: Seq[(Int, Int)]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    codes.foreach { case (c, w) =>
      (0 until w).foreach(i => bits += (((c >> i) & 1) == 1))
    }
    val out = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (bit, i) =>
      if (bit) out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
    }
    out
  }

  /** Minimal GIF89a: 4-entry global palette (black, red, green,
    * white), one image descriptor, one LZW data sub-block.
    */
  private def gifFile(
      w: Int, h: Int, interlaced: Boolean, lzw: Array[Byte]): Array[Byte] = {
    val palette = Array[Byte](
      0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 0,
      255.toByte, 255.toByte, 255.toByte)
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
      Array[Byte](0x81.toByte, 0, 0) ++ palette ++
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
      Array[Byte](if (interlaced) 0x40.toByte else 0) ++
      Array[Byte](2) ++ // LZW min code size
      Array[Byte](lzw.length.toByte) ++ lzw ++ Array[Byte](0, 0x3b)
  }

  // palette luma: idx 0 → 0, 1 (red) → 76, 2 (green) → 149, 3 → 255
  private val GifLuma = Array[Byte](0, 76, (149 & 0xff).toByte, 255.toByte)

  test("GIF decode: from-scratch LZW inverts a hand-packed stream") {
    import graft.ops.Codecs
    // 2x2, indices 0,1,2,3; min code 2 → clear=4, end=5, dict from 6.
    // Width grows 3→4 after dict entry 7 fills width 3 (derived by
    // hand, the decoder must agree bit-for-bit)
    val data = packLzw(Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)))
    val dec = Codecs.gif(gifFile(2, 2, interlaced = false, data)).get
    assert(dec.kind == "gif" && dec.width == 2 && dec.height == 2)
    assert(dec.gray.toSeq == Seq(GifLuma(0), GifLuma(1), GifLuma(2), GifLuma(3)))
  }

  /** Independent GIF-LZW ENCODER (test-only): greedy longest-match
    * with the decoder-synchronized width rule — the decoder's dict
    * lags the encoder's by one entry, so width grows when
    * clear+1+emissions hits 1<<width. Exists purely to drive the
    * round-trip property below.
    */
  private def lzwEncode(minCode: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCode
    var width = minCode + 1
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    (0 until clear).foreach(i => dict(Seq(i.toByte)) = i)
    var nextCode = clear + 2
    var emissions = 0
    val codes = scala.collection.mutable.ArrayBuffer[(Int, Int)]((clear, width))
    def emit(c: Int): Unit = {
      codes += ((c, width))
      emissions += 1
      if (clear + 1 + emissions == (1 << width) && width < 12) width += 1
    }
    var cur = Seq.empty[Byte]
    indices.foreach { b =>
      val ext = cur :+ b
      if (dict.contains(ext)) cur = ext
      else {
        emit(dict(cur))
        dict(ext) = nextCode; nextCode += 1
        cur = Seq(b)
      }
    }
    if (cur.nonEmpty) emit(dict(cur))
    codes += ((clear + 1, width)) // end code
    packLzw(codes.toSeq)
  }

  test("LZW property: decode inverts an independent encoder (all code sizes)") {
    import graft.ops.Codecs
    val rnd = new scala.util.Random(20260812L)
    for (minCode <- 2 to 8; trial <- 0 until 4) {
      val n = 1 + rnd.nextInt(400)
      val syms = 1 << minCode
      // mix uniform-random and run-heavy streams (runs stress KwKwK)
      val idx = new Array[Byte](n)
      var i = 0
      while (i < n) {
        if (trial % 2 == 1 && rnd.nextInt(3) == 0) {
          val run = math.min(1 + rnd.nextInt(12), n - i)
          val v = rnd.nextInt(syms).toByte
          (0 until run).foreach(j => idx(i + j) = v)
          i += run
        } else { idx(i) = rnd.nextInt(syms).toByte; i += 1 }
      }
      val got = Codecs.lzwDecode(minCode, lzwEncode(minCode, idx), n)
      assert(got.isDefined, s"minCode=$minCode trial=$trial failed to decode")
      assert(got.get.toSeq == idx.toSeq, s"minCode=$minCode trial=$trial mismatch")
    }
  }

  test("GIF decode: KwKwK code case and interlaced row order") {
    import graft.ops.Codecs
    // KwKwK: indices 1,1,1 over a 3x1 frame — code 6 arrives while 6
    // is the next free entry (string(prev)+first(string(prev)))
    val kwk = packLzw(Seq((4, 3), (1, 3), (6, 3), (5, 3)))
    val d1 = Codecs.gif(gifFile(3, 1, interlaced = false, kwk)).get
    assert(d1.gray.toSeq == Seq(GifLuma(1), GifLuma(1), GifLuma(1)))
    // interlace: 1x4, sequential rows land at display rows 0,2,1,3
    val il = packLzw(Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)))
    val d2 = Codecs.gif(gifFile(1, 4, interlaced = true, il)).get
    assert(d2.gray.toSeq == Seq(GifLuma(0), GifLuma(2), GifLuma(1), GifLuma(3)))
    // truncated stream fails cleanly
    assert(Codecs.gif(gifFile(9, 9, interlaced = false, kwk)).isEmpty)
  }

  private def aviChunk(fourcc: String, data: Array[Byte]): Array[Byte] =
    fourcc.getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  private def aviList(listType: String, children: Array[Byte]): Array[Byte] =
    "LIST".getBytes ++ le32(4 + children.length) ++ listType.getBytes ++ children

  private def aviFile(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    // avih: 14 LE32 fields; dwTotalFrames at +16, dwWidth/+32, dwHeight/+36
    val avih = new Array[Byte](56)
    Array.copy(le32(frames.length), 0, avih, 16, 4)
    Array.copy(le32(w), 0, avih, 32, 4)
    Array.copy(le32(h), 0, avih, 36, 4)
    val hdrl = aviList("hdrl", aviChunk("avih", avih))
    val movi = aviList("movi",
      frames.map(f => aviChunk("00db", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("AVI: header sniff + real uncompressed-frame extraction with stride") {
    import graft.ops.{Codecs, MediaHeaders}
    val frames = (0 until 5).map(i => Array.fill[Byte](6)((10 * i + 1).toByte))
    val avi = aviFile(3, 2, frames)
    // sniffed as avi (not wav — both are RIFF forms), with avih dims
    val hdr = MediaHeaders.sniff(avi).get
    assert(hdr.format == "avi" && hdr.width == 3 && hdr.height == 2)
    // the movi walk returns every 00db frame bit-exactly
    val all = Codecs.aviFrames(avi).get
    assert(all.length == 5)
    assert(all.zip(frames).forall { case (a, e) => a.sameElements(e) })
    // non-AVI RIFF (plain WAV) and junk both decline
    assert(Codecs.aviFrames(wavBytes(8000, 1, 16)).isEmpty)
    assert(Codecs.aviFrames("junk bytes".getBytes).isEmpty)
  }

  test("sampledFrames walks real AVI payloads, stub-slices the rest") {
    import graft.ops.Multimodal
    import spark.implicits._
    val frames = (0 until 5).map(i => Array.fill[Byte](6)((10 * i + 1).toByte))
    val avi = aviFile(3, 2, frames)
    val rows = Seq(
      Multimodal.MediaRecord(1L, "video", 3, 2, avi),
      Multimodal.MediaRecord(2L, "video", 4, 1, "sixteen text bytes!!".getBytes),
      Multimodal.MediaRecord(3L, "image", 4, 1, avi)).toDS()
    val out = Multimodal.sampledFramesDs(rows, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]]("frame")))
    // AVI row: real frames 0 and 4 (stride 4), bit-exact
    val aviRows = out.filter(_._1 == 1L).sortBy(_._2)
    assert(aviRows.length == 2)
    assert(aviRows(0)._3.sameElements(frames(0)))
    assert(aviRows(1)._3.sameElements(frames(4)))
    // non-AVI video row still goes through the stub slicer
    assert(out.count(_._1 == 2L) == 2) // 20 bytes / width 4 = 5 frames, stride 4
    // non-video rows are filtered regardless of payload
    assert(!out.exists(_._1 == 3L))
  }

  test("extractFeatures uses real codecs for PNG/BMP/WAV, stub otherwise") {
    import graft.ops.{Codecs, Multimodal}
    import spark.implicits._
    // uniform 4x5 gray-50 PNG: mean must be exactly 50 — a REAL decode,
    // not the stub's text-bytes reinterpretation
    val raw = new java.io.ByteArrayOutputStream()
    (0 until 5).foreach { _ => raw.write(0); (0 until 4).foreach(_ => raw.write(50)) }
    val pngPayload = pngFile(4, 5, 0, raw.toByteArray)
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", 4, 5, pngPayload),
      Multimodal.MediaRecord(2L, "image", 4, 1, "plain text bytes".getBytes)).toDS()
    val f = Multimodal.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(f(0).decoder == "png" && f(0).mean_byte == 50.0)
    assert(f(0).thumbnail.forall(_ == 50.toByte))
    assert(f(1).decoder == "stub")
    // sanity: the real decoders agree between direct call and pipeline
    assert(Codecs.decode(pngPayload).get.gray.forall(_ == 50.toByte))
  }

  test("decoder bombs: giant declared dims and FDICT zlib decline cleanly") {
    import graft.ops.Codecs
    // PNG declaring Int.MaxValue x 2: h*(stride+1) wraps Int — must
    // decline, not allocate or crash
    assert(Codecs.png(pngFile(Int.MaxValue, 2, 0, Array[Byte](0))).isEmpty)
    // BMP with w=2^30, bpp 24: signed row-size math would go negative
    // and slip the bounds check into an AIOOBE
    assert(Codecs.bmp(bmpBytes(0x40000000, 2)).isEmpty)
    // GIF 65535x65535: w*h overflows the Int pixel count
    val junkLzw = packLzw(Seq((4, 3), (0, 3), (5, 3)))
    assert(Codecs.gif(gifFile(65535, 65535, interlaced = false, junkLzw)).isEmpty)
    // zlib stream declaring a preset dictionary (FDICT, valid header
    // checksum): inflate yields 0 with needsInput()=false — without
    // the needsDictionary() guard the inflate loop spins forever
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0)
    val fdictPng =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        pngChunk("IHDR", be32(2) ++ be32(2) ++ Array[Byte](8, 0, 0, 0, 0)) ++
        pngChunk("IDAT", fdictIdat) ++ pngChunk("IEND", Array.empty[Byte])
    assert(Codecs.png(fdictPng).isEmpty)
  }

  test("adversarial containers: WAV walk terminates, JPEG stops at SOS") {
    import graft.ops.MediaHeaders
    // a crafted RIFF chunk with size 0xFFFFFFF8 (-8 as a signed int):
    // read signed, the word-aligned advance is 0 and the walk spins
    // forever on an executor thread; read unsigned it steps past the
    // end and the sniff returns cleanly
    val evilWav = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xfffffff8) ++
      "fmt ".getBytes ++ le32(16) ++ new Array[Byte](16)
    assert(MediaHeaders.sniff(evilWav).isEmpty)
    // size -9 (odd): signed arithmetic would step the cursor BACKWARDS
    val evilWav2 = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xfffffff7) ++ new Array[Byte](24)
    assert(MediaHeaders.sniff(evilWav2).isEmpty)
    // JPEG whose entropy-coded data (after SOS) contains an FF C0 pair:
    // the segment walk must stop at SOS instead of mis-reading scan
    // bytes as a frame header
    val sosJpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(4) ++ le16(0) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(666) ++ be16(666) ++ Array[Byte](3)
    assert(MediaHeaders.sniff(sosJpeg).isEmpty)
  }

  test("media inventory is a narrow pass emitting header facts per blob") {
    import graft.ops.{MediaHeaders, Multimodal}
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", 0, 0, pngBytes(8, 4)),
      Multimodal.MediaRecord(2L, "audio", 0, 0, wavBytes(16000, 1, 16)),
      Multimodal.MediaRecord(3L, "video", 0, 0, "junk".getBytes)).toDS()
    val inv = MediaHeaders.inventory(rows).orderBy("media_id").collect()
    assert(inv.map(_.getString(1)).toSeq == Seq("png", "wav", "unknown"))
    assert(inv(0).getInt(2) == 8 && inv(0).getInt(3) == 4)
    assert(inv(1).getInt(5) == 16000 && inv(1).getInt(4) == 1)
    assert(inv(2).getInt(2) == -1)
    // narrow: no Exchange in the physical plan
    val plan = MediaHeaders.inventory(rows).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- Microsoft RLE8 AVI ----

  private val identityLut: Array[Byte] = Array.tabulate(256)(_.toByte)

  test("RLE8: hand-built stream — runs, absolute mode, delta, EOL, EOB") {
    import graft.ops.Codecs
    // 4x3 image, bottom-up stream: bottom row one run; middle row
    // absolute(3)+pad then a 1-run; top row delta-skips 2 (index-0
    // backfill) then a 2-run.
    val stream = Array[Byte](
      4, 7, 0, 0, // run of four 7s; EOL
      0, 3, 1, 2, 3, 0, 1, 9, 0, 0, // absolute 1,2,3 (padded); (1,9); EOL
      0, 2, 2, 0, 2, 5, 0, 0, // delta +2,+0; run of two 5s; EOL
      0, 1) // EOB
    val got = Codecs.rle8Decode(stream, 4, 3, identityLut).get
    assert(got.sameElements(Array[Byte](
      0, 0, 5, 5, // top (visual) row: delta left indices 0
      1, 2, 3, 9,
      7, 7, 7, 7)))
    // palette lookup is applied: inverted LUT complements every pixel
    val inv = Array.tabulate(256)(i => (255 - i).toByte)
    val comp = Codecs.rle8Decode(stream, 4, 3, inv).get
    assert(comp.zip(got).forall { case (c, g) => (c & 0xff) == 255 - (g & 0xff) })
  }

  test("RLE8: malformed streams decline — no EOB, row overrun, truncation") {
    import graft.ops.Codecs
    val lut = identityLut
    // stream ends without end-of-bitmap
    assert(Codecs.rle8Decode(Array[Byte](4, 7, 0, 0), 4, 1, lut).isEmpty)
    // run overruns the row edge
    assert(Codecs.rle8Decode(Array[Byte](5, 7, 0, 0, 0, 1), 4, 1, lut).isEmpty)
    // absolute mode longer than the remaining bytes
    assert(Codecs.rle8Decode(Array[Byte](0, 4, 1, 2), 4, 1, lut).isEmpty)
    // more rows than the bitmap has
    assert(Codecs.rle8Decode(
      Array[Byte](4, 7, 0, 0, 4, 8, 0, 0, 0, 1), 4, 1, lut).isEmpty)
  }

  test("RLE8 AVI: self-describing container round-trips; palette survives") {
    import graft.ops.{Codecs, PerceptualHash}
    val md = java.security.MessageDigest.getInstance("MD5")
    val noisy = Array.tabulate[Byte](9 * 8)(i => md.digest(s"t$i".getBytes)(0))
    val flat = Array.fill[Byte](9 * 8)(42)
    val avi = PerceptualHash.encodeRle8Avi(Seq(noisy, flat), 9, 8)
    // the container declares its codec the way a real reader expects
    val fmt = Codecs.aviVideoFormat(avi).get
    assert(fmt.compression == Codecs.BiRle8 && fmt.bitCount == 8)
    val (w, h, grays) = PerceptualHash.aviFrameGrays(avi).get
    assert(w == 9 && h == 8 && grays.length == 2)
    assert(grays(0).sameElements(noisy) && grays(1).sameElements(flat))
    // inverted palette: decoded output is the complement of the indices
    val inv = Array.tabulate(256)(i => (255 - i).toByte)
    val (_, _, complemented) =
      PerceptualHash.aviFrameGrays(
        PerceptualHash.encodeRle8Avi(Seq(noisy), 9, 8, inv)).get
    assert(complemented.head.zip(noisy).forall {
      case (c, o) => (c & 0xff) == 255 - (o & 0xff)
    })
    // headerless fixtures keep the MJPEG fallback: no strl -> no format
    val mjpeg = PerceptualHash.encodeMjpegAvi(
      Seq(Array.fill[Byte](2)(130.toByte)), 2, 1)
    assert(Codecs.aviVideoFormat(mjpeg).isEmpty)
    assert(PerceptualHash.aviFrameGrays(mjpeg).isDefined)
  }

  test("rleFrameFeatures matches the generative derivation end-to-end") {
    import graft.ops.Multimodal
    val out = Multimodal.rleFrameFeatures(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getString(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    assert(out.nonEmpty && out.size % 2 == 0)
    // independent recomputation for one doc
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS t").collect()
    val (id, text) = (docs.head.getLong(0), docs.head.getString(1))
    val toks = text.split("\\s+").toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def b(i: Int): Int =
      255 - (md.digest(toks(i % toks.size).getBytes("UTF-8"))(0) & 0xff)
    val mean0 = (0 until 72).map(b).sum / 72.0
    assert(out((id, 0)) == (("rle8", 9, 8, mean0)))
    assert(out((id, 1)) == (("rle8", 9, 8, b(0).toDouble)))
  }

  // ---- Microsoft RLE4 AVI ----

  test("RLE4: hand-built stream — nibble runs, absolute, delta, EOB") {
    import graft.ops.Codecs
    // 4x3, bottom-up: run of 4 ALTERNATES the value byte's nibbles;
    // absolute packs 3 nibbles into 2 bytes (even count, no pad);
    // delta backfills index 0; a 2-run shows high-then-low order
    val stream = Array[Byte](
      4, 0x75, 0, 0, // run: 7,5,7,5; EOL
      0, 3, 0x12, 0x30, 1, 0x90.toByte, 0, 0, // absolute 1,2,3; (1,9); EOL
      0, 2, 2, 0, 2, 0x5A, 0, 0, // delta +2,+0; run: 5,10; EOL
      0, 1) // EOB
    val got = Codecs.rle4Decode(stream, 4, 3, identityLut).get
    assert(got.sameElements(Array[Byte](
      0, 0, 5, 10, // top (visual) row: delta left indices 0
      1, 2, 3, 9,
      7, 5, 7, 5)))
    // odd absolute count: 5 nibbles = 3 bytes, word-aligned to 4
    val odd = Array[Byte](
      0, 5, 0x12, 0x34, 0x50, 0, 1, 0x60, 0, 0, 0, 1)
    assert(Codecs.rle4Decode(odd, 6, 1, identityLut).get
      .sameElements(Array[Byte](1, 2, 3, 4, 5, 6)))
    // palette lookup applied through the shared LUT path
    val inv = Array.tabulate(256)(i => (255 - i).toByte)
    val comp = Codecs.rle4Decode(stream, 4, 3, inv).get
    assert(comp.zip(got).forall { case (c, g) => (c & 0xff) == 255 - (g & 0xff) })
  }

  test("RLE4: malformed streams decline — no EOB, overrun, missing pad") {
    import graft.ops.Codecs
    val lut = identityLut
    assert(Codecs.rle4Decode(Array[Byte](4, 0x75, 0, 0), 4, 1, lut).isEmpty)
    assert(Codecs.rle4Decode(Array[Byte](5, 0x75, 0, 0, 0, 1), 4, 1, lut).isEmpty)
    // absolute of 5 nibbles truncated at 3 data bytes (pad missing)
    assert(Codecs.rle4Decode(
      Array[Byte](0, 5, 0x12, 0x34, 0x50), 6, 1, lut).isEmpty)
    // more rows than the bitmap has
    assert(Codecs.rle4Decode(
      Array[Byte](4, 0x11, 0, 0, 4, 0x22, 0, 0, 0, 1), 4, 1, lut).isEmpty)
  }

  test("RLE4 AVI: self-describing container round-trips; 16-entry " +
    "palette survives") {
    import graft.ops.{Codecs, PerceptualHash}
    val md = java.security.MessageDigest.getInstance("MD5")
    val noisy = Array.tabulate[Byte](9 * 8)(
      i => (md.digest(s"t$i".getBytes)(0) & 0x0f).toByte)
    val flat = Array.fill[Byte](9 * 8)(11)
    val avi = PerceptualHash.encodeRle4Avi(Seq(noisy, flat), 9, 8)
    val fmt = Codecs.aviVideoFormat(avi).get
    assert(fmt.compression == Codecs.BiRle4 && fmt.bitCount == 4)
    val (w, h, grays) = PerceptualHash.aviFrameGrays(avi).get
    assert(w == 9 && h == 8 && grays.length == 2)
    // default palette stretches indices: gray = 17 * index
    assert(grays(0).sameElements(noisy.map(n => (n * 17).toByte)))
    assert(grays(1).sameElements(flat.map(n => (n * 17).toByte)))
    val inv = Array.tabulate[Byte](16)(i => (255 - 17 * i).toByte)
    val (_, _, complemented) =
      PerceptualHash.aviFrameGrays(
        PerceptualHash.encodeRle4Avi(Seq(noisy), 9, 8, inv)).get
    assert(complemented.head.zip(noisy).forall {
      case (c, o) => (c & 0xff) == 255 - 17 * (o & 0xff)
    })
  }

  test("rle4FrameFeatures matches the generative derivation end-to-end") {
    import graft.ops.Multimodal
    val out = Multimodal.rle4FrameFeatures(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getString(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    assert(out.nonEmpty && out.size % 2 == 0)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS t").collect()
    val (id, text) = (docs.head.getLong(0), docs.head.getString(1))
    val toks = text.split("\\s+").toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def b(i: Int): Int =
      255 - 17 * (md.digest(toks(i % toks.size).getBytes("UTF-8"))(0) & 0x0f)
    val mean0 = (0 until 72).map(b).sum / 72.0
    assert(out((id, 0)) == (("rle4", 9, 8, mean0)))
    assert(out((id, 1)) == (("rle4", 9, 8, b(0).toDouble)))
  }

  test("palette PNG: interlaced and sequential decode identically") {
    import graft.ops.{Codecs, PerceptualHash}
    val rnd = new scala.util.Random(11)
    // non-multiple-of-8 dims so every Adam7 pass has ragged geometry
    val (w, h) = (13, 9)
    val palette = Array.tabulate(48)(i => ((i / 3) * 17).toByte)
    val idx = Array.fill(w * h)((rnd.nextInt(16)).toByte)
    val seq = Codecs.decode(
      PerceptualHash.encodePng(idx, w, h, palette, interlaced = false)).get
    val adam = Codecs.decode(
      PerceptualHash.encodePng(idx, w, h, palette, interlaced = true)).get
    assert(seq.kind == "png" && seq.width == w && seq.height == h)
    assert(java.util.Arrays.equals(seq.gray, adam.gray))
    // palette lookup is the identity on the grayscale palette
    idx.zip(seq.gray).foreach { case (i, g) =>
      assert((g & 0xff) == (i & 0xff) * 17)
    }
  }

  test("animated GIF: disposal 2/3 and transparency composite correctly") {
    import graft.ops.{Codecs, PerceptualHash}
    import PerceptualHash.GifFrame
    // 4-entry palette, gray values 0, 80, 160, 240
    val pal = Array.tabulate(12)(i => ((i / 3) * 80).toByte)
    def gray(idx: Int): Byte = (idx * 80).toByte
    val full = GifFrame(0, 0, 4, 4, Array.fill(16)(1.toByte))
    // disposal 2: after the frame, its rect resets to background (0)
    val d2 = Codecs.gifFrames(PerceptualHash.encodeGifAnim(4, 4, pal,
      Seq(full.copy(disposal = 2),
        GifFrame(0, 0, 2, 2, Array.fill(4)(3.toByte))))).get
    assert(d2(0).gray.forall(_ == gray(1)))
    // frame 2's canvas: background everywhere except the new 2x2
    val f1 = d2(1).gray
    assert(f1(0) == gray(3) && f1(1) == gray(3) &&
      f1(4) == gray(3) && f1(5) == gray(3))
    assert(f1(15) == gray(0)) // disposal-2 reset, not frame 0's 1s
    // disposal 3: the canvas reverts to the PRE-frame state
    val d3 = Codecs.gifFrames(PerceptualHash.encodeGifAnim(4, 4, pal,
      Seq(full,
        GifFrame(0, 0, 2, 2, Array.fill(4)(3.toByte), disposal = 3),
        GifFrame(3, 3, 1, 1, Array(2.toByte))))).get
    assert(d3(1).gray(0) == gray(3))
    val f2 = d3(2).gray
    assert(f2(0) == gray(1)) // frame 1's patch reverted
    assert(f2(15) == gray(2))
    // transparency: keyed pixels let the previous frame through
    val tr = Codecs.gifFrames(PerceptualHash.encodeGifAnim(4, 4, pal,
      Seq(full, GifFrame(0, 0, 4, 4,
        Array.tabulate(16)(i => if (i % 2 == 0) 2.toByte else 0.toByte),
        transparent = 0)))).get
    val t1 = tr(1).gray
    (0 until 16).foreach { i =>
      assert(t1(i) == (if (i % 2 == 0) gray(2) else gray(1)), s"px $i")
    }
    // a rect outside the logical screen declines
    assert(Codecs.gifFrames(PerceptualHash.encodeGifAnim(4, 4, pal,
      Seq(GifFrame(3, 3, 2, 2, Array.fill(4)(1.toByte))))).isEmpty)
    // single-frame animation equals the still decoder's view
    val still = Codecs.decode(PerceptualHash.encodeGifAnim(4, 4, pal,
      Seq(full))).get
    assert(java.util.Arrays.equals(still.gray,
      Codecs.gifFrames(PerceptualHash.encodeGifAnim(4, 4, pal,
        Seq(full))).get.head.gray))
  }

  test("TIFF: endianness, PackBits, and WhiteIsZero are all honored") {
    import graft.ops.{Codecs, PerceptualHash}
    val gray = Array.tabulate(64)(i => (i * 3 + 7).toByte) // 8x8
    // all four variant corners decode to the same logical surface
    for (big <- Seq(false, true); pb <- Seq(false, true);
         wz <- Seq(false, true)) {
      val t = PerceptualHash.encodeTiff(gray, 8, 8, big, pb, wz)
      val d = Codecs.tiff(t).getOrElse(fail(s"big=$big pb=$pb wz=$wz"))
      assert(d.width == 8 && d.height == 8)
      assert(java.util.Arrays.equals(d.gray, gray),
        s"big=$big pb=$pb wz=$wz")
    }
    // WhiteIsZero is load-bearing: the stored strip bytes differ
    val plain = PerceptualHash.encodeTiff(gray, 8, 8,
      bigEndian = false, packBits = false, whiteIsZero = false)
    val inv = PerceptualHash.encodeTiff(gray, 8, 8,
      bigEndian = false, packBits = false, whiteIsZero = true)
    assert(plain(8) == gray(0) && inv(8) == (~gray(0)).toByte)
    // runs compress: a constant surface's PackBits stream is smaller
    val flat = PerceptualHash.encodeTiff(Array.fill(64)(9.toByte), 8, 8,
      bigEndian = true, packBits = true, whiteIsZero = false)
    assert(flat.length < plain.length)
    assert(java.util.Arrays.equals(
      Codecs.tiff(flat).get.gray, Array.fill(64)(9.toByte)))
    // decode() routes TIFF like any other still container
    assert(Codecs.decode(plain).get.kind == "tiff")
    // a single-strip image keeps offsets/counts inline in the IFD
    val one = PerceptualHash.encodeTiff(gray, 8, 8,
      bigEndian = false, packBits = false, whiteIsZero = false,
      rowsPerStrip = 8)
    assert(java.util.Arrays.equals(Codecs.tiff(one).get.gray, gray))
    // malformed: bad magic, truncation anywhere, strip overrun all
    // decline to None rather than throwing or returning partial rows
    assert(Codecs.tiff("II? garbage".getBytes("ISO-8859-1")).isEmpty)
    (1 until plain.length).foreach { n =>
      Codecs.tiff(java.util.Arrays.copyOf(plain, n)) // must not throw
    }
    // strip length mismatch: the single-strip inline count sits in
    // entry 9's value field (IFD at 8+64, value at +2+12*8+8); an
    // uncompressed strip whose count is not rows*width declines
    val overrun = one.clone()
    assert(overrun(72 + 2 + 12 * 8 + 8) == 64)
    overrun(72 + 2 + 12 * 8 + 8) = 65
    assert(Codecs.tiff(overrun).isEmpty)
  }

  test("palette PNG: malformed streams decline to None") {
    import graft.ops.{Codecs, PerceptualHash}
    val palette = Array.tabulate(12)(i => ((i / 3) * 80).toByte) // 4 entries
    val good = PerceptualHash.encodePng(
      Array.tabulate(16)(i => (i % 4).toByte), 4, 4, palette, false)
    assert(Codecs.decode(good).isDefined)
    // an index beyond the palette declines (entry 9 of 4)
    val oob = PerceptualHash.encodePng(
      Array.fill(16)(9.toByte), 4, 4, palette, false)
    assert(Codecs.png(oob).isEmpty)
    // dropping PLTE declines: rebuild without the PLTE chunk
    val noPlte = {
      val plteLen = 12 + palette.length
      val ihdrEnd = 8 + 25
      good.take(ihdrEnd) ++ good.drop(ihdrEnd + plteLen)
    }
    assert(Codecs.png(noPlte).isEmpty)
    // truncated interlaced stream declines rather than mis-scatters
    val inter = PerceptualHash.encodePng(
      Array.tabulate(64)(i => (i % 4).toByte), 8, 8, palette, true)
    assert(Codecs.png(inter).isDefined)
    assert(Codecs.png(inter.dropRight(20)).isEmpty)
  }
}
