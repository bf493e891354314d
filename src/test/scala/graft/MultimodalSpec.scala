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
      .toDF().select(col("media_id"), col("media_type"), col("n_bytes"),
        col("mean_byte"))
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
}
