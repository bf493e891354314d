package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL (non-stub) media container sniffing: format detection and
  * header-level metadata — dimensions, channels, sample rate, bit
  * depth — by direct byte inspection of the standard container
  * layouts. No codec library is involved because none is needed:
  * every supported format publishes these fields in its first few
  * hundred bytes.
  *
  * This is the part of a multimodal pipeline that genuinely matters
  * at 100 TB: a full-corpus media INVENTORY (what is this blob, how
  * big, what shape) costs header reads only — the payload column is
  * scanned but never decoded, the extracted metadata is a few ints
  * per row, and the work is embarrassingly parallel. Only pixel/PCM
  * DECODE remains behind [[Multimodal.FakeCodec]]'s stub.
  *
  * Formats: PNG (IHDR), BMP (BITMAPINFOHEADER), GIF (87a/89a logical
  * screen), JPEG (SOF0/1/2 scan), WAV (RIFF `fmt ` chunk). Pinned by
  * MultimodalSpec against hand-assembled container bytes.
  */
object MediaHeaders {

  /** Shared RIFF chunk walk, carrying the adversarial-input invariant in
  * exactly one place: chunk sizes are read UNSIGNED (a signed read
  * lets a crafted size of -8 advance the cursor by 0 — an infinite
  * loop on an executor thread — and other negatives step it backwards
  * into an AIOOBE) and the cursor is a Long (no Int wrap on >2 GB
  * declared sizes). Visits each chunk header as (offset, size) until
  * the callback returns Some or the region ends; chunks are
  * word-aligned per the RIFF spec.
  */
private[ops] object Riff {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def walk[A](b: Array[Byte], from: Long, until: Long)(
      f: (Int, Long) => Option[A]): Option[A] = {
    var i = from
    while (i + 8 <= until) {
      val p = i.toInt
      val size = (u8(b, p + 4) | (u8(b, p + 5) << 8) | (u8(b, p + 6) << 16) |
        (u8(b, p + 7) << 24)) & 0xffffffffL
      val r = f(p, size)
      if (r.isDefined) return r
      i += 8L + size + (size & 1L)
    }
    None
  }
}

/** Header-level facts; -1 = not applicable to the format. */
  final case class MediaHeader(
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      sampleRate: Int,
      bitDepth: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def startsWith(b: Array[Byte], magic: Int*): Boolean =
    b.length >= magic.length && magic.zipWithIndex.forall {
      case (m, i) => u8(b, i) == m
    }

  /** PNG: 8-byte signature, then the IHDR chunk (always first):
    * width/height as big-endian int32 at offsets 16/20, bit depth at
    * 24, color type at 25 (0 grey, 2 rgb, 3 palette, 4 grey+a, 6 rgba).
    */
  private def png(b: Array[Byte]): Option[MediaHeader] =
    if (b.length >= 26 &&
      startsWith(b, 0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) {
      val channels = u8(b, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      }
      Some(MediaHeader("png", be32(b, 16), be32(b, 20),
        channels, -1, u8(b, 24)))
    } else None

  /** BMP: "BM", BITMAPINFOHEADER width/height little-endian at 18/22
    * (height may be negative = top-down), bits-per-pixel at 28.
    */
  private def bmp(b: Array[Byte]): Option[MediaHeader] =
    if (b.length >= 30 && startsWith(b, 'B'.toInt, 'M'.toInt)) {
      Some(MediaHeader("bmp", le32(b, 18), math.abs(le32(b, 22)),
        le16(b, 28) / 8 max 1, -1, le16(b, 28)))
    } else None

  /** GIF: "GIF87a"/"GIF89a", logical-screen width/height LE at 6/8. */
  private def gif(b: Array[Byte]): Option[MediaHeader] =
    if (b.length >= 10 && startsWith(b, 'G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt) &&
      (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a') {
      Some(MediaHeader("gif", le16(b, 6), le16(b, 8), -1, -1, 8))
    } else None

  /** JPEG: FF D8, then marker segments; the first SOF0/1/2 frame
    * header carries precision, height (BE at +5), width (BE at +7),
    * component count (+9).
    */
  private def jpeg(b: Array[Byte]): Option[MediaHeader] = {
    if (!startsWith(b, 0xff, 0xd8)) return None
    var i = 2
    while (i + 9 < b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        return Some(MediaHeader("jpeg", be16(b, i + 7), be16(b, i + 5),
          u8(b, i + 9), -1, u8(b, i + 4)))
      }
      // SOS (FF DA) starts entropy-coded data, where FF xx pairs are
      // bit-stream bytes, not markers — a garbage length skip landing
      // past SOS could mis-read an unlucky FF Cx as a frame header.
      // No SOF seen before the scan means the header is unparseable.
      if (marker == 0xda) return None
      // skip this segment: length field includes itself, not the marker
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** WAV: "RIFF" + "WAVE", then chunks; `fmt ` carries channels
    * (LE16 at data+2), sample rate (LE32 at data+4), bits per sample
    * (LE16 at data+14).
    */
  private def wav(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 12 || !startsWith(b, 'R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt) ||
      !(u8(b, 8) == 'W' && u8(b, 9) == 'A' && u8(b, 10) == 'V' && u8(b, 11) == 'E'))
      return None
    // [[Riff.walk]] carries the untrusted-input termination contract
    Riff.walk(b, 12L, b.length.toLong) { (p, _) =>
      if (u8(b, p) == 'f' && u8(b, p + 1) == 'm' && u8(b, p + 2) == 't' &&
        u8(b, p + 3) == ' ' && p + 8 + 16 <= b.length) {
        val d = p + 8
        Some(MediaHeader("wav", -1, -1,
          le16(b, d + 2), le32(b, d + 4), le16(b, d + 14)))
      } else None
    }
  }

  /** AVI: RIFF form `AVI `; the `avih` main header (inside the `hdrl`
    * LIST) carries width/height as LE32 at data offsets 32/36. Chunk
    * sizes read unsigned with a Long cursor, like [[wav]].
    */
  private def avi(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 12 || !startsWith(b, 'R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt) ||
      !(u8(b, 8) == 'A' && u8(b, 9) == 'V' && u8(b, 10) == 'I' && u8(b, 11) == ' '))
      return None
    Riff.walk(b, 12L, b.length.toLong) { (p, size) =>
      if (u8(b, p) == 'L' && u8(b, p + 1) == 'I' && u8(b, p + 2) == 'S' &&
        u8(b, p + 3) == 'T' && p + 12 <= b.length &&
        u8(b, p + 8) == 'h' && u8(b, p + 9) == 'd' &&
        u8(b, p + 10) == 'r' && u8(b, p + 11) == 'l') {
        // children of hdrl: find the avih chunk
        val end = math.min(p + 8L + size, b.length.toLong)
        Riff.walk(b, p + 12L, end) { (cp, _) =>
          if (u8(b, cp) == 'a' && u8(b, cp + 1) == 'v' && u8(b, cp + 2) == 'i' &&
            u8(b, cp + 3) == 'h' && cp + 8 + 40 <= end) {
            val d = cp + 8
            Some(MediaHeader("avi", le32(b, d + 32), le32(b, d + 36),
              -1, -1, -1))
          } else None
        }
      } else None
    }
  }

  /** Sniff a payload against every known container, cheapest first.
    * AVI before WAV: both are RIFF forms, discriminated by form type.
    */
  def sniff(payload: Array[Byte]): Option[MediaHeader] =
    if (payload == null) None
    else png(payload).orElse(bmp(payload)).orElse(gif(payload))
      .orElse(avi(payload)).orElse(wav(payload)).orElse(jpeg(payload))

  /** Corpus-wide media inventory over any (id, payload) pair: format +
    * header metadata per blob, `unknown` for unrecognized bytes. A
    * narrow `mapPartitions` pass — payloads are read, never shuffled,
    * never decoded.
    */
  def inventory(
      media: Dataset[Multimodal.MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val h = sniff(m.payload).getOrElse(
          MediaHeader("unknown", -1, -1, -1, -1, -1))
        (m.media_id, h.format, h.width, h.height,
          h.channels, h.sampleRate, h.bitDepth, m.payload.length)
      }
    }.toDF("media_id", "format", "width", "height",
      "channels", "sample_rate", "bit_depth", "n_bytes")
  }
}
