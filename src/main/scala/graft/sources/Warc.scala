package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/** From-scratch WARC/1.0 reader (ISO 28500) — the container format of
  * web-scale crawls (Common Crawl et al.), i.e. the input side of a
  * 100 TB training-data pipeline. No external parser:
  *
  *  - record framing is parsed directly: `WARC/1.0` version line,
  *    CRLF-terminated header block, `Content-Length`-framed payload,
  *    two-CRLF record separator;
  *  - the standard compression convention — each record its own gzip
  *    *member*, members concatenated into one `.warc.gz` stream — is
  *    handled by a real multi-member gzip walk: per-member header
  *    parse (FLG bit skipping for EXTRA/NAME/COMMENT/HCRC), raw
  *    `Inflater` inflate to find the member boundary, CRC32 + ISIZE
  *    trailer verification;
  *  - HTTP payloads (`application/http`) split into status line /
  *    headers / body for response-record field extraction.
  *
  * Parsing is strict where corruption would otherwise propagate
  * silently (bad magic, header without colon, truncated payload,
  * trailer mismatch all throw) and byte-exact: the payload returned
  * is the `Content-Length` slice, untouched.
  *
  * Scale shape: a WARC file is a concatenation of self-delimiting
  * records, so files parallelize across executors and records stream
  * within a partition — nothing here holds more than one record in
  * memory beyond the input slice itself.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      headers: Map[String, String],
      payload: Array[Byte]) {

    /** Case-insensitive header lookup — WARC field names are
      * case-insensitive (ISO 28500 §4), so `Warc-Target-Uri:` must
      * resolve the same as `WARC-Target-URI:`. The map keeps the
      * writer's original spelling; reads go through here.
      */
    def header(name: String): Option[String] = {
      val want = name.toLowerCase
      headers.collectFirst {
        case (k, v) if k.toLowerCase == want => v
      }
    }
  }

  private val CRLF = "\r\n"

  // -------------------------------------------------------------------
  // gzip members (the .warc.gz convention)

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Compress `data` as ONE gzip member (fixed header, deflate-raw
    * body, CRC32 + ISIZE trailer) — the writer twin used to build
    * `.warc.gz` fixtures record-by-record.
    */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    // header: magic, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=255 (unknown)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32; crc.update(data)
    writeLe32(out, crc.getValue)
    writeLe32(out, data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  private def writeLe32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Inflate ALL gzip members of `bytes` and return the concatenated
    * decompressed stream. Each member's CRC32 and ISIZE trailer is
    * verified. Throws on bad magic, unknown compression method, or
    * trailer mismatch.
    */
  def gunzipMembers(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 3)
    var pos = 0
    while (pos < bytes.length) {
      require(bytes.length - pos >= 18, s"truncated gzip member at $pos")
      require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"bad gzip magic at $pos")
      require((bytes(pos + 2) & 0xff) == 8, "unsupported compression method")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new Inflater(/*nowrap=*/ true)
      inf.setInput(bytes, p, bytes.length - p)
      val member = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput())
          throw new IllegalArgumentException(s"truncated deflate data at $p")
        member.write(buf, 0, k)
      }
      val consumed = inf.getBytesRead.toInt
      inf.end()
      val data = member.toByteArray
      val trailerAt = p + consumed
      require(bytes.length - trailerAt >= 8, "missing gzip trailer")
      val crc = new CRC32; crc.update(data)
      require(readLe32(bytes, trailerAt) == crc.getValue,
        s"gzip CRC mismatch in member at $pos")
      require(readLe32(bytes, trailerAt + 4) ==
        (data.length.toLong & 0xffffffffL), "gzip ISIZE mismatch")
      out.write(data, 0, data.length)
      pos = trailerAt + 8
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // record framing

  /** Parse a WARC file (plain or `.warc.gz` multi-member) into its
    * records, in order.
    */
  def parseFile(bytes: Array[Byte]): Vector[WarcRecord] =
    parseRecords(if (isGzip(bytes)) gunzipMembers(bytes) else bytes)

  /** Parse concatenated uncompressed WARC records. */
  def parseRecords(bytes: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // tolerate extra record separators between records
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val (rec, next) = parseRecord(bytes, pos)
        out += rec
        pos = next
      }
    }
    out.result()
  }

  /** Parse one record starting at `pos`; returns (record, index just
    * past its payload).
    */
  private def parseRecord(
      bytes: Array[Byte], pos: Int): (WarcRecord, Int) = {
    val versionEnd = indexOfCrlf(bytes, pos)
    val version = ascii(bytes, pos, versionEnd)
    require(version.startsWith("WARC/"), s"bad WARC version line: $version")
    var p = versionEnd + 2
    val headers = Map.newBuilder[String, String]
    var warcType = ""
    var contentLength = -1L
    var done = false
    while (!done) {
      val lineEnd = indexOfCrlf(bytes, p)
      if (lineEnd == p) { p += 2; done = true } // blank line: headers end
      else {
        val line = ascii(bytes, p, lineEnd)
        val colon = line.indexOf(':')
        require(colon > 0, s"malformed WARC header: $line")
        val name = line.substring(0, colon).trim
        val value = line.substring(colon + 1).trim
        headers += name -> value
        val lower = name.toLowerCase
        if (lower == "warc-type") warcType = value
        else if (lower == "content-length") contentLength = value.toLong
        p = lineEnd + 2
      }
    }
    require(contentLength >= 0, "record missing Content-Length")
    require(p + contentLength <= bytes.length,
      s"truncated payload: need $contentLength bytes at $p")
    val payload = java.util.Arrays.copyOfRange(
      bytes, p, p + contentLength.toInt)
    (WarcRecord(warcType, headers.result(), payload), p + contentLength.toInt)
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length, "missing CRLF terminator")
    i
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, US_ASCII)

  // -------------------------------------------------------------------
  // HTTP payload splitting (application/http records)

  /** Status code from an HTTP response payload's status line. */
  def httpStatus(payload: Array[Byte]): Option[Int] = {
    val end = firstCrlf(payload)
    if (end < 0) None
    else {
      val line = ascii(payload, 0, end)
      val parts = line.split(" ")
      if (parts.length >= 2 && parts(0).startsWith("HTTP/") &&
        parts(1).forall(_.isDigit)) Some(parts(1).toInt)
      else None
    }
  }

  /** Case-insensitive header lookup inside an HTTP payload. */
  def httpHeader(payload: Array[Byte], name: String): Option[String] = {
    var p = firstCrlf(payload)
    if (p < 0) return None
    p += 2
    val want = name.toLowerCase
    while (p < payload.length) {
      val end = firstCrlfFrom(payload, p)
      if (end < 0 || end == p) return None // blank line or end: headers over
      val line = ascii(payload, p, end)
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.toLowerCase == want)
        return Some(line.substring(colon + 1).trim)
      p = end + 2
    }
    None
  }

  /** Body bytes of an HTTP payload (after the blank line). */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var p = firstCrlf(payload)
    if (p < 0) return Array.emptyByteArray
    p += 2
    while (p < payload.length) {
      val end = firstCrlfFrom(payload, p)
      if (end == p)
        return java.util.Arrays.copyOfRange(payload, p + 2, payload.length)
      if (end < 0) return Array.emptyByteArray
      p = end + 2
    }
    Array.emptyByteArray
  }

  private def firstCrlf(b: Array[Byte]): Int = firstCrlfFrom(b, 0)

  private def firstCrlfFrom(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }
}
