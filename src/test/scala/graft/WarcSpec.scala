package graft

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** Byte-level pins for the from-scratch WARC reader: hand-assembled
  * records, the multi-member gzip convention, header-flag skipping,
  * and the corruption contract (truncation / CRC damage throw rather
  * than return partial records).
  */
class WarcSpec extends AnyFunSuite {

  private def rec(warcType: String, payload: String,
      extra: Map[String, String] = Map.empty): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    extra.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.append(payload).append("\r\n\r\n")
    sb.toString.getBytes(US_ASCII)
  }

  test("plain record framing: types, headers, exact payload bytes") {
    val bytes = rec("warcinfo", "software: x\r\n") ++
      rec("response", "HTTP/1.1 404 Not Found\r\nx-a: b\r\n\r\nbody!",
        Map("WARC-Target-URI" -> "https://e.com/p"))
    val rs = Warc.parseFile(bytes)
    assert(rs.map(_.warcType) == Vector("warcinfo", "response"))
    assert(rs(1).headers("WARC-Target-URI") == "https://e.com/p")
    // WARC field names are case-insensitive: lookup must not depend
    // on the writer's spelling
    assert(rs(1).header("warc-target-uri").contains("https://e.com/p"))
    assert(rs(1).header("Warc-Target-Uri").contains("https://e.com/p"))
    assert(new String(rs(1).payload, US_ASCII).endsWith("body!"))
    assert(Warc.httpStatus(rs(1).payload).contains(404))
    assert(Warc.httpHeader(rs(1).payload, "X-A").contains("b"))
    assert(new String(Warc.httpBody(rs(1).payload), US_ASCII) == "body!")
  }

  test("payload containing CRLFCRLF is not split: Content-Length wins") {
    val payload = "AB\r\n\r\nCD" // separator bytes INSIDE the payload
    val rs = Warc.parseFile(rec("resource", payload))
    assert(rs.size == 1)
    assert(new String(rs(0).payload, US_ASCII) == payload)
  }

  test("multi-member gzip: concatenated members inflate in order and " +
    "parse identically to the plain stream") {
    val plain = rec("warcinfo", "a") ++ rec("resource", "b" * 5000)
    val gz = Warc.gzipMember(rec("warcinfo", "a")) ++
      Warc.gzipMember(rec("resource", "b" * 5000))
    assert(Warc.isGzip(gz) && !Warc.isGzip(plain))
    val a = Warc.parseFile(plain)
    val b = Warc.parseFile(gz)
    assert(a.map(_.warcType) == b.map(_.warcType))
    assert(a.zip(b).forall { case (x, y) =>
      java.util.Arrays.equals(x.payload, y.payload) })
  }

  test("gzip member with FNAME/FCOMMENT/FEXTRA flags still inflates") {
    val data = rec("resource", "hello")
    val base = Warc.gzipMember(data)
    // rebuild the member with FLG = FEXTRA|FNAME|FCOMMENT and the
    // corresponding fields spliced in after the 10-byte header
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 3)
    out.write(4 | 8 | 16) // FLG
    out.write(base, 4, 6)
    out.write(Array[Byte](3, 0)) // XLEN = 3
    out.write(Array[Byte](1, 2, 3)) // extra field
    out.write("name.warc".getBytes(US_ASCII)); out.write(0)
    out.write("a comment".getBytes(US_ASCII)); out.write(0)
    out.write(base, 10, base.length - 10)
    val rs = Warc.parseFile(out.toByteArray)
    assert(rs.size == 1 &&
      new String(rs(0).payload, US_ASCII) == "hello")
  }

  test("corruption throws: truncated payload, bad magic, CRC damage") {
    val good = rec("resource", "payload-bytes")
    intercept[IllegalArgumentException] {
      Warc.parseRecords(good.dropRight(20)) // Content-Length unsatisfiable
    }
    val gz = Warc.gzipMember(good)
    gz(gz.length - 6) = (gz(gz.length - 6) ^ 0x7f).toByte // flip CRC bits
    intercept[IllegalArgumentException] { Warc.gunzipMembers(gz) }
    intercept[IllegalArgumentException] {
      Warc.gunzipMembers("not gzip at all".getBytes(US_ASCII))
    }
  }

  test("parser is total on truncation: every prefix either parses or " +
    "throws the declared IllegalArgumentException — never hangs or " +
    "escapes another error") {
    val plain = rec("warcinfo", "abc") ++
      rec("response", "HTTP/1.1 200 OK\r\n\r\nbody",
        Map("WARC-Target-URI" -> "https://e.com/x"))
    val gz = Warc.gzipMember(plain)
    for (bytes <- Seq(plain, gz); len <- 0 to bytes.length) {
      try { Warc.parseFile(bytes.take(len)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("headers without colon and missing Content-Length are rejected") {
    val noColon = ("WARC/1.0\r\nWARC-Type resource\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(US_ASCII)
    intercept[IllegalArgumentException] { Warc.parseRecords(noColon) }
    val noLen =
      "WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n".getBytes(US_ASCII)
    intercept[IllegalArgumentException] { Warc.parseRecords(noLen) }
  }
}
