package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Encoding

/** Detection edge cases the fixture's four clean branches don't
  * exercise: BE BOMs, truncated multibyte sequences, overlong
  * encodings, pure-ASCII defaulting.
  */
class EncodingSpec extends AnyFunSuite {

  test("BOM sniffing: UTF-8, UTF-16LE, UTF-16BE") {
    val d8 = Encoding.detect(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        "hi".getBytes(StandardCharsets.UTF_8))
    assert(d8.charset == "utf-8" && d8.hadBom && d8.text == "hi")
    val dLe = Encoding.detect(
      Array[Byte](0xff.toByte, 0xfe.toByte) ++
        "hi".getBytes(StandardCharsets.UTF_16LE))
    assert(dLe.charset == "utf-16le" && dLe.text == "hi")
    val dBe = Encoding.detect(
      Array[Byte](0xfe.toByte, 0xff.toByte) ++
        "hi".getBytes(StandardCharsets.UTF_16BE))
    assert(dBe.charset == "utf-16be" && dBe.text == "hi")
  }

  test("strict UTF-8: valid multibyte passes, Latin-1 bytes fail, " +
    "truncated and overlong sequences fail") {
    assert(Encoding.strictUtf8("héllo €".getBytes(StandardCharsets.UTF_8))
      .contains("héllo €"))
    // Latin-1 é (0xE9) mid-stream: invalid continuation
    assert(Encoding.strictUtf8(
      "caf".getBytes(StandardCharsets.UTF_8) :+ 0xe9.toByte :+ 'x'.toByte
    ).isEmpty)
    // truncated 2-byte sequence at EOF
    assert(Encoding.strictUtf8(
      "ok".getBytes(StandardCharsets.UTF_8) :+ 0xc3.toByte).isEmpty)
    // overlong encoding of '/' (C0 AF) must be rejected
    assert(Encoding.strictUtf8(
      Array[Byte](0xc0.toByte, 0xaf.toByte)).isEmpty)
  }

  test("detection: ASCII defaults to utf-8; Latin-1 text falls back") {
    assert(Encoding.detect("plain ascii".getBytes(StandardCharsets.UTF_8))
      .charset == "utf-8")
    val latin = Encoding.detect("café au lait".getBytes(
      StandardCharsets.ISO_8859_1))
    assert(latin.charset == "latin-1" && latin.text == "café au lait")
  }

  test("fixture payloads round-trip to the same decoded text on every " +
    "branch") {
    val text = "some document tokens"
    (0L to 3L).foreach { id =>
      val d = Encoding.detect(Encoding.synthPayload(id, text))
      assert(d.text == text + " café", s"branch $id")
    }
  }
}
