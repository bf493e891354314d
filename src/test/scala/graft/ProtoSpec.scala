package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Proto
import graft.ops.Proto.{Doc, Meta}

/** Pins the protobuf wire-format codec: round-trips at numeric
  * boundaries, unknown-field skipping (forward compatibility), and
  * decline behavior for malformed wire data.
  */
class ProtoSpec extends AnyFunSuite {

  private val doc = Doc(
    id = -1234567890123L,
    name = "wire-format",
    weight = -3.25,
    checksum = 0xffffffffL,
    vals = Seq(0L, 1L, 127L, 128L, Long.MaxValue, -1L),
    meta = Meta("en", Long.MaxValue))

  test("round-trip: zigzag negatives, packed varints, nested message") {
    assert(Proto.decode(Proto.encode(doc)).get == doc)
    val zero = Doc(0L, "", 0.0, 0L, Seq.empty, Meta("", 0L))
    assert(Proto.decode(Proto.encode(zero)).get == zero)
  }

  test("unknown fields are skipped: v2 wire reads identically in v1") {
    val plain = Proto.encode(doc, unknownField = false)
    val withUnknown = Proto.encode(doc, unknownField = true)
    assert(withUnknown.length > plain.length)
    assert(Proto.decode(withUnknown).get == Proto.decode(plain).get)
  }

  test("reserved wire types and truncations decline") {
    // wire type 3 (group start, unsupported) on field 7
    val bad = Array[Byte](((7 << 3) | 3).toByte)
    assert(Proto.decode(bad).isEmpty)
    // wire type 4 likewise
    assert(Proto.decode(Array[Byte](((7 << 3) | 4).toByte)).isEmpty)
    val enc = Proto.encode(doc, unknownField = true)
    (1 until enc.length).foreach { n =>
      // every strict prefix must decline or decode without throwing;
      // a cut inside a length-delimited payload must decline
      Proto.decode(java.util.Arrays.copyOf(enc, n))
    }
    // cut inside the name payload specifically declines
    val nameStart = new String(enc, "ISO-8859-1").indexOf("wire-format")
    assert(Proto.decode(
      java.util.Arrays.copyOf(enc, nameStart + 3)).isEmpty)
  }

  test("varint overflow (>10 bytes of continuation) declines") {
    val b = Array.fill[Byte](12)(0x80.toByte)
    b(0) = ((1 << 3) | 0).toByte
    assert(Proto.decode(b).isEmpty)
  }
}
