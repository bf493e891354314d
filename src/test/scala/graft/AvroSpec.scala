package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Avro
import graft.ops.Avro.Rec

/** Pins the from-scratch Avro OCF reader/writer: varint/zigzag
  * round-trips at the boundaries, both block codecs, sync-marker
  * verification, schema gating, and decline-don't-guess corruption
  * behavior.
  */
class AvroSpec extends AnyFunSuite {

  private val recs = Seq(
    Rec(0L, "zero", 0.0),
    Rec(-1L, "neg", -2.5),
    Rec(Long.MaxValue, "max", 1.75),
    Rec(Long.MinValue, "min", -0.125),
    Rec(63L, "edge63", 63.0), // zigzag 126: single-byte boundary
    Rec(64L, "edge64", 64.0)) // zigzag 128: first two-byte varint

  test("round-trip: both codecs, multi-block, extreme varints") {
    for (deflate <- Seq(false, true); block <- Seq(1, 2, 6, 10)) {
      val ocf = Avro.encode(recs, deflate, blockRecords = block)
      val (codec, back) = Avro.decode(ocf).get
      assert(codec == (if (deflate) "deflate" else "null"))
      assert(back == recs, s"deflate=$deflate block=$block")
    }
  }

  test("sync-marker mismatch between blocks declines") {
    val ocf = Avro.encode(recs, deflate = false, blockRecords = 2)
    // the final 16 bytes are the last block's sync copy
    val c = ocf.clone()
    c(c.length - 1) = (c(c.length - 1) ^ 0x40).toByte
    assert(Avro.decode(c).isEmpty)
  }

  test("unknown codec and foreign schema decline") {
    val ocf = Avro.encode(recs.take(1), deflate = false)
    // corrupt the codec string value ("null" -> "null" with last
    // char flipped); located right after the schema JSON
    val idx = new String(ocf, "ISO-8859-1").indexOf("null")
    assert(idx > 0)
    val c = ocf.clone(); c(idx) = 'x'.toByte
    assert(Avro.decode(c).isEmpty)
    // schema text altered -> reader must refuse, not misparse
    val jdx = new String(ocf, "ISO-8859-1").indexOf("\"id\"")
    val c2 = ocf.clone(); c2(jdx + 1) = 'x'.toByte
    assert(Avro.decode(c2).isEmpty)
  }

  test("truncation: mid-block declines; block boundaries are valid prefixes") {
    // OCF has no trailer — a cut at a block boundary IS a valid
    // shorter container (that's exactly what makes the format
    // splittable), so the contract is: every prefix either declines
    // or yields a record-prefix at a block boundary, never garbage.
    val ocf = Avro.encode(recs, deflate = true, blockRecords = 3)
    var boundaries = 0
    (0 until ocf.length).foreach { n =>
      Avro.decode(java.util.Arrays.copyOf(ocf, n)) match {
        case None => ()
        case Some((codec, got)) =>
          assert(codec == "deflate")
          assert(got == recs.take(got.length) &&
            got.length % 3 == 0, s"prefix $n: $got")
          boundaries += 1
      }
    }
    // exactly the header (0 records) and the first block (3 records)
    assert(boundaries == 2)
  }

  test("deflate codec actually compresses repetitive blocks") {
    val rep = (0 until 50).map(i => Rec(i.toLong, "same-tag-text", 1.0))
    val plain = Avro.encode(rep, deflate = false, blockRecords = 50)
    val packed = Avro.encode(rep, deflate = true, blockRecords = 50)
    assert(packed.length < plain.length / 2)
  }
}
