package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Archives
import graft.ops.Archives.Member

/** Pins the archive readers: ustar block-walk with verified
  * checksums, zip central-directory reads with CRC-32 verification,
  * and decline-don't-guess under corruption for both.
  */
class ArchivesSpec extends AnyFunSuite {

  private def m(name: String, content: String, flag: Char = '0') =
    Member(name, flag, 0, content.getBytes("UTF-8"))

  test("tar round-trip: dirs, files, block padding, exact payloads") {
    val members = Seq(m("a/", "", '5'), m("a/one.txt", "hello"),
      m("a/two.bin", "x" * 513), m("empty", ""))
    val tar = Archives.encodeTar(members)
    assert(tar.length % 512 == 0)
    val back = Archives.tarMembers(tar).get
    assert(back.map(_.name) == members.map(_.name))
    assert(back.map(_.typeflag) == Seq('5', '0', '0', '0'))
    back.zip(members).foreach { case (got, want) =>
      assert(got.size == want.data.length)
      assert(java.util.Arrays.equals(got.data, want.data))
    }
  }

  test("tar: corrupting any header byte fails the checksum; bad sizes decline") {
    val tar = Archives.encodeTar(Seq(m("f.txt", "payload")))
    // flip one byte in the name field: checksum must catch it
    val c = tar.clone(); c(3) = 'X'.toByte
    assert(Archives.tarMembers(c).isEmpty)
    // non-octal size field
    val c2 = tar.clone(); c2(124) = '9'.toByte
    assert(Archives.tarMembers(c2).isEmpty)
    // missing second terminator block
    assert(Archives.tarMembers(
      java.util.Arrays.copyOf(tar, tar.length - 512)).isEmpty)
    // truncated payload
    assert(Archives.tarMembers(
      java.util.Arrays.copyOf(tar, 600)).isEmpty)
  }

  test("zip round-trip: stored + deflate via the central directory") {
    val members = Seq("s.txt" -> "stored bytes".getBytes("UTF-8"),
      "d.txt" -> ("abc" * 300).getBytes("UTF-8"),
      "s2.txt" -> "more".getBytes("UTF-8"))
    val zip = Archives.encodeZip(members, comment = "trailing comment!")
    val back = Archives.zipMembers(zip).get
    assert(back.map(_.name) == members.map(_._1))
    assert(back.map(_.method) == Seq(0, 8, 0))
    back.zip(members).foreach { case (got, (_, want)) =>
      assert(java.util.Arrays.equals(got.data, want))
    }
    // the deflate member actually compressed on the wire
    assert(zip.length <
      members.map(_._2.length).sum + 30 * 3 + 46 * 3 + 200)
  }

  test("zip: payload corruption is caught by CRC; structure corruption declines") {
    val zip = Archives.encodeZip(Seq(
      "a.txt" -> "stored payload".getBytes("UTF-8"),
      "b.txt" -> ("zz" * 200).getBytes("UTF-8")))
    // flip a byte inside the first (stored) payload
    val c = zip.clone(); c(40) = (c(40) ^ 0x01).toByte
    assert(Archives.zipMembers(c).isEmpty)
    // EOCD signature destroyed
    val eocd = zip.length - 22 - "graft".length
    val c2 = zip.clone(); c2(eocd) = 0
    assert(Archives.zipMembers(c2).isEmpty)
    // truncation anywhere declines without throwing
    (0 until zip.length).foreach { n =>
      Archives.zipMembers(java.util.Arrays.copyOf(zip, n))
    }
  }

  test("zip: encrypted or unknown-method entries decline") {
    val zip = Archives.encodeZip(Seq("a" -> "x".getBytes))
    // central directory starts at EOCD's recorded offset; set the
    // encryption bit in its flags field (offset +8)
    val e = zip.length - 22 - "graft".length
    val dirOff = ((zip(e + 16) & 0xff) | ((zip(e + 17) & 0xff) << 8) |
      ((zip(e + 18) & 0xff) << 16) | ((zip(e + 19) & 0xff) << 24))
    val c = zip.clone(); c(dirOff + 8) = 0x01
    assert(Archives.zipMembers(c).isEmpty)
    val c2 = zip.clone(); c2(dirOff + 10) = 0x09 // method 9
    assert(Archives.zipMembers(c2).isEmpty)
  }
}
