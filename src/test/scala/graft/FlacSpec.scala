package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Flac

/** Pins the FLAC-subset codec: lossless round-trips across every
  * subframe mode and multi-frame layout, CRC protection, and a
  * decline-don't-guess contract under bit corruption and truncation.
  */
class FlacSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(41)

  private def noisy(n: Int): Array[Int] =
    Array.tabulate(n)(i => ((i * 37) % 251) - 125 + rng.nextInt(3))

  private def smooth(n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (100 * math.sin(i / 7.0)).toInt.max(-128).min(127))

  test("round-trip: every mode, single and multi frame, odd tails") {
    for {
      mode <- 0 to 6
      (len, bs) <- Seq((64, 64), (64, 32), (100, 32), (7, 4))
    } {
      val s =
        if (mode == 0) Array.fill(len)(-37)
        else if (mode >= 4) smooth(len)
        else noisy(len)
      if (len > (mode - 2).max(0)) {
        val enc = Flac.encode(s, bs, mode)
        val dec = Flac.decode(enc)
        assert(dec.isDefined, s"mode=$mode len=$len bs=$bs")
        assert(dec.get.toSeq == s.toSeq, s"mode=$mode len=$len bs=$bs")
      }
    }
  }

  test("fixed predictors beat verbatim on smooth signals") {
    val s = smooth(512)
    val verbatim = Flac.encode(s, 256, 1).length
    val order2 = Flac.encode(s, 256, 4).length
    assert(order2 < verbatim,
      s"order-2 $order2 should compress below verbatim $verbatim")
  }

  test("many frames exercise multi-byte UTF-8 frame numbers") {
    // 200 frames of 4 samples: frame numbers cross the 0x80 boundary
    val s = noisy(800)
    val dec = Flac.decode(Flac.encode(s, 4, 3))
    assert(dec.isDefined && dec.get.toSeq == s.toSeq)
  }

  test("every single-bit corruption either declines or decodes losslessly") {
    val s = noisy(48)
    val enc = Flac.encode(s, 16, 4)
    var silent = 0
    for (byteIdx <- enc.indices; bit <- 0 until 8) {
      val c = enc.clone()
      c(byteIdx) = (c(byteIdx) ^ (1 << bit)).toByte
      Flac.decode(c) match {
        case Some(out) if out.toSeq != s.toSeq => silent += 1
        case _ => ()
      }
    }
    assert(silent == 0,
      s"$silent single-bit flips decoded to WRONG samples undetected")
  }

  test("truncation at every length declines without throwing") {
    val enc = Flac.encode(noisy(40), 20, 2)
    (0 until enc.length).foreach { n =>
      assert(Flac.decode(java.util.Arrays.copyOf(enc, n)).isEmpty, s"at $n")
    }
  }

  test("CRC tables match known check values") {
    // CRC-8 poly 0x07 over "123456789" = 0xF4; CRC-16/BUYPASS = 0xFEE8
    val msg = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(msg, 0, msg.length) == 0xf4)
    assert(Flac.crc16(msg, 0, msg.length) == 0xfee8)
  }
}
