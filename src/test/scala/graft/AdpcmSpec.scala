package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Adpcm, Codecs}

/** Hand-stepped vectors for the compressed-audio decoders: the IMA
  * ADPCM state recurrence (bitwise delta form), block framing
  * (header predictor = first sample, low nibble first), the G.711
  * segment expansions against their CCITT landmark values, and the
  * WAV container dispatch for fmt tags 0x11/7/6.
  */
class AdpcmSpec extends AnyFunSuite {

  test("IMA step: hand-computed transitions at index 0") {
    // step(0)=7. code 0: delta = 7>>3 = 0 -> pred 0, index -1 -> clamp 0
    assert(Adpcm.step(0, 0, 0) == ((0, 0)))
    // code 7: delta = 0 + 7 + 3 + 1 = 11 -> pred 11, index +8
    assert(Adpcm.step(0, 0, 7) == ((11, 8)))
    // code 0xF = sign|7: pred -11, index +8
    assert(Adpcm.step(0, 0, 0xf) == ((-11, 8)))
    // clamping: from +32760 a max positive delta saturates at 32767
    assert(Adpcm.step(32760, 88, 7)._1 == 32767)
    assert(Adpcm.step(-32760, 88, 0xf)._1 == -32768)
    // index clamps at 88
    assert(Adpcm.step(0, 88, 4)._2 == 88)
  }

  test("block decode: header predictor is sample 0, low nibble first") {
    // pred = 1000 (0x03E8 LE), index 0; one byte 0x70 -> codes 0 then 7
    val blk = Array[Byte](0xe8.toByte, 0x03, 0, 0, 0x70)
    val s = Adpcm.decodeMonoBlock(blk, 0, 5).get
    assert(s.toSeq == Seq[Short](1000, 1000, 1011))
    // step index > 88 in the header is malformed
    assert(Adpcm.decodeMonoBlock(Array[Byte](0, 0, 89, 0, 0), 0, 5).isEmpty)
  }

  test("encode twin: a constant signal is all zero codes, decoded exactly") {
    val samples = Array.fill[Short](8)(-123)
    val blk = Adpcm.encodeMonoBlock(samples, -123, 0)
    assert(blk.length == 4 + 4 && blk.drop(4).forall(_ == 0))
    val dec = Adpcm.decodeMonoBlock(blk, 0, blk.length).get
    assert(dec.forall(_ == -123) && dec.length == 9)
  }

  test("decode matches an independent reimplementation on random codes") {
    // spec-local rewrite of the IMA recurrence (different spelling of
    // the same published arithmetic) over random nibble streams
    def ref(blk: Array[Byte]): Seq[Int] = {
      var pred = ((blk(0) & 0xff) | ((blk(1) & 0xff) << 8)).toShort.toInt
      var idx = blk(2) & 0xff
      val out = scala.collection.mutable.ArrayBuffer(pred)
      for (k <- 0 until (blk.length - 4) * 2) {
        val code = (blk(4 + k / 2) & 0xff) >> (4 * (k % 2)) & 0xf
        val st = Adpcm.StepTable(idx)
        val mag = (0 to 2).map(b => if ((code & (1 << b)) != 0)
          st >> (2 - b) else 0).sum + (st >> 3)
        pred = math.max(-32768, math.min(32767,
          if (code >= 8) pred - mag else pred + mag))
        idx = math.max(0, math.min(88, idx + Adpcm.IndexTable(code)))
        out += pred
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val blk = new Array[Byte](4 + 16)
      rnd.nextBytes(blk)
      blk(2) = rnd.nextInt(89).toByte
      val dec = Adpcm.decodeMonoBlock(blk, 0, blk.length).get
      assert(dec.map(_.toInt).toSeq == ref(blk))
    }
  }

  test("encode twin tracks a representable signal through decode") {
    // targets that are exact step sums at index 0 keep encoder and
    // decoder in lockstep; the wire bytes are pinned by hand
    val blk = Adpcm.encodeMonoBlock(Array[Short](11, 11), 0, 0)
    // code 7 at step 7 = +11, then code 0 at step(8)=16 -> delta 2?
    // no: 16>>3 = 2, nearest to 0 is code 0 -> +2 -> 13
    val dec = Adpcm.decodeMonoBlock(blk, 0, blk.length).get
    assert(dec(0) == 0 && dec(1) == 11)
    assert(math.abs(dec(2) - 11) <= (Adpcm.StepTable(8) >> 2))
  }

  test("MS ADPCM: hand-stepped predictor/delta transitions") {
    // coef pair 0 = (256, 0): predictor == samp1 exactly
    assert(Adpcm.msStep(100, 50, 256, 0, 16, 1) == ((116, 16)))
    // sign bit: code 0xF = -1
    assert(Adpcm.msStep(116, 100, 256, 0, 16, 0xf)._1 == 100)
    // the predictor divide truncates toward zero (C semantics):
    // -300/256 = -1, not floor's -2
    assert(Adpcm.msStep(-3, 0, 100, 0, 16, 0)._1 == -1)
    // delta adapts upward on extreme codes and clamps at int16
    assert(Adpcm.msStep(0, 0, 256, 0, 1000, 8)._2 == 3000)
    assert(Adpcm.msStep(0, 0, 256, 0, 30000, 8)._2 == 32767)
    // and floors at 16
    assert(Adpcm.msStep(0, 0, 256, 0, 16, 0)._2 == 16)
  }

  test("MS ADPCM block: header samples OLDER first, high nibble first") {
    // pred 0, delta 16, samp1=300, samp2=200; byte 0x1F -> codes 1, -1
    val blk = Array[Byte](0, 16, 0, 0x2c, 0x01, 0xc8.toByte, 0x00, 0x1f)
    val s = Adpcm.decodeMsMonoBlock(blk, 0, 8).get
    // coef (256,0): samp = prev + code*delta
    assert(s.toSeq == Seq[Short](200, 300, 316, 300))
    // predictor index outside the table declines
    assert(Adpcm.decodeMsMonoBlock(
      Array[Byte](7, 16, 0, 0, 0, 0, 0, 0), 0, 8).isEmpty)
    // non-positive initial delta declines
    assert(Adpcm.decodeMsMonoBlock(
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0), 0, 8).isEmpty)
  }

  test("u-law landmarks and code round-trip") {
    assert(Adpcm.ulawToPcm(0x00) == -32124)
    assert(Adpcm.ulawToPcm(0x80) == 32124)
    assert(Adpcm.ulawToPcm(0xff) == 0)
    assert(Adpcm.ulawToPcm(0x7f) == 0)
    // decode->encode is the identity on codes (0x7F and 0xFF both
    // decode to 0, which re-encodes as 0xFF)
    (0 to 255).foreach { b =>
      val expect = if (b == 0x7f) 0xff else b
      assert(Adpcm.pcmToUlaw(Adpcm.ulawToPcm(b)) == expect, s"code $b")
    }
  }

  test("A-law landmarks") {
    assert(Adpcm.alawToPcm(0x55) == -8)
    assert(Adpcm.alawToPcm(0xd5) == 8)
    assert(Adpcm.alawToPcm(0x2a) == -32256)
    assert(Adpcm.alawToPcm(0xaa) == 32256)
  }

  test("WAV dispatch: fmt tags 0x11/7/6 reach the right decoder") {
    def wav(tag: Int, bits: Int, align: Int, extra: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val fmtLen = 16 + (if (extra.isEmpty) 0 else 2 + extra.length)
      val riffLen = 4 + (8 + fmtLen) + (8 + data.length)
      val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(riffLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(fmtLen)
      bb.putShort(tag.toShort).putShort(1).putInt(8000)
      bb.putInt(8000 * align).putShort(align.toShort).putShort(bits.toShort)
      if (extra.nonEmpty) { bb.putShort(extra.length.toShort); bb.put(extra) }
      bb.put("data".getBytes).putInt(data.length).put(data)
      bb.array()
    }
    // ADPCM: one 6-byte block (pred 1000, idx 0, codes 0,7,0,7)
    val adpcm = wav(0x11, 4, 6, Array[Byte](5, 0),
      Array[Byte](0xe8.toByte, 0x03, 0, 0, 0x70, 0x70))
    assert(Codecs.wavSamples16(adpcm).get.take(3).toSeq ==
      Seq[Short](1000, 1000, 1011))
    // u-law: 0x00 -> -32124
    val ul = Codecs.wavSamples16(wav(7, 8, 1, Array.emptyByteArray,
      Array[Byte](0x00, 0xff.toByte)))
    assert(ul.get.toSeq == Seq[Short](-32124, 0))
    // A-law: 0x55 -> -8
    val al = Codecs.wavSamples16(wav(6, 8, 1, Array.emptyByteArray,
      Array[Byte](0x55, 0xd5.toByte)))
    assert(al.get.toSeq == Seq[Short](-8, 8))
    // unknown tag declines
    assert(Codecs.wavSamples16(wav(2, 4, 6, Array.emptyByteArray,
      Array[Byte](0, 0, 0, 0, 0, 0))).isEmpty)
    // the gray path picks compressed mono up end-to-end
    assert(Codecs.decode(adpcm).exists(d =>
      d.kind == "wav" && d.width == 5))
  }
}
