package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Archives, Avro, Codecs, Flac, PerceptualHash, Proto}

/** Generative round-trip properties for the round-8 codec family —
  * the hand-built spec cases pin known traps; these sample the input
  * space. Plain ScalaCheck generators with fixed seeds (no scalatest
  * bridge in the offline cache), same convention as PropsSpec.
  */
class CodecPropsSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)))

  test("FLAC: random signals round-trip at every mode/block shape") {
    val gen = for {
      n <- Gen.chooseNum(1, 200)
      bs <- Gen.chooseNum(1, 64)
      mode <- Gen.chooseNum(0, 6)
      s <- Gen.listOfN(n, Gen.chooseNum(-128, 127))
    } yield (s.toArray, bs, mode)
    samples(gen).foreach { case (s0, bs, mode) =>
      val s = if (mode == 0) Array.fill(s0.length)(s0(0)) else s0
      val dec = Flac.decode(Flac.encode(s, bs, mode))
      assert(dec.isDefined && dec.get.toSeq == s.toSeq,
        s"n=${s.length} bs=$bs mode=$mode")
    }
  }

  test("TIFF: random surfaces round-trip across all variant corners") {
    val gen = for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      big <- Gen.oneOf(true, false)
      pb <- Gen.oneOf(true, false)
      wz <- Gen.oneOf(true, false)
      rps <- Gen.chooseNum(1, 8)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, big, pb, wz, rps, px.map(_.toByte).toArray)
    samples(gen).foreach { case (w, h, big, pb, wz, rps, px) =>
      val d = Codecs.tiff(
        PerceptualHash.encodeTiff(px, w, h, big, pb, wz, rps))
      assert(d.isDefined, s"$w x $h big=$big pb=$pb wz=$wz rps=$rps")
      assert(java.util.Arrays.equals(d.get.gray, px))
    }
  }

  test("TAR + ZIP: random member sets round-trip byte-exact") {
    val member = for {
      n <- Gen.chooseNum(0, 700)
      name <- Gen.stringOfN(8, Gen.alphaLowerChar)
      data <- Gen.listOfN(n, Gen.chooseNum(0, 255))
    } yield (name, data.map(_.toByte).toArray)
    val gen = Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, member))
      .map(_.zipWithIndex.map { case ((nm, d), i) => (s"$nm$i", d) })
    samples(gen).foreach { members =>
      val tar = Archives.encodeTar(members.map { case (nm, d) =>
        Archives.Member(nm, '0', 0, d)
      })
      val tb = Archives.tarMembers(tar).get
      assert(tb.map(_.name) == members.map(_._1))
      tb.zip(members).foreach { case (got, (_, want)) =>
        assert(java.util.Arrays.equals(got.data, want))
      }
      val zip = Archives.encodeZip(members)
      val zb = Archives.zipMembers(zip).get
      assert(zb.map(_.name) == members.map(_._1))
      zb.zip(members).foreach { case (got, (_, want)) =>
        assert(java.util.Arrays.equals(got.data, want))
      }
    }
  }

  test("Avro + Proto: random records round-trip exactly") {
    val rec = for {
      id <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      tag <- Gen.stringOfN(6, Gen.asciiPrintableChar)
      num <- Gen.chooseNum(-100000, 100000)
      den <- Gen.oneOf(2, 4, 8, 16)
    } yield Avro.Rec(id, tag, num.toDouble / den)
    val gen = for {
      k <- Gen.chooseNum(1, 12)
      recs <- Gen.listOfN(k, rec)
      deflate <- Gen.oneOf(true, false)
      block <- Gen.chooseNum(1, 5)
    } yield (recs, deflate, block)
    samples(gen).foreach { case (recs, deflate, block) =>
      val (codec, back) =
        Avro.decode(Avro.encode(recs, deflate, block)).get
      assert(codec == (if (deflate) "deflate" else "null"))
      assert(back == recs)
      val d = Proto.Doc(recs.head.id, recs.head.tag, recs.head.score,
        recs.head.id & 0xffffffffL, recs.map(_.id),
        Proto.Meta(recs.head.tag, recs.size.toLong))
      for (unknown <- Seq(false, true))
        assert(Proto.decode(Proto.encode(d, unknown)).get == d)
    }
  }
}
