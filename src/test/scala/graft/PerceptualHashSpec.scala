package graft

import graft.ops.{Codecs, PerceptualHash}

class PerceptualHashSpec extends SparkSpec {

  private def grid(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(9 * 8)(i => f(i / 9, i % 9).toByte)

  test("encodeBmp round-trips bit-exactly through the real decoder") {
    val gray = Array.tabulate(9 * 8)(i => ((i * 37 + 11) % 256).toByte)
    val decoded = Codecs.decode(PerceptualHash.encodeBmp(gray, 9, 8))
    assert(decoded.exists(_.kind == "bmp"))
    assert(decoded.get.width == 9 && decoded.get.height == 8)
    assert(decoded.get.gray.sameElements(gray))
  }

  test("dHash is invariant to uniform brightness shift") {
    val base = grid((r, c) => 60 + 13 * ((r * 9 + c) % 9))
    val brighter = base.map(b => ((b & 0xff) + 40).toByte)
    val h1 = PerceptualHash.dHash(Codecs.Decoded("bmp", 9, 8, base))
    val h2 = PerceptualHash.dHash(Codecs.Decoded("bmp", 9, 8, brighter))
    assert(h1.isDefined && h1 == h2)
  }

  test("one flipped comparison moves exactly one bit") {
    val base = grid((_, c) => 100 + 10 * (c % 2)) // alternating low/high
    val tweaked = base.clone()
    tweaked(0) = 120.toByte // row 0: g(0,0) > g(0,1) now — bit 0 flips
    val h1 = PerceptualHash.dHash(Codecs.Decoded("bmp", 9, 8, base)).get
    val h2 = PerceptualHash.dHash(Codecs.Decoded("bmp", 9, 8, tweaked)).get
    assert(java.lang.Long.bitCount(h1 ^ h2) == 1)
  }

  test("integer-ratio downsample averages blocks; dHash survives pixel-doubling") {
    val small = grid((r, c) => 30 * ((r + c) % 8) + 5)
    // pixel-double to 18x16: each source pixel becomes a 2x2 block
    val big = Array.tabulate(18 * 16) { i =>
      val y = i / 18; val x = i % 18
      small((y / 2) * 9 + (x / 2))
    }
    val rs = PerceptualHash.resizeArea(big, 18, 16, 9, 8)
    assert(rs.sameElements(small))
    val hSmall = PerceptualHash.dHash(Codecs.Decoded("bmp", 9, 8, small))
    val hBig = PerceptualHash.dHash(Codecs.Decoded("bmp", 18, 16, big))
    assert(hSmall.isDefined && hSmall == hBig)
  }

  test("audio payloads yield no image signature, and vice versa") {
    assert(PerceptualHash.dHash(
      Codecs.Decoded("wav", 4, 1, Array[Byte](1, 2, 3, 4))).isEmpty)
    assert(PerceptualHash.audioHash(
      Codecs.Decoded("bmp", 9, 8, new Array[Byte](72))).isEmpty)
  }

  test("encodeWav round-trips 8-bit mono PCM bit-exactly through the real decoder") {
    val pcm = Array.tabulate(65)(i => ((i * 53 + 7) % 256).toByte)
    val decoded = Codecs.decode(PerceptualHash.encodeWav(pcm))
    assert(decoded.exists(_.kind == "wav"))
    assert(decoded.get.width == 65 && decoded.get.height == 1)
    assert(decoded.get.gray.sameElements(pcm))
  }

  test("audio envelope hash is gain-shift invariant and resamples longer clips") {
    val base = Array.tabulate(65)(i => (40 + 25 * (i % 5)).toByte)
    val louder = base.map(b => ((b & 0xff) + 30).toByte)
    val h1 = PerceptualHash.audioHash(Codecs.Decoded("wav", 65, 1, base))
    val h2 = PerceptualHash.audioHash(Codecs.Decoded("wav", 65, 1, louder))
    assert(h1.isDefined && h1 == h2)
    // sample-double to 130: each bin averages an identical pair
    val long = Array.tabulate(130)(i => base(i / 2))
    val h3 = PerceptualHash.audioHash(Codecs.Decoded("wav", 130, 1, long))
    assert(h3 == h1)
  }

  test("audio fixture pairs match a brute-force all-pairs recompute at sf0.001") {
    val got = PerceptualHash.audioNearDupPairs(spark, sf())
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val sigs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").toLowerCase.split("\\s+")
        val pcm = Array.tabulate(65)(i => md.digest(
          toks(i % toks.length).getBytes("UTF-8"))(0))
        var sig = 0L
        (0 until 64).foreach { i =>
          if ((pcm(i) & 0xff) < (pcm(i + 1) & 0xff)) sig |= 1L << i
        }
        r.getAs[Long]("doc_id") -> sig
      }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("encodeAvi round-trips frames; videoHash is the rotate-xor fold of frame dHashes") {
    val frames = (0 until 4).map(f =>
      Array.tabulate(72)(i => ((i * 31 + f * 97 + 13) % 256).toByte))
    val sig = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(frames, 9, 8))
    val expected = frames
      .map(g => PerceptualHash.dHashBits(g))
      .foldLeft(0L)((acc, h) => java.lang.Long.rotateLeft(acc, 1) ^ h)
    assert(sig.contains(expected))
  }

  test("encodeJpegBlocks decodes bit-exactly: DC-only blocks survive the IDCT") {
    // every extreme and a pseudo-random spread, including the
    // max-negative-diff path (255 -> 0 between adjacent blocks)
    val blocks = Array.tabulate(9 * 8) { i =>
      (i % 4) match {
        case 0 => 0.toByte
        case 1 => 255.toByte
        case 2 => ((i * 37 + 11) % 256).toByte
        case _ => 128.toByte
      }
    }
    val d = graft.ops.Jpeg.decode(
      PerceptualHash.encodeJpegBlocks(blocks, 9, 8)).get
    assert(d.width == 72 && d.height == 64)
    var r = 0
    while (r < 64) {
      var c = 0
      while (c < 72) {
        assert(d.gray(r * 72 + c) == blocks((r / 8) * 9 + c / 8),
          s"pixel ($r,$c) lost in the JPEG round-trip")
        c += 1
      }
      r += 1
    }
  }

  test("MJPEG AVI yields the same clip signature as the uncompressed encoding") {
    val frames = (0 until 4).map(f =>
      Array.tabulate(72)(i => ((i * 31 + f * 97 + 13) % 256).toByte))
    val plain = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(frames, 9, 8))
    val mjpeg = PerceptualHash.videoHash(
      PerceptualHash.encodeMjpegAvi(frames, 9, 8))
    assert(plain.isDefined && plain == mjpeg,
      "block-constant 72x64 MJPEG frames must box-resample to the same 9x8 grid")
  }

  test("static clips keep content-bearing signatures and frame order matters") {
    val a = Array.tabulate(72)(i => ((i * 37 + 11) % 256).toByte)
    val b = Array.tabulate(72)(i => ((i * 53 + 29) % 256).toByte)
    val staticA = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(Seq(a, a, a, a), 9, 8)).get
    val staticB = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(Seq(b, b, b, b), 9, 8)).get
    // a plain xor fold would send BOTH to 0; the rotation keeps the
    // content and distinguishes the clips
    assert(staticA != 0L && staticB != 0L && staticA != staticB)
    val fwd = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(Seq(a, b, a, b), 9, 8)).get
    val rev = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(Seq(b, a, b, a), 9, 8)).get
    assert(fwd != rev)
  }

  test("a one-pixel frame edit stays within the near-dup threshold") {
    val frames = (0 until 4).map(f =>
      grid((_, c) => 100 + 10 * (c % 2)).clone())
    val sig1 = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(frames, 9, 8)).get
    val edited = frames.map(_.clone())
    edited(2)(0) = 120.toByte // one comparison flips in frame 2
    val sig2 = PerceptualHash.videoHash(
      PerceptualHash.encodeAvi(edited, 9, 8)).get
    assert(java.lang.Long.bitCount(sig1 ^ sig2) == 1)
  }

  test("a forged avih header with overflow-scale dims declines instead of crashing") {
    val frames = Seq(Array.tabulate(72)(i => (i * 3).toByte))
    val avi = PerceptualHash.encodeAvi(frames, 9, 8)
    // forge dwWidth to a value whose 3x row arithmetic wraps Int
    val forged = avi.clone()
    // avih payload starts after RIFF(12) + LIST hdrl hdr(12) + avih hdr(8)
    val widthOff = 12 + 12 + 8 + 32
    forged(widthOff) = 0xff.toByte; forged(widthOff + 1) = 0xff.toByte
    forged(widthOff + 2) = 0xff.toByte; forged(widthOff + 3) = 0x7f.toByte
    assert(PerceptualHash.videoHash(forged).isEmpty)
  }

  test("video fixture pairs match a brute-force all-pairs recompute at sf0.001") {
    val got = PerceptualHash.videoNearDupPairs(spark, sf())
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def sigOf(px: Array[Byte]): Long = (0 until 4).map { f =>
      PerceptualHash.dHashBits(
        java.util.Arrays.copyOfRange(px, f * 72, (f + 1) * 72))
    }.foldLeft(0L)((acc, h) => java.lang.Long.rotateLeft(acc, 1) ^ h)
    val sigs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getAs[String]("text").toLowerCase.split("\\s+")
        val px = Array.tabulate(288)(i => md.digest(
          toks(i % toks.length).getBytes("UTF-8"))(0))
        val id = r.getAs[Long]("doc_id")
        if (PerceptualHash.hasTwin(id)) {
          val tp = px.clone()
          tp(0) = -1; tp(81) = -1; tp(162) = -1
          Seq(id -> sigOf(px), (id + PerceptualHash.TwinOffset) -> sigOf(tp))
        } else Seq(id -> sigOf(px))
      }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == expected)
    // the planted twins make the positive path non-vacuous: every
    // twinned doc MUST pair with its twin (Hamming ≤ 3 by construction)
    val planted = sigs.collect {
      // hasTwin also matches the twin ids themselves — restrict to
      // corpus originals (below the offset)
      case (id, _) if PerceptualHash.hasTwin(id) &&
        id < PerceptualHash.TwinOffset =>
        (id, id + PerceptualHash.TwinOffset)
    }.toSet
    assert(planted.nonEmpty, "fixture must contain twinned docs")
    assert(planted.forall(p => got.exists(g => (g._1, g._2) == p)),
      "every planted twin pair must surface through banding")
  }

  test("videoClusters (collapse-first) equals components over ALL pairs") {
    // the bounded-output form must be EXACTLY the min-label connected
    // components of the full Hamming <= 3 pair graph: identical-sig
    // class members are interchangeable vertices, so collapsing each
    // class to its min-id representative before the banded join
    // changes the work, never the relation
    val got = PerceptualHash.videoClusters(spark, sf())
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toMap
    val pairs = PerceptualHash.videoNearDupPairs(spark, sf())
      .collect().map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // driver-side union-find over the full pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = got.keySet.map { id =>
      val c = find(id)
      id -> ((c, id == c))
    }.toMap
    assert(got == expected,
      "collapse-first clusters diverged from all-pairs components")
  }

  test("videoClusters collapses identical-signature classes (crafted)") {
    // the corpus fixture has no identical signatures at spec scale
    // (they appear in the 10x scale corpus — SCALE_r13 §2), so the
    // collapse behavior is pinned on crafted signatures: {1,2,3}
    // share one sig (an identical-clip class), 4 sits at Hamming 1
    // from it (bridges via the class representative ONLY — pairs
    // with members 2 and 3 exist in the full graph but are collapsed
    // away), 5 is far from everything
    import spark.implicits._
    val sigs = Seq(
      1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, // Hamming 1 from the class signature
      5L -> -1L // Hamming 63 from 0, 62 from 1 — never a candidate
    ).toDF("doc_id", "sig")
    val got = graft.ops.PerceptualHash
      .nearDupClustersOfSigs(sigs, maxHamming = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((1L, false)), 5L -> ((5L, true))),
      s"crafted class must cluster under its min id: $got")
  }

  test("banding finds every pair at hamming <= 3 and verification rejects beyond") {
    import spark.implicits._
    // crafted signatures: doc 2 differs from doc 1 in 3 bits spread
    // over bands 0,1,2 — no single-band trick, only pigeonhole's
    // guaranteed clean band 3 links them. doc 3 dirties all four
    // bands (one bit each) — never a candidate with anyone (and at
    // hamming 4 must not surface regardless). doc 4 packs 4 diffs
    // into band 0 — bands 1-3 still collide with doc 1, so the
    // CANDIDATE forms and exact verification must reject it.
    val s1 = 0x0123456789abcdefL
    val s2 = s1 ^ (1L << 2) ^ (1L << 17) ^ (1L << 33)
    val s3 = s1 ^ (1L << 3) ^ (1L << 18) ^ (1L << 34) ^ (1L << 50)
    val s4 = s1 ^ 0xfL
    val sigs = Seq((1L, s1), (2L, s2), (3L, s3), (4L, s4))
      .toDF("doc_id", "sig")
    val got = PerceptualHash.nearDupPairsOfSigs(sigs, maxHamming = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == Set((1L, 2L, 3)))
  }

  test("fixture pairs match a brute-force all-pairs recompute at sf0.001") {
    val got = graft.ops.PerceptualHash.nearDupPairs(spark, sf())
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    // recompute every signature directly from tokens (no BMP, no
    // banding) and compare all pairs — the full candidate-generation
    // + verification contract against an independent path
    val md = java.security.MessageDigest.getInstance("MD5")
    val sigs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").toLowerCase.split("\\s+")
        val gray = Array.tabulate(72)(i => md.digest(
          toks(i % toks.length).getBytes("UTF-8"))(0))
        r.getAs[Long]("doc_id") -> PerceptualHash.dHashBits(gray)
      }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }
}
