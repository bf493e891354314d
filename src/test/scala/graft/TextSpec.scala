package graft

import graft.ops.TextOps

/** Semantics pins for the text operators added beyond the fully-
  * oracled basics: BM25 internal consistency and PII scrubbing.
  * (Value-level correctness is carried by the DuckDB oracle gate;
  * these pin properties an oracle diff wouldn't localize.)
  */
class TextSpec extends SparkSpec {

  test("bm25: df matches per-term doc counts; scores positive and bounded") {
    val rows = TextOps.bm25(spark, sf()).collect()
    assert(rows.nonEmpty)
    // df for a term == number of distinct docs carrying that term
    val byTerm = rows.groupBy(_.getAs[String]("term"))
    byTerm.foreach { case (_, rs) =>
      val docs = rs.map(_.getAs[Long]("doc_id")).distinct.length
      assert(rs.forall(_.getAs[Long]("df") == docs))
    }
    rows.foreach { r =>
      val score = r.getAs[Double]("bm25")
      assert(score > 0.0, s"non-positive score: $r")
      // BM25 with plus-one idf is bounded by idf * (k1+1)
      val n = rows.map(_.getAs[Long]("doc_id")).distinct.length
      assert(score < math.log(n + 1.0) * 2.2 + 1.0)
      assert(r.getAs[Long]("tf") >= 1 && r.getAs[Long]("dl") >= 1)
    }
    // monotonicity at equal dl: same term, same dl, higher tf ⇒ ≥ score
    rows.groupBy(r => (r.getAs[String]("term"), r.getAs[Long]("dl")))
      .values.filter(_.length > 1).foreach { rs =>
        val sorted = rs.sortBy(_.getAs[Long]("tf"))
        sorted.sliding(2).foreach { case Array(lo, hi) =>
          assert(lo.getAs[Double]("bm25") <= hi.getAs[Double]("bm25"))
        }
      }
  }

  test("vocab top-k matches a brute-force count and ranks deterministically") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val occ = scala.collection.mutable.Map.empty[String, Long]
    val docsOf = scala.collection.mutable.Map.empty[String, Set[Long]]
    texts.foreach { case (id, t) =>
      t.toLowerCase.trim.split("\\s+", -1).foreach { tok =>
        occ(tok) = occ.getOrElse(tok, 0L) + 1L
        docsOf(tok) = docsOf.getOrElse(tok, Set.empty) + id
      }
    }
    val expected = occ.toSeq
      .sortBy { case (tok, c) => (-c, tok) }.take(100)
      .zipWithIndex.map { case ((tok, c), i) =>
        (tok, c, docsOf(tok).size.toLong, i + 1)
      }
    val got = TextOps.vocabTopK(spark, sf()).collect().map(r =>
      (r.getAs[String]("token"), r.getAs[Long]("cnt"),
        r.getAs[Long]("df"), r.getAs[Int]("rank"))).toSeq
    assert(got == expected)
  }

  test("repetition signals match a per-doc brute-force recompute") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.repetitionScores(spark, sf()).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // mirror wsTokens: trim → lower → split \s+ (keep empties like
      // Spark's limit=-1 split)
      val toks = texts(id).toLowerCase.trim.split("\\s+", -1).toSeq
      def counts(n: Int): Seq[Int] =
        toks.sliding(n).filter(_.size == n).toSeq
          .groupBy(identity).values.map(_.size).toSeq
      if (toks.size >= 2) {
        val c2 = counts(2)
        assert(r.getAs[Long]("n_grams2") == c2.sum.toLong)
        assert(r.getAs[Long]("top2_cnt") == c2.max.toLong)
        assert(r.getAs[Double]("top2_frac") ==
          c2.max.toDouble / c2.sum.toDouble)
        assert(r.getAs[Double]("dup2_frac") ==
          c2.filter(_ > 1).sum.toDouble / c2.sum.toDouble)
        if (toks.size >= 3) {
          val c3 = counts(3)
          assert(r.getAs[Long]("n_grams3") == c3.sum.toLong)
          assert(r.getAs[Double]("dup3_frac") ==
            c3.filter(_ > 1).sum.toDouble / c3.sum.toDouble)
          assert(r.getAs[Boolean]("keep_rep") ==
            (c2.max.toDouble / c2.sum <= 0.2 &&
              c3.filter(_ > 1).sum.toDouble / c3.sum <= 0.18))
        }
      } else assert(r.isNullAt(r.fieldIndex("n_grams2")))
    }
  }

  test("pii scrub: injected email/ssn/phone counted and redacted") {
    val rows = TextOps.piiScrub(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every doc gets exactly the injected instances (the corpus
      // itself carries none)
      assert(r.getAs[Int]("n_emails") == 1)
      assert(r.getAs[Int]("n_ssns") == 1)
      assert(r.getAs[Int]("n_phones") == 1)
    }
    // recompute one row's scrub in plain Java regex — same engine as
    // Spark's regexp_replace, pins the injection + ordering plumbing
    val doc = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").head()
    val id = doc.getLong(0)
    val aug = doc.getString(1).toLowerCase +
      s" contact user$id@mail.example.com or +1-555-" +
      f"${id % 10000}%04d" + " ssn 123-45-6789."
    val expected = aug
      .replaceAll("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")
      .replaceAll("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
      .replaceAll("\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row = rows.find(_.getAs[Long]("doc_id") == id).get
    assert(row.getAs[String]("scrub_fp") == hex)
    assert(row.getAs[Int]("n_chars") == expected.length)
    assert(expected.contains("<EMAIL>") && expected.contains("<SSN>") &&
      expected.contains("<PHONE>"))
  }

  // ---- full iterative BPE (train + tokenize-apply) -----------------

  private def bpeCorpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("bpeTrain: hand-checkable merges on a crafted corpus") {
    // "abab" x4, "ab" x2: round-1 pair counts — (a,b) = 2*4 + 1*2 =
    // 10, (b,a) = 1*4 = 4
    val dir = bpeCorpus(Seq("abab abab abab ab", "abab ab"))
    val merges = TextOps.bpeTrain(spark, dir, k = 2).collect()
    assert(merges.length == 2)
    val m1 = merges.find(_.getAs[Int]("rank") == 1).get
    assert(m1.getAs[String]("left_sym") == "a" &&
      m1.getAs[String]("right_sym") == "b" &&
      m1.getAs[String]("merged") == "ab" &&
      m1.getAs[Long]("pair_count") == 10L)
    // round 2: words are now [ab ab] x4, [ab] x3 -> (ab,ab)=4 wins
    val m2 = merges.find(_.getAs[Int]("rank") == 2).get
    assert(m2.getAs[String]("left_sym") == "ab" &&
      m2.getAs[String]("right_sym") == "ab" &&
      m2.getAs[Long]("pair_count") == 4L)
  }

  test("bpeTrain: same-symbol runs pair greedily and training stops early") {
    // one word "aaaa" x2: round 1 merges (a,a) cnt 6 (3 adjacencies
    // x 2 occurrences), leaving [aa aa]; round 2 merges (aa,aa) cnt 2,
    // leaving the whole word; round 3 finds no pair -> stop at 2
    val dir = bpeCorpus(Seq("aaaa aaaa"))
    val merges = TextOps.bpeTrain(spark, dir, k = 10).collect()
    // after [aa,aa] -> [aaaa] the word is a single symbol: no pair
    // remains, so only 2 of the allowed 10 merges happen
    assert(merges.length == 2, merges.mkString(";"))
    assert(merges(0).getAs[String]("merged") == "aa" &&
      merges(0).getAs[Long]("pair_count") == 6L)
    // the greedy left-to-right pairing: aaaa -> [aa, aa], NOT [aa,a,a]
    assert(merges(1).getAs[String]("left_sym") == "aa" &&
      merges(1).getAs[String]("right_sym") == "aa" &&
      merges(1).getAs[Long]("pair_count") == 2L)
  }

  test("bpeTokens: vocabulary state after k merges, recomputable by hand") {
    val dir = bpeCorpus(Seq("abab abab abab ab", "abab ab"))
    val toks = TextOps.bpeTokens(spark, dir, k = 1).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("token_count"))
      .toMap
    // after merging (a,b): "abab" (cnt 4) -> [ab, ab]; "ab" (cnt 2)
    // -> [ab]; so the only token is "ab" with count 2*4 + 2 = 10
    assert(toks == Map("ab" -> 10L))
  }

  test("bpeTrain is deterministic across runs") {
    val a = TextOps.bpeTrain(spark, sf(), k = 8).collect().toSeq
    val b = TextOps.bpeTrain(spark, sf(), k = 8).collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[Int]("rank")) == (1 to 8))
    a.foreach(r => assert(r.getAs[String]("merged") ==
      r.getAs[String]("left_sym") + r.getAs[String]("right_sym")))
  }

  test("wordpiece: pieces tile every word, each cut is the longest match") {
    val out = TextOps.wordpieceTokens(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty && out.exists(_._1.length > 1))
    // counts are positive and ordering is (n desc, piece asc)
    assert(out.forall(_._2 > 0))
    assert(out.sameElements(out.sortBy { case (p, n) => (-n, p) }))
    // reimplement greedy max-munch on the driver over the same corpus
    // and vocab; piece totals must agree exactly
    val words = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS w")
      .where("w <> ''")
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val top = words.toSeq.sortBy { case (w, n) => (-n, w) }.take(50)
      .map(_._1)
    val vocab = (top ++ words.keys.flatMap(_.map(_.toString))).toSet
    val maxLen = vocab.map(_.length).max
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, n) =>
      var pos = 0
      while (pos < w.length) {
        var l = math.min(maxLen, w.length - pos)
        while (l > 1 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
        val piece = w.substring(pos, pos + l)
        counts(piece) = counts.getOrElse(piece, 0L) + n
        pos += l
      }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(40)
    assert(out.toSeq == want)
  }

  test("n-gram langid: confusion matrix vs fixture labels matches a driver recompute") {
    val rows = graft.ops.TextOps.langIdNgram(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_label"),
        r.getAs[String]("lang_pred"), r.getAs[Long]("distance")))
    // driver-side textcat recompute from the raw fixture: padded char
    // trigram profiles (top-40 per lang on the hash-stable train
    // split, top-20 per doc), out-of-place distance with penalty 40,
    // argmin tie-broken by lang
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(id + "#split").substring(0, 1), 16) <= 13
    def grams(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        .map(w => s"_${w}_")
        .flatMap(p => (0 to p.length - 3).map(i => p.substring(i, i + 3)))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long](0), r.getAs[String](1), r.getAs[String](2)))
    def rank(gs: Seq[(String, Int)], n: Int): Map[String, Int] =
      gs.sortBy { case (g, c) => (-c, g) }.take(n)
        .zipWithIndex.map { case ((g, _), i) => g -> (i + 1) }.toMap
    val langProf = docs.filter(d => isTrain(d._1))
      .flatMap(d => grams(d._3).map(g => (d._2, g)))
      .groupBy(_._1).map { case (lang, gs) =>
        lang -> rank(gs.groupBy(_._2).map { case (g, v) => g -> v.length }
          .toSeq, 40)
      }
    val langs = langProf.keys.toSeq.sorted
    val want = docs.map { case (id, label, text) =>
      val dp = rank(grams(text).groupBy(identity)
        .map { case (g, v) => g -> v.length }.toSeq, 20)
      val dists = langs.map { l =>
        l -> dp.map { case (g, r) =>
          langProf(l).get(g).map(lr => math.abs(r - lr).toLong)
            .getOrElse(40L)
        }.sum
      }
      val (bl, bd) = dists.minBy { case (l, d) => (d, l) }
      (id, label, bl, bd)
    }.toSet
    assert(rows.toSet == want)
    // the matrix covers every (label, pred) the recompute says it
    // should, and no prediction class is empty (liveness: the scorer
    // genuinely discriminates rather than constant-voting)
    val matrix = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.length }
    val wantMatrix = want.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.size }
    assert(matrix == wantMatrix)
    assert(rows.map(_._3).distinct.length >= 3,
      s"degenerate predictions: ${matrix.keys}")
  }
}
