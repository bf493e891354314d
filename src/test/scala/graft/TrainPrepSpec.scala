package graft

import graft.ops.{TextOps, TrainPrep}
import org.apache.spark.sql.functions._

/** Property pins for the training-export preparation operators
  * (value-level correctness rides the DuckDB oracle gate; these pin
  * the invariants an oracle diff wouldn't localize).
  */
class TrainPrepSpec extends SparkSpec {

  test("split_assign: total partition, plausible fractions, doc_id-stable") {
    val rows = TrainPrep.splitAssign(spark, sf()).collect()
    val total = rows.length
    assert(total > 0)
    val bySplit = rows.groupBy(_.getAs[String]("split")).map {
      case (k, v) => k -> v.length
    }
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == total)
    // nibble→split mapping is exact, not statistical
    rows.foreach { r =>
      val nib = r.getAs[Int]("split_bucket")
      val expected =
        if (nib <= 13) "train" else if (nib == 14) "val" else "test"
      assert(r.getAs[String]("split") == expected)
    }
    // expected 87.5% train; allow wide slack at 500 docs (binomial sd ~1.5%)
    val trainFrac = bySplit.getOrElse("train", 0).toDouble / total
    assert(trainFrac > 0.80 && trainFrac < 0.95, s"train frac $trainFrac")
    // membership is a pure function of doc_id: re-running on a filtered
    // corpus must not move any surviving document between splits
    val sub = TrainPrep.splitAssign(spark, sf())
      .filter(col("doc_id") % 2 === 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val full = rows
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    sub.foreach { case (id, sp) => assert(full(id) == sp) }
  }

  test("pack_sequences: per-shard chunking is gapless and capacity-true") {
    val cap = 2048L
    val rows = TrainPrep.packSequences(spark, sf(), capacity = cap).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("pack_off")
      assert(off >= 0 && off < cap, s"pack_off out of range: $r")
      assert(r.getAs[Long]("pack_id") >= 0)
    }
    // within a shard: pack_id monotone over the export order, and each
    // document starts exactly where the previous one's tokens ended
    // (concat-and-chunk leaves no holes)
    rows.groupBy(_.getAs[Int]("shard_id")).values.foreach { shard =>
      val inOrder = shard.sortBy(r =>
        r.getAs[Long]("pack_id") * cap + r.getAs[Long]("pack_off"))
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / cap)
        assert(r.getAs[Long]("pack_off") == cum % cap)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // token accounting agrees with text_tokens' ws count
    val ws = TextOps.tokenCounts(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("ws_tokens")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == ws(r.getAs[Long]("doc_id")).toLong)
    }
  }

  test("mix_weights: fractions sum to 1; weighted corpus is size-preserving") {
    val rows = TrainPrep.mixWeights(spark, sf()).collect()
    assert(rows.nonEmpty)
    val docFracSum = rows.map(_.getAs[Double]("doc_frac")).sum
    assert(math.abs(docFracSum - 1.0) < 1e-4, s"doc_frac sum $docFracSum")
    val tokFracSum = rows.map(_.getAs[Double]("token_frac")).sum
    assert(math.abs(tokFracSum - 1.0) < 1e-4)
    // sum(weight * n_docs) == tot_docs: resampling at these weights
    // leaves the corpus size unchanged (uniform target, exact ratios)
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val weighted = rows
      .map(r => r.getAs[Double]("weight") * r.getAs[Long]("n_docs")).sum
    assert(math.abs(weighted - totDocs) / totDocs < 1e-4)
    // uniform target: every source's weighted share is equal
    val shares = rows.map(r =>
      r.getAs[Double]("weight") * r.getAs[Long]("n_docs") / totDocs)
    shares.foreach(sh => assert(math.abs(sh - 1.0 / rows.length) < 1e-4))
  }

  test("surprisal: frequency-monotone and decimal-mediation order-stable") {
    val rows = TextOps.surprisal(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sp = r.getAs[Double]("surprisal")
      assert(sp > 0.0 && sp.isFinite, s"bad surprisal: $r")
      assert(r.getAs[Long]("n_tokens") >= 1)
    }
    // a document of globally-common tokens must score below one of
    // globally-rare tokens: compare each doc's surprisal to the corpus
    // mean token probability it implies — spot-check extremes instead
    // of the full model: min-surprisal doc's tokens are on average more
    // frequent than max-surprisal doc's
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token"))
    val freq = docs.groupBy(_._2).map { case (t, v) => t -> v.length }
    val meanFreq = docs.groupBy(_._1).map { case (id, toks) =>
      id -> toks.map(t => freq(t._2).toDouble).sum / toks.length
    }
    val loDoc = rows.minBy(_.getAs[Double]("surprisal")).getAs[Long]("doc_id")
    val hiDoc = rows.maxBy(_.getAs[Double]("surprisal")).getAs[Long]("doc_id")
    assert(meanFreq(loDoc) >= meanFreq(hiDoc),
      s"surprisal not frequency-monotone at the extremes")
    // order independence: a different shuffle width changes every
    // partial-aggregation grouping; the decimal-mediated sums must not
    // move by a single bit
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val again =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        TextOps.surprisal(spark, sf()).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("surprisal"))
          .toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows.foreach { r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[Double]("surprisal"))
    }
  }

  test("sample_weighted: keep law, length bias, doc-independence") {
    val rows = TrainPrep.weightedSample(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      val u = r.getAs[Double]("u")
      assert(u >= 0.0 && u < 1.0, s"u out of [0,1): $r")
      assert(u < p, s"survivor violates keep law: $r")
      assert(p == math.min(1.0, 0.25 * r.getAs[Long]("n_chars") / 400.0))
    }
    // every p=1 document (n_chars ≥ 1600) survives unconditionally
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").collect()
    val kept = rows.map(_.getAs[Long]("doc_id")).toSet
    docs.filter(_.getAs[Long]("n_chars") >= 1600)
      .foreach(d => assert(kept(d.getAs[Long]("doc_id"))))
    // rate control: E[kept] = Σp; binomial sd = sqrt(Σp(1−p)) — allow 6σ
    val ps = docs.map(d =>
      math.min(1.0, 0.25 * d.getAs[Long]("n_chars") / 400.0))
    val sd = math.sqrt(ps.map(p => p * (1 - p)).sum)
    assert(math.abs(rows.length - ps.sum) <= 6 * sd + 1,
      s"kept ${rows.length} vs expected ${ps.sum} (sd $sd)")
    // the decision is per-document: running on half the corpus keeps
    // exactly the surviving half of the full run's keep set
    val half = TrainPrep.weightedSample(spark, sf())
      .filter(col("doc_id") % 2 === 0).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(half == kept.filter(_ % 2 == 0),
      "keep decision must not depend on other documents")
  }

  test("pack_segments: partitions every document exactly, packs never overflow") {
    val cap = 2048L
    val packs = TrainPrep.packSequences(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("pack_id"), r.getAs[Long]("pack_off"))).toMap
    val segs = TrainPrep.packSegments(spark, sf()).collect()
    assert(segs.nonEmpty)
    // per document: segments cover [start, start+n_tokens) exactly —
    // contiguous, in consecutive packs, first segment at the
    // pack_sequences coordinates
    segs.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, v) =>
      val (shard, n, pack0, off0) = packs(id)
      val inOrder = v.sortBy(_.getAs[Long]("pack_id"))
      assert(inOrder.forall(_.getAs[Int]("shard_id") == shard))
      assert(inOrder.head.getAs[Long]("pack_id") == pack0)
      assert(inOrder.head.getAs[Long]("seg_off") == off0)
      assert(inOrder.map(_.getAs[Long]("seg_len")).sum == n,
        s"doc $id: segments must sum to n_tokens")
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("pack_id") == a.getAs[Long]("pack_id") + 1)
          // a middle segment runs to the pack boundary, the next
          // starts at 0
          assert(a.getAs[Long]("seg_off") + a.getAs[Long]("seg_len") == cap)
          assert(b.getAs[Long]("seg_off") == 0L)
        case _ => ()
      }
      v.foreach { r =>
        val off = r.getAs[Long]("seg_off"); val len = r.getAs[Long]("seg_len")
        assert(off >= 0 && off < cap && len >= 1 && off + len <= cap,
          s"segment out of pack bounds: $r")
      }
    }
    // per (shard, pack): slices tile without overlap, full except the
    // shard's last pack
    segs.groupBy(r => (r.getAs[Int]("shard_id"), r.getAs[Long]("pack_id")))
      .foreach { case ((sh, p), v) =>
        val spans = v.map(r =>
          (r.getAs[Long]("seg_off"),
            r.getAs[Long]("seg_off") + r.getAs[Long]("seg_len")))
          .sortBy(_._1)
        spans.sliding(2).foreach {
          case Array(a, b) => assert(a._2 == b._1, s"gap/overlap in $sh/$p")
          case _ => ()
        }
        val lastPack = segs.filter(_.getAs[Int]("shard_id") == sh)
          .map(_.getAs[Long]("pack_id")).max
        if (p < lastPack)
          assert(spans.head._1 == 0 && spans.last._2 == cap,
            s"non-terminal pack $sh/$p not full")
      }
  }

  test("mix_apply: equalizes source contributions, keep law, determinism") {
    val rate = 0.5
    val rows = TrainPrep.mixApply(spark, sf()).collect()
    assert(rows.nonEmpty)
    val weights = TrainPrep.mixWeights(spark, sf()).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("weight"))).toMap
    rows.foreach { r =>
      val (_, w) = weights(r.getAs[String]("source"))
      assert(r.getAs[Double]("p") == math.min(1.0, rate * w))
      assert(r.getAs[Double]("u") < r.getAs[Double]("p"))
    }
    // each source's expected survivors = n_docs·min(1, rate·weight)
    // ≈ rate·tot/n_sources — the uniform mix; 6σ binomial slack
    val tot = weights.values.map(_._1).sum
    val kept = rows.groupBy(_.getAs[String]("source"))
      .map { case (k, v) => k -> v.length }
    weights.foreach { case (src, (nDocs, w)) =>
      val p = math.min(1.0, rate * w)
      val exp = nDocs * p
      val sd = math.sqrt(nDocs * p * (1 - p))
      assert(math.abs(kept.getOrElse(src, 0) - exp) <= 6 * sd + 1,
        s"$src: kept ${kept.getOrElse(src, 0)} vs expected $exp")
      // and the uniform-mix identity (exact when p < 1): n_docs·rate·
      // weight ≈ rate·tot/n_sources, so every source targets the same
      if (p < 1.0)
        assert(math.abs(exp - rate * tot / weights.size) < 0.01 * exp + 1)
    }
    // same keep set on a second run (no RNG state anywhere)
    val again = TrainPrep.mixApply(spark, sf()).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("mix_apply is ONE corpus scan; weights can be supplied as input") {
    import org.apache.spark.sql.execution.ExplainMode
    // the apply plan scans documents exactly once — the weights leg
    // runs as its own tiny job (ReadSchema = source only) and enters
    // the plan as a literal map, not a second scan + join
    val df = TrainPrep.mixApply(spark, sf())
    val plan = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n$plan")
    assert(!plan.contains("Join"), s"apply side must be join-free:\n$plan")
    // the weights job never touches text: its ReadSchema is source
    val wPlan = TrainPrep.docWeights(spark, sf()).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!wPlan.contains("text"), s"weights leg must not read text:\n$wPlan")
    // production shape: a persisted weights relation supplied by the
    // caller reproduces the same export (mixWeights' own column)
    val supplied = TrainPrep.mixWeights(spark, sf()).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    val viaInput = TrainPrep.mixApply(spark, sf(), weights = Some(supplied))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaInput == df.collect().map(_.getAs[Long]("doc_id")).toSet)
  }

  test("domain_cap: per-source bound, contiguous ranks, WindowGroupLimit") {
    val cap = 15
    val df = TrainPrep.domainCap(spark, sf(), cap = cap)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val perSource = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, v) =>
      val expect = math.min(cap.toLong, perSource(src))
      assert(v.length.toLong == expect,
        s"$src: ${v.length} survivors, want $expect")
      // ranks are exactly 1..expect — rank≤cap, not an arbitrary subset
      assert(v.map(_.getAs[Int]("cap_rank")).sorted.toSeq
        == (1 to expect.toInt))
    }
    // the scale claim: the rank filter must rewrite to WindowGroupLimit
    // so every map task forwards at most cap rows per source into the
    // single exchange
    import org.apache.spark.sql.execution.ExplainMode
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("pipelineExport = pack over the manually-intersected survivors") {
    import graft.ops.{Dedup, Filtering}
    val dir = sf()
    val composed = TrainPrep.pipelineExport(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // recompute the survivor set by hand from the four verdicts
    val keepDedup = Dedup.dedupedCorpus(spark, dir, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepQ = Filtering.qualityFilter(spark, dir)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepLm = graft.ops.LanguageModel.knPerplexity(spark, dir)
      .filter("bucket <> 'tail'")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepSplit = TrainPrep.splitAssign(spark, dir)
      .filter("split = 'train'")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = keepDedup & keepQ & keepLm & keepSplit
    assert(composed.map(_._1) == survivors,
      "the composition must pack exactly the four-way intersection")
    // the LM gate is live at this SF: it removes at least one doc the
    // other three verdicts would have kept (else the wire is vacuous)
    assert((keepDedup & keepQ & keepSplit).diff(keepLm).nonEmpty,
      "perplexity gate dropped nothing — fixture went vacuous")
    // every pack row matches packing the survivor set directly
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id".isin(survivors.toSeq: _*))
    val direct = TrainPrep.packSequencesOf(base)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(composed == direct)
    // the layout is survivor-relative: it differs from the full-corpus
    // layout for any doc that follows a removed one in its shard
    val full = TrainPrep.packSequences(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(composed.exists { case (id, _, _, pid, off) =>
      full(id) != ((pid, off))
    }, "packing survivors must reflow relative to the full corpus")
  }

  test("pipelineExportIndexed: row-identical to the inline export, " +
    "with zero dedup-model re-derivation in the plan") {
    import graft.ops.{ClusterIndex, IndexCommit, KnIndex}
    val dir = sf()
    val mk = (n: String) => {
      val p = java.nio.file.Files.createTempDirectory(s"graft-pex-$n")
      p.toFile.deleteOnExit(); p.toString
    }
    val cidx = mk("cl")
    val kidx = mk("kn")
    IndexCommit.reset(spark, cidx)
    IndexCommit.reset(spark, kidx)
    ClusterIndex.build(spark, dir, cidx)
    KnIndex.build(spark, dir, kidx)
    val indexed = TrainPrep.pipelineExportIndexed(spark, dir, cidx, kidx)
    // same-corpus indexes → the composed export is ROW-IDENTICAL to
    // the inline form (this is what lets the two SparkEntry queries
    // share one oracle)
    val asSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toString).toSet
    assert(asSet(indexed) == asSet(TrainPrep.pipelineExport(spark, dir)))
    // the near-dup keep-set is PROBED from the committed assignment:
    // no exact-Jaccard band-bucket verification anywhere in the plan.
    // (xxhash64 is NOT a usable marker here — the frozen-model KN
    // scoring path carries its 128-bit fingerprint join on xxhash64
    // by design; array_intersect appears ONLY in LSH verification.)
    val plan = indexed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.toLowerCase.contains("array_intersect"),
      "indexed export re-derives the dedup model (array_intersect found)")
  }

  // --- token-budget selection ------------------------------------------

  /** Independent JVM prefix: (doc_id, flesch, n_words, cum) selected
    * under the (flesch desc, doc_id asc) order with inclusive-cum ≤ B.
    */
  private def jvmBudget(budget: Long): Seq[(Long, Double, Int, Long)] = {
    val rows = graft.ops.TextOps.readability(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("flesch"),
        r.getAs[Int]("n_words")))
      .sortBy { case (id, f, _) => (-f, id) }
    var cum = 0L
    rows.flatMap { case (id, f, w) =>
      cum += w
      if (cum <= budget) Some((id, f, w, cum)) else None
    }.toSeq
  }

  test("budget select: bit-exact vs a JVM global-cumsum recompute") {
    val budget = 1000L
    val expected = jvmBudget(budget).toSet
    val got = graft.ops.TrainPrep.budgetSelect(spark, sf(), budget)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("flesch"),
        r.getAs[Int]("n_words"), r.getAs[Long]("cum_tokens"))).toSet
    assert(got == expected,
      "two-level bucket cumsum must equal the global running total")
    // the prefix is MAXIMAL: the next doc in quality order overflows
    val all = jvmBudget(Long.MaxValue)
    if (expected.size < all.size) {
      val next = all(expected.size)
      assert(expected.map(_._4).maxOption.getOrElse(0L) + next._3 > budget)
    }
  }

  test("budget select: smaller budgets select prefixes of larger ones") {
    def sel(b: Long) = graft.ops.TrainPrep.budgetSelect(spark, sf(), b)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val small = sel(500L)
    val large = sel(1500L)
    assert(small.subsetOf(large),
      "budget selection must be prefix-monotone in the budget")
    assert(small.size < large.size, "fixture budgets went vacuous")
  }

  test("budget select: no single-partition stage in the executed plan") {
    import org.apache.spark.sql.execution.ExplainMode
    val df = graft.ops.TrainPrep.budgetSelect(spark, sf())
    df.collect()
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(3000))
  }

  // --- curriculum phases -----------------------------------------------

  test("curriculum: phases equal SQL ntile, order key is the salted hash") {
    val k = 3
    val ordered = graft.ops.TextOps.readability(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("flesch")))
      .sortBy { case (id, f) => (-f, id) }
    val n = ordered.length
    // independent ntile: the first n mod k groups take ceil(n/k) rows
    val base = n / k
    val extra = n % k
    val expectedPhase = ordered.zipWithIndex.map { case ((id, _), i) =>
      val cut = extra * (base + 1)
      id -> (if (i < cut) i / (base + 1) + 1
             else (i - cut) / base + extra + 1)
    }.toMap
    val rows = graft.ops.TrainPrep.curriculumPhases(spark, sf(), k).collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("phase") == expectedPhase(id),
        s"doc $id phase must match ntile($k)")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#curriculum".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("ord_key") == md)
    }
    // contiguity: walking the quality order never decreases the phase
    val phaseInOrder = ordered.map { case (id, _) => expectedPhase(id) }
    assert(phaseInOrder.sameElements(phaseInOrder.sorted))
    assert(rows.map(_.getAs[Int]("phase")).distinct.sorted.toSeq
      == (1 to k), "all phases populated")
  }

  test("curriculum: only the n scalar may plan a single partition") {
    import org.apache.spark.sql.execution.ExplainMode
    val df = graft.ops.TrainPrep.curriculumPhases(spark, sf())
    df.collect()
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the one-row n scalar legitimately prints SinglePartition twice
    // (its partial-agg exchange and the broadcast that attaches it) —
    // same allowance as the KN scoring plan pin; anything more would
    // mean a corpus-wide funnel crept in
    val singles = "SinglePartition".r.findAllIn(plan).size
    assert(singles <= 2,
      s"only the one-row n scalar may funnel: $singles\n${plan.take(3000)}")
    assert(plan.contains("Window"), plan.take(2000))
  }
}
