package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.ops.{IndexCommit, PerceptualHash, SigIndex}

/** Pins for the persisted perceptual-signature index: probe over
  * build+append segments equals a brute-force batch×corpus Hamming
  * sweep (so the segment union and the banding are both load-bearing),
  * the probe never decodes the corpus (its plan reads only the frozen
  * sigs parquet), and an uncommitted segment is invisible (marker
  * protocol).
  */
class SigIndexSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-sigidx-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_new"),
      r.getAs[Long]("doc_idx"), r.getAs[Int]("hamming"))).toSet

  test("probe over build+append equals brute force; corpus never " +
    "decoded on the probe path") {
    val all = PerceptualHash.signatures(
      PerceptualHash.syntheticImages(spark, sf()))
    val isBatch = col("doc_id") % 10 === 0
    val idx = tmp("probe")
    SigIndex.build(spark, idx,
      all.filter(!isBatch && col("doc_id") % 3 =!= 0))
    SigIndex.append(spark, idx,
      all.filter(!isBatch && col("doc_id") % 3 === 0))
    val got = pairs(SigIndex.probe(spark, idx, all.filter(isBatch)))
    val sigMap = all.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    val expected = (for {
      (a, sa) <- sigMap if a % 10 == 0
      (b, sb) <- sigMap if b % 10 != 0
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty,
      "fixture must contain cross-carve near-dup pairs")
    assert(got == expected,
      "probe must equal the brute-force batch x corpus sweep")
    // an appended-segment pair must be present, or the segment union
    // is untested
    assert(expected.exists(_._2 % 3 == 0),
      "fixture must pair the batch against the APPENDED carve too")
    // the probe's index side is the frozen sigs parquet only: with a
    // materialized batch relation, no scan of documents.parquet (the
    // decode source) remains in the plan
    import spark.implicits._
    val batchSigs = all.filter(isBatch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("doc_id", "sig")
    val plan = SigIndex.probe(spark, idx, batchSigs)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("documents.parquet"),
      "probe must not re-decode the corpus")
    plan.linesIterator.filter(_.trim.startsWith("Location:")).foreach(l =>
      assert(l.contains("/sigs"), s"unexpected probe-side scan: $l"))
    // the batch side carries an explicit broadcast hint: at corpus
    // scale a size-estimator miss would otherwise sort-merge the FULL
    // banded index by key — the plan must hash-join with the batch as
    // the build side
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft"),
      "probe must broadcast the batch bands")
    assert(!plan.contains("SortMergeJoin"),
      "the committed bands must never shuffle for a batch probe")
  }

  test("clusters from the committed index equal the decode-side " +
    "cluster form; the plan never touches payload bytes") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"),
        r.getAs[Boolean]("keep"))).toSet
    // video: the family member with planted twins, so components are
    // non-trivial (clusters of ≥ 2 exist by construction)
    val sigs = PerceptualHash.videoSignatures(
      PerceptualHash.syntheticVideos(spark, sf()))
    val idx = tmp("clusters")
    SigIndex.build(spark, idx, sigs.filter(col("doc_id") % 3 =!= 0))
    SigIndex.append(spark, idx, sigs.filter(col("doc_id") % 3 === 0))
    val viaIndex = SigIndex.clusters(spark, idx)
    val plan = viaIndex.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("documents.parquet") && !plan.contains("payload"),
      "the index route must never re-decode the corpus")
    plan.linesIterator.filter(_.trim.startsWith("Location:")).foreach(l =>
      assert(l.contains("/sigs"), s"unexpected scan in cluster plan: $l"))
    val got = rows(viaIndex)
    val expected = rows(PerceptualHash.videoClusters(spark, sf()))
    assert(expected.exists(r => !r._3),
      "fixture must contain non-singleton clusters")
    assert(got == expected,
      "index-route clusters must equal the decode form row-for-row")
  }

  test("media hot-band guard: star-cap keeps clusters exact on a " +
    "Hamming-clique, bounds candidates where distinct sigs share " +
    "bands, guardDrift reports from frozen sigs") {
    import spark.implicits._
    // a Hamming-CLIQUE of 17 DISTINCT signatures (base + 16 single-
    // low-bit flips, pairwise Hamming <= 2): identical band keys in
    // bands 1-3, so three hot buckets of 17 — the template-family
    // shape the identical-signature collapse cannot touch
    val base = 1L << 40
    val clique = (base +: (0 until 16).map(a => base ^ (1L << a)))
      .zipWithIndex.map { case (sg, i) => (i.toLong, sg) }
    val cliqueDf = clique.toDF("doc_id", "sig")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"),
        r.getAs[Boolean]("keep"))).toSeq.sorted
    val un = rows(graft.ops.PerceptualHash
      .nearDupClustersOfSigs(cliqueDf, maxHamming = 3))
    assert(un.forall(_._2 == 0L), "fixture must be one clique")
    assert(rows(graft.ops.PerceptualHash.nearDupClustersOfSigs(
      cliqueDf, maxHamming = 3, maxBandFreq = Some(5L))) == un,
      "star-capped clusters must equal unguarded on a Hamming-clique")
    // quadratic shape: n DISTINCT sigs = 0..n-1 share bands 1-3
    // (keys 0) — candidates C(n,2) unguarded, linear under the cap
    // (the shared Similarity machinery is the implementation, so the
    // counts pin the media banding's equivalence to it)
    def cands(n: Int, cap: Option[Long]): Long = {
      val scope = new graft.ops.CacheScope
      try graft.ops.Similarity.bandedCandidateIds(
        (0L until n.toLong).map(i => (i, i)).toDF("vec_id", "sig"),
        64, 4, cap, scope).count()
      finally scope.release()
    }
    assert(cands(400, None) >= 79800L && cands(400, Some(50L)) <= 1200L,
      "cap must bound the shared-band candidate blow-up")
    // guarded pairs are a subset of unguarded (exact verification
    // either way — the cap only drops candidates, never invents)
    val sigs400 = (0L until 400L).map(i => (i, i)).toDF("doc_id", "sig")
    def pairSet(cap: Option[Long]) = graft.ops.PerceptualHash
      .nearDupPairsOfSigs(sigs400, 3, new graft.ops.CacheScope, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairSet(Some(50L))
    assert(capped.subsetOf(pairSet(None)) && capped.nonEmpty,
      "capped pairs must be a verified subset")
    // drift telemetry from the committed index, payload-free
    val idx = tmp("mmdrift")
    SigIndex.build(spark, idx, sigs400)
    val drift = SigIndex.guardDrift(spark, idx, maxBandFreq = 50L)
      .collect().map(r => (r.getAs[Long]("bucket_size"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("worst_case_pairs")))
    assert(drift.exists { case (sz, nk, wc) =>
      sz == 400L && nk == 3L && wc == nk * sz * (sz - 1) / 2 },
      s"guardDrift must report the three shared-band buckets: ${drift.toSeq}")
  }

  test("probe-side hot-band guard: a batch clip hitting a hot corpus " +
    "bucket pulls only the bucket's min-id rep; cold-bucket pairs " +
    "survive untouched; GuardMeta default applies and is overridable") {
    import spark.implicits._
    // corpus: 400 DISTINCT sigs 0..399 share the band 1-3 buckets
    // (keys 0) — the template-family shape the identical-sig collapse
    // can't touch — plus one far-away cold doc 500
    val corpus = ((0L until 400L).map(i => (i, i)) :+ (500L, 1L << 40))
      .toDF("doc_id", "sig")
    val idx = tmp("probeguard")
    SigIndex.build(spark, idx, corpus)
    // batch doc 1000 (sig 0): band 0 bucket {0} cold, bands 1-3 hot
    val batch = Seq((1000L, 0L)).toDF("doc_id", "sig")
    val un = pairs(SigIndex.probe(spark, idx, batch))
    val g = pairs(SigIndex.probe(spark, idx, batch,
      maxBandFreq = Some(50L)))
    assert(un.contains((1000L, 3L, 2)) && un.size > 10,
      s"unguarded probe must pull the hot bucket's members: $un")
    // band 0 key 0 is the COLD bucket {0, 500} (sig 1<<40 has zero
    // low bits), so both its members pair; the hot bands 1-3
    // contribute only rep 0
    assert(g == Set((1000L, 0L, 0), (1000L, 500L, 1)),
      s"guarded probe must keep only cold buckets + the hot rep: $g")
    assert(g.subsetOf(un), "guarded output must be a verified subset")
    // a batch clip reaching corpus docs through COLD buckets keeps
    // those pairs even when its other bands are hot: sig (1<<40)|1
    // hits {1} via band 0 and {500} via band 2 (both cold), and the
    // hot bands 1/3 contribute only rep 0
    val mixed = Seq((1001L, (1L << 40) | 1L)).toDF("doc_id", "sig")
    assert(pairs(SigIndex.probe(spark, idx, mixed,
      maxBandFreq = Some(50L))) ==
      Set((1001L, 0L, 2), (1001L, 1L, 1), (1001L, 500L, 1)),
      "cold-bucket pairs must survive a cap on the other bands")
    // the committed GuardMeta default: build-owned, None resolves it,
    // Some(GuardMeta.Off) forces unguarded, a rebuild without clears
    SigIndex.build(spark, idx, corpus, guardMaxBandFreq = Some(50L))
    assert(graft.ops.GuardMeta.get(spark, idx) == Some(50L))
    assert(pairs(SigIndex.probe(spark, idx, batch)) == g,
      "probe must resolve the committed default when no knob is given")
    assert(pairs(SigIndex.probe(spark, idx, batch,
      maxBandFreq = Some(graft.ops.GuardMeta.Off))) == un,
      "GuardMeta.Off must force the unguarded read")
    assert(SigIndex.clusters(spark, idx).count() == 401L,
      "clusters under the default cap still label every doc")
    SigIndex.build(spark, idx, corpus)
    assert(graft.ops.GuardMeta.get(spark, idx).isEmpty &&
      pairs(SigIndex.probe(spark, idx, batch)) == un,
      "a rebuild without a guard must clear the predecessor's default")
  }

  test("clusters are crash-window safe: a live duplicate segment " +
    "changes no cluster row and duplicates none (multiset compare)") {
    val sigs = PerceptualHash.videoSignatures(
      PerceptualHash.syntheticVideos(spark, sf()))
    val idx = tmp("dupseg")
    SigIndex.build(spark, idx, sigs)
    def rows() = SigIndex.clusters(spark, idx).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"),
        r.getAs[Boolean]("keep"))).toSeq.sorted
    val before = rows()
    // a replayed append whose ledger marker was never written leaves
    // an exact duplicate segment live until compaction
    SigIndex.append(spark, idx, sigs.filter(col("doc_id") % 4 === 0))
    assert(rows() == before,
      "duplicate live segment must not change or DUPLICATE cluster " +
        "rows — a set compare would hide the duplication")
  }

  test("probe rejects an oversized batch with the slice-the-batch " +
    "remedy instead of an exchange OOM") {
    import spark.implicits._
    val idx = tmp("guard")
    SigIndex.build(spark, idx, Seq((1L, 0L)).toDF("doc_id", "sig"))
    val batch = (100L to 110L).map((_, 0L)).toDF("doc_id", "sig")
    val e = intercept[IllegalArgumentException] {
      SigIndex.probe(spark, idx, batch, maxBatchRows = 5L)
    }
    assert(e.getMessage.contains("Slice the input"),
      s"guard message must name the remedy: ${e.getMessage}")
    // a sized batch passes under the same ceiling; ceiling <= 0 opts out
    assert(pairs(SigIndex.probe(spark, idx, batch.limit(3),
      maxBatchRows = 5L)).nonEmpty)
    assert(pairs(SigIndex.probe(spark, idx, batch,
      maxBatchRows = 0L)).nonEmpty)
  }

  test("an uncommitted segment is invisible (marker protocol)") {
    import spark.implicits._
    val idx = tmp("torn")
    SigIndex.build(spark, idx, Seq((1L, 0L)).toDF("doc_id", "sig"))
    val batch = Seq((100L, 0L)).toDF("doc_id", "sig")
    assert(pairs(SigIndex.probe(spark, idx, batch)) == Set((100L, 1L, 0)))
    // a writer that reserved + staged but died before the marker
    val stale = IndexCommit.reserve(spark, idx)
    Seq((2L, 0L)).toDF("doc_id", "sig")
      .write.parquet(s"${IndexCommit.versionDir(idx, stale)}/sigs")
    assert(pairs(SigIndex.probe(spark, idx, batch)) == Set((100L, 1L, 0)),
      "a staged-but-uncommitted segment must be invisible")
    // ...and a real append lands past the dead reservation
    SigIndex.append(spark, idx, Seq((3L, -1L)).toDF("doc_id", "sig"))
    assert(pairs(SigIndex.probe(spark, idx, batch)) == Set((100L, 1L, 0)),
      "sig -1 is Hamming 64 from 0 — never a candidate")
    assert(pairs(SigIndex.probe(spark, idx,
      Seq((200L, -1L)).toDF("doc_id", "sig"))) == Set((200L, 3L, 0)),
      "the appended segment must answer probes")
  }

  test("StreamingSigDedup: e2e memory stream, batch-only decode, " +
    "replay-idempotent output") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingSigDedup
    // corpus: the %10≠0 images, frozen as signatures
    val imgs = PerceptualHash.syntheticImages(spark, sf())
    val idx = tmp("stream-idx")
    SigIndex.build(spark, idx, PerceptualHash.signatures(
      imgs.filter(col("doc_id") % 10 =!= 0)))
    val out = tmp("stream-out")
    val ckpt = tmp("stream-ckpt")
    // stream: the %10=0 clips as (doc_id, payload) micro-batches
    val batchRows = imgs.filter(col("doc_id") % 10 === 0)
      .as[(Long, Array[Byte])].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    // ProcessingTime(0): AvailableNow would terminate after draining
    // the FIRST addData, silently skipping the second micro-batch
    val q = StreamingSigDedup.probeStream(
      input.toDF().toDF("doc_id", "payload"), idx, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(batchRows.take(batchRows.size / 2))
    q.processAllAvailable()
    input.addData(batchRows.drop(batchRows.size / 2))
    q.processAllAvailable()
    q.stop()
    val got = StreamingSigDedup.pairs(spark, out)
      .select("doc_new", "doc_idx", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force expectation over the same signatures
    val sigMap = PerceptualHash.signatures(imgs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      (a, sa) <- sigMap if a % 10 == 0
      (b, sb) <- sigMap if b % 10 != 0
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty && got == expected,
      s"streamed pairs must equal brute force: $got vs $expected")
    // at-least-once replay: re-running a batch id overwrites its
    // directory with the same rows, never appends duplicates
    StreamingSigDedup.applyBatch(
      spark.createDataFrame(batchRows.take(batchRows.size / 2))
        .toDF("doc_id", "payload"), idx, out, 3, 0L)
    val replayed = StreamingSigDedup.pairs(spark, out)
      .select("doc_new", "doc_idx", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(replayed.length == replayed.toSet.size &&
      replayed.toSet == expected,
      "a replayed micro-batch must not duplicate pairs")
  }
}
