package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, SimSigIndex}

/** Pins for the embedding near-dup cluster form and its persisted
  * hyperplane-signature index: the identical-vector collapse is
  * exactly equivalent to components over ALL verified pairs (crafted
  * identical classes + zero vectors), the index route equals the
  * one-job cluster form while reading only frozen segments, and the
  * probe equals the one-job pair form restricted to batch × corpus
  * with the batch side broadcast.
  */
class SimSigIndexSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-simsig-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def clusterRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toSet

  test("collapse-first clusters equal components over all verified " +
    "pairs — identical-vector classes cluster, zero vectors stay " +
    "singletons") {
    import spark.implicits._
    // ids 1-3: one identical-vector class; id 4: cosine 0.96 with it
    // (signs identically under every ±1 plane since |x| > |y|, so the
    // banding always surfaces the pair); id 5: orthogonal singleton;
    // ids 6-7: IDENTICAL zero vectors — cosine NaN with everything
    // including each other, so they must NOT be clustered together
    // despite being bit-identical
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (4L, Seq(0.96, 0.28)), (5L, Seq(0.0, 1.0)),
      (6L, Seq(0.0, 0.0)), (7L, Seq(0.0, 0.0))
    ).toDF("vec_id", "v")
    val got = clusterRows(
      Similarity.cosineNearDupClustersDf(emb, threshold = 0.9))
    // direct derivation: union-find over the verified pair graph of
    // the UNCOLLAPSED relation + cosine-1 intra-class edges implied
    // by identity (1-2, 1-3 are real verified pairs here too)
    val pairs = Similarity.cosineNearDupPairsDf(emb, 0.9, 64, 4)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map((1L to 7L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (1L to 7L).map { id =>
      val c = find(id); (id, c, id == c)
    }.toSet
    assert(got == expected,
      s"collapse-first must equal the all-pairs derivation: $got vs $expected")
    assert(got.count { case (_, c, _) => c == 1L } == 4,
      "the identical class and its verified neighbor must share one label")
    assert(got.contains((6L, 6L, true)) && got.contains((7L, 7L, true)),
      "identical ZERO vectors must stay separate singletons")
  }

  test("clusters from the committed index equal the one-job cluster " +
    "form; the plan reads only frozen segments and never re-signs") {
    val emb = Similarity.loadWithTwins(spark, sf())
    val idx = tmp("clusters")
    SimSigIndex.build(spark, idx, emb.filter(col("vec_id") % 3 =!= 0))
    SimSigIndex.append(spark, idx, emb.filter(col("vec_id") % 3 === 0))
    val viaIndex = SimSigIndex.clusters(spark, idx, threshold = 0.9)
    val plan = viaIndex.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("embeddings.parquet"),
      "the index route must not re-read the corpus")
    plan.linesIterator.filter(_.trim.startsWith("Location:")).foreach(l =>
      assert(l.contains("/sigs") || l.contains("/vecs"),
        s"unexpected scan in index-cluster plan: $l"))
    // signing projects against 64 LITERAL coefficient arrays — a plan
    // that re-signs would carry dot_product(<vec>, [±1.0, ...]) calls;
    // the frozen route only computes dot_product(v, v) (the zero-norm
    // guard) and cosine_sim verification
    assert(!"""dot_product\([^,)]*, \[""".r.findFirstIn(plan).isDefined,
      "the index route must never re-project against the hyperplanes")
    val got = clusterRows(viaIndex)
    val expected = clusterRows(
      Similarity.cosineNearDupClustersDf(emb, threshold = 0.9))
    assert(expected.exists(r => !r._3),
      "fixture must contain non-singleton clusters (planted twins)")
    assert(got == expected,
      "index-route clusters must equal the one-job form row-for-row")
  }

  test("probe equals the one-job pair form restricted to batch x " +
    "corpus; the batch side is broadcast") {
    val emb = Similarity.loadWithTwins(spark, sf())
    val isBatch = col("vec_id") % 100 === 7 &&
      col("vec_id") < graft.ops.PerceptualHash.TwinOffset
    val idx = tmp("probe")
    SimSigIndex.build(spark, idx,
      emb.filter(!isBatch && col("vec_id") % 3 =!= 0))
    SimSigIndex.append(spark, idx,
      emb.filter(!isBatch && col("vec_id") % 3 === 0))
    val probeDf = SimSigIndex.probe(spark, idx, emb.filter(isBatch))
    val got = probeDf.collect()
      .map(r => (r.getAs[Long]("vec_new"), r.getAs[Long]("vec_idx")) ->
        r.getAs[Double]("score")).toMap
    // one-job expectation: the full pair form's rows with one side in
    // the batch carve, reoriented (vec_new = the batch member)
    val batchIds = emb.filter(isBatch).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val expected = Similarity
      .cosineNearDupPairsDf(emb, 0.9, 64, 4).collect()
      .flatMap { r =>
        val (a, b, sc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        if (batchIds(a) && !batchIds(b)) Some((a, b) -> sc)
        else if (batchIds(b) && !batchIds(a)) Some((b, a) -> sc)
        else None
      }.toMap
    assert(expected.nonEmpty,
      "fixture must pair batch originals with their corpus twins")
    assert(got == expected,
      "probe must equal the one-job pairs restricted to batch x corpus")
    val plan = probeDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      "the batch side must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the committed relations must never shuffle for a batch probe")
  }

  test("hot-band guard: star-cap bounds candidates linearly where the " +
    "unguarded join is quadratic; clusters unchanged on a dense " +
    "clique; guardDrift reports the buckets") {
    import spark.implicits._
    // a dense region of NEAR-identical (never bit-identical, so the
    // collapse can't see them) vectors: all sign identically on every
    // md5 plane (the 1e-6 perturbation never flips sign against the
    // unit first coordinate), so the whole region lands in ONE bucket
    // per band — the embedding analog of a hot shingle
    def dense(n: Int) =
      (1L to n.toLong).map(i => (i, Seq(1.0, i * 1e-6, 0.0)))
    val bg = (1000L to 1019L).map(i =>
      (i, Seq(-1.0, 0.1 * (i - 1000), 1.0)))
    def emb(n: Int) = (dense(n) ++ bg).toDF("vec_id", "v")
    def candidates(n: Int, cap: Option[Long]): Long = {
      val scope = new graft.ops.CacheScope
      try Similarity.bandedCandidateIds(
        Similarity.lshSignaturesDf(emb(n), 64), 64, 4, cap, scope).count()
      finally scope.release()
    }
    // unguarded: C(n,2) within the dense bucket — QUADRATIC (4.0x
    // candidates for 2x vectors); the planted region is exactly the
    // shape SCALE_r12 measured going 127x on text before widening
    val un200 = candidates(200, None)
    val un400 = candidates(400, None)
    assert(un200 >= 19900L && un400 >= 79800L,
      s"dense bucket must all-pair unguarded: $un200 / $un400")
    assert(un400.toDouble / un200 > 3.5,
      "fixture must demonstrate quadratic growth unguarded")
    // star-capped: n-1 member->rep candidates — LINEAR (2.0x for 2x)
    val g200 = candidates(200, Some(50L))
    val g400 = candidates(400, Some(50L))
    assert(g400 <= 1000L,
      s"capped candidates must stay region-linear: $g400")
    assert(g400.toDouble / g200 < 2.5,
      s"capped growth must be linear: $g200 -> $g400")
    // on a true near-dup clique the star verifies edge-for-edge, so
    // CLUSTERS are unchanged under the cap (the guard's degrade
    // contract: bounded candidates, never different answers here)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("component_id"),
        r.getAs[Boolean]("keep"))).toSeq.sorted
    assert(
      rows(Similarity.cosineNearDupClustersDf(emb(400), 0.9, 64, 4,
        maxBandFreq = Some(50L))) ==
      rows(Similarity.cosineNearDupClustersDf(emb(400), 0.9, 64, 4)),
      "star-capped clusters must equal unguarded on a dense clique")
    // drift telemetry from the COMMITTED index names the hot buckets
    // and their unguarded pair volume — the turn-the-cap-on signal
    val idx = tmp("drift")
    SimSigIndex.build(spark, idx, emb(400), planes = 64)
    val drift = SimSigIndex.guardDrift(spark, idx, maxBandFreq = 50L)
      .collect().map(r => (r.getAs[Long]("bucket_size"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("worst_case_pairs")))
    assert(drift.exists { case (sz, nk, wc) =>
      sz >= 400L && wc == nk * sz * (sz - 1) / 2 },
      s"guardDrift must report the dense region's buckets: ${drift.toSeq}")
    assert(SimSigIndex.guardDrift(spark, idx, maxBandFreq = 1000L)
      .count() == 0, "no bucket exceeds a cap above the region size")
  }

  test("probe-side hot-band guard: a batch vector landing in a dense " +
    "committed region pulls one candidate, not the region; cold " +
    "pairs unchanged; the committed GuardMeta default applies") {
    import spark.implicits._
    // committed corpus: the 400-member dense region (identical
    // signatures — one bucket per band) plus cold background vectors
    val dense = (1L to 400L).map(i => (i, Seq(1.0, i * 1e-6, 0.0)))
    val bg = (1000L to 1019L).map(i =>
      (i, Seq(-1.0, 0.1 * (i - 1000), 1.0)))
    val idx = tmp("probeguard")
    SimSigIndex.build(spark, idx, (dense ++ bg).toDF("vec_id", "v"),
      planes = 64)
    // batch: one vector inside the dense region, one near the cold
    // background family
    val batch = Seq((5000L, Seq(1.0, 0.002, 0.0)),
      (5001L, Seq(-1.0, 0.0, 1.0))).toDF("vec_id", "v")
    def ids(cap: Option[Long]) = SimSigIndex.probe(
      spark, idx, batch, 0.9, 4, maxBandFreq = cap)
      .collect().map(r => (r.getAs[Long]("vec_new"),
        r.getAs[Long]("vec_idx"))).toSet
    val un = ids(None)
    val g = ids(Some(50L))
    assert(un.count(_._1 == 5000L) >= 400,
      s"unguarded probe must pull the whole dense region: ${un.size}")
    assert(g.filter(_._1 == 5000L) == Set((5000L, 1L)),
      s"guarded probe must keep only the region's min-id rep: $g")
    assert(g.subsetOf(un), "guarded output must be a verified subset")
    assert(g.filter(_._1 == 5001L) == un.filter(_._1 == 5001L) &&
      un.exists(_._1 == 5001L),
      "cold-bucket pairs must be untouched by the cap")
    // build-owned default: None resolves it, GuardMeta.Off forces off
    SimSigIndex.build(spark, idx, (dense ++ bg).toDF("vec_id", "v"),
      planes = 64, guardMaxBandFreq = Some(50L))
    assert(ids(None) == g,
      "probe must resolve the committed default when no knob is given")
    assert(ids(Some(graft.ops.GuardMeta.Off)) == un,
      "GuardMeta.Off must force the unguarded read")
  }

  test("clusters are crash-window safe: a live duplicate segment " +
    "changes no cluster row and duplicates none (multiset compare)") {
    val emb = Similarity.loadWithTwins(spark, sf())
    val idx = tmp("dupseg")
    SimSigIndex.build(spark, idx, emb)
    def rows() = SimSigIndex.clusters(spark, idx, threshold = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("component_id"),
        r.getAs[Boolean]("keep"))).toSeq.sorted
    val before = rows()
    // a replayed append whose ledger marker was never written leaves
    // an exact duplicate segment live until compaction — both vecs
    // and sigs rows exist twice, so an unguarded join re-expands 4x
    SimSigIndex.append(spark, idx, emb.filter(col("vec_id") % 4 === 0))
    assert(rows() == before,
      "duplicate live segment must not change or DUPLICATE cluster " +
        "rows — a set compare would hide the duplication")
  }

  test("probe rejects an oversized batch with the slice-the-batch " +
    "remedy instead of an exchange OOM") {
    import spark.implicits._
    val idx = tmp("guard")
    SimSigIndex.build(spark, idx,
      Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v"))
    val batch = (100L to 110L).map(i => (i, Seq(1.0, 0.0)))
      .toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      SimSigIndex.probe(spark, idx, batch, maxBatchRows = 5L)
    }
    assert(e.getMessage.contains("Slice the input"),
      s"guard message must name the remedy: ${e.getMessage}")
    assert(SimSigIndex.probe(spark, idx, batch.limit(3), maxBatchRows = 5L)
      .count() > 0)
  }

  test("an uncommitted segment is invisible; append respects the " +
    "frozen plane count") {
    import spark.implicits._
    val idx = tmp("torn")
    val base = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    SimSigIndex.build(spark, idx, base, planes = 16)
    assert(SimSigIndex.numPlanes(spark, idx) == 16)
    val batch = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    def probed() = SimSigIndex.probe(spark, idx, batch, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed() == Set((100L, 1L)))
    // a writer that reserved + staged but died before the marker
    val stale = graft.ops.IndexCommit.reserve(spark, idx)
    Seq((2L, 0L)).toDF("vec_id", "sig").write.parquet(
      s"${graft.ops.IndexCommit.versionDir(idx, stale)}/sigs")
    Seq((2L, Seq(1.0, 0.0))).toDF("vec_id", "v").write.parquet(
      s"${graft.ops.IndexCommit.versionDir(idx, stale)}/vecs")
    assert(probed() == Set((100L, 1L)),
      "a staged-but-uncommitted segment must be invisible")
    // a real append lands past the dead reservation and answers
    SimSigIndex.append(spark, idx, Seq((3L, Seq(1.0, 0.0)))
      .toDF("vec_id", "v"))
    assert(probed() == Set((100L, 1L), (100L, 3L)),
      "the appended segment must answer probes")
  }
}
