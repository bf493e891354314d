package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{IndexCommit, LshIndex, PerceptualHash, SigIndex,
  Similarity, SimSigIndex}
import graft.streaming.{StreamingDedup, StreamingSigDedup,
  StreamingSimIngest}

/** Exactly-once ingestion pins for the segment-append indexes
  * (r13 verdict #3): each `maintainStream` folds batches into its
  * index under the batch-id ledger — a replayed id is a no-op, and
  * the crash-window replay (marker removed after a committed append)
  * degrades to a duplicate segment whose extra candidates never
  * change verified answers. Plus the opt-in guard-refresh cadence on
  * [[StreamingDedup.probeStream]] (verdict #6).
  */
class IngestStreamsSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-ingest-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def rmMarker(root: String, batchId: Long): Unit = {
    val f = new java.io.File(s"$root/stream_ledger/$batchId")
    assert(f.exists(), s"ledger marker $f should exist")
    assert(f.delete())
  }

  test("LshIndex maintainStream: e2e real stream folds batches into " +
    "the index; replay is a ledger no-op; crash-window replay is " +
    "content-invisible") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = tmp("lsh")
    LshIndex.build(spark, sf(), idx,
      docFilter = Some(col("doc_id") % 10 =!= 0))
    val ingest = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    val rows = ingest.as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingDedup.maintainStream(
      input.toDF().toDF("doc_id", "text"), idx, tmp("lshck"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(rows.take(rows.size / 2))
    q.processAllAvailable()
    input.addData(rows.drop(rows.size / 2))
    q.processAllAvailable()
    q.stop()
    val after = IndexCommit.committedIds(spark, idx)
    assert(after.size == 3, s"build + 2 streamed segments: $after")
    // the ingested docs are now part of the corpus: probing exact
    // copies under fresh ids pairs them at jaccard 1
    val twinBatch = ingest
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    // MULTISET (sorted Seq), not Set: the crash-window duplicate
    // segment must not duplicate probe OUTPUT ROWS through the sets
    // join — the per-pair dedup in LshIndex.probe is what this pins
    def probed() = LshIndex.probe(spark, idx, twinBatch, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val pairs0 = probed()
    assert(pairs0 == pairs0.distinct, "probe rows must be unique")
    val paired = pairs0.filter { case (n, i) => n - 40000000L == i }
    assert(paired.nonEmpty,
      "streamed-in docs must answer probes as corpus members")
    // replay with the ledger intact: nothing changes
    StreamingDedup.applyIngestBatch(
      spark.createDataFrame(rows.take(rows.size / 2))
        .toDF("doc_id", "text"), idx, 0L)
    assert(IndexCommit.committedIds(spark, idx) == after,
      "a ledgered batch id must skip the append entirely")
    // crash-window replay (marker lost after the append committed):
    // a duplicate segment lands, but verified answers are unchanged
    rmMarker(idx, 0L)
    StreamingDedup.applyIngestBatch(
      spark.createDataFrame(rows.take(rows.size / 2))
        .toDF("doc_id", "text"), idx, 0L)
    assert(IndexCommit.committedIds(spark, idx).size == 4,
      "the crash-window replay stages a duplicate segment")
    assert(probed() == pairs0,
      "duplicate segments may inflate candidates, never answers — " +
        "and never duplicate output rows")
  }

  test("SigIndex maintainStream: batch-side decode ingestion, ledger " +
    "replay no-op, crash-window replay content-invisible") {
    val imgs = PerceptualHash.syntheticImages(spark, sf())
    val idx = tmp("sig")
    SigIndex.build(spark, idx, PerceptualHash.signatures(
      imgs.filter(col("doc_id") % 10 =!= 0)))
    val clips = imgs.filter(col("doc_id") % 10 === 0)
    // two synchronous micro-batches through the foreachBatch body
    StreamingSigDedup.applyIngestBatch(
      clips.filter(col("doc_id") % 20 === 0), idx, 0L)
    StreamingSigDedup.applyIngestBatch(
      clips.filter(col("doc_id") % 20 =!= 0), idx, 1L)
    val after = IndexCommit.committedIds(spark, idx)
    assert(after.size == 3)
    // ingested clips answer probes: identical payloads under new ids
    // hit at Hamming 0
    val twinSigs = PerceptualHash.signatures(clips)
      .select((col("doc_id") + 40000000L).as("doc_id"), col("sig"))
    def probed() = SigIndex.probe(spark, idx, twinSigs)
      .filter(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs0 = probed()
    assert(pairs0.exists { case (n, i) => n - 40000000L == i },
      "streamed-in clips must answer probes as corpus members")
    StreamingSigDedup.applyIngestBatch(
      clips.filter(col("doc_id") % 20 === 0), idx, 0L)
    assert(IndexCommit.committedIds(spark, idx) == after)
    rmMarker(idx, 0L)
    StreamingSigDedup.applyIngestBatch(
      clips.filter(col("doc_id") % 20 === 0), idx, 0L)
    assert(IndexCommit.committedIds(spark, idx).size == 4)
    assert(probed() == pairs0,
      "duplicate signature segments must not change verified pairs")
  }

  test("StreamingSimIngest: ledger replay no-op, crash-window replay " +
    "content-invisible") {
    val emb = Similarity.load(spark, sf())
    val idx = tmp("sim")
    SimSigIndex.build(spark, idx, emb.filter(col("vec_id") % 10 =!= 0))
    val batch = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id", "v")
    StreamingSimIngest.applyBatch(batch, idx, 0L)
    val after = IndexCommit.committedIds(spark, idx)
    assert(after.size == 2)
    val twinBatch = batch
      .select((col("vec_id") + 40000000L).as("vec_id"), col("v"))
    // multiset: duplicate vecs segments must not duplicate probe rows
    def probed() = SimSigIndex.probe(spark, idx, twinBatch, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val pairs0 = probed()
    assert(pairs0 == pairs0.distinct, "probe rows must be unique")
    assert(pairs0.exists { case (n, i) => n - 40000000L == i },
      "streamed-in vectors must answer probes as corpus members")
    StreamingSimIngest.applyBatch(batch, idx, 0L)
    assert(IndexCommit.committedIds(spark, idx) == after,
      "a ledgered batch id must skip the append")
    rmMarker(idx, 0L)
    StreamingSimIngest.applyBatch(batch, idx, 0L)
    assert(IndexCommit.committedIds(spark, idx).size == 3)
    assert(probed() == pairs0,
      "duplicate vector segments must not change verified pairs")
  }

  test("LshIndex.compact: one full segment supersedes the deltas " +
    "atomically — probe rows identical (multiset), superseded-vacuum " +
    "reclaims, killed compact invisible") {
    val idx = tmp("lshcompact")
    LshIndex.build(spark, sf(), idx,
      docFilter = Some(col("doc_id") % 10 =!= 0))
    val ingest = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    LshIndex.append(spark, idx, ingest.filter(col("doc_id") % 20 === 0))
    LshIndex.append(spark, idx, ingest.filter(col("doc_id") % 20 =!= 0))
    val twinBatch = ingest
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    // MULTISET of probe rows: a compact that left deltas visible next
    // to the full segment would DUPLICATE rows through the sets join
    def probed() = LshIndex.probe(spark, idx, twinBatch, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val before = probed()
    assert(before.nonEmpty && before == before.distinct,
      "pre-compact probe must be duplicate-free")
    // killed compact: reserve + stage + _FULL, no commit marker
    val stale = IndexCommit.reserve(spark, idx)
    val staleDir = IndexCommit.versionDir(idx, stale)
    spark.range(1).selectExpr("id as doc_id", "id as band", "id as key")
      .write.parquet(s"$staleDir/bands")
    IndexCommit.markFull(spark, idx, stale)
    assert(probed() == before,
      "a staged-but-uncommitted full segment must be invisible")
    val fullId = LshIndex.compact(spark, idx)
    assert(IndexCommit.liveIds(spark, idx) == Seq(fullId),
      "after compact exactly one live segment remains")
    assert(probed() == before,
      "compact must not change probe rows (or duplicate them)")
    // an append after the compact stays live alongside the full seg
    // (vocabulary-unique text: must not pair with the twin batch)
    LshIndex.append(spark, idx, {
      import spark.implicits._
      Seq((999999999L, "qq0 qq1 qq2 qq3 qq4 qq5")).toDF("doc_id", "text")
    })
    assert(IndexCommit.liveIds(spark, idx).size == 2)
    assert(probed() == before)
    // superseded-only vacuum: old deltas reclaimed, the full segment
    // and the post-compact delta stay, answers unchanged
    val dropped = IndexCommit.vacuumSuperseded(spark, idx, keepGenerations = 0)
    assert(dropped.nonEmpty && !dropped.contains(fullId))
    assert(probed() == before,
      "vacuumSuperseded must never touch live segments")
  }

  test("in-stream compact cadence bounds live segments; SigIndex and " +
    "SimSigIndex compacts preserve probe answers") {
    // LSH ingestion at maxSegments=3: build + 2 appends trip the
    // cadence inside the third batch's apply
    val idx = tmp("lshcadence")
    LshIndex.build(spark, sf(), idx,
      docFilter = Some(col("doc_id") % 10 =!= 0))
    val ingest = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    StreamingDedup.applyIngestBatch(
      ingest.filter(col("doc_id") % 20 === 0), idx, 0L,
      maxSegments = Some(3), vacuumKeepGens = Some(0))
    assert(IndexCommit.liveIds(spark, idx).size == 2,
      "below the cadence nothing compacts")
    StreamingDedup.applyIngestBatch(
      ingest.filter(col("doc_id") % 20 =!= 0), idx, 1L,
      maxSegments = Some(3), vacuumKeepGens = Some(0))
    assert(IndexCommit.liveIds(spark, idx).size == 1,
      "the third live segment must trip the compact")
    assert(IndexCommit.committedIds(spark, idx).size == 1,
      "the cadence's vacuum must reclaim the superseded deltas")
    val twinBatch = ingest
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    assert(LshIndex.probe(spark, idx, twinBatch, 0.9).collect()
      .exists(r => r.getLong(0) - 40000000L == r.getLong(1)),
      "post-cadence probes must still see every ingested doc")
    // SigIndex: compact preserves Hamming-0 probe pairs
    import spark.implicits._
    val sidx = tmp("sigcompact")
    SigIndex.build(spark, sidx, Seq((1L, 5L)).toDF("doc_id", "sig"))
    SigIndex.append(spark, sidx, Seq((2L, -1L)).toDF("doc_id", "sig"))
    val sbatch = Seq((100L, 5L), (200L, -1L)).toDF("doc_id", "sig")
    def sigPairs() = SigIndex.probe(spark, sidx, sbatch)
      .filter(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sBefore = sigPairs()
    assert(sBefore == Set((100L, 1L), (200L, 2L)))
    SigIndex.compact(spark, sidx)
    assert(IndexCommit.liveIds(spark, sidx).size == 1)
    assert(sigPairs() == sBefore)
    // SimSigIndex: compact preserves cosine probe pairs
    val vidx = tmp("simcompact")
    SimSigIndex.build(spark, vidx,
      Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v"))
    SimSigIndex.append(spark, vidx,
      Seq((2L, Seq(0.0, 1.0))).toDF("vec_id", "v"))
    val vbatch = Seq((100L, Seq(1.0, 0.0)), (200L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    def vecPairs() = SimSigIndex.probe(spark, vidx, vbatch, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vBefore = vecPairs()
    assert(vBefore == Set((100L, 1L), (200L, 2L)))
    SimSigIndex.compact(spark, vidx)
    assert(IndexCommit.liveIds(spark, vidx).size == 1)
    assert(vecPairs() == vBefore)
  }

  test("probeAndMaintainStream (text): each batch pairs against " +
    "everything indexed before it, then joins the corpus; replay " +
    "ledger-skips; post-append crash replay only ADDS true internal " +
    "pairs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = tmp("pmlsh")
    LshIndex.build(spark, sf(), idx,
      docFilter = Some(col("doc_id") % 10 =!= 0))
    val out = tmp("pmlshout")
    val ingest = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    // B1 = fresh copies of corpus docs (cross pairs to the BUILD
    // corpus); B2 = copies of B1's docs (cross pairs to B1 — only
    // visible if B1 was folded in before B2 probed)
    val b1 = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 0)
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    val b2 = b1.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val rows1 = b1.as[(Long, String)].collect().toSeq
    val rows2 = b2.as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingDedup.probeAndMaintainStream(
      input.toDF().toDF("doc_id", "text"), idx, out, tmp("pmlshck"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(rows1); q.processAllAvailable()
    input.addData(rows2); q.processAllAvailable()
    q.stop()
    val pairs = StreamingDedup.pairs(spark, out)
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))).toSet
    assert(pairs.exists(p => p._1 == 0 && p._2 - 40000000L == p._3),
      "batch 1 must pair with the build corpus")
    assert(pairs.exists(p => p._1 == 1 && p._2 - 10000000L == p._3),
      "batch 2 must pair with batch 1 — the fold-before-next contract")
    assert(!pairs.exists(p => p._2 == p._3), "self-pairs are filtered")
    // ledgered replay: a full no-op
    val segsBefore = IndexCommit.liveIds(spark, idx)
    StreamingDedup.applyProbeIngestBatch(
      spark.createDataFrame(rows1).toDF("doc_id", "text"), idx, out,
      0.8, 0L)
    assert(IndexCommit.liveIds(spark, idx) == segsBefore)
    assert(StreamingDedup.pairs(spark, out).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("doc_new"),
        r.getAs[Long]("doc_idx"))).toSet == pairs)
    // crash-window replay (append committed, marker lost): the batch
    // is already IN the index, so the re-probe may only ADD the
    // batch's own internal pairs — never lose a cross pair
    val f = new java.io.File(s"$idx/stream_ledger/0")
    assert(f.delete())
    StreamingDedup.applyProbeIngestBatch(
      spark.createDataFrame(rows1).toDF("doc_id", "text"), idx, out,
      0.8, 0L)
    val replayed = StreamingDedup.pairs(spark, out)
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))).toSet
    assert(pairs.subsetOf(replayed),
      "a crash-window replay must never lose pairs")
    assert(!replayed.exists(p => p._2 == p._3),
      "self-pairs stay filtered under replay")
    // the re-probe's committed side now includes B1 itself AND the
    // later-ingested B2, so additions are true pairs among the
    // streamed docs (batch-internal + batch-vs-later) — never a new
    // corpus pair, never a wrong one
    assert((replayed -- pairs).forall(p =>
      p._1 == 0 && p._2 >= 40000000L && p._3 >= 40000000L),
      "additions must involve only streamed docs (true pairs)")
  }

  test("probeAndMaintainStream (media): one decode feeds probe and " +
    "append; chained batches pair against earlier batches") {
    val imgs = PerceptualHash.syntheticImages(spark, sf())
    val idx = tmp("pmsig")
    SigIndex.build(spark, idx, PerceptualHash.signatures(
      imgs.filter(col("doc_id") % 10 =!= 0)))
    val out = tmp("pmsigout")
    val b1 = imgs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 0)
      .select((col("doc_id") + 40000000L).as("doc_id"), col("payload"))
    val b2 = b1.select((col("doc_id") + 10000000L).as("doc_id"),
      col("payload"))
    StreamingSigDedup.applyProbeIngestBatch(b1, idx, out, 3, 0L)
    StreamingSigDedup.applyProbeIngestBatch(b2, idx, out, 3, 1L)
    val pairs = StreamingSigDedup.pairs(spark, out)
      .filter(col("hamming") === 0)
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))).toSet
    assert(pairs.exists(p => p._1 == 0 && p._2 - 40000000L == p._3),
      "batch 1 must pair with the build corpus at Hamming 0")
    assert(pairs.exists(p => p._1 == 1 && p._2 - 10000000L == p._3),
      "batch 2 must pair with batch 1 — one decode, both legs")
    assert(!pairs.exists(p => p._2 == p._3), "self-pairs are filtered")
  }

  test("a delta committed AFTER a concurrent compact resolved — with a " +
    "positionally LOWER reserved id — stays live (explicit supersedes " +
    "list, not id order)") {
    import spark.implicits._
    val idx = tmp("race")
    SigIndex.build(spark, idx, Seq((1L, 5L)).toDF("doc_id", "sig"))
    // the appender reserves its id FIRST but commits only after the
    // compact — a positional "supersede everything older" rule would
    // silently swallow this delta's data
    val raced = IndexCommit.reserve(spark, idx)
    Seq((2L, 9L)).toDF("doc_id", "sig").write.parquet(
      s"${IndexCommit.versionDir(idx, raced)}/sigs")
    val fullId = SigIndex.compact(spark, idx)
    assert(fullId > raced, "the compact must reserve past the appender")
    IndexCommit.commit(spark, idx, raced)
    assert(IndexCommit.liveIds(spark, idx).toSet == Set(raced, fullId),
      "the raced delta must stay live next to the full segment")
    val got = SigIndex.probe(spark, idx,
      Seq((100L, 9L)).toDF("doc_id", "sig"))
      .filter(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 2L)),
      "the raced delta's data must answer probes")
    IndexCommit.vacuumSuperseded(spark, idx, keepGenerations = 0)
    assert(IndexCommit.liveIds(spark, idx).toSet == Set(raced, fullId),
      "superseded-vacuum must never touch the raced delta")
    // the NEXT compact folds it in
    val full2 = SigIndex.compact(spark, idx)
    assert(IndexCommit.liveIds(spark, idx) == Seq(full2))
    assert(SigIndex.probe(spark, idx,
      Seq((100L, 9L)).toDF("doc_id", "sig"))
      .filter(col("hamming") === 0).count() == 1)
  }

  test("VectorIndex: ledgered ingestion stream + compact preserve " +
    "probe rankings; cadence bounds segments") {
    import graft.ops.{Similarity, VectorIndex}
    import graft.streaming.StreamingAnn
    val idx = tmp("vecingest")
    val isBatch = col("vec_id") % 10 === 0
    VectorIndex.build(spark, sf(), idx, vecFilter = Some(!isBatch))
    val emb = Similarity.load(spark, sf())
    val b = emb.filter(isBatch).select("vec_id", "v")
    StreamingAnn.applyIngestBatch(b.filter(col("vec_id") % 20 === 0),
      idx, 0L, maxSegments = Some(3), vacuumKeepGens = Some(0))
    assert(IndexCommit.liveIds(spark, idx).size == 2)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def ranked() = VectorIndex.probe(spark, idx, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) ->
        r.getAs[Long]("vec_id")).toMap
    val before = ranked()
    // ledgered replay: a content no-op
    StreamingAnn.applyIngestBatch(b.filter(col("vec_id") % 20 === 0),
      idx, 0L, maxSegments = Some(3), vacuumKeepGens = Some(0))
    assert(IndexCommit.liveIds(spark, idx).size == 2)
    assert(ranked() == before)
    // second batch trips the maxSegments=3 cadence
    StreamingAnn.applyIngestBatch(b.filter(col("vec_id") % 20 =!= 0),
      idx, 1L, maxSegments = Some(3), vacuumKeepGens = Some(0))
    assert(IndexCommit.liveIds(spark, idx).size == 1,
      "the cadence must compact at the bound")
    assert(IndexCommit.committedIds(spark, idx).size == 1,
      "the superseded deltas must be vacuumed")
    val after = ranked()
    assert(after.nonEmpty && after.values.toSet.nonEmpty)
    // the compacted index serves the same members; rankings against
    // the full ingested corpus are stable across the compact
    val recompact = { VectorIndex.compact(spark, idx); ranked() }
    assert(recompact == after,
      "a further compact must not move any ranking")
  }

  test("SubstrIndex.compact: summed dfs sidecar keeps stats and probe " +
    "exact") {
    import graft.ops.SubstrIndex
    val idx = tmp("substrcompact")
    SubstrIndex.build(spark, sf(), idx,
      docFilter = Some(col("doc_id") % 10 =!= 0))
    SubstrIndex.append(spark, idx,
      docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"))
    def statRows() = SubstrIndex.stats(spark, idx).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    def probeRows() = SubstrIndex.probe(spark, idx, batch).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    val (s0, p0) = (statRows(), probeRows())
    SubstrIndex.compact(spark, idx)
    assert(IndexCommit.liveIds(spark, idx).size == 1)
    assert(statRows() == s0, "stats must be exact over the full segment")
    assert(probeRows() == p0, "probe df combine must survive the compact")
  }

  test("vacuumSuperseded keepGenerations=1 defers reclamation one " +
    "full generation; guardEvery=0 fails loudly") {
    import spark.implicits._
    val idx = tmp("vacgen")
    SigIndex.build(spark, idx, Seq((1L, 5L)).toDF("doc_id", "sig"))
    SigIndex.append(spark, idx, Seq((2L, 9L)).toDF("doc_id", "sig"))
    SigIndex.compact(spark, idx)
    // one generation of grace: the compact's own inputs survive —
    // an in-flight reader holding the pre-compact segment list still
    // finds every path
    assert(IndexCommit.vacuumSuperseded(spark, idx).isEmpty,
      "the newest full's inputs must survive the default vacuum")
    assert(IndexCommit.committedIds(spark, idx).size == 3)
    // after the NEXT compact, the first generation's inputs reclaim
    SigIndex.append(spark, idx, Seq((3L, 5L)).toDF("doc_id", "sig"))
    SigIndex.compact(spark, idx)
    val dropped = IndexCommit.vacuumSuperseded(spark, idx)
    assert(dropped.nonEmpty, "the older generation must reclaim")
    val live = IndexCommit.liveIds(spark, idx)
    assert(IndexCommit.committedIds(spark, idx).containsSlice(live))
    def pairs() = SigIndex.probe(spark, idx,
      Seq((100L, 5L), (200L, 9L)).toDF("doc_id", "sig"))
      .filter(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pairs() == Seq((100L, 1L), (100L, 3L), (200L, 2L)),
      "every ingested doc must answer after generational vacuum")
    // keepGenerations=0 reclaims everything superseded immediately
    assert(IndexCommit.vacuumSuperseded(spark, idx, 0).nonEmpty ||
      IndexCommit.committedIds(spark, idx).size == live.size)
    // guardEvery validation: a zero cadence must fail loudly, not
    // divide by zero inside foreachBatch
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.maybeRefreshGuard(spark, idx, 0L, Some(0.1), 0)
    }
    assert(e.getMessage.contains("guardEvery"))
  }

  test("probeAndMaintainStream (embeddings): e2e real stream — each " +
    "batch pairs against everything indexed before it, then joins " +
    "the corpus; replay ledger-skips; crash-window replay only ADDS " +
    "true streamed-vector pairs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val emb = Similarity.loadWithTwins(spark, sf())
      .filter(col("vec_id") < graft.ops.PerceptualHash.TwinOffset)
    val idx = tmp("pmsim")
    SimSigIndex.build(spark, idx, emb, planes = 64)
    val out = tmp("pmsimout")
    // B1 = exact copies of corpus vectors under fresh ids (cosine 1
    // cross pairs to the BUILD corpus); B2 = copies of B1 (cross
    // pairs to B1 — only visible if B1 folded in before B2 probed)
    val b1 = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 40000000L).as("vec_id"), col("v"))
    val b2 = b1.select((col("vec_id") + 10000000L).as("vec_id"), col("v"))
    val rows1 = b1.as[(Long, Seq[Double])].collect().toSeq
    val rows2 = b2.as[(Long, Seq[Double])].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = StreamingSimIngest.probeAndMaintainStream(
      input.toDF().toDF("vec_id", "v"), idx, out, tmp("pmsimck"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(rows1); q.processAllAvailable()
    input.addData(rows2); q.processAllAvailable()
    q.stop()
    def pairsNow() = StreamingSimIngest.pairs(spark, out)
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("vec_new"), r.getAs[Long]("vec_idx"))).toSet
    val pairs = pairsNow()
    assert(pairs.exists(p => p._1 == 0 && p._2 - 40000000L == p._3),
      "batch 1 must pair with the build corpus at cosine 1")
    assert(pairs.exists(p => p._1 == 1 && p._2 - 10000000L == p._3),
      "batch 2 must pair with batch 1 — the fold-before-next contract")
    assert(!pairs.exists(p => p._2 == p._3), "self-pairs are filtered")
    // ledgered replay: a full no-op
    val segsBefore = IndexCommit.liveIds(spark, idx)
    StreamingSimIngest.applyProbeIngestBatch(
      rows1.toDF("vec_id", "v"), idx, out, 0.9, 4, 0L)
    assert(IndexCommit.liveIds(spark, idx) == segsBefore)
    assert(pairsNow() == pairs)
    // crash-window replay (append committed, marker lost): the batch
    // is already IN the index — re-probe may only ADD true pairs
    // among the streamed vectors, never lose a cross pair
    val f = new java.io.File(s"$idx/stream_ledger/0")
    assert(f.delete())
    StreamingSimIngest.applyProbeIngestBatch(
      rows1.toDF("vec_id", "v"), idx, out, 0.9, 4, 0L)
    val replayed = pairsNow()
    assert(pairs.subsetOf(replayed),
      "a crash-window replay must never lose pairs")
    assert((replayed -- pairs).forall(p =>
      p._1 == 0 && p._2 >= 40000000L && p._3 >= 40000000L),
      "additions must involve only streamed vectors (true pairs)")
  }

  test("probeAndMaintainStream guard cadence: refreshGuard fires at " +
    "the bound on a drifting COMPOSED stream — the stream that grows " +
    "the index is the one that accrues drift") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = tmp("pmguard")
    LshIndex.build(spark, sf(), idx, rowsPerBand = 1,
      maxDocFreq = Some(0.1))
    val banner = "zq0 zq1 zq2 zq3 zq4 zq5 "
    def bannered(offset: Long) = docs
      .filter(col("doc_id") % 5 === 3)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit(banner), col("text")).as("text"))
    val rows1 = bannered(30000000L).as[(Long, String)].collect().toSeq
    val rows2 = bannered(50000000L).as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // guardEvery = 2: batch 0 must NOT fire, batch 1 must — and the
    // drift it folds in is drift THIS stream's own appends created
    val q = StreamingDedup.probeAndMaintainStream(
      input.toDF().toDF("doc_id", "text"), idx, tmp("pmguardout"),
      tmp("pmguardck"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      guardMaxDocFreq = Some(0.1), guardEvery = 2)
    input.addData(rows1); q.processAllAvailable()
    assert(IndexCommit.committedIds(spark, s"$idx/guard").isEmpty,
      "the cadence must not fire before the bound")
    assert(!LshIndex.guardDrift(spark, idx, 0.1).isEmpty,
      "the banner appended by batch 0 must register as drift")
    input.addData(rows2); q.processAllAvailable()
    q.stop()
    assert(IndexCommit.committedIds(spark, s"$idx/guard").size == 1,
      "the cadence must fire at the bound")
    assert(LshIndex.guardDrift(spark, idx, 0.1).isEmpty,
      "the fired refresh must fold the stream's own drift in")
  }

  test("probeStream guard cadence: refreshGuard fires on schedule, " +
    "sheds drift-driven candidates, leaves answers verified") {
    val idx = tmp("guard")
    LshIndex.build(spark, sf(), idx, rowsPerBand = 1,
      maxDocFreq = Some(0.1))
    val banner = "zr0 zr1 zr2 zr3 zr4 zr5 "
    def bannered(offset: Long) = docs
      .filter(col("doc_id") % 5 === 3)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit(banner), col("text")).as("text"))
    // drift source: a banner-heavy append the build-time guard never
    // saw (the probe stream itself stays read-only)
    LshIndex.append(spark, idx, bannered(30000000L))
    assert(!LshIndex.guardDrift(spark, idx, 0.1).isEmpty)
    def lowPairs() = LshIndex.probe(spark, idx, bannered(40000000L), 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = lowPairs()
    // batches 0..14 at cadence 16: nothing may fire
    (0L to 14L).foreach(b => StreamingDedup.maybeRefreshGuard(
      spark, idx, b, Some(0.1), 16))
    assert(IndexCommit.committedIds(spark, s"$idx/guard").isEmpty,
      "the cadence must not fire early")
    assert(lowPairs() == before)
    // ...and nothing fires when the knob is off
    StreamingDedup.maybeRefreshGuard(spark, idx, 15L, None, 16)
    assert(IndexCommit.committedIds(spark, s"$idx/guard").isEmpty,
      "guard refresh is strictly opt-in")
    // batch 15 (the 16th): the refresh fires and the drift zeroes
    StreamingDedup.maybeRefreshGuard(spark, idx, 15L, Some(0.1), 16)
    assert(IndexCommit.committedIds(spark, s"$idx/guard").size == 1,
      "the cadence must fire on the 16th batch")
    assert(LshIndex.guardDrift(spark, idx, 0.1).isEmpty,
      "the fired refresh must fold the measured drift in")
    val after = lowPairs()
    assert(after.size < before.size,
      "banner-driven candidate pairs must shed after the refresh")
    // true twins (same banner + same text → jaccard 1 content pairs)
    // survive: verification stays exact throughout
    val twinsAfter = LshIndex.probe(spark, idx, bannered(40000000L), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 - 10000000L == p._2).toSet
    assert(twinsAfter.nonEmpty,
      "true near-dup twins must survive the guard refresh")
  }
}
