package graft

import graft.ops.{IndexCommit, Sketches, SketchIndex}
import graft.streaming.StreamingSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the persisted/streaming sketch state: build+append must be
  * BIT-identical to one job over the union (the merge algebra is the
  * sketch's own union semantics), HLL appends are replay-idempotent,
  * and the streaming per-batch-id layout makes even the non-idempotent
  * CMS addition replay-safe.
  */
class SketchIndexSpec extends SparkSpec {

  private def docs(): DataFrame =
    spark.read.parquet(s"${sf()}/documents.parquet")

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("hll index: build + append == one job over the union") {
    val path = tmp("hllidx")
    val d = docs()
    SketchIndex.buildHll(spark, d.filter(col("doc_id") % 2 === 0), path)
    SketchIndex.appendHll(spark, path, d.filter(col("doc_id") % 2 === 1))
    assert(rowsOf(SketchIndex.hllSketch(spark, path))
      == rowsOf(Sketches.hllDistinctShingles(spark, sf())),
      "register-max append must reproduce the one-job sketch exactly")
  }

  test("hll index: concurrent appends serialize — no batch's maxima lost") {
    // read-modify-write appends racing from one base would each
    // publish registers missing the other's maxima; the writer lock
    // serializes them, so the final state equals the one-job sketch
    val path = tmp("hllrace")
    val d = docs()
    SketchIndex.buildHll(spark, d.filter(col("doc_id") % 4 === 0), path)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (1 to 3).map { r =>
      new Thread(() =>
        try { SketchIndex.appendHll(spark, path,
          d.filter(col("doc_id") % 4 === r)); () }
        catch { case t: Throwable => errs.add(t); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"appenders must not fail: ${errs.peek()}")
    assert(rowsOf(SketchIndex.hllSketch(spark, path))
      == rowsOf(Sketches.hllDistinctShingles(spark, sf())),
      "three concurrent appends must fold every batch's registers in")
  }

  test("hll index: re-appending the same batch is a no-op (max is idempotent)") {
    val path = tmp("hllidx2")
    val d = docs()
    val odd = d.filter(col("doc_id") % 2 === 1)
    SketchIndex.buildHll(spark, d.filter(col("doc_id") % 2 === 0), path)
    SketchIndex.appendHll(spark, path, odd)
    val once = rowsOf(SketchIndex.hllSketch(spark, path))
    val vBefore = IndexCommit.committedIds(spark, path)
    SketchIndex.appendHll(spark, path, odd) // at-least-once delivery
    assert(rowsOf(SketchIndex.hllSketch(spark, path)) == once,
      "a replayed append must not change the registers")
    // the replay still published a (content-identical) new version,
    // and the PREVIOUS version remains fully readable — time travel
    val vAfter = IndexCommit.committedIds(spark, path)
    assert(vAfter.size == vBefore.size + 1)
    val prev = spark.read.parquet(
      s"${IndexCommit.versionDir(path, vBefore.last)}/regs")
    assert(rowsOf(Sketches.hllFinalize(prev)) == once)
  }

  test("cms index: build + append == one job, at a non-default grid shape") {
    val path = tmp("cmsidx")
    val d = docs()
    val toks = Sketches.cmsTokensOf(d)
    SketchIndex.buildCms(spark, d.filter(col("doc_id") % 2 === 0), path,
      depth = 3, width = 32)
    SketchIndex.appendCms(spark, path, d.filter(col("doc_id") % 2 === 1))
    val top = Sketches.cmsTopTokens(toks, 20)
    // probe reads (depth, width) from the meta sidecar — equality with
    // the one-job grid at the same shape pins both the counter-add
    // merge and the meta round-trip
    assert(rowsOf(SketchIndex.cmsProbe(spark, path, top))
      == rowsOf(Sketches.cmsProbe(
        Sketches.cmsGridOf(toks, 3, 32), top, 3, 32)),
      "counter-add append must reproduce the one-job grid exactly")
  }

  test("kmv index: build + append == one job; re-append is a set no-op") {
    val path = tmp("kmvidx")
    val d = docs()
    val odd = d.filter(col("doc_id") % 2 === 1)
    SketchIndex.buildKmv(spark, d.filter(col("doc_id") % 2 === 0), path)
    SketchIndex.appendKmv(spark, path, odd)
    val oneJob = rowsOf(Sketches.kmvDistinctTokens(spark, sf()))
    assert(rowsOf(SketchIndex.kmvSketch(spark, path)) == oneJob,
      "k smallest of merged minima must equal the one-job sketch")
    SketchIndex.appendKmv(spark, path, odd) // at-least-once delivery
    assert(rowsOf(SketchIndex.kmvSketch(spark, path)) == oneJob,
      "a replayed append unions an already-present set — nothing moves")
  }

  test("kmv index: state stays bounded at k hashes per source") {
    val path = tmp("kmvidx2")
    val d = docs()
    SketchIndex.buildKmv(spark, d, path, k = 5)
    SketchIndex.appendKmv(spark, path, d.filter(col("doc_id") % 3 === 0))
    val vdir = IndexCommit.currentDir(spark, path).get
    val state = spark.read.parquet(s"$vdir/minima")
      .groupBy("source").count().collect()
    assert(state.nonEmpty)
    state.foreach(r => assert(r.getLong(1) <= 5,
      s"${r.getString(0)} spilled past k minima"))
    // and the sketch built at k=5 matches the one-job k=5 sketch
    assert(rowsOf(SketchIndex.kmvSketch(spark, path))
      == rowsOf(Sketches.kmvDistinctTokens(spark, sf(), k = 5)))
  }

  test("streaming hll: batches merge to the one-job sketch; replay is safe") {
    val out = tmp("hllstream")
    val d = docs()
    StreamingSketch.applyHllBatch(d.filter(col("doc_id") % 2 === 0), out, 0L)
    StreamingSketch.applyHllBatch(d.filter(col("doc_id") % 2 === 1), out, 1L)
    val expected = rowsOf(Sketches.hllDistinctShingles(spark, sf()))
    assert(rowsOf(StreamingSketch.hllSketch(spark, out)) == expected)
    // at-least-once: re-running batch 1 overwrites its own directory
    StreamingSketch.applyHllBatch(d.filter(col("doc_id") % 2 === 1), out, 1L)
    assert(rowsOf(StreamingSketch.hllSketch(spark, out)) == expected,
      "a replayed micro-batch must not move the registers")
  }

  test("streaming cms: replay cannot double-count (per-batch-id layout)") {
    val out = tmp("cmsstream")
    val d = docs()
    StreamingSketch.applyCmsBatch(
      d.filter(col("doc_id") % 2 === 0), out, 4, 64, 0L)
    StreamingSketch.applyCmsBatch(
      d.filter(col("doc_id") % 2 === 1), out, 4, 64, 1L)
    val oneJob = Sketches.cmsGridOf(Sketches.cmsTokensOf(d), 4, 64)
    def gridRows(g: DataFrame) = g.select("i", "b", "cnt").collect()
      .map(r => (r.getAs[Int]("i"), r.getLong(1), r.getLong(2))).toSet
    assert(gridRows(StreamingSketch.cmsGrid(spark, out)) == gridRows(oneJob))
    // the merge is ADDITION — a naive re-append would double batch 1's
    // counts; the per-batch-id overwrite makes the replay exact
    StreamingSketch.applyCmsBatch(
      d.filter(col("doc_id") % 2 === 1), out, 4, 64, 1L)
    assert(gridRows(StreamingSketch.cmsGrid(spark, out)) == gridRows(oneJob),
      "a replayed micro-batch must overwrite, never add")
  }

  test("streaming kmv: batches merge to the one-job sketch; replay is safe") {
    val out = tmp("kmvstream")
    val d = docs()
    StreamingSketch.applyKmvBatch(d.filter(col("doc_id") % 2 === 0), out, 64, 0L)
    StreamingSketch.applyKmvBatch(d.filter(col("doc_id") % 2 === 1), out, 64, 1L)
    val expected = rowsOf(Sketches.kmvDistinctTokens(spark, sf()))
    assert(rowsOf(StreamingSketch.kmvSketch(spark, out)) == expected,
      "read-side re-rank of per-batch minima must equal one job")
    StreamingSketch.applyKmvBatch(d.filter(col("doc_id") % 2 === 1), out, 64, 1L)
    assert(rowsOf(StreamingSketch.kmvSketch(spark, out)) == expected,
      "a replayed micro-batch must not move the minima")
  }

  test("streaming kmv/cms: shape persists in meta — reader takes the " +
    "writer's k, a mismatched batch is rejected") {
    val out = tmp("kmvmeta")
    val d = docs()
    // writer k=5: the reader must re-rank at 5, NOT any caller default
    StreamingSketch.applyKmvBatch(d.filter(col("doc_id") % 2 === 0), out, 5, 0L)
    StreamingSketch.applyKmvBatch(d.filter(col("doc_id") % 2 === 1), out, 5, 1L)
    assert(StreamingSketch.kmvK(spark, out) == 5)
    assert(rowsOf(StreamingSketch.kmvSketch(spark, out))
      == rowsOf(Sketches.kmvDistinctTokens(spark, sf(), k = 5)),
      "read-side k must come from the persisted meta")
    // a later batch at a different k would silently mix truncation
    // levels — the meta guard rejects it
    val e = intercept[IllegalArgumentException] {
      StreamingSketch.applyKmvBatch(d.limit(1), out, 64, 2L)
    }
    assert(e.getMessage.contains("k=5"))
    val outC = tmp("cmsmeta")
    StreamingSketch.applyCmsBatch(d, outC, 4, 64, 0L)
    val e2 = intercept[IllegalArgumentException] {
      StreamingSketch.applyCmsBatch(d.limit(1), outC, 4, 32, 1L)
    }
    assert(e2.getMessage.contains("4x64"))
  }

  test("streaming kmv/cms: present-but-MALFORMED meta fails loudly " +
    "instead of silently re-initializing past the shape guard") {
    val out = tmp("cmsbadmeta")
    val d = docs()
    // a truncated / wrong-kind sidecar (1 value where CMS needs 2):
    // the old `case _ => write` routed this to a silent overwrite
    graft.ops.IndexCommit.writeTextSidecar(spark, s"$out/meta", Seq("4"))
    val e = intercept[RuntimeException] {
      StreamingSketch.applyCmsBatch(d.limit(1), out, 4, 64, 0L)
    }
    assert(e.getMessage.contains("malformed"))
    val outK = tmp("kmvbadmeta")
    graft.ops.IndexCommit.writeTextSidecar(
      spark, s"$outK/meta", Seq("4", "64"))
    val e2 = intercept[RuntimeException] {
      StreamingSketch.applyKmvBatch(d.limit(1), outK, 64, 0L)
    }
    assert(e2.getMessage.contains("malformed"))
  }

  test("streaming hll: end-to-end through a real stream") {
    val src = tmp("hllsrc")
    val out = tmp("hllout")
    val ck = tmp("hllck")
    val d = docs()
    d.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(d.schema).parquet(src)
    val q = StreamingSketch.hllStream(stream, out, ck)
    q.awaitTermination(60000)
    assert(rowsOf(StreamingSketch.hllSketch(spark, out))
      == rowsOf(Sketches.hllDistinctShingles(spark, sf())))
  }
}
