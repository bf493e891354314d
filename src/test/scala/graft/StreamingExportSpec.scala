package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.ops.{ClusterIndex, CorpusSnapshot, IndexCommit, KnIndex,
  TrainPrep}
import graft.streaming.StreamingExport

/** The composed last mile as a stream (VERDICT r15 #4): streamed
  * export ≡ batch `pipelineExportIndexed` over the same corpus and
  * the same frozen indexes — the shared-relation contract — plus the
  * ledger replay no-op and the marker-removal crash window (a
  * duplicate delta whose last-writer-wins resolution changes
  * nothing).
  */
class StreamingExportSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-sexport-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select("doc_id", "text")

  private def packRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("shard_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("pack_id"), r.getAs[Long]("pack_off"))).toSet

  test("streamed export equals the batch pipelineExportIndexed; " +
    "replay is a ledger no-op; crash-window replay resolves to the " +
    "same corpus; the lookup/join crossover is row-identical") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // frozen models, built once on the full corpus (exactly the
    // batch query's staging)
    val cidx = tmp("clidx")
    val kidx = tmp("knidx")
    ClusterIndex.build(spark, sf(), cidx)
    KnIndex.build(spark, sf(), kidx)
    val expected = packRows(
      TrainPrep.pipelineExportIndexed(spark, sf(), cidx, kidx))
    assert(expected.nonEmpty, "fixture must export survivors")

    // e2e: the corpus arrives as two micro-batches
    val snap = tmp("snap")
    val rows = docs.as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingExport.exportStream(
      input.toDF().toDF("doc_id", "text"), cidx, kidx, snap,
      tmp("ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(rows.take(rows.size / 2))
    q.processAllAvailable()
    input.addData(rows.drop(rows.size / 2))
    q.processAllAvailable()
    q.stop()
    assert(packRows(StreamingExport.packedExport(spark, snap)) == expected,
      "streamed packed export must equal the batch composition " +
        "row-for-row once the stream has seen the corpus")
    // the snapshot holds exactly the survivor set (doc-level check,
    // independent of the packing arithmetic)
    val survivorIds = TrainPrep
      .pipelineExportIndexed(spark, sf(), cidx, kidx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val resolved = CorpusSnapshot.readResolved(spark, snap)
    assert(resolved.select("doc_id").collect()
      .map(_.getLong(0)).toSet == survivorIds)

    // ledger replay no-op: re-running batch 0 changes nothing
    val versionsBefore = IndexCommit.committedIds(spark, snap).size
    StreamingExport.applyBatch(
      rows.take(rows.size / 2).toDF("doc_id", "text"), cidx, kidx,
      snap, 0L)
    assert(IndexCommit.committedIds(spark, snap).size == versionsBefore,
      "a ledgered batch id must not publish again")

    // crash window: marker removed AFTER the publish (the at-least-
    // once direction) — the replay publishes a duplicate delta whose
    // per-doc last-writer-wins resolution is unchanged
    val marker = new java.io.File(s"$snap/stream_ledger/0")
    assert(marker.exists() && marker.delete())
    StreamingExport.applyBatch(
      rows.take(rows.size / 2).toDF("doc_id", "text"), cidx, kidx,
      snap, 0L)
    assert(IndexCommit.committedIds(spark, snap).size > versionsBefore,
      "the crash-window replay stages a duplicate delta by design")
    assert(packRows(StreamingExport.packedExport(spark, snap)) == expected,
      "a duplicate survivor delta must not change the resolved export")

    // the join path (lookupMaxIds below the batch size) is
    // row-identical to the point-lookup path
    val snap2 = tmp("snap2")
    StreamingExport.applyBatch(rows.toDF("doc_id", "text"), cidx, kidx,
      snap2, 0L, lookupMaxIds = 1)
    assert(packRows(StreamingExport.packedExport(spark, snap2)) == expected,
      "the assignment-join crossover must produce identical rows")
  }

  test("docs the cluster index never assigned are absent from the " +
    "export (serving-half contract), and an all-filtered batch " +
    "publishes no delta but still marks the ledger") {
    import spark.implicits._
    val cidx = tmp("clidx2")
    val kidx = tmp("knidx2")
    ClusterIndex.build(spark, sf(), cidx)
    KnIndex.build(spark, sf(), kidx)
    val snap = tmp("snap3")
    // seed with one real batch so the root is committed
    val seed = docs.limit(50).as[(Long, String)].collect().toSeq
    StreamingExport.applyBatch(seed.toDF("doc_id", "text"), cidx, kidx,
      snap, 0L)
    val versions = IndexCommit.committedIds(spark, snap).size
    // a batch of UNINDEXED docs: no dedup verdict → nothing publishes
    StreamingExport.applyBatch(
      Seq((999999901L, "wholly unindexed document text"))
        .toDF("doc_id", "text"), cidx, kidx, snap, 1L)
    assert(IndexCommit.committedIds(spark, snap).size == versions,
      "unindexed docs must not be exported")
    assert(new java.io.File(s"$snap/stream_ledger/1").exists(),
      "a filtered-out batch still marks its ledger id")
  }
}
