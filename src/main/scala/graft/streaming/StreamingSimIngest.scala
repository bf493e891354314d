package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.SimSigIndex

/** Continuous EMBEDDING ingestion: arriving (vec_id, v) vectors are
  * signed batch-side and folded into the persisted hyperplane-
  * signature index ([[graft.ops.SimSigIndex]]) one micro-batch at a
  * time — the embedding member of the ingestion-stream family
  * ([[StreamingCluster]] text clusters, [[StreamingDedup]]
  * `maintainStream` text LSH, [[StreamingSigDedup]] `maintainStream`
  * media signatures), with the same exactly-once discipline: batch
  * ids ledger under the index root ([[BatchLedger]]), a replayed id
  * skips the append, and the crash window (append committed, marker
  * unwritten) degrades to a duplicate segment whose extra band
  * candidates never change verified answers
  * ([[SimSigIndex.probe]]/[[SimSigIndex.clusters]] verify exact
  * cosine over `distinct` candidates).
  *
  * Batch consumers compose without coordination: each micro-batch
  * lands as a regular committed segment, so a concurrent
  * [[SimSigIndex.probe]] resolves one committed segment list for its
  * whole read.
  */
object StreamingSimIngest {

  /** Default in-stream segment-compact cadence
    * ([[StreamingDedup.DefaultMaxSegments]]' reasoning). */
  val DefaultMaxSegments: Int = 16

  def maintainStream(
      vectors: DataFrame,
      indexPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxSegments: Option[Int] = Some(DefaultMaxSegments),
      vacuumKeepGens: Option[Int] = Some(1)
  ): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, indexPath, batchId, maxSegments,
          vacuumKeepGens)
        ()
      }
      .start()

  /** One micro-batch: ledger-skip replayed ids, skip empty batches,
    * else [[SimSigIndex.append]] (batch-only signing under the frozen
    * plane count) then mark. The compact cadence rides outside the
    * ledger ([[StreamingDedup.applyIngestBatch]]'s rationale).
    * Package-visible for synchronous spec driving.
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      indexPath: String,
      batchId: Long,
      maxSegments: Option[Int] = None,
      vacuumKeepGens: Option[Int] = Some(1)): Unit =
    BatchLedger.ingest(batch.sparkSession, indexPath, batchId,
      batch.isEmpty, maxSegments, vacuumKeepGens)(
      SimSigIndex.append(batch.sparkSession, indexPath, batch))(
      SimSigIndex.maybeCompact(batch.sparkSession, indexPath, _))
}
