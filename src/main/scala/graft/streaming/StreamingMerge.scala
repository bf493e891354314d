package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.{Importer, Staging}

/** The engine's keyed UPDATE ([[graft.engine.Importer]], J1/J2) as a
  * continuous operator: a streaming delta merges into a parquet target
  * one micro-batch at a time via `foreachBatch` — the CDC-shaped form
  * of the reference's import loop (`importer.py:293-359` run per
  * arriving change set instead of per user click).
  *
  * Semantics per batch are EXACTLY the batch importer's: the whole
  * validation chain runs (V1-V11 — notably V10, duplicate delta keys
  * REJECT the batch rather than picking a silent winner; upstream
  * dedups first, e.g. [[EventStreams.dedupStream]]), matched target
  * rows take the delta's subset values, unmatched rows pass through.
  *
  * Write protocol: the merged snapshot is materialized into a staging
  * directory FIRST (the merge plan reads the live target — an in-place
  * overwrite would delete its own input mid-scan), then swapped in via
  * delete + rename. A crash between delete and rename leaves a
  * complete staging snapshot; the next batch (or restart) finds the
  * target missing and completes the swap before merging — combined
  * with merge idempotency (re-applying a delta is a fixpoint) this
  * makes the sink safe under foreachBatch's at-least-once replay.
  *
  * Scale: each micro-batch costs one broadcast-hash merge join (the
  * delta is the small side by construction) plus one target rewrite —
  * the parquet analogue of the reference's full-table UPDATE. For
  * high-frequency streams the rewrite amortizes by widening the
  * trigger interval; point-update economics would need a table format
  * with row-level deletes, which is out of scope here.
  */
object StreamingMerge {

  /** Suffix of the staging directory the snapshot is built in. */
  private[graft] val StagingSuffix = ".staging"

  def mergeStream(
      delta: DataFrame,
      targetPath: String,
      joinOn: Seq[String],
      subset: Seq[String] = Nil,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    delta.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, targetPath, joinOn, subset); ()
      }
      .start()

  /** One micro-batch: recover any interrupted swap, merge, stage the
    * new snapshot, swap it in. Returns the affected-row count (A4).
    * Package-visible so the spec can drive batches synchronously.
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      targetPath: String,
      joinOn: Seq[String],
      subset: Seq[String]
  ): Long = {
    val spark = batch.sparkSession
    val fs = new Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(targetPath)
    val stage = new Path(targetPath + StagingSuffix)
    // crash recovery: a missing target beside a complete staging
    // snapshot is an interrupted swap — finish it before merging
    if (!fs.exists(dst) && fs.exists(stage)) fs.rename(stage, dst)
    if (batch.isEmpty) 0L
    else {
      // the empty relation Spark hands a fresh foreachBatch sink is
      // unplannable for the merge join; also V1 would reject it
      val target = spark.read.parquet(targetPath)
      // rowCountUpdated materializes inside merge(), while the target
      // is still intact on disk
      val result = Importer.merge(target, batch, joinOn, subset)
      fs.delete(stage, true)
      Staging.writeBatched(result.updated, targetPath + StagingSuffix)
      fs.delete(dst, true)
      fs.rename(stage, dst)
      result.rowCountUpdated
    }
  }
}
