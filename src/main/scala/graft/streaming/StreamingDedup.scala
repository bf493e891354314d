package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{CacheScope, LshIndex}

/** Continuous near-duplicate detection: arriving documents probe a
  * persisted MinHash-LSH index ([[graft.ops.LshIndex]]) one micro-batch
  * at a time — the streaming form of the index-reuse ingestion shape
  * ([[graft.ops.Dedup.incrementalDedupPairs]] is the single-job batch
  * form; here the corpus side is the persisted index and the batch
  * side arrives on a stream).
  *
  * Per batch: [[LshIndex.probe]] runs as the `foreachBatch` body
  * (batch-sized shingling + banding, bucket join against the index,
  * row-local Jaccard verification), and the verified pairs land under
  * `outPath/batch_id=<id>` — one overwritten directory per micro-batch
  * id, so foreachBatch's at-least-once replay re-creates the same
  * directory instead of appending duplicates. Readers see one
  * partitioned pairs table at `outPath`.
  *
  * The index is deliberately STATIC between rebuilds: folding each
  * batch's signatures back into the index inside the hot path would
  * make replay non-idempotent (a replayed batch would double-insert
  * its bands) and turn the probe into a read-modify-write race under
  * concurrent streams. Production shape: within-batch self-dups are
  * caught by [[EventStreams.dedupStream]]-style keyed state upstream,
  * batch-vs-index dups here, and the index is refreshed by a periodic
  * [[LshIndex.build]] compaction — the standard lambda split.
  */
object StreamingDedup {

  def probeStream(
      docs: DataFrame,
      indexPath: String,
      outPath: String,
      checkpointDir: String,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, indexPath, outPath, threshold, batchId); ()
      }
      .start()

  /** One micro-batch: probe and write the batch's pair directory.
    * Returns the pair count. Package-visible so the spec can drive
    * batches (and replays) synchronously.
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      indexPath: String,
      outPath: String,
      threshold: Double,
      batchId: Long
  ): Long = {
    val scope = new CacheScope
    try {
      // empty micro-batches still (over)write their directory: a
      // replayed batch that previously wrote pairs but now matches
      // nothing must erase its stale output, not keep it
      val pairs = scope.cache(
        LshIndex.probe(batch.sparkSession, indexPath, batch,
          threshold, scope))
      pairs.write.mode("overwrite")
        .parquet(s"$outPath/batch_id=$batchId")
      pairs.count()
    } finally scope.release()
  }

  /** The accumulated pairs table (doc_new, doc_idx, jaccard,
    * batch_id) across every micro-batch written so far. A stream that
    * has processed zero batches yields an EMPTY typed relation, not a
    * path error — `outPath` only gains `batch_id=` directories when
    * the first micro-batch commits.
    */
  def pairs(s: org.apache.spark.sql.SparkSession, outPath: String): DataFrame =
    if (!hasBatchDirs(outPath))
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_new BIGINT, doc_idx BIGINT, jaccard DOUBLE, batch_id BIGINT"))
    else s.read.option("basePath", outPath).parquet(outPath)
      .select(col("doc_new"), col("doc_idx"), col("jaccard"),
        col("batch_id").cast("long").as("batch_id"))

  /** True once at least one `batch_id=` partition directory exists. */
  private[streaming] def hasBatchDirs(outPath: String): Boolean = {
    val d = new java.io.File(outPath)
    d.isDirectory && {
      val kids = d.listFiles()
      kids != null && kids.exists(f =>
        f.isDirectory && f.getName.startsWith("batch_id="))
    }
  }
}
