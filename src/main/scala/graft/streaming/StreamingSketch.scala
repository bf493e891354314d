package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Sketches

/** Continuous corpus-health sketching: arriving documents are folded
  * into HLL registers / a CMS counter grid one micro-batch at a time —
  * the streaming form of [[graft.ops.SketchIndex]]'s append path.
  *
  * Idempotence is by LAYOUT, not by merge algebra: each micro-batch
  * writes ITS OWN sketch state under `outPath/batch_id=<id>`
  * (overwrite per id), and readers merge across batch directories at
  * read time (register max / counter sum — both order-independent).
  * foreachBatch's at-least-once replay therefore overwrites the same
  * directory with the same deterministic content. For HLL the max
  * merge is idempotent anyway; for CMS the addition is NOT — the
  * per-batch staging is precisely what lets a replayed batch correct
  * itself instead of double-counting, the same per-batch-id discipline
  * every streaming twin in this engine uses.
  *
  * Out-of-order and concurrent-batch safety come free: both merges
  * are commutative and associative, so the read-side fold doesn't
  * care which order micro-batches landed in. State volume: each
  * batch directory is register/grid-sized (kilobytes), and a periodic
  * [[graft.ops.SketchIndex]] build compacts the history into one
  * committed version — the standard lambda split.
  */
object StreamingSketch {

  // ---- HLL ----------------------------------------------------------

  def hllStream(
      docs: DataFrame,
      outPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyHllBatch(batch, outPath, batchId); ()
      }
      .start()

  /** One micro-batch: (over)write its register directory. Empty
    * batches still overwrite — a replayed batch that previously wrote
    * registers but now matches nothing must erase its stale state.
    * Package-visible so the spec can drive batches (and replays)
    * synchronously.
    */
  private[graft] def applyHllBatch(
      batch: DataFrame, outPath: String, batchId: Long): Unit =
    Sketches.hllRegistersOf(batch).write.mode("overwrite")
      .parquet(s"$outPath/batch_id=$batchId")

  /** The merged registers across everything that has arrived. */
  private[graft] def hllRegisters(
      s: SparkSession, outPath: String): DataFrame =
    s.read.parquet(outPath)
      .groupBy("source", "j").agg(max("mj").as("mj"))

  /** Finalized sketch rows — identical to
    * [[Sketches.hllDistinctShingles]] over the union of all arrived
    * batches (spec-pinned, including across a replay).
    */
  def hllSketch(s: SparkSession, outPath: String): DataFrame =
    Sketches.hllFinalize(hllRegisters(s, outPath))

  // ---- CMS ----------------------------------------------------------

  def cmsStream(
      docs: DataFrame,
      outPath: String,
      checkpointDir: String,
      depth: Int = 4,
      width: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCmsBatch(batch, outPath, depth, width, batchId); ()
      }
      .start()

  private[graft] def applyCmsBatch(batch: DataFrame, outPath: String,
      depth: Int, width: Int, batchId: Long): Unit =
    Sketches.cmsGridOf(Sketches.cmsTokensOf(batch), depth, width)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** The summed counter grid across everything that has arrived —
    * identical to one-pass [[Sketches.cmsGridOf]] over the union
    * (spec-pinned, including across a replay: a re-run batch
    * overwrites its own partition, so nothing double-counts).
    */
  def cmsGrid(s: SparkSession, outPath: String): DataFrame =
    s.read.parquet(outPath)
      .groupBy("i", "b").agg(sum("cnt").as("cnt"))

  // ---- KMV ----------------------------------------------------------

  def kmvStream(
      docs: DataFrame,
      outPath: String,
      checkpointDir: String,
      k: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyKmvBatch(batch, outPath, k, batchId); ()
      }
      .start()

  /** One micro-batch: its own k-minima under `batch_id=<id>`. The
    * read-side re-rank makes the union's minima exact (KMV's merge
    * property), and the set semantics make replay a no-op like HLL's
    * max.
    */
  private[graft] def applyKmvBatch(
      batch: DataFrame, outPath: String, k: Int, batchId: Long): Unit =
    Sketches.kmvMinima(Sketches.kmvHashesOf(batch), k)
      .select("source", "h")
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** Finalized sketch rows — identical to
    * [[Sketches.kmvDistinctTokens]] over the union of all arrived
    * batches (spec-pinned, including across a replay).
    */
  def kmvSketch(s: SparkSession, outPath: String, k: Int = 64): DataFrame =
    Sketches.kmvFinalize(
      Sketches.kmvMinima(
        s.read.parquet(outPath).select("source", "h").distinct(), k), k)
}
