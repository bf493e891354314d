package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Applied-batch-id ledger: zero-length markers under
  * `<root>/stream_ledger/<batchId>` — the [[graft.ops.IndexCommit]]
  * marker economics applied to micro-batch ids, factored out of
  * [[StreamingCluster]] (where the pattern was proven) so every
  * ingestion stream whose per-batch apply is NOT naturally idempotent
  * ([[graft.ops.SigIndex.append]], [[graft.ops.LshIndex.append]],
  * [[graft.ops.SimSigIndex.append]] — each adds a segment per call)
  * can be exactly-once under foreachBatch's at-least-once replay: a
  * replayed id skips the apply entirely.
  *
  * The crash window (apply committed, marker not yet written) is the
  * streams' documented SAFE degrade: a re-applied batch stages a
  * duplicate segment, which for every index here inflates candidates
  * without changing verified answers (probe outputs are `distinct`
  * over verified pairs, and [[StreamingCluster]]'s label merge is a
  * fixpoint) — spec-pinned per stream by replaying with the marker
  * removed.
  *
  * Scale: one `exists` + one `createNewFile` of an empty marker per
  * micro-batch — O(1) metadata calls, nothing data-proportional.
  */
private[graft] object BatchLedger {

  /** Default marker-retention window for [[prune]] — the assumed
    * MAXIMUM replay depth: foreachBatch re-delivers ids at or after
    * the checkpoint's last uncommitted batch (reach-back of one,
    * maybe two ids in practice), so 64 is a ~32× margin. The one
    * operation that can exceed it is a checkpoint ROLLED BACK (or
    * hand-edited) more than 64 batches behind the ledger head: its
    * replayed ids would be pruned already and re-apply as duplicate
    * segments until compaction collapses them. Operators planning
    * deeper rollbacks widen the window via the `ledgerKeepLast` knob
    * on [[cadence]]/[[ingest]] and the stream entry points that
    * expose it (ADVICE r15 — previously hard-coded at both call
    * sites).
    */
  val DefaultKeepLast: Int = 64

  private def path(root: String, batchId: Long): Path =
    new Path(s"$root/stream_ledger/$batchId")

  def has(s: SparkSession, root: String, batchId: Long): Boolean = {
    val p = path(root, batchId)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  def mark(s: SparkSession, root: String, batchId: Long): Unit = {
    val p = path(root, batchId)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    fs.createNewFile(p)
  }

  /** Run `body` at most once per batch id: skip when the ledger holds
    * the id, mark after `body` returns. The crash window (body's
    * effects durable, marker unwritten) is each caller's documented
    * safe degrade.
    */
  def appliedOnce(
      s: SparkSession, root: String, batchId: Long)(body: => Unit): Unit =
    if (!has(s, root, batchId)) {
      body
      mark(s, root, batchId)
    }

  /** The shared ingestion-micro-batch shape, written once for the
    * five segment-union indexes: ledger-guard, skip empty batches (an
    * empty append would commit a contentless segment per replayed
    * empty trigger), run `append`, then fire the compact cadence and
    * the generations-graced superseded vacuum. The cadence is
    * EFFECTIVELY outside the ledger (compact is relation-idempotent —
    * a replay that skips it loses nothing but deferral; the next
    * batch's cadence re-checks the same live count).
    */
  def ingest(
      s: SparkSession, indexPath: String, batchId: Long,
      batchIsEmpty: => Boolean,
      maxSegments: Option[Int], vacuumKeepGens: Option[Int],
      ledgerKeepLast: Int = DefaultKeepLast)(
      append: => Unit)(
      maybeCompact: Int => Option[Long]): Unit =
    appliedOnce(s, indexPath, batchId) {
      if (!batchIsEmpty) {
        append
        cadence(s, indexPath, maxSegments, vacuumKeepGens,
          ledgerKeepLast)(maybeCompact)
      }
    }

  /** Retire markers older than the newest `keepLast` batch ids.
    *
    * Without pruning the ledger grows one empty file per micro-batch
    * forever — a year of 10 s triggers is ~3 M files in one directory,
    * a real namenode/listing liability on the index filesystem even
    * though each marker is zero bytes. Pruning is safe because
    * foreachBatch's at-least-once replay only re-delivers ids at or
    * after the checkpoint's last UNCOMMITTED batch — by the time a
    * marker is `keepLast` batches old, the checkpoint has committed
    * far past it and the id can never be offered again. `keepLast`
    * defaults far above any real replay depth (replays reach back
    * one, maybe two ids) so the margin costs nothing.
    *
    * O(listing) once per call; callers invoke it on the COMPACT
    * cadence ([[cadence]]), not per batch, so the listing itself is
    * amortized over `maxSegments` micro-batches.
    */
  def prune(
      s: SparkSession, root: String,
      keepLast: Int = DefaultKeepLast): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be positive")
    val dir = new Path(s"$root/stream_ledger")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else {
      val ids = fs.listStatus(dir).toSeq
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
        .sorted
      val drop = ids.dropRight(keepLast)
      drop.foreach(id => fs.delete(path(root, id), false))
      drop
    }
  }

  /** The compact-cadence tail of [[ingest]], reusable where the batch
    * body has extra legs (the probe-then-ingest streams): fire the
    * index's `maybeCompact` at the live-segment bound, then the
    * generations-graced superseded vacuum, then the marker prune —
    * all three maintenance legs share one cadence so a long-lived
    * stream bounds segments, superseded disk, AND ledger file count
    * together.
    */
  def cadence(
      s: SparkSession, indexPath: String,
      maxSegments: Option[Int], vacuumKeepGens: Option[Int],
      ledgerKeepLast: Int = DefaultKeepLast)(
      maybeCompact: Int => Option[Long]): Unit =
    maxSegments.foreach { ms =>
      maybeCompact(ms).foreach { _ =>
        vacuumKeepGens.foreach(
          graft.ops.IndexCommit.vacuumSuperseded(s, indexPath, _))
        prune(s, indexPath, ledgerKeepLast)
      }
    }
}
