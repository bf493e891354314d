package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the storage half of the incremental
  * ingestion shape ([[Dedup.incrementalDedupPairs]] computes both sides
  * in one job; here the corpus side is built ONCE and written to
  * parquet, and arriving batches probe it without touching corpus
  * text again).
  *
  * Index layout (all parquet; `bands`/`sets` are SEGMENTED via
  * [[IndexCommit]] — each `<path>/v=<id>/` holds one batch's delta,
  * published by commit marker, and readers union the committed
  * segments):
  *   - `v=<id>/bands` — (doc_id, band, key): the banded MinHash
  *     signatures, the bucket-join side of candidate generation.
  *   - `v=<id>/sets`  — (doc_id, shingles: array<bigint>): each
  *     document's sorted hashed-shingle set, pre-aggregated so
  *     probe-time verification is a row-local `array_intersect` — no
  *     second shuffle over corpus shingles.
  *   - `hot`    — (shingle): the shingles the `maxDocFreq` skew guard
  *     DROPPED at build time. Probes anti-join their shingles against
  *     this set so batch and index shingle sets stay consistent — a
  *     guard recomputed over a small batch would keep shingles the
  *     index dropped and skew every Jaccard it participates in.
  *     Build-owned, outside the segment protocol; [[refreshGuard]]
  *     supersedes it with committed versions under `guard/v=<id>/hot`
  *     when append-driven drift warrants (readers take the newest).
  *   - `meta`   — text sidecar (n, num_hashes, rows_per_band): the hash
  *     configuration, read back at probe time so a probe can never run
  *     with mismatched shingle width or banding. Build-owned,
  *     immutable.
  * Delta segments (not full snapshots) because the relations are
  * corpus-proportional: an append stays batch-sized, and the marker
  * still makes it atomic — a killed append's segment has no marker
  * and is invisible forever, so probes and running streams only ever
  * see whole batches.
  *
  * Scale: the index is corpus-proportional but TEXT-FREE — 8-byte
  * hashes only, typically ~2% of corpus bytes. Build is the same two
  * shuffles as the self-join dedup (shingle distinct, signature
  * groupBy); probes cost is proportional to the BATCH. A production
  * deployment would additionally bucketBy(key) the bands relation so
  * probe bucket-joins skip the shuffle entirely; plain parquet keeps
  * this readable by any engine and the probe's one shuffle is
  * batch-sized anyway.
  */
object LshIndex {

  final case class Meta(n: Int, numHashes: Int, rowsPerBand: Int)

  /** Build the index from the corpus at `dir` (optionally restricted
    * by `docFilter`) and write it under `path`.
    */
  def build(
      s: SparkSession, dir: String, path: String,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      maxDocFreq: Option[Double] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None
  ): Unit = {
    val scope = new CacheScope
    try {
      val docs = docFilter.foldLeft(
        s.read.parquet(s"$dir/documents.parquet"))((d, f) => d.filter(f))
      // one cached pre-guard shingle lineage feeds the hot-set
      // aggregation AND (guarded) the bands + sets writes —
      // [[Dedup.hashedShingles]]' guard is inlined here because the
      // index must PERSIST the casualties, which that method discards
      val base = Dedup.hashedShingles(docs, n, None, scope)
      val hot = scope.cache(maxDocFreq match {
        case None => base.select("shingle").limit(0)
        case Some(f) =>
          val total = docs.count()
          base.groupBy("shingle").agg(count(lit(1)).as("df"))
            .filter(col("df") > (f * total).toLong)
            .select("shingle")
      })
      val sh = base.join(broadcast(hot), Seq("shingle"), "left_anti")
        .select("doc_id", "shingle")
      // rebuild = reset + base segment: destructive by contract (run
      // on a fresh path or during downtime — a rebuild changes the
      // hash configuration readers interpret every segment under, so
      // no marker protocol can make it safe beneath live probes;
      // APPEND is the hot-path-safe operation)
      IndexCommit.reset(s, path)
      // the guard sub-protocol resets with the build: refreshed guard
      // versions describe the PREVIOUS corpus's drift
      IndexCommit.reset(s, guardRoot(path))
      hot.write.mode("overwrite").parquet(s"$path/hot")
      // driver-known scalars → text sidecar: probes (one per
      // streaming micro-batch) read the hash config without a Spark
      // job (see IndexCommit.writeTextSidecar)
      IndexCommit.writeTextSidecar(s, s"$path/meta",
        Seq(n, numHashes, rowsPerBand).map(_.toString))
      val id = IndexCommit.reserve(s, path)
      val seg = IndexCommit.versionDir(path, id)
      Dedup.bandedSignatures(sh, numHashes, rowsPerBand, scope)
        .write.mode("overwrite").parquet(s"$seg/bands")
      // sort_array: a deterministic on-disk layout (the set is the
      // contract, but byte-stable files make index diffs meaningful)
      sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("shingle"))).as("shingles"))
        .write.mode("overwrite").parquet(s"$seg/sets")
      IndexCommit.commit(s, path, id)
    } finally scope.release()
  }

  /** LIVE segment dirs — the newest FULL segment ([[compact]]'s
    * product) plus everything after it; loud failure on an index with
    * no committed segment (never built, or killed mid-build).
    */
  private def segDirs(s: SparkSession, path: String): Seq[String] = {
    val ids = IndexCommit.liveIds(s, path)
    require(ids.nonEmpty, s"no committed LSH index segment at $path")
    ids.map(IndexCommit.versionDir(path, _))
  }

  /** Fold every live delta segment into ONE full segment — the
    * log-structured compaction the append/ingestion economics assume
    * (a [[graft.streaming.StreamingDedup.maintainStream]] feed
    * commits one segment per micro-batch; probes union live segments,
    * so resolution cost and file counts grow with stream length until
    * someone compacts). The union lands behind a `_FULL` marker
    * ([[IndexCommit.markFull]]): the moment its commit marker
    * appears, older deltas stop being resolved — readers never see a
    * document twice (which would DUPLICATE probe output rows through
    * the sets-attach join), and a killed compact is invisible.
    * Relation-level idempotent (re-running unions the same rows), so
    * stream cadences may fire it outside any replay ledger. Reclaim
    * superseded deltas with [[IndexCommit.vacuumSuperseded]] ONLY —
    * the positional [[IndexCommit.vacuum]] keeps "newest keep"
    * versions and would silently retire this full segment itself once
    * enough post-compact deltas accumulate (live-data loss with no
    * error). Returns the committed full-segment id.
    */
  def compact(s: SparkSession, path: String): Long =
    IndexCommit.commitFull(s, path) { (segs, dir) =>
      // distinct: a crash-window duplicate segment (ingestion stream
      // killed between append and ledger mark) must collapse here,
      // not be baked verbatim into every future full segment — the
      // probe-side pair dedup keeps answers right either way, but the
      // compact is where the duplicate STATE gets reclaimed
      s.read.parquet(segs.map(_ + "/bands"): _*).distinct()
        .write.mode("overwrite").parquet(s"$dir/bands")
      s.read.parquet(segs.map(_ + "/sets"): _*).distinct()
        .write.mode("overwrite").parquet(s"$dir/sets")
    }

  /** Compact once the live-segment count reaches `maxSegments` — the
    * [[ClusterIndex.maybeCompact]] cadence for segment-union indexes.
    * The gate self-resets (a compact leaves exactly one live
    * segment). Returns the compacted id when it fired.
    */
  def maybeCompact(
      s: SparkSession, path: String, maxSegments: Int): Option[Long] =
    IndexCommit.maybeCompactWith(s, path, maxSegments)(compact(s, path))

  private def guardRoot(path: String): String = s"$path/guard"

  /** The guard every probe/append/drift read consults: the newest
    * committed [[refreshGuard]] version when one exists, else the
    * build-time `hot` relation — so a refresh lands atomically (its
    * own [[IndexCommit]] marker sub-protocol under `guard/`) and an
    * index that never refreshes behaves exactly as before.
    */
  private[graft] def currentHot(s: SparkSession, path: String): DataFrame =
    IndexCommit.currentDir(s, guardRoot(path)) match {
      case Some(d) => s.read.parquet(s"$d/hot")
      case None    => s.read.parquet(s"$path/hot")
    }

  /** Act on [[guardDrift]]'s signal WITHOUT a rebuild: fold the
    * currently-drifted hot shingles (df over everything the index
    * holds exceeds the cutoff, absent from the current guard) into a
    * NEW committed guard version — base hot ∪ drifted, a full
    * kilobyte-scale snapshot under `guard/v=<id>`, marker-atomic.
    *
    * What the refresh changes, precisely: a bigger hot set only
    * REMOVES shingles from future probe/append shingle sets. Against
    * an indexed document whose persisted set still CARRIES the
    * drifted shingles (appended before the refresh), a pair's
    * verified Jaccard can only DECREASE (the intersection loses the
    * boilerplate, the union keeps it) — boilerplate-bridged pairs
    * shed, spec-pinned. Against a boilerplate-FREE indexed document
    * the score can RISE toward the true content similarity (the
    * union sheds junk the intersection never had) — that is the
    * guard doing its job, the same direction a full [[build]] with
    * the grown corpus's guard would move. The banded candidate set
    * shrinks statistically rather than pointwise (smaller sets
    * re-bucket signatures). Verification stays exact throughout.
    * Already-persisted segments keep the shingles inside their
    * bands/sets (erased at the next [[build]], as documented); the
    * refresh stops NEW work from feeding the skew. Returns the
    * committed guard version id.
    */
  def refreshGuard(
      s: SparkSession, path: String, maxDocFreq: Double): Long = {
    val sets = s.read.parquet(segDirs(s, path).map(_ + "/sets"): _*)
    val cutoff = (maxDocFreq * sets.count()).toLong
    val hot = currentHot(s, path)
    val drifted = sets.select(explode(col("shingles")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > cutoff)
      .select("shingle")
      .join(broadcast(hot), Seq("shingle"), "left_anti")
    val root = guardRoot(path)
    val id = IndexCommit.reserve(s, root)
    // hot sets are tiny by the guard's own definition (shingles in
    // > maxDocFreq of the corpus) — one file keeps the broadcast read
    // cheap
    hot.unionByName(drifted).coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${IndexCommit.versionDir(root, id)}/hot")
    IndexCommit.commit(s, root, id)
    id
  }

  /** Fold a new batch of documents into an existing index: the batch's
    * bands and shingle sets are appended under the index's own hash
    * configuration and hot-shingle guard, so subsequent probes see the
    * batch as part of the corpus. The periodic-compaction companion to
    * [[graft.streaming.StreamingDedup]]'s static-index probe loop:
    * probe the arriving batch first, then append it, and the index
    * tracks the corpus without ever rebuilding from text.
    *
    * Two documented drifts, both bounded and both erased by the next
    * [[build]]: the hot-shingle set stays the BUILD corpus's (a shingle
    * that becomes hot only through appends keeps feeding buckets until
    * rebuild — the guard degrades toward more candidates, never toward
    * wrong answers, because verification is exact either way;
    * [[refreshGuard]] folds measured drift back in without a
    * rebuild), and
    * appended segments accumulate until compaction (standard log-
    * structured economics). NOT idempotent under replay — a re-run
    * append double-inserts its bands; callers that need at-least-once
    * safety dedup upstream or track applied batch ids, exactly as
    * [[graft.streaming.StreamingDedup]] does for its outputs.
    *
    * Atomic and concurrency-safe: the batch lands as a fresh segment
    * published by marker, so a killed append leaves the index exactly
    * as it was (the unmarked segment is invisible forever), a running
    * probe crosses the publish without ever seeing partial files, and
    * two concurrent appends commit DISJOINT segments — the union
    * semantics merge both with no lost update (unlike a Bloom
    * snapshot OR, which must re-base).
    */
  def append(s: SparkSession, path: String, batch: DataFrame): Unit = {
    val meta = readMeta(s, path)
    val scope = new CacheScope
    try {
      val hot = currentHot(s, path)
      val sh = Dedup.hashedShingles(batch, meta.n, None, scope)
        .join(broadcast(hot), Seq("shingle"), "left_anti")
      val id = IndexCommit.reserve(s, path)
      val dir = IndexCommit.versionDir(path, id)
      Dedup.bandedSignatures(sh, meta.numHashes, meta.rowsPerBand, scope)
        .write.mode("overwrite").parquet(s"$dir/bands")
      sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("shingle"))).as("shingles"))
        .write.mode("overwrite").parquet(s"$dir/sets")
      IndexCommit.commit(s, path, id)
    } finally scope.release()
  }

  /** Hot-set drift report — the rebuild-now signal for the frozen
    * guard documented on [[append]]: shingles whose CURRENT document
    * frequency (over everything the index holds, base + appended
    * segments) exceeds the `maxDocFreq` cutoff but which are ABSENT
    * from the persisted hot set, i.e. skew the build-time guard can no
    * longer see. Returns an identity-free df-histogram:
    * (df, n_shingles, worst_case_pairs) with worst_case_pairs =
    * n_shingles · df·(df−1)/2 — the candidate-pair volume those
    * shingles can feed through band buckets, the operator's
    * rebuild-cost signal. Identity-free because the index stores
    * xxhash64 shingles, which a cross-engine oracle cannot recompute;
    * exact counts pin the same facts (the [[Dedup.skewReport]]
    * convention).
    *
    * Denominator: the documents the index HOLDS (sets cardinality —
    * docs shorter than n tokens never entered). Cutoff arithmetic
    * `df > (maxDocFreq · n).toLong` matches [[build]]'s exactly.
    *
    * Cost: one scan of the sets relation (text-free 8-byte shingles,
    * never corpus bytes) + a kilobyte-scale aggregation — an offline
    * diagnostic with [[Dedup.skewReport]] economics.
    */
  def guardDrift(
      s: SparkSession, path: String, maxDocFreq: Double): DataFrame = {
    val sets = s.read.parquet(segDirs(s, path).map(_ + "/sets"): _*)
    val cutoff = (maxDocFreq * sets.count()).toLong
    val hot = currentHot(s, path)
    sets.select(explode(col("shingles")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > cutoff)
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .groupBy("df")
      .agg(count(lit(1)).as("n_shingles"))
      .select(col("df"), col("n_shingles"),
        expr("n_shingles * (df * (df - 1) div 2)").as("worst_case_pairs"))
  }

  def readMeta(s: SparkSession, path: String): Meta = {
    val p = new Path(s"$path/meta")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory) {
      // pre-r13 builds froze the config as a one-row parquet dir
      val r = s.read.parquet(p.toString).head()
      Meta(r.getAs[Int]("n"), r.getAs[Int]("num_hashes"),
        r.getAs[Int]("rows_per_band"))
    } else {
      val lines = IndexCommit.readTextSidecar(s, s"$path/meta")
      Meta(lines(0).toInt, lines(1).toInt, lines(2).toInt)
    }
  }

  /** Probe the index with a batch of new documents (doc_id, text):
    * near-dup pairs (doc_new, doc_idx, jaccard) at `threshold` between
    * the batch and the INDEXED corpus. Batch signatures use the
    * index's own hash configuration (from `meta`) and its persisted
    * hot-shingle guard, so a pair scores identically to the one-job
    * formulation ([[Dedup.incrementalDedupPairs]]) WHENEVER the two
    * guards' hot sets coincide. The one-job form computes document
    * frequency over corpus+batch while the index persisted it over the
    * build corpus alone, so a shingle crossing the `maxDocFreq` cutoff
    * in exactly one of those populations (batch-heavy boilerplate, or
    * drift since build) can make candidate sets differ — by
    * construction, not by bug: a persisted index cannot know future
    * batches, and re-learning the guard per probe would defeat
    * incremental economics. Verification stays exact either way;
    * only candidate RECALL can differ in the divergent-hot-set case.
    * LshIndexSpec pins equality on fixtures where the hot sets agree
    * and pins the guard's effect itself separately.
    *
    * Plan shape: batch shingles/signatures are batch-sized; the bucket
    * join streams index bands past the (typically broadcastable) batch
    * bands; verification is a row-local `array_intersect` after two
    * id-keyed set lookups — candidate-set-sized, nothing
    * corpus-quadratic. Works unchanged as a `foreachBatch` body
    * ([[graft.streaming.StreamingDedup]]).
    */
  def probe(
      s: SparkSession, path: String, batch: DataFrame,
      threshold: Double = 0.8,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val meta = readMeta(s, path)
    // one committed-segment resolution for the whole probe: bands and
    // sets come from the SAME segment list even if an append commits
    // mid-probe (a candidate from a new band could otherwise miss its
    // verification set)
    val segs = segDirs(s, path)
    val hot = currentHot(s, path)
    // the index's guard, not a batch-local recount: anti-join against
    // the persisted hot set (broadcast — tiny by the guard's own
    // definition)
    val sh = Dedup.hashedShingles(batch, meta.n, None, scope)
      .join(broadcast(hot), Seq("shingle"), "left_anti")
    val bBands = Dedup
      .bandedSignatures(sh, meta.numHashes, meta.rowsPerBand, scope)
      .toDF("doc_new", "band", "key")
    val iBands = s.read.parquet(segs.map(_ + "/bands"): _*)
      .toDF("doc_idx", "band", "key")
    val cand = bBands.join(iBands, Seq("band", "key"))
      .select("doc_new", "doc_idx").distinct()
    val bSets = sh.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("sh_new"))
      .toDF("doc_new", "sh_new")
    val iSets = s.read.parquet(segs.map(_ + "/sets"): _*)
      .toDF("doc_idx", "sh_idx")
    val res = cand.join(bSets, "doc_new").join(iSets, "doc_idx")
      .select(col("doc_new"), col("doc_idx"),
        (size(array_intersect(col("sh_new"), col("sh_idx"))).cast("double") /
          (size(col("sh_new")) + size(col("sh_idx")) -
            size(array_intersect(col("sh_new"), col("sh_idx")))))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // per-PAIR dedup, not just per-candidate: a doc whose sets row
      // exists in TWO live segments (the crash window between an
      // ingestion stream's append and its ledger marker re-appends
      // the batch) would otherwise match each candidate against both
      // copies and emit the same pair twice — the safety claim is
      // "duplicated segments never change probe OUTPUT", and this is
      // where it is enforced (pair-relation-sized, cheap)
      .dropDuplicates("doc_new", "doc_idx")
      .select("doc_new", "doc_idx", "jaccard")
    res
  }
}
