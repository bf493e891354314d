package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Release handle for the relations an operator caches internally.
  * [[Dedup.hashedShingles]] (and the banded/signature relations in the
  * LSH paths) return results built ON TOP of a cached base, so
  * `result.unpersist()` on the caller side is a no-op on the
  * underlying storage. Operators register every `.cache()` here;
  * `release()` unpersists them all. Callers that don't pass a scope
  * get today's semantics: caches live until
  * `spark.catalog.clearCache()` (which Bench runs between queries).
  */
final class CacheScope {
  private val tracked = scala.collection.mutable.Buffer.empty[DataFrame]
  private val cleanups = scala.collection.mutable.Buffer.empty[() => Unit]
  private[graft] def cache(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.cache()
  }
  /** Storage that `DataFrame.unpersist` can't reach (localCheckpoint
    * RDD blocks) registers a release thunk instead.
    */
  private[graft] def onRelease(f: () => Unit): Unit = synchronized {
    cleanups += f
  }
  def release(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
    cleanups.foreach(f => try f() catch { case _: Throwable => () })
    cleanups.clear()
  }
}

/** Parallelism floor for explode-heavy pipelines over small scans —
  * the guide §2.5 input-skew remedy ("one huge unsplittable file …
  * repartition immediately after the read"), which this corpus hits in
  * miniature: `documents.parquet` is a single file with ONE parquet
  * row group, so every scan plans exactly one task and the expensive
  * row-local work downstream (tokenize, shingle explode, n-gram
  * transforms) runs SERIALLY on one core regardless of cluster size
  * (measured: 3-5 s single-task map stages at sf0.1/32 cores, repeated
  * once per consumer subtree).
  *
  * [[widen]] hash-repartitions on the row key to the session's default
  * parallelism ONLY when the input plans fewer partitions than that —
  * on any real corpus (thousands of scan splits) the guard is false
  * and the call is a NO-OP, so nothing here tunes for local mode at
  * scale's expense; a keyed repartition (not round-robin) avoids the
  * sort-before-repartition pass and stays deterministic under task
  * retry. Callers apply it immediately after a parquet read, before
  * the explode — `.rdd.getNumPartitions` on a scan-only plan is
  * driver-side and jobless.
  */
private[graft] object Par {
  def widen(df: DataFrame, key: String = "doc_id"): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key)) else df
  }
}

/** Deduplication operators over the `documents` table — the core of a
  * large-scale training-data pipeline. Core families:
  *
  *   - exact (content-hash groupBy)
  *   - exact n-gram Jaccard pairs (shingle-join candidate generation —
  *     exact because Jaccard > 0 implies a shared shingle)
  *   - MinHash+LSH near-dup (banded signatures → bucket join →
  *     exact-Jaccard verification; the 100 TB path)
  *   - SimHash (bitwise signature + pigeonhole banding on Hamming
  *     distance)
  *
  * All hashing is content-derived (md5 / xxhash64) so results are
  * deterministic across partitionings and cluster sizes — no RNG, no
  * fitted models.
  *
  * Scale: everything here is a hash-partitioned groupBy or join on
  * content-derived keys. Nothing is all-pairs: candidate generation is
  * always a co-grouped join on a shingle/band/bucket key, so cost is
  * O(sum of bucket sizes squared) not O(n²) — the standard LSH shape
  * that survives 100 TB. Frequent-shingle skew is bounded with
  * [[Dedup.hashedShingles]]' `maxDocFreq` (drops shingles present in
  * more than a fraction of docs — result-neutral at test scale, a must
  * at 100 TB; contract pinned by DedupSpec).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup: group documents by content hash; `keep_id` is the
    * first-occurrence representative (min doc id).
    */
  def exactGroups(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))

  /** Distinct word n-gram (shingle) set per document, string-keyed —
    * the reference semantics (and what the DuckDB oracles compute).
    * The hot paths use [[hashedShingles]] instead.
    */
  def shingles(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"
      )).as("shingle"))
      .distinct()

  /** The hot-path shingle relation: xxhash64'd to longs BEFORE the
    * distinct (set sizes and intersections are preserved w.h.p. —
    * 64-bit collisions over millions of distinct shingles are ~2^-40 —
    * and every downstream shuffle/sort moves 8-byte keys instead of
    * ~25-char strings), with the document-frequency skew guard applied
    * on the hashed keys, and CACHED — the scan+split+explode+distinct
    * lineage runs exactly once, feeding the guard's own df-aggregation
    * AND every downstream consumer (signatures, both verification-join
    * sides, the size counts). An earlier formulation guarded on the
    * un-cached string relation: the whole lineage materialized twice
    * (once for the hot-set aggregation, once for the main path) before
    * the cache ever saw it.
    *
    * The guard (`maxDocFreq`): drop shingles present in more than
    * `f`·(total docs) documents — near-universal boilerplate that
    * would blow up any candidate join. The broadcast side is the
    * DROPPED hot-shingle set — tiny by definition, and it shrinks as
    * the corpus grows; broadcasting the keep set would OOM exactly at
    * the scale the guard exists for. Contract pinned by DedupSpec's
    * planted-hot-shingle case: cuts candidates, preserves every pair
    * at threshold on the surviving (non-hot) shingle sets.
    */
  private[graft] def hashedShingles(
      docsDf: DataFrame, n: Int, maxDocFreq: Option[Double],
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val base = Par.widen(docsDf)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"
      )).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("shingle"))
      .distinct()
    maxDocFreq match {
      case None => scope.cache(base)
      case Some(f) =>
        // cache the PRE-guard relation only: the guard itself is a
        // map-side anti-join against a broadcast hot set whose
        // broadcast exchange is computed once per action and reused
        // (ReusedExchange) across every consumer — caching the guarded
        // output too would buy nothing but a second 400k-row cache
        // write (measured ~1-2 s at sf0.1)
        val b = scope.cache(base)
        val total = docsDf.count()
        val hot = b.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") > (f * total).toLong)
          .select("shingle")
        b.join(broadcast(hot), Seq("shingle"), "left_anti")
          .select("doc_id", "shingle")
    }
  }

  /** Exact n-gram Jaccard duplicate pairs at `threshold`. Candidate
    * pairs come from a self-join on the shingle key (any pair with
    * Jaccard > 0 shares at least one shingle, so generation is exact);
    * Jaccard = |∩| / (|A| + |B| - |∩|) over distinct shingle sets.
    */
  def ngramJaccardPairs(
      s: SparkSession, dir: String,
      threshold: Double = 0.5, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    ngramJaccardPairsDf(docs(s, dir), threshold, n, maxDocFreq, scope)

  /** DataFrame-level variant (spec corpora with planted hot shingles). */
  private[graft] def ngramJaccardPairsDf(
      docsDf: DataFrame,
      threshold: Double = 0.5, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    jaccardPairsOfShingles(
      hashedShingles(docsDf, n, maxDocFreq, scope), threshold)

  /** The Jaccard self-join core over an already-built shingle relation
    * — split out so [[dedupReport]] can share ONE shingle scan across
    * detector families.
    */
  private def jaccardPairsOfShingles(
      sh: DataFrame, threshold: Double
  ): DataFrame = {
    // Intersections come straight off the shingle-key join — one
    // shuffle, one aggregation. (An earlier formulation materialized a
    // distinct candidate-pair set and re-joined both shingle sets; at
    // sf0.1 that meant re-expanding every pair by ~80 shingles twice —
    // 40x slower for identical results.) `sh` arrives cached by
    // [[hashedShingles]]: three consumers here.
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("doc_a", "sh_a")
    val b = sh.toDF("doc_b", "sh_b")
    // shuffle-hash over sort-merge: equal-size sides on an 8-byte key
    // whose matches explode into pairs — two full sorts buy nothing
    // here, and hash join streams the probe side
    val inter = a.hint("shuffle_hash")
      .join(b, col("sh_a") === col("sh_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(cnt.toDF("doc_a", "na"), "doc_a")
      .join(cnt.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric near-containment pairs: containment(A in B) =
    * |A∩B| / |A| over distinct shingle sets — the predicate Jaccard
    * MISSES when a small document is wholly quoted inside a much
    * larger one (|A∩B|/|A∪B| shrinks with the size gap while
    * |A∩B|/|A| stays ~1; the situation RefinedWeb/CCNet-style
    * pipelines dedup on). Emits one directed row per ordered pair at
    * `threshold`, `contained` = the doc whose shingles are covered.
    *
    * Same single-scan shape as [[ngramJaccardPairsDf]] — the shared
    * shingle join feeds both directions; only the normalization
    * differs — so the candidate economics (and the `maxDocFreq`
    * guard) carry over unchanged.
    */
  def containmentPairs(
      s: SparkSession, dir: String,
      threshold: Double = 0.9, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val sh = hashedShingles(docs(s, dir), n, maxDocFreq, scope)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("doc_a", "sh_a")
    val b = sh.toDF("doc_b", "sh_b")
    val inter = a.hint("shuffle_hash")
      .join(b, col("sh_a") === col("sh_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      .join(cnt.toDF("doc_a", "na"), "doc_a")
      .join(cnt.toDF("doc_b", "nb"), "doc_b")
    // each undirected intersection yields up to two directed rows
    val ab = inter.select(col("doc_a").as("contained"),
      col("doc_b").as("container"),
      (col("i") / col("na")).as("containment"))
    val ba = inter.select(col("doc_b").as("contained"),
      col("doc_a").as("container"),
      (col("i") / col("nb")).as("containment"))
    ab.union(ba).filter(col("containment") >= threshold)
  }

  /** Consolidated duplicate report — the analyst-facing capstone over
    * the detector families: one row per candidate pair ANY detector
    * fired on, with per-family columns. Detectors:
    *
    *   - `is_exact`      — identical content (md5 fingerprint join)
    *   - `jaccard`       — exact trigram Jaccard when ≥ 0.5 (else null)
    *   - `near_dup`      — jaccard ≥ 0.8, the verified MinHash-LSH
    *     contract (LSH's candidate generation is exhaustive w.h.p. and
    *     verification is exact Jaccard, so its verified output IS this
    *     predicate — re-banding here would add shuffles to recompute
    *     the same relation)
    *   - `simhash_hamming` — SimHash distance when ≤ 3 (else null)
    *   - `n_detectors`   — how many of the four fired
    *
    * Shape: ONE cached shingle scan feeds the Jaccard self-join; the
    * exact join is fingerprint-keyed; SimHash is its own signature agg
    * + pigeonhole join; the final assembly is a distinct key union +
    * three id-keyed left joins — every join content- or id-keyed,
    * nothing all-pairs.
    */
  def dedupReport(
      s: SparkSession, dir: String,
      jaccardThreshold: Double = 0.5, nearDupThreshold: Double = 0.8,
      simhashMaxDist: Int = 3, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val d = docs(s, dir)
    val sh = hashedShingles(d, n, maxDocFreq, scope)
    val jac = scope.cache(jaccardPairsOfShingles(sh, jaccardThreshold))
    val fp = d.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
    val ex = scope.cache(
      fp.toDF("doc_a", "fp").join(fp.toDF("doc_b", "fp"), "fp")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(true).as("ex_flag")))
    val sim = scope.cache(simhashPairs(s, dir, simhashMaxDist, scope))
    val keys = jac.select("doc_a", "doc_b")
      .union(ex.select("doc_a", "doc_b"))
      .union(sim.select("doc_a", "doc_b"))
      .distinct()
    keys
      .join(jac, Seq("doc_a", "doc_b"), "left")
      .join(ex, Seq("doc_a", "doc_b"), "left")
      .join(sim.withColumnRenamed("hamming", "simhash_hamming"),
        Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("ex_flag"), lit(false)).as("is_exact"),
        col("jaccard"),
        coalesce(col("jaccard") >= nearDupThreshold, lit(false))
          .as("near_dup"),
        col("simhash_hamming"),
        (coalesce(col("ex_flag").cast("int"), lit(0)) +
          when(col("jaccard").isNotNull, 1).otherwise(0) +
          when(col("jaccard") >= nearDupThreshold, 1).otherwise(0) +
          when(col("simhash_hamming").isNotNull, 1).otherwise(0))
          .cast("int").as("n_detectors"))
  }

  /** Exact Jaccard for a given candidate-pair set: expand each pair by
    * the left side's shingles, then probe the right side on the
    * composite (doc, shingle) key — the shingle equality lives in the
    * join condition, never in a post-join filter, so the intermediate
    * is |cand| × |shingles per doc| and nothing quadratic.
    */
  private def jaccardOfCandidates(
      sh: DataFrame, cand: DataFrame, threshold: Double
  ): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("doc_a", "sh_a")
    val b2 = sh.toDF("doc_b2", "sh_b")
    // no forced broadcasts here: cand (the candidate pair set) and cnt
    // (one row per doc) are both corpus-proportional at 100 TB — AQE's
    // runtime size check converts these joins to broadcast when they
    // ARE small (as at test scale), without baking an OOM into the
    // plan at the scale the operator exists for
    val inter = cand
      .join(a, "doc_a")
      .join(b2, col("doc_b") === col("doc_b2") && col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(cnt.toDF("doc_a", "na"), "doc_a")
      .join(cnt.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature per document: `numHashes` independent minima of
    * xxhash64(seed, shingle) — native 64-bit hashing, so the hot
    * groupBy aggregates primitive longs instead of hex strings (an
    * md5-string variant measured ~5x slower at sf0.1). Deterministic
    * across partitionings and cluster sizes; engine-internal (the
    * cross-engine contract is the verified pair set, not the
    * signature bytes).
    */
  def minhashSignatures(
      sh: DataFrame, numHashes: Int = 32
  ): DataFrame = {
    val mins = (0 until numHashes).map { j =>
      min(xxhash64(lit(j), col("shingle"))).as(s"h$j")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH near-duplicate pairs: band the signature
    * (`numHashes / rowsPerBand` bands), bucket-join on (band, key),
    * then verify candidates with exact Jaccard at `threshold`.
    *
    * With 32 hashes in 16 bands of 2, a pair at Jaccard 0.8 is missed
    * with probability (1 - 0.8²)¹⁶ ≈ 8e-8 — the verified result is
    * exact w.h.p., so it is pinned against the exact-Jaccard oracle.
    */
  def minhashLshPairs(
      s: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    minhashLshPairsDf(docs(s, dir), threshold, n, numHashes, rowsPerBand,
      maxDocFreq, scope)

  /** DataFrame-level variant (spec corpora with planted hot shingles). */
  private[graft] def minhashLshPairsDf(
      docsDf: DataFrame,
      threshold: Double = 0.8, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    // maxDocFreq is the skew guard: signatures built from
    // near-universal shingles collapse docs into the same band buckets
    // and the bucket join degenerates — cut them before signing. (The
    // bench corpus has no hot shingles — max df 2% of docs — so any
    // cut above that is provably result-neutral there; at 100 TB it is
    // a must. The guard's effect is pinned by DedupSpec's planted-hot-
    // shingle corpus.)
    //
    // The shingle set feeds four consumers (signatures, both sides of
    // the verification join, the size counts) — [[hashedShingles]] is
    // cached so the scan+split+explode+distinct lineage runs once, not
    // four times (and the minhash seeds hash longs, not strings).
    val sh = hashedShingles(docsDf, n, maxDocFreq, scope)
    val bands = bandedSignatures(sh, numHashes, rowsPerBand, scope)
    val a = bands.toDF("doc_a", "band", "key")
    val b = bands.toDF("doc_b", "band", "key")
    val cand = a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    jaccardOfCandidates(sh, cand, threshold)
  }

  /** Banded MinHash signatures (`doc_id`, `band`, `key`), cached via
    * `scope`: the relation feeds both sides of every bucket join —
    * uncached, each side re-runs the 32-aggregate signature groupBy
    * (measured ~1.5 s/side at sf0.1); cached it is one
    * materialization of numBands compact rows per doc. Band keys
    * fold the band's long hashes order-sensitively with xxhash64.
    */
  private[graft] def bandedSignatures(
      sh: DataFrame, numHashes: Int, rowsPerBand: Int, scope: CacheScope
  ): DataFrame = {
    val sigs = minhashSignatures(sh, numHashes)
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}"))
        .reduce((x, y) => xxhash64(x, y))
      struct(lit(b).as("band"), key.as("key"))
    }
    scope.cache(sigs.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key")))
  }

  /** Incremental (index-reuse) near-dup detection — the production
    * ingestion shape: a NEW batch of documents arrives and must be
    * checked against the already-indexed corpus, without re-comparing
    * the corpus to itself. The batch here is the deterministic carve
    * `doc_id % 10 == 0` (same style as [[contamination]]'s benchmark
    * carve); candidates come from joining the batch's band buckets
    * against the INDEX's band buckets only — batch×batch and
    * index×index bucket collisions never become candidates — then
    * exact-Jaccard verification at `threshold`.
    *
    * Shape at scale: the banded-signature relation is precisely what
    * a production system persists as its LSH index; this operator is
    * the probe side. Candidate volume is proportional to the BATCH
    * (not the corpus), the bucket join is band/key-keyed, and
    * verification touches only candidate shingle sets. A 100 TB
    * corpus with a 0.1% daily batch does 0.1% of the full self-join's
    * work per day — that is the entire point of the operator.
    */
  def incrementalDedupPairs(
      s: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val sh = hashedShingles(docs(s, dir), n, maxDocFreq, scope)
    val bands = bandedSignatures(sh, numHashes, rowsPerBand, scope)
    val isNew = col("doc_id") % 10 === 0
    val newB = bands.filter(isNew).toDF("doc_a", "band", "key")
    val idxB = bands.filter(!isNew).toDF("doc_b", "band", "key")
    val cand = newB.join(idxB, Seq("band", "key"))
      .select("doc_a", "doc_b").distinct()
    jaccardOfCandidates(sh, cand, threshold)
      .select(col("doc_a").as("doc_new"), col("doc_b").as("doc_idx"),
        col("jaccard"))
  }

  /** Duplicate-cluster resolution — the last mile of dedup: near-dup
    * PAIRS become clusters and a canonical keep-set. Pairs come from
    * the verified MinHash-LSH path at `threshold`; connected
    * components collapse transitive chains (A~B, B~C → one cluster
    * even when A~C itself is below threshold); the representative is
    * the minimum doc id (the reference's keep-one-row-per-key update
    * semantics, `importer.py:321-330`, lifted to clusters).
    *
    * Output: one row per corpus document — (doc_id, component_id,
    * keep) where component_id is the cluster minimum and keep marks
    * the representative (singletons keep themselves). `corpus MINUS
    * keep=false` is the deduplicated training set.
    */
  def duplicateClusters(
      s: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val d = docs(s, dir)
    val pairs = minhashLshPairsDf(d, threshold, n, 32, 2, maxDocFreq, scope)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    // identity collapse: every document is its own class (text pairs
    // come from content-verified Jaccard, no cheap pre-collapse key)
    labelComponents(
      d.select(col("doc_id"), col("doc_id").as("rep")), "doc_id",
      pairs, scope)
  }

  /** The shared LAST MILE of every collapse-first cluster form — one
    * implementation of the collapse→components→label argument instead
    * of three hand-synchronized copies (text here, media in
    * [[PerceptualHash.nearDupClustersOfSigs]], embeddings in
    * [[Similarity.cosineNearDupClustersOfSigs]]; the multiset-vs-set
    * spec bug r14 caught is exactly the drift risk of keeping them
    * separate).
    *
    * Contract: `members` maps every universe element to its collapse
    * class's min-id representative — (idCol, rep), identity rows for
    * uncollapsed elements (and for elements that must stay singletons
    * regardless, e.g. zero vectors: map them to themselves and keep
    * them out of `repPairs`). `repPairs` is the verified near-dup
    * graph (u, v) BETWEEN representatives. Each family owns WHY its
    * collapse key is sound (identical media sig determines every
    * Hamming distance; a bit-identical vector determines every
    * cosine); this helper owns the shared consequence: label = the
    * rep's component when it joined any pair, else the rep itself —
    * which still folds the whole class under one label, intra-class
    * edges being implicit in the class definition. `keep` marks the
    * component minimum (singletons keep themselves).
    */
  private[graft] def labelComponents(
      members: DataFrame, idCol: String,
      repPairs: DataFrame,
      scope: CacheScope = new CacheScope): DataFrame = {
    val comp = connectedComponents(repPairs, scope)
    members
      .join(comp.withColumnRenamed("doc_id", "rep"), Seq("rep"), "left")
      .select(col(idCol),
        coalesce(col("component_id"), col("rep")).as("component_id"))
      .withColumn("keep", col(idCol) === col("component_id"))
  }

  /** The deduplicated corpus itself — what a training pipeline
    * actually ships: every document whose cluster representative it
    * is (singletons included). `keep = (doc_id == component min)`,
    * so the output is `corpus MINUS non-representatives`.
    */
  def dedupedCorpus(
      s: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val clusters = duplicateClusters(s, dir, threshold, n, maxDocFreq, scope)
    docs(s, dir)
      .join(clusters.filter(col("keep")).select("doc_id"), Seq("doc_id"))
      .select("doc_id", "lang", "source", "n_chars")
  }

  /** Quality-argmax cluster representatives — what production dedup
    * actually keeps: [[duplicateClusters]]' min-id `keep` rule is the
    * cheap default, but when a per-doc quality score exists the right
    * survivor is the BEST member of each near-dup cluster, not the
    * lowest-numbered one. Representative = argmax (flesch desc,
    * doc_id asc) over the cluster's members (singletons represent
    * themselves); ties break on doc_id, so the pick is deterministic
    * cross-engine (flesch is the 6-decimal hash-stable score).
    *
    * Shape at scale: one doc-keyed join (members × scores), then a
    * component-keyed window — rank ≤ 1 rewrites to WindowGroupLimit,
    * so each map task forwards one candidate row per component into
    * the exchange; nothing is corpus-global.
    */
  def bestRepresentatives(
      s: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3,
      maxDocFreq: Option[Double] = None,
      scope: CacheScope = new CacheScope
  ): DataFrame =
    bestRepresentativesOf(s, dir,
      duplicateClusters(s, dir, threshold, n, maxDocFreq, scope)
        .select("doc_id", "component_id"))

  /** The quality-argmax stage over an explicit (doc_id, component_id)
    * membership relation — shared by the one-job form above and the
    * persisted-index probe ([[ClusterIndex.bestRepresentatives]]),
    * so both produce identical rows by construction.
    */
  private[graft] def bestRepresentativesOf(
      s: SparkSession, dir: String, members: DataFrame): DataFrame = {
    val quality = TextOps.readability(s, dir).select("doc_id", "flesch")
    val byQuality = org.apache.spark.sql.expressions.Window
      .partitionBy("component_id")
      .orderBy(col("flesch").desc, col("doc_id").asc)
    members.join(quality, Seq("doc_id"))
      .withColumn("rk", row_number().over(byQuality))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("component_id")))
      .filter(col("rk") === 1)
      .select(col("component_id"), col("doc_id").as("rep_doc"),
        col("flesch").as("rep_flesch"),
        col("n_members").cast("int").as("n_members"))
  }

  /** Benchmark decontamination — the standard pre-training hygiene
    * pass (GPT-3 appendix C / The Pile: drop training docs sharing
    * long n-grams with an eval set). The benchmark here is carved
    * deterministically out of the corpus (every `benchMod`-th doc_id)
    * so the fixture needs no second table; in production the benchmark
    * side is the eval suites' text.
    *
    * Shape at scale: the benchmark n-gram set is FIXED-SIZE (eval
    * suites don't grow with the corpus), so it is `broadcast` — the
    * 100 TB corpus side is never shuffled, the contamination probe is
    * a map-side hash-join against a few MB of grams, and the only
    * shuffle is the per-doc hit count (keyed by doc_id). Gram strings
    * stay on the scan side of the broadcast join, so nothing wide
    * moves.
    *
    * Returns every non-benchmark document with its distinct-shared-
    * gram count and a contaminated flag ([[shingles]] is distinct per
    * doc, so `count == countDistinct`).
    */
  def contamination(
      s: SparkSession, dir: String,
      n: Int = 8, benchMod: Long = 50L): DataFrame = {
    // NOT [[shingles]]: its relational `.distinct()` would shuffle the
    // full corpus gram set just to dedup WITHIN documents. n_hits
    // counts distinct grams PER DOC, so `array_distinct` before the
    // explode is the same set — row-local, zero exchanges on the
    // corpus side.
    val sh = docs(s, dir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence(0, size(toks) - $n),
           |  i -> concat_ws(' ', slice(toks, i + 1, $n))))""".stripMargin
      )).as("shingle"))
    val isBench = col("doc_id") % benchMod === 0
    val benchGrams = sh.filter(isBench).select("shingle").distinct()
    val hits = sh.filter(!isBench)
      .join(broadcast(benchGrams), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs(s, dir).filter(!isBench).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** [[contamination]] probed through a Bloom filter instead of the
    * exact gram set — the compact-membership form for when the eval
    * suites' n-gram universe outgrows a broadcastable hash relation
    * (billions of grams × ~50 bytes each vs `mBits/8` bytes total:
    * this default is an 8 KB bitmap). One-sided by construction —
    * every truly contaminated document is flagged (no false
    * negatives); false positives occur at the classic
    * (1−e^(−kn/m))^k rate and only ever QUARANTINE clean documents,
    * the safe direction for training hygiene.
    *
    * Deterministic end-to-end: positions come from Kirsch–Mitzenmacher
    * double hashing (one md5 per gram, split into two 60-bit halves
    * h1/h2; `pos_j = (h1 + j·h2) mod mBits` — the construction proved
    * to preserve the Bloom false-positive bound with only arithmetic
    * per extra hash), so the filter, the probe, and even the false
    * positives are bit-reproducible on any engine — the DuckDB oracle
    * replays the whole construction, false positives included. (A
    * `spark.util.sketch.BloomFilter` would be comparable to build but
    * its bit layout is JVM-private — unverifiable cross-engine.) The
    * digest dominates probe cost, and the single-md5 form also makes
    * the HOF probe — interpreted, not codegen'd, in Spark — cheap:
    * one digest per gram, then integer arithmetic per j with the
    * AND-chain short-circuiting on the first clear bit.
    *
    * Shape at scale: the bench side collapses to ONE row (an
    * `mBits/64`-entry word→bits map, built from O(bench grams) rows);
    * the corpus side then has ZERO exchanges — the probe is a
    * row-local `filter` over each document's distinct grams against
    * the broadcast bitmap, inside the scan's codegen stage. Strictly
    * less data movement than [[contamination]]'s broadcast-join form,
    * which still shuffles the per-doc hit counts by doc_id.
    */
  def bloomContamination(
      s: SparkSession, dir: String,
      n: Int = 8, benchMod: Long = 50L,
      mBits: Int = 1 << 16, kHash: Int = 4): DataFrame = {
    require(mBits % 64 == 0 && kHash >= 1 && kHash <= 8,
      s"kHash must be in [1, 8]: $kHash (h1 + j*h2 with 60-bit halves " +
        "overflows signed 64-bit at j = 8)")
    val tokenized = bloomGramSets(docs(s, dir), n)
    val isBench = col("doc_id") % benchMod === 0
    val words = bloomWords(tokenized.filter(isBench), mBits, kHash)
    bloomProbe(tokenized.filter(!isBench), bloomDenseRow(words, mBits), kHash)
  }

  /** Per-doc distinct n-grams, row-local (identical set to
    * [[contamination]]'s explode — same tokenization); docs shorter
    * than n grams get an empty array, so probes need no padding join.
    */
  private[graft] def bloomGramSets(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), expr(
        s"""if(size(toks) >= $n,
           |  array_distinct(transform(sequence(0, size(toks) - $n),
           |    i -> concat_ws(' ', slice(toks, i + 1, $n)))),
           |  cast(array() as array<string>))""".stripMargin).as("grams"))

  /** Fold a gram-set relation into the filter's sparse (w, bits) word
    * relation. Double hashing off each gram's single md5: h1 = hex
    * chars 1-15, h2 = chars 16-30 (60 bits each, so h1 + 7·h2 <
    * 2^63 — no overflow for j ≤ 7, which is why kHash is capped at 8:
    * at j = 8 the position term wraps negative, silently dropping
    * build-side bits and breaking the one-sided guarantee).
    */
  private[graft] def bloomWords(
      gramSets: DataFrame, mBits: Int, kHash: Int): DataFrame = {
    require(kHash >= 1 && kHash <= 8, s"kHash must be in [1, 8]: $kHash")
    def half(i: Int): String =
      s"cast(conv(substring(hx, $i, 15), 16, 10) as bigint)"
    def posJ(j: Int): String = s"(${half(1)} + $j * ${half(16)}) % $mBits"
    gramSets
      .select(explode(col("grams")).as("gram")).distinct()
      .select(md5(col("gram")).as("hx"))
      .select(explode(array((0 until kHash).map(j =>
        expr(posJ(j))): _*)).as("p"))
      .distinct()
      .select(expr("p DIV 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
  }

  /** Densify the sparse word relation into the ONE broadcastable row
    * (`bw`: array of mBits/64 packed longs) the probe indexes.
    */
  private[graft] def bloomDenseRow(words: DataFrame, mBits: Int): DataFrame =
    words
      .agg(map_from_entries(
        collect_list(struct(col("w"), col("bits")))).as("bm"))
      .select(expr(
        s"""transform(sequence(0, ${mBits / 64 - 1}),
           |  w -> coalesce(element_at(bm, cast(w as bigint)),
           |    cast(0 as bigint)))""".stripMargin).as("bw"))

  /** The probe: all kHash bits set ⇒ bloom-positive. Pure map over the
    * corpus scan — the 1-row bitmap broadcasts and every document's
    * verdict is one [[graft.plans.BloomGramCount]] call: a fused
    * codegen'd loop, one digest per gram, early-exit on the first
    * clear bit. (The equivalent filter/transform HOF chain is
    * interpreted and measured 3x slower than even the exact
    * broadcast-join op; the native expression makes the probe pay
    * only for the digests.)
    */
  private[graft] def bloomProbe(
      gramSets: DataFrame, denseRow: DataFrame, kHash: Int): DataFrame =
    gramSets
      .crossJoin(broadcast(denseRow))
      .select(col("doc_id"),
        call_function("bloom_gram_count",
          col("grams"), col("bw"), lit(kHash)).as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)

  /** Connected components over an undirected pair set via alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014): converges in O(log n) rounds,
    * and every step is a groupBy/join on id keys — no driver-resident
    * graph, no label table the size of the corpus shipped anywhere.
    * That is the 100 TB shape; naive label propagation would need
    * O(diameter) rounds and an adversarial dup-chain makes diameter
    * linear.
    *
    * Each round is localCheckpoint'ed: iterative plans otherwise grow
    * lineage without bound (re-planning cost, stack depth). On a real
    * cluster this would be `checkpoint` into the reliable store;
    * local-mode block storage is the same contract.
    *
    * Returns (doc_id, component_id) for every node present in `pairs`
    * — component_id is the component's minimum id. Singletons (docs in
    * no pair) are absent; callers pad with a left join.
    *
    * The converged edge set's localCheckpoint blocks back the RETURNED
    * relation, so they can't be dropped here; their release registers
    * on `scope` (DataFrame.unpersist never reaches RDD-level
    * checkpoint storage — without the hook every call would leak its
    * final round's blocks for the session's lifetime).
    *
    * `checkpointDir`: when set, per-round truncation uses RELIABLE
    * `checkpoint` into that directory instead of `localCheckpoint`.
    * The tradeoff is explicit: localCheckpoint stores round state in
    * executor block storage — fastest, but losing ANY executor
    * mid-iteration kills the job (clean failure, never a wrong
    * answer); a reliable checkpoint survives executor loss at the
    * cost of one distributed-store round-trip per round. On a
    * 1000-executor run where preemption is routine, pass the job's
    * scratch prefix here; local/single-JVM runs keep the default.
    *
    * Two caveats callers own: `setCheckpointDir` mutates SESSION-
    * GLOBAL SparkContext state (concurrent ops passing different dirs
    * race — last setter wins; serialize such calls or share one dir),
    * and reliable checkpoint files are NOT removed by
    * [[CacheScope.release]] (which reaches block storage only) —
    * point `checkpointDir` at a per-job scratch prefix the platform
    * garbage-collects, or delete it after the action completes.
    */
  private[graft] def connectedComponents(
      pairs: DataFrame, scope: CacheScope = new CacheScope,
      maxRounds: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // canonical directed form: big → small, no self-loops, distinct
    val init = pairs
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var edges = truncate(init)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("u"), col("v")).as("h"))
        .agg(count(lit(1)).as("c"), expr("bit_xor(h)").as("h"))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // seed with the INPUT's signature: near-dup pair sets are often
    // already star forests (tight clusters around a min id), and the
    // seed lets round 1 detect that instead of running a confirmation
    // round — the aggregate reads the materialized checkpoint (cheap)
    var prev: Option[(Long, Long)] = Some(signature(edges))
    var converged = false
    var iters = 0
    while (!converged && iters < maxRounds) {
      // large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mL = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = sym.filter(col("v") > col("u")).join(mL, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: every (now strictly smaller) neighbor and u itself
      // link to the minimum of u's smaller neighborhood
      val mS = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(mS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      // EAGER checkpoint, deliberately: a lazy one is only filled when
      // the checkpointed RDD itself materializes, and the signature
      // aggregate below optimizes into a narrower plan that bypasses
      // it — every later round then recomputes the full growing
      // lineage (measured 2x slower at sf0.1). Eager pays one honest
      // materialization per round and truncates lineage for real.
      val next = truncate(small)
      // fixpoint test: (count, content hash) of the distinct edge set —
      // equal signatures on consecutive rounds = star forest reached.
      // bit_xor, not sum: order-independent AND overflow-free (ANSI
      // mode makes a long-sum of 64-bit hashes throw)
      val cur = signature(next)
      converged = prev.contains(cur)
      prev = Some(cur)
      unpersistCheckpoint(edges)
      edges = next
      iters += 1
    }
    // LOUD on non-convergence: the cap sits far above the O(log n)
    // need of large-star/small-star, so hitting it means a bug or
    // adversarial input — returning partial components silently would
    // poison every downstream keep-set decision
    require(converged,
      s"connected components did not converge within $maxRounds rounds")
    // the converged blocks back the returned relation — release goes
    // through the scope, after the caller's terminal action
    val converged0 = edges
    scope.onRelease(() => unpersistCheckpoint(converged0))
    // at the fixpoint every edge points a node at its component root
    edges.groupBy("u").agg(min("v").as("component_id"))
      .select(col("u").as("doc_id"), col("component_id"))
  }

  /** Release the RDD blocks behind a localCheckpoint'd relation.
    * `Dataset.unpersist` only clears CacheManager entries — the
    * checkpointed RDD's storage lives at the RDD layer, reachable via
    * the plan's LogicalRDD leaf.
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }

  /** 64-bit SimHash signature per document: bit i of the signature is
    * set iff the sum over token occurrences of (+1 if bit i of the
    * token's hash else -1) is positive.
    *
    * The per-token bit source is the first 64 bits of md5(token) —
    * md5 is bit-identical across engines, so the whole pipeline
    * (bits → signed sums → signature → hamming pairs) is reproducible
    * in portable SQL and `dedup_simhash` carries a full DuckDB oracle.
    * The 64-bit value is assembled nibble-exactly from the hex text in
    * four 16-bit chunks (`conv` of 4 hex chars each, chunk j shifted
    * to bits 16j..16j+15), the same layout the oracle re-derives with
    * strpos-based nibble parsing.
    */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val m = md5(col("tok"))
    val h = (0 until 4)
      .map(j => shiftleft(
        conv(substring(m, j * 4 + 1, 4), 16, 10).cast("long"), j * 16))
      .reduce((x, y) => x.bitwiseOR(y))
    val toks = docs(s, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .withColumn("h", h)
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs at Hamming distance ≤ `maxDist` via
    * pigeonhole banding: split the 64-bit signature into
    * `maxDist + 1` chunks — any pair within distance shares at least
    * one exact chunk, so candidates come from equi-joins on chunk
    * values (never all-pairs), then verify with bit_count.
    */
  def simhashPairs(
      s: SparkSession, dir: String, maxDist: Int = 3,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    // cached: both chunk-join sides consume the signatures — uncached,
    // each side re-runs the 64-bit-sum aggregation over every token
    val sigs = scope.cache(simhashSignatures(s, dir))
    val chunks = maxDist + 1
    val width = 64 / chunks
    val chunkStructs = (0 until chunks).map { c =>
      val key = shiftright(col("simhash"), c * width)
        .bitwiseAND((1L << width) - 1)
      struct(lit(c).as("chunk"), key.as("key"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = banded.toDF("doc_a", "sig_a", "chunk", "key")
    val b = banded.toDF("doc_b", "sig_b", "chunk", "key")
    // hamming filter BEFORE distinct: bit_count is a codegen'd per-row
    // op, while distinct is a shuffle — filtering first shrinks the
    // shuffle from every bucket collision to only true near-pairs
    a.join(b, Seq("chunk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact-substring duplication stats (the window-granular form of
    * Lee et al. 2022, arXiv:2107.06499 "Deduplicating Training Data
    * Makes Language Models Better"): slide a `w`-token window over
    * every document, find windows that appear verbatim in more than
    * `maxDocFreq` documents, and report per document how much of it is
    * duplicated text — window counts, the duplicated fraction, and the
    * longest duplicated run in tokens (consecutive duplicated windows
    * merged: `run + w - 1` tokens). `keep` applies the paper's
    * remove-spans-of-50+-duplicated-tokens rule as a doc-level flag.
    *
    * The paper builds a corpus-wide suffix array; that is a
    * single-machine construction. The Spark-native equivalent is this
    * gram-keyed shuffle: windows are md5-keyed (16 bytes, collision
    * odds 2^-128 — the same keying [[contamination]] uses), document
    * frequency is ONE partial-aggregated groupBy on the window hash,
    * and the run analysis is ONE doc-keyed window pass. Nothing is
    * all-pairs, nothing collects; both shuffles carry (doc_id, pos,
    * 16-byte hash) rows — at 100 TB this is the standard
    * windowed-ExactSubstr shape. Docs shorter than `w` tokens have no
    * windows: zero counts, NULL dup_frac, keep=true (the same padding
    * algebra as the oracle's LEFT JOIN).
    */
  def substringDupStats(
      s: SparkSession, dir: String, w: Int = 16, maxDocFreq: Int = 1,
      maxSpanTokens: Int = 50
  ): DataFrame =
    substringDupStatsDf(docs(s, dir), w, maxDocFreq, maxSpanTokens)

  /** DataFrame-level variant (`doc_id`, `text`) for planted corpora. */
  private[graft] def substringDupStatsDf(
      in: DataFrame, w: Int, maxDocFreq: Int, maxSpanTokens: Int
  ): DataFrame =
    statsFromWindows(windowHashes(in, w), in.select(col("doc_id")),
      w, maxDocFreq, maxSpanTokens)

  /** The md5-keyed `w`-token sliding windows of each document —
    * (doc_id, pos, wh). The tokenize-once relation [[SubstrIndex]]
    * persists: everything downstream ([[statsFromWindows]]) derives
    * from these hashes, never from text again.
    */
  private[graft] def windowHashes(in: DataFrame, w: Int): DataFrame =
    Par.widen(in).select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(toks) - $w),
           |          i -> md5(CAST(concat_ws(' ', slice(toks, i + 1, $w)) AS BINARY)))
           |""".stripMargin)).as(Seq("pos", "wh")))

  /** The ExactSubstr stats pipeline from a window-hash relation
    * ((doc_id, pos, wh) — computed inline by [[substringDupStatsDf]],
    * or read back from a persisted [[SubstrIndex]]) plus the doc-id
    * relation that pads short documents (< w tokens, no windows).
    */
  private[graft] def statsFromWindows(
      wins: DataFrame, docIds: DataFrame,
      w: Int, maxDocFreq: Int, maxSpanTokens: Int
  ): DataFrame =
    statsWithDf(wins,
      wins.groupBy("wh").agg(countDistinct(col("doc_id")).as("wdf")),
      docIds, w, maxDocFreq, maxSpanTokens)

  /** [[statsFromWindows]] with the window document-frequency relation
    * (`wh`, `wdf`) supplied by the caller — the hook
    * [[SubstrIndex.probe]] uses to combine persisted per-segment df
    * aggregates with a batch's own windows instead of recounting the
    * corpus.
    */
  private[graft] def statsWithDf(
      wins: DataFrame, docFreq: DataFrame, docIds: DataFrame,
      w: Int, maxDocFreq: Int, maxSpanTokens: Int
  ): DataFrame = {
    val flagged = wins.join(docFreq, "wh")
      .select(col("doc_id"), col("pos"),
        (col("wdf") > maxDocFreq).as("dup"))
    // gaps-and-islands: consecutive same-flag windows share
    // (pos - per-flag rank); counting each island of dup=true gives
    // run lengths in windows
    val isl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("dup")).orderBy(col("pos"))
    val runs = flagged
      .withColumn("grp", col("pos") - row_number().over(isl))
      .groupBy(col("doc_id"), col("dup"), col("grp"))
      .agg(count(lit(1)).as("run"))
    val perDoc = runs.groupBy("doc_id").agg(
      sum(col("run")).as("n_windows"),
      sum(when(col("dup"), col("run")).otherwise(lit(0L)))
        .as("dup_windows"),
      max(when(col("dup"), col("run")).otherwise(lit(0L))).as("max_run"))
    docIds.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        (col("dup_windows") / col("n_windows").cast("double"))
          .as("dup_frac"),
        coalesce(when(col("max_run") > 0, col("max_run") + (w - 1))
          .otherwise(lit(0L)), lit(0L)).as("max_span_tokens"),
        coalesce(when(col("max_run") > 0, col("max_run") + (w - 1))
            .otherwise(lit(0L)) < maxSpanTokens, lit(true)).as("keep"))
  }

  /** Shuffle-skew diagnostic over the shingle key space — the report
    * an operator owner reads BEFORE a 100 TB gram-keyed join: per-key
    * document frequencies summarized as distinct-key count, total key
    * mass, the exact df quantiles (p50/p90/p99 by rank arithmetic,
    * the percentiles_sketch rule r = ceil(q·n)), and the 10 hottest
    * keys with their mass share — exactly the keys the
    * `leakage_split` salting and the LSH `maxDocFreq` guard exist
    * for. Everything is an exact count; shares divide exact longs in
    * a fixed order. Shape: the shingle relation's one keyed
    * aggregation, then rank/top-k over the df RELATION, never the
    * corpus — the top-10 leg is TakeOrdered (per-partition heaps) and
    * the exact-quantile leg's global rank window is the one
    * vocabulary-bounded stage: at true corpus scale a deployment
    * swaps it for the histogram rule `percentiles_sketch` already
    * carries (bucket counts + rank walk), trading exactness within
    * a bucket width for a fully keyed plan.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val df = shingles(s, dir, 8)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .cache()
    val stats = df.agg(
      count(lit(1)).as("n_keys"), sum(col("df")).as("mass"))
    // exact quantiles via the df-VALUE histogram: |distinct df|
    // rows (df is a small integer), cumulative walk, smallest df
    // whose cumulative key count reaches rank ceil(q*n) — identical
    // to rank-selection, but the only window runs over the tiny
    // histogram, never a global sort of the key space
    val hist = df.groupBy("df").agg(count(lit(1)).as("k"))
    val wh = org.apache.spark.sql.expressions.Window
      .orderBy(col("df"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("k")).over(wh))
      .crossJoin(broadcast(stats))
    def quantile(q: Double, name: String) = cum
      .filter(col("cum") >= ceil(col("n_keys") * q))
      .agg(min(col("df")).as("v"))
      .select(lit(name).as("metric"), col("v").cast("double").as("value"),
        lit(null).cast("string").as("key"))
    val quants = quantile(0.5, "p50_df")
      .union(quantile(0.9, "p90_df"))
      .union(quantile(0.99, "p99_df"))
    val top = df.crossJoin(broadcast(stats))
      .orderBy(col("df").desc, col("shingle")).limit(10)
      .select(lit("hot_key_share").as("metric"),
        (col("df").cast("double") / col("mass").cast("double"))
          .as("value"),
        col("shingle").as("key"))
    val totals = stats.select(
      lit("n_keys").as("metric"), col("n_keys").cast("double").as("value"),
      lit(null).cast("string").as("key"))
      .union(stats.select(lit("mass"), col("mass").cast("double"),
        lit(null).cast("string")))
    totals.union(quants).union(top)
  }

  /** EDIT-DISTANCE near-dup — the typo-level modality the token
    * detectors (shingle/Jaccard, MinHash, SimHash) are blind to: a
    * one-character substitution, deletion, or insertion in a short
    * key (title, canonical URL, product code) leaves every
    * surrounding shingle intact on long fields but MISSES entirely on
    * keys shorter than the shingle width. Candidates come from the
    * FastSS deletion neighborhood: each key emits itself plus its
    * |key| single-deletion variants, and any two keys at
    * levenshtein ≤ 1 provably share a variant (equal → self;
    * substitution at i → both delete i; insertion → the longer key's
    * deletion IS the shorter), so a variant-keyed equi-join is a
    * COMPLETE candidate generator and exact `levenshtein` verifies.
    * Never all-pairs: the shuffle carries |key|+1 rows per doc and
    * candidates are bounded per variant bucket — the LSH-banding
    * shape, with the oracle doing the naive O(n²) join instead, so
    * hash equality is an equivalence proof for the decomposition.
    * Fixture: groups of 4 docs share an md5 base key; members 1-3
    * mutate it by one substitution/deletion/insertion at a
    * group-varying position, giving true matches, near-misses at
    * distance 2 (mutations at different positions), and cross-group
    * non-matches.
    */
  def editDistancePairs(s: SparkSession, dir: String): DataFrame = {
    val base = md5(concat((col("doc_id") / 4).cast("long").cast("string"),
      lit("#ed"))).substr(1, 12)
    val p = (col("doc_id") % 12).cast("int")
    val v = col("doc_id") % 4
    def sub(k: Column, at: Column): Column =
      concat(k.substr(lit(1), at), lit("z"),
        k.substr(at + 2, lit(64)))
    def del(k: Column, at: Column): Column =
      concat(k.substr(lit(1), at), k.substr(at + 2, lit(64)))
    def ins(k: Column, at: Column): Column =
      concat(k.substr(lit(1), at), lit("z"), k.substr(at + 1, lit(64)))
    val keys = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(v === 1, sub(base, p))
          .when(v === 2, del(base, p))
          .when(v === 3, ins(base, p))
          .otherwise(base).as("key"))
    // self + all single-deletion variants, all codegen'd built-ins
    val variants = keys.select(col("doc_id"), col("key"),
      explode(concat(array(col("key")),
        transform(sequence(lit(0), length(col("key")) - 1),
          i => del(col("key"), i)))).as("variant"))
    variants.as("a")
      .join(variants.as("b"),
        col("a.variant") === col("b.variant") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"))
      .distinct()
      .filter(levenshtein(col("key_a"), col("key_b")) <= 1)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("key_a"), col("key_b")).as("dist"))
  }
}
