package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`
  * vectors). Three paths:
  *
  *   - brute-force cosine top-k against a (small, broadcast) query
  *     set — the exactness baseline; cost O(|queries| · N), never
  *     N × N
  *   - hyperplane-LSH bucketed ANN — the 100 TB path: deterministic
  *     signed random projections (md5-derived, no RNG state) bucket
  *     the corpus, candidates come from bucket joins only
  *   - IVF coarse quantization — centroid cells probed per query
  *
  * Vector math uses the engine's native codegen'd expressions
  * ([[graft.plans.DotProduct]] / [[graft.plans.CosineSimilarity]]);
  * the built-in `zip_with` + `aggregate` formulation is kept as the
  * portable fallback and reference semantics — both accumulate
  * sequentially left-to-right, so results are bit-identical (pinned by
  * PlansSpec and the cross-engine oracles).
  */
object Similarity {

  /** The test fixture's embedding dimensionality — the ONE constant
    * the DuckDB PCA oracle (whose SQL must inline the all-ones seed
    * and the per-dimension unnest width as literals) shares with the
    * fixture, so a dimensionality change breaks loudly in one place
    * instead of silently desyncing engine and oracle. The ENGINE
    * never reads this: [[pcaTopComponent]] derives dims from the
    * data itself.
    */
  val FixtureDims: Int = 64

  /** Scan with float→double promotion (exact) for stable arithmetic. */
  def load(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Sequential-fold dot product via the engine's native codegen'd
    * expression (registered by [[graft.plans.GraftExtensions]]) —
    * bit-identical to [[dotHof]], which it replaces in every hot loop.
    */
  def dot(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Built-in higher-order-function formulation of the dot product
    * (interpreted — Spark HOFs are CodegenFallback): the portable
    * fallback and the reference semantics for
    * [[graft.plans.DotProduct]]; parity is pinned by PlansSpec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the engine's native codegen'd expression
    * (registered by [[graft.plans.GraftExtensions]]); bit-identical to
    * `dot(a,b) / (l2norm(a) * l2norm(b))` but a single fused primitive
    * loop instead of interpreted higher-order functions.
    */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Per-vector L2 norm (the fixture's vectors are unit-normalized —
    * this also serves as the multimodal-column arithmetic smoke).
    */
  def norms(s: SparkSession, dir: String): DataFrame =
    load(s, dir).select(col("vec_id"), l2norm(col("v")).as("l2"))

  /** Johnson-Lindenstrauss RADEMACHER projection: the 64-dim
    * embeddings reduced to `dims` coordinates against a FIXED ±1 sign
    * matrix derived from md5 (data-independent, so the oracle
    * rebuilds it bit-identically). Each output coordinate is one
    * sequential-fold [[dot]] against a literal sign row — row-local,
    * zero exchanges; at 100 TB this is the cheap distance-preserving
    * compression (pairwise distances within 1±ε whp) that cuts every
    * downstream ANN/cluster pass's bytes by dims/64.
    */
  def randomProjection(s: SparkSession, dir: String,
      dims: Int = 8, srcDim: Int = 64): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Double = {
      val b = md.digest(s"jl#$j#$i".getBytes("UTF-8"))(0) & 0xff
      if ((b & 1) == 0) 1.0 else -1.0
    }
    val signRows = (0 until dims).map(j =>
      (0 until srcDim).map(i => sign(j, i)))
    val projCols = signRows.zipWithIndex.map { case (r, j) =>
      dot(col("v"), typedLit(r)).as(s"p$j")
    }
    load(s, dir).select(col("vec_id") +: projCols: _*)
  }

  /** Brute-force cosine top-k: the first `numQueries` vectors are the
    * query set (broadcast); every corpus vector is scored against each
    * query in one pass; per-query top-k via ranking window over the
    * (tiny) query partition count.
    */
  def cosineTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10
  ): DataFrame = {
    val emb = load(s, dir)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.select(col("query_id"), col("vec_id"), col("score"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Deterministic ±1 hyperplane coefficients derived from
    * md5("plane,dim") byte-0 parity — reproducible on any cluster (no
    * RNG state) AND computable in plain SQL (`substr(md5(..), 2, 1)`
    * parity), which is what lets the whole LSH pipeline be pinned by a
    * cross-engine DuckDB oracle.
    */
  private[graft] def planeCoefs(numPlanes: Int, dims: Int): IndexedSeq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        val bytes = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p,$d".getBytes("UTF-8"))
        if ((bytes(0) & 1) == 1) 1.0 else -1.0
      }
    }

  /** Hyperplane-LSH signature: `numPlanes` sign bits packed in a long.
    * Each plane projection is one native [[dot]] against the plane's
    * coefficient vector inlined as a literal — a narrow, codegen'd
    * projection with zero shuffle. (An earlier formulation posexploded
    * to (vec, dim) rows and hash-aggregated per-plane sums: an extra
    * N×dims-row Exchange that this shape does not need; a per-plane
    * `aggregate(zip_with(...))` chain was ~10x slower still.)
    * `emb` must have columns (vec_id, v: array<double>).
    */
  def lshSignaturesDf(emb: DataFrame, numPlanes: Int = 16): DataFrame = {
    val dims = emb.select(size(col("v"))).take(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val coefs = planeCoefs(numPlanes, dims)
    val sig = (0 until numPlanes)
      .map(p => when(dot(col("v"), typedLit(coefs(p))) > 0, lit(1L << p))
        .otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    emb.select(col("vec_id"), col("v"), sig.as("sig"))
  }

  def lshSignatures(s: SparkSession, dir: String, numPlanes: Int = 16): DataFrame =
    lshSignaturesDf(load(s, dir), numPlanes)

  /** ANN top-k via LSH bucketing: candidates for a query are corpus
    * vectors sharing at least one signature band (pigeonhole over
    * `numBands` bands), scored exactly, ranked per query. Recall vs
    * the brute-force baseline is pinned in DedupSpec; the full
    * pipeline (signatures → bands → candidates → scores → ranks) is
    * pinned by a cross-engine DuckDB oracle (the md5-derived
    * coefficients are computable in plain SQL).
    */
  def annTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10,
      numPlanes: Int = 16, numBands: Int = 4
  ): DataFrame = {
    val width = numPlanes / numBands
    // cached: the signature relation feeds both bucket-join sides, the
    // candidate re-attach AND the query side — uncached, each consumer
    // re-runs the scan + numPlanes native dot products
    val sigs = lshSignatures(s, dir, numPlanes).cache()
    val bandStructs = (0 until numBands).map { bnd =>
      // width-64 (numBands = 1): (1L << 64) wraps to 1L — use the
      // full-word mask instead of a zero mask that would collapse
      // every signature into one bucket (see SimSigIndex.banded)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      val key = shiftright(col("sig"), bnd * width)
        .bitwiseAND(mask)
      struct(lit(bnd).as("band"), key.as("key"))
    }
    // band on ids only: the distinct shuffles 16-byte pairs, never the
    // vectors — those re-attach afterward via joins against the
    // (comparatively tiny) vector table
    val banded = sigs.select(col("vec_id"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val q = banded.filter(col("vec_id") < numQueries)
      .toDF("query_id", "band", "key")
    val candIds = banded.join(broadcast(q), Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val emb = sigs.select(col("vec_id"), col("v"))
    val cand = candIds
      .join(emb, "vec_id")
      .join(broadcast(emb.filter(col("vec_id") < numQueries)
        .toDF("query_id", "qv")), "query_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    cand.select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("score"))
      .select(col("query_id"), col("vec_id"), col("score"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Per-row nearest-cell assignment against a driver-resident centroid
    * set (in real IVF the centroids are the k-means output — small and
    * driver-side by construction; here the first `numCells` vectors).
    * The centroids are inlined as literals, so the `top` nearest cells
    * per row come from one projection computing all cell cosines plus a
    * per-row sort of a `numCells`-element array — a narrow map with
    * ZERO Exchange (pinned by DedupSpec), where the previous
    * formulation joined every vector against the broadcast centroids
    * and ranked via `Window.partitionBy` — a full shuffle of
    * `numCells`× the corpus vector volume for an argmax needing none.
    * Ordering matches the oracle: cosine desc, cell asc on ties.
    */
  private[graft] def assignCells(
      in: DataFrame, vCol: String,
      cents: Seq[(Long, Seq[Double])], top: Int
  ): DataFrame = {
    val scored = cents.map { case (cellId, cv) =>
      // negated score: natural ascending struct sort = score desc. A
      // zero-norm vector (or centroid) makes the cosine null — Spark's
      // ascending struct sort would put the null FIRST (an arbitrary
      // "nearest" cell) while the oracle's ORDER BY … DESC NULLS LAST
      // puts it last; coalescing to +Inf pins the degenerate case to
      // "worst" on both engines.
      struct(coalesce(-cosine(col(vCol), typedLit(cv)),
          lit(Double.PositiveInfinity)).as("ncs"),
        lit(cellId).as("cell"))
    }
    val topCells = slice(array_sort(array(scored: _*)), 1, top)
    in.select(in.columns.map(col) :+ explode(topCells).as("__c"): _*)
      .withColumn("cell", col("__c.cell")).drop("__c")
  }

  /** One deterministic Lloyd (k-means) iteration: assign every vector
    * to its nearest centroid (narrow projection, zero Exchange), then
    * recompute each centroid as its cell's per-dimension mean. The
    * mean is DECIMAL(27,12)-mediated — decimal sums are exact and
    * therefore partition-order-independent, so the refined centroids
    * are bit-reproducible on any cluster AND in the DuckDB oracle
    * (`CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / count`). An
    * emptied cell keeps its previous centroid (same rule in the
    * oracle's `coalesce`). Driver cost is `numCells × dims` collected
    * rows per iteration — centroids are driver-resident by
    * construction.
    */
  /** The deterministic coarse-quantizer seed rule shared by every IVF
    * path: the `numCells` lowest vec_ids — `orderBy.limit`, the same
    * rule [[VectorIndex.build]] persists and the oracle's `c0` CTE
    * (`ORDER BY vec_id LIMIT n`) mirrors. Robust to id gaps or 1-based
    * corpora, where a `vec_id < n` carve would silently seed fewer
    * cells.
    */
  private[graft] def seedCentroids(
      emb: DataFrame, numCells: Int): Seq[(Long, Seq[Double])] =
    emb.orderBy("vec_id").limit(numCells)
      .select(col("vec_id").cast("long"), col("v"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  private[graft] def lloydStep(
      emb: DataFrame, cents: Seq[(Long, Seq[Double])]
  ): Seq[(Long, Seq[Double])] = {
    val assigned = assignCells(emb, "v", cents, 1)
    val means = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg((sum(col("x").cast("decimal(27,12)")).cast("double") /
        count(lit(1))).as("m"))
      .collect()
    val byCell: Map[Long, Seq[Double]] = means.groupBy(_.getLong(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    cents.map { case (id, old) => (id, byCell.getOrElse(id, old)) }
  }

  /** IVF-style ANN top-k: partition the corpus into `numCells` cells
    * around deterministic centroids — seeded from the first `numCells`
    * vectors, then refined by `lloydIters` deterministic k-means
    * iterations (see [[lloydStep]]) so cell balance is data-driven
    * rather than corpus-order-driven — assign every vector to its
    * nearest centroid via a narrow projection (see [[assignCells]] —
    * no shuffle of vectors), and probe only the `nprobe` nearest cells
    * per query — the coarse-quantizer shape that scales: candidate
    * cost drops from O(N) to O(N · nprobe / numCells) per query.
    * Pinned end-to-end by a cross-engine DuckDB oracle (the Lloyd
    * iterations are unrolled in SQL with the same decimal-mediated
    * means).
    */
  def ivfTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10,
      numCells: Int = 16, nprobe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    // cached: seeds collect + one assignment per Lloyd iteration + the
    // final assignment + the query side all re-read it
    val emb = load(s, dir).select(col("vec_id"), col("v")).cache()
    val seeds = seedCentroids(emb, numCells)
    val cents = (1 to lloydIters).foldLeft(seeds)((c, _) => lloydStep(emb, c))
    val assigned = assignCells(emb, "v", cents, 1)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = assignCells(q, "qv", cents, nprobe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("score"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"), col("score"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Multi-probe IVF with ADC (asymmetric-distance) scoring over SQ8
    * codes: the query stays full-precision while every CANDIDATE is
    * scored against its int8 code — the memory layout that makes a
    * 100 TB vector corpus RAM-feasible (4× smaller than floats, and
    * the float column is never read on the serving path; see
    * [[VectorIndex.probeAdc]] for the persisted variant whose
    * ReadSchema proves it). For the cosine metric the per-vector
    * dequantization multiplier cancels EXACTLY — cosine(qv, scale·q) =
    * cosine(qv, q) for scale > 0 — so the ADC score is simply the
    * cosine against the integer code vector, bit-reproducible in both
    * engines (the code bytes themselves are oracle-pinned by
    * `sim_quantize`). Probing is multi-cell from the start (`nprobe`
    * nearest centroids per query), same Lloyd chain as [[ivfTopK]].
    */
  def ivfAdcTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10,
      numCells: Int = 16, nprobe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    val emb = load(s, dir).select(col("vec_id"), col("v")).cache()
    val seeds = seedCentroids(emb, numCells)
    val cents = (1 to lloydIters).foldLeft(seeds)((c, _) => lloydStep(emb, c))
    // one narrow projection carries BOTH the cell argmax and the SQ8
    // codes — assignment and quantization share the scan, no join
    val members = assignCells(withInt8Codes(emb), "v", cents, 1)
      .select(col("vec_id"), col("cell"),
        expr("transform(q, x -> CAST(x AS DOUBLE))").as("qd"))
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = assignCells(q, "qv", cents, nprobe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    probes.join(members, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qd"), col("qv")).as("score"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"), col("score"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** The embeddings fixture UNIONED with planted near-dup twins: for
    * vec_id % 100 = 7, a twin at vec_id + [[PerceptualHash.TwinOffset]]
    * whose first coordinate is scaled by exactly 1.25 (rest identical).
    * cos(v, v') = (1 + t/4) / sqrt(1 + 9t/16) for t = v₀²/‖v‖² ∈ [0,1],
    * minimized at t = 4/9 → ≥ 0.99381 — always above the 0.9 near-dup
    * bar, never an exact duplicate. The raw corpus has NO pairs at
    * 0.9, so without the plant the near-dup oracle is vacuous; the
    * 1.25 factor (exactly representable) and the sequential-fold dot
    * keep every planted score bit-reproducible cross-engine.
    */
  private[graft] def loadWithTwins(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir)
    base.unionByName(
      base.filter(col("vec_id") % 100 === 7)
        .select((col("vec_id") + graft.ops.PerceptualHash.TwinOffset)
          .as("vec_id"),
          col("label"),
          concat(array(col("v")(0) * lit(1.25)),
            slice(col("v"), lit(2), size(col("v")) - 1)).as("v")))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, via LSH
    * banding + exact verification (same shape as MinHash-LSH dedup),
    * over the embeddings table AS STORED — fixture planting is the
    * caller's business ([[graft.SparkEntry]]'s sim_near_dup
    * registration unions [[loadWithTwins]] so its oracle exercises
    * the positive path; a production caller pointing this at real
    * embeddings gets exactly its own vectors, mirroring how
    * [[Multimodal.videoTable]] is explicitly a fixture generator).
    * The oracle mirrors the banded candidate generation (the
    * sim_ann_lsh precedent — hyperplane LSH is not exhaustive, so an
    * all-pairs oracle could only ever agree on empty); recall vs
    * brute force is pinned separately (sim_recall_eval, DedupSpec).
    *
    * Band-key width is the densify knob: 16 planes (4-bit keys, 16
    * buckets/band) collapse at corpus scale — SCALE_r12 measured the
    * candidate join going quadratic (127× work at 10× data) — so the
    * default is 64 planes in 4 bands of 16 bits (65 536 buckets/band):
    * signatures cost 4× more row-local dots, candidate volume drops to
    * ≈ true-similar pairs, and the 10× growth lands sublinear. Beyond
    * ~10⁶ vectors per bucket-space, shard by band-key prefix or move
    * to the IVF path.
    *
    * Output bound: pair enumeration is inherently Ω(output), and
    * output grows QUADRATICALLY in duplicate-class size — a document
    * mirrored n times with byte-identical embeddings contributes
    * C(n,2) pairs (the video pair form's measured blow-up, SCALE_r13
    * §2, applies verbatim). Use this form when the pairs themselves
    * are the product; for dedup decisions at scale use
    * [[cosineNearDupClustersDf]] (node-proportional output, identical
    * components) or, signing-free over a committed corpus,
    * [[SimSigIndex.clusters]].
    */
  def cosineNearDupPairs(
      s: SparkSession, dir: String, threshold: Double = 0.9,
      numPlanes: Int = 64, numBands: Int = 4
  ): DataFrame =
    cosineNearDupPairsDf(load(s, dir), threshold, numPlanes, numBands)

  /** DataFrame-level variant — the fixture queries feed it
    * [[loadWithTwins]]; specs feed it hand-planted vectors. */
  def cosineNearDupPairsDf(
      emb: DataFrame, threshold: Double,
      numPlanes: Int = 16, numBands: Int = 4,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None
  ): DataFrame =
    cosineNearDupPairsOfSigs(
      lshSignaturesDf(emb, numPlanes), threshold, numPlanes, numBands,
      scope, maxBandFreq)

  /** Banding + exact-cosine verification over an ALREADY-SIGNED
    * (vec_id, v, sig) relation — split out so a persisted signature
    * index ([[SimSigIndex]]) can feed FROZEN signatures without
    * re-projecting the corpus against the hyperplanes, exactly the
    * [[PerceptualHash.nearDupPairsOfSigs]] factoring for media.
    */
  private[graft] def cosineNearDupPairsOfSigs(
      sigsDf: DataFrame, threshold: Double,
      numPlanes: Int, numBands: Int,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None
  ): DataFrame = {
    // cached for the same reason as in [[annTopK]]: both band-join
    // sides and both vector re-attach joins consume this relation —
    // registered in the caller's scope so repeated re-clustering
    // (the SimSigIndex.clusters usage) can release it instead of
    // accumulating orphaned cache entries
    val sigs = scope.cache(sigsDf)
    val candIds = bandedCandidateIds(
      sigs, numPlanes, numBands, maxBandFreq, scope)
    val vecs = sigs.select(col("vec_id"), col("v"))
    candIds
      .join(vecs.toDF("vec_a", "va"), "vec_a")
      .join(vecs.toDF("vec_b", "vb"), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("va"), col("vb")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** The (band, key) decomposition of a signed relation — row-local,
    * shared by candidate generation and the [[bandBucketDrift]]
    * telemetry so the guard measures EXACTLY the buckets the join
    * would pay for.
    */
  private def bandedKeys(
      sigs: DataFrame, numPlanes: Int, numBands: Int): DataFrame = {
    val width = numPlanes / numBands
    val bandStructs = (0 until numBands).map { bnd =>
      // width-64 (numBands = 1): (1L << 64) wraps to 1L — use the
      // full-word mask instead of a zero mask that would collapse
      // every signature into one bucket (see SimSigIndex.banded)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      val key = shiftright(col("sig"), bnd * width)
        .bitwiseAND(mask)
      struct(lit(bnd).as("band"), key.as("key"))
    }
    // id-only banding, vectors re-attached post-dedup (see annTopK) —
    // the candidate shuffle carries 16-byte pairs, not kilobyte arrays
    sigs.select(col("vec_id"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Banded candidate pairs (vec_a < vec_b), optionally under the
    * HOT-BAND guard — the embedding sibling of [[LshIndex]]'s
    * hot-shingle `maxDocFreq` (the text guard's failure mode, re-read
    * for vectors: a dense region of NEAR-identical — not bit-identical,
    * so the upstream identical-vector collapse never sees them —
    * vectors signs identically on every plane, lands its whole
    * population in ONE bucket per band, and the bucket self-join goes
    * quadratic in the region's size).
    *
    * With `maxBandFreq = Some(cap)`, a bucket larger than `cap` is
    * STAR-CAPPED instead of all-paired: every member joins only the
    * bucket's min-id representative — n−1 candidates instead of
    * C(n,2). Unlike the text guard, nothing needs persisting: band
    * keys derive row-locally from frozen signatures and verification
    * is exact cosine on the full vectors either way, so the cap is a
    * pure query-time knob — scores are never skewed, only WHICH pairs
    * are surfaced changes. Degrade direction, documented: within a
    * truly dense near-dup clique (the case that makes buckets hot)
    * member↔rep edges all verify and connected components are
    * UNCHANGED — linear cost, same clusters; if a hot bucket spans a
    * region wider than the threshold, pairs between non-rep members
    * are not surfaced (pair-form recall degrades toward the star;
    * components can under-merge) — candidates stay bounded, answers
    * stay exact-verified, never wrong. [[bandBucketDrift]] is the
    * telemetry that says WHEN the cap is live.
    */
  private[graft] def bandedCandidateIds(
      sigs: DataFrame, numPlanes: Int, numBands: Int,
      maxBandFreq: Option[Long] = None,
      scope: CacheScope = new CacheScope): DataFrame = {
    val banded = bandedKeys(sigs, numPlanes, numBands)
    maxBandFreq match {
      case None =>
        val a = banded.toDF("vec_a", "band", "key")
        val b = banded.toDF("vec_b", "band", "key")
        a.join(b, Seq("band", "key"))
          .filter(col("vec_a") < col("vec_b"))
          .select("vec_a", "vec_b").distinct()
      case Some(cap) =>
        require(cap >= 1, "maxBandFreq must be at least 1")
        // bucket stats ride the join's own (band, key) shuffle key;
        // cached because the cold self-join consumes it twice
        val withSz = scope.cache(banded
          .join(banded.groupBy("band", "key")
            .agg(count(lit(1)).as("sz"), min(col("vec_id")).as("rep")),
            Seq("band", "key")))
        val cold = withSz.filter(col("sz") <= cap)
          .select("vec_id", "band", "key")
        val coldPairs = cold.toDF("vec_a", "band", "key")
          .join(cold.toDF("vec_b", "band", "key"), Seq("band", "key"))
          .filter(col("vec_a") < col("vec_b"))
          .select("vec_a", "vec_b")
        // rep = the bucket's min id, so (rep, member) is already
        // orientation-correct
        val hotStars = withSz
          .filter(col("sz") > cap && col("vec_id") =!= col("rep"))
          .select(col("rep").as("vec_a"), col("vec_id").as("vec_b"))
        coldPairs.unionByName(hotStars).distinct()
    }
  }

  /** Corpus-side star-cap for the PROBE paths — the r15 self-join
    * guard ([[bandedCandidateIds]]) extended to the batch×corpus
    * join, closing the asymmetry VERDICT r15 named top_next: the text
    * probe inherits its persisted build-time guard, but the
    * media/embedding probes joined the batch's band keys against the
    * FULL frozen bucket — one batch member landing in a hot
    * template-family bucket of size H pulled H candidates and H
    * verifications, per matching batch member, every micro-batch.
    *
    * Semantics: among the corpus buckets the batch actually touches,
    * a bucket within `cap` contributes all members (probe output
    * unchanged), a hot bucket contributes ONLY its min-id
    * representative — so a batch member hitting a 10M-member family
    * costs 1 candidate, not 10M. Verification stays exact downstream,
    * so guarded output is a VERIFIED SUBSET of unguarded output (the
    * self-join star-cap's documented degrade direction, re-read for
    * probes: a batch doc near-dup of a hot family still surfaces its
    * pair with the family's representative — the canonical id a dedup
    * deployment wants — and only the redundant pairs with the other
    * H−1 members are dropped).
    *
    * Shape at scale, and why stats are restricted FIRST: the batch's
    * distinct (band, key) set is broadcast (probe-batch-sized by the
    * callers' `requireProbeSized` precondition) and semi-joins the
    * corpus bands — so the bucket-size aggregation runs over only the
    * touched buckets' rows, with map-side partial aggregation, never
    * a corpus-wide shuffle; per-bucket counts are identical whether
    * or not untouched buckets participate. The hot set is broadcast
    * back: its cardinality is ≤ touched_rows / cap by definition
    * (every hot bucket holds > cap members), kilobytes at any real
    * cap. Cost vs unguarded: one extra scan of the fixed-width
    * corpus-side rows (the stats leg re-reads the touched subset).
    *
    * Crash-window note: a duplicate live segment double-counts its
    * docs in a bucket's size — the cap can only trip EARLIER
    * (conservative direction), and output stays a verified subset.
    *
    * `corpusBanded` must carry (idCol, ..., band, key); all non-key
    * columns ride through untouched.
    */
  private[ops] def starCapProbeSide(
      corpusBanded: DataFrame, idCol: String, batchKeys: DataFrame,
      cap: Long): DataFrame = {
    require(cap >= 1, "maxBandFreq must be at least 1")
    val touched = corpusBanded.join(
      broadcast(batchKeys.select("band", "key").distinct()),
      Seq("band", "key"), "leftsemi")
    val hot = touched.groupBy("band", "key")
      .agg(count(lit(1)).as("sz"), min(col(idCol)).as("__star_rep"))
      .filter(col("sz") > cap)
      .select(col("band"), col("key"), col("__star_rep"))
    touched.join(broadcast(hot), Seq("band", "key"), "left")
      .filter(col("__star_rep").isNull || col(idCol) === col("__star_rep"))
      .drop("__star_rep")
  }

  /** Hot-band drift telemetry — the embedding sibling of
    * [[LshIndex.guardDrift]]: band buckets whose population exceeds
    * `maxBandFreq`, as an identity-free histogram (bucket_size,
    * n_keys, worst_case_pairs) with worst_case_pairs = n_keys ·
    * C(bucket_size, 2), the candidate volume those buckets feed an
    * UNGUARDED self-join. This is the operator's turn-the-cap-on /
    * size-the-cap signal: a dense region of near-identical vectors
    * (never collapsed — they differ in some bit) shows up here as one
    * bucket per band holding the whole region. Identity-free because
    * keys are md5-plane signature slices a human can't act on
    * directly; counts pin the same facts (the [[Dedup.skewReport]]
    * convention) — and ARE cross-engine oracle-checkable, since the
    * plane derivation is plain SQL.
    *
    * Cost: one scan of the 16-byte signature rows + a kilobyte-scale
    * aggregation — [[LshIndex.guardDrift]] economics, minus even the
    * sets explode (signatures are already fixed-width).
    */
  private[graft] def bandBucketDrift(
      sigs: DataFrame, numPlanes: Int, numBands: Int,
      maxBandFreq: Long): DataFrame =
    bandedKeys(sigs, numPlanes, numBands)
      .groupBy("band", "key").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBandFreq)
      .groupBy("bucket_size")
      .agg(count(lit(1)).as("n_keys"))
      .select(col("bucket_size"), col("n_keys"),
        expr("n_keys * (bucket_size * (bucket_size - 1) div 2)")
          .as("worst_case_pairs"))

  /** Embedding near-duplicate CLUSTERS — the bounded-output twin of
    * [[cosineNearDupPairsDf]], closing the one near-dup family gap
    * where only the pair form existed (pair enumeration is inherently
    * Ω(output), and output grows quadratically in duplicate-class
    * size: a document mirrored n times with byte-identical embeddings
    * contributes C(n,2) pairs — the exact blow-up SCALE_r13 §2
    * measured for video). Every vector is labeled with its connected
    * component over the verified-pair graph: (vec_id, component_id,
    * keep), labels component minima, singletons themselves.
    *
    * The collapse-first step uses BIT-IDENTICAL VECTORS as the
    * interchangeable-vertex class (the media forms collapse identical
    * 64-bit signatures; an embedding's signature does NOT determine
    * its exact cosine, so the sound collapse key here is the vector
    * itself): members of a class have pairwise cosine exactly 1 ≥
    * threshold (an intra-class edge always exists), identical
    * hyperplane signatures (hence identical band candidacy), and
    * identical scores against every other vector — so collapsing a
    * class to its min-id representative before the banded join is
    * EXACTLY equivalent to components over all pairs (spec-pinned
    * against the direct derivation), while an n-member class costs n
    * rows instead of C(n,2) join outputs. Zero vectors are their own
    * singletons (their cosine is NaN against everything, including
    * themselves — never an edge), kept out of the collapse so two
    * zero vectors are never spuriously clustered.
    */
  def cosineNearDupClustersDf(
      emb: DataFrame, threshold: Double,
      numPlanes: Int = 64, numBands: Int = 4,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None
  ): DataFrame =
    cosineNearDupClustersOfSigs(
      lshSignaturesDf(emb, numPlanes), threshold, numPlanes, numBands,
      scope, maxBandFreq)

  /** [[cosineNearDupClustersDf]] over an already-signed (vec_id, v,
    * sig) relation — the [[SimSigIndex]] route, where the signatures
    * are frozen on disk and the corpus is never re-projected.
    */
  private[graft] def cosineNearDupClustersOfSigs(
      sigsDf: DataFrame, threshold: Double,
      numPlanes: Int, numBands: Int,
      scope: CacheScope = new CacheScope,
      maxBandFreq: Option[Long] = None
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      "cosine(v, v) = 1 must clear the bar for the identical-vector " +
        "collapse to be exact — threshold must be in (0, 1]")
    val e = scope.cache(sigsDf.select("vec_id", "v", "sig"))
    val nzCond = dot(col("v"), col("v")) > 0
    // identical-vector classes: min id is the representative; the
    // class's signature is any member's (identical vectors sign
    // identically — min is a deterministic pick, not a choice)
    val classes = scope.cache(e.filter(nzCond).groupBy("v")
      .agg(min(col("vec_id")).as("rep"), min(col("sig")).as("sig")))
    // the hot-band cap (if any) applies over class REPRESENTATIVES:
    // bit-identical duplicates already collapsed, so a hot bucket
    // here is genuinely a dense NEAR-identical region — the case the
    // star-cap exists for ([[bandedCandidateIds]]'s degrade contract)
    val pairs = cosineNearDupPairsOfSigs(
      classes.select(col("rep").as("vec_id"), col("v"), col("sig")),
      threshold, numPlanes, numBands, scope, maxBandFreq)
    // zero vectors map to THEMSELVES and never enter the pair graph
    // (their cosine is NaN against everything, including each other),
    // so two identical zero vectors are never spuriously clustered
    val members = e.filter(nzCond)
      .join(classes.select("v", "rep"), Seq("v"))
      .select(col("vec_id"), col("rep"))
      .unionByName(e.filter(!nzCond)
        .select(col("vec_id"), col("vec_id").as("rep")))
    Dedup.labelComponents(members, "vec_id",
      pairs.select(col("vec_a").as("u"), col("vec_b").as("v")), scope)
  }

  /** Symmetric int8 scalar quantization (SQ8) of the embedding column —
    * the memory-layout step that shrinks a vector index 4× before ANN
    * serving. Per vector: `scale = max|x_i| / 127`, `q_i = floor(x_i /
    * scale + 0.5)` — the floor(+0.5) form instead of `round` because
    * floor is IEEE-exact in both engines while half-even vs half-up
    * tie conventions differ; the result is guaranteed in [-127, 127].
    * Emits per-vector audit stats plus an md5 fingerprint of the full
    * quantized payload, so the oracle pins every component byte
    * without shipping arrays through the compare.
    *
    * Shape at scale: narrow per-row higher-order-function math inside
    * one scan — zero exchanges, zero driver state; the float→double
    * promotion is exact, every subsequent step is deterministic IEEE
    * double arithmetic, so the quantized corpus is bit-reproducible on
    * any cluster (and cross-engine, which is what the oracle proves).
    */
  /** Append (scale, q) SQ8 columns to a (…, v) relation — the shared
    * quantization arithmetic of [[quantizeInt8]], [[ivfAdcTopK]] and
    * [[VectorIndex]]'s codes table. Narrow, zero exchanges.
    */
  private[graft] def withInt8Codes(emb: DataFrame): DataFrame = {
    val amax = aggregate(col("v"), lit(0.0),
      (acc, x) => greatest(acc, abs(x)))
    // empty vector → NULL scale, matching the oracle's list_max
    // aggregate (NULL over an empty list) instead of the fold seed
    val q = expr(
      """CASE WHEN scale = 0D THEN transform(v, x -> 0)
        |ELSE transform(v, x -> CAST(floor(x / scale + 0.5D) AS INT))
        |END""".stripMargin)
    emb.withColumn("scale",
        when(size(col("v")) === 0, lit(null).cast("double"))
          .otherwise(amax / lit(127.0)))
      .withColumn("q", q)
  }

  def quantizeInt8(s: SparkSession, dir: String): DataFrame =
    quantizeStatsDf(load(s, dir).select(col("vec_id"), col("v")))

  /** [[quantizeInt8]] over an arbitrary (vec_id, v) relation — split
    * out so the degenerate-input contract (empty vector → NULL stats,
    * the oracle's list-aggregate algebra) is spec-testable.
    */
  private[graft] def quantizeStatsDf(emb: DataFrame): DataFrame = {
    withInt8Codes(emb)
      .select(col("vec_id"), col("scale"), col("q"))
      .select(
        col("vec_id"),
        // raw double, deliberately un-rounded: every input step is
        // bit-deterministic cross-engine, and a round() would ADD a
        // tie-convention divergence risk rather than remove one
        col("scale"),
        // fold seeds would surface on an empty vector (qmin 127 >
        // qmax -127) where the oracle's list aggregates return NULL —
        // guard the degenerate case to NULL on both engines
        expr("""CASE WHEN size(q) = 0 THEN NULL
                ELSE aggregate(q, 127, (a, x) -> least(a, x)) END""")
          .as("qmin"),
        expr("""CASE WHEN size(q) = 0 THEN NULL
                ELSE aggregate(q, -127, (a, x) -> greatest(a, x)) END""")
          .as("qmax"),
        expr("""CASE WHEN size(q) = 0 THEN NULL
                ELSE aggregate(q, 0L, (a, x) -> a + x) END""").as("qsum"),
        expr("""CASE WHEN size(q) = 0 THEN NULL
                ELSE aggregate(q, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)
                END""").as("ql2"),
        md5(concat_ws(",", expr("transform(q, x -> CAST(x AS STRING))"))
          .cast("binary")).as("qfp"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): partition the corpus into k-means cells, then
    * within each cell drop any vector whose cosine to an EARLIER
    * (lower-id) cell member reaches `eps`. The published
    * implementation sorts cluster members and drops an item when its
    * max similarity to the items preceding it exceeds the threshold;
    * this engine uses vec_id order as the (deterministic) sort key.
    * Emits one row per vector: its cell, its max similarity to any
    * earlier cell member (null for a cell's first/only member), and
    * the keep verdict.
    *
    * Shape at scale: reuses the IVF coarse quantizer ([[assignCells]]
    * — narrow argmax over driver-resident centroids, zero Exchange;
    * Lloyd refinement as in [[ivfTopK]]), then ONE shuffle keyed on
    * cell for the within-cell self-join. The pairwise term is
    * quadratic only within a cell — exactly the paper's cost model,
    * where the cell count k is the knob that bounds it (k grows with
    * the corpus so cells stay ~constant-sized; a giant cell at 100 TB
    * means k was chosen too small, not that the plan is wrong).
    */
  def semDedup(
      s: SparkSession, dir: String, eps: Double = 0.3,
      numCells: Int = 16, lloydIters: Int = 2
  ): DataFrame =
    semDedupAssigned(kmeansCells(s, dir, numCells, lloydIters), eps)

  /** Shared coarse quantizer: seed centroids from the first `numCells`
    * vectors, refine with [[lloydStep]], assign every vector to its
    * nearest cell — the (`vec_id`, `v`, `cell`) relation [[semDedup]]
    * and [[clusterMix]] build on. Same arithmetic as [[ivfTopK]]'s
    * prefix, so one oracle SQL prefix pins all three.
    */
  private[graft] def kmeansCells(
      s: SparkSession, dir: String, numCells: Int, lloydIters: Int
  ): DataFrame = {
    val emb = load(s, dir).select(col("vec_id"), col("v")).cache()
    val seeds = seedCentroids(emb, numCells)
    val cents = (1 to lloydIters).foldLeft(seeds)((c, _) => lloydStep(emb, c))
    assignCells(emb, "v", cents, 1)
  }

  /** Corpus-composition report: how each document source distributes
    * over the embedding-space cells — the analysis behind per-topic
    * mix decisions (which [[graft.ops.TrainPrep]]'s `mix_weights`
    * then acts on at source granularity). One row per (source, cell)
    * with its count and the share of the source in the cell / the
    * cell in the source.
    *
    * Shape at scale: the cell assignment is the narrow zero-Exchange
    * argmax; the doc join is id-keyed; the aggregation is one
    * (source, cell) groupBy — cardinality sources×cells, tiny — and
    * the two share fractions ride window sums over that already-tiny
    * relation, adding no corpus-sized shuffle.
    */
  def clusterMix(
      s: SparkSession, dir: String,
      numCells: Int = 16, lloydIters: Int = 2
  ): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val cells = kmeansCells(s, dir, numCells, lloydIters)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val counts = docs.join(cells, "doc_id")
      .groupBy(col("source"), col("cell"))
      .agg(count(lit(1)).as("n"))
    val bySource = Window.partitionBy("source")
    val byCell = Window.partitionBy("cell")
    counts.select(col("source"), col("cell"), col("n"),
      (col("n") / sum(col("n")).over(bySource).cast("double"))
        .as("frac_of_source"),
      (col("n") / sum(col("n")).over(byCell).cast("double"))
        .as("frac_of_cell"))
  }

  /** Drop rule over an already-cell-assigned relation (`vec_id`, `v`,
    * `cell`) — split out so specs can plant cells directly.
    */
  private[graft] def semDedupAssigned(
      assigned: DataFrame, eps: Double): DataFrame = {
    val prior = assigned.select(
      col("vec_id").as("prior_id"), col("cell"), col("v").as("pv"))
    val later = assigned.select(col("vec_id"), col("cell"), col("v"))
    // max-over-groupBy ignores the null cosine a zero-norm vector
    // produces, same as the oracle's MAX — a vector similar only to
    // degenerate neighbors keeps its null max_prior_sim (and is kept)
    val maxPrior = later.join(prior, Seq("cell"))
      .filter(col("prior_id") < col("vec_id"))
      .groupBy(col("vec_id"))
      .agg(max(cosine(col("pv"), col("v"))).as("max_prior_sim"))
    assigned.select(col("vec_id"), col("cell"))
      .join(maxPrior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("max_prior_sim"),
        coalesce(col("max_prior_sim") < lit(eps), lit(true)).as("keep"))
  }

  /** Recall@k of the quantized multi-probe ANN path against the
    * brute-force ground truth, AS A QUERY — the evaluation harness an
    * ANN deployment runs continuously (index drift, quantizer health)
    * promoted from a spec assertion to an oracled, bench-tracked
    * relation. Per query: how many of the true top-k the ADC path
    * returned, and the recall fraction (an exact small-integer ratio,
    * so it hash-matches cross-engine).
    *
    * Shape at scale: recall is always measured over a query SAMPLE
    * (here the shared `numQueries` carve) — every relation after the
    * two top-k legs is sample-sized, and the legs themselves are the
    * already-audited ANN and brute plans.
    */
  def recallEval(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10): DataFrame = {
    require(numQueries >= 1 && k >= 1, s"bad eval params: $numQueries, $k")
    val ann = ivfAdcTopK(s, dir, numQueries, k).select("query_id", "vec_id")
    val brute = cosineTopK(s, dir, numQueries, k).select("query_id", "vec_id")
    val hits = ann.join(brute, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    // denominator is the PER-QUERY ground-truth count, not k: when the
    // corpus holds fewer than k+1 vectors the brute leg returns fewer
    // than k rows, and n_hits/k would understate recall (could never
    // reach 1.0) — hits are a subset of the brute rows, so this ratio
    // is the correct recall at every corpus size
    brute.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_true").cast("double")).as("recall"))
  }

  /** Dominant principal direction of the embedding cloud by POWER
    * ITERATION — the variance-structure telemetry an embedding
    * pipeline tracks (is the space collapsing toward one direction?)
    * and the building block of PCA whitening / spectral re-ranking.
    * Uncentered (top right singular vector of the stacked vectors /
    * top eigenvector of the Gram matrix) — centering is one broadcast
    * mean away and deliberately left out so the oracle replay stays a
    * pure iteration chain.
    *
    * One iteration: s_i = e_i·v (the native sequential-fold
    * [[dot]] against the CURRENT direction as a literal — bit-equal
    * to DuckDB's `list_dot_product`), w = Σ_i e_i·s_i accumulated
    * per dimension as `round(x·s, 12)` summed in DECIMAL(28,12) —
    * exact integers in disguise, so the cross-row sum is
    * order-independent and any partition layout produces identical
    * bits (the PageRank mediation discipline) — then v' = w/‖w‖
    * rounded to 12. The driver collects 64 rows per iteration (the
    * bounded per-round collect [[graft.ops.UnigramLm]] established)
    * to inline the next literal; the corpus is scanned once per
    * iteration with ONE dimension-keyed 64-row exchange.
    *
    * Output: (dim, loading, sigma_est) — the unit direction after
    * `iters` rounds and ‖w‖ of the last round (the dominant
    * eigenvalue estimate of ΣeeT under a unit v).
    */
  def pcaTopComponent(
      s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"need 1 <= iters <= 16: $iters")
    val emb = load(s, dir)
    // loud empty-table guard: first() on an empty relation would
    // surface as an opaque NoSuchElementException deep in the driver
    val head = emb.select(size(col("v")).as("n")).limit(1).collect()
    require(head.nonEmpty,
      s"pcaTopComponent: embeddings table under $dir is empty — " +
        "no dimensionality to derive a seed direction from")
    val dims = head(0).getInt(0)
    // all-ones seed: exactly representable at any dimensionality (the
    // iteration normalizes anyway); a fixture orthogonal to it cannot
    // occur with continuous random embeddings
    var v: Array[Double] = Array.fill(dims)(1.0)
    var out: DataFrame = null
    for (_ <- 1 to iters) {
      val vlit = array(v.map(lit(_)): _*)
      val scored = emb.select(col("v"), dot(col("v"), vlit).as("sc"))
      val w = scored
        .select(col("sc"), posexplode(col("v")).as(Seq("d", "x")))
        .select(col("d"),
          round(col("x") * col("sc"), 12).cast("decimal(28,12)").as("p"))
        .groupBy("d").agg(sum("p").cast("double").as("w"))
      val n2 = w.select(
        sum(round(col("w") * col("w"), 12).cast("decimal(28,12)"))
          .cast("double").as("n2"))
      out = w.crossJoin(broadcast(n2))
        .select(col("d").as("dim"),
          round(col("w") / sqrt(col("n2")), 12).as("loading"),
          sqrt(col("n2")).as("sigma_est"))
      v = out.orderBy("dim").collect().map(_.getAs[Double]("loading"))
    }
    out
  }
}
