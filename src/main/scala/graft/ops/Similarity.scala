package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`
  * vectors). Two paths:
  *
  *   - brute-force cosine top-k against a (small, broadcast) query
  *     set — the exactness baseline; cost O(|queries| · N), never
  *     N × N
  *   - hyperplane-LSH bucketed ANN — the 100 TB path: deterministic
  *     signed random projections (hash-derived, no RNG state) bucket
  *     the corpus, candidates come from bucket joins only
  *
  * Vector math uses `zip_with` + `aggregate` (sequential fold →
  * deterministic, engine-reproducible sums) in double precision.
  */
object Similarity {

  /** Scan with float→double promotion (exact) for stable arithmetic. */
  def load(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Sequential-fold dot product of two double arrays (built-in HOF
    * formulation — interpreted; kept as the portable fallback and the
    * reference semantics for [[graft.plans.CosineSimilarity]]).
    */
  def dot(a: Column, b: Column): Column =
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

  /** Hyperplane-LSH signature: `numPlanes` sign bits packed in a long,
    * with deterministic ±1 coefficients derived from
    * xxhash64(plane, dim) — reproducible on any cluster, no RNG state.
    * `emb` must have columns (vec_id, v: array<double>).
    *
    * Implementation: posexplode to (vec_id, dim, x) rows and compute
    * all plane projections as one codegen'd hash aggregation — Spark's
    * array higher-order functions are interpreted (CodegenFallback),
    * so a per-plane `aggregate(zip_with(...))` chain was ~10x slower.
    */
  def lshSignaturesDf(emb: DataFrame, numPlanes: Int = 16): DataFrame = {
    val exploded = emb.select(col("vec_id"), col("v"),
      posexplode(col("v")).as(Seq("dim", "x")))
    val projs = (0 until numPlanes).map { p =>
      sum(col("x") *
        when(xxhash64(lit(p), col("dim")).bitwiseAND(1L) === 1L, lit(1.0))
          .otherwise(lit(-1.0))).as(s"p$p")
    }
    val sums = exploded.groupBy("vec_id")
      .agg(first(col("v")).as("v"), projs: _*)
    val sig = (0 until numPlanes)
      .map(p => when(col(s"p$p") > 0, lit(1L << p)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("vec_id"), col("v"), sig.as("sig"))
  }

  def lshSignatures(s: SparkSession, dir: String, numPlanes: Int = 16): DataFrame =
    lshSignaturesDf(load(s, dir), numPlanes)

  /** ANN top-k via LSH bucketing: candidates for a query are corpus
    * vectors sharing at least one signature band (pigeonhole over
    * `numBands` bands), scored exactly, ranked per query. Recall vs
    * the brute-force baseline is pinned in SimilaritySpec.
    */
  def annTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10,
      numPlanes: Int = 16, numBands: Int = 4
  ): DataFrame = {
    val width = numPlanes / numBands
    val sigs = lshSignatures(s, dir, numPlanes)
    val bandStructs = (0 until numBands).map { bnd =>
      val key = shiftright(col("sig"), bnd * width)
        .bitwiseAND((1L << width) - 1)
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

  /** IVF-style ANN top-k: partition the corpus into `numCells` cells
    * around deterministic seed centroids (the first `numCells`
    * vectors), assign every vector to its nearest centroid in one
    * broadcast pass, and probe only the `nprobe` nearest cells per
    * query — the coarse-quantizer shape that scales: candidate cost
    * drops from O(N) to O(N · nprobe / numCells) per query, and the
    * assignment is a narrow map over the corpus (no shuffle of
    * vectors; only the small centroid set is broadcast).
    */
  def ivfTopK(
      s: SparkSession, dir: String,
      numQueries: Int = 5, k: Int = 10,
      numCells: Int = 16, nprobe: Int = 4
  ): DataFrame = {
    val emb = load(s, dir)
    val cents = emb.filter(col("vec_id") < numCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    def nearestCells(in: DataFrame, idCol: String, vCol: String, top: Int) = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("__cs").desc, col("cell"))
      in.join(broadcast(cents))
        .withColumn("__cs", cosine(col(vCol), col("cv")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= top)
        .drop("__cs", "__rn", "cv")
    }
    val assigned = nearestCells(emb.select(col("vec_id"), col("v")),
      "vec_id", "v", 1)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = nearestCells(q, "query_id", "qv", nprobe)
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

  /** Embedding near-duplicate pairs above a cosine threshold, via LSH
    * banding + exact verification (same shape as MinHash-LSH dedup).
    */
  def cosineNearDupPairs(
      s: SparkSession, dir: String, threshold: Double = 0.9,
      numPlanes: Int = 16, numBands: Int = 4
  ): DataFrame =
    cosineNearDupPairsDf(load(s, dir), threshold, numPlanes, numBands)

  /** DataFrame-level variant for testing with planted vectors. */
  def cosineNearDupPairsDf(
      emb: DataFrame, threshold: Double,
      numPlanes: Int = 16, numBands: Int = 4
  ): DataFrame = {
    val width = numPlanes / numBands
    val sigs = lshSignaturesDf(emb, numPlanes)
    val bandStructs = (0 until numBands).map { bnd =>
      val key = shiftright(col("sig"), bnd * width)
        .bitwiseAND((1L << width) - 1)
      struct(lit(bnd).as("band"), key.as("key"))
    }
    // id-only banding + distinct, vectors re-attached post-dedup (see
    // annTopK) — the candidate shuffle carries 16-byte pairs, not
    // kilobyte arrays
    val banded = sigs.select(col("vec_id"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.toDF("vec_a", "band", "key")
    val b = banded.toDF("vec_b", "band", "key")
    val candIds = a.join(b, Seq("band", "key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val vecs = sigs.select(col("vec_id"), col("v"))
    candIds
      .join(vecs.toDF("vec_a", "va"), "vec_a")
      .join(vecs.toDF("vec_b", "vb"), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("va"), col("vb")).as("score"))
      .filter(col("score") >= threshold)
  }
}
