package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches over the `documents` corpus.
  *
  * `approx_count_distinct` (HLL) answers the same question but its
  * estimate is engine-specific, so it can only ever be a rows-only
  * check against another engine. KMV (K-Minimum-Values, Bar-Yossef et
  * al. 2002) is the deterministic alternative: hash every element,
  * keep the k smallest distinct hash values, estimate the cardinality
  * from how densely they pack the hash range — (k−1) / R where R is
  * the k-th minimum normalized into [0,1). Every engine that hashes
  * with md5 and keeps the same k computes bit-identical sketches AND
  * bit-identical estimates, which makes the sketch itself
  * DuckDB-oracle-able — the property the HLL row can never have.
  *
  * Like HLL, KMV sketches merge: the union's sketch is the k smallest
  * of the union of the parts' k-minima. [[SketchesSpec]] pins that
  * merging the per-source sketches reproduces the corpus sketch
  * exactly — the property that lets 1000 executors sketch 100 TB
  * independently and combine the results losslessly on the driver.
  */
object Sketches {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** 60-bit hash: first 15 hex chars of md5, as a non-negative long.
    * 15 chars (not 16) keeps the value inside the positive signed-64
    * range on every engine — DuckDB mirrors with
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-source + whole-corpus KMV distinct-token sketches.
    *
    * Output per scope: `k_used` (how many minima the scope actually
    * has — below k the scope is exhausted and the "estimate" is the
    * exact distinct count), `kth_hash` (the largest kept minimum — the
    * sketch's boundary, pinning the whole sketch since any divergence
    * in the k-min set moves it with overwhelming probability), and
    * `est_distinct` = (k_used−1) · 2^60 / kth_hash. The int64→double
    * conversions round to nearest-even identically on the JVM and in
    * DuckDB, so the estimate hash-matches cross-engine.
    *
    * Shape at scale: the distinct is ONE (source, h)-keyed exchange
    * with map-side partial aggregation; the per-source k-minima use a
    * rank-≤-k window that Spark rewrites to WindowGroupLimit — each
    * map task forwards at most k rows per source into the exchange, so
    * the shuffle carries O(sources · k), not O(distinct tokens). The
    * corpus row re-ranks the union of the per-source minima (≤ k ·
    * sources rows — the sketch-merge, not a rescan of the corpus).
    */
  def kmvDistinctTokens(
      s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    // k = 1 would make the (k−1)/R estimator identically zero on any
    // non-exhausted scope — reject rather than return nonsense
    require(k >= 2, s"KMV needs k >= 2, got $k")
    kmvFinalize(kmvMinima(kmvHashesOf(docs(s, dir)), k), k)
  }

  /** The distinct (source, h) hash relation KMV ranks — unlike HLL,
    * KMV genuinely needs the dedup (rank semantics count each value
    * once).
    */
  private[graft] def kmvHashesOf(d: DataFrame): DataFrame =
    d.select(col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .select(col("source"), h60(col("tok")).as("h")).distinct()

  /** Per-source k smallest distinct hashes (with rank) — the KMV
    * merge unit: the union's minima are the k smallest of the UNION
    * of the parts' minima, so re-ranking merged state is lossless
    * ([[SketchIndex]]'s append is exactly this re-rank).
    */
  private[graft] def kmvMinima(in: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("h")
    in.withColumn("r", row_number().over(w)).filter(col("r") <= k)
  }

  /** Finalize per-source minima into sketch rows plus the re-ranked
    * `__all__` merge row.
    */
  private[graft] def kmvFinalize(perSource: DataFrame, k: Int): DataFrame = {
    def sketch(minima: DataFrame): DataFrame =
      minima.groupBy("source").agg(
        max("r").cast("int").as("k_used"),
        max("h").as("kth_hash"))
        .withColumn("est_distinct",
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise((col("k_used") - 1).cast("double")
              * lit(math.pow(2, 60)) / col("kth_hash").cast("double")))
    // corpus sketch by MERGE: re-rank the per-source minima only
    val merged = kmvMinima(
      perSource.select(lit("__all__").as("source"), col("h")).distinct(), k)
    sketch(perSource).unionByName(sketch(merged))
  }

  /** Histogram quantile sketch over `orders.o_totalprice` per order
    * status — the deterministic alternative to `approx_percentile`
    * the same way [[kmvDistinctTokens]] is to HLL. `percentile` is
    * exact but buffers every distinct value per group (OOM at
    * billions of rows); t-digest keeps constant memory but its
    * estimate is engine-specific, so it can only ever be a rows-only
    * cross-engine check. Fixed-width bucketing gives bounded state
    * AND bit-determinism: bucket = floor(x / width) (IEEE-exact),
    * per-bucket int64 counts, and a rank-walk estimate
    * `lo + width · (r − cum_before) / n_b` with r = ceil(q·n) —
    * every step reproduces identically in DuckDB, so the estimate
    * itself hash-matches, and the error is BOUNDED by construction:
    * the true q-quantile lives in the same bucket, so
    * |est − exact| ≤ width (spec-pinned; a t-digest offers no such
    * per-query certificate).
    *
    * Sketches merge: bucket counts add (the merge the spec pins),
    * so executors histogram shards independently and the combine is
    * the same map-side partial aggregation Spark already does.
    *
    * Shape at scale: ONE (group, bucket)-keyed exchange with
    * map-side combine — the shuffle carries O(groups · range/width)
    * rows regardless of corpus size; the finalize walks each group's
    * ≤ range/width buckets row-locally (the HOF is interpreted, but
    * over per-GROUP state, not per-row data).
    */
  def histogramPercentiles(
      s: SparkSession, dir: String,
      width: Double = 1000.0, qs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    // width <= 0 would floor-bucket into ±Infinity; q outside (0, 1]
    // would walk off the histogram
    require(width > 0 && width.isFinite, s"bucket width must be > 0: $width")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs: $qs")
    // p${round} labels the output columns, so two qs that round to the
    // same integer percent (0.995 and 1.0 → both p100_est) would emit
    // duplicate column names — a DataFrame that fails on any later
    // select-by-name
    require(qs.map(q => (q * 100).round).distinct.size == qs.size,
      s"quantile labels collide after rounding to integer percents: $qs")
    val buckets = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") / width).cast("long").as("b"))
      .groupBy("o_orderstatus", "b").agg(count(lit(1)).as("n_b"))
    val grouped = buckets.groupBy("o_orderstatus").agg(
      sort_array(collect_list(struct(col("b"), col("n_b")))).as("buckets"),
      sum("n_b").as("n"))
    val wD = s"cast($width as double)"
    def est(q: Double): org.apache.spark.sql.Column = expr(
      s"""aggregate(buckets,
         |  named_struct('cum', cast(0 as bigint),
         |               'est', cast(null as double)),
         |  (acc, x) -> named_struct(
         |    'cum', acc.cum + x.n_b,
         |    'est', if(acc.est is not null, acc.est,
         |      if(acc.cum + x.n_b >= cast(ceil(cast($q as double) * n) as bigint),
         |        x.b * $wD + $wD
         |          * (cast(ceil(cast($q as double) * n) as bigint) - acc.cum)
         |          / x.n_b,
         |        cast(null as double)))),
         |  acc -> acc.est)""".stripMargin)
    grouped.select(
      Seq(col("o_orderstatus"), col("n"),
        size(col("buckets")).as("n_buckets")) ++
        qs.map(q => est(q).as(s"p${(q * 100).round}_est")): _*)
  }

  // --- HyperLogLog (Flajolet–Fusy–Gandouet–Meunier 2007) ------------

  private val HllB = 10
  private val HllM = 1 << HllB // 1024 registers
  private val HllRhoMax = 60 - HllB + 1 // 51: rho of an all-zero remainder
  private val TwoPow51 = 2251799813685248L
  /** alpha_m · m² · 2^51, written as the exact literal chain the DuckDB
    * oracle evaluates (left-assoc, one IEEE rounding per op) so both
    * engines hold the same double.
    */
  private val HllAlphaNum =
    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 2251799813685248.0

  /** From-scratch deterministic HyperLogLog over distinct 3-token
    * shingles, per source plus the register-max merge as `__all__`.
    *
    * `approx_count_distinct` IS HLL, but its hash is engine-private so
    * its estimate can never be oracled. Building the registers from the
    * same md5-derived 60-bit hash [[kmvDistinctTokens]] uses makes the
    * whole sketch replayable in plain SQL: register index = low `b`
    * hash bits, rho = leading-zero count of the remaining 50 bits + 1
    * (via `length(bin(rem))`, identical string semantics in Spark and
    * DuckDB), register value = max rho. The harmonic-mean denominator
    * Z = Σ 2^−M_j is kept EXACT by scaling with 2^51: every term
    * 2^(51−M_j) is an integer (≤ 2^51 for an empty register), the sum
    * is ≤ m·2^51 = 2^61 < 2^63, and summation becomes
    * order-independent int64 arithmetic — no float-accumulation drift
    * for the oracle to disagree with. Only the final division (and the
    * small-range linear-counting branch m·ln(m/V), rounded to 6
    * decimals per the repo-wide libm convention) is floating point.
    *
    * Merge = per-register max, exactly HLL's union semantics: the
    * `__all__` row is computed FROM the per-source registers (an
    * O(m·sources) relation), not by rescanning the corpus — the merge
    * that lets 1000 executors sketch shards independently.
    * [[SketchesSpec]] pins it equal to the direct whole-corpus sketch.
    *
    * Shape at scale: ONE exchange total on the corpus path — the
    * (source, j) register aggregation, capped at O(sources · m) rows
    * by map-side partial max (no distinct pass: register max is
    * idempotent, so the raw shingle stream aggregates directly —
    * unlike KMV, whose rank semantics genuinely need the dedup);
    * everything after rides register-cardinality relations.
    */
  def hllDistinctShingles(s: SparkSession, dir: String): DataFrame =
    hllFinalize(hllRegistersOf(docs(s, dir)))

  /** The (source, j, mj) register relation of a documents batch — the
    * HLL merge unit: registers of a union corpus are the per-register
    * MAX of the parts' registers ([[graft.ops.SketchIndex]] appends
    * and the streaming twin both lean on exactly this).
    */
  private[graft] def hllRegistersOf(d: DataFrame): DataFrame = {
    val toks = d.select(col("source"),
      split(trim(lower(col("text"))), "\\s+").as("toks"))
    // 3-token shingles; a doc with <3 tokens contributes none (the
    // sequence guard keeps Spark's descending-sequence trap out)
    val sh = toks.filter(size(col("toks")) >= 3)
      .select(col("source"),
        explode(sequence(lit(1), size(col("toks")) - 2)).as("g"),
        col("toks"))
      .select(col("source"),
        array_join(slice(col("toks"), col("g"), lit(3)), " ").as("sh"))
    // No distinct pass: register max is idempotent, so duplicate
    // shingles can't move a register — the raw stream aggregates
    // straight into (source, j) with map-side partial max. The ONLY
    // exchange on the corpus path therefore carries O(sources·1024)
    // register rows, never shingle-cardinality data (KMV genuinely
    // needs its distinct; HLL never did).
    sh.select(col("source"), h60(col("sh")).as("h"))
      .select(col("source"),
        col("h").bitwiseAND(lit((HllM - 1).toLong)).as("j"),
        shiftright(col("h"), HllB).as("rem"))
      .withColumn("rho",
        when(col("rem") === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(col("rem")))).cast("int"))
      .groupBy("source", "j").agg(max("rho").as("mj"))
  }

  /** The same (source, j, mj) register relation built by the NATIVE
    * [[graft.plans.HllRegisterAgg]] aggregate (`hll_regs`): hashes
    * fold map-side into 1-KB byte buffers, partial buffers merge by
    * pointwise max through Spark's normal partial-aggregation
    * machinery, and the evaluated register array unrolls back into
    * rows (posexplode of a 1024-element array per source — bounded).
    * Downstream (finalize, merge row, oracle) is shared verbatim with
    * [[hllRegistersOf]]; [[SketchesSpec]] pins row-set equality.
    */
  private[graft] def hllRegistersNativeOf(d: DataFrame): DataFrame = {
    val toks = d.select(col("source"),
      split(trim(lower(col("text"))), "\\s+").as("toks"))
    val sh = toks.filter(size(col("toks")) >= 3)
      .select(col("source"),
        explode(sequence(lit(1), size(col("toks")) - 2)).as("g"),
        col("toks"))
      .select(col("source"),
        array_join(slice(col("toks"), col("g"), lit(3)), " ").as("sh"))
    sh.select(col("source"), h60(col("sh")).as("h"))
      .groupBy("source")
      .agg(expr("hll_regs(h)").as("regs"))
      .select(col("source"), posexplode(col("regs")).as(Seq("j", "mj")))
      .filter(col("mj") > 0)
      .select(col("source"), col("j").cast("long").as("j"), col("mj"))
  }

  /** [[hllDistinctShingles]] computed through the native aggregate —
    * same rows, same oracle; exists as the `corpus_hll_native` query
    * so the custom-aggregate path is driver-gated too.
    */
  def hllDistinctShinglesNative(s: SparkSession, dir: String): DataFrame =
    hllFinalize(hllRegistersNativeOf(docs(s, dir)))

  /** Finalize a (source, j, mj) register relation into per-source rows
    * plus the register-max-merged `__all__` row.
    */
  private[graft] def hllFinalize(perSrc: DataFrame): DataFrame = {
    val merged = perSrc.groupBy("j").agg(max("mj").as("mj"))
      .select(lit("__all__").as("source"), col("j"), col("mj"))
    // finalize each register relation SEPARATELY before the union (a
    // per-source scope that happens to be named '__all__' must yield
    // its own row, never be register-summed into the merge — the KMV
    // two-row shape, pinned by the merge spec's relabel trick)
    def finalize(regs: DataFrame): DataFrame = regs
      .groupBy("source")
      .agg(count(lit(1)).cast("int").as("regs_used"),
        sum(expr(s"shiftleft(cast(1 as bigint), $HllRhoMax - mj)"))
          .as("z_present"))
      .withColumn("v_zero", (lit(HllM) - col("regs_used")).cast("int"))
      .withColumn("z_scaled",
        col("z_present") + col("v_zero").cast("long") * lit(TwoPow51))
      .withColumn("est_raw",
        lit(HllAlphaNum) / col("z_scaled").cast("double"))
      .withColumn("est_distinct", round(
        when(col("est_raw") <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble)
            * log(lit(HllM.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("est_raw")), 6))
      .select("source", "regs_used", "v_zero", "z_scaled", "est_distinct")
    finalize(perSrc).unionByName(finalize(merged))
  }

  /** Corpus-growth telemetry between two versions, off the HLL
    * registers: v1 is the 80% doc_id-carve, v2 = v1 ∪ the delta, and
    * `est_new = est(v2) − est(v1)` estimates how much DISTINCT
    * shingle mass the delta actually added — near zero when the
    * "new" crawl is a re-crawl, ≈ its own size when it is fresh
    * content. The v2 registers come from MERGING v1's registers with
    * the delta's (each part scanned once) — the index economics: at
    * production scale v1's registers are [[SketchIndex]]-loaded
    * kilobytes and only the delta is scanned.
    *
    * Every quantity is the deterministic HLL pipeline, so the whole
    * report (including the difference) replays in the DuckDB oracle.
    */
  def hllGrowth(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val v1regs = hllRegistersOf(d.filter(col("doc_id") % 10 < 8))
    val deltaRegs = hllRegistersOf(d.filter(col("doc_id") % 10 >= 8))
    val v2regs = v1regs.unionByName(deltaRegs)
      .groupBy("source", "j").agg(max("mj").as("mj"))
    val est1 = hllFinalize(v1regs)
      .select(col("source"), col("est_distinct").as("est_v1"))
    val est2 = hllFinalize(v2regs)
      .select(col("source"), col("est_distinct").as("est_v2"))
    // v2 ⊇ v1 by construction, so v2's source set carries the join; a
    // source born in the delta reads est_v1 = 0
    est2.join(est1, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("est_v1"), lit(0.0)).as("est_v1"), col("est_v2"),
        round(col("est_v2") - coalesce(col("est_v1"), lit(0.0)), 6)
          .as("est_new"))
  }

  // --- Count-min sketch (Cormode–Muthukrishnan 2005) -----------------

  /** Count-min heavy-hitter estimates over the token stream: a d×w
    * counter grid keyed by d independent md5-salted hashes, probed for
    * the exact top-k tokens so the output carries the estimate AND its
    * one-sided error (`overcount = est − exact ≥ 0` — CMS never
    * undercounts, the property [[SketchesSpec]] pins row-by-row).
    *
    * Everything is exact int64 — counters are plain counts, the
    * estimate is a min over d counters — so the sketch hash-matches
    * cross-engine with no float mediation at all. Counters MERGE by
    * addition (spec-pinned: summing per-source grids equals the corpus
    * grid), the same map-side partial aggregation Spark already runs.
    *
    * Shape at scale: the grid build is ONE (i, bucket)-keyed exchange
    * whose map-side combine caps it at O(d·w) rows per task regardless
    * of corpus size; the exact top-k uses `orderBy.limit` (per-
    * partition top-k + driver merge, never a global window); the probe
    * joins k·d rows against the broadcast-sized grid.
    */
  def cmsHeavyHitters(s: SparkSession, dir: String,
      depth: Int = 4, width: Int = 64, topK: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2 && topK >= 1,
      s"bad CMS shape: depth=$depth width=$width topK=$topK")
    val toks = cmsTokensOf(docs(s, dir))
    cmsProbe(cmsGridOf(toks, depth, width), cmsTopTokens(toks, topK),
      depth, width)
  }

  /** The corpus token stream (with multiplicity — CMS counts, it does
    * not dedup).
    */
  private[graft] def cmsTokensOf(d: DataFrame): DataFrame =
    d.select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))

  private def cmsBucket(width: Int)(i: org.apache.spark.sql.Column,
      tok: org.apache.spark.sql.Column) =
    h60(concat(i.cast("string"), lit("#"), tok)) % lit(width.toLong)

  /** The (i, b, cnt) counter grid — the CMS merge unit: the union
    * stream's grid is the per-cell SUM of the parts' grids (exactly
    * the map-side combine that builds it; [[SketchIndex]] appends by
    * the same addition).
    */
  private[graft] def cmsGridOf(
      toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks.select(explode(sequence(lit(0), lit(depth - 1))).as("i"),
      col("tok"))
      .select(col("i"), cmsBucket(width)(col("i"), col("tok")).as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("cnt"))

  /** The exact top-k probe set: (rank, tok, exact_cnt), deterministic
    * under the (count desc, token asc) order. Scalable top-k:
    * TakeOrderedAndProject, then a rank window over the k-row result
    * only (bounded relation).
    */
  private[graft] def cmsTopTokens(toks: DataFrame, topK: Int): DataFrame =
    toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("exact_cnt").desc, col("tok").asc)).cast("int"))

  /** Estimate each probe token's count off a counter grid: min over
    * the d salted-hash cells, with the one-sided error carried.
    */
  private[graft] def cmsProbe(grid: DataFrame, top: DataFrame,
      depth: Int, width: Int): DataFrame =
    top.select(col("rank"), col("tok"), col("exact_cnt"),
      explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .withColumn("b", cmsBucket(width)(col("i"), col("tok")))
      .join(broadcast(grid), Seq("i", "b"))
      .groupBy("rank", "tok", "exact_cnt")
      .agg(min("cnt").as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_cnt"))
}
