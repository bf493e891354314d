package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-filtering composites: the decision passes a training-data
  * pipeline runs AFTER the per-signal operators ([[TextOps]],
  * [[TrainPrep]], [[Dedup]]) have done their work — a single keep/drop
  * verdict with per-rule reasons, and the train←test leakage audit
  * that guards the held-out split.
  */
object Filtering {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Composite quality filter (FineWeb/Gopher-shaped): combine the
    * length, word-length, stopword, and repetition signals into one
    * keep/drop verdict, with the failed rules named in a stable
    * comma-joined `drop_reasons` — the audit trail a filtering run
    * reports per document.
    *
    * Rules (each also surfaced as its own boolean column):
    *  - `r_len`:      20 ≤ n_tokens ≤ 1000
    *  - `r_word_len`: 2.0 ≤ mean_token_len ≤ 12.0
    *  - `r_stop`:     stop_ratio ≥ 0.01
    *  - `r_rep`:      top2_frac ≤ 0.2 AND dup3_frac ≤ 0.18 (vacuously
    *                  true for docs too short to have gram stats —
    *                  `r_len` already rejects those)
    *
    * Shape at scale: the quality signals are narrow per-row columns
    * computed directly on the LEFT side of the repetition-stats left
    * join, so the whole composite costs exactly what
    * [[TextOps.repetitionScores]] costs — one gram explode, two keyed
    * aggregations, one doc_id join. Composing the published operators
    * relationally instead would re-key the corpus a third time.
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFilterOf(docs(s, dir))

  /** [[qualityFilter]] over an explicit documents relation — the form
    * an incremental refresh applies to a DELTA only (valid because
    * every signal here is per-document; corpus-dependent scores like
    * surprisal or the NB model must re-train instead).
    */
  private[graft] def qualityFilterOf(d: DataFrame): DataFrame = {
    val top2Frac = col("top2_cnt") / col("n_grams2")
    val dup3Frac = coalesce(col("dup3_occ"), lit(0L)) / col("n_grams3")
    val rLen = col("n_tokens") >= 20 && col("n_tokens") <= 1000
    val rWordLen =
      col("mean_token_len") >= 2.0 && col("mean_token_len") <= 12.0
    val rStop = col("stop_ratio") >= 0.01
    val rRep = coalesce(top2Frac <= 0.2 && dup3Frac <= 0.18, lit(true))
    TextOps.qualitySignals(d)
      .join(TextOps.repetitionStats(d), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("mean_token_len"),
        col("stop_ratio"),
        top2Frac.as("top2_frac"), dup3Frac.as("dup3_frac"),
        rLen.as("r_len"), rWordLen.as("r_word_len"),
        rStop.as("r_stop"), rRep.as("r_rep"),
        (rLen && rWordLen && rStop && rRep).as("keep"),
        // concat_ws drops nulls, so the reasons list carries exactly
        // the failed rules, always in this order
        concat_ws(",",
          when(!rLen, "len"), when(!rWordLen, "word_len"),
          when(!rStop, "stop_ratio"), when(!rRep, "repetition")
        ).as("drop_reasons"))
  }

  /** [[qualityFilter]] with the CCNet language-model gate composed
    * in: the heuristic verdict joined with
    * [[LanguageModel.knPerplexity]]'s per-document perplexity bucket,
    * adding rule `r_lm` (bucket ≠ `tail` — CCNet drops the
    * high-perplexity tail), the `nll`/`bucket` evidence columns, and
    * `lm_tail` as the last entry of `drop_reasons`. This is the
    * filtering pass production pipelines actually run: cheap
    * heuristics AND a trained LM verdict in one relation.
    *
    * Unlike the heuristic rules this inline composite is
    * CORPUS-dependent — the LM trains on the corpus's own train split
    * on every run — so it must NOT be applied to an incremental delta
    * alone. [[qualityFilterLmIndexed]] is the same verdict scored
    * through the persisted [[KnIndex]] model (bit-identical when the
    * index was built on the same corpus), and
    * [[qualityFilterLmBatch]] is the delta form that scores an
    * arriving batch against the frozen model without any reference-
    * corpus scan.
    *
    * Shape at scale: one additional doc-keyed join; the LM subtree's
    * own cost is [[LanguageModel.knPerplexity]]'s (two
    * position-cardinality exchanges).
    */
  def qualityFilterLm(s: SparkSession, dir: String,
      headMax: Double = 0.95, middleMax: Double = 1.05): DataFrame =
    composeLm(qualityFilter(s, dir),
      LanguageModel.knPerplexity(s, dir, headMax, middleMax))

  /** [[qualityFilterLm]] scoring through a PERSISTED [[KnIndex]]
    * instead of retraining the KN subtree inline: same verdict
    * relation, but the model is the index's frozen count tables —
    * [[LanguageModel.scoreWith]] is shared verbatim, so when the
    * index was built on the same reference corpus the output is
    * bit-identical to [[qualityFilterLm]] (spec-pinned, and the two
    * SparkEntry queries share one oracle).
    *
    * This is what converts the LM gate from corpus-dependent to
    * delta-able: the heuristics were always per-document, and the LM
    * verdict now depends only on the committed model version — see
    * [[qualityFilterLmBatch]] for the delta form.
    */
  def qualityFilterLmIndexed(
      s: SparkSession, dir: String, idxPath: String,
      headMax: Double = 0.95, middleMax: Double = 1.05): DataFrame =
    composeLm(qualityFilter(s, dir),
      KnIndex.score(s, idxPath, docs(s, dir), headMax, middleMax))

  /** The DELTA form of the LM-gated filter: score an arriving batch
    * of (doc_id, text) documents — heuristics AND frozen-model KN
    * verdict — WITHOUT touching the reference corpus. Every input
    * relation is the batch itself or the index's type-cardinality
    * count tables; a spec pins that the plan contains no scan of the
    * reference `documents.parquet`. This is the
    * [[Dedup.incrementalDedupPairs]] candidate-volume economics
    * applied to the LM gate: batch cost is batch-tokenize plus
    * count-table joins, independent of corpus size.
    */
  def qualityFilterLmBatch(
      s: SparkSession, idxPath: String, batch: DataFrame,
      headMax: Double = 0.95, middleMax: Double = 1.05): DataFrame =
    composeLm(qualityFilterOf(batch),
      KnIndex.score(s, idxPath, batch, headMax, middleMax))

  /** The heuristic⋈LM verdict composition shared by the inline,
    * indexed, and delta forms: one doc-keyed join, rule `r_lm` =
    * bucket ≠ tail, `lm_tail` appended last to `drop_reasons`.
    */
  private def composeLm(heur: DataFrame, lmScores: DataFrame): DataFrame = {
    val lm = lmScores.select(col("doc_id"), col("nll"), col("bucket"))
    val rLm = col("bucket") =!= "tail"
    heur.withColumnRenamed("keep", "keep_h")
      .withColumnRenamed("drop_reasons", "dr_h")
      .join(lm, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_tokens"), col("mean_token_len"),
        col("stop_ratio"), col("top2_frac"), col("dup3_frac"),
        col("r_len"), col("r_word_len"), col("r_stop"), col("r_rep"),
        col("nll"), col("bucket"), rLm.as("r_lm"),
        (col("keep_h") && rLm).as("keep"),
        // concat_ws drops nulls: heuristic reasons keep their stable
        // order, lm_tail always appends last
        concat_ws(",",
          when(col("dr_h") =!= "", col("dr_h")),
          when(!rLm, "lm_tail")).as("drop_reasons"))
  }

  /** Train←test leakage audit: for every training document (under
    * [[TrainPrep.splitAssign]]'s hash-stable split), the number of its
    * distinct `n`-gram shingles that also occur in ANY test-split
    * document, and the `leaked` verdict — the decontamination pass
    * that keeps a held-out split actually held out. Same overlap
    * semantics as [[Dedup.contamination]], with the benchmark carve
    * replaced by the engine's own split assignment.
    *
    * Shape at scale: grams are `array_distinct`'d row-locally before
    * the explode (zero corpus-side exchanges, as in
    * [[Dedup.contamination]]); the test-side gram set dedups at 1/16
    * of corpus gram mass and the hit probe is a shuffle join keyed by
    * gram — deliberately NOT broadcast, because a 6.25% split of a
    * 100 TB corpus is TB-scale (the benchmark-decontamination case,
    * where the probe side is MB-scale, is the broadcast one). Both
    * join sides are per-doc-distinct, so (train doc, gram) pairs are
    * unique and the per-doc count needs no distinct aggregation.
    *
    * Skew: a universal-boilerplate gram (df ≈ 1.0 — licence headers,
    * nav chrome) would send EVERY train document's row to one shuffle
    * partition of the gram join, and AQE's skew-join cannot be relied
    * on to catch it — skew statistics are COMPRESSED map-output
    * bytes, and a partition holding one repeated string compresses so
    * well that a large row skew reads as <2× bytes (measured in
    * SCALE_r08: the df≈1.0 partition never crossed any threshold).
    * So the join is SALTED by construction ([[Relational.saltedJoin]]
    * — spec-pinned identical to the plain join): train rows scatter
    * across `salt` sub-keys by content hash and the distinct'd test
    * side replicates `salt` ways, bounding the worst partition at
    * 1/salt of the hot key's mass. Costs no extra corpus scan (unlike
    * a df-based hot-key split, which needs a third tokenize pass) and
    * no hotness oracle; the price is salt× the test-side shuffle —
    * at a 1/16 test carve and salt = 8, half the train side's gram
    * mass, a constant factor, not a straggler.
    */
  def splitLeakage(
      s: SparkSession, dir: String, n: Int = 8,
      salt: Int = 8): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    val nib = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit("#split"))),
        1, 1), 16, 10).cast("int")
    val base = docs(s, dir).select(col("doc_id"), nib.as("nib"))
    val grams = docs(s, dir)
      .select(col("doc_id"), nib.as("nib"),
        split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("nib"), explode(expr(
        s"""array_distinct(transform(sequence(0, size(toks) - $n),
           |  i -> concat_ws(' ', slice(toks, i + 1, $n))))""".stripMargin
      )).as("shingle"))
    val testGrams = grams.filter(col("nib") === 15)
      .select("shingle").distinct()
    val trainGrams = grams.filter(col("nib") <= 13)
      .select("doc_id", "shingle")
    val hits = Relational
      .saltedJoin(trainGrams, testGrams, "shingle", salt)
      .groupBy("doc_id").agg(count(lit(1)).as("n_leaked_grams"))
    base.filter(col("nib") <= 13).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"))
      .withColumn("leaked", col("n_leaked_grams") > 0)
  }

  /** Distribution-drift monitor: per-source Population Stability
    * Index of the document-length distribution against the whole
    * corpus — the QA gate a versioned corpus runs before a new drop
    * ships (PSI ≳ 0.2 is the classic "investigate" bar). Lengths land
    * in 10 fixed 200-char bins (capped), counts are Laplace-smoothed
    * ((c+1)/(t+bins), exact integer ratios so both engines derive
    * identical IEEE doubles), and each (share-difference × log-ratio)
    * term is rounded to 12 decimals and summed as DECIMAL(28,12) —
    * the same decimal mediation that makes surprisal/PageRank
    * hash-stable, here making a transcendental drift score
    * cross-engine exact. Shape: one corpus scan into a
    * (source, bin)-keyed aggregate; everything after is
    * |sources|×|bins| rows.
    */
  def driftPsi(s: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    // cached: four consumers (per-source totals, the grid join, bin
    // totals, the corpus total) would otherwise each replay the
    // corpus scan — with the |sources|x|bins| aggregate cached, the
    // corpus is read ONCE and everything downstream reads rows
    val cell = docs(s, dir)
      .select(col("source"),
        least(lit(nBins - 1L), (col("n_chars") / 200).cast("long"))
          .as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("c"))
      .cache()
    val srcTot = cell.groupBy("source").agg(sum("c").as("t"))
    val binTot = cell.groupBy("bin").agg(sum("c").as("cb"))
    val tot = cell.agg(sum("c").as("tt"))
    val grid = srcTot.crossJoin(
      s.range(nBins).withColumnRenamed("id", "bin"))
    val full = grid
      .join(cell, Seq("source", "bin"), "left").na.fill(0L, Seq("c"))
      .join(binTot, Seq("bin"), "left").na.fill(0L, Seq("cb"))
      .crossJoin(broadcast(tot))
    val p = (col("c") + 1).cast("double") /
      (col("t") + nBins).cast("double")
    val q = (col("cb") + 1).cast("double") /
      (col("tt") + nBins).cast("double")
    val term = round((p - q) * round(log(p / q), 12), 12)
      .cast("decimal(28,12)")
    full.select(col("source"), col("t"), term.as("term"))
      .groupBy("source")
      .agg(max(col("t")).as("n_docs"), sum("term").as("psi_sum"))
      .select(col("source"), col("n_docs"),
        round(col("psi_sum").cast("double"), 6).as("psi"))
  }
}
