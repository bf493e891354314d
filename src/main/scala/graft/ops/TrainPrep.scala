package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export preparation operators over the `documents` corpus:
  * deterministic train/val/test assignment, fixed-capacity sequence
  * packing, and per-source mixture reweighting. Together with
  * [[Relational.shardAssignments]] and [[Relational.stratifiedSample]]
  * these cover the last mile between a cleaned corpus and a training
  * job's input: which rows belong to which split, in which shard and
  * pack, and at what per-domain sampling weight.
  *
  * All assignment decisions derive from md5 of the stable `doc_id` —
  * never from partition layout, row order, or RNG state — so any
  * cluster size and any re-run reproduce the same corpus bit-for-bit.
  * The hash is salted per operator (`#split`, `#shard`, `#sample`) so
  * the split is independent of the shard which is independent of the
  * sampling decision.
  */
object TrainPrep {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Whitespace token count — identical to [[TextOps]]'s `ws_tokens`
    * so pack capacities line up with the corpus token accounting.
    */
  private val wsTokenCount = size(split(trim(lower(col("text"))), "\\s+"))

  /** Deterministic train/val/test assignment: the first hex nibble of
    * the salted doc_id hash is uniform over 16 buckets; 0-d → train
    * (87.5%), e → val (6.25%), f → test (6.25%). Membership is a pure
    * function of doc_id — adding or removing OTHER documents never
    * moves a document between splits (the property that keeps a
    * held-out set held out across corpus versions; fractional
    * `sample()` or `randomSplit()` has neither guarantee).
    *
    * Shape at scale: narrow per-row hash + CASE inside one codegen'd
    * scan. Zero exchanges, zero driver state — the assignment column
    * can ride any downstream plan for free.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    splitAssignOf(docs(s, dir))

  /** [[splitAssign]] over an explicit (doc_id, ...) relation — the
    * delta form the streaming export gates micro-batches with
    * (membership is a pure function of doc_id, so batch-local
    * assignment IS the corpus assignment).
    */
  private[graft] def splitAssignOf(base: DataFrame): DataFrame = {
    val hash = md5(concat(col("doc_id").cast("string"), lit("#split")))
    val nib = conv(substring(hash, 1, 1), 16, 10).cast("int")
    base.select(
      col("doc_id"),
      nib.as("split_bucket"),
      when(nib <= 13, "train")
        .when(nib === 14, "val")
        .otherwise("test").as("split"))
  }

  /** Fixed-capacity sequence packing: concatenate each shard's
    * documents in its deterministic shuffled order (the same
    * (md5, doc_id) order [[Relational.shardAssignments]] exports) and
    * cut the stream every `capacity` tokens. Emits, per document, the
    * pack it STARTS in and the token offset within that pack — the
    * metadata a fill-the-context-window loader needs to seek straight
    * to a document. Documents may straddle pack boundaries by design
    * (concat-and-chunk packing, the GPT-style recipe); `pack_off +
    * n_tokens > capacity` identifies the straddlers.
    *
    * Shape at scale: ONE hash exchange keyed by shard plus a
    * within-partition sort — exactly the shape of the sharded export
    * write itself, so packing adds no shuffle a writer wasn't already
    * paying. The running sum is a window over the sorted partition
    * (single pass, no driver state); all arithmetic is integral, so
    * the layout is reproducible across cluster sizes.
    */
  def packSequences(
      s: SparkSession, dir: String,
      nShards: Int = 8, capacity: Long = 2048L): DataFrame =
    packSequencesOf(docs(s, dir), nShards, capacity)

  /** [[packSequences]] over an explicit base relation (doc_id, text).
    * The layout is a pure function of the MEMBER SET — the pipeline
    * composition packs survivors, not the raw corpus, and removing a
    * document reflows only the packs behind it within its shard.
    */
  private[graft] def packSequencesOf(
      base: DataFrame, nShards: Int = 8, capacity: Long = 2048L)
      : DataFrame = {
    val hash = md5(concat(col("doc_id").cast("string"), lit("#shard")))
    val shard = (conv(substring(hash, 1, 1), 16, 10).cast("int")
      % nShards).as("shard_id")
    val w = Window.partitionBy("shard_id").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .select(col("doc_id"), hash.as("h"), shard,
        wsTokenCount.cast("long").as("n_tokens"))
      .select(col("doc_id"), col("shard_id"), col("n_tokens"),
        sum(col("n_tokens")).over(w).as("cum"))
      .select(col("doc_id"), col("shard_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${capacity}L").as("pack_id"),
        ((col("cum") - col("n_tokens")) % capacity).as("pack_off"))
  }

  /** The COMPOSED last mile — the proof the operators share keys and
    * stack: near-dup keep-set ([[Dedup.dedupedCorpus]]) ∧ quality
    * keep ([[Filtering.qualityFilter]]) ∧ LM-perplexity keep
    * ([[LanguageModel.knPerplexity]] bucket ≠ `tail` — the CCNet
    * pass actually GATING the export, not just reporting) ∧ `train`
    * split ([[splitAssign]]), then the packed-export layout over
    * exactly that survivor set. This is the query a real pre-training
    * run executes end-to-end; every stage is individually oracled
    * elsewhere, and the composition is oracled as one relation here
    * (the DuckDB side chains the same CTEs).
    *
    * Shape at scale: the four verdict relations are doc-keyed and
    * join on the corpus's own key — with the [[Bucketed]] layout the
    * joins are co-located; the packing adds its one shard-keyed
    * exchange. Nothing in the composition introduces a new
    * corpus-proportional shuffle beyond its parts.
    */
  def pipelineExport(
      s: SparkSession, dir: String, threshold: Double = 0.8,
      nShards: Int = 8, capacity: Long = 2048L): DataFrame = {
    val survivors = Dedup.dedupedCorpus(s, dir, threshold)
      .select("doc_id")
      .join(Filtering.qualityFilter(s, dir).filter(col("keep"))
        .select("doc_id"), Seq("doc_id"))
      .join(LanguageModel.knPerplexity(s, dir)
        .filter(col("bucket") =!= "tail").select("doc_id"), Seq("doc_id"))
      .join(splitAssign(s, dir).filter(col("split") === "train")
        .select("doc_id"), Seq("doc_id"))
    packSequencesOf(docs(s, dir).join(survivors, Seq("doc_id")),
      nShards, capacity)
  }

  /** [[pipelineExport]] with every corpus-derived MODEL probed from a
    * persisted index instead of re-derived inline: the near-dup
    * keep-set reads the committed [[ClusterIndex]] assignment (one
    * doc-keyed join, zero LSH recomputation) and the LM gate scores
    * through the frozen [[KnIndex]] count tables (zero KN training).
    * The two per-document stages — the heuristic quality verdict and
    * the split nibble — were always row-local and stay inline.
    *
    * Row-identical to [[pipelineExport]] whenever both indexes were
    * built on the same corpus with the same parameters (spec-pinned;
    * the SparkEntry query shares [[pipelineExport]]'s oracle), which
    * is the point: the full pre-training export becomes re-runnable
    * against committed index versions, so a delta ingest pays
    * index-append + batch-score instead of two corpus-sized model
    * rebuilds. At 100 TB the inline form re-derives the LSH→components
    * pipeline AND the KN count tables on every export; this form
    * reads kilobytes of manifests plus the type-cardinality model
    * relations and touches corpus text only for the per-row stages.
    */
  def pipelineExportIndexed(
      s: SparkSession, dir: String, clusterIdx: String, knIdx: String,
      headMax: Double = 0.95, middleMax: Double = 1.05,
      nShards: Int = 8, capacity: Long = 2048L): DataFrame = {
    val survivors = ClusterIndex.clusters(s, clusterIdx)
      .filter(col("keep")).select("doc_id")
      .join(Filtering.qualityFilter(s, dir).filter(col("keep"))
        .select("doc_id"), Seq("doc_id"))
      .join(KnIndex.score(s, knIdx, docs(s, dir), headMax, middleMax)
        .filter(col("bucket") =!= "tail").select("doc_id"), Seq("doc_id"))
      .join(splitAssign(s, dir).filter(col("split") === "train")
        .select("doc_id"), Seq("doc_id"))
    packSequencesOf(docs(s, dir).join(survivors, Seq("doc_id")),
      nShards, capacity)
  }

  /** [[packSequences]] unrolled to the PER-PACK segment table a
    * fill-the-context-window loader actually consumes: one row per
    * (document, pack) intersection, with the in-pack offset and
    * length of the document's token slice. A document spanning three
    * context windows yields three rows — the attention-mask /
    * document-boundary metadata `pack_sequences`' start-pack-only
    * row cannot express. Pure integer arithmetic off the same
    * deterministic layout, so the segment table is bit-stable too.
    *
    * Shape at scale: rides [[packSequences]]' single shard-keyed
    * exchange; the unroll is a row-local `sequence` explode whose
    * fan-out is ceil(n_tokens/capacity) — bounded by document length,
    * independent of corpus size.
    */
  def packSegments(
      s: SparkSession, dir: String,
      nShards: Int = 8, capacity: Long = 2048L): DataFrame =
    packSequences(s, dir, nShards, capacity)
      .select(col("doc_id"), col("shard_id"),
        (col("pack_id") * capacity + col("pack_off")).as("st"),
        (col("pack_id") * capacity + col("pack_off") + col("n_tokens"))
          .as("en"))
      // a zero-token document occupies no pack — and would otherwise
      // make the sequence below run BACKWARD (Spark defaults to step
      // -1 when start > stop)
      .filter(col("en") > col("st"))
      .select(col("doc_id"), col("shard_id"), col("st"), col("en"),
        explode(expr(s"sequence(st DIV ${capacity}L, (en - 1) DIV ${capacity}L)"))
          .as("pack_id"))
      .select(col("doc_id"), col("shard_id"), col("pack_id"),
        (greatest(col("st"), col("pack_id") * capacity)
          - col("pack_id") * capacity).as("seg_off"),
        (least(col("en"), (col("pack_id") + 1) * capacity)
          - greatest(col("st"), col("pack_id") * capacity)).as("seg_len"))

  /** Per-source mixture reweighting: the sampling weight each `source`
    * domain needs to hit a uniform target mix (the DoReMi/Pile-style
    * domain-balancing step, with uniform as the fixture target).
    * `weight > 1` means upsample, `< 1` downsample; weights are exact
    * ratios of integer counts, so the table is reproducible and the
    * weighted corpus sums back to the original size by construction.
    *
    * Shape at scale: one keyed aggregation (map-side partials carry
    * |sources| rows per partition) plus a one-row totals aggregate
    * broadcast back — the 100 TB cost is the scan, nothing else.
    */
  def mixWeights(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir)
      .select(col("source"), wsTokenCount.cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    // corpus totals as a window over the per-source relation, NOT a
    // second aggregation: per is |sources| rows, so an unpartitioned
    // window is a no-op partition-wise, while `per.agg(...)` would
    // re-plan (and re-scan, re-tokenize) the whole corpus subtree —
    // at 100 TB that second scan IS the query's cost
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val totDocs = sum(col("n_docs")).over(w)
    per.select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_docs") / totDocs, 6).as("doc_frac"),
        round(col("n_tokens") / sum(col("n_tokens")).over(w), 6)
          .as("token_frac"),
        round(totDocs / (count(lit(1)).over(w) * col("n_docs")), 6)
          .as("weight"))
  }

  /** The `weight` column of [[mixWeights]] alone, WITHOUT the token
    * statistics: weight = tot_docs / (n_sources · n_docs) depends only
    * on per-source doc counts, so this aggregation's ReadSchema is the
    * `source` column — no text read, no tokenization. The expressions
    * are verbatim from [[mixWeights]] (same window, same round) so the
    * two relations agree bit-for-bit.
    */
  private[graft] def docWeights(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per.select(col("source"),
      round(sum(col("n_docs")).over(w)
        / (count(lit(1)).over(w) * col("n_docs")), 6).as("weight"))
  }

  /** [[mixWeights]] APPLIED: the uniform-domain-mix export. Each
    * document is kept with probability p = min(1, rate · weight(src)),
    * using the same md5-derived uniform machinery as
    * [[weightedSample]] (salt `#mix`, independent of every other
    * assignment) — so each source contributes ≈ rate · tot_docs /
    * n_sources surviving documents regardless of its raw share:
    * over-represented crawls are down-sampled toward the uniform mix
    * the weights define, and the whole export reproduces bit-for-bit
    * on any engine and any cluster size.
    *
    * Shape at scale: ONE corpus scan. The weights are either supplied
    * by the caller (the production shape: [[mixWeights]] output is a
    * persisted |sources|-row table reused across exports) or computed
    * here by [[docWeights]] — a doc-COUNT aggregation whose ReadSchema
    * is the `source` column alone, never the text (an earlier
    * formulation re-ran the full [[mixWeights]] tokenization for
    * weights it only needed the count half of — at 100 TB that second
    * tokenize scan doubles the query). Collected at |sources| rows
    * (bounded by construction, not by data) into a literal map, so the
    * apply pass is a row-local lookup + filter inside the scan's
    * codegen stage — zero joins, zero exchanges on the corpus side.
    */
  def mixApply(
      s: SparkSession, dir: String, rate: Double = 0.5,
      weights: Option[Map[String, Double]] = None): DataFrame = {
    require(rate > 0, s"rate must be > 0, got $rate")
    val wMap = weights.getOrElse(
      docWeights(s, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap)
    require(wMap.nonEmpty, "empty weights relation")
    val u = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit("#mix"))), 1, 15),
      16, 10).cast("long").cast("double") / lit(math.pow(2, 60))
    // element_at on an absent source yields null p, and null < u is
    // null → filtered: identical to the old inner join's semantics
    docs(s, dir).select(col("doc_id"), col("source"))
      .select(col("doc_id"), col("source"),
        least(lit(1.0),
          lit(rate) * element_at(typedLit(wMap), col("source"))).as("p"),
        u.as("u"))
      .filter(col("u") < col("p"))
  }

  /** Weighted Bernoulli sampling: each document is kept independently
    * with probability proportional to its length —
    * p = min(1, rate · n_chars / refChars) — using an md5-derived
    * uniform u ∈ [0,1) instead of an RNG. Longer documents (more
    * training tokens) are proportionally likelier to survive, the
    * expected sampled-token mass is rate-controlled, and the decision
    * for a document never depends on any other document — re-runs,
    * repartitions, and incremental corpus growth all reproduce the
    * same keep set (the same stability argument as [[splitAssign]]).
    *
    * Deliberately Bernoulli rather than exponential-key reservoir
    * (Efraimidis–Spirakis): the reservoir's u^(1/w) keys need `pow`,
    * whose last-bit behavior is not specified identically across
    * engines, while this form needs only int64→double conversion,
    * multiply, divide, and compare — all IEEE-exact — so the keep set
    * is bit-reproducible on any engine (the DuckDB oracle replays it).
    *
    * Shape at scale: a narrow per-row filter inside one codegen stage;
    * the 100 TB cost is the scan, with zero exchanges.
    */
  def weightedSample(
      s: SparkSession, dir: String,
      rate: Double = 0.25, refChars: Double = 400.0): DataFrame = {
    require(rate > 0 && refChars > 0,
      s"rate and refChars must be > 0: $rate, $refChars")
    val u = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit("#wsample"))), 1, 15),
      16, 10).cast("long").cast("double") / lit(math.pow(2, 60))
    docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        least(lit(1.0), lit(rate) * col("n_chars") / lit(refChars)).as("p"),
        u.as("u"))
      .filter(col("u") < col("p"))
  }

  /** Per-domain contribution cap: at most `cap` documents survive per
    * source, chosen by salted-hash rank (deterministic, order-free) —
    * the standard "no single domain dominates the mix" guard a crawl
    * corpus applies before training. Emits the survivors with their
    * within-source rank so a downstream stage can tighten the cap
    * without recomputing.
    *
    * Shape at scale: rank ≤ cap over a (source)-partitioned window is
    * rewritten by Spark to WindowGroupLimit — every map task forwards
    * at most `cap` rows per source into the single exchange, so the
    * shuffle carries O(sources · cap) rows regardless of corpus size
    * ([[TrainPrepSpec]] pins the rewrite on the physical plan).
    */
  def domainCap(s: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val hash = md5(concat(col("doc_id").cast("string"), lit("#cap")))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("source"), hash.as("h"))
      .select(col("doc_id"), col("source"),
        row_number().over(w).as("cap_rank"))
      .filter(col("cap_rank") <= cap)
  }

  /** Token-budget-constrained selection — "fill a B-token training
    * budget with the best documents": rank the corpus by quality
    * (Flesch readability here — any deterministic per-doc score slots
    * in), take the maximal prefix whose cumulative token count stays
    * ≤ `budget`. Keep rule: a doc stays iff its INCLUSIVE running
    * total ≤ B under the (flesch desc, doc_id asc) order — integer
    * arithmetic, so the boundary doc is pinned cross-engine.
    *
    * The global running total NEVER plans a single-partition window —
    * the same two-level prefix sum as `events_concurrency`: floor
    * buckets of the score give the coarse level (the window is
    * bucket-keyed; floor is monotone, so bucket-desc + in-bucket
    * score-desc IS the global order), and the cross-bucket carry is a
    * broadcast lower-triangle self-join over bucket totals — a
    * relation bounded by the score's integer range, not the corpus.
    * [[TrainPrepSpec]] pins `SinglePartition`'s absence on the
    * finalized plan.
    */
  def budgetSelect(
      s: SparkSession, dir: String, budget: Long = 10000L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val r = TextOps.readability(s, dir)
      .select(col("doc_id"), col("flesch"), col("n_words"))
      .withColumn("bkt", floor(col("flesch")).cast("long"))
    val w = Window.partitionBy("bkt")
      .orderBy(col("flesch").desc, col("doc_id").asc)
    val local = r.withColumn("local_cum",
      sum(col("n_words").cast("long")).over(w))
    val totals = r.groupBy("bkt")
      .agg(sum(col("n_words").cast("long")).as("t"))
    // tokens in strictly HIGHER buckets (better flesch) — the carry
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b.bkt") > col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.t")), lit(0L)).as("off"))
    local.join(broadcast(offsets), Seq("bkt"))
      .withColumn("cum_tokens", col("off") + col("local_cum"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "flesch", "n_words", "cum_tokens")
  }

  /** Curriculum phases — easy→hard training order: documents split
    * into `k` difficulty phases by quality rank (phase 1 = most
    * readable), with a salted-hash order key for shuffling WITHIN a
    * phase (curricula order phases, not documents; deterministic
    * shuffle inside each band). The phase rule is exactly SQL
    * `ntile(k)` over (flesch desc, doc_id asc) — the oracle uses the
    * window function, the engine derives the same assignment as
    * `1 + ((rank−1)·k) div n` from a scale-safe global rank:
    *
    * The rank never plans a corpus-wide window — [[budgetSelect]]'s
    * two-level decomposition with unit weights: a bucket-keyed
    * `row_number` plus a broadcast triangle join over bucket COUNTS;
    * `n` is one scalar row. The within-phase key is just md5 — no
    * rank minting, so phases stay window-free however large they are.
    */
  def curriculumPhases(
      s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1 phases, got $k")
    val r = TextOps.readability(s, dir)
      .select(col("doc_id"), col("flesch"))
      .withColumn("bkt", floor(col("flesch")).cast("long"))
    val w = Window.partitionBy("bkt")
      .orderBy(col("flesch").desc, col("doc_id").asc)
    val local = r.withColumn("lr", row_number().over(w).cast("long"))
    val counts = r.groupBy("bkt").agg(count(lit(1)).as("cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.bkt") > col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
    val n = counts.agg(sum("cnt").as("n"))
    local.join(broadcast(offsets), Seq("bkt"))
      .crossJoin(broadcast(n))
      .withColumn("rank", col("off") + col("lr"))
      .select(col("doc_id"), col("flesch"),
        (expr(s"((rank - 1) * $k) div n") + 1).cast("int").as("phase"),
        md5(concat(col("doc_id").cast("string"), lit("#curriculum")))
          .as("ord_key"))
  }
}
