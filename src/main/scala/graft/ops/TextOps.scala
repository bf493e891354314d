package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language identification, fingerprinting. All are
  * narrow (per-row) transformations built from codegen'd built-in
  * functions — no UDFs, so they stay inside whole-stage codegen and
  * scale linearly with the scan.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Tokenizer used across the text operators: whitespace split. */
  private val wsTokens = split(trim(lower(col("text"))), "\\s+")

  /** BPE-ish token regex: letter runs, digit runs, single punctuation. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counting: whitespace tokens and regex (BPE-ish) tokens. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(wsTokens).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(TokenPattern), lit(0)))
        .as("re_tokens"))

  /** Quality scoring: length, token count, mean token length, stopword
    * ratio, and a boolean keep-flag combining the heuristics — the
    * standard pre-training corpus filter shape.
    */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    qualitySignals(docs(s, dir)).withColumn("keep",
      col("n_tokens") >= lit(20) && col("n_tokens") <= lit(1000) &&
        col("stop_ratio") >= lit(0.01))

  /** Language-ID by stopword-marker voting: count hits from small
    * per-language marker sets, predict the argmax with a fixed
    * tie-break order, 'und' when nothing matches. (The synthetic
    * corpus shares one vocabulary across its `lang` labels, so on this
    * fixture the interesting part is the deterministic scoring
    * plumbing, not model quality.)
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens
    val en = size(filter(toks, t => t.isin("the", "a", "of", "and", "is")))
    val de = size(filter(toks, t => t.isin("der", "die", "das", "und", "ist")))
    val fr = size(filter(toks, t => t.isin("le", "la", "les", "et", "est")))
    val es = size(filter(toks, t => t.isin("el", "los", "las", "y", "es")))
    docs(s, dir).select(
      col("doc_id"), col("lang").as("lang_label"),
      en.as("en_score"), de.as("de_score"),
      fr.as("fr_score"), es.as("es_score"),
      when(en >= de && en >= fr && en >= es && en > 0, "en")
        .when(de >= fr && de >= es && de > 0, "de")
        .when(fr >= es && fr > 0, "fr")
        .when(es > 0, "es")
        .otherwise("und").as("lang_pred"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase
    * text — the canonical-form content hash used by exact dedup across
    * formatting variants.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")
        .cast("binary")).as("fp"))

  /** BM25 relevance scoring for a fixed query-term set — the ranking
    * half of corpus search (the retrieval half is [[Similarity]]).
    *
    * Shape at scale: ONE scan + explode + keyed aggregation. The
    * per-doc pass computes doc length and a conditional sum per query
    * term in the same groupBy(doc_id) (map-side partial aggs), so tf
    * and dl ride the same shuffle and the naive plan's separate
    * dl/tf/df explodes collapse; `stack` unpivots to (doc_id, term,
    * tf) rows afterward. The document-frequency and corpus-stat
    * relations are tiny by construction (|terms| rows and 1 row) and
    * broadcast; the avgdl branch reuses the per-doc exchange. The
    * n_docs count scans zero columns (parquet row-count only). No
    * UDFs; idf/score arithmetic is codegen'd column math.
    *
    * The score is rounded to 6 decimals because `ln` is the one
    * non-IEEE-exact step (libm vs JVM may differ in the last ulp);
    * everything else is integer-derived double arithmetic that the
    * oracle reproduces bit-exactly.
    */
  def bm25(
      s: SparkSession, dir: String,
      terms: Seq[String] = Seq("join", "scan", "merge", "vector"),
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val d = docs(s, dir)
    val tok = d.select(
      col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("term"))
    val perDoc = tok.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      terms.map(t => sum(when(col("term") === t, 1L)).as(s"tf_$t")): _*)
    val stackArgs = terms.map(t => s"'$t', tf_$t").mkString(", ")
    val tf = perDoc
      .selectExpr("doc_id", "dl",
        s"stack(${terms.length}, $stackArgs) AS (term, tf)")
      .where(col("tf") > 0)
    // df-per-term and avgdl in ONE one-row aggregation that reads
    // every perDoc column — both consumers of the perDoc exchange then
    // prune to the same schema, so the shuffle is computed once and
    // reused (separate dfreq/corpus aggs each prune differently and
    // defeat exchange reuse: three explodes instead of one)
    val statsRow = perDoc.agg(
      avg(col("dl")).as("avgdl"),
      terms.map(t =>
        count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t")): _*)
    val dfStackArgs = terms.map(t => s"'$t', df_$t").mkString(", ")
    val stats = statsRow.selectExpr("avgdl",
      s"stack(${terms.length}, $dfStackArgs) AS (term, df)")
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(stats), "term")
      .crossJoin(broadcast(nDocs))
      .select(
        col("doc_id"), col("term"), col("tf"), col("dl"), col("df"),
        round(
          log((col("n_docs") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
          6).as("bm25"))
  }

  /** Corpus vocabulary: the top-k tokens by total occurrence count,
    * with document frequency and a dense rank — the summary a
    * tokenizer-training / vocab-selection pass reads first.
    *
    * Shape at scale: canonical wordcount — explode + ONE keyed
    * aggregation (map-side partials collapse each partition to its
    * vocabulary before the shuffle, so the exchange carries ~|vocab|
    * rows per partition, not |tokens|). The top-k is
    * `TakeOrderedAndProject` (per-partition heaps, never a global
    * sort), and the rank window runs AFTER the limit — over k rows,
    * not the vocabulary. Ties at the cut are broken by token, so the
    * result set is deterministic.
    */
  def vocabTopK(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val agg = docs(s, dir)
      .select(col("doc_id"), explode(wsTokens).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("df"))
    val top = agg.orderBy(col("cnt").desc, col("token")).limit(k)
    // global rank == rank within the top-k: the limit selected by the
    // same (cnt desc, token) order the window ranks by
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    top.select(col("token"), col("cnt"), col("df"),
      row_number().over(w).as("rank"))
  }

  /** BPE first-merge pair statistics: the top-k adjacent character
    * pairs by corpus occurrence count — the statistic one iteration of
    * byte-pair-encoding merges on (Sennrich et al. 2016 §3.2). A full
    * BPE trainer repeats this after rewriting the vocabulary with the
    * winning merge; the per-iteration aggregate is the distributed
    * part, and this IS that aggregate.
    *
    * Shape at scale: token explode + ONE vocab-keyed aggregation
    * collapses the corpus to its word-frequency table (|vocab| rows —
    * the map-side partials carry vocabularies, not tokens), and all
    * pair counting then runs over that TINY relation: per-word
    * character pairs weighted by word count, one pair-keyed
    * aggregation, top-k via per-partition heaps
    * (`TakeOrderedAndProject`). The expensive object (the corpus) is
    * touched exactly once, by the wordcount — every later stage is
    * vocabulary-sized. Ties at the cut break by pair text, so the
    * result is deterministic.
    */
  def bpePairs(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val words = docs(s, dir)
      .select(explode(wsTokens).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // sequence(1, n) is DESCENDING when n < 1 — guard out 1-char words
    // rather than generate a [1, 0] index walk
    val pairs = words
      .filter(length(col("word")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"
      )).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("pair_count"))
    val top = pairs.orderBy(col("pair_count").desc, col("pair")).limit(k)
    // global rank == rank within the top-k: the limit selected by the
    // same (pair_count desc, pair) order the window ranks by
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pair_count").desc, col("pair"))
    top.select(col("pair"), col("pair_count"),
      row_number().over(w).as("rank"))
  }

  /** One trained BPE merge: rank order, the two merged symbols, their
    * concatenation, and the pair count that won the round.
    */
  final case class BpeMerge(
      rank: Int, left_sym: String, right_sym: String,
      merged: String, pair_count: Long)

  /** Symbol-sequence encoding used by the BPE trainer: each symbol
    * wrapped in `|` and concatenated, so the word "low" starts as
    * `|l||o||w|`. Merging pair (l, r) is then the plain string replace
    * `|l||r|` → `|lr|` — left-to-right and non-overlapping in BOTH
    * engines (JVM and DuckDB `replace` share that contract), the
    * boundary markers make a symbol-suffix match impossible, and a
    * same-symbol run pairs up greedily (`aaaa` → `aa aa`) because
    * adjacent matches share no characters. Tokens containing the
    * wrapper character are dropped (both sides) rather than escaped.
    */
  private def bpeWords(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(wsTokens).as("word"))
      .filter(length(col("word")) >= 1 && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("|"), concat_ws("||", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")),
        lit("|")).as("word"), col("cnt"))

  /** Unwrap `|l||o||w|` back to its symbol array. */
  private val bpeSyms =
    expr("split(substring(word, 2, length(word) - 2), '\\\\|\\\\|')")

  /** The full iterative BPE trainer (Sennrich et al. 2016 §3.1): k
    * rounds of count-adjacent-pairs → take the argmax → rewrite the
    * vocabulary with the winning merge. Returns the merge table and
    * the final (fully-merged) vocabulary state.
    *
    * Shape at scale: the corpus is touched ONCE, by the wordcount
    * collapse in [[bpeWords]] (map-side partials carry vocabularies,
    * not tokens). Every round after that runs over the vocabulary-
    * sized relation: pair counting is explode + one keyed aggregation,
    * the argmax brings exactly ONE row to the driver per round (the
    * [[Dedup.connectedComponents]] convergence-signature economics),
    * and the rewrite is a narrow codegen'd `replace` projection. Each
    * round EAGERLY `localCheckpoint`s its state and releases the
    * previous one — the [[Dedup.connectedComponents]] discipline, and
    * just as load-bearing here: deriving round j from round j−1's
    * un-truncated plan makes every expression that references `word`
    * duplicate the collapsed replace-chain, and analysis cost doubles
    * per round (measured: OOM by round 16 even on the sf0.001 fixture;
    * checkpointed, 20 rounds run in seconds flat). Rounds stop early
    * (fewer than k merges) when no adjacent pair remains.
    */
  private[graft] def bpeLoop(
      s: SparkSession, dir: String, k: Int,
      scope: CacheScope = new CacheScope
  ): (Seq[BpeMerge], DataFrame) = {
    var words = bpeWords(s, dir).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val top = words
        .select(col("cnt"), bpeSyms.as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pair_count"))
        .orderBy(desc("pair_count"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(round, l, r, l + r, cnt)
        val next = words.select(
          replace(col("word"), lit("|" + l + "||" + r + "|"),
            lit("|" + l + r + "|")).as("word"), col("cnt"))
          .localCheckpoint(true) // eager: truncates lineage for real
        Dedup.unpersistCheckpoint(words)
        words = next
        round += 1
      }
    }
    // only the FINAL state outlives the loop; hand it to the scope so
    // the caller's terminal action can still read it, then release
    val finalWords = words
    scope.onRelease(() => Dedup.unpersistCheckpoint(finalWords))
    (merges.toSeq, finalWords)
  }

  /** BPE merge table: the first k trained merges in rank order. */
  def bpeTrain(
      s: SparkSession, dir: String, k: Int = 20,
      scope: CacheScope = new CacheScope): DataFrame = {
    import s.implicits._
    val (merges, words) = bpeLoop(s, dir, k, scope)
    Dedup.unpersistCheckpoint(words) // merges already on the driver
    merges.toDF()
  }

  /** BPE tokenize-apply: the corpus token-frequency table AFTER the
    * first k merges — each (symbol, summed word count) of the trained
    * vocabulary state. The apply path over raw text is the same k
    * chained `replace` projections (narrow, codegen'd, embarrassingly
    * parallel) that the trainer used on the vocabulary.
    */
  def bpeTokens(
      s: SparkSession, dir: String, k: Int = 20,
      scope: CacheScope = new CacheScope): DataFrame = {
    val (_, words) = bpeLoop(s, dir, k, scope)
    words
      .select(col("cnt"), explode(bpeSyms).as("token"))
      .groupBy("token").agg(sum("cnt").as("token_count"))
  }

  /** Repetition signals (Gopher-shaped, Rae et al. 2021 §A1.1, token-
    * rather than character-weighted): per document, the fraction of
    * 2-gram occurrences claimed by the single most frequent 2-gram
    * (`top2_frac`), the fraction of 2-/3-gram occurrences that belong
    * to any repeated gram (`dup2_frac`/`dup3_frac`), and a keep flag
    * at the usual thresholds. Boilerplate and looped generations light
    * these up; natural text stays low.
    *
    * Shape at scale: ONE scan + ONE explode (2- and 3-grams ride the
    * same exploded relation, discriminated afterwards by token count —
    * a gram can't contain whitespace, so `size(split(gram))` recovers
    * n), then two keyed aggregations: (doc_id, gram) → doc_id. Nothing
    * global, nothing driver-side; 100 TB safe. Documents shorter than
    * the gram width surface with null stats via the final left join —
    * the oracle mirrors the same null algebra.
    */
  def repetitionScores(s: SparkSession, dir: String): DataFrame = {
    val stats = repetitionStats(docs(s, dir))
    val top2Frac = col("top2_cnt") / col("n_grams2")
    val dup3Frac = coalesce(col("dup3_occ"), lit(0L)) / col("n_grams3")
    docs(s, dir).select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_grams2"), col("top2_cnt"),
        top2Frac.as("top2_frac"),
        (coalesce(col("dup2_occ"), lit(0L)) / col("n_grams2")).as("dup2_frac"),
        col("n_grams3"),
        dup3Frac.as("dup3_frac"),
        (top2Frac <= 0.2 && dup3Frac <= 0.18).as("keep_rep"))
  }

  /** The aggregated 2-/3-gram repetition stats behind
    * [[repetitionScores]], keyed by doc_id — shared with
    * [[Filtering.qualityFilter]] so the composite filter rides the
    * same gram exchange instead of re-deriving it.
    */
  private[ops] def repetitionStats(d: DataFrame): DataFrame = {
    // typed empty array<string> for the CASE arm (array() is untyped)
    val grams = d
      .select(col("doc_id"), wsTokens.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """concat(
          |  transform(sequence(0, size(toks) - 2),
          |            i -> concat_ws(' ', slice(toks, i + 1, 2))),
          |  CASE WHEN size(toks) >= 3 THEN
          |    transform(sequence(0, size(toks) - 3),
          |              i -> concat_ws(' ', slice(toks, i + 1, 3)))
          |  ELSE slice(array(''), 1, 0) END)""".stripMargin
      )).as("gram"))
    val n = size(split(col("gram"), " "))
    val counts = grams
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("c"), n.as("n"))
    counts.groupBy("doc_id").agg(
      sum(when(col("n") === 2, col("c"))).as("n_grams2"),
      max(when(col("n") === 2, col("c"))).as("top2_cnt"),
      sum(when(col("n") === 2 && col("c") > 1, col("c"))).as("dup2_occ"),
      sum(when(col("n") === 3, col("c"))).as("n_grams3"),
      sum(when(col("n") === 3 && col("c") > 1, col("c"))).as("dup3_occ"))
  }

  /** Per-row quality-signal columns over a `documents` relation — the
    * select list [[qualityScores]] and [[Filtering.qualityFilter]]
    * share, so the two can never drift. Narrow: no exchange.
    */
  private[ops] def qualitySignals(d: DataFrame): DataFrame = {
    val toks = wsTokens
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin("a", "the", "of", "and")))
    d.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      nTok.as("n_tokens"),
      ((length(col("text")) - nTok + 1) / nTok.cast("double"))
        .as("mean_token_len"),
      stopCnt.as("stop_cnt"),
      (stopCnt / nTok.cast("double")).as("stop_ratio"))
  }

  /** Unigram-LM surprisal scoring: per document, the mean negative log
    * probability of its tokens under the corpus's own unigram model —
    * the classic cheap LM-quality filter (high surprisal = rare-token
    * gibberish, low = degenerate repetition; both tails get cut).
    * No smoothing is needed because the vocabulary IS the corpus's.
    *
    * Shape at scale: tokens explode once; the vocabulary aggregation
    * and the token→probability join are BOTH keyed by token, so the
    * exchange is computed once and reused (the join is a shuffle join
    * on purpose — at corpus scale the vocabulary is too big to
    * broadcast); the one-row token total is broadcast. The per-doc
    * mean then re-keys by doc_id: three exchanges total, each keyed,
    * nothing driver-side.
    *
    * Determinism: a float sum over a shuffled relation is
    * order-dependent, so per-token surprisals are rounded to 12
    * decimals and summed as DECIMAL(28,12) — exact, associative,
    * order-independent (the same decimal-mediation trick as the IVF
    * Lloyd means). The final mean is rounded to 6 because `ln` is the
    * one step libm and the JVM may disagree on in the last ulp.
    */
  def surprisal(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(wsTokens).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum("cnt").as("total"))
    val scored = tok.join(vocab, "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(-log(col("cnt") / col("total")), 12)
          .cast("decimal(28,12)").as("sp"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("sp").as("sp_sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sp_sum").cast("double") / col("n_tokens"), 6)
          .as("surprisal"))
  }

  /** PII scrubbing — redact emails, SSNs, and phone numbers before a
    * corpus reaches training. The fixture corpus carries no PII, so
    * the operator first injects a deterministic synthetic
    * email/phone/SSN per document (mirrored in the oracle), then
    * scrubs: counts per category from the pre-scrub text, plus the
    * scrubbed text's length and fingerprint as proof of the rewrite.
    * Pure regexp built-ins — narrow, codegen'd, no UDFs; the patterns
    * stick to syntax Java regex and RE2 interpret identically.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val aug = concat(
      lower(col("text")),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ssn 123-45-6789."))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("t"), email, "<EMAIL>"),
        ssn, "<SSN>"),
      phone, "<PHONE>")
    docs(s, dir).select(col("doc_id"), aug.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"), lit(ssn), lit(0))).as("n_ssns"),
        size(regexp_extract_all(col("t"), lit(phone), lit(0))).as("n_phones"),
        length(scrubbed).as("n_chars"),
        md5(scrubbed.cast("binary")).as("scrub_fp"))
  }

  /** Sentence segmentation stats — the sentence-level sibling of the
    * token/char quality scores: sentences are maximal runs ending in
    * `.`/`!`/`?`, and the per-doc relation carries count, total/max
    * sentence length, and the first sentence's fingerprint. The
    * fixture corpus carries no sentence punctuation, so the operator
    * first derives a punctuated variant via `translate` (mirrored in
    * the oracle — the piiScrub injection convention). Trailing text
    * with no terminator is deliberately not a sentence.
    *
    * Regex-engine note: the quantifier is POSSESSIVE (`++`) on the
    * JVM side — with a greedy `+`, every unterminated tail is an
    * O(n²) backtracking failure in `java.util.regex` (measured 3.5 ms
    * per 460-char row before the fix); the disjoint character classes
    * make possessive ≡ greedy in MATCH semantics, so DuckDB's RE2 —
    * linear by construction, and without possessive syntax — uses
    * plain `+` for identical results. Narrow built-ins, zero
    * exchanges.
    */
  def sentences(s: SparkSession, dir: String): DataFrame = {
    val punct = translate(col("text"), "eo", ".!")
    val arr = regexp_extract_all(punct, lit("[^.!?]++[.!?]"), lit(0))
    docs(s, dir).select(
      col("doc_id"),
      size(arr).as("n_sentences"),
      aggregate(arr, lit(0L), (a, x) => a + length(x).cast("long"))
        .as("total_chars"),
      coalesce(array_max(transform(arr, x => length(x))), lit(0))
        .as("max_chars"),
      coalesce(md5(try_element_at(arr, lit(1)).cast("binary")), lit("none"))
        .as("first_fp"))
  }

  /** Per-source distinguishing terms by TF-IDF at the SOURCE
    * granularity: tf = term count within the source, df = number of
    * sources containing the term, idf = ln(n_sources/df) rounded to
    * 12 decimals, score = tf·idf — the corpus-characterization pass
    * that names what each slice is about. Exact counts throughout;
    * the top-5 per source ranks (score desc, token) inside a
    * source-partitioned window — keyed, WindowGroupLimit-shaped,
    * never a global sort.
    */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // the fixture shares one vocabulary across sources (idf would be
    // ~0 everywhere), so each doc carries injected source markers —
    // one universal per doc, one on even docs — mirrored in the
    // oracle, the piiScrub injection convention
    val aug = concat(trim(lower(col("text"))),
      lit(" kwa"), substring(md5(col("source").cast("binary")), 1, 6),
      when(col("doc_id") % 2 === 0,
        concat(lit(" kwb"),
          substring(md5(col("source").cast("binary")), 7, 6)))
        .otherwise(lit("")))
    val tok = docs(s, dir)
      .select(col("source"), explode(split(aug, "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token")
      .agg(countDistinct("source").as("df"))
    val nSrc = tf.select(countDistinct("source").as("n_src"))
    val scored = tf.join(df, "token").crossJoin(broadcast(nSrc))
      .withColumn("score",
        col("tf").cast("double") *
          round(log(col("n_src").cast("double") /
            col("df").cast("double")), 12))
      .filter(col("score") > 0) // terms in every source carry idf 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("token"), col("tf"),
        col("df"), round(col("score"), 6).as("score"))
  }

  /** Collocation mining by pointwise mutual information: the top
    * adjacent token pairs whose co-occurrence beats independence —
    * PMI = ln(p(w1,w2) / (p(w1)·p(w2))) over exact corpus counts,
    * thresholded at pair count ≥ 5 (the classic sparse-PMI guard).
    * Bigrams explode ROW-LOCALLY from each token array (1-based
    * `element_at`, mirroring the oracle's 1-based lists); the only
    * corpus-proportional stages are the unigram and bigram count
    * aggregations. The probability ratios divide exact longs in a
    * fixed order (scale-safe — no integer products that could
    * overflow past 2^53) and the one transcendental step rounds to
    * 12 decimals, so the score hash-matches cross-engine. Output is
    * deterministic: ORDER BY (pmi desc, w1, w2) LIMIT 30.
    */
  def pmiCollocations(s: SparkSession, dir: String,
      minCount: Int = 5, k: Int = 30): DataFrame = {
    val tk = docs(s, dir).select(filter(wsTokens, t => t =!= "").as("t"))
    val uni = tk.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val big = tk.select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS w1,
          |    element_at(t, i + 1) AS w2))""".stripMargin)).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val nTotal = uni.agg(sum("c1").as("n")).select(col("n"))
    val mTotal = big.agg(sum("c2").as("m")).select(col("m"))
    val u1 = uni.select(col("w").as("w1"), col("c1").as("c1a"))
    val u2 = uni.select(col("w").as("w2"), col("c1").as("c1b"))
    big.join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(nTotal)).crossJoin(broadcast(mTotal))
      .select(col("w1"), col("w2"), col("c2"),
        round(log(
          (col("c2").cast("double") / col("m").cast("double")) /
            ((col("c1a").cast("double") / col("n").cast("double")) *
              (col("c1b").cast("double") / col("n").cast("double")))),
          12).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Flesch reading-ease per document — the classic readability
    * signal quality filters threshold on: words per sentence and
    * syllables per word, where sentences use [[sentences]]' injected
    * punctuation and syllables are vowel-group runs (the standard
    * heuristic). Every count is an exact integer; the score's three
    * constants and two ratios are integer-derived doubles computed
    * in the same order on both engines, rounded to 6. Zero
    * exchanges, all codegen'd built-ins.
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val punct = translate(col("text"), "eo", ".!")
    val nSent = greatest(
      size(regexp_extract_all(punct, lit("[^.!?]++[.!?]"), lit(0))),
      lit(1))
    val nWords = greatest(
      size(filter(wsTokens, w => w =!= "")), lit(1))
    val nSyll = size(
      regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
    docs(s, dir).select(
      col("doc_id"),
      nWords.as("n_words"), nSent.as("n_sentences"),
      nSyll.as("n_syllables"),
      round(
        lit(206.835)
          - lit(1.015) *
            (nWords.cast("double") / nSent.cast("double"))
          - lit(84.6) *
            (nSyll.cast("double") / nWords.cast("double")),
        6).as("flesch"))
  }

  /** WordPiece-style GREEDY max-munch tokenization — the other half of
    * the subword family next to BPE's merge-rule apply: the vocabulary
    * is the corpus's top-`topWords` whole words plus its full
    * character alphabet (so segmentation can never fail), and each
    * word is consumed left to right by always taking the LONGEST
    * vocabulary entry matching at the cursor. (Real WordPiece marks
    * continuations with `##`; this engine's variant uses one flat
    * vocabulary — the greedy max-munch control flow, which is what
    * distinguishes it from BPE, is identical.)
    *
    * Scale shape: the corpus is touched exactly once (the word-count
    * aggregation); segmentation runs over the DISTINCT-WORD relation
    * (vocabulary-sized, not corpus-sized) with the bounded vocab
    * (topWords + |alphabet| entries) broadcast, and piece counts
    * weight each word by its corpus frequency — the same
    * distinct-then-weight economics the BPE trainer uses. Driver
    * state is the bounded vocabulary only. The DuckDB oracle replays
    * the greedy cursor per word in a recursive CTE whose step picks
    * the longest matching entry by correlated subquery — hash
    * equality pins every max-munch decision.
    */
  def wordpieceTokens(s: SparkSession, dir: String,
      topWords: Int = 50, topPieces: Int = 40): DataFrame = {
    import s.implicits._
    val words = docs(s, dir)
      .select(explode(wsTokens).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .cache()
    val top = words.orderBy(col("n").desc, col("word")).limit(topWords)
      .select("word").as[String].collect()
    val alphabet = words.select(explode(transform(
        sequence(lit(0), length(col("word")) - 1),
        i => col("word").substr(i + 1, lit(1)))).as("c"))
      .distinct().as[String].collect()
    val vocab = (top ++ alphabet).toSet
    val maxLen = vocab.iterator.map(_.length).max
    val bc = s.sparkContext.broadcast((vocab, maxLen))
    val pieces = words.as[(String, Long)].mapPartitions { it =>
      val (v, ml) = bc.value
      it.flatMap { case (w, n) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var pos = 0
        while (pos < w.length) {
          var l = math.min(ml, w.length - pos)
          while (l > 1 && !v.contains(w.substring(pos, pos + l))) l -= 1
          // l == 1 always matches: the alphabet is in the vocabulary
          out += ((w.substring(pos, pos + l), n))
          pos += l
        }
        out
      }
    }.toDF("piece", "n")
    pieces.groupBy("piece")
      .agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("piece"))
      .limit(topPieces)
  }

  /** Textcat-style (Cavnar & Trenkle 1994) n-gram-profile language
    * ID — the document-level upgrade over [[langId]]'s stopword
    * voting: each language's profile is its top-`profN` padded char
    * TRIGRAMS ranked by frequency on the hash-stable train split
    * (labels come from the corpus's own `lang` column), each
    * document's profile is its top-`docN` trigrams, and the score is
    * the classic OUT-OF-PLACE distance — Σ |doc rank − lang rank|
    * with a fixed `profN` penalty for grams absent from the language
    * profile. Lowest distance wins; ties break lexicographically via
    * the lpad-encoded min (binary-collation argmin on both engines,
    * the profile_columns trick).
    *
    * Everything is exact integer arithmetic — no logs, no doubles —
    * so the oracle replays it bit-for-bit. Shape at scale: ONE
    * corpus tokenize/explode; profiles rank under keyed windows
    * (per-lang, per-doc — WindowGroupLimit prunes); the scoring join
    * is doc-top-grams × |languages| rows against a profile relation
    * of |languages|·profN rows (broadcast). The fixture shares one
    * vocabulary across its lang labels, so the interesting part is
    * the deterministic rank/penalty plumbing — on real multilingual
    * text the same plan separates scripts sharply.
    */
  def langIdNgram(s: SparkSession, dir: String,
      profN: Int = 40, docN: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val nib = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit("#split"))), 1, 1),
      16, 10).cast("int")
    val grams = docs(s, dir)
      .select(col("doc_id"), col("lang"), nib.as("nib"),
        explode(filter(wsTokens, t => t =!= "")).as("word"))
      .select(col("doc_id"), col("lang"), col("nib"),
        concat(lit("_"), col("word"), lit("_")).as("p"))
      .select(col("doc_id"), col("lang"), col("nib"),
        explode(expr(
          "transform(sequence(1, length(p) - 2), i -> substr(p, i, 3))"))
          .as("gram"))
    val langProf = grams.filter(col("nib") <= 13)
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        w.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rnk") <= profN)
      .select(col("lang"), col("gram"), col("rnk").as("lang_rnk"))
    val docProf = grams
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        w.partitionBy("doc_id").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rnk") <= docN)
      .select(col("doc_id"), col("gram"), col("rnk"))
    val langs = langProf.select("lang").distinct()
    val dist = docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("lang", "gram"), "left")
      .groupBy("doc_id", "lang")
      .agg(sum(coalesce(abs(col("rnk") - col("lang_rnk")),
        lit(profN.toLong))).cast("long").as("distance"))
    val best = dist.groupBy("doc_id")
      .agg(min(concat(lpad(col("distance").cast("string"), 10, "0"),
        col("lang"))).as("m"))
    best.join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang").as("lang_label"),
        expr("substring(m, 11)").as("lang_pred"),
        substring(col("m"), 1, 10).cast("long").as("distance"))
  }
}
