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
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin("a", "the", "of", "and")))
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      nTok.as("n_tokens"),
      ((length(col("text")) - nTok + 1) / nTok.cast("double"))
        .as("mean_token_len"),
      stopCnt.as("stop_cnt"),
      (stopCnt / nTok.cast("double")).as("stop_ratio"),
      (nTok >= lit(20) && nTok <= lit(1000) &&
        (stopCnt / nTok.cast("double")) >= lit(0.01)).as("keep"))
  }

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
}
