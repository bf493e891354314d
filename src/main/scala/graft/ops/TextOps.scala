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
}
