package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the fasttext-classifier slot
  * of a training-data pipeline (FineWeb-Edu-style), realized as a
  * multinomial Naive Bayes trained IN the engine: the train split's
  * heuristic keep/drop verdicts ([[Filtering.qualityFilter]] over
  * [[TrainPrep.splitAssign]]) are the labels, token counts are the
  * features, and every document — train, val, test — is scored with
  * Laplace-smoothed log-likelihoods. This is the standard bootstrap:
  * a cheap heuristic labels a slice, a model generalizes it, and the
  * val/test agreement rate says whether the model learned the rule.
  *
  * Determinism (the property that makes the MODEL oracle-able, not
  * just the counts): per-token log-likelihood terms are rounded to 12
  * decimals and summed as DECIMAL(28,12) — exact, associative,
  * order-independent across any shuffle width — and the final score
  * rounds to 6 because `ln` is the one step libm and the JVM may
  * disagree on in the last ulp. DuckDB replays training and scoring
  * bit-for-bit.
  *
  * Shape at scale: one token explode feeds BOTH training counts and
  * scoring (the token-keyed exchange is computed once); the model is
  * a vocabulary-sized relation that stays DISTRIBUTED — scoring joins
  * token-to-token (shuffle join on purpose: a 100 TB corpus's vocab
  * outgrows a broadcast), only the 1-row corpus stats broadcast. The
  * per-doc reduce re-keys by doc_id. No driver-side state at all —
  * unlike an iterative trainer, NB is one aggregation pass.
  */
object Classifier {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Train on the train split's heuristic verdicts, score every
    * document: per-class smoothed log-likelihood sums + priors,
    * predicted class, and agreement with the heuristic label.
    */
  def nbQuality(s: SparkSession, dir: String): DataFrame = {
    val verdict = Filtering.qualityFilter(s, dir)
      .select(col("doc_id"), col("keep"))
    val splits = TrainPrep.splitAssign(s, dir)
      .select(col("doc_id"), col("split"))
    // (doc_id, keep, split) is consumed three times (training counts,
    // class-prior row, final join); uncached, each consumer would
    // replay the verdict's full gram-explode subtree — cache the
    // 3-column per-doc relation (rows ∝ documents, not tokens) so the
    // corpus pays the verdict exchanges once. Released with the rest
    // of the session's operator caches (Bench unpersists between
    // timed queries; same lifecycle as Similarity's signature caches)
    val labeled = verdict.join(splits, "doc_id").cache()

    val tok = docs(s, dir).select(
      col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))

    // token counts per class over the train split only
    val trainTok = tok
      .join(labeled.filter(col("split") === "train"), "doc_id")
    val counts = trainTok.groupBy("token").agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("cnt_keep"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("cnt_drop"))

    // corpus stats: class token totals + vocabulary size (1 row) and
    // class document counts (1 row) — both broadcastable by nature
    val tokStats = counts.agg(
      sum("cnt_keep").as("tot_keep"),
      sum("cnt_drop").as("tot_drop"),
      count(lit(1)).as("vocab"))
    val docStats = labeled.filter(col("split") === "train").agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("docs_keep"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("docs_drop"))
    val stats = tokStats.crossJoin(docStats)

    // score every token instance of every document (left join: tokens
    // unseen in training fall back to the pure-smoothing term)
    def term(cnt: org.apache.spark.sql.Column,
             tot: org.apache.spark.sql.Column) =
      round(log((cnt + 1.0) / (tot + col("vocab"))), 12)
        .cast("decimal(28,12)")
    val scored = tok
      .join(counts, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        term(coalesce(col("cnt_keep"), lit(0L)), col("tot_keep")).as("sk"),
        term(coalesce(col("cnt_drop"), lit(0L)), col("tot_drop")).as("sd"))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      sum("sk").as("sk_sum"),
      sum("sd").as("sd_sum"))

    // priors (decimal-rounded like the token terms, added exactly)
    val priors = stats.select(
      round(log(col("docs_keep") /
        (col("docs_keep") + col("docs_drop")).cast("double")), 12)
        .cast("decimal(28,12)").as("prior_keep"),
      round(log(col("docs_drop") /
        (col("docs_keep") + col("docs_drop")).cast("double")), 12)
        .cast("decimal(28,12)").as("prior_drop"))

    val scoreK = round((col("prior_keep") + col("sk_sum")).cast("double"), 6)
    val scoreD = round((col("prior_drop") + col("sd_sum")).cast("double"), 6)
    perDoc
      .crossJoin(broadcast(priors))
      .join(labeled, "doc_id")
      .select(
        col("doc_id"), col("split"), col("keep").as("label"),
        col("n_tokens"),
        scoreK.as("score_keep"), scoreD.as("score_drop"),
        (scoreK >= scoreD).as("pred_keep"),
        ((scoreK >= scoreD) === col("keep")).as("agree"))
  }

  /** Calibration table: the per-document log-odds margin
    * (score_keep − score_drop) bucketed into fixed-width bins, with
    * per-bin prediction/label/agreement counts — the reliability
    * curve an ML-ops dashboard tracks to decide whether the
    * classifier's confidence is meaningful. Bins are fixed-width on
    * the margin (width 10, clamped to ±5) so the binning is
    * deterministic and oracle-able; every count is integral, and the
    * rate is an exact small-integer ratio.
    *
    * Shape: rides [[nbQuality]] (same exchanges) plus one |bins|-row
    * aggregation.
    */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    val margin = col("score_keep") - col("score_drop")
    val b = least(greatest(floor(margin / 10.0), lit(-5.0)), lit(5.0))
      .cast("int")
    nbQuality(s, dir)
      .withColumn("bin", b)
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pred_keep"), 1L).otherwise(0L)).as("n_pred_keep"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_label_keep"),
        sum(when(col("agree"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_rate",
        round(col("n_agree") / col("n_docs").cast("double"), 6))
  }
}
