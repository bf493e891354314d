package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer training (Kudo 2018,
  * "Subword Regularization"), hard-EM variant — the third major
  * subword family next to [[TextOps.bpeTrain]]'s merge learning and
  * [[TextOps.wordpieceTokens]]'s greedy max-munch, and a genuinely
  * different iteration shape: BPE grows a vocabulary bottom-up by
  * argmax merges, unigram-LM starts from an over-complete substring
  * seed and SHRINKS it by expectation-maximization over the
  * segmentation lattice.
  *
  * Model, exactly as the oracle replays it:
  *  1. SEED: every substring of length ≤ 4 of the distinct-word
  *     relation, occurrence-weighted by word frequency; multi-char
  *     pieces need count ≥ 2 and only the top 200 (count desc, piece)
  *     survive; single chars are always kept (coverage guarantee).
  *     Piece log probability = ln(count/total) rounded to 12 decimals
  *     — all lattice scores are DECIMAL sums of these, so every
  *     Viterbi comparison is exact on both engines.
  *  2. EM ×2 (hard): VITERBI-segment every distinct word under the
  *     current piece log-probs (ties: higher score, then
  *     lexicographically smallest piece-path — the same
  *     `row_number() OVER (ORDER BY score DESC, path)` rule the
  *     oracle's per-position CTEs apply), re-count pieces from the
  *     chosen segmentations (word-frequency weighted), floor every
  *     single char at +1 so coverage never collapses, renormalize.
  *  3. PRUNE to the top 24 pieces (count desc, piece) plus all
  *     single chars, renormalize, and APPLY: final Viterbi
  *     segmentation of the corpus, reported as piece frequencies.
  *
  * Scale shape (the [[TextOps.wordpieceTokens]] economics): the
  * corpus is touched exactly ONCE (the word-count aggregation);
  * everything after runs on the distinct-word relation with the
  * BOUNDED vocabulary (≤ 200 + alphabet entries) broadcast —
  * segmentation is embarrassingly parallel `mapPartitions`, piece
  * re-counts are keyed aggregations, and each EM round collects only
  * the vocabulary-sized count relation back to the driver. Words
  * longer than 12 chars are excluded from training (SentencePiece's
  * max-sentence-length trimming, mirrored by the oracle's fixed
  * 12-position lattice).
  */
object UnigramLm {

  private val MaxPieceLen = 4
  private val MaxWordLen = 12
  private val MinSeedCount = 2L
  private val SeedCap = 200
  private val VocabSize = 24
  private val EmIters = 2
  private val TopK = 40

  private def logp(counts: Seq[(String, Long)])
      : Map[String, java.math.BigDecimal] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) =>
      p -> new java.math.BigDecimal(math.log(c.toDouble / total))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }.toMap
  }

  /** Viterbi segmentation under exact decimal scores; ties prefer the
    * lexicographically smaller accumulated piece path (binary
    * collation — ASCII pieces joined by '|'), mirroring the oracle's
    * per-position argmax.
    */
  private[graft] def segment(
      w: String, lp: Map[String, java.math.BigDecimal]): Seq[String] = {
    val n = w.length
    val score = new Array[java.math.BigDecimal](n + 1)
    val path = new Array[String](n + 1)
    score(0) = java.math.BigDecimal.ZERO.setScale(12)
    path(0) = ""
    var i = 1
    while (i <= n) {
      var bs: java.math.BigDecimal = null
      var bp: String = null
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (score(j) != null) {
          val piece = w.substring(j, i)
          val l = lp.getOrElse(piece, null)
          if (l != null) {
            val s2 = score(j).add(l)
            val p2 = if (path(j).isEmpty) piece else path(j) + "|" + piece
            val better = bs == null || {
              val c = s2.compareTo(bs)
              c > 0 || (c == 0 && p2.compareTo(bp) < 0)
            }
            if (better) { bs = s2; bp = p2 }
          }
        }
        j += 1
      }
      score(i) = bs; path(i) = bp
      i += 1
    }
    if (path(n) == null) Seq.empty else path(n).split('|').toSeq
  }

  /** Train + apply over the documents corpus:
    * (piece, n_occurrences, rank) — the top-40 learned pieces by
    * corpus frequency under the final model's segmentation.
    */
  def unigramPieces(s: SparkSession, dir: String): DataFrame =
    unigramPiecesOf(s, s.read.parquet(s"$dir/documents.parquet"))

  private[graft] def unigramPiecesOf(
      s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val wsTokens = split(trim(lower(col("text"))), "\\s+")
    val words = d.select(explode(wsTokens).as("word"))
      .filter(col("word") =!= "" &&
        length(col("word")) <= MaxWordLen &&
        !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .cache()

    // over-complete substring seed, occurrence-weighted
    val sub = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("cnt"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("i") + col("l") <= length(col("word")) + 1)
      .select(expr("substring(word, i, l)").as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))
    val multi = sub
      .filter(length(col("piece")) >= 2 && col("cnt") >= MinSeedCount)
      .orderBy(col("cnt").desc, col("piece")).limit(SeedCap)
    val charCounts = sub.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toSeq
    val charSet = charCounts.map(_._1).toSet
    var vocab = logp(
      multi.as[(String, Long)].collect().toSeq ++ charCounts)

    // hard-EM rounds: segment (distributed, bounded vocab broadcast),
    // re-count (keyed agg, vocabulary-sized collect), char floor +1
    val typedWords = words.as[(String, Long)]
    def segCounts(lp: Map[String, java.math.BigDecimal]): Seq[(String, Long)] = {
      val bc = s.sparkContext.broadcast(lp)
      typedWords.mapPartitions { it =>
        it.flatMap { case (w, n) => segment(w, bc.value).map(_ -> n) }
      }.toDF("piece", "n")
        .groupBy("piece").agg(sum("n").as("cnt"))
        .as[(String, Long)].collect().toSeq
    }
    var floored: Seq[(String, Long)] = Nil
    for (_ <- 1 to EmIters) {
      val seg = segCounts(vocab).toMap
      floored = (seg.keySet ++ charSet).toSeq.map { p =>
        p -> (seg.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
      }
      vocab = logp(floored)
    }

    // prune the LAST round's floored counts to VocabSize + alphabet,
    // then one final apply pass over the corpus word frequencies
    require(floored.nonEmpty, "empty unigram vocabulary")
    val ranked = floored.sortBy { case (p, c) => (-c, p) }.zipWithIndex
    val kept = ranked.collect {
      case ((p, c), i) if i < VocabSize || p.length == 1 => (p, c)
    }
    val lpFinal = logp(kept)
    val bcF = s.sparkContext.broadcast(lpFinal)
    val out = typedWords.mapPartitions { it =>
      it.flatMap { case (w, n) => segment(w, bcF.value).map(_ -> n) }
    }.toDF("piece", "n")
      .groupBy("piece").agg(sum("n").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("piece")).limit(TopK)
      .withColumn("rank", row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("piece")))
        .cast("int"))
    // The result is bounded (≤ TopK rows): materialize it eagerly so
    // the word-count cache — needed by every EM pass above AND this
    // final apply — can be released NOW instead of leaking for the
    // session lifetime (returning the lazy plan would force a choice
    // between an un-cached extra corpus scan and the leak).
    val rows = out.as[(String, Long, Int)].collect().toSeq
    words.unpersist(blocking = true)
    rows.toDF("piece", "n_occurrences", "rank")
  }
}
