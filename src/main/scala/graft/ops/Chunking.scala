package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sentence-aware context-window chunking — the RAG-grade sibling of
  * [[CrawlOps.docChunks]]' sliding token windows: chunk boundaries
  * NEVER split a sentence.
  *
  * Sentences (the engine's shared segmentation convention — see
  * [[TextOps.sentences]]) are packed greedily in document order: a
  * sentence joins the current chunk while the chunk's token count
  * stays ≤ `budget`, else it starts the next chunk. A single sentence
  * longer than the budget gets a chunk of its own (kept whole — an
  * oversize chunk beats a mid-sentence cut for retrieval units;
  * token-exact packing with overlap is [[CrawlOps.docChunks]]'s job).
  *
  * The greedy fold is a row-local `aggregate` over the doc's own
  * sentence array and the chunk assembly a row-local
  * `zip_with`/`filter` — the whole plan is one narrow projection with
  * ZERO exchanges (spec-pinned): chunking 100 TB is embarrassingly
  * parallel and this formulation keeps it that way (no window-minted
  * ids, no ordering shuffle; chunk_id derives from the doc's own
  * sentence offsets). The DuckDB oracle replays the same recurrence
  * as a recursive CTE, so even the greedy boundary decisions are
  * pinned cross-engine.
  */
object Chunking {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** doc_id × (chunk_id, n_sentences, n_tokens, chunk_text). A text
    * with no sentence boundary yields no chunks.
    */
  def sentenceChunks(s: SparkSession, dir: String,
      budget: Int = 20): DataFrame =
    sentenceChunksOf(docs(s, dir), budget)

  private[graft] def sentenceChunksOf(
      d: DataFrame, budget: Int): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    // shared sentence convention: fixture prose carries no terminal
    // punctuation, so 'e'/'o' are transliterated to './!' first (the
    // TextOps.sentences rule)
    val sents = regexp_extract_all(
      translate(col("text"), "eo", ".!"), lit("[^.!?]++[.!?]"), lit(0))
    // greedy packer: fold (chunk id, tokens in current chunk) over the
    // sentences, emitting each sentence's chunk id. cid starts at -1
    // so the first sentence always opens chunk 0, oversize or not.
    val ids = expr(
      s"""aggregate(sents,
         |  struct(cast(-1 as int) as cid, cast(0 as int) as cur,
         |         cast(array() as array<int>) as ids),
         |  (a, x) -> if(a.cid < 0
         |               or a.cur + size(split(trim(x), '\\\\s+')) > $budget,
         |    struct(cast(a.cid + 1 as int) as cid,
         |           cast(size(split(trim(x), '\\\\s+')) as int) as cur,
         |           array_append(a.ids, cast(a.cid + 1 as int)) as ids),
         |    struct(a.cid as cid,
         |           cast(a.cur + size(split(trim(x), '\\\\s+')) as int)
         |             as cur,
         |           array_append(a.ids, a.cid) as ids)),
         |  a -> a.ids)""".stripMargin)
    d.select(col("doc_id"), sents.as("sents"))
      .withColumn("ids", ids)
      .withColumn("nc",
        coalesce(try_element_at(col("ids"), lit(-1)) + 1, lit(0)))
      .filter(col("nc") > 0)
      .select(col("doc_id"), col("sents"), col("ids"),
        explode(sequence(lit(0), col("nc") - 1)).as("c"))
      .withColumn("pairs", expr(
        "filter(zip_with(sents, ids, (s, i) -> struct(s as s, i as i)), " +
          "p -> p.i = c)"))
      .select(col("doc_id"),
        col("c").cast("int").as("chunk_id"),
        size(col("pairs")).as("n_sentences"),
        expr("cast(aggregate(pairs, 0, " +
          "(a, p) -> a + size(split(trim(p.s), '\\\\s+'))) as int)")
          .as("n_tokens"),
        expr("array_join(transform(pairs, p -> p.s), '')")
          .as("chunk_text"))
  }
}
