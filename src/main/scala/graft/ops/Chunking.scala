package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding context-window chunking — the step that turns documents
  * into model-context-sized training/RAG units.
  *
  * A document of n whitespace tokens yields
  * `1 + ceil(max(n − len, 0) / stride)` chunks starting at
  * 0, stride, 2·stride, …; each chunk carries up to `len` tokens (the
  * tail chunk may be shorter, never empty while stride ≤ len).
  * Consecutive chunks overlap by `len − stride` tokens — the overlap
  * that keeps boundary-spanning context visible to the model, the same
  * scheme HF tokenizers call `stride`. With stride = len the chunks
  * partition the stream exactly ([[ChunkingSpec]] pins both the
  * partition round-trip and the overlap identity).
  *
  * Everything is integer arithmetic + array slicing on one row at a
  * time: the plan is a single narrow projection with ZERO exchanges —
  * chunking 100 TB is embarrassingly parallel and this formulation
  * keeps it that way (no ids minted by window, no shuffle for
  * ordering; chunk_id is derived from the doc's own token offsets).
  */
object Chunking {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** doc_id × (chunk_id, chunk_start, chunk_tokens, chunk_text).
    * Case is preserved (chunks feed training; only the SPLIT is
    * whitespace-normalized). Whitespace-only documents yield no
    * chunks.
    */
  def slidingChunks(s: SparkSession, dir: String,
      len: Int = 32, stride: Int = 24): DataFrame =
    slidingChunksOf(docs(s, dir), len, stride)

  private[graft] def slidingChunksOf(
      d: DataFrame, len: Int, stride: Int): DataFrame = {
    // stride > len would leave token gaps between chunks and can mint
    // empty tail chunks; stride < 1 never advances
    require(len >= 1 && stride >= 1 && stride <= len,
      s"need 1 <= stride <= len, got len=$len stride=$stride")
    val toks = d.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
    // integer chunk count: 1 + ceil(max(n-len,0)/stride); the +1 chunk
    // always exists, so the explode sequence is never descending
    val withCount = toks.withColumn("nc",
      expr(s"1 + (greatest(n - $len, 0) + ${stride - 1}) div $stride"))
    val chunk: Column = slice(col("toks"), col("k") * stride + 1, lit(len))
    withCount
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("nc") - 1)).as("k"))
      .select(col("doc_id"),
        col("k").cast("int").as("chunk_id"),
        (col("k") * stride).cast("int").as("chunk_start"),
        size(chunk).as("chunk_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }

  /** Sentence-aware chunking — the RAG-grade sibling of
    * [[slidingChunks]]: chunk boundaries NEVER split a sentence.
    * Sentences (the engine's shared segmentation convention — see
    * [[TextOps.sentences]]) are packed greedily in document order:
    * a sentence joins the current chunk while the chunk's token count
    * stays ≤ `budget`, else it starts the next chunk. A single
    * sentence longer than the budget gets a chunk of its own (kept
    * whole — an oversize chunk beats a mid-sentence cut for retrieval
    * units; token-exact packing is [[slidingChunks]]'s job).
    *
    * The greedy fold is a row-local `aggregate` over the doc's own
    * sentence array and the chunk assembly a row-local
    * `zip_with`/`filter` — like [[slidingChunksOf]] the whole plan is
    * one narrow projection with ZERO exchanges (spec-pinned). The
    * DuckDB oracle replays the same recurrence as a recursive CTE, so
    * even the greedy boundary decisions are pinned cross-engine.
    */
  def sentenceChunks(s: SparkSession, dir: String,
      budget: Int = 20): DataFrame =
    sentenceChunksOf(docs(s, dir), budget)

  private[graft] def sentenceChunksOf(
      d: DataFrame, budget: Int): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    // shared sentence convention: fixture prose carries no terminal
    // punctuation, so 'e'/'o' are transliterated to './!' first (the
    // TextOps.sentences rule); a text with no boundary yields no
    // sentences and therefore no chunks
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
