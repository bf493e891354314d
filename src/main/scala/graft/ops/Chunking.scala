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
}
