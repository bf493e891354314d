package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted Bloom decontamination filter — the storage half of
  * continuous benchmark hygiene, completing the index symmetry with
  * [[LshIndex]] (near-dup) and [[VectorIndex]] (ANN): eval suites are
  * ingested ONCE into an mBits-bit filter on disk, and every arriving
  * corpus batch probes it without touching benchmark text again.
  *
  * Index layout (`<path>/…`, all parquet):
  *   - `words` — (w, bits): the filter as mBits/64 packed 64-bit
  *     words, DENSE (every word index present, zeros included) so the
  *     on-disk layout is fixed-size and byte-stable at any content.
  *   - `meta`  — one row (n_gram, m_bits, k_hash): the hash
  *     configuration, read back at probe/append time so neither can
  *     ever run with a mismatched gram width, filter size, or hash
  *     count — any of which would silently zero the hit rate.
  *
  * Append is where the Bloom representation earns the index form:
  * set-membership unions are exactly word-wise OR, so
  * `append(build(A), B)` produces the same words as `build(A ∪ B)`
  * bit-for-bit — no rebuild, no approximation creep, and the oracle
  * for the incremental query is the one-job query's oracle unchanged
  * (the equality LSH index appends can only claim under
  * guard-coincidence caveats is EXACT here). The filter never grows:
  * a production deployment sizes mBits for the final expected gram
  * count up front (false-positive rate degrades gracefully toward
  * saturation, never correctness — the one-sided guarantee is
  * load-independent).
  *
  * Scale: the index is mBits/8 bytes at ANY benchmark size — the
  * whole point. Both append sides and the probe's filter side are
  * driver-bounded by construction (mBits/64 longs), so the
  * `collect`s here are 8 KB, not data; the probed batch is the only
  * corpus-proportional relation and it never shuffles
  * ([[Dedup.bloomProbe]] is a broadcast + per-row codegen'd call).
  */
object BloomIndex {

  final case class Meta(nGram: Int, mBits: Int, kHash: Int)

  def readMeta(s: SparkSession, path: String): Meta = {
    val r = s.read.parquet(s"$path/meta").head()
    Meta(r.getAs[Int]("n_gram"), r.getAs[Int]("m_bits"),
      r.getAs[Int]("k_hash"))
  }

  /** Ingest the benchmark documents (`doc_id`, `text`) into a fresh
    * filter at `path`.
    */
  def build(
      s: SparkSession, bench: DataFrame, path: String,
      n: Int = 8, mBits: Int = 1 << 16, kHash: Int = 4): Unit = {
    require(mBits % 64 == 0 && kHash >= 1 && kHash <= 8,
      s"kHash must be in [1, 8]: $kHash (see Dedup.bloomWords overflow note)")
    val sparse = Dedup.bloomWords(Dedup.bloomGramSets(bench, n), mBits, kHash)
    // dense layout: every word present, zeros included
    s.range(mBits / 64).toDF("w")
      .join(sparse, Seq("w"), "left")
      .select(col("w"), coalesce(col("bits"), lit(0L)).as("bits"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/words")
    import s.implicits._
    Seq((n, mBits, kHash)).toDF("n_gram", "m_bits", "k_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Fold additional benchmark documents into the existing filter:
    * word-wise OR, bit-identical to having built from the union. The
    * existing words are collected first (mBits/8 bytes — bounded by
    * construction, not by data), so the overwrite never reads the
    * files it replaces.
    */
  def append(s: SparkSession, batch: DataFrame, path: String): Unit = {
    val meta = readMeta(s, path)
    val old = s.read.parquet(s"$path/words").collect()
      .map(r => r.getAs[Long]("w") -> r.getAs[Long]("bits")).toMap
    val add = Dedup.bloomWords(
      Dedup.bloomGramSets(batch, meta.nGram), meta.mBits, meta.kHash)
      .collect().map(r => r.getAs[Long]("w") -> r.getAs[Long]("bits")).toMap
    import s.implicits._
    (0L until (meta.mBits / 64).toLong)
      .map(w => (w, old.getOrElse(w, 0L) | add.getOrElse(w, 0L)))
      .toDF("w", "bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/words")
  }

  /** Probe a corpus batch (`doc_id`, `text`) against the persisted
    * filter: per doc, the count of benchmark-positive n-grams and the
    * contaminated verdict — same schema and semantics as
    * [[Dedup.bloomContamination]]'s probe half.
    */
  def probe(s: SparkSession, path: String, batch: DataFrame): DataFrame = {
    val meta = readMeta(s, path)
    val dense = Dedup.bloomDenseRow(
      s.read.parquet(s"$path/words").select("w", "bits"), meta.mBits)
    Dedup.bloomProbe(
      Dedup.bloomGramSets(batch, meta.nGram), dense, meta.kHash)
  }
}
