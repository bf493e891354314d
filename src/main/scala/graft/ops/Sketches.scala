package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches over the `documents` corpus.
  *
  * `approx_count_distinct` (HLL) answers the same question but its
  * estimate is engine-specific, so it can only ever be a rows-only
  * check against another engine. KMV (K-Minimum-Values, Bar-Yossef et
  * al. 2002) is the deterministic alternative: hash every element,
  * keep the k smallest distinct hash values, estimate the cardinality
  * from how densely they pack the hash range — (k−1) / R where R is
  * the k-th minimum normalized into [0,1). Every engine that hashes
  * with md5 and keeps the same k computes bit-identical sketches AND
  * bit-identical estimates, which makes the sketch itself
  * DuckDB-oracle-able — the property the HLL row can never have.
  *
  * Like HLL, KMV sketches merge: the union's sketch is the k smallest
  * of the union of the parts' k-minima. [[SketchesSpec]] pins that
  * merging the per-source sketches reproduces the corpus sketch
  * exactly — the property that lets 1000 executors sketch 100 TB
  * independently and combine the results losslessly on the driver.
  */
object Sketches {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** 60-bit hash: first 15 hex chars of md5, as a non-negative long.
    * 15 chars (not 16) keeps the value inside the positive signed-64
    * range on every engine — DuckDB mirrors with
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-source + whole-corpus KMV distinct-token sketches.
    *
    * Output per scope: `k_used` (how many minima the scope actually
    * has — below k the scope is exhausted and the "estimate" is the
    * exact distinct count), `kth_hash` (the largest kept minimum — the
    * sketch's boundary, pinning the whole sketch since any divergence
    * in the k-min set moves it with overwhelming probability), and
    * `est_distinct` = (k_used−1) · 2^60 / kth_hash. The int64→double
    * conversions round to nearest-even identically on the JVM and in
    * DuckDB, so the estimate hash-matches cross-engine.
    *
    * Shape at scale: the distinct is ONE (source, h)-keyed exchange
    * with map-side partial aggregation; the per-source k-minima use a
    * rank-≤-k window that Spark rewrites to WindowGroupLimit — each
    * map task forwards at most k rows per source into the exchange, so
    * the shuffle carries O(sources · k), not O(distinct tokens). The
    * corpus row re-ranks the union of the per-source minima (≤ k ·
    * sources rows — the sketch-merge, not a rescan of the corpus).
    */
  def kmvDistinctTokens(
      s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val tokens = docs(s, dir).select(
      col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val hashed = tokens.select(col("source"), h60(col("tok")).as("h"))
      .distinct()

    def kminima(in: DataFrame): DataFrame = {
      val w = Window.partitionBy("source").orderBy("h")
      in.withColumn("r", row_number().over(w)).filter(col("r") <= k)
    }
    def sketch(minima: DataFrame): DataFrame =
      minima.groupBy("source").agg(
        max("r").cast("int").as("k_used"),
        max("h").as("kth_hash"))
        .withColumn("est_distinct",
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise((col("k_used") - 1).cast("double")
              * lit(math.pow(2, 60)) / col("kth_hash").cast("double")))

    val perSource = kminima(hashed)
    // corpus sketch by MERGE: re-rank the per-source minima only
    val merged = kminima(
      perSource.select(lit("__all__").as("source"), col("h")).distinct())
    sketch(perSource).unionByName(sketch(merged))
  }
}
