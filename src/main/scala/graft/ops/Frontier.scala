package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling: politeness-partitioned fetch waves.
  * A crawler may open at most `perWave` concurrent fetches against
  * one host, so the frontier is cut into waves — URL i of a host
  * fetches in wave `rank/perWave` — and a wave is a fully
  * parallelizable unit ACROSS hosts. This is the assignment pass
  * that turns a URL list into a rate-respecting fetch plan; its
  * output cardinality per (host, wave) is bounded by `perWave` at
  * any corpus size.
  *
  * Ordering inside a host is deterministic: allowed URLs first (the
  * robots verdict gates admission, [[Robots]]), then sitemap
  * priority descending, then doc_id — so the plan replays
  * identically on every run.
  *
  * Shape at scale: ONE host-keyed exchange; the rank is a window
  * over the host partition, which Spark bounds fine here because the
  * downstream `wave` consumer needs EVERY row ranked (this is the
  * one window the WindowGroupLimit rewrite can't collapse — there is
  * no top-k; the whole frontier gets a wave). A pathologically hot
  * host concentrates its rows in one partition — the protocol-level
  * answer is that a polite crawler NEEDS per-host serialization; the
  * engineering answer (sub-splitting by salted rank then offsetting
  * waves) is documented here as the >10⁸-URLs-per-host escape hatch.
  */
object Frontier {

  /** Per-URL wave assignment over the canonical frontier. Admission
    * comes from [[Robots.admissions]] — the same pipeline the
    * crawl_policy query pins, shared so the fetch plan can never
    * diverge from the policy verdicts.
    */
  def fetchWaves(
      s: SparkSession, dir: String, perWave: Int = 4): DataFrame = {
    val admitted = Robots.admissions(s, dir)
      .select(col("doc_id"), col("host"), col("norm_url"),
        col("allowed"))
      .withColumn("priority",
        concat(lit("0."), (col("doc_id") % 10).cast("string")))
    val w = Window.partitionBy("host")
      .orderBy(col("allowed").desc, col("priority").desc, col("doc_id"))
    admitted
      .withColumn("host_rank", row_number().over(w))
      .withColumn("wave",
        when(col("allowed"), ((col("host_rank") - 1) / perWave)
          .cast("int"))
          .otherwise(lit(-1)))
      .select(col("doc_id"), col("host"), col("norm_url"),
        col("priority"), col("allowed"), col("host_rank"), col("wave"))
  }
}
