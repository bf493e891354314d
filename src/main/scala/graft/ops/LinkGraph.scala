package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph PageRank — the crawl-prioritization signal: pages with
  * high in-link mass get fetched/refreshed first, and rank feeds the
  * quality prior of a crawl-sourced corpus. Implemented as the
  * classic distributed power iteration:
  *
  *   rank⁰(v) = 1/N
  *   rankᵗ⁺¹(v) = (1−d)/N + d · Σ_{u→v} rankᵗ(u)/outdeg(u)
  *
  * Each iteration is one join (edges ⋈ ranks on src) + one dst-keyed
  * aggregation — the canonical two-exchange graph step; k iterations
  * chain k of them, and nothing ever collects to the driver.
  *
  * Determinism (what makes an ITERATED float computation
  * oracle-able): per-edge contributions are rounded to 12 decimals
  * and summed as DECIMAL(28,12) — exact and order-independent under
  * any shuffle — and the damping update re-rounds to 12, so every
  * engine computing the same graph computes bit-identical ranks at
  * every iteration (the reported rank rounds one digit coarser, see
  * below). DuckDB replays all k steps through chained CTEs.
  *
  * Fixture graph: every document links to exactly `OutDeg` targets
  * derived from md5(doc_id) (5-nibble values mod N) — a deterministic
  * pseudo-random multigraph with no dangling nodes (every node emits
  * OutDeg edges), self-loops and duplicate edges allowed and handled
  * consistently by both engines.
  */
object LinkGraph {

  val OutDeg = 3

  /** (src, dst) edge list: target j uses md5 nibbles 5j+1..5j+5 —
    * 20 bits per target, so the `% n` stays genuinely uniform far
    * beyond any fixture or scale corpus (a narrower hash silently
    * freezes dst cardinality at its own range once n exceeds it).
    */
  private def edges(s: SparkSession, dir: String, n: Long): DataFrame = {
    require(n <= (1L << 20),
      s"target space (20 bits) too narrow for $n docs — widen the hash")
    val h = md5(concat(col("doc_id").cast("string"), lit("#links")))
    def nib(i: Int) = conv(substring(h, i, 1), 16, 10).cast("long")
    val targets = array((0 until OutDeg).map { j =>
      val v = (0 until 5).map(k => nib(5 * j + k + 1) *
        (1L << (4 * (4 - k)))).reduce(_ + _)
      (v % n).as(s"t$j")
    }: _*)
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("src"), explode(targets).as("dst"))
  }

  /** Ranks after `iters` damped power iterations, plus degree
    * columns. Rank column is the 12-decimal value both engines agree
    * on bit-for-bit.
    */
  def pageRank(
      s: SparkSession, dir: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val n = docs.count()
    // four consumers (three iteration joins + the in-degree agg):
    // cached so the scan + md5 derivation runs once, same lifecycle
    // as the other operator caches (released between bench queries)
    val e = edges(s, dir, n).cache()
    val base = lit((1.0 - damping) / n)
    var ranks = docs.select(col("doc_id"),
      round(lit(1.0 / n), 12).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("doc_id"))
        .select(col("dst"),
          round(col("rank") / OutDeg, 12)
            .cast("decimal(28,12)").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("mass"))
      ranks = docs.join(contribs, docs("doc_id") === contribs("dst"),
          "left")
        .select(col("doc_id"),
          round(base + lit(damping) *
            coalesce(col("mass").cast("double"), lit(0.0)), 12)
            .as("rank"))
    }
    val inDeg = e.groupBy("dst").agg(count(lit(1)).as("in_degree"))
    // ranks already carries exactly one row per doc — no docs re-join.
    // The REPORTED rank rounds one notch below the 12-decimal
    // mediation (the repo-wide convention): the two engines' rounding
    // of a double can tie-break differently in the mediation's last
    // digit, and the damping contraction keeps any such 1e-12 wobble
    // from ever reaching digit 10.
    ranks
      .join(inDeg, ranks("doc_id") === inDeg("dst"), "left")
      .select(col("doc_id"), round(col("rank"), 10).as("rank"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        lit(OutDeg).as("out_degree"))
  }
}
