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
    *
    * `checkpointDir`: when set, every iteration's rank relation is
    * RELIABLY checkpointed into that directory, truncating lineage
    * against executor loss (see
    * [[graft.ops.Dedup.connectedComponents]] for the tradeoff — the
    * default unrolled form is fastest but replays the whole chain if
    * blocks vanish mid-job). The checkpoint adds one distributed
    * write per iteration and changes no value: ranks are 12-decimal
    * mediated, so the checkpointed and unrolled runs are
    * bit-identical. Same caveats as `connectedComponents`:
    * `setCheckpointDir` is session-global (concurrent different-dir
    * callers race), and the checkpoint files outlive the call — use
    * a platform-collected scratch prefix or delete after the action.
    */
  def pageRank(
      s: SparkSession, dir: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
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
      if (checkpointDir.isDefined) ranks = ranks.checkpoint(true)
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

  /** Per-node TRIANGLE counts over the undirected link graph —
    * the clustering/community signal next to PageRank's centrality.
    * Uses the DEGREE-ORIENTED algorithm, not naive id-ordering:
    * every undirected edge points from its (degree, id)-smaller
    * endpoint to the larger, wedges fan out only from each node's
    * higher-ordered neighbors, and each triangle is found exactly
    * once at its lowest-ordered vertex. That orientation is the
    * 100 TB claim: out-degree under it is O(√m) on any graph
    * (arboricity bound), so the wedge join's output — the only
    * super-linear intermediate — is Σ outdeg² ≤ O(m·√m) worst case
    * and near-linear on real skewed graphs, where id-ordering would
    * let one celebrity node emit deg² wedges. All joins are
    * node-keyed shuffles; nothing collects.
    */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val n = s.read.parquet(s"$dir/documents.parquet").count()
    val u = edges(s, dir, n)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = u.select(col("a").as("node"))
      .unionAll(u.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val withDeg = u
      .join(deg.select(col("node").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("dg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"))
    val o1 = o.as("o1"); val o2 = o.as("o2"); val o3 = o.as("o3")
    // wedge (v, w) from apex u, v strictly before w in orientation
    // order — so the closing edge {v, w}, if present, is oriented
    // exactly v→w and one equi-join finds it
    val tri = o1.join(o2,
        col("o1.src") === col("o2.src") &&
          (col("o1.dd") < col("o2.dd") ||
            (col("o1.dd") === col("o2.dd") &&
              col("o1.dst") < col("o2.dst"))))
      .select(col("o1.src").as("u"), col("o1.dst").as("v"),
        col("o2.dst").as("w"))
      .join(o3, col("o3.src") === col("v") && col("o3.dst") === col("w"))
      .select("u", "v", "w")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
