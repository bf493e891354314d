package graft

import graft.ops.LinkGraph

/** Structural pins for the PageRank power iteration (value-level
  * correctness of all three iterations is carried by the DuckDB
  * oracle's chained-CTE replay).
  */
class LinkGraphSpec extends SparkSpec {

  test("pagerank: mass conserved, floor respected, degrees consistent") {
    val rows = LinkGraph.pageRank(spark, sf()).collect()
    val n = rows.length
    assert(n == 500)
    val ranks = rows.map(_.getAs[Double]("rank"))
    // total mass stays ~1 (no dangling nodes; rounding drift only)
    assert(math.abs(ranks.sum - 1.0) < 1e-6, s"mass ${ranks.sum}")
    // every node keeps at least the teleport floor
    val floor = (1.0 - 0.85) / n
    assert(ranks.forall(_ >= floor - 1e-12))
    // edges: every node emits OutDeg, so in-degrees sum to OutDeg·N
    val inSum = rows.map(_.getAs[Long]("in_degree")).sum
    assert(inSum == LinkGraph.OutDeg.toLong * n)
    assert(rows.forall(_.getAs[Int]("out_degree") == LinkGraph.OutDeg))
    // the graph is non-degenerate: ranks genuinely differ
    assert(ranks.distinct.length > n / 10)
  }
}
