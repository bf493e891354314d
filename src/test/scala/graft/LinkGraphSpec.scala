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

  test("triangles match a brute-force all-triples recompute") {
    val got = LinkGraph.triangles(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the undirected simple graph the same way: md5 targets
    val n = spark.read.parquet(s"${sf()}/documents.parquet").count()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val edges = ids.flatMap { id =>
      val h = md5hex(s"$id#links")
      (0 until LinkGraph.OutDeg).map { j =>
        val v = (0 until 5).map(k =>
          Integer.parseInt(h.substring(5 * j + k, 5 * j + k + 1), 16)
            .toLong * (1L << (4 * (4 - k)))).sum
        (id, v % n)
      }
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var perNode = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a).intersect(adj(b)) if c > b // a < b < c, once each
    } {
      perNode += a -> (perNode(a) + 1)
      perNode += b -> (perNode(b) + 1)
      perNode += c -> (perNode(c) + 1)
    }
    assert(got == perNode.iterator.toMap, s"got ${got.size} nodes, " +
      s"want ${perNode.size}")
  }
}
