package graft

import graft.ops.Profiling

/** Pins for the entropy profile (the value-level gate is the
  * `profile_entropy` DuckDB oracle; these pin the information-theoretic
  * properties and an independent JVM recompute).
  */
class ProfilingSpec extends SparkSpec {

  test("entropy: JVM recompute, bounds, and the degenerate/uniform ends") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    val cols: Map[String, Seq[String]] = Map(
      "doc_id" -> docs.map(_.getLong(0).toString).toSeq,
      "text" -> docs.map(_.getString(1)).toSeq,
      "lang" -> docs.map(_.getString(2)).toSeq,
      "source" -> docs.map(_.getString(3)).toSeq,
      "n_chars" -> docs.map(_.getLong(4).toString).toSeq)
    def jvmEntropy(vs: Seq[String]): (Long, Long, Double) = {
      val n = vs.size.toDouble
      val counts = vs.groupBy(identity).map(_._2.size)
      val h = -counts.map { c => (c / n) * math.log(c / n) }.sum
      (vs.size.toLong, counts.size.toLong, h)
    }
    val rows = Profiling.columnEntropy(spark, sf()).collect()
    assert(rows.length == cols.size)
    rows.foreach { r =>
      val name = r.getAs[String]("col_name")
      val (n, k, h) = jvmEntropy(cols(name))
      assert(r.getAs[Long]("n_rows") == n, s"$name rows")
      assert(r.getAs[Long]("n_distinct") == k, s"$name distinct")
      val e = r.getAs[Double]("entropy")
      // the 12-decimal term mediation cannot move the value materially
      assert(math.abs(e - h) < 1e-6, s"$name: engine $e vs JVM $h")
      // 0 <= H <= ln k, and the normalized form sits in [0, 1]
      assert(e >= -1e-9 && e <= math.log(k.toDouble) + 1e-9, name)
      val ne = r.getAs[Double]("norm_entropy")
      assert(ne >= -1e-9 && ne <= 1.0 + 1e-9, name)
      if (k == n) {
        // all-distinct column: exactly uniform, normalized entropy 1
        assert(math.abs(ne - 1.0) < 1e-6, s"$name should be maximal")
      }
      if (k == 1) assert(e == 0.0 && ne == 0.0, s"$name degenerate")
    }
    // the fixture's source column is exactly uniform: maximal entropy
    val src = rows.find(_.getAs[String]("col_name") == "source").get
    assert(math.abs(src.getAs[Double]("norm_entropy") - 1.0) < 1e-6,
      "uniform source mix must read as maximal entropy")
  }
}
