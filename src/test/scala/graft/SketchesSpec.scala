package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Property pins for the KMV cardinality sketch (value-level
  * correctness rides the DuckDB oracle gate; these pin the merge
  * semantics and the estimator behavior an oracle diff wouldn't
  * localize).
  */
class SketchesSpec extends SparkSpec {

  private def exactDistinct(scopeAll: Boolean): Map[String, Long] = {
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val scoped =
      if (scopeAll) toks.select(lit("__all__").as("source"), col("tok"))
      else toks
    scoped.groupBy("source").agg(countDistinct("tok").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("kmv: merging per-source sketches reproduces the corpus sketch") {
    // the '__all__' row is computed by MERGE (re-ranking the union of
    // the per-source k-minima). A direct global sketch over the raw
    // hashes must agree exactly — the losslessness that lets executors
    // sketch shards independently. Token sets overlap heavily across
    // sources, so this also exercises the cross-source dedup.
    val df = Sketches.kmvDistinctTokens(spark, sf())
    val all = df.filter(col("source") === "__all__").collect()
    assert(all.length == 1)
    // direct global sketch: single-scope run via a 1-source relabel of
    // the raw token stream — no merge step involved
    val tmp = java.nio.file.Files.createTempDirectory("kmv_direct")
    try {
      spark.read.parquet(s"${sf()}/documents.parquet")
        .withColumn("source", lit("__all__"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val direct = Sketches.kmvDistinctTokens(spark, tmp.toString)
        .filter(col("source") === "__all__")
        // the relabeled corpus yields two identical rows (per-source
        // scope IS the corpus scope); either pins the direct sketch
        .limit(1).collect()
      assert(direct.length == 1)
      assert(all.head.getAs[Long]("kth_hash")
        == direct.head.getAs[Long]("kth_hash"),
        "merged corpus sketch must equal the directly-computed one")
      assert(all.head.getAs[Int]("k_used")
        == direct.head.getAs[Int]("k_used"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("kmv: estimate tracks the exact cardinality (k=64 ⇒ ~12.5% sd)") {
    val est = Sketches.kmvDistinctTokens(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    val exact = exactDistinct(scopeAll = false) ++ exactDistinct(scopeAll = true)
    est.foreach { case (src, e) =>
      val x = exact(src).toDouble
      if (x <= 64) assert(e == x, s"$src exhausted scope must be exact")
      else {
        val rel = math.abs(e - x) / x
        assert(rel < 0.5, s"$src: est $e vs exact $x (rel $rel)")
      }
    }
  }

  test("kmv: a scope below k is exhausted and exact") {
    // k far above any scope's distinct count → every row takes the
    // k_used < k branch: est_distinct IS the exact distinct count
    val df = Sketches.kmvDistinctTokens(spark, sf(), k = 1000000).collect()
    val exact = exactDistinct(scopeAll = false) ++ exactDistinct(scopeAll = true)
    assert(df.nonEmpty)
    df.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Int]("k_used").toLong == exact(src))
      assert(r.getAs[Double]("est_distinct") == exact(src).toDouble)
    }
  }

  test("histogram percentiles: JVM recompute, error bound, mergeability") {
    val width = 1000.0
    val vals = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // independent JVM recompute of bucket→count→rank-walk
    def sketch2(xs: Array[Double], q: Double): Double = {
      val counts = xs.groupBy(x => math.floor(x / width).toLong)
        .map { case (b, v) => b -> v.length.toLong }.toSeq.sortBy(_._1)
      val n = xs.length.toLong
      val r = math.ceil(q * n).toLong
      var cum = 0L
      for ((b, c) <- counts) {
        if (cum + c >= r) return b * width + width * (r - cum) / c
        cum += c
      }
      throw new AssertionError("rank walk fell off the histogram")
    }
    val rows = Sketches.histogramPercentiles(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = vals(r.getString(0))
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Double]("p50_est") == sketch2(xs, 0.5),
        s"${r.getString(0)} p50 bit-mismatch vs JVM recompute")
      assert(r.getAs[Double]("p90_est") == sketch2(xs, 0.9))
      // bounded error certificate: the true quantile shares the bucket
      val sorted = xs.sorted
      def exactQ(q: Double) =
        sorted(math.max(0, math.ceil(q * xs.length).toInt - 1))
      assert(math.abs(r.getAs[Double]("p50_est") - exactQ(0.5)) <= width)
      assert(math.abs(r.getAs[Double]("p90_est") - exactQ(0.9)) <= width)
      // state is bounded by range/width, not by n
      assert(r.getAs[Int]("n_buckets").toLong <=
        (sorted.last / width).toLong - (sorted.head / width).toLong + 1)
    }
    // mergeability: histogramming two disjoint carves and adding the
    // bucket counts finalizes to the same estimate as one pass
    vals.foreach { case (_, xs) =>
      val (a, b) = xs.zipWithIndex.partition(_._2 % 2 == 0)
      def counts(ys: Array[Double]) = ys
        .groupBy(x => math.floor(x / width).toLong)
        .map { case (k, v) => k -> v.length.toLong }
      val mergedCounts = (counts(a.map(_._1)).toSeq ++ counts(b.map(_._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      assert(mergedCounts == counts(xs),
        "bucket counts must add across carves")
    }
  }

  test("quantile labels that round to the same percent are rejected") {
    // 0.995 and 1.0 both label p100_est — a duplicate column name the
    // DataFrame would only surface on a later select-by-name
    intercept[IllegalArgumentException] {
      Sketches.histogramPercentiles(spark, sf(), qs = Seq(0.995, 1.0))
    }
    // distinct labels at the boundary stay legal
    val ok = Sketches.histogramPercentiles(spark, sf(), qs = Seq(0.99, 1.0))
    assert(ok.columns.count(_ == "p100_est") == 1 &&
      ok.columns.contains("p99_est"))
  }

  test("kmv: shuffle carries O(sources·k) — WindowGroupLimit in the plan") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Sketches.kmvDistinctTokens(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"),
      s"rank≤k must rewrite to WindowGroupLimit so map tasks forward at " +
        s"most k rows per source; got:\n$plan")
  }
}
