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

  test("kmv: shuffle carries O(sources·k) — WindowGroupLimit in the plan") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Sketches.kmvDistinctTokens(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"),
      s"rank≤k must rewrite to WindowGroupLimit so map tasks forward at " +
        s"most k rows per source; got:\n$plan")
  }
}
