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

  // --- HLL -----------------------------------------------------------

  /** 60-bit md5 hash, the JVM twin of Sketches.h60 / the oracle's
    * CAST('0x'||substr(md5(x),1,15) AS BIGINT).
    */
  private def h60jvm(x: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
      .take(15), 16)
  }

  private def shinglesBySource(): Map[String, Set[String]] = {
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).map { case (src, docs) =>
        src -> docs.flatMap { case (_, text) =>
          val toks = text.trim.toLowerCase.split("\\s+")
          if (toks.length < 3) Seq.empty
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        }.toSet
      }
  }

  /** Independent JVM HLL: registers, exact 2^51-scaled Z, estimate. */
  private def hllJvm(hashes: Set[Long]): (Int, Int, Long, Double) = {
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    hashes.foreach { h =>
      val j = h & 1023L
      val rem = h >>> 10
      val rho =
        if (rem == 0) 51 else 51 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      regs(j) = math.max(regs.getOrElse(j, 0), rho)
    }
    val vZero = 1024 - regs.size
    val z = regs.values.map(mj => 1L << (51 - mj)).sum +
      vZero.toLong * 2251799813685248L
    val alphaNum =
      0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 2251799813685248.0
    val raw = alphaNum / z.toDouble
    val est =
      if (raw <= 2560.0 && vZero > 0) 1024.0 * math.log(1024.0 / vZero)
      else raw
    (regs.size, vZero, z,
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hll: bit-exact vs an independent JVM recompute, every scope") {
    val bySrc = shinglesBySource()
    val all = bySrc.values.flatten.toSet
    val expected = (bySrc + ("__all__" -> all)).map { case (src, sh) =>
      src -> hllJvm(sh.map(h60jvm))
    }
    val rows = Sketches.hllDistinctShingles(spark, sf()).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (regs, vz, z, est) = expected(r.getString(0))
      assert(r.getAs[Int]("regs_used") == regs, s"${r.getString(0)} regs")
      assert(r.getAs[Int]("v_zero") == vz)
      assert(r.getAs[Long]("z_scaled") == z,
        s"${r.getString(0)} exact scaled-Z must match the JVM recompute")
      assert(r.getAs[Double]("est_distinct") == est,
        s"${r.getString(0)} estimate must be bit-identical")
    }
  }

  test("hll: the __all__ row is a true register-max merge") {
    // the merged row must equal the sketch computed DIRECTLY over the
    // whole corpus (same relabel trick as the KMV merge pin)
    val all = Sketches.hllDistinctShingles(spark, sf())
      .filter(col("source") === "__all__").collect()
    assert(all.length == 1)
    val tmp = java.nio.file.Files.createTempDirectory("hll_direct")
    try {
      spark.read.parquet(s"${sf()}/documents.parquet")
        .withColumn("source", lit("__all__"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val direct = Sketches.hllDistinctShingles(spark, tmp.toString)
        .filter(col("source") === "__all__").limit(1).collect()
      assert(direct.length == 1)
      Seq("regs_used", "v_zero").foreach(c =>
        assert(all.head.getAs[Int](c) == direct.head.getAs[Int](c), c))
      assert(all.head.getAs[Long]("z_scaled")
        == direct.head.getAs[Long]("z_scaled"))
      assert(all.head.getAs[Double]("est_distinct")
        == direct.head.getAs[Double]("est_distinct"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("hll: estimate tracks the exact cardinality") {
    val bySrc = shinglesBySource()
    val exact = bySrc.map { case (s, v) => s -> v.size } +
      ("__all__" -> bySrc.values.flatten.toSet.size)
    Sketches.hllDistinctShingles(spark, sf()).collect().foreach { r =>
      val x = exact(r.getString(0)).toDouble
      val e = r.getAs[Double]("est_distinct")
      // linear-counting regime at this SF: well under the 3.25%
      // standard error of the raw m=1024 estimator
      assert(math.abs(e - x) / x < 0.15,
        s"${r.getString(0)}: est $e vs exact $x")
    }
  }

  test("hll native aggregate: identical to the declarative registers") {
    val decl = Sketches.hllDistinctShingles(spark, sf()).collect()
      .map(_.toString).toSet
    val native = Sketches.hllDistinctShinglesNative(spark, sf())
    assert(native.collect().map(_.toString).toSet == decl,
      "hll_regs must reproduce the declarative register pipeline")
    // the TypedImperativeAggregate plans as ObjectHashAggregate with a
    // real partial/final split — the 1-KB buffers are what shuffles
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    // partial-merge robustness: many input partitions, same registers
    val d = spark.read.parquet(s"${sf()}/documents.parquet").repartition(7)
    assert(Sketches.hllFinalize(Sketches.hllRegistersNativeOf(d))
      .collect().map(_.toString).toSet == decl,
      "pointwise-max buffer merge must be partition-layout-independent")
    // and the SQL registration works (GraftExtensions); abs keeps the
    // input inside the contract's non-negative hash domain
    d.select(expr("hll_regs(abs(xxhash64(doc_id))) is not null").as("ok"))
      .collect().foreach(r => assert(r.getBoolean(0)))
    // a negative input breaches the h60 contract — update() makes it
    // LOUD (a masked index with sign-bit rho would be silently wrong)
    val neg = intercept[Exception] {
      d.select(expr("hll_regs(xxhash64(doc_id))")).collect()
    }
    assert(neg.getMessage != null &&
      (neg.getMessage.contains("non-negative") ||
        neg.getCause != null &&
          neg.getCause.getMessage.contains("non-negative")),
      s"want the h60 require, got: ${neg.getMessage}")
  }

  test("hll growth: both legs equal their directly-computed sketches") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val v1 = Sketches.hllFinalize(
      Sketches.hllRegistersOf(d.filter(col("doc_id") % 10 < 8)))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct"))
      .toMap
    val v2 = Sketches.hllDistinctShingles(spark, sf())
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct"))
      .toMap
    val rows = Sketches.hllGrowth(spark, sf()).collect()
    assert(rows.length == v2.size)
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Double]("est_v1") == v1.getOrElse(src, 0.0),
        s"$src v1 leg must equal the carve's own sketch")
      assert(r.getAs[Double]("est_v2") == v2(src),
        s"$src merged registers must equal the full-corpus sketch")
      // register max-merge only raises registers, so (on this fixture,
      // both scopes inside one estimator branch) growth is one-sided
      assert(r.getAs[Double]("est_new") >= 0.0)
    }
  }

  // --- CMS -------------------------------------------------------------

  test("cms: bit-exact vs JVM recompute; overcount is one-sided") {
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
    val exact = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    // JVM grid: depth 4, width 64, salted md5 buckets — counts add, so
    // this single-pass build IS the merge of any sharding
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- toks; i <- 0 until 4) {
      val b = h60jvm(s"$i#$t") % 64
      grid((i, b)) = grid.getOrElse((i, b), 0L) + 1
    }
    def est(t: String): Long =
      (0 until 4).map(i => grid((i, h60jvm(s"$i#$t") % 64))).min
    val top = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val rows = Sketches.cmsHeavyHitters(spark, sf()).collect()
    assert(rows.length == math.min(20, exact.size))
    rows.foreach { r =>
      val t = r.getAs[String]("tok")
      assert(r.getAs[Long]("exact_cnt") == exact(t))
      assert(r.getAs[Long]("cms_est") == est(t),
        s"$t: CMS estimate must match the JVM grid")
      assert(r.getAs[Long]("overcount") >= 0,
        "CMS never undercounts — min over d counters >= true count")
      assert(r.getAs[Long]("overcount")
        == r.getAs[Long]("cms_est") - r.getAs[Long]("exact_cnt"))
    }
    // rank order pins the deterministic (count desc, token asc) top-k
    val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("tok"))
    assert(byRank.toSeq == top.map(_._1))
  }

  test("cms: a wide grid leaves the heavy hitters collision-free") {
    // width >> distinct tokens at this SF: every bucket is singly
    // occupied with overwhelming probability, so est == exact — the
    // knob a 100-TB run turns (w scales with the vocabulary, d stays 4)
    val rows = Sketches.cmsHeavyHitters(spark, sf(), width = 65536).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("overcount") == 0L,
      s"${r.getAs[String]("tok")} collided in a 4x65536 grid"))
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
