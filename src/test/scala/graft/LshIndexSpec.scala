package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.ops.{Dedup, IndexCommit, LshIndex}
import graft.streaming.StreamingDedup

final case class Doc(doc_id: Long, text: String)
final case class QueryVec(query_id: Long, qv: Seq[Double])

class LshIndexSpec extends SparkSpec {

  private val isBatch = col("doc_id") % 10 === 0

  private def buildIndex(): String = {
    val path = Files.createTempDirectory("lshidx").toString
    LshIndex.build(spark, sf(), path, maxDocFreq = Some(0.1),
      docFilter = Some(!isBatch))
    path
  }

  private def batchDocs() =
    spark.read.parquet(s"${sf()}/documents.parquet").filter(isBatch)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))).toSet

  test("meta round-trips the hash configuration") {
    val path = buildIndex()
    assert(LshIndex.readMeta(spark, path) == LshIndex.Meta(3, 32, 2))
  }

  test("persisted-index probe equals the one-job incremental formulation") {
    val path = buildIndex()
    val viaIndex = pairSet(LshIndex.probe(spark, path, batchDocs()))
    val oneJob = pairSet(
      Dedup.incrementalDedupPairs(spark, sf(), maxDocFreq = Some(0.1)))
    assert(oneJob.nonEmpty, "fixture should contain cross-carve near-dups")
    assert(viaIndex == oneJob)
    // jaccard values agree too, not just membership
    val vj = LshIndex.probe(spark, path, batchDocs()).collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx")) ->
        r.getAs[Double]("jaccard")).toMap
    Dedup.incrementalDedupPairs(spark, sf(), maxDocFreq = Some(0.1))
      .collect().foreach { r =>
        val k = (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))
        assert(math.abs(vj(k) - r.getAs[Double]("jaccard")) < 1e-12)
      }
  }

  test("probe honors the index's persisted hot-shingle guard") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lshidx-hot").toString
    // corpus: every doc shares a hot boilerplate prefix; two docs are
    // near-dups only once the boilerplate is discounted
    val boiler = "terms of service apply to all"
    val corpus = (1L to 20L).map(i =>
      Doc(i, s"$boiler unique$i payload$i tokens$i here$i now$i")) ++
      Seq(Doc(100L, s"$boiler common body shared across the pair x y"),
        Doc(101L, s"$boiler common body shared across the pair x z"))
    corpus.toDF().write.mode("overwrite")
      .parquet(dir + "/documents.parquet")
    val path = Files.createTempDirectory("lshidx-hot-idx").toString
    LshIndex.build(spark, dir, path, maxDocFreq = Some(0.5),
      docFilter = Some(col("doc_id") =!= 101L))
    val hot = spark.read.parquet(path + "/hot")
    assert(hot.count() > 0, "boilerplate shingles should be hot")
    val probed = LshIndex.probe(spark, path,
      Seq(Doc(101L, s"$boiler common body shared across the pair x z"))
        .toDF(), threshold = 0.5)
    val rows = probed.collect()
    val got = rows.map(r =>
      (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx"))).toSet
    // the boilerplate alone must NOT qualify unrelated docs
    assert(got == Set((101L, 100L)))
    // the jaccard VALUE pins guard consistency: both sides guarded
    // gives 7 shared of 9 distinct non-hot shingles; a batch side that
    // kept the hot boilerplate would read 7/13 instead
    assert(math.abs(rows.head.getAs[Double]("jaccard") - 7.0 / 9.0) < 1e-12)
  }

  test("append folds new docs in; probe equals a from-scratch full build") {
    val grown = Files.createTempDirectory("lshidx-grow").toString
    LshIndex.build(spark, sf(), grown,
      docFilter = Some(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 4))
    LshIndex.append(spark, grown,
      spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") % 10 >= 5))
    val full = buildIndexNoGuard()
    val viaGrown = pairSet(LshIndex.probe(spark, grown, batchDocs()))
    val viaFull = pairSet(LshIndex.probe(spark, full, batchDocs()))
    assert(viaFull.nonEmpty)
    assert(viaGrown == viaFull)
  }

  test("guardDrift: empty right after build; grows as batch " +
    "vocabulary diverges; exact df and pair arithmetic") {
    import spark.implicits._
    def driftRows(banner: String): Seq[(Long, Long, Long)] = {
      val path = Files.createTempDirectory("lshdrift").toString
      LshIndex.build(spark, sf(), path, maxDocFreq = Some(0.1))
      assert(LshIndex.guardDrift(spark, path, 0.1).isEmpty,
        "a fresh build has zero drift by definition")
      val batch = spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") % 5 === 3)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit(banner),
            col("text")).as("text"))
      LshIndex.append(spark, path, batch)
      LshIndex.guardDrift(spark, path, 0.1).collect()
        .map(r => (r.getAs[Long]("df"), r.getAs[Long]("n_shingles"),
          r.getAs[Long]("worst_case_pairs"))).toSeq
    }
    // a 4-token banner shares 2 full-banner 3-shingles across the
    // batch; an 8-token banner shares 6 — drift mass grows with
    // vocabulary divergence
    val small = driftRows("zx0 zx1 zx2 zx3 ")
    val big = driftRows("zx0 zx1 zx2 zx3 zx4 zx5 zx6 zx7 ")
    val batchN = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") % 5 === 3).count()
    def mass(rows: Seq[(Long, Long, Long)]) = rows.map(_._2).sum
    assert(mass(small) == 2L && mass(big) == 6L,
      s"full-banner shingle counts: $small vs $big")
    assert(mass(big) > mass(small),
      "drift must grow as the batch vocabulary diverges")
    // every full-banner shingle rides every batch doc: df = |batch|,
    // worst-case pairs = n·df·(df−1)/2 exactly
    for (rows <- Seq(small, big); (df, n, pairs) <- rows) {
      assert(df == batchN, s"banner shingles must ride every batch doc")
      assert(pairs == n * df * (df - 1) / 2)
    }
  }

  test("refreshGuard folds measured drift into a committed guard " +
    "version: drift zeroes, banner candidates shed, true pairs survive") {
    import org.apache.spark.sql.functions.{concat, lit}
    val path = Files.createTempDirectory("lshrefresh").toString
    // rowsPerBand=1 so the post-refresh twin match is probability-free
    // (any of 32 single-hash bands colliding suffices)
    LshIndex.build(spark, sf(), path, rowsPerBand = 1,
      maxDocFreq = Some(0.1))
    val banner = "zr0 zr1 zr2 zr3 zr4 zr5 "
    def bannered(offset: Long) =
      spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") % 5 === 3)
        .select((col("doc_id") + offset).as("doc_id"),
          concat(lit(banner), col("text")).as("text"))
    LshIndex.append(spark, path, bannered(30000000L))
    assert(!LshIndex.guardDrift(spark, path, 0.1).isEmpty,
      "the appended banner must register as drift")
    // batch2 = the SAME bannered texts under new ids: every doc is a
    // true near-dup twin of an indexed doc, and the banner also
    // bridges UNRELATED docs at low thresholds (candidate inflation)
    def scored(threshold: Double): Map[(Long, Long), Double] =
      LshIndex.probe(spark, path, bannered(40000000L), threshold)
        .collect()
        .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_idx")) ->
          r.getAs[Double]("jaccard")).toMap
    def pairs(threshold: Double) = scored(threshold).keySet
    val beforeLow = scored(0.01)
    val beforeTwins = pairs(0.5)
    val twinWant = bannered(40000000L).select("doc_id").collect()
      .map(_.getLong(0)).filter { id =>
        // only docs long enough to have shingles can pair
        beforeTwins.contains((id, id - 10000000L))
      }.toSet
    assert(twinWant.nonEmpty, "fixture must produce true twins")
    // refresh: the drifted banner shingles join the committed guard
    LshIndex.refreshGuard(spark, path, 0.1)
    assert(LshIndex.guardDrift(spark, path, 0.1).isEmpty,
      "refresh must zero the measured drift")
    val afterLow = scored(0.01)
    // one-sided against BANNER-CARRYING indexed docs (ids ≥ 3·10⁷ —
    // their persisted sets keep the shingles): the intersection loses
    // the boilerplate, the union keeps it, so Jaccard only decreases.
    // Against banner-free base docs the score may legitimately RISE
    // toward content-only similarity — the guard's purpose.
    for ((p @ (_, idx), jAfter) <- afterLow if idx >= 30000000L;
         jBefore <- beforeLow.get(p))
      assert(jAfter <= jBefore + 1e-12,
        s"pair $p scored HIGHER after the refresh: $jBefore -> $jAfter")
    assert(afterLow.size < beforeLow.size,
      "banner-driven cross-pairs must be shed after the refresh")
    val afterTwins = pairs(0.5)
    assert(twinWant.forall(id => afterTwins.contains((id, id - 10000000L))),
      "true near-dup twins must survive the refresh")
  }

  private def buildIndexNoGuard(): String = {
    val path = Files.createTempDirectory("lshidx-f").toString
    LshIndex.build(spark, sf(), path, docFilter = Some(!isBatch))
    path
  }

  test("vector index: persisted probe equals the same computation in memory") {
    import graft.ops.{Similarity, VectorIndex}
    val isQuery = col("vec_id") % 10 === 0
    val path = Files.createTempDirectory("vecidx").toString
    VectorIndex.build(spark, sf(), path, vecFilter = Some(!isQuery))
    val queries = Similarity.load(spark, sf()).filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val got = VectorIndex.probe(spark, path, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toMap
    assert(got.nonEmpty)
    // centroids round-trip the build arithmetic bit-exactly
    val cents = VectorIndex.readCentroids(spark, path)
    assert(cents.size == 16)
    // every result lies in the query's probed cells and scores are the
    // true cosines (recomputed independently per pair)
    val vecs = Similarity.load(spark, sf()).select("vec_id", "v").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case ((q, _), (m, score)) =>
      assert(m % 10 != 0, "results come from the index carve only")
      assert(math.abs(cos(vecs(q), vecs(m)) - score) < 1e-9)
    }
    // ranks are dense per query starting at 1
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.map(_._2).toSeq.sorted == (1 to ks.size).toSeq)
    }
  }

  test("ADC probe reads ONLY the SQ8 codes file — float vectors never enter the plan") {
    import graft.ops.{Similarity, VectorIndex}
    val isQuery = col("vec_id") % 10 === 0
    val path = Files.createTempDirectory("vecidx-adc").toString
    VectorIndex.build(spark, sf(), path, vecFilter = Some(!isQuery))
    val queries = Similarity.load(spark, sf()).filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val adc = VectorIndex.probeAdc(spark, path, queries)
    // the serving footprint claim, verified on the physical plan: the
    // corpus-side scan reads the codes parquet (int codes in its
    // schema), and the float `vectors` file is absent entirely
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("/codes"), plan.take(2000))
    assert(!plan.contains("/vectors"), plan.take(2000))
    val rows = adc.collect()
    assert(rows.nonEmpty)
    // ADC scores are the cosine against the integer code vector —
    // recomputed independently from the persisted codes
    val codes = spark.read.parquet(
      s"${IndexCommit.currentDir(spark, path).get}/codes")
      .select("vec_id", "q").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Int](1).map(_.toDouble)).toMap
    val vecs = Similarity.load(spark, sf()).select("vec_id", "v").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val m = r.getAs[Long]("vec_id")
      assert(m % 10 != 0, "candidates come from the index carve only")
      assert(math.abs(cos(vecs(q), codes(m)) - r.getAs[Double]("score")) < 1e-9)
    }
    // quantization keeps rankings close to the full-precision probe:
    // top-1 per query should usually agree; require > half
    val full = VectorIndex.probe(spark, path, queries).collect()
      .filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    val adcTop = rows.filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    val agree = adcTop.count { case (q, m) => full.get(q).contains(m) }
    assert(agree * 2 > full.size, s"top-1 agreement $agree/${full.size}")
  }

  test("vector index append: new vectors join existing cells and become findable") {
    import graft.ops.{Similarity, VectorIndex}
    val isQuery = col("vec_id") % 10 === 0
    val path = Files.createTempDirectory("vecidx-app").toString
    VectorIndex.build(spark, sf(), path, vecFilter = Some(!isQuery))
    val queries = Similarity.load(spark, sf()).filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // append the query carve itself, then probe with it: every query
    // must now find its own vector at rank 1, cosine 1
    VectorIndex.append(spark, path,
      Similarity.load(spark, sf()).filter(isQuery).select("vec_id", "v"))
    val got = VectorIndex.probe(spark, path, queries).collect()
    val top = got.filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toMap
    val nQueries = queries.count()
    assert(top.size == nQueries)
    top.foreach { case (q, (m, score)) =>
      assert(m == q, s"query $q should find itself first, got $m")
      assert(math.abs(score - 1.0) < 1e-12)
    }
    // centroids untouched by the append
    assert(VectorIndex.readCentroids(spark, path).size == 16)
  }

  test("streaming ANN probe accumulates per-batch results and replays idempotently") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Similarity, VectorIndex}
    import graft.streaming.StreamingAnn
    val isQuery = col("vec_id") % 10 === 0
    val path = Files.createTempDirectory("vecidx-s").toString
    VectorIndex.build(spark, sf(), path, vecFilter = Some(!isQuery))
    val out = Files.createTempDirectory("vecidx-s-out").toString
    val ckpt = Files.createTempDirectory("vecidx-s-ckpt").toString

    val qRows = Similarity.load(spark, sf()).filter(isQuery)
      .select(col("vec_id"), col("v")).collect()
      .map(r => QueryVec(r.getAs[Long]("vec_id"), r.getSeq[Double](1)))
      .sortBy(_.query_id)
    val (first, second) = qRows.splitAt(qRows.length / 2)

    val input = MemoryStream[QueryVec]
    input.addData(first.toIndexedSeq)
    StreamingAnn.probeStream(input.toDF(), path, out, ckpt)
      .awaitTermination()
    input.addData(second.toIndexedSeq)
    StreamingAnn.probeStream(input.toDF(), path, out, ckpt)
      .awaitTermination()

    val streamed = StreamingAnn.results(spark, out)
    val direct = VectorIndex.probe(spark, path,
      Similarity.load(spark, sf()).filter(isQuery)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(streamed) == key(direct))

    val before = streamed.count()
    StreamingAnn.applyBatch(first.toSeq.toDF("query_id", "qv"), path, out,
      nprobe = 4, k = 10, batchId = 0L)
    assert(StreamingAnn.results(spark, out).count() == before)
  }

  test("streaming probe accumulates per-batch pairs and replays idempotently") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = buildIndex()
    val out = Files.createTempDirectory("lshidx-out").toString
    val ckpt = Files.createTempDirectory("lshidx-ckpt").toString

    val all = batchDocs().orderBy("doc_id")
      .collect().map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val (first, second) = all.splitAt(all.length / 2)

    val input = MemoryStream[Doc]
    input.addData(first.toIndexedSeq)
    StreamingDedup.probeStream(input.toDF(), path, out, ckpt)
      .awaitTermination()
    input.addData(second.toIndexedSeq)
    StreamingDedup.probeStream(input.toDF(), path, out, ckpt)
      .awaitTermination()

    val streamed = StreamingDedup.pairs(spark, out)
    val expected = pairSet(LshIndex.probe(spark, path, batchDocs()))
    assert(pairSet(streamed.drop("batch_id")) == expected)
    // batch ids partition the output: no pair is attributed twice
    assert(streamed.count() == streamed.drop("batch_id").distinct().count())

    // at-least-once replay: re-running a batch id overwrites its own
    // directory instead of duplicating pairs
    val before = streamed.count()
    StreamingDedup.applyBatch(first.toSeq.toDF(), path, out,
      threshold = 0.8, batchId = 0L)
    assert(StreamingDedup.pairs(spark, out).count() == before)
  }
}
