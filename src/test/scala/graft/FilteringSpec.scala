package graft

import graft.ops.{Filtering, TextOps}

/** Brute-force recompute pins for the corpus-filtering composites and
  * the BPE pair statistic. (Value-level correctness is also carried by
  * the DuckDB oracle gate; these localize failures and pin the
  * null/short-doc algebra the oracle diff wouldn't name.)
  */
class FilteringSpec extends SparkSpec {

  private def texts(): Array[(Long, String)] =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("quality_filter: keep and drop_reasons match a per-doc recompute") {
    val rows = Filtering.qualityFilter(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == texts().length)
    texts().foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+", -1)
      val n = toks.length
      val meanLen = (text.length - n + 1).toDouble / n
      val stopRatio =
        toks.count(Set("a", "the", "of", "and")).toDouble / n
      val grams2 = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts2 = grams2.groupBy(identity).map(_._2.length)
      val grams3 = toks.sliding(3).map(_.mkString(" ")).toSeq
      val counts3 = grams3.groupBy(identity).map(_._2.length)
      val rLen = n >= 20 && n <= 1000
      val rWordLen = meanLen >= 2.0 && meanLen <= 12.0
      val rStop = stopRatio >= 0.01
      val rRep =
        if (n < 2) true
        else {
          val top2 = counts2.max.toDouble / grams2.length
          val dup3 =
            if (grams3.isEmpty) true // n_grams3 null → frac null → coalesced
            else counts3.filter(_ > 1).sum.toDouble / grams3.length <= 0.18
          top2 <= 0.2 && dup3
        }
      val expectKeep = rLen && rWordLen && rStop && rRep
      val expectReasons = Seq(
        (!rLen, "len"), (!rWordLen, "word_len"),
        (!rStop, "stop_ratio"), (!rRep, "repetition")
      ).collect { case (true, s) => s }.mkString(",")
      val row = rows(id)
      assert(row.getAs[Boolean]("keep") == expectKeep, s"doc $id keep")
      assert(row.getAs[String]("drop_reasons") == expectReasons,
        s"doc $id reasons: got ${row.getAs[String]("drop_reasons")}")
      assert(row.getAs[Boolean]("keep") ==
        row.getAs[String]("drop_reasons").isEmpty)
    }
  }

  test("quality_filter_lm = heuristic verdict ∧ perplexity bucket gate") {
    val base = Filtering.qualityFilter(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reasons"))).toMap
    val lm = graft.ops.LanguageModel.knPerplexity(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("nll"), r.getAs[String]("bucket"))).toMap
    val got = Filtering.qualityFilterLm(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reasons"),
          r.getAs[Double]("nll"), r.getAs[String]("bucket"),
          r.getAs[Boolean]("r_lm"))).toMap
    assert(got.keySet == base.keySet)
    got.foreach { case (id, (keep, reasons, nll, bucket, rLm)) =>
      val (hKeep, hReasons) = base(id)
      val (eNll, eBucket) = lm(id)
      assert((nll, bucket) == ((eNll, eBucket)), s"doc $id lm cols")
      assert(rLm == (bucket != "tail"), s"doc $id r_lm")
      assert(keep == (hKeep && rLm), s"doc $id keep")
      val want = Seq(hReasons, if (rLm) "" else "lm_tail")
        .filter(_.nonEmpty).mkString(",")
      assert(reasons == want, s"doc $id reasons: got $reasons want $want")
    }
    // liveness: at least one doc survives the heuristics but falls to
    // the LM tail — the gate must actually change a verdict
    assert(got.exists { case (_, (k, r, _, _, _)) => !k && r == "lm_tail" },
      "no lm_tail-only drop at this SF — the composition is vacuous")
  }

  test("quality_filter_lm_indexed: bit-identical to the inline form; " +
    "a delta batch scores with NO reference-corpus scan") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-qflm-idx").toString
    graft.ops.KnIndex.build(spark, sf(), idx)
    // (1) full-corpus indexed form == inline retrain form, exactly:
    // scoreWith is shared verbatim, so every bit must agree
    val inline = Filtering.qualityFilterLm(spark, sf()).collect()
      .map(_.toString).toSet
    val indexed = Filtering.qualityFilterLmIndexed(spark, sf(), idx)
    assert(indexed.collect().map(_.toString).toSet == inline,
      "persisted-model scoring must be bit-identical to inline retrain")
    // (2) delta economics: a batch materialized OFF the corpus (local
    // rows) must score against the frozen model without the plan ever
    // touching documents.parquet — the dedup_incremental
    // candidate-volume discipline applied to the LM gate
    val batchRows = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect().toIndexedSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val batch = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(batchRows).asJava),
      schema)
    val delta = Filtering.qualityFilterLmBatch(spark, idx, batch)
    val plan = delta.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("documents.parquet"),
      "delta scoring must not scan the reference corpus:\n" +
        plan.linesIterator.filter(_.contains("parquet")).mkString("\n"))
    // and the verdicts equal the full indexed run restricted to the
    // batch (both signals are per-document under a frozen model)
    val batchIds = batchRows.map(_.getLong(0)).toSet
    val wantRows = indexed.collect()
      .filter(r => batchIds(r.getAs[Long]("doc_id")))
      .map(_.toString).toSet
    assert(delta.collect().map(_.toString).toSet == wantRows,
      "delta batch verdicts must equal the full run's rows for those docs")
  }

  test("split leakage matches a brute-force 8-gram overlap over the split") {
    def nib(id: Long): Int =
      Integer.parseInt(md5Hex(s"$id#split").substring(0, 1), 16)
    def grams(text: String): Set[String] = {
      val toks = text.toLowerCase.split("\\s+", -1)
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val all = texts()
    val testGrams =
      all.filter(t => nib(t._1) == 15).flatMap(t => grams(t._2)).toSet
    val expected = all.filter(t => nib(t._1) <= 13).map { case (id, text) =>
      id -> grams(text).count(testGrams)
    }.toMap
    val rows = Filtering.splitLeakage(spark, sf()).collect()
    assert(rows.length == expected.size, "one row per train doc")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_leaked_grams") == expected(id).toLong,
        s"doc $id")
      assert(r.getAs[Boolean]("leaked") == (expected(id) > 0))
    }
    // the synthetic corpus plants near-dups, so the audit must FIND
    // leakage — an all-zero column would mean a broken probe
    assert(rows.exists(_.getAs[Boolean]("leaked")),
      "planted near-dups must leak across the split at fixture scale")
  }

  test("split leakage: salting changes the shuffle key, never the result") {
    val salted = Filtering.splitLeakage(spark, sf(), salt = 8)
    val plain = Filtering.splitLeakage(spark, sf(), salt = 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_leaked_grams")).toMap
    val rows = salted.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_leaked_grams")).toMap
    assert(rows == plain, "salt must be invisible in the result")
    // the gram exchange hashes the composite (shingle, __salt) key, so
    // a df~1.0 boilerplate gram scatters across salt partitions
    // instead of landing in one (AQE skew stats can't catch this case:
    // they read compressed bytes, and one repeated string compresses
    // its row skew away)
    val plan = salted.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("__salt"), s"salted key missing:\n$plan")
  }

  test("bpe pair stats match a brute-force count; ranks deterministic") {
    val occ = scala.collection.mutable.Map.empty[String, Long]
    texts().foreach { case (_, t) =>
      t.toLowerCase.trim.split("\\s+", -1).foreach { w =>
        occ(w) = occ.getOrElse(w, 0L) + 1L
      }
    }
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    occ.foreach { case (w, cnt) =>
      if (w.length >= 2)
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + cnt
        }
    }
    val expected = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    val rows = TextOps.bpePairs(spark, sf()).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length == expected.length)
    rows.zip(expected).zipWithIndex.foreach {
      case ((row, (pair, cnt)), i) =>
        assert(row.getAs[String]("pair") == pair, s"rank ${i + 1}")
        assert(row.getAs[Long]("pair_count") == cnt, s"rank ${i + 1}")
        assert(row.getAs[Int]("rank") == i + 1)
    }
  }
}
