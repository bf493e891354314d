package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.ops.{Dedup, IndexCommit, SubstrIndex}

/** Pins for the persisted ExactSubstr window index: append over a
  * carve equals a from-scratch build over the union (and both equal
  * the one-job [[Dedup.substringDupStats]]), stats never re-tokenize
  * (plan pin), short documents survive the docs-relation padding, and
  * an uncommitted segment is invisible (marker protocol).
  */
class SubstrIndexSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-ssx-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"),
        r.getAs[Long]("max_span_tokens"), r.getAs[Boolean]("keep"))).toMap

  test("append ≡ build(A∪B) ≡ the one-job operator; stats derive from " +
    "persisted hashes only (no re-tokenize, plan pin)") {
    val isBatch = col("doc_id") % 10 === 0
    val idx = tmp("append")
    SubstrIndex.build(spark, sf(), idx, docFilter = Some(!isBatch))
    SubstrIndex.append(spark, idx,
      spark.read.parquet(s"${sf()}/documents.parquet").filter(isBatch))
    val appended = SubstrIndex.stats(spark, idx)
    val idx2 = tmp("union")
    SubstrIndex.build(spark, sf(), idx2)
    val built = SubstrIndex.stats(spark, idx2)
    val oneJob = Dedup.substringDupStats(spark, sf())
    val want = rows(oneJob)
    assert(want.nonEmpty)
    assert(rows(appended) == want, "append ≡ one-job stats")
    assert(rows(built) == want, "build(A∪B) ≡ one-job stats")
    // the indexed read never touches text: no tokenize split, no
    // window transform anywhere in its plan — only the persisted
    // hash relation
    val plan = appended.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (marker <- Seq("split(", "posexplode", "transform("))
      assert(!plan.toLowerCase.contains(marker),
        s"indexed stats plan re-tokenizes text ($marker found)")
    assert(!plan.contains("text"),
      "indexed stats plan must not read the text column")
  }

  test("short documents (< w tokens) pad through the docs relation " +
    "even when their segment contributed zero windows") {
    val dir = tmp("short-docs")
    import spark.implicits._
    Seq(
      (1L, ("tok " * 20).trim, "en", "spec", 80L),
      (2L, ("tok " * 20).trim, "en", "spec", 80L),
      (3L, "too short", "en", "spec", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx = tmp("short")
    SubstrIndex.build(spark, dir, idx,
      docFilter = Some(col("doc_id") =!= 3L))
    SubstrIndex.append(spark, idx,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") === 3L))
    val got = rows(SubstrIndex.stats(spark, idx))
    assert(got.keySet == Set(1L, 2L, 3L),
      s"a windowless short doc must still be reported: $got")
    assert(got(3L) == ((0L, 0L, 0L, true)))
    // docs 1 and 2 are verbatim twins: all 5 windows duplicated
    assert(got(1L) == ((5L, 5L, 20L, true)) && got(1L) == got(2L))
  }

  test("appends honor the frozen width; an uncommitted segment is " +
    "invisible (marker protocol)") {
    val idx = tmp("torn")
    SubstrIndex.build(spark, sf("sf0.001"), idx, w = 8)
    assert(SubstrIndex.width(spark, idx) == 8)
    val before = rows(SubstrIndex.stats(spark, idx))
    // a writer that reserved + staged but died before the marker
    val stale = IndexCommit.reserve(spark, idx)
    import spark.implicits._
    Seq((999999L, 0, "00")).toDF("doc_id", "pos", "wh")
      .write.parquet(s"${IndexCommit.versionDir(idx, stale)}/wins")
    Seq(999999L).toDF("doc_id")
      .write.parquet(s"${IndexCommit.versionDir(idx, stale)}/docs")
    assert(rows(SubstrIndex.stats(spark, idx)) == before,
      "a staged-but-uncommitted segment must be invisible")
  }

  test("probe ≡ stats(build(A∪B)) restricted to the batch, computed " +
    "batch-proportionally (no corpus text in the plan)") {
    val isBatch = col("doc_id") % 10 === 0
    val idx = tmp("probe")
    SubstrIndex.build(spark, sf(), idx, docFilter = Some(!isBatch))
    val batch =
      spark.read.parquet(s"${sf()}/documents.parquet").filter(isBatch)
    val probed = SubstrIndex.probe(spark, idx, batch)
    val idx2 = tmp("probe-union")
    SubstrIndex.build(spark, sf(), idx2)
    val want = rows(SubstrIndex.stats(spark, idx2))
      .filter { case (id, _) => id % 10 == 0 }
    assert(want.nonEmpty)
    assert(want.exists(_._2._2 > 0),
      "fixture must give some batch doc cross-corpus dup windows " +
        "(else the committed-df leg is vacuous)")
    assert(rows(probed) == want,
      "probe must equal union-build stats on the batch docs")
    // probe leaves the index untouched (decontamination-style read)
    assert(IndexCommit.committedIds(spark, idx) == Seq(0L),
      "probe must not publish a segment")
    // the committed side of the probe is the per-segment df sidecars
    // ONLY: every file scan in the plan is either the batch source
    // (documents.parquet — the one tokenize) or an index dfs relation.
    // In particular the index's full WINDOW relation (wins) is never
    // read — the probe's corpus-side input is the pruned fixed-width
    // df join, not a window rescan
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val locations = plan.linesIterator
      .filter(_.trim.startsWith("Location:")).toSeq
    assert(locations.nonEmpty, "expected file scans in the probe plan")
    locations.foreach { loc =>
      assert(loc.contains("documents.parquet") || loc.contains("/dfs"),
        s"probe plan scans something besides the batch and the df " +
          s"sidecars: $loc")
    }
    assert(!plan.contains("/wins"),
      "probe plan must not rescan the index's window relation")
  }
}
