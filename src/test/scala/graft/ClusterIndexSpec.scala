package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import graft.ops.{ClusterIndex, Dedup, IndexCommit}

/** Pins for the persisted duplicate-cluster index: append equals a
  * from-scratch build over the union (including the hard case — a
  * batch document BRIDGING two previously-separate components), the
  * probe-side consumers reproduce the one-job operators without
  * re-deriving the dedup subtree (plan-pinned), and an uncommitted
  * version is invisible (marker protocol).
  */
class ClusterIndexSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-clidx-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Write a documents.parquet fixture with the full engine schema. */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmp("docs")
    import spark.implicits._
    rows.map { case (id, t) =>
      (id, t, "en", "spec", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def clusterMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toMap

  // w10..w39 overlaps w1..w30 and w19..w48 at Jaccard ≈ 0.514 each
  // (19 shared 3-shingles of 28), while the two ends sit at ≈ 0.217 —
  // so at threshold 0.5 the bridge doc merges two separate clusters
  private def words(a: Int, b: Int): String =
    (a to b).map(i => s"w$i").mkString(" ")

  test("append bridges two existing components and equals a " +
    "from-scratch build over the union") {
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30), 2L -> words(19, 48),
      4L -> "completely unrelated text about something else entirely"))
    val batchDir = writeDocs(Seq(3L -> words(10, 39)))
    val unionDir = writeDocs(Seq(
      1L -> words(1, 30), 2L -> words(19, 48),
      4L -> "completely unrelated text about something else entirely",
      3L -> words(10, 39)))
    // rowsPerBand = 1: per-band catch probability equals the Jaccard
    // itself, so the 0.514 pairs are found with certainty 1-1e-10 —
    // the spec pins merge algebra, not LSH recall
    val idx = tmp("bridge")
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1)
    assert(clusterMap(ClusterIndex.clusters(spark, idx)) == Map(
      1L -> ((1L, true)), 2L -> ((2L, true)), 4L -> ((4L, true))),
      "ends at Jaccard 0.217 must NOT merge at build")
    ClusterIndex.append(spark, idx,
      spark.read.parquet(s"$batchDir/documents.parquet"),
      threshold = 0.5)
    val got = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)),
      3L -> ((1L, false)), 4L -> ((4L, true))),
      s"bridge doc must merge both components to min id 1: $got")
    // and the merged state equals a from-scratch build over A∪B
    val idx2 = tmp("union")
    ClusterIndex.build(spark, unionDir, idx2,
      threshold = 0.5, rowsPerBand = 1)
    assert(clusterMap(ClusterIndex.clusters(spark, idx2)) == got,
      "append ≡ build(A∪B)")
  }

  test("probe consumers equal the one-job operators and never " +
    "re-derive the dedup subtree (plan pin)") {
    val idx = tmp("probe")
    ClusterIndex.build(spark, sf(), idx, maxDocFreq = Some(0.1))
    val filtered = ClusterIndex.filteredCorpus(spark, sf(), idx)
    assert(filtered.collect().map(_.toString).toSet
      == Dedup.dedupedCorpus(spark, sf(), maxDocFreq = Some(0.1))
        .collect().map(_.toString).toSet)
    val best = ClusterIndex.bestRepresentatives(spark, sf(), idx)
    assert(best.collect().map(_.toString).toSet
      == Dedup.bestRepresentatives(spark, sf(), maxDocFreq = Some(0.1))
        .collect().map(_.toString).toSet)
    // the probes are doc-keyed joins against the committed
    // assignment: no shingle explode, no signature hashing, no
    // Jaccard verification anywhere in their plans
    for ((name, df) <- Seq("filteredCorpus" -> filtered,
        "bestRepresentatives" -> best)) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      for (marker <- Seq("explode", "xxhash64", "array_intersect"))
        assert(!plan.toLowerCase.contains(marker),
          s"$name plan re-derives dedup ($marker found)")
    }
  }

  test("an uncommitted cluster version is invisible (marker protocol)") {
    val dir = writeDocs(Seq(
      1L -> words(1, 30), 2L -> words(1, 30)))
    val idx = tmp("torn")
    ClusterIndex.build(spark, dir, idx)
    val before = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(before == Map(1L -> ((1L, true)), 2L -> ((1L, false))))
    // a writer that reserved + staged but died before the marker:
    // readers never see it
    val stale = IndexCommit.reserve(spark, idx)
    import spark.implicits._
    Seq((1L, 99L), (2L, 99L)).toDF("doc_id", "component_id")
      .write.mode("overwrite")
      .parquet(s"${IndexCommit.versionDir(idx, stale)}/clusters")
    assert(clusterMap(ClusterIndex.clusters(spark, idx)) == before,
      "a staged-but-uncommitted version must be invisible")
  }
}
