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

  test("append rewrites ONLY touched range partitions; untouched " +
    "partition files stay byte-identical in their prior version") {
    // numParts=4, maxId=399 → width=100: part0=[0,100) part1=[100,200)
    // part2=[200,300) part3=[300,∞). Docs 1 and 150 are near-dup-able
    // ends; 250 and 399... 399 arrives as the batch BRIDGE.
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30), 150L -> words(19, 48),
      250L -> "completely unrelated text about something else entirely",
      399L -> "another unrelated corner of the corpus standing alone"))
    val idx = tmp("parts")
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    val v0 = IndexCommit.committedIds(spark, idx).last
    val v0dir = IndexCommit.versionDir(idx, v0)
    def fileBytes(dir: String): Map[String, Long] = {
      val d = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(d)) Map.empty
      else {
        val walk = java.nio.file.Files.walk(d)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(p => d.relativize(p).toString ->
              java.nio.file.Files.size(p)).toMap
        } finally walk.close()
      }
    }
    val part2Before = fileBytes(s"$v0dir/clusters/part=2")
    assert(part2Before.nonEmpty, "doc 250 must live in part 2 at build")
    // batch doc 50 (part 0 singleton) bridges components 1 and 150:
    // touched = part0 (new label 1 + added 50), part1 (old label 150
    // moves out — rewritten EMPTY)
    val batchDir = writeDocs(Seq(50L -> words(10, 39)))
    ClusterIndex.append(spark, idx,
      spark.read.parquet(s"$batchDir/documents.parquet"), threshold = 0.5)
    val v1 = IndexCommit.committedIds(spark, idx).last
    val v1dir = IndexCommit.versionDir(idx, v1)
    // the new version owns exactly the touched partitions
    val owned = ClusterIndex.sidecarParts(spark, s"$v1dir/partlist").toSet
    assert(owned == Set(0, 1), s"touched partitions must be {0,1}: $owned")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$v1dir/clusters/part=2")) &&
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$v1dir/clusters/part=3")),
      "untouched partitions must not be rewritten")
    // part 1 was rewritten EMPTY (doc 150's row moved to part 0) —
    // owned but absent on disk, and the old row must NOT resurface
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$v1dir/clusters/part=1")),
      "an emptied partition is owned via partlist, not a directory")
    // untouched partition files in the PRIOR version are untouched
    assert(fileBytes(s"$v0dir/clusters/part=2") == part2Before,
      "prior version's untouched partition files must be byte-stable")
    // resolution: merged state equals a from-scratch build over A∪B
    val unionDir = writeDocs(Seq(
      1L -> words(1, 30), 150L -> words(19, 48),
      250L -> "completely unrelated text about something else entirely",
      399L -> "another unrelated corner of the corpus standing alone",
      50L -> words(10, 39)))
    val idx2 = tmp("parts-union")
    ClusterIndex.build(spark, unionDir, idx2,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    val got = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(got == clusterMap(ClusterIndex.clusters(spark, idx2)),
      s"partitioned append ≡ build(A∪B): $got")
    assert(got(250L) == ((250L, true)),
      "doc 250 must resolve from the prior version's partition")
    assert(got(150L) == ((1L, false)),
      "doc 150's row must have moved to part 0, not resurfaced from part 1")
  }

  test("append READS only batch-proportional partitions (label-sidecar " +
    "pin) and the labels twin stays consistent with the assignment") {
    // numParts=4, width=100: docs 1, 150, 250, 399 populate all four
    // doc ranges. Batch doc 50 bridges components 1 and 150: every
    // read the append performs — the contraction/anti-join lookup
    // (label ranges of endpoints 1, 150 + batch 50) and the two
    // rewrites — must stay inside parts {0,1}; parts 2 and 3 (docs
    // 250, 399) must appear in NO read set. Before the label sidecar,
    // the lookup was the FULL assignment — a ~1.6 TB scan per
    // micro-batch at the 100 TB design point.
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30), 150L -> words(19, 48),
      250L -> "completely unrelated text about something else entirely",
      399L -> "another unrelated corner of the corpus standing alone"))
    val idx = tmp("readpin")
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    val batchDir = writeDocs(Seq(50L -> words(10, 39)))
    ClusterIndex.lastAppendStats = None
    ClusterIndex.append(spark, idx,
      spark.read.parquet(s"$batchDir/documents.parquet"), threshold = 0.5)
    val st = ClusterIndex.lastAppendStats.get
    assert(st.numParts == 4)
    val readSet = (st.lookupDocParts ++ st.rewriteClusterParts ++
      st.rewriteDocParts).toSet
    assert(readSet.subsetOf(Set(0, 1)),
      s"append read partitions outside the batch's blast radius: $st")
    assert(st.lookupDocParts.toSet == Set(0, 1),
      s"the contraction lookup must cover the endpoint ranges: $st")
    // the doc-range labels twin resolves to exactly the assignment
    def rows(subdir: String, sidecar: String) = {
      val dirs = ClusterIndex.partDirMap(spark, idx, None, subdir, sidecar)
        .values.flatten.toSeq
      spark.read.parquet(dirs: _*).select("doc_id", "component_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaClusters = rows("clusters", "partlist")
    val viaLabels = rows("labels", "doclist")
    assert(viaClusters == viaLabels,
      s"labels sidecar diverged from the assignment: " +
        s"$viaLabels vs $viaClusters")
    assert(viaClusters == Map(1L -> 1L, 50L -> 1L, 150L -> 1L,
      250L -> 250L, 399L -> 399L))
  }

  test("lookup: point reads equal the full cluster relation restricted; " +
    "only covering doc-range labels partitions are scanned") {
    val idx = tmp("lookup")
    ClusterIndex.build(spark, sf(), idx, maxDocFreq = Some(0.1),
      numParts = 8, docFilter = Some(col("doc_id") % 10 =!= 0))
    ClusterIndex.append(spark, idx,
      spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") % 10 === 0))
    val full = ClusterIndex.clusters(spark, idx).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toMap
    // a mixed set: build-carve docs, appended docs, an absent id
    val ids = Seq(1L, 3L, 10L, 20L, 57L, 999999L)
    val sub = ClusterIndex.lookup(spark, idx, ids)
    val got = sub.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("component_id"), r.getAs[Boolean]("keep"))).toMap
    assert(got == ids.flatMap(id => full.get(id).map(id -> _)).toMap,
      "lookup must equal the full relation restricted to the ids")
    assert(!got.contains(999999L), "absent ids resolve to no row")
    assert(got.contains(10L) && got.contains(20L),
      "appended docs must answer through partial-version doclists")
    // partition-prune audit: only labels/ partitions covering the
    // requested doc ranges are in the executed scan — never clusters/
    // partitions, never non-covering label ranges
    val l = ClusterIndex.layout(spark, idx)
    val wantParts = ids.map(id => math.min(
      Math.floorDiv(id, l.width), (l.numParts - 1).toLong).toInt).toSet
    val files = sub.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/labels/")),
      s"lookup must read the doc-range labels leg only: ${files.take(3).toSeq}")
    val touchedParts = files.flatMap(
      "/part=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1).toInt)).toSet
    assert(touchedParts.subsetOf(wantParts),
      s"scanned partitions $touchedParts must cover only the ids' " +
        s"ranges $wantParts")
    assert(touchedParts.size < l.numParts,
      "the prune must beat the full partition population")
  }

  test("maybeCompact gates on distance to the newest FULL version, " +
    "not total version count (no-vacuum stream stays cheap)") {
    // the round-12 gate compared committedIds.length against
    // maxVersions, which never resets without vacuum: once a
    // no-vacuum stream crossed the bar, EVERY subsequent batch paid a
    // full-assignment rewrite. The distance gate resets at each
    // compact by itself.
    val idx = tmp("distgate")
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30),
      250L -> "completely unrelated text about something else entirely"))
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    assert(ClusterIndex.versionsSinceFull(spark, idx) == 0)
    var compacts = 0
    for (k <- 1 to 9) {
      val bDir = writeDocs(Seq(
        (1000L + k) -> s"fresh batch number $k with its own words w${k}a w${k}b"))
      ClusterIndex.append(spark, idx,
        spark.read.parquet(s"$bDir/documents.parquet"), threshold = 0.5)
      if (ClusterIndex.maybeCompact(spark, idx, maxVersions = 3).isDefined)
        compacts += 1
      // NO vacuum on purpose — the distance must still reset
      assert(ClusterIndex.versionsSinceFull(spark, idx) <= 2,
        "resolution distance must stay bounded without vacuum")
    }
    // 9 appends at a fire-every-2-appends cadence: 4 compacts, not 8
    // (the old gate would fire on every append from the 2nd on)
    assert(compacts == 4,
      s"expected one compact per maxVersions-1 appends, got $compacts")
    val got = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(got.keySet == Set(1L, 250L) ++ (1 to 9).map(1000L + _))
  }

  test("vacuum is unsafe below a full version; compact then vacuum " +
    "to one version preserves the resolution") {
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30), 150L -> words(19, 48),
      250L -> "completely unrelated text about something else entirely"))
    val batchDir = writeDocs(Seq(50L -> words(10, 39)))
    val idx = tmp("compact")
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    ClusterIndex.append(spark, idx,
      spark.read.parquet(s"$batchDir/documents.parquet"), threshold = 0.5)
    val want = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(want.contains(250L))
    // compact publishes a FULL version; vacuum to 1 is then safe
    ClusterIndex.compact(spark, idx)
    IndexCommit.vacuum(spark, idx, keep = 1)
    assert(IndexCommit.committedIds(spark, idx).size == 1)
    assert(clusterMap(ClusterIndex.clusters(spark, idx)) == want,
      "compacted single version must resolve identically")
  }

  test("dedup_clusters_index guard premise: the %10 carve and the " +
    "full corpus derive the SAME hot-shingle set (fixture-drift alarm)") {
    // the registered query builds its index on the doc_id%10!=0 carve
    // with maxDocFreq=0.1 but is adjudicated against the full-corpus
    // oracle; equality holds only while the two hot sets coincide —
    // this assertion makes a fixture drift fail HERE, not as an
    // inscrutable oracle hash mismatch (round-11 advice)
    import graft.ops.LshIndex
    for (dir <- Seq(sf(), sf("sf0.01"))) {
      val full = tmp("hot-full"); val carve = tmp("hot-carve")
      LshIndex.build(spark, dir, full, maxDocFreq = Some(0.1))
      LshIndex.build(spark, dir, carve, maxDocFreq = Some(0.1),
        docFilter = Some(col("doc_id") % 10 =!= 0))
      val hf = spark.read.parquet(s"$full/hot")
        .collect().map(_.getLong(0)).toSet
      val hc = spark.read.parquet(s"$carve/hot")
        .collect().map(_.getLong(0)).toSet
      assert(hf == hc,
        s"hot sets diverged at $dir: carve-only=${hc -- hf} " +
          s"full-only=${hf -- hc} — dedup_clusters_index's oracle " +
          "premise no longer holds; rebuild the query without the carve guard")
    }
  }

  test("maybeCompact + vacuum cadence bounds resolution distance and " +
    "version count over an append stream") {
    val idx = tmp("cadence")
    val baseDir = writeDocs(Seq(
      1L -> words(1, 30),
      250L -> "completely unrelated text about something else entirely"))
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    var fired = 0
    for (k <- 1 to 6) {
      val bDir = writeDocs(Seq(
        (1000L + k) -> s"fresh batch number $k with its own words w${k}a w${k}b"))
      ClusterIndex.append(spark, idx,
        spark.read.parquet(s"$bDir/documents.parquet"), threshold = 0.5)
      // the operational recipe: compact at the cadence, then vacuum
      // to the (full) compacted version
      if (ClusterIndex.maybeCompact(spark, idx, maxVersions = 3).isDefined) {
        fired += 1
        IndexCommit.vacuum(spark, idx, keep = 1)
        // right after a compact, resolution touches ONLY the
        // compacted version (partDirs' early exit): one version dir
        val dirs = ClusterIndex.partDirs(spark, idx)
        assert(dirs.map(_.split("/clusters/").head).distinct.size == 1,
          s"post-compact resolution must read one version: $dirs")
      }
      assert(IndexCommit.committedIds(spark, idx).length <= 3,
        "cadence + vacuum must bound the committed version count")
    }
    assert(fired >= 2, s"the cadence must actually have fired: $fired")
    val want = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(want.keySet == Set(1L, 250L) ++ (1 to 6).map(1000L + _),
      s"every appended doc must survive the compact/vacuum loop: $want")
  }

  test("concurrent appends serialize: no writer's rewrite is lost") {
    // without the root lock, two appenders read the same assignment
    // base and the later commit drops the earlier one's rows (the
    // read-modify-write race the snapshot delta chain also had)
    val idx = tmp("race")
    val baseDir = writeDocs(Seq(1L -> words(1, 30)))
    ClusterIndex.build(spark, baseDir, idx,
      threshold = 0.5, rowsPerBand = 1, numParts = 4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (2 to 4).map { k =>
      val bDir = writeDocs(Seq(
        (100L * k) -> s"writer $k speaks its own words x${k}a x${k}b x${k}c"))
      new Thread(() =>
        try { ClusterIndex.append(spark, idx,
          spark.read.parquet(s"$bDir/documents.parquet"), threshold = 0.5); () }
        catch { case t: Throwable => errs.add(t); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"appenders must not fail: ${errs.peek()}")
    val got = clusterMap(ClusterIndex.clusters(spark, idx))
    assert(got.keySet == Set(1L, 200L, 300L, 400L),
      s"every concurrent appender's docs must survive: $got")
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

  test("pre-r13 parquet sidecars (meta/partlist/doclist) still resolve") {
    val dir = writeDocs(Seq(
      1L -> words(1, 30), 2L -> words(1, 30)))
    val idx = tmp("legacysidecar")
    ClusterIndex.build(spark, dir, idx)
    val before = clusterMap(ClusterIndex.clusters(spark, idx))
    // rewrite v0's sidecars and the layout meta in the r12 format
    // (one-row parquet DIRECTORIES) — an index built before the
    // text-sidecar change must keep answering, and an append must
    // keep resolving its old versions
    import spark.implicits._
    val l = ClusterIndex.layout(spark, idx)
    val v0 = IndexCommit.versionDir(idx, 0L)
    for (sc <- Seq("partlist", "doclist")) {
      val parts = ClusterIndex.sidecarParts(spark, s"$v0/$sc")
      Files.delete(java.nio.file.Paths.get(s"$v0/$sc"))
      parts.toDF("part").coalesce(1).write.parquet(s"$v0/$sc")
    }
    Files.delete(java.nio.file.Paths.get(s"$idx/meta"))
    Seq((l.numParts, l.width)).toDF("num_parts", "width")
      .coalesce(1).write.parquet(s"$idx/meta")
    assert(clusterMap(ClusterIndex.clusters(spark, idx)) == before,
      "legacy parquet sidecars must resolve identically")
    ClusterIndex.append(spark, idx,
      spark.read.parquet(
        s"${writeDocs(Seq(3L -> "unrelated new text entirely"))}" +
          "/documents.parquet"))
    assert(clusterMap(ClusterIndex.clusters(spark, idx)) ==
      before + (3L -> ((3L, true))),
      "append onto a legacy-sidecar index must merge correctly")
  }
}
