package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.{col, lit}
import graft.ops.{CorpusSnapshot, IndexCommit}

class CorpusSnapshotSpec extends SparkSpec {

  private def tmpRoot(name: String): String = {
    val p = Files.createTempDirectory(s"graft-snap-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs() =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))

  /** (relative path, md5) of every regular file under dir. */
  private def fileHashes(dir: String): Map[String, String] = {
    val base = Paths.get(dir)
    val walk = Files.walk(base)
    try walk.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map { p: Path =>
        val md = java.security.MessageDigest.getInstance("MD5")
        base.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
    finally walk.close()
  }

  test("publish/read round-trips the corpus; shard files are size-capped") {
    val root = tmpRoot("rt")
    val id = CorpusSnapshot.publish(spark, docs(), root)
    val got = CorpusSnapshot.read(spark, root, Some(id)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want, "time-travel read must round-trip exactly")
    // manifest stats agree with the files on disk, and the byte cap
    // is LIVE: some shard splits into multiple files, and no file
    // exceeds cap by more than its own last document (start-offset
    // rule)
    val man = CorpusSnapshot.manifest(spark, root, Some(id)).collect()
    assert(man.map(_.getAs[Long]("file_seq")).max >= 1,
      "cap never split a shard — raise corpus or lower cap")
    val vdir = IndexCommit.versionDir(root, id)
    man.foreach { r =>
      val p = Paths.get(s"$vdir/${r.getAs[String]("path")}")
      assert(Files.size(p) == r.getAs[Long]("n_bytes"),
        s"manifest n_bytes vs disk for $p")
      val lines = Files.readAllLines(p)
      assert(lines.size == r.getAs[Long]("n_docs"))
      val lastLen = lines.get(lines.size - 1).length + 1
      assert(r.getAs[Long]("n_bytes") - lastLen < CorpusSnapshot.DefaultMaxBytes,
        s"file $p starts a doc beyond the cap")
    }
  }

  test("re-publishing the same corpus yields byte-identical shard files") {
    val (r1, r2) = (tmpRoot("det1"), tmpRoot("det2"))
    val id1 = CorpusSnapshot.publish(spark, docs(), r1)
    val id2 = CorpusSnapshot.publish(spark, docs(), r2)
    def shardFiles(root: String, id: Long) =
      fileHashes(IndexCommit.versionDir(root, id))
        .filter(_._1.endsWith(".jsonl"))
    val h1 = shardFiles(r1, id1)
    val h2 = shardFiles(r2, id2)
    assert(h1.nonEmpty && h1 == h2,
      "same corpus must produce the same file set with the same bytes")
  }

  test("a writer killed mid-publish leaves the old snapshot answering") {
    val root = tmpRoot("kill")
    val old = docs().filter(col("doc_id") % 2 === 0)
    val v0 = CorpusSnapshot.publish(spark, old, root)
    // simulate the crash: reserve + stage the full corpus, then die
    // BEFORE the marker — exactly the torn state the protocol covers
    val staged = IndexCommit.reserve(spark, root)
    CorpusSnapshot.stage(spark, docs(), root, staged)
    // data exists on disk...
    assert(Files.exists(
      Paths.get(IndexCommit.versionDir(root, staged), "manifest")))
    // ...but the root still answers with v0, and the staged id is
    // invisible to version resolution
    assert(IndexCommit.committedIds(spark, root) == Seq(v0))
    val got = CorpusSnapshot.read(spark, root).collect()
      .map(_.getLong(0)).toSet
    assert(got == old.collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      CorpusSnapshot.manifest(spark, root, Some(staged))
    }
    // the writer's retry path: committing the already-staged id makes
    // it current without rewriting a byte
    IndexCommit.commit(spark, root, staged)
    val after = CorpusSnapshot.read(spark, root).count()
    assert(after == docs().count())
  }

  test("diff over committed versions classifies by content hash") {
    val root = tmpRoot("diff")
    val v0 = CorpusSnapshot.publish(spark,
      docs().filter(col("doc_id") % 3 =!= 0), root)
    val v1 = CorpusSnapshot.publish(spark,
      docs().filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.when(col("doc_id") % 5 === 0,
            org.apache.spark.sql.functions.upper(col("text")))
            .otherwise(col("text")).as("text")), root)
    val got = CorpusSnapshot.diff(spark, root, v0, v1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force recompute off the same carves
    val all = docs().collect().map(r => r.getLong(0) -> r.getString(1))
    val o = all.filter(_._1 % 3 != 0).toMap
    val n = all.filter(_._1 % 2 != 0)
      .map { case (id, t) => id -> (if (id % 5 == 0) t.toUpperCase else t) }
      .toMap
    val want = (o.keySet ++ n.keySet).toSeq.map { id =>
      (o.get(id), n.get(id)) match {
        case (None, _)                    => "added"
        case (_, None)                    => "removed"
        case (Some(a), Some(b)) if a == b => "same"
        case _                            => "changed"
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.keySet == Set("added", "removed", "same", "changed"),
      s"fixture must exercise all four classes: $got")
  }

  test("diff is MANIFEST-ONLY (dochash sidecar, plan-pinned) and a " +
    "pre-sidecar version falls back to one identical-hash payload pass") {
    val root = tmpRoot("diffmanifest")
    val v0 = CorpusSnapshot.publish(spark,
      docs().filter(col("doc_id") % 3 =!= 0), root)
    val v1 = CorpusSnapshot.publish(spark,
      docs().filter(col("doc_id") % 2 =!= 0), root)
    val d = CorpusSnapshot.diff(spark, root, v0, v1)
    val want = d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // plan pin: no payload parse anywhere — the shard .jsonl bytes
    // never enter the diff; both scans are the dochash parquet
    val plan = d.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (marker <- Seq("get_json_object", "unhex", ".jsonl"))
      assert(!plan.contains(marker),
        s"diff plan touches shard payloads ($marker found)")
    assert(plan.contains("dochash"),
      "diff must scan the dochash sidecar")
    // fallback: a version published BEFORE the sidecar existed (here:
    // sidecar deleted) still diffs identically — md5(raw line) is the
    // same function the sidecar stores, so mixed pairs compare true
    val side = new java.io.File(
      s"${graft.ops.IndexCommit.versionDir(root, v0)}/dochash")
    assert(side.exists)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    rmTree(side)
    val mixed = CorpusSnapshot.diff(spark, root, v0, v1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed == want,
      "pre-sidecar fallback must classify identically to the sidecar path")
  }

  test("vacuum retires old versions; current keeps answering") {
    val root = tmpRoot("vac")
    val v0 = CorpusSnapshot.publish(spark,
      docs().filter(col("doc_id") % 2 === 0), root)
    val v1 = CorpusSnapshot.publish(spark, docs(), root)
    assert(IndexCommit.vacuum(spark, root, keep = 1) == Seq(v0))
    intercept[IllegalArgumentException] {
      CorpusSnapshot.manifest(spark, root, Some(v0))
    }
    assert(!Files.exists(Paths.get(IndexCommit.versionDir(root, v0))))
    assert(CorpusSnapshot.read(spark, root).count() == docs().count())
    assert(IndexCommit.committedIds(spark, root) == Seq(v1))
  }

  test("publish scans the source exactly once (persisted layout)") {
    val root = tmpRoot("onescan")
    val acc = spark.sparkContext.longAccumulator("src-rows")
    import spark.implicits._
    val base = docs().as[(Long, String)].collect().toIndexedSeq
    // the accumulator rides INSIDE the source lineage: every
    // re-execution of the scan re-counts every row, so acc == n is
    // the one-scan proof (pre-fix, the un-persisted layout fed both
    // the shard writer and the manifest aggregation → acc == 2n)
    val src = spark.createDataset(base)
      .map { t => acc.add(1); t }.toDF("doc_id", "text")
    CorpusSnapshot.publish(spark, src, root)
    assert(acc.value == base.length,
      s"source executed ${acc.value.toDouble / base.length}x — " +
        "publish must scan the corpus once")
    // and the snapshot is still complete + readable
    assert(CorpusSnapshot.read(spark, root).count() == base.length)
  }

  test("nShards is a layout detail: 3-way and 24-way publishes read " +
    "back the same corpus; auto-sizing derives > 16 shards") {
    val want = docs().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def readBack(root: String) =
      CorpusSnapshot.read(spark, root).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val r3 = tmpRoot("sh3"); val r24 = tmpRoot("sh24")
    CorpusSnapshot.publish(spark, docs(), r3, nShards = 3)
    CorpusSnapshot.publish(spark, docs(), r24, nShards = 24)
    assert(readBack(r3) == want)
    assert(readBack(r24) == want)
    // the 24-way layout actually uses more than 16 shards — the
    // 4-nibble shard hash is what makes write parallelism real past
    // one hex digit
    val shards24 = CorpusSnapshot.manifest(spark, r24)
      .select("shard_id").distinct().collect().map(_.getInt(0)).toSet
    assert(shards24.size > 16 && shards24.forall(s => s >= 0 && s < 24),
      s"24-way publish landed on only ${shards24.size} shards")
    // publishAuto: a small byte target must derive a LARGE shard
    // count from plan statistics alone (clamped to maxShards)
    val rAuto = tmpRoot("shauto")
    val (_, nAuto) = CorpusSnapshot.publishAuto(
      spark, docs(), rAuto, targetShardBytes = 1024, maxShards = 64)
    assert(nAuto > 16, s"auto-derived nShards $nAuto — expected > 16")
    assert(readBack(rAuto) == want)
  }

  test("delta chain: last-writer-wins, remove-then-re-add resurfaces, " +
    "overlap guarded") {
    import spark.implicits._
    val root = tmpRoot("delta")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    CorpusSnapshot.publish(spark,
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text"),
      root)
    // delta 1: edit 2, add 4, tombstone 3
    CorpusSnapshot.publishDelta(spark,
      Seq((2L, "two-v2"), (4L, "four")).toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), root)
    assert(m(CorpusSnapshot.readResolved(spark, root))
      == Map(1L -> "one", 2L -> "two-v2", 4L -> "four"))
    // delta 2: re-add the tombstoned doc — the newer event wins
    CorpusSnapshot.publishDelta(spark,
      Seq((3L, "three-back")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), root)
    val want = Map(1L -> "one", 2L -> "two-v2",
      3L -> "three-back", 4L -> "four")
    assert(m(CorpusSnapshot.readResolved(spark, root)) == want)
    // read() of a delta version stays delta-only (manifest contract)
    val ids = IndexCommit.committedIds(spark, root)
    assert(m(CorpusSnapshot.read(spark, root, Some(ids(1))))
      == Map(2L -> "two-v2", 4L -> "four"))
    // time travel resolves through the chain PREFIX
    assert(m(CorpusSnapshot.readResolved(spark, root, Some(ids(1))))
      == Map(1L -> "one", 2L -> "two-v2", 4L -> "four"))
    // a version may not both write and tombstone a doc
    intercept[IllegalArgumentException] {
      CorpusSnapshot.publishDelta(spark,
        Seq((5L, "five")).toDF("doc_id", "text"),
        Seq(5L).toDF("doc_id"), root)
    }
  }

  test("readResolvedSubset: point lookups equal the full resolve " +
    "restricted; touched files bounded by |docs| x chain, not corpus") {
    val root = tmpRoot("subset")
    val base = docs()
    // base: everything but %7=0; delta: edit %11=0 (upper), tombstone
    // %13=0 — the snapresolve fixture shape, on a real corpus so the
    // base publish spreads over many shard files
    CorpusSnapshot.publish(spark, base.filter(col("doc_id") % 7 =!= 0),
      root, nShards = 8)
    CorpusSnapshot.publishDelta(spark,
      base.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 === 0)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.upper(col("text")).as("text")),
      base.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 13 === 0 &&
        col("doc_id") % 11 =!= 0).select("doc_id"),
      root)
    val full = CorpusSnapshot.readResolved(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val totalFiles = Seq(0, 1).map(i =>
      CorpusSnapshot.manifest(spark, root,
        Some(IndexCommit.committedIds(spark, root)(i))).count()).sum
    // the point set crosses every resolution class: kept-as-base,
    // delta-edited, tombstoned, never-published (%7=0), absent id
    val ids = Seq(1L, 2L, 11L, 13L, 14L, 22L, 26L, 7L, 999999L)
    val sub = CorpusSnapshot.readResolvedSubset(spark, root, ids)
    val got = sub.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == ids.flatMap(id => full.get(id).map(id -> _)).toMap,
      "subset resolve must equal the full resolve restricted to the ids")
    assert(!got.contains(13L) && !got.contains(26L),
      "tombstoned docs must resolve ABSENT through the prune")
    assert(got(11L) == full(11L) && got(11L) == got(11L).toUpperCase,
      "delta-edited docs must resolve to the NEWEST content")
    // the flat-read claim, audited on the executed relation: the text
    // scans open at most |ids| files per chain member — and far fewer
    // than the corpus's file population
    val touched = sub.inputFiles.count(_.endsWith(".jsonl"))
    assert(touched <= ids.size * 2,
      s"point lookup opened $touched shard files for ${ids.size} ids " +
        "over a 2-member chain")
    assert(touched < totalFiles,
      s"prune must beat the full file population ($totalFiles)")
    // single-id lookup: at most one file per chain member
    val one = CorpusSnapshot.readResolvedSubset(spark, root, Seq(11L))
    assert(one.inputFiles.count(_.endsWith(".jsonl")) <= 2)
    assert(one.collect().map(r => r.getLong(0)).toSeq == Seq(11L))
    intercept[IllegalArgumentException] {
      CorpusSnapshot.readResolvedSubset(spark, root, Seq.empty)
    }
  }

  test("compact materializes the chain as a full version; vacuum to " +
    "one version is then safe") {
    import spark.implicits._
    val root = tmpRoot("compact")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    CorpusSnapshot.publish(spark,
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), root)
    CorpusSnapshot.publishDelta(spark,
      Seq((2L, "two-v2"), (3L, "three")).toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), root)
    val want = m(CorpusSnapshot.readResolved(spark, root))
    val cid = CorpusSnapshot.compact(spark, root)
    // the compacted version is FULL: plain read equals the resolution
    assert(m(CorpusSnapshot.read(spark, root, Some(cid))) == want)
    // its shard files are byte-identical to a fresh full publish of
    // the same corpus (layout is deterministic in the corpus alone)
    val fresh = tmpRoot("compact-fresh")
    val fid = CorpusSnapshot.publish(spark,
      Seq((2L, "two-v2"), (3L, "three")).toDF("doc_id", "text"), fresh)
    // (manifest parquet part names carry a per-job UUID, so compare
    // shard files by path and the manifest by content hash)
    def shardsAndManifest(dir: String) = {
      val fh = fileHashes(dir)
      (fh.filter(_._1.startsWith("shard=")),
        fh.collect { case (p, h)
          if p.startsWith("manifest/part-") && !p.endsWith(".crc") => h
        }.toSet)
    }
    assert(shardsAndManifest(IndexCommit.versionDir(root, cid))
      == shardsAndManifest(IndexCommit.versionDir(fresh, fid)),
      "compact must write the byte-identical full layout")
    // ancestors can now retire: vacuum to 1 keeps only the compacted
    // full version and the resolution is unchanged
    IndexCommit.vacuum(spark, root, keep = 1)
    assert(IndexCommit.committedIds(spark, root) == Seq(cid))
    assert(m(CorpusSnapshot.readResolved(spark, root)) == want)
  }

  test("diffResolved classifies the logical corpora of a delta chain") {
    import spark.implicits._
    val root = tmpRoot("diffres")
    CorpusSnapshot.publish(spark,
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text"),
      root)
    CorpusSnapshot.publishDelta(spark,
      Seq((2L, "two-v2"), (4L, "four")).toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), root)
    val ids = IndexCommit.committedIds(spark, root)
    val got = CorpusSnapshot.diffResolved(spark, root, ids.head, ids.last)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("same" -> 1L, "changed" -> 1L,
      "added" -> 1L, "removed" -> 1L))
    // the raw diff over the same pair misreads the delta as the
    // whole corpus — the exact misuse diffResolved exists to prevent
    val raw = CorpusSnapshot.diff(spark, root, ids.head, ids.last)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw.getOrElse("removed", 0L) > 1L,
      "raw diff of a delta version should show the misclassification")
  }

  test("chain length drives resolve cost linearly and maybeCompact " +
    "bounds it: chain never exceeds maxChain, resolution unchanged") {
    import spark.implicits._
    val root = tmpRoot("cadence")
    CorpusSnapshot.publish(spark,
      Seq((0L, "base")).toDF("doc_id", "text"), root)
    val expected = scala.collection.mutable.Map(0L -> "base")
    var maxSeen = 0
    for (k <- 1 to 12) {
      CorpusSnapshot.publishDelta(spark,
        Seq((k.toLong, s"doc$k")).toDF("doc_id", "text"),
        Seq.empty[Long].toDF("doc_id"), root)
      expected(k.toLong) = s"doc$k"
      // resolve cost is linear in chain length by construction: one
      // relation per member — pin the structural count
      val chainLen = CorpusSnapshot.chain(spark, root).length
      maxSeen = math.max(maxSeen, chainLen - 1)
      CorpusSnapshot.maybeCompact(spark, root, maxChain = 4)
      assert(CorpusSnapshot.chain(spark, root).length - 1 < 4 ||
        CorpusSnapshot.chain(spark, root).length - 1 == 0,
        "cadence must cap the chain")
    }
    assert(maxSeen == 4, s"the cadence fired exactly at the bound: $maxSeen")
    // post-compact the chain is a single full version and resolution
    // is byte-for-byte the same corpus
    assert(CorpusSnapshot.readResolved(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == expected.toMap)
    // a fresh head after compaction resolves through a length-1 chain
    CorpusSnapshot.publishDelta(spark,
      Seq((99L, "tail")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), root)
    assert(CorpusSnapshot.chain(spark, root).length == 2,
      "post-compact chains restart from the compacted full version")
  }

  test("delta-publish lock: critical sections serialize, a held lock " +
    "times out with a recovery message, a stale lock is broken") {
    val root = tmpRoot("dlock")
    // serialization: two threads through the lock never interleave a
    // deliberately non-atomic read-sleep-write sequence
    @volatile var v = 0
    var torn = false
    val ts = (1 to 2).map(_ => new Thread(() =>
      CorpusSnapshot.withDeltaLock(spark, root) {
        val seen = v; Thread.sleep(150)
        if (v != seen) torn = true
        v = seen + 1
      }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(!torn && v == 2, "lock must serialize the critical section")
    // a FRESH foreign lock blocks until timeout, then errors clearly
    val lockFile = Paths.get(root, "delta.lock")
    Files.createFile(lockFile)
    val e = intercept[RuntimeException] {
      CorpusSnapshot.withDeltaLock(spark, root, timeoutMs = 200L) { () }
    }
    assert(e.getMessage.contains("writer lock") &&
      e.getMessage.contains("delta.lock"))
    // a STALE lock (mtime past staleMs) is broken and the publish runs
    Files.setLastModifiedTime(lockFile,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000L))
    var ran = false
    CorpusSnapshot.withDeltaLock(spark, root, timeoutMs = 5000L) { ran = true }
    assert(ran && !Files.exists(lockFile), "stale lock broken and released")
  }

  test("concurrent delta publishes keep the chain linear: every " +
    "publisher's changes survive in the resolved corpus") {
    import spark.implicits._
    val root = tmpRoot("race")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    CorpusSnapshot.publish(spark,
      Seq((1L, "one")).toDF("doc_id", "text"), root)
    // 3 concurrent publishers, disjoint docs — without the lock two
    // of them can record the same parent and fork the chain, dropping
    // a delta from readResolved (the advice-reported race)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (2 to 4).map(k => new Thread(() =>
      try CorpusSnapshot.publishDelta(spark,
        Seq((k.toLong, s"doc$k")).toDF("doc_id", "text"),
        spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0), root)
      catch { case t: Throwable => errs.add(t); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"publishers must not fail: ${errs.peek()}")
    // linearity: each committed delta's parent is its immediate
    // committed predecessor — no forks
    val ids = IndexCommit.committedIds(spark, root)
    ids.sliding(2).foreach { case Seq(prev, cur) =>
      val meta = CorpusSnapshot.metaOf(spark, root, cur)
      assert(meta == ("delta", Some(prev)),
        s"version $cur must chain to $prev, not $meta")
    }
    assert(m(CorpusSnapshot.readResolved(spark, root)) ==
      Map(1L -> "one", 2L -> "doc2", 3L -> "doc3", 4L -> "doc4"),
      "all three concurrent deltas must survive resolution")
  }

  test("metaOf reads pre-r13 parquet lineage dirs (mixed chains)") {
    import spark.implicits._
    val root = tmpRoot("legacymeta")
    CorpusSnapshot.publish(spark,
      Seq((1L, "one")).toDF("doc_id", "text"), root)
    val id = CorpusSnapshot.publishDelta(spark,
      Seq((2L, "two")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), root)
    // rewrite the delta's meta in the r12 format: a one-row parquet
    // DIRECTORY instead of the text file
    val vdir = IndexCommit.versionDir(root, id)
    Files.delete(Paths.get(s"$vdir/meta"))
    Seq(("delta", id - 1)).toDF("kind", "parent")
      .coalesce(1).write.parquet(s"$vdir/meta")
    assert(CorpusSnapshot.metaOf(spark, root, id) == ("delta", Some(id - 1)),
      "legacy parquet meta must resolve identically")
    val m = CorpusSnapshot.readResolved(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "one", 2L -> "two"),
      "a mixed old/new chain must resolve end-to-end")
  }
}
