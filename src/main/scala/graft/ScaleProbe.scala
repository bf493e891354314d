package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probes for the round-12 verdict items: delta-chain
  * resolve cost vs chain length, per-micro-batch cost of the
  * streaming cluster/snapshot maintenance paths at 1× vs 10×
  * accumulated corpus, and ADC recall at scale. Each mode prints one
  * JSON line per measurement (the SCALE_r* raw-file convention).
  *
  * Usage: runMain graft.ScaleProbe <mode> <sfDir> [out]
  *   chain        resolve seconds at delta-chain lengths 1/8/32 and
  *                post-compact, fixed per-delta change size
  *   clusterstream  StreamingCluster.applyBatch seconds for a FIXED
  *                ~1k-doc batch against the accumulated corpus index
  *   snapstream   StreamingSnapshot.applyBatch seconds for the same
  *                fixed batch against the accumulated snapshot
  *   recall       sim_recall_eval's recall@10 rows + seconds
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val out = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-scaleprobe").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime
      val r = f
      (r, (System.nanoTime - t0) / 1e9)
    }
    // min of 2 executions: the first run of a route in a fresh JVM
    // absorbs one-time codegen/classloading (~5 s) that would bill
    // whichever route happens to run first — one policy for every
    // probe mode, so they all measure under the same repeat rule
    def best[T](f: => T): (T, Double) = {
      val r1 = timed(f); val r2 = timed(f)
      if (r1._2 <= r2._2) r1 else r2
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    mode match {
      case "chain" =>
        import spark.implicits._
        import graft.ops.CorpusSnapshot
        val root = s"$out/chainroot"
        graft.ops.IndexCommit.reset(spark, root)
        // base = the corpus; each delta rewrites the same fixed ~1%
        // slice with a version-stamped text (change-proportional)
        val base = docs.select(col("doc_id"), col("text"))
        CorpusSnapshot.publish(spark, base, root)
        val slice = base.filter(col("doc_id") % 100 === 1)
        var published = 0
        for (target <- Seq(1, 8, 32)) {
          while (published < target) {
            CorpusSnapshot.publishDelta(spark,
              slice.select(col("doc_id"),
                concat(lit(s"v$published "), col("text")).as("text")),
              Seq.empty[Long].toDF("doc_id"), root)
            published += 1
          }
          val (n, secs) = timed(
            CorpusSnapshot.readResolved(spark, root).count())
          println(s"""{"probe":"chain","dir":"$dir","chain":$target,"docs":$n,"secs":$secs}""")
        }
        val (_, csecs) = timed(CorpusSnapshot.compact(spark, root))
        val (n2, secs2) = timed(
          CorpusSnapshot.readResolved(spark, root).count())
        println(s"""{"probe":"chain","dir":"$dir","chain":0,"compact_secs":$csecs,"docs":$n2,"secs":$secs2}""")

      case "clusterstream" =>
        import graft.ops.ClusterIndex
        val idx = s"$out/clidx"
        graft.ops.IndexCommit.reset(spark, idx)
        // fixed ~1k-doc batch regardless of corpus scale: shard-0 ids
        // below 2000 exist at every scale
        val isBatch = col("doc_id") < 2000
        val (nb, bsecs) = timed(ClusterIndex.build(spark, dir, idx,
          maxDocFreq = Some(0.1), docFilter = Some(!isBatch)))
        val batch = docs.filter(isBatch)
        val (_, asecs) = timed(
          graft.streaming.StreamingCluster.applyBatch(
            batch, idx, threshold = 0.8, batchId = 0L))
        println(s"""{"probe":"clusterstream","dir":"$dir","batch_docs":${batch.count()},"build_secs":$bsecs,"microbatch_secs":$asecs,"build_version":$nb}""")

      case "snapstream" =>
        import graft.streaming.StreamingSnapshot
        val root = s"$out/snaproot"
        graft.ops.IndexCommit.reset(spark, root)
        val isBatch = col("doc_id") < 2000
        val base = docs.filter(!isBatch).select(col("doc_id"), col("text"))
        val (_, psecs) = timed(
          graft.ops.CorpusSnapshot.publish(spark, base, root))
        val batch = docs.filter(isBatch).select(col("doc_id"), col("text"))
        val (_, asecs) = timed(
          StreamingSnapshot.applyBatch(batch, root,
            nShards = 8, maxBytes = graft.ops.CorpusSnapshot.DefaultMaxBytes,
            batchId = 1L))
        println(s"""{"probe":"snapstream","dir":"$dir","batch_docs":${batch.count()},"base_publish_secs":$psecs,"microbatch_secs":$asecs}""")

      case "appendread" =>
        // round-13 pin at scale: ClusterIndex.append's READ side is
        // batch-proportional — the label-sidecar partitions it
        // consults (lookup + both rewrites) must not grow toward
        // numParts as the corpus grows, and the append seconds for a
        // FIXED batch must stay ~flat from 1× to 10×
        import graft.ops.ClusterIndex
        val idx = s"$out/clidxread"
        graft.ops.IndexCommit.reset(spark, idx)
        val isBatch = col("doc_id") < 2000
        val (_, bsecs) = timed(ClusterIndex.build(spark, dir, idx,
          maxDocFreq = Some(0.1), docFilter = Some(!isBatch)))
        ClusterIndex.lastAppendStats = None
        val (_, asecs) = timed(
          ClusterIndex.append(spark, idx, docs.filter(isBatch)))
        val st = ClusterIndex.lastAppendStats.get
        println(s"""{"probe":"appendread","dir":"$dir","build_secs":$bsecs,"append_secs":$asecs,"lookup_parts":${st.lookupDocParts.size},"rewrite_cluster_parts":${st.rewriteClusterParts.size},"rewrite_doc_parts":${st.rewriteDocParts.size},"num_parts":${st.numParts}}""")

      case "videodecomp" =>
        // round-13 decomposition of mm_video_near_dup's 10× growth:
        // decode+hash (payload-proportional signature derivation)
        // timed separately from the banded candidate join + verify
        import graft.ops.PerceptualHash
        val vids = PerceptualHash.syntheticVideos(spark, dir)
        val (nSigs, sigSecs) = timed(
          PerceptualHash.videoSignatures(vids).count())
        val (nPairs, allSecs) = timed(
          PerceptualHash.videoNearDupPairs(spark, dir).count())
        println(s"""{"probe":"videodecomp","dir":"$dir","sigs":$nSigs,"sig_secs":$sigSecs,"pairs":$nPairs,"total_secs":$allSecs}""")

      case "videopairs" =>
        // decomposition companion to videodecomp: WHERE does the pair
        // count grow? Hamming histogram of the emitted pairs + the
        // largest identical-signature classes — if growth is C(n,2)
        // over Hamming-0 classes, it's output volume (pair semantics
        // over genuinely identical clips), not candidate waste
        import graft.ops.PerceptualHash
        val sigs = PerceptualHash.videoSignatures(
          PerceptualHash.syntheticVideos(spark, dir))
        val classes = sigs.groupBy("sig").count()
          .filter(col("count") > 1)
          .orderBy(col("count").desc).limit(10)
          .collect().map(r => r.getLong(1))
        val quadPairs = classes.map(n => n * (n - 1) / 2).sum
        val pairs = PerceptualHash.videoNearDupPairs(spark, dir)
        val hist = pairs.groupBy("hamming").count()
          .orderBy("hamming").collect()
          .map(r => s""""h${r.getInt(0)}":${r.getLong(1)}""").mkString(",")
        println(s"""{"probe":"videopairs","dir":"$dir","hist":{$hist},"top_class_sizes":[${classes.mkString(",")}],"top_class_pairs":$quadPairs}""")

      case "upsert" =>
        // round-13 upsert scale leg (ScaleGen now carries orders):
        // seconds + executed-plan audit — the target side must carry
        // ZERO shuffle exchanges (broadcast-only contract) at any
        // delta size
        val (df, secs) = timed {
          val d = SparkEntry.queries("upsert_orders")(spark, dir)
          (d, d.count())
        }
        val plan = df._1.queryExecution.executedPlan.toString
        val sortMerge = plan.contains("SortMergeJoin")
        val shuffledHash = plan.contains("ShuffledHashJoin")
        println(s"""{"probe":"upsert","dir":"$dir","rows":${df._2},"secs":$secs,"sort_merge_join":$sortMerge,"shuffled_hash_join":$shuffledHash}""")

      case "simdup" =>
        // r14: the embedding duplicate-class blow-up, isolated — the
        // corpus is the embeddings table copied VERBATIM k times
        // (identical-vector classes of size k, modeling a document
        // mirrored k ways; args(3) = k). The pair form must emit
        // ~classes·C(k,2) rows (Ω(output)); the cluster form's output
        // stays node-proportional and its runtime must grow like the
        // candidate mass, not the pair mass.
        import graft.ops.Similarity
        val k = args.lift(3).map(_.toInt).getOrElse(4)
        val base = Similarity.load(spark, dir).select("vec_id", "v")
        val dup = (0 until k).map(i =>
          base.select((col("vec_id") + lit(i.toLong * 10000000L))
            .as("vec_id"), col("v"))).reduce(_ unionByName _)
        val (nPairs, pairSecs) = timed(
          Similarity.cosineNearDupPairsDf(dup, 0.9, 64, 4).count())
        val (nClus, clusSecs) = timed(
          Similarity.cosineNearDupClustersDf(dup, 0.9, 64, 4).count())
        println(s"""{"probe":"simdup","dir":"$dir","copies":$k,"pairs":$nPairs,"pair_secs":$pairSecs,"cluster_rows":$nClus,"cluster_secs":$clusSecs}""")

      case "simprobe" =>
        // r14: SimSigIndex probe economics — the index is built
        // UNTIMED over the corpus; the timed unit is a FIXED
        // 200-vector batch probing the committed segments. Probe
        // seconds must stay ~flat from 1× to 10× corpus (the
        // batch-proportional contract; only the streamed index scan
        // grows, across 32 cores).
        import graft.ops.{Similarity, SimSigIndex}
        val emb = Similarity.load(spark, dir).select("vec_id", "v")
        val idx = s"$out/simsigidx"
        val isBatch = col("vec_id") < 200
        val (_, bsecs) = timed(
          SimSigIndex.build(spark, idx, emb.filter(!isBatch)))
        val (n, psecs) = timed(
          SimSigIndex.probe(spark, idx, emb.filter(isBatch), 0.9).count())
        println(s"""{"probe":"simprobe","dir":"$dir","build_secs":$bsecs,"probe_pairs":$n,"probe_secs":$psecs}""")

      case "sigclusters" =>
        // r14: the decode-once claim measured — SigIndex built UNTIMED
        // from the corpus images (the one decode), then the timed unit
        // is SigIndex.clusters over frozen 16-byte signatures vs the
        // decode-side imageClusters re-deriving everything. The index
        // route must shed the decode cost entirely (its growth is the
        // fixed-width clustering job's, not the codec's).
        import graft.ops.{PerceptualHash, SigIndex}
        val idx = s"$out/sigidxcl"
        val (_, bsecs) = timed(SigIndex.build(spark, idx,
          PerceptualHash.signatures(
            PerceptualHash.syntheticImages(spark, dir))))
        val (nIdx, idxSecs) = best(SigIndex.clusters(spark, idx).count())
        val (nDec, decSecs) = best(
          PerceptualHash.imageClusters(spark, dir).count())
        println(s"""{"probe":"sigclusters","dir":"$dir","build_secs":$bsecs,"index_rows":$nIdx,"index_secs":$idxSecs,"decode_rows":$nDec,"decode_secs":$decSecs}""")

      case "segprobe" =>
        // r14: what compaction buys — a FIXED batch probes the LSH
        // index when the corpus arrived as ~32 streamed micro-batch
        // segments vs after one compact. Same data, same answers
        // (asserted); the delta is segment-resolution + many-small-
        // files scan overhead, the cost a long-lived ingestion stream
        // accumulates until the in-stream cadence fires.
        import graft.ops.{IndexCommit, LshIndex}
        val idx = s"$out/segprobe"
        val isBatch = col("doc_id") % 50 === 0
        LshIndex.build(spark, dir, idx,
          docFilter = Some(!isBatch && col("doc_id") % 32 === 0))
        for (k <- 1 until 32)
          LshIndex.append(spark, idx, docs
            .filter(!isBatch && col("doc_id") % 32 === k)
            .select("doc_id", "text"))
        val batch = docs.filter(isBatch).select("doc_id", "text")
        val nSegs = IndexCommit.liveIds(spark, idx).size
        val (n1, fragSecs) = best(LshIndex.probe(spark, idx, batch).count())
        LshIndex.compact(spark, idx)
        IndexCommit.vacuumSuperseded(spark, idx, keepGenerations = 0)
        val (n2, compSecs) = best(LshIndex.probe(spark, idx, batch).count())
        require(n1 == n2, s"compact changed probe answers: $n1 != $n2")
        println(s"""{"probe":"segprobe","dir":"$dir","segments":$nSegs,"frag_secs":$fragSecs,"compact_secs":$compSecs,"pairs":$n1}""")

      case "simguard" =>
        // r15: the hot-band guard measured where it matters — the
        // corpus is the dir's embeddings PLUS a planted dense region
        // of args(3) NEAR-identical vectors (1e-9-perturbed, never
        // bit-identical, so the collapse can't touch them; they sign
        // identically on every plane and land in ONE bucket per
        // band). Candidate generation is timed unguarded (C(n,2)
        // within the bucket) vs star-capped (n-1): counts prove the
        // quadratic-vs-linear shape, seconds prove the cap's cost at
        // probe scale, guardDrift seconds price the telemetry.
        import graft.ops.{CacheScope, Similarity}
        val n = args.lift(3).map(_.toInt).getOrElse(4000)
        val emb = Similarity.load(spark, dir).select("vec_id", "v")
        val dims = emb.select(size(col("v"))).head().getInt(0)
        val dense = spark.range(n.toLong).select(
          (col("id") + 100000000L).as("vec_id"),
          array((0 until dims).map {
            case 0 => lit(1.0)
            case 1 => col("id").cast("double") * lit(1e-9)
            case _ => lit(0.0)
          }: _*).as("v"))
        val corpus = emb.unionByName(dense)
        def cand(cap: Option[Long]): (Long, Double) = {
          val scope = new CacheScope
          try timed(Similarity.bandedCandidateIds(
            Similarity.lshSignaturesDf(corpus, 64), 64, 4, cap, scope)
            .count())
          finally scope.release()
        }
        val (unN, unS) = cand(None)
        val (gN, gS) = cand(Some(1000L))
        val (driftRows, dS) = timed(Similarity.bandBucketDrift(
          Similarity.lshSignaturesDf(corpus, 64), 64, 4, 1000L).count())
        println(s"""{"probe":"simguard","dir":"$dir","dense":$n,"unguarded_cands":$unN,"unguarded_secs":$unS,"capped_cands":$gN,"capped_secs":$gS,"drift_rows":$driftRows,"drift_secs":$dS}""")

      case "probeguard" =>
        // r16: the PROBE-side star-cap priced (VERDICT r15 top_next)
        // — the committed corpus is the dir's embeddings PLUS a
        // planted dense region of args(3) near-identical vectors,
        // signed into a SimSigIndex UNTIMED (corpus signing is the
        // one-time build cost by design); then a FIXED 100-vector
        // batch (50 landing inside the dense region's hot bucket, 50
        // background) probes it unguarded vs star-capped. Unguarded,
        // every dense batch member pulls the whole region as
        // candidates (50·n verifications — grows linearly with the
        // corpus-side region, the per-micro-batch cost a template
        // family inflicts forever); capped, each pulls the min-id rep
        // (50·1). Pair counts prove the shape, seconds price the cap.
        import graft.ops.{IndexCommit, SimSigIndex, Similarity}
        val n = args.lift(3).map(_.toInt).getOrElse(4000)
        val emb = Similarity.load(spark, dir).select("vec_id", "v")
        val dims = emb.select(size(col("v"))).head().getInt(0)
        def denseVecs(count: Int, idBase: Long, perturbBase: Int) =
          spark.range(count.toLong).select(
            (col("id") + idBase).as("vec_id"),
            array((0 until dims).map {
              case 0 => lit(1.0)
              case 1 => (col("id") + perturbBase).cast("double") * lit(1e-9)
              case _ => lit(0.0)
            }: _*).as("v"))
        val corpus = emb.unionByName(denseVecs(n, 100000000L, 0))
        val idx = s"$out/probeguard"
        IndexCommit.reset(spark, idx)
        SimSigIndex.build(spark, idx, corpus, planes = 64)
        val batch = denseVecs(50, 200000000L, n)
          .unionByName(emb.limit(50)
            .select((col("vec_id") + 300000000L).as("vec_id"), col("v")))
          .cache()
        batch.count()
        def probePairs(cap: Option[Long]): (Long, Double) = best(
          SimSigIndex.probe(spark, idx, batch, 0.9, 4,
            maxBandFreq = cap).count())
        val (unPairs, unS) = probePairs(None)
        val (gPairs, gS) = probePairs(Some(1000L))
        batch.unpersist()
        println(s"""{"probe":"probeguard","dir":"$dir","dense":$n,"unguarded_pairs":$unPairs,"unguarded_secs":$unS,"capped_pairs":$gPairs,"capped_secs":$gS}""")

      case "snapsubset" =>
        // r15: the point-lookup read priced — base + one delta staged
        // UNTIMED (corpus-proportional by design), then a FIXED
        // 20-doc readResolvedSubset vs the full readResolved. Subset
        // seconds and touched shard files must stay ~flat 1×→10×
        // (≤ |docs| × chain by the manifest prune); the full resolve
        // grows with the corpus by semantics.
        import spark.implicits._
        import graft.ops.CorpusSnapshot
        val root = s"$out/snapsub"
        graft.ops.IndexCommit.reset(spark, root)
        val base = docs.select(col("doc_id"), col("text"))
        CorpusSnapshot.publish(spark, base, root)
        CorpusSnapshot.publishDelta(spark,
          base.filter(col("doc_id") % 100 === 1)
            .select(col("doc_id"), concat(lit("v1 "), col("text"))
              .as("text")),
          base.filter(col("doc_id") % 100 === 2)
            .limit(50).select("doc_id"), root)
        val ids = (1L to 20L).map(_ * 97L)
        val sub = CorpusSnapshot.readResolvedSubset(spark, root, ids)
        val touched = sub.inputFiles.count(_.endsWith(".jsonl"))
        val totalFiles = graft.ops.IndexCommit.committedIds(spark, root)
          .map(v => CorpusSnapshot.manifest(spark, root, Some(v)).count())
          .sum
        val (nSub, subSecs) = best(
          CorpusSnapshot.readResolvedSubset(spark, root, ids).count())
        val (nFull, fullSecs) = best(
          CorpusSnapshot.readResolved(spark, root).count())
        println(s"""{"probe":"snapsubset","dir":"$dir","ids":${ids.size},"touched_files":$touched,"total_files":$totalFiles,"subset_docs":$nSub,"subset_secs":$subSecs,"full_docs":$nFull,"full_secs":$fullSecs}""")

      case "clusterlookup" =>
        // r15: ClusterIndex.lookup priced — the index built+appended
        // UNTIMED (corpus-proportional by design), then a FIXED
        // 20-doc lookup vs the full clusters read. Lookup seconds and
        // touched labels partitions must stay ~flat 1×→10× (driver
        // arithmetic + covering partitions only); the full read grows
        // with the corpus by semantics.
        import graft.ops.{ClusterIndex, IndexCommit}
        val idx = s"$out/cllookup"
        IndexCommit.reset(spark, idx)
        ClusterIndex.build(spark, dir, idx, maxDocFreq = Some(0.1),
          docFilter = Some(col("doc_id") % 10 =!= 0))
        ClusterIndex.append(spark, idx,
          docs.filter(col("doc_id") % 10 === 0))
        val ids = (1L to 20L).map(_ * 97L)
        val touched = ClusterIndex.lookup(spark, idx, ids).inputFiles
          .flatMap("/part=(\\d+)/".r.findFirstMatchIn(_)
            .map(_.group(1).toInt)).toSet.size
        val (nSub, subSecs) = best(
          ClusterIndex.lookup(spark, idx, ids).count())
        val (nFull, fullSecs) = best(
          ClusterIndex.clusters(spark, idx).count())
        println(s"""{"probe":"clusterlookup","dir":"$dir","ids":${ids.size},"touched_parts":$touched,"lookup_rows":$nSub,"lookup_secs":$subSecs,"full_rows":$nFull,"full_secs":$fullSecs}""")

      case "sigdebug" =>
        import graft.ops.{PerceptualHash, SigIndex}
        val idx = s"$out/sigdbg"
        SigIndex.build(spark, idx, PerceptualHash.signatures(
          PerceptualHash.syntheticImages(spark, dir)))
        val (n0, t0) = timed(SigIndex.sigs(spark, idx).count())
        val scope = new graft.ops.CacheScope
        val sigs = scope.cache(SigIndex.sigs(spark, idx))
        val (n1, t1) = timed(sigs.count())
        val classes = scope.cache(sigs.groupBy("sig")
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("rep")))
        val (n2, t2) = timed(classes.count())
        val repPairs = PerceptualHash.nearDupPairsOfSigs(
          classes.select(col("rep").as("doc_id"), col("sig")), 3, scope)
        val (n3, t3) = timed(repPairs.count())
        val comp = graft.ops.Dedup.connectedComponents(
          repPairs.select(col("doc_a").as("u"), col("doc_b").as("v")), scope)
        val (n4, t4) = timed(comp.count())
        val (n5, t5) = timed(SigIndex.clusters(spark, idx).count())
        scope.release()
        println(s"""{"probe":"sigdebug","dir":"$dir","sigs":$n0,"t_scan":$t0,"t_cache":$t1,"classes":$n2,"t_classes":$t2,"pairs":$n3,"t_pairs":$t3,"comps":$n4,"t_comp":$t4,"rows":$n5,"t_full":$t5}""")

      case "recall" =>
        val (rows, secs) = timed(
          graft.ops.Similarity.recallEval(spark, dir).collect())
        val rec = rows.map(r =>
          s""""q${r.getAs[Long]("query_id")}":${r.getAs[Double]("recall")}""")
          .mkString(",")
        val minR = rows.map(_.getAs[Double]("recall")).min
        println(s"""{"probe":"recall","dir":"$dir","secs":$secs,"min_recall":$minR,"recall":{$rec}}""")

      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
