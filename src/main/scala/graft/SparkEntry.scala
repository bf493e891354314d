package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Importer, Staging}
import graft.ops.{Archives, Avro, BloomIndex, Profiling, Proto, Bucketed, Chunking, Classifier, CorpusSnapshot, CrawlOps, Dedup, Incremental, LinkGraph,
  Encoding, EventOps, Filtering, KnIndex, LanguageModel, LshIndex, MediaHeaders,
  Multimodal, PerceptualHash, Relational, Robots, Scd, Similarity, Sitemap,
  Sketches, Frontier, TextOps, TrainPrep, UnigramLm, UrlOps, VectorIndex}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the parquet corpus in `dir`, with an equivalent
  * DuckDB oracle in [[oracleSql]] where the semantics are
  * SQL-expressible. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Fixed per-query scratch directory for index-build-probe queries:
    * `<java.io.tmpdir>/graft-scratch/<name>`. A fresh
    * `createTempDirectory` per invocation accumulated an index copy in
    * /tmp on every bench/verify run; a fixed path is simply
    * overwritten (every file under it is written with
    * `mode("overwrite")`), so repeated runs reuse the same bounded
    * footprint.
    */
  private def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-scratch", name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Pre-staged fixture root for the BENCH-split snapshot probe rows:
    * `stage` runs once per source CORPUS — the `STAGED_FOR` sidecar
    * records the source dir PLUS a cheap content fingerprint (row
    * count and max doc_id from a column-pruned scan), so a fixture
    * regenerated IN PLACE at the same path restages instead of
    * silently serving the old corpus's snapshot against a
    * new-corpus oracle. Absence or any mismatch forces a clean
    * restage; the sidecar is written LAST, so a present sidecar
    * always names a complete staging (a killed staging restages).
    * Bench reps and subsequent runs then time ONLY the probe, giving
    * the change-proportional resolve/diff legs a direct measurement
    * instead of riding behind a corpus-sized publish.
    */
  private def stagedSnapshotRoot(
      s: SparkSession, dir: String, name: String)(
      stage: String => Unit): String = {
    val root = scratchDir(s"staged_$name")
    val marker = java.nio.file.Paths.get(root, "STAGED_FOR")
    val fpRow = rd(s, dir, "documents")
      .agg(count(lit(1)), max(col("doc_id"))).head()
    // layout=2: manifests gained min_h/max_h/n_shards (the point-
    // lookup prune triple) in r15 — bumping the fingerprint re-stages
    // roots staged under the old manifest schema exactly once
    val want = s"$dir\n${fpRow.getLong(0)}\n${fpRow.getLong(1)}\nlayout=2"
    val current =
      if (java.nio.file.Files.exists(marker))
        new String(java.nio.file.Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8)
      else ""
    if (current != want) {
      java.nio.file.Files.deleteIfExists(marker)
      graft.ops.IndexCommit.reset(s, root)
      stage(root)
      java.nio.file.Files.write(marker,
        want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    root
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    mergeOrders(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Core reference semantics (J1/J4/A4/P1-P3, S7/O2, A1/A3)
  // ---------------------------------------------------------------------

  /** J1 flagship — keyed bulk UPDATE of `orders` from a derived delta:
    * urgent orders get a 10% price bump and status 'F'. The delta side
    * is broadcast; the target is never shuffled.
    */
  private def mergeOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = rd(s, dir, "orders")
    val delta = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(
        col("o_orderkey"),
        (col("o_totalprice") * expr("CAST(1.1 AS DOUBLE)")).as("o_totalprice"),
        lit("F").as("o_orderstatus"))
    Importer.merge(orders, delta,
      joinOn = Seq("o_orderkey"),
      subset = Seq("o_totalprice", "o_orderstatus"),
      tablePk = Seq("o_orderkey")).updated
  }

  /** S9/J1 upsert — the completed `insert` action (the reference
    * declares it and raises, `importer.py:361-362`): urgent orders are
    * UPDATED (the merge_orders delta) and synthetic new orders derived
    * from high-priority ones are INSERTED (keys offset past the corpus,
    * columns outside the subset null-filled). Both joins broadcast the
    * delta side; the insert leg's matched-key probe is a broadcast
    * semi join, so the target is never shuffled.
    */
  private def upsertOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = rd(s, dir, "orders")
    val updates = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(
        col("o_orderkey"),
        (col("o_totalprice") * expr("CAST(1.1 AS DOUBLE)")).as("o_totalprice"),
        lit("F").as("o_orderstatus"))
    val inserts = orders
      .filter(col("o_orderpriority") === "2-HIGH")
      .select(
        (col("o_orderkey") + lit(20000000L)).as("o_orderkey"),
        (col("o_totalprice") * expr("CAST(0.5 AS DOUBLE)")).as("o_totalprice"),
        lit("N").as("o_orderstatus"))
    new Importer(orders, updates.unionByName(inserts),
      tablePk = Seq("o_orderkey"),
      joinOn = Some(Seq("o_orderkey")),
      subset = Some(Seq("o_totalprice", "o_orderstatus")))
      .run(update = true, insert = true).updated
  }

  /** A4 both legs — updated/inserted row counts of the upsert. */
  private def upsertRowCounts(s: SparkSession, dir: String): DataFrame = {
    val orders = rd(s, dir, "orders")
    val updates = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(
        col("o_orderkey"),
        (col("o_totalprice") * expr("CAST(1.1 AS DOUBLE)")).as("o_totalprice"),
        lit("F").as("o_orderstatus"))
    val inserts = orders
      .filter(col("o_orderpriority") === "2-HIGH")
      .select(
        (col("o_orderkey") + lit(20000000L)).as("o_orderkey"),
        (col("o_totalprice") * expr("CAST(0.5 AS DOUBLE)")).as("o_totalprice"),
        lit("N").as("o_orderstatus"))
    val r = new Importer(orders, updates.unionByName(inserts),
      tablePk = Seq("o_orderkey"),
      joinOn = Some(Seq("o_orderkey")),
      subset = Some(Seq("o_totalprice", "o_orderstatus")))
      .run(update = true, insert = true)
    import s.implicits._
    Seq((r.rowCountUpdated, r.rowCountInserted))
      .toDF("row_count_updated", "row_count_inserted")
  }

  /** J1 + P3 — merge with null-keyed delta rows: rows whose key was
    * nulled out are dropped and their targets stay untouched
    * (`test_importer.py:166-189` semantics at fixture scale).
    */
  private def mergeCustomerNullKeys(s: SparkSession, dir: String): DataFrame = {
    val customer = rd(s, dir, "customer")
    val delta = customer
      .filter(col("c_custkey") <= 750)
      .select(
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_custkey"))
          .as("c_custkey"),
        (col("c_acctbal") + expr("CAST(100.0 AS DOUBLE)")).as("c_acctbal"))
    Importer.merge(customer, delta,
      joinOn = Seq("c_custkey"), subset = Seq("c_acctbal"),
      tablePk = Seq("c_custkey")).updated
  }

  /** A4 — affected-row count of the null-key merge, as a relation. */
  private def mergeRowCount(s: SparkSession, dir: String): DataFrame = {
    val customer = rd(s, dir, "customer")
    val delta = customer
      .filter(col("c_custkey") <= 750)
      .select(
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_custkey"))
          .as("c_custkey"),
        (col("c_acctbal") + expr("CAST(100.0 AS DOUBLE)")).as("c_acctbal"))
    val n = Importer.merge(customer, delta,
      joinOn = Seq("c_custkey"), subset = Seq("c_acctbal"),
      tablePk = Seq("c_custkey")).rowCountUpdated
    import s.implicits._
    Seq(n).toDF("row_count_updated")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1/S9 — the flagship keyed-update merge
    "merge_orders" -> ((s, dir) => mergeOrders(s, dir)),
    // S9 completion: MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
    // INSERT — the reference's declared-but-raising insert action
    "upsert_orders" -> ((s, dir) => upsertOrders(s, dir)),
    "upsert_row_counts" -> ((s, dir) => upsertRowCounts(s, dir)),
    // SCD Type-2: the historized merge — close old versions, open
    // new ones, attribute-identical deltas are no-ops
    "scd2_merge" -> ((s, dir) => Scd.scd2Customers(s, dir)),
    // J1 + P3 — null-key delta rows leave targets untouched
    "merge_customer_nullkeys" -> ((s, dir) => mergeCustomerNullKeys(s, dir)),
    // A4 — affected-row count
    "merge_row_count" -> ((s, dir) => mergeRowCount(s, dir)),
    // P1/P2 — projection + rename through the Importer slice contract
    "project_rename" -> ((s, dir) =>
      rd(s, dir, "customer").select(
        col("c_custkey").as("custkey"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"))),
    // P3 — null-key filter as a standalone operator
    "null_key_filter" -> ((s, dir) => {
      val withNulls = rd(s, dir, "orders").select(
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderkey"))
          .as("o_orderkey"),
        col("o_totalprice"))
      withNulls.na.drop("any", Seq("o_orderkey"))
    }),
    // A1/V10 — duplicate-key detection (lineitem's key genuinely repeats)
    "dup_key_detect" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),
    // O2/S7 — LIMIT 0 schema clone (staging DDL)
    "limit0_clone" -> ((s, dir) =>
      Staging.emptyClone(rd(s, dir, "lineitem"))),
    // A3 — first-occurrence distinct, pinned deterministically by min key
    "distinct_first" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(min("l_orderkey").as("first_key"))),
    // S4/S6/O1 — catalog column scan as a relation, oracled against
    // DuckDB's information_schema over the same parquet views
    "catalog_columns" -> ((s, dir) =>
      new Catalog(s, dir).columnsDf),

    // --- aggregation / join / set-op / top-k extensions (§2.4-2.6) ---
    "q1_pricing" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "q5_revenue" -> ((s, dir) => Relational.revenueByNation(s, dir)),
    "rollup_agg" -> ((s, dir) => Relational.rollupAgg(s, dir)),
    // regr_slope/intercept/r2 family over integer-cents moment sums:
    // exact at any shuffle width, doubles only in the final formula
    "stats_regression" -> ((s, dir) => Relational.regression(s, dir)),
    "cube_agg" -> ((s, dir) => Relational.cubeAgg(s, dir)),
    // pivot with an EXPLICIT value list (no distinct-value pre-scan)
    // and its inverse melt
    "pivot_status" -> ((s, dir) => Relational.pivotStatus(s, dir)),
    "unpivot_metrics" -> ((s, dir) => Relational.unpivotMetrics(s, dir)),
    // the EXISTS / NOT EXISTS join forms: key-only probe legs, no
    // fact-row amplification
    "semi_join" -> ((s, dir) => Relational.semiJoinUrgent(s, dir)),
    "anti_join" -> ((s, dir) => Relational.antiJoinPending(s, dir)),
    "percentiles" -> ((s, dir) => Relational.pricePercentiles(s, dir)),
    // GK-sketch estimates are engine-specific, so the query emits a
    // rank CERTIFICATE instead: exact per-group count + ok booleans
    // the oracle recomputes as literal TRUE (estimate feeds the
    // verdict, never the output)
    "percentiles_approx" -> ((s, dir) =>
      Relational.approxPricePercentiles(s, dir)),
    // deterministic bounded-state quantiles: |est − exact| ≤ width by
    // construction, and the estimate itself hash-matches cross-engine
    // (the property the t-digest row can never have)
    "percentiles_sketch" -> ((s, dir) =>
      Sketches.histogramPercentiles(s, dir)),
    "q6_selective" -> ((s, dir) => Relational.selectiveRevenue(s, dir)),
    "q3_shipping" -> ((s, dir) => Relational.shippingPriority(s, dir)),
    "string_funcs" -> ((s, dir) => Relational.stringFuncs(s, dir)),
    "date_funcs" -> ((s, dir) => Relational.dateFuncs(s, dir)),
    "grouping_sets" -> ((s, dir) => Relational.groupingSetsAgg(s, dir)),
    "dedup_counts" -> ((s, dir) => Relational.dedupCounts(s, dir)),
    // HLL estimate is engine-specific → the hashed columns are the
    // exact counts + a bound verdict (|HLL−exact| ≤ 0.15·exact) the
    // oracle emits as literal TRUE
    "dedup_approx" -> ((s, dir) => Relational.dedupApprox(s, dir)),
    "set_intersect" -> ((s, dir) => Relational.setIntersect(s, dir)),
    "set_except" -> ((s, dir) => Relational.setExcept(s, dir)),
    "set_union" -> ((s, dir) => Relational.setUnion(s, dir)),
    "top_orders" -> ((s, dir) => Relational.topOrders(s, dir)),
    "top_per_group" -> ((s, dir) => Relational.topPerGroup(s, dir)),

    // --- events: windows, sessionization, JSON (§2.6/§2.7) ---
    "events_window_rank" -> ((s, dir) => EventOps.windowRank(s, dir)),
    // time-series gap fill + LOCF forward fill on an epoch-µs grid,
    // and RANGE-frame trailing aggregates (the irregular-spacing
    // window ROWS frames can't express)
    "events_gapfill" -> ((s, dir) => EventOps.gapfillLocf(s, dir)),
    // EWMA smoothing + spike/dip labels: 12-decimal-rounded
    // recurrence over the calendar-bounded hour relation
    "events_ewma" -> ((s, dir) => EventOps.ewmaAnomaly(s, dir)),
    // day-of-week x hour-of-day seasonal baseline: residual vs 2-sigma
    // cell band, exact-count statistics, <=168-row broadcast back
    "events_seasonal" -> ((s, dir) => EventOps.seasonalAnomaly(s, dir)),
    // token-bucket admission per user: integer micro-token recurrence
    // over per-user sorted arrays, one user-keyed exchange
    "events_token_bucket" -> ((s, dir) => EventOps.tokenBucket(s, dir)),
    // first-order Markov transitions over per-user sequences: exact
    // counts, row-normalized probabilities, |types|^2 output
    "events_markov" -> ((s, dir) => EventOps.markovTransitions(s, dir)),
    "events_running" -> ((s, dir) => EventOps.runningTotals(s, dir)),
    // ordered funnel: chained gated window minima, one exchange
    "events_funnel" -> ((s, dir) => EventOps.funnel(s, dir)),
    // cohort retention matrix on epoch-week integers
    "events_retention" -> ((s, dir) => EventOps.retention(s, dir)),
    // sweep-line max concurrency: tie-free collapsed deltas, hour-
    // local prefix sums, carried offsets over O(hours) rows only
    "events_concurrency" -> ((s, dir) => EventOps.concurrency(s, dir)),
    "events_tumbling" -> ((s, dir) => EventOps.tumblingAgg(s, dir)),
    "events_sliding" -> ((s, dir) => EventOps.slidingAgg(s, dir)),
    "events_sessionize" -> ((s, dir) => EventOps.sessionize(s, dir)),
    "events_session_stats" -> ((s, dir) => EventOps.sessionStats(s, dir)),
    "events_range_join" -> ((s, dir) => EventOps.rangeJoinActiveSessions(s, dir)),
    "events_json" -> ((s, dir) => EventOps.jsonExtract(s, dir)),
    "events_asof" -> ((s, dir) => EventOps.asofLastPurchase(s, dir)),

    // --- LLM-pipeline: deduplication over documents ---
    "dedup_exact" -> ((s, dir) => Dedup.exactGroups(s, dir)),
    // skew guard active: shingles in >10% of docs are cut before the
    // candidate join — result-neutral here (corpus max df is 2%), a
    // must at 100 TB
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(s, dir, maxDocFreq = Some(0.1))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(s, dir, maxDocFreq = Some(0.1))),
    // pairs → connected components (large-star/small-star) → canonical
    // keep-set; the last mile of a dedup pipeline
    "dedup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(s, dir, maxDocFreq = Some(0.1))),
    // the deduplicated corpus itself: keep-set applied
    "dedup_filtered" -> ((s, dir) =>
      Dedup.dedupedCorpus(s, dir, maxDocFreq = Some(0.1))),
    // persisted cluster index, built on the doc_id %10≠0 carve with
    // the %10=0 batch APPENDED (probe + label-graph merge): the read
    // back must equal the one-job clusters over the whole corpus —
    // append ≡ build(A∪B), oracled
    "dedup_clusters_index" -> ((s, dir) => {
      val idx = scratchDir("clusteridx")
      graft.ops.IndexCommit.reset(s, idx)
      graft.ops.ClusterIndex.build(s, dir, idx, maxDocFreq = Some(0.1),
        docFilter = Some(col("doc_id") % 10 =!= 0))
      graft.ops.ClusterIndex.append(s, idx,
        rd(s, dir, "documents").filter(col("doc_id") % 10 === 0))
      graft.ops.ClusterIndex.clusters(s, idx)
    }),
    // POINT LOOKUP into the committed assignment — the serving-path
    // read ("is this doc a dup? what's its canonical id?"): the index
    // staged once per source dir (STAGED_FOR; build + append carves,
    // so the lookup crosses partial-version doclist resolution), the
    // timed unit reads ONLY the doc-range labels partitions covering
    // the fixed %101=5 id set. Shared-relation oracle: the one-job
    // cluster oracle restricted to the same set.
    "dedup_clusters_lookup" -> ((s, dir) => {
      val root = stagedSnapshotRoot(s, dir, "clidxlookup") { r =>
        graft.ops.ClusterIndex.build(s, dir, r, maxDocFreq = Some(0.1),
          docFilter = Some(col("doc_id") % 10 =!= 0))
        graft.ops.ClusterIndex.append(s, r,
          rd(s, dir, "documents").filter(col("doc_id") % 10 === 0))
        ()
      }
      // a FIXED 20-id set, not a corpus-proportional one: the
      // point-lookup contract is driver-known ids, and a set stepping
      // the whole doc domain would touch every partition — the timed
      // unit must price the PRUNED read (ids beyond a small corpus
      // resolve absent, matching the oracle's bound)
      graft.ops.ClusterIndex.lookup(s, root,
        (0 until 20).map(i => 5L + 101L * i))
    }),
    // downstream consumers PROBING the committed assignment instead
    // of re-deriving the LSH→components subtree (one doc-keyed join
    // each); share the one-job oracles
    "dedup_filtered_indexed" -> ((s, dir) => {
      val idx = scratchDir("clfidx")
      graft.ops.IndexCommit.reset(s, idx)
      graft.ops.ClusterIndex.build(s, dir, idx, maxDocFreq = Some(0.1))
      graft.ops.ClusterIndex.filteredCorpus(s, dir, idx)
    }),
    "dedup_best_rep_indexed" -> ((s, dir) => {
      val idx = scratchDir("clbidx")
      graft.ops.IndexCommit.reset(s, idx)
      graft.ops.ClusterIndex.build(s, dir, idx, maxDocFreq = Some(0.1))
      graft.ops.ClusterIndex.bestRepresentatives(s, dir, idx)
    }),
    // reproducible per-stratum sampling (hash pre-filter + rank)
    "sample_stratified" -> ((s, dir) => Relational.stratifiedSample(s, dir)),
    "corpus_diff" -> ((s, dir) => Relational.corpusDiff(s, dir)),
    // deterministic training-export sharding (md5 shard + dense pos)
    "corpus_shard" -> ((s, dir) => Relational.shardAssignments(s, dir)),
    // snapshot-manifest export (publish + manifest read in one timed
    // unit): two versions staged+committed under marker protocol into
    // a scratch root, then the FIRST version's per-shard file stats
    // read back through its manifest — the oracle recomputes the
    // byte-exact layout (shard, size-capped file_seq, line bytes)
    // closed-form from the same carve
    "corpus_snapshot_read" -> ((s, dir) => {
      val root = scratchDir("snapread")
      val (v0, _) = CorpusSnapshot.publishFixture(s, dir, root)
      CorpusSnapshot.manifest(s, root, Some(v0))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_files"),
          sum("n_docs").cast("long").as("n_docs"),
          sum("n_bytes").cast("long").as("n_bytes"),
          min("min_doc").as("min_doc"), max("max_doc").as("max_doc"))
    }),
    // incremental snapshot versioning: base full publish (%7≠0 carve),
    // then ONE delta version carrying only the day's changes — adds
    // (%7=0 ∧ %3=0), edits (uppercase the base's %11=0 docs) and
    // tombstones (%13=0 ∧ %11≠0 of the base) — resolved by
    // last-writer-wins chain read; the corpus-sized base is staged
    // once, the delta stages only its own rows
    "corpus_snapshot_delta" -> ((s, dir) => {
      val root = scratchDir("snapdelta")
      graft.ops.IndexCommit.reset(s, root)
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      CorpusSnapshot.publish(s, docs.filter(col("doc_id") % 7 =!= 0), root)
      val changes = docs
        .filter(col("doc_id") % 7 === 0 && col("doc_id") % 3 === 0)
        .unionByName(docs
          .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 === 0)
          .select(col("doc_id"), upper(col("text")).as("text")))
      val removed = docs
        .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 13 === 0 &&
          col("doc_id") % 11 =!= 0)
        .select("doc_id")
      CorpusSnapshot.publishDelta(s, changes, removed, root)
      CorpusSnapshot.readResolved(s, root)
        .select(col("doc_id"), md5(col("text")).as("digest"))
    }),
    // snapshot diff driven by the PUBLISHED snapshots (time-travel
    // read of both versions, base64 decode, content-hash classify) —
    // shares corpus_diff's oracle because the fixture carves match
    "corpus_snapshot_diff" -> ((s, dir) => {
      val root = scratchDir("snapdiff")
      val (v0, v1) = CorpusSnapshot.publishFixture(s, dir, root)
      CorpusSnapshot.diff(s, root, v0, v1)
    }),
    // BENCH-split probe rows (r13 verdict #5): the rows above stage a
    // corpus-sized base INSIDE their timed unit, so their bench/scale
    // numbers measure publish throughput, not the change-proportional
    // resolve/diff the delta design exists for. These rows stage the
    // SAME fixtures once per source dir into a persistent scratch
    // root (STAGED_FOR sidecar; reps and later runs find it staged)
    // and time only the probe — shared oracles, isolated cost
    "corpus_snapshot_resolve" -> ((s, dir) => {
      val root = stagedSnapshotRoot(s, dir, "snapresolve") { r =>
        val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        CorpusSnapshot.publish(s, docs.filter(col("doc_id") % 7 =!= 0), r)
        val changes = docs
          .filter(col("doc_id") % 7 === 0 && col("doc_id") % 3 === 0)
          .unionByName(docs
            .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 === 0)
            .select(col("doc_id"), upper(col("text")).as("text")))
        val removed = docs
          .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 13 === 0 &&
            col("doc_id") % 11 =!= 0)
          .select("doc_id")
        CorpusSnapshot.publishDelta(s, changes, removed, r)
        ()
      }
      CorpusSnapshot.readResolved(s, root)
        .select(col("doc_id"), md5(col("text")).as("digest"))
    }),
    "corpus_snapshot_diff_probe" -> ((s, dir) => {
      val root = stagedSnapshotRoot(s, dir, "snapdiffp") { r =>
        CorpusSnapshot.publishFixture(s, dir, r)
        ()
      }
      val ids = graft.ops.IndexCommit.committedIds(s, root)
      CorpusSnapshot.diff(s, root, ids(0), ids(1))
    }),
    // POINT-LOOKUP time travel over the SAME staged base+delta chain
    // as corpus_snapshot_resolve: a fixed arithmetic doc set
    // (doc_id % 101 = 5) resolved through manifest pruning — the
    // driver computes each id's shard and position hash and opens
    // only the covering shard files (≤ |docs| per chain member; the
    // plan's touched-files audit is spec-pinned). Shared-relation
    // oracle: the full resolve's rows restricted to the same set.
    "corpus_snapshot_resolve_subset" -> ((s, dir) => {
      val root = stagedSnapshotRoot(s, dir, "snapresolve") { r =>
        val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        CorpusSnapshot.publish(s, docs.filter(col("doc_id") % 7 =!= 0), r)
        val changes = docs
          .filter(col("doc_id") % 7 === 0 && col("doc_id") % 3 === 0)
          .unionByName(docs
            .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 === 0)
            .select(col("doc_id"), upper(col("text")).as("text")))
        val removed = docs
          .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 13 === 0 &&
            col("doc_id") % 11 =!= 0)
          .select("doc_id")
        CorpusSnapshot.publishDelta(s, changes, removed, r)
        ()
      }
      // a FIXED 20-id point set (ids 5, 106, …, 1924): driver-known,
      // constant-size at any sf — a set stepping the whole doc domain
      // would cover every shard and the prune this row exists to
      // price would never engage (absent ids resolve absent, matching
      // the oracle's doc_id <= 1924 bound)
      CorpusSnapshot.readResolvedSubset(s, root,
        (0 until 20).map(i => 5L + 101L * i))
        .select(col("doc_id"), md5(col("text")).as("digest"))
    }),
    // benchmark 8-gram decontamination; benchmark grams broadcast
    "decontaminate" -> ((s, dir) => Dedup.contamination(s, dir)),
    // same hygiene pass probed through an 8 KB Bloom bitmap: zero
    // corpus-side exchanges, false positives deterministic + oracled
    "decontaminate_bloom" -> ((s, dir) => Dedup.bloomContamination(s, dir)),
    // the PERSISTED form: benchmark ingested once into the on-disk
    // filter, the corpus batch probes it — same oracle as the one-job
    // form because the filter round-trip is lossless
    "decontaminate_index_probe" -> ((s, dir) => {
      val idx = scratchDir("bloomidx")
      val isBench = col("doc_id") % 50 === 0
      BloomIndex.build(s, rd(s, dir, "documents").filter(isBench), idx)
      BloomIndex.probe(s, idx, rd(s, dir, "documents").filter(!isBench))
    }),
    // incremental ingestion: half the benchmark at build, half
    // appended — Bloom union is word-wise OR, so the probe equals the
    // one-job result BIT-FOR-BIT and shares its oracle (the equality
    // the LSH index can only claim under guard-coincidence caveats)
    "decontaminate_incremental" -> ((s, dir) => {
      val idx = scratchDir("bloomidx_inc")
      val docs = rd(s, dir, "documents")
      BloomIndex.build(s, docs.filter(col("doc_id") % 100 === 0), idx)
      BloomIndex.append(s, docs.filter(
        col("doc_id") % 50 === 0 && col("doc_id") % 100 =!= 0), idx)
      BloomIndex.probe(s, idx, docs.filter(col("doc_id") % 50 =!= 0))
    }),
    // SimHash pairs: md5-derived token bits, so the full pipeline
    // (bits → signed sums → signature → hamming pairs) has a DuckDB
    // oracle; the pigeonhole banding is complete at maxDist=3, so the
    // oracle computes all-pairs hamming directly
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    // typo-level edit-distance pairs: FastSS deletion-neighborhood
    // candidates + exact levenshtein verify; oracle brute-forces n^2
    "dedup_edit" -> ((s, dir) => Dedup.editDistancePairs(s, dir)),
    // shuffle-skew diagnostic: df quantiles + hottest gram keys with
    // mass shares — the pre-join report the salting guards exist for
    "skew_report" -> ((s, dir) => Dedup.skewReport(s, dir)),
    // exact-substring duplication (windowed ExactSubstr): md5-keyed
    // 16-token windows, one gram-keyed + one doc-keyed shuffle
    "dedup_substring" -> ((s, dir) => Dedup.substringDupStats(s, dir)),
    // same semantics via the PERSISTED window index (tokenize-once):
    // built on the doc_id %10≠0 carve, the %10=0 batch APPENDED
    // (batch-only tokenize), stats derived from the frozen hashes —
    // append ≡ build(A∪B), shared oracle with the one-job form
    "dedup_substring_index" -> ((s, dir) => {
      val idx = scratchDir("substridx")
      graft.ops.SubstrIndex.build(s, dir, idx,
        docFilter = Some(col("doc_id") % 10 =!= 0))
      graft.ops.SubstrIndex.append(s, idx,
        rd(s, dir, "documents").filter(col("doc_id") % 10 === 0))
      graft.ops.SubstrIndex.stats(s, idx)
    }),
    // the PROBE form: batch flags against corpus∪batch computed
    // WITHOUT ingesting or re-scoring the corpus — batch-only
    // tokenize, committed per-segment df sidecars pruned against the
    // batch hash set (the LshIndex.probe economics for ExactSubstr)
    "dedup_substring_probe" -> ((s, dir) => {
      val idx = scratchDir("substrprobe")
      graft.ops.SubstrIndex.build(s, dir, idx,
        docFilter = Some(col("doc_id") % 10 =!= 0))
      graft.ops.SubstrIndex.probe(s, idx,
        rd(s, dir, "documents").filter(col("doc_id") % 10 === 0))
    }),
    // index-reuse ingestion: new batch (doc_id % 10 == 0) probed
    // against the corpus's band buckets only — candidate volume is
    // batch-proportional, never a corpus self-join
    "dedup_incremental" -> ((s, dir) =>
      Dedup.incrementalDedupPairs(s, dir, maxDocFreq = Some(0.1))),
    // same semantics via the PERSISTED index (build + probe in one
    // timed unit): the corpus side is banded once and written to
    // parquet, the batch probes it — LshIndexSpec pins probe==one-job
    // equality, and this row pins both against the DuckDB oracle
    "dedup_index_probe" -> ((s, dir) => {
      val idx = scratchDir("lshidx")
      val isBatch = col("doc_id") % 10 === 0
      LshIndex.build(s, dir, idx, maxDocFreq = Some(0.1),
        docFilter = Some(!isBatch))
      LshIndex.probe(s, idx,
        s.read.parquet(s"$dir/documents.parquet").filter(isBatch))
    }),

    // guard-staleness telemetry (the rebuild-now signal): the index is
    // built on the raw corpus (hot set frozen), then a batch with a
    // DIVERGENT shared 6-token banner is appended — the 4 full-banner
    // shingles ride every batch doc, cross the maxDocFreq cutoff over
    // the grown corpus, and are invisible to the frozen guard; the
    // report is their exact df histogram + candidate-pair impact
    "lsh_guard_drift" -> ((s, dir) => {
      val idx = scratchDir("lshdrift")
      LshIndex.build(s, dir, idx, maxDocFreq = Some(0.1))
      val banner = "zq0 zq1 zq2 zq3 zq4 zq5 "
      LshIndex.append(s, idx,
        rd(s, dir, "documents").filter(col("doc_id") % 5 === 3)
          .select((col("doc_id") + lit(30000000L)).as("doc_id"),
            concat(lit(banner), col("text")).as("text")))
      LshIndex.guardDrift(s, idx, maxDocFreq = 0.1)
    }),
    // consolidated duplicate report: one shingle scan feeds the
    // jaccard family; exact + simhash join in; per-pair detector flags
    "dedup_report" -> ((s, dir) =>
      Dedup.dedupReport(s, dir, maxDocFreq = Some(0.1))),
    // asymmetric containment: |A∩B|/|A| — catches small-doc-quoted-
    // in-large-doc duplication that the Jaccard union-normalizer hides
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(s, dir, threshold = 0.7,
        maxDocFreq = Some(0.1))),

    // --- LLM-pipeline: text analysis over documents ---
    "text_tokens" -> ((s, dir) => TextOps.tokenCounts(s, dir)),
    "text_quality" -> ((s, dir) => TextOps.qualityScores(s, dir)),
    "text_langid" -> ((s, dir) => TextOps.langId(s, dir)),
    "text_fingerprint" -> ((s, dir) => TextOps.fingerprints(s, dir)),
    "text_bm25" -> ((s, dir) => TextOps.bm25(s, dir)),
    // Gopher-shaped repetition signals: one scan, one explode, 2- and
    // 3-gram stats ride the same keyed aggregation
    "text_repetition" -> ((s, dir) => TextOps.repetitionScores(s, dir)),
    // corpus vocabulary: wordcount + doc frequency, top-k by count
    "corpus_vocab" -> ((s, dir) => TextOps.vocabTopK(s, dir)),
    "text_pii_scrub" -> ((s, dir) => TextOps.piiScrub(s, dir)),
    // sentence segmentation stats: RE2-safe terminator runs, zero
    // exchanges, per-doc count/length/fingerprint
    "text_sentences" -> ((s, dir) => TextOps.sentences(s, dir)),
    // Flesch reading ease: exact integer counts, final double formula
    "text_readability" -> ((s, dir) => TextOps.readability(s, dir)),
    // PMI collocations: exact bigram/unigram counts, fixed-order
    // probability ratios, 12-decimal log — deterministic top-30
    "corpus_pmi" -> ((s, dir) => TextOps.pmiCollocations(s, dir)),
    // per-source distinguishing terms: source-level TF-IDF, keyed
    // top-5 window (WindowGroupLimit shape), exact counts
    "corpus_tfidf" -> ((s, dir) => TextOps.tfidfTopTerms(s, dir)),
    // unigram-LM surprisal: decimal-mediated mean, token-keyed joins
    "text_surprisal" -> ((s, dir) => TextOps.surprisal(s, dir)),
    // CCNet-style KN 5-gram LM perplexity: trained in-engine on the
    // hash-stable train split, every doc scored via nine n-gram-keyed
    // joins, head/middle/tail buckets on fixed nll cuts
    "text_perplexity" -> ((s, dir) => LanguageModel.knPerplexity(s, dir)),
    // the KN model PERSISTED (train + publish + frozen-model batch
    // scoring in one timed unit): the batch is doc_id % 10 == 0,
    // scored against the committed count relations — results must
    // equal the one-job query's rows for those docs
    "text_perplexity_index" -> ((s, dir) => {
      val idx = scratchDir("knidx")
      graft.ops.IndexCommit.reset(s, idx)
      KnIndex.build(s, dir, idx)
      KnIndex.score(s, idx,
        s.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 10 === 0))
    }),
    // textcat-style char-trigram language ID: per-lang rank profiles
    // from the train split, out-of-place distance, exact integers
    "text_langid_ngram" -> ((s, dir) => TextOps.langIdNgram(s, dir)),
    // BPE first-merge pair statistics: corpus touched once (wordcount),
    // everything after is vocabulary-sized
    "corpus_bpe_pairs" -> ((s, dir) => TextOps.bpePairs(s, dir)),
    // full iterative BPE train: k rounds of argmax + vocabulary
    // rewrite, one 1-row collect per round; the oracle replays the
    // same k merges through chained CTEs
    "corpus_bpe_train" -> ((s, dir) => TextOps.bpeTrain(s, dir)),
    // tokenize-apply: corpus token frequencies after the k merges
    "corpus_bpe_tokenize" -> ((s, dir) => TextOps.bpeTokens(s, dir)),
    // WordPiece-style greedy max-munch over top-words + alphabet
    // vocab; segmentation on the distinct-word relation only
    "corpus_wordpiece" -> ((s, dir) => TextOps.wordpieceTokens(s, dir)),
    // SentencePiece-style unigram-LM tokenizer: substring seed,
    // hard-EM Viterbi rounds, prune+apply; corpus touched once, the
    // oracle replays every lattice argmax through per-position CTEs
    "corpus_unigram_lm" -> ((s, dir) => UnigramLm.unigramPieces(s, dir)),
    // composite keep/drop verdict with per-rule drop reasons; costs
    // exactly one text_repetition (signals ride the same exchanges)
    "quality_filter" -> ((s, dir) => Filtering.qualityFilter(s, dir)),
    // heuristics ∧ CCNet LM gate in one verdict relation: r_lm is the
    // perplexity bucket ≠ tail, lm_tail appends to drop_reasons
    "quality_filter_lm" -> ((s, dir) => Filtering.qualityFilterLm(s, dir)),
    // the SAME verdict scored through the PERSISTED KN index (train +
    // publish + frozen-model scoring in one timed unit): scoreWith is
    // the shared scoring path, so the output is bit-identical to the
    // inline form and the two queries share one oracle — this is the
    // delta-economics form (the model never retrains per run)
    "quality_filter_lm_indexed" -> ((s, dir) => {
      val idx = scratchDir("qflmidx")
      graft.ops.IndexCommit.reset(s, idx)
      KnIndex.build(s, dir, idx)
      Filtering.qualityFilterLmIndexed(s, dir, idx)
    }),
    // one-scan column profiling: exact distinct/nulls/min/max and a
    // deterministically tie-broken top value per column
    "profile_columns" -> ((s, dir) => Profiling.profileColumns(s, dir)),
    // per-column Shannon entropy (raw + ln(k)-normalized): 12-decimal
    // ln terms summed as DECIMAL(28,12) — layout-independent
    "profile_entropy" -> ((s, dir) => Profiling.columnEntropy(s, dir)),
    // Deequ-shaped expectation suite: uniqueness, completeness,
    // range, and cross-table referential integrity, exact metrics
    "check_expectations" ->
      ((s, dir) => Profiling.checkExpectations(s, dir)),
    // per-source PSI drift score vs the corpus length distribution;
    // 12-decimal log mediation makes the transcendental score exact
    "drift_psi" -> ((s, dir) => Filtering.driftPsi(s, dir)),
    // train<-test n-gram leakage audit over the hash-stable split
    "leakage_split" -> ((s, dir) => Filtering.splitLeakage(s, dir)),

    // --- LLM-pipeline: training-export preparation ---
    // hash-stable train/val/test membership (87.5/6.25/6.25)
    "split_assign" -> ((s, dir) => TrainPrep.splitAssign(s, dir)),
    // concat-and-chunk packing into 2048-token contexts, per shard
    "pack_sequences" -> ((s, dir) => TrainPrep.packSequences(s, dir)),
    // the per-(doc, pack) segment table: in-pack offset + length of
    // every document slice — what the loader's attention mask reads
    "pack_segments" -> ((s, dir) => TrainPrep.packSegments(s, dir)),
    // per-source sampling weights toward a uniform domain mix
    "mix_weights" -> ((s, dir) => TrainPrep.mixWeights(s, dir)),
    // the weights APPLIED: deterministic uniform-mix sampled export
    "mix_apply" -> ((s, dir) => TrainPrep.mixApply(s, dir)),
    // length-weighted Bernoulli sampling off an md5-derived uniform
    "sample_weighted" -> ((s, dir) => TrainPrep.weightedSample(s, dir)),
    // per-domain contribution cap by salted-hash rank (WindowGroupLimit)
    "domain_cap" -> ((s, dir) => TrainPrep.domainCap(s, dir)),
    // fill a token budget with the best-ranked docs: global running
    // total via the two-level prefix sum (bucket-keyed window +
    // broadcast triangle join over bucket totals) — no SinglePartition
    "budget_select" -> ((s, dir) => TrainPrep.budgetSelect(s, dir)),
    // quality-argmax survivor per near-dup cluster (vs the min-id
    // default): doc-keyed join + component-keyed WindowGroupLimit
    "dedup_best_rep" -> ((s, dir) =>
      Dedup.bestRepresentatives(s, dir, maxDocFreq = Some(0.1))),
    // easy->hard curriculum: ntile-equivalent phases off a two-level
    // global rank (bucket windows + broadcast count offsets), salted
    // md5 within-phase shuffle key — no corpus-wide window anywhere
    "curriculum_phases" -> ((s, dir) => TrainPrep.curriculumPhases(s, dir)),
    // corpus-growth telemetry: distinct-shingle mass the 20% delta
    // adds, by HLL register merge — v2 registers = v1 regs MAX delta
    // regs, both parts scanned once (the SketchIndex economics)
    "corpus_growth" -> ((s, dir) => Sketches.hllGrowth(s, dir)),
    // KMV distinct-token sketch: deterministic (unlike HLL), so the
    // sketch AND its estimate are oracle-able bit-for-bit
    "corpus_kmv" -> ((s, dir) => Sketches.kmvDistinctTokens(s, dir)),
    // KMV as a persisted index: k-minima state, set-union + re-rank
    // append (idempotent), same oracle as the one-job sketch
    "corpus_kmv_index" -> ((s, dir) => {
      val path = scratchDir("kmvidx")
      graft.ops.IndexCommit.reset(s, path)
      val d = rd(s, dir, "documents")
      graft.ops.SketchIndex.buildKmv(s, d.filter(col("doc_id") % 2 === 0), path)
      graft.ops.SketchIndex.appendKmv(s, path, d.filter(col("doc_id") % 2 === 1))
      graft.ops.SketchIndex.kmvSketch(s, path)
    }),
    // from-scratch HLL over 3-shingles: md5-derived registers, the
    // harmonic denominator kept EXACT as 2^51-scaled int64, the
    // __all__ row a true register-max merge — the whole sketch
    // replayable in SQL, unlike approx_count_distinct's
    "corpus_hll" -> ((s, dir) => Sketches.hllDistinctShingles(s, dir)),
    // the same registers through the native TypedImperativeAggregate
    // (hll_regs): map-side 1-KB buffers, pointwise-max partial merge —
    // the custom-aggregate extension point, driver-gated on the same
    // oracle as the declarative path
    "corpus_hll_native" ->
      ((s, dir) => Sketches.hllDistinctShinglesNative(s, dir)),
    // count-min grid (4×64) probed for the exact top-20 tokens, with
    // the one-sided error (overcount >= 0) carried per row — all int64
    "corpus_cms" -> ((s, dir) => Sketches.cmsHeavyHitters(s, dir)),
    // the PERSISTED sketch indexes: build on the even-doc carve,
    // fold the odd-doc carve in by the sketch's own union merge
    // (register max / counter add) — the result must equal one job
    // over the full corpus, so both share their one-job oracle
    "corpus_hll_index" -> ((s, dir) => {
      val path = scratchDir("hllidx")
      graft.ops.IndexCommit.reset(s, path)
      val d = rd(s, dir, "documents")
      graft.ops.SketchIndex.buildHll(s, d.filter(col("doc_id") % 2 === 0), path)
      graft.ops.SketchIndex.appendHll(s, path, d.filter(col("doc_id") % 2 === 1))
      graft.ops.SketchIndex.hllSketch(s, path)
    }),
    "corpus_cms_index" -> ((s, dir) => {
      val path = scratchDir("cmsidx")
      graft.ops.IndexCommit.reset(s, path)
      val d = rd(s, dir, "documents")
      graft.ops.SketchIndex.buildCms(s, d.filter(col("doc_id") % 2 === 0), path)
      graft.ops.SketchIndex.appendCms(s, path, d.filter(col("doc_id") % 2 === 1))
      graft.ops.SketchIndex.cmsProbe(s, path,
        Sketches.cmsTopTokens(Sketches.cmsTokensOf(d), 20))
    }),
    // sentence-aware chunking: greedy sentence packing into a token
    // budget via a row-local aggregate fold — boundaries never split
    // a sentence (the sliding-window variant is CrawlOps.docChunks
    // under "doc_chunks"), plan has zero exchanges
    "doc_chunks_sentences" -> ((s, dir) => Chunking.sentenceChunks(s, dir)),

    // --- LLM-pipeline: similarity search over embeddings ---
    "sim_norms" -> ((s, dir) => Similarity.norms(s, dir)),
    // JL Rademacher projection: fixed md5-derived sign matrix,
    // row-local dot folds, zero exchanges
    "sim_projection" -> ((s, dir) => Similarity.randomProjection(s, dir)),
    "sim_topk" -> ((s, dir) => Similarity.cosineTopK(s, dir)),
    // ANN paths: fully oracled — the md5-derived LSH coefficients and
    // the IVF centroid math are computable in plain SQL, so DuckDB
    // reproduces signatures, candidates, scores, and ranks end-to-end;
    // recall vs the brute-force baseline is pinned in DedupSpec
    "sim_ann_lsh" -> ((s, dir) => Similarity.annTopK(s, dir)),
    "sim_ann_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    // multi-probe IVF scored against SQ8 codes (ADC): candidates are
    // read as int8, the cosine's dequantization factor cancels
    // exactly, and the float column never enters the serving path
    "sim_ann_ivf_adc" -> ((s, dir) => Similarity.ivfAdcTopK(s, dir)),
    // recall@10 of the ADC path vs brute-force ground truth, as an
    // oracled query — the continuous ANN-health metric, exact ratios
    "sim_recall_eval" -> ((s, dir) => Similarity.recallEval(s, dir)),
    // dominant principal direction by 3 power iterations: native dot
    // against the literal direction, per-dim decimal-mediated sums,
    // 64-row per-round collects — the ITERATED loadings hash-match
    "sim_pca" -> ((s, dir) => Similarity.pcaTopComponent(s, dir)),
    // the twin plant is a FIXTURE concern and lives here, not in the
    // operator: the raw corpus has no pairs at 0.9, so the oracle
    // would be vacuous without it, but a production caller of
    // cosineNearDupPairs must get exactly its own vectors
    "sim_near_dup" -> ((s, dir) =>
      Similarity.cosineNearDupPairsDf(
        Similarity.loadWithTwins(s, dir), threshold = 0.9,
        numPlanes = 64, numBands = 4)),
    // bounded-output cluster form of the embedding near-dup graph:
    // bit-identical vectors collapse to one representative BEFORE the
    // banded join (interchangeable vertices — cosine exactly 1 to
    // each other, identical signatures and scores elsewhere), so a
    // mirrored-document class of n identical embeddings costs n rows,
    // never C(n,2) pair outputs (the pair form is inherently
    // Ω(output) — SCALE_r13 §2's video blow-up applies verbatim)
    "sim_clusters" -> ((s, dir) =>
      Similarity.cosineNearDupClustersDf(
        Similarity.loadWithTwins(s, dir), threshold = 0.9,
        numPlanes = 64, numBands = 4)),
    // same rows answered FROM the committed hyperplane-signature
    // index: the corpus is signed once into SimSigIndex segments
    // (build + append carves, union = everything) and the clustering
    // reads frozen (vec_id, sig) rows — plan-pinned free of the
    // hyperplane projection (SimSigIndexSpec); shared oracle
    "sim_clusters_index" -> ((s, dir) => {
      val idx = scratchDir("simsigidx_cl")
      val emb = Similarity.loadWithTwins(s, dir)
      graft.ops.SimSigIndex.build(s, idx,
        emb.filter(col("vec_id") % 3 =!= 0), planes = 64)
      graft.ops.SimSigIndex.append(s, idx,
        emb.filter(col("vec_id") % 3 === 0))
      graft.ops.SimSigIndex.clusters(s, idx, threshold = 0.9, numBands = 4)
    }),
    // the batch-probe form (dedup_index_probe's economics for
    // embeddings): corpus = everything except the %100=7 originals
    // (their planted twins INCLUDED — the positive path crosses the
    // carve), built + appended once; the batch signs only itself and
    // probes the committed segments for batch↔corpus pairs
    "sim_sig_index_probe" -> ((s, dir) => {
      val idx = scratchDir("simsigidx_probe")
      val emb = Similarity.loadWithTwins(s, dir)
      val isBatch = col("vec_id") % 100 === 7 &&
        col("vec_id") < graft.ops.PerceptualHash.TwinOffset
      val corpus = emb.filter(!isBatch)
      graft.ops.SimSigIndex.build(s, idx,
        corpus.filter(col("vec_id") % 3 =!= 0), planes = 64)
      graft.ops.SimSigIndex.append(s, idx,
        corpus.filter(col("vec_id") % 3 === 0))
      graft.ops.SimSigIndex.probe(s, idx, emb.filter(isBatch),
        threshold = 0.9, numBands = 4)
    }),
    // the probe-side hot-band guard LIVE on the oracled surface
    // (VERDICT r15 top_next): the build commits a GuardMeta default
    // cap of 1, so EVERY corpus band bucket holding 2+ vectors is
    // star-capped to its min-id representative — the probe resolves
    // the committed default (no per-call knob) and returns the
    // verified subset the oracle recomputes from the same banding
    "sim_sig_index_probe_guarded" -> ((s, dir) => {
      val idx = scratchDir("simsigidx_probe_g")
      val emb = Similarity.loadWithTwins(s, dir)
      val isBatch = col("vec_id") % 100 === 7 &&
        col("vec_id") < graft.ops.PerceptualHash.TwinOffset
      val corpus = emb.filter(!isBatch)
      graft.ops.SimSigIndex.build(s, idx,
        corpus.filter(col("vec_id") % 3 =!= 0), planes = 64,
        guardMaxBandFreq = Some(1L))
      graft.ops.SimSigIndex.append(s, idx,
        corpus.filter(col("vec_id") % 3 === 0))
      graft.ops.SimSigIndex.probe(s, idx, emb.filter(isBatch),
        threshold = 0.9, numBands = 4)
    }),
    // hot-band drift telemetry from the committed signature index —
    // the embedding sibling of the text side's skew_report/maxDocFreq
    // machinery: band buckets whose population exceeds the cap, as an
    // identity-free (bucket_size, n_keys, worst_case_pairs) histogram
    // = the candidate volume a dense near-identical region would feed
    // an unguarded self-join (the star-cap in cosineNearDupPairsOfSigs
    // is the remedy the report sizes). Answered from frozen sigs —
    // zero vector bytes touched. Cap 1 keeps the fixture non-vacuous
    // (natural + twin collisions at this scale); production caps are
    // thousands.
    "sim_guard_drift" -> ((s, dir) => {
      val idx = scratchDir("simsigidx_drift")
      val emb = Similarity.loadWithTwins(s, dir)
      graft.ops.SimSigIndex.build(s, idx,
        emb.filter(col("vec_id") % 3 =!= 0), planes = 64)
      graft.ops.SimSigIndex.append(s, idx,
        emb.filter(col("vec_id") % 3 === 0))
      graft.ops.SimSigIndex.guardDrift(s, idx, maxBandFreq = 1L,
        numBands = 4)
    }),
    // SemDeDup: k-means cells (same Lloyd arithmetic as sim_ann_ivf),
    // within-cell drop-if-similar-to-earlier-member — one cell-keyed
    // shuffle, pairwise cost bounded by cell size (the paper's knob)
    "semdedup" -> ((s, dir) => Similarity.semDedup(s, dir)),
    // corpus composition: source × embedding-cell counts and shares;
    // aggregation cardinality is sources×cells, so the window sums
    // ride a tiny relation
    "cluster_mix" -> ((s, dir) => Similarity.clusterMix(s, dir)),
    // ANN from the PERSISTED IVF index: corpus carve k-means-
    // partitioned and written once, query carve probes it — the
    // vector sibling of dedup_index_probe
    "sim_index_probe" -> ((s, dir) => {
      val idx = scratchDir("vecidx")
      val isQuery = col("vec_id") % 10 === 0
      VectorIndex.build(s, dir, idx, vecFilter = Some(!isQuery))
      VectorIndex.probe(s, idx,
        Similarity.load(s, dir).filter(isQuery)
          .select(col("vec_id").as("query_id"), col("v").as("qv")))
    }),
    // ADC probe of the persisted index: same probing, but the corpus
    // side is read from the SQ8 `codes` parquet only — the 4x-smaller
    // serving footprint, ReadSchema-verifiably float-free
    "sim_index_probe_adc" -> ((s, dir) => {
      val idx = scratchDir("vecidx-adc")
      val isQuery = col("vec_id") % 10 === 0
      VectorIndex.build(s, dir, idx, vecFilter = Some(!isQuery))
      VectorIndex.probeAdc(s, idx,
        Similarity.load(s, dir).filter(isQuery)
          .select(col("vec_id").as("query_id"), col("v").as("qv")))
    }),
    // SQ8 int8 quantization: narrow per-row HOF math, zero exchanges;
    // the md5 payload fingerprint pins every quantized byte
    "sim_quantize" -> ((s, dir) => Similarity.quantizeInt8(s, dir)),

    // --- LLM-pipeline: multimodal binary columns ---
    "mm_payload_meta" -> ((s, dir) => Multimodal.payloadMeta(s, dir)),
    // decoded features over REAL payloads (BMP/WAV/AVI built from the
    // md5 token derivation): the oracle recomputes the decoded mean +
    // 16-bin histogram arithmetically, pinning encode→decode→feature
    // lossless — the mm_near_dup technique applied to features
    "mm_features" -> ((s, dir) => Multimodal.featureSummaryReal(s, dir)),
    // color moments through the JPEG chroma path: deterministic 4:2:0
    // DC-only fixtures decode through the REAL color decoder
    // (Huffman→dequant→IDCT→subsampled planes); oracle recomputes the
    // plane means from the md5 derivation
    "mm_color_features" -> ((s, dir) => Multimodal.colorFeatures(s, dir)),
    // sampled AVI frames through the real container walk + DIB parse:
    // per-frame byte length and pixel mean, both oracle-recomputed
    "mm_frames" -> ((s, dir) => Multimodal.frameFeatures(s, dir)),
    "mm_rle_frames" -> ((s, dir) => Multimodal.rleFrameFeatures(s, dir)),
    // RLE4 (biCompression=2): nibble runs/absolute mode through the
    // same strl/strf dispatch, 16-entry inverted palette load-bearing
    "mm_rle4_frames" -> ((s, dir) => Multimodal.rle4FrameFeatures(s, dir)),
    // MS Video 1 (CRAM) through the real inter-frame decoder: frame 1
    // keeps blocks via SKIP codes, so temporal prediction is on the
    // oracle-checked path
    "mm_cram_frames" -> ((s, dir) => Multimodal.cramFrameFeatures(s, dir)),
    "mm_arith_features" -> ((s, dir) => Multimodal.arithJpegFeatures(s, dir)),
    // compressed audio through the real RIFF parse + decoders: IMA
    // ADPCM threads (predictor, step-index) state across 64 nibble
    // codes; G.711 expands both segment layouts — all integer-exact,
    // so the oracle replays every sample
    "mm_adpcm_features" -> ((s, dir) => Multimodal.adpcmFeatures(s, dir)),
    "mm_g711_features" -> ((s, dir) => Multimodal.g711Features(s, dir)),
    // the second ADPCM family: two-tap coefficient predictor +
    // adaptive delta, coefficient table parsed from the fmt extension
    "mm_msadpcm_features" ->
      ((s, dir) => Multimodal.msAdpcmFeatures(s, dir)),
    // palette + Adam7-interlace PNG through the real decoder: even
    // docs interlaced, odd sequential, identical content either way
    "mm_png_features" -> ((s, dir) => Multimodal.pngFeatures(s, dir)),
    // animated GIF through the real compositor: sub-rect frame with
    // a transparency key showing the previous frame through
    "mm_gif_frames" -> ((s, dir) => Multimodal.gifFrameFeatures(s, dir)),
    // TIFF in both byte orders: MM+PackBits vs II+WhiteIsZero through
    // one decoder — endianness/compression/photometric all earned
    "mm_tiff_features" -> ((s, dir) => Multimodal.tiffFeatures(s, dir)),
    // FLAC-subset: Rice-coded fixed-predictor audio through real
    // frame sync, UTF-8 frame numbers, and CRC-8/CRC-16 verification
    "mm_flac_features" -> ((s, dir) => Multimodal.flacFeatures(s, dir)),
    // signal-level audio analysis (zcr/energy/autocorrelation) over
    // the decoded ADPCM samples — integer-exact end to end
    "mm_audio_analysis" -> ((s, dir) => Multimodal.audioAnalysis(s, dir)),
    "mm_progressive_features" ->
      ((s, dir) => Multimodal.progressiveJpegFeatures(s, dir)),
    "mm_sof10_features" -> ((s, dir) => Multimodal.sof10Features(s, dir)),
    "bucketed_join" -> ((s, dir) =>
      Bucketed.bucketedVerdictJoin(s, dir, scratchDir("bucketed"))),
    "partitioned_scan" -> ((s, dir) =>
      Bucketed.partitionedScan(s, dir, scratchDir("partitioned"))),
    "pipeline_export" -> ((s, dir) => TrainPrep.pipelineExport(s, dir)),
    // the export with BOTH corpus-derived models probed from persisted
    // indexes (ClusterIndex keep-set + frozen-KnIndex LM gate) — the
    // delta-economics form; build cost is inside the timed unit, the
    // point is the shared oracle pinning row-identity to the inline
    // pipeline and the spec pinning zero model re-derivation
    "pipeline_export_indexed" -> ((s, dir) => {
      val cidx = scratchDir("pexclidx")
      val kidx = scratchDir("pexknidx")
      graft.ops.IndexCommit.reset(s, cidx)
      graft.ops.IndexCommit.reset(s, kidx)
      graft.ops.ClusterIndex.build(s, dir, cidx)
      KnIndex.build(s, dir, kidx)
      TrainPrep.pipelineExportIndexed(s, dir, cidx, kidx)
    }),
    // REAL container sniffing (PNG/BMP/GIF/JPEG/WAV headers, no codec
    // needed) — on this fixture every payload is arbitrary text bytes,
    // so the oracle pins the no-false-positive contract: all rows
    // sniff as 'unknown' with header fields -1
    "mm_headers" -> ((s, dir) =>
      MediaHeaders.inventory(Multimodal.mediaTable(s, dir))),
    // media-level near-dup: deterministic md5-pixel BMPs round-trip
    // through the REAL decoder into 64-bit dHash signatures, 4-band
    // pigeonhole (exhaustive at hamming <= 3), exact verification —
    // the oracle recomputes pixels arithmetically, so hash equality
    // pins the whole encode->decode->hash path lossless
    "mm_near_dup" -> ((s, dir) => PerceptualHash.nearDupPairs(s, dir)),
    // audio sibling: 65-sample PCM clips round-trip the real WAV
    // encoder/decoder into 64-bit envelope hashes, same banding
    "mm_audio_near_dup" -> ((s, dir) =>
      PerceptualHash.audioNearDupPairs(s, dir)),
    // video sibling: 4-frame uncompressed AVIs through the real
    // container parser, per-frame dHash XOR-folded to a clip key
    "mm_video_near_dup" -> ((s, dir) =>
      PerceptualHash.videoNearDupPairs(s, dir)),
    // the bounded-output cluster form: identical-signature classes
    // collapse to one representative BEFORE the banded join, so a
    // mirrored-clip class of n members costs n rows, never C(n,2)
    // pairs (the pair form's output is inherently quadratic in class
    // size — SCALE_r13 §2 measured classes growing with corpus)
    "mm_video_clusters" -> ((s, dir) =>
      PerceptualHash.videoClusters(s, dir)),
    // image and audio siblings of the cluster form — same
    // collapse-first path (nearDupClustersOfSigs), different codecs
    "mm_clusters" -> ((s, dir) =>
      PerceptualHash.imageClusters(s, dir)),
    "mm_audio_clusters" -> ((s, dir) =>
      PerceptualHash.audioClusters(s, dir)),
    // persisted signature index (the media twin of dedup_index_probe):
    // corpus images decoded+hashed once into committed (doc_id, sig)
    // segments — built on one carve, a second carve APPENDED — then
    // the %10=0 batch probed for batch↔corpus pairs with a batch-only
    // decode; band keys derive row-locally from the frozen signatures
    "mm_sig_index_probe" -> ((s, dir) => {
      val idx = scratchDir("sigidx")
      val sigs = PerceptualHash.signatures(
        PerceptualHash.syntheticImages(s, dir))
      graft.ops.SigIndex.build(s, idx,
        sigs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 =!= 0))
      graft.ops.SigIndex.append(s, idx,
        sigs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0))
      // cache the probe batch: its lineage is an expensive decode+sign
      // derivation and probe's requireProbeSized precondition is one
      // extra action over it — exactly the caller-side remedy the
      // guard documents (the streaming probe bodies do the same; an
      // r16 binary A/B priced the uncached form at a consistent +16%)
      graft.ops.SigIndex.probe(s, idx,
        sigs.filter(col("doc_id") % 10 === 0).cache())
    }),
    // the media probe under a LIVE hot-band star-cap (cap 1 committed
    // as the build-owned GuardMeta default): corpus buckets holding
    // 2+ signatures contribute only their min-id rep, so the probe
    // output is the verified subset — the oracle recomputes the
    // 16-bit band keys from the bit grid and applies the same cap
    "mm_sig_index_probe_guarded" -> ((s, dir) => {
      val idx = scratchDir("sigidx_probe_g")
      val sigs = PerceptualHash.signatures(
        PerceptualHash.syntheticImages(s, dir))
      graft.ops.SigIndex.build(s, idx,
        sigs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 =!= 0),
        guardMaxBandFreq = Some(1L))
      graft.ops.SigIndex.append(s, idx,
        sigs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0))
      // cached probe batch — see mm_sig_index_probe
      graft.ops.SigIndex.probe(s, idx,
        sigs.filter(col("doc_id") % 10 === 0).cache())
    }),
    // cluster forms answered FROM the committed signature index (the
    // r13 decode-once gap): the corpus is decoded+hashed exactly once
    // into SigIndex segments — one build carve, one appended carve,
    // union = every clip — and the collapse-first clustering runs
    // over the frozen 16-byte signatures. Plan-pinned payload-free
    // (SigIndexSpec); shared oracle with the decode forms, so equal
    // hashes pin that the index route changes NOTHING but the decode
    // count. At 100 TB of media this is the difference between
    // re-decoding the corpus per clustering run and a fixed-width
    // parquet job.
    "mm_clusters_index" -> ((s, dir) => {
      val idx = scratchDir("sigidx_img_cl")
      val sigs = PerceptualHash.signatures(
        PerceptualHash.syntheticImages(s, dir))
      graft.ops.SigIndex.build(s, idx, sigs.filter(col("doc_id") % 3 =!= 0))
      graft.ops.SigIndex.append(s, idx, sigs.filter(col("doc_id") % 3 === 0))
      graft.ops.SigIndex.clusters(s, idx)
    }),
    "mm_audio_clusters_index" -> ((s, dir) => {
      val idx = scratchDir("sigidx_aud_cl")
      val sigs = PerceptualHash.audioSignatures(
        PerceptualHash.syntheticClips(s, dir))
      graft.ops.SigIndex.build(s, idx, sigs.filter(col("doc_id") % 3 =!= 0))
      graft.ops.SigIndex.append(s, idx, sigs.filter(col("doc_id") % 3 === 0))
      graft.ops.SigIndex.clusters(s, idx)
    }),
    "mm_video_clusters_index" -> ((s, dir) => {
      val idx = scratchDir("sigidx_vid_cl")
      val sigs = PerceptualHash.videoSignatures(
        PerceptualHash.syntheticVideos(s, dir))
      graft.ops.SigIndex.build(s, idx, sigs.filter(col("doc_id") % 3 =!= 0))
      graft.ops.SigIndex.append(s, idx, sigs.filter(col("doc_id") % 3 === 0))
      graft.ops.SigIndex.clusters(s, idx)
    }),

    // --- LLM-pipeline: crawl-ingestion front end ---
    // WARC/1.0 record inventory: from-scratch framing parse + real
    // multi-member gunzip (.warc.gz convention, odd doc_ids); the
    // payload md5 pins synthesize->compress->parse byte-exact
    "warc_records" -> ((s, dir) => CrawlOps.warcRecords(s, dir)),
    // HTML main-text extraction: real tokenizer (raw-text elements,
    // quoted attrs, entities) + link-density boilerplate drop; body
    // md5 pins the extraction against the generative derivation
    "html_extract" -> ((s, dir) => CrawlOps.htmlExtract(s, dir)),
    // CCNet-style corpus-wide paragraph dedup: first-occurrence rule
    // as a skew-safe aggregation (no window sort on the hot banner)
    "paragraph_dedup" -> ((s, dir) => CrawlOps.paragraphDedup(s, dir)),
    // URL canonicalization via parse_url built-ins + mini-PSL
    // registered domain + canonical-key dedup (live collisions)
    "url_normalize" -> ((s, dir) => UrlOps.urlNormalize(s, dir)),
    // multinomial NB quality classifier: trained in-engine on the
    // train split's heuristic verdicts, decimal-mediated scoring
    "quality_classifier" -> ((s, dir) => Classifier.nbQuality(s, dir)),
    // RFC 9309 robots.txt policy over the canonical URL path: real
    // group selection + wildcard/anchor matcher, longest-match-wins
    "crawl_policy" -> ((s, dir) => Robots.crawlPolicy(s, dir)),
    // charset detection + transcode: BOM sniff -> strict UTF-8
    // validation -> Latin-1 fallback; decoded md5 pins the transcode
    "charset_detect" -> ((s, dir) => Encoding.charsetDetect(s, dir)),
    // ORC export round-trip: the corpus slice written to Spark's
    // other columnar format and read back, row-level oracle equality
    "orc_roundtrip" -> ((s, dir) =>
      Bucketed.orcRoundTrip(s, dir, scratchDir("orc"))),
    // z-order layout: two-dimensional clustering so min/max pruning
    // bites on BOTH filter columns; result is layout-invariant
    "zorder_scan" -> ((s, dir) =>
      Bucketed.zorderScan(s, dir, scratchDir("zorder"))),
    // CSV round-trip under adversarial quoting: delimiter, quote and
    // newline inside every field, RFC 4180 doubled-quote escapes
    "csv_roundtrip" -> ((s, dir) =>
      Bucketed.csvRoundTrip(s, dir, scratchDir("csv"))),
    // JSONL round-trip under adversarial escaping: control chars,
    // surrogate pairs, nested struct + array, FAILFAST read-back
    "json_roundtrip" -> ((s, dir) =>
      Bucketed.jsonRoundTrip(s, dir, scratchDir("json"))),
    // small-file compaction: 64 scattered files -> 4 key-clustered
    // ones via one range-partitioned rewrite; relation is identity
    "compact_files" -> ((s, dir) =>
      Bucketed.compactFiles(s, dir, scratchDir("compact"))),
    // mergeSchema union read over two file generations; NULLs land
    // exactly where a generation predates the added column
    "schema_evolution" -> ((s, dir) =>
      Bucketed.schemaEvolution(s, dir, scratchDir("evolve"))),
    // sitemap generation + StAX re-parse: per-host urlset XML with
    // real escaping (& in query strings), one host-keyed exchange
    "sitemap_urls" -> ((s, dir) => Sitemap.sitemapUrls(s, dir)),
    // ustar walk: checksum-verified 512-block entries, octal sizes,
    // dir + file members; zero-exchange codec plan
    "tar_members" -> ((s, dir) => Archives.tarInventory(s, dir)),
    // from-scratch Avro OCF: zigzag varints, metadata map, verified
    // sync markers, null + deflate block codecs
    "avro_records" -> ((s, dir) => Avro.avroRecords(s, dir)),
    // protobuf wire format: tag dispatch, zigzag/packed/nested
    // fields, unknown-field skipping load-bearing on odd docs
    "proto_records" -> ((s, dir) => Proto.protoRecords(s, dir)),
    // zip via the central directory (EOCD backward scan past the
    // comment), stored + raw-deflate members, CRC-32 verified
    "zip_members" -> ((s, dir) => Archives.zipInventory(s, dir)),
    // politeness-partitioned fetch plan: robots-admitted URLs ranked
    // per host, cut into bounded waves; one host-keyed window
    "fetch_waves" -> ((s, dir) => Frontier.fetchWaves(s, dir)),
    // reliability curve of the NB classifier: margin-binned counts,
    // exact integer ratios — rides nbQuality's exchanges
    "classifier_calibration" -> ((s, dir) => Classifier.calibration(s, dir)),
    // sliding-window chunking with overlap (embedding/RAG prep):
    // row-local explode, zero exchanges, offsets + content hashes
    "doc_chunks" -> ((s, dir) => CrawlOps.docChunks(s, dir)),
    // dataset-card composition report: per-source/per-lang/overall in
    // one grouping-sets pass (one scan, one exchange)
    "corpus_datasheet" -> ((s, dir) => Relational.corpusDatasheet(s, dir)),
    // link-graph PageRank (crawl prioritization): 3 damped power
    // iterations, decimal-mediated so the ITERATED ranks hash-match
    "link_pagerank" -> ((s, dir) => LinkGraph.pageRank(s, dir)),
    // degree-oriented triangle counting (clustering signal): wedges
    // fan out under the O(sqrt m) orientation bound, never deg^2
    "link_triangles" -> ((s, dir) => LinkGraph.triangles(s, dir)),
    // incremental refresh: prior snapshot's persisted verdicts ∪
    // fresh delta compute — the oracle recomputes EVERYTHING from
    // scratch, so hash equality pins incremental ≡ full
    "incremental_refresh" -> ((s, dir) =>
      Incremental.qualityRefresh(s, dir, scratchDir("increm")))
  )

  /** Chained-CTE replay of the BPE trainer for the DuckDB oracle: `w0`
    * is the wrapped-symbol wordcount, `m{j}` the round-j argmax pair,
    * `w{j}` the vocabulary after applying it. The rewrite uses the
    * same `replace` primitive (left-to-right, non-overlapping) as the
    * engine, so merge semantics match by construction; ties break by
    * (count DESC, l, r) under binary collation on both sides. Every
    * stage is AS MATERIALIZED: each w{j} is referenced twice (by
    * m{j+1} and w{j+1}), so default inlining would expand the chain
    * exponentially — the DuckDB twin of the lineage blowup the
    * engine's eager localCheckpoint prevents.
    */
  private def bpeOracleCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS MATERIALIZED (
      |  SELECT '|' || array_to_string(
      |      [substr(word, i, 1) for i in range(1, length(word) + 1)], '||')
      |    || '|' AS word, cnt
      |  FROM (SELECT word, count(*) AS cnt FROM (
      |      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
      |        AS word FROM documents)
      |    WHERE length(word) >= 1 AND NOT contains(word, '|')
      |    GROUP BY word)
      |)""".stripMargin
    for (j <- 1 to k) {
      sb ++= s""",
        |m$j AS MATERIALIZED (
        |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pair_count FROM (
        |    SELECT unnest([{'l': syms[i], 'r': syms[i+1]}
        |        for i in range(1, len(syms))], recursive := true), cnt
        |    FROM (SELECT string_split(trim(word, '|'), '||') AS syms, cnt
        |          FROM w${j - 1}))
        |  GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 1
        |),
        |w$j AS MATERIALIZED (
        |  SELECT replace(word, '|' || l || '||' || r || '|',
        |    '|' || l || r || '|') AS word, cnt
        |  FROM w${j - 1}, m$j
        |)""".stripMargin
    }
    sb.toString
  }

  /** One Viterbi lattice pass for the unigram-LM oracle: position
    * CTEs `$p1..$p12` each keep, per word, the best (score, path)
    * over the ≤4 predecessor states joined against the `$vocabLp`
    * (piece, lp) relation — `row_number() OVER (PARTITION BY word
    * ORDER BY score DESC, path)` is the exact argmax rule the
    * engine's BigDecimal segmenter applies. `${p}fin` picks each
    * word's full-length state. Scores are DECIMAL(28,12) sums of
    * 12-decimal logs: every comparison is exact, so the chosen
    * segmentation — not just its score — matches cross-engine.
    */
  private def unigramViterbiCtes(p: String, vocabLp: String): String = {
    val sb = new StringBuilder
    sb ++= s""",
      |${p}0 AS (
      |  SELECT word, cnt, CAST(0 AS DECIMAL(28,12)) AS score,
      |    '' AS path
      |  FROM uwords
      |)""".stripMargin
    for (i <- 1 to 12) {
      val cands = (math.max(0, i - 4) until i).map { j =>
        s"""    SELECT b.word, b.cnt,
           |      CAST(b.score + v.lp AS DECIMAL(28,12)) AS score,
           |      CASE WHEN b.path = '' THEN v.piece
           |        ELSE concat(b.path, '|', v.piece) END AS path
           |    FROM $p$j b JOIN $vocabLp v
           |      ON v.piece = substr(b.word, ${j + 1}, ${i - j})
           |    WHERE len(b.word) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      sb ++= s""",
        |$p$i AS MATERIALIZED (
        |  SELECT word, cnt, score, path FROM (
        |    SELECT word, cnt, score, path, row_number() OVER (
        |      PARTITION BY word ORDER BY score DESC, path) AS rn
        |    FROM (
        |$cands))
        |  WHERE rn = 1
        |)""".stripMargin
    }
    sb ++= s""",
      |${p}fin AS MATERIALIZED (
      |""".stripMargin
    sb ++= (1 to 12)
      .map(i => s"  SELECT word, cnt, path FROM $p$i WHERE len(word) = $i")
      .mkString("\n  UNION ALL\n")
    sb ++= "\n)"
    sb.toString
  }

  /** Piece re-count + single-char +1 floor + renormalized 12-decimal
    * logs after a Viterbi pass — one EM M-step of the unigram-LM
    * oracle.
    */
  private def unigramMStepCtes(
      finCte: String, cntName: String, vName: String,
      lpName: String): String =
    s""",
      |$cntName AS (
      |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(path, '|')) AS piece, cnt
      |    FROM $finCte)
      |  GROUP BY piece
      |), $vName AS MATERIALIZED (
      |  SELECT COALESCE(c.piece, ch.piece) AS piece,
      |    COALESCE(c.cnt, 0) + CASE
      |      WHEN len(COALESCE(c.piece, ch.piece)) = 1 THEN 1
      |      ELSE 0 END AS cnt
      |  FROM $cntName c
      |  FULL JOIN (SELECT piece FROM chars) ch ON ch.piece = c.piece
      |), $lpName AS MATERIALIZED (
      |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) /
      |    (SELECT CAST(sum(cnt) AS BIGINT) FROM $vName)), 12)
      |    AS DECIMAL(28,12)) AS lp
      |  FROM $vName
      |)""".stripMargin

  /** Full unigram-LM tokenizer oracle: seed → EM×2 (Viterbi passes a,
    * b with M-steps) → prune → apply pass c → top-40 piece counts.
    */
  private def unigramOracle: String = {
    """WITH uwords AS MATERIALIZED (
      |  SELECT word, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
      |      AS word FROM documents)
      |  WHERE word <> '' AND len(word) <= 12
      |    AND NOT contains(word, '|')
      |  GROUP BY word
      |), sub AS MATERIALIZED (
      |  SELECT substr(word, i, l) AS piece,
      |    CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM uwords,
      |    unnest(range(1, len(word) + 1)) AS t(i),
      |    unnest(range(1, 5)) AS u(l)
      |  WHERE i + l <= len(word) + 1
      |  GROUP BY piece
      |), multi AS (
      |  SELECT piece, cnt FROM (
      |    SELECT piece, cnt,
      |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
      |    FROM sub WHERE len(piece) >= 2 AND cnt >= 2)
      |  WHERE rn <= 200
      |), chars AS (
      |  SELECT piece, cnt FROM sub WHERE len(piece) = 1
      |), v0 AS (
      |  SELECT piece, cnt FROM multi
      |  UNION ALL SELECT piece, cnt FROM chars
      |), lp0 AS MATERIALIZED (
      |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) /
      |    (SELECT CAST(sum(cnt) AS BIGINT) FROM v0)), 12)
      |    AS DECIMAL(28,12)) AS lp
      |  FROM v0
      |)""".stripMargin +
      unigramViterbiCtes("a", "lp0") +
      unigramMStepCtes("afin", "cnt1", "v1", "lp1") +
      unigramViterbiCtes("b", "lp1") +
      unigramMStepCtes("bfin", "cnt2", "v2", "lp2") +
      """,
        |keepv AS (
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt,
        |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
        |    FROM v2)
        |  WHERE rn <= 24 OR len(piece) = 1
        |), lpf AS MATERIALIZED (
        |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) /
        |    (SELECT CAST(sum(cnt) AS BIGINT) FROM keepv)), 12)
        |    AS DECIMAL(28,12)) AS lp
        |  FROM keepv
        |)""".stripMargin +
      unigramViterbiCtes("c", "lpf") +
      """
        |SELECT piece, n_occurrences, rank FROM (
        |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS n_occurrences,
        |    CAST(row_number() OVER (ORDER BY sum(cnt) DESC, piece)
        |      AS INTEGER) AS rank
        |  FROM (SELECT unnest(string_split(path, '|')) AS piece, cnt
        |        FROM cfin)
        |  GROUP BY piece)
        |ORDER BY rank LIMIT 40""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "corpus_unigram_lm" -> unigramOracle,
    "corpus_bpe_train" -> (bpeOracleCtes(20) + "\n" +
      (1 to 20).map(j =>
        s"SELECT CAST($j AS INTEGER) AS rank, l AS left_sym, r AS right_sym," +
          s" l || r AS merged, pair_count FROM m$j")
        .mkString("\nUNION ALL\n")),
    "corpus_bpe_tokenize" -> (bpeOracleCtes(20) + """
      |SELECT sym AS token, CAST(sum(cnt) AS BIGINT) AS token_count FROM (
      |  SELECT unnest(string_split(trim(word, '|'), '||')) AS sym, cnt
      |  FROM w20)
      |GROUP BY sym""".stripMargin),
    "scd2_merge" ->
      """WITH delta AS (
        |  SELECT c_custkey, c_mktsegment || '+' AS seg,
        |    c_acctbal + CAST(100 AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 5 = 0
        |)
        |SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |  CAST(0 AS BIGINT) AS valid_from,
        |  CASE WHEN d.c_custkey IS NOT NULL THEN CAST(1 AS BIGINT)
        |       ELSE NULL END AS valid_to,
        |  d.c_custkey IS NULL AS is_current
        |FROM customer c LEFT JOIN delta d USING (c_custkey)
        |UNION ALL
        |SELECT c_custkey, seg, bal, CAST(1 AS BIGINT), NULL, true
        |FROM delta""".stripMargin,
    "merge_orders" ->
      """SELECT t.o_orderkey,
        |       t.o_custkey,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
        |       t.o_orderdate,
        |       t.o_orderpriority
        |FROM orders t
        |LEFT JOIN (
        |  SELECT o_orderkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'F' AS o_orderstatus
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |) u ON t.o_orderkey = u.o_orderkey""".stripMargin,
    // upsert: update leg identical to merge_orders, insert leg appends
    // the unmatched synthetic orders with nulls outside the subset
    "upsert_orders" ->
      """WITH delta AS (
        |  SELECT o_orderkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'F' AS o_orderstatus
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey + 20000000,
        |         o_totalprice * CAST(0.5 AS DOUBLE),
        |         'N'
        |  FROM orders WHERE o_orderpriority = '2-HIGH'
        |)
        |SELECT t.o_orderkey,
        |       t.o_custkey,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
        |       t.o_orderdate,
        |       t.o_orderpriority
        |FROM orders t LEFT JOIN delta u ON t.o_orderkey = u.o_orderkey
        |UNION ALL
        |SELECT d.o_orderkey,
        |       CAST(NULL AS BIGINT) AS o_custkey,
        |       d.o_orderstatus,
        |       d.o_totalprice,
        |       CAST(NULL AS TIMESTAMP) AS o_orderdate,
        |       CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM delta d
        |WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = d.o_orderkey)""".stripMargin,
    "upsert_row_counts" ->
      """WITH delta AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey + 20000000 FROM orders WHERE o_orderpriority = '2-HIGH'
        |)
        |SELECT
        |  (SELECT count(*) FROM orders t
        |   WHERE EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = t.o_orderkey)) AS row_count_updated,
        |  (SELECT count(*) FROM delta d
        |   WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = d.o_orderkey)) AS row_count_inserted""".stripMargin,
    "merge_customer_nullkeys" ->
      """SELECT t.c_custkey,
        |       t.c_name,
        |       t.c_nationkey,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |       t.c_mktsegment
        |FROM customer t
        |LEFT JOIN (
        |  SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS c_custkey,
        |         c_acctbal + CAST(100.0 AS DOUBLE) AS c_acctbal
        |  FROM customer WHERE c_custkey <= 750
        |) u ON t.c_custkey = u.c_custkey""".stripMargin,
    "merge_row_count" ->
      """SELECT count(*) AS row_count_updated
        |FROM customer
        |WHERE c_custkey <= 750 AND c_custkey % 10 <> 0""".stripMargin,
    "project_rename" ->
      """SELECT c_custkey AS custkey, c_name AS customer_name,
        |       c_mktsegment AS segment
        |FROM customer""".stripMargin,
    "null_key_filter" ->
      """SELECT o_orderkey, o_totalprice
        |FROM (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey END AS o_orderkey,
        |         o_totalprice
        |  FROM orders
        |) WHERE o_orderkey IS NOT NULL""".stripMargin,
    "dup_key_detect" ->
      """SELECT l_orderkey, l_linenumber, count(*) AS n
        |FROM lineitem
        |GROUP BY l_orderkey, l_linenumber
        |HAVING count(*) > 1""".stripMargin,
    "limit0_clone" ->
      "SELECT * FROM lineitem LIMIT 0",
    "distinct_first" ->
      """SELECT l_returnflag, min(l_orderkey) AS first_key
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q5_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    // Regression oracle: integer-cents moments (round(v*100) as
    // BIGINT — exact, no per-row decimal rounding mode), DECIMAL(38,0)
    // accumulators, and the identical final double expression order —
    // slope/intercept/r2 come out bit-equal.
    "stats_regression" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS xc,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
        |  FROM lineitem
        |), m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(xc AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(yc AS DECIMAL(38,0))) AS sy,
        |    SUM(CAST(xc * yc AS DECIMAL(38,0))) AS sxy,
        |    SUM(CAST(xc * xc AS DECIMAL(38,0))) AS sxx,
        |    SUM(CAST(yc * yc AS DECIMAL(38,0))) AS syy
        |  FROM c GROUP BY l_returnflag
        |), d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / 100.0 AS sxd,
        |    CAST(sy AS DOUBLE) / 100.0 AS syd,
        |    CAST(sxy AS DOUBLE) / 10000.0 AS sxyd,
        |    CAST(sxx AS DOUBLE) / 10000.0 AS sxxd,
        |    CAST(syy AS DOUBLE) / 10000.0 AS syyd
        |  FROM m
        |)
        |SELECT l_returnflag, n,
        |  (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
        |  (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
        |    * sxd) / nd AS intercept,
        |  (nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
        |    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) AS r2
        |FROM d""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O_cnt",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O_rev",
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F_cnt",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F_rev",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P_cnt",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P_rev"
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT'
        |    AND o_totalprice > CAST(400000 AS DOUBLE))""".stripMargin,
    "anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderstatus = 'P')""".stripMargin,
    "unpivot_metrics" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n', n FROM w""".stripMargin,
    "percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    // rank certificate: the GK estimate's rank interval must reach
    // within n/accuracy (+1 slack) of ceil(q·n) — true by the
    // sketch's contract, so the oracle emits the literal verdict and
    // recomputes only the exact group count
    "percentiles_approx" ->
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  TRUE AS p50_ok,
        |  TRUE AS p90_ok
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    // histogram-sketch replay: same floor-bucketing, same HUGEINT-free
    // rank arithmetic (r = ceil(q·n) on doubles), same first-bucket
    // rank-walk interpolation — the estimate hash-matches because
    // every step is integer or IEEE-double on both engines
    "percentiles_sketch" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |    CAST(floor(o_totalprice / CAST(1000.0 AS DOUBLE)) AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS n_b
        |  FROM orders GROUP BY 1, 2
        |), t AS (
        |  SELECT o_orderstatus, CAST(sum(n_b) AS BIGINT) AS n,
        |    CAST(count(*) AS INTEGER) AS n_buckets
        |  FROM b GROUP BY 1
        |), c AS (
        |  SELECT o_orderstatus, b, n_b,
        |    CAST(sum(n_b) OVER (PARTITION BY o_orderstatus ORDER BY b)
        |      AS BIGINT) AS cum
        |  FROM b
        |), e50 AS (
        |  SELECT o_orderstatus, p50_est FROM (
        |    SELECT c.o_orderstatus,
        |      c.b * CAST(1000.0 AS DOUBLE) + CAST(1000.0 AS DOUBLE)
        |        * (CAST(ceil(CAST(0.5 AS DOUBLE) * t.n) AS BIGINT)
        |           - (c.cum - c.n_b)) / c.n_b AS p50_est,
        |      row_number() OVER (PARTITION BY c.o_orderstatus ORDER BY c.b)
        |        AS rn
        |    FROM c JOIN t USING (o_orderstatus)
        |    WHERE c.cum >= CAST(ceil(CAST(0.5 AS DOUBLE) * t.n) AS BIGINT)
        |  ) WHERE rn = 1
        |), e90 AS (
        |  SELECT o_orderstatus, p90_est FROM (
        |    SELECT c.o_orderstatus,
        |      c.b * CAST(1000.0 AS DOUBLE) + CAST(1000.0 AS DOUBLE)
        |        * (CAST(ceil(CAST(0.9 AS DOUBLE) * t.n) AS BIGINT)
        |           - (c.cum - c.n_b)) / c.n_b AS p90_est,
        |      row_number() OVER (PARTITION BY c.o_orderstatus ORDER BY c.b)
        |        AS rn
        |    FROM c JOIN t USING (o_orderstatus)
        |    WHERE c.cum >= CAST(ceil(CAST(0.9 AS DOUBLE) * t.n) AS BIGINT)
        |  ) WHERE rn = 1
        |)
        |SELECT t.o_orderstatus, t.n, t.n_buckets, e50.p50_est, e90.p90_est
        |FROM t JOIN e50 USING (o_orderstatus) JOIN e90 USING (o_orderstatus)"""
        .stripMargin,
    "q6_selective" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.08
        |  AND l_quantity < 24""".stripMargin,
    "q3_shipping" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_name, 1, 5) AS name_head,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  p_name LIKE '%red%' AS is_red,
        |  CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INTEGER) AS age_days
        |FROM orders""".stripMargin,
    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "dedup_counts" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT text) AS n_unique
        |FROM documents""".stripMargin,
    // the HLL estimate never appears in the output — the oracle
    // recomputes the exact counts and the bound verdict is TRUE by
    // the sketch's contract (0.15 = 3× the default 5% rsd; on fixed
    // data the estimate, hence the verdict, is deterministic)
    "dedup_approx" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT text) AS n_unique,
        |  TRUE AS within_eps
        |FROM documents""".stripMargin,
    "events_sliding" ->
      """WITH x AS (
        |  SELECT CAST(time_bucket(INTERVAL '30 minutes',
        |    make_timestamp(epoch_ns(ts) // 1000)) AS TIMESTAMP) AS s0,
        |    event_type, value
        |  FROM events
        |), w AS (
        |  SELECT s0 AS win_start, event_type, value FROM x
        |  UNION ALL
        |  SELECT s0 - INTERVAL '30 minutes', event_type, value FROM x
        |)
        |SELECT win_start, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY win_start, event_type""".stripMargin,
    "set_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "set_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "set_union" ->
      """SELECT DISTINCT o_orderkey FROM (
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |)""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "top_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    CAST(row_number() OVER (
        |      PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk
        |  FROM part
        |) WHERE rk <= 3""".stripMargin,
    "events_window_rank" ->
      """SELECT event_id, user_id, value,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  lag(value) OVER w AS prev_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)""".stripMargin,
    // Markov oracle: same (ts, event_id) total order, same counts,
    // one exact-long division per row.
    "events_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS from_type
        |  FROM events
        |), t AS (
        |  SELECT from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
        |), ft AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |  FROM t GROUP BY 1
        |)
        |SELECT t.from_type, t.to_type, t.n,
        |  CAST(t.n AS DOUBLE) / CAST(ft.tot AS DOUBLE) AS p
        |FROM t JOIN ft USING (from_type)""".stripMargin,

    // Token-bucket oracle: the same integer recurrence replayed per
    // (user, rank) in a recursive CTE — capacity 6e10 micro-tokens,
    // refill = elapsed microseconds, admit costs 2e10 (20000 s).
    "events_token_bucket" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS t,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000) AS BIGINT) AS i
        |  FROM events
        |), n AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY 1
        |), r AS (
        |  SELECT user_id, i, t,
        |    CAST(60000000000 - 20000000000 AS BIGINT) AS tok,
        |    CAST(1 AS BIGINT) AS adm
        |  FROM e WHERE i = 1
        |  UNION ALL
        |  SELECT x.user_id, x.i, x.t,
        |    CASE WHEN least(60000000000, r.tok + (x.t - r.t)) >= 20000000000
        |      THEN least(60000000000, r.tok + (x.t - r.t)) - 20000000000
        |      ELSE least(60000000000, r.tok + (x.t - r.t)) END,
        |    r.adm + CASE WHEN least(60000000000, r.tok + (x.t - r.t))
        |      >= 20000000000 THEN 1 ELSE 0 END
        |  FROM e x JOIN r ON x.user_id = r.user_id AND x.i = r.i + 1
        |), last AS (
        |  SELECT user_id, tok, adm,
        |    row_number() OVER (PARTITION BY user_id ORDER BY i DESC)
        |      AS rn
        |  FROM r
        |)
        |SELECT n.user_id, n.n_events,
        |  CAST(l.adm AS BIGINT) AS n_admitted,
        |  n.n_events - CAST(l.adm AS BIGINT) AS n_throttled,
        |  CAST(l.tok AS BIGINT) AS final_micro_tokens
        |FROM n JOIN last l ON l.user_id = n.user_id AND l.rn = 1"""
        .stripMargin,

    // EWMA oracle: the same recurrence replayed hour-rank by
    // hour-rank in a recursive CTE, each step rounded to 12 decimals;
    // the spike/dip compare reads the PRIOR smoothed level.
    "events_ewma" ->
      """WITH RECURSIVE h AS (
        |  SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1
        |), idx AS (
        |  SELECT hour, c,
        |    CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS i
        |  FROM h
        |), r AS (
        |  SELECT i, hour, c, CAST(c AS DOUBLE) AS e,
        |    CAST(NULL AS DOUBLE) AS prev
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.hour, x.c,
        |    round(CAST(0.25 AS DOUBLE) * x.c
        |      + CAST(0.75 AS DOUBLE) * r.e, 12),
        |    r.e
        |  FROM idx x JOIN r ON x.i = r.i + 1
        |)
        |SELECT hour, c AS n_events, round(e, 6) AS ewma,
        |  CASE WHEN prev IS NULL THEN 'start'
        |    WHEN c > 2.0 * prev THEN 'spike'
        |    WHEN 2.0 * c < prev THEN 'dip'
        |    ELSE 'normal' END AS label
        |FROM r""".stripMargin,
    // Seasonal replay: the same hourly relation keyed by
    // (dow, hod); mean/variance from exact count sums in the same
    // expression shape, variance floored at 0 before sqrt
    "events_seasonal" ->
      """WITH h AS (
        |  SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1
        |), k AS (
        |  -- // floors like the engine's exact floordiv; the +7/+24
        |  -- re-mod makes dow/hod non-negative for pre-1970 hours,
        |  -- matching the engine's pmod
        |  SELECT hour, c,
        |    (((((hour // 24) + 4) % 7) + 7) % 7) AS dow,
        |    (((hour % 24) + 24) % 24) AS hod
        |  FROM h
        |), se AS (
        |  SELECT dow, hod, count(*) AS m,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS sc2
        |  FROM k GROUP BY dow, hod
        |), sm AS (
        |  SELECT dow, hod,
        |    CAST(sc AS DOUBLE) / CAST(m AS DOUBLE) AS mean,
        |    (CAST(sc2 AS DOUBLE)
        |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(m AS DOUBLE))
        |      / CAST(m AS DOUBLE) AS var
        |  FROM se
        |)
        |SELECT k.hour, CAST(k.dow AS INTEGER) AS dow,
        |  CAST(k.hod AS INTEGER) AS hod, k.c AS n_events,
        |  round(sm.mean, 6) AS seasonal_mean,
        |  round(CAST(k.c AS DOUBLE) - sm.mean, 6) AS residual,
        |  CASE
        |    WHEN CAST(k.c AS DOUBLE) - sm.mean
        |         > 2.0 * sqrt(greatest(var, 0.0)) THEN 'spike'
        |    WHEN CAST(k.c AS DOUBLE) - sm.mean
        |         < -(2.0 * sqrt(greatest(var, 0.0))) THEN 'dip'
        |    ELSE 'normal' END AS label
        |FROM k JOIN sm ON sm.dow = k.dow AND sm.hod = k.hod""".stripMargin,

    "events_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id,
        |    (epoch_ns(ts) // 1000) - ((epoch_ns(ts) // 1000) % 3600000000)
        |      AS hour_us,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      AS hour_value
        |  FROM events GROUP BY 1, 2
        |), spans AS (
        |  SELECT user_id, min(hour_us) AS mn, max(hour_us) AS mx
        |  FROM hourly GROUP BY 1
        |), grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(mn, mx, 3600000000)) AS hour_us
        |  FROM spans
        |)
        |SELECT g.user_id, g.hour_us,
        |  h.hour_value IS NOT NULL AS observed,
        |  last_value(h.hour_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM grid g LEFT JOIN hourly h USING (user_id, hour_us)""".stripMargin,
    "events_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), g AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess AS (
        |  SELECT user_id,
        |    CAST(sum(new_s) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
        |    ts_us
        |  FROM g
        |), iv AS (
        |  SELECT min(ts_us) AS s0, max(ts_us) + 1 AS s1
        |  FROM sess GROUP BY user_id, session_id
        |), pts AS (
        |  SELECT t_us, CAST(sum(d) AS BIGINT) AS d FROM (
        |    SELECT s0 AS t_us, 1 AS d FROM iv
        |    UNION ALL
        |    SELECT s1 AS t_us, -1 AS d FROM iv)
        |  GROUP BY t_us
        |), run AS (
        |  SELECT t_us - (t_us % 3600000000) AS hour_us,
        |    CAST(sum(d) OVER (ORDER BY t_us
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        |  FROM pts
        |)
        |SELECT hour_us, max(conc) AS max_concurrent,
        |  count(*) AS n_changes
        |FROM run GROUP BY hour_us""".stripMargin,
    "events_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    (epoch_ns(ts) // 1000) // 604800000000 AS week
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
        |)
        |SELECT cohort_week, week - cohort_week AS weeks_since,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts_us) AS t1_us
        |  FROM e WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(ts_us) AS t2_us
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts_us > t1_us GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(ts_us) AS t3_us
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY 1
        |)
        |SELECT u.user_id, t1_us, t2_us, t3_us,
        |  CAST(CASE WHEN t3_us IS NOT NULL THEN 3
        |       WHEN t2_us IS NOT NULL THEN 2
        |       WHEN t1_us IS NOT NULL THEN 1
        |       ELSE 0 END AS INTEGER) AS stage
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,
    "events_running" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
        |  FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS cum_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS day_value,
        |  COUNT(*) OVER (
        |    PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |    AS day_n
        |FROM e""".stripMargin,
    "events_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), g AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |)
        |SELECT user_id, event_id,
        |  CAST(sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM g""".stripMargin,
    "events_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), g AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, ts_us,
        |    CAST(sum(new_s) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM sess
        |GROUP BY user_id, session_id""".stripMargin,
    "events_range_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), g AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess0 AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g
        |), sess AS (
        |  SELECT user_id AS s_user,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM sess0 GROUP BY user_id, session_id
        |)
        |SELECT e.event_id, e.user_id,
        |  count(s.s_user) AS n_active_sessions
        |FROM e LEFT JOIN sess s
        |  ON s.s_user != e.user_id
        | AND s.start_us <= e.ts_us AND e.ts_us <= s.end_us
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "events_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "events_asof" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), p AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
        |    arg_max(value, event_id) AS pval
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id, p.pval AS last_purchase_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY md5(text)""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle(0.5),
    // The LSH result is exact w.h.p. after verification, so it is
    // pinned against the same exact-Jaccard oracle at its threshold.
    "dedup_minhash_lsh" -> jaccardOracle(0.8),
    "dedup_clusters" -> clusterOracle(0.8),
    "dedup_best_rep" -> bestRepOracle,
    "dedup_filtered" -> dedupFilteredOracle(0.8),
    // the persisted-cluster-index family shares the one-job oracles:
    // dedup_clusters_index pins append ≡ build(A∪B) (built on the
    // %10≠0 carve, the %10=0 batch folded in), and the two probe
    // queries read the committed assignment instead of re-deriving
    // the LSH→components subtree
    "dedup_clusters_index" -> clusterOracle(0.8),
    // the point-lookup form: the same cluster relation restricted to
    // the fixed %101=5 id set the engine passes explicitly (any
    // partition-pruning bug that loses or mislabels a doc diverges
    // from the one-job rows here)
    "dedup_clusters_lookup" ->
      s"""WITH r AS (${clusterOracle(0.8)})
         |SELECT doc_id, component_id, keep FROM r
         |WHERE doc_id % 101 = 5 AND doc_id <= 1924""".stripMargin,
    "dedup_filtered_indexed" -> dedupFilteredOracle(0.8),
    "dedup_best_rep_indexed" -> bestRepOracle,
    // content-hash snapshot diff over the same deterministic carves
    // and the same simulated edit (uppercase at doc_id % 11 = 0)
    "corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS old_md5 FROM documents
        |  WHERE doc_id % 7 <> 0
        |), neu AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END)
        |      AS new_md5
        |  FROM documents WHERE doc_id % 5 <> 0
        |), d AS (
        |  SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
        |    CASE WHEN old_md5 IS NULL THEN 'added'
        |         WHEN new_md5 IS NULL THEN 'removed'
        |         WHEN old_md5 = new_md5 THEN 'same'
        |         ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM d GROUP BY status""".stripMargin,
    // closed-form replay of the snapshot layout: the JSONL line's
    // byte length (ASCII by construction: digits + base64), the
    // md5-nibble shard, the (hash, doc_id) in-shard order, and the
    // start-offset file capping at 16384 bytes — aggregated per shard
    // exactly as the engine aggregates the published manifest
    "corpus_snapshot_read" ->
      """WITH s0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
        |), a AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '#shard') AS h,
        |    CAST(strlen('{"doc_id":' || CAST(doc_id AS VARCHAR) ||
        |      ',"text_hex":"' || hex(encode(text)) || '"}') + 1
        |      AS BIGINT) AS n_bytes
        |  FROM s0
        |), b AS (
        |  -- 4 hex nibbles (16 bits) % nShards, matching the engine's
        |  -- publishAuto-capable shard derivation
        |  SELECT doc_id, h, n_bytes,
        |    CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT) % 8
        |      AS INTEGER) AS shard_id
        |  FROM a
        |), c AS (
        |  SELECT *, sum(n_bytes) OVER (PARTITION BY shard_id
        |    ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM b
        |), d AS (
        |  SELECT *, CAST((cum - n_bytes) // 16384 AS BIGINT) AS file_seq
        |  FROM c
        |)
        |SELECT shard_id,
        |  CAST(count(DISTINCT file_seq) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM d GROUP BY shard_id""".stripMargin,
    // last-writer-wins replay of the delta chain: changes win over
    // the base, tombstones drop — the engine earns the same relation
    // through publish -> delta publish -> chain-resolved shard-file
    // read; hex round-trip makes md5(text) comparable bit-for-bit
    "corpus_snapshot_delta" -> snapshotDeltaOracle,
    // shared verbatim by the pre-staged probe row: same resolved
    // relation, the base publish paid OUTSIDE the timed unit
    "corpus_snapshot_resolve" -> snapshotDeltaOracle,
    // the point-lookup form: the SAME resolved relation restricted to
    // the fixed %101=5 id set the engine passes explicitly — the
    // subset-of-shared-oracle contract (any pruning bug that loses or
    // invents a doc diverges from the full resolve's rows here)
    "corpus_snapshot_resolve_subset" ->
      s"""WITH r AS ($snapshotDeltaOracle)
         |SELECT doc_id, digest FROM r
         |WHERE doc_id % 101 = 5 AND doc_id <= 1924""".stripMargin,
    // identical classification to corpus_diff — the engine side earns
    // it through publish -> manifest -> shard-file read -> base64
    // decode instead of carving in-plan
    "corpus_snapshot_diff" -> snapshotDiffOracle,
    "corpus_snapshot_diff_probe" -> snapshotDiffOracle,
    // same two phases as the engine: md5-prefix pre-filter, then a
    // per-stratum rank over survivors
    "sample_stratified" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5(doc_id::VARCHAR || '#sample') AS hx
        |  FROM documents
        |)
        |SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS INTEGER) AS sample_rank
        |  FROM h WHERE substr(hx, 1, 1) IN ('0','1','2','3')
        |) WHERE sample_rank <= 10""".stripMargin,
    // same md5-nibble shard + (hash, doc_id) rank the engine computes
    "corpus_shard" ->
      """WITH h AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || '#shard') AS hx
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
        |    AS INTEGER) AS shard_id,
        |  CAST(row_number() OVER (
        |    PARTITION BY (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
        |    ORDER BY hx, doc_id) AS INTEGER) AS shard_pos
        |FROM h""".stripMargin,
    // Asymmetric containment: both directions off the one
    // intersection relation, each normalized by its contained side
    "dedup_containment" ->
      s"""WITH $jaccardCtes, d AS (
         |  SELECT doc_a, doc_b, i, ca.n AS na, cb.n AS nb
         |  FROM inter
         |  JOIN cnt ca ON ca.doc_id = doc_a
         |  JOIN cnt cb ON cb.doc_id = doc_b
         |)
         |SELECT contained, container, containment FROM (
         |  SELECT doc_a AS contained, doc_b AS container, i / na AS containment FROM d
         |  UNION ALL
         |  SELECT doc_b AS contained, doc_a AS container, i / nb AS containment FROM d
         |) WHERE containment >= 0.7""".stripMargin,
    // Consolidated report: key union of the three detector relations,
    // left-joined back for the per-family columns. Simhash CTEs are
    // s-prefixed to dodge the jaccardCtes `toks` name.
    "dedup_report" ->
      s"""WITH $jaccardCtes, pj AS (
         |  SELECT doc_a, doc_b, i / (ca.n + cb.n - i) AS jaccard
         |  FROM inter
         |  JOIN cnt ca ON ca.doc_id = doc_a
         |  JOIN cnt cb ON cb.doc_id = doc_b
         |  WHERE i / (ca.n + cb.n - i) >= 0.5
         |), ex AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM documents a JOIN documents b
         |    ON a.doc_id < b.doc_id AND md5(a.text) = md5(b.text)
         |), stoks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
         |  FROM documents
         |), sth AS (
         |  SELECT doc_id, md5(tok) AS m FROM stoks
         |), sbs AS (
         |  SELECT doc_id, i,
         |    CASE WHEN ((strpos('0123456789abcdef',
         |        substr(m, CAST((i // 16) * 4 + 3 - (i % 16) // 4 + 1 AS INTEGER), 1)) - 1)
         |        >> CAST(i % 4 AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END AS v
         |  FROM sth, range(64) t(i)
         |), ssums AS (
         |  SELECT doc_id, i, sum(v) AS s FROM sbs GROUP BY 1, 2
         |), ssb AS (
         |  SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE 0 END AS sbit FROM ssums
         |), sp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(sum(CASE WHEN a.sbit <> b.sbit THEN 1 ELSE 0 END) AS INTEGER) AS hamming
         |  FROM ssb a JOIN ssb b ON a.i = b.i AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |  HAVING sum(CASE WHEN a.sbit <> b.sbit THEN 1 ELSE 0 END) <= 3
         |), keys AS (
         |  SELECT doc_a, doc_b FROM pj
         |  UNION SELECT doc_a, doc_b FROM ex
         |  UNION SELECT doc_a, doc_b FROM sp
         |)
         |SELECT k.doc_a, k.doc_b,
         |  (ex.doc_a IS NOT NULL) AS is_exact,
         |  pj.jaccard AS jaccard,
         |  coalesce(pj.jaccard >= 0.8, FALSE) AS near_dup,
         |  sp.hamming AS simhash_hamming,
         |  CAST((CASE WHEN ex.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |     + (CASE WHEN pj.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |     + (CASE WHEN pj.jaccard >= 0.8 THEN 1 ELSE 0 END)
         |     + (CASE WHEN sp.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
         |    AS n_detectors
         |FROM keys k
         |LEFT JOIN pj ON pj.doc_a = k.doc_a AND pj.doc_b = k.doc_b
         |LEFT JOIN ex ON ex.doc_a = k.doc_a AND ex.doc_b = k.doc_b
         |LEFT JOIN sp ON sp.doc_a = k.doc_a AND sp.doc_b = k.doc_b""".stripMargin,
    // Incremental dedup: exact Jaccard restricted to pairs straddling
    // the batch carve (exactly one side has doc_id % 10 = 0); the
    // batch member is reported as doc_new
    "dedup_incremental" -> incrementalOracle,
    // Same oracle for the persisted-index formulation: the engine-side
    // equality of the two paths is LshIndexSpec's pin; this row makes
    // both independently DuckDB-hash-pinned
    "dedup_index_probe" -> incrementalOracle,
    // Windowed ExactSubstr: 16-token windows, duplicated = seen in >1
    // doc; islands of consecutive duplicated windows give the longest
    // duplicated span (run + 15 tokens); keep = no span of 50+ tokens.
    // Short docs (< 16 tokens) have zero windows and a NULL dup_frac —
    // the LEFT JOIN padding mirrors the engine exactly.
    "dedup_substring" -> substrStatsOracle(),
    // the persisted-index formulation reproduces the one-job rows
    // exactly (doc partition is invisible to window df); engine-side
    // equality is SubstrIndexSpec's pin, this row makes both
    // independently DuckDB-hash-pinned
    "dedup_substring_index" -> substrStatsOracle(),
    // the probe form: the same stats restricted to the %10=0 batch —
    // what stats-after-append reports for exactly those docs, which
    // the engine computes batch-proportionally from the dfs sidecars
    "dedup_substring_probe" ->
      substrStatsOracle("\nWHERE d.doc_id % 10 = 0"),
    // benchmark = every 50th doc_id; overlap = distinct shared 8-grams
    "decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents
        |  WHERE len(regexp_split_to_array(lower(text), '\s+')) >= 8
        |), sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(t[i:i+7], ' ')
        |      for i in range(1, len(t) - 6)])) AS gram
        |  FROM toks
        |), bench AS (
        |  SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM sh JOIN bench USING (gram)
        |  WHERE doc_id % 50 <> 0
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id % 50 <> 0""".stripMargin,
    // Bloom probe replay — see [[bloomOracle]]
    "decontaminate_bloom" -> bloomOracle,
    // the persisted filter round-trips losslessly and Bloom union is
    // word-wise OR, so BOTH index forms share the one-job oracle —
    // the driver gate itself pins build+probe and build+append+probe
    // equal to the single-pass result
    "decontaminate_index_probe" -> bloomOracle,
    "decontaminate_incremental" -> bloomOracle,
    // rank assigned over the full vocab here vs after the limit in the
    // engine — identical because the limit selects by the same order
    // WordPiece oracle: rebuild the vocab (top-50 words + alphabet),
    // then replay greedy max-munch per distinct word in a recursive
    // CTE — the correlated subquery picks the longest matching entry,
    // so hash equality pins every cursor decision.
    "corpus_wordpiece" ->
      """WITH RECURSIVE w AS (
        |  SELECT tok AS word, count(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(trim(lower(text)),
        |      '\s+')) AS tok
        |    FROM documents) t
        |  WHERE tok <> '' GROUP BY 1
        |), topw AS (
        |  SELECT word AS v FROM w ORDER BY n DESC, word LIMIT 50
        |), chars AS (
        |  SELECT DISTINCT unnest([ substr(word, i + 1, 1)
        |    for i in range(0, length(word)) ]) AS v FROM w
        |), vocab AS (
        |  SELECT v FROM topw UNION SELECT v FROM chars
        |), s AS (
        |  SELECT word, n, CAST(1 AS BIGINT) AS pos,
        |    CAST(NULL AS VARCHAR) AS piece
        |  FROM w
        |  UNION ALL
        |  SELECT word, n,
        |    pos + length((SELECT v FROM vocab
        |      WHERE v = substr(s.word, s.pos, length(v))
        |      ORDER BY length(v) DESC, v LIMIT 1)),
        |    (SELECT v FROM vocab
        |      WHERE v = substr(s.word, s.pos, length(v))
        |      ORDER BY length(v) DESC, v LIMIT 1)
        |  FROM s WHERE pos <= length(word)
        |)
        |SELECT piece, CAST(sum(n) AS BIGINT) AS n_occurrences
        |FROM s WHERE piece IS NOT NULL
        |GROUP BY piece
        |ORDER BY n_occurrences DESC, piece LIMIT 40""".stripMargin,

    "corpus_vocab" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents
        |), a AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM tok GROUP BY token
        |)
        |SELECT token, cnt, df,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER)
        |    AS rank
        |FROM a ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    // 2-/3-gram repetition stats; null algebra mirrors the engine's
    // left-join padding for docs shorter than the gram width
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_concat(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))],
        |    CASE WHEN len(toks) >= 3 THEN
        |      [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |       for i in range(1, len(toks) - 1)]
        |    ELSE [] END)) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), c0 AS (
        |  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2
        |), c AS (
        |  SELECT doc_id, c, len(string_split(gram, ' ')) AS n FROM c0
        |), a AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_grams2,
        |    CAST(max(CASE WHEN n = 2 THEN c END) AS BIGINT) AS top2_cnt,
        |    CAST(sum(CASE WHEN n = 2 AND c > 1 THEN c END) AS BIGINT) AS dup2_occ,
        |    CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n_grams3,
        |    CAST(sum(CASE WHEN n = 3 AND c > 1 THEN c END) AS BIGINT) AS dup3_occ
        |  FROM c GROUP BY doc_id
        |)
        |SELECT d.doc_id, a.n_grams2, a.top2_cnt,
        |  a.top2_cnt / CAST(a.n_grams2 AS DOUBLE) AS top2_frac,
        |  coalesce(a.dup2_occ, 0) / CAST(a.n_grams2 AS DOUBLE) AS dup2_frac,
        |  a.n_grams3,
        |  coalesce(a.dup3_occ, 0) / CAST(a.n_grams3 AS DOUBLE) AS dup3_frac,
        |  (a.top2_cnt / CAST(a.n_grams2 AS DOUBLE) <= 0.2 AND
        |   coalesce(a.dup3_occ, 0) / CAST(a.n_grams3 AS DOUBLE) <= 0.18)
        |    AS keep_rep
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,
    // Full SimHash pin: bit i of a token's hash = bit (i%4) of md5 hex
    // nibble (i/16)*4 + 3-(i%16)/4 (the engine's four 16-bit
    // Guard-drift oracle: rebuilds the engine's whole lifecycle
    // arithmetically — build-time hot set over the raw corpus
    // (cutoff = floor(0.1·N0), N0 = ALL docs, the build convention),
    // the banner-batch union, post-guard document frequencies, the
    // report cutoff over the docs the index holds (distinct doc_ids
    // with ≥1 post-guard shingle — the sets-cardinality convention),
    // and the identity-free df histogram. Text shingles here vs
    // xxhash64 in the engine: counts agree absent hash collisions,
    // the standing convention of the dedup oracle family.
    "lsh_guard_drift" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents
        |), n0 AS (SELECT count(*) AS c FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest([ array_to_string(t[i:i+2], ' ')
        |      for i in range(1, len(t) - 1) ]) AS shingle
        |    FROM tk WHERE len(t) >= 3)
        |), hot0 AS (
        |  SELECT shingle
        |  FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1), n0
        |  WHERE df > CAST(floor(0.1 * c) AS BIGINT)
        |), corpus AS (
        |  SELECT doc_id, t FROM tk
        |  UNION ALL
        |  SELECT doc_id + 30000000 AS doc_id,
        |    list_concat(['zq0','zq1','zq2','zq3','zq4','zq5'], t) AS t
        |  FROM tk WHERE doc_id % 5 = 3
        |), shg AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT DISTINCT doc_id, shingle FROM (
        |      SELECT doc_id, unnest([ array_to_string(t[i:i+2], ' ')
        |        for i in range(1, len(t) - 1) ]) AS shingle
        |      FROM corpus WHERE len(t) >= 3)) s
        |  WHERE NOT EXISTS (SELECT 1 FROM hot0 h WHERE h.shingle = s.shingle)
        |), nn AS (SELECT count(DISTINCT doc_id) AS n FROM shg),
        |drift AS (
        |  SELECT df FROM
        |    (SELECT shingle, CAST(count(*) AS BIGINT) AS df
        |     FROM shg GROUP BY 1), nn
        |  WHERE df > CAST(floor(0.1 * n) AS BIGINT)
        |)
        |SELECT df, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(*) * (df * (df - 1) // 2) AS BIGINT) AS worst_case_pairs
        |FROM drift GROUP BY df""".stripMargin,
    // Skew-report oracle: same 8-gram derivation, same rank
    // arithmetic (r = ceil(q*n)), same fixed-order share division.
    "skew_report" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest([ array_to_string(t[i:i+7], ' ')
        |        for i in range(1, len(t) - 6) ]) AS shingle
        |    FROM tk WHERE len(t) >= 8)
        |), d AS (
        |  SELECT shingle, CAST(count(*) AS BIGINT) AS df
        |  FROM sh GROUP BY 1
        |), st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(df) AS BIGINT) AS mass
        |  FROM d
        |), hist AS (
        |  SELECT df, count(*) AS k FROM d GROUP BY 1
        |), cum AS (
        |  SELECT df, sum(k) OVER (ORDER BY df
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist
        |), quants AS (
        |  SELECT 'p50_df' AS metric, CAST(min(df) AS DOUBLE) AS value,
        |    CAST(NULL AS VARCHAR) AS key
        |  FROM cum, st WHERE cum >= ceil(n_keys * 0.5)
        |  UNION ALL
        |  SELECT 'p90_df', CAST(min(df) AS DOUBLE),
        |    CAST(NULL AS VARCHAR)
        |  FROM cum, st WHERE cum >= ceil(n_keys * 0.9)
        |  UNION ALL
        |  SELECT 'p99_df', CAST(min(df) AS DOUBLE),
        |    CAST(NULL AS VARCHAR)
        |  FROM cum, st WHERE cum >= ceil(n_keys * 0.99)
        |), top AS (
        |  SELECT 'hot_key_share' AS metric,
        |    CAST(df AS DOUBLE) / CAST(mass AS DOUBLE) AS value,
        |    shingle AS key
        |  FROM d, st ORDER BY df DESC, shingle LIMIT 10
        |)
        |SELECT 'n_keys' AS metric, CAST(n_keys AS DOUBLE) AS value,
        |  CAST(NULL AS VARCHAR) AS key FROM st
        |UNION ALL
        |SELECT 'mass', CAST(mass AS DOUBLE), CAST(NULL AS VARCHAR)
        |FROM st
        |UNION ALL SELECT * FROM quants
        |UNION ALL SELECT * FROM top""".stripMargin,

    // Edit-distance oracle: rebuild each doc's mutated key closed-form
    // and brute-force the O(n^2) levenshtein join the engine's
    // deletion-neighborhood candidates + verify must equal exactly.
    "dedup_edit" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    substr(md5(CAST(doc_id // 4 AS VARCHAR) || '#ed'), 1, 12)
        |      AS base,
        |    CAST(doc_id % 12 AS INTEGER) AS p,
        |    doc_id % 4 AS v
        |  FROM documents
        |), keys AS (
        |  SELECT doc_id,
        |    CASE v
        |      WHEN 1 THEN substr(base, 1, p) || 'z' || substr(base, p + 2)
        |      WHEN 2 THEN substr(base, 1, p) || substr(base, p + 2)
        |      WHEN 3 THEN substr(base, 1, p) || 'z' || substr(base, p + 1)
        |      ELSE base
        |    END AS key
        |  FROM k
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        |FROM keys a JOIN keys b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.key, b.key) <= 1""".stripMargin,

    // big-endian conv chunks, re-derived here by nibble); banding is
    // pigeonhole-complete at maxDist 3, so all-pairs hamming IS the
    // operator's result set
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents
        |), th AS (
        |  SELECT doc_id, md5(tok) AS m FROM toks
        |), bs AS (
        |  SELECT doc_id, i,
        |    CASE WHEN ((strpos('0123456789abcdef',
        |        substr(m, CAST((i // 16) * 4 + 3 - (i % 16) // 4 + 1 AS INTEGER), 1)) - 1)
        |        >> CAST(i % 4 AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM th, range(64) t(i)
        |), sums AS (
        |  SELECT doc_id, i, sum(v) AS s FROM bs GROUP BY 1, 2
        |), sb AS (
        |  SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE 0 END AS sbit FROM sums
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(sum(CASE WHEN a.sbit <> b.sbit THEN 1 ELSE 0 END) AS INTEGER) AS hamming
        |FROM sb a JOIN sb b ON a.i = b.i AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING sum(CASE WHEN a.sbit <> b.sbit THEN 1 ELSE 0 END) <= 3""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS re_tokens
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
        |  CAST(len(list_filter(toks, x -> x IN ('a','the','of','and'))) AS INTEGER) AS stop_cnt,
        |  len(list_filter(toks, x -> x IN ('a','the','of','and'))) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
        |  (len(toks) >= 20 AND len(toks) <= 1000 AND
        |   len(list_filter(toks, x -> x IN ('a','the','of','and'))) / CAST(len(toks) AS DOUBLE) >= 0.01) AS keep
        |FROM t""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS INTEGER) AS en_score,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INTEGER) AS de_score,
        |    CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS INTEGER) AS fr_score,
        |    CAST(len(list_filter(toks, x -> x IN ('el','los','las','y','es'))) AS INTEGER) AS es_score
        |  FROM t
        |)
        |SELECT doc_id, lang AS lang_label,
        |  en_score, de_score, fr_score, es_score,
        |  CASE
        |    WHEN en_score >= de_score AND en_score >= fr_score
        |         AND en_score >= es_score AND en_score > 0 THEN 'en'
        |    WHEN de_score >= fr_score AND de_score >= es_score
        |         AND de_score > 0 THEN 'de'
        |    WHEN fr_score >= es_score AND fr_score > 0 THEN 'fr'
        |    WHEN es_score > 0 THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |FROM sc""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    // BM25: every step mirrors the Spark expression tree — integer
    // counts, then double arithmetic in the same association order;
    // bare decimal literals are CAST to DOUBLE because DuckDB parses
    // them as DECIMAL (whose exact arithmetic diverges from IEEE).
    // The ln() is why both sides round to 6 decimals.
    "text_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
        |), corpus AS (
        |  SELECT avg(dl) AS avgdl FROM dl
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('join', 'scan', 'merge', 'vector') GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |)
        |SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,
        |  CAST(d.dl AS BIGINT) AS dl, CAST(f.df AS BIGINT) AS df,
        |  round(
        |    ln((n.n_docs - f.df + CAST(0.5 AS DOUBLE)) /
        |        (f.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) *
        |      (t.tf * CAST(2.2 AS DOUBLE)) /
        |      (t.tf + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl / c.avgdl)),
        |    6) AS bm25
        |FROM tf t
        |JOIN df f USING (term)
        |JOIN dl d USING (doc_id)
        |CROSS JOIN corpus c
        |CROSS JOIN n""".stripMargin,
    // PII scrub: synthetic email/phone/SSN injected identically on
    // both sides, then the same RE2/Java-portable patterns count and
    // redact; the scrubbed text is compared by length + md5.
    // TF-IDF oracle: same counts, same rounded idf, same ranking.
    "corpus_tfidf" ->
      """WITH tok AS (
        |  SELECT source, t AS token FROM (
        |    SELECT source, unnest(regexp_split_to_array(
        |      trim(lower(text)) || ' kwa' || substr(md5(source), 1, 6)
        |        || CASE WHEN doc_id % 2 = 0
        |          THEN ' kwb' || substr(md5(source), 7, 6)
        |          ELSE '' END,
        |      '\s+')) AS t
        |    FROM documents) WHERE t <> ''
        |), tf AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2
        |), d AS (
        |  SELECT token, CAST(count(DISTINCT source) AS BIGINT) AS df
        |  FROM tf GROUP BY 1
        |), ns AS (
        |  SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_src FROM tf
        |), scored AS (
        |  SELECT tf.source, tf.token, tf.tf, d.df,
        |    CAST(tf.tf AS DOUBLE) *
        |      round(ln(CAST(n_src AS DOUBLE) / CAST(d.df AS DOUBLE)),
        |        12) AS score
        |  FROM tf JOIN d USING (token) CROSS JOIN ns
        |), ranked AS (
        |  SELECT source, token, tf, df, score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, token) AS rank
        |  FROM scored WHERE score > 0
        |)
        |SELECT source, CAST(rank AS INTEGER) AS rank, token, tf, df,
        |  round(score, 6) AS score
        |FROM ranked WHERE rank <= 5""".stripMargin,

    // PMI oracle: same 1-based adjacent pairs, same count threshold,
    // same division order and 12-decimal log rounding.
    "corpus_pmi" ->
      """WITH tk AS (
        |  SELECT list_filter(regexp_split_to_array(trim(lower(text)),
        |    '\s+'), w -> w <> '') AS t
        |  FROM documents
        |), u AS (
        |  SELECT unnest(t) AS w FROM tk
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM u GROUP BY 1
        |), bg AS (
        |  SELECT unnest([ {'w1': t[i], 'w2': t[i + 1]}
        |    for i in range(1, len(t)) ], recursive := true)
        |  FROM tk
        |), big AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
        |), nt AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM uni
        |), mt AS (SELECT CAST(sum(c2) AS BIGINT) AS m FROM big)
        |SELECT w1, w2, c2,
        |  round(ln(
        |    (CAST(c2 AS DOUBLE) / CAST(m AS DOUBLE)) /
        |      ((CAST(a.c1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        (CAST(b.c1 AS DOUBLE) / CAST(n AS DOUBLE)))),
        |    12) AS pmi
        |FROM big
        |JOIN uni a ON a.w = big.w1
        |JOIN uni b ON b.w = big.w2
        |CROSS JOIN nt CROSS JOIN mt
        |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin,

    // Readability oracle: same counts, same formula order; constants
    // cast from the same decimal literals land on the same doubles.
    "text_readability" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    greatest(len(regexp_extract_all(
        |      translate(text, 'eo', '.!'), '[^.!?]+[.!?]')), 1)
        |      AS n_sent,
        |    greatest(len(list_filter(regexp_split_to_array(
        |      trim(lower(text)), '\s+'), w -> w <> '')), 1) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(n_words AS INTEGER) AS n_words,
        |  CAST(n_sent AS INTEGER) AS n_sentences,
        |  CAST(n_syll AS INTEGER) AS n_syllables,
        |  round(CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE)
        |      * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE)
        |      * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    6) AS flesch
        |FROM a""".stripMargin,

    // Sentence oracle: same injected punctuation (translate), same
    // terminator-run matches — RE2's plain + is linear and equals the
    // JVM side's possessive ++ on these disjoint classes.
    "text_sentences" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    regexp_extract_all(translate(text, 'eo', '.!'),
        |      '[^.!?]+[.!?]') AS arr
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(arr) AS INTEGER) AS n_sentences,
        |  CAST(COALESCE(list_sum([ length(x) for x in arr ]), 0)
        |    AS BIGINT) AS total_chars,
        |  CAST(COALESCE(list_max([ length(x) for x in arr ]), 0)
        |    AS INTEGER) AS max_chars,
        |  COALESCE(md5(arr[1]), 'none') AS first_fp
        |FROM a""".stripMargin,

    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    lower(text) || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com or +1-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' ssn 123-45-6789.' AS t
        |  FROM documents
        |), scrub AS (
        |  SELECT doc_id, t,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(t,
        |          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |        '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |  FROM aug
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INTEGER) AS n_ssns,
        |  CAST(len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        |  CAST(length(scrubbed) AS INTEGER) AS n_chars,
        |  md5(scrubbed) AS scrub_fp
        |FROM scrub""".stripMargin,
    // Unigram surprisal: same decimal mediation as the engine — each
    // token's -ln(p) rounded to 12 decimals, summed as DECIMAL(28,12)
    // (order-independent), the mean cast to double and rounded to 6
    // (ln's last-ulp divergence between libm and the JVM).
    "text_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents
        |), v AS (
        |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
        |), t AS (
        |  SELECT sum(cnt) AS total FROM v
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(round(-ln(CAST(cnt AS DOUBLE) / total), 12)
        |      AS DECIMAL(28,12)) AS sp
        |  FROM tok JOIN v USING (token) CROSS JOIN t
        |), p AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    sum(sp) AS sp_sum
        |  FROM sc GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens,
        |  round(CAST(sp_sum AS DOUBLE) / n_tokens, 6) AS surprisal
        |FROM p""".stripMargin,
    // KN 5-gram perplexity: full training + scoring replay — counts
    // at five orders (continuation counts = distinct higher-order
    // grams with the first column dropped), the interpolation chain
    // layered one CTE per order so the IEEE expression shape matches
    // the engine's withColumn chain exactly; ln rounds to 12 and
    // sums as DECIMAL(28,12), the mean rounds to 6.
    "text_perplexity" ->
      s"""WITH $knOracleCtes
        |SELECT doc_id, split, n_scored, nll, bucket FROM kn_b""".stripMargin,
    // the frozen model trains on the SAME reference corpus, so the
    // index-scored batch must match the one-job rows for those docs
    "text_perplexity_index" ->
      s"""WITH $knOracleCtes
        |SELECT doc_id, split, n_scored, nll, bucket FROM kn_b
        |WHERE doc_id % 10 = 0""".stripMargin,
    // textcat out-of-place distance: exact integer ranks throughout;
    // the argmin folds into a binary-collation min over
    // lpad(distance)||lang (the profile_columns tie-break trick)
    "text_langid_ngram" ->
      """WITH grams AS (
        |  SELECT doc_id, lang, substr(p, i, 3) AS gram
        |  FROM (
        |    SELECT doc_id, lang, '_' || word || '_' AS p
        |    FROM (
        |      SELECT doc_id, lang,
        |        unnest(list_filter(
        |          regexp_split_to_array(trim(lower(text)), '\s+'),
        |          x -> x <> '')) AS word
        |      FROM documents)
        |  ), unnest(range(1, len(p) - 1)) AS t(i)
        |), train AS (
        |  SELECT * FROM grams
        |  WHERE strpos('0123456789abcdef',
        |    substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 1)) - 1
        |    <= 13
        |), lang_prof AS (
        |  SELECT lang, gram, rnk AS lang_rnk FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, gram) AS rnk
        |    FROM train GROUP BY lang, gram)
        |  WHERE rnk <= 40
        |), doc_prof AS (
        |  SELECT doc_id, gram, rnk FROM (
        |    SELECT doc_id, gram, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rnk
        |    FROM grams GROUP BY doc_id, gram)
        |  WHERE rnk <= 20
        |), langs AS (SELECT DISTINCT lang FROM lang_prof
        |), dist AS (
        |  SELECT d.doc_id, l.lang,
        |    CAST(sum(COALESCE(abs(d.rnk - p.lang_rnk), 40)) AS BIGINT)
        |      AS distance
        |  FROM doc_prof d CROSS JOIN langs l
        |  LEFT JOIN lang_prof p ON p.lang = l.lang AND p.gram = d.gram
        |  GROUP BY d.doc_id, l.lang
        |), best AS (
        |  SELECT doc_id,
        |    min(lpad(CAST(distance AS VARCHAR), 10, '0') || lang) AS m
        |  FROM dist GROUP BY doc_id
        |)
        |SELECT b.doc_id, doc.lang AS lang_label, substr(b.m, 11) AS lang_pred,
        |  CAST(substr(b.m, 1, 10) AS BIGINT) AS distance
        |FROM best b
        |JOIN (SELECT doc_id, lang FROM documents) doc USING (doc_id)""".stripMargin,
    "corpus_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS word
        |    FROM documents)
        |  GROUP BY word
        |), p AS (
        |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count FROM (
        |    SELECT cnt,
        |      unnest([substr(word, i, 2) for i in range(1, len(word))])
        |        AS pair
        |    FROM w WHERE len(word) >= 2)
        |  GROUP BY pair
        |)
        |SELECT pair, pair_count,
        |  CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
        |    AS INTEGER) AS rank
        |FROM p ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,
    "quality_filter" -> qualityFilterOracle,
    // heuristic chain ⋈ KN chain on doc_id; keep and drop_reasons
    // extend the quality_filter expressions with the LM-tail rule.
    // The indexed twin shares the SAME oracle: its frozen model is
    // trained on the same reference corpus, and the engine's scoring
    // path is shared verbatim between the two forms.
    "quality_filter_lm" -> qualityFilterLmOracle,
    "quality_filter_lm_indexed" -> qualityFilterLmOracle,

    // Profiling oracles: exact replays — the top value folds into
    // lpad(count)|value strings so the tie-break is binary-collation
    // max on both engines, not arg_max nondeterminism.
    "profile_columns" ->
      """WITH long AS (
        |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v
        |  FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |  FROM documents
        |), vc AS (
        |  SELECT col_name, v, count(*) AS cnt FROM long GROUP BY 1, 2
        |)
        |SELECT col_name,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(sum(cnt) FILTER (v IS NULL), 0) AS BIGINT)
        |    AS n_nulls,
        |  CAST(count(*) FILTER (v IS NOT NULL) AS BIGINT) AS n_distinct,
        |  min(v) AS min_value, max(v) AS max_value,
        |  substr(max(CASE WHEN v IS NOT NULL
        |    THEN lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || v END),
        |    14) AS top_value,
        |  CAST(substr(max(CASE WHEN v IS NOT NULL
        |    THEN lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || v END),
        |    1, 12) AS BIGINT) AS top_count
        |FROM vc GROUP BY col_name""".stripMargin,

    "check_expectations" ->
      """SELECT 'doc_id_unique' AS check_name, n = 0 AS passed,
        |  n AS metric FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT doc_id FROM documents GROUP BY doc_id
        |    HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'doc_id_complete', n = 0, n FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE doc_id IS NULL)
        |UNION ALL
        |SELECT 'n_chars_range', n = 0, n FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE n_chars < 0 OR n_chars > 100000)
        |UNION ALL
        |SELECT 'lang_complete', n = 0, n FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE lang IS NULL)
        |UNION ALL
        |SELECT 'orders_customer_fk', n = 0, n FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'lineitem_orders_fk', n = 0, n FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_orderkey = l.l_orderkey))""".stripMargin,

    // PSI oracle: same smoothed integer ratios, same 12-decimal
    // rounded log terms, same DECIMAL(28,12) sum.
    "drift_psi" ->
      """WITH d AS (
        |  SELECT source, least(9, n_chars // 200) AS bin FROM documents
        |), cell AS (
        |  SELECT source, bin, count(*) AS c FROM d GROUP BY 1, 2
        |), srct AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY 1
        |), bint AS (
        |  SELECT bin, CAST(sum(c) AS BIGINT) AS cb FROM cell GROUP BY 1
        |), tt AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM cell
        |), grid AS (
        |  SELECT s.source, s.t, b.i AS bin
        |  FROM srct s, (SELECT unnest(range(10)) AS i) b
        |), f AS (
        |  SELECT g.source, g.t,
        |    COALESCE(c.c, 0) AS c, COALESCE(bt.cb, 0) AS cb, tt.tt
        |  FROM grid g
        |  LEFT JOIN cell c ON c.source = g.source AND c.bin = g.bin
        |  LEFT JOIN bint bt ON bt.bin = g.bin
        |  CROSS JOIN tt
        |), terms AS (
        |  SELECT source, t,
        |    CAST(round(
        |      ((CAST(c + 1 AS DOUBLE) / CAST(t + 10 AS DOUBLE))
        |        - (CAST(cb + 1 AS DOUBLE) / CAST(tt + 10 AS DOUBLE)))
        |      * round(ln((CAST(c + 1 AS DOUBLE) / CAST(t + 10 AS DOUBLE))
        |          / (CAST(cb + 1 AS DOUBLE) / CAST(tt + 10 AS DOUBLE))),
        |        12),
        |      12) AS DECIMAL(28,12)) AS term
        |  FROM f
        |)
        |SELECT source, max(t) AS n_docs,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
        |FROM terms GROUP BY source""".stripMargin,
    "leakage_split" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR || '#split'), 1, 1)) - 1 AS nib,
        |    regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, nib,
        |    unnest(list_distinct([array_to_string(t[i:i+7], ' ')
        |      for i in range(1, len(t) - 6)])) AS shingle
        |  FROM s WHERE len(t) >= 8
        |), test_grams AS (
        |  SELECT DISTINCT shingle FROM sh WHERE nib = 15
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_leaked_grams
        |  FROM sh JOIN test_grams USING (shingle)
        |  WHERE nib <= 13
        |  GROUP BY doc_id
        |)
        |SELECT s.doc_id,
        |  CAST(coalesce(h.n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams,
        |  coalesce(h.n_leaked_grams, 0) > 0 AS leaked
        |FROM s LEFT JOIN hits h USING (doc_id)
        |WHERE s.nib <= 13""".stripMargin,
    // same nibble bucketing the engine computes: 0-d train, e val,
    // f test
    "split_assign" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR || '#split'), 1, 1)) - 1 AS nib
        |  FROM documents
        |)
        |SELECT doc_id, CAST(nib AS INTEGER) AS split_bucket,
        |  CASE WHEN nib <= 13 THEN 'train'
        |       WHEN nib = 14 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h""".stripMargin,
    // same shard hash + (md5, doc_id) order + running-sum chunking;
    // all-integer arithmetic so the layout matches bit-for-bit
    "pack_sequences" ->
      """WITH h AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || '#shard') AS hx,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, hx, n_tokens,
        |    CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
        |      AS INTEGER) AS shard_id
        |  FROM h
        |), c AS (
        |  SELECT doc_id, shard_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY hx, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s
        |)
        |SELECT doc_id, shard_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_off
        |FROM c""".stripMargin,
    // pack_sequences' layout unrolled per (doc, pack): one row per
    // pack a document's token span intersects, all-integer slicing
    "pack_segments" ->
      """WITH h AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || '#shard') AS hx,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, hx, n_tokens,
        |    CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
        |      AS INTEGER) AS shard_id
        |  FROM h
        |), c AS (
        |  SELECT doc_id, shard_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY hx, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s
        |), seg AS (
        |  SELECT doc_id, shard_id,
        |    CAST(cum - n_tokens AS BIGINT) AS st, CAST(cum AS BIGINT) AS en
        |  FROM c WHERE n_tokens > 0
        |), x AS (
        |  SELECT doc_id, shard_id, st, en,
        |    unnest(range(st // 2048, (en - 1) // 2048 + 1)) AS p
        |  FROM seg
        |)
        |SELECT doc_id, shard_id, CAST(p AS BIGINT) AS pack_id,
        |  CAST(greatest(st, p * 2048) - p * 2048 AS BIGINT) AS seg_off,
        |  CAST(least(en, (p + 1) * 2048) - greatest(st, p * 2048) AS BIGINT)
        |    AS seg_len
        |FROM x""".stripMargin,
    // integer-count ratios rounded at 6; uniform target mix
    "mix_weights" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT sum(n_docs) AS tot_docs, sum(n_tokens) AS tot_tokens,
        |    count(*) AS n_sources
        |  FROM per
        |)
        |SELECT source, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / tot_docs, 6) AS doc_frac,
        |  round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS token_frac,
        |  round(CAST(tot_docs AS DOUBLE) / (n_sources * n_docs), 6)
        |    AS weight
        |FROM per CROSS JOIN tot""".stripMargin,
    // mix_weights' rounded weight column replayed (same round-6
    // arithmetic the green mix_weights oracle pins), then the same
    // IEEE-exact keep-if-u<p machinery as sample_weighted
    "mix_apply" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT sum(n_docs) AS tot_docs, count(*) AS n_sources FROM per
        |), w AS (
        |  SELECT source,
        |    round(CAST(tot_docs AS DOUBLE) / (n_sources * n_docs), 6)
        |      AS weight
        |  FROM per CROSS JOIN tot
        |), h AS (
        |  SELECT d.doc_id, d.source,
        |    least(CAST(1.0 AS DOUBLE), CAST(0.5 AS DOUBLE) * w.weight) AS p,
        |    CAST(CAST('0x' || substr(md5(d.doc_id::VARCHAR || '#mix'),
        |        1, 15) AS BIGINT) AS DOUBLE)
        |      / CAST(1152921504606846976 AS BIGINT) AS u
        |  FROM documents d JOIN w USING (source)
        |)
        |SELECT doc_id, source, p, u FROM h WHERE u < p""".stripMargin,
    // Bernoulli keep-if-u<p with p = min(1, 0.25·n_chars/400); the
    // uniform u is the 60-bit md5 prefix normalized by 2^60 — int64→
    // double conversion, multiply, divide, compare are all IEEE-exact,
    // so the keep set reproduces bit-for-bit cross-engine
    "sample_weighted" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    least(CAST(1.0 AS DOUBLE),
        |      CAST(0.25 AS DOUBLE) * n_chars / CAST(400.0 AS DOUBLE)) AS p,
        |    CAST(CAST('0x' || substr(md5(doc_id::VARCHAR || '#wsample'),
        |        1, 15) AS BIGINT) AS DOUBLE)
        |      / CAST(1152921504606846976 AS BIGINT) AS u
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, p, u FROM h WHERE u < p""".stripMargin,
    // at most 15 survivors per source by salted-hash rank
    "domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR || '#cap'), doc_id) AS rk
        |  FROM documents
        |)
        |SELECT doc_id, source, CAST(rk AS INTEGER) AS cap_rank
        |FROM r WHERE rk <= 15""".stripMargin,
    // KMV sketch replay: same 60-bit md5-prefix hash, same per-source
    // k-minima, same merge (re-rank the union of the per-source
    // minima), same (k−1)·2^60/kth estimate — all-integer until the
    // final IEEE-exact double arithmetic, so even the estimate
    // hash-matches
    "corpus_kmv" -> kmvOracle,
    "corpus_kmv_index" -> kmvOracle,
    // Full HLL replay: same md5-60-bit hash, register index = low 10
    // bits, rho via length(bin(rem)) (both engines strip leading
    // zeros), Z exact as 2^51-scaled BIGINT, alpha written as the
    // identical literal chain so the doubles agree bit-for-bit; the
    // linear-counting ln rounds to 6 decimals (repo libm convention)
    "corpus_hll" -> hllOracle,
    "corpus_hll_native" -> hllOracle,
    "sim_pca" -> pcaOracle,
    // Entropy replay: the same stacked value counts; each term
    // (p·ln p) rounds to 12 and sums as DECIMAL(28,12), negate before
    // the double cast (sign-symmetric rounding, same bits either way)
    "profile_entropy" ->
      """WITH lg AS (
        |  SELECT col_name, v FROM (
        |    SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v
        |    FROM documents
        |    UNION ALL SELECT 'text', text FROM documents
        |    UNION ALL SELECT 'lang', lang FROM documents
        |    UNION ALL SELECT 'source', source FROM documents
        |    UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |    FROM documents)
        |  WHERE v IS NOT NULL
        |), vc AS (
        |  SELECT col_name, v, count(*) AS cnt FROM lg GROUP BY 1, 2
        |), t AS (
        |  SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS k
        |  FROM vc GROUP BY 1
        |), terms AS (
        |  SELECT vc.col_name, t.n, t.k,
        |    CAST(round((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |      AS DECIMAL(28,12)) AS tm
        |  FROM vc JOIN t ON t.col_name = vc.col_name
        |)
        |SELECT col_name, max(n) AS n_rows,
        |  CAST(max(k) AS BIGINT) AS n_distinct,
        |  round(CAST(-sum(tm) AS DOUBLE), 6) AS entropy,
        |  CASE WHEN max(k) > 1
        |    THEN round(CAST(-sum(tm) AS DOUBLE)
        |      / round(ln(CAST(max(k) AS DOUBLE)), 12), 6)
        |    ELSE 0.0 END AS norm_entropy
        |FROM terms GROUP BY col_name""".stripMargin,
    // the persisted index paths merge by the sketches' own union
    // semantics over a full partition of the corpus, so one job over
    // the whole table IS their oracle
    "corpus_hll_index" -> hllOracle,
    "corpus_cms_index" -> cmsOracle,
    // CMS replay: the 4x64 grid and the top-20 probe are all exact
    // int64 — salted md5 buckets, count, min; no float anywhere
    "corpus_cms" -> cmsOracle,
    // Curriculum replay: the engine's 1+((rank-1)k) div n formula IS
    // ntile(k) — the oracle uses the window function directly, so any
    // drift in the two-level rank machinery breaks the hash
    "curriculum_phases" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    greatest(len(regexp_extract_all(
        |      translate(text, 'eo', '.!'), '[^.!?]+[.!?]')), 1)
        |      AS n_sent,
        |    greatest(len(list_filter(regexp_split_to_array(
        |      trim(lower(text)), '\s+'), w -> w <> '')), 1) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        |  FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    round(CAST(206.835 AS DOUBLE)
        |      - CAST(1.015 AS DOUBLE)
        |        * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |      - CAST(84.6 AS DOUBLE)
        |        * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |      6) AS flesch
        |  FROM a
        |)
        |SELECT doc_id, flesch,
        |  CAST(ntile(3) OVER (ORDER BY flesch DESC, doc_id)
        |    AS INTEGER) AS phase,
        |  md5(CAST(doc_id AS VARCHAR) || '#curriculum') AS ord_key
        |FROM r""".stripMargin,
    // Growth replay: the full HLL pipeline twice (v1 carve, whole
    // table) and the rounded estimate difference
    "corpus_growth" ->
      s"""WITH v1 AS (${hllEstSql("doc_id % 10 < 8")}),
         |v2 AS (${hllEstSql("TRUE")})
         |SELECT v2.source, coalesce(v1.est, 0.0) AS est_v1,
         |  v2.est AS est_v2,
         |  round(v2.est - coalesce(v1.est, 0.0), 6) AS est_new
         |FROM v2 LEFT JOIN v1 ON v1.source = v2.source""".stripMargin,
    // Budget-prefix replay: one plain cumulative window over the
    // (flesch desc, doc_id) order — doc_id makes the order unique, so
    // RANGE vs ROWS framing can't diverge; the engine's two-level
    // bucket decomposition must reproduce this global cumsum exactly
    "budget_select" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    greatest(len(regexp_extract_all(
        |      translate(text, 'eo', '.!'), '[^.!?]+[.!?]')), 1)
        |      AS n_sent,
        |    greatest(len(list_filter(regexp_split_to_array(
        |      trim(lower(text)), '\s+'), w -> w <> '')), 1) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
        |    round(CAST(206.835 AS DOUBLE)
        |      - CAST(1.015 AS DOUBLE)
        |        * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |      - CAST(84.6 AS DOUBLE)
        |        * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |      6) AS flesch
        |  FROM a
        |), c AS (
        |  SELECT doc_id, flesch, n_words,
        |    CAST(sum(n_words) OVER (ORDER BY flesch DESC, doc_id)
        |      AS BIGINT) AS cum_tokens
        |  FROM r
        |)
        |SELECT doc_id, flesch, n_words, cum_tokens
        |FROM c WHERE cum_tokens <= 10000""".stripMargin,
    // Sentence-packing replay: the greedy (chunk id, running tokens)
    // recurrence as a recursive CTE — every boundary decision the
    // engine's row-local fold makes is re-derived step by step
    "doc_chunks_sentences" ->
      """WITH RECURSIVE snt AS (
        |  SELECT doc_id, g AS i, arr[g] AS sent,
        |    CAST(len(regexp_split_to_array(trim(arr[g]), '\s+'))
        |      AS INTEGER) AS tk
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(translate(text, 'eo', '.!'),
        |            '[^.!?]+[.!?]') AS arr
        |        FROM documents) t,
        |    LATERAL (SELECT unnest(generate_series(1, len(arr))) AS g) s
        |), r AS (
        |  SELECT doc_id, i, sent, tk, 0 AS cid, tk AS cur
        |  FROM snt WHERE i = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.i, s.sent, s.tk,
        |    CASE WHEN r.cur + s.tk > 20 THEN r.cid + 1 ELSE r.cid END,
        |    CASE WHEN r.cur + s.tk > 20 THEN s.tk ELSE r.cur + s.tk END
        |  FROM r JOIN snt s ON s.doc_id = r.doc_id AND s.i = r.i + 1
        |)
        |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        |  CAST(count(*) AS INTEGER) AS n_sentences,
        |  CAST(sum(tk) AS INTEGER) AS n_tokens,
        |  string_agg(sent, '' ORDER BY i) AS chunk_text
        |FROM r GROUP BY doc_id, cid""".stripMargin,
    // Catalog scan vs DuckDB's information_schema over the same
    // parquet views, normalizing type renderings to Spark's
    // simpleString. One genuine divergence: parquet timestamps not
    // adjusted to UTC are TIMESTAMP_NTZ to Spark, plain TIMESTAMP to
    // DuckDB. (events.ts — parquet TIMESTAMP(NANOS) — needs no
    // carve-out: the source layer normalizes it to timestamp_ntz from
    // the file footer, and DuckDB coerces ns→µs the same way.)
    "catalog_columns" ->
      """SELECT table_name, column_name,
        |  CAST(ordinal_position AS INTEGER) AS ordinal_position,
        |  CASE WHEN data_type = 'BIGINT' THEN 'bigint'
        |    WHEN data_type = 'INTEGER' THEN 'int'
        |    WHEN data_type = 'DOUBLE' THEN 'double'
        |    WHEN data_type = 'FLOAT' THEN 'float'
        |    WHEN data_type = 'VARCHAR' THEN 'string'
        |    WHEN data_type = 'BLOB' THEN 'binary'
        |    WHEN data_type = 'DATE' THEN 'date'
        |    WHEN data_type = 'TIMESTAMP' THEN 'timestamp_ntz'
        |    WHEN data_type = 'TIMESTAMP WITH TIME ZONE' THEN 'timestamp'
        |    WHEN data_type = 'FLOAT[]' THEN 'array<float>'
        |    WHEN data_type = 'DOUBLE[]' THEN 'array<double>'
        |    ELSE lower(data_type) END AS data_type
        |FROM information_schema.columns""".stripMargin,
    // Full cross-engine pin of the LSH ANN pipeline: the ±1 hyperplane
    // coefficients are md5-byte-0-parity (md5 hex char 2 is byte 0's
    // low nibble), so DuckDB rebuilds the exact signatures, bands,
    // candidate sets, scores, and ranks.
    "sim_ann_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), dims AS (
        |  SELECT len(v) AS nd FROM e LIMIT 1
        |), coef AS (
        |  SELECT p, list(CASE WHEN substr(md5(p::VARCHAR || ',' || d::VARCHAR), 2, 1)
        |                      IN ('1','3','5','7','9','b','d','f')
        |                 THEN 1.0 ELSE -1.0 END ORDER BY d) AS cl
        |  FROM (SELECT p, unnest(range(nd)) AS d FROM range(16) t(p), dims)
        |  GROUP BY p
        |), sigb AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN list_dot_product(v, cl) > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS s
        |  FROM e, coef GROUP BY vec_id
        |), banded AS (
        |  SELECT vec_id, b AS band, (s >> CAST(b * 4 AS INTEGER)) & 15 AS key
        |  FROM sigb, range(4) t(b)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id
        |  FROM banded a JOIN banded q USING (band, key)
        |  WHERE q.vec_id < 5 AND a.vec_id <> q.vec_id
        |), sc AS (
        |  SELECT query_id, c.vec_id,
        |    list_dot_product(av.v, qv.v) /
        |      (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(qv.v, qv.v))) AS score
        |  FROM cand c JOIN e av ON av.vec_id = c.vec_id JOIN e qv ON qv.vec_id = c.query_id
        |)
        |SELECT query_id, vec_id, score, rk FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
        |  FROM sc
        |) WHERE rk <= 10""".stripMargin,
    // Full cross-engine pin of the IVF pipeline: the shared Lloyd
    // prefix (seeds from the first 16 vectors, two decimal-mediated
    // iterations), probes = 4 nearest cells for the first 5 vectors.
    "sim_ann_ivf" ->
      s"""WITH $lloydCellCtes, probes AS (
        |  SELECT vec_id AS query_id, cell FROM ac WHERE rn <= 4 AND vec_id < 5
        |), cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id
        |  FROM probes p JOIN assigned a USING (cell)
        |  WHERE a.vec_id <> p.query_id
        |), sc AS (
        |  SELECT query_id, cd.vec_id,
        |    list_dot_product(av.v, qv.v) /
        |      (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(qv.v, qv.v))) AS score
        |  FROM cand cd JOIN e av ON av.vec_id = cd.vec_id JOIN e qv ON qv.vec_id = cd.query_id
        |)
        |SELECT query_id, vec_id, score, rk FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
        |  FROM sc
        |) WHERE rk <= 10""".stripMargin,
    // ADC variant: same probing, candidates scored against their SQ8
    // codes (the sim_quantize arithmetic, cast back to DOUBLE) — the
    // dequantization factor cancels in the cosine, so the oracle
    // scores against the raw integer code vector
    "sim_ann_ivf_adc" ->
      s"""WITH $lloydCellCtes, qz AS (
        |  SELECT vec_id,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |    ELSE list_transform(v, x -> CAST(CAST(floor(x / scale + 0.5)
        |      AS INTEGER) AS DOUBLE)) END AS qd
        |  FROM (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |    FROM e)
        |), probes AS (
        |  SELECT vec_id AS query_id, cell FROM ac WHERE rn <= 4 AND vec_id < 5
        |), cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id
        |  FROM probes p JOIN assigned a USING (cell)
        |  WHERE a.vec_id <> p.query_id
        |), sc AS (
        |  SELECT query_id, cd.vec_id,
        |    list_dot_product(az.qd, qv.v) /
        |      (sqrt(list_dot_product(az.qd, az.qd)) * sqrt(list_dot_product(qv.v, qv.v))) AS score
        |  FROM cand cd JOIN qz az ON az.vec_id = cd.vec_id JOIN e qv ON qv.vec_id = cd.query_id
        |)
        |SELECT query_id, vec_id, score, rk FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
        |  FROM sc
        |) WHERE rk <= 10""".stripMargin,
    // Recall@10 replay: BOTH legs are existing oracles — the ADC
    // chain (qz/probes/cand/sc, verbatim from sim_ann_ivf_adc) and the
    // brute top-10 — joined on (query_id, vec_id); n_hits/n_true is
    // an exact small-integer ratio (n_true = the per-query brute
    // count, not a fixed k), so even the recall double hash-matches
    "sim_recall_eval" ->
      s"""WITH $lloydCellCtes, qz AS (
        |  SELECT vec_id,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |    ELSE list_transform(v, x -> CAST(CAST(floor(x / scale + 0.5)
        |      AS INTEGER) AS DOUBLE)) END AS qd
        |  FROM (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |    FROM e)
        |), probes AS (
        |  SELECT vec_id AS query_id, cell FROM ac WHERE rn <= 4 AND vec_id < 5
        |), cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id
        |  FROM probes p JOIN assigned a USING (cell)
        |  WHERE a.vec_id <> p.query_id
        |), sc AS (
        |  SELECT query_id, cd.vec_id,
        |    list_dot_product(az.qd, qv.v) /
        |      (sqrt(list_dot_product(az.qd, az.qd)) * sqrt(list_dot_product(qv.v, qv.v))) AS score
        |  FROM cand cd JOIN qz az ON az.vec_id = cd.vec_id JOIN e qv ON qv.vec_id = cd.query_id
        |), ann AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
        |    FROM sc
        |  ) WHERE rk <= 10
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
        |), bsc AS (
        |  SELECT query_id, vec_id,
        |    list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS score
        |  FROM e, q WHERE vec_id <> query_id
        |), brute AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
        |    FROM bsc
        |  ) WHERE rk <= 10
        |), hits AS (
        |  SELECT query_id, count(*) AS c
        |  FROM ann JOIN brute USING (query_id, vec_id)
        |  GROUP BY query_id
        |), bc AS (
        |  SELECT query_id, count(*) AS n_true FROM brute GROUP BY query_id
        |)
        |SELECT bc.query_id,
        |  CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(bc.n_true AS DOUBLE) AS recall
        |FROM bc
        |LEFT JOIN hits h USING (query_id)""".stripMargin,
    // Persisted-IVF probe: the same Lloyd arithmetic over the index
    // carve (ei), query carve assigned to its 4 nearest final
    // centroids, scored within probed cells, top-10
    "sim_index_probe" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), dims AS (
         |  SELECT unnest(range(1, len(v) + 1)) AS d FROM (SELECT v FROM e LIMIT 1)
         |), ei AS (
         |  SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0
         |), ${lloydCtesOver("ei")}, q AS (
         |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 10 = 0
         |), probes AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.query_id, c2.cell,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_dot_product(qv, cv) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
         |          DESC NULLS LAST,
         |        cell) AS rn
         |    FROM q, c2
         |  ) WHERE rn <= 4
         |), cand AS (
         |  SELECT DISTINCT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a USING (cell)
         |), sc AS (
         |  SELECT cand.query_id, cand.vec_id,
         |    list_dot_product(m.v, q.qv) /
         |      (sqrt(list_dot_product(m.v, m.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS score
         |  FROM cand
         |  JOIN ei m ON m.vec_id = cand.vec_id
         |  JOIN q ON q.query_id = cand.query_id
         |)
         |SELECT query_id, vec_id, score, rk FROM (
         |  SELECT query_id, vec_id, score,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
         |  FROM sc
         |) WHERE rk <= 10""".stripMargin,
    // ADC probe of the persisted index: identical probing over the ei
    // carve, candidates scored against their SQ8 codes
    "sim_index_probe_adc" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), dims AS (
         |  SELECT unnest(range(1, len(v) + 1)) AS d FROM (SELECT v FROM e LIMIT 1)
         |), ei AS (
         |  SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0
         |), ${lloydCtesOver("ei")}, qz AS (
         |  SELECT vec_id,
         |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
         |    ELSE list_transform(v, x -> CAST(CAST(floor(x / scale + 0.5)
         |      AS INTEGER) AS DOUBLE)) END AS qd
         |  FROM (SELECT vec_id, v,
         |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
         |    FROM ei)
         |), q AS (
         |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 10 = 0
         |), probes AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.query_id, c2.cell,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_dot_product(qv, cv) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
         |          DESC NULLS LAST,
         |        cell) AS rn
         |    FROM q, c2
         |  ) WHERE rn <= 4
         |), cand AS (
         |  SELECT DISTINCT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a USING (cell)
         |), sc AS (
         |  SELECT cand.query_id, cand.vec_id,
         |    list_dot_product(z.qd, q.qv) /
         |      (sqrt(list_dot_product(z.qd, z.qd)) * sqrt(list_dot_product(q.qv, q.qv))) AS score
         |  FROM cand
         |  JOIN qz z ON z.vec_id = cand.vec_id
         |  JOIN q ON q.query_id = cand.query_id
         |)
         |SELECT query_id, vec_id, score, rk FROM (
         |  SELECT query_id, vec_id, score,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
         |  FROM sc
         |) WHERE rk <= 10""".stripMargin,
    // SemDeDup: the shared Lloyd prefix (bit-identical decimal-
    // mediated centroids), then per vector the max cosine to any
    // LOWER-id member of its cell; keep = below eps (0.3), with a
    // cell's first member keeping its NULL max (the coalesce mirrors
    // the engine's null algebra)
    "semdedup" ->
      s"""WITH $lloydCellCtes, mem AS (
         |  SELECT a.vec_id, a.cell, e.v FROM assigned a JOIN e USING (vec_id)
         |), pr AS (
         |  SELECT b.vec_id,
         |    max(list_dot_product(a.v, b.v) /
         |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))
         |      AS max_prior_sim
         |  FROM mem a JOIN mem b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  GROUP BY b.vec_id
         |)
         |SELECT m.vec_id, m.cell, pr.max_prior_sim,
         |  coalesce(pr.max_prior_sim < 0.3, TRUE) AS keep
         |FROM mem m LEFT JOIN pr USING (vec_id)""".stripMargin,
    // Corpus composition: source × cell counts off the same assignment
    "cluster_mix" ->
      s"""WITH $lloydCellCtes, j AS (
         |  SELECT d.source, a.cell
         |  FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
         |), c AS (
         |  SELECT source, cell, CAST(count(*) AS BIGINT) AS n
         |  FROM j GROUP BY 1, 2
         |)
         |SELECT source, cell, n,
         |  n / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS frac_of_source,
         |  n / CAST(sum(n) OVER (PARTITION BY cell) AS DOUBLE) AS frac_of_cell
         |FROM c""".stripMargin,
    "sim_projection" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), sg AS (
        |  SELECT j,
        |    [ CAST(1 - 2 * ((strpos('0123456789abcdef',
        |          substr(md5('jl#' || j || '#' || (i - 1)), 2, 1)) - 1)
        |        % 2) AS DOUBLE)
        |      for i in range(1, 65) ] AS sgn
        |  FROM range(0, 8) t(j)
        |)
        |SELECT vec_id,
        |  max(CASE WHEN j = 0 THEN d END) AS p0,
        |  max(CASE WHEN j = 1 THEN d END) AS p1,
        |  max(CASE WHEN j = 2 THEN d END) AS p2,
        |  max(CASE WHEN j = 3 THEN d END) AS p3,
        |  max(CASE WHEN j = 4 THEN d END) AS p4,
        |  max(CASE WHEN j = 5 THEN d END) AS p5,
        |  max(CASE WHEN j = 6 THEN d END) AS p6,
        |  max(CASE WHEN j = 7 THEN d END) AS p7
        |FROM (
        |  SELECT vec_id, j, list_dot_product(v, sgn) AS d
        |  FROM e CROSS JOIN sg)
        |GROUP BY vec_id""".stripMargin,
    "sim_norms" ->
      """SELECT vec_id,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2
        |FROM embeddings""".stripMargin,
    "sim_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
        |), sc AS (
        |  SELECT query_id, vec_id,
        |    list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS score
        |  FROM e, q WHERE vec_id <> query_id
        |)
        |SELECT query_id, vec_id, score, rk FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
        |  FROM sc
        |) WHERE rk <= 10""".stripMargin,
    "mm_headers" ->
      """SELECT doc_id AS media_id, 'unknown' AS format,
        |  -1 AS width, -1 AS height, -1 AS channels,
        |  -1 AS sample_rate, -1 AS bit_depth,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        |FROM documents""".stripMargin,
    // Perceptual-hash media dedup: the oracle recomputes the md5-
    // derived 9x8 pixel grid arithmetically and takes the dHash
    // bit-by-bit; the engine round-trips the same pixels through real
    // BMP bytes and the from-scratch decoder — hash equality pins the
    // codec path lossless end-to-end. All-pairs here (500 docs at
    // verify scale); the engine bands.
    "mm_near_dup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[(i // 8) * 9 + (i % 8) + 1]
        |              < px[(i // 8) * 9 + (i % 8) + 2]
        |           THEN 1 ELSE 0 END for i in range(0, 64) ] AS bits
        |  FROM g
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END))
        |      AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |) WHERE hamming <= 3""".stripMargin,
    // Video clip hash: 4 frames x 72 md5-derived pixels; per-frame
    // dHash bits folded rotate-then-xor (clip bit j = frame f's bit
    // (j - (3-f)) mod 64, summed mod 2) — the rotation keeps static
    // clips from collapsing to signature 0. The 288-token reach means
    // the raw corpus never collides on its own, so the fixture PLANTS
    // twins (doc_id+900000000 for doc_id%100=7): one column-0 pixel of
    // frames 0-2 forced to 255, flipping ≤1 clip bit each — Hamming
    // ≤3 guaranteed, the pigeonhole banding exhaustive at ≤3, so the
    // oracle's positive path is live every round (>0 rows); the
    // oracle recomputes the same twins arithmetically
    "mm_video_near_dup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 288) ] AS px
        |  FROM t
        |), g AS (
        |  SELECT doc_id, px FROM g0
        |  UNION ALL
        |  SELECT doc_id + 900000000 AS doc_id,
        |    [ CASE WHEN i IN (1, 82, 163) THEN 255 ELSE px[i] END
        |      for i in range(1, 289) ] AS px
        |  FROM g0 WHERE doc_id % 100 = 7
        |), s AS (
        |  SELECT doc_id,
        |    [ (  CASE WHEN px[  0 + (((j + 61) % 64) // 8) * 9 + (((j + 61) % 64) % 8) + 1]
        |              < px[  0 + (((j + 61) % 64) // 8) * 9 + (((j + 61) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[ 72 + (((j + 62) % 64) // 8) * 9 + (((j + 62) % 64) % 8) + 1]
        |              < px[ 72 + (((j + 62) % 64) // 8) * 9 + (((j + 62) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[144 + (((j + 63) % 64) // 8) * 9 + (((j + 63) % 64) % 8) + 1]
        |              < px[144 + (((j + 63) % 64) // 8) * 9 + (((j + 63) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[216 + (j // 8) * 9 + (j % 8) + 1]
        |              < px[216 + (j // 8) * 9 + (j % 8) + 2] THEN 1 ELSE 0 END
        |      ) % 2 for j in range(0, 64) ] AS bits
        |  FROM g
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END))
        |      AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |) WHERE hamming <= 3""".stripMargin,
    // Cluster form of the video near-dup graph: the same arithmetic
    // signature recompute, then min-label connected components via a
    // recursive transitive closure over the Hamming <= 3 pairs —
    // every clip (base + planted twins) labeled, singletons
    // themselves. The ENGINE collapses identical-signature classes
    // before its banded join (bounded output); equivalence of the two
    // derivations is also spec-pinned JVM-side. The *_index twins
    // below share each oracle verbatim: the engine answers them from
    // the committed SigIndex segments (build + append carves whose
    // union is the whole corpus) instead of re-decoding — identical
    // rows by the shared-oracle contract.
    "mm_video_clusters" -> mmVideoClustersOracle,
    "mm_video_clusters_index" -> mmVideoClustersOracle,
    "mm_clusters_index" -> mmClustersOracle,
    "mm_audio_clusters_index" -> mmAudioClustersOracle,
    // Persisted-signature-index probe: the image signature recompute,
    // pairs restricted to batch (%10=0) x corpus (%10≠0) — the engine
    // answers from committed segments + a batch-only decode, the
    // oracle from the arithmetic derivation; equal rows pin both the
    // segment union (build + append carves) and the banding
    "mm_sig_index_probe" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[(i // 8) * 9 + (i % 8) + 1]
        |              < px[(i // 8) * 9 + (i % 8) + 2]
        |           THEN 1 ELSE 0 END for i in range(0, 64) ] AS bits
        |  FROM g
        |)
        |SELECT doc_new, doc_idx, hamming FROM (
        |  SELECT a.doc_id AS doc_new, b.doc_id AS doc_idx,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END))
        |      AS INTEGER) AS hamming
        |  FROM s a JOIN s b
        |    ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |) WHERE hamming <= 3""".stripMargin,
    // Guarded probe: the same signature recompute, but candidates
    // pass through the corpus-side star-cap at cap 1 — a corpus
    // (band, key) bucket with 2+ members contributes only its min-id
    // rep. The oracle recomputes the engine's 16-bit band keys from
    // the bit grid (bit i of the signature = bits[i+1], so band b's
    // key = sum of bits[b*16+j+1] << j), so equal rows pin the key
    // derivation AND the cap semantics cross-engine
    "mm_sig_index_probe_guarded" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[(i // 8) * 9 + (i % 8) + 1]
        |              < px[(i // 8) * 9 + (i % 8) + 2]
        |           THEN 1 ELSE 0 END for i in range(0, 64) ] AS bits
        |  FROM g
        |), bb AS (
        |  SELECT doc_id, bd.band AS band,
        |    CAST(list_sum(list_transform(range(0, 16),
        |      j -> CAST(bits[bd.band * 16 + j + 1] AS BIGINT)
        |           * (CAST(1 AS BIGINT) << j))) AS BIGINT) AS key
        |  FROM s, (SELECT unnest(range(0, 4)) AS band) bd
        |), cb AS (
        |  SELECT doc_id, band, key FROM bb WHERE doc_id % 10 <> 0
        |), st AS (
        |  SELECT band, key, count(*) AS sz, min(doc_id) AS rep
        |  FROM cb GROUP BY band, key
        |), candg AS (
        |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_idx
        |  FROM bb a
        |  JOIN cb b ON a.band = b.band AND a.key = b.key
        |  JOIN st ON st.band = a.band AND st.key = a.key
        |  WHERE a.doc_id % 10 = 0 AND (st.sz <= 1 OR b.doc_id = st.rep)
        |)
        |SELECT doc_new, doc_idx, hamming FROM (
        |  SELECT c.doc_new, c.doc_idx,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN sa.bits[i] <> sb.bits[i] THEN 1 ELSE 0 END))
        |      AS INTEGER) AS hamming
        |  FROM candg c JOIN s sa ON sa.doc_id = c.doc_new
        |               JOIN s sb ON sb.doc_id = c.doc_idx
        |) WHERE hamming <= 3""".stripMargin,
    // Image and audio cluster forms: the same signature recomputes as
    // their pair oracles, closed into min-label components (the video
    // technique); universe = every clip, singletons themselves
    "mm_clusters" -> mmClustersOracle,
    "mm_audio_clusters" -> mmAudioClustersOracle,
    // Audio envelope hash: 65 md5-derived samples, bit i compares
    // adjacent bins — 1-D, no grid arithmetic
    "mm_audio_near_dup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 65) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[i] < px[i + 1] THEN 1 ELSE 0 END
        |      for i in range(1, 65) ] AS bits
        |  FROM g
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END))
        |      AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |) WHERE hamming <= 3""".stripMargin,
    "mm_payload_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    // Decoded-feature oracle over the REAL-format corpus: recompute
    // the md5-derived pixels/samples arithmetically (the mm_near_dup
    // technique), then the mean and 16-bin histogram — while the
    // engine round-trips the same content through actual BMP/WAV/AVI
    // bytes and the from-scratch decoders. n_bytes pins the encoders'
    // exact container sizes (54+224 BMP, 44+65 WAV, 1028-byte AVI).
    "mm_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, CASE doc_id % 3 WHEN 0 THEN 72
        |                        WHEN 1 THEN 65 ELSE 288 END) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS media_type,
        |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav'
        |    ELSE 'avi' END AS decoder,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 278 WHEN 1 THEN 109
        |    ELSE 1028 END AS INTEGER) AS n_bytes,
        |  list_sum(px) / CAST(len(px) AS DOUBLE) AS mean_byte,
        |  array_to_string(
        |    [ CAST(list_sum(list_transform(px,
        |        p -> CASE WHEN p // 16 = b THEN 1 ELSE 0 END)) AS VARCHAR)
        |      for b in range(0, 16) ], ',') AS hist
        |FROM g""".stripMargin,
    // Color-moment oracle: every doc's 4:2:0 fixture JPEG decodes to
    // twelve constant blocks whose values are md5 token bytes 0-11;
    // plane means are sums divided by 8/2 (powers of two — IEEE-exact
    // on both engines)
    "mm_color_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 12) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'jpeg' AS decoder,
        |  CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  list_sum(px[1:8]) / 8.0 AS y_mean,
        |  (px[9] + px[10]) / 2.0 AS cb_mean,
        |  (px[11] + px[12]) / 2.0 AS cr_mean
        |FROM g""".stripMargin,
    // Sampled-frame oracle: video rows only (doc_id % 3 = 2), frames
    // 0 and 2 of the 4-frame AVI; frame f's pixel i = md5 byte of
    // token ((f*72 + i) mod ntokens); 224 = one padded-BGR 9x8 DIB.
    "mm_frames" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |  WHERE doc_id % 3 = 2
        |), f AS (
        |  SELECT doc_id, fi,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[((fi * 72 + i) % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[((fi * 72 + i) % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 72) ] AS px
        |  FROM t, (SELECT UNNEST([0, 2]) AS fi)
        |)
        |SELECT doc_id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
        |  224 AS frame_bytes,
        |  list_sum(px) / 72.0 AS frame_mean
        |FROM f""".stripMargin,
    // RLE8-AVI oracle: every doc becomes a 2-frame MS-RLE8 AVI with an
    // INVERTED palette (index i -> gray 255-i); frame 0's pixel i is
    // md5 byte of token (i mod ntokens) (absolute-mode coding), frame 1
    // is constant at token 0's byte (run-mode coding). The oracle
    // recomputes the 255-complemented means; the engine earns them
    // through RIFF walk -> strf parse -> RLE8 expand -> palette.
    "mm_rle_frames" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ 255 - ((strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1)
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
        |  'rle8' AS codec, CAST(9 AS INTEGER) AS width,
        |  CAST(8 AS INTEGER) AS height,
        |  list_sum(px) / 72.0 AS frame_mean
        |FROM g
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INTEGER), 'rle8', CAST(9 AS INTEGER),
        |  CAST(8 AS INTEGER), CAST(px[1] AS DOUBLE)
        |FROM g""".stripMargin,
    // RLE4 oracle: same generative derivation with the LOW nibble and
    // the inverted-stretched 16-entry palette (gray = 255 - 17*nib)
    "mm_rle4_frames" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ 255 - 17 * (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1)
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
        |  'rle4' AS codec, CAST(9 AS INTEGER) AS width,
        |  CAST(8 AS INTEGER) AS height,
        |  list_sum(px) / 72.0 AS frame_mean
        |FROM g
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INTEGER), 'rle4', CAST(9 AS INTEGER),
        |  CAST(8 AS INTEGER), CAST(px[1] AS DOUBLE)
        |FROM g""".stripMargin,
    // CRAM oracle: frame means recomputed arithmetically from the
    // generative md5 bytes — 2-color/8-color block sums are popcounts
    // of the mask words against the color bytes (quadrant bit sets
    // 0x0033/0x00CC/0x3300/0xCC00), frame 1 reuses frame 0's first
    // two block sums (the engine must earn that via SKIP decode).
    "mm_cram_frames" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 16) ] AS m
        |  FROM t
        |), s AS (
        |  SELECT doc_id, m,
        |    bit_count(CAST(m[3]*256 + m[4] AS BIGINT)) AS p0,
        |    bit_count(CAST(m[7]*256 + m[8] AS BIGINT)) AS p3,
        |    bit_count(CAST((m[14]*256 + m[15]) & 51 AS BIGINT)) AS q0,
        |    bit_count(CAST((m[14]*256 + m[15]) & 204 AS BIGINT)) AS q1,
        |    bit_count(CAST((m[14]*256 + m[15]) & 13056 AS BIGINT)) AS q2,
        |    bit_count(CAST((m[14]*256 + m[15]) & 52224 AS BIGINT)) AS q3,
        |    bit_count(CAST(m[11]*256 + m[12] AS BIGINT)) AS p3b
        |  FROM g
        |), sums AS (
        |  SELECT doc_id,
        |    p0*m[1] + (16-p0)*m[2] AS b0,
        |    16*m[5] AS b1,
        |    q0*m[6] + (4-q0)*m[10] + q1*m[7] + (4-q1)*m[11] +
        |      q2*m[8] + (4-q2)*m[12] + q3*m[9] + (4-q3)*m[13] AS b2,
        |    p3*m[16] + (16-p3)*m[3] AS b3,
        |    16*m[6] AS b2n,
        |    p3b*m[9] + (16-p3b)*m[10] AS b3n
        |  FROM s
        |)
        |SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
        |  'cram' AS codec, CAST(8 AS INTEGER) AS width,
        |  CAST(8 AS INTEGER) AS height,
        |  (b0 + b1 + b2 + b3) / 64.0 AS frame_mean
        |FROM sums
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INTEGER), 'cram', CAST(8 AS INTEGER),
        |  CAST(8 AS INTEGER), (b0 + b1 + b2n + b3n) / 64.0
        |FROM sums""".stripMargin,

    // IMA ADPCM oracle: replay the decoder's (predictor, step-index)
    // recurrence over the 64 md5-derived nibble codes in a recursive
    // CTE — all-integer, so sum/min/max hash-match the engine's
    // decode of the real WAV container. Row i=0 is the header
    // predictor sample; row i=64 carries the accumulated features.
    "mm_adpcm_features" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 35) ] AS m
        |  FROM t
        |), tabs AS (
        |  SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |    41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
        |    190,209,230,253,279,307,337,371,408,449,494,544,598,658,
        |    724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,
        |    2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
        |    6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,
        |    16818,18500,20350,22385,24623,27086,29794,32767] AS sv
        |), walk AS (
        |  SELECT doc_id, m, 0 AS i, pred, idx,
        |    pred AS total, pred AS mn, pred AS mx
        |  FROM (
        |    SELECT doc_id, m,
        |      CAST(CASE WHEN m[1] + 256 * m[2] >= 32768
        |           THEN m[1] + 256 * m[2] - 65536
        |           ELSE m[1] + 256 * m[2] END AS BIGINT) AS pred,
        |      m[3] % 89 AS idx
        |    FROM g)
        |  UNION ALL
        |  SELECT doc_id, m, i, p3, ix2,
        |    total + p3, LEAST(mn, p3), GREATEST(mx, p3)
        |  FROM (
        |    SELECT doc_id, m, i, total, mn, mx,
        |      CASE WHEN p2 > 32767 THEN 32767
        |           WHEN p2 < -32768 THEN -32768 ELSE p2 END AS p3,
        |      LEAST(88, GREATEST(0, ix)) AS ix2
        |    FROM (
        |      SELECT doc_id, m, i + 1 AS i, total, mn, mx,
        |        pred + CASE WHEN nib >= 8 THEN -d ELSE d END AS p2,
        |        idx + CASE (nib % 8) WHEN 4 THEN 2 WHEN 5 THEN 4
        |              WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END AS ix
        |      FROM (
        |        SELECT doc_id, m, i, pred, idx, total, mn, mx, nib,
        |          (st >> 3)
        |            + CASE WHEN (nib % 8) >= 4 THEN st ELSE 0 END
        |            + CASE WHEN (nib % 4) >= 2 THEN (st >> 1) ELSE 0 END
        |            + CASE WHEN (nib % 2) = 1 THEN (st >> 2) ELSE 0 END
        |            AS d
        |        FROM (
        |          SELECT w.*,
        |            CASE WHEN (w.i % 2) = 0 THEN w.m[4 + (w.i // 2)] % 16
        |                 ELSE w.m[4 + (w.i // 2)] // 16 END AS nib,
        |            tb.sv[w.idx + 1] AS st
        |          FROM walk w, tabs tb
        |          WHERE w.i < 64)))))
        |SELECT doc_id AS media_id, 'ima_adpcm' AS codec,
        |  CAST(65 AS INTEGER) AS n_samples,
        |  CAST(total AS BIGINT) AS sum_samples,
        |  CAST(mn AS INTEGER) AS min_sample,
        |  CAST(mx AS INTEGER) AS max_sample
        |FROM walk WHERE i = 64""".stripMargin,

    // MS ADPCM oracle: replay the two-tap predictor + adaptive-delta
    // recurrence over the 48 md5-derived codes (HIGH nibble first).
    // DuckDB's // truncates toward zero like C/Scala integer
    // division, so the negative-numerator predictor divide is exact.
    "mm_msadpcm_features" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 30) ] AS m
        |  FROM t
        |), tabs AS (
        |  SELECT [256,512,0,192,240,460,392] AS cv1,
        |    [0,-256,0,64,0,-208,-232] AS cv2,
        |    [230,230,230,230,307,409,512,614,
        |     768,614,512,409,307,230,230,230] AS at
        |), walk AS (
        |  SELECT doc_id, m, 0 AS i, s1, s2, dl, c1, c2,
        |    s1 + s2 AS total, LEAST(s1, s2) AS mn, GREATEST(s1, s2) AS mx
        |  FROM (
        |    SELECT doc_id, m,
        |      CAST(CASE WHEN m[3] + 256 * m[4] >= 32768
        |           THEN m[3] + 256 * m[4] - 65536
        |           ELSE m[3] + 256 * m[4] END AS BIGINT) AS s1,
        |      CAST(CASE WHEN m[5] + 256 * m[6] >= 32768
        |           THEN m[5] + 256 * m[6] - 65536
        |           ELSE m[5] + 256 * m[6] END AS BIGINT) AS s2,
        |      CAST(16 + m[2] * 4 AS BIGINT) AS dl,
        |      tb.cv1[(m[1] % 7) + 1] AS c1, tb.cv2[(m[1] % 7) + 1] AS c2
        |    FROM g, tabs tb)
        |  UNION ALL
        |  SELECT doc_id, m, i, samp, s1, d2, c1, c2,
        |    total + samp, LEAST(mn, samp), GREATEST(mx, samp)
        |  FROM (
        |    SELECT doc_id, m, i, s1, dl, c1, c2, total, mn, mx,
        |      CASE WHEN p2 > 32767 THEN 32767
        |           WHEN p2 < -32768 THEN -32768 ELSE p2 END AS samp,
        |      LEAST(32767, GREATEST(16, (tb.at[cd + 1] * dl) // 256))
        |        AS d2
        |    FROM (
        |      SELECT doc_id, m, i + 1 AS i, s1, s2, dl, c1, c2,
        |        total, mn, mx, cd,
        |        ((s1 * c1 + s2 * c2) // 256)
        |          + (CASE WHEN cd >= 8 THEN cd - 16 ELSE cd END) * dl
        |          AS p2
        |      FROM (
        |        SELECT w.*,
        |          CASE WHEN (w.i % 2) = 0 THEN w.m[7 + (w.i // 2)] // 16
        |               ELSE w.m[7 + (w.i // 2)] % 16 END AS cd
        |        FROM walk w
        |        WHERE w.i < 48)) x, tabs tb))
        |SELECT doc_id AS media_id, 'ms_adpcm' AS codec,
        |  CAST(50 AS INTEGER) AS n_samples,
        |  CAST(total AS BIGINT) AS sum_samples,
        |  CAST(mn AS INTEGER) AS min_sample,
        |  CAST(mx AS INTEGER) AS max_sample
        |FROM walk WHERE i = 48""".stripMargin,

    // FLAC oracle: lossless coding means the features come straight
    // off the closed-form sample derivation — each m byte twice
    // (constant docs: m[1] 64 times); the engine must earn the same
    // integers through Rice decode + predictor + CRC verification.
    "mm_flac_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 32) ] AS m
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'flac' AS codec,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'constant' WHEN 1 THEN 'verbatim'
        |    WHEN 2 THEN 'fixed1' ELSE 'fixed2' END AS mode,
        |  CAST(64 AS INTEGER) AS n_samples,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 64 * (m[1] - 128)
        |    ELSE 2 * list_sum(m) - 64 * 128 END AS BIGINT)
        |    AS sum_samples,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN m[1] - 128
        |    ELSE list_min(m) - 128 END AS INTEGER) AS min_sample,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN m[1] - 128
        |    ELSE list_max(m) - 128 END AS INTEGER) AS max_sample
        |FROM g""".stripMargin,

    // TIFF oracle: even rows r hold m[c] per column, odd rows are the
    // constant m[r] — sum = 8*sum(m) + 16*sum(odd m). Byte order,
    // PackBits, and WhiteIsZero inversion vary by doc parity but the
    // CONTENT does not, so one expression pins all four variants.
    "mm_tiff_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 16) ] AS m
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'tiff' AS codec,
        |  CASE WHEN doc_id % 2 = 0 THEN 'MM' ELSE 'II' END AS byte_order,
        |  CASE WHEN doc_id % 2 = 0 THEN 'packbits' ELSE 'none' END
        |    AS compression,
        |  CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  CAST(8 * list_sum(m)
        |    + 16 * (m[2] + m[4] + m[6] + m[8] + m[10] + m[12] + m[14]
        |            + m[16]) AS BIGINT) AS sum_gray
        |FROM g""".stripMargin,

    // Animated-GIF oracle: frame 0 sum is the full md5 canvas; frame
    // 1 adjusts only the 4x4 rect's NON-transparent positions
    // (new - old, both closed-form from the same bytes) — pinning the
    // compositor's transparency keying pixel-for-pixel.
    "mm_gif_frames" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 32) ] AS m
        |  FROM t
        |), sums AS (
        |  SELECT doc_id,
        |    2 * 17 * list_sum([ x % 16 for x in m ]) AS s0,
        |    17 * list_sum([
        |      CASE WHEN (m[q + 1] % 16) <> (m[2] % 16)
        |        THEN (m[q + 1] % 16)
        |          - (m[(((2 + q // 4) * 8 + 2 + (q % 4)) % 32) + 1] % 16)
        |        ELSE 0 END
        |      for q in range(0, 16) ]) AS d1
        |  FROM g
        |)
        |SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
        |  'gif' AS codec, CAST(8 AS INTEGER) AS width,
        |  CAST(8 AS INTEGER) AS height, CAST(s0 AS BIGINT) AS sum_gray
        |FROM sums
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INTEGER), 'gif', CAST(8 AS INTEGER),
        |  CAST(8 AS INTEGER), CAST(s0 + d1 AS BIGINT)
        |FROM sums""".stripMargin,

    // PNG palette/Adam7 oracle: gray(p) = (m[p%32] % 16) * 17 (the
    // grayscale palette makes BT.601 the identity), every position
    // hit 8 times across the 16x16 surface — interlace must be
    // content-invisible, so one expression covers both parities.
    "mm_png_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 32) ] AS m
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'png' AS codec,
        |  CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  CAST(8 * 17 * list_sum([ x % 16 for x in m ]) AS BIGINT)
        |    AS sum_gray
        |FROM g""".stripMargin,

    // Audio-analysis oracle: the same IMA replay, but accumulating
    // the decoded sample LIST so zcr/energy/autocorrelation are
    // recomputed closed-form from the full sequence.
    "mm_audio_analysis" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 35) ] AS m
        |  FROM t
        |), tabs AS (
        |  SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |    41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
        |    190,209,230,253,279,307,337,371,408,449,494,544,598,658,
        |    724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,
        |    2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
        |    6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,
        |    16818,18500,20350,22385,24623,27086,29794,32767] AS sv
        |), walk AS (
        |  SELECT doc_id, m, 0 AS i, pred, idx, [pred] AS vs
        |  FROM (
        |    SELECT doc_id, m,
        |      CAST(CASE WHEN m[1] + 256 * m[2] >= 32768
        |           THEN m[1] + 256 * m[2] - 65536
        |           ELSE m[1] + 256 * m[2] END AS BIGINT) AS pred,
        |      m[3] % 89 AS idx
        |    FROM g)
        |  UNION ALL
        |  SELECT doc_id, m, i, p3, ix2, list_append(vs, p3)
        |  FROM (
        |    SELECT doc_id, m, i, vs,
        |      CASE WHEN p2 > 32767 THEN 32767
        |           WHEN p2 < -32768 THEN -32768 ELSE p2 END AS p3,
        |      LEAST(88, GREATEST(0, ix)) AS ix2
        |    FROM (
        |      SELECT doc_id, m, i + 1 AS i, vs,
        |        pred + CASE WHEN nib >= 8 THEN -d ELSE d END AS p2,
        |        idx + CASE (nib % 8) WHEN 4 THEN 2 WHEN 5 THEN 4
        |              WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END AS ix
        |      FROM (
        |        SELECT doc_id, m, i, pred, idx, vs, nib,
        |          (st >> 3)
        |            + CASE WHEN (nib % 8) >= 4 THEN st ELSE 0 END
        |            + CASE WHEN (nib % 4) >= 2 THEN (st >> 1) ELSE 0 END
        |            + CASE WHEN (nib % 2) = 1 THEN (st >> 2) ELSE 0 END
        |            AS d
        |        FROM (
        |          SELECT w.*,
        |            CASE WHEN (w.i % 2) = 0 THEN w.m[4 + (w.i // 2)] % 16
        |                 ELSE w.m[4 + (w.i // 2)] // 16 END AS nib,
        |            tb.sv[w.idx + 1] AS st
        |          FROM walk w, tabs tb
        |          WHERE w.i < 64)))))
        |SELECT doc_id AS media_id, CAST(65 AS INTEGER) AS n_samples,
        |  CAST(len([ i for i in range(2, 66)
        |             if (vs[i] < 0) != (vs[i-1] < 0) ]) AS INTEGER) AS zcr,
        |  CAST(list_sum([ x * x for x in vs ]) AS BIGINT) AS energy,
        |  CAST(list_sum([ vs[i] * vs[i+1]
        |                  for i in range(1, 65) ]) AS BIGINT) AS ac1,
        |  CAST(list_sum([ vs[i] * vs[i+4]
        |                  for i in range(1, 62) ]) AS BIGINT) AS ac4
        |FROM walk WHERE i = 64""".stripMargin,

    // G.711 oracle: both CCITT segment decodes are closed-form per
    // byte (u-law: bias 0x84, stored inverted; A-law: 0x55 XOR, sign
    // bit set = non-negative), recomputed over the same md5 bytes.
    "mm_g711_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 32) ] AS m
        |  FROM t
        |), u AS (
        |  SELECT doc_id, 'ulaw' AS codec,
        |    [ CASE WHEN (255 - b) >= 128
        |        THEN 132 - ((((255 - b) % 16) * 8 + 132)
        |                    * (1 << (((255 - b) // 16) % 8)))
        |        ELSE ((((255 - b) % 16) * 8 + 132)
        |              * (1 << (((255 - b) // 16) % 8))) - 132 END
        |      for b in m ] AS v
        |  FROM g
        |  UNION ALL
        |  SELECT doc_id, 'alaw',
        |    [ CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
        |      CASE WHEN ((xor(b, 85) // 16) % 8) = 0
        |           THEN (xor(b, 85) % 16) * 16 + 8
        |           WHEN ((xor(b, 85) // 16) % 8) = 1
        |           THEN (xor(b, 85) % 16) * 16 + 264
        |           ELSE ((xor(b, 85) % 16) * 16 + 264)
        |             * (1 << (((xor(b, 85) // 16) % 8) - 1)) END
        |      for b in m ] AS v
        |  FROM g
        |)
        |SELECT doc_id AS media_id, codec,
        |  CAST(len(v) AS INTEGER) AS n_samples,
        |  CAST(list_sum(v) AS BIGINT) AS sum_samples,
        |  CAST(list_min(v) AS INTEGER) AS min_sample,
        |  CAST(list_max(v) AS INTEGER) AS max_sample
        |FROM u""".stripMargin,

    // Progressive-JPEG oracle: doc -> 3-scan SOF2 stream (DC Al=1 +
    // refinement + EOBn AC band); decode is lossless by construction,
    // so the 32x16 mean is mean(md5 bytes 0..7).
    "mm_progressive_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 8) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'jpeg' AS decoder,
        |  CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  list_sum(px) / 8.0 AS gray_mean
        |FROM g""".stripMargin,
    // SOF10 oracle: the progressive-ARITHMETIC cell of the JPEG
    // matrix; decode is lossless by construction (five QM-coded
    // scans), so the 32x16 mean is mean(md5 bytes 0..7), decoder
    // kind 'jpeg' (full-resolution reconstruction).
    "mm_sof10_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 8) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'jpeg' AS decoder,
        |  CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  list_sum(px) / 8.0 AS gray_mean
        |FROM g""".stripMargin,
    // Bucketed co-located join: bucketing is a physical layout choice,
    // invisible to semantics — the oracle is the plain join. The plan
    // claim (SortMergeJoin, zero Exchange) is pinned by BucketedSpec.
    "bucketed_join" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(len(regexp_split_to_array(lower(text), '\s+')) AS INTEGER)
        |    AS n_tokens
        |FROM documents""".stripMargin,
    // The composed pipeline: the dedup cluster CTEs chain with the
    // quality CTEs (prefixed q*/g*), the split nibble, and the pack
    // layout CTEs (prefixed p*) into ONE relation — each block is the
    // same SQL its standalone oracle uses, over the survivor set.
    "pipeline_export" -> pipelineExportOracle,
    // the indexed form (cluster keep-set probed from ClusterIndex,
    // LM gate scored through the frozen KnIndex) is row-identical
    // by construction, so ONE replay pins both engine paths
    "pipeline_export_indexed" -> pipelineExportOracle,
    // Partition pruning is a physical layout choice — the oracle is
    // the plain filtered aggregate; BucketedSpec pins PartitionFilters
    // + selected-partition count on the executed plan.
    "partitioned_scan" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE lang = 'en' AND n_chars > 200
        |GROUP BY source""".stripMargin,
    // Arithmetic-JPEG oracle: doc -> 4x2-block SOF9 grayscale JPEG
    // (QM-coded, flat quant, block i = md5 byte of token i); the
    // 32x16 pixel mean is mean(bytes 0..7). Even docs add restart
    // markers — same decoded result by construction.
    "mm_arith_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 8) ] AS px
        |  FROM t
        |)
        |SELECT doc_id AS media_id, 'jpeg_arith' AS decoder,
        |  CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  list_sum(px) / 8.0 AS gray_mean
        |FROM g""".stripMargin,
    // Embedding near-dup at cosine >= 0.9 over the fixture + planted
    // twins (vec_id%100=7 → vec_id+900000000, first coord × 1.25 →
    // cosine ≥ 0.99381 by construction). The oracle mirrors the
    // engine's banded candidate generation (hyperplane LSH is not
    // exhaustive, so an all-pairs oracle could only agree on empty —
    // the vacuity this plant removes) then scores candidates exactly;
    // same md5-parity plane derivation as sim_ann_lsh, but 64 planes
    // in 4 bands of 16 bits — 4-bit keys go quadratic at corpus scale
    // (SCALE_r12: 127x work at 10x data before this widening).
    // Embedding near-dup at cosine >= 0.9: shared banded-candidate
    // CTEs (simNearDupCtes) feed the pair oracle here and the
    // cluster/index oracles below — one arithmetic derivation, four
    // pins.
    "sim_near_dup" ->
      s"""WITH $simNearDupCtes
         |SELECT vec_a, vec_b,
         |  list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) AS score
         |FROM cand c JOIN e av ON av.vec_id = c.vec_a
         |            JOIN e bv ON bv.vec_id = c.vec_b
         |WHERE list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.9""".stripMargin,
    // Cluster form: the same banded pair graph closed into min-label
    // components (the mediaClusterClosure technique in vec_id space);
    // universe = every vector incl. planted twins, singletons
    // themselves. The ENGINE collapses bit-identical vectors before
    // its banded join (interchangeable vertices: cosine 1 to each
    // other, identical signatures and scores elsewhere) — bounded
    // output; the oracle derives components directly. The _index twin
    // answers from committed SimSigIndex segments (frozen signatures,
    // zero corpus re-projection) — identical rows by construction.
    "sim_clusters" -> simClustersOracle,
    "sim_clusters_index" -> simClustersOracle,
    // Persisted-index probe: batch = the %100=7 originals, corpus =
    // everything else incl. their twins (build + append carves); the
    // engine signs only the batch and answers from committed
    // segments, the oracle recomputes the banded candidates
    // restricted to batch x corpus
    "sim_sig_index_probe" ->
      s"""WITH $simNearDupCtes, candp AS (
         |  SELECT DISTINCT a.vec_id AS vec_new, b.vec_id AS vec_idx
         |  FROM banded a JOIN banded b USING (band, key)
         |  WHERE a.vec_id % 100 = 7 AND a.vec_id < 900000000
         |    AND NOT (b.vec_id % 100 = 7 AND b.vec_id < 900000000)
         |)
         |SELECT vec_new, vec_idx,
         |  list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) AS score
         |FROM candp c JOIN e av ON av.vec_id = c.vec_new
         |             JOIN e bv ON bv.vec_id = c.vec_idx
         |WHERE list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.9""".stripMargin,
    // Guarded probe: banded candidates under the corpus-side star-cap
    // at cap 1 (bucket stats + min-id rep recomputed in SQL over the
    // corpus carve) — equal rows pin that the engine's committed
    // GuardMeta default and the star-cap surface the same verified
    // subset the arithmetic derivation does
    "sim_sig_index_probe_guarded" ->
      s"""WITH $simNearDupCtes, cbg AS (
         |  SELECT vec_id, band, key FROM banded
         |  WHERE NOT (vec_id % 100 = 7 AND vec_id < 900000000)
         |), stg AS (
         |  SELECT band, key, count(*) AS sz, min(vec_id) AS rep
         |  FROM cbg GROUP BY band, key
         |), candg AS (
         |  SELECT DISTINCT a.vec_id AS vec_new, b.vec_id AS vec_idx
         |  FROM banded a
         |  JOIN cbg b ON a.band = b.band AND a.key = b.key
         |  JOIN stg ON stg.band = a.band AND stg.key = a.key
         |  WHERE a.vec_id % 100 = 7 AND a.vec_id < 900000000
         |    AND (stg.sz <= 1 OR b.vec_id = stg.rep)
         |)
         |SELECT vec_new, vec_idx,
         |  list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) AS score
         |FROM candg c JOIN e av ON av.vec_id = c.vec_new
         |             JOIN e bv ON bv.vec_id = c.vec_idx
         |WHERE list_dot_product(av.v, bv.v) /
         |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.9""".stripMargin,
    // hot-band drift histogram over the same banded derivation: the
    // oracle recomputes the bucket sizes the engine reads from frozen
    // sigs (identity-free counts — the skew_report convention; band
    // keys themselves are md5-plane slices no human acts on)
    "sim_guard_drift" ->
      s"""WITH $simNearDupCtes, bsz AS (
         |  SELECT band, key, CAST(count(*) AS BIGINT) AS bucket_size
         |  FROM banded GROUP BY band, key
         |)
         |SELECT bucket_size, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(count(*) * (bucket_size * (bucket_size - 1) // 2) AS BIGINT)
         |    AS worst_case_pairs
         |FROM bsz WHERE bucket_size > 1 GROUP BY bucket_size""".stripMargin,
    // same floor(x/scale + 0.5) quantizer — floor because the two
    // engines' round() tie conventions differ while floor is
    // IEEE-exact; scale left un-rounded (bit-deterministic on both
    // sides by construction)
    "sim_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), sc AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e
        |), q AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |    ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5)
        |      AS INTEGER)) END AS qv
        |  FROM sc
        |)
        |SELECT vec_id, scale,
        |  CAST(list_min(qv) AS INTEGER) AS qmin,
        |  CAST(list_max(qv) AS INTEGER) AS qmax,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  CAST(list_sum(list_transform(qv, y -> CAST(y AS BIGINT) * y))
        |    AS BIGINT) AS ql2,
        |  md5(array_to_string(qv, ',')) AS qfp
        |FROM q""".stripMargin,

    // WARC oracle: the engine parses real WARC framing (and, for odd
    // doc_ids, real per-record gzip members) out of bytes synthesized
    // from the generative derivation; the oracle recomputes every
    // field — payload md5 included — from the same derivation without
    // ever touching container bytes. Hash equality pins the
    // synthesize -> compress -> inflate -> frame-parse path byte-exact.
    "warc_records" ->
      (htmlSynthCtes +
        """, w AS (
          |  SELECT doc_id, source, tk, html,
          |    'https://' || source || '.example.com/' || tk[1] || '/'
          |      || tk[2] AS url,
          |    chr(13) || chr(10) AS crlf
          |  FROM h
          |)
          |SELECT doc_id, CAST(0 AS INTEGER) AS rec_idx,
          |  'warcinfo' AS warc_type,
          |  CAST(NULL AS VARCHAR) AS target_uri,
          |  CAST(NULL AS INTEGER) AS http_status,
          |  CAST(NULL AS VARCHAR) AS mime,
          |  CAST(21 AS BIGINT) AS payload_len,
          |  md5('software: graft/1.0' || crlf) AS payload_fp,
          |  (doc_id % 2 = 1) AS compressed
          |FROM w
          |UNION ALL
          |SELECT doc_id, CAST(1 AS INTEGER), 'request', url,
          |  CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
          |  CAST(length(reqp) AS BIGINT), md5(reqp), (doc_id % 2 = 1)
          |FROM (
          |  SELECT *,
          |    'GET /' || tk[1] || '/' || tk[2] || ' HTTP/1.1' || crlf ||
          |    'host: ' || source || '.example.com' || crlf || crlf AS reqp
          |  FROM w)
          |UNION ALL
          |SELECT doc_id, CAST(2 AS INTEGER), 'response', url,
          |  CAST(200 AS INTEGER), 'text/html',
          |  CAST(length(respp) AS BIGINT), md5(respp), (doc_id % 2 = 1)
          |FROM (
          |  SELECT *,
          |    'HTTP/1.1 200 OK' || crlf ||
          |    'content-type: text/html; charset=utf-8' || crlf ||
          |    'content-length: ' || CAST(length(html) AS VARCHAR) ||
          |    crlf || crlf || html AS respp
          |  FROM w)""").stripMargin,

    // HTML-extraction oracle: expected main text = the token
    // paragraphs plus the decoded entity paragraph (nav and the
    // link-only footer exceed the 0.5 link-density bar; script/style/
    // comments never emit text). The engine earns this through the
    // real tokenizer; the oracle rebuilds it from the derivation.
    "html_extract" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, tk,
        |    array_to_string(
        |      [ array_to_string(tk[10*i+1 : 10*i+10], ' ')
        |        for i in range(0, CAST(ceil(len(tk)/10.0) AS INT)) ],
        |      chr(10))
        |    || chr(10) || 'tom & jerry <3 ''quoted'' & done' AS body
        |  FROM t
        |)
        |SELECT doc_id, tk[1] || ' ' || tk[2] AS title,
        |  CAST(CAST(ceil(len(tk)/10.0) AS INT) + 3 AS INTEGER)
        |    AS n_blocks,
        |  CAST(2 AS INTEGER) AS n_dropped,
        |  CAST(5 AS INTEGER) AS n_links,
        |  CAST(length(body) AS INTEGER) AS body_chars,
        |  md5(body) AS body_fp
        |FROM b""".stripMargin,

    // Paragraph-dedup oracle: same paragraphs (banner + 10-token
    // chunks + source banner), same first-occurrence-by-(doc,idx)
    // rule via the packed min-ordinal, same newline reassembly.
    "paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents
        |), pl AS (
        |  SELECT doc_id,
        |    list_concat(list_concat(
        |      ['accept cookies to continue'],
        |      [ array_to_string(tk[10*i+1 : 10*i+10], ' ')
        |        for i in range(0, CAST(ceil(len(tk)/10.0) AS INT)) ]),
        |      ['brought to you by ' || source]) AS paras
        |  FROM t
        |), p AS (
        |  SELECT doc_id, u.i AS para_idx, u.p AS para FROM (
        |    SELECT doc_id,
        |      unnest([ {'i': i, 'p': paras[i+1]}
        |               for i in range(0, len(paras)) ]) AS u
        |    FROM pl)
        |), f AS (
        |  SELECT md5(para) AS h,
        |    min(doc_id * 1048576 + para_idx) AS first_ord
        |  FROM p GROUP BY 1
        |), k AS (
        |  SELECT doc_id, para_idx, para,
        |    (doc_id * 1048576 + para_idx = first_ord) AS keep
        |  FROM p JOIN f ON md5(para) = f.h
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(length(coalesce(
        |    string_agg(CASE WHEN keep THEN para END, chr(10)
        |      ORDER BY para_idx), '')) AS INTEGER) AS clean_chars,
        |  md5(coalesce(
        |    string_agg(CASE WHEN keep THEN para END, chr(10)
        |      ORDER BY para_idx), '')) AS clean_fp
        |FROM k GROUP BY doc_id""".stripMargin,

    // URL oracle: the engine normalizes the MESSY raw form through
    // the generic parse_url pipeline; the oracle states the canonical
    // result closed-form from the derivation (all synthesized ports
    // are scheme defaults, fragments drop, utm params drop, params
    // sort, //-runs collapse, index.html and trailing slash strip,
    // www. strips, case folds). Path token space is 16 values so
    // canonical-key collisions are live.
    "url_normalize" ->
      """WITH nb AS (
        |  SELECT doc_id, source,
        |    [ strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#url'), i, 1)) - 1
        |      for i in [1, 2, 3, 4, 5, 6] ] AS nv
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN nv[1] % 2 = 0 THEN 'http' ELSE 'HTTPS' END) ||
        |    '://' ||
        |    (CASE WHEN nv[2] % 4 = 0
        |      THEN 'WWW.' || source || '.Example.COM'
        |      ELSE source || '.example.' ||
        |        (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END)
        |      END) ||
        |    (CASE WHEN nv[3] % 2 = 0
        |      THEN (CASE WHEN nv[1] % 2 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END) ||
        |    '/cat//p' || CAST(nv[4] AS VARCHAR) ||
        |    (CASE WHEN nv[5] % 2 = 1 THEN '/index.html' ELSE '/' END) ||
        |    (CASE WHEN nv[1] % 2 = 0
        |      THEN '?utm_source=feed&b=' || CAST(nv[6] % 7 AS VARCHAR)
        |        || '&a=1'
        |      ELSE '?a=1&b=' || CAST(nv[6] % 7 AS VARCHAR) END) ||
        |    '#s' || CAST(nv[6] % 3 AS VARCHAR) AS raw_url,
        |    (CASE WHEN nv[1] % 2 = 0 THEN 'http' ELSE 'https' END) AS pr,
        |    source || '.example.' ||
        |      (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END)
        |      AS host,
        |    nv[4] AS pathn, nv[6] % 7 AS qb
        |  FROM nb
        |), n AS (
        |  SELECT doc_id, raw_url, host,
        |    pr || '://' || host || '/cat/p' || CAST(pathn AS VARCHAR) ||
        |    '?a=1&b=' || CAST(qb AS VARCHAR) AS norm_url,
        |    (CASE WHEN host LIKE '%.co.uk' THEN 'example.co.uk'
        |      ELSE 'example.com' END) AS reg_domain
        |  FROM u
        |), f AS (
        |  SELECT norm_url AS nu, min(doc_id) AS first_doc,
        |    CAST(count(*) AS BIGINT) AS n_same
        |  FROM n GROUP BY 1
        |)
        |SELECT doc_id, raw_url, norm_url, host, reg_domain, first_doc,
        |  (doc_id <> first_doc) AS is_dup, n_same
        |FROM n JOIN f ON n.norm_url = f.nu""".stripMargin,

    // NB-classifier oracle: replays training (train-split token
    // counts under the heuristic verdict) and scoring (Laplace-
    // smoothed, 12-decimal-rounded log terms summed as DECIMAL) —
    // the heuristic verdict CTEs are the quality_filter oracle's.
    "quality_classifier" ->
      (nbOracleCtes + """
        |SELECT pd.doc_id, split, keep AS label, n_tokens,
        |  round(CAST(prior_keep + sk_sum AS DOUBLE), 6) AS score_keep,
        |  round(CAST(prior_drop + sd_sum AS DOUBLE), 6) AS score_drop,
        |  (round(CAST(prior_keep + sk_sum AS DOUBLE), 6) >=
        |   round(CAST(prior_drop + sd_sum AS DOUBLE), 6)) AS pred_keep,
        |  ((round(CAST(prior_keep + sk_sum AS DOUBLE), 6) >=
        |    round(CAST(prior_drop + sd_sum AS DOUBLE), 6)) = keep)
        |    AS agree
        |FROM pd
        |JOIN sp ON pd.doc_id = sp.doc_id
        |JOIN v ON pd.doc_id = v.doc_id
        |CROSS JOIN pr""").stripMargin,
    // Calibration oracle: the same NB chain, margin-binned — every
    // count integral, the rate an exact ratio.
    "classifier_calibration" ->
      (nbOracleCtes + """
        |, base AS (
        |  SELECT pd.doc_id,
        |    round(CAST(prior_keep + sk_sum AS DOUBLE), 6) AS score_keep,
        |    round(CAST(prior_drop + sd_sum AS DOUBLE), 6) AS score_drop,
        |    keep AS label
        |  FROM pd JOIN v ON pd.doc_id = v.doc_id CROSS JOIN pr
        |), binned AS (
        |  SELECT CAST(least(greatest(
        |      floor((score_keep - score_drop) / 10.0), -5.0), 5.0)
        |      AS INTEGER) AS bin,
        |    (score_keep >= score_drop) AS pred_keep, label,
        |    ((score_keep >= score_drop) = label) AS agree
        |  FROM base
        |)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN pred_keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pred_keep,
        |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_label_keep,
        |  CAST(sum(CASE WHEN agree THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_agree,
        |  round(CAST(sum(CASE WHEN agree THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS agree_rate
        |FROM binned GROUP BY bin""").stripMargin,

    // robots.txt oracle: the engine parses the synthesized policy
    // with a real RFC 9309 group/matcher; the oracle states the
    // verdict closed-form per path bucket k (= the url derivation's
    // 4th md5 nibble): /cat/p1 prefix-shadows p10-p15, /cat/p12 and
    // the anchored /cat/p15$ re-allow by longest-match, /*/p7
    // wildcard-blocks, everything else is allowed with no rule.
    "crawl_policy" ->
      """WITH nb AS (
        |  SELECT doc_id, source,
        |    strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR || '#url'), 2, 1)) - 1 AS n2,
        |    strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR || '#url'), 4, 1)) - 1 AS k
        |  FROM documents
        |), u AS (
        |  SELECT doc_id,
        |    source || '.example.' ||
        |      (CASE WHEN n2 % 4 = 1 THEN 'co.uk' ELSE 'com' END) AS host,
        |    '/cat/p' || CAST(k AS VARCHAR) AS path, k
        |  FROM nb
        |)
        |SELECT doc_id, host, path, CAST(4 AS INTEGER) AS n_rules,
        |  (CASE WHEN k IN (1, 7, 10, 11, 13, 14) THEN false
        |    ELSE true END) AS allowed,
        |  (CASE WHEN k = 12 THEN '/cat/p12'
        |        WHEN k = 15 THEN '/cat/p15$'
        |        WHEN k IN (1, 10, 11, 13, 14) THEN '/cat/p1'
        |        WHEN k = 7 THEN '/*/p7'
        |        ELSE NULL END) AS matched_rule
        |FROM u""".stripMargin,

    // Charset oracle: byte counts closed-form per encoding branch
    // (2-byte é in UTF-8, 3-byte BOM, 2 bytes/char + 2-byte BOM in
    // UTF-16LE, 1 byte/char Latin-1); decoded md5 computed directly.
    // The engine must recover identical text through DETECTION.
    "charset_detect" ->
      """WITH t AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    text || ' café' AS decoded
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 2 THEN 'utf-16le'
        |        WHEN doc_id % 4 = 3 THEN 'latin-1'
        |        ELSE 'utf-8' END) AS detected,
        |  (doc_id % 4 = 1 OR doc_id % 4 = 2) AS had_bom,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN n + 6
        |    WHEN 1 THEN n + 9
        |    WHEN 2 THEN 2 * (n + 5) + 2
        |    ELSE n + 5 END AS INTEGER) AS n_bytes,
        |  CAST(n + 5 AS INTEGER) AS n_chars,
        |  md5(decoded) AS decoded_fp
        |FROM t""".stripMargin,

    // ORC oracle: the relation itself from the parquet source — the
    // engine must reach the same rows through the ORC write+read.
    "orc_roundtrip" ->
      """SELECT doc_id, source, n_chars, md5(text) AS text_fp
        |FROM documents""".stripMargin,
    "csv_roundtrip" ->
      """SELECT doc_id, source, n_chars,
        |  'x,"q"' || chr(10) || substr(text, 1, 16) AS tricky
        |FROM documents""".stripMargin,

    // Compaction oracle: the rewrite must be IDENTITY on the relation
    // — layout is the only thing allowed to change.
    "compact_files" ->
      "SELECT doc_id, source, n_chars FROM documents",

    // Schema-evolution oracle: the union-schema read puts NULL len on
    // every generation-1 (even doc_id) row and the real value on
    // generation 2 — misaligning either direction breaks the hash.
    "schema_evolution" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars END AS len,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER)
        |    AS gen
        |FROM documents""".stripMargin,

    // JSONL oracle: rebuild the adversarial prefix (quote, backslash,
    // newline, tab, C0 control, U+1D11E) and the flattened
    // struct/array fields straight off the raw table — the engine
    // must reach the same rows through encode -> escape -> parse.
    "json_roundtrip" ->
      """SELECT doc_id,
        |  'q"b\' || chr(10) || chr(9) || chr(1) || chr(119070)
        |    || substr(text, 1, 16) AS tricky,
        |  source AS src, n_chars AS len,
        |  CAST(n_chars % 7 AS INTEGER) AS a0,
        |  CAST(n_chars % 11 AS INTEGER) AS a1
        |FROM documents""".stripMargin,
    "zorder_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 64 AND 127
        |  AND l_suppkey BETWEEN 4 AND 7
        |GROUP BY l_returnflag""".stripMargin,

    // Sitemap oracle: closed-form urls (the url_normalize derivation)
    // ordered by doc_id within host — the engine must reach the same
    // rows through render -> escape -> StAX parse -> unescape.
    // Archive oracles: names/flags/sizes/content-md5 recomputed
    // closed-form from the same text slices the members carry; the
    // engine must reach them through checksum/CRC-verified parses.
    // Proto oracle: every decoded field recomputed closed-form — a
    // decoder that cannot skip the unknown fields injected on odd
    // docs desyncs and mismatches half the corpus.
    "proto_records" ->
      """SELECT doc_id, doc_id - 500 AS rec_id,
        |  substr(text, 1, 12) AS name,
        |  CAST(doc_id % 89 AS DOUBLE) / CAST(8 AS DOUBLE) AS weight,
        |  (doc_id * 2654435761) % 4294967296 AS checksum,
        |  CAST(4 AS INTEGER) AS n_vals,
        |  doc_id % 7 + doc_id % 11 + doc_id % 13 + n_chars AS sum_vals,
        |  lang, n_chars AS meta_n
        |FROM documents""".stripMargin,

    // Avro oracle: ids/tags/scores recomputed closed-form (scores are
    // integer-derived doubles, IEEE-exact through the 8-byte LE
    // round-trip); the codec column comes from the PARSED metadata.
    "avro_records" ->
      """WITH e AS (
        |  SELECT doc_id, i,
        |    CASE i WHEN 0 THEN substr(text, 1, 8)
        |      WHEN 1 THEN substr(text, 9, 8)
        |      ELSE substr(text, 17, 8) END AS tag
        |  FROM documents, (SELECT unnest(range(3)) AS i) t
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS ordinal,
        |  doc_id * 3 + i AS rec_id, tag,
        |  CAST(doc_id % 97 AS DOUBLE) / CAST(4 AS DOUBLE)
        |    + CAST(i AS DOUBLE) AS score,
        |  CASE WHEN doc_id % 2 = 1 THEN 'deflate' ELSE 'null' END
        |    AS codec
        |FROM e""".stripMargin,

    "tar_members" ->
      """WITH e AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i = 0 THEN 'docs/'
        |      ELSE 'docs/part' || CAST(i - 1 AS VARCHAR) || '.txt' END
        |      AS name,
        |    CASE WHEN i = 0 THEN '5' ELSE '0' END AS flag,
        |    CASE WHEN i = 0 THEN ''
        |      ELSE substr(text, 1 + 16 * CAST(i - 1 AS INTEGER), 16) END
        |      AS content
        |  FROM documents, (SELECT unnest(range(4)) AS i) t
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS ordinal, name, flag,
        |  CAST(strlen(content) AS BIGINT) AS size,
        |  md5(content) AS payload_md5
        |FROM e""".stripMargin,

    "zip_members" ->
      """WITH e AS (
        |  SELECT doc_id, i,
        |    'm' || CAST(i AS VARCHAR) || '.dat' AS name,
        |    CASE WHEN i % 2 = 0 THEN 'stored' ELSE 'deflate' END
        |      AS method,
        |    substr(text, 1 + 20 * CAST(i AS INTEGER), 20) AS content
        |  FROM documents, (SELECT unnest(range(3)) AS i) t
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS ordinal, name, method,
        |  CAST(strlen(content) AS BIGINT) AS size,
        |  md5(content) AS payload_md5
        |FROM e""".stripMargin,

    "sitemap_urls" ->
      """WITH nb AS (
        |  SELECT doc_id, source,
        |    [ strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#url'), i, 1)) - 1
        |      for i in [1, 2, 3, 4, 5, 6] ] AS nv
        |  FROM documents
        |), n AS (
        |  SELECT doc_id,
        |    source || '.example.' ||
        |      (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END)
        |      AS host,
        |    (CASE WHEN nv[1] % 2 = 0 THEN 'http' ELSE 'https' END) ||
        |    '://' || source || '.example.' ||
        |      (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END) ||
        |    '/cat/p' || CAST(nv[4] AS VARCHAR) ||
        |    '?a=1&b=' || CAST(nv[6] % 7 AS VARCHAR) AS loc
        |  FROM nb
        |)
        |SELECT host,
        |  CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id)
        |    AS INTEGER) AS pos,
        |  loc,
        |  '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    AS lastmod,
        |  '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority,
        |  CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n_urls
        |FROM n""".stripMargin,

    // Frontier oracle: closed-form urls + the crawl_policy verdict,
    // ranked per host (allowed first, priority desc, doc_id), waves
    // of 4; disallowed rows carry wave -1.
    "fetch_waves" ->
      """WITH nb AS (
        |  SELECT doc_id, source,
        |    [ strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#url'), i, 1)) - 1
        |      for i in [1, 2, 3, 4, 5, 6] ] AS nv
        |  FROM documents
        |), n AS (
        |  SELECT doc_id,
        |    source || '.example.' ||
        |      (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END)
        |      AS host,
        |    (CASE WHEN nv[1] % 2 = 0 THEN 'http' ELSE 'https' END) ||
        |    '://' || source || '.example.' ||
        |      (CASE WHEN nv[2] % 4 = 1 THEN 'co.uk' ELSE 'com' END) ||
        |    '/cat/p' || CAST(nv[4] AS VARCHAR) ||
        |    '?a=1&b=' || CAST(nv[6] % 7 AS VARCHAR) AS norm_url,
        |    (CASE WHEN nv[4] IN (1, 7, 10, 11, 13, 14) THEN false
        |      ELSE true END) AS allowed,
        |    '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority
        |  FROM nb
        |), r AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY host
        |      ORDER BY allowed DESC, priority DESC, doc_id)
        |      AS INTEGER) AS host_rank
        |  FROM n
        |)
        |SELECT doc_id, host, norm_url, priority, allowed, host_rank,
        |  CAST(CASE WHEN allowed
        |    THEN CAST(floor((host_rank - 1) / 4.0) AS INTEGER)
        |    ELSE -1 END AS INTEGER) AS wave
        |FROM r""".stripMargin,

    "incremental_refresh" -> qualityFilterOracle,

    // Chunking oracle: same width-16/stride-12 window derivation.
    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest([ {'i': i,
        |              'c': array_to_string(tk[i*12+1 : i*12+16], ' ')}
        |      for i in range(0, greatest(
        |        CAST(ceil((len(tk) - 16) / 12.0) AS INT), 0) + 1) ])
        |      AS u
        |  FROM t
        |)
        |SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
        |  CAST(u.i * 12 AS INTEGER) AS start_tok,
        |  CAST(len(string_split(u.c, ' ')) AS INTEGER) AS chunk_tokens,
        |  md5(u.c) AS chunk_fp
        |FROM c""".stripMargin,

    // PageRank oracle: the same md5-derived multigraph and the same
    // three decimal-mediated damped iterations, replayed as chained
    // CTEs. Float literals are written CAST(… AS DOUBLE) so DuckDB's
    // decimal-literal arithmetic can't diverge from the engine's
    // IEEE doubles ((1.0 - 0.85) is NOT the double 0.15).
    // Triangle oracle: same md5 edge derivation, same degree
    // orientation — DuckDB closes the wedges with plain joins. The
    // unnest lives in its own CTE stage: DuckDB 1.0 has a binder bug
    // (INTERNAL Error on "dst") when DISTINCT-over-LEAST consumes an
    // unnest produced in the same chained projection.
    "link_triangles" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |nv AS (
        |  SELECT doc_id,
        |    [ strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#links'), i, 1)) - 1
        |      for i in range(1, 16) ] AS v
        |  FROM documents
        |), e0 AS (
        |  SELECT doc_id AS src,
        |    [ (v[5*j+1]*65536 + v[5*j+2]*4096 + v[5*j+3]*256 +
        |       v[5*j+4]*16 + v[5*j+5]) % n
        |      for j in range(0, 3) ] AS ts
        |  FROM nv CROSS JOIN nn
        |), e AS (
        |  SELECT src, unnest(ts) AS dst FROM e0
        |), u AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM e WHERE src <> dst
        |), deg AS (
        |  SELECT node, count(*) AS dg FROM (
        |    SELECT a AS node FROM u
        |    UNION ALL
        |    SELECT b AS node FROM u) GROUP BY 1
        |), o AS (
        |  SELECT
        |    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
        |         THEN a ELSE b END AS src,
        |    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
        |         THEN b ELSE a END AS dst,
        |    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
        |         THEN db.dg ELSE da.dg END AS dd
        |  FROM u
        |  JOIN deg da ON da.node = u.a
        |  JOIN deg db ON db.node = u.b
        |), tri AS (
        |  SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
        |  FROM o o1
        |  JOIN o o2 ON o1.src = o2.src
        |    AND (o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.dst < o2.dst))
        |  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
        |)
        |SELECT node, count(*) AS n_triangles FROM (
        |  SELECT x AS node FROM tri
        |  UNION ALL
        |  SELECT y AS node FROM tri
        |  UNION ALL
        |  SELECT z AS node FROM tri) GROUP BY 1""".stripMargin,
    "link_pagerank" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |nv AS (
        |  SELECT doc_id,
        |    [ strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#links'), i, 1)) - 1
        |      for i in range(1, 16) ] AS v
        |  FROM documents
        |), e AS (
        |  SELECT doc_id AS src,
        |    unnest([ (v[5*j+1]*65536 + v[5*j+2]*4096 + v[5*j+3]*256 +
        |              v[5*j+4]*16 + v[5*j+5]) % n
        |             for j in range(0, 3) ]) AS dst
        |  FROM nv CROSS JOIN nn
        |), r0 AS (
        |  SELECT doc_id, round(CAST(1.0 AS DOUBLE)/n, 12) AS rank
        |  FROM d CROSS JOIN nn
        |), c1 AS (
        |  SELECT dst, sum(CAST(round(rank/3, 12) AS DECIMAL(28,12)))
        |    AS mass
        |  FROM e JOIN r0 ON e.src = r0.doc_id GROUP BY dst
        |), r1 AS (
        |  SELECT d.doc_id,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/n +
        |      CAST(0.85 AS DOUBLE) *
        |      coalesce(CAST(mass AS DOUBLE), CAST(0 AS DOUBLE)), 12)
        |      AS rank
        |  FROM d CROSS JOIN nn LEFT JOIN c1 ON d.doc_id = c1.dst
        |), c2 AS (
        |  SELECT dst, sum(CAST(round(rank/3, 12) AS DECIMAL(28,12)))
        |    AS mass
        |  FROM e JOIN r1 ON e.src = r1.doc_id GROUP BY dst
        |), r2 AS (
        |  SELECT d.doc_id,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/n +
        |      CAST(0.85 AS DOUBLE) *
        |      coalesce(CAST(mass AS DOUBLE), CAST(0 AS DOUBLE)), 12)
        |      AS rank
        |  FROM d CROSS JOIN nn LEFT JOIN c2 ON d.doc_id = c2.dst
        |), c3 AS (
        |  SELECT dst, sum(CAST(round(rank/3, 12) AS DECIMAL(28,12)))
        |    AS mass
        |  FROM e JOIN r2 ON e.src = r2.doc_id GROUP BY dst
        |), r3 AS (
        |  SELECT d.doc_id,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/n +
        |      CAST(0.85 AS DOUBLE) *
        |      coalesce(CAST(mass AS DOUBLE), CAST(0 AS DOUBLE)), 12)
        |      AS rank
        |  FROM d CROSS JOIN nn LEFT JOIN c3 ON d.doc_id = c3.dst
        |), ind AS (
        |  SELECT dst, CAST(count(*) AS BIGINT) AS in_degree
        |  FROM e GROUP BY dst
        |)
        |SELECT d.doc_id, round(r3.rank, 10) AS rank,
        |  coalesce(ind.in_degree, 0) AS in_degree,
        |  CAST(3 AS INTEGER) AS out_degree
        |FROM d
        |JOIN r3 ON d.doc_id = r3.doc_id
        |LEFT JOIN ind ON d.doc_id = ind.dst""".stripMargin,

    // Datasheet oracle: GROUPING SETS with the standard grouping-id.
    "corpus_datasheet" ->
      """SELECT
        |  CAST(grouping(source) * 2 + grouping(lang) AS INTEGER)
        |    AS gid,
        |  source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(regexp_split_to_array(trim(lower(text)),
        |    '\s+'))) AS BIGINT) AS sum_tokens
        |FROM documents
        |GROUP BY GROUPING SETS ((source), (lang), ())""".stripMargin
  )

  /** The quality-filter verdict replay — shared verbatim by
    * `quality_filter` and `incremental_refresh` (whose engine path is
    * prior-snapshot verdicts ∪ fresh delta; the oracle recomputing
    * EVERYTHING from scratch is precisely the incremental ≡ full
    * identity being pinned).
    */
  /** Kneser-Ney 5-gram training + scoring replay as a reusable CTE
    * chain (all names `kn_`-prefixed so it composes into other
    * oracles' WITH lists), ending at `kn_b`:
    * (doc_id, split, n_scored, nll, bucket). Shared by
    * `text_perplexity`, `quality_filter_lm`, and `pipeline_export`.
    */
  private val knOracleCtes: String =
    """kn_toks AS (
        |  SELECT doc_id,
        |    CASE WHEN strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 1)) - 1
        |        <= 13 THEN 'train'
        |      WHEN strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 1)) - 1
        |        = 14 THEN 'val' ELSE 'test' END AS split,
        |    ['<s>','<s>','<s>','<s>'] || list_filter(
        |      regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '') || ['</s>'] AS pad
        |  FROM documents
        |), kn_pos AS (
        |  SELECT doc_id, split,
        |    pad[i-4] AS h1, pad[i-3] AS h2, pad[i-2] AS h3,
        |    pad[i-1] AS h4, pad[i] AS w
        |  FROM kn_toks, unnest(range(5, len(pad) + 1)) AS t(i)
        |), kn_tp AS (
        |  SELECT h1, h2, h3, h4, w FROM kn_pos WHERE split = 'train'
        |), kn_c5 AS (
        |  SELECT h1, h2, h3, h4, w, count(*) AS c FROM kn_tp GROUP BY ALL
        |), kn_ctx5 AS (
        |  SELECT h1, h2, h3, h4, CAST(sum(c) AS BIGINT) AS tot,
        |    count(*) AS ty
        |  FROM kn_c5 GROUP BY ALL
        |), kn_cc4 AS (
        |  SELECT h2 AS h1, h3 AS h2, h4 AS h3, w, count(*) AS c
        |  FROM kn_c5 GROUP BY ALL
        |), kn_ctx4 AS (
        |  SELECT h1, h2, h3, CAST(sum(c) AS BIGINT) AS tot,
        |    count(*) AS ty
        |  FROM kn_cc4 GROUP BY ALL
        |), kn_cc3 AS (
        |  SELECT h2 AS h1, h3 AS h2, w, count(*) AS c
        |  FROM kn_cc4 GROUP BY ALL
        |), kn_ctx3 AS (
        |  SELECT h1, h2, CAST(sum(c) AS BIGINT) AS tot, count(*) AS ty
        |  FROM kn_cc3 GROUP BY ALL
        |), kn_cc2 AS (
        |  SELECT h2 AS h1, w, count(*) AS c FROM kn_cc3 GROUP BY ALL
        |), kn_ctx2 AS (
        |  SELECT h1, CAST(sum(c) AS BIGINT) AS tot, count(*) AS ty
        |  FROM kn_cc2 GROUP BY ALL
        |), kn_cc1 AS (
        |  SELECT w, count(*) AS c FROM kn_cc2 GROUP BY ALL
        |), kn_scal AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS cc1_tot, count(*) AS t1,
        |    (SELECT count(DISTINCT w) FROM kn_c5) + 1 AS v
        |  FROM kn_cc1
        |), kn_j AS (
        |  SELECT p.doc_id, p.split,
        |    COALESCE(n5.c, 0) AS c5c, COALESCE(x5.tot, 0) AS tot5,
        |    COALESCE(x5.ty, 0) AS ty5,
        |    COALESCE(n4.c, 0) AS c4c, COALESCE(x4.tot, 0) AS tot4,
        |    COALESCE(x4.ty, 0) AS ty4,
        |    COALESCE(n3.c, 0) AS c3c, COALESCE(x3.tot, 0) AS tot3,
        |    COALESCE(x3.ty, 0) AS ty3,
        |    COALESCE(n2.c, 0) AS c2c, COALESCE(x2.tot, 0) AS tot2,
        |    COALESCE(x2.ty, 0) AS ty2,
        |    COALESCE(n1.c, 0) AS c1c, s.cc1_tot, s.t1, s.v
        |  FROM kn_pos p
        |  LEFT JOIN kn_c5 n5 USING (h1, h2, h3, h4, w)
        |  LEFT JOIN kn_ctx5 x5 USING (h1, h2, h3, h4)
        |  LEFT JOIN kn_cc4 n4 ON n4.h1 = p.h2 AND n4.h2 = p.h3
        |    AND n4.h3 = p.h4 AND n4.w = p.w
        |  LEFT JOIN kn_ctx4 x4 ON x4.h1 = p.h2 AND x4.h2 = p.h3
        |    AND x4.h3 = p.h4
        |  LEFT JOIN kn_cc3 n3 ON n3.h1 = p.h3 AND n3.h2 = p.h4
        |    AND n3.w = p.w
        |  LEFT JOIN kn_ctx3 x3 ON x3.h1 = p.h3 AND x3.h2 = p.h4
        |  LEFT JOIN kn_cc2 n2 ON n2.h1 = p.h4 AND n2.w = p.w
        |  LEFT JOIN kn_ctx2 x2 ON x2.h1 = p.h4
        |  LEFT JOIN kn_cc1 n1 ON n1.w = p.w
        |  CROSS JOIN kn_scal s
        |), kn_l1 AS (
        |  SELECT *, (greatest(c1c - 0.75, 0.0)
        |      + 0.75 * t1 * (1.0 / v)) / cc1_tot AS p1
        |  FROM kn_j
        |), kn_l2 AS (
        |  SELECT *, CASE WHEN tot2 > 0 THEN (greatest(c2c - 0.75, 0.0)
        |      + 0.75 * ty2 * p1) / tot2 ELSE p1 END AS p2
        |  FROM kn_l1
        |), kn_l3 AS (
        |  SELECT *, CASE WHEN tot3 > 0 THEN (greatest(c3c - 0.75, 0.0)
        |      + 0.75 * ty3 * p2) / tot3 ELSE p2 END AS p3
        |  FROM kn_l2
        |), kn_l4 AS (
        |  SELECT *, CASE WHEN tot4 > 0 THEN (greatest(c4c - 0.75, 0.0)
        |      + 0.75 * ty4 * p3) / tot4 ELSE p3 END AS p4
        |  FROM kn_l3
        |), kn_l5 AS (
        |  SELECT *, CASE WHEN tot5 > 0 THEN (greatest(c5c - 0.75, 0.0)
        |      + 0.75 * ty5 * p4) / tot5 ELSE p4 END AS p5
        |  FROM kn_l4
        |), kn_sc AS (
        |  SELECT doc_id, split,
        |    CAST(round(-ln(p5), 12) AS DECIMAL(28,12)) AS lp
        |  FROM kn_l5
        |), kn_agg AS (
        |  SELECT doc_id, split, CAST(count(*) AS BIGINT) AS n_scored,
        |    round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS nll
        |  FROM kn_sc GROUP BY doc_id, split
        |), kn_b AS (
        |  SELECT doc_id, split, n_scored, nll,
        |    CASE WHEN nll < 0.95 THEN 'head'
        |      WHEN nll < 1.05 THEN 'middle' ELSE 'tail' END AS bucket
        |  FROM kn_agg
        |)""".stripMargin

  /** Heuristic quality CTE chain (`t` → verdict relation `j`),
    * shared by the quality-filter oracles; consumers append their
    * final SELECT (and may JOIN `j` with other chains' relations).
    */
  private val qualityCtes: String =
    """t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE)
        |      AS mean_token_len,
        |    len(list_filter(toks, x -> x IN ('a','the','of','and'))) /
        |      CAST(len(toks) AS DOUBLE) AS stop_ratio
        |  FROM t
        |), g AS (
        |  SELECT doc_id, unnest(list_concat(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))],
        |    CASE WHEN len(toks) >= 3 THEN
        |      [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |       for i in range(1, len(toks) - 1)]
        |    ELSE [] END)) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, c, len(string_split(gram, ' ')) AS n FROM (
        |    SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |), a AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_grams2,
        |    CAST(max(CASE WHEN n = 2 THEN c END) AS BIGINT) AS top2_cnt,
        |    CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n_grams3,
        |    CAST(sum(CASE WHEN n = 3 AND c > 1 THEN c END) AS BIGINT)
        |      AS dup3_occ
        |  FROM c GROUP BY doc_id
        |), j AS (
        |  SELECT q.doc_id, q.n_tokens, q.mean_token_len, q.stop_ratio,
        |    a.top2_cnt / CAST(a.n_grams2 AS DOUBLE) AS top2_frac,
        |    coalesce(a.dup3_occ, 0) / CAST(a.n_grams3 AS DOUBLE)
        |      AS dup3_frac
        |  FROM q LEFT JOIN a USING (doc_id)
        |)""".stripMargin

  private val qualityFilterOracle: String =
    s"""WITH $qualityCtes
        |SELECT doc_id, n_tokens, mean_token_len, stop_ratio,
        |  top2_frac, dup3_frac,
        |  (n_tokens >= 20 AND n_tokens <= 1000) AS r_len,
        |  (mean_token_len >= 2.0 AND mean_token_len <= 12.0)
        |    AS r_word_len,
        |  (stop_ratio >= 0.01) AS r_stop,
        |  coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18, true) AS r_rep,
        |  ((n_tokens >= 20 AND n_tokens <= 1000) AND
        |   (mean_token_len >= 2.0 AND mean_token_len <= 12.0) AND
        |   stop_ratio >= 0.01 AND
        |   coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18, true))
        |    AS keep,
        |  concat_ws(',',
        |    CASE WHEN NOT (n_tokens >= 20 AND n_tokens <= 1000)
        |      THEN 'len' END,
        |    CASE WHEN NOT (mean_token_len >= 2.0 AND mean_token_len <= 12.0)
        |      THEN 'word_len' END,
        |    CASE WHEN NOT (stop_ratio >= 0.01) THEN 'stop_ratio' END,
        |    CASE WHEN NOT coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18,
        |                           true)
        |      THEN 'repetition' END) AS drop_reasons
        |FROM j""".stripMargin

  /** Shared CTE prefix replaying the NB classifier's training +
    * scoring chain (the quality_filter verdict CTEs, the split, token
    * counts, decimal-mediated scoring, priors). Ends at `pr`
    * (prior_keep, prior_drop); consumers append their final SELECT.
    */
  private val nbOracleCtes: String =
    """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE)
        |      AS mean_token_len,
        |    len(list_filter(toks, x -> x IN ('a','the','of','and'))) /
        |      CAST(len(toks) AS DOUBLE) AS stop_ratio
        |  FROM t
        |), g AS (
        |  SELECT doc_id, unnest(list_concat(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))],
        |    CASE WHEN len(toks) >= 3 THEN
        |      [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |       for i in range(1, len(toks) - 1)]
        |    ELSE [] END)) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, c, len(string_split(gram, ' ')) AS n FROM (
        |    SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |), a AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_grams2,
        |    CAST(max(CASE WHEN n = 2 THEN c END) AS BIGINT) AS top2_cnt,
        |    CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n_grams3,
        |    CAST(sum(CASE WHEN n = 3 AND c > 1 THEN c END) AS BIGINT)
        |      AS dup3_occ
        |  FROM c GROUP BY doc_id
        |), v AS (
        |  SELECT q.doc_id,
        |    ((n_tokens >= 20 AND n_tokens <= 1000) AND
        |     (mean_token_len >= 2.0 AND mean_token_len <= 12.0) AND
        |     stop_ratio >= 0.01 AND
        |     coalesce(top2_cnt / CAST(n_grams2 AS DOUBLE) <= 0.2 AND
        |       coalesce(dup3_occ, 0) / CAST(n_grams3 AS DOUBLE) <= 0.18,
        |       true)) AS keep
        |  FROM q LEFT JOIN a ON q.doc_id = a.doc_id
        |), sp AS (
        |  SELECT doc_id,
        |    CASE WHEN nib <= 13 THEN 'train'
        |         WHEN nib = 14 THEN 'val' ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id,
        |      strpos('0123456789abcdef',
        |        substr(md5(doc_id::VARCHAR || '#split'), 1, 1)) - 1 AS nib
        |    FROM documents)
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), cnt AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cnt_keep,
        |    CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |      AS cnt_drop
        |  FROM tok JOIN v USING (doc_id) JOIN sp USING (doc_id)
        |  WHERE split = 'train' GROUP BY 1
        |), st AS (
        |  SELECT CAST(sum(cnt_keep) AS BIGINT) AS tot_keep,
        |    CAST(sum(cnt_drop) AS BIGINT) AS tot_drop,
        |    CAST(count(*) AS BIGINT) AS vocab
        |  FROM cnt
        |), ds AS (
        |  SELECT
        |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |      AS docs_keep,
        |    CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |      AS docs_drop
        |  FROM v JOIN sp USING (doc_id) WHERE split = 'train'
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(round(ln((coalesce(cnt_keep, 0) + 1.0) /
        |      (tot_keep + vocab)), 12) AS DECIMAL(28,12)) AS sk,
        |    CAST(round(ln((coalesce(cnt_drop, 0) + 1.0) /
        |      (tot_drop + vocab)), 12) AS DECIMAL(28,12)) AS sd
        |  FROM tok LEFT JOIN cnt USING (token) CROSS JOIN st
        |), pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    sum(sk) AS sk_sum, sum(sd) AS sd_sum
        |  FROM sc GROUP BY 1
        |), pr AS (
        |  SELECT
        |    CAST(round(ln(docs_keep /
        |      CAST(docs_keep + docs_drop AS DOUBLE)), 12)
        |      AS DECIMAL(28,12)) AS prior_keep,
        |    CAST(round(ln(docs_drop /
        |      CAST(docs_keep + docs_drop AS DOUBLE)), 12)
        |      AS DECIMAL(28,12)) AS prior_drop
        |  FROM ds
        |)""".stripMargin

  /** Shared CTE prefix reconstructing the synthesized crawl page
    * ([[graft.ops.CrawlOps.synthHtml]]) character-for-character in
    * DuckDB — tokens, then the exact element layout. Ends at `h`
    * (doc_id, source, tk, html).
    */
  private val htmlSynthCtes: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, source, tk,
      |    '<!doctype html>' || chr(10) ||
      |    '<html><head><title>' || tk[1] || ' ' || tk[2] ||
      |    '</title><script>var x = "1 > 0 && 2 < 3";</script>' ||
      |    '<style>p { color: red; }</style></head>' || chr(10) ||
      |    '<body>' || chr(10) ||
      |    '<nav><a href="/home">home</a> <a href="/about">about</a> ' ||
      |    '<a href="/contact">contact</a></nav>' || chr(10) ||
      |    array_to_string(
      |      [ '<p>' || array_to_string(tk[10*i+1 : 10*i+10], ' ') ||
      |        '</p>'
      |        for i in range(0, CAST(ceil(len(tk)/10.0) AS INT)) ],
      |      chr(10)) || chr(10) ||
      |    '<p>tom &amp; jerry &lt;3 &#39;quoted&#39; &#x26; done</p>' ||
      |    chr(10) ||
      |    '<div><a href="/x">x</a><a href="/y">y</a></div>' || chr(10) ||
      |    '<!-- doc ' || CAST(doc_id AS VARCHAR) || ' -->' || chr(10) ||
      |    '</body></html>' AS html
      |  FROM t
      |)""".stripMargin

  /** Shared CTE list (no WITH keyword) reproducing the engine's
    * k-means coarse quantizer bit-exactly: seeds from the first 16
    * vectors (c0), two unrolled Lloyd iterations with DECIMAL(27,12)-
    * mediated (order-independent) means (c1, c2), emptied cells keep
    * their previous centroid. Ends at `c2` (cell, cv); consumers
    * append their own assignment/probe CTEs. Pins `sim_ann_ivf`,
    * `semdedup`, and `cluster_mix` from one arithmetic source.
    */
  private val lloydCellCtes: String =
    s"""e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), dims AS (
      |  SELECT unnest(range(1, len(v) + 1)) AS d FROM (SELECT v FROM e LIMIT 1)
      |), ${lloydCtesOver("e")}""".stripMargin

  /** The c0→…→ac/assigned Lloyd CTE chain over an arbitrary vector
    * relation `rel` (vec_id, v): seeds = the 16 lowest vec_ids of
    * `rel` (ORDER BY vec_id LIMIT — on the full table this is the
    * same first-16 rule the engine uses), two DECIMAL(27,12)-mediated
    * iterations, final per-vector cell ranking `ac` + the rn=1
    * `assigned`. Parameterized so `sim_index_probe` can run the same
    * arithmetic over the index carve while the full-table consumers
    * (`sim_ann_ivf`, `semdedup`, `cluster_mix`) keep theirs.
    */
  private def lloydCtesOver(rel: String): String =
    s"""c0 AS (
      |  SELECT vec_id AS cell, v AS cv FROM $rel ORDER BY vec_id LIMIT 16
      |), a1 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT $rel.vec_id, c0.cell,
      |      row_number() OVER (PARTITION BY $rel.vec_id ORDER BY
      |        list_dot_product(v, cv) /
      |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
      |          DESC NULLS LAST,
      |        cell) AS rn
      |    FROM $rel, c0
      |  ) WHERE rn = 1
      |), m1 AS (
      |  SELECT cell, d,
      |    CAST(SUM(CAST($rel.v[d] AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS m
      |  FROM a1, $rel, dims WHERE a1.vec_id = $rel.vec_id
      |  GROUP BY cell, d
      |), g1 AS (
      |  SELECT cell, list(m ORDER BY d) AS cv FROM m1 GROUP BY cell
      |), c1 AS (
      |  SELECT c0.cell, coalesce(g1.cv, c0.cv) AS cv
      |  FROM c0 LEFT JOIN g1 USING (cell)
      |), a2 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT $rel.vec_id, c1.cell,
      |      row_number() OVER (PARTITION BY $rel.vec_id ORDER BY
      |        list_dot_product(v, cv) /
      |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
      |          DESC NULLS LAST,
      |        cell) AS rn
      |    FROM $rel, c1
      |  ) WHERE rn = 1
      |), m2 AS (
      |  SELECT cell, d,
      |    CAST(SUM(CAST($rel.v[d] AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS m
      |  FROM a2, $rel, dims WHERE a2.vec_id = $rel.vec_id
      |  GROUP BY cell, d
      |), g2 AS (
      |  SELECT cell, list(m ORDER BY d) AS cv FROM m2 GROUP BY cell
      |), c2 AS (
      |  SELECT c1.cell, coalesce(g2.cv, c1.cv) AS cv
      |  FROM c1 LEFT JOIN g2 USING (cell)
      |), ac AS (
      |  SELECT vec_id, cell,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY
      |      list_dot_product(v, cv) /
      |        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
      |        DESC NULLS LAST,
      |      cell) AS rn
      |  FROM $rel, c2
      |), assigned AS (
      |  SELECT vec_id, cell FROM ac WHERE rn = 1
      |)""".stripMargin

  /** Shared CTE list (no WITH keyword) computing exact word-trigram
    * Jaccard: toks → sh → cnt → inter.
    */
  private val jaccardCtes: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
      |  FROM documents
      |  WHERE len(regexp_split_to_array(lower(text), '\s+')) >= 3
      |), sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |      for i in range(1, len(t) - 1)])) AS shingle
      |  FROM toks
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin


  /** KMV replay over the whole documents table — shared by
    * `corpus_kmv` (one job) and `corpus_kmv_index` (build on the even
    * carve + set-union/re-rank append of the odd carve: the union's
    * k-minima are the k smallest of the merged minima).
    */
  private lazy val kmvOracle: String =
      """WITH toks AS (
        |  SELECT DISTINCT source,
        |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        |  FROM (SELECT source,
        |          unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |            AS tok
        |        FROM documents)
        |), ps AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |  FROM toks
        |), pm AS (SELECT * FROM ps WHERE r <= 64
        |), mu AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS r
        |  FROM (SELECT DISTINCT h FROM pm)
        |), un AS (
        |  SELECT * FROM pm
        |  UNION ALL
        |  SELECT '__all__' AS source, h, r FROM mu WHERE r <= 64
        |)
        |SELECT source, CAST(max(r) AS INTEGER) AS k_used,
        |  max(h) AS kth_hash,
        |  CASE WHEN max(r) < 64 THEN CAST(max(r) AS DOUBLE)
        |       ELSE CAST(max(r) - 1 AS DOUBLE)
        |            * CAST(1152921504606846976 AS BIGINT)
        |            / CAST(max(h) AS DOUBLE) END AS est_distinct
        |FROM un GROUP BY source""".stripMargin

  /** Full HLL replay over the whole documents table — shared by
    * `corpus_hll` (one job) and `corpus_hll_index` (build on the even
    * carve + register-max append of the odd carve: the union IS the
    * full table).
    */
  private lazy val hllOracle: String =
    """WITH t AS (
      |  SELECT source,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT source,
      |    CAST('0x' || substr(md5(array_to_string(toks[g : g+2], ' ')),
      |         1, 15) AS BIGINT) AS h
      |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2))
      |                   AS g) s
      |  WHERE len(toks) >= 3
      |), rho AS (
      |  SELECT source, h & 1023 AS j,
      |    CASE WHEN (h >> 10) = 0 THEN 51
      |         ELSE 51 - length(bin(h >> 10)) END AS rho
      |  FROM sh
      |), ps AS (
      |  SELECT source, j, max(rho) AS mj FROM rho GROUP BY source, j
      |), agg AS (
      |  SELECT source, CAST(count(*) AS INTEGER) AS regs_used,
      |    CAST(1024 - count(*) AS INTEGER) AS v_zero,
      |    CAST(sum(1::BIGINT << (51 - mj))
      |         + (1024 - count(*)) * 2251799813685248::BIGINT
      |      AS BIGINT) AS z_scaled
      |  FROM ps GROUP BY source
      |  UNION ALL
      |  SELECT '__all__', CAST(count(*) AS INTEGER),
      |    CAST(1024 - count(*) AS INTEGER),
      |    CAST(sum(1::BIGINT << (51 - mj))
      |         + (1024 - count(*)) * 2251799813685248::BIGINT AS BIGINT)
      |  FROM (SELECT j, max(mj) AS mj FROM ps GROUP BY j)
      |)
      |SELECT source, regs_used, v_zero, z_scaled,
      |  round(CASE
      |    WHEN 0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
      |         * 2251799813685248.0 / CAST(z_scaled AS DOUBLE) <= 2560.0
      |         AND v_zero > 0
      |    THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE))
      |    ELSE 0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
      |         * 2251799813685248.0 / CAST(z_scaled AS DOUBLE)
      |  END, 6) AS est_distinct
      |FROM agg""".stripMargin

  /** The HLL estimate pipeline over a doc_id-carved documents view —
    * (source, est) rows incl. the `__all__` merge — used twice by the
    * `corpus_growth` oracle. A nested WITH inside the caller's CTE
    * body keeps the chain self-contained.
    */
  private def hllEstSql(pred: String): String =
    s"""WITH t AS (
       |  SELECT source,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents WHERE $pred
       |), sh AS (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(array_to_string(toks[g : g+2], ' ')),
       |         1, 15) AS BIGINT) AS h
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2))
       |                   AS g) s
       |  WHERE len(toks) >= 3
       |), rho AS (
       |  SELECT source, h & 1023 AS j,
       |    CASE WHEN (h >> 10) = 0 THEN 51
       |         ELSE 51 - length(bin(h >> 10)) END AS rho
       |  FROM sh
       |), ps AS (
       |  SELECT source, j, max(rho) AS mj FROM rho GROUP BY source, j
       |), agg AS (
       |  SELECT source, CAST(1024 - count(*) AS INTEGER) AS v_zero,
       |    CAST(sum(1::BIGINT << (51 - mj))
       |         + (1024 - count(*)) * 2251799813685248::BIGINT
       |      AS BIGINT) AS z_scaled
       |  FROM ps GROUP BY source
       |  UNION ALL
       |  SELECT '__all__', CAST(1024 - count(*) AS INTEGER),
       |    CAST(sum(1::BIGINT << (51 - mj))
       |         + (1024 - count(*)) * 2251799813685248::BIGINT AS BIGINT)
       |  FROM (SELECT j, max(mj) AS mj FROM ps GROUP BY j)
       |)
       |SELECT source,
       |  round(CASE
       |    WHEN 0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
       |         * 2251799813685248.0 / CAST(z_scaled AS DOUBLE) <= 2560.0
       |         AND v_zero > 0
       |    THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE))
       |    ELSE 0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
       |         * 2251799813685248.0 / CAST(z_scaled AS DOUBLE)
       |  END, 6) AS est
       |FROM agg""".stripMargin


  /** `pipeline_export` / `pipeline_export_indexed` shared replay —
    * the composed survivor relation and pack layout; the indexed
    * engine path reads committed index versions but produces the
    * same rows, so the one SQL adjudicates both.
    */
  private lazy val pipelineExportOracle: String =
    s"""${clusterCtes(0.8)}, $knOracleCtes, t AS (
      |  SELECT doc_id, text,
      |    regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
      |  FROM documents
      |), q AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS INTEGER) AS n_tokens,
      |    (length(text) - len(tk) + 1) / CAST(len(tk) AS DOUBLE)
      |      AS mean_token_len,
      |    len(list_filter(tk, x -> x IN ('a','the','of','and'))) /
      |      CAST(len(tk) AS DOUBLE) AS stop_ratio
      |  FROM t
      |), g AS (
      |  SELECT doc_id, unnest(list_concat(
      |    [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))],
      |    CASE WHEN len(tk) >= 3 THEN
      |      [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
      |       for i in range(1, len(tk) - 1)]
      |    ELSE [] END)) AS gram
      |  FROM t WHERE len(tk) >= 2
      |), gc AS (
      |  SELECT doc_id, c, len(string_split(gram, ' ')) AS n FROM (
      |    SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
      |), ga AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_grams2,
      |    CAST(max(CASE WHEN n = 2 THEN c END) AS BIGINT) AS top2_cnt,
      |    CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n_grams3,
      |    CAST(sum(CASE WHEN n = 3 AND c > 1 THEN c END) AS BIGINT)
      |      AS dup3_occ
      |  FROM gc GROUP BY doc_id
      |), qkeep AS (
      |  SELECT q.doc_id
      |  FROM q LEFT JOIN ga USING (doc_id)
      |  WHERE q.n_tokens >= 20 AND q.n_tokens <= 1000
      |    AND q.mean_token_len >= 2.0 AND q.mean_token_len <= 12.0
      |    AND q.stop_ratio >= 0.01
      |    AND coalesce(
      |      ga.top2_cnt / CAST(ga.n_grams2 AS DOUBLE) <= 0.2
      |        AND coalesce(ga.dup3_occ, 0) /
      |          CAST(ga.n_grams3 AS DOUBLE) <= 0.18, true)
      |), surv AS (
      |  SELECT d.doc_id, d.text
      |  FROM documents d
      |  LEFT JOIN comp ON comp.doc_id = d.doc_id
      |  WHERE coalesce(comp.component_id, d.doc_id) = d.doc_id
      |    AND d.doc_id IN (SELECT doc_id FROM qkeep)
      |    AND d.doc_id IN (SELECT doc_id FROM kn_b
      |                     WHERE bucket <> 'tail')
      |    AND strpos('0123456789abcdef',
      |      substr(md5(d.doc_id::VARCHAR || '#split'), 1, 1)) - 1 <= 13
      |), ph AS (
      |  SELECT doc_id, md5(doc_id::VARCHAR || '#shard') AS hx,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
      |      AS BIGINT) AS n_tokens
      |  FROM surv
      |), ps AS (
      |  SELECT doc_id, hx, n_tokens,
      |    CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
      |      AS INTEGER) AS shard_id
      |  FROM ph
      |), pc AS (
      |  SELECT doc_id, shard_id, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY hx, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM ps
      |)
      |SELECT doc_id, shard_id, n_tokens,
      |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
      |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_off
      |FROM pc""".stripMargin

  /** Power-iteration replay: the three rounds unrolled as chained
    * CTEs — `list_dot_product` against the previous round's direction
    * (collected back into a list in dim order), per-dim products
    * rounded to 12 and summed as DECIMAL(28,12) (order-independent),
    * normalization and 12-decimal re-round per round. Unrolled
    * programmatically so the iteration count stays in one place.
    */
  /** Heuristic chain ⋈ KN chain on doc_id — shared by
    * `quality_filter_lm` (inline retrain) and
    * `quality_filter_lm_indexed` (persisted-model scoring): the two
    * engine paths share [[graft.ops.LanguageModel.scoreWith]]
    * verbatim, so one replay pins both.
    */
  private lazy val qualityFilterLmOracle: String =
    s"""WITH $qualityCtes, $knOracleCtes
      |SELECT doc_id, n_tokens, mean_token_len, stop_ratio,
      |  top2_frac, dup3_frac,
      |  (n_tokens >= 20 AND n_tokens <= 1000) AS r_len,
      |  (mean_token_len >= 2.0 AND mean_token_len <= 12.0)
      |    AS r_word_len,
      |  (stop_ratio >= 0.01) AS r_stop,
      |  coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18, true) AS r_rep,
      |  nll, bucket, (bucket <> 'tail') AS r_lm,
      |  ((n_tokens >= 20 AND n_tokens <= 1000) AND
      |   (mean_token_len >= 2.0 AND mean_token_len <= 12.0) AND
      |   stop_ratio >= 0.01 AND
      |   coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18, true) AND
      |   bucket <> 'tail') AS keep,
      |  concat_ws(',',
      |    CASE WHEN NOT (n_tokens >= 20 AND n_tokens <= 1000)
      |      THEN 'len' END,
      |    CASE WHEN NOT (mean_token_len >= 2.0 AND mean_token_len <= 12.0)
      |      THEN 'word_len' END,
      |    CASE WHEN NOT (stop_ratio >= 0.01) THEN 'stop_ratio' END,
      |    CASE WHEN NOT coalesce(top2_frac <= 0.2 AND dup3_frac <= 0.18,
      |                           true)
      |      THEN 'repetition' END,
      |    CASE WHEN bucket = 'tail' THEN 'lm_tail' END) AS drop_reasons
      |FROM j JOIN kn_b USING (doc_id)""".stripMargin

  private lazy val pcaOracle: String = {
    // dims comes from the ONE shared constant (Similarity.FixtureDims)
    // so a fixture dimensionality change can't silently desync the
    // inlined seed/unnest width from what the engine derives from data
    val dims = Similarity.FixtureDims
    val v0 = Seq.fill(dims)("1.0").mkString("[", ", ", "]")
    def iter(i: Int): String = {
      val vPrev =
        if (i == 1) v0 else s"(SELECT list(vv ORDER BY d) FROM v${i - 1})"
      s"""s$i AS (
         |  SELECT vec_id, v, list_dot_product(v, $vPrev) AS sc FROM e
         |), w$i AS (
         |  SELECT g - 1 AS d,
         |    CAST(SUM(CAST(round(v[g] * sc, 12) AS DECIMAL(28,12)))
         |      AS DOUBLE) AS w
         |  FROM s$i, LATERAL (SELECT unnest(generate_series(1, $dims)) AS g) t
         |  GROUP BY g
         |), n$i AS (
         |  SELECT CAST(SUM(CAST(round(w * w, 12) AS DECIMAL(28,12)))
         |    AS DOUBLE) AS n2
         |  FROM w$i
         |), v$i AS (
         |  SELECT d, round(w / sqrt(n2), 12) AS vv FROM w$i, n$i
         |)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |),
       |${(1 to 3).map(iter).mkString(",\n")}
       |SELECT CAST(d AS INTEGER) AS dim, vv AS loading,
       |  (SELECT sqrt(n2) FROM n3) AS sigma_est
       |FROM v3""".stripMargin
  }

  /** Full CMS replay over the whole documents table — shared by
    * `corpus_cms` (one job) and `corpus_cms_index` (build on the even
    * carve + counter-add append of the odd carve).
    */
  private lazy val cmsOracle: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
      |    AS tok
      |  FROM documents
      |), grid AS (
      |  SELECT i,
      |    CAST('0x' || substr(md5(i::VARCHAR || '#' || tok), 1, 15)
      |      AS BIGINT) % 64 AS b,
      |    count(*) AS cnt
      |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) d
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT tok, count(*) AS exact_cnt,
      |    CAST(row_number() OVER (ORDER BY count(*) DESC, tok)
      |      AS INTEGER) AS rank
      |  FROM toks GROUP BY tok
      |  QUALIFY rank <= 20
      |), probes AS (
      |  SELECT t.rank, t.tok, t.exact_cnt, g.cnt
      |  FROM (SELECT *, unnest(range(4)) AS i FROM top) t
      |  JOIN grid g ON g.i = t.i
      |    AND g.b = CAST('0x' || substr(md5(t.i::VARCHAR || '#' || t.tok),
      |                   1, 15) AS BIGINT) % 64
      |)
      |SELECT rank, tok, exact_cnt, min(cnt) AS cms_est,
      |  min(cnt) - exact_cnt AS overcount
      |FROM probes GROUP BY rank, tok, exact_cnt""".stripMargin

  /** Exact Jaccard restricted to pairs straddling the batch carve
    * (exactly one side has doc_id % 10 = 0), batch member first —
    * shared by `dedup_incremental` (one-job) and `dedup_index_probe`
    * (persisted index): both compute this same relation.
    */
  /** Windowed-ExactSubstr stats oracle, shared by `dedup_substring`
    * (one-job) and `dedup_substring_index` (persisted window index):
    * the index stores the identical window-hash relation, so both
    * forms denote these exact rows.
    */
  private def substrStatsOracle(where: String = ""): String =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
      |    md5(array_to_string(toks[i:i+15], ' ')) AS wh
      |  FROM t, unnest(range(1, len(toks) - 16 + 2)) r(i)
      |  WHERE len(toks) >= 16
      |), f AS (
      |  SELECT wh, count(DISTINCT doc_id) AS wdf FROM w GROUP BY 1
      |), fl AS (
      |  SELECT w.doc_id, w.pos, f.wdf > 1 AS dup FROM w JOIN f USING (wh)
      |), r2 AS (
      |  SELECT doc_id, dup, grp, count(*) AS run FROM (
      |    SELECT doc_id, dup,
      |      pos - row_number() OVER (PARTITION BY doc_id, dup ORDER BY pos) AS grp
      |    FROM fl
      |  ) GROUP BY 1, 2, 3
      |), pd AS (
      |  SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_windows,
      |    CAST(sum(CASE WHEN dup THEN run ELSE 0 END) AS BIGINT) AS dup_windows,
      |    CAST(max(CASE WHEN dup THEN run ELSE 0 END) AS BIGINT) AS max_run
      |  FROM r2 GROUP BY 1
      |)
      |SELECT d.doc_id,
      |  coalesce(pd.n_windows, 0) AS n_windows,
      |  coalesce(pd.dup_windows, 0) AS dup_windows,
      |  pd.dup_windows / CAST(pd.n_windows AS DOUBLE) AS dup_frac,
      |  coalesce(CASE WHEN pd.max_run > 0 THEN pd.max_run + 15 ELSE 0 END, 0)
      |    AS max_span_tokens,
      |  coalesce(CASE WHEN pd.max_run > 0 THEN pd.max_run + 15 ELSE 0 END, 0) < 50
      |    AS keep
      |FROM documents d LEFT JOIN pd USING (doc_id)$where""".stripMargin

  private lazy val incrementalOracle: String =
    s"""WITH $jaccardCtes, p AS (
       |  SELECT doc_a, doc_b, i / (ca.n + cb.n - i) AS jaccard
       |  FROM inter
       |  JOIN cnt ca ON ca.doc_id = doc_a
       |  JOIN cnt cb ON cb.doc_id = doc_b
       |  WHERE i / (ca.n + cb.n - i) >= 0.8
       |)
       |SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_new,
       |  CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_idx,
       |  jaccard
       |FROM p
       |WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)""".stripMargin

  /** Exact word-trigram Jaccard pairs at a threshold — shared oracle
    * for the exact and LSH dedup paths.
    */
  /** The Bloom decontamination replay shared by the one-job query and
    * both persisted-index forms (build+probe, build+append+probe): the
    * engine's bitmap round-trip and OR-append are lossless, so all
    * three compute the same relation. A gram is bloom-positive iff all
    * 4 double-hashed positions (Kirsch–Mitzenmacher: one md5 split
    * into 60-bit halves h1/h2, pos_j = (h1 + j·h2) mod m) have their
    * bit set — exactly "all 4 positions are in the bench position
    * set", so the oracle checks membership relationally and never
    * needs the (DuckDB-unshiftable) 1<<63 bit packing. False positives
    * reproduce identically because the position arithmetic is shared.
    */
  private val bloomOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
      |  FROM documents
      |  WHERE len(regexp_split_to_array(lower(text), '\s+')) >= 8
      |), gr AS (
      |  SELECT doc_id, list_distinct([array_to_string(t[i:i+7], ' ')
      |    for i in range(1, len(t) - 6)]) AS grams
      |  FROM toks
      |), js AS (SELECT unnest([0, 1, 2, 3]) AS j
      |), bg AS (
      |  SELECT DISTINCT unnest(grams) AS gram FROM gr WHERE doc_id % 50 = 0
      |), pos AS (
      |  SELECT DISTINCT (h1 + j * h2) % 65536 AS p
      |  FROM (SELECT CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS h1,
      |               CAST('0x' || substr(md5(gram), 16, 15) AS BIGINT) AS h2
      |        FROM bg) CROSS JOIN js
      |), pg AS (
      |  SELECT doc_id, unnest(grams) AS gram
      |  FROM gr WHERE doc_id % 50 <> 0
      |), pp AS (
      |  SELECT doc_id, gram, (h1 + j * h2) % 65536 AS p
      |  FROM (SELECT doc_id, gram,
      |          CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS h1,
      |          CAST('0x' || substr(md5(gram), 16, 15) AS BIGINT) AS h2
      |        FROM pg) CROSS JOIN js
      |), hit AS (
      |  SELECT doc_id, gram
      |  FROM pp LEFT JOIN pos ON pp.p = pos.p
      |  GROUP BY doc_id, gram
      |  HAVING bool_and(pos.p IS NOT NULL)
      |), nf AS (
      |  SELECT doc_id, count(*) AS n_flagged FROM hit GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(coalesce(nf.n_flagged, 0) AS BIGINT) AS n_flagged,
      |  coalesce(nf.n_flagged, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN nf USING (doc_id)
      |WHERE d.doc_id % 50 <> 0""".stripMargin

  private def jaccardOracle(threshold: Double): String =
    s"""WITH $jaccardCtes
       |SELECT doc_a, doc_b, i / (ca.n + cb.n - i) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE i / (ca.n + cb.n - i) >= $threshold""".stripMargin

  /** Shared recursive-CTE prefix computing per-doc components from the
    * exact-Jaccard pair set: transitive closure, component = min
    * reachable id.
    */
  /** Shared tail of the media cluster oracles: Hamming ≤ 3 pairs over
    * a `s(doc_id, bits)` signature relation, closed into min-label
    * components by a recursive transitive closure; every clip
    * labeled, singletons themselves.
    */
  /** Snapshot oracles shared between the publish-inclusive rows and
    * their pre-staged probe twins (`corpus_snapshot_resolve` /
    * `corpus_snapshot_diff_probe`): identical relations — the probe
    * rows only move the corpus-sized base publish OUTSIDE the timed
    * unit so bench/scale measure the change-proportional legs
    * directly.
    */
  private lazy val snapshotDeltaOracle: String =
    """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
        |), changes AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0 AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, upper(text) FROM documents
        |  WHERE doc_id % 7 <> 0 AND doc_id % 11 = 0
        |), removed AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 7 <> 0 AND doc_id % 13 = 0 AND doc_id % 11 <> 0
        |), resolved AS (
        |  SELECT doc_id, text FROM changes
        |  UNION ALL
        |  SELECT b.doc_id, b.text FROM base b
        |  WHERE b.doc_id NOT IN (SELECT doc_id FROM changes)
        |    AND b.doc_id NOT IN (SELECT doc_id FROM removed)
        |)
        |SELECT doc_id, md5(text) AS digest FROM resolved""".stripMargin

  private lazy val snapshotDiffOracle: String =
    """WITH old AS (
        |  SELECT doc_id, md5(text) AS old_md5 FROM documents
        |  WHERE doc_id % 7 <> 0
        |), neu AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END)
        |      AS new_md5
        |  FROM documents WHERE doc_id % 5 <> 0
        |), d AS (
        |  SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
        |    CASE WHEN old_md5 IS NULL THEN 'added'
        |         WHEN new_md5 IS NULL THEN 'removed'
        |         WHEN old_md5 = new_md5 THEN 'same'
        |         ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM d GROUP BY status""".stripMargin

  /** Shared CTE list of the embedding near-dup oracles: fixture +
    * planted twins, md5-parity hyperplane coefficients, 64-plane
    * signatures in 4 bands of 16 bits, distinct banded candidate
    * pairs. No leading WITH so callers can prepend RECURSIVE.
    */
  private lazy val simNearDupCtes: String =
    """e0 AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), e AS (
        |  SELECT vec_id, v FROM e0
        |  UNION ALL
        |  SELECT vec_id + 900000000 AS vec_id,
        |    list_concat([v[1] * 1.25], v[2:]) AS v
        |  FROM e0 WHERE vec_id % 100 = 7
        |), dims AS (
        |  SELECT len(v) AS nd FROM e LIMIT 1
        |), coef AS (
        |  SELECT p, list(CASE WHEN substr(md5(p::VARCHAR || ',' || d::VARCHAR), 2, 1)
        |                      IN ('1','3','5','7','9','b','d','f')
        |                 THEN 1.0 ELSE -1.0 END ORDER BY d) AS cl
        |  FROM (SELECT p, unnest(range(nd)) AS d FROM range(64) t(p), dims)
        |  GROUP BY p
        |), banded AS (
        |  SELECT vec_id, CAST(p // 16 AS INTEGER) AS band,
        |    CAST(sum(CASE WHEN list_dot_product(v, cl) > 0
        |      THEN CAST(1 AS BIGINT) << CAST(p % 16 AS INTEGER)
        |      ELSE 0 END) AS BIGINT) AS key
        |  FROM e, coef
        |  GROUP BY vec_id, band
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM banded a JOIN banded b USING (band, key)
        |  WHERE a.vec_id < b.vec_id
        |)""".stripMargin

  /** Embedding cluster oracle, shared by `sim_clusters` and its
    * committed-index twin: verified pairs closed into min-label
    * components, every vector labeled, singletons themselves.
    */
  private lazy val simClustersOracle: String =
    s"""WITH RECURSIVE $simNearDupCtes, p AS (
       |  SELECT c.vec_a, c.vec_b
       |  FROM cand c JOIN e av ON av.vec_id = c.vec_a
       |              JOIN e bv ON bv.vec_id = c.vec_b
       |  WHERE list_dot_product(av.v, bv.v) /
       |    (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.9
       |), edges AS (
       |  SELECT vec_a AS u, vec_b AS v FROM p
       |  UNION
       |  SELECT vec_b, vec_a FROM p
       |), reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
       |), comp AS (
       |  SELECT u AS vec_id, least(u, min(v)) AS component_id
       |  FROM reach WHERE v <> u GROUP BY u
       |)
       |SELECT e.vec_id,
       |  coalesce(c.component_id, e.vec_id) AS component_id,
       |  coalesce(c.component_id, e.vec_id) = e.vec_id AS keep
       |FROM e LEFT JOIN comp c USING (vec_id)""".stripMargin

  /** Media cluster oracles, shared verbatim between each decode-side
    * cluster form and its committed-SigIndex twin (`*_clusters` /
    * `*_clusters_index`): the index route must produce IDENTICAL
    * rows — same signatures, same components — with zero payload
    * decodes, which equal hashes against one oracle pin.
    */
  private lazy val mmVideoClustersOracle: String =
    """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 288) ] AS px
        |  FROM t
        |), g AS (
        |  SELECT doc_id, px FROM g0
        |  UNION ALL
        |  SELECT doc_id + 900000000 AS doc_id,
        |    [ CASE WHEN i IN (1, 82, 163) THEN 255 ELSE px[i] END
        |      for i in range(1, 289) ] AS px
        |  FROM g0 WHERE doc_id % 100 = 7
        |), s AS (
        |  SELECT doc_id,
        |    [ (  CASE WHEN px[  0 + (((j + 61) % 64) // 8) * 9 + (((j + 61) % 64) % 8) + 1]
        |              < px[  0 + (((j + 61) % 64) // 8) * 9 + (((j + 61) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[ 72 + (((j + 62) % 64) // 8) * 9 + (((j + 62) % 64) % 8) + 1]
        |              < px[ 72 + (((j + 62) % 64) // 8) * 9 + (((j + 62) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[144 + (((j + 63) % 64) // 8) * 9 + (((j + 63) % 64) % 8) + 1]
        |              < px[144 + (((j + 63) % 64) // 8) * 9 + (((j + 63) % 64) % 8) + 2] THEN 1 ELSE 0 END
        |       + CASE WHEN px[216 + (j // 8) * 9 + (j % 8) + 1]
        |              < px[216 + (j // 8) * 9 + (j % 8) + 2] THEN 1 ELSE 0 END
        |      ) % 2 for j in range(0, 64) ] AS bits
        |  FROM g
        |), p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE list_sum(list_transform(range(1, 65),
        |    i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) <= 3
        |), edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM p
        |  UNION
        |  SELECT doc_b, doc_a FROM p
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        |), comp AS (
        |  SELECT u AS doc_id, least(u, min(v)) AS component_id
        |  FROM reach WHERE v <> u GROUP BY u
        |)
        |SELECT g.doc_id,
        |  coalesce(c.component_id, g.doc_id) AS component_id,
        |  coalesce(c.component_id, g.doc_id) = g.doc_id AS keep
        |FROM g LEFT JOIN comp c USING (doc_id)""".stripMargin

  private lazy val mmClustersOracle: String =
    s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 72) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[(i // 8) * 9 + (i % 8) + 1]
        |              < px[(i // 8) * 9 + (i % 8) + 2]
        |           THEN 1 ELSE 0 END for i in range(0, 64) ] AS bits
        |  FROM g
        |)$mediaClusterClosure""".stripMargin

  private lazy val mmAudioClustersOracle: String =
    s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |         substr(md5(tk[(i % len(tk)) + 1]), 2, 1)) - 1
        |      for i in range(0, 65) ] AS px
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    [ CASE WHEN px[i] < px[i + 1] THEN 1 ELSE 0 END
        |      for i in range(1, 65) ] AS bits
        |  FROM g
        |)$mediaClusterClosure""".stripMargin

  private val mediaClusterClosure: String =
    """, p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE list_sum(list_transform(range(1, 65),
      |    i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) <= 3
      |), edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM p
      |  UNION
      |  SELECT doc_b, doc_a FROM p
      |), reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      |), comp AS (
      |  SELECT u AS doc_id, least(u, min(v)) AS component_id
      |  FROM reach WHERE v <> u GROUP BY u
      |)
      |SELECT s.doc_id,
      |  coalesce(c.component_id, s.doc_id) AS component_id,
      |  coalesce(c.component_id, s.doc_id) = s.doc_id AS keep
      |FROM s LEFT JOIN comp c USING (doc_id)""".stripMargin

  private def clusterCtes(threshold: Double): String =
    s"""WITH RECURSIVE $jaccardCtes, pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM inter
       |  JOIN cnt ca ON ca.doc_id = doc_a
       |  JOIN cnt cb ON cb.doc_id = doc_b
       |  WHERE i / (ca.n + cb.n - i) >= $threshold
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |), comp AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS component_id
       |  FROM reach WHERE v <> u GROUP BY u
       |)""".stripMargin

  /** Cluster resolution oracle: every corpus doc labeled with its
    * component (singletons = themselves) and a keep flag.
    */
  private def clusterOracle(threshold: Double): String =
    s"""${clusterCtes(threshold)}
       |SELECT d.doc_id,
       |  coalesce(c.component_id, d.doc_id) AS component_id,
       |  coalesce(c.component_id, d.doc_id) = d.doc_id AS keep
       |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""".stripMargin

  /** Deduplicated-corpus oracle: the rows whose cluster representative
    * they are (singletons included).
    */
  private def dedupFilteredOracle(threshold: Double): String =
    s"""${clusterCtes(threshold)}
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
       |WHERE coalesce(c.component_id, d.doc_id) = d.doc_id""".stripMargin

  /** Quality-argmax representative per component: same cluster CTEs,
    * readability re-derived per member, rank-1 under (flesch desc,
    * doc_id) — the window's RANGE/ROWS distinction is moot because
    * doc_id makes the order unique. Shared by `dedup_best_rep` and
    * its index-probe twin (the engine's quality-argmax stage is
    * shared code over either membership relation).
    */
  private lazy val bestRepOracle: String =
    s"""${clusterCtes(0.8)}, m AS (
       |  SELECT d.doc_id, coalesce(c.component_id, d.doc_id)
       |    AS component_id
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
       |), ra AS (
       |  SELECT doc_id,
       |    greatest(len(regexp_extract_all(
       |      translate(text, 'eo', '.!'), '[^.!?]+[.!?]')), 1)
       |      AS n_sent,
       |    greatest(len(list_filter(regexp_split_to_array(
       |      trim(lower(text)), '\\s+'), w -> w <> '')), 1) AS n_words,
       |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
       |  FROM documents
       |), rq AS (
       |  SELECT doc_id,
       |    round(CAST(206.835 AS DOUBLE)
       |      - CAST(1.015 AS DOUBLE)
       |        * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
       |      - CAST(84.6 AS DOUBLE)
       |        * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
       |      6) AS flesch
       |  FROM ra
       |), jn AS (
       |  SELECT m.component_id, m.doc_id, rq.flesch,
       |    row_number() OVER (PARTITION BY m.component_id
       |                       ORDER BY rq.flesch DESC, m.doc_id) AS rk,
       |    count(*) OVER (PARTITION BY m.component_id) AS n_members
       |  FROM m JOIN rq ON rq.doc_id = m.doc_id
       |)
       |SELECT component_id, doc_id AS rep_doc, flesch AS rep_flesch,
       |  CAST(n_members AS INTEGER) AS n_members
       |FROM jn WHERE rk = 1""".stripMargin
}
