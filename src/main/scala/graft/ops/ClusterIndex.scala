package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted duplicate-CLUSTER index — the last-mile dedup relation
  * ([[Dedup.duplicateClusters]]' (doc_id, component_id) assignment)
  * stored as a versioned index, so every downstream consumer of the
  * cluster structure (the deduplicated corpus, quality-argmax
  * representatives, survivorship reports) PROBES a committed relation
  * instead of re-deriving the whole LSH→connected-components pipeline
  * per query — three full dedup subtrees at 100 TB become one.
  *
  * Layout under the index root:
  * {{{
  *   lsh/                 an embedded [[LshIndex]] (bands/sets/hot/
  *                        meta, its own commit protocol) — the pair
  *                        source for builds AND the probe target for
  *                        appends
  *   v=<id>/clusters      the full (doc_id, component_id) assignment
  *   commits/<id>, locks/ [[IndexCommit]] markers for cluster versions
  * }}}
  * The assignment is a FULL snapshot per version, not a delta
  * segment: component merges rewrite labels of previously-assigned
  * documents (an arriving batch can bridge two old clusters), so
  * union-of-segments semantics cannot represent an append. The
  * relation is 16 bytes/doc — corpus-CARDINALITY-proportional but
  * text-free, the same economics as the LSH `sets` relation; a
  * production deployment would partition it by component range and
  * rewrite only touched partitions, which the marker protocol
  * already permits (publish staged partitions, then commit).
  *
  * Scale contract: corpus TEXT is read exactly once, at [[build]].
  * [[append]] tokenizes only the batch (via [[LshIndex.append]] +
  * [[LshIndex.probe]]), runs connected components over the LABEL
  * graph (batch-edge-proportional, not corpus-proportional — old
  * components enter as single label nodes), and rewrites the
  * assignment relation with one doc-keyed join. Probe-side
  * consumers ([[filteredCorpus]], [[bestRepresentatives]]) cost one
  * doc-keyed join against the committed assignment.
  *
  * Guard caveat (shared with [[LshIndex.append]], documented there):
  * the hot-shingle guard persisted at build time is the BUILD
  * corpus's; a batch-only-hot shingle keeps feeding candidates until
  * the next rebuild. Degrades toward more candidates, never wrong
  * answers — verification is exact either way.
  */
object ClusterIndex {

  private def lshRoot(path: String): String = s"$path/lsh"

  private def segDirs(s: SparkSession, path: String): Seq[String] = {
    val lsh = lshRoot(path)
    val ids = IndexCommit.committedIds(s, lsh)
    require(ids.nonEmpty, s"no committed LSH segment under $lsh")
    ids.map(IndexCommit.versionDir(lsh, _))
  }

  /** Verified near-dup pairs among the documents the embedded LSH
    * index currently holds — [[Dedup.minhashLshPairsDf]]'s exact
    * semantics (band-bucket candidates, exact-Jaccard verification)
    * computed FROM the persisted bands/sets relations, so a build
    * never tokenizes the corpus twice.
    */
  private def selfPairs(
      s: SparkSession, path: String, threshold: Double): DataFrame = {
    val segs = segDirs(s, path)
    val bands = s.read.parquet(segs.map(_ + "/bands"): _*)
    val cand = bands.toDF("doc_a", "band", "key")
      .join(bands.toDF("doc_b", "band", "key"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = s.read.parquet(segs.map(_ + "/sets"): _*)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cand
      .join(sets.toDF("doc_a", "sh_a"), "doc_a")
      .join(sets.toDF("doc_b", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b")
  }

  private def publish(
      s: SparkSession, path: String, assign: DataFrame): Long = {
    val id = IndexCommit.reserve(s, path)
    assign.write.mode("overwrite")
      .parquet(s"${IndexCommit.versionDir(path, id)}/clusters")
    IndexCommit.commit(s, path, id)
    id
  }

  /** Build the index from the corpus at `dir` (optionally restricted
    * by `docFilter`): one [[LshIndex.build]] (the only corpus
    * tokenization), pairs derived from the persisted relations,
    * connected components, and the full assignment published as the
    * base version. Returns the committed version id.
    */
  def build(
      s: SparkSession, dir: String, path: String,
      threshold: Double = 0.8, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      maxDocFreq: Option[Double] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None): Long = {
    LshIndex.build(s, dir, lshRoot(path), n, numHashes, rowsPerBand,
      maxDocFreq, docFilter)
    val scope = new CacheScope
    try {
      val comp = Dedup.connectedComponents(
        selfPairs(s, path, threshold)
          .select(col("doc_a").as("u"), col("doc_b").as("v")), scope)
      val d = docFilter.foldLeft(
        s.read.parquet(s"$dir/documents.parquet"))((x, f) => x.filter(f))
      publish(s, path,
        d.select("doc_id")
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component_id"), col("doc_id"))
              .as("component_id")))
    } finally scope.release()
  }

  /** Fold a batch of NEW documents into the index: append the batch
    * to the embedded LSH index, probe it for every new verified pair
    * (batch↔corpus and batch↔batch — probing AFTER the append makes
    * one probe return both), then merge components over the LABEL
    * graph: each edge endpoint contracts to its current component id,
    * connected components run on that batch-proportional graph, and
    * the assignment rewrite is one label-keyed join. Labels are
    * component MINIMA, so the merged label (min of member labels) is
    * the min doc_id over all merged members — [[append]] after
    * [[build]](A) equals [[build]](A∪B) exactly whenever the hot-set
    * guards coincide (spec-pinned; trivially true with no guard).
    *
    * NOT idempotent under replay, like [[LshIndex.append]]: callers
    * dedup upstream or track applied batch ids. Atomic: both the LSH
    * segment and the new assignment version land behind commit
    * markers, so a kill at any point leaves the previous version
    * answering (the torn assignment is invisible; a committed LSH
    * segment without its assignment version only means the next
    * append's probe sees the batch early — candidates, not answers).
    */
  def append(
      s: SparkSession, path: String, batch: DataFrame,
      threshold: Double = 0.8): Long = {
    LshIndex.append(s, lshRoot(path), batch)
    val scope = new CacheScope
    try {
      val edges = LshIndex.probe(s, lshRoot(path), batch, threshold, scope)
        .filter(col("doc_new") =!= col("doc_idx"))
        .select(col("doc_new").as("u"), col("doc_idx").as("v"))
      val cur = assignment(s, path)
      // contract edge endpoints to current labels (batch docs are
      // their own label until merged)
      val lu = cur.toDF("u", "lu")
      val lv = cur.toDF("v", "lv")
      val labelEdges = edges
        .join(lu, Seq("u"), "left")
        .join(lv, Seq("v"), "left")
        .select(coalesce(col("lu"), col("u")).as("u"),
          coalesce(col("lv"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val remap = Dedup.connectedComponents(labelEdges, scope)
        .toDF("old_label", "new_label")
      // batch docs not present in the current assignment start as
      // their own singleton rows, then both populations remap
      val added = batch.select("doc_id")
        .join(cur.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("component_id"))
      publish(s, path,
        cur.unionByName(added)
          .join(remap,
            col("component_id") === col("old_label"), "left")
          .select(col("doc_id"),
            coalesce(col("new_label"), col("component_id"))
              .as("component_id")))
    } finally scope.release()
  }

  private def assignment(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"${IndexCommit.currentDir(s, path).getOrElse(
      sys.error(s"no committed cluster index under $path"))}/clusters")

  /** The CURRENT committed cluster relation — identical rows to
    * [[Dedup.duplicateClusters]] over the indexed corpus:
    * (doc_id, component_id, keep) with keep marking the min-id
    * representative.
    */
  def clusters(s: SparkSession, path: String): DataFrame =
    assignment(s, path)
      .withColumn("keep", col("doc_id") === col("component_id"))

  /** The deduplicated corpus via the index — [[Dedup.dedupedCorpus]]'s
    * rows from one doc-keyed join against the committed keep-set,
    * zero dedup recomputation.
    */
  def filteredCorpus(s: SparkSession, dir: String, path: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .join(clusters(s, path).filter(col("keep")).select("doc_id"),
        Seq("doc_id"))
      .select("doc_id", "lang", "source", "n_chars")

  /** Quality-argmax representatives via the index —
    * [[Dedup.bestRepresentatives]]' rows with the cluster relation
    * read from the committed assignment instead of re-derived.
    */
  def bestRepresentatives(
      s: SparkSession, dir: String, path: String): DataFrame =
    Dedup.bestRepresentativesOf(s, dir,
      assignment(s, path).select("doc_id", "component_id"))
}
