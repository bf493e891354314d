package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located join — the storage-layout optimization for the
  * joins a pipeline repeats on the same key at 100 TB.
  *
  * Every `dedup_*`/`decontaminate_*`/`mix_*` pass ends in a doc-keyed
  * join (verdicts, keep-sets, features back onto the corpus). Done
  * naively, EACH of those joins re-shuffles the full corpus on
  * `doc_id`. The fix is to pay the shuffle once at ingest: persist
  * the corpus (and every doc-keyed derived relation) with
  * `bucketBy(N, "doc_id")` — then any equi-join between two relations
  * bucketed the same way compiles with ZERO Exchange: each task reads
  * bucket i of both sides, which hold exactly the same key slice.
  * On a 1000-executor cluster this removes the dominant network cost
  * of the whole verdict-application family; the bucket count is the
  * knob that sets task granularity (N = multiple of executor slots).
  *
  * [[bucketedVerdictJoin]] demonstrates the full cycle: write the
  * corpus slice and a derived per-doc stats relation as bucketed
  * tables (same N, same key, sorted within buckets), then join them
  * back. BucketedSpec pins on the EXECUTED plan that the join is a
  * SortMergeJoin with no Exchange of any kind — the physical claim
  * the scaladoc-level "a deployment would bucketBy" notes elsewhere
  * (LshIndex, VectorIndex) now have a working, spec-pinned instance
  * of. The result itself is logically a plain join, so the DuckDB
  * oracle recomputes it directly — bucketing must be invisible to
  * semantics, visible only to the plan.
  *
  * Reference scope note: the reference stages deltas into a temp
  * table precisely so its UPDATE joins on co-located keys inside the
  * database (`/root/reference/dbimport/importer.py:263-330`) — this
  * is the lake-side equivalent of that staging decision.
  */
object Bucketed {

  /** Buckets chosen as a small multiple of local[32]'s slots; at
    * cluster scale this would be a multiple of total executor cores.
    */
  val Buckets = 16

  /** Write `df` as a bucketed external table at `path`, replacing any
    * prior version. Bucket metadata lives in the session catalog;
    * the files are plain parquet (engine-portable — a reader without
    * the catalog entry sees an ordinary directory).
    */
  private def writeBucketed(
      df: DataFrame, table: String, path: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(Buckets, "doc_id")
      .sortBy("doc_id")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Partition-pruned corpus layout: the OTHER ingest-time layout
    * decision (the first is bucketing, above). Low-cardinality
    * columns a pipeline filters on constantly — language, source —
    * become directory partitions (`partitionBy`), so a filtered read
    * never opens the other partitions' files at all: the plan's
    * `PartitionFilters` prune BEFORE any I/O, where `PushedFilters`
    * still reads footers. At 100 TB "English only" then touches only
    * the `lang=en/` subtree — typically the difference between a
    * full-corpus scan and a fraction of it, decided by the catalog,
    * not by tasks. The query writes the corpus partitioned by `lang`,
    * then answers a per-source count over one language; BucketedSpec
    * pins on the executed plan that the scan's partition count is the
    * selected subset and the lang predicate sits in
    * `PartitionFilters` (data filters stay pushed separately).
    */
  def partitionedScan(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite")
      .partitionBy("lang")
      .parquet(s"$scratch/by_lang")
    s.read.parquet(s"$scratch/by_lang")
      .filter(col("lang") === "en" && col("n_chars") > 200)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** The verdict-application join, co-located: corpus slice ⋈ per-doc
    * token stats, both bucketed on `doc_id`. The `merge` hint forces
    * the SortMergeJoin the fixture's row count would otherwise turn
    * into a broadcast — at corpus scale neither side broadcasts, and
    * the plan this compiles to (bucket-aligned SMJ, zero Exchange) is
    * exactly the 100 TB plan.
    */
  def bucketedVerdictJoin(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    writeBucketed(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "graft_bucketed_docs", s"$scratch/docs")
    writeBucketed(
      docs.select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).as("n_tokens")),
      "graft_bucketed_stats", s"$scratch/stats")
    s.table("graft_bucketed_docs")
      .hint("merge")
      .join(s.table("graft_bucketed_stats"), "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("n_tokens"))
  }

  /** ORC round-trip: export the corpus slice to ORC (Spark's other
    * columnar format — the interchange surface for Hive-era lakes)
    * and read it back, returning row-level content: equality with the
    * parquet-derived oracle pins the export lossless for longs,
    * strings, and the md5 fingerprint column. The write is one narrow
    * pass; the read-back scan is columnar ORC with the same pruning
    * machinery parquet gets.
    */
  def orcRoundTrip(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_fp"))
      .write.mode("overwrite").orc(s"$scratch/docs_orc")
    s.read.orc(s"$scratch/docs_orc")
  }

  /** CSV export round-trip under ADVERSARIAL content: every row
    * carries a field holding the delimiter, a double quote, and a
    * literal newline (derived from the text so the oracle can rebuild
    * it), written with RFC 4180 quoting (`escape` = `"` — doubled
    * quotes, not backslashes, which Spark does NOT default to) and
    * read back with `multiLine` (a quoted newline otherwise splits
    * the record). Losing any of those three options corrupts rows
    * silently — the oracle recomputes the relation from the raw
    * table, so hash equality pins the writer+reader pair lossless.
    * Scale note: `multiLine` makes a file non-splittable; an export
    * meant for re-ingestion at 100 TB keeps files small at write
    * time (maxRecordsPerFile), which this does.
    */
  def csvRoundTrip(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val path = s"$scratch/docs_csv"
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"),
        concat(lit("x,\"q\"\n"), substring(col("text"), 1, 16))
          .as("tricky"))
      .write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      // the writer TRIMS field whitespace by default — a field ending
      // in a space silently loses it without these two
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("maxRecordsPerFile", 4096)
      .csv(path)
    s.read
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .schema("doc_id BIGINT, source STRING, n_chars BIGINT, tricky STRING")
      .csv(path)
  }

  /** JSONL export round-trip — the interchange format LLM training
    * exports actually ship — under ADVERSARIAL content: every row's
    * string field opens with a double quote, a backslash, a literal
    * newline and tab, a C0 control character (must be u-escaped
    * on the wire or the line framing breaks), and a non-BMP code point
    * (U+1D11E, a surrogate pair in the JVM — truncating either half
    * corrupts it), then carries real corpus text. Structure is
    * exercised too: a nested struct and an int array survive the trip
    * and are flattened for comparison. Read-back is FAILFAST — a
    * malformed line fails the query rather than becoming a silent
    * null row. The oracle rebuilds every field closed-form from the
    * raw table, so hash equality pins the encoder+parser pair
    * lossless, escapes included. Scale note: JSON lines are
    * newline-framed (control chars escaped is what guarantees that),
    * so unlike multiLine CSV the files stay SPLITTABLE — the format
    * a 100 TB re-ingest wants.
    */
  def jsonRoundTrip(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val path = s"$scratch/docs_json"
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(lit("q\"b\\\n\t\u0001𝄞"),
          substring(col("text"), 1, 16)).as("tricky"),
        struct(col("source").as("src"), col("n_chars").as("len"))
          .as("meta"),
        array((col("n_chars") % 7).cast("int"),
          (col("n_chars") % 11).cast("int")).as("arr"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 4096)
      .json(path)
    s.read
      .schema("doc_id BIGINT, tricky STRING, " +
        "meta STRUCT<src: STRING, len: BIGINT>, arr ARRAY<INT>")
      .option("mode", "FAILFAST")
      .json(path)
      .select(col("doc_id"), col("tricky"),
        col("meta.src").as("src"), col("meta.len").as("len"),
        col("arr").getItem(0).as("a0"), col("arr").getItem(1).as("a1"))
  }

  /** SMALL-FILE COMPACTION — the maintenance pass every streaming or
    * incremental ingest needs at 100 TB: micro-batch writers leave
    * thousands of KB-sized files per partition, and scan cost then
    * scales with FILE COUNT (open + footer + planning per file), not
    * bytes. The fixture deliberately manufactures the problem (the
    * corpus slice scattered across 64 files) and compacts it with one
    * range-partitioned, sorted rewrite into 4 key-clustered files —
    * the same shuffle shape as the z-order rewrite, paid once at
    * maintenance time. Semantics must be IDENTITY on the relation
    * (the oracle recomputes it from the raw table); BucketedSpec pins
    * the operational claims — file count collapses 64 → 4, and the
    * per-file doc_id ranges are pairwise DISJOINT after compaction
    * (clustering restores min/max pruning that interleaved small
    * files destroy).
    */
  def compactFiles(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val small = s"$scratch/small"
    val compacted = s"$scratch/compacted"
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(64)
      .write.mode("overwrite").parquet(small)
    s.read.parquet(small)
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(compacted)
    s.read.parquet(compacted)
  }

  /** SCHEMA EVOLUTION round-trip: generation 1 files carry the
    * original columns, generation 2 adds `len` — the shape every
    * long-lived corpus reaches once enrichment passes start landing
    * next to historical files. `mergeSchema` widens the scan to the
    * union schema with NULLs where a generation predates a column;
    * the oracle recomputes exactly which rows carry NULL, so hash
    * equality pins the union-schema read (a reader taking the first
    * file's footer as truth loses the column or misaligns it). Scale
    * note: mergeSchema footer-merging costs one pass over file
    * metadata, not data — and the result shows why evolving columns
    * beat rewriting 100 TB of history.
    */
  def schemaEvolution(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val path = s"$scratch/evolving"
    val docs = s.read.parquet(s"$dir/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"))
      .write.mode("overwrite").parquet(s"$path/gen=1")
    docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars").as("len"))
      .write.mode("overwrite").parquet(s"$path/gen=2")
    s.read.option("mergeSchema", "true").parquet(path)
      .select(col("doc_id"), col("source"), col("len"), col("gen"))
  }

  /** Z-VALUE: bit-interleave two non-negative dimension keys into one
    * sort key (bit i of dim1 → bit 2i, of dim2 → bit 2i+1). Rows
    * close in BOTH dimensions land close in z-order, so sorting by z
    * clusters the file layout for predicates on either or both
    * columns — pure codegen'd bit arithmetic, no UDF.
    */
  def zvalue(c1: Column, c2: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(c1, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(c2, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDER layout demonstration: `lineitem` rewritten clustered by
    * the (l_partkey, l_suppkey) z-value — range-partitioned and
    * sorted by z, then split into small files — and scanned back with
    * a predicate on BOTH dimensions. Single-column sorting can only
    * cluster one of the two: the orthogonal predicate then touches
    * nearly every file, while z-order keeps the touched-file count
    * near the selectivity product (BucketedSpec measures exactly
    * that, z-files < partkey-sorted files for the same scan). At
    * 100 TB this is the difference between a two-dimensional filter
    * reading ~3% of the corpus and reading ~30%: min/max row-group
    * stats prune on both columns only when the layout gives both
    * columns locality. The relation itself is layout-invariant — the
    * oracle recomputes it straight off the raw table.
    */
  def zorderScan(
      s: SparkSession, dir: String, scratch: String): DataFrame = {
    val path = s"$scratch/lineitem_z"
    s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("zv",
        zvalue(col("l_partkey").cast("long"),
          col("l_suppkey").cast("long")))
      .repartitionByRange(Buckets, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1024)
      .parquet(path)
    s.read.parquet(path)
      .where(col("l_partkey").between(64, 127) &&
        col("l_suppkey").between(4, 7))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        Relational.sumd(col("l_extendedprice")).as("sum_price"))
  }
}
