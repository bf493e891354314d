package graft

import graft.ops.{BloomIndex, Dedup, IndexCommit}
import org.apache.spark.sql.functions._

/** Pins for the persisted Bloom decontamination filter: the lossless
  * round-trip, the exact OR-append, and the config guard. Value-level
  * probe correctness rides the DuckDB oracle gate (both index queries
  * share the one-job oracle).
  */
class BloomIndexSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def tmpDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private def words(path: String): Map[Long, Long] =
    spark.read.parquet(
      s"${IndexCommit.currentDir(spark, path).get}/words").collect()
      .map(r => r.getAs[Long]("w") -> r.getAs[Long]("bits")).toMap

  test("build+probe equals the one-job bloom contamination") {
    val idx = tmpDir("bloomidx")
    try {
      BloomIndex.build(spark, docs.filter(col("doc_id") % 50 === 0),
        idx.toString)
      val probed = BloomIndex.probe(spark, idx.toString,
        docs.filter(col("doc_id") % 50 =!= 0)).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged"))
        .toMap
      val oneJob = Dedup.bloomContamination(spark, sf()).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged"))
        .toMap
      assert(probed == oneJob,
        "persisted filter round-trip must be lossless")
    } finally rmTree(idx)
  }

  test("append is word-wise OR: bit-identical to building from the union") {
    val full = tmpDir("bloomidx_full")
    val inc = tmpDir("bloomidx_inc")
    try {
      val bench = docs.filter(col("doc_id") % 50 === 0)
      BloomIndex.build(spark, bench, full.toString)
      BloomIndex.build(spark,
        bench.filter(col("doc_id") % 100 === 0), inc.toString)
      BloomIndex.append(spark,
        bench.filter(col("doc_id") % 100 =!= 0), inc.toString)
      val w = words(full.toString)
      assert(w == words(inc.toString),
        "append(build(A), B) must equal build(A ∪ B) bit-for-bit")
      // the dense layout: every word index present, content-independent
      assert(w.keySet == (0L until 1024L).toSet)
      assert(w.values.exists(_ != 0L), "filter must not be empty")
    } finally { rmTree(full); rmTree(inc) }
  }

  test("streaming probe matches the direct probe and replays idempotently") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDecontaminate
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmpDir("bloomidx_stream")
    val out = tmpDir("bloomidx_out").toString
    val ckpt = tmpDir("bloomidx_ckpt").toString
    try {
      BloomIndex.build(spark, docs.filter(col("doc_id") % 50 === 0),
        idx.toString)
      // zero-batch reader: empty typed relation, not a path error
      assert(StreamingDecontaminate.verdicts(spark, out).count() == 0)
      val all = docs.filter(col("doc_id") % 50 =!= 0)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(r => Doc(r.getLong(0), r.getString(1)))
      val (first, second) = all.splitAt(all.length / 2)
      val input = MemoryStream[Doc]
      input.addData(first.toIndexedSeq)
      StreamingDecontaminate.probeStream(input.toDF(), idx.toString, out, ckpt)
        .awaitTermination()
      input.addData(second.toIndexedSeq)
      StreamingDecontaminate.probeStream(input.toDF(), idx.toString, out, ckpt)
        .awaitTermination()
      val streamed = StreamingDecontaminate.verdicts(spark, out)
      val direct = BloomIndex.probe(spark, idx.toString,
        docs.filter(col("doc_id") % 50 =!= 0)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(streamed.select("doc_id", "n_flagged", "contaminated")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet == direct)
      // at-least-once replay: re-running a batch id overwrites its own
      // directory instead of duplicating verdicts
      val before = streamed.count()
      StreamingDecontaminate.applyBatch(first.toSeq.toDF("doc_id", "text"),
        idx.toString, out, batchId = 0L)
      assert(StreamingDecontaminate.verdicts(spark, out).count() == before)
    } finally rmTree(idx)
  }

  test("meta guards the hash configuration across build/append/probe") {
    val idx = tmpDir("bloomidx_meta")
    try {
      BloomIndex.build(spark, docs.filter(col("doc_id") % 50 === 0),
        idx.toString, n = 8, mBits = 2048, kHash = 2)
      val m = BloomIndex.readMeta(spark, idx.toString)
      assert(m == BloomIndex.Meta(8, 2048, 2))
      // a probe picks the persisted config up, not defaults: the 2048-
      // bit filter's words relation is 32 longs and the probe must
      // still agree with the one-job run at the SAME sizing
      val probed = BloomIndex.probe(spark, idx.toString,
        docs.filter(col("doc_id") % 50 =!= 0)).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged"))
        .toMap
      val oneJob = Dedup.bloomContamination(spark, sf(),
        mBits = 2048, kHash = 2).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged"))
        .toMap
      assert(probed == oneJob)
    } finally rmTree(idx)
  }

  test("kHash is capped at 8: j=8 would overflow the 60-bit double-hash") {
    // h1 + j*h2 with h1,h2 < 2^60 wraps signed-64 at j=8 — negative
    // positions drop build-side bits (false negatives) and can index
    // the probe loop out of bounds, so the guard must reject k=9 at
    // every entry point
    val idx = tmpDir("bloomidx_k9")
    try {
      intercept[IllegalArgumentException] {
        BloomIndex.build(spark, docs.limit(1), idx.toString,
          n = 8, mBits = 2048, kHash = 9)
      }
      intercept[IllegalArgumentException] {
        Dedup.bloomContamination(spark, sf(), mBits = 2048, kHash = 9)
      }
      // the boundary itself is legal: k=8 keeps j <= 7
      BloomIndex.build(spark, docs.filter(col("doc_id") % 50 === 0),
        idx.toString, n = 8, mBits = 2048, kHash = 8)
      val probed = BloomIndex.probe(spark, idx.toString,
        docs.filter(col("doc_id") % 50 =!= 0))
      assert(probed.count() > 0)
      // one-sidedness holds at the max k: every position is in range,
      // so no document a k=2 filter flags as >= 1 hit can lose hits
      // to wrapped-negative indices here (no exception = no OOB)
      assert(probed.agg(org.apache.spark.sql.functions.min(
        col("n_flagged"))).head().getLong(0) >= 0L)
    } finally rmTree(idx)
  }
}
