package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.ops.KnIndex
import graft.streaming.StreamingLm

/** End-to-end pin for continuous frozen-model LM scoring: documents
  * stream in, per-document KN scores stream out, the streamed scores
  * equal one-job [[KnIndex.score]] over the union of all batches,
  * replay is idempotent, and a real AvailableNow stream drives the
  * same path.
  */
final case class LmDoc(doc_id: Long, text: String)

class StreamingLmSpec extends SparkSpec {

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }

  private lazy val idx: String = {
    val p = Files.createTempDirectory("graft-slm-idx").toString
    KnIndex.build(spark, sf(), p)
    p
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "split", "n_scored", "nll", "bucket")
      .collect().map(_.toString).toSet

  test("streamed scores equal one-job KnIndex.score over the union; " +
    "replay overwrites; zero-batch reader is empty") {
    val out = Files.createTempDirectory("slm_out")
    try {
      assert(StreamingLm.scores(spark, out.toString).count() == 0,
        "zero-batch reader must be an empty typed relation")
      val d = spark.read.parquet(s"${sf()}/documents.parquet")
        .select("doc_id", "text")
      val b0 = d.filter(col("doc_id") % 2 === 0)
      val b1 = d.filter(col("doc_id") % 2 === 1)
      StreamingLm.applyBatch(b0, idx, out.toString, 0.95, 1.05, 0L)
      StreamingLm.applyBatch(b1, idx, out.toString, 0.95, 1.05, 1L)
      val want = rows(KnIndex.score(spark, idx, d))
      assert(rows(StreamingLm.scores(spark, out.toString)) == want,
        "streamed union must equal one-job frozen-model scoring")
      // at-least-once: re-running batch 1 overwrites its directory —
      // the table must not grow or drift
      StreamingLm.applyBatch(b1, idx, out.toString, 0.95, 1.05, 1L)
      assert(rows(StreamingLm.scores(spark, out.toString)) == want,
        "a replayed micro-batch must overwrite, never append")
      // and an emptied replay erases its stale rows
      StreamingLm.applyBatch(b1.limit(0), idx, out.toString, 0.95, 1.05, 1L)
      assert(rows(StreamingLm.scores(spark, out.toString))
        == rows(KnIndex.score(spark, idx, b0)),
        "an empty replay must erase the batch's stale scores")
    } finally rmTree(out)
  }

  test("end-to-end through a real AvailableNow stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("slm_e2e_out")
    val ckpt = Files.createTempDirectory("slm_e2e_ckpt")
    try {
      val d = spark.read.parquet(s"${sf()}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(20)
        .collect().map(r => LmDoc(r.getLong(0), r.getString(1)))
      val (first, second) = d.splitAt(10)
      val input = MemoryStream[LmDoc]
      input.addData(first.toIndexedSeq)
      StreamingLm.scoreStream(input.toDF(), idx, out.toString,
        ckpt.toString).awaitTermination()
      input.addData(second.toIndexedSeq)
      StreamingLm.scoreStream(input.toDF(), idx, out.toString,
        ckpt.toString).awaitTermination()
      val want = rows(KnIndex.score(spark, idx,
        spark.createDataset(d.toIndexedSeq).toDF("doc_id", "text")))
      assert(rows(StreamingLm.scores(spark, out.toString)) == want,
        "two real micro-batches must equal one-job scoring")
    } finally { rmTree(out); rmTree(ckpt) }
  }
}
