package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.ops.{BloomIndex, LshIndex, VectorIndex}
import graft.streaming.{StreamingAnn, StreamingDecontaminate, StreamingDedup}

/** Streaming latency evidence (SCALE_r08): per-micro-batch latencies
  * for the three index-probe streams, measured through Spark's own
  * `StreamingQueryProgress` (batchId, numInputRows, triggerExecution
  * ms) on REAL MemoryStream queries — not a hand-timed batch body.
  *
  * Two claims, each needing its own axis:
  *   - batch-proportional: on the SAME index, a 10× larger micro-batch
  *     must cost ≪ 10× the trigger latency (fixed per-trigger overhead
  *     amortizes; probe work is batch-sized).
  *   - corpus-independent: the SAME batch against an index built over
  *     10× the corpus must cost ≈ 1× (the Bloom filter is 8 KB at any
  *     corpus size; LSH/IVF candidate mass is bucket-bounded — the
  *     index-side scan is the one corpus-proportional term, reported
  *     honestly as measured).
  *
  * Usage: runMain graft.StreamProbe <mode> <dir1x> <dir10x> [batch]
  *   mode ∈ {decon, dedup, ann, ingest}; batch = small-batch rows
  *   (default 500 docs / 100 ann queries; the committed ingest rows
  *   used 100). `ingest` probes [[graft.streaming.StreamingIngest]]
  *   (stateless, so no corpus axis) with a third warmed-small
  *   trigger. Emits one JSON line per micro-batch.
  */
object StreamProbe {

  final case class PDoc(doc_id: Long, text: String)
  final case class PVec(query_id: Long, qv: Seq[Double])
  final case class PWarc(file_id: Long, payload: Array[Byte])

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def emit(
      mode: String, corpus: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      println(s"""{"mode":"$mode","corpus":"$corpus",""" +
        s""""batch_id":${p.batchId},"batch_rows":${p.numInputRows},""" +
        s""""trigger_secs":${p.durationMs.get("triggerExecution") / 1000.0}}""")
    }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir1x = args.lift(1).getOrElse("/tmp/scaleovl1x")
    val dir10x = args.lift(2).getOrElse("/tmp/scaleovl10x")
    val small = args.lift(3).map(_.toInt)
      .getOrElse(if (mode == "ann") 100 else 500)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def docsOf(dir: String) = spark.read.parquet(s"$dir/documents.parquet")

    def docBatch(dir: String, n: Int): Seq[PDoc] =
      docsOf(dir).filter(col("doc_id") % 10 === 0)
        .select("doc_id", "text").limit(n).collect()
        .map(r => PDoc(r.getLong(0), r.getString(1))).toSeq

    def vecBatch(dir: String, n: Int): Seq[PVec] =
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"),
          org.apache.spark.sql.functions.expr(
            "transform(embedding, x -> cast(x as double))").as("v"))
        .limit(n).collect()
        .map(r => PVec(r.getLong(0), r.getSeq[Double](1))).toSeq

    /** ONE MemoryStream and ONE checkpoint per corpus; each batch is
      * added then drained by its own AvailableNow query — the
      * BloomIndexSpec replay pattern, so micro-batch ids advance
      * through the shared checkpoint and every trigger's latency
      * comes from its query's own progress log.
      */
    def run[T <: Product : org.apache.spark.sql.Encoder](
        corpus: String, batches: Seq[Seq[T]],
        start: (DataFrame, String, String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val out = tmp(s"sp_${mode}_out")
      val ckpt = tmp(s"sp_${mode}_ckpt")
      val input = MemoryStream[T]
      batches.foreach { rows =>
        input.addData(rows)
        val q = start(input.toDF(), out, ckpt)
        q.awaitTermination()
        emit(mode, corpus, q)
      }
    }

    mode match {
      case "decon" =>
        for ((dir, tag) <- Seq((dir1x, "1x"), (dir10x, "10x"))) {
          val idx = tmp("sp_bloomidx")
          BloomIndex.build(spark,
            docsOf(dir).filter(col("doc_id") % 10 =!= 0), idx)
          run[PDoc](tag,
            Seq(docBatch(dir10x, small), docBatch(dir10x, small * 10)),
            (df, out, ckpt) =>
              StreamingDecontaminate.probeStream(df, idx, out, ckpt))
        }
      case "dedup" =>
        for ((dir, tag) <- Seq((dir1x, "1x"), (dir10x, "10x"))) {
          val idx = tmp("sp_lshidx")
          LshIndex.build(spark, dir, idx,
            docFilter = Some(col("doc_id") % 10 =!= 0))
          run[PDoc](tag,
            Seq(docBatch(dir10x, small), docBatch(dir10x, small * 10)),
            (df, out, ckpt) =>
              StreamingDedup.probeStream(df, idx, out, ckpt))
        }
      case "ann" =>
        for ((dir, tag) <- Seq((dir1x, "1x"), (dir10x, "10x"))) {
          val idx = tmp("sp_vecidx")
          VectorIndex.build(spark, dir, idx,
            vecFilter = Some(col("vec_id") % 10 =!= 0))
          run[PVec](tag,
            Seq(vecBatch(dir10x, small), vecBatch(dir10x, small * 10)),
            (df, out, ckpt) =>
              StreamingAnn.probeStream(df, idx, out, ckpt))
        }
      case "ingest" =>
        // continuous crawl ingestion has NO index/corpus-side state at
        // all — the only axis is batch size. WARC files are built from
        // the same held-out carve the other modes' docBatch samples
        // (synthWarc needs ≥ 2 tokens for the title/url derivation —
        // shorter docs are skipped rather than crashing the probe).
        val files = docsOf(dir10x).filter(col("doc_id") % 10 === 0)
          .select("doc_id", "source", "text").limit(small * 12).collect()
          .filter(_.getString(2).trim.split("\\s+").length >= 2)
          .take(small * 10)
          .map(r => PWarc(r.getLong(0),
            graft.ops.CrawlOps.synthWarc(
              r.getLong(0), r.getString(1), r.getString(2)))).toSeq
        // warmup small, then 10x, then small again — the warmed pair
        // is the honest batch-proportionality comparison (trigger 0
        // pays JVM/codegen warmup)
        run[PWarc]("none",
          Seq(files.take(small), files, files.take(small)),
          (df, out, ckpt) =>
            graft.streaming.StreamingIngest.ingestStream(
              df.toDF(), out, ckpt))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
