package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.ops.{Html, Robots, UrlOps}
import graft.sources.Warc
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous crawl ingestion: WARC files arrive on a stream (a
  * crawler's output directory, in production a cloud bucket), and
  * each micro-batch runs the full front-end pipeline — record
  * framing + gunzip → HTTP split → HTML main-text extraction →
  * URL canonicalization → robots-policy verdict — landing a clean
  * documents table partitioned by micro-batch id.
  *
  * Same idempotency protocol as [[StreamingDedup]]: every batch
  * (over)writes `outPath/batch_id=<id>`, so foreachBatch's
  * at-least-once replay recreates the directory instead of appending
  * duplicates; readers see one partitioned table at `outPath`.
  *
  * All per-record work is partition-local (the batch is a binary
  * payload column; parsing never shuffles), so per-micro-batch
  * latency tracks the BATCH size, not anything accumulated — the
  * property the streaming-probe latency evidence pins for the other
  * streams.
  */
object StreamingIngest {

  /** Input rows: (file_id, payload) — one WARC file per row. */
  def ingestStream(
      warcFiles: DataFrame,
      outPath: String,
      checkpointDir: String,
      agent: String = "GraftBot/1.0",
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    warcFiles.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, outPath, agent, batchId); ()
      }
      .start()

  final case class IngestedDoc(
      file_id: Long,
      rec_idx: Int,
      url: String,
      norm_url: String,
      http_status: Int,
      title: String,
      body: String,
      n_links: Int,
      allowed: Boolean)

  /** One micro-batch: parse every WARC file's response records into
    * extracted documents with canonical URLs and policy verdicts,
    * write the batch directory, return the row count.
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      outPath: String,
      agent: String,
      batchId: Long
  ): Long = {
    val s = batch.sparkSession
    import s.implicits._
    val extracted = batch
      .select(col("file_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val robotsMemo =
          scala.collection.mutable.HashMap.empty[String, Vector[Robots.Rule]]
        it.flatMap { case (fileId, bytes) =>
          Warc.parseFile(bytes).zipWithIndex.collect {
            case (r, idx) if r.warcType == "response" =>
              val url = r.header("WARC-Target-URI").getOrElse("")
              val status = Warc.httpStatus(r.payload).getOrElse(-1)
              val html = new String(Warc.httpBody(r.payload),
                java.nio.charset.StandardCharsets.UTF_8)
              val e = Html.extract(html)
              // crawl URLs routinely violate RFC 3986 (spaces, bars,
              // raw non-ASCII) — a throwing parse must not kill the
              // micro-batch; unparseable URLs keep an empty host and
              // the root path, and the robots default-allow applies
              val (host, path) =
                try {
                  val u = java.net.URI.create(url)
                  (Option(u.getHost).getOrElse(""),
                    Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
                } catch { case _: IllegalArgumentException => ("", "/") }
              val rules = robotsMemo.getOrElseUpdate(host,
                Robots.rulesFor(Robots.synthRobots(host), agent))
              IngestedDoc(
                fileId, idx, url, url, status, e.title,
                Html.mainText(e), e.nLinks,
                Robots.decide(rules, path)._1)
          }
        }
      }
    // batch-local canonicalization over the extracted URL column
    // (the generic normalizer, not the fixture formula)
    val withNorm = extracted.toDF()
      .withColumn("norm_url",
        UrlOps.normalized(col("url")).head)
    withNorm.write.mode("overwrite")
      .parquet(s"$outPath/batch_id=$batchId")
    // count the just-written files — recomputing withNorm would rerun
    // the whole gunzip + parse + extract pipeline a second time
    s.read.parquet(s"$outPath/batch_id=$batchId").count()
  }

  /** The accumulated clean-documents table across all batches; empty
    * typed relation before the first commit.
    */
  def docs(s: SparkSession, outPath: String): DataFrame =
    if (!hasBatchDirs(outPath))
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(
          "file_id BIGINT, rec_idx INT, url STRING, norm_url STRING, " +
            "http_status INT, title STRING, body STRING, n_links INT, " +
            "allowed BOOLEAN, batch_id BIGINT"))
    else s.read.option("basePath", outPath).parquet(outPath)
      .withColumn("batch_id", col("batch_id").cast("long"))

  private def hasBatchDirs(outPath: String): Boolean = {
    val d = new java.io.File(outPath)
    d.isDirectory && {
      val kids = d.listFiles()
      kids != null && kids.exists(f =>
        f.isDirectory && f.getName.startsWith("batch_id="))
    }
  }
}
