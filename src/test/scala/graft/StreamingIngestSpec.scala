package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{CrawlOps, Html}
import graft.streaming.StreamingIngest

/** End-to-end pin for continuous crawl ingestion: WARC files stream
  * in (mixed plain and gzip-membered), clean extracted documents
  * stream out, replay is idempotent, and the streamed extraction
  * matches the batch extractor on the same bytes.
  */
final case class WarcFile(file_id: Long, payload: Array[Byte])

class StreamingIngestSpec extends SparkSpec {

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }

  test("warc stream -> clean docs: extraction matches batch, replay " +
    "overwrites, zero-batch reader is empty") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("ingest_out")
    val ckpt = Files.createTempDirectory("ingest_ckpt")
    try {
      assert(StreamingIngest.docs(spark, out.toString).count() == 0)

      // four files: two plain (even ids), two gzip-membered (odd)
      val srcDocs = spark.read
        .parquet(s"${sf()}/documents.parquet")
        .select("doc_id", "source", "text").orderBy("doc_id")
        .limit(4).collect()
      val files = srcDocs.map(r => WarcFile(r.getLong(0),
        CrawlOps.synthWarc(r.getLong(0), r.getString(1), r.getString(2))))
      val (first, second) = files.splitAt(2)

      val input = MemoryStream[WarcFile]
      input.addData(first.toIndexedSeq)
      StreamingIngest.ingestStream(input.toDF(), out.toString,
        ckpt.toString).awaitTermination()
      input.addData(second.toIndexedSeq)
      StreamingIngest.ingestStream(input.toDF(), out.toString,
        ckpt.toString).awaitTermination()

      val docs = StreamingIngest.docs(spark, out.toString).collect()
      assert(docs.length == 4) // one response record per file
      srcDocs.foreach { r =>
        val docId = r.getLong(0)
        val row = docs.find(_.getAs[Long]("file_id") == docId).get
        val tk = CrawlOps.tokens(r.getString(2))
        val e = Html.extract(CrawlOps.synthHtml(docId, tk))
        assert(row.getAs[Int]("http_status") == 200)
        assert(row.getAs[String]("title") == e.title)
        assert(row.getAs[String]("body") == Html.mainText(e))
        assert(row.getAs[Int]("n_links") == e.nLinks)
        assert(row.getAs[String]("url") ==
          CrawlOps.synthUrl(r.getString(1), tk))
        // canonicalization ran the generic normalizer: scheme https,
        // host preserved, no trailing mess on this clean fixture url
        assert(row.getAs[String]("norm_url").startsWith("https://"))
        // /tk0/tk1 paths never hit the /cat rules -> allowed
        assert(row.getAs[Boolean]("allowed"))
      }
      // replay idempotency: re-running batch 0 with the same data
      // recreates its directory; the table does not grow
      val before = StreamingIngest.docs(spark, out.toString).count()
      StreamingIngest.applyBatch(
        first.toSeq.toDF("file_id", "payload"), out.toString,
        "GraftBot/1.0", batchId = 0L)
      assert(StreamingIngest.docs(spark, out.toString).count() == before)
    } finally { rmTree(out); rmTree(ckpt) }
  }
}
