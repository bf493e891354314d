package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Crawl-ingestion front end: the upstream half of a training-data
  * pipeline — WARC record extraction and HTML main-text extraction —
  * over deterministically synthesized crawl files.
  *
  * Fixture protocol (the md5-pixel-grid technique the codec queries
  * use, applied to markup): each `documents` row is rendered
  * row-locally into a fully-specified HTML page and a 3-record WARC
  * file (warcinfo + request + response; odd doc_ids compressed as
  * per-record gzip members, the real `.warc.gz` convention). The
  * engine then earns every output through REAL parsing —
  * [[graft.sources.Warc]] record framing + multi-member gunzip,
  * [[Html]] tokenizer + entity decode + link-density boilerplate
  * drop — while the DuckDB oracle recomputes the expected fields
  * arithmetically from the same generative derivation. Hash equality
  * therefore pins the whole synthesize → frame → compress → parse →
  * extract path byte-for-byte. (In production the payload bytes come
  * from crawl files on disk; synthesizing them row-locally from text
  * only ADDS work.)
  *
  * Scale shape: both queries are ZERO-exchange — one `documents` scan
  * with `ReadSchema` pruned to the columns the synthesis needs,
  * partition-local `mapPartitions` decode, and only small extracted
  * scalars leave the executor. Markup/container bytes never shuffle.
  */
object CrawlOps {

  // -------------------------------------------------------------------
  // fixture synthesis (deterministic; mirrored by the DuckDB oracles)

  private[graft] def tokens(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  /** The synthesized page. Layout (single `\n` between top-level
    * elements; all lowercase so the oracle needs no case juggling):
    * doctype, head (title = first two tokens; script + style traps),
    * a nav of three links (pure boilerplate, link density 1 on the
    * link text), the document tokens in `<p>` chunks of 10, one
    * entity-bearing paragraph (named + decimal + hex forms), a
    * link-only footer div, and a comment carrying the doc id.
    */
  private[graft] def synthHtml(docId: Long, tk: Array[String]): String = {
    val paras = tk.grouped(10)
      .map(c => s"<p>${c.mkString(" ")}</p>")
      .mkString("\n")
    s"""<!doctype html>
<html><head><title>${tk(0)} ${tk(1)}</title><script>var x = "1 > 0 && 2 < 3";</script><style>p { color: red; }</style></head>
<body>
<nav><a href="/home">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>
$paras
<p>tom &amp; jerry &lt;3 &#39;quoted&#39; &#x26; done</p>
<div><a href="/x">x</a><a href="/y">y</a></div>
<!-- doc $docId -->
</body></html>"""
  }

  private def crlf = "\r\n"

  private[graft] def synthUrl(source: String, tk: Array[String]): String =
    s"https://$source.example.com/${tk(0)}/${tk(1)}"

  /** One WARC record: version line, fixed header order, blank line,
    * `Content-Length`-framed payload, two-CRLF separator.
    */
  private def warcRecord(
      docId: Long, idx: Int, warcType: String, uri: Option[String],
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(crlf)
    sb.append(s"WARC-Type: $warcType").append(crlf)
    sb.append(s"WARC-Record-ID: <urn:graft:$docId-$idx>").append(crlf)
    uri.foreach(u => sb.append(s"WARC-Target-URI: $u").append(crlf))
    sb.append(s"Content-Type: $contentType").append(crlf)
    sb.append(s"Content-Length: ${payload.length}").append(crlf)
    sb.append(crlf)
    val head = sb.toString.getBytes(UTF_8)
    val sep = (crlf + crlf).getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + sep.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    System.arraycopy(sep, 0, out, head.length + payload.length, sep.length)
    out
  }

  /** The 3-record WARC file for one document; odd doc_ids get the
    * `.warc.gz` treatment — each record its own gzip member.
    */
  private[graft] def synthWarc(
      docId: Long, source: String, text: String): Array[Byte] = {
    val tk = tokens(text)
    val url = synthUrl(source, tk)
    val html = synthHtml(docId, tk)
    val info = warcRecord(docId, 0, "warcinfo", None,
      "application/warc-fields", s"software: graft/1.0$crlf".getBytes(UTF_8))
    val reqPayload =
      (s"GET /${tk(0)}/${tk(1)} HTTP/1.1$crlf" +
        s"host: $source.example.com$crlf$crlf").getBytes(UTF_8)
    val req = warcRecord(docId, 1, "request", Some(url),
      "application/http;msgtype=request", reqPayload)
    val respPayload =
      (s"HTTP/1.1 200 OK$crlf" +
        s"content-type: text/html; charset=utf-8$crlf" +
        s"content-length: ${html.getBytes(UTF_8).length}$crlf$crlf" +
        html).getBytes(UTF_8)
    val resp = warcRecord(docId, 2, "response", Some(url),
      "application/http;msgtype=response", respPayload)
    val records = Array(info, req, resp)
    if (docId % 2 == 1) records.flatMap(Warc.gzipMember)
    else records.flatten
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // -------------------------------------------------------------------
  // queries

  final case class WarcRow(
      doc_id: Long, rec_idx: Int, warc_type: String,
      target_uri: Option[String], http_status: Option[Int],
      mime: Option[String], payload_len: Long, payload_fp: String,
      compressed: Boolean)

  /** One row per WARC record: framing fields plus the payload's byte
    * length and md5 — the inventory pass a crawl-ingestion job runs
    * before any content processing. Compressed files route through
    * the real multi-member gunzip; `payload_fp` equality with the
    * oracle pins the inflate byte-exact.
    */
  def warcRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // one digest per partition, reset per payload (provider
        // lookup out of the per-record hot loop)
        val md = java.security.MessageDigest.getInstance("MD5")
        def fp(bytes: Array[Byte]): String = {
          md.reset()
          md.digest(bytes).map(b => f"$b%02x").mkString
        }
        it.flatMap { case (docId, source, text) =>
          val bytes = synthWarc(docId, source, text)
          val compressed = Warc.isGzip(bytes)
          Warc.parseFile(bytes).zipWithIndex.map { case (r, idx) =>
            val isHttpResponse = r.warcType == "response"
            WarcRow(
              docId, idx, r.warcType,
              r.header("WARC-Target-URI"),
              if (isHttpResponse) Warc.httpStatus(r.payload) else None,
              if (isHttpResponse)
                Warc.httpHeader(r.payload, "content-type")
                  .map(_.split(";")(0).trim)
              else None,
              r.payload.length.toLong,
              fp(r.payload),
              compressed)
          }
        }
      }
      .toDF()
  }

  final case class HtmlRow(
      doc_id: Long, title: String, n_blocks: Int, n_dropped: Int,
      n_links: Int, body_chars: Int, body_fp: String)

  /** Main-text extraction over the synthesized pages: title, block
    * accounting, link count, and the extracted body (as length + md5
    * so the oracle can hash-pin it). The nav and the link-only footer
    * exceed the 0.5 link-density bar and must be dropped; the entity
    * paragraph must decode; the token paragraphs must survive
    * verbatim.
    */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val e = Html.extract(synthHtml(docId, tokens(text)))
          val body = Html.mainText(e)
          HtmlRow(
            docId, e.title, e.blocks.length, Html.droppedBlocks(e),
            e.nLinks, body.length, md5Hex(body.getBytes(UTF_8)))
        }
      }
      .toDF()
  }

  /** Sliding-window document chunking — the embedding/RAG prep pass:
    * every document splits into overlapping token windows (width
    * `width`, stride `stride`), each chunk carrying its offset and a
    * content hash so the downstream embedding index can key on it.
    * Row-local: `transform(sequence(...))` + posexplode inside the
    * scan, ZERO exchanges; chunk count per doc is ceil-bounded by its
    * own length, so output mass is corpus-linear at any scale.
    */
  def docChunks(
      s: SparkSession, dir: String,
      width: Int = 16, stride: Int = 12): DataFrame = {
    val tk = split(trim(lower(col("text"))), "\\s+")
    val n = size(tk)
    // starts: 0, stride, 2·stride, … while start < n (≥1 chunk always)
    val nChunks = ceil((n - lit(width)).cast("double") / stride)
      .cast("int") + 1
    val starts = sequence(lit(0), greatest(nChunks - 1, lit(0)))
    val chunks = transform(starts,
      i => array_join(slice(tk, i * stride + 1, lit(width)), " "))
    docs(s, dir)
      .select(col("doc_id"), n.as("n_tokens"),
        posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        size(split(col("chunk"), " ")).as("chunk_tokens"),
        md5(col("chunk").cast("binary")).as("chunk_fp"))
  }

  /** CCNet-style corpus-wide paragraph dedup: paragraphs (10-token
    * chunks, plus an injected universal cookie banner and a per-source
    * attribution banner — the boilerplate this pass exists to kill)
    * are hashed, the corpus keeps only each hash's first occurrence
    * in (doc_id, para_idx) order, and documents are reassembled from
    * their surviving paragraphs.
    *
    * Shape at scale: the first-occurrence rule is an AGGREGATION
    * (`min(doc_id·2²⁰ + para_idx)` per hash with map-side partials),
    * not a window sort — so the universal banner's millions of copies
    * partial-combine inside each executor instead of sorting in one
    * reducer; the join back to flag keepers is hash-keyed (AQE
    * skew-split handles the hot banner key), and reassembly re-keys
    * by doc_id with an order-pinned in-group sort. Two keyed
    * exchanges + one small join — no all-pairs anything.
    */
  def paragraphDedup(s: SparkSession, dir: String): DataFrame = {
    val tk = split(trim(lower(col("text"))), "\\s+")
    val nChunks = ceil(size(tk) / lit(10.0)).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(tk, i * 10 + 1, lit(10)), " "))
    val paras = concat(
      array(lit("accept cookies to continue")),
      chunks,
      array(concat(lit("brought to you by "), col("source"))))
    val exploded = docs(s, dir)
      .select(col("doc_id"), posexplode(paras).as(Seq("para_idx", "para")))
      .withColumn("h", md5(col("para").cast("binary")))
      .withColumn("ord",
        col("doc_id") * lit(1048576L) + col("para_idx"))
    val firsts = exploded.groupBy("h")
      .agg(min("ord").as("first_ord"), count(lit(1)).as("n_copies"))
    val flagged = exploded.join(firsts, "h")
      .withColumn("keep", col("ord") === col("first_ord"))
    flagged.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"),
                struct(col("para_idx"), col("para"))))),
            s => s.getField("para")),
          "\n").as("clean"))
      .select(
        col("doc_id"), col("n_paras"), col("n_kept"),
        length(col("clean")).as("clean_chars"),
        md5(col("clean").cast("binary")).as("clean_fp"))
  }
}
