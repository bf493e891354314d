package graft.ops

import java.io.StringReader

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap generation + ingestion (sitemaps.org protocol) — the URL
  * discovery channel that complements the crawl frontier: a site
  * publishes `<urlset><url><loc/><lastmod/><priority/></url>…`, a
  * crawler parses it back into frontier entries.
  *
  * Both directions are real: generation assembles the per-host XML
  * with correct character escaping (the canonical URLs carry `&` in
  * query strings — an unescaped ampersand is malformed XML), and
  * ingestion parses with StAX (the same JDK streaming-XML machinery
  * the xlsx reader uses; entity unescaping comes from the parser, so
  * `loc` equality with the oracle pins escape→unescape lossless).
  *
  * Shape at scale: one host-keyed exchange (map-side partial
  * collect_list), row-local XML build + parse per host, then the
  * entries explode back out — sitemap files are per-host small by
  * protocol (50k URLs max), so the per-group payload is bounded and
  * a hot host splits into sitemap-index shards in production.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: String, priority: String)

  /** Minimal XML escape for text content (the three mandatory ones;
    * URLs never carry quotes).
    */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render a urlset document. */
  def render(entries: Seq[Entry]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { e =>
      sb.append("<url><loc>").append(escape(e.loc))
        .append("</loc><lastmod>").append(e.lastmod)
        .append("</lastmod><priority>").append(e.priority)
        .append("</priority></url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  /** StAX parse of a urlset document. Element text is accumulated
    * across CHARACTERS events (entity references split text nodes);
    * unknown elements are ignored; `<url>` entries missing `loc` are
    * dropped.
    */
  def parse(xml: String): Vector[Entry] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    val out = Vector.newBuilder[Entry]
    var loc, lastmod, priority: String = null
    var field: String = null
    val text = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "url" => loc = null; lastmod = null; priority = null
              case n @ ("loc" | "lastmod" | "priority") =>
                field = n; text.setLength(0)
              case _ => field = null
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (field != null) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "loc"      => loc = text.toString; field = null
              case "lastmod"  => lastmod = text.toString; field = null
              case "priority" => priority = text.toString; field = null
              case "url" =>
                if (loc != null)
                  out += Entry(loc,
                    Option(lastmod).getOrElse(""),
                    Option(priority).getOrElse(""))
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  final case class SitemapRow(
      host: String, pos: Int, loc: String, lastmod: String,
      priority: String, n_urls: Long)

  /** Per-host sitemap round-trip: canonical URLs grouped by host,
    * rendered, re-parsed, and exploded back to one row per URL in
    * document order.
    */
  def sitemapUrls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urls = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .withColumn("raw_url", UrlOps.rawUrl)
      .select(Seq(col("doc_id")) ++ UrlOps.normalized(col("raw_url")): _*)
      .select(col("doc_id"), col("host"), col("norm_url"),
        concat(lit("2024-01-"),
          lpad(((col("doc_id") % 28) + 1).cast("string"), 2, "0"))
          .as("lastmod"),
        concat(lit("0."), (col("doc_id") % 10).cast("string"))
          .as("priority"))
    urls
      .groupBy("host")
      .agg(collect_list(struct(
        col("doc_id"), col("norm_url"), col("lastmod"), col("priority")))
        .as("entries"))
      .as[(String, Seq[(Long, String, String, String)])]
      .flatMap { case (host, entries) =>
        val xml = render(entries.sortBy(_._1)
          .map(e => Entry(e._2, e._3, e._4)))
        val parsed = parse(xml)
        parsed.zipWithIndex.map { case (e, i) =>
          SitemapRow(host, i + 1, e.loc, e.lastmod, e.priority,
            parsed.length.toLong)
        }
      }
      .toDF()
  }
}
