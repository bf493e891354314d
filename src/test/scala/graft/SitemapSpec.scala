package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sitemap
import graft.ops.Sitemap.Entry

/** XML-level pins for the sitemap renderer/parser beyond the fixture
  * round-trip: escaping, CDATA, junk elements, malformed entries.
  */
class SitemapSpec extends AnyFunSuite {

  test("render escapes and parse unescapes: ampersands in query " +
    "strings survive the round trip") {
    val e = Entry("https://h.com/p?a=1&b=2&c=<3>", "2024-01-01", "0.5")
    val xml = Sitemap.render(Seq(e))
    assert(xml.contains("a=1&amp;b=2&amp;c=&lt;3&gt;"))
    assert(Sitemap.parse(xml) == Vector(e))
  }

  test("parser: CDATA loc, unknown elements ignored, url without loc " +
    "dropped, surrounding whitespace in other nodes tolerated") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc><![CDATA[https://h.com/x?a=1&b=2]]></loc>
        |  <changefreq>daily</changefreq>
        |  <lastmod>2024-02-03</lastmod></url>
        |<url><lastmod>2024-01-01</lastmod></url>
        |<url><loc>https://h.com/y</loc><priority>1.0</priority></url>
        |</urlset>""".stripMargin
    val parsed = Sitemap.parse(xml)
    assert(parsed.length == 2)
    assert(parsed(0) == Entry("https://h.com/x?a=1&b=2", "2024-02-03", ""))
    assert(parsed(1) == Entry("https://h.com/y", "", "1.0"))
  }

  test("round trip is identity for arbitrary entry lists") {
    val entries = (0 until 40).map(i =>
      Entry(s"https://h$i.example.com/p$i?q=$i&r=${i * 7}",
        f"2024-01-${i % 28 + 1}%02d", s"0.${i % 10}"))
    assert(Sitemap.parse(Sitemap.render(entries)) == entries.toVector)
  }
}
