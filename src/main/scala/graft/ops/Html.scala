package graft.ops

import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML text extraction — the boilerplate-removal pass
  * that turns raw crawl markup into training text. No external parser:
  * a single-pass tokenizer walks the byte stream once, handling
  *
  *  - comments (`<!-- -->`) and declarations (`<!doctype …>`),
  *  - raw-text elements (`script`/`style` content is skipped verbatim
  *    up to the matching close tag — `<` inside code never opens tags),
  *  - attributes with quoted values (a `>` inside `href="a>b"` does
  *    not terminate the tag),
  *  - character entities (named, decimal `&#39;`, hex `&#x26;`);
  *    non-entity `&` passes through literally,
  *  - block segmentation on the usual block-level elements, and
  *  - per-block link-character accounting, so link-dense boilerplate
  *    (navigation, footers) can be dropped by the classic
  *    link-density rule (jusText/boilerpipe-style).
  *
  * Everything is row-local: at 100 TB the extractor runs inside the
  * scan's partition (mapPartitions), markup bytes never shuffle, and
  * only the extracted text/stats leave the executor.
  */
object Html {

  /** One block-level run of text. `linkChars` counts characters that
    * appeared inside an `<a>` element (after entity decode, before
    * whitespace collapse — collapse rescales both counts together
    * only if whitespace is uniform, so density uses raw counts).
    */
  final case class Block(tag: String, text: String, linkChars: Int)

  final case class Extracted(
      title: String,
      blocks: Vector[Block],
      nLinks: Int)

  private val BlockTags: Set[String] = Set(
    "p", "div", "nav", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "article", "section", "header", "footer", "table", "tr",
    "blockquote", "pre", "br", "body")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode character entities in `s`; anything that doesn't parse as
    * an entity (no terminating `;` within 12 chars, unknown name,
    * malformed number) is left as literal text.
    */
  def decodeEntities(s: String): String = {
    val n = s.length
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          // numeric references emit full code points (surrogate pairs
          // above the BMP); out-of-range / non-code-point values fall
          // back to literal text like any other malformed entity
          def codePoint(cp: Int): Option[String] =
            if (cp >= 0 && cp <= 0x10ffff &&
              !(cp >= 0xd800 && cp <= 0xdfff)) // lone surrogates: no
              Some(new String(Character.toChars(cp)))
            else None
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              val hex = body.drop(2)
              if (hex.nonEmpty && hex.length <= 6 && hex.forall(ch =>
                  Character.digit(ch, 16) >= 0))
                codePoint(Integer.parseInt(hex, 16))
              else None
            } else if (body.startsWith("#")) {
              val dec = body.drop(1)
              if (dec.nonEmpty && dec.forall(_.isDigit) && dec.length <= 7)
                codePoint(Integer.parseInt(dec))
              else None
            } else Entities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append('&'); i += 1
          }
        }
      }
    }
    sb.toString
  }

  /** Collapse runs of ASCII whitespace to single spaces and trim. */
  def collapseWs(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** Parse `html` into a title and a sequence of text blocks with
    * link-character counts. Unknown / inline tags contribute their
    * text to the enclosing block; unclosed structures are tolerated
    * (end of input flushes).
    */
  def extract(html: String): Extracted = {
    val n = html.length
    val lowerHtml = html.toLowerCase
    val blocks = ArrayBuffer.empty[Block]
    val text = new StringBuilder
    var linkChars = 0
    var linkDepth = 0
    var nLinks = 0
    var inTitle = false
    val title = new StringBuilder
    var curTag = "body"

    def flush(nextTag: String): Unit = {
      val collapsed = collapseWs(text.toString)
      if (collapsed.nonEmpty) blocks += Block(curTag, collapsed, linkChars)
      text.setLength(0)
      linkChars = 0
      curTag = nextTag
    }

    /** Lower-case tag name starting at `i` (just past `<` or `</`). */
    def tagNameAt(i: Int): String = {
      var j = i
      while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
      html.substring(i, j).toLowerCase
    }

    /** Index just past the closing `>` of a tag starting at `lt`
      * (which points at `<`), honoring quoted attribute values.
      */
    def tagEnd(lt: Int): Int = {
      var j = lt + 1
      var quote: Char = 0
      while (j < n) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n
    }

    /** A `<` opens markup only when what follows could BE markup: a
      * letter (tag), `/`+letter (close tag), `!` (comment/doctype) —
      * the HTML5 tokenizer rule. A literal `<3` or `a < b` is text.
      */
    def opensMarkup(lt: Int): Boolean =
      lt + 1 < n && {
        val c1 = html.charAt(lt + 1)
        c1.isLetter || c1 == '!' ||
          (c1 == '/' && lt + 2 < n && html.charAt(lt + 2).isLetter)
      }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<' || !opensMarkup(i)) {
        // text run up to the next markup-opening tag
        var j = if (c == '<') i + 1 else i
        while (j < n && !(html.charAt(j) == '<' && opensMarkup(j))) j += 1
        val decoded = decodeEntities(html.substring(i, j))
        if (inTitle) title.append(decoded)
        else {
          text.append(decoded)
          if (linkDepth > 0) linkChars += decoded.length
        }
        i = j
      } else if (html.startsWith("<!--", i)) {
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n && html.charAt(i + 1) == '!') {
        i = tagEnd(i) // doctype / declaration
      } else if (i + 1 < n && html.charAt(i + 1) == '/') {
        val name = tagNameAt(i + 2)
        if (name == "title") inTitle = false
        else if (name == "a" && linkDepth > 0) linkDepth -= 1
        else if (BlockTags(name)) flush("body")
        i = tagEnd(i)
      } else {
        val name = tagNameAt(i + 1)
        val end = tagEnd(i)
        if (name == "script" || name == "style") {
          // raw text element: skip to the matching close tag
          val close = lowerHtml.indexOf(s"</$name", end)
          i = if (close < 0) n else tagEnd(close)
        } else {
          if (name == "title") inTitle = true
          else if (name == "a") { linkDepth += 1; nLinks += 1 }
          else if (name == "br") text.append(' ')
          else if (BlockTags(name)) flush(name)
          i = end
        }
      }
    }
    flush("body")
    Extracted(collapseWs(title.toString), blocks.toVector, nLinks)
  }

  /** The extraction verdict: blocks whose link density exceeds
    * `maxLinkDensity` are boilerplate and dropped; survivors join
    * with single newlines.
    */
  def mainText(e: Extracted, maxLinkDensity: Double = 0.5): String =
    e.blocks
      .filter(b => b.linkChars.toDouble / math.max(1, b.text.length)
        <= maxLinkDensity)
      .map(_.text)
      .mkString("\n")

  /** Count of dropped (boilerplate) blocks under the same rule. */
  def droppedBlocks(e: Extracted, maxLinkDensity: Double = 0.5): Int =
    e.blocks.count(b => b.linkChars.toDouble / math.max(1, b.text.length)
      > maxLinkDensity)
}
