package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html

/** Edge-case pins for the from-scratch HTML extractor — the inputs a
  * real crawl throws at a parser that the synthesized fixture (clean
  * by construction) never exercises.
  */
class HtmlSpec extends AnyFunSuite {

  test("entity decoding: named, decimal, hex, and non-entities") {
    assert(Html.decodeEntities("a &amp; b") == "a & b")
    assert(Html.decodeEntities("&lt;tag&gt;") == "<tag>")
    assert(Html.decodeEntities("&#65;&#x42;") == "AB")
    assert(Html.decodeEntities("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    // literal ampersands survive: unknown name, no semicolon, junk
    assert(Html.decodeEntities("AT&T") == "AT&T")
    assert(Html.decodeEntities("a & b") == "a & b")
    assert(Html.decodeEntities("&bogus;") == "&bogus;")
    assert(Html.decodeEntities("&#x;") == "&#x;")
    assert(Html.decodeEntities("fish &chips; tonight") == "fish &chips; tonight")
    // astral code points emit surrogate PAIRS, not truncated chars
    assert(Html.decodeEntities("&#128512;") == "😀")
    assert(Html.decodeEntities("&#x1F600;") == "😀")
    // out-of-range / overlong numerics are literal text, never a crash
    assert(Html.decodeEntities("&#xFFFFFFFF;") == "&#xFFFFFFFF;")
    assert(Html.decodeEntities("&#9999999;") == "&#9999999;")
    assert(Html.decodeEntities("&#xD800;") == "&#xD800;") // lone surrogate
  }

  test("script/style content is skipped even when it contains tags") {
    val e = Html.extract(
      "<p>before</p><script>if (a<b) document.write('<p>fake</p>');" +
        "</script><style>p>span { color: red }</style><p>after</p>")
    assert(e.blocks.map(_.text) == Vector("before", "after"))
  }

  test("a > inside a quoted attribute does not close the tag") {
    val e = Html.extract("""<p><a href="/x?a>b" title='1>0'>link</a> t</p>""")
    assert(e.blocks.map(_.text) == Vector("link t"))
    assert(e.nLinks == 1)
    assert(e.blocks.head.linkChars == 4)
  }

  test("comments vanish; conditional junk inside comments vanishes") {
    val e = Html.extract("<p>a<!-- <p>hidden</p> \n multi\nline -->b</p>")
    assert(e.blocks.map(_.text) == Vector("ab"))
  }

  test("link density: pure-link blocks drop, mixed blocks survive") {
    val e = Html.extract(
      "<nav><a href='/'>one</a><a href='/'>two</a></nav>" +
        "<p>twelve chars of prose <a href='/'>x</a></p>")
    assert(Html.droppedBlocks(e) == 1)
    assert(Html.mainText(e) == "twelve chars of prose x")
  }

  test("title is captured out-of-band and never enters body blocks") {
    val e = Html.extract(
      "<html><head><title> My  Title </title></head><body><p>x</p>")
    assert(e.title == "My Title")
    assert(e.blocks.map(_.text) == Vector("x"))
  }

  test("unclosed blocks flush at EOF; br breaks words; whitespace collapses") {
    val e = Html.extract("<p>one\n\n  two<br>three")
    assert(e.blocks.map(_.text) == Vector("one two three"))
  }

  test("nested inline tags contribute text to the enclosing block") {
    val e = Html.extract("<p><b>bold <i>both</i></b> plain</p>")
    assert(e.blocks.map(_.text) == Vector("bold both plain"))
  }

  test("a literal < before a non-letter is text, not a tag open") {
    // the HTML5 tokenizer rule: '<' followed by digit/space/symbol is
    // character data — a naive parser swallows everything to the next >
    val e = Html.extract("<p>i <3 spark</p><p>1 < 2 > 0</p><p>a </ b</p>")
    assert(e.blocks.map(_.text) ==
      Vector("i <3 spark", "1 < 2 > 0", "a </ b"))
  }

  test("extractor is total on truncated markup: every prefix of a " +
    "real page parses without throwing") {
    val tokens = (1 to 23).map(i => s"tok$i").toArray
    val html = graft.ops.CrawlOps.synthHtml(3L, tokens)
    (0 to html.length).foreach { len =>
      val e = Html.extract(html.take(len)) // must terminate, not throw
      assert(e.blocks.forall(_.text.nonEmpty))
    }
    // and on junk that never becomes well-formed
    Html.extract("<")
    Html.extract("<!")
    Html.extract("<a href='unterminated")
    Html.extract("&#")
    Html.extract("<script>never closed")
  }

  test("the synthesized fixture page extracts to its derivation") {
    // mirror of the oracle's closed form, on one concrete document
    val tokens = (1 to 23).map(i => s"tok$i").toArray
    val html = graft.ops.CrawlOps.synthHtml(7L, tokens)
    val e = Html.extract(html)
    assert(e.title == "tok1 tok2")
    assert(e.blocks.length == 3 + 3) // nav + 3 chunks + entity + footer
    assert(Html.droppedBlocks(e) == 2)
    assert(e.nLinks == 5)
    val body = Html.mainText(e)
    val expected = tokens.grouped(10).map(_.mkString(" ")).mkString("\n") +
      "\ntom & jerry <3 'quoted' & done"
    assert(body == expected)
  }
}
