package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots
import graft.ops.Robots.Rule

/** RFC 9309 semantics pins for the robots.txt parser/matcher — the
  * cases the closed-form fixture oracle can't distinguish.
  */
class RobotsSpec extends AnyFunSuite {

  private val robots =
    """# a comment line
      |User-Agent: EvilScraper
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private # trailing comment
      |Allow: /private/ok
      |Disallow:
      |Crawl-delay: 10
      |
      |User-Agent: *
      |Disallow: /everything
      |""".stripMargin

  test("group selection: named group shadows *, agent token is the " +
    "product name, shared agent lines share rules") {
    val r = Robots.rulesFor(robots, "GraftBot/1.0")
    assert(r == Vector(Rule(false, "/private"), Rule(true, "/private/ok")))
    // the second agent of the shared group gets the same rules
    assert(Robots.rulesFor(robots, "OtherBot/2") == r)
    // unknown agent falls back to the * group
    assert(Robots.rulesFor(robots, "SomeoneElse") ==
      Vector(Rule(false, "/everything")))
    // the empty Disallow (allow-everything idiom) contributes no rule
    assert(!r.exists(_.pattern.isEmpty))
  }

  test("matcher backtracks: anchored patterns whose middle literal " +
    "repeats must not false-negative") {
    // leftmost .php binding leaves pos != len; backtracking finds the
    // later binding (* = "x.php/y")
    assert(Robots.matches("/*.php$", "/x.php/y.php"))
    assert(!Robots.matches("/*.php$", "/x.php/y.html"))
    assert(Robots.matches("/*a*a$", "/zazaza"))
  }

  test("a comment-only '#' line does not crash the parser") {
    val txt = "#\nUser-agent: bot\n#\nDisallow: /x\n   # indented\n"
    assert(Robots.rulesFor(txt, "bot") == Vector(Rule(false, "/x")))
  }

  test("matcher: prefix, * wildcard, $ anchor") {
    assert(Robots.matches("/cat/p1", "/cat/p12"))
    assert(!Robots.matches("/cat/p1$", "/cat/p12"))
    assert(Robots.matches("/cat/p1$", "/cat/p1"))
    assert(Robots.matches("/*/p7", "/cat/p7"))
    assert(Robots.matches("/*/p7", "/a/b/p7x")) // prefix after wildcard
    assert(!Robots.matches("/*/p7$", "/a/b/p7x"))
    assert(Robots.matches("/a*b*c", "/aXXbYYc-tail"))
    assert(!Robots.matches("/a*b*c", "/acb"))
    assert(Robots.matches("/end*$", "/endanything"))
    assert(Robots.matches("", "/anything")) // empty pattern matches all
  }

  test("decision: longest match wins; Allow beats Disallow on ties; " +
    "no match allows") {
    val rules = Vector(
      Rule(false, "/cat"), Rule(true, "/cat/ok"),
      Rule(false, "/tie"), Rule(true, "/tie"))
    assert(Robots.decide(rules, "/cat/other") == (false, Some("/cat")))
    assert(Robots.decide(rules, "/cat/okay") == (true, Some("/cat/ok")))
    assert(Robots.decide(rules, "/tie") == (true, Some("/tie")))
    assert(Robots.decide(rules, "/elsewhere") == (true, None))
  }

  test("field names are case-insensitive; junk lines are skipped") {
    val messy = "USER-AGENT: bot\nDISALLOW: /x\nnot a field line\nALLOW: /x/y\n"
    assert(Robots.rulesFor(messy, "bot") ==
      Vector(Rule(false, "/x"), Rule(true, "/x/y")))
  }
}
