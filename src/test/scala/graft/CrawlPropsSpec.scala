package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Html, Robots}

/** Property-based checks for the crawl front end's pure functions:
  * the robots glob matcher against an independent regex translation,
  * and entity-decode/ws-collapse structural invariants. Fixed-seed
  * plain ScalaCheck, same pattern as PropsSpec.
  */
class CrawlPropsSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1042L + i)))

  // path-ish strings over a tiny alphabet so wildcards actually hit
  private val pathChar = Gen.oneOf('a', 'b', '/', '.', 'p')
  private val path: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, pathChar))
  private val patChar = Gen.oneOf('a', 'b', '/', '.', 'p', '*')
  private val pattern: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    body <- Gen.stringOfN(n, patChar)
    anchored <- Gen.oneOf(true, false)
  } yield if (anchored) body + "$" else body

  /** Independent oracle: translate the RFC 9309 glob to a java regex
    * (quote literals, `*` → `.*`, `$` anchor vs prefix-match).
    */
  private def regexMatch(pat: String, p: String): Boolean = {
    val (body, anchored) =
      if (pat.endsWith("$")) (pat.dropRight(1), true) else (pat, false)
    val rx = body.split("\\*", -1)
      .map(java.util.regex.Pattern.quote)
      .mkString(".*")
    val full = if (anchored) rx else rx + ".*"
    p.matches(full)
  }

  test("robots matcher agrees with a regex translation on random " +
    "patterns and paths (backtracking equivalence)") {
    samples(Gen.zip(pattern, path), 600).foreach { case (pat, p) =>
      assert(Robots.matches(pat, p) == regexMatch(pat, p),
        s"pattern '$pat' vs path '$p'")
    }
  }

  test("decide: verdict is invariant under rule order permutation") {
    val rules = Vector(
      Robots.Rule(false, "/a"), Robots.Rule(true, "/a/b"),
      Robots.Rule(false, "/*b$"), Robots.Rule(true, "/a*"),
      Robots.Rule(false, "p"))
    samples(path, 200).foreach { p =>
      val base = Robots.decide(rules, p)
      rules.permutations.take(24).foreach { perm =>
        assert(Robots.decide(perm.toVector, p)._1 == base._1,
          s"order-dependent verdict for '$p'")
      }
    }
  }

  test("decodeEntities: idempotent on its own output for inputs " +
    "without raw ampersand-producing entities") {
    // decoding "&amp;lt;" yields "&lt;" which decodes again — that is
    // correct HTML behavior; idempotence holds whenever the FIRST
    // decode introduces no new '&'
    val safe = Gen.listOf(Gen.oneOf(
      "x", " ", "&lt;", "&gt;", "&#65;", "&#x42;", "&bogus;", "a&b"))
      .map(_.mkString)
    samples(safe, 300).foreach { s =>
      val once = Html.decodeEntities(s)
      if (!once.contains("&") || once == s)
        assert(Html.decodeEntities(once) == once)
    }
  }

  test("collapseWs: output never has runs of spaces and is trimmed") {
    val wsText = Gen.listOf(Gen.oneOf("a", "b", " ", "\n", "\t", "  "))
      .map(_.mkString)
    samples(wsText, 300).foreach { s =>
      val out = Html.collapseWs(s)
      assert(!out.contains("  ") && out == out.trim)
      assert(out.split(" ").filter(_.nonEmpty).mkString(" ") == out)
    }
  }
}
