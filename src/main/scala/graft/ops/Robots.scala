package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy evaluation (RFC 9309) — the admission
  * decision a crawler makes before any fetch, and therefore the first
  * filter of a crawl-sourced training corpus. From-scratch parser +
  * matcher:
  *
  *  - line-oriented parse: `field: value`, `#` comments, blank-line
  *    tolerant; field names case-insensitive;
  *  - group assembly: consecutive `User-agent` lines share the rule
  *    block that follows; a crawler selects the group(s) whose agent
  *    token matches its product name (case-insensitive, the part
  *    before `/`), falling back to the `*` group — a matching named
  *    group SHADOWS `*` entirely;
  *  - path matching: byte-wise prefix with `*` wildcards and a `$`
  *    end anchor;
  *  - decision: the longest (most-octets) matching pattern wins;
  *    on equal length `Allow` beats `Disallow`; no match → allowed.
  *
  * Fixture protocol: every host serves a deterministic robots.txt
  * whose rules exercise prefix shadowing (`/cat/p1` also matches
  * p10-p15), longest-match override (`Allow: /cat/p12`), wildcards
  * (star-slash-p7 blocks p7 under any directory), anchors
  * (`/cat/p15$`), a decoy group that must be
  * ignored, and comments. The evaluated path is the CANONICAL path
  * from [[UrlOps]] — policy runs downstream of URL normalization,
  * like a real frontier. The DuckDB oracle states the verdict
  * closed-form per path bucket.
  *
  * Shape at scale: the per-host robots relation is |hosts| rows and
  * broadcasts; evaluation is row-local (robots parsed once per
  * partition-local host via a tiny memo). Zero corpus-side exchanges.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parse `robots.txt` and return the rule block for `agent`
    * (product token, e.g. "GraftBot/1.0" → "graftbot"): named-group
    * rules if any group matches the agent, else the `*` group.
    */
  def rulesFor(txt: String, agent: String): Vector[Rule] = {
    val token = agent.split("/")(0).trim.toLowerCase
    var inAgents = false
    var groupAgents = Set.empty[String]
    val named = Vector.newBuilder[Rule]
    val star = Vector.newBuilder[Rule]
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgents) groupAgents = Set.empty
              inAgents = true
              groupAgents += value.toLowerCase
            case "allow" | "disallow" =>
              inAgents = false
              if (value.nonEmpty) {
                val r = Rule(field == "allow", value)
                if (groupAgents.contains(token)) named += r
                if (groupAgents.contains("*")) star += r
              }
            // crawl-delay / sitemap / unknown fields end the agent
            // list but don't contribute rules
            case _ => inAgents = false
          }
        }
      }
    }
    val n = named.result()
    if (n.nonEmpty) n else star.result()
  }

  /** RFC 9309 path match: literal bytes, `*` matches any run
    * (including empty), trailing `$` anchors the end. An unanchored
    * pattern matches any PREFIX of the path, which is exactly
    * full-matching `pattern + "*"` — so both forms reduce to one
    * full glob match, implemented with classic star-backtracking
    * (a greedy leftmost walk has false negatives on anchored
    * patterns whose middle literal repeats — slash-star-".php$"
    * against "/x.php/y.php" must bind the SECOND ".php").
    */
  def matches(pattern: String, path: String): Boolean = {
    val (pat0, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val pat = if (anchored) pat0 else pat0 + "*"
    // two-pointer glob full-match with backtracking over '*'
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    val pn = pat.length; val sn = path.length
    while (s < sn) {
      if (p < pn && (pat.charAt(p) == path.charAt(s))) { p += 1; s += 1 }
      else if (p < pn && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (starP >= 0) {
        starS += 1; s = starS; p = starP + 1
      } else return false
    }
    while (p < pn && pat.charAt(p) == '*') p += 1
    p == pn
  }

  /** The verdict: longest matching pattern wins, Allow on ties; no
    * match → allowed with no rule.
    */
  def decide(rules: Vector[Rule], path: String): (Boolean, Option[String]) = {
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) (true, None)
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      (best.allow, Some(best.pattern))
    }
  }

  /** The deterministic per-host robots.txt. One named group for our
    * crawler (prefix shadow + longest-match override + wildcard +
    * anchor), a decoy group that must not apply, and a `*` fallback
    * that must be SHADOWED by the named group.
    */
  private[graft] def synthRobots(host: String): String =
    s"""# robots for $host
       |User-Agent: EvilScraper
       |Disallow: /
       |
       |User-Agent: graftbot
       |Disallow: /cat/p1
       |Allow: /cat/p12
       |Disallow: /*/p7
       |Allow: /cat/p15$$
       |
       |User-Agent: *
       |Disallow: /cat
       |""".stripMargin

  final case class AdmissionRow(
      doc_id: Long, host: String, norm_url: String, path: String,
      n_rules: Int, allowed: Boolean, matched_rule: Option[String])

  /** The canonical frontier with per-URL admission verdicts — the
    * ONE normalize→admit pipeline [[crawlPolicy]] and
    * [[Frontier.fetchWaves]] both consume (a second copy would let
    * the fetch plan silently diverge from the policy query).
    * Row-local: per-partition memo parses each host's robots once.
    */
  private[graft] def admissions(
      s: SparkSession, dir: String,
      agent: String = "GraftBot/1.0"): DataFrame = {
    import s.implicits._
    val norm = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .withColumn("raw_url", UrlOps.rawUrl)
      .select(Seq(col("doc_id")) ++ UrlOps.normalized(col("raw_url")): _*)
      .select(col("doc_id"), col("host"), col("norm_url"),
        parse_url(col("norm_url"), lit("PATH")).as("path"))
    norm.as[(Long, String, String, String)].mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Vector[Rule]]
      it.map { case (docId, host, normUrl, path) =>
        val rules = memo.getOrElseUpdate(host,
          rulesFor(synthRobots(host), agent))
        val (allowed, rule) = decide(rules, path)
        AdmissionRow(docId, host, normUrl, path, rules.length,
          allowed, rule)
      }
    }.toDF()
  }

  /** Per-document crawl-policy verdict for agent "GraftBot/1.0" over
    * the canonical URL path.
    */
  def crawlPolicy(s: SparkSession, dir: String): DataFrame =
    admissions(s, dir).select(
      col("doc_id"), col("host"), col("path"), col("n_rules"),
      col("allowed"), col("matched_rule"))
}
