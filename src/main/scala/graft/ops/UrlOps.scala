package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction + corpus-wide
  * URL dedup — the crawl-frontier hygiene pass: re-crawls and mirror
  * variants of one page must collapse to a single canonical key
  * before content ever downloads.
  *
  * Engine path: the messy raw URL is parsed with Spark's `parse_url`
  * (codegen'd built-in) and normalized with pure column arithmetic —
  * scheme/host lowercasing, `www.` stripping, default-port removal,
  * duplicate-slash collapse, `index.html` and trailing-slash
  * stripping, tracking-parameter (`utm_*`) removal, query-parameter
  * sorting, fragment dropping, and a public-suffix-list (embedded
  * mini-PSL) registered-domain cut. Zero UDFs — every step is a
  * catalyst expression inside whole-stage codegen.
  *
  * Fixture protocol: the raw URL is synthesized row-locally from
  * (doc_id, source) with deliberate mess — case noise, default
  * ports, `//` runs, `index.html` suffixes, tracking params,
  * fragments — while the DuckDB oracle recomputes the expected
  * CANONICAL form closed-form from the same derivation. The engine
  * must reach the same bytes through the generic parser, so the
  * normalizer (not the fixture formula) is what's under test. Path
  * tokens are drawn from a 16-value space so distinct documents
  * genuinely collide after normalization — the dedup flag is live.
  *
  * Shape at scale: normalization is narrow (zero exchanges); dedup is
  * one canonical-key aggregation with map-side partials plus one
  * keyed join back (AQE-splittable if one URL dominates) — never a
  * self-join.
  */
object UrlOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deliberately-messy raw URL. The variation nibbles come from
    * md5(doc_id) rather than doc_id residues: residues of one id are
    * perfectly correlated (two ids agree on ALL of them only when
    * they agree mod the lcm, which exceeds any fixture), so md5
    * decorrelates the attributes and canonical collisions actually
    * occur — the dedup flag stays live.
    */
  private[graft] def rawUrl: Column = {
    val h = md5(concat(col("doc_id").cast("string"), lit("#url")))
    def nib(i: Int) = conv(substring(h, i, 1), 16, 10).cast("int")
    val scheme = when(nib(1) % 2 === 0, "http").otherwise("HTTPS")
    val host = when(nib(2) % 4 === 0,
      concat(lit("WWW."), col("source"), lit(".Example.COM")))
      .otherwise(concat(col("source"), lit(".example."),
        when(nib(2) % 4 === 1, "co.uk").otherwise("com")))
    val port = when(nib(3) % 2 === 0,
      when(nib(1) % 2 === 0, ":80").otherwise(":443")).otherwise("")
    val path = concat(lit("/cat//p"), nib(4).cast("string"),
      when(nib(5) % 2 === 1, "/index.html").otherwise("/"))
    val query = when(nib(1) % 2 === 0,
      concat(lit("?utm_source=feed&b="), (nib(6) % 7).cast("string"),
        lit("&a=1")))
      .otherwise(concat(lit("?a=1&b="), (nib(6) % 7).cast("string")))
    val frag = concat(lit("#s"), (nib(6) % 3).cast("string"))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** Suffixes treated as public (registrable one label deeper). */
  private val MultiLabelSuffixes = Seq("co.uk", "ac.uk", "github.io")

  /** Generic normalizer over a raw-URL column. Returns the canonical
    * URL plus its parsed host and registered domain.
    */
  private[graft] def normalized(raw: Column): Seq[Column] = {
    val proto = lower(parse_url(raw, lit("PROTOCOL")))
    val host = regexp_replace(
      lower(parse_url(raw, lit("HOST"))), "^www\\.", "")
    val portStr =
      regexp_extract(parse_url(raw, lit("AUTHORITY")), ":([0-9]+)$", 1)
    val keepPort = portStr =!= "" &&
      !(proto === "http" && portStr === "80") &&
      !(proto === "https" && portStr === "443")
    val port = when(keepPort, concat(lit(":"), portStr)).otherwise("")
    val path0 = regexp_replace(parse_url(raw, lit("PATH")), "/{2,}", "/")
    val path1 = regexp_replace(path0, "/index\\.html$", "/")
    val path = when(path1 === "" , "/")
      .otherwise(regexp_replace(path1, "(.)/$", "$1"))
    val params = filter(
      split(coalesce(parse_url(raw, lit("QUERY")), lit("")), "&"),
      p => !(p.startsWith("utm_") || p === ""))
    val qs = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise("")
    val labels = split(host, "\\.")
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val regDomain = when(
      last2.isin(MultiLabelSuffixes: _*) && size(labels) >= 3,
      concat_ws(".", element_at(labels, -3), last2)).otherwise(last2)
    Seq(
      concat(proto, lit("://"), host, port, path, qs).as("norm_url"),
      host.as("host"),
      regDomain.as("reg_domain"))
  }

  /** Per-document canonicalization + dedup verdict: the canonical
    * URL, host, registered domain, the id of the canonical key's
    * first holder, the duplicate flag, and the collision count.
    */
  def urlNormalize(s: SparkSession, dir: String): DataFrame = {
    val withNorm = docs(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("raw_url", rawUrl)
      .select(
        Seq(col("doc_id"), col("raw_url")) ++ normalized(col("raw_url")): _*)
    val firsts = withNorm.groupBy("norm_url")
      .agg(min("doc_id").as("first_doc"), count(lit(1)).as("n_same"))
    withNorm.join(firsts, "norm_url")
      .select(
        col("doc_id"), col("raw_url"), col("norm_url"), col("host"),
        col("reg_domain"), col("first_doc"),
        (col("doc_id") =!= col("first_doc")).as("is_dup"),
        col("n_same"))
  }
}
