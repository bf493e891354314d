package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classifier, CrawlOps, UrlOps}

/** Spark-side pins for the crawl front end: paragraph-dedup corpus
  * invariants + plan shape, the generic URL normalizer on inputs the
  * fixture never produces, and the NB classifier's sanity contract.
  * (Value-level correctness of all five queries is carried by the
  * DuckDB oracle gate.)
  */
class CrawlSpec extends SparkSpec {

  test("paragraph_dedup: banners dedup corpus-wide, order-preserving " +
    "reassembly, and the first-occurrence rule is an agg, not a window") {
    val df = CrawlOps.paragraphDedup(spark, sf())
    val rows = df.collect()
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    // the universal cookie banner survives in exactly ONE document
    // corpus-wide, and every doc counts it among its paragraphs; the
    // per-source banner survives once per source
    val kept = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    val nParas = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_paras")).toMap
    val totalDropped = nParas.values.sum - kept.values.sum
    val nSources = docs.values.toSet.size
    // at minimum: every doc except one drops the universal banner, and
    // every doc except one per source drops its source banner
    assert(totalDropped >= (docs.size - 1) + (docs.size - nSources))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_paras"))
      assert(r.getAs[Long]("n_kept") >= 0)
    }
    // doc 0 keeps the universal banner (it is the first occurrence)
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Long]("n_kept") >= 1)
    // plan shape: the first-occurrence rule must be an aggregation
    // with map-side partials (skew-safe on the hot banner hash), NOT
    // a window sort — and reassembly adds exactly one more keyed
    // exchange plus the join's
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window sort would serialize the hot key")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
  }

  test("url normalizer (generic path): non-default ports survive, psl " +
    "cuts registrable domains, queries/fragments handled") {
    import spark.implicits._
    val cases = Seq(
      // raw -> expected (norm_url, host, reg_domain)
      ("http://example.com:8080/a/b?z=1&a=2#f",
        "http://example.com:8080/a/b?a=2&z=1", "example.com", "example.com"),
      ("HTTPS://WWW.Sub.Site.CO.UK:443//x///y/index.html",
        "https://sub.site.co.uk/x/y", "sub.site.co.uk", "site.co.uk"),
      ("http://user.github.io/repo/?utm_source=a&utm_medium=b",
        "http://user.github.io/repo", "user.github.io", "user.github.io"),
      ("https://a.b.example.org/",
        "https://a.b.example.org/", "a.b.example.org", "example.org"),
      ("http://host.net:80/p?only=1",
        "http://host.net/p?only=1", "host.net", "host.net"))
    val df = cases.toDF("raw_url", "e_norm", "e_host", "e_reg")
      .select(Seq(col("raw_url"), col("e_norm"), col("e_host"),
        col("e_reg")) ++ UrlOps.normalized(col("raw_url")): _*)
    df.collect().foreach { r =>
      assert(r.getAs[String]("norm_url") == r.getAs[String]("e_norm"),
        s"norm mismatch for ${r.getAs[String]("raw_url")}: " +
          s"got ${r.getAs[String]("norm_url")}")
      assert(r.getAs[String]("host") == r.getAs[String]("e_host"))
      assert(r.getAs[String]("reg_domain") == r.getAs[String]("e_reg"))
    }
  }

  test("url_normalize: canonical-key collisions are live and consistent") {
    val rows = UrlOps.urlNormalize(spark, sf()).collect()
    assert(rows.count(_.getAs[Boolean]("is_dup")) > 0,
      "fixture must produce real canonical collisions")
    // group consistency: every norm_url group shares first_doc =
    // its min doc_id, and n_same = group size
    rows.groupBy(_.getAs[String]("norm_url")).foreach { case (_, g) =>
      val ids = g.map(_.getAs[Long]("doc_id"))
      assert(g.forall(_.getAs[Long]("first_doc") == ids.min))
      assert(g.forall(_.getAs[Long]("n_same") == g.length))
      assert(g.count(!_.getAs[Boolean]("is_dup")) == 1)
    }
  }

  test("warc_records rides zero exchanges; html/warc fixtures prune " +
    "the documents scan to the synthesis columns") {
    val wr = CrawlOps.warcRecords(spark, sf())
    val plan = wr.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "warc parse must be partition-local")
    assert(plan.contains("doc_id") && !plan.contains("n_chars"),
      "ReadSchema should carry only the synthesis columns")
  }

  test("doc_chunks: full coverage with overlap — every token falls in " +
    "some chunk, strides are regular, widths are capped") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id",
        "size(split(trim(lower(text)), '\\\\s+')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = CrawlOps.docChunks(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("chunk_tokens") <= 16)
      assert(r.getAs[Int]("start_tok") == r.getAs[Int]("chunk_idx") * 12)
    }
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val n = docs(id)
      val maxEnd = g.map(r =>
        r.getAs[Int]("start_tok") + r.getAs[Int]("chunk_tokens")).max
      assert(maxEnd == n, s"doc $id: chunks end at $maxEnd of $n tokens")
      val idxs = g.map(_.getAs[Int]("chunk_idx")).sorted.toList
      assert(idxs == (0 until g.length).toList)
    }
  }

  test("fetch_waves: politeness invariants — at most perWave URLs per " +
    "(host, wave), contiguous waves, disallowed rows excluded") {
    val rows = graft.ops.Frontier.fetchWaves(spark, sf()).collect()
    rows.groupBy(r => (r.getAs[String]("host"), r.getAs[Int]("wave")))
      .foreach { case ((_, wave), g) =>
        if (wave >= 0) assert(g.length <= 4, s"wave $wave overfull")
      }
    rows.filter(!_.getAs[Boolean]("allowed"))
      .foreach(r => assert(r.getAs[Int]("wave") == -1))
    rows.groupBy(_.getAs[String]("host")).foreach { case (_, g) =>
      val waves = g.filter(_.getAs[Boolean]("allowed"))
        .map(_.getAs[Int]("wave")).distinct.sorted.toList
      assert(waves == (0 until waves.length).toList,
        s"waves not contiguous: $waves")
      // every wave except possibly the last is full
      val byWave = g.filter(_.getAs[Boolean]("allowed"))
        .groupBy(_.getAs[Int]("wave"))
      waves.dropRight(1).foreach(w => assert(byWave(w).length == 4))
    }
  }

  test("nb classifier: learns its own training labels far above the " +
    "majority-class rate, and scores are finite log-likelihoods") {
    val rows = Classifier.nbQuality(spark, sf()).collect()
    assert(rows.length == 500)
    val train = rows.filter(_.getAs[String]("split") == "train")
    val agree = train.count(_.getAs[Boolean]("agree")).toDouble / train.length
    val majority = math.max(
      train.count(_.getAs[Boolean]("label")),
      train.count(!_.getAs[Boolean]("label"))).toDouble / train.length
    // the real bar: better than constantly predicting the majority
    // class (sf0.01: agree 0.870 vs majority 0.852)
    assert(agree >= majority,
      s"train agreement $agree does not beat the majority rate $majority")
    assert(agree >= 0.75, s"train agreement $agree is too low")
    rows.foreach { r =>
      val sk = r.getAs[Double]("score_keep")
      val sd = r.getAs[Double]("score_drop")
      assert(!sk.isNaN && !sk.isInfinite && sk < 0)
      assert(!sd.isNaN && !sd.isInfinite && sd < 0)
      assert(r.getAs[Boolean]("pred_keep") == (sk >= sd))
    }
    // both classes must actually occur in training (otherwise the
    // model degenerates and this spec should fail loudly)
    assert(train.exists(_.getAs[Boolean]("label")) &&
      train.exists(!_.getAs[Boolean]("label")))
  }
}
