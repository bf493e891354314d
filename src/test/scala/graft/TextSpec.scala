package graft

import graft.ops.TextOps

/** Semantics pins for the text operators added beyond the fully-
  * oracled basics: BM25 internal consistency and PII scrubbing.
  * (Value-level correctness is carried by the DuckDB oracle gate;
  * these pin properties an oracle diff wouldn't localize.)
  */
class TextSpec extends SparkSpec {

  test("bm25: df matches per-term doc counts; scores positive and bounded") {
    val rows = TextOps.bm25(spark, sf()).collect()
    assert(rows.nonEmpty)
    // df for a term == number of distinct docs carrying that term
    val byTerm = rows.groupBy(_.getAs[String]("term"))
    byTerm.foreach { case (_, rs) =>
      val docs = rs.map(_.getAs[Long]("doc_id")).distinct.length
      assert(rs.forall(_.getAs[Long]("df") == docs))
    }
    rows.foreach { r =>
      val score = r.getAs[Double]("bm25")
      assert(score > 0.0, s"non-positive score: $r")
      // BM25 with plus-one idf is bounded by idf * (k1+1)
      val n = rows.map(_.getAs[Long]("doc_id")).distinct.length
      assert(score < math.log(n + 1.0) * 2.2 + 1.0)
      assert(r.getAs[Long]("tf") >= 1 && r.getAs[Long]("dl") >= 1)
    }
    // monotonicity at equal dl: same term, same dl, higher tf ⇒ ≥ score
    rows.groupBy(r => (r.getAs[String]("term"), r.getAs[Long]("dl")))
      .values.filter(_.length > 1).foreach { rs =>
        val sorted = rs.sortBy(_.getAs[Long]("tf"))
        sorted.sliding(2).foreach { case Array(lo, hi) =>
          assert(lo.getAs[Double]("bm25") <= hi.getAs[Double]("bm25"))
        }
      }
  }

  test("pii scrub: injected email/ssn/phone counted and redacted") {
    val rows = TextOps.piiScrub(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every doc gets exactly the injected instances (the corpus
      // itself carries none)
      assert(r.getAs[Int]("n_emails") == 1)
      assert(r.getAs[Int]("n_ssns") == 1)
      assert(r.getAs[Int]("n_phones") == 1)
    }
    // recompute one row's scrub in plain Java regex — same engine as
    // Spark's regexp_replace, pins the injection + ordering plumbing
    val doc = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").head()
    val id = doc.getLong(0)
    val aug = doc.getString(1).toLowerCase +
      s" contact user$id@mail.example.com or +1-555-" +
      f"${id % 10000}%04d" + " ssn 123-45-6789."
    val expected = aug
      .replaceAll("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")
      .replaceAll("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
      .replaceAll("\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row = rows.find(_.getAs[Long]("doc_id") == id).get
    assert(row.getAs[String]("scrub_fp") == hex)
    assert(row.getAs[Int]("n_chars") == expected.length)
    assert(expected.contains("<EMAIL>") && expected.contains("<SSN>") &&
      expected.contains("<PHONE>"))
  }
}
