package graft

import graft.ops.Chunking

/** Pins for sentence-aware chunking: a full JVM greedy recompute, the
  * sentence-integrity and maximality properties, and the zero-exchange
  * plan shape (value-level correctness also rides the DuckDB oracle
  * gate via `doc_chunks_sentences`; the sliding-window variant is
  * [[graft.ops.CrawlOps.docChunks]], pinned in CrawlSpec).
  */
class ChunkingSpec extends SparkSpec {

  /** The engine's sentence convention, in plain JVM code. */
  private def jvmSentences(text: String): Seq[String] = {
    val punct = text.map {
      case 'e' => '.'; case 'o' => '!'; case c => c
    }
    "[^.!?]+[.!?]".r.findAllIn(punct).toSeq
  }

  private def jvmTk(sent: String): Int = sent.trim.split("\\s+").length

  /** Independent greedy packer: (chunk_id, n_sentences, n_tokens,
    * text) per chunk.
    */
  private def jvmPack(sents: Seq[String], budget: Int)
      : Seq[(Int, Int, Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[String]]
    var cur = 0
    sents.foreach { x =>
      val tk = jvmTk(x)
      if (out.isEmpty || cur + tk > budget) {
        out += scala.collection.mutable.ArrayBuffer(x); cur = tk
      } else { out.last += x; cur += tk }
    }
    out.zipWithIndex.map { case (c, i) =>
      (i, c.length, c.map(jvmTk).sum, c.mkString(""))
    }.toSeq
  }

  test("sentence chunks: bit-exact vs a JVM greedy recompute, every doc") {
    val budget = 20
    val expected = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        jvmPack(jvmSentences(r.getString(1)), budget).map {
          case (cid, ns, nt, tx) => (r.getLong(0), cid) -> ((ns, nt, tx))
        }
      }.toMap
    val rows = Chunking.sentenceChunks(spark, sf(), budget).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"))
      val (ns, nt, tx) = expected(key)
      assert(r.getAs[Int]("n_sentences") == ns, s"$key sentence count")
      assert(r.getAs[Int]("n_tokens") == nt, s"$key token count")
      assert(r.getAs[String]("chunk_text") == tx, s"$key text")
    }
  }

  test("sentence chunks: boundaries never split a sentence; budget only " +
    "exceeded by a single oversize sentence") {
    val budget = 20
    Chunking.sentenceChunks(spark, sf(), budget).collect().foreach { r =>
      val nt = r.getAs[Int]("n_tokens")
      if (nt > budget) {
        assert(r.getAs[Int]("n_sentences") == 1,
          "an over-budget chunk must be one unsplittable sentence")
      }
      // every chunk's text is whole sentences: it ends at a boundary
      val tx = r.getAs[String]("chunk_text")
      assert(tx.nonEmpty && ".!?".contains(tx.last))
    }
  }

  test("sentence chunks: greedy is maximal — no sentence could have " +
    "joined the previous chunk") {
    val budget = 20
    Chunking.sentenceChunks(spark, sf(), budget).collect()
      .groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
        val ordered = rs.sortBy(_.getAs[Int]("chunk_id"))
        ordered.toSeq.sliding(2).filter(_.length == 2).foreach { w =>
          val prevTokens = w(0).getAs[Int]("n_tokens")
          val firstSentNext = jvmSentences(
            w(1).getAs[String]("chunk_text")).head
          assert(prevTokens + jvmTk(firstSentNext) > budget,
            s"doc $id chunk ${w(1).getAs[Int]("chunk_id")} should have " +
              "been merged left")
        }
      }
  }

  test("sentence chunks: budget < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Chunking.sentenceChunks(spark, sf(), budget = 0)
    }
  }

  test("sentence chunks: the plan has zero exchanges") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Chunking.sentenceChunks(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"sentence packing must stay narrow; got:\n$plan")
  }
}
