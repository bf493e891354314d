package graft

import graft.ops.Chunking
import org.apache.spark.sql.functions._

/** Pins for sliding context-window chunking: a full JVM recompute,
  * the stride==len partition round-trip, the overlap identity, and the
  * zero-exchange plan shape (value-level correctness also rides the
  * DuckDB oracle gate via `doc_chunks`).
  */
class ChunkingSpec extends SparkSpec {

  private def docTokens(): Map[Long, Array[String]] =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
      .filter(_._2.nonEmpty)
      .map { case (id, t) => id -> t.split("\\s+") }.toMap

  private def jvmChunks(toks: Array[String], len: Int, stride: Int)
      : Seq[(Int, Int, Int, String)] = {
    val n = toks.length
    val nc = 1 + (math.max(n - len, 0) + stride - 1) / stride
    (0 until nc).map { k =>
      val start = k * stride
      val c = toks.slice(start, math.min(start + len, n))
      (k, start, c.length, c.mkString(" "))
    }
  }

  test("chunks: bit-exact vs a JVM recompute, every doc") {
    val expected = docTokens().flatMap { case (id, toks) =>
      jvmChunks(toks, 32, 24).map { case (k, st, ct, tx) =>
        (id, k, st) -> ((ct, tx))
      }
    }
    val rows = Chunking.slidingChunks(spark, sf()).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[Int]("chunk_start"))
      val (ct, tx) = expected(key)
      assert(r.getAs[Int]("chunk_tokens") == ct, s"$key token count")
      assert(r.getAs[String]("chunk_text") == tx, s"$key text")
    }
  }

  test("chunks: stride == len partitions the token stream exactly") {
    val rows = Chunking.slidingChunks(spark, sf(), len = 32, stride = 32)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docTokens().foreach { case (id, toks) =>
      val rebuilt = rows(id).sortBy(_.getAs[Int]("chunk_id"))
        .flatMap(_.getAs[String]("chunk_text").split(" "))
      assert(rebuilt.toSeq == toks.toSeq,
        s"doc $id: concatenated chunks must reproduce the token stream")
      // no token is double-counted
      assert(rows(id).map(_.getAs[Int]("chunk_tokens")).sum == toks.length)
    }
  }

  test("chunks: consecutive chunks overlap by len - stride tokens") {
    val (len, stride) = (32, 24)
    Chunking.slidingChunks(spark, sf(), len, stride).collect()
      .groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
        val ordered = rs.sortBy(_.getAs[Int]("chunk_id"))
          .map(_.getAs[String]("chunk_text").split(" ").toSeq)
        ordered.toSeq.sliding(2).filter(_.length == 2).foreach { w =>
          val (a, b) = (w(0), w(1))
          if (a.length == len) {
            // a full chunk hands its last len-stride tokens to the next
            assert(a.takeRight(len - stride) == b.take(len - stride),
              s"doc $id: overlap window broken")
          }
        }
        // every chunk covers fresh ground: starts strictly increase and
        // the tail chunk is never empty
        assert(ordered.forall(_.nonEmpty))
      }
  }

  test("chunks: stride > len is rejected (it would skip tokens)") {
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(spark, sf(), len = 16, stride = 17)
    }
  }

  // --- sentence-aware packing -----------------------------------------

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

  test("sentence chunks: the plan has zero exchanges") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Chunking.sentenceChunks(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"sentence packing must stay narrow; got:\n$plan")
  }

  test("chunks: the plan has zero exchanges — embarrassingly parallel") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Chunking.slidingChunks(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"chunking must stay narrow; got:\n$plan")
  }
}
