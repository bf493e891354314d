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

  test("chunks: the plan has zero exchanges — embarrassingly parallel") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = Chunking.slidingChunks(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"chunking must stay narrow; got:\n$plan")
  }
}
