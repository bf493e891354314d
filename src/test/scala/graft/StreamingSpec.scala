package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  test("stateful sessionization closes on gap and on watermark timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two events 10 min apart (one session), then a 60-min gap
    // (second session) — the first session closes in-batch
    input.addData(
      Event(1, 1L, ts(0), "view", 1.0),
      Event(2, 1L, ts(10), "click", 1.0),
      Event(3, 1L, ts(70), "view", 1.0))
    query.processAllAvailable()

    val afterBatch1 = spark.table("sessions").as[Session].collect()
    assert(afterBatch1.toSet == Set(
      Session(1L, ts(0).getTime * 1000, ts(10).getTime * 1000, 2)))

    // advance the watermark far past user 1's open session → timeout
    // emits it without any further user-1 events
    input.addData(Event(9, 2L, ts(500), "view", 1.0))
    query.processAllAvailable()
    input.addData(Event(10, 2L, ts(501), "view", 1.0))
    query.processAllAvailable()

    val all = spark.table("sessions").as[Session].collect()
    query.stop()
    assert(all.toSet.contains(
      Session(1L, ts(70).getTime * 1000, ts(70).getTime * 1000, 1)))
  }

  test("sessionization carries true microsecond bounds (sub-ms gaps)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // second event 123456 µs after the first — the session end must
    // carry the µs remainder (a ms-truncating conversion reads ...123000)
    val t1 = new java.sql.Timestamp(ts(0).getTime)
    t1.setNanos(123456000)

    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("us_sessions")
      .outputMode("append").start()

    input.addData(
      Event(1, 1L, ts(0), "view", 1.0),
      Event(2, 1L, t1, "view", 1.0),
      Event(3, 1L, ts(70), "view", 1.0)) // closes the first session
    query.processAllAvailable()

    val got = spark.table("us_sessions").as[Session].collect().toSet
    query.stop()
    assert(got == Set(Session(1L,
      ts(0).getTime * 1000, ts(0).getTime * 1000 + 123456, 2)))
  }

  test("streaming dedup drops repeated ids within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val query = EventStreams.dedupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()

    input.addData(
      Event(1, 1L, ts(0), "view", 1.0),
      Event(1, 1L, ts(1), "view", 1.0), // duplicate id, same batch
      Event(2, 1L, ts(2), "click", 1.0))
    query.processAllAvailable()
    input.addData(Event(1, 1L, ts(3), "view", 1.0)) // dup across batches
    query.processAllAvailable()

    val ids = spark.table("dedup").select("event_id")
      .as[Long].collect().sorted.toSeq
    query.stop()
    assert(ids == Seq(1L, 2L))
  }

  test("watermarked windowed counts aggregate incrementally") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val counts = EventStreams.windowedCounts(
      input.toDS().toDF().withColumnRenamed("ts", "ts"))
    val query = counts.writeStream.format("memory").queryName("wins")
      .outputMode("append").start()

    input.addData(
      Event(1, 1L, ts(0), "view", 1.0),
      Event(2, 2L, ts(5), "view", 1.0),
      Event(3, 3L, ts(20), "click", 1.0))
    query.processAllAvailable()
    // push watermark (2h) past the first hour to finalize its windows
    input.addData(Event(4, 4L, ts(300), "view", 1.0))
    query.processAllAvailable()
    input.addData(Event(5, 5L, ts(301), "view", 1.0))
    query.processAllAvailable()

    val rows = spark.table("wins")
      .select("event_type", "n").as[(String, Long)].collect().toSet
    query.stop()
    assert(rows.contains(("view", 2L)))
    assert(rows.contains(("click", 1L)))
  }

  test("accumulated-output readers are empty (typed), not errors, before any batch") {
    // a stream that has processed zero micro-batches has written no
    // batch_id= directories — the readers must return empty relations
    // with the full schema instead of a path-not-found failure
    val d1 = java.nio.file.Files.createTempDirectory("sdedup-empty").toString
    val p = graft.streaming.StreamingDedup.pairs(spark, d1)
    assert(p.count() == 0)
    assert(p.columns.toSeq ==
      Seq("doc_new", "doc_idx", "jaccard", "batch_id"))
    val d2 = java.nio.file.Files.createTempDirectory("sann-empty").toString
    val r = graft.streaming.StreamingAnn.results(spark, d2)
    assert(r.count() == 0)
    assert(r.columns.toSeq ==
      Seq("query_id", "vec_id", "score", "rk", "batch_id"))
  }
}
