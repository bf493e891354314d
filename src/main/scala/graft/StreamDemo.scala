package graft

import org.apache.spark.sql.SparkSession

/** Runnable demo of the streaming surface: file-source event stream →
  * watermarked windowed counts → memory sink. Usage:
  * `runMain graft.StreamDemo [eventsDir]`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the fixture's events file into a drop directory (the
    // stream source requires a directory of event-only files)
    val drop = java.nio.file.Files.createTempDirectory("events_drop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      drop.resolve("events-000.parquet"))
    val src = graft.streaming.EventStreams.readEventStream(
      spark, drop.toString, s"$dir/events.parquet")
    println(s"[demo] isStreaming=${src.isStreaming} schema=${src.schema.simpleString}")
    val q = src.groupBy("event_type").count()
      .writeStream.format("memory").queryName("demo")
      .outputMode("complete").start()
    q.processAllAvailable()
    spark.table("demo").show(10, truncate = false)
    q.stop()
    spark.stop()
  }
}
