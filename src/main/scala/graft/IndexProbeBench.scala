package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ops.{CacheScope, LshIndex}

/** Probe-cost measurement for the persisted LSH index
  * ([[graft.ops.LshIndex]]): build the index over the corpus carve
  * once (timed), then probe the batch carve against it (timed, min of
  * reps, noop-sink like [[Bench]]) — the evidence behind the module's
  * scale claim that PROBE cost tracks the batch, not the corpus, once
  * the build is amortized across arriving batches.
  *
  * Usage: `runMain graft.IndexProbeBench [sfDir] [reps]`; prints one
  * JSON line.
  */
object IndexProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // session warmup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // parquet reader warmup
    val isBatch = col("doc_id") % 10 === 0
    val idx = java.nio.file.Files.createTempDirectory("graft-ipb").toString

    val t0 = System.nanoTime()
    LshIndex.build(spark, sfDir, idx, maxDocFreq = Some(0.1),
      docFilter = Some(!isBatch))
    val buildSec = (System.nanoTime() - t0) / 1e9

    val probeSec = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val scope = new CacheScope
      val t = System.nanoTime()
      try LshIndex.probe(spark, idx, docs.filter(isBatch), scope = scope)
        .write.format("noop").mode("overwrite").save()
      finally scope.release()
      (System.nanoTime() - t) / 1e9
    }.min

    val nIdx = docs.filter(!isBatch).count()
    val nBatch = docs.filter(isBatch).count()
    println(s"""{"metric":"index_probe","build_sec":$buildSec,"probe_sec":$probeSec,"index_docs":$nIdx,"batch_docs":$nBatch,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
