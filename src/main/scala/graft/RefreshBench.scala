package graft

import org.apache.spark.sql.SparkSession

import graft.ops.{Filtering, Incremental}

/** Marginal-cost measurement for the incremental verdict refresh
  * ([[graft.ops.Incremental]]): persist the prior snapshot's verdicts
  * once (timed as setup), then time (a) the refresh — prior scan +
  * delta-only compute + union — against (b) the full recompute, min
  * of reps each, noop sink. The scale claim under test: refresh cost
  * is the cheap prior-verdict scan plus compute proportional to the
  * DELTA, so the refresh/full ratio falls as the corpus grows.
  *
  * Usage: `runMain graft.RefreshBench [sfDir] [reps]`; one JSON line.
  */
object RefreshBench {
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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val prior = java.nio.file.Files
      .createTempDirectory("graft-refresh").toString + "/prior"

    val t0 = System.nanoTime()
    Incremental.writePrior(spark, sfDir, prior)
    val setupSec = (System.nanoTime() - t0) / 1e9

    def timeMin(fn: () => Unit): Double =
      (1 to reps).map { _ =>
        val t = System.nanoTime(); fn(); (System.nanoTime() - t) / 1e9
      }.min

    val refreshSec = timeMin(() =>
      Incremental.refresh(spark, sfDir, prior)
        .write.mode("overwrite").format("noop").save())
    val fullSec = timeMin(() =>
      Filtering.qualityFilter(spark, sfDir)
        .write.mode("overwrite").format("noop").save())

    println(s"""{"sf":"$sfDir","setup_secs":$setupSec,""" +
      s""""refresh_secs":$refreshSec,"full_secs":$fullSec,""" +
      s""""ratio":${refreshSec / fullSec}}""")
    spark.stop()
  }
}
