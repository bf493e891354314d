package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Skew evidence for the gram-keyed shuffle join (SCALE_r08): runs
  * [[graft.ops.Filtering.splitLeakage]] — the deliberately
  * NON-broadcast gram join — on a [[ScaleGen]] `overlap` corpus whose
  * universal-boilerplate 8-grams sit at document frequency ≈ 1.0.
  * Without mitigation every train document's row for such a gram
  * lands in ONE shuffle partition, and AQE's skew-join does not catch
  * it (verified empirically while building this probe: skew stats are
  * COMPRESSED map-output bytes, and a partition of one repeated
  * string compresses so well the row skew disappears — the df≈1.0
  * partition never crossed thresholds even at 64 KB). splitLeakage
  * therefore salts the join by construction; this probe measures the
  * salted query at 1×/10× and the salt=1 control, and pins the
  * executed plan: the gram exchange hashes the COMPOSITE
  * (shingle, __salt) key.
  *
  * Usage: runMain graft.SkewProbe <dir> [salt]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val salt = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // the gram join must stay a shuffle join (its 100 TB shape) for
      // the salting to be what's measured; at fixture scale the
      // distinct'd test side would otherwise broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime
    val df = graft.ops.Filtering.splitLeakage(spark, dir, salt = salt)
    // one action through df's OWN queryExecution, so the adaptive
    // final plan inspected below is the plan that actually ran
    val rows = df.collect()
    val secs = (System.nanoTime - t0) / 1e9
    val total = rows.length.toLong
    val leaked = rows.count(_.getAs[Boolean]("leaked")).toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val saltedExchange = plan.contains("__salt")
    sys.env.get("SKEW_PLAN_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f), plan.getBytes)
    }
    println(s"""{"dir":"$dir","salt":$salt,""" +
      s""""train_docs":$total,"leaked_docs":$leaked,""" +
      s""""salted_exchange":$saltedExchange,"secs":$secs}""")
    spark.stop()
  }
}
