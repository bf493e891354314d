package graft
import org.apache.spark.sql.SparkSession
object OvlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val guard = args.lift(1) match {
      case Some("noguard") => None
      case _ => Some(0.1)
    }
    val t0 = System.nanoTime
    val n = graft.ops.Dedup.minhashLshPairs(spark, dir, maxDocFreq = guard).count()
    println(s"""{"dir":"$dir","guard":${guard.isDefined},"pairs":$n,"secs":${(System.nanoTime - t0) / 1e9}}""")
    spark.stop()
  }
}
