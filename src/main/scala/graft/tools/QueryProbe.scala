package graft.tools

import org.apache.spark.sql.SparkSession
import graft.dedup.DedupPipeline

/** Dev probe: time one named SparkEntry query repeatedly in isolation.
  * Usage: runMain graft.tools.QueryProbe <query> [sfDir] [reps] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("query-probe"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warm session
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROBE $name rep=$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
