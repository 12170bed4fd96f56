package graft.tools

import org.apache.spark.sql.SparkSession
import graft.dedup.DedupPipeline

/** Dev tool: dump ONE named SparkEntry query's result to parquet (coalesced
  * to a single file) for ad-hoc DuckDB oracle comparison during
  * optimization work. Usage: runMain graft.tools.OneDump <query> <sfDir> <out>
  */
object OneDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("one-dump"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
