package graft

import org.apache.spark.sql.SparkSession
import graft.dedup.DedupPipeline

/** Scratch profiler for isolating slow queries (not a test). */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master("local[4]").appName("scratch"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMING $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
