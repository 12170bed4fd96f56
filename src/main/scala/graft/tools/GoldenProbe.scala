package graft.tools

import graft.dedup.DedupPipeline

/** Scratch: print the dedup-projection goldens for the driver oracle. */
object GoldenProbe {
  def main(args: Array[String]): Unit = {
    val spark = DedupPipeline.sessionBuilder("graft-golden",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    println("SIZES=" + graft.ops.PipelineQueries.qDedupSizes(spark, dir)
      .orderBy("cluster_size").collect().map(r => (r.getLong(0), r.getLong(1))).mkString(";"))
    println("SURV=" + graft.ops.PipelineQueries.qDedupSurvivorStats(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).mkString(";"))
    println("SURVM=" + graft.ops.PipelineQueries.qDedupSurvivorStatsMedoid(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).mkString(";"))
    // checksum goldens for the rows-only shadows: run this probe at TWO core
    // counts (SPARK_GRAFT_CPUS=8 and 32) and commit only values that agree
    graft.ops.PipelineQueries.checksumOracled.toSeq.sortBy(_._1).foreach {
      case (name, q) =>
        val r = q(spark, dir).head()
        println(s"CHECK $name n=${r.getLong(0)} sum=${r.getLong(1)}")
    }
    spark.stop()
  }
}
