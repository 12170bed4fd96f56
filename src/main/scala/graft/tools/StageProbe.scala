package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.data.SynthCorpus
import graft.dedup.{DedupConfig, DedupPipeline}

/** Dev probe: per-Spark-stage wall/max-task breakdown of the shuffle dedup. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 480000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("stage-probe"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskMetrics != null) {
        perStage.merge(t.stageId, (t.taskMetrics.executorRunTime, t.taskMetrics.executorRunTime, 1),
          (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = perStage.getOrDefault(s.stageInfo.stageId, (0L, 0L, 0))
        if (m._1 > 5000)
          println(f"STAGE id=${s.stageInfo.stageId} name='${s.stageInfo.name.take(60)}' tasks=${m._3} sum_s=${m._1/1000.0}%.1f max_s=${m._2/1000.0}%.1f")
      }
    })
    val clips = SynthCorpus.generate(spark, n, partitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count()
    val t0 = System.nanoTime()
    DedupPipeline.run(clips, DedupConfig(strategy = "shuffle", shufflePartitions = cpus)).clusters.count()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
