package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.data.SynthCorpus
import graft.dedup.{DedupConfig, DedupPipeline, IncrementalDedup}

/** Job-level profile of one dedup increment: counts every Spark job the
  * increment fires and its wall, to find where the ingest wall goes beyond
  * the per-stage METRIC rows. Usage: IncProbe [nBase] [nBatch] [priorDir]. */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 3000L
    val nBatch = if (args.length > 1) args(1).toLong else nBase / 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = DedupPipeline.sessionBuilder("graft-inc-probe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val state = if (args.length > 2) args(2)
      else {
        val d = java.nio.file.Files.createTempDirectory("incprobe").toString + "/state"
        DedupPipeline.run(SynthCorpus.generate(spark, nBase, partitions = cpus * 2),
          DedupConfig(shufflePartitions = cpus), Some(d))
        d
      }

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ListBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties).flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?") + s"[${js.stageInfos.map(_.numTasks).sum}t]"))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.synchronized { done += ((je.jobId, (System.nanoTime() - t0) / 1e9, site)) }
        }
      }
    })

    val batch = SynthCorpus.generate(spark, nBatch, partitions = cpus * 2, firstId = nBase)
    val t0 = System.nanoTime()
    val res = IncrementalDedup.run(batch, Seq(state),
      DedupConfig(shufflePartitions = cpus))
    val n = res.clusters.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val d = done.synchronized(done.toList)
    println(f"INCPROBE wall=$wall%.1fs jobs=${d.size} jobsec=${d.map(_._2).sum}%.1f rows=$n")
    d.groupBy(_._3.takeWhile(_ != '[')).toSeq.sortBy(-_._2.map(_._2).sum).foreach {
      case (phase, js) => println(f"  phase ${phase}%-22s jobs=${js.size}%3d sec=${js.map(_._2).sum}%7.2f")
    }
    d.sortBy(-_._2).take(10).foreach { case (id, s, site) => println(f"  job $id%3d $s%7.2fs  $site") }
    spark.stop()
  }
}
