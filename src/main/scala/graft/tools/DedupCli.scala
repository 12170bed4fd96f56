package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.SynthCorpus
import graft.dedup._

/** End-to-end pipeline driver.
  *
  * Usage: DedupCli <synth:N | parquetPath> <outDir|-> [threshold] [minhash:0|1]
  *        [audio:0|1] [contain:0|1]
  * Reads a clip table (or synthesizes one), runs the three-stage dedup, and
  * prints cluster stats. Parallelism via SPARK_GRAFT_CPUS (default 4).
  */
object DedupCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DedupCli <synth:N|parquet> <outDir|-> [threshold] [minhash:0|1] [audio:0|1] [contain:0|1]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = DedupPipeline.sessionBuilder("graft-dedup", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val clips =
      if (args(0).startsWith("synth:"))
        SynthCorpus.generate(spark, args(0).stripPrefix("synth:").toLong, partitions = cpus * 2)
      else graft.data.TableIO.readClips(spark, args(0)) // Iceberg ident or parquet path

    val cfg = DedupConfig(
      threshold = if (args.length > 2) args(2).toFloat else 0.8f,
      useMinhashChannel = args.length > 3 && args(3) == "minhash:1",
      useAudioChannel = args.length > 4 && args(4) == "audio:1",
      useAudioContainment = args.length > 5 && args(5) == "contain:1",
      shufflePartitions = cpus)

    val t0 = System.nanoTime()
    val out = DedupPipeline.run(clips, cfg,
      if (args(1) == "-") None else Some(args(1)))
    val nClusters = out.clusters.select("cluster_id").distinct().count()
    val nRows = out.clusters.count()
    val nEdges = out.edges.count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val topClusters = out.clusters.groupBy("cluster_id").count()
      .orderBy($"count".desc, $"cluster_id").limit(5).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")

    println(f"DEDUP rows=$nRows edges=$nEdges clusters=$nClusters wall=$wallSec%.2fs throughput=${nRows / wallSec}%.0f clips/sec")
    println(s"TOP_CLUSTERS $topClusters")
    out.metrics.foreach(m => println(
      s"METRIC stage=${m.stage} rows_in=${m.rows_in} rows_out=${m.rows_out} wall_ms=${m.wall_ms}" +
      (if (m.extra.nonEmpty) m.extra.map { case (k, v) => s" $k=$v" }.mkString else "")))
    spark.stop()
  }
}
