package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.SynthCorpus
import graft.dedup.{DedupConfig, DedupPipeline}

/** Two-cluster-size scaling evidence (sandbox proxy for the N vs 4N executor
  * criterion): run the IDENTICAL dedup job on the IDENTICAL input at two
  * local parallelism levels and report throughput at both. Invoke once per
  * level: `SPARK_GRAFT_CPUS=8|32 runMain graft.tools.ScalingBench [nClips]`.
  * Efficiency = (throughput_32 / throughput_8) / 4 — computed in BASELINE.md. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nClips = if (args.nonEmpty) args(0).toLong else 60000L
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName(s"graft-scaling-$cpus"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // identical input at every parallelism: row i is a pure function of (seed, i);
    // fixed 64 input partitions regardless of cores
    val clips = SynthCorpus.generate(spark, nClips, partitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count() // materialize outside the timed window

    // the shuffle (LSH) strategy is the representative beyond-memory path —
    // the broadcast fast path has a deliberate serial index-build component
    val cfg = DedupConfig(strategy = sys.env.getOrElse("SPARK_GRAFT_STRATEGY", "shuffle"),
      shufflePartitions = cpus)

    // warm JIT/codegen with a small throwaway run
    DedupPipeline.run(SynthCorpus.generate(spark, 800, partitions = 8), cfg)

    val t0 = System.nanoTime()
    val out = DedupPipeline.run(clips, cfg)
    val n = out.clusters.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""SCALING {"cpus":$cpus,"clips":$nClips,"rows_out":$n,"sec":$sec%.2f,"clips_per_sec":${nClips / sec}%.1f}""")
    out.metrics.foreach(m => println(s"SCALING_METRIC cpus=$cpus stage=${m.stage} wall_ms=${m.wall_ms} rows_out=${m.rows_out}"))
    spark.stop()
  }
}
