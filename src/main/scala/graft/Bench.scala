package graft

import org.apache.spark.sql.SparkSession
import graft.data.SynthCorpus
import graft.dedup.{DedupConfig, DedupPipeline}

/** Benchmark main. Runs the headline operator queries on
  * SPARK_GRAFT_SF_DIR plus the full dedup pipeline on a synthetic clip
  * corpus, and prints ONE JSON line:
  * {"metric":"total","value":sec,"unit":"sec","queries":{...},"sf":...,
  *  "clips":N,"clips_per_sec":r,"cpus":c}.
  * Parallelism via SPARK_GRAFT_CPUS; corpus size via SPARK_GRAFT_BENCH_CLIPS
  * (scaling runs: same input, different cpus — see BASELINE.md). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nClips = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLIPS", "24000").toLong
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q1_agg", "q_doc_freq", "q_exact_dedup", "q_token_count", "q_fingerprint",
      "q_jaccard_pairs", "q_ann_topk", "q_embed_norm", "q_minhash_sigs",
      "q_simhash_pairs", "q_ann_lsh")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (name <- headline) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    // dedup pipeline throughput on the synthetic clip corpus
    val clips = SynthCorpus.generate(spark, nClips, partitions = cpus * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count() // materialize input outside the timed section
    val t0 = System.nanoTime()
    val out = DedupPipeline.run(clips, DedupConfig(shufflePartitions = cpus))
    out.clusters.count()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    results("dedup_pipeline_synth") = pipeSec

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.sum
    val cps = nClips / pipeSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","clips":$nClips,"clips_per_sec":$cps%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
