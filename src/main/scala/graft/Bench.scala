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
      "q_jaccard_pairs", "q_len_window_pairs", "q_ann_topk", "q_embed_norm",
      "q_minhash_sigs", "q_simhash_pairs", "q_ann_lsh", "q_fuzzy_topk",
      // audio channel (round 5): near-dup pairs + containment retrieval
      "q_audio_dup_pairs", "q_audio_contained")

    // session warmup on synthetic data only: pay JVM/codegen/session init
    // once so the first measured query reflects the engine, not cold start
    // (the real tables stay cold — their IO is part of the measurement)
    spark.range(1000).selectExpr("sum(id)").collect()
    DedupPipeline.run(SynthCorpus.generate(spark, 400, partitions = 4),
      DedupConfig(strategy = "shuffle", shufflePartitions = cpus))

    // min-of-2 per query: this host's serialized guest-memory faulting
    // (BASELINE.md) inflates individual runs 5-20x at random — the min of
    // two interleaved passes is the least contaminated engine measurement
    // a single bench invocation can produce (first pass also keeps IO cold
    // for at least one rep per query)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (pass <- 1 to 2; name <- headline) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      if (pass == 1) results(name) = sec
      else results(name) = math.min(results(name), sec)
    }

    // dedup pipeline throughput on the synthetic clip corpus — both the
    // broadcast fast path (reference architecture) and the shuffle/LSH
    // path (the beyond-memory 100 TB path)
    val clips = SynthCorpus.generate(spark, nClips, partitions = cpus * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count() // materialize input outside the timed section
    def timePipeline(s: SparkSession, strategy: String, n: Long): Double = {
      val in = SynthCorpus.generate(s, n, partitions = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      in.count()
      val t0 = System.nanoTime()
      DedupPipeline.run(in, DedupConfig(strategy = strategy, shufflePartitions = cpus))
        .clusters.count()
      val sec = (System.nanoTime() - t0) / 1e9
      in.unpersist()
      sec
    }
    // pipelines get the same min-of-2 treatment, interleaved (broadcast,
    // shuffle, broadcast, shuffle) so a single bad host window cannot
    // poison either strategy's number
    def timeBroadcast(): Double = {
      val t0 = System.nanoTime()
      DedupPipeline.run(clips, DedupConfig(shufflePartitions = cpus)).clusters.count()
      (System.nanoTime() - t0) / 1e9
    }
    var pipeSec = Double.MaxValue
    var shufSec = Double.MaxValue
    for (_ <- 1 to 2) {
      pipeSec = math.min(pipeSec, timeBroadcast())
      shufSec = math.min(shufSec, timePipeline(spark, "shuffle", nClips))
    }
    results("dedup_pipeline_synth") = pipeSec
    results("dedup_shuffle_synth") = shufSec

    // incremental maintenance: fold a 10% batch into committed pipeline
    // state (graft.dedup.IncrementalDedup) — the O(new) ingest path whose
    // wall should sit far under the full re-run above at 10x the corpus
    // ratio. State is built once outside the timed section; the timed runs
    // do not commit (outDir=None), so min-of-2 reruns see identical state.
    val nInc = math.max(nClips / 10, 100L)
    val incState = java.nio.file.Files.createTempDirectory("bench-inc").toString + "/state"
    DedupPipeline.run(clips, DedupConfig(shufflePartitions = cpus), Some(incState))
    val incBatch = SynthCorpus.generate(spark, nInc, partitions = cpus * 2,
      firstId = nClips).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    incBatch.count()
    var incSec = Double.MaxValue
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.dedup.IncrementalDedup.run(incBatch, Seq(incState),
        DedupConfig(shufflePartitions = cpus)).clusters.count()
      incSec = math.min(incSec, (System.nanoTime() - t0) / 1e9)
    }
    incBatch.unpersist()
    results("inc_ingest_synth") = incSec
    spark.stop()

    def jsonLine(scaling: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
      val total = results.values.sum
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","clips":$nClips,"clips_per_sec":${nClips / pipeSec}%.1f,"clips_per_sec_shuffle":${nClips / shufSec}%.1f,"cpus":$cpus$scaling}"""
    }
    // core results first — if the scaling probe is cut short by a harness
    // timeout, this line already carries the full query board
    println(jsonLine(""))

    // two-cluster-size scaling probe (sandbox proxy for N vs 4N executors):
    // the SAME shuffle job on the SAME deterministic input at local[8] and
    // local[32]. One-shot numbers on this noise-prone host — BASELINE.md
    // carries interleaved repeated runs; this keeps the evidence per-round.
    val scaling = scala.util.Try {
      if (sys.env.get("SPARK_GRAFT_SCALING").contains("0")) "" else {
        def levelRun(lvl: Int): Double = {
          val s = DedupPipeline.sessionDefaults(
            SparkSession.builder().master(s"local[$lvl]").appName(s"graft-bench-scale-$lvl"), lvl)
            .getOrCreate()
          s.sparkContext.setLogLevel("WARN")
          val sec = timePipeline(s, "shuffle", nClips)
          s.stop()
          nClips / sec
        }
        // interleaved best-of-2 per level: this host's shared CPU swings
        // several-fold minute to minute, so single-shot ratios can invert;
        // best-of-interleaved is the least contaminated estimate (BASELINE.md).
        // 2→8 sits below the host's sustained-core throttle (~8-12 effective
        // cores measured) so it is the meaningful 1:4 ratio; 8→32 is
        // reported too but saturates the VM's core budget.
        val levels = Seq(2, 8, 32)
        val best = scala.collection.mutable.Map.empty[Int, Double]
        for (_ <- 1 to 2; lvl <- levels) {
          val c = levelRun(lvl)
          best(lvl) = math.max(best.getOrElse(lvl, 0.0), c)
        }
        val (c2, c8, c32) = (best(2), best(8), best(32))
        f""","scaling":{"local2_clips_per_sec":$c2%.1f,"local8_clips_per_sec":$c8%.1f,"local32_clips_per_sec":$c32%.1f,"efficiency_2_to_8":${(c8 / c2) / 4.0}%.3f,"efficiency_8_to_32":${(c32 / c8) / 4.0}%.3f}"""
      }
    }.getOrElse("")

    // superset line (same schema + scaling) — the complete result
    if (scaling.nonEmpty) println(jsonLine(scaling))
  }
}
