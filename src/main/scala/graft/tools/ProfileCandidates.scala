package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.SynthCorpus
import graft.dedup._

/** Dev profiler: times each sub-component of the candidate stage in
  * isolation so optimization targets measurement, not guesswork. */
object ProfileCandidates {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nClips = if (args.nonEmpty) args(0).toLong else 120000L
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = DedupConfig(strategy = "shuffle", shufflePartitions = cpus,
      minhashBands = sys.env.getOrElse("SPARK_GRAFT_BANDS", "64").toInt,
      minhashPerms = sys.env.getOrElse("SPARK_GRAFT_PERMS", "128").toInt)
    val clips = SynthCorpus.generate(spark, nClips, partitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count()

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROFILE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val toks = TokenizeStage(clips, cfg).persist()
    timed("tokenize")(toks.count())

    val sigs = SignatureStage(toks, cfg).persist()
    timed("signatures")(sigs.count())

    val sc = spark.sparkContext
    val a1 = sc.longAccumulator; val a2 = sc.longAccumulator; val a3 = sc.longAccumulator

    val ng = CandidateStage.ngramChannel(toks, cfg, a1, a2).persist()
    timed("ngramChannel")(ng.count())
    println(s"PROFILE ngram capped_buckets=${a1.value} pairs_lost=${a2.value}")

    val mh = CandidateStage.minhashChannel(sigs, cfg, a3).persist()
    timed("minhashChannel")(mh.count())
    println(s"PROFILE minhash capped_buckets=${a3.value}")

    val tiny = CandidateStage.tinyChannel(toks, cfg, spark.sparkContext.longAccumulator)
    timed("tinyChannel")(tiny.count())

    timed("union+dropDup")(ng.union(mh).union(tiny).dropDuplicates("p", "c").count())

    spark.stop()
  }
}
