package graft.tools

import graft.dedup.{DedupConfig, DedupPipeline, FuzzyRetrieval}

/** Index introspection — the reference CLI's debug `-a dump`
  * (/root/reference/cli/src/FuzzyMatch-cli.cc:461-465) for BOTH index
  * formats this engine writes:
  *
  *   DumpCli <index.gfm> [topN]   — a saved single-node oracle matcher
  *                                  (GFM binary, OracleCli GRAFT_SAVE_INDEX)
  *   DumpCli <indexDir> [topN]    — a distributed retrieval index
  *                                  (FuzzyRetrieval.saveIndex / MatchCli
  *                                  action=index)
  *
  * Prints structural stats (sentences, vocab, suffix count, length
  * distribution) plus the topN highest-document-frequency tokens — the
  * practical debugging surface for LSH hot-bucket tuning.
  */
object DumpCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DumpCli <index.gfm | indexDir> [topN]")
    val path = args(0)
    val topN = if (args.length > 1) args(1).toInt else 10

    val f = new java.io.File(path)
    if (f.isFile) {
      // single-node oracle GFM index: no Spark session needed
      val fm = graft.oracle.FuzzyMatcher.load(path)
      println(s"GFM ORACLE INDEX $path")
      print(fm.dumpInfo(topN))
    } else {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
      val spark = DedupPipeline.sessionBuilder("graft-dump", cpus).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // loadIndex validates the meta header; dump must accept ANY config the
      // index was built with, so read the pinned config out of the meta
      // (ONE parsing contract — FuzzyRetrieval.readIndexMeta) and echo it
      val m = FuzzyRetrieval.readIndexMeta(spark, path)
      val toks = FuzzyRetrieval.loadIndex(spark, path,
        DedupConfig(pt = m.pt, maxTokensInPattern = m.maxTokensInPattern))
      // coalesce: sum/max/avg over ZERO rows are null — an empty index (all
      // transcripts filtered by P2/P3) must dump sentences=0, not crash
      val stats = toks.toDF()
        .agg(count(lit(1)).as("sentences"),
          coalesce(sum("n_tokens"), lit(0L)).as("suffixes"),
          coalesce(max("n_tokens"), lit(0)).as("max_len"),
          coalesce(avg("n_tokens"), lit(0.0)).as("avg_len"),
          approx_count_distinct(col("ids")).as("approx_distinct_rows"))
        .head()
      // doc-frequency top-N over the hash-encoded token ids, reported with a
      // sample surface form (A3 sfreq — the ids are FNV64 of norm tokens)
      val top = toks.flatMap { t =>
        val seen = new java.util.HashSet[java.lang.Long]()
        t.ids.iterator.zipWithIndex.collect {
          case (id, pos) if seen.add(id) => (id, t.reals(pos), 1L)
        }
      }.toDF("id", "form", "one")
        .groupBy("id").agg(sum("one").as("sfreq"), first("form").as("form"))
        .orderBy(col("sfreq").desc, col("form").asc)
        .limit(topN).collect()
      println(s"GRAFT DISTRIBUTED INDEX $path")
      println(s"meta version=${m.version} pt=${m.pt} maxTokensInPattern=${m.maxTokensInPattern} " +
        s"segments=${m.segments}")
      println(s"sentences=${stats.getLong(0)} suffixes=${stats.getLong(1)} " +
        f"max_len=${stats.getInt(2)} avg_len=${stats.getDouble(3)}%.2f " +
        s"approx_distinct_rows=${stats.getLong(4)}")
      // the distributed index stores FNV64 ids + scoring ("real") forms, not
      // surface tokens — label the sample accordingly
      top.foreach(r => println(s"SFREQ ${r.getLong(1)}\tid=${r.getLong(0)} real≈${r.getString(2)}"))
      spark.stop()
    }
  }
}
