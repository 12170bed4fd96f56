package graft.dedup

import org.apache.spark.sql.Dataset
import graft.kernel.{Doc, Matcher, SuffixIndex}

/** Broadcast fast path: the reference's own architecture — ONE global
  * suffix-array index shared read-only by every worker, rows matched
  * independently (/root/reference/cli/src/FuzzyMatch-cli.cc:82-193) — as a
  * Spark broadcast + mapPartitions. Candidate generation recall is exactly
  * the reference's (the global index IS the candidate generator), so no LSH
  * approximation is involved.
  *
  * Used when the tokenized corpus fits in executor memory
  * (DedupConfig.broadcastMaxRows); the three-stage LSH pipeline is the
  * beyond-memory path. The index is built once per executor JVM and cached
  * by broadcast id.
  */
object BroadcastVerifyStage {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, (SuffixIndex, Array[Doc], Array[TokRow])]()

  private def indexFor(bcId: Long, rows: Array[TokRow]): (SuffixIndex, Array[Doc], Array[TokRow]) =
    cache.computeIfAbsent(bcId, _ => {
      val index = new SuffixIndex
      val docs = new Array[Doc](rows.length)
      var i = 0
      while (i < rows.length) {
        index.add(rows(i).ids)
        docs(i) = Doc(rows(i).ids, rows(i).reals, rows(i).itoks)
        i += 1
      }
      index.sort() // eagerly, before publication — lookups are then read-only
      (index, docs, rows)
    })

  def apply(toks: Dataset[TokRow], cfg: DedupConfig): Dataset[Edge] = {
    val spark = toks.sparkSession
    import spark.implicits._

    val corpus = toks.collect()
    val bc = spark.sparkContext.broadcast(corpus)
    val bcId = bc.id

    val params = Matcher.Params(
      fuzzy = cfg.threshold,
      numberOfMatches = 0,
      noPerfect = false,
      minSubseqLength = cfg.minSubseqLength,
      minSubseqRatio = cfg.minSubseqRatio,
      editCosts = cfg.editCosts,
      maxTokensInPattern = cfg.maxTokensInPattern)

    // with symmetric insert/delete costs the pair decision is direction-free,
    // so only the canonical shorter-pattern direction is emitted; asymmetric
    // costs make the DP depend on orientation, so every direction is kept
    // (a pair is a dup iff EITHER direction clears the threshold — the
    // oracle's allDupPairs semantics; duplicate edges are harmless to CC)
    val asym = cfg.editCosts.insert != cfg.editCosts.delete

    toks.mapPartitions { it =>
      val (index, docs, rows) = indexFor(bcId, bc.value)
      it.flatMap { p =>
        val pattern = Doc(p.ids, p.reals, p.itoks)
        Matcher.matchPattern(index, docs, pattern, params).iterator.flatMap { m =>
          val s = rows(m.sIdx)
          val keep = s.clip_id != p.clip_id &&
            (asym || p.n_tokens < s.n_tokens ||
             (p.n_tokens == s.n_tokens && p.clip_id < s.clip_id))
          if (keep) {
            val kind = if (m.maxSubseq >= p.n_tokens) "substring" else "edit"
            Iterator.single(Edge(p.clip_id, s.clip_id, m.score, m.maxSubseq, kind))
          } else Iterator.empty
        }
      }
    }
  }
}
