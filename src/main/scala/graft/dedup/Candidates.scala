package graft.dedup

import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator
import graft.kernel.{Hashing, SuffixIndex}

/** Candidate pair, oriented: `p` is the pattern side — the member with fewer
  * tokens (tie: lexicographically smaller clip_id). With the default
  * SYMMETRIC insert/delete costs the reference's dup-pair decision is
  * direction-free given this orientation: the shorter pattern's
  * min-subsequence requirement is the laxer of the two
  * (/root/reference/src/fuzzy_match.cc:463-467 is monotone in length), the
  * DP cost and LCS are symmetric, and the rejection bounds are sound.
  * With ASYMMETRIC insert/delete costs the normalizer and P5 window differ
  * by direction, so VerifyStage additionally verifies the reverse
  * orientation and the channels pre-reject only when BOTH orientations
  * reject (see `lengthReject`). */
final case class CandPair(p: String, c: String)

/** Stage 2a — candidate generation, replacing the reference's global sorted
  * suffix array probe (J1/J2, /root/reference/src/fuzzy_match.cc:484-551)
  * with three distributed channels:
  *
  *  A. exact k-shingle inverted-index join: any pair with a common k-token
  *     substring co-occurs in some shingle bucket (recall 1.0 vs the oracle
  *     for patterns with ≥ k tokens when k ≤ the effective min registered
  *     n-gram length); hot buckets above `shingleDfCap` are dropped here and
  *     COUNTED (metrics), to be recovered by channel B;
  *  B. MinHash LSH band buckets (the 10^12-row scale path, probabilistic);
  *  C. tiny patterns (< k tokens): broadcast + containment scan, mirroring
  *     the reference's unigram/short-pattern semantics
  *     (/root/reference/src/fuzzy_match.cc:484-493).
  *
  * Each channel pre-rejects by the P5 length window before the pair ever
  * reaches a shuffle (/root/reference/src/ngram_matches.cc:31-39).
  */
object CandidateStage {

  final case class ShingleEntry(sh: Long, clip_id: String, n_tokens: Int)

  /** Orient a pair (pattern = shorter side). */
  @inline private def orient(id1: String, n1: Int, id2: String, n2: Int): CandPair =
    if (n1 < n2 || (n1 == n2 && id1 <= id2)) CandPair(id1, id2) else CandPair(id2, id1)

  /** P5 length-window rejection, sound in BOTH match orientations: with
    * asymmetric insert/delete costs the bound depends on which side is the
    * pattern, so a pair is dropped only when both orientations reject
    * (collapses to the single check for the default symmetric costs). */
  @inline def lengthReject(n1: Int, n2: Int, ec: graft.kernel.EditCosts, fuzzy: Float): Boolean =
    if (ec.insert == ec.delete) SuffixIndex.theoreticalRejection(n1, n2, ec, fuzzy)
    else SuffixIndex.theoreticalRejection(n1, n2, ec, fuzzy) &&
      SuffixIndex.theoreticalRejection(n2, n1, ec, fuzzy)

  /** Channel A: exact shingle join. */
  def ngramChannel(
      toks: Dataset[TokRow],
      cfg: DedupConfig,
      cappedBuckets: LongAccumulator,
      cappedPairsLost: LongAccumulator): Dataset[CandPair] = {
    val spark = toks.sparkSession
    import spark.implicits._
    val k = cfg.shingleK
    val cap = cfg.shingleDfCap
    val fuzzy = cfg.threshold
    val ec = cfg.editCosts

    toks
      .flatMap(t => Hashing.distinctShingles(t.ids, k).iterator
        .map(h => ShingleEntry(h, t.clip_id, t.n_tokens)))
      .filter(_.n_tokens >= k) // shorter rows go through the tiny channel
      .groupByKey(_.sh)
      .flatMapGroups { (_, it) =>
        val members = it.toArray
        if (members.length > cap) {
          cappedBuckets.add(1)
          cappedPairsLost.add(members.length.toLong * (members.length - 1) / 2)
          Iterator.empty
        } else if (members.length < 2) Iterator.empty
        else {
          java.util.Arrays.sort(members, Ordering.by((e: ShingleEntry) => (e.n_tokens, e.clip_id)))
          val out = new scala.collection.mutable.ArrayBuffer[CandPair]
          var i = 0
          while (i < members.length) {
            var j = i + 1
            var inWindow = true
            while (j < members.length && inWindow) {
              // members sorted by length: once the window fails it stays failed
              if (lengthReject(members(i).n_tokens, members(j).n_tokens, ec, fuzzy))
                inWindow = false
              else {
                if (members(i).clip_id != members(j).clip_id)
                  out += orient(members(i).clip_id, members(i).n_tokens,
                                members(j).clip_id, members(j).n_tokens)
                j += 1
              }
            }
            i += 1
          }
          out.iterator
        }
      }
  }

  /** Channel B: MinHash band buckets. */
  def minhashChannel(
      sigs: Dataset[SigRow],
      cfg: DedupConfig,
      cappedBuckets: LongAccumulator): Dataset[CandPair] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val cap = cfg.bandDfCap
    val fuzzy = cfg.threshold
    val ec = cfg.editCosts

    sigs
      .flatMap(s => s.band_hashes.iterator.zipWithIndex
        .map { case (h, b) => ShingleEntry(Hashing.mix64(h ^ (b * 0x9e3779b97f4a7c15L)), s.clip_id, s.n_tokens) })
      .groupByKey(_.sh)
      .flatMapGroups { (_, it) =>
        val members = it.toArray
        if (members.length > cap) { cappedBuckets.add(1); Iterator.empty }
        else if (members.length < 2) Iterator.empty
        else {
          java.util.Arrays.sort(members, Ordering.by((e: ShingleEntry) => (e.n_tokens, e.clip_id)))
          val out = new scala.collection.mutable.ArrayBuffer[CandPair]
          var i = 0
          while (i < members.length) {
            var j = i + 1
            var inWindow = true
            while (j < members.length && inWindow) {
              if (lengthReject(members(i).n_tokens, members(j).n_tokens, ec, fuzzy))
                inWindow = false
              else {
                if (members(i).clip_id != members(j).clip_id)
                  out += orient(members(i).clip_id, members(i).n_tokens,
                                members(j).clip_id, members(j).n_tokens)
                j += 1
              }
            }
            i += 1
          }
          out.iterator
        }
      }
  }

  /** Channel C: tiny patterns (fewer than shingleK tokens). A tiny pattern
    * can only match sentences containing its FULL token sequence as a
    * contiguous substring (its clamped min-subsequence length equals its own
    * length), so broadcast the tiny set and scan. */
  def tinyChannel(toks: Dataset[TokRow], cfg: DedupConfig): Dataset[CandPair] = {
    val spark = toks.sparkSession
    import spark.implicits._
    val k = cfg.shingleK
    val fuzzy = cfg.threshold
    val ec = cfg.editCosts

    val tiny: Array[(String, Array[Long], Int)] = toks
      .filter(_.n_tokens < k)
      .map(t => (t.clip_id, t.ids, t.n_tokens))
      .take(cfg.tinyPatternBroadcastCap + 1)
    require(tiny.length <= cfg.tinyPatternBroadcastCap,
      s"tiny-pattern set exceeds broadcast cap ${cfg.tinyPatternBroadcastCap}; raise it or shrink shingleK")
    if (tiny.isEmpty) return spark.emptyDataset[CandPair]
    val bc = spark.sparkContext.broadcast(tiny)

    toks.flatMap { row =>
      val out = new scala.collection.mutable.ArrayBuffer[CandPair]
      val tinies = bc.value
      var t = 0
      while (t < tinies.length) {
        val (tid, tids, tn) = tinies(t)
        if (tid != row.clip_id &&
            !lengthReject(tn, row.n_tokens, ec, fuzzy) &&
            containsSubsequence(row.ids, tids))
          out += orient(tid, tn, row.clip_id, row.n_tokens)
        t += 1
      }
      out.iterator
    }
  }

  /** Contiguous-substring containment of `needle` in `hay`. */
  def containsSubsequence(hay: Array[Long], needle: Array[Long]): Boolean = {
    if (needle.length == 0 || needle.length > hay.length) return false
    var i = 0
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return true
      i += 1
    }
    false
  }

  /** Union of enabled channels, deduplicated. */
  def apply(
      toks: Dataset[TokRow],
      sigs: => Dataset[SigRow],
      cfg: DedupConfig,
      cappedShingleBuckets: LongAccumulator,
      cappedShinglePairs: LongAccumulator,
      cappedBandBuckets: LongAccumulator): Dataset[CandPair] = {
    val spark = toks.sparkSession
    import spark.implicits._
    var cands = spark.emptyDataset[CandPair]
    if (cfg.useNgramChannel)
      cands = cands.union(ngramChannel(toks, cfg, cappedShingleBuckets, cappedShinglePairs))
    if (cfg.useMinhashChannel)
      cands = cands.union(minhashChannel(sigs, cfg, cappedBandBuckets))
    cands = cands.union(tinyChannel(toks, cfg))
    cands.dropDuplicates("p", "c").as[CandPair]
  }
}
