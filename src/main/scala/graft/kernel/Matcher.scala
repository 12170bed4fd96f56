package graft.kernel

import scala.collection.mutable

/** One fuzzy-match result row, mirroring the reference `Match`
  * (/root/reference/include/fuzzy/fuzzy_match.hh:32-46). */
final case class MatchResult(
    score: Double,
    penalty: Double,
    maxSubseq: Int,
    sIdx: Int,
    length: Int)

object Matcher {
  sealed trait ContrastReduce
  case object Mean extends ContrastReduce
  case object Max extends ContrastReduce

  /** Match-query parameters with the reference CLI defaults
    * (/root/reference/cli/src/FuzzyMatch-cli.cc:324-342). */
  final case class Params(
      fuzzy: Float = 0.8f,
      numberOfMatches: Int = 5,
      noPerfect: Boolean = false,
      minSubseqLength: Int = 3,
      minSubseqRatio: Float = 0.3f,
      vocabIdfPenalty: Float = 0f,
      editCosts: EditCosts = EditCosts(),
      contrastiveFactor: Float = 0f,
      contrastReduce: ContrastReduce = Mean,
      contrastBuffer: Int = -1,
      maxTokensInPattern: Int = 300)

  /** Effective min subsequence length after the reference's clamping
    * (/root/reference/src/fuzzy_match.cc:463-467). */
  def minSeqLen(p: Params, patternLength: Int): Int = {
    var ml = p.minSubseqLength
    if (ml > patternLength) ml = patternLength
    if ((p.minSubseqRatio * patternLength).toInt > ml)
      ml = (p.minSubseqRatio * patternLength).toInt
    ml
  }

  /** The flagship fuzzy top-k match query end-to-end over an in-memory index
    * (/root/reference/src/fuzzy_match.cc:436-681): n-gram sweep candidate
    * generation → coverage rejection → weighted edit-distance verification
    * with the branch-and-bound lowest-cost heap → score quantization →
    * threshold / no_perfect filters → top-k heap (score desc, s_id asc) →
    * optional contrastive rerank.
    *
    * `docs(i)` must be the Doc added to `index` as sentence i.
    * `idfPenalty`, when non-null, is indexed by pattern position and
    * `idfMax` = log(num indexed sentences) (fuzzy_match.cc:367-390).
    */
  def matchPattern(
      index: SuffixIndex,
      docs: Int => Doc,
      pattern: Doc,
      params: Params,
      idfPenalty: Array[Float] = null,
      idfMax: Float = 0.01f): List[MatchResult] = {
    val pLen = pattern.length
    var contrastBuffer = params.contrastBuffer
    if (contrastBuffer == -1) contrastBuffer = params.numberOfMatches
    if (pLen > params.maxTokensInPattern || pLen == 0) return Nil

    val msl = minSeqLen(params, pLen)
    val ec = params.editCosts

    val candidates = index.longestMatches(pattern.ids, msl, params.fuzzy, ec)
    val coverage = new PatternCoverage(pattern.ids)

    // CompareMatch heap: top = (score desc, s_id asc) — fuzzy_match.cc:25-33
    implicit val ord: Ordering[MatchResult] = Ordering.by(m => (m.score, -m.sIdx))
    val result = mutable.PriorityQueue.empty[MatchResult]

    // branch-and-bound heap of lowest costs — fuzzy_match.cc:564-568
    val lowestCosts = mutable.PriorityQueue.empty[Float](Ordering.Float.TotalOrdering)
    lowestCosts.enqueue(Float.MaxValue)

    var ci = 0
    while (ci < candidates.length) {
      val (sIdx, longestMatch) = candidates(ci)
      val sDoc = docs(sIdx)
      val sLen = sDoc.length
      val numCoveredWords =
        if (longestMatch < pLen) coverage.countCoveredWords(sDoc.ids) else pLen

      if (!index.theoreticalRejectionCover(pLen, sLen, numCoveredWords, ec, params.fuzzy)) {
        val diffWord = Costs.diffWord(pLen, sLen, ec)
        val costUpperBound = lowestCosts.head
        val idfWeight =
          if (params.vocabIdfPenalty != 0f) diffWord * params.vocabIdfPenalty / idfMax else 0f
        val cost = EditDistanceKernel.weighted(
          sDoc, pattern, idfPenalty, idfWeight, ec, diffWord, costUpperBound)

        val skip = (params.noPerfect && cost == 0f && sLen == pLen) || cost > costUpperBound
        if (!skip) {
          val score: Float = Costs.quantize(cost)
          lowestCosts.enqueue(cost)
          if (score < params.fuzzy || (contrastBuffer > 0 && lowestCosts.size > contrastBuffer))
            lowestCosts.dequeue()
          if (score >= params.fuzzy)
            result.enqueue(MatchResult(score.toDouble, 0.0, longestMatch, sIdx, sLen))
        }
      }
      ci += 1
    }

    if (params.contrastiveFactor > 0f)
      contrastiveRerank(result, docs, params)
    else {
      val out = mutable.ListBuffer.empty[MatchResult]
      while (result.nonEmpty &&
             (params.numberOfMatches == 0 || out.size < params.numberOfMatches))
        out += result.dequeue()
      out.toList
    }
  }

  /** Contrastive (MMR-style) rerank R1
    * (/root/reference/src/fuzzy_match.cc:613-669): iteratively select
    * argmax(score − λ·penalty) where penalty is the mean/max pairwise
    * quantized plain-edit-distance similarity against already-selected
    * matches, memoized per pair. */
  private[graft] def contrastiveRerank(
      result: mutable.PriorityQueue[MatchResult],
      docs: Int => Doc,
      params: Params): List[MatchResult] = {
    val lambda = params.contrastiveFactor
    val candidates = mutable.ArrayBuffer.empty[MatchResult]
    while (result.nonEmpty) candidates += result.dequeue()
    val matches = mutable.ListBuffer.empty[MatchResult]
    val memo = mutable.HashMap.empty[(Int, Int), Float]
    val internalEc = EditCosts()
    val penalties = mutable.ArrayBuffer.empty[Double]

    while (candidates.nonEmpty &&
           (params.numberOfMatches == 0 || matches.size < params.numberOfMatches)) {
      var k = 0
      while (k < candidates.length) {
        val m = candidates(k)
        penalties.clear()
        for (mm <- matches) {
          val key = (m.sIdx, mm.sIdx)
          val raw = memo.getOrElseUpdate(key, {
            val dw = Costs.diffWord(m.length, mm.length, internalEc)
            EditDistanceKernel.plain(docs(m.sIdx).ids, docs(mm.sIdx).ids, internalEc, dw)
          })
          penalties += Costs.quantize(raw).toDouble
        }
        if (penalties.nonEmpty) {
          val p = params.contrastReduce match {
            case Max  => penalties.max
            case Mean => penalties.sum / penalties.size
          }
          candidates(k) = m.copy(penalty = p)
        }
        k += 1
      }
      var best = 0
      k = 1
      while (k < candidates.length) {
        val a = candidates(k); val b = candidates(best)
        if (a.score - lambda * a.penalty > b.score - lambda * b.penalty) best = k
        k += 1
      }
      matches += candidates(best)
      candidates.remove(best)
    }
    matches.toList
  }

  /** Best-subsequence retrieval J4
    * (/root/reference/src/fuzzy_match.cc:250-365): IDF/length-weighted
    * priority queue of pattern subsequences (length ≥ clamped min), probed
    * longest/heaviest first; first verified candidate wins. Returns at most
    * one match whose maxSubseq is the matched subsequence length, plus the
    * subsequence's token span for detokenization by the caller. */
  def subsequence(
      index: SuffixIndex,
      docs: Int => Doc,
      pattern: Doc,
      numberOfMatches: Int,
      noPerfect: Boolean,
      minSubseqLength0: Int,
      minSubseqRatio: Float,
      idfWeighting: Boolean,
      idfPenalty: Array[Float]): Option[(MatchResult, Int, Int)] = {
    val pLen = pattern.length
    var minSubseqLength = minSubseqLength0
    if ((minSubseqRatio * pLen).toInt > minSubseqLength)
      minSubseqLength = (minSubseqRatio * pLen).toInt
    if (pLen < minSubseqLength) return None
    index.sort()

    // (weight desc, position asc) — fuzzy_match.cc:238-247
    final case class Subseq(weight: Float, position: Int, length: Int)
    implicit val ord: Ordering[Subseq] = Ordering.by(s => (s.weight, -s.position))
    val queue = mutable.PriorityQueue.empty[Subseq]
    var it = 0
    while (it < pLen) {
      var w = 0f
      var jt = it
      var stop = false
      while (jt < pLen && !stop) {
        val weight = if (idfPenalty != null) idfPenalty(jt) else 1f
        if (weight == -1f) stop = true
        else {
          w += (if (idfWeighting) weight else 1f)
          if (jt - it + 1 >= minSubseqLength) queue.enqueue(Subseq(w, it, jt - it + 1))
          jt += 1
        }
      }
      it += 1
    }

    var maxDistance = 10000f
    var best: Option[(MatchResult, Int, Int)] = None
    val candidates = mutable.HashSet.empty[Int]
    val perfect = mutable.HashSet.empty[Int]
    val ec = EditCosts()

    while (queue.nonEmpty && maxDistance == 10000f) {
      val subseq = queue.dequeue()
      val (lo, hi) = index.equalRange(pattern.ids, subseq.position, subseq.length, 0, 0)
      var i = lo
      var break = false
      while (i < hi && candidates.size < numberOfMatches && !break) {
        val packed = index.sentenceOfSuffix(i)
        if (!candidates.contains(packed) && !perfect.contains(packed)) {
          val sDoc = docs(packed)
          val sLen = sDoc.length
          val diffWord = Costs.diffWord(pLen, sLen, ec)
          val cost = EditDistanceKernel.weighted(
            sDoc, pattern, idfPenalty, 0f, ec, diffWord, maxDistance)
          if (cost == 0f && noPerfect) perfect += packed
          else {
            if (cost < maxDistance) {
              best = Some((
                MatchResult(Costs.quantize(cost).toDouble, 0.0, subseq.length, packed, sLen),
                subseq.position, subseq.length))
              maxDistance = cost
              if (cost == 0f) break = true
            }
            candidates += packed
          }
        }
        i += 1
      }
    }
    best
  }
}
