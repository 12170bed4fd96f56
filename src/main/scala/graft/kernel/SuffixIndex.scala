package graft.kernel

import scala.collection.mutable

/** In-memory suffix array over id-encoded sentences.
  *
  * Re-expresses the reference's `SuffixArray`
  * (/root/reference/include/fuzzy/suffix_array.hh:14-61,
  * /root/reference/src/suffix_array.cc): flat suffix list sorted
  * lexicographically by token ids with sentence-id tie-break (total order,
  * suffix_array.cc:235-251), `equal_range` n-gram lookup with range narrowing
  * (suffix_array.cc:104-212), and the n-gram sweep + longest-match
  * registration of the match query (fuzzy_match.cc:484-551 +
  * ngram_matches.cc:31-83).
  *
  * Used both by the single-node oracle matcher and, rebuilt per candidate
  * group, inside the distributed verify kernel.
  */
final class SuffixIndex {
  private val sentences = mutable.ArrayBuffer.empty[Array[Long]]
  // packed suffix views: (sentenceId << 16) | position  — position capped at
  // 65535 like the reference's u16 subsentence_pos (suffix_array.hh:17)
  private var suffixes: Array[Long] = Array.emptyLongArray
  private var sorted = false
  private var nSuffixes = 0

  def numSentences: Int = sentences.length
  def sentence(sIdx: Int): Array[Long] = sentences(sIdx)
  def sentenceLengthOf(sIdx: Int): Int = sentences(sIdx).length

  def add(ids: Array[Long]): Int = {
    val sIdx = sentences.length
    sentences += ids
    sorted = false
    sIdx
  }

  @inline private def suffixSentence(packed: Long): Int = (packed >>> 16).toInt
  @inline private def suffixPos(packed: Long): Int = (packed & 0xffffL).toInt

  /** Sentence index owning the suffix at sorted position i. */
  def sentenceOfSuffix(i: Int): Int = suffixSentence(suffixes(i))

  /** Lexicographic compare of suffix `a` against suffix `b`, tie-broken by
    * sentence id for a platform-independent total order
    * (/root/reference/src/suffix_array.cc:214-251). */
  private def compareSuffixes(a: Long, b: Long): Int = {
    val sa = sentences(suffixSentence(a)); val pa = suffixPos(a)
    val sb = sentences(suffixSentence(b)); val pb = suffixPos(b)
    val la = sa.length - pa
    val lb = sb.length - pb
    val n = math.min(la, lb)
    var i = 0
    while (i < n) {
      val x = sa(pa + i); val y = sb(pb + i)
      if (x < y) return -1
      if (x > y) return 1
      i += 1
    }
    if (la != lb) { if (la < lb) -1 else 1 }
    else {
      val ia = suffixSentence(a); val ib = suffixSentence(b)
      if (ia < ib) -1 else if (ia > ib) 1 else 0
    }
  }

  /** Prefix-compare suffix vs ngram: 0 when the suffix starts with the ngram,
    * else the lexicographic sign (reference `start_by`,
    * suffix_array.cc:253-261 via compare_ngrams equal_if_startby). */
  private def startBy(packed: Long, ngram: Array[Long], off: Int, len: Int): Int = {
    val s = sentences(suffixSentence(packed)); val p = suffixPos(packed)
    val sLen = s.length - p
    val n = math.min(sLen, len)
    var i = 0
    while (i < n) {
      val x = s(p + i); val y = ngram(off + i)
      if (x < y) return -1
      if (x > y) return 1
      i += 1
    }
    if (sLen < len) -1 else 0
  }

  def sort(): Unit = {
    if (sorted) return
    var total = 0
    var s = 0
    while (s < sentences.length) { total += sentences(s).length; s += 1 }
    val arr = new Array[Long](total)
    var k = 0
    s = 0
    while (s < sentences.length) {
      val n = sentences(s).length
      var p = 0
      while (p < n && p < 0x10000) { arr(k) = (s.toLong << 16) | p.toLong; k += 1; p += 1 }
      s += 1
    }
    // primitive-long merge sort with the total-order comparator (no boxing —
    // this sort is the serial component of the broadcast fast path, measured
    // at ~33 s for 480k rows when it was a boxed Arrays.sort)
    mergeSort(arr, new Array[Long](total), 0, total)
    suffixes = arr
    nSuffixes = arr.length
    sorted = true
  }

  /** Bottom-up merge sort on packed suffix views, comparing via
    * `compareSuffixes` — guaranteed O(n log n), stable, zero boxing.
    *
    * Every merge at one width level covers a DISJOINT [start, end) slice, so
    * levels parallelize without changing a single comparison's outcome (the
    * merge tree is fixed by the widths — the result is bit-identical to the
    * sequential sort). The sort is the serial component of the broadcast
    * fast path — one executor thread built the whole index while its
    * siblings waited on the build monitor (r6; the level-parallel form uses
    * the JVM common pool only for inputs past `parCut`). */
  private def mergeSort(a: Array[Long], tmp: Array[Long], from: Int, until: Int): Unit = {
    val n = until - from
    // insertion sort below this width (cache-friendly, few comparator calls)
    val insertionCut = 16
    val parCut = 1 << 18 // parallelize levels only for big indexes
    val nBlocks = (n + insertionCut - 1) / insertionCut
    def insertionBlock(b: Int): Unit = {
      val lo = from + b * insertionCut
      val hi = math.min(lo + insertionCut, until)
      var i = lo + 1
      while (i < hi) {
        val v = a(i)
        var j = i - 1
        while (j >= lo && compareSuffixes(a(j), v) > 0) { a(j + 1) = a(j); j -= 1 }
        a(j + 1) = v
        i += 1
      }
    }
    if (n >= parCut)
      java.util.stream.IntStream.range(0, nBlocks).parallel().forEach(insertionBlock(_))
    else { var b = 0; while (b < nBlocks) { insertionBlock(b); b += 1 } }

    def mergeAt(start: Int, width: Int): Unit = {
      val mid = start + width
      val end = math.min(start + 2 * width, until)
      // skip the merge when already ordered across the boundary
      if (compareSuffixes(a(mid - 1), a(mid)) > 0) {
        System.arraycopy(a, start, tmp, start, end - start)
        var i = start; var j = mid; var o = start
        while (i < mid && j < end) {
          if (compareSuffixes(tmp(i), tmp(j)) <= 0) { a(o) = tmp(i); i += 1 }
          else { a(o) = tmp(j); j += 1 }
          o += 1
        }
        while (i < mid) { a(o) = tmp(i); i += 1; o += 1 }
        while (j < end) { a(o) = tmp(j); j += 1; o += 1 }
      }
    }
    var width = insertionCut
    while (width < n) {
      val step = 2 * width
      val nMerges = math.max(0, (until - width - from + step - 1) / step)
      if (n >= parCut && nMerges > 1)
        java.util.stream.IntStream.range(0, nMerges).parallel()
          .forEach(m => mergeAt(from + m * step, width))
      else {
        var m = 0
        while (m < nMerges) { mergeAt(from + m * step, width); m += 1 }
      }
      width = step
    }
  }

  /** Half-open range [lo, hi) of suffixes starting with
    * `ngram[off, off+len)`, searched within a previous range when
    * `hi0 > 0` (narrowing, reference equal_range suffix_array.cc:104-212). */
  def equalRange(ngram: Array[Long], off: Int, len: Int, lo0: Int, hi0: Int): (Int, Int) = {
    require(sorted, "SuffixIndex.sort() must run before lookups")
    if (len == 0) return (0, 0)
    var lo = lo0; var hi = hi0
    if (hi == 0) { lo = 0; hi = nSuffixes }
    // lower bound: first index with startBy >= 0
    var a = lo; var b = hi
    while (a < b) {
      val mid = (a + b) >>> 1
      if (startBy(suffixes(mid), ngram, off, len) < 0) a = mid + 1 else b = mid
    }
    val first = a
    // upper bound: first index with startBy > 0
    b = hi
    while (a < b) {
      val mid = (a + b) >>> 1
      if (startBy(suffixes(mid), ngram, off, len) <= 0) a = mid + 1 else b = mid
    }
    (first, a)
  }

  /** Length-window pre-rejection P5 (/root/reference/src/ngram_matches.cc:31-39). */
  def theoreticalRejection(pLen: Int, sLen: Int, ec: EditCosts, fuzzy: Float): Boolean =
    SuffixIndex.theoreticalRejection(pLen, sLen, ec, fuzzy)

  /** Coverage-based pre-rejection P6 (/root/reference/src/ngram_matches.cc:41-59). */
  def theoreticalRejectionCover(pLen: Int, sLen: Int, cover: Int, ec: EditCosts, fuzzy: Float): Boolean =
    SuffixIndex.theoreticalRejectionCover(pLen, sLen, cover, ec, fuzzy)

  /** The all-positions n-gram sweep with differential range registration
    * (J2, /root/reference/src/fuzzy_match.cc:484-551) feeding the
    * longest-match-per-sentence aggregation (A1/A2,
    * /root/reference/src/ngram_matches.cc:61-83,19-29).
    *
    * Returns (sentenceIdx, longestMatch) sorted by length desc, idx asc.
    */
  def longestMatches(pattern: Array[Long], minSeqLen: Int, fuzzy: Float, ec: EditCosts): Array[(Int, Int)] = {
    sort()
    val pLen = pattern.length
    val longest = new mutable.HashMap[Int, Int]

    def register(begin: Int, end: Int, matchLength: Int): Unit = {
      if (matchLength < minSeqLen) return
      var i = begin
      while (i < end) {
        val packed = suffixes(i)
        val sIdx = suffixSentence(packed)
        val sLen = sentences(sIdx).length
        if (!theoreticalRejection(pLen, sLen, ec, fuzzy)) {
          val cur = longest.getOrElse(sIdx, 0)
          if (matchLength > cur) longest(sIdx) = matchLength
        }
        i += 1
      }
    }

    if (pLen == 1) {
      val r = equalRange(pattern, 0, 1, 0, 0)
      if (r._1 != r._2) register(r._1, r._2, 1)
    }

    var it = 0
    while (it < pLen) {
      var prevLo = 0; var prevHi = 0
      var subseqLength = 0
      var jt = it
      var broke = false
      while (jt < pLen && !broke) {
        subseqLength += 1
        val r = equalRange(pattern, it, subseqLength, prevLo, prevHi)
        if (r._1 != r._2) {
          if (subseqLength > 2) {
            register(prevLo, r._1, subseqLength - 1)
            register(r._2, prevHi, subseqLength - 1)
          }
          prevLo = r._1; prevHi = r._2
        } else {
          subseqLength -= 1
          broke = true
        }
        jt += 1
      }
      if (subseqLength >= 2) register(prevLo, prevHi, subseqLength)
      it += 1
    }

    val arr = longest.toArray
    // (length desc, sentence idx asc) — ngram_matches.cc:19-29
    scala.util.Sorting.stableSort(arr, (a: (Int, Int), b: (Int, Int)) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}

object SuffixIndex {
  /** Length-window pre-rejection P5 (/root/reference/src/ngram_matches.cc:31-39):
    * best theoretically achievable score from the length difference alone
    * can't reach the threshold (5e-6 epsilon absorbs float rounding). */
  def theoreticalRejection(pLen: Int, sLen: Int, ec: EditCosts, fuzzy: Float): Boolean = {
    val sizeDifference = math.abs(pLen.toFloat - sLen.toFloat)
    val remainingCost = if (pLen >= sLen) ec.insert else ec.delete
    val bound = 1f - remainingCost * sizeDifference / Costs.normalizer(pLen, sLen, ec)
    bound + 0.000005f < fuzzy
  }

  /** Coverage-based pre-rejection P6 (/root/reference/src/ngram_matches.cc:41-59). */
  def theoreticalRejectionCover(pLen: Int, sLen: Int, cover: Int, ec: EditCosts, fuzzy: Float): Boolean = {
    val bound =
      if (ec.insert + ec.delete < ec.replace)
        1f - (ec.insert * (sLen.toFloat - cover) + ec.delete * (pLen.toFloat - cover)) /
          Costs.normalizer(pLen, sLen, ec)
      else {
        val costRemaining = if (pLen > sLen) ec.insert else ec.delete
        val minLength = math.min(pLen, sLen).toFloat
        val maxLength = math.max(pLen, sLen).toFloat
        1f - (ec.replace * (minLength - cover) + costRemaining * (maxLength - minLength)) /
          Costs.normalizer(pLen, sLen, ec)
      }
    bound + 0.000005f < fuzzy
  }
}

/** Bag-of-words pattern coverage A5
  * (/root/reference/src/pattern_coverage.cc:8-28): counts pattern word
  * occurrences (with multiplicity) present anywhere in the sentence. */
final class PatternCoverage(pattern: Array[Long]) {
  private val wordCount: mutable.LongMap[Int] = {
    val m = mutable.LongMap.empty[Int]
    var i = 0
    while (i < pattern.length) { m(pattern(i)) = m.getOrElse(pattern(i), 0) + 1; i += 1 }
    m
  }

  def countCoveredWords(sentence: Array[Long]): Int = {
    var covered = 0
    wordCount.foreach { case (w, c) =>
      var found = false
      var i = 0
      while (i < sentence.length && !found) { if (sentence(i) == w) found = true; i += 1 }
      if (found) covered += c
    }
    covered
  }
}
