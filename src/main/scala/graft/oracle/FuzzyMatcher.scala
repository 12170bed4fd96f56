package graft.oracle

import scala.collection.mutable
import graft.kernel._
import graft.text.{PT, TokSent, Tokenizer}

/** Dictionary-encoding of tokens → contiguous ids with per-word sentence
  * frequency (document frequency), mirroring the reference `VocabIndexer`
  * (/root/reference/include/fuzzy/vocab_indexer.hh:13-53,
  * /root/reference/src/vocab_indexer.cc). Reserved: 0 = sentence separator,
  * 1 = unknown. */
final class VocabIndexer {
  val SentenceSeparator = 0L
  val VocabUnk = 1L

  private val form2index = mutable.HashMap.empty[String, Long]
  private val sfreqBuf = mutable.ArrayBuffer[Int](0, 0)
  form2index("\u0000") = 0L // NUL sentinel form, written as an escape so the file diffs as text
  form2index("｟unk｠") = 1L

  def size: Int = sfreqBuf.length

  private def addWord(w: String): Long =
    form2index.getOrElseUpdate(w, { sfreqBuf += 0; (sfreqBuf.length - 1).toLong })

  /** Adds all words; increments sfreq once per unique word per sentence
    * (/root/reference/src/vocab_indexer.cc:73-90). */
  def addWords(tokens: Array[String]): Array[Long] = {
    val ids = tokens.map(addWord)
    ids.distinct.foreach(id => sfreqBuf(id.toInt) += 1)
    ids
  }

  def getIndex(tokens: Array[String]): Array[Long] =
    tokens.map(t => form2index.getOrElse(t, VocabUnk))

  def sfreq(id: Long): Int = sfreqBuf(id.toInt)

  /** (form, sfreq) in id order — the serialization image
    * (/root/reference/include/fuzzy/vocab_indexer.hh serializes forms+sfreq). */
  def dump: Array[(String, Int)] = {
    val out = new Array[(String, Int)](sfreqBuf.length)
    form2index.foreach { case (f, id) => out(id.toInt) = (f, sfreqBuf(id.toInt)) }
    out
  }

  /** Rebuild from a `dump` image (ids are positional). */
  def restore(entries: Array[(String, Int)]): Unit = {
    form2index.clear(); sfreqBuf.clear()
    var id = 0
    while (id < entries.length) {
      form2index(entries(id)._1) = id.toLong
      sfreqBuf += entries(id)._2
      id += 1
    }
  }
}

/** Single-node oracle matcher — the exact reference-semantics referee the
  * distributed pipeline is validated against (SURVEY.md §7.2 step 3).
  * Facade mirroring `FuzzyMatch` (/root/reference/include/fuzzy/fuzzy_match.hh). */
final class FuzzyMatcher(pt: Int = PT.default, maxTokensInPattern: Int = 300) {
  private val vocab = new VocabIndexer
  private val index = new SuffixIndex
  private val docsBuf = mutable.ArrayBuffer.empty[Doc]
  private val idsBuf = mutable.ArrayBuffer.empty[String]

  def numSentences: Int = docsBuf.length
  def doc(i: Int): Doc = docsBuf(i)
  def externalId(i: Int): String = idsBuf(i)
  /** The underlying suffix-array index (exposed for benchmarking). */
  def suffixIndex: SuffixIndex = index

  def tokenize(sentence: String): TokSent = Tokenizer.tokenize(sentence, pt)

  /** Dictionary-encode a sentence with this matcher's vocab (unknown → UNK). */
  def encode(sentence: String): Array[Long] = vocab.getIndex(tokenize(sentence).norm)

  /** Index a sentence; empty or overlong normalized forms are dropped like
    * the reference (/root/reference/src/fuzzy_match.cc:213-224,
    * /root/reference/src/suffix_array_index.cc:16). */
  def addTm(id: String, sentence: String): Boolean = {
    val ts = tokenize(sentence)
    if (ts.norm.isEmpty) return false
    if (ts.norm.length > maxTokensInPattern) return false
    val ids = vocab.addWords(ts.norm)
    index.add(ids)
    docsBuf += Doc(ids, ts.real, ts.itoks)
    idsBuf += id
    true
  }

  def sort(): Unit = index.sort()

  /** Re-insert an already-encoded sentence (deserialization path only —
    * vocab must have been restored first so ids stay consistent). */
  private def restoreSentence(
      id: String, ids: Array[Long], reals: Array[String], itoks: Array[String]): Unit = {
    index.add(ids)
    docsBuf += Doc(ids, reals, itoks)
    idsBuf += id
  }

  /** IDF penalty vector A4 (/root/reference/src/fuzzy_match.cc:367-390). */
  def idfPenalty(patternIds: Array[Long], unknownPenalty: Float = 0f): Array[Float] = {
    val n = docsBuf.length.toFloat
    patternIds.map { id =>
      if (id != vocab.VocabUnk) math.log(n / vocab.sfreq(id).toFloat).toFloat
      else unknownPenalty
    }
  }

  def idfMax: Float = math.log(docsBuf.length.toDouble).toFloat

  /** The flagship fuzzy top-k match (reference `FuzzyMatch::match`,
    * /root/reference/src/fuzzy_match.cc:393-412). Returns (score, externalId,
    * sentenceIdx, maxSubseq) ordered as the reference emits them. */
  def matchQuery(sentence: String, params: Matcher.Params): List[MatchResult] = {
    val ts = tokenize(sentence)
    if (ts.norm.isEmpty) return Nil
    val pids = vocab.getIndex(ts.norm)
    val pattern = Doc(pids, ts.real, ts.itoks)
    val (idf, idfM) =
      if (params.vocabIdfPenalty != 0f) (idfPenalty(pids), idfMax) else (null, 0.01f)
    Matcher.matchPattern(index, docsBuf, pattern,
      params.copy(maxTokensInPattern = maxTokensInPattern), idf, idfM)
  }

  /** Best-subsequence retrieval (reference `FuzzyMatch::subsequence`,
    * /root/reference/src/fuzzy_match.cc:250-365). The returned 4th element is
    * the detokenized surface string of the matched pattern span — the
    * reference appends it to the result id (F8, fuzzy_match.cc:341-348). */
  def subsequence(
      sentence: String,
      numberOfMatches: Int,
      noPerfect: Boolean = false,
      minSubseqLength: Int = 3,
      minSubseqRatio: Float = 0.3f,
      idfWeighting: Boolean = false): Option[(MatchResult, Int, Int, String)] = {
    val ts = tokenize(sentence)
    if (ts.norm.isEmpty) return None
    val pids = vocab.getIndex(ts.norm)
    val pattern = Doc(pids, ts.real, ts.itoks)
    val idf = idfPenalty(pids, unknownPenalty = -1f)
    Matcher.subsequence(index, docsBuf, pattern, numberOfMatches, noPerfect,
      minSubseqLength, minSubseqRatio, idfWeighting, idf)
      .map { case (m, pos, len) => (m, pos, len, ts.detokenize(pos, len)) }
  }

  /** All dup-pair decisions at the given params: pair (i, j) is a duplicate
    * iff j ∈ match(i) or i ∈ match(j) with unlimited matches. The referee
    * for the distributed pipeline's recall ≥ 0.99 target. */
  def allDupPairs(params: Matcher.Params): Set[(String, String)] = {
    sort()
    val p = params.copy(numberOfMatches = 0, contrastiveFactor = 0f)
    val pairs = mutable.HashSet.empty[(String, String)]
    var i = 0
    while (i < docsBuf.length) {
      val pattern = docsBuf(i)
      val (idf, idfM) =
        if (p.vocabIdfPenalty != 0f) (idfPenalty(pattern.ids), idfMax) else (null, 0.01f)
      val res = Matcher.matchPattern(index, docsBuf, pattern, p, idf, idfM)
      for (m <- res if m.sIdx != i) {
        val a = idsBuf(i); val b = idsBuf(m.sIdx)
        pairs += (if (a < b) (a, b) else (b, a))
      }
      i += 1
    }
    pairs.toSet
  }

  /** Index introspection — the reference's debug `-a dump` surface
    * (/root/reference/cli/src/FuzzyMatch-cli.cc:461-465) as a summary
    * report: structural stats plus the `topN` highest-document-frequency
    * vocab entries (the sfreq table is what the dump inspects in practice —
    * hot words are the LSH capping candidates). */
  def dumpInfo(topN: Int = 10): String = {
    val lens = docsBuf.map(_.ids.length)
    val suffixes = lens.map(_.toLong).sum
    val maxLen = if (lens.isEmpty) 0 else lens.max
    val avgLen = if (lens.isEmpty) 0.0 else suffixes.toDouble / lens.length
    val top = vocab.dump.zipWithIndex
      .collect { case ((form, sf), id) if id >= 2 && form.nonEmpty => (form, sf) }
      .sortBy { case (form, sf) => (-sf, form) }
      .take(topN)
    val sb = new StringBuilder
    sb ++= s"pt=$pt maxTokensInPattern=$maxTokensInPattern\n"
    sb ++= f"sentences=${docsBuf.length} vocab=${vocab.size} suffixes=$suffixes " +
      f"max_len=$maxLen avg_len=$avgLen%.2f\n"
    top.foreach { case (form, sf) => sb ++= s"SFREQ $sf\t$form\n" }
    sb.result()
  }

  /** Serialize the matcher to a binary file (vocab + sentences + external
    * ids) — the S2/S3 analog of the reference's FMI export/import
    * (/root/reference/src/fuzzy_matcher_binarization.cc:16-51). The suffix
    * array is rebuilt + re-sorted on load, like the reference rebuilds its
    * _sentence_length sidecar. */
  def save(path: String): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      out.writeBytes("GFM1")
      out.writeInt(pt)
      out.writeInt(maxTokensInPattern)
      def writeStr(s: String): Unit = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
      }
      val ventries = vocab.dump
      out.writeInt(ventries.length)
      ventries.foreach { case (f, sf) => writeStr(f); out.writeInt(sf) }
      out.writeInt(docsBuf.length)
      var i = 0
      while (i < docsBuf.length) {
        val d = docsBuf(i)
        writeStr(idsBuf(i))
        out.writeInt(d.ids.length); d.ids.foreach(out.writeLong)
        d.reals.foreach(writeStr)
        out.writeInt(d.itoks.length); d.itoks.foreach(writeStr)
        i += 1
      }
    } finally out.close()
  }
}

object FuzzyMatcher {
  /** Format versions this loader understands. The header is "GFM" + one
    * version character, mirroring the reference's "FMI" + version-char
    * header and its multi-version load path
    * (/root/reference/src/fuzzy_matcher_binarization.cc:17-30,36-40;
    * suffix_array.hxx:56-91 loads both v0 and v1 archives): when the layout
    * next changes, bump `save` to '2' and add the '2' branch here so both
    * generations of index files keep loading. */
  val supportedVersions: Set[Char] = Set('1')

  /** Reload a matcher written by `save`; throws on bad magic or an
    * unsupported version (with a message naming the versions this build
    * reads). */
  def load(path: String): FuzzyMatcher = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      val header = new String(magic, java.nio.charset.StandardCharsets.US_ASCII)
      require(header.startsWith("GFM"), s"$path is not a GFM matcher file (header '$header')")
      val version = header(3)
      require(supportedVersions.contains(version),
        s"$path is GFM version '$version'; this build reads ${supportedVersions.mkString(",")}")
      val pt = in.readInt()
      val maxTok = in.readInt()
      def readStr(): String = {
        val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      }
      val fm = new FuzzyMatcher(pt, maxTok)
      val nv = in.readInt()
      fm.vocab.restore(Array.fill(nv)((readStr(), in.readInt())))
      val nd = in.readInt()
      var i = 0
      while (i < nd) {
        val id = readStr()
        val nIds = in.readInt()
        val ids = Array.fill(nIds)(in.readLong())
        val reals = Array.fill(nIds)(readStr())
        val nIt = in.readInt()
        val itoks = Array.fill(nIt)(readStr())
        fm.restoreSentence(id, ids, reals, itoks)
        i += 1
      }
      fm.sort()
      fm
    } finally in.close()
  }
}

