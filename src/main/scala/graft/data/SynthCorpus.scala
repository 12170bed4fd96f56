package graft.data

import org.apache.spark.sql.{Dataset, SparkSession}

/** The input-contract row shape: an audio clip + transcript pair. */
final case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

/** Deterministic synthetic clip corpus with injected near-duplicate classes
  * mirroring the reference golden corpus's variant classes
  * (/root/reference/test/data/tm1:1-8 and the expectations in test-tm1):
  * exact dup, token replacement, case edit, number edit, punctuation
  * attach/detach, tag insertion, containment. Ground truth comes from the
  * single-node oracle matcher, not labels. Seeded and partition-order
  * independent: row i is a pure function of (seed, i).
  */
object SynthCorpus {
  final val VariantsPerBase = 8

  /** Zipf-distributed vocabulary (8k types, alpha ≈ 1.1) approximating a
    * real speech-transcript distribution: a handful of very hot function
    * words, a long tail of content words. A tiny flat vocab would make every
    * 3-shingle hot and blow candidate generation up quadratically — realistic
    * skew is exactly what the shingle-df cap + MinHash fallback are sized for. */
  private val VocabSize = 8192
  private val vocab: Array[String] = {
    val common = Array("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")
    // letter-only unique words (digits would split under the aggressive
    // tokenizer and collapse the vocabulary to ("w", ｟num｠) bigrams)
    common ++ (common.length until VocabSize).map { i =>
      var v = i + 26 * 26 * 26 // ≥ 4 letters, unique per index
      val sb = new StringBuilder
      while (v > 0) { sb.insert(0, ('a' + v % 26).toChar); v /= 26 }
      sb.toString
    }
  }
  private val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 2.0, 1.1))
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i); cum(i) = acc; i += 1 }
    val total = acc
    i = 0
    while (i < VocabSize) { cum(i) /= total; i += 1 }
    cum
  }
  @inline private def zipfWord(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    var lo = 0; var hi = VocabSize - 1
    while (lo < hi) { val mid = (lo + hi) >>> 1; if (zipfCum(mid) < u) lo = mid + 1 else hi = mid }
    vocab(lo)
  }

  @inline private def rngFor(seed: Long, salt: Long): java.util.Random =
    new java.util.Random(graft.kernel.Hashing.mix64(seed ^ (salt * 0x9e3779b97f4a7c15L)))

  private def baseSentence(seed: Long, baseIdx: Long): Array[String] = {
    val rng = rngFor(seed, baseIdx * 1000003L)
    val n = 4 + rng.nextInt(28)
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = zipfWord(rng); i += 1 }
    // guarantee a number token somewhere in the middle
    toks(n / 2) = (1 + rng.nextInt(9999)).toString
    toks
  }

  /** Pure row generator: variant classes 0=base, 1=exact dup, 2=token
    * replacement, 3=case edit, 4=number edit, 5=punct attach, 6=tag insert,
    * 7=containment (prefix). */
  def clipForId(id: Long, seed: Long): Clip = {
    val baseIdx = id / VariantsPerBase
    val variant = (id % VariantsPerBase).toInt
    val base = baseSentence(seed, baseIdx)
    val rng = rngFor(seed, id * 7919L + 13L)
    val toks = base.clone()
    val transcript: String = variant match {
      case 0 => toks.mkString(" ")
      case 1 => toks.mkString(" ") // exact dup
      case 2 => // replace one non-number token
        val i = rng.nextInt(toks.length)
        toks(i) = vocab(rng.nextInt(vocab.length))
        toks.mkString(" ")
      case 3 => // case edit
        val i = rng.nextInt(toks.length)
        toks(i) = toks(i).capitalize
        toks.mkString(" ")
      case 4 => // number edit
        val i = toks.indexWhere(t => t.nonEmpty && Character.isDigit(t.charAt(0)))
        if (i >= 0) toks(i) = (1 + rng.nextInt(9999)).toString
        toks.mkString(" ")
      case 5 => // punctuation attach (no space)
        toks.mkString(" ") + "."
      case 6 => // tag insertion
        val i = 1 + rng.nextInt(math.max(1, toks.length - 1))
        (toks.take(i) :+ "｟it｠").++(toks.drop(i)).mkString(" ")
      case _ => // containment: leading half (≥3 tokens), else fresh sentence
        if (toks.length >= 6) toks.take(toks.length / 2).mkString(" ")
        else baseSentence(seed, baseIdx * 131 + 17).mkString(" ")
    }
    // exact dups share the base's audio bytes; everything else is fresh
    val audioSalt = if (variant == 1) baseIdx * VariantsPerBase else id
    val srHz = 16000
    val nSamples = 160 + rngFor(seed, audioSalt + 571L).nextInt(640)
    val bytes = AudioPcm.synthWav(seed ^ audioSalt, nSamples, srHz)
    Clip(
      clip_id = f"clip_$id%010d",
      bytes = bytes,
      sr_hz = srHz,
      dur_ms = (nSamples * 1000L / srHz).toInt,
      codec = "pcm_s16le",
      transcript = transcript)
  }

  /** Distributed generation: row i is a pure function of (seed, i), so the
    * table is identical at any parallelism. `firstId` offsets the id range —
    * `generate(n) ∪ generate(m, firstId = n)` equals `generate(n + m)` row
    * for row, which is how the CLI synthesizes non-colliding increment
    * batches for [[graft.dedup.IncrementalDedup]]. */
  def generate(spark: SparkSession, nRows: Long, seed: Long = 42L,
               partitions: Int = 32, firstId: Long = 0L): Dataset[Clip] = {
    import spark.implicits._
    spark.range(firstId, firstId + nRows, 1, partitions)
      .mapPartitions(_.map(clipForId(_, seed)))
  }

  /** Transcript-only local generation for oracle-side tests. */
  def transcripts(nRows: Int, seed: Long = 42L): IndexedSeq[(String, String)] =
    (0 until nRows).map { i =>
      val c = clipForId(i.toLong, seed)
      (c.clip_id, c.transcript)
    }
}
