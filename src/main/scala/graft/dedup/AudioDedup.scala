package graft.dedup

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.util.LongAccumulator
import graft.data.Clip
import graft.kernel.Hashing
import graft.ops.AudioOps

/** Audio-payload near-duplicate channel: finds clips whose AUDIO content
  * matches even when transcripts differ — the payload-side counterpart of
  * the transcript pipeline (the reference has no audio analog; this extends
  * its dup semantics to the clip's binary column).
  *
  * Three stages, mirroring the transcript pipeline's shape so the same
  * scale machinery applies:
  *  1. fingerprint (narrow): decode → per-frame RMS envelope → mean-
  *     normalize (amplitude invariance) → energy-delta sign bits
  *     (Haitsma–Kalker-style) → position-salted chunk hashes, plus a
  *     bounded RMS-normalized PCM head sketch for verification;
  *  2. candidates: chunk-hash bucket join via the shared
  *     [[CandidateStage.bucketJoinPairs]] kernel (hot buckets capped AND
  *     counted; P5-style frame-count window folded into the join);
  *  3. verify: mean-centered Pearson correlation of the PCM head sketches
  *     ≥ `minCorr` (byte-identical dups score 1.0; amplitude-scaled copies
  *     survive the RMS normalization; unrelated content — including
  *     same-pitch tones with independent noise — decorrelates).
  */
object AudioDedup {

  /** Envelope fingerprint of one clip. `chunks` are position-salted hashes
    * of `chunkBits`-wide windows of the envelope delta-sign bit stream (the
    * LSH keys); `head` is the RMS-normalized first `headLen` samples (the
    * bounded verify sketch — NOT the full PCM, so rows stay small no matter
    * the clip duration). */
  final case class AudioFpRow(clip_id: String, n_frames: Int, head: Array[Float], chunks: Array[Long])

  /** Narrow fingerprint pass. `frameMs` defaults small because the synth
    * corpus clips are 10–50 ms; real speech would use 20–30 ms frames. */
  def fingerprints(clips: Dataset[Clip], frameMs: Int = 1,
                   chunkBits: Int = 8, chunkStride: Int = 4,
                   headLen: Int = 512): Dataset[AudioFpRow] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions(_.map { c =>
      val samples = AudioOps.decode(c)
      val frameLen = math.max(1, c.sr_hz * frameMs / 1000)
      val nFrames = math.max(1, (samples.length + frameLen - 1) / frameLen)

      // frame RMS envelope, mean-normalized (amplitude invariance)
      val env = new Array[Double](nFrames)
      var rmsAll = 0.0
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var i = f * frameLen
        val end = math.min(samples.length, i + frameLen)
        val n = math.max(1, end - i)
        while (i < end) { val v = samples(i).toDouble; acc += v * v; i += 1 }
        env(f) = math.sqrt(acc / n)
        rmsAll += acc
        f += 1
      }
      val mean = {
        var s = 0.0; var i = 0
        while (i < nFrames) { s += env(i); i += 1 }
        math.max(s / nFrames, 1e-9)
      }
      // delta-sign bit stream: bit j = [env(j+1) > env(j)] (scale-free)
      val nBits = math.max(0, nFrames - 1)
      val bits = new Array[Boolean](nBits)
      var j = 0
      while (j < nBits) { bits(j) = env(j + 1) > env(j); j += 1 }

      // overlapping position-salted chunk hashes; clips too short for one
      // full chunk get a single whole-stream hash so they still bucket
      val chunks =
        if (nBits < chunkBits) Array(chunkKey(0, packBits(bits, 0, nBits) | (1L << 62)))
        else {
          val out = new scala.collection.mutable.ArrayBuffer[Long]
          var s = 0
          while (s + chunkBits <= nBits) {
            out += chunkKey(s / chunkStride, packBits(bits, s, chunkBits))
            s += chunkStride
          }
          out.distinct.toArray
        }

      // bounded verify sketch: RMS-normalized head samples
      val rms = math.max(math.sqrt(rmsAll / math.max(1, samples.length)), 1e-9)
      val hl = math.min(headLen, samples.length)
      val head = new Array[Float](hl)
      var i = 0
      while (i < hl) { head(i) = (samples(i) / rms).toFloat; i += 1 }

      AudioFpRow(c.clip_id, nFrames, head, chunks)
    })
  }

  @inline private def packBits(bits: Array[Boolean], start: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { if (bits(start + i)) v |= (1L << i); i += 1 }
    v
  }

  @inline private def chunkKey(pos: Int, packed: Long): Long =
    Hashing.mix64(packed ^ (pos.toLong * 0x9e3779b97f4a7c15L))

  /** Candidate pairs + correlation verify. Emits Edge(kind="audio") with
    * `score` = mean-centered Pearson correlation of the head sketches. */
  def pairs(fps: Dataset[AudioFpRow], minCorr: Double = 0.98,
            frameWindow: Double = 0.2, bucketCap: Int = 512,
            cappedBuckets: LongAccumulator): Dataset[Edge] = {
    val spark = fps.sparkSession
    import spark.implicits._

    val entries = fps.flatMap { f =>
      val mx = (f.n_frames * (1.0 + frameWindow)).toInt
      f.chunks.iterator.map(h => CandidateStage.BucketEntry(h, f.clip_id, f.n_frames, mx))
    }
    val cands = CandidateStage
      .bucketJoinPairs(entries, bucketCap, cappedBuckets, None)
      .dropDuplicates("p", "c").as[CandPair]

    val a = fps.select(col("clip_id").as("p"), col("head").as("a_head"))
    val b = fps.select(col("clip_id").as("c"), col("head").as("b_head"))
    cands.join(a, "p").join(b, "c")
      // join-key columns lead: (c, p, a_head, b_head)
      .as[(String, String, Array[Float], Array[Float])]
      .map { case (c, p, aHead, bHead) =>
        Edge(p, c, pearson(aHead, bHead), 0, "audio")
      }
      .filter(_.score >= minCorr)
  }

  /** Mean-centered Pearson correlation over the overlapping prefix. Flat
    * (zero-variance) signals only match flat signals — constant-envelope
    * content cannot saturate the score the way raw cosine would. */
  def pearson(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var ma = 0.0; var mb = 0.0
    var i = 0
    while (i < n) { ma += a(i); mb += b(i); i += 1 }
    ma /= n; mb /= n
    var dot = 0.0; var va = 0.0; var vb = 0.0
    i = 0
    while (i < n) {
      val x = a(i) - ma; val y = b(i) - mb
      dot += x * y; va += x * x; vb += y * y
      i += 1
    }
    if (va < 1e-12 || vb < 1e-12) { if (va < 1e-12 && vb < 1e-12) 1.0 else 0.0 }
    else dot / math.sqrt(va * vb)
  }

  /** Convenience: full channel over a clip table. */
  def apply(clips: Dataset[Clip], minCorr: Double = 0.98): Dataset[Edge] = {
    val acc = clips.sparkSession.sparkContext.longAccumulator("audioCappedBuckets")
    pairs(fingerprints(clips), minCorr = minCorr, cappedBuckets = acc)
  }
}
