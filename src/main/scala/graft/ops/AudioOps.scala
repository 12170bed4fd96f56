package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.data.{AudioPcm, Clip}

/** Multimodal (binary-column) operators: audio treated as an opaque
  * `binary` payload with typed metadata, processed batch-wise in
  * mapPartitions kernels. Decode is REAL for `pcm_s16le` WAV (pure JVM);
  * compressed codecs are stubbed behind a deterministic fake (no codec
  * libraries in this environment) — the Spark-side plumbing (schema,
  * partitioning, batch shape) is real and tested either way. */
object AudioOps {

  final case class AudioMeta(
      clip_id: String,
      channels: Int,
      sr_hz: Int,
      bits: Int,
      n_samples: Int,
      dur_ms: Int,
      header_ok: Boolean)

  final case class FrameFeatures(
      clip_id: String,
      frame_ms: Int,
      rms: Array[Float],
      peak: Float)

  /** Parse RIFF/WAVE headers into typed metadata (no decode). */
  def extractMeta(clips: Dataset[Clip]): Dataset[AudioMeta] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions(_.map { c =>
      val b = c.bytes
      def le16(o: Int) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8))
      def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      val ok = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
      if (!ok) AudioMeta(c.clip_id, 0, 0, 0, 0, 0, header_ok = false)
      else {
        val channels = le16(22)
        val sr = le32(24)
        val bits = le16(34)
        val dataLen = le32(40)
        val nSamples = if (bits > 0 && channels > 0) dataLen / (bits / 8) / channels else 0
        val durMs = if (sr > 0) (nSamples.toLong * 1000L / sr).toInt else 0
        AudioMeta(c.clip_id, channels, sr, bits, nSamples, durMs, header_ok = true)
      }
    })
  }

  /** Decode samples. Real for pcm_s16le; other codecs get a deterministic
    * fake decode (STUB — no codec libs in this sandbox; swap in a real
    * decoder bound here). */
  def decode(c: Clip): Array[Short] =
    if (c.codec == "pcm_s16le" && c.bytes.length >= 44) AudioPcm.decodePcm(c.bytes)
    else stubDecode(c)

  /** STUB decode for compressed codecs: deterministic pseudo-samples from
    * the payload hash — placeholder for an opus/mp3/flac decoder. */
  private def stubDecode(c: Clip): Array[Short] = {
    val n = math.max(1, c.dur_ms) * c.sr_hz / 1000
    val seed = graft.kernel.Hashing.fnv1a64(c.clip_id)
    val out = new Array[Short](math.max(n, 1))
    var h = seed
    var i = 0
    while (i < out.length) {
      h = graft.kernel.Hashing.mix64(h)
      out(i) = (h & 0x7fff).toShort
      i += 1
    }
    out
  }

  /** Per-frame RMS energy + global peak — the feature-extraction template
    * (decode → window → reduce) with real batch shape. */
  def frameEnergy(clips: Dataset[Clip], frameMs: Int = 25): Dataset[FrameFeatures] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions(_.map { c =>
      val samples = decode(c)
      val frameLen = math.max(1, c.sr_hz * frameMs / 1000)
      val nFrames = math.max(1, (samples.length + frameLen - 1) / frameLen)
      val rms = new Array[Float](nFrames)
      var peak = 0f
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var i = f * frameLen
        val end = math.min(samples.length, i + frameLen)
        val n = math.max(1, end - i)
        while (i < end) {
          val v = samples(i).toDouble
          acc += v * v
          val a = math.abs(samples(i).toInt)
          if (a > peak) peak = a.toFloat
          i += 1
        }
        rms(f) = math.sqrt(acc / n).toFloat
        f += 1
      }
      FrameFeatures(c.clip_id, frameMs, rms, peak)
    })
  }

  /** Decimating resample (the "resize" analog): keep every `factor`-th
    * sample, re-encode as WAV. Pass-through for non-PCM codecs. */
  def downsample(clips: Dataset[Clip], factor: Int): Dataset[Clip] = {
    val spark = clips.sparkSession
    import spark.implicits._
    require(factor >= 1)
    clips.mapPartitions(_.map { c =>
      if (c.codec != "pcm_s16le" || c.bytes.length < 44 || factor == 1) c
      else {
        val in = AudioPcm.decodePcm(c.bytes)
        val nOut = (in.length + factor - 1) / factor
        val srOut = math.max(1, c.sr_hz / factor)
        val buf = java.nio.ByteBuffer.allocate(nOut * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < in.length) { buf.putShort(in(i)); i += factor }
        val wav = wavWrap(buf.array(), srOut)
        c.copy(bytes = wav, sr_hz = srOut,
          dur_ms = (nOut.toLong * 1000L / math.max(1, srOut)).toInt)
      }
    })
  }

  private[graft] def wavWrap(pcm: Array[Byte], srHz: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(srHz).putInt(srHz * 2)
      .putShort(2).putShort(16).put("data".getBytes("US-ASCII"))
      .putInt(pcm.length).put(pcm)
    buf.array()
  }

  /** Rows-only driver queries over a synthesized clip table. */
  def qAudioMeta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(PipelineQueries.documentsAsClips(spark, dir)).toDF()

  def qAudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameEnergy(PipelineQueries.documentsAsClips(spark, dir))
      .map(f => (f.clip_id, f.frame_ms, f.rms.length, f.peak))
      .toDF("clip_id", "frame_ms", "n_frames", "peak")
  }
}
