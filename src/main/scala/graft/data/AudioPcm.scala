package graft.data

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic 16-bit PCM WAV synthesis + decode.
  *
  * The pipeline NEVER touches audio bytes (pass-through column, per the
  * input contract's decoded-PCM invariant); this exists to synthesize test
  * fixtures and to verify the invariant (SNR ≥ 30 dB — exact, since bytes
  * are never re-encoded).
  */
object AudioPcm {
  /** Seeded sine+noise mono WAV, RIFF/PCM s16le. */
  def synthWav(seed: Long, nSamples: Int, srHz: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)            // fmt chunk size
    buf.putShort(1)           // PCM
    buf.putShort(1)           // mono
    buf.putInt(srHz)
    buf.putInt(srHz * 2)      // byte rate
    buf.putShort(2)           // block align
    buf.putShort(16)          // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    val rng = new java.util.Random(seed)
    val freq = 100.0 + (math.abs(seed) % 900)
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble / srHz
      val s = 0.6 * math.sin(2 * math.Pi * freq * t) + 0.1 * rng.nextGaussian()
      buf.putShort(math.max(-32768, math.min(32767, (s * 20000).toInt)).toShort)
      i += 1
    }
    buf.array()
  }

  /** Decode a PCM s16le WAV produced by synthWav (or any canonical 44-byte
    * header RIFF) back to samples. */
  def decodePcm(wav: Array[Byte]): Array[Short] = {
    val buf = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    require(wav.length >= 44, "not a WAV")
    val n = (wav.length - 44) / 2
    val out = new Array[Short](n)
    buf.position(44)
    var i = 0
    while (i < n) { out(i) = buf.getShort(); i += 1 }
    out
  }

  /** Signal-to-noise ratio in dB of `got` vs reference `ref`. */
  def snrDb(ref: Array[Short], got: Array[Short]): Double = {
    if (ref.length != got.length) return Double.NegativeInfinity
    var sig = 0.0; var noise = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - got(i).toDouble
      sig += r * r; noise += d * d
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / noise)
  }
}
