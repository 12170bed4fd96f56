package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{AudioPcm, SynthCorpus}
import graft.dedup.DedupPipeline
import graft.ops.AudioOps

class AudioOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("audio-spec"), 4)
    .getOrCreate()

  test("WAV metadata extraction recovers the synthesized header fields") {
    import spark.implicits._
    val clips = SynthCorpus.generate(spark, 16).collect()
    val metas = AudioOps.extractMeta(SynthCorpus.generate(spark, 16))
      .collect().map(m => m.clip_id -> m).toMap
    clips.foreach { c =>
      val m = metas(c.clip_id)
      assert(m.header_ok && m.channels == 1 && m.bits == 16)
      assert(m.sr_hz == c.sr_hz)
      assert(m.dur_ms == c.dur_ms)
      assert(m.n_samples == (c.bytes.length - 44) / 2)
    }
  }

  test("frame energy matches a local decode-and-reduce") {
    import spark.implicits._
    val one = SynthCorpus.generate(spark, 1)
    val f = AudioOps.frameEnergy(one, frameMs = 25).head()
    val c = SynthCorpus.clipForId(0L, 42L)
    val samples = AudioPcm.decodePcm(c.bytes)
    val frameLen = c.sr_hz * 25 / 1000
    assert(f.rms.length == (samples.length + frameLen - 1) / frameLen)
    val localRms0 = math.sqrt(
      samples.take(frameLen).map(s => s.toDouble * s).sum / math.min(frameLen, samples.length)).toFloat
    assert(math.abs(f.rms(0) - localRms0) < 1e-3)
    assert(f.peak == samples.map(s => math.abs(s.toInt)).max.toFloat)
  }

  test("downsample halves the sample rate and keeps decodable WAV bytes") {
    import spark.implicits._
    val out = AudioOps.downsample(SynthCorpus.generate(spark, 4), 2).collect()
    val orig = (0 until 4).map(i => SynthCorpus.clipForId(i.toLong, 42L))
    out.sortBy(_.clip_id).zip(orig).foreach { case (d, o) =>
      assert(d.sr_hz == o.sr_hz / 2)
      val inS = AudioPcm.decodePcm(o.bytes)
      val outS = AudioPcm.decodePcm(d.bytes)
      assert(outS.length == (inS.length + 1) / 2)
      assert(outS.zipWithIndex.forall { case (s, i) => s == inS(i * 2) })
    }
  }

  test("stub decode path is deterministic for non-PCM codecs") {
    val c = graft.data.Clip("x", Array[Byte](1, 2, 3), 16000, 10, "opus", "hello")
    val a = AudioOps.decode(c)
    val b = AudioOps.decode(c)
    assert(a.length == 160 && a.sameElements(b))
  }
}
