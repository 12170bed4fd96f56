package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{AudioPcm, Clip}
import graft.dedup.AudioContainment
import graft.kernel.Hashing

/** Audio containment retrieval (the audio analog of the reference's J4
  * subsequence probe): planted shorter-inside-longer excerpts with the
  * exact voted offset, amplitude/trim invariance composition, the
  * equal-length dup degenerate case, rejection of unrelated content, the
  * capped-bucket contract, and the documented envelope-prefix verify
  * bound. */
class AudioContainmentSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("audio-containment-spec")
    .getOrCreate()

  /** Structured deterministic audio: positive samples in [500, 2000), so
    * the active region is the full clip (threshold 2% of peak < 500) and
    * the RMS envelope varies frame to frame (informative delta bits). */
  private def structured(seed: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (500 + (Hashing.mix64(seed * 1000003L + i) >>> 40) % 1500).toShort)

  private def wrap(id: String, samples: Array[Short]): Clip = {
    val buf = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    Clip(id, graft.ops.AudioOps.wavWrap(buf.array(), 16000), 16000,
      (samples.length * 1000L / 16000).toInt, "pcm_s16le", s"transcript $id")
  }

  // frameLen = 16 samples at sr 16000 / frameMs 1 (the fingerprint default)
  private val FL = 16

  test("planted excerpts are found at the exact frame offset; variants pair as dups") {
    import spark.implicits._
    // 8 structured outers of 150 frames; for 3 of them plant an 80-frame
    // excerpt at frame 30 (frame-aligned cut), plus an amplitude-halved
    // and a silence-padded variant of excerpt 0
    val outers = (0 until 8).map(g => g -> structured(seed = 100 + g, n = 150 * FL)).toMap
    val clips = scala.collection.mutable.ArrayBuffer.empty[Clip]
    outers.foreach { case (g, s) => clips += wrap(s"out_$g", s) }
    val excerpt = (0 until 3).map { g =>
      val ex = outers(g).slice(30 * FL, 110 * FL)
      clips += wrap(s"in_$g", ex)
      g -> ex
    }.toMap
    clips += wrap("in_0_half", excerpt(0).map(v => (v / 2).toShort))
    clips += {
      val ex = excerpt(0)
      val padded = new Array[Short](97) ++ ex ++ new Array[Short](41)
      wrap("in_0_pad", padded)
    }

    val got = AudioContainment(clips.toSeq.toDS())
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val dupTriple = Seq("in_0", "in_0_half", "in_0_pad")
    val want =
      (0 until 3).map(g => (s"in_$g", s"out_$g", 30)).toSet ++
        // in_0's variants are excerpts of out_0 too...
        Set(("in_0_half", "out_0", 30), ("in_0_pad", "out_0", 30)) ++
        // ...and equal-length dups of each other (offset 0)
        (for { a <- dupTriple; b <- dupTriple if a < b } yield (a, b, 0)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("excerpt correlations are ~1.0 and survive amplitude scaling") {
    import spark.implicits._
    val outer = structured(7L, 150 * FL)
    val clips = Seq(wrap("out", outer), wrap("in", outer.slice(30 * FL, 110 * FL)),
      wrap("in_half", outer.slice(30 * FL, 110 * FL).map(v => (v / 2).toShort)))
    val got = AudioContainment(clips.toDS())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got.keySet == Set("in" -> "out", "in_half" -> "out", "in" -> "in_half"))
    got.values.foreach(c => assert(c >= 0.99, s"low corr: $got"))
  }

  test("equal-length tone dup groups reduce to the dup channel's pair set (stream-hash path)") {
    import spark.implicits._
    // short tone clips (20-30 frames < 32-bit chunk width): only the
    // whole-stream content hash can bucket them
    val clips = (0 until 40).map { i =>
      val g = i / 4
      Clip(f"c_$i%02d", AudioPcm.synthWav(g.toLong * 7L, 320 + 13 * g, 16000), 16000,
        ((320 + 13 * g) * 1000L / 16000).toInt, "pcm_s16le", s"t $i")
    }
    val got = AudioContainment(clips.toDS())
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for { g <- 0 until 10; i <- 0 until 4; j <- i + 1 until 4 }
      yield (f"c_${g * 4 + i}%02d", f"c_${g * 4 + j}%02d", 0)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("unrelated structured clips emit no pairs") {
    import spark.implicits._
    val clips = (0 until 20).map(i => wrap(s"u_$i", structured(5000 + i, (100 + 7 * i) * FL)))
    val got = AudioContainment(clips.toDS()).collect()
    assert(got.isEmpty, s"${got.length} false pairs, e.g. ${got.take(3).mkString(",")}")
  }

  test("hot chunk buckets are capped AND counted, never silent") {
    import spark.implicits._
    val s = structured(9L, 100 * FL)
    val clips = (0 until 24).map(i => wrap(s"h_$i", s))
    val acc = spark.sparkContext.longAccumulator("ct-cap-test")
    AudioContainment.pairs(AudioContainment.fingerprints(clips.toDS()),
      bucketCap = 2, cappedBuckets = acc).count()
    assert(acc.value > 0, "cap=2 never triggered on 24 identical clips — cap machinery dead")
  }

  test("pipeline channel: an excerpt joins its recording's cluster only when enabled") {
    import spark.implicits._
    import graft.dedup.{DedupConfig, DedupPipeline}
    val rec = structured(31L, 150 * FL)
    val x = wrap("recording", rec).copy(transcript = "a long recording about many things")
    val y = wrap("excerpt", rec.slice(30 * FL, 110 * FL))
      .copy(transcript = "totally unrelated words entirely")
    val noise = (0 until 12).map(i => wrap(s"n_$i", structured(7000 + i, 120 * FL))
      .copy(transcript = s"noise transcript number $i with filler words"))
    val clips = (noise :+ x :+ y).toDS()

    val off = DedupPipeline.run(clips, DedupConfig(strategy = "shuffle"))
      .clusters.collect().map(r => r.clip_id -> r.cluster_id).toMap
    assert(off("recording") != off("excerpt"), "containment off must NOT merge")

    val on = DedupPipeline.run(clips,
      DedupConfig(strategy = "shuffle", useAudioContainment = true))
    val cl = on.clusters.collect().map(r => r.clip_id -> r.cluster_id).toMap
    assert(cl("recording") == cl("excerpt"), "containment channel must merge excerpt+recording")
    val ctEdges = on.edges.collect().filter(_.kind == "audio_contain")
    assert(ctEdges.nonEmpty &&
      ctEdges.forall(e => Set(e.a, e.b) == Set("excerpt", "recording")),
      s"expected only the (excerpt, recording) containment edge, got ${ctEdges.take(5).mkString(",")}")
  }

  test("containment beyond the stored envelope prefix is dropped (documented verify bound)") {
    import spark.implicits._
    val outer = structured(11L, 150 * FL)
    val clips = Seq(wrap("out", outer), wrap("in", outer.slice(30 * FL, 110 * FL)))
    def run(maxEnv: Int): Set[(String, String)] = {
      val acc = spark.sparkContext.longAccumulator("ct-bound-test")
      AudioContainment.pairs(
        AudioContainment.fingerprints(clips.toDS(), maxEnvFrames = maxEnv),
        cappedBuckets = acc)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(run(2048) == Set("in" -> "out"))
    // offset 30 + 64-frame inner prefix > 64 stored outer frames ⇒ unverifiable
    assert(run(64).isEmpty)
  }
}
