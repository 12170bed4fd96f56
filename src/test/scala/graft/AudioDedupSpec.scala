package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{AudioPcm, Clip}
import graft.dedup.AudioDedup

/** Audio-payload near-dup channel: exact pair-set on planted duplicate
  * groups, amplitude invariance, rejection of unrelated content, and the
  * capped-bucket accountability contract. */
class AudioDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("audio-dedup-spec")
    .getOrCreate()

  private def norm(a: String, b: String) = if (a < b) (a, b) else (b, a)

  /** Clip with audio from `seed` (seeds chosen so synthWav tone frequencies
    * never collide across groups — distinct |seed| % 900). */
  private def clip(id: String, seed: Long, nSamples: Int): Clip =
    Clip(id, AudioPcm.synthWav(seed, nSamples, 16000), 16000,
      (nSamples * 1000L / 16000).toInt, "pcm_s16le", s"transcript $id")

  test("planted duplicate groups: emitted pair set is exactly the within-group pairs") {
    import spark.implicits._
    // 40 groups × 4 members sharing identical audio; freq distinct per group
    val clips = (0 until 160).map { i =>
      val g = i / 4
      clip(f"c_$i%04d", seed = g.toLong * 7L, nSamples = 320 + 13 * g)
    }
    val got = AudioDedup(clips.toDS()).collect().map(e => norm(e.a, e.b)).toSet
    val want = (for {
      g <- 0 until 40; i <- 0 until 4; j <- i + 1 until 4
    } yield norm(f"c_${g * 4 + i}%04d", f"c_${g * 4 + j}%04d")).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.forall { case (a, b) => a != b })
  }

  test("amplitude-scaled copy is detected (envelope/head normalization)") {
    import spark.implicits._
    val base = clip("orig", seed = 3L, nSamples = 480)
    val scaled = {
      val s = AudioPcm.decodePcm(base.bytes)
      val buf = java.nio.ByteBuffer.allocate(s.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      s.foreach(v => buf.putShort((v / 2).toShort))
      base.copy(clip_id = "half", bytes = graft.ops.AudioOps.wavWrap(buf.array(), 16000))
    }
    val others = (10 until 20).map(i => clip(s"bg_$i", seed = i.toLong * 11L, nSamples = 480))
    val got = AudioDedup((others :+ base :+ scaled).toDS())
      .collect().map(e => norm(e.a, e.b)).toSet
    assert(got.contains(("half", "orig")), s"scaled copy not found; got $got")
  }

  test("unrelated clips (distinct tones) emit no pairs") {
    import spark.implicits._
    val clips = (0 until 100).map(i => clip(s"u_$i", seed = i.toLong * 11L + 5L, nSamples = 400))
    val got = AudioDedup(clips.toDS()).collect()
    assert(got.isEmpty, s"${got.length} false pairs, e.g. ${got.take(3).mkString(",")}")
  }

  test("hot fingerprint buckets are capped AND counted, never silent") {
    import spark.implicits._
    // identical audio everywhere → every chunk bucket is hot at cap 2
    val clips = (0 until 32).map(i => clip(s"h_$i", seed = 1L, nSamples = 320))
    val acc = spark.sparkContext.longAccumulator("cap-test")
    val edges = AudioDedup.pairs(
      AudioDedup.fingerprints(clips.toDS()), bucketCap = 2, cappedBuckets = acc)
    edges.count()
    assert(acc.value > 0, "cap=2 never triggered on 32 identical clips — cap machinery dead")
  }

  test("multimodal pipeline: same-audio/different-transcript clips cluster only with the audio channel on") {
    import spark.implicits._
    import graft.dedup.{DedupConfig, DedupPipeline}
    // x/y share AUDIO but have unrelated transcripts; others are noise
    val shared = graft.data.AudioPcm.synthWav(99L, 480, 16000)
    val base = (0 until 20).map(i => clip(s"n_$i", seed = 100L + i * 11L, nSamples = 480))
    val x = Clip("x", shared, 16000, 30, "pcm_s16le", "completely different words here")
    val y = Clip("y", shared, 16000, 30, "pcm_s16le", "unrelated sentence about other topics")
    val clips = (base :+ x :+ y).toDS()

    val off = DedupPipeline.run(clips, DedupConfig(strategy = "shuffle"))
      .clusters.collect().map(r => r.clip_id -> r.cluster_id).toMap
    assert(off("x") != off("y"), "transcript-only run must NOT merge x and y")

    val on = DedupPipeline.run(clips, DedupConfig(strategy = "shuffle", useAudioChannel = true))
    assert(on.clusters.collect().map(r => r.clip_id -> r.cluster_id).toMap.apply("x") ==
      on.clusters.collect().map(r => r.clip_id -> r.cluster_id).toMap.apply("y"),
      "audio channel must merge x and y")
    val audioEdges = on.edges.collect().filter(_.kind == "audio")
    assert(audioEdges.nonEmpty && audioEdges.forall(e => Set(e.a, e.b) == Set("x", "y")),
      s"expected only the (x,y) audio edge, got ${audioEdges.take(5).mkString(",")}")
  }

  test("pearson: identical 1.0, scaled 1.0, flat never matches (not even flat)") {
    val a = Array(1f, 2f, 3f, 2f, 1f, 0f)
    assert(math.abs(AudioDedup.pearson(a, a) - 1.0) < 1e-9)
    assert(math.abs(AudioDedup.pearson(a, a.map(_ * 0.5f)) - 1.0) < 1e-9)
    val flat = Array.fill(6)(2f)
    assert(AudioDedup.pearson(a, flat) == 0.0)
    // silence/constant carries no identifying content — flat-vs-flat is NOT
    // a match (two silent-headed clips must not merge on head correlation)
    assert(AudioDedup.pearson(flat, flat.map(_ * 3f)) == 0.0)
  }

  test("envAgree: identical/scaled envelopes pass, divergent shapes fail, flat-vs-flat defers") {
    val shaped = Array.tabulate(64)(i => 0.5f + i / 32f) // rising ramp
    assert(AudioDedup.envAgree(shaped, shaped))
    assert(AudioDedup.envAgree(shaped, shaped.map(x => x))) // copy
    val reversed = shaped.reverse // falling ramp: pearson −1
    assert(!AudioDedup.envAgree(shaped, reversed))
    val flat = Array.fill(64)(1f)
    assert(AudioDedup.envAgree(flat, flat)) // defers to head correlation
    assert(!AudioDedup.envAgree(flat, shaped)) // flat vs structured: fail
  }

  /** `base` with `pre` samples prepended and `post` appended, each filled by
    * `fill` (0 = digital silence). */
  private def padded(base: Clip, id: String, pre: Int, post: Int,
                     fill: Int => Short = _ => 0: Short): Clip = {
    val s = AudioPcm.decodePcm(base.bytes)
    val all = Array.tabulate(pre)(fill) ++ s ++ Array.tabulate(post)(i => fill(pre + s.length + i))
    val buf = java.nio.ByteBuffer.allocate(all.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    all.foreach(buf.putShort)
    base.copy(clip_id = id, bytes = graft.ops.AudioOps.wavWrap(buf.array(), base.sr_hz),
      dur_ms = (all.length * 1000L / base.sr_hz).toInt)
  }

  test("silence-trimmed/padded copies fingerprint IDENTICALLY to the original") {
    import spark.implicits._
    val base = clip("orig", seed = 17L, nSamples = 480)
    // pad lengths deliberately NOT multiples of the 16-sample frame — the
    // active-region crop is sample-accurate, so the frame grid realigns
    val variants = Seq(padded(base, "lead", 137, 0), padded(base, "trail", 0, 211),
      padded(base, "both", 53, 97))
    val fps = AudioDedup.fingerprints((base +: variants).toDS())
      .collect().map(f => f.clip_id -> f).toMap
    val o = fps("orig")
    for (v <- variants.map(_.clip_id)) {
      assert(fps(v).n_frames == o.n_frames, s"$v: active frame count differs")
      assert(fps(v).chunks.sorted.sameElements(o.chunks.sorted), s"$v: chunk set differs")
      assert(fps(v).head.sameElements(o.head), s"$v: head sketch differs")
      assert(fps(v).env.sameElements(o.env), s"$v: envelope sketch differs")
    }
  }

  test("re-segmented copies (silence and sub-threshold noise pads) pair with the original") {
    import spark.implicits._
    val base = clip("orig", seed = 29L, nSamples = 480)
    // noise pad stays under the 2%-of-peak active threshold (peak ~2000 at
    // this synth amplitude; |noise| ≤ 11 ≪ 2% of peak)
    val noisy = padded(base, "noisepad", 119, 73,
      fill = i => ((i * 2654435761L >>> 40) % 23 - 11).toShort)
    val clips = Seq(base, padded(base, "lead", 137, 0), padded(base, "trail", 0, 211), noisy) ++
      (40 until 52).map(i => clip(s"bg_$i", seed = i.toLong * 11L + 3L, nSamples = 480))
    val got = AudioDedup(clips.toDS()).collect().map(e => norm(e.a, e.b)).toSet
    val dups = Set("orig", "lead", "trail", "noisepad")
    val want = (for { a <- dups; b <- dups if a < b } yield (a, b)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("shared loud intro with divergent bodies does NOT pair (envelope gate)") {
    import spark.implicits._
    // two clips: identical first 512 samples, then one goes near-silent while
    // the other stays loud — head correlation is 1.0 but the whole-clip
    // envelope shapes diverge, so the envelope gate must reject the pair
    val intro = AudioPcm.decodePcm(AudioPcm.synthWav(21L, 512, 16000))
    def wrap(tail: Array[Short], id: String, transcript: String): Clip = {
      val all = intro ++ tail
      val buf = java.nio.ByteBuffer.allocate(all.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      all.foreach(buf.putShort)
      Clip(id, graft.ops.AudioOps.wavWrap(buf.array(), 16000), 16000,
        (all.length * 1000L / 16000).toInt, "pcm_s16le", transcript)
    }
    val loudTail = AudioPcm.decodePcm(AudioPcm.synthWav(22L, 1536, 16000))
    val quietTail = loudTail.map(v => (v / 64).toShort)
    val x = wrap(loudTail, "intro_loud", "t1")
    val y = wrap(quietTail, "intro_quiet", "t2")
    val got = AudioDedup(Seq(x, y).toDS()).collect()
    assert(got.isEmpty, s"shared-intro pair leaked through the envelope gate: ${got.mkString(",")}")
  }
}
