package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{AudioPcm, SynthCorpus}
import graft.dedup._

/** The dedup OUTPUT contract: exactly one survivor per cluster, and every
  * surviving row preserves its input row bit-for-bit (decoded-PCM SNR = ∞,
  * transcript byte-equal) — the north-rule per-row invariant checked on the
  * pipeline's actual output, not just on pass-through plumbing. */
class SurvivorsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("survivors-spec"), 4)
    .getOrCreate()

  private val n = 400
  private lazy val clips = SynthCorpus.generate(spark, n)
  private lazy val result = DedupPipeline.run(clips, DedupConfig(strategy = "shuffle"))

  test("one survivor per cluster, and survivors' PCM + transcript are bit-exact") {
    val out = Survivors.survivors(clips, result.clusters).collect()
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    assert(out.length == nClusters, s"${out.length} survivors vs $nClusters clusters")

    val byId = out.map(c => c.clip_id -> c).toMap
    val expected = SynthCorpus.transcripts(n).toMap
    byId.foreach { case (id, c) =>
      val orig = SynthCorpus.clipForId(id.stripPrefix("clip_").toLong, 42L)
      assert(c.transcript == expected(id), s"transcript drift for $id")
      assert(AudioPcm.snrDb(AudioPcm.decodePcm(orig.bytes), AudioPcm.decodePcm(c.bytes)).isPosInfinity,
        s"PCM drift for $id")
    }
  }

  test("min-id survivors are exactly the cluster ids") {
    val reps = Survivors.survivors(clips, result.clusters)
      .collect().map(_.clip_id).toSet
    val clusterIds = result.clusters.collect().map(_.cluster_id).toSet
    assert(reps == clusterIds)
  }

  test("medoid survivor minimizes mean plain edit distance within its cluster") {
    import spark.implicits._
    // handcrafted 3-member cluster: b sits between a and c
    val rows = Seq(
      ("a", Array(1L, 2L, 3L, 4L, 9L)),
      ("b", Array(1L, 2L, 3L, 4L, 5L)),
      ("c", Array(1L, 2L, 3L, 5L, 5L)))
    val toks = rows.map { case (id, ids) =>
      TokRow(id, ids.length, ids, ids.map(_.toString), Array.fill(ids.length + 1)("")) }.toDS()
    val cl = rows.map { case (id, _) => ClusterRow(id, "a") }.toDS()
    val cs = rows.map { case (id, _) =>
      graft.data.Clip(id, AudioPcm.synthWav(1L, 16, 16000), 16000, 1, "pcm_s16le", id) }.toDS()
    val got = Survivors.survivorsMedoid(cs, cl, toks).collect().map(_.clip_id).toSeq
    assert(got == Seq("b"), s"medoid should be b, got $got")
  }

  test("medoid falls back to min id above the cluster-size bound") {
    import spark.implicits._
    val rows = (0 until 5).map(i => (s"m_$i", Array(1L, 2L, 3L, i.toLong)))
    val toks = rows.map { case (id, ids) =>
      TokRow(id, ids.length, ids, ids.map(_.toString), Array.fill(ids.length + 1)("")) }.toDS()
    val cl = rows.map { case (id, _) => ClusterRow(id, "m_0") }.toDS()
    val cs = rows.map { case (id, _) =>
      graft.data.Clip(id, AudioPcm.synthWav(1L, 16, 16000), 16000, 1, "pcm_s16le", id) }.toDS()
    val fallback = spark.sparkContext.longAccumulator("medoidFallback")
    val got = Survivors.survivorsMedoid(cs, cl, toks, maxClusterForMedoid = 3,
        fallbackClusters = Some(fallback))
      .collect().map(_.clip_id).toSeq
    assert(got == Seq("m_0"))
    // the fallback is COUNTED, never silent: exactly this one oversized cluster
    assert(fallback.value == 1L, s"fallback accumulator = ${fallback.value}, want 1")
  }

  test("medoid keeps clusters whose members have no token rows (no silent vanish)") {
    import spark.implicits._
    // cluster A: tokenized members; cluster E: members dropped by tokenize
    // (e.g. empty transcripts clustered by the audio channel) — E must still
    // produce a survivor (its cluster id), matching the pipeline's
    // no-row-vanishes invariant
    val toks = Seq(
      TokRow("a1", 3, Array(1L, 2L, 3L), Array("1", "2", "3"), Array.fill(4)("")),
      TokRow("a2", 3, Array(1L, 2L, 4L), Array("1", "2", "4"), Array.fill(4)(""))).toDS()
    val cl = Seq(
      ClusterRow("a1", "a1"), ClusterRow("a2", "a1"),
      ClusterRow("e1", "e1"), ClusterRow("e2", "e1")).toDS()
    val cs = Seq("a1", "a2", "e1", "e2").map(id =>
      graft.data.Clip(id, AudioPcm.synthWav(1L, 16, 16000), 16000, 1, "pcm_s16le",
        if (id.startsWith("e")) "" else id)).toDS()
    val got = Survivors.survivorsMedoid(cs, cl, toks).collect().map(_.clip_id).toSet
    assert(got.contains("e1"), s"token-less cluster dropped from medoid survivors: $got")
    assert(got.size == 2 && got.exists(_.startsWith("a")), s"got $got")
  }
}
