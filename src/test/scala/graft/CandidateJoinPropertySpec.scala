package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{CandidateStage, DedupConfig, DedupPipeline, TokenizeStage}
import graft.kernel.EditCosts

/** The candidate bucket join (codegen equi-join formulation) must emit
  * EXACTLY the pair set of the definitional algorithm: for every bucket of
  * ≤ cap members, all oriented member pairs surviving the P5 length window;
  * nothing from hot buckets. Checked against a driver-side brute force over
  * randomized corpora (seeded — deterministic). */
class CandidateJoinPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("cand-join-prop"), 4)
    .getOrCreate()

  private def bruteForce(
      entries: Seq[(Long, String, Int)], cap: Int, ec: EditCosts, fuzzy: Float): Set[(String, String)] = {
    entries.groupBy(_._1).values.flatMap { bucket =>
      if (bucket.size > cap) Nil
      else for {
        a <- bucket; b <- bucket
        if a._2 != b._2
        if a._3 < b._3 || (a._3 == b._3 && a._2 < b._2) // orientation
        if !CandidateStage.lengthReject(a._3, b._3, ec, fuzzy)
      } yield (a._2, b._2)
    }.toSet
  }

  test("ngram channel pair set equals driver brute force (random corpora, caps active)") {
    import spark.implicits._
    val rng = new scala.util.Random(2026)
    for (trial <- 1 to 3) {
      val n = 120 + rng.nextInt(120)
      // small vocab → shared shingles + hot buckets both occur
      val rows = (0 until n).map { i =>
        val len = 3 + rng.nextInt(12)
        val toks = Array.fill(len)(s"w${rng.nextInt(12)}")
        (f"d_$i%04d", toks.mkString(" "))
      }
      val cfg = DedupConfig(shingleDfCap = 8)
      val clips = rows.map { case (id, t) =>
        graft.data.Clip(id, Array[Byte](), 16000, 1, "pcm_s16le", t) }.toDS()
      val toks = TokenizeStage(clips, cfg).collect()

      // definitional entries: one per (distinct shingle, doc)
      val entries = toks.toSeq.filter(_.n_tokens >= cfg.shingleK).flatMap { t =>
        graft.kernel.Hashing.distinctShingles(t.ids, cfg.shingleK)
          .map(h => (h, t.clip_id, t.n_tokens))
      }
      val want = bruteForce(entries, cfg.shingleDfCap, cfg.editCosts, cfg.threshold)

      val acc1 = spark.sparkContext.longAccumulator
      val acc2 = spark.sparkContext.longAccumulator
      val got = CandidateStage.ngramChannel(TokenizeStage(clips, cfg), cfg, acc1, acc2)
        .collect().map(cp => (cp.p, cp.c)).toSet
      assert(got == want,
        s"trial $trial: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      val hotBuckets = entries.groupBy(_._1).values.count(_.size > cfg.shingleDfCap)
      assert(acc1.value == hotBuckets, s"capped-bucket count ${acc1.value} != $hotBuckets")
    }
  }

  test("hot-bucket valve: shuffled fallback (bound=0) equals the broadcast path, exact metrics") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val entries = (0 until 400).map { i =>
      CandidateStage.BucketEntry((rng.nextInt(40) + 1).toLong, f"d_$i%04d", 3, 300)
    }.toDS()
    val cap = 8
    def run(bound: Int): (Set[(Long, String)], Long, Long) = {
      val buckets = spark.sparkContext.longAccumulator
      val pairs = spark.sparkContext.longAccumulator
      val cold = CandidateStage.dropHotBuckets(entries.toDF(), cap, buckets, Some(pairs), bound)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      (cold, buckets.value, pairs.value)
    }
    val (coldB, bB, pB) = run(1000000) // broadcast local-relation path
    val (coldS, bS, pS) = run(0)       // forced shuffled fallback
    assert(coldB == coldS, s"cold sets diverge: ${(coldB -- coldS).take(3)} / ${(coldS -- coldB).take(3)}")
    assert(bB == bS && pB == pS, s"metrics diverge: ($bB,$pB) vs ($bS,$pS)")
    // exact against a driver recount
    val byBucket = entries.collect().groupBy(_.sh)
    val wantHot = byBucket.count(_._2.length > cap)
    val wantPairs = byBucket.values.filter(_.length > cap)
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(bB == wantHot && pB == wantPairs, s"($bB,$pB) != ($wantHot,$wantPairs)")
    assert(coldB == entries.collect().filter(e => byBucket(e.sh).length <= cap)
      .map(e => (e.sh, e.id)).toSet)
  }

  test("asymmetric costs: window uses both orientations in the join table") {
    import spark.implicits._
    val ec = EditCosts(insert = 2f, delete = 1f, replace = 1f)
    val rng = new scala.util.Random(7)
    val rows = (0 until 150).map { i =>
      val len = 3 + rng.nextInt(14)
      (f"a_$i%04d", Array.fill(len)(s"w${rng.nextInt(10)}").mkString(" "))
    }
    val cfg = DedupConfig(shingleDfCap = 10, editCosts = ec)
    val clips = rows.map { case (id, t) =>
      graft.data.Clip(id, Array[Byte](), 16000, 1, "pcm_s16le", t) }.toDS()
    val toks = TokenizeStage(clips, cfg).collect()
    val entries = toks.toSeq.filter(_.n_tokens >= cfg.shingleK).flatMap { t =>
      graft.kernel.Hashing.distinctShingles(t.ids, cfg.shingleK)
        .map(h => (h, t.clip_id, t.n_tokens))
    }
    val want = bruteForce(entries, cfg.shingleDfCap, ec, cfg.threshold)
    val got = CandidateStage.ngramChannel(TokenizeStage(clips, cfg), cfg,
      spark.sparkContext.longAccumulator, spark.sparkContext.longAccumulator)
      .collect().map(cp => (cp.p, cp.c)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("cross-table ngram channel equals driver brute force (two-sided window, per-side caps)") {
    import spark.implicits._
    import graft.kernel.SuffixIndex
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val mkRows = (m: Int, tag: String) => (0 until m).map { i =>
        val len = 3 + rng.nextInt(12)
        (f"${tag}_$i%04d", Array.fill(len)(s"w${rng.nextInt(12)}").mkString(" "))
      }
      val cfg = DedupConfig(shingleDfCap = 8)
      def clipsOf(rows: Seq[(String, String)]) = rows.map { case (id, t) =>
        graft.data.Clip(id, Array[Byte](), 16000, 1, "pcm_s16le", t) }.toDS()
      val qClips = clipsOf(mkRows(60 + rng.nextInt(40), "q"))
      val cClips = clipsOf(mkRows(120 + rng.nextInt(60), "c"))

      def sideEntries(clips: org.apache.spark.sql.Dataset[graft.data.Clip]) =
        TokenizeStage(clips, cfg).collect().toSeq
          .filter(_.n_tokens >= cfg.shingleK)
          .flatMap { t =>
            graft.kernel.Hashing.distinctShingles(t.ids, cfg.shingleK)
              .map(h => (h, t.clip_id, t.n_tokens))
          }
      val qEntries = sideEntries(qClips)
      val cEntries = sideEntries(cClips)
      val qBySh = qEntries.groupBy(_._1).filter(_._2.size <= cfg.shingleDfCap)
      val cBySh = cEntries.groupBy(_._1).filter(_._2.size <= cfg.shingleDfCap)
      val want = (for {
        (sh, qs) <- qBySh.toSeq
        cs <- cBySh.get(sh).toSeq
        q <- qs; c <- cs
        // fixed pattern-is-query direction: one-sided theoretical rejection
        if !SuffixIndex.theoreticalRejection(q._3, c._3, cfg.editCosts, cfg.threshold)
      } yield (q._2, c._2)).toSet

      val got = CandidateStage.crossNgramChannel(
          TokenizeStage(qClips, cfg), TokenizeStage(cClips, cfg), cfg,
          spark.sparkContext.longAccumulator)
        .collect().map(cp => (cp.p, cp.c)).toSet
      assert(got == want,
        s"trial $trial: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("tiny-pattern equi-join equals the broadcast scan (and auto-selects past the cap)") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    // many tiny (1-2 token) rows + short rows for them to be contained in
    val rows = (0 until 200).map { i =>
      val len = 1 + rng.nextInt(4)
      (f"t_$i%04d", Array.fill(len)(s"w${rng.nextInt(6)}").mkString(" "))
    }
    // high gram cap: the equality is vs the UNCAPPED broadcast scan
    val cfg = DedupConfig(shingleDfCap = 100000)
    val clips = rows.map { case (id, t) =>
      graft.data.Clip(id, Array[Byte](), 16000, 1, "pcm_s16le", t) }.toDS()
    val toks = TokenizeStage(clips, cfg)
    val bcast = CandidateStage.tinyChannel(toks, cfg, spark.sparkContext.longAccumulator)
      .collect().map(cp => (cp.p, cp.c)).toSet
    assert(bcast.nonEmpty, "vacuous tiny-channel fixture")
    val joined = CandidateStage.tinyChannelJoin(toks, cfg, spark.sparkContext.longAccumulator)
      .collect().map(cp => (cp.p, cp.c)).toSet
    assert(joined == bcast,
      s"missing=${(bcast -- joined).take(5)} extra=${(joined -- bcast).take(5)}")
    // past the broadcast cap the channel must degrade to the join, not throw
    val auto = CandidateStage.tinyChannel(toks, cfg.copy(tinyPatternBroadcastCap = 1),
        spark.sparkContext.longAccumulator)
      .collect().map(cp => (cp.p, cp.c)).toSet
    assert(auto == bcast)
    // forced-low gram cap: the valve fires, is COUNTED, and only ever drops
    // pairs (subset of the uncapped truth — never inventions)
    val acc = spark.sparkContext.longAccumulator
    val capped = CandidateStage.tinyChannelJoin(toks, cfg.copy(shingleDfCap = 1), acc)
      .collect().map(cp => (cp.p, cp.c)).toSet
    assert(acc.value > 0, "gram cap=1 never triggered — tiny valve dead")
    assert((capped -- bcast).isEmpty, s"capped run invented pairs: ${(capped -- bcast).take(5)}")
  }
}
