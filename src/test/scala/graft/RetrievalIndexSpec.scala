package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{Clip, TableIO}
import graft.dedup.{DedupConfig, FuzzyRetrieval}
import graft.text.PT

/** The persisted distributed retrieval index (the reference's `-a index` →
  * `-i CORPUS.fmi` job split, /root/reference/src/fuzzy_matcher_binarization.cc:16-51):
  * one saveIndex run must serve later match jobs WITHOUT re-tokenizing — or
  * even touching — the raw corpus, on both retrieval strategies, and a
  * config mismatch between index and match sides must fail loudly
  * (reference README.md:18's identical-config requirement). */
class RetrievalIndexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("retrieval-index-spec")
    .getOrCreate()

  private val sents = Seq(
    "aa bb cc dd", "aa bb bb aa cc dd", "aa ｟it｠ bb cc dd", "aa bb 13 dd",
    "aa bb cc ee", "aa bb cc dd.", "aa bb cc dd .", ".")

  private def cfg = DedupConfig(threshold = 0.5f, minSubseqLength = 2,
    minSubseqRatio = 0f, shingleK = 2)

  private def rows(ds: org.apache.spark.sql.Dataset[graft.dedup.RetrievalRow]) =
    ds.collect().map(r => (r.query_id, r.rank, r.s_id, r.score, r.max_subseq)).toSet

  test("index round-trip: match from the saved index, corpus deleted, results identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx").toString
    val corpusPath = s"$tmp/corpus"
    val idxDir = s"$tmp/index"

    val clips = sents.zipWithIndex.map { case (s, i) =>
      Clip((i + 1).toString, Array.emptyByteArray, 16000, 0, "pcm_s16le", s)
    }
    TableIO.write(clips.toDS().toDF(), corpusPath)
    val corpus = TableIO.readClips(spark, corpusPath)
    val queries = Seq(Clip("q", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS()

    // direct-path results, materialized BEFORE the corpus is deleted
    val direct = rows(FuzzyRetrieval.topk(queries, corpus, cfg, 5))
    val directShuffle = rows(FuzzyRetrieval.topkShuffle(queries, corpus, cfg, 5))
    assert(direct.nonEmpty, "direct path empty — vacuous round-trip")

    FuzzyRetrieval.saveIndex(corpus, cfg, idxDir)

    // delete the raw corpus: the indexed path can no longer tokenize it —
    // identical results prove the index alone serves the match job
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(corpusPath))
    assert(!new java.io.File(corpusPath).exists())

    val loaded = FuzzyRetrieval.loadIndex(spark, idxDir, cfg)
    assert(rows(FuzzyRetrieval.topkIndexed(queries, loaded, cfg, 5)) == direct,
      "broadcast path diverged from the prebuilt index")
    assert(rows(FuzzyRetrieval.topkShuffleIndexed(queries, loaded, cfg, 5)) == directShuffle,
      "shuffle path diverged from the prebuilt index")
    // subsequence retrieval serves from the index too — pinned against the
    // direct path, not just non-emptiness
    val subDirect = FuzzyRetrieval.subsequence(queries,
        clips.toDS(), cfg, 5)
      .collect().map(r => (r.query_id, r.s_id, r.score, r.max_subseq, r.subseq_surface)).toSet
    val sub = FuzzyRetrieval.subsequenceIndexed(queries, loaded, cfg, 5)
      .collect().map(r => (r.query_id, r.s_id, r.score, r.max_subseq, r.subseq_surface)).toSet
    assert(sub == subDirect && sub.nonEmpty,
      s"subsequence-from-index diverged: $sub vs $subDirect")
  }

  test("loadIndex rejects a mismatched tokenizer config loudly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-cfg").toString
    val clips = Seq(Clip("1", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb")).toDS()
    FuzzyRetrieval.saveIndex(clips, cfg, tmp)
    val e = intercept[IllegalArgumentException] {
      FuzzyRetrieval.loadIndex(spark, tmp, cfg.copy(pt = PT.none))
    }
    assert(e.getMessage.contains("identical"), e.getMessage)
    // threshold is NOT tokenizer-relevant: a different threshold must load
    FuzzyRetrieval.loadIndex(spark, tmp, cfg.copy(threshold = 0.9f))
  }

  test("loadIndex on a missing dir names the fix") {
    val e = intercept[IllegalArgumentException] {
      FuzzyRetrieval.loadIndex(spark, "/tmp/does-not-exist-gfm-idx", cfg)
    }
    assert(e.getMessage.contains("saveIndex"), e.getMessage)
  }

  test("appendIndex: incremental O(new) insert — appended rows are matchable, old results keep") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-append").toString
    val base = Seq(Clip("1", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd"))
    FuzzyRetrieval.saveIndex(base.toDS(), cfg, tmp)
    val extra = Seq(Clip("9", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc ee"))
    FuzzyRetrieval.appendIndex(extra.toDS(), cfg, tmp)
    // second append (a third committed segment)
    FuzzyRetrieval.appendIndex(
      Seq(Clip("10", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd ff")).toDS(),
      cfg, tmp)
    val queries = Seq(Clip("q", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS()
    def matchIds() = rows(
      FuzzyRetrieval.topkIndexed(queries, FuzzyRetrieval.loadIndex(spark, tmp, cfg), cfg, 5))
      .map(_._3)
    assert(matchIds() == Set("1", "9", "10"),
      s"append not matchable (the reference's O(N) re-sort wall, fixed): ${matchIds()}")
    // a KILLED append = an orphan segment dir the meta never committed:
    // readers must see exactly the pre-append index
    Seq(Clip("99", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd gg")).toDS()
      .toDF().write.parquet(s"$tmp/toks_3")
    assert(matchIds() == Set("1", "9", "10"),
      "orphan (uncommitted) append segment leaked into match results")
    // config mismatch on append fails loudly too
    val e = intercept[IllegalArgumentException] {
      FuzzyRetrieval.appendIndex(extra.toDS(), cfg.copy(pt = PT.none), tmp)
    }
    assert(e.getMessage.contains("identical"), e.getMessage)
  }

  test("compactIndex: N segments merge to one, match results identical, crash windows safe") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-compact").toString
    FuzzyRetrieval.saveIndex(
      Seq(Clip("1", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS(), cfg, tmp)
    FuzzyRetrieval.appendIndex(
      Seq(Clip("9", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc ee")).toDS(), cfg, tmp)
    FuzzyRetrieval.appendIndex(
      Seq(Clip("10", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd ff")).toDS(), cfg, tmp)
    val queries = Seq(Clip("q", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS()
    def results() = rows(
      FuzzyRetrieval.topkIndexed(queries, FuzzyRetrieval.loadIndex(spark, tmp, cfg), cfg, 5))
    val before = results()
    assert(before.map(_._3) == Set("1", "9", "10"))
    assert(FuzzyRetrieval.readIndexMeta(spark, tmp).segments == 3)

    // crash window 1: a compaction killed AFTER writing its merged segment
    // but BEFORE the meta commit leaves an orphan at the next ordinal —
    // readers ignore it, and the real compaction overwrites it
    Seq(Clip("99", Array.emptyByteArray, 16000, 0, "pcm_s16le", "zz zz")).toDS()
      .toDF().write.parquet(s"$tmp/toks_3")
    assert(results() == before, "uncommitted merged segment leaked into match results")

    // a reader holding the PRE-compaction index (lazy union plan) must
    // survive a compaction that commits underneath it (r6: superseded
    // segments are retired for a grace window, not deleted at commit)
    val preCompactionIndex = FuzzyRetrieval.loadIndex(spark, tmp, cfg)
    assert(FuzzyRetrieval.compactIndex(spark, cfg, tmp))
    val m = FuzzyRetrieval.readIndexMeta(spark, tmp)
    assert(m.segments == 1, s"compaction left ${m.segments} segments")
    assert(m.retired.map(_._1).toSet == Set("toks", "toks_1", "toks_2"),
      s"superseded segments not retired: ${m.retired}")
    assert(results() == before, "compaction changed match results")
    assert(rows(FuzzyRetrieval.topkIndexed(queries, preCompactionIndex, cfg, 5)) == before,
      "pre-compaction reader broke after the compaction commit")
    // superseded dirs still on disk during the grace window
    val segDirs = new java.io.File(tmp).listFiles().map(_.getName)
      .filter(_.matches("toks(_\\d+)?")).toSet
    assert(segDirs == m.names.toSet ++ m.retired.map(_._1),
      s"retired segments deleted early: $segDirs")

    // compaction of a single-segment index is a no-op that still sweeps
    // orphans from earlier crashes AND (grace 0) purges retired segments —
    // the explicit-vacuum form
    Seq(Clip("98", Array.emptyByteArray, 16000, 0, "pcm_s16le", "yy yy")).toDS()
      .toDF().write.parquet(s"$tmp/toks_99")
    assert(!FuzzyRetrieval.compactIndex(spark, cfg, tmp, graceMs = 0))
    assert(!new java.io.File(s"$tmp/toks_99").exists(), "no-op compaction left the orphan")
    val afterVacuum = new java.io.File(tmp).listFiles().map(_.getName)
      .filter(_.matches("toks(_\\d+)?")).toSet
    assert(afterVacuum == m.names.toSet, s"vacuum left retired segments: $afterVacuum")
    assert(FuzzyRetrieval.readIndexMeta(spark, tmp).retired.isEmpty)
    assert(results() == before)

    // appends keep working after compaction (fresh ordinal, never reused)
    FuzzyRetrieval.appendIndex(
      Seq(Clip("11", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd gg")).toDS(),
      cfg, tmp)
    assert(results().map(_._3) == Set("1", "9", "10", "11"))
  }

  test("concurrent append is rejected loudly (single-writer lock), never silently lost") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-lock").toString
    val base = Seq(Clip("1", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd"))
    FuzzyRetrieval.saveIndex(base.toDS(), cfg, tmp)
    val extra = Seq(Clip("9", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc ee")).toDS()
    // simulate a concurrent appender holding the lock
    assert(new java.io.File(tmp, "index.lock").createNewFile())
    val e = intercept[IllegalArgumentException] { FuzzyRetrieval.appendIndex(extra, cfg, tmp) }
    assert(e.getMessage.contains("index.lock"), e.getMessage)
    // the index is untouched by the refused append
    val queries = Seq(Clip("q", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS()
    def matchIds() = rows(
      FuzzyRetrieval.topkIndexed(queries, FuzzyRetrieval.loadIndex(spark, tmp, cfg), cfg, 5))
      .map(_._3)
    assert(matchIds() == Set("1"))
    // lock released (the documented manual remedy for a writer killed hard)
    assert(new java.io.File(tmp, "index.lock").delete())
    FuzzyRetrieval.appendIndex(extra, cfg, tmp)
    assert(matchIds() == Set("1", "9"))
    // the successful append removed its own lock: a follow-up append works
    FuzzyRetrieval.appendIndex(
      Seq(Clip("10", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd ff")).toDS(),
      cfg, tmp)
    assert(matchIds() == Set("1", "9", "10"))
  }

  test("loadIndex rejects an UNCOMMITTED index (meta present, toks table not committed)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-part").toString
    val clips = Seq(Clip("1", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb")).toDS()
    FuzzyRetrieval.saveIndex(clips, cfg, tmp)
    // simulate a job killed mid-write: the table dir exists but its commit
    // marker does not
    assert(new java.io.File(s"$tmp/toks/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException] {
      FuzzyRetrieval.loadIndex(spark, tmp, cfg)
    }
    assert(e.getMessage.contains("COMMITTED"), e.getMessage)
  }

  test("a caller-cached index survives a match job (no unpersist of caller state)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("retr-idx-cache").toString
    val clips = sents.zipWithIndex.map { case (s, i) =>
      Clip((i + 1).toString, Array.emptyByteArray, 16000, 0, "pcm_s16le", s)
    }
    FuzzyRetrieval.saveIndex(clips.toDS(), cfg, tmp)
    val idx = FuzzyRetrieval.loadIndex(spark, tmp, cfg).persist()
    idx.count()
    val queries = Seq(Clip("q", Array.emptyByteArray, 16000, 0, "pcm_s16le", "aa bb cc dd")).toDS()
    assert(FuzzyRetrieval.topkIndexed(queries, idx, cfg, 5).collect().nonEmpty)
    assert(idx.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "broadcast-path match job evicted the caller's index cache")
    assert(FuzzyRetrieval.topkShuffleIndexed(queries, idx, cfg, 5).collect().nonEmpty)
    assert(idx.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "shuffle-path match job evicted the caller's index cache")
    idx.unpersist()
  }
}
