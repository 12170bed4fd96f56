package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.oracle.FuzzyMatcher
import graft.kernel.Matcher
import graft.text.PT
import graft.tools.CorpusImport

/** The reference's Europarl-scale golden set (test.cc:217-221): 20k-sentence
  * gz bitext corpus `tm2.en.gz,tm2.fr.gz` indexed with `N=target` ids, then
  * the 100-query `test-tm2` fixture asserted exactly (match set, order, ids,
  * scores within 0.009) at f=0.5 / no-perfect / n=2 / ml=3 / mr=0.3.
  * Also the end-to-end exercise of the S1 gz + parallel-pair import path. */
class GoldenTm2Spec extends AnyFunSuite {

  private val dataDir = "/root/reference/test/data"

  private lazy val fm: FuzzyMatcher = {
    val m = new FuzzyMatcher(PT.default)
    val n = CorpusImport.importTm(m, s"$dataDir/tm2.en.gz,$dataDir/tm2.fr.gz", addTarget = true)
    assert(n == 20000, s"expected 20000 tm2 sentences, read $n")
    m.sort()
    m
  }

  test("tm2: all 100 Europarl golden queries match exactly (test-tm2)") {
    val src = scala.io.Source.fromFile(s"$dataDir/test-tm2")(scala.io.Codec.UTF8)
    val lines = try src.getLines().toVector finally src.close()
    var failures = List.empty[String]
    for (line <- lines if line.nonEmpty && !line.startsWith("#")) {
      val f = line.split("\t", -1)
      val testId = f(0); val pattern = f(1)
      val fuzzy = f(2).toFloat; val noPerfect = f(3).toBoolean; val nmatch = f(4).toInt
      val expected = f.drop(5).filter(_.nonEmpty).grouped(2).collect {
        case Array(s, id) => (s.toDouble, id)
      }.toVector
      val got = fm.matchQuery(pattern, Matcher.Params(
        fuzzy = fuzzy, numberOfMatches = nmatch, noPerfect = noPerfect,
        minSubseqLength = 3, minSubseqRatio = 0.3f))
        .map(m => (m.score, fm.externalId(m.sIdx)))
      if (got.map(_._2) != expected.map(_._2).toList)
        failures ::= s"$testId: ids ${got.map(_._2)} want ${expected.map(_._2)}"
      else got.zip(expected).foreach { case ((gs, _), (es, id)) =>
        if ((es == 1.0) != (gs == 1.0) || math.abs(gs - es) > 0.009)
          failures ::= s"$testId/$id: score $gs want $es"
      }
    }
    assert(failures.isEmpty, s"${failures.size} mismatches:\n${failures.reverse.take(10).mkString("\n")}")
  }

  test("tm2 through the DISTRIBUTED retrieval operator: all 100 golden queries match") {
    // the same 20k-sentence corpus and 100-query fixture, but end-to-end
    // through Spark (FuzzyRetrieval.topk broadcast index) instead of the
    // single-node oracle — the flagship query at reference-test scale
    val spark = graft.dedup.DedupPipeline.sessionDefaults(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").appName("tm2-retrieval"), 4)
      .getOrCreate()
    import spark.implicits._
    val corpus = CorpusImport
      .readRows(s"$dataDir/tm2.en.gz,$dataDir/tm2.fr.gz", addTarget = true)
      .map { case (id, src) =>
        graft.data.Clip(id, Array.emptyByteArray, 16000, 0, "pcm_s16le", src)
      }
    assert(corpus.length == 20000)

    val srcFix = scala.io.Source.fromFile(s"$dataDir/test-tm2")(scala.io.Codec.UTF8)
    val lines = try srcFix.getLines().toVector finally srcFix.close()
    val cases = lines.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
      val f = line.split("\t", -1)
      val expected = f.drop(5).filter(_.nonEmpty).grouped(2).collect {
        case Array(s, id) => (s.toDouble, id)
      }.toVector
      (f(0), f(1), f(2).toFloat, f(3).toBoolean, f(4).toInt, expected)
    }
    // the whole fixture runs at one config (0.5 / no-perfect / n=2)
    assert(cases.map(c => (c._3, c._4, c._5)).distinct == Vector((0.5f, true, 2)))

    val queries = cases.map { case (testId, pattern, _, _, _, _) =>
      graft.data.Clip(testId, Array.emptyByteArray, 16000, 0, "pcm_s16le", pattern)
    }
    val got = graft.dedup.FuzzyRetrieval.topk(
        queries.toDS().repartition(4), corpus.toDS(),
        graft.dedup.DedupConfig(threshold = 0.5f, minSubseqLength = 3, minSubseqRatio = 0.3f),
        numberOfMatches = 2, noPerfect = true)
      .collect().groupBy(_.query_id)

    var failures = List.empty[String]
    for ((testId, _, _, _, _, expected) <- cases) {
      val rows = got.getOrElse(testId, Array.empty).sortBy(_.rank)
      if (rows.map(_.s_id).toVector != expected.map(_._2))
        failures ::= s"$testId: ids ${rows.map(_.s_id).toList} want ${expected.map(_._2)}"
      else rows.zip(expected).foreach { case (r, (es, id)) =>
        if ((es == 1.0) != (r.score == 1.0) || math.abs(r.score - es) > 0.009)
          failures ::= s"$testId/$id: score ${r.score} want $es"
      }
    }
    assert(failures.isEmpty, s"${failures.size} mismatches:\n${failures.reverse.take(10).mkString("\n")}")
  }

  test("S1 import: inline TAB bitext and id modes") {
    val tmp = java.nio.file.Files.createTempFile("graft-bitext", ".txt")
    java.nio.file.Files.writeString(tmp, "aa bb cc\tsrc one tgt\ndd ee ff\tsecond tgt\n")
    val m1 = new FuzzyMatcher(PT.default)
    assert(CorpusImport.importTm(m1, tmp.toString) == 2)
    m1.sort()
    // TAB target is stripped from the indexed source text
    val r = m1.matchQuery("aa bb cc", Matcher.Params(fuzzy = 1f, numberOfMatches = 1,
      minSubseqLength = 2, minSubseqRatio = 0f))
    assert(r.size == 1 && m1.externalId(r.head.sIdx) == "1")
    val m2 = new FuzzyMatcher(PT.default)
    CorpusImport.importTm(m2, tmp.toString, addTarget = true)
    m2.sort()
    assert(m2.externalId(0) == "1=src one tgt")
    val m3 = new FuzzyMatcher(PT.default)
    CorpusImport.importTm(m3, tmp.toString, addTargetNoIndex = true)
    m3.sort()
    assert(m3.externalId(0) == "src one tgt")
  }
}
