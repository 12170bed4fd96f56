package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.oracle.FuzzyMatcher
import graft.kernel.Matcher
import graft.text.PT

/** Golden-fixture tests translated from the reference's GTest corpus
  * (/root/reference/test/data/test-tm1 over /root/reference/test/data/tm1,
  * format documented at test-tm1:1-3; assertions mirror
  * /root/reference/test/test.cc:38-100): exact match set, order, ids, and
  * scores within 0.009 absolute. */
class OracleGoldenSpec extends AnyFunSuite {

  private val tm1 = Seq(
    "aa bb cc dd",
    "aa bb bb aa cc dd",
    "aa ｟it｠ bb cc dd",
    "aa bb 13 dd",
    "aa bb cc ee",
    "aa bb cc dd.",
    "aa bb cc dd .",
    ".")

  private def build(pt: Int = PT.default): FuzzyMatcher = {
    val fm = new FuzzyMatcher(pt)
    tm1.zipWithIndex.foreach { case (s, i) => fm.addTm((i + 1).toString, s) }
    fm.sort()
    fm
  }

  private lazy val fm = build()

  private def check(
      fmx: FuzzyMatcher,
      pattern: String,
      fuzzy: Float,
      noPerfect: Boolean,
      nmatch: Int,
      expected: Seq[(Double, String)]): Unit = {
    // min_subseq_length=2, min_subseq_ratio=0 as in the reference test harness
    // (/root/reference/test/test.cc:38-39)
    val res = fmx.matchQuery(pattern,
      Matcher.Params(fuzzy = fuzzy, numberOfMatches = nmatch, noPerfect = noPerfect,
        minSubseqLength = 2, minSubseqRatio = 0f))
    val got = res.map(m => (m.score, fmx.externalId(m.sIdx)))
    assert(got.map(_._2) == expected.map(_._2),
      s"ids for '$pattern'@$fuzzy: got ${got.mkString(",")} want ${expected.mkString(",")}")
    got.zip(expected).foreach { case ((gs, _), (es, id)) =>
      assert(math.abs(gs - es) <= 0.009, s"score for $id: got $gs want $es")
    }
  }

  test("PERFECT1: exact match at threshold 1") {
    check(fm, "aa bb cc dd", 1f, noPerfect = false, 5, Seq((1.0, "1")))
  }
  test("PERFECT1np: no_perfect drops the exact match") {
    check(fm, "aa bb cc dd", 1f, noPerfect = true, 5, Seq())
  }
  test("PERFECT2") {
    check(fm, "aa bb bb aa cc dd", 1f, noPerfect = false, 5, Seq((1.0, "2")))
  }
  test("FUZZY1: no non-perfect candidates at threshold 1") {
    check(fm, "aa bb cc", 1f, noPerfect = false, 5, Seq())
  }
  test("FUZZY2") {
    check(fm, "aa bb cc", 0.7f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "5"), (0.74, "3")))
  }
  test("FUZZY3") {
    check(fm, "aa bb cc", 0.6f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "5"), (0.74, "3"), (0.60, "6"), (0.60, "7")))
  }
  test("FUZZY4") {
    check(fm, "aa bb aa cc dd", 0.75f, noPerfect = false, 5,
      Seq((0.83, "2"), (0.8, "1"), (0.79, "3")))
  }
  test("FUZZY5") {
    check(fm, "aa bb cc ff", 0.75f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "5")))
  }
  test("FUZZY6") {
    check(fm, "aa bb cc ff", 0.5f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "5"), (0.74, "3"), (0.60, "6"), (0.60, "7")))
  }
  test("FUZZY6b: nmatch=4 truncates") {
    check(fm, "aa bb cc ff", 0.5f, noPerfect = false, 4,
      Seq((0.75, "1"), (0.75, "5"), (0.74, "3"), (0.60, "6")))
  }
  test("CASE1") {
    check(fm, "aa bb cc Dd", 1f, noPerfect = false, 5, Seq())
  }
  test("CASE2: case variant costs diff_case") {
    check(fm, "aa bb cc Dd", 0.8f, noPerfect = false, 5,
      Seq((0.99, "1"), (0.98, "3")))
  }
  test("NUM1") {
    check(fm, "aa bb 14 dd", 1f, noPerfect = false, 5, Seq())
  }
  test("NUM2: number variant costs diff_real") {
    check(fm, "aa bb 14 dd", 0.8f, noPerfect = false, 5, Seq((0.98, "4")))
  }
  test("SEP0a: attached/detached period are identical patterns") {
    check(fm, "aa bb cc dd.", 1f, noPerfect = true, 5, Seq())
  }
  test("SEP0b") {
    check(fm, "aa bb cc dd .", 1f, noPerfect = true, 5, Seq())
  }
  test("SEP1") {
    check(fm, "aa bb cc dd", 0.7f, noPerfect = true, 5,
      Seq((0.99, "3"), (0.8, "6"), (0.8, "7"), (0.75, "4"), (0.75, "5")))
  }
  test("NOLIMIT: nmatch=0 returns everything above threshold") {
    check(fm, "aa bb cc dd", 0.5f, noPerfect = true, 0,
      Seq((0.99, "3"), (0.80, "6"), (0.80, "7"), (0.75, "4"), (0.75, "5"), (0.66, "2")))
  }

  test("lcs_cost: coverage-style EditCosts(1,0,1) exact fractions (test.cc:337-375)") {
    val f2 = new FuzzyMatcher(PT.none)
    f2.addTm("0", "a b c")
    f2.addTm("1", "a b c d e x x x")
    f2.addTm("2", "x x a b c d e f x x x x x")
    f2.sort()
    val res = f2.matchQuery("a b c d e f",
      Matcher.Params(fuzzy = 0f, numberOfMatches = 10,
        minSubseqLength = 3, minSubseqRatio = 0.5f,
        editCosts = graft.kernel.EditCosts(1f, 0f, 1f)))
    assert(res.map(m => f2.externalId(m.sIdx)) == List("2", "1", "0"))
    assert(math.abs(res(0).score - 1.0) <= 1e-3)
    assert(math.abs(res(1).score - 5.0 / 6) <= 1e-3)
    assert(math.abs(res(2).score - 0.5) <= 1e-3)
  }

  test("pre_reject: length-window boundary (test.cc:377-418)") {
    val f2 = new FuzzyMatcher(PT.none)
    f2.addTm("0", "a b c d e")
    f2.addTm("1", "a b c d e f")
    f2.addTm("2", "a b c d e f g")
    f2.sort()
    val p = Matcher.Params(fuzzy = 0.5f, numberOfMatches = 10,
      minSubseqLength = 0, minSubseqRatio = 0f)
    assert(f2.matchQuery("a b c", p).size == 2)
    assert(f2.matchQuery("a b c d e f g h i j k l", p).size == 2)
  }

  test("max_tokens_in_pattern guard drops long inserts and long patterns (test.cc:273-303)") {
    val f3 = new FuzzyMatcher(PT.default, maxTokensInPattern = 5)
    assert(f3.addTm("1", "aa bb cc dd"))
    assert(!f3.addTm("2", "aa bb cc dd ee ff"))
    f3.sort()
    assert(f3.matchQuery("aa bb cc dd ee ff",
      Matcher.Params(fuzzy = 0.5f, numberOfMatches = 5)).isEmpty)
    assert(f3.matchQuery("aa bb cc dd",
      Matcher.Params(fuzzy = 0.5f, numberOfMatches = 5)).nonEmpty)
  }

  test("empty_token regression (test.cc:264-271)") {
    val f4 = new FuzzyMatcher(PT.default)
    assert(!f4.addTm("1", ""))
    f4.sort()
    assert(f4.matchQuery("", Matcher.Params(fuzzy = 0.5f)).isEmpty)
  }

  test("idf_weight_1: IDF insertion penalties shift scores (test.cc:420-452)") {
    val f2 = new FuzzyMatcher(PT.none)
    Seq("a b c", "a b d", "d d d d d", "d e", "c").zipWithIndex
      .foreach { case (s, i) => f2.addTm(i.toString, s) }
    f2.sort()
    val res = f2.matchQuery("a b c d",
      Matcher.Params(fuzzy = 0f, numberOfMatches = 10,
        minSubseqLength = 0, minSubseqRatio = 0f, vocabIdfPenalty = 1f,
        editCosts = graft.kernel.EditCosts(1f, 0f, 1f)))
    assert(res.map(m => f2.externalId(m.sIdx)) == List("0", "1"))
    assert(math.abs(res(0).score - 0.6706515) <= 1e-4, s"got ${res(0).score}")
    assert(math.abs(res(1).score - 0.6076691) <= 1e-4, s"got ${res(1).score}")
  }

  test("idf_weight_2: IDF with uniform costs (test.cc:454-507)") {
    val f2 = new FuzzyMatcher(PT.none)
    Seq("a b c e", "a b e d", "d d d d d", "d e", "c").zipWithIndex
      .foreach { case (s, i) => f2.addTm(i.toString, s) }
    f2.sort()
    for (ec <- Seq(graft.kernel.EditCosts(1f, 0f, 1f), graft.kernel.EditCosts(1f, 1f, 1f))) {
      val res = f2.matchQuery("a b c d",
        Matcher.Params(fuzzy = 0f, numberOfMatches = 10,
          minSubseqLength = 0, minSubseqRatio = 0f, vocabIdfPenalty = 1f,
          editCosts = ec))
      assert(res.map(m => f2.externalId(m.sIdx)) == List("0", "1"))
      assert(math.abs(res(0).score - 0.6706515) <= 1e-4, s"got ${res(0).score}")
      assert(math.abs(res(1).score - 0.6076691) <= 1e-4, s"got ${res(1).score}")
    }
  }

  test("subsequence probe returns best containment match + detokenized surface (F8, fuzzy_match.cc:250-365)") {
    val f5 = build()
    val r = f5.subsequence("zz aa bb cc dd zz", numberOfMatches = 5)
    assert(r.isDefined)
    val (m, _, len, surface) = r.get
    assert(f5.externalId(m.sIdx) == "1")
    assert(len == 4)
    // F8: the surface string of the matched span, reconstructed from the
    // original tokens (reference appends it to the id, fuzzy_match.cc:341-348)
    assert(surface == "aa bb cc dd")
  }

  test("F8 detokenize preserves original casing and numbers over the matched span") {
    val f5 = new FuzzyMatcher(PT.default)
    f5.addTm("1", "the Quick 13 foxes")
    f5.sort()
    val r = f5.subsequence("xx the Quick 13 foxes.", numberOfMatches = 5)
    assert(r.isDefined)
    // span covers only the MATCHED norm tokens: original casing and the raw
    // number are reconstructed; the trailing "." norm token is outside it
    assert(r.get._4 == "the Quick 13 foxes")
  }

  test("F8 detokenize includes interior penalty tokens of the span (map_tokens semantics)") {
    val f5 = new FuzzyMatcher(PT.default | PT.pct)
    f5.addTm("1", "aa bb cc dd")
    f5.sort()
    val r = f5.subsequence("zz aa bb , cc dd zz", numberOfMatches = 5)
    assert(r.isDefined)
    // the "," is an itok under pct, raw-positioned INSIDE the matched span —
    // the reference's tokens[map_tokens[pos]..map_tokens[pos+len]) keeps it
    assert(r.get._4 == "aa bb , cc dd")
  }

  // ---- per-penalty-config fixture variants (test.cc:122-190) ----

  test("buildtm1_pct: test-tm1-pct fixture (pt=pct|nbr|cas; test.cc:122-144)") {
    val f = new FuzzyMatcher(PT.pct | PT.nbr | PT.cas)
    tm1.zipWithIndex.foreach { case (s, i) =>
      val added = f.addTm((i + 1).toString, s)
      // the lone "." sentence normalizes to empty under pct and is dropped
      // with a warning in the reference (test.cc:133-138)
      assert(added == (s != "."))
    }
    f.sort()
    check(f, "aa bb cc dd.", 0.9f, noPerfect = true, 5, Seq((0.99, "1")))
  }

  test("buildtm1_sep: test-tm1-sep fixture (pt=tag|sep|cas|nbr; test.cc:146-161)") {
    val f = build(PT.tag | PT.sep | PT.cas | PT.nbr)
    check(f, "aa bb cc dd.", 0.9f, noPerfect = true, 5, Seq((0.99, "7")))
    check(f, "aa bb cc dd .", 0.9f, noPerfect = true, 5, Seq((0.99, "6")))
    check(f, "aa bb cc dd", 0.7f, noPerfect = true, 5,
      Seq((0.98, "3"), (0.8, "6"), (0.79, "7"), (0.75, "4"), (0.75, "5")))
    check(f, "aa ｟it｠｟it｠ bb cc dd", 0.9f, noPerfect = false, 5,
      Seq((0.99, "3"), (0.97, "1")))
    check(f, "aa ｟it｠ ｟it｠ bb cc dd", 0.9f, noPerfect = false, 5,
      Seq((0.98, "3"), (0.96, "1")))
  }

  test("buildtm1_jnr: test-tm1-jnr fixture (pt=tag|jnr|cas|nbr; test.cc:163-178)") {
    val f = build(PT.tag | PT.jnr | PT.cas | PT.nbr)
    check(f, "aa bb cc dd.", 0.9f, noPerfect = true, 5, Seq((0.99, "7")))
    check(f, "aa bb cc dd .", 0.9f, noPerfect = true, 5, Seq((0.99, "6")))
    check(f, "aa bb cc dd", 0.7f, noPerfect = true, 5,
      Seq((0.99, "3"), (0.80, "7"), (0.79, "6"), (0.75, "4"), (0.75, "5")))
    check(f, "aa ｟it｠｟it｠ bb cc dd", 0.9f, noPerfect = false, 5,
      Seq((0.98, "3"), (0.97, "1")))
    check(f, "aa ｟it｠ ｟it｠ bb cc dd", 0.9f, noPerfect = false, 5,
      Seq((0.99, "3"), (0.98, "1")))
  }

  test("buildtm1_nonbr_nocas: test-tm1-nonbr-nocas fixture (pt=none; test.cc:180-190)") {
    val f = build(PT.none)
    check(f, "aa bb 14 dd", 1f, noPerfect = false, 5, Seq())
    check(f, "aa bb 14 dd", 0.7f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "4")))
  }

  test("small_sentence_matches: min_subseq clamping to pattern length (test.cc:223-262)") {
    val f = new FuzzyMatcher(PT.default)
    f.addTm("a", "single")
    f.addTm("b", "two words")
    f.addTm("c", "three kind words")
    f.sort()
    // min_subseq_length=3 exceeds (or equals) the pattern length; the clamp
    // (fuzzy_match.cc:463-467) must still allow the exact self-match
    for ((pat, wantIdx) <- Seq(("single", 0), ("two words", 1), ("three kind words", 2))) {
      val res = f.matchQuery(pat, Matcher.Params(
        fuzzy = 1f, numberOfMatches = 1, minSubseqLength = 3, minSubseqRatio = 0f))
      assert(res.size == 1, s"'$pat': got ${res.size} matches")
      assert(res.head.sIdx == wantIdx)
    }
  }

  test("nfc_normalization: ohm sign and omega unify under NFC (test.cc:305-335)") {
    val ohm = "Ω"   // Ω OHM SIGN — NFC-normalizes to U+03A9
    val omega = "Ω" // Ω GREEK CAPITAL OMEGA
    val f = new FuzzyMatcher(PT.default)
    f.addTm("1", ohm)
    f.sort()
    for (pat <- Seq(ohm, omega)) {
      val res = f.matchQuery(pat, Matcher.Params(
        fuzzy = 1f, numberOfMatches = 1, minSubseqLength = 1, minSubseqRatio = 0f))
      assert(res.size == 1, s"pattern $pat failed to match")
    }
  }

  // ---- exact contrastive-rerank expectations (test.cc:509-632) ----

  private def buildContrastTm(sents: Seq[String]): FuzzyMatcher = {
    val f = new FuzzyMatcher(PT.none)
    sents.zipWithIndex.foreach { case (s, i) => f.addTm(i.toString, s) }
    f.sort()
    f
  }

  test("contrastive_reduce_mean: exact net scores (test.cc:509-553)") {
    val f = buildContrastTm(Seq("a b c d", "b c d", "d e f"))
    val res = f.matchQuery("a b c d e f", Matcher.Params(
      fuzzy = 0f, numberOfMatches = 10, minSubseqLength = 0, minSubseqRatio = 0f,
      editCosts = graft.kernel.EditCosts(1f, 1f, 1f), contrastiveFactor = 1f,
      contrastReduce = Matcher.Mean))
    assert(res.map(_.sIdx) == List(0, 2, 1), s"order ${res.map(_.sIdx)}")
    val net = res.map(m => m.score - m.penalty)
    assert(math.abs(net(0) - 2.0 / 3) <= 1e-3, s"net0 ${net(0)}")
    assert(math.abs(net(1) - 1.0 / 2) <= 1e-3, s"net1 ${net(1)}")
    assert(math.abs(net(2) - 1.0 / 8) <= 1e-3, s"net2 ${net(2)}")
  }

  test("contrastive_reduce_max: exact net scores (test.cc:555-597)") {
    val f = buildContrastTm(Seq("a b c d", "b c d", "d e f"))
    val res = f.matchQuery("a b c d e f", Matcher.Params(
      fuzzy = 0f, numberOfMatches = 10, minSubseqLength = 0, minSubseqRatio = 0f,
      editCosts = graft.kernel.EditCosts(1f, 1f, 1f), contrastiveFactor = 1f,
      contrastReduce = Matcher.Max))
    assert(res.map(_.sIdx) == List(0, 2, 1), s"order ${res.map(_.sIdx)}")
    val net = res.map(m => m.score - m.penalty)
    assert(math.abs(net(0) - 2.0 / 3) <= 1e-3, s"net0 ${net(0)}")
    assert(math.abs(net(1) - 1.0 / 2) <= 1e-3, s"net1 ${net(1)}")
    assert(math.abs(net(2) + 1.0 / 4) <= 1e-3, s"net2 ${net(2)}")
  }

  test("contrastive_buffer: buffer larger than nmatch widens the pool (test.cc:599-632)") {
    val f = buildContrastTm(Seq("a b c d e", "b c d e", "c d e f", "d e f g", "h i j"))
    val res = f.matchQuery("a b c d e f g h i j", Matcher.Params(
      fuzzy = 0f, numberOfMatches = 3, minSubseqLength = 0, minSubseqRatio = 0f,
      editCosts = graft.kernel.EditCosts(1f, 0f, 1f), contrastiveFactor = 1f,
      contrastReduce = Matcher.Max, contrastBuffer = 10))
    assert(res.map(_.sIdx) == List(0, 3, 4), s"order ${res.map(_.sIdx)}")
  }

  test("serialize round-trip: save → load → golden assertions still pass (test.cc:102-120)") {
    val path = java.nio.file.Files.createTempFile("graft-oracle", ".gfm").toString
    fm.save(path)
    val re = FuzzyMatcher.load(path)
    // re-run representative fixture lines on the reloaded matcher
    check(re, "aa bb cc dd", 0.5f, noPerfect = true, 0,
      Seq((0.99, "3"), (0.80, "6"), (0.80, "7"), (0.75, "4"), (0.75, "5"), (0.66, "2")))
    check(re, "aa bb cc", 0.7f, noPerfect = false, 5,
      Seq((0.75, "1"), (0.75, "5"), (0.74, "3")))
    check(re, "aa bb 14 dd", 0.8f, noPerfect = false, 5, Seq((0.98, "4")))
    // document frequencies (IDF basis) survive the round trip
    assert(fm.idfPenalty(fm.encode("aa bb cc dd")).toSeq ==
      re.idfPenalty(re.encode("aa bb cc dd")).toSeq)
    // corrupt/missing files throw (test.cc:22-26)
    assertThrows[Exception](FuzzyMatcher.load(path + ".missing"))
    // unsupported future version is rejected with a message naming it, not
    // misparsed (the reference's version-char dispatch, suffix_array.hxx:56-91)
    val v9 = java.nio.file.Files.createTempFile("graft-oracle", ".gfm")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(3) = '9'.toByte
    java.nio.file.Files.write(v9, bytes)
    val e = intercept[IllegalArgumentException](FuzzyMatcher.load(v9.toString))
    assert(e.getMessage.contains("version '9'"), e.getMessage)
  }
}
