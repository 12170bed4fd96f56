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

  test("subsequence probe returns best containment match (test.cc + fuzzy_match.cc:250-365)") {
    val f5 = build()
    val r = f5.subsequence("zz aa bb cc dd zz", numberOfMatches = 5)
    assert(r.isDefined)
    val (m, _, len) = r.get
    assert(f5.externalId(m.sIdx) == "1")
    assert(len == 4)
  }

  test("contrastive rerank changes order and applies penalty (test.cc:509-632)") {
    val f6 = build()
    val res = f6.matchQuery("aa bb cc dd",
      Matcher.Params(fuzzy = 0.5f, numberOfMatches = 3, noPerfect = true,
        contrastiveFactor = 0.5f))
    assert(res.nonEmpty && res.size <= 3)
    // first pick is the plain best match (no penalty yet)
    assert(f6.externalId(res.head.sIdx) == "3")
  }
}
