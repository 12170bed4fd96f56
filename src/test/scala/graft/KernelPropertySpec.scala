package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.kernel._

/** ScalaCheck properties over the matching kernel (SURVEY.md §5):
  * symmetry, perfect-match identity, rejection-bound soundness, LCS
  * equivalence to brute force, MinHash ≈ Jaccard. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val ec = EditCosts()
  private val genIds: Gen[Array[Long]] =
    Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 8L)).map(_.toArray))

  private def doc(ids: Array[Long]): Doc =
    Doc(ids, ids.map(_.toString), Array.fill(ids.length + 1)(""))

  private def score(a: Array[Long], b: Array[Long]): Float = {
    val dw = Costs.diffWord(b.length, a.length, ec)
    val cost = EditDistanceKernel.weighted(doc(a), doc(b), null, 0f, ec, dw, Float.MaxValue)
    Costs.quantize(cost)
  }

  test("identical sequences score exactly 1.0") {
    check(Prop.forAll(genIds)(ids => score(ids, ids) == 1.0f))
  }

  test("pair score is symmetric under unit costs") {
    check(Prop.forAll(genIds, genIds)((a, b) => score(a, b) == score(b, a)))
  }

  test("length-window rejection (P5) is sound: rejected pairs never clear the threshold") {
    val fuzzy = 0.8f
    check(Prop.forAll(genIds, genIds) { (a, b) =>
      !SuffixIndex.theoreticalRejection(b.length, a.length, ec, fuzzy) ||
        score(a, b) < fuzzy
    })
  }

  test("coverage rejection (P6) is sound") {
    val fuzzy = 0.8f
    check(Prop.forAll(genIds, genIds) { (a, b) =>
      val cover = new PatternCoverage(b).countCoveredWords(a)
      !SuffixIndex.theoreticalRejectionCover(b.length, a.length, cover, ec, fuzzy) ||
        score(a, b) < fuzzy
    })
  }

  test("suffix-array longest match equals brute-force longest common substring") {
    check(Prop.forAll(genIds, genIds) { (a, b) =>
      val idx = new SuffixIndex
      idx.add(a)
      val got = idx.longestMatches(b, minSeqLen = 1, fuzzy = 0f, ec)
        .headOption.map(_._2).getOrElse(0)
      // matcher never registers unigrams for multi-token patterns (J2 rule)
      val lcs = bruteLcs(a, b)
      val expected = if (b.length == 1) lcs else if (lcs >= 2) lcs else 0
      got == expected
    })
  }

  private def bruteLcs(a: Array[Long], b: Array[Long]): Int = {
    var best = 0
    for (i <- a.indices; j <- b.indices) {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      if (k > best) best = k
    }
    best
  }

  test("char edit distance: symmetry, identity, bounds") {
    val s = Gen.alphaStr.map(_.take(12))
    check(Prop.forAll(s, s) { (x, y) =>
      val d = EditDistanceKernel.charDist(x, y)
      d == EditDistanceKernel.charDist(y, x) &&
        d >= math.abs(x.length - y.length) &&
        d <= math.max(x.length, y.length) &&
        (x != y || d == 0)
    })
  }

  test("minhash of identical shingle sets is identical; jaccard estimate within 0.25") {
    val genSet = Gen.chooseNum(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 60L)).map(_.distinct.toArray))
    check(Prop.forAll(genSet, genSet) { (sa, sb) =>
      val ma = Hashing.minhash(sa, 128, 7L)
      val mb = Hashing.minhash(sb, 128, 7L)
      val est = ma.zip(mb).count { case (x, y) => x == y } / 128.0
      val inter = sa.toSet.intersect(sb.toSet).size.toDouble
      val jac = inter / sa.toSet.union(sb.toSet).size
      Hashing.minhash(sa, 128, 7L).sameElements(ma) && math.abs(est - jac) <= 0.25
    })
  }

  test("quantization matches the reference's int-truncation semantics") {
    check(Prop.forAll(Gen.chooseNum(0f, 100f)) { cost =>
      val q = Costs.quantize(cost)
      q == ((10000f - cost * 100f).toInt / 10000.0).toFloat
    })
  }
}
