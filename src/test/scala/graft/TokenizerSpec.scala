package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{PT, Tokenizer}

class TokenizerSpec extends AnyFunSuite {
  private val default = PT.default // nbr | tag | cas

  test("basic lowercase words get L case features") {
    val t = Tokenizer.tokenize("aa bb cc dd", default)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd"))
    assert(t.real.toSeq == Seq("L", "L", "L", "L"))
    assert(t.itoks.forall(_.isEmpty))
  }

  test("attached punctuation splits off (aggressive mode)") {
    val t = Tokenizer.tokenize("aa bb cc dd.", default)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd", "."))
    assert(t.real.toSeq == Seq("L", "L", "L", "L", "."))
  }

  test("case variants produce C/U/M features and lowercase norm") {
    val t = Tokenizer.tokenize("Dd DD dD d", default)
    assert(t.norm.toSeq == Seq("dd", "dd", "dd", "d"))
    assert(t.real.toSeq == Seq("C", "U", "M", "L"))
  }

  test("numbers normalize to ｟num｠ with pt_nbr, real keeps surface") {
    val t = Tokenizer.tokenize("aa 13 dd", default)
    assert(t.norm.toSeq == Seq("aa", "｟num｠", "dd"))
    assert(t.real.toSeq == Seq("L", "13", "L"))
    val t2 = Tokenizer.tokenize("aa 13 dd", PT.cas | PT.tag)
    assert(t2.norm.toSeq == Seq("aa", "13", "dd"))
  }

  test("it-placeholder becomes penalty itok T with pt_tag") {
    val t = Tokenizer.tokenize("aa ｟it｠ bb cc dd", default)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd"))
    assert(t.itoks(1) == "T")
    // without pt_tag the placeholder is kept as a normalized token
    val t2 = Tokenizer.tokenize("aa ｟it｠ bb", PT.nbr | PT.cas)
    assert(t2.norm.toSeq == Seq("aa", "｟it｠", "bb"))
  }

  test("placeholder entity parsing collapses it_xxx and strips id/value") {
    assert(Tokenizer.placeholderEntity("｟it_x＃1｠") == "it")
    assert(Tokenizer.placeholderEntity("｟ent＃4：foo｠") == "ent")
    assert(Tokenizer.placeholderEntity("｟num｠") == "num")
  }

  test("punctuation becomes an itok with pt_pct") {
    val t = Tokenizer.tokenize("aa bb cc dd.", default | PT.pct)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd"))
    assert(t.itoks(4) == ".")
  }

  test("spacer annotation with pt_sep records spaces as itoks") {
    val t = Tokenizer.tokenize("aa bb cc dd.", default | PT.sep)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd", "."))
    // spaces precede tokens 1..3; the '.' was attached (no spacer)
    assert(t.itoks(1) == " " && t.itoks(2) == " " && t.itoks(3) == " ")
    assert(t.itoks(4) == "")
  }

  test("joiner annotation with pt_jnr records joins as itoks") {
    val t = Tokenizer.tokenize("aa bb cc dd.", default | PT.jnr)
    assert(t.norm.toSeq == Seq("aa", "bb", "cc", "dd", "."))
    assert(t.itoks(4) == " ") // dd and . were joined
    assert(t.itoks(1) == "")
  }

  test("NFC normalization merges decomposed characters") {
    val composed = "été" // été
    val decomposed = "été"
    val a = Tokenizer.tokenize(composed, default)
    val b = Tokenizer.tokenize(decomposed, default)
    assert(a.norm.toSeq == b.norm.toSeq)
  }

  test("CJK segments per character, alphabet change splits") {
    val t = Tokenizer.tokenize("abc中文", default)
    assert(t.norm.toSeq == Seq("abc", "中", "文"))
  }

  test("letters and digits split at class change") {
    val t = Tokenizer.tokenize("mp3 x2", PT.cas)
    assert(t.norm.toSeq == Seq("mp", "3", "x", "2"))
  }

  test("empty and whitespace-only input yields no tokens") {
    assert(Tokenizer.tokenize("", default).norm.isEmpty)
    assert(Tokenizer.tokenize("   ", default).norm.isEmpty)
  }
}
