package graft.text

import java.text.Normalizer

/** Penalty-token flag bits, mirroring the reference enum
  * (/root/reference/include/fuzzy/fuzzy_match.hh:23-29). */
object PT {
  val none = 0
  val tag  = 1 << 0
  val pct  = 1 << 1
  val sep  = 1 << 2
  val jnr  = 1 << 3
  val nbr  = 1 << 4
  val cas  = 1 << 5
  /** Reference CLI default `-p nbr,tag,cas`
    * (/root/reference/cli/src/FuzzyMatch-cli.cc:329). */
  val default: Int = nbr | tag | cas
}

/** A tokenized + normalized sentence.
  *
  * `norm`  — normalized match-key tokens (the "pattern"),
  * `real`  — scoring forms: for case-featured words the single-letter case
  *           feature (L/U/C/M), otherwise the surface token
  *           (/root/reference/src/fuzzy_match.cc:131-134),
  * `itoks` — penalty-token text preceding real token i; length norm.length+1,
  *           "" where absent; index norm.length = trailing
  *           (/root/reference/include/fuzzy/sentence.hh:24-48),
  * `raw`   — the original (pre-normalization) tokens with their
  *           space-before flags (`rawSpace`), and `mapTokens` mapping norm
  *           position p → raw index after norm token p−1's raw token
  *           (length nTokens+1, mapTokens(0)=0), mirroring the reference's
  *           map_tokens (/root/reference/src/fuzzy_match.cc:121-143) — the
  *           basis for detokenizing a matched span (F8).
  */
final case class TokSent(
    norm: Array[String],
    real: Array[String],
    itoks: Array[String],
    raw: Array[String],
    rawSpace: Array[Boolean],
    mapTokens: Array[Int]) {
  def nTokens: Int = norm.length

  /** Surface string of the normalized span [pos, pos+len): the original raw
    * tokens between the span's raw boundaries, joined with their original
    * spacing — the reference's subsequence detokenization
    * (/root/reference/src/fuzzy_match.cc:341-348). */
  def detokenize(pos: Int, len: Int): String = {
    val from = mapTokens(pos)
    val until = mapTokens(pos + len)
    val sb = new java.lang.StringBuilder
    var k = from
    while (k < until) {
      if (k > from && rawSpace(k)) sb.append(' ')
      sb.append(raw(k))
      k += 1
    }
    sb.toString
  }
}

/** Deterministic NFC + aggressive tokenizer + penalty-flag normalization.
  *
  * Re-implements the documented subset of the reference's projection P1
  * (/root/reference/src/fuzzy_match.cc:43-58 NFC, :70-91 tokenizer flags,
  * :108-193 normalization). Pure Scala; no external tokenizer dependency.
  */
object Tokenizer {
  final val PhOpen  = '｟' // ｟
  final val PhClose = '｠' // ｠
  final val SpacerTok = "▁" // ▁ (OpenNMT spacer marker)
  final val JoinerTok = "￭" // ￭ (OpenNMT joiner marker)

  /** Raw token + whether it was preceded by whitespace in the source. */
  private final case class Raw(text: String, spaceBefore: Boolean)

  private def isSegmentedScript(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    (s == Character.UnicodeScript.HAN) || (s == Character.UnicodeScript.KATAKANA) ||
    (s == Character.UnicodeScript.HIRAGANA) || (s == Character.UnicodeScript.THAI) ||
    (s == Character.UnicodeScript.MYANMAR) ||
    Character.UnicodeBlock.of(cp) == Character.UnicodeBlock.KANBUN
  }

  /** Aggressive segmentation: split on whitespace, split letters/digits/other
    * at class changes, each non-alnum codepoint run of an identical char is
    * its own token, placeholders kept whole, CJK/Thai/Myanmar per-character. */
  private def rawTokenize(s: String): Array[Raw] = {
    val out = Array.newBuilder[Raw]
    val cur = new java.lang.StringBuilder
    var curClass = -1 // 0 letter, 1 digit, 2 other
    var curScript: Character.UnicodeScript = null
    var spaceBefore = false
    var pendingSpace = false

    def flush(): Unit = {
      if (cur.length > 0) {
        out += Raw(cur.toString, spaceBefore)
        cur.setLength(0)
        spaceBefore = false
      }
    }

    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (Character.isWhitespace(cp)) {
        flush(); pendingSpace = true
      } else if (cp == PhOpen.toInt) {
        // protected placeholder: consume through the closing mark
        flush()
        val sb = new java.lang.StringBuilder
        sb.appendCodePoint(cp)
        var j = i + w
        var closed = false
        while (j < n && !closed) {
          val c2 = s.codePointAt(j)
          sb.appendCodePoint(c2)
          j += Character.charCount(c2)
          if (c2 == PhClose.toInt) closed = true
        }
        spaceBefore = pendingSpace; pendingSpace = false
        out += Raw(sb.toString, spaceBefore)
        spaceBefore = false
        i = j - w // advance past consumed placeholder
      } else {
        val cls = if (Character.isLetter(cp)) 0 else if (Character.isDigit(cp)) 1 else 2
        val script = if (cls == 0) Character.UnicodeScript.of(cp) else null
        val boundary =
          cur.length > 0 && (
            cls != curClass ||
            (cls == 2) || // every non-alnum codepoint stands alone
            (cls == 0 && script != curScript) || // SegmentAlphabetChange
            (cls == 0 && isSegmentedScript(cp))) // per-char CJK/Thai/Myanmar
        if (boundary) flush()
        if (cur.length == 0) { spaceBefore = pendingSpace; pendingSpace = false }
        cur.appendCodePoint(cp)
        curClass = cls
        curScript = script
      }
      i += w
    }
    flush()
    out.result()
  }

  private def isPlaceholder(t: String): Boolean = t.nonEmpty && t.charAt(0) == PhOpen

  /** OpenNMT-style case feature: N (no cased letters), L (all lower),
    * U (all upper, >1 cased), C (leading upper, rest lower), M (mixed). */
  def caseFeature(t: String): String = {
    if (isPlaceholder(t)) return "N"
    var nCased = 0
    var nUpper = 0
    var firstIsUpper = false
    var upperOnlyFirst = true
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      val lo = Character.isLowerCase(cp)
      val up = Character.isUpperCase(cp)
      if (lo || up) {
        nCased += 1
        if (up) {
          nUpper += 1
          if (nCased == 1) firstIsUpper = true else upperOnlyFirst = false
        }
      }
      i += Character.charCount(cp)
    }
    if (nCased == 0) "N"
    else if (nUpper == 0) "L"
    else if (nUpper == nCased) { if (nCased == 1) "C" else "U" }
    else if (firstIsUpper && upperOnlyFirst) "C"
    else "M"
  }

  private def lowerCase(t: String): String = t.toLowerCase(java.util.Locale.ROOT)

  /** Parse the entity name of a placeholder `｟ent＃id：value｠`, collapsing
    * `it*` → `it` (/root/reference/src/fuzzy_match.cc:138-162). */
  def placeholderEntity(tok: String): String = {
    val open = tok.indexOf(PhOpen)
    val start = open + 1
    var end = tok.indexOf('＃', start) // ＃
    if (end < 0) end = tok.indexOf('：', start) // ：
    if (end < 0) end = tok.indexOf(PhClose, start)
    if (end < 0) end = tok.length
    var ent = tok.substring(start, end)
    if (ent.length >= 2 && ent.startsWith("it")) ent = "it"
    ent
  }

  /** Full P1 projection: NFC → aggressive tokenize → penalty-flag
    * normalization (/root/reference/src/fuzzy_match.cc:108-193). */
  def tokenize(sentence: String, pt: Int): TokSent = {
    val nfc = Normalizer.normalize(sentence, Normalizer.Form.NFC)
    val raws = rawTokenize(nfc)

    val norm = new scala.collection.mutable.ArrayBuffer[String]
    val real = new scala.collection.mutable.ArrayBuffer[String]
    val mapTok = new scala.collection.mutable.ArrayBuffer[Int]
    mapTok += 0
    val itoks = new scala.collection.mutable.HashMap[Int, StringBuilder]
    def addItok(idx: Int, s: String): Unit =
      itoks.getOrElseUpdate(idx, new StringBuilder).append(s)

    var k = 0
    while (k < raws.length) {
      val r = raws(k)
      // spacer/joiner pseudo-tokens become " " itoks (sep/jnr penalty modes)
      if ((pt & PT.jnr) != 0) {
        if (k > 0 && !r.spaceBefore) addItok(norm.length, " ")
      } else if ((pt & PT.sep) != 0) {
        if (k > 0 && r.spaceBefore) addItok(norm.length, " ")
      }
      val tok = r.text
      val realI = norm.length
      @inline def emit(n: String, re: String): Unit = {
        norm += n; real += re; mapTok += k + 1
      }
      val feat = if ((pt & PT.cas) != 0) caseFeature(tok) else "N"
      if ((pt & PT.cas) != 0 && feat != "N") {
        emit(lowerCase(tok), feat)
      } else if (isPlaceholder(tok)) {
        val ent = placeholderEntity(tok)
        if (ent == "it" && (pt & PT.tag) != 0) addItok(realI, "T")
        else emit(PhOpen.toString + ent + PhClose, tok)
      } else {
        val cp = if (tok.isEmpty) ' '.toInt else tok.codePointAt(0)
        if (Character.isDigit(cp)) {
          if ((pt & PT.nbr) != 0) emit(PhOpen + "num" + PhClose, tok)
          else emit(tok, tok)
        } else if (!Character.isLetter(cp) && (pt & PT.pct) != 0) {
          addItok(realI, tok)
        } else emit(tok, tok)
      }
      k += 1
    }

    val itokArr = Array.fill(norm.length + 1)("")
    itoks.foreach { case (i, sb) => if (i <= norm.length) itokArr(i) = sb.result() }
    TokSent(norm.toArray, real.toArray, itokArr,
      raws.map(_.text), raws.map(_.spaceBefore), mapTok.toArray)
  }
}
