package graft.kernel

/** Word-level edit operation costs
  * (/root/reference/include/fuzzy/costs.hh:7-29). */
final case class EditCosts(insert: Float = 1f, delete: Float = 1f, replace: Float = 1f) {
  def isNull: Boolean = insert == 0f && delete == 0f && replace == 0f
}

/** Per-pair cost scaling (/root/reference/include/fuzzy/costs.hh:31-65).
  * `diffWord = 100 / normalizer`; diffReal/diffCase are the fixed penalties
  * for same-norm-different-real tokens. */
object Costs {
  val DiffReal: Float = 2.0f
  val DiffCase: Float = 1.0f

  /** Reference `Costs::get_normalizer`
    * (/root/reference/include/fuzzy/costs.hh:33-47). */
  def normalizer(patternLength: Int, sentenceLength: Int, ec: EditCosts): Float = {
    if (ec.isNull) 1f
    else if (ec.insert + ec.delete <= ec.replace)
      ec.insert * patternLength.toFloat + ec.delete * sentenceLength.toFloat
    else if (patternLength <= sentenceLength)
      (ec.replace - ec.delete) * patternLength.toFloat + ec.delete * sentenceLength.toFloat
    else
      (ec.replace - ec.insert) * sentenceLength.toFloat + ec.insert * patternLength.toFloat
  }

  def diffWord(patternLength: Int, sentenceLength: Int, ec: EditCosts): Float =
    100f / normalizer(patternLength, sentenceLength, ec)

  /** Score quantization: C++ `float score = int(10000 - cost*100)/10000.0`
    * — truncation then float rounding (/root/reference/src/fuzzy_match.cc:598).
    * The float result matters: threshold comparisons happen in float. */
  def quantize(cost: Float): Float = ((10000f - cost * 100f).toInt / 10000.0).toFloat
}
