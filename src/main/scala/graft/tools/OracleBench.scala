package graft.tools

import graft.data.SynthCorpus
import graft.kernel.Matcher
import graft.oracle.FuzzyMatcher

/** Single-node reference-style throughput: build one global suffix-array
  * index over the synthetic corpus and run the match query per row,
  * single-threaded — the architecture of the reference CLI
  * (/root/reference/cli/src/FuzzyMatch-cli.cc) re-expressed by our oracle.
  * This is the "matches-or-beats the reference's single-node throughput"
  * yardstick in BASELINE.md.
  *
  * Usage: OracleBench [nClips=20000]
  */
object OracleBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val transcripts = SynthCorpus.transcripts(n)

    val tIdx0 = System.nanoTime()
    val fm = new FuzzyMatcher()
    transcripts.foreach { case (id, t) => fm.addTm(id, t) }
    fm.sort()
    val idxSec = (System.nanoTime() - tIdx0) / 1e9

    val params = Matcher.Params(fuzzy = 0.8f, numberOfMatches = 0)
    val tM0 = System.nanoTime()
    var pairs = 0L
    var i = 0
    while (i < fm.numSentences) {
      val res = Matcher.matchPattern(
        fm.suffixIndex, fm.doc, fm.doc(i),
        params.copy(maxTokensInPattern = 300))
      pairs += res.count(_.sIdx != i)
      i += 1
    }
    val matchSec = (System.nanoTime() - tM0) / 1e9
    println(f"""ORACLE_BENCH {"clips":$n,"index_sec":$idxSec%.2f,"match_sec":$matchSec%.2f,"pairs":$pairs,"clips_per_sec":${n / (idxSec + matchSec)}%.1f}""")
  }
}
