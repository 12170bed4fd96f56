package graft.tools

import graft.oracle.FuzzyMatcher
import graft.kernel.Matcher
import graft.text.PT

/** Minimal single-node CLI over the oracle matcher — the analog of the
  * reference's match-stream driver S4
  * (/root/reference/cli/src/FuzzyMatch-cli.cc:112-193): index a corpus file
  * (one sentence per line, 1-based line-number ids), then read patterns from
  * stdin and emit one `score:id[ score:id...]` TSV-ish line per input.
  *
  * Usage: OracleCli CORPUS [fuzzy=0.8] [nmatch=5] [noPerfect=false] [ml=3] [mr=0.3] [patternsFile]
  * Patterns come from `patternsFile` when given, else stdin.
  *
  * Index persistence — the reference's `-a index` / `-i file.fmi` workflow
  * (FuzzyMatch-cli.cc:417-443, S2/S3): a CORPUS ending in `.gfm` is LOADED
  * as a serialized index instead of re-indexed, and `GRAFT_SAVE_INDEX=path`
  * saves the built index after indexing (index once, match many).
  */
object OracleCli {
  def main(args: Array[String]): Unit = {
    implicit val codec: scala.io.Codec = scala.io.Codec.UTF8
    require(args.nonEmpty, "usage: OracleCli CORPUS [fuzzy] [nmatch] [noPerfect] [ml] [mr]")
    val corpus = args(0)
    val fuzzy = if (args.length > 1) args(1).toFloat else 0.8f
    val nmatch = if (args.length > 2) args(2).toInt else 5
    val noPerfect = if (args.length > 3) args(3).toBoolean else false
    val ml = if (args.length > 4) args(4).toInt else 3
    val mr = if (args.length > 5) args(5).toFloat else 0.3f

    // corpus may be plain text, .gz, a "src,tgt" parallel pair, inline
    // TAB-split bitext (reference import_tm, FuzzyMatch-cli.cc:32-79), or a
    // serialized .gfm index; GRAFT_ADD_TARGET=1 appends "=tgt" to ids,
    // =2 uses the target as the id
    val fm =
      if (corpus.endsWith(".gfm")) {
        // load() already rebuilds + sorts the suffix array — no second sort
        val loaded = FuzzyMatcher.load(corpus)
        System.err.println(s"loaded index $corpus")
        loaded
      } else {
        val m = new FuzzyMatcher(PT.default)
        val addTargetMode = sys.env.getOrElse("GRAFT_ADD_TARGET", "0")
        val n = CorpusImport.importTm(m, corpus,
          addTarget = addTargetMode == "1", addTargetNoIndex = addTargetMode == "2")
        m.sort()
        System.err.println(s"indexed $n sentences from $corpus")
        sys.env.get("GRAFT_SAVE_INDEX").foreach { p =>
          m.save(p)
          System.err.println(s"saved index to $p")
        }
        m
      }

    val params = Matcher.Params(fuzzy = fuzzy, numberOfMatches = nmatch,
      noPerfect = noPerfect, minSubseqLength = ml, minSubseqRatio = mr)
    var nonempty = 0L
    var total = 0L
    val patterns =
      if (args.length > 6) scala.io.Source.fromFile(args(6)).getLines()
      else scala.io.Source.stdin.getLines()
    patterns.foreach { pattern =>
      val res = fm.matchQuery(pattern, params)
      total += 1
      if (res.nonEmpty) nonempty += 1
      println(res.map(m => f"${m.score}%.4f:${fm.externalId(m.sIdx)}").mkString("\t"))
    }
    System.err.println(s"NMATCH $nonempty/$total")
  }
}
