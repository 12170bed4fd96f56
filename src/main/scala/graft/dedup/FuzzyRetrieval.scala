package graft.dedup

import org.apache.spark.sql.Dataset
import graft.data.Clip
import graft.kernel.{Doc, Hashing, Matcher}
import graft.text.Tokenizer

/** One top-k retrieval result row — the reference `Match` as a table
  * (/root/reference/include/fuzzy/fuzzy_match.hh:32-46): `rank` is the
  * emission order (1 = best; top-k heap order, or contrastive selection
  * order when reranking). */
final case class RetrievalRow(
    query_id: String, rank: Int, s_id: String, score: Double, max_subseq: Int)

/** Best-subsequence retrieval result — the reference `-a subseq` output
  * (/root/reference/src/fuzzy_match.cc:250-365): at most one row per query;
  * `subseq_surface` is the detokenized surface string of the matched span
  * (F8, fuzzy_match.cc:341-348). */
final case class SubseqRow(
    query_id: String, s_id: String, score: Double, max_subseq: Int, subseq_surface: String)

/** Distributed top-k fuzzy retrieval — the reference's flagship user query
  * (`FuzzyMatch-cli -a match`, /root/reference/cli/src/FuzzyMatch-cli.cc:219-233
  * → /root/reference/src/fuzzy_match.cc:393-412): a query table probed
  * against an indexed corpus table, each query returning its top-n scored
  * matches with optional contrastive (MMR-style) rerank.
  *
  * Architecture = the reference's own: ONE suffix-array index over the
  * corpus, shared read-only by every worker, queries processed independently
  * (FuzzyMatch-cli.cc:82-193's thread pool becomes Spark map partitions over
  * the query table — embarrassingly parallel, no shuffle at all; the only
  * exchange in the whole plan is the corpus collect+broadcast). The corpus
  * index is built once per executor JVM and cached by broadcast id
  * (keep-last-1, shared with [[BroadcastVerifyStage]]).
  *
  * Scale envelope: the corpus must fit in executor memory (the same
  * condition as the reference's in-RAM `.fmi` index and as
  * [[DedupConfig.broadcastMaxRows]]/`broadcastMaxBytes` — a translation
  * memory of millions of segments fits comfortably). The QUERY side is
  * unbounded — 10^12 query rows stream through partition-parallel with zero
  * shuffle, which is the axis that actually grows in a training-data
  * pipeline (dedup-vs-reference-corpus, contamination checks against a
  * fixed eval set, TM lookup for an unbounded translation stream). A
  * beyond-memory CORPUS falls back to the self-dedup machinery's LSH
  * candidate path (union the two tables, tag sides, keep cross-side edges).
  */
object FuzzyRetrieval {

  /** Top-k fuzzy match of every query row against the corpus.
    *
    * @param numberOfMatches top-n per query (0 = unlimited, reference `-n`)
    * @param noPerfect drop exact matches (reference `-P`)
    * @param contrastiveFactor λ > 0 enables contrastive rerank R1
    *        (reference `-c`, fuzzy_match.cc:613-669)
    */
  def topk(
      queries: Dataset[Clip],
      corpus: Dataset[Clip],
      cfg: DedupConfig,
      numberOfMatches: Int = 5,
      noPerfect: Boolean = false,
      contrastiveFactor: Float = 0f,
      contrastReduce: Matcher.ContrastReduce = Matcher.Mean,
      contrastBuffer: Int = -1): Dataset[RetrievalRow] = {
    val spark = queries.sparkSession
    import spark.implicits._

    // index side: tokenize with the reference's insert-side filters (P2/P3)
    val corpusRows = TokenizeStage(corpus, cfg).collect()
    val bc = spark.sparkContext.broadcast(corpusRows)
    val bcId = bc.id

    val params = Matcher.Params(
      fuzzy = cfg.threshold,
      numberOfMatches = numberOfMatches,
      noPerfect = noPerfect,
      minSubseqLength = cfg.minSubseqLength,
      minSubseqRatio = cfg.minSubseqRatio,
      vocabIdfPenalty = cfg.vocabIdfPenalty,
      editCosts = cfg.editCosts,
      contrastiveFactor = contrastiveFactor,
      contrastReduce = contrastReduce,
      contrastBuffer = contrastBuffer,
      maxTokensInPattern = cfg.maxTokensInPattern)
    val useIdf = cfg.vocabIdfPenalty != 0f
    val pt = cfg.pt

    queries.mapPartitions { it =>
      val (index, docs, rows, df) = BroadcastVerifyStage.indexFor(bcId, bc.value, useIdf)
      val n = rows.length
      val idfMax = if (useIdf) math.log(n.toDouble).toFloat else 0.01f
      it.flatMap { q =>
        val ts = Tokenizer.tokenize(q.transcript, pt)
        if (ts.norm.isEmpty) Iterator.empty
        else {
          val pids = Hashing.tokenIds(ts.norm)
          val pattern = Doc(pids, ts.real, ts.itoks)
          // query tokens absent from the corpus carry 0 idf penalty, the
          // reference's unknown-word default (fuzzy_match.cc:367-390)
          val idf =
            if (useIdf) pids.map { id =>
              val d = df.getOrElse(id, 0)
              if (d > 0) math.log((n.toFloat / d.toFloat).toDouble).toFloat else 0f
            } else null
          Matcher.matchPattern(index, docs(_), pattern, params, idf, idfMax)
            .iterator.zipWithIndex.map { case (m, r) =>
              RetrievalRow(q.clip_id, r + 1, rows(m.sIdx).clip_id, m.score, m.maxSubseq)
            }
        }
      }
    }
  }

  /** Best-subsequence retrieval of every query row against the corpus
    * (reference `-a subseq`): at most one row per query — the corpus
    * sentence best matching the heaviest verifiable query subsequence. */
  def subsequence(
      queries: Dataset[Clip],
      corpus: Dataset[Clip],
      cfg: DedupConfig,
      numberOfMatches: Int = 5,
      noPerfect: Boolean = false,
      idfWeighting: Boolean = false): Dataset[SubseqRow] = {
    val spark = queries.sparkSession
    import spark.implicits._

    val corpusRows = TokenizeStage(corpus, cfg).collect()
    val bc = spark.sparkContext.broadcast(corpusRows)
    val bcId = bc.id
    val pt = cfg.pt
    val minSubseqLength = cfg.minSubseqLength
    val minSubseqRatio = cfg.minSubseqRatio

    queries.mapPartitions { it =>
      // df always needed: the -1 idf sentinel marks corpus-unknown query
      // words as subsequence breakers (fuzzy_match.cc:281-291)
      val (index, docs, rows, df) = BroadcastVerifyStage.indexFor(bcId, bc.value, true)
      val n = rows.length
      it.flatMap { q =>
        val ts = Tokenizer.tokenize(q.transcript, pt)
        if (ts.norm.isEmpty) Iterator.empty
        else {
          val pids = Hashing.tokenIds(ts.norm)
          val pattern = Doc(pids, ts.real, ts.itoks)
          val idf = pids.map { id =>
            val d = df.getOrElse(id, 0)
            if (d > 0) math.log((n.toFloat / d.toFloat).toDouble).toFloat else -1f
          }
          Matcher.subsequence(index, docs(_), pattern, numberOfMatches, noPerfect,
              minSubseqLength, minSubseqRatio, idfWeighting, idf)
            .map { case (m, pos, len) =>
              SubseqRow(q.clip_id, rows(m.sIdx).clip_id, m.score, m.maxSubseq,
                ts.detokenize(pos, len))
            }.iterator
        }
      }
    }
  }
}
