package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.data.Clip
import graft.dedup.{DedupConfig, SigRow, TokRow}
import graft.kernel.Hashing
import graft.text.Tokenizer

/** Streaming facets of the dedup engine (Structured Streaming).
  *
  * The reference is strictly batch (its stdin loop is micro-batching,
  * /root/reference/cli/src/FuzzyMatch-cli.cc:112-193); these operators are
  * the incremental-ingest path a production corpus needs: signature
  * extraction on arrival, candidate generation against the existing corpus
  * via a stream-static band join, and stateful exact dedup within the
  * stream itself.
  */
object StreamingDedup {

  val clipSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Clip].schema

  /** Stateless per-clip tokenize + signatures — identical kernel as batch
    * stage 1, applied to a streaming Dataset (narrow, no state). */
  def signatures(clips: Dataset[Clip], cfg: DedupConfig): Dataset[SigRow] = {
    val spark = clips.sparkSession
    import spark.implicits._
    val pt = cfg.pt
    val maxTok = cfg.maxTokensInPattern
    val k = cfg.shingleK
    val perms = cfg.minhashPerms
    val bands = cfg.minhashBands
    val seed = cfg.seed
    clips.mapPartitions { it =>
      it.flatMap { c =>
        val ts = Tokenizer.tokenize(c.transcript, pt)
        if (ts.norm.isEmpty || ts.norm.length > maxTok) Iterator.empty
        else {
          val ids = Hashing.tokenIds(ts.norm)
          val sh = Hashing.distinctShingles(ids, k)
          val sig = Hashing.minhash(sh, perms, seed)
          Iterator.single(SigRow(c.clip_id, ts.norm.length,
            Hashing.bandHashes(sig, bands), Hashing.simhash(sh)))
        }
      }
    }
  }

  /** Candidate pairs of arriving clips against an existing (static) corpus:
    * explode band hashes on both sides, stream-static equi-join on the band
    * bucket, keep the length window (P5). Emits (stream_id, corpus_id). */
  def candidatesAgainstCorpus(
      streamSigs: Dataset[SigRow],
      corpusSigs: Dataset[SigRow],
      cfg: DedupConfig): DataFrame = {
    val s = streamSigs.toDF()
      .select(col("clip_id").as("stream_id"), col("n_tokens").as("stream_n"),
        posexplode(col("band_hashes")).as(Seq("band", "h")))
    val c = corpusSigs.toDF()
      .select(col("clip_id").as("corpus_id"), col("n_tokens").as("corpus_n"),
        posexplode(col("band_hashes")).as(Seq("band", "h")))
    s.join(c, Seq("band", "h"))
      .filter(col("stream_id") =!= col("corpus_id"))
      // P5 length window for unit costs: min/max length ratio must clear the threshold
      .filter(least(col("stream_n"), col("corpus_n")).cast("double") /
              greatest(col("stream_n"), col("corpus_n")) + lit(0.000005) >= cfg.threshold)
      .select("stream_id", "corpus_id").dropDuplicates()
  }

  private final case class SeenKey(fp: Long)

  /** Stateful exact dedup within the stream: key = 64-bit transcript
    * fingerprint; the FIRST clip per key passes, later arrivals are dropped
    * (flagged). Custom state via mapGroupsWithState (the engine's
    * KeyValueGroupedDataset state surface). */
  def firstOccurrence(clips: Dataset[Clip]): Dataset[(String, Long, Boolean)] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips
      .map(c => (Hashing.fnv1a64(c.transcript), c.clip_id))
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (fp: Long, rows: Iterator[(Long, String)], state: GroupState[String]) =>
          val first = rows.map(_._2).min
          if (state.exists) (state.get, fp, false) // duplicate of an earlier batch
          else { state.update(first); (first, fp, true) }
      }
  }

  /** Windowed ingest metrics with a watermark (the A6 counters as a
    * streaming rollup): clips and distinct-ish volume per 1-minute window. */
  def ingestMetrics(clipsWithTs: DataFrame): DataFrame =
    clipsWithTs
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("codec"))
      .agg(count(lit(1)).as("n_clips"), sum(length(col("transcript"))).as("chars"))

  /** Streaming top-k fuzzy retrieval: arriving query clips matched against
    * a STATIC indexed corpus — the reference's stdin match loop
    * (/root/reference/cli/src/FuzzyMatch-cli.cc:112-193) as a real stream.
    * Stateless: the corpus index is one broadcast shared by every
    * micro-batch, queries map through it with zero shuffle (append mode,
    * no watermark needed), so the unbounded axis is the query stream —
    * exactly the broadcast-path scale envelope of
    * [[graft.dedup.FuzzyRetrieval.topk]], which this delegates to (the
    * operator is already streaming-safe: narrow mapPartitions only). */
  def retrievalAgainstCorpus(
      queryStream: Dataset[Clip],
      corpus: Dataset[Clip],
      cfg: DedupConfig,
      numberOfMatches: Int = 5,
      noPerfect: Boolean = false): Dataset[graft.dedup.RetrievalRow] =
    graft.dedup.FuzzyRetrieval.topk(queryStream, corpus, cfg, numberOfMatches, noPerfect)

  /** End-to-end streaming signature extraction from a parquet directory
    * source to a sink table, used by tests and as the ingest-job template. */
  def runSignatureIngest(
      spark: SparkSession,
      inputDir: String,
      cfg: DedupConfig,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream.schema(clipSchema).parquet(inputDir).as[Clip]
    signatures(stream, cfg).writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
