package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract operator queries over the /root/testdata tables, each with
  * an equivalent DuckDB oracle SQL (see `oracle`). Every aggregate/computed
  * column is aliased IDENTICALLY on both sides; doubles are rounded so both
  * engines hash equal values; counts/sizes are cast to BIGINT to match
  * DuckDB's default integer widths.
  *
  * Sections mirror SURVEY.md §2's operator inventory: scans/filters (S1/P*),
  * aggregations (A3/A4/A6), top-k (O2), joins, plus the training-pipeline
  * operator family (dedup, similarity, text analysis) the engine adds.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------------- relational core ----------------

  /** TPC-H Q1-style flagship aggregation (A-family; scan → groupBy → agg). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
  }

  /** Filter + projection + deterministic top-k (P-family + O2). */
  def qFilterTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 45.0 && col("l_discount") >= 0.05)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)
  }

  /** Broadcast join + aggregation. */
  def qJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
  }

  /** Ranking window: top-3 orders per priority (O2 as a window). */
  def qWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("rn").cast("bigint").as("rn"))
  }

  /** Time-window aggregation over the events stream table (batch form of the
    * streaming hourly rollup). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
  }

  // ---------------- text / dedup operator family ----------------

  private def toks(c: Column): Column = split(c, " ")

  /** Word document-frequency (A3 — the reference's sfreq,
    * /root/reference/src/vocab_indexer.cc:73-90). */
  def qDocFreq(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents")
      .select(explode(array_distinct(toks(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
  }

  /** IDF penalty vector (A4 — /root/reference/src/fuzzy_match.cc:367-390).
    * The corpus size N is folded in as a broadcast cross-joined 1-row agg
    * (one job, no separate driver-side count() scan). */
  def qIdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    docs.select(explode(array_distinct(toks(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("token"), col("df"), round(log(col("n_docs") / col("df")), 4).as("idf"))
  }

  /** Token counting (P3 length basis). */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), size(toks(col("text"))).cast("bigint").as("n_tokens"))

  /** Exact deduplication: hash-group by full text (cluster rep = min id). */
  def qExactDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("text")
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("dup_count"))
      .select("rep_doc_id", "dup_count")

  /** Length-window candidate pre-rejection P5 as a pair filter
    * (/root/reference/src/ngram_matches.cc:31-39 recast relationally).
    * De-skewed formulation: `lang` alone has a handful of distinct values, so
    * a bare-lang equi-join is a per-language near-cartesian product at scale.
    * Instead the ±5-char window is folded into the join key as a char-bucket
    * (`n_chars DIV 5`): the probe side explodes to its 3 admissible buckets
    * (|a−b| ≤ 5 ⇒ bucket diff ≤ 1) and the join runs on the fine-grained
    * (lang, bucket) key — per-key cardinality is O(docs per 5-char band), not
    * O(docs per language). Each qualifying pair meets in exactly one probe
    * bucket (b's own), so no dedup is needed and the result set is identical
    * to the bare-lang join + post-filter (oracle SQL unchanged). */
  def qLenWindowPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select("doc_id", "lang", "n_chars")
      .withColumn("bkt", floor(col("n_chars") / 5))
    val a = d.select(col("doc_id").as("a_id"), col("lang"), col("n_chars").as("a_chars"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
    val b = d.select(col("doc_id").as("b_id"), col("lang"), col("n_chars").as("b_chars"), col("bkt"))
    a.join(b, Seq("lang", "bkt"))
      .filter(col("a_id") < col("b_id") && abs(col("a_chars") - col("b_chars")) <= 5)
      .select("a_id", "b_id")
  }

  /** Distinct k-gram shingle count per document (J2's shingling basis). */
  def qNgramShingles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("tk", toks(col("text")))
      .select(col("doc_id"),
        when(size(col("tk")) >= 3,
          size(array_distinct(expr(
            "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', slice(tk, i + 1, 3)))"))))
          .otherwise(lit(0)).cast("bigint").as("n_shingles"))

  /** Quality scoring: token/char stats per document. */
  def qQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("tk", toks(col("text")))
      .select(
        col("doc_id"),
        size(col("tk")).cast("bigint").as("n_tokens"),
        length(col("text")).cast("bigint").as("text_len"),
        round((length(col("text")) - (size(col("tk")) - 1)).cast("double") / size(col("tk")), 4)
          .as("avg_tok_len"),
        round(size(array_distinct(col("tk"))).cast("double") / size(col("tk")), 4)
          .as("distinct_ratio"))

  /** Language-ID heuristic: stopword-hit ratio (integer-safe scoring). */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")
    t(spark, dir, "documents")
      .withColumn("tk", toks(col("text")))
      .select(
        col("doc_id"),
        size(expr(s"filter(tk, x -> x in (${stop.map(s => s"'$s'").mkString(",")}))"))
          .cast("bigint").as("stop_hits"),
        size(col("tk")).cast("bigint").as("n_tokens"))
      .withColumn("pred_lang",
        when(col("stop_hits") * 20 >= col("n_tokens"), lit("en")).otherwise(lit("other")))
  }

  /** Document fingerprint: rolling polynomial hash (31, mod 2^31−1) over the
    * text — identical integer arithmetic on both engines, computed by the
    * native codegen expression (functions/TextExprs.scala; the SQL
    * aggregate-over-transform form ran two interpreted lambdas per char). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextExprs.rollingHashF(col("text")).as("fp"))

  /** Max documents sharing one (lang, shingle) before the shingle is dropped
    * from every document's set — the hot-shingle valve (mirrored exactly in
    * the DuckDB oracle, so the capped semantics ARE the query). */
  val jaccardShingleDfCap = 128

  /** N-gram Jaccard near-dup pairs (same-lang, distinct 3-gram shingles).
    * Scalable formulation: inverted shingle index join + per-pair overlap
    * count (never materializes the all-pairs cross product — pairs with no
    * shared shingle have J = 0 and can't clear the threshold), with the
    * dedup/Candidates.scala hot-bucket discipline applied to the index: a
    * shingle present in more than [[jaccardShingleDfCap]] same-lang documents
    * is dropped from ALL shingle sets (sizes and intersections alike) and the
    * drop is COUNTED. Stop-shingle df grows linearly with the corpus, so an
    * uncapped index emits df² join rows per hot shingle — the quadratic wall
    * at 100×; with the cap each surviving bucket is O(cap²) and the hot set
    * itself is tiny. Soundness: Jaccard is then measured over the cold
    * (informative) shingle vocabulary — near-dups share cold shingles in
    * proportion to their overlap, while pairs related ONLY through ubiquitous
    * shingles are exactly the false-positive class the cap exists to kill.
    * ONE wide exchange on (lang, sh), run once and CACHED post-shuffle: the
    * tokenize+shingle-explode scan — the dominant map cost — and its
    * exchange both execute exactly once per invocation. The eager hot-key
    * stats job materializes the cache (and its df-agg is then NARROW: the
    * cached scan preserves the hash partitioning on (lang, sh)), and the
    * anti-join probe and both self-join sides read it locally — stronger
    * than the pre-r5 ReusedExchange shape, which still re-ran the full
    * tokenize scan for the eager stats action (shuffle files are not
    * reused across actions; the driver bench's dominant cost two rounds
    * running).
    *
    * Returned lazily with a release handle: callers must invoke the handle
    * once their action has materialized; [[qJaccardPairs]] does
    * materialize+release. */
  def jaccardPairs(spark: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val cap = jaccardShingleDfCap
    // (lang, shingle-string) folded into ONE 64-bit xxhash64 key right after
    // the explode (r6, guide §2.3 "narrower types"): the self-join below
    // multiplies each bucket's df² — comparing/hashing/shuffling a ~20-char
    // string pair per join row was the stage's dominant CPU (measured 42
    // task-seconds at sf0.1; 8-byte keys cut it ~4×). Same 64-bit hash
    // envelope as every bucketed channel in the engine (Hashing.mix64
    // shingles, band hashes): a cross-(lang,shingle) collision would need
    // ~2^32 distinct shingles in one corpus to become likely; equality vs
    // the string-keyed DuckDB oracle is re-verified on all three SFs
    // (PerfQueriesSpec + the driver board).
    val d = t(spark, dir, "documents")
      .withColumn("tk", toks(col("text")))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), col("lang"), explode(array_distinct(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', slice(tk, i + 1, 3)))")))
        .as("sh_str"))
      .select(col("doc_id"), xxhash64(col("lang"), col("sh_str")).as("sh"))
    // partition count derived from INPUT SIZE (~32 MB of 16-byte entry rows
    // per partition; entries ≈ one per token, ≈ 8× the parquet bytes), not
    // the session shuffle default: the cached entry set is read by the hot
    // stats agg, the anti-join and both self-join sides, and a fixed
    // cores-sized partition count charges every read a wave of near-empty
    // tasks on a small corpus while under-splitting a 100 TB one (guide §2:
    // derive partitioning from input size, not a constant).
    val docBytes = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      scala.util.Try(fs.getContentSummary(p).getLength).getOrElse(0L)
    }
    val parts = math.max(1L, math.min(docBytes * 8 / (32L << 20) + 1, 1 << 20)).toInt
    val parted = d.repartition(parts, col("sh")).persist()
    // ONE eager stats job off the cached exchange — the first action, so it
    // pays tokenize+explode+shuffle once and populates the cache every
    // later read serves from. It returns the hot KEYS, so the drop is
    // COUNTED locally (the repo's never-silent-capping discipline) and the
    // anti-join probe is a broadcast local relation — no second aggregation
    // in the main job. The hot set is tiny by construction (stop-shingles
    // of a language); the take() bound guards the driver against a
    // pathological corpus, falling back to a shuffled anti-join over the
    // cached entries.
    val hotBound = 1000000
    val hotArr = parted.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("sh")
      .limit(hotBound + 1).collect()
    val cappedShingles = spark.sparkContext.longAccumulator("jaccardCappedShingles")
    val cold =
      if (hotArr.length <= hotBound) {
        cappedShingles.add(hotArr.length)
        if (hotArr.isEmpty) parted
        else {
          import spark.implicits._
          val hot = hotArr.map(_.getLong(0)).toSeq.toDF("sh")
          parted.join(broadcast(hot), Seq("sh"), "left_anti")
        }
      } else {
        // beyond the broadcast bound (pathological): pay a second agg pass
        // (off the cache) for the EXACT capped count — the never-silent
        // discipline's metric must not be a truncated lower bound — and
        // recompute the hot set on the exchange for a shuffled anti-join
        cappedShingles.add(
          parted.groupBy("sh").agg(count(lit(1)).as("df"))
            .filter(col("df") > cap).count())
        val hot = parted.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh")
        parted.join(hot, Seq("sh"), "left_anti")
      }
    val sizes = cold.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = cold.select(col("doc_id").as("a_id"), col("sh"))
    val b = cold.select(col("doc_id").as("b_id"), col("sh"))
    val out = a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"))
      .join(sizes.toDF("a_id", "a_n"), "a_id")
      .join(sizes.toDF("b_id", "b_n"), "b_id")
      .withColumn("jac_raw",
        col("common").cast("double") / (col("a_n") + col("b_n") - col("common")))
      // threshold on the UNROUNDED value (same predicate as the DuckDB oracle;
      // rounding-first could admit jac ∈ [0.19995, 0.2) that the oracle rejects)
      .filter(col("jac_raw") >= 0.2)
      .select(col("a_id"), col("b_id"), round(col("jac_raw"), 4).as("jac"))
    (out, () => parted.unpersist())
  }

  /** [[jaccardPairs]] with the materialize+release cache discipline — the
    * registered query surface (ONE tokenize+explode scan per invocation, no
    * cache pinned past the call). */
  def qJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val (df, release) = jaccardPairs(spark, dir)
    PipelineQueries.materializeThenRelease(df)(release())
  }

  /** Short-pattern containment (the reference subsequence probe J4,
    * /root/reference/src/fuzzy_match.cc:250-365, recast relationally): each
    * document's 6-token prefix is the probe pattern; emit every document that
    * contains it as a contiguous token run. Scale-safe formulation: candidate
    * containers come from an inverted index on the pattern's leading 3-gram
    * shingle (equi-join, mirrors the reference's equal_range seed), then the
    * full 6-token window is verified positionally — never an all-pairs scan. */
  def qSubseqContained(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").withColumn("tk", toks(col("text")))
    val pats = docs.filter(size(col("tk")) >= 6)
      .select(col("doc_id").as("short_id"),
        concat_ws(" ", slice(col("tk"), 1, 3)).as("sh"),
        concat_ws(" ", slice(col("tk"), 1, 6)).as("pat"))
    val windows = docs.filter(size(col("tk")) >= 3)
      .select(col("doc_id").as("container_id"), col("tk"),
        posexplode(expr(
          "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', slice(tk, i + 1, 3)))"))
          .as(Seq("pos", "sh")))
    pats.join(windows, "sh")
      .filter(concat_ws(" ", expr("slice(tk, pos + 1, 6)")) === col("pat"))
      .select("short_id", "container_id")
      .distinct()
  }

  // ---------------- similarity search (embeddings) ----------------
  // vector math runs through graft's native codegen expressions
  // (functions/VectorExprs.scala) — the SQL aggregate(zip_with(...)) forms
  // they replace evaluate an interpreted lambda per element and fence off
  // whole-stage codegen; results are bit-identical (same accumulation order)

  import graft.functions.VectorExprs.{dotF, l2normF}

  /** L2 norm per embedding (vector scalar function family). */
  def qEmbedNorm(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), round(l2normF(col("embedding")), 4).as("l2"))

  /** Brute-force cosine top-5 neighbors for the first 10 vectors (the exact
    * ANN baseline; the LSH-bucketed variant is the scale path). */
  def qAnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), l2normF(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 10).toDF("q_id", "a_emb", "a_nrm")
    val c = e.toDF("c_id", "b_emb", "b_nrm")
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("sim", round(dotF(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("c_id"), col("sim"), col("rn").cast("bigint").as("rn"))
  }

  // ---------------- oracle SQL (DuckDB) ----------------

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS cnt FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        | WHERE l_quantity >= 45.0 AND l_discount >= 0.05
        | ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_window_topk" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2""".stripMargin,
    "q_doc_freq" ->
      """SELECT token, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        | GROUP BY 1""".stripMargin,
    "q_idf" ->
      """WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        | df AS (SELECT token, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY 1)
        | SELECT token, df, round(ln(n.n / df.df), 4) AS idf FROM df, n""".stripMargin,
    "q_token_count" ->
      "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents",
    "q_exact_dedup" ->
      """SELECT min(doc_id) AS rep_doc_id, count(*) AS dup_count FROM documents GROUP BY text""".stripMargin,
    "q_len_window_pairs" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM documents a JOIN documents b
        | ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 5""".stripMargin,
    "q_ngram_shingles" ->
      """SELECT doc_id, (CASE WHEN len(tk) >= 3 THEN
        |  len(list_distinct([array_to_string(tk[i+1:i+3], ' ') for i in range(0, len(tk) - 2)]))
        |  ELSE 0 END)::BIGINT AS n_shingles
        | FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)""".stripMargin,
    "q_quality" ->
      """SELECT doc_id, len(tk)::BIGINT AS n_tokens, length(text)::BIGINT AS text_len,
        | round((length(text) - (len(tk) - 1))::DOUBLE / len(tk), 4) AS avg_tok_len,
        | round(len(list_distinct(tk))::DOUBLE / len(tk), 4) AS distinct_ratio
        | FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)""".stripMargin,
    "q_langid" ->
      """SELECT doc_id, stop_hits, n_tokens,
        | CASE WHEN stop_hits * 20 >= n_tokens THEN 'en' ELSE 'other' END AS pred_lang
        | FROM (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '),
        |   x -> x IN ('the','a','of','to','and','in','is','for','on','with')))::BIGINT AS stop_hits,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents)""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
        |  [unicode(text[i:i])::BIGINT for i in range(1, length(text) + 1)]),
        |  (acc, c) -> (acc * 31 + c) % 2147483647) AS fp FROM documents""".stripMargin,
    "q_jaccard_pairs" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |   unnest(list_distinct([array_to_string(tk[i+1:i+3], ' ') for i in range(0, len(tk) - 2)])) AS sh
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents)
        |  WHERE len(tk) >= 3),
        | cold AS (SELECT d.* FROM d JOIN (
        |   SELECT lang, sh FROM d GROUP BY 1, 2 HAVING count(*) <= $jaccardShingleDfCap)
        |  USING (lang, sh)),
        | sizes AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
        | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
        |  FROM cold a JOIN cold b ON a.lang = b.lang AND a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        | SELECT a_id, b_id, round(common::DOUBLE / (sa.n + sb.n - common), 4) AS jac
        | FROM pairs JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
        | WHERE common::DOUBLE / (sa.n + sb.n - common) >= 0.2""".stripMargin,
    "q_subseq_contained" ->
      """WITH p AS (SELECT doc_id AS short_id, array_to_string((string_split(text, ' '))[1:6], ' ') AS pat
        |  FROM documents WHERE len(string_split(text, ' ')) >= 6)
        | SELECT DISTINCT p.short_id, d.doc_id AS container_id
        | FROM p JOIN documents d ON instr(' ' || d.text || ' ', ' ' || p.pat || ' ') > 0""".stripMargin,
    // audio channel: PCM is synthesized identically per doc_id/4 group (see
    // PipelineQueries.qAudioDupPairs), so the expected pair set is exactly
    // the within-group pairs and every pair's head correlation is exactly 1.0
    "q_audio_dup_pairs" ->
      """SELECT printf('doc_%08d', a.doc_id) AS a, printf('doc_%08d', b.doc_id) AS b,
        | 1.0::DOUBLE AS corr FROM documents a JOIN documents b
        | ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id""".stripMargin,
    // audio containment on the same corpus: group members share identical
    // PCM of EQUAL length, so containment reduces to the equal-length
    // offset-0 dup case — same pair set, offset 0, corr exactly 1.0
    // (proper shorter-inside-longer containment is spec-tested on planted
    // structured audio, which the corpus tables cannot express)
    "q_audio_contained" ->
      """SELECT printf('doc_%08d', a.doc_id) AS inner_id, printf('doc_%08d', b.doc_id) AS outer_id,
        | 0::BIGINT AS offset_frames, 1.0::DOUBLE AS corr
        | FROM documents a JOIN documents b
        | ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id""".stripMargin,
    "q_embed_norm" ->
      """SELECT vec_id, round(sqrt(list_reduce(list_prepend(0::DOUBLE,
        |  [x::DOUBLE * x::DOUBLE for x in embedding]), (a, b) -> a + b)), 4) AS l2
        | FROM embeddings""".stripMargin,
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding,
        |   sqrt(list_reduce(list_prepend(0::DOUBLE, [x::DOUBLE * x::DOUBLE for x in embedding]),
        |        (a, b) -> a + b)) AS nrm FROM embeddings),
        | p AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |   round(list_reduce(list_prepend(0::DOUBLE,
        |     [a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE for i in range(0, len(a.embedding))]),
        |     (x, y) -> x + y) / (a.nrm * b.nrm), 4) AS sim
        |  FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
        | SELECT q_id, c_id, sim, rn FROM (
        |  SELECT q_id, c_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rn
        |  FROM p) WHERE rn <= 5""".stripMargin
  )

  /** Registry of SQL-oracled queries (names match `oracle` keys). */
  val sqlOracled: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_filter_topk" -> (qFilterTopk _),
    "q_join_agg" -> (qJoinAgg _),
    "q_window_topk" -> (qWindowTopk _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_doc_freq" -> (qDocFreq _),
    "q_idf" -> (qIdf _),
    "q_token_count" -> (qTokenCount _),
    "q_exact_dedup" -> (qExactDedup _),
    "q_len_window_pairs" -> (qLenWindowPairs _),
    "q_ngram_shingles" -> (qNgramShingles _),
    "q_quality" -> (qQuality _),
    "q_langid" -> (qLangId _),
    "q_fingerprint" -> (qFingerprint _),
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_subseq_contained" -> (qSubseqContained _),
    "q_embed_norm" -> (qEmbedNorm _),
    "q_ann_topk" -> (qAnnTopk _)
  )
}
