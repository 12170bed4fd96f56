package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.data.Clip
import graft.dedup._
import graft.kernel.Hashing
import graft.text.{PT, Tokenizer}

/** Queries whose semantics are not ANSI-SQL-expressible (hash signatures,
  * LSH, full pipeline) — registered without oracle SQL; the driver records a
  * rows-only check for these. */
object PipelineQueries {

  /** documents table → Clip dataset (transcript-driven dedup; bytes are an
    * opaque pass-through payload, here a minimal WAV). */
  def documentsAsClips(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[Clip] = {
    import spark.implicits._
    val wav = graft.data.AudioPcm.synthWav(1L, 16, 16000)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .as[(String, String)]
      .map { case (id, text) => Clip(id, wav, 16000, 1, "pcm_s16le", text) }
  }

  /** MinHash + SimHash signatures over documents (stage-1 operator): internal
    * wide form with the full band-hash array per doc. */
  private def minhashSigsWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .map { case (id, text) =>
        val ts = Tokenizer.tokenize(text, PT.default)
        val ids = Hashing.tokenIds(ts.norm)
        val sh = Hashing.distinctShingles(ids, 3)
        val sig = Hashing.minhash(sh, 128, 42L)
        (id, ts.norm.length.toLong, Hashing.bandHashes(sig, 32), Hashing.simhash(sh))
      }
      .toDF("doc_id", "n_tokens", "band_hashes", "simhash")
  }

  /** MinHash band signatures, exploded to scalar columns
    * (doc_id, n_tokens, band, band_hash) so downstream tooling can sort/hash
    * rows (array columns are opaque to the driver's comparator). */
  def qMinhashSigs(spark: SparkSession, dir: String): DataFrame =
    minhashSigsWide(spark, dir)
      .select(col("doc_id"), col("n_tokens"),
        posexplode(col("band_hashes")).as(Seq("band", "band_hash")))
      .select(col("doc_id"), col("n_tokens"),
        col("band").cast("bigint").as("band"), col("band_hash"))

  /** SimHash near-dup pairs: bucket by 7 disjoint bit-chunks (10+6×9 bits).
    * Pigeonhole: a pair with hamming distance ≤ 6 differs in ≤ 6 chunks, so
    * at least one of the 7 chunks is identical on both sides and the pair
    * meets in that chunk's bucket — full recall at the hamming ≤ 6 verify. */
  def qSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = minhashSigsWide(spark, dir).select("doc_id", "simhash")
      .as[(String, Long)]
    // chunk c covers bits [offsets(c), offsets(c+1)); 7 chunks tile all 64
    val offsets = Array(0, 10, 19, 28, 37, 46, 55, 64)
    val buckets = sigs.flatMap { case (id, sh) =>
      (0 until 7).map { c =>
        val width = offsets(c + 1) - offsets(c)
        val chunk = (sh >>> offsets(c)) & ((1L << width) - 1)
        (chunk | (c.toLong << 32), id, sh)
      }
    }.toDF("bucket", "doc_id", "simhash")
    val a = buckets.toDF("bucket", "a_id", "a_sh")
    val b = buckets.toDF("bucket", "b_id", "b_sh")
    a.join(b, "bucket")
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)").cast("bigint"))
      .filter(col("hamming") <= 6)
      .select("a_id", "b_id", "hamming")
      .distinct()
  }

  /** LSH-bucketed approximate nearest neighbors: 12-bit random-hyperplane
    * sketch → bucket join → within-bucket cosine (the scale path next to the
    * exact q_ann_topk baseline). */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBits = 12
    val dim = 64
    val planes: Array[Array[Double]] = {
      val rng = new java.util.Random(7L)
      Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
    }
    val bc = spark.sparkContext.broadcast(planes)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val sketched = e.map { case (id, emb) =>
      val ps = bc.value
      var bucket = 0L
      var b = 0
      while (b < ps.length) {
        var dot = 0.0
        var i = 0
        while (i < emb.length && i < dim) { dot += ps(b)(i) * emb(i); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      (bucket, id, emb)
    }.toDF("bucket", "vec_id", "embedding")

    val a = sketched.toDF("bucket", "q_id", "a_emb")
    val b = sketched.toDF("bucket", "c_id", "b_emb")
    a.join(b, "bucket").filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)"))
      .select("q_id", "c_id", "sim")
  }

  /** Full dedup pipeline over documents-as-clips: cluster assignments. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val cfg = DedupConfig(threshold = 0.8f)
    DedupPipeline.run(documentsAsClips(spark, dir), cfg).clusters.toDF()
  }

  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_minhash_sigs" -> (qMinhashSigs _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_audio_meta" -> (AudioOps.qAudioMeta _),
    "q_audio_energy" -> (AudioOps.qAudioEnergy _)
  )
}
