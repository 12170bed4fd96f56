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

  /** Multi-band random-hyperplane LSH approximate nearest neighbors — the
    * scale path next to the exact q_ann_topk baseline. `bands` sketches of
    * `bits` hyperplanes each; a pair is a candidate iff it collides in ≥ 1
    * band (recall 1−(1−p^bits)^bands for per-plane agreement p); buckets
    * above `bucketCap` are dropped AND counted (never a silent quadratic
    * blow-up — same discipline as dedup/Candidates.scala). The embedding
    * dimension is read from the data, not hardcoded. Returns top-`k`
    * neighbors per query by within-candidate cosine. */
  def annLsh(
      spark: SparkSession,
      dir: String,
      bits: Int = 4,
      bands: Int = 24,
      bucketCap: Int = 4096,
      k: Int = 5): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val dim = e.head()._2.length
    val planes: Array[Array[Double]] = {
      val rng = new java.util.Random(7L)
      Array.fill(bands * bits)(Array.fill(dim)(rng.nextGaussian()))
    }
    val bc = spark.sparkContext.broadcast(planes)
    val cappedBuckets = spark.sparkContext.longAccumulator("annLshCappedBuckets")

    // one (bucket, id, emb, norm) row per band; bucket key = band ++ sketch
    val sketched = e.flatMap { case (id, emb) =>
      val ps = bc.value
      var nrm = 0.0
      var i = 0
      while (i < emb.length) { nrm += emb(i).toDouble * emb(i); i += 1 }
      nrm = math.sqrt(nrm)
      (0 until bands).iterator.map { band =>
        var sketch = 0L
        var b = 0
        while (b < bits) {
          val p = ps(band * bits + b)
          var dot = 0.0
          var j = 0
          while (j < emb.length) { dot += p(j) * emb(j); j += 1 }
          if (dot >= 0) sketch |= (1L << b)
          b += 1
        }
        ((band.toLong << 32) | sketch, id, emb, nrm)
      }
    }

    val pairs = sketched
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.toArray
        if (members.length > bucketCap) { cappedBuckets.add(1); Iterator.empty }
        else if (members.length < 2) Iterator.empty
        else {
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]
          var i = 0
          while (i < members.length) {
            var j = i + 1
            while (j < members.length) {
              val (_, ida, ea, na) = members(i)
              val (_, idb, eb, nb) = members(j)
              if (ida != idb) {
                var dot = 0.0
                var t = 0
                while (t < ea.length) { dot += ea(t).toDouble * eb(t); t += 1 }
                val sim = dot / (na * nb)
                if (ida < idb) out += ((ida, idb, sim)) else out += ((idb, ida, sim))
              }
              j += 1
            }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("a_id", "b_id", "sim")
      .dropDuplicates("a_id", "b_id")

    // both directions → top-k neighbors per query
    val both = pairs.select(col("a_id").as("q_id"), col("b_id").as("c_id"), col("sim"))
      .union(pairs.select(col("b_id").as("q_id"), col("a_id").as("c_id"), col("sim")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    val topk = both
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), round(col("sim"), 4).as("sim"),
        col("rn").cast("bigint").as("rn"))
    (topk, cappedBuckets)
  }

  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = annLsh(spark, dir)._1

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
