package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PipelineQueries

/** The r4 annLsh rewrite gate: the id-only codegen bucket equi-join + one
  * embedding re-join must produce EXACTLY the result set of the legacy
  * typed-groupByKey formulation it replaced (same hyperplanes, same cap
  * semantics, bit-identical cosine accumulation), and its physical plan must
  * be the scale shape — no typed group kernel shipping embeddings ×bands
  * through the shuffle. */
class AnnLshShapeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("ann-lsh-shape-spec")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  /** The r3 formulation, verbatim semantics: (bucket, id, emb, norm) rows
    * through a typed groupByKey, pair cosine inside the group kernel. Kept
    * here (test-only) as the equivalence reference for the rewrite. */
  private def legacyAnnLsh(bits: Int = 4, bands: Int = 24, bucketCap: Int = 4096,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val sketched = e.mapPartitions { it =>
      var ps: Array[Array[Double]] = null
      it.flatMap { case (id, emb) =>
        if (ps == null) {
          val rng = new java.util.Random(7L)
          ps = Array.fill(bands * bits)(Array.fill(emb.length)(rng.nextGaussian()))
        }
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
    }
    val pairs = sketched
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.toArray
        if (members.length > bucketCap || members.length < 2) Iterator.empty
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
    val both = pairs.select(col("a_id").as("q_id"), col("b_id").as("c_id"), col("sim"))
      .union(pairs.select(col("b_id").as("q_id"), col("a_id").as("c_id"), col("sim")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    both.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), round(col("sim"), 4).as("sim"),
        col("rn").cast("bigint").as("rn"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("rewritten annLsh is set-equal to the legacy groupByKey formulation on sf0.01") {
    val legacy = rows(legacyAnnLsh())
    val current = rows(PipelineQueries.annLsh(spark, dir)._1)
    assert(legacy.nonEmpty, "legacy formulation produced no rows — vacuous comparison")
    assert(current == legacy,
      s"rewrite diverged: ${(current -- legacy).take(5)} extra, ${(legacy -- current).take(5)} missing")
  }

  test("rewritten annLsh stays set-equal under a forced-low cap (capped buckets drop identically)") {
    val legacy = rows(legacyAnnLsh(bucketCap = 16))
    val current = rows(PipelineQueries.annLsh(spark, dir, bucketCap = 16)._1)
    assert(current == legacy,
      s"capped rewrite diverged: ${(current -- legacy).take(5)} extra, ${(legacy -- current).take(5)} missing")
  }

  test("embedding near-dup pairs: no false positives vs exact, recall >= 0.9 at the default threshold") {
    import spark.implicits._
    // exact truth with the SAME accumulation as the query's codegen exprs
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val nrm = e.map(v => math.sqrt(dot(v._2, v._2)))
    val thresh = 0.45
    val exact = (for {
      i <- e.indices; j <- (i + 1) until e.length
      sim = dot(e(i)._2, e(j)._2) / (nrm(i) * nrm(j))
      if sim >= thresh
    } yield {
      val (a, b) = (e(i)._1, e(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(exact.nonEmpty, "no exact pairs at the default threshold — vacuous fixture")
    val got = PipelineQueries.qEmbedDupPairs(spark, dir, simThreshold = thresh).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((got -- exact).isEmpty, s"false positives: ${(got -- exact).take(5)}")
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"embed near-dup recall $recall (${(got & exact).size}/${exact.size})")
  }

  test("negative vec_ids keep the numeric a_id < b_id orientation invariant") {
    import spark.implicits._
    // identical unit vectors collide in every band deterministically; the
    // signed-decimal encode orders negatives lexicographically BACKWARD
    // (-5 sorts before -7 numerically but "-…5" < "-…7" lexically), so this
    // fixture breaks any formulation that trusts the string orientation
    val u = Array(1f, 0f, 0f, 0f)
    val v = Array(0f, 1f, 0f, 0f)
    val tmp = java.nio.file.Files.createTempDirectory("ann-neg").toString
    Seq((-7L, u), (-5L, u), (3L, u), (-1L, v))
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    val got = PipelineQueries.qEmbedDupPairs(spark, tmp, simThreshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((-7L, -5L, 1.0), (-7L, 3L, 1.0), (-5L, 3L, 1.0)),
      s"orientation or pair set wrong with negative ids: $got")
  }

  test("annLsh physical plan: codegen bucket equi-join, no typed group kernel") {
    // the lazy plan probe: production annLsh checkpoints the pair set (so
    // its executed plan is a checkpoint scan) — the shape gate must look at
    // the un-materialized formulation
    val (df, release) = PipelineQueries.annLshPlan(spark, dir)
    val p = try df.queryExecution.executedPlan.toString finally release()
    assert(!p.contains("FlatMapGroups") && !p.contains("MapGroups"),
      s"typed group kernel back in the annLsh hot path:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"no equi-join in the annLsh plan:\n${p.take(2000)}")
  }
}
