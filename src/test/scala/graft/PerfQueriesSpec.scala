package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.DedupPipeline
import graft.kernel.Hashing
import graft.ops.{PipelineQueries, Queries}
import graft.text.{PT, Tokenizer}

/** The scale-hardened driver queries must keep their SEMANTICS: each
  * de-skewed / capped formulation is pinned to the naive definition on a
  * scale where the caps don't trigger, and the cap machinery is proven live
  * (accumulator counts) when forced. */
class PerfQueriesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("perf-queries-spec"), 4)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("len-window pairs: bucketed equi-join equals the naive lang-join + window filter") {
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang", "n_chars")
    val a = d.toDF("a_id", "lang", "a_chars")
    val b = d.toDF("b_id", "lang", "b_chars")
    val naive = a.join(b, "lang")
      .filter(col("a_id") < col("b_id") && abs(col("a_chars") - col("b_chars")) <= 5)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Queries.qLenWindowPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
  }

  test("len-window pairs: the join key is the composite (lang, bkt), not bare lang") {
    val p = Queries.qLenWindowPairs(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("bkt"), s"char-bucket missing from the physical join key:\n${p.take(2000)}")
  }

  test("jaccard pairs: capped formulation equals uncapped truth where no shingle is hot") {
    // sf0.001 has ~50 docs — every (lang, shingle) df is far below the cap,
    // so the capped query must reproduce the raw Jaccard definition exactly
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
      .filter(_._3.length >= 3)
      .map { case (id, lang, tk) =>
        (id, lang, tk.sliding(3).map(_.mkString(" ")).toSet)
      }
    val naive = (for {
      i <- d.indices; j <- (i + 1) until d.length
      if d(i)._2 == d(j)._2
      (aId, bId, aSh, bSh) =
        if (d(i)._1 < d(j)._1) (d(i)._1, d(j)._1, d(i)._3, d(j)._3)
        else (d(j)._1, d(i)._1, d(j)._3, d(i)._3)
      common = (aSh & bSh).size
      jac = common.toDouble / (aSh.size + bSh.size - common)
      if jac >= 0.2
    } yield (aId, bId)).toSet
    val got = Queries.qJaccardPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }

  /** SimHash of a document exactly as minhashSigsWide computes it. */
  private def simhashOf(text: String): Long = {
    val ts = Tokenizer.tokenize(text, PT.default)
    Hashing.simhash(Hashing.distinctShingles(Hashing.tokenIds(ts.norm), 3))
  }

  test("simhash pairs: capped bucket join equals brute-force hamming ≤ 6 truth") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0).toString, simhashOf(r.getString(1))))
    val naive = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      if java.lang.Long.bitCount(docs(i)._2 ^ docs(j)._2) <= 6
      p = if (docs(i)._1 < docs(j)._1) (docs(i)._1, docs(j)._1) else (docs(j)._1, docs(i)._1)
    } yield p).toSet
    val (df, capped) = PipelineQueries.simhashPairs(spark, dir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.value == 0, s"cap triggered at sf0.001: ${capped.value}")
    assert(got == naive, s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }

  test("simhash pairs: forced low cap triggers the accumulator, never a silent blow-up") {
    val (df, capped) = PipelineQueries.simhashPairs(spark, dir, bucketCap = 1)
    df.collect()
    assert(capped.value > 0, "bucketCap=1 never triggered — cap machinery dead")
  }
}
