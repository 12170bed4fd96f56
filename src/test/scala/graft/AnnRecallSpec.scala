package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PipelineQueries, Queries}

/** The LSH ANN path must stay close to the exact brute-force baseline:
  * recall ≥ 0.9 of the true cosine top-5 on the sf0.01 embeddings, with the
  * per-bucket cap machinery proven live (capped buckets are counted, never a
  * silent quadratic blow-up). */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("ann-recall-spec")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("LSH ANN recall >= 0.9 vs exact top-5 on sf0.01; no bucket capped at defaults") {
    val exact = Queries.qAnnTopk(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (lshDf, capped) = PipelineQueries.annLsh(spark, dir)
    val lsh = lshDf.filter("q_id < 10").select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val total = exact.values.map(_.size).sum
    val hit = exact.map { case (q, want) => (want & lsh.getOrElse(q, Set.empty)).size }.sum
    val recall = hit.toDouble / total
    assert(recall >= 0.9, s"LSH ANN recall $recall ($hit/$total)")
    assert(capped.value == 0, s"defaults capped ${capped.value} buckets on sf0.01 — cap too low")
  }

  test("IVF ANN recall >= 0.9 vs exact top-5 on sf0.01 at default (kCells=16, nprobe=8)") {
    val exact = Queries.qAnnTopk(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = PipelineQueries.annIvf(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // measured on this near-random testdata: nprobe 2→0.80, 4→0.88, 8→0.96,
    // 12→1.0 of 16 cells; real clustered embeddings reach high recall at a
    // much smaller probed fraction (IVF's gain is data-dependent)
    assert(recall >= 0.9, s"IVF ANN recall $recall")
  }

  test("bucket cap triggers and is counted when forced low") {
    val (df, capped) = PipelineQueries.annLsh(spark, dir, bucketCap = 16)
    df.count() // force execution so the accumulator populates
    assert(capped.value > 0, "cap=16 never triggered on 500 rows — cap machinery dead")
  }
}
