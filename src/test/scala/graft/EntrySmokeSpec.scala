package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's smoke check: entry() on sf0.001 must return rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns clusters on sf0.001") {
    val spark = graft.dedup.DedupPipeline.sessionDefaults(
      SparkSession.builder().master("local[4]").appName("entry-smoke"), 4).getOrCreate()
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("clip_id", "cluster_id"))
    assert(df.count() > 0)
  }
}
