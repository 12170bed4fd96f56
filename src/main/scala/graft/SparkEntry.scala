package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{PipelineQueries, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 + the
  * training-pipeline family) to a DataFrame over the given sf dir;
  * `oracleSql` carries the DuckDB-equivalent SQL for the SQL-expressible
  * subset (identical column names/aliases on both sides — the driver's
  * compare hashes values after sorting columns by name). */
object SparkEntry {

  /** Flagship: the full three-stage near-dup pipeline (signatures → LSH/
    * shingle candidates → suffix-array+DP verify → connected components)
    * over the sf0.001 documents table as clip transcripts. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.qDedupClusters(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.sqlOracled ++ PipelineQueries.rowsOnly ++ PipelineQueries.goldenOracled ++
      PipelineQueries.checksumOracled

  def oracleSql: Map[String, String] =
    Queries.oracle ++ PipelineQueries.goldenOracle ++ PipelineQueries.checksumOracle
}
