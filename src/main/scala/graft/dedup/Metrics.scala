package graft.dedup

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** Per-partition lineage metrics: row counts by physical partition for a
  * stage output — the distributed analog of the reference's per-phase STEP /
  * NMATCH counters (/root/reference/cli/src/FuzzyMatch-cli.cc:21-27,452-458),
  * recast as rows so they land in the metrics checkpoint table. */
object Metrics {
  def perPartition[T](stage: String, ds: Dataset[T]): Seq[MetricRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single((pid, n))
    }.collect()
      .map { case (pid, n) => MetricRow(stage, pid, n, n, 0L, Map.empty) }
      .toSeq
  }
}
