package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

final case class ClusterRow(clip_id: String, cluster_id: String)

/** Stage 3 — connected components over the dup-pair graph by iterative
  * min-label propagation (hash-min) via DataFrame self-joins, with
  * `localCheckpoint` per iteration to cut lineage and a convergence count.
  * Dup clusters are near-cliques (every member pairs with most others), so
  * propagation converges in a handful of iterations; the iteration cap
  * guards pathological chains. Cluster id = min clip_id in the component. */
object ConnectedComponents {

  def apply(edges: Dataset[Edge], allIds: DataFrame, maxIterations: Int): Dataset[ClusterRow] = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .union(edges.select($"b".as("src"), $"a".as("dst")))
      .distinct()
      .localCheckpoint() // materialize once; reused every iteration

    var labels = sym.select($"src".as("v")).distinct()
      .withColumn("label", $"v")
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIterations) {
      val msgs = sym.join(labels, sym("src") === labels("v"))
        .groupBy($"dst")
        .agg(min($"label").as("nbr_min"))
      val updated = labels.join(msgs, labels("v") === msgs("dst"), "left")
        .select(labels("v"),
                labels("label"),
                least(labels("label"), coalesce($"nbr_min", labels("label"))).as("next"))
      val next = updated.select($"v", $"next".as("label")).localCheckpoint()
      changed = updated.filter($"next" =!= $"label").count()
      labels = next
      iter += 1
    }

    allIds.select($"clip_id")
      .join(labels, allIds("clip_id") === labels("v"), "left")
      .select($"clip_id", coalesce($"label", $"clip_id").as("cluster_id"))
      .as[ClusterRow]
  }
}
