package graft.dedup

import org.apache.spark.sql.{Dataset, functions => F}
import graft.data.Clip
import graft.kernel.{Costs, EditCosts, EditDistanceKernel}

/** Survivor selection — the dedup pipeline's OUTPUT table: one
  * representative row per cluster with every original column passed through
  * untouched (the per-row invariant: decoded PCM and transcript of a
  * surviving row are bit-identical to its input row; verified in
  * SurvivorsSpec).
  *
  * Two policies:
  *  - `survivors`: the cluster id (= min member id, the CC convention) is
  *    the representative — a semi-join, no extra shuffle beyond the
  *    distinct;
  *  - `survivorsMedoid`: the member with the LOWEST mean plain token edit
  *    distance to its co-members — the reference's contrastive-rerank idea
  *    (/root/reference/src/fuzzy_match.cc:613-669: penalize redundancy via
  *    pairwise plain edit distance, same kernel) recast as medoid selection;
  *    quadratic per cluster, bounded by `maxClusterForMedoid` (bigger
  *    clusters fall back to min-id — counted into the `fallbackClusters`
  *    accumulator when one is supplied, never silent).
  */
object Survivors {

  /** Min-id representative per cluster (cluster_id == min member id). */
  def survivors(clips: Dataset[Clip], clusters: Dataset[ClusterRow]): Dataset[Clip] = {
    val spark = clips.sparkSession
    import spark.implicits._
    val reps = clusters.select(F.col("cluster_id").as("clip_id")).distinct()
    clips.join(reps, Seq("clip_id"), "left_semi").as[Clip]
  }

  /** Medoid representative: per cluster, the member minimizing the mean
    * plain token edit distance (F6 kernel) to the others; ties break to the
    * smaller clip_id. Requires the tokenized rows for distance computation. */
  def survivorsMedoid(
      clips: Dataset[Clip],
      clusters: Dataset[ClusterRow],
      toks: Dataset[TokRow],
      ec: EditCosts = EditCosts(),
      maxClusterForMedoid: Int = 64,
      fallbackClusters: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Clip] = {
    val spark = clips.sparkSession
    import spark.implicits._

    val member = clusters
      .joinWith(toks, clusters("clip_id") === toks("clip_id"))
      .map { case (c, t) => (c.cluster_id, t.clip_id, t.ids) }

    val medoids = member.groupByKey(_._1).mapGroups { (clusterId, it) =>
      val ms = it.toArray.sortBy(_._2)
      if (ms.length > maxClusterForMedoid) { fallbackClusters.foreach(_.add(1)); clusterId }
      else if (ms.length == 1) clusterId
      else {
        // mean pairwise plain edit distance, normalized like the reference's
        // contrastive penalty (same-kernel: diffWord over the pair lengths)
        var bestId = ms(0)._2
        var bestScore = Double.MaxValue
        var i = 0
        while (i < ms.length) {
          var sum = 0.0
          var j = 0
          while (j < ms.length) {
            if (i != j) {
              val dw = Costs.diffWord(ms(i)._3.length, ms(j)._3.length, ec)
              sum += EditDistanceKernel.plain(ms(i)._3, ms(j)._3, ec, dw)
            }
            j += 1
          }
          val mean = sum / math.max(1, ms.length - 1)
          if (mean < bestScore || (mean == bestScore && ms(i)._2 < bestId)) {
            bestScore = mean; bestId = ms(i)._2
          }
          i += 1
        }
        bestId
      }
    }.toDF("clip_id")

    // clusters with NO tokenized member (tokenize-dropped transcripts —
    // empty or over-length — possibly clustered by the audio channel) emit
    // nothing from the medoid grouping; their representative falls back to
    // the cluster id (= min member id, the same convention as `survivors`)
    // so no input row ever silently vanishes from the output table
    val tokenless = clusters.select(F.col("cluster_id").as("clip_id")).distinct()
      .join(member.toDF("cid", "mid", "ids").select(F.col("cid").as("clip_id")).distinct(),
        Seq("clip_id"), "left_anti")
    val reps = medoids.union(tokenless)

    clips.join(reps, Seq("clip_id"), "left_semi").as[Clip]
  }
}
