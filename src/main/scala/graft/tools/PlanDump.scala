package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.DedupPipeline

/** Round-6 plan evidence: the registered jaccard/annLsh queries eagerly
  * localCheckpoint their results (the cache-release discipline), so their
  * executed plans are checkpoint scans — this tool dumps the LAZY plans of
  * the underlying operators (the shape the cluster actually executes inside
  * that one action), plus clearly-labeled reconstructions of the r5
  * formulations for side-by-side comparison, into plans/r06/.
  *
  * Usage: runMain graft.tools.PlanDump [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = DedupPipeline.sessionDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("plan-dump"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dirOut = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(dirOut)
    def dump(name: String, df: DataFrame): Unit = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      java.nio.file.Files.write(dirOut.resolve(name), out.toByteArray)
      println(s"PLAN $name written")
    }

    // current (r6) jaccard lazy plan: 64-bit xxhash64 join key
    val (jac, jacRelease) = graft.ops.Queries.jaccardPairs(spark, sfDir)
    dump("q_jaccard_pairs_after_lazy.txt", jac)
    jacRelease()

    // r5 jaccard formulation RECONSTRUCTED for comparison only (string
    // (lang, sh) join keys, cores-partitioned cache) — not registered
    {
      val cap = graft.ops.Queries.jaccardShingleDfCap
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), col("lang"), explode(array_distinct(expr(
          "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', slice(tk, i + 1, 3)))")))
          .as("sh"))
      val parted = d.repartition(col("lang"), col("sh")).persist()
      val sizes = parted.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = parted.select(col("doc_id").as("a_id"), col("lang"), col("sh"))
      val b = parted.select(col("doc_id").as("b_id"), col("lang"), col("sh"))
      val out = a.join(b, Seq("lang", "sh"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("common"))
        .join(sizes.toDF("a_id", "a_n"), "a_id")
        .join(sizes.toDF("b_id", "b_n"), "b_id")
        .withColumn("jac_raw",
          col("common").cast("double") / (col("a_n") + col("b_n") - col("common")))
        .filter(col("jac_raw") >= 0.2)
        .select(col("a_id"), col("b_id"), round(col("jac_raw"), 4).as("jac"))
      dump("q_jaccard_pairs_r5_reconstructed.txt", out)
      parted.unpersist()
    }

    // current (r6) annLsh lazy plan: long ids + one-pass top-k reduction
    val (lsh, lshRelease) = graft.ops.PipelineQueries.annLshPlan(spark, sfDir)
    dump("q_ann_lsh_after_lazy.txt", lsh)
    lshRelease()

    spark.stop()
  }
}
