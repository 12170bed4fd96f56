package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.DedupPipeline
import graft.ops.Queries

/** Physical-plan quality gates: the declarative queries must produce the
  * plans a 100 TB run needs — filters and projections pushed into the
  * parquet scan, small dimensions broadcast, whole-stage codegen covering
  * the relational glue. */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("plan-spec"), 4)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }

  test("filter + projection reach the parquet scan (PushedFilters / ReadSchema)") {
    val f = formatted(Queries.qFilterTopk(spark, dir))
    assert(f.contains("PushedFilters:") &&
      f.contains("GreaterThanOrEqual(l_quantity,45.0)"), f.take(2000))
    // projection pruning: only the 3 projected + 2 filtered columns are read
    val readSchema = f.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"scan reads more columns than needed: $readSchema")
  }

  test("dimension join is broadcast, not shuffled") {
    val p = planOf(Queries.qJoinAgg(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("aggregations run partial+final (map-side combine)") {
    val p = planOf(Queries.q1Agg(spark, dir))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), s"no partial aggregation in plan:\n${p.take(1500)}")
  }

  test("relational glue stays inside whole-stage codegen") {
    val df = Queries.q1Agg(spark, dir)
    df.collect() // finalize the adaptive plan
    val f = formatted(df)
    assert(f.contains("codegen id"), f.take(2000))
  }

  test("jaccard self-join is an equi-join on lang, not a cartesian product") {
    val p = planOf(Queries.qJaccardPairs(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("candidate pair generation is an equi-join on the bucket hash, never a nested loop") {
    import spark.implicits._
    val clips = graft.data.SynthCorpus.generate(spark, 64)
    val cfg = graft.dedup.DedupConfig()
    val toks = graft.dedup.TokenizeStage(clips, cfg)
    val acc1 = spark.sparkContext.longAccumulator
    val acc2 = spark.sparkContext.longAccumulator
    val ch = graft.dedup.CandidateStage.ngramChannel(toks, cfg, acc1, acc2)
    val p = planOf(ch.toDF())
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the P5 window + orientation live INSIDE an equi-join on sh (codegen),
    // not a typed flatMapGroups — the bucket join is the whole-stage-codegen
    // hot path and AQE can skew-split it
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
  }

  test("jaccard inverted index reuses one (lang, sh) exchange across agg, anti-join and self-join") {
    val df = Queries.qJaccardPairs(spark, dir)
    df.collect() // finalize the adaptive plan so reuse nodes materialize
    val p = formatted(df)
    assert(p.contains("ReusedExchange") || planOf(df).contains("ReusedExchange"),
      s"no exchange reuse in the jaccard plan:\n${p.take(3000)}")
  }

  test("cross-table retrieval candidates are an equi-join on the bucket hash") {
    import spark.implicits._
    val corpus = graft.data.SynthCorpus.generate(spark, 64)
    val queries = corpus.filter(c => c.clip_id.endsWith("0"))
    val cfg = graft.dedup.DedupConfig()
    val qt = graft.dedup.TokenizeStage(queries, cfg)
    val ct = graft.dedup.TokenizeStage(corpus, cfg)
    val ch = graft.dedup.CandidateStage.crossNgramChannel(qt, ct, cfg,
      spark.sparkContext.longAccumulator)
    val p = planOf(ch.toDF())
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
  }

  test("len-window pair join has no per-language cartesian shape") {
    val p = planOf(Queries.qLenWindowPairs(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }
}
