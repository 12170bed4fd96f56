package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExprs

/** The native codegen vector expressions must be drop-in replacements for
  * the SQL aggregate(zip_with(...)) forms: bit-identical values (same
  * accumulation order), null-safe, and actually inside whole-stage codegen. */
class VectorExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.dedup.DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("vector-expr-spec"), 4)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("l2normF is bit-identical to the SQL aggregate form") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val both = e.select(
      VectorExprs.l2normF(col("embedding")).as("native"),
      expr("sqrt(aggregate(embedding, cast(0 as double), " +
        "(acc, x) -> acc + cast(x as double) * cast(x as double)))").as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
    assert(both.count() > 0)
  }

  test("dotF is bit-identical to the SQL zip_with form (self pairs)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").limit(50)
    val a = e.toDF("a_id", "a_emb")
    val b = e.toDF("b_id", "b_emb")
    val both = a.crossJoin(b).select(
      VectorExprs.dotF(col("a_emb"), col("b_emb")).as("native"),
      expr("aggregate(zip_with(a_emb, b_emb, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.dotF(col("a"), col("b")).as("d"),
      VectorExprs.l2normF(col("b")).as("n")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("wrong input type fails analysis with the expression's message") {
    import spark.implicits._
    val df = Seq("not an array").toDF("s")
    val e = intercept[Exception](df.select(VectorExprs.l2normF(col("s"))).collect())
    assert(e.getMessage.contains("l2_norm_f") || e.getMessage.contains("DATATYPE_MISMATCH"),
      e.getMessage)
  }

  test("the expression runs inside whole-stage codegen (no lambda fence)") {
    val df = graft.ops.Queries.qEmbedNorm(spark, dir)
    df.collect() // finalize adaptive plan
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val plan = out.toString("UTF-8")
    assert(plan.contains("codegen id"), plan.take(2000))
    assert(!plan.toLowerCase.contains("lambdafunction"), plan.take(2000))
  }

  test("exact interpreted eval (nullSafeEval path) on literal arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(Array(1f, 2f, 3f), ArrayType(FloatType))
    val b = Literal.create(Array(4f, 5f, 6f), ArrayType(FloatType))
    assert(VectorExprs.DotProductF(a, b).eval(null) == (4.0 + 10.0 + 18.0))
    assert(VectorExprs.L2NormF(a).eval(null) == math.sqrt(1.0 + 4.0 + 9.0))
    // unequal lengths → NULL, matching zip_with's null-padding (it does NOT
    // truncate): a malformed vector must fall out of a top-k, never enter
    // it as a silent partial sum
    val short = Literal.create(Array(2f), ArrayType(FloatType))
    assert(VectorExprs.DotProductF(a, short).eval(null) == null)
  }

  test("null elements and length mismatches yield NULL, exactly like the SQL forms") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)),     // clean
      (2L, Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)),   // null element
      (3L, Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](3f, 4f))) // length mismatch
      .toDF("id", "a", "b")
      .selectExpr("id", "cast(a as array<float>) as a", "cast(b as array<float>) as b")
    val got = df.select(col("id"),
      VectorExprs.dotF(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("sql"),
      VectorExprs.l2normF(col("a")).as("nrm"))
      .collect().map(r => (r.getLong(0), r)).toMap
    assert(got(1).getDouble(1) == 11.0 && got(1).getDouble(2) == 11.0)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2), "null element: native/sql must both be NULL")
    assert(got(3).isNullAt(1) && got(3).isNullAt(2), "length mismatch: native/sql must both be NULL")
    assert(got(2).isNullAt(3), "null element: l2 norm must be NULL")
  }
}
