package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextExprs

/** The native rolling-hash expression must reproduce the SQL
  * aggregate-over-transform fingerprint exactly (and so keep the DuckDB
  * oracle green), run inside codegen, and handle nulls / non-BMP input. */
class TextExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.dedup.DedupPipeline.sessionDefaults(
    SparkSession.builder().master("local[4]").appName("text-expr-spec"), 4)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("rollingHashF equals the SQL aggregate form on the documents table") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val both = d.select(
      TextExprs.rollingHashF(col("text")).as("native"),
      expr("aggregate(transform(sequence(1, char_length(text)), " +
        "i -> cast(ascii(substring(text, i, 1)) as bigint)), cast(0 as bigint), " +
        "(acc, c) -> (acc * 31 + c) % 2147483647)").as("sql"))
    assert(both.count() > 0)
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("interpreted eval, empty string, and null") {
    import spark.implicits._
    val r = Seq(("abc"), ("")).toDF("s")
      .select(TextExprs.rollingHashF(col("s")).as("h")).collect()
    // h("abc") = ((97*31 + 98)*31 + 99) mod (2^31-1)
    assert(r(0).getLong(0) == ((97L * 31 + 98) * 31 + 99) % 2147483647L)
    assert(r(1).getLong(0) == 0L)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(TextExprs.rollingHashF(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("code-point iteration: non-BMP characters count once (oracle's unicode() semantics)") {
    // U+1D11E (musical G clef) is a surrogate pair in Java; the hash must
    // consume it as ONE code point, as DuckDB's unicode(text[i:i]) does
    val s = new String(Character.toChars(0x1D11E))
    val e = TextExprs.RollingHashF(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == 0x1D11EL % 2147483647L)
  }
}
