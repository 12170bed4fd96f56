package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.TableIO

/** Format-selection contract of the Iceberg/Parquet facade: the parquet
  * side is exercised for real; the iceberg side (no runtime jar ships in
  * this sandbox) is asserted-as-selected via the `spark.graft.tableFormat`
  * override, so the production mapping can't silently rot. */
class TableIOSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .appName("tableio-spec")
    .getOrCreate()

  test("sandbox has no Iceberg runtime; default format resolves to parquet") {
    assert(!TableIO.icebergAvailable)
  }

  test("parquet path: write → exists (committed) → read round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tableio").toString + "/t1"
    assert(!TableIO.exists(spark, dir), "existence probe true before any write")
    TableIO.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    assert(TableIO.exists(spark, dir), "_SUCCESS-committed write not detected")
    val back = TableIO.read(spark, dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b")))
  }

  test("a bare directory without _SUCCESS is NOT a committed table") {
    val dir = java.nio.file.Files.createTempDirectory("tableio-bare").toString
    assert(!TableIO.exists(spark, dir))
  }

  test("spark.graft.tableFormat=iceberg selects the iceberg branch (read attempts the iceberg source)") {
    spark.conf.set("spark.graft.tableFormat", "iceberg")
    try {
      // without the runtime jar the iceberg branch must FAIL — reaching the
      // iceberg code path (instead of silently reading parquet) is the assert
      val e = intercept[Exception] {
        TableIO.read(spark, "/tmp/does-not-matter").collect()
      }
      val msg = (e.getMessage + " " + e.getClass.getName).toLowerCase
      assert(msg.contains("iceberg"), s"iceberg branch not taken: $msg")
    } finally spark.conf.unset("spark.graft.tableFormat")
  }

  test("spark.graft.tableFormat override back to parquet wins over autodetect") {
    import spark.implicits._
    spark.conf.set("spark.graft.tableFormat", "parquet")
    try {
      val dir = java.nio.file.Files.createTempDirectory("tableio-ovr").toString + "/t2"
      TableIO.write(Seq(1L, 2L, 3L).toDF("x"), dir)
      assert(TableIO.read(spark, dir).count() == 3)
    } finally spark.conf.unset("spark.graft.tableFormat")
  }
}
