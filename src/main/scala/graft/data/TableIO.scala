package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

/** Table IO facade: Iceberg catalog tables in production, path-based
  * Parquet in environments without an Iceberg runtime (this sandbox ships
  * no iceberg-spark-runtime jar and dependency resolution is offline).
  *
  * The production mapping is one format switch, not a rewrite:
  *  - read  → `spark.read.format("iceberg").load(ident)`
  *  - write → `df.writeTo(ident).using("iceberg").createOrReplace()`
  *  - stage checkpoints become Iceberg snapshots (time-travel replaces the
  *    `_SUCCESS`-marker existence probe; resumable reads pin a snapshot id).
  *
  * Everything above this facade — partitioning, checkpoint resume, lineage
  * metrics — is format-agnostic.
  */
object TableIO {

  /** True when an Iceberg Spark runtime is on the classpath. */
  lazy val icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.source.IcebergSource"); true }
    catch { case _: Throwable => false }

  private def useIceberg(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.tableFormat", if (icebergAvailable) "iceberg" else "parquet") == "iceberg"

  def read(spark: SparkSession, ident: String): DataFrame =
    if (useIceberg(spark)) spark.read.format("iceberg").load(ident)
    else spark.read.parquet(ident)

  def write(df: DataFrame, ident: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    if (useIceberg(df.sparkSession)) df.write.format("iceberg").mode(mode).save(ident)
    else df.write.mode(mode).parquet(ident)

  /** Committed-output existence probe (Iceberg: table exists in catalog;
    * Parquet: `_SUCCESS` marker — a bare directory is NOT a committed write). */
  def exists(spark: SparkSession, ident: String): Boolean =
    if (useIceberg(spark)) spark.catalog.tableExists(ident)
    else {
      val p = new org.apache.hadoop.fs.Path(ident, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

  /** The input contract (`BASELINE.json` input_hint): a table of audio clip
    * + transcript pairs with columns
    * (clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
    * transcript string). */
  def readClips(spark: SparkSession, ident: String): Dataset[Clip] = {
    import spark.implicits._
    read(spark, ident)
      .selectExpr("clip_id", "bytes", "cast(sr_hz as int) sr_hz",
        "cast(dur_ms as int) dur_ms", "codec", "transcript")
      .as[Clip]
  }
}
