package graft
import org.apache.spark.sql.SparkSession
object EnvProbe {
  def main(args: Array[String]): Unit = {
    val mode = sys.props.getOrElse("probe.mode", "plain")
    var b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").appName("probe")
    if (mode == "host") b = b.config("spark.driver.host", "127.0.0.1")
    if (mode == "skew") b = b.config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm(n: String)(f: => Any): Unit = { val t=System.nanoTime(); f; println(f"PROBE $mode $n ${(System.nanoTime()-t)/1e9}%.2f s") }
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").persist()
    tm("warm")(li.count())
    (1 to 4).foreach(i => tm(s"grpcount$i")(li.groupBy("l_returnflag").count().count()))
    spark.stop()
  }
}
