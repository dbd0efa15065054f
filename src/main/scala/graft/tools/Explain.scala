package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan (and optionally run) a named
  * SparkEntry query: `runMain graft.tools.Explain <name> [sfDir] [run]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_ADVISORY").foreach(v =>
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v))
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.length > 2 && args(2) == "run") {
      val t0 = System.nanoTime()
      println(s"rows: ${df.count()}")
      println(f"secs: ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
