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
    // `run` = once; `run=N` = N timed repeats (median reported) so two
    // operators can be A/B'd warm in one JVM
    if (args.length > 2 && args(2).startsWith("run")) {
      val n = args(2).split("=") match {
        case Array(_, k) => k.toInt
        case _ => 1
      }
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        println(s"rows: ${df.count()}")
        val s = (System.nanoTime() - t0) / 1e9
        println(f"secs: $s%.2f")
        s
      }
      if (n > 1) println(f"median: ${times.sorted.apply(n / 2)}%.2f")
    }
    spark.stop()
  }
}
