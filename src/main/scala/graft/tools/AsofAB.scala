package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the as-of operator forms (temporary tooling,
  * not part of the library surface).
  */
object AsofAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def events = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    def ords = graft.Tables.table(spark, sfDir, "orders").select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"$name%-28s median=${ts.map(_._1).sorted.apply(2)}%.3f rows=${ts.head._2}")
    }

    // (b1) the shared right-side dedup alone
    time("right-dedup") {
      graft.operators.AsOfJoin.dedupRight(ords, Seq("user_id"), "o_orderdate", Seq("o_orderkey")).count()
    }
    // (c) custom exec, no final orderBy
    time("asof-exec") {
      graft.plans.AsOfJoinPlan.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")).count()
    }
    // (d) union+window, no final orderBy
    time("asof-window") {
      graft.operators.AsOfJoin.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")).count()
    }
    // (c+) / (d+) FORCED payload materialization — count() lets Catalyst
    // prune the window form down to a left-scan (see PruneAsOfJoin docs),
    // so the honest operator-vs-operator comparison hashes the payload
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(xxhash64(col("event_id"), col("o_orderkey")) % 1000003)).collect()(0).getLong(0)
    time("asof-exec-forced") {
      force(graft.plans.AsOfJoinPlan.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")))
    }
    time("asof-window-forced") {
      force(graft.operators.AsOfJoin.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")))
    }
    // (c') / (d') with AQE off — does adaptive staging penalize the custom node?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("asof-exec-noaqe") {
      graft.plans.AsOfJoinPlan.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")).count()
    }
    time("asof-window-noaqe") {
      graft.operators.AsOfJoin.backward(events, ords, Seq("user_id"),
        "ts", "o_orderdate", Seq("o_orderkey")).count()
    }
    spark.stop()
  }
}
