package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does an Observation fire during localCheckpoint(true)?
  * If yes, the CC loop's per-round convergence sum can ride the
  * checkpoint job instead of being its own scheduled job. Delete-safe.
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1L to 1000L).toDF("label")
    val obs = Observation("s")
    val ck = df.observe(obs, sum(col("label").cast("decimal(38,0)")).as("ls"))
      .localCheckpoint(true)
    // getAsJava blocks until the observed query completes; a 5s bound
    // tells us whether the checkpoint action counted
    val fut = scala.concurrent.Future(obs.get)(
      scala.concurrent.ExecutionContext.global)
    val got = try {
      Some(scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration(3, "s")))
    } catch { case _: java.util.concurrent.TimeoutException => None }
    println("observed after localCheckpoint: " + got)
    println("rows: " + ck.count())
    spark.stop()
  }
}
