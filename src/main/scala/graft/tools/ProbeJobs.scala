package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Scratch probe: scheduled-job count of ConnectedComponents.labels on
  * a chain graph (the job count IS the fixture-scale cost of the loop).
  * Delete-safe.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("key_a", "key_b")
    val t0 = System.nanoTime()
    val lab = graft.dedup.ConnectedComponents.labels(edges, "key_a", "key_b")
    val cnt = lab.select("comp").distinct().count()
    Thread.sleep(500)
    println(f"chain n=$n comps=$cnt jobs=${jobs.get} secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
