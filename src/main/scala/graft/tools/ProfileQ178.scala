package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the media near-dup gates: times frame sampling +
  * hashing, the Hamming pair join, and the full query separately so an
  * optimization round can see which phase owns the seconds.
  * `runMain graft.tools.ProfileQ178 [sfDir]` — scratch tool, no gate.
  */
object ProfileQ178 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val vids = graft.multimodal.MediaFixtures.cachedContent(spark, sfDir, "nearavi") {
      val aviUdf = udf((id: Long) =>
        graft.multimodal.Multimodal.SyntheticVideo.nearAvi(id))
      graft.Tables.documents(spark, sfDir).select(col("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("content", aviUdf(col("doc_id")))
    }.repartition(spark.sparkContext.defaultParallelism)
    time("warm cache read")(vids.count())
    val frames = graft.multimodal.Multimodal.sampleFrames(vids, "doc_id", "content", 4)
    val hashUdf = udf((b: Array[Byte]) =>
      graft.multimodal.Multimodal.Codec.imageHash(b))
    val packed = frames.select(
      (shiftleft(col("doc_id").cast("long"), 4) + col("frame_idx")).as("pk"),
      hashUdf(col("frame")).as("fh"))
    time("frames+hash")(packed.write.format("noop").mode("overwrite").save())
    val pairs = graft.dedup.Dedup.hammingNearDups(packed, "pk", "fh", 3, 100000)
    time("hammingNearDups")(pairs.write.format("noop").mode("overwrite").save())
    val full = graft.SparkEntry.queries("q178_video_neardups")(spark, sfDir)
    time("full q178 run1")(full.count())
    time("full q178 run2")(full.count())
    spark.stop()
  }
}
