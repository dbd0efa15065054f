package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: bucket-size histogram of the q178 Hamming block join
  * (which generator path do the pairs take, and how big are the
  * degenerate buckets?). Not a gate; delete-safe.
  */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.length > 1) args(1) else "video"
    val packed = (mode match {
      case "audio" =>
        val auds = graft.multimodal.MediaFixtures.cachedContent(spark, sfDir, "nearwav") {
          val wavUdf = udf((id: Long) =>
            graft.multimodal.Multimodal.SyntheticAudio.nearWav(id))
          graft.Tables.documents(spark, sfDir).select(col("doc_id"))
            .repartition(spark.sparkContext.defaultParallelism)
            .withColumn("content", wavUdf(col("doc_id")))
        }.repartition(spark.sparkContext.defaultParallelism)
        val hashUdf = udf((b: Array[Byte]) =>
          graft.multimodal.Multimodal.Codec.audioHash(b))
        auds.select(col("doc_id").as("pk"), hashUdf(col("content")).as("fh"))
      case "image" =>
        val imgs = graft.multimodal.MediaFixtures.cachedContent(spark, sfDir, "png") {
          val pngUdf = udf((id: Long) =>
            graft.multimodal.Multimodal.SyntheticImage.png(id))
          graft.Tables.documents(spark, sfDir).select(col("doc_id"))
            .repartition(spark.sparkContext.defaultParallelism)
            .withColumn("content", pngUdf(col("doc_id")))
        }.repartition(spark.sparkContext.defaultParallelism)
        val hashUdf = udf((b: Array[Byte]) =>
          graft.multimodal.Multimodal.Codec.imageHash(b))
        imgs.select(col("doc_id").as("pk"), hashUdf(col("content")).as("fh"))
      case "simhash" =>
        graft.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("pk"),
            graft.dedup.Dedup.simhashUdf(42L)(col("text")).as("fh"))
      case _ =>
        val vids = graft.multimodal.MediaFixtures.cachedContent(spark, sfDir, "nearavi") {
          val aviUdf = udf((id: Long) =>
            graft.multimodal.Multimodal.SyntheticVideo.nearAvi(id))
          graft.Tables.documents(spark, sfDir).select(col("doc_id"))
            .repartition(spark.sparkContext.defaultParallelism)
            .withColumn("content", aviUdf(col("doc_id")))
        }.repartition(spark.sparkContext.defaultParallelism)
        val frames = graft.multimodal.Multimodal.sampleFrames(vids, "doc_id", "content", 4)
        val hashUdf = udf((b: Array[Byte]) =>
          graft.multimodal.Multimodal.Codec.imageHash(b))
        frames.select(
          (shiftleft(col("doc_id").cast("long"), 4) + col("frame_idx")).as("pk"),
          hashUdf(col("frame")).as("fh"))
    }).localCheckpoint(true)
    println("distinct values = " + packed.select("fh").distinct().count())
    println("n sketches = " + packed.count())
    val blocks = packed.select(col("pk"), col("fh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fh"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block", "block_val")))
    val grouped = blocks.groupBy(col("block"), col("block_val"))
      .agg(count(lit(1)).as("n"))
    println("--- bucket size histogram (n>1) ---")
    grouped.filter(col("n") > 1)
      .groupBy(col("n")).agg(count(lit(1)).as("buckets"))
      .orderBy(desc("n")).show(40, false)
    val big = grouped.filter(col("n") > 1024)
    println("buckets > UdfBucketMax(1024): " + big.count())
    big.orderBy(desc("n")).show(20, false)
    // quadratic work by path
    val work = grouped.filter(col("n") > 1)
      .select(col("n"), (col("n") * col("n")).as("n2"),
        (col("n") <= 1024).as("small"))
      .groupBy(col("small")).agg(sum(col("n2")).as("pairwork"), count(lit(1)).as("nb"))
    work.show(false)
    spark.stop()
  }
}
