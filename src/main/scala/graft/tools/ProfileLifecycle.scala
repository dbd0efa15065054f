package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the on-disk lifecycle queries (q165/q122/q128/
  * q164 family): times import, index build, and search separately.
  * `runMain graft.tools.ProfileLifecycle [sfDir]` — scratch tool.
  */
object ProfileLifecycle {
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
    import graft.core.{Catalog, CollectionConfig, Keys}
    // warm the parquet reader
    graft.Tables.documents(spark, sfDir).count()
    val work = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val cat = new Catalog(spark, s"$work/cat")
    val c = cat.create(CollectionConfig(name = "fz"))
    time("importDf")(c.importDf(graft.Tables.documents(spark, sfDir)
      .select((col("doc_id") + 1).as(Keys.KeyCol), col("text"))))
    time("buildKeywordIndex")(c.buildKeywordIndex("text", nBuckets = 8))
    time("searchKeywordFuzzy 1")(
      c.searchKeywordFuzzy("text", "vectr hash", 10).count())
    time("searchKeywordFuzzy 2")(
      c.searchKeywordFuzzy("text", "vectr hash", 10).count())
    // the late-interaction lifecycle (q128 shape)
    val c2 = cat.create(CollectionConfig(name = "late"))
    time("importDf 2")(c2.importDf(graft.Tables.documents(spark, sfDir)
      .select((col("doc_id") + 1).as(Keys.KeyCol), col("text"))))
    val emb = new graft.embed.HashingEmbedder(dim = 384)
    time("embedColumnChunked")(
      c2.embedColumnChunked("text", emb, maxTokens = 8, overlapTokens = 0))
    time("searchLate")(c2.searchLate("text",
      "vector index search ranks nearest neighbors by cosine similarity",
      10, emb, maxTokens = 8, overlapTokens = 0).count())
    spark.stop()
  }
}
