// Verification drive: exercises the public library surface end-to-end.
// Run with: sbt 'runMain graft.tools.Drive'
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{Catalog, CollectionConfig}
import graft.embed.HashingEmbedder

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== 1. flagship entry() ===")
    val e = graft.SparkEntry.entry(spark)
    e.show(10, 60)

    println("=== 2. collection lifecycle ===")
    val root = java.nio.file.Files.createTempDirectory("graft_drive").toString
    val cat = new Catalog(spark, root)
    val coll = cat.create(CollectionConfig(name = "docs", index_columns = Seq("text")))
    coll.importDf(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    println(s"count after import: ${coll.count()}")
    val emb = new HashingEmbedder(dim = 64)
    val n1 = coll.embedColumn("text", emb)
    println(s"embedded: $n1, indexedCount: ${coll.indexedCount("text")}")

    println("=== 3. incremental append + re-embed (watermark) ===")
    coll.appendDf(spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20))
    val n2 = coll.embedColumn("text", emb)
    println(s"after append count=${coll.count()} newly-embedded=$n2 (expect 20)")

    println("=== 3b. compact the appended small files ===")
    val preCount = coll.count()
    val nFiles = coll.compact()
    require(coll.count() == preCount, "compact must not change row count")
    val n3 = coll.embedColumn("text", emb)
    require(n3 == 0, s"compact must not disturb the embed watermark (re-embedded $n3)")
    println(s"compacted into $nFiles file(s); count stable at $preCount; watermark intact")

    println("=== 4. search ===")
    coll.search("text", "fast key order sort table scan", 5, emb).show(5, 60)

    println("=== 5. reload from config.json + chunk import ===")
    val re = cat.load("docs")
    println(s"reloaded config: ${re.config}")
    re.importChunks(Seq("chunk one text", "chunk two text"), "text")
    println(s"after chunk append: ${re.count()} (expect 522)")

    println("=== 6. probes ===")
    try { coll.search("text", "x", 0, emb) } catch {
      case ex: IllegalArgumentException => println(s"limit=0 -> ${ex.getMessage}") }
    try { coll.search("text", "x", 101, emb) } catch {
      case ex: IllegalArgumentException => println(s"limit=101 -> ${ex.getMessage}") }
    try { cat.create(CollectionConfig(name = "docs")) } catch {
      case ex: IllegalArgumentException => println(s"dup create -> ${ex.getMessage}") }
    try { cat.create(CollectionConfig(name = "bad;name")) } catch {
      case ex: IllegalArgumentException => println(s"bad name -> ${ex.getMessage}") }
    println(s"chunk empty -> ${graft.functions.Chunker.chunk("   \n ")}")
    println(s"search on empty query string:")
    coll.search("text", "", 3, emb).show(3, 40)

    spark.stop()
    println("DRIVE OK")
  }
}
