package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-step timing of Keyword.buildIndex's internals
  * plus the searchKeywordFuzzy job chain. Not a gate; delete-safe.
  */
object ProbeKwBuild {
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
    graft.Tables.documents(spark, sfDir).count() // warm
    val work = java.nio.file.Files.createTempDirectory("graft_probe_kw").toString
    val cat = new Catalog(spark, s"$work/cat")
    val c = cat.create(CollectionConfig(name = "fz"))
    time("importDf")(c.importDf(graft.Tables.documents(spark, sfDir)
      .select((col("doc_id") + 1).as(Keys.KeyCol), col("text"))))
    // replicate buildIndex's steps against the collection data
    val dir = s"$work/kwidx"
    val docs = c.df.select(col(Keys.KeyCol), col("text"))
    val src = time("spread")(graft.operators.Layout.spreadForCompute(
      docs.select(col(Keys.KeyCol), col("text"))))
    val (postings, _, _) = graft.search.Keyword.corpusTables(
      src, Keys.KeyCol, "text")
    time("postings write")(postings
      .withColumn("bucket", pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10)
        .cast("int"), lit(8)))
      .repartition(8, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings"))
    val doclen0 = time("postings read-back agg (plan only)")(
      spark.read.parquet(s"$dir/postings")
        .groupBy(col("key")).agg(sum(col("tf")).as("dl")))
    val doclen = docs.select(col(Keys.KeyCol).as("key"),
        md5(coalesce(col("text").cast("string"), lit(""))).as("fp"))
      .join(doclen0, Seq("key"), "left_outer")
      .select(col("key"), coalesce(col("dl"), lit(0L)).as("dl"),
        col("fp"), lit(1).as("cnt"))
    time("doclen write")(doclen.write.mode("overwrite").parquet(s"$dir/doclen"))
    time("stats write")(spark.read.parquet(s"$dir/doclen")
      .select(col("key"), col("dl"), coalesce(col("cnt"), lit(1)).as("c"))
      .groupBy(col("key"))
      .agg(sum(col("dl")).as("dl"), sum(col("c")).as("cnt"))
      .filter(col("cnt") > 0)
      .agg(count(when(col("dl") > 0, 1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .withColumn("n_buckets", lit(8))
      .withColumn("analyzer", lit("ws"))
      .write.mode("overwrite").parquet(s"$dir/stats"))
    // real build for the search phase
    val t0 = System.nanoTime()
    c.buildKeywordIndex("text", nBuckets = 8)
    println(f"REAL buildKeywordIndex: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("fuzzy 1")(c.searchKeywordFuzzy("text", "vectr hash", 10).count())
    time("fuzzy 2")(c.searchKeywordFuzzy("text", "vectr hash", 10).count())
    time("fuzzy 3")(c.searchKeywordFuzzy("text", "vectr hash", 10).count())
    // component timing against the manual index replica at `dir`
    (1 to 2).foreach { i =>
      val meta = time(s"[$i] storedMeta")(
        graft.search.Keyword.storedMeta(spark, dir))
      val toks = graft.search.Fuzzy.vocabFromPostings(
        graft.search.Keyword.livePostings(spark, dir)).select(col("tok"))
      val resolved = time(s"[$i] resolveTerms")(
        graft.search.Fuzzy.resolveTerms(toks, Seq("vectr", "hash"), 2))
      println(s"resolved=$resolved")
      val hits = graft.search.Keyword.searchIndex(spark, dir,
        resolved.values.toSeq.distinct, 10, nBuckets = Some(meta._1))
      time(s"[$i] searchIndex count")(hits.count())
      val page = c.df.join(broadcast(hits.withColumnRenamed("key", Keys.KeyCol)), Keys.KeyCol)
        .select(col("text").as("content"), col(Keys.KeyCol).as("key"), col("score"))
        .orderBy(desc("score"), col("key"))
      time(s"[$i] fetchHits count")(page.count())
    }
    spark.stop()
  }
}
