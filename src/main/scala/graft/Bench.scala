package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * An untimed warmup action runs first so JVM/codegen/parquet-reader
  * initialization isn't attributed to whichever query happens to run
  * first; queries then run in sorted-name order for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: parquet reader + codegen + shuffle machinery, untimed
    try {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      docs.groupBy(col("lang")).count().count()
      Tables.embeddings(spark, sfDir)
        .select(graft.functions.VectorFunctions.l2Norm(col("embedding"))).count()
    } catch { case _: Throwable => () }

    // (name, seconds, error). A failed query keeps its wall time (the
    // failure cost is real) but is listed in "failures" so a regression
    // can't hide inside the total as a silent -1.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // full JSON string escape (incl. every control char): a tab or CR in
    // a Spark error message must not make the whole line unparseable
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val fails = results.collect { case (k, _, Some(e)) =>
      jstr(k) + ":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for log-wrapping launchers: also drop the line in
    // a well-known file next to the build.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LAST.json"),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
