package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Local gate rehearsal for a SUBSET of queries: dump each named query's
  * result + oracle SQL exactly like graft.Verify, for scripts/check.py
  * to compare in DuckDB — so a new query is exercised end-to-end without
  * re-running the whole battery. Usage:
  *   runMain graft.tools.CheckSome <sfDir> <outDir> q141_hash_split ...
  */
object CheckSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val static = graft.SparkEntry.oracleSql
    // dynamic (Verify-time trained) oracles only when a requested name
    // needs one — training IVF/PQ/classifiers for a q1 rehearsal is waste
    val oracles =
      if (names.forall(static.contains)) static
      else static ++ graft.SparkEntry.dynamicOracleSql(spark, sfDir)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[check] dumped $name")
    }
    val json = names.filter(oracles.contains)
      .map(n => s"${q(n)}: ${q(oracles(n))}").mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
