package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Collection

/** File ingestion for collections (S1-S4, S7).
  *
  * The reference shells out to DuckDB's `read_json_auto` / `read_parquet`
  * with schema inference, glob expansion and `hf://` remote paths
  * (collection_actor.rs:166-291, README.md:62-74). Spark-native:
  * `spark.read.json` / `spark.read.parquet` — schema inference and globs
  * are built in; remote `hf://` is out of scope in the zero-egress build
  * (any Hadoop-FS-backed URI works transparently: s3a://, hdfs://, ...).
  *
  * Import = create table + dense `_key`; append = align columns to the
  * existing schema (missing -> null, extra dropped) and continue keys at
  * max+1 — both delegated to [[graft.core.Collection]].
  */
object Ingest {

  /** Resolve reference-style paths. `hf://datasets/user/repo/file` (the
    * reference forwards these to DuckDB's remote reader, README.md:62-74)
    * maps to a local mirror root from `GRAFT_HF_MIRROR` — the zero-egress
    * stand-in for the hub download; without a mirror configured, remote
    * paths fail fast with a clear message instead of a network attempt.
    * Everything else (local paths, globs, any Hadoop-FS URI) passes
    * through untouched.
    */
  def resolvePath(path: String): String =
    if (!path.startsWith("hf://")) path
    else sys.env.get("GRAFT_HF_MIRROR") match {
      case Some(root) => root.stripSuffix("/") + "/" + path.stripPrefix("hf://")
      case None => throw new IllegalArgumentException(
        s"remote path '$path' needs GRAFT_HF_MIRROR set (offline build has no hub access)")
    }

  /** JSONL read with inferred schema (DuckDB `read_json_auto` analog).
    * Glob patterns in the path are expanded by the Hadoop file index.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(resolvePath(path))

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(resolvePath(path))

  /** A low-collision corrupt-record sentinel: a legitimate input field
    * named `_corrupt` must parse as an ordinary column, not be mistaken
    * for the parser's marker (an input actually carrying THIS name would
    * still collide — document-level caveat, not worth a uuid).
    */
  private[sources] val CorruptCol = "_graft_corrupt_record"

  /** One-pass checked JSONL parse: `good` rows, `quarantined` raw lines
    * (column `raw`), and a handle to release the materialization both
    * frames share.
    */
  final case class CheckedJsonl(good: DataFrame, quarantined: DataFrame,
                                private val backing: Option[DataFrame]) {
    /** Unpersist the cached one-pass parse backing both frames. Call once
      * the good rows are staged/written; without it the cache lives to
      * session end. Idempotent.
      */
    def release(): Unit = backing.foreach(_.unpersist())
  }

  /** JSONL read that ROUTES corrupt lines instead of failing the job or
    * silently dropping them: PERMISSIVE parse with a corrupt-record
    * column, split into (parsed rows, quarantined raw lines). At 100 TB
    * one mangled line must neither kill a ten-hour ingest (FAILFAST)
    * nor vanish (DROPMALFORMED) — the bad lines land in a quarantine
    * the operator can inspect and replay. The parse is materialized
    * once before the split (Spark disallows filtering on the internal
    * corrupt column of a streaming-parsed JSON relation) and released
    * via [[CheckedJsonl.release]]; at cluster scale prefer writing
    * `good` to a staging path over holding the cache — the cache is the
    * local-convenience form of that staging write.
    */
  def readJsonlChecked(spark: SparkSession, path: String): CheckedJsonl = {
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(resolvePath(path))
    if (!raw.columns.contains(CorruptCol)) {
      // schema inference saw no corrupt lines — nothing to quarantine
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("raw", StringType))))
      CheckedJsonl(raw, empty, None)
    } else {
      val parsed = raw.cache()
      val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
      val bad = parsed.filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw"))
      CheckedJsonl(good, bad, Some(parsed))
    }
  }

  /** RFC-4180 CSV read (DuckDB `read_csv_auto` analog): header row,
    * inferred schema, quoted fields with doubled-quote escaping, and
    * `multiLine` so quoted embedded newlines stay one record. multiLine
    * costs file-level (not block-level) input splits — the documented
    * trade for correctness on free-text columns; large corpora should
    * arrive as MANY csv files (the glob expands them), each its own
    * task, so parallelism comes from file count rather than block
    * splits.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(resolvePath(path))

  /** Write the RFC-4180 twin of [[readCsv]] (header, doubled-quote
    * escaping) — a directory of part files, one per partition.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .mode("overwrite")
      .csv(path)

  /** ORC read — the other columnar interchange format Hadoop shops
    * standardize on; Spark's reader is native (predicate pushdown,
    * column pruning, block-level splits — the parquet story, different
    * container).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(resolvePath(path))

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** S1: import a JSONL file/glob into an empty collection. */
  def importJsonl(c: Collection, path: String): Unit =
    c.importDf(readJsonl(c.spark, path))

  /** S1 (orc flavor): import an ORC file/glob. */
  def importOrc(c: Collection, path: String): Unit =
    c.importDf(readOrc(c.spark, path))

  /** S3 (orc flavor): append ORC, schema-aligned, `_key` continues. */
  def appendOrc(c: Collection, path: String): Unit =
    c.appendDf(readOrc(c.spark, path))

  /** S1 (csv flavor): import a CSV file/glob. */
  def importCsv(c: Collection, path: String): Unit =
    c.importDf(readCsv(c.spark, path))

  /** S3 (csv flavor): append CSV, schema-aligned, `_key` continues. */
  def appendCsv(c: Collection, path: String): Unit =
    c.appendDf(readCsv(c.spark, path))

  /** S2: import parquet. */
  def importParquet(c: Collection, path: String): Unit =
    c.importDf(readParquet(c.spark, path))

  /** S3: append JSONL, schema-aligned, `_key` continues. */
  def appendJsonl(c: Collection, path: String): Unit =
    c.appendDf(readJsonl(c.spark, path))

  /** S4: append parquet. */
  def appendParquet(c: Collection, path: String): Unit =
    c.appendDf(readParquet(c.spark, path))
}
