package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** S1: import a JSONL file/glob into an empty collection. */
  def importJsonl(c: Collection, path: String): Unit =
    c.importDf(readJsonl(c.spark, path))

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
