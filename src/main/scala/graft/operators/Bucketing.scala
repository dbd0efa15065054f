package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every subsequent equi-join / aggregation on the bucket key runs with no
  * exchange at all.
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and never shuffling it again: two tables bucketed into the same
  * number of buckets on the join key are co-located, and Catalyst plans a
  * SortMergeJoin whose children are bare scans (see BucketingSpec, which
  * asserts the absence of Exchange operators in the physical plan).
  *
  * Bucketing goes through the session catalog (`saveAsTable` — bucket
  * metadata lives in the catalog, not the parquet files), which is exactly
  * how it works on a production metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains any shuffle exchange
    * (hash, range, or single-partition) — the thing bucketing is supposed
    * to eliminate. Broadcast exchanges don't count: they move the small
    * side, not the bucketed data.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition").exists(plan.contains)
  }
}
