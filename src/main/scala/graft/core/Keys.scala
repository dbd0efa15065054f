package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Synthetic key assignment.
  *
  * The reference gives every collection a dense, monotonically increasing
  * `_key UBIGINT` column backed by a DuckDB sequence, added only when the
  * source data has no `_key` column already
  * (reference: src/actors/collection_actor.rs:176-189, 204-217). `_key` is
  * the join key between the row store and the per-column vector indexes.
  *
  * Spark-native contract: keys are dense (`start .. start+n-1`), assigned in
  * source row order (partition order, then row order within the partition).
  * For a single Parquet file this matches the file's row order, i.e. DuckDB's
  * `row_number() OVER ()` on the same file. Appends continue at `max+1`
  * (the reference's sequence does the same, collection_actor.rs:222-256).
  *
  * Scale note: `zipWithIndex` runs one lightweight count-per-partition job
  * and then a single pass — O(n) with no shuffle, safe at any scale. We do
  * NOT use `monotonically_increasing_id` (sparse, partition-dependent) or a
  * global `row_number()` window (single-partition sort — a scale hazard).
  */
object Keys {
  val KeyCol = "_key"

  /** Add a dense `_key` column starting at `start` unless one already
    * exists; a pre-existing `_key` of a narrower integer type is widened
    * to long so the key contract holds regardless of source schema.
    */
  def withKey(df: DataFrame, start: Long = 1L): DataFrame = {
    if (df.schema.fieldNames.contains(KeyCol))
      df.withColumn(KeyCol, col(KeyCol).cast(LongType))
    else {
      val schema = df.schema.add(StructField(KeyCol, LongType, nullable = false))
      val rdd = df.rdd.zipWithIndex().map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ (start + i))
      }
      df.sparkSession.createDataFrame(rdd, schema)
    }
  }

  /** Highest assigned key, or 0 when the frame is empty (so appends start
    * at 1). Casts defensively: a collection imported with an int `_key`
    * must not crash the first append.
    */
  def maxKey(df: DataFrame): Long = {
    if (!df.schema.fieldNames.contains(KeyCol)) 0L
    else df.agg(max(col(KeyCol).cast(LongType))).head() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
  }
}
