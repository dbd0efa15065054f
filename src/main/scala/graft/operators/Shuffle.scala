package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Deterministic global shuffle — the "write the training set in a
  * reproducible random order" step every LLM data pipeline ends with.
  * Correlated documents (same crawl, same domain, adjacent keys) must be
  * spread apart before training, the order must be reproducible across
  * runs and engines for exact restart/debug, and at 100 TB it must not
  * funnel through any single-task sort.
  *
  * Order = ascending `(md5(key), key)` — a content-independent, seedable
  * permutation (prepend a salt to re-deal). `pos` is the dense global
  * rank in that order.
  *
  * Scale shape: range-repartition on the hash (uniform by construction —
  * md5 output is uniform, so range boundaries split evenly; no skew
  * regardless of key clustering), sort within partitions, then assign
  * dense ranks with `zipWithIndex` (one count-per-partition job + one
  * pass — the same mechanics as [[graft.core.Keys.withKey]]; range
  * partitions are ordered, so partition-order concatenation IS the total
  * order). No global single-partition window anywhere; every stage is
  * O(n/p) per task.
  */
object Shuffle {

  /** `df` plus a dense `pos` column (0-based) ranking rows by
    * `(md5(salt || key), key)`. `keyCol` must be unique per row (a key
    * collision would make the order — but not the membership —
    * ambiguous; ties are broken by the key itself so equal hashes still
    * order deterministically).
    */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           salt: String = ""): DataFrame = {
    val h = md5(concat(lit(salt), col(keyCol).cast("string")))
    val withH = df.withColumn("__h", h)
    val n = math.max(1, withH.sparkSession.sessionState.conf.numShufflePartitions)
    val sorted = withH
      .repartitionByRange(n, col("__h"), col(keyCol))
      .sortWithinPartitions(col("__h"), col(keyCol))
    val schema = sorted.schema.add(StructField("pos", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rdd, schema).drop("__h")
  }
}
