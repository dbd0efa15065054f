package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    rankBy(df.withColumn("__h", h), Seq(col("__h"), col(keyCol)))
      .drop("__h")
  }

  /** The distributed dense-rank engine behind [[deterministicShuffle]]
    * and [[Curriculum]]: `df` plus a 0-based `pos` ranking rows by
    * `orderCols` ascending. The caller must make the order total (end
    * with a unique tie-break column). Range-repartition on the order
    * columns, sort within partitions, dense ranks via `zipWithIndex` —
    * no single-task stage. NOTE: unlike md5 order, a caller-supplied
    * first column can be skewed; range partitioning still splits evenly
    * because boundaries come from sampling the actual distribution,
    * and the unique tie-break column disambiguates heavy values.
    */
  def rankBy(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "rankBy needs at least one order column")
    val n = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(StructField("pos", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}

/** Curriculum ordering — "easy first" training schedules (Bengio et al.
  * 2009): rank the corpus by a per-document difficulty score and cut
  * the ranked stream into fixed-size stages, so stage k holds exactly
  * rows `[k*stageRows, (k+1)*stageRows)` of the score order. The score
  * is any column the quality battery provides (length, cross-entropy,
  * repetition — lower = easier by convention here).
  *
  * Scale shape: [[Shuffle.rankBy]] — range partition + local sort +
  * zipWithIndex, never a global single-task window; the stage id is
  * integer `div` of the dense rank (exact past 2^52, the Pack
  * discipline). Compose with [[Export.writeShards]] per stage for
  * staged training shards, or with [[Shuffle.deterministicShuffle]]
  * WITHIN a stage to de-correlate neighbors that the score ordering
  * clustered.
  */
object Curriculum {

  /** `df` plus `pos` (dense 0-based rank by `(score, keyCol)` asc) and
    * `stage` (= pos div stageRows). NULL difficulty ranks FIRST
    * (Spark's ascending null order) — i.e. "unknown = easiest"; pass
    * `coalesce(score, lit(x))` to place unknowns elsewhere, and note a
    * SQL twin needs `NULLS FIRST` (engines default differently).
    */
  def stages(df: DataFrame, keyCol: String, score: Column,
             stageRows: Int): DataFrame = {
    require(stageRows >= 1, s"stageRows must be >= 1, got $stageRows")
    Shuffle.rankBy(df.withColumn("__s", score), Seq(col("__s"), col(keyCol)))
      .drop("__s")
      // integer DIV, not floor(a/b): f64 division loses exactness past
      // 2^52 ranks (the Pack lesson)
      .withColumn("stage", expr(s"pos DIV $stageRows"))
  }
}
