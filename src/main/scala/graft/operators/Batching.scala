package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batching — the inference/training efficiency step
  * between "corpus is clean" and "GPUs are fed": a batch pads every
  * sequence to its longest member, so random batching wastes
  * (max - len) tokens of compute per row, while grouping similar
  * lengths together makes padding vanish. This operator assigns the
  * batches and ACCOUNTS for the waste, so the padding saved by
  * length-bucketing is a measured, engine-checkable number rather than
  * folklore.
  *
  * Assignment is deterministic: rows rank by `(len DESC, key)` (or by
  * the salted-md5 shuffle order for the random baseline) and batch id
  * is `rank / batchSize` — reproducible across runs, engines, and
  * partitionings, like every sampling/split operator here.
  *
  * Scale shape: the global rank is [[Shuffle.rankBy]]'s range-partition
  * + zipWithIndex (no single-task sort, no window); the per-batch stats
  * are one batch-keyed partial aggregate. Nothing touches text — only
  * the precomputed length column moves.
  */
object Batching {

  /** `(key, len, batch_id)` with batches of `batchSize` filled in
    * descending-length order (ties by key). The LAST batch may be
    * short.
    */
  def lengthBatches(df: DataFrame, keyCol: String, lenCol: String,
                    batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Shuffle.rankBy(
        df.select(col(keyCol), col(lenCol).cast("long").as(lenCol)),
        Seq(-col(lenCol), col(keyCol)))
      .select(col(keyCol), col(lenCol),
        (col("pos") / batchSize).cast("long").as("batch_id"))
  }

  /** The random baseline: same batch arithmetic over the deterministic
    * salted-md5 shuffle order ([[Shuffle.deterministicShuffle]]).
    */
  def shuffledBatches(df: DataFrame, keyCol: String, lenCol: String,
                      batchSize: Int, salt: String = ""): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Shuffle.deterministicShuffle(
        df.select(col(keyCol), col(lenCol).cast("long").as(lenCol)), keyCol,
        salt)
      .select(col(keyCol), col(lenCol),
        (col("pos") / batchSize).cast("long").as("batch_id"))
  }

  /** Per-batch padding accounting over a batch assignment:
    * `(batch_id, n, max_len, sum_len, padding)` with
    * padding = n·max_len − sum_len — the exact token-slots wasted when
    * the batch pads to its longest member. All integers.
    */
  def paddingStats(batches: DataFrame, lenCol: String): DataFrame =
    batches.groupBy(col("batch_id")).agg(
        count(lit(1)).as("n"),
        max(col(lenCol)).as("max_len"),
        sum(col(lenCol)).as("sum_len"))
      .select(col("batch_id"), col("n"), col("max_len"), col("sum_len"),
        (col("n") * col("max_len") - col("sum_len")).as("padding"))
}
