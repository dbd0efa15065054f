package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus-mixing step of a
  * training-data pipeline ("keep 25% of English web text, 100% of French,
  * 10% of zh", Pile/ROOTS-style source weighting).
  *
  * Hash-threshold sampling, not `rand()`: the keep/drop decision for a row
  * is a pure function of its key, so the sample is reproducible across
  * runs, machines, and engines, rows keep or lose membership stably as
  * the corpus grows (append-only pipelines re-derive the same subset),
  * and there is no RNG state to coordinate across 1000 executors. The
  * bucket is the first 8 hex chars of `md5(key)` mod 100 — md5 is
  * bit-identical in DuckDB, which makes the exact sample SQL-checkable.
  *
  * Scale shape: a map-side filter. No shuffle, no join — the per-stratum
  * rate table is folded into a literal CASE chain (strata are source
  * labels; there are tens of them, never millions).
  */
object Sampling {

  /** Percent bucket 0..99 for a key column, stable across engines. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Keep each row with per-stratum probability `rates(stratum)/100`
    * (default `defaultRate` for unlisted strata), decided by the key's
    * hash bucket.
    */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100) &&
      defaultRate >= 0 && defaultRate <= 100, "rates are percents 0..100")
    // sorted for a deterministic CASE chain (Map iteration order is not)
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate)) {
      case ((stratum, r), acc) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .filter(col("bucket") < rate)
  }

  /** Uniform hash fraction in [0, 1) for a key column — the first 8 hex
    * chars of `md5(key)` over 16^8, a finer-grained sibling of
    * [[hashBucket]] for continuous per-row probabilities.
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Importance-weighted sampling: keep each row iff its key's hash
    * fraction is below `prob` (any per-row probability expression in
    * [0, 1], e.g. a quality score or a length-proportional weight). The
    * continuous analogue of [[stratified]]: same determinism story (pure
    * function of the key — reproducible, append-stable, engine-checkable
    * via md5), same scale shape (map-side filter, no shuffle, no RNG
    * state across executors). E[kept] = Σ min(1, prob); downstream
    * estimators reweight by 1/prob per the usual importance-sampling
    * correction.
    */
  def weighted(df: DataFrame, keyCol: String, prob: Column): DataFrame =
    df.filter(hashFraction(col(keyCol)) < prob)
}
